"""The oamap dataset-operation surface, Spark-first.

One function per operation in ``oamap/operations.py`` (SURVEY §2.A —
the reference's ~15 ops), each implemented as a *narrow* DataFrame
transformation: metadata-only where oamap is metadata-only, and never
introducing a shuffle (oamap has no shuffle anywhere; neither do
these). Naming follows oamap; clashes with Python builtins get a
trailing underscore (``filter_``, ``map_``).

Semantics notes mirror the reference:
- Paths may cross list levels; the op applies per-element there
  (``at="planets.name"`` renames inside each array element).
- oamap's zero-copy filter (new starts/stops over shared content) has
  no Tungsten equivalent; ``array_filter``/``where`` copy — same
  semantics, Spark-appropriate physics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oamap_spark.operators.paths import drop_at, field_type, split_path, transform_at

ColumnFn = Callable[[Column], Column]


# ---------------------------------------------------------------------------
# 1. fieldname — rename a record field (oamap/operations.py — fieldname)
# ---------------------------------------------------------------------------
def fieldname(df: DataFrame, newname: str, at: str) -> DataFrame:
    """Rename the field at ``at`` to ``newname`` (metadata-only)."""
    segs = split_path(at)
    if not segs:
        raise ValueError("fieldname needs a field path")
    if len(segs) == 1:
        return df.withColumnRenamed(segs[0], newname)
    parent, leaf = ".".join(segs[:-1]), segs[-1]

    def rn(c: Column, t: T.DataType) -> Column:
        return c.withField(newname, c.getField(leaf)).dropFields(leaf)

    return transform_at(df, parent, rn)


# ---------------------------------------------------------------------------
# 2. recordname — rename a record *type*. Spark structs are anonymous;
#    kept as a no-op that records the name in column metadata so a
#    round-trip preserves it (oamap/operations.py — recordname).
# ---------------------------------------------------------------------------
def recordname(df: DataFrame, newname: str, at: str) -> DataFrame:
    top = split_path(at)[0] if split_path(at) else None
    if top is None:
        return df
    return df.withMetadata(top, {"oamap.recordname": newname})


# ---------------------------------------------------------------------------
# 3. project — descend into one field, discarding the wrapper
#    (oamap/operations.py — project)
# ---------------------------------------------------------------------------
def project(df: DataFrame, at: str, explode_lists: bool = True) -> DataFrame:
    """``project(df, "planets")`` → dataset of planets. Crossing a list
    level explodes (one row per element) when ``explode_lists``; with
    False the array column itself becomes the single column."""
    segs = split_path(at)
    if not segs:
        return df
    cur = df.select(F.col(segs[0]).alias(segs[0]))
    cur_t = field_type(df.schema, segs[0])
    name = segs[0]
    for seg in segs[1:] + [None]:
        if explode_lists:
            while isinstance(cur_t, T.ArrayType):
                cur = cur.select(F.explode(name).alias(name))
                cur_t = cur_t.elementType
        if seg is None:
            break
        cur = cur.select(F.col(f"{name}.{seg}").alias(seg))
        cur_t = field_type(cur.schema, seg)
        name = seg
    if isinstance(cur_t, T.StructType):
        cur = cur.select(f"{name}.*")
    return cur


# ---------------------------------------------------------------------------
# 4/5. keep / drop — column pruning at any depth
#    (oamap/operations.py — keep, drop)
# ---------------------------------------------------------------------------
def keep(df: DataFrame, *paths: str) -> DataFrame:
    """Keep only the named (possibly nested) fields; structure above a
    kept leaf is preserved. Metadata-only → parquet nested-schema
    pruning applies at scan time."""
    keep_tree: dict = {}
    for p in paths:
        node = keep_tree
        for seg in split_path(p):
            node = node.setdefault(seg, {})

    def prune(col: Column, dtype: T.DataType, tree: dict) -> Column:
        if not tree:
            return col
        while isinstance(dtype, T.ArrayType):
            inner_t = dtype.elementType
            return F.transform(col, lambda x: prune(x, inner_t, tree))
        if not isinstance(dtype, T.StructType):
            return col
        fields = [
            prune(col.getField(f.name), f.dataType, tree[f.name]).alias(f.name)
            for f in dtype.fields
            if f.name in tree
        ]
        return F.struct(*fields)

    cols = []
    for f in df.schema.fields:
        if f.name in keep_tree:
            cols.append(prune(F.col(f.name), f.dataType, keep_tree[f.name]).alias(f.name))
    return df.select(*cols)


def drop(df: DataFrame, *paths: str) -> DataFrame:
    """Remove the named (possibly nested) fields."""
    return drop_at(df, *paths)


# ---------------------------------------------------------------------------
# 6/7. split / merge — restructure record nesting
#    (oamap/operations.py — split, merge)
# ---------------------------------------------------------------------------
def split(df: DataFrame, *paths: str) -> DataFrame:
    """Pull nested fields up one level (inverse of merge). Top-level
    structs only (oamap's split likewise restructures records, not
    lists)."""
    out = df
    for p in paths:
        segs = split_path(p)
        if len(segs) < 2:
            raise ValueError(f"split path {p!r} must be nested (struct.field)")
        parent, leaf = ".".join(segs[:-1]), segs[-1]
        out = out.withColumn(leaf, F.col(f"{parent}.{leaf}"))
        parent_t = field_type(out.schema, parent)
        if isinstance(parent_t, T.StructType) and len(parent_t.fields) == 1:
            # dropping the struct's last field: remove the container
            out = drop_at(out, parent)
        else:
            out = drop_at(out, p)
    return out


def merge(df: DataFrame, container: str, *paths: str) -> DataFrame:
    """Group top-level columns into a (new) struct column."""
    cols = [split_path(p)[0] for p in paths]
    out = df.withColumn(container, F.struct(*[F.col(c).alias(c) for c in cols]))
    return out.drop(*[c for c in cols if c != container])


# ---------------------------------------------------------------------------
# 8. parents — reference from list element back to enclosing record
#    (oamap/operations.py — parents)
# ---------------------------------------------------------------------------
def parents(df: DataFrame, fieldname_: str, at: str, parent_fields: Sequence[str]) -> DataFrame:
    """Give each element of the list at ``at`` a struct field
    ``fieldname_`` carrying the named parent-level fields. In Spark the
    parent row is lexically in scope, so this is a per-element struct
    injection — narrow, no shuffle (oamap builds an index array)."""
    parent_struct = F.struct(*[F.col(p).alias(split_path(p)[-1]) for p in parent_fields])

    def add_parent(c: Column, t: T.DataType) -> Column:
        if not isinstance(t, T.ArrayType):
            raise ValueError(f"parents: {at!r} is not a list")
        return F.transform(c, lambda x: x.withField(fieldname_, parent_struct))

    segs = split_path(at)
    top = segs[0]
    if len(segs) == 1:
        return df.withColumn(top, add_parent(F.col(top), df.schema[top].dataType))
    return transform_at(df, at, add_parent, enter_arrays=False)


# ---------------------------------------------------------------------------
# 9. index — attach positional index to list elements
#    (oamap/operations.py — index)
# ---------------------------------------------------------------------------
def index(df: DataFrame, fieldname_: str, at: str) -> DataFrame:
    """Each element of the list at ``at`` gains field ``fieldname_`` =
    its 0-based position (oamap's index array ≙ transform's index
    lambda argument — no data movement)."""

    def add_index(c: Column, t: T.DataType) -> Column:
        if not isinstance(t, T.ArrayType):
            raise ValueError(f"index: {at!r} is not a list")
        elem_t = t.elementType
        if isinstance(elem_t, T.StructType):
            return F.transform(c, lambda x, i: x.withField(fieldname_, i))
        return F.transform(
            c, lambda x, i: F.struct(x.alias("value"), i.alias(fieldname_))
        )

    return transform_at(df, at, add_index, enter_arrays=False)


# ---------------------------------------------------------------------------
# 10. tomask — sentinel value/range → NULL (oamap/operations.py — tomask)
# ---------------------------------------------------------------------------
def tomask(df: DataFrame, at: str, low, high=None) -> DataFrame:
    """NULL-out the value (or closed range) at ``at``; works through
    list levels per-element. oamap materializes a mask array; Spark's
    null bitmap is the same thing."""
    lo, hi = (low, low) if high is None else (low, high)

    def mask(c: Column, t: T.DataType) -> Column:
        return F.when(c.between(F.lit(lo), F.lit(hi)), F.lit(None).cast(t)).otherwise(c)

    return transform_at(df, at, mask)


# ---------------------------------------------------------------------------
# 11. flatten — merge one list nesting level (oamap/operations.py — flatten)
# ---------------------------------------------------------------------------
def flatten(df: DataFrame, at: str = "") -> DataFrame:
    """``at=""``: explode the table's row-level list column(s)?  In
    oamap the *dataset itself* is a list; flattening the root list of
    lists ≙ explode. For a named column path: the built-in
    ``flatten`` (list-of-lists → list), applied per-element —
    metadata-equivalent, narrow."""
    if not at:
        raise ValueError("flatten at the dataset root needs a column: flatten(df, 'col')")
    t = field_type(df.schema, at)
    if isinstance(t, T.ArrayType) and isinstance(t.elementType, T.ArrayType):
        return transform_at(df, at, lambda c, _t: F.flatten(c), enter_arrays=False)
    if isinstance(t, T.ArrayType):
        # list at top level → one row per element (dataset-level flatten)
        segs = split_path(at)
        if len(segs) == 1:
            others = [c for c in df.columns if c != segs[0]]
            return df.select(*others, F.explode_outer(F.col(segs[0])).alias(segs[0]))
    raise ValueError(f"flatten: {at!r} is not a list-of-lists or top-level list")


# ---------------------------------------------------------------------------
# 12. filter — keep elements passing a predicate, at any level
#    (oamap/operations.py — filter; zero-copy there, copying here)
# ---------------------------------------------------------------------------
def filter_(df: DataFrame, pred: ColumnFn | Column | str, at: str = "") -> DataFrame:
    """Top level (``at=""``): row filter. List path: per-element
    ``array_filter`` keeping the list structure (oamap's nested filter
    semantics). ``pred`` is a Column→Column fn (for lists) or a
    Column/SQL-string (for rows)."""
    if not at:
        cond = F.expr(pred) if isinstance(pred, str) else pred
        return df.where(cond)

    def do(c: Column, t: T.DataType) -> Column:
        if not isinstance(t, T.ArrayType):
            raise ValueError(f"filter at {at!r}: not a list")
        return F.filter(c, pred)

    return transform_at(df, at, do, enter_arrays=False)


# ---------------------------------------------------------------------------
# 13. define — computed field at any nesting level
#    (oamap/operations.py — define)
# ---------------------------------------------------------------------------
def define(df: DataFrame, fieldname_: str, fn: ColumnFn | Column, at: str = "") -> DataFrame:
    """Add field ``fieldname_`` computed by ``fn``. ``at=""`` adds a
    top-level column (fn receives the whole row as a struct is not
    needed — pass a Column). At a list-of-struct path, fn maps each
    element."""
    if not at:
        col = fn if isinstance(fn, Column) else fn(None)
        return df.withColumn(fieldname_, col)

    def do(c: Column, t: T.DataType) -> Column:
        if isinstance(t, T.ArrayType) and isinstance(t.elementType, T.StructType):
            return F.transform(c, lambda x: x.withField(fieldname_, fn(x)))
        if isinstance(t, T.StructType):
            return c.withField(fieldname_, fn(c))
        raise ValueError(f"define at {at!r}: need struct or list-of-struct")

    return transform_at(df, at, do)


# ---------------------------------------------------------------------------
# 14. map — apply fn to every element, exit to flat arrays
#    (oamap/operations.py — map)
# ---------------------------------------------------------------------------
def map_(df: DataFrame, *exprs: Column | str, explode_at: str = "") -> DataFrame:
    """Project expressions per element; with ``explode_at`` the list at
    that path is exploded first (oamap's map over nested elements).
    The caller does ``.toPandas()``/``collect`` for the numpy exit."""
    out = df
    if explode_at:
        segs = split_path(explode_at)
        top = segs[0]
        others = [c for c in out.columns if c != top]
        elem_t = field_type(df.schema, explode_at)
        while isinstance(elem_t, T.ArrayType):
            elem_t = elem_t.elementType
        out = out.select(*others, F.explode(F.col(explode_at)).alias("__elem__"))
        if isinstance(elem_t, T.StructType):
            # element fields enter scope by name (oamap's fcn(element))
            out = out.select(*others, "__elem__.*")
        else:
            out = out.withColumnRenamed("__elem__", segs[-1])
    cols = [F.expr(e) if isinstance(e, str) else e for e in exprs]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# 15. reduce — global fold (oamap/operations.py — reduce; associative
#     tally required across partitions, same constraint here)
# ---------------------------------------------------------------------------
def reduce_(df: DataFrame, *aggs: Column) -> DataFrame:
    """Global aggregate — partial per partition + final combine, the
    distributed generalization of oamap's per-partition reduce."""
    return df.agg(*aggs)
