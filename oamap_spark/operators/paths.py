"""Nested-path resolution for the oamap-style combinators.

oamap addresses any node in a nested schema with a dotted path whose
segments may cross record fields *and* list levels (the ``at=`` args in
``oamap/operations.py`` — SURVEY §2.A). Spark has no single primitive
for "apply this transformation at path a.b.c where b is an array", so
this module provides the one genuinely novel piece of engineering in
the port: a resolver that rebuilds a nested column with a function
applied at an arbitrary depth, mapping over intervening ``ArrayType``
levels with the ``transform`` higher-order function (JVM-side, no
Python in the loop).

Terminology:
- A *path* is ``"a.b.c"`` (root = ``""``).
- Structs are entered by field name; arrays are mapped over
  transparently (oamap's List levels behave the same way: operations
  at ``events.muons.pt`` apply per-muon).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def split_path(path: str) -> list[str]:
    return [p for p in path.split(".") if p] if path else []


def field_type(schema: T.DataType, path: str) -> T.DataType:
    """Type of the node at ``path``, descending through arrays."""
    node = schema
    for seg in split_path(path):
        while isinstance(node, T.ArrayType):
            node = node.elementType
        if not isinstance(node, T.StructType):
            raise KeyError(f"path {path!r}: segment {seg!r} not inside a struct")
        try:
            node = node[seg].dataType
        except KeyError:
            raise KeyError(f"path {path!r}: no field {seg!r}") from None
    return node


def transform_at(
    df: DataFrame,
    path: str,
    fn: Callable[[Column, T.DataType], Column],
    enter_arrays: bool = True,
) -> DataFrame:
    """Rebuild ``df`` with ``fn(col, dtype)`` applied to the node at
    ``path``. Intervening arrays are mapped with ``transform`` (one
    lambda per list level — stays in whole-stage codegen). With
    ``enter_arrays=False``, an array at the *target* node is handed to
    ``fn`` whole (for list-level ops: index/parents/filter/flatten);
    arrays above the target are still mapped over."""
    segs = split_path(path)
    if not segs:
        raise ValueError("transform_at requires a non-root path")
    top = segs[0]
    dtype = df.schema[top].dataType
    new_col = _rebuild(F.col(top), dtype, segs[1:], fn, enter_arrays)
    return df.withColumn(top, new_col)


def _rebuild(
    col: Column,
    dtype: T.DataType,
    segs: list[str],
    fn: Callable[[Column, T.DataType], Column],
    enter_arrays: bool,
) -> Column:
    if isinstance(dtype, T.ArrayType) and (segs or enter_arrays):
        return F.transform(
            col, lambda x: _rebuild(x, dtype.elementType, segs, fn, enter_arrays)
        )
    if not segs:
        return fn(col, dtype)
    if not isinstance(dtype, T.StructType):
        raise KeyError(f"segment {segs[0]!r} not inside a struct")
    seg = segs[0]
    inner_t = dtype[seg].dataType
    return col.withField(
        seg, _rebuild(col.getField(seg), inner_t, segs[1:], fn, enter_arrays)
    )


def drop_at(df: DataFrame, *paths: str) -> DataFrame:
    """Drop possibly-nested fields. Top-level paths use ``df.drop``;
    nested ones rebuild the enclosing struct with ``dropFields``
    (through array levels via ``transform``)."""
    out = df
    for path in paths:
        segs = split_path(path)
        if len(segs) == 1:
            out = out.drop(segs[0])
            continue
        parent, leaf = ".".join(segs[:-1]), segs[-1]
        out = transform_at(out, parent, lambda c, t, leaf=leaf: c.dropFields(leaf))
    return out
