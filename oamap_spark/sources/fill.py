"""Ingest: nested Python/JSON object trees → DataFrames, and back.

oamap's second entry point (SURVEY §3): `oamap.inference.fromdata`
walks an object tree inferring the narrowest schema (ints widen to
floats, missing values set nullable, conflicts become Unions), then
`oamap.fill.fromdata` shreds the objects into flat arrays
(oamap/inference.py, oamap/fill.py [H]). Spark already owns both
halves — `createDataFrame` sampling/Arrow conversion and the columnar
shred inside Tungsten — so this module is the thin, tested contract:

- fromdata: objects → DataFrame (inference or explicit schema), with
  oamap's widening flavor via Spark's sampling inference.
- from_json_lines: JSON-string ingest through the same inference.
- to_objects: proxy-style exit ramp (DataFrame → Python object trees)
  used by round-trip tests (`proxy == original`, oamap's workhorse
  test pattern).
- write/read parquet round-trip helpers for the nested shapes.

Union-typed conflicts: Spark has no sum type, so `fromdata` closes
oamap's Union-inference gap (oamap/inference.py [H] synthesizes a
Union node) by DETECTING conflicting leaf types during inference and
auto-encoding those leaves as the tagged-union struct shape of
operators/links.union_encode — struct(tag, v_<type>...), one non-null
variant per row, dispatchable with union_case. Numeric conflicts
(long vs double) keep oamap's widening instead (no union).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def infer_schema(spark: SparkSession, objs: Sequence[dict]) -> T.StructType:
    """Schema inference over example objects (oamap.inference.fromdata
    analog): numeric widening, nullable on missing. Routed through the
    JSON reader: `createDataFrame` would infer nested dicts as
    MapType(string→string), but oamap (and this engine) treat
    dict-shaped data as *records* — JSON inference yields the
    StructType tree with oamap's widening flavor."""
    return fromdata(spark, objs).schema


# Exact-type names for union variant slots. type() lookup (not
# isinstance) so bool — a Python int subclass — stays its own variant.
_PRIM_NAME = {bool: "bool", int: "long", float: "double", str: "string"}
_WIDENABLE = {"long", "double"}  # numeric conflicts widen, not union


def _kind_of(obj) -> str | None:
    """Type-kind at a position: primitive name, 'list', 'record', or
    None for nulls (nullability, not a union variant)."""
    if obj is None:
        return None
    if isinstance(obj, dict):
        return "record"
    if isinstance(obj, list):
        return "list"
    return _PRIM_NAME.get(type(obj))


def _collect_leaf_types(obj, path: tuple, acc: dict) -> None:
    kind = _kind_of(obj)
    if kind is not None:
        acc.setdefault(path, set()).add(kind)
    if isinstance(obj, dict):
        for k, v in obj.items():
            _collect_leaf_types(v, path + (k,), acc)
    elif isinstance(obj, list):
        for v in obj:
            _collect_leaf_types(v, path + ("[]",), acc)


def union_conflict_paths(objs: Sequence[dict]) -> dict[tuple, list[str]]:
    """Paths whose observed type-kinds conflict beyond numeric
    widening → sorted variant-kind list per path (the Union nodes
    oamap's inference would synthesize). Conflicts may be primitive
    (long vs string) or STRUCTURAL (scalar vs list vs record) — both
    become the same tagged-union struct shape."""
    acc: dict[tuple, set] = {}
    for o in objs:
        _collect_leaf_types(o, (), acc)
    return {
        path: sorted(ts)
        for path, ts in acc.items()
        if len(ts) > 1 and not ts <= _WIDENABLE
    }


def _encode_unions(obj, path: tuple, upaths: dict[tuple, list[str]]):
    # encode children FIRST (child paths are recorded without the
    # union wrapper, so deeper conflicts resolve independently) …
    if isinstance(obj, dict):
        enc = {k: _encode_unions(v, path + (k,), upaths) for k, v in obj.items()}
    elif isinstance(obj, list):
        enc = [_encode_unions(v, path + ("[]",), upaths) for v in obj]
    else:
        enc = obj
    # … then wrap this position if its path is union-typed
    variants = upaths.get(path)
    if obj is None or variants is None:
        return enc
    kind = _kind_of(obj)
    return {"tag": variants.index(kind), f"v_{kind}": enc}


def fromdata(
    spark: SparkSession,
    objs: Sequence[dict],
    schema=None,
) -> DataFrame:
    """Objects → DataFrame. With `schema=None` infers like oamap
    (records, not maps — see infer_schema), including Union synthesis:
    leaves with conflicting primitive types are auto-encoded as tagged
    union structs (struct(tag, v_<type>…), the union_encode shape) so
    no data is stringified or lost. Explicit schemas pin types exactly
    (oamap's declared-schema path); a PLURTP ``schema.Node`` is
    accepted directly and lowered via ``schema.to_spark``."""
    from oamap_spark import schema as plurtp

    if isinstance(schema, plurtp.Node):
        schema = plurtp.to_spark(schema)
        if not isinstance(schema, T.StructType):
            raise TypeError("fromdata needs a Record (row) schema at the top level")
    if schema is None:
        upaths = union_conflict_paths(objs)
        if upaths:
            objs = [_encode_unions(o, (), upaths) for o in objs]
        rdd = spark.sparkContext.parallelize([json.dumps(o) for o in objs])
        return spark.read.json(rdd)
    return spark.createDataFrame(objs, schema)


def from_json_lines(
    spark: SparkSession,
    lines: Iterable[str],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """JSON-lines ingest (oamap fromiterdata flavor): parse locally,
    then the fromdata path. For files at scale use spark.read.json —
    same inference, distributed parse."""
    return fromdata(spark, [json.loads(ln) for ln in lines], schema)


def fromiterdata(
    spark: SparkSession,
    objs: Iterable[dict],
    schema=None,
    *,
    chunk_rows: int = 10_000,
) -> DataFrame:
    """oamap's ``fromiterdata`` (oamap/fill.py [H]): ingest from an
    ITERATOR without materializing the whole stream — objects are
    drained in ``chunk_rows`` batches, each batch becomes a DataFrame,
    and the result is their union. With ``schema=None`` the FIRST
    chunk's inferred schema (union-encoding included) pins the layout,
    exactly how oamap commits to a schema from the data seen so far —
    later chunks must conform (a conflicting later chunk raises, same
    as oamap's fill error).

    For unbounded streams use the Structured Streaming sources; this
    is the bounded-iterator convenience with driver-side chunking."""
    import itertools

    it = iter(objs)
    out: DataFrame | None = None
    while True:
        batch = list(itertools.islice(it, chunk_rows))
        if not batch:
            break
        df = fromdata(spark, batch, schema)
        if out is None:
            out = df
            if schema is None:
                schema = df.schema  # first chunk pins the layout
        else:
            out = out.unionByName(df)
    if out is None:
        if schema is None:
            raise ValueError("empty iterator and no schema to pin")
        return spark.createDataFrame([], schema)
    return out


def to_objects(df: DataFrame) -> list[dict]:
    """Exit ramp: DataFrame → plain Python object trees (lists/dicts/
    scalars), the deep shape oamap proxies render. Test-sized data
    only — this is `collect`."""

    def conv(v):
        if isinstance(v, list):
            return [conv(x) for x in v]
        if hasattr(v, "asDict"):
            return {k: conv(x) for k, x in v.asDict().items()}
        return v

    return [conv(r) for r in df.collect()]


def roundtrip_parquet(df: DataFrame, path: str, spark: SparkSession) -> DataFrame:
    """Write nested data as parquet and re-read it (Dremel shred +
    assemble — oamap/backend/parquet.py's whole job, here one write
    and one scan)."""
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
