"""Ingest round-trip tests — oamap's workhorse pattern (`fromdata →
bind → deep-compare with the original object`, oamap/tests [H]) over
the canonical nested shapes: lists of records, records of lists,
nullables, empty lists, strings, deep nesting."""

from __future__ import annotations

import pytest

from oamap_spark.sources import fill
from pyspark.sql import types as T

STARS = [
    {
        "star_id": 1,
        "name": "alpha",
        "mass": 1.1,
        "planets": [
            {"pname": "a", "pmass": 0.5, "period": 10.0},
            {"pname": "b", "pmass": None, "period": 20.5},
        ],
    },
    {"star_id": 2, "name": "beta", "mass": None, "planets": []},
    {
        "star_id": 3,
        "name": "gamma",
        "mass": 2.2,
        "planets": [{"pname": "c", "pmass": 3.5, "period": 5.0}],
    },
]

HEP = [
    {
        "run": 1,
        "muons": [{"pt": 10.5, "eta": 0.1, "q": 1}, {"pt": 20.0, "eta": -1.2, "q": -1}],
        "met": {"pt": 45.0, "phi": 0.3},
    },
    {"run": 2, "muons": [], "met": {"pt": 12.0, "phi": -2.1}},
]

STARS_SCHEMA = T.StructType(
    [
        T.StructField("star_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("mass", T.DoubleType()),
        T.StructField(
            "planets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pname", T.StringType()),
                        T.StructField("pmass", T.DoubleType()),
                        T.StructField("period", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def _sorted(objs):
    return sorted(objs, key=lambda o: tuple(sorted((k, str(v)) for k, v in o.items())))


@pytest.mark.parametrize("objs,schema", [(STARS, STARS_SCHEMA), (STARS, None), (HEP, None)])
def test_fromdata_roundtrip(spark, objs, schema):
    df = fill.fromdata(spark, objs, schema)
    assert _sorted(fill.to_objects(df)) == _sorted(objs)


def test_inference_widens_and_nullables(spark):
    """oamap inference semantics: int+missing → nullable; the explicit
    double column stays double."""
    schema = fill.infer_schema(spark, STARS)
    assert schema["mass"].dataType == T.DoubleType()
    assert schema["mass"].nullable
    elem = schema["planets"].dataType.elementType
    assert elem["pmass"].nullable


def test_json_lines_ingest(spark):
    import json

    lines = [json.dumps(o) for o in HEP]
    df = fill.from_json_lines(spark, lines)
    assert _sorted(fill.to_objects(df)) == _sorted(HEP)


def test_parquet_roundtrip_nested(spark, tmp_path):
    """Dremel shred + assemble preserves nested shape, nulls, and
    empty-vs-null lists."""
    df = fill.fromdata(spark, STARS, STARS_SCHEMA)
    back = fill.roundtrip_parquet(df, str(tmp_path / "stars.parquet"), spark)
    assert back.schema == df.schema
    assert _sorted(fill.to_objects(back)) == _sorted(STARS)


def test_empty_list_distinct_from_null_list(spark):
    """oamap masked-list vs empty-list distinction must survive
    ingest + parquet (the classic nested-data bug site)."""
    objs = [
        {"k": 1, "xs": [1, 2]},
        {"k": 2, "xs": []},
        {"k": 3, "xs": None},
    ]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("xs", T.ArrayType(T.LongType()), nullable=True),
        ]
    )
    df = fill.fromdata(spark, objs, schema)
    got = {o["k"]: o["xs"] for o in fill.to_objects(df)}
    assert got[1] == [1, 2] and got[2] == [] and got[3] is None


def test_union_inference_mixed_leaf_roundtrip(spark):
    """Conflicting int/string leaf → auto-synthesized tagged union
    (oamap's Union node analog, SURVEY §1.3): struct(tag, v_long,
    v_string), one non-null variant per row, values preserved."""
    objs = [
        {"k": 1, "payload": 42},
        {"k": 2, "payload": "forty-two"},
        {"k": 3, "payload": None},
        {"k": 4, "payload": 7},
    ]
    df = fill.fromdata(spark, objs)
    f = {x.name: x for x in df.schema.fields}["payload"]
    assert isinstance(f.dataType, T.StructType)
    assert [c.name for c in f.dataType.fields] == ["tag", "v_long", "v_string"]
    got = {o["k"]: o["payload"] for o in fill.to_objects(df)}
    assert got[1] == {"tag": 0, "v_long": 42, "v_string": None}
    assert got[2] == {"tag": 1, "v_long": None, "v_string": "forty-two"}
    assert got[3] is None
    assert got[4] == {"tag": 0, "v_long": 7, "v_string": None}


def test_union_inference_numeric_conflict_still_widens(spark):
    """long-vs-double is oamap's widening case, NOT a union."""
    df = fill.fromdata(spark, [{"x": 1}, {"x": 2.5}])
    f = {x.name: x for x in df.schema.fields}["x"]
    assert isinstance(f.dataType, T.DoubleType)


def test_union_inference_inside_lists(spark):
    """Unions synthesize under list elements too."""
    df = fill.fromdata(spark, [{"xs": [1, "a", None, 2]}])
    el = {x.name: x for x in df.schema.fields}["xs"].dataType.elementType
    assert isinstance(el, T.StructType)
    rows = fill.to_objects(df)
    assert rows[0]["xs"][0] == {"tag": 0, "v_long": 1, "v_string": None}
    assert rows[0]["xs"][1] == {"tag": 1, "v_long": None, "v_string": "a"}
    assert rows[0]["xs"][2] is None


def test_union_case_dispatch_on_inferred(spark):
    """union_case drives per-variant logic over the inferred shape."""
    from pyspark.sql import functions as F

    from oamap_spark.operators.links import union_case

    df = fill.fromdata(spark, [{"k": 1, "p": 10}, {"k": 2, "p": "xyz"}])
    out = df.select(
        "k",
        union_case(
            F.col("p"),
            F.col("p.v_long") * 2,
            F.length("p.v_string").cast("long"),
        ).alias("r"),
    )
    got = {r["k"]: r["r"] for r in out.collect()}
    assert got == {1: 20, 2: 3}


def test_fromiterdata_chunks_and_pins_schema(spark):
    from oamap_spark.sources.fill import fromiterdata, to_objects

    def gen():
        for i in range(25):
            yield {"i": i, "s": f"v{i}"}

    df = fromiterdata(spark, gen(), chunk_rows=10)
    rows = sorted(to_objects(df), key=lambda r: r["i"])
    assert len(rows) == 25 and rows[0] == {"i": 0, "s": "v0"}


def test_fromiterdata_empty_needs_schema(spark):
    import pytest

    from oamap_spark.sources.fill import fromiterdata

    with pytest.raises(ValueError):
        fromiterdata(spark, iter(()))
    df = fromiterdata(spark, iter(()), schema="i long")
    assert df.count() == 0
