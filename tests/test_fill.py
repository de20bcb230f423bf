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
