"""Dataset/Database layer (oamap/dataset.py + database.py analog):
storage round-trip, views, derived-dataset provenance, PLURTP sidecar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oamap_spark.schema import List, Primitive, Record, from_spark
from oamap_spark.sources.dataset import Database
from oamap_spark.sources.fill import fromdata

ROWS = [
    {"x": 1, "lang": "en", "ys": [1.0, 2.0]},
    {"x": 2, "lang": "de", "ys": [3.0]},
    {"x": 3, "lang": "en", "ys": []},
]


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


def _base(spark):
    node = Record(
        {"x": Primitive("int64"), "lang": Primitive("string"),
         "ys": List(Primitive("float64"))}
    )
    return fromdata(spark, ROWS, schema=node)


def test_put_get_roundtrip_and_view(spark, db):
    db.put("base", _base(spark))
    got = db.get("base")
    assert got.df.count() == 3
    assert db.list() == ["base"]
    # the name is immediately addressable from SQL
    assert spark.sql("SELECT sum(x) AS s FROM base").collect()[0]["s"] == 6


def test_put_records_plurtp_schema(spark, db):
    ds = db.put("base", _base(spark))
    node = ds.schema_node()
    # the sidecar preserves the DECLARED schema (incl. non-nullability),
    # which the parquet round-trip alone loses (re-read marks everything
    # nullable) — oamap's schema-in-database design point
    assert node == Record(
        {"x": Primitive("int64"), "lang": Primitive("string"),
         "ys": List(Primitive("float64"))}
    )
    assert from_spark(ds.df.schema).field_dict()["x"].nullable  # read side widens


def test_derive_records_provenance_and_rederives(spark, db):
    db.put("base", _base(spark))

    def en_only(base):
        """keep english rows, add n = size(ys)"""
        return base.where(F.col("lang") == "en").withColumn("n", F.size("ys"))

    ds = db.derive("en", en_only, "base")
    assert ds.df.count() == 2
    assert ds.parents == ("base",)
    assert ds.recipe == "keep english rows, add n = size(ys)"
    prov = db.provenance("en")
    assert prov["parents"] == ["base"]

    # re-derivation after a parent change (oamap's re-derivable datasets)
    db.put("base", _base(spark).where(F.col("x") > 1), mode="overwrite")
    ds2 = db.derive("en", en_only, "base", mode="overwrite")
    assert ds2.df.count() == 1


def test_partitioned_put_prunes(spark, db):
    db.put("base", _base(spark), partition_by=["lang"])
    got = db.get("base")
    plan = got.df.where(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or got.df.where(F.col("lang") == "en").count() == 2


def test_bad_name_rejected(spark, db):
    with pytest.raises(ValueError):
        db.put("../evil", _base(spark))
    with pytest.raises(KeyError):
        db.get("missing")
    # the _ namespace is reserved for internal sidecars/checkpoints:
    # put('_checkpoints', ...) would write into the streaming
    # checkpoint root, and list() must never report it as a dataset
    with pytest.raises(ValueError):
        db.put("_checkpoints", _base(spark))
    assert not any(n.startswith("_") for n in db.list())


def test_overwrite_requires_mode(spark, db):
    db.put("base", _base(spark))
    with pytest.raises(Exception):
        db.put("base", _base(spark))  # mode="error" default
    db.put("base", _base(spark), mode="overwrite")
    assert db.get("base").df.count() == 3


def test_sidecar_preserves_union_and_pointer_nodes(spark, db):
    from oamap_spark.schema import Pointer, Tuple, Union, to_spark
    from oamap_spark.sources.fill import fromdata

    node = Record(
        {
            "u": Union([Primitive("int64"), Primitive("string")]),
            "p": Pointer(Record({"name": Primitive("string")}), nullable=True),
            "t": Tuple([Primitive("int64"), Primitive("float64")]),
        }
    )
    df = fromdata(
        spark,
        [
            {"u": {"tag": 0, "v_0": 7, "v_1": None}, "p": 3, "t": {"_0": 1, "_1": 2.5}},
            {"u": {"tag": 1, "v_0": None, "v_1": "x"}, "p": None, "t": {"_0": 2, "_1": 0.5}},
        ],
        schema=node,
    )
    ds = db.put("linked", df)
    back = ds.schema_node()
    # Union and Tuple survive structurally; Pointer survives via the
    # StructField metadata carried into the sidecar at put() time
    assert back.field_dict()["u"] == node.field_dict()["u"]
    assert back.field_dict()["t"] == node.field_dict()["t"]
    assert back.field_dict()["p"] == node.field_dict()["p"]


def test_put_stream_exactly_once(spark, db):
    from pyspark.sql import functions as F
    from oamap_spark.streaming.pipelines import read_events_stream

    sf = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf).where(F.col("value") > 50).select(
        "event_id", "user_id", "value"
    )
    ds = db.put_stream("hot_events", stream, recipe="events with value > 50")
    from oamap_spark.sources.tables import load_table

    expect = (
        load_table(spark, sf, "events").where(F.col("value") > 50).count()
    )
    assert ds.df.count() == expect
    assert ds.meta["streaming"] is True and ds.recipe == "events with value > 50"

    # idempotent: the source is exhausted, a second drain through the
    # same checkpoint must append NOTHING (exactly-once, not at-least)
    stream2 = read_events_stream(spark, sf).where(F.col("value") > 50).select(
        "event_id", "user_id", "value"
    )
    ds2 = db.put_stream("hot_events", stream2, recipe="events with value > 50")
    assert ds2.df.count() == expect
