"""Unit tests for the oamap-15 combinators (SURVEY §2.A) on nested
fixtures shaped like FIXTURES.md §B (stars→planets, hep events).
Mirrors the reference's round-trip test pattern: build nested rows,
apply an op, assert exact expected structure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from oamap_spark.operators import structural as ops


@pytest.fixture(scope="module")
def stars(spark):
    rows = [
        Row(
            star_id=1,
            name="alpha",
            mass=1.1,
            planets=[
                Row(pname="a", pmass=0.5, period=10.0, radius=1.0),
                Row(pname="b", pmass=None, period=20.0, radius=2.0),
            ],
        ),
        Row(star_id=2, name="beta", mass=None, planets=[]),
        Row(
            star_id=3,
            name="gamma",
            mass=2.2,
            planets=[Row(pname="c", pmass=3.5, period=5.0, radius=0.5)],
        ),
    ]
    return spark.createDataFrame(rows)


def _by_id(df):
    return {r["star_id"]: r for r in df.collect()}


def test_fieldname_top(stars):
    out = ops.fieldname(stars, "star_name", "name")
    assert "star_name" in out.columns and "name" not in out.columns


def test_fieldname_nested(stars):
    out = ops.fieldname(stars, "planet_name", "planets.pname")
    row = _by_id(out)[1]
    assert row["planets"][0]["planet_name"] == "a"
    assert "pname" not in row["planets"][0].asDict()


def test_project_into_list(stars):
    out = ops.project(stars, "planets")
    names = sorted(r["pname"] for r in out.collect())
    assert names == ["a", "b", "c"]


def test_project_leaf(stars):
    out = ops.project(stars, "planets.period")
    assert sorted(r[0] for r in out.collect()) == [5.0, 10.0, 20.0]


def test_keep_nested(stars):
    out = ops.keep(stars, "star_id", "planets.pname", "planets.radius")
    assert set(out.columns) == {"star_id", "planets"}
    elem = out.schema["planets"].dataType.elementType
    assert [f.name for f in elem.fields] == ["pname", "radius"]


def test_drop_nested(stars):
    out = ops.drop(stars, "mass", "planets.pmass")
    assert "mass" not in out.columns
    elem = out.schema["planets"].dataType.elementType
    assert "pmass" not in [f.name for f in elem.fields]


def test_split_merge_roundtrip(spark):
    df = spark.createDataFrame([Row(id=1, s=Row(x=10, y=20))])
    flat = ops.split(df, "s.x")
    assert set(flat.columns) == {"id", "s", "x"}
    assert flat.collect()[0]["x"] == 10
    back = ops.merge(flat.select("id", "x"), "s2", "x")
    assert back.collect()[0]["s2"]["x"] == 10


def test_parents(stars):
    out = ops.parents(stars, "star", "planets", ["star_id", "name"])
    row = _by_id(out)[1]
    assert row["planets"][0]["star"]["name"] == "alpha"


def test_index(stars):
    out = ops.index(stars, "pos", "planets")
    row = _by_id(out)[1]
    assert [p["pos"] for p in row["planets"]] == [0, 1]


def test_tomask(stars):
    out = ops.tomask(stars, "planets.period", 10.0)
    row = _by_id(out)[1]
    assert row["planets"][0]["period"] is None
    assert row["planets"][1]["period"] == 20.0


def test_tomask_range(stars):
    out = ops.tomask(stars, "mass", 1.0, 2.0)
    d = _by_id(out)
    assert d[1]["mass"] is None and d[3]["mass"] == 2.2


def test_flatten_list_of_lists(spark):
    df = spark.createDataFrame([Row(id=1, xs=[[1, 2], [], [3]])])
    out = ops.flatten(df, "xs")
    assert out.collect()[0]["xs"] == [1, 2, 3]


def test_flatten_top_level_list(stars):
    out = ops.flatten(stars, "planets")
    assert out.count() == 4  # 2 + 1(null from empty) + 1
    got = [r["planets"]["pname"] if r["planets"] else None for r in out.collect()]
    assert sorted(x for x in got if x) == ["a", "b", "c"]


def test_filter_rows(stars):
    out = ops.filter_(stars, F.col("star_id") > 1)
    assert sorted(r["star_id"] for r in out.collect()) == [2, 3]


def test_filter_nested(stars):
    out = ops.filter_(stars, lambda p: p["radius"] >= 1.0, at="planets")
    d = _by_id(out)
    assert len(d[1]["planets"]) == 2 and len(d[3]["planets"]) == 0


def test_define_nested(stars):
    out = ops.define(stars, "density", lambda p: p["pmass"] / p["radius"], at="planets")
    row = _by_id(out)[1]
    assert row["planets"][0]["density"] == 0.5
    assert row["planets"][1]["density"] is None  # null pmass propagates


def test_define_top(stars):
    out = ops.define(stars, "mass2", F.col("mass") * 2)
    assert _by_id(out)[1]["mass2"] == pytest.approx(2.2)


def test_map_exit(stars):
    out = ops.map_(stars, "pname", "period * 2 as period2", explode_at="planets")
    got = {r["pname"]: r["period2"] for r in out.collect()}
    assert got == {"a": 20.0, "b": 40.0, "c": 10.0}


def test_reduce(stars):
    out = ops.reduce_(
        ops.map_(stars, "pmass", explode_at="planets"),
        F.sum("pmass").alias("total"),
    )
    assert out.collect()[0]["total"] == pytest.approx(4.0)


def test_per_row_sublist_aggregate(stars):
    # oamap proxy-loop pattern (max planet mass per star) → aggregate()
    out = stars.select(
        "star_id",
        F.aggregate(
            F.filter("planets", lambda p: p["pmass"].isNotNull()),
            F.lit(None).cast("double"),
            lambda acc, p: F.greatest(acc, p["pmass"]),
        ).alias("max_pmass"),
    )
    d = {r["star_id"]: r["max_pmass"] for r in out.collect()}
    assert d == {1: 0.5, 2: None, 3: 3.5}
