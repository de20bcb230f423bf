"""tools/plan_census.py — the node counters and the regression diff.

The census itself is a round-end ritual (full registry, minutes); these
pin the two pieces it depends on: ``plan_counts`` reads the right node
headers off real plans, and ``diff_vs_baseline`` fails on exactly the
three scale-relevant counters (exchanges, python_eval, nested_loop)
while letting broadcast/codegen drift pass.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tools import plan_census


def test_plan_counts_groupby_has_one_exchange(spark):
    df = (
        spark.range(100)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    c = plan_census.plan_counts(df)
    assert c["exchanges"] == 1
    assert c["python_eval"] == 0
    assert c["nested_loop"] == 0


def test_plan_counts_broadcast_join_no_shuffle(spark):
    fact = spark.range(1000).withColumn("k", F.col("id") % 5)
    dim = spark.range(5).withColumnRenamed("id", "k").withColumn(
        "name", F.concat(F.lit("d"), F.col("k"))
    )
    j = fact.join(F.broadcast(dim), "k")
    c = plan_census.plan_counts(j)
    assert c["broadcasts"] == 1
    assert c["exchanges"] == 0


def test_plan_counts_sees_nested_loop(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    c = plan_census.plan_counts(a.join(b, a.id < F.col("id2")))
    assert c["nested_loop"] == 1


def test_diff_flags_only_scale_counters(tmp_path, monkeypatch):
    base = {
        "q": {"exchanges": 1, "broadcasts": 2, "python_eval": 0,
              "nested_loop": 0, "codegen": 3},
    }
    p = tmp_path / "baseline.json"
    p.write_text(json.dumps(base))
    monkeypatch.setattr(plan_census, "BASELINE_PATH", str(p))

    # benign drift: broadcasts/codegen moved — passes
    ok = dict(base["q"], broadcasts=1, codegen=5)
    assert plan_census.diff_vs_baseline({"q": ok}) == []

    # exchange regression — fails
    bad = dict(base["q"], exchanges=2)
    msgs = plan_census.diff_vs_baseline({"q": bad})
    assert any("REGRESSION q.exchanges: 1 -> 2" in m for m in msgs)

    # unknown query — explicit, so a new query can't silently skip the gate
    msgs = plan_census.diff_vs_baseline({"q2": base["q"]})
    assert any(m.startswith("NEW q2") for m in msgs)

    # fewer exchanges than baseline — an improvement, passes
    better = dict(base["q"], exchanges=0)
    assert plan_census.diff_vs_baseline({"q": better}) == []
