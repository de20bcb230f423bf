"""Pointer/Union combinator tests — round-trip shapes oamap's test
suite exercised (proxy == original deep-compare; here: encode/dispatch
and deref/lag equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.operators import links as L
from oamap_spark.plans import audit
from oamap_spark.plans.verify import compare_query
from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

import __spark_entry__ as entrymod


def test_union_exactly_one_live_slot(spark):
    """Union invariant: per row, the slot selected by the tag is the
    only non-null variant (given non-null inputs)."""
    ev = load_table(spark, SF_SMOKE, "events")
    tag = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type").isin("view", "click"), 1)
        .otherwise(2)
    )
    u = L.union_encode(
        tag,
        [
            ("amount", F.col("value")),
            ("engagement", F.lit(1).cast("long")),
            ("marker", F.col("event_id")),
        ],
    )
    rows = ev.select(u.alias("u")).select("u.*").collect()
    for r in rows:
        live = [r["amount"] is not None, r["engagement"] is not None, r["marker"] is not None]
        assert live[r["tag"]]
        assert sum(live) == 1


def test_union_case_matches_direct_case(spark):
    """Dispatch through the union must equal the straight CASE over
    the raw columns (two-implementations oracle)."""
    ev = load_table(spark, SF_SMOKE, "events")
    tag = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    u = L.union_encode(tag, [("a", F.col("value")), ("b", F.col("event_id").cast("double"))])
    via_union = ev.withColumn("u", u).select(
        "event_id", L.union_case(F.col("u"), F.col("u.a") * 2, F.col("u.b") + 1).alias("x")
    )
    direct = ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value") * 2)
        .otherwise(F.col("event_id").cast("double") + 1)
        .alias("x"),
    )
    assert sorted(map(tuple, via_union.collect())) == sorted(map(tuple, direct.collect()))


def test_pointer_deref_null_for_dangling(spark):
    """A pointer with no matching target row yields null fields
    (masked pointer), not a dropped row, under how='left'."""
    sup = load_table(spark, SF_SMOKE, "supplier").withColumn(
        "s_nationkey", F.when(F.col("s_suppkey") % 7 == 0, F.lit(999)).otherwise(F.col("s_nationkey"))
    )
    nat = load_table(spark, SF_SMOKE, "nation")
    out = L.resolve_pointer(sup, "s_nationkey", nat, "n_nationkey", ["n_name"])
    rows = out.collect()
    assert len(rows) == sup.count()
    dangling = [r for r in rows if r["s_nationkey"] == 999]
    assert dangling and all(r["n_name"] is None for r in dangling)


def test_pointer_deref_broadcasts(spark):
    ev = entrymod.queries()["pointer_deref_supplier_nation"](spark, SF_SMOKE)
    assert audit.broadcast_join_count(ev) >= 1


def test_pointer_union_oracles(spark):
    q, o = entrymod.queries(), entrymod.oracle_sql()
    for name in (
        "pointer_deref_supplier_nation",
        "pointer_self_prev_event",
        "union_event_payload",
    ):
        errs = compare_query(spark, SF_SMOKE, q[name], o[name])
        assert not errs, f"{name}: {errs}"
