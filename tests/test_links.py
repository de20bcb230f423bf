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


# ---------------------------------------------------------------------------
# Recursive named schemas (SURVEY §1.3, §7.5): linked lists / trees as
# Pointer-to-named-ancestor, materialized as surrogate-key tables and
# traversed with iterative joins.
# ---------------------------------------------------------------------------

def test_recursive_named_schema_round_trip(spark):
    """The linked-list schema — a named Record whose `prev` field is a
    Pointer to the record ITSELF by name — must survive to_spark →
    from_spark and the JSON spec round-trip exactly (by-name targets
    keep the tree acyclic, so serialization terminates)."""
    from oamap_spark import schema as S

    node = S.Record(
        {
            "id": S.Primitive("int64"),
            "val": S.Primitive("float64"),
            "prev": S.Pointer("node", nullable=True),
        },
        name="node",
    )
    # names/pointers ride in FIELD metadata, so put the named node in
    # field position (root-level name loss is the documented
    # degradation) — as in any real table: rows: list<node>
    outer = S.Record({"n": node})
    st = S.to_spark(outer)
    inner = st["n"].dataType
    # the pointer field is a plain bigint surrogate key on the wire
    assert inner["prev"].dataType.typeName() == "long"
    assert S.from_spark(st) == outer
    assert S._from_spec(S._to_spec(node)) == node


def _linked_list_df(spark):
    # two chains: 1→2→3→4 (prev links), 10→11; heads have null prev
    rows = [
        (1, None), (2, 1), (3, 2), (4, 3),
        (10, None), (11, 10),
    ]
    return spark.createDataFrame(rows, "id long, prev long")


def test_iterate_pointer_fixed_steps(spark):
    """iterate_pointer(n) must match n Python dereferences, including
    the masked null once a walk steps off a chain head."""
    df = _linked_list_df(spark)
    truth = {1: None, 2: None, 3: 1, 4: 2, 10: None, 11: None}
    got = {
        r["id"]: r["ancestor_id"]
        for r in L.iterate_pointer(df, "id", "prev", 2).collect()
    }
    assert got == truth
    # n=0 is the identity walk
    got0 = {
        r["id"]: r["ancestor_id"]
        for r in L.iterate_pointer(df, "id", "prev", 0).collect()
    }
    assert got0 == {i: i for i in (1, 2, 3, 4, 10, 11)}


def test_pointer_depth_root_resolves_chains(spark):
    """Full traversal: every node labeled with its chain head and its
    distance to it, via O(log depth) pointer-doubling rounds."""
    df = _linked_list_df(spark)
    got = {
        r["node"]: (r["root_id"], r["depth"])
        for r in L.pointer_depth_root(df, "id", "prev").collect()
    }
    assert got == {
        1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3),
        10: (10, 0), 11: (10, 1),
    }


def test_recursive_tree_queries_match_oracles(spark):
    """The declared recursive-traversal queries against their
    WITH RECURSIVE DuckDB oracles (iterative-join vs truly recursive
    formulations must agree)."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for name in ("pointer_tree_root_depth", "pointer_tree_grandparent"):
        errs = compare_query(spark, SF_SMOKE, q[name], o[name])
        assert not errs, (name, errs)
