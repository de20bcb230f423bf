"""Edge-case robustness: empty inputs, all-filtered corpora, single
rows — oamap's masked/empty-list variants are where nested-data bugs
live (SURVEY §5), and a dedup/similarity operator that crashes on an
empty partition is not a 100 TB operator."""

from __future__ import annotations

import oamap_spark as oa
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oamap_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_minhash_lsh_on_empty_corpus(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert minhash_lsh_pairs(empty, "doc_id", "text").count() == 0


def test_minhash_lsh_single_doc(spark):
    one = spark.createDataFrame([(1, "a b c d")], DOC_SCHEMA)
    assert minhash_lsh_pairs(one, "doc_id", "text").count() == 0


def test_minhash_lsh_short_docs(spark):
    """Docs shorter than the shingle width use the whole-stream
    fallback id: identical short docs must still pair."""
    df = spark.createDataFrame([(1, "xy"), (2, "xy"), (3, "zq")], DOC_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df, "doc_id", "text").collect()}
    assert pairs == {(1, 2)}


def test_exact_dedup_no_duplicates_is_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b a")], DOC_SCHEMA)
    assert exact_dedup_groups(df, "doc_id", "text").count() == 0


def test_structural_ops_on_all_filtered(spark):
    """filter→define→reduce over zero surviving rows: aggregates
    return their empty-input identities, not errors."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    none = oa.filter_(li, F.col("l_quantity") < -1)
    out = oa.reduce_(none, F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
    row = out.collect()[0]
    assert row["n"] == 0 and row["s"] is None


def test_union_encode_null_tag_rows(spark):
    """A null tag yields all-null slots (masked union), not a crash."""
    df = spark.createDataFrame([(1, None), (2, 0)], "id long, tag int")
    u = oa.union_encode(F.col("tag"), [("a", F.col("id") * 2), ("b", F.col("id") * 3)])
    rows = {r["id"]: r["u"] for r in df.select("id", u.alias("u")).collect()}
    assert rows[1]["tag"] is None and rows[1]["a"] is None and rows[1]["b"] is None
    assert rows[2]["tag"] == 0 and rows[2]["a"] == 4 and rows[2]["b"] is None


def test_resolve_pointer_empty_target(spark):
    sup = load_table(spark, SF_SMOKE, "supplier")
    empty_nat = spark.createDataFrame(
        [], "n_nationkey int, n_name string"
    )
    out = oa.resolve_pointer(sup, "s_nationkey", empty_nat, "n_nationkey", ["n_name"])
    assert out.count() == sup.count()
    assert all(r["n_name"] is None for r in out.select("n_name").collect())


def test_heavy_hitters_empty_and_tiny_streams(spark):
    """Empty stream → empty result (no division-by-zero on the bound);
    a 1-row stream → that item (count 1 ≥ ceil(frac·1))."""
    from pyspark.sql import functions as F

    from oamap_spark.operators.heavyhitters import heavy_hitters

    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty, "item", 0.01, capacity=512).count() == 0
    one = spark.createDataFrame([("t",)], ["item"])
    got = heavy_hitters(one, "item", 0.01, capacity=512).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("t", 1)]


def test_pointer_depth_root_single_node_and_empty(spark):
    """A forest of one root resolves to itself at depth 0; an empty
    forest converges immediately to an empty result."""
    from pyspark.sql import functions as F

    from oamap_spark.operators.links import pointer_depth_root

    one = spark.createDataFrame([(5, None)], "id long, parent long")
    got = pointer_depth_root(one, "id", "parent").collect()
    assert [(r["node"], r["root_id"], r["depth"]) for r in got] == [(5, 5, 0)]
    empty = spark.createDataFrame([], "id long, parent long")
    assert pointer_depth_root(empty, "id", "parent").count() == 0


def test_simhash_empty_text_docs(spark):
    """Docs whose tokenization yields no ids get signature 0 on both
    the Arrow and native paths — and never crash the popcount batch."""
    from pyspark.sql import functions as F

    from oamap_spark.functions import text as X

    df = spark.createDataFrame([("",), ("a a a",)], ["text"]).select(
        X.token_ids("text").alias("ids")
    )
    rows = df.select(
        X.simhash32(F.col("ids")).alias("a"),
        X.simhash32_native(F.col("ids")).alias("n"),
    ).collect()
    for r in rows:
        assert r["a"] == r["n"]
