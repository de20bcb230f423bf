"""Native-expression vs pandas_udf equivalence — the Spark image of
oamap's interpreted-vs-compiled oracle (tests/test_compiler.py [M]:
same fcn through proxies and through Numba must agree). Here: the
same computation through Catalyst codegen and through Arrow-batched
Python must agree bit-for-bit (both are IEEE doubles over the same
values)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_quality_score_native_vs_pandas_udf(spark):
    """Per-doc token-count via native split/size vs a pandas_udf."""
    docs = load_table(spark, SF_SMOKE, "documents")
    native = _collect_map(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n")), "doc_id", "n"
    )

    @F.pandas_udf("int")
    def n_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")

    py = _collect_map(docs.select("doc_id", n_tokens("text").alias("n")), "doc_id", "n")
    assert native == py


def test_revenue_expression_native_vs_pandas_udf(spark):
    """l_extendedprice*(1-l_discount): identical IEEE arithmetic on
    both paths ⇒ exact equality, not approx."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    native = _collect_map(
        li.select(
            "l_orderkey",
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .over(Window.partitionBy("l_orderkey"))
            .alias("r"),
        ).dropDuplicates(["l_orderkey"]),
        "l_orderkey",
        "r",
    )

    @F.pandas_udf("double")
    def revenue(p: pd.Series, d: pd.Series) -> pd.Series:
        return p * (1 - d)

    py = _collect_map(
        li.select("l_orderkey", revenue("l_extendedprice", "l_discount").alias("v"))
        .groupBy("l_orderkey")
        .agg(F.sum("v").alias("r")),
        "l_orderkey",
        "r",
    )
    assert set(native) == set(py)
    for k in native:
        assert native[k] == pytest.approx(py[k], rel=1e-12)


def test_filter_predicate_native_vs_pandas_udf(spark):
    """oamap filter(fcn): the native predicate and the Python
    predicate must select identical row sets."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    native = {
        r["l_orderkey"]
        for r in li.where(
            (F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")
        ).select("l_orderkey").collect()
    }

    @F.pandas_udf("boolean")
    def pred(q: pd.Series, f: pd.Series) -> pd.Series:
        return (q > 30) & (f == "R")

    py = {
        r["l_orderkey"]
        for r in li.where(pred("l_quantity", "l_returnflag")).select("l_orderkey").collect()
    }
    assert native == py
