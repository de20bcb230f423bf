"""Seeded distributed k-means (operators/kmeans.py): determinism under
repartitioning, fixed-point grid membership, and the banded embedding
dedup's recall-completeness vs the exact all-pairs form."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.functions import vectors as V
from oamap_spark.operators import kmeans as KM
from tests.conftest import SF_SMOKE


def _corpus(spark, n_parts=None):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    c = e.where(F.col("vec_id") >= 10).select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    return c.repartition(n_parts) if n_parts else c


def test_kmeans_centroids_stable_under_repartition(spark):
    """Integer fixed-point sums make the means associative: the trained
    model must be EXACTLY equal whatever the partitioning."""
    a = KM.kmeans_fit(_corpus(spark), "vec_id", "v", 8, 2)
    b = KM.kmeans_fit(_corpus(spark, 7), "vec_id", "v", 8, 2)
    assert a == b


def test_kmeans_centroids_on_grid(spark):
    """Every component sits on the 1e-6 fixed-point grid."""
    cents = KM.kmeans_fit(_corpus(spark), "vec_id", "v", 4, 1)
    for cv in cents.values():
        for x in cv:
            assert abs(x * KM.QUANT - round(x * KM.QUANT)) < 1e-6


def test_kmeans_improves_quantization_error(spark):
    """2 Lloyd iterations must not be worse than 0 (assignment cost is
    non-increasing per iteration)."""

    def cost(cents):
        df = _corpus(spark)
        structs = F.array(
            *[
                F.struct(
                    KM.l2sq(
                        F.col("v"), F.array(*[F.lit(float(c)) for c in cv])
                    ).alias("dist"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in sorted(cents.items())
            ]
        )
        return df.select(
            F.array_min(structs)["dist"].alias("d")
        ).agg(F.sum("d")).collect()[0][0]

    c0 = KM.kmeans_fit(_corpus(spark), "vec_id", "v", 8, 0)
    c2 = KM.kmeans_fit(_corpus(spark), "vec_id", "v", 8, 2)
    assert cost(c2) <= cost(c0) + 1e-9
