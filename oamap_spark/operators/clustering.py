"""Duplicate-cluster resolution: connected components over near-dup
pair edges (beyond the reference — SURVEY §2.D's LLM-pipeline surface).

Pair-emitting dedup (MinHash LSH, SimHash bands, Jaccard) gives edges;
an actual dedup pipeline needs *clusters* — every document labeled
with the canonical (min) id of its duplicate group, so one keeper per
group survives. Transitivity matters: A~B and B~C put A,C in one
group even when A~C was never emitted.

Algorithm: min-label propagation. Each node starts labeled with its
own id; every iteration each node takes the min of its own and its
neighbors' labels; converged when no label changes. Iterations =
cluster diameter, which for near-dup graphs is tiny (duplicate groups
are near-cliques — 2–4 hops). Each iteration is one shuffle
(edge⋈label join + min-agg); the driver loop only checks a scalar
convergence count, all data stays distributed. For 100 TB graphs with
adversarial diameters the same loop accepts the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) — swap the neighbor-min step; the fixpoint
contract is identical.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_min_id(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve pair edges into components: returns (node, cluster_id)
    for every node appearing in `pairs`, cluster_id = min node id
    reachable through the edge set (self included).

    Exact fixpoint, not an approximation: the loop stops only when an
    iteration changes zero labels (or max_iter, which raises — a
    silent cap would mislabel clusters)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iter} iterations"
        )

    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_keepers(
    df: DataFrame, id_col: str, components: DataFrame
) -> DataFrame:
    """Apply cluster labels as a dedup policy: keep rows that are their
    cluster's canonical (min-id) member, plus all rows with no
    duplicate edges at all (anti-join against the component node set
    — nodes absent from `components` are singletons)."""
    keep_ids = components.where(F.col("node") == F.col("cluster_id")).select("node")
    in_graph = df.join(
        components.select("node"), df[id_col] == F.col("node"), "left_semi"
    )
    singletons = df.join(
        components.select("node"), df[id_col] == F.col("node"), "left_anti"
    )
    canonical = in_graph.join(keep_ids, df[id_col] == F.col("node"), "left_semi")
    return canonical.unionByName(singletons)
