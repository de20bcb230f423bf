"""Structured Streaming pipelines over the events table.

oamap has no streaming surface (absent from oamap/operations.py [H]);
this is the §7.7 extension: the same events analytics, expressed as
incremental plans. Each pipeline reads the events parquet as a file
stream (schema pinned from a batch read — required by readStream),
applies watermark/window/state, and drains with trigger(availableNow)
into a memory sink so the driver contract (batch DataFrame out) and
the DuckDB oracle still apply. At scale the identical plan runs
against a live file/Kafka source with the same semantics — that is
the point of Structured Streaming's unified model.

Windowed/session aggregations drain in append mode: a window emits
exactly once when the watermark finalizes it (window_end ≤ max event
time − delay) and its state is evicted, so the plans are safe on a
true unbounded source; the oracles clip to the same finalization
line. Complete mode is reserved for genuinely-retained state with a
bounded keyspace (stream-static enrich counts, latest-per-user).
"""

from __future__ import annotations

import contextlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextlib.contextmanager
def stream_shuffle_partitions(spark: SparkSession):
    """Size stateful-stream shuffle partitions to state volume, not to
    the session's batch default (r11, guide §2.2 "fewer, larger
    partitions"). A stateful streaming query bakes
    ``spark.sql.shuffle.partitions`` into its state layout at first
    start, AQE never coalesces it, and EVERY micro-batch then pays one
    state-store commit (and, for the Python stateful path, one Arrow
    worker round-trip) per partition — at the bench SFs the per-batch
    state is a few thousand keys, so 32-200 partitions are pure
    per-batch overhead (measured at sf0.1: stream_stateful_user_counts
    15.0 s at 32 partitions → 2.8 s at 8). These pipelines create a
    fresh checkpoint per run, so the count is free to choose here; a
    production deployment sizes it to stateful-key volume via
    $SPARK_GRAFT_STREAM_SHUFFLE (state layout is fixed for the life of
    a checkpoint, so pick for the target scale, not the first day).
    Batch jobs inside foreachBatch bodies inherit the same setting
    while the stream runs; AQE still coalesces those by size. The
    session value is restored on exit — the driver owns the session.
    """
    n = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

_sink_ids = itertools.count()


def _stream_dir(sf_dir: str) -> str:
    """The file-stream source wants a directory it can monitor; the
    testdata ships single .parquet files. Build (once) a /tmp dir per
    sf containing a symlink to the events file — on a real deployment
    the source would already be a landing directory."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join("/tmp", "oamap_spark_stream", key, "events")
    link = os.path.join(d, "events.parquet")
    target = os.path.join(sf_dir, "events.parquet")
    if not os.path.islink(link):
        os.makedirs(d, exist_ok=True)
        try:
            os.symlink(target, link)
        except FileExistsError:
            # only tolerable if a concurrent run won the check-then-
            # create race with the SAME target; a pre-existing regular
            # file or foreign symlink would silently stream stale data
            if not (os.path.islink(link) and os.readlink(link) == target):
                raise
    elif os.readlink(link) != target:
        raise RuntimeError(
            f"stream staging link {link!r} points at "
            f"{os.readlink(link)!r}, expected {target!r} — remove it"
        )
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as a file stream, normalized to the same
    (``ts_ns`` bigint, ``ts`` µs-timestamp) pair as the batch loader
    (:func:`oamap_spark.sources.tables.normalize_events`) so stream and
    batch plans share semantics whatever the parquet ts encoding is."""
    from oamap_spark.sources.tables import normalize_events

    path = _stream_dir(sf_dir)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    return normalize_events(raw)


def drain_to_memory(
    stream: DataFrame, *, output_mode: str, spark: SparkSession
) -> DataFrame:
    """Run a bounded replay of the stream (availableNow) into a memory
    sink and return the sink as a batch DataFrame."""
    name = f"oamap_stream_sink_{next(_sink_ids)}"
    with stream_shuffle_partitions(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def tumbling_counts(events: DataFrame, *, watermark: str = "1 day") -> DataFrame:
    """1-day tumbling windows per event_type: count + value sum.
    Watermark bounds state at scale (windows older than max-event-time
    − 1 day are finalized and evicted)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "sum_value")
    )


def streaming_distinct_keys(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup: first-seen wins per (user_id,
    event_type); emits each key once. State is one entry per distinct
    key — the watermarked variant (dropDuplicatesWithinWatermark)
    bounds it in time for unbounded sources."""
    return events.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def user_sessions(events: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions with an inactivity gap via session_window —
    Spark merges events closer than the gap into one [start, end)
    session; equivalent to the batch islands (lag > gap ⇒ new island)
    formulation. One streaming aggregation only: per-user rollups
    happen batch-side on the drained sink (chained stateful aggs are
    not supported in a single streaming query)."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: enrich each streaming micro-batch with a
    batch dimension table. The static side is re-planned per
    micro-batch (picking up dim refreshes) and broadcast when small —
    the standard 100 TB pattern for attaching slowly-changing
    dimensions to an event firehose without a stateful join."""
    return events.join(F.broadcast(dim), on, how)


def dedup_within_watermark(events: DataFrame, keys: list[str], delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with *time-bounded* state:
    dropDuplicatesWithinWatermark keeps a key's state only until the
    watermark passes its event time, so an unbounded source can't grow
    state forever (plain dropDuplicates state is unbounded). Duplicates
    arriving within the delay window are suppressed; each key is
    emitted once, on first arrival (append mode)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)


def view_purchase_interval_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    purchases within 1 hour AFTER a view by the same user. Both sides
    carry watermarks and the join condition bounds event-time distance,
    so each side's state is evictable — the canonical funnel join that
    runs unchanged on an unbounded source. (A self-join: both streams
    are filtered branches of the same events source.)"""
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 day")
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 day")
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("gap_us"),
        )
    )


def view_purchase_interval_join_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER variant of the stream-stream interval join: views
    with no purchase within the hour emit a null match — but only once
    the watermark proves no match can still arrive. On a bounded
    availableNow replay that finalization line is
    ``view_ts + 1h < max(ts) − watermark_delay``; views younger than
    it remain in state at termination and are NOT emitted (exactly
    what a restart would resume with)."""
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 day")
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 day")
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        .select("view_id", "user_id", "purchase_id")
    )


def foreach_batch_upsert_latest(
    events: DataFrame, spark: SparkSession, target_dir: str
) -> None:
    """Streaming UPSERT sink via ``foreachBatch``: each micro-batch
    merges its per-user latest event into a parquet target keyed by
    user_id — the lakehouse merge pattern with plain parquet (no ACID
    table format in this container, so the merge is read-union-dedup-
    overwrite per batch; on Delta/Iceberg the identical foreachBatch
    body would issue MERGE INTO and the rest of the plan is
    unchanged). Winner per key is max(ts_us, event_id) — the µs-exact
    (ts_ns div 1000) key both engines agree on (the shared events-
    timestamp convention, see pointer_self_prev_event) — a keyed
    comparison, so the final state is independent of micro-batch
    arrival order and replays idempotently."""
    from pyspark.sql import Window
    from pyspark.sql.utils import AnalysisException

    def upsert(batch: DataFrame, batch_id: int) -> None:
        updates = batch.select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("ts_ns div 1000").alias("ts_us"),
        )
        bspark = batch.sparkSession
        try:
            current = bspark.read.parquet(target_dir)
            merged = current.unionByName(updates)
        except AnalysisException as exc:
            # ONLY the first-batch missing-target case may fall through
            # to "start fresh"; any other failure (corrupt target,
            # schema drift, transient IO) must raise — silently
            # replacing accumulated state with one batch would emit
            # wrong results, not an error.
            if "PATH_NOT_FOUND" not in str(exc) and "does not exist" not in str(exc):
                raise
            merged = updates
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # materialize before overwrite: the plan reads the same files
        # it is about to replace
        latest.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            target_dir
        )

    with stream_shuffle_partitions(spark):
        q = (
            events.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", target_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def staged_documents_slices(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> str:
    """documents split into ``n_slices`` ordered arrival slices (by
    source number), one parquet file each with increasing mtime, so
    ``maxFilesPerTrigger=1`` + availableNow replays one micro-batch
    per slice — the continuous-ingestion shape for the streaming
    incremental-dedup pipeline. Slices are written by SPARK (coalesce
    to one part file, renamed into place — no table data through the
    driver) into a fresh mkdtemp per invocation (concurrent runs
    never race; swept at process exit, sources/staging.py)."""
    import glob
    import shutil

    from oamap_spark.sources.staging import staging_path

    out = staging_path("oamap_docstream_", "slices")
    os.makedirs(out, exist_ok=True)
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src_num = F.substring("source", 4, 10).cast("int")
    per = 20 // n_slices  # sources are src0..src19 at every SF
    # ONE partitioned write instead of n_slices coalesce(1) jobs (r12,
    # guide §5 driver round-trips): repartition by the slice id gives
    # each slice value a single task, so every __slice=<i> directory
    # holds exactly one part file, renamed into the flat mtime-ordered
    # layout the maxFilesPerTrigger=1 replay consumes.
    slice_id = F.least(
        F.floor(src_num / F.lit(per)).cast("int"), F.lit(n_slices - 1)
    )
    tmp = os.path.join(out, "_tmp_slices")
    (
        d.withColumn("__slice", slice_id)
        .repartition(n_slices, "__slice")
        .write.partitionBy("__slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    for i in range(n_slices):
        (pf,) = glob.glob(os.path.join(tmp, f"__slice={i}", "part-*.parquet"))
        dst = os.path.join(out, f"slice_{i:02d}.parquet")
        os.rename(pf, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
    shutil.rmtree(tmp)
    return out


def latest_gen(asg_dir: str, below: int | None = None) -> int | None:
    """Largest ``gen=<N>`` partition id under ``asg_dir`` (optionally
    strictly below ``below`` — the replay-idempotency restriction), or
    None when no generation exists. Filesystem listing only, no Spark
    job. One body for the parsing that was duplicated between the
    maintenance batch fold and the query-side readback (r11 review,
    SCALE.md r12 queue)."""
    import glob

    gens = [
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(asg_dir, "gen=*"))
    ]
    if below is not None:
        gens = [g for g in gens if g < below]
    return max(gens) if gens else None


def _batch_partitions(d: str, below: int) -> set[int]:
    """Batch ids of the ``batch=<id>`` partitions present under ``d``
    that are strictly below ``below`` — a filesystem listing, no Spark
    job. Used to validate that the accumulated band table COVERS the
    ids index before trusting it (ADVICE r11 high)."""
    import glob

    return {
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(d, "batch=*"))
        if int(os.path.basename(p).split("=")[1]) < below
    }


def incremental_dedup_batch_body(
    batch: DataFrame, batch_id: int, index_dir: str, pairs_dir: str
) -> None:
    """One micro-batch of the continuous-ingestion dedup loop —
    module-level so the replay-idempotency contract is directly
    testable (call it twice with the same batch_id: the second run
    must leave both partitions byte-identical in content). See
    :func:`foreach_batch_incremental_minhash` for the invariants."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from oamap_spark.cache import track
    from oamap_spark.operators.dedup import (
        BAND_ROWS,
        MINHASH_K,
        N_BANDS,
        _explode_bands,
        flagged_shingle_ids_table,
        minhash_lsh_pairs_incremental,
        minhash_signature,
    )

    bspark = batch.sparkSession
    arr = flagged_shingle_ids_table(
        batch.withColumn("__nw", F.lit(True)), "doc_id", "text", "__nw", 3
    )
    # arrival band table, computed ONCE and tracked: the probe's
    # arrival half reads it AND it is what accumulates into the corpus
    # band table — before r12 the arrivals were minhashed twice per
    # micro-batch, once inside the pair probe and once for the bands
    # write (VERDICT r11 "Next round #5"). Layout comes from the
    # shared module constants so the persisted table can never desync
    # from the probe's defaults (ADVICE r11 #3).
    arr_bands = track(
        _explode_bands(
            arr.select(
                "id", minhash_signature(F.col("ids"), MINHASH_K).alias("sig")
            ),
            N_BANDS,
            BAND_ROWS,
        )
    )
    # the corpus BAND table accumulates beside the ids index (r11:
    # same lever as the steady-state probes' persisted band table —
    # without it every micro-batch recomputes the k=16 minhashes over
    # the WHOLE accumulated corpus, an O(corpus)/batch term that grows
    # with every batch; with it the corpus half of the band join is a
    # columnar scan and only arrivals are hashed). Derived path, not a
    # new parameter, so replay-idempotency callers are unchanged.
    bands_dir = index_dir.rstrip("/") + "_bands"
    corpus_bands = None
    try:
        # batch < batch_id: a REPLAYED micro-batch (at-least-once
        # foreachBatch) must not read its own first attempt's
        # signatures back as corpus — duplicate ids would fan every
        # verify-join pair out 2-4x in the rewritten partition
        corpus = (
            bspark.read.parquet(index_dir)
            .where(F.col("batch") < batch_id)
            .select("id", F.lit(False).alias("is_new"), "ids")
        )
        ids_df = corpus.unionByName(arr)
        # COVERAGE check, not existence (ADVICE r11 high): on the
        # pre-bands upgrade path the first post-upgrade batch writes
        # only its own bands partition, so a bare existence check
        # would let every later batch treat that one partition as the
        # complete corpus band table and silently drop every
        # arrival-vs-old-corpus pair. Any index batch whose bands
        # partition is missing is BACKFILLED here from its persisted
        # ids (deterministic band keys → replay/backfill idempotent;
        # one-time cost, after which the loop is covered forever).
        idx_batches = _batch_partitions(index_dir, batch_id)
        for b in sorted(idx_batches - _batch_partitions(bands_dir, batch_id)):
            _explode_bands(
                bspark.read.parquet(os.path.join(index_dir, f"batch={b}"))
                .select(
                    "id",
                    minhash_signature(F.col("ids"), MINHASH_K).alias("sig"),
                ),
                N_BANDS,
                BAND_ROWS,
            ).write.mode("overwrite").parquet(
                os.path.join(bands_dir, f"batch={b}")
            )
        if idx_batches:
            corpus_bands = (
                bspark.read.parquet(bands_dir)
                .where(F.col("batch") < batch_id)
                .select("id", "band_idx", "band_key")
            )
    except AnalysisException as exc:
        # ONLY the first-batch missing-index case may start empty;
        # any other failure must raise — a silently-dropped index
        # would re-emit nothing for true cross-batch dups.
        if "PATH_NOT_FOUND" not in str(exc) and "does not exist" not in str(exc):
            raise
        ids_df = arr
        corpus_bands = None
    pairs = minhash_lsh_pairs_incremental(
        None, "doc_id", "text", "__nw", ids_df=ids_df,
        corpus_bands_df=corpus_bands, arrival_bands_df=arr_bands,
    )
    # pairs BEFORE index/bands writes: the pair plan reads both dirs
    # and must not see this batch's own rows on the corpus side
    pairs.write.mode("overwrite").parquet(
        os.path.join(pairs_dir, f"batch={batch_id}")
    )
    # index + bands writes are independent of each other and both read
    # the tracked arr/arr_bands caches the pairs write just
    # materialized — run them as concurrent jobs (guide §2.6) instead
    # of two serial driver round-trips. Same per-batch overwrite
    # idempotency as before; band keys are deterministic per document,
    # so a replay is byte-equal.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fi = pool.submit(
            lambda: arr.select("id", "ids")
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, f"batch={batch_id}"))
        )
        fb = pool.submit(
            lambda: arr_bands.write.mode("overwrite").parquet(
                os.path.join(bands_dir, f"batch={batch_id}")
            )
        )
        fi.result()
        fb.result()
    arr.unpersist()
    arr_bands.unpersist()


def foreach_batch_incremental_minhash(
    docs: DataFrame, spark: SparkSession, index_dir: str, pairs_dir: str
) -> None:
    """Streaming continuous-ingestion near-dedup (foreachBatch): each
    micro-batch of documents is deduped against the ACCUMULATED corpus
    via the asymmetric incremental band join
    (operators/dedup.py:minhash_lsh_pairs_incremental), fed from a
    persisted parquet signature index — the batch tokenizes ONLY its
    own documents; the corpus half is read back as cached shingle-id
    arrays written by earlier batches (a production index would
    persist band keys too; the ids table is the part whose rebuild
    costs a corpus re-scan, which is what this avoids).

    Every near-dup pair is emitted exactly ONCE — in the micro-batch
    where its LATER member arrives (same-batch pairs once, by the
    probe-direction discipline) — so the accumulated pairs table
    equals the one-shot batch pair list regardless of how the stream
    was sliced: that invariant is what lets the DuckDB oracle replay
    the plain batch pipeline against a streaming query's output.

    foreachBatch is at-least-once, so exactly-once must be engineered
    at the sink: both writes land in a deterministic per-batch
    subdirectory (``batch=<batch_id>``) with ``overwrite`` — a
    replayed micro-batch rewrites its own partition instead of
    double-appending pairs (or duplicating index rows, which would
    multiply verify-join output). Readers see ``batch`` as a
    discovered partition column and project it away."""
    def body(batch: DataFrame, batch_id: int) -> None:
        incremental_dedup_batch_body(batch, batch_id, index_dir, pairs_dir)

    with stream_shuffle_partitions(spark):
        q = (
            docs.writeStream.foreachBatch(body)
            .option("checkpointLocation", pairs_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def cluster_maintenance_batch_body(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    asg_dir: str,
) -> None:
    """One micro-batch of the continuous CLUSTER-MAINTENANCE loop:
    the incremental-dedup body first (this batch's arrival-touching
    pairs vs the accumulated signature index), then the assignment
    fold — the batch's pairs merge into the previous generation via
    operators/clustering.py:apply_components_update, and the NEXT
    generation lands at ``gen=<batch_id>``.

    Replay idempotency (foreachBatch is at-least-once): a replayed
    batch folds against the latest generation STRICTLY BELOW its own
    id — never its own first attempt — and ``overwrite``s its own
    generation directory; apply_components_update is deterministic
    and idempotent on its inputs, so the rewrite is byte-equal in
    content. Module-level so the contract is directly testable."""
    from oamap_spark.operators.clustering import apply_components_update

    incremental_dedup_batch_body(batch, batch_id, index_dir, pairs_dir)
    bspark = batch.sparkSession
    pairs = bspark.read.parquet(
        os.path.join(pairs_dir, f"batch={batch_id}")
    ).select("id_a", "id_b")
    gen = latest_gen(asg_dir, below=batch_id)
    if gen is not None:
        asg = bspark.read.parquet(os.path.join(asg_dir, f"gen={gen}"))
    else:  # first batch: no prior state
        asg = bspark.createDataFrame([], "node long, cluster_id long")
    apply_components_update(asg, pairs).write.mode("overwrite").parquet(
        os.path.join(asg_dir, f"gen={batch_id}")
    )


def foreach_batch_cluster_maintenance(
    docs: DataFrame,
    spark: SparkSession,
    index_dir: str,
    pairs_dir: str,
    asg_dir: str,
) -> None:
    """Streaming continuous-ingestion CLUSTERING: every micro-batch
    extends :func:`foreach_batch_incremental_minhash`'s loop with the
    policy layer — near-dup edges fold into a generation-versioned
    cluster assignment, so at any point ``gen=<latest>`` IS the
    corpus's current duplicate-cluster state (what a decontamination
    or keeper pass would consume), without any batch ever re-reading
    corpus text or re-shuffling the corpus graph. The final
    generation equals one-shot batch clustering over the full pair
    list however the stream was sliced — the incremental pair
    emission is exactly-once per pair, and apply_components_update
    folds to the same fixpoint in any arrival order (both halves of
    that claim are driver-gated through the recursive-CTE oracle)."""

    def body(batch: DataFrame, batch_id: int) -> None:
        cluster_maintenance_batch_body(
            batch, batch_id, index_dir, pairs_dir, asg_dir
        )

    with stream_shuffle_partitions(spark):
        q = (
            docs.writeStream.foreachBatch(body)
            .option("checkpointLocation", asg_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
