"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _wait_for_quiet(threshold: float, max_wait: float) -> tuple[float, float]:
    """Block until the 1-minute load average drops below ``threshold``
    or ``max_wait`` seconds pass; return (load_when_done, waited_sec).
    The r9 record was taken at loadavg 8.94 against the repo's own
    <3.0 quiet-run protocol (SCALE.md), smearing ~1.25× noise across
    half the headline set — the harness now enforces the protocol it
    documents instead of trusting the operator to."""
    waited = 0.0
    load = os.getloadavg()[0]
    while load > threshold and waited < max_wait:
        step = min(10.0, max_wait - waited)
        time.sleep(step)
        waited += step
        load = os.getloadavg()[0]
    return round(load, 2), round(waited, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Quiet-load protocol (VERDICT r9 "What's wrong #1" / ask #3):
    # refuse to start measuring on a loaded box — wait up to
    # $SPARK_GRAFT_BENCH_QUIET_WAIT (default 120 s) for the 1-min load
    # to drop under $SPARK_GRAFT_BENCH_MAX_LOAD (default 3.0). If it
    # never does, proceed but stamp ambient_load_warning into the
    # record so the round-over-round diff knows the artifact is dirty.
    load_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "3.0"))
    quiet_wait = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "120"))
    load_start, waited = _wait_for_quiet(load_thresh, quiet_wait)
    if waited:
        print(
            f"# quiet-load pre-flight: waited {waited}s, loadavg now "
            f"{load_start} (threshold {load_thresh})",
            file=sys.stderr,
        )

    from oamap_spark import cache
    from oamap_spark.queries import registry
    from oamap_spark.session import get_spark

    spark = get_spark("oamap-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so we measure query execution, not
    # session startup.
    bench = registry.bench_queries()
    first = next(iter(bench.values()))
    first(spark, sf_dir).count()

    # Self-diagnosing timings (VERDICT r3 "Next round #5"): the r3
    # bench read ~1.34× slower than r2 on UNCHANGED query code —
    # machine noise that best-of-2 couldn't prove. Record every raw
    # run plus the 1-minute load average sampled around the sweep, so
    # a rerun regression can be attributed (noise vs plan change) from
    # the JSON alone: noisy runs show high run-to-run spread and/or
    # elevated load; a real regression shows tight runs at a new level.
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    load_samples: list[float] = [round(os.getloadavg()[0], 2)]
    for name, fn in bench.items():
        # best-of-3: the later runs reuse warmed parquet footers /
        # Python workers, so transient machine load and one-time JVM
        # costs don't masquerade as query regressions. NOTE: for
        # queries that persist() intermediates (LSH signature tables,
        # the MG summary, the ANN exact/hits gates), Spark's cache
        # manager matches the repeat runs' identical sub-plans to the
        # run-1 cache, so min(runs) partially measures warm-cache
        # reads — deliberately UNCHANGED since round 1 (r4 runs show
        # the same shape, e.g. heavy_hitter_terms 1.73→0.61); altering
        # it would break the round-over-round per-query comparison.
        # Run 1 in the `runs` list is always the cold number.
        runs, rows = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs)
        all_runs[name] = runs
        load_samples.append(round(os.getloadavg()[0], 2))
        print(f"# {name}: {min(runs):.3f}s best of {runs} ({rows} rows)", file=sys.stderr)
        # the LSH/banded queries persist narrow signature tables whose
        # lifetime the CALLER owns (documented in the operators); a
        # sweep that never clears them would accumulate cached copies.
        # cache.sweep() drops the tracked handles (ADVICE r5 #3);
        # clearCache() additionally covers anything persisted outside
        # the track() hook.
        cache.sweep()
        spark.catalog.clearCache()

    # Noisy-window retry (VERDICT r9 ask #3): a headline query whose
    # measurement window saw 1-min load above the threshold is re-run
    # after a short wait-for-quiet and min'd into its record — so one
    # background spike doesn't smear a fake +25% across the
    # round-over-round diff. The retry replicates the SAME best-of-3
    # protocol as the main loop: for persist-heavy queries the
    # original min is a warm-cache run, and a single cold retry could
    # never beat a load-smeared warm number. Bounded to 8 queries;
    # any noisy windows beyond the cap are stamped noisy_unretried so
    # the record never reads 'retried and clean' when it wasn't.
    names_in_order = list(bench)
    noisy_all = [
        n
        for i, n in enumerate(names_in_order)
        if max(load_samples[i], load_samples[i + 1]) > load_thresh
    ]
    noisy, noisy_unretried = noisy_all[:8], noisy_all[8:]
    for n in noisy:
        _wait_for_quiet(load_thresh, 30.0)
        retry_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            bench[n](spark, sf_dir).count()
            retry_runs.append(round(time.perf_counter() - t0, 4))
        all_runs[n].extend(retry_runs)
        timings[n] = min(timings[n], *retry_runs)
        load_samples.append(round(os.getloadavg()[0], 2))
        print(
            f"# retry (noisy window) {n}: best {min(retry_runs):.3f}s "
            f"of {retry_runs}",
            file=sys.stderr,
        )
        cache.sweep()
        spark.catalog.clearCache()

    # Skew micro-bench: 500 identical docs — the boilerplate-cluster
    # degenerate case. Every band bucket holds all 500 ids, so the
    # uncapped LSH join materializes 500·499/2 ≈ 125k candidate pairs
    # on single reducer keys while the capped star emits 499. The two
    # wall times put a number on the skew guard (the gap widens
    # quadratically with cluster size — at 5k boilerplate docs it is
    # 12.5M vs 5k).
    from pyspark.sql import functions as F

    from oamap_spark.operators.dedup import minhash_lsh_pairs

    degen = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate sentence repeated for every document").alias("text"),
    )
    skew_pairs: dict[str, int] = {}
    for label, cap in (("skew_500dup_lsh_capped", 50), ("skew_500dup_lsh_uncapped", None)):
        runs, rows = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = minhash_lsh_pairs(
                degen, "doc_id", "text", k=16, rows_per_band=2, threshold=0.9, bucket_cap=cap
            ).count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[label] = min(runs)
        all_runs[label] = runs
        skew_pairs[label] = rows
        print(f"# {label}: {min(runs):.3f}s ({rows} verified pairs)", file=sys.stderr)
        # minhash_lsh_pairs persists caller-owned signature tables —
        # sweep them like the main loop does (ADVICE r5 #3: persisted
        # frames must not accumulate across a long benching process)
        cache.sweep()
        spark.catalog.clearCache()

    # Embedding twin of the skew micro-bench (VERDICT r6 "Next round
    # #3"): 500 near-identical embeddings — every band bucket holds
    # all 500 vectors, so the uncapped gram path hands one Python
    # worker a 500×500 matrix and 124,750 verified pairs on single
    # bucket keys, while the capped star emits 499 ids-only edges.
    # Construction is deterministic (tiny per-component perturbation,
    # pairwise cosine ≈ 1 ≥ 0.99) so the pair counts are exact.
    from oamap_spark.queries.llm_similarity import _banded_neardup_pairs

    emb_degen = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), c -> "
            "1.0d + cast(c % 7 as double) * 1e-5)"
        ).alias("embedding"),
    )
    for label, cap in (
        ("skew_500emb_banded_capped", 50),
        ("skew_500emb_banded_uncapped", None),
    ):
        runs, rows = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = _banded_neardup_pairs(emb_degen, bucket_cap=cap).count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[label] = min(runs)
        all_runs[label] = runs
        skew_pairs[label] = rows
        print(f"# {label}: {min(runs):.3f}s ({rows} verified pairs)", file=sys.stderr)
        cache.sweep()
        spark.catalog.clearCache()

    # Incremental twin on the same degenerate embedding corpus (r8):
    # the LAST 25 of the 500 clones are the arrival batch — the
    # bucket-min is corpus, so the capped run exercises the
    # RESTRICTED star branch (edges only to arrival members), not the
    # bmin-is-new shortcut. The pair-count ladder is the scale
    # signal: batch uncapped 124,750 (s²/2 on one bucket) →
    # incremental uncapped 12,175 (= C(500,2) − C(475,2), m·s-ish) →
    # incremental capped 25 (one ids-only edge per arrival).
    emb_degen_flagged = emb_degen.withColumn("nw", F.col("vec_id") >= 475)
    for label, cap in (
        ("skew_500emb_incr_capped", 50),
        ("skew_500emb_incr_uncapped", None),
    ):
        runs, rows = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = _banded_neardup_pairs(
                emb_degen_flagged, bucket_cap=cap, new_col="nw"
            ).count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[label] = min(runs)
        all_runs[label] = runs
        skew_pairs[label] = rows
        print(f"# {label}: {min(runs):.3f}s ({rows} verified pairs)", file=sys.stderr)
        cache.sweep()
        spark.catalog.clearCache()

    # Containment-dedup twin of the skew micro-bench (VERDICT r7
    # "Next round #6"): a boilerplate-heavy corpus — every one of 500
    # docs opens with the same 11-token header, so each of its 9
    # all-header shingles has df = 500; 10 docs additionally have
    # their unique tail quoted whole inside a longer doc (true
    # doc-in-doc pairs: ~10 shared df=2 tail shingles each, verified
    # containment 19/21 ≈ 0.905 — the two header→tail boundary
    # shingles differ). The SIGNAL is candidate pair-sid
    # incidences Σ_sid C(df_kept, 2) — what the posting self-join
    # actually shuffles: uncapped, each hot shingle alone contributes
    # 500·499/2 ≈ 125k incidences (quadratic in cluster size; at 1M
    # boilerplate docs that is 5·10¹¹ per shingle on one key); capped
    # (df_cap=16, the production knob) drops the hot postings and
    # keeps ONLY the df=2 quoted-tail shingles — linear, and the 10
    # genuine pairs still verify (at ≈ 0.905 ≥ 0.8) in BOTH arms
    # (recall loss from the cap: zero here, boilerplate-only pairs by
    # design elsewhere).
    from oamap_spark.operators.dedup import (
        combine_shingle_ids,
        containment_pairs,
        token_id_array,
    )

    header = "terms of service apply to this document version two revision final "
    contain_degen = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(header),
            # unique tail: 12 tokens derived from the doc id
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}tok"), (F.col("id") * 12 + j).cast("string"))
                    for j in range(12)
                ],
            ),
            # docs 100-109 additionally quote doc (id-100)'s tail whole
            F.when(
                (F.col("id") >= 100) & (F.col("id") < 110),
                F.concat(
                    F.lit(" "),
                    F.concat_ws(
                        " ",
                        *[
                            F.concat(
                                F.lit(f"w{j}tok"),
                                ((F.col("id") - 100) * 12 + j).cast("string"),
                            )
                            for j in range(12)
                        ],
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    contain_incidences: dict[str, int] = {}
    kept_post = (
        contain_degen.select(
            F.col("doc_id"), token_id_array("text").alias("tids")
        )
        .select("doc_id", F.explode(combine_shingle_ids(F.col("tids"), 3)).alias("sid"))
        .groupBy("sid")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    for label, cap in (
        ("skew_500contain_capped", 16),
        ("skew_500contain_uncapped", 1_000_000_000),
    ):
        runs, rows = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = containment_pairs(
                contain_degen, "doc_id", "text", n=3, threshold=0.8, df_cap=cap
            ).count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[label] = min(runs)
        all_runs[label] = runs
        skew_pairs[label] = rows
        # what the posting self-join shuffles under this cap
        contain_incidences[label] = int(
            kept_post.where(F.col("df") <= cap)
            .select(F.sum(F.col("df") * (F.col("df") - 1) / 2).cast("long").alias("i"))
            .collect()[0]["i"]
        )
        print(
            f"# {label}: {min(runs):.3f}s ({rows} verified pairs, "
            f"{contain_incidences[label]} candidate incidences)",
            file=sys.stderr,
        )
        cache.sweep()
        spark.catalog.clearCache()

    # Production-ANN-path timing (VERDICT r6 "Next round #6"): the
    # declared ann_lsh_topk's wall is dominated by its exact
    # brute-force recall GATE (verification surface); this entry times
    # the path that actually runs at 100 TB — signature → multi-probe
    # → candidate join → exact rescoring of candidates → top-k — so
    # the gate-vs-path split is recorded per round (see SCALE.md).
    from oamap_spark.queries.llm_similarity import ann_production_topk_ids
    from oamap_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = ann_production_topk_ids(emb).count()
        runs.append(round(time.perf_counter() - t0, 4))
    timings["ann_lsh_candidates_only"] = min(runs)
    all_runs["ann_lsh_candidates_only"] = runs
    print(
        f"# ann_lsh_candidates_only: {min(runs):.3f}s best of {runs} "
        f"({rows} topk rows)",
        file=sys.stderr,
    )
    cache.sweep()
    spark.catalog.clearCache()

    # Skewed-JOIN micro-bench (the relational twin of skew_500dup):
    # same Zipf construction as the declared `salted_join_skewed_events`
    # query — 80% of events collapse onto hot key 42, dim carries ~100
    # matches per key at sf0.1, so the hot key alone joins to ~8M
    # pairs. Auto-broadcast is disabled for the pair (at sf0.1 the dim
    # fits and Catalyst rightly broadcasts, which makes salting moot —
    # the regime under test is the 100 TB big×big shuffle join).
    # Like skew_500dup, the SIGNAL is not sf0.1 wall time (one 8M-pair
    # codegen task still finishes in well under a second on this box) —
    # it is `skew_join_max_reducer_pairs`: the pair count the hottest
    # reducer key owns, which is what becomes the straggler task at
    # scale. Salt=8 cuts it ~8× (80% of pairs on one key → ~10% per
    # (key, salt) sub-key); the wall times just bound the salt's
    # constant overhead (dim replicated salt-fold).
    from oamap_spark.operators.partitioning import salted_frames, salted_join
    from oamap_spark.queries.relational_extra import zipf_skew_frames

    # same builders the declared query runs (r6 review: no copy-paste
    # divergence between the verified shape and the benchmarked one)
    ev, dim = zipf_skew_frames(spark, sf_dir)
    dimc = dim.groupBy("k").agg(F.count(F.lit(1)).alias("dim_n"))
    # ADVICE r6 #2: the straggler bound must come from the join's OWN
    # salted projection — salted_frames is the exact builder
    # salted_join(dim, ev, ...) runs, so the recorded layout cannot
    # drift from the executed one (pinned by
    # test_partitioning.py::test_salted_frames_is_the_join_projection)
    _, salted_ev = salted_frames(dim, ev, 8)
    max_reducer_pairs: dict[str, int] = {}
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for label, join_fn, keyed in (
            (
                "skew_zipf_join_salted",
                lambda: salted_join(dim, ev, "k", salt=8),
                salted_ev.groupBy("k", "__salt").agg(
                    F.count(F.lit(1)).alias("ev_n")
                ),
            ),
            (
                "skew_zipf_join_plain",
                lambda: ev.join(dim, "k"),
                ev.groupBy("k").agg(F.count(F.lit(1)).alias("ev_n")),
            ),
        ):
            runs, rows = [], 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = (
                    join_fn()
                    .groupBy("k")
                    .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("value").alias("s"))
                    .count()
                )
                runs.append(round(time.perf_counter() - t0, 4))
            # pairs owned by the hottest reducer key: max over join-key
            # groups of |ev rows| × |dim rows| — the straggler bound
            max_reducer_pairs[label] = (
                keyed.join(dimc, "k")
                .select(F.max(F.col("ev_n") * F.col("dim_n")).alias("m"))
                .collect()[0]["m"]
            )
            timings[label] = min(runs)
            all_runs[label] = runs
            print(
                f"# {label}: {min(runs):.3f}s ({rows} key groups, "
                f"max reducer pairs {max_reducer_pairs[label]})",
                file=sys.stderr,
            )
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

    # Bloom semi-join reduction micro-bench: the SIGNAL is
    # `bloom_prefilter_shuffled_rows` — fact rows that reach the exact
    # join's exchange with vs without the prefilter (the shuffle bytes
    # this sheds are what scale with the 100 TB fact, not the sf0.1
    # wall). Same builders as the declared `bloom_prefilter_join_agg`
    # query; auto-broadcast disabled so the exact join is a real
    # shuffle join (the regime under test — at sf0.1 the dim would
    # broadcast and the prefilter would be moot).
    from oamap_spark.operators.partitioning import bloom_semijoin_reduce

    li_b = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )  # the declared query's exact projection — shuffle bytes match
    urgent_b = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom_shuffled: dict[str, int] = {}
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for label, fact_fn in (
            (
                "bloom_prefilter_join",
                lambda: bloom_semijoin_reduce(
                    li_b, urgent_b, "l_orderkey", "o_orderkey"
                ),
            ),
            ("bloom_plain_join", lambda: li_b),
        ):
            runs = []
            for _ in range(2):
                fact = fact_fn()
                t0 = time.perf_counter()
                fact.join(
                    urgent_b, fact.l_orderkey == urgent_b.o_orderkey
                ).groupBy("l_returnflag").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(
                        F.sum(
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ),
                        2,
                    ).alias("revenue"),
                ).count()
                runs.append(round(time.perf_counter() - t0, 4))
            # rows entering the exact join's fact-side exchange
            bloom_shuffled[label.replace("_join", "_shuffled_rows")] = (
                fact_fn().count()
            )
            timings[label] = min(runs)
            all_runs[label] = runs
            print(
                f"# {label}: {min(runs):.3f}s (shuffled rows "
                f"{bloom_shuffled[label.replace('_join', '_shuffled_rows')]})",
                file=sys.stderr,
            )
            cache.sweep()
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # Per-query noise marker for the COMPACT stdout record (VERDICT r11
    # "Next round #3c"): max/min over the WARM runs (run 1 is always
    # the cold number — JVM/codegen warmup and one-time staging, not
    # machine noise). A tight warm spread at a new level is a real plan
    # change; a wide warm spread is a noisy measurement window — the
    # r11 verdict had to reconstruct that distinction from a second
    # full bench run. Only entries over SPREAD_FLOOR are emitted so the
    # stdout line stays under the driver's capture cap on quiet runs.
    SPREAD_FLOOR = 1.5
    spread = {}
    for n, rs in all_runs.items():
        warm = rs[1:] if len(rs) > 1 else rs
        if min(warm) > 0:
            r = round(max(warm) / min(warm), 1)
            if r > SPREAD_FLOOR:
                spread[n] = r
    # headline total = registry bench set ONLY (r7 review finding #4:
    # folding the ad-hoc microbench walls into `value` would read as a
    # multi-second regression on unchanged query code every time a
    # microbench is added). Ad-hoc entries stay in `queries`/`runs`
    # per-name and get their own subtotal. NOTE for cross-round
    # comparison: r1–r6 `value` included the then-existing microbench
    # labels (skew_500dup_* from r5, skew_zipf_* from r6, ~3.3 s at
    # r6); from r7 on, compare per-query or use value + value_microbench.
    headline = {n: t for n, t in timings.items() if n in bench}
    microbench = {n: t for n, t in timings.items() if n not in bench}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(headline.values()), 4),
        # machine-readable schema marker (ADVICE r7): r1–r6 `value`
        # also folded the then-existing microbench walls in; from r7
        # on it is the registry bench set only. Tooling diffing
        # `value` across rounds must check this field first.
        "value_semantics": "headline_only_r7+",
        "unit": "sec",
        "value_microbench": round(sum(microbench.values()), 4),
        "microbench_names": sorted(microbench),
        "queries": timings,
        # noise forensics: every raw run per query + 1-min load average
        # sampled after each query. High spread / high load ⇒ machine
        # noise; tight runs at a new level ⇒ real plan change.
        "runs": all_runs,
        "loadavg_1min": load_samples,
        # quiet-load protocol record: start load (after pre-flight
        # wait), threshold, and whether the run violated it anyway —
        # start above threshold, or a mid-run spike past 2× start
        "loadavg_start_1min": load_start,
        "load_threshold": load_thresh,
        "noisy_retried": noisy,
        "noisy_unretried": noisy_unretried,
        "ambient_load_warning": bool(
            load_start > load_thresh
            or max(load_samples) > max(load_thresh, 2 * max(load_start, 1.0))
        ),
        # the HONORED core count (session.py builds local[$SPARK_GRAFT_CPUS]
        # and sizes shuffle partitions from it) — NOT os.cpu_count(),
        # which made the r11 8-core scaling artifact claim "cpus": 32
        # (VERDICT r11 "What's wrong #2")
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf": sf_val,
        # wall times at 500 docs are overhead-dominated; the pair
        # counts are the skew-guard signal (linear star vs s²/2 on one
        # reducer key — the gap is what explodes at boilerplate scale)
        "skew_microbench_pairs": skew_pairs,
        # what the containment posting self-join shuffles under each
        # df_cap: Σ_sid C(df_kept, 2) — quadratic per boilerplate
        # shingle uncapped, linear capped (VERDICT r7 #6)
        "skew_contain_candidate_incidences": contain_incidences,
        # straggler bound for the Zipf join pair: pairs owned by the
        # hottest reducer key, plain vs salted (the number that scales;
        # sf0.1 wall time does not — one hot task still fits this box)
        "skew_join_max_reducer_pairs": max_reducer_pairs,
        # fact rows reaching the exact join's exchange with vs without
        # the Bloom prefilter — the shuffle-shed signal that scales
        # with the fact side (1-URGENT keeps ~1/5 of lineitem)
        "bloom_prefilter_shuffled_rows": bloom_shuffled,
    }
    # Full record (runs, loadavg samples, forensics dicts) goes to
    # stderr for humans and a/b tooling; stdout gets a COMPACT single
    # line. The driver records only the LAST 2000 chars of stdout and
    # parses the JSON line found there — r5–r8's line outgrew that cap
    # (4.3 KB by r8) and the recorded `parsed` field silently became
    # None for four rounds. Keep the stdout line under the cap forever.
    print(json.dumps(out), file=sys.stderr)
    try:  # full forensics for cross-round a/b (stderr is not kept)
        with open("/tmp/oamap_bench_full_last.json", "w") as f:
            json.dump(out, f)
    except OSError:
        pass
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "value_semantics": out["value_semantics"],
        "unit": out["unit"],
        "value_microbench": out["value_microbench"],
        "queries": {n: round(t, 3) for n, t in timings.items()},
        "loadavg_max_1min": max(load_samples) if load_samples else None,
        "loadavg_start_1min": load_start,
        "ambient_load_warning": out["ambient_load_warning"],
        "cpus": out["cpus"],
        "sf": sf_val,
        # warm-run max/min per query, only entries > 1.5 (see above):
        # lets the round-over-round diff separate noise from plan
        # changes from the stdout line alone
        "spread_gt1.5": spread,
    }
    if noisy_unretried:  # only spend stdout bytes when it happened
        compact["noisy_unretried"] = len(noisy_unretried)
    line = json.dumps(compact)
    if len(line) >= 1900:  # degrade loudly, never exceed the cap
        compact["queries"] = {n: round(t, 2) for n, t in timings.items()}
        # the spread marker is an annotation, not a measurement — shed
        # it before shedding any query's timing
        if len(json.dumps(compact)) >= 1900:
            compact["spread_gt1.5"] = {"omitted": len(spread)}
        line = json.dumps(compact)
        while len(line) >= 1900 and compact["queries"]:
            drop = min(compact["queries"], key=compact["queries"].get)
            del compact["queries"][drop]
            compact["queries_omitted"] = (
                compact.get("queries_omitted", 0) + 1
            )
            line = json.dumps(compact)
        print(
            f"# stdout line trimmed to fit driver cap: {line[:80]}...",
            file=sys.stderr,
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
