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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from oamap_spark.queries import registry
    from oamap_spark.session import get_spark

    spark = get_spark("oamap-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so we measure query execution, not
    # session startup.
    bench = registry.bench_queries()
    first = next(iter(bench.values()))
    first(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in bench.items():
        # best-of-2: the second run reuses warmed parquet footers /
        # Python workers, so transient machine load and one-time JVM
        # costs don't masquerade as query regressions
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"# {name}: {best:.3f}s ({rows} rows)", file=sys.stderr)
        # the LSH/banded queries persist narrow signature tables whose
        # lifetime the CALLER owns (documented in the operators); a
        # sweep that never clears them would accumulate cached copies
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
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = minhash_lsh_pairs(
                degen, "doc_id", "text", k=16, rows_per_band=2, threshold=0.9, bucket_cap=cap
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[label] = round(best, 4)
        skew_pairs[label] = rows
        print(f"# {label}: {best:.3f}s ({rows} verified pairs)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # wall times at 500 docs are overhead-dominated; the pair
        # counts are the skew-guard signal (linear star vs s²/2 on one
        # reducer key — the gap is what explodes at boilerplate scale)
        "skew_microbench_pairs": skew_pairs,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
