"""100x scaling curve for zorder_incremental (r10) — the maintenance
loop's cost vs the full rewrite it replaces.

Per SF and per arrival SHAPE: z-order 90% of orders (o_orderkey % 10
!= 0), then merge an arrival batch with zorder_incremental; record
the incremental wall vs a full zorder_write of the merged table (the
alternative a pipeline without incremental maintenance pays), how
many slice files were actually rewritten, that the untouched files
stayed byte-identical, and the post-merge skip fractions for the same
5%-of-domain slice predicates as tools/zorder_curve.py — the pruning
payoff the maintenance exists to preserve.

Two arrival shapes: "uniform" (the full 10% slice — spans the whole
key domain, touches every z slice: the worst case, where incremental
degenerates to a full rewrite by design) and "localized" (arrivals
confined to the bottom ~15% of the custkey domain — the
hot-partition daily batch the operator exists for: few slices
rewritten, the rest byte-stable). Run on a quiet machine (the repo's
bench protocol); one JSON line per (SF, shape) on stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oamap_spark.operators.layout import (
    file_column_ranges,
    file_digests,
    pruning_fraction,
    zorder_incremental,
    zorder_write,
)
from oamap_spark.session import get_spark


def main() -> None:
    spark = get_spark()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        orders = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select("o_orderkey", "o_custkey", "o_totalprice")
        base_df = orders.where(F.col("o_orderkey") % 10 != 0)
        lo_ck, hi_ck, lo_tp, hi_tp = orders.agg(
            F.min("o_custkey"),
            F.max("o_custkey"),
            F.min("o_totalprice"),
            F.max("o_totalprice"),
        ).collect()[0]
        width = max(1, (hi_ck - lo_ck) // 20)
        shapes = {
            "uniform": orders.where(F.col("o_orderkey") % 10 == 0),
            "localized": orders.where(
                (F.col("o_orderkey") % 10 == 0)
                & (F.col("o_custkey") < lo_ck + 3 * width)
            ),
        }
        for shape, arrivals in shapes.items():
            tmp = tempfile.mkdtemp(prefix="oamap_zincr_curve_")
            ztab = os.path.join(tmp, "ztab")
            zfull = os.path.join(tmp, "zfull")
            zorder_write(
                base_df, ztab, ["o_custkey", "o_totalprice"], n_files=8
            )
            before = file_digests(ztab)

            t0 = time.perf_counter()
            stats = zorder_incremental(spark, ztab, arrivals)
            t_incr = time.perf_counter() - t0

            after = file_digests(ztab)
            survivors = set(before) & set(after)
            byte_stable = sum(1 for f in survivors if before[f] == after[f])

            # the alternative: full rewrite of the merged table
            merged_df = base_df.unionByName(arrivals)
            t0 = time.perf_counter()
            zorder_write(
                merged_df, zfull, ["o_custkey", "o_totalprice"], n_files=8
            )
            t_full = time.perf_counter() - t0

            fr_ck = pruning_fraction(
                file_column_ranges(ztab, "o_custkey"), lo_ck, lo_ck + width
            )
            fr_tp = pruning_fraction(
                file_column_ranges(ztab, "o_totalprice"),
                lo_tp,
                lo_tp + (hi_tp - lo_tp) / 20,
            )
            # footer-only counts: zfull was just written from the same
            # merged frame, so its count is the expected total without
            # re-executing the union lineage
            want_rows = spark.read.parquet(zfull).count()
            merged_rows = spark.read.parquet(ztab).count()
            out = {
                "sf": sf,
                "arrival_shape": shape,
                "rows": want_rows,
                "merged_rows_ok": merged_rows == want_rows,
                "rewritten_files": stats["rewritten_files"],
                "total_files": stats["total_files"],
                "untouched_byte_stable": byte_stable,
                "untouched_expected": stats["total_files"]
                - stats["rewritten_files"],
                "incr_sec": round(t_incr, 3),
                "full_rewrite_sec": round(t_full, 3),
                "skip_frac_custkey_5pct_after": round(fr_ck, 3),
                "skip_frac_totalprice_5pct_after": round(fr_tp, 3),
            }
            print(json.dumps(out))
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
