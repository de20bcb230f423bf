"""100x scaling curve for the (r9) scale-safe zorder_write — the one
layout lever without a measured curve in SCALE.md until now.

Per SF: z-order the orders table on (o_custkey, o_totalprice), read
the parquet footers, and record write wall, per-column file-skip
fractions for a bottom-of-domain slice predicate, and the filtered
read wall vs a ROUND-ROBIN control layout (repartition(8) with no
column — every file spans the full domain, the worst case for
pruning). Run on a quiet machine (the repo's bench protocol); output
is one JSON line per SF on stdout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from oamap_spark.operators.layout import (
    file_column_ranges,
    pruning_fraction,
    zorder_write,
)
from oamap_spark.session import get_spark


def main() -> None:
    spark = get_spark()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        base = tempfile.mkdtemp(prefix="oamap_zcurve_")
        zpath, rpath = os.path.join(base, "z"), os.path.join(base, "rr")
        t0 = time.perf_counter()
        zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], n_files=8)
        t_write = time.perf_counter() - t0
        orders.repartition(8).write.parquet(rpath)

        lo_ck, hi_ck, lo_tp, hi_tp, n_rows = orders.agg(
            F.min("o_custkey"),
            F.max("o_custkey"),
            F.min("o_totalprice"),
            F.max("o_totalprice"),
            F.count(F.lit(1)),
        ).collect()[0]
        width = max(1, (hi_ck - lo_ck) // 20)  # 5% slice of the domain
        fr_ck = pruning_fraction(
            file_column_ranges(zpath, "o_custkey"), lo_ck, lo_ck + width
        )
        fr_tp = pruning_fraction(
            file_column_ranges(zpath, "o_totalprice"),
            lo_tp,
            lo_tp + (hi_tp - lo_tp) / 20,
        )

        def read_wall(path: str) -> float:
            t = time.perf_counter()
            (
                spark.read.parquet(path)
                .where(
                    (F.col("o_custkey") >= lo_ck)
                    & (F.col("o_custkey") <= lo_ck + width)
                )
                .agg(F.sum("o_totalprice"))
                .collect()
            )
            return time.perf_counter() - t

        out = {
            "sf": sf,
            "rows": n_rows,
            "n_files": len(glob.glob(zpath + "/*.parquet")),
            "write_sec": round(t_write, 3),
            "skip_frac_custkey_5pct": round(fr_ck, 3),
            "skip_frac_totalprice_5pct": round(fr_tp, 3),
            "filtered_read_z_sec": round(read_wall(zpath), 3),
            "filtered_read_roundrobin_sec": round(read_wall(rpath), 3),
        }
        print(json.dumps(out))
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
