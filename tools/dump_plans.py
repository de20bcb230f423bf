"""Dump `.explain("formatted")` for named queries into plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> <suffix> <query> [<query> ...]

writes plans/<tag>/<query>_<suffix>.txt for each query, built at
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE, not runtime, is the
subject; the steady-state staging helpers run at whatever SF is given).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from oamap_spark.queries import registry
    from oamap_spark.session import get_spark

    spark = get_spark("oamap-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
