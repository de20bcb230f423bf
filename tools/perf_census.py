"""Per-query wall-time census at $SPARK_GRAFT_SF_DIR (default
sf0.1) — one timed count per declared query, slowest-first summary at
the end. NOT a benchmark (single run, shared session, cache swept
between queries): use it to FIND outliers worth a real a/b, like the
r10 findings (the 95 s InferFiltersFromGenerate index build; the
455 s all-pairs-edge clustering queries). Run on a quiet machine.
"""

import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from oamap_spark.session import get_spark
import oamap_spark.queries as Q
from oamap_spark.queries.registry import all_specs
from oamap_spark import cache
spark = get_spark()
specs = all_specs()
rows = []
for name, spec in specs.items():
    try:
        t0 = time.time()
        n = spec.fn(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
        dt = time.time() - t0
        rows.append((dt, name, n))
        print(f"{dt:8.2f}s {name} ({n} rows)", flush=True)
    except Exception as ex:
        print(f"ERROR {name}: {str(ex)[:200]}", flush=True)
    cache.sweep(); spark.catalog.clearCache()
rows.sort(reverse=True)
print("\nTOP 15 SLOWEST:")
for dt, name, n in rows[:15]:
    print(f"{dt:8.2f}s {name}")
spark.stop()
