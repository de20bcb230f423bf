"""Per-query PHYSICAL-PLAN census — the shuffle-shape sibling of
``tools/perf_census.py`` (which catches *time* outliers; this catches
*plan* regressions before they cost time).

For every declared query (built at a small SF, default sf0.001 — plan
shape, not runtime, is the subject) it counts the scale-relevant node
types in the physical plan of the returned DataFrame:

- ``exchanges``      shuffle Exchange nodes (every one is a full
                     repartition of its input at 100 TB)
- ``broadcasts``     BroadcastHashJoin nodes (the *good* join)
- ``python_eval``    Arrow/Pandas Python-eval nodes (the allowlisted
                     slow path: BatchEvalPython would be row-at-a-time
                     and is separately forbidden by
                     ``test_plans::test_no_python_eval_outside_udf_surface``)
- ``nested_loop``    CartesianProduct / BroadcastNestedLoopJoin (a
                     non-equi join that went quadratic)
- ``codegen``        distinct WholeStageCodegen stages

and diffs them against the committed baseline
(``tools/plan_baseline.json``). Exit is nonzero when any query's
``exchanges``, ``python_eval`` or ``nested_loop`` count INCREASED over
the baseline — the three counters that directly translate to shuffle
volume or serialization cost at scale. Decreases and broadcast/codegen
drift are reported but pass (they usually mean an improvement landed;
refresh the baseline with ``--write-baseline`` in the same commit).

Caveats, by design: the census reads the plan of the RETURNED frame,
so work a query materializes internally (fixpoint loops behind
``localCheckpoint``, foreachBatch sinks) is out of frame — the
per-shape plan tests in ``tests/test_plans.py`` pin those; and plans
are captured pre-AQE (AdaptiveSparkPlan initial plan), so counts are
deterministic at a fixed SF rather than runtime-coalesced.

Usage:
    python tools/plan_census.py                  # check vs baseline
    python tools/plan_census.py --write-baseline # refresh baseline
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plan_baseline.json")
SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

# formatted-mode node headers `(n) <Name>`; matching headers (not the
# tree rendering) avoids double counts, same discipline as
# oamap_spark/plans/audit.py::shuffle_count
_NODE = r"^\(\d+\) {}"

_PY_EVAL = ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
            "FlatMapGroupsInPandasWithState", "AggregateInPandas",
            "WindowInPandas", "FlatMapCoGroupsInPandas")


def plan_counts(df) -> dict[str, int]:
    from oamap_spark.plans.audit import codegen_stage_count, plan_string

    p = plan_string(df)

    def n(name: str) -> int:
        return len(re.findall(_NODE.format(name), p, re.M))

    return {
        "exchanges": n("Exchange"),
        "broadcasts": n("BroadcastHashJoin"),
        "python_eval": sum(n(x) for x in _PY_EVAL),
        "nested_loop": n("CartesianProduct") + n("BroadcastNestedLoopJoin"),
        "codegen": codegen_stage_count(df),
    }


def run_census(spark, sf_dir: str) -> tuple[dict[str, dict[str, int]], list[str]]:
    from oamap_spark import cache
    from oamap_spark.queries.registry import all_specs

    counts: dict[str, dict[str, int]] = {}
    errors: list[str] = []
    for name, spec in all_specs().items():
        try:
            counts[name] = plan_counts(spec.fn(spark, sf_dir))
            print(f"{name}: {counts[name]}", flush=True)
        except Exception as ex:  # census must visit every query
            errors.append(name)
            print(f"ERROR {name}: {str(ex)[:200]}", flush=True)
        cache.sweep()
        spark.catalog.clearCache()
    return counts, errors


def diff_vs_baseline(counts: dict[str, dict[str, int]]) -> list[str]:
    """Regression lines (nonzero exit); drift-only changes print as
    notes inside main() but do not fail."""
    if not os.path.exists(BASELINE_PATH):
        return [f"no baseline at {BASELINE_PATH} — run --write-baseline"]
    base = json.load(open(BASELINE_PATH))
    bad = []
    for name, c in counts.items():
        b = base.get(name)
        if b is None:
            bad.append(f"NEW {name}: {c} — refresh the baseline deliberately")
            continue
        for k in ("exchanges", "python_eval", "nested_loop"):
            if c[k] > b[k]:
                bad.append(f"REGRESSION {name}.{k}: {b[k]} -> {c[k]}")
    return bad


def main() -> int:
    import oamap_spark.queries  # noqa: F401 — registers every query
    from oamap_spark.session import get_spark

    spark = get_spark()
    counts, errors = run_census(spark, SF_DIR)
    spark.stop()

    if "--write-baseline" in sys.argv:
        json.dump(counts, open(BASELINE_PATH, "w"), indent=1, sort_keys=True)
        print(f"\nwrote baseline for {len(counts)} queries -> {BASELINE_PATH}")
        return 1 if errors else 0

    bad = diff_vs_baseline(counts)
    base = (json.load(open(BASELINE_PATH))
            if os.path.exists(BASELINE_PATH) else {})
    drift = [
        f"note {name}.{k}: {base[name][k]} -> {c[k]}"
        for name, c in counts.items() if name in base
        for k in c if c[k] != base[name][k]
        and k not in ("exchanges", "python_eval", "nested_loop")
    ]
    for line in drift:
        print(line)
    print(f"\nPLAN CENSUS: {'OK' if not bad and not errors else 'VIOLATED'} "
          f"({len(counts)} queries, {len(drift)} benign drifts)")
    for line in bad:
        print("  " + line)
    for name in errors:
        print("  ERR " + name)
    return 1 if (bad or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
