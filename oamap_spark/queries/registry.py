"""Central registry of declared queries.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string. The driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash, with
columns sorted by name — so **every computed column must carry the same
alias in both**.

Discipline for the float-hash oracle (SURVEY.md §7.8): aggregate sums
over doubles are rounded (``round(x, 2)``) on BOTH sides so the
engines' (identical to ~1e-9 relative) floating-point sums hash equal.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    raw_fn: QueryFn | None = None  # unwrapped body (fingerprinting)
    extra: dict = field(default_factory=dict)


_REGISTRY: dict[str, QuerySpec] = {}

# Driver-window rotation (SURVEY.md §7.1). The correctness driver
# scores the FIRST 50 entries of ``queries()`` in iteration order. Up
# to round 4 the window was a hand-pinned name list, which missed an
# in-round implementation swap (VERDICT r4 "What's wrong #1": simhash32
# moved to an Arrow UDF after its queries' verdicts). The window is now
# COMPUTED from per-query source fingerprints recorded in
# ``verdicts.json`` at each query's last driver verdict
# (queries/fingerprints.py): changed-since-verdict (or never-verified)
# queries first in registration order, then everything else
# oldest-verdict-first. Cached per process — the registry is immutable
# after import.
_PRIORITY_CACHE: list[str] | None = None


def registration_order() -> list[str]:
    """Declared names in raw registration (import) order."""
    return list(_REGISTRY)


def _ordered_names() -> list[str]:
    global _PRIORITY_CACHE
    if _PRIORITY_CACHE is None:
        from oamap_spark.queries.fingerprints import compute_priority

        _PRIORITY_CACHE = compute_priority()
    pri = [n for n in _PRIORITY_CACHE if n in _REGISTRY]
    seen = set(pri)
    return pri + [n for n in _REGISTRY if n not in seen]


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: declare a query. ``oracle=None`` → driver records the
    weaker rows-only check (reserved for genuinely non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=_wrap(fn),
            oracle=oracle,
            tags=tags,
            doc=fn.__doc__ or "",
            bench=bench,
            raw_fn=fn,
        )
        return fn

    return deco


def _wrap(fn: QueryFn) -> QueryFn:
    """Apply session config (UTC, ANSI-off, nested pruning) before the
    query body runs — the driver owns the session, so config must be
    applied at call time."""
    from oamap_spark.session import configure_session

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", name_of(fn))
    return wrapped


def name_of(fn) -> str:
    return getattr(fn, "__name__", "query")


def all_specs() -> dict[str, QuerySpec]:
    return {n: _REGISTRY[n] for n in _ordered_names()}


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: _REGISTRY[n].oracle
        for n in _ordered_names()
        if _REGISTRY[n].oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    """Bench sweep in REGISTRATION order, deliberately NOT the
    fingerprint-priority order ``queries()`` uses (VERDICT r11 "Next
    round #3b"): priority ordering rotates the sweep every round, so
    whichever query lands first after the single warmup absorbs the
    residual JVM/codegen warmup and the steady family's one-time index
    staging — in r11 ``dedup_minhash_incremental_steady`` rotated from
    4th to 1st and posted a 0.23× "regression" the same-code 8-core run
    contradicted. Pinning to registration order makes round-over-round
    per-query diffs compare like sweep positions; rotation is only
    needed for the *correctness* window, which keeps ``_ordered_names``."""
    return {
        n: _REGISTRY[n].fn for n in registration_order() if _REGISTRY[n].bench
    }
