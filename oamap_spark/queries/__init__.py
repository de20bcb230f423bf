"""Declared query inventory.

Importing this package registers every query module with the central
registry (``oamap_spark.queries.registry``), which backs the driver
contract in ``__spark_entry__.py``.
"""

from oamap_spark.queries import registry as registry

# Import for side effect: each module registers its queries.
from oamap_spark.queries import tpch as _tpch  # noqa: F401


def _load_all() -> None:
    """Import every query module (kept lazy-tolerant so one broken
    module doesn't take down the whole inventory during development)."""
    import importlib

    for mod in (
        "oamap_spark.queries.tpch2",
        "oamap_spark.queries.tpch3",
        "oamap_spark.queries.relational",
        "oamap_spark.queries.functions_suite",
        "oamap_spark.queries.nested",
        "oamap_spark.queries.events",
        "oamap_spark.queries.llm_text",
        "oamap_spark.queries.llm_dedup",
        "oamap_spark.queries.llm_similarity",
        "oamap_spark.queries.llm_multimodal",
        "oamap_spark.queries.pointers",
        "oamap_spark.queries.streaming_queries",
        "oamap_spark.queries.extended_suite",
        "oamap_spark.queries.pipeline_sampling",
        "oamap_spark.queries.reshape",
        "oamap_spark.queries.llm_curation",
        "oamap_spark.queries.analytics_extra",
        "oamap_spark.queries.warehousing",
        "oamap_spark.queries.sketches_suite",
        "oamap_spark.queries.observability",
        "oamap_spark.queries.relational_extra",
        "oamap_spark.queries.sources_extra",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Only a genuinely missing OPTIONAL third-party dep may be
            # skipped; a broken/missing module inside oamap_spark must
            # fail loudly or the driver would silently see fewer queries.
            if (exc.name or "").startswith("oamap_spark"):
                raise
            import warnings

            warnings.warn(
                f"query module {mod} skipped: missing dependency {exc.name}",
                stacklevel=2,
            )


_load_all()
