"""oamap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of diana-hep/oamap (Object-Array Mapping).

Reference semantics: the public ``diana-hep/oamap`` project (see
SURVEY.md — the local reference snapshot is empty, so citations are to
the public repo by module/symbol, not file:line).

Architecture: DataFrame/Column expressions first (Catalyst + Tungsten),
higher-order array functions for nested data, Arrow-vectorized pandas
UDFs only where Catalyst cannot express the computation. No RDDs in the
hot path; every operator is designed for multi-executor scale (shuffle
minimization, broadcast joins, partial aggregation).
"""

from oamap_spark.session import configure_session, get_spark
from oamap_spark.sources.tables import load_table, load_tables

__all__ = ["configure_session", "get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
