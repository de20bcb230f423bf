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

# The oamap 15 (structural combinators over nested data).
from oamap_spark.operators.structural import (
    define,
    drop,
    fieldname,
    filter_,
    flatten,
    index,
    keep,
    map_,
    merge,
    parents,
    project,
    recordname,
    reduce_,
    split,
    tomask,
)

# Pointer / Union (oamap's non-relational schema nodes).
from oamap_spark.operators.links import (
    resolve_pointer,
    self_pointer_prev,
    union_case,
    union_encode,
    with_position,
)

# Scale levers.
from oamap_spark.operators.layout import compact, z_value, zorder_write
from oamap_spark.operators.partitioning import co_partition, salted_join

# LLM-pipeline operators.
from oamap_spark.operators.dedup import (
    all_pairs_jaccard,
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from oamap_spark.operators.heavyhitters import heavy_hitters

# Mergeable sketches (HLL / bitmap rollups).
from oamap_spark.operators.sketches import (
    group_sketches,
    rollup_estimate,
)

# Iterative pointer traversal (recursive schemas).
from oamap_spark.operators.links import iterate_pointer, pointer_depth_root

# Inline pipeline metrics (Observation API).
from oamap_spark.plans.metrics import observed

# Row-function compiler (oamap/compiler.py's dual path, SURVEY §2.B).
from oamap_spark.compiler import CompileError, as_column, compile_row_fn, row_fn_udf

# Physical-plan audit (the scale assertions as a public API).
from oamap_spark.plans.audit import (
    broadcast_join_count,
    codegen_stage_count,
    pushed_filters,
    scanned_columns,
    shuffle_count,
)

# Dataset/Database layer (named datasets + provenance).
from oamap_spark.sources.dataset import Database, Dataset

# Schema language (the six PLURTP node types, SURVEY §1.2).
from oamap_spark.schema import (
    List,
    Pointer,
    Primitive,
    Record,
    Tuple,
    Union,
    from_spark,
    infer,
    to_spark,
)

# Ingest (fromdata / inference / round-trip).
from oamap_spark.sources.fill import (
    from_json_lines,
    fromdata,
    fromiterdata,
    infer_schema,
    roundtrip_parquet,
    to_objects,
)

__all__ = [
    # session / sources
    "configure_session", "get_spark", "load_table", "load_tables",
    # the oamap 15
    "fieldname", "recordname", "project", "keep", "drop", "split",
    "merge", "parents", "index", "tomask", "flatten", "filter_",
    "define", "map_", "reduce_",
    # pointer / union
    "resolve_pointer", "self_pointer_prev", "with_position",
    "union_encode", "union_case",
    # scale levers
    "co_partition", "salted_join", "z_value", "zorder_write", "compact",
    # row-function compiler
    "compile_row_fn", "row_fn_udf", "as_column", "CompileError",
    # plan audit
    "pushed_filters", "scanned_columns", "shuffle_count",
    "broadcast_join_count", "codegen_stage_count",
    # dataset layer
    "Database", "Dataset",
    # dedup / heavy hitters / sketches
    "exact_dedup_groups", "all_pairs_jaccard", "minhash_lsh_pairs",
    "heavy_hitters", "group_sketches", "rollup_estimate",
    # pointer traversal / metrics
    "iterate_pointer", "pointer_depth_root", "observed",
    # schema language (PLURTP)
    "Primitive", "List", "Union", "Record", "Tuple", "Pointer",
    "to_spark", "from_spark", "infer",
    # ingest
    "fromdata", "fromiterdata", "infer_schema", "from_json_lines", "to_objects",
    "roundtrip_parquet",
]
__version__ = "0.1.0"
