"""Data-layout clustering — Z-ordering for multi-column pruning.

At 100 TB the difference between scanning 2% and 100% of a table is
usually FILE SKIPPING: parquet readers prune files/row-groups whose
min/max stats exclude the predicate. A sort on one column clusters
that column only; interleaving the bits of several rank-normalized
columns (a Z-/Morton curve) gives every participating column locality,
so selective filters on ANY of them skip most files.

Spark-first shape: rank-normalize each clustering column with
``percent_rank`` (value distribution–proof), quantize to ``bits``
levels, interleave bits into one long — all native Column expressions
— then ``repartitionByRange`` on the z-value so each output file owns
a compact z-range. No UDFs, two shuffles (the rank windows share one;
the range partition is the second), any scale.

Verification (`tests/test_layout.py`) is honest: it writes the same
data z-ordered and shuffled, reads the parquet FOOTERS with pyarrow,
and asserts the per-file min/max spans of the clustering columns are
materially narrower under z-order — i.e. pruning would actually skip
files, not just that we sorted something.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def z_value(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Attach ``__z`` — the Morton interleave of the rank-quantized
    clustering columns (``bits`` bits each; 2 cols × 8 bits → 16-bit
    z-space). percent_rank makes the quantization uniform under ANY
    value distribution — skew in raw values cannot collapse the curve."""
    if not cols:
        raise ValueError("z_value needs at least one clustering column")
    out = df
    qs = []
    for c in cols:
        w = Window.orderBy(F.col(c))
        q = F.least(
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("long"),
            F.lit((1 << bits) - 1),
        )
        qs.append(q)
    z = F.lit(0).cast("long")
    # interleave: bit b of column i lands at position b*len(cols)+i
    for b in range(bits):
        for i, q in enumerate(qs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + i
                ).cast("long")
            )
    return out.withColumn("__z", z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols``: range-partition by ``__z`` (each file owns a
    compact z-range) and sort within partitions so row groups are
    clustered too. The ``__z`` helper column is dropped on write.

    NOTE: ``percent_rank`` over the full frame uses a single-partition
    window — fine for the per-write file batch this targets; at
    whole-table scale substitute approx quantile breakpoints per
    column (same curve, sampled ranks)."""
    zdf = z_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, col: str) -> list[tuple]:
    """Per-parquet-file (min, max) of ``col`` read from the footers —
    exactly the stats a reader consults to skip files."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans


def pruning_fraction(spans: list[tuple], lo, hi) -> float:
    """Fraction of files a [lo, hi] predicate would SKIP given their
    min/max spans — the quantity z-ordering exists to maximize."""
    if not spans:
        return 0.0
    skipped = sum(1 for mn, mx in spans if mx < lo or mn > hi)
    return skipped / len(spans)


def table_bytes(path: str) -> int:
    """Total parquet bytes under ``path`` (driver-side listing — O(files))."""
    import glob
    import os

    return sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def compact(
    spark,
    src: str,
    dst: str,
    *,
    target_file_mb: float = 128,
    sort_by: Sequence[str] = (),
    even_sizes: bool = False,
) -> int:
    """The small-files fix: rewrite ``src`` into ``dst`` as
    ceil(bytes / target) files (optionally clustered by ``sort_by`` so
    min/max pruning survives the rewrite). Streaming sinks and
    per-task writers leave thousands of KB-scale files at 100 TB —
    footer reads and task scheduling then dominate scans; periodic
    compaction to ~128 MB files is the standard remedy.
    ``even_sizes=True`` swaps the shuffle-free ``coalesce`` (which can
    merge unevenly — upstream partition sizes pass through) for a
    deterministic round-robin ``repartition`` (one shuffle, equal
    output files; Spark sorts within input partitions before
    round-robin, so task retries cannot lose or duplicate rows — never
    ``repartition(n, rand())`` here). ``target_file_mb`` may be
    fractional (tests compact to KB-scale targets). Returns the output
    file count actually written (globbed — empty partitions write no
    file, so the ceil arithmetic alone can overstate)."""
    import math

    df = spark.read.parquet(src)
    n = max(1, math.ceil(table_bytes(src) / (target_file_mb * 1024 * 1024)))
    out = df
    if sort_by:
        out = out.repartitionByRange(n, *[F.col(c) for c in sort_by])
        out = out.sortWithinPartitions(*sort_by)
    elif even_sizes:
        out = out.repartition(n)
    else:
        out = out.coalesce(n)
    out.write.mode("overwrite").parquet(dst)
    import glob
    import os

    return len(glob.glob(os.path.join(dst, "*.parquet")))
