"""`.npy`-directory backend as a Spark Python DataSource (V2 API).

This is the engine's custom-backend EXTENSION POINT demonstrated for
real: oamap plugs arbitrary array stores in via its backend interface
(numpyfile / parquet / ROOT — SURVEY §2.C); the Spark-native analog is
the DataSource V2 API, which Spark 4 exposes to pure Python. The
driver-side helper in ``sources/npy.py`` covers the small-data ramp;
this class makes the same column-per-file layout a first-class,
PARALLEL source:

    spark.dataSource.register(NpyDataSource)
    df = spark.read.format("npy").load("/path/to/dir")

Each partition reads a row-range slice of every column file with
``np.load(mmap_mode="r")`` — so N partitions scan the directory
concurrently without any task ever materializing a full column, which
is exactly how this backend would behave against a shared filesystem
at scale. Arrow-friendly batches come back through the iterator-of-
tuples contract.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_DTYPE_MAP = {
    "i": LongType(),
    "u": LongType(),
    "f": DoubleType(),
}


def _columns(path: str) -> list[str]:
    cols = sorted(f[: -len(".npy")] for f in os.listdir(path) if f.endswith(".npy"))
    if not cols:
        raise ValueError(f"no .npy files in {path!r}")
    return cols


def _peek(path: str, col: str):
    import numpy as np

    return np.load(os.path.join(path, f"{col}.npy"), mmap_mode="r")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class NpyDataSource(DataSource):
    """Directory of ``<column>.npy`` files → one table, read in
    parallel row-range partitions."""

    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self) -> StructType:
        path = self.options["path"]
        fields = []
        for col in _columns(path):
            arr = _peek(path, col)
            kind = arr.dtype.kind
            if kind not in _DTYPE_MAP:
                raise ValueError(
                    f"unsupported dtype {arr.dtype} in {col}.npy "
                    "(int/uint/float supported)"
                )
            if arr.ndim != 1:
                raise ValueError(
                    f"{col}.npy is {arr.ndim}-D; the DataSource reads 1-D "
                    "columns (use sources.npy.from_numpy for nested ramps)"
                )
            fields.append(StructField(col, _DTYPE_MAP[kind], nullable=False))
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _NpyReader(self.options["path"], schema)


class _NpyReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.cols = [f.name for f in schema.fields]
        n = len(_peek(path, self.cols[0]))
        for c in self.cols[1:]:
            m = len(_peek(path, c))
            if m != n:
                raise ValueError(
                    f"column length mismatch: {self.cols[0]}={n} vs {c}={m}"
                )
        self.n_rows = n

    def partitions(self):
        # ~4 slices per column (tunable via option) — enough to show
        # the parallel contract at test size; a real deployment sizes
        # this to rows-per-task.
        n_parts = max(1, min(4, self.n_rows))
        step = (self.n_rows + n_parts - 1) // n_parts
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        arrays = [
            _peek(self.path, c)[partition.start : partition.end] for c in self.cols
        ]
        for row in zip(*(a.tolist() for a in arrays)):
            yield row
