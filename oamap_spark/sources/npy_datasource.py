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

Two column layouts coexist in one directory:

- ``<col>.npy`` — a flat 1-D array → scalar column.
- ``<col>_offsets.npy`` + ``<col>_content.npy`` — a JAGGED column
  (offsets has n_rows+1 entries; row i's list is
  ``content[offsets[i]:offsets[i+1]]``) → ``array<T>`` column. This is
  oamap's List encoding and byte-for-byte the ROOT jagged-branch
  layout (TBranch of ``vector<float>`` decomposes into exactly these
  two arrays), so this source IS the ROOT mapping demonstrated without
  ROOT files in the environment (SURVEY §2.C `oamap/backend/root.py`
  [H] — counts/offsets + content arrays per branch).

Each partition reads a row-range slice of every column file with
``np.load(mmap_mode="r")`` — jagged content is sliced through the
offsets, so no task ever materializes a full column. That is how this
backend behaves against a shared filesystem at scale. Each partition
crosses the Python→JVM boundary as one Arrow RecordBatch (see
``_NpyReader.read``), never as pickled row tuples.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    ArrayType,
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

_OFF = "_offsets"
_CON = "_content"


def _columns(path: str) -> tuple[list[str], list[str]]:
    """(flat, jagged) column base names in ``path``."""
    names = {f[: -len(".npy")] for f in os.listdir(path) if f.endswith(".npy")}
    jagged = sorted(
        n[: -len(_OFF)]
        for n in names
        if n.endswith(_OFF) and n[: -len(_OFF)] + _CON in names
    )
    paired = {j + _OFF for j in jagged} | {j + _CON for j in jagged}
    flat = sorted(names - paired)
    orphans = [
        n for n in names
        if (n.endswith(_OFF) or n.endswith(_CON)) and n not in paired
    ]
    if orphans:
        raise ValueError(f"unpaired jagged files in {path!r}: {orphans}")
    if not flat and not jagged:
        raise ValueError(f"no .npy files in {path!r}")
    return flat, jagged


def _peek(path: str, col: str):
    import numpy as np

    return np.load(os.path.join(path, f"{col}.npy"), mmap_mode="r")


def _elem_type(path: str, fname: str, arr) -> "LongType | DoubleType":
    kind = arr.dtype.kind
    if kind not in _DTYPE_MAP:
        raise ValueError(
            f"unsupported dtype {arr.dtype} in {fname} (int/uint/float supported)"
        )
    if arr.ndim != 1:
        raise ValueError(
            f"{fname} is {arr.ndim}-D; the DataSource reads 1-D "
            "columns (use sources.npy.from_numpy for nested ramps)"
        )
    return _DTYPE_MAP[kind]


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class NpyDataSource(DataSource):
    """Directory of ``<column>.npy`` (flat) and
    ``<column>_offsets.npy + <column>_content.npy`` (jagged) files →
    one table, read in parallel row-range partitions."""

    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self) -> StructType:
        path = self.options["path"]
        flat, jagged = _columns(path)
        fields = []
        for col in sorted(flat + jagged):
            if col in jagged:
                off = _peek(path, col + _OFF)
                if off.dtype.kind not in "iu" or off.ndim != 1:
                    raise ValueError(
                        f"{col}{_OFF}.npy must be a 1-D integer offsets array"
                    )
                et = _elem_type(path, f"{col}{_CON}.npy", _peek(path, col + _CON))
                fields.append(
                    StructField(col, ArrayType(et, containsNull=False), nullable=False)
                )
            else:
                et = _elem_type(path, f"{col}.npy", _peek(path, col))
                fields.append(StructField(col, et, nullable=False))
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _NpyReader(
            self.options["path"],
            schema,
            int(self.options.get("n_partitions", "4")),
        )

    def simpleStreamReader(self, schema: StructType) -> "_NpyStreamReader":
        return _NpyStreamReader(
            self.options["path"],
            schema,
            int(self.options.get("batch_rows", "1000")),
        )


class _NpyReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType, n_partitions: int = 4):
        self.path = path
        self.n_partitions = max(1, n_partitions)
        self.cols = [f.name for f in schema.fields]
        self.jagged = {
            f.name for f in schema.fields if isinstance(f.dataType, ArrayType)
        }
        # declared element numpy dtype per column — the Arrow batches
        # the read path yields must carry exactly the declared type
        # (the old pickled-tuple path got this for free via Python
        # int/float coercion)
        import numpy as np

        # explicit lookup that RAISES on an unknown typeName (ADVICE
        # r11 #4): the old "anything not long is float64" fallback was
        # correct while _DTYPE_MAP only emits LongType/DoubleType, but
        # a future map entry (boolean, timestamp) would have been
        # silently coerced to float64 by the Arrow path instead of
        # failing loudly
        _NP_BY_TYPENAME = {"long": np.int64, "double": np.float64}

        def np_dtype(dt):
            name = dt.typeName()
            if name not in _NP_BY_TYPENAME:
                raise TypeError(
                    f"npy datasource: unsupported Spark type {name!r} "
                    "in the Arrow read path (supported: long, double)"
                )
            return _NP_BY_TYPENAME[name]

        self.np_types = {
            f.name: np_dtype(
                f.dataType.elementType
                if isinstance(f.dataType, ArrayType)
                else f.dataType
            )
            for f in schema.fields
        }

        def n_rows_of(c: str) -> int:
            if c in self.jagged:
                off = _peek(path, c + _OFF)
                n = len(off) - 1
                con = len(_peek(path, c + _CON))
                if n < 0 or off[0] != 0 or off[-1] != con:
                    raise ValueError(
                        f"{c}: offsets must run 0..len(content) "
                        f"(got [{off[0] if len(off) else '∅'}..{off[-1] if len(off) else '∅'}], content={con})"
                    )
                return n
            return len(_peek(path, c))

        n = n_rows_of(self.cols[0])
        for c in self.cols[1:]:
            m = n_rows_of(c)
            if m != n:
                raise ValueError(
                    f"column length mismatch: {self.cols[0]}={n} vs {c}={m}"
                )
        self.n_rows = n

    def partitions(self):
        # default 4 row-range slices, tunable via the `n_partitions`
        # read option — a real deployment sizes this to rows-per-task.
        if self.n_rows == 0:
            # an empty (but valid) directory is an empty table, not a
            # planning error
            return [_RangePartition(0, 0)]
        n_parts = max(1, min(self.n_partitions, self.n_rows))
        step = (self.n_rows + n_parts - 1) // n_parts
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        """Yield the partition as ONE Arrow RecordBatch (Spark 4's
        vectorized Python DataSource path) instead of pickled row
        tuples — columnar end to end: flat columns are a zero-copy
        view of the mmap slice, jagged columns become a ListArray over
        (rebased offsets, content slice), i.e. exactly the on-disk
        offsets/content decomposition with no per-row Python objects
        (guide §4: batches across the boundary, never rows). Falls
        back to row tuples only when a partition's jagged content
        exceeds Arrow's 32-bit list-offset range — size
        ``n_partitions`` so it never does."""
        import numpy as np
        import pyarrow as pa

        lo, hi = partition.start, partition.end
        if hi <= lo:
            return
        arrays = []
        for c in self.cols:
            if c in self.jagged:
                off = _peek(self.path, c + _OFF)[lo : hi + 1]
                # slice content once for the whole partition, then cut
                # rows out of it — the mmap reads only [off[0], off[-1])
                con = _peek(self.path, c + _CON)[off[0] : off[-1]]
                if int(off[-1]) - int(off[0]) > 2**31 - 1:
                    yield from _read_rows(
                        self.path, self.cols, self.jagged, lo, hi
                    )
                    return
                rel = (off - off[0]).astype(np.int32)
                arrays.append(
                    pa.ListArray.from_arrays(
                        pa.array(rel),
                        pa.array(
                            np.ascontiguousarray(con, dtype=self.np_types[c])
                        ),
                    )
                )
            else:
                arrays.append(
                    pa.array(
                        np.ascontiguousarray(
                            _peek(self.path, c)[lo:hi], dtype=self.np_types[c]
                        )
                    )
                )
        yield pa.RecordBatch.from_arrays(arrays, names=list(self.cols))


def _read_rows(path: str, cols: list[str], jagged: set[str], lo: int, hi: int):
    """Row tuples [lo, hi) across all columns (shared by the batch
    partitions and the stream reader); jagged columns slice content
    through offsets so only [off[lo], off[hi]) is ever touched."""
    arrays = []
    for c in cols:
        if c in jagged:
            off = _peek(path, c + _OFF)[lo : hi + 1]
            con = _peek(path, c + _CON)[off[0] : off[-1]]
            base = off[0]
            arrays.append(
                [
                    con[off[i] - base : off[i + 1] - base].tolist()
                    for i in range(len(off) - 1)
                ]
            )
        else:
            arrays.append(_peek(path, c)[lo:hi].tolist())
    return zip(*arrays)


class _NpyStreamReader(SimpleDataSourceStreamReader):
    """The same npy directory as a STREAMING source: micro-batches of
    ``batch_rows`` rows in row order, offset = rows already emitted.

    This closes the source-connector story end-to-end: one registered
    format serves batch scans (partition-parallel ``reader``) and
    incremental processing (this reader) — the Structured Streaming
    unified-model contract for a custom backend. Offsets are plain row
    counts, so replay is deterministic (``readBetweenOffsets`` re-reads
    exactly the committed slice on recovery — exactly-once with a
    checkpointed sink). Row counts are re-measured per batch, so an
    appender regrowing the arrays (the jagged-file analog of files
    landing in a directory) is picked up incrementally. The simple
    reader runs driver-side and hands tuples to the engine — right for
    modest per-batch volumes; a partition-planned DataSourceStreamReader
    is the same code with ``partitions(start, end)`` split like the
    batch reader's."""

    def __init__(self, path: str, schema: StructType, batch_rows: int):
        self.path = path
        self.batch_rows = batch_rows
        self.cols = [f.name for f in schema.fields]
        self.jagged = {
            f.name for f in schema.fields if isinstance(f.dataType, ArrayType)
        }

    def _n_rows(self) -> int:
        # Min across ALL columns, not just the first: an appender that
        # grows column files non-atomically (pt.npy extended before
        # hits_offsets.npy) must not let a micro-batch commit offset hi
        # while emitting fewer rows — the un-synced tail defers to the
        # next batch instead of being silently dropped, preserving the
        # exactly-once replay contract. For jagged columns the usable
        # row count is additionally clamped by the CONTENT file: a row
        # only exists once content[0:offsets[r]] is fully on disk
        # (offsets may land before content), otherwise the numpy slice
        # would silently clip and emit short lists.
        import numpy as np

        n: int | None = None
        for c in self.cols:
            if c in self.jagged:
                off = _peek(self.path, c + _OFF)
                con_len = len(_peek(self.path, c + _CON))
                # largest r with off[r] <= con_len → complete rows
                m = int(np.searchsorted(off, con_len, side="right")) - 1
                m = min(m, len(off) - 1)
            else:
                m = len(_peek(self.path, c))
            n = m if n is None else min(n, m)
        return max(n or 0, 0)

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = start["row"]
        hi = min(lo + self.batch_rows, self._n_rows())
        if hi <= lo:
            return iter(()), start
        return iter(_read_rows(self.path, self.cols, self.jagged, lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start, end):
        hi = end["row"]
        avail = self._n_rows()
        if avail < hi:
            # A committed offset must always be re-readable; fewer rows
            # on disk than the committed hi means the directory was
            # truncated or corrupted — fail loudly rather than replay a
            # different row count for the same offset range.
            raise ValueError(
                f"npy stream replay: committed offset {hi} exceeds the "
                f"{avail} rows currently on disk in {self.path!r}"
            )
        return iter(_read_rows(self.path, self.cols, self.jagged, start["row"], hi))
