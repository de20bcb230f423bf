"""Data-layout clustering — Z-ordering for multi-column pruning.

At 100 TB the difference between scanning 2% and 100% of a table is
usually FILE SKIPPING: parquet readers prune files/row-groups whose
min/max stats exclude the predicate. A sort on one column clusters
that column only; interleaving the bits of several rank-normalized
columns (a Z-/Morton curve) gives every participating column locality,
so selective filters on ANY of them skip most files.

Spark-first shape: rank-normalize each clustering column against
``approx_percentile`` breakpoints (one aggregation over the frame —
value distribution–proof, bounded memory ~O(accuracy) per column),
quantize to ``bits`` levels by counting breakpoints <= value (a
searchsorted over a literal array, fully codegen'd), and interleave
bits into one long — all native Column expressions. The write then
slices z-space at the quantiles OF THE Z VALUES THEMSELVES (a second
tiny agg — correlated clustering columns concentrate z near the
Morton diagonal, so fixed equal-width slices would leave files empty)
and routes each slice to its own task by murmur3 token, exactly — no
RangePartitioner reservoir sampling, whose boundary noise both bleeds
slice-edge rows into neighboring files and can merge two slices
outright. No UDFs, no windows, ONE shuffle, any scale.

Verification (`tests/test_layout.py`) is honest: it writes the same
data z-ordered and shuffled, reads the parquet FOOTERS with pyarrow,
and asserts the per-file min/max spans of the clustering columns are
materially narrower under z-order — i.e. pruning would actually skip
files, not just that we sorted something.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float",
                     "double", "decimal")


def _quantile_key(df: DataFrame, c: str):
    """Order-preserving numeric sort key for a clustering column:
    numeric passes through, date/timestamp becomes epoch seconds,
    anything else raises (approx_percentile needs an arithmetic
    domain)."""
    dt = dict(df.dtypes).get(c)
    if dt is None:
        raise ValueError(f"z_value: no column {c!r} in frame")
    if dt == "date" or dt.startswith("timestamp"):
        return F.col(c).cast("timestamp").cast("double")
    # ANSI interval types ('interval day to second', 'interval year to
    # month') share the 'int' prefix but have no quantile arithmetic —
    # exclude them BEFORE the numeric-prefix test so they fail loud
    # here instead of deep inside percentile_approx/lit.
    if not dt.startswith("interval") and dt.startswith(_NUMERIC_PREFIXES):
        return F.col(c)
    raise ValueError(
        f"z_value: column {c!r} has non-orderable-numeric type {dt}; "
        "pre-encode it to a numeric sort key to cluster on it"
    )


def _column_breakpoints(
    df: DataFrame, cols: Sequence[str], bits: int, accuracy: int
) -> dict[str, list | None]:
    """The 2^bits − 1 approx-quantile breakpoints per clustering column
    (ONE aggregation for all columns; None for an all-null column) —
    factored out so ``zorder_write`` can persist them as table metadata
    and ``zorder_incremental`` can bin arrival batches with the SAME
    grid the table was laid out with."""
    nlevels = 1 << bits
    probs = [k / nlevels for k in range(1, nlevels)]
    keys = {c: _quantile_key(df, c) for c in cols}
    row = df.agg(
        *[
            F.percentile_approx(keys[c], probs, accuracy).alias(f"q{i}")
            for i, c in enumerate(cols)
        ]
    ).collect()[0]
    return {c: (list(row[f"q{i}"]) if row[f"q{i}"] is not None else None)
            for i, c in enumerate(cols)}


def _when_tree_count_le(key, bps: list, offset: int = 0):
    """``count(b in bps where key >= b)`` as a balanced ``F.when``
    binary-search tree over a SORTED list — row cost = tree depth.
    Only for SHORT lists: a 255-breakpoint tree is 511 nested WHEN
    nodes, which blows past whole-stage codegen limits and measured
    ~3× SLOWER than the linear scan it replaced (plus a one-off ~70 s
    janino compile). Duplicates count like a linear scan; a null key
    takes every ``otherwise`` branch to the leftmost leaf = 0."""
    if not bps:
        return F.lit(offset).cast("long")
    mid = len(bps) // 2
    return F.when(
        key >= F.lit(bps[mid]),
        _when_tree_count_le(key, bps[mid + 1 :], offset + mid + 1),
    ).otherwise(_when_tree_count_le(key, bps[:mid], offset))


_CHUNK = 16


def _count_le(key, bps: list):
    """``count(b in bps where key >= b)`` over the SORTED breakpoint
    list — the per-row searchsorted that turns a value into its z
    level. The r11 census found the original single ``F.aggregate``
    over a ``2^bits − 1``-literal array dominated ``zorder_write``:
    higher-order-function lambdas evaluate per array ELEMENT through
    the interpreted expression path, so bits=8 × 2 cols = 510
    interpreted evals/row made the __z materialization ~5 s of the
    ~10 s sf0.1 write. Two-level search instead: a depth-4 WHEN tree
    over the 15 chunk sentinels (every 16th breakpoint — codegen'd)
    picks the one 16-element chunk the key lands in, and the lambda
    scan runs over ``F.slice`` of just that chunk — ≤16 interpreted
    evals/row, ~16× fewer. Chunks before the sentinel count are whole
    (their sentinel, i.e. their max, is <= key); chunks after cannot
    contribute (their elements exceed the first sentinel > key).
    Null keys: sentinel WHENs fall through to 0 and the lambda's
    ``otherwise(0)`` keeps the chunk scan at 0 — level 0, exactly the
    original semantics. Counts, hence __z and the written layout, are
    bit-identical to the linear scan's."""
    if len(bps) <= _CHUNK:
        return _when_tree_count_le(key, bps)
    sentinels = [bps[i] for i in range(_CHUNK - 1, len(bps), _CHUNK)]
    coarse = _when_tree_count_le(key, sentinels)
    chunk = F.slice(
        F.array(*[F.lit(b) for b in bps]),
        (coarse * _CHUNK + 1).cast("int"),
        _CHUNK,
    )
    fine = F.aggregate(
        chunk,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(key >= b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return coarse * _CHUNK + fine


def z_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    accuracy: int = 10000,
    breakpoints: dict | None = None,
) -> DataFrame:
    """Attach ``__z`` — the Morton interleave of the rank-quantized
    clustering columns (``bits`` bits each; 2 cols × 8 bits → 16-bit
    z-space). Quantile breakpoints make the quantization uniform under
    ANY value distribution — skew in raw values cannot collapse the
    curve.

    Scale path: ONE ``approx_percentile`` aggregation computes the
    ``2^bits - 1`` breakpoints per column (Greenwald–Khanna sketch,
    memory bounded by ``accuracy``, never a global sort or window);
    the O(cols × 2^bits) breakpoint constants are collected once —
    bounded at every SF, like the k-means centroid collects — and
    embedded as literals, so the per-row bin is a codegen'd
    searchsorted (count of breakpoints <= value) with no window, no
    join, no UDF. NOTE: building the plan triggers that one agg job.
    Nulls bin to level 0, matching NULLS FIRST rank order.

    Types: numeric columns bin natively; date/timestamp are cast to
    epoch seconds (order-preserving). Other types raise — quantile
    sketches need an arithmetic domain; pre-encode strings to a
    numeric sort key if you must cluster on one.

    Determinism: breakpoints are exact (hence partition-layout-
    independent) while row count stays within the GK sketch's exact
    regime (~``accuracy`` rows); beyond that they may vary within the
    1/accuracy rank-error bound across different input partitionings.
    Fine for LAYOUT (files still cluster); do not treat z values as a
    reproducible row property at whole-table scale.

    ``breakpoints`` (col → sorted list, or None for all-null) skips
    the quantile aggregation and bins against the GIVEN grid — how
    ``zorder_incremental`` places an arrival batch on the same z-grid
    the table was originally laid out with (the grid drifts from the
    data's true quantiles until the next full rewrite; that is the
    standard OPTIMIZE trade)."""
    if not cols:
        raise ValueError("z_value needs at least one clustering column")
    nlevels = 1 << bits
    keys = {c: _quantile_key(df, c) for c in cols}
    if breakpoints is None:
        breakpoints = _column_breakpoints(df, cols, bits, accuracy)
    out = df
    qs = []
    for i, c in enumerate(cols):
        bps = breakpoints[c]
        if bps is None:  # all-null column: everything bins to level 0
            qs.append(F.lit(0).cast("long"))
            continue
        key = keys[c]
        lvl = _count_le(key, bps)
        qs.append(F.least(lvl, F.lit(nlevels - 1)).cast("long"))
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
    Z-curve of ``cols``: slice z-space at the sketched quantiles of
    the actual z distribution (each file owns a compact z-range), hash
    a per-slice routing token so each slice lands in exactly one task,
    and sort within partitions so row groups are clustered too. The
    helper columns are dropped on write. Whole-table scale-safe: the
    z-curve bins against approx-quantile breakpoints (see ``z_value``)
    — no unpartitioned window, no RangePartitioner sampling, anywhere
    in the plan.

    The write takes three actions (z breakpoint agg, __z quantile agg,
    the write itself); without tracking, each would re-run the full
    upstream lineage AND the O(cols × 2^bits) per-row searchsorted. So:
    persist ``df`` (materialized by the breakpoint agg), build ``zdf``
    over it, persist ``zdf`` (materialized by the quantile agg, which
    only re-reads the cached input), drop the input cache, write from
    the cached ``zdf`` — upstream lineage and the bin computation each
    execute exactly once.

    A ``_zorder_meta.json`` sidecar (underscore-prefixed: invisible to
    parquet readers) records the layout grid — clustering columns,
    bits, per-column quantile breakpoints, and the z slice breakpoints
    — so ``zorder_incremental`` can later place arrival batches on the
    SAME grid and rewrite only the slice files they touch."""
    df = df.persist()
    zdf = df  # placeholder until built — the finally below unpersists both
    try:
        col_bps = _column_breakpoints(df, cols, bits, 10000)
        zdf = z_value(df, cols, bits=bits, breakpoints=col_bps)
        # Deterministic file ownership, balanced under ANY joint
        # distribution: per-column levels are rank-uniform, but
        # CORRELATED clustering columns concentrate z near the Morton
        # diagonal, so fixed equal-width slices would leave files empty
        # and others oversized. Slice at the quantiles of __z itself
        # instead (one more tiny agg). Binning by breakpoint count
        # keeps every equal z value in one file — a sketch-error shift
        # moves a boundary BETWEEN z values (slightly uneven file
        # sizes), it can never bleed one slice's edge rows into the
        # neighboring file, which is what widens min/max spans and
        # kills pruning.
        zbps = []
        if n_files > 1:
            zdf = zdf.persist()
            zprobs = [k / n_files for k in range(1, n_files)]
            (got,) = zdf.agg(
                F.percentile_approx("__z", zprobs, 10000).alias("b")
            ).collect()[0]
            zbps = list(got or [])  # None only for an empty frame
            df.unpersist()  # zdf is materialized; the input cache is done
        pid = _slice_id([int(b) for b in zbps])  # shared w/ zorder_incremental
        # Route each slice to its own task EXACTLY: repartitionByRange's
        # reservoir sampling merges adjacent slices at small batch
        # sizes (equal-key bounds can skip a value), so instead
        # hash-partition on a per-slice token chosen so
        # pmod(murmur3(token), n_files) == pid. No sampling, one
        # shuffle, each file owns its exact z-slice.
        tok = _pid_token_column(zdf.sparkSession, n_files, pid)
        (
            zdf.withColumn("__tok", tok)
            .repartition(n_files, F.col("__tok"))
            .sortWithinPartitions("__z")
            .drop("__z", "__tok")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        # both unpersists are no-ops when the frame was never cached or
        # was already released — this also covers a raise out of the
        # breakpoint agg / quantile collect, which would otherwise leak
        # the cached input
        zdf.unpersist()
        df.unpersist()
    _write_zorder_meta(
        path,
        {
            "cols": list(cols),
            "bits": bits,
            "n_files": n_files,
            "col_breakpoints": col_bps,
            "z_breakpoints": [int(b) for b in zbps],
        },
    )


def _write_zorder_meta(path: str, meta: dict) -> None:
    import json
    import os

    with open(os.path.join(path, "_zorder_meta.json"), "w") as f:
        # decimals (and any other non-JSON scalar) stringify; the
        # reader re-casts against the table's column dtype
        json.dump(meta, f, default=str)


def _read_zorder_meta(path: str) -> dict:
    import json
    import os

    p = os.path.join(path, "_zorder_meta.json")
    if not os.path.exists(p):
        raise ValueError(
            f"zorder_incremental: {path!r} has no _zorder_meta.json — "
            "the table must have been written by zorder_write"
        )
    with open(p) as f:
        return json.load(f)


def _restore_breakpoints(
    df: DataFrame, cols: Sequence[str], stored: dict
) -> dict[str, list | None]:
    """Re-type JSON-round-tripped breakpoints against the frame's
    dtypes: decimals were stringified on write (json default=str) and
    must come back as exact Decimal literals — a float detour would
    distort ordering past 2^53. Numeric/epoch-double values pass
    through."""
    import decimal

    dts = dict(df.dtypes)
    out: dict[str, list | None] = {}
    for c in cols:
        v = stored[c]
        if v is not None and dts.get(c, "").startswith("decimal"):
            v = [decimal.Decimal(str(x)) for x in v]
        out[c] = v
    return out


def _slice_id(zbps: Sequence[int]) -> "F.Column":
    """Slice id of ``__z`` against the table's z breakpoints — the
    same count-of-breakpoints-≤-z binning zorder_write routes with
    (a boundary can move BETWEEN z values, never split one)."""
    if not zbps:
        return F.lit(0).cast("long")
    return F.aggregate(
        F.array(*[F.lit(int(b)).cast("long") for b in zbps]),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col("__z") >= b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def _pid_token_column(spark, n_files: int, pid: "F.Column") -> "F.Column":
    """Routing token for a slice-id column: element_at of the exact
    murmur3 token map, so ``repartition(n_files, token)`` sends slice
    p to partition index p. Longs on BOTH map sides — murmur3 is
    type-sensitive (hash of an int32 token != hash of the long the
    probe job measured). Shared by zorder_write and
    zorder_incremental so the two writers' routing cannot drift (the
    part-index ≡ slice-id invariant _slice_files depends on)."""
    tokens = _exact_partition_tokens(spark, n_files)
    return F.element_at(
        F.create_map(
            *[
                x
                for p, t in enumerate(tokens)
                for x in (F.lit(p).cast("long"), F.lit(t).cast("long"))
            ]
        ),
        pid,
    )


def _slice_files(path: str) -> dict[int, list[str]]:
    """Map slice id → parquet files, parsed from Spark's part-XXXXX
    task index (zorder_write's exact token routing makes partition
    index ≡ slice id; an empty slice simply has no file)."""
    import glob
    import os

    out: dict[int, list[str]] = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        name = os.path.basename(f)
        if not name.startswith("part-"):
            raise ValueError(
                f"zorder_incremental: unexpected file {name!r} in a "
                "zorder_write table"
            )
        out.setdefault(int(name.split("-")[1]), []).append(f)
    return out


_SWAP_MANIFEST = "_zorder_swap.json"
_SWAP_TMP_SUFFIX = ".inprogress"


def _fsync_path(p: str) -> None:
    """fsync a file or directory by path. Directory fsync makes the
    rename/unlink entries inside it durable — without it the swap
    protocol is only process-crash-safe, not power-loss-safe: the
    kernel may persist a LATER write (an add's data blocks) while an
    EARLIER metadata op (the manifest's rename) is still only in the
    page cache, and on reboot recover_pending_swap would see adds
    beside the old generation with no manifest — 'clean', rows
    double-counted. Best-effort on filesystems that reject directory
    fds (the protocol degrades to process-crash safety, never worse).
    (r11 review)"""
    import os

    try:
        fd = os.open(p, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _write_swap_manifest(
    manifest: str, staged: list[str], old_files: list[str]
) -> None:
    """Write the swap intent manifest via temp-file + rename so a
    crash mid-write can never leave truncated JSON at the final name
    (which would wedge every later recover_pending_swap on
    json.load). ``add_sizes`` lets recovery verify each add really
    completed before choosing the complete-the-swap branch."""
    import json
    import os

    body = {
        "add": [os.path.basename(f) for f in staged],
        "add_sizes": {
            os.path.basename(f): os.path.getsize(f) for f in staged
        },
        "remove": [os.path.basename(f) for f in old_files],
    }
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(body, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, manifest)
    # the manifest's directory entry must be durable BEFORE any add
    # moves in: adds-present-without-manifest reads as 'clean'
    _fsync_path(os.path.dirname(manifest))


def _move_into_table(src: str, path: str) -> None:
    """Move a staged file into the table directory in two steps:
    copy under a temp name first (the staging dir is usually a
    different filesystem — /tmp — so shutil.move degrades to
    copy+unlink, which is NOT atomic), then os.rename (atomic on the
    same fs) to the final part name. A crash mid-copy leaves only a
    truncated ``*.inprogress`` file that recover_pending_swap sweeps;
    a file sitting at its final part name is always complete."""
    import os
    import shutil

    final = os.path.join(path, os.path.basename(src))
    tmp = final + _SWAP_TMP_SUFFIX
    shutil.move(src, tmp)
    # data blocks durable before the rename publishes the final name:
    # a power loss must never leave a hole-y file at a name recovery's
    # size check would accept (the copy wrote the full length)
    _fsync_path(tmp)
    os.rename(tmp, final)


def recover_pending_swap(path: str) -> str:
    """Repair an interrupted ``zorder_incremental`` file swap (called
    automatically at the start of every incremental run; exposed for
    out-of-band repair). The swap protocol writes a ``_zorder_swap``
    intent manifest, moves every replacement IN, removes the
    superseded files, then deletes the manifest — so on finding a
    manifest:

    - every ``add`` present → the swap reached the remove phase:
      COMPLETE it (delete whatever ``remove`` files linger);
    - any ``add`` missing → the crash hit the add phase, before any
      removal started (removals strictly follow the last add): ROLL
      BACK by deleting the partial adds — the old generation is still
      complete on disk.

    Either way the table is exactly one generation afterwards; a
    re-run can then apply the arrival batch once, never twice.
    Returns "completed", "rolled_back", or "clean"."""
    import glob
    import json
    import os

    manifest = os.path.join(path, _SWAP_MANIFEST)
    # Mid-copy temps (_move_into_table) and a half-written manifest
    # temp are never part of a committed generation — sweep them
    # unconditionally before anything else.
    for t in glob.glob(os.path.join(path, "*" + _SWAP_TMP_SUFFIX)):
        os.remove(t)
    if os.path.exists(manifest + ".tmp"):
        os.remove(manifest + ".tmp")
    if not os.path.exists(manifest):
        return "clean"
    try:
        with open(manifest) as fh:
            m = json.load(fh)
    except ValueError:
        # Truncated manifest (a crash mid-write, possible only for a
        # pre-temp+rename writer): adds strictly follow a COMPLETED
        # manifest write, so nothing has moved and the old generation
        # is intact — treat as the rollback branch instead of wedging
        # every subsequent call on json.load.
        os.remove(manifest)
        return "rolled_back"
    adds = [os.path.join(path, b) for b in m["add"]]
    removes = [os.path.join(path, b) for b in m["remove"]]
    sizes = m.get("add_sizes") or {}

    def _add_ok(f: str) -> bool:
        # An add counts as present only at its recorded size: the
        # temp+rename move means our own crashes never leave a
        # truncated file at a final name, but a legacy cross-fs
        # copy crash could — completing a swap over one would
        # silently lose data when the old generation is removed.
        if not os.path.exists(f):
            return False
        want = sizes.get(os.path.basename(f))
        return want is None or os.path.getsize(f) == want

    if all(_add_ok(f) for f in adds):
        for f in removes:
            if os.path.exists(f):
                os.remove(f)
        outcome = "completed"
    else:
        for f in adds:
            if os.path.exists(f):
                os.remove(f)
        outcome = "rolled_back"
    # unlinks durable BEFORE the manifest goes: a power loss that
    # persisted the manifest removal but not the file removals would
    # otherwise leave both generations merged with nothing left to
    # trigger repair (same ordering hazard as the swap itself)
    _fsync_path(path)
    os.remove(manifest)
    _fsync_path(path)
    return outcome


def zorder_incremental(spark, path: str, arrivals: DataFrame) -> dict:
    """OPTIMIZE-style incremental maintenance of a ``zorder_write``
    table: place the arrival batch on the table's ORIGINAL z-grid (the
    ``_zorder_meta.json`` sidecar's column + z breakpoints — no new
    quantile sketch, the binning is a pure codegen projection) and
    rewrite ONLY the slice files the arrivals land in; every other
    file stays byte-identical on disk, so at 100 TB a daily batch
    touching 3 of 10,000 slices costs 3 file rewrites, not a table
    rewrite. The grid drifts from the merged data's true quantiles
    until the next full ``zorder_write`` — the standard OPTIMIZE
    trade; pruning quality degrades only as far as the arrivals'
    spread.

    Mechanics: arrivals bin to slice ids (count of z breakpoints ≤ z);
    the touched slice set is one bounded collect (≤ n_files ints);
    touched slices' existing files + their arrivals are re-sorted and
    rewritten through the SAME exact murmur3 token routing as the full
    write (partition index ≡ slice id, so the part-XXXXX name keeps
    encoding the slice), staged to a temp dir, then swapped in with a
    TWO-PHASE commit: a ``_zorder_swap.json`` intent manifest (the
    add/remove basenames) is written first, replacements move in, old
    files are removed, the manifest is deleted. A crash anywhere
    mid-swap is repaired by the next zorder_incremental /
    ``recover_pending_swap`` call: with every add present the swap
    completes (removes finish); otherwise it rolls back (partial adds
    deleted — the old generation is still complete because removals
    only start after the add loop ends). No window loses rows, and a
    re-run after a crash cannot double arrivals. Single-writer
    assumption throughout (like every table writer here); a
    concurrent reader mid-swap can see both generations of a touched
    slice.

    Returns ``{"touched_slices", "rewritten_files", "total_files"}``."""
    import glob
    import os
    import shutil

    from oamap_spark.sources.staging import staging_path

    recover_pending_swap(path)
    meta = _read_zorder_meta(path)
    cols, bits, n_files = meta["cols"], meta["bits"], meta["n_files"]
    zbps = meta["z_breakpoints"]
    col_bps = _restore_breakpoints(arrivals, cols, meta["col_breakpoints"])
    azdf = z_value(arrivals, cols, bits=bits, breakpoints=col_bps).withColumn(
        "__pid", _slice_id(zbps)
    )
    azdf = azdf.persist()
    try:
        touched = sorted(
            r["__pid"] for r in azdf.select("__pid").distinct().collect()
        )
        if not touched:  # empty arrival batch — nothing to do
            return {
                "touched_slices": [],
                "rewritten_files": 0,
                "total_files": len(glob.glob(os.path.join(path, "*.parquet"))),
            }
        by_slice = _slice_files(path)
        old_files = [f for p in touched for f in by_slice.get(p, [])]
        merged = azdf
        if old_files:
            old = spark.read.parquet(*old_files)
            oldz = z_value(
                old, cols, bits=bits, breakpoints=col_bps
            ).withColumn("__pid", _slice_id(zbps))
            merged = oldz.unionByName(azdf)
        tok = _pid_token_column(spark, n_files, F.col("__pid"))
        # staging_path roots are atexit-swept, so a failed write/swap
        # cannot leak a GB-scale orphan copy past process exit; the
        # success path still removes it eagerly below
        stage_dir = staging_path("oamap_zorder_incr_", "out")
        (
            merged.withColumn("__tok", tok)
            .repartition(n_files, F.col("__tok"))
            .sortWithinPartitions("__z")
            .drop("__z", "__pid", "__tok")
            .write.parquet(stage_dir)
        )
        # Spark emits a part file for partition 0 even when that
        # partition is empty — an arrival batch that does not touch
        # slice 0 would otherwise swap an empty part-00000 in BESIDE
        # slice 0's real file (never in the remove list), over-count
        # rewritten_files vs touched_slices, and leak one empty file
        # per high-z batch. Keep only parts whose task index (≡ slice
        # id under the exact token routing) is actually touched.
        touched_set = {int(p) for p in touched}
        staged = [
            f
            for f in glob.glob(os.path.join(stage_dir, "*.parquet"))
            if int(os.path.basename(f).split("-")[1]) in touched_set
        ]
        # two-phase swap: record intent, add, remove, clear intent.
        # Adds precede removes so no window loses rows; the manifest
        # makes a crash at ANY point repairable (see
        # recover_pending_swap).
        manifest = os.path.join(path, _SWAP_MANIFEST)
        _write_swap_manifest(manifest, staged, old_files)
        for f in staged:
            _move_into_table(f, path)
        # all add renames durable before the first removal: otherwise
        # a power loss could persist the unlinks but not the renames,
        # and recovery's all-adds-present check would roll back a swap
        # whose old generation is already gone
        _fsync_path(path)
        for f in old_files:
            os.remove(f)
        os.remove(manifest)
        _fsync_path(path)
        shutil.rmtree(os.path.dirname(stage_dir), ignore_errors=True)
        return {
            "touched_slices": [int(p) for p in touched],
            "rewritten_files": len(staged),
            "total_files": len(glob.glob(os.path.join(path, "*.parquet"))),
        }
    finally:
        azdf.unpersist()


def _exact_partition_tokens(spark, n: int) -> list[int]:
    """For each partition id p in [0, n), a long token t with
    ``pmod(hash(t), n) == p`` — computed with Spark's own murmur3
    ``hash`` so ``repartition(n, token)`` places rows exactly. One
    O(n)-row collect per write (bounded at every SF, like the k-means
    centroid collects); candidate range doubles until all residues are
    covered (expected first try: P(miss) ~ n·e^(-64))."""
    k = 64 * n
    while True:
        rows = (
            spark.range(k)
            .withColumn("p", F.pmod(F.hash(F.col("id")), F.lit(n)))
            .groupBy("p")
            .agg(F.min("id").alias("t"))
            .collect()
        )
        if len(rows) == n:
            got = {r["p"]: r["t"] for r in rows}
            return [got[p] for p in range(n)]
        k *= 2


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


def file_digests(path: str) -> dict[str, str]:
    """Per-parquet-file md5 of the full bytes — THE byte-stability
    probe behind zorder_incremental's untouched-files guarantee
    (shared by test_layout and tools/zorder_incr_curve so the
    SCALE.md 'md5-byte-stable' claim is always measured one way)."""
    import glob
    import hashlib
    import os

    out = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


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

    if sort_by and even_sizes:
        raise ValueError(
            "compact: sort_by and even_sizes are mutually exclusive — "
            "range partitioning on sort_by already determines file sizes"
        )
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
