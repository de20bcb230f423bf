"""Z-order layout: the parquet footers must prove the clustering —
per-file min/max spans tighten on BOTH columns vs a hash layout, and a
selective range predicate would skip most files."""

from __future__ import annotations

from pyspark.sql import functions as F

from oamap_spark.operators.layout import (
    file_column_ranges,
    pruning_fraction,
    z_value,
    zorder_write,
)
from oamap_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

N_FILES = 8


def _avg_span(spans):
    return sum(float(hi) - float(lo) for lo, hi in spans) / len(spans)


def test_zorder_tightens_file_ranges_both_columns(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zordered")
    hpath = str(tmp_path / "hashed")
    zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], n_files=N_FILES)
    orders.repartition(N_FILES).write.mode("overwrite").parquet(hpath)

    for col in ("o_custkey", "o_totalprice"):
        zs = file_column_ranges(zpath, col)
        hs = file_column_ranges(hpath, col)
        assert len(zs) == N_FILES and len(hs) == N_FILES
        # hash layout: every file spans ~the full domain; z-order: a
        # fraction of it, on BOTH columns at once
        assert _avg_span(zs) < 0.8 * _avg_span(hs), (
            col, _avg_span(zs), _avg_span(hs))


def test_zorder_enables_file_skipping(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z2")
    zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], n_files=N_FILES)
    spans = file_column_ranges(zpath, "o_custkey")
    lo = orders.agg(F.min("o_custkey")).collect()[0][0]
    # a narrow slice at the bottom of the custkey domain must be
    # skippable in most files
    assert pruning_fraction(spans, lo, lo + 50) >= 0.5


def test_z_value_is_deterministic_and_bounded(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    )
    z1 = z_value(orders, ["o_custkey", "o_totalprice"], bits=4)
    mx = z1.agg(F.max("__z")).collect()[0][0]
    assert 0 <= mx < (1 << 8)  # 2 cols × 4 bits
    z2 = z_value(orders.repartition(7), ["o_custkey", "o_totalprice"], bits=4)
    assert (
        z1.groupBy("__z").count().orderBy("__z").collect()
        == z2.groupBy("__z").count().orderBy("__z").collect()
    )


def test_zorder_balances_correlated_columns(spark, tmp_path):
    """Correlated clustering columns concentrate z on the Morton
    diagonal; fixed equal-width z slices would leave files empty and
    others oversized. Slicing at the quantiles of z itself must still
    write n_files files of comparable size."""
    import glob

    from pyspark.sql import functions as F2

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_custkey",
        # perfectly correlated second column
        (F.col("o_custkey") * 3 + 1).alias("derived"),
    )
    zpath = str(tmp_path / "zcorr")
    zorder_write(orders, zpath, ["o_custkey", "derived"], n_files=N_FILES)
    files = glob.glob(zpath + "/*.parquet")
    assert len(files) == N_FILES
    counts = [
        spark.read.parquet(f).count() for f in files
    ]
    assert min(counts) > 0.5 * (sum(counts) / len(counts)), counts
    # and the clustering still prunes: first-file-quality check
    spans = file_column_ranges(zpath, "o_custkey")
    lo = orders.agg(F2.min("o_custkey")).collect()[0][0]
    assert pruning_fraction(spans, lo, lo + 50) >= 0.5


def test_z_value_date_column_binning(spark):
    """date/timestamp clustering columns bin through the epoch-seconds
    sort key; unsupported types fail loudly."""
    import pytest as _pt

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    z = z_value(orders, ["o_orderdate"], bits=4)
    mx = z.agg(F.max("__z")).collect()[0][0]
    assert 0 <= mx < (1 << 4)
    with _pt.raises(ValueError, match="non-orderable-numeric"):
        z_value(orders, ["o_orderstatus"], bits=4)


def test_z_value_interval_column_rejected(spark):
    """'interval day to second' shares the 'int' dtype prefix with the
    numeric family but has no quantile arithmetic — it must hit the
    fail-loud ValueError, not a late percentile_approx/lit error."""
    import pytest as _pt

    d = spark.range(100).select(
        "id",
        (F.col("id").cast("timestamp") - F.lit(0).cast("timestamp")).alias("iv"),
    )
    assert dict(d.dtypes)["iv"].startswith("interval")
    with _pt.raises(ValueError, match="non-orderable-numeric"):
        z_value(d, ["iv"], bits=4)


def test_z_value_decimal_column_binning(spark):
    """decimal clustering columns pass through the quantile key
    untouched (approx_percentile handles exact decimals; no double
    cast that would distort ordering past 2^53)."""
    d = spark.range(1000).select(
        "id", (F.col("id") * F.lit(1.5)).cast("decimal(18,4)").alias("dec")
    )
    z = z_value(d, ["dec"], bits=4)
    mx = z.agg(F.max("__z")).collect()[0][0]
    assert 0 <= mx < (1 << 4)


def test_z_value_plan_has_no_window(spark):
    """The r8 verdict's last scale-killer: z_value must NOT plan a
    global (unpartitioned) Window — the quantile binning is an agg +
    literal searchsorted, so the physical plan contains no Window
    node at all."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    )
    z = z_value(orders, ["o_custkey", "o_totalprice"], bits=4)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_compact_rejects_sort_by_with_even_sizes(spark, tmp_path):
    import pytest

    from oamap_spark.operators.layout import compact

    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "region").write.parquet(src)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact(spark, src, str(tmp_path / "dst"),
                sort_by=["r_regionkey"], even_sizes=True)


def test_compact_merges_small_files_losslessly(spark, tmp_path):
    from oamap_spark.operators.layout import compact, file_column_ranges

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.parquet(src)  # the streaming-sink pathology
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 64
    n_out = compact(spark, src, dst, target_file_mb=128, sort_by=["user_id"])
    assert n_out < 8  # 1000 rows: far below one target file
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == a.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # sort_by keeps the rewrite prunable on user_id
    spans = file_column_ranges(dst, "user_id")
    assert all(lo <= hi for lo, hi in spans)


def test_compact_small_files_reduces_count(spark, tmp_path):
    """compact(even_sizes=True) must actually reduce the file count to
    the byte-target arithmetic (and never lose/dup rows — the declared
    compact_small_files_agg query hash-gates that; this pins the
    layout effect itself)."""
    import glob
    import os

    from oamap_spark.operators.layout import compact
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tiny = str(tmp_path / "tiny")
    docs.repartition(64).write.parquet(tiny)
    n_tiny = len(glob.glob(os.path.join(tiny, "*.parquet")))
    assert n_tiny == 64
    out = str(tmp_path / "compacted")
    n_written = compact(spark, tiny, out, target_file_mb=1024, even_sizes=True)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert n_written == 1 and len(files) == 1, (n_written, files)
    assert spark.read.parquet(out).count() == docs.count()


def test_zorder_incremental_rewrites_only_touched_files(spark, tmp_path):
    """Two-batch maintenance loop: the incremental write must leave
    every untouched slice file byte-identical, land the arrivals in
    the slices the meta grid routes them to, preserve the merged
    content exactly, and keep the pruning payoff."""
    from oamap_spark.operators.layout import file_digests, zorder_incremental

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where("o_orderkey % 10 != 0")
    # arrivals concentrated at the low end of BOTH clustering columns
    # so they land in few z slices
    arrivals = orders.where("o_orderkey % 10 = 0").where(
        (F.col("o_custkey") < 200) & (F.col("o_totalprice") < 60000.0)
    )
    assert arrivals.count() > 0
    path = str(tmp_path / "ztab")
    zorder_write(base, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)

    before = file_digests(path)
    stats = zorder_incremental(spark, path, arrivals)
    after = file_digests(path)

    # some, but not all, slices rewritten
    assert 0 < stats["rewritten_files"] < N_FILES, stats
    assert len(stats["touched_slices"]) == stats["rewritten_files"]
    # untouched files byte-stable (same path, same bytes)
    survivors = set(before) & set(after)
    assert len(survivors) == N_FILES - stats["rewritten_files"]
    assert all(before[f] == after[f] for f in survivors)
    # content equals base ∪ arrivals exactly
    got = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    want = sorted(tuple(r) for r in base.unionByName(arrivals).collect())
    assert got == want
    # pruning payoff preserved: a low-range predicate still skips
    # most files after the incremental rewrite
    spans = file_column_ranges(path, "o_custkey")
    lo = orders.agg(F.min("o_custkey")).collect()[0][0]
    assert pruning_fraction(spans, lo, lo + 50) >= 0.5


def test_zorder_incremental_requires_meta(spark, tmp_path):
    """A table without the _zorder_meta.json sidecar (not written by
    zorder_write) must fail loudly, not guess a grid."""
    import pytest as _pt

    from oamap_spark.operators.layout import zorder_incremental

    p = str(tmp_path / "plain")
    spark.range(100).write.parquet(p)
    with _pt.raises(ValueError, match="_zorder_meta"):
        zorder_incremental(spark, p, spark.range(5).toDF("id"))


def test_zorder_incremental_consecutive_batches(spark, tmp_path):
    """The maintenance LOOP: two successive incremental merges on the
    same table (grid metadata untouched by design — bins stay stable
    until the next full write) must keep content exact and the
    part-index ≡ slice-id invariant parseable for the next run."""
    from oamap_spark.operators.layout import zorder_incremental

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where("o_orderkey % 3 = 0")
    b1 = orders.where("o_orderkey % 3 = 1")
    b2 = orders.where("o_orderkey % 3 = 2")
    path = str(tmp_path / "zloop")
    zorder_write(base, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)
    s1 = zorder_incremental(spark, path, b1)
    s2 = zorder_incremental(spark, path, b2)
    assert s1["rewritten_files"] > 0 and s2["rewritten_files"] > 0
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    want = sorted(tuple(r) for r in orders.collect())
    assert got == want


def test_zorder_incremental_empty_batch_is_noop(spark, tmp_path):
    """An empty arrival batch must touch nothing."""
    from oamap_spark.operators.layout import file_digests, zorder_incremental

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zempty")
    zorder_write(orders, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)
    before = file_digests(path)
    stats = zorder_incremental(spark, path, orders.where("o_orderkey < 0"))
    assert stats == {
        "touched_slices": [],
        "rewritten_files": 0,
        "total_files": N_FILES,
    }
    assert file_digests(path) == before


def test_zorder_swap_recovery_completes_and_rolls_back(spark, tmp_path):
    """The two-phase swap's crash repair, both branches: with every
    'add' file present the interrupted swap COMPLETES (lingering
    'remove' files deleted); with a partial add it ROLLS BACK (adds
    deleted, old generation intact). Either way exactly one generation
    remains and a re-run cannot double arrivals."""
    import json
    import os

    from oamap_spark.operators.layout import (
        file_digests,
        recover_pending_swap,
        zorder_incremental,
    )

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where("o_orderkey % 10 != 0")
    arrivals = orders.where("o_orderkey % 10 = 0")
    path = str(tmp_path / "zswap")
    zorder_write(base, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)

    # branch 1: crash AFTER all adds, BEFORE removes — simulate by
    # copying one real file to a fake new-generation name and leaving
    # a manifest that says the old one should be removed
    import shutil

    files = sorted(file_digests(path))
    old_f, keep = files[0], files[1]
    new_name = os.path.basename(old_f).replace("part-", "part-", 1) + ".new.parquet"
    shutil.copy(old_f, os.path.join(path, new_name))
    with open(os.path.join(path, "_zorder_swap.json"), "w") as fh:
        json.dump(
            {"add": [new_name], "remove": [os.path.basename(old_f)]}, fh
        )
    assert recover_pending_swap(path) == "completed"
    assert not os.path.exists(old_f)
    assert os.path.exists(os.path.join(path, new_name))
    assert not os.path.exists(os.path.join(path, "_zorder_swap.json"))

    # branch 2: crash DURING adds — manifest lists an add that never
    # landed plus one that did; rollback must delete the partial add
    # and keep the old generation (the remove list untouched)
    partial = os.path.join(path, "partial-add.parquet")
    shutil.copy(keep, partial)
    with open(os.path.join(path, "_zorder_swap.json"), "w") as fh:
        json.dump(
            {
                "add": [os.path.basename(partial), "never-written.parquet"],
                "remove": [os.path.basename(keep)],
            },
            fh,
        )
    assert recover_pending_swap(path) == "rolled_back"
    assert not os.path.exists(partial)
    assert os.path.exists(keep)

    # a clean table reports clean, and the next incremental run
    # (which self-recovers first) still merges exactly
    assert recover_pending_swap(path) == "clean"
    zorder_incremental(spark, path, arrivals)
    got = spark.read.parquet(path).count()
    # branch 1 replaced old_f with a COPY of itself under a new name,
    # so content is unchanged: base ∪ arrivals exactly
    assert got == orders.count()


def test_slice_files_rejects_foreign_files(tmp_path):
    """A non-part parquet file in a zorder table means the table was
    written (or polluted) by something else — the slice-id parse must
    fail loudly, not mis-map files to slices."""
    import pytest as _pt

    from oamap_spark.operators.layout import _slice_files

    d = tmp_path / "tab"
    d.mkdir()
    (d / "part-00003-abc.parquet").write_bytes(b"x")
    (d / "rogue.parquet").write_bytes(b"x")
    with _pt.raises(ValueError, match="unexpected file"):
        _slice_files(str(d))
    (d / "rogue.parquet").unlink()
    assert _slice_files(str(d)) == {3: [str(d / "part-00003-abc.parquet")]}


def test_pid_token_column_routes_exactly(spark):
    """The shared routing token must send slice p to partition index p
    for every p — the invariant both writers and _slice_files rely on."""
    from oamap_spark.operators.layout import _pid_token_column

    n = 8
    df = spark.range(64).select((F.col("id") % n).alias("__pid"))
    tok = _pid_token_column(spark, n, F.col("__pid"))
    got = (
        df.withColumn("__tok", tok)
        .repartition(n, F.col("__tok"))
        .select("__pid", F.spark_partition_id().alias("part"))
        .distinct()
        .collect()
    )
    assert {(r["__pid"], r["part"]) for r in got} == {(p, p) for p in range(n)}


def test_restore_breakpoints_decimal_exact(spark):
    """JSON-round-tripped decimal breakpoints must come back as exact
    Decimals (a float detour would distort ordering past 2^53)."""
    import json
    from decimal import Decimal

    from oamap_spark.operators.layout import _restore_breakpoints

    d = spark.range(10).select(
        "id", F.lit("12345678901234.5678").cast("decimal(38,4)").alias("dec")
    )
    stored = json.loads(
        json.dumps({"dec": [Decimal("12345678901234.5678")]}, default=str)
    )
    out = _restore_breakpoints(d, ["dec"], stored)
    assert out["dec"] == [Decimal("12345678901234.5678")]
    assert isinstance(out["dec"][0], Decimal)


def test_window_table_plan_computes_md5_once(spark):
    """Regression pin for the InferFiltersFromGenerate trap (r10,
    measured 60×): a plain explode makes Catalyst infer size(pw) > 0
    and push it below the projections, inlining the md5 token
    transform once per element_at reference into a per-row Filter
    (~10 md5 occurrences in the plan, 95 s at sf0.1). The outer-
    explode form keeps exactly ONE md5 site (the tids projection) and
    no md5-bearing Filter."""
    from oamap_spark.operators.dedup import positional_window_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    w = positional_window_table(d, "doc_id", "text", 8)
    p = w._jdf.queryExecution().executedPlan().toString()
    assert p.count("md5") == 1, p.count("md5")
    assert not any(
        "md5" in line for line in p.splitlines() if "Filter" in line
    ), p


def test_ngram_window_overlap_plan_dodges_inferred_filter(spark):
    """Regression pin for the LAST known InferFiltersFromGenerate
    instance (r11): ngram_window_overlap's explode over the window-id
    array. The fixed form (persisted ids table + explode_outer +
    attribute null filter) must show NO md5-bearing Filter node (the
    trap inlines the full token transform into a per-row Filter,
    measured 60x on the identical positional_window_table shape) and
    must read the window-id table through the cache on BOTH plan
    branches (shared-window discovery AND the final n_windows join)
    so the tokenize pass runs once, not per consumer."""
    from oamap_spark.operators.dedup import ngram_window_overlap
    from tests.conftest import SF_SMOKE

    spark.catalog.clearCache()
    try:
        d = load_table(spark, SF_SMOKE, "documents")
        out = ngram_window_overlap(d, "doc_id", "text", 8)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert not any(
            "md5" in line for line in p.splitlines() if "Filter" in line
        ), p
        assert p.count("InMemoryTableScan") >= 2, p.count("InMemoryTableScan")
    finally:
        spark.catalog.clearCache()


def test_zorder_incremental_high_z_batch_filters_empty_part0(spark, tmp_path):
    """Spark emits a part file for partition 0 even when empty; an
    arrival batch touching only HIGH z slices must not swap that
    empty part-00000 in beside slice 0's real file. Pin: rewritten
    == touched (slice 0 absent), every slice keeps exactly one file,
    and content is exact."""
    import glob
    import os

    from oamap_spark.operators.layout import (
        _slice_files,
        file_digests,
        zorder_incremental,
    )

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where("o_orderkey % 10 != 0")
    hi_cust = orders.approxQuantile("o_custkey", [0.9], 0.001)[0]
    hi_price = orders.approxQuantile("o_totalprice", [0.9], 0.001)[0]
    arrivals = orders.where("o_orderkey % 10 = 0").where(
        (F.col("o_custkey") > hi_cust) & (F.col("o_totalprice") > hi_price)
    )
    assert arrivals.count() > 0
    path = str(tmp_path / "zhigh")
    zorder_write(base, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)

    before = file_digests(path)
    stats = zorder_incremental(spark, path, arrivals)
    assert 0 not in stats["touched_slices"], stats  # the premise
    assert len(stats["touched_slices"]) == stats["rewritten_files"], stats
    # one file per slice — no duplicate slice-0 generation, no leak
    by_slice = _slice_files(path)
    assert sorted(by_slice) == list(range(N_FILES))
    assert all(len(fs) == 1 for fs in by_slice.values()), by_slice
    # slice 0's original file is byte-identical
    (f0,) = by_slice[0]
    assert file_digests(path)[f0] == before[f0]
    # no empty parquet landed (an empty part is ~hundreds of bytes of
    # footer; every real slice file here carries rows)
    assert spark.read.parquet(path).count() == base.count() + arrivals.count()
    for f in glob.glob(os.path.join(path, "*.parquet")):
        assert spark.read.parquet(f).count() > 0, f


def test_zorder_swap_recovery_truncated_manifest_rolls_back(spark, tmp_path):
    """A truncated (unparseable) swap manifest means the crash hit
    the manifest write itself — nothing has moved, the table is
    intact. Recovery must clear it and report rolled_back, not raise
    on every later call."""
    import os

    from oamap_spark.operators.layout import (
        file_digests,
        recover_pending_swap,
        zorder_incremental,
    )

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.where("o_orderkey % 10 != 0")
    path = str(tmp_path / "ztrunc")
    zorder_write(base, path, ["o_custkey", "o_totalprice"], n_files=N_FILES)
    before = file_digests(path)
    with open(os.path.join(path, "_zorder_swap.json"), "w") as fh:
        fh.write('{"add": ["part-00001-x.par')  # truncated mid-write
    assert recover_pending_swap(path) == "rolled_back"
    assert not os.path.exists(os.path.join(path, "_zorder_swap.json"))
    assert file_digests(path) == before
    # the table is not wedged: a normal incremental run succeeds
    arrivals = orders.where("o_orderkey % 10 = 0")
    zorder_incremental(spark, path, arrivals)
    assert spark.read.parquet(path).count() == orders.count()


def test_zorder_swap_recovery_size_mismatch_rolls_back(tmp_path):
    """An 'add' present at its final name but NOT at its recorded
    size (a legacy cross-filesystem copy truncated by a crash) must
    take the ROLLBACK branch — completing the swap over a truncated
    file and deleting the old generation would silently lose data."""
    import json
    import os

    from oamap_spark.operators.layout import recover_pending_swap

    d = tmp_path / "zsz"
    d.mkdir()
    old = d / "part-00002-old.parquet"
    old.write_bytes(b"x" * 100)
    trunc = d / "part-00002-new.parquet"
    trunc.write_bytes(b"y" * 40)  # recorded as 90 below: mid-copy crash
    with open(d / "_zorder_swap.json", "w") as fh:
        json.dump(
            {
                "add": [trunc.name],
                "add_sizes": {trunc.name: 90},
                "remove": [old.name],
            },
            fh,
        )
    assert recover_pending_swap(str(d)) == "rolled_back"
    assert old.exists() and not trunc.exists()
    # and an add at the RIGHT size completes
    good = d / "part-00002-new.parquet"
    good.write_bytes(b"y" * 90)
    with open(d / "_zorder_swap.json", "w") as fh:
        json.dump(
            {
                "add": [good.name],
                "add_sizes": {good.name: 90},
                "remove": [old.name],
            },
            fh,
        )
    assert recover_pending_swap(str(d)) == "completed"
    assert good.exists() and not old.exists()


def test_zorder_swap_recovery_sweeps_inprogress_temps(tmp_path):
    """Leftover *.inprogress copies (and a half-written manifest
    temp) are never part of a committed generation — recovery sweeps
    them in every branch, including 'clean'."""
    from oamap_spark.operators.layout import recover_pending_swap

    d = tmp_path / "zswp"
    d.mkdir()
    keep = d / "part-00000-k.parquet"
    keep.write_bytes(b"x")
    tmp1 = d / "part-00001-n.parquet.inprogress"
    tmp1.write_bytes(b"partial")
    mtmp = d / "_zorder_swap.json.tmp"
    mtmp.write_bytes(b'{"add"')
    assert recover_pending_swap(str(d)) == "clean"
    assert keep.exists()
    assert not tmp1.exists() and not mtmp.exists()


def test_count_le_matches_linear_scan(spark):
    """r11: `_count_le` (the two-level searchsorted that replaced the
    single interpreted-HOF scan — 16× fewer lambda evals/row) must
    count EXACTLY like the linear scan it replaced, or __z and the
    written layout silently shift. Property-check against Python's
    bisect over adversarial sorted lists: duplicates (incl. runs that
    straddle the 16-chunk sentinels), short lists (pure WHEN-tree
    branch), the 255-long bits=8 shape, and null keys (level 0)."""
    import bisect
    import random

    from oamap_spark.operators.layout import _CHUNK, _count_le

    rng = random.Random(11)
    cases = []
    # short list → when-tree branch; long lists → two-level branch
    for n in (1, 3, _CHUNK, _CHUNK + 1, 40, 255):
        vals = sorted(rng.choice(range(0, 50)) for _ in range(n))
        cases.append(vals)
    # heavy duplicate run crossing several chunk boundaries
    cases.append(sorted([7] * 100 + [9] * 100 + [11] * 55))
    for bps in cases:
        probes = sorted({-1, 0, 49, 51, *rng.sample(range(0, 50), 10), *bps})
        df = spark.createDataFrame(
            [(float(p),) for p in probes] + [(None,)], "key double"
        )
        got = {
            r["key"]: r["n"]
            for r in df.select(
                "key", _count_le(F.col("key"), [float(b) for b in bps]).alias("n")
            ).collect()
        }
        for p in probes:
            assert got[float(p)] == bisect.bisect_right(bps, p), (
                f"bps(n={len(bps)}) key={p}: {got[float(p)]} != "
                f"{bisect.bisect_right(bps, p)}"
            )
        assert got[None] == 0, f"null key must bin to 0, got {got[None]}"
