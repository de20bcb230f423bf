"""numpy-file backend (sources/npy.py): .npy / .npz / directory ingest."""

from __future__ import annotations

import numpy as np
import pytest

from oamap_spark.sources import npy


def test_from_numpy_columns_and_nested(spark):
    ids = np.arange(5, dtype=np.int64)
    vecs = np.arange(15, dtype=np.float64).reshape(5, 3)
    df = npy.from_numpy(spark, {"id": ids, "vec": vecs})
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == list(range(5))
    assert list(rows[1]["vec"]) == [3.0, 4.0, 5.0]


def test_from_numpy_length_mismatch_raises(spark):
    with pytest.raises(ValueError, match="leading dimension"):
        npy.from_numpy(spark, {"a": np.arange(3), "b": np.arange(4)})


def test_read_npy_npz_and_dir(spark, tmp_path):
    a = np.arange(4, dtype=np.int64)
    b = np.linspace(0.0, 1.0, 4)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", b)
    np.savez(tmp_path / "bundle.npz", a=a, b=b)

    one = npy.read_numpy(spark, str(tmp_path / "a.npy"))
    assert one.columns == ["a"] and one.count() == 4

    bundle = npy.read_numpy(spark, str(tmp_path / "bundle.npz"))
    assert sorted(bundle.columns) == ["a", "b"]

    d = tmp_path / "cols"
    d.mkdir()
    np.save(d / "x.npy", a)
    np.save(d / "y.npy", b)
    both = npy.read_numpy(spark, str(d))
    assert sorted(both.columns) == ["x", "y"]
    got = sorted(both.collect(), key=lambda r: r["x"])
    assert [r["x"] for r in got] == [0, 1, 2, 3]


def test_npy_python_datasource_parallel_read(spark, tmp_path):
    """The DataSource V2 path: register, read a directory of .npy
    columns, verify schema/rows and that multiple partitions formed."""
    import numpy as np

    from oamap_spark.sources.npy_datasource import NpyDataSource

    d = tmp_path / "npds"
    d.mkdir()
    np.save(d / "id.npy", np.arange(100, dtype=np.int64))
    np.save(d / "val.npy", np.linspace(0.0, 1.0, 100))

    spark.dataSource.register(NpyDataSource)
    df = spark.read.format("npy").load(str(d))
    assert sorted(df.columns) == ["id", "val"]
    assert df.rdd.getNumPartitions() > 1
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 100
    assert rows[0]["id"] == 0 and abs(rows[99]["val"] - 1.0) < 1e-12
    # pushdown-free but prunable: column projection still works
    assert df.select("id").where("id < 10").count() == 10


def test_npy_datasource_jagged_round_trip(spark, tmp_path):
    """The ROOT jagged-branch mapping (SURVEY §2.C): a directory with
    <col>_offsets.npy + <col>_content.npy reads back as an array<T>
    column alongside flat columns — offsets/content is exactly how a
    TBranch of vector<float> decomposes, and oamap's List encoding.
    Round trip: write known jagged data, read through the registered
    DataSource, compare per-row lists and an exploded aggregate."""
    import numpy as np

    from oamap_spark.sources.npy_datasource import NpyDataSource

    d = tmp_path / "jagged"
    d.mkdir()
    # 5 events: pts lists of lengths 2,0,3,1,4 — empties included
    lists = [[1.0, 2.0], [], [3.0, 4.0, 5.0], [6.0], [7.0, 8.0, 9.0, 10.0]]
    content = np.array([x for l in lists for x in l], dtype=np.float64)
    offsets = np.cumsum([0] + [len(l) for l in lists]).astype(np.int64)
    np.save(d / "event_id.npy", np.arange(5, dtype=np.int64))
    np.save(d / "pts_offsets.npy", offsets)
    np.save(d / "pts_content.npy", content)

    spark.dataSource.register(NpyDataSource)
    df = spark.read.format("npy").load(str(d))
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "event_id": "bigint",
        "pts": "array<double>",
    }
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    assert [r["pts"] for r in rows] == lists
    # the jagged column behaves as a normal array column downstream
    total = df.selectExpr("sum(aggregate(pts, 0.0D, (a, x) -> a + x)) AS s").collect()
    assert abs(total[0]["s"] - sum(sum(l) for l in lists)) < 1e-12


def test_npy_datasource_jagged_validation(spark, tmp_path):
    """Orphaned offsets files and offset/content disagreements must
    fail loudly at schema/reader build, not mis-slice silently."""
    import numpy as np
    import pytest as _pt

    from oamap_spark.sources.npy_datasource import NpyDataSource

    d = tmp_path / "bad1"
    d.mkdir()
    np.save(d / "pts_offsets.npy", np.array([0, 2], dtype=np.int64))
    spark.dataSource.register(NpyDataSource)
    with _pt.raises(Exception, match="unpaired"):
        spark.read.format("npy").load(str(d)).schema

    d2 = tmp_path / "bad2"
    d2.mkdir()
    np.save(d2 / "pts_offsets.npy", np.array([0, 2, 5], dtype=np.int64))
    np.save(d2 / "pts_content.npy", np.array([1.0, 2.0, 3.0]))  # len 3 != 5
    with _pt.raises(Exception, match="offsets must run"):
        spark.read.format("npy").load(str(d2)).collect()


def test_npy_datasource_streaming_replay(spark, tmp_path):
    """The same registered format serves readStream: micro-batches of
    batch_rows rows in row order; an availableNow drain must replay the
    directory exactly once, including jagged columns."""
    from oamap_spark.sources.npy_datasource import NpyDataSource

    n = 10
    np.save(tmp_path / "pt.npy", np.arange(n, dtype=np.float64))
    counts = np.array([i % 3 for i in range(n)], dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(counts)
    content = np.arange(offsets[-1], dtype=np.int64)
    np.save(tmp_path / "hits_offsets.npy", offsets)
    np.save(tmp_path / "hits_content.npy", content)

    spark.dataSource.register(NpyDataSource)
    stream = (
        spark.readStream.format("npy")
        .option("batch_rows", "4")  # forces 3 micro-batches for 10 rows
        .load(str(tmp_path))
    )
    # NB: availableNow drains only the prefetched batch for SIMPLE
    # stream readers (one read() ahead), so run a real continuous
    # trigger and stop once the replay catches up — the unbounded-shape
    # this source would run with in production anyway.
    q = (
        stream.writeStream.format("memory")
        .queryName("npy_stream_sink")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    import time

    # Poll for catch-up, but distinguish "machine too slow" from a
    # correctness failure: if the deadline is hit, fail with the
    # stream's own progress report rather than a bare count mismatch.
    deadline = time.time() + 120
    caught_up = False
    while time.time() < deadline:
        if spark.table("npy_stream_sink").count() >= n:
            caught_up = True
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    assert caught_up, (
        f"TIMEOUT (not a correctness failure): sink held "
        f"{spark.table('npy_stream_sink').count()}/{n} rows after 120s; "
        f"lastProgress={q.lastProgress}"
    )
    got = sorted(
        spark.table("npy_stream_sink").collect(), key=lambda r: r["pt"]
    )
    assert len(got) == n
    batch = sorted(
        spark.read.format("npy").load(str(tmp_path)).collect(),
        key=lambda r: r["pt"],
    )
    assert [(r["pt"], list(r["hits"])) for r in got] == [
        (r["pt"], list(r["hits"])) for r in batch
    ]


def test_npy_stream_reader_clamps_to_min_column_rows(tmp_path):
    """A non-atomic appender (one column file grown before the others)
    must NOT let a micro-batch commit an offset past the shortest
    column: rows defer to the next batch instead of being silently
    dropped by zip-truncation, and a committed offset beyond the rows
    on disk fails loudly on replay (ADVICE r3, npy_datasource.py)."""
    from oamap_spark.sources.npy_datasource import NpyDataSource, _NpyStreamReader

    np.save(tmp_path / "pt.npy", np.arange(10, dtype=np.float64))
    offsets = np.arange(7, dtype=np.int64)  # 6 rows, 1 hit each
    np.save(tmp_path / "hits_offsets.npy", offsets)
    np.save(tmp_path / "hits_content.npy", np.arange(6, dtype=np.int64))

    ds = NpyDataSource({"path": str(tmp_path)})
    reader = _NpyStreamReader(str(tmp_path), ds.schema(), batch_rows=100)
    # pt has 10 rows but hits only 6 → batch stops at 6
    rows, end = reader.read({"row": 0})
    rows = list(rows)
    assert end == {"row": 6}
    assert len(rows) == 6
    # replay of the committed range is exact
    assert len(list(reader.readBetweenOffsets({"row": 0}, {"row": 6}))) == 6
    # replay PAST the rows on disk is a hard error, not a short read
    import pytest as _pt

    with _pt.raises(ValueError, match="exceeds"):
        reader.readBetweenOffsets({"row": 0}, {"row": 8})
    # offsets file grown AHEAD of content: only rows whose content is
    # fully on disk are visible (no silent short lists)
    np.save(tmp_path / "hits_offsets.npy", np.arange(11, dtype=np.int64))
    # content still has 6 values -> rows 0..5 complete, 6..9 incomplete
    rows15, end15 = reader.read({"row": 6})
    assert end15 == {"row": 6} and list(rows15) == []
    # once the appender syncs the jagged column, the tail flows
    np.save(tmp_path / "hits_content.npy", np.arange(10, dtype=np.int64))
    rows2, end2 = reader.read({"row": 6})
    assert end2 == {"row": 10} and len(list(rows2)) == 4


def test_npy_datasource_n_partitions_option(spark, tmp_path):
    """The `n_partitions` read option sizes the row-range slicing —
    rows-per-task is the caller's scale knob."""
    from oamap_spark.sources.npy_datasource import NpyDataSource

    d = tmp_path / "np8"
    d.mkdir()
    np.save(d / "x.npy", np.arange(64, dtype=np.int64))
    spark.dataSource.register(NpyDataSource)
    df = spark.read.format("npy").option("n_partitions", "8").load(str(d))
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 64


def test_npy_reader_yields_arrow_batches_with_rebased_offsets(tmp_path):
    """r11: the batch reader crosses the Python→JVM boundary as ONE
    Arrow RecordBatch per partition (vectorized DataSource path), not
    pickled row tuples. Pin the internals the optimization changed: a
    mid-range partition's jagged column must rebase offsets to the
    content slice, and declared types must be exact (int64/float64 and
    list<double>), since Arrow skips the Python-int coercion the old
    tuple path relied on."""
    import pyarrow as pa

    from oamap_spark.sources.npy_datasource import (
        NpyDataSource,
        _NpyReader,
        _RangePartition,
    )

    d = tmp_path / "arrowpin"
    d.mkdir()
    lists = [[1.0, 2.0], [], [3.0], [4.0, 5.0, 6.0], [7.0]]
    content = np.array([x for l in lists for x in l], dtype=np.float64)
    offsets = np.cumsum([0] + [len(l) for l in lists]).astype(np.int64)
    np.save(d / "event_id.npy", np.arange(5, dtype=np.int32))  # int32 → long
    np.save(d / "pts_offsets.npy", offsets)
    np.save(d / "pts_content.npy", content)

    src = NpyDataSource({"path": str(d)})
    reader = src.reader(src.schema())
    assert isinstance(reader, _NpyReader)
    # partition NOT starting at row 0: offsets must be rebased to the
    # partition's content slice
    out = list(reader.read(_RangePartition(2, 5)))
    assert len(out) == 1 and isinstance(out[0], pa.RecordBatch)
    batch = out[0]
    assert batch.schema.field("event_id").type == pa.int64()
    assert batch.schema.field("pts").type == pa.list_(pa.float64())
    assert batch.column(batch.schema.get_field_index("event_id")).to_pylist() == [2, 3, 4]
    assert batch.column(batch.schema.get_field_index("pts")).to_pylist() == lists[2:]
    # empty partition (empty directory-table case) yields nothing
    assert list(reader.read(_RangePartition(0, 0))) == []
