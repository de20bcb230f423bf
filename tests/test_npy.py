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
