"""numpy-file backend (SURVEY §2.C): `.npy` / `.npz` / directories of
`.npy` → DataFrame.

oamap's numpy backend maps named arrays straight onto columns
(column-per-file; oamap/backend/numpyfile.py [M]). Same contract here:
each array is one column, row i of the DataFrame is element i of every
array; an N-D array becomes an array<...> column of its trailing
dimensions. Ingest is driver-side via Arrow (the arrays are local
files by definition — this is the small-data entry ramp; the scale
path is a one-time conversion to parquet with `write_parquet`, after
which everything is a distributed columnar scan)."""

from __future__ import annotations

import os
from collections.abc import Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def from_numpy(spark: SparkSession, arrays: Mapping[str, np.ndarray]) -> DataFrame:
    """Named numpy arrays → DataFrame (one column per array). All
    arrays must share their leading dimension; trailing dimensions
    become nested array columns."""
    if not arrays:
        raise ValueError("no arrays given")
    lengths = {name: len(a) for name, a in arrays.items()}
    if len(set(lengths.values())) != 1:
        raise ValueError(f"arrays disagree on leading dimension: {lengths}")
    cols = {
        name: (a if a.ndim == 1 else list(a.tolist()))
        for name, a in arrays.items()
    }
    return spark.createDataFrame(pd.DataFrame(cols))


def read_numpy(spark: SparkSession, path: str) -> DataFrame:
    """Load `.npy` (single column named after the file), `.npz`
    (column per bundled array), or a directory of `.npy` files
    (column per file)."""
    if os.path.isdir(path):
        arrays = {}
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".npy"):
                arrays[fn[: -len(".npy")]] = np.load(os.path.join(path, fn))
        if not arrays:
            raise ValueError(f"no .npy files in {path}")
        return from_numpy(spark, arrays)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return from_numpy(spark, {name: z[name] for name in z.files})
    arr = np.load(path)
    name = os.path.splitext(os.path.basename(path))[0]
    return from_numpy(spark, {name: arr})
