"""Dataset / Database layer — oamap's partitioned-dataset namespace,
Spark-first.

oamap keeps named datasets in a ``Database`` whose namespaces map to
array-storage backends, and lets *derived* datasets record how they
were computed so they are re-derivable (SURVEY §2.C — ``oamap/
dataset.py``, ``oamap/database.py`` [H]). The Spark re-expression:

- a dataset = a parquet directory (the array namespace) + a temp view
  (the queryable name) — scans stay vectorized/pruned, writes stay
  partitioned;
- provenance = a small JSON sidecar per dataset recording parents, the
  recipe text, and the schema both as Spark DDL and as the PLURTP spec
  (``oamap_spark.schema``) — oamap's schema-in-database design;
- "re-derivable" = :meth:`Database.derive` re-runs the recipe function
  against the recorded parents; the physical lineage of any live
  DataFrame remains the Catalyst plan itself.

At 100 TB nothing here changes: ``put`` writes through the normal
distributed writer (optionally ``partition_by`` for pruning), ``get``
is a lazy scan, and the sidecar is O(KB) driver-side metadata.
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from oamap_spark import schema as plurtp

_META = "_oamap_meta.json"
# No leading underscore: the `_`-prefixed namespace is reserved for
# internal sidecars (`_oamap_meta.json`, the `_checkpoints` root that
# put_stream writes) — otherwise list() would report `_checkpoints` as
# a dataset and put('_checkpoints', ...) could write data into the
# streaming-checkpoint root.
_NAME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Dataset:
    """A named, stored dataset: lazy DataFrame + its provenance."""

    name: str
    df: DataFrame
    meta: dict

    @property
    def parents(self) -> tuple[str, ...]:
        return tuple(self.meta.get("parents", ()))

    @property
    def recipe(self) -> str | None:
        return self.meta.get("recipe")

    def schema_node(self) -> plurtp.Node:
        """The stored PLURTP schema (falls back to the live DataFrame's
        schema if the sidecar predates the field)."""
        spec = self.meta.get("plurtp")
        if spec is not None:
            return plurtp._from_spec(spec)
        return plurtp.from_spark(self.df.schema)


class Database:
    """A directory-backed namespace of datasets.

    ``put`` stores + registers, ``get`` loads + registers, ``derive``
    computes a new dataset from stored parents and records how. Views
    make every dataset addressable from ``spark.sql`` immediately.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- storage ------------------------------------------------------

    def _dir(self, name: str) -> str:
        if not _NAME_RE.match(name):
            raise ValueError(f"dataset name {name!r} must be an identifier")
        return os.path.join(self.root, name)

    def put(
        self,
        name: str,
        df: DataFrame,
        *,
        partition_by: Sequence[str] = (),
        parents: Sequence[str] = (),
        recipe: str | None = None,
        mode: str = "error",
    ) -> Dataset:
        """Write ``df`` as parquet under the database root, record
        provenance, and register the name as a temp view."""
        path = self._dir(name)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        meta = {
            "name": name,
            "created_at": time.time(),
            "parents": list(parents),
            "recipe": recipe,
            "partition_by": list(partition_by),
            "schema_ddl": df.schema.simpleString(),
            "plurtp": plurtp._to_spec(plurtp.from_spark(df.schema)),
        }
        with open(os.path.join(path, _META), "w") as f:
            json.dump(meta, f, indent=1)
        return self.get(name)

    def get(self, name: str) -> Dataset:
        path = self._dir(name)
        if not os.path.isdir(path):
            raise KeyError(f"no dataset {name!r} in {self.root}")
        df = self.spark.read.parquet(path)
        meta_path = os.path.join(path, _META)
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        df.createOrReplaceTempView(name)
        return Dataset(name=name, df=df, meta=meta)

    def list(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and _NAME_RE.match(d)
        )

    # -- derivation ---------------------------------------------------

    def derive(
        self,
        name: str,
        fn: Callable[..., DataFrame],
        *parent_names: str,
        partition_by: Sequence[str] = (),
        mode: str = "error",
    ) -> Dataset:
        """Derived dataset: ``fn(parent_df, ...)`` over stored parents.
        The sidecar records the parent names and the recipe text
        (``fn``'s docstring or qualified name), so the derivation is
        reproducible: call ``derive`` again with the same ``fn`` and
        ``mode="overwrite"`` to re-derive after a parent changes."""
        parents = [self.get(p) for p in parent_names]
        out = fn(*[p.df for p in parents])
        recipe = (fn.__doc__ or "").strip() or getattr(fn, "__qualname__", str(fn))
        return self.put(
            name,
            out,
            partition_by=partition_by,
            parents=parent_names,
            recipe=recipe,
            mode=mode,
        )

    def provenance(self, name: str) -> dict:
        """The recorded lineage entry for ``name`` (oamap's re-derivable
        dataset metadata)."""
        return dict(self.get(name).meta)

    # -- streaming ----------------------------------------------------

    def put_stream(
        self,
        name: str,
        stream: DataFrame,
        *,
        parents: Sequence[str] = (),
        recipe: str | None = None,
    ) -> Dataset:
        """Drain a streaming DataFrame into the dataset's parquet
        directory with exactly-once semantics: the file-sink commit log
        plus the checkpoint (kept inside the database root) make the
        write idempotent — re-running after the source is exhausted
        appends nothing, and a crash mid-batch replays without
        duplicates. ``trigger(availableNow)`` bounds the drain; on a
        live source the identical call runs continuously. The sidecar
        is (re)written after each drain, so provenance and the PLURTP
        schema stay current."""
        path = self._dir(name)
        cp = os.path.join(self.root, "_checkpoints", name)
        q = (
            stream.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        meta = {
            "name": name,
            "created_at": time.time(),
            "parents": list(parents),
            "recipe": recipe,
            "partition_by": [],
            "streaming": True,
            "schema_ddl": stream.schema.simpleString(),
            "plurtp": plurtp._to_spec(plurtp.from_spark(stream.schema)),
        }
        with open(os.path.join(path, _META), "w") as f:
            json.dump(meta, f, indent=1)
        return self.get(name)
