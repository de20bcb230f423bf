"""Sequence packing — batching documents into fixed-capacity training
sequences (beyond the reference: a training-data pipeline op; oamap
has no batching surface, SURVEY §2.D's LLM-pipeline family).

Training consumes fixed-length token sequences; feeding one short
document per sequence wastes the padding. Packing concatenates
documents greedily until the next one would overflow the capacity —
the standard "greedy first-fit in arrival order" used by most LLM data
loaders, made DETERMINISTIC here by deriving the arrival order from
md5(doc id) so the same corpus always packs into the same sequences on
any engine, partitioning, or retry.

Distribution: a sequential scan can't parallelize, so the corpus is
split into hash-prefix buckets (the epoch_shuffle layout) and the
greedy scan runs per bucket — sequences never span buckets, which
costs at most one partially-filled sequence per bucket (bounded,
amortizes to nothing as buckets grow) and buys full parallelism. The
per-bucket scan is an applyInPandas body: a few-line Python loop over
a bucket-sized Arrow batch (ids + token counts only — text never
enters Python), the designed custom-stateful escape hatch. At 100 TB
pick ``bucket_hex`` so a bucket's (id, tokens) pairs fit a worker
batch: 4 hex chars = 65,536 buckets ≈ 1.5M docs/bucket at 100 G docs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    bucket_hex: int = 2,
) -> DataFrame:
    """Assign every document a (bucket, seq_idx, seq_off) packing slot.

    Within each md5-prefix bucket, documents are scanned in
    (md5(id), id) order; a document joins the current sequence when it
    fits (``fill + tokens <= capacity``), else it opens the next one.
    A document longer than ``capacity`` gets a sequence of its own
    (callers decide truncate-vs-split downstream; the slot table is
    policy-free). Returns one row per input row:

    ``id_col`` (integer ids, emitted as long), ``bucket`` (hex-prefix
    string),
    ``seq_idx`` (0-based within bucket), ``seq_off`` (token offset of
    this doc inside its sequence) — all integers/strings, so the
    result is hash-exact across engines.

    Preconditions (same contract as epoch_shuffle): ``id_col`` unique
    non-null, ``df`` deterministic across re-reads. Output order is
    unspecified — the slot columns carry the order."""
    if not 1 <= int(bucket_hex) <= 8:
        raise ValueError(f"pack_sequences_greedy: bucket_hex must be in [1, 8]")
    if int(capacity) <= 0:
        raise ValueError("pack_sequences_greedy: capacity must be positive")
    reserved = {"__h", "__b", "bucket", "seq_idx", "seq_off"} & (
        set(df.columns) | {id_col}
    )
    if reserved:
        raise ValueError(
            f"pack_sequences_greedy: reserved column name(s) in use {sorted(reserved)}"
        )
    cap = int(capacity)

    keyed = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__t"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    ).withColumn("__b", F.substring("__h", 1, int(bucket_hex)))

    out_schema = (
        f"{id_col} long, bucket string, seq_idx long, seq_off long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__h", id_col], kind="mergesort")
        seqs, offs = [], []
        seq, fill = -1, cap + 1  # sentinel: first doc always opens seq 0
        for t in pdf["__t"].tolist():
            if fill + t <= cap:
                offs.append(fill)
                fill += t
            else:
                seq += 1
                offs.append(0)
                fill = t
            seqs.append(seq)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "bucket": pdf["__b"].values,
                "seq_idx": seqs,
                "seq_off": offs,
            }
        )

    return keyed.groupBy("__b").applyInPandas(_pack, schema=out_schema)
