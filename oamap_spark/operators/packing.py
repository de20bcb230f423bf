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

(Named ``greedy_pack_slots`` — the registered query
``pack_sequences_greedy`` in queries/llm_curation.py is a different,
older surface: per-LANGUAGE sequence/padding counts via a native
fold. This operator emits the per-DOCUMENT slot table a loader
consumes; the declared query over it is ``pack_sequences_slots``.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack_slots(
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
    string), ``seq_idx`` (0-based within bucket), ``seq_off`` (token
    offset of this doc inside its sequence) — all integers/strings, so
    the result is hash-exact across engines.

    Preconditions — ENFORCED, unlike a bare docstring claim (the r7
    epoch_shuffle lesson): ``id_col`` unique and non-null,
    ``tokens_col`` non-null. All three violations land in one bucket's
    pandas batch (equal/null ids share a hash prefix; a null token
    count rides its row), so the per-bucket body checks them and fails
    the task loudly — a null token count would otherwise turn into NaN
    and silently degrade the rest of the bucket to one-doc-per-sequence.
    ``df`` must additionally be deterministic across re-reads (no
    upstream ``sample()``/``rand()``). Output order is unspecified —
    the slot columns carry the order."""
    if not 1 <= int(bucket_hex) <= 8:
        raise ValueError(
            f"greedy_pack_slots: bucket_hex must be in [1, 8], got {bucket_hex}"
        )
    if int(capacity) <= 0:
        raise ValueError(
            f"greedy_pack_slots: capacity must be positive, got {capacity}"
        )
    reserved = {"__h", "__b", "bucket", "seq_idx", "seq_off"} & (
        set(df.columns) | {id_col}
    )
    if reserved:
        raise ValueError(
            f"greedy_pack_slots: reserved column name(s) in use {sorted(reserved)}"
        )
    cap = int(capacity)

    keyed = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__t"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    ).withColumn(
        # null ids hash to a null prefix: they form their own bucket and
        # fail the body's null check rather than vanishing
        "__b",
        F.coalesce(F.substring("__h", 1, int(bucket_hex)), F.lit("")),
    )

    out_schema = f"{id_col} long, bucket string, seq_idx long, seq_off long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[id_col].isna().any():
            raise ValueError(f"greedy_pack_slots: null {id_col}")
        if pdf["__t"].isna().any():
            bad = pdf.loc[pdf["__t"].isna(), id_col].iloc[0]
            raise ValueError(f"greedy_pack_slots: null {tokens_col} (id {bad})")
        if pdf[id_col].duplicated().any():
            bad = pdf.loc[pdf[id_col].duplicated(), id_col].iloc[0]
            raise ValueError(f"greedy_pack_slots: duplicate {id_col} {bad}")
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
