"""Property-based tests for the round-4 operator family (hypothesis):
random inputs, Python/exact ground truth — the same oracle discipline
as the declared queries, but over adversarially-generated shapes the
fixed testdata can't produce (deep random forests, degenerate token
streams, pathological bit patterns)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@settings(**_SETTINGS)
@given(
    items=st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=300
    ),
    # capacity=64 ⇒ completeness bound 1/65 ≈ 1.54%; stay strictly
    # above it (the in-plan guard correctly rejects anything lower)
    frac_pct=st.integers(min_value=2, max_value=40),
)
def test_heavy_hitters_matches_exact_groupby(spark, items, frac_pct):
    """MG candidate pruning + exact verify ≡ GROUP BY + HAVING for any
    corpus and any threshold above the completeness bound."""
    from oamap_spark.operators.heavyhitters import heavy_hitters

    frac = frac_pct / 100.0
    df = spark.createDataFrame([(i,) for i in items], ["item"])
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", frac, capacity=64).collect()
    }
    thresh = math.ceil(frac * len(items))
    from collections import Counter

    want = {
        (k, v) for k, v in Counter(items).items() if v >= thresh
    }
    assert got == want


def test_heavy_hitters_exact_on_skewed_multipartition_corpus(spark):
    """Batched-MG stress (round-5 vectorized form): a 60k-item Zipf-ish
    corpus over 2000 distinct terms, spread over 7 partitions so each
    partition triggers many prune events at capacity=32 (bound 1/33 ≈
    3%), with NULLs mixed in — output must equal the exact
    GROUP BY+HAVING over non-NULL items, and NULL must never surface."""
    import math as _math
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from oamap_spark.operators.heavyhitters import heavy_hitters

    rng = random.Random(5)
    items = []
    for _ in range(60_000):
        if rng.random() < 0.02:
            items.append(None)
        elif rng.random() < 0.5:
            items.append(f"hot{rng.randint(0, 4)}")  # ~10% each
        else:
            items.append(f"cold{rng.randint(0, 1999)}")
    df = spark.createDataFrame(
        [(i,) for i in items], ["item"]
    ).repartition(7)  # round-robin: retry-safe, spreads duplicates
    frac = 0.04
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", frac, capacity=32).collect()
    }
    nn = [i for i in items if i is not None]
    thresh = _math.ceil(frac * len(nn))
    want = {(k, v) for k, v in Counter(nn).items() if v >= thresh}
    assert got == want and got
    assert all(k is not None for k, _ in got)


@settings(**_SETTINGS)
@given(
    parents=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=60)
)
def test_pointer_depth_root_matches_python_walk(spark, parents):
    """Pointer doubling on a RANDOM forest ≡ a plain Python parent walk.
    Node i's parent is parents[i] clamped to j < i (so the forest is
    acyclic by construction; parent == own index ⇒ root)."""
    from oamap_spark.operators.links import pointer_depth_root

    edges = []
    for i, p in enumerate(parents):
        pp = min(p, i)  # ancestors only
        edges.append((i, None if pp == i else pp))
    df = spark.createDataFrame(edges, "id long, parent long")
    got = {
        r["node"]: (r["root_id"], r["depth"])
        for r in pointer_depth_root(df, "id", "parent").collect()
    }

    def walk(i: int) -> tuple[int, int]:
        d = 0
        while edges[i][1] is not None:
            i = edges[i][1]
            d += 1
        return i, d

    want = {i: walk(i) for i in range(len(edges))}
    assert got == want


@settings(**_SETTINGS)
@given(
    idlists=st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_simhash_arrow_matches_python_majority(spark, idlists):
    """Arrow popcount simhash ≡ a plain-Python majority vote for any
    int32 id lists (incl. empty lists and adversarial bit patterns)."""
    from oamap_spark.functions import text as X

    df = spark.createDataFrame(
        [(ids,) for ids in idlists], "ids array<long>"
    )
    got = [
        r["h"]
        for r in df.select(X.simhash32(F.col("ids")).alias("h")).collect()
    ]

    def py_simhash(ids: list[int]) -> int:
        n = len(ids)
        total = 0
        for b in range(32):
            n_set = sum(1 for x in ids if x & (1 << b))
            if 2 * n_set > n:
                total += 1 << b
        return total

    assert got == [py_simhash(ids) for ids in idlists]


@settings(**_SETTINGS)
@given(
    strings=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=3,
            max_size=20,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_compiler_string_subscript_matches_python(spark, strings):
    """Compiled s[i]/s[a:b]/f-string lowering ≡ Python for random
    printable strings (all in-range accesses, len ≥ 3)."""
    from oamap_spark.compiler import compile_row_fn
    from oamap_spark.sources.fill import fromdata

    df = fromdata(spark, [{"s": s} for s in strings], schema="s string")

    def fn(r):
        return f"<{r.s[0]}|{r.s[1:3]}|{r.s[-1]}>"

    col = compile_row_fn(fn, schema=df.schema)
    got = sorted(r["v"] for r in df.select(col.alias("v")).collect())

    class R:
        def __init__(self, s):
            self.s = s

    want = sorted(fn(R(s)) for s in strings)
    assert got == want


def _span_removal_reference(docs: dict[int, str], n: int = 8):
    """Pure-Python ground truth of duplicated-span removal: positional
    n-token windows (token identity, not hashed — collisions in the
    2^31 modular id space are negligible but the reference avoids even
    those), shared across docs, merged with the gap>n rule, cut, and
    rejoined."""
    toks = {i: t.split(" ") for i, t in docs.items()}
    wins = {
        i: [tuple(tk[p : p + n]) for p in range(len(tk) - n + 1)]
        for i, tk in toks.items()
    }
    owner: dict[tuple, set[int]] = {}
    for i, ws in wins.items():
        for w in ws:
            owner.setdefault(w, set()).add(i)
    out = {}
    for i, tk in toks.items():
        dup_pos = [p for p, w in enumerate(wins[i]) if len(owner[w]) > 1]
        spans = 0
        prev = None
        covered = set()
        for p in dup_pos:
            if prev is None or p > prev + n:
                spans += 1
            prev = p
            covered.update(range(p, p + n))
        kept = " ".join(t for j, t in enumerate(tk) if j not in covered)
        out[i] = (len(tk), spans, len(kept))
    return out


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=40),
        min_size=2,
        max_size=12,
    )
)
def test_span_removal_matches_python_reference(spark, data):
    """duplicated_span_removal ≡ a direct Python reference on random
    tiny-vocab corpora — adversarial shapes (heavy window sharing,
    short docs, fully-duplicated docs) the fixed testdata can't
    produce. Token-identity windows and hashed window ids agree
    because 2^31-space collisions are vanishing at this size."""
    from oamap_spark.operators.dedup import duplicated_span_removal

    docs = {i: " ".join(tk) for i, tk in enumerate(data)}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {
        r["id"]: (r["n_tokens"], r["n_spans_cut"], r["kept_char_len"])
        for r in duplicated_span_removal(df, "doc_id", "text", n=8).collect()
    }
    assert got == _span_removal_reference(docs, n=8)


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=30),
        min_size=3,
        max_size=10,
    )
)
def test_span_removal_probe_restriction_commutes(spark, data):
    """The incremental twin's soundness claim: restricting the surgery
    to probe_ids equals running the full batch and filtering — for ANY
    corpus and any probe subset (the shared-window set is never
    restricted, so membership of a window in >1 doc is identical)."""
    from oamap_spark.operators.dedup import duplicated_span_removal

    docs = [(i, " ".join(tk)) for i, tk in enumerate(data)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    probe = spark.createDataFrame(
        [(i,) for i, _ in docs if i % 2 == 0], ["doc_id"]
    )
    full = {
        r["id"]: tuple(r)
        for r in duplicated_span_removal(df, "doc_id", "text", n=8).collect()
        if r["id"] % 2 == 0
    }
    restricted = {
        r["id"]: tuple(r)
        for r in duplicated_span_removal(
            df, "doc_id", "text", n=8, probe_ids=probe
        ).collect()
    }
    assert restricted == full


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=30),
        min_size=3,
        max_size=10,
    )
)
def test_span_removal_steady_seam_commutes(spark, data):
    """The STEADY-STATE form's soundness claim: df restricted to
    arrivals + an injected window table (corpus index ∪ arrival
    windows, built by the operator's own positional_window_table)
    equals the full batch run filtered to arrivals — for ANY corpus
    and split. This is exactly what dedup_span_removal_steady's oracle
    replays, minus the parquet round-trip."""
    from oamap_spark.operators.dedup import (
        duplicated_span_removal,
        positional_window_table,
    )

    docs = [(i, " ".join(tk)) for i, tk in enumerate(data)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    arr = df.where("doc_id % 2 = 0")
    w_df = positional_window_table(
        df.where("doc_id % 2 = 1"), "doc_id", "text", 8
    ).unionByName(positional_window_table(arr, "doc_id", "text", 8))
    full = {
        r["id"]: tuple(r)
        for r in duplicated_span_removal(df, "doc_id", "text", n=8).collect()
        if r["id"] % 2 == 0
    }
    steady = {
        r["id"]: tuple(r)
        for r in duplicated_span_removal(
            arr,
            "doc_id",
            "text",
            n=8,
            probe_ids=arr.select("doc_id"),
            w_df=w_df,
        ).collect()
    }
    assert steady == full


@settings(**_SETTINGS)
@given(
    # small vocab + short docs ⇒ dense overlap structure: many ties,
    # sets of size 1, identical docs — exactly the shapes that stress
    # the prefix-length ceiling and the df tie-break ordering
    texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=12,
    ),
    thr=st.sampled_from([0.3, 0.5, 0.75, 0.9, 1.0]),
)
def test_all_pairs_jaccard_prefix_filter_complete(spark, texts, thr):
    """all_pairs_jaccard's prefix-filtered candidate generation must be
    COMPLETE — bit-identical to the brute-force n²/2 join — for every
    corpus shape and threshold, including J = 1.0 (identical docs,
    prefix length exactly 1) and single-shingle sets."""
    from oamap_spark.functions.text import shingles
    from oamap_spark.operators.dedup import all_pairs_jaccard, jaccard_set

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in all_pairs_jaccard(df, "doc_id", "text", thr).collect()
    }
    t = df.select(F.col("doc_id").alias("id"), shingles("text", 3).alias("s"))
    a, b = t.alias("a"), t.alias("b")
    brute = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard_set(F.col("a.s"), F.col("b.s")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= thr)
        .collect()
    }
    assert got == brute


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=24),
        min_size=2,
        max_size=10,
    ),
    split=st.integers(1, 9),
)
def test_ngram_steady_decomposition_matches_bruteforce(spark, docs, split):
    """dedup_ngram_overlap_steady's decomposition — dup(arrival wid) =
    (wid in corpus index) OR (wid shared by >=2 arrival docs) — against
    brute-force positional window counting in plain Python, over random
    corpora with tiny alphabets (forcing repeated windows within and
    across docs) and random corpus/arrival splits. n=4 windows instead
    of the query's 8 so short random docs still produce windows."""
    from oamap_spark.operators.dedup import positional_window_table

    n = 4
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    k = min(split, len(rows) - 1)
    corpus_rows, arrival_rows = rows[:k], rows[k:]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    arrivals = spark.createDataFrame(arrival_rows, ["doc_id", "text"])

    idx = positional_window_table(corpus, "doc_id", "text", n)
    aw = positional_window_table(arrivals, "doc_id", "text", n)
    in_corpus = (
        idx.join(aw.select("wid").distinct(), "wid", "left_semi")
        .select("wid")
        .distinct()
    )
    arr_shared = (
        aw.groupBy("wid")
        .agg(F.count_distinct("id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("wid")
    )
    dup_wids = in_corpus.unionByName(arr_shared).distinct()
    got_dup = {
        r["id"]: r["c"]
        for r in aw.join(dup_wids, "wid").groupBy("id").agg(
            F.count(F.lit(1)).alias("c")).collect()
    }
    got_win = {
        r["id"]: r["c"]
        for r in aw.groupBy("id").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    def wins(toks):
        return [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    owners = {}
    for did, text in rows:
        for w in set(wins(text.split(" "))):
            owners.setdefault(w, set()).add(did)
    for did, text in arrival_rows:
        ws = wins(text.split(" "))
        assert got_win.get(did, 0) == len(ws)
        assert got_dup.get(did, 0) == sum(
            1 for w in ws if len(owners[w]) > 1
        )
