"""Seeded distributed Lloyd's k-means for the IVF coarse quantizer
(SURVEY §4 "top-k similarity strategy"; replaces the round-1
first-16-vectors stub flagged in VERDICT.md).

Bit-deterministic by construction, which is what makes a trained model
**oracle-checkable** against DuckDB:

- **init** — the k corpus vectors with the smallest
  ``(md5(vec_id), vec_id)`` (the same engine-portable hash draw as
  ``operators/sampling.py``), components snapped to a 1e-6 fixed-point
  grid;
- **assignment** — squared-L2 argmin computed as a left-to-right
  ``zip_with``/``aggregate`` fold whose DuckDB twin
  (``SQL_L2SQ``) folds in the identical order, so distances are
  bit-identical and the (dist, cid) tie-break picks the same centroid
  on both engines;
- **update** — the only order-sensitive reduction (the mean) is done
  in **integer fixed-point**: components are quantized to
  ``floor(x·10⁶ + 0.5)`` BIGINTs, summed exactly (integer addition is
  associative — partition order cannot change the result), and the
  mean is re-snapped to the grid. No floating-point sum ever crosses a
  shuffle boundary.

Scale shape: per iteration one narrow pass over the corpus (centroids
are literal arrays — nothing is broadcast-joined, the corpus never
shuffles for assignment) plus one partial-aggregated shuffle of
(cid, pos) keyed rows — k·dim groups, map-side combined. The driver
only ever holds k·dim numbers; corpus size never reaches it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000.0  # fixed-point grid: 1e-6 resolution

# DuckDB twin of the Spark zip_with/aggregate squared-L2 fold below —
# identical association order makes the doubles bit-identical.
SQL_L2SQ = (
    "list_reduce(list_prepend(0.0, "
    "list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
    "(acc, x) -> acc + x)"
)


def l2sq(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)², left-to-right double fold (twin: ``SQL_L2SQ``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _quantize(col: Column) -> Column:
    """Snap every component to the 1e-6 grid (floor(x·Q + 0.5)/Q)."""
    return F.transform(col, lambda x: F.floor(x * QUANT + 0.5) / QUANT)


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def assign_cid(vcol: Column, cents: dict[int, list[float]]) -> Column:
    """Nearest-centroid id for ``vcol``: argmin (l2sq, cid) over the
    literal centroids — array_min on struct<dist,cid> is the same
    lexicographic pick as SQL's row_number ORDER BY dist, cid."""
    structs = [
        F.struct(
            l2sq(vcol, _lit_vec(cv)).alias("dist"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, cv in sorted(cents.items())
    ]
    return F.array_min(F.array(*structs))["cid"]


def kmeans_fit(
    df: DataFrame, id_col: str, vec_col: str, k: int, iters: int
) -> dict[int, list[float]]:
    """Train k-means on ``df[vec_col]`` (array<double>); returns
    {cid: centroid}. Deterministic across runs, partitionings, and
    engines (see module docstring). Empty clusters are dropped, never
    re-seeded — the DuckDB mirror does the same."""
    df = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")).persist()
    try:
        init = (
            df.orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
            .limit(k)
            .select(_quantize(F.col("__v")).alias("cv"))
            .collect()
        )
        cents = {i: list(r.cv) for i, r in enumerate(init)}
        for _ in range(iters):
            # two-step select: mixing the struct-field extraction in
            # assign_cid with a generator (posexplode) in ONE select
            # trips a Spark analyzer quirk (struct names degrade to
            # col1/col2 → FIELD_NOT_FOUND)
            assigned = df.select(
                assign_cid(F.col("__v"), cents).alias("cid"), "__v"
            ).select("cid", F.posexplode("__v").alias("pos", "val"))
            rows = (
                assigned.groupBy("cid", "pos")
                .agg(
                    F.sum(F.floor(F.col("val") * QUANT + 0.5).cast("long")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "cid",
                    "pos",
                    (
                        F.floor(F.col("s").cast("double") / F.col("n") + 0.5) / QUANT
                    ).alias("comp"),
                )
                .collect()
            )
            new: dict[int, dict[int, float]] = {}
            for r in rows:
                new.setdefault(r.cid, {})[r.pos] = r.comp
            cents = {
                cid: [comps[p] for p in sorted(comps)] for cid, comps in new.items()
            }
        return cents
    finally:
        df.unpersist()


def kmeans_sql_ctes(
    v_cte: str, k: int, iters: int, dim: int, final_name: str = "kfinal"
) -> str:
    """Unrolled DuckDB mirror of ``kmeans_fit``: emits CTE text (to be
    placed inside an existing WITH list) that assumes a CTE
    ``{v_cte}(vec_id, e)`` with e = DOUBLE[] and defines
    ``{final_name}(vec_id, e, cid)`` — the post-training assignment of
    every vector to its trained centroid. 1-indexed lists; fixed-point
    sums as exact BIGINTs, mirroring the Spark fold shapes
    bit-for-bit."""
    q = f"{QUANT:.1f}"
    dist = SQL_L2SQ.format(a=f"{v_cte}.e", b="c.cv")
    parts = [
        f"""kc0 AS (
  SELECT CAST(rn AS INT) - 1 AS cid,
         list_transform(e, x -> floor(x * {q} + 0.5) / {q}) AS cv
  FROM (SELECT vec_id, e,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM {v_cte})
  WHERE rn <= {k}
)"""
    ]
    prev = "kc0"
    for it in range(1, iters + 1):
        parts.append(
            f"""ka{it} AS (
  SELECT vec_id, e, cid FROM (
    SELECT {v_cte}.vec_id, {v_cte}.e, c.cid,
           row_number() OVER (PARTITION BY {v_cte}.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM {v_cte}, {prev} c)
  WHERE rn = 1
)"""
        )
        parts.append(
            f"""kc{it} AS (
  SELECT cid, list(comp ORDER BY pos) AS cv FROM (
    SELECT cid, pos,
           floor(CAST(CAST(sum(CAST(floor(e[pos] * {q} + 0.5) AS BIGINT)) AS BIGINT)
                      AS DOUBLE) / count(*) + 0.5) / {q} AS comp
    FROM ka{it}, generate_series(1, {dim}) AS g(pos)
    GROUP BY cid, pos)
  GROUP BY cid
)"""
        )
        prev = f"kc{it}"
    parts.append(
        f"""{final_name} AS (
  SELECT vec_id, e, cid FROM (
    SELECT {v_cte}.vec_id, {v_cte}.e, c.cid,
           row_number() OVER (PARTITION BY {v_cte}.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM {v_cte}, {prev} c)
  WHERE rn = 1
)"""
    )
    return ",\n".join(parts)
