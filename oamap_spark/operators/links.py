"""Pointer and Union — oamap's two non-relational schema nodes,
re-expressed Spark-first.

**Pointer** (oamap/schema.py — Pointer; positions array dereference in
oamap/generator.py — PointerGenerator [H]): an indirection into another
(possibly the same) structure. Spark has no address-valued columns, so
a pointer is a surrogate key + equi-join — the positions array becomes
the join key column, dereference becomes `resolve_pointer`. Broadcast
the target when it is dimension-sized; self-referential pointers
(linked lists, prev-element links) join the table to itself on a
row_number surrogate, which at scale co-partitions by the partition
key (no extra shuffle beyond the window's own).

**Union** (oamap/schema.py — Union; tags+offsets arrays [H]): a tagged
sum type. Spark structs are product types, so the encoding is
`struct(tag: int, v0: T0 nullable, …, vn: Tn nullable)` with exactly
one non-null variant per row; `union_case` dispatches on the tag the
way oamap's UnionProxy selects a possibility by tags[i].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Pointer
# ---------------------------------------------------------------------------

def resolve_pointer(
    df: DataFrame,
    ptr_col: str,
    target: DataFrame,
    target_key: str,
    fields: Sequence[str],
    *,
    prefix: str = "",
    broadcast: bool = False,
    how: str = "left",
) -> DataFrame:
    """Dereference: for each row, fetch ``fields`` from the ``target``
    row whose ``target_key`` equals ``ptr_col``. Null pointer → null
    fields (oamap's masked pointer). ``broadcast=True`` for
    dimension-sized targets — at 100 TB the fact side never shuffles."""
    proj = target.select(
        F.col(target_key).alias("__ptr_key"),
        *[F.col(f).alias(prefix + f) for f in fields],
    )
    if broadcast:
        proj = F.broadcast(proj)
    out = df.join(proj, on=df[ptr_col] == proj["__ptr_key"], how=how)
    return out.drop("__ptr_key")


def with_position(
    df: DataFrame, pos_col: str, partition_by: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Attach oamap's implicit element position (0-based within its
    parent list) as an explicit surrogate column — the bridge that
    turns position-based Pointers into joinable keys."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


def self_pointer_prev(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    fields: Sequence[str],
    *,
    prefix: str = "prev_",
) -> DataFrame:
    """Self-referential Pointer: each element points at its
    predecessor within the partition (oamap linked-list shape). Built
    from positions + a co-partitioned self-join; the first element's
    pointer is null (masked)."""
    pos = with_position(df, "__pos", partition_by, order_by)
    left = pos.alias("l")
    target = pos.select(
        *[F.col(c) for c in partition_by],
        F.col("__pos").alias("__tpos"),
        *[F.col(f).alias(prefix + f) for f in fields],
    ).alias("r")
    on = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in partition_by]
    on.append(F.col("l.__pos") - 1 == F.col("r.__tpos"))
    joined = left.join(target, on=_conj(on), how="left")
    keep = [F.col(f"l.{c}") for c in df.columns] + [
        F.col(f"r.{prefix + f}") for f in fields
    ]
    return joined.select(*keep)


def iterate_pointer(
    df: DataFrame,
    id_col: str,
    ptr_col: str,
    n: int,
    *,
    out_col: str = "ancestor_id",
) -> DataFrame:
    """Follow a self-referential Pointer ``n`` steps (SURVEY §1.3 /
    §7.5: recursive named schemas — linked lists, trees — materialize
    as a surrogate-key table; traversal is an ITERATIVE JOIN, never
    driver-side recursion).

    Pointer doubling: round k joins the current jump table to itself,
    so after ⌈log₂ n⌉ rounds each row knows its 2ᵏ-step ancestor —
    O(log n) shuffles instead of n chained joins. A walk that steps
    off the root (null pointer) yields null, oamap's masked-pointer
    convention. Returns ``df`` with ``out_col`` = the id reached after
    exactly ``n`` dereferences."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    cur = df.select(F.col(id_col).alias("__id"), F.col(id_col).alias("__anc"))
    # jump = 2^k-step table, built by doubling; binary decomposition of
    # n composes the needed jumps (exactly like fast exponentiation)
    jump = df.select(F.col(id_col).alias("__jid"), F.col(ptr_col).alias("__janc"))
    bit = n
    while bit > 0:
        if bit & 1:
            cur = (
                cur.join(jump, cur["__anc"] == jump["__jid"], "left")
                .select("__id", F.col("__janc").alias("__anc"))
            )
        bit >>= 1
        if bit > 0:
            jump = (
                jump.alias("a")
                .join(
                    jump.select(
                        F.col("__jid").alias("__bid"), F.col("__janc").alias("__banc")
                    ),
                    F.col("a.__janc") == F.col("__bid"),
                    "left",
                )
                .select(F.col("a.__jid").alias("__jid"), F.col("__banc").alias("__janc"))
            )
    out = df.join(
        cur.select(F.col("__id"), F.col("__anc").alias(out_col)),
        df[id_col] == cur["__id"],
        "left",
    )
    return out.drop("__id")


def pointer_depth_root(
    df: DataFrame,
    id_col: str,
    ptr_col: str,
    *,
    max_iter: int = 40,
) -> DataFrame:
    """Resolve every node of a pointer forest to its ROOT (null-parent
    node) and its DEPTH (dereference count to reach it) — the full
    recursive-schema traversal, as O(log diameter) doubling rounds.

    Each round replaces a node's known ancestor with that ancestor's
    own known ancestor and accumulates the step counts, so reach
    doubles per round. Exact fixpoint: stops when no row changes;
    raises at ``max_iter`` (2⁴⁰ depth) rather than silently
    mislabeling. The localCheckpoint per round truncates the plan
    lineage the same way the connected-components loop does
    (operators/clustering.py) — without it the doubled-join tree grows
    exponentially."""
    state = df.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(ptr_col), F.col(id_col)).alias("anc"),
        F.when(F.col(ptr_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    ).localCheckpoint()
    for _ in range(max_iter):
        # carry the pre-step ancestor through the checkpoint so
        # convergence is a filter-count over the checkpointed
        # partitions instead of an exceptAll(state) — the old check
        # cost two more wide shuffles + a sort per round (r11, guide
        # §2.4; same move as the connected-components loop). A row is
        # converged iff its ancestor did not move: anc(anc) == anc
        # only at roots (roots self-point via the coalesce above, and
        # a pointer FOREST has no cycles), and an unmoved ancestor
        # implies an unmoved depth (the root's own depth term is 0).
        nxt = (
            state.alias("s")
            .join(
                state.select(
                    F.col("node").alias("t_node"),
                    F.col("anc").alias("t_anc"),
                    F.col("depth").alias("t_depth"),
                ),
                F.col("s.anc") == F.col("t_node"),
            )
            .select(
                F.col("s.node").alias("node"),
                F.col("s.anc").alias("prev"),
                F.col("t_anc").alias("anc"),
                (F.col("s.depth") + F.col("t_depth")).alias("depth"),
            )
            # lazy: the convergence count below materializes the
            # checkpoint — one job per round, not two
            .localCheckpoint(eager=False)
        )
        changed = nxt.where(F.col("anc") != F.col("prev")).count()
        state = nxt.select("node", "anc", "depth")
        if changed == 0:
            return state.select("node", F.col("anc").alias("root_id"), "depth")
    raise RuntimeError(f"pointer_depth_root did not converge in {max_iter} rounds")


def _conj(conds: Sequence[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# Union
# ---------------------------------------------------------------------------

def union_encode(tag: Column, variants: Sequence[tuple[str, Column]]) -> Column:
    """Encode a tagged union: struct(tag, v0..vn) where variant i is
    non-null iff tag == i. ``variants`` = [(name, value_expr), ...];
    value_expr is only evaluated into its slot when the tag selects it."""
    slots = [
        F.when(tag == i, v).alias(name) for i, (name, v) in enumerate(variants)
    ]
    return F.struct(tag.cast("int").alias("tag"), *slots)


def union_case(u: Column, *branches: Column) -> Column:
    """Dispatch on a union's tag: branches[i] handles variant i
    (each branch is an expression over the already-projected variant
    slot). oamap's UnionProxy tags[i] lookup, as a when-chain."""
    expr = F.when(u.getField("tag") == 0, branches[0])
    for i, b in enumerate(branches[1:], start=1):
        expr = expr.when(u.getField("tag") == i, b)
    return expr
