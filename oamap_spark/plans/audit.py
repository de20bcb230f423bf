"""Physical-plan audit helpers.

The 100 TB story is only credible if the plans actually show it:
filters pushed to the parquet scan, unused columns pruned out of
ReadSchema, small dims broadcast instead of shuffled, expressions
inside WholeStageCodegen. These helpers read `.explain("formatted")`
output so tests can assert plan shape, not just result values —
mirroring oamap's design guarantee that only touched arrays are ever
fetched (oamap/generator.py lazy fetch [H]).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan in the plan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_string(df))


def scanned_columns(df: DataFrame) -> set[str]:
    """Union of top-level column names across all file scans."""
    cols: set[str] = set()
    for s in read_schemas(df):
        body = s[len("struct<"):]
        depth = 0
        name = []
        expecting = True
        for ch in body:
            if expecting and (ch.isalnum() or ch == "_"):
                name.append(ch)
            elif expecting and ch == ":":
                cols.add("".join(name))
                name = []
                expecting = False
            elif ch in "<([":
                depth += 1
            elif ch in ">)]":
                depth -= 1
            elif ch == "," and depth == 0:
                expecting = True
    return cols


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for pushdown."""
    out: list[str] = []
    for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(f.strip() for f in m.split(",") if f.strip())
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan_string(df), re.M))


def shuffle_count(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded). Counts
    formatted-mode node headers `(n) Exchange` so the tree rendering
    isn't double-counted."""
    return len(re.findall(r"^\(\d+\) Exchange", plan_string(df), re.M))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages. Formatted mode tags member
    nodes with `[codegen id : N]`; simple mode renders
    `WholeStageCodegen (N)` — accept either."""
    p = plan_string(df)
    ids = set(re.findall(r"\[codegen id : (\d+)\]", p))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", p))
    return len(ids)
