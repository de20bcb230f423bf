"""Local replica of the driver's DuckDB-oracle correctness check.

The driver compares, per declared query at sf0.01: row count, schema,
and an order-insensitive value hash with columns sorted by name. We
replicate that as strictly as possible so a green local run predicts a
green CORRECTNESS_r{N}.json: rows are compared after sorting columns by
name and rows by their stringified values, requiring exact equality
(floats included — queries are responsible for rounding determinism).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
from pyspark.sql import SparkSession


def _norm_cell(v):
    """Normalize a cell to a comparison token shared by both engines."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # 12 significant digits: catches real mismatches, forgives the
        # representation-identical cases only.
        return f"f:{v:.12g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "s:" + str(v)


def _rows_to_tokens(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    toks = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    toks.sort()
    return toks


def run_oracle(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        # The driver materializes DuckDB results through pandas, where
        # HUGEINT (e.g. sum(BIGINT)) degrades to float64 and hash-
        # mismatches Spark's int64 even when values are identical
        # (CORRECTNESS_r01 q9/q11). fetchall() returns Python ints and
        # hides that, so flag HUGEINT columns as hard errors here.
        desc = con.execute("DESCRIBE " + sql).fetchall()
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if huge:
            raise AssertionError(
                "oracle emits HUGEINT column(s) "
                f"{huge} — the driver's pandas path degrades these to "
                "float64 and false-fails the hash; wrap in CAST(... AS "
                "BIGINT)"
            )
        # The driver canonicalizes through pandas sort_values, which
        # throws "unhashable type: numpy.ndarray" on top-level LIST /
        # STRUCT / MAP columns (CORRECTNESS_r03 embedding_label_
        # centroids red row). Oracle-gated queries must emit scalar
        # columns only — explode nested output to rows instead.
        # match "[" not "[]": fixed-size ARRAY types DESCRIBE as e.g.
        # DOUBLE[3]; no scalar DuckDB type name contains "["
        nested = [
            (c, t)
            for c, t, *_ in desc
            if "[" in t or t.upper().startswith(("STRUCT", "MAP", "LIST", "UNION"))
        ]
        if nested:
            raise AssertionError(
                "oracle emits nested column(s) "
                f"{nested} — the driver's pandas sort_values crashes on "
                "unhashable array/struct cells; emit exploded scalar "
                "rows (e.g. (key, pos, value)) or to_json on both sides"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    finally:
        con.close()


def compare_query(
    spark: SparkSession, sf_dir: str, fn, sql: str, max_diff: int = 5
) -> list[str]:
    """Run Spark fn and DuckDB sql; return a list of mismatch messages
    (empty == pass)."""
    errs: list[str] = []
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_oracle(sf_dir, sql)

    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")

    st = _rows_to_tokens(s_cols, s_rows)
    dt = _rows_to_tokens(d_cols, d_rows)
    if st != dt:
        sset, dset = set(st), set(dt)
        only_s = list(sset - dset)[:max_diff]
        only_d = list(dset - sset)[:max_diff]
        errs.append(f"values: {len(only_s)}+ spark-only vs {len(only_d)}+ duckdb-only")
        for r in only_s:
            errs.append(f"  spark-only:  {r}")
        for r in only_d:
            errs.append(f"  duckdb-only: {r}")
    return errs
