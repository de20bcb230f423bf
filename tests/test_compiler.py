"""Row-function compiler (oamap/compiler.py's Spark image): the AST →
Column translation must agree exactly with running the same Python
function row-by-row — oamap's compiled-vs-interpreted guarantee."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oamap_spark.compiler import CompileError, as_column, compile_row_fn, row_fn_udf
from oamap_spark.sources.fill import fromdata

ROWS = [
    {"x": 1, "y": 2.5, "s": "Alpha", "flag": True, "n": None},
    {"x": -7, "y": 0.5, "s": "beta", "flag": False, "n": 3},
    {"x": 40, "y": -1.25, "s": " Gamma ", "flag": True, "n": 9},
    {"x": 0, "y": 9.0, "s": "delta", "flag": False, "n": None},
]


@pytest.fixture()
def df(spark):
    return fromdata(
        spark,
        [{**r} for r in ROWS],
        schema="x long, y double, s string, flag boolean, n long",
    )


def _dual(df, fn, rt="double"):
    """Run fn through the compiler AND through plain Python; compare."""
    col = compile_row_fn(fn)
    got = [r["v"] for r in df.select(col.alias("v")).collect()]

    class R:
        def __init__(self, d):
            self.__dict__.update(d)

        def __getitem__(self, k):
            return self.__dict__[k]

    want = [fn(R(r)) for r in ROWS]
    assert got == want, f"{got} != {want}"


# ---------------------------------------------------------------------------
# translation coverage, each against the Python ground truth
# ---------------------------------------------------------------------------

def test_arithmetic(df):
    _dual(df, lambda r: r.x * 2 + r.y - 1)
    _dual(df, lambda r: r.x % 5)
    _dual(df, lambda r: r.y / 2)


def test_power_and_math(df):
    _dual(df, lambda r: r.x ** 2)
    _dual(df, lambda r: math.sqrt(abs(r.x)) + math.log(abs(r.y) + 1))
    _dual(df, lambda r: math.floor(r.y) + math.ceil(r.y))


def test_comparisons_and_bool(df):
    _dual(df, lambda r: (r.x > 0) and (r.y < 5))
    _dual(df, lambda r: (r.x > 10) or not r.flag)
    _dual(df, lambda r: 0 <= r.x <= 40)  # chained


def test_conditional_expr(df):
    _dual(df, lambda r: r.y if r.x > 0 else -r.y)
    _dual(df, lambda r: "big" if r.x >= 40 else ("neg" if r.x < 0 else "small"))


def test_in_and_none_checks(df):
    _dual(df, lambda r: r.x in (1, 40))
    _dual(df, lambda r: r.n is None)
    _dual(df, lambda r: r.n is not None)


def test_min_max_round_len(df):
    _dual(df, lambda r: min(r.x, 10))
    _dual(df, lambda r: max(r.x, 0))
    _dual(df, lambda r: round(r.y + 0.011, 1))
    _dual(df, lambda r: len(r.s))


def test_string_methods(df):
    _dual(df, lambda r: r.s.upper())
    _dual(df, lambda r: r.s.strip())
    _dual(df, lambda r: r.s.lower().startswith("a"))


def test_closure_and_global_constants(df):
    threshold = 5
    _dual(df, lambda r: r.x > threshold)
    scale = 2.5
    _dual(df, lambda r: r.x * scale)


def test_def_function_with_docstring(df):
    def score(r):
        """weighted score"""
        return r.x * 0.5 + r.y * 2

    _dual(df, score)


def test_subscript_access(df):
    _dual(df, lambda r: r["x"] + 1)


def test_nested_field_access(spark):
    df = fromdata(
        spark,
        [{"a": {"b": 3, "c": 1.5}}, {"a": {"b": 7, "c": 0.5}}],
        schema="a struct<b: long, c: double>",
    )
    col = compile_row_fn(lambda r: r.a.b * 2)
    assert [r["v"] for r in df.select(col.alias("v")).collect()] == [6, 14]


# ---------------------------------------------------------------------------
# rejection + fallback (the dual path)
# ---------------------------------------------------------------------------

def test_unsupported_constructs_raise():
    with pytest.raises(CompileError):
        compile_row_fn(lambda r: [v for v in r.xs])  # comprehension
    with pytest.raises(CompileError):
        compile_row_fn(lambda r: hash(r.x))  # unsupported call
    with pytest.raises(CompileError):
        compile_row_fn(lambda r, extra: r.x)  # arity

    def two_statements(r):
        v = r.x + 1
        return v

    with pytest.raises(CompileError):
        compile_row_fn(two_statements)


def test_as_column_falls_back_to_udf(df):
    # string reversal isn't in the supported surface → pandas-UDF path
    fn = lambda r: r.s[::-1]  # noqa: E731
    with pytest.raises(CompileError):
        compile_row_fn(fn)
    col = as_column(fn, df, return_type="string")
    got = sorted(r["v"] for r in df.select(col.alias("v")).collect())
    assert got == sorted(r["s"][::-1] for r in ROWS)


def test_udf_path_matches_compiled_path(df):
    fn = lambda r: r.x * 2 + 1  # noqa: E731
    compiled = [
        r["v"] for r in df.select(compile_row_fn(fn).alias("v")).collect()
    ]
    udf_col = row_fn_udf(fn, "long")(df.columns)
    via_udf = [r["v"] for r in df.select(udf_col.alias("v")).collect()]
    assert compiled == via_udf


# ---------------------------------------------------------------------------
# integration with the structural combinators
# ---------------------------------------------------------------------------

def test_compiled_fn_in_filter_and_define(df):
    from oamap_spark.operators.structural import define, filter_

    out = filter_(df, compile_row_fn(lambda r: r.x > 0 and r.flag))
    assert sorted(r["x"] for r in out.collect()) == [1, 40]
    out2 = define(df, "z", compile_row_fn(lambda r: r.x + len(r.s)))
    assert sorted(r["z"] for r in out2.collect()) == [-3, 5, 6, 47]
