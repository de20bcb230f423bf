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
        compile_row_fn(lambda r: {v for v in r.xs})  # set comprehension
    with pytest.raises(CompileError):
        compile_row_fn(lambda r: hash(r.x))  # unsupported call
    with pytest.raises(CompileError):
        compile_row_fn(lambda r, extra: r.x)  # arity

    def two_statements(r):
        v = r.x + 1
        return v

    with pytest.raises(CompileError):
        compile_row_fn(two_statements)


def test_wrong_arity_methods_raise_compile_error_not_typeerror(df):
    """Builder lambdas have fixed arities — `s.split()` with no arg and
    `s.strip('x')` hit them wrong. The dual-path contract requires
    CompileError (never a raw TypeError) so as_column's UDF fallback
    triggers; the fallback must then produce the Python semantics."""
    with pytest.raises(CompileError):
        compile_row_fn(lambda r: len(r.s.split()))  # split() needs a sep arg
    with pytest.raises(CompileError):
        compile_row_fn(lambda r: r.s.strip("x"))  # strip(chars) unsupported

    col = as_column(lambda r: r.s.strip("a"), df, return_type="string")
    got = sorted(r["v"] for r in df.select(col.alias("v")).collect())
    assert got == sorted(r["s"].strip("a") for r in ROWS)


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


# ---------------------------------------------------------------------------
# nested per-row loops (oamap's `for mu in ev.muons` idiom)
# ---------------------------------------------------------------------------

NESTED = [
    {"eid": 1, "pts": [1.0, 5.5, 3.0], "qs": [1, -1, 1]},
    {"eid": 2, "pts": [], "qs": []},
    {"eid": 3, "pts": [9.0], "qs": [-1]},
]


@pytest.fixture()
def ndf(spark):
    return fromdata(
        spark,
        [{**r} for r in NESTED],
        schema="eid long, pts array<double>, qs array<long>",
    )


def _ncollect(ndf, col):
    return [r["v"] for r in ndf.orderBy("eid").select(col.alias("v")).collect()]


def test_genexp_any_all(ndf):
    fn = lambda r: any(x > 4 for x in r.pts)  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn)) == [True, False, True]
    fn2 = lambda r: all(x > 0 for x in r.pts)  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn2)) == [True, True, True]  # vacuous


def test_genexp_sum_with_if(ndf):
    fn = lambda r: sum(x * 2 for x in r.pts if x > 2)  # noqa: E731
    got = _ncollect(ndf, compile_row_fn(fn))
    class R:  # python ground truth
        def __init__(self, d): self.__dict__.update(d)
    want = [fn(R(r)) for r in NESTED]
    assert got == want  # 17.0, 0, 18.0


def test_genexp_max(ndf):
    fn = lambda r: max(x for x in r.pts)  # noqa: E731
    got = _ncollect(ndf, compile_row_fn(fn))
    assert got[0] == 5.5 and got[2] == 9.0
    assert got[1] is None  # empty sublist → null (Python raises; masked here)


def test_schema_aware_array_builtins(ndf):
    fn = lambda r: len(r.pts)  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn, schema=ndf.schema)) == [3, 0, 1]
    fn2 = lambda r: sum(r.qs)  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn2, schema=ndf.schema)) == [1.0, 0.0, -1.0]
    fn3 = lambda r: max(r.pts)  # noqa: E731
    got = _ncollect(ndf, compile_row_fn(fn3, schema=ndf.schema))
    assert got[0] == 5.5 and got[1] is None


def test_len_still_string_length_without_array_schema(df):
    _dual(df, lambda r: len(r.s))


def test_genexp_combined_with_scalars(ndf):
    fn = lambda r: r.eid * 100 + sum(1.0 for x in r.pts if x >= 3)  # noqa: E731
    got = _ncollect(ndf, compile_row_fn(fn))
    assert got == [102.0, 200.0, 301.0]


def test_genexp_struct_field_access(spark):
    df = fromdata(
        spark,
        [
            {"eid": 1, "items": [{"q": 50.0, "p": 1.0}, {"q": 10.0, "p": 2.0}]},
            {"eid": 2, "items": [{"q": 5.0, "p": 3.0}]},
        ],
        schema="eid long, items array<struct<q: double, p: double>>",
    )
    fn = lambda r: any(it.q > 45 for it in r.items)  # noqa: E731
    got = [r["v"] for r in df.orderBy("eid").select(compile_row_fn(fn).alias("v")).collect()]
    assert got == [True, False]
    fn2 = lambda r: sum(it.q * it.p for it in r.items)  # noqa: E731
    got2 = [r["v"] for r in df.orderBy("eid").select(compile_row_fn(fn2).alias("v")).collect()]
    assert got2 == [70.0, 15.0]


def test_list_comprehension_maps_sublist(ndf):
    fn = lambda r: [x * 2 for x in r.pts if x > 2]  # noqa: E731
    got = _ncollect(ndf, compile_row_fn(fn))
    assert got == [[11.0, 6.0], [], [18.0]]
    # identity comprehension → the (filtered) array itself
    fn2 = lambda r: [x for x in r.pts if x >= 3]  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn2)) == [[5.5, 3.0], [], [9.0]]
    # len of a comprehension → size
    fn3 = lambda r: len([x for x in r.pts if x > 2])  # noqa: E731
    assert _ncollect(ndf, compile_row_fn(fn3)) == [2, 0, 1]


def test_string_concat_plus(df):
    # Python + on strings is concat — must not become numeric addition
    fn = lambda r: r.s + "!"  # noqa: E731
    got = [r["v"] for r in df.select(compile_row_fn(fn).alias("v")).collect()]
    assert got == [r["s"] + "!" for r in ROWS]
    fn2 = lambda r: r.s + r.s  # noqa: E731  (needs schema to detect)
    got2 = [
        r["v"]
        for r in df.select(compile_row_fn(fn2, schema=df.schema).alias("v")).collect()
    ]
    assert got2 == [r["s"] + r["s"] for r in ROWS]


# ---------------------------------------------------------------------------
# property test: random expression trees agree with Python exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


def _expr_strategy(depth: int):
    leaf = st.sampled_from(["r.x", "r.y", "2", "3.5", "-1"])
    if depth <= 0:
        return leaf
    sub = _expr_strategy(depth - 1)
    binop = st.builds(
        lambda a, op, b: f"({a} {op} {b})",
        sub, st.sampled_from(["+", "-", "*"]), sub,
    )
    cmp_ = st.builds(
        lambda a, op, b: f"({a} {op} {b})",
        sub, st.sampled_from(["<", "<=", ">", ">=", "=="]), sub,
    )
    tern = st.builds(
        lambda c, a, b: f"({a} if {c} else {b})",
        cmp_, sub, sub,
    )
    call = st.builds(
        lambda f, a, b: f"{f}({a}, {b})",
        st.sampled_from(["min", "max"]), sub, sub,
    )
    return st.one_of(leaf, binop, tern, call)


@settings(max_examples=40, deadline=None)
@given(expr=_expr_strategy(3))
def test_random_exprs_match_python(spark, expr):
    """Any expression the generator produces must compile and agree
    with CPython row-by-row — the oamap compiled≡interpreted oracle as
    a property, not an example list."""
    fn = eval(f"lambda r: {expr}")  # noqa: S307 — test-local source
    col = compile_row_fn(f"lambda r: {expr}")  # compile from source text
    df = fromdata(
        spark,
        [{"x": 1, "y": 2.5}, {"x": -7, "y": 0.5}, {"x": 40, "y": -1.25}],
        schema="x long, y double",
    )
    got = [r["v"] for r in df.select(col.alias("v")).collect()]

    class R:
        def __init__(self, d):
            self.__dict__.update(d)

    want = [fn(R(d)) for d in
            ({"x": 1, "y": 2.5}, {"x": -7, "y": 0.5}, {"x": 40, "y": -1.25})]
    assert got == want, f"{expr}: {got} != {want}"


def test_substring_in_operator(df):
    _dual(df, lambda r: "a" in r.s)
    _dual(df, lambda r: "zz" not in r.s)


def test_split_replace_count_methods(df):
    _dual(df, lambda r: r.s.replace("a", "_"))
    _dual(df, lambda r: r.s.count("a"))
    # pure-Python token counting, compiled: len(s.split(" "))
    fn = lambda r: len(r.s.strip().split(" "))  # noqa: E731
    _dual(df, fn)


def test_split_feeds_genexp(spark):
    df = fromdata(
        spark,
        [{"t": "aa bb aa"}, {"t": "zz"}],
        schema="t string",
    )
    fn = lambda r: sum(1.0 for w in r.t.split(" ") if w == "aa")  # noqa: E731
    got = [r["v"] for r in df.select(compile_row_fn(fn).alias("v")).collect()]
    assert got == [2.0, 0.0]


def test_string_subscript_and_slice(spark):
    """s[i] / s[a:b] lower to substring (schema-typed or on a
    string-method result); Python ground truth pins the values."""
    df = fromdata(spark, [{"s": "hello"}, {"s": "ab"}], schema="s string")

    def f_idx0(r):
        return r.s[0]

    def f_idx1(r):
        return r.s[1]

    def f_neg(r):
        return r.s[-1]

    def f_slice(r):
        return r.s[1:4]

    def f_open(r):
        return r.s[2:]

    def f_upper0(r):
        return r.s.upper()[0]

    for fn in (f_idx0, f_idx1, f_neg, f_slice, f_open, f_upper0):
        col = compile_row_fn(fn, schema=df.schema)
        got = [r["v"] for r in df.select(col.alias("v")).collect()]

        class R:
            def __init__(self, d):
                self.__dict__.update(d)

        want = [fn(R({"s": s})) for s in ("hello", "ab")]
        assert got == want, f"{got} != {want}"


def test_fstring_concat(spark):
    """f-strings lower to concat-of-casts; format specs fall back."""
    import pytest as _pt

    from oamap_spark.compiler import CompileError

    df = fromdata(
        spark, [{"s": "x", "n": 7}, {"s": "yz", "n": -2}], schema="s string, n long"
    )
    fn = lambda r: f"{r.s}#{r.n}!"  # noqa: E731
    col = compile_row_fn(fn, schema=df.schema)
    got = [r["v"] for r in df.select(col.alias("v")).collect()]
    assert got == ["x#7!", "yz#-2!"]
    with _pt.raises(CompileError, match="format spec"):
        compile_row_fn(lambda r: f"{r.n:04d}", schema=df.schema)


def test_string_binop_with_fstring_and_method_result(spark):
    """`f-string + method-result` operands must lower to concat, not
    numeric addition (which would NULL every row under ANSI-off)."""
    df = fromdata(spark, [{"s": "ab", "n": 3}], schema="s string, n long")
    fn = lambda r: f"{r.n}:" + r.s.upper()  # noqa: E731
    col = compile_row_fn(fn, schema=df.schema)
    got = [r["v"] for r in df.select(col.alias("v")).collect()]
    assert got == ["3:AB"]


def test_subscript_out_of_range_documented_divergence(spark):
    """Compiled s[i] out of range returns '' (SQL substring semantics)
    where Python raises IndexError — the documented divergence."""
    df = fromdata(spark, [{"s": ""}], schema="s string")

    def fn(r):
        return r.s[0]

    col = compile_row_fn(fn, schema=df.schema)
    assert [r["v"] for r in df.select(col.alias("v")).collect()] == [""]
    import pytest as _pt

    class R:
        s = ""

    with _pt.raises(IndexError):
        fn(R())


def test_fstring_null_and_bool_rendering(spark):
    """NULL formatted values render as 'None' (matching Python);
    boolean rendering is the documented SQL-cast divergence
    (true/false, not True/False)."""
    df = fromdata(
        spark,
        [{"s": None, "b": True}, {"s": "x", "b": False}],
        schema="s string, b boolean",
    )
    fn = lambda r: f"<{r.s}|{r.b}>"  # noqa: E731
    col = compile_row_fn(fn, schema=df.schema)
    got = sorted(r["v"] for r in df.select(col.alias("v")).collect())
    assert got == ["<None|true>", "<x|false>"]
