"""Row-function compiler — oamap's compiled-function surface, Spark-first.

oamap's core trick is letting users write a plain Python function over
proxies and compiling it (Numba when available, interpreted otherwise)
with **identical semantics either way** (SURVEY §2.B / §3 entry 3 —
``oamap/compiler.py`` [H]). The Spark image of that design point:

- :func:`compile_row_fn` translates the *Python AST* of a row function
  (``lambda r: r.x * 2 + r.y``) into a native Column expression —
  whole-stage-codegen'd JVM execution, the fast path;
- :func:`row_fn_udf` runs the very same function row-wise inside an
  Arrow-batched pandas UDF — the slow-but-always-works path;
- :func:`as_column` tries the compiler and transparently falls back,
  exactly how oamap falls back from Numba to interpretation.

The dual-path contract (same results, different speed) is pinned by
``tests/test_compiler.py``. Supported surface: field access (``r.x``,
``r["x"]``, nested ``r.a.b``), arithmetic (`+ - * / // % **`),
comparisons (incl. chained), ``and/or/not``, conditional expressions,
``in`` against literal collections, ``abs/min/max/round/len``, the
``math`` module's common functions, string methods
(``upper/lower/strip/startswith/endswith``), string indexing/slicing
(``s[0]``, ``s[-1]``, ``s[a:b]`` with constant non-negative bounds),
f-strings (no format specs), ``None`` checks (``r.x is None``), and
closure constants. Anything else raises :class:`CompileError` — and
the UDF path picks it up.

Documented semantic divergences between the two paths (inherent to
lowering Python onto SQL semantics; each is pinned by a test):

- ``%`` and ``//`` follow Python sign semantics in both paths (the
  compiler emits the sign-correcting form), but ``%`` on floats can
  differ in the last ulp.
- ``round`` lowers to Spark's HALF_UP rounding; Python 3 uses
  banker's rounding, so exact .5 boundaries diverge
  (``round(2.5)`` → 2 interpreted, 3 compiled). Real-world float
  data virtually never sits on an exact decimal .5; if yours does,
  use the UDF path explicitly.
- ``len`` without a ``schema`` lowers to ``F.length`` (strings).
  On an ARRAY field the schema is what tells the compiler to emit
  ``F.size`` instead — schema-less ``len`` over an array fails at
  DataFrame analysis time, not compile time, so pass ``schema=``
  (or go through ``as_column(fn, df)``, which always does).
- ``s[i]`` out of range returns ``''`` compiled (SQL substring
  semantics) where Python raises IndexError — success vs crash, the
  price of total SQL functions.
- f-string value rendering follows SQL casts, not Python ``str()``:
  NULL renders as ``"None"`` (coalesced to match Python), but
  booleans render ``true``/``false`` (Python: ``True``/``False``)
  and exotic floats use SQL scientific notation (``1.0E20`` vs
  Python's ``1e+20``). Format specs and ``!r`` refuse to compile and
  take the UDF path, which is exactly Python.
"""

from __future__ import annotations

import ast
import inspect
import math
import textwrap
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["CompileError", "compile_row_fn", "row_fn_udf", "as_column"]


class CompileError(Exception):
    """The row function uses a construct the Column translator does not
    support; callers fall back to :func:`row_fn_udf`."""


# functions callable by bare name inside a row fn → Column builders
def _fn_min(*xs: Column) -> Column:
    return F.least(*xs)


def _fn_max(*xs: Column) -> Column:
    return F.greatest(*xs)


_BUILTINS: dict[str, Callable[..., Column]] = {
    "abs": lambda x: F.abs(x),
    "min": _fn_min,
    "max": _fn_max,
    "round": lambda x, n=None: F.round(x, 0 if n is None else n),
    "len": lambda x: F.length(x),
    "int": lambda x: x.cast("long"),
    "float": lambda x: x.cast("double"),
    "str": lambda x: x.cast("string"),
}

_MATH: dict[str, Callable[..., Column]] = {
    "sqrt": F.sqrt,
    "log": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "exp": F.exp,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "floor": F.floor,
    "ceil": F.ceil,
    "atan2": F.atan2,
    "pow": F.pow,
    "fabs": F.abs,
}

def _py_split(s: Column, sep: Column) -> Column:
    # Python str.split takes a LITERAL separator; F.split takes a regex
    # — quote the separator so regex metacharacters stay literal
    return F.split(s, F.concat(F.lit("\\Q"), sep, F.lit("\\E")))


_STR_METHODS: dict[str, Callable[..., Column]] = {
    "upper": lambda s: F.upper(s),
    "lower": lambda s: F.lower(s),
    "strip": lambda s: F.trim(s),
    "lstrip": lambda s: F.ltrim(s),
    "rstrip": lambda s: F.rtrim(s),
    "startswith": lambda s, p: F.startswith(s, p),
    "endswith": lambda s, p: F.endswith(s, p),
    "replace": lambda s, a, b: F.replace(s, a, b),
    "split": _py_split,
    "count": lambda s, sub: (
        (F.length(s) - F.length(F.replace(s, sub))) / F.length(sub)
    ).cast("long"),
}


def _source_tree(fn: Callable) -> ast.AST:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError) as exc:  # built in a REPL without source
        raise CompileError(f"no source available for {fn!r}") from exc
    src = textwrap.dedent(src)
    try:
        mod = ast.parse(src)
    except SyntaxError:
        # a lambda embedded in a larger expression (e.g. a call argument)
        # may not parse standalone; find it by re-parsing loosely
        raise CompileError("could not parse function source")
    # locate the first lambda or function def
    for node in ast.walk(mod):
        if isinstance(node, ast.Lambda):
            return node
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            return node
    raise CompileError("no function definition found in source")


def _return_expr(tree: ast.AST) -> tuple[str, ast.expr]:
    """(row-parameter name, the single returned expression)."""
    if isinstance(tree, ast.Lambda):
        if len(tree.args.args) != 1:
            raise CompileError("row function must take exactly one argument")
        return tree.args.args[0].arg, tree.body
    if not isinstance(tree, ast.FunctionDef):
        raise CompileError("async functions are not supported")
    if len(tree.args.args) != 1:
        raise CompileError("row function must take exactly one argument")
    body = [n for n in tree.body if not isinstance(n, ast.Expr)]  # skip docstring
    if len(body) != 1 or not isinstance(body[0], ast.Return) or body[0].value is None:
        raise CompileError("row function body must be a single return <expr>")
    return tree.args.args[0].arg, body[0].value


class _Translator(ast.NodeVisitor):
    def __init__(self, row_arg: str, closure: dict[str, Any], schema=None):
        self.row = row_arg
        self.closure = closure
        self.schema = schema  # optional StructType for type-aware lowering
        self.locals: dict[str, Column] = {}  # comprehension variables

    # -- leaves -------------------------------------------------------

    def visit_Constant(self, node: ast.Constant):
        if node.value is None or isinstance(node.value, (bool, int, float, str)):
            return node.value  # kept raw; lifted to Column lazily
        raise CompileError(f"unsupported constant {node.value!r}")

    def visit_Name(self, node: ast.Name):
        if node.id in self.locals:
            return self.locals[node.id]
        if node.id == self.row:
            raise CompileError("bare row argument used as a value")
        if node.id in self.closure:
            return self.closure[node.id]
        raise CompileError(f"unknown name {node.id!r}")

    def _field_type(self, node: ast.expr):
        """Spark DataType of a row-field path, when a schema was given."""
        if self.schema is None:
            return None
        path = self._field_path(node)
        if path is None:
            return None
        dt = self.schema
        for part in path.split("."):
            try:
                dt = dt[part].dataType
            except (KeyError, TypeError):
                return None
        return dt

    def _field_path(self, node: ast.expr) -> str | None:
        """r.a.b / r['a']['b'] → 'a.b'; None if not rooted at the row."""
        parts: list[str] = []
        cur = node
        while True:
            if isinstance(cur, ast.Attribute):
                parts.append(cur.attr)
                cur = cur.value
            elif isinstance(cur, ast.Subscript) and isinstance(
                cur.slice, ast.Constant
            ) and isinstance(cur.slice.value, str):
                parts.append(cur.slice.value)
                cur = cur.value
            elif isinstance(cur, ast.Name):
                return ".".join(reversed(parts)) if cur.id == self.row else None
            else:
                return None

    def _local_field(self, node: ast.expr) -> Column | None:
        """x.a.b where x is a comprehension variable → struct getField
        chain on the bound lambda Column."""
        parts: list[str] = []
        cur = node
        while True:
            if isinstance(cur, ast.Attribute):
                parts.append(cur.attr)
                cur = cur.value
            elif isinstance(cur, ast.Subscript) and isinstance(
                cur.slice, ast.Constant
            ) and isinstance(cur.slice.value, str):
                parts.append(cur.slice.value)
                cur = cur.value
            elif isinstance(cur, ast.Name) and cur.id in self.locals:
                col = self.locals[cur.id]
                for p in reversed(parts):
                    col = col.getField(p)
                return col
            else:
                return None

    def visit_Attribute(self, node: ast.Attribute):
        path = self._field_path(node)
        if path is not None:
            return F.col(path)
        local = self._local_field(node)
        if local is not None:
            return local
        # math.<fn> handled at Call sites; math.pi / math.e as values
        if isinstance(node.value, ast.Name) and node.value.id == "math":
            if node.attr in ("pi", "e", "tau", "inf"):
                return getattr(math, node.attr)
        raise CompileError(f"unsupported attribute {ast.dump(node)}")

    def visit_Subscript(self, node: ast.Subscript):
        path = self._field_path(node)
        if path is not None:
            return F.col(path)
        local = self._local_field(node)
        if local is not None:
            return local
        # string indexing / slicing on an expression of string type:
        # s[i] → one char (Python IndexError on out-of-range becomes
        # empty string — documented divergence, same family as the
        # substring clamp below); s[a:b] → substring. Only constant
        # non-negative bounds (plus s[-1]) lower; anything fancier
        # falls back to the UDF path via CompileError.
        base = self.visit(node.value)
        # stringiness: schema type when available, else syntactic (the
        # base is a string-returning method call or f-string) — never
        # guess for bare fields without a schema, so array subscripts
        # keep falling back to the UDF path instead of mis-lowering.
        if isinstance(base, Column) and (
            isinstance(self._field_type(node.value), T.StringType)
            or self._syntactically_str(node.value)
        ):
            sl = node.slice
            # literal -1 parses as UnaryOp(USub, Constant(1))
            if (
                isinstance(sl, ast.UnaryOp)
                and isinstance(sl.op, ast.USub)
                and isinstance(sl.operand, ast.Constant)
                and sl.operand.value == 1
            ):
                return F.substring(base, -1, 1)
            if isinstance(sl, ast.Constant) and isinstance(sl.value, int):
                i = sl.value
                if i >= 0:
                    return F.substring(base, i + 1, 1)
                raise CompileError("only s[-1] negative string index supported")
            if isinstance(sl, ast.Slice) and sl.step is None:
                lo = 0 if sl.lower is None else getattr(sl.lower, "value", None)
                hi = getattr(sl.upper, "value", None) if sl.upper is not None else None
                if isinstance(lo, int) and lo >= 0:
                    if sl.upper is None:
                        return F.substring(base, lo + 1, 2**31 - 1 - lo)
                    if isinstance(hi, int) and hi >= lo:
                        return F.substring(base, lo + 1, hi - lo)
                raise CompileError(
                    "only constant non-negative string slices supported"
                )
        raise CompileError("only string-key subscripts of the row are supported")

    def visit_JoinedStr(self, node: ast.JoinedStr):
        # f-strings → concat of string pieces; formatted values cast to
        # string (no format specs / conversions — those fall back).
        # NULL fields render as "None" (coalesce) to match Python str();
        # SQL-vs-Python rendering of bools/exotic floats remains a
        # documented divergence (see module docstring).
        parts: list[Column] = []
        for piece in node.values:
            if isinstance(piece, ast.Constant):
                parts.append(F.lit(str(piece.value)))
            elif isinstance(piece, ast.FormattedValue):
                if piece.format_spec is not None or piece.conversion not in (-1, 115):
                    raise CompileError(
                        "f-string format specs / !r conversions unsupported"
                    )
                v = self._col(self.visit(piece.value)).cast("string")
                parts.append(F.coalesce(v, F.lit("None")))
            else:
                raise CompileError("unsupported f-string piece")
        return F.concat(*parts) if parts else F.lit("")

    # -- operators ----------------------------------------------------

    def _col(self, v):
        return v if isinstance(v, Column) else F.lit(v)

    #: method calls whose RESULT is a string — shared by the stringiness
    #: checks in _is_stringy (string `+` → concat) and visit_Subscript
    _STRING_RESULT_METHODS = (
        "upper", "lower", "strip", "lstrip", "rstrip", "replace",
    )

    def _syntactically_str(self, node: ast.expr) -> bool:
        """Stringiness visible from the AST alone: f-strings, string
        subscripts/slices of stringy bases, and string-returning method
        calls — needed so `f"..." + r.s.upper()` lowers to concat, not
        numeric addition, even without a schema."""
        if isinstance(node, ast.JoinedStr):
            return True
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in self._STRING_RESULT_METHODS
        ):
            return True
        if isinstance(node, ast.Subscript):
            return self._syntactically_str(node.value) or isinstance(
                self._field_type(node.value), T.StringType
            )
        return False

    def _is_stringy(self, node: ast.expr, value) -> bool:
        if isinstance(value, str):
            return True
        if isinstance(node, ast.Constant):
            return isinstance(node.value, str)
        if self._syntactically_str(node):
            return True
        return isinstance(self._field_type(node), T.StringType)

    def visit_BinOp(self, node: ast.BinOp):
        lv, rv = self.visit(node.left), self.visit(node.right)
        if not isinstance(lv, Column) and not isinstance(rv, Column):
            # constant subtree → fold in Python (same arithmetic)
            import operator as _op

            folds = {
                ast.Add: _op.add, ast.Sub: _op.sub, ast.Mult: _op.mul,
                ast.Div: _op.truediv, ast.FloorDiv: _op.floordiv,
                ast.Mod: _op.mod, ast.Pow: _op.pow,
            }
            fold = folds.get(type(node.op))
            if fold is None:
                raise CompileError(f"unsupported operator {type(node.op).__name__}")
            try:
                return fold(lv, rv)
            except Exception as exc:
                raise CompileError(f"constant fold failed: {exc}") from exc
        left, right = self._col(lv), self._col(rv)
        op = type(node.op)
        if op is ast.Add:
            # Python string + is concatenation; Spark's numeric `+` on
            # strings silently yields nulls — detect via constants or
            # the (optional) schema and emit concat instead
            if self._is_stringy(node.left, lv) or self._is_stringy(node.right, rv):
                return F.concat(left, right)
            return left + right
        if op is ast.Sub:
            return left - right
        if op is ast.Mult:
            return left * right
        if op is ast.Div:
            return left / right
        if op is ast.FloorDiv:
            return F.floor(left / right).cast("long")
        if op is ast.Mod:
            # Python's % is floored (−7 % 5 == 3); Spark's is truncated
            # (−2). pmod matches Python for positive divisors (the
            # negative-divisor corner stays unsupported-by-omission).
            return F.pmod(left, right)
        if op is ast.Pow:
            return F.pow(left, right)
        if op is ast.BitAnd:
            return left.bitwiseAND(right)
        if op is ast.BitOr:
            return left.bitwiseOR(right)
        if op is ast.BitXor:
            return left.bitwiseXOR(right)
        raise CompileError(f"unsupported operator {op.__name__}")

    def visit_UnaryOp(self, node: ast.UnaryOp):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -self._col(v) if isinstance(v, Column) else -v
        if isinstance(node.op, ast.Not):
            return ~self._col(v)
        raise CompileError(f"unsupported unary {type(node.op).__name__}")

    def visit_BoolOp(self, node: ast.BoolOp):
        vals = [self._col(self.visit(v)) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return out

    def visit_Compare(self, node: ast.Compare):
        left = self.visit(node.left)
        out = None
        for op, comp in zip(node.ops, node.comparators):
            right = self.visit(comp)
            piece = self._compare_one(left, type(op), right, comp)
            out = piece if out is None else out & piece
            left = right
        return out

    def _compare_one(self, left, op, right, right_node):
        if op in (ast.In, ast.NotIn):
            if isinstance(right, Column):
                # Python `"sub" in s` is a SUBSTRING test when the
                # container is a string column
                col = F.contains(right, self._col(left))
            elif isinstance(right, (list, tuple, set, frozenset)):
                col = self._col(left).isin(*list(right))
            else:
                raise CompileError("`in` requires a collection or string column")
            return ~col if op is ast.NotIn else col
        if op in (ast.Is, ast.IsNot):
            if right is not None:
                raise CompileError("`is` only supported against None")
            col = self._col(left).isNull()
            return ~col if op is ast.IsNot else col
        lc, rc = self._col(left), right if isinstance(right, Column) else F.lit(right)
        if op is ast.Lt:
            return lc < rc
        if op is ast.LtE:
            return lc <= rc
        if op is ast.Gt:
            return lc > rc
        if op is ast.GtE:
            return lc >= rc
        if op is ast.Eq:
            return lc == rc
        if op is ast.NotEq:
            return lc != rc
        raise CompileError(f"unsupported comparison {op.__name__}")

    def visit_IfExp(self, node: ast.IfExp):
        cond = self._col(self.visit(node.test))
        t, f = self.visit(node.body), self.visit(node.orelse)
        return F.when(cond, self._col(t)).otherwise(self._col(f))

    def _lower_genexp(self, fname: str, gen: ast.GeneratorExp) -> Column:
        """oamap's per-row sublist loop (``for mu in ev.muons`` inside a
        user fcn [H]) → Spark higher-order array functions: any→exists,
        all→forall, sum→aggregate, max/min→array_max/min over transform.
        ``if`` clauses become an array filter stage."""
        if len(gen.generators) != 1:
            raise CompileError("only a single `for` clause is supported")
        comp = gen.generators[0]
        if comp.is_async or not isinstance(comp.target, ast.Name):
            raise CompileError("unsupported comprehension target")
        arr = self.visit(comp.iter)
        if not isinstance(arr, Column):
            raise CompileError("comprehension must iterate a row array field")
        var = comp.target.id

        def with_var(c: Column, body: ast.expr) -> Column:
            saved, had = self.locals.get(var), var in self.locals
            self.locals[var] = c
            try:
                return self._col(self.visit(body))
            finally:
                if had:
                    self.locals[var] = saved
                else:
                    self.locals.pop(var, None)

        # NB: bind via closure, not a defaulted second parameter —
        # pyspark introspects lambda arity and would pass the element
        # INDEX into a 2-arg callback
        def filter_fn(cond: ast.expr):
            return lambda c: with_var(c, cond)

        for cond in comp.ifs:
            arr = F.filter(arr, filter_fn(cond))
        elt = gen.elt
        if fname == "any":
            return F.exists(arr, lambda c: with_var(c, elt))
        if fname == "all":
            return F.forall(arr, lambda c: with_var(c, elt))
        mapped = F.transform(arr, lambda c: with_var(c, elt))
        if fname == "sum":
            # DOUBLE accumulator: element types aren't known statically;
            # Python int sums compare equal to the resulting doubles
            return F.aggregate(
                mapped,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            )
        if fname == "max":
            return F.array_max(mapped)
        if fname == "min":
            return F.array_min(mapped)
        raise CompileError(f"unsupported generator consumer {fname!r}")

    def visit_Call(self, node: ast.Call):
        if node.keywords:
            raise CompileError("keyword arguments not supported")
        # any/all/sum/max/min over a generator expression — the nested
        # per-row loop surface; must intercept before eager arg visits
        if (
            isinstance(node.func, ast.Name)
            and len(node.args) == 1
            and isinstance(node.args[0], ast.GeneratorExp)
            and node.func.id in ("any", "all", "sum", "max", "min")
        ):
            return self._lower_genexp(node.func.id, node.args[0])
        # schema-aware single-arg builtins on ARRAY fields (a list
        # comprehension argument is an array by construction)
        if (
            isinstance(node.func, ast.Name)
            and len(node.args) == 1
            and node.func.id in ("len", "sum", "max", "min")
        ):
            dt = self._field_type(node.args[0])
            if isinstance(node.args[0], ast.ListComp) or (
                isinstance(node.args[0], ast.Call)
                and isinstance(node.args[0].func, ast.Attribute)
                and node.args[0].func.attr == "split"
            ):
                dt = T.ArrayType(T.DoubleType())  # marker: array-typed expr
            if isinstance(dt, T.ArrayType):
                col = self.visit(node.args[0])
                if node.func.id == "len":
                    return F.size(col)
                if node.func.id == "max":
                    return F.array_max(col)
                if node.func.id == "min":
                    return F.array_min(col)
                return F.aggregate(
                    col, F.lit(0.0), lambda acc, x: acc + x.cast("double")
                )
        args = [self.visit(a) for a in node.args]
        # math.<fn>(...)
        if (
            isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "math"
        ):
            fn = _MATH.get(node.func.attr)
            if fn is None:
                raise CompileError(f"unsupported math.{node.func.attr}")
            return fn(*[self._col(a) for a in args])
        # <string-expr>.method(...) — receiver may itself be a compiled
        # expression (r.s.lower().startswith("a") chains)
        if isinstance(node.func, ast.Attribute):
            meth = _STR_METHODS.get(node.func.attr)
            if meth is not None:
                recv = self.visit(node.func.value)
                if isinstance(recv, Column):
                    return meth(recv, *[self._col(a) for a in args])
            raise CompileError(f"unsupported method {node.func.attr!r}")
        if isinstance(node.func, ast.Name):
            fn = _BUILTINS.get(node.func.id)
            if fn is not None:
                return fn(*[self._col(a) for a in args])
        raise CompileError(f"unsupported call {ast.dump(node.func)}")

    def visit_ListComp(self, node: ast.ListComp) -> Column:
        """``[expr for x in r.xs if cond]`` → filter + transform: the
        sublist *map* (stays an array column, oamap's nested define)."""
        if len(node.generators) != 1:
            raise CompileError("only a single `for` clause is supported")
        comp = node.generators[0]
        if comp.is_async or not isinstance(comp.target, ast.Name):
            raise CompileError("unsupported comprehension target")
        arr = self.visit(comp.iter)
        if not isinstance(arr, Column):
            raise CompileError("comprehension must iterate a row array field")
        var = comp.target.id

        def with_var(c: Column, body: ast.expr) -> Column:
            saved, had = self.locals.get(var), var in self.locals
            self.locals[var] = c
            try:
                return self._col(self.visit(body))
            finally:
                if had:
                    self.locals[var] = saved
                else:
                    self.locals.pop(var, None)

        def bind(b: ast.expr):
            return lambda c: with_var(c, b)

        for cond in comp.ifs:
            arr = F.filter(arr, bind(cond))
        # identity map ([x for x in xs if ...]) needs no transform
        if isinstance(node.elt, ast.Name) and node.elt.id == var:
            return arr
        return F.transform(arr, bind(node.elt))

    def visit_Tuple(self, node: ast.Tuple):
        return tuple(self.visit(e) for e in node.elts)

    def visit_List(self, node: ast.List):
        return [self.visit(e) for e in node.elts]

    def generic_visit(self, node):
        raise CompileError(f"unsupported syntax: {type(node).__name__}")


def _closure_env(fn: Callable) -> dict[str, Any]:
    env: dict[str, Any] = {}
    if fn.__closure__ and fn.__code__.co_freevars:
        for name, cell in zip(fn.__code__.co_freevars, fn.__closure__):
            try:
                env[name] = cell.cell_contents
            except ValueError:
                pass
    # globals referenced by the function (constants only — modules and
    # callables other than `math` stay unsupported)
    for name in fn.__code__.co_names:
        if name in fn.__globals__ and name not in env and name != "math":
            v = fn.__globals__[name]
            if isinstance(v, (bool, int, float, str, list, tuple, set, frozenset)):
                env[name] = v
    return env


def compile_row_fn(fn: Callable[[Any], Any] | str, schema=None) -> Column:
    """Translate a plain Python row function into a native Column
    expression (the Catalyst/codegen fast path). ``schema`` (the
    DataFrame's StructType) enables type-aware lowering — ``len``/
    ``max``/``min``/``sum`` over array fields become ``size``/
    ``array_max``/``array_min``/``aggregate``. Raises
    :class:`CompileError` when the function falls outside the supported
    surface — use :func:`as_column` to fall back automatically.

    ``fn`` may also be SOURCE TEXT (``"lambda r: r.x * 2"``) — needed
    when the callable was built without retrievable source (eval/REPL);
    closures obviously don't apply there."""
    if isinstance(fn, str):
        try:
            mod = ast.parse(textwrap.dedent(fn))
        except SyntaxError as exc:
            raise CompileError(f"could not parse source: {exc}") from exc
        tree = next(
            (
                n
                for n in ast.walk(mod)
                if isinstance(n, (ast.Lambda, ast.FunctionDef))
            ),
            None,
        )
        if tree is None:
            raise CompileError("no function definition found in source")
        env: dict[str, Any] = {}
    else:
        tree = _source_tree(fn)
        env = _closure_env(fn)
    row_arg, expr = _return_expr(tree)
    try:
        out = _Translator(row_arg, env, schema=schema).visit(expr)
    except CompileError:
        raise
    except (TypeError, ValueError, AttributeError) as exc:
        # builder lambdas have fixed arities (`s.split()` with no arg,
        # `s.strip('x')` hit a _STR_METHODS lambda wrong) — any such
        # failure means "outside the compilable surface", and the
        # dual-path contract requires CompileError so as_column's UDF
        # fallback triggers instead of leaking a raw TypeError
        raise CompileError(f"translation failed: {exc}") from exc
    if not isinstance(out, Column):
        # a row-independent function is legal Python — lift scalar
        # results to a literal Column (oamap compiles constant fcns too)
        if out is None or isinstance(out, (bool, int, float, str)):
            return F.lit(out)
        raise CompileError("function does not produce a column or scalar")
    return out


def row_fn_udf(fn: Callable[[Any], Any], return_type: str) -> Column:
    """The same row function through an Arrow-batched pandas UDF — row
    namedtuple semantics preserved; ~10-100× slower than the compiled
    path but unrestricted (oamap's interpreted fallback)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf, struct

    def make(cols):
        def run(batch):
            rows = batch.itertuples(index=False)
            return pd.Series([fn(r) for r in rows])

        # set hints programmatically: the module's `from __future__
        # import annotations` would stringify inline ones, which
        # pyspark's typehint parser rejects
        run.__annotations__ = {"batch": pd.DataFrame, "return": pd.Series}
        return pandas_udf(return_type)(run)(struct(*cols))

    return make


def as_column(fn: Callable[[Any], Any], df=None, return_type: str = "double"):
    """oamap's dual path in one call: compiled Column when the function
    is translatable, pandas-UDF fallback otherwise (``df`` supplies the
    row columns the fallback struct packs; required only on fallback)."""
    try:
        return compile_row_fn(fn, schema=None if df is None else df.schema)
    except CompileError:
        if df is None:
            raise
        return row_fn_udf(fn, return_type)(df.columns)
