"""Per-query source fingerprints + verdict history → the driver window.

VERDICT r4 "What's wrong #1": the hand-pinned ``_PRIORITY`` window
missed an in-round implementation swap (``simhash32`` → Arrow UDF),
leaving three queries with driver verdicts for code that no longer
runs. The window is now computed, not pinned:

- every declared query gets a deterministic **source fingerprint**:
  sha256 over the query function's source, the sources of every
  ``oamap_spark`` function/class it references (transitively, through
  nested lambdas and module-alias attribute access), the repr of every
  module-level constant it reads, and the oracle SQL string;
- a committed sidecar (``verdicts.json``, next to this file) records
  for each query the round of its **last driver verdict** and the
  fingerprint its source carried at that time;
- :func:`compute_priority` orders the window: queries whose current
  fingerprint differs from the recorded one (or that have no record)
  first, in registration order, then everything else by oldest
  verdict round, registration order breaking ties.

Maintenance loop (``tools/update_verdicts.py``): at the START of each
round — before touching any query code — fold the previous round's
``CORRECTNESS_r0N.json`` into the sidecar, so the recorded fingerprint
is the fingerprint of the code the driver actually ran.

The traversal is static (``co_names`` of the compiled code objects),
so helpers reached only through dynamic dispatch are not hashed — a
fingerprint change is therefore *sufficient* but not *necessary*
evidence of a behavior change; the oldest-verdict-first tail sweeps up
anything the static closure misses within a few rounds.
"""

from __future__ import annotations

import ast
import functools
import hashlib
import importlib
import inspect
import json
import textwrap
import types
from pathlib import Path

VERDICTS_PATH = Path(__file__).with_name("verdicts.json")

_SCALARS = (int, float, str, bool, bytes, type(None))


def _code_names(code: types.CodeType) -> list[str]:
    """co_names of a code object plus every nested code const (lambdas,
    comprehensions, local defs), in deterministic bytecode order."""
    out = list(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            out.extend(_code_names(const))
    return out


def _is_ours(obj) -> bool:
    return getattr(obj, "__module__", "").startswith("oamap_spark")


def _const_repr(obj) -> str | None:
    """repr of a constant, but only if it is a scalar or a container of
    scalars all the way down — anything holding objects (functions,
    specs, …) reprs with memory addresses and would make the
    fingerprint nondeterministic."""
    if isinstance(obj, _SCALARS):
        return repr(obj)
    if isinstance(obj, (tuple, list, set, frozenset)):
        seq = sorted(obj, key=repr) if isinstance(obj, (set, frozenset)) else obj
        items = [_const_repr(x) for x in seq]
        if any(i is None for i in items):
            return None
        return "[" + ", ".join(items) + "]"
    if isinstance(obj, dict):
        items = [
            (_const_repr(k), _const_repr(v)) for k, v in obj.items()
        ]
        if any(k is None or v is None for k, v in items):
            return None
        return "{" + ", ".join(f"{k}: {v}" for k, v in items) + "}"
    return None


def _strip_decorators(src: str) -> str:
    """Source of a def with any decorator lines removed. Applied ONLY
    to the root query function (whose sole decorator is ``@register``):
    registration metadata — bench flag, tags — must not flip the
    semantic fingerprint (r6 review: four bench=True one-liners spent
    four changed-first window slots on zero behavior change). The
    oracle is hashed separately, so stripping the decorator never hides
    an oracle edit. Helpers reached by the closure walk keep their
    decorators — a ``@pandas_udf`` return-type change IS semantic.

    Dedent happens UNCONDITIONALLY (ADVICE r6 #3): returning dedented
    source on the stripped branch but raw source otherwise would hash
    the same body differently depending on which branch ran. No-op for
    today's root fns (module-level defs have no indent), so no
    fingerprints move — pinned by test_fingerprints.py."""
    dedented = textwrap.dedent(src)
    try:
        node = ast.parse(dedented).body[0]
    except (SyntaxError, IndexError):
        return dedented
    if not getattr(node, "decorator_list", None):
        return dedented
    lines = dedented.splitlines(keepends=True)
    return "".join(lines[node.lineno - 1 :])


def _append_source(
    key: tuple[str, str], obj, parts: list[str], *, strip_decorators: bool = False
) -> None:
    try:
        src = inspect.getsource(obj)
    except (OSError, TypeError):
        src = "<no source>"
    if strip_decorators:
        src = _strip_decorators(src)
    parts.append(f"## {key[0]}.{key[1]}\n{src}")


@functools.lru_cache(maxsize=None)
def _local_import_targets(fn) -> tuple:
    """Objects brought in by ``import``/``from … import`` statements
    INSIDE the function body (query bodies conventionally import their
    operators locally) — invisible to the globals-based walk, so they
    are resolved by parsing the source."""
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return ()
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(
            "oamap_spark"
        ):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                if hasattr(mod, alias.name):
                    out.append(getattr(mod, alias.name))
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("oamap_spark"):
                    try:
                        out.append(importlib.import_module(alias.name))
                    except ImportError:
                        pass
    return tuple(out)


def _visit_fn(fn, seen: set, parts: list[str], *, root: bool = False) -> None:
    code = getattr(fn, "__code__", None)
    if code is None:
        return
    key = (getattr(fn, "__module__", "") or "", getattr(fn, "__qualname__", "") or "")
    if key in seen:
        return
    seen.add(key)
    # root = the registered query fn: its @register decorator carries
    # presentation metadata (bench, tags) that must not be semantic
    _append_source(key, fn, parts, strip_decorators=root)
    g = dict(getattr(fn, "__globals__", {}))
    names = _code_names(code)
    for i, obj in enumerate(_local_import_targets(fn)):
        g[f"__local_import_{i}"] = obj
        names.append(f"__local_import_{i}")
    for name in names:
        if name not in g:
            continue
        obj = g[name]
        if isinstance(obj, types.FunctionType) and _is_ours(obj):
            _visit_fn(obj, seen, parts)
        elif isinstance(obj, type) and _is_ours(obj):
            ckey = (obj.__module__, obj.__qualname__)
            if ckey not in seen:
                seen.add(ckey)
                _append_source(ckey, obj, parts)
        elif isinstance(obj, types.ModuleType) and obj.__name__.startswith(
            "oamap_spark"
        ):
            # attribute access through a module alias (`X.simhash32`):
            # LOAD_ATTR names land in the same co_names list, so any
            # other referenced name resolving inside the module is part
            # of the closure
            for attr in names:
                if attr == name or not hasattr(obj, attr):
                    continue
                sub = getattr(obj, attr)
                if isinstance(sub, types.FunctionType) and _is_ours(sub):
                    _visit_fn(sub, seen, parts)
                elif isinstance(sub, type) and _is_ours(sub):
                    ckey = (sub.__module__, sub.__qualname__)
                    if ckey not in seen:
                        seen.add(ckey)
                        _append_source(ckey, sub, parts)
                else:
                    rep = _const_repr(sub)
                    mkey = (obj.__name__, attr)
                    if rep is not None and mkey not in seen:
                        seen.add(mkey)
                        parts.append(f"## const {obj.__name__}.{attr} = {rep}")
        else:
            rep = _const_repr(obj)
            gkey = (key[0], f"const:{name}")
            if rep is not None and gkey not in seen:
                seen.add(gkey)
                parts.append(f"## const {key[0]}.{name} = {rep}")


def _session_conf_salt() -> str:
    """Every query runs under ``session.configure_session`` (the
    registry ``_wrap`` applies it at call time), so the session conf
    dict is part of every query's effective semantics — ANSI mode, the
    session timezone, and nested-pruning flags all change results or
    plans without touching any query source. Salting the fingerprint
    with the conf (VERDICT r5 "Next round #7") makes a conf change
    invalidate ALL recorded verdicts by design: every query re-enters
    the changed-first window until the driver re-scores it under the
    new conf."""
    from oamap_spark.session import _RUNTIME_CONF

    return json.dumps(dict(sorted(_RUNTIME_CONF.items())))


def query_fingerprint(spec) -> str:
    """Deterministic fingerprint of a QuerySpec's source closure,
    salted with the session conf every query runs under."""
    parts: list[str] = []
    seen: set = set()
    _visit_fn(spec.raw_fn or spec.fn, seen, parts, root=True)
    parts.append("## oracle\n" + (spec.oracle if spec.oracle is not None else "<rows-only>"))
    parts.append("## session_conf\n" + _session_conf_salt())
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


_ALL_FP_CACHE: dict[str, str] | None = None
_ALL_FP_CACHE_SALT: str | None = None


def all_fingerprints() -> dict[str, str]:
    """Memoized per process — one full computation walks ~185 source
    closures (~1 s). The registry is append-only, so the cache extends
    itself if names registered after the first call appear (a partial
    import followed by the full __spark_entry__ import must not pin a
    partial map for the process lifetime). The cache is KEYED on the
    session-conf salt (r6 review): a mid-process ``_RUNTIME_CONF``
    mutation must invalidate the memo, or the exact event the salt
    exists to detect would be served stale from cache."""
    global _ALL_FP_CACHE, _ALL_FP_CACHE_SALT
    from oamap_spark.queries import registry

    salt = _session_conf_salt()
    if _ALL_FP_CACHE is None or _ALL_FP_CACHE_SALT != salt:
        _ALL_FP_CACHE = {}
        _ALL_FP_CACHE_SALT = salt
    for n in registry.registration_order():
        if n not in _ALL_FP_CACHE:
            _ALL_FP_CACHE[n] = query_fingerprint(registry._REGISTRY[n])
    return dict(_ALL_FP_CACHE)


def load_verdicts() -> dict[str, dict]:
    if not VERDICTS_PATH.exists():
        return {}
    return json.loads(VERDICTS_PATH.read_text())


def save_verdicts(verdicts: dict[str, dict]) -> None:
    VERDICTS_PATH.write_text(
        json.dumps(dict(sorted(verdicts.items())), indent=1) + "\n"
    )


def compute_priority() -> list[str]:
    """Driver-window order: changed/never-verified first (registration
    order), then verified-unchanged oldest-verdict-first."""
    from oamap_spark.queries import registry

    names = registry.registration_order()
    pos = {n: i for i, n in enumerate(names)}
    verdicts = load_verdicts()
    fps = all_fingerprints()
    changed = [
        n
        for n in names
        if verdicts.get(n, {}).get("fingerprint") != fps[n]
        or verdicts.get(n, {}).get("round") in (None, 0)
    ]
    changed_set = set(changed)
    rest = sorted(
        (n for n in names if n not in changed_set),
        key=lambda n: (verdicts[n]["round"], pos[n]),
    )
    return changed + rest
