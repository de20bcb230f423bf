"""Driver-window rotation: per-query source fingerprints + verdict
sidecar (VERDICT r4 "Next round #1" — compute the window, don't
hand-pin it)."""

from __future__ import annotations

import importlib
import sys
import textwrap

import __spark_entry__  # noqa: F401 — populate the registry

from oamap_spark.queries import fingerprints as fp
from oamap_spark.queries import registry


def test_every_declared_query_fingerprint_is_tracked():
    """Every declared query must have a sidecar entry — a new query
    ships with a round-0 stub (tools/update_verdicts.py --add-missing)
    so it is machine-visibly 'never verified', not silently absent."""
    verdicts = fp.load_verdicts()
    declared = set(registry.registration_order())
    missing = declared - set(verdicts)
    orphans = set(verdicts) - declared
    if missing or orphans:
        # Documented background-run race (r8 ask #8 / r9 "What's wrong
        # #2"), BOTH directions: a long pytest run collects the
        # registry BEFORE a later commit lands a new query + its
        # --add-missing stub (phantom orphan), or before a commit
        # removes a query + prunes its sidecar entry (phantom
        # missing) — then reads the sidecar fresh from disk here.
        # Before failing, re-derive the declaration set from the
        # CURRENT on-disk code in a clean interpreter; only a mismatch
        # against HEAD is real.
        declared_now = _declared_in_fresh_interpreter()
        now = fp.load_verdicts()
        missing = declared_now - set(now)
        orphans = set(now) - declared_now
    assert not missing, f"untracked queries: {sorted(missing)}"
    assert not orphans, f"sidecar entries for undeclared queries: {sorted(orphans)}"


def _declared_in_fresh_interpreter() -> set[str]:
    import json
    import pathlib
    import subprocess

    root = pathlib.Path(fp.__file__).resolve().parents[2]
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import json, __spark_entry__\n"
            "from oamap_spark.queries import registry\n"
            "print(json.dumps(sorted(registry.registration_order())))",
        ],
        capture_output=True,
        text=True,
        cwd=root,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return set(json.loads(out.stdout.strip().splitlines()[-1]))


def test_fingerprints_are_deterministic_and_complete():
    a = fp.all_fingerprints()
    b = fp.all_fingerprints()
    assert a == b
    assert set(a) == set(registry.registration_order())
    assert all(len(v) == 64 for v in a.values())


def _clean_sidecar():
    """Synthetic sidecar where every query's recorded fingerprint
    matches its CURRENT source (rounds kept from the real sidecar) —
    the tests perturb this, so they hold mid-round too, when the real
    sidecar legitimately lists changed queries."""
    real = fp.load_verdicts()
    fps = fp.all_fingerprints()
    return {
        # `or 1`: never-verified round-0 stubs count as verified here —
        # the synthetic baseline must contain NO prioritized entries
        n: {"round": real.get(n, {}).get("round") or 1, "fingerprint": fps[n]}
        for n in registry.registration_order()
    }


def test_changed_queries_lead_the_window(monkeypatch):
    """A query whose recorded fingerprint no longer matches its source
    must sort before every verified-unchanged query; the unchanged tail
    is oldest-verdict-first."""
    fake = _clean_sidecar()
    newest = max(v["round"] for v in fake.values())
    victim = next(n for n in fake if fake[n]["round"] == newest)
    fake[victim]["fingerprint"] = "stale" + fake[victim]["fingerprint"][5:]
    monkeypatch.setattr(fp, "load_verdicts", lambda: fake)
    pri = fp.compute_priority()
    assert pri[0] == victim
    rounds = [fake[n]["round"] for n in pri[1:]]
    assert rounds == sorted(rounds), "unchanged tail must be oldest-first"


def test_never_verified_round0_stub_is_prioritized(monkeypatch):
    fake = _clean_sidecar()
    victim = registry.registration_order()[-1]
    fake[victim]["round"] = 0
    monkeypatch.setattr(fp, "load_verdicts", lambda: fake)
    assert fp.compute_priority()[0] == victim


def test_queries_iteration_order_follows_computed_priority(monkeypatch):
    monkeypatch.setattr(registry, "_PRIORITY_CACHE", None)
    assert list(registry.queries()) == fp.compute_priority()


def _mk_module(tmp_path, stem: str, helper_body: str):
    """Import a throwaway module under the FIXED name ``fpmod`` (so the
    module-name part of the fingerprint is identical between variants
    and only the helper source differs)."""
    src = textwrap.dedent(
        f"""
        CONST = 7

        def helper(x):
            {helper_body}

        def query(spark, sf_dir):
            return helper(CONST)
        """
    )
    p = tmp_path / f"{stem}.py"
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("fpmod", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fpmod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_fingerprint_changes_when_transitive_helper_changes(tmp_path, monkeypatch):
    """The fingerprint must cover the helper a query calls, not just
    the query body — the exact class of drift (simhash32's Arrow swap)
    the hand-pinned window missed in round 4."""
    m1 = _mk_module(tmp_path, "variant_a", "return x + 1")
    m2 = _mk_module(tmp_path, "variant_b", "return x + 2")
    # same module name + query body text in both; only the helper differs
    monkeypatch.setattr(fp, "_is_ours", lambda obj: getattr(obj, "__module__", "").startswith("fpmod"))
    spec1 = registry.QuerySpec(name="t", fn=m1.query, raw_fn=m1.query)
    spec2 = registry.QuerySpec(name="t", fn=m2.query, raw_fn=m2.query)
    assert fp.query_fingerprint(spec1) != fp.query_fingerprint(spec2)


def test_bench_headline_set_covers_round4_plan_families():
    """VERDICT r4 ask #8: the bench must time the window-group-limit,
    session-window, and foreachBatch plan families."""
    bench = set(registry.bench_queries())
    for name in (
        "lateral_top3_orders_per_customer",
        "batch_session_window_stats",
        "stream_foreachbatch_upsert_latest",
    ):
        assert name in bench, name


def test_fingerprint_covers_oracle_sql(monkeypatch):
    name = registry.registration_order()[0]
    spec = registry._REGISTRY[name]
    import dataclasses

    altered = dataclasses.replace(spec, oracle=(spec.oracle or "") + " -- changed")
    assert fp.query_fingerprint(spec) != fp.query_fingerprint(altered)


def test_fingerprint_salted_with_session_conf(monkeypatch):
    """Every query runs under configure_session, so a conf change (ANSI
    mode, timezone, pruning flags) changes effective semantics without
    touching query source — it must flip EVERY fingerprint so all
    verdicts are invalidated by design (VERDICT r5 "Next round #7")."""
    from oamap_spark import session

    before = fp.all_fingerprints()
    monkeypatch.setitem(
        session._RUNTIME_CONF, "spark.sql.ansi.enabled", "true"
    )
    # through the MEMOIZED path on purpose (r6 review: the cache must
    # be keyed on the conf salt, not serve stale pre-change prints)
    after = fp.all_fingerprints()
    flipped = [n for n in before if before[n] != after[n]]
    assert len(flipped) == len(before), (
        f"conf salt missed {sorted(set(before) - set(flipped))}"
    )


def _mk_decorated_module(tmp_path, stem: str, deco_arg: str, body: str):
    """Throwaway module (fixed name ``fpmod``) whose query fn carries a
    register-like decorator — only the decorator ARG and body vary."""
    src = textwrap.dedent(
        f"""
        def fake_register(**kw):
            def deco(fn):
                return fn
            return deco

        @fake_register(bench={deco_arg})
        def query(spark, sf_dir):
            {body}
        """
    )
    p = tmp_path / f"{stem}.py"
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("fpmod", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fpmod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_registration_metadata_does_not_flip_fingerprint(tmp_path, monkeypatch):
    """Decorator metadata (bench flag, tags) is presentation, not
    semantics — an identical body under a different @register(...) arg
    must fingerprint IDENTICALLY (r6 review: four bench=True one-liners
    spent four changed-first window slots), while a body edit under the
    same decorator must still flip."""
    monkeypatch.setattr(
        fp, "_is_ours", lambda obj: getattr(obj, "__module__", "").startswith("fpmod")
    )
    a = _mk_decorated_module(tmp_path, "deco_a", "False", "return 1")
    b = _mk_decorated_module(tmp_path, "deco_b", "True", "return 1")
    c = _mk_decorated_module(tmp_path, "deco_c", "False", "return 2")
    specs = [
        registry.QuerySpec(name="t", fn=m.query, raw_fn=m.query) for m in (a, b, c)
    ]
    fa, fb, fc = (fp.query_fingerprint(s) for s in specs)
    assert fa == fb, "decorator-only change flipped the fingerprint"
    assert fa != fc, "body change must still flip the fingerprint"


def test_strip_decorators_dedents_both_branches():
    """ADVICE r6 #3: the same (indented) body must normalize
    identically whether or not a decorator is stripped — otherwise the
    hash of a body depends on which branch ran."""
    undecorated = "    def f():\n        return 1\n"
    decorated = "    @deco\n" + undecorated
    a = fp._strip_decorators(undecorated)
    b = fp._strip_decorators(decorated)
    assert a == b == "def f():\n    return 1\n"
    # unparseable source still comes back dedented, not raw
    assert fp._strip_decorators("    not python (") == "not python ("


def test_smoke_tier_nodeids_exist():
    """The smoke tier (conftest.SMOKE_NODEIDS, VERDICT r11 'Next round
    #6') is matched by nodeid at collection time, so a renamed test or
    a dropped query would silently shrink the tier instead of failing
    it. Pin that every entry still resolves: the file exists, the
    function is defined in it, and a parametrized oracle entry names a
    declared query."""
    import ast
    import os

    from tests.conftest import SMOKE_NODEIDS

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    declared = set(registry.queries())
    funcs_by_file: dict[str, set[str]] = {}
    for nodeid in sorted(SMOKE_NODEIDS):
        fname, rest = nodeid.split("::", 1)
        func = rest.split("[", 1)[0]
        path = os.path.join(tests_dir, fname)
        assert os.path.exists(path), f"smoke tier names missing file {fname}"
        if fname not in funcs_by_file:
            tree = ast.parse(open(path).read())
            funcs_by_file[fname] = {
                n.name
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            }
        assert func in funcs_by_file[fname], (
            f"smoke tier names missing test {fname}::{func}"
        )
        if "[" in rest:
            param = rest.split("[", 1)[1].rstrip("]")
            assert param in declared, (
                f"smoke tier oracle replay names undeclared query {param!r}"
            )
