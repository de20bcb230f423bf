"""tools/update_verdicts.py fold guard — the tripwires that keep the
verdict sidecar from recording fingerprints for code the driver never
scored (ADVICE r5 #2 + r6 review), exercised against a throwaway git
repo so history/mtime scenarios are fully controlled."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

TOOL = Path(__file__).resolve().parent.parent / "tools" / "update_verdicts.py"


def _load_tool():
    spec = importlib.util.spec_from_file_location("update_verdicts_under_test", TOOL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["update_verdicts_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _git(repo: Path, *args: str, date: int | None = None) -> str:
    env = {
        **os.environ,
        "GIT_AUTHOR_NAME": "t",
        "GIT_AUTHOR_EMAIL": "t@t",
        "GIT_COMMITTER_NAME": "t",
        "GIT_COMMITTER_EMAIL": "t@t",
        # isolate from host git config (gpgsign, hooksPath would break
        # the fixture commits on a configured machine)
        "GIT_CONFIG_GLOBAL": "/dev/null",
        "GIT_CONFIG_SYSTEM": "/dev/null",
    }
    if date is not None:
        # pin commit time deterministically instead of sleeping past
        # git's 1-second date granularity
        env["GIT_AUTHOR_DATE"] = env["GIT_COMMITTER_DATE"] = f"{date} +0000"
    return subprocess.run(
        ["git", "-C", str(repo), *args],
        capture_output=True,
        text=True,
        check=True,
        env=env,
    ).stdout.strip()


@pytest.fixture()
def repo(tmp_path, monkeypatch):
    """A git repo with one committed query file, the tool pointed at it."""
    r = tmp_path / "repo"
    (r / "oamap_spark").mkdir(parents=True)
    (r / "oamap_spark" / "q.py").write_text("x = 1\n")
    _git(r, "init", "-q")
    _git(r, "add", "-A")
    _git(r, "commit", "-qm", "scored tree")
    mod = _load_tool()
    monkeypatch.setattr(mod, "REPO", r)
    return r, mod


def _corr(repo: Path, mtime_offset: float = 0.0) -> Path:
    p = repo / "CORRECTNESS_r09.json"
    p.write_text("{}")
    t = time.time() + mtime_offset
    os.utime(p, (t, t))
    return p


def test_clean_tree_scored_head_passes(repo):
    r, mod = repo
    corr = _corr(r, mtime_offset=5)  # written after the only commit
    head = mod._fold_guard(corr, force=False)
    assert head == _git(r, "rev-parse", "HEAD")


def test_dirty_fingerprinted_surface_refuses(repo):
    r, mod = repo
    corr = _corr(r, mtime_offset=5)
    (r / "oamap_spark" / "q.py").write_text("x = 2\n")
    with pytest.raises(SystemExit):
        mod._fold_guard(corr, force=False)
    # --force overrides, with the warning path
    assert mod._fold_guard(corr, force=True)


def test_query_commit_after_scoring_refuses(repo):
    r, mod = repo
    corr = _corr(r)
    (r / "oamap_spark" / "q.py").write_text("x = 3\n")
    _git(r, "add", "-A")
    _git(r, "commit", "-qm", "edited after scoring",
         date=int(corr.stat().st_mtime) + 60)
    with pytest.raises(SystemExit):
        mod._fold_guard(corr, force=False)


def test_doc_commit_after_scoring_passes(repo):
    r, mod = repo
    corr = _corr(r)
    (r / "NOTES.md").write_text("docs only\n")
    _git(r, "add", "-A")
    _git(r, "commit", "-qm", "docs after scoring",
         date=int(corr.stat().st_mtime) + 60)
    assert mod._fold_guard(corr, force=False)


def test_rewritten_history_refuses(repo):
    """All commits postdating the CORRECTNESS file (amend/rebase reset
    committer dates) → no identifiable scored tree → refuse (r6
    review: the empty rev-list case must not silently pass)."""
    r, mod = repo
    corr = _corr(r, mtime_offset=-3600)  # file predates every commit
    with pytest.raises(SystemExit):
        mod._fold_guard(corr, force=False)


def test_parse_args_force_any_position():
    """ADVICE r6 #4: --force must be recognized regardless of argument
    order — the old positional slicing only saw it in argv[3:] and
    would have parsed a leading '--force' as the PATH."""
    mod = _load_tool()
    for argv in (
        ["--force", "CORRECTNESS_r06.json", "6"],
        ["CORRECTNESS_r06.json", "--force", "6"],
        ["CORRECTNESS_r06.json", "6", "--force"],
    ):
        args = mod._parse_args(argv)
        assert args.force and args.path == "CORRECTNESS_r06.json" and args.round == 6


def test_parse_args_rejects_bad_modes():
    mod = _load_tool()
    with pytest.raises(SystemExit):  # fold mode without round
        mod._parse_args(["CORRECTNESS_r06.json"])
    with pytest.raises(SystemExit):  # mutually exclusive modes
        mod._parse_args(["--seed", "--add-missing"])
    with pytest.raises(SystemExit):  # mode flags take no positionals
        mod._parse_args(["--seed", "CORRECTNESS_r06.json", "6"])
    with pytest.raises(SystemExit):  # no arguments at all
        mod._parse_args([])
    assert mod._parse_args(["--seed"]).seed
    assert mod._parse_args(["--add-missing"]).add_missing
