"""Fold a round's CORRECTNESS file into the verdict sidecar.

Run at the START of a round, BEFORE editing any query code, so the
fingerprint recorded for each freshly-verified query is the
fingerprint of the code the driver actually ran:

    python tools/update_verdicts.py CORRECTNESS_r05.json 5

One-time seeding from the full r1..rN history (records each query's
LATEST green round, with the current fingerprint — only valid while
no query's code has changed since its last verdict). If the
fingerprint ALGORITHM itself changed mid-round, seed against the
sources the driver actually scored: `git worktree add <tmp> <round-end
commit>`, copy the new fingerprints.py/registry.py/this tool into the
worktree, run --seed there, and copy verdicts.json back (done this way
for the round-5 reseed):

    python tools/update_verdicts.py --seed

Stub out brand-new queries that have no driver verdict yet (round 0 →
always prioritized as "changed"):

    python tools/update_verdicts.py --add-missing
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()


def _fold_guard(corr_path: Path, force: bool) -> str:
    """Refuse to fold when the working tree no longer matches the code
    the driver scored (ADVICE r5 #2: fingerprints are computed from
    the CURRENT tree, so folding after query edits would record a
    changed query as verified-unchanged — silently stealing its window
    priority, the exact failure class this sidecar exists to prevent).

    Two tripwires, both overridable with --force:
    - dirty tracked files under the fingerprinted surface
      (oamap_spark/, __spark_entry__.py) — uncommitted edits;
    - the fingerprinted surface DIFFERS between HEAD and the last
      commit at/before the CORRECTNESS file's write time (the best
      available stand-in for the scored commit — the driver records no
      hash). Doc/tool commits after scoring pass; query-code commits
      are named and refused.
    Known limits (tripwire, not proof): a commit landing while the
    driver run was in flight predates the file's mtime and passes; so
    does any mtime refresh of the CORRECTNESS file (fresh clone, copy)
    — under the documented fold-at-round-start-before-editing
    discipline neither occurs.
    Returns the HEAD hash, recorded in each folded entry for audit."""
    head = _git("rev-parse", "HEAD")
    problems = []
    # substring match, not positional parse: _git() strips the output,
    # which eats the first porcelain line's leading status space (found
    # by tests/test_fold_guard.py) — and rename lines ("R  a -> b")
    # put the path elsewhere anyway. Over-matching merely refuses a
    # fold that --force can override; under-matching defeats the guard.
    dirty = [
        line
        for line in _git("status", "--porcelain").splitlines()
        if "oamap_spark/" in line or "__spark_entry__.py" in line
    ]
    if dirty:
        problems.append(
            "uncommitted changes under the fingerprinted surface:\n  "
            + "\n  ".join(dirty)
        )
    corr_time = int(corr_path.stat().st_mtime)
    scored = _git("rev-list", "-1", f"--before={corr_time}", "HEAD")
    if not scored:
        # every commit postdates the CORRECTNESS file (amend/rebase
        # reset committer dates, or the file's mtime is stale): there
        # is no identifiable scored tree — refuse, don't assume
        problems.append(
            f"no commit predates {corr_path.name}'s write time — history "
            "was rewritten or the file's mtime is unreliable; cannot "
            "identify the tree the driver scored"
        )
    elif scored != head:
        drifted = _git(
            "diff",
            "--name-only",
            scored,
            head,
            "--",
            "oamap_spark",
            "__spark_entry__.py",
        )
        if drifted:
            problems.append(
                f"fingerprinted surface changed between the scored tree "
                f"({scored[:12]}, last commit before {corr_path.name} was "
                f"written) and HEAD ({head[:12]}):\n  "
                + "\n  ".join(drifted.splitlines())
            )
    if problems and not force:
        print(
            "REFUSING to fold (use --force if you are certain the "
            "fingerprinted sources match what the driver scored):"
        )
        for p in problems:
            print(" -", p)
        raise SystemExit(1)
    if problems:
        print("WARNING (--force): folding despite:", *problems, sep="\n - ")
    return head


def _green(row: dict) -> bool:
    # rows-only driver checks record err='no_oracle' with a spark row
    # count and no match booleans; that is a (weaker) verdict too
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        row.get("rows_match") in (True, None)
        and row.get("schema_match") in (True, None)
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def _parse_args(argv: list[str]):
    """argparse (ADVICE r6 #4): the old positional slicing recognized
    --force only in argv[3:], so `--force path round` silently dropped
    the flag AND parsed '--force' as the path. Flags now parse in any
    position; the three modes are mutually exclusive."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="update_verdicts.py",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("path", nargs="?", help="CORRECTNESS_r0N.json to fold")
    ap.add_argument("round", nargs="?", type=int, help="round number N")
    ap.add_argument("--seed", action="store_true", help="reseed from full history")
    ap.add_argument(
        "--add-missing", action="store_true", help="stub never-verified queries"
    )
    ap.add_argument(
        "--force", action="store_true", help="fold despite fold-guard problems"
    )
    # parse_intermixed_args: plain parse_args can't place an optional
    # BETWEEN two nargs='?' positionals ("path --force round")
    args = ap.parse_intermixed_args(argv)
    if args.seed and args.add_missing:
        ap.error("--seed and --add-missing are mutually exclusive")
    if not (args.seed or args.add_missing) and (args.path is None or args.round is None):
        ap.error("fold mode needs both PATH and ROUND (or use --seed/--add-missing)")
    if (args.seed or args.add_missing) and args.path is not None:
        ap.error("--seed/--add-missing take no positional arguments")
    return args


def main(argv: list[str] | None = None) -> None:
    args = _parse_args(sys.argv[1:] if argv is None else argv)

    import __spark_entry__  # noqa: F401 — populate the registry

    from oamap_spark.queries import fingerprints as fp

    verdicts = fp.load_verdicts()
    fps = fp.all_fingerprints()

    if args.seed:
        files = sorted(REPO.glob("CORRECTNESS_r*.json"))
        for f in files:
            rnd = int(f.stem.split("_r")[1])
            data = json.loads(f.read_text())
            for name, row in data.items():
                if name in fps and _green(row):
                    verdicts[name] = {"round": rnd, "fingerprint": fps[name]}
        print(f"seeded {len(verdicts)} verdicts from {len(files)} files")
    elif args.add_missing:
        added = 0
        for name in fps:
            if name not in verdicts:
                verdicts[name] = {"round": 0, "fingerprint": fps[name]}
                added += 1
        print(f"added {added} never-verified stubs")
    else:
        path, rnd = Path(args.path), args.round
        head = _fold_guard(path, args.force)
        data = json.loads(path.read_text())
        n = 0
        for name, row in data.items():
            if name in fps and _green(row):
                verdicts[name] = {
                    "round": rnd,
                    "fingerprint": fps[name],
                    "commit": head,
                }
                n += 1
        print(f"recorded {n} round-{rnd} verdicts from {path.name} at {head[:12]}")

    fp.save_verdicts(verdicts)


if __name__ == "__main__":
    main()
