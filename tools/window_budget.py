"""Driver-window budget check — run BEFORE and AFTER editing any query
or shared operator code.

Prints the changed/new fingerprint count against the recorded verdict
sidecar and the round composition of the computed 50-slot driver
window. The budget rule (VERDICT r9 ask #2, generalized): keep
changed+new small enough that the window's remaining refresh slots
cover the entire oldest-vintage backlog — otherwise stale verdicts age
another round. Editing ANY function a query's closure reaches flips
that query (the fingerprint walks called operators), so check flips
after every shared-module edit, not just after registering queries.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import oamap_spark.queries  # noqa: F401 — populate the registry
    from oamap_spark.queries.fingerprints import (
        all_fingerprints,
        compute_priority,
        load_verdicts,
    )

    fps = all_fingerprints()
    v = load_verdicts()
    changed = sorted(
        n
        for n, f in fps.items()
        if n in v
        and v[n].get("fingerprint")
        and v[n].get("fingerprint") != f
        and v[n].get("round", 0) > 0
    )
    new = sorted(n for n in fps if n not in v or v[n].get("round", 0) == 0)
    window = compute_priority()[:50]
    comp = Counter((v.get(n) or {}).get("round") for n in window)
    oldest = min(
        (v[n].get("round") for n in v if v[n].get("round", 0) > 0),
        default=None,
    )
    in_window_oldest = comp.get(oldest, 0)
    total_oldest = sum(
        1 for n in v if v[n].get("round", 0) == oldest and n in fps
    )
    print(f"declared queries: {len(fps)}")
    print(f"changed ({len(changed)}): {changed}")
    print(f"new/round-0 ({len(new)}): {new}")
    print(f"changed+new total: {len(changed) + len(new)}")
    print(f"window composition (round -> slots): {dict(sorted(comp.items(), key=lambda kv: str(kv[0])))}")
    print(
        f"oldest vintage r{oldest}: {in_window_oldest}/{total_oldest} "
        f"in the window"
        + ("" if in_window_oldest >= total_oldest else "  <-- BACKLOG AGES!")
    )


if __name__ == "__main__":
    main()
