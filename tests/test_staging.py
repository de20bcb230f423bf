"""sources/staging.py: per-invocation-unique staging paths, swept at
process exit (ADVICE r4 #3 — the format gates must not leak /tmp)."""

from __future__ import annotations

import os

from oamap_spark.sources import staging


def test_staging_paths_unique_and_tracked():
    a = staging.staging_path("oamap_test_", "leaf")
    b = staging.staging_path("oamap_test_", "leaf")
    assert a != b
    for p in (a, b):
        root = os.path.dirname(p)
        assert os.path.isdir(root), "mkdtemp root must exist"
        assert not os.path.exists(p), "leaf must be left to the writer"
        assert root in staging._ROOTS


def test_cleanup_removes_all_roots():
    # snapshot the process-global registry: other tests in this pytest
    # process may still hold lazy readers over THEIR staged roots
    others = staging._ROOTS[:]
    staging._ROOTS.clear()
    try:
        p = staging.staging_path("oamap_test_", "leaf")
        root = os.path.dirname(p)
        os.makedirs(p)
        with open(os.path.join(p, "data"), "w") as f:
            f.write("x")
        staging._cleanup()
        assert not os.path.exists(root)
        assert staging._ROOTS == []
        # registry keeps working after a sweep (atexit may run after
        # an explicit cleanup without error)
        staging._cleanup()
    finally:
        staging._ROOTS.extend(others)
