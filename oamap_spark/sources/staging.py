"""Process-lifetime staging directories for side-effecting queries.

The format-gate queries (CSV/XML/ORC round-trips, partitioned/Z-order
writes, the foreachBatch upsert sink) stage through a FRESH mkdtemp
per invocation so concurrent runs — driver scoring alongside a local
replay, or pytest-xdist — can never race on a shared /tmp path. That
freshness leaked (ADVICE r4 #3): every invocation left a full copy of
its staged table behind, and repeated scoring accumulated unbounded
disk. Every root created here is therefore registered for one
``shutil.rmtree`` sweep at interpreter exit — uniqueness per
invocation is preserved (no reuse, no races), but the copies share the
process's lifetime instead of the machine's.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOTS: list[str] = []


def _cleanup() -> None:
    while _ROOTS:
        shutil.rmtree(_ROOTS.pop(), ignore_errors=True)


atexit.register(_cleanup)


def staging_path(prefix: str, leaf: str) -> str:
    """A path inside a fresh mkdtemp root that is auto-removed at
    process exit. The leaf itself is NOT created (Spark writers insist
    on creating their target)."""
    base = tempfile.mkdtemp(prefix=prefix)
    _ROOTS.append(base)
    return os.path.join(base, leaf)


def staged_for(sf_dir: str, leaf: str) -> str:
    """Staging path for a format-gate query: per-invocation-unique,
    with the sf tag in the prefix for debuggability only."""
    return staging_path(
        f"oamap_fmt_{os.path.basename(sf_dir.rstrip('/'))}_", leaf
    )
