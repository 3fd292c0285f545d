"""Rotating scratch-dir registries shared by the plans modules.

One registry per query that writes scratch (checkpoints, parquet
sinks, prebuilt indexes); :func:`new_scratch` rotates it — at most
one PREVIOUS dir is kept so a re-invoked query can still be compared
against its prior run's artifacts, everything older is removed — and
a single atexit hook empties every registry at interpreter exit so
repeated invocations cannot accumulate scratch. Extracted in r13:
streaming_queries and llm_queries had grown two parallel copies of
the registry + cleanup + atexit pattern (review finding), and the
module also breaks the import cycle a shared helper would otherwise
create between them (streaming_queries imports llm_queries at module
level for the shared oracle template).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ALL_REGISTRIES: list[list[str]] = []


def registry() -> list[str]:
    """A fresh scratch-dir list, enrolled in the exit-time cleanup."""
    dirs: list[str] = []
    _ALL_REGISTRIES.append(dirs)
    return dirs


def new_scratch(dirs: list[str], prefix: str) -> str:
    """Rotate: drop all but the most recent previous dir, make a new
    one. Not safe under concurrent same-process invocation (the plans
    registry is single-threaded per session by construction)."""
    while len(dirs) > 1:
        shutil.rmtree(dirs.pop(0), ignore_errors=True)
    root = tempfile.mkdtemp(prefix=prefix)
    dirs.append(root)
    return root


def _cleanup() -> None:
    for dirs in _ALL_REGISTRIES:
        while dirs:
            shutil.rmtree(dirs.pop(), ignore_errors=True)


atexit.register(_cleanup)
