"""Fast local scratch placement for fsync-heavy small-file I/O.

Streaming checkpoints (offset/commit logs + one state-store delta file per
operator per shuffle partition per micro-batch) and versioned-manifest
commits are many small synchronous writes.  On the bench sandbox the
default ``tempfile.gettempdir()`` (/tmp) sits on the root ext4 disk, so a
three-stream drain pays dozens of journaled-disk round-trips per
invocation that a production deployment would put on local NVMe (Spark's
own tuning guidance: state stores and shuffle scratch belong on the
fastest local storage available).

Resolution order:
1. ``$SPARK_GRAFT_SCRATCH`` — explicit production/cluster setting;
2. ``/dev/shm`` when present and writable — the local-mode analog of a
   fast local disk (Linux ships it mounted tmpfs by default);
3. ``tempfile.gettempdir()``.

Only *scratch* belongs here: checkpoints, state stores, fixture
warehouses, shuffle spill.  Durable outputs keep their caller-given paths.
"""

from __future__ import annotations

import os
import tempfile

__all__ = ["scratch_root"]

_CACHE: str | None = None


def scratch_root() -> str:
    """Directory under which scratch (checkpoints/state/warehouses) lives."""
    global _CACHE
    if _CACHE is None:
        env = os.environ.get("SPARK_GRAFT_SCRATCH")
        if env:
            _CACHE = env
        elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            _CACHE = "/dev/shm"
        else:
            _CACHE = tempfile.gettempdir()
        os.makedirs(_CACHE, exist_ok=True)
    return _CACHE
