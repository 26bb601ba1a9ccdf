"""Report the resolved scratch root and its small-file fsync latency.

Usage: python tools/scratch_probe.py [n_files]

The streaming state stores / checkpoint logs / manifest commits are many
small synchronous writes; whether moving them to ``scratch_root()`` helps
depends entirely on whether the machine's default tempdir is fsync-bound
(round-12: a 43% streaming win on an fsync-bound ext4 sandbox replicated
as FLAT on the driver box).  Run this once per bench session and attach
the line to the round log so per-machine scratch claims are auditable.

Production note (round-12 advice): ``scratch_root()`` falls back to
/dev/shm (tmpfs) in local mode — fine for fixture-scale state, but a
100 TB streaming state store does NOT fit RAM-backed storage; deployments
MUST set $SPARK_GRAFT_SCRATCH to a local NVMe mount.  ``spark.local.dir``
(shuffle spill) deliberately never uses the tmpfs fallback.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fsync_lat(dirpath: str, n: int) -> tuple[float, float]:
    """Median + p90 latency (ms) of create→write(4KiB)→fsync→close→unlink."""
    samples = []
    payload = b"x" * 4096
    for i in range(n):
        p = os.path.join(dirpath, f"probe_{os.getpid()}_{i}")
        t0 = time.perf_counter()
        fd = os.open(p, os.O_CREAT | os.O_WRONLY | os.O_EXCL)
        try:
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)
        samples.append((time.perf_counter() - t0) * 1000)
        os.unlink(p)
    samples.sort()
    return samples[len(samples) // 2], samples[int(len(samples) * 0.9)]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from modal_vector_db_spark.scratch import scratch_root

    root = scratch_root()
    tmp = tempfile.gettempdir()
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    print(f"scratch_root = {root}  (SPARK_GRAFT_SCRATCH={env or '<unset>'})")
    for label, d in (("scratch", root), ("tempdir", tmp)):
        med, p90 = fsync_lat(d, n)
        print(f"{label:8s} {d:30s} fsync 4KiB: median {med:.2f} ms  p90 {p90:.2f} ms")
    med_s, _ = fsync_lat(root, n)
    med_t, _ = fsync_lat(tmp, n)
    if med_t > 2 * med_s:
        print("verdict: tempdir IS fsync-bound on this machine — scratch placement matters here")
    else:
        print("verdict: tempdir is NOT fsync-bound — expect scratch moves to be ~flat here")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
