"""Process-level host-memory mitigations + health probes.

This sandbox VM (Firecracker-style lazy snapshot restore, THP
``[always]``) can enter a state where **transparent-huge-page faults are
pathologically slow** while ordinary 4 KiB faults stay healthy —
measured 2026-08-17: anonymous 2 MiB-page first-touch at ~7 MB/s vs
4 KiB-page first-touch at ~1.7 GB/s on the same host minute. Every large
Arrow/numpy allocation then stalls ~0.3 s per 2 MiB page, which is
exactly the 6x index-build inflation recorded in BENCH_r02.json (the
query path reads file-backed mmaps and never hit it).

``disable_thp()`` turns THP off for the calling process via
``prctl(PR_SET_THP_DISABLE)``; the flag is inherited across fork/execve,
so calling it before ``ray.init`` covers raylet and every Ray worker,
and calling it at package import covers workers that import this library
in an externally-initialised session. Databases ship the same mitigation
(THP-off is standard deployment advice for Redis/Mongo-class workloads);
on a healthy host the cost is a few percent of TLB reach — opt out with
``IRPC_KEEP_THP=1``.

Probes (``fault_probe_mbps``): first-touch page-fault service rate for
the 4 KiB path (what the engine experiences once THP is disabled) and,
diagnostically, the 2 MiB path. Probes use raw ``mmap`` so they always
measure FRESH pages regardless of allocator settings — a malloc-based
probe reads warm heap reuse after the first call and defends nothing.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import time

PR_SET_THP_DISABLE = 41


def disable_thp() -> bool:
    """Disable transparent huge pages for this process and all future
    children. Returns True if the prctl took effect."""
    if os.environ.get("IRPC_KEEP_THP"):
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        return libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0) == 0
    except Exception:
        return False


def fault_probe_4k_mbps(size_mb: int = 32, repeats: int = 3) -> float:
    """First-touch service rate of fresh 4 KiB anonymous pages (MB/s) —
    the engine's fault path once THP is disabled. Best of ``repeats``:
    the probe detects a host whose fault path is orders of magnitude
    degraded, and a single sample taken while reclaim is draining a
    just-finished build can read 10x low on a healthy host."""
    best = 0.0
    for _ in range(repeats):
        n = size_mb << 20
        mm = mmap.mmap(-1, n)
        try:
            if hasattr(mmap, "MADV_NOHUGEPAGE"):
                mm.madvise(mmap.MADV_NOHUGEPAGE)
            t0 = time.monotonic()
            for off in range(0, n, 4096):
                mm[off] = 1
            dt = time.monotonic() - t0
        finally:
            mm.close()
        best = max(best, size_mb / dt)
    return round(best, 1)


_CONCURRENT_PROBE_SRC = r"""
import ctypes, mmap, time
ctypes.CDLL(None).prctl(41, 1, 0, 0, 0)  # THP off, like the engine
size_mb = %d
n = size_mb << 20
mm = mmap.mmap(-1, n)
if hasattr(mmap, "MADV_NOHUGEPAGE"):
    mm.madvise(mmap.MADV_NOHUGEPAGE)
t0 = time.monotonic()
for off in range(0, n, 4096):
    mm[off] = 1
print(round(size_mb / (time.monotonic() - t0), 1))
mm.close()
"""


def fault_probe_concurrent_mbps(nproc: int = 8, size_mb: int = 64) -> float:
    """AGGREGATE first-touch 4 KiB fault service rate across ``nproc``
    concurrent processes (MB/s) — the fault path the engine's parallel
    stages actually experience. A host can service single-threaded
    faults at GB/s while SERIALIZING parallel fault service at a global
    cap (measured on this sandbox 2026-08-17 post-restart: 1.6 GB/s
    single vs ~2-5 GB/s aggregate at 24-32 procs where a healthy host
    scales per-core); a single-threaded probe alone cannot see that
    mode. Read the pair: single healthy + aggregate ≈ nproc x single →
    healthy; single healthy + aggregate ≈ single → host-serialized."""
    import subprocess
    import sys
    import time as _time

    try:
        t0 = _time.monotonic()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _CONCURRENT_PROBE_SRC % size_mb],
                stdout=subprocess.PIPE,
            )
            for _ in range(nproc)
        ]
        for p in procs:
            p.communicate(timeout=120)
        wall = _time.monotonic() - t0
        return round(nproc * size_mb / wall, 1)
    except Exception:
        return -1.0


_THP_PROBE_SRC = r"""
import ctypes, mmap, time
# the parent may have PR_SET_THP_DISABLE set (it is preserved across
# exec) — clear it so this child actually measures the huge-page path
ctypes.CDLL(None).prctl(41, 0, 0, 0, 0)
size_mb = %d
n = size_mb << 20
mm = mmap.mmap(-1, n)
if hasattr(mmap, "MADV_HUGEPAGE"):
    mm.madvise(mmap.MADV_HUGEPAGE)
t0 = time.monotonic()
for off in range(0, n, 2 << 20):
    mm[off] = 1
dt = time.monotonic() - t0
mm.close()
print(round(size_mb / dt, 1))
"""


def fault_probe_thp_mbps(size_mb: int = 16) -> float:
    """First-touch service rate of fresh 2 MiB (THP) anonymous pages
    (MB/s) — the host-pathology indicator. Runs in a subprocess so the
    caller's PR_SET_THP_DISABLE doesn't mask the measurement; one touch
    per 2 MiB region faults a whole huge page on THP=always hosts."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", _THP_PROBE_SRC % size_mb],
            capture_output=True,
            text=True,
            timeout=60,
            check=True,
        ).stdout
        return float(out.strip())
    except Exception:
        return -1.0
