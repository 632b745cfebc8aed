"""Per-partition manifests + atomic writes = the engine's checkpoint story.

The reference has NO checkpointing — partial files are deleted as consumed
and any failure restarts the build from scratch (SURVEY.md §4.1,
``IndexCreator.py:191,202,209``). Here every index partition (posting
segment / docstat partition) is written write-then-rename with a
``manifest.json`` committed LAST, so:

- a retried Ray task can never corrupt output (idempotent overwrite),
- a resumed build skips partitions whose manifest is complete and whose
  build fingerprint matches (north_rule: "resumable from per-partition
  checkpoints with lineage and metrics recorded per shard"),
- lineage + metrics live next to the data they describe.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any


def write_json_atomic(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_bytes_atomic(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def unique_tmp(path: str) -> str:
    """Collision-free temp sibling for tmp+rename installs. A FIXED
    '.tmp' name lets a presumed-lost-but-still-alive retry twin truncate
    another writer's in-flight file (both opened the same path with
    'wb') and get the partial bytes installed by the survivor's rename;
    mkstemp names keep concurrent writers on disjoint files so every
    os.replace installs a COMPLETE artifact."""
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=d, prefix=os.path.basename(path) + ".", suffix=".tmp"
    )
    os.close(fd)
    return tmp


def sweep_stale_tmp(part_dir: str, max_age_s: float = 600.0) -> int:
    """Remove orphaned ``*.tmp`` siblings left in ``part_dir`` by a
    writer killed mid-write. ``unique_tmp`` names are collision-free by
    design, so no later run ever reuses (or overwrites) an orphan — a
    crash/resume cycle would otherwise leak one full-size file per kill.
    Only files idle for ``max_age_s`` are removed: a concurrent retry
    twin that is still streaming bytes keeps its tmp's mtime fresh.
    Call this when (re)building a partition whose manifest is absent or
    stale — never on a completed partition's hot path. Returns the
    number of files removed."""
    import glob
    import time

    removed = 0
    now = time.time()
    for tmp in glob.glob(os.path.join(part_dir, "*.tmp")):
        try:
            if now - os.path.getmtime(tmp) >= max_age_s:
                os.unlink(tmp)
                removed += 1
        except OSError:
            pass  # vanished (concurrent sweep) or still being renamed
    return removed


def write_parquet_atomic(path: str, table: Any) -> None:
    """``pq.write_table`` via unique-tmp + rename (the same contract as
    ``write_json_atomic``)."""
    import pyarrow.parquet as pq

    tmp = unique_tmp(path)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_json(path: str) -> Any | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fingerprint(obj: Any) -> str:
    """Stable fingerprint of a config/lineage dict."""
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True).encode()
    ).hexdigest()[:16]


def partition_complete(part_dir: str, build_fp: str) -> bool:
    m = load_json(os.path.join(part_dir, "manifest.json"))
    return bool(m) and m.get("build_fingerprint") == build_fp
