"""Document tombstones — delete support for built indexes.

Lucene-style semantics: ``delete_docs`` records doc ids in a sidecar at
the index root; every query-side posting access filters them out
immediately (results never contain a deleted doc), while the dictionary
and collection statistics stay as built — scores are computed against
the pre-delete statistics until a compaction
(``pipelines.merge.merge_indexes``) physically drops the postings,
recomputes df/ctf/max_tf per term and rewrites the docstat partitions.

The sidecar is a single sorted-doc_id parquet written via tmp+rename
(idempotent union on repeat calls); its content hash feeds the merge
fingerprint so a compaction after further deletes never short-circuits
on a stale manifest.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONE_FILE = "deletes.parquet"


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 doc ids deleted from this index (empty if none)."""
    p = os.path.join(index_dir, TOMBSTONE_FILE)
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    return pq.read_table(p)["doc_id"].to_numpy().astype(np.int64)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Union ``doc_ids`` into the index's tombstone set; returns the new
    total. Atomic (tmp+rename) and idempotent."""
    from .manifest import write_parquet_atomic

    new = np.unique(np.asarray(list(doc_ids), np.int64))
    cur = load_tombstones(index_dir)
    allids = np.union1d(cur, new)
    write_parquet_atomic(
        os.path.join(index_dir, TOMBSTONE_FILE),
        pa.table({"doc_id": pa.array(allids, pa.int64())}),
    )
    return int(allids.size)


def tombstone_fingerprint(index_dir: str) -> str:
    """Content hash of the tombstone set ('' when none) — part of the
    compaction fingerprint."""
    t = load_tombstones(index_dir)
    if t.size == 0:
        return ""
    return hashlib.sha256(t.tobytes()).hexdigest()[:16]


def in_sorted(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean membership of ``needles`` in the SORTED ``haystack`` —
    the searchsorted + clamp + compare idiom, extracted so its edge
    cases (empty sides, needles past the last element) live in one
    place instead of drifting across callers."""
    if haystack.size == 0 or needles.size == 0:
        return np.zeros(len(needles), bool)
    idx = np.searchsorted(haystack, needles)
    idx[idx >= haystack.size] = haystack.size - 1
    return haystack[idx] == needles


def filter_postings(
    tomb: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None = None,
):
    """Drop deleted docs from a decoded posting list → (doc_ids, tfs,
    positions|None, pos_starts). Vectorized: the per-doc position
    segments are masked with one ``np.repeat`` of the doc mask."""
    if tomb.size == 0 or doc_ids.size == 0:
        ps = np.zeros(len(doc_ids), np.int64)
        if len(tfs):
            np.cumsum(tfs[:-1], out=ps[1:])
        return doc_ids, tfs, positions, ps
    keep = ~in_sorted(tomb, doc_ids)
    if keep.all():
        ps = np.zeros(len(doc_ids), np.int64)
        if len(tfs):
            np.cumsum(tfs[:-1], out=ps[1:])
        return doc_ids, tfs, positions, ps
    kd, kt = doc_ids[keep], tfs[keep]
    kp = positions[np.repeat(keep, tfs)] if positions is not None else None
    ps = np.zeros(len(kd), np.int64)
    if len(kt):
        np.cumsum(kt[:-1], out=ps[1:])
    return kd, kt, kp, ps
