"""Partial posting runs + vectorized run merging.

The unit flowing through the posting shuffle is a *partial run*: for one
term, the sorted postings contributed by one upstream task —

    term:      string
    seg:       int32            hash(term) % num_segments  (shuffle key)
    doc_ids:   list<int64>      ascending within the run
    tfs:       list<int32>
    pos_bytes: binary           per-doc varint position streams, concatenated
    pos_lens:  list<int32>      byte length of each doc's position stream

Because each doc's position stream restarts its delta at the doc boundary
(codec.encode_positions), runs can be merged by pure byte-slice reordering
— positions are encoded ONCE at tokenize time and never re-encoded, no
matter how many merge rounds (salted pre-merge, segment build) follow.

This is the partial/final combine that replaces the reference's
single-threaded k-way text merge (``IndexCreator.py:286-338``): the
reference merges sorted *files* on one core; we merge sorted *runs*
wherever the shuffle puts them.
"""

from __future__ import annotations

import zlib

import numpy as np


def term_seg(term: str, num_segments: int) -> int:
    """Stable (cross-process) term → segment id. Python's hash() is salted
    per process, so crc32 it is."""
    return zlib.crc32(term.encode("utf-8")) % num_segments


def term_seg_array(terms: list[str], num_segments: int) -> np.ndarray:
    return np.array(
        [zlib.crc32(t.encode("utf-8")) % num_segments for t in terms],
        dtype=np.int32,
    )


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a), dtype=np.int64)
    if len(a) > 1:
        np.cumsum(a[:-1], out=out[1:])
    return out


def concat_posting_parts(parts, with_positions: bool):
    """Concatenate per-generation/per-blob posting parts (already in
    ascending disjoint doc-id order) into one posting: returns
    (doc_ids, tfs, positions|None, pos_starts) with pos_starts rebuilt
    as the exclusive cumsum of the concatenated tfs. ``parts`` is a
    list of (doc_ids, tfs, positions|None) triples."""
    d = np.concatenate([x[0] for x in parts])
    t = np.concatenate([x[1] for x in parts])
    pos = (
        np.concatenate([x[2] for x in parts]) if with_positions else None
    )
    return d, t, pos, _exclusive_cumsum(t)


def gather_byte_slices(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, order: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Reorder variable-length byte slices of ``buf`` by ``order`` —
    fully vectorized (no per-slice Python loop).

    Returns (new_buf, new_lens)."""
    lens_o = lens[order]
    starts_o = starts[order]
    total = int(lens_o.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8), lens_o
    out_starts = _exclusive_cumsum(lens_o)
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_starts, lens_o)
        + np.repeat(starts_o, lens_o)
    )
    return buf[idx], lens_o


def merge_runs(
    doc_id_runs: list[np.ndarray],
    tf_runs: list[np.ndarray],
    pos_byte_runs: list[bytes | np.ndarray],
    pos_len_runs: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, bytes, np.ndarray]:
    """Merge partial runs of one term into a single sorted run.

    Runs hold disjoint doc-id sets (each doc is tokenized by exactly one
    upstream task); merging = concatenate + argsort + byte-slice gather.
    Returns (doc_ids, tfs, pos_bytes, pos_lens).
    """
    if len(doc_id_runs) == 1:
        # already sorted within a run — nothing to do
        r = np.asarray(doc_id_runs[0], dtype=np.int64)
        pb = pos_byte_runs[0]
        return (
            r,
            np.asarray(tf_runs[0], dtype=np.int64),
            pb.tobytes() if isinstance(pb, np.ndarray) else bytes(pb),
            np.asarray(pos_len_runs[0], dtype=np.int64),
        )
    runs = [np.asarray(r, dtype=np.int64) for r in doc_id_runs]
    # FAST PATH — runs cover DISJOINT doc-id ranges (each tokenize task
    # owns a contiguous fragment range, so a term's runs never
    # interleave): sorting by doc_id is then a whole-run reorder, i.e.
    # O(runs) big memcpys instead of a per-doc argsort + a 3×total-bytes
    # int64 gather. This was the build's reduce straggler: the hottest
    # segment's merge dropped ~22 s → sub-second at 400k docs / 8 cpus.
    # Salted pre-merged runs CAN interleave (a salt bucket mixes
    # fragments) — those fall through to the general gather below.
    nonempty = [i for i, r in enumerate(runs) if len(r)]
    if nonempty:
        firsts = np.array([runs[i][0] for i in nonempty], np.int64)
        lasts = np.array([runs[i][-1] for i in nonempty], np.int64)
        ro = np.argsort(firsts, kind="stable")
        if np.all(lasts[ro][:-1] < firsts[ro][1:]):
            run_order = [nonempty[k] for k in ro]
            doc_ids = np.concatenate([runs[i] for i in run_order])
            if doc_ids.size > 1 and np.any(doc_ids[1:] <= doc_ids[:-1]):
                raise ValueError("duplicate doc_id across partial runs")
            tfs = np.concatenate(
                [np.asarray(tf_runs[i], np.int64) for i in run_order]
            )
            lens = np.concatenate(
                [np.asarray(pos_len_runs[i], np.int64) for i in run_order]
            )
            buf = b"".join(
                pos_byte_runs[i].tobytes()
                if isinstance(pos_byte_runs[i], np.ndarray)
                else bytes(pos_byte_runs[i])
                for i in run_order
            )
            return doc_ids, tfs, buf, lens
    doc_ids = np.concatenate(runs)
    tfs = np.concatenate([np.asarray(r, dtype=np.int64) for r in tf_runs])
    lens = np.concatenate([np.asarray(r, dtype=np.int64) for r in pos_len_runs])
    buf = np.frombuffer(b"".join(
        r.tobytes() if isinstance(r, np.ndarray) else bytes(r)
        for r in pos_byte_runs
    ), dtype=np.uint8)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    if doc_ids.size > 1 and np.any(doc_ids[1:] <= doc_ids[:-1]):
        raise ValueError("duplicate doc_id across partial runs")
    starts = _exclusive_cumsum(lens)
    new_buf, new_lens = gather_byte_slices(buf, starts, lens, order)
    return doc_ids, tfs[order], new_buf.tobytes(), new_lens
