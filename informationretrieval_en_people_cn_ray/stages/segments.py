"""Segment build (reduce side) + segment read (query side).

A *segment* owns every posting of the terms that hash to it
(``term_seg``), so a query term touches exactly one segment — the
reduce side of the build and the unit of query fan-out. This replaces the
reference's single merged ``index.csv`` + DAWG seek list
(``IndexCreator.py:286-341``) with:

    out_dir/
      seg=00000/terms.parquet     (term, df, ctf, offset, size) sorted by term
      seg=00000/postings.bin      concatenated delta+varint posting blobs
      seg=00000/manifest.json     lineage + metrics + fingerprint (commit marker)
      docstats/part=00000/docstats.parquet  (doc_id, doc_len) sorted, range-partitioned
      docstats/part=00000/manifest.json
      collection.json             global stats (N, total tokens, avgdl, ...)

The sorted ``terms.parquet`` is the term dictionary: binary search for
lookup, range scan for prefix queries — the same capabilities the
reference gets from ``RecordDAWG`` (``SearchEngine.py:210``), without a
custom trie and per-segment instead of global.

Writes are idempotent (write-then-rename, manifest last) and skipped when
a matching manifest already exists → retried tasks can't corrupt output
and resumed builds skip finished partitions (state/manifest.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec import encode_posting_blob
from ..state.manifest import (
    load_json,
    partition_complete,
    sweep_stale_tmp,
    write_bytes_atomic,
    write_json_atomic,
    write_parquet_atomic,
)
from .postings import concat_posting_parts, merge_runs

SUMMARY_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("kind", pa.string()),
        ("n_terms", pa.int64()),
        ("n_docs", pa.int64()),
        ("tokens", pa.int64()),
        ("bytes", pa.int64()),
        ("path", pa.string()),
        ("skipped", pa.bool_()),
    ]
)


def _list_views(col) -> tuple[np.ndarray, np.ndarray]:
    """Single-chunk list column → (flat values, offsets) numpy views —
    per-row slices without materializing per-row scalar objects."""
    arr = col.chunk(0) if hasattr(col, "chunk") else col
    vals = arr.values.to_numpy(zero_copy_only=False)
    offs = arr.offsets.to_numpy()
    return vals, offs


def _binary_views(col) -> tuple[np.ndarray, np.ndarray]:
    """Single-chunk binary column → (flat uint8 data, offsets) views."""
    arr = col.chunk(0) if hasattr(col, "chunk") else col
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, offs


def seg_dir(out_dir: str, seg: int) -> str:
    return os.path.join(out_dir, f"seg={seg:05d}")


def docstat_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "docstats", f"part={part:05d}")


class SegmentBuilder:
    """groupby('seg').map_groups body — one call per partition."""

    def __init__(
        self,
        out_dir: str,
        build_fp: str,
        num_segments: int,
        max_blob_docs: int = 1_000_000,
    ):
        self.out_dir = out_dir
        self.build_fp = build_fp
        self.num_segments = num_segments
        # giant-term cap: a term whose postings exceed this many docs is
        # written as MULTIPLE consecutive blobs (chunk column in the term
        # dictionary). At 10^12-doc scale a head term's single blob would
        # be unboundedly large; chunking bounds encode/decode working-set
        # per blob and lets future block-skipping address chunks directly.
        self.max_blob_docs = max_blob_docs
        self._threads_limited = False

    def __call__(self, group: pa.Table) -> pa.Table:
        if not self._threads_limited:
            from . import limit_worker_threads

            limit_worker_threads()
            self._threads_limited = True
        # groups arrive heavily chunked from the sort shuffle; per-row
        # access on many-chunk columns is the dominant cost — flatten once
        group = group.combine_chunks()
        seg = int(group["seg"][0].as_py())
        if seg >= self.num_segments:
            return self._build_docstats(seg - self.num_segments, group)
        return self._build_postings(seg, group)

    def _summary(self, seg, kind, n_terms, n_docs, tokens, nbytes, path, skipped):
        return pa.table(
            {
                "seg": pa.array([seg], pa.int32()),
                "kind": pa.array([kind], pa.string()),
                "n_terms": pa.array([n_terms], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "tokens": pa.array([tokens], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "path": pa.array([path], pa.string()),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    def _skip_summary(self, seg: int, kind: str, d: str):
        m = load_json(os.path.join(d, "manifest.json"))
        return self._summary(
            seg if kind == "postings" else self.num_segments + seg,
            kind, m["n_terms"], m["n_docs"], m["tokens"], m["bytes"], d, True,
        )

    def _build_postings(self, seg: int, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        d = seg_dir(self.out_dir, seg)
        if partition_complete(d, self.build_fp):
            return self._skip_summary(seg, "postings", d)
        sweep_stale_tmp(d)  # reclaim orphans from a killed prior build

        t_setup0 = time.monotonic()
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        order = np.argsort(terms, kind="stable")
        dvals, doffs = _list_views(group["doc_ids"])
        tvals, toffs = _list_views(group["tfs"])
        lvals, loffs = _list_views(group["pos_lens"])
        bdata, boffs = _binary_views(group["pos_bytes"])
        setup_s = time.monotonic() - t_setup0
        merge_s = encode_s = 0.0

        out_terms: list[str] = []
        out_chunk: list[int] = []
        out_df: list[int] = []
        out_ctf: list[int] = []
        out_max_tf: list[int] = []
        out_off: list[int] = []
        out_size: list[int] = []
        blobs: list[bytes] = []
        offset = 0
        n_postings = 0
        tokens = 0
        n_distinct = 0
        step = self.max_blob_docs

        i = 0
        n = len(order)
        while i < n:
            j = i
            t = terms[order[i]]
            while j < n and terms[order[j]] == t:
                j += 1
            rows = [int(order[k]) for k in range(i, j)]
            t_m0 = time.monotonic()
            doc_ids, tfs, pos_bytes, pos_lens = merge_runs(
                [dvals[doffs[r] : doffs[r + 1]] for r in rows],
                [tvals[toffs[r] : toffs[r + 1]] for r in rows],
                [bdata[boffs[r] : boffs[r + 1]] for r in rows],
                [lvals[loffs[r] : loffs[r + 1]] for r in rows],
            )
            merge_s += time.monotonic() - t_m0
            n_distinct += 1
            pos_ends = np.zeros(len(doc_ids) + 1, dtype=np.int64)
            np.cumsum(pos_lens, out=pos_ends[1:])
            for ci, c0 in enumerate(range(0, max(1, len(doc_ids)), step)):
                c1 = min(c0 + step, len(doc_ids))
                cd, ct = doc_ids[c0:c1], tfs[c0:c1]
                t_e0 = time.monotonic()
                blob = encode_posting_blob(
                    cd, ct, pos_bytes[pos_ends[c0] : pos_ends[c1]]
                )
                encode_s += time.monotonic() - t_e0
                blobs.append(blob)
                out_terms.append(t)
                out_chunk.append(ci)
                out_df.append(len(cd))
                ctf = int(ct.sum())
                out_ctf.append(ctf)
                out_max_tf.append(int(ct.max()) if len(ct) else 0)
                out_off.append(offset)
                out_size.append(len(blob))
                offset += len(blob)
                n_postings += len(cd)
                tokens += ctf
            i = j

        postings = b"".join(blobs)
        write_bytes_atomic(os.path.join(d, "postings.bin"), postings)
        terms_tbl = pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                # chunk ordinal within the term (giant terms span several
                # consecutive rows/blobs; readers merge the range)
                "chunk": pa.array(out_chunk, pa.int32()),
                "df": pa.array(out_df, pa.int64()),
                "ctf": pa.array(out_ctf, pa.int64()),
                # per-chunk max tf: the MaxScore/WAND upper-bound input
                # (north_star pruned-BM25; block-level maxima are the
                # planned refinement)
                "max_tf": pa.array(out_max_tf, pa.int64()),
                "offset": pa.array(out_off, pa.int64()),
                "size": pa.array(out_size, pa.int64()),
            }
        )
        write_parquet_atomic(os.path.join(d, "terms.parquet"), terms_tbl)
        write_json_atomic(
            os.path.join(d, "manifest.json"),
            {
                "kind": "postings",
                "seg": seg,
                "n_terms": n_distinct,
                "n_chunks": len(out_terms),
                "n_docs": n_postings,  # posting entries, not distinct docs
                "tokens": tokens,
                "bytes": len(postings),
                "input_runs": group.num_rows,  # lineage: partial runs consumed
                "build_fingerprint": self.build_fp,
                "wall_s": round(time.monotonic() - t0, 3),
                # per-partition phase metrics (north_rule lineage+metrics)
                "setup_s": round(setup_s, 3),
                "merge_s": round(merge_s, 3),
                "encode_s": round(encode_s, 3),
            },
        )
        return self._summary(
            seg, "postings", n_distinct, n_postings, tokens,
            len(postings), d, False,
        )

    def _build_docstats(self, part: int, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        d = docstat_dir(self.out_dir, part)
        if partition_complete(d, self.build_fp):
            return self._skip_summary(part, "docstats", d)
        sweep_stale_tmp(d)
        # NB: ListArray.values spans the WHOLE child buffer even for sliced
        # arrays — window it with the offsets or neighboring groups' rows
        # leak in
        dvals, doffs = _list_views(group["doc_ids"])
        tvals, toffs = _list_views(group["tfs"])
        doc_ids = dvals[doffs[0] : doffs[-1]].astype(np.int64)
        doc_lens = tvals[toffs[0] : toffs[-1]].astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, doc_lens = doc_ids[order], doc_lens[order]
        if doc_ids.size > 1 and np.any(doc_ids[1:] <= doc_ids[:-1]):
            raise ValueError(f"duplicate doc_id in docstat partition {part}")
        tbl = pa.table(
            {"doc_id": pa.array(doc_ids), "doc_len": pa.array(doc_lens)}
        )
        write_parquet_atomic(os.path.join(d, "docstats.parquet"), tbl)
        tokens = int(doc_lens.sum())
        write_json_atomic(
            os.path.join(d, "manifest.json"),
            {
                "kind": "docstats",
                "part": part,
                "n_terms": 0,
                "n_docs": int(doc_ids.size),
                "tokens": tokens,
                "bytes": int(tbl.nbytes),
                "input_runs": group.num_rows,
                "build_fingerprint": self.build_fp,
                "wall_s": round(time.monotonic() - t0, 3),
            },
        )
        return self._summary(
            self.num_segments + part, "docstats", 0, int(doc_ids.size),
            tokens, int(tbl.nbytes), d, False,
        )


EMPTY_TERMS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("chunk", pa.int32()),
        ("df", pa.int64()),
        ("ctf", pa.int64()),
        ("max_tf", pa.int64()),
        ("offset", pa.int64()),
        ("size", pa.int64()),
    ]
)


def write_empty_segment(out_dir: str, seg: int, build_fp: str) -> None:
    """Materialize an EMPTY posting segment (no terms hashed here — e.g.
    a tiny delta generation whose vocabulary misses some segments). The
    reduce only runs for segments that received rows, but readers and
    merges address every ``seg < num_segments``; idempotent like every
    partition write."""
    d = seg_dir(out_dir, seg)
    from ..state.manifest import partition_complete

    if partition_complete(d, build_fp):
        return
    os.makedirs(d, exist_ok=True)
    write_bytes_atomic(os.path.join(d, "postings.bin"), b"")
    write_parquet_atomic(
        os.path.join(d, "terms.parquet"), EMPTY_TERMS_SCHEMA.empty_table()
    )
    write_json_atomic(
        os.path.join(d, "manifest.json"),
        {
            "kind": "postings",
            "seg": seg,
            "n_terms": 0,
            "n_chunks": 0,
            "n_docs": 0,
            "tokens": 0,
            "bytes": 0,
            "input_runs": 0,
            "build_fingerprint": build_fp,
            "wall_s": 0.0,
        },
    )


class SegmentReader:
    """Query-side state for ONE segment: term dictionary (sorted arrays,
    binary-searched) + memory-mapped postings. Mirrors the reference's
    ``SearchEngine.load_index`` per-artifact open (``SearchEngine.py:39-63``)
    but per segment, built once per query actor."""

    def __init__(self, out_dir: str, seg: int):
        d = seg_dir(out_dir, seg)
        self.seg = seg
        t = pq.read_table(os.path.join(d, "terms.parquet"))
        self.terms = np.asarray(t["term"].to_pylist(), dtype=object)
        self.df = t["df"].to_numpy()
        self.ctf = t["ctf"].to_numpy()
        # legacy dictionaries (pre-max_tf column) fall back to ctf — a
        # SOUND MaxScore/WAND upper bound (tf in one doc ≤ collection
        # tf); a zero placeholder here would make the pruned scorer's
        # early termination drop true top-k results silently
        self.max_tf = (
            t["max_tf"].to_numpy()
            if "max_tf" in t.column_names
            else self.ctf
        )
        self.offset = t["offset"].to_numpy()
        self.size = t["size"].to_numpy()
        self.postings = np.memmap(
            os.path.join(d, "postings.bin"), dtype=np.uint8, mode="r"
        ) if self.size.sum() else np.empty(0, np.uint8)
        self._decoded: dict[int, tuple] = {}
        self._meta: dict[int, dict] = {}  # blob block directories (tiny)
        self._terms_list: list[str] | None = None

    def terms_list(self) -> list[str]:
        """The dictionary as a plain list, converted once — spell/fuzzy
        scans walk the WHOLE vocabulary per query, and the per-call
        object-array→list conversion dominated the scan itself."""
        if self._terms_list is None:
            self._terms_list = self.terms.tolist()
        return self._terms_list

    def postings_decoded(self, idx: int, with_positions: bool = False) -> tuple:
        """(doc_ids, tfs, positions|None, pos_starts) for ONE blob row,
        with a small cache — query batches hit the same hot terms
        repeatedly and re-decoding a 100k-doc posting list per query
        dominates batch latency. Positions decoded lazily (only phrase
        queries pay) and the cached entry upgrades in place."""
        hit = self._decoded.get(idx)
        if hit is None or (with_positions and hit[2] is None):
            from ..codec import decode_posting_blob

            hit = decode_posting_blob(
                self.blob(idx), with_positions=with_positions
            )
            if idx not in self._decoded and len(self._decoded) >= 128:
                self._decoded.pop(next(iter(self._decoded)))
            self._decoded[idx] = hit
        return hit

    def term_range(self, term: str) -> tuple[int, int] | None:
        """Row range [lo, hi) of a term's chunks in the dictionary (giant
        terms span several consecutive chunk rows)."""
        lo = int(np.searchsorted(self.terms, term, side="left"))
        if lo >= len(self.terms) or self.terms[lo] != term:
            return None
        hi = int(np.searchsorted(self.terms, term, side="right"))
        return lo, hi

    def postings_merged(
        self, lo: int, hi: int, with_positions: bool = False
    ) -> tuple:
        """Decode + concatenate a term's chunk rows →
        (doc_ids, tfs, positions|None, pos_starts, df, ctf)."""
        parts = [
            self.postings_decoded(i, with_positions) for i in range(lo, hi)
        ]
        df = int(self.df[lo:hi].sum())
        ctf = int(self.ctf[lo:hi].sum())
        if len(parts) == 1:
            d, t, p, ps = parts[0]
            return d, t, p, ps, df, ctf
        d, t, p, ps = concat_posting_parts(
            [(x[0], x[1], x[2]) for x in parts], with_positions
        )
        return d, t, p, ps, df, ctf

    def blob_meta(self, idx: int) -> dict:
        """Block directory of one blob (header-only decode, cached) —
        per-block last_doc / max_tf / payload offsets (codec v4)."""
        m = self._meta.get(idx)
        if m is None:
            from ..codec import read_blob_meta

            m = read_blob_meta(self.blob(idx))
            self._meta[idx] = m
        return m

    def term_meta(self, term: str) -> tuple[int, int, int] | None:
        """(df, ctf, max_tf) from the term DICTIONARY alone — the
        MaxScore upper-bound inputs, no blob decode."""
        rng = self.term_range(term)
        if rng is None:
            return None
        lo, hi = rng
        return (
            int(self.df[lo:hi].sum()),
            int(self.ctf[lo:hi].sum()),
            int(self.max_tf[lo:hi].max()),
        )

    def postings_for_docs(
        self, lo: int, hi: int, docs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) restricted to the skip blocks whose doc-id range
        intersects ``docs`` (sorted) — the v4 selective-decode path. May
        return a superset of ``docs``∩postings (whole blocks); scorers
        intersect. Falls back to an already-cached full decode."""
        from ..codec import decode_posting_blocks

        out_d, out_t = [], []
        for idx in range(lo, hi):
            hit = self._decoded.get(idx)
            if hit is not None:
                out_d.append(hit[0])
                out_t.append(hit[1])
                continue
            m = self.blob_meta(idx)
            if m["df"] == 0:
                continue
            sel = np.unique(np.searchsorted(m["last_docs"], docs))
            sel = sel[sel < len(m["last_docs"])]
            if sel.size == 0:
                continue
            if sel.size * 4 >= len(m["last_docs"]):
                # dense candidate set: one vectorized full decode (cached
                # for later terms/iterations) beats a per-block loop
                hit = self.postings_decoded(idx, with_positions=False)
                out_d.append(hit[0])
                out_t.append(hit[1])
                continue
            d, t = decode_posting_blocks(self.blob(idx), sel, m)
            out_d.append(d)
            out_t.append(t)
        if not out_d:
            z = np.empty(0, np.int64)
            return z, z.copy()
        if len(out_d) == 1:
            return out_d[0], out_t[0]
        return np.concatenate(out_d), np.concatenate(out_t)

    def postings_blocks_bounded(
        self, lo: int, hi: int, min_tf: int
    ) -> tuple[np.ndarray, np.ndarray, int, int]:
        """(doc_ids, tfs, blocks_decoded, blocks_total) decoding ONLY the
        skip blocks whose per-block ``max_tf`` ≥ ``min_tf`` — the
        block-max WAND lever: a driving term's candidate generation skips
        every block whose best-possible BM25 contribution cannot reach
        the current top-k threshold (the caller translates its score
        threshold into ``min_tf``; tf→score is monotone). An
        already-cached full decode is reused as-is (no new decode
        cost)."""
        from ..codec import decode_posting_blocks

        out_d, out_t = [], []
        dec = tot = 0
        for idx in range(lo, hi):
            m = self.blob_meta(idx)
            nb = len(m["last_docs"])
            tot += nb
            hit = self._decoded.get(idx)
            if hit is not None:
                out_d.append(hit[0])
                out_t.append(hit[1])
                dec += nb
                continue
            sel = np.nonzero(m["max_tfs"] >= min_tf)[0]
            dec += int(sel.size)
            if sel.size == 0:
                continue
            if sel.size == nb:
                h = self.postings_decoded(idx)
                out_d.append(h[0])
                out_t.append(h[1])
                continue
            d, t = decode_posting_blocks(self.blob(idx), sel, m)
            out_d.append(d)
            out_t.append(t)
        if not out_d:
            z = np.empty(0, np.int64)
            return z, z.copy(), dec, tot
        if len(out_d) == 1:
            return out_d[0], out_t[0], dec, tot
        return np.concatenate(out_d), np.concatenate(out_t), dec, tot

    def find(self, term: str) -> int | None:
        """First chunk row of the term (None if absent)."""
        r = self.term_range(term)
        return r[0] if r else None

    def blob(self, idx: int) -> bytes:
        o, s = int(self.offset[idx]), int(self.size[idx])
        return bytes(self.postings[o : o + s])

    def prefix_range(self, prefix: str) -> tuple[int, int]:
        """Index range [lo, hi) of terms starting with ``prefix`` — the
        sorted dictionary gives prefix enumeration like the reference's
        ``seek_list.keys(prefix)`` (``SearchEngine.py:210``)."""
        lo = int(np.searchsorted(self.terms, prefix))
        hi = int(np.searchsorted(self.terms, prefix + "\U0010ffff"))
        return lo, hi
