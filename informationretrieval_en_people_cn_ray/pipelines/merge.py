"""Incremental index extension: generational builds + segment merge.

The reference rebuilds its index from scratch for any corpus change
(``IndexCreator.py`` has no incremental path); real engines at 10^12-file
scale cannot. This module adds the Lucene-style maintenance story on top
of the existing build:

1. ``extend_index(parent, delta_corpus, ...)`` — tokenize ONLY the new
   documents into a *delta generation* (a complete, standalone index
   whose layout doc_ids start at parent_max_doc_id + 1 via
   ``BuildConfig.doc_id_base``), then
2. ``merge_indexes([parent, delta], out)`` — combine N generations into
   one standard index directory that every existing query path reads
   unchanged.

The merge moves BYTES, never postings: generation doc-id ranges are
disjoint and ascending, each posting blob is self-contained
(delta-encoding restarts per blob), and the term dictionary already
supports multiple chunk rows per term (giant-term chunking,
``stages/segments.py``) — so segment k of the merged index is the
concatenation of every generation's ``postings.bin`` for segment k plus
a re-sorted dictionary whose offsets are shifted by the preceding
generations' byte lengths and whose chunk ordinals are renumbered. Zero
decode, zero re-encode, no shuffle: one task per segment, each reading
only its own segment's files — embarrassingly parallel at any segment
count. Docstat partitions are copied through with renumbered partition
ids (ranges stay globally sorted because generation id ranges ascend).

Resume follows the build's per-partition contract: every output segment
/ docstat partition commits write-then-rename with a manifest carrying
the merge fingerprint LAST, so a killed merge re-runs only the
uncommitted partitions; a finished merge short-circuits on
``collection.json``.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..datactx import unreserved
from ..state.manifest import (
    fingerprint,
    load_json,
    partition_complete,
    sweep_stale_tmp,
    unique_tmp,
    write_bytes_atomic,
    write_json_atomic,
    write_parquet_atomic,
)
from ..stages.segments import (
    EMPTY_TERMS_SCHEMA,
    SUMMARY_SCHEMA,
    docstat_dir,
    seg_dir,
)
from .build import BuildConfig, build_index


def _collection(index_dir: str) -> dict:
    man = load_json(os.path.join(index_dir, "collection.json"))
    if not man:
        raise FileNotFoundError(f"no collection.json under {index_dir}")
    return man


def _docstat_parts(index_dir: str) -> list[str]:
    root = os.path.join(index_dir, "docstats")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("part=")
    )


def _docstat_bounds(index_dir: str) -> tuple[int, int] | None:
    """(min, max) doc_id of an index from parquet row-group statistics —
    no data read; used to verify generation ranges are disjoint.

    Row groups with 0 rows carry no statistics (a compaction that
    tombstones every doc in a partition writes a 0-row docstats file) —
    skip them; only a NON-empty row group without stats is an error.
    Returns ``None`` for an index with zero live docs (range-less)."""
    parts = _docstat_parts(index_dir)
    if not parts:
        raise ValueError(f"no docstat partitions under {index_dir}")
    lo, hi = None, None
    for p in parts:
        md = pq.ParquetFile(os.path.join(p, "docstats.parquet")).metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            if rgm.num_rows == 0:
                continue
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                if col.path_in_schema != "doc_id":
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    raise ValueError(f"docstats without stats under {p}")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi)


def max_doc_id(index_dir: str) -> int:
    """Max live doc_id; -1 for an index whose docs were all deleted and
    compacted away (the next layout-assigned id is then 0 — safe: the
    compaction already applied and cleared every tombstone)."""
    b = _docstat_bounds(index_dir)
    return -1 if b is None else b[1]


# the output dictionary schema IS the segment dictionary schema —
# one definition (stages/segments.py) so a schema change can't drift
_EMPTY_DICT_TABLE = EMPTY_TERMS_SCHEMA.empty_table()


def _finalize_dictionary(tabs: list[pa.Table]):
    """Merge per-generation dictionary rows (each carrying a ``gen``
    column) into the output dictionary: stable order (term asc, then
    generation — older doc ids first, readers concatenate chunks in row
    order — then the generation's own chunk ordinal), chunk ordinals
    renumbered 0..k within each term. Returns
    (table, n_distinct, n_posting_entries, tokens)."""
    if not tabs:
        return _EMPTY_DICT_TABLE, 0, 0, 0
    allt = pa.concat_tables(tabs).combine_chunks()
    terms = np.asarray(allt["term"].to_pylist(), dtype=object)
    gen = allt["gen"].to_numpy()
    chunk = allt["chunk"].to_numpy()
    order = np.lexsort((chunk, gen, terms))
    allt = allt.take(pa.array(order)).drop_columns(["gen"])
    terms = terms[order]
    tb = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]]).astype(np.int64)
    seq = np.arange(len(terms), dtype=np.int64)
    new_chunk = seq - np.repeat(seq[tb], np.diff(np.r_[tb, len(terms)]))
    allt = allt.set_column(
        allt.schema.get_field_index("chunk"),
        "chunk",
        pa.array(new_chunk.astype(np.int32), pa.int32()),
    )
    return (
        allt,
        int(len(tb)),
        int(allt["df"].to_numpy().sum()),
        int(allt["ctf"].to_numpy().sum()),
    )


class _MergeSegment:
    """map_batches body: one batch row = one segment ordinal to merge.

    Two gather paths feeding one shared finalize: with no tombstones the
    merge is pure byte concatenation; with tombstones it becomes a
    COMPACTION — tombstoned generations decode → drop deleted docs →
    re-encode in fresh ``max_blob_docs`` chunks (terms whose postings
    empty out leave the dictionary), while generations WITHOUT
    tombstones still byte-copy, so compaction cost is proportional to
    the deleted generations' size, not the corpus. Physical blob order
    in the output bin is arbitrary — readers follow the dictionary rows,
    which ``_finalize_dictionary`` keeps in doc-id order. Tombstone
    arrays ship once in the task closure; at a tombstone volume where
    that matters, compact more often."""

    def __init__(
        self,
        parents: list[str],
        out_dir: str,
        merge_fp: str,
        tombs: list[np.ndarray] | None = None,
        max_blob_docs: int = 1_000_000,
        store_positions: bool = True,
    ):
        self.parents = parents
        self.out_dir = out_dir
        self.merge_fp = merge_fp
        self.tombs = tombs or [np.empty(0, np.int64) for _ in parents]
        self.max_blob_docs = max_blob_docs
        self.store_positions = store_positions

    def __call__(self, batch: dict) -> pa.Table:
        out = [self._merge_one(int(s)) for s in batch["seg"]]
        return pa.concat_tables(out)

    def _copy_gen(self, gi: int, seg: int, out, base: int):
        """Byte-copy one generation's segment into ``out``; returns
        (dictionary rows with shifted offsets + gen column, bytes)."""
        import shutil

        sd = seg_dir(self.parents[gi], seg)
        tp = os.path.join(sd, "terms.parquet")
        if not os.path.exists(tp):
            return None, 0  # pre-backfill index with an empty segment
        t = pq.read_table(tp)
        if "max_tf" not in t.column_names:
            # legacy dictionary (pre-max_tf): backfill the sound ctf
            # bound (tf in any one doc never exceeds the collection tf)
            # so concat with current-schema generations works and the
            # merged index's pruned scorer stays admissible
            t = t.add_column(
                t.schema.get_field_index("offset"),
                "max_tf",
                pa.array(t["ctf"].to_numpy(), pa.int64()),
            )
        pb = os.path.join(sd, "postings.bin")
        n = 0
        if os.path.exists(pb):
            with open(pb, "rb") as src:
                shutil.copyfileobj(src, out, 1 << 20)
            n = os.path.getsize(pb)
        if not t.num_rows:
            return None, n
        off = t["offset"].to_numpy() + base
        t = t.set_column(
            t.schema.get_field_index("offset"),
            "offset",
            pa.array(off, pa.int64()),
        ).append_column("gen", pa.array([gi] * t.num_rows, pa.int32()))
        return t, n

    def _rewrite_gen(self, gi: int, seg: int, out, base: int):
        """Decode one TOMBSTONED generation's segment, drop deleted docs,
        re-encode; returns (dictionary row tables, bytes written)."""
        from ..codec import (
            decode_posting_blob,
            encode_posting_blob,
            encode_positions,
        )
        from ..state.tombstones import filter_postings

        sd = seg_dir(self.parents[gi], seg)
        tp = os.path.join(sd, "terms.parquet")
        if not os.path.exists(tp):
            return [], 0
        t = pq.read_table(tp)
        pb = os.path.join(sd, "postings.bin")
        bin_ = (
            np.memmap(pb, dtype=np.uint8, mode="r")
            if os.path.exists(pb) and os.path.getsize(pb)
            else np.empty(0, np.uint8)
        )
        terms = t["term"].to_pylist()
        offs = t["offset"].to_numpy()
        sizes = t["size"].to_numpy()
        # columnar accumulators → ONE table per generation (a per-chunk
        # single-row pa.table would allocate N tiny tables for an
        # N-term segment and dominate compaction time)
        o_term: list[str] = []
        o_chunk: list[int] = []
        o_df: list[int] = []
        o_ctf: list[int] = []
        o_maxtf: list[int] = []
        o_off: list[int] = []
        o_size: list[int] = []
        offset = base
        i, n_rows = 0, t.num_rows
        while i < n_rows:
            j = i
            term = terms[i]
            while j < n_rows and terms[j] == term:
                j += 1
            ds_, tfs_, pos_ = [], [], []
            for r in range(i, j):
                blob = bytes(
                    bin_[int(offs[r]) : int(offs[r]) + int(sizes[r])]
                )
                dd, tt, pp, ss = decode_posting_blob(
                    blob, with_positions=self.store_positions
                )
                dd, tt, pp, ss = filter_postings(self.tombs[gi], dd, tt, pp)
                if len(dd):
                    ds_.append(dd)
                    tfs_.append(tt)
                    if self.store_positions:
                        pos_.append(pp)
            i = j
            if not ds_:
                continue  # term fully deleted in this generation
            doc_ids = np.concatenate(ds_)
            tfs = np.concatenate(tfs_)
            pos = (
                np.concatenate(pos_)
                if self.store_positions
                else np.empty(0, np.int64)
            )
            pos_ends = np.zeros(len(doc_ids) + 1, np.int64)
            np.cumsum(tfs, out=pos_ends[1:])
            step = self.max_blob_docs
            for ci, c0 in enumerate(range(0, len(doc_ids), step)):
                c1 = min(c0 + step, len(doc_ids))
                cd, ct = doc_ids[c0:c1], tfs[c0:c1]
                if self.store_positions:
                    cp = pos[pos_ends[c0] : pos_ends[c1]]
                    starts = pos_ends[c0:c1] - pos_ends[c0]
                    pbytes = encode_positions(cp, starts)
                else:
                    pbytes = b""
                blob = encode_posting_blob(cd, ct, pbytes)
                out.write(blob)
                o_term.append(term)
                o_chunk.append(ci)
                o_df.append(len(cd))
                o_ctf.append(int(ct.sum()))
                o_maxtf.append(int(ct.max()) if len(ct) else 0)
                o_off.append(offset)
                o_size.append(len(blob))
                offset += len(blob)
        if not o_term:
            return [], offset - base
        tab = pa.table(
            {
                "term": pa.array(o_term, pa.string()),
                "chunk": pa.array(o_chunk, pa.int32()),
                "df": pa.array(o_df, pa.int64()),
                "ctf": pa.array(o_ctf, pa.int64()),
                "max_tf": pa.array(o_maxtf, pa.int64()),
                "offset": pa.array(o_off, pa.int64()),
                "size": pa.array(o_size, pa.int64()),
                "gen": pa.array([gi] * len(o_term), pa.int32()),
            }
        )
        return [tab], offset - base

    def _merge_one(self, seg: int) -> pa.Table:
        t0 = time.monotonic()
        d = seg_dir(self.out_dir, seg)
        if partition_complete(d, self.merge_fp):
            m = load_json(os.path.join(d, "manifest.json"))
            return self._summary(
                seg, m["n_terms"], m["n_docs"], m["tokens"], m["bytes"],
                d, True, t0,
            )
        compacting = any(t.size for t in self.tombs)
        os.makedirs(d, exist_ok=True)
        sweep_stale_tmp(d)  # reclaim orphans from a killed prior merge
        tmp_bin = unique_tmp(os.path.join(d, "postings.bin"))
        tabs: list[pa.Table] = []
        offset = 0
        with open(tmp_bin, "wb") as out:
            # untombed generations byte-copy (both modes) ...
            for gi in range(len(self.parents)):
                if self.tombs[gi].size:
                    continue
                t, n = self._copy_gen(gi, seg, out, offset)
                if t is not None:
                    tabs.append(t)
                offset += n
            # ... tombstoned generations decode → filter → re-encode
            for gi in range(len(self.parents)):
                if not self.tombs[gi].size:
                    continue
                gt, n = self._rewrite_gen(gi, seg, out, offset)
                tabs.extend(gt)
                offset += n
        allt, n_distinct, n_postings, tokens = _finalize_dictionary(tabs)
        os.replace(tmp_bin, os.path.join(d, "postings.bin"))
        write_parquet_atomic(os.path.join(d, "terms.parquet"), allt)
        write_json_atomic(
            os.path.join(d, "manifest.json"),
            {
                "kind": "postings",
                "seg": seg,
                "n_terms": n_distinct,
                "n_chunks": allt.num_rows,
                "n_docs": n_postings,
                "tokens": tokens,
                "bytes": offset,
                "merged_from": [seg_dir(p, seg) for p in self.parents],
                "compacted": compacting,
                "build_fingerprint": self.merge_fp,
                "wall_s": round(time.monotonic() - t0, 3),
            },
        )
        return self._summary(
            seg, n_distinct, n_postings, tokens, offset, d, False, t0
        )

    def _summary(self, seg, n_terms, n_docs, tokens, nbytes, path, skipped, t0):
        return pa.table(
            {
                "seg": pa.array([seg], pa.int32()),
                "kind": pa.array(["postings"], pa.string()),
                "n_terms": pa.array([n_terms], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "tokens": pa.array([tokens], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "path": pa.array([path], pa.string()),
                "skipped": pa.array([skipped], pa.bool_()),
            },
            schema=SUMMARY_SCHEMA,
        )


class _CopyDocstats:
    """map_batches body: one batch row = one (src part dir, dst part id).
    With tombstones on the source generation, the copy becomes a filter:
    deleted rows drop and the partition's counts recompute."""

    def __init__(
        self,
        out_dir: str,
        merge_fp: str,
        tombs_by_gen: dict[int, np.ndarray] | None = None,
    ):
        self.out_dir = out_dir
        self.merge_fp = merge_fp
        self.tombs_by_gen = tombs_by_gen or {}

    def __call__(self, batch: dict) -> pa.Table:
        rows = []
        for src, part, gen in zip(batch["src"], batch["part"], batch["gen"]):
            rows.append(self._copy_one(str(src), int(part), int(gen)))
        return pa.concat_tables(rows)

    def _copy_one(self, src: str, part: int, gen: int) -> pa.Table:
        t0 = time.monotonic()
        d = docstat_dir(self.out_dir, part)
        if partition_complete(d, self.merge_fp):
            m = load_json(os.path.join(d, "manifest.json"))
            return self._summary(part, m["n_docs"], m["tokens"], m["bytes"], d, True)
        sweep_stale_tmp(d)
        src_man = load_json(os.path.join(src, "manifest.json")) or {}
        tomb = self.tombs_by_gen.get(gen, np.empty(0, np.int64))
        src_pq = os.path.join(src, "docstats.parquet")
        if tomb.size:
            from ..state.tombstones import in_sorted

            t = pq.read_table(src_pq)
            ids = t["doc_id"].to_numpy()
            t = t.filter(pa.array(~in_sorted(tomb, ids)))
            dst = os.path.join(d, "docstats.parquet")
            write_parquet_atomic(dst, t)
            n_docs = t.num_rows
            tokens = int(t["doc_len"].to_numpy().sum()) if t.num_rows else 0
            # on-disk size, matching the plain-copy branch's accounting
            nbytes = os.path.getsize(dst)
        else:
            if "n_docs" not in src_man or "tokens" not in src_man:
                # a silent 0 here would understate num_docs/avgdl in the
                # merged collection manifest and mis-score every query
                raise ValueError(
                    f"source docstat partition {src} has no usable "
                    "manifest — corrupt or incomplete generation"
                )
            raw = open(src_pq, "rb").read()
            write_bytes_atomic(os.path.join(d, "docstats.parquet"), raw)
            n_docs = src_man["n_docs"]
            tokens = src_man["tokens"]
            nbytes = len(raw)
        write_json_atomic(
            os.path.join(d, "manifest.json"),
            {
                "kind": "docstats",
                "part": part,
                "n_terms": 0,
                "n_docs": n_docs,
                "tokens": tokens,
                "bytes": nbytes,
                "merged_from": [src],
                "build_fingerprint": self.merge_fp,
                "wall_s": round(time.monotonic() - t0, 3),
            },
        )
        return self._summary(part, n_docs, tokens, nbytes, d, False)

    def _summary(self, part, n_docs, tokens, nbytes, path, skipped):
        return pa.table(
            {
                "seg": pa.array([part], pa.int32()),
                "kind": pa.array(["docstats"], pa.string()),
                "n_terms": pa.array([0], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "tokens": pa.array([tokens], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "path": pa.array([path], pa.string()),
                "skipped": pa.array([skipped], pa.bool_()),
            },
            schema=SUMMARY_SCHEMA,
        )


@unreserved
def merge_indexes(parents: list[str], out_dir: str) -> dict:
    """Merge N generation indexes (ascending doc-id ranges) into one
    standard index at ``out_dir``; returns its collection manifest.
    Resumable; a completed merge short-circuits."""
    if len(parents) < 1:
        raise ValueError("merge_indexes needs at least one index")
    mans = [_collection(p) for p in parents]
    cfg0 = mans[0].get("config", {})
    for m in mans[1:]:
        c = m.get("config", {})
        for key in ("num_segments", "stem", "store_positions"):
            if c.get(key) != cfg0.get(key):
                raise ValueError(
                    f"generation configs disagree on {key}: "
                    f"{c.get(key)!r} vs {cfg0.get(key)!r}"
                )
    # empty generations (all docs compacted away) have no range to check
    bounds = [b for b in (_docstat_bounds(p) for p in parents) if b]
    for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
        if b_lo <= a_hi:
            raise ValueError(
                f"generation doc-id ranges overlap or are out of order: "
                f"[{a_lo},{a_hi}] then [{b_lo},{b_hi}] — build the delta "
                "with doc_id_base > parent max_doc_id"
            )
    from ..state.tombstones import load_tombstones, tombstone_fingerprint

    tombs = [load_tombstones(p) for p in parents]
    merge_fp = fingerprint(
        {
            "parents": [m["build_fingerprint"] for m in mans],
            "tombstones": [tombstone_fingerprint(p) for p in parents],
            "op": "merge_indexes",
            "format_version": 4,
        }
    )
    coll_path = os.path.join(out_dir, "collection.json")
    existing = load_json(coll_path)
    if existing and existing.get("build_fingerprint") == merge_fp:
        return existing

    t0 = time.monotonic()
    num_segments = cfg0["num_segments"]
    seg_rows = ray.data.from_items(
        [{"seg": s} for s in range(num_segments)]
    ).map_batches(
        _MergeSegment(
            list(parents), out_dir, merge_fp,
            tombs=tombs,
            max_blob_docs=cfg0.get("max_blob_docs", 1_000_000),
            store_positions=cfg0.get("store_positions", True),
        ),
        batch_size=1,
        batch_format="numpy",
        num_cpus=1,
    )
    # docstat partitions renumbered across generations in order — ranges
    # ascend generation by generation, so part order == doc-id order
    copies = []
    part = 0
    for gi, p in enumerate(parents):
        for src in _docstat_parts(p):
            copies.append({"src": src, "part": part, "gen": gi})
            part += 1
    # stale partitions from an earlier (different-shape) merge into the
    # same out_dir must not survive: readers glob docstats/part=* and
    # seg=* without fingerprint checks, so a leftover part beyond the
    # new count would serve duplicate/overlapping doc stats
    import glob as _glob
    import shutil as _shutil

    for d in _glob.glob(os.path.join(out_dir, "docstats", "part=*")):
        try:
            i = int(os.path.basename(d).split("=")[1])
        except (IndexError, ValueError):
            continue
        if i >= len(copies):
            _shutil.rmtree(d, ignore_errors=True)
    for d in _glob.glob(os.path.join(out_dir, "seg=*")):
        try:
            i = int(os.path.basename(d).split("=")[1])
        except (IndexError, ValueError):
            continue
        if i >= num_segments:
            _shutil.rmtree(d, ignore_errors=True)
    stat_rows = ray.data.from_items(copies).map_batches(
        _CopyDocstats(
            out_dir, merge_fp,
            tombs_by_gen={
                gi: t for gi, t in enumerate(tombs) if t.size
            },
        ),
        batch_size=1,
        batch_format="numpy",
        num_cpus=1,
    )
    rows = seg_rows.union(stat_rows).take_all()  # tiny: one per partition

    post = [r for r in rows if r["kind"] == "postings"]
    stats = [r for r in rows if r["kind"] == "docstats"]
    n_docs = sum(r["n_docs"] for r in stats)
    total_tokens = sum(r["tokens"] for r in stats)
    cfg = dict(cfg0)
    cfg["doc_id_base"] = 0
    manifest = {
        "build_fingerprint": merge_fp,
        "corpus": [m.get("corpus") for m in mans],
        "merged_from": [
            {"dir": p, "build_fingerprint": m["build_fingerprint"]}
            for p, m in zip(parents, mans)
        ],
        "config": cfg,
        "num_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "num_segments": num_segments,
        "docstat_partitions": len(copies),
        "n_terms": sum(r["n_terms"] for r in post),
        "postings_bytes": sum(r["bytes"] for r in post),
        "n_posting_entries": sum(r["n_docs"] for r in post),
        "wall_s": round(time.monotonic() - t0, 3),
        "partitions": [
            {
                k: r[k]
                for k in (
                    "seg", "kind", "n_terms", "n_docs", "tokens", "bytes",
                    "skipped",
                )
            }
            for r in sorted(rows, key=lambda r: (r["kind"], int(r["seg"])))
        ],
    }
    expected = sum(m["num_docs"] for m in mans)
    if any(t.size for t in tombs):
        # deletes drop rows; exact expectation needs per-generation
        # presence counts — bound-check instead
        if n_docs > expected or n_docs < expected - sum(
            t.size for t in tombs
        ):
            raise RuntimeError(
                f"merged docstat rows {n_docs} outside "
                f"[{expected - sum(t.size for t in tombs)}, {expected}]"
            )
    elif n_docs != expected:
        raise RuntimeError(
            f"merged docstat rows {n_docs} != sum of generations {expected}"
        )
    write_json_atomic(coll_path, manifest)
    return manifest


def extend_index(
    parent_dir: str,
    delta_corpus: str,
    delta_dir: str,
    out_dir: str,
    config: BuildConfig | None = None,
) -> dict:
    """Incrementally add ``delta_corpus`` to the index at ``parent_dir``:
    build a delta generation under ``delta_dir`` (tokenizes ONLY the new
    documents; layout doc_ids start above every parent id), then merge
    both generations into ``out_dir``. Returns the merged manifest.

    The parent must have been built with layout-assigned doc_ids
    (``doc_id_column=None`` semantics — an explicit id column makes
    "next free id" the caller's contract, not ours)."""
    gens = extend_generation(parent_dir, delta_corpus, delta_dir, config)
    return merge_indexes(gens, out_dir)


def extend_generation(
    parent_dirs: list[str] | str,
    delta_corpus: str,
    delta_dir: str,
    config: BuildConfig | None = None,
) -> list[str]:
    """Append a new generation WITHOUT merging (the Lucene tiered-merge
    pattern): tokenize only ``delta_corpus`` into ``delta_dir`` with
    layout doc_ids above every existing generation's, and return the new
    generation list — immediately searchable via
    ``SearchEngine(generation_list)`` (GenerationalSegments). Call
    ``merge_indexes(generation_list, out)`` whenever the generation
    count crosses the serving policy's threshold; until then each extend
    costs only the delta build (no byte copy of the existing index)."""
    from dataclasses import replace

    parents = (
        [parent_dirs] if isinstance(parent_dirs, str) else list(parent_dirs)
    )
    base = max(max_doc_id(p) for p in parents) + 1
    pcfg = dict(_collection(parents[0]).get("config", {}))
    if config is None:
        pcfg.pop("doc_id_base", None)
        pcfg.pop("doc_id_column", None)
        config = BuildConfig(**{
            k: v for k, v in pcfg.items() if k in BuildConfig.__annotations__
        })
    # never mutate the caller's config object
    config = replace(config, doc_id_base=base, doc_id_column=None)
    build_index(delta_corpus, delta_dir, config)
    return parents + [delta_dir]


def maybe_compact(
    generation_dirs: list[str],
    out_dir: str,
    max_generations: int = 4,
) -> tuple[list[str], bool]:
    """Tiered-merge POLICY step: compact the generation list into
    ``out_dir`` once it reaches ``max_generations``, else leave it
    untouched. Returns (serving list, compacted?) — the serving list is
    either the input generations or ``[out_dir]``. Each append between
    compactions costs only its delta build; the compaction itself is the
    byte-level ``merge_indexes`` (decode-free unless tombstones force
    filtering), so the amortized write cost per document stays
    O(log-ish) like Lucene's tiered policy."""
    if len(generation_dirs) < max_generations:
        return list(generation_dirs), False
    merge_indexes(list(generation_dirs), out_dir)
    return [out_dir], True
