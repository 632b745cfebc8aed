"""Tokenize + per-batch partial posting combine (the map side of the build).

One ``map_batches`` actor-pool stage fuses what the reference does in
``process_comments_file`` + ``write_comments_to_temp_file``
(``IndexCreator.py:23-133``): tokenize, stem, positional term extraction,
per-chunk posting aggregation, doc-length accounting — except the output
is partial-run Arrow rows headed into the shuffle, not sorted temp files.

Pre-aggregating here is the classic partial/final combine (SURVEY.md §2.5
A1): a hot term like ``the`` contributes at most ONE row per upstream
batch to the shuffle, no matter how many documents contain it — this plus
segment-hash partitioning is the first line of skew defense.

Doc statistics ride the same shuffle as pseudo-term rows
(``DOCSTATS_TERM``) routed to dedicated docstat partitions by doc-id
range, so the build stays a single pass over the corpus (the reference
reads the corpus once too, but then merges doc-stat pickles on the
driver, ``IndexCreator.py:229-244`` — O(corpus) driver memory we don't
replicate).

The per-row ``content_sha256`` invariant (BASELINE.json input_hint) is
verified here, where the content bytes are already in cache; any mismatch
fails the task (and therefore the build) with the offending doc_ids.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..codec import delta_encode, encode_varints_with_lengths
from ..text import Analyzer
from .postings import _exclusive_cumsum, term_seg_array

DOCSTATS_TERM = "\x00docstats"

PARTIAL_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("seg", pa.int32()),
        ("doc_ids", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int32())),
        ("pos_bytes", pa.binary()),
        ("pos_lens", pa.list_(pa.int32())),
    ]
)


class TokenizePartial:
    """Callable class → Ray actor pool; Analyzer + stem cache built once
    per actor (SURVEY.md §2.3 ST1)."""

    def __init__(
        self,
        num_segments: int,
        docstat_partitions: int,
        total_docs: int,
        stem: bool = True,
        store_positions: bool = True,
        verify_sha: bool = True,
        content_column: str = "content",
    ):
        self.num_segments = num_segments
        self.docstat_partitions = docstat_partitions
        self.total_docs = max(1, total_docs)
        self.store_positions = store_positions
        self.verify_sha = verify_sha
        self.content_column = content_column
        self.az = Analyzer(stem=stem)
        from . import limit_worker_threads

        limit_worker_threads()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        if self.verify_sha and "content_sha256" in batch.column_names:
            contents = batch[self.content_column].to_pylist()
            expected = batch["content_sha256"].to_pylist()
            bad = [
                int(d)
                for d, c, e in zip(doc_ids, contents, expected)
                if hashlib.sha256(c.encode()).hexdigest() != e
            ]
            if bad:
                raise ValueError(
                    f"content sha256 invariant violated for doc_ids {bad[:10]}"
                    + ("..." if len(bad) > 10 else "")
                )

        # --- vectorized analysis -------------------------------------
        # Per-batch pipeline: batch_token_codes (the shared tokenize →
        # dictionary-encode → integer-codes intermediate, byte-identical
        # to text.tokenize — fuzz-gated), then stem + filter only the
        # UNIQUE tokens (vocabulary-sized, cached per actor), then one
        # lexsort + one varint encode for the whole batch. Positions
        # index the FULL token stream even for filtered tokens
        # (SURVEY.md §7.4 R6).
        from ..text import batch_token_codes

        doc_lens, doc_idx, codes, uniq = batch_token_codes(
            batch[self.content_column]
        )
        total = int(doc_lens.sum())
        doc_ids = np.asarray(doc_ids, dtype=np.int64)

        # unique token -> index term id (or -1 when filtered)
        term_of: dict[str, int] = {}
        terms_list: list[str] = []
        code_to_tid = np.empty(len(uniq), dtype=np.int32)
        az_term = self.az.term
        from ..text import MAX_STEM_LEN, MIN_STEM_LEN

        for u_i, u in enumerate(uniq):
            t = az_term(u)
            if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN:
                tid = term_of.get(t)
                if tid is None:
                    tid = len(terms_list)
                    term_of[t] = tid
                    terms_list.append(t)
                code_to_tid[u_i] = tid
            else:
                code_to_tid[u_i] = -1

        doc_starts = _exclusive_cumsum(doc_lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            doc_starts, doc_lens
        )
        tcode = code_to_tid[codes] if total else codes
        keep = tcode >= 0
        t2, d2, p2 = tcode[keep], doc_idx[keep], pos[keep]
        # stable sort by (term, doc); equal keys keep ascending positions
        order = np.lexsort((d2, t2))
        ts, ds, ps_ = t2[order], d2[order], p2[order]

        # (term, doc) run boundaries → per-run tf; term boundaries → rows
        if len(ts):
            rb = np.flatnonzero(
                np.r_[True, (ts[1:] != ts[:-1]) | (ds[1:] != ds[:-1])]
            )
            run_tf = np.diff(np.r_[rb, len(ts)]).astype(np.int32)
            run_term = ts[rb]
            run_doc_global = doc_ids[ds[rb].astype(np.int64)]
            tb = np.flatnonzero(np.r_[True, run_term[1:] != run_term[:-1]])
            row_term_ids = run_term[tb]
            row_offsets = np.r_[tb, len(rb)].astype(np.int32)
        else:
            rb = np.empty(0, np.int64)
            run_tf = np.empty(0, np.int32)
            run_doc_global = np.empty(0, np.int64)
            row_term_ids = np.empty(0, np.int64)
            row_offsets = np.zeros(1, np.int32)

        terms_out = [terms_list[int(t)] for t in row_term_ids]
        n_rows = len(terms_out)
        off_arr = pa.array(row_offsets, pa.int32())
        col_doc_ids = pa.ListArray.from_arrays(
            off_arr, pa.array(run_doc_global, pa.int64())
        )
        col_tfs = pa.ListArray.from_arrays(
            off_arr, pa.array(run_tf, pa.int32())
        )

        if self.store_positions and len(ts):
            gaps = delta_encode(ps_, rb)
            all_bytes, vlens = encode_varints_with_lengths(gaps)
            run_byte_lens = np.add.reduceat(vlens, rb).astype(np.int32)
            run_byte_off = np.zeros(len(rb) + 1, dtype=np.int64)
            np.cumsum(run_byte_lens, out=run_byte_off[1:])
            term_byte_off = run_byte_off[row_offsets.astype(np.int64)]
            mv = memoryview(all_bytes)
            col_pos_bytes = pa.array(
                [
                    mv[term_byte_off[i] : term_byte_off[i + 1]]
                    for i in range(n_rows)
                ],
                pa.binary(),
            )
            col_pos_lens = pa.ListArray.from_arrays(
                off_arr, pa.array(run_byte_lens, pa.int32())
            )
        else:
            col_pos_bytes = pa.array([b""] * n_rows, pa.binary())
            col_pos_lens = pa.ListArray.from_arrays(
                off_arr, pa.array(np.zeros(len(rb), np.int32), pa.int32())
            )

        seg = term_seg_array(terms_out, self.num_segments)
        main = pa.table(
            {
                "term": pa.array(terms_out, pa.string()),
                "seg": pa.array(seg, pa.int32()),
                "doc_ids": col_doc_ids,
                "tfs": col_tfs,
                "pos_bytes": col_pos_bytes,
                "pos_lens": col_pos_lens,
            }
        )

        # docstat pseudo-rows, routed by doc-id range partition
        part = (doc_ids * self.docstat_partitions) // self.total_docs
        part = np.clip(part, 0, self.docstat_partitions - 1)
        ds_terms, ds_seg = [], []
        ds_docs, ds_lens_col, ds_bytes, ds_plens = [], [], [], []
        for p in np.unique(part):
            mask = part == p
            ds_terms.append(DOCSTATS_TERM)
            ds_seg.append(self.num_segments + int(p))
            ds_docs.append(doc_ids[mask])
            ds_lens_col.append(doc_lens[mask].astype(np.int32))
            ds_bytes.append(b"")
            # zero-length position slice per doc, so these rows flow
            # through the generic run-merge (salted pre-merge) unchanged
            ds_plens.append(np.zeros(int(mask.sum()), np.int32))
        stats = pa.table(
            {
                "term": pa.array(ds_terms, pa.string()),
                "seg": pa.array(ds_seg, pa.int32()),
                "doc_ids": pa.array(
                    [x.tolist() for x in ds_docs], pa.list_(pa.int64())
                ),
                "tfs": pa.array(
                    [x.tolist() for x in ds_lens_col], pa.list_(pa.int32())
                ),
                "pos_bytes": pa.array(ds_bytes, pa.binary()),
                "pos_lens": pa.array(
                    [x.tolist() for x in ds_plens], pa.list_(pa.int32())
                ),
            }
        )
        return pa.concat_tables([main, stats]).combine_chunks()


class TokenizeFragments(TokenizePartial):
    """Fragment-driven variant: each batch is ONE row-group descriptor
    (from sources.corpus_source.fragment_plan); the actor reads the row
    group itself and tokenizes it.

    Why: a separate read stage upstream of a batching tokenize stage gets
    FUSED by Ray Data into one operator whose batch size is counted in
    *descriptor* rows — a 160-fragment corpus then collapses into a single
    task and the whole build serializes. Fusing read+tokenize explicitly,
    one task per row group, keeps the intended parallelism (and saves one
    serialization of the raw content through the object store). Units of
    work = row groups, so parallelism is identical at every num_cpus
    (SURVEY.md §7.4 R4)."""

    def __init__(self, *, columns, doc_id_column=None, **kw):
        super().__init__(**kw)
        from ..sources.corpus_source import _ReadFragment

        self.reader = _ReadFragment(columns, doc_id_column)

    def __call__(self, batch: dict) -> pa.Table:
        return super().__call__(self.reader(batch))


_PROCESS_CACHE: dict = {}


def tokenize_fragment_batch(batch: dict, **params) -> pa.Table:
    """Stateless-task form of TokenizeFragments with per-worker-process
    instance caching.

    Plain tasks reuse Ray's already-warm worker processes (an actor pool
    pays a fresh process per actor — measured as the dominant cost of
    small builds), while the module-level cache keeps the Analyzer's stem
    cache warm across every task that lands on the same worker — the same
    once-per-worker state the reference keeps per pool process
    (``IndexCreator.py:36-38``)."""
    key = tuple(sorted((k, repr(v)) for k, v in params.items()))
    inst = _PROCESS_CACHE.get(key)
    if inst is None:
        inst = TokenizeFragments(**params)
        _PROCESS_CACHE[key] = inst
    return inst(batch)
