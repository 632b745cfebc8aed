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
from itertools import chain

import numpy as np
import pyarrow as pa

from ..codec import delta_encode, encode_varints, varint_lengths
from ..text import Analyzer
from .postings import term_seg_array

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        contents = batch[self.content_column].to_pylist()
        if self.verify_sha and "content_sha256" in batch.column_names:
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

        # term -> ([doc_id,...], [tf,...], [positions-list,...])
        acc: dict[str, tuple[list, list, list]] = {}
        doc_lens = np.empty(len(doc_ids), dtype=np.int64)
        doc_terms = self.az.doc_terms
        for i, (did, text) in enumerate(zip(doc_ids, contents)):
            terms, n = doc_terms(text)
            doc_lens[i] = n
            did = int(did)
            for t, poss in terms.items():
                e = acc.get(t)
                if e is None:
                    acc[t] = ([did], [len(poss)], [poss])
                else:
                    e[0].append(did)
                    e[1].append(len(poss))
                    e[2].append(poss)

        terms_out = sorted(acc)
        col_doc_ids, col_tfs, col_pos_bytes, col_pos_lens = [], [], [], []
        for t in terms_out:
            dids, tfs, poslists = acc[t]
            col_doc_ids.append(dids)
            col_tfs.append(tfs)
            if self.store_positions:
                pos = np.fromiter(
                    chain.from_iterable(poslists), dtype=np.int64,
                    count=sum(tfs),
                )
                tf_arr = np.asarray(tfs, dtype=np.int64)
                starts = np.zeros(len(tfs), dtype=np.int64)
                if len(tfs) > 1:
                    np.cumsum(tf_arr[:-1], out=starts[1:])
                gaps = delta_encode(pos, starts)
                col_pos_bytes.append(encode_varints(gaps))
                byte_lens = varint_lengths(gaps)
                col_pos_lens.append(
                    np.add.reduceat(byte_lens, starts).astype(np.int32)
                    if len(tfs)
                    else np.empty(0, np.int32)
                )
            else:
                col_pos_bytes.append(b"")
                col_pos_lens.append(np.zeros(len(tfs), np.int32))

        seg = term_seg_array(terms_out, self.num_segments)

        # docstat pseudo-rows, routed by doc-id range partition
        part = (doc_ids * self.docstat_partitions) // self.total_docs
        part = np.clip(part, 0, self.docstat_partitions - 1)
        for p in np.unique(part):
            mask = part == p
            terms_out.append(DOCSTATS_TERM)
            seg = np.append(seg, np.int32(self.num_segments + int(p)))
            col_doc_ids.append(doc_ids[mask].tolist())
            col_tfs.append(doc_lens[mask].tolist())
            col_pos_bytes.append(b"")
            # zero-length position slice per doc, so these rows flow through
            # the generic run-merge (salted pre-merge) unchanged
            col_pos_lens.append(np.zeros(int(mask.sum()), np.int32))

        return pa.table(
            {
                "term": pa.array(terms_out, pa.string()),
                "seg": pa.array(seg, pa.int32()),
                "doc_ids": pa.array(col_doc_ids, pa.list_(pa.int64())),
                "tfs": pa.array(col_tfs, pa.list_(pa.int32())),
                "pos_bytes": pa.array(col_pos_bytes, pa.binary()),
                "pos_lens": pa.array(
                    [np.asarray(x, np.int32) for x in col_pos_lens],
                    pa.list_(pa.int32()),
                ),
            }
        )
