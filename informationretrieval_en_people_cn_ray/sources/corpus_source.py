"""Corpus reader with deterministic, partitioning-invariant doc-id assignment.

The reference's document identifier is the byte offset of the row in
``comments.csv`` — implicitly assigned by a sequential scan
(``IndexCreator.py:46-48``, ``SearchEngine.py:131-133``; SURVEY.md §1.1).
Byte offsets don't survive a parallel read, so we assign an explicit dense
``doc_id:int64`` instead, derived only from on-disk layout:

    files sorted by path  →  row groups in file order  →
    doc_id = (prefix-sum of row-group row counts) + index within row group

This is invariant to Ray parallelism (num_cpus 1/2/8 produce identical ids
— SURVEY.md §7.4 R4), needs NO shuffle (the reference alternative of a
global sort would), and is cheap at scale: only Parquet *metadata* is read
on the driver to build the fragment plan (at 10^12-file scale this
metadata scan would itself be a `map_batches` over file paths; the plan is
just (file, row_group, base) triples either way).

Reading is a ``map_batches`` over the fragment plan: one task per row
group, emitting an Arrow table with the ``doc_id`` column prepended —
so the corpus enters the pipeline as a streaming Dataset whose blocks are
row groups.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def corpus_files(path: str) -> list[str]:
    """Sorted parquet file list for a corpus file/directory."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return files


def fragment_plan(path: str) -> list[dict]:
    """[{file, row_group, base, num_rows, has_sha}] with global base
    offsets. ``has_sha`` (does the file carry ``content_sha256``) rides
    along because this footer is ALREADY open here — the build's sha
    probe would otherwise re-read every footer a second time."""
    plan: list[dict] = []
    base = 0
    for f in corpus_files(path):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        has_sha = "content_sha256" in pf.schema_arrow.names
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            plan.append(
                {
                    "file": f,
                    "row_group": rg,
                    "base": base,
                    "num_rows": n,
                    "has_sha": has_sha,
                }
            )
            base += n
    return plan


def corpus_num_docs(path: str) -> int:
    plan = fragment_plan(path)
    return plan[-1]["base"] + plan[-1]["num_rows"] if plan else 0


class _ReadFragment:
    """map_batches task body: one fragment descriptor → its Arrow rows with
    doc_id assigned. Plain function-style class so `columns` travels along.

    ``doc_id_column``: when the source table already carries a stable id
    column (e.g. the driver's documents.parquet), use it verbatim instead
    of assigning by layout."""

    def __init__(self, columns: list[str] | None, doc_id_column: str | None = None):
        self.columns = columns
        self.doc_id_column = doc_id_column

    def __call__(self, batch: dict) -> pa.Table:
        out = []
        for file, rg, base in zip(
            batch["file"], batch["row_group"], batch["base"]
        ):
            cols = self.columns
            if cols is not None and self.doc_id_column:
                cols = [self.doc_id_column] + [
                    c for c in cols if c != self.doc_id_column
                ]
            tbl = pq.ParquetFile(file).read_row_group(int(rg), columns=cols)
            if self.doc_id_column:
                if self.doc_id_column != "doc_id":
                    tbl = tbl.rename_columns(
                        [
                            "doc_id" if c == self.doc_id_column else c
                            for c in tbl.column_names
                        ]
                    )
                # Fail loudly at the SOURCE when the explicit id column
                # breaks the sorted-run invariant every downstream stage
                # relies on (codec/merge otherwise die later with opaque
                # "negative varint" / "duplicate doc_id" errors).
                ids = tbl["doc_id"].combine_chunks()
                if not pa.types.is_integer(ids.type):
                    raise TypeError(
                        f"doc_id column '{self.doc_id_column}' must be an "
                        f"integer type, got {ids.type} ({file})"
                    )
                vals = ids.to_numpy(zero_copy_only=False)
                if len(vals) > 1 and not (np.diff(vals) > 0).all():
                    raise ValueError(
                        f"doc_id column '{self.doc_id_column}' must be "
                        f"strictly ascending within each row group "
                        f"(file {file}, row group {int(rg)}) — posting "
                        "runs require sorted unique doc ids"
                    )
                if ids.type != pa.int64():
                    tbl = tbl.set_column(
                        tbl.column_names.index("doc_id"),
                        "doc_id",
                        ids.cast(pa.int64()),
                    )
            else:
                doc_id = pa.array(
                    np.arange(int(base), int(base) + tbl.num_rows, dtype=np.int64)
                )
                tbl = tbl.add_column(0, "doc_id", doc_id)
            out.append(tbl)
        return pa.concat_tables(out)


def read_corpus(
    path: str,
    columns: list[str] | None = None,
    doc_id_column: str | None = None,
) -> "ray.data.Dataset":
    """Corpus Dataset with dense deterministic ``doc_id``; ``columns`` prunes
    at the read (pass only what the stage needs — e.g. ["content"])."""
    plan = fragment_plan(path)
    ds = ray.data.from_items(plan)
    # one task per fragment: batch_size=1 + enough output blocks
    return ds.map_batches(
        _ReadFragment(columns, doc_id_column),
        batch_size=1,
        batch_format="numpy",
    )


class DocStore:
    """Point lookups doc_id → source row (for top-k hydration — the
    reference's ``load_comment`` seek, ``SearchEngine.py:131-147``).

    Uses the fragment plan to map a doc_id back to (file, row_group, row)
    and reads just that row group — no index artifacts needed, because
    doc-id assignment is a pure function of on-disk layout.

    ``doc_id_column``: for an index built over an EXPLICIT id column
    (``BuildConfig.doc_id_column``) the layout mapping is invalid — ids
    need not be dense layout ordinals. In that mode the store reads just
    the id column once (a single-column scan; the analog of the
    reference's ``cids.npy`` sidecar, ``IndexCreator.py:215-224``) and
    translates ids → layout positions; O(num_docs) int64s on this
    process — shard behind actors at cluster scale.
    """

    def __init__(self, path: str, doc_id_column: str | None = None):
        self.plan = fragment_plan(path)
        self.bases = np.array([p["base"] for p in self.plan], dtype=np.int64)
        self._id_sorted: np.ndarray | None = None
        self._pos_sorted: np.ndarray | None = None
        if doc_id_column:
            parts = [
                pq.ParquetFile(p["file"])
                .read_row_group(p["row_group"], columns=[doc_id_column])[
                    doc_id_column
                ]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for p in self.plan
            ]
            ids = (
                np.concatenate(parts) if parts else np.empty(0, np.int64)
            )
            order = np.argsort(ids, kind="stable").astype(np.int64)
            self._id_sorted = ids[order]
            self._pos_sorted = order  # layout ordinal of each sorted id
            if len(ids) > 1 and (np.diff(self._id_sorted) == 0).any():
                raise ValueError(
                    f"doc_id column '{doc_id_column}' has duplicate ids — "
                    "cannot hydrate unambiguously"
                )

    def lookup(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        req = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
        if self._id_sorted is not None:
            pos = np.searchsorted(self._id_sorted, req)
            bad = (pos >= len(self._id_sorted)) | (
                self._id_sorted[np.minimum(pos, len(self._id_sorted) - 1)]
                != req
            )
            if bad.any():
                raise KeyError(
                    f"doc ids not present in the corpus id column: "
                    f"{req[bad][:5].tolist()}"
                )
            ordinals = self._pos_sorted[pos]
            by_layout = np.argsort(ordinals, kind="stable")
            ordinals, req = ordinals[by_layout], req[by_layout]
        else:
            total = (
                int(self.plan[-1]["base"] + self.plan[-1]["num_rows"])
                if self.plan
                else 0
            )
            if len(req) and (req[0] < 0 or req[-1] >= total):
                raise IndexError(
                    f"doc ids outside the corpus layout range [0, {total}): "
                    f"{req[(req < 0) | (req >= total)][:5].tolist()} — was "
                    "the index built with an explicit doc_id_column? Pass "
                    "it to DocStore."
                )
            ordinals = req
        frag_idx = np.searchsorted(self.bases, ordinals, side="right") - 1
        out = []
        for fi in np.unique(frag_idx):
            frag = self.plan[int(fi)]
            sel = frag_idx == fi
            rows = ordinals[sel] - frag["base"]
            tbl = pq.ParquetFile(frag["file"]).read_row_group(
                frag["row_group"], columns=columns
            )
            tbl = tbl.take(pa.array(rows))
            tbl = tbl.add_column(0, "doc_id", pa.array(req[sel]))
            out.append(tbl)
        return pa.concat_tables(out)
