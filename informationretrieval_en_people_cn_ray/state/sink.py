"""Resumable partitioned-parquet sink for operator outputs.

The build pipeline writes per-partition artifacts with idempotent
manifests (stages/segments.py); this is the same contract for generic
Dataset outputs — and resume is genuinely PER PARTITION: rows are routed
to a fixed set of partitions by a deterministic key hash (independent of
input blocking), each partition task writes its file write-then-rename
and commits its own manifest LAST, so a crash mid-job loses only the
uncommitted partitions and a re-run writes only those. Never one giant
file; a finished partition with a matching fingerprint is skipped.

Layout::

    out_dir/
      parts/part-NNNN/data.parquet    (one file per partition)
      parts/part-NNNN/manifest.json   (per-partition commit marker)
      manifest.json                   (global commit marker, written last)

Scale shape: the partition routing is one ``groupby`` shuffle keyed on
the hash — the same rows land in the same partition at any block count
or cluster size, which is what makes the skip decision sound. Size
``num_partitions`` so one partition fits a task (the stages/segments.py
constraint); integer AND string keys hash vectorized (splitmix64 /
Arrow-buffer fold — see functions/hashing.hash_strings_u64).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.hashing import hash_strings_u64, splitmix64
from .manifest import (
    load_json,
    partition_complete,
    sweep_stale_tmp,
    write_json_atomic,
)

_PART_COL = "__sink_part"

# re-export: datapipe's bloom / countmin / sampling mixers import from here
_splitmix64 = splitmix64


def _row_part_ids(
    batch: pa.Table, key_cols: list[str], num_partitions: int
) -> np.ndarray:
    """Deterministic partition id per row from the key columns —
    identical for a given row at any parallelism, so resume can trust a
    committed partition. Integer AND string keys hash vectorized
    (splitmix64 / buffer-fold) — no per-row Python in the write path."""
    with np.errstate(over="ignore"):
        acc = np.zeros(batch.num_rows, np.uint64)
        for c in key_cols:
            col = batch[c]
            if pa.types.is_integer(col.type):
                h = col.cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ).astype(np.uint64)
            else:
                h = hash_strings_u64(col.cast(pa.string()))
            acc = _splitmix64(acc ^ h)
    return (acc % np.uint64(num_partitions)).astype(np.int64)


def _part_dir(out_dir: str, part: int) -> str:
    # non-hive dir name: "part=" would make read_parquet infer a
    # partition column that is not part of the written schema
    return os.path.join(out_dir, "parts", f"part-{part:04d}")


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    fingerprint: str,
    num_partitions: int = 8,
    key_cols: list[str] | None = None,
) -> dict:
    """Write ``ds`` as hash-partitioned parquet under ``out_dir``;
    returns the global manifest. Skips entirely when the global manifest
    already committed with the same ``fingerprint``; otherwise re-runs
    ONLY partitions without a committed per-partition manifest matching
    ``fingerprint`` (a crashed writer leaves its partition uncommitted —
    it can never be mistaken for output)."""
    man_path = os.path.join(out_dir, "manifest.json")
    existing = load_json(man_path)
    if (
        existing
        and existing.get("fingerprint") == fingerprint
        # a manifest without a partition count is the pre-partitioned
        # layout (whole-output tmp-rename) — rewrite it
        and existing.get("partitions")
    ):
        existing["skipped"] = True
        return existing

    # NOTE: no ds.schema() here — on Ray 2.49 a schema fetch before the
    # write executes the whole upstream plan once with a Limit[1] suffix
    # and the write then executes it AGAIN (measured 2x on aggregate-fed
    # sinks). Keys resolve per batch; the empty-partition placeholder
    # schema comes from a written partition file (or, only when the
    # whole dataset produced no rows, from the then-cheap ds.schema()).
    done = [
        p
        for p in range(num_partitions)
        if partition_complete(_part_dir(out_dir, p), fingerprint)
    ]
    todo = sorted(set(range(num_partitions)) - set(done))

    if todo:
        done_arr = np.zeros(num_partitions, bool)
        done_arr[done] = True

        def route(batch: pa.Table) -> pa.Table:
            keys = key_cols or batch.column_names
            parts = _row_part_ids(batch, keys, num_partitions)
            batch = batch.append_column(
                _PART_COL, pa.array(parts, pa.int64())
            )
            # committed partitions don't travel through the shuffle
            return batch.filter(pa.array(~done_arr[parts]))

        def write_part(group: pa.Table) -> pa.Table:
            part = int(group[_PART_COL][0].as_py())
            d = _part_dir(out_dir, part)
            os.makedirs(d, exist_ok=True)
            sweep_stale_tmp(d)  # reclaim orphans from a killed writer
            tbl = group.drop_columns([_PART_COL])
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".parquet.tmp")
            os.close(fd)
            try:
                pq.write_table(tbl, tmp)
                os.replace(tmp, os.path.join(d, "data.parquet"))
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
            write_json_atomic(
                os.path.join(d, "manifest.json"),
                {
                    "part": part,
                    "rows": tbl.num_rows,
                    "bytes": tbl.nbytes,
                    "build_fingerprint": fingerprint,
                },
            )
            return pa.table({"part": pa.array([part], pa.int64())})

        routed = ds.map_batches(route, batch_format="pyarrow")
        # the summary is #partitions rows — driver-small by construction
        routed.groupby(_PART_COL).map_groups(
            write_part, batch_format="pyarrow"
        ).materialize()

    # partitions with no rows never reach write_part: commit them empty
    # so a re-run doesn't reshuffle the input just to find that out
    arrow_schema = None
    for p in range(num_partitions):
        d = _part_dir(out_dir, p)
        f = os.path.join(d, "data.parquet")
        # only trust files committed for THIS fingerprint (a stale file
        # from an older layout could carry an outdated schema)
        if partition_complete(d, fingerprint) and os.path.exists(f):
            arrow_schema = pq.read_schema(f)
            break
    if arrow_schema is None:
        # nothing was written at all — the dataset is empty, so the
        # schema fetch's limit-1 execution is cheap by construction
        s = ds.schema()
        # a dataset that produced no rows AND never declared a schema
        # (e.g. a row-filter dropped everything) commits zero-field
        # placeholders — there is nothing trustworthy to type them with
        arrow_schema = (
            pa.schema(list(zip(s.names, s.types)))
            if s is not None
            else pa.schema([])
        )
    empty = arrow_schema.empty_table()
    for p in range(num_partitions):
        d = _part_dir(out_dir, p)
        if not partition_complete(d, fingerprint):
            os.makedirs(d, exist_ok=True)
            pq.write_table(empty, os.path.join(d, "data.parquet"))
            write_json_atomic(
                os.path.join(d, "manifest.json"),
                {
                    "part": p,
                    "rows": 0,
                    "bytes": 0,
                    "build_fingerprint": fingerprint,
                },
            )

    # stale partitions from an older fingerprint layout (e.g. larger
    # num_partitions before) must not survive into the committed output
    for d in glob.glob(os.path.join(out_dir, "parts", "part-*")):
        if int(d.rsplit("-", 1)[1]) >= num_partitions:
            shutil.rmtree(d, ignore_errors=True)

    rows = 0
    files = 0
    for p in range(num_partitions):
        m = load_json(os.path.join(_part_dir(out_dir, p), "manifest.json"))
        rows += m["rows"]
        files += 1
    manifest = {
        "fingerprint": fingerprint,
        "rows": rows,
        "files": files,
        "partitions": num_partitions,
        "resumed_partitions": len(done),
        "skipped": False,
    }
    write_json_atomic(man_path, manifest)
    return manifest


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Stream a committed sink back as a Dataset (raises if no global
    manifest — a half-written output is not readable)."""
    if not load_json(os.path.join(out_dir, "manifest.json")):
        raise FileNotFoundError(f"no committed manifest under {out_dir}")
    files = sorted(
        glob.glob(os.path.join(out_dir, "parts", "part-*", "data.parquet"))
    )
    if not files:
        raise FileNotFoundError(f"no partition files under {out_dir}")
    return ray.data.read_parquet(files)
