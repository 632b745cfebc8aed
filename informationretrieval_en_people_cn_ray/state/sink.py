"""Resumable partitioned-parquet sink for operator outputs.

The build pipeline already writes per-partition artifacts with
idempotent manifests (stages/segments.py); this is the same contract
for generic Dataset outputs: never one giant file, commit-marker last,
a finished output with a matching fingerprint is skipped on re-run —
so a failed 100-TB job re-runs only what it didn't finish.

Layout::

    out_dir/
      data/part-*.parquet     (one file per block — Ray's writer)
      manifest.json           (fingerprint + row/file counts; commit marker)
"""

from __future__ import annotations

import glob
import os
import shutil

import ray.data

from .manifest import load_json, write_json_atomic


def write_partitioned(
    ds: "ray.data.Dataset", out_dir: str, fingerprint: str
) -> dict:
    """Write ``ds`` as partitioned parquet under ``out_dir`` unless a
    manifest with the same ``fingerprint`` already committed; returns the
    manifest. Write goes to a tmp dir and is renamed before the manifest
    is written, so a crashed writer can never be mistaken for output."""
    man_path = os.path.join(out_dir, "manifest.json")
    existing = load_json(man_path)
    if existing and existing.get("fingerprint") == fingerprint:
        existing["skipped"] = True
        return existing
    data_dir = os.path.join(out_dir, "data")
    tmp_dir = os.path.join(out_dir, "data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    ds.write_parquet(tmp_dir)
    os.replace(tmp_dir, data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    import pyarrow.parquet as pq

    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    manifest = {
        "fingerprint": fingerprint,
        "rows": rows,
        "files": len(files),
        "skipped": False,
    }
    write_json_atomic(man_path, manifest)
    return manifest


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Stream a committed sink back as a Dataset (raises if no
    manifest — a half-written output is not readable)."""
    if not load_json(os.path.join(out_dir, "manifest.json")):
        raise FileNotFoundError(f"no committed manifest under {out_dir}")
    return ray.data.read_parquet(os.path.join(out_dir, "data"))
