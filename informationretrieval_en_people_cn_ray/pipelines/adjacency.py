"""Adjacency (join-index) artifacts — the reference's ``reply_to_index``
generalized (SURVEY.md §2.4 J4, §2.5 A4).

The reference builds ``parent_cid → [child cids]`` as a driver-resident
pickle dict (``IndexCreator.py:56-60,181-213``) and looks children up at
query time (``SearchEngine.py:220-222`` — which crashes on an
uninitialized attribute; a known reference bug we do not replicate).

Here the adjacency table is a first-class, hash-partitioned artifact:

    groupby(parent).collect-sorted-children
      → out_dir/part=K/adjacency.parquet   (parent, children:list<int64>),
        sorted by parent, K = crc32(parent) % P
      → manifest.json per partition + adjacency.json (collection)

so it scales (each partition is bounded, lookups touch one partition) and
resumes like every other index artifact.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.manifest import (
    load_json,
    write_json_atomic,
    write_parquet_atomic,
)


def _part_of(parent: int, num_partitions: int) -> int:
    return zlib.crc32(int(parent).to_bytes(8, "little", signed=True)) % num_partitions


def _crc32_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> np.uint32(1)), t >> np.uint32(1))
    return t


_CRC32_TABLE = _crc32_table()


def _parts_of(parents: np.ndarray, num_partitions: int) -> np.ndarray:
    """Vectorized ``_part_of`` over an int64 column — bit-identical to
    ``zlib.crc32`` of the 8 little-endian bytes (8 table-lookup passes
    over the whole column instead of a per-row Python call; this runs
    once per edge in the corpus-sized ``add_part`` stage)."""
    b = np.ascontiguousarray(parents, dtype="<i8").view(np.uint8).reshape(-1, 8)
    crc = np.full(len(parents), 0xFFFFFFFF, np.uint32)
    for k in range(8):
        crc = _CRC32_TABLE[(crc ^ b[:, k]) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    crc ^= np.uint32(0xFFFFFFFF)
    return (crc % np.uint32(num_partitions)).astype(np.int32)


def build_adjacency(
    src_parquet: str,
    parent_col: str,
    child_col: str,
    out_dir: str,
    num_partitions: int = 4,
) -> dict:
    """(parent, child) rows → partitioned adjacency artifact."""
    ds = ray.data.read_parquet(src_parquet, columns=[parent_col, child_col])

    def add_part(batch: pa.Table) -> pa.Table:
        parents = batch[parent_col].to_numpy()
        parts = _parts_of(parents, num_partitions)
        return pa.table(
            {
                "parent": batch[parent_col],
                "child": batch[child_col],
                "part": pa.array(parts, pa.int32()),
            }
        )

    def write_part(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        part = int(group["part"][0].as_py())
        parents = group["parent"].to_numpy()
        children = group["child"].to_numpy()
        order = np.lexsort((children, parents))
        parents, children = parents[order], children[order]
        starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
        offsets = np.r_[starts, len(parents)].astype(np.int32)
        tbl = pa.table(
            {
                "parent": pa.array(parents[starts], pa.int64()),
                "children": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(children, pa.int64()),
                ),
            }
        )
        d = os.path.join(out_dir, f"part={part:05d}")
        write_parquet_atomic(os.path.join(d, "adjacency.parquet"), tbl)
        write_json_atomic(
            os.path.join(d, "manifest.json"),
            {"part": part, "n_parents": len(starts), "n_edges": len(parents)},
        )
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "n_parents": pa.array([len(starts)], pa.int64()),
                "n_edges": pa.array([len(parents)], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    manifest = {
        "num_partitions": num_partitions,
        "n_parents": sum(r["n_parents"] for r in rows),
        "n_edges": sum(r["n_edges"] for r in rows),
        "parent_col": parent_col,
        "child_col": child_col,
        "source": src_parquet,
    }
    write_json_atomic(os.path.join(out_dir, "adjacency.json"), manifest)
    return manifest


class AdjacencyIndex:
    """Query-side lookup: parent → sorted child ids (loaded lazily per
    partition, binary-searched — the scalable form of the reference's
    pickle dict)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest = load_json(os.path.join(out_dir, "adjacency.json"))
        if not self.manifest:
            raise FileNotFoundError(f"no adjacency.json under {out_dir}")
        self.num_partitions = self.manifest["num_partitions"]
        self._parts: dict[int, tuple] = {}

    def _load(self, part: int):
        hit = self._parts.get(part)
        if hit is None:
            f = os.path.join(
                self.out_dir, f"part={part:05d}", "adjacency.parquet"
            )
            if not os.path.exists(f):
                hit = (np.empty(0, np.int64), None, None)
            else:
                t = pq.read_table(f)
                arr = t["children"].combine_chunks()
                hit = (
                    t["parent"].to_numpy(),
                    arr.values.to_numpy(zero_copy_only=False),
                    arr.offsets.to_numpy(),
                )
            self._parts[part] = hit
        return hit

    def children(self, parent: int) -> np.ndarray:
        parents, vals, offs = self._load(_part_of(parent, self.num_partitions))
        if len(parents) == 0:
            return np.empty(0, np.int64)
        i = int(np.searchsorted(parents, parent))
        if i >= len(parents) or parents[i] != parent:
            return np.empty(0, np.int64)
        return vals[offs[i] : offs[i + 1]].astype(np.int64)
