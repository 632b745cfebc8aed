"""End-to-end index build — the flagship Ray Data pipeline.

    read_corpus (fragment plan, doc_id assigned, columns pruned)
      → map_batches(TokenizePartial, actor pool)       [tokenize + partial combine]
      → [optional salted pre-merge groupby]            [skew: hot-term run folding]
      → groupby("seg").map_groups(SegmentBuilder)      [THE shuffle, key = term hash]
      → summaries (tiny) → collection.json

Replaces the reference's build (SURVEY.md §3.1): byte-range
multiprocessing pool capped at 2 processes + single-threaded k-way merge
(``IndexCreator.py:153-348``). Every stage streams; nothing but the
per-partition summary rows (one per segment) ever materializes on the
driver.

Skew handling (SURVEY.md §7.3/§7.4 R3, north_star "salted
repartitioning"): hot terms are bounded twice —

1. the tokenize stage emits at most one partial run per term per input
   batch (partial combine), so shuffle volume per term is O(#batches),
   and
2. with ``salt > 0`` a pre-merge shuffle on key ``(term, salt)`` folds the
   O(#batches) runs of each hot term into at most ``salt`` runs in
   parallel BEFORE the segment reduce, so no single reduce task is stuck
   merging a giant run list alone.

Resume: partitions with a complete manifest (matching build fingerprint)
skip their writes; a finished build short-circuits on ``collection.json``.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa

import ray.data

from ..datactx import unreserved
from ..sources.corpus_source import corpus_files, fragment_plan
from ..state.manifest import fingerprint, load_json, write_json_atomic
from ..stages.postings import merge_runs
from ..stages.segments import SegmentBuilder
from ..stages.tokenize import TokenizeFragments, tokenize_fragment_batch


@dataclass
class BuildConfig:
    num_segments: int = 8
    docstat_partitions: int = 2
    stem: bool = True
    store_positions: bool = True
    verify_sha: bool = True
    fragments_per_task: int = 1  # descriptors per tokenize task (block-size lever)
    tokenize_concurrency: int | None = None  # None (default) → stateless tasks
    # CPU slots reserved per heavy task: >1 CAPS concurrent tasks below
    # num_cpus. The build's hot stages are memory-bandwidth-bound; on a
    # box whose bandwidth saturates at ~8-10 concurrent heavy tasks,
    # running 32 at once REDUCES total throughput (measured 27x per-task
    # slowdown). Leave 1 for small machines; raise on big ones.
    tokenize_num_cpus: float = 1.0
    reduce_num_cpus: float = 1.0
    salt: int = 0  # 0 = no pre-merge; else number of salted buckets per term
    content_column: str = "content"
    doc_id_column: str | None = None  # use an existing stable id column
    max_blob_docs: int = 1_000_000  # giant-term posting chunk size
    # incremental extension (pipelines/merge.py): assign this corpus's
    # layout doc_ids starting at doc_id_base so a DELTA index's ids sit
    # strictly above every parent id — segment merge is then pure blob
    # concatenation. Ignored when doc_id_column is set.
    doc_id_base: int = 0

    # knobs that change HOW the build executes but provably not the
    # bytes it writes (merge order is deterministic by doc id whatever
    # the task sizing or salting — gated by the salted==unsalted
    # byte-identity test). Excluded from the fingerprint so retuning a
    # performance knob never forces a full rebuild of an identical index.
    _EXEC_ONLY = (
        "fragments_per_task",
        "tokenize_concurrency",
        "tokenize_num_cpus",
        "reduce_num_cpus",
        "salt",
    )

    def key(self) -> dict:
        d = asdict(self)
        for k in self._EXEC_ONLY:
            d.pop(k, None)
        return d


class _PreMerge:
    """groupby('salt_key').map_groups body — ONE call per (seg, salt
    bucket), folding the partial runs of EVERY term in the bucket with
    the same vectorized view walk SegmentBuilder uses. Grouping per
    (term, salt) instead would dispatch map_groups |vocab|·salt times,
    each building a 1-row table in Python — the
    map-groups-over-10^5-keys pathology. Output schema == input schema
    minus the salt key, so the stage stays optional and composable."""

    def __call__(self, group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        n = group.num_rows
        if n == 1:
            return group.drop_columns(["salt_key"])
        from ..stages.segments import _binary_views, _list_views

        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        order = np.argsort(terms, kind="stable")
        srt = terms[order]
        if n and (srt[1:] != srt[:-1]).all():
            # every term already has exactly one run — nothing to fold
            return group.drop_columns(["salt_key"])
        dvals, doffs = _list_views(group["doc_ids"])
        tvals, toffs = _list_views(group["tfs"])
        lvals, loffs = _list_views(group["pos_lens"])
        bdata, boffs = _binary_views(group["pos_bytes"])

        out_term: list[str] = []
        out_doc: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        out_bytes: list[bytes] = []
        out_plen: list[np.ndarray] = []
        i = 0
        while i < n:
            j = i
            t = srt[i]
            while j < n and srt[j] == t:
                j += 1
            rows = [int(r) for r in order[i:j]]
            if len(rows) == 1:
                r = rows[0]
                out_doc.append(dvals[doffs[r] : doffs[r + 1]])
                out_tf.append(tvals[toffs[r] : toffs[r + 1]])
                out_bytes.append(bdata[boffs[r] : boffs[r + 1]].tobytes())
                out_plen.append(lvals[loffs[r] : loffs[r + 1]])
            else:
                doc_ids, tfs, pos_bytes, pos_lens = merge_runs(
                    [dvals[doffs[r] : doffs[r + 1]] for r in rows],
                    [tvals[toffs[r] : toffs[r + 1]] for r in rows],
                    [bdata[boffs[r] : boffs[r + 1]] for r in rows],
                    [lvals[loffs[r] : loffs[r + 1]] for r in rows],
                )
                out_doc.append(doc_ids)
                out_tf.append(tfs)
                out_bytes.append(pos_bytes)
                out_plen.append(pos_lens)
            out_term.append(t)
            i = j

        m = len(out_term)
        counts = np.fromiter(
            (len(x) for x in out_doc), np.int64, count=m
        )
        offs = np.zeros(m + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        off_arr = pa.array(offs, pa.int32())
        cat = np.concatenate(out_doc) if m else np.empty(0, np.int64)
        cat_tf = np.concatenate(out_tf) if m else np.empty(0, np.int64)
        cat_pl = np.concatenate(out_plen) if m else np.empty(0, np.int64)
        return pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                "seg": pa.array(
                    np.full(m, group["seg"][0].as_py(), np.int32), pa.int32()
                ),
                "doc_ids": pa.ListArray.from_arrays(
                    off_arr, pa.array(cat.astype(np.int64), pa.int64())
                ),
                "tfs": pa.ListArray.from_arrays(
                    off_arr, pa.array(cat_tf.astype(np.int32), pa.int32())
                ),
                "pos_bytes": pa.array(out_bytes, pa.binary()),
                "pos_lens": pa.ListArray.from_arrays(
                    off_arr, pa.array(cat_pl.astype(np.int32), pa.int32())
                ),
            }
        )


def _add_salt_key(batch: pa.Table, salt: int) -> pa.Table:
    """Salted shuffle key = ``seg * salt + bucket(first doc id)`` —
    numeric, fully vectorized (no per-row Python), deterministic, and
    globally consistent (seg is a pure function of term, so every run of
    a term lands in the same bucket set; the bucket hash spreads a
    term's runs uniformly over ``salt`` buckets).

    The key MUST include ``seg``: for posting rows seg is a pure function
    of the term (no grouping change), but docstat pseudo-rows all share
    ``DOCSTATS_TERM`` while differing in seg (doc-id range partition) —
    without seg in the key, colliding buckets would merge rows across
    docstat partitions, mis-routing doc lengths (→ unsorted concatenated
    docstats → wrong BM25/Dirichlet doc lengths downstream). Total group
    count is (num_segments + docstat_partitions) · salt — a bounded,
    scale-independent shuffle fan-in (NOT |vocab|·salt)."""
    from ..stages.segments import _list_views

    batch = batch.combine_chunks()
    vals, offs = _list_views(batch["doc_ids"])
    offs = offs.astype(np.int64)
    lens = np.diff(offs)
    if len(vals):
        starts = np.minimum(offs[:-1], len(vals) - 1)
        first = np.where(lens > 0, vals[starts], 0).astype(np.uint64)
    else:
        first = np.zeros(len(lens), np.uint64)
    bucket = (
        (first * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    ) % np.uint64(salt)
    seg = batch["seg"].to_numpy().astype(np.int64)
    key = seg * np.int64(salt) + bucket.astype(np.int64)
    return batch.append_column("salt_key", pa.array(key, pa.int64()))


def build_index(
    corpus_path: str,
    out_dir: str,
    config: BuildConfig | None = None,
) -> dict:
    """Build (or resume) the index; returns the collection manifest."""
    config = config or BuildConfig()
    files = corpus_files(corpus_path)
    plan = fragment_plan(corpus_path)
    if config.doc_id_base and not config.doc_id_column:
        for e in plan:
            e["base"] += config.doc_id_base
    total_docs = plan[-1]["base"] + plan[-1]["num_rows"] if plan else 0
    if total_docs == 0 or not plan:
        raise ValueError(
            f"cannot build an index over an empty corpus: {corpus_path} "
            "has no rows"
        )
    lineage = {
        "files": [
            {"path": f, "size": os.path.getsize(f)} for f in files
        ],
        "config": config.key(),
        # bump when the on-disk blob/segment layout changes — stale caches
        # (queries(), bench) must rebuild, not misparse
        "format_version": 4,  # v4 = block-max blobs (codec.BLOCK_SIZE dir)
    }
    build_fp = fingerprint(lineage)

    coll_path = os.path.join(out_dir, "collection.json")
    existing = load_json(coll_path)
    if existing and existing.get("build_fingerprint") == build_fp:
        return existing

    t0 = time.monotonic()
    return _build_index_inner(
        corpus_path, out_dir, config, plan, total_docs, build_fp,
        coll_path, t0,
    )


# Un-starve the hot stage: Ray Data's per-op resource reservation splits
# the CPU budget evenly across ALL ops of this plan — tokenize, the Sort
# barrier, and the segment reduce. The barrier ops cannot run a single
# task until tokenize finishes, yet they hold ~2/3 of the budget, capping
# tokenize at ~40% of the cluster (measured: 4 concurrent 3.2-cpu tasks =
# 12.8 of 32 CPUs, `[backpressured:tasks]`, the machine 70-80% idle;
# 347 s → 59-112 s on the 200k-doc 32-cpu build). See datactx.unreserved
# for the memory-safety argument.
@unreserved
def _build_index_inner(
    corpus_path: str,
    out_dir: str,
    config: BuildConfig,
    plan: list,
    total_docs: int,
    build_fp: str,
    coll_path: str,
    t0: float,
) -> dict:
    columns = [config.content_column]
    # sha probe from the fragment plan (the plan read every footer once
    # — no second listing or footer pass): a mixed corpus must not
    # silently skip the invariant nor crash mid-build
    sha_by_file: dict[str, bool] = {}
    for entry in plan:
        sha_by_file[entry["file"]] = bool(entry.get("has_sha", False))
    have_sha = all(sha_by_file.values())
    if config.verify_sha and any(sha_by_file.values()) and not have_sha:
        missing = [f for f, ok in sha_by_file.items() if not ok][:3]
        raise ValueError(
            "corpus carries content_sha256 in only some files — cannot "
            f"verify the sha invariant consistently (missing in {missing})"
        )
    if config.verify_sha and have_sha:
        columns.append("content_sha256")

    # one actor task per ROW GROUP: read + tokenize fused deliberately
    # (a separate read stage would be auto-fused with the tokenizer and
    # batch on descriptor rows, collapsing parallelism — see
    # TokenizeFragments docstring)
    tok_kwargs = dict(
        columns=columns,
        doc_id_column=config.doc_id_column,
        num_segments=config.num_segments,
        docstat_partitions=config.docstat_partitions,
        total_docs=total_docs,
        stem=config.stem,
        store_positions=config.store_positions,
        verify_sha=config.verify_sha,
        content_column=config.content_column,
    )
    ds = ray.data.from_items(plan)
    if config.tokenize_concurrency:
        # explicit actor pool (state pinned per actor)
        parts = ds.map_batches(
            TokenizeFragments,
            fn_constructor_kwargs=tok_kwargs,
            batch_size=config.fragments_per_task,
            batch_format="numpy",
            concurrency=config.tokenize_concurrency,
        )
    else:
        # default: stateless tasks over warm worker processes, analyzer
        # cached per process (see tokenize_fragment_batch) — elastic, no
        # actor-startup cost
        parts = ds.map_batches(
            tokenize_fragment_batch,
            fn_kwargs=tok_kwargs,
            batch_size=config.fragments_per_task,
            batch_format="numpy",
            num_cpus=config.tokenize_num_cpus,
        )

    if config.salt > 0:
        salted = parts.map_batches(
            _add_salt_key,
            fn_kwargs=dict(salt=config.salt),
            batch_format="pyarrow",
        )
        premerge = _PreMerge()

        def premerge_runs(group: pa.Table) -> pa.Table:
            return premerge(group)

        parts = salted.groupby("salt_key").map_groups(
            premerge_runs, batch_format="pyarrow"
        )

    builder = SegmentBuilder(
        out_dir, build_fp, config.num_segments,
        max_blob_docs=config.max_blob_docs,
    )

    def build_segment(group: pa.Table) -> pa.Table:
        return builder(group)

    summaries = parts.groupby("seg").map_groups(
        build_segment,
        batch_format="pyarrow",
        num_cpus=config.reduce_num_cpus,
    )
    t_plan = time.monotonic()
    rows = summaries.take_all()  # tiny: one row per partition
    if os.environ.get("GRAFT_BUILD_STATS"):  # perf diagnosis aid
        import sys

        print(
            f"[build] plan setup {t_plan - t0:.2f}s, "
            f"execute {time.monotonic() - t_plan:.2f}s",
            file=sys.stderr,
        )
        print(summaries.stats(), file=sys.stderr)

    post = [r for r in rows if r["kind"] == "postings"]
    stats = [r for r in rows if r["kind"] == "docstats"]
    # segments whose hash received NO terms (tiny delta generations)
    # still need artifacts — readers and merges address every seg
    from ..stages.segments import write_empty_segment

    written = {int(r["seg"]) for r in post}
    for seg in range(config.num_segments):
        if seg not in written:
            write_empty_segment(out_dir, seg, build_fp)
            rows.append(
                {
                    "seg": seg, "kind": "postings", "n_terms": 0,
                    "n_docs": 0, "tokens": 0, "bytes": 0,
                    "path": "", "skipped": False,
                }
            )
    n_docs = sum(r["n_docs"] for r in stats)
    total_tokens = sum(r["tokens"] for r in stats)
    manifest = {
        "build_fingerprint": build_fp,
        "corpus": corpus_path,
        "config": config.key(),
        "num_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "num_segments": config.num_segments,
        "docstat_partitions": config.docstat_partitions,
        "n_terms": sum(r["n_terms"] for r in post),
        "postings_bytes": sum(r["bytes"] for r in post),
        "n_posting_entries": sum(r["n_docs"] for r in post),
        "wall_s": round(time.monotonic() - t0, 3),
        "partitions": [
            {k: r[k] for k in ("seg", "kind", "n_terms", "n_docs", "tokens", "bytes", "skipped")}
            for r in sorted(rows, key=lambda r: int(r["seg"]))
        ],
    }
    built_rows = total_docs - (
        0 if config.doc_id_column else config.doc_id_base
    )
    if n_docs != built_rows:
        raise RuntimeError(
            f"docstat rows {n_docs} != corpus rows {built_rows} — build bug"
        )
    write_json_atomic(coll_path, manifest)
    return manifest
