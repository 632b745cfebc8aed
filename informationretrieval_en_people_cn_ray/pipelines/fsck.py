"""Index integrity checker (``fsck``) — validates every on-disk
invariant the query paths rely on, so operational corruption (truncated
blob file, mis-sorted dictionary, mis-routed docstat partition, stray
tombstone) is caught by an explicit check instead of a wrong query
result.

Two depths:

- **fast** (default): structural — manifests present and mutually
  consistent, per-segment dictionaries sorted and hash-routed to their
  segment, blob (offset, size) ranges in-bounds and non-overlapping,
  docstat partitions globally range-sorted with manifest counts matching
  their parquet contents, tombstones a subset of live doc ids. Reads
  dictionaries and docstats only — never decodes a posting blob.
- **deep**: additionally decodes EVERY posting blob and checks doc ids
  strictly ascending, posting count == dictionary df, tf sum ==
  dictionary ctf, block max_tf == dictionary max_tf, and chunk-row
  doc-range continuity for giant terms.

Distribution: one Ray task per segment (the same unit of work the
build's reduce and the byte-level merge use), so a deep check of a
10^4-segment index fans out across the cluster; the driver only merges
per-segment error lists. Runs inline (no Ray) when ``parallel=False``
or Ray isn't initialised — handy for point checks in tests/CLI.

Reference counterpart: the reference trusts its pickle/csv artifacts
blindly (``SearchEngine.load_index``, ``SearchEngine.py:39-63``); an
explicit checker is part of operating the same index at fleet scale.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from ..stages.postings import term_seg
from ..state.manifest import load_json


def _check_segment(index_dir: str, seg: int, deep: bool) -> list[str]:
    """Error strings for one segment (empty = clean)."""
    from ..stages.segments import seg_dir

    errs: list[str] = []
    d = seg_dir(index_dir, seg)
    tpath = os.path.join(d, "terms.parquet")
    bpath = os.path.join(d, "postings.bin")
    if not os.path.exists(tpath):
        return [f"seg {seg}: missing terms.parquet"]
    t = pq.read_table(tpath)
    terms = t["term"].to_pylist()
    df = t["df"].to_numpy()
    ctf = t["ctf"].to_numpy()
    off = t["offset"].to_numpy()
    size = t["size"].to_numpy()
    max_tf = (
        t["max_tf"].to_numpy()
        if "max_tf" in t.column_names
        else np.zeros(len(df), np.int64)
    )
    man = load_json(os.path.join(d, "manifest.json")) or {}
    nseg = load_json(os.path.join(index_dir, "collection.json"))[
        "num_segments"
    ]

    # dictionary sorted (chunk rows of one term are adjacent, equal keys
    # allowed) and every term hash-routed to THIS segment
    for i in range(1, len(terms)):
        if terms[i] < terms[i - 1]:
            errs.append(f"seg {seg}: dictionary unsorted at row {i}")
            break
    miss = [x for x in dict.fromkeys(terms) if term_seg(x, nseg) != seg]
    if miss:
        errs.append(
            f"seg {seg}: {len(miss)} terms routed to other segments "
            f"(first: {miss[0]!r})"
        )

    # blob ranges: in-bounds, ascending, non-overlapping
    blen = os.path.getsize(bpath) if os.path.exists(bpath) else 0
    if len(off) and int(size.sum()) and not os.path.exists(bpath):
        errs.append(f"seg {seg}: missing postings.bin")
    order = np.argsort(off, kind="stable")
    o_s, s_s = off[order], size[order]
    if len(o_s):
        if int(o_s[-1] + s_s[-1]) > blen:
            errs.append(
                f"seg {seg}: blob range [{int(o_s[-1])}, "
                f"{int(o_s[-1] + s_s[-1])}) exceeds postings.bin "
                f"({blen} bytes)"
            )
        ov = np.nonzero(o_s[1:] < (o_s[:-1] + s_s[:-1]))[0]
        if ov.size:
            errs.append(f"seg {seg}: {ov.size} overlapping blob ranges")
    if man and man.get("n_terms") not in (None, len(terms)):
        errs.append(
            f"seg {seg}: manifest n_terms {man.get('n_terms')} != "
            f"dictionary rows {len(terms)}"
        )

    if not deep or errs:
        return errs

    from ..stages.segments import SegmentReader

    r = SegmentReader(index_dir, seg)
    prev_term, prev_last = None, -1
    for i in range(len(terms)):
        try:
            d_ids, tfs, _, _ = r.postings_decoded(i)
        except Exception as ex:  # corrupt varint stream etc.
            errs.append(f"seg {seg}: blob {i} ({terms[i]!r}) undecodable: {ex}")
            prev_term = None
            continue
        if len(d_ids) != int(df[i]):
            errs.append(
                f"seg {seg}: {terms[i]!r} chunk {i} df {int(df[i])} != "
                f"decoded postings {len(d_ids)}"
            )
        if int(tfs.sum()) != int(ctf[i]):
            errs.append(
                f"seg {seg}: {terms[i]!r} chunk {i} ctf {int(ctf[i])} != "
                f"decoded tf sum {int(tfs.sum())}"
            )
        if max_tf[i] and len(tfs) and int(tfs.max()) != int(max_tf[i]):
            errs.append(
                f"seg {seg}: {terms[i]!r} chunk {i} max_tf "
                f"{int(max_tf[i])} != decoded {int(tfs.max())}"
            )
        if len(d_ids) > 1 and np.any(d_ids[1:] <= d_ids[:-1]):
            errs.append(
                f"seg {seg}: {terms[i]!r} chunk {i} doc ids not strictly "
                "ascending"
            )
        if terms[i] == prev_term and len(d_ids) and d_ids[0] <= prev_last:
            errs.append(
                f"seg {seg}: {terms[i]!r} chunk rows out of doc-range order"
            )
        prev_term = terms[i]
        prev_last = int(d_ids[-1]) if len(d_ids) else prev_last
    return errs


def _check_docstats(index_dir: str) -> tuple[list[str], int, int]:
    """(errors, n_docs, total_doc_len) across docstat partitions."""
    errs: list[str] = []
    parts = sorted(glob.glob(os.path.join(index_dir, "docstats", "part=*")))
    n_docs, tokens, prev_hi = 0, 0, -1
    for p in parts:
        f = os.path.join(p, "docstats.parquet")
        if not os.path.exists(f):
            errs.append(f"{p}: missing docstats.parquet")
            continue
        t = pq.read_table(f)
        ids = t["doc_id"].to_numpy()
        man = load_json(os.path.join(p, "manifest.json")) or {}
        if len(ids):
            if np.any(ids[1:] <= ids[:-1]):
                errs.append(f"{p}: doc ids not strictly ascending")
            if int(ids[0]) <= prev_hi:
                errs.append(
                    f"{p}: doc-id range overlaps previous partition "
                    f"({int(ids[0])} <= {prev_hi})"
                )
            prev_hi = int(ids[-1])
        part_tokens = int(t["doc_len"].to_numpy().sum()) if len(ids) else 0
        if man and man.get("n_docs") not in (None, len(ids)):
            errs.append(
                f"{p}: manifest n_docs {man.get('n_docs')} != rows {len(ids)}"
            )
        if man and man.get("tokens") not in (None, part_tokens):
            errs.append(
                f"{p}: manifest tokens {man.get('tokens')} != {part_tokens}"
            )
        n_docs += len(ids)
        tokens += part_tokens
    return errs, n_docs, tokens


def check_index(
    index_dir: str, deep: bool = False, parallel: bool | None = None
) -> dict:
    """Full-index check → report dict:
    ``{"ok": bool, "errors": [...], "segments": n, "docs": n, "deep": b}``.

    ``parallel=None`` auto-uses Ray warm tasks when a session is live
    (one task per segment); ``False`` forces inline."""
    man = load_json(os.path.join(index_dir, "collection.json"))
    if not man:
        return {
            "ok": False,
            "errors": [f"no collection.json under {index_dir}"],
            "segments": 0,
            "docs": 0,
            "deep": deep,
        }
    nseg = man["num_segments"]
    errors: list[str] = []

    import ray

    use_ray = ray.is_initialized() if parallel is None else parallel
    if use_ray:
        f = ray.remote(num_cpus=1)(_check_segment)
        for r in ray.get(
            [f.remote(index_dir, s, deep) for s in range(nseg)]
        ):
            errors.extend(r)
    else:
        for s in range(nseg):
            errors.extend(_check_segment(index_dir, s, deep))

    ds_errs, n_docs, tokens = _check_docstats(index_dir)
    errors.extend(ds_errs)
    if n_docs != man.get("num_docs"):
        errors.append(
            f"collection num_docs {man.get('num_docs')} != docstat rows "
            f"{n_docs}"
        )
    if tokens != man.get("total_tokens"):
        errors.append(
            f"collection total_tokens {man.get('total_tokens')} != docstat "
            f"sum {tokens}"
        )

    # tombstones must reference live doc ids
    from ..state.tombstones import load_tombstones

    tombs = load_tombstones(index_dir)
    if tombs.size:
        live = np.concatenate(
            [
                pq.read_table(
                    os.path.join(p, "docstats.parquet"), columns=["doc_id"]
                )["doc_id"].to_numpy()
                for p in sorted(
                    glob.glob(os.path.join(index_dir, "docstats", "part=*"))
                )
            ]
        )
        from ..state.tombstones import in_sorted

        stray = tombs[~in_sorted(live, tombs)]
        if stray.size:
            errors.append(
                f"{stray.size} tombstoned doc ids not in docstats "
                f"(first: {int(stray[0])})"
            )

    return {
        "ok": not errors,
        "errors": errors,
        "segments": nseg,
        "docs": n_docs,
        "deep": deep,
    }


def check_generations(
    index_dirs: list[str], deep: bool = False, parallel: bool | None = None
) -> dict:
    """Check an UNMERGED generation list (the state a reader opens via
    ``GenerationalSegments``): every generation passes ``check_index``,
    generations agree on num_segments / analyzer config, and their
    docstat doc-id ranges are disjoint and ascending — the invariant the
    byte-level merge and every generational query path rely on."""
    from .merge import _docstat_bounds

    errors: list[str] = []
    reports = []
    for d in index_dirs:
        r = check_index(d, deep=deep, parallel=parallel)
        reports.append(r)
        errors.extend(f"{d}: {e}" for e in r["errors"])
    mans = [
        load_json(os.path.join(d, "collection.json")) or {}
        for d in index_dirs
    ]
    nsegs = {m.get("num_segments") for m in mans}
    if len(nsegs) > 1:
        errors.append(f"generations disagree on num_segments: {nsegs}")
    for key in ("stem", "store_positions"):
        vals = {m.get("config", {}).get(key) for m in mans}
        if len(vals) > 1:
            errors.append(f"generations disagree on {key}: {vals}")
    bounds = [(d, _docstat_bounds(d)) for d in index_dirs]
    live = [(d, b) for d, b in bounds if b]
    for (da, (alo, ahi)), (db, (blo, bhi)) in zip(live, live[1:]):
        if blo <= ahi:
            errors.append(
                f"doc-id ranges overlap/out of order: {da} [{alo},{ahi}] "
                f"then {db} [{blo},{bhi}]"
            )
    return {
        "ok": not errors,
        "errors": errors,
        "generations": len(index_dirs),
        "segments": mans[0].get("num_segments") if mans else 0,
        "docs": sum(r["docs"] for r in reports),
        "deep": deep,
    }
