"""Large-scale training-data operators over the ``documents`` /
``embeddings`` / ``orders`` tables — the ops a 100 TB pipeline needs
beyond the reference's own surface (deduplication, similarity search,
text analysis), each expressed Ray-Data-first:

- every per-doc computation is a vectorized / C-backed ``map_batches``,
- every aggregation pre-combines per batch before its shuffle,
- small sides (query vectors, shingle maps for candidate verification)
  are broadcast via ``ray.put``, never shuffled,
- hash functions replicate DuckDB's ``md5_number_lower`` exactly so most
  operators have exact ANSI-SQL oracles (functions/hashing.py).

Ops returning a Dataset stream; callers (driver gate, bench) consume via
``to_arrow`` on small results only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..datactx import unreserved
from ..functions.hashing import (
    sha256_hex,
    shingles,
)
from ..text import tokenize

# ---------------------------------------------------------------------------
# language-ID marker sets (tiny n-gram/stopword heuristic — SQL-expressible)

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "los", "las", "es", "y", "una"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic argmax tie order

STOPWORDS = LANG_MARKERS["en"]



def round4(x: float) -> float:
    """4-decimal rounding matching DuckDB's ROUND (half away from zero);
    Python's built-in round is half-to-even, which disagrees with the
    SQL oracles on exact .xxxx5 ties."""
    import math

    return math.copysign(math.floor(abs(x) * 10000.0 + 0.5) / 10000.0, x)


def _arrow_blocks(ds) -> list[pa.Table]:
    """Execute a Dataset ONCE and return its blocks as Arrow tables.

    Works around a Ray 2.49 ``Dataset.to_arrow_refs`` double execution:
    it consumes ``iter_internal_ref_bundles()`` (a full run) and then
    calls ``schema(fetch_if_missing=True)``, which — for plans ending in
    an all-to-all whose streamed results left no cached snapshot —
    RE-EXECUTES the whole plan with a Limit[1] suffix (measured at
    sf0.1: the doclen histogram paid 2.6 s run + 6.2 s re-run). Pulling
    the block refs straight off the bundle iterator executes exactly
    once; blocks are Arrow already on every path in this library."""
    from ray.data.block import BlockAccessor

    return [
        BlockAccessor.for_block(b).to_arrow()
        for b in ray.get(_arrow_block_refs(ds))
    ]


def _arrow_block_refs(ds) -> list:
    """Single-execution replacement for ``Dataset.to_arrow_refs`` (same
    double-execution workaround as ``_arrow_blocks``): the blocks stay
    in the object store; only the refs come back."""
    return [
        r
        for bundle in ds.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]


def _to_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset result to one Arrow table.

    Ray can emit empty blocks with an EMPTY (zero-field) schema alongside
    typed blocks (e.g. from groupby partitions that received no rows) —
    those must be dropped before concat or Arrow rejects the schema mix."""
    if isinstance(ds, pa.Table):
        return ds
    tables = [t for t in _arrow_blocks(ds) if t.num_columns > 0]
    if not tables:
        return pa.table({})
    typed = [t for t in tables if t.num_rows > 0]
    return pa.concat_tables(typed) if typed else tables[0]

def _table_bytes(sf_dir: str, name: str = "documents") -> int:
    """On-disk footprint of one input table (file or partitioned dir) —
    the cheap scale signal for sizing pre-shuffle coalesces."""
    import os

    p = f"{sf_dir}/{name}.parquet"
    if os.path.isfile(p):
        return os.path.getsize(p)
    total = 0
    for root, _, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _coalesced(
    ds,
    sf_dir: str,
    table: str = "documents",
    expansion: float = 1.0,
    floor: int = 8,
    cap: int = 64,
    target_bytes: int = 64 << 20,
):
    """Pre-shuffle coalesce sized from the INPUT's on-disk footprint.

    Small inputs (the measured 2-3× win at sf0.1) coalesce into
    ``floor``..``cap`` ~``target_bytes`` blocks before a groupby, so the
    shuffle sees a few dense blocks instead of hundreds of slivers. When
    the derived block count exceeds ``cap`` the input is already wide
    and the repartition is SKIPPED — forcing a 100× corpus through an
    8-block all-to-all would itself be the bottleneck. ``expansion``
    scales the footprint for upstream fan-out (e.g. ×LSH_BANDS band
    rows per doc)."""
    import math

    n = max(
        floor,
        math.ceil(_table_bytes(sf_dir, table) * expansion / target_bytes),
    )
    return ds if n > cap else ds.repartition(n)


def read_documents(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


# ---------------------------------------------------------------------------
# text analysis


def _batch_token_codes(batch: pa.Table):
    """Shared vectorized tokenized intermediate for the text-analysis ops
    (text.batch_token_codes over the batch's text column)."""
    from ..text import batch_token_codes

    return batch_token_codes(batch["text"].to_pylist())


@unreserved
def token_count(sf_dir: str):
    """(doc_id, n_tokens) — doc length over the SQL-parity tokenizer
    (Arrow-vectorized batch tokenize; the per-doc lengths come straight
    from the split offsets, no Python loop)."""
    from ..text import tokenize_batch

    def f(batch: pa.Table) -> pa.Table:
        lens, _ = tokenize_batch(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def term_stats(sf_dir: str):
    """(term, df, ctf) — global term statistics with per-batch partial
    combine before the term shuffle (SURVEY.md §2.5 A1/A3 as a standalone
    operator); counting is pure numpy over dictionary codes."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, doc_idx, codes, uniq = _batch_token_codes(batch)
        U = len(uniq)
        ctf = np.bincount(codes, minlength=U)
        uk = np.unique(doc_idx * U + codes)  # distinct (doc, term) pairs
        df = np.bincount(uk % U, minlength=U)
        return pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "df": pa.array(df, pa.int64()),
                "ctf": pa.array(ctf, pa.int64()),
            }
        )

    ds = read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    # partial outputs are vocabulary-sized (tiny per block); coalescing
    # before the sort shuffle removes most of its per-block overhead
    # (measured 2-3x on the wide-read case) at a bounded 8x block growth
    return ds.repartition(8).groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("ctf", alias_name="ctf")
    )


@unreserved
def quality_score(sf_dir: str):
    """(doc_id, n_tokens, avg_token_len, stop_ratio, alnum_ratio, score)
    — length/stopword/punctuation quality heuristics (all SQL-parity);
    per-doc sums via bincount over dictionary codes."""
    import pyarrow.compute as pc

    stop = frozenset(STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        nd = len(lens)
        ulen = np.fromiter((len(u) for u in uniq), np.int64, count=len(uniq))
        ustop = np.fromiter(
            (u in stop for u in uniq), np.bool_, count=len(uniq)
        )
        # integer sums via float64 bincount weights are exact (< 2^53)
        tok_chars = np.bincount(doc_idx, weights=ulen[codes], minlength=nd)
        n_stop = np.bincount(
            doc_idx, weights=ustop[codes].astype(np.float64), minlength=nd
        )
        n = lens.astype(np.float64)
        n_chars = pc.utf8_length(batch["text"]).to_numpy().astype(np.float64)
        avg_len = np.where(lens > 0, tok_chars / np.where(lens > 0, n, 1.0), 0.0)
        stop_r = np.where(lens > 0, n_stop / np.where(lens > 0, n, 1.0), 0.0)
        alnum_r = np.where(
            n_chars > 0, tok_chars / np.where(n_chars > 0, n_chars, 1.0), 0.0
        )
        # identical expression order to the SQL oracle → bit-identical
        # IEEE doubles (no rounding: python round() is half-even,
        # DuckDB's is half-away — rounding would desync .5 cases)
        score = np.where(lens >= 10, 1.0, n / 10.0) * (1.0 - stop_r) * alnum_r
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(lens, pa.int64()),
                "avg_token_len": pa.array(avg_len, pa.float64()),
                "stop_ratio": pa.array(stop_r, pa.float64()),
                "alnum_ratio": pa.array(alnum_r, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def lang_id(sf_dir: str):
    """(doc_id, pred_lang) — marker-word language heuristic with the
    deterministic LANG_ORDER tie-break (SQL-parity via CASE chain);
    marker counting via bincount over dictionary codes."""
    markers = {l: frozenset(ws) for l, ws in LANG_MARKERS.items()}

    def f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        nd = len(lens)
        best_n = np.zeros(nd, np.int64)
        best_li = np.full(nd, -1, np.int64)
        for li, l in enumerate(LANG_ORDER):
            m = markers[l]
            um = np.fromiter((u in m for u in uniq), np.bool_, count=len(uniq))
            cnt = np.bincount(
                doc_idx, weights=um[codes].astype(np.float64), minlength=nd
            ).astype(np.int64)
            better = cnt > best_n  # strict > keeps the first-lang tie-break
            best_n[better] = cnt[better]
            best_li[better] = li
        langs = np.array(["unknown"] + list(LANG_ORDER), dtype=object)
        preds = langs[best_li + 1]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds.tolist(), pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def fingerprint(sf_dir: str):
    """(doc_id, fp) — order-sensitive rolling document fingerprint
    (functions/hashing.rolling_fingerprint; SQL-parity via positional
    md5 sum mod 2^61-1). Vectorized: each DISTINCT (position, token)
    pair in the batch is md5-hashed once (positions and tokens repeat
    heavily across docs), per-doc sums run as two exact float64
    bincounts over the 31-bit halves, and only the final mod happens in
    Python-int per doc."""
    from ..functions.hashing import MERSENNE61, md5_i63

    def f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        nd = batch.num_rows
        if len(codes) == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "fp": pa.array([0] * nd, pa.int64()),
                }
            )
        starts = np.zeros(nd, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pos = np.arange(len(codes), dtype=np.int64) - starts[doc_idx] + 1
        U = len(uniq)
        pair = pos * U + codes
        upair, pair_idx = np.unique(pair, return_inverse=True)
        cache = _POSTOK_HASH_CACHE
        if len(cache) >= _HASH_CACHE_MAX:
            cache.clear()

        def pt_hash(p: int) -> int:
            key = (p // U, uniq[p % U])
            h = cache.get(key)
            if h is None:
                h = md5_i63(f"{key[0]}:{key[1]}")
                cache[key] = h
            return h

        hv = np.fromiter(
            (pt_hash(int(p)) for p in upair), np.int64, count=len(upair)
        )
        # exact 63-bit sums: accumulate the 31-bit halves in float64
        # (each half-sum stays < 2^53 for docs up to ~2^21 tokens)
        lo = (hv & ((1 << 31) - 1)).astype(np.float64)
        hi = (hv >> 31).astype(np.float64)
        slo = np.bincount(doc_idx, weights=lo[pair_idx], minlength=nd)
        shi = np.bincount(doc_idx, weights=hi[pair_idx], minlength=nd)
        fps = [
            ((int(h) << 31) + int(l)) % MERSENNE61
            for h, l in zip(shi, slo)
        ]
        # the float64 half-sum trick is exact only while a doc's 31-bit
        # half-sum stays < 2^53 — i.e. docs under 2^21 tokens; longer
        # docs fall back to exact Python-int accumulation
        for i in np.nonzero(lens >= (1 << 21))[0]:
            seg = pair_idx[starts[i] : starts[i] + lens[i]]
            fps[int(i)] = int(hv[seg].astype(object).sum()) % MERSENNE61
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.int64())}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# deduplication


@unreserved
def exact_dedup_keepers(sf_dir: str):
    """(doc_id) — exact dedup by content hash: hash-partitioned groupby,
    keep min doc_id per group (SURVEY.md §2.5 A6; hashing first keeps the
    shuffle key short instead of shuffling full texts)."""
    from ray.data.aggregate import Min

    def h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sha": pa.array(
                    [sha256_hex(t) for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        h, batch_format="pyarrow"
    )
    # hashed rows are short; coalesce the read's small blocks before the
    # shuffle (same overhead fix as term_stats)
    agg = (
        ds.repartition(8)
        .groupby("sha")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    return agg.select_columns(["doc_id"])


NUM_MINHASHES = 8
LSH_BANDS = 4  # 2 hashes per band

# Per-worker-process hash caches (ST1-style per-process state, like the
# tokenizer cache in stages/tokenize.py): shingles/terms/(pos, token)
# pairs repeat heavily ACROSS batches and across queries in a session,
# and md5 in a Python loop is the signature stages' dominant cost —
# DuckDB-parity pins the hash function, so caching is the lever. Plain
# dicts with a clear-on-full cap: the working sets are vocabulary-sized.
_SHINGLE_HASH_CACHE: dict[str, np.ndarray] = {}
_TERM_U64_CACHE: dict[str, int] = {}
_POSTOK_HASH_CACHE: dict[tuple[int, str], int] = {}
_HASH_CACHE_MAX = 1 << 20


def _shingle_hash_rows(uniq: list[str]) -> np.ndarray:
    """(U, 1+NUM_MINHASHES) int64 — [set_hash, sig-hash_0..7] per
    distinct shingle, cached per worker process."""
    from ..functions.hashing import md5_i63

    out = np.empty((len(uniq), 1 + NUM_MINHASHES), np.int64)
    cache = _SHINGLE_HASH_CACHE
    for i, u in enumerate(uniq):
        row = cache.get(u)
        if row is None:
            row = np.empty(1 + NUM_MINHASHES, np.int64)
            row[0] = md5_i63(u)
            for k in range(NUM_MINHASHES):
                row[k + 1] = md5_i63(f"{k}:{u}")
            if len(cache) >= _HASH_CACHE_MAX:
                cache.clear()
            cache[u] = row
        out[i] = row
    return out


def _shingle_hashes_and_sigs(batch: pa.Table):
    """Vectorized per-batch shingle analysis shared by minhash / near-dup:
    dictionary-encode the batch's shingle stream so each DISTINCT shingle
    is md5-hashed at most once (and usually zero times — the per-process
    ``_SHINGLE_HASH_CACHE`` carries hashes across batches), then derive
    per-doc minhash signatures with segmented ``np.minimum.reduceat``
    and per-doc distinct shingle-hash sets.

    Returns (doc_lens, doc_starts, codes, shingle_hash_of_code[U],
    sigs[NUM_MINHASHES][n_docs])."""
    from itertools import chain

    texts = batch["text"].to_pylist()
    sh_lists = [shingles(tokenize(t)) for t in texts]
    lens = np.fromiter(
        (len(x) for x in sh_lists), np.int64, count=len(sh_lists)
    )
    flat = pa.array(list(chain.from_iterable(sh_lists)), pa.string())
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    rows = _shingle_hash_rows(uniq)
    S = np.ascontiguousarray(rows[:, 0])
    H = np.ascontiguousarray(rows[:, 1:].T)
    starts = np.zeros(len(lens), np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    # every doc has >= 1 shingle (shingles() of an empty token list is
    # the [''] singleton), so reduceat segments are never empty
    sigs = [
        np.minimum.reduceat(H[k][codes], starts)
        if len(codes)
        else np.empty(0, np.int64)
        for k in range(NUM_MINHASHES)
    ]
    return lens, starts, codes, S, sigs


@unreserved
def minhash_signatures(sf_dir: str):
    """(doc_id, sig_0..sig_7) — MinHash over 3-token shingles with
    DuckDB-replicable hashes (SQL-parity)."""

    def f(batch: pa.Table) -> pa.Table:
        _, _, _, _, sigs = _shingle_hashes_and_sigs(batch)
        data = {"doc_id": batch["doc_id"]}
        for k in range(NUM_MINHASHES):
            data[f"sig_{k}"] = pa.array(sigs[k], pa.int64())
        return pa.table(data)

    # big batches: the distinct-shingle md5 dedup only pays off when a
    # batch spans enough docs to repeat shingles (tiny read blocks would
    # hash every occurrence)
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", batch_size=1024
    )


@unreserved
def near_dup_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """(doc_a, doc_b, jaccard) — MinHash-LSH candidate generation
    (band groupby) + exact shingle-set Jaccard verification, fully
    distributed (SQL-parity: the whole op has a DuckDB oracle).

    Scale shape: each doc's (band keys, distinct shingle-hash set) is
    computed in one pass; band rows CARRY the shingle-hash set into the
    band groupby, so every bucket verifies its own candidate pairs with
    no driver-side state and no second corpus read (the band shuffle
    ships each set LSH_BANDS times — bounded, streaming). A final
    (doc_a, doc_b) groupby dedupes pairs that collide in several bands.
    Jaccard is an exact int/int division on both the engine and oracle
    sides, so values match bit-for-bit without rounding."""
    if jaccard_threshold <= 0:
        # the sparse verifier only materializes pairs that SHARE at least
        # one shingle; a non-positive threshold would also claim
        # zero-overlap pairs, which no LSH candidate path can produce
        raise ValueError("jaccard_threshold must be > 0")

    def band_rows(batch: pa.Table) -> pa.Table:
        lens, starts, codes, S, sigs = _shingle_hashes_and_sigs(batch)
        n = len(lens)
        sh_hash = S[codes] if len(codes) else np.empty(0, np.int64)
        sets = [
            np.unique(sh_hash[starts[i] : starts[i] + lens[i]])
            for i in range(n)
        ]
        set_offs = np.zeros(n + 1, np.int32)
        np.cumsum([len(s) for s in sets], out=set_offs[1:])
        sh_col = pa.ListArray.from_arrays(
            pa.array(set_offs, pa.int32()),
            pa.array(
                np.concatenate(sets) if sets else np.empty(0, np.int64),
                pa.int64(),
            ),
        )
        parts = []
        for b in range(LSH_BANDS):
            h1, h2 = sigs[2 * b], sigs[2 * b + 1]
            keys = [f"{b}:{h1[i]}:{h2[i]}" for i in range(n)]
            parts.append(
                pa.table(
                    {
                        "band_key": pa.array(keys, pa.string()),
                        "doc_id": batch["doc_id"],
                        "sh": sh_col,
                    }
                )
            )
        return pa.concat_tables(parts)

    banded = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow", batch_size=1024
    )

    def bucket_verify(group: pa.Table) -> pa.Table:
        """Vectorized verification of ONE band bucket's candidates.

        Hot-bucket shape (the 100×-scale hazard: thousands of
        near-identical docs landing in one band bucket) is handled in
        two steps, replacing the former per-pair Python
        ``np.intersect1d`` loop:

        1. EXACT-set collapse — docs whose shingle sets are identical
           (verified bytewise, not just by signature) form one class;
           a bucket of n exact dups costs O(n·set) + the inherent
           output pairs (jaccard 1.0), never an O(n²) verify.
        2. Class representatives are verified by SPARSE intersection
           counting: one argsort of (shingle, rep) incidences, then a
           fully vectorized within-run pair expansion + ``np.unique``
           count. Memory and work are O(Σ_shingle k·(k−1)/2) — exactly
           the inherent sparse pair-verify cost — with NO dense
           reps×shingles or reps×reps slab at any bucket size.
        """
        group = group.combine_chunks()
        ids = group["doc_id"].to_numpy()
        sh = group["sh"].chunk(0) if hasattr(group["sh"], "chunk") else group["sh"]
        vals = sh.values.to_numpy(zero_copy_only=False)
        offs = sh.offsets.to_numpy().astype(np.int64)

        # sort by doc id; drop same-doc repeats (identical band rows)
        order = np.argsort(ids, kind="stable")
        keep = np.ones(len(order), bool)
        keep[1:] = ids[order[1:]] != ids[order[:-1]]
        order = order[keep]
        n = len(order)
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        ids_s = ids[order]
        lens = (offs[order + 1] - offs[order]).astype(np.int64)

        # ---- 1. exact-set classes (signature, then bytewise verify) ----
        pad = np.zeros(len(vals) + 1, np.int64)
        np.cumsum(vals, out=pad[1:])
        sums = pad[offs[order] + lens] - pad[offs[order]]
        cls = np.full(n, -1, np.int64)  # row -> class id
        next_cls = 0
        sig_order = np.lexsort((sums, lens))
        sig_bounds = np.flatnonzero(
            np.diff(lens[sig_order]) | np.diff(sums[sig_order])
        )
        for grp in np.split(sig_order, sig_bounds + 1):
            if len(grp) == 1:
                cls[grp[0]] = next_cls
                next_cls += 1
                continue
            L = int(lens[grp[0]])
            if L == 0:
                cls[grp] = next_cls
                next_cls += 1
                continue
            M = vals[offs[order[grp], None] + np.arange(L)]
            _, inv = np.unique(M, axis=0, return_inverse=True)
            cls[grp] = next_cls + inv
            next_cls += int(inv.max()) + 1
        reps_rows = np.zeros(next_cls, np.int64)  # class -> first row
        seen = np.zeros(next_cls, bool)
        for r in range(n):
            c = cls[r]
            if not seen[c]:
                seen[c] = True
                reps_rows[c] = r
        R = next_cls

        # ---- 2. rep × rep verify via sparse intersection counting ------
        rep_offs = offs[order[reps_rows]]
        rep_lens = lens[reps_rows]
        flat = (
            np.concatenate(
                [
                    vals[rep_offs[i] : rep_offs[i] + rep_lens[i]]
                    for i in range(R)
                ]
            )
            if rep_lens.sum()
            else np.empty(0, np.int64)
        )
        row_of = np.repeat(np.arange(R), rep_lens)
        cls_a = np.empty(0, np.int64)
        cls_b = np.empty(0, np.int64)
        cls_j = np.empty(0, np.float64)
        if len(flat):
            by_code = np.argsort(flat, kind="stable")
            codes_s = flat[by_code]
            rows_s = row_of[by_code]  # within a run: strictly increasing
            starts = np.flatnonzero(np.r_[True, np.diff(codes_s) != 0])
            run_len = np.diff(np.r_[starts, len(codes_s)])
            # every non-last element of a run anchors (k-1-local_i) pairs
            run_of = np.repeat(np.arange(len(starts)), run_len)
            local_i = np.arange(len(codes_s)) - starts[run_of]
            counts = run_len[run_of] - 1 - local_i  # pairs anchored here
            anchors = np.flatnonzero(counts > 0)
            counts = counts[anchors]
            if len(anchors):
                a_pos = np.repeat(anchors, counts)
                goff = np.r_[0, np.cumsum(counts[:-1])]
                within = np.arange(int(counts.sum())) - np.repeat(
                    goff, counts
                )
                b_pos = a_pos + 1 + within
                # rows strictly increase within a run -> ra < rb always
                pair_key = rows_s[a_pos] * np.int64(R) + rows_s[b_pos]
                keys, inter = np.unique(pair_key, return_counts=True)
                ra = keys // R
                rb = keys % R
                la = rep_lens[ra].astype(np.float64)
                lb = rep_lens[rb].astype(np.float64)
                union = la + lb - inter
                jac = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
                hit = jac >= jaccard_threshold
                cls_a, cls_b, cls_j = ra[hit], rb[hit], jac[hit]

        # ---- expand classes back to doc pairs --------------------------
        members: list[np.ndarray] = [None] * R  # class -> sorted doc ids
        cls_sorted = np.argsort(cls, kind="stable")
        mb = np.flatnonzero(np.diff(cls[cls_sorted]))
        for grp in np.split(cls_sorted, mb + 1):
            members[cls[grp[0]]] = ids_s[np.sort(grp)]
        a_parts, b_parts, j_parts = [], [], []
        # within-class: all pairs, jaccard exactly 1.0 (identical sets)
        if 1.0 >= jaccard_threshold:
            for m in members:
                k = len(m)
                if k > 1:
                    iu, ju = np.triu_indices(k, 1)
                    a_parts.append(m[iu])
                    b_parts.append(m[ju])
                    j_parts.append(np.ones(len(iu), np.float64))
        # cross-class pairs
        for x in range(len(cls_a)):
            ma, mbm = members[cls_a[x]], members[cls_b[x]]
            A = np.repeat(ma, len(mbm))
            B = np.tile(mbm, len(ma))
            a_parts.append(np.minimum(A, B))
            b_parts.append(np.maximum(A, B))
            j_parts.append(np.full(len(A), cls_j[x]))
        if not a_parts:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_parts), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_parts), pa.int64()),
                "jaccard": pa.array(np.concatenate(j_parts), pa.float64()),
            }
        )

    # pre-shuffle coalesce sized from the corpus footprint (×LSH_BANDS
    # expansion) — NOT a hard-coded 8: at 100× corpus size the banded
    # dataset is already wide and a forced 8-block all-to-all would be a
    # bottleneck, so the coalesce is skipped above the width cap.
    pairs = _coalesced(
        banded, sf_dir, expansion=float(LSH_BANDS)
    ).groupby("band_key").map_groups(bucket_verify, batch_format="pyarrow")
    # dedupe pairs that matched in several bands (identical jaccard)
    from ray.data.aggregate import Min

    return _coalesced(pairs, sf_dir, floor=4).groupby(
        ["doc_a", "doc_b"]
    ).aggregate(Min("jaccard", alias_name="jaccard"))


@unreserved
def simhash_codes(sf_dir: str):
    """(doc_id, simhash) — 63-bit weighted simhash per doc (SQL-parity via
    generated per-bit CASE sums). Each DISTINCT term in the batch is
    md5-hashed once; the per-doc ±1-weighted bit sums are one
    ``np.add.at`` over distinct (doc, term) pairs."""
    from ..functions.hashing import md5_u64

    def f(batch: pa.Table) -> pa.Table:
        _, doc_idx, codes, uniq = _batch_token_codes(batch)
        nd = batch.num_rows
        U = len(uniq)
        bit_idx = np.arange(63, dtype=np.uint64)
        if U:
            cache = _TERM_U64_CACHE
            if len(cache) >= _HASH_CACHE_MAX:
                cache.clear()
            hv = np.fromiter(
                (
                    cache[u]
                    if u in cache
                    else cache.setdefault(u, md5_u64(u))
                    for u in uniq
                ),
                np.uint64,
                count=U,
            )
            # (U, 63) ±1 sign matrix, one row per distinct term
            bits = (
                ((hv[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
                * 2
                - 1
            )
            uk, w = np.unique(doc_idx * U + codes, return_counts=True)
            acc = np.zeros((nd, 63), np.int64)
            np.add.at(acc, uk // U, w[:, None] * bits[uk % U])
            sim = ((acc > 0).astype(np.uint64) << bit_idx).sum(axis=1)
        else:
            sim = np.zeros(nd, np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sim.astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", batch_size=1024
    )


@unreserved
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """(doc_a, doc_b, jaccard) — LSH-candidate near-dup with a lower
    threshold (n-gram Jaccard variant of near_dup_pairs)."""
    return near_dup_pairs(sf_dir, jaccard_threshold=threshold)


# ---------------------------------------------------------------------------
# similarity search over embeddings


def _embedding_matrix(col) -> np.ndarray:
    """(n, dim) float64 from a ``list<double>`` column via the
    offsets-safe ``flatten().reshape`` recipe — no per-row Python
    decode."""
    if hasattr(col, "combine_chunks"):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    return flat.reshape(n, -1)


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    # Point read with predicate pushdown — only row groups whose
    # statistics admit vec_id=0 are decoded, never the whole table.
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"],
        filters=[("vec_id", "==", 0)],
    )
    if t.num_rows == 0:
        raise ValueError(
            "embedding query is defined as vec_id=0, which is absent "
            f"from {sf_dir}/embeddings.parquet"
        )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


@unreserved
def embedding_topk(sf_dir: str, k: int = 20):
    """(vec_id, cos) — brute-force cosine top-k vs the vec_id=0 query
    vector, broadcast once via ray.put and matmul'd per batch (the
    baseline ANN path; SQL-parity via list_cosine_similarity).

    Top-k is a per-batch PARTIAL top-k (each batch emits at most k rows)
    merged on the driver — a few k-row tables, not an all-to-all
    ``Dataset.sort`` over every vector (at 10^12 vectors a global sort
    moves the whole table to rank 20 rows)."""
    q = _query_vector(sf_dir)
    q_ref = ray.put(q)

    def f(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        qn = np.sqrt(np.dot(qv, qv))
        emb = _embedding_matrix(batch["embedding"])
        norms = np.sqrt((emb * emb).sum(axis=1))
        denom = norms * qn
        cos = (emb @ qv) / np.where(denom == 0, 1.0, denom)
        ids = batch["vec_id"].to_numpy()
        if len(cos) > k:  # partial top-k: (cos desc, vec_id asc)
            sel = np.lexsort((ids, -cos))[:k]
            cos, ids = cos[sel], ids[sel]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow"
    )
    t = _to_table(ds)  # ≤ k rows per batch — driver-small by construction
    order = np.lexsort((t["vec_id"].to_numpy(), -t["cos"].to_numpy()))[:k]
    t = t.take(pa.array(order))
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()], pa.float64()
            ),
        }
    )


def ann_topk_checked(sf_dir: str, k: int = 10):
    """(vec_id, cos, ivf_recall_ok, pq_recall_ok, lsh_cos_exact) — the
    DRIVER-CHECKABLE form of the three approximate-nearest-neighbor
    variants (same pattern as ``hll_distinct_users_checked``): rows are
    the EXACT brute-force top-k (SQL-expressible via
    ``list_cosine_similarity``), and the flags assert each ANN path's
    guarantee — IVF recall@k ≥ 0.8 (measured 0.9–1.0 at every sf),
    PQ ADC+rerank recall@k ≥ 0.6 (the pytest gate), and every
    LSH-bucket hit's cosine equal to the brute-force value to 1e-9
    (LSH's claim is exactness WITHIN the probed bucket, not recall).
    The oracle emits the same exact rows with ``true`` flags."""
    exact = embedding_topk(sf_dir, k=k)
    exact_ids = set(exact["vec_id"].to_pylist())
    ivf = set(embedding_ivf_topk(sf_dir, k=k)["vec_id"].to_pylist())
    pq_ids = set(embedding_pq_topk(sf_dir, k=k)["vec_id"].to_pylist())
    lsh = embedding_lsh_topk(sf_dir, k=k)
    # recall denominator = |exact| (≤ k when the table itself is small —
    # the one-row robustness gate), never a bare k
    denom = max(len(exact_ids), 1)
    ivf_ok = len(ivf & exact_ids) / denom >= 0.8
    pq_ok = len(pq_ids & exact_ids) / denom >= 0.6
    # LSH exactness: recompute the returned ids' cosines brute-force
    lsh_ids = lsh["vec_id"].to_pylist()
    lsh_cos = {
        int(i): float(c)
        for i, c in zip(lsh_ids, lsh["cos"].to_pylist())
    }
    q = _query_vector(sf_dir)
    qn = float(np.sqrt(np.dot(q, q)))
    ids_arr = np.array(sorted(lsh_ids), np.int64)

    def probe(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(vid) or not len(ids_arr):
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        pos = np.searchsorted(ids_arr, vid)
        pos[pos >= len(ids_arr)] = len(ids_arr) - 1
        mask = ids_arr[pos] == vid
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        emb = _embedding_matrix(batch.filter(pa.array(mask))["embedding"])
        vid = vid[mask]
        norms = np.sqrt((emb * emb).sum(axis=1))
        denom = norms * qn
        cos = (emb @ q) / np.where(denom == 0, 1.0, denom)
        return pa.table(
            {"vec_id": pa.array(vid, pa.int64()),
             "cos": pa.array(cos, pa.float64())}
        )

    lsh_ok = True
    if lsh_ids:
        truth = _to_table(
            read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
                probe, batch_format="pyarrow"
            )
        )
        tmap = {
            int(i): float(c)
            for i, c in zip(
                truth["vec_id"].to_pylist(), truth["cos"].to_pylist()
            )
        }
        lsh_ok = all(
            abs(lsh_cos[i] - round4(tmap.get(i, float("nan")))) < 1e-9
            for i in lsh_cos
        )
    n = exact.num_rows
    return pa.table(
        {
            "vec_id": exact["vec_id"],
            "cos": exact["cos"],
            "ivf_recall_ok": pa.array([ivf_ok] * n, pa.bool_()),
            "pq_recall_ok": pa.array([pq_ok] * n, pa.bool_()),
            "lsh_cos_exact": pa.array([lsh_ok] * n, pa.bool_()),
        }
    )


@unreserved
def embedding_cosine_pairs(sf_dir: str, threshold: float = 0.4):
    """(vec_a, vec_b, cos) — embedding-cosine near-duplicate pairs:
    every pair of vectors with cosine >= threshold (SQL-parity via
    list_cosine_similarity self-join).

    Scale shape: a distributed pre-pass decodes each row block ONCE into
    a float64 matrix + norms (a ``map_batches`` stage, so the
    list<float>→ndarray conversion is O(B), not O(B²)); the decoded
    blocks live in the OBJECT STORE (never re-shipped per task) and the
    B·(B+1)/2 block pairs fan out as a Dataset of (i, j) work items,
    each task one matmul, emitting only the above-threshold pairs.
    Exact all-pairs is O(n²) by definition — the baseline; when n makes
    that infeasible the LSH-bucketed prefilter (``embedding_lsh_topk``'s
    hyperplane buckets) bounds each task to one bucket instead."""

    def decode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "emb": pa.array([], pa.list_(pa.float64())),
                    "norm": pa.array([], pa.float64()),
                }
            )
        arr = batch["embedding"]
        if hasattr(arr, "combine_chunks"):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        emb = flat.reshape(n, -1)
        norms = np.sqrt((emb * emb).sum(axis=1))
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "emb": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (n + 1) * emb.shape[1], emb.shape[1]),
                        pa.int32(),
                    ),
                    pa.array(flat, pa.float64()),
                ),
                "norm": pa.array(np.where(norms == 0, 1.0, norms), pa.float64()),
            }
        )

    refs = _arrow_block_refs(
        read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
            decode, batch_format="pyarrow"
        )
    )

    def _block(tbl: pa.Table):
        n = tbl.num_rows
        if n == 0:
            return None
        ids = tbl["vec_id"].to_numpy()
        col = tbl["emb"]
        if hasattr(col, "combine_chunks"):
            col = col.combine_chunks()
        emb = col.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        return ids, emb, tbl["norm"].to_numpy()

    def cross(batch: pa.Table) -> pa.Table:
        a_out, b_out, c_out = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ba = _block(ray.get(refs[i]))
            bb = _block(ray.get(refs[j]))
            if ba is None or bb is None:
                continue
            ida, ea, na = ba
            idb, eb, nb = bb
            cos = (ea @ eb.T) / np.outer(na, nb)
            # each unordered pair exactly once: the (i, j) task owns the
            # block pair, and every qualifying pair is emitted id-ordered
            # (vec_a < vec_b) whichever block each id sits in
            hot = cos >= threshold
            mask = (ida[:, None] < idb[None, :]) & hot
            ai, bi = np.nonzero(mask)
            a_out.append(ida[ai])
            b_out.append(idb[bi])
            c_out.append(cos[ai, bi])
            if i != j:
                rmask = (ida[:, None] > idb[None, :]) & hot
                ai, bi = np.nonzero(rmask)
                a_out.append(idb[bi])
                b_out.append(ida[ai])
                c_out.append(cos[ai, bi])
        a = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        c = np.concatenate(c_out) if c_out else np.empty(0, np.float64)
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "cos": pa.array(
                    [round4(float(x)) for x in c], pa.float64()
                ),
            }
        )

    nb = len(refs)
    items = [
        {"i": i, "j": j} for i in range(nb) for j in range(i, nb)
    ]
    return ray.data.from_items(items).map_batches(
        cross, batch_format="pyarrow", batch_size=1
    )


@unreserved
def embedding_cosine_pairs_lsh(
    sf_dir: str,
    threshold: float = 0.4,
    nplanes: int = 4,
    ntables: int = 4,
    seed: int = 42,
):
    """(vec_a, vec_b, cos) — the LSH-bucketed SCALE PATH for
    embedding-cosine near-dup: ``ntables`` independent hyperplane hash
    tables; each vector lands in one bucket per table (rows replicated
    ntables×, like the MinHash bands), one ``groupby`` shuffle
    co-locates candidates, only same-bucket pairs are scored, and a
    final (vec_a, vec_b) groupby dedupes pairs caught by several tables
    — per-bucket work replaces the exact op's O(B²) block-pair fan-out.
    Approximate (a θ-angle pair is missed by all tables w.p.
    (1-(1-θ/π)^nplanes)^ntables) → rows-only driver check; recall vs the
    exact op is pytest-gated. Every emitted pair is
    exact-cosine-verified, so precision is 1 (a strict subset of
    ``embedding_cosine_pairs``)."""
    import pyarrow.parquet as pq

    # hoist the hyperplane generation out of the batch fn (per-batch
    # RandomState setup is exactly the per-batch state the brief bans):
    # same seed → same draw sequence as the previous per-batch derivation
    f0 = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    dim = len(f0.read_row_group(0, columns=["embedding"])["embedding"][0])
    rng = np.random.RandomState(seed)
    planes_stack = np.stack([rng.randn(nplanes, dim) for _ in range(ntables)])
    planes_ref = ray.put(planes_stack)

    def bucket(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.string()),
                    "vec_id": pa.array([], pa.int64()),
                    "emb": pa.array([], pa.list_(pa.float64())),
                }
            )
        arr = batch["embedding"]
        if hasattr(arr, "combine_chunks"):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        emb = flat.reshape(n, -1)
        emb_col = pa.ListArray.from_arrays(
            pa.array(
                np.arange(0, (n + 1) * emb.shape[1], emb.shape[1]),
                pa.int32(),
            ),
            pa.array(flat, pa.float64()),
        )
        all_planes = ray.get(planes_ref)
        parts = []
        for t in range(ntables):
            planes = all_planes[t]
            keys = ((emb @ planes.T) > 0).dot(1 << np.arange(nplanes))
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array(
                            [f"{t}:{k}" for k in keys], pa.string()
                        ),
                        "vec_id": batch["vec_id"].cast(pa.int64()),
                        "emb": emb_col,
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        n = group.num_rows
        empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        ids = group["vec_id"].to_numpy()
        col = group["emb"]
        if hasattr(col, "combine_chunks"):
            col = col.combine_chunks()
        emb = col.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        norms = np.sqrt((emb * emb).sum(axis=1))
        norms = np.where(norms == 0, 1.0, norms)
        cos = (emb @ emb.T) / np.outer(norms, norms)
        mask = (ids[:, None] < ids[None, :]) & (cos >= threshold)
        ai, bi = np.nonzero(mask)
        return pa.table(
            {
                "vec_a": pa.array(ids[ai], pa.int64()),
                "vec_b": pa.array(ids[bi], pa.int64()),
                "cos": pa.array(
                    [round4(float(x)) for x in cos[ai, bi]], pa.float64()
                ),
            }
        )

    from ray.data.aggregate import Min

    pairs = (
        read_embeddings(sf_dir, ["vec_id", "embedding"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # dedupe pairs that collide in several tables (identical exact cos)
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Min("cos", alias_name="cos")
    )


NUM_HYPERPLANES = 6


@unreserved
def embedding_lsh_topk(sf_dir: str, k: int = 10, seed: int = 42):
    """(vec_id, cos) — LSH-bucketed approximate variant: seeded random
    hyperplanes → sign-bit bucket key; only the query's bucket is scanned
    (the scale path: at 10^12 vectors the bucket groupby is the shuffle
    and each bucket is a partition). Approximate → no SQL oracle."""
    q = _query_vector(sf_dir)
    rng = np.random.RandomState(seed)
    planes = rng.randn(NUM_HYPERPLANES, len(q))
    qkey = int((planes @ q > 0).dot(1 << np.arange(NUM_HYPERPLANES)))
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)

    def f(batch: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        qv = ray.get(q_ref)
        emb = _embedding_matrix(batch["embedding"])
        keys = ((emb @ P.T) > 0).dot(1 << np.arange(NUM_HYPERPLANES)).astype(np.int64)
        mask = keys == qkey
        emb = emb[mask]
        ids = batch["vec_id"].to_numpy()[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        qn = np.sqrt(np.dot(qv, qv))
        norms = np.sqrt((emb * emb).sum(axis=1))
        denom = norms * qn
        cos = (emb @ qv) / np.where(denom == 0, 1.0, denom)
        return pa.table(
            {"vec_id": pa.array(ids), "cos": pa.array(cos, pa.float64())}
        )

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow"
    )
    # the LSH filter leaves a driver-small candidate set; sort it locally
    # (a distributed sort over near-empty blocks buys nothing)
    t = _to_table(ds)
    order = np.lexsort((t["vec_id"].to_numpy(), -t["cos"].to_numpy()))[:k]
    t = t.take(pa.array(order))
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()], pa.float64()
            ),
        }
    )


def _emb_unit_mat(batch: pa.Table) -> np.ndarray:
    """Unit-normalized float64 embedding matrix for a batch — flatten()
    honors slice offsets; one vectorized cast, no row loop."""
    arr = batch["embedding"]
    if hasattr(arr, "combine_chunks"):
        arr = arr.combine_chunks()
    emb = (
        arr.flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(batch.num_rows, -1)
    )
    norms = np.sqrt((emb * emb).sum(axis=1))
    return emb / np.where(norms == 0.0, 1.0, norms)[:, None]


def _kmeans_train(sf_dir: str, nlist: int, iters: int) -> np.ndarray:
    """Distributed spherical Lloyd iterations; returns unit centroids.

    Deterministic init: the nlist lowest-vec_id vectors of the FIRST row
    group (one bounded head read — never a full-table scan). Each pass
    streams per-batch (cell, sum, count) PARTIALS (nlist×dim-sized,
    tiny) merged driver-side — centroid state is the only
    driver-resident object, O(nlist·dim) regardless of corpus size;
    centroids ship via ``ray.put`` once per pass."""
    import pyarrow.parquet as pq

    head = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(
        0, columns=["vec_id", "embedding"]
    )
    order = np.argsort(head["vec_id"].to_numpy(), kind="stable")[:nlist]
    cent = _emb_unit_mat(head.take(pa.array(order)))

    for _ in range(iters):
        c_ref = ray.put(cent)

        def train_partial(batch: pa.Table) -> pa.Table:
            C = ray.get(c_ref)
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cell": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            X = _emb_unit_mat(batch)
            assign = np.argmax(X @ C.T, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, X)
            cnt = np.bincount(assign, minlength=len(C))
            return pa.table(
                {
                    "cell": pa.array(np.arange(len(C)), pa.int64()),
                    "vsum": pa.array(
                        [row.tolist() for row in sums],
                        pa.list_(pa.float64()),
                    ),
                    "cnt": pa.array(cnt, pa.int64()),
                }
            )

        partials = _to_table(
            read_embeddings(sf_dir, ["embedding"]).map_batches(
                train_partial, batch_format="pyarrow"
            )
        )
        cells = partials["cell"].to_numpy()
        cnts = partials["cnt"].to_numpy()
        vs = np.stack(
            [np.asarray(v, np.float64) for v in partials["vsum"].to_pylist()]
        )
        sums = np.zeros_like(cent)
        np.add.at(sums, cells, vs)
        total = np.bincount(cells, weights=cnts, minlength=len(cent))
        keep = total > 0
        newc = cent.copy()  # empty cells keep their old centroid
        newc[keep] = sums[keep] / total[keep][:, None]
        norms = np.sqrt((newc * newc).sum(axis=1))
        cent = newc / np.where(norms == 0.0, 1.0, norms)[:, None]
    return cent


@unreserved
def embedding_ivf_topk(
    sf_dir: str,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 3,
    iters: int = 2,
):
    """(vec_id, cos) — IVF (inverted-file) approximate nearest neighbour:
    a coarse quantizer (distributed Lloyd iterations) partitions vectors
    into nlist cells; the query probes only the nprobe nearest cells, so
    a scan touches ~nprobe/nlist of the data — the scale path next to the
    brute-force baseline (``embedding_topk``) and the hyperplane LSH
    variant. Approximate → rows-only driver check; recall-vs-brute-force
    is pytest-gated.

    Every pass is streaming ``map_batches``: training emits per-batch
    (cell, sum, count) PARTIALS (nlist×dim-sized, tiny) that are merged
    driver-side — the centroid state is the only driver-resident object,
    O(nlist·dim) regardless of corpus size; centroids/query ship via
    ``ray.put`` once per pass. Deterministic: centroids init from the
    nlist smallest vec_ids, no RNG."""

    cent = _kmeans_train(sf_dir, nlist, iters)
    q = _query_vector(sf_dir)
    q = q / (np.linalg.norm(q) or 1.0)

    probe = set(
        int(c) for c in np.argsort(-(cent @ q), kind="stable")[:nprobe]
    )
    c_ref = ray.put(cent)
    q_ref = ray.put(q)

    def scan(batch: pa.Table) -> pa.Table:
        C, qv = ray.get(c_ref), ray.get(q_ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        X = _emb_unit_mat(batch)
        assign = np.argmax(X @ C.T, axis=1)
        mask = np.isin(assign, list(probe))
        ids = batch["vec_id"].to_numpy()[mask]
        cos = X[mask] @ qv
        if len(cos) > k:
            sel = np.lexsort((ids, -cos))[:k]
            cos, ids = cos[sel], ids[sel]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    t = _to_table(
        read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
            scan, batch_format="pyarrow"
        )
    )
    sel = np.lexsort((t["vec_id"].to_numpy(), -t["cos"].to_numpy()))[:k]
    t = t.take(pa.array(sel))
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()],
                pa.float64(),
            ),
        }
    )


_EMBEDDER_CACHE: dict = {}


def _embed_batch(batch: pa.Table, dim: int = 32) -> pa.Table:
    """Stateless-task embedding with the model cached per worker
    PROCESS (the tokenizer's warm-worker pattern): plain tasks reuse
    Ray's already-warm workers, so nothing pays a fresh actor process,
    while the projection matrix is still built once per worker."""
    from ..stages.embedder import HashingEmbedder

    inst = _EMBEDDER_CACHE.get(dim)
    if inst is None:
        inst = HashingEmbedder(dim=dim)
        _EMBEDDER_CACHE[dim] = inst
    return inst(batch)


@unreserved
def embed_documents(
    sf_dir: str,
    dim: int = 32,
    concurrency: int | None = None,
    batch_size: int = 512,
):
    """(doc_id, embedding list<double>) — deterministic hashing-embedding
    of the documents table (SURVEY.md §2 ST3). Default: stateless tasks
    over warm workers with a per-process model cache (identical output,
    no actor-spawn latency); pass ``concurrency`` for the explicit
    ACTOR-POOL form (model built once per actor in ``__init__`` — the
    shape a heavyweight learned model uses). Streams; at scale the
    output is written partitioned, not collected."""
    from ..stages.embedder import HashingEmbedder

    ds = read_documents(sf_dir, ["doc_id", "text"])
    if concurrency:
        return ds.map_batches(
            HashingEmbedder,
            fn_constructor_kwargs=dict(dim=dim),
            batch_size=batch_size,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return ds.map_batches(
        _embed_batch,
        fn_kwargs=dict(dim=dim),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


@unreserved
def embed_then_topk(sf_dir: str, k: int = 20, dim: int = 32):
    """(doc_id, cos) — full corpus→embeddings→similarity pipeline: embed
    every document with the actor-pool stage, then brute-force cosine
    top-k against doc 0's embedding (broadcast once; per-batch partial
    top-k, tiny driver merge). Model scoring → no SQL oracle; gated by
    determinism/geometry pytest."""
    import pyarrow.parquet as pq

    from ..stages.embedder import HashingEmbedder

    row = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filters=[("doc_id", "==", 0)],
    )
    q = HashingEmbedder(dim=dim).embed([row["text"][0].as_py()])[0]
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        arr = batch["embedding"]
        if hasattr(arr, "combine_chunks"):  # multi-chunk batches
            arr = arr.combine_chunks()
        # flatten() honors slice offsets (unlike .values on sliced arrays)
        emb = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, len(qv))
        cos = emb @ qv  # both sides L2-normalized by the embedder
        ids = batch["doc_id"].to_numpy()
        if len(cos) > k:
            sel = np.lexsort((ids, -cos))[:k]
            cos, ids = cos[sel], ids[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    ds = embed_documents(sf_dir, dim=dim).map_batches(
        score, batch_format="pyarrow"
    )
    t = _to_table(ds)  # ≤ k rows per batch
    order = np.lexsort((t["doc_id"].to_numpy(), -t["cos"].to_numpy()))[:k]
    t = t.take(pa.array(order))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# trained embeddings (PPMI-SVD — the learned counterpart of the hashing
# embedder; closes SURVEY.md §2 ST3 against the reference's Doc2Vec)

_TRAINED_MODEL_CACHE: dict = {}


def train_embeddings(
    sf_dir: str,
    dim: int = 32,
    window: int = 4,
    vocab_size: int = 1024,
    min_count: int = 2,
):
    """Train a ``PPMISVDModel`` over the documents table — distributed
    corpus statistics, model-sized driver factorization (the plan the
    reference's ``Doc2Vec.py:18-55`` gensim training is re-expressed
    as; Levy & Goldberg 2014 justify PPMI-SVD as word2vec's implicit
    factorization).

    Scale shape (two streaming corpus passes, zero corpus-sized driver
    state):
    1. **Vocabulary**: per-batch (term, cnt) partials →
       ``groupby(term)`` sum → per-block top-``vocab_size`` prune →
       the driver merges ≤ V rows per block and keeps the global top-V
       by (count desc, term asc). V caps every later cost.
    2. **Co-occurrence**: the sorted vocab broadcasts once via
       ``ray.put``; each batch maps its token stream to vocab ids
       (searchsorted, OOV dropped) and emits symmetric-window pair
       partials keyed ``a·V+b`` — ≤ V² rows per block, usually far
       sparser — and ONE ``groupby(key)`` sums them globally.
    3. **Factorization**: the driver densifies the V×V PPMI matrix and
       takes a truncated SVD — O(V²) memory / O(V³) work on MODEL-sized
       data (the same budget as the IVF centroid trainer), independent
       of corpus size.
    """
    from ray.data.aggregate import Sum

    from ..stages.embedder import PPMISVDModel

    def term_partial(batch: pa.Table) -> pa.Table:
        _, _, codes, uniq = _batch_token_codes(batch)
        if not len(uniq):
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        uc, ucnt = np.unique(codes, return_counts=True)
        ua = np.asarray(uniq, object)
        return pa.table(
            {
                "term": pa.array(ua[uc], pa.string()),
                "cnt": pa.array(ucnt.astype(np.int64), pa.int64()),
            }
        )

    def block_topv(batch: pa.Table) -> pa.Table:
        # post-groupby per-block prune: the driver sees ≤ V rows/block
        t = batch["term"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        keep = c >= min_count
        t, c = t[keep], c[keep]
        if len(t) > vocab_size:
            sel = np.lexsort((t, -c))[:vocab_size]
            t, c = t[sel], c[sel]
        return pa.table(
            {"term": pa.array(t, pa.string()),
             "cnt": pa.array(c, pa.int64())}
        )

    counts = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(term_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(block_topv, batch_format="pyarrow")
    )
    t = np.asarray(counts["term"].to_pylist(), object)
    c = counts["cnt"].to_numpy(zero_copy_only=False)
    if len(t) > vocab_size:
        sel = np.lexsort((t, -c))[:vocab_size]
        t = t[sel]
    vocab = np.sort(t)
    V = len(vocab)
    if V == 0:
        return PPMISVDModel(vocab, np.zeros((0, dim)))
    vocab_ref = ray.put(vocab)

    def cooc_partial(batch: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        _, doc_idx, codes, uniq = _batch_token_codes(batch)
        empty = pa.table(
            {"key": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
        if len(codes) < 2:
            return empty
        ua = np.asarray(uniq, object)
        pos = np.searchsorted(vb, ua)
        pos[pos >= len(vb)] = len(vb) - 1
        vid_of = np.where(vb[pos] == ua, pos, -1).astype(np.int64)
        vid = vid_of[codes]
        keys: list[np.ndarray] = []
        for k in range(1, window + 1):
            if k >= len(vid):
                break
            a, b = vid[:-k], vid[k:]
            ok = (doc_idx[:-k] == doc_idx[k:]) & (a >= 0) & (b >= 0)
            if ok.any():
                keys.append(a[ok] * V + b[ok])
        if not keys:
            return empty
        uk, ucnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "cnt": pa.array(ucnt.astype(np.int64), pa.int64()),
            }
        )

    cooc_t = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(cooc_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    M = np.zeros((V, V), np.float64)
    if cooc_t.num_rows:
        key = cooc_t["key"].to_numpy(zero_copy_only=False)
        cnt = cooc_t["cnt"].to_numpy(zero_copy_only=False)
        M[key // V, key % V] = cnt
    return PPMISVDModel.fit(M + M.T, vocab, dim)


def _trained_model_ref(
    sf_dir: str, dim: int, window: int, vocab_size: int, min_count: int
):
    """Train-once-per-process cache of (model, object ref) — repeated
    pipeline calls over the same corpus reuse the broadcast model."""
    key = (sf_dir, dim, window, vocab_size, min_count)
    hit = _TRAINED_MODEL_CACHE.get(key)
    if hit is None:
        model = train_embeddings(sf_dir, dim, window, vocab_size, min_count)
        hit = (model, ray.put(model))
        _TRAINED_MODEL_CACHE[key] = hit
    return hit


@unreserved
def embed_documents_trained(
    sf_dir: str,
    dim: int = 32,
    window: int = 4,
    vocab_size: int = 1024,
    min_count: int = 2,
    concurrency: int = 2,
    batch_size: int = 512,
):
    """(doc_id, embedding list<double>) — TRAINED-model embedding of the
    documents table: train the PPMI-SVD model (distributed statistics,
    driver factorization), broadcast it once via ``ray.put``, and run
    inference as an actor-pool ``map_batches`` stage (model fetched in
    ``__init__``, never per batch). Streams; model scoring → rows-only
    gate (nearest-neighbor geometry is pytest-gated instead)."""
    from ..stages.embedder import TrainedEmbedder

    _, ref = _trained_model_ref(sf_dir, dim, window, vocab_size, min_count)
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        TrainedEmbedder,
        fn_constructor_kwargs=dict(model_ref=ref),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


@unreserved
def embedding_trained_topk(sf_dir: str, k: int = 10, dim: int = 32):
    """(doc_id, cos) — the reference's ``Doc2VecMostSimilar.py:18-36``
    re-expressed: train embeddings over the corpus, then the k most
    similar documents to doc 0 by cosine (query vector broadcast once;
    per-batch partial top-k; driver merges ≤ k rows per block)."""
    import pyarrow.parquet as pq

    model, _ = _trained_model_ref(sf_dir, dim, 4, 1024, 2)
    # Query doc fetched WITHOUT materializing the corpus text on the
    # driver: min doc_id from the id column alone, then one
    # predicate-pushed point read for that row's text.
    path = f"{sf_dir}/documents.parquet"
    min_id = int(
        pq.read_table(path, columns=["doc_id"])["doc_id"]
        .to_numpy()
        .min()
    )
    row = pq.read_table(
        path, columns=["text"], filters=[("doc_id", "==", min_id)]
    )
    q = model.embed([row["text"][0].as_py()])[0]
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        arr = batch["embedding"]
        if hasattr(arr, "combine_chunks"):
            arr = arr.combine_chunks()
        emb = arr.flatten().to_numpy(zero_copy_only=False).reshape(
            -1, len(qv)
        )
        cos = emb @ qv
        ids_ = batch["doc_id"].to_numpy()
        if len(cos) > k:
            sel = np.lexsort((ids_, -cos))[:k]
            cos, ids_ = cos[sel], ids_[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids_, pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    t = _to_table(
        embed_documents_trained(sf_dir, dim=dim).map_batches(
            score, batch_format="pyarrow"
        )
    )
    order = np.lexsort((t["doc_id"].to_numpy(), -t["cos"].to_numpy()))[:k]
    t = t.take(pa.array(order))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# stream-shaped: tumbling-window aggregate over the events log
#
# Ray Data has no event-time windows/watermarks (the reference is pure
# batch anyway, SURVEY.md §1.3); stream-shaped inputs are treated as an
# ordered, partitioned log: assign the tumbling bucket in a vectorized
# map_batches (with per-batch partial aggregation), then a small final
# groupby — the windowed-aggregate pattern a training-data pipeline uses
# for telemetry/event tables.


def _windowed_events(sf_dir: str, hop_us: int, n_windows: int):
    """Shared tumbling/sliding machinery: assign each event to its
    ``n_windows`` containing hop-aligned windows (1 for tumbling),
    partial-combine per batch, shuffle the combined partials, and cast
    the window key to ``timestamp[us]`` only in the final projection.

    Type fidelity: the window key stays **int64 µs** through the bucket /
    partial / shuffle stages (a pandas hop here silently downgraded
    ``timestamp[us]`` to ``timestamp[s]`` and broke the value-hash gate)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # µs since epoch
        # integer milli-units: float summation order differs between
        # engines in the last ulp; integer sums are order-independent
        # and hash-exact
        mv = np.floor(batch["value"].to_numpy() * 1000.0).astype(np.int64)
        keyed_parts = []
        for off in range(n_windows):
            win = (ts // hop_us - off) * hop_us
            keyed_parts.append(
                pa.table(
                    {
                        "event_type": batch["event_type"],
                        "window_us": pa.array(win, pa.int64()),
                        "value_milli": pa.array(mv, pa.int64()),
                    }
                )
            )
        keyed = pa.concat_tables(keyed_parts)
        g = keyed.group_by(["event_type", "window_us"]).aggregate(
            [("value_milli", "count"), ("value_milli", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_us": g["window_us"],
                "n_events": g["value_milli_count"].cast(pa.int64()),
                "sum_value_milli": g["value_milli_sum"].cast(pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_us"].cast(pa.timestamp("us")),
                "n_events": batch["n_events"],
                "sum_value_milli": batch["sum_value_milli"],
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(8)  # combined partials are tiny; coalesce pre-shuffle
        .groupby(["event_type", "window_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_milli", alias_name="sum_value_milli"),
        )
    )
    return agg.map_batches(finalize, batch_format="pyarrow")


@unreserved
def events_tumbling_window(sf_dir: str, hours: int = 1):
    """(event_type, window_start, n_events, sum_value_milli) — tumbling
    window per event type; Arrow-native partial combine per batch before
    the shuffle (see _windowed_events)."""
    return _windowed_events(sf_dir, hours * 3600 * 1_000_000, 1)


@unreserved
def events_sliding_window(sf_dir: str, window_hours: int = 2, hop_hours: int = 1):
    """(event_type, window_start, n_events, sum_value_milli) — SLIDING
    (hopping) window: each event contributes to window_hours/hop_hours
    hop-aligned windows, assigned vectorized in the same partial-combine
    pass (the duplication happens inside the map task, pre-combined, so
    the shuffle still only moves window-count-bounded partials)."""
    if window_hours % hop_hours != 0:  # not assert: survives python -O
        raise ValueError("window_hours must be a multiple of hop_hours")
    return _windowed_events(
        sf_dir, hop_hours * 3600 * 1_000_000, window_hours // hop_hours
    )


@unreserved
def media_decode(sf_dir: str, n: int = 200):
    """(media_id, kind, width, height, n_frames, feature) — multimodal
    decode through the actor-pool stage over a deterministic synthetic
    media table (binary payload + typed metadata). The decode is REAL
    pixel/sample math for PNG/JPEG/GIF/BMP/PPM/WAV/Y4M via the
    pure-python codecs (stages/mediacodecs.py) — true dimensions,
    luminance-histogram and rFFT-band features — and runs STRICT: a
    payload outside the real codec set would raise instead of falling
    back to the fake (only ffmpeg-class formats remain stubbed). The
    synthetic table is 100% real-codec payloads. Rows-only driver check
    (no SQL media decode)."""
    from ..stages.multimodal import MediaDecode, synthesize_media_table

    ds = ray.data.from_arrow(synthesize_media_table(n, seed=7))
    return ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs=dict(strict=True),
        batch_size=32,
        batch_format="pyarrow",
        concurrency=2,
    )


@unreserved
def media_pipeline(sf_dir: str, n: int = 200):
    """(media_id, frame) — the full multimodal chain as ONE streaming
    Dataset pipeline: decode (payload kept) → aspect-preserving resize →
    video frame sampling (1 row → n rows). Exercises every multimodal
    actor-pool stage end-to-end; rows-only driver check."""
    from ..stages.multimodal import (
        FrameSample,
        MediaDecode,
        MediaResize,
        synthesize_media_table,
    )

    ds = ray.data.from_arrow(synthesize_media_table(n, seed=7))
    return (
        ds.map_batches(
            MediaDecode,
            fn_constructor_kwargs=dict(keep_payload=True, strict=True),
            batch_size=32,
            batch_format="pyarrow",
            concurrency=2,
        )
        .map_batches(
            MediaResize,
            fn_constructor_kwargs=dict(max_w=96, max_h=96, strict=True),
            batch_size=32,
            batch_format="pyarrow",
            concurrency=2,
        )
        .map_batches(
            FrameSample,
            fn_constructor_kwargs=dict(every=8),
            batch_size=32,
            batch_format="pyarrow",
            concurrency=2,
        )
    )


# ---------------------------------------------------------------------------
# join-index / adjacency (the reference's reply_to_index as a generic op)


@unreserved
def group_adjacency(sf_dir: str):
    """(o_custkey, orderkeys) — groupby(parent).collect-list lookup table,
    the generic form of the reference's ``reply_to_index``
    (``IndexCreator.py:56-60,181-213``; SURVEY.md §2.5 A4). Keys joined as
    a sorted comma string for a stable, hashable SQL-parity shape."""

    def agg(group) -> pa.Table:
        keys = sorted(group["o_orderkey"].to_pylist())
        return pa.table(
            {
                "o_custkey": group["o_custkey"].slice(0, 1),
                "orderkeys": pa.array(
                    [",".join(str(k) for k in keys)], pa.string()
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    return ds.groupby("o_custkey").map_groups(agg, batch_format="pyarrow")


@unreserved
def broadcast_join_events_customers(sf_dir: str):
    """(event_id, user_id, c_mktsegment, acctbal_cents) — dimension
    enrichment as a BROADCAST hash join: the small side (customer) is
    loaded once on the driver into sorted-key numpy arrays and
    ``ray.put`` ONCE; every events batch resolves its user_ids with two
    ``np.searchsorted`` lookups against the shared object — zero
    shuffle, the fact table streams. This is the canonical small-side
    join shape at 100 TB (a shuffle join would move every event row for
    a dimension that fits in one object); inner semantics, exact SQL
    oracle (acctbal carried as exact cents, not float)."""
    cust = _arrow_blocks(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        )
    )
    cust = [t for t in cust if t.num_columns > 0]
    if not cust:  # empty dimension: Ray drops the schema with the rows
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "c_mktsegment": pa.array([], pa.string()),
                    "acctbal_cents": pa.array([], pa.int64()),
                }
            )
        )
    small = pa.concat_tables(cust).combine_chunks()
    keys = small["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    segs = small["c_mktsegment"].to_numpy(zero_copy_only=False)[order]
    cents = np.round(
        small["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        * 100.0
    ).astype(np.int64)[order]
    side = ray.put((keys, segs, cents))

    def lookup(batch: pa.Table) -> pa.Table:
        k, s, c = ray.get(side)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(k, uid)
        idx_c = np.clip(idx, 0, len(k) - 1)
        hit = k[idx_c] == uid
        return pa.table(
            {
                "event_id": batch["event_id"].filter(pa.array(hit)),
                "user_id": pa.array(uid[hit], pa.int64()),
                "c_mktsegment": pa.array(s[idx_c][hit], pa.string()),
                "acctbal_cents": pa.array(c[idx_c][hit], pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    ).map_batches(lookup, batch_format="pyarrow")


@unreserved
def hash_sample_documents(sf_dir: str, k: int = 10):
    """(doc_id) — DETERMINISTIC 1-in-k sample: keep documents where
    ``md5_i63(str(doc_id)) % k == 0``. Hash-based sampling is the
    training-data sampling primitive that stays stable across runs,
    partitionings and cluster sizes (unlike random_shuffle + limit,
    which is neither reproducible nor cheap — it shuffles everything);
    embarrassingly parallel, zero shuffle, exact SQL oracle."""
    from ..functions.hashing import md5_i63

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.fromiter(
            (md5_i63(str(i)) % k == 0 for i in ids),
            dtype=bool,
            count=len(ids),
        )
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64())})

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def range_join_count(sf_dir: str, scale: float = 1000.0, width: float = 5000.0):
    """(event_id, n_orders) — banded RANGE JOIN: for each event, the
    number of orders whose o_totalprice falls in the half-open band
    [value·scale, value·scale + width). Inner semantics (events with no
    order in band are dropped). Exact SQL oracle (integer counts, same
    IEEE comparisons both sides).

    Ray Data has no non-equi join; the distributed shape is BAND
    BUCKETING: both sides hash to width-sized price buckets — each order
    lands in exactly one bucket, each event is REPLICATED to the (≤2)
    buckets its band overlaps — so one ``groupby(bucket)`` shuffle
    co-locates every candidate pair exactly once; inside a bucket the
    count is two ``np.searchsorted`` calls against the bucket's sorted
    prices. Replica partial counts then sum in a tiny second groupby
    (output-sized, not pair-sized: the 1.5M candidate pairs at sf0.01
    never materialize)."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def ev_rows(batch: pa.Table) -> pa.Table:
        lo = batch["value"].to_numpy() * scale
        b0 = np.floor(lo / width).astype(np.int64)
        b1 = np.floor((lo + width) / width).astype(np.int64)
        eid = batch["event_id"].to_numpy()
        # replica per touched bucket (b1 == b0 + 1 except on the exact
        # boundary; emitting both and exact-filtering inside the bucket
        # keeps the math boundary-safe)
        ids = np.concatenate([eid, eid])
        los = np.concatenate([lo, lo])
        bks = np.concatenate([b0, b1])
        keep = np.concatenate(
            [np.ones(len(eid), bool), b1 != b0]
        )
        return pa.table(
            {
                "bucket": pa.array(bks[keep], pa.int64()),
                "event_id": pa.array(ids[keep], pa.int64()),
                "lo": pa.array(los[keep], pa.float64()),
                "price": pa.nulls(int(keep.sum()), pa.float64()),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy()
        n = len(p)
        return pa.table(
            {
                "bucket": pa.array(
                    np.floor(p / width).astype(np.int64), pa.int64()
                ),
                "event_id": pa.nulls(n, pa.int64()),
                "lo": pa.nulls(n, pa.float64()),
                "price": pa.array(p, pa.float64()),
            }
        )

    both = _coalesced(
        ev.map_batches(ev_rows, batch_format="pyarrow").union(
            orders.map_batches(ord_rows, batch_format="pyarrow")
        ),
        sf_dir,
        "events",
        expansion=1.2,  # ≤2 replicas per event, plus the order rows
    )

    def bucket_count(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.combine_chunks()
        is_ev = pc.is_valid(group["event_id"])
        g_ev = group.filter(is_ev)
        g_or = group.filter(pc.invert(is_ev))
        if g_ev.num_rows == 0 or g_or.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        prices = np.sort(g_or["price"].to_numpy(zero_copy_only=False))
        lo = g_ev["lo"].to_numpy(zero_copy_only=False)
        cnt = np.searchsorted(prices, lo + width, side="left") - np.searchsorted(
            prices, lo, side="left"
        )
        return pa.table(
            {
                "event_id": g_ev["event_id"].cast(pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    per_bucket = both.groupby("bucket").map_groups(
        bucket_count, batch_format="pyarrow"
    )
    # drop zero-count events with a vectorized mask (not a per-row
    # Python filter); the replica-sum groupby input is OUTPUT-sized
    # (one row per matched event replica), so no coalesce here — a
    # repartition would be a third full-size all-to-all (measured 2x
    # slower)
    agg = per_bucket.groupby("event_id").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )

    def nonzero(batch: pa.Table) -> pa.Table:
        mask = batch["n_orders"].to_numpy(zero_copy_only=False) > 0
        return batch.filter(pa.array(mask))

    return agg.map_batches(nonzero, batch_format="pyarrow")


@unreserved
def distinct_users(sf_dir: str):
    """(event_type, n_users) — exact distributed COUNT DISTINCT: each
    batch emits its unique (event_type, user_id) pairs (the partial
    dedup bounds shuffle volume to the distinct-pair count, not the row
    count), then one groupby counts uniques per type. SQL-exact."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"event_type": batch["event_type"], "user_id": batch["user_id"]}
        )
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return g

    def count_group(group: pa.Table) -> pa.Table:
        u = np.unique(group["user_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": group["event_type"].slice(0, 1),
                "n_users": pa.array([len(u)], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("event_type")
        .map_groups(count_group, batch_format="pyarrow")
    )


HLL_P = 12  # 4096 registers; ~1.04/sqrt(m) ≈ 1.6% standard error


@unreserved
def hll_distinct_users(sf_dir: str):
    """(event_type, n_users_est) — HyperLogLog distinct-user sketch per
    event type (Flajolet et al. 2007, with the standard small-range
    linear-counting correction). The mergeable sketch IS the shuffle
    payload: each batch emits its (event_type, register, max_rank)
    partials — m-bounded rows per type regardless of input size — which
    merge with a plain Max aggregate; the estimate is computed per type
    at the end. Approximate → rows-only driver check; error is
    pytest-gated against the exact op."""
    from ray.data.aggregate import Max

    from ..functions.hashing import md5_u64

    m = 1 << HLL_P

    def partial(batch: pa.Table) -> pa.Table:
        # hash each DISTINCT (type, user) once — the md5 loop runs over
        # the distinct-pair count, not the row count
        uniq = pa.table(
            {"event_type": batch["event_type"], "user_id": batch["user_id"]}
        ).group_by(["event_type", "user_id"]).aggregate([])
        et = uniq["event_type"].to_pylist()
        uid = uniq["user_id"].to_pylist()
        best: dict[tuple[str, int], int] = {}
        for e, u in zip(et, uid):
            h = md5_u64(f"u:{u}")
            reg = h & (m - 1)
            w = h >> HLL_P
            # rank: leading-zero count of the remaining 52 bits + 1
            rank = (64 - HLL_P) - w.bit_length() + 1
            k = (e, reg)
            if best.get(k, 0) < rank:
                best[k] = rank
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in best], pa.string()),
                "register": pa.array([k[1] for k in best], pa.int32()),
                "max_rank": pa.array(list(best.values()), pa.int32()),
            }
        )

    def estimate(group: pa.Table) -> pa.Table:
        ranks = np.zeros(m, np.int64)
        regs = group["register"].to_numpy(zero_copy_only=False)
        mr = group["max_rank"].to_numpy(zero_copy_only=False)
        np.maximum.at(ranks, regs, mr)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -ranks.astype(np.float64)).sum()
        zeros = int((ranks == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting
        return pa.table(
            {
                "event_type": group["event_type"].slice(0, 1),
                "n_users_est": pa.array([int(round(est))], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby(["event_type", "register"])
        .aggregate(Max("max_rank", alias_name="max_rank"))
        .groupby("event_type")
        .map_groups(estimate, batch_format="pyarrow")
    )


@unreserved
def hll_distinct_users_checked(sf_dir: str):
    """(event_type, n_users, within_bound) — the DRIVER-CHECKABLE form
    of the HyperLogLog op (flips its CORRECTNESS row from ``no_oracle``
    to a value-hash gate): output rows are the EXACT distinct counts
    (the ``distinct_users`` distributed aggregate, which has a SQL
    oracle), and ``within_bound`` asserts the sketch's error guarantee
    per type — |estimate − exact| ≤ max(5·1.04/√m · exact, 16) (≈5σ of
    the published standard error, plus an absolute floor where linear
    counting rules). The oracle emits the same exact rows with ``true``
    — an out-of-bound estimate flips the flag and fails the hash."""
    exact = _to_table(distinct_users(sf_dir))
    if exact.num_rows == 0 or "event_type" not in exact.column_names:
        # empty events → groupby yields a schema-less table
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
                "within_bound": pa.array([], pa.bool_()),
            }
        )
    est_t = _to_table(hll_distinct_users(sf_dir))
    est_map = {
        t: int(n)
        for t, n in zip(
            est_t["event_type"].to_pylist(), est_t["n_users_est"].to_pylist()
        )
    }
    types = exact["event_type"].to_pylist()
    n_ex = exact["n_users"].to_numpy(zero_copy_only=False)
    m = 1 << HLL_P
    tol = np.maximum(5 * 1.04 / np.sqrt(m) * n_ex, 16.0)
    est = np.array([est_map.get(t, 0) for t in types], np.float64)
    ok = np.abs(est - n_ex) <= tol
    order = np.argsort(np.asarray(types, object))
    return pa.table(
        {
            "event_type": pa.array(np.asarray(types, object)[order], pa.string()),
            "n_users": pa.array(n_ex[order], pa.int64()),
            "within_bound": pa.array(ok[order], pa.bool_()),
        }
    )


def _asof_ev_rows(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch["user_id"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "o_orderkey": pa.nulls(n, pa.int64()),
            "date_us": pa.nulls(n, pa.int64()),
            "o_totalprice": pa.nulls(n, pa.float64()),
        }
    )


def _asof_ord_rows(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch["o_custkey"].cast(pa.int64()),
            "event_id": pa.nulls(n, pa.int64()),
            "ts_us": pa.nulls(n, pa.int64()),
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "date_us": batch["o_orderdate"].cast(pa.int64()),
            "o_totalprice": batch["o_totalprice"].cast(pa.float64()),
        }
    )


_ASOF_EMPTY = pa.table(
    {
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64()),
    }
)


# number of hash buckets the as-of shuffles group by — each bucket holds
# MANY join keys and the evaluator is fully vectorized across them, so
# the shuffle task count is O(buckets), never O(keys). Size to a few ×
# the cluster's core count.
ASOF_BUCKETS = 64


def _asof_add_bucket(batch: pa.Table, with_rng: bool = False) -> pa.Table:
    """Append the hash-bucket grouping column. by_time buckets mix the
    time range in so one hot key's ranges land on DIFFERENT tasks (the
    point of the time-axis decomposition)."""
    key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    if with_rng:
        rng = batch["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((key * 1000003) ^ rng) % ASOF_BUCKETS
    else:
        b = key % ASOF_BUCKETS
    return batch.append_column("bucket", pa.array(b, pa.int64()))


def _asof_eval_backward(group: pa.Table) -> pa.Table:
    """Vectorized MULTI-KEY backward as-of over one hash bucket: union
    rows are lexsorted by (key[, rng], t, side, tie) with builds BEFORE
    probes at equal t (inclusive ≤), then each probe's match is the
    nearest preceding build index — one ``np.maximum.accumulate``, zero
    per-key Python. Among builds with equal (key, date) the accumulate
    lands on the LAST, i.e. max o_orderkey — the documented tie-break.
    Replaces the one-group-per-key ``map_groups`` shape whose per-group
    invocation overhead dominated at 10^5+ keys (78 s → ~4 s at sf0.1
    for the forward twin; same fix applied to both directions)."""
    import pyarrow.compute as pc

    group = group.combine_chunks()
    has_rng = "rng" in group.schema.names
    # split Arrow-side BEFORE to_numpy: a nullable int64 column would
    # otherwise round-trip through float64 (lossy past 2^53)
    is_ev = pc.is_valid(group["event_id"])
    g_ev = group.filter(is_ev)
    g_or = group.filter(pc.invert(is_ev))
    n_p, n_b = g_ev.num_rows, g_or.num_rows
    if n_p == 0 or n_b == 0:
        return _ASOF_EMPTY

    def col(t: pa.Table, name: str, dt) -> np.ndarray:
        return t[name].to_numpy(zero_copy_only=False).astype(dt)

    key = np.concatenate([col(g_ev, "key", np.int64), col(g_or, "key", np.int64)])
    t = np.concatenate([col(g_ev, "ts_us", np.int64), col(g_or, "date_us", np.int64)])
    okey = np.concatenate([np.zeros(n_p, np.int64), col(g_or, "o_orderkey", np.int64)])
    oprice = np.concatenate([np.zeros(n_p), col(g_or, "o_totalprice", np.float64)])
    eid = np.concatenate([col(g_ev, "event_id", np.int64), np.zeros(n_b, np.int64)])
    rng = (
        np.concatenate([col(g_ev, "rng", np.int64), col(g_or, "rng", np.int64)])
        if has_rng
        else np.zeros(n_p + n_b, np.int64)
    )
    flag = np.concatenate([np.ones(n_p, np.int8), np.zeros(n_b, np.int8)])
    order = np.lexsort((okey, flag, t, rng, key))
    key_s, rng_s, flag_s = key[order], rng[order], flag[order]
    n = len(order)
    idx = np.arange(n)
    prev = np.maximum.accumulate(np.where(flag_s == 0, idx, -1))
    ppos = np.flatnonzero(flag_s == 1)
    j = prev[ppos]
    ok = j >= 0
    jj = np.maximum(j, 0)
    ok &= (key_s[jj] == key_s[ppos]) & (rng_s[jj] == rng_s[ppos])
    if not ok.any():
        return _ASOF_EMPTY
    ppos, jj = ppos[ok], jj[ok]
    eid_s, okey_s, oprice_s = eid[order], okey[order], oprice[order]
    return pa.table(
        {
            "event_id": pa.array(eid_s[ppos], pa.int64()),
            "user_id": pa.array(key_s[ppos], pa.int64()),
            "o_orderkey": pa.array(okey_s[jj], pa.int64()),
            "o_totalprice": pa.array(oprice_s[jj], pa.float64()),
        }
    )


def _events_ts_bounds(path: str, col_name: str = "ts") -> tuple[int, int] | None:
    """(min, max) of a timestamp column in µs from parquet ROW-GROUP
    STATISTICS — no data scan (the scale-shaped way to size the time
    ranges; at 100 TB an extra aggregate pass over the data just to pick
    partition boundaries would double the read)."""
    import pandas as pd
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    lo = hi = None
    for rg in range(f.metadata.num_row_groups):
        g = f.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema != col_name:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None
            mn = pd.Timestamp(st.min).value // 1000
            mx = pd.Timestamp(st.max).value // 1000
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    if lo is None:
        return None
    return int(lo), int(hi)


@unreserved
def asof_join_events_orders(
    sf_dir: str, mode: str = "by_key", time_ranges: int = 16
):
    """(event_id, user_id, o_orderkey, o_totalprice) — AS-OF JOIN: for
    each event, the latest order of the same key at-or-before the event
    time (ties on o_orderdate broken by max o_orderkey — fully
    deterministic, so the op has an exact SQL oracle; inner-join
    semantics: events with no prior order are dropped).

    Ray Data has no as-of join; two distributed shapes, selected by
    ``mode``, produce identical rows:

    - ``by_key`` (default): key-partition BOTH sides (union with
      per-side null columns → one ``groupby(key)`` shuffle), vectorized
      sorted-merge per group. Partitioning assumption: keys are
      plentiful relative to cores and no single key's history exceeds
      one task's memory.
    - ``by_time`` (skew-safe): for time-skewed streams where one key
      owns most of the history — partition the EVENT TIME AXIS into
      ``time_ranges`` equal-width ranges (bounds from parquet row-group
      statistics, no extra scan) and group by (key, range), so a hot
      key's history splits across ranges. Boundary replication keeps it
      exact: a per-(key, range) lexmax + per-key forward scan injects
      into every range the key's latest order BEFORE the range start,
      so events early in a range still see their carry-in match. Costs
      one extra (small) shuffle of per-(key, range) maxima.
    - ``auto``: sniff the first events row group; distinct keys < 32
      (fewer keys than typical cores → by_key would serialize) picks
      ``by_time``.
    """
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    if mode == "auto":
        import pyarrow.parquet as pq

        g0 = pq.ParquetFile(f"{sf_dir}/events.parquet").read_row_group(
            0, columns=["user_id"]
        )
        import pyarrow.compute as pc

        mode = (
            "by_time" if len(pc.unique(g0["user_id"])) < 32 else "by_key"
        )
    evn = ev.map_batches(_asof_ev_rows, batch_format="pyarrow")
    orn = orders.map_batches(_asof_ord_rows, batch_format="pyarrow")

    # semi-join pushdown: inner-asof emits one row per EVENT, so orders
    # whose key never appears in events can only ever feed _ASOF_EMPTY
    # groups — drop them before any shuffle. Cuts both the shuffled rows
    # and (the real win) the per-group map_groups invocations: at sf0.1
    # only ~10% of order keys have events, and by_time's (key, range)
    # group count shrinks by the same factor (measured 17.4 s → see
    # BENCH/BASELINE.md). The broadcast is the distinct-event-key set
    # (key-domain-bounded, same budget as the broadcast join's small
    # side); bloom_semi_join documents the constant-size variant for key
    # domains past broadcast budget.
    ev_keys_ref = ray.put(_event_user_set(sf_dir))

    def keep_orders_with_events(batch: pa.Table) -> pa.Table:
        ks = ray.get(ev_keys_ref)
        if not ks.size or batch.num_rows == 0:
            return batch.slice(0, 0)
        key = batch["key"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, key)
        idx[idx >= ks.size] = ks.size - 1
        return batch.filter(pa.array(ks[idx] == key))

    orn = orn.map_batches(keep_orders_with_events, batch_format="pyarrow")
    if mode == "by_key":
        return (
            evn.union(orn)
            .map_batches(_asof_add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_asof_eval_backward, batch_format="pyarrow")
        )
    if mode != "by_time":
        raise ValueError(f"unknown asof mode {mode!r}")
    return _asof_by_time(sf_dir, evn, orn, time_ranges)


def _asof_by_time(sf_dir: str, evn, orn, time_ranges: int):
    """Skew-safe time-axis decomposition of the backward as-of join.
    Every stage is bucketed + vectorized (see ``_asof_eval_backward``):

    1. tag both sides with their time range (bounds from parquet
       row-group statistics — no extra scan),
    2. per-(key, range) build lexmaxima: per-batch partial pre-combine,
       then ONE bucketed shuffle keyed on the key hash,
    3. carry-ins: per key, for every range ABOVE its first build range,
       inject the running lexmax build of all earlier ranges (≤ keys·R
       rows total — the probe side here is events whose key domain is
       small; the FORWARD twin, whose key domain is every order, bounds
       carries further to ranges that contain probes via marker rows),
    4. final bucketed join keyed on hash(key, range) so a hot key's
       ranges land on different tasks.
    """
    bounds = _events_ts_bounds(f"{sf_dir}/events.parquet")
    if bounds is None:  # no stats → one aggregate pass (fallback)
        from ray.data.aggregate import Max, Min

        mm = evn.aggregate(Min("ts_us"), Max("ts_us"))
        if mm["min(ts_us)"] is None:
            return ray.data.from_arrow(_ASOF_EMPTY)
        bounds = (int(mm["min(ts_us)"]), int(mm["max(ts_us)"]))
    t0, t1 = bounds
    R = int(time_ranges)
    w = max(1, (t1 - t0) // R + 1)

    def tag_ev(batch: pa.Table) -> pa.Table:
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        rng = np.clip((ts - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    def tag_ord(batch: pa.Table) -> pa.Table:
        d = batch["date_us"].to_numpy(zero_copy_only=False)
        rng = np.clip((d - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    evn_tagged = evn.map_batches(tag_ev, batch_format="pyarrow")
    orn_tagged = orn.map_batches(tag_ord, batch_format="pyarrow")

    def lexmax_partial(batch: pa.Table) -> pa.Table:
        """Per-batch (key, range) lexmax pre-combine: the maxima shuffle
        then moves ≤ keys·ranges rows PER BLOCK instead of every order
        row — the same partial-before-shuffle shape as every aggregate
        in this file."""
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        key = batch["key"].to_numpy(zero_copy_only=False)
        rng = batch["rng"].to_numpy(zero_copy_only=False)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        odate = batch["date_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, odate, rng, key))
        k_s, r_s = key[order], rng[order]
        last = np.r_[(k_s[1:] != k_s[:-1]) | (r_s[1:] != r_s[:-1]), True]
        return batch.take(pa.array(order[last]))

    def carries(group: pa.Table) -> pa.Table:
        """One hash bucket of per-(key, range) build maxima → carry
        rows: per key, the running (date, orderkey)-lexmax injected into
        every range above the key's first build range (a tiny scan per
        key: the maxima are ≤ ranges rows each)."""
        group = group.combine_chunks()
        out_key: list[int] = []
        out_rng: list[int] = []
        out_okey: list[int] = []
        out_odate: list[int] = []
        out_price: list[float] = []
        if group.num_rows:
            bk = group["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            br = group["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
            bo = group["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            bd = group["date_us"].to_numpy(zero_copy_only=False).astype(np.int64)
            bp = group["o_totalprice"].to_numpy(zero_copy_only=False)
            ob = np.lexsort((bo, bd, br, bk))
            bk, br, bo, bd, bp = bk[ob], br[ob], bo[ob], bd[ob], bp[ob]
            starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
            ends = np.r_[starts[1:], len(bk)]
            for lo, hi in zip(starts, ends):
                kk = int(bk[lo])
                j = int(lo)
                best = -1
                for rr in range(int(br[lo]) + 1, R):
                    while j < hi and br[j] < rr:
                        if best < 0 or (bd[j], bo[j]) > (bd[best], bo[best]):
                            best = j
                        j += 1
                    if best >= 0:
                        out_key.append(kk)
                        out_rng.append(rr)
                        out_okey.append(int(bo[best]))
                        out_odate.append(int(bd[best]))
                        out_price.append(float(bp[best]))
        n = len(out_key)
        return pa.table(
            {
                "key": pa.array(out_key, pa.int64()),
                "event_id": pa.nulls(n, pa.int64()),
                "ts_us": pa.nulls(n, pa.int64()),
                "o_orderkey": pa.array(out_okey, pa.int64()),
                "date_us": pa.array(out_odate, pa.int64()),
                "o_totalprice": pa.array(out_price, pa.float64()),
                "rng": pa.array(out_rng, pa.int64()),
            }
        )

    # see the forward twin: coalesce the sliver-block unions to
    # input-footprint-sized blocks before each Sort
    carry = (
        _coalesced(
            orn_tagged.map_batches(lexmax_partial, batch_format="pyarrow"),
            sf_dir,
            "orders",
        )
        .map_batches(_asof_add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(carries, batch_format="pyarrow")
    )
    both = evn_tagged.union(orn_tagged).union(carry)
    return (
        _coalesced(both, sf_dir, "events", expansion=1.2)
        .map_batches(
            _asof_add_bucket, fn_kwargs=dict(with_rng=True),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_asof_eval_backward, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# relational extras: per-group top-k, semi/anti join, exact group quantiles,
# repetition scoring (the remaining everyday shapes of a curation pipeline)


@unreserved
def topk_per_group(sf_dir: str, k: int = 3):
    """(lang, doc_id, n_chars, rnk) — top-k rows PER GROUP (largest docs
    per language; ties broken doc_id asc). The distributed shape is the
    partial-top-k combiner: every input batch keeps at most k rows per
    group it saw, so the ``groupby(lang)`` shuffle moves ≤ k·groups·blocks
    rows — never the table — and the per-group final pass re-ranks a
    ≤ k·blocks sliver. This is the window-function ``row_number() ≤ k``
    without a global sort."""

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, -nch, lang))
        lang_s = lang[order]
        boundary = np.r_[True, lang_s[1:] != lang_s[:-1]] if len(order) else \
            np.empty(0, bool)
        run_start = np.flatnonzero(boundary)
        run_id = np.cumsum(boundary) - 1
        pos_in_run = np.arange(len(order)) - run_start[run_id] if len(order) \
            else np.empty(0, np.int64)
        sel = order[pos_in_run < k]
        return pa.table(
            {
                "lang": pa.array(lang[sel], pa.string()),
                "doc_id": pa.array(did[sel], pa.int64()),
                "n_chars": pa.array(nch[sel], pa.int64()),
            }
        )

    def _final(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        nch = group["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort((did, -nch))[:k]
        out = group.take(pa.array(sel))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(sel) + 1, dtype=np.int64))
        )

    return (
        read_documents(sf_dir, ["lang", "doc_id", "n_chars"])
        .map_batches(_partial, batch_format="pyarrow")
        # partials are <= k rows per group per block: coalesce the tiny
        # blocks so the sort shuffle schedules a handful of reduce tasks
        # instead of one per input block
        .repartition(4)
        .groupby("lang")
        .map_groups(_final, batch_format="pyarrow")
    )


def _event_user_set(sf_dir: str) -> np.ndarray:
    """Sorted distinct events.user_id array: per-batch distinct pre-dedup
    (the stream's payload is key-domain-bounded, not row-bounded), then a
    driver-side union — the same dimension-sized budget as the broadcast
    join's small side. At 10^12 fact rows this ships ≤ |key domain| ints
    per block, never the fact table."""

    def _uniq(batch: pa.Table) -> pa.Table:
        ks = np.unique(
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"k": pa.array(ks, pa.int64())})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).map_batches(_uniq, batch_format="pyarrow")
    parts = [
        t["k"].to_numpy(zero_copy_only=False)
        for t in _arrow_blocks(ds)
        if t.num_columns > 0 and t.num_rows > 0
    ]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


@unreserved
def semi_anti_join_customers(sf_dir: str, anti: bool = False):
    """(c_custkey, acctbal_cents) — customers WITH (semi) / WITHOUT (anti)
    at least one event: EXISTS / NOT EXISTS as a broadcast membership
    filter. The fact side's (events) distinct keys are pre-deduped per
    batch and broadcast ONCE (``ray.put``); the probe side streams
    through a ``np.searchsorted`` membership test — zero shuffle, no pair
    materialization (a shuffle semi-join would move every fact row to
    answer a dimension-sized question). acctbal carried as exact cents
    for the SQL oracle."""
    keys = _event_user_set(sf_dir)
    side = ray.put(keys)

    def _filter(batch: pa.Table) -> pa.Table:
        k = ray.get(side)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k):
            idx = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
            hit = k[idx] == ck
        else:
            hit = np.zeros(len(ck), bool)
        keep = ~hit if anti else hit
        cents = np.round(
            batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(ck[keep], pa.int64()),
                "acctbal_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(_filter, batch_format="pyarrow")


@unreserved
def doclen_quantiles(sf_dir: str, ps: tuple[int, ...] = (50, 90, 99)):
    """(lang, p50, p90, p99) — EXACT per-group percentiles of n_chars by
    the value-histogram method: per-batch (lang, n_chars) counts →
    ``groupby(["lang","n_chars"]).Sum`` (the shuffle payload is the
    histogram, bounded by |groups|·|value domain|, not the row count) →
    a tiny driver-side cumulative scan. Rank rule is integer-exact both
    sides: the p-th percentile is sorted value #``(p·n + 99) // 100``
    (1-indexed, pure int arithmetic — no float q·n that DECIMAL SQL and
    IEEE Python would round differently). This is how exact quantiles
    stay one histogram-sized shuffle at 100 TB; for unbounded real-valued
    domains the same pipe takes a fixed-width binned key instead."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        lang_col = batch["lang"]
        if isinstance(lang_col, pa.ChunkedArray):
            lang_col = lang_col.combine_chunks()
        enc = lang_col.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        uniq = enc.dictionary.to_pylist() if len(batch) else []
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = codes * (1 << 40) + nch  # n_chars < 2^40 by schema
        uk, cnt = np.unique(key, return_counts=True)
        kc = (uk >> 40).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array([uniq[i] for i in kc], pa.string()),
                "n_chars": pa.array(uk & ((1 << 40) - 1), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    hist = (
        read_documents(sf_dir, ["lang", "n_chars"])
        .map_batches(_partial, batch_format="pyarrow")
        # histogram partials are |groups|x|values| per block — coalesce
        # before the aggregate so its reduce side isn't one tiny task
        # per input block
        .repartition(4)
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    t = _to_table(hist)
    if t.num_rows == 0:
        return pa.table(
            {"lang": pa.array([], pa.string())}
            | {f"p{p}": pa.array([], pa.int64()) for p in ps}
        )
    lang = np.asarray(t["lang"].to_pylist())
    nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nch, lang))
    lang, nch, cnt = lang[order], nch[order], cnt[order]
    out: dict[str, list] = {"lang": []}
    for p in ps:
        out[f"p{p}"] = []
    start = 0
    for end in (
        list(np.flatnonzero(lang[1:] != lang[:-1]) + 1) + [len(lang)]
    ):
        cum = np.cumsum(cnt[start:end])
        n = int(cum[-1])
        out["lang"].append(str(lang[start]))
        for p in ps:
            rank = (p * n + 99) // 100
            out[f"p{p}"].append(int(nch[start:end][np.searchsorted(cum, rank)]))
        start = end
    return pa.table(
        {"lang": pa.array(out["lang"], pa.string())}
        | {f"p{p}": pa.array(out[f"p{p}"], pa.int64()) for p in ps}
    )


@unreserved
def top_bigram_frac(sf_dir: str):
    """(doc_id, n_bigrams, top_bigram_count, top_bigram_frac) — the
    Gopher-style repetition signal: the fraction of a document's bigrams
    taken by its single most frequent bigram (high ⇒ boilerplate /
    degenerate repetition; the standard filter keeps frac below ~0.2).
    Embarrassingly parallel: per-batch dictionary-coded token stream,
    bigrams as integer code pairs, one ``np.unique`` per batch — no
    shuffle, no Python per-row loop. frac is an IEEE-exact int/int
    division shared with the SQL oracle."""

    def _f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        n = len(lens)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nbig = np.maximum(lens - 1, 0).astype(np.int64)
        top = np.zeros(n, np.int64)
        if len(codes) > 1:
            valid = doc_idx[:-1] == doc_idx[1:]
            U = max(len(uniq), 1)
            a, b = codes[:-1][valid], codes[1:][valid]
            bd = doc_idx[:-1][valid]
            if n * U * U < (1 << 62):  # packed (doc, bigram) int key
                uk, counts = np.unique(bd * (U * U) + a * U + b,
                                       return_counts=True)
                docs_of = (uk // (U * U)).astype(np.int64)
            else:  # giant-vocab batch: pairwise unique without packing
                _, first, counts = np.unique(
                    np.stack([bd, a, b]), axis=1,
                    return_index=True, return_counts=True,
                )
                docs_of = bd[first]
            np.maximum.at(top, docs_of, counts)
        frac = np.where(nbig > 0, top / np.maximum(nbig, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_bigrams": pa.array(nbig, pa.int64()),
                "top_bigram_count": pa.array(top, pa.int64()),
                "top_bigram_frac": pa.array(frac, pa.float64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# dedup clustering (connected components over the near-dup pair graph),
# sessionization, benchmark decontamination, TF-IDF keyword extraction


def _cc_labels_driver(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected-component labels over an edge list that fits
    the driver: min-label propagation + pointer jumping (O(log n)
    rounds, all numpy — no Python union-find loop). Returns
    (nodes sorted, rep label per node)."""
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lab = nodes.copy()
    while True:
        m = np.minimum(lab[ia], lab[ib])
        new = lab.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        # pointer jumping: follow the label's own label (labels are
        # always node ids, so the searchsorted lookup is total)
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if np.array_equal(new, lab):
            return nodes, lab
        lab = new


def _cc_labels_distributed(pairs_ds, max_rounds: int = 64):
    """Connected components over an edge Dataset via the alternating
    large-star/small-star algorithm (Kiveris et al., 'Connected
    Components in MapReduce and Beyond', SoCC'14): each round is two
    ``groupby(node)`` shuffles over the EDGE list only — no driver
    state, no joins — and converges in O(log^2 n) rounds to a star
    forest where every node points at its component minimum. The edge
    set is duplicate-dimension-sized (LSH pairs), never corpus-sized."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "a": pa.array(np.maximum(a, b), pa.int64()),
                "b": pa.array(np.minimum(a, b), pa.int64()),
            }
        )

    def large_star(group: pa.Table) -> pa.Table:
        # incoming rows (u, v) for one node u over BOTH directions
        group = group.combine_chunks()
        u = int(group["u"][0].as_py())
        nb = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = min(u, int(nb.min()))
        big = nb[nb > u]
        return pa.table(
            {
                "a": pa.array(big, pa.int64()),
                "b": pa.array(np.full(len(big), m, np.int64)),
            }
        )

    def small_star(group: pa.Table) -> pa.Table:
        # incoming rows (u, v) with v <= u (edges oriented to smaller)
        group = group.combine_chunks()
        u = int(group["u"][0].as_py())
        nb = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = min(u, int(nb.min()))
        vs = np.unique(np.concatenate([nb, [u]]))
        vs = vs[vs != m]
        return pa.table(
            {
                "a": pa.array(vs, pa.int64()),
                "b": pa.array(np.full(len(vs), m, np.int64)),
            }
        )

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    def to_smaller(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.maximum(a, b), pa.int64()),
                "v": pa.array(np.minimum(a, b), pa.int64()),
            }
        )

    def distinct(ds):
        return (
            ds.map_batches(canon, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="c"))
            .select_columns(["a", "b"])
        )

    def _edge_mix(b: pa.Table) -> pa.Table:
        """Order-independent edge-set checksum partial: sum of
        splitmix64-mixed (a, b) keys — a linear sum of RAW keys could
        collide across different edge sets and end the loop on a
        non-converged forest; the mixed sum makes that negligible."""
        if b.num_rows:
            from ..state.sink import _splitmix64

            with np.errstate(over="ignore"):
                av = b["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
                bv = b["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
                mixed = _splitmix64(_splitmix64(av) ^ bv)
                s = int(mixed.sum(dtype=np.uint64) & np.uint64((1 << 63) - 1))
        else:
            s = 0
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "s": pa.array([s], pa.int64()),
            }
        )

    def checksum(ds) -> tuple[int, int]:
        t = _to_table(ds.map_batches(_edge_mix, batch_format="pyarrow"))
        if t.num_rows == 0:
            return (0, 0)
        with np.errstate(over="ignore"):
            return (
                int(np.sum(t["n"].to_numpy())),
                int(
                    np.sum(t["s"].to_numpy().astype(np.uint64))
                    & np.uint64((1 << 63) - 1)
                ),
            )

    edges = distinct(pairs_ds).materialize()
    prev = checksum(edges)
    for _ in range(max_rounds):
        after_large = distinct(
            edges.map_batches(both_dirs, batch_format="pyarrow")
            .groupby("u")
            .map_groups(large_star, batch_format="pyarrow")
            .union(edges)
        )
        edges = distinct(
            after_large.map_batches(to_smaller, batch_format="pyarrow")
            .groupby("u")
            .map_groups(small_star, batch_format="pyarrow")
        ).materialize()
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur
    # converged star forest: rows are (node, rep)
    t = _to_table(edges)
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    node = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    rep = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    # reps themselves label to themselves
    extra = np.setdiff1d(np.unique(rep), node)
    node = np.concatenate([node, extra])
    rep = np.concatenate([rep, extra])
    order = np.argsort(node)
    return node[order], rep[order]


def _near_dup_rep_map(
    sf_dir: str,
    jaccard_threshold: float,
    mode: str = "auto",
    driver_edge_limit: int = 5_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """(nodes sorted, rep per node) over the near-dup pair graph —
    the shared mode policy for every cluster-consuming op: vectorized
    driver min-propagation while the edge list fits
    (``driver_edge_limit``), the alternating-star distributed algorithm
    beyond it."""
    pairs = near_dup_pairs(sf_dir, jaccard_threshold).select_columns(
        ["doc_a", "doc_b"]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["doc_a"], "b": batch["doc_b"]})

    edge_ds = pairs.map_batches(rename, batch_format="pyarrow").materialize()
    n_edges = edge_ds.count()
    use_driver = mode == "driver" or (
        mode == "auto" and n_edges <= driver_edge_limit
    )
    if use_driver:
        t = _to_table(edge_ds)
        if t.num_rows:
            return _cc_labels_driver(
                t["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            )
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return _cc_labels_distributed(edge_ds)


@unreserved
def dedup_clusters(
    sf_dir: str,
    jaccard_threshold: float = 0.8,
    mode: str = "auto",
    driver_edge_limit: int = 5_000_000,
):
    """(doc_id, rep_id, keep) over ALL documents — near-duplicate
    CLUSTER assignment: connected components of the MinHash-LSH pair
    graph (``near_dup_pairs``), representative = component min doc_id,
    keep = 1 iff the doc is its own representative. This is the step
    that turns pairwise near-dup mining into an actual dedup decision
    (keep one doc per duplicate cluster).

    Scale shape: the pair graph is duplicate-dimension-sized, orders of
    magnitude below the corpus. ``mode='driver'`` runs a vectorized
    numpy min-propagation fixpoint (for edge lists under
    ``driver_edge_limit``); ``mode='distributed'`` runs the alternating
    large-star/small-star groupby algorithm with zero driver state
    (the 100 TB path); ``'auto'`` picks by edge count. Both are exact
    and tested identical. The final corpus pass is a broadcast lookup
    (``ray.put`` of the node→rep map — duplicate-dimension-sized),
    never a shuffle of the corpus."""
    nodes, lab = _near_dup_rep_map(
        sf_dir, jaccard_threshold, mode, driver_edge_limit
    )
    nodes_ref = ray.put(nodes)
    lab_ref = ray.put(lab)

    def assign(batch: pa.Table) -> pa.Table:
        ns, ls = ray.get(nodes_ref), ray.get(lab_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = did.copy()
        if len(ns):
            idx = np.clip(np.searchsorted(ns, did), 0, len(ns) - 1)
            hit = ns[idx] == did
            rep[hit] = ls[idx[hit]]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "rep_id": pa.array(rep, pa.int64()),
                "keep": pa.array((rep == did).astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


@unreserved
def sessionize_events(
    sf_dir: str,
    gap_hours: int = 12,
    mode: str = "by_key",
    time_ranges: int = 16,
):
    """(user_id, event_id, session_idx) — gap-based sessionization: a
    user's events ordered by (ts, event_id) start a new session whenever
    the gap to the previous event exceeds ``gap_hours``; session_idx is
    0-based per user.

    Two distributed shapes, identical rows:

    - ``by_key`` (default): one ``groupby(user_id)`` shuffle; the
      per-group pass is a vectorized lexsort + diff + cumsum.
      Partitioning assumption: no single user's history exceeds a task.
    - ``by_time`` (skew-safe): partition the TIME AXIS into
      ``time_ranges`` equal-width ranges (bounds from parquet row-group
      statistics) and sessionize per (user, range) locally; a per-(user,
      range) summary (first/last timestamp + local session count —
      grid-sized, driver-small) is scanned once per user to compute the
      range's global session offset and whether its first local session
      MERGES with the previous non-empty range's last session (boundary
      gap ≤ threshold); offsets broadcast back for a vectorized second
      pass. A hot user's history splits across ranges; exactness is
      preserved because session identity only depends on consecutive
      gaps, which the boundary merge reconstructs."""
    gap_us = int(gap_hours) * 3_600_000_000

    def rows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tu = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "tu": pa.array(tu, pa.int64()),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tu = group["tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tu))
        eid_s, tu_s = eid[order], tu[order]
        newsess = np.ones(len(order), np.int64)
        if len(order) > 1:
            newsess[1:] = (tu_s[1:] - tu_s[:-1] > gap_us).astype(np.int64)
        sidx = np.cumsum(newsess) - 1
        return pa.table(
            {
                "user_id": pa.array(uid[order], pa.int64()),
                "event_id": pa.array(eid_s, pa.int64()),
                "session_idx": pa.array(sidx, pa.int64()),
            }
        )

    tagged = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts"],
    ).map_batches(rows, batch_format="pyarrow")
    if mode == "by_time":
        bounds = _events_ts_bounds(f"{sf_dir}/events.parquet")
        if bounds is not None:
            return _sessionize_by_time(
                tagged, gap_us, bounds, int(time_ranges)
            )
        # no stats → fall through to the key-partitioned path
    return tagged.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )


def _sessionize_by_time(tagged, gap_us: int, bounds, R: int):
    t0, t1 = bounds
    w = max(1, (t1 - t0) // R + 1)

    def tag(batch: pa.Table) -> pa.Table:
        tu = batch["tu"].to_numpy(zero_copy_only=False)
        rng = np.clip((tu - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    def local_sessions(group: pa.Table) -> pa.Table:
        """One TIME RANGE, every user inside it — per-user session
        assignment fully vectorized via segmented cumsum over user-run
        boundaries. Grouping by range alone keeps the shuffle's group
        count at ``time_ranges`` (a 16-group map is ~16 Python calls,
        where the old (user, range) grid paid users·ranges of them);
        per-task memory is one time range, which is exactly the knob
        ``time_ranges`` exists to bound."""
        group = group.combine_chunks()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tu = group["tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = group["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tu, uid))
        u_s, e_s, t_s = uid[order], eid[order], tu[order]
        n = len(order)
        ub = np.r_[True, u_s[1:] != u_s[:-1]]
        newsess = ub | np.r_[True, (t_s[1:] - t_s[:-1]) > gap_us]
        cs = np.cumsum(newsess)
        ustart = np.flatnonzero(ub)
        uend = np.r_[ustart[1:] - 1, n - 1]
        sidx = cs - np.repeat(cs[ustart], np.diff(np.r_[ustart, n]))
        ev = pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(e_s, pa.int64()),
                "rng": pa.array(rng[order], pa.int64()),
                "local_sidx": pa.array(sidx, pa.int64()),
                "f_tu": pa.array(np.zeros(n, np.int64)),
                "l_tu": pa.array(np.zeros(n, np.int64)),
                "nsess": pa.array(np.zeros(n, np.int64)),
                "is_sum": pa.array(np.zeros(n, np.int64)),
            }
        )
        m = len(ustart)
        summ = pa.table(
            {
                "user_id": pa.array(u_s[ustart], pa.int64()),
                "event_id": pa.array(np.full(m, -1, np.int64), pa.int64()),
                "rng": pa.array(rng[order][ustart], pa.int64()),
                "local_sidx": pa.array(np.zeros(m, np.int64), pa.int64()),
                "f_tu": pa.array(t_s[ustart], pa.int64()),
                "l_tu": pa.array(t_s[uend], pa.int64()),
                "nsess": pa.array(sidx[uend] + 1, pa.int64()),
                "is_sum": pa.array(np.ones(m, np.int64), pa.int64()),
            }
        )
        return pa.concat_tables([ev, summ])

    both = (
        tagged.map_batches(tag, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(local_sessions, batch_format="pyarrow")
        .materialize()
    )
    def _only(v):
        def m(batch: pa.Table) -> pa.Table:
            mask = batch["is_sum"].to_numpy(zero_copy_only=False) == v
            return batch.filter(pa.array(mask))

        return m

    summ = _to_table(both.map_batches(_only(1), batch_format="pyarrow"))
    # grid-sized (≤ users·ranges) driver scan: per user in range order,
    # offset = running session count, minus 1 when the range's first
    # local session merges across the boundary
    keys = []
    offs = []
    if summ.num_rows:
        su = summ["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sr = summ["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        sf_ = summ["f_tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        sl = summ["l_tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = summ["nsess"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sr, su))
        prev_u = None
        nxt = 0
        prev_last = 0
        for i in order:
            u = int(su[i])
            if u != prev_u:
                prev_u, nxt = u, 0
                merge = 0
            else:
                merge = 1 if int(sf_[i]) - prev_last <= gap_us else 0
            off = nxt - merge
            keys.append(u * R + int(sr[i]))
            offs.append(off)
            nxt = off + int(sn[i])
            prev_last = int(sl[i])
    karr = np.asarray(keys, np.int64)
    oarr = np.asarray(offs, np.int64)
    ks = np.argsort(karr)
    karr, oarr = karr[ks], oarr[ks]
    k_ref, o_ref = ray.put(karr), ray.put(oarr)

    def finalize(batch: pa.Table) -> pa.Table:
        kk, oo = ray.get(k_ref), ray.get(o_ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = batch["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        loc = batch["local_sidx"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(kk, uid * R + rng)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "session_idx": pa.array(loc + oo[idx], pa.int64()),
            }
        )

    return both.map_batches(_only(0), batch_format="pyarrow").map_batches(
        finalize, batch_format="pyarrow"
    )


_MD5_SET_CACHE: dict[str, int] = {}


def _doc_shingle_sets(batch: pa.Table):
    """Per-doc DISTINCT shingle-hash sets (DuckDB-md5-parity), sharing
    semantics with the near-dup ops: 3-gram shingles with the
    whole-text singleton fallback for short docs. Returns
    (doc_ids int64[n], list-of-sorted-unique-hash-arrays)."""
    from ..functions.hashing import md5_i63

    texts = batch["text"].to_pylist()
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    from itertools import chain

    sh_lists = [shingles(tokenize(t)) for t in texts]
    lens = np.fromiter((len(x) for x in sh_lists), np.int64, len(sh_lists))
    flat = pa.array(list(chain.from_iterable(sh_lists)), pa.string())
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        uniq = enc.dictionary.to_pylist()
    else:
        codes, uniq = np.empty(0, np.int64), []
    cache = _MD5_SET_CACHE
    H = np.empty(len(uniq), np.int64)
    for i, u in enumerate(uniq):
        h = cache.get(u)
        if h is None:
            h = md5_i63(u)
            if len(cache) >= _HASH_CACHE_MAX:
                cache.clear()
            cache[u] = h
        H[i] = h
    hh = H[codes] if len(codes) else np.empty(0, np.int64)
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    sets = [
        np.unique(hh[starts[i] : starts[i + 1]]) for i in range(len(lens))
    ]
    return did, sets


@unreserved
def decontaminate(sf_dir: str, benchmark_mod: int = 100):
    """(doc_id, n_overlap, contaminated) — benchmark decontamination:
    flag every document whose 3-gram shingle set overlaps a held-out
    benchmark's shingle set (here the deterministic synthetic benchmark
    ``doc_id % benchmark_mod == 0``; in production, the eval suites).
    n_overlap = |distinct doc shingles ∩ banned set|.

    Scale shape: pass 1 streams ONLY the benchmark slice and unions its
    distinct shingle hashes driver-side (benchmark-dimension-sized — a
    test set is MBs, never corpus-scale), broadcast once via
    ``ray.put``; pass 2 streams the corpus through a vectorized
    ``searchsorted`` membership count. No shuffle at all."""

    def bench_hashes(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = did % benchmark_mod == 0
        if not sel.any():
            return pa.table({"h": pa.array([], pa.int64())})
        _, sets = _doc_shingle_sets(batch.filter(pa.array(sel)))
        hs = np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
        return pa.table({"h": pa.array(hs, pa.int64())})

    parts = [
        t["h"].to_numpy(zero_copy_only=False)
        for t in _arrow_blocks(
            read_documents(sf_dir, ["doc_id", "text"]).map_batches(
                bench_hashes, batch_format="pyarrow"
            )
        )
        if t.num_columns > 0 and t.num_rows > 0
    ]
    banned = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    banned_ref = ray.put(banned)

    def score(batch: pa.Table) -> pa.Table:
        bn = ray.get(banned_ref)
        did, sets = _doc_shingle_sets(batch)
        n = np.zeros(len(did), np.int64)
        if len(bn):
            for i, s in enumerate(sets):
                idx = np.clip(np.searchsorted(bn, s), 0, len(bn) - 1)
                n[i] = int(np.count_nonzero(bn[idx] == s))
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_overlap": pa.array(n, pa.int64()),
                "contaminated": pa.array((n > 0).astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


@unreserved
def tfidf_topk_terms(sf_dir: str, k: int = 5):
    """(doc_id, term, tf, score, rnk) — TF-IDF keyword extraction: each
    document's top-k terms by ``tf · ln(N/df)`` (ties broken term asc),
    score reported rounded to 4 decimals AFTER ranking (rank uses full
    precision; both sides compute the identical IEEE expression).

    Scale shape: document frequency is a per-batch distinct-(doc,term)
    partial followed by one vocabulary-sized ``groupby(term)`` — the
    shuffle payload is the vocabulary, not the token stream. The df
    table is broadcast once (``ray.put``; vocabulary-sized — the same
    budget as every index dictionary in this repo); the scoring pass is
    then embarrassingly parallel with a per-batch vectorized
    top-k-per-doc (lexsort + run-position trick, no Python row loop)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    n_docs = float(
        pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        if not len(codes):
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        U = max(len(uniq), 1)
        dt = np.unique(doc_idx * U + codes)
        cs, cnt = np.unique(dt % U, return_counts=True)
        return pa.table(
            {
                "term": pa.array([uniq[int(c)] for c in cs], pa.string()),
                "df": pa.array(cnt, pa.int64()),
            }
        )

    df_t = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(df_partial, batch_format="pyarrow")
        # vocabulary-sized partials per block: coalesce before the df
        # aggregate (same shape as the term_stats tuning)
        .repartition(8)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    terms_sorted = (
        np.array(df_t["term"].to_pylist())
        if df_t.num_columns and df_t.num_rows
        else np.empty(0, object)
    )
    order = np.argsort(terms_sorted)
    terms_sorted = terms_sorted[order]
    df_sorted = (
        df_t["df"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        if df_t.num_rows
        else np.empty(0, np.float64)
    )
    terms_ref = ray.put(terms_sorted)
    df_ref = ray.put(df_sorted)

    def topk(batch: pa.Table) -> pa.Table:
        ts, dfs = ray.get(terms_ref), ray.get(df_ref)
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(codes):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        U = max(len(uniq), 1)
        dt, tf = np.unique(doc_idx * U + codes, return_counts=True)
        d_of = dt // U
        c_of = dt % U
        uniq_arr = np.array(uniq)
        term_of = uniq_arr[c_of]
        dfv = dfs[np.searchsorted(ts, term_of)]
        score = tf.astype(np.float64) * np.log(n_docs / dfv)
        ord2 = np.lexsort((term_of, -score, d_of))
        d_s = d_of[ord2]
        boundary = np.r_[True, d_s[1:] != d_s[:-1]]
        run_start = np.flatnonzero(boundary)
        run_id = np.cumsum(boundary) - 1
        pos = np.arange(len(ord2)) - run_start[run_id]
        keep = pos < k
        sel = ord2[keep]
        rnk = pos[keep] + 1
        sc = score[sel]
        sc_round = np.copysign(
            np.floor(np.abs(sc) * 10000.0 + 0.5) / 10000.0, sc
        )
        return pa.table(
            {
                "doc_id": pa.array(did[d_of[sel]], pa.int64()),
                "term": pa.array(term_of[sel], pa.string()),
                "tf": pa.array(tf[sel], pa.int64()),
                "score": pa.array(sc_round, pa.float64()),
                "rnk": pa.array(rnk, pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        topk, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# corpus curation: deterministic splits, stratified sampling, global n-gram
# frequency, composite Gopher-style quality filtering

SPLIT_SALT = "strat:"
STRAT_RATES: dict[str, int] = {"en": 10, "de": 50, "es": 50, "fr": 50, "zh": 25}


@unreserved
def split_assign(sf_dir: str, val_pct: int = 5, test_pct: int = 5):
    """(doc_id, bucket, split) — deterministic train/val/test assignment
    by content-stable hash bucket (``md5_i63(str(doc_id)) % 100``): the
    split a document lands in never changes with run count, partitioning
    or cluster size, which is what makes eval sets stable across a
    pipeline's lifetime. Embarrassingly parallel, zero shuffle, exact
    SQL oracle."""
    from ..functions.hashing import md5_i63

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.fromiter(
            (md5_i63(str(i)) % 100 for i in ids), np.int64, count=len(ids)
        )
        split = np.where(
            bucket < test_pct,
            "test",
            np.where(bucket < test_pct + val_pct, "val", "train"),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def stratified_sample(sf_dir: str, rates: dict[str, int] | None = None):
    """(doc_id, lang) — per-group deterministic sampling: keep a doc iff
    its salted hash bucket falls under its language's keep-rate (percent)
    — the rebalancing primitive (downsample the over-represented
    language, keep the rare ones). Salted so the sample decorrelates
    from ``split_assign``'s buckets. Zero shuffle, exact SQL oracle."""
    from ..functions.hashing import md5_i63

    rates = STRAT_RATES if rates is None else rates

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        bucket = np.fromiter(
            (md5_i63(f"{SPLIT_SALT}{i}") % 100 for i in ids),
            np.int64,
            count=len(ids),
        )
        rate = np.fromiter(
            (rates.get(l, 100) for l in langs), np.int64, count=len(langs)
        )
        keep = bucket < rate
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "lang": pa.array(langs[keep], pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def top_ngrams(sf_dir: str, k: int = 20):
    """(ngram, cnt, rnk) — the corpus's top-k bigrams by global count
    (ties broken ngram asc): the vocabulary-health / boilerplate-
    detection report every corpus audit starts with.

    Scale shape: per-batch dictionary-coded bigram counts (one
    ``np.unique`` per batch, no Python token loop) → one
    vocabulary²-bounded ``groupby(ngram)`` — the shuffle moves counts,
    never occurrences → per-block partial top-k (≤ k rows per block)
    → a k·blocks-sized driver merge. The corpus stream is read once."""
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        if len(codes) < 2:
            return pa.table(
                {
                    "ngram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        valid = doc_idx[:-1] == doc_idx[1:]
        U = max(len(uniq), 1)
        a, b = codes[:-1][valid], codes[1:][valid]
        uk, cnt = np.unique(a * U + b, return_counts=True)
        ua = np.array(uniq)
        grams = np.char.add(
            np.char.add(ua[(uk // U).astype(np.int64)], " "),
            ua[(uk % U).astype(np.int64)],
        )
        return pa.table(
            {
                "ngram": pa.array(grams, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def block_topk(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        ng = batch["ngram"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ng, -cnt))[:k]
        return batch.take(pa.array(sel))

    cand = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(counts, batch_format="pyarrow")
        .repartition(8)
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(block_topk, batch_format="pyarrow")
    )
    if cand.num_rows == 0:
        return pa.table(
            {
                "ngram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    cnt = cand["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    ng = np.asarray(cand["ngram"].to_pylist())
    sel = np.lexsort((ng, -cnt))[:k]
    return pa.table(
        {
            "ngram": pa.array(ng[sel], pa.string()),
            "cnt": pa.array(cnt[sel], pa.int64()),
            "rnk": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
        }
    )


GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
GOPHER_MIN_MEAN_LEN = 4.0
GOPHER_MAX_MEAN_LEN = 5.0
GOPHER_MIN_STOPWORD_FRAC = 0.02
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.10


@unreserved
def gopher_filter(sf_dir: str):
    """(doc_id, n_tokens, reasons, keep) — composite Gopher-style
    quality gate in ONE corpus pass: reasons is a bitmask of violated
    rules (bit 0 token-count range, bit 1 mean-token-length range,
    bit 2 stopword-fraction floor, bit 3 top-bigram repetition cap),
    keep = 1 iff no rule fired. Thresholds are module constants tuned
    to the synthetic corpus; production swaps the constants, the shape
    stays. Fully vectorized per batch (token codes + reduceat), zero
    shuffle, exact SQL oracle — every fraction is the identical IEEE
    ``sum::double / n`` expression on both sides."""
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _gopher_batch, batch_format="pyarrow"
    )


def _gopher_batch(batch: pa.Table) -> pa.Table:
    lens, doc_idx, codes, uniq = _batch_token_codes(batch)
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = lens.astype(np.int64)
    nz = np.maximum(n, 1).astype(np.float64)
    starts = np.zeros(len(lens), np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    ua = np.array(uniq) if len(uniq) else np.empty(0, "U1")
    ulen = (
        np.char.str_len(ua).astype(np.float64)
        if len(uniq)
        else np.empty(0, np.float64)
    )
    ustop = (
        np.isin(ua, np.array(STOPWORDS)).astype(np.float64)
        if len(uniq)
        else np.empty(0, np.float64)
    )
    sum_len = np.zeros(len(n), np.float64)
    sum_stop = np.zeros(len(n), np.float64)
    nonzero = n > 0
    if len(codes) and nonzero.any():
        # reduceat over NON-EMPTY docs only: their starts are strictly
        # increasing and in range. (Clipping empty docs' out-of-range
        # starts instead silently TRUNCATES the preceding doc's segment
        # when an empty doc ends the batch — caught by the unicode
        # text-op fuzz.)
        nz_starts = starts[nonzero]
        sum_len[nonzero] = np.add.reduceat(ulen[codes], nz_starts)
        sum_stop[nonzero] = np.add.reduceat(ustop[codes], nz_starts)
    mlen = sum_len / nz
    swf = sum_stop / nz
    nbig = np.maximum(n - 1, 0)
    top = np.zeros(len(n), np.int64)
    if len(codes) > 1:
        valid = doc_idx[:-1] == doc_idx[1:]
        U = max(len(uniq), 1)
        a, b = codes[:-1][valid], codes[1:][valid]
        bd = doc_idx[:-1][valid]
        uk, counts = np.unique(bd * (U * U) + a * U + b, return_counts=True)
        np.maximum.at(top, (uk // (U * U)).astype(np.int64), counts)
    tbf = np.where(nbig > 0, top / np.maximum(nbig, 1), 0.0)
    reasons = (
        ((n < GOPHER_MIN_TOKENS) | (n > GOPHER_MAX_TOKENS)).astype(np.int64)
        + 2 * ((mlen < GOPHER_MIN_MEAN_LEN) | (mlen > GOPHER_MAX_MEAN_LEN))
        + 4 * (swf < GOPHER_MIN_STOPWORD_FRAC)
        + 8 * (tbf > GOPHER_MAX_TOP_BIGRAM_FRAC)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(did, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "reasons": pa.array(reasons, pa.int64()),
            "keep": pa.array((reasons == 0).astype(np.int64), pa.int64()),
        }
    )


@unreserved
def curated_corpus(sf_dir: str, jaccard_threshold: float = 0.8):
    """(doc_id, rep_id, reasons, split, keep) — the end-to-end curation
    decision per document, composed from this file's primitives: keep =
    passes the Gopher quality gate AND is its near-dup cluster's
    representative; split is the deterministic hash assignment. This is
    the table a training run actually consumes.

    Scale shape: the near-dup rep map (duplicate-dimension-sized) is
    broadcast once (``ray.put``); ONE streaming corpus pass computes
    quality bits, dedup decision and split together — no join of
    corpus-sized intermediates, no second read. Exact SQL oracle
    (composition of the gopher_filter / dedup_clusters / split_assign
    oracles)."""
    from ..functions.hashing import md5_i63

    nodes, lab = _near_dup_rep_map(sf_dir, jaccard_threshold)
    nodes_ref, lab_ref = ray.put(nodes), ray.put(lab)

    def f(batch: pa.Table) -> pa.Table:
        g = _gopher_batch(batch)
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        reasons = g["reasons"].to_numpy(zero_copy_only=False)
        ns, ls = ray.get(nodes_ref), ray.get(lab_ref)
        rep = did.copy()
        if len(ns):
            idx = np.clip(np.searchsorted(ns, did), 0, len(ns) - 1)
            hit = ns[idx] == did
            rep[hit] = ls[idx[hit]]
        bucket = np.fromiter(
            (md5_i63(str(i)) % 100 for i in did), np.int64, count=len(did)
        )
        split = np.where(
            bucket < 5, "test", np.where(bucket < 10, "val", "train")
        )
        keep = ((reasons == 0) & (rep == did)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "rep_id": pa.array(rep, pa.int64()),
                "reasons": pa.array(reasons, pa.int64()),
                "split": pa.array(split, pa.string()),
                "keep": pa.array(keep, pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@unreserved
def running_totals(sf_dir: str, mode: str = "by_key", time_ranges: int = 16):
    """(user_id, event_id, running_cents) — cumulative per-user value
    total in (ts, event_id) order: the classic running-aggregate window
    (``sum(...) over (partition by user order by ts rows unbounded
    preceding)``). Value carried as exact integer cents so the running
    sum is bit-exact against the SQL window oracle regardless of
    accumulation strategy (a float running sum is order- and
    tree-shape-dependent).

    ``by_key``: one ``groupby(user_id)`` shuffle, vectorized lexsort +
    cumsum per group (assumes one user's history fits a task).
    ``by_time`` (skew-safe): local cumsums per (user, time-range); the
    carry-in is just each range's TOTAL, so a grid-sized driver scan of
    per-range sums + a broadcast offset pass finalizes — the simplest
    instance of the split-and-carry pattern (cf. sessionize_events /
    the as-of join)."""

    def rows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tu = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(
            batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "tu": pa.array(tu, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tu = group["tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = group["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tu))
        return pa.table(
            {
                "user_id": pa.array(uid[order], pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "running_cents": pa.array(
                    np.cumsum(cents[order]), pa.int64()
                ),
            }
        )

    tagged = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    ).map_batches(rows, batch_format="pyarrow")
    if mode == "by_time":
        bounds = _events_ts_bounds(f"{sf_dir}/events.parquet")
        if bounds is not None:
            return _running_totals_by_time(tagged, bounds, int(time_ranges))
    return tagged.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )


def _running_totals_by_time(tagged, bounds, R: int):
    t0, t1 = bounds
    w = max(1, (t1 - t0) // R + 1)

    def tag(batch: pa.Table) -> pa.Table:
        tu = batch["tu"].to_numpy(zero_copy_only=False)
        rng = np.clip((tu - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    def local_cumsum(group: pa.Table) -> pa.Table:
        """One TIME RANGE, every user inside it — per-user running sums
        via one segmented cumsum (group count = time_ranges, not
        users·ranges; see local_sessions for the rationale)."""
        group = group.combine_chunks()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tu = group["tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = group["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = group["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tu, uid))
        u_s, c_s = uid[order], cents[order]
        n = len(order)
        ub = np.r_[True, u_s[1:] != u_s[:-1]]
        ustart = np.flatnonzero(ub)
        uend = np.r_[ustart[1:] - 1, n - 1]
        cs = np.cumsum(c_s)
        base = cs[ustart] - c_s[ustart]
        run = cs - np.repeat(base, np.diff(np.r_[ustart, n]))
        ev = pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid[order], pa.int64()),
                "rng": pa.array(rng[order], pa.int64()),
                "local_run": pa.array(run, pa.int64()),
                "total": pa.array(np.zeros(n, np.int64)),
                "is_sum": pa.array(np.zeros(n, np.int64)),
            }
        )
        m = len(ustart)
        summ = pa.table(
            {
                "user_id": pa.array(u_s[ustart], pa.int64()),
                "event_id": pa.array(np.full(m, -1, np.int64), pa.int64()),
                "rng": pa.array(rng[order][ustart], pa.int64()),
                "local_run": pa.array(np.zeros(m, np.int64), pa.int64()),
                "total": pa.array(run[uend], pa.int64()),
                "is_sum": pa.array(np.ones(m, np.int64), pa.int64()),
            }
        )
        return pa.concat_tables([ev, summ])

    both = (
        tagged.map_batches(tag, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(local_cumsum, batch_format="pyarrow")
        .materialize()
    )

    def _only(v):
        def m(batch: pa.Table) -> pa.Table:
            mask = batch["is_sum"].to_numpy(zero_copy_only=False) == v
            return batch.filter(pa.array(mask))

        return m

    summ = _to_table(both.map_batches(_only(1), batch_format="pyarrow"))
    keys, offs = [], []
    if summ.num_rows:
        su = summ["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sr = summ["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = summ["total"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sr, su))
        prev_u, carry = None, 0
        for i in order:
            u = int(su[i])
            if u != prev_u:
                prev_u, carry = u, 0
            keys.append(u * R + int(sr[i]))
            offs.append(carry)
            carry += int(st[i])
    karr = np.asarray(keys, np.int64)
    oarr = np.asarray(offs, np.int64)
    ks = np.argsort(karr)
    karr, oarr = karr[ks], oarr[ks]
    k_ref, o_ref = ray.put(karr), ray.put(oarr)

    def finalize(batch: pa.Table) -> pa.Table:
        kk, oo = ray.get(k_ref), ray.get(o_ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = batch["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        loc = batch["local_run"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(kk, uid * R + rng)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "running_cents": pa.array(loc + oo[idx], pa.int64()),
            }
        )

    return both.map_batches(_only(0), batch_format="pyarrow").map_batches(
        finalize, batch_format="pyarrow"
    )


@unreserved
def event_type_pivot(sf_dir: str):
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view) — the
    long→wide pivot by event type, as a pre-combined aggregate: each
    batch emits per-user partial count VECTORS (one row per user seen),
    so the ``groupby(user_id)`` shuffle moves |users|·|blocks| rows of
    fixed width — never the event stream — and the reduce is a Sum per
    column. Unknown types are counted into n_other (0 here by schema)."""
    from ray.data.aggregate import Sum

    tmap = {t: i for i, t in enumerate(EVENT_TYPES)}

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        code = np.fromiter(
            (tmap.get(t, len(EVENT_TYPES)) for t in et),
            np.int64,
            count=len(et),
        )
        K = len(EVENT_TYPES) + 1
        uu, inv = np.unique(uid, return_inverse=True)
        mat = np.zeros((len(uu), K), np.int64)
        np.add.at(mat, (inv, code), 1)
        cols = {"user_id": pa.array(uu, pa.int64())}
        for t, i in tmap.items():
            cols[f"n_{t}"] = pa.array(mat[:, i], pa.int64())
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("user_id")
        .aggregate(*aggs)
    )


REGEX_FEATURES: tuple[tuple[str, str], ...] = (
    ("n_double_vowel", "[aeiou]{2}"),
    ("n_er", "er"),
    ("n_word_a", r"\ba\b"),
)


@unreserved
def regex_features(sf_dir: str):
    """(doc_id, n_double_vowel, n_er, n_word_a) — per-document regex
    match counts for a fixed feature set, computed entirely inside
    Arrow's RE2 kernel (``pc.count_substring_regex`` — zero Python per
    row, zero copy from the object store). DuckDB's regexp functions
    are RE2 too, so non-overlapping match counts agree exactly and the
    op has an exact SQL oracle. This is the PII-pattern / boilerplate-
    marker counting stage of a curation pipeline; production swaps the
    pattern table, the shape stays. Zero shuffle."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch["doc_id"]}
        text = batch["text"]
        for name, pat in REGEX_FEATURES:
            cols[name] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
        return pa.table(cols)

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def json_props_stats(sf_dir: str):
    """(event_type, n, sum_k, min_k, max_k) — semi-structured column
    handling: decode each event's JSON ``props`` payload and aggregate
    the extracted field per event type. The decode is the C stdlib
    parser per row inside ``map_batches`` (arbitrary JSON has no
    vectorized Arrow kernel — per-batch C decode IS the production
    shape; swap in simdjson where available), and the aggregate is
    pre-combined per batch so the shuffle moves |event_types|·|blocks|
    fixed-width rows, never the stream. Exact SQL oracle via DuckDB's
    core JSON operators."""
    import json

    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch["props"].to_pylist()),
            np.int64,
            count=batch.num_rows,
        )
        uu, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        sum_k = np.zeros(len(uu), np.int64)
        np.add.at(sum_k, inv, ks)
        min_k = np.full(len(uu), np.iinfo(np.int64).max)
        np.minimum.at(min_k, inv, ks)
        max_k = np.full(len(uu), np.iinfo(np.int64).min)
        np.maximum.at(max_k, inv, ks)
        return pa.table(
            {
                "event_type": pa.array(uu, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sum_k": pa.array(sum_k, pa.int64()),
                "min_k": pa.array(min_k, pa.int64()),
                "max_k": pa.array(max_k, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "props"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .repartition(2)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


BLOOM_BITS = 1 << 20  # 128 KiB bitmap — broadcast-budget sized
BLOOM_HASHES = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys), BLOOM_HASHES) bit positions via splitmix64 re-mixing
    (same vectorized mixer as the sink's partitioner)."""
    from ..state.sink import _splitmix64

    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64)
        out = np.empty((len(keys), BLOOM_HASHES), np.int64)
        for i in range(BLOOM_HASHES):
            h = _splitmix64(h + np.uint64(i + 1))
            out[:, i] = (h % np.uint64(BLOOM_BITS)).astype(np.int64)
    return out


@unreserved
def bloom_semi_join(sf_dir: str):
    """(c_custkey, maybe_has_events) — mergeable BLOOM FILTER as the
    join pre-filter primitive: pass 1 streams the fact side (events)
    building per-batch partial bitmaps that OR together into one
    fixed-size filter (BLOOM_BITS bits — the shuffle/driver payload is
    the BITMAP, constant in the fact-row count; this is what replaces
    the exact distinct-key broadcast of ``semi_anti_join_customers``
    when the key domain itself is too large to ship); pass 2 probes the
    dimension. One-sided error by construction: every true member is
    flagged (no false negatives — pytest-gated along with the FP-rate
    bound), so the op is approximate → rows-only driver check."""

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS, bool)
        ks = np.unique(
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if len(ks):
            bits[_bloom_positions(ks).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()])})

    parts = _arrow_blocks(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id"]
        ).map_batches(partial, batch_format="pyarrow")
    )
    acc = np.zeros(BLOOM_BITS // 8, np.uint8)
    for t in parts:
        if t.num_columns and t.num_rows:
            for b in t["bits"].to_pylist():
                acc |= np.frombuffer(b, np.uint8)
    bits = np.unpackbits(acc).astype(bool)
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bits_ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ck):
            pos = _bloom_positions(ck)
            hit = bm[pos].all(axis=1)
        else:
            hit = np.zeros(0, bool)
        return pa.table(
            {
                "c_custkey": pa.array(ck, pa.int64()),
                "maybe_has_events": pa.array(hit.astype(np.int64), pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(probe, batch_format="pyarrow")


def bloom_semi_join_checked(sf_dir: str):
    """(c_custkey, has_events, no_false_negative) — the DRIVER-CHECKABLE
    form of the Bloom pre-filter (flips its CORRECTNESS row from
    ``no_oracle`` to a value-hash gate, same pattern as
    ``hll_distinct_users_checked``): ``has_events`` is the EXACT
    semi-join flag (distinct-event-key broadcast, searchsorted probe —
    SQL-expressible), and ``no_false_negative`` asserts the filter's
    one-sided guarantee per row: the Bloom flag must be set whenever the
    exact flag is (``bloom ≥ exact``). The oracle emits the same exact
    rows with ``true``."""
    bloom = _to_table(bloom_semi_join(sf_dir))
    if bloom.num_rows == 0:  # empty customer table → empty-schema block
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "has_events": pa.array([], pa.int64()),
                "no_false_negative": pa.array([], pa.bool_()),
            }
        )
    keys = _event_user_set(sf_dir)
    ck = bloom["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    maybe = (
        bloom["maybe_has_events"].to_numpy(zero_copy_only=False).astype(bool)
    )
    if keys.size:
        pos = np.searchsorted(keys, ck)
        pos[pos >= keys.size] = keys.size - 1
        exact = keys[pos] == ck
    else:
        exact = np.zeros(len(ck), bool)
    order = np.argsort(ck)
    return pa.table(
        {
            "c_custkey": pa.array(ck[order], pa.int64()),
            "has_events": pa.array(
                exact[order].astype(np.int64), pa.int64()
            ),
            "no_false_negative": pa.array(
                (maybe | ~exact)[order], pa.bool_()
            ),
        }
    )


@unreserved
def poisson_sample(sf_dir: str, scale_chars: int = 400):
    """(doc_id, n_chars) — deterministic WEIGHTED (Poisson) sampling:
    each document is kept independently with probability
    ``min(1, n_chars / scale_chars)`` decided by its salted hash bucket
    — longer docs proportionally more likely, reproducible at any
    parallelism (the weighted counterpart of hash_sample / the
    distributed stand-in for weighted reservoir sampling). Zero
    shuffle, exact SQL oracle."""
    from ..functions.hashing import md5_i63

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.fromiter(
            (md5_i63(f"poisson:{i}") % 1_000_000 for i in ids),
            np.int64,
            count=len(ids),
        )
        # keep iff bucket < n_chars/scale * 1e6 (integer-exact both sides)
        keep = bucket * scale_chars < nch * 1_000_000
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_chars": pa.array(nch[keep], pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


CMS_WIDTH = 1 << 14
CMS_DEPTH = 4


@unreserved
def countmin_top_ngrams(sf_dir: str, k: int = 20):
    """(ngram, cnt_est, rnk) — heavy hitters via a COUNT-MIN SKETCH:
    per-batch (depth × width) count matrices plus per-batch local top
    candidates; the sketches SUM into one fixed-size matrix (the shuffle
    / driver payload is the sketch — constant in corpus size — where
    ``top_ngrams``' exact groupby payload is vocabulary²-sized), and the
    union of local candidates is re-estimated against the merged sketch.
    Estimates only OVER-count (min over depth rows of summed counters),
    so the true top-k is always a subset of the candidate set; pytest
    gates estimate ≥ truth and top-k agreement on the bench corpus.
    Approximate → rows-only driver check."""
    sk, cands = _merge_cms_parts(
        read_documents(sf_dir, ["text"]).map_batches(
            _cms_partial_factory(k), batch_format="pyarrow"
        )
    )
    if not cands:
        return pa.table(
            {
                "ngram": pa.array([], pa.string()),
                "cnt_est": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    cl = sorted(cands)
    est = _cms_estimate(sk, cl)
    ga = np.asarray(cl, object)
    sel = np.lexsort((ga, -est))[:k]
    return pa.table(
        {
            "ngram": pa.array(ga[sel], pa.string()),
            "cnt_est": pa.array(est[sel], pa.int64()),
            "rnk": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
        }
    )


def _cms_partial_factory(k: int):
    """Per-batch count-min partial: a (depth × width) count matrix over
    the batch's bigrams plus the batch's local top-4k candidates — one
    fixed-size row per batch, regardless of batch length."""
    from ..state.sink import _splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        sk = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
        grams = np.empty(0, object)
        cnt = np.empty(0, np.int64)
        if len(codes) >= 2:
            valid = doc_idx[:-1] == doc_idx[1:]
            U = max(len(uniq), 1)
            a, b = codes[:-1][valid], codes[1:][valid]
            uk, cnt = np.unique(a * U + b, return_counts=True)
            ua = np.array(uniq)
            grams = np.char.add(
                np.char.add(ua[(uk // U).astype(np.int64)], " "),
                ua[(uk % U).astype(np.int64)],
            )
            from ..functions.hashing import md5_u64

            h0 = np.fromiter(
                (md5_u64(g) for g in grams), np.uint64, count=len(grams)
            )
            with np.errstate(over="ignore"):
                h = h0
                for r in range(CMS_DEPTH):
                    h = _splitmix64(h + np.uint64(r + 1))
                    np.add.at(
                        sk[r],
                        (h % np.uint64(CMS_WIDTH)).astype(np.int64),
                        cnt,
                    )
        # local candidates: this batch's top 4k by local count
        sel = np.argsort(-cnt)[: 4 * k] if len(cnt) else np.empty(0, np.int64)
        return pa.table(
            {
                "sketch": pa.array([sk.tobytes()]),
                "cand": pa.array(
                    [[str(grams[i]) for i in sel]],
                    pa.list_(pa.string()),
                ),
            }
        )

    return partial


def _merge_cms_parts(ds) -> tuple[np.ndarray, set]:
    """Driver merge of the per-batch count-min partials: SUM the
    fixed-size sketch matrices, union the candidate lists — both
    constant-size in corpus length."""
    sk = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
    cands: set[str] = set()
    for t in _arrow_blocks(ds):
        if not t.num_columns or not t.num_rows:
            continue
        for b in t["sketch"].to_pylist():
            sk += np.frombuffer(b, np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
        for lst in t["cand"].to_pylist():
            cands.update(lst)
    return sk, cands


def _cms_estimate(sk: np.ndarray, grams: list) -> np.ndarray:
    """Point-query the merged sketch: min over depth rows (the count-min
    estimate — never an undercount by construction)."""
    from ..functions.hashing import md5_u64
    from ..state.sink import _splitmix64 as _sm

    if not grams:
        return np.empty(0, np.int64)
    h0 = np.fromiter((md5_u64(g) for g in grams), np.uint64, count=len(grams))
    est = np.full(len(grams), np.iinfo(np.int64).max)
    with np.errstate(over="ignore"):
        h = h0
        for r in range(CMS_DEPTH):
            h = _sm(h + np.uint64(r + 1))
            est = np.minimum(
                est, sk[r][(h % np.uint64(CMS_WIDTH)).astype(np.int64)]
            )
    return est


@unreserved
def countmin_top_ngrams_checked(sf_dir: str, k: int = 20):
    """(ngram, cnt, rnk, sketch_ok) — the DRIVER-CHECKABLE form of the
    count-min op (flips its CORRECTNESS row from ``no_oracle`` to a
    value-hash gate): the output rows are the EXACT top-k bigrams (the
    ``top_ngrams`` distributed aggregate, which has a SQL oracle), and
    ``sketch_ok`` asserts the count-min guarantees per row against the
    merged sketch — estimate ≥ true count (structural: counters only
    over-count) AND estimate ≤ true + 3·N/width + 1 (N = total bigram
    occurrences, read off any sketch row's sum; the expected collision
    mass per row is N/width and the min over depth rows sits far below
    3× it). The oracle emits the same exact rows with ``true`` — a
    sketch violation flips the flag and fails the value hash."""
    exact = top_ngrams(sf_dir, k)
    grams = exact["ngram"].to_pylist()
    cnt = exact["cnt"].to_numpy(zero_copy_only=False)
    sk, _ = _merge_cms_parts(
        read_documents(sf_dir, ["text"]).map_batches(
            _cms_partial_factory(k), batch_format="pyarrow"
        )
    )
    est = _cms_estimate(sk, grams)
    n_big = int(sk[0].sum()) if sk.size else 0
    bound = 3 * n_big // CMS_WIDTH + 1
    ok = (est >= cnt) & (est <= cnt + bound)
    return pa.table(
        {
            "ngram": exact["ngram"],
            "cnt": exact["cnt"],
            "rnk": exact["rnk"],
            "sketch_ok": pa.array(ok, pa.bool_()),
        }
    )


def _value_col_bounds(sf_dir: str) -> tuple[float, float]:
    """(min, max) of events.value from parquet row-group statistics —
    no data scan (shared by the binned-quantile op and its checker)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/events.parquet")
    lo, hi = None, None
    for rg in range(f.metadata.num_row_groups):
        g = f.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema != "value":
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None or hi is None:
        lo, hi = 0.0, 1.0
    elif hi <= lo:
        # degenerate range (all values equal): widen around the real
        # value so bin 0's midpoint stays within half a bin width of it
        hi = lo + 1.0
    return float(lo), float(hi)


@unreserved
def value_quantiles_binned(
    sf_dir: str, ps: tuple[int, ...] = (50, 90, 99), n_bins: int = 4096
):
    """(event_type, p50, p90, p99) — APPROXIMATE per-type quantiles of
    the real-valued events.value by the fixed-width-bin histogram method
    (the unbounded-domain path promised by ``doclen_quantiles``): bin
    bounds from parquet row-group statistics (no extra scan), per-batch
    (type, bin) count partials, one histogram-sized shuffle, driver
    cumulative scan returns each rank's BIN MIDPOINT — error ≤ half a
    bin width = (max−min)/(2·n_bins), pytest-gated against the exact
    answer. Approximate → rows-only driver check.

    ``n_bins`` defaults to 4096: relative error ≤ 1/8192 of the value
    range, and — the load-bearing part at scale — per-batch partials
    actually COLLAPSE (≤ types·4096 rows each, independent of batch
    rows), so the shuffle is histogram-sized, not data-sized. The old
    100k default made partials nearly row-sized: every batch row landed
    in its own bin and the 'pre-aggregation' shipped the whole column
    (10.9 s → ~1 s at sf0.1 for the same gated error bound)."""
    from ray.data.aggregate import Sum

    lo, hi = _value_col_bounds(sf_dir)
    w = (hi - lo) / n_bins

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / w).astype(np.int64), 0, n_bins - 1)
        uk, cnt = np.unique(codes * n_bins + b, return_counts=True)
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(uk // n_bins, pa.int64())
                ).cast(pa.string()),
                "bin": pa.array(uk % n_bins, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    hist = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(4)
        .groupby(["event_type", "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    if hist.num_rows == 0:
        return pa.table(
            {"event_type": pa.array([], pa.string())}
            | {f"p{p}": pa.array([], pa.float64()) for p in ps}
        )
    et = np.asarray(hist["event_type"].to_pylist())
    bn = hist["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bn, et))
    et, bn, cnt = et[order], bn[order], cnt[order]
    out: dict[str, list] = {"event_type": []}
    for p in ps:
        out[f"p{p}"] = []
    start = 0
    for end in list(np.flatnonzero(et[1:] != et[:-1]) + 1) + [len(et)]:
        cum = np.cumsum(cnt[start:end])
        n = int(cum[-1])
        out["event_type"].append(str(et[start]))
        for p in ps:
            rank = (p * n + 99) // 100
            b = int(bn[start:end][np.searchsorted(cum, rank)])
            out[f"p{p}"].append(lo + (b + 0.5) * w)
        start = end
    return pa.table(
        {"event_type": pa.array(out["event_type"], pa.string())}
        | {f"p{p}": pa.array(out[f"p{p}"], pa.float64()) for p in ps}
    )


@unreserved
def value_quantiles_checked(
    sf_dir: str, ps: tuple[int, ...] = (50, 90, 99), n_bins: int = 4096
):
    """(event_type, p50, p90, p99, within_bound) — the DRIVER-CHECKABLE
    form of the binned-quantile op (flips its CORRECTNESS row from
    ``no_oracle`` to a value-hash gate): output quantiles are EXACT
    discrete quantiles (rank = ⌈p·n/100⌉, 1-indexed — DuckDB's
    ``quantile_disc`` convention, computed with one
    ``groupby(event_type)`` sort per group, the low-cardinality-domain
    shape ``group_quantiles`` documents), and ``within_bound`` asserts
    the histogram method's deterministic guarantee — the bin-midpoint
    estimate differs from the exact quantile by ≤ half a bin width,
    (max−min)/(2·n_bins). The oracle emits the same exact rows with
    ``true``; a bound violation flips the flag and fails the hash."""

    def qrow(group: pa.Table) -> pa.Table:
        v = np.sort(group["value"].to_numpy(zero_copy_only=False))
        n = len(v)
        cols = {"event_type": group["event_type"].slice(0, 1)}
        for p in ps:
            rank = (p * n + 99) // 100
            cols[f"p{p}"] = pa.array(
                [float(v[max(rank - 1, 0)])], pa.float64()
            )
        return pa.table(cols)

    exact = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .groupby("event_type")
        .map_groups(qrow, batch_format="pyarrow")
    )
    if exact.num_rows == 0 or "event_type" not in exact.column_names:
        # empty events → groupby yields a schema-less table
        cols = {"event_type": pa.array([], pa.string())}
        for p in ps:
            cols[f"p{p}"] = pa.array([], pa.float64())
        cols["within_bound"] = pa.array([], pa.bool_())
        return pa.table(cols)
    approx = value_quantiles_binned(sf_dir, ps, n_bins)
    lo, hi = _value_col_bounds(sf_dir)
    half_w = (hi - lo) / n_bins / 2.0 + 1e-9
    amap = {
        t: [approx[f"p{p}"][i].as_py() for p in ps]
        for i, t in enumerate(approx["event_type"].to_pylist())
    }
    types = np.asarray(exact["event_type"].to_pylist(), object)
    order = np.argsort(types)
    ok = np.ones(len(types), bool)
    for j, p in enumerate(ps):
        ex = exact[f"p{p}"].to_numpy(zero_copy_only=False)
        ap = np.array(
            [amap.get(t, [np.inf] * len(ps))[j] for t in types], np.float64
        )
        ok &= np.abs(ap - ex) <= half_w
    cols = {"event_type": pa.array(types[order], pa.string())}
    for p in ps:
        cols[f"p{p}"] = exact[f"p{p}"].take(pa.array(order))
    cols["within_bound"] = pa.array(ok[order], pa.bool_())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# corpus-statistics ops: bigram association (PMI), weighted sampling,
# unigram-LM document scoring

PMI_MIN_COUNT = 5  # bigrams below this global count are noise, dropped


@unreserved
def pmi_bigrams(sf_dir: str, min_count: int = PMI_MIN_COUNT):
    """(ngram, cnt, pmi) — pointwise mutual information for every bigram
    with global count ≥ ``min_count``: pmi = ln(p(ab) / (p(a)·p(b))) with
    p(ab) over the bigram stream and p(a), p(b) over the token stream.
    The collocation-extraction / tokenizer-merge-rule report (the same
    statistic BPE-style merges maximize).

    Scale shape: ONE corpus pass emits per-batch dictionary-coded
    partial counts for unigrams, bigrams and the two stream totals as a
    single tagged table, so one vocabulary²-bounded
    ``groupby(kind, gram)`` finalizes everything; low-count bigrams are
    dropped per-block AFTER the global sum (the filter is on final
    counts) so the driver assembles only the vocab-sized unigram table
    plus the report itself. At a vocabulary too large for driver
    assembly, the same tagged table feeds a broadcast-join variant
    (unigram side is the small one by construction). Exact SQL oracle:
    both sides evaluate the identical double expression
    ln((cnt·N_uni·N_uni) / (N_big·cnt_a·cnt_b)), rounded half-away at 4
    decimals."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        kinds: list[np.ndarray] = []
        grams: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        n_uni = int(len(codes))
        n_big = 0
        if len(uniq):
            uc, ucnt = np.unique(codes, return_counts=True)
            ua = np.array(uniq)
            kinds.append(np.full(len(uc), "u", object))
            grams.append(ua[uc])
            cnts.append(ucnt.astype(np.int64))
        if len(codes) >= 2:
            valid = doc_idx[:-1] == doc_idx[1:]
            n_big = int(valid.sum())
            U = max(len(uniq), 1)
            a, b = codes[:-1][valid], codes[1:][valid]
            uk, bcnt = np.unique(a * U + b, return_counts=True)
            ua = np.array(uniq)
            bg = np.char.add(
                np.char.add(ua[(uk // U).astype(np.int64)], " "),
                ua[(uk % U).astype(np.int64)],
            )
            kinds.append(np.full(len(uk), "b", object))
            grams.append(bg.astype(object))
            cnts.append(bcnt.astype(np.int64))
        kinds.append(np.array(["t", "t"], object))
        grams.append(np.array(["uni", "big"], object))
        cnts.append(np.array([n_uni, n_big], np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds), pa.string()),
                "gram": pa.array(np.concatenate(grams), pa.string()),
                "cnt": pa.array(np.concatenate(cnts), pa.int64()),
            }
        )

    def post_filter(batch: pa.Table) -> pa.Table:
        # final counts (post-groupby): drop the low-count bigram tail so
        # only vocab-sized + output-sized rows reach the driver
        import pyarrow.compute as pc

        keep = pc.or_(
            pc.not_equal(batch["kind"], "b"),
            pc.greater_equal(batch["cnt"], min_count),
        )
        return batch.filter(keep)

    agg = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby(["kind", "gram"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(post_filter, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "ngram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )
    if agg.num_rows == 0:
        return empty
    kind = np.asarray(agg["kind"].to_pylist())
    gram = np.asarray(agg["gram"].to_pylist(), object)
    cnt = agg["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    tot = {str(g): int(c) for g, c in zip(gram[kind == "t"], cnt[kind == "t"])}
    n_uni = float(tot.get("uni", 0))
    n_big = float(tot.get("big", 0))
    um = kind == "u"
    uterms = gram[um].astype(str)
    uorder = np.argsort(uterms)
    uterms, ucnt = uterms[uorder], cnt[um][uorder].astype(np.float64)
    bm = kind == "b"
    if not bm.any() or n_big == 0:
        return empty
    bg = gram[bm].astype(str)
    bcnt = cnt[bm].astype(np.int64)
    parts = np.char.partition(bg, " ")
    ta, tb = parts[:, 0], parts[:, 2]
    ca = ucnt[np.searchsorted(uterms, ta)]
    cb = ucnt[np.searchsorted(uterms, tb)]
    # identical double expression tree as the SQL oracle (left-assoc)
    pmi = np.log((bcnt.astype(np.float64) * n_uni * n_uni) / (n_big * ca * cb))
    order = np.argsort(bg)
    return pa.table(
        {
            "ngram": pa.array(bg[order], pa.string()),
            "cnt": pa.array(bcnt[order], pa.int64()),
            "pmi": pa.array(
                [round4(float(x)) for x in pmi[order]], pa.float64()
            ),
        }
    )


WSAMPLE_U_MOD = 9007199254740991  # 2^53 - 1: u in (0, 1] exactly in double


@unreserved
def weighted_sample(sf_dir: str, k: int = 20):
    """(doc_id, n_chars, wkey, rnk) — deterministic weight-proportional
    sample WITHOUT replacement of k documents, weight = n_chars, by the
    Efraimidis–Spirakis A-ES scheme: each row draws a reproducible
    uniform u ∈ (0,1] from md5("wsample:"||doc_id) and the k largest
    u^(1/w) win — computed as ln(u)/w, which is order-equivalent and
    float-cheaper. The "sample long documents proportionally more"
    curation primitive, exactly re-runnable on any cluster shape.

    Scale shape: embarrassingly parallel per-batch key computation +
    per-batch partial top-k (≤ k rows leave each batch), k·blocks driver
    merge; zero shuffle, corpus read once with only the needed columns.
    Exact SQL oracle — both sides evaluate the identical double
    expression on the identical md5-derived u."""
    from ..functions.hashing import md5_i63

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        h = np.fromiter(
            (md5_i63(f"wsample:{i}") for i in ids), np.int64, count=len(ids)
        )
        u = ((h % WSAMPLE_U_MOD) + 1).astype(np.float64) / 9007199254740992.0
        wkey = np.log(u) / w.astype(np.float64)
        sel = np.lexsort((ids, -wkey))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "n_chars": pa.array(w[sel], pa.int64()),
                "wkey": pa.array(wkey[sel], pa.float64()),
            }
        )

    cand = _to_table(
        read_documents(sf_dir, ["doc_id", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"
        )
    )
    if cand.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "wkey": pa.array([], pa.float64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    ids = cand["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = cand["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    wkey = cand["wkey"].to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, -wkey))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[sel], pa.int64()),
            "n_chars": pa.array(w[sel], pa.int64()),
            "wkey": pa.array(
                [round4(float(x)) for x in wkey[sel]], pa.float64()
            ),
            "rnk": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
        }
    )


@unreserved
def unigram_logprob(sf_dir: str):
    """(doc_id, n_tokens, logprob_e4) — per-document log-probability
    under the corpus's own unigram language model (the CCNet/KenLM-style
    "perplexity" quality filter, with the corpus itself as the LM):
    logprob_e4 = Σ_tokens round(ln(cnt(term)/N) · 1e4), an INTEGER in
    1e-4-nat units. Quantizing each term's log-prob to int64 BEFORE the
    per-doc sum makes the result exactly order-independent — a float sum
    would depend on reduction order and could never hash-match a SQL
    oracle. Zero-token documents have no LM score and are omitted (the
    oracle's join drops them identically).

    Scale shape: pass 1 is a vocabulary-bounded unigram groupby whose
    result ships once via ray.put (the broadcast-small-side pattern;
    vocab ≪ corpus by Heaps' law); pass 2 is an embarrassingly parallel
    per-batch searchsorted lookup + segment-sum. Exact SQL oracle."""
    from ray.data.aggregate import Sum

    def ucounts(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        if not len(uniq):
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        uc, ucnt = np.unique(codes, return_counts=True)
        return pa.table(
            {
                "term": pa.array(np.array(uniq)[uc], pa.string()),
                "cnt": pa.array(ucnt.astype(np.int64), pa.int64()),
            }
        )

    uni = _to_table(
        read_documents(sf_dir, ["text"])
        .map_batches(ucounts, batch_format="pyarrow")
        .repartition(4)
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    if uni.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "logprob_e4": pa.array([], pa.int64()),
            }
        )
    terms = np.asarray(uni["term"].to_pylist())
    cnt = uni["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(terms)
    terms, cnt = terms[order], cnt[order]
    n_uni = float(cnt.sum())
    # identical expression as the SQL oracle: round(ln(c/N)·1e4)::bigint
    v = np.log(cnt.astype(np.float64) / n_uni) * 10000.0
    lp_e4 = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
    lm_ref = ray.put((terms, lp_e4))

    def score(batch: pa.Table) -> pa.Table:
        terms_s, lp = ray.get(lm_ref)
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.asarray(lens, np.int64)
        nz = lens > 0
        if not nz.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logprob_e4": pa.array([], pa.int64()),
                }
            )
        tok_lp = lp[
            np.searchsorted(terms_s, np.array(uniq))[codes]
            if len(uniq)
            else np.empty(0, np.int64)
        ]
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sums = np.add.reduceat(tok_lp, starts[nz])
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], pa.int64()),
                "n_tokens": pa.array(lens[nz], pa.int64()),
                "logprob_e4": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


@unreserved
def kmeans_clusters(sf_dir: str, nlist: int = 8, iters: int = 2):
    """(cluster, n, mean_cos) — spherical k-means clustering report over
    the embedding table: cluster sizes and mean within-cluster cosine to
    the centroid (cohesion). The corpus-bucketing / topic-sharding
    primitive (and the same trainer the IVF ANN index uses —
    ``_kmeans_train`` is shared).

    Scale shape: Lloyd passes stream per-batch (cell, sum, count)
    partials with O(nlist·dim) driver state; the final assignment pass
    emits per-batch (cluster, n, cos_sum) partials — nlist rows per
    batch — merged driver-side. Iterative/approximate → rows-only driver
    check; pytest gates exact equality of sizes (and mean_cos to 1e-9)
    vs a single-process replication."""
    cent = _kmeans_train(sf_dir, nlist, iters)
    c_ref = ray.put(cent)

    def assign_partial(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "cos_sum": pa.array([], pa.float64()),
                }
            )
        X = _emb_unit_mat(batch)
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(X)), assign]
        n = np.bincount(assign, minlength=len(C)).astype(np.int64)
        cs = np.zeros(len(C), np.float64)
        np.add.at(cs, assign, best)
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(C)), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cos_sum": pa.array(cs, pa.float64()),
            }
        )

    parts = _to_table(
        read_embeddings(sf_dir, ["embedding"]).map_batches(
            assign_partial, batch_format="pyarrow"
        )
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "cluster": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "mean_cos": pa.array([], pa.float64()),
            }
        )
    cl = parts["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
    pn = parts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    pcs = parts["cos_sum"].to_numpy(zero_copy_only=False)
    n = np.zeros(nlist, np.int64)
    np.add.at(n, cl, pn)
    # deterministic merge order: accumulate partial sums sorted by
    # (cluster, cos_sum) so the float result does not depend on the
    # order blocks happen to arrive in (batch BOUNDARIES still shift
    # float sums at the 1e-16 level — hence round4 + tolerance gates)
    order = np.lexsort((pcs, cl))
    cs = np.zeros(nlist, np.float64)
    np.add.at(cs, cl[order], pcs[order])
    mean = np.where(n > 0, cs / np.maximum(n, 1), 0.0)
    return pa.table(
        {
            "cluster": pa.array(np.arange(nlist, dtype=np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "mean_cos": pa.array(
                [round4(float(x)) for x in mean], pa.float64()
            ),
        }
    )


@unreserved
def lang_source_rollup(sf_dir: str):
    """(lang, source, n, chars) at every ROLLUP((lang, source)) level —
    per-(lang, source), per-lang subtotals, and the grand total, with
    'ALL' marking rolled-up dimensions. The OLAP report shape.

    Scale shape: ONE corpus pass of per-batch dictionary-coded partials
    and ONE |langs×sources|-bounded groupby compute the FINEST level;
    the coarser levels are integer sums over that (tiny) aggregate —
    rollup costs one shuffle, not one per level. Exact SQL oracle
    (GROUP BY ROLLUP)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # NULL dimensions would render as the string "None" here while
        # the SQL oracle's rollup treats them as their own NULL group —
        # and a real 'ALL' value would collide with the subtotal marker;
        # fail loudly instead of silently diverging
        for c in ("lang", "source"):
            if batch[c].null_count or pc.any(
                pc.equal(batch[c], "ALL")
            ).as_py():
                raise ValueError(
                    f"lang_source_rollup: column {c!r} contains NULL or "
                    "the reserved label 'ALL'"
                )
        lang = np.asarray(batch["lang"].to_pylist(), object)
        src = np.asarray(batch["source"].to_pylist(), object)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.char.add(
            np.char.add(lang.astype(str), "\x01"), src.astype(str)
        )
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        chars = np.zeros(len(uk), np.int64)
        np.add.at(chars, inv, nch)
        parts = np.char.partition(uk, "\x01")
        return pa.table(
            {
                "lang": pa.array(parts[:, 0], pa.string()),
                "source": pa.array(parts[:, 2], pa.string()),
                "n": pa.array(n, pa.int64()),
                "chars": pa.array(chars, pa.int64()),
            }
        )

    fine = _to_table(
        read_documents(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(2)
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("chars", alias_name="chars")
        )
    )
    if fine.num_columns == 0 or fine.num_rows == 0:
        # SQL ROLLUP always emits the () grouping set: one grand-total
        # row even over zero input rows (count 0, NULL sum)
        return pa.table(
            {
                "lang": pa.array(["ALL"], pa.string()),
                "source": pa.array(["ALL"], pa.string()),
                "n": pa.array([0], pa.int64()),
                "chars": pa.array([None], pa.int64()),
            }
        )
    lang = np.asarray(fine["lang"].to_pylist(), object)
    src = np.asarray(fine["source"].to_pylist(), object)
    n = fine["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ch = fine["chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    ul, linv = np.unique(lang.astype(str), return_inverse=True)
    ln = np.zeros(len(ul), np.int64)
    lch = np.zeros(len(ul), np.int64)
    np.add.at(ln, linv, n)
    np.add.at(lch, linv, ch)
    out_lang = np.concatenate([lang.astype(str), ul, ["ALL"]])
    out_src = np.concatenate(
        [src.astype(str), np.full(len(ul), "ALL"), ["ALL"]]
    )
    out_n = np.concatenate([n, ln, [n.sum()]])
    out_ch = np.concatenate([ch, lch, [ch.sum()]])
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n": pa.array(out_n.astype(np.int64), pa.int64()),
            "chars": pa.array(out_ch.astype(np.int64), pa.int64()),
        }
    )


@unreserved
def type_token_ratio(sf_dir: str):
    """(doc_id, n_tokens, n_distinct, ttr) — lexical diversity per
    document (type-token ratio): the low-diversity / boilerplate signal
    next to the Gopher gate. Zero-token docs are omitted (no ratio).
    Fully vectorized: one lexsort over (doc, token-code) per batch, run
    boundaries count the distinct types. Zero shuffle, exact SQL
    oracle."""

    def f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.asarray(lens, np.int64)
        nz = lens > 0
        if not nz.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "ttr": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((codes, doc_idx))
        d_s, c_s = doc_idx[order], codes[order]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        n_distinct = np.zeros(len(lens), np.int64)
        np.add.at(n_distinct, d_s, new.astype(np.int64))
        # identical IEEE expression as the oracle: distinct::double / n
        ttr = n_distinct[nz].astype(np.float64) / lens[nz].astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], pa.int64()),
                "n_tokens": pa.array(lens[nz], pa.int64()),
                "n_distinct": pa.array(n_distinct[nz], pa.int64()),
                "ttr": pa.array(
                    [round4(float(x)) for x in ttr], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# span-level dedup + repetition signals (C4/Gopher-style span hygiene)

SPAN_W = 10  # tokens per dedup span
_SPAN_IDX_BITS = 21  # chunk_idx < 2^21 → docs up to ~20M tokens


@unreserved
def dedup_spans(sf_dir: str, span_w: int = SPAN_W):
    """(doc_id, n_spans, n_dup_spans) — corpus-wide SPAN dedup (the
    C4-style "drop text reused elsewhere" signal at sub-document
    granularity): each document's token stream splits into consecutive
    ``span_w``-token spans (trailing partial span included); a span
    occurrence is a DUPLICATE unless it is the globally first occurrence
    of its text, first = smallest (doc_id, chunk_idx).

    Distributed shape (the 100 TB shape, not a driver loop):

    - map_batches: tokenize, join each span's tokens, ship only
      (doc_id, chunk_idx, sha256(span)) — the shuffle key is a fixed
      32-byte digest, never the text;
    - one data-sized ``groupby(sha)`` with a ``Min`` aggregate over the
      packed key ``doc_id << 21 | chunk_idx`` picks each span's winner
      without materializing groups (no map_groups over millions of tiny
      groups);
    - winner counts and per-doc span counts union into ONE output-sized
      ``groupby(doc_id)``; dup count = spans − wins.

    Exact SQL oracle (string_agg spans + row_number over span)."""
    from ray.data.aggregate import Min, Sum

    if span_w < 1:
        raise ValueError("span_w must be >= 1")

    def spans(batch: pa.Table) -> pa.Table:
        from ..text import tokenize_batch

        lens, toks = tokenize_batch(batch["text"].to_pylist())
        toks = toks.to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_doc: list[int] = []
        out_idx: list[int] = []
        out_sha: list[str] = []
        off = 0
        for did, n in zip(ids.tolist(), lens):
            end = off + n
            for ci in range(0, (n + span_w - 1) // span_w):
                s = off + ci * span_w
                out_doc.append(did)
                out_idx.append(ci)
                # clamp the trailing partial span to THIS doc's tokens —
                # toks is flat across the whole batch
                out_sha.append(
                    sha256_hex(" ".join(toks[s : min(s + span_w, end)]))
                )
            off = end
        if out_idx and max(out_idx) >= (1 << _SPAN_IDX_BITS):
            raise ValueError(
                f"document exceeds {span_w << _SPAN_IDX_BITS} tokens — "
                "raise _SPAN_IDX_BITS"
            )
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "sha": pa.array(out_sha, pa.string()),
            }
        )

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        spans, batch_format="pyarrow"
    )

    def packed(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "sha": batch["sha"],
                "m": pa.array((d << _SPAN_IDX_BITS) | c, pa.int64()),
            }
        )

    wins = (
        ds.map_batches(packed, batch_format="pyarrow")
        .repartition(8)
        .groupby("sha")
        .aggregate(Min("m", alias_name="m"))
    )

    def win_rows(batch: pa.Table) -> pa.Table:
        m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = m >> _SPAN_IDX_BITS
        # per-batch partial combine before the doc-keyed shuffle
        u, n = np.unique(doc, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_spans": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "n_wins": pa.array(n, pa.int64()),
            }
        )

    def span_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_spans": pa.array(n, pa.int64()),
                "n_wins": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    both = (
        ds.map_batches(span_rows, batch_format="pyarrow")
        .union(wins.map_batches(win_rows, batch_format="pyarrow"))
        # both inputs are per-doc partials (tiny blocks); coalesce before
        # the final output-sized shuffle
        .repartition(4)
    )
    agg = both.groupby("doc_id").aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("n_wins", alias_name="n_wins"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch["n_spans"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = batch["n_wins"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_spans": pa.array(ns, pa.int64()),
                "n_dup_spans": pa.array(ns - nw, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


REP_NGRAM_N = 5  # Gopher-style duplicate 5-gram repetition signal


@unreserved
def rep_ngram_frac(sf_dir: str, n: int = REP_NGRAM_N):
    """(doc_id, n_grams, rep_frac) — WITHIN-document repetition signal
    (Gopher repetition filters): the fraction of a doc's ``n``-gram
    occurrences that are repeats of an earlier identical n-gram,
    rep_frac = (n_grams − distinct) / n_grams. Docs with fewer than
    ``n`` tokens have no complete gram and are omitted (matches the
    oracle's ``WHERE gram IS NOT NULL``).

    Pure per-document metric → ZERO shuffle: one map_batches, grams
    compared as (doc, code₀..codeₙ₋₁) int rows (batch dictionary codes
    are injective on term strings), distinct counted via one np.unique
    over the packed row view."""

    def f(batch: pa.Table) -> pa.Table:
        lens, doc_idx, codes, uniq = _batch_token_codes(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.asarray(lens, np.int64)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        ok = lens >= n
        if not ok.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "rep_frac": pa.array([], pa.float64()),
                }
            )
        # gram start positions: every in-doc offset 0..len-n (vectorized
        # as a delete of the last n-1 positions of each doc)
        n_grams = np.where(ok, lens - (n - 1), 0)
        gstart_parts = [
            np.arange(starts[i], starts[i] + n_grams[i])
            for i in np.nonzero(ok)[0]
        ]
        g0 = np.concatenate(gstart_parts)
        rows = np.empty((len(g0), n + 1), np.int64)
        rows[:, 0] = doc_idx[g0]
        for j in range(n):
            rows[:, j + 1] = codes[g0 + j]
        uniq_rows = np.unique(
            np.ascontiguousarray(rows).view([("", np.int64)] * (n + 1))
        )
        udoc = uniq_rows.view(np.int64).reshape(-1, n + 1)[:, 0]
        n_distinct = np.zeros(len(lens), np.int64)
        np.add.at(n_distinct, udoc, 1)
        ng = n_grams[ok].astype(np.float64)
        frac = (n_grams[ok] - n_distinct[ok]) / ng
        return pa.table(
            {
                "doc_id": pa.array(ids[ok], pa.int64()),
                "n_grams": pa.array(n_grams[ok], pa.int64()),
                "rep_frac": pa.array(
                    [round4(float(x)) for x in frac], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# search-result facets + per-user event deltas


@unreserved
def facet_counts(sf_dir: str, doc_ids: np.ndarray):
    """(lang, source, n_docs) — metadata facets over a search result set
    (the result-page "refine by" counts): ``doc_ids`` (a sorted id array
    from a boolean/ranked search) is BROADCAST via ``ray.put`` — the
    small side never shuffles; membership is a per-batch searchsorted;
    facet counts pre-combine per batch before one facet-sized groupby."""
    from ray.data.aggregate import Sum

    ids_ref = ray.put(np.asarray(sorted(doc_ids), np.int64))

    def f(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size:
            pos = np.clip(np.searchsorted(ids, d), 0, ids.size - 1)
            keep = ids[pos] == d
        else:
            keep = np.zeros(len(d), bool)
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["lang", "source"]).aggregate([("doc_id", "count")])
        return pa.table(
            {
                "lang": g["lang"],
                "source": g["source"],
                "n_docs": g["doc_id_count"].cast(pa.int64()),
            }
        )

    # facet partials are |langs×sources|-sized per block; coalescing
    # before the two-key sort shuffle removes most of its per-block
    # overhead (same fix as term_stats)
    return (
        read_documents(sf_dir, ["doc_id", "lang", "source"])
        .map_batches(f, batch_format="pyarrow")
        .repartition(4)
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


@unreserved
def event_value_delta(sf_dir: str):
    """(event_id, user_id, delta) — per-user LAG delta: each event's
    ``value`` minus the user's previous event's value in (ts, event_id)
    order; a user's first event has no predecessor and is omitted
    (matches the oracle's QUALIFY). One ``groupby(user_id)`` shuffle;
    the per-group pass is a vectorized lexsort + diff — the same by-key
    shape as sessionize (a skew-safe by-time variant would partition the
    time axis exactly like running_totals_by_time; per-user histories
    here are small)."""

    def rows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tu = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "value": batch["value"],
                "tu": pa.array(tu, pa.int64()),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        tu = group["tu"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tu))
        eid_s, val_s, uid_s = eid[order], val[order], uid[order]
        if len(order) < 2:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "delta": pa.array([], pa.float64()),
                }
            )
        delta = val_s[1:] - val_s[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid_s[1:], pa.int64()),
                "user_id": pa.array(uid_s[1:], pa.int64()),
                "delta": pa.array(
                    [round4(float(x)) for x in delta], pa.float64()
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# product-quantization ANN (compressed-index scale path)

PQ_M = 16  # subspaces
PQ_KSUB = 16  # centroids per subspace
PQ_TRAIN_SAMPLE = 4096
PQ_TRAIN_ITERS = 4
PQ_RERANK_FACTOR = 8  # ADC shortlist = factor × k, exact-reranked


def _pq_train(sf_dir: str, m: int, ksub: int, iters: int):
    """Per-subspace codebooks trained on a BOUNDED head sample (standard
    PQ practice: train on a sample, encode the full corpus) — the
    codebook is the only driver-resident state, O(m·ksub·dim/m) floats
    regardless of corpus size. Deterministic: sample = lowest-vec_id rows
    of the leading row groups, init = first ksub sample rows per
    subspace, plain Lloyd with empty cells keeping their centroid."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    parts = []
    got = 0
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg, columns=["vec_id", "embedding"])
        parts.append(t)
        got += t.num_rows
        if got >= PQ_TRAIN_SAMPLE:
            break
    head = pa.concat_tables(parts)
    order = np.argsort(head["vec_id"].to_numpy(), kind="stable")
    head = head.take(pa.array(order[:PQ_TRAIN_SAMPLE]))
    X = _emb_unit_mat(head)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # degenerate corpora: fewer sample rows than centroids → shrink the
    # codebook (codes/luts size with it; ADC stays exact)
    ksub = max(1, min(ksub, X.shape[0]))
    books = np.empty((m, ksub, sub), np.float64)
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = Xj[:ksub].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                sel = assign == c
                if sel.any():
                    C[c] = Xj[sel].mean(axis=0)
        books[j] = C
    return books


@unreserved
def embedding_pq_topk(
    sf_dir: str,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rerank_factor: int = PQ_RERANK_FACTOR,
):
    """(vec_id, cos) — product-quantization ANN top-k with exact rerank
    (the standard ADC+rerank pipeline): vectors compress to ``m`` uint8
    codes (16 B here vs dim×4 B floats — the 100 TB memory story: the
    scan state is the CODES, dim·4/m× smaller than raw), the query
    expands once into m×ksub inner-product lookup tables, the scan
    scores every vector as a table-lookup sum (ADC, no float vector
    touched), and only the ``rerank_factor × k`` ADC shortlist gets
    exact cosines (in a persisted deployment: point reads of the
    shortlist's float rows against the stored code index). Encode + ADC
    run in one streaming ``map_batches``; each batch ships only its
    shortlist. Approximate → rows-only driver check; recall vs the
    brute-force baseline is pytest-gated. Deterministic end to end
    (sample init, no RNG)."""
    books = _pq_train(sf_dir, m, ksub, PQ_TRAIN_ITERS)
    q = _query_vector(sf_dir)
    q = q / (np.linalg.norm(q) or 1.0)
    sub = books.shape[2]
    # luts[j, c] = <q_j, codebook[j][c]> — ADC score = Σ_j luts[j, code_j]
    luts = np.einsum("jkd,jd->jk", books, q.reshape(m, sub))
    b_ref = ray.put(books)
    l_ref = ray.put(luts)
    q_ref = ray.put(q)
    R = max(k, rerank_factor * k)

    def scan(batch: pa.Table) -> pa.Table:
        B, L, qv = ray.get(b_ref), ray.get(l_ref), ray.get(q_ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "adc": pa.array([], pa.float64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        X = _emb_unit_mat(batch)
        n = X.shape[0]
        codes = np.empty((n, m), np.int64)
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            # ||x-c||² argmin == argmax(<x,c> - ||c||²/2), one matmul
            score = Xj @ B[j].T - 0.5 * (B[j] * B[j]).sum(axis=1)
            codes[:, j] = np.argmax(score, axis=1)
        adc = L[np.arange(m)[None, :], codes].sum(axis=1)
        ids = batch["vec_id"].to_numpy()
        sel = np.arange(n)
        if n > R:
            sel = np.lexsort((ids, -adc))[:R]
        cos = X[sel] @ qv  # shortlist-sized exact rerank input
        return pa.table(
            {
                "vec_id": pa.array(ids[sel], pa.int64()),
                "adc": pa.array(adc[sel], pa.float64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    t = _to_table(
        read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
            scan, batch_format="pyarrow"
        )
    )
    ids = t["vec_id"].to_numpy()
    adc = t["adc"].to_numpy()
    cos = t["cos"].to_numpy()
    short = np.lexsort((ids, -adc))[:R]  # global ADC shortlist ...
    fin = short[np.lexsort((ids[short], -cos[short]))][:k]  # ... reranked
    return pa.table(
        {
            "vec_id": pa.array(ids[fin], pa.int64()),
            "cos": pa.array(
                [round4(float(x)) for x in cos[fin]], pa.float64()
            ),
        }
    )


@unreserved
def doc_ids_where(sf_dir: str, column: str, value):
    """Sorted doc ids whose metadata ``column`` equals ``value`` — a
    pruned two-column read + Arrow-kernel filter, materialized to one id
    array (the broadcast 'allowed' side of metadata-filtered search; at
    result scale beyond one node, pass the ids as range predicates to
    the DocStatsShard range partitions instead)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[column], value)).select(
            ["doc_id"]
        )

    t = _to_table(
        read_documents(sf_dir, ["doc_id", column]).map_batches(
            f, batch_format="pyarrow"
        )
    )
    if t.num_columns == 0 or t.num_rows == 0:
        return np.empty(0, np.int64)
    return np.sort(t["doc_id"].to_numpy().astype(np.int64))


# GPT-2-style pre-tokenizer, minus the lookahead RE2 lacks — the
# "BPE-ish" token estimator (counts pre-merge pieces; real BPE merges
# only reduce the count, so this is a stable upper-bound proxy)
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


@unreserved
def bpe_token_count(sf_dir: str):
    """(doc_id, n_bpe_tokens, chars_per_token) — LLM-cost token estimate
    per document via a GPT-2-style pre-tokenizer regex (contractions /
    letter runs / digit runs / punctuation runs / whitespace). Counting
    runs entirely inside Arrow's RE2 kernel (zero Python per row), and
    DuckDB's regexp is RE2 too, so the SQL oracle counts agree exactly.
    Zero-token docs report no ratio (omitted)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], BPE_PATTERN)
        n = n.combine_chunks() if isinstance(n, pa.ChunkedArray) else n
        nn = n.to_numpy(zero_copy_only=False).astype(np.int64)
        chars = (
            batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = nn > 0
        cpt = chars[keep].astype(np.float64) / nn[keep].astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "n_bpe_tokens": pa.array(nn[keep], pa.int64()),
                "chars_per_token": pa.array(
                    [round4(float(x)) for x in cpt], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


CHUNK_W = 10  # tokens per chunk
CHUNK_STRIDE = 5  # overlap = W - stride


@unreserved
def chunk_documents(
    sf_dir: str, w: int = CHUNK_W, stride: int = CHUNK_STRIDE
):
    """(doc_id, chunk_idx, n_tokens, chunk_text) — sliding-window
    document chunking with provenance (the RAG / context-window prep
    step): windows of ``w`` tokens starting every ``stride`` tokens
    (trailing partial windows included), chunk_idx dense per doc.
    Zero-token docs produce no chunks.

    Pure per-document transform → zero shuffle, one map_batches; at
    100 TB the output streams straight to a partitioned sink (each chunk
    row carries its provenance, so downstream embedding/dedup stages
    never need the source doc again)."""
    if stride < 1 or w < 1:
        raise ValueError("w and stride must be >= 1")

    def f(batch: pa.Table) -> pa.Table:
        from ..text import tokenize_batch

        lens, toks = tokenize_batch(batch["text"].to_pylist())
        toks = toks.to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_doc: list[int] = []
        out_idx: list[int] = []
        out_n: list[int] = []
        out_txt: list[str] = []
        off = 0
        for did, n in zip(ids.tolist(), lens):
            end = off + n
            for ci, s in enumerate(range(0, n, stride)):
                piece = toks[off + s : min(off + s + w, end)]
                out_doc.append(did)
                out_idx.append(ci)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
            off = end
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


@unreserved
def hash_join_orders_customers(sf_dir: str):
    """(o_orderkey, o_custkey, c_name, price_cents) — large×large
    SHUFFLE hash equi-join (completes the join family: broadcast join
    covers small dimensions, semi/anti cover existence, asof/range cover
    inequality; this is the both-sides-big inner join). Both sides are
    tagged and hash-partitioned by the key in ONE ``groupby``; each
    group joins locally (vectorized searchsorted of probe keys into the
    few build rows). Partitioning assumption: one key's rows fit a task
    — salt hot keys into sub-partitions when they don't (the same
    skew treatment as the by_time variants). Price in exact integer
    cents so values are bit-stable under any order."""

    def o_rows(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": batch["o_custkey"].cast(pa.int64()),
                "orderkey": batch["o_orderkey"].cast(pa.int64()),
                "cents": pa.array(
                    np.round(price * 100).astype(np.int64), pa.int64()
                ),
                "name": pa.array([""] * batch.num_rows, pa.string()),
                "side": pa.array(
                    np.zeros(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )

    def c_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["c_custkey"].cast(pa.int64()),
                "orderkey": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
                "cents": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
                "name": batch["c_name"],
                "side": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def join_group(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = group["side"].to_numpy(zero_copy_only=False)
        build = group.filter(pa.array(side == 1))
        probe = group.filter(pa.array(side == 0))
        if build.num_rows == 0 or probe.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "price_cents": pa.array([], pa.int64()),
                }
            )
        # duplicate build keys emit the per-key cartesian product, the
        # inner-join semantics (one row per customer here, so output is
        # orders-sized)
        parts = [
            pa.table(
                {
                    "o_orderkey": probe["orderkey"],
                    "o_custkey": probe["key"],
                    "c_name": pa.array(
                        [build["name"][i].as_py()] * probe.num_rows,
                        pa.string(),
                    ),
                    "price_cents": probe["cents"],
                }
            )
            for i in range(build.num_rows)
        ]
        return pa.concat_tables(parts)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(o_rows, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(c_rows, batch_format="pyarrow")
    return (
        orders.union(cust)
        .groupby("key")
        .map_groups(join_group, batch_format="pyarrow")
    )


@unreserved
def chunk_then_embed_topk(sf_dir: str, k: int = 20, dim: int = 32):
    """(doc_id, chunk_idx, cos) — the RAG retrieval composition end to
    end as ONE streaming pipeline: sliding-window chunking →
    per-chunk hashing-embedding → brute-force cosine top-k against
    doc 0's first chunk (broadcast once, per-batch partial top-k). Each
    hit carries (doc, chunk) provenance — the unit a context window
    actually consumes. Model scoring → no SQL oracle; gated by
    determinism + self-hit pytest."""
    import pyarrow.parquet as pqt

    from ..stages.embedder import HashingEmbedder

    row = pqt.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filters=[("doc_id", "==", 0)],
    )
    t0 = row["text"][0].as_py()
    first_chunk = " ".join(tokenize(t0)[:CHUNK_W])
    q = HashingEmbedder(dim=dim).embed([first_chunk])[0]
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        emb = HashingEmbedder(dim=len(qv)).embed(
            batch["chunk_text"].to_pylist()
        )
        cos = emb @ qv
        ids = batch["doc_id"].to_numpy()
        cidx = batch["chunk_idx"].to_numpy()
        if len(cos) > k:
            sel = np.lexsort((cidx, ids, -cos))[:k]
            cos, ids, cidx = cos[sel], ids[sel], cidx[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(cidx, pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    t = _to_table(
        chunk_documents(sf_dir).map_batches(score, batch_format="pyarrow")
    )
    order = np.lexsort(
        (
            t["chunk_idx"].to_numpy(),
            t["doc_id"].to_numpy(),
            -t["cos"].to_numpy(),
        )
    )[:k]
    t = t.take(pa.array(order))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "chunk_idx": t["chunk_idx"],
            "cos": pa.array(
                [round4(float(x)) for x in t["cos"].to_pylist()],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# per-group statistics (mode / exact quantiles)

MODE_BUCKETS = 64


@unreserved
def mode_event_type(sf_dir: str):
    """(user_id, mode_type, n_events) — each user's most frequent event
    type (ties broken by lexicographically smallest type — fully
    deterministic, exact SQL oracle).

    Count-then-argmax in ONE count-sized shuffle: per-batch partial
    (user, type) counts (numpy lexsort run-length) route by
    ``user_id % MODE_BUCKETS``; each bucket task sums its partials and
    takes the per-user argmax in a single vectorized
    sort + first-per-key pass (never a per-user ``map_groups`` call) —
    all of a user's partials land in one bucket, so no second exchange
    is needed. At 100 TB the shuffle payload is bounded by distinct
    (user, type) pairs per batch, not events."""
    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        u = batch["user_id"].to_numpy().astype(np.int64, copy=False)
        if not len(u):  # np.r_[True, ...] below is wrong on 0 rows
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        types, tcode = np.unique(
            np.asarray(batch["event_type"].to_numpy(zero_copy_only=False)),
            return_inverse=True,
        )
        o = np.lexsort((tcode, u))
        ku, kt = u[o], tcode[o]
        new = np.r_[True, (np.diff(ku) != 0) | (np.diff(kt) != 0)]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(ku)])  # run length = count
        gu = ku[new]
        return pa.table(
            {
                "bucket": pa.array(gu % MODE_BUCKETS, pa.int64()),
                "user_id": pa.array(gu, pa.int64()),
                "event_type": pa.array(types[kt[new]], pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def combine_argmax(group: pa.Table) -> pa.Table:
        # Arrow/numpy all the way (the library's np.unique/reduceat
        # idiom): dictionary-encode types, one lexsort to co-locate
        # (user, type) runs, reduceat-sum the partials, then a second
        # lexsort by (user, -n, type) whose first-per-user row IS the
        # deterministic argmax (ties -> lexicographically smallest).
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "mode_type": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        group = group.combine_chunks()
        u = group["user_id"].to_numpy()
        types, tcode = np.unique(
            np.asarray(group["event_type"].to_numpy(zero_copy_only=False)),
            return_inverse=True,
        )
        n = group["n"].to_numpy()
        o = np.lexsort((tcode, u))
        ku, kt, kn = u[o], tcode[o], n[o]
        new = np.r_[True, (np.diff(ku) != 0) | (np.diff(kt) != 0)]
        sums = np.add.reduceat(kn, np.flatnonzero(new))
        gu, gt = ku[new], kt[new]
        o2 = np.lexsort((gt, -sums, gu))
        first = np.r_[True, np.diff(gu[o2]) != 0]
        pick = o2[first]
        return pa.table(
            {
                "user_id": pa.array(gu[pick], pa.int64()),
                "mode_type": pa.array(types[gt[pick]], pa.string()),
                "n_events": pa.array(sums[pick], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine_argmax, batch_format="pyarrow")
        .select_columns(["user_id", "mode_type", "n_events"])
    )


GROUP_QUANTILES = (0.25, 0.5, 0.75, 0.95)


@unreserved
def group_quantiles(sf_dir: str):
    """(event_type, p25, p50, p75, p95) — EXACT per-group value
    quantiles (linear interpolation == DuckDB ``quantile_cont``).

    One ``groupby(event_type)`` shuffle; each group's values sort in
    one task. That is the right shape for LOW-CARDINALITY group domains
    (here ≤ ~10 event types — each group is input/|domain| and the
    task count equals the domain); for high-cardinality keys or groups
    that exceed one task, ``value_quantiles_binned`` is this library's
    bounded-error streaming path (binned histogram, no per-group
    sort)."""

    def qrow(group: pa.Table) -> pa.Table:
        v = np.sort(group["value"].to_numpy(zero_copy_only=False))
        out: dict[str, pa.Array] = {
            "event_type": pa.array([group["event_type"][0].as_py()])
        }
        for q in GROUP_QUANTILES:
            out[f"p{int(q * 100)}"] = pa.array(
                [round4(float(np.quantile(v, q)))], pa.float64()
            )
        return pa.table(out)

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .groupby("event_type")
        .map_groups(qrow, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# character-level entropy (quality signal)

_CP_SPACE = 0x110000  # codepoint domain bound for the (doc, char) key


@unreserved
def char_entropy(sf_dir: str):
    """(doc_id, h) — per-document Shannon entropy (bits) of the
    CHARACTER distribution, the classic gibberish/boilerplate quality
    signal (low entropy = repeated filler, high = random noise).

    Fully vectorized, zero Python per row: the batch's texts join into
    ONE UTF-32 buffer (`np.frombuffer` → codepoint array), per-doc
    membership comes from `np.repeat` over lengths, and per-(doc, char)
    counts from a single `np.unique` on the composite key
    ``doc_idx·0x110000 + codepoint``; entropies reduce per doc with
    `np.bincount(weights=-p·log2 p)`. Pure map — no shuffle; parity
    with DuckDB's ``entropy()`` over ``string_split(text, '')`` (both
    count CODEPOINTS on this corpus; combining-character grapheme
    clusters would need a normalization pass first, documented here).
    Empty docs score 0.0 (DuckDB's split of '' yields one '' element
    whose singleton distribution has zero entropy)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.fromiter((len(t) for t in texts), np.int64, count=n)
        h = np.zeros(n, np.float64)
        nz = lens > 0
        if nz.any():
            cps = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            uk, cnt = np.unique(
                doc_idx * _CP_SPACE + cps, return_counts=True
            )
            gid = uk // _CP_SPACE
            p = cnt / lens[gid]
            h = np.bincount(
                gid, weights=-p * np.log2(p), minlength=n
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array([round4(float(x)) for x in h], pa.float64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (curation compliance stage)

# (class, RE2 pattern, replacement token) — applied IN ORDER to build the
# scrubbed text; counts are measured on the ORIGINAL text. Arrow's regex
# kernels and DuckDB's regexp functions are both RE2, so match counts and
# the sequentially-replaced output agree byte-for-byte (the SQL oracle in
# __ray_entry__ uses the same patterns in the same order).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "n_email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    ("n_ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
)


@unreserved
def pii_scrub(sf_dir: str):
    """(doc_id, n_email, n_ip, n_phone, text_scrubbed) — PII detection
    and redaction, the compliance stage every production curation
    pipeline runs before text leaves the pipeline: per-class
    non-overlapping match counts plus the text with each class replaced
    (in the fixed ``PII_PATTERNS`` order) by its placeholder token.

    Every row stays inside Arrow's RE2 kernels
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``) —
    zero Python per row, zero shuffle; the output is the scrubbed
    corpus itself, streaming block for block. Exact SQL oracle
    (DuckDB ``regexp_extract_all`` / ``regexp_replace(..., 'g')`` —
    RE2 both sides)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
        scrubbed = text
        for name, pat, token in PII_PATTERNS:
            cols[name] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            )
            scrubbed = pc.replace_substring_regex(scrubbed, pat, token)
        cols["text_scrubbed"] = scrubbed
        return pa.table(cols)

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# per-group z-score outliers (anomaly flagging)

ZSCORE_CUT = 2.5  # |z| threshold — shared with the SQL oracle
_ZQ = 10_000  # value quantization (1e-4 units) for order-independent sums


@unreserved
def value_zscore_outliers(sf_dir: str):
    """(event_id, event_type, z) — events whose value is ≥ ``ZSCORE_CUT``
    population standard deviations from their event type's mean: the
    classic per-group anomaly flag.

    Two streaming passes, ZERO shuffle: pass 1 reduces each batch to
    per-type integer moment partials (n, Σv, Σv²) over values quantized
    to 1e-4 units — integer sums are order-independent, so the merged
    moments (a |types|-row driver merge) are EXACT and the z expression
    evaluates the identical double expression tree on both sides of the
    SQL oracle; pass 2 scores vectorized against the broadcast stats.
    int64 bound: Σv² ≤ (2·10⁹)²-safe for |v| ≤ ~3·10⁵ at 10¹⁰ rows —
    past that, carry the partials as decimal128."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vq = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * _ZQ + 0.5
        ).astype(np.int64)
        uu, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        sv = np.zeros(len(uu), np.int64)
        sq = np.zeros(len(uu), np.int64)
        np.add.at(sv, inv, vq)
        np.add.at(sq, inv, vq * vq)
        return pa.table(
            {
                "event_type": pa.array(uu.tolist(), pa.string()),
                "n": pa.array(n, pa.int64()),
                "sv": pa.array(sv, pa.int64()),
                "sq": pa.array(sq, pa.int64()),
            }
        )

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(partial, batch_format="pyarrow")
    )
    stats: dict[str, tuple[float, float]] = {}
    if parts.num_rows:
        et = np.array(parts["event_type"].to_pylist())
        uu, inv = np.unique(et, return_inverse=True)
        n = np.zeros(len(uu), np.int64)
        sv = np.zeros(len(uu), np.int64)
        sq = np.zeros(len(uu), np.int64)
        np.add.at(n, inv, parts["n"].to_numpy(zero_copy_only=False))
        np.add.at(sv, inv, parts["sv"].to_numpy(zero_copy_only=False))
        np.add.at(sq, inv, parts["sq"].to_numpy(zero_copy_only=False))
        for i, t in enumerate(uu.tolist()):
            m = sv[i] / n[i]
            var = sq[i] / n[i] - m * m
            stats[t] = (m, float(np.sqrt(var)))
    stats_ref = ray.put(stats)

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vq = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * _ZQ + 0.5
        ).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uu, inv = np.unique(et, return_inverse=True)
        mean = np.array([st[t][0] for t in uu.tolist()], np.float64)[inv]
        sd = np.array([st[t][1] for t in uu.tolist()], np.float64)[inv]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vq.astype(np.float64) - mean) / sd
        keep = np.abs(z) >= ZSCORE_CUT
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "event_type": pa.array(np.asarray(et)[keep].tolist(),
                                       pa.string()),
                "z": pa.array(
                    [round4(float(x)) for x in z[keep]], pa.float64()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    ).map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PageRank over a derived directed graph (graph-analytics family)

PR_ITERS = 3  # fixed iteration count — shared with the SQL oracle
PR_SCALE = 10**12  # rank fixed-point unit (1e-12) — integer-exact parity
PR_EDGE_BUCKETS = 256


def _order_pair_edges(sf_dir: str):
    """Directed (src, dst) customer edges: src placed the order whose
    key immediately precedes one of dst's orders (self-loops dropped,
    multiplicity kept) — the deterministic sparse graph shared by the
    graph-analytics family (``pagerank``, ``triangle_count``).

    ONE ``groupby(bucket)`` shuffle: each order emits itself under its
    own orderkey and under orderkey−1, so consecutive pairs meet in a
    bucket and join by a vectorized ``searchsorted``."""

    def pair_rows(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k = np.concatenate([ok, ok - 1])
        role = np.concatenate(
            [np.zeros(len(ok), np.int8), np.ones(len(ok), np.int8)]
        )
        cust = np.concatenate([ck, ck])
        return pa.table(
            {
                "bucket": pa.array(k % PR_EDGE_BUCKETS, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "role": pa.array(role, pa.int8()),
                "cust": pa.array(cust, pa.int64()),
            }
        )

    def match_edges(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        role = group["role"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        cust = group["cust"].to_numpy(zero_copy_only=False)
        am, bm = role == 0, role == 1
        ak, ac = k[am], cust[am]  # order at key k (edge source)
        bk, bc = k[bm], cust[bm]  # order at key k+1 (edge dest)
        order = np.argsort(bk, kind="stable")
        bks, bcs = bk[order], bc[order]
        idx = np.searchsorted(bks, ak)
        idx[idx >= bks.size] = max(bks.size - 1, 0)
        hit = bks.size > 0
        hit = (bks[idx] == ak) if hit else np.zeros(len(ak), bool)
        src, dst = ac[hit], bcs[idx[hit]]
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        .map_batches(pair_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(match_edges, batch_format="pyarrow")
    )


@unreserved
def pagerank(sf_dir: str):
    """(node, rank_fp) — ``PR_ITERS`` damped PageRank iterations (d=0.85)
    over the customer graph with an edge a→b whenever customer b placed
    the order whose key immediately follows one of a's orders — a
    deterministic sparse directed multigraph derived from ``orders``.

    ALL arithmetic is int64 fixed-point (ranks in 1e-12 units, integer
    division for both the out-degree split and the 0.85/0.15 damping),
    so sums are order-independent and the result matches the SQL
    oracle's chained-CTE iterations bit for bit. Dangling nodes (no
    out-edges) simply leak their mass — the standard simplification,
    applied identically on both sides.

    Distributed shape: edge derivation is ONE ``groupby(bucket)``
    shuffle (each order emits itself under its own key and under
    key−1; consecutive pairs meet in a bucket and join by a vectorized
    ``searchsorted``). The edge set is materialized once and each
    iteration is a single streamed pass over it: per-batch ``np.add.at``
    partials of incoming contribution per dst (key-domain-bounded, not
    row-bounded), merged driver-side into the node-sized rank vector —
    the same dimension-sized driver budget as ``broadcast_join``. At
    graph scales where the node vector outgrows the driver, swap the
    broadcast rank vector for a per-iteration ``hash_join`` (this
    module) + ``groupby(dst)`` — same semantics, two shuffles per
    iteration."""
    edges = _order_pair_edges(sf_dir).materialize()  # reused PR_ITERS+1×

    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        us, cs = np.unique(s, return_counts=True)
        ud = np.unique(d)
        node = np.concatenate([us, ud])
        out = np.concatenate([cs.astype(np.int64), np.zeros(len(ud), np.int64)])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "out": pa.array(out, pa.int64()),
            }
        )

    parts = _to_table(edges.map_batches(deg_partial, batch_format="pyarrow"))
    if parts.num_rows == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank_fp": pa.array([], pa.int64())}
        )
    pn = parts["node"].to_numpy(zero_copy_only=False)
    nodes = np.unique(pn)
    outdeg = np.zeros(len(nodes), np.int64)
    np.add.at(
        outdeg,
        np.searchsorted(nodes, pn),
        parts["out"].to_numpy(zero_copy_only=False),
    )
    n = len(nodes)
    r = np.full(n, PR_SCALE // n, np.int64)
    base = ((PR_SCALE // n) * 15) // 100

    for _ in range(PR_ITERS):
        contrib = np.where(outdeg > 0, r // np.maximum(outdeg, 1), 0)
        state = ray.put((nodes, contrib))

        def agg_partial(batch: pa.Table) -> pa.Table:
            nd, cb = ray.get(state)  # local zero-copy after first get
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            c = cb[np.searchsorted(nd, s)]
            ud, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(ud), np.int64)
            np.add.at(acc, inv, c)
            return pa.table(
                {
                    "node": pa.array(ud, pa.int64()),
                    "c": pa.array(acc, pa.int64()),
                }
            )

        pt = _to_table(edges.map_batches(agg_partial, batch_format="pyarrow"))
        agg = np.zeros(n, np.int64)
        if pt.num_rows:
            np.add.at(
                agg,
                np.searchsorted(
                    nodes, pt["node"].to_numpy(zero_copy_only=False)
                ),
                pt["c"].to_numpy(zero_copy_only=False),
            )
        r = base + (agg * 85) // 100

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank_fp": pa.array(r, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# argmin-per-group: first event per (user, event_type)


@unreserved
def first_event_per_user_type(sf_dir: str):
    """(user_id, event_type, event_id, ts) — each user's FIRST event of
    each type (earliest ts, tie-break event_id asc): the first-touch
    attribution / argmin-per-group shape.

    Distributed shape: per-batch partial lexmin (every input batch keeps
    one row per (user,type) pair it saw — the shuffle payload is
    key-domain-bounded, not row-bounded), then a composite-key
    ``groupby(["user_id","event_type"])`` whose groups are the tiny
    partial slivers. No sort of the fact table, no window function."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, et, uid))
        us, es = uid[order], et[order]
        first = (
            np.r_[True, (us[1:] != us[:-1]) | (es[1:] != es[:-1])]
            if len(order)
            else np.empty(0, bool)
        )
        return batch.select(["user_id", "event_type", "event_id", "ts"]).take(
            pa.array(order[first], pa.int64())
        )

    def final(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((eid, ts))[0])
        return group.take(pa.array([i], pa.int64()))

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-user moving average (ordered window over the last W events)

MAVG_W = 5  # window width in rows — shared with the SQL oracle


@unreserved
def user_moving_avg(sf_dir: str):
    """(event_id, user_id, win_sum_milli, win_n, mavg) — per-user moving
    average of ``value`` over each event and its ``MAVG_W−1``
    predecessors in (ts, event_id) order: the classic
    ``ROWS BETWEEN 4 PRECEDING AND CURRENT ROW`` window.

    Values are quantized to exact integer milli-units before the window
    sum (order-independent), and the final ``mavg`` double is the
    identical expression tree on both sides of the oracle. Distributed
    shape: one ``groupby(user_id)`` shuffle; per-group the window is a
    vectorized cumsum difference, never a Python loop. Per-user groups
    are naturally bounded here; a hot-key-safe variant would range-
    partition time and merge the ≤ W−1 boundary rows, exactly as
    ``running_totals(mode="by_time")`` does."""

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vm = np.floor(
            group["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        order = np.lexsort((eid, ts))
        vms = vm[order]
        c = np.cumsum(vms)
        sw = c.copy()
        sw[MAVG_W:] = c[MAVG_W:] - c[:-MAVG_W]
        cnt = np.minimum(np.arange(1, len(vms) + 1), MAVG_W).astype(np.int64)
        mavg = np.array(
            [round4(x) for x in (sw.astype(np.float64) / cnt) / 1000.0],
            np.float64,
        )
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(uid[order], pa.int64()),
                "win_sum_milli": pa.array(sw, pa.int64()),
                "win_n": pa.array(cnt, pa.int64()),
                "mavg": pa.array(mavg, pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "value"],
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# triangle counting (graph analytics)

TRI_BUCKETS = 256


@unreserved
def triangle_count(sf_dir: str, with_wedges: bool = False):
    """Single-row (n_triangles) — triangle count of the UNDIRECTED
    customer graph (``_order_pair_edges`` canonicalized to u<v, distinct)
    via the DEGREE-ORDERED MapReduce wedge-check (Cohen 2009 / the
    node-iterator++ refinement): orient every edge from its lower-rank
    endpoint to its higher-rank endpoint under the total rank
    (degree, node-id), generate wedges only over OUT-neighbors, then
    verify which wedges close against the edge set — never a broadcast
    of the edge list and never a driver adjacency.

    Degree ordering is what makes this hot-hub safe: a celebrity node of
    degree d has rank above almost all its neighbors, so nearly all its
    edges point INTO it and it emits ~no wedges; total wedge count drops
    from Σ d(d−1)/2 to O(m^1.5) regardless of skew. Each triangle
    {a,b,c} with rank a<b<c is generated exactly once — as the wedge at
    a over out-neighbors (b, c).

    Shuffles (all edge-bounded; degrees ride along with the adjacency
    rows, so NO separate degree table is joined or broadcast). Every
    per-node stage is HASH-BUCKETED on its key node (``% TRI_BUCKETS``)
    so the UDF runs once per bucket over a sorted multi-key slab —
    degrees fall out of run lengths and wedges out of segmented pair
    generation, with zero per-node Python-call or per-node-table cost:
    1. ``groupby(bucket)`` dedups canonical edges inside hash buckets;
    2. ``groupby(cb)`` over both-direction adjacency rows: each node's
       run length IS deg(c); re-emit each edge keyed by the OTHER
       endpoint with deg(c) attached;
    3. ``groupby(cb)``: run length is deg(n); each edge appears here
       twice (once per endpoint), and is emitted exactly once, oriented
       low-rank → high-rank, by keeping only the appearance at its
       higher-rank endpoint;
    4. ``groupby(lob)`` gathers out-neighbor runs and emits the wedges
       (canonicalized v1<v2 pairs, segmented-vectorized);
    5. wedges ∪ edges ``groupby(bucket)``: inside a bucket the wedge
       (v1,v2) keys probe the sorted edge keys (``searchsorted`` on a
       packed composite), matched wedge counts sum to triangle partials,
       and the driver adds up one int per bucket.
    """

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table(
            {
                "bucket": pa.array(
                    (key[:, 0] * 1000003 + key[:, 1]) % TRI_BUCKETS,
                    pa.int64(),
                ),
                "u": pa.array(key[:, 0], pa.int64()),
                "v": pa.array(key[:, 1], pa.int64()),
            }
        )

    def dedup_bucket(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table(
            {
                "u": pa.array(key[:, 0], pa.int64()),
                "v": pa.array(key[:, 1], pa.int64()),
            }
        )

    edges = (
        _order_pair_edges(sf_dir)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
        .materialize()  # consumed twice: wedge generation + edge probe
    )

    def adj_rows(batch: pa.Table) -> pa.Table:
        # every canonical edge (u,v) puts v in u's neighbor list AND u
        # in v's (undirected adjacency); rows are hash-BUCKETED by the
        # key node so each downstream stage is ONE vectorized UDF call
        # per bucket (not one per node) while still seeing every row of
        # each key it owns
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        c = np.concatenate([u, v])
        return pa.table(
            {
                "cb": pa.array(c % TRI_BUCKETS, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "n": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    def attach_deg(group: pa.Table) -> pa.Table:
        # one bucket of nodes: sort rows by c, run lengths ARE the
        # degrees (edges are distinct); re-key every edge by the OTHER
        # endpoint, carrying deg(c)
        group = group.combine_chunks()
        c = group["c"].to_numpy(zero_copy_only=False)
        nb = group["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, nb = c[order], nb[order]
        _, counts = np.unique(c, return_counts=True)
        deg = np.repeat(counts.astype(np.int64), counts)
        return pa.table(
            {
                "cb": pa.array(nb % TRI_BUCKETS, pa.int64()),
                "c": pa.array(nb, pa.int64()),
                "n": pa.array(c, pa.int64()),
                "nd": pa.array(deg, pa.int64()),
            }
        )

    def orient(group: pa.Table) -> pa.Table:
        # one bucket of nodes n (run length = deg(n)); each row is an
        # incident edge (other endpoint `o`, deg(o)). Emit the edge
        # oriented low-rank → high-rank, only at its HIGHER-rank
        # endpoint, so each undirected edge is emitted exactly once.
        group = group.combine_chunks()
        nnode = group["c"].to_numpy(zero_copy_only=False)
        o = group["n"].to_numpy(zero_copy_only=False)
        od = group["nd"].to_numpy(zero_copy_only=False)
        order = np.argsort(nnode, kind="stable")
        nnode, o, od = nnode[order], o[order], od[order]
        _, counts = np.unique(nnode, return_counts=True)
        nd = np.repeat(counts.astype(np.int64), counts)
        lower = (od < nd) | ((od == nd) & (o < nnode))
        lo, hi = o[lower], nnode[lower]
        return pa.table(
            {
                "lob": pa.array(lo % TRI_BUCKETS, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
            }
        )

    def wedges(group: pa.Table) -> pa.Table:
        # one bucket of low-rank nodes: wedges are all out-neighbor
        # pairs within each lo-run. Sorting by (lo, hi) makes every
        # run's neighbors sorted+distinct (orient emits each edge once),
        # so pairing each row with all EARLIER rows of its run yields
        # canonical v1<v2 pairs — fully segmented-vectorized, no
        # per-node Python. A hot hub has ~no out-edges under the
        # (degree, id) rank, so it contributes ~no pairs.
        group = group.combine_chunks()
        lo = group["lo"].to_numpy(zero_copy_only=False)
        hi = group["hi"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        _, starts, counts = np.unique(lo, return_index=True, return_counts=True)
        # local index of each row inside its run = #earlier rows it pairs with
        jloc = np.arange(lo.size) - np.repeat(starts, counts)
        total = int(jloc.sum())
        if total == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                }
            )
        w2 = np.repeat(hi, jloc)  # the later (larger) element of each pair
        off = np.concatenate(([0], np.cumsum(jloc)[:-1]))
        run_start = np.repeat(starts, counts)
        idx = np.arange(total) - np.repeat(off, jloc) + np.repeat(run_start, jloc)
        w1 = hi[idx]  # the earlier (smaller) element
        return pa.table(
            {
                "bucket": pa.array(
                    (w1 * 1000003 + w2) % TRI_BUCKETS, pa.int64()
                ),
                "u": pa.array(w1, pa.int64()),
                "v": pa.array(w2, pa.int64()),
                "cnt": pa.array(np.ones(len(w1), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(w1), np.int8), pa.int8()),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (u * 1000003 + v) % TRI_BUCKETS, pa.int64()
                ),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "cnt": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(u), np.int8), pa.int8()),
            }
        )

    def close_wedges(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = group["side"].to_numpy(zero_copy_only=False)
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        # composite (u,v) packed for one searchsorted; u,v < 2^31 here —
        # past that, probe a lexsorted 2-column view instead
        key = u * (1 << 31) + v
        em = side == 1
        ek = np.sort(key[em])
        wk, wc = key[~em], cnt[~em]
        if ek.size == 0 or wk.size == 0:
            n = 0
        else:
            idx = np.searchsorted(ek, wk)
            idx[idx >= ek.size] = ek.size - 1
            n = int(wc[ek[idx] == wk].sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    wedge_ds = (
        edges.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(attach_deg, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(orient, batch_format="pyarrow")
        .groupby("lob")
        .map_groups(wedges, batch_format="pyarrow")
    )
    n_wedges = None
    if with_wedges:  # test/debug: observe the degree-ordering bound
        wedge_ds = wedge_ds.materialize()
        n_wedges = wedge_ds.count()
    edge_keyed = edges.map_batches(edge_rows, batch_format="pyarrow")
    parts = _to_table(
        wedge_ds.union(edge_keyed)
        .groupby("bucket")
        .map_groups(close_wedges, batch_format="pyarrow")
    )
    total = (
        int(parts["n"].to_numpy(zero_copy_only=False).sum())
        if parts.num_rows
        else 0
    )
    out = {"n_triangles": pa.array([total], pa.int64())}
    if n_wedges is not None:
        out["n_wedges"] = pa.array([int(n_wedges)], pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# cohort retention (events family)

WEEK_US = 7 * 86_400_000_000


@unreserved
def cohort_retention(sf_dir: str):
    """(cohort_week, event_week, n_users) — the classic retention
    matrix: users bucketed by the week of their FIRST event, counted
    distinct in every week they were active.

    Pass 1 computes each user's cohort week as per-batch partial mins
    (key-domain-bounded) merged driver-side and broadcast via
    ``ray.put`` — the dimension-sized small side. Pass 2 reduces each
    batch to its distinct (user, week) pairs (payload bounded by
    users×weeks, not rows) and a ``groupby([cohort, week])`` counts
    distinct users per cell over those slivers."""

    def min_week_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // WEEK_US
        )
        uu, inv = np.unique(uid, return_inverse=True)
        mn = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, w)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "w": pa.array(mn, pa.int64()),
            }
        )

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        ).map_batches(min_week_partial, batch_format="pyarrow")
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "event_week": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
    pu = parts["user_id"].to_numpy(zero_copy_only=False)
    users = np.unique(pu)
    cohort = np.full(len(users), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(
        cohort,
        np.searchsorted(users, pu),
        parts["w"].to_numpy(zero_copy_only=False),
    )
    state = ray.put((users, cohort))

    def pair_partial(batch: pa.Table) -> pa.Table:
        us, co = ray.get(state)  # local zero-copy after first get
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // WEEK_US
        )
        key = np.unique(np.stack([uid, w], axis=1), axis=0)
        return pa.table(
            {
                "cohort_week": pa.array(
                    co[np.searchsorted(us, key[:, 0])], pa.int64()
                ),
                "event_week": pa.array(key[:, 1], pa.int64()),
                "user_id": pa.array(key[:, 0], pa.int64()),
            }
        )

    def cell(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        n = len(np.unique(group["user_id"].to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "cohort_week": group["cohort_week"].slice(0, 1),
                "event_week": group["event_week"].slice(0, 1),
                "n_users": pa.array([n], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["cohort_week", "event_week"])
        .map_groups(cell, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# funnel analysis (events family)

FUNNEL_STEPS = ("view", "click", "purchase")  # shared with the SQL oracle


@unreserved
def funnel_counts(sf_dir: str):
    """(step, event_type, n_users) — ordered-funnel completion counts:
    a user completes step k when an event of ``FUNNEL_STEPS[k]`` exists
    STRICTLY after their step-(k−1) completion time (min-ts chaining,
    the standard sequential-funnel semantics; ties at the exact same
    microsecond do not advance the funnel on either side of the oracle).

    One ``groupby(user_id)`` shuffle; each group resolves the whole
    chain vectorized (one mask + min per step), emits ≤ |steps| rows,
    and the step totals are per-batch partial sums merged driver-side
    (|steps| ints)."""

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        et = group["event_type"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        done = np.zeros(len(FUNNEL_STEPS), np.int64)
        prev = -1
        for i, step in enumerate(FUNNEL_STEPS):
            cand = ts[(et == step) & (ts > prev)]
            if cand.size == 0:
                break
            done[i] = 1
            prev = int(cand.min())
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(FUNNEL_STEPS) + 1), pa.int64()
                ),
                "n": pa.array(done, pa.int64()),
            }
        )

    def sum_partial(batch: pa.Table) -> pa.Table:
        st = batch["step"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        acc = np.zeros(len(FUNNEL_STEPS), np.int64)
        np.add.at(acc, st - 1, n)
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(FUNNEL_STEPS) + 1), pa.int64()
                ),
                "n": pa.array(acc, pa.int64()),
            }
        )

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts"],
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .map_batches(sum_partial, batch_format="pyarrow")
    )
    total = np.zeros(len(FUNNEL_STEPS), np.int64)
    if parts.num_rows:
        np.add.at(
            total,
            parts["step"].to_numpy(zero_copy_only=False) - 1,
            parts["n"].to_numpy(zero_copy_only=False),
        )
    return pa.table(
        {
            "step": pa.array(np.arange(1, len(FUNNEL_STEPS) + 1), pa.int64()),
            "event_type": pa.array(list(FUNNEL_STEPS), pa.string()),
            "n_users": pa.array(total, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# distributed global rank (two-pass, no global sort materialization)


@unreserved
def doc_rank_by_length(sf_dir: str):
    """(doc_id, n_chars, rnk) — the global ``row_number() over (order by
    n_chars, doc_id)`` WITHOUT materializing a global sort: the classic
    two-pass distributed ranking.

    Pass 1 reduces each batch to its n_chars histogram (key-domain-
    bounded); the driver prefix-sums the merged histogram into exclusive
    offsets (one int per DISTINCT length) and broadcasts them. Pass 2 is
    one ``groupby(n_chars)`` shuffle; each length group sorts its own
    doc_ids and adds the broadcast offset. No task ever holds more than
    one length group; ranks are globally exact."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "c": pa.array(uu, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = _to_table(
        read_documents(sf_dir, ["n_chars"]).map_batches(
            hist_partial, batch_format="pyarrow"
        )
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    pc_ = parts["c"].to_numpy(zero_copy_only=False)
    lengths = np.unique(pc_)
    counts = np.zeros(len(lengths), np.int64)
    np.add.at(
        counts,
        np.searchsorted(lengths, pc_),
        parts["n"].to_numpy(zero_copy_only=False),
    )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    state = ray.put((lengths, offsets))

    def rank_group(group: pa.Table) -> pa.Table:
        ln, off = ray.get(state)  # local zero-copy after first get
        group = group.combine_chunks()
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = int(group["n_chars"][0].as_py())
        order = np.argsort(did, kind="stable")
        rnk = off[np.searchsorted(ln, c)] + np.arange(1, len(did) + 1)
        return pa.table(
            {
                "doc_id": pa.array(did[order], pa.int64()),
                "n_chars": pa.array(np.full(len(did), c, np.int64), pa.int64()),
                "rnk": pa.array(rnk.astype(np.int64), pa.int64()),
            }
        )

    return (
        read_documents(sf_dir, ["doc_id", "n_chars"])
        .groupby("n_chars")
        .map_groups(rank_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-group winsorization (outlier clipping at exact quantiles)

WINSOR_LO, WINSOR_HI = 0.01, 0.99


@unreserved
def winsorize_values(sf_dir: str):
    """(event_id, event_type, value_w) — values clipped to each event
    type's exact [p1, p99] — the standard outlier-robust curation step.

    Pass 1 reuses the exact per-group quantile shape (one groupby over
    the LOW-cardinality type domain, in-task sort); thresholds are
    rounded to the shared 4-decimal grid on BOTH sides of the oracle
    (``group_quantiles`` proves the np.quantile == quantile_cont parity)
    and broadcast; pass 2 clips vectorized — no second shuffle."""

    def qrow(group: pa.Table) -> pa.Table:
        v = np.sort(group["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "lo": pa.array(
                    [round4(float(np.quantile(v, WINSOR_LO)))], pa.float64()
                ),
                "hi": pa.array(
                    [round4(float(np.quantile(v, WINSOR_HI)))], pa.float64()
                ),
            }
        )

    th = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .groupby("event_type")
        .map_groups(qrow, batch_format="pyarrow")
    )
    thresholds = (
        {
            t: (lo, hi)
            for t, lo, hi in zip(
                th["event_type"].to_pylist(),
                th["lo"].to_pylist(),
                th["hi"].to_pylist(),
            )
        }
        if th.num_columns and th.num_rows
        else {}
    )
    state = ray.put(thresholds)

    def clip(batch: pa.Table) -> pa.Table:
        tm = ray.get(state)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(et, return_inverse=True)
        lo = np.array([tm[t][0] for t in uu.tolist()], np.float64)[inv]
        hi = np.array([tm[t][1] for t in uu.tolist()], np.float64)[inv]
        w = np.minimum(np.maximum(v, lo), hi)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "value_w": pa.array(
                    [round4(float(x)) for x in w], pa.float64()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    ).map_batches(clip, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text normalization (NFC + whitespace collapse)


@unreserved
def normalize_text(sf_dir: str):
    """(doc_id, text_norm) — NFC unicode normalization, ASCII-whitespace
    runs collapsed to single spaces, outer spaces trimmed: the canonical
    pre-dedup/pre-tokenize normalization pass.

    Whitespace work is Arrow kernels (replace_substring_regex /
    utf8_trim — RE2 ``\\s`` is ASCII-only in BOTH Arrow and DuckDB, so
    the oracle is exact); NFC composition falls back to
    ``unicodedata.normalize`` ONLY for rows ``string_is_ascii`` rules
    out (this pyarrow's ``utf8_normalize(form="NFC")`` reorders but
    does not compose — verified: e+U+0301 stays decomposed), so the
    per-row cost is bounded by the non-ASCII fraction. Zero shuffle."""
    import unicodedata

    import pyarrow.compute as pac

    def f(batch: pa.Table) -> pa.Table:
        t = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        ascii_mask = pac.string_is_ascii(t).to_numpy(zero_copy_only=False)
        if not ascii_mask.all():
            vals = t.to_pylist()
            t = pa.array(
                [
                    v if a else unicodedata.normalize("NFC", v)
                    for v, a in zip(vals, ascii_mask)
                ],
                pa.string(),
            )
        t = pac.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pac.utf8_trim(t, characters=" ")
        return pa.table({"doc_id": batch["doc_id"], "text_norm": t})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# data-quality audit (ingest gate)

AUDIT_BUCKETS = 256


@unreserved
def data_audit(sf_dir: str):
    """Single-row (n_rows, n_null_text, n_empty_text, n_distinct_doc_id,
    n_dup_doc_id, min_doc_id, max_doc_id) — the ingest-gate audit every
    training-data pipeline runs before anything else: row count, null /
    empty payloads, key uniqueness, key range.

    Counts and min/max reduce as one streamed pass of constant-size
    per-batch partials (driver merges a handful of ints per block). The
    EXACT distinct-key count is the only part that must co-locate keys:
    per-batch unique partials → one hash-bucket ``groupby`` whose groups
    count their own uniques — shuffle payload is bounded by distinct
    keys per batch, never rows, and no single task ever sees more than
    one bucket's key range."""

    def stat_partial(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch["text"]
        nulls = int(t.null_count)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        empt = int(
            pa.compute.sum(
                pa.compute.equal(t, pa.scalar(""))
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "n": pa.array([len(did)], pa.int64()),
                "nulls": pa.array([nulls], pa.int64()),
                "empties": pa.array([empt], pa.int64()),
                "mn": pa.array(
                    [int(did.min()) if len(did) else 2**62], pa.int64()
                ),
                "mx": pa.array(
                    [int(did.max()) if len(did) else -(2**62)], pa.int64()
                ),
            }
        )

    def key_partial(batch: pa.Table) -> pa.Table:
        ks = np.unique(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "bucket": pa.array(ks % AUDIT_BUCKETS, pa.int64()),
                "k": pa.array(ks, pa.int64()),
            }
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        n = len(np.unique(group["k"].to_numpy(zero_copy_only=False)))
        return pa.table({"nd": pa.array([n], pa.int64())})

    docs = read_documents(sf_dir, ["doc_id", "text"])
    stats = _to_table(docs.map_batches(stat_partial, batch_format="pyarrow"))
    nd_parts = _to_table(
        docs.map_batches(key_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )
    n_rows = int(stats["n"].to_numpy(zero_copy_only=False).sum()) if \
        stats.num_rows else 0
    nulls = int(stats["nulls"].to_numpy(zero_copy_only=False).sum()) if \
        stats.num_rows else 0
    empties = int(stats["empties"].to_numpy(zero_copy_only=False).sum()) \
        if stats.num_rows else 0
    nd = int(nd_parts["nd"].to_numpy(zero_copy_only=False).sum()) if \
        nd_parts.num_rows else 0
    mn = int(stats["mn"].to_numpy(zero_copy_only=False).min()) if n_rows \
        else 0
    mx = int(stats["mx"].to_numpy(zero_copy_only=False).max()) if n_rows \
        else 0
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_null_text": pa.array([nulls], pa.int64()),
            "n_empty_text": pa.array([empties], pa.int64()),
            "n_distinct_doc_id": pa.array([nd], pa.int64()),
            "n_dup_doc_id": pa.array([n_rows - nd], pa.int64()),
            "min_doc_id": pa.array([mn], pa.int64()),
            "max_doc_id": pa.array([mx], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# per-group Pearson correlation (trend detection)

CORR_EPOCH0_US = 1_577_836_800_000_000  # 2020-01-01 — keeps hour ints small
_CORR_HOUR_US = 3_600_000_000


@unreserved
def value_time_corr(sf_dir: str):
    """(event_type, corr) — Pearson correlation between ``value`` and
    the event's hour index, per event type: the drift/trend detector
    (is this metric rising over time?).

    ZERO shuffle: per-batch int64 moment partials (n, Σx, Σy, Σxy, Σx²,
    Σy² over values quantized to 1e-4 units and hours since 2020) are
    order-independent, merge exactly on the driver (type-domain-sized),
    and the corr double evaluates the IDENTICAL expression tree as the
    SQL oracle — DuckDB's own ``corr()`` accumulates doubles and is not
    parity-safe, which is exactly why the moments stay integer. Zero-
    variance groups are excluded on both sides. int64 bound: Σxy safe
    to ~10⁹ rows per type at these magnitudes; past that, carry the
    partials as decimal128 (same note as ``value_zscore_outliers``)."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        x = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        y = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            - CORR_EPOCH0_US
        ) // _CORR_HOUR_US
        uu, inv = np.unique(et, return_inverse=True)
        cols = {"event_type": pa.array(uu.tolist(), pa.string())}
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        cols["n"] = pa.array(n, pa.int64())
        for name, v in (
            ("sx", x), ("sy", y), ("sxy", x * y),
            ("sxx", x * x), ("syy", y * y),
        ):
            acc = np.zeros(len(uu), np.int64)
            np.add.at(acc, inv, v)
            cols[name] = pa.array(acc, pa.int64())
        return pa.table(cols)

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pyarrow")
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "corr": pa.array([], pa.float64()),
            }
        )
    et = np.array(parts["event_type"].to_pylist())
    uu, inv = np.unique(et, return_inverse=True)
    m = {}
    for name in ("n", "sx", "sy", "sxy", "sxx", "syy"):
        acc = np.zeros(len(uu), np.int64)
        np.add.at(acc, inv, parts[name].to_numpy(zero_copy_only=False))
        m[name] = acc.astype(np.float64)
    num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    fx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    fy = m["n"] * m["syy"] - m["sy"] * m["sy"]
    keep = (fx > 0) & (fy > 0)
    with np.errstate(invalid="ignore"):
        corr = num[keep] / np.sqrt(fx[keep] * fy[keep])
    return pa.table(
        {
            "event_type": pa.array(uu[keep].tolist(), pa.string()),
            "corr": pa.array(
                [round4(float(c)) for c in corr], pa.float64()
            ),
        }
    )


def doc_weights_by_lang(sf_dir: str, lang: str = "en", w: float = 1.25):
    """(sorted doc ids, weights) — static per-document score boosts from
    metadata (``w`` for ``lang`` docs, 1.0 otherwise): the broadcastable
    small side of document-boosted ranking. Pruned two-column read, same
    budget as ``doc_ids_where``."""
    t = _to_table(read_documents(sf_dir, ["doc_id", "lang"]))
    if t.num_columns == 0 or t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    lg = t["lang"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    weights = np.where(lg[order] == lang, w, 1.0)
    return ids, weights


@unreserved
def media_similarity_topk(sf_dir: str, n: int = 200, k: int = 10):
    """(media_id, kind, cos) — multimodal retrieval end to end: REAL
    decode (BMP/PPM/WAV/Y4M codecs) → real features (luma histogram /
    rFFT bands) → brute-force cosine top-k against media_id 0's feature
    (the query row excluded). Same per-batch partial-top-k shape as
    ``embedding_topk``: the query vector broadcasts via ``ray.put``,
    every batch emits ≤ k candidates, the driver merges k·blocks rows.
    Rows-only driver check (features aren't SQL-expressible)."""
    from ..stages.multimodal import MediaDecode, real_decode, \
        synthesize_media_table

    tbl = synthesize_media_table(n, seed=7)
    q = np.array(
        real_decode(tbl["payload"][0].as_py())["feature"], np.float64
    )
    qn = float(np.linalg.norm(q)) or 1.0
    qref = ray.put(q / qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        keep = ids != 0
        if not keep.any():
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        feats = np.array(
            batch["feature"].to_pylist(), np.float64
        )[keep]
        norms = np.linalg.norm(feats, axis=1)
        norms[norms == 0] = 1.0
        cos = (feats / norms[:, None]) @ qv
        order = np.lexsort((ids[keep], -cos))[:k]
        sel = np.flatnonzero(keep)[order]
        return pa.table(
            {
                "media_id": batch["media_id"].take(pa.array(sel, pa.int64())),
                "kind": batch["kind"].take(pa.array(sel, pa.int64())),
                "cos": pa.array(
                    [round4(float(c)) for c in cos[order]], pa.float64()
                ),
            }
        )

    parts = _to_table(
        ray.data.from_arrow(tbl)
        .map_batches(
            MediaDecode, batch_size=32, batch_format="pyarrow", concurrency=2
        )
        .map_batches(score, batch_format="pyarrow")
    )
    if parts.num_rows == 0:
        return parts
    cos = parts["cos"].to_numpy(zero_copy_only=False)
    ids = parts["media_id"].to_numpy(zero_copy_only=False)
    top = np.lexsort((ids, -cos))[:k]
    return parts.take(pa.array(top.astype(np.int64), pa.int64()))


NTILE_K = 10


@unreserved
def doc_ntile_by_length(sf_dir: str, k: int = NTILE_K):
    """(doc_id, n_chars, tile) — exact SQL ``NTILE(k)`` over the global
    (n_chars, doc_id) order: the first ``n % k`` tiles hold ``n//k + 1``
    rows, the rest ``n//k`` (DuckDB's bucket-size rule). Same two-pass
    distributed shape as ``doc_rank_by_length`` — the closed-form
    rank→tile map runs inside the rank stage against the broadcast
    total, so the full table never lands on the driver."""
    ranked = doc_rank_by_length(sf_dir)
    # n is a by-product of pass 1; recomputing it here is one tiny
    # metadata read, not a data pass
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
        )
    q, rem = divmod(n, k)
    big = rem * (q + 1)

    def add_tile(batch: pa.Table) -> pa.Table:
        r0 = batch["rnk"].to_numpy(zero_copy_only=False) - 1  # 0-based
        if q == 0:
            tile = r0 + 1  # n < k: one row per tile
        else:
            tile = np.where(
                r0 < big, r0 // (q + 1) + 1, rem + (r0 - big) // q + 1
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(add_tile, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# aggregate-of-aggregate: orders-per-customer histogram


@unreserved
def orders_per_customer_histogram(sf_dir: str):
    """(n_orders, n_customers) — how many customers placed exactly k
    orders: the classic activity-distribution report, an aggregate OF an
    aggregate. Stage 1 pre-combines per-batch (custkey, count) partials
    and sums them in one key-domain-bounded groupby; stage 2's input is
    already histogram-sized, so its partials reduce driver-side."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uu, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c": pa.array(uu, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        # no coalescing repartition: the partials are already one
        # key-bounded row-set per input block, and the extra all-to-all
        # barrier measured SLOWER than the groupby it fed (2.7→1.9 s
        # warm at sf0.1)
        .groupby("c")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(uu, pa.int64()),
                "n_customers": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = _to_table(
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
    )
    if parts.num_columns == 0 or parts.num_rows == 0:
        return pa.table(
            {
                "n_orders": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    k = parts["n_orders"].to_numpy(zero_copy_only=False)
    uu = np.unique(k)
    acc = np.zeros(len(uu), np.int64)
    np.add.at(
        acc,
        np.searchsorted(uu, k),
        parts["n_customers"].to_numpy(zero_copy_only=False),
    )
    return pa.table(
        {
            "n_orders": pa.array(uu, pa.int64()),
            "n_customers": pa.array(acc, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# lead window: gap to each user's NEXT event


@unreserved
def lead_event_gap(sf_dir: str):
    """(event_id, user_id, gap_us) — microseconds until the same user's
    NEXT event in (ts, event_id) order; each user's last event is
    omitted (no lead) — the forward sibling of ``event_value_delta``'s
    lag. One ``groupby(user_id)`` shuffle, vectorized lexsort + diff."""

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((eid, ts))
        tss = ts[order]
        gap = tss[1:] - tss[:-1]
        sel = order[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid[sel], pa.int64()),
                "user_id": pa.array(uid[sel], pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# calendar heatmap: events by (day-of-week, hour)

_DAY_US = 86_400_000_000


@unreserved
def dow_hour_heatmap(sf_dir: str):
    """(dow, hour, n_events) — the activity heatmap. Day-of-week is
    integer epoch arithmetic ((days since 1970-01-01 + 4) % 7, Sunday=0
    — 1970-01-01 was a Thursday), written EXPLICITLY on both oracle
    sides rather than relying on dialect-specific dayofweek(). Zero
    shuffle: per-batch 7×24 count partials merge driver-side."""

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // _DAY_US) + 4) % 7
        hour = (us % _DAY_US) // 3_600_000_000
        key = dow * 24 + hour
        acc = np.bincount(key, minlength=7 * 24).astype(np.int64)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "k": pa.array(nz, pa.int64()),
                "n": pa.array(acc[nz], pa.int64()),
            }
        )

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts"]
        ).map_batches(partial, batch_format="pyarrow")
    )
    acc = np.zeros(7 * 24, np.int64)
    if parts.num_columns and parts.num_rows:
        np.add.at(
            acc,
            parts["k"].to_numpy(zero_copy_only=False),
            parts["n"].to_numpy(zero_copy_only=False),
        )
    nz = np.flatnonzero(acc)
    return pa.table(
        {
            "dow": pa.array(nz // 24, pa.int64()),
            "hour": pa.array(nz % 24, pa.int64()),
            "n_events": pa.array(acc[nz], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# event-type transition matrix (sequence analytics)


@unreserved
def event_transition_matrix(sf_dir: str):
    """(from_type, to_type, n) — counts of consecutive event-type
    transitions within each user's (ts, event_id)-ordered stream: the
    Markov-chain view of user behavior (what follows what).

    One ``groupby(user_id)`` shuffle; each group reduces to its local
    |types|² pair counts (vectorized shift + composite-key unique), so
    the post-shuffle payload is type-matrix-bounded per user and the
    final merge is a driver-side |types|²-int reduce."""

    def per_user(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = group["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        seq = et[order]
        if len(seq) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pair = np.char.add(
            np.char.add(seq[:-1].astype(str), "\x01"),
            seq[1:].astype(str),
        )
        uu, cnt = np.unique(pair, return_counts=True)
        parts = np.char.partition(uu, "\x01")
        return pa.table(
            {
                "from_type": pa.array(parts[:, 0], pa.string()),
                "to_type": pa.array(parts[:, 2], pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = _to_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )
    if parts.num_columns == 0 or parts.num_rows == 0:
        return pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    key = np.char.add(
        np.char.add(
            np.asarray(parts["from_type"].to_pylist(), object).astype(str),
            "\x01",
        ),
        np.asarray(parts["to_type"].to_pylist(), object).astype(str),
    )
    uu, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uu), np.int64)
    np.add.at(acc, inv, parts["n"].to_numpy(zero_copy_only=False))
    sp = np.char.partition(uu, "\x01")
    return pa.table(
        {
            "from_type": pa.array(sp[:, 0], pa.string()),
            "to_type": pa.array(sp[:, 2], pa.string()),
            "n": pa.array(acc, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# forward as-of join (direction='forward'): first shipment per order


_ASOF_FWD_EMPTY = pa.table(
    {
        "o_orderkey": pa.array([], pa.int64()),
        "l_linenumber": pa.array([], pa.int64()),
        "ship_us": pa.array([], pa.int64()),
        "price_cents": pa.array([], pa.int64()),
    }
)


def _asof_eval_forward(group: pa.Table) -> pa.Table:
    """Vectorized MULTI-KEY forward as-of over one hash bucket — the
    mirror of ``_asof_eval_backward``: probes sort BEFORE builds at
    equal t (inclusive ≥), builds among equal (key, ship) sort by
    (linenumber, price) so each probe's match — the nearest FOLLOWING
    build index via one reversed ``np.minimum.accumulate`` — is the
    documented total-order lexmin. Zero per-key Python."""
    import pyarrow.compute as pc

    group = group.combine_chunks()
    has_rng = "rng" in group.schema.names
    is_probe = pc.is_valid(group["ts_us"])
    g_p = group.filter(is_probe)
    g_b = group.filter(pc.invert(is_probe))
    n_p, n_b = g_p.num_rows, g_b.num_rows
    if n_p == 0 or n_b == 0:
        return _ASOF_FWD_EMPTY

    def col(t: pa.Table, name: str, dt) -> np.ndarray:
        return t[name].to_numpy(zero_copy_only=False).astype(dt)

    key = np.concatenate([col(g_p, "key", np.int64), col(g_b, "key", np.int64)])
    t = np.concatenate([col(g_p, "ts_us", np.int64), col(g_b, "ship_us", np.int64)])
    ln = np.concatenate([np.zeros(n_p, np.int64), col(g_b, "ln", np.int64)])
    price = np.concatenate([np.zeros(n_p, np.int64), col(g_b, "price_c", np.int64)])
    rng = (
        np.concatenate([col(g_p, "rng", np.int64), col(g_b, "rng", np.int64)])
        if has_rng
        else np.zeros(n_p + n_b, np.int64)
    )
    flag = np.concatenate([np.zeros(n_p, np.int8), np.ones(n_b, np.int8)])
    order = np.lexsort((price, ln, flag, t, rng, key))
    key_s, rng_s, flag_s = key[order], rng[order], flag[order]
    n = len(order)
    idx = np.arange(n)
    nxt = np.where(flag_s == 1, idx, n)
    nxt = np.minimum.accumulate(nxt[::-1])[::-1]
    ppos = np.flatnonzero(flag_s == 0)
    j = nxt[ppos]
    ok = j < n
    jj = np.minimum(j, n - 1)
    ok &= (key_s[jj] == key_s[ppos]) & (rng_s[jj] == rng_s[ppos])
    if not ok.any():
        return _ASOF_FWD_EMPTY
    ppos, jj = ppos[ok], jj[ok]
    t_s, ln_s, price_s = t[order], ln[order], price[order]
    return pa.table(
        {
            "o_orderkey": pa.array(key_s[ppos], pa.int64()),
            "l_linenumber": pa.array(ln_s[jj], pa.int64()),
            "ship_us": pa.array(t_s[jj], pa.int64()),
            "price_cents": pa.array(price_s[jj], pa.int64()),
        }
    )


@unreserved
def asof_join_forward(
    sf_dir: str, mode: str = "by_key", time_ranges: int = 16
):
    """(o_orderkey, l_linenumber, ship_us, price_cents) — FORWARD as-of
    join (pandas ``merge_asof(direction='forward')`` semantics): each
    order's EARLIEST lineitem shipped at-or-after its order date (ties
    broken by min l_linenumber then min price-cents — a TOTAL order
    over the output columns; inner — orders with no at-or-after
    shipment drop).

    Two distributed shapes, selected by ``mode``, produce identical rows:

    - ``by_key`` (default): key-hash-bucketed shuffle (``ASOF_BUCKETS``
      tasks, each evaluating MANY keys via the vectorized
      ``_asof_eval_forward`` — never one task or one Python call per
      key).
    - ``by_time`` (skew-safe): the exact MIRROR of the backward
      decomposition — partition the time axis into ``time_ranges``
      equal-width ranges (bounds from orders' ``o_orderdate`` row-group
      statistics, no extra scan) and bucket by hash(key, range) so a
      hot key's lineitem history splits across tasks. Boundary
      replication runs BACKWARD: for each range that contains a probe,
      inject the (ship, ln, price)-lexmin build of all LATER ranges.
      Costs one extra (small) shuffle of per-(key, range) minima."""

    def probe_rows(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ok)
        return pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "ln": pa.nulls(n, pa.int64()),
                "ship_us": pa.nulls(n, pa.int64()),
                "price_c": pa.nulls(n, pa.int64()),
            }
        )

    def build_rows(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pc_ = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "ts_us": pa.nulls(n, pa.int64()),
                "ln": pa.array(ln, pa.int64()),
                "ship_us": pa.array(ship, pa.int64()),
                "price_c": pa.array(pc_, pa.int64()),
            }
        )

    probes = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(probe_rows, batch_format="pyarrow")
    builds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate",
                 "l_extendedprice"],
    ).map_batches(build_rows, batch_format="pyarrow")
    if mode == "by_key":
        return (
            probes.union(builds)
            .map_batches(_asof_add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_asof_eval_forward, batch_format="pyarrow")
        )
    if mode != "by_time":
        raise ValueError(f"unknown asof mode {mode!r}")
    return _asof_forward_by_time(sf_dir, probes, builds, int(time_ranges))


def _asof_forward_by_time(sf_dir: str, probes, builds, R: int):
    """Skew-safe time-axis decomposition of the FORWARD as-of join —
    the mirror of ``_asof_by_time`` (carry-in comes from the NEXT
    ranges via a per-key reverse merge instead of the previous ones);
    every stage bucketed + vectorized, see ``_asof_eval_forward``."""
    bounds = _events_ts_bounds(
        f"{sf_dir}/orders.parquet", col_name="o_orderdate"
    )
    if bounds is None:  # no stats → one aggregate pass (fallback)
        from ray.data.aggregate import Max, Min

        mm = probes.aggregate(Min("ts_us"), Max("ts_us"))
        if mm["min(ts_us)"] is None:
            return ray.data.from_arrow(_ASOF_FWD_EMPTY)
        bounds = (int(mm["min(ts_us)"]), int(mm["max(ts_us)"]))
    t0, t1 = bounds
    w = max(1, (t1 - t0) // R + 1)

    def tag_probe(batch: pa.Table) -> pa.Table:
        ts = batch["ts_us"].to_numpy(zero_copy_only=False)
        rng = np.clip((ts - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    def tag_build(batch: pa.Table) -> pa.Table:
        ship = batch["ship_us"].to_numpy(zero_copy_only=False)
        rng = np.clip((ship - t0) // w, 0, R - 1).astype(np.int64)
        return batch.append_column("rng", pa.array(rng, pa.int64()))

    probes_tagged = probes.map_batches(tag_probe, batch_format="pyarrow")
    builds_tagged = builds.map_batches(tag_build, batch_format="pyarrow")

    def lexmin_partial(batch: pa.Table) -> pa.Table:
        """Per-batch (key, range) lexmin pre-combine — the minima
        shuffle then moves ≤ keys·ranges rows PER BLOCK instead of
        every lineitem row (same partial-before-shuffle shape as the
        backward lexmax)."""
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        key = batch["key"].to_numpy(zero_copy_only=False)
        rng = batch["rng"].to_numpy(zero_copy_only=False)
        ship = batch["ship_us"].to_numpy(zero_copy_only=False)
        ln = batch["ln"].to_numpy(zero_copy_only=False)
        price = batch["price_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((price, ln, ship, rng, key))
        k_s, r_s = key[order], rng[order]
        first = np.r_[True, (k_s[1:] != k_s[:-1]) | (r_s[1:] != r_s[:-1])]
        return batch.take(pa.array(order[first]))

    def probe_ranges_partial(batch: pa.Table) -> pa.Table:
        """Distinct probe (key, range) pairs of one batch (carry rows
        are only emitted for ranges that contain probes)."""
        batch = batch.combine_chunks()
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = batch["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rng, key))
        k_s, r_s = key[order], rng[order]
        first = (
            np.r_[True, (k_s[1:] != k_s[:-1]) | (r_s[1:] != r_s[:-1])]
            if len(order)
            else np.empty(0, bool)
        )
        n = int(first.sum())
        return pa.table(
            {
                "key": pa.array(k_s[first], pa.int64()),
                "ts_us": pa.array(np.zeros(n, np.int64), pa.int64()),
                "ln": pa.nulls(n, pa.int64()),
                "ship_us": pa.nulls(n, pa.int64()),
                "price_c": pa.nulls(n, pa.int64()),
                "rng": pa.array(r_s[first], pa.int64()),
            }
        )

    def carries(group: pa.Table) -> pa.Table:
        """One hash bucket of per-(key, range) build minima + probe
        range markers → carry rows: for each PROBE range, the
        (ship, ln, price)-lexmin build over all LATER ranges (a tiny
        reverse merge per key)."""
        import pyarrow.compute as pc

        group = group.combine_chunks()
        is_build = pc.is_valid(group["ship_us"])
        g_b = group.filter(is_build)
        g_p = group.filter(pc.invert(is_build))
        out_key: list[int] = []
        out_rng: list[int] = []
        out_ln: list[int] = []
        out_ship: list[int] = []
        out_price: list[int] = []
        if g_b.num_rows and g_p.num_rows:
            bk = g_b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            br = g_b["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
            bl = g_b["ln"].to_numpy(zero_copy_only=False).astype(np.int64)
            bs = g_b["ship_us"].to_numpy(zero_copy_only=False).astype(np.int64)
            bp = g_b["price_c"].to_numpy(zero_copy_only=False).astype(np.int64)
            ob = np.lexsort((bp, bl, bs, -br, bk))  # rng DESC within key
            bk, br, bl, bs, bp = bk[ob], br[ob], bl[ob], bs[ob], bp[ob]
            pk = g_p["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            pr = g_p["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
            op = np.lexsort((-pr, pk))  # rng DESC within key
            pk, pr = pk[op], pr[op]
            uniq = np.r_[True, (pk[1:] != pk[:-1]) | (pr[1:] != pr[:-1])]
            pk, pr = pk[uniq], pr[uniq]
            b_lo = np.searchsorted(bk, pk, side="left")
            b_hi = np.searchsorted(bk, pk, side="right")
            i = 0
            np_ = len(pk)
            while i < np_:
                kk = pk[i]
                lo, hi = int(b_lo[i]), int(b_hi[i])
                j = lo
                best = -1
                while i < np_ and pk[i] == kk:
                    rr = int(pr[i])
                    while j < hi and br[j] > rr:
                        if best < 0 or (bs[j], bl[j], bp[j]) < (
                            bs[best], bl[best], bp[best]
                        ):
                            best = j
                        j += 1
                    if best >= 0:
                        out_key.append(kk)
                        out_rng.append(rr)
                        out_ln.append(int(bl[best]))
                        out_ship.append(int(bs[best]))
                        out_price.append(int(bp[best]))
                    i += 1
        n = len(out_key)
        return pa.table(
            {
                "key": pa.array(out_key, pa.int64()),
                "ts_us": pa.nulls(n, pa.int64()),
                "ln": pa.array(out_ln, pa.int64()),
                "ship_us": pa.array(out_ship, pa.int64()),
                "price_c": pa.array(out_price, pa.int64()),
                "rng": pa.array(out_rng, pa.int64()),
            }
        )

    # both unions arrive as hundreds of sliver blocks (64-block scans ×
    # 3 branches); coalesce them to input-footprint-sized blocks before
    # each Sort or the all-to-all's per-task overhead dominates (the
    # per-batch partials make the carry union tiny — floor blocks)
    carry = (
        _coalesced(
            builds_tagged.map_batches(lexmin_partial, batch_format="pyarrow")
            .union(
                probes_tagged.map_batches(
                    probe_ranges_partial, batch_format="pyarrow"
                )
            ),
            sf_dir,
            "orders",
        )
        .map_batches(_asof_add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(carries, batch_format="pyarrow")
    )
    both = probes_tagged.union(builds_tagged).union(carry)
    return (
        _coalesced(both, sf_dir, "lineitem", expansion=1.2)
        .map_batches(
            _asof_add_bucket, fn_kwargs=dict(with_rng=True),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_asof_eval_forward, batch_format="pyarrow")
    )
