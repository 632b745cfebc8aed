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

from ..functions.hashing import (
    minhash_signature,
    rolling_fingerprint,
    sha256_hex,
    shingles,
    simhash64,
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



def _to_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset result to one Arrow table.

    Ray can emit empty blocks with an EMPTY (zero-field) schema alongside
    typed blocks (e.g. from groupby partitions that received no rows) —
    those must be dropped before concat or Arrow rejects the schema mix."""
    if isinstance(ds, pa.Table):
        return ds
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return pa.table({})
    typed = [t for t in tables if t.num_rows > 0]
    return pa.concat_tables(typed) if typed else tables[0]

def read_documents(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


# ---------------------------------------------------------------------------
# text analysis


def token_count(sf_dir: str):
    """(doc_id, n_tokens) — doc length over the SQL-parity tokenizer."""

    def f(batch: pa.Table) -> pa.Table:
        n = [len(tokenize(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def term_stats(sf_dir: str):
    """(term, df, ctf) — global term statistics with per-batch partial
    combine before the term shuffle (SURVEY.md §2.5 A1/A3 as a standalone
    operator)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df: dict[str, int] = {}
        ctf: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            toks = tokenize(t)
            seen = set()
            for tok in toks:
                ctf[tok] = ctf.get(tok, 0) + 1
                seen.add(tok)
            for tok in seen:
                df[tok] = df.get(tok, 0) + 1
        terms = sorted(ctf)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([df[t] for t in terms], pa.int64()),
                "ctf": pa.array([ctf[t] for t in terms], pa.int64()),
            }
        )

    ds = read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return ds.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("ctf", alias_name="ctf")
    )


def quality_score(sf_dir: str):
    """(doc_id, n_tokens, avg_token_len, stop_ratio, alnum_ratio, score)
    — length/stopword/punctuation quality heuristics (all SQL-parity)."""
    stop = frozenset(STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_toks, avg_len, stop_r, alnum_r, score = [], [], [], [], []
        for t in texts:
            toks = tokenize(t)
            n = len(toks)
            tok_chars = sum(len(x) for x in toks)
            n_toks.append(n)
            a = (tok_chars / n) if n else 0.0
            s = (sum(1 for x in toks if x in stop) / n) if n else 0.0
            al = (tok_chars / len(t)) if len(t) else 0.0
            avg_len.append(a)
            stop_r.append(s)
            alnum_r.append(al)
            # simple composite: long-enough, not stopword-soup, mostly alnum
            score.append(
                (1.0 if n >= 10 else n / 10.0) * (1.0 - s) * al
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_toks, pa.int64()),
                # no rounding: the SQL oracle computes the identical
                # IEEE expressions, so raw doubles match bit-for-bit
                # (python round() is half-even, DuckDB's is half-away —
                # rounding would DESYNC them on exact .5 cases)
                "avg_token_len": pa.array(avg_len, pa.float64()),
                "stop_ratio": pa.array(stop_r, pa.float64()),
                "alnum_ratio": pa.array(alnum_r, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def lang_id(sf_dir: str):
    """(doc_id, pred_lang) — marker-word language heuristic with the
    deterministic LANG_ORDER tie-break (SQL-parity via CASE chain)."""
    markers = {l: frozenset(ws) for l, ws in LANG_MARKERS.items()}

    def f(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            toks = tokenize(t)
            best_lang, best_n = "unknown", 0
            for l in LANG_ORDER:
                n = sum(1 for x in toks if x in markers[l])
                if n > best_n:
                    best_lang, best_n = l, n
            preds.append(best_lang)
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def fingerprint(sf_dir: str):
    """(doc_id, fp) — order-sensitive rolling document fingerprint
    (functions/hashing.rolling_fingerprint; SQL-parity via positional
    md5 sum mod 2^61-1)."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [
            rolling_fingerprint(tokenize(t)) for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.int64())}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# deduplication


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
    agg = ds.groupby("sha").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


NUM_MINHASHES = 8
LSH_BANDS = 4  # 2 hashes per band


def minhash_signatures(sf_dir: str):
    """(doc_id, sig_0..sig_7) — MinHash over 3-token shingles with
    DuckDB-replicable hashes (SQL-parity)."""

    def f(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f"sig_{k}": [] for k in range(NUM_MINHASHES)}
        for t in batch["text"].to_pylist():
            sig = minhash_signature(shingles(tokenize(t)), NUM_MINHASHES)
            for k in range(NUM_MINHASHES):
                cols[f"sig_{k}"].append(sig[k])
        data = {"doc_id": batch["doc_id"]}
        data.update(
            {k: pa.array(v, pa.int64()) for k, v in cols.items()}
        )
        return pa.table(data)

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def near_dup_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """(doc_a, doc_b, jaccard) — MinHash-LSH candidate generation
    (band groupby) + exact shingle-Jaccard verification.

    Scale shape: signatures → explode to (band, h_i, h_j, doc_id) rows →
    groupby(band key) → per-bucket candidate pairs → verify. Verification
    here broadcasts doc→shingle-set via ray.put (valid while candidate
    sets are driver-small; at 100 TB verification would join candidate
    pairs back against a shingle table instead)."""
    sigs = minhash_signatures(sf_dir)

    def bands(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy()
        out_band, out_key, out_doc = [], [], []
        for b in range(LSH_BANDS):
            h1 = batch[f"sig_{2 * b}"].to_numpy()
            h2 = batch[f"sig_{2 * b + 1}"].to_numpy()
            for i in range(len(doc)):
                out_band.append(b)
                out_key.append(f"{b}:{h1[i]}:{h2[i]}")
                out_doc.append(int(doc[i]))
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
            }
        )

    cands = banded.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    cand_tbl = _to_table(cands)
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh = {
        int(d): set(shingles(tokenize(t)))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    sh_ref = ray.put(sh)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(sh_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        ja, jb, jj = [], [], []
        seen = set()
        for x, y in zip(a, b):
            if (x, y) in seen:
                continue
            seen.add((x, y))
            sa, sb = m[x], m[y]
            inter = len(sa & sb)
            union = len(sa | sb)
            j = inter / union if union else 1.0
            if j >= jaccard_threshold:
                ja.append(x)
                jb.append(y)
                jj.append(round(j, 4))
        return pa.table(
            {
                "doc_a": pa.array(ja, pa.int64()),
                "doc_b": pa.array(jb, pa.int64()),
                "jaccard": pa.array(jj, pa.float64()),
            }
        )

    # dedupe candidate pairs across buckets, then verify distributed
    uniq = cand_tbl.group_by(["doc_a", "doc_b"]).aggregate([])
    if uniq.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    return _to_table(
        ray.data.from_arrow(uniq).map_batches(verify, batch_format="pyarrow")
    )


def simhash_codes(sf_dir: str):
    """(doc_id, simhash) — 63-bit weighted simhash per doc (SQL-parity via
    generated per-bit CASE sums)."""

    def f(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            tfs: dict[str, int] = {}
            for tok in tokenize(t):
                tfs[tok] = tfs.get(tok, 0) + 1
            out.append(simhash64(tfs))
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """(doc_a, doc_b, jaccard) — LSH-candidate near-dup with a lower
    threshold (n-gram Jaccard variant of near_dup_pairs)."""
    return near_dup_pairs(sf_dir, jaccard_threshold=threshold)


# ---------------------------------------------------------------------------
# similarity search over embeddings


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(0)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def embedding_topk(sf_dir: str, k: int = 20):
    """(vec_id, cos) — brute-force cosine top-k vs the vec_id=0 query
    vector, broadcast once via ray.put and matmul'd per batch (the
    baseline ANN path; SQL-parity via list_cosine_similarity)."""
    q = _query_vector(sf_dir)
    q_ref = ray.put(q)

    def f(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        qn = np.sqrt(np.dot(qv, qv))
        emb = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
        norms = np.sqrt((emb * emb).sum(axis=1))
        denom = norms * qn
        cos = (emb @ qv) / np.where(denom == 0, 1.0, denom)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cos": pa.array(cos, pa.float64()),
            }
        )

    ds = read_embeddings(sf_dir, ["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow"
    )
    top = ds.sort(["cos", "vec_id"], descending=[True, False]).limit(k)
    t = _to_table(top)
    return pa.table(
        {
            "vec_id": t["vec_id"],
            "cos": pa.array(
                [round(float(x), 4) for x in t["cos"].to_pylist()], pa.float64()
            ),
        }
    )


NUM_HYPERPLANES = 6


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
        emb = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
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
                [round(float(x), 4) for x in t["cos"].to_pylist()], pa.float64()
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


def events_tumbling_window(sf_dir: str, hours: int = 1):
    """(event_type, window_start, n_events, sum_value_milli) — tumbling
    window per event type; Arrow-native partial combine per batch before
    the shuffle.

    Type fidelity: the window key stays **int64 µs** through the bucket /
    partial / shuffle stages (a pandas hop here silently downgraded
    ``timestamp[us]`` to ``timestamp[s]`` and broke the value-hash gate);
    the single cast to ``timestamp("us")`` happens in the final
    projection, after the aggregate."""
    from ray.data.aggregate import Sum

    us_per = hours * 3600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # µs since epoch
        win = (ts // us_per) * us_per
        # integer milli-units: float summation order differs between
        # engines in the last ulp; integer sums are order-independent
        # and hash-exact
        mv = np.floor(batch["value"].to_numpy() * 1000.0).astype(np.int64)
        keyed = pa.table(
            {
                "event_type": batch["event_type"],
                "window_us": pa.array(win, pa.int64()),
                "value_milli": pa.array(mv, pa.int64()),
            }
        )
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
        .groupby(["event_type", "window_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_milli", alias_name="sum_value_milli"),
        )
    )
    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# join-index / adjacency (the reference's reply_to_index as a generic op)


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
