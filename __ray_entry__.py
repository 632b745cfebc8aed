"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (stemmed positional inverted-index
build + the adapted reference query set) on sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline from SURVEY.md §2 plus the
training-data ops; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible one (same column names, rounded floats).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Engine-backed entries build a NON-STEMMED index over ``documents.parquet``
(DuckDB has no stemmer in this sandbox — no loadable extensions — so the
SQL-checkable index variant disables stemming; the stemmed flagship path
is gated by the pytest oracle instead and exposed here as rows-only
entries)."""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)
from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
from informationretrieval_en_people_cn_ray.pipelines import relational as rel
from informationretrieval_en_people_cn_ray.text import TOKEN_SQL

CACHE_ROOT = "/tmp/irpc_index_cache"

# fixed test constants (present in documents at every sf — chosen by
# inspecting term stats; see tests/test_entry.py)
Q_TERMS = ["scan", "join", "merge", "filter"]
Q_TEXT = "scan join merge filter"
PHRASE = "part filter"
PHRASE_PREFIX = "part fil"  # leading word + prefix of 'filter'
PREFIX = "fil"
SAMPLE_TERMS = ["scan", "join", "order", "merge", "filter"]
BM25_K = 20
# more_like_this: seed doc, #tf-idf query terms drawn from it, result k
MLT_SEED = 7
MLT_TERMS = 5
MLT_K = 10
# pseudo-relevance feedback: #feedback docs, #expansion terms, result k
PRF_FB_DOCS = 5
PRF_FB_TERMS = 3
PRF_K = 15

_TOK = TOKEN_SQL.format(col="text")
_TOK_CTE = f"""
tok as (
  select doc_id,
         unnest({_TOK}) as term,
         generate_subscripts({_TOK}, 1) as pos
  from documents
)"""


def _index_dir(sf_dir: str, stem: bool) -> str:
    f = os.path.join(sf_dir, "documents.parquet")
    key = f"{os.path.abspath(f)}|{os.path.getmtime(f)}|stem={stem}"
    return os.path.join(
        CACHE_ROOT, hashlib.sha256(key.encode()).hexdigest()[:16]
    )


def _engine(sf_dir: str, stem: bool = False):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    d = _index_dir(sf_dir, stem)
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        d,
        BuildConfig(
            num_segments=4,
            docstat_partitions=2,
            stem=stem,
            content_column="text",
            doc_id_column="doc_id",
            tokenize_concurrency=2,
        ),
    )
    return SearchEngine(d, mode="local")


def _ranked_table(ids, scores) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "score": pa.array(
                [dp.round4(float(s)) for s in scores], pa.float64()
            ),
        }
    )


def _ids_table(ids) -> pa.Table:
    return pa.table({"doc_id": pa.array([int(i) for i in ids], pa.int64())})


# ---------------------------------------------------------------------------
# engine-backed query callables (non-stemmed index == SQL semantics)


def _q_bm25(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25")
    return _ranked_table(ids, scores)


def _q_more_like_this(sf_dir: str) -> pa.Table:
    """Relevance-feedback retrieval ("find documents like this one"):
    the seed document's top-``MLT_TERMS`` tf·idf terms (tf from the doc,
    df from the index DICTIONARY — no posting decode; ties term-asc)
    become an OR-BM25 query; the seed itself is excluded from the
    ranking. Exact SQL oracle (the same computed-term CTE feeds the
    shared BM25 body)."""
    import math

    from informationretrieval_en_people_cn_ray.text import (
        MAX_STEM_LEN,
        MIN_STEM_LEN,
    )

    eng = _engine(sf_dir)
    import pyarrow.dataset as pads

    seed = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["text"], filter=pads.field("doc_id") == MLT_SEED
    )
    if seed.num_rows == 0:
        raise ValueError(
            f"more_like_this seed doc_id={MLT_SEED} is absent from "
            f"{sf_dir}/documents.parquet"
        )
    text = seed["text"][0].as_py()
    tf: dict[str, int] = {}
    for w in eng.az.tokens(text):
        t = eng.az.term(w)
        if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN:
            tf[t] = tf.get(t, 0) + 1
    scored = []
    for t, f in tf.items():
        meta = eng.local.term_meta(t)
        if meta is not None:
            scored.append((-f * math.log(eng.N / meta[0]), t))
    scored.sort()
    terms = [t for _, t in scored[:MLT_TERMS]]
    ids, scores = eng.search(" ".join(terms), k=None, scorer="bm25")
    keep = ids != MLT_SEED
    return _ranked_table(ids[keep][:MLT_K], scores[keep][:MLT_K])


def _mlt_sql() -> str:
    qt = f"""qt as (
  select s.term
  from (select term, count(*) as tf from tok
        where doc_id = {MLT_SEED}
          and length(term) > 1 and length(term) <= 128
        group by term) s
  join (select term, count(distinct doc_id) as df from tok
        group by term) d on d.term = s.term
  order by s.tf * ln((select count(*) from documents)::double / d.df)
             desc, s.term
  limit {MLT_TERMS}
)"""
    return _bm25_sql(
        qt_sql=qt, where=f"where f.doc_id <> {MLT_SEED}", k=MLT_K
    )


def _pii_sql() -> str:
    """pii_scrub oracle generated from the SAME ``dp.PII_PATTERNS``
    table the Ray op uses (counts on the original text, replacements
    applied in pattern order) — single-sourced so the two sides cannot
    drift."""
    counts = ",\n  ".join(
        f"len(regexp_extract_all(text, '{pat}'))::bigint as {name}"
        for name, pat, _ in dp.PII_PATTERNS
    )
    scrub = "text"
    for _, pat, token in dp.PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
select doc_id,
  {counts},
  {scrub} as text_scrubbed
from documents
"""


def _q_prf_bm25(sf_dir: str) -> pa.Table:
    """Pseudo-relevance-feedback (Rocchio/RM-lite) retrieval: BM25 on
    the base query picks the top ``PRF_FB_DOCS`` feedback docs; their
    top ``PRF_FB_TERMS`` tf·idf terms (tf summed over the feedback
    docs, df from the index DICTIONARY, original terms excluded, ties
    term-asc) expand the query; the expanded OR-BM25 ranking is the
    result. Driver work is bounded by the feedback-doc point reads.
    Exact SQL oracle (the base ranking nests as a subquery inside the
    expansion CTE)."""
    import math

    import pyarrow.dataset as pads

    from informationretrieval_en_people_cn_ray.text import (
        MAX_STEM_LEN,
        MIN_STEM_LEN,
    )

    eng = _engine(sf_dir)
    fb_ids, _ = eng.search(Q_TEXT, k=PRF_FB_DOCS, scorer="bm25")
    fb = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["text"],
        filter=pads.field("doc_id").isin([int(i) for i in fb_ids]),
    )
    orig = set(Q_TERMS)
    tf: dict[str, int] = {}
    for text in fb["text"].to_pylist():
        for w in eng.az.tokens(text):
            t = eng.az.term(w)
            if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN and t not in orig:
                tf[t] = tf.get(t, 0) + 1
    scored = []
    for t, f in tf.items():
        meta = eng.local.term_meta(t)
        if meta is not None:
            scored.append((-f * math.log(eng.N / meta[0]), t))
    scored.sort()
    expansion = [t for _, t in scored[:PRF_FB_TERMS]]
    ids, scores = eng.search(
        " ".join(Q_TERMS + expansion), k=PRF_K, scorer="bm25"
    )
    return _ranked_table(ids, scores)


def _prf_sql() -> str:
    base = _bm25_sql(k=PRF_FB_DOCS)
    orig_list = ", ".join(f"'{t}'" for t in Q_TERMS)
    vals = ", ".join(f"('{t}')" for t in Q_TERMS)
    qt = f"""fb as (
  select doc_id from ({base})
),
expn as (
  select k.term
  from tok k
  join fb on k.doc_id = fb.doc_id
  join (select term, count(distinct doc_id) as df from tok
        group by term) d on d.term = k.term
  where length(k.term) > 1 and length(k.term) <= 128
    and k.term not in ({orig_list})
  group by k.term, d.df
  order by count(*) * ln((select count(*) from documents)::double / d.df)
             desc, k.term
  limit {PRF_FB_TERMS}
),
qt as (
  select term from expn
  union all
  select term from (values {vals}) o(term)
)"""
    return _bm25_sql(qt_sql=qt, k=PRF_K)


def _q_bm25_by_range(sf_dir: str) -> pa.Table:
    """Same ranking as bm25_topk but through the score-by-doc-range scale
    path (DocStatsShard actors; doc-length state never lives in one
    process) — exact, so it shares bm25_topk's SQL oracle."""
    from informationretrieval_en_people_cn_ray.queryparse import parse

    eng = _engine(sf_dir)
    ids, scores = eng.ranked_by_range(parse(Q_TEXT), k=BM25_K)
    return _ranked_table(ids, scores)


def _q_dirichlet(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    # cutoff=None: the documents tables have a ~30-term vocabulary, so the
    # reference's C/100 frequent-term skip would drop EVERY term; the
    # cutoff semantics are pytest-gated on the synthetic corpus instead
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="dirichlet", cutoff=None)
    return _ranked_table(ids, scores)


def _q_boolean_and(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    return _ids_table(eng.search("scan AND join AND merge"))


def _q_boolean_or_not(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    return _ids_table(
        eng.search("scan AND join NOT merge OR filter AND sort")
    )


def _q_prefix(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    return _ids_table(eng.search(f"{PREFIX}* AND scan"))


def _q_phrase(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    return _ids_table(eng.search(f"'{PHRASE}' AND '{PHRASE}'"))


def _q_phrase_prefix(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir)
    return _ids_table(eng.search(f"'{PHRASE_PREFIX}'* AND '{PHRASE_PREFIX}'*"))


def _q_proximity(sf_dir: str) -> pa.Table:
    """(doc_id, min_dist) — NEAR/5 proximity search over the positional
    index: docs where 'part' occurs within 5 tokens of 'filter', plus
    the closest distance (the unordered generalization of the phrase
    query, answered from the same varint position stream)."""
    eng = _engine(sf_dir)
    ids, dist = eng.proximity("part", "filter", within=5)
    return pa.table(
        {
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "min_dist": pa.array([int(d) for d in dist], pa.int64()),
        }
    )


def _q_ordered_proximity(sf_dir: str) -> pa.Table:
    """(doc_id, min_dist) — ONEAR/5: like proximity_search but only
    'filter' occurrences AFTER the 'part' occurrence count
    (0 < pos_b − pos_a ≤ 5), the directed phrase relaxation."""
    eng = _engine(sf_dir)
    ids, dist = eng.proximity("part", "filter", within=5, ordered=True)
    return pa.table(
        {
            "doc_id": pa.array([int(i) for i in ids], pa.int64()),
            "min_dist": pa.array([int(d) for d in dist], pa.int64()),
        }
    )


BOOST_LANG, BOOST_W = "en", 1.25  # document-boost: lang weight
WILDCARD = "s*a*"  # matches scan/small/spark/stream in the test vocab
REGEX_QUERY = "s[ct][a-z]+"  # scan/stream/scala-ish terms; portable re∩RE2
SPELL_WORD = "par"  # misspelling → part(1), spark(2), a(2)
FUZZY_WORD = "scon"  # typo → scan (1 edit); fuzzy search includes matches
FACET_QUERY = "scan AND join"


FILTER_LANG = "en"


def _q_bm25_filtered(sf_dir: str) -> pa.Table:
    """bm25_topk restricted to lang='en' docs — metadata-filtered ranked
    search: the candidate set intersects a broadcastable id filter
    (collection/term statistics stay global, so scores equal the
    unfiltered query's for the surviving docs)."""
    eng = _engine(sf_dir)
    allowed = dp.doc_ids_where(sf_dir, "lang", FILTER_LANG)
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25", allowed=allowed)
    return _ranked_table(ids, scores)


def _q_wildcard(sf_dir: str) -> pa.Table:
    """Docs containing any dictionary term matching the ``*``-wildcard
    (engine grammar extension: leading/infix/multiple stars; expansion
    runs where the dictionary lives), intersected with a keyword —
    exercised through the full boolean path."""
    eng = _engine(sf_dir)
    return _ids_table(eng.search(f"{WILDCARD} AND data"))


def _q_fuzzy_search(sf_dir: str) -> pa.Table:
    """Typo-tolerant search: docs containing any dictionary term within
    1 edit of the (misspelled) query word."""
    eng = _engine(sf_dir)
    return _ids_table(eng.fuzzy_docs(FUZZY_WORD, max_dist=1))


def _q_boosted_bm25(sf_dir: str) -> pa.Table:
    """Document-boosted BM25: per-doc metadata weights (lang='en' ×1.25)
    multiply the accumulated score before top-k — the standard
    recency/quality/field boosting hook. Stats stay global; the weight
    array is the broadcastable dimension side."""
    from informationretrieval_en_people_cn_ray.queryparse import parse

    eng = _engine(sf_dir)
    boost = dp.doc_weights_by_lang(sf_dir, BOOST_LANG, BOOST_W)
    ids, scores = eng.ranked(
        parse(Q_TEXT), k=BM25_K, scorer="bm25", boost=boost
    )
    return _ranked_table(ids, scores)


def _q_regex_search(sf_dir: str) -> pa.Table:
    """Docs containing any dictionary term whose whole surface form
    matches the regex (portable Python-re ∩ RE2 subset; per-segment
    expansion narrowed to the required literal prefix)."""
    eng = _engine(sf_dir)
    return _ids_table(eng.regex_docs(REGEX_QUERY))


def _q_spell_suggest(sf_dir: str) -> pa.Table:
    """(term, dist, df) — dictionary spell suggestion: index terms within
    2 edits of the query word ranked (dist asc, df desc, term asc); the
    per-segment dictionary scan ships only candidates."""
    eng = _engine(sf_dir)
    rows = eng.suggest(SPELL_WORD, k=10, max_dist=2)
    return pa.table(
        {
            "term": pa.array([t for t, _, _ in rows], pa.string()),
            "dist": pa.array([d for _, d, _ in rows], pa.int64()),
            "df": pa.array([f for _, _, f in rows], pa.int64()),
        }
    )


def _q_facet_counts(sf_dir: str) -> pa.Table:
    """(lang, source, n_docs) — metadata facets over a boolean result
    set: engine match → broadcast id membership → facet-sized groupby."""
    eng = _engine(sf_dir)
    ids = eng.search(FACET_QUERY)
    return dp._to_table(dp.facet_counts(sf_dir, ids))


def _q_bm25_snippets(sf_dir: str) -> pa.Table:
    """(doc_id, score, snippet) — ranked hits WITH result snippets: the
    7-token window centered on the document's FIRST query-term match
    (the search-result presentation step; reference counterpart: the
    result printer's comment hydration). Top-k-sized driver work: the
    ranked ids come from the engine, the texts from DocStore point
    reads, the window from the shared SQL-parity tokenizer."""
    from informationretrieval_en_people_cn_ray.sources.corpus_source import (
        DocStore,
    )
    from informationretrieval_en_people_cn_ray.text import tokenize

    eng = _engine(sf_dir)
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25")
    # the engine's index is built with doc_id_column="doc_id" — hydrate
    # by the explicit id column, not the layout ordinal (identical on
    # the synthetic tables, wrong the moment ids aren't dense row
    # positions)
    store = DocStore(
        os.path.join(sf_dir, "documents.parquet"), doc_id_column="doc_id"
    )
    texts = dict(
        zip(
            (t := store.lookup(ids, columns=["text"]))["doc_id"].to_pylist(),
            t["text"].to_pylist(),
        )
    )
    qset = set(Q_TERMS)
    snips = []
    for i in ids:
        toks = tokenize(texts[int(i)])
        p = next(j for j, tk in enumerate(toks) if tk in qset)
        snips.append(" ".join(toks[max(p - 3, 0) : p + 4]))
    out = _ranked_table(ids, scores)
    return out.append_column("snippet", pa.array(snips, pa.string()))


def _q_postings(sf_dir: str) -> pa.Table:
    """(term, doc_id, tf) for the fixed sample terms — decoded straight
    from the built segments."""
    eng = _engine(sf_dir)
    terms_out, docs_out, tfs_out = [], [], []
    pmap = eng._postings_map(SAMPLE_TERMS)
    for t in SAMPLE_TERMS:
        p = pmap[t]
        if p is None:
            continue
        terms_out.extend([t] * len(p.doc_ids))
        docs_out.extend(int(x) for x in p.doc_ids)
        tfs_out.extend(int(x) for x in p.tfs)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
        }
    )


def _q_positions(sf_dir: str) -> pa.Table:
    """(term, doc_id, pos) for the sample terms, decoded from the
    POSITION stream of the built segments (the varint position blobs the
    skip header normally lets ranked queries bypass) — value-gates the
    positional codec path itself against SQL. Engine positions are
    0-based over the full token stream; +1 matches SQL's 1-based
    generate_subscripts."""
    eng = _engine(sf_dir)
    pmap = eng._postings_map(SAMPLE_TERMS, with_positions=True)
    terms_out, docs_out, pos_out = [], [], []
    for t in SAMPLE_TERMS:
        p = pmap[t]
        if p is None:
            continue
        for k in range(len(p.doc_ids)):
            s = int(p.pos_starts[k])
            for q in p.positions[s : s + int(p.tfs[k])]:
                terms_out.append(t)
                docs_out.append(int(p.doc_ids[k]))
                pos_out.append(int(q) + 1)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "pos": pa.array(pos_out, pa.int64()),
        }
    )


REPLYTO_CUSTKEY = 7


def _q_replyto(sf_dir: str) -> pa.Table:
    """ReplyTo:<key> through the ENGINE grammar, backed by an adjacency
    artifact built from orders (o_custkey → o_orderkey children) — the
    reference's reply_to_index as a first-class operator."""
    from informationretrieval_en_people_cn_ray.pipelines.adjacency import (
        AdjacencyIndex,
        build_adjacency,
    )

    f = os.path.join(sf_dir, "orders.parquet")
    d = os.path.join(
        CACHE_ROOT,
        "adj_" + hashlib.sha256(
            f"{os.path.abspath(f)}|{os.path.getmtime(f)}".encode()
        ).hexdigest()[:16],
    )
    if not os.path.exists(os.path.join(d, "adjacency.json")):
        build_adjacency(f, "o_custkey", "o_orderkey", d, num_partitions=4)
    eng = _engine(sf_dir)
    eng.adjacency = AdjacencyIndex(d)
    ids = eng.search(f"ReplyTo:{REPLYTO_CUSTKEY} AND ReplyTo:{REPLYTO_CUSTKEY}")
    return _ids_table(ids)


def _q_term_stats(sf_dir: str):
    return dp.term_stats(sf_dir)


def _q_token_count(sf_dir: str):
    return dp.token_count(sf_dir)


def _q_sink_roundtrip(sf_dir: str):
    """term_stats streamed through the resumable partitioned sink and
    read back — the north_rule checkpointed-output path as a
    value-gated driver entry (same oracle as term_stats; a re-run with
    the same corpus fingerprint skips the write)."""
    from informationretrieval_en_people_cn_ray.state.sink import (
        read_partitioned,
        write_partitioned,
    )

    f = os.path.join(sf_dir, "documents.parquet")
    fp = f"{os.path.abspath(f)}|{os.path.getmtime(f)}|term_stats"
    out = os.path.join(
        CACHE_ROOT, "sink_" + hashlib.sha256(fp.encode()).hexdigest()[:16]
    )
    write_partitioned(dp.term_stats(sf_dir), out, fp)
    return read_partitioned(out)


def _q_doc_lengths_from_index(sf_dir: str) -> pa.Table:
    """(doc_id, doc_len) read back from the index's docstat partitions —
    checks the docstat artifacts themselves against SQL."""
    eng = _engine(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array(eng.stats.doc_ids, pa.int64()),
            "doc_len": pa.array(eng.stats.doc_lens, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# flagship stemmed entries (no SQL stemmer → rows-only checks)

REFERENCE_STYLE_QUERIES = [
    Q_TEXT,
    "scan",
    f"'{PHRASE}'",
    "scan AND join",
    "scan NOT join",
    f"{PREFIX}*",
    f"'{PHRASE_PREFIX}'*",
    "join AND merge AND filter AND scan",
    "sort OR 'part filter'",
    "merge NOT fil*",
]


def _q_bm25_stemmed(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir, stem=True)
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25")
    return _ranked_table(ids, scores)


def _q_queryset_stemmed(sf_dir: str) -> pa.Table:
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        search_many,
    )

    eng = _engine(sf_dir, stem=True)  # ensure the index exists
    ds = search_many(
        eng.local.index_dir, REFERENCE_STYLE_QUERIES, k=10, concurrency=2
    )
    return dp._to_table(ds)


def _q_index_stats_stemmed(sf_dir: str) -> pa.Table:
    eng = _engine(sf_dir, stem=True)
    parts = eng.manifest["partitions"]
    return pa.table(
        {
            "seg": pa.array([p["seg"] for p in parts], pa.int32()),
            "kind": pa.array([p["kind"] for p in parts], pa.string()),
            "n_terms": pa.array([p["n_terms"] for p in parts], pa.int64()),
            "tokens": pa.array([p["tokens"] for p in parts], pa.int64()),
        }
    )


def _incremental_index(sf_dir: str) -> str:
    """Build (or reuse) the INCREMENTAL index over documents: generation
    0 over the first half, then ``pipelines/merge.extend_index``
    tokenizes ONLY the second half (layout doc_ids offset via
    ``BuildConfig.doc_id_base`` — identical to the doc_id column, which
    is the row position at every sf) and merges byte-level. Returns the
    merged index dir; every step short-circuits when already built."""
    import pyarrow.parquet as pqt

    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_index,
    )

    f = os.path.join(sf_dir, "documents.parquet")
    key = f"{os.path.abspath(f)}|{os.path.getmtime(f)}|incr"
    root = os.path.join(
        CACHE_ROOT, "incr_" + hashlib.sha256(key.encode()).hexdigest()[:16]
    )
    a_c, b_c = os.path.join(root, "corpus_a"), os.path.join(root, "corpus_b")
    merged = os.path.join(root, "merged")
    done = os.path.join(root, "corpus_split.done")
    if not os.path.exists(done):
        # both halves land under tmp names then rename, sentinel LAST:
        # a kill between the two writes (or mid-write, leaving a
        # footerless parquet that still os.path.exists) must not poison
        # the cache for every later run
        t = pqt.read_table(f, columns=["text"])
        half = t.num_rows // 2
        os.makedirs(a_c, exist_ok=True)
        os.makedirs(b_c, exist_ok=True)
        for d, sl in ((a_c, t.slice(0, half)), (b_c, t.slice(half))):
            dst = os.path.join(d, "part-00000.parquet")
            tmp = dst + f".tmp-{os.getpid()}"
            pqt.write_table(sl, tmp, row_group_size=256)
            os.replace(tmp, dst)
        with open(done + f".tmp-{os.getpid()}", "w") as fh:
            fh.write("ok")
        os.replace(done + f".tmp-{os.getpid()}", done)
    cfg = BuildConfig(
        num_segments=4,
        docstat_partitions=2,
        stem=False,
        content_column="text",
    )
    gen0 = os.path.join(root, "gen0")
    build_index(a_c, gen0, cfg)  # short-circuits when already built
    extend_index(gen0, b_c, os.path.join(root, "gen1"), merged)
    return merged


def _incremental_generations(sf_dir: str) -> list[str]:
    """The UNMERGED [gen0, gen1] generation list behind
    ``_incremental_index`` (which also materializes the compacted
    merge)."""
    merged = _incremental_index(sf_dir)
    root = os.path.dirname(merged)
    return [os.path.join(root, "gen0"), os.path.join(root, "gen1")]


def _q_incremental_bm25(sf_dir: str) -> pa.Table:
    """BM25 top-k answered from the INCREMENTALLY built+merged index —
    value-gated by the SAME SQL oracle as bm25_topk, so the merge path
    must reproduce exact ranking (doc ids AND scores), not just term
    statistics."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    eng = SearchEngine(_incremental_index(sf_dir), mode="local")
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25")
    return _ranked_table(ids, scores)


def _q_incremental_bm25_actors(sf_dir: str) -> pa.Table:
    """BM25 top-k through the GENERATION-AWARE SegmentSearcher actor
    pool over the UNMERGED [gen0, gen1] list — scatter-gather serving
    on a freshly extended, not-yet-compacted index, value-gated by the
    SAME SQL oracle as bm25_topk (ids AND scores must be exact)."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    eng = SearchEngine(
        _incremental_generations(sf_dir), mode="actors", num_actors=2
    )
    ids, scores = eng.search(Q_TEXT, k=BM25_K, scorer="bm25")
    return _ranked_table(ids, scores)


DELETED_DOC_IDS = (1, 3, 5)  # fixed victims, present at every sf


def _read_dict_stats(index_dir: str) -> pa.Table:
    """(term, df, ctf) summed over every segment's dictionary chunks;
    num_segments comes from the index's own collection.json."""
    import json as _json

    import pyarrow.parquet as pqt

    with open(os.path.join(index_dir, "collection.json")) as f:
        n_seg = _json.load(f)["num_segments"]
    tabs = [
        pqt.read_table(
            os.path.join(index_dir, f"seg={seg:05d}", "terms.parquet"),
            columns=["term", "df", "ctf"],
        )
        for seg in range(n_seg)
    ]
    allt = pa.concat_tables(tabs)
    # giant terms span several chunk rows; the logical stats are the sums
    agg = allt.group_by("term").aggregate([("df", "sum"), ("ctf", "sum")])
    return pa.table(
        {"term": agg["term"], "df": agg["df_sum"], "ctf": agg["ctf_sum"]}
    )


def _q_compacted_term_stats(sf_dir: str) -> pa.Table:
    """(term, df, ctf) AFTER deleting fixed documents and physically
    compacting: tombstone DELETED_DOC_IDS on (a copy of) the incremental
    index, run the compacting merge, read the rewritten dictionaries.
    Value-gated by the term_stats oracle over documents MINUS the
    victims — the decode→filter→re-encode path must reproduce corpus
    statistics exactly."""
    import shutil

    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        merge_indexes,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    merged = _incremental_index(sf_dir)
    root = os.path.dirname(merged)
    tombed = os.path.join(root, "tombed")
    compacted = os.path.join(root, "compacted")
    if not os.path.exists(os.path.join(tombed, "collection.json")):
        # copy into a tmp sibling and rename: a kill mid-copytree must
        # not leave a half-copied index that later runs trust (missing
        # segments read as empty → silently wrong compacted stats)
        tmp = tombed + f".tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(merged, tmp)
        # a half-copied tombed/ from an interrupted run has no
        # collection.json (checked above) — discard it, then rename
        shutil.rmtree(tombed, ignore_errors=True)
        try:
            os.replace(tmp, tombed)
        except OSError:  # concurrent winner installed it first
            shutil.rmtree(tmp, ignore_errors=True)
    delete_docs(tombed, list(DELETED_DOC_IDS))  # idempotent union
    merge_indexes([tombed], compacted)  # short-circuits by fingerprint
    return _read_dict_stats(compacted)


def _q_incremental_term_stats(sf_dir: str) -> pa.Table:
    """(term, df, ctf) read from the DICTIONARIES of the incremental
    index (``_incremental_index``) — value-gated by the term_stats-style
    oracle (with the index's M5 length filter)."""
    return _read_dict_stats(_incremental_index(sf_dir))


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: stemmed index build over sf0.001 documents + the adapted
    reference query set through the actor-pool batch path."""
    return _q_queryset_stemmed("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # index build + query engine (SURVEY.md §2)
        "term_stats": _q_term_stats,
        "token_count": _q_token_count,
        "sink_roundtrip": _q_sink_roundtrip,
        "incremental_term_stats": _q_incremental_term_stats,
        "incremental_bm25_topk": _q_incremental_bm25,
        "incremental_bm25_topk_actors": _q_incremental_bm25_actors,
        "compacted_term_stats": _q_compacted_term_stats,
        "doc_lengths_index": _q_doc_lengths_from_index,
        "postings_sample": _q_postings,
        "positions_sample": _q_positions,
        "bm25_topk": _q_bm25,
        "bm25_topk_filtered": _q_bm25_filtered,
        "bm25_snippets": _q_bm25_snippets,
        "bm25_topk_by_range": _q_bm25_by_range,
        "dirichlet_topk": _q_dirichlet,
        "boolean_and": _q_boolean_and,
        "boolean_or_not": _q_boolean_or_not,
        "prefix_search": _q_prefix,
        "phrase_search": _q_phrase,
        "phrase_prefix_search": _q_phrase_prefix,
        "proximity_search": _q_proximity,
        "wildcard_search": _q_wildcard,
        "regex_search": _q_regex_search,
        "boosted_bm25_topk": _q_boosted_bm25,
        "fuzzy_search": _q_fuzzy_search,
        "spell_suggest": _q_spell_suggest,
        "facet_counts": _q_facet_counts,
        "replyto_children": _q_replyto,
        # flagship stemmed pipeline (rows-only; pytest-oracle gated)
        "bm25_topk_stemmed": _q_bm25_stemmed,
        "reference_queryset_stemmed": _q_queryset_stemmed,
        "index_segment_stats_stemmed": _q_index_stats_stemmed,
        # training-data ops
        "exact_dedup": lambda sf: dp.exact_dedup_keepers(sf),
        "minhash_signatures": lambda sf: dp.minhash_signatures(sf),
        "near_dup_pairs": lambda sf: dp.near_dup_pairs(sf),
        "ngram_jaccard": lambda sf: dp.ngram_jaccard_pairs(sf),
        "simhash": lambda sf: dp.simhash_codes(sf),
        "lang_id": lambda sf: dp.lang_id(sf),
        "quality_score": lambda sf: dp.quality_score(sf),
        "fingerprint": lambda sf: dp.fingerprint(sf),
        "embedding_topk": lambda sf: dp.embedding_topk(sf),
        "ann_topk_checked": lambda sf: dp.ann_topk_checked(sf),
        "embedding_lsh_topk": lambda sf: dp.embedding_lsh_topk(sf),
        "embedding_ivf_topk": lambda sf: dp.embedding_ivf_topk(sf),
        "embedding_cosine_pairs": lambda sf: dp.embedding_cosine_pairs(sf),
        "embedding_cosine_pairs_lsh": lambda sf: dp.embedding_cosine_pairs_lsh(sf),
        "embed_then_topk": lambda sf: dp.embed_then_topk(sf),
        # TRAINED embeddings (PPMI-SVD; the reference's Doc2Vec analog)
        # — model scoring, rows-only (geometry is pytest-gated)
        "embed_documents_trained": lambda sf: dp.embed_documents_trained(sf),
        "embedding_trained_topk": lambda sf: dp.embedding_trained_topk(sf),
        "kmeans_clusters": lambda sf: dp.kmeans_clusters(sf),
        "group_adjacency": lambda sf: dp.group_adjacency(sf),
        "broadcast_join": lambda sf: dp.broadcast_join_events_customers(sf),
        "hash_join": lambda sf: dp.hash_join_orders_customers(sf),
        "hash_sample": lambda sf: dp.hash_sample_documents(sf),
        "events_window": lambda sf: dp.events_tumbling_window(sf),
        "events_sliding_window": lambda sf: dp.events_sliding_window(sf),
        "asof_join": lambda sf: dp.asof_join_events_orders(sf),
        # skew-safe variant (time-range partition + boundary replication)
        # — same rows by construction, value-gated by the same oracle
        "asof_join_by_time": lambda sf: dp.asof_join_events_orders(
            sf, mode="by_time"
        ),
        "range_join": lambda sf: dp.range_join_count(sf),
        "topk_per_group": lambda sf: dp.topk_per_group(sf),
        "semi_join": lambda sf: dp.semi_anti_join_customers(sf, anti=False),
        "anti_join": lambda sf: dp.semi_anti_join_customers(sf, anti=True),
        "doclen_quantiles": lambda sf: dp.doclen_quantiles(sf),
        "top_bigram_frac": lambda sf: dp.top_bigram_frac(sf),
        "dedup_clusters": lambda sf: dp.dedup_clusters(sf),
        "sessionize": lambda sf: dp.sessionize_events(sf),
        "sessionize_by_time": lambda sf: dp.sessionize_events(
            sf, mode="by_time"
        ),
        "decontaminate": lambda sf: dp.decontaminate(sf),
        "tfidf_topk_terms": lambda sf: dp.tfidf_topk_terms(sf),
        "split_assign": lambda sf: dp.split_assign(sf),
        "stratified_sample": lambda sf: dp.stratified_sample(sf),
        "top_ngrams": lambda sf: dp.top_ngrams(sf),
        "pmi_bigrams": lambda sf: dp.pmi_bigrams(sf),
        "weighted_sample": lambda sf: dp.weighted_sample(sf),
        "unigram_logprob": lambda sf: dp.unigram_logprob(sf),
        "gopher_filter": lambda sf: dp.gopher_filter(sf),
        "type_token_ratio": lambda sf: dp.type_token_ratio(sf),
        "curated_corpus": lambda sf: dp.curated_corpus(sf),
        "running_totals": lambda sf: dp.running_totals(sf),
        "running_totals_by_time": lambda sf: dp.running_totals(
            sf, mode="by_time"
        ),
        "event_type_pivot": lambda sf: dp.event_type_pivot(sf),
        "lang_source_rollup": lambda sf: dp.lang_source_rollup(sf),
        "regex_features": lambda sf: dp.regex_features(sf),
        "json_props_stats": lambda sf: dp.json_props_stats(sf),
        "bloom_semi_join": lambda sf: dp.bloom_semi_join(sf),
        "bloom_semi_join_checked": lambda sf: (
            dp.bloom_semi_join_checked(sf)
        ),
        "poisson_sample": lambda sf: dp.poisson_sample(sf),
        "countmin_top_ngrams": lambda sf: dp.countmin_top_ngrams(sf),
        "value_quantiles_binned": lambda sf: dp.value_quantiles_binned(sf),
        # driver-checkable forms of the three sketch ops: exact values +
        # an error-bound flag, both reproducible by the SQL oracle
        "countmin_top_ngrams_checked": lambda sf: (
            dp.countmin_top_ngrams_checked(sf)
        ),
        "value_quantiles_checked": lambda sf: dp.value_quantiles_checked(sf),
        "hll_distinct_users_checked": lambda sf: (
            dp.hll_distinct_users_checked(sf)
        ),
        "distinct_users": lambda sf: dp.distinct_users(sf),
        "hll_distinct_users": lambda sf: dp.hll_distinct_users(sf),
        "media_decode": lambda sf: dp.media_decode(sf),
        "media_pipeline": lambda sf: dp.media_pipeline(sf),
        "dedup_spans": lambda sf: dp.dedup_spans(sf),
        "bpe_token_count": lambda sf: dp.bpe_token_count(sf),
        "chunk_documents": lambda sf: dp.chunk_documents(sf),
        "chunk_then_embed_topk": lambda sf: dp.chunk_then_embed_topk(sf),
        "rep_ngram_frac": lambda sf: dp.rep_ngram_frac(sf),
        "event_value_delta": lambda sf: dp.event_value_delta(sf),
        "embedding_pq_topk": lambda sf: dp.embedding_pq_topk(sf),
        "more_like_this": _q_more_like_this,
        # relational analytics (TPC-H-shaped scan/join/aggregate)
        "pricing_summary": lambda sf: rel.pricing_summary(sf),
        "top_revenue_orders": lambda sf: rel.top_revenue_orders(sf),
        "revenue_by_nation": lambda sf: rel.revenue_by_nation(sf),
        # per-group statistics + char-level quality signal
        "mode_event_type": lambda sf: dp.mode_event_type(sf),
        "group_quantiles": lambda sf: dp.group_quantiles(sf),
        "char_entropy": lambda sf: dp.char_entropy(sf),
        "revenue_band_filter": lambda sf: rel.revenue_band_filter(sf),
        "priority_line_counts": lambda sf: rel.priority_line_counts(sf),
        "pii_scrub": lambda sf: dp.pii_scrub(sf),
        "prf_bm25_topk": _q_prf_bm25,
        "ordered_proximity_search": _q_ordered_proximity,
        "value_zscore_outliers": lambda sf: dp.value_zscore_outliers(sf),
        # graph analytics + window/argmin family + Q18-shaped join
        "pagerank": lambda sf: dp.pagerank(sf),
        "first_event_per_user_type": lambda sf: dp.first_event_per_user_type(sf),
        "user_moving_avg": lambda sf: dp.user_moving_avg(sf),
        "big_orders": lambda sf: rel.big_orders(sf),
        "triangle_count": lambda sf: dp.triangle_count(sf),
        "cohort_retention": lambda sf: dp.cohort_retention(sf),
        "funnel_counts": lambda sf: dp.funnel_counts(sf),
        "doc_rank_by_length": lambda sf: dp.doc_rank_by_length(sf),
        "data_audit": lambda sf: dp.data_audit(sf),
        "value_time_corr": lambda sf: dp.value_time_corr(sf),
        "doc_ntile_by_length": lambda sf: dp.doc_ntile_by_length(sf),
        "orders_per_customer_histogram": lambda sf: (
            dp.orders_per_customer_histogram(sf)
        ),
        "lead_event_gap": lambda sf: dp.lead_event_gap(sf),
        "dow_hour_heatmap": lambda sf: dp.dow_hour_heatmap(sf),
        "event_transition_matrix": lambda sf: dp.event_transition_matrix(sf),
        "asof_join_forward": lambda sf: dp.asof_join_forward(sf),
        # skew-safe forward variant (reverse carry from NEXT time range)
        "asof_join_forward_by_time": lambda sf: dp.asof_join_forward(
            sf, mode="by_time", time_ranges=8
        ),
        # rows-only: media features aren't SQL-expressible
        "media_similarity_topk": lambda sf: dp.media_similarity_topk(sf),
        "winsorize_values": lambda sf: dp.winsorize_values(sf),
        "normalize_text": lambda sf: dp.normalize_text(sf),
    }


# ---------------------------------------------------------------------------
# DuckDB oracles


def _bm25_sql(
    extra_join: str = "",
    qt_sql: str | None = None,
    where: str = "",
    k: int | None = None,
    boost_join: str = "",
    boost_expr: str = "1.0",
    group_extra: str = "",
) -> str:
    """OR-BM25 oracle body. ``qt_sql`` overrides the fixed query-term
    VALUES list with a computed CTE body (more_like_this); ``where``
    injects a predicate on the scored rows (seed-doc exclusion);
    ``boost_join``/``boost_expr``/``group_extra`` multiply the summed
    score by a per-document weight (document boosting) — the engine
    applies the identical multiply after term accumulation."""
    vals = ", ".join(f"('{t}')" for t in Q_TERMS)
    qt = qt_sql if qt_sql is not None else f"qt(term) as (values {vals})"
    return f"""
with {_TOK_CTE},
dl as (
  select doc_id, len({_TOK}) as dl from documents
),
stats as (
  select (select count(*) from documents) as n,
         (select sum(dl) from dl) as c
),
{qt},
tstats as (
  select k.term, count(distinct k.doc_id) as df
  from tok k join qt on k.term = qt.term group by k.term
),
tf as (
  select k.term, k.doc_id, count(*) as tf
  from tok k join qt on k.term = qt.term group by k.term, k.doc_id
)
select f.doc_id,
       round(sum(
         ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
         * f.tf * 2.5
         / (f.tf + 1.5 * (0.25 + 0.75 * d.dl / (s.c::double / s.n)))
       ) * {boost_expr}, 4) as score
from tf f
join tstats t on f.term = t.term
join dl d on f.doc_id = d.doc_id
{extra_join}
{boost_join}
cross join stats s
{where}
group by f.doc_id{group_extra}
order by sum(
  ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
  * f.tf * 2.5 / (f.tf + 1.5 * (0.25 + 0.75 * d.dl / (s.c::double / s.n)))
) * {boost_expr} desc, f.doc_id
limit {BM25_K if k is None else k}
"""


def _bm25_snippets_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in Q_TERMS)
    return f"""
with ranked as ({_bm25_sql()}),
{_TOK_CTE},
first as (
  select doc_id, min(pos) as p from tok
  where term in ({terms}) group by doc_id
),
tk as (select doc_id, {_TOK} as t from documents)
select r.doc_id, r.score,
       array_to_string(tk.t[greatest(f.p - 3, 1):f.p + 3], ' ') as snippet
from ranked r
join first f on f.doc_id = r.doc_id
join tk on tk.doc_id = r.doc_id
"""


def _dirichlet_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in Q_TERMS)
    return f"""
with {_TOK_CTE},
dl as (
  select doc_id, len({_TOK}) as dl from documents
),
stats as (
  select (select sum(dl) from dl) as c
),
qt(term) as (values {vals}),
scoring as (
  select k.term, count(*) as ctf
  from tok k join qt on k.term = qt.term group by k.term
),
tf as (
  select k.term, k.doc_id, count(*) as tf
  from tok k join qt on k.term = qt.term
  group by k.term, k.doc_id
),
cands as (  -- docs containing ANY query term (no cutoff here)
  select distinct k.doc_id from tok k join qt on k.term = qt.term
)
select c.doc_id,
       round(sum(
         ln((coalesce(f.tf, 0) + 1500.0 * t.ctf / s.c) / (d.dl + 1500.0))
       ), 4) as score
from cands c
cross join scoring t
cross join stats s
join dl d on c.doc_id = d.doc_id
left join tf f on f.term = t.term and f.doc_id = c.doc_id
group by c.doc_id
order by sum(
  ln((coalesce(f.tf, 0) + 1500.0 * t.ctf / s.c) / (d.dl + 1500.0))
) desc, c.doc_id
limit {BM25_K}
"""


def _pagerank_sql() -> str:
    """Chained-CTE fixed-point PageRank mirroring ``dp.pagerank``:
    all-integer arithmetic (ranks in 1e-12 units, ``//`` for both the
    out-degree split and the 0.85/0.15 damping), so the iterations are
    bit-identical to the engine's."""
    base = f"(({dp.PR_SCALE} // (select n from nn)) * 15) // 100"
    ctes = [
        f"""e as (
  select a.o_custkey as src, b.o_custkey as dst
  from orders a join orders b on b.o_orderkey = a.o_orderkey + 1
  where a.o_custkey <> b.o_custkey
),
nodes as (select src as node from e union select dst as node from e),
nn as (select count(*)::bigint as n from nodes),
deg as (select src, count(*)::bigint as d from e group by src),
r0 as (select node, ({dp.PR_SCALE} // (select n from nn))::bigint as r
       from nodes)"""
    ]
    for i in range(1, dp.PR_ITERS + 1):
        ctes.append(
            f"""c{i} as (
  select e.dst as node, sum(r{i - 1}.r // deg.d)::bigint as c
  from e join r{i - 1} on r{i - 1}.node = e.src
  join deg on deg.src = e.src
  group by e.dst
),
r{i} as (
  select nd.node,
    ({base} + (coalesce(c{i}.c, 0) * 85) // 100)::bigint as r
  from nodes nd left join c{i} on c{i}.node = nd.node
)"""
        )
    return (
        "with "
        + ",\n".join(ctes)
        + f"\nselect node, r as rank_fp from r{dp.PR_ITERS}"
    )


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(case when sum(case when (hv >> {b}) & 1 = 1 then w else -w end) > 0 "
        f"then (1::bigint << {b}) else 0 end)"
        for b in range(63)
    )
    return f"""
with {_TOK_CTE},
tf as (select doc_id, term, count(*) as w from tok group by doc_id, term),
h as (select doc_id, w, md5_number_lower(term) as hv from tf)
select d.doc_id, coalesce(s.simhash, 0) as simhash
from documents d left join (
  select doc_id, ({bit_terms}) as simhash from h group by doc_id
) s on d.doc_id = s.doc_id
"""


def _minhash_sql() -> str:
    sig_cols = ",\n  ".join(
        "list_min([(md5_number_lower('%d:' || s) & 9223372036854775807)::bigint"
        " for s in shingles]) as sig_%d" % (k, k)
        for k in range(dp.NUM_MINHASHES)
    )
    return f"""
with base as (
  select doc_id, {_TOK} as toks from documents
),
sh as (
  select doc_id,
    case when len(toks) >= 3
         then [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               for i in generate_series(1, len(toks) - 2)]
         -- coalesce: array_to_string([]) is NULL in DuckDB, but the
         -- engine's zero-token fallback shingle is the EMPTY STRING
         else [coalesce(array_to_string(toks, ' '), '')] end as shingles
  from base
)
select doc_id,
  {sig_cols}
from sh
"""


def _near_dup_ctes() -> str:
    """Shared CTE chain (base … j) of the MinHash-LSH oracle, reused by
    near_dup_pairs / ngram_jaccard / dedup_clusters."""
    sig_cols = ",\n  ".join(
        "list_min([(md5_number_lower('%d:' || s) & 9223372036854775807)::bigint"
        " for s in shingles]) as sig_%d" % (k, k)
        for k in range(dp.NUM_MINHASHES)
    )
    band_cond = " or ".join(
        f"(a.sig_{2 * b} = b.sig_{2 * b} and a.sig_{2 * b + 1} = b.sig_{2 * b + 1})"
        for b in range(dp.LSH_BANDS)
    )
    return f"""base as (
  select doc_id, {_TOK} as toks from documents
),
sh as (
  select doc_id,
    case when len(toks) >= 3
         then [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               for i in generate_series(1, len(toks) - 2)]
         -- coalesce: array_to_string([]) is NULL in DuckDB, but the
         -- engine's zero-token fallback shingle is the EMPTY STRING
         else [coalesce(array_to_string(toks, ' '), '')] end as shingles
  from base
),
sig as (
  select doc_id,
  {sig_cols}
  from sh
),
hs as (
  select doc_id,
    list_distinct(list_transform(
      shingles, s -> (md5_number_lower(s) & 9223372036854775807)::bigint
    )) as hset
  from sh
),
cand as (
  select a.doc_id as doc_a, b.doc_id as doc_b
  from sig a join sig b on a.doc_id < b.doc_id
  where {band_cond}
),
j as (
  select c.doc_a, c.doc_b,
    len(list_intersect(ha.hset, hb.hset))::double
      / (len(ha.hset) + len(hb.hset)
         - len(list_intersect(ha.hset, hb.hset))) as jaccard
  from cand c
  join hs ha on ha.doc_id = c.doc_a
  join hs hb on hb.doc_id = c.doc_b
)"""


def _near_dup_sql(threshold: float = 0.8) -> str:
    return f"""
with {_near_dup_ctes()}
select doc_a, doc_b, jaccard from j where jaccard >= {threshold}
"""


def _dedup_clusters_sql(threshold: float = 0.8) -> str:
    return f"""
with recursive {_near_dup_ctes()},
pr as (select doc_a, doc_b from j where jaccard >= {threshold}),
e as (
  select doc_a as a, doc_b as b from pr
  union
  select doc_b, doc_a from pr
),
reach(s, d) as (
  select a, b from e
  union
  select r.s, e2.b from reach r join e e2 on e2.a = r.d
),
rep as (
  select s as doc_id, least(s, min(d)) as rep_id from reach group by s
)
select d.doc_id,
       coalesce(rep.rep_id, d.doc_id) as rep_id,
       (coalesce(rep.rep_id, d.doc_id) = d.doc_id)::bigint as keep
from documents d left join rep on rep.doc_id = d.doc_id
"""


def _gopher_ctes() -> str:
    """Gopher-filter CTE chain ending in ``gr`` (doc_id, n, reasons);
    CTE names are disjoint from _near_dup_ctes so the curated-corpus
    oracle can splice both into one WITH list."""
    return f"""{_TOK_CTE},
gst as (
  select doc_id, count(*)::bigint as n,
         sum(len(term))::double / count(*) as mlen,
         sum(case when term in ('the','a','of','to','and','is','in')
             then 1 else 0 end)::double / count(*) as swf
  from tok group by doc_id
),
gbig as (
  select a.doc_id, a.term || ' ' || b.term as bg
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
gcnt as (select doc_id, bg, count(*) as c from gbig group by doc_id, bg),
gmx as (select doc_id, max(c) as topc from gcnt group by doc_id),
gbase as (
  select d.doc_id,
         coalesce(gst.n, 0) as n,
         coalesce(gst.mlen, 0.0) as mlen,
         coalesce(gst.swf, 0.0) as swf,
         case when coalesce(gst.n, 0) - 1 > 0
              then coalesce(gmx.topc, 0)::double / (gst.n - 1)
              else 0.0 end as tbf
  from documents d
  left join gst on gst.doc_id = d.doc_id
  left join gmx on gmx.doc_id = d.doc_id
),
gr as (
  select doc_id, n,
    (case when n < 20 or n > 90 then 1 else 0 end
     + case when mlen < 4.0 or mlen > 5.0 then 2 else 0 end
     + case when swf < 0.02 then 4 else 0 end
     + case when tbf > 0.10 then 8 else 0 end)::bigint as reasons
  from gbase
)"""


def _curated_corpus_sql(threshold: float = 0.8) -> str:
    """Composition oracle: gopher reasons x dedup-cluster rep x hash
    split, one row per document."""
    return f"""
with recursive {_near_dup_ctes()},
pr as (select doc_a, doc_b from j where jaccard >= {threshold}),
e as (
  select doc_a as a, doc_b as b from pr
  union
  select doc_b, doc_a from pr
),
reach(s, d) as (
  select a, b from e
  union
  select r2.s, e2.b from reach r2 join e e2 on e2.a = r2.d
),
rep as (
  select s as doc_id, least(s, min(d)) as rep_id from reach group by s
),
{_gopher_ctes()},
bk as (
  select doc_id,
    ((md5_number_lower(doc_id::varchar) & 9223372036854775807) % 100)::bigint
      as bucket
  from documents
)
select gr.doc_id,
  coalesce(rep.rep_id, gr.doc_id) as rep_id,
  gr.reasons,
  case when bk.bucket < 5 then 'test'
       when bk.bucket < 10 then 'val'
       else 'train' end as split,
  (gr.reasons = 0
   and coalesce(rep.rep_id, gr.doc_id) = gr.doc_id)::bigint as keep
from gr
join bk on bk.doc_id = gr.doc_id
left join rep on rep.doc_id = gr.doc_id
"""


def _decontaminate_sql(benchmark_mod: int = 100) -> str:
    return f"""
with {_near_dup_ctes()},
banned as (
  select distinct unnest(hset) as h from hs where doc_id % {benchmark_mod} = 0
),
sel as (select doc_id, unnest(hset) as h from hs),
hits as (
  select s.doc_id, count(*) as n_overlap
  from sel s join banned b on b.h = s.h group by s.doc_id
)
select hs.doc_id,
       coalesce(hits.n_overlap, 0)::bigint as n_overlap,
       (coalesce(hits.n_overlap, 0) > 0)::bigint as contaminated
from hs left join hits on hits.doc_id = hs.doc_id
"""


def _lang_id_sql() -> str:
    def cnt(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in dp.LANG_MARKERS[lang])
        return (
            f"len(list_filter(toks, x -> list_contains([{words}], x)))"
        )

    cases = []
    for l in dp.LANG_ORDER:
        cases.append(f"when c_{l} = best then '{l}'")
    sets = ",\n    ".join(f"{cnt(l)} as c_{l}" for l in dp.LANG_ORDER)
    case_chain = "\n         ".join(cases)
    greatest = ", ".join(f"c_{l}" for l in dp.LANG_ORDER)
    return f"""
with base as (
  select doc_id, {_TOK} as toks from documents
),
counts as (
  select doc_id,
    {sets}
  from base
),
best as (
  select *, greatest({greatest}) as best from counts
)
select doc_id,
  case when best = 0 then 'unknown'
       {case_chain}
       end as pred_lang
from best
"""


def _quality_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in dp.STOPWORDS)
    return f"""
with base as (
  select doc_id, text, {_TOK} as toks from documents
),
m as (
  select doc_id,
    len(toks) as n,
    -- coalesce: array_to_string([]) is NULL in DuckDB; zero tokens
    -- means zero token characters
    len(coalesce(array_to_string(toks, ''), '')) as tok_chars,
    len(list_filter(toks, x -> list_contains([{stop}], x))) as n_stop,
    len(text) as n_chars
  from base
)
select doc_id,
  n as n_tokens,
  case when n = 0 then 0.0 else tok_chars::double / n end as avg_token_len,
  case when n = 0 then 0.0 else n_stop::double / n end as stop_ratio,
  case when n_chars = 0 then 0.0 else tok_chars::double / n_chars end as alnum_ratio,
  (case when n >= 10 then 1.0 else n / 10.0 end)
    * (1.0 - case when n = 0 then 0.0 else n_stop::double / n end)
    * (case when n_chars = 0 then 0.0 else tok_chars::double / n_chars end)
    as score
from m
"""


def oracle_sql() -> dict[str, str]:
    sample = ", ".join(f"'{t}'" for t in SAMPLE_TERMS)
    w1, w2 = PHRASE.split()
    pw, pp = PHRASE_PREFIX.split()
    return {
        "term_stats": f"""
with {_TOK_CTE}
select term, count(distinct doc_id) as df, count(*) as ctf
from tok group by term
""",
        "sink_roundtrip": f"""
with {_TOK_CTE}
select term, count(distinct doc_id) as df, count(*) as ctf
from tok group by term
""",
        "compacted_term_stats": f"""
with docs_kept as (
  select * from documents where doc_id not in (1, 3, 5)
),
tok as (
  select doc_id,
         unnest({_TOK}) as term,
         generate_subscripts({_TOK}, 1) as pos
  from docs_kept
)
select term, count(distinct doc_id) as df, count(*) as ctf
from tok where length(term) > 1 and length(term) <= 128
group by term
""",
        # the index applies the reference's term-length filter (M5:
        # 1 < len <= 128) — the oracle mirrors it on the raw token stream
        "incremental_term_stats": f"""
with {_TOK_CTE}
select term, count(distinct doc_id) as df, count(*) as ctf
from tok where length(term) > 1 and length(term) <= 128
group by term
""",
        "token_count": f"""
select doc_id, len({_TOK}) as n_tokens from documents
""",
        "doc_lengths_index": f"""
select doc_id, len({_TOK}) as doc_len from documents
""",
        "postings_sample": f"""
with {_TOK_CTE}
select term, doc_id, count(*) as tf
from tok where term in ({sample})
group by term, doc_id
""",
        "positions_sample": f"""
with {_TOK_CTE}
select term, doc_id, pos
from tok where term in ({sample})
""",
        "proximity_search": f"""
with {_TOK_CTE},
a as (select doc_id, pos from tok where term = 'part'),
b as (select doc_id, pos from tok where term = 'filter')
select a.doc_id, min(abs(a.pos - b.pos))::bigint as min_dist
from a join b on b.doc_id = a.doc_id
group by a.doc_id
having min(abs(a.pos - b.pos)) <= 5
""",
        "bm25_topk": _bm25_sql(),
        "boosted_bm25_topk": _bm25_sql(
            boost_join=(
                f"join (select doc_id, case when lang = '{BOOST_LANG}' "
                f"then {BOOST_W} else 1.0 end as w from documents) bw "
                "on bw.doc_id = f.doc_id"
            ),
            boost_expr="bw.w",
            group_extra=", bw.w",
        ),
        "bm25_topk_filtered": _bm25_sql(
            extra_join=(
                "join documents dd on dd.doc_id = f.doc_id "
                f"and dd.lang = '{FILTER_LANG}'"
            )
        ),
        "incremental_bm25_topk": _bm25_sql(),
        "incremental_bm25_topk_actors": _bm25_sql(),
        "bm25_snippets": _bm25_snippets_sql(),
        "bm25_topk_by_range": _bm25_sql(),
        "dirichlet_topk": _dirichlet_sql(),
        "boolean_and": f"""
with {_TOK_CTE}
select doc_id from tok where term = 'scan'
intersect select doc_id from tok where term = 'join'
intersect select doc_id from tok where term = 'merge'
""",
        "boolean_or_not": f"""
with {_TOK_CTE}
(
  (select doc_id from tok where term = 'scan'
   intersect select doc_id from tok where term = 'join')
  except select doc_id from tok where term = 'merge'
)
union
(select doc_id from tok where term = 'filter'
 intersect select doc_id from tok where term = 'sort')
""",
        "prefix_search": f"""
with {_TOK_CTE}
(select distinct doc_id from tok
 where term like '{PREFIX}%' and len(term) between 2 and 128)
intersect select doc_id from tok where term = 'scan'
""",
        "phrase_search": f"""
with {_TOK_CTE}
select distinct a.doc_id
from tok a join tok b on a.doc_id = b.doc_id and b.pos = a.pos + 1
where a.term = '{w1}' and b.term = '{w2}'
""",
        "phrase_prefix_search": f"""
with {_TOK_CTE}
select distinct a.doc_id
from tok a join tok b on a.doc_id = b.doc_id and b.pos = a.pos + 1
where a.term = '{pw}'
  and b.term like '{pp}%' and len(b.term) between 2 and 128
""",
        "replyto_children": f"""
select o_orderkey as doc_id from orders where o_custkey = {REPLYTO_CUSTKEY}
""",
        "exact_dedup": """
select min(doc_id) as doc_id from documents group by text
""",
        "minhash_signatures": _minhash_sql(),
        "near_dup_pairs": _near_dup_sql(),
        "ngram_jaccard": _near_dup_sql(0.5),
        "simhash": _simhash_sql(),
        "lang_id": _lang_id_sql(),
        "quality_score": _quality_sql(),
        "fingerprint": f"""
with {_TOK_CTE},
f as (
  select doc_id,
    (sum((md5_number_lower(pos || ':' || term)
          & 9223372036854775807)::hugeint)
     % 2305843009213693951)::bigint as fp
  from tok group by doc_id
)
select d.doc_id, coalesce(f.fp, 0) as fp
from documents d left join f on d.doc_id = f.doc_id
""",
        "embedding_topk": """
with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
-- zero-vector convention: cosine vs the zero vector is 0 (orthogonal),
-- matching the engine; DuckDB's list_cosine_similarity returns -1 there
c as (
  select e.vec_id,
    case when list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0
              or (select list_dot_product(qv, qv) from q) = 0
         then 0.0
         else list_cosine_similarity(e.embedding::DOUBLE[], (select qv from q))
    end as rawcos
  from embeddings e
)
select vec_id, round(rawcos, 4) as cos
from c
order by rawcos desc, vec_id
limit 20
""",
        "ann_topk_checked": """
with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0),
c as (
  select e.vec_id,
    case when list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0
              or (select list_dot_product(qv, qv) from q) = 0
         then 0.0
         else list_cosine_similarity(e.embedding::DOUBLE[], (select qv from q))
    end as rawcos
  from embeddings e
)
select vec_id, round(rawcos, 4) as cos,
       true as ivf_recall_ok, true as pq_recall_ok, true as lsh_cos_exact
from c
order by rawcos desc, vec_id
limit 10
""",
        "events_window": """
select event_type,
       to_timestamp((epoch_us(ts) // 3600000000) * 3600000000 / 1000000)::timestamp as window_start,
       count(*) as n_events,
       sum(floor(value * 1000.0)::bigint)::bigint as sum_value_milli
from events group by event_type, window_start
""",
        "events_sliding_window": """
select event_type,
       to_timestamp(((epoch_us(ts) // 3600000000) - off.off) * 3600000000 / 1000000)::timestamp as window_start,
       count(*) as n_events,
       sum(floor(value * 1000.0)::bigint)::bigint as sum_value_milli
from events cross join (select unnest([0, 1]) as off) off
group by event_type, window_start
""",
        "embedding_cosine_pairs": """
with c as (
  select a.vec_id as vec_a, b.vec_id as vec_b,
    case when list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) = 0
              or list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0
         then 0.0
         else list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
    end as rawcos
  from embeddings a join embeddings b on a.vec_id < b.vec_id
)
select vec_a, vec_b, round(rawcos, 4) as cos from c where rawcos >= 0.4
""",
        "range_join": """
select e.event_id, count(*) as n_orders
from events e join orders o
  on o.o_totalprice >= e.value * 1000 and o.o_totalprice < e.value * 1000 + 5000
group by e.event_id
""",
        "distinct_users": """
select event_type, count(distinct user_id) as n_users
from events group by event_type
""",
        "hll_distinct_users_checked": """
select event_type, count(distinct user_id) as n_users,
       true as within_bound
from events group by event_type
""",
        "bloom_semi_join_checked": """
select c.c_custkey,
       case when exists (
         select 1 from events e where e.user_id = c.c_custkey
       ) then 1 else 0 end as has_events,
       true as no_false_negative
from customer c
order by c.c_custkey
""",
        "value_quantiles_checked": """
select event_type,
       quantile_disc(value, 0.50) as p50,
       quantile_disc(value, 0.90) as p90,
       quantile_disc(value, 0.99) as p99,
       true as within_bound
from events group by event_type
""",
        "asof_join": """
with pairs as (
  select e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() over (
           partition by e.event_id
           order by o.o_orderdate desc, o.o_orderkey desc
         ) as rn
  from events e
  join orders o on o.o_custkey = e.user_id and o.o_orderdate <= e.ts
)
select event_id, user_id, o_orderkey, o_totalprice from pairs where rn = 1
""",
        "asof_join_by_time": """
with pairs as (
  select e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() over (
           partition by e.event_id
           order by o.o_orderdate desc, o.o_orderkey desc
         ) as rn
  from events e
  join orders o on o.o_custkey = e.user_id and o.o_orderdate <= e.ts
)
select event_id, user_id, o_orderkey, o_totalprice from pairs where rn = 1
""",
        "group_adjacency": """
select o_custkey,
       string_agg(o_orderkey::varchar, ',' order by o_orderkey) as orderkeys
from orders group by o_custkey
""",
        "broadcast_join": """
select e.event_id, e.user_id, c.c_mktsegment,
       round(c.c_acctbal * 100)::bigint as acctbal_cents
from events e join customer c on c.c_custkey = e.user_id
""",
        "hash_sample": """
select doc_id from documents
where (md5_number_lower(doc_id::varchar) & 9223372036854775807) % 10 = 0
""",
        "topk_per_group": """
select lang, doc_id, n_chars, rnk from (
  select lang, doc_id, n_chars,
         row_number() over (
           partition by lang order by n_chars desc, doc_id asc
         ) as rnk
  from documents
) t where rnk <= 3
""",
        "semi_join": """
select c_custkey, round(c_acctbal * 100)::bigint as acctbal_cents
from customer c
where exists (select 1 from events e where e.user_id = c.c_custkey)
""",
        "anti_join": """
select c_custkey, round(c_acctbal * 100)::bigint as acctbal_cents
from customer c
where not exists (select 1 from events e where e.user_id = c.c_custkey)
""",
        "doclen_quantiles": """
with ranked as (
  select lang, n_chars,
         row_number() over (partition by lang order by n_chars) as rn,
         count(*) over (partition by lang) as n
  from documents
)
select lang,
  max(case when rn = (50 * n + 99) // 100 then n_chars end) as p50,
  max(case when rn = (90 * n + 99) // 100 then n_chars end) as p90,
  max(case when rn = (99 * n + 99) // 100 then n_chars end) as p99
from ranked group by lang
""",
        "top_bigram_frac": f"""
with {_TOK_CTE},
big as (
  select a.doc_id, a.term || ' ' || b.term as bg
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
cnt as (select doc_id, bg, count(*) as c from big group by doc_id, bg),
mx as (select doc_id, max(c) as topc from cnt group by doc_id),
nb as (
  select doc_id, greatest(len({_TOK}) - 1, 0) as n_bigrams from documents
)
select nb.doc_id, nb.n_bigrams,
       coalesce(mx.topc, 0)::bigint as top_bigram_count,
       case when nb.n_bigrams > 0
            then coalesce(mx.topc, 0)::double / nb.n_bigrams
            else 0.0 end as top_bigram_frac
from nb left join mx on nb.doc_id = mx.doc_id
""",
        "dedup_clusters": _dedup_clusters_sql(),
        "decontaminate": _decontaminate_sql(),
        "sessionize": """
with o as (
  select user_id, event_id, epoch_us(ts) as tu,
         lag(epoch_us(ts)) over (
           partition by user_id order by ts, event_id
         ) as prev
  from events
)
select user_id, event_id,
  (sum(case when prev is null or tu - prev > 43200000000
            then 1 else 0 end)
     over (partition by user_id order by tu, event_id
           rows between unbounded preceding and current row)
   - 1)::bigint as session_idx
from o
""",
        "sessionize_by_time": """
with o as (
  select user_id, event_id, epoch_us(ts) as tu,
         lag(epoch_us(ts)) over (
           partition by user_id order by ts, event_id
         ) as prev
  from events
)
select user_id, event_id,
  (sum(case when prev is null or tu - prev > 43200000000
            then 1 else 0 end)
     over (partition by user_id order by tu, event_id
           rows between unbounded preceding and current row)
   - 1)::bigint as session_idx
from o
""",
        "tfidf_topk_terms": f"""
with {_TOK_CTE},
tf as (select doc_id, term, count(*)::bigint as tf from tok
       group by doc_id, term),
df as (select term, count(distinct doc_id)::bigint as df from tok
       group by term),
nn as (select count(*)::double as n from documents),
sc as (select tf.doc_id, tf.term, tf.tf,
              tf.tf * ln((select n from nn) / df.df) as score
       from tf join df on df.term = tf.term),
rk as (select doc_id, term, tf, score,
              row_number() over (
                partition by doc_id order by score desc, term asc
              ) as rnk
       from sc)
select doc_id, term, tf, round(score, 4) as score, rnk
from rk where rnk <= 5
""",
        "split_assign": """
with b as (
  select doc_id,
    ((md5_number_lower(doc_id::varchar) & 9223372036854775807) % 100)::bigint
      as bucket
  from documents
)
select doc_id, bucket,
  case when bucket < 5 then 'test'
       when bucket < 10 then 'val'
       else 'train' end as split
from b
""",
        "stratified_sample": """
with b as (
  select doc_id, lang,
    ((md5_number_lower('strat:' || doc_id::varchar)
      & 9223372036854775807) % 100)::bigint as bucket
  from documents
)
select doc_id, lang from b
where bucket < case lang
  when 'en' then 10 when 'de' then 50 when 'es' then 50
  when 'fr' then 50 when 'zh' then 25 else 100 end
""",
        "top_ngrams": f"""
with {_TOK_CTE},
big as (
  select a.term || ' ' || b.term as bg
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
c as (select bg as ngram, count(*)::bigint as cnt from big group by bg),
r as (select ngram, cnt,
             row_number() over (order by cnt desc, ngram asc) as rnk
      from c)
select ngram, cnt, rnk from r where rnk <= 20
""",
        "countmin_top_ngrams_checked": f"""
with {_TOK_CTE},
big as (
  select a.term || ' ' || b.term as bg
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
c as (select bg as ngram, count(*)::bigint as cnt from big group by bg),
r as (select ngram, cnt,
             row_number() over (order by cnt desc, ngram asc) as rnk
      from c)
select ngram, cnt, rnk, true as sketch_ok from r where rnk <= 20
""",
        "pmi_bigrams": f"""
with {_TOK_CTE},
big as (
  select a.term as ta, b.term as tb
  from tok a join tok b on b.doc_id = a.doc_id and b.pos = a.pos + 1
),
bc as (select ta, tb, count(*)::bigint as cnt from big group by ta, tb),
uc as (select term, count(*)::bigint as cnt_u from tok group by term),
t as (select (select count(*) from tok)::double as n_uni,
             (select count(*) from big)::double as n_big)
select bc.ta || ' ' || bc.tb as ngram, bc.cnt as cnt,
  round(ln((bc.cnt::double * t.n_uni * t.n_uni)
           / (t.n_big * ua.cnt_u::double * ub.cnt_u::double)), 4) as pmi
from bc
cross join t
join uc ua on ua.term = bc.ta
join uc ub on ub.term = bc.tb
where bc.cnt >= 5
""",
        "weighted_sample": """
with b as (
  select doc_id, n_chars,
    ln((((md5_number_lower('wsample:' || doc_id::varchar)
          & 9223372036854775807) % 9007199254740991) + 1)::double
       / 9007199254740992.0) / n_chars::double as wkey
  from documents where n_chars > 0
),
r as (select doc_id, n_chars, wkey,
             row_number() over (order by wkey desc, doc_id asc) as rnk
      from b)
select doc_id, n_chars, round(wkey, 4) as wkey, rnk from r where rnk <= 20
""",
        "unigram_logprob": f"""
with {_TOK_CTE},
uc as (select term, count(*)::bigint as cnt_u from tok group by term),
t as (select count(*)::double as n_uni from tok),
lp as (select term,
              cast(round(ln(cnt_u::double / t.n_uni) * 10000.0) as bigint)
                as lp_e4
       from uc cross join t)
select tok.doc_id, count(*)::bigint as n_tokens,
       sum(lp.lp_e4)::bigint as logprob_e4
from tok join lp on lp.term = tok.term
group by tok.doc_id
""",
        "type_token_ratio": f"""
with {_TOK_CTE},
g as (select doc_id, count(*)::bigint as n_tokens,
             count(distinct term)::bigint as n_distinct
      from tok group by doc_id)
select doc_id, n_tokens, n_distinct,
       round(n_distinct::double / n_tokens::double, 4) as ttr
from g
""",
        "gopher_filter": f"""
with {_gopher_ctes()}
select doc_id, n as n_tokens, reasons, (reasons = 0)::bigint as keep
from gr
""",
        "curated_corpus": _curated_corpus_sql(),
        "running_totals": """
select user_id, event_id,
  sum(round(value * 100)::bigint) over (
    partition by user_id order by ts, event_id
    rows between unbounded preceding and current row
  )::bigint as running_cents
from events
""",
        "running_totals_by_time": """
select user_id, event_id,
  sum(round(value * 100)::bigint) over (
    partition by user_id order by ts, event_id
    rows between unbounded preceding and current row
  )::bigint as running_cents
from events
""",
        "event_type_pivot": """
select user_id,
  sum(case when event_type = 'click' then 1 else 0 end)::bigint as n_click,
  sum(case when event_type = 'error' then 1 else 0 end)::bigint as n_error,
  sum(case when event_type = 'purchase' then 1 else 0 end)::bigint
    as n_purchase,
  sum(case when event_type = 'signup' then 1 else 0 end)::bigint as n_signup,
  sum(case when event_type = 'view' then 1 else 0 end)::bigint as n_view
from events group by user_id
""",
        "lang_source_rollup": """
select coalesce(lang, 'ALL') as lang, coalesce(source, 'ALL') as source,
       count(*)::bigint as n, sum(n_chars)::bigint as chars
from documents group by rollup(lang, source)
""",
        "regex_features": r"""
select doc_id,
  len(regexp_extract_all(text, '[aeiou]{2}'))::bigint as n_double_vowel,
  len(regexp_extract_all(text, 'er'))::bigint as n_er,
  len(regexp_extract_all(text, '\ba\b'))::bigint as n_word_a
from documents
""",
        "json_props_stats": """
select event_type, count(*)::bigint as n,
  sum((props->>'$.k')::bigint)::bigint as sum_k,
  min((props->>'$.k')::bigint)::bigint as min_k,
  max((props->>'$.k')::bigint)::bigint as max_k
from events group by event_type
""",
        "poisson_sample": """
select doc_id, n_chars from documents
where ((md5_number_lower('poisson:' || doc_id::varchar)
        & 9223372036854775807) % 1000000) * 400 < n_chars * 1000000
""",
        "wildcard_search": f"""
with {_TOK_CTE}
(select distinct doc_id from tok
 where term like '{WILDCARD.replace("*", "%")}'
   and len(term) between 2 and 128)
intersect select doc_id from tok where term = 'data'
""",
        "regex_search": f"""
with {_TOK_CTE}
select distinct doc_id from tok
where regexp_matches(term, '^(?:{REGEX_QUERY})$')
  and len(term) between 2 and 128
""",
        "fuzzy_search": f"""
with {_TOK_CTE}
select distinct doc_id from tok
where levenshtein(term, '{FUZZY_WORD}') <= 1
  and len(term) between 2 and 128
""",
        "spell_suggest": f"""
with {_TOK_CTE},
vocab as (
  select term, count(distinct doc_id) as df
  from tok where length(term) > 1 and length(term) <= 128
  group by term
)
select term, levenshtein(term, '{SPELL_WORD}')::bigint as dist,
       df::bigint as df
from vocab
where levenshtein(term, '{SPELL_WORD}') <= 2 and term <> '{SPELL_WORD}'
order by dist, df desc, term
limit 10
""",
        "facet_counts": f"""
with {_TOK_CTE},
m as (select doc_id from tok where term = 'scan'
      intersect select doc_id from tok where term = 'join')
select d.lang, d.source, count(*)::bigint as n_docs
from documents d join m on d.doc_id = m.doc_id
group by d.lang, d.source
""",
        "dedup_spans": f"""
with {_TOK_CTE},
spans as (
  select doc_id, (pos - 1) // {dp.SPAN_W} as chunk_idx,
         string_agg(term, ' ' order by pos) as span
  from tok group by doc_id, (pos - 1) // {dp.SPAN_W}
),
flagged as (
  select doc_id,
         (row_number() over (partition by span order by doc_id, chunk_idx)
          > 1)::int as dup
  from spans
)
select doc_id, count(*)::bigint as n_spans, sum(dup)::bigint as n_dup_spans
from flagged group by doc_id
""",
        "rep_ngram_frac": f"""
with {_TOK_CTE},
g as (
  select doc_id,
         term || ' ' || lead(term, 1) over w || ' ' || lead(term, 2) over w
              || ' ' || lead(term, 3) over w || ' ' || lead(term, 4) over w
           as gram
  from tok
  window w as (partition by doc_id order by pos)
)
select doc_id, count(*)::bigint as n_grams,
       round((count(*) - count(distinct gram)) / count(*)::double, 4)
         as rep_frac
from g where gram is not null
group by doc_id
""",
        "hash_join": """
select o.o_orderkey, o.o_custkey, c.c_name,
       round(o.o_totalprice * 100)::bigint as price_cents
from orders o join customer c on c.c_custkey = o.o_custkey
""",
        "chunk_documents": f"""
with {_TOK_CTE},
lens as (select doc_id, max(pos) as n from tok group by doc_id),
starts as (
  select doc_id, unnest(range(0, n, {dp.CHUNK_STRIDE})) as start from lens
)
select s.doc_id, s.start // {dp.CHUNK_STRIDE} as chunk_idx,
       count(*)::bigint as n_tokens,
       string_agg(t.term, ' ' order by t.pos) as chunk_text
from starts s
join tok t on t.doc_id = s.doc_id
  and t.pos > s.start and t.pos <= s.start + {dp.CHUNK_W}
group by s.doc_id, s.start
""",
        "bpe_token_count": f"""
select doc_id,
  len(regexp_extract_all(text,
      '{dp.BPE_PATTERN.replace("'", "''")}'))::bigint as n_bpe_tokens,
  round(n_chars / len(regexp_extract_all(text,
      '{dp.BPE_PATTERN.replace("'", "''")}'))::double, 4)
    as chars_per_token
from documents
where len(regexp_extract_all(text,
      '{dp.BPE_PATTERN.replace("'", "''")}')) > 0
""",
        "event_value_delta": """
select event_id, user_id,
  round(value - lag(value) over
          (partition by user_id order by ts, event_id), 4) as delta
from events
qualify lag(value) over
          (partition by user_id order by ts, event_id) is not null
""",
        "more_like_this": _mlt_sql(),
        "pricing_summary": f"""
with l as (
  select l_returnflag, l_linestatus,
         floor(l_quantity * 100 + 0.5)::bigint as qty_c,
         floor(l_extendedprice * 100 + 0.5)::bigint as price_c,
         floor(l_discount * 10000 + 0.5)::bigint as disc_bp
  from lineitem
  where l_shipdate <= timestamp '{rel.PRICING_CUTOFF}'
)
select l_returnflag, l_linestatus,
  round(sum(qty_c) / 100.0, 4) as sum_qty,
  round(sum(price_c) / 100.0, 4) as sum_base_price,
  round(sum(price_c * (10000 - disc_bp)) / 1000000.0, 4) as sum_disc_price,
  round(sum(qty_c)::double / (100 * count(*)), 4) as avg_qty,
  round(sum(price_c)::double / (100 * count(*)), 4) as avg_price,
  round(sum(disc_bp)::double / (10000 * count(*)), 4) as avg_disc,
  count(*)::bigint as count_order
from l
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
""",
        "top_revenue_orders": f"""
select o.o_orderkey,
  round(sum(floor(l.l_extendedprice * 100 + 0.5)::bigint
            * (10000 - floor(l.l_discount * 10000 + 0.5)::bigint))
        / 1000000.0, 4) as revenue,
  epoch_us(o.o_orderdate) as odate_us,
  o.o_orderpriority
from customer c
join orders o on o.o_custkey = c.c_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
where c.c_mktsegment = '{rel.Q3_SEGMENT}'
  and o.o_orderdate < timestamp '{rel.Q3_DATE}'
  and l.l_shipdate > timestamp '{rel.Q3_DATE}'
group by o.o_orderkey, o.o_orderdate, o.o_orderpriority
order by sum(floor(l.l_extendedprice * 100 + 0.5)::bigint
             * (10000 - floor(l.l_discount * 10000 + 0.5)::bigint)) desc,
         o.o_orderkey
limit {rel.Q3_TOPN}
""",
        "revenue_by_nation": f"""
with rev as (
  select l_orderkey,
         sum(floor(l_extendedprice * 100 + 0.5)::bigint
             * (10000 - floor(l_discount * 10000 + 0.5)::bigint)) as rev_e6
  from lineitem group by l_orderkey
)
select n.n_name, round(sum(r.rev_e6) / 1000000.0, 4) as revenue
from rev r
join orders o on o.o_orderkey = r.l_orderkey
join customer c on c.c_custkey = o.o_custkey
join nation n on n.n_nationkey = c.c_nationkey
where o.o_orderdate >= timestamp '{rel.Q5_LO}'
  and o.o_orderdate < timestamp '{rel.Q5_HI}'
group by n.n_name
""",
        "mode_event_type": """
with c as (
  select user_id, event_type, count(*)::bigint as n
  from events group by user_id, event_type
)
select user_id, event_type as mode_type, n as n_events
from c
qualify row_number() over (
  partition by user_id order by n desc, event_type
) = 1
""",
        "group_quantiles": """
select event_type,
  round(quantile_cont(value, 0.25), 4) as p25,
  round(quantile_cont(value, 0.50), 4) as p50,
  round(quantile_cont(value, 0.75), 4) as p75,
  round(quantile_cont(value, 0.95), 4) as p95
from events group by event_type
""",
        "char_entropy": """
select doc_id, round(entropy(c), 4) as h
from (
  select doc_id, unnest(string_split(text, '')) as c from documents
)
group by doc_id
""",
        "revenue_band_filter": f"""
select
  round(coalesce(sum(floor(l_extendedprice * 100 + 0.5)::bigint
                     * floor(l_discount * 10000 + 0.5)::bigint), 0)
        / 1000000.0, 4) as revenue,
  count(*)::bigint as n_lines
from lineitem
where l_shipdate >= timestamp '{rel.Q6_LO}'
  and l_shipdate < timestamp '{rel.Q6_HI}'
  and floor(l_discount * 10000 + 0.5)::bigint
        between {rel.Q6_DISC_LO_BP} and {rel.Q6_DISC_HI_BP}
  and l_quantity < {rel.Q6_QTY_LT}
""",
        "priority_line_counts": f"""
select l.l_returnflag,
  sum(case when o.o_orderpriority in {rel.Q12_HIGH}
      then 1 else 0 end)::bigint as high_line_count,
  sum(case when o.o_orderpriority in {rel.Q12_HIGH}
      then 0 else 1 end)::bigint as low_line_count
from lineitem l
join orders o on o.o_orderkey = l.l_orderkey
where l.l_shipdate >= timestamp '{rel.Q12_LO}'
  and l.l_shipdate < timestamp '{rel.Q12_HI}'
group by l.l_returnflag
""",
        "pii_scrub": _pii_sql(),
        "prf_bm25_topk": _prf_sql(),
        "ordered_proximity_search": f"""
with {_TOK_CTE},
a as (select doc_id, pos from tok where term = 'part'),
b as (select doc_id, pos from tok where term = 'filter')
select a.doc_id, min(b.pos - a.pos)::bigint as min_dist
from a join b on b.doc_id = a.doc_id and b.pos > a.pos
group by a.doc_id
having min(b.pos - a.pos) <= 5
""",
        "value_zscore_outliers": f"""
with q as (
  select event_id, event_type,
         floor(value * {dp._ZQ} + 0.5)::bigint as vq
  from events
),
s as (
  select event_type, count(*)::bigint as n,
         sum(vq)::bigint as sv, sum(vq * vq)::bigint as sq
  from q group by event_type
)
select q.event_id, q.event_type,
  round((q.vq - sv::double / n)
        / sqrt(sq::double / n - (sv::double / n) * (sv::double / n)),
        4) as z
from q join s using (event_type)
where abs((q.vq - sv::double / n)
          / sqrt(sq::double / n - (sv::double / n) * (sv::double / n)))
      >= {dp.ZSCORE_CUT}
""",
        "pagerank": _pagerank_sql(),
        "triangle_count": """
with d as (
  select a.o_custkey as x, b.o_custkey as y
  from orders a join orders b on b.o_orderkey = a.o_orderkey + 1
  where a.o_custkey <> b.o_custkey
),
e as (select distinct least(x, y) as u, greatest(x, y) as v from d)
select count(*)::bigint as n_triangles
from e e1
join e e2 on e2.u = e1.u and e2.v > e1.v
join e e3 on e3.u = e1.v and e3.v = e2.v
""",
        "cohort_retention": f"""
with f as (
  select user_id, min(epoch_us(ts) // {dp.WEEK_US}) as cohort_week
  from events group by user_id
)
select f.cohort_week::bigint as cohort_week,
       (epoch_us(e.ts) // {dp.WEEK_US})::bigint as event_week,
       count(distinct e.user_id)::bigint as n_users
from events e join f on f.user_id = e.user_id
group by 1, 2
""",
        "funnel_counts": f"""
with s1 as (
  select user_id, min(epoch_us(ts)) as t1 from events
  where event_type = '{dp.FUNNEL_STEPS[0]}' group by user_id
),
s2 as (
  select e.user_id, min(epoch_us(e.ts)) as t2
  from events e join s1 on s1.user_id = e.user_id
  where e.event_type = '{dp.FUNNEL_STEPS[1]}' and epoch_us(e.ts) > s1.t1
  group by e.user_id
),
s3 as (
  select e.user_id, min(epoch_us(e.ts)) as t3
  from events e join s2 on s2.user_id = e.user_id
  where e.event_type = '{dp.FUNNEL_STEPS[2]}' and epoch_us(e.ts) > s2.t2
  group by e.user_id
)
select 1::bigint as step, '{dp.FUNNEL_STEPS[0]}' as event_type,
       count(*)::bigint as n_users from s1
union all
select 2::bigint, '{dp.FUNNEL_STEPS[1]}', count(*)::bigint from s2
union all
select 3::bigint, '{dp.FUNNEL_STEPS[2]}', count(*)::bigint from s3
""",
        "doc_rank_by_length": """
select doc_id, n_chars,
       row_number() over (order by n_chars, doc_id)::bigint as rnk
from documents
""",
        "doc_ntile_by_length": f"""
select doc_id, n_chars,
       ntile({dp.NTILE_K}) over (order by n_chars, doc_id)::bigint as tile
from documents
""",
        "orders_per_customer_histogram": """
select n as n_orders, count(*)::bigint as n_customers
from (select o_custkey, count(*)::bigint as n from orders group by 1)
group by n
""",
        "lead_event_gap": """
select event_id, user_id, gap_us from (
  select event_id, user_id,
         (lead(epoch_us(ts)) over (partition by user_id
                                   order by ts, event_id)
          - epoch_us(ts))::bigint as gap_us
  from events
) t where gap_us is not null
""",
        "dow_hour_heatmap": """
select ((epoch_us(ts) // 86400000000) + 4) % 7 as dow,
       (epoch_us(ts) % 86400000000) // 3600000000 as hour,
       count(*)::bigint as n_events
from events group by 1, 2
""",
        "event_transition_matrix": """
with seq as (
  select user_id, event_type,
         lead(event_type) over (partition by user_id
                                order by ts, event_id) as nxt
  from events
)
select event_type as from_type, nxt as to_type, count(*)::bigint as n
from seq where nxt is not null
group by 1, 2
""",
        "asof_join_forward": """
with pairs as (
  select o.o_orderkey, l.l_linenumber,
         epoch_us(l.l_shipdate)::bigint as ship_us,
         floor(l.l_extendedprice * 100.0 + 0.5)::bigint as price_cents,
         row_number() over (
           partition by o.o_orderkey
           order by l.l_shipdate asc, l.l_linenumber asc,
                    floor(l.l_extendedprice * 100.0 + 0.5) asc
         ) as rn
  from orders o
  join lineitem l on l.l_orderkey = o.o_orderkey
                 and l.l_shipdate >= o.o_orderdate
)
select o_orderkey, l_linenumber, ship_us, price_cents
from pairs where rn = 1
""",
        "asof_join_forward_by_time": """
with pairs as (
  select o.o_orderkey, l.l_linenumber,
         epoch_us(l.l_shipdate)::bigint as ship_us,
         floor(l.l_extendedprice * 100.0 + 0.5)::bigint as price_cents,
         row_number() over (
           partition by o.o_orderkey
           order by l.l_shipdate asc, l.l_linenumber asc,
                    floor(l.l_extendedprice * 100.0 + 0.5) asc
         ) as rn
  from orders o
  join lineitem l on l.l_orderkey = o.o_orderkey
                 and l.l_shipdate >= o.o_orderdate
)
select o_orderkey, l_linenumber, ship_us, price_cents
from pairs where rn = 1
""",
        "data_audit": """
select count(*)::bigint as n_rows,
       coalesce(sum(case when text is null then 1 else 0 end), 0)::bigint
         as n_null_text,
       coalesce(sum(case when text = '' then 1 else 0 end), 0)::bigint
         as n_empty_text,
       count(distinct doc_id)::bigint as n_distinct_doc_id,
       (count(*) - count(distinct doc_id))::bigint as n_dup_doc_id,
       coalesce(min(doc_id), 0)::bigint as min_doc_id,
       coalesce(max(doc_id), 0)::bigint as max_doc_id
from documents
""",
        "value_time_corr": f"""
with q as (
  select event_type,
         floor(value * 10000.0 + 0.5)::bigint as x,
         ((epoch_us(ts) - {dp.CORR_EPOCH0_US}) // 3600000000)::bigint as y
  from events
),
m as (
  select event_type, count(*)::bigint as n,
         sum(x)::bigint as sx, sum(y)::bigint as sy,
         sum(x * y)::bigint as sxy,
         sum(x * x)::bigint as sxx, sum(y * y)::bigint as syy
  from q group by event_type
)
select event_type,
       round((n::double * sxy - sx::double * sy)
             / sqrt((n::double * sxx - sx::double * sx)
                    * (n::double * syy - sy::double * sy)), 4) as corr
from m
where (n::double * sxx - sx::double * sx) > 0
  and (n::double * syy - sy::double * sy) > 0
""",
        "winsorize_values": f"""
with t as (
  select event_type,
         round(quantile_cont(value, {dp.WINSOR_LO}), 4) as lo,
         round(quantile_cont(value, {dp.WINSOR_HI}), 4) as hi
  from events group by event_type
)
select e.event_id, e.event_type,
       round(least(greatest(e.value, t.lo), t.hi), 4) as value_w
from events e join t on t.event_type = e.event_type
""",
        "normalize_text": r"""
select doc_id,
       trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g'), ' ')
         as text_norm
from documents
""",
        "first_event_per_user_type": """
select user_id, event_type, event_id, ts from (
  select user_id, event_type, event_id, ts,
         row_number() over (partition by user_id, event_type
                            order by ts, event_id) as rn
  from events
) t where rn = 1
""",
        "user_moving_avg": f"""
with q as (
  select event_id, user_id, ts,
         floor(value * 1000.0 + 0.5)::bigint as vm
  from events
),
w as (
  select event_id, user_id,
    sum(vm) over (partition by user_id order by ts, event_id
                  rows between {dp.MAVG_W - 1} preceding and current row
                 )::bigint as sw,
    count(*) over (partition by user_id order by ts, event_id
                   rows between {dp.MAVG_W - 1} preceding and current row
                  )::bigint as cnt
  from q
)
select event_id, user_id, sw as win_sum_milli, cnt as win_n,
       round((sw::double / cnt) / 1000.0, 4) as mavg
from w
""",
        "big_orders": f"""
with s as (
  select l_orderkey,
         sum(floor(l_quantity * 100.0 + 0.5)::bigint)::bigint
           as sum_qty_cents
  from lineitem group by l_orderkey
  having sum(floor(l_quantity * 100.0 + 0.5)::bigint) > {rel.Q18_QTY_CENTS}
)
select c.c_custkey, c.c_name, o.o_orderkey,
       floor(o.o_totalprice * 100.0 + 0.5)::bigint as totalprice_cents,
       s.sum_qty_cents
from s
join orders o on o.o_orderkey = s.l_orderkey
join customer c on c.c_custkey = o.o_custkey
""",
        # rows-only (bloom_semi_join is approximate: one-sided error,
        # FP-rate pytest-gated) (approximate / stateful / stemmer-dependent):
        # bm25_topk_stemmed, reference_queryset_stemmed,
        # index_segment_stats_stemmed, embedding_lsh_topk,
        # embedding_ivf_topk, embedding_pq_topk, embed_then_topk,
        # media_decode, media_pipeline, hll_distinct_users — the
        # *_checked forms (hll_distinct_users_checked,
        # countmin_top_ngrams_checked, value_quantiles_checked) carry
        # exact values + error-bound flags and ARE oracle-gated above
    }
