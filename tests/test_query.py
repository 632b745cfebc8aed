"""Query parser + engine vs oracle: boolean/phrase/prefix sets and
rank-identical top-k (SURVEY.md §5.2; FIXTURES.md §4)."""

import os

import numpy as np
import pytest

from informationretrieval_en_people_cn_ray.corpus import write_corpus
from informationretrieval_en_people_cn_ray.oracle import OracleIndex
from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)
from informationretrieval_en_people_cn_ray.queryparse import (
    QueryParseError,
    parse,
)

N_DOCS = 150
SEED = 13


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qcorpus"))
    write_corpus(d, N_DOCS, seed=SEED, num_parquet_files=2)
    return d


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    return OracleIndex.from_corpus(corpus_dir)


@pytest.fixture(scope="module")
def engine(ray_session, corpus_dir, tmp_path_factory):
    from informationretrieval_en_people_cn_ray.pipelines.search import SearchEngine

    d = str(tmp_path_factory.mktemp("qindex"))
    build_index(corpus_dir, d, BuildConfig(num_segments=5, docstat_partitions=2))
    return SearchEngine(d, mode="local")


# ---------------- parser ----------------


def test_parse_kinds():
    p = parse("election")
    assert p.kind == "ranked" and p.tokens[0].kind == "keyword"
    p = parse("military conflict")
    assert p.kind == "ranked" and len(p.tokens) == 2
    p = parse("'german chancellor'")
    assert p.tokens[0].kind == "phrase" and p.tokens[0].value == "german chancellor"
    p = parse("isra*")
    assert p.tokens[0].kind == "prefix" and p.tokens[0].value == "isra"
    p = parse("'new ye'*")
    assert p.tokens[0].kind == "phrase_prefix" and p.tokens[0].value == "new ye"
    p = parse("ReplyTo:107701851")
    assert p.tokens[0].kind == "replyto" and p.tokens[0].value == "107701851"


def test_parse_boolean():
    p = parse("brexit AND economy")
    assert p.kind == "boolean"
    assert [t.value for t in p.groups[0].positive] == ["brexit", "economy"]
    p = parse("jared NOT kushner")
    assert [t.value for t in p.groups[0].positive] == ["jared"]
    assert [t.value for t in p.groups[0].negative] == ["kushner"]
    p = parse("eu OR 'european union'")
    assert len(p.groups) == 2 and p.groups[1].positive[0].kind == "phrase"
    p = parse("trump AND putin AND merkel AND xi")
    assert len(p.groups[0].positive) == 4
    p = parse("merkel NOT chancel*")
    assert p.groups[0].negative[0].kind == "prefix"


def test_parse_errors():
    with pytest.raises(QueryParseError):
        parse("NOT apple")  # all-negated AND group
    with pytest.raises(QueryParseError):
        parse("a OR NOT b")  # NOT directly under OR
    with pytest.raises(QueryParseError):
        parse("a AND")  # dangling operator
    with pytest.raises(QueryParseError):
        parse("OR a")
    with pytest.raises(QueryParseError):
        parse("")


# ---------------- engine vs oracle ----------------


def _ids(arr):
    return sorted(int(x) for x in arr)


def test_keyword_set(engine, oracle):
    for w in ["the", "data", "running", "characters", "zzzznope"]:
        got = _ids(engine.search(f"{w} AND {w}"))
        assert got == sorted(oracle.keyword_set(w)), w


def test_boolean_combos(engine, oracle):
    a, b, c = "data", "value", "result"
    assert _ids(engine.search(f"{a} AND {b}")) == sorted(
        oracle.keyword_set(a) & oracle.keyword_set(b)
    )
    assert _ids(engine.search(f"{a} OR {b}")) == sorted(
        oracle.keyword_set(a) | oracle.keyword_set(b)
    )
    assert _ids(engine.search(f"{a} NOT {b}")) == sorted(
        oracle.keyword_set(a) - oracle.keyword_set(b)
    )
    got = _ids(engine.search(f"{a} AND {b} NOT {c} OR {c} AND {a}"))
    exp = sorted(
        (oracle.keyword_set(a) & oracle.keyword_set(b) - oracle.keyword_set(c))
        | (oracle.keyword_set(c) & oracle.keyword_set(a))
    )
    assert got == exp


def test_prefix_set(engine, oracle):
    for p in ["th", "run", "q", "zz"]:
        got = _ids(engine.search(f"{p}* AND {p}*"))
        assert got == sorted(oracle.prefix_set(p)), p


def test_phrase_set(engine, oracle):
    phrase = "quoted string"  # corpus spice line: 'x = "quoted, string!" ...'
    got = _ids(engine.search(f"'{phrase}' AND '{phrase}'"))
    exp = sorted(oracle.phrase_set(phrase))
    assert got == exp and len(exp) > 0
    # non-adjacent pair must NOT match as a phrase
    got2 = _ids(engine.search("'string quoted' AND 'string quoted'"))
    assert got2 == sorted(oracle.phrase_set("string quoted"))


def test_phrase_prefix_set(engine, oracle):
    got = _ids(engine.search("'quoted str'* AND 'quoted str'*"))
    exp = sorted(oracle.phrase_prefix_set("quoted str"))
    assert got == exp and len(exp) > 0


def test_bm25_rank_identity(engine, oracle):
    for q in ["data value result", "the running characters", "import class name"]:
        for k in [3, 10, None]:
            ids, scores = engine.search(q, k=k, scorer="bm25")
            exp = oracle.bm25(q, k=k)
            assert [int(i) for i in ids] == [d for d, _ in exp], (q, k)
            assert np.allclose(scores, [s for _, s in exp], atol=1e-9), (q, k)


def test_dirichlet_rank_identity(engine, oracle):
    for q in ["data value result", "import class name"]:
        ids, scores = engine.search(q, k=10, scorer="dirichlet")
        exp = oracle.dirichlet(q, k=10)
        assert [int(i) for i in ids] == [d for d, _ in exp], q
        assert np.allclose(scores, [s for _, s in exp], atol=1e-9), q


def test_dirichlet_cutoff_drops_hot_term(engine, oracle):
    """'the' exceeds C/100 in the Zipf corpus → skipped by the reference's
    frequent-term rule; both sides must agree."""
    assert oracle.ctf("the") > oracle.C * 0.01
    ids, scores = engine.search("the data", k=5, scorer="dirichlet")
    exp = oracle.dirichlet("the data", k=5)
    assert [int(i) for i in ids] == [d for d, _ in exp]


def test_ranked_phrase_query(engine, oracle):
    """Single-phrase ranked query: candidates = phrase set, scored by the
    phrase's terms (reference SearchEngine.py:274-279 semantics)."""
    ids, scores = engine.search("'quoted string'", k=10, scorer="bm25")
    cand = oracle.phrase_set("quoted string")
    assert set(int(i) for i in ids) <= cand
    assert len(ids) == min(10, len(cand))
    # scores must equal BM25 restricted to those candidates
    full = dict(oracle.bm25("quoted string", k=None))
    for i, s in zip(ids, scores):
        assert abs(full[int(i)] - s) < 1e-9


def test_actor_mode_matches_local(ray_session, engine, corpus_dir, tmp_path_factory):
    from informationretrieval_en_people_cn_ray.pipelines.search import SearchEngine

    eng2 = SearchEngine(engine.local.index_dir, mode="actors", num_actors=2)
    for q in ["data value result", "th* AND data", "'quoted string' AND the"]:
        a = engine.search(q, k=10)
        b = eng2.search(q, k=10)
        if isinstance(a, tuple):
            assert [int(x) for x in a[0]] == [int(x) for x in b[0]]
            assert np.allclose(a[1], b[1], atol=0)
        else:
            assert _ids(a) == _ids(b)
    # pruned path in actor mode: meta + block-selective decode are
    # answered by the segment-owner actors and must stay rank-identical
    for q in ["the data value", "data-value result", "quoted the"]:
        a = engine.search(q, k=5, prune=True)
        b = eng2.search(q, k=5, prune=True)
        assert [int(x) for x in a[0]] == [int(x) for x in b[0]]
        assert np.allclose(a[1], b[1], atol=0)


def test_search_many_dataset(ray_session, engine):
    from informationretrieval_en_people_cn_ray.pipelines.search import search_many

    qs = ["data value result", "data AND value"]
    out = search_many(engine.local.index_dir, qs, k=5).to_pandas()
    assert set(out["query"]) == set(qs)
    ranked = out[out["query"] == qs[0]].sort_values("rank")
    ids, scores = engine.search(qs[0], k=5)
    assert ranked["doc_id"].tolist() == [int(x) for x in ids]


def test_maxscore_pruned_identical(engine, oracle):
    """MaxScore pruning must be invisible: identical doc ids AND scores
    (SURVEY R1 rank-identity; north_star pruned-BM25)."""
    queries = [
        "data value result",
        "the running characters",   # hot + rare mix
        "import class name the",
        "data",                      # single term
        "zzznope data",              # one missing term
        "data data value",           # duplicated query term
        # keywords analyzing to MULTIPLE index terms ('data-value' →
        # ['data', 'valu']): only the first term generates candidates in
        # ranked(); the pruned path must agree (candidate-universe parity)
        "data-value result",
        "running-characters the",
        "the-self",                  # hot multi-term keyword alone
    ]
    for q in queries:
        for k in (1, 3, 10, 50):
            a_ids, a_sc = engine.search(q, k=k, scorer="bm25")
            b_ids, b_sc = engine.search(q, k=k, scorer="bm25", prune=True)
            assert [int(x) for x in a_ids] == [int(x) for x in b_ids], (q, k)
            assert np.allclose(a_sc, b_sc, atol=0), (q, k)


def test_block_selective_decode(ray_session, tmp_path_factory):
    """v4 skip blocks: a narrow candidate set against a hot term decodes
    only the touched 128-doc blocks (the dense-candidate fallback needs
    > 4 blocks to stay out of the way), with tfs identical to a full
    decode."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    cd = str(tmp_path_factory.mktemp("blkcorpus"))
    write_corpus(cd, 800, seed=5, num_parquet_files=2)
    d_idx = str(tmp_path_factory.mktemp("blkindex"))
    build_index(cd, d_idx, BuildConfig(num_segments=3, docstat_partitions=2))
    eng = SearchEngine(d_idx)
    p = eng._postings_map(["the"])["the"]
    assert len(p.doc_ids) > 512  # spans ≥ 5 skip blocks
    fresh = SearchEngine(d_idx)  # no decode cache
    cand = np.asarray(p.doc_ids[:3])
    d, tf = fresh.local.postings_for_docs("the", cand)
    assert set(cand.tolist()) <= set(d.tolist())
    assert len(d) <= 128  # only the first block was decoded
    m = dict(zip(p.doc_ids.tolist(), p.tfs.tolist()))
    assert all(m[int(x)] == int(t) for x, t in zip(d, tf))
    # dense candidates on the same fresh reader fall back to a full
    # (cached) decode and still agree
    d2, tf2 = fresh.local.postings_for_docs("the", p.doc_ids)
    assert d2.tolist() == p.doc_ids.tolist()
    assert tf2.tolist() == p.tfs.tolist()


def test_blockmax_bounded_decode(ray_session, tmp_path_factory):
    """Block-max skip lever: ``postings_blocks_bounded`` decodes only
    blocks whose max_tf reaches the threshold, loses no posting at or
    above it, and the pruned ranked path decodes measurably fewer blocks
    than the query terms hold while staying rank-identical."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )
    from informationretrieval_en_people_cn_ray.stages.postings import (
        term_seg,
    )

    cd = str(tmp_path_factory.mktemp("bmxcorpus"))
    write_corpus(cd, 800, seed=5, num_parquet_files=2)
    d_idx = str(tmp_path_factory.mktemp("bmxindex"))
    build_index(cd, d_idx, BuildConfig(num_segments=3, docstat_partitions=2))

    eng = SearchEngine(d_idx)
    p = eng._postings_map(["the"])["the"]
    fresh = SearchEngine(d_idx)  # no decode cache
    r = fresh.local.reader(term_seg("the", fresh.local.num_segments))
    lo, hi = r.term_range("the")
    mtfs = np.concatenate(
        [r.blob_meta(i)["max_tfs"] for i in range(lo, hi)]
    )
    assert len(mtfs) >= 5
    thr = int(np.median(mtfs)) + 1
    d, tf, dec, tot = fresh.local.postings_blocks_bounded("the", thr)
    assert tot == len(mtfs)
    assert dec == int((mtfs >= thr).sum()) and dec < tot
    # decoded (doc, tf) pairs agree with the full decode...
    full = dict(zip(p.doc_ids.tolist(), p.tfs.tolist()))
    assert all(full[int(x)] == int(t) for x, t in zip(d, tf))
    # ...and no posting with tf >= thr was lost (the soundness direction)
    kept = set(int(x) for x in d)
    for doc, t in zip(p.doc_ids.tolist(), p.tfs.tolist()):
        if t >= thr:
            assert doc in kept

    # end-to-end: pruned == unpruned on a rare+hot query, with fewer
    # blocks decoded than the query terms hold in total
    a_ids, a_sc = SearchEngine(d_idx).search("quoted the", k=3)
    pruned = SearchEngine(d_idx)
    b_ids, b_sc = pruned.search("quoted the", k=3, prune=True)
    assert [int(x) for x in a_ids] == [int(x) for x in b_ids]
    assert np.allclose(a_sc, b_sc, atol=0)
    total_blocks = 0
    for t in ("quot", "the"):
        rr = pruned.local.reader(term_seg(t, pruned.local.num_segments))
        rng = rr.term_range(t)
        if rng:
            total_blocks += sum(
                len(rr.blob_meta(i)["max_tfs"]) for i in range(*rng)
            )
    c = pruned.prune_counters
    assert c["blocks_decoded"] < total_blocks, c


def test_maxscore_prunes_hot_terms(engine):
    """With a rare term dominating, the hot term's unique docs are never
    scored (observable via fewer scored docs than the candidate union)."""
    from informationretrieval_en_people_cn_ray.queryparse import parse

    plan = parse("quoted the")  # 'quot' rare (every 5th doc), 'the' ~all docs
    full_ids, _ = engine.ranked(plan, k=None)
    ids, sc = engine.ranked_pruned(plan, k=3)
    a_ids, a_sc = engine.ranked(plan, k=3)
    assert [int(x) for x in ids] == [int(x) for x in a_ids]
    assert np.allclose(sc, a_sc, atol=0)


def test_ranked_by_range_identical(ray_session, engine, oracle):
    """Score-by-doc-range (shard actors own the docstat partitions) must
    be invisible: identical ids AND scores vs the local scorer, across
    k values, hot/rare mixes and multi-term keywords."""
    queries = [
        "data value result",
        "the running characters",
        "data",
        "zzznope data",
        "data data value",
        "data-value result",
    ]
    for q in queries:
        plan = parse(q)
        for k in (1, 5, 50, None):
            a_ids, a_sc = engine.ranked(plan, k=k)
            b_ids, b_sc = engine.ranked_by_range(plan, k=k)
            assert [int(x) for x in a_ids] == [int(x) for x in b_ids], (q, k)
            assert np.allclose(a_sc, b_sc, atol=0), (q, k)


def test_bm25_snippets_window(ray_session, tmp_path):
    """Snippet = 7-token window centered on the FIRST query-term match,
    clamped at document edges."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    d = str(tmp_path)
    texts = [
        "scan a b c d e f g",             # match at pos 0 → left-clamped
        "w1 w2 w3 w4 w5 join x1 x2 x3 x4",  # match mid → full window
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s", "s"], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    t = entrymod.queries()["bm25_snippets"](d)
    snip = dict(zip(t["doc_id"].to_pylist(), t["snippet"].to_pylist()))
    assert snip[0] == "scan a b c"                  # pos 0: 0..+3
    assert snip[1] == "w3 w4 w5 join x1 x2 x3"      # pos 5: ±3


def test_proximity_planted(ray_session, tmp_path):
    """NEAR/k semantics on hand-placed positions: distances are token
    offsets, unordered, per-doc minimum, threshold inclusive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    texts = [
        "alpha xx xx beta",        # dist 3
        "beta alpha",              # dist 1 (unordered)
        "alpha xx xx xx xx beta",  # dist 5
        "alpha only here",         # no beta
        "beta only here",          # no alpha
        "xx alpha beta xx alpha",  # dist 1 (min of 1, 2)
    ]
    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        pa.table({"content": pa.array(texts, pa.string())}),
        os.path.join(c, "p.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=1,
                                    stem=False))
    eng = SearchEngine(idx, mode="local")
    ids, dist = eng.proximity("alpha", "beta", within=3)
    assert dict(zip(ids.tolist(), dist.tolist())) == {0: 3, 1: 1, 5: 1}
    ids5, dist5 = eng.proximity("alpha", "beta", within=5)
    assert dict(zip(ids5.tolist(), dist5.tolist())) == {
        0: 3, 1: 1, 2: 5, 5: 1
    }
    ids0, _ = eng.proximity("alpha", "missing", within=9)
    assert ids0.size == 0
    # ordered (ONEAR): only beta AFTER alpha counts — doc 1 ('beta
    # alpha') drops, doc 5 keeps dist 1 from its first alpha
    ido, disto = eng.proximity("alpha", "beta", within=3, ordered=True)
    assert dict(zip(ido.tolist(), disto.tolist())) == {0: 3, 5: 1}
    ido5, disto5 = eng.proximity("alpha", "beta", within=5, ordered=True)
    assert dict(zip(ido5.tolist(), disto5.tolist())) == {0: 3, 2: 5, 5: 1}


# ---------------- wildcard + spell suggestion (engine extensions) ------


def test_parse_wildcard():
    p = parse("s*a* AND data")
    assert p.kind == "boolean"
    assert p.groups[0].positive[0].kind == "wildcard"
    assert p.groups[0].positive[0].value == "s*a*"
    p = parse("*ow")
    assert p.tokens[0].kind == "wildcard"
    # lone trailing star keeps the reference's prefix semantics
    assert parse("isra*").tokens[0].kind == "prefix"
    with pytest.raises(QueryParseError):
        parse("** AND x")


def _wc_regex(pat):
    import re

    return re.compile("^" + ".*".join(map(re.escape, pat.split("*"))) + "$")


def test_wildcard_docs_vs_oracle(engine, oracle):
    for pat in ["s*a*", "*ow", "d*t*", "*a*", "th*e"]:
        rx = _wc_regex(pat)
        terms = [t for t in oracle.postings if rx.match(t)]
        exp = sorted({d for t in terms for d in oracle.term_docs(t)})
        got = engine._wildcard_docs(pat)
        assert got.tolist() == exp, pat


def test_suggest_vs_oracle(engine, oracle):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        levenshtein,
    )

    for w in ["dat", "valu", "resul", "the"]:
        exp = sorted(
            (levenshtein(t, w), -oracle.df(t), t)
            for t in oracle.postings
            if t != w and levenshtein(t, w) <= 2
        )[:10]
        exp = [(t, d, -ndf) for d, ndf, t in exp]
        assert engine.suggest(w, k=10, max_dist=2) == exp, w


def test_wildcard_suggest_actor_mode(ray_session, engine):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    eng2 = SearchEngine(engine.local.index_dir, mode="actors", num_actors=2)
    for pat in ["s*a*", "*ow", "*a*"]:
        assert (
            eng2._wildcard_docs(pat).tolist()
            == engine._wildcard_docs(pat).tolist()
        )
    for w in ["dat", "the"]:
        assert eng2.suggest(w, k=10, max_dist=2) == engine.suggest(
            w, k=10, max_dist=2
        )
    # through the full boolean path too
    q = "s*a* AND data"
    assert _ids(eng2.search(q)) == _ids(engine.search(q))


def test_levenshtein_basics():
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        levenshtein,
    )

    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("par", "spark") == 2
    assert levenshtein("ab", "ba") == 2  # plain Levenshtein, no transposition


def test_ranked_filtered_candidates(engine):
    """allowed= restricts candidates only: the filtered ranking is the
    full ranking's restriction (identical scores — stats stay global)."""
    q = "data value result"
    full_ids, full_scores = engine.search(q, k=None)
    # every other hit allowed, plus ids that were never candidates
    allowed = np.sort(
        np.concatenate([np.sort(full_ids)[::2], np.array([10**9])])
    )
    got_ids, got_scores = engine.search(q, k=5, allowed=allowed)
    ok = np.isin(full_ids, allowed)
    exp_ids = full_ids[ok][:5]
    exp_scores = full_scores[ok][:5]
    assert [int(x) for x in got_ids] == [int(x) for x in exp_ids]
    assert np.array_equal(got_scores, exp_scores)
    # empty filter → empty result
    ids, scores = engine.search(q, k=5, allowed=np.empty(0, np.int64))
    assert ids.size == 0 and scores.size == 0


# ---------------- regex term search (engine extension) ------------------


def test_regex_literal_prefix():
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        _regex_literal_prefix,
    )

    assert _regex_literal_prefix("dat[ae]") == "dat"
    assert _regex_literal_prefix("data*") == "dat"   # * makes 'a' optional
    assert _regex_literal_prefix("data+") == "data"  # + keeps it required
    assert _regex_literal_prefix("da?t") == "d"
    assert _regex_literal_prefix(".*x") == ""
    assert _regex_literal_prefix("plain") == "plain"
    # top-level alternation: leading literal is just one branch, NOT a
    # required prefix — no narrowing allowed (ADVICE r4 high)
    assert _regex_literal_prefix("scan|join") == ""
    assert _regex_literal_prefix("a|b") == ""
    assert _regex_literal_prefix("ab\\|c") == "ab"    # escaped | is literal
    assert _regex_literal_prefix("ab[|]c") == "ab"    # class | is literal
    assert _regex_literal_prefix("ab(c|d)") == "ab"   # grouped alt is fine


def test_regex_casefold():
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        _regex_casefold,
    )

    assert _regex_casefold("DATA[A-Z]+") == "data[a-z]+"
    # uppercase escape classes must survive (\W != \w)
    assert _regex_casefold(r"\Wx\D\S") == r"\Wx\D\S"
    assert _regex_casefold(r"A\\B") == r"a\\b"  # escaped backslash then literal


def test_regex_docs_vs_oracle(engine, oracle):
    import re

    for pat in [
        "s[ct][a-z]+",
        "d.t[a-z]*",
        "(the|a)",
        "[a-z]*ow",
        "x{2,}",
        # top-level alternation: both branches must contribute docs
        "the|a",
        "sh[a-z]+|d.ta",
    ]:
        rx = re.compile(f"^(?:{pat})$")
        terms = [t for t in oracle.postings if rx.match(t)]
        exp = sorted({d for t in terms for d in oracle.term_docs(t)})
        got = engine.regex_docs(pat)
        assert got.tolist() == exp, pat


def test_regex_docs_actor_mode(ray_session, engine):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    eng2 = SearchEngine(engine.local.index_dir, mode="actors", num_actors=2)
    for pat in ["s[ct][a-z]+", "(the|a)", "[a-z]*ow"]:
        assert (
            eng2.regex_docs(pat).tolist() == engine.regex_docs(pat).tolist()
        )


def test_parse_regex_token():
    p = parse("/s[ct][a-z]+/ AND data")
    assert p.kind == "boolean"
    assert p.groups[0].positive[0].kind == "regex"
    assert p.groups[0].positive[0].value == "s[ct][a-z]+"
    with pytest.raises(QueryParseError):
        parse("/bad(/ AND x")


def test_regex_boolean_path(engine, oracle):
    import re

    rx = re.compile("^(?:s[ct][a-z]+)$")
    terms = [t for t in oracle.postings if rx.match(t)]
    re_docs = {d for t in terms for d in oracle.term_docs(t)}
    data_docs = set(oracle.term_docs("data"))
    exp = sorted(re_docs & data_docs)
    assert _ids(engine.search("/s[ct][a-z]+/ AND data")) == exp


def test_boosted_ranking(engine, oracle):
    """All-ones boost is a no-op; a selective boost multiplies exactly
    those docs' scores and re-ranks deterministically."""
    from informationretrieval_en_people_cn_ray.queryparse import parse

    plan = parse("data values result")
    ids0, sc0 = engine.ranked(plan, k=10, scorer="bm25")
    all_ids = np.arange(0, max(ids0.max() + 1, 1), dtype=np.int64)
    ids1, sc1 = engine.ranked(
        plan, k=10, scorer="bm25",
        boost=(all_ids, np.ones(len(all_ids))),
    )
    assert ids1.tolist() == ids0.tolist()
    assert np.allclose(sc1, sc0)
    # boost exactly one known hit 10x — it must take rank 1 with 10x score
    target = ids0[-1]
    w = np.ones(len(all_ids))
    w[target] = 10.0
    ids2, sc2 = engine.ranked(plan, k=10, scorer="bm25",
                              boost=(all_ids, w))
    assert ids2[0] == target
    assert abs(sc2[0] - 10.0 * sc0[-1]) < 1e-9


def test_fuzzy_docs_vs_oracle(engine, oracle):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        levenshtein,
    )

    for w, d in [("scon", 1), ("dat", 1), ("the", 2)]:
        terms = [t for t in oracle.postings if levenshtein(t, w) <= d]
        exp = sorted({doc for t in terms for doc in oracle.term_docs(t)})
        assert engine.fuzzy_docs(w, max_dist=d).tolist() == exp, w


def test_fuzzy_docs_actor_mode(ray_session, engine):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    eng2 = SearchEngine(engine.local.index_dir, mode="actors", num_actors=2)
    for w in ["scon", "dat"]:
        assert (
            eng2.fuzzy_docs(w, 1).tolist() == engine.fuzzy_docs(w, 1).tolist()
        )


def test_explain(engine, oracle):
    ex = engine.explain("data values result")
    assert ex["kind"] == "ranked"
    assert ex["n_docs"] == oracle.N
    for t, m in ex["terms"].items():
        if m is not None:
            assert m["df"] == oracle.df(t), t
    ex2 = engine.explain("data AND values")
    assert ex2["kind"] == "boolean"
    assert ("keyword", "data") in ex2["tokens"]


# ---------------- round-5 review regressions ---------------------------


def test_ranked_pruned_all_candidates_tombstoned(ray_session, tmp_path):
    """Deleting every doc that contains the query's terms must yield an
    EMPTY pruned result, not np.concatenate([]) — the terms stay in the
    as-built dictionary so the pruned path engages, but every
    tombstone-filtered posting list is empty (default Lucene delete
    semantics keep pruning live)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    # 'zebra' df=2 over N=30 keeps df/N under PRUNE_MIN_DF_FRACTION so
    # the MaxScore loop actually runs (a hot-everywhere term would fall
    # back to ranked() and never exercise the empty-candidate path)
    texts = ["zebra unique here", "zebra again there"] + [
        f"filler words number {i}" for i in range(28)
    ]
    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        pa.table({"content": pa.array(texts, pa.string())}),
        os.path.join(c, "p.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=1,
                                    stem=False))
    delete_docs(idx, [0, 1])
    eng = SearchEngine(idx, mode="local")
    ids, sc = eng.ranked_pruned(parse("zebra"), k=3)
    assert ids.size == 0 and sc.size == 0
    # and through the public dispatch (QueryEval's default path)
    ids2, sc2 = eng.search("zebra unique", k=3, prune=True)
    assert ids2.size == 0 and sc2.size == 0


def test_search_prune_with_ranked_only_kwargs(engine):
    """search(prune=True, boost=...) must fall through to ranked() (which
    accepts boost/cutoff/mu), not TypeError in ranked_pruned."""
    bids = np.array([0, 1], np.int64)
    bw = np.array([2.0, 0.5])
    a_ids, a_sc = engine.search(
        "data value", k=5, prune=True, boost=(bids, bw)
    )
    b_ids, b_sc = engine.ranked(parse("data value"), k=5, boost=(bids, bw))
    assert [int(x) for x in a_ids] == [int(x) for x in b_ids]
    assert np.allclose(a_sc, b_sc, atol=0)
    # still takes the pruned path when only k1/b are passed
    c_ids, c_sc = engine.search("data value", k=5, prune=True, k1=1.6)
    d_ids, d_sc = engine.ranked(parse("data value"), k=5, k1=1.6)
    assert [int(x) for x in c_ids] == [int(x) for x in d_ids]
    assert np.allclose(c_sc, d_sc, atol=0)


def test_proximity_same_term_needs_two_occurrences(ray_session, tmp_path):
    """NEAR(a, b) where a and b analyze to the SAME index term must not
    self-match: a doc with a single occurrence is no hit, and distance
    comes from two DISTINCT occurrences."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    texts = [
        "alpha xx alpha",    # two occurrences, dist 2
        "alpha only here",   # single occurrence — must NOT match
        "xx alpha xx xx xx alpha xx alpha",  # dists 4 and 2 → min 2
    ]
    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        pa.table({"content": pa.array(texts, pa.string())}),
        os.path.join(c, "p.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=1,
                                    stem=False))
    eng = SearchEngine(idx, mode="local")
    ids, dist = eng.proximity("alpha", "alpha", within=3)
    assert dict(zip(ids.tolist(), dist.tolist())) == {0: 2, 2: 2}
    # ordered mode: same semantics (next distinct occurrence)
    ido, disto = eng.proximity("alpha", "alpha", within=4, ordered=True)
    assert dict(zip(ido.tolist(), disto.tolist())) == {0: 2, 2: 2}
    # stemmed collision: 'run' and 'runs' share the stem → same rule
    idx2 = str(tmp_path / "i2")
    c2 = str(tmp_path / "c2")
    os.makedirs(c2)
    pq.write_table(
        pa.table({"content": pa.array(
            ["run the runs", "run once"], pa.string())}),
        os.path.join(c2, "p.parquet"),
    )
    build_index(c2, idx2, BuildConfig(num_segments=1, docstat_partitions=1))
    eng2 = SearchEngine(idx2, mode="local")
    ids2, dist2 = eng2.proximity("run", "runs", within=5)
    assert dict(zip(ids2.tolist(), dist2.tolist())) == {0: 2}


def test_phrase_long_offset_anchor(ray_session, tmp_path):
    """Phrases with anchors more than 64 tokens in must verify exactly —
    the shifted-position keys formerly carried a +64 bias that
    underflowed (sign-extending over the doc bits) when a late anchor
    term also occurred near a candidate doc's start."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    words = [f"tok{i:02d}" for i in range(70)]
    phrase = " ".join(words)
    texts = [
        "tok66 tok67 " + phrase,            # early extras + real match
        "tok66 tok67 " + " ".join(reversed(words)),  # all terms, no order
        phrase,                              # plain match
    ]
    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        pa.table({"content": pa.array(texts, pa.string())}),
        os.path.join(c, "p.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=1,
                                    stem=False))
    eng = SearchEngine(idx, mode="local")
    ids = eng._phrase_docs(phrase)
    assert ids.tolist() == [0, 2]
