"""Randomized engine-vs-oracle parity: random corpora seeds × generated
queries of every grammar kind — the broad net behind the targeted tests."""

import numpy as np
import pytest

from informationretrieval_en_people_cn_ray.corpus import write_corpus
from informationretrieval_en_people_cn_ray.oracle import OracleIndex
from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_fuzz_engine_matches_oracle(ray_session, tmp_path, seed):
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    corpus = str(tmp_path / f"c{seed}")
    write_corpus(corpus, 80, seed=seed, num_parquet_files=2, avg_tokens=60)
    idx = str(tmp_path / f"i{seed}")
    build_index(
        corpus, idx, BuildConfig(num_segments=3, docstat_partitions=2)
    )
    oracle = OracleIndex.from_corpus(corpus)
    eng = SearchEngine(idx)

    rng = np.random.RandomState(seed)
    vocab = sorted(oracle.postings)
    pick = lambda: vocab[int(rng.randint(len(vocab)))]

    for _ in range(15):
        kind = int(rng.randint(5))
        if kind == 0:  # ranked free text
            q = " ".join(pick() for _ in range(int(rng.randint(1, 4))))
            ids, scores = eng.search(q, k=10)
            exp = oracle.bm25(q, k=10)
            assert [int(i) for i in ids] == [d for d, _ in exp], q
            assert np.allclose(scores, [s for _, s in exp], atol=1e-9), q
        elif kind == 1:  # AND
            a, b = pick(), pick()
            got = sorted(int(x) for x in eng.search(f"{a} AND {b}"))
            assert got == sorted(
                oracle.keyword_set(a) & oracle.keyword_set(b)
            ), (a, b)
        elif kind == 2:  # NOT
            a, b = pick(), pick()
            got = sorted(int(x) for x in eng.search(f"{a} NOT {b}"))
            assert got == sorted(
                oracle.keyword_set(a) - oracle.keyword_set(b)
            ), (a, b)
        elif kind == 3:  # prefix
            p = pick()[: int(rng.randint(1, 4))]
            got = sorted(int(x) for x in eng.search(f"{p}* AND {p}*"))
            assert got == sorted(oracle.prefix_set(p)), p
        else:  # dirichlet ranked
            q = " ".join(pick() for _ in range(2))
            ids, scores = eng.search(q, k=10, scorer="dirichlet")
            exp = oracle.dirichlet(q, k=10)
            assert [int(i) for i in ids] == [d for d, _ in exp], q
            assert np.allclose(scores, [s for _, s in exp], atol=1e-9), q


@pytest.mark.parametrize("seed", [23, 59])
def test_fuzz_engine_matches_oracle_hazard_corpus(ray_session, tmp_path, seed):
    """Same engine-vs-oracle net over a HAZARD corpus (unicode case
    folding, ligatures, empty and whitespace-only documents) — the
    index path's analogue of the datapipe unicode fuzz."""
    import os

    from test_fuzz_textops import _mk_docs

    from informationretrieval_en_people_cn_ray.oracle import OracleIndex
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    d = str(tmp_path)
    _mk_docs(d, seed, 80)
    corpus = os.path.join(d, "documents.parquet")
    idx = os.path.join(d, "idx")
    build_index(
        corpus,
        idx,
        BuildConfig(
            num_segments=3,
            docstat_partitions=2,
            content_column="text",
            doc_id_column="doc_id",
        ),
    )
    oracle = OracleIndex.from_corpus(corpus, content_column="text")
    eng = SearchEngine(idx)
    rng = np.random.RandomState(seed)
    vocab = sorted(oracle.postings)

    def pick():
        return vocab[int(rng.randint(len(vocab)))]

    for _ in range(12):
        kind = int(rng.randint(3))
        if kind == 0:  # ranked
            q = " ".join(pick() for _ in range(int(rng.randint(1, 4))))
            ids, _ = eng.search(q, k=10)
            assert [int(i) for i in ids] == [
                doc for doc, _ in oracle.bm25(q, k=10)
            ], q
        elif kind == 1:  # boolean AND
            a, b = pick(), pick()
            got = set(int(i) for i in eng.search(f"{a} AND {b}"))
            assert got == (oracle.keyword_set(a) & oracle.keyword_set(b))
        else:  # prefix (boolean form — a lone token is a ranked query)
            p = pick()[:2]
            got = set(int(i) for i in eng.search(f"{p}* AND {p}*"))
            assert got == oracle.prefix_set(p), p


@pytest.mark.parametrize("seed", [404, 505])
def test_fuzz_proximity_matches_oracle(ray_session, tmp_path, seed):
    """Random term pairs × distances: engine NEAR/k == positions-level
    replication over the single-process oracle index."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    corpus = str(tmp_path / f"c{seed}")
    write_corpus(corpus, 60, seed=seed, num_parquet_files=2, avg_tokens=50)
    idx = str(tmp_path / f"i{seed}")
    build_index(
        corpus, idx, BuildConfig(num_segments=3, docstat_partitions=2)
    )
    oracle = OracleIndex.from_corpus(corpus)
    eng = SearchEngine(idx)
    rng = np.random.RandomState(seed)
    vocab = sorted(oracle.postings)

    def expected(a, b, k, ordered=False):
        pa_ = {d: ps for d, ps in oracle.postings[a]}
        pb_ = {d: ps for d, ps in oracle.postings[b]}
        out = {}
        for d in sorted(set(pa_) & set(pb_)):
            ds = [
                (y - x) if ordered else abs(x - y)
                for x in pa_[d]
                for y in pb_[d]
                if not ordered or y > x
            ]
            if ds and min(ds) <= k:
                out[d] = min(ds)
        return out

    for _ in range(12):
        a = vocab[int(rng.randint(len(vocab)))]
        b = vocab[int(rng.randint(len(vocab)))]
        k = int(rng.randint(0, 9))
        ids, dist = eng.proximity(a, b, within=k)
        assert dict(zip(ids.tolist(), dist.tolist())) == expected(a, b, k), (
            a, b, k,
        )
        ido, disto = eng.proximity(a, b, within=k, ordered=True)
        assert dict(zip(ido.tolist(), disto.tolist())) == expected(
            a, b, k, ordered=True
        ), (a, b, k)
