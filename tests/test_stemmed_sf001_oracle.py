"""Oracle gate for the STEMMED index over the driver's own documents
tables (sf0.001 + sf0.01) — upgrades the rows-only stemmed driver
entries with a full term/postings/doc-len/BM25 comparison at the gate's
actual input scale (the synthetic-corpus oracle tests cover partitioning
variants; this covers the real gate tables)."""

import pyarrow.parquet as pq
import pytest

from informationretrieval_en_people_cn_ray.oracle import OracleIndex


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_stemmed_documents_index_equals_oracle(ray_session, sf):
    import __ray_entry__ as E

    sf_dir = f"/root/testdata/{sf}"
    eng = E._engine(sf_dir, stem=True)  # builds (or reuses) the cached index

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    oracle = OracleIndex(
        list(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())),
        stem=True,
    )

    # collection stats
    assert eng.stats.doc_ids.tolist() == sorted(oracle.doc_len)
    assert dict(
        zip(eng.stats.doc_ids.tolist(), eng.stats.doc_lens.tolist())
    ) == oracle.doc_len
    assert eng.manifest["total_tokens"] == oracle.C
    assert eng.manifest["n_terms"] == len(oracle.postings)

    # full postings parity (vocabulary here is small; exhaustive is cheap)
    pmap = eng._postings_map(sorted(oracle.postings), with_positions=True)
    for t, plist in oracle.postings.items():
        p = pmap[t]
        assert p is not None, t
        assert p.doc_ids.tolist() == [d for d, _ in plist], t
        assert p.tfs.tolist() == [len(ps) for _, ps in plist], t

    # ranked parity on the reference-style ranked (non-boolean) queries
    for q in [E.Q_TEXT, "scan", "merge filter sort", "join"]:
        ids, scores = eng.search(q, k=10, scorer="bm25")
        exp = oracle.bm25(q, k=10)
        assert list(ids) == [d for d, _ in exp], q
        for s, (_, es) in zip(scores, exp):
            assert abs(s - es) < 1e-9, q
