"""CSV ingest + normalization (S1/M8) and adjacency index (J4/A4) —
including an end-to-end CSV → index → query flow and ReplyTo via the
engine grammar."""

import csv
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def csv_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvsrc")
    path = str(d / "comments.csv")
    rows = [
        # cid, url, author, text
        [0, "u0", "alice", "Tragic，event！with CJK punctuation"],
        [1, "u1", "bob", "line\nbreaks\r\nand returns\rhere"],
        [2, "u2", "carol", "plain running characters"],
        [3, "u3", None, "row with null author"],
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["cid", "url", "author", "text"])
        w.writerows(rows)
    return path


def test_ingest_normalizes_and_audits(ray_session, csv_corpus, tmp_path):
    from informationretrieval_en_people_cn_ray.sources.csv_ingest import (
        ingest_csv_corpus,
    )

    out = str(tmp_path / "corpus")
    ingest_csv_corpus(
        csv_corpus,
        out,
        column_map={"cid": "doc_key", "url": "path", "author": "repo", "text": "content"},
        text_columns=["content"],
        min_fields=4,
    )
    import glob

    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))]
    )
    texts = dict(zip(t["doc_key"].to_pylist(), t["content"].to_pylist()))
    assert texts[0] == "Tragic,event!with CJK punctuation"  # CJK → ASCII
    assert texts[1] == "line breaks and returns here"  # newlines → spaces
    assert 3 not in texts  # null-audited row dropped
    assert len(texts) == 3


def test_csv_to_index_to_query(ray_session, csv_corpus, tmp_path):
    """Full flow: CSV ingest → index build → query (reference §3.3 + §3.1
    + §3.2 chained)."""
    from informationretrieval_en_people_cn_ray.sources.csv_ingest import (
        ingest_csv_corpus,
    )
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    corpus = str(tmp_path / "corpus2")
    ingest_csv_corpus(
        csv_corpus,
        corpus,
        column_map={"cid": "doc_key", "text": "content"},
        text_columns=["content"],
    )
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, BuildConfig(num_segments=2, docstat_partitions=1))
    eng = SearchEngine(idx)
    ids, scores = eng.search("running characters", k=5)
    assert len(ids) == 1  # only the 'plain running characters' doc
    ids2 = eng.search("tragic AND event")
    assert len(ids2) == 1


def test_adjacency_build_and_lookup(ray_session, tmp_path):
    from informationretrieval_en_people_cn_ray.pipelines.adjacency import (
        AdjacencyIndex,
        build_adjacency,
    )

    src = str(tmp_path / "edges.parquet")
    parents = [1, 1, 2, 2, 2, 5, 1]
    children = [10, 11, 20, 21, 22, 50, 12]
    pq.write_table(
        pa.table(
            {"p": pa.array(parents, pa.int64()), "c": pa.array(children, pa.int64())}
        ),
        src,
    )
    out = str(tmp_path / "adj")
    m = build_adjacency(src, "p", "c", out, num_partitions=3)
    assert m["n_parents"] == 3 and m["n_edges"] == 7
    a = AdjacencyIndex(out)
    assert a.children(1).tolist() == [10, 11, 12]
    assert a.children(2).tolist() == [20, 21, 22]
    assert a.children(5).tolist() == [50]
    assert a.children(99).tolist() == []


def test_replyto_through_engine(ray_session, tmp_path):
    """ReplyTo:<key> token resolves via the adjacency index (SURVEY J4),
    composable with boolean algebra."""
    from informationretrieval_en_people_cn_ray.corpus import write_corpus
    from informationretrieval_en_people_cn_ray.pipelines.adjacency import (
        AdjacencyIndex,
        build_adjacency,
    )
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 30, seed=5, num_parquet_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, BuildConfig(num_segments=2, docstat_partitions=1))

    # synthetic reply graph: parent = doc_id // 10
    edges = str(tmp_path / "edges.parquet")
    pq.write_table(
        pa.table(
            {
                "parent": pa.array([i // 10 for i in range(30)], pa.int64()),
                "child": pa.array(list(range(30)), pa.int64()),
            }
        ),
        edges,
    )
    adj_dir = str(tmp_path / "adj")
    build_adjacency(edges, "parent", "child", adj_dir, num_partitions=2)

    eng = SearchEngine(idx, adjacency=AdjacencyIndex(adj_dir))
    ids = eng.search("ReplyTo:1 AND ReplyTo:1")
    assert list(ids) == list(range(10, 20))
    # composed with a keyword constraint → subset
    ids2 = eng.search("ReplyTo:1 AND the")
    assert set(ids2) <= set(range(10, 20))
    # engine without adjacency still raises helpfully
    eng2 = SearchEngine(idx)
    with pytest.raises(NotImplementedError, match="adjacency"):
        eng2.search("ReplyTo:1 AND the")

    # delete contract: adjacency children are raw corpus ids that never
    # pass the posting decode layer — a tombstoned doc must still drop
    # from ReplyTo results (boolean AND ranked paths)
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    delete_docs(idx, [12, 17])
    eng3 = SearchEngine(idx, adjacency=AdjacencyIndex(adj_dir))
    ids3 = eng3.search("ReplyTo:1 AND ReplyTo:1")
    assert list(ids3) == [i for i in range(10, 20) if i not in (12, 17)]
    from informationretrieval_en_people_cn_ray.queryparse import parse

    r_ids, _ = eng3.ranked(parse("ReplyTo:1"), k=30)
    assert 12 not in set(int(x) for x in r_ids)
    assert 17 not in set(int(x) for x in r_ids)

    # dangling adjacency children (ids absent from the index, e.g. an
    # adjacency over a foreign key space): boolean algebra keeps them
    # (pure id-set semantics — the replyto_children driver entry relies
    # on this), while the RANKED scorer drops them instead of crashing
    # lens_for or borrowing a neighbor's doc length
    edges2 = str(tmp_path / "edges2.parquet")
    pq.write_table(
        pa.table(
            {
                "parent": pa.array([7, 7, 7], pa.int64()),
                "child": pa.array([3, 4, 10**9], pa.int64()),
            }
        ),
        edges2,
    )
    adj2 = str(tmp_path / "adj2")
    build_adjacency(edges2, "parent", "child", adj2, num_partitions=1)
    eng4 = SearchEngine(idx, adjacency=AdjacencyIndex(adj2))
    assert list(eng4.search("ReplyTo:7 AND ReplyTo:7")) == [3, 4, 10**9]
    r4, _ = eng4.ranked(parse("ReplyTo:7"), k=10)
    assert set(int(x) for x in r4) <= {3, 4}


@pytest.fixture(scope="module")
def jsonl_corpus(tmp_path_factory):
    import json as _json

    d = tmp_path_factory.mktemp("jsonlsrc")
    path = str(d / "docs.jsonl")
    rows = [
        {"id": 0, "text": "Tragic，event！with CJK punctuation", "lang": "en"},
        {"id": 1, "text": "line\nbreaks\r\nand returns\rhere", "lang": "en"},
        {"id": 2, "text": "plain running characters", "lang": "de"},
        {"id": 3, "text": "", "lang": "en"},  # empty → audited out
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    return path


def test_jsonl_ingest_to_index_to_query(ray_session, jsonl_corpus, tmp_path):
    """JSONL (the LLM-data interchange format) → normalized parquet
    corpus → index → query, sharing the CSV path's normalizers/audit."""
    import glob

    from informationretrieval_en_people_cn_ray.sources.jsonl_ingest import (
        ingest_jsonl_corpus,
    )
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    corpus = str(tmp_path / "corpus")
    ingest_jsonl_corpus(
        jsonl_corpus,
        corpus,
        column_map={"id": "doc_key", "text": "content", "lang": "lang"},
    )
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(corpus + "/*.parquet"))]
    )
    texts = dict(zip(t["doc_key"].to_pylist(), t["content"].to_pylist()))
    assert texts[0] == "Tragic,event!with CJK punctuation"
    assert texts[1] == "line breaks and returns here"
    assert 3 not in texts and len(texts) == 3
    assert set(t.column_names) == {"doc_key", "content", "lang"}

    idx = str(tmp_path / "idx")
    build_index(corpus, idx, BuildConfig(num_segments=2, docstat_partitions=1))
    eng = SearchEngine(idx)
    ids, _ = eng.search("running characters", k=5)
    assert len(ids) == 1
    assert len(eng.search("tragic AND event")) == 1


def test_jsonl_gzip_ingest(ray_session, tmp_path):
    """Gzipped JSONL (the common at-rest form of training-data shards)
    reads through the same ingest path — arrow detects the codec from
    the .gz extension."""
    import glob
    import gzip
    import json as _json

    from informationretrieval_en_people_cn_ray.sources.jsonl_ingest import (
        ingest_jsonl_corpus,
    )

    path = str(tmp_path / "shard.jsonl.gz")
    rows = [
        {"id": i, "text": f"gz doc {i} payload", "lang": "en"}
        for i in range(5)
    ]
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    corpus = str(tmp_path / "corpus_gz")
    ingest_jsonl_corpus(
        path,
        corpus,
        column_map={"id": "doc_key", "text": "content"},
    )
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(corpus + "/*.parquet"))]
    )
    assert t.num_rows == 5
    assert sorted(t["doc_key"].to_pylist()) == [0, 1, 2, 3, 4]
    assert t["content"].to_pylist()[0].startswith("gz doc")


def test_jsonl_export_roundtrip(ray_session, tmp_path):
    """corpus → JSONL export → re-ingest → identical content."""
    import glob

    from informationretrieval_en_people_cn_ray.sources.jsonl_ingest import (
        export_jsonl_corpus,
        ingest_jsonl_corpus,
    )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    src = pa.table(
        {
            "doc_key": pa.array([0, 1, 2], pa.int64()),
            "content": pa.array(["alpha beta", "gamma", "delta eps"]),
            "lang": pa.array(["en", "en", "de"]),
        }
    )
    pq.write_table(src, os.path.join(corpus, "part-0.parquet"))
    out = str(tmp_path / "jsonl")
    export_jsonl_corpus(corpus, out)
    back = str(tmp_path / "back")
    ingest_jsonl_corpus(
        out,
        back,
        column_map={"doc_key": "doc_key", "content": "content",
                    "lang": "lang"},
        text_columns=["content"],
    )
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(back + "/*.parquet"))]
    ).sort_by("doc_key")
    assert t["content"].to_pylist() == src["content"].to_pylist()
    assert t["lang"].to_pylist() == src["lang"].to_pylist()


def test_min_fields_numeric_threshold(ray_session, csv_corpus, tmp_path):
    """min_fields honors its NUMERIC value: a row with >= N populated
    mapped fields is kept even when some fields are missing, and the
    kept row's missing strings are normalized to "" (uniform non-null
    schema downstream)."""
    import glob

    from informationretrieval_en_people_cn_ray.sources.csv_ingest import (
        ingest_csv_corpus,
    )

    out = str(tmp_path / "corpus_thresh")
    ingest_csv_corpus(
        csv_corpus,
        out,
        column_map={"cid": "doc_key", "url": "path", "author": "repo",
                    "text": "content"},
        text_columns=["content"],
        min_fields=3,  # row 3 has 3/4 populated (null author) → kept
    )
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))]
    )
    by_key = {r["doc_key"]: r for r in t.to_pylist()}
    assert set(by_key) == {0, 1, 2, 3}
    assert by_key[3]["repo"] == ""  # missing string filled, not null


def test_ingest_null_text_is_safe(ray_session, tmp_path):
    """A null text value with the audit OFF must flow through the
    normalizers (newline/CJK passes) unchanged, not crash them."""
    import glob
    import json as _json

    from informationretrieval_en_people_cn_ray.sources.jsonl_ingest import (
        ingest_jsonl_corpus,
    )

    path = str(tmp_path / "docs.jsonl")
    with open(path, "w") as f:
        f.write(_json.dumps({"id": 0, "text": "alpha，beta"}) + "\n")
        f.write(_json.dumps({"id": 1, "text": None}) + "\n")
    out = str(tmp_path / "corpus_null")
    ingest_jsonl_corpus(
        path,
        out,
        column_map={"id": "doc_key", "text": "content"},
        drop_null=False,
    )
    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))]
    ).sort_by("doc_key")
    assert t.num_rows == 2
    assert t["content"].to_pylist() == ["alpha,beta", None]


def test_adjacency_vectorized_partition_hash_matches_crc32():
    """_parts_of (the vectorized add_part hash) must stay bit-identical
    to _part_of (the scalar read-side hash) or lookups miss partitions."""
    import numpy as np

    from informationretrieval_en_people_cn_ray.pipelines.adjacency import (
        _part_of,
        _parts_of,
    )

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, 2000),
            np.array([0, -1, 1, 2**62, -(2**62)]),
        ]
    ).astype(np.int64)
    for p in (1, 3, 4, 64):
        got = _parts_of(vals, p)
        exp = np.array([_part_of(int(v), p) for v in vals], np.int32)
        assert (got == exp).all()
