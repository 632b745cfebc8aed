"""CLI entry (`python -m`) + DocStore hydration (SURVEY.md §2 S8/J7)."""

import json
import os

import pytest

from informationretrieval_en_people_cn_ray.corpus import write_corpus
from informationretrieval_en_people_cn_ray.sources.corpus_source import (
    DocStore,
    read_corpus,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clicorpus"))
    write_corpus(d, 90, seed=11, num_parquet_files=3)
    return d


def test_docstore_lookup_matches_read_corpus(ray_session, corpus_dir):
    """lookup(doc_id) must return exactly the row the streaming reader
    assigned that doc_id to — same layout-derived id function on both
    paths (reference ``SearchEngine.load_comment`` seek parity)."""
    ds = read_corpus(corpus_dir, columns=["content", "path"])
    full = {
        int(r["doc_id"]): (r["content"], r["path"]) for r in ds.take_all()
    }
    store = DocStore(corpus_dir)
    ids = [0, 7, 41, 89, 89, 30]  # dupes collapse, order-insensitive
    t = store.lookup(ids, columns=["content", "path"])
    assert t.num_rows == len(set(ids))
    for r in t.to_pylist():
        content, path = full[r["doc_id"]]
        assert r["content"] == content and r["path"] == path


def test_docstore_lookup_crosses_fragments(corpus_dir):
    """ids spanning different files/row groups hydrate in one call."""
    store = DocStore(corpus_dir)
    n_frags = len(store.plan)
    assert n_frags >= 3
    picks = [int(p["base"]) for p in store.plan]  # first row of each frag
    t = store.lookup(picks, columns=["content"])
    assert sorted(t["doc_id"].to_pylist()) == sorted(picks)


def test_cli_index_and_search(ray_session, corpus_dir, tmp_path, capsys):
    from informationretrieval_en_people_cn_ray.__main__ import main

    idx = str(tmp_path / "cli_idx")
    rc = main(["index", corpus_dir, idx, "--segments", "4"])
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["num_docs"] == 90 and built["n_terms"] > 0

    rc = main(
        [
            "search", idx, "--query", "the data value", "--k", "5",
            "--hydrate", corpus_dir, "--columns", "path",
        ]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["query"] == "the data value"
    assert 0 < len(res["doc_ids"]) <= 5
    assert all(d and "path" in d for d in res["docs"])

    # query-file batch mode (the reference's primary UX)
    qf = str(tmp_path / "queries.txt")
    with open(qf, "w") as f:
        f.write("data value\nthe AND data\n\n")
    rc = main(["search", idx, "--query-file", qf, "--k", "3"])
    assert rc == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert [l["query"] for l in lines] == ["data value", "the AND data"]
    assert len(lines[0]["doc_ids"]) <= 3
    assert all(s is None for s in lines[1]["scores"])  # boolean → no scores

    # spell suggestion from the same index dictionary
    rc = main(["suggest", idx, "dat", "--k", "5"])
    assert rc == 0
    sug = json.loads(capsys.readouterr().out.strip())
    assert sug["word"] == "dat"
    assert sug["suggestions"], "expected candidates within 2 edits of 'dat'"
    assert all(
        set(s) == {"term", "dist", "df"} and s["dist"] <= 2
        for s in sug["suggestions"]
    )
    # wildcard term through the standard search surface
    rc = main(["search", idx, "--query", "d*t* AND the", "--k", "5"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["doc_ids"], "wildcard boolean query should match docs"


def test_cli_extend_delete_compact(ray_session, corpus_dir, tmp_path, capsys):
    """Full index-maintenance lifecycle through the CLI: build → extend
    with a delta corpus → delete → compact; every step prints one JSON
    line and the final index reflects build+delta minus the deletions."""
    import pyarrow.parquet as pqt

    from informationretrieval_en_people_cn_ray.__main__ import main
    from informationretrieval_en_people_cn_ray.corpus import generate_corpus

    idx = str(tmp_path / "idx")
    assert main(["index", corpus_dir, idx, "--segments", "4"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["num_docs"] == 90

    delta_c = str(tmp_path / "delta_corpus")
    os.makedirs(delta_c)
    pqt.write_table(
        generate_corpus(10, seed=11, start=90),
        os.path.join(delta_c, "part-00000.parquet"),
    )
    delta_i = str(tmp_path / "delta_idx")
    merged_i = str(tmp_path / "merged_idx")
    assert main(["extend", idx, delta_c, delta_i, merged_i]) == 0
    ext = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ext["num_docs"] == 100

    assert main(["delete", merged_i, "0,5,95"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"tombstones": 3}

    final_i = str(tmp_path / "final_idx")
    assert main(["compact", merged_i, final_i]) == 0
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["num_docs"] == 97

    # deleted ids gone from a search over the compacted index
    assert main(["search", final_i, "--query", "th* OR a*", "--k", "200"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not {0, 5, 95} & set(res["doc_ids"])


def test_cli_near_search(ray_session, corpus_dir, tmp_path, capsys):
    from informationretrieval_en_people_cn_ray.__main__ import main

    idx = str(tmp_path / "idx")
    assert main(["index", corpus_dir, idx, "--segments", "4",
                 "--no-stem"]) == 0
    capsys.readouterr()
    assert main(["search", idx, "--near", "the,a,8"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["query"] == "the NEAR/8 a"
    assert len(res["doc_ids"]) == len(res["min_dists"])
    assert all(d <= 8 for d in res["min_dists"])


def test_cli_search_generation_list(ray_session, corpus_dir, tmp_path, capsys):
    """search accepts comma-separated generation dirs and matches the
    merged index's answer."""
    import pyarrow.parquet as pqt

    from informationretrieval_en_people_cn_ray.__main__ import main
    from informationretrieval_en_people_cn_ray.corpus import generate_corpus

    idx = str(tmp_path / "g0")
    assert main(["index", corpus_dir, idx, "--segments", "4"]) == 0
    delta_c = str(tmp_path / "dc")
    os.makedirs(delta_c)
    pqt.write_table(
        generate_corpus(10, seed=11, start=90),
        os.path.join(delta_c, "part-00000.parquet"),
    )
    d_i, m_i = str(tmp_path / "g1"), str(tmp_path / "m")
    assert main(["extend", idx, delta_c, d_i, m_i]) == 0
    capsys.readouterr()
    assert main(["search", f"{idx},{d_i}", "--query", "data AND the"]) == 0
    gens_res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["search", m_i, "--query", "data AND the"]) == 0
    merged_res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gens_res["doc_ids"] == merged_res["doc_ids"]


def test_cli_pipeline_runner(ray_session, tmp_path, capsys):
    """`pipeline` subcommand: --list names every zero-extra-arg op;
    running one prints head rows; --out writes parquet."""
    import json

    import pyarrow.parquet as _pq

    from informationretrieval_en_people_cn_ray.__main__ import main

    rc = main(["pipeline", "--list"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    assert "lang_id" in names and "pagerank" in names \
        and "pricing_summary" in names
    assert len(names) >= 90

    rc = main(["pipeline", "lang_id", "/root/testdata/sf0.001",
               "--head", "2"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    hdr = json.loads(lines[0])
    assert hdr["rows"] == 500 and "pred_lang" in hdr["columns"]
    assert len(lines) == 3

    out = str(tmp_path / "res.parquet")
    rc = main(["pipeline", "dow_hour_heatmap", "/root/testdata/sf0.001",
               "--out", out])
    assert rc == 0
    t = _pq.read_table(out)
    assert t.num_rows > 0 and "n_events" in t.column_names

    assert main(["pipeline", "nope", "/tmp"]) == 2

    # non-tabular helpers admitted by the signature filter must fail
    # cleanly (rc=2 + message), not crash in _to_table (ADVICE r4)
    rc = main(["pipeline", "doc_weights_by_lang", "/root/testdata/sf0.001"])
    assert rc == 2
    assert "non-tabular" in capsys.readouterr().err


def test_write_corpus_regeneration_no_stale_parts(tmp_path):
    """Regenerating a corpus dir with different params must not leave
    old part files behind (corpus_files globs *.parquet — orphans would
    silently mix into every downstream build), and a truncated stamp
    from a killed run must regenerate, not crash."""
    from informationretrieval_en_people_cn_ray.sources.corpus_source import (
        corpus_files,
        corpus_num_docs,
    )

    d = str(tmp_path / "c")
    write_corpus(d, 120, seed=1, num_parquet_files=4)
    assert len(corpus_files(d)) == 4
    write_corpus(d, 30, seed=1, num_parquet_files=1)
    assert len(corpus_files(d)) == 1
    assert corpus_num_docs(d) == 30
    with open(os.path.join(d, "_corpus.json"), "w") as f:
        f.write('{"trunc')  # killed mid-write
    write_corpus(d, 30, seed=1, num_parquet_files=1)
    assert corpus_num_docs(d) == 30


@pytest.fixture(scope="module")
def explicit_id_corpus(tmp_path_factory):
    """Two-file corpus whose id column is NOT the layout ordinal."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("expid"))
    for f, ids in enumerate([[7, 17, 27], [37, 47, 57]]):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "content": pa.array([f"doc {i}" for i in ids]),
                }
            ),
            os.path.join(d, f"part-{f:05d}.parquet"),
        )
    return d


def test_docstore_explicit_doc_id_column(explicit_id_corpus):
    """Hydration of an explicit-id corpus returns the rows those IDS name
    — not the rows at those layout positions — and misses fail loudly."""
    store = DocStore(explicit_id_corpus, doc_id_column="id")
    t = store.lookup([47, 7], columns=["content"])
    got = dict(zip(t["doc_id"].to_pylist(), t["content"].to_pylist()))
    assert got == {7: "doc 7", 47: "doc 47"}
    with pytest.raises(KeyError, match="not present"):
        store.lookup([8])
    # the layout store must reject these ids with guidance, not hydrate
    # the wrong rows or die in take()
    with pytest.raises(IndexError, match="doc_id_column"):
        DocStore(explicit_id_corpus).lookup([57])


def test_docstore_duplicate_explicit_ids_rejected(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "dup")
    os.makedirs(d)
    pq.write_table(
        pa.table({"id": pa.array([1, 1], pa.int64()),
                  "content": pa.array(["a", "b"])}),
        os.path.join(d, "part-00000.parquet"),
    )
    with pytest.raises(ValueError, match="duplicate"):
        DocStore(d, doc_id_column="id")


def test_read_corpus_rejects_unsorted_explicit_ids(ray_session, tmp_path):
    """An explicit id column that is not strictly ascending within a row
    group violates the sorted-posting-run invariant; the reader must say
    so at the source instead of dying later in the codec/merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "unsorted")
    os.makedirs(d)
    pq.write_table(
        pa.table({"id": pa.array([3, 1, 2], pa.int64()),
                  "content": pa.array(["a", "b", "c"])}),
        os.path.join(d, "part-00000.parquet"),
    )
    with pytest.raises(Exception, match="strictly ascending"):
        read_corpus(d, columns=["content"], doc_id_column="id").take_all()
