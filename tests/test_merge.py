"""Incremental index extension (pipelines/merge.py): an extend+merge
must be indistinguishable from a full rebuild — term-for-term, docstat-
for-docstat, and query-for-query — and resumable per partition."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from informationretrieval_en_people_cn_ray.corpus import generate_corpus
from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)
from informationretrieval_en_people_cn_ray.pipelines.merge import (
    extend_index,
    max_doc_id,
    merge_indexes,
)
from informationretrieval_en_people_cn_ray.pipelines.search import SearchEngine

from test_build import _read_full_index

N_A, N_B, SEED = 80, 40, 11
CFG = dict(num_segments=4, docstat_partitions=2)

QUERIES = [
    "data fast",
    "'key order'",
    "table AND scan",
    "merge OR sort NOT window",
    "bat*",
]


@pytest.fixture(scope="module")
def dirs(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    full_c = str(root / "corpus_full")
    a_c = str(root / "corpus_a")
    b_c = str(root / "corpus_b")
    for d in (full_c, a_c, b_c):
        os.makedirs(d)
    ta = generate_corpus(N_A, seed=SEED, start=0)
    tb = generate_corpus(N_B, seed=SEED, start=N_A)
    pq.write_table(ta, os.path.join(a_c, "part-00000.parquet"), row_group_size=32)
    pq.write_table(tb, os.path.join(b_c, "part-00000.parquet"), row_group_size=32)
    pq.write_table(
        pa.concat_tables([ta, tb]),
        os.path.join(full_c, "part-00000.parquet"),
        row_group_size=32,
    )
    full_i = str(root / "idx_full")
    a_i = str(root / "idx_a")
    build_index(full_c, full_i, BuildConfig(**CFG))
    build_index(a_c, a_i, BuildConfig(**CFG))
    merged_i = str(root / "idx_merged")
    delta_i = str(root / "idx_delta")
    man = extend_index(a_i, b_c, delta_i, merged_i)
    return dict(
        root=root, b_c=b_c, full_i=full_i, a_i=a_i, delta_i=delta_i,
        merged_i=merged_i, man=man,
    )


def test_delta_ids_start_above_parent(dirs):
    assert max_doc_id(dirs["a_i"]) == N_A - 1
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        _docstat_bounds,
    )

    lo, hi = _docstat_bounds(dirs["delta_i"])
    assert lo == N_A and hi == N_A + N_B - 1


def test_merged_equals_full_rebuild(dirs):
    a = _read_full_index(dirs["full_i"], CFG["num_segments"])
    b = _read_full_index(dirs["merged_i"], CFG["num_segments"])
    assert a == b


def test_merged_manifest_totals(dirs):
    man = dirs["man"]
    full = __import__("json").load(
        open(os.path.join(dirs["full_i"], "collection.json"))
    )
    assert man["num_docs"] == full["num_docs"] == N_A + N_B
    assert man["total_tokens"] == full["total_tokens"]
    assert man["avgdl"] == full["avgdl"]
    assert man["n_terms"] == full["n_terms"]
    assert man["n_posting_entries"] == full["n_posting_entries"]


def test_merged_docstats_sorted_and_equal(dirs):
    def stats(idx):
        import glob

        rows = []
        for p in sorted(glob.glob(os.path.join(idx, "docstats", "part=*"))):
            t = pq.read_table(os.path.join(p, "docstats.parquet"))
            rows.extend(zip(t["doc_id"].to_pylist(), t["doc_len"].to_pylist()))
        ids = [r[0] for r in rows]
        assert ids == sorted(ids)
        return rows

    assert stats(dirs["merged_i"]) == stats(dirs["full_i"])


def test_queries_identical_to_full(dirs):
    ef = SearchEngine(dirs["full_i"], mode="local")
    em = SearchEngine(dirs["merged_i"], mode="local")
    for q in QUERIES:
        rf, rm = ef.search(q), em.search(q)
        if isinstance(rf, tuple):
            assert rf[0].tolist() == rm[0].tolist(), q
            assert rf[1].tolist() == rm[1].tolist(), q
        else:
            assert rf.tolist() == rm.tolist(), q
    # pruned path over the merged (multi-chunk) dictionary stays
    # rank-identical too
    i1, s1 = em.search("data fast table", prune=True)
    i2, s2 = ef.search("data fast table", prune=False)
    assert i1.tolist() == i2.tolist() and s1.tolist() == s2.tolist()


def test_merge_resume_redoes_only_missing(dirs):
    merged = dirs["merged_i"]
    os.remove(os.path.join(merged, "collection.json"))
    os.remove(os.path.join(merged, "seg=00002", "manifest.json"))
    man = merge_indexes([dirs["a_i"], dirs["delta_i"]], merged)
    by = {
        (p["kind"], p["seg"]): p["skipped"] for p in man["partitions"]
    }
    assert by[("postings", 2)] is False  # re-merged
    assert by[("postings", 0)] and by[("postings", 1)] and by[("postings", 3)]
    assert all(by[k] for k in by if k[0] == "docstats")
    a = _read_full_index(dirs["full_i"], CFG["num_segments"])
    b = _read_full_index(merged, CFG["num_segments"])
    assert a == b


def test_merge_rejects_overlapping_ranges(dirs, tmp_path):
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes([dirs["a_i"], dirs["a_i"]], str(tmp_path / "bad"))


def test_merge_with_giant_term_chunks(ray_session, dirs, tmp_path):
    """max_blob_docs small enough that hot terms span several chunks in
    EVERY generation — merge must renumber chunk ordinals and keep doc
    ids ascending across generation boundaries."""
    root = tmp_path
    a_i = str(root / "ia")
    d_i = str(root / "id")
    m_i = str(root / "im")
    f_i = str(root / "if")
    cfg = BuildConfig(max_blob_docs=8, **CFG)
    build_index(str(dirs["root"] / "corpus_a"), a_i, cfg)
    build_index(str(dirs["root"] / "corpus_full"), f_i, cfg)
    extend_index(a_i, dirs["b_c"], d_i, m_i, config=BuildConfig(
        max_blob_docs=8, **CFG
    ))
    assert _read_full_index(m_i, CFG["num_segments"]) == _read_full_index(
        f_i, CFG["num_segments"]
    )


def test_merge_three_generations(ray_session, dirs, tmp_path):
    """Chained extension: ((A + B) + C) == full(A∪B∪C)."""
    n_c = 30
    root = tmp_path
    c_c = str(root / "corpus_c")
    os.makedirs(c_c)
    tc = generate_corpus(n_c, seed=SEED, start=N_A + N_B)
    pq.write_table(tc, os.path.join(c_c, "part-00000.parquet"))
    fullabc_c = str(root / "corpus_abc")
    os.makedirs(fullabc_c)
    pq.write_table(
        pa.concat_tables(
            [
                generate_corpus(N_A, seed=SEED, start=0),
                generate_corpus(N_B, seed=SEED, start=N_A),
                tc,
            ]
        ),
        os.path.join(fullabc_c, "part-00000.parquet"),
        row_group_size=32,
    )
    f_i = str(root / "idx_fullabc")
    build_index(fullabc_c, f_i, BuildConfig(**CFG))
    d2_i = str(root / "idx_delta_c")
    m2_i = str(root / "idx_merged_abc")
    extend_index(dirs["merged_i"], c_c, d2_i, m2_i)
    assert _read_full_index(m2_i, CFG["num_segments"]) == _read_full_index(
        f_i, CFG["num_segments"]
    )


def test_multi_generation_search_equals_compacted(ray_session, dirs):
    """SearchEngine over UNMERGED [parent, delta] generations — the
    searchable-before-compaction path — must answer every query class
    identically to the compacted index (and therefore to a full
    rebuild)."""
    em = SearchEngine(dirs["merged_i"], mode="local")
    eg = SearchEngine([dirs["a_i"], dirs["delta_i"]], mode="local")
    assert eg.N == em.N and eg.C == em.C and eg.avgdl == em.avgdl
    for q in QUERIES:
        rm, rg = em.search(q), eg.search(q)
        if isinstance(rm, tuple):
            assert rm[0].tolist() == rg[0].tolist(), q
            assert rm[1].tolist() == rg[1].tolist(), q
        else:
            assert rm.tolist() == rg.tolist(), q
    # pruned, dirichlet, and score-by-doc-range paths too
    i1, s1 = eg.search("data fast table", prune=True)
    i2, s2 = em.search("data fast table", prune=False)
    assert i1.tolist() == i2.tolist() and s1.tolist() == s2.tolist()
    i3, s3 = eg.search("data fast table", scorer="dirichlet")
    i4, s4 = em.search("data fast table", scorer="dirichlet")
    assert i3.tolist() == i4.tolist() and s3.tolist() == s4.tolist()
    from informationretrieval_en_people_cn_ray.queryparse import parse

    i5, s5 = eg.ranked_by_range(parse("data fast table"), k=10)
    i6, s6 = em.ranked_by_range(parse("data fast table"), k=10)
    assert i5.tolist() == i6.tolist() and s5.tolist() == s6.tolist()


def test_multi_generation_actor_mode_matches_local(ray_session, dirs):
    """Scatter-gather SegmentSearcher serving over an UNMERGED
    generation list: every query class answers identically to local
    mode (and therefore to the compacted index)."""
    gens = [dirs["a_i"], dirs["delta_i"]]
    el = SearchEngine(gens, mode="local")
    ea = SearchEngine(gens, mode="actors", num_actors=2)
    assert ea.N == el.N and ea.avgdl == el.avgdl
    for q in QUERIES + ["data fast table", "'key order' AND table"]:
        a, b = el.search(q, k=10), ea.search(q, k=10)
        if isinstance(a, tuple):
            assert a[0].tolist() == b[0].tolist(), q
            assert a[1].tolist() == b[1].tolist(), q
        else:
            assert a.tolist() == b.tolist(), q
    # pruned (block-max) + dirichlet + by-range paths through actors
    i1, s1 = ea.search("data fast table", prune=True, k=10)
    i2, s2 = el.search("data fast table", prune=False, k=10)
    assert i1.tolist() == i2.tolist() and s1.tolist() == s2.tolist()
    i3, s3 = ea.search("data fast table", scorer="dirichlet", k=10)
    i4, s4 = el.search("data fast table", scorer="dirichlet", k=10)
    assert i3.tolist() == i4.tolist() and s3.tolist() == s4.tolist()
    from informationretrieval_en_people_cn_ray.queryparse import parse

    i5, s5 = ea.ranked_by_range(parse("data fast table"), k=10)
    i6, s6 = el.ranked_by_range(parse("data fast table"), k=10)
    assert i5.tolist() == i6.tolist() and s5.tolist() == s6.tolist()


def test_multi_generation_actor_mode_with_deletes(ray_session, dirs, tmp_path):
    """Tombstones on individual generations are honored by the
    generation-aware actor path (merged per-actor tombstone set)."""
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    a_i = str(tmp_path / "a_i")
    d_i = str(tmp_path / "d_i")
    shutil.copytree(dirs["a_i"], a_i)
    shutil.copytree(dirs["delta_i"], d_i)
    delete_docs(a_i, [1, 5])
    delete_docs(d_i, [N_A + 2])
    el = SearchEngine([a_i, d_i], mode="local")
    ea = SearchEngine([a_i, d_i], mode="actors", num_actors=2)
    for q in QUERIES + ["data fast table"]:
        a, b = el.search(q, k=None), ea.search(q, k=None)
        ga = (a[0] if isinstance(a, tuple) else a).tolist()
        gb = (b[0] if isinstance(b, tuple) else b).tolist()
        assert ga == gb, q
        assert not {1, 5, N_A + 2} & set(gb), q


def test_delete_docs_filters_all_query_paths(ray_session, dirs, tmp_path):
    """Tombstoned docs vanish from boolean, phrase, ranked, pruned and
    by-range results immediately (Lucene semantics: stats stay as built
    until compaction)."""
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
        load_tombstones,
    )

    idx = str(tmp_path / "idx_del")
    shutil.copytree(dirs["merged_i"], idx)
    base = SearchEngine(idx, mode="local")
    ids0, _ = base.search("data fast", k=None)
    victims = [int(ids0[0]), int(ids0[2])]
    assert delete_docs(idx, victims) == 2
    assert delete_docs(idx, victims[:1]) == 2  # idempotent union
    assert load_tombstones(idx).tolist() == sorted(victims)

    eng = SearchEngine(idx, mode="local")
    for q in QUERIES + ["data fast"]:
        r = eng.search(q, k=None)
        got = (r[0] if isinstance(r, tuple) else r).tolist()
        assert not set(victims) & set(got), q
    i_p, _ = eng.search("data fast table", prune=True, k=10)
    assert not set(victims) & set(i_p.tolist())
    from informationretrieval_en_people_cn_ray.queryparse import parse

    i_r, _ = eng.ranked_by_range(parse("data fast table"), k=10)
    assert not set(victims) & set(i_r.tolist())
    # remaining result set == base minus victims (same stale stats)
    ids1, _ = eng.search("data fast", k=None)
    assert set(ids1.tolist()) == set(ids0.tolist()) - set(victims)


def test_compaction_with_deletes_equals_rebuild(ray_session, dirs, tmp_path):
    """merge_indexes over a tombstoned index physically drops the deleted
    docs: the compacted index equals a FULL REBUILD over the remaining
    rows (ids preserved via an explicit doc_id column)."""
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
        load_tombstones,
    )

    idx = str(tmp_path / "idx_del2")
    shutil.copytree(dirs["merged_i"], idx)
    victims = [0, 7, 33, N_A, N_A + N_B - 1]  # spans both generations
    delete_docs(idx, victims)

    compacted = str(tmp_path / "idx_compacted")
    man = merge_indexes([idx], compacted)  # single-parent = compaction
    assert man["num_docs"] == N_A + N_B - len(victims)
    assert load_tombstones(compacted).size == 0

    # rebuild over remaining rows, original ids carried in a doc_id column
    remain_c = str(tmp_path / "corpus_remain")
    os.makedirs(remain_c)
    t = pa.concat_tables(
        [
            generate_corpus(N_A, seed=SEED, start=0),
            generate_corpus(N_B, seed=SEED, start=N_A),
        ]
    )
    t = t.add_column(
        0, "doc_id", pa.array(range(N_A + N_B), pa.int64())
    ).filter(
        pa.array([i not in set(victims) for i in range(N_A + N_B)])
    )
    pq.write_table(t, os.path.join(remain_c, "part-00000.parquet"))
    rebuilt = str(tmp_path / "idx_rebuilt")
    build_index(
        remain_c, rebuilt, BuildConfig(doc_id_column="doc_id", **CFG)
    )
    assert _read_full_index(compacted, CFG["num_segments"]) == (
        _read_full_index(rebuilt, CFG["num_segments"])
    )

    # docstats match too (logical content; partition boundaries may differ)
    def stats(idx_):
        import glob

        rows = []
        for p in sorted(glob.glob(os.path.join(idx_, "docstats", "part=*"))):
            tt = pq.read_table(os.path.join(p, "docstats.parquet"))
            rows.extend(
                zip(tt["doc_id"].to_pylist(), tt["doc_len"].to_pylist())
            )
        return sorted(rows)

    assert stats(compacted) == stats(rebuilt)
    # and the compacted index answers identically to the rebuilt one
    ec = SearchEngine(compacted, mode="local")
    er = SearchEngine(rebuilt, mode="local")
    for q in QUERIES + ["data fast"]:
        rc, rr = ec.search(q), er.search(q)
        if isinstance(rc, tuple):
            assert rc[0].tolist() == rr[0].tolist(), q
            assert rc[1].tolist() == rr[1].tolist(), q
        else:
            assert rc.tolist() == rr.tolist(), q


def test_compaction_drops_fully_deleted_terms(ray_session, tmp_path):
    """A term whose every posting is tombstoned leaves the dictionary."""
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    c = str(tmp_path / "c")
    os.makedirs(c)
    texts = ["unique_marker common words", "common words again"]
    pq.write_table(
        pa.table(
            {
                "content": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(c, "part-00000.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=1,
                                    stem=False))
    delete_docs(idx, [0])
    out = str(tmp_path / "o")
    merge_indexes([idx], out)
    eng = SearchEngine(out, mode="local")
    assert eng.local.postings("unique_marker") is None
    assert eng.local.postings("common").doc_ids.tolist() == [1]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_compaction_fuzz_random_deletes(ray_session, dirs, tmp_path, seed):
    """Random delete sets (including none and generation-spanning) keep
    the compacted index logically identical to the tombstone-filtered
    generational view: same boolean result sets for a term battery."""
    import shutil

    import numpy as np

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    rng = np.random.RandomState(seed)
    victims = sorted(
        int(x) for x in rng.choice(N_A + N_B, size=rng.randint(1, 25),
                                   replace=False)
    )
    idx = str(tmp_path / "idx")
    shutil.copytree(dirs["merged_i"], idx)
    delete_docs(idx, victims)
    out = str(tmp_path / "out")
    man = merge_indexes([idx], out)
    assert man["num_docs"] == N_A + N_B - len(victims)

    et = SearchEngine(idx, mode="local")  # tombstone-filtered view
    ec = SearchEngine(out, mode="local")  # physically compacted
    for q in ["data", "table", "scan AND join", "'key order'", "me*"]:
        rt, rc = et.search(q, k=None), ec.search(q, k=None)
        it = (rt[0] if isinstance(rt, tuple) else rt).tolist()
        ic = (rc[0] if isinstance(rc, tuple) else rc).tolist()
        assert sorted(it) == sorted(ic), (q, victims[:5])
        assert not set(victims) & set(ic)


def test_compaction_mixed_generations(ray_session, dirs, tmp_path):
    """Tombstones on ONE generation only: the untombed generation must
    byte-copy through while the tombed one rewrites — output identical
    to a rebuild over the remaining rows."""
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    delta = str(tmp_path / "delta_tombed")
    shutil.copytree(dirs["delta_i"], delta)
    victims = [N_A + 1, N_A + 9]  # delta-generation ids only
    delete_docs(delta, victims)
    out = str(tmp_path / "compacted")
    man = merge_indexes([dirs["a_i"], delta], out)
    assert man["num_docs"] == N_A + N_B - len(victims)

    remain_c = str(tmp_path / "remain")
    os.makedirs(remain_c)
    t = pa.concat_tables(
        [
            generate_corpus(N_A, seed=SEED, start=0),
            generate_corpus(N_B, seed=SEED, start=N_A),
        ]
    )
    t = t.add_column(
        0, "doc_id", pa.array(range(N_A + N_B), pa.int64())
    ).filter(pa.array([i not in set(victims) for i in range(N_A + N_B)]))
    pq.write_table(t, os.path.join(remain_c, "part-00000.parquet"))
    rebuilt = str(tmp_path / "rebuilt")
    build_index(remain_c, rebuilt, BuildConfig(doc_id_column="doc_id", **CFG))
    assert _read_full_index(out, CFG["num_segments"]) == _read_full_index(
        rebuilt, CFG["num_segments"]
    )


def test_tiered_generations_without_merge(ray_session, dirs, tmp_path):
    """Lucene-style tiered pattern: append generations WITHOUT merging —
    each extend costs only the delta build — and serve from the
    generation list; a later compaction of all generations equals the
    full rebuild."""
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_generation,
    )

    n_c, n_d = 16, 12
    for name, n, start in (("c", n_c, N_A + N_B), ("d", n_d, N_A + N_B + n_c)):
        cdir = str(tmp_path / f"corpus_{name}")
        os.makedirs(cdir)
        pq.write_table(
            generate_corpus(n, seed=SEED, start=start),
            os.path.join(cdir, "part-00000.parquet"),
        )
    gens = [dirs["a_i"], dirs["delta_i"]]
    gens = extend_generation(
        gens, str(tmp_path / "corpus_c"), str(tmp_path / "gen_c")
    )
    gens = extend_generation(
        gens, str(tmp_path / "corpus_d"), str(tmp_path / "gen_d")
    )
    assert len(gens) == 4

    full_c = str(tmp_path / "corpus_all")
    os.makedirs(full_c)
    pq.write_table(
        pa.concat_tables(
            [
                generate_corpus(N_A, seed=SEED, start=0),
                generate_corpus(N_B, seed=SEED, start=N_A),
                generate_corpus(n_c, seed=SEED, start=N_A + N_B),
                generate_corpus(n_d, seed=SEED, start=N_A + N_B + n_c),
            ]
        ),
        os.path.join(full_c, "part-00000.parquet"),
        row_group_size=32,
    )
    full_i = str(tmp_path / "idx_all")
    build_index(full_c, full_i, BuildConfig(**CFG))

    ef = SearchEngine(full_i, mode="local")
    eg = SearchEngine(gens, mode="local")
    for q in QUERIES + ["data fast table"]:
        rf, rg = ef.search(q), eg.search(q)
        if isinstance(rf, tuple):
            assert rf[0].tolist() == rg[0].tolist(), q
            assert rf[1].tolist() == rg[1].tolist(), q
        else:
            assert rf.tolist() == rg.tolist(), q

    compacted = str(tmp_path / "idx_compacted_all")
    merge_indexes(gens, compacted)
    assert _read_full_index(compacted, CFG["num_segments"]) == (
        _read_full_index(full_i, CFG["num_segments"])
    )


def test_search_many_over_generations(ray_session, dirs):
    """The actor-pool batch query path accepts a generation list (each
    QueryEval actor opens a GenerationalSegments view) and matches the
    compacted index row for row."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        search_many,
    )

    qset = ["data fast table", "table AND scan", "'key order'"]
    a = (
        search_many(dirs["merged_i"], qset, k=5, concurrency=2)
        .to_pandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    b = (
        search_many([dirs["a_i"], dirs["delta_i"]], qset, k=5, concurrency=2)
        .to_pandas()
        .sort_values(["query", "rank"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_document_update_recipe(ray_session, dirs, tmp_path):
    """UPDATE = tombstone the old version + extend with the new one (the
    standard segment-index recipe): the new content is searchable, the
    old content is gone, and compaction makes it physical."""
    import shutil

    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_generation,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    import numpy as np

    idx = str(tmp_path / "base")
    shutil.copytree(dirs["merged_i"], idx)
    eng0 = SearchEngine(idx, mode="local")
    # pick the corpus's most frequent term straight from the dictionary
    # (already stemmed — query via the postings API, stemming is not
    # idempotent so it cannot round-trip through the parser)
    r0 = eng0.local.reader(0)
    hot = str(r0.terms[int(np.argmax(r0.df))])
    victim_ids = eng0.local.postings(hot).doc_ids
    assert victim_ids.size > 0
    victim = int(victim_ids[0])
    delete_docs(idx, [victim])

    new_c = str(tmp_path / "new_version")
    os.makedirs(new_c)
    pq.write_table(
        pa.table(
            {"content": pa.array(["freshly updated zzznew content"])}
        ),
        os.path.join(new_c, "p.parquet"),
    )
    gens = extend_generation(idx, new_c, str(tmp_path / "gen_new"))
    eng = SearchEngine(gens, mode="local")
    # old version invisible
    assert victim not in set(eng.local.postings(hot).doc_ids.tolist())
    # new version findable, with a brand-new doc id above all others
    hits = eng.search("zzznew AND zzznew")
    assert hits.size == 1 and int(hits[0]) == N_A + N_B
    # compaction preserves both facts
    compacted = str(tmp_path / "compacted")
    merge_indexes(gens, compacted)
    ec = SearchEngine(compacted, mode="local")
    assert victim not in set(ec.local.postings(hot).doc_ids.tolist())
    assert ec.search("zzznew AND zzznew").tolist() == [N_A + N_B]


def test_compaction_survives_fully_emptied_docstat_partition(
    ray_session, tmp_path
):
    """A compaction that tombstones EVERY doc in one docstat partition
    writes a 0-row docstats.parquet (no row-group stats) — the compacted
    index must still report doc-id bounds, re-merge, extend, and open as
    a generation (ADVICE r3: merge.py _docstat_bounds raised)."""
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_generation,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        GenerationalSegments,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        generate_corpus(8, seed=3, start=0),
        os.path.join(c, "part-00000.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=2))
    delete_docs(idx, [4, 5, 6, 7])  # wipes the second partition entirely
    out = str(tmp_path / "o")
    man = merge_indexes([idx], out)
    assert man["num_docs"] == 4

    assert max_doc_id(out) == 3
    # re-merge (no-op compaction) still accepts the empty partition
    out2 = str(tmp_path / "o2")
    assert merge_indexes([out], out2)["num_docs"] == 4
    # generational open + extend above the surviving max id
    GenerationalSegments([out])
    gens = extend_generation(
        out, c, str(tmp_path / "gen"),
    )
    eng = SearchEngine(gens, mode="local")
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        _docstat_bounds,
    )

    assert _docstat_bounds(gens[-1]) == (4, 11)
    assert eng.search("data OR fast OR table").size > 0


def test_compaction_of_fully_deleted_index(ray_session, tmp_path):
    """Deleting EVERY doc then compacting yields a live, empty index:
    max_doc_id == -1, searches return nothing, and a later extend
    restarts layout ids at 0."""
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_generation,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    c = str(tmp_path / "c")
    os.makedirs(c)
    pq.write_table(
        generate_corpus(6, seed=4, start=0),
        os.path.join(c, "part-00000.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(c, idx, BuildConfig(num_segments=2, docstat_partitions=2))
    delete_docs(idx, list(range(6)))
    out = str(tmp_path / "o")
    man = merge_indexes([idx], out)
    assert man["num_docs"] == 0
    assert max_doc_id(out) == -1
    assert SearchEngine(out, mode="local").search("data OR fast").size == 0
    gens = extend_generation(out, c, str(tmp_path / "gen"))
    eng = SearchEngine(gens, mode="local")
    assert eng.search("data OR fast").size > 0


@pytest.mark.parametrize("seed", [7, 8])
def test_exact_delete_stats_equals_rebuild(ray_session, dirs, tmp_path, seed):
    """SearchEngine(exact_delete_stats=True) over a tombstoned index
    scores EXACTLY like a fresh rebuild over the surviving docs — ids
    AND float-identical scores for BM25, Dirichlet, pruned (falls back,
    still identical) and by-range paths — without compaction."""
    import random
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    rng = random.Random(seed)
    victims = sorted(rng.sample(range(N_A + N_B), 17))
    idx = str(tmp_path / "idx")
    shutil.copytree(dirs["merged_i"], idx)
    delete_docs(idx, victims)

    remain_c = str(tmp_path / "remain")
    os.makedirs(remain_c)
    t = pa.concat_tables(
        [
            generate_corpus(N_A, seed=SEED, start=0),
            generate_corpus(N_B, seed=SEED, start=N_A),
        ]
    )
    t = t.add_column(
        0, "doc_id", pa.array(range(N_A + N_B), pa.int64())
    ).filter(pa.array([i not in set(victims) for i in range(N_A + N_B)]))
    pq.write_table(t, os.path.join(remain_c, "part-00000.parquet"))
    rebuilt = str(tmp_path / "rebuilt")
    build_index(remain_c, rebuilt, BuildConfig(doc_id_column="doc_id", **CFG))

    ex = SearchEngine(idx, mode="local", exact_delete_stats=True)
    rb = SearchEngine(rebuilt, mode="local")
    assert ex.N == rb.N and ex.C == rb.C and ex.avgdl == rb.avgdl
    for q in ["data fast table", "merge sort key", "data", "'key order'"]:
        for kw in (
            dict(scorer="bm25"),
            dict(scorer="dirichlet"),
            dict(scorer="bm25", prune=True),
        ):
            a = ex.search(q, k=10, **kw)
            b = rb.search(q, k=10, **kw)
            if isinstance(a, tuple):
                assert a[0].tolist() == b[0].tolist(), (q, kw)
                assert a[1].tolist() == b[1].tolist(), (q, kw)
            else:
                assert a.tolist() == b.tolist(), (q, kw)
    from informationretrieval_en_people_cn_ray.queryparse import parse

    i1, s1 = ex.ranked_by_range(parse("data fast table"), k=10)
    i2, s2 = rb.ranked_by_range(parse("data fast table"), k=10)
    assert i1.tolist() == i2.tolist() and s1.tolist() == s2.tolist()
    # and DEFAULT mode keeps Lucene semantics: same ids, stale-stat scores
    st = SearchEngine(idx, mode="local")
    ia, sa = st.search("data fast table", k=10)
    assert not set(victims) & set(ia.tolist())
    assert st.N == N_A + N_B  # as-built


def test_exact_delete_stats_over_generations(ray_session, dirs, tmp_path):
    """exact_delete_stats composes with a generation list (per-gen
    tombstones subtract from the combined stats)."""
    import shutil

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    a_i, d_i = str(tmp_path / "a"), str(tmp_path / "d")
    shutil.copytree(dirs["a_i"], a_i)
    shutil.copytree(dirs["delta_i"], d_i)
    delete_docs(a_i, [2, 3])
    delete_docs(d_i, [N_A + 1])
    victims = {2, 3, N_A + 1}

    remain_c = str(tmp_path / "remain")
    os.makedirs(remain_c)
    t = pa.concat_tables(
        [
            generate_corpus(N_A, seed=SEED, start=0),
            generate_corpus(N_B, seed=SEED, start=N_A),
        ]
    )
    t = t.add_column(
        0, "doc_id", pa.array(range(N_A + N_B), pa.int64())
    ).filter(pa.array([i not in victims for i in range(N_A + N_B)]))
    pq.write_table(t, os.path.join(remain_c, "part-00000.parquet"))
    rebuilt = str(tmp_path / "rebuilt")
    build_index(remain_c, rebuilt, BuildConfig(doc_id_column="doc_id", **CFG))

    ex = SearchEngine([a_i, d_i], mode="local", exact_delete_stats=True)
    rb = SearchEngine(rebuilt, mode="local")
    assert ex.N == rb.N and ex.C == rb.C and ex.avgdl == rb.avgdl
    for q in ["data fast table", "merge sort key"]:
        a = ex.search(q, k=10)
        b = rb.search(q, k=10)
        assert a[0].tolist() == b[0].tolist(), q
        assert a[1].tolist() == b[1].tolist(), q


def test_reader_never_sees_torn_state_during_compaction(
    ray_session, dirs, tmp_path
):
    """A reader serving a generation list WHILE a compaction commits
    must never observe a torn state: (1) compaction writes into a NEW
    directory, so the generation dirs it reads are immutable and every
    generation-list answer during the merge equals the pre-merge answer;
    (2) the output index only becomes openable when collection.json —
    written LAST — exists, and from that moment it answers identically
    too (partition manifests commit before the collection manifest)."""
    import shutil
    import threading

    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    a_i, d_i = str(tmp_path / "a"), str(tmp_path / "d")
    shutil.copytree(dirs["a_i"], a_i)
    shutil.copytree(dirs["delta_i"], d_i)
    delete_docs(a_i, [0, 9])  # give the merge real tombstone work
    gens = [a_i, d_i]
    out = str(tmp_path / "compacted")

    baseline = {}
    eng0 = SearchEngine(gens, mode="local")
    for q in QUERIES:
        r = eng0.search(q, k=None)
        baseline[q] = (r[0] if isinstance(r, tuple) else r).tolist()
    # expected answers of the COMPACTED index (scores legitimately
    # differ from the stale-stats generation list: compaction recomputes
    # collection/term statistics) — the merge is deterministic given
    # (parents, tombstones), so a reference run pins them
    ref = str(tmp_path / "ref_compacted")
    merge_indexes(gens, ref)
    er = SearchEngine(ref, mode="local")
    expected_c = {}
    for q in QUERIES:
        r = er.search(q, k=None)
        expected_c[q] = (r[0] if isinstance(r, tuple) else r).tolist()

    errors: list[str] = []
    done = threading.Event()

    def reader():
        # fresh engine per iteration — exercises open-from-disk mid-merge
        while not done.is_set():
            try:
                e = SearchEngine(gens, mode="local")
                for q in QUERIES:
                    r = e.search(q, k=None)
                    got = (r[0] if isinstance(r, tuple) else r).tolist()
                    if got != baseline[q]:
                        errors.append(f"gen-list drift on {q!r}")
                try:
                    ec = SearchEngine(out, mode="local")
                except FileNotFoundError:
                    continue  # not committed yet — the only legal failure
                for q in QUERIES:
                    r = ec.search(q, k=None)
                    got = (r[0] if isinstance(r, tuple) else r).tolist()
                    if got != expected_c[q]:
                        errors.append(f"compacted drift on {q!r}")
            except Exception as ex:  # torn state would surface here
                errors.append(f"{type(ex).__name__}: {ex}")

    t = threading.Thread(target=reader)
    t.start()
    try:
        merge_indexes(gens, out)
    finally:
        done.set()
        t.join()
    assert not errors, errors[:5]
    # post-commit: the concurrent compaction equals the reference one
    ec = SearchEngine(out, mode="local")
    for q in QUERIES:
        r = ec.search(q, k=None)
        got = (r[0] if isinstance(r, tuple) else r).tolist()
        assert got == expected_c[q], q


def test_maybe_compact_policy_and_cli_append(ray_session, dirs, tmp_path, capsys):
    """Tiered policy: appends stay cheap until the generation count hits
    the threshold, then one compaction serves from a single index that
    answers queries identically to the generation list."""
    import json as _json

    from informationretrieval_en_people_cn_ray.__main__ import main
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        maybe_compact,
    )
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    gens = [dirs["a_i"], dirs["delta_i"]]
    assert maybe_compact(gens, str(tmp_path / "never"), 4) == (gens, False)
    assert not os.path.exists(str(tmp_path / "never"))

    cdir = str(tmp_path / "c_corpus")
    os.makedirs(cdir)
    pq.write_table(
        generate_corpus(10, seed=SEED, start=N_A + N_B),
        os.path.join(cdir, "part-00000.parquet"),
    )
    rc = main(
        [
            "append", ",".join(gens), cdir, str(tmp_path / "gen_c"),
            "--compact-at", "3", "--compact-out", str(tmp_path / "compacted"),
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["compacted"] and out["generations"] == [
        str(tmp_path / "compacted")
    ]
    before = SearchEngine(gens + [str(tmp_path / "gen_c")], mode="local")
    after = SearchEngine(out["generations"][0], mode="local")
    for q in ["data value", "the AND data"]:
        a, b = before.search(q, k=10), after.search(q, k=10)
        if isinstance(a, tuple):
            assert [int(x) for x in a[0]] == [int(x) for x in b[0]]
        else:
            assert a.tolist() == b.tolist()


def test_search_many_sees_deletes_through_warm_workers(
    ray_session, dirs, tmp_path
):
    """The warm-worker engine cache is keyed by the index's on-disk
    state token: a search_many call AFTER delete_docs must not serve a
    stale cached engine (which would resurrect the deleted doc) even
    when Ray reuses the exact worker process that answered the previous
    batch."""
    import shutil

    from informationretrieval_en_people_cn_ray.pipelines.search import (
        search_many,
    )
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    idx = str(tmp_path / "idx_warm_del")
    shutil.copytree(dirs["merged_i"], idx)
    q = ["data fast table"]
    # concurrency=1 + one query → a single task, maximizing the chance
    # of landing on the same warm worker both times
    before = search_many(idx, q, k=10, concurrency=1).to_pandas()
    assert len(before) > 0
    victim = int(before["doc_id"].iloc[0])
    delete_docs(idx, [victim])
    for _ in range(3):  # several tasks → at least one hits a warm worker
        after = search_many(idx, q, k=10, concurrency=1).to_pandas()
        assert victim not in set(after["doc_id"].tolist())


def _strip_max_tf(index_dir):
    """Rewrite every segment dictionary WITHOUT the max_tf column — the
    shape of an index built before that column existed."""
    import glob as _glob

    for tp in _glob.glob(
        os.path.join(index_dir, "postings", "seg=*", "terms.parquet")
    ):
        t = pq.read_table(tp)
        if "max_tf" in t.column_names:
            pq.write_table(t.drop_columns(["max_tf"]), tp)


def test_legacy_dictionary_without_max_tf(ray_session, dirs, tmp_path):
    """Pre-max_tf dictionaries must stay SOUND: the pruned scorer falls
    back to the ctf upper bound (rank-identical to unpruned, never a
    silent drop), and a merge over such a parent backfills the column
    instead of dying on a schema mismatch."""
    import shutil

    idx = str(tmp_path / "idx_legacy")
    shutil.copytree(dirs["a_i"], idx)
    _strip_max_tf(idx)

    eng = SearchEngine(idx, mode="local")
    for q in ["data fast table", "the key value", "scan data"]:
        i_p, s_p = eng.search(q, prune=True, k=10)
        i_u, s_u = eng.search(q, prune=False, k=10)
        assert i_p.tolist() == i_u.tolist(), q
        assert abs(s_p - s_u).max() < 1e-9

    # merging a legacy parent with a current-schema delta must work
    merged = str(tmp_path / "idx_legacy_merged")
    extend_index(idx, dirs["b_c"], str(tmp_path / "idx_legacy_delta"), merged)
    em = SearchEngine(merged, mode="local")
    eref = SearchEngine(dirs["merged_i"], mode="local")
    for q in ["data fast table", "scan data"]:
        a, _ = em.search(q, k=10)
        b, _ = eref.search(q, k=10)
        assert a.tolist() == b.tolist(), q


def test_merge_removes_stale_partitions(ray_session, dirs, tmp_path):
    """Leftover seg=*/docstats/part=* dirs from an earlier different-
    shape merge into the same out_dir must not survive — readers glob
    them without fingerprint checks and would serve duplicate stats."""
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        merge_indexes,
    )

    out = str(tmp_path / "idx_restale")
    stale_part = os.path.join(out, "docstats", "part=00099")
    stale_seg = os.path.join(out, "seg=00099")
    os.makedirs(stale_part)
    os.makedirs(stale_seg)
    # plant plausible content so a glob-based reader would pick them up
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10**6], pa.int64()),
                "doc_len": pa.array([1], pa.int64()),
            }
        ),
        os.path.join(stale_part, "docstats.parquet"),
    )
    m = merge_indexes([dirs["a_i"], dirs["delta_i"]], out)
    assert not os.path.exists(stale_part)
    assert not os.path.exists(stale_seg)
    assert m["num_docs"] == N_A + N_B
    eng = SearchEngine(out)
    assert eng.N == N_A + N_B
