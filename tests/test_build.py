"""Ray index build vs single-process oracle: term-for-term equality,
partitioning invariance, salted-build identity, resume (SURVEY.md §5.2)."""

import json
import os
import shutil

import numpy as np
import pytest

from informationretrieval_en_people_cn_ray.codec import decode_posting_blob
from informationretrieval_en_people_cn_ray.corpus import write_corpus
from informationretrieval_en_people_cn_ray.oracle import OracleIndex
from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)
from informationretrieval_en_people_cn_ray.stages.postings import term_seg
from informationretrieval_en_people_cn_ray.stages.segments import SegmentReader

N_DOCS = 120
SEED = 7


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, N_DOCS, seed=SEED, num_parquet_files=3)
    return d


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    return OracleIndex.from_corpus(corpus_dir)


@pytest.fixture(scope="module")
def index_dir(ray_session, corpus_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(corpus_dir, d, BuildConfig(num_segments=4, docstat_partitions=2))
    return d


def _read_full_index(index_dir, num_segments):
    """index → {term: (doc_ids, tfs, positions_by_doc)} — merged across
    giant-term chunks."""
    out = {}
    for seg in range(num_segments):
        r = SegmentReader(index_dir, seg)
        for t in dict.fromkeys(r.terms.tolist()):
            lo, hi = r.term_range(t)
            d, tf, pos, starts, df, ctf = r.postings_merged(
                lo, hi, with_positions=True
            )
            pos_by_doc = [
                pos[starts[k] : starts[k] + tf[k]].tolist()
                for k in range(len(d))
            ]
            assert term_seg(t, num_segments) == seg
            out[t] = (d.tolist(), tf.tolist(), pos_by_doc, df, ctf)
    return out


def test_index_equals_oracle(index_dir, oracle):
    got = _read_full_index(index_dir, 4)
    assert set(got) == set(oracle.postings)
    for t, plist in oracle.postings.items():
        doc_ids, tfs, pos_by_doc, df, ctf = got[t]
        exp_docs = [d for d, _ in plist]
        exp_pos = [p for _, p in plist]
        assert doc_ids == exp_docs, t
        assert tfs == [len(p) for p in exp_pos], t
        assert pos_by_doc == exp_pos, t
        assert df == len(exp_docs) and ctf == sum(len(p) for p in exp_pos), t


def test_docstats_equal_oracle(index_dir, oracle):
    import pyarrow.parquet as pq

    got = {}
    for part in range(2):
        t = pq.read_table(
            os.path.join(index_dir, "docstats", f"part={part:05d}", "docstats.parquet")
        )
        ids = t["doc_id"].to_pylist()
        assert ids == sorted(ids)
        got.update(zip(ids, t["doc_len"].to_pylist()))
    assert got == oracle.doc_len


def test_collection_manifest(index_dir, oracle):
    with open(os.path.join(index_dir, "collection.json")) as f:
        m = json.load(f)
    assert m["num_docs"] == oracle.N
    assert m["total_tokens"] == oracle.C
    assert m["n_terms"] == len(oracle.postings)
    assert abs(m["avgdl"] - oracle.avgdl) < 1e-9


def test_partitioning_invariance(ray_session, corpus_dir, index_dir, tmp_path):
    """Different batch size / segment layout / file split must yield the
    same logical index (SURVEY.md §7.4 R4)."""
    d2 = str(tmp_path / "idx2")
    build_index(
        corpus_dir,
        d2,
        BuildConfig(num_segments=7, docstat_partitions=3, fragments_per_task=2),
    )
    a = _read_full_index(index_dir, 4)
    b = _read_full_index(d2, 7)
    assert a == b


def _read_docstats(index_dir, parts):
    """per-partition (ids, lens) + global sortedness check."""
    import pyarrow.parquet as pq

    out = []
    prev_max = None
    for part in range(parts):
        t = pq.read_table(
            os.path.join(
                index_dir, "docstats", f"part={part:05d}", "docstats.parquet"
            )
        )
        ids = t["doc_id"].to_pylist()
        assert ids == sorted(ids)
        if prev_max is not None and ids:
            assert ids[0] > prev_max  # global sortedness across parts
        if ids:
            prev_max = ids[-1]
        out.append((ids, t["doc_len"].to_pylist()))
    return out


def test_salted_build_identical(ray_session, corpus_dir, index_dir, tmp_path):
    """Salted pre-merge is a pure performance knob: identical index —
    including docstat partitions, the artifact a bad salt key corrupts
    (docstat pseudo-rows share a term but differ in seg)."""
    d2 = str(tmp_path / "idx_salted")
    build_index(
        corpus_dir,
        d2,
        BuildConfig(
            num_segments=4, docstat_partitions=2, salt=3, fragments_per_task=3
        ),
    )
    assert _read_full_index(index_dir, 4) == _read_full_index(d2, 4)
    assert _read_docstats(index_dir, 2) == _read_docstats(d2, 2)
    # BYTE identity of the posting blobs — the guarantee that lets
    # exec-only knobs (salt, task sizing) stay out of the build
    # fingerprint: retuning them must never force a rebuild
    for seg in range(4):
        b1 = open(os.path.join(index_dir, f"seg={seg:05d}", "postings.bin"), "rb").read()
        b2 = open(os.path.join(d2, f"seg={seg:05d}", "postings.bin"), "rb").read()
        assert b1 == b2, f"salted build changed postings bytes in seg {seg}"
    # and the query path over the salted index works end-to-end (the
    # historical failure mode was an IndexError in DocStats.lens_for)
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    e1, e2 = SearchEngine(index_dir), SearchEngine(d2)
    ids1, s1 = e1.search("the data value", k=10)
    ids2, s2 = e2.search("the data value", k=10)
    assert [int(x) for x in ids1] == [int(x) for x in ids2]
    assert np.allclose(s1, s2, atol=0)


def test_exec_knobs_do_not_refingerprint(ray_session, corpus_dir, tmp_path):
    """Changing a performance-only knob (task sizing, salt) must reuse
    the existing index via the collection.json short-circuit; changing a
    content knob (stem) must not."""
    d = str(tmp_path / "idx_fp")
    m1 = build_index(
        corpus_dir, d, BuildConfig(num_segments=4, docstat_partitions=2)
    )
    m2 = build_index(
        corpus_dir,
        d,
        BuildConfig(
            num_segments=4,
            docstat_partitions=2,
            salt=3,
            fragments_per_task=4,
            tokenize_num_cpus=2.0,
            reduce_num_cpus=2.0,
        ),
    )
    assert m2["build_fingerprint"] == m1["build_fingerprint"]
    assert m2["wall_s"] == m1["wall_s"]  # returned verbatim, no rebuild
    fp_stemless = BuildConfig(
        num_segments=4, docstat_partitions=2, stem=False
    ).key()
    assert fp_stemless != BuildConfig(
        num_segments=4, docstat_partitions=2
    ).key()


def test_resume_skips_complete_partitions(ray_session, corpus_dir, tmp_path):
    d = str(tmp_path / "idx_resume")
    cfg = BuildConfig(num_segments=4, docstat_partitions=2)
    m1 = build_index(corpus_dir, d, cfg)
    assert not any(p["skipped"] for p in m1["partitions"])

    # whole-build short-circuit on collection.json
    m2 = build_index(corpus_dir, d, cfg)
    assert m2["build_fingerprint"] == m1["build_fingerprint"]
    assert m2["wall_s"] == m1["wall_s"]  # manifest returned verbatim, no work

    # simulate a crash after some partitions: nuke one partition + collection.json
    os.remove(os.path.join(d, "collection.json"))
    shutil.rmtree(os.path.join(d, "seg=00002"))
    m3 = build_index(corpus_dir, d, cfg)
    by_part = {(p["kind"], p["seg"]): p for p in m3["partitions"]}
    assert not by_part[("postings", 2)]["skipped"]
    skipped = [p for p in m3["partitions"] if p["skipped"]]
    assert len(skipped) == len(m3["partitions"]) - 1
    # and the resumed build's numbers match the original
    for k in ("num_docs", "total_tokens", "n_terms", "postings_bytes"):
        assert m3[k] == m1[k]


def test_sha_invariant_enforced(ray_session, tmp_path):
    """A corrupted content_sha256 must fail the build."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = str(tmp_path / "bad_corpus")
    write_corpus(src, 20, seed=3, num_parquet_files=1)
    f = os.path.join(src, "part-00000.parquet")
    t = pq.read_table(f)
    shas = t["content_sha256"].to_pylist()
    shas[5] = "0" * 64
    t = t.set_column(
        t.schema.get_field_index("content_sha256"),
        "content_sha256",
        pa.array(shas),
    )
    pq.write_table(t, f)
    with pytest.raises(Exception, match="sha256|RayTaskError"):
        build_index(src, str(tmp_path / "bad_idx"), BuildConfig(num_segments=2))


def test_chunked_blobs_identical(ray_session, corpus_dir, index_dir, tmp_path):
    """Giant-term posting chunking (max_blob_docs) is a pure storage
    layout knob: merged reads and queries are identical; hot terms span
    multiple chunk rows in the dictionary."""
    import pyarrow.parquet as pq
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    d2 = str(tmp_path / "idx_chunked")
    build_index(
        corpus_dir,
        d2,
        BuildConfig(num_segments=4, docstat_partitions=2, max_blob_docs=16),
    )
    # the logical index (merged across chunks) is unchanged
    a = _read_full_index(index_dir, 4)
    b = _read_full_index(d2, 4)
    assert a == b
    # 'the' (present in ~every doc) must actually be chunked
    from informationretrieval_en_people_cn_ray.stages.postings import term_seg

    seg = term_seg("the", 4)
    tt = pq.read_table(os.path.join(d2, f"seg={seg:05d}", "terms.parquet"))
    the_rows = [x for x in tt["term"].to_pylist() if x == "the"]
    assert len(the_rows) > 1  # chunked
    # queries identical across layouts
    e1 = SearchEngine(index_dir)
    e2 = SearchEngine(d2)
    for q in ["the data value", "'quoted string' AND the", "th* AND data"]:
        r1, r2 = e1.search(q, k=10), e2.search(q, k=10)
        if isinstance(r1, tuple):
            assert [int(x) for x in r1[0]] == [int(x) for x in r2[0]]
            assert np.allclose(r1[1], r2[1], atol=0)
        else:
            assert list(r1) == list(r2)
    # pruned path too
    a1 = e1.search("the data value", k=5, prune=True)
    a2 = e2.search("the data value", k=5, prune=True)
    assert [int(x) for x in a1[0]] == [int(x) for x in a2[0]]


def test_merge_runs_disjoint_fast_path_equals_general_gather():
    """The disjoint-run fast path (whole-run concatenation) must produce
    byte-identical output to the general per-doc gather, and interleaved
    runs (the salted pre-merge shape) must still take the correct slow
    path."""
    import numpy as np

    from informationretrieval_en_people_cn_ray.stages.postings import (
        merge_runs,
    )

    rng = np.random.RandomState(0)

    def mk_run(ids):
        ids = np.asarray(sorted(ids), np.int64)
        tfs = rng.randint(1, 9, len(ids)).astype(np.int64)
        lens = rng.randint(1, 6, len(ids)).astype(np.int64)
        pb = rng.bytes(int(lens.sum()))
        return ids, tfs, pb, lens

    # disjoint ranges, deliberately passed OUT of order (+ an empty run)
    r1 = mk_run(range(100, 150))
    r2 = mk_run(range(0, 40))
    r3 = mk_run(range(500, 510))
    r0 = (np.empty(0, np.int64), np.empty(0, np.int64), b"",
          np.empty(0, np.int64))
    runs = [r1, r0, r2, r3]
    d, t, pb, pl = merge_runs(
        [r[0] for r in runs], [r[1] for r in runs],
        [r[2] for r in runs], [r[3] for r in runs],
    )
    assert np.array_equal(d, np.r_[r2[0], r1[0], r3[0]])
    assert np.array_equal(t, np.r_[r2[1], r1[1], r3[1]])
    assert pb == r2[2] + r1[2] + r3[2]
    assert np.array_equal(pl, np.r_[r2[3], r1[3], r3[3]])

    # interleaved runs (salted pre-merge can mix fragments): general
    # gather must reorder per doc — verify against a hand merge
    a = mk_run([0, 4, 8])
    b = mk_run([1, 5, 9])
    d2, t2, pb2, pl2 = merge_runs(
        [a[0], b[0]], [a[1], b[1]], [a[2], b[2]], [a[3], b[3]]
    )
    assert d2.tolist() == [0, 1, 4, 5, 8, 9]
    # reconstruct expected per-doc byte slices
    def slices(run):
        out, pos = [], 0
        for ln in run[3]:
            out.append(run[2][pos : pos + int(ln)])
            pos += int(ln)
        return out
    sa, sb = slices(a), slices(b)
    assert pb2 == sa[0] + sb[0] + sa[1] + sb[1] + sa[2] + sb[2]
    assert t2.tolist() == [
        int(a[1][0]), int(b[1][0]), int(a[1][1]),
        int(b[1][1]), int(a[1][2]), int(b[1][2]),
    ]

    # duplicate doc ids across runs must raise on either path
    import pytest as _pytest

    dup = mk_run([10, 11])
    with _pytest.raises(ValueError):
        merge_runs(
            [dup[0], dup[0]], [dup[1], dup[1]],
            [dup[2], dup[2]], [dup[3], dup[3]],
        )


def test_build_rejects_mixed_sha_corpus(ray_session, tmp_path):
    """verify_sha over a corpus where only SOME files carry
    content_sha256 must fail loudly — silently skipping the invariant
    (or crashing mid-build on the schema mismatch) hides data loss."""
    import pyarrow.parquet as pq

    from informationretrieval_en_people_cn_ray.corpus import generate_corpus
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )

    d = str(tmp_path / "mixed")
    os.makedirs(d)
    t = generate_corpus(20, seed=3)
    pq.write_table(t.slice(0, 10), os.path.join(d, "part-00000.parquet"))
    pq.write_table(
        t.slice(10, 10).drop_columns(["content_sha256"]),
        os.path.join(d, "part-00001.parquet"),
    )
    with pytest.raises(ValueError, match="only some files"):
        build_index(d, str(tmp_path / "idx"), BuildConfig(num_segments=2))


def test_positions_free_index_rejects_phrase(ray_session, corpus_dir, tmp_path):
    """Phrase/proximity queries on a store_positions=False index raise a
    clear ValueError (not an opaque numpy IndexError), while plain
    ranked/boolean queries still work."""
    from informationretrieval_en_people_cn_ray.pipelines.search import (
        SearchEngine,
    )

    d = str(tmp_path / "idx_nopos")
    build_index(
        corpus_dir,
        d,
        BuildConfig(
            num_segments=2, docstat_partitions=1, store_positions=False
        ),
    )
    eng = SearchEngine(d)
    ids, scores = eng.search("the data", k=5)
    assert len(ids) > 0
    with pytest.raises(ValueError, match="store_positions"):
        eng.search("'the data'")
    with pytest.raises(ValueError, match="store_positions"):
        eng.proximity("the", "data", within=3)
