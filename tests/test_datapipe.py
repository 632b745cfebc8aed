"""Training-data ops on inputs with planted duplicates + hashing parity +
multimodal stage plumbing."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from informationretrieval_en_people_cn_ray.functions.hashing import (
    hamming64,
    md5_i63,
    md5_u64,
    minhash_signature,
    rolling_fingerprint,
    shingles,
    simhash64,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu"


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dup"))
    texts = [
        BASE,
        BASE,  # exact dup of 0
        BASE + " extra",  # near dup of 0
        "totally different words here now ok",
        BASE.replace("beta", "xyz"),
        BASE,  # exact dup of 0
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 6, pa.string()),
                "source": pa.array(["s"] * 6, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_md5_u64_matches_duckdb():
    con = duckdb.connect()
    for s in ["", "abc", "0:alpha beta gamma", "ünïcode §"]:
        assert con.execute(
            "select md5_number_lower(?)", [s]
        ).fetchone()[0] == md5_u64(s)
        assert con.execute(
            "select (md5_number_lower(?) & 9223372036854775807)::bigint", [s]
        ).fetchone()[0] == md5_i63(s)


def test_shingles():
    assert shingles(["a", "b", "c", "d"]) == ["a b c", "b c d"]
    assert shingles(["a", "b"]) == ["a b"]
    assert shingles([]) == [""]


def test_minhash_identical_docs_identical_sigs():
    s1 = minhash_signature(shingles(BASE.split()), 8)
    s2 = minhash_signature(shingles(BASE.split()), 8)
    s3 = minhash_signature(shingles((BASE + " extra").split()), 8)
    assert s1 == s2
    assert sum(a == b for a, b in zip(s1, s3)) >= 4  # near dup: most agree


def test_simhash_near_dup_close_hamming():
    def tfs(text):
        d = {}
        for t in text.split():
            d[t] = d.get(t, 0) + 1
        return d

    a = simhash64(tfs(BASE))
    b = simhash64(tfs(BASE + " extra"))
    c = simhash64(tfs("totally different words here now ok"))
    assert hamming64(np.array([b], dtype=np.int64), a)[0] <= 12
    assert hamming64(np.array([c], dtype=np.int64), a)[0] > 12
    assert simhash64(tfs(BASE)) == a  # deterministic


def test_rolling_fingerprint_order_sensitive():
    assert rolling_fingerprint(["a", "b"]) != rolling_fingerprint(["b", "a"])
    assert rolling_fingerprint([]) == 0
    assert rolling_fingerprint(["a", "b"]) == rolling_fingerprint(["a", "b"])


def test_exact_dedup_with_planted_dups(ray_session, dup_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    keep = dp._to_table(dp.exact_dedup_keepers(dup_dir))
    assert sorted(keep["doc_id"].to_pylist()) == [0, 2, 3, 4]


def test_near_dup_pairs_with_planted_dups(ray_session, dup_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    pairs = dp._to_table(dp.near_dup_pairs(dup_dir, jaccard_threshold=0.8))
    got = {
        (a, b): j
        for a, b, j in zip(
            pairs["doc_a"].to_pylist(),
            pairs["doc_b"].to_pylist(),
            pairs["jaccard"].to_pylist(),
        )
    }
    assert got[(0, 1)] == 1.0 and got[(0, 5)] == 1.0 and got[(1, 5)] == 1.0
    assert (0, 2) in got and got[(0, 2)] > 0.8  # near dup caught by LSH
    assert all(a != 3 and b != 3 for a, b in got)  # unrelated doc clean


def test_near_dup_pairs_hot_bucket_vs_brute_force(
    ray_session, tmp_path_factory
):
    """Hot-bucket stress for the vectorized bucket verifier: many EXACT
    duplicates (the 100×-scale hazard the r4 verdict flagged) plus
    distinct near-dups, compared pair-for-pair against a pure-Python
    LSH + set-jaccard brute force built from the same primitives."""
    import itertools

    from informationretrieval_en_people_cn_ray.pipelines import (
        datapipe as dp,
    )
    from informationretrieval_en_people_cn_ray.text import tokenize

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(40)]
    base_a = " ".join(words[:25])
    base_b = " ".join(words[:24] + ["zz"])  # near dup of a
    texts = [base_a] * 40 + [base_b] * 30
    for i in range(20):  # distinct near-dups: one word perturbed
        toks = base_a.split()
        toks[int(rng.integers(0, len(toks)))] = f"x{i}"
        texts.append(" ".join(toks))
    for i in range(30):  # unrelated
        texts.append(" ".join(f"u{i}_{j}" for j in range(20)))
    n = len(texts)
    d = str(tmp_path_factory.mktemp("hotdup"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    thr = 0.8
    pairs = dp._to_table(dp.near_dup_pairs(d, jaccard_threshold=thr))
    got = {
        (a, b): j
        for a, b, j in zip(
            pairs["doc_a"].to_pylist(),
            pairs["doc_b"].to_pylist(),
            pairs["jaccard"].to_pylist(),
        )
    }

    # brute force: same shingle/minhash primitives, per-pair band check
    sets, bands = [], []
    for t in texts:
        sh = shingles(tokenize(t.lower()))
        sets.append(set(sh))
        sig = minhash_signature(sh, 8)
        bands.append([(b, sig[2 * b], sig[2 * b + 1]) for b in range(4)])
    exp = {}
    for i, j in itertools.combinations(range(n), 2):
        if not set(bands[i]) & set(bands[j]):
            continue  # not an LSH candidate
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        jac = inter / union if union else 1.0
        if jac >= thr:
            exp[(i, j)] = jac
    assert got == exp
    assert len(exp) > 1000  # the exact-dup block really is hot


def test_media_decode_stage(ray_session):
    import ray.data

    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        FrameSample,
        MediaDecode,
        DECODED_SCHEMA,
        synthesize_media_table,
    )

    tbl = synthesize_media_table(30, seed=7)
    ds = ray.data.from_arrow(tbl)
    decoded = ds.map_batches(
        MediaDecode, batch_size=8, batch_format="pyarrow", concurrency=2
    )
    out = pa.concat_tables(
        [t for t in __import__("ray").get(decoded.to_arrow_refs()) if t.num_columns]
    )
    assert out.schema.equals(DECODED_SCHEMA)
    assert out.num_rows == 30
    feats = out["feature"].to_pylist()
    assert all(len(f) == 16 for f in feats)
    # deterministic: same payload → same feature
    d2 = ray.data.from_arrow(tbl).map_batches(
        MediaDecode, batch_size=16, batch_format="pyarrow", concurrency=1
    )
    out2 = pa.concat_tables(
        [t for t in __import__("ray").get(d2.to_arrow_refs()) if t.num_columns]
    )
    assert out.sort_by("media_id").equals(out2.sort_by("media_id"))

    frames = decoded.map_batches(
        FrameSample, batch_size=16, batch_format="pyarrow", concurrency=1
    )
    ftbl = pa.concat_tables(
        [t for t in __import__("ray").get(frames.to_arrow_refs()) if t.num_columns]
    )
    kinds = dict(zip(out["media_id"].to_pylist(), out["kind"].to_pylist()))
    assert all(kinds[m] == "video" for m in ftbl["media_id"].to_pylist())


def test_media_strict_and_real_codecs(ray_session):
    """strict mode decodes REAL payloads (BMP/PPM/WAV/Y4M pure-python
    codecs) and raises only when a compressed-format payload appears."""
    import pyarrow as pa

    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        MediaDecode,
        synthesize_media_table,
    )

    real = synthesize_media_table(9, seed=5, real=True)
    out = MediaDecode(strict=True)(real)
    assert out.num_rows == 9
    # image rows decode their true encoded dimensions
    from informationretrieval_en_people_cn_ray.stages import mediacodecs as mc
    for i in range(9):
        p = real["payload"][i].as_py()
        fmt = mc.sniff(p)
        assert fmt is not None
        if fmt in ("bmp", "ppm"):
            img = mc.decode_bmp(p) if fmt == "bmp" else mc.decode_ppm(p)
            assert out["width"][i].as_py() == img.shape[1]
            assert out["height"][i].as_py() == img.shape[0]
        if fmt == "y4m":
            assert out["n_frames"][i].as_py() == len(mc.decode_y4m(p))

    fake = synthesize_media_table(3, seed=5, real=False)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MediaDecode(strict=True)(fake)
    # non-strict falls back to the deterministic fake on the same rows
    assert MediaDecode(strict=False)(fake).num_rows == 3


def test_hashing_embedder_deterministic_and_geometric():
    """ST3 stage: identical text → identical embedding regardless of
    batching/actor; near-identical texts → high cosine; disjoint-vocab
    texts → much lower cosine."""
    import numpy as np

    from informationretrieval_en_people_cn_ray.stages.embedder import (
        HashingEmbedder,
    )

    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumps over the lazy cat"
    c = "import numpy as something else entirely unrelated words"
    e1 = HashingEmbedder(dim=32).embed([a, b, c])
    e2 = HashingEmbedder(dim=32).embed([c, a])  # fresh model, other batch
    assert np.allclose(e1[0], e2[1], atol=0)  # deterministic across actors
    assert np.allclose(e1[2], e2[0], atol=0)
    assert np.allclose((e1 * e1).sum(axis=1), 1.0)  # L2-normalized
    cos_ab = float(e1[0] @ e1[1])
    cos_ac = float(e1[0] @ e1[2])
    assert cos_ab > 0.8 and cos_ab > cos_ac + 0.3
    # empty text embeds to the zero vector, not NaN
    z = HashingEmbedder(dim=32).embed([""])
    assert np.allclose(z, 0.0)


def test_embed_then_topk_pipeline(ray_session):
    """Corpus → actor-pool embedding → ANN: doc 0 ranks itself first with
    cosine 1.0; output is the top-k contract shape."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp.embed_then_topk("/root/testdata/sf0.001", k=10)
    assert t.column_names == ["doc_id", "cos"]
    assert t.num_rows == 10
    assert t["doc_id"][0].as_py() == 0 and t["cos"][0].as_py() == 1.0
    cos = t["cos"].to_pylist()
    assert cos == sorted(cos, reverse=True)


def _write_synonym_corpus(d: str) -> str:
    """Corpus where 'kumquat' and 'loquat' appear in IDENTICAL context
    distributions (and 'granite' in a disjoint one) — a trained model
    must place the synonym pair near each other; the hashing model has
    no way to (their hashes are unrelated)."""
    os.makedirs(d, exist_ok=True)
    ctx = [
        "the farmer picked a ripe {} from the orchard tree",
        "she sliced the sweet {} into the fruit salad bowl",
        "a basket of fresh {} sat on the market stall",
        "he planted a young {} sapling beside the fence",
    ]
    texts = []
    for i in range(40):
        texts.append(ctx[i % 4].format("kumquat"))
        texts.append(ctx[(i + 1) % 4].format("loquat"))
        texts.append("the mason carved hard granite into a heavy block")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_trained_embeddings_synonym_geometry(ray_session, tmp_path):
    """PPMI-SVD training gate (SURVEY.md §2 ST3, the reference's Doc2Vec):
    planted synonyms rank in each other's top-3 word neighbors, the
    disjoint-context word does not rank first, and document embeddings
    are deterministic, L2-normalized, and batch-placement-invariant."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = _write_synonym_corpus(str(tmp_path / "syn"))
    m = dp.train_embeddings(d, dim=8, window=3, vocab_size=64, min_count=1)
    nb = m.word_neighbors("kumquat", 3)
    assert "loquat" in [w for w, _ in nb], nb
    nb2 = m.word_neighbors("loquat", 3)
    assert "kumquat" in [w for w, _ in nb2], nb2
    assert m.word_neighbors("granite", 1)[0][0] not in ("kumquat", "loquat")

    texts = ["the farmer picked a ripe kumquat", "granite block", ""]
    e1 = m.embed(texts)
    e2 = m.embed([texts[2], texts[0], texts[1]])  # other batch order
    assert np.allclose(e1[0], e2[1], atol=0) and np.allclose(e1[1], e2[2], atol=0)
    norms = (e1 * e1).sum(axis=1)
    assert np.allclose(norms[:2], 1.0) and norms[2] == 0.0  # empty → zero


def test_embedding_trained_topk_pipeline(ray_session, tmp_path):
    """Corpus → train → broadcast → actor-pool inference → top-k: doc 0
    ranks itself first at cosine 1.0 and same-synonym docs beat the
    disjoint-context docs."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = _write_synonym_corpus(str(tmp_path / "syn2"))
    t = dp.embedding_trained_topk(d, k=10, dim=8)
    assert t.column_names == ["doc_id", "cos"]
    assert t.num_rows == 10
    assert t["doc_id"][0].as_py() == 0 and t["cos"][0].as_py() == 1.0
    cos = t["cos"].to_pylist()
    assert cos == sorted(cos, reverse=True)
    # doc 0 is a kumquat context; every granite doc (ids ≡ 2 mod 3) must
    # rank below the fruit docs in its top-k
    top_ids = t["doc_id"].to_pylist()
    assert all(i % 3 != 2 for i in top_ids[:5]), top_ids


def test_partitioned_sink_resume(ray_session, tmp_path):
    """write_partitioned: commit-marker-last, fingerprint-keyed skip on
    re-run, unreadable before commit."""
    import ray.data

    from informationretrieval_en_people_cn_ray.state.sink import (
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    ds = ray.data.range(1000)
    m1 = write_partitioned(ds, out, "fp1")
    assert m1["rows"] == 1000 and not m1["skipped"] and m1["files"] >= 1
    back = read_partitioned(out)
    assert back.count() == 1000
    # same fingerprint → skipped, data untouched
    m2 = write_partitioned(ray.data.range(5), out, "fp1")
    assert m2["skipped"] and read_partitioned(out).count() == 1000
    # new fingerprint → rewritten
    m3 = write_partitioned(ray.data.range(5), out, "fp2")
    assert not m3["skipped"] and read_partitioned(out).count() == 5
    # a sink without a committed manifest is not readable
    import os, shutil

    os.remove(os.path.join(out, "manifest.json"))
    with pytest.raises(FileNotFoundError):
        read_partitioned(out)


def test_partitioned_sink_partial_resume(ray_session, tmp_path):
    """Kill-mid-write resume granularity: a job that committed only some
    partitions re-runs ONLY the missing ones — committed partition files
    are not rewritten, and the resumed output is complete and exact."""
    import os
    import time

    import ray.data

    from informationretrieval_en_people_cn_ray.state.sink import (
        _part_dir,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    write_partitioned(ray.data.range(1000), out, "fp1", num_partitions=4)
    # simulate a crash after 3 of 4 partitions committed: global manifest
    # never written, partition 2's commit marker missing
    os.remove(os.path.join(out, "manifest.json"))
    os.remove(os.path.join(_part_dir(out, 2), "manifest.json"))
    survivors = {
        p: os.path.getmtime(os.path.join(_part_dir(out, p), "data.parquet"))
        for p in (0, 1, 3)
    }
    time.sleep(0.05)
    m = write_partitioned(ray.data.range(1000), out, "fp1", num_partitions=4)
    assert m["resumed_partitions"] == 3 and m["rows"] == 1000
    for p, t in survivors.items():
        assert (
            os.path.getmtime(os.path.join(_part_dir(out, p), "data.parquet"))
            == t
        ), f"committed partition {p} was rewritten on resume"
    ids = sorted(
        r["id"] for r in read_partitioned(out).take_all()
    )
    assert ids == list(range(1000))


# ---------------------------------------------------------------------------
# round-2 additions: cosine near-dup, sliding window, as-of join, IVF ANN

SF001 = "/root/testdata/sf0.001"


def test_embedding_cosine_pairs_matches_bruteforce(ray_session):
    """Blocked block-pair fan-out == single-process O(n^2) reference,
    and every pair is emitted exactly once, id-ordered."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.embedding_cosine_pairs(SF001, threshold=0.4))
    got = {
        (a, b): c
        for a, b, c in zip(
            t["vec_a"].to_pylist(), t["vec_b"].to_pylist(), t["cos"].to_pylist()
        )
    }
    assert len(got) == t.num_rows  # no duplicate pairs
    emb = pq.read_table(
        f"{SF001}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = emb["vec_id"].to_numpy()
    X = np.stack([np.asarray(e, np.float64) for e in emb["embedding"].to_pylist()])
    n = np.sqrt((X * X).sum(axis=1))
    C = (X @ X.T) / np.outer(n, n)
    exp = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and C[i, j] >= 0.4:
                # dp.round4 (half-away-from-zero), not python round()
                # (half-even): an exact .xxxx5 tie must not flake
                exp[(int(ids[i]), int(ids[j]))] = dp.round4(float(C[i, j]))
    assert got == exp and len(exp) > 0


def test_events_sliding_window_covers_tumbling(ray_session):
    """Every event lands in exactly window/hop sliding windows: total
    n_events doubles vs tumbling at window=2h hop=1h, and each tumbling
    bucket's count is contained in the matching sliding bucket."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    tum = dp._to_table(dp.events_tumbling_window(SF001))
    sli = dp._to_table(dp.events_sliding_window(SF001, 2, 1))
    assert sli["n_events"].to_numpy().sum() == 2 * tum["n_events"].to_numpy().sum()
    skey = {
        (e, w): n
        for e, w, n in zip(
            sli["event_type"].to_pylist(),
            sli["window_start"].to_pylist(),
            sli["n_events"].to_pylist(),
        )
    }
    for e, w, n in zip(
        tum["event_type"].to_pylist(),
        tum["window_start"].to_pylist(),
        tum["n_events"].to_pylist(),
    ):
        assert skey[(e, w)] >= n  # sliding window ⊇ its tumbling core


def test_asof_join_semantics(ray_session, tmp_path):
    """Planted case: latest order at-or-before wins, date ties break to
    max o_orderkey, events before any order are dropped."""
    import ray.data

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(
                    [ts("2024-01-10"), ts("2024-01-20"), ts("2023-12-01"), ts("2024-02-01")],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([7, 7, 7, 9], pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                "value": pa.array([1.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102, 200], pa.int64()),
                "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4, pa.string()),
                "o_totalprice": pa.array([10.0, 11.0, 12.0, 20.0], pa.float64()),
                # 100 and 101 tie on date → 101 (max key) must win
                "o_orderdate": pa.array(
                    [ts("2024-01-05"), ts("2024-01-05"), ts("2024-01-15"), ts("2024-01-01")],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["x"] * 4, pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    t = dp._to_table(dp.asof_join_events_orders(d))
    got = {
        e: (k, p)
        for e, k, p in zip(
            t["event_id"].to_pylist(),
            t["o_orderkey"].to_pylist(),
            t["o_totalprice"].to_pylist(),
        )
    }
    assert got == {
        1: (101, 11.0),  # tie on 2024-01-05 → max orderkey
        2: (102, 12.0),  # latest at-or-before 01-20
        4: (200, 20.0),
        # event 3 (before any order) dropped
    }


def test_embedding_ivf_recall(ray_session):
    """IVF with nprobe=nlist degenerates to exact brute force (rank and
    value identical to embedding_topk); at nprobe<nlist recall@10 stays
    useful (>= 0.5 on the synthetic table)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    exact = dp.embedding_topk(SF001, k=10)
    full = dp.embedding_ivf_topk(SF001, k=10, nlist=4, nprobe=4)
    assert full["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
    assert np.allclose(full["cos"].to_numpy(), exact["cos"].to_numpy(), atol=2e-4)
    approx = dp.embedding_ivf_topk(SF001, k=10, nlist=8, nprobe=2)
    rec = len(set(approx["vec_id"].to_pylist()) & set(exact["vec_id"].to_pylist())) / 10
    assert rec >= 0.5, rec
    # determinism: same call, same result
    again = dp.embedding_ivf_topk(SF001, k=10, nlist=8, nprobe=2)
    assert again["vec_id"].to_pylist() == approx["vec_id"].to_pylist()


def test_range_join_count_matches_duckdb(ray_session):
    """Band-bucketed range join == DuckDB non-equi join + count, at
    sf0.001 (the candidate pairs never materialize in the engine)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.range_join_count(SF001))
    got = dict(zip(t["event_id"].to_pylist(), t["n_orders"].to_pylist()))
    con = duckdb.connect()
    for tb in ("events", "orders"):
        con.execute(f"create view {tb} as select * from '{SF001}/{tb}.parquet'")
    exp = dict(
        con.sql(
            """select e.event_id, count(*) from events e join orders o
               on o.o_totalprice >= e.value*1000
              and o.o_totalprice < e.value*1000 + 5000
              group by e.event_id"""
        ).fetchall()
    )
    assert got == exp and len(exp) > 0


def test_hll_distinct_users_error_bound(ray_session):
    """HLL estimate within 5% of the exact distributed count distinct
    (well inside spec for 4096 registers at these cardinalities)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    exact = dp._to_table(dp.distinct_users(SF001))
    est = dp._to_table(dp.hll_distinct_users(SF001))
    e = dict(zip(exact["event_type"].to_pylist(), exact["n_users"].to_pylist()))
    h = dict(zip(est["event_type"].to_pylist(), est["n_users_est"].to_pylist()))
    assert set(e) == set(h)
    for k in e:
        assert abs(h[k] - e[k]) / e[k] <= 0.05, (k, e[k], h[k])


def test_media_resize_stage(ray_session):
    """Aspect-preserving fit through the actor-pool stage with REAL
    pixel resampling for the pure-python codecs: resized BMP/PPM
    payloads re-decode to the new dimensions with nearest-neighbor
    pixel identity; Y4M keeps its frame count at even fitted dims;
    audio passes through; unrecognized payloads use the fake fallback
    (and raise under strict)."""
    import ray.data

    from informationretrieval_en_people_cn_ray.stages import mediacodecs as mc
    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        MediaDecode,
        MediaResize,
        synthesize_media_table,
    )

    src = synthesize_media_table(30, seed=3, real=True)
    decoded = MediaDecode(keep_payload=True)(src)
    out = ray.data.from_arrow(decoded).map_batches(
        MediaResize, fn_constructor_kwargs=dict(max_w=24, max_h=20),
        batch_size=8, batch_format="pyarrow", concurrency=2,
    )
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(out).combine_chunks()
    by_id = {r["media_id"]: r for r in t.to_pylist()}
    for i in range(30):
        r = by_id[i]
        k = src["kind"][i].as_py()
        w = decoded["width"][i].as_py()
        h = decoded["height"][i].as_py()
        p0 = src["payload"][i].as_py()
        if k == "audio" or (w <= 24 and h <= 20):
            assert (r["width"], r["height"]) == (w, h)
            assert r["payload"] == p0
            continue
        assert r["width"] <= 24 and r["height"] <= 20
        fmt = mc.sniff(p0)
        if fmt in ("bmp", "ppm"):
            # aspect preserved to integer rounding; pixels really resampled
            assert abs(r["width"] / r["height"] - w / h) < 0.35
            img0 = mc.decode_bmp(p0) if fmt == "bmp" else mc.decode_ppm(p0)
            img1 = (
                mc.decode_bmp(r["payload"])
                if fmt == "bmp"
                else mc.decode_ppm(r["payload"])
            )
            assert img1.shape == (r["height"], r["width"], 3)
            import numpy as np

            assert np.array_equal(
                img1, mc.resize_nearest(img0, r["width"], r["height"])
            )
        elif fmt == "y4m":
            frames1 = mc.decode_y4m(r["payload"])
            assert len(frames1) == decoded["n_frames"][i].as_py()
            assert r["width"] % 2 == 0 and r["height"] % 2 == 0
            assert frames1.shape[1:] == (r["height"], r["width"])

    # unrecognized payloads: fake fallback shrinks bytes; strict raises
    fake_src = synthesize_media_table(6, seed=3, real=False)
    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        fake_decode,
    )
    dims = [
        fake_decode(p.as_py(), k.as_py())
        for p, k in zip(fake_src["payload"], fake_src["kind"])
    ]
    fake_decoded = pa.table(
        {
            "media_id": fake_src["media_id"],
            "kind": fake_src["kind"],
            "width": pa.array([d["width"] for d in dims], pa.int32()),
            "height": pa.array([d["height"] for d in dims], pa.int32()),
            "n_frames": pa.array([d["n_frames"] for d in dims], pa.int32()),
            "payload": fake_src["payload"],
        }
    )
    shrunk = MediaResize(max_w=40, max_h=40)(fake_decoded)
    for i in range(6):
        if fake_src["kind"][i].as_py() != "audio":
            assert shrunk["width"][i].as_py() <= 40
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        MediaResize(max_w=40, max_h=40, strict=True)(fake_decoded)

def test_embedding_cosine_pairs_lsh_subset_and_recall(ray_session):
    """LSH-bucketed near-dup is a strict subset of the exact op with
    identical cos values (precision 1), and recall stays useful."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    exact = dp._to_table(dp.embedding_cosine_pairs(SF001, threshold=0.4))
    approx = dp._to_table(dp.embedding_cosine_pairs_lsh(SF001, threshold=0.4))
    e = {
        (a, b): c
        for a, b, c in zip(
            exact["vec_a"].to_pylist(),
            exact["vec_b"].to_pylist(),
            exact["cos"].to_pylist(),
        )
    }
    g = {
        (a, b): c
        for a, b, c in zip(
            approx["vec_a"].to_pylist(),
            approx["vec_b"].to_pylist(),
            approx["cos"].to_pylist(),
        )
    }
    assert set(g) <= set(e)  # precision 1
    for k, v in g.items():
        assert v == e[k]  # same exact cosine on survivors
    assert len(g) / len(e) >= 0.2, (len(g), len(e))  # useful recall


def test_media_pipeline_end_to_end(ray_session):
    """decode → resize → frame-sample as one streaming pipeline: only
    video rows emit frames, stride respected, deterministic."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        real_decode,
        synthesize_media_table,
    )

    t = dp._to_table(dp.media_pipeline("", n=90))
    src = synthesize_media_table(90, seed=7)
    kinds = src["kind"].to_pylist()
    expected = 0
    for i, k in enumerate(kinds):
        if k == "video":
            nf = real_decode(src["payload"][i].as_py())["n_frames"]
            expected += len(range(0, nf, 8))
    assert t.num_rows == expected
    frames = t["frame"].to_pylist()
    assert all(f % 8 == 0 for f in frames)
    t2 = dp._to_table(dp.media_pipeline("", n=90))
    assert t.sort_by([("media_id","ascending"),("frame","ascending")]).equals(
        t2.sort_by([("media_id","ascending"),("frame","ascending")]))


@pytest.mark.parametrize("wh,hh", [(3, 1), (4, 2), (6, 3)])
def test_sliding_window_generalized_params(ray_session, wh, hh):
    """Non-default window/hop combos against a pure-Python reference
    over the real events table (the SQL oracle only covers 2h/1h)."""
    from collections import defaultdict

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.events_sliding_window(SF001, wh, hh))
    got = {
        (e, w): (n, s)
        for e, w, n, s in zip(
            t["event_type"].to_pylist(),
            t["window_start"].to_pylist(),
            t["n_events"].to_pylist(),
            t["sum_value_milli"].to_pylist(),
        )
    }
    ev = pq.read_table(f"{SF001}/events.parquet", columns=["ts", "event_type", "value"])
    hop_us = hh * 3600 * 1_000_000
    exp = defaultdict(lambda: [0, 0])
    import datetime as dtm

    for ts, et, v in zip(
        ev["ts"].cast(pa.int64()).to_pylist(),
        ev["event_type"].to_pylist(),
        ev["value"].to_pylist(),
    ):
        mv = int(np.floor(v * 1000.0))
        for off in range(wh // hh):
            w_us = (ts // hop_us - off) * hop_us
            w = dtm.datetime.utcfromtimestamp(w_us / 1e6)
            exp[(et, w)][0] += 1
            exp[(et, w)][1] += mv
    assert got == {k: tuple(v) for k, v in exp.items()}


# ---------------------------------------------------------------------------
# round-3 relational extras


@pytest.fixture(scope="module")
def rel_dir(tmp_path_factory):
    """Tiny planted relational fixture: 2 langs, known length order, a
    doc that is one bigram repeated, customers with/without events."""
    d = str(tmp_path_factory.mktemp("rel"))
    texts = [
        "a b a b a b a b",        # top bigram 'a b' x4 of 7 bigrams
        "one two three four",     # all bigrams distinct
        "solo",                   # 0 bigrams
        "x y z",
        "m n o p q r",
    ]
    langs = ["en", "en", "en", "de", "de"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * 5, pa.string()),
                "n_chars": pa.array([15, 18, 18, 5, 11], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": pa.array(["a", "b", "c", "d"], pa.string()),
                "c_nationkey": pa.array([0] * 4, pa.int64()),
                "c_acctbal": pa.array([10.005, -3.21, 0.0, 99.99], pa.float64()),
                "c_mktsegment": pa.array(["M"] * 4, pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([100, 101, 102], pa.int64()),
                "ts": pa.array([1, 2, 3], pa.timestamp("us")),
                "user_id": pa.array([2, 2, 4], pa.int64()),
                "event_type": pa.array(["t"] * 3, pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def test_topk_per_group_tiebreak(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.topk_per_group(rel_dir, k=2))
    rows = sorted(
        zip(
            t["lang"].to_pylist(),
            t["rnk"].to_pylist(),
            t["doc_id"].to_pylist(),
            t["n_chars"].to_pylist(),
        )
    )
    # en: n_chars 15,18,18 → top2 = (18, doc 1 wins tie by doc_id), (18, doc 2)
    # de: 5, 11 → top2 = doc 4 (11), doc 3 (5)
    assert rows == [
        ("de", 1, 4, 11),
        ("de", 2, 3, 5),
        ("en", 1, 1, 18),
        ("en", 2, 2, 18),
    ]


def test_semi_anti_join_partition(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    semi = dp._to_table(dp.semi_anti_join_customers(rel_dir, anti=False))
    anti = dp._to_table(dp.semi_anti_join_customers(rel_dir, anti=True))
    assert sorted(semi["c_custkey"].to_pylist()) == [2, 4]
    assert sorted(anti["c_custkey"].to_pylist()) == [1, 3]
    # semi + anti partition the dimension exactly
    assert semi.num_rows + anti.num_rows == 4
    cents = dict(
        zip(anti["c_custkey"].to_pylist(), anti["acctbal_cents"].to_pylist())
    )
    assert cents[1] == 1001 and cents[3] == 0  # round-half-away exact cents


def test_doclen_quantiles_rank_rule(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp.doclen_quantiles(rel_dir)
    got = {
        r["lang"]: (r["p50"], r["p90"], r["p99"])
        for r in t.to_pylist()
    }
    # en sorted: [15, 18, 18], n=3 → rank p50=(150+99)//100=2 → 18;
    # p90=(270+99)//100=3 → 18; p99 → 3 → 18
    # de sorted: [5, 11], n=2 → p50 rank (100+99)//100=1 → 5; p90/p99 → 2 → 11
    assert got == {"en": (18, 18, 18), "de": (5, 11, 11)}


def test_top_bigram_frac_planted(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.top_bigram_frac(rel_dir))
    by = {r["doc_id"]: r for r in t.to_pylist()}
    assert by[0]["n_bigrams"] == 7 and by[0]["top_bigram_count"] == 4
    assert by[0]["top_bigram_frac"] == 4 / 7
    assert by[1]["top_bigram_count"] == 1 and by[1]["top_bigram_frac"] == 1 / 3
    assert by[2]["n_bigrams"] == 0 and by[2]["top_bigram_frac"] == 0.0


# ---------------------------------------------------------------------------
# round-3: dedup clustering, sessionization, decontamination, TF-IDF


def test_cc_driver_vs_distributed(ray_session):
    """Both connected-component algorithms produce identical labels on a
    graph with a chain, a triangle, an isolated edge, and a star."""
    import ray as _ray

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain → rep 1
        (10, 11), (11, 12), (10, 12),    # triangle → rep 10
        (20, 21),                        # isolated edge → rep 20
        (30, 31), (30, 32), (30, 33),    # star → rep 30
        (4, 1),                          # cycle back into the chain
    ]
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    n1, l1 = dp._cc_labels_driver(a, b)
    ds = _ray.data.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b)})
    )
    n2, l2 = dp._cc_labels_distributed(ds)
    assert np.array_equal(n1, n2)
    assert np.array_equal(l1, l2)
    got = dict(zip(n1.tolist(), l1.tolist()))
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_dedup_clusters_modes_agree_sf0001(ray_session):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"

    def as_map(mode):
        t = dp._to_table(dp.dedup_clusters(sf, mode=mode))
        return dict(
            zip(t["doc_id"].to_pylist(),
                zip(t["rep_id"].to_pylist(), t["keep"].to_pylist()))
        )

    drv = as_map("driver")
    dist = as_map("distributed")
    assert drv == dist
    # every rep is itself kept, every cluster member points at the min
    for doc, (rep, keep) in drv.items():
        assert rep <= doc
        assert keep == (1 if rep == doc else 0)
        assert drv[rep][0] == rep and drv[rep][1] == 1


@pytest.fixture(scope="module")
def sess_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sess"))
    h = 3_600_000_000  # 1h in µs
    rows = [
        # user 7: 3 events close together, then a 13h gap, then 1 more
        (1, 0 * h, 7), (2, 1 * h, 7), (3, 2 * h, 7), (4, 15 * h, 7),
        # user 8: single event
        (5, 5 * h, 8),
        # user 9: two events exactly 12h apart (== gap → SAME session),
        # then 12h + 1µs (> gap → new session)
        (6, 0 * h, 9), (7, 12 * h, 9), (8, 24 * h + 1, 9),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["t"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def test_sessionize_gap_semantics(ray_session, sess_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.sessionize_events(sess_dir, gap_hours=12))
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in t.to_pylist()
    }
    assert got == {
        1: (7, 0), 2: (7, 0), 3: (7, 0), 4: (7, 1),
        5: (8, 0),
        6: (9, 0), 7: (9, 0), 8: (9, 1),
    }


@pytest.fixture(scope="module")
def decon_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("decon"))
    texts = [
        "alpha beta gamma delta",   # doc 0: the benchmark doc
        "x alpha beta gamma y",     # doc 1: shares trigram 'alpha beta gamma'
        "one two three four five",  # doc 2: clean
        "alpha beta",               # doc 3: <3 tokens, fallback 'alpha beta'
        "beta gamma delta omega",   # doc 4: shares 'beta gamma delta'
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["s"] * 5, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_decontaminate_planted(ray_session, decon_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.decontaminate(decon_dir, benchmark_mod=100))
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in t.to_pylist()
    }
    # doc 0 is the benchmark: full self-overlap (2 trigrams)
    assert got[0] == (2, 1)
    assert got[1] == (1, 1)   # 'alpha beta gamma'
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)   # whole-text fallback 'alpha beta' not banned
    assert got[4] == (1, 1)   # 'beta gamma delta'


def test_tfidf_topk_planted(ray_session, decon_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.tfidf_topk_terms(decon_dir, k=2))
    rows = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["score"])
        for r in t.to_pylist()
    }
    # doc 2's terms are all unique to it (df=1): score = 1·ln(5) for all
    # five, top-2 by term asc tie-break = 'five', 'four'
    assert rows[(2, 1)][0] == "five" and rows[(2, 2)][0] == "four"
    ln5 = np.log(5.0)
    r4 = dp.round4(ln5)
    assert rows[(2, 1)][2] == r4 and rows[(2, 1)][1] == 1
    # doc 0: df(alpha)=3, df(beta)=4, df(gamma)=3, df(delta)=2 →
    # top term is 'delta' (ln(5/2)), then 'alpha'/'gamma' tie → 'alpha'
    assert rows[(0, 1)][0] == "delta"
    assert rows[(0, 2)][0] == "alpha"
    assert rows[(0, 1)][2] == dp.round4(np.log(5.0 / 2.0))


# ---------------------------------------------------------------------------
# round-3: splits, stratified sampling, global n-grams, gopher filter


def test_split_assign_partition_and_determinism(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.functions.hashing import md5_i63
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.split_assign(rel_dir))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert set(rows) == set(range(5))
    for d, r in rows.items():
        b = md5_i63(str(d)) % 100
        assert r["bucket"] == b
        exp = "test" if b < 5 else "val" if b < 10 else "train"
        assert r["split"] == exp
    # same assignment on a second run (determinism is the whole point)
    t2 = dp._to_table(dp.split_assign(rel_dir))
    assert sorted(t.to_pylist(), key=lambda r: r["doc_id"]) == sorted(
        t2.to_pylist(), key=lambda r: r["doc_id"]
    )


def test_stratified_sample_rates(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    all_en = dp._to_table(
        dp.stratified_sample(rel_dir, rates={"en": 100, "de": 0})
    )
    assert sorted(all_en["doc_id"].to_pylist()) == [0, 1, 2]  # en docs only
    none = dp._to_table(dp.stratified_sample(rel_dir, rates={"en": 0, "de": 0}))
    assert none.num_rows == 0


def test_top_ngrams_planted(ray_session, decon_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp.top_ngrams(decon_dir, k=3)
    got = list(
        zip(t["rnk"].to_pylist(), t["ngram"].to_pylist(), t["cnt"].to_pylist())
    )
    # alpha beta x3 (docs 0,1,3), beta gamma x3 (docs 0,1,4) — tie broken
    # ngram asc — then gamma delta x2 (docs 0,4)
    assert got == [
        (1, "alpha beta", 3),
        (2, "beta gamma", 3),
        (3, "gamma delta", 2),
    ]


def test_gopher_filter_planted(ray_session, rel_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.gopher_filter(rel_dir))
    got = {r["doc_id"]: (r["n_tokens"], r["reasons"], r["keep"]) for r in t.to_pylist()}
    # doc 0 "a b a b a b a b": short(1) + mean len 1<4 (2) + tbf 4/7 (8);
    # stopword 'a' gives swf 0.5 ≥ 0.02 so bit 2 does NOT fire
    assert got[0] == (8, 11, 0)
    # doc 1 "one two three four": short + mlen 3.75 + swf 0 + tbf 1/3
    assert got[1] == (4, 15, 0)
    # doc 2 "solo": short + swf floor; mean len exactly 4.0 passes
    assert got[2] == (1, 5, 0)
    # docs 3/4: short + mlen 1 + swf 0 + repeated-bigram cap
    assert got[3] == (3, 15, 0)
    assert got[4] == (6, 15, 0)


def test_to_table_executes_plan_once(ray_session, tmp_path):
    """Regression: Dataset.to_arrow_refs on Ray 2.49 re-executes an
    all-to-all plan a second time (schema fetch with a Limit[1] suffix);
    _to_table must execute exactly once. The map fn drops a marker file
    per invocation — a double execution would double the marker count."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    marker_dir = str(tmp_path)

    def mark(batch: pa.Table) -> pa.Table:
        import os as _os
        import uuid as _uuid

        open(_os.path.join(marker_dir, _uuid.uuid4().hex), "w").close()
        return pa.table(
            {
                "k": batch["id"],
                "v": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    ds = (
        _ray.data.range(1000, override_num_blocks=4)
        .map_batches(mark, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
    )
    t = dp._to_table(ds)
    assert t.num_rows == 1000
    n_markers = len(os.listdir(marker_dir))
    # one marker per map task; a re-executed plan would leave ~2x
    assert n_markers <= 4, f"plan executed more than once ({n_markers} markers)"


def test_running_totals_order_and_exactness(ray_session, sess_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.running_totals(sess_dir))
    got = {r["event_id"]: r["running_cents"] for r in t.to_pylist()}
    # user 7: events 1..4 in ts order, value 1.0 each → 100..400 cents
    assert (got[1], got[2], got[3], got[4]) == (100, 200, 300, 400)
    assert got[5] == 100                      # user 8 single event
    assert (got[6], got[7], got[8]) == (100, 200, 300)  # user 9


def test_event_type_pivot_counts(ray_session, tmp_path):
    import ray as _ray

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    rows = [
        (1, 7, "click"), (2, 7, "click"), (3, 7, "view"),
        (4, 8, "purchase"), (5, 8, "weird-type"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    t = dp._to_table(dp.event_type_pivot(d))
    got = {
        r["user_id"]: (r["n_click"], r["n_error"], r["n_purchase"],
                       r["n_signup"], r["n_view"])
        for r in t.to_pylist()
    }
    assert got == {7: (2, 0, 0, 0, 1), 8: (0, 0, 1, 0, 0)}


def test_partitioned_sink_empty_dataset_schema(ray_session, tmp_path):
    """An all-empty dataset still commits typed empty partitions (the
    schema comes from ds.schema() only on this path — the write itself
    must not trigger a schema prefetch)."""
    import ray as _ray

    from informationretrieval_en_people_cn_ray.state.sink import (
        read_partitioned,
        write_partitioned,
    )

    def drop_all(b: pa.Table) -> pa.Table:
        return b.slice(0, 0)

    ds = _ray.data.range(100).map_batches(drop_all, batch_format="pyarrow")
    out = str(tmp_path / "empty_sink")
    m = write_partitioned(ds, out, "fp-empty", num_partitions=3)
    assert m["rows"] == 0 and m["files"] == 3
    back = read_partitioned(out)
    assert back.count() == 0
    assert "id" in back.schema().names
    # schema-less empty input (row filter drops everything before any
    # typed block exists) still commits a valid, readable manifest
    ds2 = _ray.data.range(100).filter(lambda r: False)
    out2 = str(tmp_path / "empty_sink2")
    m2 = write_partitioned(ds2, out2, "fp-empty", num_partitions=2)
    assert m2["rows"] == 0 and m2["files"] == 2


def test_regex_features_planted(ray_session, decon_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.regex_features(decon_dir))
    got = {
        r["doc_id"]: (r["n_double_vowel"], r["n_er"], r["n_word_a"])
        for r in t.to_pylist()
    }
    # doc 0 "alpha beta gamma delta": no double vowel, no 'er', no lone a
    assert got[0] == (0, 0, 0)
    # doc 2 "one two three four five": 'ee' in three, 'ou' in four → 2;
    # no 'er'; no standalone 'a'
    assert got[2] == (2, 0, 0)


def test_json_props_stats_planted(ray_session, tmp_path):
    import ray as _ray

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    rows = [
        (1, 7, "click", '{"k": 5}'),
        (2, 7, "click", '{"k": -3}'),
        (3, 8, "view", '{"k": 0}'),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    t = dp._to_table(dp.json_props_stats(d))
    got = {
        r["event_type"]: (r["n"], r["sum_k"], r["min_k"], r["max_k"])
        for r in t.to_pylist()
    }
    assert got == {"click": (2, 2, -3, 5), "view": (1, 0, 0, 0)}


def test_sessionize_by_time_equals_by_key(ray_session, sess_dir):
    """The skew-safe time-partitioned sessionizer reconstructs boundary
    merges exactly — identical rows to the key-partitioned path, across
    several range counts (including ranges that slice sessions)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    def rows(mode, **kw):
        t = dp._to_table(dp.sessionize_events(sess_dir, mode=mode, **kw))
        return sorted(
            zip(
                t["user_id"].to_pylist(),
                t["event_id"].to_pylist(),
                t["session_idx"].to_pylist(),
            )
        )

    base = rows("by_key")
    for R in (2, 3, 7, 16):
        assert rows("by_time", time_ranges=R) == base, f"R={R}"


def test_running_totals_by_time_equals_by_key(ray_session, sess_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    def rows(mode, **kw):
        t = dp._to_table(dp.running_totals(sess_dir, mode=mode, **kw))
        return sorted(
            zip(
                t["user_id"].to_pylist(),
                t["event_id"].to_pylist(),
                t["running_cents"].to_pylist(),
            )
        )

    base = rows("by_key")
    for R in (2, 3, 7, 16):
        assert rows("by_time", time_ranges=R) == base, f"R={R}"


def test_degenerate_empty_inputs(ray_session, tmp_path):
    """Empty (0-row, typed) inputs fail loudly where the op is undefined
    and return typed-empty results where it is well-defined."""
    import ray as _ray

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
    from informationretrieval_en_people_cn_ray.pipelines.build import (
        BuildConfig,
        build_index,
    )

    d = str(tmp_path)
    src = "/root/testdata/sf0.001"
    for t in ["documents", "events", "customer", "embeddings"]:
        pq.write_table(
            pq.read_schema(os.path.join(src, f"{t}.parquet")).empty_table(),
            os.path.join(d, f"{t}.parquet"),
        )
    with pytest.raises(ValueError, match="empty corpus"):
        build_index(
            os.path.join(d, "documents.parquet"),
            str(tmp_path / "idx"),
            BuildConfig(num_segments=2),
        )
    bj = dp._to_table(dp.broadcast_join_events_customers(d))
    assert bj.num_rows == 0 and "acctbal_cents" in bj.column_names
    with pytest.raises(ValueError, match="vec_id=0"):
        dp.embedding_topk(d)


def test_bloom_semi_join_one_sided(ray_session, rel_dir):
    """Bloom membership: NO false negatives (every customer with events
    flagged); false positives bounded far under 1% at this load."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.bloom_semi_join(rel_dir))
    got = {
        r["c_custkey"]: r["maybe_has_events"] for r in t.to_pylist()
    }
    assert got[2] == 1 and got[4] == 1      # true members always flagged
    # 3 distinct keys in a 2^20-bit filter: FP probability ~1e-20 —
    # non-members must come back clean
    assert got[1] == 0 and got[3] == 0


def test_poisson_sample_weighting(ray_session, tmp_path):
    import ray as _ray

    from informationretrieval_en_people_cn_ray.functions.hashing import md5_i63
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    n = 300
    nch = np.concatenate([np.zeros(100, np.int64),          # never kept
                          np.full(100, 200, np.int64),      # p = 0.5
                          np.full(100, 4000, np.int64)])    # p = 1 (cap)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    t = dp._to_table(dp.poisson_sample(d))
    kept = set(t["doc_id"].to_pylist())
    assert not kept & set(range(100))            # weight 0 → never
    assert set(range(200, 300)) <= kept          # weight ≥ 1 → always
    mid = [i for i in range(100, 200) if i in kept]
    assert 25 <= len(mid) <= 75                  # p = 0.5 band
    # decision matches the documented hash rule exactly
    for i in range(100, 200):
        expect = (md5_i63(f"poisson:{i}") % 1_000_000) * 400 < 200 * 1_000_000
        assert (i in kept) == expect


def test_countmin_top_ngrams_bounds(ray_session, decon_dir):
    """CountMin estimates only over-count, and at this tiny load the
    sketch is collision-free: estimated top-k equals the exact top-k."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    exact = dp.top_ngrams(decon_dir, k=3)
    est = dp.countmin_top_ngrams(decon_dir, k=3)
    exact_counts = dict(
        zip(exact["ngram"].to_pylist(), exact["cnt"].to_pylist())
    )
    got = list(zip(est["ngram"].to_pylist(), est["cnt_est"].to_pylist()))
    assert [g for g, _ in got] == exact["ngram"].to_pylist()
    for g, e in got:
        assert e >= exact_counts[g]  # one-sided error


def test_value_quantiles_binned_error_bound(ray_session, sess_dir):
    """Binned quantiles land within half a bin width of the exact
    per-type percentiles."""
    import duckdb

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp.value_quantiles_binned(sess_dir, n_bins=1000)
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sess_dir}/events.parquet'"
    )
    exact = con.sql("""
with r as (select event_type, value,
             row_number() over (partition by event_type order by value) rn,
             count(*) over (partition by event_type) n
           from events)
select event_type,
  max(case when rn = (50*n+99)//100 then value end) p50,
  max(case when rn = (90*n+99)//100 then value end) p90,
  max(case when rn = (99*n+99)//100 then value end) p99
from r group by event_type""").df().set_index("event_type")
    # all events share value 1.0 in sess_dir → degenerate but exact;
    # bound = half of (max-min)/1000, where max==min → lo,hi fallback
    for row in t.to_pylist():
        for p in ("p50", "p90", "p99"):
            assert abs(row[p] - exact.loc[row["event_type"], p]) <= 0.5 / 1000 + 1e-9


def test_checked_sketch_entries_flags_true(ray_session):
    """The driver-checkable sketch forms: exact values + an error-bound
    flag that must come out TRUE on real data (the SQL oracle emits the
    same rows with ``true``, so a false flag fails the value hash)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"
    h = dp.hll_distinct_users_checked(sf)
    assert h.num_rows > 0 and all(h["within_bound"].to_pylist())
    q = dp.value_quantiles_checked(sf)
    assert q.num_rows > 0 and all(q["within_bound"].to_pylist())
    c = dp.countmin_top_ngrams_checked(sf)
    assert c.num_rows > 0 and all(c["sketch_ok"].to_pylist())


# ---------------------------------------------------------------------------
# round-3 continuation: PMI, weighted sampling, unigram-LM scoring


@pytest.fixture(scope="module")
def pmi_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pmi"))
    texts = ["a b a b", "b c", "", "a a"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_pmi_bigrams_planted(ray_session, pmi_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    import numpy as np

    t = dp.pmi_bigrams(pmi_dir, min_count=1)
    rows = {r["ngram"]: r for r in t.to_pylist()}
    # token stream: a b a b | b c | (empty) | a a
    # unigrams: a=4 b=3 c=1, N_uni=8; bigrams: "a b"=2 "b a"=1 "b c"=1
    # "a a"=1, N_big=5
    assert rows["a b"]["cnt"] == 2 and len(rows) == 4
    exp = dp.round4(float(np.log((2 * 8.0 * 8.0) / (5 * 4.0 * 3.0))))
    assert rows["a b"]["pmi"] == exp
    exp_aa = dp.round4(float(np.log((1 * 8.0 * 8.0) / (5 * 4.0 * 4.0))))
    assert rows["a a"]["pmi"] == exp_aa


def test_pmi_bigrams_min_count_filters(ray_session, pmi_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp.pmi_bigrams(pmi_dir, min_count=2)
    assert [r["ngram"] for r in t.to_pylist()] == ["a b"]


def test_weighted_sample_matches_local_aes(ray_session):
    """Engine top-k == a single-process replication of the A-ES rule
    over the full sf0.001 table (same md5-derived uniforms)."""
    import duckdb
    import numpy as np

    from informationretrieval_en_people_cn_ray.functions.hashing import (
        md5_i63,
    )
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"
    t = dp.weighted_sample(sf, k=15)
    con = duckdb.connect()
    df = con.sql(
        f"select doc_id, n_chars from '{sf}/documents.parquet'"
        " where n_chars > 0"
    ).df()
    ids = df["doc_id"].to_numpy()
    w = df["n_chars"].to_numpy().astype(np.float64)
    h = np.array([md5_i63(f"wsample:{i}") for i in ids], np.int64)
    u = ((h % dp.WSAMPLE_U_MOD) + 1).astype(np.float64) / 9007199254740992.0
    key = np.log(u) / w
    sel = np.lexsort((ids, -key))[:15]
    assert t["doc_id"].to_pylist() == [int(x) for x in ids[sel]]
    assert t["rnk"].to_pylist() == list(range(1, 16))
    # weight-proportionality sanity: zero-weight rows can never appear
    assert all(c > 0 for c in t["n_chars"].to_pylist())


def test_unigram_logprob_planted(ray_session, pmi_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    import numpy as np

    t = dp._to_table(dp.unigram_logprob(pmi_dir))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    # counts over "a b a b|b c||a a": a=4 b=3 c=1, N=8
    lp = {
        term: int(np.sign(v) * np.floor(abs(v) + 0.5))
        for term, v in (
            (t_, np.log(c / 8.0) * 10000.0)
            for t_, c in (("a", 4), ("b", 3), ("c", 1))
        )
    }
    assert 2 not in rows  # empty doc has no LM score
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["logprob_e4"] == 2 * lp["a"] + 2 * lp["b"]
    assert rows[1]["logprob_e4"] == lp["b"] + lp["c"]
    assert rows[3]["logprob_e4"] == 2 * lp["a"]


def test_kmeans_clusters_matches_local(ray_session):
    """Distributed spherical k-means == a single-process replication
    (same deterministic head-of-first-row-group init, same iterations):
    exact cluster sizes, mean cohesion to float-merge tolerance."""
    import pyarrow.parquet as pqt

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"
    nlist, iters = 6, 2
    t = dp.kmeans_clusters(sf, nlist=nlist, iters=iters)

    def unit(tbl):
        X = np.stack(
            [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
        )
        n = np.linalg.norm(X, axis=1)
        return X / np.where(n == 0, 1, n)[:, None]

    pf = pqt.ParquetFile(f"{sf}/embeddings.parquet")
    head = pf.read_row_group(0, columns=["vec_id", "embedding"])
    order = np.argsort(head["vec_id"].to_numpy(), kind="stable")[:nlist]
    C = unit(head)[order]
    full = pqt.read_table(
        f"{sf}/embeddings.parquet", columns=["embedding"]
    )
    X = unit(full)
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        newc = C.copy()
        for c in range(nlist):
            m = a == c
            if m.any():
                newc[c] = X[m].sum(axis=0) / m.sum()
        n = np.linalg.norm(newc, axis=1)
        C = newc / np.where(n == 0, 1, n)[:, None]
    a = np.argmax(X @ C.T, axis=1)
    best = (X @ C.T)[np.arange(len(X)), a]
    rows = {r["cluster"]: r for r in t.to_pylist()}
    assert sum(r["n"] for r in rows.values()) == len(X)
    for c in range(nlist):
        m = a == c
        assert rows[c]["n"] == int(m.sum())
        if m.any():
            assert abs(rows[c]["mean_cos"] - float(best[m].mean())) <= 2e-4


def test_lang_source_rollup_planted(ray_session, tmp_path):
    """All three rollup levels with hand-computed integer totals."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(["a"] * 4, pa.string()),
                "lang": pa.array(["en", "en", "de", "en"], pa.string()),
                "source": pa.array(["w", "x", "w", "w"], pa.string()),
                "n_chars": pa.array([10, 20, 40, 5], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    t = dp.lang_source_rollup(d)
    rows = {(r["lang"], r["source"]): (r["n"], r["chars"]) for r in t.to_pylist()}
    assert rows[("en", "w")] == (2, 15)
    assert rows[("en", "x")] == (1, 20)
    assert rows[("de", "w")] == (1, 40)
    assert rows[("en", "ALL")] == (3, 35)
    assert rows[("de", "ALL")] == (1, 40)
    assert rows[("ALL", "ALL")] == (4, 75)
    assert len(rows) == 6


def test_type_token_ratio_planted(ray_session, pmi_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.type_token_ratio(pmi_dir))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    # "a b a b" -> 4 tokens 2 types; "b c" -> 2/2; "" omitted; "a a" -> 2/1
    assert 2 not in rows
    assert (rows[0]["n_tokens"], rows[0]["n_distinct"]) == (4, 2)
    assert rows[0]["ttr"] == 0.5
    assert rows[1]["ttr"] == 1.0
    assert (rows[3]["n_tokens"], rows[3]["n_distinct"]) == (2, 1)
    assert rows[3]["ttr"] == 0.5


def test_hash_strings_u64_vectorized_fold():
    """Buffer-fold string hash: stable values, slice/chunk invariance,
    null sentinel, and no trivial collisions (permutations, prefixes,
    unicode)."""
    import pyarrow as pa

    from informationretrieval_en_people_cn_ray.functions.hashing import (
        hash_strings_u64,
    )

    vals = [
        "", "a", "b", "ab", "ba", "abc", "abcd", "abc ", " abc",
        "Straße", "İstanbul", "ﬁsh", None, "\x00null", "null",
        "aa", "aaa", "a" * 100, "a" * 101,
    ]
    arr = pa.array(vals, pa.string())
    h = hash_strings_u64(arr)
    assert h.dtype == np.uint64 and len(h) == len(vals)
    # equal inputs → equal hashes; all distinct inputs here → distinct
    # (None hashes as the \x00null sentinel by design)
    by_val = {}
    for v, x in zip(vals, h):
        key = "\x00null" if v is None else v
        assert by_val.setdefault(key, int(x)) == int(x)
    distinct = {("\x00null" if v is None else v) for v in vals}
    assert len({by_val[k] for k in distinct}) == len(distinct)
    # slice invariance (non-zero array offset) and chunking invariance
    assert hash_strings_u64(arr.slice(3, 5)).tolist() == h[3:8].tolist()
    ch = pa.chunked_array([vals[:7], vals[7:]], pa.string())
    assert hash_strings_u64(ch).tolist() == h.tolist()
    # spread: 1000 sequential keys land in > 900 distinct buckets of 1024
    many = pa.array([f"user_{i}" for i in range(1000)])
    hm = hash_strings_u64(many)
    assert len(np.unique(hm % np.uint64(1024))) > 400  # ~632 expected
    assert len(np.unique(hm)) == 1000


def test_sink_string_key_routing_deterministic(ray_session, tmp_path):
    """String-keyed sink routing is batch-layout independent: the same
    rows land in the same partitions regardless of block structure."""
    from informationretrieval_en_people_cn_ray.state.sink import (
        _row_part_ids,
    )

    t = pa.table(
        {
            "k": pa.array([f"key-{i % 37}" for i in range(500)]),
            "v": pa.array(list(range(500))),
        }
    )
    whole = _row_part_ids(t, ["k"], 8)
    parts = np.concatenate(
        [_row_part_ids(t.slice(o, 100), ["k"], 8) for o in range(0, 500, 100)]
    )
    assert whole.tolist() == parts.tolist()
    assert len(np.unique(whole)) > 1


# ---------------- span dedup / repetition / deltas / PQ ----------------


@pytest.fixture(scope="module")
def span_dir(tmp_path_factory):
    """Docs with PLANTED cross-doc duplicate spans: doc 0 and doc 1 share
    their first 10-token span; doc 2 repeats doc 0's trailing partial
    span; doc 3 repeats a 5-gram within itself."""
    d = str(tmp_path_factory.mktemp("span"))
    s10 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    texts = [
        s10 + " tail one two",  # spans: s10 | "tail one two"
        s10 + " other trailing words",  # first span dups doc 0's
        "lead in words tail one two",  # no span dup (different split)
        "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5 x1 x2",  # in-doc 5-gram repeats
        "tail one two",  # dups doc 0's TRAILING partial span
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_dedup_spans_planted(ray_session, span_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = (
        dp._to_table(dp.dedup_spans(span_dir))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = list(map(tuple, t.values.tolist()))
    assert got == [
        (0, 2, 0),  # wins both its spans
        (1, 2, 1),  # first span is doc 0's s10
        (2, 1, 0),  # same words, different span alignment → no dup
        (3, 2, 0),  # 12 tokens → 2 spans, distinct at span granularity
        (4, 1, 1),  # equals doc 0's trailing "tail one two" span
    ]


def test_dedup_spans_vs_duckdb(ray_session, span_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"'{span_dir}/documents.parquet'"
    )
    exp = (
        con.sql(E.oracle_sql()["dedup_spans"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        dp._to_table(dp.dedup_spans(span_dir))
        .to_pandas()[["doc_id", "n_spans", "n_dup_spans"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == exp.values.tolist()


def test_rep_ngram_frac_planted(ray_session, span_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = (
        dp._to_table(dp.rep_ngram_frac(span_dir))
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 3: tokens x1..x5 x1..x5 x1 x2 → 8 grams, distinct 5 → 3/8
    assert t.loc[3, "n_grams"] == 8
    assert t.loc[3, "rep_frac"] == pytest.approx(0.375)
    # doc 0: 13 tokens, all grams distinct
    assert t.loc[0, "n_grams"] == 9
    assert t.loc[0, "rep_frac"] == 0.0
    # docs shorter than 5 tokens are omitted
    assert 4 not in t.index


def test_event_value_delta_vs_duckdb(ray_session, tmp_path):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
    import __ray_entry__ as E

    rng = np.random.default_rng(7)
    n = 400
    # heavy ties: few users, coarse timestamps → exercises the
    # (ts, event_id) tiebreak
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 50, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    tab = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array(
                np.round(rng.normal(0, 10, n), 3), pa.float64()
            ),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tab, os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{d}/events.parquet'"
    )
    exp = (
        con.sql(E.oracle_sql()["event_value_delta"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        dp._to_table(dp.event_value_delta(d))
        .to_pandas()[["event_id", "user_id", "delta"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert np.allclose(got["delta"], exp["delta"], atol=0)


def test_embedding_pq_recall(ray_session):
    """PQ ADC top-k must overlap the exact brute-force top-k (recall
    gate) and be deterministic across runs."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"
    exact = dp.embedding_topk(sf, k=10)
    exact_ids = set(
        dp._to_table(exact)
        .to_pandas()
        .sort_values("cos", ascending=False)["vec_id"]
        .head(10)
        .tolist()
    )
    a = dp.embedding_pq_topk(sf, k=10).to_pandas()
    b = dp.embedding_pq_topk(sf, k=10).to_pandas()
    assert a.values.tolist() == b.values.tolist()  # deterministic
    recall = len(set(a["vec_id"]) & exact_ids) / 10.0
    assert recall >= 0.6, (recall, sorted(a["vec_id"]), sorted(exact_ids))


def test_chunk_documents_planted(ray_session, span_dir):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = (
        dp._to_table(dp.chunk_documents(span_dir))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    # doc 3: 12 tokens, w=10 stride=5 → windows at 0 (10 toks),
    # 5 (7 toks), 10 (2 toks)
    d3 = t[t.doc_id == 3]
    assert d3["n_tokens"].tolist() == [10, 7, 2]
    assert d3["chunk_text"].iloc[0] == "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5"
    assert d3["chunk_text"].iloc[2] == "x1 x2"
    # overlap: window 1 starts at token 6 (1-based), i.e. index 5
    assert d3["chunk_text"].iloc[1].startswith("x1 x2 x3 x4 x5 x1 x2")
    # doc 4: 3 tokens → one partial window
    d4 = t[t.doc_id == 4]
    assert d4["chunk_text"].tolist() == ["tail one two"]


def test_hash_join_duplicate_build_keys(ray_session, tmp_path):
    """Duplicate keys on BOTH sides emit the per-key cartesian product
    (inner-join semantics), and unmatched keys on either side drop."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([7, 7, 8, 9], pa.int64()),
                "o_totalprice": pa.array([1.5, 2.25, 3.0, 4.0], pa.float64()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([7, 7, 8, 10], pa.int64()),
                "c_name": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    got = (
        dp._to_table(dp.hash_join_orders_customers(d))
        .to_pandas()
        .sort_values(["o_orderkey", "c_name"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ["orders", "customer"]:
        con.execute(f"create view {t} as select * from '{d}/{t}.parquet'")
    exp = (
        con.sql(
            """select o.o_orderkey, o.o_custkey, c.c_name,
                      round(o.o_totalprice*100)::bigint as price_cents
               from orders o join customer c on c.c_custkey = o.o_custkey
               order by o_orderkey, c_name"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.values.tolist() == exp.values.tolist()
    # key 7 matched twice per order; keys 9 (no customer) and 10 (no
    # order) dropped
    assert len(got) == 5


def test_chunk_then_embed_topk_self_hit(ray_session):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    sf = "/root/testdata/sf0.001"
    a = dp.chunk_then_embed_topk(sf, k=10).to_pandas()
    b = dp.chunk_then_embed_topk(sf, k=10).to_pandas()
    assert a.values.tolist() == b.values.tolist()  # deterministic
    # the query IS doc 0's first chunk → it must be the top hit at cos≈1
    assert (int(a.iloc[0]["doc_id"]), int(a.iloc[0]["chunk_idx"])) == (0, 0)
    assert a.iloc[0]["cos"] == pytest.approx(1.0, abs=1e-4)
    assert (a["cos"].diff()[1:] <= 1e-12).all()  # descending scores


def test_media_similarity_topk(ray_session):
    """End-to-end multimodal retrieval over REAL decoded features:
    top-k are images when the query is an image (same feature family
    scores closest), cosines descend, the query row is excluded, and
    the result is deterministic across runs."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    t = dp._to_table(dp.media_similarity_topk("", n=60, k=10)).to_pandas()
    assert len(t) == 10
    assert 0 not in t["media_id"].tolist()
    assert (t["cos"].values[:-1] >= t["cos"].values[1:] - 1e-12).all()
    # media_id 0 is an image (luma-histogram feature); images dominate
    assert (t["kind"] == "image").sum() >= 5
    t2 = dp._to_table(dp.media_similarity_topk("", n=60, k=10)).to_pandas()
    assert t.equals(t2)
