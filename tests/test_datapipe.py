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


def test_media_strict_raises():
    from informationretrieval_en_people_cn_ray.stages.multimodal import (
        MediaDecode,
    )

    with pytest.raises(NotImplementedError, match="PIL|ffmpeg"):
        MediaDecode(strict=True)


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
