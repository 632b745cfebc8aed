"""Index integrity checker: a clean index passes fast+deep; each planted
corruption class is caught with a specific error."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from informationretrieval_en_people_cn_ray.corpus import write_corpus
from informationretrieval_en_people_cn_ray.pipelines.build import (
    BuildConfig,
    build_index,
)
from informationretrieval_en_people_cn_ray.pipelines.fsck import check_index


@pytest.fixture(scope="module")
def clean_index(ray_session, tmp_path_factory):
    c = str(tmp_path_factory.mktemp("fsck_corpus"))
    write_corpus(c, 80, seed=5, num_parquet_files=2)
    d = str(tmp_path_factory.mktemp("fsck_idx"))
    build_index(c, d, BuildConfig(num_segments=4, docstat_partitions=2))
    return d


def _copy(clean_index, tmp_path) -> str:
    d = str(tmp_path / "idx")
    shutil.copytree(clean_index, d)
    return d


def test_clean_index_passes(clean_index):
    fast = check_index(clean_index)
    assert fast["ok"], fast["errors"]
    deep = check_index(clean_index, deep=True)
    assert deep["ok"], deep["errors"]
    assert deep["segments"] == 4 and deep["docs"] == 80


def test_truncated_postings_caught(clean_index, tmp_path):
    d = _copy(clean_index, tmp_path)
    # truncate the largest segment's blob file
    segs = sorted(
        (os.path.getsize(os.path.join(d, s, "postings.bin")), s)
        for s in os.listdir(d)
        if s.startswith("seg=")
    )
    f = os.path.join(d, segs[-1][1], "postings.bin")
    with open(f, "r+b") as fh:
        fh.truncate(max(os.path.getsize(f) // 2, 1))
    rep = check_index(d)
    assert not rep["ok"]
    assert any("exceeds postings.bin" in e for e in rep["errors"])


def test_unsorted_dictionary_caught(clean_index, tmp_path):
    d = _copy(clean_index, tmp_path)
    for s in sorted(os.listdir(d)):
        if not s.startswith("seg="):
            continue
        f = os.path.join(d, s, "terms.parquet")
        t = pq.read_table(f)
        if t.num_rows >= 2:
            idx = list(range(t.num_rows))
            idx[0], idx[1] = idx[1], idx[0]
            import pyarrow as pa

            pq.write_table(t.take(pa.array(idx)), f)
            break
    rep = check_index(d)
    assert not rep["ok"]
    assert any("unsorted" in e for e in rep["errors"])


def test_corrupt_blob_caught_deep_only(clean_index, tmp_path):
    d = _copy(clean_index, tmp_path)
    segs = sorted(
        (os.path.getsize(os.path.join(d, s, "postings.bin")), s)
        for s in os.listdir(d)
        if s.startswith("seg=")
    )
    f = os.path.join(d, segs[-1][1], "postings.bin")
    with open(f, "r+b") as fh:
        fh.seek(os.path.getsize(f) // 2)
        b = fh.read(1)
        fh.seek(-1, 1)
        fh.write(bytes([b[0] ^ 0xFF]))
    assert check_index(d)["ok"]  # structural checks can't see it
    rep = check_index(d, deep=True)
    assert not rep["ok"], "deep check must catch a flipped blob byte"


def test_docstat_manifest_mismatch_caught(clean_index, tmp_path):
    d = _copy(clean_index, tmp_path)
    p = sorted(
        os.path.join(d, "docstats", x)
        for x in os.listdir(os.path.join(d, "docstats"))
    )[0]
    f = os.path.join(p, "docstats.parquet")
    t = pq.read_table(f)
    pq.write_table(t.slice(0, t.num_rows - 1), f)
    rep = check_index(d)
    assert not rep["ok"]
    assert any("manifest n_docs" in e for e in rep["errors"])
    assert any("collection num_docs" in e for e in rep["errors"])


def test_stray_tombstone_caught(clean_index, tmp_path):
    from informationretrieval_en_people_cn_ray.state.tombstones import (
        delete_docs,
    )

    d = _copy(clean_index, tmp_path)
    delete_docs(d, [10**9])  # id that never existed
    rep = check_index(d)
    assert not rep["ok"]
    assert any("tombstoned doc ids not in docstats" in e for e in rep["errors"])
    # a legitimate tombstone keeps the index clean
    d2 = _copy(clean_index, tmp_path / "second")
    delete_docs(d2, [0, 5])
    rep2 = check_index(d2)
    assert rep2["ok"], rep2["errors"]


def test_cli_check(clean_index, tmp_path, capsys):
    from informationretrieval_en_people_cn_ray.__main__ import main

    assert main(["check", clean_index, "--deep"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["ok"] and rep["deep"]
    d = _copy(clean_index, tmp_path)
    with open(os.path.join(d, "seg=00000", "postings.bin"), "r+b") as fh:
        fh.truncate(1)
    assert main(["check", d]) == 1


def test_check_generations(clean_index, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from informationretrieval_en_people_cn_ray.corpus import generate_corpus
    from informationretrieval_en_people_cn_ray.pipelines.fsck import (
        check_generations,
    )
    from informationretrieval_en_people_cn_ray.pipelines.merge import (
        extend_generation,
    )

    cdir = str(tmp_path / "delta_corpus")
    os.makedirs(cdir)
    pq2.write_table(
        generate_corpus(20, seed=9, start=80),
        os.path.join(cdir, "part-00000.parquet"),
    )
    gens = extend_generation(clean_index, cdir, str(tmp_path / "gen1"))
    rep = check_generations(gens, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["generations"] == 2 and rep["docs"] == 100

    # same index twice → overlapping doc-id ranges must be rejected
    rep2 = check_generations([clean_index, clean_index])
    assert not rep2["ok"]
    assert any("overlap" in e for e in rep2["errors"])

    # CLI: comma-separated list routes to the generation checker
    from informationretrieval_en_people_cn_ray.__main__ import main

    assert main(["check", ",".join(gens)]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] and out["generations"] == 2


def test_stale_tmp_swept_on_rebuild(clean_index, tmp_path):
    """A *.tmp orphan left by a killed writer is reclaimed when the
    partition rebuilds (manifest stale), kept while fresh (concurrent
    twin), and never touched on the completed-partition skip path."""
    from informationretrieval_en_people_cn_ray.state.manifest import (
        sweep_stale_tmp,
    )

    d = _copy(clean_index, tmp_path)
    seg = os.path.join(d, "seg=00000")
    assert os.path.isdir(seg)
    orphan = os.path.join(seg, "postings.bin.abc123.tmp")
    with open(orphan, "wb") as f:
        f.write(b"\0" * 4096)

    # fresh mtime → kept (could be a live retry twin's in-flight file)
    assert sweep_stale_tmp(seg, max_age_s=600) == 0
    assert os.path.exists(orphan)

    # idle past the grace period → removed
    old = os.path.getmtime(orphan) - 3600
    os.utime(orphan, (old, old))
    assert sweep_stale_tmp(seg, max_age_s=600) == 1
    assert not os.path.exists(orphan)

    # missing directory is a no-op, not an error
    assert sweep_stale_tmp(os.path.join(d, "nope"), max_age_s=0) == 0
