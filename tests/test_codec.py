"""Delta+varint codec roundtrip tests — property-based (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from informationretrieval_en_people_cn_ray.codec import (
    decode_posting_blob,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_posting_blob,
    encode_varints,
    varint_lengths,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = encode_varints(arr)
    out = decode_varints(buf)
    assert out.tolist() == vals


def test_varint_known_bytes():
    # LEB128: 0→00, 127→7f, 128→80 01, 300→ac 02
    assert encode_varints(np.array([0])) == b"\x00"
    assert encode_varints(np.array([127])) == b"\x7f"
    assert encode_varints(np.array([128])) == b"\x80\x01"
    assert encode_varints(np.array([300])) == b"\xac\x02"
    assert decode_varints(b"\xac\x02\x7f\x00").tolist() == [300, 127, 0]


def test_varint_lengths_match_encoding():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**63 - 1], dtype=np.uint64)
    lens = varint_lengths(vals)
    for v, l in zip(vals.tolist(), lens.tolist()):
        assert len(encode_varints(np.array([v], dtype=np.uint64))) == l


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=100,
             unique=True).map(sorted)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_sorted(vals):
    arr = np.array(vals, dtype=np.int64)
    assert delta_decode(delta_encode(arr)).tolist() == vals


def test_delta_with_restarts():
    # two docs' position lists concatenated: [3,5,9] and [1,4]
    pos = np.array([3, 5, 9, 1, 4], dtype=np.int64)
    starts = np.array([0, 3], dtype=np.int64)
    gaps = delta_encode(pos, starts)
    assert gaps.tolist() == [3, 2, 4, 1, 3]
    assert delta_decode(gaps, starts).tolist() == pos.tolist()


@st.composite
def posting_list(draw):
    df = draw(st.integers(min_value=1, max_value=30))
    doc_ids = sorted(draw(st.sets(st.integers(0, 10**9), min_size=df, max_size=df)))
    tfs, positions = [], []
    for _ in range(df):
        p = sorted(draw(st.sets(st.integers(0, 10**6), min_size=1, max_size=8)))
        tfs.append(len(p))
        positions.extend(p)
    return doc_ids, tfs, positions


@given(posting_list())
@settings(max_examples=100, deadline=None)
def test_posting_blob_roundtrip(pl):
    doc_ids, tfs, positions = pl
    tf_arr = np.array(tfs, dtype=np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tf_arr[:-1], out=starts[1:])
    pos_bytes = encode_positions(np.array(positions, dtype=np.int64), starts)
    blob = encode_posting_blob(np.array(doc_ids, dtype=np.int64), tf_arr, pos_bytes)
    d, t, p, ps = decode_posting_blob(blob)
    assert d.tolist() == doc_ids
    assert t.tolist() == tfs
    assert p.tolist() == positions
    assert ps.tolist() == starts.tolist()


def test_posting_blob_golden():
    """FIXTURES.md §3: a hand-checkable golden blob (format v4)."""
    doc_ids = np.array([0, 2], dtype=np.int64)
    tfs = np.array([1, 2], dtype=np.int64)
    pos = np.array([5, 1, 3], dtype=np.int64)  # doc0: [5]; doc2: [1,3]
    starts = np.array([0, 1], dtype=np.int64)
    blob = encode_posting_blob(doc_ids, tfs, encode_positions(pos, starts))
    # header df=2 ctf=3 bs=128 dir_bytes=3 | dir: last_doc 2, blk_bytes 4,
    # max_tf 2 | payload: gaps 0,2 tfs 1,2 | pos 5, 1,2
    assert blob == bytes([2, 3, 128, 1, 3, 2, 4, 2, 0, 2, 1, 2, 5, 1, 2])
    d, t, p, _ = decode_posting_blob(blob)
    assert d.tolist() == [0, 2] and t.tolist() == [1, 2] and p.tolist() == [5, 1, 3]
    d2, t2, p2, ps2 = decode_posting_blob(blob, with_positions=False)
    assert d2.tolist() == [0, 2] and t2.tolist() == [1, 2] and p2 is None
    assert ps2.tolist() == [0, 1]


def test_blob_meta_and_block_decode():
    """Block directory + selective decode: multi-block blob round-trips
    per block and the directory carries per-block maxima."""
    from informationretrieval_en_people_cn_ray.codec import (
        decode_posting_blocks,
        read_blob_meta,
    )

    df = 1000
    doc_ids = np.arange(0, df * 3, 3, dtype=np.int64) + 7
    tfs = (np.arange(df, dtype=np.int64) % 9) + 1
    starts = np.zeros(df, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    pos = np.arange(int(tfs.sum()), dtype=np.int64) % 50
    # per-doc ascending positions required by the delta restart
    pos = np.concatenate(
        [np.sort(pos[starts[i] : starts[i] + tfs[i]]) for i in range(df)]
    )
    blob = encode_posting_blob(
        doc_ids, tfs, encode_positions(pos, starts), block_size=128
    )
    m = read_blob_meta(blob)
    assert m["df"] == df and m["bs"] == 128
    n = (df + 127) // 128
    assert len(m["last_docs"]) == n
    assert m["last_docs"].tolist() == [
        int(doc_ids[min((i + 1) * 128, df) - 1]) for i in range(n)
    ]
    assert m["max_tfs"].tolist() == [
        int(tfs[i * 128 : (i + 1) * 128].max()) for i in range(n)
    ]
    # full decode unchanged
    d, t, p, _ = decode_posting_blob(blob)
    assert d.tolist() == doc_ids.tolist() and t.tolist() == tfs.tolist()
    assert p.tolist() == pos.tolist()
    # every single block decodes to its slice
    for b in range(n):
        bd, bt = decode_posting_blocks(blob, np.array([b]), m)
        lo, hi = b * 128, min((b + 1) * 128, df)
        assert bd.tolist() == doc_ids[lo:hi].tolist()
        assert bt.tolist() == tfs[lo:hi].tolist()
    # and a sparse selection concatenates in order
    bd, bt = decode_posting_blocks(blob, np.array([0, 3, n - 1]), m)
    exp_d = np.concatenate(
        [doc_ids[b * 128 : min((b + 1) * 128, df)] for b in (0, 3, n - 1)]
    )
    assert bd.tolist() == exp_d.tolist()
