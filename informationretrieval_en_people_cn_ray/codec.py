"""Delta + varint (LEB128) posting-list codec — vectorized with numpy.

Replaces the reference's char-level Huffman coding of digit text
(``Huffman.py:44-88``, ``IndexCreator.py:364-440``): the reference encodes
the decimal digits of posting data at ~3.3 bits/char; we encode the numbers
themselves as deltas + unsigned LEB128 varints (the north_star's mandated
encoding), which is both smaller and decodable into numpy arrays without
materializing text.

Posting blob layout (columnar, so decode is vectorized slices):

    varint df                      -- number of documents
    varint ctf                     -- collection term frequency (== sum tfs)
    varint skip                    -- byte length of the gaps+tfs section
    varint * df   doc-id deltas    -- first absolute, then gaps (ids strictly ascending)
    varint * df   tfs
    varint * ctf  positions        -- per-doc: first absolute, then gaps
                                     (delta restarts at every doc boundary, so
                                     per-doc position byte-slices can be
                                     concatenated in any doc order upstream)

``skip`` lets ranked/boolean queries decode ONLY doc ids + tfs and jump
over the position stream entirely — positions are only paid for by phrase
queries (decoding a hot term's multi-million-entry position stream costs
seconds; its doc ids + tfs cost milliseconds).

All varints are unsigned; values must fit in uint64.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_VARINT_BYTES = 10


def encode_varints_with_lengths(
    values: np.ndarray,
) -> tuple[bytes, np.ndarray]:
    """Vectorized unsigned-LEB128 encode; also returns the encoded byte
    length per value (callers often need both — computing lengths twice
    doubles memory traffic on the build's hottest path).

    Works in uint32 when all values fit (half the memory traffic of the
    uint64 path — this stage is bandwidth-bound under full-node
    concurrency, so dtype width is wall-clock)."""
    v = np.ascontiguousarray(values)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
    if v.dtype != _U64 and v.dtype != np.uint32:
        mx = int(v.max()) if v.size else 0
        mn = int(v.min()) if v.size else 0
        if mn < 0:
            raise ValueError("negative value in varint encode")
        v = v.astype(np.uint32 if mx < (1 << 32) else _U64)
    dt = v.dtype.type
    seven = dt(7)
    # bytes needed per value: ceil(bit_length/7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    shifted = v >> seven
    while np.any(shifted):
        nbytes += (shifted != 0).astype(np.int64)
        shifted >>= seven
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # write byte-slot k of every value that has > k bytes (≤10 vectorized passes)
    remaining = v.copy()
    active = np.arange(v.size)
    k = 0
    mask7 = dt(0x7F)
    while active.size:
        pos = starts[active] + k
        out[pos] = (remaining[active] & mask7).astype(np.uint8)
        remaining[active] >>= seven
        not_last = nbytes[active] > (k + 1)
        out[pos[not_last]] |= 0x80
        active = active[not_last]
        k += 1
    return out.tobytes(), nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """Vectorized unsigned-LEB128 encode of a 1-D array of non-negative ints."""
    return encode_varints_with_lengths(values)[0]


def decode_varints(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Vectorized unsigned-LEB128 decode → uint64 array (all varints in buf)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (raw & 0x80) == 0
    # group id per byte = number of completed varints before this byte
    gid = np.zeros(raw.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=gid[1:])
    n = int(gid[-1]) + 1
    group_starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    group_starts[1:] = ends[:-1] + 1
    shift = (np.arange(raw.size, dtype=np.int64) - group_starts[gid]) * 7
    payload = (raw & 0x7F).astype(_U64) << shift.astype(_U64)
    return np.add.reduceat(payload, group_starts)


def delta_encode(values: np.ndarray, restarts: np.ndarray | None = None) -> np.ndarray:
    """values → gaps; optionally restart (store absolute) at given indices.

    ``restarts`` must include index 0 when provided; with None, only index 0
    is absolute.
    """
    v = np.asarray(values)
    if v.dtype not in (np.dtype(np.int32), np.dtype(np.int64)):
        v = v.astype(np.int64)
    if v.size == 0:
        return v
    out = v.copy()
    out[1:] -= v[:-1]
    if restarts is not None:
        out[restarts] = v[restarts]
    return out


def delta_decode(gaps: np.ndarray, restarts: np.ndarray | None = None) -> np.ndarray:
    """Inverse of delta_encode (segmented cumulative sum)."""
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    if restarts is None or len(restarts) <= 1:
        return np.cumsum(g)
    c = np.cumsum(g)
    # subtract, within each segment, the running total accumulated before it
    r = np.asarray(restarts, dtype=np.int64)
    seg_of = np.zeros(g.size, dtype=np.int64)
    seg_of[r[1:]] = 1
    seg_of = np.cumsum(seg_of)
    base = np.zeros(len(r), dtype=np.int64)
    base[1:] = c[r[1:] - 1]
    return c - base[seg_of]


def encode_positions(positions: np.ndarray, doc_starts: np.ndarray) -> bytes:
    """Concatenated per-doc position lists → varint bytes with per-doc
    delta restart. ``doc_starts`` = start index of each doc's positions
    (must begin with 0)."""
    return encode_varints(delta_encode(positions, doc_starts))


def encode_posting_blob(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    pos_bytes: bytes,
) -> bytes:
    """Assemble the final per-term blob. ``doc_ids`` strictly ascending;
    ``pos_bytes`` = already-encoded per-doc position stream (docs in the
    same order as doc_ids)."""
    df = int(len(doc_ids))
    ctf = int(np.asarray(tfs, dtype=np.int64).sum())
    gaps = encode_varints(delta_encode(doc_ids))
    tf_bytes = encode_varints(np.asarray(tfs))
    header = encode_varints(
        np.array([df, ctf, len(gaps) + len(tf_bytes)], dtype=np.int64)
    )
    return b"".join((header, gaps, tf_bytes, pos_bytes))


def _read_header(raw: np.ndarray, n: int) -> tuple[list[int], int]:
    """Parse the first n varints byte-wise (tiny); returns (values, end)."""
    vals = []
    i = 0
    for _ in range(n):
        v = 0
        shift = 0
        while True:
            b = int(raw[i])
            i += 1
            v |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        vals.append(v)
    return vals, i


def decode_posting_blob(blob: bytes | memoryview, with_positions: bool = True):
    """blob → (doc_ids int64[df], tfs int64[df], positions int64[ctf] | None,
    pos_starts int64[df]) — pos_starts[i] is the offset of doc i's
    positions inside ``positions``. ``with_positions=False`` skips the
    position stream entirely (ranked/boolean query fast path)."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    (df, ctf, skip), h = _read_header(raw, 3)
    vals = decode_varints(raw[h : h + skip]).astype(np.int64)
    doc_ids = np.cumsum(vals[:df])
    tfs = vals[df : 2 * df]
    pos_starts = np.zeros(df, dtype=np.int64)
    if df:
        np.cumsum(tfs[:-1], out=pos_starts[1:])
    if not with_positions:
        return doc_ids, tfs, None, pos_starts
    pos_gaps = decode_varints(raw[h + skip :]).astype(np.int64)[:ctf]
    positions = delta_decode(pos_gaps, pos_starts)
    return doc_ids, tfs, positions, pos_starts


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (used to compute per-doc position
    byte-slice lengths without re-encoding)."""
    v = np.ascontiguousarray(values)
    if v.dtype != _U64 and v.dtype != np.uint32:
        v = v.astype(_U64)
    dt = v.dtype.type
    nbytes = np.ones(v.shape, dtype=np.int64)
    shifted = v >> dt(7)
    while np.any(shifted):
        nbytes += (shifted != 0).astype(np.int64)
        shifted >>= dt(7)
    return nbytes
