"""Stable hashing primitives shared by dedup / fingerprint / ANN stages.

``md5_u64`` replicates DuckDB's ``md5_number_lower`` (second 8 bytes of the
md5 digest, little-endian) so every hash-based operator here has an exact
ANSI-SQL oracle expression. ``MASK63`` keeps values in int64 range on both
sides (``& 9223372036854775807`` in SQL).
"""

from __future__ import annotations

import hashlib

import numpy as np

MASK63 = (1 << 63) - 1
MERSENNE61 = (1 << 61) - 1


def md5_u64(s: str) -> int:
    """== DuckDB md5_number_lower(s)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def md5_i63(s: str) -> int:
    """== (md5_number_lower(s) & 9223372036854775807)::bigint in DuckDB."""
    return md5_u64(s) & MASK63


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def shingles(tokens: list[str], n: int = 3) -> list[str]:
    """n-token shingles; docs shorter than n collapse to one shingle of
    the full token stream (so empty/short docs still dedupe).

    SQL equivalent (1-based lists):
      case when len(toks) >= 3
           then [toks[i]||' '||toks[i+1]||' '||toks[i+2]
                 for i in generate_series(1, len(toks)-2)]
           else [array_to_string(toks, ' ')] end
    """
    if len(tokens) < n:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def minhash_signature(shingle_set: list[str], num_hashes: int) -> list[int]:
    """sig_k = min over shingles of md5_i63(f"{k}:{shingle}")."""
    out = []
    for k in range(num_hashes):
        out.append(min(md5_i63(f"{k}:{s}") for s in shingle_set))
    return out


_BIT_IDX = np.arange(63, dtype=np.uint64)


def simhash64(term_tfs: dict[str, int], bits: int = 63) -> int:
    """Charikar simhash over term md5 hashes, weighted by tf; ``bits``
    capped at 63 so the result is a non-negative int64 (SQL bigint)."""
    if not term_tfs:
        return 0
    idx = _BIT_IDX[:bits]
    acc = np.zeros(bits, dtype=np.int64)
    for t, w in term_tfs.items():
        h = np.uint64(md5_u64(t))
        sign = (((h >> idx) & np.uint64(1)).astype(np.int64) * 2) - 1
        acc += w * sign
    return int(((acc > 0).astype(np.uint64) << idx).sum())


def rolling_fingerprint(tokens: list[str]) -> int:
    """Order-sensitive document fingerprint:
    sum over positions of md5_i63(f"{pos}:{token}") (pos 1-based), mod
    2^61-1 — associative, so it parallelizes AND has an exact SQL form
    (sum of hugeints mod constant)."""
    acc = 0
    for i, t in enumerate(tokens, start=1):
        acc += md5_i63(f"{i}:{t}")
    return acc % MERSENNE61


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance of an int64 array vs one value."""
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    x = (x + _GOLDEN) & _U64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _U64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _U64
    return x ^ (x >> np.uint64(31))


def hash_strings_u64(col) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow string/binary array — a
    buffer-level numpy fold (splitmix64 of each byte keyed by its in-row
    position, summed per row, remixed with the row length), no per-row
    Python. Nulls hash as the sentinel b'\\x00null'. NOT DuckDB-parity
    (use ``md5_u64`` where an SQL oracle pins values); intended for
    internal routing/partitioning."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col.cast(pa.large_binary()), b"\x00null")
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    offs = np.frombuffer(col.buffers()[1], np.int64)[
        col.offset : col.offset + n + 1
    ]
    lens = np.diff(offs)
    with np.errstate(over="ignore"):
        h = splitmix64(lens.astype(np.uint64))
        total = offs[-1] - offs[0]
        if total:
            data = np.frombuffer(col.buffers()[2], np.uint8)[
                offs[0] : offs[-1]
            ].astype(np.uint64)
            pos = np.arange(total, dtype=np.uint64)
            starts = offs[:-1] - offs[0]
            # in-row byte position via one repeat, then per-byte mix
            pos -= np.repeat(starts, lens).astype(np.uint64)
            g = splitmix64(data + (pos + np.uint64(1)) * _GOLDEN)
            nz = lens > 0
            sums = np.zeros(n, np.uint64)
            sums[nz] = np.add.reduceat(g, starts[nz])
            h = splitmix64(h ^ sums)
    return h
