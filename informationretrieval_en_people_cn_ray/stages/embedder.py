"""Deterministic text-embedding stage — the honest form of SURVEY.md §2
ST3 (the reference's Doc2Vec model, ``Doc2Vec.py:18-55``,
``Doc2VecMostSimilar.py:15-34``; gensim is unavailable in this sandbox,
so the *model* is replaced by a dependency-free deterministic one while
the Ray-side contract — a real model built ONCE per actor in
``__init__``, batched inference in ``__call__`` — is exactly what a
learned-embedding stage uses).

Model: feature hashing (Weinberger et al. 2009, public algorithm) of the
token bag into ``n_features`` signed buckets, then a seeded Gaussian
random projection (Johnson–Lindenstrauss) to ``dim`` and L2
normalization. Deterministic in (seed, dim, n_features) — identical
embeddings regardless of batch/actor placement — and preserves
bag-of-words cosine structure well enough for the ANN ops to consume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_u64
from ..text import batch_token_codes


class HashingEmbedder:
    """map_batches actor class: (id, text) → (id, embedding list<double>).

    The projection matrix is the "model": materialized once per actor in
    ``__init__`` (dim × n_features doubles — the pattern point: per-actor
    state, never per batch), shared by every batch the actor sees.
    """

    def __init__(
        self,
        dim: int = 32,
        n_features: int = 4096,
        seed: int = 42,
        text_column: str = "text",
        id_column: str = "doc_id",
    ):
        self.dim = dim
        self.n_features = n_features
        self.text_column = text_column
        self.id_column = id_column
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(n_features, dim) / np.sqrt(dim)
        from . import limit_worker_threads

        limit_worker_threads()

    def _feature_of(self, uniq: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Per distinct token: (bucket index, ±1 sign) — md5-derived, so
        the mapping is stable across actors and sessions."""
        h = np.fromiter((md5_u64(u) for u in uniq), np.uint64, count=len(uniq))
        idx = (h % np.uint64(self.n_features)).astype(np.int64)
        sign = (((h >> np.uint64(63)) & np.uint64(1)).astype(np.int64) * 2) - 1
        return idx, sign

    def embed(self, texts: list[str]) -> np.ndarray:
        """texts → (n, dim) float64 L2-normalized embeddings."""
        lens, doc_idx, codes, uniq = batch_token_codes(texts)
        n = len(lens)
        bag = np.zeros((n, self.n_features), dtype=np.float64)
        if len(codes):
            fidx, fsign = self._feature_of(uniq)
            np.add.at(bag, (doc_idx, fidx[codes]), fsign[codes].astype(np.float64))
        emb = bag @ self.proj
        norms = np.sqrt((emb * emb).sum(axis=1))
        return emb / np.where(norms == 0, 1.0, norms)[:, None]

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self.embed(batch[self.text_column].to_pylist())
        offs = pa.array(
            np.arange(0, (len(emb) + 1) * self.dim, self.dim, dtype=np.int32)
        )
        col = pa.ListArray.from_arrays(
            offs, pa.array(emb.reshape(-1), pa.float64())
        )
        return pa.table({"doc_id": batch[self.id_column], "embedding": col})
