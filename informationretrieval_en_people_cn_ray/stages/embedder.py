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


class PPMISVDModel:
    """TRAINED word/document embeddings — the learned counterpart of
    ``HashingEmbedder`` and the honest closing of SURVEY.md §2 ST3 (the
    reference trains a gensim Doc2Vec, ``Doc2Vec.py:18-55``, then scans
    the corpus for the most-similar comment,
    ``Doc2VecMostSimilar.py:18-36``; gensim is unavailable here, so the
    model is PPMI-SVD — Levy & Goldberg 2014's result that SGNS/word2vec
    implicitly factorizes the shifted PMI matrix makes this the standard
    dependency-free stand-in, and it IS learned from corpus statistics,
    unlike the hashing model).

    The object holds the trained state: the sorted vocabulary (≤ V
    terms) and a (V × dim) float64 word-vector matrix ``U·√S`` from the
    truncated SVD of the positive-PMI co-occurrence matrix. Both are
    model-sized — V is a training-time cap, NOT corpus-sized — so the
    whole model rides one ``ray.put`` into the inference actor pool.

    Document embedding = L2-normalized mean of in-vocab word vectors
    (the standard SIF-less average; OOV-only docs embed to the zero
    vector, matching ``HashingEmbedder`` on empty text).
    """

    def __init__(self, vocab: np.ndarray, vectors: np.ndarray):
        self.vocab = np.asarray(vocab, dtype=object)  # SORTED lexicographic
        self.vectors = np.asarray(vectors, np.float64)  # (V, dim)
        self.dim = int(self.vectors.shape[1])

    @staticmethod
    def fit(cooc: np.ndarray, vocab: np.ndarray, dim: int) -> "PPMISVDModel":
        """Factorize a SYMMETRIZED co-occurrence matrix: PPMI transform,
        truncated SVD, word vectors U·√S. ``cooc`` is V×V — model-sized
        driver state (the IVF-centroid budget), never corpus-sized."""
        C = np.asarray(cooc, np.float64)
        total = C.sum()
        if total <= 0:
            return PPMISVDModel(vocab, np.zeros((len(vocab), dim)))
        marg = C.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log(C * total / np.outer(marg, marg))
        pmi[~np.isfinite(pmi)] = 0.0
        np.maximum(pmi, 0.0, out=pmi)
        u, s, _ = np.linalg.svd(pmi, full_matrices=False)
        d = min(dim, len(s))
        vecs = u[:, :d] * np.sqrt(s[:d])
        if d < dim:  # tiny vocab: pad to the requested dim
            vecs = np.pad(vecs, ((0, 0), (0, dim - d)))
        return PPMISVDModel(vocab, vecs)

    def _token_vecs(self, texts: list[str]):
        from ..text import batch_token_codes

        lens, doc_idx, codes, uniq = batch_token_codes(texts)
        n = len(lens)
        if not len(codes) or not len(self.vocab):
            return n, None, None
        ua = np.asarray(uniq, dtype=object)
        pos = np.searchsorted(self.vocab, ua)
        pos[pos >= len(self.vocab)] = len(self.vocab) - 1
        vid = np.where(self.vocab[pos] == ua, pos, -1).astype(np.int64)
        tok_vid = vid[codes]
        keep = tok_vid >= 0
        return n, doc_idx[keep], tok_vid[keep]

    def embed(self, texts: list[str]) -> np.ndarray:
        """texts → (n, dim) float64 L2-normalized document embeddings."""
        n, doc_idx, tok_vid = self._token_vecs(texts)
        acc = np.zeros((n, self.dim), np.float64)
        cnt = np.zeros(n, np.float64)
        if doc_idx is not None and len(doc_idx):
            np.add.at(acc, doc_idx, self.vectors[tok_vid])
            np.add.at(cnt, doc_idx, 1.0)
        acc /= np.where(cnt == 0, 1.0, cnt)[:, None]
        norms = np.sqrt((acc * acc).sum(axis=1))
        return acc / np.where(norms == 0, 1.0, norms)[:, None]

    def word_neighbors(self, word: str, k: int = 5):
        """[(term, cos)] — the k nearest vocabulary words by cosine
        (driver-side, vocab-sized — the Doc2Vec ``most_similar`` analog)."""
        i = int(np.searchsorted(self.vocab, word))
        if i >= len(self.vocab) or self.vocab[i] != word:
            return []
        V = self.vectors
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0] = 1.0
        cos = (V @ V[i]) / (norms * norms[i])
        cos[i] = -np.inf
        order = np.lexsort((self.vocab, -cos))[:k]
        return [(str(self.vocab[j]), float(cos[j])) for j in order]


class TrainedEmbedder:
    """map_batches ACTOR class for trained-model inference: the model is
    fetched from the object store ONCE per actor in ``__init__`` (the
    ``ray.put``-broadcast pattern — never re-shipped per batch), batches
    embed vectorized in ``__call__``. Mirrors ``HashingEmbedder``'s
    output contract exactly: (doc_id, embedding list<double>)."""

    def __init__(self, model_ref, text_column="text", id_column="doc_id"):
        import ray

        self.model: PPMISVDModel = ray.get(model_ref)
        self.text_column = text_column
        self.id_column = id_column
        from . import limit_worker_threads

        limit_worker_threads()

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self.model.embed(batch[self.text_column].to_pylist())
        dim = self.model.dim
        offs = pa.array(
            np.arange(0, (len(emb) + 1) * dim, dim, dtype=np.int32)
        )
        col = pa.ListArray.from_arrays(
            offs, pa.array(emb.reshape(-1), pa.float64())
        )
        return pa.table({"doc_id": batch[self.id_column], "embedding": col})
