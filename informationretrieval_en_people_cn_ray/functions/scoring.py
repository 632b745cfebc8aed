"""Vectorized ranking kernels (numpy) — BM25 primary, Dirichlet-LM parity.

Replaces the reference's per-candidate merge-scan scorer
(``SearchEngine.get_dirichlet_smoothed_score``, ``SearchEngine.py:83-128``)
with array arithmetic over decoded posting lists. Semantics defined by
oracle.py; these kernels are tested rank-identical (scores to 1e-9)
against it.

Determinism: per-term contributions are accumulated in query-term order
(same float-addition order as the oracle — SURVEY.md §7.4 R1), and top-k
uses the canonical tie-break (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np

from ..oracle import BM25_K1, BM25_B, DIRICHLET_MU


def bm25_accumulate(
    scores: np.ndarray,
    cand_doc_ids: np.ndarray,
    term_doc_ids: np.ndarray,
    term_tfs: np.ndarray,
    cand_doc_lens: np.ndarray,
    df: int,
    N: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> None:
    """Add one query term's BM25 contribution to ``scores`` (aligned with
    sorted ``cand_doc_ids``). Docs absent from the term's postings get 0."""
    idx = np.searchsorted(cand_doc_ids, term_doc_ids)
    # all term docs are candidates by construction; guard anyway
    ok = (idx < len(cand_doc_ids)) & (cand_doc_ids[np.minimum(idx, len(cand_doc_ids) - 1)] == term_doc_ids)
    idx = idx[ok]
    tf = term_tfs[ok].astype(np.float64)
    dl = cand_doc_lens[idx].astype(np.float64)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    scores[idx] += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def dirichlet_accumulate(
    scores: np.ndarray,
    cand_doc_ids: np.ndarray,
    term_doc_ids: np.ndarray,
    term_tfs: np.ndarray,
    cand_doc_lens: np.ndarray,
    ctf: int,
    C: int,
    mu: float = DIRICHLET_MU,
) -> None:
    """Add one query term's Dirichlet-LM log-prob to every candidate —
    including the f=0 branch for candidates lacking the term
    (``SearchEngine.py:100-108,120-126``)."""
    dl = cand_doc_lens.astype(np.float64)
    prior = mu * ctf / C
    tf = np.zeros(len(cand_doc_ids), dtype=np.float64)
    idx = np.searchsorted(cand_doc_ids, term_doc_ids)
    ok = (idx < len(cand_doc_ids)) & (cand_doc_ids[np.minimum(idx, len(cand_doc_ids) - 1)] == term_doc_ids)
    tf[idx[ok]] = term_tfs[ok]
    scores += np.log((tf + prior) / (dl + mu))


def topk(
    doc_ids: np.ndarray, scores: np.ndarray, k: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Canonical tie-break: score desc, doc_id asc (SURVEY.md §2.6 O4).

    Selection fast path: for k ≪ n an O(n) ``argpartition`` narrows to
    the k-th score boundary first (docs tied AT the boundary are all
    kept for the lexsort, so the doc-id tie-break stays exact), then
    only the survivors pay the O(m log m) sort — identical output to
    the full lexsort by construction."""
    if len(doc_ids) == 0:
        return doc_ids, scores
    if k is not None and 0 < k < len(doc_ids) // 4:
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = np.flatnonzero(scores >= kth)
        order = keep[np.lexsort((doc_ids[keep], -scores[keep]))][:k]
        return doc_ids[order], scores[order]
    order = np.lexsort((doc_ids, -scores))
    if k is not None:
        order = order[:k]
    return doc_ids[order], scores[order]
