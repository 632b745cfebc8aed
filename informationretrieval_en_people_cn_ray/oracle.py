"""Single-process correctness oracle (SURVEY.md §5.2 item 2).

A deliberately simple, pure-Python implementation of the exact semantics
the Ray engine must reproduce: same tokenize→stem analysis (it imports
text.py — the one analyzer), an in-memory positional inverted index, and
the two scorers. The pytest gates assert:

- the Ray-built index equals the oracle index term-for-term
  (term, df, ctf, postings, positions), and
- ranked top-k is rank-identical (doc_ids and scores to 1e-9) under the
  canonical tie-break (score desc, doc_id asc) — SURVEY.md §7.4 R1/R2.

Scorers:

- **BM25** (primary, per BASELINE.json north_rule): k1=1.5, b=0.75,
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
- **Dirichlet query-likelihood LM** (reference parity,
  ``SearchEngine.get_dirichlet_smoothed_score``, ``SearchEngine.py:83-128``):
  μ=1500, including the f=0 branch for candidate docs that lack the term,
  and the reference's frequent-term skip (term ignored when its collection
  frequency exceeds ``collection_term_count / 100``,
  ``SearchEngine.py:88-91`` — we interpret the reference's size proxy as a
  token-count threshold, SURVEY.md §2.9).
"""

from __future__ import annotations

import math
from collections import defaultdict

from .text import Analyzer

BM25_K1 = 1.5
BM25_B = 0.75
DIRICHLET_MU = 1500.0
FREQ_CUTOFF = 0.01  # reference: collection_term_count / 100


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], stem: bool = True):
        """docs: [(doc_id, text)] — doc ids arbitrary ints."""
        az = Analyzer(stem=stem)
        # term -> [(doc_id, [positions...])...] ascending doc_id
        self.postings: dict[str, list[tuple[int, list[int]]]] = defaultdict(list)
        self.doc_len: dict[int, int] = {}
        for doc_id, text in sorted(docs):
            terms, n = az.doc_terms(text)
            self.doc_len[doc_id] = n
            for t, poss in terms.items():
                self.postings[t].append((doc_id, poss))
        self.postings = dict(self.postings)
        self.N = len(self.doc_len)
        self.C = sum(self.doc_len.values())
        self.avgdl = self.C / self.N if self.N else 0.0
        self.az = az

    @classmethod
    def from_corpus(
        cls,
        corpus_path: str,
        stem: bool = True,
        content_column: str = "content",
    ) -> "OracleIndex":
        """Read corpus files in sorted order, assigning sequential doc ids —
        the same assignment corpus_source.read_corpus produces."""
        import pyarrow.parquet as pq

        from .sources.corpus_source import corpus_files

        docs: list[tuple[int, str]] = []
        i = 0
        for f in corpus_files(corpus_path):
            for text in pq.read_table(f, columns=[content_column])[
                content_column
            ].to_pylist():
                docs.append((i, text))
                i += 1
        return cls(docs, stem=stem)

    # ---- index access -------------------------------------------------

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def ctf(self, term: str) -> int:
        return sum(len(p) for _, p in self.postings.get(term, ()))

    def term_docs(self, term: str) -> list[int]:
        return [d for d, _ in self.postings.get(term, ())]

    def prefix_terms(self, prefix: str) -> list[str]:
        return sorted(t for t in self.postings if t.startswith(prefix))

    # ---- boolean / token-node result sets -----------------------------

    def keyword_set(self, word: str) -> set[int]:
        terms = self.az.query_terms(word)
        if not terms:
            return set()
        return set(self.term_docs(terms[0]))

    def prefix_set(self, prefix: str) -> set[int]:
        p = self.az.term(prefix.lower())
        out: set[int] = set()
        for t in self.prefix_terms(p):
            out.update(self.term_docs(t))
        return out

    def _anchored_terms(self, phrase: str) -> list[tuple[int, str]]:
        """phrase → [(token_offset, index_term)] keeping only
        index-representable terms (the 1<len<=128 filter) with their
        offsets in the FULL token stream — so 'a b' requires positional gap
        2 over text 'a x b' exactly as the positional index records it."""
        from .text import MAX_STEM_LEN, MIN_STEM_LEN

        terms = [self.az.term(t) for t in self.az.tokens(phrase)]
        return [
            (off, t)
            for off, t in enumerate(terms)
            if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN
        ]

    def _phrase_docs(self, anchored: list[tuple[int, str]]) -> set[int]:
        """Docs containing every anchored term at the right relative
        positions (position-adjacency verification — our canonical phrase
        semantics, replacing the reference's raw-text substring check,
        ``SearchEngine.py:203-206``; SURVEY.md §2.4 J6)."""
        if not anchored:
            return set()
        base_off, base_term = anchored[0]
        result: set[int] = set()
        for doc_id, poss in self.postings.get(base_term, ()):
            ok_positions = set(poss)
            for off, t in anchored[1:]:
                plist = dict(self.postings.get(t, ())).get(doc_id)
                if plist is None:
                    ok_positions = set()
                    break
                ok_positions &= {p - (off - base_off) for p in plist}
                if not ok_positions:
                    break
            if ok_positions:
                result.add(doc_id)
        return result

    def phrase_set(self, phrase: str) -> set[int]:
        return self._phrase_docs(self._anchored_terms(phrase))

    def phrase_prefix_set(self, phrase_with_prefix: str) -> set[int]:
        """``'new ye'*`` — the LAST token is a prefix; docs must contain the
        leading phrase adjacently followed by any index term extending that
        prefix."""
        anchored = self._anchored_terms(phrase_with_prefix)
        toks = self.az.tokens(phrase_with_prefix)
        if not toks:
            return set()
        last_off = len(toks) - 1
        lead = [(o, t) for o, t in anchored if o != last_off]
        p = self.az.term(toks[-1])
        out: set[int] = set()
        for t in self.prefix_terms(p):
            out |= self._phrase_docs(lead + [(last_off, t)])
        return out

    # ---- ranked retrieval ---------------------------------------------

    def _candidates(self, terms: list[str]) -> set[int]:
        c: set[int] = set()
        for t in terms:
            c.update(self.term_docs(t))
        return c

    def _apply_cutoff(self, terms: list[str], cutoff: float | None) -> list[str]:
        if cutoff is None:
            return [t for t in terms if t in self.postings]
        limit = self.C * cutoff
        return [
            t for t in terms
            if t in self.postings and self.ctf(t) <= limit
        ]

    def bm25(
        self,
        query: str,
        k: int | None = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
        cutoff: float | None = None,
    ) -> list[tuple[int, float]]:
        terms = self._apply_cutoff(self.az.query_terms(query), cutoff)
        scores: dict[int, float] = defaultdict(float)
        for t in terms:  # sum in query-term order (deterministic float order)
            df = self.df(t)
            idf = math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))
            for doc_id, poss in self.postings[t]:
                tf = len(poss)
                dl = self.doc_len[doc_id]
                scores[doc_id] += (
                    idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked if k is None else ranked[:k]

    def dirichlet(
        self,
        query: str,
        k: int | None = 10,
        mu: float = DIRICHLET_MU,
        cutoff: float | None = FREQ_CUTOFF,
    ) -> list[tuple[int, float]]:
        """Reference formula (``SearchEngine.py:83-128``): candidates =
        union of term postings; every query term contributes to every
        candidate, via the f=0 branch when absent."""
        # reference: candidates come from ALL query terms' result sets
        # (basic_search has no cutoff); the frequent-term skip applies only
        # to the SCORING loop (SearchEngine.py:88-91 vs 274-276)
        all_terms = [t for t in self.az.query_terms(query) if t in self.postings]
        terms = self._apply_cutoff(all_terms, cutoff)
        if not all_terms:
            return []
        cands = sorted(self._candidates(all_terms))
        scores = {d: 0.0 for d in cands}
        for t in terms:
            ctf = self.ctf(t)
            plist = dict(self.postings[t])
            for d in cands:
                poss = plist.get(d)
                f = len(poss) if poss else 0
                dl = self.doc_len[d]
                scores[d] += math.log(
                    (f + mu * ctf / self.C) / (dl + mu)
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked if k is None else ranked[:k]
