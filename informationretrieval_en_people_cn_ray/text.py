"""Tokenization + Porter stemming — shared by build, query and oracle paths.

Reference semantics being re-expressed (see SURVEY.md §2.2):

- lowercase before tokenizing (``IndexCreator.py:49``),
- tokenize (reference: nltk toktok, ``IndexCreator.py:36,51``; here: an
  ASCII ``[a-z0-9]+`` regex over the lowercased text, fixed so the exact
  same tokenization is expressible in the DuckDB oracle SQL via
  ``regexp_extract_all(lower(x), '[a-z0-9]+')``),
- Snowball/Porter stemming with a cache (``IndexCreator.py:37-38,52``;
  here: an in-repo implementation of M.F. Porter's 1980 algorithm, since
  PyStemmer is not available — build and query import THIS module, which
  guarantees byte-identical analysis on both paths),
- index-time stem filter ``1 < len(stem) <= 128`` (``IndexCreator.py:112``)
  — crucially, positions and doc length count ALL tokens even when the
  stem is dropped from the index (SURVEY.md §7.4 R6).

Pure Python / numpy; no Ray imports — usable inside any map_batches fn.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[a-z0-9]+")
# U+0130 (İ) is the only codepoint whose str.lower() expands to multiple
# chars ('i' + U+0307 combining dot), which would split the token — DuckDB's
# lower() maps it to a single 'i'. Normalize it first so the Python and SQL
# tokenizers agree on every input.
_DOTTED_I = "İ"
# DuckDB-equivalent tokenizer expression (kept next to the regex so the two
# can never drift silently — oracle_sql() builds on this):
TOKEN_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+')"

MIN_STEM_LEN = 2  # keep stems with len > 1  (IndexCreator.py:112)
MAX_STEM_LEN = 128  # ... and len <= 128      (IndexCreator.py:112,300)

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_cons = True
    seen_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and seen_vowel:
            m += 1
            seen_vowel = False
        elif not cons:
            seen_vowel = True
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    if not (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
    ):
        return False
    return stem[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """M.F. Porter's 1980 stemming algorithm (public algorithm; implemented
    from the published description — no reference code involved).

    The reference uses Snowball English via PyStemmer
    (``IndexCreator.py:37``); our oracle defines canonical semantics, so
    exact Snowball parity is not required — identity between build / query /
    oracle paths is (they all call this function).
    """
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


class Analyzer:
    """Stateful analyzer: tokenize + (optionally) stem, with a stem cache.

    Built once per map_batches actor / worker (SURVEY.md §2.3 ST1 —
    reference keeps tokenizer + LRU(100) stem cache per process,
    ``IndexCreator.py:36-38``; we keep an unbounded dict per actor, far
    cheaper than re-stemming a Zipf-distributed vocabulary).
    """

    def __init__(self, stem: bool = True):
        self.stem = stem
        self._cache: dict[str, str] = {}

    def term(self, token: str) -> str:
        """Single token → index/query term (stemmed iff self.stem)."""
        if not self.stem:
            return token
        t = self._cache.get(token)
        if t is None:
            t = porter_stem(token)
            self._cache[token] = t
        return t

    def tokens(self, text: str) -> list[str]:
        """All tokens in order, unstemmed, unfiltered (defines positions
        and doc length — counts every token, SURVEY.md §7.4 R6)."""
        return tokenize(text)

    def doc_terms(self, text: str) -> tuple[dict[str, list[int]], int]:
        """One document → ({term: [positions...]}, doc_token_count).

        Positions index the FULL token stream; terms outside
        (MIN_STEM_LEN, MAX_STEM_LEN] are dropped from the dict but still
        advance positions and count toward doc length
        (reference: ``IndexCreator.py:92-99,112``).
        """
        toks = self.tokens(text)
        out: dict[str, list[int]] = {}
        if self.stem:
            cache = self._cache
            for pos, tok in enumerate(toks):
                t = cache.get(tok)
                if t is None:
                    t = porter_stem(tok)
                    cache[tok] = t
                if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN:
                    lst = out.get(t)
                    if lst is None:
                        out[t] = [pos]
                    else:
                        lst.append(pos)
        else:
            for pos, tok in enumerate(toks):
                if MIN_STEM_LEN <= len(tok) <= MAX_STEM_LEN:
                    lst = out.get(tok)
                    if lst is None:
                        out[tok] = [pos]
                    else:
                        lst.append(pos)
        return out, len(toks)

    def query_terms(self, text: str) -> list[str]:
        """Query-side analysis: tokenize + stem, keep order + duplicates,
        apply the same length filter as the index (a term the index can
        never contain scores nothing)."""
        return [
            t
            for t in (self.term(tok) for tok in self.tokens(text))
            if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN
        ]


def tokenize(text: str) -> list[str]:
    """The engine's tokenizer (no stemming, no filtering) — exactly
    TOKEN_SQL's semantics."""
    if _DOTTED_I in text:
        text = text.replace(_DOTTED_I, "i")
    return TOKEN_RE.findall(text.lower())


def tokenize_batch(col) -> tuple:
    """Arrow-native batch tokenizer — byte-identical tokens to
    ``tokenize()`` (fuzz-gated in tests/test_text.py): RE2 split on the
    lowered text instead of a Python regex per doc, so the build's
    hottest stage never materializes Python token lists.

    ``col``: pa.Array / pa.ChunkedArray of strings (or a list of str).
    Returns (doc_lens int64[n] — ALL tokens per doc, flat tokens
    pa.StringArray in doc order)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, list):
        col = pa.array(col, pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    col = pc.replace_substring(col, _DOTTED_I, "i")
    parts = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    offs = parts.offsets.to_numpy()  # absolute into the child values
    flat = parts.flatten()  # slice-safe (honors offsets)
    raw_counts = np.diff(offs)
    keep = pc.not_equal(flat, "")  # split leaves '' at run boundaries
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_idx_all = np.repeat(np.arange(n, dtype=np.int64), raw_counts)
    lens = np.bincount(doc_idx_all[keep_np], minlength=n).astype(np.int64)
    return lens, flat.filter(keep)


def batch_token_codes(texts):
    """Vectorized tokenized intermediate shared by the text-analysis and
    embedding stages: Arrow-tokenize the whole batch, dictionary-encode
    its token stream (Arrow C++), and hand back integer codes — so
    callers process the vocabulary-sized ``uniq`` list instead of every
    token occurrence.

    Returns (doc_lens int64[n], doc_idx int64[T], codes int64[T],
    uniq list[str])."""
    import numpy as np

    lens, flat = tokenize_batch(texts)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        uniq = enc.dictionary.to_pylist()
    else:
        codes, uniq = np.empty(0, np.int64), []
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return lens, doc_idx, codes, uniq
