"""Query execution over the segmented index.

Two modes sharing all logic:

- **local** — segment readers live in the driver process (tests, small
  indexes, the DuckDB-checked driver gate).
- **actors** — a pool of ``SegmentSearcher`` Ray actors, each holding the
  memory-mapped state of a subset of segments, mirrors the reference's
  load-once query engine (``SearchEngine.load_index``,
  ``SearchEngine.py:39-63``; SURVEY.md §2.3 ST2). The driver fans each
  query's terms out to the owning actors (terms are hash-partitioned, so
  each term touches exactly one actor), gathers decoded postings, scores
  vectorized, merges top-k.

Scale note: at 10^12 docs the driver-side docstat array would not fit one
node; the scale path is score-by-doc-range (route per-term postings to
doc-range partitions that own the matching docstat shard, accumulate
there, merge per-partition top-k heaps) — the docstat artifacts are
already range-partitioned for exactly that layout. The batch query path
(``search_many``) is the Ray-Data-shaped form: a Dataset of queries
mapped over a stateful actor pool.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.scoring import bm25_accumulate, dirichlet_accumulate, topk
from ..oracle import BM25_K1, BM25_B, DIRICHLET_MU, FREQ_CUTOFF
from ..queryparse import QueryParseError, QueryPlan, Token, parse
from ..stages.postings import concat_posting_parts, term_seg
from ..stages.segments import SegmentReader
from ..state.manifest import load_json
from ..text import Analyzer, MAX_STEM_LEN, MIN_STEM_LEN


def _wildcard_regex(pattern: str) -> re.Pattern:
    """``*``-wildcard → anchored regex (each literal piece escaped)."""
    return re.compile(
        "^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"
    )


def _regex_compiled(pattern: str) -> re.Pattern:
    """User regex → whole-term-anchored matcher. The engine accepts the
    PORTABLE subset shared by Python ``re`` and RE2 (char classes,
    quantifiers, alternation, grouping) so the DuckDB ``regexp_matches``
    oracle is exact; backreferences/lookaround are not part of the
    contract (RE2 rejects them)."""
    return re.compile(f"^(?:{pattern})$")


def _has_toplevel_alternation(pattern: str) -> bool:
    """True when an unescaped ``|`` sits at paren-depth 0 outside any
    character class — then NO literal prefix is required (``scan|join``
    must match ``join*`` terms too, so the range scan must not narrow)."""
    depth = 0
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return True
        i += 1
    return False


def _regex_literal_prefix(pattern: str) -> str:
    """Longest REQUIRED literal prefix of a regex — the dictionary
    range narrower (same role as the wildcard's pre-star literal). Stops
    at the first metacharacter; a trailing ``*``/``?``/``{`` quantifier
    makes the preceding literal optional, so it is dropped. A top-level
    alternation (``scan|join``) makes the leading literal one branch
    only, so the prefix is '' (no narrowing) in that case."""
    if _has_toplevel_alternation(pattern):
        return ""
    out: list[str] = []
    specials = set(".^$*+?{}[]|()\\")
    for ch in pattern:
        if ch in specials:
            if ch in "*?{" and out:
                out.pop()
            break
        out.append(ch)
    return "".join(out)


def _regex_casefold(pattern: str) -> str:
    """Case-fold a regex against the all-lowercase dictionary by
    lowercasing LITERAL characters only. Characters following a
    backslash are preserved verbatim — ``pattern.lower()`` would invert
    the uppercase escape classes (``\\W``→``\\w``, ``\\D``→``\\d``,
    ``\\S``→``\\s``), giving the opposite semantics. ``[A-Z]`` ranges DO
    fold to ``[a-z]``: that is the correct case-insensitive reading over
    a lowercased term dictionary."""
    out: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            out.append(ch)
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(ch.lower())
        i += 1
    return "".join(out)


def _regex_scan(terms, rx: re.Pattern) -> list[str]:
    return [t for t in dict.fromkeys(terms) if rx.match(t)]


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (matches DuckDB's ``levenshtein``)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] * (lb + 1)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[lb]


def _spell_scan(terms, word: str, max_dist: int) -> dict[str, int]:
    """{term: dist ≤ max_dist} over one dictionary slice. Runs WHERE the
    dictionary lives (per segment reader / per SegmentSearcher actor), so
    only candidate terms ever travel to the driver — the scan itself is
    embarrassingly parallel across segments. Length prefilter first:
    |len(t) − len(word)| is a true edit-distance lower bound."""
    out: dict[str, int] = {}
    lw = len(word)
    for t in dict.fromkeys(terms):
        if abs(len(t) - lw) > max_dist:
            continue
        d = levenshtein(t, word)
        if d <= max_dist:
            out[t] = d
    return out


class _Posting:
    __slots__ = ("doc_ids", "tfs", "positions", "pos_starts", "df", "ctf")

    def __init__(self, doc_ids, tfs, positions, pos_starts, df, ctf):
        self.doc_ids = doc_ids
        self.tfs = tfs
        self.positions = positions
        self.pos_starts = pos_starts
        self.df = df
        self.ctf = ctf


class LocalSegments:
    """All segments of one index, opened lazily in-process."""

    def __init__(self, index_dir: str):
        from ..state.tombstones import load_tombstones

        self.index_dir = index_dir
        self.manifest = load_json(os.path.join(index_dir, "collection.json"))
        if not self.manifest:
            raise FileNotFoundError(f"no collection.json under {index_dir}")
        self.num_segments = self.manifest["num_segments"]
        # Lucene-style delete semantics: tombstoned docs are filtered out
        # of every posting access below; dictionary df/ctf and collection
        # stats stay as built until a compacting merge drops them
        self.tombstones = load_tombstones(index_dir)
        self._readers: dict[int, SegmentReader] = {}
        # hot-term posting cache (per engine instance — tombstones are
        # immutable for the instance's lifetime, deletes build a new
        # engine, so cached decoded lists can never go stale): repeated
        # terms across a query batch skip the varint decode + tombstone
        # filter entirely. LRU by decoded-int budget, not entry count,
        # so one giant stopword list can't pin the whole budget.
        from collections import OrderedDict

        self._pcache: OrderedDict[tuple[str, bool], tuple] = OrderedDict()
        self._pcache_cost = 0

    _PCACHE_BUDGET = 16_000_000  # decoded int64s (~128 MB/actor ceiling)
    _PCACHE_NEG_COST = 1024  # nominal charge per absent-term entry, so a
    # miss-heavy workload (typos, wildcard expansions) still triggers
    # eviction instead of growing the entry count without bound

    def reader(self, seg: int) -> SegmentReader:
        r = self._readers.get(seg)
        if r is None:
            r = SegmentReader(self.index_dir, seg)
            self._readers[seg] = r
        return r

    def postings(
        self, term: str, with_positions: bool = False
    ) -> _Posting | None:
        from ..state.tombstones import filter_postings

        key = (term, with_positions)
        hit = self._pcache.get(key)
        if hit is not None:
            self._pcache.move_to_end(key)
            return _Posting(*hit) if hit[0] is not None else None
        r = self.reader(term_seg(term, self.num_segments))
        rng = r.term_range(term)
        if rng is None:
            self._pcache[key] = (None,) * 6
            self._pcache_cost += self._PCACHE_NEG_COST
            self._pcache_evict()
            return None
        d, t, pos, ps, df, ctf = r.postings_merged(*rng, with_positions)
        if self.tombstones.size:
            d, t, pos, ps = filter_postings(self.tombstones, d, t, pos)
        cost = 2 * len(d) + (len(pos) if pos is not None else 0)
        if cost <= self._PCACHE_BUDGET:
            self._pcache[key] = (d, t, pos, ps, df, ctf)
            self._pcache_cost += cost
            self._pcache_evict()
        return _Posting(d, t, pos, ps, df, ctf)

    def _pcache_evict(self) -> None:
        while self._pcache_cost > self._PCACHE_BUDGET and self._pcache:
            _, old = self._pcache.popitem(last=False)
            if old[0] is not None:
                self._pcache_cost -= 2 * len(old[0]) + (
                    len(old[2]) if old[2] is not None else 0
                )
            else:
                self._pcache_cost -= self._PCACHE_NEG_COST

    def prefix_terms(self, prefix: str) -> list[str]:
        out = []
        for seg in range(self.num_segments):
            r = self.reader(seg)
            lo, hi = r.prefix_range(prefix)
            out.extend(r.terms[lo:hi].tolist())
        return sorted(dict.fromkeys(out))  # chunked terms repeat rows

    def wildcard_terms(self, pattern: str) -> list[str]:
        """Dictionary terms matching a ``*``-wildcard — narrowed to the
        pattern's literal-prefix range first, regex-filtered in place
        (never ships the full dictionary)."""
        rx = _wildcard_regex(pattern)
        lit = pattern.split("*", 1)[0]
        out: list[str] = []
        for seg in range(self.num_segments):
            r = self.reader(seg)
            lo, hi = r.prefix_range(lit)
            out.extend(_regex_scan(r.terms[lo:hi].tolist(), rx))
        return sorted(dict.fromkeys(out))

    def regex_terms(self, pattern: str) -> list[str]:
        """Dictionary terms whose WHOLE surface form matches ``pattern``
        — narrowed to the regex's required literal prefix first."""
        rx = _regex_compiled(pattern)
        lit = _regex_literal_prefix(pattern)
        out: list[str] = []
        for seg in range(self.num_segments):
            r = self.reader(seg)
            lo, hi = r.prefix_range(lit)
            out.extend(_regex_scan(r.terms[lo:hi].tolist(), rx))
        return sorted(dict.fromkeys(out))

    def spell_candidates(self, word: str, max_dist: int) -> dict[str, int]:
        out: dict[str, int] = {}
        for seg in range(self.num_segments):
            out.update(_spell_scan(self.reader(seg).terms_list(), word, max_dist))
        return out

    def term_meta(self, term: str) -> tuple[int, int, int] | None:
        return self.reader(term_seg(term, self.num_segments)).term_meta(term)

    def postings_for_docs(self, term: str, docs: np.ndarray):
        from ..state.tombstones import filter_postings

        r = self.reader(term_seg(term, self.num_segments))
        rng = r.term_range(term)
        if rng is None:
            z = np.empty(0, np.int64)
            return z, z.copy()
        d, t = r.postings_for_docs(*rng, docs)
        if self.tombstones.size:
            d, t = filter_postings(self.tombstones, d, t)[:2]
        return d, t

    def postings_blocks_bounded(self, term: str, min_tf: int):
        from ..state.tombstones import filter_postings

        r = self.reader(term_seg(term, self.num_segments))
        rng = r.term_range(term)
        if rng is None:
            z = np.empty(0, np.int64)
            return z, z.copy(), 0, 0
        d, t, dec, tot = r.postings_blocks_bounded(*rng, min_tf)
        if self.tombstones.size:
            d, t = filter_postings(self.tombstones, d, t)[:2]
        return d, t, dec, tot

    def docstat_part_dirs(self) -> list[str]:
        return sorted(
            glob.glob(os.path.join(self.index_dir, "docstats", "part=*"))
        )


class GenerationalSegments:
    """Read path across UNMERGED index generations — a freshly extended
    index (pipelines/merge.extend_index) is searchable the moment its
    delta generation commits, before any compaction runs. Duck-compatible
    with ``LocalSegments`` over ``[gen0, gen1, ...]`` whose doc-id ranges
    ascend: per term, postings are the in-order concatenation of each
    generation's (exactly the invariant ``merge_indexes`` materializes
    byte-level, so results are identical to querying the compacted
    index — gated by tests/test_merge.py)."""

    def __init__(self, index_dirs: list[str]):
        if len(index_dirs) < 1:
            raise ValueError("need at least one generation")
        self.gens = [LocalSegments(d) for d in index_dirs]
        self.index_dirs = list(index_dirs)
        ns = {g.num_segments for g in self.gens}
        if len(ns) != 1:
            raise ValueError(f"generations disagree on num_segments: {ns}")
        self.num_segments = ns.pop()
        c0 = self.gens[0].manifest.get("config", {})
        for g in self.gens[1:]:
            c = g.manifest.get("config", {})
            for key in ("stem", "store_positions"):
                if c.get(key) != c0.get(key):
                    raise ValueError(
                        f"generations disagree on {key}: "
                        f"{c.get(key)!r} vs {c0.get(key)!r}"
                    )
        # the whole correctness contract is ascending DISJOINT doc-id
        # ranges (postings concatenate in generation order) — validate
        # like merge_indexes does instead of returning silently wrong
        # results for e.g. two independently built indexes
        from .merge import _docstat_bounds

        # generations with zero live docs carry no range — skip them
        bounds = [
            b for b in (_docstat_bounds(d) for d in self.index_dirs) if b
        ]
        for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
            if b_lo <= a_hi:
                raise ValueError(
                    "generation doc-id ranges overlap or are out of "
                    f"order: [{a_lo},{a_hi}] then [{b_lo},{b_hi}] — "
                    "generations must be built with doc_id_base above "
                    "every earlier generation's max doc id"
                )
        n_docs = sum(g.manifest["num_docs"] for g in self.gens)
        tokens = sum(g.manifest["total_tokens"] for g in self.gens)
        self.manifest = {
            **self.gens[0].manifest,
            "num_docs": n_docs,
            "total_tokens": tokens,
            "avgdl": (tokens / n_docs) if n_docs else 0.0,
            "generations": [g.manifest for g in self.gens],
        }

    def postings(
        self, term: str, with_positions: bool = False
    ) -> _Posting | None:
        parts = [g.postings(term, with_positions) for g in self.gens]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        d, t, pos, ps = concat_posting_parts(
            [(p.doc_ids, p.tfs, p.positions) for p in parts],
            with_positions,
        )
        return _Posting(
            d, t, pos, ps,
            sum(p.df for p in parts), sum(p.ctf for p in parts),
        )

    def prefix_terms(self, prefix: str) -> list[str]:
        out: list[str] = []
        for g in self.gens:
            out.extend(g.prefix_terms(prefix))
        return sorted(dict.fromkeys(out))

    def wildcard_terms(self, pattern: str) -> list[str]:
        out: list[str] = []
        for g in self.gens:
            out.extend(g.wildcard_terms(pattern))
        return sorted(dict.fromkeys(out))

    def regex_terms(self, pattern: str) -> list[str]:
        out: list[str] = []
        for g in self.gens:
            out.extend(g.regex_terms(pattern))
        return sorted(dict.fromkeys(out))

    def spell_candidates(self, word: str, max_dist: int) -> dict[str, int]:
        out: dict[str, int] = {}
        for g in self.gens:
            out.update(g.spell_candidates(word, max_dist))
        return out

    def term_meta(self, term: str) -> tuple[int, int, int] | None:
        ms = [g.term_meta(term) for g in self.gens]
        ms = [m for m in ms if m is not None]
        if not ms:
            return None
        return (
            sum(m[0] for m in ms),
            sum(m[1] for m in ms),
            max(m[2] for m in ms),
        )

    def postings_for_docs(self, term: str, docs: np.ndarray):
        rs = [g.postings_for_docs(term, docs) for g in self.gens]
        return (
            np.concatenate([r[0] for r in rs]),
            np.concatenate([r[1] for r in rs]),
        )

    def postings_blocks_bounded(self, term: str, min_tf: int):
        rs = [g.postings_blocks_bounded(term, min_tf) for g in self.gens]
        return (
            np.concatenate([r[0] for r in rs]),
            np.concatenate([r[1] for r in rs]),
            sum(r[2] for r in rs),
            sum(r[3] for r in rs),
        )

    def docstat_part_dirs(self) -> list[str]:
        # generation order == doc-id order, so the concatenated part list
        # stays globally range-sorted (DocStats validates)
        return [p for g in self.gens for p in g.docstat_part_dirs()]


@ray.remote
class SegmentSearcher:
    """One actor owns a subset of segments; state mmapped once in
    __init__ (actor-pool ST2). Accepts a GENERATION LIST too (a freshly
    extended, not-yet-compacted index): the actor then holds one reader
    per (segment, generation) and concatenates each term's postings in
    generation order — the same per-segment byte-concat invariant
    ``merge_indexes`` materializes (pipelines/merge.py:17-28), so
    scatter-gather serving works on an uncompacted index. Reference
    counterpart: the query-side state load ``SearchEngine.load_index``
    (``SearchEngine.py:39-63``)."""

    def __init__(self, index_dirs: str | list[str], segs: list[int]):
        from ..state.tombstones import load_tombstones

        dirs = (
            [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
        )
        # generation order == ascending disjoint doc-id ranges
        # (GenerationalSegments validates on the driver before actors
        # spawn), so per-term concatenation in list order stays sorted
        self.readers = {s: [SegmentReader(d, s) for d in dirs] for s in segs}
        tombs = [load_tombstones(d) for d in dirs]
        t = np.concatenate(tombs)
        self.tombstones = np.sort(t) if len(tombs) > 1 else t

    def _parts(self, seg: int, term: str):
        """Per-generation postings_merged tuples for ``term``, skipping
        generations whose dictionary lacks it."""
        parts = []
        for r in self.readers[seg]:
            rng = r.term_range(term)
            if rng is not None:
                parts.append((r, rng))
        return parts

    def postings_many(
        self, terms: list[tuple[str, int]], with_positions: bool = False
    ):
        """[(term, seg)] → {term: (doc_ids, tfs, positions, pos_starts, df, ctf)}"""
        from ..state.tombstones import filter_postings

        out = {}
        for term, seg in terms:
            got = [
                r.postings_merged(*rng, with_positions)
                for r, rng in self._parts(seg, term)
            ]
            if not got:
                out[term] = None
                continue
            if len(got) == 1:
                d, t, pos, ps, df, ctf = got[0]
            else:
                d, t, pos, ps = concat_posting_parts(
                    [(g[0], g[1], g[2]) for g in got], with_positions
                )
                df = sum(g[4] for g in got)
                ctf = sum(g[5] for g in got)
            if self.tombstones.size:
                d, t, pos, ps = filter_postings(self.tombstones, d, t, pos)
            out[term] = (d, t, pos, ps, df, ctf)
        return out

    def prefix_terms(self, prefix: str) -> list[str]:
        out = []
        for gens in self.readers.values():
            for r in gens:
                lo, hi = r.prefix_range(prefix)
                out.extend(r.terms[lo:hi].tolist())
        return out

    def wildcard_terms(self, pattern: str) -> list[str]:
        """Wildcard dictionary scan over THIS actor's segments only —
        the expansion parallelizes across the pool and only matching
        terms return to the driver."""
        rx = _wildcard_regex(pattern)
        lit = pattern.split("*", 1)[0]
        out: list[str] = []
        for gens in self.readers.values():
            for r in gens:
                lo, hi = r.prefix_range(lit)
                out.extend(_regex_scan(r.terms[lo:hi].tolist(), rx))
        return out

    def regex_terms(self, pattern: str) -> list[str]:
        """Regex dictionary scan over THIS actor's segments only."""
        rx = _regex_compiled(pattern)
        lit = _regex_literal_prefix(pattern)
        out: list[str] = []
        for gens in self.readers.values():
            for r in gens:
                lo, hi = r.prefix_range(lit)
                out.extend(_regex_scan(r.terms[lo:hi].tolist(), rx))
        return out

    def spell_candidates(self, word: str, max_dist: int) -> dict[str, int]:
        out: dict[str, int] = {}
        for gens in self.readers.values():
            for r in gens:
                out.update(_spell_scan(r.terms_list(), word, max_dist))
        return out

    def term_meta_many(self, terms: list[tuple[str, int]]):
        """[(term, seg)] → {term: (df, ctf, max_tf) | None} — dictionary
        lookups only, no blob decode; generations combine as
        (sum df, sum ctf, max max_tf)."""
        out = {}
        for t, seg in terms:
            ms = [r.term_meta(t) for r in self.readers[seg]]
            ms = [m for m in ms if m is not None]
            out[t] = (
                None
                if not ms
                else (
                    sum(m[0] for m in ms),
                    sum(m[1] for m in ms),
                    max(m[2] for m in ms),
                )
            )
        return out

    def postings_for_docs_many(
        self, terms: list[tuple[str, int]], docs: np.ndarray
    ):
        """[(term, seg)] → {term: (doc_ids, tfs)} over only the skip
        blocks intersecting ``docs``."""
        from ..state.tombstones import filter_postings

        out = {}
        for t, seg in terms:
            parts = self._parts(seg, t)
            if not parts:
                z = np.empty(0, np.int64)
                out[t] = (z, z.copy())
                continue
            got = [r.postings_for_docs(*rng, docs) for r, rng in parts]
            d = np.concatenate([g[0] for g in got])
            tf = np.concatenate([g[1] for g in got])
            if self.tombstones.size:
                d, tf = filter_postings(self.tombstones, d, tf)[:2]
            out[t] = (d, tf)
        return out

    def postings_blocks_bounded(self, term: str, seg: int, min_tf: int):
        """(doc_ids, tfs, blocks_decoded, blocks_total) of the blocks
        whose block max_tf can still reach the caller's threshold."""
        from ..state.tombstones import filter_postings

        parts = self._parts(seg, term)
        if not parts:
            z = np.empty(0, np.int64)
            return z, z.copy(), 0, 0
        got = [r.postings_blocks_bounded(*rng, min_tf) for r, rng in parts]
        d = np.concatenate([g[0] for g in got])
        t = np.concatenate([g[1] for g in got])
        dec = sum(g[2] for g in got)
        tot = sum(g[3] for g in got)
        if self.tombstones.size:
            d, t = filter_postings(self.tombstones, d, t)[:2]
        return d, t, dec, tot


@ray.remote
class DocStatsShard:
    """One docstat RANGE partition as an actor — the score-by-doc-range
    scale path: at 10^12 docs the (doc_id, doc_len) array doesn't fit one
    process, so scoring moves to the shard that owns each doc range and
    only per-shard top-k heaps travel back. The shard loads ITS parquet
    partition in __init__ (never the driver), slices every posting /
    candidate array to its range with two searchsorted calls, and runs
    the same accumulate kernels as the local path — so the merged result
    is identical by construction."""

    def __init__(self, part_dir: str):
        t = pq.read_table(os.path.join(part_dir, "docstats.parquet"))
        self.doc_ids = t["doc_id"].to_numpy()
        self.doc_lens = t["doc_len"].to_numpy()

    def bounds(self) -> tuple[int, int]:
        if self.doc_ids.size == 0:
            return (0, -1)
        return int(self.doc_ids[0]), int(self.doc_ids[-1])

    def score_bm25(
        self,
        cand_arrays: list[np.ndarray],
        score_lists: list[tuple[np.ndarray, np.ndarray, int]],
        N: int,
        avgdl: float,
        k1: float,
        b: float,
        k: int | None,
    ):
        """cand_arrays: sorted doc-id arrays whose union (within my
        range) is the candidate set; score_lists: per QUERY-TERM
        OCCURRENCE (doc_ids, tfs, df) — accumulated in list order, the
        same float-addition order as the local scorer."""
        if self.doc_ids.size == 0:
            z = np.empty(0, np.int64)
            return z, np.empty(0, np.float64)
        lo, hi = self.doc_ids[0], self.doc_ids[-1]
        parts = []
        for a in cand_arrays:
            s = np.searchsorted(a, lo, side="left")
            e = np.searchsorted(a, hi, side="right")
            if e > s:
                parts.append(a[s:e])
        if not parts:
            z = np.empty(0, np.int64)
            return z, np.empty(0, np.float64)
        cand = np.unique(np.concatenate(parts))
        idx = np.searchsorted(self.doc_ids, cand)
        lens = self.doc_lens[idx]
        scores = np.zeros(len(cand), dtype=np.float64)
        for d, tf, df in score_lists:
            s = np.searchsorted(d, lo, side="left")
            e = np.searchsorted(d, hi, side="right")
            bm25_accumulate(
                scores, cand, d[s:e], tf[s:e], lens, df, N, avgdl, k1, b
            )
        return topk(cand, scores, k)


class DocStats:
    """Range-partitioned (doc_id, doc_len) artifacts → sorted arrays +
    searchsorted lookup (the reference's ``comment_offsets.npy`` /
    ``comment_term_counts.npy`` pair, ``SearchEngine.py:73-75``)."""

    def __init__(
        self, index_dir: str | None, part_dirs: list[str] | None = None
    ):
        parts = (
            part_dirs
            if part_dirs is not None
            else sorted(
                glob.glob(os.path.join(index_dir, "docstats", "part=*"))
            )
        )
        tables = [
            pq.read_table(os.path.join(p, "docstats.parquet")) for p in parts
        ]
        if tables:
            t = pa.concat_tables(tables)
            self.doc_ids = t["doc_id"].to_numpy()
            self.doc_lens = t["doc_len"].to_numpy()
            if self.doc_ids.size > 1 and np.any(
                self.doc_ids[1:] <= self.doc_ids[:-1]
            ):
                # range-partitioned parts concatenated in part order must
                # be globally sorted; anything else means the build
                # mis-routed docstat rows (lens_for's searchsorted would
                # silently return wrong doc lengths)
                raise ValueError(
                    f"docstats under {index_dir} are not globally sorted — "
                    "corrupt or mis-partitioned build"
                )
        else:
            self.doc_ids = np.empty(0, np.int64)
            self.doc_lens = np.empty(0, np.int64)

    def lens_for(self, doc_ids: np.ndarray) -> np.ndarray:
        if doc_ids.size == 0:
            return np.empty(0, self.doc_lens.dtype)
        idx = np.searchsorted(self.doc_ids, doc_ids)
        # an unguarded gather would crash on an id past the last docstat
        # and silently return a NEIGHBOR's length for an in-range missing
        # id (mis-scoring that doc) — candidates must come from postings
        # or a pre-filtered adjacency, so a miss here is index corruption
        clamped = np.minimum(idx, self.doc_ids.size - 1)
        if self.doc_ids.size == 0 or not np.all(
            self.doc_ids[clamped] == doc_ids
        ):
            missing = (
                doc_ids[self.doc_ids[clamped] != doc_ids][:5].tolist()
                if self.doc_ids.size
                else doc_ids[:5].tolist()
            )
            raise ValueError(
                f"candidate doc ids {missing} have no docstat entry — "
                "stale adjacency/index pair or corrupt docstats"
            )
        return self.doc_lens[clamped]


def min_tf_for_bound(
    need: float,
    df: int,
    N: int,
    avgdl: float,
    mult: int,
    k1: float,
    b: float,
) -> int | None:
    """Smallest integer tf whose BM25 upper bound reaches ``need`` —
    the translation from a MaxScore score threshold to a per-block
    ``max_tf`` skip threshold (the bound is monotone increasing in tf,
    so a block with ``max_tf < min_tf`` provably cannot reach ``need``).
    Returns None when NO tf can (the bound's asymptote is below
    ``need``): every block of the term is skippable."""
    if need <= 0:
        return 1
    idf = float(np.log(1.0 + (N - df + 0.5) / (df + 0.5)))
    A = idf * (k1 + 1.0) * mult
    Bc = 1.0 + k1 * b / avgdl
    Cc = k1 * (1.0 - b)
    if A <= need * Bc:
        return None
    m = max(1, int(np.ceil(need * Cc / (A - need * Bc))))
    # defensive against float fuzz in the inversion: decode MORE, never
    # less, than the exact threshold
    while m > 1 and A * (m - 1) / (Bc * (m - 1) + Cc) >= need:
        m -= 1
    return m


# every-term-hot queries can't be pruned; above this df/N floor the
# MaxScore path falls back to the plain scorer (see ranked_pruned)
PRUNE_MIN_DF_FRACTION = 0.1


class SearchEngine:
    """Driver-facing engine over one built index."""

    def __init__(
        self,
        index_dir: str,
        mode: str = "local",
        num_actors: int = 2,
        stem: bool | None = None,
        adjacency=None,  # AdjacencyIndex for ReplyTo-style queries
        exact_delete_stats: bool = False,
    ):
        """``exact_delete_stats=True`` opts out of the default Lucene
        delete semantics (results filter immediately, SCORES keep the
        as-built collection/term statistics until a compacting merge):
        N / total-token / avgdl subtract the tombstoned docs at init and
        per-term df/ctf recompute from the tombstone-filtered posting —
        so post-delete BM25/Dirichlet scores equal a fresh rebuild over
        the surviving docs WITHOUT compaction, at the cost of the
        MaxScore pruned path (dictionary upper bounds assume as-built
        df; with live df < as-built df the idf grows, the stale bound
        can under-estimate and pruning would be unsafe — it falls back
        to the plain rank-identical scorer while tombstones exist)."""
        self.adjacency = adjacency
        if isinstance(index_dir, (list, tuple)):
            # validates config agreement + ascending disjoint doc-id
            # ranges BEFORE any actor spawns; actor mode then hands the
            # generation list to each SegmentSearcher, which concatenates
            # per-term postings in generation order
            self.local: LocalSegments | GenerationalSegments = (
                GenerationalSegments(list(index_dir))
            )
            index_dir = list(index_dir)
        else:
            self.local = LocalSegments(index_dir)
        self.manifest = self.local.manifest
        cfg = self.manifest.get("config", {})
        self.az = Analyzer(stem=cfg.get("stem", True) if stem is None else stem)
        self.stats = DocStats(None, part_dirs=self.local.docstat_part_dirs())
        self.N = self.manifest["num_docs"]
        self.C = self.manifest["total_tokens"]
        self.avgdl = self.manifest["avgdl"]
        tomb_sets = (
            [g.tombstones for g in self.local.gens]
            if isinstance(self.local, GenerationalSegments)
            else [self.local.tombstones]
        )
        from ..state.tombstones import in_sorted

        tombs = np.sort(np.concatenate(tomb_sets))
        # kept for the query paths that take RAW doc ids (ReplyTo
        # adjacency children) — posting reads filter tombstones at the
        # decode layer, but adjacency edges never pass through it
        self._tombs = tombs
        self._exact_stats = bool(exact_delete_stats) and tombs.size > 0
        if self._exact_stats:
            # subtract the tombstoned docs' counts/lengths from the
            # collection stats (doc ids are still physically present in
            # the docstat arrays until compaction, so lookups are exact)
            ok = in_sorted(self.stats.doc_ids, tombs)
            idx = np.searchsorted(self.stats.doc_ids, tombs[ok])
            self.N -= int(ok.sum())
            self.C -= int(self.stats.doc_lens[idx].sum())
            self.avgdl = (self.C / self.N) if self.N else 0.0
        self.mode = mode
        self.actors = []
        self._shards: list | None = None  # DocStatsShard actors, lazy
        # block-max pruning instrumentation (ranked_pruned): skip blocks
        # decoded vs total across this engine's bounded-decode calls
        self.prune_counters = {"blocks_decoded": 0, "blocks_total": 0}
        if mode == "actors":
            segs = list(range(self.local.num_segments))
            chunks = [segs[i::num_actors] for i in range(num_actors)]
            chunks = [c for c in chunks if c]
            self.actors = [
                SegmentSearcher.remote(index_dir, c) for c in chunks
            ]
            self._actor_of_seg = {}
            for a, c in zip(self.actors, chunks):
                for s in c:
                    self._actor_of_seg[s] = a

    # ---- per-term statistics under the two delete-semantics modes -----

    def _df(self, p: _Posting) -> int:
        """Document frequency for scoring: as-built (Lucene stale-stats
        semantics) or live (``exact_delete_stats`` — the filtered posting
        IS the live list, so its length is the rebuilt index's df)."""
        return p.doc_ids.size if self._exact_stats else p.df

    def _ctf(self, p: _Posting) -> int:
        return int(p.tfs.sum()) if self._exact_stats else p.ctf

    # ---- posting access (mode-dispatched) -----------------------------

    def _postings_map(
        self, terms: list[str], with_positions: bool = False
    ) -> dict[str, _Posting | None]:
        if with_positions and not self.manifest.get("config", {}).get(
            "store_positions", True
        ):
            # without this gate a phrase/proximity query dies in an
            # opaque numpy IndexError (empty positions, non-empty tfs)
            raise ValueError(
                "this index was built with store_positions=False — "
                "phrase, phrase-prefix and proximity queries need "
                "positional postings; rebuild with "
                "BuildConfig(store_positions=True)"
            )
        terms = list(dict.fromkeys(terms))
        if self.mode != "actors":
            return {t: self.local.postings(t, with_positions) for t in terms}
        by_actor: dict = {}
        for t in terms:
            seg = term_seg(t, self.local.num_segments)
            a = self._actor_of_seg[seg]
            by_actor.setdefault(a, []).append((t, seg))
        futs = [
            a.postings_many.remote(pairs, with_positions)
            for a, pairs in by_actor.items()
        ]
        out: dict[str, _Posting | None] = {}
        for res in ray.get(futs):
            for t, v in res.items():
                out[t] = _Posting(*v) if v is not None else None
        return out

    def _prefix_terms(self, prefix: str) -> list[str]:
        if self.mode != "actors":
            return self.local.prefix_terms(prefix)
        futs = [a.prefix_terms.remote(prefix) for a in self.actors]
        out: list[str] = []
        for r in ray.get(futs):
            out.extend(r)
        return sorted(dict.fromkeys(out))  # chunks/generations repeat terms

    def _wildcard_terms(self, pattern: str) -> list[str]:
        if self.mode != "actors":
            return self.local.wildcard_terms(pattern)
        futs = [a.wildcard_terms.remote(pattern) for a in self.actors]
        out: list[str] = []
        for r in ray.get(futs):
            out.extend(r)
        return sorted(dict.fromkeys(out))

    def _regex_terms(self, pattern: str) -> list[str]:
        if self.mode != "actors":
            return self.local.regex_terms(pattern)
        futs = [a.regex_terms.remote(pattern) for a in self.actors]
        out: list[str] = []
        for r in ray.get(futs):
            out.extend(r)
        return sorted(dict.fromkeys(out))

    def _term_meta(
        self, terms: list[str]
    ) -> dict[str, tuple[int, int, int] | None]:
        """{term: (df, ctf, max_tf) | None} from the term dictionaries
        only — the MaxScore bound inputs, zero blob decode (and in actor
        mode, answered by the segment owner, not duplicated driver
        state)."""
        terms = list(dict.fromkeys(terms))
        if self.mode != "actors":
            return {t: self.local.term_meta(t) for t in terms}
        by_actor: dict = {}
        for t in terms:
            seg = term_seg(t, self.local.num_segments)
            by_actor.setdefault(self._actor_of_seg[seg], []).append((t, seg))
        futs = [a.term_meta_many.remote(p) for a, p in by_actor.items()]
        out: dict = {}
        for r in ray.get(futs):
            out.update(r)
        return out

    def _postings_bounded(
        self, term: str, min_tf: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfs) of ``term`` restricted to skip blocks whose
        block max_tf ≥ ``min_tf``; updates the per-engine block-decode
        counters (``prune_counters``)."""
        if self.mode != "actors":
            d, t, dec, tot = self.local.postings_blocks_bounded(term, min_tf)
        else:
            seg = term_seg(term, self.local.num_segments)
            d, t, dec, tot = ray.get(
                self._actor_of_seg[seg].postings_blocks_bounded.remote(
                    term, seg, min_tf
                )
            )
        self.prune_counters["blocks_decoded"] += dec
        self.prune_counters["blocks_total"] += tot
        return d, t

    def _postings_for_docs(
        self, terms: list[str], docs: np.ndarray
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """{term: (doc_ids, tfs)} decoded from only the skip blocks whose
        range intersects ``docs`` (may be a block-superset; scorers
        intersect)."""
        terms = list(dict.fromkeys(terms))
        if self.mode != "actors":
            return {t: self.local.postings_for_docs(t, docs) for t in terms}
        by_actor: dict = {}
        for t in terms:
            seg = term_seg(t, self.local.num_segments)
            by_actor.setdefault(self._actor_of_seg[seg], []).append((t, seg))
        futs = [
            a.postings_for_docs_many.remote(p, docs)
            for a, p in by_actor.items()
        ]
        out: dict = {}
        for r in ray.get(futs):
            out.update(r)
        return out

    # ---- token-node result sets (sorted numpy doc-id arrays) ----------

    def _keyword_docs(self, word: str) -> np.ndarray:
        terms = self.az.query_terms(word)
        if not terms:
            return np.empty(0, np.int64)
        p = self._postings_map([terms[0]])[terms[0]]
        return p.doc_ids if p else np.empty(0, np.int64)

    def _prefix_docs(self, prefix: str) -> np.ndarray:
        stem = self.az.term(prefix.lower())
        terms = self._prefix_terms(stem)
        plists = self._postings_map(terms)
        arrs = [p.doc_ids for p in plists.values() if p is not None]
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def _wildcard_docs(self, pattern: str) -> np.ndarray:
        """Docs containing ANY dictionary term matching the ``*``-pattern
        (engine extension beyond the reference grammar — a lone trailing
        star keeps the reference's prefix semantics). The pattern is
        lowercased but NOT stemmed: wildcard pieces aren't words, so they
        match the dictionary's surface forms directly."""
        terms = self._wildcard_terms(pattern.lower())
        plists = self._postings_map(terms)
        arrs = [p.doc_ids for p in plists.values() if p is not None]
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def regex_docs(self, pattern: str) -> np.ndarray:
        """Docs containing ANY dictionary term whose whole surface form
        matches the regex (portable Python-re ∩ RE2 subset — see
        ``_regex_compiled``). Like the wildcard path, the expansion runs
        WHERE the dictionary lives (per segment / per actor), narrowed
        to the regex's required literal prefix; the pattern is
        case-folded on LITERALS only (escape sequences preserved — see
        ``_regex_casefold``) but not stemmed."""
        terms = self._regex_terms(_regex_casefold(pattern))
        plists = self._postings_map(terms)
        arrs = [p.doc_ids for p in plists.values() if p is not None]
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def suggest(
        self, word: str, k: int = 10, max_dist: int = 2
    ) -> list[tuple[str, int, int]]:
        """Spell suggestion from the index dictionary: the top-k terms
        within ``max_dist`` edits of ``lower(word)`` (the word itself
        excluded), ranked (distance asc, df desc, term asc) — a total
        order, so results are deterministic. The dictionary scan runs
        where the dictionary lives (per segment, per actor in actor
        mode); only candidates and their (df) dictionary rows travel.
        Returns [(term, dist, df)]."""
        w = word.lower()
        if self.mode != "actors":
            cands = self.local.spell_candidates(w, max_dist)
        else:
            cands: dict[str, int] = {}
            for r in ray.get(
                [a.spell_candidates.remote(w, max_dist) for a in self.actors]
            ):
                for t, d in r.items():
                    cands[t] = min(d, cands.get(t, d))
        cands.pop(w, None)
        meta = self._term_meta(list(cands))
        ranked = sorted(
            (
                (dist, -(meta[t][0] if meta.get(t) else 0), t)
                for t, dist in cands.items()
            ),
        )[:k]
        return [(t, dist, -negdf) for dist, negdf, t in ranked]

    def explain(self, query: str) -> dict:
        """Query debugging surface: the parsed plan plus each scoring
        term's dictionary statistics (df, ctf, max_tf — the MaxScore
        bound inputs) WITHOUT decoding any posting blob. Answered by the
        dictionary owners in actor mode, pure metadata reads locally."""
        plan = parse(query)
        toks = (
            plan.tokens
            if plan.kind == "ranked"
            else [t for g in plan.groups for t in g.positive + g.negative]
        )
        qterms = self.az.query_terms(plan.text) if plan.kind == "ranked" \
            else []
        meta = self._term_meta(qterms)
        return {
            "kind": plan.kind,
            "tokens": [(t.kind, t.value) for t in toks],
            "terms": {
                t: (
                    None
                    if meta.get(t) is None
                    else {
                        "df": int(meta[t][0]),
                        "ctf": int(meta[t][1]),
                        "max_tf": int(meta[t][2]),
                    }
                )
                for t in qterms
            },
            "n_docs": int(self.N),
            "collection_tokens": int(self.C),
        }

    def fuzzy_docs(self, word: str, max_dist: int = 1) -> np.ndarray:
        """Typo-tolerant term search: docs containing ANY dictionary
        term within ``max_dist`` edits of ``lower(word)`` — the word
        itself INCLUDED (unlike ``suggest``, which proposes
        alternatives). Candidate expansion runs where the dictionary
        lives (the ``suggest`` scan); the postings union is the
        wildcard path's."""
        w = word.lower()
        if self.mode != "actors":
            cands = self.local.spell_candidates(w, max_dist)
        else:
            cands = {}
            for r in ray.get(
                [a.spell_candidates.remote(w, max_dist) for a in self.actors]
            ):
                cands.update(r)
        plists = self._postings_map(sorted(cands))
        arrs = [p.doc_ids for p in plists.values() if p is not None]
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def _anchored(self, phrase: str) -> list[tuple[int, str]]:
        terms = [self.az.term(t) for t in self.az.tokens(phrase)]
        return [
            (off, t)
            for off, t in enumerate(terms)
            if MIN_STEM_LEN <= len(t) <= MAX_STEM_LEN
        ]

    def _phrase_docs_from(
        self, anchored: list[tuple[int, str]], plists: dict[str, _Posting | None]
    ) -> np.ndarray:
        """Position-adjacency phrase verification — fully vectorized
        (SURVEY.md §2.4 J6): intersect doc sets, then intersect
        (doc, shifted-position) key arrays across the phrase terms. Cost is
        O(total positions of the phrase terms within candidate docs);
        no Python loop over documents."""
        if not anchored:
            return np.empty(0, np.int64)
        ps = [plists.get(t) for _, t in anchored]
        if any(p is None for p in ps):
            return np.empty(0, np.int64)
        cand = ps[0].doc_ids
        for p in ps[1:]:
            cand = np.intersect1d(cand, p.doc_ids, assume_unique=True)
        if cand.size == 0:
            return cand
        base_off = anchored[0][0]
        keys: np.ndarray | None = None
        for (off, _), p in zip(anchored, ps):
            # rows of this posting that are candidates
            ridx = np.searchsorted(p.doc_ids, cand)
            tf = p.tfs[ridx]
            starts = p.pos_starts[ridx]
            total = int(tf.sum())
            if total == 0:
                return np.empty(0, np.int64)
            # gather each candidate doc's position slice (segmented gather)
            out_starts = np.zeros(len(tf), dtype=np.int64)
            np.cumsum(tf[:-1], out=out_starts[1:])
            gidx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(out_starts, tf)
                + np.repeat(starts, tf)
            )
            pos = p.positions[gidx] - (off - base_off)
            doc_idx = np.repeat(np.arange(len(cand), dtype=np.int64), tf)
            # a negative shifted position can never align with the base
            # anchor's rows (whose shifted pos == raw pos ≥ 0) — drop it
            # rather than bias it: a fixed bias underflows for anchors
            # more than bias tokens into the phrase, and a negative OR
            # operand sign-extends over the doc_idx bits, colliding keys
            # across docs
            ok = pos >= 0
            if not ok.all():
                pos, doc_idx = pos[ok], doc_idx[ok]
                if pos.size == 0:
                    return np.empty(0, np.int64)
            k = (doc_idx << np.int64(33)) | pos
            keys = k if keys is None else np.intersect1d(
                k, keys, assume_unique=True
            )
            if keys.size == 0:
                return np.empty(0, np.int64)
        return cand[np.unique(keys >> np.int64(33))]

    def proximity(
        self,
        term_a: str,
        term_b: str,
        within: int = 3,
        ordered: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """NEAR/k proximity search: (doc_ids, min_dist) for documents
        where some occurrence of ``term_a`` lies within ``within`` token
        positions of some occurrence of ``term_b`` (unordered —
        |pos_a − pos_b| ≤ within). With ``ordered=True`` only ``term_b``
        occurrences AFTER the ``term_a`` occurrence count (ONEAR/k:
        0 < pos_b − pos_a ≤ within) — the directed phrase relaxation.
        The natural generalization of the phrase query (phrase ≡
        ordered distance-1 chains); the reference stops at phrases,
        this uses the same position stream. Fully vectorized: per-doc
        position slices gather segmented (as in ``_phrase_docs_from``),
        nearest opposite-term occurrence via two ``searchsorted``
        probes on (doc, pos) composite keys (the forward probe alone in
        ordered mode — two distinct terms never share a position, so
        the right neighbor IS the nearest following occurrence), per-doc
        minima via one ``minimum.reduceat``."""
        ta = self.az.query_terms(term_a)
        tb = self.az.query_terms(term_b)
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if not ta or not tb:
            return empty
        plists = self._postings_map([ta[0], tb[0]], with_positions=True)
        pa_, pb_ = plists.get(ta[0]), plists.get(tb[0])
        if pa_ is None or pb_ is None:
            return empty
        cand = np.intersect1d(pa_.doc_ids, pb_.doc_ids, assume_unique=True)
        if cand.size == 0:
            return empty

        def gather(p):
            ridx = np.searchsorted(p.doc_ids, cand)
            tf = p.tfs[ridx]
            starts = p.pos_starts[ridx]
            total = int(tf.sum())
            out_starts = np.zeros(len(tf), dtype=np.int64)
            np.cumsum(tf[:-1], out=out_starts[1:])
            gidx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(out_starts, tf)
                + np.repeat(starts, tf)
            )
            return p.positions[gidx], tf, out_starts

        pos_a, tf_a, a_starts = gather(pa_)
        pos_b, tf_b, _ = gather(pb_)
        da = np.repeat(np.arange(len(cand), dtype=np.int64), tf_a)
        db = np.repeat(np.arange(len(cand), dtype=np.int64), tf_b)
        ka = (da << np.int64(33)) | pos_a
        kb = (db << np.int64(33)) | pos_b  # sorted: docs asc, pos asc
        INF = np.int64(1) << np.int64(62)
        idx = np.searchsorted(kb, ka)
        # when both inputs analyze to the SAME index term (e.g.
        # NEAR(run, runs) under stemming) every ka occurrence finds
        # ITSELF at idx (kb == ka elementwise); the nearest following
        # DISTINCT occurrence is idx+1 and distance-0 self-pairs must
        # not count — a doc needs two occurrences to match. Distinct
        # terms never share a (doc, pos) key, so idx already points
        # past self there.
        fwd = idx + 1 if ta[0] == tb[0] else idx
        r = np.minimum(fwd, len(kb) - 1)
        l = np.maximum(idx - 1, 0)
        d_r = np.where(
            (fwd < len(kb)) & ((kb[r] >> np.int64(33)) == da),
            (kb[r] & ((np.int64(1) << 33) - 1)) - pos_a,
            INF,
        )
        if ordered:
            dist = d_r
        else:
            d_l = np.where(
                (idx > 0) & ((kb[l] >> np.int64(33)) == da),
                pos_a - (kb[l] & ((np.int64(1) << 33) - 1)),
                INF,
            )
            dist = np.minimum(d_r, d_l)
        per_doc = np.minimum.reduceat(dist, a_starts)
        hit = per_doc <= within
        return cand[hit], per_doc[hit]

    def _phrase_docs(self, phrase: str) -> np.ndarray:
        anchored = self._anchored(phrase)
        plists = self._postings_map(
            [t for _, t in anchored], with_positions=True
        )
        return self._phrase_docs_from(anchored, plists)

    def _phrase_prefix_docs(self, phrase: str) -> np.ndarray:
        toks = self.az.tokens(phrase)
        if not toks:
            return np.empty(0, np.int64)
        anchored = self._anchored(phrase)
        last_off = len(toks) - 1
        lead = [(o, t) for o, t in anchored if o != last_off]
        expansions = self._prefix_terms(self.az.term(toks[-1]))
        plists = self._postings_map(
            [t for _, t in lead] + expansions, with_positions=True
        )
        out = [
            self._phrase_docs_from(lead + [(last_off, e)], plists)
            for e in expansions
        ]
        out = [a for a in out if a.size]
        if not out:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(out))

    def _token_docs(self, tok: Token) -> np.ndarray:
        if tok.kind == "keyword":
            return self._keyword_docs(tok.value)
        if tok.kind == "prefix":
            return self._prefix_docs(tok.value)
        if tok.kind == "wildcard":
            return self._wildcard_docs(tok.value)
        if tok.kind == "regex":
            return self.regex_docs(tok.value)
        if tok.kind == "phrase":
            return self._phrase_docs(tok.value)
        if tok.kind == "phrase_prefix":
            return self._phrase_prefix_docs(tok.value)
        if tok.kind == "replyto":
            if self.adjacency is None:
                raise NotImplementedError(
                    "ReplyTo needs an adjacency index — pass "
                    "SearchEngine(..., adjacency=AdjacencyIndex(dir)) built "
                    "with pipelines.adjacency.build_adjacency (the "
                    "reference's reply_to_index, SURVEY.md §2.4 J4)."
                )
            from ..state.tombstones import in_sorted

            docs = np.sort(
                self.adjacency.children(int(tok.value)).astype(np.int64)
            )
            # adjacency edges are raw ids that never pass the posting
            # decode layer: enforce the delete contract here (results
            # never contain a tombstoned doc). Ids NOT in this index
            # (adjacency over a foreign key space) stay — boolean
            # algebra over adjacency is a pure id-set operation; the
            # ranked scorer drops unscorable candidates itself.
            if self._tombs.size and docs.size:
                docs = docs[~in_sorted(self._tombs, docs)]
            return docs
        raise QueryParseError(f"unknown token kind {tok.kind}")

    # ---- public API ----------------------------------------------------

    def boolean(self, plan: QueryPlan) -> np.ndarray:
        """Unranked sorted doc-id set (reference ``SearchEngine.py:254-271``)."""
        result = np.empty(0, np.int64)
        for g in plan.groups:
            acc: np.ndarray | None = None
            for tok in g.positive:
                docs = self._token_docs(tok)
                acc = docs if acc is None else np.intersect1d(
                    acc, docs, assume_unique=True
                )
            for tok in g.negative:
                if acc is None or acc.size == 0:
                    break
                acc = np.setdiff1d(
                    acc, self._token_docs(tok), assume_unique=True
                )
            if acc is not None and acc.size:
                result = np.union1d(result, acc)
        return result

    def ranked(
        self,
        plan: QueryPlan,
        k: int | None = 10,
        scorer: str = "bm25",
        k1: float = BM25_K1,
        b: float = BM25_B,
        mu: float = DIRICHLET_MU,
        cutoff: float | None | str = "auto",
        allowed: np.ndarray | None = None,
        boost: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Ranked top-k over the union of the query tokens' candidates.

        BM25 (north_rule primary) scores only docs containing ≥1 query
        term; Dirichlet (reference parity) applies the f=0 branch over the
        same candidate union and the frequent-term cutoff
        (``SearchEngine.py:88-91``).

        ``allowed`` (sorted unique doc ids) restricts the CANDIDATE set
        (metadata-filtered search, e.g. lang='en' only); collection and
        term statistics stay global — the standard filtered-search
        semantics, so a doc's score is filter-independent.

        ``boost`` = (sorted doc ids, weights): static per-document score
        multipliers applied AFTER term accumulation, before top-k —
        document boosting by metadata (recency/quality/field weights).
        Docs absent from the array keep weight 1.0; the array is the
        broadcastable dimension side (``dp.doc_weights_by_lang``)."""
        if cutoff == "auto":
            # reference applies the frequent-term skip only in the
            # Dirichlet scorer (SearchEngine.py:88-91); BM25 has none
            cutoff = FREQ_CUTOFF if scorer == "dirichlet" else None
        qterms = self.az.query_terms(plan.text)
        plists = self._postings_map(qterms)
        terms = [t for t in qterms if plists.get(t) is not None]
        if cutoff is not None:
            limit = self.C * cutoff
            terms = [t for t in terms if self._ctf(plists[t]) <= limit]
        # candidates: union of the token nodes' result sets — exactly the
        # reference's ranked path (``SearchEngine.py:274-276``: union of
        # children's basic_search results), NOT the union of scoring-term
        # postings; for free-text keyword queries the two coincide.
        # Keyword tokens reuse the postings batch-fetched above instead
        # of re-issuing one _postings_map RPC each (in actor mode that
        # was N serial round trips re-shipping the same arrays).
        def _tok_docs(tok: Token) -> np.ndarray:
            if tok.kind == "keyword":
                ts = self.az.query_terms(tok.value)
                if not ts:
                    return np.empty(0, np.int64)
                if ts[0] in plists:  # missing key ≠ fetched-and-absent
                    p = plists[ts[0]]
                    return (
                        p.doc_ids if p is not None else np.empty(0, np.int64)
                    )
            return self._token_docs(tok)

        arrs = [_tok_docs(tok) for tok in plan.tokens]
        arrs = [a for a in arrs if a.size]
        if not arrs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate(arrs))
        if allowed is not None:
            # not assume_unique: callers may pass raw (duplicated) id lists
            cand = np.intersect1d(cand, np.asarray(allowed, np.int64))
            if not cand.size:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        if any(t.kind == "replyto" for t in plan.tokens):
            # adjacency candidates may carry ids this index has never
            # seen (foreign key space / dangling edges) — they have no
            # doc length and no terms, so they are unscorable: drop them
            # instead of crashing lens_for or borrowing a neighbor's
            # length. Posting-derived candidates always pass.
            from ..state.tombstones import in_sorted

            cand = cand[in_sorted(self.stats.doc_ids, cand)]
            if not cand.size:
                return np.empty(0, np.int64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        lens = self.stats.lens_for(cand)
        for t in terms:  # query-term order = deterministic float order
            p = plists[t]
            if scorer == "bm25":
                bm25_accumulate(
                    scores, cand, p.doc_ids, p.tfs, lens, self._df(p),
                    self.N, self.avgdl, k1, b,
                )
            elif scorer == "dirichlet":
                dirichlet_accumulate(
                    scores, cand, p.doc_ids, p.tfs, lens, self._ctf(p),
                    self.C, mu,
                )
            else:
                raise ValueError(f"unknown scorer {scorer}")
        if boost is not None:
            bids, bw = boost
            if bids.size:
                from ..state.tombstones import in_sorted

                hit = in_sorted(bids, cand)
                idx = np.minimum(
                    np.searchsorted(bids, cand), bids.size - 1
                )
                scores = scores * np.where(hit, bw[idx], 1.0)
        return topk(cand, scores, k)

    def ranked_pruned(
        self,
        plan: QueryPlan,
        k: int = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> tuple[np.ndarray, np.ndarray]:
        """MaxScore-pruned BM25 top-k — rank-identical to ``ranked`` by
        construction (the north_star's pruned-BM25 over the v4 block-max
        blobs).

        Three skip levers, none of which changes any returned score:

        1. upper bounds come from the term DICTIONARY (df/ctf/max_tf) —
           no posting is decoded to decide processing order;
        2. candidate-driving terms are processed in descending
           upper-bound order and decoded lazily; once the summed bound of
           the remaining driving terms (plus the constant bound of
           non-candidate scoring terms) is STRICTLY below the current
           k-th score, unseen docs cannot reach the top-k and the
           remaining terms' lists are NEVER decoded;
        3. scoring the new candidates against every other query term
           decodes only the skip blocks whose doc-range intersects them
           (``postings_for_docs``) — a hot tail term contributes a few
           128-doc blocks, not its full list.

        Every returned doc is scored with ALL query terms, so returned
        scores equal the unpruned scorer's exactly.

        Upper bound per term (valid for every posting since the BM25 term
        contribution increases in tf and decreases in dl ≥ tf):
            ub = idf * (k1+1) * mtf / ((1 + k1*b/avgdl) * mtf + k1*(1-b))
        """
        if any(t.kind != "keyword" for t in plan.tokens):
            # pruning reasons over keyword posting lists only
            return self.ranked(plan, k=k, scorer="bm25", k1=k1, b=b)
        if self._exact_stats:
            # dictionary upper bounds assume as-built df; live df is
            # smaller → idf larger → the stale bound can under-estimate
            # and skipping would be unsound. Plain scorer is
            # rank-identical; pruning resumes after compaction.
            return self.ranked(plan, k=k, scorer="bm25", k1=k1, b=b)
        qterms = self.az.query_terms(plan.text)
        meta = self._term_meta(qterms)
        # adaptive gate: when EVERY query term is hot (df above a large
        # fraction of N) MaxScore cannot skip anything — no term's list
        # is droppable and per-block max_tf bounds clear any reachable
        # threshold — so the machinery only adds overhead (measured 2×
        # latency on all-hot queries over the bench corpus, while a
        # rare-term query wins 3× by never decoding the hot lists). The
        # plain scorer is rank-identical by construction, so fall back.
        dfs = [m[0] for m in meta.values() if m is not None]
        if dfs and min(dfs) > PRUNE_MIN_DF_FRACTION * self.N:
            return self.ranked(plan, k=k, scorer="bm25", k1=k1, b=b)
        # candidate universe: the FIRST analyzed term of each keyword —
        # exactly ranked()'s _keyword_docs, so the two paths agree even
        # for keywords that analyze to multiple index terms (e.g.
        # 'covid-19' → ['covid', '19']: '19' scores but never generates
        # candidates on its own)
        cand_terms: list[str] = []
        for tok in plan.tokens:
            ts = self.az.query_terms(tok.value)
            if ts and meta.get(ts[0]) is not None and ts[0] not in cand_terms:
                cand_terms.append(ts[0])
        if not cand_terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # per-occurrence weights preserved: a duplicated query term scores
        # multiple times in ranked(); count multiplicity
        scored_terms = [
            t for t in dict.fromkeys(qterms) if meta.get(t) is not None
        ]
        mult = {t: qterms.count(t) for t in scored_terms}
        ub = {}
        for t in scored_terms:
            df, _, mtf = meta[t]
            mtf = float(max(mtf, 1))
            idf = np.log(1.0 + (self.N - df + 0.5) / (df + 0.5))
            ub[t] = (
                idf * (k1 + 1.0) * mtf
                / ((1.0 + k1 * b / self.avgdl) * mtf + k1 * (1.0 - b))
            ) * mult[t]
        # terms that score but never drive candidacy: an unseen doc may
        # still contain them, so their total upper bound is a CONSTANT in
        # the stopping rule (zero in the common one-term-per-keyword case)
        noncand_ub = sum(v for t, v in ub.items() if t not in cand_terms)
        ubs = [ub[t] for t in cand_terms]
        order = np.argsort(-np.asarray(ubs), kind="stable")
        suffix = np.zeros(len(order) + 1)
        for i in range(len(order) - 1, -1, -1):
            suffix[i] = suffix[i + 1] + ubs[int(order[i])]

        seen = np.empty(0, np.int64)
        all_docs: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        theta = -np.inf
        n_scored = 0
        for rank_i, oi in enumerate(order):
            if n_scored >= k and suffix[rank_i] + noncand_ub < theta:
                break
            t = cand_terms[int(oi)]
            # block-max refinement (v4 per-block max_tf directory): once
            # the heap is full, a block of THIS term whose best-possible
            # contribution plus the remaining terms' bounds stays below
            # theta cannot produce a top-k candidate — translate the
            # score threshold into a min block max_tf and decode only
            # blocks at or above it (min_tf=1 == decode everything). A
            # doc skipped here was bounded below the theta of ITS skip
            # moment, which only grows — sound even though a later term
            # may re-surface it as a candidate and score it exactly.
            rest = suffix[rank_i + 1] + noncand_ub
            min_tf = 1
            if n_scored >= k and np.isfinite(theta):
                min_tf = min_tf_for_bound(
                    theta - rest - 1e-9,
                    meta[t][0], self.N, self.avgdl, mult[t], k1, b,
                )
                if min_tf is None:
                    continue  # no block of t can reach theta
            d_t, _ = self._postings_bounded(t, min_tf)
            new = np.setdiff1d(d_t, seen, assume_unique=True)
            if new.size == 0:
                continue
            scores = np.zeros(len(new))
            lens = self.stats.lens_for(new)
            sub = self._postings_for_docs(scored_terms, new)
            for qt in qterms:  # full scoring, query-term order (identity)
                if meta.get(qt) is None:
                    continue
                d_sub, tf_sub = sub[qt]
                bm25_accumulate(
                    scores, new, d_sub, tf_sub, lens, meta[qt][0],
                    self.N, self.avgdl, k1, b,
                )
            all_docs.append(new)
            all_scores.append(scores)
            seen = np.union1d(seen, new)
            n_scored += len(new)
            if n_scored >= k:
                flat = np.concatenate(all_scores)
                theta = np.partition(flat, len(flat) - k)[len(flat) - k]
        if not all_docs:
            # every driving term's (tombstone-filtered) list was empty —
            # e.g. all matching docs deleted while the terms remain in the
            # as-built dictionary; mirror ranked()'s empty result
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return topk(
            np.concatenate(all_docs), np.concatenate(all_scores), k
        )

    def ranked_by_range(
        self,
        plan: QueryPlan,
        k: int | None = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k scored BY DOC-RANGE PARTITION — the 10^12-doc scale
        path (SURVEY.md scale note at the top of this module): each
        docstat shard actor loads its own (doc_id, doc_len) partition,
        receives the query's posting arrays ONCE via the object store,
        slices them to its range, scores locally, and returns a k-row
        heap; the driver merges #shards × k rows. The driver-resident
        DocStats array is never touched, so doc-length state scales with
        the number of shards, not with one process's heap.

        Rank-identical to ``ranked()``: per-doc scores are accumulated in
        the same query-term order, candidates partition disjointly across
        shards, and the merged top-k uses the same canonical tie-break."""
        if any(t.kind != "keyword" for t in plan.tokens):
            return self.ranked(plan, k=k, scorer="bm25", k1=k1, b=b)
        qterms = self.az.query_terms(plan.text)
        plists = self._postings_map(qterms)
        cand_arrays = []
        seen_terms: set[str] = set()
        for tok in plan.tokens:
            ts = self.az.query_terms(tok.value)
            if ts and plists.get(ts[0]) is not None and ts[0] not in seen_terms:
                seen_terms.add(ts[0])
                cand_arrays.append(plists[ts[0]].doc_ids)
        if not cand_arrays:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        score_lists = [
            (plists[t].doc_ids, plists[t].tfs, self._df(plists[t]))
            for t in qterms
            if plists.get(t) is not None
        ]
        if self._shards is None:
            self._shards = [
                DocStatsShard.remote(p)
                for p in self.local.docstat_part_dirs()
            ]
        # one object-store put each; every shard reads the same copy
        cand_ref = ray.put(cand_arrays)
        score_ref = ray.put(score_lists)
        futs = [
            s.score_bm25.remote(
                cand_ref, score_ref, self.N, self.avgdl, k1, b, k
            )
            for s in self._shards
        ]
        parts_res = ray.get(futs)
        ids = np.concatenate([r[0] for r in parts_res])
        scores = np.concatenate([r[1] for r in parts_res])
        return topk(ids, scores, k)

    def search(
        self,
        query: str,
        k: int | None = 10,
        scorer: str = "bm25",
        prune: bool = False,
        **kw,
    ):
        """Parse + dispatch. Boolean → sorted id array; ranked →
        (doc_ids, scores). ``prune=True`` uses the MaxScore-pruned BM25
        path (rank-identical) when applicable."""
        plan = parse(query)
        if plan.kind == "boolean":
            return self.boolean(plan)
        if (
            prune
            and scorer == "bm25"
            and k is not None
            and kw.get("allowed") is None
            and set(kw) <= {"allowed", "k1", "b"}
            and all(t.kind == "keyword" for t in plan.tokens)
        ):
            # candidate-restricted search skips MaxScore (the pruning
            # bounds reason over unrestricted candidate sets), and so do
            # ranked()-only kwargs (boost/cutoff/mu): fall through to the
            # rank-identical plain scorer rather than TypeError
            kw.pop("allowed", None)
            return self.ranked_pruned(plan, k=k, **kw)
        return self.ranked(plan, k=k, scorer=scorer, **kw)


class QueryEval:
    """map_batches actor class: evaluate a batch of queries against the
    index — the Ray-Data-shaped batch query path (a Dataset of queries
    over a stateful actor pool; SURVEY.md §2.3 ST2)."""

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        scorer: str = "bm25",
        prune: bool = True,
    ):
        self.engine = SearchEngine(index_dir, mode="local")
        self.k = k
        self.scorer = scorer
        self.prune = prune

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_out, rank_out, doc_out, score_out = [], [], [], []
        for q in batch["query"].to_pylist():
            plan = parse(q)
            if plan.kind == "boolean":
                ids = self.engine.boolean(plan)
                scores = np.full(len(ids), np.nan)
            elif (
                self.prune
                and self.scorer == "bm25"
                and all(t.kind == "keyword" for t in plan.tokens)
            ):
                ids, scores = self.engine.ranked_pruned(plan, k=self.k)
            else:
                ids, scores = self.engine.ranked(
                    plan, k=self.k, scorer=self.scorer
                )
            q_out.extend([q] * len(ids))
            rank_out.extend(range(1, len(ids) + 1))
            doc_out.extend(ids.tolist())
            score_out.extend(scores.tolist())
        return pa.table(
            {
                "query": pa.array(q_out, pa.string()),
                "rank": pa.array(rank_out, pa.int32()),
                "doc_id": pa.array(doc_out, pa.int64()),
                "score": pa.array(score_out, pa.float64()),
            }
        )


from collections import OrderedDict as _OrderedDict

_QUERY_EVAL_CACHE: "_OrderedDict[tuple, QueryEval]" = _OrderedDict()
_QUERY_EVAL_CACHE_MAX = 4  # engines pin mmaps + a posting cache each


def _index_state_token(index_dir) -> tuple:
    """Stat-based fingerprint of an index's mutable on-disk state —
    collection.json (rewritten by any rebuild/compaction) and the
    tombstone sidecar (replaced by every delete_docs). Two stat calls
    per dir per batch, so a warm worker never serves an engine opened
    before a delete or an in-place rebuild."""
    from ..state.tombstones import TOMBSTONE_FILE

    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    tok = []
    for d in dirs:
        for name in ("collection.json", TOMBSTONE_FILE):
            try:
                st = os.stat(os.path.join(d, name))
                tok.append((st.st_mtime_ns, st.st_size))
            except OSError:
                tok.append((0, 0))
    return tuple(tok)


def _query_eval_batch(
    batch: pa.Table,
    index_dir,
    k: int,
    scorer: str,
    prune: bool,
) -> pa.Table:
    """Stateless-task query evaluation with the ENGINE cached per worker
    PROCESS (the tokenizer/embedder warm-worker pattern): plain tasks
    reuse Ray's already-warm workers, so a query batch pays no actor
    spawn, while the opened index (mmaps, dictionaries, hot-term
    posting cache) persists across batches AND across search_many
    calls on the same worker. Keyed by the index's on-disk state token,
    and bounded LRU, so deletes/rebuilds invalidate and stale engines
    are dropped rather than pinned forever."""
    key = (
        tuple(index_dir) if isinstance(index_dir, list) else index_dir,
        k, scorer, prune,
        _index_state_token(index_dir),
    )
    inst = _QUERY_EVAL_CACHE.get(key)
    if inst is None:
        inst = QueryEval(index_dir, k=k, scorer=scorer, prune=prune)
        _QUERY_EVAL_CACHE[key] = inst
        while len(_QUERY_EVAL_CACHE) > _QUERY_EVAL_CACHE_MAX:
            _QUERY_EVAL_CACHE.popitem(last=False)
    else:
        _QUERY_EVAL_CACHE.move_to_end(key)
    return inst(batch)


def search_many(
    index_dir: str | list[str],
    queries: list[str],
    k: int = 10,
    scorer: str = "bm25",
    concurrency: int = 2,
    prune: bool = True,
    actors: bool = False,
):
    """Dataset-of-queries → warm-worker tasks (default) or an explicit
    actor pool → results Dataset.

    ``prune`` forwards to QueryEval (MaxScore-pruned BM25 — rank-identical
    to the unpruned scorer, so True is the default on both paths; pass
    False to force the plain scorer, matching SearchEngine.search's
    opt-in semantics from the other direction). ``index_dir`` may be a
    GENERATION LIST (unmerged extend_generation output) — each worker
    opens a GenerationalSegments view.

    ``actors=True`` forces the explicit ACTOR-POOL form (engine opened
    once per actor in ``__init__`` — the shape for a long-lived serving
    pool); the default stateless-task form is identical output with the
    engine cached per warm worker process, so a one-shot batch skips
    the actor-spawn latency entirely."""
    import ray.data

    ds = ray.data.from_items([{"query": q} for q in queries])
    if actors:
        return ds.map_batches(
            QueryEval,
            fn_constructor_kwargs=dict(
                index_dir=index_dir, k=k, scorer=scorer, prune=prune
            ),
            batch_size=max(1, len(queries) // max(1, concurrency)),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return ds.map_batches(
        _query_eval_batch,
        fn_kwargs=dict(index_dir=index_dir, k=k, scorer=scorer, prune=prune),
        batch_size=max(1, len(queries) // max(1, concurrency)),
        batch_format="pyarrow",
    )
