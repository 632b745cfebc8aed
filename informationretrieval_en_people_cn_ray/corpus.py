"""Deterministic synthetic source-code corpus (the ``input_hint`` schema).

Replaces the reference's crawler + standardize step (SURVEY.md §3.3 —
``people_spider.py``, ``standardize_format.py``): our corpus is given as a
Parquet table ``(repo, path, commit, lang, content)`` per
``BASELINE.json: input_hint``, synthesized deterministically (seeded, no
external data) per FIXTURES.md §1:

- Zipf-distributed vocabulary with hot head terms (``the``, ``def``,
  ``return`` …) to exercise skew handling,
- mixed case (exercises lowercasing), inflected words (exercise stemming),
- punctuation/unicode runs, 1-char tokens and a >128-char token (exercise
  the ``1 < len(stem) <= 128`` filter), embedded newlines and quotes,
- a ``content_sha256`` column so the pipeline can verify the per-row
  content-sha256 invariant against the source table.

Written as several Parquet files with multiple row groups each, so the
fragment-level doc-id assignment (sources/corpus_source.py) has real
parallel structure to chew on.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_HOT = [
    "the", "def", "return", "import", "class", "if", "else", "for", "in",
    "self", "none", "true", "false", "data", "value", "result", "name",
]

_INFLECTED = [
    "running", "characters", "relational", "conditional", "operators",
    "adjustment", "dependencies", "formatted", "tokenizer", "indexes",
    "compression", "searched", "ranking", "merging", "partitioned",
    "Running", "CHARACTERS", "Tokenized", "streaming", "shuffled",
]

_LANGS = {"py": "py", "java": "java", "go": "go", "rs": "rs", "md": "md"}


def _vocab(seed: int) -> list[str]:
    rng = np.random.RandomState(seed)
    vocab = list(_HOT) + list(_INFLECTED)
    # generated identifiers: mixed-case, digits
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for i in range(2000):
        n = 3 + int(rng.randint(0, 8))
        w = "".join(rng.choice(letters, n))
        if i % 7 == 0:
            w = w.capitalize()
        if i % 11 == 0:
            w = w + str(int(rng.randint(0, 100)))
        vocab.append(w)
    return vocab


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


LONG_TOKEN = "q" * 130  # > MAX_STEM_LEN → must be dropped from the index


def _gen_docs(seed: int, start: int, count: int, avg_tokens: int,
              vocab: np.ndarray, probs: np.ndarray) -> pa.Table:
    """Docs for global indices [start, start+count) — content depends only
    on (seed, chunk start), so chunks generate independently (multi-GB
    bench corpora) while staying fully deterministic."""
    rng = np.random.RandomState((seed * 1_000_003 + start) % (2**31 - 1))
    doc_lens = rng.randint(max(4, avg_tokens // 4), avg_tokens * 2, size=count)
    total = int(doc_lens.sum())
    toks = rng.choice(vocab, size=total, p=probs)
    bounds = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(doc_lens, out=bounds[1:])

    langs = list(_LANGS)
    repos, paths, commits, lang_col, contents, shas = [], [], [], [], [], []
    for j in range(count):
        i = start + j
        body = " ".join(toks[bounds[j] : bounds[j + 1]])
        # deterministic spice: punctuation, quotes, unicode, short/long tokens
        if i % 5 == 0:
            body = 'x = "quoted, string!" §¸…· \n' + body
        if i % 13 == 0:
            body = body + "\n" + LONG_TOKEN + " y z"
        lang = langs[i % len(langs)]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/pkg{i % 41}/mod_{i}.{lang}"
        repos.append(repo)
        paths.append(path)
        commits.append(
            hashlib.sha256(f"{repo}/{path}@{seed}".encode()).hexdigest()[:40]
        )
        lang_col.append(lang)
        contents.append(body)
        shas.append(hashlib.sha256(body.encode()).hexdigest())

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "content": pa.array(contents, pa.string()),
            "content_sha256": pa.array(shas, pa.string()),
        }
    )


def generate_corpus(
    n_files: int, seed: int = 42, avg_tokens: int = 80, start: int = 0
) -> pa.Table:
    """Deterministic corpus table; identical output for identical args."""
    vocab = np.array(_vocab(seed), dtype=object)
    probs = _zipf_probs(len(vocab))
    return _gen_docs(seed, start, n_files, avg_tokens, vocab, probs)


def write_corpus(
    out_dir: str,
    n_files: int,
    seed: int = 42,
    num_parquet_files: int = 4,
    row_group_size: int | None = None,
    avg_tokens: int = 80,
) -> str:
    """Write the corpus as ``part-XXXXX.parquet`` files, one generation
    chunk per parquet file (bounded memory at any corpus size).
    Idempotent: if the directory already holds a matching ``_corpus.json``
    stamp, it is reused (bench + queries() cache on this)."""
    import glob
    import json

    from .state.manifest import write_json_atomic

    stamp = {
        "n_files": n_files,
        "seed": seed,
        "num_parquet_files": num_parquet_files,
        "avg_tokens": avg_tokens,
        "row_group_size": row_group_size,
        "v": 2,
    }
    stamp_path = os.path.join(out_dir, "_corpus.json")
    if os.path.exists(stamp_path):
        try:
            with open(stamp_path) as f:
                if json.load(f) == stamp:
                    return out_dir
        except (json.JSONDecodeError, OSError):
            pass  # truncated stamp from a killed run → regenerate
    os.makedirs(out_dir, exist_ok=True)
    # A stamp mismatch means the directory holds a DIFFERENT corpus.
    # Drop the stale stamp first (a kill mid-regeneration must not leave a
    # valid-looking stamp over mixed parts), then every old part file — a
    # smaller regeneration would otherwise leave orphan parts behind that
    # corpus_files() globs right back into the corpus.
    if os.path.exists(stamp_path):
        os.remove(stamp_path)
    for stale in glob.glob(os.path.join(out_dir, "part-*.parquet")):
        os.remove(stale)
    vocab = np.array(_vocab(seed), dtype=object)
    probs = _zipf_probs(len(vocab))
    per = (n_files + num_parquet_files - 1) // num_parquet_files
    rg = row_group_size or max(64, min(2048, per // 4))
    for f in range(num_parquet_files):
        lo, hi = f * per, min((f + 1) * per, n_files)
        if lo >= hi:
            break
        table = _gen_docs(seed, lo, hi - lo, avg_tokens, vocab, probs)
        pq.write_table(
            table,
            os.path.join(out_dir, f"part-{f:05d}.parquet"),
            row_group_size=rg,
        )
    write_json_atomic(stamp_path, stamp)
    return out_dir
