"""End-to-end random-unicode-text parity for the text-analysis ops —
the full op (Arrow batch tokenizer → vectorized scoring) against its
DuckDB oracle on texts drawn from the tokenizer's known hazard set
(Turkish İ, ligatures, ß, punctuation runs, empty/whitespace docs)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WORDS = [
    "the", "a", "table", "scan", "İstanbul", "ﬁle", "Straße", "xßy",
    "Héllo", "WORLD", "x9", "aİb", "ﬂow", "er", "see", "aa", "q",
    "part", "filter", "longtokenxxxxxxxxxxxx",
]
PUNCT = ["", ",", "!", " §· ", "  ", "\t"]


def _mk_docs(d: str, seed: int, n: int):
    rng = np.random.RandomState(seed)
    texts = []
    for _ in range(n):
        k = int(rng.randint(0, 14))
        parts = []
        for _ in range(k):
            parts.append(WORDS[rng.randint(len(WORDS))])
            parts.append(PUNCT[rng.randint(len(PUNCT))])
        texts.append(" ".join(parts))
    texts[0] = ""          # empty doc
    if n > 1:
        texts[1] = "   "   # whitespace-only doc
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# every SQL-gated datapipe entry that reads ONLY the documents table
# (index-backed entries are gated by their own fuzz/oracle suites)
DOC_OPS = [
    "token_count", "regex_features", "top_bigram_frac", "gopher_filter",
    "tfidf_topk_terms", "lang_id", "quality_score", "fingerprint",
    "simhash", "exact_dedup", "minhash_signatures", "near_dup_pairs",
    "ngram_jaccard", "dedup_clusters", "decontaminate", "split_assign",
    "stratified_sample", "top_ngrams", "doclen_quantiles",
    "topk_per_group", "hash_sample", "curated_corpus",
    # session-2 additions
    "pmi_bigrams", "weighted_sample", "unigram_logprob",
    "type_token_ratio", "lang_source_rollup", "poisson_sample",
    # round-4 additions
    "dedup_spans", "rep_ngram_frac", "bpe_token_count",
    "chunk_documents",
]


def _to_df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


@pytest.mark.parametrize("seed", [5, 17])
def test_fuzz_textops_vs_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as entrymod

    d = str(tmp_path)
    _mk_docs(d, seed, 60)
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{d}/documents.parquet'"
    )
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name in DOC_OPS:
        got = _norm(_to_df(qs[name](d)))
        exp = _norm(con.sql(sqls[name]).df())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, rtol=0, atol=0,
                obj=f"{name} seed={seed}",
            )
        except AssertionError as ex:
            failures.append((name, str(ex).splitlines()[0]))
    assert not failures, failures
