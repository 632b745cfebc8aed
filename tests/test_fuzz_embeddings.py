"""Randomized engine-vs-DuckDB parity for the embedding ops on hazard
inputs: exact duplicate vectors (cosine ties → tie-break stress), zero
vectors (norm guard), near-duplicates straddling the pair threshold."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_embeddings(d: str, seed: int, n: int, dim: int = 8):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    m[1] = m[0]              # exact duplicate of the query vector
    m[2] = 0.0               # zero vector
    if n > 6:
        m[5] = m[4]          # another duplicate pair (tie in pairs op)
        m[6] = m[4] * 3.0    # same direction, different norm (cos == 1)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in m],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("seed", [3, 29])
def test_fuzz_embedding_ops_vs_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as entrymod

    d = str(tmp_path)
    _mk_embeddings(d, seed, 40)
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{d}/embeddings.parquet'"
    )
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    for name in ["embedding_topk", "embedding_cosine_pairs"]:
        res = qs[name](d)
        got = _norm(
            res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        )
        exp = _norm(con.sql(sqls[name]).df())
        pd.testing.assert_frame_equal(
            got, exp, check_dtype=False, rtol=0, atol=0,
            obj=f"{name} seed={seed}",
        )
