"""Driver-contract gate rehearsal: run queries() vs oracle_sql() through
DuckDB exactly like the driver does (order-insensitive value compare) for
every SQL-checkable entry, at sf0.001."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


def _to_df(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_all_sql_checked_entries_match(entrymod, con):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert set(sqls) <= set(qs), "oracle_sql keys must be queries() keys"
    mismatches = []
    for name, sql in sqls.items():
        got = _norm(_to_df(qs[name](SF)))
        exp = _norm(con.sql(sql).df())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=False,
                rtol=0, atol=1e-12,
            )
        except AssertionError as e:
            mismatches.append((name, str(e).splitlines()[0]))
    assert not mismatches, mismatches


def test_rows_only_entries_run(entrymod):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    for name in set(qs) - set(sqls):
        res = _to_df(qs[name](SF))
        assert len(res) >= 0, name  # runs, stable schema
        assert len(res.columns) > 0, name


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"query", "rank", "doc_id", "score"} <= set(df.columns)
