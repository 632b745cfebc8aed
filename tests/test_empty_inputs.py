"""Empty-input robustness gate: every oracle-backed pipeline, run over a
schema-correct but ZERO-ROW copy of every table, must either

- match its DuckDB oracle on the empty views (aggregates return their
  SQL-defined empty-input values: 0 counts, NULL sums, ROLLUP's grand-
  total row, empty result sets), or
- raise a clean, intentional ``ValueError`` guard (index builds over an
  empty corpus; the embedding query whose anchor ``vec_id=0`` cannot
  exist) — never a ``KeyError``/``IndexError`` from an empty block's
  zero-field schema.

This pins the empty-partition behavior every operator hits at 100 TB
whenever a filter or a shard comes back empty."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# entries whose guard is the CORRECT empty-input behavior (building a
# search index or anchoring on a specific row cannot proceed on zero
# rows); the guard message must still be the intentional ValueError
GUARDED_SUBSTRINGS = ("empty corpus", "absent from")


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        s = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(s.empty_table(), f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def con(empty_sf):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"create view {t} as select * from '{empty_sf}/{t}.parquet'"
        )
    return c


def _to_df(res):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return dp._to_table(res).to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_every_oracle_entry_on_empty_tables(ray_session, empty_sf, con):
    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    bad = []
    guarded = 0
    for name, sql in sorted(sqls.items()):
        try:
            got = _norm(_to_df(qs[name](empty_sf)))
        except ValueError as e:
            if any(s in str(e) for s in GUARDED_SUBSTRINGS):
                guarded += 1
                continue
            bad.append((name, f"unexpected ValueError: {e}"))
            continue
        except Exception as e:
            bad.append((name, f"{type(e).__name__}: {e}"))
            continue
        exp = _norm(con.sql(sql).df())
        if len(got) == len(exp) == 0:
            continue
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=False,
                rtol=0, atol=1e-12,
            )
        except AssertionError as e:
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
    # the guard set is index-/anchor-backed only; growth means a new op
    # started refusing empty input — check it is intentional
    assert guarded <= 30, f"too many guarded entries: {guarded}"


@pytest.fixture(scope="module")
def one_row_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("one_sf"))
    for t in TABLES:
        tb = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(tb.slice(0, 1), f"{d}/{t}.parquet")
    return d


def test_every_oracle_entry_on_one_row_tables(ray_session, one_row_sf):
    """Single-row tables: the degenerate-but-nonempty case (no pairs, no
    windows beyond one element, sd 0 groups, HAVING selects nothing,
    an incremental split whose first generation is empty, a missing
    anchor row). Same contract as the empty gate: match the oracle or
    raise the clean guard."""
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{one_row_sf}/{t}.parquet'"
        )
    qs, sqls = E.queries(), E.oracle_sql()
    bad = []
    for name, sql in sorted(sqls.items()):
        try:
            got = _norm(_to_df(qs[name](one_row_sf)))
        except ValueError as e:
            if any(s in str(e) for s in GUARDED_SUBSTRINGS):
                continue
            bad.append((name, f"unexpected ValueError: {e}"))
            continue
        except Exception as e:
            bad.append((name, f"{type(e).__name__}: {e}"))
            continue
        exp = _norm(con.sql(sql).df())
        if len(got) == len(exp) == 0:
            continue
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=False,
                rtol=0, atol=1e-12,
            )
        except AssertionError as e:
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
