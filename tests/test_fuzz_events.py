"""Randomized engine-vs-DuckDB parity for the events-table aggregate /
join entries on hazard inputs: NEGATIVE values (floor vs truncate
divergence risk), window-boundary timestamps, users with no customer
row and customers with no events, duplicate timestamps."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EVENT_ENTRIES = [
    "events_window", "events_sliding_window", "distinct_users",
    "event_type_pivot", "json_props_stats", "sessionize",
    "sessionize_by_time", "running_totals", "running_totals_by_time",
    "broadcast_join", "semi_join", "anti_join",
]

TYPES = ["click", "error", "purchase", "signup", "view"]


def _mk(d: str, seed: int, n: int):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    hour = 3_600_000_000
    ts = base + rng.randint(0, 72, n).astype(np.int64) * hour
    ts[rng.rand(n) < 0.2] += rng.randint(0, 3)      # off-boundary µs
    ts[rng.rand(n) < 0.15] = ts[0]                  # duplicate stamps
    vals = np.round(rng.uniform(-50, 50, n), 2)     # NEGATIVE values
    vals[0] = 0.0
    users = rng.randint(0, 12, n)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rng.permutation(n).astype(np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(
                    [TYPES[i] for i in rng.randint(0, 5, n)], pa.string()
                ),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(
                    ['{"k": %d}' % k for k in rng.randint(-9, 10, n)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    # customers 0..7 only: users 8..11 have no dimension row, customers
    # with keys above the user range have no events
    ck = np.arange(8, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    np.concatenate([ck, [100, 101]]), pa.int64()
                ),
                "c_name": pa.array(["c"] * 10, pa.string()),
                "c_nationkey": pa.array(np.zeros(10, np.int64)),
                "c_acctbal": pa.array(
                    np.round(np.linspace(-99.995, 99.995, 10), 3),
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(["M", "N"] * 5, pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("seed", [7, 41])
def test_fuzz_event_entries_vs_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as entrymod

    d = str(tmp_path)
    _mk(d, seed, 500)
    con = duckdb.connect()
    for t in ["events", "customer"]:
        con.execute(f"create view {t} as select * from '{d}/{t}.parquet'")
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name in EVENT_ENTRIES:
        res = qs[name](d)
        got = _norm(
            res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        )
        exp = _norm(con.sql(sqls[name]).df())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, rtol=0, atol=0,
                obj=f"{name} seed={seed}",
            )
        except AssertionError as ex:
            failures.append((name, str(ex).splitlines()[0]))
    assert not failures, failures
