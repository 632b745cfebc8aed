"""Randomized engine-vs-DuckDB parity for the per-key window operators
(sessionization, running totals) in BOTH distributed shapes — seeded
random event tables with adversarial shapes: timestamp ties, single-
event users, a hot key owning most of the stream, gaps landing exactly
on the threshold, and range counts that slice sessions mid-stream."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(d: str, seed: int, n: int, n_keys: int, skew_frac: float):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    hour = 3_600_000_000
    # coarse grid so exact-threshold gaps (== 12h) occur organically,
    # plus duplicated timestamps to exercise the event_id tie-break
    ts = base + rng.randint(0, 60 * 24, n).astype(np.int64) * hour
    ts[rng.rand(n) < 0.1] = ts[0]
    keys = rng.randint(0, n_keys, n)
    if skew_frac:
        keys[rng.rand(n) < skew_frac] = 0
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rng.permutation(n).astype(np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(keys, pa.int64()),
                "event_type": pa.array(["t"] * n, pa.string()),
                "value": pa.array(
                    np.round(rng.uniform(0, 100, n), 2), pa.float64()
                ),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


SESS_SQL = """
with o as (
  select user_id, event_id, epoch_us(ts) as tu,
         lag(epoch_us(ts)) over (
           partition by user_id order by ts, event_id
         ) as prev
  from events
)
select user_id, event_id,
  (sum(case when prev is null or tu - prev > 43200000000
            then 1 else 0 end)
     over (partition by user_id order by tu, event_id
           rows between unbounded preceding and current row)
   - 1)::bigint as session_idx
from o
"""

RUN_SQL = """
select user_id, event_id,
  sum(round(value * 100)::bigint) over (
    partition by user_id order by ts, event_id
    rows between unbounded preceding and current row
  )::bigint as running_cents
from events
"""


@pytest.mark.parametrize(
    "seed,n,n_keys,skew,ranges",
    [
        (11, 400, 7, 0.0, 4),
        (23, 600, 3, 0.7, 5),   # hot key owns 70% of the stream
        (37, 300, 1, 1.0, 3),   # ONE key owns everything
        (53, 500, 40, 0.0, 16),
    ],
)
def test_fuzz_window_ops_vs_duckdb(
    ray_session, tmp_path, seed, n, n_keys, skew, ranges
):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_events(d, seed, n, n_keys, skew)
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{d}/events.parquet'"
    )

    def rows(t, cols):
        return sorted(zip(*[t[c].to_pylist() for c in cols]))

    sess_exp = sorted(map(tuple, con.sql(SESS_SQL).fetchall()))
    run_exp = sorted(map(tuple, con.sql(RUN_SQL).fetchall()))
    scols = ["user_id", "event_id", "session_idx"]
    rcols = ["user_id", "event_id", "running_cents"]
    for mode in ("by_key", "by_time"):
        st = dp._to_table(
            dp.sessionize_events(d, mode=mode, time_ranges=ranges)
        )
        assert rows(st, scols) == sess_exp, f"sessionize {mode}"
        rt = dp._to_table(
            dp.running_totals(d, mode=mode, time_ranges=ranges)
        )
        assert rows(rt, rcols) == run_exp, f"running_totals {mode}"
