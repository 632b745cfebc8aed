"""Randomized engine-vs-DuckDB parity for the non-equi join operators
(as-of join, banded range join): seeded random events/orders tables with
adversarial shapes — date ties, events before any order, empty keys,
band-boundary prices — beyond the planted cases in test_datapipe."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_tables(
    d: str,
    seed: int,
    n_events: int,
    n_orders: int,
    n_keys: int,
    skew_frac: float = 0.0,
):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    day = 86_400_000_000
    ev_ts = base + rng.randint(-40 * day, 40 * day, n_events)
    ev_keys = rng.randint(0, n_keys, n_events)
    ord_keys = rng.randint(0, n_keys + 2, n_orders)
    if skew_frac:  # one key owns most of both histories
        ev_keys[rng.rand(n_events) < skew_frac] = 0
        ord_keys[rng.rand(n_orders) < skew_frac] = 0
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events), pa.int64()),
                "ts": pa.array(ev_ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(ev_keys, pa.int64()),
                "event_type": pa.array(["t"] * n_events, pa.string()),
                # values chosen so bands land on bucket boundaries often
                "value": pa.array(
                    np.round(rng.uniform(0, 30, n_events), 1), pa.float64()
                ),
                "props": pa.array(["{}"] * n_events, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    # duplicate (key, date) pairs on purpose to exercise the tie-break
    o_dates = base + rng.randint(-45 * day, 45 * day, n_orders) // day * day
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    rng.permutation(n_orders).astype(np.int64), pa.int64()
                ),
                "o_custkey": pa.array(ord_keys, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders, pa.string()),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(0, 31_000, n_orders), 2), pa.float64()
                ),
                "o_orderdate": pa.array(o_dates, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["x"] * n_orders, pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )


def _con(d: str):
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"create view {t} as select * from '{d}/{t}.parquet'")
    return con


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_fuzz_asof_join_matches_duckdb(ray_session, tmp_path, seed):
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tables(d, seed, n_events=300, n_orders=200, n_keys=12)
    t = dp._to_table(dp.asof_join_events_orders(d))
    got = {
        e: (k, p)
        for e, k, p in zip(
            t["event_id"].to_pylist(),
            t["o_orderkey"].to_pylist(),
            t["o_totalprice"].to_pylist(),
        )
    }
    con = _con(d)
    exp = {
        e: (k, p)
        for e, k, p in con.sql(
            """with pairs as (
                 select e.event_id, o.o_orderkey, o.o_totalprice,
                        row_number() over (
                          partition by e.event_id
                          order by o.o_orderdate desc, o.o_orderkey desc
                        ) as rn
                 from events e
                 join orders o
                   on o.o_custkey = e.user_id and o.o_orderdate <= e.ts)
               select event_id, o_orderkey, o_totalprice
               from pairs where rn = 1"""
        )
        .fetchall()
    }
    assert got == exp


_ASOF_ORACLE = """with pairs as (
     select e.event_id, o.o_orderkey, o.o_totalprice,
            row_number() over (
              partition by e.event_id
              order by o.o_orderdate desc, o.o_orderkey desc
            ) as rn
     from events e
     join orders o
       on o.o_custkey = e.user_id and o.o_orderdate <= e.ts)
   select event_id, o_orderkey, o_totalprice
   from pairs where rn = 1"""


@pytest.mark.parametrize("seed,ranges", [(77, 16), (88, 5), (99, 3)])
def test_fuzz_asof_by_time_skewed_matches_duckdb(
    ray_session, tmp_path, seed, ranges
):
    """Skew-safe as-of variant: ONE key owns ~90% of both histories —
    the time-range partition + boundary-replication path must be exact
    vs DuckDB (and therefore vs the by_key path) at several range
    counts, including ranges so coarse most carries collapse."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tables(
        d, seed, n_events=400, n_orders=250, n_keys=10, skew_frac=0.9
    )
    t = dp._to_table(
        dp.asof_join_events_orders(d, mode="by_time", time_ranges=ranges)
    )
    got = {
        e: (k, p)
        for e, k, p in zip(
            t["event_id"].to_pylist(),
            t["o_orderkey"].to_pylist(),
            t["o_totalprice"].to_pylist(),
        )
    }
    con = _con(d)
    exp = {e: (k, p) for e, k, p in con.sql(_ASOF_ORACLE).fetchall()}
    assert got == exp
    # auto mode picks by_time for this key-starved stream
    t2 = dp._to_table(dp.asof_join_events_orders(d, mode="auto"))
    assert len(t2) == len(t)


@pytest.mark.parametrize("seed,width", [(44, 5000.0), (55, 1000.0), (66, 3172.5)])
def test_fuzz_range_join_matches_duckdb(ray_session, tmp_path, seed, width):
    """Including non-default band widths — bucket-boundary math must be
    exact for any width, not just the driver entry's 5000."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tables(d, seed, n_events=250, n_orders=300, n_keys=10)
    t = dp._to_table(dp.range_join_count(d, width=width))
    got = dict(zip(t["event_id"].to_pylist(), t["n_orders"].to_pylist()))
    con = _con(d)
    exp = dict(
        con.sql(
            f"""select e.event_id, count(*) from events e join orders o
               on o.o_totalprice >= e.value*1000
              and o.o_totalprice < e.value*1000 + {width}
              group by e.event_id"""
        )
        .fetchall()
    )
    assert got == exp
