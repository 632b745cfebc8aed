"""Relational-analytics (pricing_summary / top_revenue_orders /
revenue_by_nation) and per-group-stats operators vs DuckDB on seeded
random tables with adversarial shapes — hot customers, orders with many
lineitems, date-filter boundaries, count ties for the mode argmax,
duplicate values for the quantiles — beyond the fixed testdata that
test_entry.py already gates."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY = 86_400_000_000


def _write_tpch(d: str, seed: int, n_li: int, n_ord: int, n_cust: int,
                hot_frac: float = 0.0):
    rng = np.random.RandomState(seed)
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng.randint(0, 5, n_cust).astype(np.int32), pa.int32()
                ),
                "c_acctbal": pa.array(rng.uniform(0, 9, n_cust)),
                "c_mktsegment": pa.array(
                    [segs[i] for i in rng.randint(0, len(segs), n_cust)]
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    ck = rng.randint(0, n_cust, n_ord)
    if hot_frac:
        ck[rng.rand(n_ord) < hot_frac] = 0  # one customer owns most orders
    odates = base + (rng.randint(0, 2500, n_ord) * DAY)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(ck.astype(np.int64), pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_ord),
                "o_totalprice": pa.array(rng.uniform(1, 9e4, n_ord)),
                "o_orderdate": pa.array(odates, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [
                        [
                            "1-URGENT",
                            "2-HIGH",
                            "3-MEDIUM",
                            "4-NOT SPECIFIED",
                            "5-LOW",
                        ][i]
                        for i in rng.randint(0, 5, n_ord)
                    ]
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    ok = rng.randint(0, n_ord + 2, n_li)  # some keys match no order
    if hot_frac:
        ok[rng.rand(n_li) < hot_frac] = 0  # one order owns many lineitems
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok.astype(np.int64), pa.int64()),
                "l_partkey": pa.array(np.zeros(n_li, np.int64)),
                "l_suppkey": pa.array(np.zeros(n_li, np.int64)),
                "l_linenumber": pa.array(
                    np.ones(n_li, np.int32), pa.int32()
                ),
                "l_quantity": pa.array(
                    rng.randint(1, 51, n_li).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 95_000, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.uniform(0, 0.1, n_li), 2)
                ),
                "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
                "l_returnflag": pa.array(
                    [["A", "N", "R"][i] for i in rng.randint(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    [["F", "O"][i] for i in rng.randint(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(
                    base + rng.randint(0, 2500, n_li) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(
                    np.arange(5, dtype=np.int32), pa.int32()
                ),
                "n_name": pa.array([f"NATION_{i}" for i in range(5)]),
                "n_regionkey": pa.array(
                    np.zeros(5, np.int32), pa.int32()
                ),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )


def _con(d: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"create view {t} as select * from '{d}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _check(got, sql, con):
    exp = con.sql(sql).df()
    pd.testing.assert_frame_equal(
        _norm(got.to_pandas() if isinstance(got, pa.Table) else got.to_pandas()),
        _norm(exp),
        check_dtype=False,
        check_exact=False,
        rtol=0,
        atol=1e-12,
    )


@pytest.mark.parametrize("seed,hot", [(5, 0.0), (17, 0.6)])
def test_fuzz_relational_matches_duckdb(ray_session, tmp_path, seed, hot):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import relational

    d = str(tmp_path)
    _write_tpch(d, seed, n_li=4000, n_ord=900, n_cust=120, hot_frac=hot)
    con = _con(d, ["customer", "orders", "lineitem", "nation"])
    sqls = E.oracle_sql()
    _check(relational.pricing_summary(d), sqls["pricing_summary"], con)
    _check(
        relational.top_revenue_orders(d), sqls["top_revenue_orders"], con
    )
    _check(relational.revenue_by_nation(d), sqls["revenue_by_nation"], con)
    _check(
        relational.revenue_band_filter(d), sqls["revenue_band_filter"], con
    )
    _check(
        relational.priority_line_counts(d),
        sqls["priority_line_counts"],
        con,
    )


def test_relational_empty_filters(ray_session, tmp_path):
    """date cutoffs that exclude everything → empty results with the
    full output schema (the empty-aggregate guard paths)."""
    from informationretrieval_en_people_cn_ray.pipelines import relational

    d = str(tmp_path)
    rng_seed = 3
    _write_tpch(d, rng_seed, n_li=50, n_ord=20, n_cust=8)
    # rewrite lineitem with ship dates entirely AFTER the Q1 cutoff and
    # orders entirely AFTER the Q5 window
    t = pq.read_table(os.path.join(d, "lineitem.parquet"))
    late = np.full(
        t.num_rows, np.datetime64("2005-01-01", "us").astype(np.int64)
    )
    t = t.set_column(
        t.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        pa.array(late, pa.int64()).cast(pa.timestamp("us")),
    )
    pq.write_table(t, os.path.join(d, "lineitem.parquet"))
    got = relational.pricing_summary(d)
    assert got.num_rows == 0
    assert "sum_disc_price" in got.schema.names
    o = pq.read_table(os.path.join(d, "orders.parquet"))
    o = o.set_column(
        o.schema.get_field_index("o_orderdate"),
        "o_orderdate",
        pa.array(late[: o.num_rows], pa.int64()).cast(pa.timestamp("us")),
    )
    pq.write_table(o, os.path.join(d, "orders.parquet"))
    nat = relational.revenue_by_nation(d)
    assert nat.num_rows == 0 and nat.schema.names == ["n_name", "revenue"]
    top = relational.top_revenue_orders(d)
    assert top.num_rows == 0


def _write_events(d: str, seed: int, n: int, n_users: int, n_types: int):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    types = [f"t{chr(97 + i)}" for i in range(n_types)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + rng.randint(0, 90 * DAY, n), pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(
                    rng.randint(0, n_users, n).astype(np.int64), pa.int64()
                ),
                "event_type": pa.array(
                    [types[i] for i in rng.randint(0, n_types, n)]
                ),
                # coarse grid → duplicate values exercise quantile ties
                "value": pa.array(
                    np.round(rng.uniform(0, 20, n) * 4) / 4, pa.float64()
                ),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


@pytest.mark.parametrize("seed", [2, 9])
def test_fuzz_mode_and_quantiles_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    # few users × few types → tied (user, type) counts are common, so
    # the lexicographic mode tie-break is genuinely exercised
    _write_events(d, seed, n=3000, n_users=40, n_types=4)
    con = _con(d, ["events"])
    sqls = E.oracle_sql()
    _check(
        dp._to_table(dp.mode_event_type(d)), sqls["mode_event_type"], con
    )
    _check(
        dp._to_table(dp.group_quantiles(d)), sqls["group_quantiles"], con
    )


def test_mode_tie_break_planted(ray_session, tmp_path):
    """user 1: {b:2, a:2} → mode 'a' (count tie, lexicographic);
    user 2: {b:2, a:1} → mode 'b' (strict majority)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    users = [1, 1, 1, 1, 2, 2, 2]
    types = ["b", "b", "a", "a", "b", "b", "a"]
    n = len(users)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + np.arange(n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    t = dp._to_table(dp.mode_event_type(d)).to_pandas()
    t = t.set_index("user_id")
    assert t.loc[1, "mode_type"] == "a" and t.loc[1, "n_events"] == 2
    assert t.loc[2, "mode_type"] == "b" and t.loc[2, "n_events"] == 2


def test_char_entropy_matches_naive_counter(ray_session, tmp_path):
    """vectorized UTF-32 bincount path == per-doc Counter math on
    unicode (multi-byte, repeated, single-char, empty) texts."""
    import math
    from collections import Counter

    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    texts = [
        "aab",
        "",  # empty → 0.0 (DuckDB splits '' into [''], entropy 0)
        "zzzz",  # single symbol → 0.0
        "Straße und Öl — ﬁn",  # multi-byte codepoints
        "ab" * 500,
        "日本語テキスト日本語",
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = dp._to_table(dp.char_entropy(d)).to_pandas().set_index("doc_id")
    for i, txt in enumerate(texts):
        c = Counter(txt)
        n = len(txt)
        exp = -sum(v / n * math.log2(v / n) for v in c.values()) if n else 0.0
        assert abs(got.loc[i, "h"] - dp.round4(exp)) < 1e-9, (i, txt)


def test_pii_scrub_planted(ray_session, tmp_path):
    """hand-planted PII texts: counts and the sequentially-scrubbed
    output match hand expectations AND the generated DuckDB oracle."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    texts = [
        "contact bob.smith+x@mail-host.example.org today",
        "server at 10.0.255.3 rebooted; backup 192.168.1.1 idle",
        "call +1 555-867-5309 or 020 7946 0958 now",
        "mixed: a@b.co from 8.8.8.8 dial 555 123 4567",
        "no pii here, just text with dots. and digits 12",
        "",
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = dp._to_table(dp.pii_scrub(d)).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_email"] == 1 and got.loc[0, "n_ip"] == 0
    assert "<EMAIL>" in got.loc[0, "text_scrubbed"]
    assert "@" not in got.loc[0, "text_scrubbed"]
    assert got.loc[1, "n_ip"] == 2
    assert got.loc[1, "text_scrubbed"].count("<IP>") == 2
    # '+1 555-867-5309': pattern anchors on the 3-3-4 digit tail;
    # '020 7946 0958' is 3-4-4 → not matched (documented pattern scope)
    assert got.loc[2, "n_phone"] == 1
    assert "<PHONE>" in got.loc[2, "text_scrubbed"]
    assert (
        got.loc[3, "n_email"],
        got.loc[3, "n_ip"],
        got.loc[3, "n_phone"],
    ) == (1, 1, 1)
    assert got.loc[4, "n_email"] == 0 and got.loc[4, "n_ip"] == 0
    assert got.loc[4, "text_scrubbed"] == texts[4]
    assert got.loc[5, "text_scrubbed"] == ""
    con = _con(d, ["documents"])
    _check(dp._to_table(dp.pii_scrub(d)), E.oracle_sql()["pii_scrub"], con)


def test_revenue_band_filter_boundaries(ray_session, tmp_path):
    """rows planted exactly ON each band edge: date lo inclusive / hi
    exclusive, discount bp band inclusive both ends, quantity strictly
    below the cap."""
    from informationretrieval_en_people_cn_ray.pipelines import relational

    d = str(tmp_path)
    rows = [
        # (shipdate, discount, quantity, price, expected_in)
        ("1997-01-01", 0.05, 10.0, 1000.0, True),   # lo edge in
        ("1997-12-31", 0.05, 10.0, 1000.0, True),   # last day in
        ("1998-01-01", 0.05, 10.0, 1000.0, False),  # hi edge out
        ("1997-06-01", 0.03, 10.0, 1000.0, True),   # disc lo edge in
        ("1997-06-01", 0.07, 10.0, 1000.0, True),   # disc hi edge in
        ("1997-06-01", 0.02, 10.0, 1000.0, False),  # below band
        ("1997-06-01", 0.08, 10.0, 1000.0, False),  # above band
        ("1997-06-01", 0.05, 23.0, 1000.0, True),   # qty below cap
        ("1997-06-01", 0.05, 24.0, 1000.0, False),  # qty at cap out
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n), pa.int64()),
                "l_partkey": pa.array(np.zeros(n, np.int64)),
                "l_suppkey": pa.array(np.zeros(n, np.int64)),
                "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
                "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
                "l_extendedprice": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
                "l_discount": pa.array([r[1] for r in rows], pa.float64()),
                "l_tax": pa.array(np.zeros(n), pa.float64()),
                "l_returnflag": pa.array(["A"] * n),
                "l_linestatus": pa.array(["F"] * n),
                "l_shipdate": pa.array(
                    [
                        np.datetime64(r[0], "us").astype(np.int64)
                        for r in rows
                    ],
                    pa.int64(),
                ).cast(pa.timestamp("us")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    got = relational.revenue_band_filter(d)
    n_in = sum(r[4] for r in rows)
    assert got["n_lines"][0].as_py() == n_in
    exp = sum(
        round(r[3] * 100) * round(r[1] * 10000) / 1e6
        for r in rows
        if r[4]
    )
    assert abs(got["revenue"][0].as_py() - round(exp, 4)) < 1e-9


def test_zscore_outliers_planted_and_fuzz(ray_session, tmp_path):
    """type 'a': 9 values at 10.0 and one at 100.0 — the spike is the
    only |z| >= 2.5 row (z = (100-19)/27 = 3.0); type 'b' constant →
    sd 0, no rows (division guarded). Then DuckDB parity on a seeded
    random table."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path / "planted")
    os.makedirs(d)
    vals = [10.0] * 9 + [100.0] + [5.0] * 6
    types = ["a"] * 10 + ["b"] * 6
    n = len(vals)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + np.arange(n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = dp._to_table(dp.value_zscore_outliers(d)).to_pandas()
    assert got["event_id"].tolist() == [9]
    assert abs(got["z"][0] - 3.0) < 1e-9
    d2 = str(tmp_path / "fuzz")
    os.makedirs(d2)
    _write_events(d2, seed=11, n=4000, n_users=50, n_types=3)
    con = _con(d2, ["events"])
    _check(
        dp._to_table(dp.value_zscore_outliers(d2)),
        E.oracle_sql()["value_zscore_outliers"],
        con,
    )


def _write_events_coarse(d: str, seed: int, n: int, n_users: int,
                         n_types: int, n_days: int = 12):
    """Events on a coarse day grid — duplicate (user, ts) pairs are
    common, so ordered-window tie-breaks on event_id are genuinely
    exercised."""
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    types = [f"t{chr(97 + i)}" for i in range(n_types)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + rng.randint(0, n_days, n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(
                    rng.randint(0, n_users, n).astype(np.int64), pa.int64()
                ),
                "event_type": pa.array(
                    [types[i] for i in rng.randint(0, n_types, n)]
                ),
                "value": pa.array(rng.uniform(-5, 20, n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def test_pagerank_planted_cycle_and_fuzz(ray_session, tmp_path):
    """Orders with custkeys [1,2,3,1] on consecutive orderkeys plant the
    3-cycle 1→2→3→1: every node has out-degree 1 and receives exactly
    one full contribution, so the closed-form integer iteration is
    checkable by hand; then DuckDB parity on a seeded skewed table."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path / "cycle")
    os.makedirs(d)
    ck = np.array([1, 2, 3, 1], np.int64)
    n = len(ck)
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.ones(n), pa.float64()),
                "o_orderdate": pa.array(
                    base + np.arange(n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    got = dp._to_table(dp.pagerank(d)).to_pandas().sort_values("node")
    r = dp.PR_SCALE // 3
    pr_base = ((dp.PR_SCALE // 3) * 15) // 100
    for _ in range(dp.PR_ITERS):
        r = pr_base + (r * 85) // 100  # one in-edge carrying full rank
    assert got["node"].tolist() == [1, 2, 3]
    assert got["rank_fp"].tolist() == [r, r, r]

    d2 = str(tmp_path / "fuzz")
    os.makedirs(d2)
    # hot_frac puts one customer on most orders → self-loops dropped,
    # heavy multiplicities kept, skewed in-degree exercised
    _write_tpch(d2, seed=23, n_li=100, n_ord=1200, n_cust=60,
                hot_frac=0.3)
    con = _con(d2, ["orders"])
    _check(
        dp._to_table(dp.pagerank(d2)), E.oracle_sql()["pagerank"], con
    )


@pytest.mark.parametrize("seed", [3, 31])
def test_first_event_and_moving_avg_match_duckdb(ray_session, tmp_path,
                                                 seed):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_events_coarse(d, seed, n=4000, n_users=35, n_types=4)
    con = _con(d, ["events"])
    sqls = E.oracle_sql()
    _check(
        dp._to_table(dp.first_event_per_user_type(d)),
        sqls["first_event_per_user_type"],
        con,
    )
    _check(
        dp._to_table(dp.user_moving_avg(d)), sqls["user_moving_avg"], con
    )


def test_moving_avg_short_user_window(ray_session, tmp_path):
    """A user with fewer events than the window width: every prefix
    count is used as the divisor (win_n ramps 1..n)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    vals = [1.0, 2.0, 6.0]
    n = len(vals)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + np.arange(n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "event_type": pa.array(["ta"] * n),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = (
        dp._to_table(dp.user_moving_avg(d))
        .to_pandas()
        .sort_values("event_id")
    )
    assert got["win_n"].tolist() == [1, 2, 3]
    assert got["mavg"].tolist() == [1.0, 1.5, 3.0]


@pytest.mark.parametrize("seed,hot", [(7, 0.0), (41, 0.5)])
def test_big_orders_matches_duckdb(ray_session, tmp_path, seed, hot):
    """Q18 shape vs DuckDB; the hot leg concentrates lineitems on one
    order so the HAVING survivor carries a huge quantity sum."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import relational

    d = str(tmp_path)
    _write_tpch(d, seed, n_li=6000, n_ord=400, n_cust=80, hot_frac=hot)
    con = _con(d, ["customer", "orders", "lineitem"])
    got = relational.big_orders(d)
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp
    t = dp._to_table(got)
    assert t.num_rows > 0  # threshold must actually select something
    _check(t, E.oracle_sql()["big_orders"], con)


def _write_orders_custseq(d: str, ck):
    """Orders table with the given custkey sequence on consecutive
    orderkeys — plants an exact consecutive-order graph."""
    ck = np.asarray(ck, np.int64)
    n = len(ck)
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.ones(n), pa.float64()),
                "o_orderdate": pa.array(
                    base + np.arange(n) * DAY, pa.int64()
                ).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )


def test_triangle_count_planted_and_fuzz(ray_session, tmp_path):
    """custkeys [1,2,3,1,3,2,4] give canonical edges {1-2, 2-3, 1-3,
    2-4} (duplicates collapsed) — exactly ONE triangle (1,2,3); then
    DuckDB parity on a seeded table."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path / "planted")
    os.makedirs(d)
    _write_orders_custseq(d, [1, 2, 3, 1, 3, 2, 4])
    got = dp._to_table(dp.triangle_count(d))
    assert got["n_triangles"].to_pylist() == [1]

    d2 = str(tmp_path / "fuzz")
    os.makedirs(d2)
    _write_tpch(d2, seed=29, n_li=100, n_ord=900, n_cust=40, hot_frac=0.2)
    con = _con(d2, ["orders"])
    _check(
        dp._to_table(dp.triangle_count(d2)),
        E.oracle_sql()["triangle_count"],
        con,
    )


def test_triangle_count_hot_hub_wedge_bound(ray_session, tmp_path):
    """Degree-ordering skew gate: a 100-spoke star must emit ZERO
    wedges (the hub has no out-edges under the (degree, id) rank; each
    spoke has one), and closing two spokes into a triangle adds exactly
    ONE wedge — the naive smallest-vertex wedge algorithm would emit
    O(d²)≈4950 at the hub."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    hub, spokes = 1000, np.arange(100)
    star = []
    for s in spokes:
        star += [hub, int(s)]

    d = str(tmp_path / "star")
    os.makedirs(d)
    _write_orders_custseq(d, star)
    got = dp._to_table(dp.triangle_count(d, with_wedges=True))
    assert got["n_triangles"].to_pylist() == [0]
    assert got["n_wedges"].to_pylist() == [0]

    d2 = str(tmp_path / "star_tri")
    os.makedirs(d2)
    # close spokes 3-7 (route back through the hub so the only NEW
    # consecutive-custkey edge is 3-7)
    _write_orders_custseq(d2, star + [hub, 3, 7])
    got = dp._to_table(dp.triangle_count(d2, with_wedges=True))
    assert got["n_triangles"].to_pylist() == [1]
    assert got["n_wedges"].to_pylist() == [1]


def _write_funnel_events(d: str, seed: int, n: int, n_users: int):
    """Events over the funnel's real type names plus a decoy type, on a
    coarse hour grid so strict-after ordering ties are exercised."""
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    types = ["view", "click", "purchase", "error"]
    HOUR = 3_600_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    base + rng.randint(0, 24 * 60, n) * HOUR, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(
                    rng.randint(0, n_users, n).astype(np.int64), pa.int64()
                ),
                "event_type": pa.array(
                    [types[i] for i in rng.randint(0, len(types), n)]
                ),
                "value": pa.array(rng.uniform(0, 5, n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def test_funnel_planted_order_matters(ray_session, tmp_path):
    """user 0: view→click→purchase in order (completes all 3);
    user 1: click BEFORE its only view (stops after step 1 — the click
    does not count); user 2: view and click at the SAME microsecond
    (strict 'after' ⇒ stops after step 1)."""
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    rows = [  # (user, type, hour-offset)
        (0, "view", 0), (0, "click", 1), (0, "purchase", 2),
        (1, "click", 0), (1, "view", 1), (1, "purchase", 2),
        (2, "view", 3), (2, "click", 3),
    ]
    HOUR = 3_600_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(rows)), pa.int64()),
                "ts": pa.array(
                    [base + h * HOUR for _, _, h in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, t, _ in rows]),
                "value": pa.array(np.zeros(len(rows)), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = (
        dp._to_table(dp.funnel_counts(d)).to_pandas().sort_values("step")
    )
    # user 1 completes step 2 via its later view? No: step 1 t1=hour1
    # (the view), step 2 needs a click AFTER hour1 — none. user 2's
    # click is simultaneous with its view — strict after ⇒ no step 2.
    assert got["n_users"].tolist() == [3, 1, 1]


@pytest.mark.parametrize("seed", [13, 37])
def test_funnel_and_cohort_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    # sparse: many users see only part of the funnel
    _write_funnel_events(d, seed, n=600, n_users=150)
    con = _con(d, ["events"])
    sqls = E.oracle_sql()
    _check(
        dp._to_table(dp.funnel_counts(d)), sqls["funnel_counts"], con
    )
    _check(
        dp._to_table(dp.cohort_retention(d)),
        sqls["cohort_retention"],
        con,
    )


def test_cohort_retention_multi_week(ray_session, tmp_path):
    """Events spanning 10 weeks with users joining late → several
    cohorts; DuckDB parity on the full matrix."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    rng = np.random.RandomState(19)
    n, n_users = 3000, 60
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    # user u's events start at week u % 6 — staggered cohorts
    uid = rng.randint(0, n_users, n).astype(np.int64)
    start_w = uid % 6
    w = start_w + rng.randint(0, 5, n)
    ts = base + w * (7 * DAY) + rng.randint(0, 7 * DAY, n)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    con = _con(d, ["events"])
    got = dp._to_table(dp.cohort_retention(d))
    assert got.to_pandas()["cohort_week"].nunique() >= 5
    _check(got, E.oracle_sql()["cohort_retention"], con)


def _write_documents(d: str, seed: int, n: int):
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n):
        k = rng.randint(0, 12)
        texts.append(" ".join(f"w{rng.randint(0, 50)}" for _ in range(k)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                # coarse grid → heavy length ties exercise the offsets
                "n_chars": pa.array(
                    (rng.randint(0, 15, n) * 10).astype(np.int64), pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def test_doc_rank_by_length_matches_duckdb(ray_session, tmp_path):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_documents(d, seed=3, n=2500)
    con = _con(d, ["documents"])
    got = dp._to_table(dp.doc_rank_by_length(d))
    # ranks are a permutation of 1..n
    rnk = sorted(got["rnk"].to_pylist())
    assert rnk == list(range(1, 2501))
    _check(got, E.oracle_sql()["doc_rank_by_length"], con)


@pytest.mark.parametrize("seed", [6, 28])
def test_winsorize_matches_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    # coarse value grid → quantiles often land ON data points
    _write_events(d, seed, n=3000, n_users=30, n_types=4)
    con = _con(d, ["events"])
    got = dp._to_table(dp.winsorize_values(d))
    _check(got, E.oracle_sql()["winsorize_values"], con)


def test_normalize_text_planted_and_parity(ray_session, tmp_path):
    """NFD é composes to NFC; tab/newline runs collapse; leading and
    trailing ASCII space trims; NBSP is NOT \\s and survives."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    texts = [
        "cafe\u0301  au\tlait",  # NFD e + combining acute, space run, tab
        "  hello\n\nworld  ",    # outer spaces, newline run
        "a\u00a0b",               # NBSP survives (not ASCII \\s)
        "",                        # empty stays empty
        "plain",
    ]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = (
        dp._to_table(dp.normalize_text(d)).to_pandas().sort_values("doc_id")
    )
    assert got["text_norm"].tolist() == [
        "caf\u00e9 au lait",
        "hello world",
        "a\u00a0b",
        "",
        "plain",
    ]
    con = _con(d, ["documents"])
    _check(
        dp._to_table(dp.normalize_text(d)),
        E.oracle_sql()["normalize_text"],
        con,
    )


def test_data_audit_dirty_table(ray_session, tmp_path):
    """Nulls, empty strings, and duplicate keys planted; DuckDB parity
    on the full audit row."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    rng = np.random.RandomState(8)
    n = 2000
    did = rng.randint(0, 1500, n).astype(np.int64)  # dups guaranteed
    texts = []
    for i in range(n):
        r = rng.rand()
        texts.append(None if r < 0.05 else ("" if r < 0.12 else f"t{i}"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    con = _con(d, ["documents"])
    got = dp._to_table(dp.data_audit(d))
    assert got["n_dup_doc_id"][0].as_py() > 0
    assert got["n_null_text"][0].as_py() > 0
    _check(got, E.oracle_sql()["data_audit"], con)


def test_value_time_corr_planted_and_fuzz(ray_session, tmp_path):
    """type 'a' rises linearly with time (corr ≈ 1), type 'b' falls
    (corr ≈ −1), type 'c' is constant (zero variance → excluded);
    then DuckDB parity on a seeded table."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path / "planted")
    os.makedirs(d)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    HOUR = 3_600_000_000
    rows = []
    for i in range(20):
        rows.append(("a", i * HOUR, 1.0 + i))
        rows.append(("b", i * HOUR, 100.0 - i))
        rows.append(("c", i * HOUR, 5.0))
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    [base + r[1] for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "event_type": pa.array([r[0] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = (
        dp._to_table(dp.value_time_corr(d))
        .to_pandas()
        .set_index("event_type")["corr"]
    )
    assert abs(got["a"] - 1.0) < 1e-9
    assert abs(got["b"] + 1.0) < 1e-9
    assert "c" not in got.index  # zero variance excluded

    d2 = str(tmp_path / "fuzz")
    os.makedirs(d2)
    _write_events(d2, seed=14, n=4000, n_users=40, n_types=4)
    con = _con(d2, ["events"])
    _check(
        dp._to_table(dp.value_time_corr(d2)),
        E.oracle_sql()["value_time_corr"],
        con,
    )


@pytest.mark.parametrize("n", [2497, 2500, 7])
def test_doc_ntile_matches_duckdb(ray_session, tmp_path, n):
    """NTILE bucket-size rule (first n%k tiles one bigger) at n%k != 0,
    n%k == 0, and n < k."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_documents(d, seed=int(n), n=n)
    con = _con(d, ["documents"])
    got = dp._to_table(dp.doc_ntile_by_length(d))
    sizes = got.to_pandas().groupby("tile").size()
    assert sizes.max() - sizes.min() <= 1
    _check(got, E.oracle_sql()["doc_ntile_by_length"], con)


@pytest.mark.parametrize("seed,hot", [(4, 0.0), (44, 0.7)])
def test_orders_histogram_matches_duckdb(ray_session, tmp_path, seed, hot):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tpch(d, seed, n_li=50, n_ord=1500, n_cust=200, hot_frac=hot)
    con = _con(d, ["orders"])
    _check(
        dp._to_table(dp.orders_per_customer_histogram(d)),
        E.oracle_sql()["orders_per_customer_histogram"],
        con,
    )


@pytest.mark.parametrize("seed", [21, 42])
def test_lead_gap_and_heatmap_match_duckdb(ray_session, tmp_path, seed):
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_events_coarse(d, seed, n=3000, n_users=25, n_types=3)  # ts ties
    con = _con(d, ["events"])
    sqls = E.oracle_sql()
    _check(dp._to_table(dp.lead_event_gap(d)), sqls["lead_event_gap"], con)
    _check(dp._to_table(dp.dow_hour_heatmap(d)), sqls["dow_hour_heatmap"], con)


@pytest.mark.parametrize("seed", [18, 52])
def test_transition_matrix_matches_duckdb(ray_session, tmp_path, seed):
    """Tie-heavy event streams (coarse day grid): the (ts, event_id)
    ordering must match the window oracle exactly."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_events_coarse(d, seed, n=2500, n_users=20, n_types=4)
    con = _con(d, ["events"])
    got = dp._to_table(dp.event_transition_matrix(d))
    # conservation: transitions = events − users-with-events
    n_ev = con.sql("select count(*) from events").fetchone()[0]
    n_us = con.sql("select count(distinct user_id) from events").fetchone()[0]
    assert sum(got["n"].to_pylist()) == n_ev - n_us
    _check(got, E.oracle_sql()["event_transition_matrix"], con)


@pytest.mark.parametrize("seed,hot", [(63, 0.0), (74, 0.5)])
def test_asof_forward_first_shipment(ray_session, tmp_path, seed, hot):
    """Forward as-of: each order's earliest at-or-after shipment, min
    l_linenumber tie-break (duplicate ship dates occur by construction;
    the hot leg piles lineitems onto one order)."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tpch(d, seed, n_li=3000, n_ord=400, n_cust=60, hot_frac=hot)
    con = _con(d, ["orders", "lineitem"])
    got = dp._to_table(dp.asof_join_forward(d))
    assert got.num_rows > 0
    _check(got, E.oracle_sql()["asof_join_forward"], con)


@pytest.mark.parametrize("seed,hot,ranges", [(63, 0.0, 4), (74, 0.9, 7)])
def test_asof_forward_by_time_parity(ray_session, tmp_path, seed, hot, ranges):
    """Skew-safe forward as-of (time-range partition + reverse carry)
    must equal the by_key answer row-for-row — the hot leg piles 90% of
    lineitems onto one order so its history genuinely splits across
    ranges and the carry-in path is exercised."""
    import __ray_entry__ as E
    from informationretrieval_en_people_cn_ray.pipelines import datapipe as dp

    d = str(tmp_path)
    _write_tpch(d, seed, n_li=3000, n_ord=400, n_cust=60, hot_frac=hot)
    con = _con(d, ["orders", "lineitem"])
    got = dp._to_table(
        dp.asof_join_forward(d, mode="by_time", time_ranges=ranges)
    )
    assert got.num_rows > 0
    _check(got, E.oracle_sql()["asof_join_forward"], con)
    ref = dp._to_table(dp.asof_join_forward(d)).sort_by(
        [("o_orderkey", "ascending")]
    )
    assert got.sort_by([("o_orderkey", "ascending")]).equals(ref)
