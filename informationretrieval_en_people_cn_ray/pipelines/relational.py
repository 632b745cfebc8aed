"""Relational analytics pipelines over the TPC-H-shaped tables
(``lineitem`` / ``orders`` / ``customer`` / ``nation``) — the classic
scan→join→aggregate workloads a general data-processing engine must
run beside the fulltext/dedup surface, each expressed Ray-Data-first:

- money/discount values are carried as EXACT integers (cents / basis
  points, half-up rounded the way DuckDB's ``round`` does it), so every
  sum is order-independent and each op has a bit-stable ANSI-SQL oracle;
- aggregations pre-combine inside ``map_batches`` (per-batch partial
  sums over the batch's distinct keys) before any shuffle;
- big×big equi-joins hash-BUCKET both sides (``key % N_BUCKETS``) and
  union them into ONE ``groupby(bucket)`` shuffle; inside a bucket the
  join is a vectorized ``searchsorted`` probe into the (unique-keyed)
  build side — never a per-key ``map_groups`` call and never a
  broadcast of an unbounded side;
- tiny dimensions (``nation``, ≤ a few hundred rows) are resolved
  driver-side after the final output-sized aggregate.

Scale notes (100 TB): the bucket count bounds the largest single task
at |input| / N_BUCKETS rows of the densest key range — raise
``N_BUCKETS`` with cluster size (it only changes task granularity, not
results). Integer cent/bp sums stay inside int64 through ~10^18 —
about SF 10 000 for the e6-scaled revenue terms; past that the same
pipelines would carry decimal128 Arrow columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..datactx import unreserved
from .datapipe import _coalesced, _to_table, round4

# Fixed pipeline constants — shared with the SQL oracles in
# __ray_entry__.py (change together or the driver's value-hash breaks).
PRICING_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
Q3_TOPN = 10
Q5_LO = "1997-01-01"
Q5_HI = "1998-01-01"
# Q6-style band filter: [date lo, hi), discount band in basis points
# (inclusive, applied to the half-up-rounded bp value so the predicate
# is integer-exact on both sides), quantity strictly below the cap.
Q6_LO = "1997-01-01"
Q6_HI = "1998-01-01"
Q6_DISC_LO_BP = 300
Q6_DISC_HI_BP = 700
Q6_QTY_LT = 24
# Q12-style: lineitems shipped inside [lo, hi); order priority classes
Q12_LO = "1997-01-01"
Q12_HI = "1998-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")
N_BUCKETS = 64


def _cents(x: np.ndarray) -> np.ndarray:
    """value → integer cents, half-up — matches DuckDB
    ``floor(x*100 + 0.5)::bigint`` bit for bit (inputs are positive)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _bp(x: np.ndarray) -> np.ndarray:
    """rate → integer basis points (×10 000), half-up."""
    return np.floor(x * 10000.0 + 0.5).astype(np.int64)


def _rev_e6(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """extendedprice×(1−discount) as an exact integer in 1e-6 dollars."""
    return _cents(price) * (10000 - _bp(disc))


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


# ---------------------------------------------------------------------------
# Q1-style pricing summary (pure aggregate, no join)


@unreserved
def pricing_summary(sf_dir: str):
    """(l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, avg_qty, avg_price, avg_disc, count_order) — the
    TPC-H Q1 shape: full-scan of ``lineitem`` with a ship-date cutoff,
    grouped by the 6-value (returnflag, linestatus) domain.

    One pruned-column scan; each batch collapses to ≤6 partial rows
    (``np.add.at`` over exact integer cents/bp), so the ``groupby``
    shuffle moves 6 rows per block regardless of input size — the
    partial-aggregate pattern this library uses everywhere."""
    cutoff = _us(PRICING_CUTOFF)

    def partial(batch: pa.Table) -> pa.Table:
        ship = _ts_us(batch["l_shipdate"])
        m = ship <= cutoff
        if not m.any():
            return pa.table(
                {
                    "gk": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "qty_c": pa.array([], pa.int64()),
                    "price_c": pa.array([], pa.int64()),
                    "disc_e6": pa.array([], pa.int64()),
                    "disc_bp": pa.array([], pa.int64()),
                }
            )
        keep = pa.array(m)
        flag = batch["l_returnflag"].filter(keep).to_numpy(zero_copy_only=False)
        stat = batch["l_linestatus"].filter(keep).to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[m]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        gk = np.char.add(
            np.char.add(flag.astype("U4"), "|"), stat.astype("U4")
        )
        uk, inv = np.unique(gk, return_inverse=True)
        pc = _cents(price)  # shared with the revenue term (full-scan hot path)
        bp = _bp(disc)
        cols = {
            "n": np.ones(len(inv), np.int64),
            "qty_c": _cents(qty),
            "price_c": pc,
            "disc_e6": pc * (10000 - bp),
            "disc_bp": bp,
        }
        out: dict[str, pa.Array] = {"gk": pa.array(uk.tolist(), pa.string())}
        for name, vals in cols.items():
            s = np.zeros(len(uk), np.int64)
            np.add.at(s, inv, vals)
            out[name] = pa.array(s, pa.int64())
        return pa.table(out)

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("gk").aggregate(
        Sum("n", alias_name="n"),
        Sum("qty_c", alias_name="qty_c"),
        Sum("price_c", alias_name="price_c"),
        Sum("disc_e6", alias_name="disc_e6"),
        Sum("disc_bp", alias_name="disc_bp"),
    )
    t = _to_table(agg)  # ≤6 rows
    if t.num_rows == 0:
        return pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.float64()),
                "sum_base_price": pa.array([], pa.float64()),
                "sum_disc_price": pa.array([], pa.float64()),
                "avg_qty": pa.array([], pa.float64()),
                "avg_price": pa.array([], pa.float64()),
                "avg_disc": pa.array([], pa.float64()),
                "count_order": pa.array([], pa.int64()),
            }
        )
    gk = t["gk"].to_pylist()
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    qty = t["qty_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    price = t["price_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    de6 = t["disc_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
    dbp = t["disc_bp"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(np.array(gk))
    return pa.table(
        {
            "l_returnflag": pa.array(
                [gk[i].split("|")[0] for i in order], pa.string()
            ),
            "l_linestatus": pa.array(
                [gk[i].split("|")[1] for i in order], pa.string()
            ),
            "sum_qty": pa.array(
                [round4(qty[i] / 100.0) for i in order], pa.float64()
            ),
            "sum_base_price": pa.array(
                [round4(price[i] / 100.0) for i in order], pa.float64()
            ),
            "sum_disc_price": pa.array(
                [round4(de6[i] / 1000000.0) for i in order], pa.float64()
            ),
            "avg_qty": pa.array(
                [round4(qty[i] / (100.0 * n[i])) for i in order], pa.float64()
            ),
            "avg_price": pa.array(
                [round4(price[i] / (100.0 * n[i])) for i in order],
                pa.float64(),
            ),
            "avg_disc": pa.array(
                [round4(dbp[i] / (10000.0 * n[i])) for i in order],
                pa.float64(),
            ),
            "count_order": pa.array([int(n[i]) for i in order], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q6-style: banded filter + single aggregate (predicate pushdown showcase)


@unreserved
def revenue_band_filter(sf_dir: str):
    """(revenue, n_lines) — the TPC-H Q6 shape: Σ extendedprice·discount
    over lineitems in a ship-date band, a discount band and a quantity
    cap. The coarse DATE band is pushed into the parquet scan itself
    (``read_parquet(filter=...)`` → row groups outside the band never
    leave storage); the fine bands evaluate vectorized per batch on the
    half-up integer bp/cent values, so the revenue term
    (cents × basis points = 1e-6 dollars) is order-independent and the
    SQL oracle is bit-identical. Each batch collapses to ONE partial
    row; the final reduce is a driver sum over block partials."""
    import pyarrow.dataset as pads

    lo, hi = _us(Q6_LO), _us(Q6_HI)

    def partial(batch: pa.Table) -> pa.Table:
        ship = _ts_us(batch["l_shipdate"])
        disc_bp = _bp(batch["l_discount"].to_numpy(zero_copy_only=False))
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = (
            (ship >= lo)
            & (ship < hi)
            & (disc_bp >= Q6_DISC_LO_BP)
            & (disc_bp <= Q6_DISC_HI_BP)
            & (qty < Q6_QTY_LT)
        )
        price_c = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        )
        return pa.table(
            {
                "rev_e6": pa.array(
                    [int((price_c * disc_bp[m]).sum())], pa.int64()
                ),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(
            (pads.field("l_shipdate") >= np.datetime64(Q6_LO, "us"))
            & (pads.field("l_shipdate") < np.datetime64(Q6_HI, "us"))
        ),
    ).map_batches(partial, batch_format="pyarrow")
    t = _to_table(ds)  # one row per block
    if t.num_columns == 0 or t.num_rows == 0:  # nothing in the date band
        rev, n = 0, 0
    else:
        rev = int(t["rev_e6"].to_numpy(zero_copy_only=False).sum())
        n = int(t["n"].to_numpy(zero_copy_only=False).sum())
    return pa.table(
        {
            "revenue": pa.array([round4(rev / 1e6)], pa.float64()),
            "n_lines": pa.array([n], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# bucketed big×big join plumbing (shared by Q3/Q5 shapes)

_JOIN_SCHEMA: list[tuple[str, pa.DataType]] = [
    ("bucket", pa.int64()),
    ("key", pa.int64()),
    ("side", pa.int8()),
    ("rev", pa.int64()),
    ("aux", pa.int64()),
    ("tag", pa.string()),
]


def _tagged(key: np.ndarray, side: int, rev=None, aux=None, tag=None):
    """Build one bucket-tagged Arrow block in the shared join schema."""
    n = len(key)
    z = np.zeros(n, np.int64)
    return pa.table(
        {
            "bucket": pa.array(key % N_BUCKETS, pa.int64()),
            "key": pa.array(key, pa.int64()),
            "side": pa.array(np.full(n, side, np.int8), pa.int8()),
            "rev": pa.array(z if rev is None else rev, pa.int64()),
            "aux": pa.array(z if aux is None else aux, pa.int64()),
            "tag": (
                pa.nulls(n, pa.string())
                if tag is None
                else pa.array(tag, pa.string())
            ),
        }
    )


def _empty_join_block() -> pa.Table:
    return pa.table(
        {name: pa.array([], typ) for name, typ in _JOIN_SCHEMA}
    )


def _split_sides(group: pa.Table):
    """(probe, build) halves of one bucket group, build keys sorted
    unique with a searchsorted probe→build row mapping."""
    group = group.combine_chunks()
    side = group["side"].to_numpy(zero_copy_only=False)
    bmask = side == 1
    build = group.filter(pa.array(bmask))
    probe = group.filter(pa.array(~bmask))
    if build.num_rows == 0 or probe.num_rows == 0:
        return None
    bk = build["key"].to_numpy(zero_copy_only=False)
    order = np.argsort(bk, kind="stable")
    bks = bk[order]
    pk = probe["key"].to_numpy(zero_copy_only=False)
    idx = np.searchsorted(bks, pk)
    idx[idx >= bks.size] = bks.size - 1
    hit = bks[idx] == pk
    return probe, build, order, idx, hit


def _orderkey_bloom(sf_dir: str, lo_us: int, hi_us: int):
    """Broadcast Bloom bitmap over the orderkeys of orders placed in
    [lo_us, hi_us) — the join PRE-FILTER for date-windowed order joins.
    A date-filter stage composed with the generic ``_dataset_key_bloom``
    (one copy of the bitmap-accumulate idiom): constant ``BLOOM_BITS``
    broadcast no matter how many orders qualify, false positives only
    admit extra probe rows to the exact bucket join, no false
    negatives."""

    def keys(batch: pa.Table) -> pa.Table:
        odate = _ts_us(batch["o_orderdate"])
        m = (odate >= lo_us) & (odate < hi_us)
        ks = (
            batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )[m]
        return pa.table({"key": pa.array(ks, pa.int64())})

    return _dataset_key_bloom(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        ).map_batches(keys, batch_format="pyarrow"),
        "key",
    )


def _rev_partials(sf_dir: str, ship_after_us: int | None, key_bloom=None):
    """lineitem → bucket-tagged (key=l_orderkey, rev=partial Σ rev_e6)
    probe rows, pre-combined per batch over the batch's distinct order
    keys — the shuffle moves one row per (batch, orderkey).
    ``key_bloom`` (a ``ray.put`` Bloom bitmap from ``_orderkey_bloom``)
    drops probe rows whose order cannot qualify BEFORE they enter the
    shuffle — with a 1-year window that is ~6/7 of the fact side."""
    from .datapipe import _bloom_positions

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rev = _rev_e6(price, disc)
        if ship_after_us is not None:
            m = _ts_us(batch["l_shipdate"]) > ship_after_us
            if not m.any():
                return _empty_join_block()
            okey, rev = okey[m], rev[m]
        if key_bloom is not None and len(okey):
            bm = ray.get(key_bloom)  # local zero-copy after first get
            hit = bm[_bloom_positions(okey)].all(axis=1)
            if not hit.any():
                return _empty_join_block()
            okey, rev = okey[hit], rev[hit]
        uk, inv = np.unique(okey, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return _tagged(uk, side=0, rev=s)

    cols = ["l_orderkey", "l_extendedprice", "l_discount"]
    if ship_after_us is not None:
        cols.append("l_shipdate")
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=cols
    ).map_batches(partial, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q3-style: top revenue orders for one market segment


@unreserved
def top_revenue_orders(sf_dir: str):
    """(o_orderkey, revenue, odate_us, o_orderpriority) — the TPC-H Q3
    shape: orders of ``BUILDING``-segment customers placed before
    ``Q3_DATE``, ranked by the revenue of their lineitems shipped after
    it; top ``Q3_TOPN`` (revenue desc, orderkey asc — exact integer
    revenue, so the order is bit-deterministic).

    Two bucketed shuffles, both output- or input-partition-sized:

    1. semi-join ``orders ⋉ customer[segment]`` bucketed on custkey
       (NOT a broadcast: the segment side is ~1/5 of all customers and
       grows with the data);
    2. revenue partials (lineitem, pre-combined per batch) ⨝ qualified
       orders bucketed on orderkey; each bucket sums probe revenue into
       its unique build rows via one ``np.add.at`` and emits only its
       local top-N, so the driver sees ≤ N_BUCKETS·TOPN rows.
    """
    seg_date = _us(Q3_DATE)

    def cust_rows(batch: pa.Table) -> pa.Table:
        m = (
            batch["c_mktsegment"]
            .to_numpy(zero_copy_only=False)
            .astype("U16")
            == Q3_SEGMENT
        )
        if not m.any():
            return _empty_join_block()
        ck = (
            batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return _tagged(ck[m], side=1)

    def order_rows(batch: pa.Table) -> pa.Table:
        odate = _ts_us(batch["o_orderdate"])
        m = odate < seg_date
        if not m.any():
            return _empty_join_block()
        keep = pa.array(m)
        ck = (
            batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )[m]
        ok = (
            batch["o_orderkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )[m]
        prio = batch["o_orderpriority"].filter(keep).to_pylist()
        return _tagged(ck, side=0, rev=ok, aux=odate[m], tag=prio)

    def semi(group: pa.Table) -> pa.Table:
        """keep probe (order) rows whose custkey exists on the build
        (segment-customer) side; re-tag them bucketed by ORDERKEY as
        the build side of stage 2."""
        split = _split_sides(group)
        if split is None:
            return _empty_join_block()
        probe, _, _, _, hit = split
        kept = probe.filter(pa.array(hit))
        if kept.num_rows == 0:
            return _empty_join_block()
        okey = kept["rev"].to_numpy(zero_copy_only=False)
        return _tagged(
            okey,
            side=1,
            aux=kept["aux"].to_numpy(zero_copy_only=False),
            tag=kept["tag"].to_pylist(),
        )

    def join_topn(group: pa.Table) -> pa.Table:
        """sum probe revenue partials into the unique build orders,
        emit this bucket's top-N (inner join: zero-revenue orders drop)."""
        split = _split_sides(group)
        if split is None:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "rev_e6": pa.array([], pa.int64()),
                    "odate_us": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
        probe, build, order, idx, hit = split
        sums = np.zeros(build.num_rows, np.int64)
        np.add.at(
            sums,
            order[idx[hit]],
            probe["rev"].to_numpy(zero_copy_only=False)[hit],
        )
        nz = np.nonzero(sums)[0]
        keys = build["key"].to_numpy(zero_copy_only=False)[nz]
        top = np.lexsort((keys, -sums[nz]))[:Q3_TOPN]
        sel = nz[top]
        pick = pa.array(sel, pa.int64())
        return pa.table(
            {
                "o_orderkey": build["key"].take(pick),
                "rev_e6": pa.array(sums[sel], pa.int64()),
                "odate_us": build["aux"].take(pick),
                "o_orderpriority": build["tag"].take(pick),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow")
    qualified = (
        _coalesced(orders.union(cust), sf_dir, "orders", expansion=0.5)
        .groupby("bucket")
        .map_groups(semi, batch_format="pyarrow")
    )
    rev = _rev_partials(
        sf_dir,
        ship_after_us=seg_date,
        # open lower bound: 0 (the epoch) would bloom-EXCLUDE pre-1970
        # order dates — a false negative silently dropping their revenue
        key_bloom=_orderkey_bloom(
            sf_dir, int(np.iinfo(np.int64).min), seg_date
        ),
    )
    per_bucket = (
        # revenue partials + qualified-order sliver: coalesce the
        # sliver-block union before the Sort (see _coalesced)
        _coalesced(rev.union(qualified), sf_dir, "orders", expansion=0.5)
        .groupby("bucket")
        .map_groups(join_topn, batch_format="pyarrow")
    )
    t = _to_table(per_bucket)  # ≤ N_BUCKETS·TOPN rows
    if t.num_rows == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
                "odate_us": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
    rev_e6 = t["rev_e6"].to_numpy(zero_copy_only=False)
    keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
    top = np.lexsort((keys, -rev_e6))[:Q3_TOPN]
    pick = pa.array(top.astype(np.int64), pa.int64())
    return pa.table(
        {
            "o_orderkey": t["o_orderkey"].take(pick),
            "revenue": pa.array(
                [round4(float(rev_e6[i]) / 1e6) for i in top], pa.float64()
            ),
            "odate_us": t["odate_us"].take(pick),
            "o_orderpriority": t["o_orderpriority"].take(pick),
        }
    )


# ---------------------------------------------------------------------------
# Q5-style: revenue by customer nation


@unreserved
def revenue_by_nation(sf_dir: str):
    """(n_name, revenue) — the TPC-H Q5 shape: lineitem revenue of
    orders placed in [``Q5_LO``, ``Q5_HI``) rolled up to the ordering
    customer's nation.

    Join chain lineitem→orders→customer→nation as two bucketed
    shuffles plus one tiny final aggregate: revenue partials join
    orders on orderkey (emitting per-bucket partials already combined
    by custkey), those join customer on custkey (emitting per-bucket
    partials combined by nationkey ≤ 25 rows), and the last
    ``groupby(nationkey)`` moves ≤ buckets×25 rows. ``nation`` itself
    (≤ 25 rows) is read driver-side for the name lookup — the one
    genuinely tiny dimension in the chain."""
    lo, hi = _us(Q5_LO), _us(Q5_HI)

    def order_rows(batch: pa.Table) -> pa.Table:
        odate = _ts_us(batch["o_orderdate"])
        m = (odate >= lo) & (odate < hi)
        if not m.any():
            return _empty_join_block()
        ok = (
            batch["o_orderkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )[m]
        ck = (
            batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )[m]
        return _tagged(ok, side=1, aux=ck)

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = (
            batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        nk = (
            batch["c_nationkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return _tagged(ck, side=1, aux=nk)

    def _probe_sum_regroup(group: pa.Table) -> pa.Table:
        """join probe rev onto build rows, re-emit probe-side partials
        keyed (and re-bucketed) by the build row's aux key."""
        split = _split_sides(group)
        if split is None:
            return _empty_join_block()
        probe, build, order, idx, hit = split
        if not hit.any():
            return _empty_join_block()
        aux = build["aux"].to_numpy(zero_copy_only=False)[order[idx[hit]]]
        rev = probe["rev"].to_numpy(zero_copy_only=False)[hit]
        uk, inv = np.unique(aux, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return _tagged(uk, side=0, rev=s)

    rev = _rev_partials(
        sf_dir, ship_after_us=None, key_bloom=_orderkey_bloom(sf_dir, lo, hi)
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    by_cust = (
        _coalesced(rev.union(orders), sf_dir, "orders", expansion=0.5)
        .groupby("bucket")
        .map_groups(_probe_sum_regroup, batch_format="pyarrow")
    )
    by_nation = (
        _coalesced(by_cust.union(cust), sf_dir, "customer", expansion=0.5)
        .groupby("bucket")
        .map_groups(_probe_sum_regroup, batch_format="pyarrow")
    )
    # per-bucket outputs are ≤ 25 nation rows each — the final reduce is
    # a driver-side sum over ≤ N_BUCKETS·25 rows, not a fourth Ray stage
    parts = _to_table(by_nation)
    if parts.num_rows:
        k = parts["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = parts["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, v)
        agg = pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "rev": pa.array(s, pa.int64()),
            }
        )
    else:
        agg = pa.table(
            {"key": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
        )
    if agg.num_rows == 0:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "revenue": pa.array([], pa.float64()),
            }
        )
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(
            nat["n_nationkey"].to_numpy(zero_copy_only=False).tolist(),
            nat["n_name"].to_pylist(),
        )
    )
    nk = agg["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    rev_sum = agg["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nk, -rev_sum))
    return pa.table(
        {
            "n_name": pa.array(
                [names[int(nk[i])] for i in order], pa.string()
            ),
            "revenue": pa.array(
                [round4(float(rev_sum[i]) / 1e6) for i in order],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Q12-style: join + conditional (priority-class) line counts


@unreserved
def priority_line_counts(sf_dir: str):
    """(l_returnflag, high_line_count, low_line_count) — the TPC-H Q12
    shape: lineitems shipped inside [``Q12_LO``, ``Q12_HI``) joined to
    their order's priority, counting urgent/high vs other priorities
    per return flag.

    One bucketed big×big shuffle: lineitem pre-combines per batch to
    (orderkey, returnflag, count) probe partials (the fact side shrinks
    before it moves); orders ships (orderkey, priority-class∈{0,1})
    build rows. Each bucket classifies its matched probe counts with a
    vectorized gather and emits ≤ |flags|·2 partial rows, so the final
    reduce is driver-side over ≤ N_BUCKETS·|flags| rows."""
    lo, hi = _us(Q12_LO), _us(Q12_HI)
    high = set(Q12_HIGH)

    def line_rows(batch: pa.Table) -> pa.Table:
        ship = _ts_us(batch["l_shipdate"])
        m = (ship >= lo) & (ship < hi)
        if not m.any():
            return _empty_join_block()
        keep = pa.array(m)
        ok = (
            batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )[m]
        flag = (
            batch["l_returnflag"]
            .filter(keep)
            .to_numpy(zero_copy_only=False)
            .astype("U4")
        )
        # pre-combine per (orderkey, flag): flags are a ≤4-char domain,
        # so pack them into the key string for one np.unique pass
        gk = np.char.add(np.char.add(flag, "|"), ok.astype("U20"))
        uk, inv, cnt = np.unique(gk, return_inverse=True, return_counts=True)
        uflag = [u.split("|", 1)[0] for u in uk.tolist()]
        uok = np.array(
            [int(u.split("|", 1)[1]) for u in uk.tolist()], np.int64
        )
        return _tagged(uok, side=0, rev=cnt.astype(np.int64), tag=uflag)

    def order_rows(batch: pa.Table) -> pa.Table:
        ok = (
            batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )
        cls = np.fromiter(
            (1 if p in high else 0 for p in batch["o_orderpriority"].to_pylist()),
            np.int64,
            count=len(ok),
        )
        return _tagged(ok, side=1, aux=cls)

    def join_counts(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "high_n": pa.array([], pa.int64()),
                "low_n": pa.array([], pa.int64()),
            }
        )
        split = _split_sides(group)
        if split is None:
            return empty
        probe, build, order, idx, hit = split
        if not hit.any():
            return empty
        cls = build["aux"].to_numpy(zero_copy_only=False)[order[idx[hit]]]
        cnt = probe["rev"].to_numpy(zero_copy_only=False)[hit]
        flag = np.array(probe["tag"].to_pylist(), dtype="U4")[hit]
        uf, inv = np.unique(flag, return_inverse=True)
        hi_s = np.zeros(len(uf), np.int64)
        lo_s = np.zeros(len(uf), np.int64)
        np.add.at(hi_s, inv, cnt * cls)
        np.add.at(lo_s, inv, cnt * (1 - cls))
        return pa.table(
            {
                "l_returnflag": pa.array(uf.tolist(), pa.string()),
                "high_n": pa.array(hi_s, pa.int64()),
                "low_n": pa.array(lo_s, pa.int64()),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(line_rows, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow")
    per_bucket = (
        _coalesced(lines.union(orders), sf_dir, "orders", expansion=0.5)
        .groupby("bucket")
        .map_groups(join_counts, batch_format="pyarrow")
    )
    t = _to_table(per_bucket)  # ≤ N_BUCKETS·|flags| rows
    if t.num_rows == 0:
        return pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "high_line_count": pa.array([], pa.int64()),
                "low_line_count": pa.array([], pa.int64()),
            }
        )
    flag = np.array(t["l_returnflag"].to_pylist(), dtype="U4")
    uf, inv = np.unique(flag, return_inverse=True)
    hi_s = np.zeros(len(uf), np.int64)
    lo_s = np.zeros(len(uf), np.int64)
    np.add.at(hi_s, inv, t["high_n"].to_numpy(zero_copy_only=False))
    np.add.at(lo_s, inv, t["low_n"].to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "l_returnflag": pa.array(uf.tolist(), pa.string()),
            "high_line_count": pa.array(hi_s, pa.int64()),
            "low_line_count": pa.array(lo_s, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q18-style: large-volume orders (groupby-HAVING + two bucketed joins)

Q18_QTY_CENTS = 26_000  # HAVING Σ qty (exact cents) must exceed this


def _dataset_key_bloom(ds, col: str):
    """Constant-size Bloom bitmap over an int64 key column of a (small,
    already-materialized) dataset — the generic form of
    ``_orderkey_bloom``: per-batch partial bitmaps OR driver-side, so
    at 100 TB the broadcast stays ``BLOOM_BITS`` bits no matter how many
    keys qualify. False positives only admit extra probe rows to the
    exact bucket joins downstream; no false negatives."""
    from .datapipe import BLOOM_BITS, _arrow_blocks, _bloom_positions

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS, bool)
        ks = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks):
            bits[_bloom_positions(np.unique(ks)).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()])})

    acc = np.zeros(BLOOM_BITS // 8, np.uint8)
    for t in _arrow_blocks(ds.map_batches(partial, batch_format="pyarrow")):
        if t.num_columns and t.num_rows:
            for b in t["bits"].to_pylist():
                acc |= np.frombuffer(b, np.uint8)
    return ray.put(np.unpackbits(acc).astype(bool))


@unreserved
def big_orders(sf_dir: str):
    """(c_custkey, c_name, o_orderkey, totalprice_cents, sum_qty_cents)
    — the TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``Q18_QTY_CENTS`` (quantity carried as exact integer cents), joined
    back to the order row and its customer.

    Three output- or domain-bounded shuffles, in the module's shared
    bucket-join schema:

    1. lineitem quantity partials pre-combined per batch (one row per
       (batch, orderkey)) → ``groupby(bucket)`` sums each order's total
       and applies HAVING inside the bucket, so only qualifying orders
       (a selectivity-bounded sliver) leave stage 1;
    2. survivors ⨝ ``orders`` bucketed on orderkey (survivors are the
       build side — never a broadcast: the HAVING survivor set grows
       with the data). A CONSTANT-size Bloom bitmap over the survivor
       keys prefilters the orders scan, so the fact side's shuffle
       carries only ~qualifying rows (+ bloom FPs, which the exact
       join drops);
    3. the result re-bucketed on custkey ⨝ ``customer``, with the same
       bloom prefilter built from the (output-sized) stage-2 keys.

    The quantity total rides through the string ``tag`` slot between
    joins (vectorized Arrow int↔string casts, no Python loop)."""

    def qty_rows(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        qc = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(okey, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, qc)
        return _tagged(uk, side=0, rev=s)

    def sum_having(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        key = group["key"].to_numpy(zero_copy_only=False)
        rev = group["rev"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        m = s > Q18_QTY_CENTS
        if not m.any():
            return _empty_join_block()
        return _tagged(uk[m], side=1, rev=s[m])

    def order_rows(batch: pa.Table, key_bloom) -> pa.Table:
        from .datapipe import _bloom_positions

        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bm = ray.get(key_bloom)  # local zero-copy after first get
        hit = bm[_bloom_positions(ok)].all(axis=1) if len(ok) else \
            np.zeros(0, bool)
        if not hit.any():
            return _empty_join_block()
        ck = (
            batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )[hit]
        tp = _cents(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)
        )[hit]
        return _tagged(ok[hit], side=0, rev=ck, aux=tp)

    def join_orders(group: pa.Table) -> pa.Table:
        """orders (probe) ⨝ HAVING survivors (build, unique keys);
        emit hits re-bucketed by CUSTKEY for the customer join."""
        split = _split_sides(group)
        if split is None:
            return _empty_join_block()
        probe, build, order, idx, hit = split
        if not hit.any():
            return _empty_join_block()
        kept = probe.filter(pa.array(hit))
        sum_qty = build["rev"].to_numpy(zero_copy_only=False)[
            order[idx[hit]]
        ]
        ck = kept["rev"].to_numpy(zero_copy_only=False)
        return _tagged(
            ck,
            side=0,
            rev=kept["key"].to_numpy(zero_copy_only=False),  # o_orderkey
            aux=kept["aux"].to_numpy(zero_copy_only=False),  # price cents
            tag=pa.compute.cast(
                pa.array(sum_qty, pa.int64()), pa.string()
            ).to_pylist(),
        )

    def cust_rows(batch: pa.Table, key_bloom) -> pa.Table:
        from .datapipe import _bloom_positions

        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bm = ray.get(key_bloom)  # local zero-copy after first get
        hit = bm[_bloom_positions(ck)].all(axis=1) if len(ck) else \
            np.zeros(0, bool)
        if not hit.any():
            return _empty_join_block()
        names = batch["c_name"].filter(pa.array(hit)).to_pylist()
        return _tagged(ck[hit], side=1, tag=names)

    def join_customer(group: pa.Table) -> pa.Table:
        split = _split_sides(group)
        empty = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "o_orderkey": pa.array([], pa.int64()),
                "totalprice_cents": pa.array([], pa.int64()),
                "sum_qty_cents": pa.array([], pa.int64()),
            }
        )
        if split is None:
            return empty
        probe, build, order, idx, hit = split
        if not hit.any():
            return empty
        kept = probe.filter(pa.array(hit))
        names = build["tag"].take(
            pa.array(order[idx[hit]].astype(np.int64), pa.int64())
        )
        return pa.table(
            {
                "c_custkey": kept["key"],
                "c_name": names,
                "o_orderkey": kept["rev"],
                "totalprice_cents": kept["aux"],
                "sum_qty_cents": pa.compute.cast(kept["tag"], pa.int64()),
            }
        )

    survivors = (
        _coalesced(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_quantity"],
            ).map_batches(qty_rows, batch_format="pyarrow"),
            sf_dir,
            "lineitem",
        )
        .groupby("bucket")
        .map_groups(sum_having, batch_format="pyarrow")
        .materialize()  # selectivity-bounded sliver; feeds bloom + join
    )
    # constant-size bloom over survivor orderkeys: the orders scan
    # drops ~all non-qualifying rows BEFORE the join shuffle (the HAVING
    # selects ~1-2% of orders; FPs fall out in the exact bucket join)
    ok_bloom = _dataset_key_bloom(survivors, "key")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        order_rows, batch_format="pyarrow", fn_args=(ok_bloom,)
    )
    with_orders = (
        # bloom-prefiltered orders + survivor sliver: a few MB in ~70
        # sliver blocks — coalesce before the Sort
        _coalesced(orders.union(survivors), sf_dir, "orders", expansion=0.1)
        .groupby("bucket")
        .map_groups(join_orders, batch_format="pyarrow")
        .materialize()  # output-sized; feeds the custkey bloom + join
    )
    ck_bloom = _dataset_key_bloom(with_orders, "key")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_rows, batch_format="pyarrow", fn_args=(ck_bloom,))
    return (
        _coalesced(with_orders.union(cust), sf_dir, "customer", expansion=0.5)
        .groupby("bucket")
        .map_groups(join_customer, batch_format="pyarrow")
    )
