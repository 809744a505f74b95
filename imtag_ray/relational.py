"""Relational demonstrations of the engine's aggregate/join machinery
over the driver's TPC-H-ish tables (SURVEY.md §2.5 'algebraic partial
aggregates' — per-batch partial aggregation before the small groupby,
mirroring the reference's closed-form per-run aggregation,
include/imtag_statistics.hpp:68-86).

Every function takes ``sf_dir`` and returns a result with column names
matching its DuckDB oracle in __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from .util import col_np, table_from_arrays, to_pandas_typed


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    from .util import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _join_ne(left, right, **kw):
    """None-propagating compacted join: compacts both sides (Ray's
    hash-shuffle join breaks when a side's FIRST block is empty — see
    util.compact_nonempty) and returns None when either side — or a
    None passed through from an inner _join_ne — is all-empty, so
    query bodies short-circuit to their typed empty result instead of
    crashing mid-chain. Inner joins only (an all-empty side means an
    all-empty result)."""
    from .util import compact_nonempty

    if left is None or right is None:
        return None
    lc = compact_nonempty(left)
    rc = compact_nonempty(right)
    if lc is None or rc is None:
        return None
    return lc.join(rc, **kw)


def q5_revenue(sf_dir: str, region: str = "ASIA") -> "ray.data.Dataset":
    """TPC-H-Q5-style local-supplier volume: revenue by nation for
    orders whose customer and supplier share a nation, one region, a
    two-year order window — the canonical six-table join. JOIN PLAN by
    table size (the 100-TB discipline): region (O(1)) and nation
    (O(25)) are driver-resolved lookups closed over by map_batches
    (broadcast once per task, never re-shipped per batch — they are
    numpy constants in the closure); the three FACT joins
    (orders⋈customer, lineitem⋈orders, lineitem-side⋈supplier) are
    hash-partitioned Dataset joins with every predicate and column
    pruned at or just after the parquet read; the aggregation collapses
    per-batch to ≤|nations| partial sums before a tiny groupby."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty, sparse_sum_reduce

    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1997-01-01")

    reg = to_pandas_typed(_read(sf_dir, "region"))
    rkeys = set(reg[reg.r_name == region].r_regionkey.astype(int))
    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nat = nat[nat.n_regionkey.astype(int).isin(rkeys)]
    nkeys = np.sort(nat.n_nationkey.to_numpy().astype(np.int64))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )

    def cfilt(t: pa.Table) -> pa.Table:
        nk = col_np(t, "c_nationkey").astype(np.int64)
        keep = np.isin(nk, nkeys)
        return table_from_arrays(
            c_custkey=col_np(t, "c_custkey").astype(np.int64)[keep],
            c_nationkey=nk[keep],
        )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cfilt, batch_format="pyarrow")

    def ofilt(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            o_orderkey=col_np(t, "o_orderkey").astype(np.int64)[keep],
            o_custkey=col_np(t, "o_custkey").astype(np.int64)[keep],
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ofilt, batch_format="pyarrow")

    co = _join_ne(
        orders, cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    if co is not None:
        co = co.select_columns(["o_orderkey", "c_nationkey"])

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    lico = _join_ne(
        li, co, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def sfilt(t: pa.Table) -> pa.Table:
        nk = col_np(t, "s_nationkey").astype(np.int64)
        keep = np.isin(nk, nkeys)
        return table_from_arrays(
            s_suppkey=col_np(t, "s_suppkey").astype(np.int64)[keep],
            s_nationkey=nk[keep],
        )

    supp = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(sfilt, batch_format="pyarrow")

    j = _join_ne(
        lico, supp, join_type="inner", num_partitions=8,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )
    if j is None:
        return ray.data.from_arrow(pa.table(
            {"n_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        ))

    def partial(t: pa.Table) -> pa.Table:
        cn = col_np(t, "c_nationkey").astype(np.int64)
        sn = col_np(t, "s_nationkey").astype(np.int64)
        keep = cn == sn
        rev = (
            col_np(t, "l_extendedprice").astype(np.float64)[keep]
            * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep])
        )
        k, s = sparse_sum_reduce(cn[keep], rev)
        return table_from_arrays(nk=k, rev=s)

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("rev", alias_name="rev"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()),
                 "revenue": pa.array([], pa.float64())}
            )
        nk = col_np(t, "nk").astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array([nname[int(v)] for v in nk]),
                "revenue": pc.round(
                    pa.array(col_np(t, "rev").astype(np.float64)), 2
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("n_name")


def q3_shipping(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1996-06-01"
) -> "ray.data.Dataset":
    """TPC-H-Q3-style shipping priority: top-10 orders by open revenue
    for one market segment — orders placed before the cutoff with
    lineitems shipping after it. JOIN PLAN: both fact joins are
    hash-partitioned Dataset joins with predicates and columns pruned
    at the read (customer is NOT broadcast — a segment is ~1/5 of all
    customers, far too big at corpus scale); lineitem pre-aggregates
    per orderkey inside each batch (sparse_sum_reduce combiner) so the
    join and the bucketed final aggregation move one row per
    (orderkey, block), and the global top-10 is a per-batch partial
    top-k before one tiny sort+limit."""
    from .util import bucketed_aggregate, compact_nonempty, sparse_sum_reduce

    cut = np.datetime64(cutoff)

    def cfilt(t: pa.Table) -> pa.Table:
        keep = col_np(t, "c_mktsegment") == segment
        return table_from_arrays(
            c_custkey=col_np(t, "c_custkey").astype(np.int64)[keep]
        )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cfilt, batch_format="pyarrow")

    def ofilt(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = ts < cut
        return pa.table(
            {
                "o_orderkey": pa.array(
                    col_np(t, "o_orderkey").astype(np.int64)[keep]
                ),
                "o_custkey": pa.array(
                    col_np(t, "o_custkey").astype(np.int64)[keep]
                ),
                "o_orderdate": pa.array(ts[keep], pa.timestamp("us")),
            }
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ofilt, batch_format="pyarrow")

    co = _join_ne(
        orders, cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    if co is not None:
        co = co.select_columns(["o_orderkey", "o_orderdate"])

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = ts > cut
        rev = (
            col_np(t, "l_extendedprice").astype(np.float64)[keep]
            * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep])
        )
        k, s = sparse_sum_reduce(
            col_np(t, "l_orderkey").astype(np.int64)[keep], rev
        )
        return table_from_arrays(l_orderkey=k, rev=s)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(lfilt, batch_format="pyarrow")

    j = _join_ne(
        li, co, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    if j is None:
        return ray.data.from_arrow(pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64()),
             "o_orderdate": pa.array([], pa.timestamp("us"))}
        ))

    # orderkey-cardinality keys → bucketed, never raw Ray groupby
    agg = bucketed_aggregate(
        j, key_cols=["l_orderkey"],
        aggs=[("rev", "sum", "rev"), ("o_orderdate", "max", "o_orderdate")],
    )

    def partial_top(t: pa.Table) -> pa.Table:
        rev = col_np(t, "rev").astype(np.float64)
        ok = col_np(t, "l_orderkey").astype(np.int64)
        order = np.lexsort((ok, -rev))[:10]
        return t.take(pa.array(order, pa.int64()))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue": pc.round(t["rev"], 2),
                "o_orderdate": t["o_orderdate"],
            }
        )

    return (
        agg.map_batches(partial_top, batch_format="pyarrow")
        .sort(["rev", "l_orderkey"], descending=[True, False])
        .limit(10)
        .map_batches(finish, batch_format="pyarrow")
    )


def q4_late(sf_dir: str, late_days: int = 90) -> "ray.data.Dataset":
    """TPC-H-Q4-style EXISTS semi-join census → (o_orderpriority,
    n_late): orders with ANY lineitem shipping more than late_days
    after the order date, counted per priority (the shipped
    l_commitdate/l_receiptdate columns don't exist in this synth
    schema; the late-shipment predicate keeps Q4's correlated-EXISTS
    shape). EXISTS(shipdate > orderdate + Δ) ≡ max(shipdate) >
    orderdate + Δ, so the semi-join is ONE bucketed per-order max +
    one hash join + a 5-group count — no row-wise correlated probe.

    Scale shape: lineitem collapses to one (orderkey, max_us) row per
    order before the only join; the final groupby key space is the 5
    priorities."""
    from ray.data.aggregate import Count

    from .util import bucketed_aggregate, compact_nonempty, table_from_arrays

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def ship_us(t: pa.Table) -> pa.Table:
        ts = (
            t.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return table_from_arrays(
            ok=col_np(t, "l_orderkey").astype(np.int64), ship=ts
        )

    shipmax = compact_nonempty(
        bucketed_aggregate(
            li.map_batches(ship_us, batch_format="pyarrow"),
            key_cols=["ok"], aggs=[("ship", "max", "shipmax")],
        )
    )
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def od(t: pa.Table) -> pa.Table:
        ts = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {"o_orderkey": pa.array(
                col_np(t, "o_orderkey").astype(np.int64)),
             "odate": pa.array(ts),
             "o_orderpriority": t.column("o_orderpriority").cast(
                 pa.string())}
        )

    joined = _join_ne(
        orders.map_batches(od, batch_format="pyarrow"),
        shipmax, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("ok",),
    )
    if joined is None:
        return ray.data.from_arrow(pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_late": pa.array([], pa.int64())}
        ))
    delta = late_days * 86_400_000_000

    def late(t: pa.Table, _d=delta) -> pa.Table:
        keep = col_np(t, "shipmax") > col_np(t, "odate") + _d
        return pa.table(
            {"o_orderpriority": t.column("o_orderpriority").filter(
                pa.array(keep))}
        )

    return (
        joined.map_batches(late, batch_format="pyarrow")
        .groupby("o_orderpriority")  # 5 groups
        .aggregate(Count(alias_name="n_late"))
        .sort("o_orderpriority")
    )


def q13_custdist(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q13-style customer order-count distribution → (c_count,
    custdist): how many customers placed exactly k orders, INCLUDING
    the zero-order customers (the famous LEFT-JOIN + double-aggregation
    shape; the o_comment anti-filter doesn't exist in this schema).

    Scale shape: orders collapse to one (custkey, n) row per customer
    via the bucketed count; customers LEFT-OUTER join it (null → 0);
    the distribution groupby key space is |distinct order counts| —
    intrinsically tiny."""
    from ray.data.aggregate import Count

    from .util import bucketed_aggregate, compact_nonempty, table_from_arrays

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def ok(t: pa.Table) -> pa.Table:
        return table_from_arrays(ck=col_np(t, "o_custkey").astype(np.int64))

    percust = compact_nonempty(
        bucketed_aggregate(
            orders.map_batches(ok, batch_format="pyarrow"),
            key_cols=["ck"], aggs=[("ck", "count", "n")],
        )
    )
    cust_c = compact_nonempty(
        _read(sf_dir, "customer", columns=["c_custkey"])
    )
    if cust_c is None:
        return ray.data.from_arrow(pa.table(
            {"c_count": pa.array([], pa.int64()),
             "custdist": pa.array([], pa.int64())}
        ))
    if percust is None:
        # no orders at all: every customer counts as zero-order
        counts = cust_c.map_batches(
            lambda t: pa.table(
                {"c_count": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    else:
        joined = cust_c.join(
            percust, join_type="left_outer", num_partitions=8,
            on=("c_custkey",), right_on=("ck",),
        )

        def fill(t: pa.Table) -> pa.Table:
            return pa.table(
                {"c_count": pc.fill_null(t.column("n").cast(pa.int64()), 0)}
            )

        counts = joined.map_batches(fill, batch_format="pyarrow")

    return (
        counts
        .groupby("c_count")  # |distinct counts| groups — tiny
        .aggregate(Count(alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def q7_volume(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q7-style cross-border trade volume → (supp_nation,
    cust_nation, l_year, revenue): revenue shipped between every
    ORDERED pair of distinct nations per year, in a two-year shipdate
    window. Generalizes Q7's two-nation filter to the full pair matrix
    (the synth nations are few; the group key space is
    |nations|²·years — intrinsically tiny).

    Scale shape: nation (O(25)) is a broadcast closure constant; the
    three fact joins (lineitem⋈orders, ⋈customer, ⋈supplier) are
    hash-partitioned; the aggregation collapses per-batch to ≤ group
    rows via an integer composite key before the tiny groupby."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty, sparse_sum_reduce

    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1997-01-01")

    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        yr = ts[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        # exact integer cents via the SAME double expression the oracle
        # uses (floor(x*100+0.5)) — order-insensitive int64 sums, so
        # Ray's and DuckDB's different reduction orders can't disagree
        # at a half-cent boundary
        cents = np.floor(
            (col_np(t, "l_extendedprice").astype(np.float64)[keep]
             * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep]))
            * 100.0 + 0.5
        ).astype(np.int64)
        return table_from_arrays(
            l_orderkey=col_np(t, "l_orderkey").astype(np.int64)[keep],
            l_suppkey=col_np(t, "l_suppkey").astype(np.int64)[keep],
            rev=cents,
            l_year=yr,
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(lfilt, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    co = _join_ne(
        orders, cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    if co is not None:
        co = co.select_columns(["o_orderkey", "c_nationkey"])
    j = _join_ne(
        _join_ne(
            li, co, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        ),
        supp, join_type="inner", num_partitions=8,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )
    if j is None:
        return ray.data.from_arrow(pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "l_year": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64())}
        ))

    def partial(t: pa.Table) -> pa.Table:
        sn = col_np(t, "s_nationkey").astype(np.int64)
        cn = col_np(t, "c_nationkey").astype(np.int64)
        keep = sn != cn
        key = (
            (sn[keep] * 100 + cn[keep]) * 10_000
            + col_np(t, "l_year")[keep]
        )
        k, s = sparse_sum_reduce(key, col_np(t, "rev")[keep])
        return table_from_arrays(k=k, rev=s)

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("k")  # |nations|²·years groups — tiny
        .aggregate(Sum("rev", alias_name="rev"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"supp_nation": pa.array([], pa.string()),
                 "cust_nation": pa.array([], pa.string()),
                 "l_year": pa.array([], pa.int64()),
                 "revenue": pa.array([], pa.float64())}
            )
        k = col_np(t, "k").astype(np.int64)
        yr = k % 10_000
        sn = k // 1_000_000
        cn = (k // 10_000) % 100
        return pa.table(
            {"supp_nation": pa.array([nname[int(v)] for v in sn]),
             "cust_nation": pa.array([nname[int(v)] for v in cn]),
             "l_year": pa.array(yr),
             "revenue": pa.array(
                 col_np(t, "rev").astype(np.float64) / 100.0)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


def q10_returned(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """TPC-H-Q10-style returned-item loss ranking → top-k customers by
    revenue on RETURNED lineitems ('R' flag) for orders in a one-year
    window, with name and nation attached.

    Scale shape: both fact sides pre-filter at the read; per-customer
    revenue is a bucketed sum (V-cardinality, never Ray's raw
    groupby); top-k runs as per-batch partial top-k before ONE k-row
    sort; the name/nation attach joins only k rows."""
    from .util import bucketed_sum_aggregate, compact_nonempty

    lo = np.datetime64("1995-07-01")
    hi = np.datetime64("1996-07-01")

    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )

    def lfilt(t: pa.Table) -> pa.Table:
        keep = (
            t.column("l_returnflag").to_numpy(zero_copy_only=False) == "R"
        )
        return table_from_arrays(
            l_orderkey=col_np(t, "l_orderkey").astype(np.int64)[keep],
            rev=(
                col_np(t, "l_extendedprice").astype(np.float64)[keep]
                * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep])
            ),
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lfilt, batch_format="pyarrow")

    def ofilt(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            o_orderkey=col_np(t, "o_orderkey").astype(np.int64)[keep],
            o_custkey=col_np(t, "o_custkey").astype(np.int64)[keep],
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ofilt, batch_format="pyarrow")

    empty = pa.table(
        {"c_custkey": pa.array([], pa.int64()),
         "c_name": pa.array([], pa.string()),
         "n_name": pa.array([], pa.string()),
         "revenue": pa.array([], pa.float64())}
    )
    j = _join_ne(
        li, orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)
    percust = compact_nonempty(
        bucketed_sum_aggregate(
            j.select_columns(["o_custkey", "rev"]),
            key_cols=["o_custkey"], sum_cols=["rev"],
        )
    )
    if percust is None:
        return ray.data.from_arrow(empty)

    def partial_top(t: pa.Table, _k=k) -> pa.Table:
        rev = col_np(t, "rev").astype(np.float64)
        ck = col_np(t, "o_custkey").astype(np.int64)
        order = np.lexsort((ck, -rev))[:_k]
        return t.take(pa.array(order, pa.int64()))

    topk = (
        percust.map_batches(partial_top, batch_format="pyarrow")
        .sort(["rev", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_arrow_refs()
    )
    top_tabs = [t for t in map(ray.get, topk) if t.num_rows]
    if not top_tabs:
        return ray.data.from_arrow(empty)
    tops = pa.concat_tables(top_tabs)
    want = set(col_np(tops, "o_custkey").astype(np.int64).tolist())
    rev_by = dict(
        zip(col_np(tops, "o_custkey").astype(np.int64).tolist(),
            col_np(tops, "rev").astype(np.float64).tolist())
    )

    def attach(t: pa.Table) -> pa.Table:
        ck = col_np(t, "c_custkey").astype(np.int64)
        keep = np.array([int(v) in want for v in ck], bool)
        f = t.filter(pa.array(keep))
        ckf = col_np(f, "c_custkey").astype(np.int64)
        return pa.table(
            {"c_custkey": pa.array(ckf),
             "c_name": f.column("c_name").cast(pa.string()),
             "n_name": pa.array(
                 [nname[int(v)]
                  for v in col_np(f, "c_nationkey").astype(np.int64)]),
             "revenue": pa.array(
                 np.round([rev_by[int(v)] for v in ckf], 2),
                 pa.float64())}
        )

    return (
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey"])
        .map_batches(attach, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
    )


def q14_promo(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q14-style promotion-revenue share → one row
    (promo_revenue): 100·Σ(promo rev)/Σ(rev) for a one-year shipdate
    window, where promo parts are p_type = 'PROMO'.

    Scale shape: lineitem pre-filters and projects at the read, joins
    part (hash-partitioned) once, and every batch collapses to TWO
    floats (promo sum, total sum) before the one-row final division."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty

    lo = np.datetime64("1995-09-01")
    hi = np.datetime64("1996-09-01")

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            l_partkey=col_np(t, "l_partkey").astype(np.int64)[keep],
            rev=(
                col_np(t, "l_extendedprice").astype(np.float64)[keep]
                * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep])
            ),
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lfilt, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    j = _join_ne(
        li, part, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    if j is None:
        return ray.data.from_arrow(
            pa.table({"promo_revenue": pa.array([0.0], pa.float64())})
        )

    def partial(t: pa.Table) -> pa.Table:
        rev = col_np(t, "rev").astype(np.float64)
        promo = (
            t.column("p_type").to_numpy(zero_copy_only=False) == "PROMO"
        )
        return pa.table(
            {"p": pa.array([float(rev[promo].sum())]),
             "tot": pa.array([float(rev.sum())])}
        )

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("p", alias_name="p"), Sum("tot", alias_name="tot")
    )
    tot = float(agg["tot"] or 0.0)
    share = 100.0 * float(agg["p"] or 0.0) / tot if tot else 0.0
    return ray.data.from_arrow(
        pa.table({"promo_revenue": pa.array(
            [round(share, 6)], pa.float64())})
    )


def q17_small_quantity(sf_dir: str, brand: str = "Brand#1") -> (
        "ray.data.Dataset"):
    """TPC-H-Q17-style small-quantity order revenue → one row
    (avg_yearly): Σ extendedprice / 7 over lineitems of one brand whose
    quantity is below 20% of that part's average quantity. The
    correlated AVG subquery runs as ONE bucketed per-part (sum, count)
    + a self-join back; the predicate q < 0.2·avg is evaluated in
    EXACT integer arithmetic (5·q·cnt < sum_qty — quantities are small
    integers, exact in doubles), so Ray and the oracle agree bit-for-bit
    on membership.

    Scale shape: per-part stats are a bucketed aggregate; the probe
    join is hash-partitioned; each batch collapses to one float."""
    from ray.data.aggregate import Sum

    from .util import bucketed_aggregate, compact_nonempty

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def pfilt(t: pa.Table, _b=brand) -> pa.Table:
        keep = t.column("p_brand").to_numpy(zero_copy_only=False) == _b
        return table_from_arrays(
            p_partkey=col_np(t, "p_partkey").astype(np.int64)[keep]
        )

    bparts = compact_nonempty(
        part.map_batches(pfilt, batch_format="pyarrow")
    )
    empty = pa.table({"avg_yearly": pa.array([0.0], pa.float64())})
    if bparts is None:
        return ray.data.from_arrow(empty)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    bli0 = _join_ne(
        li, bparts, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    bli = compact_nonempty(bli0) if bli0 is not None else None
    if bli is None:
        return ray.data.from_arrow(empty)
    stats = compact_nonempty(
        bucketed_aggregate(
            bli.select_columns(["l_partkey", "l_quantity"]),
            key_cols=["l_partkey"],
            aggs=[("l_quantity", "sum", "sum_qty"),
                  ("l_quantity", "count", "n_qty")],
        )
    )
    if stats is None:
        return ray.data.from_arrow(empty)
    probe = bli.join(
        stats.rename_columns({"l_partkey": "pk"}),
        join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("pk",),
    )

    def partial(t: pa.Table) -> pa.Table:
        q = col_np(t, "l_quantity").astype(np.float64)
        sq = col_np(t, "sum_qty").astype(np.float64)
        n = col_np(t, "n_qty").astype(np.float64)
        keep = 5.0 * q * n < sq  # q < 0.2·avg, exact in doubles
        s = float(
            col_np(t, "l_extendedprice").astype(np.float64)[keep].sum()
        )
        return pa.table({"s": pa.array([s])})

    agg = probe.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s")
    )
    return ray.data.from_arrow(
        pa.table({"avg_yearly": pa.array(
            [round(float(agg["s"] or 0.0) / 7.0, 2)], pa.float64())})
    )


def q19_disjunct(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q19-style disjunctive-predicate revenue → one row
    (revenue): three OR'd (brand, size range, quantity range) arms
    over lineitem⋈part — the scan+join shape planners love to botch.

    Scale shape: the join is hash-partitioned; the three arms evaluate
    as vectorized boolean masks per batch; each batch collapses to one
    float before the one-row sum."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
    )
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"])
    j = _join_ne(
        li, part, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    if j is None:
        return ray.data.from_arrow(
            pa.table({"revenue": pa.array([0.0], pa.float64())})
        )
    arms = [("Brand#1", 1, 15, 1.0, 21.0),
            ("Brand#2", 1, 25, 10.0, 30.0),
            ("Brand#3", 1, 35, 20.0, 40.0)]

    def partial(t: pa.Table, _arms=tuple(arms)) -> pa.Table:
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        size = col_np(t, "p_size").astype(np.int64)
        qty = col_np(t, "l_quantity").astype(np.float64)
        keep = np.zeros(t.num_rows, bool)
        for b, s_lo, s_hi, q_lo, q_hi in _arms:
            keep |= (
                (brand == b) & (size >= s_lo) & (size <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
        rev = (
            col_np(t, "l_extendedprice").astype(np.float64)[keep]
            * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep])
        )
        return pa.table({"s": pa.array([float(rev.sum())])})

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s")
    )
    return ray.data.from_arrow(
        pa.table({"revenue": pa.array(
            [round(float(agg["s"] or 0.0), 2)], pa.float64())})
    )


def events_json_k(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured JSON payload extraction → per event_type stats
    of the numeric `k` field inside the props JSON blob: (event_type,
    n, sum_k, min_k, max_k, n_distinct_k). The schema-on-read pattern:
    the payload stays an opaque string in storage; the engine projects
    the field vectorized at query time (no per-row json.loads).

    Scale shape: regex field extraction + per-(type, k) batch collapse
    → ONE small groupby over |types|·|k values| keys; distinct-k is
    exact via the collapsed pair table, never a driver set."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        k = (
            pd.Series(t.column("props").to_numpy(zero_copy_only=False))
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        df = pd.DataFrame(
            {"event_type": t.column("event_type")
             .to_numpy(zero_copy_only=False),
             "k": k.to_numpy(np.float64)}
        ).dropna()
        df["k"] = df["k"].astype(np.int64)
        g = df.groupby(["event_type", "k"], sort=False).size()
        g = g.reset_index(name="c")
        return pa.table(
            {"event_type": pa.array(
                g["event_type"].astype(str), pa.string()),
             "k": pa.array(g["k"].to_numpy(np.int64)),
             "c": pa.array(g["c"].to_numpy(np.int64))}
        )

    pairs = (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby(["event_type", "k"])  # |types|·|k| groups — small
        .aggregate(Sum("c", alias_name="c"))
    )

    def widen(t: pa.Table) -> pa.Table:
        k = col_np(t, "k").astype(np.int64)
        c = col_np(t, "c").astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"],
             "n": pa.array(c),
             "sum_k": pa.array(k * c),
             "min_k": pa.array(k),
             "max_k": pa.array(k),
             "ones": pa.array(np.ones(t.num_rows, np.int64))}
        )

    agg = (
        pairs.map_batches(widen, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Count(alias_name="n_distinct_k"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = ["event_type", "n", "sum_k", "min_k", "max_k",
                "n_distinct_k"]
        return t.select(cols).set_column(
            0, "event_type", t.column("event_type").cast(pa.string())
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        "event_type"
    )


def events_burst(sf_dir: str) -> "ray.data.Dataset":
    """Per-user burst profile → (user_id, n_minutes, max_per_min): how
    many distinct active minutes a user has and the busiest minute's
    event count — the rate-limit / bot-burst signal (a human browses
    tens of events per minute; a scraper does hundreds). Exact
    integers.

    Scale shape: the classic two-level aggregation — per-batch
    (user, minute) partial counts collapse batch-side, ONE bucketed
    (user, minute) sum, then ONE bucketed per-user (count, max). No
    per-user state on the driver."""
    from .util import bucketed_aggregate, bucketed_sum_aggregate, compact_nonempty

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def minutes(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        df = pd.DataFrame(
            {"user_id": col_np(t, "user_id").astype(np.int64),
             "minute": ts // 60_000_000}
        )
        cnt = df.value_counts(sort=False).reset_index(name="c")
        return pa.table(
            {"user_id": pa.array(cnt["user_id"].to_numpy(np.int64)),
             "minute": pa.array(cnt["minute"].to_numpy(np.int64)),
             "c": pa.array(cnt["c"].to_numpy(np.int64))}
        )

    per_min = compact_nonempty(
        bucketed_sum_aggregate(
            ev.map_batches(minutes, batch_format="pyarrow"),
            key_cols=["user_id", "minute"], sum_cols=["c"],
        )
    )
    if per_min is None:
        return ray.data.from_arrow(
            pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_minutes": pa.array([], pa.int64()),
                 "max_per_min": pa.array([], pa.int64())}
            )
        )
    return (
        bucketed_aggregate(
            per_min.select_columns(["user_id", "c"]),
            key_cols=["user_id"],
            aggs=[("c", "count", "n_minutes"), ("c", "max", "max_per_min")],
        )
        .sort("user_id")
    )


def orders_stats(sf_dir: str) -> pa.Table:
    """ANALYZE-style catalog statistics for the orders table →
    (column_name, n_rows, n_distinct, n_null): the per-column summary a
    query optimizer collects before planning (selectivity estimation,
    join ordering). Exact counts, not sketches — the HLL variant is the
    same dataflow with registers (pipelines/sketch.py).

    Scale shape: ONE pass emits per-batch per-column partials (batch
    value hashes collapse batch-side); each column's distinct count is
    a bucketed distinct (hash-bucket shuffle, never a driver set); the
    result is |columns| rows."""
    from .util import bucketed_sum_aggregate, compact_nonempty

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    ds = _read(sf_dir, "orders", columns=cols).materialize()
    n_rows = ds.count()
    out_rows = []
    for c in cols:

        def proj(t: pa.Table, _c=c) -> pa.Table:
            arr = t.column(_c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # normalize every type to a string key batch-side (exact
            # distinct over the hashable projection; cast is injective
            # for these column types)
            return pa.table(
                {"v": arr.cast(pa.string()),
                 "isnull": pa.array(
                     np.asarray(arr.is_null()).astype(np.int64))}
            )

        proj_ds = compact_nonempty(
            ds.map_batches(proj, batch_format="pyarrow")
        )
        if proj_ds is None:
            out_rows.append((c, 0, 0, 0))
            continue
        n_null = sum(
            int(t["n"][0].as_py())
            for t in proj_ds.map_batches(
                lambda t: pa.table(
                    {"n": pa.array([int(col_np(t, "isnull").sum())])}
                ),
                batch_format="pyarrow",
            ).to_arrow_refs()
            for t in [ray.get(t)]
            if t.num_rows
        )
        nonnull = compact_nonempty(
            proj_ds.map_batches(
                lambda t: t.filter(
                    pa.array(col_np(t, "isnull") == 0)
                ).select(["v"]),
                batch_format="pyarrow",
            )
        )
        n_distinct = 0
        if nonnull is not None:
            dist = compact_nonempty(
                bucketed_sum_aggregate(nonnull, key_cols=["v"], sum_cols=[])
            )
            n_distinct = dist.count() if dist is not None else 0
        out_rows.append((c, n_rows, n_distinct, n_null))
    return pa.table(
        {"column_name": pa.array([r[0] for r in out_rows], pa.string()),
         "n_rows": pa.array([r[1] for r in out_rows], pa.int64()),
         "n_distinct": pa.array([r[2] for r in out_rows], pa.int64()),
         "n_null": pa.array([r[3] for r in out_rows], pa.int64())}
    )


def q18_large_orders(
    sf_dir: str, qty_threshold: float = 250.0
) -> "ray.data.Dataset":
    """TPC-H-Q18-style large-volume customers: orders whose total
    lineitem quantity exceeds a threshold, joined back to order and
    customer attributes, top-100 by order value. The HAVING semi-join
    never materializes an ID list on the driver: the per-order
    quantity sum is a bucketed aggregation (orderkey-cardinality keys
    bypass Ray's per-group overhead), the threshold is a pure filter
    on that Dataset, and the survivors — a tiny fraction of orders —
    flow through two hash-partitioned joins. Per-batch partial top-100
    bounds the final sort."""
    from .util import bucketed_aggregate, compact_nonempty, sparse_sum_reduce

    def lpart(t: pa.Table) -> pa.Table:
        k, s = sparse_sum_reduce(
            col_np(t, "l_orderkey").astype(np.int64),
            col_np(t, "l_quantity").astype(np.float64),
        )
        return table_from_arrays(l_orderkey=k, qty=s)

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
    ).map_batches(lpart, batch_format="pyarrow")

    qsum = bucketed_aggregate(
        li, key_cols=["l_orderkey"], aggs=[("qty", "sum", "sum_qty")]
    )

    def thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["sum_qty"], qty_threshold))

    big = qsum.map_batches(thresh, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    jo = _join_ne(
        big, orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j = _join_ne(
        jo, cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    if j is None:
        return ray.data.from_arrow(pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "o_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_totalprice": pa.array([], pa.float64()),
             "sum_qty": pa.array([], pa.int64())}
        ))

    def partial_top(t: pa.Table) -> pa.Table:
        tp = col_np(t, "o_totalprice").astype(np.float64)
        ok = col_np(t, "l_orderkey").astype(np.int64)
        order = np.lexsort((ok, -tp))[:100]
        return t.take(pa.array(order, pa.int64()))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "o_orderkey": t["l_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "sum_qty": t["sum_qty"],
            }
        )

    return (
        j.map_batches(partial_top, batch_format="pyarrow")
        .sort(["o_totalprice", "l_orderkey"], descending=[True, False])
        .limit(100)
        .map_batches(finish, batch_format="pyarrow")
    )


def events_rfm(sf_dir: str) -> "ray.data.Dataset":
    """Per-user RFM table (recency / frequency / monetary) — the
    canonical user-value summary a selection pipeline joins against:
    last event time, event count, total and mean value. One bucketed
    aggregation over user-cardinality keys; no driver state."""
    from .util import bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    # integer-cent sufficient statistics: double SUMs reduced in a
    # different order than the serial oracle can round to an adjacent
    # ulp at the 2dp boundary; exact int64 cents + one final division
    # from identical integers make both sides bit-equal (round 10)
    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(
            col_np(t, "value").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "c": pa.array(c, pa.int64())}
        )

    agg = bucketed_aggregate(
        ev.map_batches(cents, batch_format="pyarrow"),
        key_cols=["user_id"],
        aggs=[
            ("ts", "max", "last_ts"),
            ("user_id", "count", "n_events"),
            ("c", "sum", "c_sum"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        c = col_np(t, "c_sum").astype(np.int64)
        n = col_np(t, "n_events").astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "last_ts": t["last_ts"],
                "n_events": pa.array(n, pa.int64()),
                "total_value": pa.array(c / 100.0, pa.float64()),
                "avg_value": pa.array(c / (100.0 * n), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


def events_hourly_topk(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Windowed heavy hitters (the streaming 'trending now' shape):
    top-k event types per 1-hour tumbling window by count, rank 1..k.
    Counting is bucketed (window×type cardinality is data-sized);
    ranking reuses scoring.top_k_per_group's partial-top-k shuffle
    bound (k rows per window per block)."""
    from .pipelines.scoring import top_k_per_group
    from .util import bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        return pa.table({"wstart_us": hour, "event_type": t["event_type"]})

    counts = bucketed_aggregate(
        ev.map_batches(add_window, batch_format="pyarrow"),
        key_cols=["wstart_us", "event_type"],
        aggs=[("event_type", "count", "n")],
    )
    top = top_k_per_group(
        counts, group_col="wstart_us", order_col="n",
        tiebreak_col="event_type", k=k,
        keep_cols=["wstart_us", "event_type", "n"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t["wstart_us"].cast(pa.timestamp("us")),
                "event_type": t["event_type"],
                "n": t["n"],
                "rnk": t["rnk"],
            }
        )

    return top.map_batches(finish, batch_format="pyarrow").sort(
        ["window_start", "rnk"]
    )


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped pricing summary over lineitem (column-pruned read,
    vectorized Arrow expressions, partial-then-final aggregation)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        import datetime

        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), type=pa.timestamp("us"))
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    def roundcols(t: pa.Table) -> pa.Table:
        # float sums differ from a serial oracle by ~1e-9 relative
        # (summation order); round identically on both sides
        for c, dp in (("sum_base_price", 2), ("sum_disc_price", 2), ("avg_qty", 6)):
            t = t.set_column(
                t.schema.get_field_index(c), c, pc.round(t[c], dp)
            )
        return t

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .map_batches(roundcols, batch_format="pyarrow")
        .sort(["l_returnflag", "l_linestatus"])
    )


def top_customers_by_revenue(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k customers by order revenue. Per-batch sparse partial sums
    → bucketed final aggregation (customer-cardinality keys never hit
    Ray's groupby) → k-row top. Names resolve by broadcasting the K
    WINNING KEYS (k ints) as a filter over the customer table — the
    round-10 fix for the old |customers|-dict driver broadcast; the
    driver holds only the two k-row tables."""
    from .util import bucketed_sum_aggregate

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        from .util import sparse_sum_reduce

        keys, sums = sparse_sum_reduce(
            col_np(t, "o_custkey"), col_np(t, "o_totalprice")
        )
        return table_from_arrays(c_custkey=keys, revenue=sums)

    agg = bucketed_sum_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        key_cols=["c_custkey"], sum_cols=["revenue"],
    )
    top = agg.sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)
    tbl = to_pandas_typed(top)  # k rows
    if len(tbl) == 0:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    topkeys = pa.array(tbl["c_custkey"].to_numpy().astype(np.int64))

    def pick(t: pa.Table, _keys=topkeys) -> pa.Table:
        return t.filter(pc.is_in(t["c_custkey"], value_set=_keys))

    names = to_pandas_typed(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(pick, batch_format="pyarrow")
    )  # ≤ k rows survive the filter
    lookup = dict(zip(names["c_custkey"], names["c_name"]))
    tbl["c_name"] = tbl["c_custkey"].map(lookup)
    tbl["revenue"] = tbl["revenue"].round(2)
    return pa.Table.from_pandas(
        tbl[["c_custkey", "c_name", "revenue"]], preserve_index=False
    )


def events_hourly_windows(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window aggregate (streaming-shaped op, ray_guide
    'Streaming-shaped workloads'): 1-hour event-time windows per user."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    from .util import bucketed_aggregate

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())  # µs since epoch
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        # exact int64 cents (see events_rfm: ulp-stable vs the oracle)
        c = np.floor(
            col_np(t, "value").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"user_id": t["user_id"], "wstart_us": hour,
             "c": pa.array(c, pa.int64())}
        )

    # bucketed: (user, window) cardinality is data-sized
    agg = bucketed_aggregate(
        ev.map_batches(add_window, batch_format="pyarrow"),
        key_cols=["user_id", "wstart_us"],
        aggs=[("user_id", "count", "n_events"),
              ("c", "sum", "c_sum")],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["wstart_us"].cast(pa.timestamp("us")),
                "n_events": t["n_events"],
                "sum_value": pa.array(
                    col_np(t, "c_sum").astype(np.int64) / 100.0,
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["user_id", "window_start"]
    )


def _user_bucket(t: pa.Table, num_buckets: int = 256) -> pa.Table:
    from .util import _mix_to_bucket

    return t.append_column(
        "__bucket",
        pa.array(_mix_to_bucket([col_np(t, "user_id").astype(np.int64)],
                                num_buckets)),
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user (gap-based) — the per-key ordered-log
    pattern, VECTORIZED over every user in a coarse hash bucket: one
    lexsort, session boundaries from within-user gaps, per-session
    reduceat aggregates. (A per-user map_groups pays Ray's ~125µs
    per-group overhead once per user — untenable at web-scale user
    cardinality.)"""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    gap_us = np.int64(gap_minutes) * 60_000_000

    def sessions_block(g: pa.Table, _gap=gap_us) -> pa.Table:
        uid = col_np(g, "user_id").astype(np.int64)
        eid = col_np(g, "event_id").astype(np.int64)
        ts = g.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, t_us = uid[order], us[order]
        n = len(u)
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap_break = np.zeros(n, dtype=bool)
        gap_break[1:] = (t_us[1:] - t_us[:-1]) > _gap
        new_sess = new_user | gap_break
        starts = np.flatnonzero(new_sess)
        sizes = np.diff(np.append(starts, n))
        # session_id = 0-based session rank within its user: sessions
        # are user-contiguous, so subtract the user's first session pos
        sess_is_first = new_user[starts]
        user_of_sess = np.cumsum(sess_is_first) - 1
        first_pos = np.flatnonzero(sess_is_first)
        sid = np.arange(len(starts)) - first_pos[user_of_sess]
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid.astype(np.int64), pa.int64()),
                "session_start": pa.array(
                    t_us[starts], pa.int64()
                ).cast(pa.timestamp("us")),
                "session_end": pa.array(
                    t_us[np.append(starts[1:], n) - 1], pa.int64()
                ).cast(pa.timestamp("us")),
                "n_events": pa.array(sizes.astype(np.int64), pa.int64()),
            }
        )

    return (
        ev.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessions_block, batch_format="pyarrow")
        .sort(["user_id", "session_id"])
    )


def events_window_funcs(sf_dir: str) -> "ray.data.Dataset":
    """SQL window functions over the event log — ROW_NUMBER and LAG per
    user ordered by (ts, event_id): seq = position in the user's
    stream, gap_us = whole microseconds since the user's previous event
    (NULL for the first). Same per-key ordered-log map_groups shape as
    sessionize; the kernel is vectorized numpy over int64 microsecond
    timestamps (no float rounding — the ts column is µs-resolution)."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def win_block(g: pa.Table) -> pa.Table:
        # every user in one coarse hash bucket, one lexsort (per-user
        # map_groups pays Ray's per-group overhead once per user)
        uid = col_np(g, "user_id").astype(np.int64)
        eid = col_np(g, "event_id").astype(np.int64)
        ts = g.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, e, t_us = uid[order], eid[order], us[order]
        n = len(u)
        new_user = np.zeros(n, dtype=bool)
        if n:
            new_user[0] = True
            new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        seq = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        ) + 1
        gap = np.empty(n, dtype=np.int64)
        if n:
            gap[0] = 0
            gap[1:] = t_us[1:] - t_us[:-1]
        # first event per user gets NULL (the LAG convention) —
        # explicit int64-with-mask, NOT float NaN (events_asof lesson)
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "ts": pa.array(t_us, pa.int64()).cast(pa.timestamp("us")),
                "seq": pa.array(seq, pa.int64()),
                "gap_us": pa.array(gap, pa.int64(), mask=new_user),
            }
        )

    return (
        ev.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(win_block, batch_format="pyarrow")
        .sort(["user_id", "seq"])
    )


def events_asof_latest_order(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (ray_guide 'As-of / range join'): each event matched to
    the user's most recent order at or before the event time
    (user_id ↔ o_custkey).

    Fully co-partitioned (the VERDICT fix): both sides are tagged and
    unioned into ONE Dataset, a single groupby(user_id) co-locates each
    user's events WITH that user's orders, and merge_asof runs per
    group — no driver-side orders table, no per-group full-table scan.
    """
    from .util import bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )
    # latest-by-date wins on date ties → distributed max orderkey per
    # (cust, date); bucketed — (cust, date) cardinality is data-sized
    ord_agg = bucketed_aggregate(
        orders.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"].cast(pa.int64()),
                    "o_date_us": t["o_orderdate"]
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64()),
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        key_cols=["o_custkey", "o_date_us"],
        aggs=[("o_orderkey", "max", "o_orderkey")],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_date_us"].cast(pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"],
            }
        ),
        batch_format="pyarrow",
    )

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "kind": pa.array(
                    np.zeros(t.num_rows, dtype=np.int8), pa.int8()
                ),
                "ts": t["ts"].cast(pa.timestamp("us")),
                "event_id": t["event_id"].cast(pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["o_custkey"].cast(pa.int64()),
                "kind": pa.array(
                    np.ones(t.num_rows, dtype=np.int8), pa.int8()
                ),
                "ts": t["o_orderdate"].cast(pa.timestamp("us")),
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            }
        )

    both = ev.map_batches(tag_events, batch_format="pyarrow").union(
        ord_agg.map_batches(tag_orders, batch_format="pyarrow")
    )

    def asof_block(g: pa.Table) -> pa.Table:
        """Backward as-of for EVERY user in one coarse hash bucket: one
        lexsort (orders precede events at equal ts), then a single
        segment-reset cumulative max — candidate = user_ord·(n+1) +
        (row_pos+1 on order rows, 0 otherwise) is strictly increasing
        across user boundaries, so np.maximum.accumulate carries the
        latest order row forward WITHIN a user and can never leak one
        across users. (The per-user pandas merge_asof paid Ray's
        ~125µs-per-group overhead once per user.)"""
        uid = col_np(g, "user_id").astype(np.int64)
        kind = col_np(g, "kind").astype(np.int8)
        ts = g.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id")
        if isinstance(eid, pa.ChunkedArray):
            eid = eid.combine_chunks()
        eids = eid.to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey")
        if isinstance(okey, pa.ChunkedArray):
            okey = okey.combine_chunks()
        okeys = okey.to_numpy(zero_copy_only=False)

        order = np.lexsort((1 - kind, us, uid))  # orders first at ties
        u, k, t_us = uid[order], kind[order], us[order]
        e = eids[order]
        ok = okeys[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "o_orderkey": pa.array([], pa.int64())}
            )
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        uord = np.cumsum(new_user).astype(np.int64) - 1
        base = uord * np.int64(n + 1)
        pos = np.arange(n, dtype=np.int64)
        cand = base + np.where(k == 1, pos + 1, 0)
        last = np.maximum.accumulate(cand)
        is_ev = k == 0
        valid = last[is_ev] > base[is_ev]
        opos = last[is_ev] - base[is_ev] - 1
        matched = np.where(valid, opos, 0)
        out_ok = np.where(
            valid, np.nan_to_num(
                ok[matched].astype(np.float64), nan=0.0
            ).astype(np.int64), 0
        )
        return pa.table(
            {
                "event_id": pa.array(
                    np.nan_to_num(
                        e[is_ev].astype(np.float64), nan=0.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "user_id": pa.array(u[is_ev], pa.int64()),
                "ts": pa.array(t_us[is_ev], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderkey": pa.array(out_ok, pa.int64(), mask=~valid),
            }
        )

    return (
        both.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(asof_block, batch_format="pyarrow")
        .sort("event_id")
    )


def events_trailing_counts(
    sf_dir: str, window_minutes: int = 60
) -> "ray.data.Dataset":
    """Per-event TRAILING sliding-window count: how many of the user's
    events fall in [ts − window, ts] (RANGE frame semantics, frame
    bounds inclusive). Vectorized over every user in a coarse hash
    bucket: one lexsort, then a per-segment searchsorted — no per-row
    or per-user Python."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    win_us = np.int64(window_minutes) * 60_000_000

    def trail_block(g: pa.Table, _w=win_us) -> pa.Table:
        uid = col_np(g, "user_id").astype(np.int64)
        eid = col_np(g, "event_id").astype(np.int64)
        ts = g.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, e, t_us = uid[order], eid[order], us[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "n_trailing": pa.array([], pa.int64())}
            )
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        seg = np.cumsum(new_user).astype(np.int64) - 1
        base = starts[seg]
        # t_us is sorted only WITHIN user segments — build a globally
        # monotone surrogate: seg·B + (ts − segment start), B larger
        # than any within-user time span + window, so one searchsorted
        # answers every segment at once and can never cross users
        rel = t_us - t_us[base]
        B = np.int64(int(rel.max()) if n else 0) + _w + np.int64(2)
        # hi uses side='right' on the CURRENT ts: SQL's RANGE frame
        # includes the whole equal-ts peer group, not just prior rows
        if int(seg[-1]) * int(B) < (1 << 62):
            s2 = seg * B + rel
            lo = np.searchsorted(s2, s2 - _w, side="left")
            hi = np.searchsorted(s2, s2, side="right")
        else:  # astronomically wide buckets: per-segment fallback
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            ends = np.append(starts[1:], n)
            for a, b in zip(starts, ends):
                lo[a:b] = a + np.searchsorted(
                    t_us[a:b], t_us[a:b] - _w, side="left"
                )
                hi[a:b] = a + np.searchsorted(
                    t_us[a:b], t_us[a:b], side="right"
                )
        lo = np.maximum(lo, base)
        n_trail = hi - lo
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "ts": pa.array(t_us, pa.int64()).cast(pa.timestamp("us")),
                "n_trailing": pa.array(n_trail, pa.int64()),
            }
        )

    return (
        ev.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(trail_block, batch_format="pyarrow")
        .sort("event_id")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT (crosstab): one row per user with a count column per event
    type plus the total — the feature-vector shape a churn/propensity
    model trains on. Per-batch numpy crosstab partials (|users in
    batch| × |types| integer matrix via one np.add.at) collapse before
    the only shuffle, a bucketed sum on user_id (user cardinality is
    data-sized — Ray's raw groupby must not see it). Unknown event
    types fail loudly rather than silently dropping rows."""
    from .util import bucketed_sum_aggregate

    types = pa.array(EVENT_TYPES)
    ncols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(t: pa.Table) -> pa.Table:
        u = col_np(t, "user_id").astype(np.int64)
        idx = pc.index_in(
            t.column("event_type").combine_chunks(), value_set=types
        )
        if idx.null_count:
            raise ValueError("events_pivot: unknown event_type value")
        ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        mat = np.zeros((len(uu), len(EVENT_TYPES)), dtype=np.int64)
        np.add.at(mat, (inv, ix), 1)
        cols = {"user_id": uu}
        for i, name in enumerate(ncols):
            cols[name] = mat[:, i]
        return table_from_arrays(**cols)

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    agg = bucketed_sum_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        key_cols=["user_id"], sum_cols=ncols,
    )

    def totalize(t: pa.Table) -> pa.Table:
        tot = np.zeros(t.num_rows, dtype=np.int64)
        for name in ncols:
            tot += col_np(t, name).astype(np.int64)
        return t.append_column("n_total", pa.array(tot))

    return agg.map_batches(totalize, batch_format="pyarrow").sort("user_id")


def events_type_user_counts(sf_dir: str) -> "ray.data.Dataset":
    """Grouped EXACT count-distinct: distinct users per event type.
    Stage 1 is a bucketed distinct of (event_type, user_id) —
    data-sized key cardinality, so Ray's groupby must not see it
    (util.bucketed_sum_aggregate); stage 2 counts per type (few
    groups). The HLL sketch (pipelines.sketch) is the approximate
    counterpart of this exact op."""
    from ray.data.aggregate import Count
    from .util import bucketed_sum_aggregate

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = bucketed_sum_aggregate(
        ev, key_cols=["event_type", "user_id"], sum_cols=[]
    )
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .sort("event_type")
    )


def customers_without_orders(sf_dir: str, year: int = 1995) -> "ray.data.Dataset":
    """Distributed ANTI-JOIN without a join operator: customers with no
    order in ``year`` (predicate pushed to the probe-side read). Both
    key streams are tagged and unioned, one bucketed max-aggregation
    per key decides membership (same message-exchange shape as the
    as-of co-partitioning) — the build side is never broadcast and
    never re-shipped per batch. → (c_custkey) sorted."""
    from .util import bucketed_aggregate

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_cust(t: pa.Table) -> pa.Table:
        k = col_np(t, "c_custkey").astype(np.int64)
        return table_from_arrays(
            key=k,
            is_cust=np.ones(len(k), dtype=np.int64),
            has_order=np.zeros(len(k), dtype=np.int64),
        )

    def tag_order(t: pa.Table, _y=year) -> pa.Table:
        # filter + per-batch distinct combiner: ≤1 row per custkey/block
        yrs = pc.year(t.column("o_orderdate"))
        keys = col_np(t.filter(pc.equal(yrs, _y)), "o_custkey")
        k = np.unique(keys.astype(np.int64))
        return table_from_arrays(
            key=k,
            is_cust=np.zeros(len(k), dtype=np.int64),
            has_order=np.ones(len(k), dtype=np.int64),
        )

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_order, batch_format="pyarrow")
    )
    agg = bucketed_aggregate(
        both, key_cols=["key"],
        aggs=[("is_cust", "max", "is_cust"), ("has_order", "max", "has_order")],
    )

    def keep(t: pa.Table) -> pa.Table:
        ic = col_np(t, "is_cust").astype(np.int64)
        ho = col_np(t, "has_order").astype(np.int64)
        sel = (ic == 1) & (ho == 0)
        return pa.table(
            {"c_custkey": pa.array(
                col_np(t, "key").astype(np.int64)[sel], pa.int64()
            )}
        )

    out = agg.map_batches(keep, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # typed pa.Table, not an empty Dataset: Ray's to_pandas() drops
        # all columns for zero-row Datasets
        return pa.table({"c_custkey": pa.array([], pa.int64())})
    return out.sort("c_custkey")


def supplier_part_counts(sf_dir: str) -> "ray.data.Dataset":
    """Distinct-count style aggregate: distinct parts per supplier from
    lineitem (map-side pair dedup → groupby count)."""
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def dedup(t: pa.Table) -> pa.Table:
        s = col_np(t, "l_suppkey")
        p = col_np(t, "l_partkey")
        key = s.astype(np.int64) * (1 << 32) + p
        uniq = np.unique(key)
        return table_from_arrays(
            l_suppkey=uniq >> 32, l_partkey=uniq & ((1 << 32) - 1)
        )

    return (
        ds.map_batches(dedup, batch_format="pyarrow")
        .groupby(["l_suppkey", "l_partkey"])
        .count()
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="n_parts"))
        .sort("l_suppkey")
    )


def customer_order_stats(sf_dir: str) -> "ray.data.Dataset":
    """LEFT OUTER join aggregate: every customer with order count and
    total spend, zero-filled for customers with no orders (the outer
    counterpart of customers_without_orders' anti-join). Build side is
    pre-aggregated per custkey with ONE bucketed aggregation (orders is
    data-sized; Ray's groupby must not see raw keys), so the join's
    right side is ≤ |customers| rows — shuffle volume ∝ distinct keys,
    not ∝ |orders|. → (c_custkey, c_mktsegment, n_orders, total_spent)."""
    from .util import bucketed_aggregate

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    # exact int64 cents (see events_rfm: ulp-stable vs the oracle)
    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(
            col_np(t, "o_totalprice").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"o_custkey": t["o_custkey"], "c": pa.array(c, pa.int64())}
        )

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow")
    per_cust = bucketed_aggregate(
        orders, key_cols=["o_custkey"],
        aggs=[("c", "sum", "c_sum"),
              ("c", "count", "n_orders")],
    )
    from .util import compact_nonempty

    cust_c = compact_nonempty(cust)
    if cust_c is None:
        return ray.data.from_arrow(pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_mktsegment": pa.array([], pa.string()),
             "n_orders": pa.array([], pa.int64()),
             "total_spent": pa.array([], pa.float64())}
        ))
    per_cust_c = compact_nonempty(per_cust)
    if per_cust_c is None:
        # no orders at all: zero-fill every customer without a join
        joined = cust_c.map_batches(
            lambda t: t.append_column(
                "n_orders",
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ).append_column(
                "c_sum",
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ),
            batch_format="pyarrow",
        )
    else:
        joined = cust_c.join(
            per_cust_c, join_type="left_outer", num_partitions=16,
            on=("c_custkey",), right_on=("o_custkey",),
        )

    def fin(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t.column("n_orders"), pa.scalar(0, pa.int64()))
        c = pc.coalesce(
            t.column("c_sum").cast(pa.int64()), pa.scalar(0, pa.int64())
        )
        spent = np.asarray(c).astype(np.int64) / 100.0
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "n_orders": pc.cast(n, pa.int64()),
                "total_spent": pa.array(spent, pa.float64()),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow").sort("c_custkey")


def orders_rollup(sf_dir: str) -> "ray.data.Dataset":
    """ROLLUP aggregate (GROUP BY ROLLUP(year, priority)): order count
    and revenue at three grains — (year, priority), (year, ALL) and the
    grand total (-1, ALL). The finest grain is a distributed
    partial-then-final aggregation (≤ |years|·|priorities| groups); the
    coarser grains re-aggregate THAT tiny result inside one map_batches
    on a single block — never a second pass over orders. Sentinels
    (-1 / 'ALL') instead of SQL NULLs keep the hash compare
    null-ordering-free."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        # exact int64 cents (see events_rfm: ulp-stable vs the oracle)
        c = np.floor(
            col_np(t, "o_totalprice").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
                "c": pa.array(c, pa.int64()),
            }
        )

    fine = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_year", "o_orderpriority"])
        .aggregate(
            Sum("c", alias_name="c_sum"),
            Count(alias_name="n_orders"),
        )
    )

    def roll(t: pa.Table) -> pa.Table:
        lvl1 = t.group_by("o_year").aggregate(
            [("c_sum", "sum"), ("n_orders", "sum")]
        )
        lvl1 = pa.table(
            {
                "o_year": lvl1.column("o_year"),
                "o_orderpriority": pa.array(["ALL"] * len(lvl1)),
                "c_sum": lvl1.column("c_sum_sum"),
                "n_orders": lvl1.column("n_orders_sum"),
            }
        )
        total = pa.table(
            {
                "o_year": pa.array([-1], pa.int64()),
                "o_orderpriority": pa.array(["ALL"]),
                "c_sum": pa.array(
                    [pc.sum(t.column("c_sum")).as_py() or 0], pa.int64()
                ),
                "n_orders": pa.array(
                    [pc.sum(t.column("n_orders")).as_py() or 0], pa.int64()
                ),
            }
        )
        out = pa.concat_tables(
            [t.select(["o_year", "o_orderpriority", "c_sum", "n_orders"]),
             lvl1, total]
        )
        return pa.table(
            {
                "o_year": out.column("o_year"),
                "o_orderpriority": out.column("o_orderpriority"),
                "sum_price": pa.array(
                    np.asarray(out.column("c_sum")).astype(np.int64)
                    / 100.0,
                    pa.float64(),
                ),
                "n_orders": out.column("n_orders"),
            }
        )

    return (
        fine.repartition(1)
        .map_batches(roll, batch_format="pyarrow")
        .sort(["o_year", "o_orderpriority"])
    )


def events_transitions(sf_dir: str) -> "ray.data.Dataset":
    """First-order event-type transition matrix over per-user event
    sequences (ordered by ts, event_id) → (from_type, to_type, n) —
    the Markov-chain table behavioral analytics starts from.

    Scale shape: events hash-bucketed by user (256 coarse buckets, so
    every user's sequence is co-located without a per-user map_groups),
    each bucket sorts its users' events and counts adjacent pairs
    vectorized; the final groupby key space is |types|²."""
    from ray.data.aggregate import Sum

    from .util import _mix_to_bucket

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", pa.array(
            _mix_to_bucket([col_np(t, "user_id").astype(np.int64)], 256)
        ))

    def pairs_of_block(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"u": col_np(g, "user_id"),
             "ts": g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
             "eid": col_np(g, "event_id"),
             "et": np.asarray(g.column("event_type"), dtype=object)}
        ).sort_values(["u", "ts", "eid"], kind="stable")
        same = df["u"].to_numpy()[:-1] == df["u"].to_numpy()[1:]
        frm = df["et"].to_numpy()[:-1][same]
        to = df["et"].to_numpy()[1:][same]
        cnt = pd.DataFrame({"f": frm, "t": to}).value_counts().reset_index(
            name="n"
        )
        return pa.table(
            {"from_type": pa.array(cnt["f"].astype(str), pa.string()),
             "to_type": pa.array(cnt["t"].astype(str), pa.string()),
             "n": pa.array(cnt["n"].to_numpy(np.int64))}
        )

    return (
        ev.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_of_block, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])  # |types|² groups — tiny
        .aggregate(Sum("n", alias_name="n"))
        .sort(["from_type", "to_type"])
    )


def events_gaps(sf_dir: str) -> "ray.data.Dataset":
    """Per-user inter-arrival statistics over the (ts, event_id)-ordered
    event sequence → (user_id, n_gaps, min_gap_us, max_gap_us,
    sum_gap_us) — all exact int64 microseconds (the sessionization /
    bot-detection precursor). Users with a single event have no gaps
    and are excluded (matching the SQL lag semantics).

    Scale shape = events_transitions': 256 coarse user-hash buckets
    co-locate each user's events, per-bucket vectorized sort + diff,
    then a bucketed per-user min/max/sum/count reduction."""
    from .util import _mix_to_bucket, bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", pa.array(
            _mix_to_bucket([col_np(t, "user_id").astype(np.int64)], 256)
        ))

    def gaps_of_block(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"u": col_np(g, "user_id"),
             "ts": g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
             "eid": col_np(g, "event_id")}
        ).sort_values(["u", "ts", "eid"], kind="stable")
        u = df["u"].to_numpy()
        ts = df["ts"].to_numpy()
        same = u[:-1] == u[1:]
        gap = (ts[1:] - ts[:-1])[same]
        gu = u[1:][same]
        return pa.table(
            {"user_id": pa.array(gu.astype(np.int64)),
             "gap": pa.array(gap.astype(np.int64))}
        )

    gaps = (
        ev.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(gaps_of_block, batch_format="pyarrow")
    )
    out = bucketed_aggregate(
        gaps, key_cols=["user_id"],
        aggs=[("gap", "count", "n_gaps"), ("gap", "min", "min_gap_us"),
              ("gap", "max", "max_gap_us"), ("gap", "sum", "sum_gap_us")],
    )
    return out.map_batches(
        lambda t: pa.table(
            {c: t.column(c).cast(pa.int64()) for c in
             ["user_id", "n_gaps", "min_gap_us", "max_gap_us",
              "sum_gap_us"]}
        ),
        batch_format="pyarrow",
    ).sort("user_id")


def events_zscore(sf_dir: str) -> "ray.data.Dataset":
    """Windowed anomaly detection: per event type, the z-score of each
    1-hour window's event count against that type's own distribution
    over all its windows → (event_type, window_start, n_events, z).

    Exactness contract: with n windows, S = Σc, Q = Σc² (all exact
    int64), z = (n·c − S) / √(n·Q − S²) — one float expression from
    exact integers, so DuckDB replays the identical doubles (0 when
    the variance term is 0). Scale shape: ONE bucketed (type, window)
    count over events, a per-type scalar reduction (|types| rows —
    broadcast back via ray.put), and a stateless per-batch scoring
    map; nothing driver-side is window- or event-sized."""
    from .util import bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        return pa.table({"event_type": t["event_type"], "wstart_us": hour})

    counts = bucketed_aggregate(
        ev.map_batches(add_window, batch_format="pyarrow"),
        key_cols=["event_type", "wstart_us"],
        aggs=[("event_type", "count", "n_events")],
    ).materialize()

    # per-type sufficient statistics: |event types| rows — bounded by
    # the domain, safe to collect and broadcast
    def sq(t: pa.Table) -> pa.Table:
        c = np.asarray(t.column("n_events"), dtype=np.int64)
        return pa.table(
            {"event_type": t.column("event_type"),
             "one": pa.array(np.ones(len(c), dtype=np.int64)),
             "s": pa.array(c), "q": pa.array(c * c)}
        )

    stats = (
        counts.map_batches(sq, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("q", alias_name="q"),
        )
        .take_all()
    )
    by_type = {
        r["event_type"]: (int(r["n"]), int(r["s"]), int(r["q"]))
        for r in stats
    }
    ref = ray.put(by_type)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        st = ray.get(_ref)
        et = t.column("event_type").to_pylist()
        c = np.asarray(t.column("n_events"), dtype=np.int64)
        z = np.zeros(len(c), dtype=np.float64)
        for i, (ty, ci) in enumerate(zip(et, c)):
            n, s, qq = st[ty]
            den = n * qq - s * s
            if den > 0:
                z[i] = float(n * int(ci) - s) / math.sqrt(float(den))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("wstart_us").cast(pa.timestamp("us")),
                "n_events": t.column("n_events"),
                "z": pa.array(np.round(z, 9), pa.float64()),
            }
        )

    return counts.map_batches(score, batch_format="pyarrow").sort(
        ["event_type", "window_start"]
    )


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """CUBE aggregate (GROUP BY CUBE(status, priority)): order count
    and revenue at all four grains — (status, priority), (status, ALL),
    (ALL, priority) and the grand total. Same scale shape as
    orders_rollup: ONE distributed pass over orders at the finest grain
    (≤ |status|·|priority| groups), then the three coarser grains
    re-aggregate that tiny table inside one single-block map_batches.
    'ALL' sentinels instead of SQL NULLs keep the hash compare
    null-ordering-free."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    # exact int64 cents (see events_rfm: ulp-stable vs the oracle)
    def prep(t: pa.Table) -> pa.Table:
        c = np.floor(
            col_np(t, "o_totalprice").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"o_orderstatus": t["o_orderstatus"],
             "o_orderpriority": t["o_orderpriority"],
             "c": pa.array(c, pa.int64())}
        )

    fine = orders.map_batches(prep, batch_format="pyarrow").groupby(
        ["o_orderstatus", "o_orderpriority"]
    ).aggregate(
        Sum("c", alias_name="c_sum"),
        Count(alias_name="n_orders"),
    )

    def cube(t: pa.Table) -> pa.Table:
        def grain(keys: list[str]) -> pa.Table:
            if keys:
                g = t.group_by(keys).aggregate(
                    [("c_sum", "sum"), ("n_orders", "sum")]
                )
                cols = {
                    "o_orderstatus": (
                        g.column("o_orderstatus")
                        if "o_orderstatus" in keys
                        else pa.array(["ALL"] * len(g))
                    ),
                    "o_orderpriority": (
                        g.column("o_orderpriority")
                        if "o_orderpriority" in keys
                        else pa.array(["ALL"] * len(g))
                    ),
                    "c_sum": g.column("c_sum_sum"),
                    "n_orders": g.column("n_orders_sum"),
                }
                return pa.table(cols)
            return pa.table(
                {
                    "o_orderstatus": pa.array(["ALL"]),
                    "o_orderpriority": pa.array(["ALL"]),
                    "c_sum": pa.array(
                        [pc.sum(t.column("c_sum")).as_py() or 0], pa.int64()
                    ),
                    "n_orders": pa.array(
                        [pc.sum(t.column("n_orders")).as_py() or 0], pa.int64()
                    ),
                }
            )

        out = pa.concat_tables(
            [
                t.select(
                    ["o_orderstatus", "o_orderpriority", "c_sum", "n_orders"]
                ),
                grain(["o_orderstatus"]),
                grain(["o_orderpriority"]),
                grain([]),
            ]
        )
        return pa.table(
            {
                "o_orderstatus": out.column("o_orderstatus"),
                "o_orderpriority": out.column("o_orderpriority"),
                "sum_price": pa.array(
                    np.asarray(out.column("c_sum")).astype(np.int64)
                    / 100.0,
                    pa.float64(),
                ),
                "n_orders": out.column("n_orders"),
            }
        )

    return (
        fine.repartition(1)
        .map_batches(cube, batch_format="pyarrow")
        .sort(["o_orderstatus", "o_orderpriority"])
    )


def events_funnel(sf_dir: str) -> pa.Table:
    """Ordered-funnel analysis (signup → click → purchase): counts
    users whose FIRST events occur in strict temporal order. One
    bucketed min-aggregation over (user, 3 conditional timestamps) —
    per-batch CASE projection keeps nulls out of the min — then a
    one-row scalar reduction. → (n_signup, n_signup_click, n_funnel)."""
    from .util import bucketed_aggregate

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        et = t.column("event_type")
        cols = {"user_id": t.column("user_id")}
        for name, typ in (
            ("t_signup", "signup"), ("t_click", "click"), ("t_purchase", "purchase")
        ):
            cols[name] = pc.if_else(pc.equal(et, typ), ts, pa.scalar(None, ts.type))
        return pa.table(cols)

    firsts = bucketed_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_cols=["user_id"],
        aggs=[("t_signup", "min", "t1"), ("t_click", "min", "t2"),
              ("t_purchase", "min", "t3")],
    )

    def partial(t: pa.Table) -> pa.Table:
        t1 = t.column("t1")
        s1 = pc.is_valid(t1)
        s2 = pc.and_kleene(s1, pc.greater(t.column("t2"), t1))
        s2 = pc.coalesce(s2, pa.scalar(False))
        s3 = pc.and_kleene(s2, pc.greater(t.column("t3"), t.column("t2")))
        s3 = pc.coalesce(s3, pa.scalar(False))
        def cnt(m):
            return np.array([pc.sum(pc.cast(m, pa.int64())).as_py() or 0], dtype=np.int64)
        return table_from_arrays(
            n_signup=cnt(s1), n_signup_click=cnt(s2), n_funnel=cnt(s3)
        )

    agg = firsts.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_signup", alias_name="n_signup"),
        Sum("n_signup_click", alias_name="n_signup_click"),
        Sum("n_funnel", alias_name="n_funnel"),
    )
    return pa.table(
        {
            "n_signup": pa.array([int(agg["n_signup"] or 0)], pa.int64()),
            "n_signup_click": pa.array([int(agg["n_signup_click"] or 0)], pa.int64()),
            "n_funnel": pa.array([int(agg["n_funnel"] or 0)], pa.int64()),
        }
    )


def events_retention(sf_dir: str, max_offset: int = 7) -> "ray.data.Dataset":
    """Cohort retention: users grouped by FIRST-activity date; for each
    (cohort_date, day_offset ≤ max_offset) the distinct users active on
    cohort_date + offset. Two bucketed user-keyed aggregations (first
    date, then per-(cohort, offset, user) distinct) and one small final
    count — the classic retention matrix without ever grouping raw
    events by a data-sized key in Ray's groupby.
    → (cohort_date, day_offset, n_users)."""
    from ray.data.aggregate import Count
    from .util import bucketed_aggregate, bucketed_sum_aggregate, compact_nonempty

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        # day number as int64 — hashable by the bucketed shuffle
        # (date32 is not); converted to a real date only at the end
        day32 = pc.cast(
            pc.cast(pc.floor_temporal(t.column("ts"), unit="day"), pa.date32()),
            pa.int32(),  # date32 casts to int32 only; widen after
        )
        day = pc.cast(day32, pa.int64())
        return pa.table({"user_id": t.column("user_id"), "day": day})

    days = ev.map_batches(to_day, batch_format="pyarrow")
    first = bucketed_aggregate(
        days, key_cols=["user_id"], aggs=[("day", "min", "cohort")]
    )
    joined = _join_ne(
        days, first.rename_columns({"user_id": "u2"}),
        join_type="inner", num_partitions=16,
        on=("user_id",), right_on=("u2",),
    )
    if joined is None:
        return ray.data.from_arrow(pa.table(
            {"cohort_date": pa.array([], pa.timestamp("us")),
             "day_offset": pa.array([], pa.int64()),
             "n_users": pa.array([], pa.int64())}
        ))

    def offset(t: pa.Table, _m=max_offset) -> pa.Table:
        off = pc.subtract(t.column("day"), t.column("cohort"))
        out = pa.table(
            {
                "cohort": t.column("cohort"),
                "day_offset": off,
                "user_id": t.column("user_id"),
            }
        )
        return out.filter(pc.less_equal(out.column("day_offset"), _m))

    triples = bucketed_sum_aggregate(
        joined.map_batches(offset, batch_format="pyarrow"),
        key_cols=["cohort", "day_offset", "user_id"], sum_cols=[],
    )
    counted = (
        triples.groupby(["cohort", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
    )

    def to_date(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_date": pc.cast(
                    pc.cast(pc.cast(t.column("cohort"), pa.int32()), pa.date32()),
                    pa.timestamp("us"),  # DuckDB DATE → pandas datetime64
                ),
                "day_offset": t.column("day_offset"),
                "n_users": t.column("n_users"),
            }
        )

    return (
        counted.map_batches(to_date, batch_format="pyarrow")
        .sort(["cohort_date", "day_offset"])
    )


def events_conversion_window(
    sf_dir: str, window_hours: int = 24
) -> "ray.data.Dataset":
    """Interval (range / banded) join WITHIN the event stream: for
    every ``signup`` event, the count and integer-cents value sum of
    the same user's ``purchase`` events in [ts, ts + window] (bounds
    inclusive) — the conversion-window join every attribution
    pipeline runs, and the banded-join generalization of
    events_asof_latest_order.

    Fully co-partitioned: both roles tagged + unioned, ONE
    groupby(hash bucket of user) co-locates each user's signups with
    their purchases, then per bucket one lexsort + the
    monotone-surrogate searchsorted of events_trailing_counts answers
    every signup's window at once (no per-user Python, no driver
    state). Value sums are int64 cents (floor(value·100)) so no float
    summation order can diverge from the SQL oracle's SUM."""
    ev = _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    win_us = np.int64(window_hours) * 3_600_000_000

    def tag(t: pa.Table) -> pa.Table:
        typ = t["event_type"]
        is_p = pc.equal(typ, "purchase")
        is_s = pc.equal(typ, "signup")
        keep = pc.or_(is_p, is_s)
        t2 = t.filter(keep)
        if t2.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.int8()),
                 "ts_us": pa.array([], pa.int64()),
                 "okey": pa.array([], pa.int64()),
                 "cents": pa.array([], pa.int64())}
            )
        sig = np.asarray(
            pc.equal(t2["event_type"], "signup").combine_chunks()
            if isinstance(t2["event_type"], pa.ChunkedArray)
            else pc.equal(t2["event_type"], "signup")
        )
        val = t2["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        eid = t2["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t2["user_id"].cast(pa.int64()),
                "kind": pa.array(
                    np.where(sig, 1, 0).astype(np.int8), pa.int8()
                ),
                "ts_us": t2["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                # the signup side carries its event_id as the join key;
                # the purchase side carries its value in cents
                "okey": pa.array(
                    np.where(sig, eid, 0).astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    np.where(
                        sig, 0, np.floor(val * 100.0)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    both = ev.map_batches(tag, batch_format="pyarrow")

    def window_block(g: pa.Table, _w=win_us) -> pa.Table:
        empty = pa.table(
            {"signup_id": pa.array([], pa.int64()),
             "n_purchases": pa.array([], pa.int64()),
             "value_cents": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        uid = col_np(g, "user_id").astype(np.int64)
        kind = col_np(g, "kind").astype(np.int8)
        ts = col_np(g, "ts_us").astype(np.int64)
        okey = g.column("okey")
        if isinstance(okey, pa.ChunkedArray):
            okey = okey.combine_chunks()
        okeys = np.nan_to_num(
            okey.to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        ).astype(np.int64)
        cents_col = g.column("cents")
        if isinstance(cents_col, pa.ChunkedArray):
            cents_col = cents_col.combine_chunks()
        cents = np.nan_to_num(
            cents_col.to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0,
        ).astype(np.int64)

        is_e = kind == 0
        ue, te, ce = uid[is_e], ts[is_e], cents[is_e]
        is_o = kind == 1
        uo, to, ko = uid[is_o], ts[is_o], okeys[is_o]
        if len(uo) == 0:
            return empty
        eorder = np.lexsort((te, ue))
        ue, te, ce = ue[eorder], te[eorder], ce[eorder]
        ne = len(ue)
        if ne == 0:
            return pa.table(
                {"signup_id": pa.array(ko, pa.int64()),
                 "n_purchases": pa.array(
                     np.zeros(len(ko), dtype=np.int64), pa.int64()
                 ),
                 "value_cents": pa.array(
                     np.zeros(len(ko), dtype=np.int64), pa.int64()
                 )}
            )
        new_u = np.zeros(ne, dtype=bool)
        new_u[0] = True
        new_u[1:] = ue[1:] != ue[:-1]
        starts = np.flatnonzero(new_u)
        seg_of_e = np.cumsum(new_u).astype(np.int64) - 1
        base_t = te[starts]
        seg_users = ue[starts]
        rel_e = te - base_t[seg_of_e]

        # map each order to its user's event segment (orders for users
        # with no events in this bucket → 0 / 0)
        idx = np.searchsorted(seg_users, uo)
        idxc = np.minimum(idx, len(seg_users) - 1)
        has = seg_users[idxc] == uo
        seg_o = idxc[has]
        rel_lo = to[has] - base_t[seg_o]
        rel_hi = rel_lo + _w

        mx = max(
            int(rel_e.max()) if ne else 0,
            int(rel_hi.max()) if has.any() else 0,
            0,
        )
        B = np.int64(mx) + np.int64(2)
        pref = np.concatenate([[0], np.cumsum(ce)])
        nseg = int(seg_of_e[-1]) + 1
        if nseg * int(B) < (1 << 62):
            s2 = seg_of_e * B + rel_e
            qlo = seg_o * B + np.clip(rel_lo, 0, B - 1)
            qhi = seg_o * B + np.clip(rel_hi, -1, B - 1)
            lo = np.searchsorted(s2, qlo, side="left")
            hi = np.searchsorted(s2, qhi, side="right")
            hi = np.maximum(hi, lo)  # rel_hi < 0 → empty window
        else:  # astronomically wide buckets: per-order fallback
            lo = np.empty(len(seg_o), dtype=np.int64)
            hi = np.empty(len(seg_o), dtype=np.int64)
            ends = np.append(starts[1:], ne)
            for i, (sg, rl, rh) in enumerate(zip(seg_o, rel_lo, rel_hi)):
                a, b = starts[sg], ends[sg]
                lo[i] = a + np.searchsorted(te[a:b], base_t[sg] + rl, "left")
                hi[i] = a + np.searchsorted(te[a:b], base_t[sg] + rh, "right")
            hi = np.maximum(hi, lo)
        n_ev = np.zeros(len(uo), dtype=np.int64)
        v_ct = np.zeros(len(uo), dtype=np.int64)
        n_ev[has] = hi - lo
        v_ct[has] = pref[hi] - pref[lo]
        return pa.table(
            {"signup_id": pa.array(ko, pa.int64()),
             "n_purchases": pa.array(n_ev, pa.int64()),
             "value_cents": pa.array(v_ct, pa.int64())}
        )

    return (
        both.map_batches(_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(window_block, batch_format="pyarrow")
        .materialize()
        .sort("signup_id")
    )


def events_dau_wau(sf_dir: str) -> "ray.data.Dataset":
    """Exact rolling active-user counts → (day, dau, wau): per observed
    event day, the distinct users active that day (DAU) and over the
    trailing 7-day window (WAU) — the activity/stickiness table every
    event warehouse maintains (events_hll_users is the sketched
    cousin; this is the exact one).

    Scale shape: the range-window distinct is turned into a BOUNDED
    static expansion — distinct (user, day) rows (≤ users × days, the
    natural compressed activity table) fan out ×7 into the windows they
    contribute to, then a second bucketed distinct + per-day count.
    Shuffles carry the compressed activity table, never raw events; no
    stage holds per-user state on the driver. The final join restricts
    window ends to OBSERVED days (both sides are |days|-sized)."""
    from .util import bucketed_sum_aggregate, compact_nonempty

    DAY_US = 86_400_000_000
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        ts = col_np(t, "ts").astype("datetime64[us]").view(np.int64)
        day = (ts // DAY_US) * DAY_US
        # map-side combiner: within-batch distinct (Arrow C++ hash)
        part = pa.table(
            {"user_id": t.column("user_id").cast(pa.int64()),
             "day_us": pa.array(day)}
        )
        return part.group_by(["user_id", "day_us"]).aggregate([])

    active = bucketed_sum_aggregate(
        ev.map_batches(to_days, batch_format="pyarrow"),
        key_cols=["user_id", "day_us"], sum_cols=[],
    ).materialize()

    dau = bucketed_sum_aggregate(
        active, key_cols=["day_us"], sum_cols=[], count_col="dau"
    )

    def expand(t: pa.Table) -> pa.Table:
        u = np.repeat(col_np(t, "user_id").astype(np.int64), 7)
        w = np.repeat(col_np(t, "day_us").astype(np.int64), 7)
        w += np.tile(np.arange(7, dtype=np.int64) * DAY_US, t.num_rows)
        return pa.table({"user_id": pa.array(u), "wday_us": pa.array(w)})

    wau = bucketed_sum_aggregate(
        bucketed_sum_aggregate(
            active.map_batches(expand, batch_format="pyarrow"),
            key_cols=["user_id", "wday_us"], sum_cols=[],
        ),
        key_cols=["wday_us"], sum_cols=[], count_col="wau",
    ).map_batches(
        lambda t: pa.table({"day_us": t.column("wday_us"),
                            "wau": t.column("wau").cast(pa.int64())}),
        batch_format="pyarrow",
    )

    joined = _join_ne(
        dau.materialize(), wau.materialize(), join_type="inner",
        num_partitions=8, on=("day_us",),
    )
    if joined is None:
        return ray.data.from_arrow(pa.table(
            {"day": pa.array([], pa.timestamp("us")),
             "dau": pa.array([], pa.int64()),
             "wau": pa.array([], pa.int64())}
        ))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"day": t.column("day_us").cast(pa.timestamp("us")),
             "dau": t.column("dau").cast(pa.int64()),
             "wau": t.column("wau").cast(pa.int64())}
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("day")


def events_session_hist(sf_dir: str) -> "ray.data.Dataset":
    """Session-length histogram → (session_len, n_sessions): how many
    30-minute-gap sessions contain exactly N events — the shape report
    behind engagement dashboards (events_sessions is the per-session
    table; this is its distribution). One bucketed count over the
    session table's n_events column (session-length cardinality is
    tiny, but the SESSION table is user×session-sized, so the combiner
    collapses it batch-side before any shuffle)."""
    from .util import bucketed_aggregate

    sess = events_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        n = col_np(t, "n_events").astype(np.int64)
        from .util import sparse_sum_reduce

        k, c = sparse_sum_reduce(n, np.ones(len(n), dtype=np.int64))
        return table_from_arrays(session_len=k, n_sessions=c)

    agg = bucketed_aggregate(
        sess.map_batches(partial, batch_format="pyarrow"),
        key_cols=["session_len"],
        aggs=[("n_sessions", "sum", "n_sessions")],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"session_len": t.column("session_len").cast(pa.int64()),
             "n_sessions": t.column("n_sessions").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).sort("session_len")


def events_concurrency(sf_dir: str) -> "ray.data.Dataset":
    """Active-session concurrency curve → (t, delta, user_id,
    session_id, concurrency): +1/−1 boundary events at each session's
    start/end (30-minute-gap sessions), globally time-ordered (ties:
    opens before closes, then user, then session), with the running
    number of concurrently open sessions AFTER each boundary — the
    load curve capacity planning reads off an events warehouse.

    Scale shape: boundaries are built batch-side from the sessionized
    table (2 rows per session); ONE global sort fixes the sweep order;
    the running count is util.exclusive_prefix_sum — the distributed
    two-phase scan (per-block sums → P-integer driver fold → parallel
    relabel), so no sequential pass over the boundary stream exists
    anywhere."""
    from .util import exclusive_prefix_sum

    sess = events_sessionize(sf_dir)

    def boundaries(t: pa.Table) -> pa.Table:
        u = col_np(t, "user_id").astype(np.int64)
        sid = col_np(t, "session_id").astype(np.int64)
        st = col_np(t, "session_start").astype("datetime64[us]").view(np.int64)
        en = col_np(t, "session_end").astype("datetime64[us]").view(np.int64)
        return pa.table(
            {"t_us": pa.array(np.concatenate([st, en])),
             "delta": pa.array(np.concatenate(
                 [np.ones(len(u), np.int64), -np.ones(len(u), np.int64)])),
             "user_id": pa.array(np.concatenate([u, u])),
             "session_id": pa.array(np.concatenate([sid, sid]))}
        )

    ordered = (
        sess.map_batches(boundaries, batch_format="pyarrow")
        .sort(["t_us", "delta", "user_id", "session_id"],
              descending=[False, True, False, False])
    )
    scanned = exclusive_prefix_sum(ordered, "delta", out_col="run")

    def finish(t: pa.Table) -> pa.Table:
        run = col_np(t, "run").astype(np.int64)
        d = col_np(t, "delta").astype(np.int64)
        return pa.table(
            {"t": t.column("t_us").cast(pa.timestamp("us")),
             "delta": pa.array(d),
             "user_id": t.column("user_id").cast(pa.int64()),
             "session_id": t.column("session_id").cast(pa.int64()),
             "concurrency": pa.array(run + d)}
        )

    return scanned.map_batches(finish, batch_format="pyarrow").sort(
        ["t", "delta", "user_id", "session_id"],
        descending=[False, True, False, False],
    )


def q6_forecast(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6-shaped revenue forecast: ONE filtered scalar aggregate
    over lineitem → (revenue). The scan-efficiency benchmark shape —
    the read is pruned to the 4 referenced columns and every batch
    reduces to a single partial before the one-row final sum (nothing
    but P floats ever shuffles)."""
    import datetime

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )
    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        f = t.filter(m)
        rev = pc.sum(
            pc.multiply(f["l_extendedprice"], f["l_discount"])
        ).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="s")
    )
    return ray.data.from_arrow(
        pa.table({"revenue": pa.array(
            [round(float(agg["s"] or 0.0), 2)], pa.float64())})
    )


def q15_top_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q15-style top supplier → (s_suppkey, s_name,
    total_revenue): suppliers whose three-month shipped revenue equals
    the global maximum (Q15's revenue view + correlated MAX), revenue
    in exact integer cents so Ray's and DuckDB's different float
    reduction orders cannot disagree at the argmax boundary.

    Scale shape: lineitem is filtered and projected at the read and
    collapses per batch to ≤|suppliers| partial cent sums
    (sparse_sum_reduce); the per-supplier table is bucket-aggregated
    (supplier cardinality is unbounded at web scale), the MAX is one
    scalar aggregate over it, and the winner filter + name join ship
    only |winners| rows."""
    from ray.data.aggregate import Max

    from .util import bucketed_aggregate, compact_nonempty, sparse_sum_reduce

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-04-01")

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        cents = np.floor(
            (col_np(t, "l_extendedprice").astype(np.float64)[keep]
             * (1.0 - col_np(t, "l_discount").astype(np.float64)[keep]))
            * 100.0 + 0.5
        ).astype(np.int64)
        k, s = sparse_sum_reduce(
            col_np(t, "l_suppkey").astype(np.int64)[keep], cents
        )
        return table_from_arrays(l_suppkey=k, rev=s)

    per_supp = compact_nonempty(bucketed_aggregate(
        _read(
            sf_dir, "lineitem",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
        ).map_batches(lfilt, batch_format="pyarrow"),
        key_cols=["l_suppkey"], aggs=[("rev", "sum", "rev")],
    ))
    empty = pa.table(
        {"s_suppkey": pa.array([], pa.int64()),
         "s_name": pa.array([], pa.string()),
         "total_revenue": pa.array([], pa.float64())}
    )
    if per_supp is None:
        return ray.data.from_arrow(empty)
    best = int(per_supp.aggregate(Max("rev", alias_name="m"))["m"])

    def winners(t: pa.Table, _best=best) -> pa.Table:
        keep = col_np(t, "rev").astype(np.int64) == _best
        return table_from_arrays(
            l_suppkey=col_np(t, "l_suppkey").astype(np.int64)[keep],
            rev=col_np(t, "rev").astype(np.int64)[keep],
        )

    top = compact_nonempty(
        per_supp.map_batches(winners, batch_format="pyarrow")
    )
    if top is None:
        return ray.data.from_arrow(empty)
    j = _join_ne(
        top, _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        join_type="inner", num_partitions=4,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s_suppkey": pa.array(
                col_np(t, "l_suppkey").astype(np.int64), pa.int64()),
             "s_name": t.column("s_name"),
             "total_revenue": pa.array(
                 col_np(t, "rev").astype(np.float64) / 100.0,
                 pa.float64())}
        )

    return j.map_batches(finalize, batch_format="pyarrow").sort("s_suppkey")


def q12_priority(sf_dir: str, days: int = 60) -> "ray.data.Dataset":
    """TPC-H-Q12-style late-shipment priority census → (l_linestatus,
    high_line_count, low_line_count) over lineitems shipped more than
    ``days`` days after their order date in 1997 (the synth tables have
    no shipmode/commitdate, so the Q12 shape — fact⋈dim join feeding
    two conditional counts per tiny group — keys on linestatus and
    classifies by o_orderpriority exactly like Q12's CASE arms).

    Scale shape: both reads are projected; the join is
    hash-partitioned; each batch collapses to ≤|linestatus| rows of
    exact integer indicator sums before the tiny groupby."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1998-01-01")
    lateness = np.timedelta64(days, "D")

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            l_orderkey=col_np(t, "l_orderkey").astype(np.int64)[keep],
            ship=ts[keep].astype("datetime64[us]").astype(np.int64),
            l_linestatus=t.column("l_linestatus")
            .to_numpy(zero_copy_only=False)[keep],
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_linestatus"],
    ).map_batches(lfilt, batch_format="pyarrow")

    def ofilt(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        return table_from_arrays(
            o_orderkey=col_np(t, "o_orderkey").astype(np.int64),
            odate=t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
            high=np.isin(pr, ("1-URGENT", "2-HIGH")).astype(np.int64),
        )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(ofilt, batch_format="pyarrow")

    j = _join_ne(
        li, orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    if j is None:
        return ray.data.from_arrow(pa.table(
            {"l_linestatus": pa.array([], pa.string()),
             "high_line_count": pa.array([], pa.int64()),
             "low_line_count": pa.array([], pa.int64())}
        ))
    late_us = int(lateness.astype("timedelta64[us]").astype(np.int64))

    def partial(t: pa.Table, _lus=late_us) -> pa.Table:
        late = (
            col_np(t, "ship").astype(np.int64)
            - col_np(t, "odate").astype(np.int64)
        ) > _lus
        st = t.column("l_linestatus").to_numpy(zero_copy_only=False)[late]
        hi_ = col_np(t, "high").astype(np.int64)[late]
        ks, inv = np.unique(st, return_inverse=True)
        h = np.zeros(len(ks), dtype=np.int64)
        n = np.zeros(len(ks), dtype=np.int64)
        np.add.at(h, inv, hi_)
        np.add.at(n, inv, 1)
        return pa.table(
            {"l_linestatus": pa.array(ks.astype(str), pa.string()),
             "h": pa.array(h), "lo_": pa.array(n - h)}
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_linestatus")  # ≤2 groups — tiny
        .aggregate(Sum("h", alias_name="high_line_count"),
                   Sum("lo_", alias_name="low_line_count"))
        .sort("l_linestatus")
    )


def q22_idle_customers(sf_dir: str, codes=(1, 3, 5, 7, 9),
                       cutoff: str = "2000-01-01") -> (
        "ray.data.Dataset"):
    """TPC-H-Q22-style global-sales-opportunity census → (cntrycode,
    numcust, totacctbal): customers from the given country codes
    (cntrycode := c_nationkey % 10 — the synth tables have no phone
    column) whose account balance exceeds the average POSITIVE balance
    of that population AND who placed no order since ``cutoff`` (the
    anti-join window Q22 phrases as 'no orders'). Balances compare
    in exact integer cents (bal·N > total, cross-multiplied) so the
    boundary membership is bit-identical to the oracle.

    Scale shape: pass 1 collapses every customer batch to two scalars
    (positive-cent sum, count); pass 2 re-reads customers, applies the
    exact predicate batch-side, and resolves 'has no orders' with the
    tagged-union bucketed anti-join (no broadcast of either side); the
    final groupby holds ≤|codes| rows."""
    from ray.data.aggregate import Sum

    from .util import bucketed_aggregate, sparse_sum_reduce

    code_arr = np.asarray(sorted(codes), dtype=np.int64)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey",
                                              "c_acctbal"])

    def stats(t: pa.Table, _c=code_arr) -> pa.Table:
        nk = col_np(t, "c_nationkey").astype(np.int64) % 10
        cents = np.floor(
            col_np(t, "c_acctbal").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        keep = np.isin(nk, _c) & (cents > 0)
        return pa.table(
            {"s": pa.array([int(cents[keep].sum())], pa.int64()),
             "n": pa.array([int(keep.sum())], pa.int64())}
        )

    agg = cust.map_batches(stats, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    tot, n_pos = int(agg["s"] or 0), int(agg["n"] or 0)

    def rich(t: pa.Table, _c=code_arr, _tot=tot, _n=n_pos) -> pa.Table:
        nk = col_np(t, "c_nationkey").astype(np.int64) % 10
        cents = np.floor(
            col_np(t, "c_acctbal").astype(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        keep = np.isin(nk, _c) & (cents * _n > _tot)
        k = col_np(t, "c_custkey").astype(np.int64)[keep]
        return table_from_arrays(
            key=k, code=nk[keep], bal=cents[keep],
            is_cust=np.ones(len(k), dtype=np.int64),
            has_order=np.zeros(len(k), dtype=np.int64),
        )

    cut = np.datetime64(cutoff)

    def tag_order(t: pa.Table, _cut=cut) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        k = np.unique(
            col_np(t, "o_custkey").astype(np.int64)[ts >= _cut]
        )
        z = np.zeros(len(k), dtype=np.int64)
        return table_from_arrays(
            key=k, code=z, bal=z, is_cust=z,
            has_order=np.ones(len(k), dtype=np.int64),
        )

    both = cust.map_batches(rich, batch_format="pyarrow").union(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(tag_order, batch_format="pyarrow")
    )
    per_key = bucketed_aggregate(
        both, key_cols=["key"],
        aggs=[("code", "max", "code"), ("bal", "max", "bal"),
              ("is_cust", "max", "is_cust"),
              ("has_order", "max", "has_order")],
    )

    def fold(t: pa.Table) -> pa.Table:
        sel = (
            (col_np(t, "is_cust").astype(np.int64) == 1)
            & (col_np(t, "has_order").astype(np.int64) == 0)
        )
        code = col_np(t, "code").astype(np.int64)[sel]
        bal = col_np(t, "bal").astype(np.int64)[sel]
        k, s = sparse_sum_reduce(code, bal)
        _, c = np.unique(code, return_counts=True)
        return pa.table(
            {"cntrycode": pa.array(k, pa.int64()),
             "nc": pa.array(c.astype(np.int64)),
             "tb": pa.array(s, pa.int64())}
        )

    out = (
        per_key.map_batches(fold, batch_format="pyarrow")
        .groupby("cntrycode")  # ≤|codes| groups — tiny
        .aggregate(Sum("nc", alias_name="numcust"),
                   Sum("tb", alias_name="tb"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cntrycode": pa.array([], pa.int64()),
                 "numcust": pa.array([], pa.int64()),
                 "totacctbal": pa.array([], pa.float64())}
            )
        return pa.table(
            {"cntrycode": t.column("cntrycode"),
             "numcust": t.column("numcust"),
             "totacctbal": pa.array(
                 col_np(t, "tb").astype(np.float64) / 100.0,
                 pa.float64())}
        )

    return out.map_batches(finalize, batch_format="pyarrow").sort(
        "cntrycode"
    )


def q21_holdup(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q21-style waiting-order blame census → (s_suppkey, s_name,
    numwait): for every order touching ≥2 distinct suppliers, the
    UNIQUELY latest-shipping supplier (strict argmax of per-supplier
    max shipdate; ties blame nobody — Q21's exists/not-exists pair) is
    charged one wait. The synth tables have no commit/receipt dates,
    so lateness is the within-order shipdate order — the join/semi/anti
    SHAPE is Q21's.

    Scale shape: per-(order, supplier) max shipdate and the per-order
    (max, tie-count, supplier-count) are BUCKETED aggregates
    (order-cardinality keys never feed Ray's groupby raw); the blame
    join is hash-partitioned on the composite key via the same
    tagged-union exchange; the output groupby holds |suppliers| rows
    bucketed."""
    from .util import (
        bucketed_aggregate,
        compact_nonempty,
        sparse_sum_reduce,
    )

    def lproj(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            o=col_np(t, "l_orderkey").astype(np.int64),
            s=col_np(t, "l_suppkey").astype(np.int64),
            ship=t.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(lproj, batch_format="pyarrow")

    # per-(order, supplier) latest shipment — E-cardinality → bucketed
    os_max = compact_nonempty(bucketed_aggregate(
        li, key_cols=["o", "s"], aggs=[("ship", "max", "smax")],
    ))
    empty = pa.table(
        {"s_suppkey": pa.array([], pa.int64()),
         "s_name": pa.array([], pa.string()),
         "numwait": pa.array([], pa.int64())}
    )
    if os_max is None:
        return ray.data.from_arrow(empty)

    # per-order: latest shipment + distinct-supplier count
    o_stats = compact_nonempty(bucketed_aggregate(
        os_max.map_batches(
            lambda t: table_from_arrays(
                o=col_np(t, "o").astype(np.int64),
                smax=col_np(t, "smax").astype(np.int64),
                ns=np.ones(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        ),
        key_cols=["o"],
        aggs=[("smax", "max", "omax"), ("ns", "sum", "n_supp")],
    ))
    if o_stats is None:
        return ray.data.from_arrow(empty)

    probe = os_max.join(
        o_stats.rename_columns({"o": "o2"}),
        join_type="inner", num_partitions=8, on=("o",), right_on=("o2",),
    )

    def at_max(t: pa.Table) -> pa.Table:
        hit = (
            col_np(t, "smax").astype(np.int64)
            == col_np(t, "omax").astype(np.int64)
        )
        multi = col_np(t, "n_supp").astype(np.int64) >= 2
        keep = hit & multi
        return table_from_arrays(
            o=col_np(t, "o").astype(np.int64)[keep],
            s=col_np(t, "s").astype(np.int64)[keep],
        )

    # suppliers tied at the order max; blame only unique argmaxes
    tied = compact_nonempty(bucketed_aggregate(
        probe.map_batches(at_max, batch_format="pyarrow")
        .map_batches(
            lambda t: table_from_arrays(
                o=col_np(t, "o").astype(np.int64),
                s=col_np(t, "s").astype(np.int64),
                one=np.ones(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        ),
        key_cols=["o"],
        aggs=[("one", "sum", "n_tied"), ("s", "max", "s")],
    ))
    if tied is None:
        return ray.data.from_arrow(empty)

    def blame(t: pa.Table) -> pa.Table:
        keep = col_np(t, "n_tied").astype(np.int64) == 1
        s = col_np(t, "s").astype(np.int64)[keep]
        k, n = sparse_sum_reduce(s, np.ones(len(s), dtype=np.int64))
        return table_from_arrays(s=k, w=n)

    waits = compact_nonempty(bucketed_aggregate(
        tied.map_batches(blame, batch_format="pyarrow"),
        key_cols=["s"], aggs=[("w", "sum", "numwait")],
    ))
    if waits is None:
        return ray.data.from_arrow(empty)

    j = _join_ne(
        waits, _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        join_type="inner", num_partitions=4,
        on=("s",), right_on=("s_suppkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s_suppkey": pa.array(
                col_np(t, "s").astype(np.int64), pa.int64()),
             "s_name": t.column("s_name"),
             "numwait": pa.array(
                 col_np(t, "numwait").astype(np.int64), pa.int64())}
        )

    return j.map_batches(finalize, batch_format="pyarrow").sort(
        ["numwait", "s_suppkey"], descending=[True, False]
    )


def q8_market_share(
    sf_dir: str, region: str = "EUROPE", ptype: str = "ECONOMY",
    nation: str = "NATION_3",
) -> "ray.data.Dataset":
    """TPC-H-Q8-style national market share → (o_year, mkt_share):
    the fraction of a region's revenue in one part type supplied by
    one nation, per order year, over a two-year window. Revenue in
    exact integer cents (the SAME floor(x·100+0.5) expression as the
    oracle) so numerator/denominator are bit-identical on both sides
    before the one final division.

    Scale shape (the 100-TB discipline): region+nation (O(25)) are
    driver-resolved constants closed over by the batch fns; part is
    pre-filtered to the type and hash-joined; orders pre-filters the
    date window and projects (okey, custkey, year); customer collapses
    to an in-region key set via its nation column (hash join);
    supplier ships only (s_suppkey, s_nationkey). Every batch then
    collapses to ≤|years| (num, den) partial cent sums before a tiny
    groupby."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty, sparse_sum_reduce

    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1997-01-01")

    reg = to_pandas_typed(_read(sf_dir, "region"))
    rkeys = set(reg[reg.r_name == region].r_regionkey.astype(int))
    nat = to_pandas_typed(_read(sf_dir, "nation"))
    in_region = np.sort(
        nat[nat.n_regionkey.astype(int).isin(rkeys)]
        .n_nationkey.to_numpy().astype(np.int64)
    )
    nkey_rows = nat[nat.n_name == nation].n_nationkey.astype(int)
    target_nk = int(nkey_rows.iloc[0]) if len(nkey_rows) else -1

    def pfilt(t: pa.Table) -> pa.Table:
        keep = (
            t.column("p_type").to_numpy(zero_copy_only=False) == ptype
        )
        return table_from_arrays(
            p_partkey=col_np(t, "p_partkey").astype(np.int64)[keep]
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]) \
        .map_batches(pfilt, batch_format="pyarrow")

    def ofilt(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            o_orderkey=col_np(t, "o_orderkey").astype(np.int64)[keep],
            o_custkey=col_np(t, "o_custkey").astype(np.int64)[keep],
            o_year=(ts[keep].astype("datetime64[Y]").astype(np.int64)
                    + 1970),
        )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ofilt, batch_format="pyarrow")

    def cfilt(t: pa.Table) -> pa.Table:
        nk = col_np(t, "c_nationkey").astype(np.int64)
        keep = np.isin(nk, in_region)
        return table_from_arrays(
            c_custkey=col_np(t, "c_custkey").astype(np.int64)[keep]
        )

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cfilt, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def lproj(t: pa.Table) -> pa.Table:
        cents = np.floor(
            (col_np(t, "l_extendedprice").astype(np.float64)
             * (1.0 - col_np(t, "l_discount").astype(np.float64)))
            * 100.0 + 0.5
        ).astype(np.int64)
        return table_from_arrays(
            l_orderkey=col_np(t, "l_orderkey").astype(np.int64),
            l_partkey=col_np(t, "l_partkey").astype(np.int64),
            l_suppkey=col_np(t, "l_suppkey").astype(np.int64),
            rev=cents,
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(lproj, batch_format="pyarrow")

    empty = pa.table(
        {"o_year": pa.array([], pa.int64()),
         "mkt_share": pa.array([], pa.float64())}
    )
    part_c = compact_nonempty(part)
    orders_c = compact_nonempty(orders)
    cust_c = compact_nonempty(cust)
    if part_c is None or orders_c is None or cust_c is None:
        return ray.data.from_arrow(empty)

    oc = orders_c.join(
        cust_c, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"])
    li_c = compact_nonempty(li)
    oc_c = compact_nonempty(oc)
    supp_c = compact_nonempty(supp)
    if li_c is None or oc_c is None or supp_c is None:
        return ray.data.from_arrow(empty)
    j = _join_ne(
        _join_ne(
            _join_ne(li_c, part_c, join_type="inner", num_partitions=8,
                     on=("l_partkey",), right_on=("p_partkey",)),
            oc_c, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        ),
        supp_c, join_type="inner", num_partitions=8,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)

    def partial(t: pa.Table) -> pa.Table:
        yr = col_np(t, "o_year").astype(np.int64)
        rev = col_np(t, "rev").astype(np.int64)
        hit = col_np(t, "s_nationkey").astype(np.int64) == target_nk
        k1, num = sparse_sum_reduce(yr, np.where(hit, rev, 0))
        k2, den = sparse_sum_reduce(yr, rev)
        assert np.array_equal(k1, k2)
        return table_from_arrays(o_year=k1, num=num, den=den)

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")  # |years| groups — tiny
        .aggregate(Sum("num", alias_name="num"),
                   Sum("den", alias_name="den"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        num = col_np(t, "num").astype(np.float64)
        den = col_np(t, "den").astype(np.float64)
        share = np.array(
            [round(n / d, 6) if d else 0.0 for n, d in zip(num, den)],
            dtype=np.float64,
        )
        return pa.table(
            {"o_year": pa.array(
                col_np(t, "o_year").astype(np.int64), pa.int64()),
             "mkt_share": pa.array(share, pa.float64())}
        )

    out = compact_nonempty(
        agg.map_batches(finalize, batch_format="pyarrow")
    )
    return ray.data.from_arrow(empty) if out is None else out.sort("o_year")


def q9_product_profit(
    sf_dir: str, name_sub: str = "widget"
) -> "ray.data.Dataset":
    """TPC-H-Q9-style product-type profit → (nation, o_year, profit):
    per supplier-nation and order year, Σ(revenue − supply cost) over
    lineitems of parts whose name contains a substring. The synth
    tables have no partsupp, so supply cost is proxied by HALF the
    part's retail price per unit — floor(p_retailprice·50+0.5) cents,
    the exact-integer expression mirrored in the oracle (profit sums
    are order-insensitive int64 on both sides).

    Scale shape: part pre-filters the name predicate and ships only
    (partkey, half-retail-cents); supplier ships (suppkey, nationkey);
    orders ships (okey, year); each joined batch collapses to
    ≤|nations|·|years| partial sums via an integer composite key
    before the tiny groupby; nation names resolve from an O(25)
    driver constant."""
    from ray.data.aggregate import Sum

    from .util import compact_nonempty, sparse_sum_reduce

    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )

    def pfilt(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pandas()
        keep = names.str.contains(name_sub, regex=False).to_numpy()
        half = np.floor(
            col_np(t, "p_retailprice").astype(np.float64)[keep]
            * 50.0 + 0.5
        ).astype(np.int64)
        return table_from_arrays(
            p_partkey=col_np(t, "p_partkey").astype(np.int64)[keep],
            half_retail=half,
        )

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]
    ).map_batches(pfilt, batch_format="pyarrow")

    def oproj(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        return table_from_arrays(
            o_orderkey=col_np(t, "o_orderkey").astype(np.int64),
            o_year=(ts.astype("datetime64[Y]").astype(np.int64) + 1970),
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(oproj, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def lproj(t: pa.Table) -> pa.Table:
        cents = np.floor(
            (col_np(t, "l_extendedprice").astype(np.float64)
             * (1.0 - col_np(t, "l_discount").astype(np.float64)))
            * 100.0 + 0.5
        ).astype(np.int64)
        return table_from_arrays(
            l_orderkey=col_np(t, "l_orderkey").astype(np.int64),
            l_partkey=col_np(t, "l_partkey").astype(np.int64),
            l_suppkey=col_np(t, "l_suppkey").astype(np.int64),
            qty=col_np(t, "l_quantity").astype(np.int64),
            rev=cents,
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    ).map_batches(lproj, batch_format="pyarrow")

    empty = pa.table(
        {"nation": pa.array([], pa.string()),
         "o_year": pa.array([], pa.int64()),
         "profit": pa.array([], pa.float64())}
    )
    part_c = compact_nonempty(part)
    li_c = compact_nonempty(li)
    supp_c = compact_nonempty(supp)
    orders_c = compact_nonempty(orders)
    if part_c is None or li_c is None or supp_c is None \
            or orders_c is None:
        return ray.data.from_arrow(empty)

    j = _join_ne(
        _join_ne(
            _join_ne(li_c, part_c, join_type="inner", num_partitions=8,
                     on=("l_partkey",), right_on=("p_partkey",)),
            supp_c, join_type="inner", num_partitions=8,
            on=("l_suppkey",), right_on=("s_suppkey",),
        ),
        orders_c, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)

    def partial(t: pa.Table) -> pa.Table:
        profit = (
            col_np(t, "rev").astype(np.int64)
            - col_np(t, "half_retail").astype(np.int64)
            * col_np(t, "qty").astype(np.int64)
        )
        key = (col_np(t, "s_nationkey").astype(np.int64) * 10_000
               + col_np(t, "o_year").astype(np.int64))
        k, s = sparse_sum_reduce(key, profit)
        return table_from_arrays(k=k, profit=s)

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("k")  # |nations|·|years| groups — tiny
        .aggregate(Sum("profit", alias_name="profit"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        k = col_np(t, "k").astype(np.int64)
        names = [nname[int(x)] for x in k // 10_000]
        return pa.table(
            {"nation": pa.array(names, pa.string()),
             "o_year": pa.array(k % 10_000, pa.int64()),
             "profit": pa.array(
                 col_np(t, "profit").astype(np.int64) / 100.0,
                 pa.float64())}
        )

    out = compact_nonempty(
        agg.map_batches(finalize, batch_format="pyarrow")
    )
    if out is None:
        return ray.data.from_arrow(empty)
    return out.sort(["nation", "o_year"], descending=[False, True])


def q2_min_cost_supplier(
    sf_dir: str, region: str = "EUROPE", ptype: str = "STANDARD",
    max_size: int = 25,
) -> "ray.data.Dataset":
    """TPC-H-Q2-style minimum-cost supplier → (s_acctbal, s_name,
    n_name, p_partkey, p_name, supplycost): for every part of one
    type/size class, the in-region suppliers whose supply cost equals
    the part's minimum (Q2's correlated MIN subquery). The synth
    tables have no partsupp, so the supply relation is derived from
    lineitem: cost(part, supp) = MIN shipped extendedprice in exact
    integer cents, so the argmin equality cannot be split by float
    reduction order.

    Scale shape: the (part, supp) supply relation is a bucketed Arrow
    min-aggregate over the projected lineitem stream (E-sized, never
    driver-resident); the in-region supplier side and the filtered
    part side are hash joins; the correlated MIN is a second bucketed
    aggregate keyed on part, joined back and matched by integer
    equality — the only driver state is the O(25) nation map."""
    from .util import bucketed_aggregate, compact_nonempty

    reg = to_pandas_typed(_read(sf_dir, "region"))
    rkeys = set(reg[reg.r_name == region].r_regionkey.astype(int))
    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nat = nat[nat.n_regionkey.astype(int).isin(rkeys)]
    in_region = np.sort(nat.n_nationkey.to_numpy().astype(np.int64))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )

    def lproj(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            partkey=col_np(t, "l_partkey").astype(np.int64),
            suppkey=col_np(t, "l_suppkey").astype(np.int64),
            cost=np.floor(
                col_np(t, "l_extendedprice").astype(np.float64)
                * 100.0 + 0.5
            ).astype(np.int64),
        )

    supply = bucketed_aggregate(
        _read(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        ).map_batches(lproj, batch_format="pyarrow"),
        key_cols=["partkey", "suppkey"],
        aggs=[("cost", "min", "cost")],
    )

    def sfilt(t: pa.Table) -> pa.Table:
        nk = col_np(t, "s_nationkey").astype(np.int64)
        keep = np.isin(nk, in_region)
        names = [nname[int(x)] for x in nk[keep]]
        return pa.table(
            {"s_suppkey": pa.array(
                col_np(t, "s_suppkey").astype(np.int64)[keep],
                pa.int64()),
             "s_name": t.column("s_name").filter(pa.array(keep)),
             "s_acctbal": pa.array(
                 col_np(t, "s_acctbal").astype(np.float64)[keep],
                 pa.float64()),
             "n_name": pa.array(names, pa.string())}
        )

    eu = _read(
        sf_dir, "supplier",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    ).map_batches(sfilt, batch_format="pyarrow")

    def pfilt(t: pa.Table) -> pa.Table:
        keep = (
            (t.column("p_type").to_numpy(zero_copy_only=False) == ptype)
            & (col_np(t, "p_size").astype(np.int64) <= max_size)
        )
        return pa.table(
            {"p_partkey": pa.array(
                col_np(t, "p_partkey").astype(np.int64)[keep],
                pa.int64()),
             "p_name": t.column("p_name").filter(pa.array(keep))}
        )

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_type",
                                 "p_size"]
    ).map_batches(pfilt, batch_format="pyarrow")

    empty = pa.table(
        {"s_acctbal": pa.array([], pa.float64()),
         "s_name": pa.array([], pa.string()),
         "n_name": pa.array([], pa.string()),
         "p_partkey": pa.array([], pa.int64()),
         "p_name": pa.array([], pa.string()),
         "supplycost": pa.array([], pa.float64())}
    )
    eu_c = compact_nonempty(eu)
    part_c = compact_nonempty(part)
    supply_c = compact_nonempty(supply)
    if eu_c is None or part_c is None or supply_c is None:
        return ray.data.from_arrow(empty)

    cand_c = _join_ne(
        _join_ne(supply_c, eu_c, join_type="inner", num_partitions=8,
                 on=("suppkey",), right_on=("s_suppkey",)),
        part_c, join_type="inner", num_partitions=8,
        on=("partkey",), right_on=("p_partkey",),
    )
    if cand_c is None:
        return ray.data.from_arrow(empty)
    cand_c = compact_nonempty(cand_c)
    if cand_c is None:
        return ray.data.from_arrow(empty)
    cand_c = cand_c.materialize()

    mins = bucketed_aggregate(
        cand_c.select_columns(["partkey", "cost"]),
        key_cols=["partkey"], aggs=[("cost", "min", "mincost")],
    )

    j = cand_c.join(
        compact_nonempty(mins), join_type="inner", num_partitions=8,
        on=("partkey",), right_on=("partkey",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        cost = col_np(t, "cost").astype(np.int64)
        keep = cost == col_np(t, "mincost").astype(np.int64)
        m = pa.array(keep)
        return pa.table(
            {"s_acctbal": t.column("s_acctbal").filter(m),
             "s_name": t.column("s_name").filter(m),
             "n_name": t.column("n_name").filter(m),
             "p_partkey": pa.array(
                 col_np(t, "partkey").astype(np.int64)[keep],
                 pa.int64()),
             "p_name": t.column("p_name").filter(m),
             "supplycost": pa.array(cost[keep] / 100.0, pa.float64())}
        )

    out = compact_nonempty(
        j.map_batches(finalize, batch_format="pyarrow")
    )
    if out is None:
        return ray.data.from_arrow(empty)
    return out.sort(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        descending=[True, False, False, False],
    )


def q11_important_parts(
    sf_dir: str, regionkey: int = 3
) -> "ray.data.Dataset":
    """TPC-H-Q11-style important-stock parts → (l_partkey, value):
    parts whose revenue supplied from one region exceeds 1.5× the
    average per-part value (Q11's HAVING-against-global-SUM two-pass,
    with the fixed fraction replaced by a data-relative one so the
    predicate stays selective-but-nonempty across scale factors).
    Values are exact integer cents; the threshold compare
    2·np·val > 3·total is pure int64 on both sides.

    Scale shape: pass 1 collapses lineitem per batch to ≤|parts|
    partial sums (supplier nation filter via an O(25) driver set)
    then bucket-aggregates per part; pass 2 is ONE two-scalar
    aggregate (total, count) over the per-part table; the filter is a
    stateless map_batches closure — no V-sized driver state."""
    from ray.data.aggregate import Count, Sum

    from .util import bucketed_aggregate, compact_nonempty, \
        sparse_sum_reduce

    nat = to_pandas_typed(_read(sf_dir, "nation"))
    in_region = np.sort(
        nat[nat.n_regionkey.astype(int) == regionkey]
        .n_nationkey.to_numpy().astype(np.int64)
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def sfilt(t: pa.Table) -> pa.Table:
        nk = col_np(t, "s_nationkey").astype(np.int64)
        keep = np.isin(nk, in_region)
        return table_from_arrays(
            s_suppkey=col_np(t, "s_suppkey").astype(np.int64)[keep]
        )

    supp = supp.map_batches(sfilt, batch_format="pyarrow")

    def lproj(t: pa.Table) -> pa.Table:
        cents = np.floor(
            (col_np(t, "l_extendedprice").astype(np.float64)
             * (1.0 - col_np(t, "l_discount").astype(np.float64)))
            * 100.0 + 0.5
        ).astype(np.int64)
        return table_from_arrays(
            l_partkey=col_np(t, "l_partkey").astype(np.int64),
            l_suppkey=col_np(t, "l_suppkey").astype(np.int64),
            rev=cents,
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lproj, batch_format="pyarrow")

    empty = pa.table(
        {"l_partkey": pa.array([], pa.int64()),
         "value": pa.array([], pa.float64())}
    )
    supp_c = compact_nonempty(supp)
    li_c = compact_nonempty(li)
    if supp_c is None or li_c is None:
        return ray.data.from_arrow(empty)

    j = li_c.join(
        supp_c, join_type="inner", num_partitions=8,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        k, s = sparse_sum_reduce(
            col_np(t, "l_partkey").astype(np.int64),
            col_np(t, "rev").astype(np.int64),
        )
        return table_from_arrays(l_partkey=k, val=s)

    pv = compact_nonempty(bucketed_aggregate(
        j.map_batches(partial, batch_format="pyarrow"),
        key_cols=["l_partkey"], aggs=[("val", "sum", "val")],
    ))
    if pv is None:
        return ray.data.from_arrow(empty)
    pv = pv.materialize()
    agg = pv.aggregate(Sum("val", alias_name="t"),
                       Count(alias_name="np"))
    total = int(agg["t"] or 0)
    nparts = int(agg["np"] or 0)

    def keep_big(t: pa.Table, _t=total, _np=nparts) -> pa.Table:
        val = col_np(t, "val").astype(np.int64)
        # val·2np > 3t ⇔ val > (3t)//(2np): the threshold is computed
        # in arbitrary-precision Python int (3t and 2np·val would wrap
        # int64 at large sf), the per-row compare stays vectorized
        thr = (3 * _t) // (2 * _np) if _np else None
        if thr is None or thr >= np.iinfo(np.int64).max:
            keep = np.zeros(len(val), dtype=bool)
        else:
            keep = val > thr
        return pa.table(
            {"l_partkey": pa.array(
                col_np(t, "l_partkey").astype(np.int64)[keep],
                pa.int64()),
             "value": pa.array(val[keep] / 100.0, pa.float64())}
        )

    out = compact_nonempty(
        pv.map_batches(keep_big, batch_format="pyarrow")
    )
    if out is None:
        return ray.data.from_arrow(empty)
    return out.sort(["value", "l_partkey"], descending=[True, False])


def q16_supplier_counts(
    sf_dir: str, excl_brand: str = "Brand#1", excl_type: str = "PROMO",
    min_acctbal: float = 1000.0,
) -> "ray.data.Dataset":
    """TPC-H-Q16-style supplier counts per part class → (p_brand,
    p_type, p_size, supplier_cnt): COUNT(DISTINCT supplier) per part
    attribute triple, over the lineitem-derived supply relation,
    excluding one brand, one type, and suppliers below an account-
    balance bar (Q16's NOT IN complaint anti-join, expressed as a
    keep-side filter).

    Scale shape: the distinct (part, supp) supply relation is a
    bucketed Arrow distinct over the projected lineitem stream; the
    supplier bar and the part attributes are hash joins; the
    COUNT(DISTINCT) is a second bucketed distinct on (brand, type,
    size, supp) followed by a bucketed count on the triple — four
    shuffles, all keyed, no driver state."""
    from .util import bucketed_aggregate, bucketed_sum_aggregate, \
        compact_nonempty

    def lproj(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            partkey=col_np(t, "l_partkey").astype(np.int64),
            suppkey=col_np(t, "l_suppkey").astype(np.int64),
        )

    supply = bucketed_sum_aggregate(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
        .map_batches(lproj, batch_format="pyarrow"),
        key_cols=["partkey", "suppkey"], sum_cols=[],
    )

    def sfilt(t: pa.Table) -> pa.Table:
        keep = (
            col_np(t, "s_acctbal").astype(np.float64) >= min_acctbal
        )
        return table_from_arrays(
            s_suppkey=col_np(t, "s_suppkey").astype(np.int64)[keep]
        )

    ok = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]
    ).map_batches(sfilt, batch_format="pyarrow")

    def pfilt(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        ptype = t.column("p_type").to_numpy(zero_copy_only=False)
        keep = (brand != excl_brand) & (ptype != excl_type)
        m = pa.array(keep)
        return pa.table(
            {"p_partkey": pa.array(
                col_np(t, "p_partkey").astype(np.int64)[keep],
                pa.int64()),
             "p_brand": t.column("p_brand").filter(m),
             "p_type": t.column("p_type").filter(m),
             "p_size": pa.array(
                 col_np(t, "p_size").astype(np.int64)[keep],
                 pa.int64())}
        )

    part = _read(
        sf_dir, "part",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(pfilt, batch_format="pyarrow")

    empty = pa.table(
        {"p_brand": pa.array([], pa.string()),
         "p_type": pa.array([], pa.string()),
         "p_size": pa.array([], pa.int64()),
         "supplier_cnt": pa.array([], pa.int64())}
    )
    ok_c = compact_nonempty(ok)
    part_c = compact_nonempty(part)
    supply_c = compact_nonempty(supply)
    if ok_c is None or part_c is None or supply_c is None:
        return ray.data.from_arrow(empty)

    j = _join_ne(
        _join_ne(supply_c, ok_c, join_type="inner", num_partitions=8,
                 on=("suppkey",), right_on=("s_suppkey",)),
        part_c, join_type="inner", num_partitions=8,
        on=("partkey",), right_on=("p_partkey",),
    )
    if j is None:
        return ray.data.from_arrow(empty)
    j = j.select_columns(["p_brand", "p_type", "p_size", "suppkey"])

    distinct = bucketed_sum_aggregate(
        j, key_cols=["p_brand", "p_type", "p_size", "suppkey"],
        sum_cols=[],
    )
    counts = compact_nonempty(bucketed_aggregate(
        distinct, key_cols=["p_brand", "p_type", "p_size"],
        aggs=[("suppkey", "count", "supplier_cnt")],
    ))
    if counts is None:
        return ray.data.from_arrow(empty)

    def retype(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p_brand": t.column("p_brand"),
             "p_type": t.column("p_type"),
             "p_size": pa.array(
                 col_np(t, "p_size").astype(np.int64), pa.int64()),
             "supplier_cnt": pa.array(
                 col_np(t, "supplier_cnt").astype(np.int64),
                 pa.int64())}
        )

    return counts.map_batches(retype, batch_format="pyarrow").sort(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        descending=[True, False, False, False],
    )


def q20_dominant_suppliers(
    sf_dir: str, name_sub: str = "bolt", year: int = 1996
) -> "ray.data.Dataset":
    """TPC-H-Q20-style part-promotion suppliers → (s_name, n_name):
    suppliers who shipped MORE THAN HALF of some matching part's
    total quantity in one year (Q20's nested availqty>½·Σqty
    semi-join, re-anchored on shipped quantity since the synth tables
    have no partsupp). Quantities are exact int64; the dominance
    predicate 2·qty > total is integer on both sides.

    Scale shape: part pre-filters the name substring and ships only
    keys; per-(part, supp) and per-part year quantities are bucketed
    Arrow sums over the same filtered stream (the second reduces the
    first — E-sized input touched once); dominance is a hash join +
    stateless filter; the winner set collapses to distinct suppliers
    before the supplier-detail join; nation names are an O(25) driver
    constant."""
    from .util import bucketed_aggregate, bucketed_sum_aggregate, \
        compact_nonempty

    nat = to_pandas_typed(_read(sf_dir, "nation"))
    nname = dict(
        zip(nat.n_nationkey.astype(int).tolist(), nat.n_name.tolist())
    )
    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")

    def pfilt(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pandas()
        keep = names.str.contains(name_sub, regex=False).to_numpy()
        return table_from_arrays(
            p_partkey=col_np(t, "p_partkey").astype(np.int64)[keep]
        )

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_name"]
    ).map_batches(pfilt, batch_format="pyarrow")

    def lfilt(t: pa.Table) -> pa.Table:
        ts = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ts >= lo) & (ts < hi)
        return table_from_arrays(
            partkey=col_np(t, "l_partkey").astype(np.int64)[keep],
            suppkey=col_np(t, "l_suppkey").astype(np.int64)[keep],
            qty=col_np(t, "l_quantity").astype(np.int64)[keep],
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(lfilt, batch_format="pyarrow")

    empty = pa.table(
        {"s_name": pa.array([], pa.string()),
         "n_name": pa.array([], pa.string())}
    )
    part_c = compact_nonempty(part)
    li_c = compact_nonempty(li)
    if part_c is None or li_c is None:
        return ray.data.from_arrow(empty)

    wl = li_c.join(
        part_c, join_type="inner", num_partitions=8,
        on=("partkey",), right_on=("p_partkey",),
    )
    wq = bucketed_aggregate(
        wl, key_cols=["partkey", "suppkey"],
        aggs=[("qty", "sum", "qty")],
    )
    wq_c = compact_nonempty(wq)
    if wq_c is None:
        return ray.data.from_arrow(empty)
    wq_c = wq_c.materialize()
    pt = bucketed_aggregate(
        wq_c.select_columns(["partkey", "qty"]),
        key_cols=["partkey"], aggs=[("qty", "sum", "total")],
    )

    j = wq_c.join(
        compact_nonempty(pt), join_type="inner", num_partitions=8,
        on=("partkey",), right_on=("partkey",),
    )

    def dominant(t: pa.Table) -> pa.Table:
        qty = col_np(t, "qty").astype(np.int64)
        keep = 2 * qty > col_np(t, "total").astype(np.int64)
        return table_from_arrays(
            suppkey=col_np(t, "suppkey").astype(np.int64)[keep]
        )

    winners = compact_nonempty(bucketed_sum_aggregate(
        j.map_batches(dominant, batch_format="pyarrow"),
        key_cols=["suppkey"], sum_cols=[],
    ))
    if winners is None:
        return ray.data.from_arrow(empty)

    supp_c = compact_nonempty(_read(
        sf_dir, "supplier",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ))
    if supp_c is None:
        return ray.data.from_arrow(empty)
    sj = winners.join(
        supp_c,
        join_type="inner", num_partitions=4,
        on=("suppkey",), right_on=("s_suppkey",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        names = [
            nname[int(x)]
            for x in col_np(t, "s_nationkey").astype(np.int64)
        ]
        return pa.table(
            {"s_name": t.column("s_name"),
             "n_name": pa.array(names, pa.string())}
        )

    out = compact_nonempty(bucketed_sum_aggregate(
        # the oracle's SELECT DISTINCT: two winning suppliers sharing
        # an (s_name, n_name) pair must collapse to one row
        sj.map_batches(finalize, batch_format="pyarrow"),
        key_cols=["s_name", "n_name"], sum_cols=[],
    ))
    if out is None:
        return ray.data.from_arrow(empty)
    return out.sort("s_name")


def events_assoc(sf_dir: str) -> "ray.data.Dataset":
    """Market-basket association rules over per-user event-type sets →
    (type_a, type_b, n_both, n_a, n_b, lift): for every unordered
    type pair (a < b), the number of users who did both, each type's
    user count, and the lift n_both·n_users/(n_a·n_b) — the
    co-occurrence mining step of a behavioural-signal pipeline. All
    counts are exact int64; lift is ONE per-row double expression
    computed from identical integers on both sides (round 9).

    Scale shape: the (user, type) incidence relation is a bucketed
    Arrow distinct (U·|types| rows, never driver-resident); pair
    expansion co-locates each user's types with a hash-bucket
    groupby and expands within sorted runs fully vectorized
    (≤C(|types|,2) pairs per user); pair counts AND per-type user
    counts are bucketed aggregates, and n_users is a bucketed
    distinct + Dataset.count() — the driver sees exactly |types|
    count rows plus one integer (round 10: the U·|types| driver
    concat is gone)."""
    from ray.data.aggregate import Count

    from .util import bucketed_aggregate, bucketed_sum_aggregate, \
        compact_nonempty

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": pa.array(
                col_np(t, "user_id").astype(np.int64), pa.int64()),
             "event_type": t.column("event_type").cast(pa.string())}
        )

    ut = bucketed_sum_aggregate(
        ev.map_batches(proj, batch_format="pyarrow"),
        key_cols=["user_id", "event_type"], sum_cols=[],
    )
    empty = pa.table(
        {"type_a": pa.array([], pa.string()),
         "type_b": pa.array([], pa.string()),
         "n_both": pa.array([], pa.int64()),
         "n_a": pa.array([], pa.int64()),
         "n_b": pa.array([], pa.int64()),
         "lift": pa.array([], pa.float64())}
    )
    ut_c = compact_nonempty(ut)
    if ut_c is None:
        return ray.data.from_arrow(empty)
    ut_c = ut_c.materialize()

    # per-type user counts: |types| rows (vocabulary-bounded — ONLY
    # these touch the driver, like the O(25) nation maps); n_users:
    # bucketed distinct on user_id reduced to one integer
    tc_ds = compact_nonempty(bucketed_aggregate(
        ut_c, key_cols=["event_type"],
        aggs=[("user_id", "count", "__n")],
    ))
    if tc_ds is None:
        return ray.data.from_arrow(empty)
    tc_tab = pa.concat_tables(
        ray.get(tc_ds.to_arrow_refs()), promote_options="default"
    )
    type_counts = dict(zip(
        tc_tab.column("event_type").to_pylist(),
        [int(x) for x in col_np(tc_tab, "__n")],
    ))
    n_users = int(
        bucketed_sum_aggregate(
            ut_c, key_cols=["user_id"], sum_cols=[]
        ).count()
    )

    def bucketize(t: pa.Table) -> pa.Table:
        u = col_np(t, "user_id").astype(np.int64)
        return t.append_column(
            "__b", pa.array((u % 64).astype(np.int64))
        )

    def expand_pairs(g: pa.Table) -> pa.Table:
        u = col_np(g, "user_id").astype(np.int64)
        ty = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((ty, u))
        u, ty = u[order], ty[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {"type_a": pa.array([], pa.string()),
                 "type_b": pa.array([], pa.string())}
            )
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        lengths = np.diff(np.append(starts, n))
        run_end = (starts + lengths)[run_id]
        rem = run_end - np.arange(n) - 1  # pairs each row opens
        total = int(rem.sum())
        a_idx = np.repeat(np.arange(n), rem)
        cum = np.concatenate(([0], np.cumsum(rem)[:-1]))
        b_idx = a_idx + (np.arange(total) - np.repeat(cum, rem)) + 1
        return pa.table(
            {"type_a": pa.array(ty[a_idx], pa.string()),
             "type_b": pa.array(ty[b_idx], pa.string())}
        )

    pairs = (
        ut_c.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: expand_pairs(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )
    counts = compact_nonempty(bucketed_aggregate(
        pairs, key_cols=["type_a", "type_b"],
        aggs=[("type_a", "count", "n_both")],
    ))
    if counts is None:
        return ray.data.from_arrow(empty)

    def finalize(t: pa.Table, _tc=type_counts, _nu=n_users) -> pa.Table:
        ta = t.column("type_a").to_numpy(zero_copy_only=False)
        tb = t.column("type_b").to_numpy(zero_copy_only=False)
        nboth = col_np(t, "n_both").astype(np.int64)
        na = np.array([_tc[x] for x in ta], dtype=np.int64)
        nb = np.array([_tc[x] for x in tb], dtype=np.int64)
        lift = np.array(
            [round(int(c) * _nu / (int(a) * int(b)), 9)
             for c, a, b in zip(nboth, na, nb)],
            dtype=np.float64,
        )
        return pa.table(
            {"type_a": pa.array(ta, pa.string()),
             "type_b": pa.array(tb, pa.string()),
             "n_both": pa.array(nboth, pa.int64()),
             "n_a": pa.array(na, pa.int64()),
             "n_b": pa.array(nb, pa.int64()),
             "lift": pa.array(lift, pa.float64())}
        )

    return counts.map_batches(finalize, batch_format="pyarrow").sort(
        ["type_a", "type_b"]
    )
