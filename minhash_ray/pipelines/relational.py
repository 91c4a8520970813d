"""General relational operators over the TPC-H-ish test tables — the
"full data-processing engine" surface from the gap analysis (SURVEY.md
§2.6): projections, vectorized filters, partial+final aggregation,
broadcast and partitioned joins, sort/limit top-k, distinct counting.

Monetary sums are computed in integer cents (``floor(x*100 + 0.5)``) on
both the Ray side and the DuckDB oracle so float accumulation order can
never flip a bit of the compared values.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _t(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped: per (returnflag, linestatus): row count, total
    quantity, revenue in cents.  Partial aggregation happens per block
    inside Ray's hash aggregate; the shuffle moves partials only."""
    from ray.data.aggregate import Count, Sum

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def widen(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy()
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty.astype(np.int64), pa.int64()),
                "revenue_cents": pa.array(_cents(price * (1.0 - disc)), pa.int64()),
            }
        )

    return (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


def orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast hash join: customer is the small side,
    shipped to workers once) → per-segment order count + cents total."""
    import ray
    from ray.data.aggregate import Count, Sum

    from minhash_ray.util import int_lookup_pack

    cust = pa.concat_tables(
        list(
            _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        )
    )
    # broadcast as sorted numpy arrays + searchsorted, never a python dict
    # (dict deserialization anti-scales with worker count)
    ref = [ray.put(int_lookup_pack(
        cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_pylist()
    ))]

    def attach_segment(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        pack = cached_get(ref[0])
        seg = int_lookup_take(pack, batch.column("o_custkey").to_numpy())
        total = _cents(batch.column("o_totalprice").to_numpy())
        t = pa.table(
            {
                "c_mktsegment": seg,
                "total_cents": pa.array(total, pa.int64()),
            }
        )
        return t.filter(pc.is_valid(t.column("c_mktsegment")))

    return (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach_segment, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
    )


def top_customers(sf_dir: str, k: int = 10):
    """Top-k customers by order count — aggregate → sort(desc, key asc) →
    limit.  Deterministic tie-break on custkey."""
    from ray.data.aggregate import Count

    agg = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    top = agg.sort(["n_orders", "o_custkey"], descending=[True, False]).limit(k)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"c_custkey": batch.column("o_custkey"), "n_orders": batch.column("n_orders")}
        )

    return top.map_batches(rename, batch_format="pyarrow")


def supplier_regions(sf_dir: str):
    """supplier ⋈ nation ⋈ region (two broadcast lookups) → suppliers per
    region name."""
    import ray
    from ray.data.aggregate import Count

    nation = pa.concat_tables(
        list(_t(sf_dir, "nation").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    region = pa.concat_tables(
        list(_t(sf_dir, "region").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    from minhash_ray.util import int_lookup_pack

    r_of = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nat_keys = nation["n_nationkey"].to_numpy()
    nat_vals = [r_of[rk] for rk in nation["n_regionkey"].to_pylist()]
    ref = [ray.put(int_lookup_pack(nat_keys, nat_vals))]

    def attach_region(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        pack = cached_get(ref[0])
        names = int_lookup_take(pack, batch.column("s_nationkey").to_numpy())
        return pa.table({"r_name": names})

    return (
        _t(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(attach_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )


def events_by_type(sf_dir: str):
    """Per event type: event count, distinct users, value sum in cents.

    ONE user-hash exchange does all three aggregates: per-batch partials
    group (event_type, user_id) carrying count + value-cents sums, the
    fold inside each user partition collapses to per-type partials
    (n_events, n_users, value_cents — distinct users resolve exactly
    because a user's rows all land in its hash partition), and the final
    combine is a Ray groupby over P x n_types partial rows (metadata
    scale).  Replaces the previous 4-exchange plan (distinct-fold +
    2 groupbys + join) — same output, half the wall time."""
    from ray.data.aggregate import Sum

    from minhash_ray.util import fold_by_int_keys

    ds = _t(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "user_id": batch.column("user_id"),
                "value_cents": pa.array(
                    _cents(batch.column("value").to_numpy()), pa.int64()
                ),
            }
        )
        agg = t.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "user_id": agg.column("user_id"),
                "n": pc.cast(agg.column("count_all"), pa.int64()),
                "v": pc.cast(agg.column("value_cents_sum"), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        # one row per (type, user) in this partition, then per type
        d = t.group_by(["event_type", "user_id"]).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        pt = d.group_by("event_type").aggregate(
            [("n_sum", "sum"), ("v_sum", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "event_type": pt.column("event_type"),
                "n_events": pc.cast(pt.column("n_sum_sum"), pa.int64()),
                "n_users": pc.cast(pt.column("count_all"), pa.int64()),
                "value_cents": pc.cast(pt.column("v_sum_sum"), pa.int64()),
            }
        )

    return (
        fold_by_int_keys(ds, ["user_id"], partial, fold, 8)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_users", alias_name="n_users"),
            Sum("value_cents", alias_name="value_cents"),
        )
        .select_columns(["event_type", "n_events", "n_users", "value_cents"])
    )


def filtered_lineitem(sf_dir: str, date_lo: str = "1995-01-01", date_hi: str = "1996-01-01"):
    """Vectorized predicate + projection + aggregate: lineitems shipped in
    [date_lo, date_hi) per return flag."""
    from ray.data.aggregate import Count, Sum

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_shipdate", "l_quantity"])
    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    def filt(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        mask = (ship >= lo) & (ship < hi)
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty": pa.array(t.column("l_quantity").to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(filt, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n_items"), Sum("qty", alias_name="sum_qty"))
    )


def nation_revenue(sf_dir: str, num_partitions: int = 8):
    """lineitem ⋈ orders (partitioned hash join — both sides large) ⋈
    customer ⋈ nation (broadcast lookups) → revenue cents per nation.

    The lineitem-orders join runs through ``Dataset.join`` so the engine's
    large-large join path is exercised by a SQL-checked query."""
    import ray
    from ray.data.aggregate import Count, Sum

    from minhash_ray.util import clamp_partitions

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_widen(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue_cents": pa.array(_cents(price * (1.0 - disc)), pa.int64()),
            }
        )

    li = li.map_batches(li_widen, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=clamp_partitions(num_partitions),
    )

    cust = pa.concat_tables(
        list(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    nation = pa.concat_tables(
        list(_t(sf_dir, "nation").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    from minhash_ray.util import int_lookup_pack

    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    cust_vals = [n_name[nk] for nk in cust["c_nationkey"].to_pylist()]
    ref = [ray.put(int_lookup_pack(cust["c_custkey"].to_numpy(), cust_vals))]

    def attach(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        pack = cached_get(ref[0])
        names = int_lookup_take(pack, batch.column("o_custkey").to_numpy())
        t = pa.table(
            {
                "n_name": names,
                "revenue_cents": batch.column("revenue_cents"),
            }
        )
        return t.filter(pc.is_valid(t.column("n_name")))

    return (
        joined.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_items"), Sum("revenue_cents", alias_name="revenue_cents"))
    )


def part_brand_stats(sf_dir: str):
    """Distinct-ish aggregate over part: per brand, part count + total size."""
    from ray.data.aggregate import Count, Sum

    return (
        _t(sf_dir, "part", ["p_brand", "p_size"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"), Sum("p_size", alias_name="total_size"))
    )


def top_orders_per_customer(sf_dir: str, k: int = 3, num_partitions: int = 32):
    """Per-group top-k — the windowed ``row_number() OVER (PARTITION BY
    ...) <= k`` shape Ray Data has no native operator for: each customer's
    ``k`` highest-value orders with a dense 1-based rank (ties broken by
    o_orderkey, so the result is deterministic and SQL-oracle-exact).

    Scale shape (two-level top-k, the groupwise analog of partial
    aggregation): a vectorized per-BATCH top-k first prunes every batch to
    at most k rows per customer seen in it — one lexsort + segmented
    position, no Python loop — so the hash shuffle moves O(k) rows per
    (customer, batch), never the order history; the per-partition final
    pass applies the identical selection to the pruned union, which is
    exact because a group's global top-k is a subset of the union of its
    per-batch top-ks.  Partitioning contract: one customer's PRUNED rows
    (≤ k × n_batches) must fit a task, not the corpus."""
    import ray.data as rd

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, clamp_partitions(num_partitions)))

    def _topk_arrays(cust, okey, cents, k):
        """Row indices of the per-customer top-k under
        (cents DESC, o_orderkey ASC), plus each kept row's 0-based rank."""
        order = np.lexsort((okey, -cents, cust))
        c_s = cust[order]
        n = len(order)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = c_s[1:] != c_s[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        r = idx - start
        keep = r < k
        return order[keep], r[keep]

    def local_topk(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        cents = _cents(batch.column("o_totalprice").to_numpy())
        sel, _ = _topk_arrays(cust, okey, cents, k)
        pkey = (splitmix64(cust[sel].astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(cust[sel], pa.int64()),
                "o_orderkey": pa.array(okey[sel], pa.int64()),
                "price_cents": pa.array(cents[sel], pa.int64()),
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        cents = batch.column("price_cents").to_numpy()
        sel, r = _topk_arrays(cust, okey, cents, k)
        return pa.table(
            {
                "o_custkey": pa.array(cust[sel], pa.int64()),
                "o_orderkey": pa.array(okey[sel], pa.int64()),
                "price_cents": pa.array(cents[sel], pa.int64()),
                "rnk": pa.array(r + 1, pa.int64()),
            }
        )

    pruned = _t(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(local_topk, batch_format="pyarrow")
    return pruned.groupby("pkey").map_groups(final_topk, batch_format="pyarrow")


def customers_without_orders(
    sf_dir: str, min_price: float = 400000.0, num_partitions: int = 32
):
    """(c_custkey, c_name): customers with no order above ``min_price`` —
    the predicate anti-join (``NOT EXISTS``) surface Ray Data has no
    native operator for.  (The predicate keeps the result non-degenerate
    on the TPC-H-ish fixtures, where every customer has *some* order.)

    Scale shape (partitioned anti-join, both sides large): the probe side
    first collapses to its DISTINCT keys per batch (one np.unique — at
    most one row per custkey per batch crosses the shuffle, never the
    order history), then BOTH sides hash-partition on the key and each
    partition runs a vectorized sorted-membership setdiff.  No broadcast
    and no driver-resident state, so it holds when the probe side is 10^9
    rows; compare ``orders_by_segment`` for the broadcast shape used when
    one side is genuinely small."""
    return _customer_order_exists(sf_dir, min_price, num_partitions, keep_if_exists=False)


def customers_with_orders(
    sf_dir: str, min_price: float = 400000.0, num_partitions: int = 32
):
    """(c_custkey, c_name): customers with at least one order above
    ``min_price`` — the semi-join (``EXISTS``) twin of
    ``customers_without_orders``: identical partitioned
    distinct-probe/sorted-membership machinery, membership kept instead
    of dropped."""
    return _customer_order_exists(sf_dir, min_price, num_partitions, keep_if_exists=True)


def _customer_order_exists(
    sf_dir: str, min_price: float, num_partitions: int, keep_if_exists: bool
):
    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, clamp_partitions(num_partitions)))

    def _pkey(keys: np.ndarray) -> pa.Array:
        return pa.array(
            (splitmix64(keys.astype(np.uint64)) % P).astype(np.int64), pa.int64()
        )

    def keep_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_numpy()
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_name": batch.column("c_name"),
                "probe": pa.array(np.zeros(len(keys), dtype=np.int8), pa.int8()),
                "pkey": _pkey(keys),
            }
        )

    def probe_side(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy()
        keys = np.unique(batch.column("o_custkey").to_numpy()[price > min_price])
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.array([None] * len(keys), pa.string()),
                "probe": pa.array(np.ones(len(keys), dtype=np.int8), pa.int8()),
                "pkey": _pkey(keys),
            }
        )

    def anti(batch: pa.Table) -> pa.Table:
        probe = batch.column("probe").to_numpy()
        keys = batch.column("c_custkey").to_numpy()
        present = np.unique(keys[probe == 1])
        left = probe == 0
        lk = keys[left]
        if len(present):
            pos = np.minimum(np.searchsorted(present, lk), len(present) - 1)
            miss = present[pos] != lk
        else:
            miss = np.ones(len(lk), dtype=bool)
        sel = np.flatnonzero(left)[~miss if keep_if_exists else miss]
        t = batch.select(["c_custkey", "c_name"])
        return t.take(pa.array(sel, pa.int64()))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        keep_side, batch_format="pyarrow"
    )
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        probe_side, batch_format="pyarrow"
    )
    return cust.union(orders).groupby("pkey").map_groups(anti, batch_format="pyarrow")


def customer_order_counts(sf_dir: str, num_partitions: int = 32):
    """(c_custkey, c_name, n_orders) for EVERY customer, zero-order
    customers included — the left-outer-join shape (complements the
    anti-join :func:`customers_without_orders`).

    Scale shape: the orders side pre-aggregates to ONE row per custkey
    before the join (partial count inside the hash aggregate), so the
    left-outer hash join moves counts, never order history; both sides
    hash-partition on the key."""
    from minhash_ray.util import clamp_partitions

    np_parts = clamp_partitions(num_partitions)
    customers = _t(sf_dir, "customer", ["c_custkey", "c_name"])

    # custkeys are corpus-width: fold per-batch Arrow count partials
    # through a key-hash partition, never Ray-aggregate groups
    from minhash_ray.util import fold_by_int_keys

    def cnt_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {
                "o_custkey": agg.column("o_custkey"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    def cnt_fold(t: pa.Table) -> pa.Table:
        agg = t.group_by("o_custkey").aggregate([("c", "sum")])
        return pa.table(
            {
                "o_custkey": agg.column("o_custkey"),
                "n_orders": pc.cast(agg.column("c_sum"), pa.int64()),
            }
        )

    counts = fold_by_int_keys(
        _t(sf_dir, "orders", ["o_custkey"]), ["o_custkey"], cnt_partial, cnt_fold, 8
    )
    joined = customers.join(
        counts, join_type="left_outer", on=("c_custkey",),
        right_on=("o_custkey",), num_partitions=np_parts,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(batch.column("n_orders"), pa.int64()), 0)
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_name": batch.column("c_name"),
                "n_orders": n,
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def revenue_rollup(sf_dir: str, num_partitions: int = 8):
    """ROLLUP(region, nation) revenue aggregate — the multi-level
    aggregate shape (GROUP BY ROLLUP) Ray Data has no native operator
    for: (r_name, n_name) detail rows plus per-region subtotals plus a
    grand total, '<all>' as the rolled-up sentinel.

    Scale shape: ONE scan builds the finest-level aggregate exactly like
    :func:`nation_revenue` (partitioned lineitem⋈orders join + broadcast
    customer→(nation, region) lookup + partial/final hash aggregate);
    every coarser level then derives from those FINE PARTIALS — a
    metadata-scale fold over ≤ |nations| rows, never a re-scan.  This is
    the rollup contract at any corpus size: level k+1 is a re-aggregation
    of level k's (already tiny) output."""
    import ray
    from ray.data.aggregate import Count, Sum

    from minhash_ray.util import clamp_partitions, int_lookup_pack

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_widen(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue_cents": pa.array(_cents(price * (1.0 - disc)), pa.int64()),
            }
        )

    joined = li.map_batches(li_widen, batch_format="pyarrow").join(
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=clamp_partitions(num_partitions),
    )

    cust = pa.concat_tables(
        list(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    nation = pa.concat_tables(
        list(_t(sf_dir, "nation").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    region = pa.concat_tables(
        list(_t(sf_dir, "region").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    r_of = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    n_region = {
        nk: r_of[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    }
    ck = cust["c_custkey"].to_numpy()
    nk_list = cust["c_nationkey"].to_pylist()
    # one combined lookup value "r_name|n_name" — a single broadcast pack
    combined = [f"{n_region[nk]}|{n_name[nk]}" for nk in nk_list]
    ref = [ray.put(int_lookup_pack(ck, combined))]

    def attach(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        pack = cached_get(ref[0])
        rn = int_lookup_take(pack, batch.column("o_custkey").to_numpy())
        t = pa.table(
            {"rn": rn, "revenue_cents": batch.column("revenue_cents")}
        )
        t = t.filter(pc.is_valid(t.column("rn")))
        parts = pc.split_pattern(t.column("rn"), "|")
        return pa.table(
            {
                "r_name": pc.list_element(parts, 0),
                "n_name": pc.list_element(parts, 1),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    fine = (
        joined.map_batches(attach, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Count(alias_name="n_items"), Sum("revenue_cents", alias_name="revenue_cents"))
    )
    ft = pa.concat_tables(
        list(fine.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    # coarser levels: metadata-scale folds of the fine partials
    import numpy as np

    r = ft.column("r_name").to_pylist()
    n_items = np.asarray(ft.column("n_items").to_numpy(), dtype=np.int64)
    rev = np.asarray(ft.column("revenue_cents").to_numpy(), dtype=np.int64)
    by_region: dict = {}
    for i, rn_ in enumerate(r):
        c, s = by_region.get(rn_, (0, 0))
        by_region[rn_] = (c + int(n_items[i]), s + int(rev[i]))
    rows_r = sorted(by_region.items())
    region_tbl = pa.table(
        {
            "r_name": pa.array([k for k, _ in rows_r], pa.string()),
            "n_name": pa.array(["<all>"] * len(rows_r), pa.string()),
            "n_items": pa.array([v[0] for _, v in rows_r], pa.int64()),
            "revenue_cents": pa.array([v[1] for _, v in rows_r], pa.int64()),
        }
    )
    total_tbl = pa.table(
        {
            "r_name": pa.array(["<all>"], pa.string()),
            "n_name": pa.array(["<all>"], pa.string()),
            "n_items": pa.array([int(n_items.sum())], pa.int64()),
            "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
        }
    )
    return pa.concat_tables([ft.select(["r_name", "n_name", "n_items", "revenue_cents"]),
                             region_tbl, total_tbl])


def nation_segment_balance(
    sf_dir: str, segment: str = "AUTOMOBILE", num_partitions: int = 8
):
    """(nationkey, n_customers, n_suppliers): per-nation count of
    ``segment`` customers FULL-OUTER-joined with per-nation supplier
    counts, zeros filled on both sides — the full-outer shape (nations
    with segment customers but no suppliers AND vice versa both survive;
    completes the join-type surface next to inner / left_outer / semi /
    anti).

    Scale shape: both sides pre-aggregate to one row per nation before
    the join, so the full-outer hash join moves 25 rows, never the base
    tables."""
    from ray.data.aggregate import Count

    from minhash_ray.util import clamp_partitions

    np_parts = clamp_partitions(num_partitions)

    def cust_slim(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("c_mktsegment"), segment)
        return pa.table(
            {"ckey": pc.cast(batch.column("c_nationkey").filter(keep), pa.int64())}
        )

    cust = (
        _t(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
        .map_batches(cust_slim, batch_format="pyarrow")
        .groupby("ckey")
        .aggregate(Count(alias_name="n_customers"))
    )
    supp = (
        _t(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(
            lambda b: pa.table({"skey": pc.cast(b.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("skey")
        .aggregate(Count(alias_name="n_suppliers"))
    )
    joined = cust.join(
        supp, join_type="full_outer", on=("ckey",), right_on=("skey",),
        num_partitions=np_parts,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces the key into the LEFT key column
        return pa.table(
            {
                "nationkey": pc.cast(batch.column("ckey"), pa.int64()),
                "n_customers": pc.fill_null(
                    pc.cast(batch.column("n_customers"), pa.int64()), 0
                ),
                "n_suppliers": pc.fill_null(
                    pc.cast(batch.column("n_suppliers"), pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def segment_priority_cube(sf_dir: str):
    """CUBE(c_mktsegment, o_orderpriority) over orders ⋈ customer: order
    count + total price cents at all FOUR grouping-set levels — detail
    cells, per-segment subtotals, per-priority subtotals, grand total,
    '<all>' as the cubed-out sentinel (the GROUP BY CUBE shape Ray Data
    has no native operator for; :func:`revenue_rollup` is the linear
    ROLLUP cousin).

    Scale shape: ONE scan builds the finest-level cells exactly like
    :func:`orders_by_segment` (broadcast customer→segment lookup +
    hash aggregate over ≤ |segments|·|priorities| groups); every other
    grouping set derives from those FINE CELLS — a metadata-scale fold
    over ≤ 25 rows, never a re-scan.  This is the cube contract at any
    corpus size: 2^k - 1 coarser sets are re-aggregations of the finest
    set's (already tiny) output."""
    import ray
    from ray.data.aggregate import Count, Sum

    from minhash_ray.util import int_lookup_pack

    cust = pa.concat_tables(
        list(
            _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        )
    )
    ref = [ray.put(int_lookup_pack(
        cust["c_custkey"].to_numpy(), cust["c_mktsegment"].to_pylist()
    ))]

    def attach(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        pack = cached_get(ref[0])
        seg = int_lookup_take(pack, batch.column("o_custkey").to_numpy())
        t = pa.table(
            {
                "c_mktsegment": seg,
                "o_orderpriority": batch.column("o_orderpriority"),
                "total_cents": pa.array(
                    _cents(batch.column("o_totalprice").to_numpy()), pa.int64()
                ),
            }
        )
        return t.filter(pc.is_valid(t.column("c_mktsegment")))

    fine = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(
            Count(alias_name="n_orders"), Sum("total_cents", alias_name="total_cents")
        )
    )
    ft = pa.concat_tables(
        list(fine.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    segs = ft.column("c_mktsegment").to_pylist()
    pris = ft.column("o_orderpriority").to_pylist()
    cnt = np.asarray(ft.column("n_orders").to_numpy(), dtype=np.int64)
    tot = np.asarray(ft.column("total_cents").to_numpy(), dtype=np.int64)

    def _fold(keys) -> pa.Table:
        acc: dict = {}
        for i, k in enumerate(keys):
            c, s = acc.get(k, (0, 0))
            acc[k] = (c + int(cnt[i]), s + int(tot[i]))
        rows = sorted(acc.items())
        return rows

    by_seg = _fold(segs)
    by_pri = _fold(pris)
    grand = [("<all>", (int(cnt.sum()), int(tot.sum())))] if len(cnt) else []
    out_seg, out_pri, out_n, out_t = (
        list(segs),
        list(pris),
        [int(x) for x in cnt],
        [int(x) for x in tot],
    )
    for k, (c, s) in by_seg:
        out_seg.append(k); out_pri.append("<all>"); out_n.append(c); out_t.append(s)
    for k, (c, s) in by_pri:
        out_seg.append("<all>"); out_pri.append(k); out_n.append(c); out_t.append(s)
    for k, (c, s) in grand:
        out_seg.append(k); out_pri.append(k); out_n.append(c); out_t.append(s)
    return pa.table(
        {
            "c_mktsegment": pa.array(out_seg, pa.string()),
            "o_orderpriority": pa.array(out_pri, pa.string()),
            "n_orders": pa.array(out_n, pa.int64()),
            "total_cents": pa.array(out_t, pa.int64()),
        }
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
    num_partitions: int = 8,
):
    """TPC-H Q3 shape — (o_orderkey, revenue_cents, o_orderdate_us,
    o_orderpriority): the k highest-revenue unshipped orders of one
    market segment (orders placed before ``cutoff`` with lineitems
    shipping after it), revenue in exact integer cents per item
    (``floor(((extprice * (1 - disc)) * 100) + 0.5)`` — the same IEEE
    double expression the oracle evaluates, so the sum is bit-stable).

    Scale shape: the segment's custkeys are the small side (one sorted
    int array via ``ray.put``, searchsorted probe per batch — never a
    shuffle join); lineitem revenue folds per l_orderkey through the
    key-hash partition (order keys scale with the corpus); ONE
    partitioned join attaches order metadata to the folded revenue rows;
    per-batch local top-k prunes to ≤ batches × k rows before the final
    sort+limit.  Deterministic tie-break on o_orderkey."""
    import ray

    from minhash_ray.util import fold_by_int_keys, strip_empty_blocks

    cutoff_us = np.int64(
        int(np.datetime64(cutoff, "us").astype("datetime64[us]").astype(np.int64))
    )

    cust = pa.concat_tables(
        list(
            _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        )
    )
    keys = np.sort(
        cust.filter(pc.equal(cust.column("c_mktsegment"), segment))
        .column("c_custkey")
        .to_numpy()
    )
    ref = [ray.put(keys)]

    def ts_us(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.cast(pa.int64()).to_numpy()

    def order_filter(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        ks = cached_get(ref[0])
        ck = batch.column("o_custkey").to_numpy()
        if len(ks):
            pos = np.searchsorted(ks, ck)
            in_seg = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == ck)
        else:
            in_seg = np.zeros(len(ck), dtype=bool)
        od = ts_us(batch.column("o_orderdate"))
        keep = in_seg & (od < cutoff_us)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate_us": pa.array(od[keep], pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    orders = _t(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_filter, batch_format="pyarrow")

    def rev_partial(batch: pa.Table) -> pa.Table:
        sd = ts_us(batch.column("l_shipdate"))
        keep = sd > cutoff_us
        t = batch.filter(pa.array(keep))
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.floor(((ep * (1.0 - disc)) * 100.0) + 0.5).astype(np.int64)
        g = pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "revenue_cents": pa.array(rev, pa.int64()),
            }
        ).group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "revenue_cents": pc.cast(g.column("revenue_cents_sum"), pa.int64()),
            }
        )

    def rev_final(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "revenue_cents": pc.cast(g.column("revenue_cents_sum"), pa.int64()),
            }
        )

    revenue = fold_by_int_keys(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount",
                                "l_shipdate"]),
        ["o_orderkey"], rev_partial, rev_final, num_partitions,
    )

    joined = strip_empty_blocks(revenue).join(
        strip_empty_blocks(orders), join_type="inner", on=("o_orderkey",),
        num_partitions=num_partitions,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        rev = batch.column("revenue_cents").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        o = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(np.sort(o)))

    pruned = joined.map_batches(local_topk, batch_format="pyarrow")
    return (
        pruned.sort(["revenue_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_partitions: int = 8,
):
    """TPC-H Q5 shape — revenue per nation from lineitems whose customer
    and supplier sit in the SAME nation of one region, orders within a
    date year.  The defining feature vs the other join queries is the
    join-equality predicate across two independent dimension paths
    (``c_nationkey = s_nationkey``): neither side alone determines the
    group, so the filter runs after both lookups are attached.

    Scale shape: orders is date-filtered at the read (one vectorized
    timestamp compare per batch, then (o_orderkey, o_custkey) only);
    lineitem carries (l_orderkey, l_suppkey, revenue_cents); the only
    shuffle is ONE partitioned lineitem ⋈ orders join on the shared
    orderkey.  supplier and customer nationkeys ride as sorted
    int64→int64 broadcast packs (``ray.put`` once, searchsorted probe per
    batch — supplier/customer are the canonical small dimensions), and
    the region's nation ids are a frozen numpy set of ≤25 entries.
    Revenue per item is exact integer cents (same IEEE expression as the
    oracle), folded per n_name by Ray aggregate (≤25 groups).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)

    nation = pa.concat_tables(
        list(_t(sf_dir, "nation").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    reg = pa.concat_tables(
        list(_t(sf_dir, "region").iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    reg_keys = set(
        reg.filter(pc.equal(reg.column("r_name"), region)).column("r_regionkey").to_pylist()
    )
    in_region = nation.filter(
        pa.array([rk in reg_keys for rk in nation.column("n_regionkey").to_pylist()])
    )
    # ≤25 nations: dense nationkey→name map, numpy membership mask
    nat_keys = in_region.column("n_nationkey").to_numpy()
    nat_names = in_region.column("n_name").to_pylist()
    max_nk = int(nation.column("n_nationkey").to_numpy().max()) if nation.num_rows else 0
    name_by_nk = np.full(max_nk + 1, -1, dtype=np.int32)
    for i, nk in enumerate(nat_keys):
        name_by_nk[int(nk)] = i

    def _int_pack(tbl: pa.Table, kcol: str, vcol: str):
        k = tbl.column(kcol).to_numpy()
        v = tbl.column(vcol).to_numpy().astype(np.int64)
        order = np.argsort(k)
        return {"keys": k[order].astype(np.int64), "vals": v[order]}

    supp = pa.concat_tables(
        list(_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    cust = pa.concat_tables(
        list(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    ref = [ray.put({
        "supp": _int_pack(supp, "s_suppkey", "s_nationkey"),
        "cust": _int_pack(cust, "c_custkey", "c_nationkey"),
        "name_by_nk": name_by_nk,
        "vocab": nat_names,
    })]

    lo_us = np.int64(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = np.int64(np.datetime64(date_hi, "us").astype(np.int64))

    def order_filter(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        od_us = od.cast(pa.int64()).to_numpy()
        keep = (od_us >= lo_us) & (od_us < hi_us)
        t = batch.filter(pa.array(keep))
        return t.select(["o_orderkey", "o_custkey"])

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        order_filter, batch_format="pyarrow"
    )

    def li_widen(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "revenue_cents": pa.array(_cents(price * (1.0 - disc)), pa.int64()),
            }
        )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                                 "l_discount"]).map_batches(li_widen, batch_format="pyarrow")

    joined = li.join(
        orders,
        join_type="inner",
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        num_partitions=num_partitions,
    )

    def _probe(pack, q: np.ndarray) -> np.ndarray:
        """sorted int64 keys → int64 vals; -1 where absent."""
        keys, vals = pack["keys"], pack["vals"]
        if len(keys) == 0:
            return np.full(len(q), -1, dtype=np.int64)
        pos = np.searchsorted(keys, q)
        pos_c = np.minimum(pos, len(keys) - 1)
        out = vals[pos_c].copy()
        out[keys[pos_c] != q] = -1
        return out

    def same_nation(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        pack = cached_get(ref[0])
        s_nat = _probe(pack["supp"], batch.column("l_suppkey").to_numpy().astype(np.int64))
        c_nat = _probe(pack["cust"], batch.column("o_custkey").to_numpy().astype(np.int64))
        nb = pack["name_by_nk"]
        in_reg = (s_nat >= 0) & (s_nat < len(nb))
        code = np.where(in_reg, nb[np.minimum(np.maximum(s_nat, 0), len(nb) - 1)], -1)
        keep = (s_nat == c_nat) & (code >= 0)
        idx = np.flatnonzero(keep)
        vocab = pa.array(pack["vocab"], pa.string())
        return pa.table(
            {
                "n_name": vocab.take(pa.array(code[idx], pa.int32())),
                "revenue_cents": batch.column("revenue_cents").take(pa.array(idx)),
            }
        )

    return (
        joined.map_batches(same_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_items"), Sum("revenue_cents", alias_name="revenue_cents"))
    )


def returned_item_revenue(
    sf_dir: str,
    date_lo: str = "1995-07-01",
    date_hi: str = "1995-10-01",
    k: int = 20,
    num_partitions: int = 8,
):
    """TPC-H Q10 shape — (c_custkey, c_name, n_name, revenue_cents): the
    k customers who generated the most revenue on RETURNED items
    (l_returnflag = 'R') for orders placed in [date_lo, date_hi), revenue
    in exact integer cents (the Q3 bit-stable expression).

    Scale shape: returned-lineitem revenue folds per order key through
    the key-hash partition; ONE partitioned join routes it through the
    date-filtered orders to custkeys; a second custkey-hash fold sums per
    customer; customer attributes attach by ONE partitioned join (the
    customer table scales with the corpus — never driver state) while the
    25-row nation map is the one legitimate driver broadcast; per-batch
    local top-k prunes to <= batches x k rows before the exact
    sort+limit.  Deterministic tie-break on c_custkey."""
    from minhash_ray.util import fold_by_int_keys, strip_empty_blocks

    lo_us = np.int64(int(np.datetime64(date_lo, "us").astype(np.int64)))
    hi_us = np.int64(int(np.datetime64(date_hi, "us").astype(np.int64)))

    def ts_us(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.cast(pa.int64()).to_numpy()

    def rev_partial(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag")
        t = batch.filter(pc.equal(rf, "R"))
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.floor(((ep * (1.0 - disc)) * 100.0) + 0.5).astype(np.int64)
        g = pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "revenue_cents": pa.array(rev, pa.int64()),
            }
        ).group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "revenue_cents": pc.cast(g.column("revenue_cents_sum"), pa.int64()),
            }
        )

    def key_sum_final(key: str):
        def fold(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([("revenue_cents", "sum")])
            return pa.table(
                {
                    key: g.column(key),
                    "revenue_cents": pc.cast(g.column("revenue_cents_sum"), pa.int64()),
                }
            )

        return fold

    order_rev = fold_by_int_keys(
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]),
        ["o_orderkey"], rev_partial, key_sum_final("o_orderkey"), num_partitions,
    )

    def order_filter(batch: pa.Table) -> pa.Table:
        od = ts_us(batch.column("o_orderdate"))
        keep = (od >= lo_us) & (od < hi_us)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "c_custkey": t.column("o_custkey")}
        )

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        order_filter, batch_format="pyarrow"
    )
    routed = strip_empty_blocks(order_rev).join(
        strip_empty_blocks(orders), join_type="inner", on=("o_orderkey",),
        num_partitions=num_partitions,
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["c_custkey", "revenue_cents"]).group_by(
            "c_custkey"
        ).aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "c_custkey": g.column("c_custkey"),
                "revenue_cents": pc.cast(g.column("revenue_cents_sum"), pa.int64()),
            }
        )

    cust_rev = fold_by_int_keys(
        routed, ["c_custkey"], cust_partial, key_sum_final("c_custkey"), num_partitions
    )

    # nation names: the 25-row driver broadcast; customer attrs: a
    # partitioned join (customers scale with the corpus)
    nation = pa.concat_tables(
        list(_t(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    )
    import ray

    from minhash_ray.util import int_lookup_pack

    nat_ref = [ray.put(int_lookup_pack(
        nation["n_nationkey"].to_numpy(), nation["n_name"].to_pylist()
    ))]

    def cust_attrs(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get, int_lookup_take

        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_name": batch.column("c_name"),
                "n_name": int_lookup_take(
                    cached_get(nat_ref[0]), batch.column("c_nationkey").to_numpy()
                ),
            }
        )

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        cust_attrs, batch_format="pyarrow"
    )
    joined = strip_empty_blocks(cust_rev).join(
        cust, join_type="inner", on=("c_custkey",), num_partitions=num_partitions
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue_cents").to_numpy()
        ck = batch.column("c_custkey").to_numpy()
        o = np.lexsort((ck, -rev))[:k]
        return batch.take(pa.array(o)).select(
            ["c_custkey", "c_name", "n_name", "revenue_cents"]
        )

    pruned = joined.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["revenue_cents", "c_custkey"], descending=[True, False]).limit(k)


def large_volume_customers(
    sf_dir: str,
    qty_min: int = 250,
    num_partitions: int = 8,
):
    """TPC-H Q18 shape — (c_custkey, c_name, o_orderkey, o_orderdate_us,
    total_qty): every order whose total lineitem quantity exceeds
    ``qty_min``, with its customer (the large-volume-order audit).

    Scale shape: integer quantities fold per order key through the
    key-hash partition and the HAVING gate runs inside the fold (only
    gated orders — a tiny fraction — reach any join); two partitioned
    joins attach order metadata and customer name.  No driver state at
    any corpus size."""
    from minhash_ray.util import fold_by_int_keys, strip_empty_blocks

    def qty_partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderkey": batch.column("l_orderkey"),
                "q": pa.array(
                    batch.column("l_quantity").to_numpy().astype(np.int64), pa.int64()
                ),
            }
        ).group_by("o_orderkey").aggregate([("q", "sum")])
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "q": pc.cast(g.column("q_sum"), pa.int64()),
            }
        )

    def qty_final(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([("q", "sum")])
        out = pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "total_qty": pc.cast(g.column("q_sum"), pa.int64()),
            }
        )
        return out.filter(pc.greater(out.column("total_qty"), qty_min))

    gated = fold_by_int_keys(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        ["o_orderkey"], qty_partial, qty_final, num_partitions,
    )

    def order_slim(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "c_custkey": batch.column("o_custkey"),
                "o_orderdate_us": pc.cast(od.cast(pa.int64()), pa.int64()),
            }
        )

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        order_slim, batch_format="pyarrow"
    )
    with_order = strip_empty_blocks(gated).join(
        strip_empty_blocks(orders), join_type="inner", on=("o_orderkey",),
        num_partitions=num_partitions,
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    out = strip_empty_blocks(with_order).join(
        cust, join_type="inner", on=("c_custkey",), num_partitions=num_partitions
    )

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["c_custkey", "c_name", "o_orderkey", "o_orderdate_us", "total_qty"]
        )

    return out.map_batches(order_cols, batch_format="pyarrow")
