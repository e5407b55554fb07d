"""Relational query pipelines over the driver's TPC-H-ish tables.

Each function takes `sf_dir` and returns a Dataset / pandas DataFrame whose
column NAMES match the oracle SQL in `__ray_entry__.oracle_sql()` exactly.

Plan shapes (100 TB notes):
- fact tables (lineitem, orders, events) are only ever read with pruned
  columns and aggregated via partial-aggregation inside map_batches before
  the (small) groupby shuffle;
- dimension tables (region, nation, customer@small-sf, supplier, part) are
  broadcast via ray.put — never shuffled;
- the one genuinely large-large join (lineitem ⋈ orders) uses the explicit
  bucketed hash join from ops.joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from nexus_forge_ray.ops.joins import broadcast_join, partitioned_join


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_pd(sf_dir: str, table: str, columns: list[str] | None = None) -> pd.DataFrame:
    import pyarrow.parquet as pq
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


# --------------------------------------------------------------------- Q1-ish

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with partial pre-aggregation inside map_batches.

    The per-batch combiner emits ≤ |groups| rows per batch, so the groupby
    shuffle moves O(batches × groups) tiny rows, not the fact table.
    """
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    ).to_pandas()
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(2)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(2)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return out


# --------------------------------------------------------------------- Q6-ish

def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """Filter + single global aggregate; predicate applied as an Arrow kernel."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity",
                                    "l_extendedprice"])

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1994-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01")))),
            pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.02)),
                    pc.less(t["l_quantity"], pa.scalar(24.0))),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev": rev})

    total = ds.map_batches(filt, batch_format="pyarrow").sum("rev")
    return pd.DataFrame({"revenue": [round(total or 0.0, 2)]})


# --------------------------------------------------------------------- Q3-ish

def q3_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """customer(filter, broadcast) ⋈ orders(filter) ⋈ lineitem (bucketed) →
    groupby revenue → global top-10. Only order keys + revenue cross the wire.
    """
    # BUILDING is ~20% of customers — O(corpus) at scale. smart_semi_join
    # keeps the plan bounded: under its hard key cap the deduped key column
    # broadcasts once (no extra all-to-all — each sort exchange costs a
    # multi-second floor here regardless of volume); above the cap it
    # switches to the bucketed semi-join and the keys never reach the
    # driver.
    from nexus_forge_ray.ops.joins import smart_semi_join
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda df: df.loc[df["c_mktsegment"] == "BUILDING",
                          ["c_custkey"]].rename(
            columns={"c_custkey": "o_custkey"}),
        batch_format="pandas")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = smart_semi_join(
        orders, building, on="o_custkey", num_buckets=16,
        lcols=["o_orderkey", "o_custkey", "o_orderdate"])

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rev"] = batch["l_extendedprice"] * (1 - batch["l_discount"])
        g = batch.groupby("l_orderkey", as_index=False)["rev"].sum()
        return g

    from nexus_forge_ray.ops.joins import partitioned_agg_join
    line_partial = line.map_batches(revenue, batch_format="pandas")
    # aggregate + join in ONE bucketed shuffle (separate agg-then-join plans
    # move the partials through two all-to-all exchanges)
    joined = partitioned_agg_join(
        line_partial,
        orders.map_batches(
            lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
            batch_format="pandas"),
        on="l_orderkey", aggs={"rev": ("rev", "sum")}, num_buckets=16,
        lcols=["l_orderkey", "rev"],
        rcols=["l_orderkey", "o_custkey", "o_orderdate"])
    top = joined.to_pandas()
    top = top.sort_values(["rev", "l_orderkey"], ascending=[False, True]).head(10)
    return pd.DataFrame({
        "l_orderkey": top["l_orderkey"].to_numpy(),
        "revenue": top["rev"].round(2).to_numpy(),
        "o_orderdate": top["o_orderdate"].to_numpy(),
    })


# --------------------------------------------------------------------- Q5-ish

def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """Six-table join: all dimensions broadcast; lineitem⋈orders bucketed."""
    nation = _read_pd(sf_dir, "nation")
    region = _read_pd(sf_dir, "region")
    supp = _read_pd(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    asia = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    nations = nation[nation["n_regionkey"].isin(asia)][["n_nationkey", "n_name"]]

    # orders ⋈ customer: both quasi-facts at scale → bucketed hash join
    # (customer never touches the driver); attaches c_nationkey.
    orders = partitioned_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            lambda df: df.rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas"),
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        on="c_custkey", num_buckets=16,
        lcols=["o_orderkey", "c_custkey"],
        rcols=["c_custkey", "c_nationkey"])

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    line = broadcast_join(line, supp.rename(columns={"s_suppkey": "l_suppkey"}),
                          on="l_suppkey")

    joined = partitioned_join(
        line,
        orders.map_batches(lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
                           batch_format="pandas"),
        on="l_orderkey", num_buckets=16,
        lcols=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
               "s_nationkey"],
        rcols=["l_orderkey", "c_nationkey"])

    nat_ref_names = dict(zip(nations["n_nationkey"], nations["n_name"]))

    def local_volume(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[(batch["s_nationkey"] == batch["c_nationkey"])
                  & batch["s_nationkey"].isin(nat_ref_names)]
        if m.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype=object),
                                 "rev": pd.Series(dtype="float64")})
        rev = m["l_extendedprice"] * (1 - m["l_discount"])
        out = pd.DataFrame({"n_name": m["s_nationkey"].map(nat_ref_names), "rev": rev})
        return out.groupby("n_name", as_index=False)["rev"].sum()

    partials = joined.map_batches(local_volume, batch_format="pandas")
    out = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue")).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out


# ---------------------------------------------------------------- misc plans

def q_distinct_segments(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = ds.unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k = per-batch local top-k → tiny driver merge (no full sort)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["o_totalprice", "o_orderkey"],
                                 ascending=[False, True]).head(10)

    cand = ds.map_batches(local_top, batch_format="pandas").to_pandas()
    out = cand.sort_values(["o_totalprice", "o_orderkey"],
                           ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def q_customer_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast dimension join + grouped aggregate."""
    nation = _read_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    joined = broadcast_join(
        cust, nation.rename(columns={"n_nationkey": "c_nationkey"}), on="c_nationkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).agg(
            n_customers=("c_custkey", "size"), total_acctbal=("c_acctbal", "sum"))

    out = (joined.map_batches(partial, batch_format="pandas")
           .groupby("n_name")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("total_acctbal", alias_name="total_acctbal"))
           .to_pandas())
    out["n_customers"] = out["n_customers"].astype("int64")
    out["total_acctbal"] = out["total_acctbal"].round(2)
    return out


def q_brand_volume(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ part (broadcast) → per-brand quantity."""
    part = _read_pd(sf_dir, "part", ["p_partkey", "p_brand"])
    line = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    joined = broadcast_join(
        line, part.rename(columns={"p_partkey": "l_partkey"}), on="l_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_brand", as_index=False).agg(
            n_items=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))

    out = (joined.map_batches(partial, batch_format="pandas")
           .groupby("p_brand")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("sum_qty", alias_name="sum_qty"))
           .to_pandas())
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type — windowing = truncate + groupby."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    from nexus_forge_ray.ops.agg import hash_groupby_agg

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h")
        return df

    out = hash_groupby_agg(
        ds.map_batches(windowed, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        num_buckets=16).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out


def q_user_activity(sf_dir: str) -> pd.DataFrame:
    """Per-user event stats: classic partial-agg → groupby pattern."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    from nexus_forge_ray.ops.agg import hash_groupby_agg
    out = hash_groupby_agg(
        ds, "user_id",
        {"n_events": ("value", "count"), "sum_value": ("value", "sum"),
         "max_value": ("value", "max")}, num_buckets=16).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    out["max_value"] = out["max_value"].round(2)
    return out


def q_events_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type mean/stddev via re-aggregable partials (sum, sumsq,
    count) — the distributed-moments pattern; stddev_samp formula matches
    SQL's."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["value_sq"] = df["value"] ** 2
        return df

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"), "event_type",
        {"s": ("value", "sum"), "ss": ("value_sq", "sum"),
         "n": ("value", "count")}, num_buckets=4).to_pandas()
    n = agg["n"].astype(float)
    mean = agg["s"] / n
    var = (agg["ss"] - agg["s"] ** 2 / n) / (n - 1)
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n_events": agg["n"].astype("int64"),
        "avg_value": mean.round(2),
        "std_value": np.sqrt(var.clip(lower=0)).round(2),
    })
    return out


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Sessionization: per-user sessions split at >30-min gaps (stream-shaped
    op; Ray Data has no watermarks, so the input is treated as a partitioned
    log: bucket by user hash, sort within user, cumulative session ids).
    Session ids are 1-based in event-time order — matches the SQL window
    formulation exactly.
    """
    from nexus_forge_ray.utils import stable_hash_u64
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["user_id"]) % np.uint64(16)) \
            .astype("int32")
        return df

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        gap = g.groupby("user_id")["ts"].diff()
        new_session = gap.isna() | (gap > pd.Timedelta(minutes=30))
        g["session_id"] = new_session.groupby(g["user_id"]).cumsum().astype("int64")
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out

    return ds.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(sessionize, batch_format="pandas")


def q_events_median(sf_dir: str) -> pd.DataFrame:
    """Exact grouped median (quantile_cont 0.5 / linear interpolation).
    Exact quantiles need the group's values co-located, so this shuffles
    (event_type, value) pairs once — fine for low-cardinality keys like
    event_type; at high key cardinality use a sketch (the distributed-moments
    pattern in q_events_stats) instead."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def med(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "median_value": [round(float(np.percentile(
                group["value"].to_numpy(), 50, method="linear")), 2)],
        })

    return ds.groupby("event_type").map_groups(med, batch_format="pandas") \
        .to_pandas()


def q_events_running(sf_dir: str) -> pd.DataFrame:
    """Per-user running sum in event-time order (cumulative window op).
    Partitioned-log shape like sessionization: bucket by user hash so each
    user's events land in one group, sort within the group, cumsum. (user_id,
    ts) is unique in the fixture, so the order — and the float accumulation
    order, which the oracle must reproduce bit-for-bit — is deterministic."""
    from nexus_forge_ray.utils import stable_hash_u64
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["user_id"]) % np.uint64(16)) \
            .astype("int32")
        return df

    def running(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        g["run_sum"] = g.groupby("user_id")["value"].cumsum().round(2)
        return g[["user_id", "ts", "run_sum"]]

    return ds.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(running, batch_format="pandas")


def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct users per tumbling hour window, in ONE shuffle: the
    map side shrinks to distinct (window, user) pairs per batch and buckets
    by hash(window) — every pair of a window co-locates, so the final stage
    dedups across batches and counts in the same pass. The exchange moves
    pre-deduped pairs only, never raw events."""
    from nexus_forge_ray.utils import stable_hash_u64
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"window_start": df["ts"].dt.floor("h"),
                            "user_id": df["user_id"]}) \
            .drop_duplicates()
        out["__bkt"] = (stable_hash_u64(out["window_start"])
                        % np.uint64(16)).astype("int32")
        return out

    def count(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["window_start", "user_id"])
        out = g.groupby("window_start", as_index=False) \
            .agg(n_users=("user_id", "size"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return ds.map_batches(pairs, batch_format="pandas") \
        .groupby("__bkt").map_groups(count, batch_format="pandas") \
        .to_pandas()[["window_start", "n_users"]]


def q_events_top_users(sf_dir: str) -> pd.DataFrame:
    """Top-3 users by summed value per tumbling hour — windowed top-k as a
    composition: partial-agg groupby to (window, user, sum), then
    grouped_topk so the second shuffle moves k x windows rows only."""
    from nexus_forge_ray.ops.agg import grouped_topk, hash_groupby_agg
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"window_start": df["ts"].dt.floor("h"),
                             "user_id": df["user_id"],
                             "value": df["value"]})

    sums = hash_groupby_agg(ds.map_batches(windowed, batch_format="pandas"),
                            ["window_start", "user_id"],
                            {"sum_value": ("value", "sum")}, num_buckets=16)
    top = grouped_topk(sums, "window_start", "sum_value", k=3,
                       ascending=False, tiebreak=["user_id"]).to_pandas()
    top["sum_value"] = top["sum_value"].round(2)
    return top[["window_start", "user_id", "sum_value"]]


def q_events_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding (hopping) window aggregate: 1-hour windows every 30 minutes.
    Each event maps to exactly its two covering windows (vectorized assign +
    concat), then the usual partial-agg bucketed groupby — windowing is an
    explode, never a shuffle of raw events per window."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        w0 = df["ts"].dt.floor("30min")
        a = pd.DataFrame({"event_type": df["event_type"],
                          "window_start": w0, "value": df["value"]})
        b = a.copy()
        b["window_start"] = w0 - pd.Timedelta(minutes=30)
        return pd.concat([a, b], ignore_index=True)

    out = hash_groupby_agg(
        ds.map_batches(windows, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        num_buckets=16).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out


def q_events_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join: each purchase event joins the same user's most recent
    click at or before it (bucketed-by-user merge_asof; see ops.joins
    .asof_join for the partitioning assumption)."""
    from nexus_forge_ray.ops.joins import asof_join
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    purchases = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "purchase",
                          ["user_id", "ts", "value"]],
        batch_format="pandas")
    clicks = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "click",
                          ["user_id", "ts", "value"]]
        .rename(columns={"value": "click_value"})
        .assign(click_ts=lambda d: d["ts"]),
        batch_format="pandas")
    out = asof_join(purchases, clicks, on="ts", by="user_id",
                    lcols=["user_id", "ts", "value"],
                    rcols=["user_id", "ts", "click_ts", "click_value"],
                    num_buckets=16).to_pandas()
    return out[["user_id", "ts", "value", "click_ts", "click_value"]]


def q_events_range(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: every (purchase, click) pair of the same user
    with the click in the 30 minutes before the purchase (bucketed-by-user
    equi-merge + vectorized range mask, ops.joins.range_join)."""
    from nexus_forge_ray.ops.joins import range_join
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    purchases = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "purchase", ["user_id", "ts"]],
        batch_format="pandas")
    clicks = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "click", ["user_id", "ts"]]
        .rename(columns={"ts": "click_ts"}),
        batch_format="pandas")
    out = range_join(purchases, clicks, by="user_id", on="ts",
                     low=-pd.Timedelta(minutes=30), high=pd.Timedelta(0),
                     r_on="click_ts",
                     lcols=["user_id", "ts"],
                     rcols=["user_id", "click_ts"],
                     num_buckets=16).to_pandas()
    return out[["user_id", "ts", "click_ts"]]


def q_customers_no_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join (broadcast key set): customers without any big order.

    The big-order key set is computed DISTRIBUTED — filter + per-batch dedup
    inside map_batches, bucketed distinct — so only the final (small) key set
    is collected and broadcast; the orders fact table never hits the driver.
    """
    from nexus_forge_ray.ops.agg import distinct_rows
    from nexus_forge_ray.ops.joins import anti_join
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = distinct_rows(
        orders.map_batches(
            lambda df: df.loc[df["o_totalprice"] > 300000, ["o_custkey"]],
            batch_format="pandas"),
        "o_custkey", num_buckets=8).to_pandas()["o_custkey"]
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = anti_join(cust, big.tolist(), "c_custkey").to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype=object)})
    return out[["c_custkey", "c_name"]]


def q_order_priority_count(sf_dir: str) -> pd.DataFrame:
    """Grouped semi condition, fully distributed: per-order max(l_shipdate)
    via bucketed partial aggregation, bucketed hash join against orders, then
    a late-shipment filter and a tiny priority groupby. The lineitem fact
    table never touches the driver."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    max_ship = hash_groupby_agg(
        line, "l_orderkey", {"max_ship": ("l_shipdate", "max")},
        num_buckets=16)
    joined = partitioned_join(
        max_ship.map_batches(
            lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
            batch_format="pandas"),
        orders, on="o_orderkey", num_buckets=16,
        lcols=["o_orderkey", "max_ship"],
        rcols=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def late(df: pd.DataFrame) -> pd.DataFrame:
        mx = pd.to_datetime(df["max_ship"])  # union padding can widen dtype
        return df[mx > df["o_orderdate"] + pd.Timedelta(days=60)]

    flagged = joined.map_batches(late, batch_format="pandas")
    out = hash_groupby_agg(flagged, "o_orderpriority",
                           {"n_orders": ("o_orderkey", "count")},
                           num_buckets=4).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (long -> wide feature matrix): per-hour event counts, one
    column per event type. Conditional partial counts inside map_batches,
    so the shuffle moves one pre-pivoted row per (batch, hour) — the pivot
    itself never reshuffles."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"window_start": df["ts"].dt.floor("h")})
        for t in EVENT_TYPES:
            out[f"n_{t}"] = (df["event_type"] == t).astype("int64")
        return out

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"), "window_start",
        {f"n_{t}": (f"n_{t}", "sum") for t in EVENT_TYPES},
        num_buckets=16).to_pandas()
    for t in EVENT_TYPES:
        agg[f"n_{t}"] = agg[f"n_{t}"].astype("int64")
    return agg


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (subtotal hierarchy): order revenue by market segment and
    order priority, with per-segment subtotals and a grand total. The
    finest level is a bucketed join + partial-agg groupby; subtotals
    derive from those ~25 aggregated rows on the driver — never from raw
    data (the standard distributed rollup shape)."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_join
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
                     batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderpriority", "o_totalprice"])
    joined = partitioned_join(
        orders, cust, on="o_custkey", num_buckets=16,
        lcols=["o_custkey", "o_orderpriority", "o_totalprice"],
        rcols=["o_custkey", "c_mktsegment"])
    base = hash_groupby_agg(
        joined, ["c_mktsegment", "o_orderpriority"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")}, num_buckets=8).to_pandas()
    seg = base.groupby("c_mktsegment", as_index=False).agg(
        revenue=("revenue", "sum"), n_orders=("n_orders", "sum"))
    seg["o_orderpriority"] = "ALL"
    total = pd.DataFrame({"c_mktsegment": ["ALL"], "o_orderpriority": ["ALL"],
                          "revenue": [base["revenue"].sum()],
                          "n_orders": [base["n_orders"].sum()]})
    out = pd.concat([base, seg, total], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["c_mktsegment", "o_orderpriority", "revenue", "n_orders"]]


def q_events_gap(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event-gap stats (lag-diff window): bucket by user
    hash, sort each user's log once, vectorized diff, per-user aggregate
    inside the same group — one shuffle total."""
    from nexus_forge_ray.utils import stable_hash_u64
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["user_id"]) % np.uint64(16)) \
            .astype("int32")
        return df

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        gap = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        g = g.assign(gap=gap).dropna(subset=["gap"])
        out = g.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"), avg_gap_s=("gap", "mean"),
            max_gap_s=("gap", "max"))
        out["n_gaps"] = out["n_gaps"].astype("int64")
        out["avg_gap_s"] = out["avg_gap_s"].round(2)
        out["max_gap_s"] = out["max_gap_s"].round(2)
        return out

    return ds.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(gaps, batch_format="pandas")


# ------------------------------------------------- round-2 additions (batch)

def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 analogue: revenue lost to returned items per customer,
    top 20. Returned-lineitem revenue aggregates per order inside one
    bucketed agg+join shuffle (never raw rows), re-aggregates per customer,
    then a bucketed join attaches customer attributes — the driver only
    ever sees per-block top-k partials."""
    from nexus_forge_ray.ops.agg import global_topk, hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_agg_join
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def returned_rev(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["l_returnflag"] == "R"]
        out = pd.DataFrame({
            "l_orderkey": m["l_orderkey"],
            "rev": m["l_extendedprice"] * (1 - m["l_discount"]),
        })
        return out.groupby("l_orderkey", as_index=False)["rev"].sum()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")
    per_order = partitioned_agg_join(
        line.map_batches(returned_rev, batch_format="pandas"),
        orders, on="l_orderkey", aggs={"rev": ("rev", "sum")}, num_buckets=16,
        lcols=["l_orderkey", "rev"], rcols=["l_orderkey", "o_custkey"])
    per_cust = hash_groupby_agg(per_order, "o_custkey",
                                {"rev": ("rev", "sum")}, num_buckets=16)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas")
    joined = partitioned_join(
        per_cust, cust, on="o_custkey", num_buckets=16,
        lcols=["o_custkey", "rev"],
        rcols=["o_custkey", "c_name", "c_acctbal"])

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = df["rev"].round(2)
        return df[["o_custkey", "c_name", "c_acctbal", "revenue"]]

    top = global_topk(joined.map_batches(rounded, batch_format="pandas"),
                      ["revenue", "o_custkey"], 20, ascending=[False, True])
    top = top.rename(columns={"o_custkey": "c_custkey"})
    return top[["c_custkey", "c_name", "c_acctbal", "revenue"]]


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 analogue (decorrelated subquery): per-part 20%-of-average
    quantity threshold computed by bucketed partial aggregation, joined back
    onto lineitem in ONE bucketed shuffle (agg side is one row per part), then
    a filtered global sum. The classic correlated-subquery -> agg+join plan."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    line = _read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice"])
    thr = hash_groupby_agg(
        line, "l_partkey",
        {"qty_sum": ("l_quantity", "sum"), "qty_n": ("l_quantity", "count")},
        num_buckets=16)
    joined = partitioned_join(
        line, thr, on="l_partkey", num_buckets=16,
        lcols=["l_partkey", "l_quantity", "l_extendedprice"],
        rcols=["l_partkey", "qty_sum", "qty_n"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        small = df[df["l_quantity"] < 0.2 * (df["qty_sum"] / df["qty_n"])]
        return pd.DataFrame({"s": [float(small["l_extendedprice"].sum())]})

    total = joined.map_batches(partial, batch_format="pandas") \
        .to_pandas()["s"].sum()
    return pd.DataFrame({"avg_yearly": [round(total / 7.0, 2)]})


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 analogue: orders whose total quantity exceeds 200, with
    customer names, top 100 by price. Per-order quantity via bucketed
    partial agg; the HAVING filter runs distributed before either join, so
    both joins see only the qualifying (small) key set."""
    from nexus_forge_ray.ops.agg import global_topk, hash_groupby_agg
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    qty = hash_groupby_agg(line, "l_orderkey",
                           {"sum_qty": ("l_quantity", "sum")}, num_buckets=16)
    big = qty.map_batches(lambda df: df[df["sum_qty"] > 200],
                          batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    joined = partitioned_join(
        big.map_batches(
            lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
            batch_format="pandas"),
        orders, on="o_orderkey", num_buckets=16,
        lcols=["o_orderkey", "sum_qty"],
        rcols=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas")
    full = partitioned_join(
        joined, cust, on="o_custkey", num_buckets=16,
        lcols=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
               "sum_qty"],
        rcols=["o_custkey", "c_name"])
    top = global_topk(full, ["o_totalprice", "o_orderkey"], 100,
                      ascending=[False, True])
    top = top.rename(columns={"o_custkey": "c_custkey"})
    top["sum_qty"] = top["sum_qty"].astype("float64")
    return top[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


def q_price_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation via distributed moments: each batch emits the six
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy); the driver combines a
    handful of partial rows. One pass, no shuffle."""
    line = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(dtype="float64")
        y = df["l_extendedprice"].to_numpy(dtype="float64")
        return pd.DataFrame({
            "n": [float(len(x))], "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            "sxy": [(x * y).sum()],
        })

    m = line.map_batches(moments, batch_format="pandas").to_pandas().sum()
    cov = m["sxy"] - m["sx"] * m["sy"] / m["n"]
    vx = m["sxx"] - m["sx"] ** 2 / m["n"]
    vy = m["syy"] - m["sy"] ** 2 / m["n"]
    corr = cov / np.sqrt(vx * vy)
    return pd.DataFrame({"corr_qty_price": [round(float(corr), 6)]})


def q_price_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width histogram of order totals (50k buckets): vectorized
    floor-div binning inside map_batches, then a tiny bucketed count/min/max
    groupby — the distributed histogram shape."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": np.floor(df["o_totalprice"] / 50000.0).astype("int64"),
            "o_totalprice": df["o_totalprice"],
        })

    out = hash_groupby_agg(
        orders.map_batches(binned, batch_format="pandas"), "bucket",
        {"n": ("o_totalprice", "count"),
         "min_price": ("o_totalprice", "min"),
         "max_price": ("o_totalprice", "max")}, num_buckets=4).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["min_price"] = out["min_price"].round(2)
    out["max_price"] = out["max_price"].round(2)
    return out


def q_supplier_best(sf_dir: str) -> pd.DataFrame:
    """argmax-per-group: the highest-acctbal supplier in each nation
    (deterministic tie-break on s_suppkey), nation names attached from a
    broadcast dimension. grouped_topk keeps the shuffle at one row per
    (batch, nation)."""
    from nexus_forge_ray.ops.agg import grouped_topk
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    best = grouped_topk(supp, "s_nationkey", "s_acctbal", 1,
                        ascending=False, tiebreak=["s_suppkey"],
                        num_buckets=4).to_pandas()
    nation = _read_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    out = best.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    return out[["n_name", "s_suppkey", "s_name", "s_acctbal"]]


def q_events_json(sf_dir: str) -> pd.DataFrame:
    """Semi-structured parsing: extract the integer `k` field from the JSON
    `props` column with one vectorized regex per batch (no per-row
    json.loads), then a tiny bucketed aggregate per event type."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "k": pd.to_numeric(k, errors="coerce").astype("float64"),
            "one": np.ones(len(df)),
        })

    agg = hash_groupby_agg(
        ds.map_batches(parse, batch_format="pandas"), "event_type",
        {"sum_k": ("k", "sum"), "n": ("one", "sum")}, num_buckets=4) \
        .to_pandas()
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype("int64"),
        "avg_k": (agg["sum_k"] / agg["n"]).round(2),
    })


def q_balance_buckets(sf_dir: str) -> pd.DataFrame:
    """Distributed FULL OUTER join: per-1000 account-balance buckets of
    customers vs suppliers. Both sides pre-aggregate (bucketed), then the
    outer merge runs inside the co-partitioned bucket groups — unmatched
    buckets survive from either side with zero fills."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg

    def bucketize(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "bucket": np.floor(df[col] / 1000.0).astype("int64"),
                "one": np.ones(len(df))})
        return fn

    cust = hash_groupby_agg(
        _read(sf_dir, "customer", ["c_acctbal"]).map_batches(
            bucketize("c_acctbal"), batch_format="pandas"),
        "bucket", {"n_cust": ("one", "sum")}, num_buckets=4)
    supp = hash_groupby_agg(
        _read(sf_dir, "supplier", ["s_acctbal"]).map_batches(
            bucketize("s_acctbal"), batch_format="pandas"),
        "bucket", {"n_supp": ("one", "sum")}, num_buckets=4)
    out = partitioned_join(cust, supp, on="bucket", how="outer",
                           num_buckets=4,
                           lcols=["bucket", "n_cust"],
                           rcols=["bucket", "n_supp"]).to_pandas()
    out["n_cust"] = pd.to_numeric(out["n_cust"], errors="coerce") \
        .fillna(0).astype("int64")
    out["n_supp"] = pd.to_numeric(out["n_supp"], errors="coerce") \
        .fillna(0).astype("int64")
    return out[["bucket", "n_cust", "n_supp"]]


def q_events_late(sf_dir: str) -> pd.DataFrame:
    """Watermark / late-data accounting (the streaming-completeness rollup):
    with watermark = max(event_time) - 24h over the processed log, split
    each hourly window's counts into on-time vs late (event in a window
    whose close predates the watermark). The watermark is ONE driver scalar
    from a distributed max; the split is a vectorized mask inside the same
    partial-agg pass — no extra shuffle over the raw log."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["ts"])
    wm = ds.max("ts") - pd.Timedelta(hours=24)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].dt.floor("h")
        late = (w + pd.Timedelta(hours=1)) < wm
        return pd.DataFrame({
            "window_start": w,
            "n_on_time": (~late).astype("int64"),
            "n_late": late.astype("int64"),
        })

    out = hash_groupby_agg(
        ds.map_batches(split, batch_format="pandas"), "window_start",
        {"n_on_time": ("n_on_time", "sum"), "n_late": ("n_late", "sum")},
        num_buckets=16).to_pandas()
    out["n_on_time"] = out["n_on_time"].astype("int64")
    out["n_late"] = out["n_late"].astype("int64")
    return out[["window_start", "n_on_time", "n_late"]]


def q_events_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-group feature normalization (z-score within event type) — the
    standard pre-training feature scaling move, expressed as ONE bucketed
    window shuffle attaching sum/sumsq/count per group
    (`ops.agg.attach_group_stats`), then a vectorized normalize."""
    from nexus_forge_ray.ops.agg import attach_group_stats
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v2"] = df["value"] * df["value"]
        return df

    w = attach_group_stats(
        ds.map_batches(sq, batch_format="pandas"), "event_type",
        {"s": ("value", "sum"), "s2": ("v2", "sum"), "n": ("value", "size")},
        num_buckets=8)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        mean = df["s"] / df["n"]
        var = (df["s2"] / df["n"] - mean * mean).clip(lower=0)
        z = (df["value"] - mean) / np.sqrt(var)
        return pd.DataFrame({"event_id": df["event_id"],
                             "z": z.round(4)})

    return w.map_batches(norm, batch_format="pandas")


def q_events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users grouped by their first active day, counted
    at each day offset they return — the classic growth-analytics shape.
    Distributed plan: per-(user, day) activity dedup (bucketed), per-user
    min day (one grouped agg), ONE bucketed join back on user_id, then a
    tiny (cohort, offset) grouped count — user activity never reaches the
    driver."""
    from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_join
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    act = distinct_rows(
        ev.map_batches(lambda df: pd.DataFrame(
            {"user_id": df["user_id"],
             "day": pd.to_datetime(df["ts"]).dt.floor("D")}),
            batch_format="pandas"),
        ["user_id", "day"], num_buckets=16)
    act = act.materialize()     # feeds the cohort agg AND the join
    first = hash_groupby_agg(act, "user_id", {"cohort": ("day", "min")},
                             num_buckets=16)
    joined = partitioned_join(act, first, on="user_id", num_buckets=16,
                              lcols=["user_id", "day"],
                              rcols=["user_id", "cohort"])
    pairs = joined.map_batches(
        lambda df: pd.DataFrame({
            "cohort": pd.to_datetime(df["cohort"]).dt.strftime("%Y-%m-%d"),
            "offset": (pd.to_datetime(df["day"])
                       - pd.to_datetime(df["cohort"])).dt.days
            .astype("int64")}).groupby(["cohort", "offset"],
                                       as_index=False).size()
        .rename(columns={"size": "n_users"}), batch_format="pandas")
    out = hash_groupby_agg(pairs, ["cohort", "offset"],
                           {"n_users": ("n_users", "sum")},
                           num_buckets=8).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort", "offset"]).reset_index(drop=True)


def q_events_funnel(sf_dir: str) -> pd.DataFrame:
    """Funnel conversion (view -> later purchase, per user): users bucket
    by hash so each user's log lands in one group; the first-view time and
    the converted test are vectorized inside the group; the driver sums a
    handful of per-bucket partials."""
    from nexus_forge_ray.utils import stable_hash_u64
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["user_id"]) % np.uint64(16)) \
            .astype("int32")
        return df

    def funnel(group: pd.DataFrame) -> pd.DataFrame:
        views = group[group["event_type"] == "view"]
        fv = views.groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "first_view"})
        buys = group[group["event_type"] == "purchase"]
        m = buys.merge(fv, on="user_id")
        conv = m.loc[m["ts"] > m["first_view"], "user_id"].nunique()
        return pd.DataFrame({"viewed": [int(len(fv))],
                             "converted": [int(conv)]})

    parts = ds.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(funnel, batch_format="pandas") \
        .to_pandas()
    return pd.DataFrame({"n_viewed": [int(parts["viewed"].sum())],
                         "n_converted": [int(parts["converted"].sum())]})


def q_events_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-type p99 threshold and the count of values strictly above it —
    the percentile-gate shape a quality-filtering pipeline uses. Thresholds
    come from one bucketed exact-percentile shuffle (unrounded); the
    counting pass broadcasts the tiny (type, p99) map and pre-sums per
    batch. Counts are ulp-robust: an interpolated threshold lies strictly
    between two adjacent order statistics (or exactly on one where the
    interpolation is exact), so `value > p99` is stable under last-bit
    float differences between numpy and DuckDB."""
    import ray

    from nexus_forge_ray.ops.agg import grouped_percentiles, hash_groupby_agg
    ds = _read(sf_dir, "events", ["event_type", "value"])
    th = grouped_percentiles(ds, "event_type", "value", {"p99": 99.0},
                             ndigits=None).to_pandas()
    thr_ref = ray.put(dict(zip(th["event_type"], th["p99"])))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        lim = df["event_type"].map(t).to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "out": (df["value"].to_numpy() > lim).astype("int64")})

    counts = hash_groupby_agg(
        ds.map_batches(flag, batch_format="pandas"),
        "event_type", {"n_outliers": ("out", "sum")}).to_pandas()
    res = th.merge(counts, on="event_type")
    res["p99"] = pc.round(pa.array(res["p99"], type=pa.float64()), ndigits=2,
                          round_mode="half_towards_infinity").to_pandas()
    res["n_outliers"] = res["n_outliers"].astype("int64")
    return res[["event_type", "p99", "n_outliers"]]


def orphan_count(fact: "ray.data.Dataset", col: str,
                 dim: "ray.data.Dataset", dim_col: str,
                 num_buckets: int = 16,
                 broadcast_cap: int = 1_000_000) -> int:
    """Number of `fact` rows whose `col` has no match in `dim[dim_col]`.

    Hybrid: a dim small enough to broadcast ships once via ray.put
    (sorted-array membership per batch, zero shuffle); above the cap the
    dim is a quasi-fact, so the fact side pre-aggregates to per-key counts
    and a bucketed anti-join does the membership — neither side's key
    column ever reaches the driver. Both paths are equality-tested
    (tests/test_relational.py)."""
    import ray

    from nexus_forge_ray.ops.agg import hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_anti_join

    dim = dim.materialize()
    if dim.count() <= broadcast_cap:
        dpd = dim.to_pandas()  # an empty dataset drops its schema entirely
        keys_ref = ray.put(np.sort(dpd[dim_col].to_numpy())
                           if dim_col in dpd.columns else np.array([]))

        def part(df: pd.DataFrame) -> pd.DataFrame:
            k = ray.get(keys_ref)
            vals = df[col].to_numpy()
            idx = np.searchsorted(k, vals)
            idx[idx >= len(k)] = len(k) - 1
            miss = k[idx] != vals if len(k) else np.ones(len(vals), bool)
            return pd.DataFrame({"n": [int(miss.sum())]})

        return int(fact.map_batches(part, batch_format="pandas").sum("n") or 0)

    # scale path: shrink the shuffle to one row per distinct fact key
    per_key = hash_groupby_agg(fact, col, {"cnt": (col, "count")},
                               num_buckets=num_buckets)
    keys = dim.map_batches(
        lambda df, c=col, dc=dim_col: pd.DataFrame({c: df[dc]}),
        batch_format="pandas")
    orphan_rows = partitioned_anti_join(per_key, keys, on=col,
                                        num_buckets=num_buckets,
                                        lcols=[col, "cnt"])
    return int(orphan_rows.map_batches(
        lambda df: pd.DataFrame({"n": [int(df["cnt"].sum())]}),
        batch_format="pandas").sum("n") or 0)


def q_integrity_check(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit (relation, n_rows, n_orphans) over the
    four FK edges, all via `orphan_count`: small dims broadcast once, a
    quasi-fact side (orders keys vs lineitem; any dim above the cap) goes
    through per-key counts + a bucketed anti-join — no fact table and no
    above-cap key column ever reaches the driver."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    part_k = _read(sf_dir, "part", ["p_partkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    n_orders = orders.count()
    n_line = line.count()

    o_orph = orphan_count(orders, "o_custkey", cust, "c_custkey")
    l_part_orph = orphan_count(line, "l_partkey", part_k, "p_partkey")
    l_supp_orph = orphan_count(line, "l_suppkey", supp, "s_suppkey")
    # fact->fact: orders keys are never broadcastable
    l_ord_orph = orphan_count(line, "l_orderkey", orders.select_columns(
        ["o_orderkey"]), "o_orderkey", broadcast_cap=0)

    return pd.DataFrame({
        "relation": ["lineitem->orders", "lineitem->part",
                     "lineitem->supplier", "orders->customer"],
        "n_rows": np.array([n_line, n_line, n_line, n_orders], dtype="int64"),
        "n_orphans": np.array([l_ord_orph, l_part_orph, l_supp_orph, o_orph],
                              dtype="int64")})


def q_profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Column profile of lineitem's numeric measures — nulls/min/max from
    map-side partials, exact distinct counts via one bucketed shuffle of
    per-batch-deduplicated (col, value) pairs (`ops.profile`)."""
    from nexus_forge_ray.ops.profile import profile_numeric
    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    return profile_numeric(_read(sf_dir, "lineitem", cols), cols)


def q_events_moving_avg(sf_dir: str) -> pd.DataFrame:
    """Centered 3-bucket moving average over per-type hourly counts — the
    Elasticsearch moving_avg pipeline-agg shape. The raw events reduce
    map-side before the hourly groupby; the smoothing pass shuffles only
    the (type, hour, n) bucket table by type and runs one vectorized
    rolling mean per group."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hour": df["ts"].dt.floor("h")})

    hourly = hash_groupby_agg(
        ds.map_batches(windowed, batch_format="pandas"),
        ["event_type", "hour"], {"n": ("hour", "count")}, num_buckets=16)

    def smooth(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in group.groupby("event_type", sort=False):
            g = g.sort_values("hour", kind="mergesort").copy()
            g["ma3"] = g["n"].rolling(3, center=True, min_periods=1).mean()
            out.append(g)
        return pd.concat(out, ignore_index=True)[
            ["event_type", "hour", "n", "ma3"]]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        from nexus_forge_ray.utils import stable_hash_u64
        df = df.copy()
        df["__bucket"] = (stable_hash_u64(df["event_type"])
                          % np.uint64(8)).astype("int32")
        return df

    out = hourly.map_batches(bucket, batch_format="pandas") \
        .groupby("__bucket").map_groups(smooth, batch_format="pandas") \
        .to_pandas()
    out["n"] = out["n"].astype("int64")
    out["ma3"] = pc.round(pa.array(out["ma3"], type=pa.float64()), ndigits=2,
                          round_mode="half_towards_infinity").to_pandas()
    return out


def q_smb_join(sf_dir: str) -> pd.DataFrame:
    """Sort-merge-bucket layout end-to-end (`ops.smb`): orders and customer
    are bucket-written once (hash(custkey) % 8, hive dirs + manifest), then
    joined bucket-by-bucket with ZERO exchange — each task reads one bucket
    directory from each side. The aggregate on top is the usual map-side
    partial + tiny groupby. At 100 TB this is the pay-the-shuffle-once
    layout for tables joined every run."""
    import shutil
    import tempfile

    from nexus_forge_ray.ops.agg import hash_groupby_agg
    from nexus_forge_ray.ops.smb import bucketed_join_read, bucketed_write
    root = tempfile.mkdtemp(prefix="smb_")
    try:
        orders = _read(sf_dir, "orders", ["o_custkey"])
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
            .map_batches(lambda df: df.rename(columns={"c_custkey":
                                                       "o_custkey"}),
                         batch_format="pandas")
        bucketed_write(orders, f"{root}/orders", "o_custkey", num_buckets=8)
        bucketed_write(cust, f"{root}/customer", "o_custkey", num_buckets=8)
        joined = bucketed_join_read(f"{root}/orders", f"{root}/customer",
                                    "o_custkey")
        out = hash_groupby_agg(joined, "c_nationkey",
                               {"n_orders": ("o_custkey", "count")},
                               num_buckets=4).to_pandas()
        out["c_nationkey"] = out["c_nationkey"].astype("int64")
        out["n_orders"] = out["n_orders"].astype("int64")
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-type p25/p50/p90 of value via `grouped_percentiles` —
    one bucketed shuffle of (event_type, value) pairs, all three quantiles
    from a single sorted pass per group (SQL quantile_cont semantics)."""
    from nexus_forge_ray.ops.agg import grouped_percentiles
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_percentiles(
        ds, "event_type", "value",
        {"p25": 25.0, "p50": 50.0, "p90": 90.0}).to_pandas()


def q_events_first_n(sf_dir: str) -> pd.DataFrame:
    """Each user's first 3 events with their rank — ROW_NUMBER() OVER
    (PARTITION BY user ORDER BY ts) via `grouped_row_number`: the partial
    stage pre-cuts every batch to its 3 earliest rows per user, so the
    shuffle moves at most 3 x users rows. (user_id, ts) is unique in the
    fixture, so ranks are deterministic."""
    from nexus_forge_ray.ops.agg import grouped_row_number
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    out = grouped_row_number(ds, "user_id", ["ts"], out="rn",
                             keep_first=3).to_pandas()
    out["rn"] = out["rn"].astype("int64")
    return out[["user_id", "ts", "event_type", "rn"]]
