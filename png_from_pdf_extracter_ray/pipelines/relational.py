"""Relational operators over the driver testdata tables.

These widen the engine beyond the reference's own operator set (the
reference has no joins/sorts/aggregates beyond per-email gather, SURVEY
§2.4) into the standard shapes a data-processing engine must cover, each
expressed scale-first:

- **pre-aggregated groupby** (``grouped_sum``): partial sums/counts are
  combined inside ``map_batches`` (one row per key per batch) before the
  hash shuffle, so the all-to-all exchange moves partials, not rows —
  the combiner pattern from the Ray Data guide;
- **broadcast join** (``broadcast_join``): the small side is ``ray.put``
  once and merged per batch inside ``map_batches`` — no shuffle;
- **sort/top-k**: Ray's distributed sort + limit.

Each public function matches an ``oracle_sql()`` entry in
``__ray_entry__.py`` with identical column names.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..stages.joins import bucketed_hash_join  # re-exported: queries compose it here


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# Per-worker-process cache of broadcast small sides (keyed by ObjectRef
# hex, bounded — same policy as dedup._WINNER_CACHE): without it every
# batch of a map_batches TASK pays a plasma fetch + deserialization of
# the broadcast dict/set.
_BCAST_CACHE: dict = {}


def _cached_broadcast(ref):  # noqa: ANN001, ANN202
    v = _BCAST_CACHE.get(ref.hex())
    if v is None:
        if len(_BCAST_CACHE) > 8:
            _BCAST_CACHE.clear()
        v = ray.get(ref)
        _BCAST_CACHE[ref.hex()] = v
    return v


def grouped_sum(
    ds: rd.Dataset,
    keys: list[str],
    compute: Callable[[pd.DataFrame], pd.DataFrame] | None,
    sum_cols: list[str],
    count_col: str | None = None,
) -> rd.Dataset:
    """Groupby with batch-local pre-aggregation before the shuffle.

    ``compute`` derives value columns on the raw batch; each batch is then
    reduced to one partial row per key, and only those partials shuffle.
    """

    def partial(df: pd.DataFrame) -> pa.Table:
        if compute is not None:
            df = compute(df)
        if count_col:
            df = df.assign(**{count_col: 1})
        cols = sum_cols + ([count_col] if count_col else [])
        out = df.groupby(keys, as_index=False, sort=False)[cols].sum()
        # emit Arrow so empty partials keep a real schema (empty pandas
        # blocks degrade to PandasBlockSchema(names=[]) downstream)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_col:
        aggs.append(Sum(count_col, alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def grouped_sum_arrow(
    ds: rd.Dataset,
    keys: list[str],
    compute: Callable[[pa.Table], pa.Table] | None,
    sum_cols: list[str],
    count_col: str | None = None,
) -> rd.Dataset:
    """Arrow-native ``grouped_sum``: the per-batch partial aggregation is
    a ``pyarrow.TableGroupBy`` — batches stay zero-copy Arrow end to end,
    no pandas conversion anywhere in the rollup.  ``compute`` maps the
    raw Arrow batch to a table containing ``keys + sum_cols``.
    """

    def partial(t: pa.Table) -> pa.Table:
        if compute is not None:
            t = compute(t)
        aggs = [(c, "sum") for c in sum_cols]
        if count_col:
            aggs.append(([], "count_all"))
        g = t.select(keys + sum_cols).group_by(keys).aggregate(aggs)
        names = keys + sum_cols + ([count_col] if count_col else [])
        produced = [f"{c}_sum" for c in sum_cols] + (["count_all"] if count_col else [])
        return g.select(keys + produced).rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_col:
        aggs.append(Sum(count_col, alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> rd.Dataset:
    """Join against a broadcast small side — ``ray.put`` once, merge per batch."""
    ref = ray.put(small)

    class Joiner:
        def __init__(self) -> None:
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            # Arrow out: an empty merge result keeps its schema
            return pa.Table.from_pandas(batch.merge(self.small, on=on, how=how), preserve_index=False)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# Query implementations (names mirror __ray_entry__.oracle_sql entries)
# ---------------------------------------------------------------------------


def topk(
    ds: rd.Dataset,
    by: list[str],
    ascending: list[bool],
    k: int,
) -> pd.DataFrame:
    """Distributed top-k WITHOUT a global sort: each batch is pruned to
    its local k best rows (vectorized sort+head), so only k rows per
    block reach the driver, where a final small sort picks the global k.
    The same pattern as similarity.cosine_topk — an all-to-all sort of
    the full table to keep k rows is the anti-pattern it replaces."""

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending).head(k)

    out = ds.map_batches(prune, batch_format="pandas").to_pandas()
    return out.sort_values(by, ascending=ascending, ignore_index=True).head(k)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape over lineitem (columns pruned at the read; Arrow
    kernels end to end — no pandas until the tiny final result)."""
    import pyarrow.compute as pc

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    cut = pd.Timestamp("1998-09-02").to_pydatetime()

    def compute(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cut)))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["l_quantity"],
                "sum_base_price": t["l_extendedprice"],
                "sum_disc_price": disc,
                "sum_charge": charge,
            }
        )

    out = grouped_sum_arrow(
        ds,
        ["l_returnflag", "l_linestatus"],
        compute,
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"],
        count_col="count_order",
    ).to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = out[c].round(2)
    return out


def lang_whitelist_filter(sf_dir: str, pattern: str = "en|de") -> rd.Dataset:
    """Whitelist-regex filter (≈ whitelist_service.py:26-38) over documents."""
    from ..stages.filters import filter_lang

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return filter_lang(ds, pattern)


def groupby_lang_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = grouped_sum_arrow(
        ds,
        ["lang"],
        lambda t: pa.table({"lang": t["lang"], "sum_n_chars": t["n_chars"]}),
        ["sum_n_chars"],
        count_col="n_docs",
    ).to_pandas()
    return out


def dedup_exact_text(sf_dir: str) -> rd.Dataset:
    """Exact dedup: one surviving doc_id (the min) per distinct text."""
    from ..stages.dedup import dedup_keep_first

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup_keep_first(ds, key="text", order_col="doc_id", num_buckets=16).select_columns(
        ["doc_id"]
    )


def top_longest_docs(sf_dir: str, k: int = 100) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return topk(ds, ["n_chars", "doc_id"], [False, True], k)


def customers_per_nation(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation (broadcast small side) → per-nation rollup."""
    nation = _read(sf_dir, "nation").to_pandas()  # 25 rows — broadcastable
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    joined = broadcast_join(cust, nation[["n_nationkey", "n_name"]].rename(columns={"n_nationkey": "c_nationkey"}), on="c_nationkey")
    out = grouped_sum(
        joined,
        ["n_name"],
        lambda df: df.assign(sum_acctbal=df["c_acctbal"]),
        ["sum_acctbal"],
        count_col="n_customers",
    ).to_pandas()
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    return out


def orders_priority_rollup(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = grouped_sum_arrow(
        ds,
        ["o_orderpriority"],
        lambda t: pa.table(
            {"o_orderpriority": t["o_orderpriority"], "sum_totalprice": t["o_totalprice"]}
        ),
        ["sum_totalprice"],
        count_col="n_orders",
    ).to_pandas()
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    return out


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (streaming-shaped aggregate)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def compute(t: pa.Table) -> pa.Table:
        # hour emitted as a string so the value-hash is representation-stable
        # across pandas ns / Arrow us / DuckDB timestamps.
        # cast to second precision first: Arrow's %S emits fractions
        floored = pc.floor_temporal(t["ts"], unit="hour").cast(pa.timestamp("s"))
        hour = pc.strftime(floored, format="%Y-%m-%d %H:%M:%S")
        return pa.table(
            {"event_type": t["event_type"], "hour": hour, "sum_value": t["value"]}
        )

    out = grouped_sum_arrow(ds, ["event_type", "hour"], compute, ["sum_value"], count_col="n_events").to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    return out


def orders_customer_join(sf_dir: str) -> pd.DataFrame:
    """Large⋈large: orders ⋈ customer via the explicit bucketed hash join,
    rolled up per market segment and order status."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderstatus", "o_totalprice"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = bucketed_hash_join(orders, cust, on="c_custkey", num_buckets=16)
    out = grouped_sum(
        joined,
        ["c_mktsegment", "o_orderstatus"],
        lambda df: df.assign(sum_totalprice=df["o_totalprice"]),
        ["sum_totalprice"],
        count_col="n_orders",
    ).to_pandas()
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    return out


def customers_without_orders(sf_dir: str, since: str = "1998-06-01") -> pd.DataFrame:
    """Anti-join (NOT IN / NOT EXISTS shape): customers with NO order on
    or after ``since``.  The right side ships only its (filtered,
    batch-deduped) key column through the bucket shuffle."""
    import pyarrow.compute as pc

    cut = pd.Timestamp(since).to_pydatetime()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    order_keys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cut)))
        .select(["o_custkey"])
        .rename_columns(["c_custkey"])
        .combine_chunks()
        .group_by(["c_custkey"])
        .aggregate([]),
        batch_format="pyarrow",
    )
    out = bucketed_hash_join(cust, order_keys, on="c_custkey", how="anti").to_pandas()
    if out.empty and list(out.columns) != ["c_custkey", "c_name"]:
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"), "c_name": pd.Series([], dtype=object)}
        )
    return out.sort_values("c_custkey", ignore_index=True)


def orders_count_per_customer(sf_dir: str) -> pd.DataFrame:
    """LEFT join: per-customer order count including zero-order customers
    (pre-aggregated counts bucket-join onto the customer table)."""
    counts = grouped_sum_arrow(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"],
        None,
        [],
        count_col="cnt",
    ).map_batches(lambda t: t.rename_columns(["c_custkey", "cnt"]), batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = bucketed_hash_join(cust, counts, on="c_custkey", how="left").to_pandas()
    j["n_orders"] = j["cnt"].fillna(0).astype("int64")
    return j[["c_custkey", "n_orders"]]


def distinct_mktsegments(sf_dir: str) -> pd.DataFrame:
    """DISTINCT via Dataset.unique (shuffle de-dup of one column)."""
    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


def _bucket_by(ds: rd.Dataset, col: str, num_buckets: int) -> rd.Dataset:
    """Attach a stable hash bucket of ``col`` — keyed stages then shuffle
    into B vectorizable groups instead of one Ray group per key."""
    from ..stages.dedup import stable_bucket_ids

    def add(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t[col], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def events_sessionize(sf_dir: str, gap_s: int = 1800, num_buckets: int = 64) -> pd.DataFrame:
    """Sessionization: per-user sessions split on ts gaps > ``gap_s``.

    Scale shape: users hash into B buckets (all events of a user
    co-locate) and the whole bucket is sessionized VECTORIZED — per-user
    shift/cumsum via pandas groupby inside the bucket, not one Ray group
    per user (billions of keys ⇒ per-key groups crawl).  Deterministic
    tie-break on event_id.  Output: one row per session.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id", sort=False)["ts"].shift()
        brk = ((g["ts"] - prev).dt.total_seconds() > gap_s) | prev.isna()
        g = g.assign(
            session_no=brk.groupby(g["user_id"], sort=False).cumsum().astype("int64")
        )
        out = g.groupby(["user_id", "session_no"], as_index=False, sort=False).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
        )
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_no", "n_events", "session_start"]]

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .to_pandas()
    )


def cumulative_order_value(sf_dir: str, custkey_max: int = 200) -> pd.DataFrame:
    """Running per-customer order-value cumsum (window function shape).

    Restricted to a custkey prefix so the SQL-checked result stays small.
    """
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["o_custkey"], custkey_max)),
        batch_format="pyarrow",
    )

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        g = g.assign(cum_totalprice=g["o_totalprice"].cumsum().round(2))
        return g[["o_orderkey", "o_custkey", "cum_totalprice"]]

    return ds.groupby("o_custkey").map_groups(windowed, batch_format="pandas").to_pandas()


def nations_per_region(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region").to_pandas()
    joined = broadcast_join(
        nation, region.rename(columns={"r_regionkey": "n_regionkey"}), on="n_regionkey"
    )
    return grouped_sum(joined, ["r_name"], None, [], count_col="n_nations").to_pandas()


def supplier_topk_acctbal(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k by account balance — batch-local prune, no all-to-all sort."""
    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])
    return topk(ds, ["s_acctbal", "s_suppkey"], [False, True], k)


def parts_by_brand(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    out = grouped_sum_arrow(
        ds,
        ["p_brand"],
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "sum_retail": t["p_retailprice"],
                "sum_size": t["p_size"],
            }
        ),
        ["sum_retail", "sum_size"],
        count_col="n_parts",
    ).to_pandas()
    out["sum_retail"] = out["sum_retail"].round(2)
    return out


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> pd.DataFrame:
    """TPC-H Q3 shape: semi-join (broadcast key set) + large⋈large
    bucketed hash join + pre-aggregated groupby + top-k.

    customer is filtered to one segment and its key set broadcast (a
    Bloom-filter stand-in); orders filters by date and semi-joins against
    that set inside ``map_batches``; the orders slim side then bucket-
    joins lineitem on orderkey; revenue partials combine per batch before
    the final small groupby.
    """
    import pyarrow.compute as pc

    cut = pd.Timestamp(cutoff)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], segment)),
        batch_format="pyarrow",
    )
    cust_df = cust.to_pandas()
    # empty Datasets drop column names through to_pandas — guard the edge
    cust_keys = set(cust_df["c_custkey"]) if len(cust_df) else set()
    if not cust_keys:
        return pd.DataFrame({"l_orderkey": [], "o_orderdate": [], "revenue": []})
    keys_ref = ray.put(cust_keys)

    def orders_filter(df: pd.DataFrame) -> pd.DataFrame:
        keys = _cached_broadcast(keys_ref)
        df = df[(df["o_orderdate"] < cut) & df["o_custkey"].isin(keys)]
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"],
                "o_orderdate": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_filter, batch_format="pandas"
    )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut.to_pydatetime()))).drop_columns(
            ["l_shipdate"]
        ),
        batch_format="pyarrow",
    )

    joined = bucketed_hash_join(items, orders, on="l_orderkey", num_buckets=16)
    agg = grouped_sum(
        joined,
        ["l_orderkey", "o_orderdate"],
        lambda df: df.assign(revenue=df["l_extendedprice"] * (1 - df["l_discount"])),
        ["revenue"],
    ).to_pandas()
    agg["revenue"] = agg["revenue"].round(2)
    return (
        agg.sort_values(["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )


def events_asof_last_purchase(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """As-of join: for each event, the user's most recent STRICTLY PRIOR
    'purchase' event (DuckDB ASOF JOIN is the oracle).

    Scale shape: users hash into B buckets and each bucket runs ONE
    vectorized ``pd.merge_asof(..., by="user_id")`` over the ts-sorted
    bucket — not one Ray group per user.  Partitioning assumption: both
    sides of the as-of are co-located by user hash."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        right = g[g["event_type"] == "purchase"][["user_id", "ts"]].assign(
            prev_purchase=lambda d: d["ts"]
        )
        out = pd.merge_asof(
            g[["event_id", "user_id", "ts"]],
            right,
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        prev = out["prev_purchase"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return pd.DataFrame({"event_id": out["event_id"], "prev_purchase": prev.fillna("")})

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(asof_bucket, batch_format="pandas")
        .to_pandas()
    )


def quantity_quantiles_by_returnflag(sf_dir: str) -> pd.DataFrame:
    """Grouped quantiles (p50/p90, linear interpolation) per returnflag."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "p50_qty": [round(g["l_quantity"].quantile(0.5), 4)],
                "p90_qty": [round(g["l_quantity"].quantile(0.9), 4)],
            }
        )

    return ds.groupby("l_returnflag").map_groups(q, batch_format="pandas").to_pandas()


def distinct_users_per_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT): per-batch pair dedup (combiner), then a
    per-group exact unique count — the pre-aggregation keeps the shuffle
    to distinct (event_type, user_id) pairs rather than raw events."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pair_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": [int(g["user_id"].nunique())],
            }
        )

    return (
        ds.map_batches(pair_dedup, batch_format="pandas")
        .groupby("event_type")
        .map_groups(count_unique, batch_format="pandas")
        .to_pandas()
    )


def events_sliding_window(sf_dir: str, size_s: int = 3600, slide_s: int = 1800) -> pd.DataFrame:
    """Sliding-window aggregate: 1-hour windows every 30 minutes.

    Each event explodes into its ``size/slide`` covering windows inside
    ``map_batches`` (no shuffle for the explode), then the standard
    pre-aggregated groupby.  Window starts are emitted as epoch seconds
    (int64) — representation-stable across engines.
    """
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    k = size_s // slide_s

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].astype("int64") // 1_000_000
        base = (epoch // slide_s) * slide_s
        frames = [
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "window_start": base - i * slide_s,
                    "sum_value": df["value"],
                }
            )
            for i in range(k)
        ]
        return pd.concat(frames, ignore_index=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = explode(df)
        df["n_events"] = 1
        return df.groupby(["event_type", "window_start"], as_index=False, sort=False)[
            ["sum_value", "n_events"]
        ].sum()

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n_events", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def union_account_holders(sf_dir: str) -> pd.DataFrame:
    """Set operator: customer ∪ supplier account balances (Dataset.union)."""
    cust = _read(sf_dir, "customer", ["c_name", "c_acctbal"]).map_batches(
        lambda t: t.rename_columns(["name", "acctbal"]), batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", ["s_name", "s_acctbal"]).map_batches(
        lambda t: t.rename_columns(["name", "acctbal"]), batch_format="pyarrow"
    )
    return cust.union(supp).to_pandas()


def quantity_quantiles_sketch(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE grouped quantiles via the mergeable grid sketch
    (stages/sketch.py) — the bounded-state path for 100 TB groups, where
    the exact version's gather-every-value groupby cannot hold.  Rank
    error ≤ ~1/grid; a pytest asserts closeness to the exact quantiles.
    Rows-only oracle (approximate by construction)."""
    from ..stages.sketch import quantile_sketch_by_key

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = quantile_sketch_by_key(
        ds, key_col="l_returnflag", val_col="l_quantity", qs=(0.5, 0.9), grid=128
    )
    return out.rename(columns={"p50": "p50_qty", "p90": "p90_qty"})


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier
    share the nation, restricted to one region and a date window — the
    engine's deepest join composition (6 tables).

    Join plan (the 100 TB shapes, not a literal 6-way shuffle):
    region→nation resolve on the driver (tiny); customer's
    (custkey → nationkey) and supplier's (suppkey → nationkey) maps are
    broadcast once via ``ray.put`` (small sides — the Bloom/semi-join
    stand-in); orders and lineitem, the two big tables, are each slimmed
    by a broadcast map_batches lookup and meet in ONE bucketed
    large⋈large hash join on orderkey; the customer-nation ==
    supplier-nation predicate filters inside the join output; revenue
    pre-aggregates per batch before a tiny per-nation groupby.
    """
    import pyarrow.compute as pc

    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    # driver-side tiny-dimension resolve: region -> set of nationkeys + names
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nat_names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    if not nat_names:
        return pd.DataFrame({"n_name": [], "revenue": []})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat_names)]
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nat_names)]
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    supp_ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))

    def orders_slim(df: pd.DataFrame) -> pa.Table:
        cmap = _cached_broadcast(cust_ref)
        df = df[(df["o_orderdate"] >= t_from) & (df["o_orderdate"] < t_to)]
        cn = df["o_custkey"].map(cmap)
        out = pd.DataFrame(
            {"l_orderkey": df["o_orderkey"], "cust_nation": cn}
        ).dropna(subset=["cust_nation"])
        out["cust_nation"] = out["cust_nation"].astype("int64")
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("l_orderkey", pa.int64()), ("cust_nation", pa.int64())]),
            preserve_index=False,
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_slim, batch_format="pandas")

    def items_slim(df: pd.DataFrame) -> pa.Table:
        smap = _cached_broadcast(supp_ref)
        sn = df["l_suppkey"].map(smap)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "supp_nation": sn,
                "revenue": df["l_extendedprice"] * (1.0 - df["l_discount"]),
            }
        ).dropna(subset=["supp_nation"])
        out["supp_nation"] = out["supp_nation"].astype("int64")
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("supp_nation", pa.int64()),
                    ("revenue", pa.float64()),
                ]
            ),
            preserve_index=False,
        )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(items_slim, batch_format="pandas")

    joined = bucketed_hash_join(items, orders, on="l_orderkey", num_buckets=16)
    local = joined.map_batches(
        lambda t: t.filter(pc.equal(t["supp_nation"], t["cust_nation"])),
        batch_format="pyarrow",
    )
    agg = grouped_sum(local, ["supp_nation"], None, ["revenue"]).to_pandas()
    if agg.empty:
        return pd.DataFrame({"n_name": [], "revenue": []})
    agg["n_name"] = agg["supp_nation"].map(nat_names)
    agg["revenue"] = agg["revenue"].round(2)
    return agg.sort_values(["revenue", "n_name"], ascending=[False, True], ignore_index=True)[
        ["n_name", "revenue"]
    ]


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(o_orderpriority, o_orderstatus): finest-level groups plus
    per-priority subtotals plus the grand total (labels 'ALL').

    At scale only the FINEST level aggregates distributed (pre-aggregated
    partials + small groupby); the subtotal/total levels re-aggregate the
    tiny finest-level result on the driver — the standard rollup-from-
    partials plan, no second pass over the data.
    """
    finest = grouped_sum(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]),
        ["o_orderpriority", "o_orderstatus"],
        None,
        ["o_totalprice"],
        count_col="n_orders",
    ).to_pandas()
    finest = finest.rename(columns={"o_totalprice": "sum_totalprice"})
    sub = (
        finest.groupby("o_orderpriority", as_index=False)[["sum_totalprice", "n_orders"]]
        .sum()
        .assign(o_orderstatus="ALL")
    )
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "sum_totalprice": [finest["sum_totalprice"].sum()],
            "n_orders": [finest["n_orders"].sum()],
        }
    )
    out = pd.concat([finest, sub, total], ignore_index=True)
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(
        ["o_orderpriority", "o_orderstatus"], ignore_index=True
    )[["o_orderpriority", "o_orderstatus", "sum_totalprice", "n_orders"]]


def q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#1", max_size: int = 15
) -> pd.DataFrame:
    """TPC-H Q17 shape: correlated average subquery — yearly revenue
    from small-quantity lineitems of one brand's small parts.

    Scale plan (the classic Q17 plan, Ray-Data-first): the selective
    part filter yields a SMALL key set → broadcast it; lineitem streams
    through an ``isin`` semi-join filter; per-part (sum, count) partials
    combine per batch and the per-part averages — bounded by the
    filtered part count — return to the driver and broadcast as the
    0.2·avg threshold map; a second lineitem pass applies the
    correlated predicate vectorized and reduces to one revenue sum.
    lineitem itself never shuffles.
    """
    import numpy as np
    import pyarrow.compute as pc

    parts = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_brand"], brand), pc.less_equal(t["p_size"], max_size))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    pdf = parts.to_pandas()
    keys = set(pdf["p_partkey"]) if len(pdf) else set()
    if not keys:
        return pd.DataFrame({"avg_yearly": [0.0]})
    keys_ref = ray.put(keys)

    def qty_partials(df: pd.DataFrame) -> pa.Table:
        ks = _cached_broadcast(keys_ref)
        df = df[df["l_partkey"].isin(ks)]
        out = (
            df.assign(n=1)
            .groupby("l_partkey", as_index=False, sort=False)
            .agg(sum_qty=("l_quantity", "sum"), n=("n", "sum"))
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("l_partkey", pa.int64()), ("sum_qty", pa.float64()), ("n", pa.int64())]
            ),
            preserve_index=False,
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    partials = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(qty_partials, batch_format="pandas")
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame({"avg_yearly": [0.0]})
    per_part = partials.groupby("l_partkey", as_index=False)[["sum_qty", "n"]].sum()
    thr = dict(
        zip(per_part["l_partkey"], 0.2 * per_part["sum_qty"] / per_part["n"])
    )
    thr_ref = ray.put(thr)

    def rev_partial(df: pd.DataFrame) -> pa.Table:
        t = _cached_broadcast(thr_ref)
        lim = df["l_partkey"].map(t)
        m = lim.notna() & (df["l_quantity"] < lim)
        return pa.Table.from_pydict(
            {"rev": pa.array([float(df.loc[m, "l_extendedprice"].sum())], pa.float64())}
        )

    rev = (
        _read(sf_dir, "lineitem", li_cols)
        .map_batches(rev_partial, batch_format="pandas")
        .to_pandas()["rev"]
        .sum()
    )
    return pd.DataFrame({"avg_yearly": [round(rev / 7.0, 2)]})


def q18_large_orders(
    sf_dir: str, min_qty: float = 150.0, k: int = 100, num_buckets: int = 32
) -> pd.DataFrame:
    """TPC-H Q18 shape: HAVING over a high-cardinality groupby, then a
    semi-join back to orders/customer and a top-k.

    Per-orderkey quantity sums follow the bucket doctrine (ROUND_NOTES
    #10): batch-local partials → hash-bucket shuffle into B groups →
    vectorized sum per bucket → HAVING filter.  Survivors are small by
    construction (the whole point of the predicate), so they broadcast;
    orders and customer stream through ``isin`` filters — neither big
    table shuffles.
    """
    import numpy as np

    from ..stages.dedup import stable_bucket_ids

    def partial(df: pd.DataFrame) -> pa.Table:
        out = df.groupby("l_orderkey", as_index=False, sort=False).agg(
            sq=("l_quantity", "sum")
        )
        t = pa.Table.from_pandas(
            out,
            schema=pa.schema([("l_orderkey", pa.int64()), ("sq", pa.float64())]),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(t["l_orderkey"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def having(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("l_orderkey", as_index=False, sort=False)["sq"].sum()
        out = out[out["sq"] > min_qty]
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("l_orderkey", pa.int64()), ("sq", pa.float64())]),
            preserve_index=False,
        )

    surv = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(having, batch_format="pandas")
        .to_pandas()
    )
    cols = ["c_custkey", "o_orderkey", "o_totalprice", "sum_qty"]
    if surv.empty:
        return pd.DataFrame({c: pd.Series([], dtype="float64") for c in cols})
    sq_map = dict(zip(surv["l_orderkey"], surv["sq"]))
    sq_ref = ray.put(sq_map)

    def orders_filter(df: pd.DataFrame) -> pa.Table:
        m = _cached_broadcast(sq_ref)
        sq = df["o_orderkey"].map(m)
        df = df[sq.notna()].assign(sum_qty=sq.dropna())
        return pa.Table.from_pandas(
            df[["o_orderkey", "o_custkey", "o_totalprice", "sum_qty"]],
            schema=pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_totalprice", pa.float64()),
                    ("sum_qty", pa.float64()),
                ]
            ),
            preserve_index=False,
        )

    hits = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(orders_filter, batch_format="pandas")
        .to_pandas()
    )
    # survivors are top-k-bounded and tiny — the customer attach is a
    # driver-side merge over a streamed isin filter
    hits = hits.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k)
    ck = set(hits["o_custkey"])
    ck_ref = ray.put(ck)

    def cust_filter(df: pd.DataFrame) -> pa.Table:
        ks = _cached_broadcast(ck_ref)
        out = df[df["c_custkey"].isin(ks)][["c_custkey"]]
        return pa.Table.from_pandas(
            out, schema=pa.schema([("c_custkey", pa.int64())]), preserve_index=False
        )

    cust = (
        _read(sf_dir, "customer", ["c_custkey"])
        .map_batches(cust_filter, batch_format="pandas")
        .to_pandas()
    )
    out = hits.merge(
        cust.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey", how="inner"
    ).rename(columns={"o_custkey": "c_custkey"})
    out["o_totalprice"] = out["o_totalprice"].round(2)
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], ignore_index=True
    )[cols]


def nation_balance_full_outer(
    sf_dir: str, min_acctbal: float = 9000.0, num_buckets: int = 8
) -> pd.DataFrame:
    """FULL OUTER join: high-balance customer counts vs high-balance
    supplier counts per nation — nations present on only one side
    survive with a zero on the other (the reconciliation-report shape).

    Both sides pre-aggregate to (nationkey, count) partials before the
    join, so the bucketed outer join moves one row per nation per side.
    """
    import numpy as np
    import pyarrow.compute as pc

    def counted(table: str, key: str, bal: str, out_col: str) -> rd.Dataset:
        def prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t[bal], min_acctbal))
            return pa.table({"nationkey": pc.cast(t[key], pa.int64())})

        return grouped_sum_arrow(
            _read(sf_dir, table, [key, bal]), ["nationkey"], prep, [], count_col=out_col
        )

    # materialize + count: an all-filtered side yields an EMPTY dataset
    # whose schema() is None (ROUND_NOTES lesson 12) — the join can't
    # build its combined schema from it, and FULL OUTER with an empty
    # side is just the other side anyway.  Both sides are nation-
    # cardinality tiny post-aggregation, so the materialize is free.
    cust = counted("customer", "c_nationkey", "c_acctbal", "n_cust").materialize()
    supp = counted("supplier", "s_nationkey", "s_acctbal", "n_supp").materialize()
    n_c, n_s = cust.count(), supp.count()
    if n_c == 0 or n_s == 0:
        if n_c == 0 and n_s == 0:
            out = pd.DataFrame(
                {
                    "nationkey": pd.Series([], dtype="int64"),
                    "n_cust": pd.Series([], dtype="int64"),
                    "n_supp": pd.Series([], dtype="int64"),
                }
            )
        elif n_c == 0:
            out = supp.to_pandas().assign(n_cust=np.int64(0))
        else:
            out = cust.to_pandas().assign(n_supp=np.int64(0))
    else:
        out = bucketed_hash_join(
            cust, supp, on="nationkey", num_buckets=num_buckets, how="outer"
        ).to_pandas()
    out["n_cust"] = out["n_cust"].fillna(0).astype("int64")
    out["n_supp"] = out["n_supp"].fillna(0).astype("int64")
    return out.sort_values("nationkey", ignore_index=True)[
        ["nationkey", "n_cust", "n_supp"]
    ]


def top_orders_per_customer(
    sf_dir: str, k: int = 2, num_buckets: int = 32
) -> pd.DataFrame:
    """Per-group top-k (the ROW_NUMBER() <= k window shape): each
    customer's k most expensive orders.

    Customers are high-cardinality, so the partition-by key hash-buckets
    into B groups and each bucket ranks vectorized (ONE pandas
    sort+cumcount per bucket — never a Ray group per customer).  A
    batch-local pre-prune keeps at most k rows per (batch, customer)
    before the shuffle, so the exchange is k-bounded per key.
    """
    import numpy as np

    from ..stages.dedup import stable_bucket_ids

    def prune(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        out = df[df.groupby("o_custkey", sort=False).cumcount() < k]
        t = pa.Table.from_pandas(
            out[["o_custkey", "o_orderkey", "o_totalprice"]],
            schema=pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("o_orderkey", pa.int64()),
                    ("o_totalprice", pa.float64()),
                ]
            ),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(t["o_custkey"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        rn = g.groupby("o_custkey", sort=False).cumcount() + 1
        out = g[rn <= k].assign(rn=rn[rn <= k].astype(np.int64))
        return pa.Table.from_pandas(
            out[["o_custkey", "o_orderkey", "o_totalprice", "rn"]],
            schema=pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("o_orderkey", pa.int64()),
                    ("o_totalprice", pa.float64()),
                    ("rn", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(prune, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(rank_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "o_custkey": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_totalprice": pd.Series([], dtype="float64"),
                "rn": pd.Series([], dtype="int64"),
            }
        )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.sort_values(["o_custkey", "rn"], ignore_index=True)


def distinct_users_per_event_type_hll(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE count-distinct via mergeable HyperLogLog
    (stages/sketch.py) — the bounded-state path where the exact
    ``distinct_users_per_event_type`` would gather per-key distinct sets
    that grow with the data.  ~1.6% standard error at 4096 registers; a
    pytest asserts closeness to exact.  SQL-checked: register merge is
    an elementwise max (order-independent), so a single-process HLL
    over the same values is bit-identical
    (pipelines/rowsonly_oracles.py)."""
    from ..stages.sketch import hll_count_distinct_by_key

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_count_distinct_by_key(ds, key_col="event_type", val_col="user_id")


def q4_priority_exists(
    sf_dir: str,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q4 shape (order-priority checking): count orders per
    priority in a date quarter that have AT LEAST ONE lineitem matching
    a predicate (``l_returnflag = 'R'`` here — the testdata lacks
    commit/receipt dates, the EXISTS shape is what's exercised).

    Scale shape: the EXISTS is a bucketed SEMI join (stages/joins.py
    ``how="semi"``) — lineitem keys are pre-deduped per batch so only
    distinct (orderkey) partials shuffle, orders rows survive at most
    once regardless of how many lineitems match, and the final groupby
    is over the 5-value priority column (low-cardinality, allowed).
    """
    import pyarrow.compute as pc

    from ..stages.joins import bucketed_hash_join

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    def rkeys(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.equal(t["l_returnflag"], "R"))["l_orderkey"]
        return pa.Table.from_pydict({"o_orderkey": pc.unique(keys)})

    matched = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        rkeys, batch_format="pyarrow"
    )
    out = (
        bucketed_hash_join(orders, matched, on="o_orderkey", how="semi",
                           num_buckets=num_buckets)
        .groupby("o_orderpriority")
        .count()
        .to_pandas()
        .rename(columns={"count()": "order_count"})
    )
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority", ignore_index=True)[
        ["o_orderpriority", "order_count"]
    ]


def q12_priority_by_returnflag(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q12 shape (conditional aggregation over a join): per
    lineitem return flag, how many lines belong to HIGH-priority orders
    ('1-URGENT'/'2-HIGH') vs lower — the shipmode/priority CASE-WHEN
    rollup re-expressed over the columns the testdata has.

    Scale shape: bucketed hash join on the orderkey (both sides slim —
    2 columns each), then the CASE-WHEN counts pre-aggregate per batch
    (``grouped_sum``) so only (returnflag, high, low) partials shuffle
    into the 3-key final groupby.
    """
    from ..stages.joins import bucketed_hash_join

    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_returnflag"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucketed_hash_join(lines, orders, on="o_orderkey",
                                num_buckets=num_buckets)

    def compute(df: pd.DataFrame) -> pd.DataFrame:
        high = df["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "high_line_count": high.astype("int64"),
                "low_line_count": (~high).astype("int64"),
            }
        )

    out = grouped_sum(
        joined, ["l_returnflag"], compute, ["high_line_count", "low_line_count"]
    ).to_pandas()
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag", ignore_index=True)[
        ["l_returnflag", "high_line_count", "low_line_count"]
    ]


def events_lag_deltas(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """LAG window: per event, seconds since the SAME user's previous
    event (ts order, event_id tie-break); a user's first event → -1.

    Scale shape: users hash into B buckets (all of a user's events
    co-locate) and each bucket computes every LAG vectorized — one
    pandas sort + grouped shift per bucket, never a Ray group per user.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id", sort=False)["ts"].shift()
        delta = (g["ts"] - prev).dt.total_seconds()
        return pd.DataFrame(
            {"event_id": g["event_id"], "delta_s": delta.fillna(-1.0).round(6)}
        )

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(lag_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def events_window_counts(
    sf_dir: str, window_s: int = 600, num_buckets: int = 64
) -> pd.DataFrame:
    """Interval (range) self-join: per event, how many of the SAME
    user's events fall in the strictly-prior window
    ``[ts - window_s, ts)`` — the time-range join the Dataset API lacks.

    Scale shape: users hash into B buckets; inside a bucket the range
    join is ONE vectorized double-searchsorted over a composite
    (user-ordinal << 44 | µs-offset) key — no per-user Python loop, no
    quadratic pair expansion.  Partitioning assumption (documented): all
    events of a user co-locate in one bucket; per-bucket spans must fit
    the composite key (µs offset < 2^44 ≈ 557 years, < 2^19 users per
    bucket) — guarded loudly.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        ts_us = g["ts"].astype("int64").to_numpy()
        u = pd.factorize(g["user_id"])[0].astype(np.int64)
        base = ts_us - ts_us.min() if len(ts_us) else ts_us
        if len(base) and (base.max() >= (1 << 44) or u.max() >= (1 << 19)):
            raise ValueError("composite range-join key overflow: re-bucket finer")
        key = (u << 44) + base
        lo = (u << 44) + np.maximum(base - window_s * 1_000_000, 0)
        n = np.searchsorted(key, key, side="left") - np.searchsorted(
            key, lo, side="left"
        )
        return pd.DataFrame(
            {"event_id": g["event_id"], "n_prior": pd.Series(n, dtype="int64")}
        )

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def q10_returned_item_revenue(
    sf_dir: str,
    date_from: str = "1996-07-01",
    date_to: str = "1996-10-01",
    k: int = 20,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue from RETURNED items
    in a quarter, with customer/nation attributes attached.

    Plan: lineitem streams through a returnflag filter + per-batch
    revenue pre-agg per orderkey; orders streams through the date
    filter; the two slim big sides meet in ONE bucketed hash join on
    orderkey.  Per-customer revenue follows the bucket doctrine
    (partials → B hash buckets → vectorized sum), top-k is the
    batch-local prune, and only the k winners' attributes are fetched
    (streamed ``isin`` over customer, driver-side nation map).
    """
    import numpy as np

    from ..stages.dedup import stable_bucket_ids

    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def items_slim(df: pd.DataFrame) -> pa.Table:
        df = df[df["l_returnflag"] == "R"]
        out = (
            df.assign(revenue=df["l_extendedprice"] * (1.0 - df["l_discount"]))
            .groupby("l_orderkey", as_index=False, sort=False)["revenue"]
            .sum()
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("l_orderkey", pa.int64()), ("revenue", pa.float64())]),
            preserve_index=False,
        )

    items = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(items_slim, batch_format="pandas")

    def orders_slim(df: pd.DataFrame) -> pa.Table:
        df = df[(df["o_orderdate"] >= t_from) & (df["o_orderdate"] < t_to)]
        return pa.Table.from_pandas(
            df[["o_orderkey", "o_custkey"]].rename(columns={"o_orderkey": "l_orderkey"}),
            schema=pa.schema([("l_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            preserve_index=False,
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_slim, batch_format="pandas")

    joined = bucketed_hash_join(items, orders, on="l_orderkey", num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(["o_custkey", "revenue"])
            .group_by(["o_custkey"])
            .aggregate([("revenue", "sum")])
            .rename_columns(["o_custkey", "revenue"])
        )
        b = (
            stable_bucket_ids(out["o_custkey"], num_buckets)
            if out.num_rows
            else np.empty(0, np.int32)
        )
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_and_prune(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("o_custkey", as_index=False, sort=False)["revenue"].sum()
        out = out.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("o_custkey", pa.int64()), ("revenue", pa.float64())]),
            preserve_index=False,
        )

    top = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sum_and_prune, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(k)
    )
    cols = ["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]
    if top.empty:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype=object),
                "revenue": pd.Series([], dtype="float64"),
                "c_acctbal": pd.Series([], dtype="float64"),
                "n_name": pd.Series([], dtype=object),
            }
        )
    ck_ref = ray.put(set(top["o_custkey"]))

    def cust_filter(df: pd.DataFrame) -> pa.Table:
        ks = _cached_broadcast(ck_ref)
        out = df[df["c_custkey"].isin(ks)]
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("c_custkey", pa.int64()),
                    ("c_name", pa.string()),
                    ("c_nationkey", pa.int64()),
                    ("c_acctbal", pa.float64()),
                ]
            ),
            preserve_index=False,
        )

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
        .map_batches(cust_filter, batch_format="pandas")
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = top.rename(columns={"o_custkey": "c_custkey"}).merge(cust, on="c_custkey")
    out["n_name"] = out["c_nationkey"].map(
        dict(zip(nation["n_nationkey"], nation["n_name"]))
    )
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True], ignore_index=True
    )[cols]


def event_type_cooccurrence(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users performed BOTH — the association-mining shape.

    Users co-locate in hash buckets (the standing events partitioning);
    each bucket reduces to ≤ |types|² pair-count partials via distinct →
    self-merge → vectorized groupby, so only tiny count rows leave the
    workers."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pairs_bucket(g: pd.DataFrame) -> pa.Table:
        dt = g[["user_id", "event_type"]].drop_duplicates()
        m = dt.merge(dt, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"], as_index=False).size()
        return pa.Table.from_pandas(
            out.rename(
                columns={"event_type_x": "type_a", "event_type_y": "type_b", "size": "n_users"}
            ),
            schema=pa.schema(
                [("type_a", pa.string()), ("type_b", pa.string()), ("n_users", pa.int64())]
            ),
            preserve_index=False,
        )

    out = (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .to_pandas()
        .groupby(["type_a", "type_b"], as_index=False)["n_users"]
        .sum()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"], ignore_index=True)


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_correlations(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation matrix over lineitem's numeric measures in
    ONE streaming pass: each batch reduces to the sufficient-statistic
    partials (n, Σx per column, ΣxᵀX cross-product matrix — a handful of
    floats regardless of batch size), summed on the driver.  Output:
    (col_a, col_b, pearson_r) for each unordered pair.
    """
    import numpy as np

    cols = list(_CORR_COLS)

    def partial(df: pd.DataFrame) -> pa.Table:
        m = df[cols].to_numpy(dtype=np.float64)
        return pa.Table.from_pydict(
            {
                "n": pa.array([float(len(m))], pa.float64()),
                "sums": pa.array([m.sum(axis=0).tolist()]),
                "cross": pa.array([(m.T @ m).reshape(-1).tolist()]),
            }
        )

    parts = (
        _read(sf_dir, "lineitem", cols)
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    n = float(parts["n"].sum())
    sums = np.sum([np.asarray(s) for s in parts["sums"]], axis=0)
    cross = np.sum([np.asarray(c) for c in parts["cross"]], axis=0).reshape(
        len(cols), len(cols)
    )
    cov = cross / n - np.outer(sums / n, sums / n)
    sd = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sd, sd)
    rows = [
        (cols[i], cols[j], round(float(corr[i, j]), 6))
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    return pd.DataFrame(rows, columns=["col_a", "col_b", "pearson_r"])


def order_value_percentile_ranks(sf_dir: str) -> rd.Dataset:
    """Approximate global percentile rank of every order's totalprice
    (sketch CDF broadcast + vectorized searchsorted — rows-only; a
    pytest asserts the ≤ ~1/grid rank-error bound vs the exact rank)."""
    from ..stages.sketch import global_percentile_ranks

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return global_percentile_ranks(ds, id_col="o_orderkey", val_col="o_totalprice")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_hour_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: events per (hour-of-day × event_type), one column
    per type — the wide-format report op.  Per-batch vectorized
    crosstab partials (24×|types| ints), a tiny low-cardinality groupby
    sums them; the driver only ever sees the 24-row result."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pa.Table:
        hours = df["ts"].dt.hour.astype("int64")
        ct = pd.crosstab(hours, df["event_type"])
        for t in _PIVOT_TYPES:
            if t not in ct.columns:
                ct[t] = 0
        out = ct[list(_PIVOT_TYPES)].reset_index().rename(columns={"ts": "hour"})
        out.columns = ["hour"] + [f"n_{t}" for t in _PIVOT_TYPES]
        return pa.Table.from_pandas(
            out.astype("int64"),
            schema=pa.schema(
                [("hour", pa.int64())] + [(f"n_{t}", pa.int64()) for t in _PIVOT_TYPES]
            ),
            preserve_index=False,
        )

    cols = [f"n_{t}" for t in _PIVOT_TYPES]
    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hour")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("hour", ignore_index=True)[["hour", *cols]]


def events_funnel_counts(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Ordered funnel analysis: how many users did view → click →
    purchase IN THAT ORDER (each later step strictly after the earlier
    step's FIRST occurrence) — the conversion-funnel op sessionization
    doesn't cover.

    Scale shape: users hash into B buckets (the standing partitioning
    key for events), each bucket resolves its users' funnel stages with
    three vectorized per-type min/merge passes, and only a 3-integer
    partial per bucket reaches the driver.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def funnel_bucket(g: pd.DataFrame) -> pa.Table:
        v = (
            g[g["event_type"] == "view"].groupby("user_id")["ts"].min().rename("t1")
        )
        c = (
            g[g["event_type"] == "click"]
            .merge(v, left_on="user_id", right_index=True)
            .query("ts > t1")
            .groupby("user_id")["ts"]
            .min()
            .rename("t2")
        )
        p = (
            g[g["event_type"] == "purchase"]
            .merge(c, left_on="user_id", right_index=True)
            .query("ts > t2")
            .groupby("user_id")["ts"]
            .min()
        )
        return pa.Table.from_pydict(
            {
                "n_view": pa.array([len(v)], pa.int64()),
                "n_view_click": pa.array([len(c)], pa.int64()),
                "n_full_funnel": pa.array([len(p)], pa.int64()),
            }
        )

    parts = (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .to_pandas()  # B rows of 3 ints
    )
    return pd.DataFrame(
        {
            "n_view": [int(parts["n_view"].sum())],
            "n_view_click": [int(parts["n_view_click"].sum())],
            "n_full_funnel": [int(parts["n_full_funnel"].sum())],
        }
    )


def quantity_zscore_by_returnflag(sf_dir: str) -> rd.Dataset:
    """Per-group normalization: z-score of ``l_quantity`` within its
    ``l_returnflag`` group — the feature-scaling window op
    (``(x - AVG OVER partition) / STDDEV_POP OVER partition``).

    Scale shape: the table never shuffles.  Pass 1 reduces each batch to
    per-group moment partials (n, Σx, Σx²) — three scalars per group per
    batch, summed on the driver (low-cardinality groups); pass 2
    broadcasts the (mean, std) map and computes scores vectorized per
    batch.  A window-function formulation would shuffle every row by
    group key.
    """
    import numpy as np

    import pyarrow as pa

    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__sq=df["l_quantity"] ** 2)
        return (
            df.groupby("l_returnflag", sort=False)
            .agg(n=("l_quantity", "count"), s=("l_quantity", "sum"), sq=("__sq", "sum"))
            .reset_index()
        )

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    stats = parts.groupby("l_returnflag").sum()
    mean = stats["s"] / stats["n"]
    std = np.sqrt(stats["sq"] / stats["n"] - mean**2)
    ref = ray.put((mean.to_dict(), std.to_dict()))

    def score(t: pa.Table) -> pa.Table:
        means, stds = _cached_broadcast(ref)
        df = t.to_pandas()
        m = df["l_returnflag"].map(means).to_numpy(np.float64)
        sd = df["l_returnflag"].map(stds).to_numpy(np.float64)
        z = np.round((df["l_quantity"].to_numpy(np.float64) - m) / sd, 6)
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(df["l_orderkey"], pa.int64()),
                "l_linenumber": pa.array(
                    df["l_linenumber"].astype("int64"), pa.int64()
                ),
                "zscore": pa.array(z, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q6_forecast_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> pd.DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): one filtered scan of
    lineitem reduced to a single revenue sum.

    The whole operator is a pruned 4-column read + a per-batch
    vectorized filter-and-sum partial + a driver add — no shuffle, no
    groupby, the minimal full-scan aggregate.  At 100 TB this is purely
    read-bandwidth-bound, which is the point of the shape."""
    import numpy as np

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def partial(df: pd.DataFrame) -> pa.Table:
        m = (
            (df["l_shipdate"] >= lo)
            & (df["l_shipdate"] < hi)
            & (df["l_discount"] >= disc_lo)
            & (df["l_discount"] <= disc_hi)
            & (df["l_quantity"] < max_qty)
        )
        rev = float((df.loc[m, "l_extendedprice"] * df.loc[m, "l_discount"]).sum())
        return pa.Table.from_pydict({"rev": pa.array([rev], pa.float64())})

    parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({"revenue": [round(float(parts["rev"].sum()), 2)]})


def q14_promo_revenue(
    sf_dir: str, date_from: str = "1996-03-01", date_to: str = "1996-04-01"
) -> pd.DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue coming from parts whose type has the promo prefix.

    Scale plan: part's (partkey → is-promo) map is the SMALL side —
    broadcast once via ``ray.put`` (at TPC-H scale part is ~1/30 of
    lineitem; for a truly huge part table swap in the bucketed hash
    join); lineitem streams through one pruned pass emitting
    (promo_rev, total_rev) partials per batch; the driver adds two
    floats.  No shuffle."""
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = dict(
        zip(part["p_partkey"], part["p_type"].str.startswith("PROMO"))
    )
    pref = ray.put(promo)

    def partial(df: pd.DataFrame) -> pa.Table:
        pm = _cached_broadcast(pref)
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        # inner-join semantics, same as the oracle: a lineitem whose
        # partkey has no part row joins nothing and counts in NEITHER
        # the numerator NOR the denominator
        promo_flag = df["l_partkey"].map(pm)
        df, promo_flag = df[promo_flag.notna()], promo_flag.dropna()
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        is_promo = promo_flag.to_numpy(dtype=bool)
        return pa.Table.from_pydict(
            {
                "promo": pa.array([float(rev[is_promo].sum())], pa.float64()),
                "total": pa.array([float(rev.sum())], pa.float64()),
            }
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    total = float(parts["total"].sum())
    promo_rev = float(parts["promo"].sum())
    pct = 100.0 * promo_rev / total if total else 0.0
    return pd.DataFrame({"promo_revenue_pct": [round(pct, 4)]})


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunction of conjunctive
    predicates): revenue from lineitems matching ANY of three
    (brand, size-range, quantity-range) clauses.

    Scale plan: part attributes (brand, size) broadcast as two flat
    arrays indexed by a (partkey → row) map; each lineitem batch
    evaluates all three clauses vectorized against the mapped attrs and
    emits one partial sum.  The disjunction never materializes an
    intermediate row set."""
    import numpy as np

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    pref = ray.put(
        (
            dict(zip(part["p_partkey"], np.arange(len(part)))),
            part["p_brand"].to_numpy(dtype=object),
            part["p_size"].to_numpy(dtype=np.int64),
        )
    )
    clauses = (
        ("Brand#1", 1, 5, 1.0, 11.0),
        ("Brand#2", 1, 10, 10.0, 20.0),
        ("Brand#3", 1, 15, 20.0, 30.0),
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        pos_map, brands, sizes = _cached_broadcast(pref)
        pos = df["l_partkey"].map(pos_map)
        ok = pos.notna()
        df, pos = df[ok], pos[ok].to_numpy(dtype=np.int64)
        b, s = brands[pos], sizes[pos]
        q = df["l_quantity"].to_numpy(dtype=np.float64)
        m = np.zeros(len(df), dtype=bool)
        for brand, s_lo, s_hi, q_lo, q_hi in clauses:
            m |= (b == brand) & (s >= s_lo) & (s <= s_hi) & (q >= q_lo) & (q <= q_hi)
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1 - df["l_discount"].to_numpy(np.float64)
        )
        return pa.Table.from_pydict(
            {"rev": pa.array([float(rev[m].sum())], pa.float64())}
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({"revenue": [round(float(parts["rev"].sum()), 2)]})


def q7_volume_shipping(
    sf_dir: str,
    nation_a: str = "NATION_6",
    nation_b: str = "NATION_9",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations — supplier in one, ordering customer in the other — per
    ship year.

    Scale plan (mirrors Q5): supplier's (suppkey → nationkey) and
    customer's (custkey → nationkey) maps broadcast once; lineitem is
    slimmed to (orderkey, year, revenue, supp_nation) by a broadcast
    lookup that drops non-target-nation rows at the scan; orders is
    slimmed to (orderkey, cust_nation) the same way; the two slim
    streams meet in ONE bucketed large⋈large join on orderkey; the
    cross-nation predicate and the per-(nation, nation, year) partial
    sums run inside the join output; the final groupby is over a
    handful of keys."""
    import numpy as np

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    targets = {k for k, v in name_of.items() if v in (nation_a, nation_b)}
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    s_ref = ray.put(
        {k: name_of[v] for k, v in zip(supp["s_suppkey"], supp["s_nationkey"]) if v in targets}
    )
    c_ref = ray.put(
        {k: name_of[v] for k, v in zip(cust["c_custkey"], cust["c_nationkey"]) if v in targets}
    )

    def slim_lineitem(df: pd.DataFrame) -> pa.Table:
        sm = _cached_broadcast(s_ref)
        sn = df["l_suppkey"].map(sm)
        df = df[sn.notna()]
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(df["l_orderkey"], pa.int64()),
                "supp_nation": pa.array(sn[sn.notna()], pa.string()),
                "l_year": pa.array(
                    df["l_shipdate"].dt.year.astype("int64"), pa.int64()
                ),
                "volume": pa.array(
                    (df["l_extendedprice"] * (1 - df["l_discount"])).astype(
                        "float64"
                    ),
                    pa.float64(),
                ),
            }
        )

    def slim_orders(df: pd.DataFrame) -> pa.Table:
        cm = _cached_broadcast(c_ref)
        cn = df["o_custkey"].map(cm)
        df = df[cn.notna()]
        return pa.Table.from_pydict(
            {
                "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
                "cust_nation": pa.array(cn[cn.notna()], pa.string()),
            }
        )

    empty = pd.DataFrame(
        {
            "supp_nation": pd.Series([], dtype="object"),
            "cust_nation": pd.Series([], dtype="object"),
            "l_year": pd.Series([], dtype="int64"),
            "revenue": pd.Series([], dtype="float64"),
        }
    )
    # empty-side guard (ROUND_NOTES #12): a fully-filtered stream yields
    # schema()=None and the bucketed join cannot pad it.  The materialize
    # exists only to make the count probe non-recomputing; at production
    # scale both nations always have traffic — drop the guard (and the
    # pins) there and let the two slim streams flow straight into the
    # join.
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(slim_lineitem, batch_format="pandas").materialize()
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        slim_orders, batch_format="pandas"
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "cust_nation"]),
        batch_format="pyarrow",
    ).materialize()
    if li.count() == 0 or od.count() == 0:
        return empty
    joined = bucketed_hash_join(li, od, on="l_orderkey", num_buckets=num_buckets)

    def cross_nation(df: pd.DataFrame) -> pd.DataFrame:
        # filter + rename only; grouped_sum does the keyed aggregation
        df = df[df["supp_nation"] != df["cust_nation"]]
        return df.rename(columns={"volume": "revenue"})

    out = grouped_sum(
        joined, ["supp_nation", "cust_nation", "l_year"], cross_nation, ["revenue"]
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"], ignore_index=True
    )


def events_trailing_mean(
    sf_dir: str, window_s: int = 3600, num_buckets: int = 64
) -> pd.DataFrame:
    """Trailing RANGE-window AGGREGATE: per event, the mean of the SAME
    user's ``value`` over ``[ts - window_s, ts]`` inclusive — SQL's
    ``AVG(value) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN
    INTERVAL .. PRECEDING AND CURRENT ROW)``, including all equal-ts
    peers (RANGE frames are value-based, not row-based).

    Scale shape (the ``events_window_counts`` composite-key pattern
    extended from counts to value aggregates): users hash into B
    buckets; per bucket ONE vectorized double-searchsorted over the
    (user-ordinal << 44 | µs-offset) key bounds every row's window, and
    the window SUM is a difference of per-user float64 prefix sums —
    per-user reset keeps the cancellation error at window magnitude,
    not corpus magnitude, so the round-6 values match the oracle's
    per-partition accumulation.  No per-user Python, no pair expansion.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def mean_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        ts_us = g["ts"].astype("int64").to_numpy()
        u = pd.factorize(g["user_id"])[0].astype(np.int64)
        base = ts_us - ts_us.min() if len(ts_us) else ts_us
        if len(base) and (base.max() >= (1 << 44) or u.max() >= (1 << 19)):
            raise ValueError("composite range-join key overflow: re-bucket finer")
        key = (u << 44) + base
        lo = np.searchsorted(
            key, (u << 44) + np.maximum(base - window_s * 1_000_000, 0), side="left"
        )
        hi = np.searchsorted(key, key, side="right")  # equal-ts peers included
        vals = g["value"].to_numpy(np.float64)
        pu = pd.Series(vals).groupby(u).cumsum().to_numpy()  # per-user prefix
        ustart = np.searchsorted(key, u << 44, side="left")
        wsum = pu[hi - 1] - np.where(lo > ustart, pu[np.maximum(lo - 1, 0)], 0.0)
        mean = np.round(wsum / (hi - lo), 6)
        return pd.DataFrame(
            {"event_id": g["event_id"], "trailing_mean": pd.Series(mean, dtype="float64")}
        )

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(mean_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def events_trailing_stats(
    sf_dir: str, window_s: int = 3600, num_buckets: int = 64
) -> pd.DataFrame:
    """Trailing RANGE-window mean AND population std-dev per event —
    :func:`events_trailing_mean` extended with a second moment, the
    windowed-variance primitive behind streaming anomaly detection
    (flag events whose value strays k·σ from their user's trailing
    window).  The window bounds come from the same composite-key
    double-searchsorted; the variance is
    ``sumsq/n − (sum/n)²`` from per-user prefix sums of ``v`` and
    ``v²`` (per-user reset bounds the cancellation at window magnitude,
    as in the mean op), rounded to 6 — numerically within the parity
    tolerance of the oracle's per-partition accumulation.
    """
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        ts_us = g["ts"].astype("int64").to_numpy()
        u = pd.factorize(g["user_id"])[0].astype(np.int64)
        base = ts_us - ts_us.min() if len(ts_us) else ts_us
        if len(base) and (base.max() >= (1 << 44) or u.max() >= (1 << 19)):
            raise ValueError("composite range-join key overflow: re-bucket finer")
        key = (u << 44) + base
        lo = np.searchsorted(
            key, (u << 44) + np.maximum(base - window_s * 1_000_000, 0), side="left"
        )
        hi = np.searchsorted(key, key, side="right")
        vals = g["value"].to_numpy(np.float64)
        pu = pd.Series(vals).groupby(u).cumsum().to_numpy()
        pu2 = pd.Series(vals * vals).groupby(u).cumsum().to_numpy()
        ustart = np.searchsorted(key, u << 44, side="left")
        prev = np.where(lo > ustart, np.maximum(lo - 1, 0), 0)
        take_prev = lo > ustart
        wsum = pu[hi - 1] - np.where(take_prev, pu[prev], 0.0)
        wsum2 = pu2[hi - 1] - np.where(take_prev, pu2[prev], 0.0)
        n = (hi - lo).astype(np.float64)
        mean = wsum / n
        # round the variance BEFORE the sqrt: a constant window's true
        # variance is exactly 0 but the prefix-difference formula leaves
        # ~1e-12 of cancellation residue, which sqrt amplifies to ~1e-6 —
        # right at the parity tolerance.  Round-8 kills the residue and
        # cannot touch a real variance (values have 2-decimal
        # granularity, so any true nonzero variance is ≥ ~1e-6).
        var = np.round(np.maximum(wsum2 / n - mean * mean, 0.0), 8)
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "trailing_mean": pd.Series(np.round(mean, 6), dtype="float64"),
                "trailing_std": pd.Series(np.round(np.sqrt(var), 6), dtype="float64"),
            }
        )

    return (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(stats_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def q8_market_share(
    sf_dir: str,
    nation: str = "NATION_9",
    region: str = "ASIA",
    part_type: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): the share of one
    supplier-nation in the revenue of a part type sold to customers of
    one region, per order year.

    Scale plan (the Q5/Q7 doctrine): three broadcast small sides — the
    filtered part-key set, supplier→nation-name map, and customer→
    in-region flag — slim both big tables at the scan (lineitem to
    (orderkey, revenue, is_target_nation), orders to (orderkey, year));
    ONE bucketed orderkey join; per-year (nation_rev, total_rev)
    partials reduce to a handful of rows on the driver."""
    import numpy as np

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_nations = set(nat.loc[nat["n_regionkey"].isin(rkeys), "n_nationkey"])
    target_nkey = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pkeys = set(part.loc[part["p_type"] == part_type, "p_partkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_is_target = dict(
        zip(supp["s_suppkey"], supp["s_nationkey"].isin(target_nkey))
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    c_in_region = set(
        cust.loc[cust["c_nationkey"].isin(region_nations), "c_custkey"]
    )
    p_ref, s_ref, c_ref = ray.put(pkeys), ray.put(s_is_target), ray.put(c_in_region)

    def slim_lineitem(df: pd.DataFrame) -> pa.Table:
        pk = _cached_broadcast(p_ref)
        sm = _cached_broadcast(s_ref)
        df = df[df["l_partkey"].isin(pk)]
        flag = df["l_suppkey"].map(sm)
        df, flag = df[flag.notna()], flag.dropna()
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(df["l_orderkey"], pa.int64()),
                "revenue": pa.array(
                    (df["l_extendedprice"] * (1 - df["l_discount"])).astype("float64"),
                    pa.float64(),
                ),
                "is_target": pa.array(flag.to_numpy(dtype=bool), pa.bool_()),
            }
        )

    def slim_orders(df: pd.DataFrame) -> pa.Table:
        cs = _cached_broadcast(c_ref)
        df = df[
            (df["o_orderdate"] >= lo)
            & (df["o_orderdate"] < hi)
            & df["o_custkey"].isin(cs)
        ]
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(df["o_orderkey"], pa.int64()),
                "o_year": pa.array(
                    df["o_orderdate"].dt.year.astype("int64"), pa.int64()
                ),
            }
        )

    empty = pd.DataFrame(
        {
            "o_year": pd.Series([], dtype="int64"),
            "mkt_share": pd.Series([], dtype="float64"),
        }
    )
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(slim_lineitem, batch_format="pandas").materialize()
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        slim_orders, batch_format="pandas"
    ).materialize()
    if li.count() == 0 or od.count() == 0:
        return empty
    joined = bucketed_hash_join(li, od, on="l_orderkey", num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            nation_rev=df["revenue"].where(df["is_target"], 0.0)
        )
        return df.rename(columns={"revenue": "total_rev"})[
            ["o_year", "nation_rev", "total_rev"]
        ]

    out = grouped_sum(joined, ["o_year"], partial, ["nation_rev", "total_rev"]).to_pandas()
    if out.empty:
        return empty
    out["mkt_share"] = (out["nation_rev"] / out["total_rev"]).round(6)
    return out[["o_year", "mkt_share"]].sort_values("o_year", ignore_index=True)


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: customer order-count DISTRIBUTION — a left join
    against a filtered orders side (priority NOT IN urgent/high, the
    o_comment-NOT-LIKE stand-in; zero-order customers count as 0),
    then a second tiny groupby over the counts themselves.

    Scale shape: orders pre-aggregate to (custkey, cnt) partials before
    the one bucketed join; the distribution groupby runs distributed on
    the count column (cardinality ≈ max orders per customer), so the
    driver only ever sees the distribution rows."""
    import pyarrow.compute as pc

    counts = grouped_sum_arrow(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(
                pc.invert(
                    pc.is_in(
                        t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]),
                    )
                )
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        None,
        [],
        count_col="cnt",
    ).map_batches(lambda t: t.rename_columns(["c_custkey", "cnt"]), batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = bucketed_hash_join(cust, counts, on="c_custkey", how="left")

    def to_ccount(t: pa.Table) -> pa.Table:
        c = pc.fill_null(t["cnt"], 0)
        return pa.Table.from_pydict({"c_count": pc.cast(c, pa.int64())})

    out = (
        grouped_sum_arrow(
            j.map_batches(to_ccount, batch_format="pyarrow"),
            ["c_count"],
            None,
            [],
            count_col="custdist",
        )
        .to_pandas()
        .sort_values(["custdist", "c_count"], ascending=[False, False], ignore_index=True)
    )
    out["custdist"] = out["custdist"].astype("int64")
    return out[["c_count", "custdist"]]


def q22_sales_opportunity(sf_dir: str, since: str = "1998-06-01") -> pd.DataFrame:
    """TPC-H Q22 shape: global SCALAR subquery + anti-join — customers
    whose balance beats the global positive-balance average AND who
    placed no order since ``since`` (every customer has SOME order in
    this corpus, so the date-restricted anti-join is the non-degenerate
    stand-in for Q22's no-orders predicate), grouped by segment (the
    country-code stand-in).

    The scalar subquery is made EXACT and batch-invariant by summing
    integer cents (money values are 2-decimal, so round(bal·100) is an
    integer) — the identical integer sum is expressible in the DuckDB
    oracle, so engine and oracle derive bit-identical averages where a
    float AVG could disagree in the last bit and flip a boundary row."""
    import pyarrow.compute as pc

    cut = pd.Timestamp(since).to_pydatetime()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def cents_partial(t: pa.Table) -> pa.Table:
        bal = np.asarray(t["c_acctbal"].combine_chunks(), dtype=np.float64)
        pos = bal[bal > 0]
        return pa.Table.from_pydict(
            {
                "q": pa.array([int(np.round(pos * 100).astype(np.int64).sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    q = 0
    n = 0
    for b in cust.map_batches(cents_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            q += int(np.asarray(b["q"].combine_chunks()).sum())
            n += int(np.asarray(b["n"].combine_chunks()).sum())
    avg = (q / n) / 100.0 if n else 0.0

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(avg))),
        batch_format="pyarrow",
    )
    order_keys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cut)))
        .select(["o_custkey"])
        .rename_columns(["c_custkey"])
        .combine_chunks()
        .group_by(["c_custkey"])
        .aggregate([]),
        batch_format="pyarrow",
    )
    lonely = bucketed_hash_join(rich, order_keys, on="c_custkey", how="anti")
    out = grouped_sum_arrow(
        lonely, ["c_mktsegment"], None, ["c_acctbal"], count_col="numcust"
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype=object),
                "numcust": pd.Series([], dtype="int64"),
                "totacctbal": pd.Series([], dtype="float64"),
            }
        )
    out = out.sort_values("c_mktsegment", ignore_index=True)
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["c_acctbal"].round(2)
    return out[["c_mktsegment", "numcust", "totacctbal"]]


def q15_top_supplier(sf_dir: str, start: str = "1996-01-01") -> pd.DataFrame:
    """TPC-H Q15 shape: correlated MAX against a derived revenue view —
    the supplier(s) whose 3-month shipping revenue equals the global
    maximum.

    Scale shape: lineitem prunes to 3 columns at the read, the window
    filter + integer-cent revenue partials combine inside
    ``map_batches``, and only per-supplier partials shuffle (supplier
    cardinality).  The MAX is taken over the aggregate (supplier-sized,
    driver-safe) and winners join supplier names.  Revenue sums in
    0.0001 units (price·(1-disc) is exact at 4 decimals) so the
    cross-batch reduction is an int64 — batch-invariant and
    oracle-expressible (ROUND_NOTES integer-reduction rule)."""
    import pyarrow.compute as pc

    lo = pd.Timestamp(start).to_pydatetime()
    hi = (pd.Timestamp(start) + pd.DateOffset(months=3)).to_pydatetime()

    def rev_i(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi)),
        )
        t = t.filter(m)
        ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)
        dis = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)
        amt = np.round(ext * (1.0 - dis) * 10000.0).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "s_suppkey": t["l_suppkey"],
                "rev_i": pa.array(amt, pa.int64()),
            }
        )

    per_supp = grouped_sum_arrow(
        _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]),
        ["s_suppkey"],
        rev_i,
        ["rev_i"],
    ).to_pandas()
    if per_supp.empty:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype=object),
                "total_rev": pd.Series([], dtype="float64"),
            }
        )
    best = per_supp["rev_i"].max()
    winners = per_supp[per_supp["rev_i"] == best].copy()
    names = broadcast_join(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        winners,
        on="s_suppkey",
    ).to_pandas()
    names["total_rev"] = names["rev_i"] / 10000.0
    return names.sort_values("s_suppkey", ignore_index=True)[
        ["s_suppkey", "s_name", "total_rev"]
    ]


def q9_product_type_profit(
    sf_dir: str, name_token: str = "widget", num_buckets: int = 32
) -> pd.DataFrame:
    """TPC-H Q9 shape: profit per (nation, year) over a 5-table join.
    The testdata has no partsupp, so cost is ``p_retailprice·quantity``
    (documented variant; the join/aggregate shape — part-filter
    broadcast, supplier→nation broadcast, lineitem⋈orders bucketed —
    is Q9's).

    Scale plan: part filtered by name token → broadcast
    partkey→retailprice map (small after the selective filter);
    supplier→nation is a broadcast int map; the only large⋈large is
    lineitem⋈orders on orderkey, bucketed.  Profit accumulates in
    integer 0.0001 units (both terms exact at ≤4 decimals)."""
    import pyarrow.compute as pc

    parts = (
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .map_batches(
            lambda t: t.filter(
                pc.match_substring(t["p_name"], name_token)
            ).select(["p_partkey", "p_retailprice"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cost_map = dict(zip(parts["p_partkey"], parts["p_retailprice"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    supp_map = {
        int(s): nk2name[int(n)] for s, n in zip(supp["s_suppkey"], supp["s_nationkey"])
    }
    cost_ref = ray.put(cost_map)
    supp_ref = ray.put(supp_map)

    def amount(df: pd.DataFrame) -> pa.Table:
        cm = _cached_broadcast(cost_ref)
        sm = _cached_broadcast(supp_ref)
        cost = df["l_partkey"].map(cm)
        m = cost.notna()
        df = df[m]
        if not len(df):
            return pa.Table.from_pydict(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "nation": pa.array([], pa.string()),
                    "amount_i": pa.array([], pa.int64()),
                }
            )
        rev = np.round(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy()) * 10000.0
        ).astype(np.int64)
        cst = np.round(
            cost[m].to_numpy(dtype=np.float64) * df["l_quantity"].to_numpy() * 10000.0
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "l_orderkey": pa.array(df["l_orderkey"].to_numpy(), pa.int64()),
                "nation": pa.array(df["l_suppkey"].map(sm), pa.string()),
                "amount_i": pa.array(rev - cst, pa.int64()),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(amount, batch_format="pandas")

    years = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "l_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = bucketed_hash_join(li, years, on="l_orderkey", num_buckets=num_buckets)
    out = grouped_sum_arrow(j, ["nation", "o_year"], None, ["amount_i"]).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "nation": pd.Series([], dtype=object),
                "o_year": pd.Series([], dtype="int64"),
                "sum_profit": pd.Series([], dtype="float64"),
            }
        )
    out = out.sort_values(["nation", "o_year"], ascending=[True, False], ignore_index=True)
    out["sum_profit"] = out["amount_i"] / 10000.0
    return out[["nation", "o_year", "sum_profit"]]


def q11_important_parts(
    sf_dir: str, nation: str = "NATION_7", fraction: float = 0.001
) -> pd.DataFrame:
    """TPC-H Q11 shape: groupby with HAVING against a GLOBAL scalar
    aggregate over the same join — parts whose value (discounted
    revenue shipped by one nation's suppliers; the testdata has no
    partsupp, so lineitem value stands in for supplycost·availqty)
    exceeds ``fraction`` of that nation's total.

    Scale plan: the nation's supplier keys broadcast as an int set;
    per-part int64 partials combine before one groupby; the global
    total is the SUM of the (part-sized) aggregate, computed
    distributed via a second tiny pass over the aggregate itself —
    lineitem streams exactly once."""
    import pyarrow.compute as pc

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat.loc[nat["n_name"] == nation, "n_nationkey"].astype(int))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = np.sort(
        supp.loc[supp["s_nationkey"].isin(nk), "s_suppkey"].to_numpy(dtype=np.int64)
    )
    sref = ray.put(skeys)

    def value_i(t: pa.Table) -> pa.Table:
        sk = _cached_broadcast(sref)
        supps = np.asarray(t["l_suppkey"].combine_chunks())
        m = np.isin(supps, sk) if len(sk) else np.zeros(len(supps), bool)
        t = t.filter(pa.array(m))
        ext = np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64)
        dis = np.asarray(t["l_discount"].combine_chunks(), dtype=np.float64)
        return pa.Table.from_pydict(
            {
                "p_partkey": t["l_partkey"],
                "value_i": pa.array(np.round(ext * (1.0 - dis) * 10000.0).astype(np.int64)),
            }
        )

    per_part = grouped_sum_arrow(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        ["p_partkey"],
        value_i,
        ["value_i"],
    ).materialize()
    total = per_part.sum("value_i") or 0
    cut = int(np.floor(fraction * total))

    import pyarrow.compute as _pc

    out = per_part.map_batches(
        lambda t: t.filter(_pc.greater(t["value_i"], pa.scalar(cut, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype="int64"),
                "part_value": pd.Series([], dtype="float64"),
            }
        )
    out["part_value"] = out["value_i"] / 10000.0
    out = out.sort_values(
        ["part_value", "p_partkey"], ascending=[False, True], ignore_index=True
    )
    return out[["p_partkey", "part_value"]]


def q16_supplier_part_counts(
    sf_dir: str,
    exclude_brand: str = "Brand#3",
    type_token: str = "STANDARD",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    group, with an excluded-brand/type predicate and a NOT-IN supplier
    set.  The testdata has no partsupp, so the part↔supplier relation
    is the distinct (l_partkey, l_suppkey) pairs observed in lineitem,
    and the Q16 complaint-supplier NOT-IN stand-in is suppliers with
    negative account balance.

    Scale plan: the part filter runs first and broadcasts the
    surviving partkey→(brand, type, size) map, so lineitem prunes to
    matching pairs BEFORE the distinct — the pair-distinct shuffle is
    sized by the filtered relation, not the fact table.  The NOT-IN
    supplier keys broadcast as a sorted int array."""
    import pyarrow.compute as pc

    parts = (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.invert(pc.equal(t["p_brand"], exclude_brand)),
                    pc.invert(pc.match_substring(t["p_type"], type_token)),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    parts = parts.sort_values("p_partkey", ignore_index=True)
    # driver-side attr coding: each surviving part maps to the code of
    # its DISTINCT (brand, type, size) tuple, so workers dedup on an
    # int pair and never touch strings
    codes, uniq = pd.factorize(
        pd.Series(
            list(zip(parts["p_brand"], parts["p_type"], parts["p_size"].astype(int)))
        )
    )
    pattrs = (
        parts["p_partkey"].to_numpy(dtype=np.int64),
        codes.astype(np.int64),
        np.array([u[0] for u in uniq], dtype=object),
        np.array([u[1] for u in uniq], dtype=object),
        np.array([u[2] for u in uniq], dtype=np.int64),
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy(dtype=np.int64))
    pref = ray.put(pattrs)
    bref = ray.put(bad)

    def attr_pairs(t: pa.Table) -> pa.Table:
        """Batch-local distinct (attr_code, supplier) int pairs — attrs
        attach via searchsorted against the broadcast sorted partkeys;
        the shuffle key is (attr values, supplier), so a supplier of
        many same-attr parts ships once per batch, counts once."""
        pkeys, acode, brands, types, sizes = _cached_broadcast(pref)
        bd = _cached_broadcast(bref)
        pk = np.asarray(t["l_partkey"].combine_chunks())
        sk = np.asarray(t["l_suppkey"].combine_chunks())
        m = np.isin(pk, pkeys) if len(pkeys) else np.zeros(len(pk), bool)
        if len(bd):
            m &= ~np.isin(sk, bd)
        pk, sk = pk[m], sk[m]
        if len(pk):
            code = acode[np.searchsorted(pkeys, pk)]
            u = np.unique(np.stack([code, sk], axis=1), axis=0)
        else:
            u = np.empty((0, 2), np.int64)
        return pa.Table.from_pydict(
            {
                "p_brand": pa.array(brands[u[:, 0]], pa.string()),
                "p_type": pa.array(types[u[:, 0]], pa.string()),
                "p_size": pa.array(sizes[u[:, 0]], pa.int64()),
                "s_suppkey": pa.array(u[:, 1], pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    group_supp = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(attr_pairs, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "s_suppkey"])
        .aggregate(Count(alias_name="_n"))  # distinct via groupby; _n unused
    )

    out = grouped_sum_arrow(
        group_supp,
        ["p_brand", "p_type", "p_size"],
        lambda t: t.drop_columns(["_n", "s_suppkey"]).append_column(
            "supplier_cnt", pa.array(np.ones(t.num_rows, np.int64))
        ),
        ["supplier_cnt"],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "p_brand": pd.Series([], dtype=object),
                "p_type": pd.Series([], dtype=object),
                "p_size": pd.Series([], dtype="int64"),
                "supplier_cnt": pd.Series([], dtype="int64"),
            }
        )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        ignore_index=True,
    )[["p_brand", "p_type", "p_size", "supplier_cnt"]]


def q20_part_promotion(
    sf_dir: str,
    nation: str = "NATION_3",
    name_token: str = "bolt",
    year: int = 1997,
) -> pd.DataFrame:
    """TPC-H Q20 shape: nested-aggregate semi-join chain — suppliers in
    one nation who shipped MORE THAN HALF of a filtered part's total
    volume in one year (the testdata has no partsupp availqty, so the
    0.5·sum(l_quantity) threshold compares a supplier's shipped share
    against the part's total, preserving the correlated-aggregate
    shape).

    Scale plan: the selective part-name filter broadcasts its partkey
    set; lineitem prunes at the read to 4 columns, filters to (window ×
    part set) and pre-aggregates (partkey, suppkey)→qty partials per
    batch; the per-part totals derive FROM the aggregate (filtered-part
    cardinality), never from a second fact-table pass.  Quantities are
    integral in this corpus, so int64 sums are exact."""
    import pyarrow.compute as pc

    parts = (
        _read(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(
            lambda t: t.filter(pc.match_substring(t["p_name"], name_token)).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    pkeys = np.sort(parts["p_partkey"].to_numpy(dtype=np.int64))
    pref = ray.put(pkeys)
    lo = pd.Timestamp(f"{year}-01-01").to_pydatetime()
    hi = pd.Timestamp(f"{year + 1}-01-01").to_pydatetime()

    def qty_partial(t: pa.Table) -> pa.Table:
        pk = _cached_broadcast(pref)
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi)),
        )
        t = t.filter(m)
        part = np.asarray(t["l_partkey"].combine_chunks())
        keep = np.isin(part, pk) if len(pk) else np.zeros(len(part), bool)
        t = t.filter(pa.array(keep))
        return pa.Table.from_pydict(
            {
                "p_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "qty_i": pa.array(
                    np.round(
                        np.asarray(t["l_quantity"].combine_chunks(), dtype=np.float64) * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    pair_qty = grouped_sum_arrow(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]),
        ["p_partkey", "s_suppkey"],
        qty_partial,
        ["qty_i"],
    ).materialize()
    part_tot = grouped_sum_arrow(pair_qty, ["p_partkey"], None, ["qty_i"]).map_batches(
        lambda t: t.rename_columns(["p_partkey", "tot_i"]), batch_format="pyarrow"
    )
    j = bucketed_hash_join(pair_qty, part_tot, on="p_partkey", num_buckets=8)
    major = j.map_batches(
        lambda t: t.filter(
            pc.greater(pc.multiply(t["qty_i"], pa.scalar(2, pa.int64())), t["tot_i"])
        ).select(["s_suppkey"]),
        batch_format="pyarrow",
    ).to_pandas()
    sk = set(major["s_suppkey"].astype(int)) if len(major) else set()

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat.loc[nat["n_name"] == nation, "n_nationkey"].astype(int))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    out = supp[supp["s_suppkey"].isin(sk) & supp["s_nationkey"].isin(nk)]
    return (
        out[["s_suppkey", "s_name"]]
        .sort_values("s_name", ignore_index=True)
        .astype({"s_suppkey": "int64"})
    )


def q21_waiting_suppliers(
    sf_dir: str, k: int = 100, num_buckets: int = 32
) -> pd.DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS self-correlation on the
    fact table — suppliers who were the SOLE supplier with returned
    items ('R') on a finalized multi-supplier order.  (The testdata has
    no commit/receipt dates; the return flag stands in for the
    late-delivery predicate, preserving the double-correlated shape.)

    Scale plan: lineitem pre-aggregates to (orderkey, suppkey,
    any_return) partials per batch — the only fact-sized shuffle; the
    per-order verdict (n_suppliers > 1, exactly one returner, pick it
    via max(suppkey·flag)) is a second aggregate over pairs; finalized
    orders semi-join via a bucketed join on orderkey; the final
    per-supplier count is supplier-sized."""
    import pyarrow.compute as pc

    def pair_partial(t: pa.Table) -> pa.Table:
        flag = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = (
            pa.Table.from_pydict(
                {
                    "l_orderkey": t["l_orderkey"],
                    "s_suppkey": t["l_suppkey"],
                    "r": flag,
                }
            )
            .group_by(["l_orderkey", "s_suppkey"])
            .aggregate([("r", "max")])
        )
        return g.rename_columns(["l_orderkey", "s_suppkey", "r"])

    from ray.data.aggregate import Max

    pairs = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "s_suppkey"])
        .aggregate(Max("r", alias_name="r"))
    )

    def order_partial(t: pa.Table) -> pa.Table:
        rs = pc.cast(t["r"], pa.int64())
        return pa.Table.from_pydict(
            {
                "l_orderkey": t["l_orderkey"],
                "n_supp": pa.array(np.ones(t.num_rows, np.int64)),
                "n_ret": rs,
                "ret_supp": pc.multiply(pc.cast(t["s_suppkey"], pa.int64()), rs),
            }
        )

    per_order = grouped_sum_arrow(
        pairs, ["l_orderkey"], order_partial, ["n_supp", "n_ret", "ret_supp"]
    )
    culprits = per_order.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["n_supp"], 1), pc.equal(t["n_ret"], 1))
        ).select(["l_orderkey", "ret_supp"]),
        batch_format="pyarrow",
    )
    final_orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F"))
        .select(["o_orderkey"])
        .rename_columns(["l_orderkey"]),
        batch_format="pyarrow",
    )
    kept = bucketed_hash_join(culprits, final_orders, on="l_orderkey", how="semi", num_buckets=num_buckets)
    counts = grouped_sum_arrow(
        kept.map_batches(
            lambda t: pa.Table.from_pydict(
                {"s_suppkey": pc.cast(t["ret_supp"], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        ["s_suppkey"],
        None,
        [],
        count_col="numwait",
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame(
            {
                "s_name": pd.Series([], dtype=object),
                "numwait": pd.Series([], dtype="int64"),
            }
        )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(supp, on="s_suppkey", how="inner")
    out["numwait"] = out["numwait"].astype("int64")
    out = out.sort_values(
        ["numwait", "s_name"], ascending=[False, True], ignore_index=True
    ).head(k)
    return out[["s_name", "numwait"]]


def q2_min_cost_supplier(
    sf_dir: str, region: str = "EUROPE", size: int = 25, k: int = 100
) -> pd.DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery over a 5-table join —
    for each part of one size, the region's supplier(s) offering it at
    the minimum observed price (min l_extendedprice in cents stands in
    for ps_supplycost; the testdata has no partsupp).

    Scale plan: region→nation→supplier reduces to a broadcast
    suppkey→nationkey map; the part-size filter broadcasts its key
    set; lineitem prunes to 3 columns and pre-aggregates
    (part, supp)→min-cents per batch, so the only shuffle is over the
    filtered pair partials; the correlated MIN and the final name
    attach operate on the pair aggregate (small)."""
    import pyarrow.compute as pc

    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int))
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    nat = nat[nat["n_regionkey"].isin(rk)]
    nk2name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    supp = _read(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(nk2name))]
    skeys = np.sort(supp["s_suppkey"].to_numpy(dtype=np.int64))
    parts = (
        _read(sf_dir, "part", ["p_partkey", "p_size"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["p_size"], size)).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    pkeys = np.sort(parts["p_partkey"].to_numpy(dtype=np.int64))
    sref, pref = ray.put(skeys), ray.put(pkeys)

    def cost_partial(t: pa.Table) -> pa.Table:
        sk = _cached_broadcast(sref)
        pk = _cached_broadcast(pref)
        part = np.asarray(t["l_partkey"].combine_chunks())
        sup = np.asarray(t["l_suppkey"].combine_chunks())
        m = (np.isin(part, pk) if len(pk) else np.zeros(len(part), bool)) & (
            np.isin(sup, sk) if len(sk) else False
        )
        t = t.filter(pa.array(m))
        cents = pa.array(
            np.round(
                np.asarray(t["l_extendedprice"].combine_chunks(), dtype=np.float64) * 100.0
            ).astype(np.int64)
        )
        g = (
            pa.Table.from_pydict(
                {"p_partkey": t["l_partkey"], "s_suppkey": t["l_suppkey"], "cost_i": cents}
            )
            .group_by(["p_partkey", "s_suppkey"])
            .aggregate([("cost_i", "min")])
        )
        return g.rename_columns(["p_partkey", "s_suppkey", "cost_i"])

    from ray.data.aggregate import Min

    pair_cost = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(cost_partial, batch_format="pyarrow")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Min("cost_i", alias_name="cost_i"))
        .to_pandas()
    )
    if pair_cost.empty:
        return pd.DataFrame(
            {
                "s_acctbal": pd.Series([], dtype="float64"),
                "s_name": pd.Series([], dtype=object),
                "n_name": pd.Series([], dtype=object),
                "p_partkey": pd.Series([], dtype="int64"),
                "min_cost": pd.Series([], dtype="float64"),
            }
        )
    best = pair_cost.groupby("p_partkey")["cost_i"].transform("min")
    win = pair_cost[pair_cost["cost_i"] == best].merge(supp, on="s_suppkey")
    win["n_name"] = win["s_nationkey"].map(nk2name)
    win["min_cost"] = win["cost_i"] / 100.0
    win = win.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        ignore_index=True,
    ).head(k)
    return win[["s_acctbal", "s_name", "n_name", "p_partkey", "min_cost"]]


def events_retention_cohorts(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Retention-cohort matrix: users grouped by first-activity day
    (cohort), counted on each later activity day by age — the classic
    product-analytics triangle.  Days are integer epoch days (µs //
    86_400_000_000), so every value is an exact int.

    Scale shape: ONE bucketed shuffle by user (all of a user's events
    co-locate) computes, vectorized per bucket, both the distinct
    (user, day) activity pairs and each user's min day — emitting tiny
    (cohort_day, age_days, partial count) rows; the driver folds the
    bounded days×days matrix.  No N-sized state anywhere."""
    import pyarrow.compute as pc

    US_PER_DAY = 86_400_000_000

    def days(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"],
                "day": pc.cast(pc.divide(us, US_PER_DAY), pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        days, batch_format="pyarrow"
    )

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        act = g[["user_id", "day"]].drop_duplicates()
        cohort = act.groupby("user_id", sort=False)["day"].transform("min")
        out = (
            pd.DataFrame(
                {"cohort_day": cohort, "age_days": act["day"] - cohort, "n": 1}
            )
            .groupby(["cohort_day", "age_days"], as_index=False, sort=False)["n"]
            .sum()
        )
        return out.astype(
            {"cohort_day": "int64", "age_days": "int64", "n": "int64"}
        )

    folded = (
        _bucket_by(ds, "user_id", num_buckets)
        .groupby("__bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        folded.groupby(["cohort_day", "age_days"], as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_users"})
    )
    return out.sort_values(["cohort_day", "age_days"], ignore_index=True)


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(o_orderpriority, o_orderstatus): all four grouping sets —
    finest, per-priority, per-status, grand total ('ALL' labels, the
    rollup convention).  Same plan as ``orders_rollup``: only the
    FINEST level aggregates distributed; every coarser set re-aggregates
    the tiny finest result on the driver — a CUBE never needs a second
    data pass."""
    finest = grouped_sum(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]),
        ["o_orderpriority", "o_orderstatus"],
        None,
        ["o_totalprice"],
        count_col="n_orders",
    ).to_pandas()
    finest = finest.rename(columns={"o_totalprice": "sum_totalprice"})
    sub_p = (
        finest.groupby("o_orderpriority", as_index=False)[["sum_totalprice", "n_orders"]]
        .sum()
        .assign(o_orderstatus="ALL")
    )
    sub_s = (
        finest.groupby("o_orderstatus", as_index=False)[["sum_totalprice", "n_orders"]]
        .sum()
        .assign(o_orderpriority="ALL")
    )
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "sum_totalprice": [finest["sum_totalprice"].sum()],
            "n_orders": [finest["n_orders"].sum()],
        }
    )
    out = pd.concat([finest, sub_p, sub_s, total], ignore_index=True)
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(
        ["o_orderpriority", "o_orderstatus"], ignore_index=True
    )[["o_orderpriority", "o_orderstatus", "sum_totalprice", "n_orders"]]
