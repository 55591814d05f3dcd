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

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if compute is not None:
            df = compute(df)
        if count_col:
            df = df.assign(**{count_col: 1})
        cols = sum_cols + ([count_col] if count_col else [])
        return df.groupby(keys, as_index=False, sort=False)[cols].sum()

    partials = ds.map_batches(partial, batch_format="pandas")
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

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# Query implementations (names mirror __ray_entry__.oracle_sql entries)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape over lineitem (columns pruned at the read)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )

    def compute(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        disc_price = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.assign(
            sum_qty=df["l_quantity"],
            sum_base_price=df["l_extendedprice"],
            sum_disc_price=disc_price,
            sum_charge=disc_price * (1 + df["l_tax"]),
        )

    out = grouped_sum(
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
    out = grouped_sum(
        ds,
        ["lang"],
        lambda df: df.assign(sum_n_chars=df["n_chars"]),
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
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k).to_pandas()
    return out


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
    out = grouped_sum(
        ds,
        ["o_orderpriority"],
        lambda df: df.assign(sum_totalprice=df["o_totalprice"]),
        ["sum_totalprice"],
        count_col="n_orders",
    ).to_pandas()
    out["sum_totalprice"] = out["sum_totalprice"].round(2)
    return out


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (streaming-shaped aggregate)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def compute(df: pd.DataFrame) -> pd.DataFrame:
        # hour emitted as a string so the value-hash is representation-stable
        # across pandas ns / Arrow us / DuckDB timestamps.
        hour = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        return df.assign(hour=hour, sum_value=df["value"])

    out = grouped_sum(ds, ["event_type", "hour"], compute, ["sum_value"], count_col="n_events").to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    return out


def nations_per_region(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region").to_pandas()
    joined = broadcast_join(
        nation, region.rename(columns={"r_regionkey": "n_regionkey"}), on="n_regionkey"
    )
    return grouped_sum(joined, ["r_name"], None, [], count_col="n_nations").to_pandas()
