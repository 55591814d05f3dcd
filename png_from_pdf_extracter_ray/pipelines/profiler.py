"""Distributed table profiler — the "what is in this table" first query
of every data-engineering session: per column, row count, null count,
and EXACT distinct count.

Ray shape: ONE streaming pass emits, per batch, (a) tiny per-column
(n_rows, n_nulls) integer partials and (b) the batch-DISTINCT
``(column, value_hash)`` pairs — both as one tagged stream; ONE
hash-bucketed shuffle then folds: all rows of a (column, hash) pair
co-locate, so the global distinct count per column is the sum of
per-bucket pair-distinct counts, and the stats partials sum exactly
(int64).  The shuffle moves Σ per-batch-distinct pairs — the honest
cost of EXACT distinct (an approximate profile would swap in the HLL
sketch from stages/sketch.py); value hashing (blake2b/8-byte) only
compresses the shuffled key, collisions are negligible and would only
UNDERcount, never crash.

SQL-checked: DuckDB re-derives every number declaratively
(COUNT / COUNT(DISTINCT) / null CASE per column, UNION ALL) — REAL
opposite-architecture aggregation, no flat twin.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..stages.dedup import stable_bucket_ids

# Profiled table/columns — single-sourced into the oracle SQL.
PROFILE_TABLE = "lineitem"
PROFILE_COLUMNS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]

_TAG_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = stats partial, 1 = distinct pair
        ("col", pa.string()),
        ("h", pa.int64()),  # value hash (pairs) / unused (stats)
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        ("col", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("n_distinct", pa.int64()),
    ]
)


def _value_hashes(arr: pa.ChunkedArray) -> np.ndarray:
    """Distinct non-null values of one column → int64 hashes.

    Values are canonicalized through Arrow's own string cast (stable,
    type-aware) and hashed with blake2b/8 — deterministic across
    processes (pd.util.hash_array of object dtype is salt-stable but
    Arrow cast keeps this independent of pandas internals)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, np.int64)
    import pyarrow.compute as pc

    s = pc.cast(arr, pa.string())
    uniq = pc.unique(s).to_pylist()
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest(),
                "big",
                signed=True,
            )
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )


def profile_table(
    sf_dir: str, table: str = PROFILE_TABLE, num_buckets: int = 32
) -> rd.Dataset:
    """Per-column profile of a parquet table: (col, n_rows, n_nulls,
    n_distinct) — see module docstring for the distributed shape."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))
    cols = PROFILE_COLUMNS if table == PROFILE_TABLE else None

    def partial(t: pa.Table) -> pa.Table:
        names = cols or t.column_names
        kinds: list = []
        col_v: list = []
        h_v: list = []
        nr_v: list = []
        nn_v: list = []
        for name in names:
            arr = t[name]
            kinds.append(np.int8(0))
            col_v.append(name)
            h_v.append(0)
            nr_v.append(t.num_rows)
            nn_v.append(arr.null_count)
            hashes = _value_hashes(arr)
            kinds.extend([np.int8(1)] * len(hashes))
            col_v.extend([name] * len(hashes))
            h_v.extend(hashes.tolist())
            nr_v.extend([0] * len(hashes))
            nn_v.extend([0] * len(hashes))
        out = pa.Table.from_arrays(
            [
                pa.array(kinds, pa.int8()),
                pa.array(col_v, pa.string()),
                pa.array(h_v, pa.int64()),
                pa.array(nr_v, pa.int64()),
                pa.array(nn_v, pa.int64()),
            ],
            schema=_TAG_SCHEMA,
        )
        b = (
            stable_bucket_ids(out["h"], num_buckets)
            if out.num_rows
            else np.empty(0, np.int32)
        )
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    _FOLD_SCHEMA = _OUT_SCHEMA

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _FOLD_SCHEMA.empty_table()
        stats = g[g["kind"] == 0]
        pairs = g[g["kind"] == 1]
        s = (
            stats.groupby("col", as_index=False, sort=False)[["n_rows", "n_nulls"]]
            .sum()
            if not stats.empty
            else pd.DataFrame({"col": [], "n_rows": [], "n_nulls": []})
        )
        d = (
            pairs.drop_duplicates(["col", "h"])
            .groupby("col", as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n_distinct"})
            if not pairs.empty
            else pd.DataFrame({"col": [], "n_distinct": []})
        )
        out = s.merge(d, on="col", how="outer").fillna(0)
        return pa.Table.from_pandas(
            out[["col", "n_rows", "n_nulls", "n_distinct"]].astype(
                {"n_rows": "int64", "n_nulls": "int64", "n_distinct": "int64"}
            ),
            schema=_FOLD_SCHEMA,
            preserve_index=False,
        )

    def refold(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["col"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__cb", pa.array(b, pa.int32()))

    def final(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _OUT_SCHEMA.empty_table()
        out = g.groupby("col", as_index=False, sort=False)[
            ["n_rows", "n_nulls", "n_distinct"]
        ].sum()
        return pa.Table.from_pandas(out, schema=_OUT_SCHEMA, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
        .map_batches(refold, batch_format="pyarrow")
        .groupby("__cb")
        .map_groups(final, batch_format="pandas")
    )


def profile_table_approx(
    sf_dir: str, table: str = PROFILE_TABLE
) -> pd.DataFrame:
    """ZERO-SHUFFLE approximate profile — the 10^12-row variant of
    :func:`profile_table`: per column, row/null counts are exact int64
    sums and the distinct count is an HLL estimate (stages/sketch.py
    registers, ~1.6% stderr at 2^11 registers).  Every batch emits one
    (col → registers + counters) partial; partials merge by register
    max — O(columns × 4 KiB) cross-batch state, nothing else moves.
    Rows-only (an estimate can never hash-match COUNT(DISTINCT)); the
    accuracy bound is pinned by pytest against the exact profiler.
    """
    import os

    from ..stages.sketch import hll_estimate, hll_merge, hll_partial

    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))
    cols = PROFILE_COLUMNS if table == PROFILE_TABLE else None

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names = cols or t.column_names
        rows = []
        for name in names:
            arr = t[name]
            nn = arr.null_count
            s = pc.cast(
                arr.combine_chunks().drop_null(), pa.string()
            ).to_numpy(zero_copy_only=False)
            regs = hll_partial(s)
            rows.append(
                {
                    "col": name,
                    "n_rows": t.num_rows,
                    "n_nulls": nn,
                    "regs": regs.tobytes(),
                }
            )
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for col, g in parts.groupby("col", sort=False):
        regs = None
        for rb in g["regs"]:
            r = np.frombuffer(rb, dtype=np.uint8)
            regs = r if regs is None else hll_merge(regs, r)
        rows.append(
            {
                "col": col,
                "n_rows": int(g["n_rows"].sum()),
                "n_nulls": int(g["n_nulls"].sum()),
                "n_distinct_est": hll_estimate(regs),
            }
        )
    return pd.DataFrame(rows).sort_values("col", ignore_index=True)
