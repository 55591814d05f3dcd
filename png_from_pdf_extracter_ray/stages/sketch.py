"""Mergeable quantile sketch — streaming approximate percentiles.

The exact-quantile query (`quantity_quantiles_by_returnflag`) gathers
every value of a group; at 100 TB that is the one aggregate whose state
cannot be a scalar.  This sketch keeps the state bounded: each batch
contributes a WEIGHTED GRID summary of its values per key — the sorted
batch sampled at ``grid`` evenly-spaced ranks, each grid point carrying
weight ``n_batch / grid`` — and grids merge by weighted concatenation.
Rank error of the merged estimate is bounded by ``1/grid`` of the total
weight (each batch contributes at most ``n_b/grid`` rank slack), so
``grid=128`` gives ≤ ~0.8% rank error regardless of data size, with
per-key state ``O(n_batches × grid)`` rows instead of ``O(N)`` values.

Partitioning note: the final merge is a Ray ``groupby(key)`` — valid
ONLY for low-cardinality keys (≤ ~10^4 groups; the engine's standing
rule).  For high-cardinality keys, hash-bucket the partial-grid rows
and merge per bucket instead (the rows are already tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _batch_grid(values: np.ndarray, grid: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted grid sample of one batch: ``min(grid, n)`` points at evenly
    spaced ranks, each weighted ``n / n_points``."""
    v = np.sort(values)
    n = len(v)
    g = min(grid, n)
    ranks = ((np.arange(g) + 0.5) * n / g).astype(np.int64).clip(0, n - 1)
    return v[ranks], np.full(g, n / g, dtype=np.float64)


def weighted_quantile(
    values: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Value at rank q·Σw of the weighted sample (lower weighted rank)."""
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    cum = np.cumsum(w)
    target = q * cum[-1]
    idx = int(np.searchsorted(cum, target, side="left"))
    return float(v[min(idx, len(v) - 1)])


def quantile_sketch_by_key(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    grid: int = 128,
) -> pd.DataFrame:
    """Approximate per-key quantiles with bounded state.

    Per batch: one vectorized pandas groupby builds a weighted grid per
    key (tiny rows ``(key, value, weight)``); one low-cardinality Ray
    groupby merges the grids and reads off the weighted quantiles.
    """
    # key type captured from the DATASET schema at build time: an empty
    # batch's pa.array([]) would infer null type and degrade downstream
    # schema unification (the typed-empty rule, stages/neardup._typed_table)
    from .neardup import _schema_type

    key_type = _schema_type(ds, key_col)

    def partial(df: pd.DataFrame) -> pa.Table:
        keys_out: list = []
        vals_out: list[np.ndarray] = []
        wts_out: list[np.ndarray] = []
        for key, sub in df.groupby(key_col, sort=False):
            v, w = _batch_grid(sub[val_col].to_numpy(dtype=np.float64), grid)
            keys_out.extend([key] * len(v))
            vals_out.append(v)
            wts_out.append(w)
        return pa.Table.from_pydict(
            {
                key_col: pa.array(keys_out, key_type),
                "value": pa.array(
                    np.concatenate(vals_out) if vals_out else np.empty(0), pa.float64()
                ),
                "weight": pa.array(
                    np.concatenate(wts_out) if wts_out else np.empty(0), pa.float64()
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        w = g["weight"].to_numpy()
        row: dict = {key_col: [g[key_col].iloc[0]]}
        for q in qs:
            row[f"p{int(q * 100)}"] = [weighted_quantile(v, w, q)]
        return pd.DataFrame(row)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col, ignore_index=True)
