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


def global_percentile_ranks(
    ds: rd.Dataset,
    id_col: str,
    val_col: str,
    grid: int = 128,
) -> rd.Dataset:
    """Approximate percentile rank of every row's value within the WHOLE
    dataset — the per-row feature-scaling transform an exact
    ``percent_rank()`` window cannot do at scale (it needs a global sort
    or an N-sized rank map).

    Two streaming passes: (1) each batch contributes a weighted-grid
    summary (``_batch_grid``; ≤ grid rows per batch), merged into one
    global CDF on the driver — the sketch, not the data; (2) the CDF's
    (sorted values, cumulative weights) arrays broadcast via ``ray.put``
    and each batch assigns ranks with ONE vectorized ``searchsorted``.
    Rank = (approx weight strictly below value) / total ∈ [0, 1); the
    sketch rank error is ≤ ~1/grid of the total weight (each batch
    contributes ≤ n_b/grid slack), asserted by a pytest vs the exact
    rank.
    """
    import ray

    grid_schema = pa.schema([("value", pa.float64()), ("weight", pa.float64())])

    def grid_partial(df: pd.DataFrame) -> pa.Table:
        v = df[val_col].to_numpy(dtype=np.float64)
        if v.size == 0:
            return grid_schema.empty_table()
        gv, gw = _batch_grid(v, grid)
        return pa.Table.from_pydict(
            {"value": pa.array(gv, pa.float64()), "weight": pa.array(gw, pa.float64())}
        )

    parts = ds.map_batches(grid_partial, batch_format="pandas").to_pandas()
    v = parts["value"].to_numpy()
    w = parts["weight"].to_numpy()
    order = np.argsort(v, kind="stable")
    vals, cumw = v[order], np.cumsum(w[order])
    total = float(cumw[-1]) if len(cumw) else 0.0
    ref = ray.put((vals, cumw, total))

    from ..pipelines.relational import _cached_broadcast
    from .neardup import _schema_type

    id_type = _schema_type(ds, id_col)

    def assign(df: pd.DataFrame) -> pa.Table:
        cvals, ccum, ctotal = _cached_broadcast(ref)
        x = df[val_col].to_numpy(dtype=np.float64)
        idx = np.searchsorted(cvals, x, side="left")
        below = np.where(idx > 0, ccum[np.maximum(idx - 1, 0)], 0.0)
        pct = np.round(below / ctotal, 6) if ctotal else np.zeros_like(x)
        return pa.Table.from_pydict(
            {
                id_col: pa.array(df[id_col], id_type),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable approximate count-distinct
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers → ~1.6% standard error
_HLL_M = 1 << HLL_P


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partial(values: np.ndarray) -> np.ndarray:
    """One batch → a 2^p register array (uint8), fully vectorized.

    Register index = top p bits of the 64-bit value hash; register value
    = position of the first 1-bit in the remaining 64-p bits (ρ), via a
    float64 log2 (exact for powers of two below 2^53, and 64-p = 52 here
    — no precision cliff)."""
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    if values.size == 0:
        return regs
    h = pd.util.hash_array(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - HLL_P)) - 1)
    width = 64 - HLL_P
    rho = np.full(h.size, width + 1, dtype=np.uint8)
    nz = rest > 0
    # ρ = leading-zero count within the (64-p)-bit word, +1
    rho[nz] = (width - np.floor(np.log2(rest[nz].astype(np.float64)))).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimate with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = regs.size
    est = _hll_alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_count_distinct_by_key(
    ds: rd.Dataset, key_col: str, val_col: str
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT val) per key with O(keys × 4 KiB)
    total state — the bounded-memory alternative to the exact
    ``distinct_users_per_event_type`` (whose per-key distinct sets grow
    with the data).

    Per batch: one register array per key present in the batch (rows:
    key + 4096-byte register blob).  Partials stream to the driver and
    merge by elementwise max — mergeability is the point: partials from
    any partitioning of the data combine associatively, so this extends
    to a bucketed reduce for high-cardinality keys unchanged.
    Low-cardinality keys only in this wrapper (the engine's standing
    groupby rule).
    """

    def partial(df: pd.DataFrame) -> pa.Table:
        keys, blobs = [], []
        for key, vals in df.groupby(key_col, sort=False)[val_col]:
            keys.append(key)
            blobs.append(hll_partial(vals.to_numpy()).tobytes())
        return pa.Table.from_pydict(
            {
                "key": pa.array(keys, pa.string()),
                "regs": pa.array(blobs, pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out_keys, out_est = [], []
    for key, blobs in parts.groupby("key", sort=False)["regs"]:
        regs = np.zeros(_HLL_M, dtype=np.uint8)
        for b in blobs:
            regs = hll_merge(regs, np.frombuffer(b, dtype=np.uint8))
        out_keys.append(key)
        out_est.append(hll_estimate(regs))
    return pd.DataFrame(
        {key_col: out_keys, "n_distinct_est": pd.Series(out_est, dtype="int64")}
    ).sort_values(key_col, ignore_index=True)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications", J.Alg 55)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 2048
# depth pairwise-independent hash rows derived from ONE 64-bit value
# hash (odd multipliers → bijective mixing mod 2^64); constants are part
# of the sketch contract, shared by engine and flat oracle
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_CMS_B = np.array(
    [0xD6E8FEB86659FD93, 0xA5CB9243D8E1F2C7, 0x8CB92BA72F3D8E11, 0xE7037ED1A0B428DB],
    dtype=np.uint64,
)


# shift derived FROM the width (top log2(width) bits of the mix): a
# hard-coded shift would silently strand columns if CMS_WIDTH changed
assert CMS_WIDTH & (CMS_WIDTH - 1) == 0, "CMS_WIDTH must be a power of two"
_CMS_SHIFT = np.uint64(64 - (CMS_WIDTH.bit_length() - 1))


def cms_indices(h: np.ndarray) -> np.ndarray:
    """(depth, n) column indices from a uint64 value-hash vector — the
    top bits of an odd-multiplier mix (better-avalanched than low bits)."""
    mixed = (_CMS_A[:, None] * h[None, :] + _CMS_B[:, None])  # uint64 wrap
    return (mixed >> _CMS_SHIFT).astype(np.int64)


def cms_partial(tokens: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """One batch of (token, count) partials → a (CMS_DEPTH, CMS_WIDTH)
    int64 sketch.  Integer adds → mergeable and order-independent, so
    the distributed fold is bit-identical to the flat recompute."""
    sk = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    if tokens.size == 0:
        return sk
    h = pd.util.hash_array(np.asarray(tokens, dtype=object))
    idx = cms_indices(h)
    w = weights.astype(np.int64)
    for d in range(CMS_DEPTH):
        np.add.at(sk[d], idx[d], w)
    return sk


def cms_query(sk: np.ndarray, tokens: np.ndarray) -> np.ndarray:
    """Point estimates: min over depth rows (classic CM upper-bound
    estimator — never under-counts)."""
    if tokens.size == 0:
        return np.zeros(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(tokens, dtype=object))
    idx = cms_indices(h)
    ests = np.stack([sk[d, idx[d]] for d in range(CMS_DEPTH)])
    return ests.min(axis=0)


def cms_token_counts(ds: rd.Dataset) -> np.ndarray:
    """Distributed CMS over the token stream of a ``text`` Dataset: one
    ``map_batches`` emits a 64 KiB sketch row per batch, the driver folds
    integer sums.  At web scale the fold becomes a tree-reduce (the
    sketch is associative); the per-batch sketch size is constant, so
    nothing grows with the corpus."""
    from ..pipelines.corpus_stats import _token_partials

    def partial(df: pd.DataFrame) -> pa.Table:
        parts = _token_partials(df, distinct_per_doc=False)
        sk = cms_partial(
            parts["token"].to_numpy(dtype=object), parts["n"].to_numpy(np.int64)
        )
        flat = sk.ravel()
        offs = pa.array(np.array([0, flat.size], dtype=np.int32))
        return pa.Table.from_pydict(
            {"sketch": pa.ListArray.from_arrays(offs, pa.array(flat, pa.int64()))}
        )

    acc = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            acc += (
                np.asarray(b["sketch"].combine_chunks().flatten())
                .reshape(b.num_rows, acc.size)
                .sum(axis=0)
            )
    return acc.reshape(CMS_DEPTH, CMS_WIDTH)
