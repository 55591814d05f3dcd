"""Distributed weighted-threshold selection (the "global prefix-sum cut"
primitive).

``weighted_key_cut`` answers, over an int64 key column with int64
weights: *what is the smallest key value k\\* such that the total weight
of rows with key <= k\\* reaches a target?* — without a global sort and
without collecting any N-sized state on the driver.  It is the
distributed building block behind budgeted data selection ("keep the
best documents until the token budget is spent", DSIR/DoReMi-style
curation), weighted percentiles over unbounded-cardinality keys, and
top-k-by-weight cuts.

Algorithm: iterative histogram refinement (the classic distributed
selection / k-th-element scheme).  Each round lays ``num_bins`` equal
integer sub-ranges over the current candidate key range ``[lo, hi]``,
computes per-bin weight sums in ONE streaming pass (per-block
``np.bincount`` partials folded by a tree ``Dataset.aggregate`` — no
shuffle at all, the driver only ever sees a ``num_bins``-sized vector),
walks the bins to find the one containing the cut, and recurses into
it.  Rounds needed: ``ceil(log_num_bins(key_range))`` — 2 passes for a
20-bit key space, 6 for the full int64 range.  At 10^12 rows each pass
is a pruned scan of a 24-byte-row projection; nothing else moves.

Exactness: keys and weights are int64 and every bin boundary is integer
arithmetic, so the returned cut is bit-exact and batch-invariant (the
same design rule as stages/ml.py: no float reduction ever crosses a
batch boundary).  Ties on the key are NOT broken here — callers that
need a within-key order (e.g. by doc id) run a second cut over the tie
group, which this module's ``token_budget`` caller does.

No reference analog (beyond-reference LLM-pipeline operator; the
reference processes one attachment at a time,
src/services/pdf_converter.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import AggregateFn
from ray.data.block import BlockAccessor

__all__ = [
    "weighted_key_cut",
    "weighted_multi_cut",
    "grouped_multi_cut",
    "key_range",
]


def key_range(ds: rd.Dataset, key_col: str) -> tuple[int, int]:
    """(min, max) of an int64 column — one streaming aggregate pass."""
    row = ds.aggregate(
        AggregateFn(
            init=lambda _: (np.iinfo(np.int64).max, np.iinfo(np.int64).min),
            accumulate_block=lambda acc, block: _minmax_block(acc, block, key_col),
            merge=lambda a, b: (min(a[0], b[0]), max(a[1], b[1])),
            name="key_range",
        )
    )
    lo, hi = row["key_range"]
    if lo > hi:
        raise ValueError(f"key_range over empty dataset for {key_col!r}")
    return int(lo), int(hi)


def _minmax_block(acc, block, key_col):  # noqa: ANN001, ANN202
    t = BlockAccessor.for_block(block).to_arrow()
    if t.num_rows == 0:
        return acc
    k = t[key_col].to_numpy(zero_copy_only=False)
    return (min(acc[0], int(k.min())), max(acc[1], int(k.max())))


def _bin_layout(lo: int, hi: int, num_bins: int) -> tuple[int, int]:
    """``(nb, step)`` for range ``[lo, hi]``: bin of key k = (k-lo)//step,
    with ``step = ceil(width/num_bins)`` computed in Python ints (width
    may exceed int64 — the full int64 span is 2^64 keys) and ``nb =
    ceil(width/step)`` the number of occupied bins.  Division-first:
    the per-row bin assignment never multiplies a key distance."""
    width = hi - lo + 1  # Python int — exact even at 2**64
    step = -(-width // max(1, min(num_bins, width)))
    nb = -(-width // step)
    return nb, step


def _bin_bounds(lo: int, hi: int, step: int, b: int) -> tuple[int, int]:
    """Inclusive key range covered by bin ``b`` (keys with
    (k-lo)//step == b), in exact Python-int arithmetic."""
    return lo + b * step, min(hi, lo + (b + 1) * step - 1)


def _multi_hist_pass(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    los: np.ndarray,
    his: np.ndarray,
    steps: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """One streaming pass computing the per-bin weight sums of SEVERAL
    disjoint key ranges at once (the ranges are nodes of the same
    refinement partition tree, so any two are identical-or-disjoint and
    the deduped set is disjoint and sorted).  Returns the concatenated
    histogram vector (``offsets`` lays each range's bins out).

    Overflow safety: key distances ``k - lo`` can span the full int64
    range (up to 2^64 - 1), so they are computed in uint64 — int64→
    uint64 reinterpretation wraps mod 2^64, and because ``lo <= k`` the
    wrapped difference IS the true unsigned distance.  ``steps`` is a
    uint64 vector; the divide-first bin index is < 4096 and fits int64."""
    total = int(offsets[-1])
    los_u = los.astype(np.uint64)

    def acc_block(acc: np.ndarray, block) -> np.ndarray:  # noqa: ANN001
        t = BlockAccessor.for_block(block).to_arrow()
        if t.num_rows == 0:
            return acc
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        ri = np.searchsorted(los, k, side="right") - 1
        valid = ri >= 0
        riv = np.where(valid, ri, 0)
        valid &= k <= his[riv]
        if not valid.any():
            return acc
        ri, k, w = riv[valid], k[valid], w[valid]
        delta = k.astype(np.uint64) - los_u[ri]  # exact unsigned distance
        bins = offsets[ri] + (delta // steps[ri]).astype(np.int64)
        out = acc.copy()
        np.add.at(out, bins, w)
        return out

    row = ds.aggregate(
        AggregateFn(
            init=lambda _: np.zeros(total, dtype=np.int64),
            accumulate_block=acc_block,
            merge=lambda a, b: a + b,
            name="whist",
        )
    )
    return np.asarray(row["whist"], dtype=np.int64)


def weighted_multi_cut(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    targets: list[int],
    num_bins: int = 4096,
) -> list[tuple[int, int]]:
    """``weighted_key_cut`` for SEVERAL targets with shared passes: each
    refinement round runs ONE streaming aggregate that histograms every
    still-active target's candidate range (the shard planner's S−1
    boundary cuts cost one pass per ROUND, not per boundary).  Returns
    ``[(k_star, below), ...]`` aligned with ``targets``."""
    for t in targets:
        if t < 1:
            raise ValueError(f"targets must be >= 1, got {t}")
    if not targets:
        return []
    lo0, hi0 = key_range(ds, key_col)
    # state per target: (lo, hi, below, target, output index)
    active = [(lo0, hi0, 0, t, i) for i, t in enumerate(targets)]
    results: list[tuple[int, int] | None] = [None] * len(targets)
    # mass-conservation ledger: refined range -> the parent bin's weight
    # (None for the root range).  A refined histogram summing to anything
    # else means a row was silently mis-binned — fail loudly.
    expect: dict[tuple[int, int], int | None] = {(lo0, hi0): None}
    while active:
        ranges = sorted({(lo, hi) for lo, hi, _, _, _ in active})
        layouts = [_bin_layout(lo, hi, num_bins) for lo, hi in ranges]
        nbs = [nb for nb, _ in layouts]
        steps = np.asarray([s for _, s in layouts], dtype=np.uint64)
        los = np.asarray([r[0] for r in ranges], dtype=np.int64)
        his = np.asarray([r[1] for r in ranges], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(nbs)]).astype(np.int64)
        hist = _multi_hist_pass(ds, key_col, weight_col, los, his, steps, offsets)
        range_idx = {r: j for j, r in enumerate(ranges)}
        for r, j in range_idx.items():
            exp = expect.get(r)
            got = int(hist[int(offsets[j]) : int(offsets[j]) + nbs[j]].sum())
            if exp is not None and got != exp:
                raise AssertionError(
                    f"histogram mass not conserved over {r}: parent bin "
                    f"weight {exp}, refined total {got}"
                )
        nxt = []
        nexpect: dict[tuple[int, int], int | None] = {}
        for lo, hi, below, target, i in active:
            j = range_idx[(lo, hi)]
            nb, step = layouts[j]
            h = hist[int(offsets[j]) : int(offsets[j]) + nb]
            cum = below + np.cumsum(h)
            idx = int(np.searchsorted(cum, target, side="left"))
            if idx >= nb:
                raise ValueError(
                    f"target {target} exceeds total weight {int(cum[-1])}"
                )
            b_lo, b_hi = _bin_bounds(lo, hi, step, idx)
            nbelow = int(cum[idx - 1]) if idx > 0 else below
            if b_lo == b_hi:
                results[i] = (b_lo, nbelow)
            else:
                nxt.append((b_lo, b_hi, nbelow, target, i))
                nexpect[(b_lo, b_hi)] = int(h[idx])
        active = nxt
        expect = nexpect
    return results  # type: ignore[return-value]


def grouped_multi_cut(
    ds: rd.Dataset,
    group_col: str,
    key_col: str,
    weight_col: str,
    jobs: list[tuple[int, int]],
    num_bins: int = 4096,
) -> list[tuple[int, int]]:
    """One ``weighted_key_cut`` per ``(group_value, target)`` job, each
    restricted to rows with ``group_col == group_value`` — with SHARED
    streaming passes: every refinement round histograms the key column
    of EVERY active job in ONE ``Dataset.aggregate`` (the shard
    planner's S−1 tie cuts cost one pass per round, not per boundary).
    All jobs start from the GLOBAL key range (one extra pass at most
    versus per-group ranges; at most one extra refinement round).
    Returns ``[(k_star, below), ...]`` aligned with ``jobs``, where
    ``below`` is the weight of the job's group strictly below k_star."""
    for _, t in jobs:
        if t < 1:
            raise ValueError(f"targets must be >= 1, got {t}")
    if not jobs:
        return []
    lo0, hi0 = key_range(ds, key_col)
    active = [(g, lo0, hi0, 0, t, i) for i, (g, t) in enumerate(jobs)]
    results: list[tuple[int, int] | None] = [None] * len(jobs)
    expect: dict[tuple[int, int, int], int | None] = {
        (g, lo0, hi0): None for g, _, _, _, _, _ in active
    }
    while active:
        ranges = sorted({(g, lo, hi) for g, lo, hi, _, _, _ in active})
        layouts = [_bin_layout(lo, hi, num_bins) for _, lo, hi in ranges]
        offsets = np.concatenate([[0], np.cumsum([nb for nb, _ in layouts])]).astype(
            np.int64
        )
        total = int(offsets[-1])
        specs = [
            (g, lo, hi, np.uint64(step % (1 << 64)), int(offsets[j]))
            for j, ((g, lo, hi), (_, step)) in enumerate(zip(ranges, layouts))
        ]

        def acc_block(acc: np.ndarray, block) -> np.ndarray:  # noqa: ANN001
            t = BlockAccessor.for_block(block).to_arrow()
            if t.num_rows == 0:
                return acc
            gv = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            out = None
            for g, lo, hi, step, off in specs:
                m = (gv == g) & (k >= lo) & (k <= hi)
                if not m.any():
                    continue
                if out is None:
                    out = acc.copy()
                lo_u = np.uint64(lo % (1 << 64))
                delta = k[m].astype(np.uint64) - lo_u
                bins = off + (delta // step).astype(np.int64)
                np.add.at(out, bins, w[m])
            return acc if out is None else out

        row = ds.aggregate(
            AggregateFn(
                init=lambda _: np.zeros(total, dtype=np.int64),
                accumulate_block=acc_block,
                merge=lambda a, b: a + b,
                name="gwhist",
            )
        )
        hist = np.asarray(row["gwhist"], dtype=np.int64)
        range_idx = {r: j for j, r in enumerate(ranges)}
        for r, j in range_idx.items():
            exp = expect.get(r)
            got = int(hist[int(offsets[j]) : int(offsets[j]) + layouts[j][0]].sum())
            if exp is not None and got != exp:
                raise AssertionError(
                    f"histogram mass not conserved over {r}: parent bin "
                    f"weight {exp}, refined total {got}"
                )
        nxt = []
        nexpect: dict[tuple[int, int, int], int | None] = {}
        for g, lo, hi, below, target, i in active:
            j = range_idx[(g, lo, hi)]
            nb, step = layouts[j]
            h = hist[int(offsets[j]) : int(offsets[j]) + nb]
            cum = below + np.cumsum(h)
            idx = int(np.searchsorted(cum, target, side="left"))
            if idx >= nb:
                raise ValueError(
                    f"target {target} exceeds group {g} total weight {int(cum[-1])}"
                )
            b_lo, b_hi = _bin_bounds(lo, hi, step, idx)
            nbelow = int(cum[idx - 1]) if idx > 0 else below
            if b_lo == b_hi:
                results[i] = (b_lo, nbelow)
            else:
                nxt.append((g, b_lo, b_hi, nbelow, target, i))
                nexpect[(g, b_lo, b_hi)] = int(h[idx])
        active = nxt
        expect = nexpect
    return results  # type: ignore[return-value]


def weighted_key_cut(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    target: int,
    num_bins: int = 4096,
) -> tuple[int, int]:
    """Smallest int64 key ``k*`` with ``sum(weight | key <= k*) >=
    target``, plus ``below = sum(weight | key < k*)``.

    ``target`` must be >= 1 and <= the total weight (weights must be
    non-negative; rows with zero weight never become the cut key).
    Returns ``(k_star, below)`` with ``below < target`` guaranteed.
    """
    return weighted_multi_cut(ds, key_col, weight_col, [target], num_bins)[0]
