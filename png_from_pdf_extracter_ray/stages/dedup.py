"""Exact deduplication — the engine's one mandated wide operation.

North rule: ``groupby-url dedup`` keeping the earliest ``warc_ts`` per
url (SURVEY.md §2.4 #12).  At 100 TB a naive
``groupby(url).map_groups(...)`` pays per-group Python overhead across
billions of groups; this implementation keeps the single unavoidable
hash shuffle but does all per-key work vectorized:

1. **within-batch pre-dedup** (``map_batches``): sort the batch by
   (key, order) and keep first-per-key — a combiner that shrinks shuffle
   volume before any data moves;
2. **hash-bucket shuffle**: add ``__bucket = siphash(key) % B`` and
   ``groupby("__bucket")`` — B groups total (not one per key), so the
   downstream stage is B vectorized table ops;
3. **within-bucket keep-first**: same vectorized sort+adjacent-mask over
   the whole bucket.

The bucket hash (``pandas.util.hash_array``) is process-stable, so the
same key always lands in the same bucket on every node.  Assumption
(documented per SURVEY §2.5): (key, order) pairs are unique per key-tie;
when both tie, the smallest ``tie_break`` column value wins to stay
deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

BUCKET_COL = "__bucket"

# Per-worker-process cache of broadcast winner maps (keyed by ObjectRef hex).
_WINNER_CACHE: dict = {}


def _keep_first_sorted(t: pa.Table, key: str, order: list[tuple[str, str]]) -> pa.Table:
    """Sort by (key, *order) and keep the first row of each key run."""
    if t.num_rows <= 1:
        return t
    t = t.sort_by([(key, "ascending"), *order])
    keys = t[key].combine_chunks()
    first = pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1))
    mask = pa.chunked_array([pa.array([True]), pc.fill_null(first, True)])
    return t.filter(mask)


def stable_bucket_ids(keys: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic, cross-process-stable bucket id per key (siphash)."""
    arr = np.asarray(keys.to_pandas(), dtype=object)
    return (pd.util.hash_array(arr) % num_buckets).astype(np.int32)


def dedup_keep_first(
    ds: ray.data.Dataset,
    key: str = "url",
    order_col: str = "warc_ts",
    tie_break: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Global exact dedup: one surviving row per ``key`` (min ``order_col``)."""
    order = [(order_col, "ascending")]
    if tie_break:
        order.append((tie_break, "ascending"))

    def pre_dedup(batch: pa.Table) -> pa.Table:
        batch = _keep_first_sorted(batch, key, order)
        bucket = stable_bucket_ids(batch[key], num_buckets)
        return batch.append_column(BUCKET_COL, pa.array(bucket, pa.int32()))

    def bucket_dedup(group: pa.Table) -> pa.Table:
        return _keep_first_sorted(group, key, order).drop_columns([BUCKET_COL])

    return (
        ds.map_batches(pre_dedup, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(bucket_dedup, batch_format="pyarrow")
    )


def compute_winners(
    slim_ds: ray.data.Dataset, key: str = "url", order_col: str = "warc_ts"
) -> pd.DataFrame:
    """(key, min(order_col)) winner table from a slim two-column dataset.

    The shuffle here moves only the key+order columns (a few % of payload
    bytes) — the pre-aggregation pattern: within-batch min first, then a
    small groupby over partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _keep_first_sorted(
            batch.select([key, order_col]), key, [(order_col, "ascending")]
        )

    # Batch-local partial mins stream back to the driver and a pandas
    # groupby finishes the merge — no distributed sort at all.  This is
    # within the broadcast mode's stated envelope (the winner map must
    # fit in memory anyway); the shuffle path (dedup_keep_first) is the
    # beyond-memory alternative.
    partials = slim_ds.map_batches(partial, batch_format="pyarrow")
    frames = [
        b.to_pandas()
        for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]
    merged = pd.concat(frames, ignore_index=True)
    out = merged.groupby(key, as_index=False, sort=False)[order_col].min()
    return out.rename(columns={order_col: "__min_order"})


def dedup_keep_first_broadcast(
    ds: ray.data.Dataset,
    winners: pd.DataFrame,
    key: str = "url",
    order_col: str = "warc_ts",
) -> ray.data.Dataset:
    """Winner-filter dedup: broadcast (key → min order) once, filter the
    payload stream in-flight — NO payload all-to-all.

    Scale tradeoff (documented): the winner map is one small row per
    distinct key.  When it fits in worker memory (up to ~10^8 keys), this
    beats shuffling payloads by a wide margin; past that, use
    ``dedup_keep_first`` (hash-bucket payload shuffle).  Assumes
    (key, order_col) is unique per key-tie (corpus guarantees distinct
    warc_ts per url); exact (key, order) duplicates within one batch are
    dropped by the batch-local pre-dedup, cross-batch ones require the
    shuffle path.
    """
    ref = ray.put(
        {
            "keys": winners[key].to_numpy(),
            "orders": winners["__min_order"].to_numpy(),
        }
    )

    # Stateless TASKS, not an actor pool: a second pool alongside the
    # extraction pool would oversubscribe the cluster's CPUs and Ray
    # Data's executor degrades badly once combined pool reservations
    # exceed available CPUs (observed: 30+8 pools on 32 CPUs → ~1×
    # effective parallelism).  Tasks scale elastically into whatever the
    # extract pool leaves free; the winner map is fetched from the
    # object store (shared memory) and cached per worker process.
    def winner_filter(batch: pa.Table) -> pa.Table:
        lookup = _WINNER_CACHE.get(ref.hex())
        if lookup is None:
            # single-entry cache (same policy as neardup._CAND_ID_CACHE):
            # repeated runs in one worker process must not pin every past
            # winner map for the process lifetime
            _WINNER_CACHE.clear()
            w = ray.get(ref)
            lookup = pd.Series(w["orders"], index=w["keys"])
            _WINNER_CACHE[ref.hex()] = lookup
        batch = _keep_first_sorted(batch, key, [(order_col, "ascending")])
        keys = batch[key].to_pandas()
        orders = batch[order_col].to_pandas()
        win = lookup.reindex(keys).to_numpy()
        mask = pa.array(orders.to_numpy() == win)
        return batch.filter(mask)

    return ds.map_batches(winner_filter, batch_format="pyarrow")
