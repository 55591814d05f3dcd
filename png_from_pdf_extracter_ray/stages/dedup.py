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
