"""Vectorized row filters.

``filter_lang`` is the whitelist predicate of the reference
(/root/reference/src/services/whitelist_service.py:26-38: compiled-regex
match on the sender; non-matching documents are dropped without a reply,
/root/reference/src/services/job_processor.py:80-86) lifted to a
vectorized Arrow kernel over the ``lang`` column.  The regex is anchored
at the start, matching ``re.match`` semantics, and compiled once per
task by pyarrow — never per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def filter_lang(ds: ray.data.Dataset, pattern: str | None, column: str = "lang") -> ray.data.Dataset:
    """Keep rows whose ``column`` matches the anchored whitelist regex."""
    if pattern is None:
        return ds
    anchored = pattern if pattern.startswith("^") else f"^(?:{pattern})"

    def _f(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch[column], anchored)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(_f, batch_format="pyarrow")


def filter_expr(ds: ray.data.Dataset, fn) -> ray.data.Dataset:  # noqa: ANN001
    """Generic vectorized filter: ``fn(batch) -> BooleanArray``."""

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.fill_null(fn(batch), False))

    return ds.map_batches(_f, batch_format="pyarrow")
