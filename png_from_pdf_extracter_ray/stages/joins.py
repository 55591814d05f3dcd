"""Distributed join stages.

``bucketed_hash_join`` is the engine's portable large⋈large pattern:
both sides get a stable ``hash(key) % B`` bucket column and a side tag;
the union shuffles ONCE on the bucket, and each bucket group is joined
with a vectorized pandas merge.  Skewed keys salt naturally across B
(document: B should be ≥ 2-4× cluster cores; hot single keys would need
an extra salt column on the build side).

Both sides are padded to ONE combined Arrow schema (typed null columns
for the fields the side lacks) before the union: without this, pandas
aligns the mismatched schemas with NaN and silently coerces int64 key
columns to float64 — which then hash into different buckets than their
int values in any downstream join and match nothing.  Each side is
split back out in Arrow (null-free after the filter), so dtypes survive
the round trip exactly.

Lives in ``stages/`` (not ``pipelines/``) because both relational
queries and the near-dup verification path compose it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import stable_bucket_ids


def _arrow_type(t) -> pa.DataType:  # noqa: ANN001
    """Ray Schema types are Arrow types for Arrow blocks but numpy/python
    dtypes for pandas blocks — normalize (object dtype ≙ string here)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> rd.Dataset:
    """Explicit partitioned hash join — one bucket shuffle, merge per bucket.

    ``how``: "inner", "left" (unmatched left rows keep typed nulls on the
    right columns), "outer" (FULL OUTER — unmatched rows of EITHER side
    survive with typed nulls on the other side's columns; the key column
    is total), "anti" (left rows with NO match — the NOT-IN /
    NOT-EXISTS shape), or "semi" (left rows WITH at least one match,
    each at most once regardless of match multiplicity — the EXISTS /
    IN-subquery shape; output carries only the left columns).

    ``schemas``: optional explicit (left, right) Arrow schemas.  Without
    them the join asks each side for ``Dataset.schema()``, and on a LAZY
    input whose lineage crosses a shuffle that inference executes the
    whole upstream just to peek one block (the streaming executor cannot
    produce a first row through an all-to-all without running it) —
    callers whose side schemas are statically known should pass them."""
    if how not in ("inner", "left", "outer", "anti", "semi"):
        raise ValueError(f"unsupported how={how!r}")
    if schemas is not None:
        ls, rs = schemas
    else:
        ls, rs = left.schema(), right.schema()
    lcols, rcols = list(ls.names), list(rs.names)
    types = {
        n: _arrow_type(t)
        for n, t in list(zip(ls.names, ls.types)) + list(zip(rs.names, rs.types))
    }
    shared = (set(lcols) & set(rcols)) - {on}
    if shared:
        raise ValueError(f"join sides share non-key columns: {shared}")
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: int):  # noqa: ANN202
        def _t(batch: pa.Table) -> pa.Table:
            b = stable_bucket_ids(batch[on], num_buckets)
            for c in all_cols:
                if c not in batch.column_names:
                    batch = batch.append_column(c, pa.nulls(batch.num_rows, types[c]))
            return (
                batch.select(all_cols)
                .append_column("__bucket", pa.array(b, pa.int32()))
                .append_column("__side", pa.array(np.full(len(b), side), pa.int8()))
            )

        return _t

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        l = group.filter(pc.equal(side, 0)).select(lcols).to_pandas()
        r = group.filter(pc.equal(side, 1)).select(rcols).to_pandas()
        if how in ("anti", "semi"):
            mask = l[on].isin(r[on])
            out = l[mask] if how == "semi" else l[~mask]
            schema = pa.schema([(c, types[c]) for c in lcols])
            return pa.Table.from_pandas(out, schema=schema, preserve_index=False)
        merged = l.merge(r, on=on, how=how)
        # typed schema for BOTH inner and left: an empty (or all-null)
        # bucket must not emit null-typed/degraded columns that disagree
        # with its neighbors' schemas downstream (groupby concat,
        # write_parquet unify block schemas).
        schema = pa.schema(
            [(c, types[c]) for c in lcols]
            + [(c, types[c]) for c in rcols if c != on]
        )
        return pa.Table.from_pandas(merged, schema=schema, preserve_index=False)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
