"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", NeurIPS) — score every raw
document by how target-like its hashed n-gram distribution is, then
select the high-scoring slice.

Shape (all one-pass + broadcast, no shuffle):

1. **Feature distributions** — one ``map_batches`` emits per-batch
   integer bucket-count partials (tokens hashed into ``DSIR_BUCKETS``
   buckets; one vector for the TARGET slice, one for the full RAW
   corpus); the driver folds integer sums — exact and order-independent,
   the CMS/k-means partial pattern.  The target stand-in is the
   benchmark slice (``doc_id % BENCHMARK_MOD == 0``), the same eval-set
   proxy the decontamination op uses.
2. **Log-ratio table** — ``log(p_target/p_raw)`` per bucket with
   additive smoothing, computed once on the driver (float64, identical
   on both sides), broadcast via ``ray.put``.
3. **Scoring pass** — per document, the length-normalized sum of its
   tokens' log-ratios (a per-row float64 reduction over the doc's own
   token order — batch-shape-independent), rounded to 6 decimals.
4. **Selection** — ``keep`` = score above the CORPUS MEAN score (the
   smoothing prior drags every absolute score negative when the target
   slice is tiny, so an absolute 0-threshold would select nothing; the
   relative cut keeps the more-target-like half).  The mean comes from
   exact integer sums of the rounded scores (×10⁶ fixed-point), so it
   too is batch-invariant.

Batch-invariant by the integer-partials argument, so the whole operator
is pinned by a flat no-Ray oracle.  No reference analog — our addition
per the training-data-pipeline brief.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .corpus_stats import BENCHMARK_MOD, _token_partials

DSIR_BUCKETS = 4096
DSIR_ALPHA = 0.5  # additive smoothing per bucket


def _bucket_of(tokens: np.ndarray) -> np.ndarray:
    """token → feature bucket (stable 64-bit hash mod B; same function
    on engine and oracle)."""
    return (pd.util.hash_array(np.asarray(tokens, dtype=object)) % np.uint64(DSIR_BUCKETS)).astype(np.int64)


def _doc_token_arrays(df: pd.DataFrame) -> list[np.ndarray]:
    """Per-doc token arrays under the shared trim→lower→\\s+ semantics
    (corpus_stats._token_partials tokenization, kept per-doc)."""
    s = df["text"].fillna("").str.strip().str.lower()
    toks = s.str.split(r"\s+")
    # blank docs arrive as None/NaN after the .where — everything else is
    # a non-empty token list (split of a stripped non-empty string)
    return [
        np.asarray(t, dtype=object) if isinstance(t, list) else np.empty(0, dtype=object)
        for t in toks.where(s != "", None)
    ]


def _count_partial(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(target bucket counts, raw bucket counts) for one batch —
    integer, via the shared token partials."""
    raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    parts = _token_partials(df, distinct_per_doc=False)
    if len(parts):
        np.add.at(raw, _bucket_of(parts["token"].to_numpy(dtype=object)), parts["n"].to_numpy(np.int64))
    tmask = (df["doc_id"].to_numpy(np.int64) % BENCHMARK_MOD) == 0
    tparts = _token_partials(df[tmask], distinct_per_doc=False)
    if len(tparts):
        np.add.at(tgt, _bucket_of(tparts["token"].to_numpy(dtype=object)), tparts["n"].to_numpy(np.int64))
    return tgt, raw


def logratio_table(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """Smoothed per-bucket log(p_target/p_raw), float64 on the driver."""
    pt = (tgt + DSIR_ALPHA) / (tgt.sum() + DSIR_ALPHA * DSIR_BUCKETS)
    pr = (raw + DSIR_ALPHA) / (raw.sum() + DSIR_ALPHA * DSIR_BUCKETS)
    return np.log(pt / pr)


def _score_docs(df: pd.DataFrame, table: np.ndarray) -> pa.Table:
    """Per-doc length-normalized log-ratio sum, rounded to 6 decimals.

    Vectorized over the WHOLE batch: one concatenated token array, one
    ``pd.util.hash_array`` call, one ``np.add.at`` fold keyed by doc
    index (the _token_partials/CMS pattern) — no per-doc Python hash
    setup.  np.add.at accumulates sequentially in array order, i.e.
    each doc's tokens in their own order — a per-row float64 reduction
    independent of how docs are batched."""
    tok_arrays = _doc_token_arrays(df)
    n_tok = np.fromiter((len(t) for t in tok_arrays), dtype=np.int64, count=len(tok_arrays))
    scores = np.zeros(len(df), dtype=np.float64)
    total = int(n_tok.sum())
    if total:
        flat = np.concatenate([t for t in tok_arrays if len(t)])
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), n_tok)
        np.add.at(scores, doc_idx, table[_bucket_of(flat)])
        scores = np.where(n_tok > 0, scores / np.maximum(n_tok, 1), 0.0)
    scores = np.round(scores, 6)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_tokens": pa.array(n_tok),
            "dsir_logratio": pa.array(scores),
        }
    )


def dsir_importance_weights(sf_dir: str) -> rd.Dataset:
    """Distributed DSIR scoring (module docstring).  Output:
    (doc_id, n_tokens, dsir_logratio, keep) per document."""
    from .relational import _cached_broadcast

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        tgt, raw = _count_partial(df)
        row = np.concatenate([tgt, raw])
        offs = pa.array(np.array([0, row.size], dtype=np.int32))
        return pa.Table.from_pydict(
            {"counts": pa.ListArray.from_arrays(offs, pa.array(row, pa.int64()))}
        )

    acc = np.zeros(2 * DSIR_BUCKETS, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            acc += (
                np.asarray(b["counts"].combine_chunks().flatten())
                .reshape(b.num_rows, acc.size)
                .sum(axis=0)
            )
    table = logratio_table(acc[:DSIR_BUCKETS], acc[DSIR_BUCKETS:])
    tref = ray.put(table)

    def score(df: pd.DataFrame) -> pa.Table:
        return _score_docs(df, _cached_broadcast(tref))

    # materialize the (scalar-column, N-sized) score table: it feeds the
    # mean pass AND the keep pass — at 10^12 docs this would be a
    # persisted parquet instead, the shape is the same
    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def mean_partial(t: pa.Table) -> pa.Table:
        q = np.round(
            np.asarray(t["dsir_logratio"].combine_chunks(), dtype=np.float64) * 1e6
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "qsum": pa.array([int(q.sum())], pa.int64()),
                "n": pa.array([len(q)], pa.int64()),
            }
        )

    qsum = 0
    n = 0
    for b in scored.map_batches(mean_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            qsum += int(np.asarray(b["qsum"].combine_chunks()).sum())
            n += int(np.asarray(b["n"].combine_chunks()).sum())
    mean = score_mean(qsum, n)

    def add_keep(t: pa.Table) -> pa.Table:
        s = np.asarray(t["dsir_logratio"].combine_chunks(), dtype=np.float64)
        return t.append_column("keep", pa.array(s > mean))

    return scored.map_batches(add_keep, batch_format="pyarrow")


def score_mean(qsum: int, n: int) -> float:
    """Corpus mean of the ×10⁶-fixed-point score sums — one float64
    division, identical on both sides."""
    return (qsum / n) / 1e6 if n else 0.0


def dsir_flat(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process twin for the oracle (same counts, same table,
    same per-doc scoring, same fixed-point mean cut)."""
    tgt, raw = _count_partial(df)
    table = logratio_table(tgt, raw)
    out = _score_docs(df, table).to_pandas()
    q = np.round(out["dsir_logratio"].to_numpy(np.float64) * 1e6).astype(np.int64)
    mean = score_mean(int(q.sum()), len(q))
    out["keep"] = out["dsir_logratio"].to_numpy(np.float64) > mean
    return out.sort_values("doc_id", ignore_index=True)
