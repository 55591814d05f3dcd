"""Budgeted / balanced corpus-selection pipelines (beyond-reference
LLM-pipeline operators; the reference converts one attachment at a time,
src/services/pdf_converter.py — it has no corpus-level selection).

All the weighted/ordered operators here ride ONE primitive —
``stages/selection.weighted_multi_cut`` (iterative histogram refinement;
every refinement round is a single streaming aggregate even with many
simultaneous targets) — composed as: ``token_budget_select`` (one
composite cut), ``token_weighted_length_percentiles`` (a grid of key
cuts), ``token_balanced_shards`` (S−1 composite boundary cuts + a
streaming assignment pass), ``exact_count_sample`` (a weight-1 cut).
``balanced_sample`` is the odd one out (aggregate → broadcast
thresholds → filter).

The headline operators:

- ``token_budget_select`` — "spend a token budget on the best
  documents": rank every document by an integer quality key (distance
  of its zlib compression ratio from a clean-text target band — the
  CCNet/RefinedWeb-family repetitiveness/noise heuristic, same kernel
  as ``compression_ratio_scores``), then keep documents in (key asc,
  doc_id asc) order until a fixed percentage of the corpus's total
  whitespace tokens is spent, INCLUDING the straddling document.  The
  engine never sorts globally: the cut key is found by
  ``stages/selection.weighted_key_cut`` (iterative histogram
  refinement, driver sees only 4096-int vectors), ties on the cut key
  are resolved by a second cut over ``doc_id`` within the tie group,
  and the final pass is a streaming filter.  The DuckDB oracle is the
  opposite architecture — ONE global window
  ``SUM(n_tokens) OVER (ORDER BY key, doc_id)`` over a flat recompute
  parquet — so a wrong histogram boundary, a lost bin, or an off-by-one
  in the tie split diverges immediately.

- ``balanced_sample`` — equalize expected per-group document counts
  (the alpha→0 limit of temperature-based mixture reweighting), by
  ``lang`` in the registered query (the corpus's only skewed grouping —
  ``source`` is uniform by construction, which would make the operator
  a no-op): per-group keep probability = min_count / count, applied as
  a deterministic md5 threshold so the "sample" is a pure function of
  the data.  Thresholds are EXACT integer arithmetic
  (``(2^24 * min_count) // count`` versus the first 6 hex chars of
  ``md5(doc_id)`` parsed as an integer), so DuckDB evaluates the
  identical predicate declaratively — no flat oracle needed.  Ray
  shape: one tiny groupby (source cardinality), thresholds broadcast,
  one streaming filter; nothing N-sized ever leaves the workers.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..stages.selection import grouped_multi_cut, weighted_multi_cut
from ..stages.text_stats import token_count_batch

# Target zlib ratio (micros) for "clean prose": empirically mid-band for
# the synthetic corpus and for web text generally (~0.4 compressed/raw).
ZTARGET_MICROS = 400_000
# Fraction of the corpus's total whitespace tokens the selection keeps.
TOKEN_BUDGET_PCT = 40

# 24-bit md5-prefix space for the per-source keep thresholds.
HASH_SPACE = 16**6


def md5_prefix_ints(ids, ndigits: int) -> np.ndarray:
    """First ``ndigits`` md5 hex chars of each id's decimal string, as
    int64 — the deterministic pseudo-random key convention every
    sampling op here shares with DuckDB's ``md5()``.  md5 has no
    vectorized kernel (and the DuckDB-shared convention pins the hash),
    so this per-row loop is the accepted batch cost; keeping it in ONE
    helper keeps the convention identical across ops."""
    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:ndigits], 16) for i in ids),
        dtype=np.int64,
        count=len(ids),
    )


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


_SLIM_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("zdist", pa.int64()), ("n_tokens", pa.int64())]
)


def zdist_tokens_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document integer quality key + token weight.

    ``zdist = |ratio_micros - ZTARGET_MICROS|`` with ``ratio_micros =
    (n_compressed * 10^6) // n_bytes`` (1.0 for empty docs — same
    convention as stages/text_stats.compression_ratio_batch, but kept in
    exact integer micros so the ordering key is batch-invariant and
    DuckDB-reproducible).  ``n_tokens`` is the whitespace token count
    (the token_counts tokenizer: regex \\s+ on the stripped text)."""
    n = len(df)
    zdist = np.zeros(n, dtype=np.int64)
    for i, text in enumerate(df["text"].fillna("")):
        raw = text.encode("utf-8")
        if raw:
            micros = (len(zlib.compress(raw, 6)) * 1_000_000) // len(raw)
        else:
            micros = 1_000_000
        zdist[i] = abs(micros - ZTARGET_MICROS)
    toks = token_count_batch(df)["n_tokens"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "zdist": zdist,
            "n_tokens": toks,
        }
    )


def token_budget_select(sf_dir: str, budget_pct: int = TOKEN_BUDGET_PCT) -> rd.Dataset:
    """Documents kept by the token-budget selection, as a Dataset of
    ``(doc_id, zdist, n_tokens)``.

    Selection rule (shared bit-for-bit with the oracle's window): order
    by ``(zdist asc, doc_id asc)``; a document is kept iff the total
    tokens of all documents strictly before it is < budget, where
    ``budget = (total_tokens * budget_pct) // 100`` — i.e. the smallest
    prefix whose token sum reaches the budget.

    Scale: the slim (24-byte-row) projection is materialized once and
    scanned by ``weighted_key_cut``'s histogram passes (2 passes for
    this 20-bit key space, zero shuffles, 4096-int driver state); the
    tie group on the cut key gets one more cut over doc_id; the kept
    set is a streaming filter over the same slim Dataset."""
    slim = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(zdist_tokens_batch, batch_format="pandas")
        .materialize()
    )
    total = int(slim.sum("n_tokens"))
    budget = (total * budget_pct) // 100
    if budget < 1:
        return rd.from_arrow(_SLIM_SCHEMA.empty_table())
    k_star, d_star = ordered_cut(slim, "zdist", "doc_id", "n_tokens", budget)

    def keep(t: pa.Table) -> pa.Table:
        z = t["zdist"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((z < k_star) | ((z == k_star) & (d <= d_star))))

    return slim.map_batches(keep, batch_format="pyarrow")


def balanced_sample(sf_dir: str, by: str = "lang") -> rd.Dataset:
    """Deterministic per-group rebalancing sample: every ``by`` group
    keeps ``min_group_count / group_count`` of its documents
    (expected), so all groups contribute ~equally — the
    flatten-the-mixture step of a training pipeline (e.g. stop English
    drowning the other languages).  Keep iff ``int(md5(doc_id)[:6], 16)
    < (2^24 * min_count) // count`` — exact integers on both
    architectures."""
    schema = pa.schema([("doc_id", pa.int64()), (by, pa.string())])
    counts = (
        _docs(sf_dir, [by])
        .groupby(by)
        .count()
        .to_pandas()  # group cardinality rows — the documented small side
    )
    n_by_grp = dict(zip(counts[by], counts["count()"].astype(int)))
    mn = min(n_by_grp.values())
    thresh = {g: (HASH_SPACE * mn) // n for g, n in n_by_grp.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_prefix_ints(df["doc_id"], 6)
        t = df[by].map(thresh).to_numpy(dtype=np.int64)
        return df.loc[h < t, ["doc_id", by]]

    return (
        _docs(sf_dir, ["doc_id", by])
        .map_batches(keep, batch_format="pandas")
        .map_batches(
            lambda df: pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            batch_format="pandas",
        )
    )


PCTS = (25, 50, 75, 90)

_PCT_SCHEMA = pa.schema([("pct", pa.int64()), ("n_chars_le", pa.int64())])


def token_weighted_length_percentiles(
    sf_dir: str, pcts: tuple = PCTS
) -> pa.Table:
    """"p% of the corpus's tokens live in documents of <= L chars" — the
    token-mass distribution over document length that sizes packing
    windows and length-bucketed sampling.  One weighted-threshold cut
    (stages/selection.weighted_key_cut) per percentile over the slim
    (n_chars, n_tokens) projection: key cardinality is unbounded
    (doc lengths), so the bounded-cardinality histogram-broadcast trick
    of doc_length_percentiles does not apply — this IS the
    unbounded-key variant, and the histogram-refinement cut is what
    replaces the global sort.  Exact integers end-to-end; the DuckDB
    oracle recomputes each L with a global window cumulative sum."""
    slim = (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(
            lambda df: token_count_batch(df)[["n_chars", "n_tokens"]],
            batch_format="pandas",
        )
        .materialize()
    )
    total = int(slim.sum("n_tokens"))
    targets = [max(1, (total * p) // 100) for p in pcts]
    cuts = weighted_multi_cut(slim, "n_chars", "n_tokens", targets)
    rows = [(int(p), int(k)) for p, (k, _) in zip(pcts, cuts)]
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.int64()),
        ],
        schema=_PCT_SCHEMA,
    )


def ordered_multi_cut(
    slim: rd.Dataset,
    key_col: str,
    tie_col: str,
    weight_col: str,
    targets: list[int],
) -> list[tuple[int, int]]:
    """Boundaries of the smallest weighted prefixes reaching each
    ``target`` under (key asc, tie asc) order: per target, the
    (key, tie) of the FIRST row whose inclusive prefix sum >= target.
    Two-level composite cut — ONE ``weighted_multi_cut`` over the key
    (all targets share each refinement round's pass), then ONE
    ``grouped_multi_cut`` over the tie column for ALL targets at once
    (each tie cut restricted to its key's tie group; the S−1 shard
    boundaries pay one streaming aggregate per refinement round total,
    not per boundary — the machinery shared by token_budget_select and
    the shard planner)."""
    key_cuts = weighted_multi_cut(slim, key_col, weight_col, targets)
    jobs = [
        (k_star, target - below)  # rem > 0 by the cut's contract
        for target, (k_star, below) in zip(targets, key_cuts)
    ]
    tie_cuts = grouped_multi_cut(slim, key_col, tie_col, weight_col, jobs)
    return [(k, d) for (k, _), (d, _) in zip(key_cuts, tie_cuts)]


def ordered_cut(
    slim: rd.Dataset,
    key_col: str,
    tie_col: str,
    weight_col: str,
    target: int,
) -> tuple[int, int]:
    return ordered_multi_cut(slim, key_col, tie_col, weight_col, [target])[0]


# Export sharding: equal-token shard count.
N_SHARDS = 8

_SHARD_SCHEMA = pa.schema([("doc_id", pa.int64()), ("shard_id", pa.int64())])


def _hkey_tokens_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, hkey, n_tokens): hkey = first 15 md5 hex chars of the
    doc id as int64 — the deterministic pseudo-random total order
    shared with DuckDB's md5()."""
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    hk = md5_prefix_ints(df["doc_id"], 15)
    toks = token_count_batch(df)["n_tokens"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "hkey": hk, "n_tokens": toks})


def token_balanced_shards(sf_dir: str, n_shards: int = N_SHARDS) -> rd.Dataset:
    """Weight-balanced range partitioner for export: assign every
    document to one of ``n_shards`` shards so each shard holds ~equal
    TOKEN mass (not doc count) — the planner behind "write the corpus
    as S equal-sized training shards, resumable per shard".  Shard
    boundaries are the ``target_i = (total·i)//S`` prefix cuts of the
    (md5(doc_id), doc_id) pseudo-random total order, found by
    ``ordered_cut`` (histogram refinement — never a global sort); the
    assignment pass is a streaming comparison of each row against the
    S−1 broadcast boundaries.  A document's shard is the number of
    boundaries at or before its exclusive prefix position, identically
    ``min(S−1, (S·(cum_excl+1)−1)//total)`` — the closed form the
    DuckDB twin evaluates from ONE global window, so any off-by-one in
    any boundary diverges on some row.

    Scale: S−1 composite cuts (each ~3 histogram passes over the slim
    24-byte-row projection) + one assignment pass; the boundaries are
    S−1 scalars.  At 10^12 rows nothing but the slim projection is ever
    scanned and nothing N-sized leaves the workers."""
    slim = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_hkey_tokens_batch, batch_format="pandas")
        .materialize()
    )
    total = int(slim.sum("n_tokens"))
    raw_targets = [(total * i) // n_shards for i in range(1, n_shards)]
    live = [t for t in raw_targets if t >= 1]
    live_cuts = iter(ordered_multi_cut(slim, "hkey", "doc_id", "n_tokens", live))
    # degenerate tiny-corpus targets (< 1 token) get sentinel boundaries
    bounds = [
        next(live_cuts)
        if t >= 1
        else (np.iinfo(np.int64).min, np.iinfo(np.int64).min)
        for t in raw_targets
    ]

    def assign(t: pa.Table) -> pa.Table:
        hk = t["hkey"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        shard = np.zeros(len(hk), dtype=np.int64)
        for k_b, d_b in bounds:
            shard += (hk > k_b) | ((hk == k_b) & (ids > d_b))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(shard, pa.int64())],
            schema=_SHARD_SCHEMA,
        )

    return slim.map_batches(assign, batch_format="pyarrow")


SAMPLE_K = 200

_EXACT_SAMPLE_SCHEMA = pa.schema([("doc_id", pa.int64())])


def exact_count_sample(sf_dir: str, k: int = SAMPLE_K) -> rd.Dataset:
    """EXACTLY ``k`` documents, deterministically pseudo-random: the
    first ``k`` rows of the (md5(doc_id), doc_id) order — the
    fixed-size-sample op a hash-threshold sample can't give (thresholds
    hit an EXPECTED fraction, not an exact count).  One composite cut
    (weight = 1 per doc) + a streaming filter; the DuckDB twin is a
    ROW_NUMBER() window with LIMIT-like predicate."""
    slim = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(
            lambda df: _hkey_tokens_batch(df.assign(text=""))[["doc_id", "hkey"]]
            .assign(one=np.int64(1)),
            batch_format="pandas",
        )
        .materialize()
    )
    n = slim.count()
    if k >= n:
        return slim.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow"
        )
    k_b, d_b = ordered_cut(slim, "hkey", "doc_id", "one", k)

    def keep(t: pa.Table) -> pa.Table:
        hk = t["hkey"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (hk < k_b) | ((hk == k_b) & (ids <= d_b))
        return pa.Table.from_arrays(
            [pa.array(ids[m], pa.int64())], schema=_EXACT_SAMPLE_SCHEMA
        )

    return slim.map_batches(keep, batch_format="pyarrow")


KEEP_PCT = 60

_CAL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("amicros", pa.int64())])


def calibrated_quality_filter(sf_dir: str, keep_pct: int = KEEP_PCT) -> rd.Dataset:
    """Model-scored filtering with EXACT-rate threshold calibration:
    score every document with the distributed ridge length model
    (``mlops.ridge_quality_model``), rank by |residual| (how far the
    document deviates from the corpus's length↔features relationship —
    the outlier-ness proxy), and keep exactly the best ``keep_pct``%
    of documents by finding the score threshold with ONE composite cut
    — the "calibrate the classifier threshold to a target keep rate"
    step of a production filter, done without a global sort.

    Residuals are per-row fixed-order float64 dots rounded to 6 dp
    (batch-invariant, stages/ml.py), so ``amicros =
    |rint(resid·10^6)|`` is an exact int64 key both architectures
    derive identically; the DuckDB twin ranks the flat ridge-oracle
    parquet with ROW_NUMBER."""
    from .mlops import ridge_quality_model

    def to_key(t: pa.Table) -> pa.Table:
        resid = t["resid"].to_numpy(zero_copy_only=False)
        am = np.abs(np.rint(resid * 1_000_000)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(am, pa.int64()),
                pa.array(np.ones(len(am), np.int64), pa.int64()),
            ],
            names=["doc_id", "amicros", "one"],
        )

    slim = (
        ridge_quality_model(sf_dir)
        .map_batches(to_key, batch_format="pyarrow")
        .materialize()
    )
    n = slim.count()
    if n == 0:
        return rd.from_arrow(_CAL_SCHEMA.empty_table())
    target = max(1, (n * keep_pct) // 100)
    k_b, d_b = ordered_cut(slim, "amicros", "doc_id", "one", target)

    def keep(t: pa.Table) -> pa.Table:
        am = t["amicros"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (am < k_b) | ((am == k_b) & (ids <= d_b))
        return pa.Table.from_arrays(
            [pa.array(ids[m], pa.int64()), pa.array(am[m], pa.int64())],
            schema=_CAL_SCHEMA,
        )

    return slim.map_batches(keep, batch_format="pyarrow")


_FUNNEL_SCHEMA = pa.schema(
    [("stage", pa.string()), ("n_docs", pa.int64()), ("n_tokens", pa.int64())]
)


def curation_funnel(sf_dir: str) -> pa.Table:
    """The whole curation pipeline as ONE query, reported as a funnel —
    how many documents and tokens survive each production stage:

    1. ``all``        — the raw corpus;
    2. ``quality``    — the Gopher ∧ zlib-window ∧ langid filter chain
       (identical predicate to ``quality_filter_chain``);
    3. ``rebalanced`` — the exact-integer per-lang rebalance
       (``balanced_sample`` thresholds, computed over the SURVIVORS'
       lang counts — the order matters and the oracle agrees);
    4. ``budget``     — the token-budget cut (``TOKEN_BUDGET_PCT``% of
       the rebalanced stage's tokens, (zdist, doc_id) order).

    Ray shape: ONE streaming pass computes every per-doc signal (the
    zlib pass serves both the filter window and the budget key), the
    slim result is materialized once, and each stage is a lazy filter
    + two scalar aggregates over it; the budget stage adds one
    composite histogram-refinement cut.  The DuckDB twin chains the
    existing gopher/langid CTEs, the flat zlib parquet, the integer
    thresholds, and a global window — four UNION ALL rows."""
    from ..stages.text_stats import (
        LangId,
        compression_ratio_batch,
        gopher_stats_batch,
    )
    from .data_quality import ZRATIO_MAX, ZRATIO_MIN

    langid = LangId()

    def funnel_batch(df: pd.DataFrame) -> pa.Table:
        g = gopher_stats_batch(df)
        z = compression_ratio_batch(df)
        preds = [langid.classify(t) for t in df["text"].fillna("")]
        keep = (
            (g["keep"].to_numpy(dtype=np.int64) == 1)
            & (z["compression_ratio"].to_numpy() >= ZRATIO_MIN)
            & (z["compression_ratio"].to_numpy() <= ZRATIO_MAX)
            & (np.asarray(preds, dtype=object) != "und")
        ).astype(np.int64)
        nb = z["n_bytes"].to_numpy(dtype=np.int64)
        nc = z["n_compressed"].to_numpy(dtype=np.int64)
        micros = np.where(nb > 0, (nc * 1_000_000) // np.maximum(nb, 1), 1_000_000)
        toks = token_count_batch(df)["n_tokens"].to_numpy(dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
                "lang": pa.array(df["lang"].astype(str), pa.string()),
                "keep": pa.array(keep, pa.int64()),
                "zdist": pa.array(
                    np.abs(micros - ZTARGET_MICROS).astype(np.int64), pa.int64()
                ),
                "n_tokens": pa.array(toks, pa.int64()),
            }
        )

    slim = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(funnel_batch, batch_format="pandas")
        .materialize()
    )

    def stage_counts(ds: rd.Dataset) -> tuple[int, int]:
        n = ds.count()
        return n, (int(ds.sum("n_tokens")) if n else 0)

    rows = [("all", *stage_counts(slim))]

    q = slim.map_batches(
        lambda t: t.filter(pa.compute.equal(t["keep"], 1)),
        batch_format="pyarrow",
    ).materialize()
    rows.append(("quality", *stage_counts(q)))

    if rows[-1][1] == 0:
        rows += [("rebalanced", 0, 0), ("budget", 0, 0)]
    else:
        counts = q.groupby("lang").count().to_pandas()
        n_by = dict(zip(counts["lang"], counts["count()"].astype(int)))
        mn = min(n_by.values())
        thresh = {g_: (HASH_SPACE * mn) // n for g_, n in n_by.items()}

        def rebal(df: pd.DataFrame) -> pd.DataFrame:
            h = md5_prefix_ints(df["doc_id"], 6)
            t = df["lang"].map(thresh).to_numpy(dtype=np.int64)
            return df.loc[h < t]

        reb = q.map_batches(rebal, batch_format="pandas").materialize()
        n3, tok3 = stage_counts(reb)
        rows.append(("rebalanced", n3, tok3))

        budget = (tok3 * TOKEN_BUDGET_PCT) // 100
        if budget < 1:
            rows.append(("budget", 0, 0))
        else:
            k_b, d_b = ordered_cut(reb, "zdist", "doc_id", "n_tokens", budget)

            def kept(t: pa.Table) -> pa.Table:
                z = t["zdist"].to_numpy(zero_copy_only=False)
                d = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array((z < k_b) | ((z == k_b) & (d <= d_b))))

            rows.append(
                ("budget", *stage_counts(reb.map_batches(kept, batch_format="pyarrow")))
            )

    return pa.Table.from_pydict(
        {
            "stage": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
        },
        schema=_FUNNEL_SCHEMA,
    )
