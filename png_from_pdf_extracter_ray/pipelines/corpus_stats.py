"""Corpus-level statistics for a training-data pipeline: vocabulary
building, document-frequency tables, length histograms, and benchmark
decontamination — each SQL-checkable against a DuckDB recomputation.

Scale shapes:

- token/vocab aggregation is the canonical pre-aggregate pattern —
  per-batch partial counts (one pandas ``value_counts`` per batch, no
  per-token Python) shrink the shuffle to (token, partial) rows, a
  hash-bucket groupby sums B vectorized groups (never one Ray group per
  token), and top-k uses per-bucket pruning (the global top-k is a
  subset of the per-bucket top-k's, since a token's total lives in
  exactly one bucket);
- contamination broadcasts the (small) benchmark shingle set once via
  ``ray.put`` and streams the corpus through a vectorized ``pc.is_in``
  semi-join — the corpus is never shuffled, mirroring the dedup
  verify pattern (stages/neardup.py).

Token semantics shared with the text-stats oracles: trim → lower →
split on ``\\s+``; blank docs contribute nothing.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..stages.dedup import stable_bucket_ids

_WS = re.compile(r"\s+")

# Shared with the DuckDB oracles (__ray_entry__): benchmark membership
# and histogram bin width are part of the operator contract.
BENCHMARK_MOD = 97
HIST_BIN_CHARS = 256

# Per-worker cache of the broadcast benchmark shingle set.
_BENCH_CACHE: dict = {}


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _token_partials(df: pd.DataFrame, distinct_per_doc: bool) -> pd.DataFrame:
    """Per-batch partial counts: (token, n) — total occurrences, or
    document frequency when ``distinct_per_doc``."""
    s = df["text"].fillna("").str.strip().str.lower()
    toks = s[s != ""].str.split(_WS)
    if distinct_per_doc:
        toks = toks.map(lambda t: list(set(t)))
    exploded = toks.explode().dropna()
    if exploded.empty:
        return pd.DataFrame({"token": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")})
    counts = exploded.value_counts()
    return pd.DataFrame({"token": counts.index.to_numpy(dtype=object), "n": counts.to_numpy(dtype=np.int64)})


def _bucketed_token_sum(
    ds: rd.Dataset, distinct_per_doc: bool, num_buckets: int = 32
) -> rd.Dataset:
    """documents → (token, n) with one fully-aggregated row per token.

    Partial counts per batch, hash-bucket shuffle of the tiny partials,
    vectorized sum inside each of B buckets.
    """

    def partials(df: pd.DataFrame) -> pa.Table:
        out = _token_partials(df, distinct_per_doc)
        t = pa.Table.from_pandas(
            out, schema=pa.schema([("token", pa.string()), ("n", pa.int64())]), preserve_index=False
        )
        b = (
            stable_bucket_ids(t["token"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("token", as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out, schema=pa.schema([("token", pa.string()), ("n", pa.int64())]), preserve_index=False
        )

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
    )


def vocab_top_tokens(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Global top-k tokens by total occurrence count (ties → token asc) —
    the vocabulary-building op.  Per-bucket top-k prune: only k rows per
    bucket reach the driver."""
    totals = _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=False)

    def prune(t: pa.Table) -> pa.Table:
        # batch-local prune — each batch holds complete token totals
        return t.sort_by([("n", "descending"), ("token", "ascending")]).slice(0, k)

    out = (
        totals.map_batches(prune, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
        .head(k)
    )
    return out[["token", "n"]]


def token_doc_frequency(sf_dir: str, min_df: int = 20) -> pd.DataFrame:
    """Document frequency per token, filtered to df ≥ min_df — the
    idf-table / stopword-discovery op.  Output is vocabulary-sized
    (bounded by the filter), sorted by (df desc, token asc)."""
    dfreq = _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=True)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], min_df))

    out = (
        dfreq.map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
    )
    out = out.rename(columns={"n": "df"})
    return out[["token", "df"]]


def doc_length_histogram(sf_dir: str) -> pd.DataFrame:
    """Histogram of document length in HIST_BIN_CHARS-char bins — the
    corpus length-distribution diagnostic.  Arrow integer division per
    batch + one tiny low-cardinality groupby."""

    def binify(t: pa.Table) -> pa.Table:
        bins = pc.divide(t["n_chars"], HIST_BIN_CHARS)  # int64 // int -> trunc
        return pa.Table.from_pydict({"bin": pc.cast(bins, pa.int64())})

    out = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(binify, batch_format="pyarrow")
        .groupby("bin")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_docs"})
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("bin", ignore_index=True)[["bin", "n_docs"]]


def _doc_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-token shingles (trim/lower/\\s+ tokens; < k tokens →
    none) — the SAME definition as the n-gram Jaccard oracle."""
    toks = (text or "").strip().lower().split()
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def benchmark_contamination(sf_dir: str) -> pd.DataFrame:
    """Decontamination check: for every non-benchmark document, count its
    distinct 3-gram shingles that also appear in the BENCHMARK set (docs
    with ``doc_id % BENCHMARK_MOD == 0`` — the stand-in for an eval set).
    Output: (doc_id, n_contam) for contaminated docs only.

    The benchmark side is small by construction: its distinct shingle
    set is collected once on the driver and broadcast via ``ray.put``;
    the corpus streams through a per-batch set intersection — no
    shuffle, the semi-join-broadcast pattern.
    """
    import pyarrow.parquet as pq

    bench_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = np.asarray(bench_tbl["doc_id"])
    bench_rows = bench_tbl.filter(pa.array(ids % BENCHMARK_MOD == 0))
    bench_shingles: set[str] = set()
    for t in bench_rows["text"].to_pylist():
        bench_shingles |= _doc_shingles(t)
    ref = ray.put(frozenset(bench_shingles))

    def scan(batch: pa.Table) -> pa.Table:
        bset = _BENCH_CACHE.get(ref.hex())
        if bset is None:
            _BENCH_CACHE.clear()
            bset = ray.get(ref)
            _BENCH_CACHE[ref.hex()] = bset
        out_ids, out_n = [], []
        ids = batch["doc_id"].to_pylist()
        for i, t in zip(ids, batch["text"].to_pylist()):
            if i % BENCHMARK_MOD == 0:
                continue  # benchmark docs are not checked against themselves
            n = len(_doc_shingles(t) & bset)
            if n:
                out_ids.append(i)
                out_n.append(n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_contam": pa.array(out_n, pa.int64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty and list(out.columns) != ["doc_id", "n_contam"]:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "n_contam": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id", ignore_index=True)[["doc_id", "n_contam"]]


def token_postings(
    sf_dir: str, min_df: int = 5, max_df: int = 390, num_buckets: int = 32
) -> pd.DataFrame:
    """Inverted-index build: per token, the sorted comma-joined posting
    list of documents containing it, for mid-frequency tokens
    (``min_df ≤ df ≤ max_df`` — below is noise, above is stopwords).

    Scale shape: the index build is the one corpus op that MUST shuffle
    (token, doc_id) pairs — that shuffle IS the index; each batch emits
    its distinct pairs (never raw text), tokens hash into B buckets,
    and each bucket assembles its tokens' postings vectorized.  The df
    band bounds every posting list and the output.
    """
    pair_schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string())])

    def pairs(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = (
            pd.DataFrame({"doc_id": df["doc_id"][mask], "token": s[mask].str.split(_WS)})
            .explode("token")
            .dropna()
            .drop_duplicates()
        )
        t = pa.Table.from_pandas(sub, schema=pair_schema, preserve_index=False)
        b = (
            stable_bucket_ids(t["token"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def build(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["token", "doc_id"])
        agg = g.groupby("token", sort=False).agg(
            df=("doc_id", "size"), postings=("doc_id", lambda v: ",".join(map(str, v)))
        )
        agg = agg[(agg["df"] >= min_df) & (agg["df"] <= max_df)].reset_index()
        return pa.Table.from_pandas(
            agg[["token", "df", "postings"]],
            schema=pa.schema(
                [("token", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
            ),
            preserve_index=False,
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pairs, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(build, batch_format="pandas")
        .to_pandas()
    )
    if out.empty and list(out.columns) != ["token", "df", "postings"]:
        out = pd.DataFrame(
            {
                "token": pd.Series([], dtype=object),
                "df": pd.Series([], dtype="int64"),
                "postings": pd.Series([], dtype=object),
            }
        )
    return out.sort_values("token", ignore_index=True)[["token", "df", "postings"]]


def heavy_hitter_tokens(sf_dir: str, s: int = 200) -> pd.DataFrame:
    """EXACT frequent-token detection (count ≥ total_tokens / s) with
    BOUNDED per-batch state — the heavy-hitters sketch pattern.

    ``vocab_top_tokens`` shuffles a partial-count row for EVERY distinct
    token per batch; at web scale those partials are themselves big.
    This op never ships the vocabulary: pass 1 emits only tokens whose
    batch-local count ≥ batch_tokens / s — at most s-1 rows per batch,
    and by pigeonhole the union over batches is a SUPERSET of the true
    heavy hitters (a token below the local threshold everywhere sums
    below the global threshold).  Pass 2 broadcasts the candidate set
    (≤ s per batch, deduped) and counts ONLY candidates exactly; the
    final filter ``n ≥ T / s`` makes the result exact, so it shares
    semantics with a plain SQL HAVING.
    """
    from .relational import _cached_broadcast

    part_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])

    def candidates(df: pd.DataFrame) -> pa.Table:
        out = _token_partials(df, distinct_per_doc=False)
        t_b = int(out["n"].sum())
        cand = out[out["n"].to_numpy(np.float64) >= t_b / s]
        # sentinel row (token NULL) carries the batch token total for T
        cand = pd.concat(
            [cand, pd.DataFrame({"token": [None], "n": [t_b]})], ignore_index=True
        )
        return pa.Table.from_pandas(cand, schema=part_schema, preserve_index=False)

    pass1 = (
        _docs(sf_dir, ["text"]).map_batches(candidates, batch_format="pandas").to_pandas()
    )
    total = float(pass1.loc[pass1["token"].isna(), "n"].sum())
    cand_tokens = pass1["token"].dropna().unique()
    if cand_tokens.size == 0 or total == 0:
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    ref = ray.put(pd.Index(cand_tokens))

    def confirm(df: pd.DataFrame) -> pa.Table:
        cset = _cached_broadcast(ref)
        out = _token_partials(df, distinct_per_doc=False)
        out = out[out["token"].isin(cset)]
        return pa.Table.from_pandas(out, schema=part_schema, preserve_index=False)

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(confirm, batch_format="pandas")
        .to_pandas()  # candidate-bounded: ≤ |candidates| rows per batch
        .groupby("token", as_index=False, sort=False)["n"]
        .sum()
    )
    out = counts[counts["n"].to_numpy(np.float64) >= total / s]
    return out.sort_values(
        ["n", "token"], ascending=[False, True], ignore_index=True
    )[["token", "n"]]


def tfidf_top_terms(sf_dir: str, k: int = 3, min_broadcast_df: int = 2) -> pd.DataFrame:
    """Per-document top-k terms by TF-IDF — the keyword/topic-surfacing
    op of a training-data pipeline.  ``tfidf = tf * ln(N / df)``, ties
    broken by token asc; docs with no tokens emit nothing.

    Two passes, both streaming: (1) the document-frequency table is
    built by the bucketed partial-count aggregation (vocabulary-sized
    output) and broadcast once via ``ray.put`` — only tokens with
    ``df >= min_broadcast_df`` ship, absent tokens default to df=1
    (identical idf, hapax legomena never pay broadcast bytes — at web
    scale the heavy tail is most of the vocabulary); (2) the corpus
    streams through a per-batch explode → tf count → vectorized df map
    → batch-local top-k.  No shuffle touches the text.
    """
    import pyarrow.parquet as pq

    from .relational import _cached_broadcast

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    dfreq = _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=True)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], min_broadcast_df))

    dftbl = dfreq.map_batches(keep, batch_format="pyarrow").to_pandas()
    ref = ray.put(pd.Series(dftbl["n"].to_numpy(np.float64), index=dftbl["token"]))

    def score(df_batch: pd.DataFrame) -> pa.Table:
        dfmap = _cached_broadcast(ref)
        schema = pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tfidf", pa.float64())]
        )
        s = df_batch["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = pd.DataFrame(
            {"doc_id": df_batch["doc_id"][mask], "token": s[mask].str.split(_WS)}
        ).explode("token")
        if sub.empty:
            return schema.empty_table()
        tf = sub.groupby(["doc_id", "token"], as_index=False, sort=False).size()
        dfs = tf["token"].map(dfmap).fillna(1.0).to_numpy(np.float64)
        tf["tfidf"] = np.round(
            tf["size"].to_numpy(np.float64) * np.log(float(n_docs) / dfs), 6
        )
        top = (
            tf.sort_values(["doc_id", "tfidf", "token"], ascending=[True, False, True])
            .groupby("doc_id", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(
            top[["doc_id", "token", "tfidf"]], schema=schema, preserve_index=False
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["doc_id", "tfidf", "token"], ascending=[True, False, True], ignore_index=True
    )[["doc_id", "token", "tfidf"]]


def unigram_logprob_scores(sf_dir: str) -> pd.DataFrame:
    """Per-document mean unigram log-likelihood under the corpus's own
    unigram LM — the cheap stand-in for a perplexity quality filter
    (docs of improbable tokens score low).  ``logprob = mean over token
    instances of ln(count(token) / total_tokens)``, rounded to 6.

    The LM is the bucketed token-total aggregation (vocabulary-sized,
    Heaps'-law ≪ corpus) broadcast once; the corpus then streams
    through a per-batch explode → vectorized probability map → per-doc
    mean.  Docs with no tokens emit nothing.
    """
    from .relational import _cached_broadcast

    totals = _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=False).to_pandas()
    total_tokens = float(totals["n"].sum())
    ref = ray.put(pd.Series(totals["n"].to_numpy(np.float64), index=totals["token"]))

    def score(df_batch: pd.DataFrame) -> pa.Table:
        counts = _cached_broadcast(ref)
        schema = pa.schema([("doc_id", pa.int64()), ("logprob", pa.float64())])
        s = df_batch["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = pd.DataFrame(
            {"doc_id": df_batch["doc_id"][mask], "token": s[mask].str.split(_WS)}
        ).explode("token")
        if sub.empty:
            return schema.empty_table()
        lp = np.log(sub["token"].map(counts).to_numpy(np.float64) / total_tokens)
        out = (
            pd.DataFrame({"doc_id": sub["doc_id"].to_numpy(np.int64), "lp": lp})
            .groupby("doc_id", as_index=False, sort=False)["lp"]
            .mean()
        )
        out["lp"] = np.round(out["lp"].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(
            out.rename(columns={"lp": "logprob"}), schema=schema, preserve_index=False
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", ignore_index=True)[["doc_id", "logprob"]]


def _bigram_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial bigram counts: (bigram, n).

    Fully vectorized: one explode keeps the source-row index, so
    adjacent-pair formation is a shifted equality mask (no Python loop
    over tokens); cross-document pairs are masked out by index change.
    """
    s = df["text"].fillna("").str.strip().str.lower()
    toks = s[s != ""].str.split(_WS)
    ex = toks.explode().dropna()
    if len(ex) < 2:
        return pd.DataFrame(
            {"bigram": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    tok = ex.to_numpy(dtype=object)
    idx = ex.index.to_numpy()
    same = idx[:-1] == idx[1:]
    if not same.any():
        return pd.DataFrame(
            {"bigram": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    bg = (
        pd.Series(tok[:-1]).str.cat(pd.Series(tok[1:]), sep=" ").to_numpy(dtype=object)
    )[same]
    counts = pd.Series(bg).value_counts()
    return pd.DataFrame(
        {"bigram": counts.index.to_numpy(dtype=object), "n": counts.to_numpy(dtype=np.int64)}
    )


def _bucketed_bigram_sum(ds: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """documents → (bigram, n), one fully-aggregated row per bigram —
    the bigram twin of :func:`_bucketed_token_sum` (partials per batch,
    B-bucket shuffle of the tiny partials, vectorized per-bucket sum)."""

    def partials(df: pd.DataFrame) -> pa.Table:
        out = _bigram_partials(df)
        t = pa.Table.from_pandas(
            out,
            schema=pa.schema([("bigram", pa.string()), ("n", pa.int64())]),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(t["bigram"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("bigram", as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("bigram", pa.string()), ("n", pa.int64())]),
            preserve_index=False,
        )

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
    )


def bigram_logprob_scores(sf_dir: str) -> pd.DataFrame:
    """Per-document mean bigram log-likelihood under the corpus's own
    bigram LM — one order up from :func:`unigram_logprob_scores` (the
    KenLM-style fluency/perplexity filter signal: documents whose
    adjacent-word statistics are unlike the corpus score low; a unigram
    LM cannot see scrambled word order, a bigram LM can).

    ``logprob = mean over adjacent token pairs of
    ln(count(bigram) / total_bigrams)``, rounded to 6.  The LM is
    trained on the same corpus, so every document bigram has count ≥ 1 —
    no smoothing/OOV branch, which keeps the op exactly expressible in
    SQL (list_transform bigrams + JOIN + AVG).  Documents with < 2
    tokens emit nothing on both sides.

    Scale envelope: the broadcast bigram table is larger than the
    unigram vocabulary (though still Heaps'-sublinear in corpus size);
    at 100 TB cap it with a min-count cut + backoff, or swap the exact
    table for the count-min sketch (stages/sketch.py CMS) — the
    documented beyond-memory path.  Per-batch scoring is one vectorized
    map + groupby-mean, as in the unigram op.
    """
    from .relational import _cached_broadcast

    totals = _bucketed_bigram_sum(_docs(sf_dir, ["text"])).to_pandas()
    total_bigrams = float(totals["n"].sum())
    ref = ray.put(pd.Series(totals["n"].to_numpy(np.float64), index=totals["bigram"]))

    def score(df_batch: pd.DataFrame) -> pa.Table:
        counts = _cached_broadcast(ref)
        schema = pa.schema([("doc_id", pa.int64()), ("logprob", pa.float64())])
        s = df_batch["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = pd.DataFrame(
            {"doc_id": df_batch["doc_id"][mask], "token": s[mask].str.split(_WS)}
        ).explode("token")
        if len(sub) < 2:
            return schema.empty_table()
        tok = sub["token"].to_numpy(dtype=object)
        did = sub["doc_id"].to_numpy(np.int64)
        idx = sub.index.to_numpy()
        same = idx[:-1] == idx[1:]
        if not same.any():
            return schema.empty_table()
        bg = (
            pd.Series(tok[:-1]).str.cat(pd.Series(tok[1:]), sep=" ").to_numpy(dtype=object)
        )[same]
        lp = np.log(pd.Series(bg).map(counts).to_numpy(np.float64) / total_bigrams)
        out = (
            pd.DataFrame({"doc_id": did[:-1][same], "lp": lp})
            .groupby("doc_id", as_index=False, sort=False)["lp"]
            .mean()
        )
        out["lp"] = np.round(out["lp"].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(
            out.rename(columns={"lp": "logprob"}), schema=schema, preserve_index=False
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", ignore_index=True)[["doc_id", "logprob"]]


def benchmark_contamination_bloom(sf_dir: str) -> pd.DataFrame:
    """Identical result to :func:`benchmark_contamination`, membership
    test restructured for scale with a Bloom-filter PREFILTER
    (stages/bloom.py): the benchmark side ships as a FIXED-size bitmap
    whose broadcast cost does not grow with the benchmark, and each
    batch tests ALL its shingles in ONE vectorized ``contains`` pass —
    the per-doc Python set intersection of the exact path runs only on
    the (rare) Bloom survivors, so clean batches cost k numpy gathers.

    No false negatives means the survivors are a superset of the true
    hits; the exact string-set confirm on survivors removes the false
    positives, keeping the output exact (same oracle SQL as the exact
    path).
    """
    import pyarrow.parquet as pq

    from ..stages.bloom import BloomFilter

    bench_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bids = np.asarray(bench_tbl["doc_id"])
    bench_rows = bench_tbl.filter(pa.array(bids % BENCHMARK_MOD == 0))
    bench_shingles: set[str] = set()
    for t in bench_rows["text"].to_pylist():
        bench_shingles |= _doc_shingles(t)
    sh_arr = np.asarray(sorted(bench_shingles), dtype=object)
    bloom = BloomFilter.build(
        pd.util.hash_array(sh_arr) if sh_arr.size else np.zeros(0, np.uint64)
    )
    # bitmap for the prefilter + exact set for the survivor confirm, one put
    ref = ray.put((bloom.to_state(), frozenset(bench_shingles)))

    def scan(batch: pa.Table) -> pa.Table:
        state = _BENCH_CACHE.get(ref.hex())
        if state is None:
            _BENCH_CACHE.clear()
            blob, bset0 = ray.get(ref)
            state = (BloomFilter.from_state(blob), bset0)
            _BENCH_CACHE[ref.hex()] = state
        blm, bset = state
        empty = pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()), "n_contam": pa.array([], pa.int64())}
        )
        shingles: list[str] = []
        owners: list[int] = []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if i % BENCHMARK_MOD == 0:
                continue  # benchmark docs are not checked against themselves
            s = _doc_shingles(t)
            shingles.extend(s)
            owners.extend([i] * len(s))
        if not shingles:
            return empty
        sh = np.asarray(shingles, dtype=object)
        cand = blm.contains(pd.util.hash_array(sh))  # one pass, whole batch
        if not cand.any():
            return empty
        surv = sh[cand]
        hit = np.fromiter((x in bset for x in surv), dtype=bool, count=surv.size)
        hit_own = np.asarray(owners, dtype=np.int64)[cand][hit]
        if hit_own.size == 0:
            return empty
        uniq, counts = np.unique(hit_own, return_counts=True)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_contam": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty and list(out.columns) != ["doc_id", "n_contam"]:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "n_contam": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id", ignore_index=True)[["doc_id", "n_contam"]]


def heavy_hitters_cms(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Count-min-sketch point estimates for the top-k tokens, next to
    their exact counts — the bounded-memory frequency estimator
    (stages/sketch.py CMS).  The sketch is one streaming pass with a
    constant 64 KiB of state per batch (mergeable integer adds); the
    exact counts reuse the vocabulary path.  CM estimates never
    under-count: n_est ≥ n_true, equality whenever no hash collision
    lands in all four rows."""
    from ..stages.sketch import cms_query, cms_token_counts

    sk = cms_token_counts(_docs(sf_dir, ["text"]))
    top = vocab_top_tokens(sf_dir, k=k)
    est = cms_query(sk, top["token"].to_numpy(dtype=object))
    return pd.DataFrame(
        {
            "token": top["token"],
            "n_true": top["n"].astype("int64"),
            "n_est": pd.Series(est, dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail per language)
# ---------------------------------------------------------------------------

# Bucket-key rounding: terciles are computed over the logprob rounded to
# this many decimals, which BOUNDS the histogram cardinality (≤ a few
# thousand distinct keys per language regardless of corpus size) so the
# exact per-language cumulative counts fit the driver at any scale —
# the doc_length_percentiles trick applied to a float score.
CCNET_KEY_DECIMALS = 3


def _lm_ref(sf_dir: str):  # noqa: ANN202
    """Build the corpus unigram LM once (bucketed token-total shuffle →
    vocabulary-sized broadcast): (object ref, total token count)."""
    totals = _bucketed_token_sum(
        _docs(sf_dir, ["text"]), distinct_per_doc=False
    ).to_pandas()
    total_tokens = float(totals["n"].sum())
    ref = ray.put(pd.Series(totals["n"].to_numpy(np.float64), index=totals["token"]))
    return ref, total_tokens


def _lm_scored_docs(sf_dir: str, lm=None) -> "rd.Dataset":  # noqa: ANN001
    """(doc_id, lang, logprob, score_key): per-doc mean unigram
    log-likelihood under the corpus's own LM — the shared pass behind
    :func:`ccnet_perplexity_buckets` (which calls it twice off ONE
    ``_lm_ref``, so the LM shuffle runs once).  Blank docs emit
    nothing."""
    from .relational import _cached_broadcast

    ref, total_tokens = lm if lm is not None else _lm_ref(sf_dir)

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("logprob", pa.float64()),
            ("score_key", pa.float64()),
        ]
    )

    def score(df_batch: pd.DataFrame) -> pa.Table:
        counts = _cached_broadcast(ref)
        s = df_batch["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = pd.DataFrame(
            {
                "doc_id": df_batch["doc_id"][mask],
                "lang": df_batch["lang"][mask],
                "token": s[mask].str.split(_WS),
            }
        ).explode("token")
        if sub.empty:
            return schema.empty_table()
        lp = np.log(sub["token"].map(counts).to_numpy(np.float64) / total_tokens)
        out = (
            pd.DataFrame(
                {
                    "doc_id": sub["doc_id"].to_numpy(np.int64),
                    "lang": sub["lang"].to_numpy(dtype=object),
                    "lp": lp,
                }
            )
            .groupby(["doc_id", "lang"], as_index=False, sort=False)["lp"]
            .mean()
        )
        raw = out["lp"].to_numpy(np.float64)
        out["logprob"] = np.round(raw, 6)
        out["score_key"] = np.round(raw, CCNET_KEY_DECIMALS)
        return pa.Table.from_pandas(
            out[["doc_id", "lang", "logprob", "score_key"]],
            schema=schema,
            preserve_index=False,
        )

    return _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        score, batch_format="pandas"
    )


def ccnet_perplexity_buckets(sf_dir: str) -> "rd.Dataset":
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020): every document lands in the head / middle / tail tercile of
    its LANGUAGE's LM-score distribution — head = most fluent third
    (highest logprob), tail = least.  The standard corpus-quality
    partitioning before sampling.

    Scale shape: pass 1 streams per-batch (lang, score_key) partial
    histograms (score_key = logprob rounded to CCNET_KEY_DECIMALS, so
    the histogram is bounded — see the constant's comment); the driver
    folds them into per-language cumulative "#docs strictly below" maps
    (a few thousand ints per language) and broadcasts once; pass 2
    assigns buckets with a vectorized searchsorted.  Tercile membership
    compares INTEGERS (below*3 vs n_lang) so the bucket is exact — no
    float percentile thresholds to drift between engines."""
    from .relational import _cached_broadcast

    lm = _lm_ref(sf_dir)

    hist_schema = pa.schema(
        [("lang", pa.string()), ("score_key", pa.float64()), ("n", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        df = t.select(["lang", "score_key"]).to_pandas()
        out = (
            df.groupby(["lang", "score_key"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(out, schema=hist_schema, preserve_index=False)

    hist = (
        _lm_scored_docs(sf_dir, lm=lm)
        .map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "score_key"], as_index=False)["n"]
        .sum()
    )
    cum: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("score_key", ignore_index=True)
        counts = g["n"].to_numpy(np.int64)
        below = np.zeros(len(g), dtype=np.int64)
        np.cumsum(counts[:-1], out=below[1:])
        cum[str(lang)] = (g["score_key"].to_numpy(np.float64), below, int(counts.sum()))
    ref = ray.put(cum)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("logprob", pa.float64()),
            ("bucket", pa.string()),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        cmap = _cached_broadcast(ref)
        df = t.to_pandas()
        buckets = np.empty(len(df), dtype=object)
        for lang, g in df.groupby("lang"):
            keys, below, n_lang = cmap[str(lang)]
            idx = np.searchsorted(keys, g["score_key"].to_numpy(np.float64))
            b = below[idx]
            lab = np.where(
                b * 3 < n_lang, "tail", np.where(b * 3 < 2 * n_lang, "middle", "head")
            )
            buckets[df.index.get_indexer(g.index)] = lab
        out = df[["doc_id", "lang", "logprob"]].assign(bucket=buckets)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return _lm_scored_docs(sf_dir, lm=lm).map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (fixed query, corpus-wide top-k)
# ---------------------------------------------------------------------------

# The query and parameters are part of the operator contract, shared
# with the DuckDB oracle (__ray_entry__).
BM25_QUERY_TOKENS = ("table", "scan", "merge", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_topk(sf_dir: str, k: int = BM25_TOPK) -> pd.DataFrame:
    """Okapi BM25 (Lucene idf variant) top-k retrieval for a fixed
    query over the whole corpus — the retrieval-scoring op behind
    search-based data curation.

    Scale shape: pass 1 folds THREE scalar-sized integer statistics
    (N docs, total tokens, per-query-token document frequency — ≤
    |query| rows) from per-batch partials; pass 2 broadcasts them and
    streams the corpus through a vectorized per-batch score (tf/dl are
    batch-local integers) with a batch-local top-k prune ordered by
    (rounded score desc, doc_id asc) — the SAME total order as the
    final sort and the oracle, so only k rows per batch reach the
    driver.  Every cross-batch reduction is an int64 sum; the float
    score is a per-row expression over those integers, identical on
    both engines."""
    from .relational import _cached_broadcast

    qtok = list(BM25_QUERY_TOKENS)
    stat_schema = pa.schema([("stat", pa.string()), ("n", pa.int64())])

    def stats_partial(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        toks = s[s != ""].str.split(_WS)
        names = ["__n_docs", "__total_tokens"]
        vals = [int(len(toks)), int(toks.str.len().sum()) if len(toks) else 0]
        ex = toks.explode()
        hit = ex[ex.isin(qtok)]
        if len(hit):
            # per-token document frequency: distinct (doc, token) pairs
            pairs = pd.DataFrame({"d": hit.index, "token": hit.to_numpy(dtype=object)})
            dfq = pairs.drop_duplicates()["token"].value_counts()
            for tok, n in dfq.items():
                names.append(f"df:{tok}")
                vals.append(int(n))
        return pa.Table.from_pydict(
            {"stat": pa.array(names, pa.string()), "n": pa.array(vals, pa.int64())},
            schema=stat_schema,
        )

    stats = (
        _docs(sf_dir, ["text"])
        .map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .groupby("stat")["n"]
        .sum()
    )
    n_docs = int(stats.get("__n_docs", 0))
    total_tokens = int(stats.get("__total_tokens", 0))
    if n_docs == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
        )
    avgdl = total_tokens / n_docs
    idf = {
        t: float(np.log((n_docs - int(stats.get(f"df:{t}", 0)) + 0.5)
                        / (int(stats.get(f"df:{t}", 0)) + 0.5) + 1.0))
        for t in qtok
    }
    ref = ray.put((idf, avgdl))
    tf_weight = BM25_K1 + 1.0

    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])

    def score_batch(df: pd.DataFrame) -> pa.Table:
        idf_map, adl = _cached_broadcast(ref)
        s = df["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        toks = s[mask].str.split(_WS)
        if not len(toks):
            return out_schema.empty_table()
        dl = pd.Series(toks.str.len().to_numpy(np.int64), index=toks.index)
        ex = pd.DataFrame(
            {"doc_id": df["doc_id"][mask], "token": toks}
        ).explode("token")
        ex = ex[ex["token"].isin(idf_map)]
        if ex.empty:
            return out_schema.empty_table()
        tf = (
            ex.groupby([ex.index, "token"])
            .size()
            .rename("tf")
            .reset_index(level=1)
        )
        tfv = tf["tf"].to_numpy(np.float64)
        dlv = dl.reindex(tf.index).to_numpy(np.float64)
        idfv = tf["token"].map(idf_map).to_numpy(np.float64)
        term = idfv * (tfv * tf_weight) / (tfv + BM25_K1 * (1.0 - BM25_B + BM25_B * dlv / adl))
        per_doc = (
            pd.DataFrame(
                {"doc_id": df["doc_id"][mask].reindex(tf.index).to_numpy(np.int64), "t": term}
            )
            .groupby("doc_id", as_index=False, sort=False)["t"]
            .sum()
        )
        per_doc["score"] = np.round(per_doc["t"].to_numpy(np.float64), 6)
        top = per_doc.sort_values(
            ["score", "doc_id"], ascending=[False, True], ignore_index=True
        ).head(BM25_TOPK)
        return pa.Table.from_pandas(
            top[["doc_id", "score"]], schema=out_schema, preserve_index=False
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score_batch, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["score", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(k)[["doc_id", "score"]]


# ---------------------------------------------------------------------------
# Contamination overlap scoring (Lee et al. n-gram overlap fraction)
# ---------------------------------------------------------------------------


def _bench_shingle_ref(sf_dir: str):  # noqa: ANN202
    """Broadcast handle for the benchmark slice's distinct 3-gram
    shingle set (docs with ``doc_id % BENCHMARK_MOD == 0``) — the
    driver-side read is the bench slice only, small by construction."""
    import pyarrow.parquet as pq

    bench_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = np.asarray(bench_tbl["doc_id"])
    bench_rows = bench_tbl.filter(pa.array(ids % BENCHMARK_MOD == 0))
    bench_shingles: set[str] = set()
    for t in bench_rows["text"].to_pylist():
        bench_shingles |= _doc_shingles(t)
    return ray.put(frozenset(bench_shingles))

# Contamination decision: a doc is contaminated when at least
# CONTAM_FRAC_NUM/CONTAM_FRAC_DEN of its distinct 3-gram shingles
# appear in the benchmark slice — compared as the integer
# cross-multiplication n_hits*DEN >= n_ngrams*NUM, never a float ratio.
CONTAM_FRAC_NUM = 1
CONTAM_FRAC_DEN = 8


def contamination_overlap_scores(sf_dir: str) -> "rd.Dataset":
    """Per-document benchmark-overlap SCORE: how many of each
    non-benchmark doc's distinct 3-gram shingles appear in the
    benchmark slice (``doc_id % BENCHMARK_MOD == 0``), plus the
    fraction-threshold contamination flag — the graded companion to
    :func:`benchmark_contamination`'s binary any-hit semi-join (the
    GPT-3/Lee-et-al overlap-fraction decision statistic).

    Same scale shape as the binary op: the benchmark shingle set
    broadcasts once (small by construction); the corpus streams through
    a per-batch set intersection — no shuffle.  All outputs are int64
    counts, so the oracle compare is exact."""
    bench_ref = _bench_shingle_ref(sf_dir)

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_ngrams", pa.int64()),
            ("n_hits", pa.int64()),
            ("contaminated", pa.int64()),
        ]
    )

    def scan(batch: pa.Table) -> pa.Table:
        bset = _BENCH_CACHE.get(bench_ref.hex())
        if bset is None:
            _BENCH_CACHE.clear()
            bset = ray.get(bench_ref)
            _BENCH_CACHE[bench_ref.hex()] = bset
        out_ids, out_n, out_h = [], [], []
        ids = batch["doc_id"].to_pylist()
        for i, t in zip(ids, batch["text"].to_pylist()):
            if i % BENCHMARK_MOD == 0:
                continue
            sh = _doc_shingles(t)
            if not sh:
                continue
            out_ids.append(i)
            out_n.append(len(sh))
            out_h.append(len(sh & bset))
        n = np.asarray(out_n, dtype=np.int64)
        h = np.asarray(out_h, dtype=np.int64)
        flag = (h * CONTAM_FRAC_DEN >= n * CONTAM_FRAC_NUM).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_ngrams": pa.array(n, pa.int64()),
                "n_hits": pa.array(h, pa.int64()),
                "contaminated": pa.array(flag, pa.int64()),
            },
            schema=schema,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Source-mix diagnostics: per-source KL divergence from the corpus LM
# ---------------------------------------------------------------------------


def source_kl_divergence(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """KL(source ‖ corpus) of the unigram token distribution, per
    ``source`` — the domain-shift diagnostic behind data-mixing
    decisions (a source whose token distribution diverges from the
    corpus gets re-weighted).  ``kl = Σ_t (n_st/n_s)·ln((n_st/n_s) /
    (n_t/T))``, rounded to 6.

    Scale shape: one bucketed shuffle aggregates exact integer
    (source, token) counts — bounded by |sources| × vocabulary
    (Heaps'-law ≪ corpus), the same envelope as every vocab-sized
    collect here; marginals and the KL sum are vectorized driver math
    over exact integers, so the only float work is the final per-source
    expression, identical on both engines."""

    def partials(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        sub = pd.DataFrame(
            {"source": df["source"][mask], "token": s[mask].str.split(_WS)}
        ).explode("token")
        out = (
            sub.groupby(["source", "token"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        t = pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("source", pa.string()), ("token", pa.string()), ("n", pa.int64())]
            ),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(t["token"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["source", "token"], as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("source", pa.string()), ("token", pa.string()), ("n", pa.int64())]
            ),
            preserve_index=False,
        )

    st = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partials, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    if st.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=object), "kl": pd.Series([], dtype="float64")}
        )
    n = st["n"].to_numpy(np.int64)
    ns = st.groupby("source")["n"].transform("sum").to_numpy(np.int64)
    nt = st.groupby("token")["n"].transform("sum").to_numpy(np.int64)
    tot = float(n.sum())
    p = n.astype(np.float64) / ns
    contrib = p * np.log(p / (nt.astype(np.float64) / tot))
    out = (
        pd.DataFrame({"source": st["source"], "c": contrib})
        .groupby("source", as_index=False, sort=False)["c"]
        .sum()
    )
    out["kl"] = np.round(out["c"].to_numpy(np.float64), 6)
    return out.sort_values("source", ignore_index=True)[["source", "kl"]]


# ---------------------------------------------------------------------------
# Phrase search (exact consecutive-token match over normalized text)
# ---------------------------------------------------------------------------

# The phrase is part of the operator contract, shared with the oracle.
PHRASE_QUERY = "hash join"


def phrase_search(sf_dir: str) -> "rd.Dataset":
    """Exact-phrase retrieval: documents whose normalized text
    (trim → lower → whitespace collapsed to single spaces) contains the
    consecutive-token phrase ``PHRASE_QUERY``, with the non-overlapping
    occurrence count.  Pure streaming per-batch map — a vectorized
    compiled-regex count per row, no shuffle, mirroring DuckDB's
    ``regexp_extract_all`` left-to-right non-overlap semantics."""
    pat = re.escape(PHRASE_QUERY)
    schema = pa.schema([("doc_id", pa.int64()), ("n_matches", pa.int64())])

    def scan(df: pd.DataFrame) -> pa.Table:
        s = (
            df["text"]
            .fillna("")
            .str.strip()
            .str.lower()
            .str.replace(_WS, " ", regex=True)
        )
        n = s.str.count(pat).to_numpy(np.int64)
        hit = n > 0
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[hit], pa.int64()),
                "n_matches": pa.array(n[hit], pa.int64()),
            },
            schema=schema,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pandas")


# ---------------------------------------------------------------------------
# Zipf-law fit over the vocabulary (corpus health diagnostic)
# ---------------------------------------------------------------------------


def vocab_zipf_fit(sf_dir: str) -> pd.DataFrame:
    """Least-squares fit of ``ln(count) = slope·ln(rank) + intercept``
    over the full vocabulary (rank = 1-based frequency rank, ties broken
    by token asc) — the Zipf-law corpus-health diagnostic (natural text
    sits near slope ≈ −1; template/boilerplate corpora flatten it).

    Scale shape: the fit needs only the vocabulary-sized (token, n)
    table — the same bucketed aggregation every vocab op here rides —
    and two driver-side closed-form sums.  The rank order and the
    regression formula (slope = cov/var over ln-transformed pairs) are
    mirrored exactly by the oracle's window rank + ``regr_slope``."""
    totals = (
        _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=False)
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
    )
    if totals.empty:
        return pd.DataFrame(
            {
                "n_vocab": pd.Series([], dtype="int64"),
                "slope": pd.Series([], dtype="float64"),
                "intercept": pd.Series([], dtype="float64"),
            }
        )
    x = np.log(np.arange(1, len(totals) + 1, dtype=np.float64))
    y = np.log(totals["n"].to_numpy(np.float64))
    mx, my = x.mean(), y.mean()
    cov = ((x - mx) * (y - my)).mean()
    var = ((x - mx) ** 2).mean()
    slope = cov / var
    return pd.DataFrame(
        {
            "n_vocab": pd.Series([len(totals)], dtype="int64"),
            "slope": pd.Series([round(slope, 6)], dtype="float64"),
            "intercept": pd.Series([round(my - slope * mx, 6)], dtype="float64"),
        }
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve
# ---------------------------------------------------------------------------

HEAPS_GRID = (50, 100, 200, 500, 1000, 2000, 5000)

_HEAPS_SCHEMA = pa.schema([("k_docs", pa.int64()), ("vocab_size", pa.int64())])


def heaps_vocab_curve(sf_dir: str, grid: tuple = HEAPS_GRID) -> pa.Table:
    """Vocabulary size after the first ``k`` documents (doc_id order),
    for each grid ``k`` ≤ corpus size — the Heaps-law growth curve that
    complements ``vocab_zipf_fit``: sublinear growth is healthy prose,
    near-linear growth flags id/hash/boilerplate noise inflating the
    token space.

    A token is counted at grid point ``k`` iff its FIRST occurrence
    (min doc_id over docs containing it) is < ``k``.  Ray shape: the
    standard token-partials pass emits per-batch (token, min_doc) rows
    (same lower/whitespace tokenizer as the vocab/df ops), one
    hash-bucket shuffle folds the global min per token, then each
    bucket collapses to |grid| partial counts via one vectorized
    searchsorted — the driver only ever sees B × |grid| rows.  Exact
    integers; the DuckDB twin recomputes first-occurrence with
    MIN(doc_id) GROUP BY token declaratively."""
    num_buckets = 32
    ks = np.asarray(sorted(grid), dtype=np.int64)

    def partials(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        mask = s != ""
        toks = s[mask].str.split(_WS)
        ids = df.loc[mask, "doc_id"].to_numpy(dtype=np.int64)
        if toks.empty:
            t = pa.Table.from_pydict(
                {
                    "token": pa.array([], pa.string()),
                    "md": pa.array([], pa.int64()),
                }
            )
            return t.append_column("__bucket", pa.array([], pa.int32()))
        rep = pd.DataFrame(
            {
                "token": toks.to_numpy(),
                "md": ids,
            }
        ).explode("token", ignore_index=True)
        agg = rep.groupby("token", as_index=False, sort=False)["md"].min()
        t = pa.Table.from_pandas(
            agg,
            schema=pa.schema([("token", pa.string()), ("md", pa.int64())]),
            preserve_index=False,
        )
        b = stable_bucket_ids(t["token"], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def fold_bucket(g: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema([("k_docs", pa.int64()), ("n", pa.int64())])
        if g.empty:
            return out_schema.empty_table()
        md = g.groupby("token", sort=False)["md"].min().to_numpy(dtype=np.int64)
        # tokens with first doc < k, per grid point: one sort + searchsorted
        md.sort()
        counts = np.searchsorted(md, ks, side="left")
        return pa.Table.from_pydict(
            {
                "k_docs": pa.array(ks, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            },
            schema=out_schema,
        )

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partials, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()  # B × |grid| rows — the documented small side
    )
    agg = parts.groupby("k_docs", as_index=False)["n"].sum()
    agg = agg[agg["k_docs"] <= n_docs].sort_values("k_docs", ignore_index=True)
    return pa.Table.from_pydict(
        {
            "k_docs": pa.array(agg["k_docs"].to_numpy(dtype=np.int64), pa.int64()),
            "vocab_size": pa.array(agg["n"].to_numpy(dtype=np.int64), pa.int64()),
        },
        schema=_HEAPS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# PMI collocations (pointwise mutual information over adjacent-word pairs)
# ---------------------------------------------------------------------------

# Operator contract shared with the DuckDB oracle: minimum bigram count
# (PMI is unstable on rare pairs) and the result size.
PMI_MIN_COUNT = 5
PMI_TOPK = 100


def pmi_collocations(
    sf_dir: str, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOPK
) -> pd.DataFrame:
    """Top-k collocations by pointwise mutual information — the classic
    phrase-mining op (Church & Hanks 1990): adjacent word pairs that
    co-occur far more often than their unigram frequencies predict.

    ``pmi = ln( p(x,y) / (p(x) p(y)) )`` with ``p(x,y) = n_xy/N_bigrams``
    and ``p(x) = n_x/N_tokens``, computed as
    ``ln(n_xy * N_tok^2 / (N_big * n_x * n_y))`` and rounded to 6;
    pairs with ``n_xy < min_count`` are dropped (rare-pair PMI is
    noise), ties order by bigram asc.

    Ray shape: both count tables come from the established bucketed
    partial-sum machinery (:func:`_bucketed_bigram_sum` /
    :func:`_bucketed_token_sum` — per-batch pandas ``value_counts``
    partials, B-bucket shuffle of the tiny (key, n) rows, vectorized
    per-bucket sum).  The unigram table broadcasts once via ``ray.put``
    (vocabulary is Heaps'-sublinear — strictly smaller than the bigram
    table :func:`bigram_logprob_scores` already broadcasts); scoring +
    the min-count cut run per bigram-bucket batch, and only each
    bucket's local top-k reaches the driver (a bigram's total lives in
    exactly one bucket, so the global top-k is a subset of the
    per-bucket top-k's — the :func:`vocab_top_tokens` prune).
    """
    from .relational import _cached_broadcast

    uni = _bucketed_token_sum(_docs(sf_dir, ["text"]), distinct_per_doc=False).to_pandas()
    n_tok = float(uni["n"].sum())
    ref = ray.put(pd.Series(uni["n"].to_numpy(np.float64), index=uni["token"]))

    # materialize the AGGREGATED (slim, Heaps'-sublinear) bigram table —
    # it feeds two consumers (the N_bigrams scalar and the scoring pass)
    # and would otherwise re-run the corpus aggregation per consumer
    big = _bucketed_bigram_sum(_docs(sf_dir, ["text"])).materialize()
    n_big = float(big.sum("n") or 0.0)
    schema = pa.schema([("bigram", pa.string()), ("n", pa.int64()), ("pmi", pa.float64())])
    if n_big == 0.0 or n_tok == 0.0:
        return schema.empty_table().to_pandas()

    def score(df_b: pd.DataFrame) -> pa.Table:
        counts = _cached_broadcast(ref)
        sub = df_b[df_b["n"] >= min_count]
        if sub.empty:
            return schema.empty_table()
        parts = sub["bigram"].str.partition(" ")
        cx = parts[0].map(counts).to_numpy(np.float64)
        cy = parts[2].map(counts).to_numpy(np.float64)
        nxy = sub["n"].to_numpy(np.float64)
        pmi = np.round(np.log(nxy * n_tok * n_tok / (n_big * cx * cy)), 6)
        out = pd.DataFrame({"bigram": sub["bigram"].to_numpy(dtype=object), "n": sub["n"].to_numpy(np.int64), "pmi": pmi})
        # batch-local prune: each batch holds complete bigram totals
        out = out.sort_values(["pmi", "bigram"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    out = big.map_batches(score, batch_format="pandas").to_pandas()
    if out.empty:
        return schema.empty_table().to_pandas()
    return (
        out.sort_values(["pmi", "bigram"], ascending=[False, True], ignore_index=True)
        .head(k)[["bigram", "n", "pmi"]]
        .reset_index(drop=True)
    )
