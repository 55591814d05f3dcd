"""Data-quality operators for a web-scale training-data pipeline:
substring-level duplicate-span detection, Gopher-style repetition
statistics, JSON property extraction, and PII detect/redact — each
SQL-checkable against a DuckDB recomputation (``__ray_entry__``).

Scale shapes (the same discipline as corpus_stats / neardup):

- **duplicate spans** is the exact-substring-dedup building block
  ("Deduplicating Training Data Makes Language Models Better", Lee et
  al. 2022, expressed at span granularity): per-doc distinct k-token
  span HASHES (one ``pd.util.hash_array`` pass + a wrapping-uint64
  window polynomial — no per-span Python strings), hash-bucketed into B
  groups for the document-frequency count (never one Ray group per
  span), per-doc partials re-bucketed by doc hash for the final sum,
  and a bucketed left join to zero-fill docs with no spans.  Three
  bounded shuffles, all over (int64, int64) rows — the raw text never
  shuffles.
- **repetition stats** is per-batch vectorized end to end: tokens are
  flattened across the batch with doc offsets, hashed once, and every
  per-doc statistic (top-bigram count, duplicate-trigram fraction,
  mean word length) is a pandas/numpy grouped reduction — no per-doc
  Python loop.
- **PII scrub** is a stateless compiled-regex ``map_batches`` — the
  patterns are module constants shared verbatim with the DuckDB oracle
  (one source of truth; only RE2∩Python syntax: explicit ``[0-9]``
  classes, never ``\\d``/``\\s``).

Token semantics shared with the text-stats oracles: trim → lower →
split on ``\\s+``; blank docs contribute nothing.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..stages.dedup import stable_bucket_ids
from ..stages.joins import bucketed_hash_join

# module-level (NOT function-local) so worker-executed closures don't run
# a relative import on the worker (ROUND_NOTES lesson: foreign-cwd
# workers have no package on sys.path — everything must ship by value)
from .relational import _cached_broadcast

_WS = re.compile(r"\s+")

# Same odd 64-bit mix constant as stages/neardup (the span-hash family
# is shared infrastructure, not a correctness coupling — the oracle
# compares span TEXT, the engine compares span hashes).
_SPAN_P = np.uint64(0x9E3779B97F4A7C15)

# Span length for duplicate-span detection: long enough that a shared
# span means real duplication, short enough to catch partial overlap
# (Lee et al. use 50 BPE tokens at full scale; 8 word tokens keeps the
# synthetic corpora non-degenerate).  Shared with the DuckDB oracle.
DUP_SPAN_K = 8

# PII patterns — shared verbatim between the engine and the DuckDB
# oracle (RE2∩Python subset: no \d, \s, or lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{4}\b"


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Duplicate k-token spans (substring-level dedup)
# ---------------------------------------------------------------------------


def _batch_span_rows(df: pd.DataFrame, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, span_hash) rows for a batch — distinct spans per doc.

    Docs with < k tokens emit nothing (the relational-oracle shingle
    convention, NOT the neardup whole-doc fallback: this operator's
    contract is exact-k spans only).
    """
    s = df["text"].fillna("").str.strip().str.lower()
    toks = s.str.split(_WS)
    n = toks.map(len).to_numpy(dtype=np.int64)
    n[s.to_numpy() == ""] = 0
    keep = n >= k
    if not keep.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = df["doc_id"].to_numpy(dtype=np.int64)[keep]
    tok_lists = toks[keep]
    n = n[keep]
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    th = pd.util.hash_array(flat)
    # per-doc sliding k-windows over the flat hash array: windows that
    # straddle a doc boundary are masked out, then each doc's window
    # hashes are deduplicated
    pows = np.ones(k, dtype=np.uint64)
    np.cumprod(np.full(k - 1, _SPAN_P, dtype=np.uint64), out=pows[1:])
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    wh = (win * pows[::-1]).sum(axis=1, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    doc_idx = np.repeat(np.arange(len(n)), n)[: wh.size]
    # a window starting at flat position p belongs to doc doc_idx[p] iff
    # p + k - 1 is still inside the same doc
    ends = starts + n  # exclusive
    pos = np.arange(wh.size)
    ok = pos + k - 1 < ends[doc_idx]
    d = doc_idx[ok]
    h = wh[ok].view(np.int64)
    # distinct per doc
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    first = np.ones(d.size, dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return ids[d[first]], h[first]


def duplicate_span_stats(
    sf_dir: str, span_k: int = DUP_SPAN_K, num_buckets: int = 32
) -> pd.DataFrame:
    """Per-document duplicate-span statistics: of a doc's distinct
    ``span_k``-token spans, how many also occur in at least one OTHER
    document (``n_dup_spans``), alongside the distinct-span total
    (``n_spans``).  Docs below ``span_k`` tokens report zeros.

    This is the marking pass of exact substring dedup: at full scale the
    same (doc, span-hash) rows feed span removal instead of a count.
    """

    def span_rows(df: pd.DataFrame) -> pa.Table:
        ids, hashes = _batch_span_rows(df, span_k)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(hashes, pa.int64()),
                "__bucket": pa.array(
                    (hashes.view(np.uint64) % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    spans = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        span_rows, batch_format="pandas"
    )

    def mark_bucket(g: pd.DataFrame) -> pa.Table:
        # all rows of a span hash land in one bucket; rows are distinct
        # per (doc, hash), so the hash's row count IS its document
        # frequency
        df_per_hash = g.groupby("h")["h"].transform("size")
        dup = (df_per_hash >= 2).to_numpy()
        out = (
            pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "dup": dup.astype(np.int64)})
            .groupby("doc_id", as_index=False, sort=False)
            .agg(n_spans=("dup", "size"), n_dup=("dup", "sum"))
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("n_spans", pa.int64()), ("n_dup", pa.int64())]
            ),
            preserve_index=False,
        )

    partials = spans.groupby("__bucket").map_groups(mark_bucket, batch_format="pandas")

    def rebucket(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["doc_id"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__docb", pa.array(b, pa.int32()))

    def sum_doc(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("doc_id", as_index=False, sort=False)[["n_spans", "n_dup"]].sum()
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("n_spans", pa.int64()), ("n_dup", pa.int64())]
            ),
            preserve_index=False,
        )

    # guard: a corpus where EVERY doc is below span_k tokens produces an
    # empty partials dataset, and map_groups over an empty dataset yields
    # schema()=None (ROUND_NOTES lesson 12) — materialize the per-doc
    # partials (bounded by docs × num_buckets, far smaller than the span
    # stream) and early-return zeros
    partials = partials.materialize()
    all_ids = _docs(sf_dir, ["doc_id"])
    if partials.count() == 0:
        out = all_ids.to_pandas()
        out["n_spans"] = np.int64(0)
        out["n_dup_spans"] = np.int64(0)
        return out.sort_values("doc_id", ignore_index=True)

    sums = (
        partials.map_batches(rebucket, batch_format="pyarrow")
        .groupby("__docb")
        .map_groups(sum_doc, batch_format="pandas")
    )

    # zero-fill: every document appears in the output (bucketed left join
    # — the doc-id stream and the per-doc sums shuffle by the same key)
    joined = bucketed_hash_join(all_ids, sums, on="doc_id", how="left")
    out = joined.to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": [], "n_spans": [], "n_dup": []})
    out["n_spans"] = out["n_spans"].fillna(0).astype(np.int64)
    out["n_dup_spans"] = out["n_dup"].fillna(0).astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)[
        ["doc_id", "n_spans", "n_dup_spans"]
    ]


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------


def _repetition_batch(df: pd.DataFrame) -> pa.Table:
    """Vectorized per-doc repetition metrics for one batch.

    All statistics reduce over ONE flattened token array: tokens are
    hashed once, n-gram identities are window polynomials over the
    hashes, and per-doc reductions are pandas C-level groupbys — no
    Python loop over docs or tokens (the Gopher repetition-filter shape:
    Rae et al. 2021, §A1.1).
    """
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    s = df["text"].fillna("").str.strip().str.lower()
    toks = s.str.split(_WS)
    n = toks.map(len).to_numpy(dtype=np.int64)
    n[s.to_numpy() == ""] = 0

    n_docs = len(ids)
    top_big = np.zeros(n_docs, dtype=np.int64)
    n_tri = np.zeros(n_docs, dtype=np.int64)
    n_tri_dist = np.zeros(n_docs, dtype=np.int64)
    sum_chars = np.zeros(n_docs, dtype=np.int64)

    nz = n > 0
    if nz.any():
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks[nz]]
        )
        th = pd.util.hash_array(flat)
        doc_idx_nz = np.repeat(np.flatnonzero(nz), n[nz])
        # summed token chars per doc (downstream mean-word-length is
        # sum/count — kept as integers so the oracle compare is exact,
        # with no ROUND-half-even vs half-away drift)
        tok_len = pd.Series(flat).str.len().to_numpy(dtype=np.float64)
        sum_chars[:] = np.bincount(
            doc_idx_nz, weights=tok_len, minlength=n_docs
        ).astype(np.int64)

        # bigrams: adjacent-hash polynomial, windows crossing a doc
        # boundary masked out
        if th.size >= 2:
            bh = th[:-1] * _SPAN_P + th[1:]
            same = doc_idx_nz[:-1] == doc_idx_nz[1:]
            bd = doc_idx_nz[:-1][same]
            bg = bh[same]
            if bd.size:
                c = (
                    pd.DataFrame({"d": bd, "g": bg})
                    .groupby(["d", "g"], sort=False)
                    .size()
                )
                mx = c.groupby(level=0).max()
                top_big[mx.index.to_numpy()] = mx.to_numpy(dtype=np.int64)
        # trigrams: total and distinct counts per doc (duplicate fraction
        # = 1 - distinct/total, left to the consumer)
        if th.size >= 3:
            tg = th[:-2] * (_SPAN_P * _SPAN_P) + th[1:-1] * _SPAN_P + th[2:]
            same3 = (doc_idx_nz[:-2] == doc_idx_nz[1:-1]) & (
                doc_idx_nz[1:-1] == doc_idx_nz[2:]
            )
            td = doc_idx_nz[:-2][same3]
            tv = tg[same3]
            if td.size:
                grp = pd.DataFrame({"d": td, "g": tv}).groupby("d", sort=False)["g"]
                total = grp.size()
                dist = grp.nunique()
                n_tri[total.index.to_numpy()] = total.to_numpy(np.int64)
                n_tri_dist[dist.index.to_numpy()] = dist.to_numpy(np.int64)

    out = pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": n,
            "top_bigram_n": top_big,
            "n_trigrams": n_tri,
            "n_distinct_trigrams": n_tri_dist,
            "sum_token_chars": sum_chars,
        }
    )
    return pa.Table.from_pandas(
        out,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("top_bigram_n", pa.int64()),
                ("n_trigrams", pa.int64()),
                ("n_distinct_trigrams", pa.int64()),
                ("sum_token_chars", pa.int64()),
            ]
        ),
        preserve_index=False,
    )


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Per-document repetition/quality metrics (Gopher-style): token
    count, highest bigram occurrence count, total/distinct trigram
    counts (duplicate-trigram fraction = 1 - distinct/total), summed
    token chars (mean word length = sum/count).  Integer counts rather
    than ratios so the oracle compare is exact.  Pure per-batch map —
    no shuffle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pandas"
    )


def gopher_quality_filter(sf_dir: str) -> rd.Dataset:
    """Composite Gopher-rule quality filter (Rae et al. 2021): per-doc
    word-level signals (token count, mean word chars, alphabetic-word
    fraction, stopword count) plus the combined ``keep`` decision under
    the public thresholds (stages/text_stats.GOPHER_*).  Pure per-batch
    map, no shuffle; ratio thresholds compare identical int64/int64 IEEE
    divisions on both sides, so the keep flag is bit-stable vs the SQL
    oracle.  Complements :func:`repetition_stats` (the repetition
    rules) with the document-shape rules."""
    from ..stages.text_stats import gopher_stats_batch

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(gopher_stats_batch, batch_format="pandas")
        .select_columns(
            ["doc_id", "n_tokens", "mean_token_chars", "alpha_frac", "n_stop", "keep"]
        )
    )


# ---------------------------------------------------------------------------
# JSON property extraction (events.props)
# ---------------------------------------------------------------------------


def events_props_json(sf_dir: str) -> pd.DataFrame:
    """Extract the integer ``k`` property from the JSON ``props`` column
    and aggregate per event type (sum/min/max/count — all integers, so
    the oracle compare is exact).

    The extraction is a vectorized regex over the documented
    ``{"k": <int>}`` shape with a per-row ``json.loads`` fallback for
    anything the fast path misses — the hot path never parses JSON in
    Python row-by-row.
    """
    fast = re.compile(r'"k"[ ]*:[ ]*(-?[0-9]+)')

    def partial(df: pd.DataFrame) -> pa.Table:
        props = df["props"].fillna("")
        k = props.str.extract(fast, expand=False)
        missed = k.isna() & (props != "")
        if missed.any():
            import json

            def slow(p: str):  # noqa: ANN202
                try:
                    v = json.loads(p).get("k")
                    return v if isinstance(v, int) else None
                except Exception:  # noqa: BLE001
                    return None

            k[missed] = props[missed].map(slow)
        kv = pd.to_numeric(k, errors="coerce")
        out = (
            pd.DataFrame({"event_type": df["event_type"], "k": kv})
            .groupby("event_type", as_index=False, sort=False)
            .agg(
                sum_k=("k", "sum"),
                min_k=("k", "min"),
                max_k=("k", "max"),
                n_events=("k", "size"),
            )
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("sum_k", pa.float64()),
                    ("min_k", pa.float64()),
                    ("max_k", pa.float64()),
                    ("n_events", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    partials = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    ).map_batches(partial, batch_format="pandas")
    merged = (
        partials.to_pandas()
        .groupby("event_type", as_index=False, sort=False)
        .agg(
            sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"),
            max_k=("max_k", "max"),
            n_events=("n_events", "sum"),
        )
    )
    for c in ("sum_k", "min_k", "max_k"):
        merged[c] = merged[c].astype(np.int64)
    merged["n_events"] = merged["n_events"].astype(np.int64)
    return merged.sort_values("event_type", ignore_index=True)


# ---------------------------------------------------------------------------
# PII detect / redact
# ---------------------------------------------------------------------------


def _augmented_text_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """SQL expression for the deterministic PII injection — the oracle
    side of the shared contract (the engine side is ``_augment``)."""
    return (
        f"{text_expr} || ' contact doc' || CAST({id_expr} AS VARCHAR) || "
        f"'@example.com from 10.1.' || CAST({id_expr} % 256 AS VARCHAR) || "
        f"'.7 call 555-' || lpad(CAST({id_expr} % 10000 AS VARCHAR), 4, '0')"
    )


def _augment(ids: pd.Series, text: pd.Series) -> pd.Series:
    """Deterministic synthetic-PII injection (engine side): the corpora
    are PII-free word soup, so the operator contract includes a derived
    column with one email, one IPv4, and one phone-like token per doc —
    making counts and redaction non-trivially checkable with no external
    data."""
    i = ids.astype(str)
    return (
        text.fillna("")
        + " contact doc"
        + i
        + "@example.com from 10.1."
        + (ids % 256).astype(str)
        + ".7 call 555-"
        + (ids % 10000).astype(str).str.zfill(4)
    )


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """PII detection + redaction: per-doc counts of email / IPv4 /
    phone-like matches and the md5 fingerprint of the redacted text
    (replacement order email → IP → phone, mirrored in the oracle).
    Compiled patterns, vectorized counts/replaces — stateless map."""
    email, ip, phone = (
        re.compile(PII_EMAIL),
        re.compile(PII_IP),
        re.compile(PII_PHONE),
    )

    def scrub(df: pd.DataFrame) -> pa.Table:
        aug = _augment(df["doc_id"], df["text"])
        n_emails = aug.str.count(PII_EMAIL).to_numpy(dtype=np.int64)
        n_ips = aug.str.count(PII_IP).to_numpy(dtype=np.int64)
        n_phones = aug.str.count(PII_PHONE).to_numpy(dtype=np.int64)
        red = (
            aug.str.replace(email, "<EMAIL>", regex=True)
            .str.replace(ip, "<IP>", regex=True)
            .str.replace(phone, "<PHONE>", regex=True)
        )
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in red]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
                "n_emails": pa.array(n_emails, pa.int64()),
                "n_ips": pa.array(n_ips, pa.int64()),
                "n_phones": pa.array(n_phones, pa.int64()),
                "redacted_fp": pa.array(fps, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scrub, batch_format="pandas")


# ---------------------------------------------------------------------------
# Scale-safe exact count-distinct over a heavy column
# ---------------------------------------------------------------------------


def count_distinct_texts(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """Exact COUNT(DISTINCT text) without ever shuffling text: each batch
    reduces to its distinct 64-bit text hashes, the (hash, bucket) rows
    shuffle into B groups, each bucket counts its distinct hashes
    vectorized, and the driver sums B partial counts.  (Engine identity
    is the hash — a 64-bit collision would undercount by 1; negligible
    against the oracle at check scale and the standard trade at 10^12.)
    """

    def hashes(df: pd.DataFrame) -> pa.Table:
        h = np.unique(pd.util.hash_array(df["text"].fillna("").to_numpy(dtype=object)))
        return pa.Table.from_pydict(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "__bucket": pa.array((h % num_buckets).astype(np.int32), pa.int32()),
            }
        )

    def count_bucket(g: pd.DataFrame) -> pa.Table:
        n = int(g["h"].nunique())
        return pa.Table.from_pydict({"n": pa.array([n], pa.int64())})

    parts = (
        _docs(sf_dir, ["text"])
        .map_batches(hashes, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    total = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_distinct": pd.Series([total], dtype="int64")})


# ---------------------------------------------------------------------------
# Composed cleaning pipeline: the training-data funnel in ONE pass
# ---------------------------------------------------------------------------


def clean_corpus_ids(
    sf_dir: str,
    lang_pattern: str = "^(?:en|de)",
    min_tokens: int = 10,
    max_top_bigram: int = 4,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """The composed training-data cleaning funnel: survivors must pass
    language whitelist, minimum length, repetition cap, exact-dup
    winner selection, benchmark exclusion, AND decontamination — the
    end-to-end shape a real corpus-prep job runs, checked as one query.

    Scale plan: the two global facts (exact-dup winner per text hash,
    contaminated-doc id set) are computed first — the winner map from
    batch-local partial mins (broadcast-dedup envelope: the map must fit
    worker memory; ``stages/dedup.dedup_keep_first`` is the beyond-memory
    route), the contamination ids from the existing broadcast
    shingle-set scan (output-sized).  Both broadcast via ``ray.put``;
    the corpus then streams ONCE through a vectorized filter chain — no
    shuffle at all in the final pass.
    """
    from .corpus_stats import BENCHMARK_MOD, benchmark_contamination

    lang_re = re.compile(lang_pattern)

    # (1) exact-dup winners: min doc_id per text hash, merged from
    # batch-local partials on the driver
    def win_partial(df: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_array(df["text"].fillna("").to_numpy(dtype=object))
        out = (
            pd.DataFrame({"h": h.view(np.int64), "doc_id": df["doc_id"].to_numpy()})
            .groupby("h", as_index=False, sort=False)["doc_id"]
            .min()
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("h", pa.int64()), ("doc_id", pa.int64())]),
            preserve_index=False,
        )

    wp = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(win_partial, batch_format="pandas")
        .to_pandas()
    )
    winners = wp.groupby("h", sort=False)["doc_id"].min()
    win_map = dict(zip(winners.index.to_numpy(), winners.to_numpy()))

    # (2) contaminated non-benchmark docs (3-gram overlap with the
    # benchmark slice) — reuses the SQL-green decontamination operator
    contam_ids = set(benchmark_contamination(sf_dir)["doc_id"].to_numpy())

    import ray

    win_ref = ray.put(win_map)
    contam_ref = ray.put(frozenset(contam_ids))

    def funnel(df: pd.DataFrame) -> pa.Table:
        wm = _cached_broadcast(win_ref)
        cset = _cached_broadcast(contam_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        # language whitelist
        keep = df["lang"].fillna("").str.match(lang_re).to_numpy(dtype=bool)
        # length + repetition caps (vectorized repetition kernel)
        rep = _repetition_batch(df).to_pandas()
        keep &= rep["n_tokens"].to_numpy() >= min_tokens
        keep &= rep["top_bigram_n"].to_numpy() <= max_top_bigram
        # exact-dup winner
        h = pd.util.hash_array(df["text"].fillna("").to_numpy(dtype=object)).view(
            np.int64
        )
        keep &= np.array([wm.get(hh) == i for hh, i in zip(h, ids)], dtype=bool)
        # benchmark exclusion + decontamination
        keep &= (ids % BENCHMARK_MOD) != 0
        keep &= ~np.isin(ids, np.fromiter(cset, dtype=np.int64, count=len(cset)))
        return pa.Table.from_pydict({"doc_id": pa.array(ids[keep], pa.int64())})

    out = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(funnel, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id", ignore_index=True)


# ---------------------------------------------------------------------------
# URL / domain operators over the pages corpus (Common Crawl shapes)
# ---------------------------------------------------------------------------

# Shared with the DuckDB oracle (RE2∩Python subset).
DOMAIN_RE = r"^https?://([^/]+)/"
DOMAIN_CAP = 8


def _deduped_pages(sf_dir: str) -> "rd.Dataset":
    """Synthesized pages corpus deduped to one row per url — the same
    chain the single-process oracle runs (synthesize → keep-first by
    warc_ts), so the url universe matches the per-doc oracle parquet."""
    from ..sources.pages_source import synthesize_pages
    from ..stages.dedup import dedup_keep_first

    pages = synthesize_pages(sf_dir, expand=2).select_columns(["url", "warc_ts"])
    return dedup_keep_first(pages, key="url", order_col="warc_ts").drop_columns(
        ["warc_ts"]
    )


def pages_domain_counts(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Docs per domain over the deduped pages corpus — the domain-mix
    diagnostic every crawl pipeline runs.  Batch-local partial counts →
    hash-bucket sum (domains are high-cardinality at web scale — never
    one Ray group per domain)."""

    def partial(df: pd.DataFrame) -> pa.Table:
        dom = df["url"].str.extract(DOMAIN_RE, expand=False).fillna("")
        out = dom.value_counts().rename_axis("domain").reset_index(name="n")
        t = pa.Table.from_pandas(
            out,
            schema=pa.schema([("domain", pa.string()), ("n", pa.int64())]),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(t["domain"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("domain", as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out.rename(columns={"n": "n_docs"}),
            schema=pa.schema([("domain", pa.string()), ("n_docs", pa.int64())]),
            preserve_index=False,
        )

    out = (
        _deduped_pages(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {"domain": pd.Series([], dtype=object), "n_docs": pd.Series([], dtype="int64")}
        )
    return out.sort_values("domain", ignore_index=True)


def pages_domain_capped(
    sf_dir: str, cap: int = DOMAIN_CAP, num_buckets: int = 16
) -> pd.DataFrame:
    """Per-domain document cap: keep at most ``cap`` urls per domain,
    selected deterministically by (md5(url), url) — the standard
    anti-domination sampling step before training.  Domains hash-bucket
    into B groups; each bucket ranks its domains vectorized (one pandas
    groupby-cumcount per bucket, never a Ray group per domain)."""
    import hashlib as _hl

    def keyed(df: pd.DataFrame) -> pa.Table:
        dom = df["url"].str.extract(DOMAIN_RE, expand=False).fillna("")
        md5s = [_hl.md5(u.encode("utf-8")).hexdigest() for u in df["url"]]
        t = pa.Table.from_pydict(
            {
                "domain": pa.array(dom.to_numpy(dtype=object), pa.string()),
                "url": pa.array(df["url"].to_numpy(dtype=object), pa.string()),
                "__md5": pa.array(md5s, pa.string()),
            }
        )
        b = (
            stable_bucket_ids(t["domain"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def cap_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["domain", "__md5", "url"])
        rank = g.groupby("domain", sort=False).cumcount()
        out = g[rank < cap][["domain", "url"]]
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("domain", pa.string()), ("url", pa.string())]),
            preserve_index=False,
        )

    out = (
        _deduped_pages(sf_dir)
        .map_batches(keyed, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(cap_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {"domain": pd.Series([], dtype=object), "url": pd.Series([], dtype=object)}
        )
    return out.sort_values(["domain", "url"], ignore_index=True)


_HOST_CONC_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("n_pages", pa.int64()),
        ("n_tokens", pa.int64()),
        ("host_rank", pa.int64()),
        ("cum_share", pa.float64()),
    ]
)


def host_token_concentration(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Token-volume concentration by host over ALL crawl snapshots: each
    host's page count, token count, rank by token volume, and the
    cumulative token share at that rank — the "what fraction of the
    corpus do the top-k hosts contribute" curve every mixture designer
    reads before setting per-domain caps (the diagnostic behind
    :func:`pages_domain_capped`'s cap constant).

    Ray shape: per-batch partial (host, n_pages, n_tokens) aggregates
    (vectorized host regex + whitespace token count, one pandas groupby
    per batch) → the standard B-bucket hash sum, so only slim per-host
    partials ever shuffle.  The FINAL rank/cumsum runs driver-side on
    the fully-aggregated host table — sublinear in corpus size but
    linear in host count, a documented envelope: beyond ~10^7 hosts,
    swap the driver sort for ``Dataset.sort(n_tokens)`` + a streaming
    cumulative fold (the prefix-sum machinery of stages/selection.py).

    Tie order is the operator contract: rank by (n_tokens DESC, host
    ASC); ``cum_share`` is round-to-6 of cumulative/total tokens.
    """
    from ..sources.pages_source import synthesize_pages
    from ..stages.text_stats import token_count_batch

    part_schema = pa.schema(
        [("host", pa.string()), ("n_pages", pa.int64()), ("n_tokens", pa.int64())]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        host = df["url"].str.extract(DOMAIN_RE, expand=False).fillna("")
        nt = token_count_batch(df)["n_tokens"]
        out = (
            pd.DataFrame({"host": host, "nt": nt})
            .groupby("host", as_index=False, sort=False)
            .agg(n_pages=("nt", "size"), n_tokens=("nt", "sum"))
        )
        t = pa.Table.from_pandas(out, schema=part_schema, preserve_index=False)
        b = (
            stable_bucket_ids(t["host"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("host", as_index=False, sort=False)[["n_pages", "n_tokens"]].sum()
        return pa.Table.from_pandas(out, schema=part_schema, preserve_index=False)

    hosts = (
        synthesize_pages(sf_dir, expand=2, include_html=False)
        .select_columns(["url", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    if hosts.empty:
        return _HOST_CONC_SCHEMA.empty_table().to_pandas()
    hosts = hosts.sort_values(
        ["n_tokens", "host"], ascending=[False, True], ignore_index=True
    )
    total = float(hosts["n_tokens"].sum())
    hosts["host_rank"] = np.arange(1, len(hosts) + 1, dtype=np.int64)
    hosts["cum_share"] = np.round(
        np.cumsum(hosts["n_tokens"].to_numpy(np.float64)) / total, 6
    )
    return hosts[["host", "n_pages", "n_tokens", "host_rank", "cum_share"]]


# ---------------------------------------------------------------------------
# Duplicate-span REMOVAL (the Lee et al. 2022 transform, not just marking)
# ---------------------------------------------------------------------------


def remove_duplicate_spans(
    sf_dir: str, span_k: int = DUP_SPAN_K, num_buckets: int = 32
) -> pd.DataFrame:
    """Exact substring dedup as a TRANSFORM: every token position covered
    by a ``span_k``-token span that occurs in ≥ 2 documents is removed
    (symmetric removal — both copies go; the conservative variant of
    Lee et al. 2022), and each document reports its kept-token count and
    the md5 of the kept text.

    Scale plan: span windows (doc, start, hash) bucket by span hash;
    each bucket computes distinct-doc df vectorized and emits only the
    DUPLICATED window starts (dup-bounded output).  Those (doc, start)
    rows and the raw docs then co-shuffle ONCE by doc hash (union with a
    side tag — the text moves through exactly one exchange), and each
    bucket rebuilds its docs' kept text with a numpy coverage-delta
    sweep per doc.
    """

    def span_rows(df: pd.DataFrame) -> pa.Table:
        # like _batch_span_rows but KEEPING window start positions
        s = df["text"].fillna("").str.strip().str.lower()
        toks = s.str.split(_WS)
        n = toks.map(len).to_numpy(dtype=np.int64)
        n[s.to_numpy() == ""] = 0
        keep = n >= span_k
        empty = pa.Table.from_pydict(
            {
                "doc_id": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "__bucket": pa.array([], pa.int32()),
            }
        )
        if not keep.any():
            return empty
        ids = df["doc_id"].to_numpy(dtype=np.int64)[keep]
        tok_lists = toks[keep]
        nk = n[keep]
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
        th = pd.util.hash_array(flat)
        pows = np.ones(span_k, dtype=np.uint64)
        np.cumprod(np.full(span_k - 1, _SPAN_P, dtype=np.uint64), out=pows[1:])
        win = np.lib.stride_tricks.sliding_window_view(th, span_k)
        wh = (win * pows[::-1]).sum(axis=1, dtype=np.uint64)
        starts = np.concatenate([[0], np.cumsum(nk)[:-1]])
        doc_idx = np.repeat(np.arange(len(nk)), nk)[: wh.size]
        ends = starts + nk
        pos = np.arange(wh.size)
        ok = pos + span_k - 1 < ends[doc_idx]
        d = doc_idx[ok]
        h = wh[ok]
        i_in_doc = pos[ok] - starts[d]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[d], pa.int64()),
                "i": pa.array(i_in_doc, pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "__bucket": pa.array((h % num_buckets).astype(np.int32), pa.int32()),
            }
        )

    spans = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        span_rows, batch_format="pandas"
    )

    def dup_starts(g: pd.DataFrame) -> pa.Table:
        # df per hash over DISTINCT docs (a span repeated within one doc
        # does not make it corpus-duplicated)
        df_per_hash = g.drop_duplicates(["h", "doc_id"]).groupby("h")["h"].transform(
            "size"
        )
        dup_h = set(g.loc[df_per_hash.index[df_per_hash >= 2], "h"])
        out = g[g["h"].isin(dup_h)][["doc_id", "i"]]
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("doc_id", pa.int64()), ("i", pa.int64())]),
            preserve_index=False,
        )

    starts = spans.groupby("__bucket").map_groups(dup_starts, batch_format="pandas")

    # union docs + dup starts, co-bucketed by doc hash: ONE text exchange
    def tag_docs(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["doc_id"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return pa.Table.from_pydict(
            {
                "doc_id": pc_cast_i64(t["doc_id"]),
                "text": t["text"].cast(pa.string()) if t.num_rows else pa.array([], pa.string()),
                "i": pa.nulls(t.num_rows, pa.int64()),
                "__side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "__docb": pa.array(b, pa.int32()),
            }
        )

    def tag_starts(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["doc_id"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return pa.Table.from_pydict(
            {
                "doc_id": pc_cast_i64(t["doc_id"]),
                "text": pa.nulls(t.num_rows, pa.string()),
                "i": pc_cast_i64(t["i"]),
                "__side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
                "__docb": pa.array(b, pa.int32()),
            }
        )

    both = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tag_docs, batch_format="pyarrow"
    ).union(starts.map_batches(tag_starts, batch_format="pyarrow"))

    def rebuild(g: pd.DataFrame) -> pa.Table:
        docs = g[g["__side"] == 0]
        st = g[g["__side"] == 1]
        st_by_doc: dict = {
            k: v["i"].to_numpy(dtype=np.int64) for k, v in st.groupby("doc_id")
        }
        ids_out, n_out, fp_out = [], [], []
        for did, text in zip(docs["doc_id"], docs["text"]):
            toks = (text or "").strip().lower().split()
            dup_i = st_by_doc.get(did)
            if dup_i is None or not len(toks):
                kept = toks
            else:
                delta = np.zeros(len(toks) + 1, dtype=np.int64)
                np.add.at(delta, dup_i, 1)
                np.add.at(delta, np.minimum(dup_i + span_k, len(toks)), -1)
                covered = np.cumsum(delta[:-1]) > 0
                kept = [t for t, c in zip(toks, covered) if not c]
            joined = " ".join(kept)
            ids_out.append(did)
            n_out.append(len(kept))
            fp_out.append(hashlib.md5(joined.encode("utf-8")).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_tokens_kept": pa.array(n_out, pa.int64()),
                "kept_fp": pa.array(fp_out, pa.string()),
            }
        )

    out = (
        both.groupby("__docb")
        .map_groups(rebuild, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens_kept": pd.Series([], dtype="int64"),
                "kept_fp": pd.Series([], dtype=object),
            }
        )
    return out.sort_values("doc_id", ignore_index=True)


def pc_cast_i64(arr: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


# ---------------------------------------------------------------------------
# Cross-document exact-substring dedup (the Lee-et-al removal pass)
# ---------------------------------------------------------------------------


def _doc_window_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """k-window polynomial hashes of ONE doc's token array (uint64).

    The same hash family ``_batch_span_rows`` computes flat across a
    batch (one ``pd.util.hash_array`` + the ``_SPAN_P`` window
    polynomial) — shared so the removal pass and the marking pass can
    never disagree on span identity."""
    if len(tokens) < k:
        return np.empty(0, dtype=np.uint64)
    th = pd.util.hash_array(tokens)
    pows = np.ones(k, dtype=np.uint64)
    np.cumprod(np.full(k - 1, _SPAN_P, dtype=np.uint64), out=pows[1:])
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    return (win * pows[::-1]).sum(axis=1, dtype=np.uint64)


def _scrub_doc_tokens(
    tokens: np.ndarray, drop_hs: np.ndarray | None, k: int
) -> tuple[np.ndarray, int]:
    """Drop every token covered by a k-window whose hash is in
    ``drop_hs`` (int64 views).  Shared by the engine's finalize stage
    and the single-process oracle — the per-doc removal kernel IS the
    contract; df/ownership logic is re-derived independently on each
    side."""
    n = len(tokens)
    if n < k or drop_hs is None or len(drop_hs) == 0:
        return tokens, 0
    wh = _doc_window_hashes(tokens, k)
    bad = np.nonzero(np.isin(wh.view(np.int64), drop_hs))[0]
    if bad.size == 0:
        return tokens, 0
    cover = np.zeros(n + 1, dtype=np.int32)
    np.add.at(cover, bad, 1)
    np.add.at(cover, bad + k, -1)
    covered = np.cumsum(cover[:-1]) > 0
    return tokens[~covered], int(covered.sum())


def cross_doc_duplicate_spans(
    sf_dir: str, span_k: int = DUP_SPAN_K, num_buckets: int = 32
) -> rd.Dataset:
    """Cross-document exact-substring DEDUP — the removal pass of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") at span granularity: every distinct ``span_k``-token span
    occurring in two or more documents is kept only in its OWNER (the
    smallest doc_id containing it) and removed from every other
    document; a token is dropped when any removable window covers it.
    Boilerplate paragraphs shared across urls vanish from all copies but
    the first.  Intra-document repeats are the sibling operator
    ``remove_duplicate_spans``; this one only drops spans sourced from
    ANOTHER document.

    Output per document: ``doc_id``, ``n_tokens`` (normalized token
    count), ``n_removed``, ``text_clean`` (surviving tokens joined by
    single spaces — the trim/lower/``\\s+`` normalization the text-stats
    family shares).

    Ray shape: (doc, span-hash) rows from the marking-pass kernel,
    bucketed by span hash for df + owner (B groups, never one Ray group
    per span), removable rows re-bucketed by doc hash and folded into
    ONE list<int64> row per doc, then a bucketed left join ships each
    doc's drop set next to its text — the raw text crosses the wire
    exactly once, in that join.  SQL-checked against the flat
    single-process recompute
    (pipelines/rowsonly_oracles.write_cross_doc_spans_oracle)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def span_rows(df: pd.DataFrame) -> pa.Table:
        ids, hashes = _batch_span_rows(df, span_k)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(hashes, pa.int64()),
                "__bucket": pa.array(
                    (hashes.view(np.uint64) % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    _DROP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("h", pa.int64())])

    def removable_rows(g: pd.DataFrame) -> pa.Table:
        # all rows of a span hash land in one bucket; rows are distinct
        # per (doc, hash), so size IS document frequency and min IS the
        # global owner
        grp = g.groupby("h")["doc_id"]
        dfreq = grp.transform("size").to_numpy()
        owner = grp.transform("min").to_numpy()
        drop = (dfreq >= 2) & (g["doc_id"].to_numpy() != owner)
        out = g.loc[drop, ["doc_id", "h"]]
        return pa.Table.from_pandas(out, schema=_DROP_SCHEMA, preserve_index=False)

    _LIST_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("drop_hs", pa.list_(pa.int64()))]
    )

    def redocb(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["doc_id"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__docb", pa.array(b, pa.int32()))

    def collect_doc(g: pd.DataFrame) -> pa.Table:
        # (doc, sorted hash-run) → one list row per doc, pure numpy+Arrow
        d = g["doc_id"].to_numpy(dtype=np.int64)
        h = g["h"].to_numpy(dtype=np.int64)
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        uniq, starts = np.unique(d, return_index=True)
        offsets = np.concatenate([starts, [len(d)]]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(h, pa.int64())
        )
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), lists], schema=_LIST_SCHEMA
        )

    _OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_removed", pa.int64()),
            ("text_clean", pa.string()),
        ]
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        has_drops = "drop_hs" in df.columns
        n_tok = np.zeros(len(df), dtype=np.int64)
        n_rem = np.zeros(len(df), dtype=np.int64)
        cleaned: list[str] = []
        for i, (text, hs) in enumerate(
            zip(df["text"], df["drop_hs"] if has_drops else [None] * len(df))
        ):
            s = (text or "").strip().lower()
            toks = np.asarray(_WS.split(s) if s else [], dtype=object)
            n_tok[i] = len(toks)
            drop = (
                None
                if hs is None or (isinstance(hs, float) and np.isnan(hs))
                else np.asarray(hs, dtype=np.int64)
            )
            kept, removed = _scrub_doc_tokens(toks, drop, span_k)
            n_rem[i] = removed
            cleaned.append(" ".join(kept))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
                "n_tokens": pa.array(n_tok),
                "n_removed": pa.array(n_rem),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        ).cast(_OUT_SCHEMA)

    spans = docs.map_batches(span_rows, batch_format="pandas")
    drops = (
        spans.groupby("__bucket")
        .map_groups(removable_rows, batch_format="pandas")
        .materialize()  # removable rows only — far smaller than the span stream
    )
    if drops.count() == 0:
        # nothing shared cross-doc (or every doc < span_k tokens):
        # normalize-only pass, no join (map_groups over an empty dataset
        # would yield schema()=None — ROUND_NOTES lesson 12)
        return docs.map_batches(finalize, batch_format="pandas")
    drop_lists = (
        drops.map_batches(redocb, batch_format="pyarrow")
        .groupby("__docb")
        .map_groups(collect_doc, batch_format="pandas")
    )
    joined = bucketed_hash_join(docs, drop_lists, on="doc_id", how="left")
    return joined.map_batches(finalize, batch_format="pandas")


def domain_reputation(sf_dir: str, expand: int = 2, num_buckets: int = 16) -> pd.DataFrame:
    """Host-level extraction-reputation table over the flagship per-doc
    output: per domain, how many documents the extraction pipeline saw
    and how many completed, plus a ``reputable`` flag — domains whose
    completion rate is at or above the corpus-wide rate.  The standard
    crawl-curation signal (drop hosts that mostly serve broken /
    unparseable payloads) composed directly on the engine's own
    headline pipeline.

    Scale shape: the flagship per-doc stream reduces to per-batch
    (domain, n_docs, n_ok) integer partials, hash-bucket summed
    (domains are high-cardinality at web scale — never one Ray group
    per domain); the rate comparison is the integer cross-multiplication
    ``n_ok * total_docs >= total_ok * n_docs`` — no float rates to
    drift between engines.  The corpus totals are the sum of the
    domain-sized result, which IS the output, so no extra pass."""
    from ..stages.dedup import stable_bucket_ids
    from .extract_pipeline import flagship

    ds = flagship(sf_dir, expand=expand, summary_only=True)
    schema = pa.schema(
        [("domain", pa.string()), ("n_docs", pa.int64()), ("n_ok", pa.int64())]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        dom = df["url"].str.extract(DOMAIN_RE, expand=False).fillna("")
        ok = (df["status"] == "completed").astype(np.int64)
        out = (
            pd.DataFrame({"domain": dom, "n_docs": 1, "n_ok": ok})
            .groupby("domain", as_index=False, sort=False)
            .sum()
        )
        t = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
        b = (
            stable_bucket_ids(t["domain"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("domain", as_index=False, sort=False)[["n_docs", "n_ok"]].sum()
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame(
            {
                "domain": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype="int64"),
                "n_ok": pd.Series([], dtype="int64"),
                "reputable": pd.Series([], dtype="int64"),
            }
        )
    total_docs = int(agg["n_docs"].sum())
    total_ok = int(agg["n_ok"].sum())
    agg["reputable"] = (
        agg["n_ok"].to_numpy(np.int64) * total_docs
        >= total_ok * agg["n_docs"].to_numpy(np.int64)
    ).astype(np.int64)
    return agg.sort_values("domain", ignore_index=True)[
        ["domain", "n_docs", "n_ok", "reputable"]
    ]


# The blocklist is part of the operator contract, shared with the
# DuckDB oracle (__ray_entry__) — the C4 "badwords"-filter shape with a
# corpus-appropriate token list.
BLOCKLIST_TOKENS = ("dup", "spark")


def blocklist_filter(sf_dir: str) -> "rd.Dataset":
    """C4-style blocklist filter (Raffel et al. 2020): per document, the
    number of token instances from the blocklist plus the ``keep`` flag
    (no blocked token anywhere).  Pure streaming per-batch map — one
    explode feeds a vectorized set-membership count; blank docs keep.
    All outputs integer, so the oracle compare is exact."""
    bl = frozenset(BLOCKLIST_TOKENS)
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_blocked", pa.int64()), ("keep", pa.int64())]
    )

    def scan(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        toks = s.str.split(_WS)
        ex = toks.explode()
        n_blocked = (
            ex.isin(bl)
            .groupby(level=0)
            .sum()
            .reindex(df.index, fill_value=0)
            .where(s != "", 0)
            .astype("int64")
        )
        nb = n_blocked.to_numpy(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "n_blocked": pa.array(nb, pa.int64()),
                "keep": pa.array((nb == 0).astype(np.int64), pa.int64()),
            },
            schema=schema,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pandas")


# Incremental-ingest split: pages on sites with site_no % INC_DELTA_MOD == 0
# are the DELTA crawl batch; everything else is the accumulated BASE
# corpus (shared with the DuckDB oracle).
INC_DELTA_MOD = 5
INC_SITE_RE = r"^https://site([0-9]+)\."


def incremental_new_docs(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """Incremental-crawl dedup: which page snapshots of the DELTA crawl
    batch (sites with ``site_no % INC_DELTA_MOD == 0``) carry content
    never seen in the BASE corpus — their text fingerprint matches no
    base snapshot.  The pattern every continuously-ingesting pipeline
    runs per crawl batch: dedup the new batch against the accumulated
    corpus without recomputing the corpus.  The synthetic corpus gives
    it real variance both ways: a delta page's sibling variant usually
    landed on a base site (duplicate), recrawl-drift snapshots are
    genuinely new.

    Scale shape: both sides reduce to fingerprint rows per batch (the
    text never shuffles; the base side ships DISTINCT fps only); one
    bucketed ANTI join by fingerprint keeps both sides distributed.
    Output: (url, warc_us) of the genuinely-new delta snapshots."""
    from ..pipelines.snapshots import _slim_pages
    from ..stages.joins import bucketed_hash_join

    def tag_site(df: pd.DataFrame) -> pd.DataFrame:
        site = (
            df["url"].str.extract(INC_SITE_RE, expand=False).astype("int64")
        )
        return df.assign(__delta=(site % INC_DELTA_MOD == 0))

    def delta_side(df: pd.DataFrame) -> pa.Table:
        out = tag_site(df)
        out = out[out["__delta"]]
        return pa.Table.from_pandas(
            out[["url", "warc_us", "text_md5"]],
            schema=pa.schema(
                [("url", pa.string()), ("warc_us", pa.int64()), ("text_md5", pa.string())]
            ),
            preserve_index=False,
        )

    def base_side(df: pd.DataFrame) -> pa.Table:
        out = tag_site(df)
        out = out[~out["__delta"]]
        # the anti-join probes existence only — ship distinct fps, not rows
        return pa.Table.from_pandas(
            out[["text_md5"]].drop_duplicates(),
            schema=pa.schema([("text_md5", pa.string())]),
            preserve_index=False,
        )

    # one synthesis pass feeds both join sides (the slim projection is
    # 3 narrow columns — the materialize is spillable and ≪ the corpus)
    slim = _slim_pages(sf_dir).materialize()
    delta = slim.map_batches(delta_side, batch_format="pandas")
    base = slim.map_batches(base_side, batch_format="pandas")
    new = bucketed_hash_join(
        delta, base, on="text_md5", num_buckets=num_buckets, how="anti"
    )
    out = new.to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"url": pd.Series([], dtype=object), "warc_us": pd.Series([], dtype="int64")}
        )
    return (
        out[["url", "warc_us"]]
        .astype({"warc_us": "int64"})
        .sort_values(["url", "warc_us"], ignore_index=True)
    )


# ---------------------------------------------------------------------------
# C4-style cross-document PARAGRAPH dedup over the extraction output
# ---------------------------------------------------------------------------

_PARA_SEP = "\n\n"  # the extraction kernel's block joiner (kernel/html_extract.py)

_PARA_SLIM_SCHEMA = pa.schema(
    [("url", pa.string()), ("idx", pa.int64()), ("pmd5", pa.string())]
)
_PARA_DROP_SCHEMA = pa.schema([("url", pa.string()), ("idx", pa.int64())])
_PARA_LIST_SCHEMA = pa.schema(
    [("url", pa.string()), ("drop_idx", pa.list_(pa.int64()))]
)
_PARA_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_paras", pa.int64()),
        ("n_kept", pa.int64()),
        ("text_clean", pa.string()),
    ]
)


def _split_paras(text: str) -> list[tuple[int, str]]:
    """Non-empty paragraphs of one extracted document with their
    position in the raw split — the ONE shared split definition between
    the explode pass and the finalize pass (the oracle SQL re-derives it
    independently with string_split + generate_subscripts)."""
    return [(i, p) for i, p in enumerate(text.split(_PARA_SEP)) if p != ""]


def paragraph_dedup_docs(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """C4-style cross-document PARAGRAPH dedup composed on the engine's
    own extraction output (Raffel et al. 2020 kept one occurrence of
    every three-sentence span; the common production variant — and this
    operator — keeps the FIRST occurrence of every exact paragraph).
    The extraction joins main-content blocks with blank lines
    (kernel/html_extract.py), so paragraphs are `\\n\\n` splits of
    ``extracted_text``; a paragraph's occurrence is kept iff it is the
    lexicographically smallest ``(url, idx)`` holding that paragraph's
    md5 — later re-renders of a document under a different url (the
    corpus's url variants) lose ALL their paragraphs, mixed documents
    lose only the shared boilerplate.

    Output per document (docs with empty extraction are excluded):
    ``url``, ``n_paras`` (non-empty paragraphs), ``n_kept``,
    ``text_clean`` (kept paragraphs re-joined by blank lines).

    Ray shape (the Lee-et-al span-dedup skeleton, paragraph-grained):
    slim ``(url, idx, md5)`` rows bucket-shuffled by paragraph md5 — all
    occurrences of a paragraph land in one bucket, so the winner is
    locally decidable (B pandas groups, never a Ray group per
    paragraph); loser rows re-bucket by url into ONE ``list<int64>``
    drop row per url; a bucketed LEFT join ships each document's text
    next to its drop set — the text crosses the wire exactly once.
    md5 keys (not 64-bit fingerprints) so the DuckDB oracle's
    ``md5()`` is the identical key: the oracle re-implements split /
    winner / reassembly declaratively (window ``row_number`` over the
    md5 partition) over a flat single-process extraction parquet
    (rowsonly_oracles.write_extracted_text_oracle).

    Scale notes (100 TB): the md5 shuffle moves ~50-byte rows (two
    orders below the corpus); the join moves the corpus once, same cost
    class as the flagship's own dedup shuffle.  Python-loop explode is
    the accepted hashlib exception (ROUND_NOTES) — md5-per-paragraph has
    no Arrow kernel.
    """
    import dataclasses

    from ..config import DEFAULT_CONFIG
    from .extract_pipeline import flagship

    # this consumer never touches page rasters — skip the PNG render
    # branch entirely (extracted_text/spans are unaffected by
    # cfg.render_pages; kernel/extract.py:125 gates only the raster loop)
    cfg = dataclasses.replace(DEFAULT_CONFIG, render_pages=False)
    docs_all = flagship(sf_dir, cfg, expand=expand, summary_only=False)

    def slim_docs(batch: pa.Table) -> pa.Table:
        t = batch.select(["url", "extracted_text"])
        mask = pa.compute.not_equal(t["extracted_text"], "")
        return t.filter(mask)

    # consumed twice (explode pass + the text-shipping join): materialize
    # the SLIM projection once rather than re-running the extraction; for
    # a parquet-backed extracted corpus at scale, skip this and re-read
    # pruned columns instead (same trade as textops._unique_pages)
    docs = docs_all.map_batches(slim_docs, batch_format="pyarrow").materialize()

    def explode(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        idxs: list[int] = []
        md5s: list[str] = []
        for u, t in zip(
            batch["url"].to_pylist(), batch["extracted_text"].to_pylist()
        ):
            for i, p in _split_paras(t):
                urls.append(u)
                idxs.append(i)
                md5s.append(hashlib.md5(p.encode("utf-8")).hexdigest())
        slim = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(idxs, pa.int64()),
                pa.array(md5s, pa.string()),
            ],
            schema=_PARA_SLIM_SCHEMA,
        )
        b = (
            stable_bucket_ids(slim["pmd5"], num_buckets)
            if slim.num_rows
            else np.empty(0, np.int32)
        )
        return slim.append_column("__bucket", pa.array(b, pa.int32()))

    def losers(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _PARA_DROP_SCHEMA.empty_table()
        gg = g.sort_values(["pmd5", "url", "idx"], kind="mergesort")
        winner = ~gg["pmd5"].duplicated()
        out = gg.loc[~winner, ["url", "idx"]]
        return pa.Table.from_pandas(
            out, schema=_PARA_DROP_SCHEMA, preserve_index=False
        )

    def reurl(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["url"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__urlb", pa.array(b, pa.int32()))

    def collect_drops(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _PARA_LIST_SCHEMA.empty_table()
        gg = g.sort_values(["url", "idx"], kind="mergesort")
        u = gg["url"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        offsets = np.concatenate([starts, [len(u)]]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(gg["idx"].to_numpy(dtype=np.int64), pa.int64()),
        )
        return pa.Table.from_arrays(
            [pa.array(u[starts], pa.string()), lists], schema=_PARA_LIST_SCHEMA
        )

    def finalize(df: pd.DataFrame) -> pa.Table:
        has_drops = "drop_idx" in df.columns
        n_paras = np.zeros(len(df), dtype=np.int64)
        n_kept = np.zeros(len(df), dtype=np.int64)
        cleaned: list[str] = []
        drops_col = df["drop_idx"] if has_drops else [None] * len(df)
        for i, (text, drops) in enumerate(zip(df["extracted_text"], drops_col)):
            paras = _split_paras(text or "")
            n_paras[i] = len(paras)
            if drops is None or (isinstance(drops, float) and np.isnan(drops)):
                kept = [p for _, p in paras]
            else:
                dset = set(np.asarray(drops, dtype=np.int64).tolist())
                kept = [p for j, p in paras if j not in dset]
            n_kept[i] = len(kept)
            cleaned.append(_PARA_SEP.join(kept))
        return pa.Table.from_pydict(
            {
                "url": pa.array(df["url"].astype(str).tolist(), pa.string()),
                "n_paras": pa.array(n_paras),
                "n_kept": pa.array(n_kept),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        ).cast(_PARA_OUT_SCHEMA)

    drops = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(losers, batch_format="pandas")
        .materialize()  # loser rows only — far smaller than the para stream
    )
    if drops.count() == 0:
        return docs.map_batches(finalize, batch_format="pandas")
    drop_lists = (
        drops.map_batches(reurl, batch_format="pyarrow")
        .groupby("__urlb")
        .map_groups(collect_drops, batch_format="pandas")
    )
    joined = bucketed_hash_join(docs, drop_lists, on="url", how="left")
    return joined.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# Mirror-host detection (content-fingerprint overlap between hosts)
# ---------------------------------------------------------------------------

# Fingerprints carried by more hosts than this are template/boilerplate
# content, not mirroring evidence — the same df-cap idea as the shingle
# cap in stages/neardup.py (a hot fingerprint would otherwise emit a
# quadratic pair blow-up).  Single-sourced into the oracle SQL.
MIRROR_MAX_HOSTS = 32
# A single shared page is coincidence at crawl scale; two or more is a
# mirror signal.  Single-sourced into the oracle SQL.
MIRROR_MIN_SHARED = 2

_MIRROR_HM_SCHEMA = pa.schema([("host", pa.string()), ("md5", pa.string())])
_MIRROR_TAG_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("n", pa.int64()),
    ]
)
_MIRROR_OUT_SCHEMA = pa.schema(
    [
        ("host_a", pa.string()),
        ("host_b", pa.string()),
        ("n_shared", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def mirror_host_pairs(
    sf_dir: str,
    expand: int = 2,
    num_buckets: int = 32,
    max_hosts: int = MIRROR_MAX_HOSTS,
    min_shared: int = MIRROR_MIN_SHARED,
) -> rd.Dataset:
    """Mirror-site detection: host pairs sharing ≥ ``min_shared`` exact
    content fingerprints, scored by Jaccard overlap of their fingerprint
    sets — the crawl-curation signal for collapsing mirrored hosts
    before they double-count in every downstream dedup/statistic.

    Semantics (mirrored exactly by the declarative DuckDB self-join
    oracle): a host "has" a fingerprint if ANY of its snapshots carries
    that text md5; fingerprints on more than ``max_hosts`` distinct
    hosts are excluded everywhere (template content); host set sizes are
    counted over the capped fingerprint set; ``jaccard = n_shared /
    (|A| + |B| - n_shared)``.

    Ray shape: ONE bucketed shuffle by fingerprint does all the heavy
    lifting — within-batch distinct combiner first, then per md5-bucket
    (all rows of a fingerprint land together) global distinct, df cap,
    vectorized self-merge pair emission (the stages/neardup.py idiom)
    AND per-host size partials, emitted as one tagged stream; a second
    slim shuffle folds pair counts and host sizes by key.  The host-size
    table (one int per host) is collected and broadcast for the final
    jaccard — the documented small-side envelope (hosts ≪ pages; at
    10^12 docs a host table is ~10^7 rows of ints).
    """
    from .snapshots import _slim_pages

    def hm_partial(df: pd.DataFrame) -> pa.Table:
        host = df["url"].str.extract(DOMAIN_RE, expand=False).fillna("")
        out = pd.DataFrame({"host": host, "md5": df["text_md5"]}).drop_duplicates()
        t = pa.Table.from_pandas(
            out, schema=_MIRROR_HM_SCHEMA, preserve_index=False
        )
        b = (
            stable_bucket_ids(t["md5"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def emit_tagged(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _MIRROR_TAG_SCHEMA.empty_table()
        g = g.drop_duplicates(["host", "md5"])
        nh = g.groupby("md5")["host"].transform("size").to_numpy()
        g = g.loc[nh <= max_hosts]
        if g.empty:
            return _MIRROR_TAG_SCHEMA.empty_table()
        sizes = g.groupby("host", sort=False).size()
        kind = [np.int8(0)] * len(sizes)
        a_vals = list(sizes.index)
        b_vals = [""] * len(sizes)
        n_vals = [int(v) for v in sizes.to_numpy()]
        m = g.merge(g, on="md5")
        m = m[m["host_x"] < m["host_y"]]
        if not m.empty:
            pc_ = (
                m.groupby(["host_x", "host_y"], sort=False)
                .size()
                .reset_index(name="n")
            )
            kind += [np.int8(1)] * len(pc_)
            a_vals += pc_["host_x"].tolist()
            b_vals += pc_["host_y"].tolist()
            n_vals += [int(v) for v in pc_["n"].to_numpy()]
        return pa.Table.from_arrays(
            [
                pa.array(kind, pa.int8()),
                pa.array(a_vals, pa.string()),
                pa.array(b_vals, pa.string()),
                pa.array(n_vals, pa.int64()),
            ],
            schema=_MIRROR_TAG_SCHEMA,
        )

    def rekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__kb", pa.array([], pa.int32()))
        key = pa.compute.binary_join_element_wise(t["a"], t["b"], "\x1f")
        b = stable_bucket_ids(key, num_buckets)
        return t.append_column("__kb", pa.array(b, pa.int32()))

    tagged = (
        _slim_pages(sf_dir, expand)
        .map_batches(hm_partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(emit_tagged, batch_format="pandas")
        .map_batches(rekey, batch_format="pyarrow")
        .groupby("__kb")
    )

    _FOLD_SCHEMA = _MIRROR_TAG_SCHEMA

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _FOLD_SCHEMA.empty_table()
        out = (
            g.groupby(["kind", "a", "b"], as_index=False, sort=False)["n"].sum()
        )
        return pa.Table.from_pandas(
            out[["kind", "a", "b", "n"]],
            schema=_FOLD_SCHEMA,
            preserve_index=False,
        )

    folded = tagged.map_groups(fold, batch_format="pandas").materialize()

    # host-size table: small side (one int per host) — collect + broadcast
    sizes_df = folded.filter(expr="kind == 0").to_pandas()
    size_map = dict(zip(sizes_df["a"], sizes_df["n"].astype(np.int64)))
    sizes_ref = ray.put(size_map)

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[(df["kind"] == 1) & (df["n"] >= min_shared)]
        if df.empty:
            return _MIRROR_OUT_SCHEMA.empty_table()
        sm = _cached_broadcast(sizes_ref)
        sa = df["a"].map(sm).to_numpy(dtype=np.int64)
        sb = df["b"].map(sm).to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        jac = n / (sa + sb - n)
        return pa.Table.from_arrays(
            [
                pa.array(df["a"].tolist(), pa.string()),
                pa.array(df["b"].tolist(), pa.string()),
                pa.array(n, pa.int64()),
                pa.array(jac, pa.float64()),
            ],
            schema=_MIRROR_OUT_SCHEMA,
        )

    return folded.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental-crawl NEAR-dup dedup (delta batch vs base corpus by SimHash)
# ---------------------------------------------------------------------------

_INC_ND_SIDE_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),  # 0 = base, 1 = delta
        ("url", pa.string()),
        ("warc_us", pa.int64()),
        ("sig", pa.int64()),
    ]
)
_INC_ND_OUT_SCHEMA = pa.schema([("url", pa.string()), ("warc_us", pa.int64())])


def incremental_new_docs_neardup(
    sf_dir: str, max_hamming: int = 3, num_buckets: int = 32
) -> pd.DataFrame:
    """Incremental-crawl NEAR-dup dedup: delta-batch snapshots whose
    SimHash is within ``max_hamming`` of NO base-corpus signature —
    the stronger sibling of ``incremental_new_docs`` (exact md5): it
    also rejects recrawl-drift and template-tweaked re-renders, the
    content that actually pollutes a continuously-ingested corpus.
    Exact dups are hamming 0, so this strictly subsumes the md5 check.

    Ray shape (bipartite block probing): both sides reduce to
    ``(side, sig)`` rows per batch (base ships DISTINCT signatures
    only); each signature explodes into its four 16-bit block rows;
    one block_key-bucketed shuffle co-locates every (block, key) combo,
    where a vectorized delta×base merge + XOR/popcount verifies hamming
    — recall is EXACT for max_hamming ≤ 3 (pigeonhole over 4 disjoint
    blocks, stages/neardup.hamming_near_dup_pairs).  Matched delta row
    keys distinct-fold by key bucket, then one bucketed ANTI join
    removes them from the delta side.  Text never shuffles.

    SQL-checked against a flat recompute: same SimHash kernel, dense
    delta×base popcount matrix, no Ray
    (rowsonly_oracles.write_incremental_neardup_oracle)."""
    from ..sources.pages_source import synthesize_pages
    from ..stages.neardup import _popcount64, _simhash_batch

    def sig_rows(df: pd.DataFrame) -> pa.Table:
        site = df["url"].str.extract(INC_SITE_RE, expand=False).astype("int64")
        delta = (site % INC_DELTA_MOD == 0).to_numpy()
        sigs = _simhash_batch(df["text"].tolist()).view(np.int64)
        us = df["warc_ts"].astype("int64").to_numpy()
        d = pd.DataFrame(
            {
                "side": np.int8(1),
                "url": df["url"].to_numpy()[delta],
                "warc_us": us[delta],
                "sig": sigs[delta],
            }
        )
        b = pd.DataFrame(
            {"side": np.int8(0), "url": "", "warc_us": np.int64(0), "sig": sigs[~delta]}
        ).drop_duplicates(["sig"])
        return pa.Table.from_pandas(
            pd.concat([d, b], ignore_index=True)[_INC_ND_SIDE_SCHEMA.names],
            schema=_INC_ND_SIDE_SCHEMA,
            preserve_index=False,
        )

    def explode_blocks(t: pa.Table) -> pa.Table:
        sh = t["sig"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(sh)
        idx = np.repeat(np.arange(n), 4)
        keys = (
            (sh[:, None] >> (16 * np.arange(4, dtype=np.uint64))[None, :])
            & np.uint64(0xFFFF)
        ).astype(np.int32).ravel()
        out = pa.Table.from_pydict(
            {
                "side": pc_take_col(t["side"], idx),
                "url": pc_take_col(t["url"], idx),
                "warc_us": pc_take_col(t["warc_us"], idx),
                "sig": pa.array(np.repeat(sh.view(np.int64), 4), pa.int64()),
                "block": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
                "block_key": pa.array(keys, pa.int32()),
            }
        )
        b = (
            stable_bucket_ids(out["block_key"], num_buckets)
            if out.num_rows
            else np.empty(0, np.int32)
        )
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    _MATCH_SCHEMA = pa.schema([("__rid", pa.string())])

    def matches(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _MATCH_SCHEMA.empty_table()
        d = g[g["side"] == 1]
        b = g[g["side"] == 0]
        if d.empty or b.empty:
            return _MATCH_SCHEMA.empty_table()
        cols = ["block", "block_key", "sig"]
        m = d[["url", "warc_us"] + cols].merge(b[cols], on=["block", "block_key"])
        if m.empty:
            return _MATCH_SCHEMA.empty_table()
        x = m["sig_x"].to_numpy(dtype=np.int64).view(np.uint64)
        y = m["sig_y"].to_numpy(dtype=np.int64).view(np.uint64)
        hit = _popcount64(np.bitwise_xor(x, y)) <= max_hamming
        m = m[hit]
        if m.empty:
            return _MATCH_SCHEMA.empty_table()
        rid = (m["url"] + "\x1f" + m["warc_us"].astype(str)).drop_duplicates()
        return pa.Table.from_arrays(
            [pa.array(rid.tolist(), pa.string())], schema=_MATCH_SCHEMA
        )

    def rid_bucket(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["__rid"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__rb", pa.array(b, pa.int32()))

    def rid_distinct(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _MATCH_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.array(g["__rid"].drop_duplicates().tolist(), pa.string())],
            schema=_MATCH_SCHEMA,
        )

    pages = synthesize_pages(sf_dir, expand=2, include_html=False)
    tagged = pages.map_batches(sig_rows, batch_format="pandas").materialize()

    matched = (
        tagged.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(matches, batch_format="pandas")
        .map_batches(rid_bucket, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(rid_distinct, batch_format="pandas")
    )

    _DELTA_SCHEMA = pa.schema(
        [("url", pa.string()), ("warc_us", pa.int64()), ("__rid", pa.string())]
    )

    def delta_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["side"] == 1]
        df["__rid"] = df["url"] + "\x1f" + df["warc_us"].astype(str)
        return pa.Table.from_pandas(
            df[["url", "warc_us", "__rid"]], schema=_DELTA_SCHEMA, preserve_index=False
        )

    delta = tagged.map_batches(delta_rows, batch_format="pyarrow")
    new = bucketed_hash_join(
        delta, matched, on="__rid", num_buckets=num_buckets, how="anti"
    )
    out = new.to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"url": pd.Series([], dtype=object), "warc_us": pd.Series([], dtype="int64")}
        )
    return (
        out[["url", "warc_us"]]
        .astype({"warc_us": "int64"})
        .sort_values(["url", "warc_us"], ignore_index=True)
    )


def pc_take_col(col: "pa.ChunkedArray | pa.Array", idx: np.ndarray):  # noqa: ANN201
    """take() that tolerates both Array and ChunkedArray inputs."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(idx))


# ---------------------------------------------------------------------------
# Production quality-filter chain (Gopher ∧ compressibility ∧ language)
# ---------------------------------------------------------------------------

# zlib-ratio keep window: below = degenerate repetition, above = zlib
# overhead on near-incompressible noise/short docs.  Single-sourced into
# the oracle SQL.
ZRATIO_MIN = 0.25
ZRATIO_MAX = 0.95

_CHAIN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("gopher_keep", pa.int64()),
        ("compression_ratio", pa.float64()),
        ("lang_pred", pa.string()),
        ("keep", pa.int64()),
    ]
)


def quality_filter_chain(sf_dir: str) -> rd.Dataset:
    """The production filter CHAIN: a document survives iff it passes
    the Gopher word-level rules AND its zlib compressibility sits in
    the sane window AND the language classifier recognizes it — the
    standard pre-training gauntlet (Gopher / CCNet / RefinedWeb style)
    composed from this engine's own kernels.

    Ray shape: ONE streaming pass — all three kernels run on the same
    batch (they are per-doc maps; composing them costs zero joins and
    zero shuffles), emitting the per-signal columns plus the combined
    flag.  The zlib ratio is the kernel's rounded float, so the oracle
    (which reads the flat recompute parquet) compares identical
    numbers.
    """
    from ..stages.text_stats import (
        LangId,
        compression_ratio_batch,
        gopher_stats_batch,
    )

    langid = LangId()

    def chain(df: pd.DataFrame) -> pa.Table:
        g = gopher_stats_batch(df)
        z = compression_ratio_batch(df)
        preds = [langid.classify(t) for t in df["text"].fillna("")]
        keep = (
            (g["keep"].to_numpy(dtype=np.int64) == 1)
            & (z["compression_ratio"].to_numpy() >= ZRATIO_MIN)
            & (z["compression_ratio"].to_numpy() <= ZRATIO_MAX)
            & (np.asarray(preds, dtype=object) != "und")
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
                "gopher_keep": pa.array(g["keep"].to_numpy(dtype=np.int64)),
                "compression_ratio": pa.array(z["compression_ratio"].to_numpy()),
                "lang_pred": pa.array(preds, pa.string()),
                "keep": pa.array(keep),
            }
        ).cast(_CHAIN_SCHEMA)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chain, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2 heuristics)
# ---------------------------------------------------------------------------

# The corpora are single-line word soup, so the operator contract
# includes a deterministic "web page" derivation — a pure function of
# (doc_id, text) implemented INDEPENDENTLY on both sides (pandas here,
# SQL in __ray_entry__), the same convention as the PII injection:
#   tokens (trim → lower → \s+ split) group into fixed 8-token lines;
#   v = (doc_id*37 + j*11) % 10 decorates line j:
#     v<=5 → body+'.' ; v==6 → body+':' ; v==7 → bare body ;
#     v==8 → 'javascript '+body+'.' ; v==9 → body+'!'
#   then doc-level dirt: doc_id%13==0 prefixes line 0 with
#   'lorem ipsum '; doc_id%17==0 appends ' {' to line 1.
C4_LINE_TOKENS = 8
C4_TERMINAL = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3


def _c4_page_lines(doc_id: int, toks: list[str]) -> list[str]:
    """Engine side of the shared page derivation (see module comment)."""
    lines: list[str] = []
    for j in range((len(toks) + C4_LINE_TOKENS - 1) // C4_LINE_TOKENS):
        body = " ".join(toks[C4_LINE_TOKENS * j : C4_LINE_TOKENS * (j + 1)])
        v = (doc_id * 37 + j * 11) % 10
        if v <= 5:
            line = body + "."
        elif v == 6:
            line = body + ":"
        elif v == 7:
            line = body
        elif v == 8:
            line = "javascript " + body + "."
        else:
            line = body + "!"
        if doc_id % 13 == 0 and j == 0:
            line = "lorem ipsum " + line
        if doc_id % 17 == 0 and j == 1:
            line = line + " {"
        lines.append(line)
    return lines


_C4_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_lines", pa.int64()),
        ("n_kept", pa.int64()),
        ("clean_md5", pa.string()),
        ("keep", pa.int64()),
    ]
)


def c4_line_filters(sf_dir: str) -> rd.Dataset:
    """C4-style line-level cleaning: keep a line iff it ends in terminal
    punctuation AND has >= 5 words AND doesn't mention 'javascript';
    keep the page iff >= 3 lines survived AND it contains neither
    'lorem ipsum' nor '{' anywhere.  Output per doc: line/kept counts,
    md5 of the cleaned text (kept lines joined with newline — the
    actual C4 transform output, pinned byte-for-byte), and the page
    keep flag.  Stateless streaming map; the per-doc string assembly +
    md5 is the same accepted per-row codec cost class as pii_scrub
    (the rule evaluation itself is trivial next to it)."""

    def scan(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        texts = df["text"].fillna("").to_numpy(dtype=object)
        n_lines = np.zeros(len(ids), np.int64)
        n_kept = np.zeros(len(ids), np.int64)
        keep = np.zeros(len(ids), np.int64)
        md5s: list[str] = []
        for i, (doc_id, text) in enumerate(zip(ids, texts)):
            lines = _c4_page_lines(int(doc_id), text.strip().lower().split())
            kept = [
                ln
                for ln in lines
                if ln.endswith(C4_TERMINAL)
                and len(ln.split()) >= C4_MIN_LINE_WORDS
                and "javascript" not in ln
            ]
            dirty = any(("lorem ipsum" in ln) or ("{" in ln) for ln in lines)
            clean = "\n".join(kept)
            n_lines[i] = len(lines)
            n_kept[i] = len(kept)
            keep[i] = int(len(kept) >= C4_MIN_KEPT_LINES and not dirty)
            md5s.append(hashlib.md5(clean.encode("utf-8")).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "clean_md5": pa.array(md5s, pa.string()),
                "keep": pa.array(keep, pa.int64()),
            },
            schema=_C4_SCHEMA,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pandas")
