"""Text-analysis pipelines over the ``documents`` table (driver testdata).

Thin compositions of the stages in ``stages/text_stats.py`` and
``stages/similarity.py`` — each mirrors an ``oracle_sql()`` entry (or is
explicitly rows-only for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.similarity import ann_topk_lsh, cosine_topk, load_query_vector
from ..stages.text_stats import (
    LangId,
    RollingFingerprint,
    bpe_token_count_batch,
    md5_fingerprint_batch,
    quality_score_batch,
    stopword_stats_batch,
    token_count_batch,
)


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# Same tokenizer as corpus_stats / the token_counts oracle: regex \s+,
# not Python str.split() (they disagree on exotic whitespace).
_TOKEN_WS = re.compile(r"\s+")


def token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pandas"
    ).select_columns(["doc_id", "n_tokens"])


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bpe_token_count_batch, batch_format="pandas"
    ).select_columns(["doc_id", "n_bpe_tokens"])


def quality_scores(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pandas"
    ).select_columns(["doc_id", "text_len", "n_punct", "punct_ratio"])


_SENT_SPLIT = re.compile(r"[.!?]+")

_SENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_sentences", pa.int64()),
        ("mean_sentence_tokens", pa.float64()),
    ]
)


def sentence_stats(sf_dir: str) -> rd.Dataset:
    """Per-document sentence segmentation stats — the Gopher-family
    readability signal a line/paragraph split can't give: how many
    sentences a document has and how long they run.  Sentences are the
    non-empty (post-trim) segments of ``trim(text)`` split on runs of
    terminal punctuation ``[.!?]+`` (an RE2∩Python pattern — no
    lookbehind, so DuckDB and pandas segment identically);
    ``mean_sentence_tokens`` is the round-to-6 mean whitespace-token
    count over those segments.  Blank docs and docs whose text is ONLY
    punctuation emit nothing on both sides.

    Ray shape: one streaming ``map_batches`` (vectorized pandas split →
    explode → per-doc groupby agg inside the batch — doc rows never
    straddle batches), no shuffle."""

    def stats(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip()
        sub = pd.DataFrame({"doc_id": df["doc_id"], "seg": s.str.split(_SENT_SPLIT)})
        ex = sub.explode("seg")
        seg = ex["seg"].fillna("").str.strip()
        keep = seg != ""
        if not keep.any():
            return _SENT_SCHEMA.empty_table()
        toks = seg[keep].str.split(_TOKEN_WS).str.len().astype("int64")
        out = (
            pd.DataFrame({"doc_id": ex["doc_id"][keep], "nt": toks})
            .groupby("doc_id", as_index=False, sort=False)
            .agg(n_sentences=("nt", "size"), mean_sentence_tokens=("nt", "mean"))
        )
        out["mean_sentence_tokens"] = np.round(
            out["mean_sentence_tokens"].to_numpy(np.float64), 6
        )
        return pa.Table.from_pandas(out, schema=_SENT_SCHEMA, preserve_index=False)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pandas")


_READ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("n_sentences", pa.int64()),
        ("n_vowel_groups", pa.int64()),
        ("flesch", pa.float64()),
    ]
)


def readability_scores(sf_dir: str) -> rd.Dataset:
    """Flesch-reading-ease-style readability per document — the
    readability member of the quality-signal family (used alongside
    Gopher rules to down-weight word-salad and legalese):
    ``flesch = 206.835 − 1.015·(words/sentences) −
    84.6·(vowel_groups/words)``, rounded to 6, where words is the
    shared whitespace-token count, sentences the shared ``[.!?]+``
    segment count (:func:`sentence_stats` convention), and vowel groups
    (runs of ``[aeiou]`` in the lowercased text) the classic cheap
    syllable proxy.  Docs with zero words or zero sentences emit
    nothing on both sides; all three counts are exact ints and the
    float composition is the same two multiplies on each side.

    Ray shape: ONE streaming ``map_batches`` — three vectorized pandas
    counts per batch, no shuffle."""

    def score(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip()
        words = s.str.split(_TOKEN_WS).str.len().astype("int64").where(s != "", 0)
        segs = s.str.split(_SENT_SPLIT)
        sub = pd.DataFrame({"i": np.arange(len(df)), "seg": segs}).explode("seg")
        seg = sub["seg"].fillna("").str.strip()
        sent = (
            pd.DataFrame({"i": sub["i"][seg != ""]})
            .groupby("i")
            .size()
            .reindex(np.arange(len(df)), fill_value=0)
            .to_numpy(np.int64)
        )
        vowels = s.str.lower().str.count(r"[aeiou]+").astype("int64")
        keep = (words.to_numpy() > 0) & (sent > 0)
        if not keep.any():
            return _READ_SCHEMA.empty_table()
        w = words.to_numpy(np.int64)[keep]
        st = sent[keep]
        v = vowels.to_numpy(np.int64)[keep]
        flesch = np.round(206.835 - 1.015 * (w / st) - 84.6 * (v / w), 6)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)[keep], pa.int64()),
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(st, pa.int64()),
                "n_vowel_groups": pa.array(v, pa.int64()),
                "flesch": pa.array(flesch, pa.float64()),
            },
            schema=_READ_SCHEMA,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pandas")


def train_test_split(sf_dir: str, test_hex_prefixes: tuple = ("0", "1")) -> rd.Dataset:
    """Deterministic hash-based train/test split (the held-out-set op of
    a training-data pipeline): split = 'test' iff the first hex char of
    md5(doc_id) is in ``test_hex_prefixes`` (2/16 = 12.5% by default).
    Pure function of the id → stable under any partitioning, resumable,
    and SQL-checkable (DuckDB md5 agrees byte-for-byte)."""
    import hashlib

    import pyarrow as pa

    def split_batch(batch: pa.Table) -> pa.Table:
        splits = [
            "test"
            if hashlib.md5(str(i).encode()).hexdigest()[0] in test_hex_prefixes
            else "train"
            for i in batch["doc_id"].to_pylist()
        ]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return _docs(sf_dir, ["doc_id"]).map_batches(
        split_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "split"])


# Data-mixing weights: per-source (language) keep rates — the mixture
# knob of a training-data pipeline (up/down-weight sources toward a
# target distribution).  Shared with the DuckDB oracle (__ray_entry__
# builds its CASE expression from this dict — one source of truth).
MIX_WEIGHTS: dict[str, float] = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.25}
MIX_DEFAULT_WEIGHT = 0.1


def mix_threshold_hex(rate: float) -> str:
    """Keep-rate → 8-hex-digit md5-prefix threshold.  A doc is kept iff
    the first 8 hex chars of md5(doc_id) compare LESS THAN this string —
    lexicographic compare of lowercase fixed-width hex IS numeric
    compare, so both the engine and DuckDB evaluate the identical
    predicate with no hex parsing anywhere."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def mixed_corpus_sample(sf_dir: str) -> rd.Dataset:
    """Weighted data mixing (deterministic): every source (language)
    keeps an md5-hash-based fraction of its documents per
    ``MIX_WEIGHTS`` — the source-reweighting step that shapes a training
    mixture.  Pure function of (doc_id, lang): stable under any
    partitioning, resumable, no RNG, no shuffle — one streaming filter.
    SQL-checked (DuckDB md5 agrees byte-for-byte)."""
    import hashlib

    thresholds = {
        lang: mix_threshold_hex(rate) for lang, rate in MIX_WEIGHTS.items()
    }
    default_t = mix_threshold_hex(MIX_DEFAULT_WEIGHT)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        mask = [
            hashlib.md5(str(i).encode()).hexdigest()[:8]
            < thresholds.get(lang, default_t)
            for i, lang in zip(ids, langs)
        ]
        return batch.filter(pa.array(mask))

    return (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(keep, batch_format="pyarrow")
        .select_columns(["doc_id", "lang"])
    )


def stratified_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Deterministic stratified sample: the k docs with the smallest
    md5(doc_id) per language — the balanced-subset op of a training-data
    pipeline.  Batch-local prune first (≤ k rows per lang leave each
    batch), then a tiny per-lang merge; fully reproducible, no RNG."""
    import hashlib

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            __m=[hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]]
        )
        return df.sort_values(["__m", "doc_id"]).groupby("lang", sort=False).head(k)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["__m", "doc_id"]).head(k)[["doc_id", "lang"]]

    out = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(prune, batch_format="pandas")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["lang", "doc_id"], ignore_index=True)


# Training-shard export: digest constants shared with the oracle SQL
# (__ray_entry__): 15 hex chars = 60-bit ints (BIGINT-safe on both
# sides), position packed into the top 20 bits, content into the low 40.
SHARD_COUNT = 16
_POS_MOD = 1 << 20
_CH_MOD = 1 << 40


def training_shards_digest(
    sf_dir: str, num_shards: int = SHARD_COUNT, write_dir: str | None = None
) -> rd.Dataset:
    """Deterministic global shuffle into training shards, verified by a
    position-sensitive per-shard digest — the final export step of a
    training-data pipeline (shard assignment AND within-shard order must
    be reproducible so a resumed/re-run job emits byte-identical shards).

    shard = md5('shard:'||doc_id) % S; within-shard order is
    (md5('order:'||doc_id), doc_id) — a hash shuffle with no RNG state,
    stable under any partitioning.  Each shard reports
    ``bit_xor((pos % 2^20) << 40 | md5(text) % 2^40)`` — swapping any
    two documents' positions or mutating any payload changes the digest,
    so the oracle SQL's ``row_number() OVER`` evaluation checks the
    engine's full sort order, not just shard membership.

    Scale: the shuffle moves 3 int64s per row; ``groupby(shard_id)`` has
    exactly S groups (pick S ≈ cluster cores at 100 TB, e.g. 2^12, so
    groups are balanced write units).  ``write_dir`` additionally writes
    each sorted shard as ``shard=<id>.parquet`` — the partitioned,
    idempotent output layout (one deterministic file per shard; a
    resumed run skips shards whose file already exists).  md5 per row is
    the established DuckDB-parity cost (ROUND_NOTES.md); a
    non-SQL-checked variant would use pd.util.hash_array.
    """
    import hashlib

    import numpy as np

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        shard = [
            int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:15], 16) % num_shards
            for i in ids
        ]
        oh = [
            int(hashlib.md5(f"order:{i}".encode()).hexdigest()[:15], 16) for i in ids
        ]
        ch = [
            int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:15], 16) % _CH_MOD
            for t in texts
        ]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(shard, pa.int64()),
                pa.array(oh, pa.int64()),
                pa.array(ch, pa.int64()),
            ],
            names=["doc_id", "shard_id", "oh", "ch"],
        )

    schema = pa.schema(
        [("shard_id", pa.int64()), ("n_docs", pa.int64()), ("order_digest", pa.int64())]
    )

    def shard_digest(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return schema.empty_table()
        g = g.sort_values(["oh", "doc_id"], ignore_index=True)
        if write_dir is not None:
            os.makedirs(write_dir, exist_ok=True)
            import pyarrow.parquet as _pq

            sid = int(g["shard_id"].iloc[0])
            out_path = os.path.join(write_dir, f"shard={sid}.parquet")
            if not os.path.exists(out_path):  # idempotent resume
                tmp = f"{out_path}.{os.getpid()}.tmp"
                _pq.write_table(
                    pa.Table.from_pandas(
                        g[["doc_id"]], preserve_index=False
                    ),
                    tmp,
                )
                os.replace(tmp, out_path)
        pos = np.arange(len(g), dtype=np.int64) % _POS_MOD
        combined = pos * _CH_MOD + g["ch"].to_numpy(np.int64)
        digest = np.bitwise_xor.reduce(combined)
        return pa.Table.from_pydict(
            {
                "shard_id": [int(g["shard_id"].iloc[0])],
                "n_docs": [len(g)],
                "order_digest": [int(digest)],
            },
            schema=schema,
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(shard_digest, batch_format="pandas")
    )


def stopword_stats(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stopword_stats_batch, batch_format="pandas"
    ).select_columns(["doc_id", "n_tokens", "n_stop", "stop_ratio"])


def md5_fingerprints(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        md5_fingerprint_batch, batch_format="pandas"
    ).select_columns(["doc_id", "fp"])


def rolling_fingerprints(sf_dir: str) -> rd.Dataset:
    """Rolling-hash fingerprint — SQL-checked against a single-process
    recompute parquet (pipelines/rowsonly_oracles.py)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        RollingFingerprint, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "rolling_fp"])


def token_chunks(sf_dir: str, chunk: int = 64) -> rd.Dataset:
    """Context-window packing: split each document's token stream into
    fixed-size windows of ``chunk`` tokens (last window ragged) — the
    sequence-chunking step that feeds fixed-context training.  Emits
    (doc_id, chunk_id, n_tokens, chunk_md5) where chunk_md5 fingerprints
    the space-joined window, so the oracle checks window CONTENT, not
    just counts.  Pure per-doc transform — embarrassingly parallel, no
    shuffle, and deterministic under any partitioning.

    Tokenizer parity with token_counts: trim → lower → split \\s+;
    blank docs emit nothing.
    """
    import hashlib

    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("chunk_md5", pa.string()),
        ]
    )

    def chunkify(df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        ids, cids, ns, fps = [], [], [], []
        for i, t in zip(df["doc_id"][s != ""], s[s != ""].str.split(_TOKEN_WS)):
            for c in range(0, len(t), chunk):
                w = t[c : c + chunk]
                ids.append(i)
                cids.append(c // chunk)
                ns.append(len(w))
                fps.append(hashlib.md5(" ".join(w).encode()).hexdigest())
        return pa.Table.from_pydict(
            {"doc_id": ids, "chunk_id": cids, "n_tokens": ns, "chunk_md5": fps},
            schema=schema,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(chunkify, batch_format="pandas")


def langid_heuristic(sf_dir: str) -> rd.Dataset:
    """N-gram/stopword language ID — SQL-checked: the oracle recomputes
    the marker-set argmax relationally from the SAME marker tables
    (__ray_entry__._langid_sql)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


def similarity_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk(ds, load_query_vector(sf_dir, 0), k=k)


def similarity_topk_lsh(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """LSH-bucketed ANN — approximate by design, but deterministic, so
    SQL-checked against a single-process recompute of the same bucket
    probe (pipelines/rowsonly_oracles.py)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_topk_lsh(ds, load_query_vector(sf_dir, 0), k=k, n_planes=6)


def similarity_topk_ivf(sf_dir: str, k: int = 10, n_cells: int = 16, nprobe: int = 4) -> pd.DataFrame:
    """IVF ANN: k-means coarse quantizer + nprobe cell search.

    The quantizer sample is the deterministic hash-threshold sample
    (stages/semdedup.deterministic_sample_matrix), not ``Dataset.take``
    — the quantizer no longer depends on block arrival order, so the
    whole operator is batch-invariant and SQL-checked against a
    single-process recompute (pipelines/rowsonly_oracles.py)."""
    from ..stages.semdedup import deterministic_sample_matrix
    from ..stages.similarity import ivf_topk, kmeans_centroids

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sample = deterministic_sample_matrix(ds, "vec_id", "embedding", target=2048)
    cent = kmeans_centroids(sample, n_cells=n_cells)
    return ivf_topk(ds, load_query_vector(sf_dir, 0), cent, k=k, nprobe=nprobe)


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------


def _unique_pages(sf_dir: str) -> rd.Dataset:
    """Synthesized pages exact-deduped to one row per url (earliest
    warc_ts wins — the engine's canonical dedup semantics), so near-dup
    ids are unique and "the text of url X" is unambiguous.

    Materialized ONCE: the near-dup pipelines consume the corpus twice
    (signature pass + verification semi-join), and re-running the
    synthetic source per consumer doubles the cost.  For a real
    parquet-backed corpus at scale, skip the materialize — a pruned
    re-read is cheaper than pinning the text column in the object store.
    """
    from ..sources.pages_source import synthesize_pages
    from ..stages.dedup import dedup_keep_first

    pages = synthesize_pages(sf_dir, expand=2).select_columns(["url", "warc_ts", "text"])
    return (
        dedup_keep_first(pages, key="url", order_col="warc_ts")
        .drop_columns(["warc_ts"])
        .materialize()
    )


def minhash_near_dups(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs over the synthesized pages corpus
    (which contains exact text repeats across url variants and ~5%
    recrawl-drift near-dups).  Exact-dedup runs first (unique ids); the
    verification is fully distributed (semi-join filter + bucket-joins
    in stages/neardup.py) — the corpus never lands on the driver.
    SQL-checked: a single-process flat recompute with the same hash
    family writes the oracle parquet (pipelines/rowsonly_oracles.py)."""
    from ..stages.neardup import minhash_near_dup_pairs

    return minhash_near_dup_pairs(
        _unique_pages(sf_dir), threshold=threshold, id_col="url", text_col="text"
    )


def simhash_near_dups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs over synthesized pages — SQL-checked
    against a single-process flat block-probe recompute
    (pipelines/rowsonly_oracles.py)."""
    from ..stages.neardup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _unique_pages(sf_dir), max_hamming=max_hamming, id_col="url", text_col="text"
    )


def minhash_dedup_groups(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup GROUPS: connected components over the verified MinHash
    pair graph by iterated min-label propagation — every labeling step
    is a Dataset op (stages/neardup.min_label_components), no driver
    union-find.  SQL-checked: the oracle parquet is produced by a
    DRIVER union-find over the single-process pair oracle
    (pipelines/rowsonly_oracles.py) — the opposite architecture must
    yield identical components.

    Output: one row per document that belongs to a near-dup group,
    ``(url, group_id)`` where group_id is the lexicographic min url of
    the component.
    """
    from ..stages.neardup import min_label_components

    pairs = minhash_near_dups(sf_dir, threshold=threshold)
    if pairs.empty:
        return pd.DataFrame({"url": [], "group_id": []})
    labels = min_label_components(rd.from_pandas(pairs[["id_a", "id_b"]]))
    out = labels.to_pandas().rename(columns={"id": "url", "label": "group_id"})
    return out.sort_values("url", ignore_index=True)[["url", "group_id"]]


NGRAM_MAX_DF = 16  # shared with the DuckDB oracle (__ray_entry__)


def ngram_jaccard_near_dups(sf_dir: str, threshold: float = 0.2) -> pd.DataFrame:
    """Exact 3-gram Jaccard near-dup pairs over documents with the
    df-capped shingle universe active (shingles in > NGRAM_MAX_DF docs
    are boilerplate, not near-dup signal, and make pair generation
    quadratic at web scale).  SQL-checked: the DuckDB oracle recomputes
    the same capped shingle sets relationally."""
    from ..stages.neardup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=threshold, max_df=NGRAM_MAX_DF
    )


def doc_chunks_overlap(
    sf_dir: str, window: int = 64, stride: int = 48
) -> rd.Dataset:
    """RAG/context chunking with overlap: each document's token stream is
    cut into windows of ``window`` tokens starting every ``stride``
    tokens (stride < window ⇒ consecutive chunks overlap by
    window−stride tokens — the standard retrieval-chunking shape; the
    final chunk is the partial tail).  Chunk i covers tokens
    [i·stride, min(i·stride+window, n)); starts exist while i·stride < n,
    so every chunk contributes at least one new token.

    Embarrassingly parallel — one map_batches, no shuffle; at 100 TB
    this runs at read bandwidth.  Differs from context_pack_bins (which
    PACKS whole docs into fixed training sequences): this SPLITS one doc
    into overlapping windows.  Output carries the chunk's md5 (DuckDB-
    shared hash) rather than the chunk text so the result stays slim;
    a real pipeline would emit the text column instead.  SQL-checked:
    the oracle regenerates boundaries with generate-series arithmetic
    and md5s the same 1-based token slices.
    """
    import hashlib

    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")

    def chunk_batch(batch: pa.Table) -> pa.Table:
        ids, idxs, starts, ends, md5s = [], [], [], [], []
        for did, txt in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = _TOKEN_WS.split((txt or "").strip().lower())
            if toks == [""]:
                continue
            n = len(toks)
            i = 0
            while i * stride < n:
                s = i * stride
                e = min(s + window, n)
                ids.append(did)
                idxs.append(i)
                starts.append(s)
                ends.append(e)
                md5s.append(hashlib.md5(" ".join(toks[s:e]).encode()).hexdigest())
                i += 1
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, batch["doc_id"].type),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "end_tok": pa.array(ends, pa.int64()),
                "n_tokens": pa.array(
                    [e - s for s, e in zip(starts, ends)], pa.int64()
                ),
                "chunk_md5": pa.array(md5s, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk_batch, batch_format="pyarrow"
    )


def ngram_containment_near_dups(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Exact 3-gram CONTAINMENT near-dup pairs (i / min(|A|, |B|)) over
    documents — the doc-in-doc detector Jaccard misses: a short doc
    quoted whole inside a long one has containment ~1.0 but Jaccard
    near 0 (union is dominated by the long side).  Same df-capped
    inverted-shingle-index machinery as ngram_jaccard_near_dups (one
    shingle shuffle, bucketed pair partials, one value-attach join);
    only the final score kernel differs.  SQL-checked with the
    identical capped shingle universe."""
    from ..stages.neardup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]),
        threshold=threshold,
        max_df=NGRAM_MAX_DF,
        metric="containment",
    )


def text_embeddings(sf_dir: str, dim: int = 64) -> rd.Dataset:
    """documents.text → hashing-trick embeddings (actor pool; the model-
    inference stage shape — rows-only oracle, non-SQL)."""
    from ..stages.embed import embed_texts

    return embed_texts(_docs(sf_dir, ["doc_id", "text"]), dim=dim)


def text_embedding_near_dups(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """End-to-end: embed documents with the engine's own embedder, then
    SRP-LSH-bucketed cosine near-dup pairs over those vectors — the
    composition a training-data pipeline runs (embed → dedup).

    Round-3 rework: the embedding matrix is never materialized on the
    driver and never broadcast whole — candidate pairs come from the
    SRP-LSH bucket self-merge and only bucket-joined vector pairs are
    scored (stages/neardup.embedding_near_dup_pairs_lsh).  SQL-checked:
    signatures are deterministic, so a single-process flat recompute
    pins the exact output set (pipelines/rowsonly_oracles.py);
    verification is exact cosine, so output ⊆ the exact pair set.
    """
    from ..stages.neardup import embedding_near_dup_pairs_lsh

    # materialized once: consumed by the signature pass AND the verify joins
    emb = text_embeddings(sf_dir).materialize()
    # Adaptive planes/tables (srp_lsh_params): at threshold 0.9 the
    # chooser picks 12-plane × 32-table signatures — the fixed 6×16
    # default collides ~22% of RANDOM pairs (1-(1-2^-6)^16), which at
    # sf0.1 meant millions of false candidates and a 107 s wall;
    # 12-bit signatures cut random collisions to ~0.8% at the same
    # ≥0.995 recall floor for true pairs.
    # verify="bucket": the engine's hashing-trick vectors of same-
    # distribution docs are heavily correlated, so LSH passes most pairs
    # as candidates (8.45M of 12.5M possible at sf0.1) — exact cosine
    # inside the bucket merge deletes the candidate-pair shuffle + the
    # two vector joins (measured ~73 s → single-digit seconds).  The
    # sparse-candidate regime keeps the default join verify.
    return embedding_near_dup_pairs_lsh(
        emb,
        threshold=threshold,
        id_col="doc_id",
        vec_col="embedding",
        n_planes=None,
        n_tables=None,
        verify="bucket",
    )


def embedding_near_dups(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Exact embedding-cosine near-dup pairs (SQL-checked).

    The EXACT mode: the full normalized matrix is broadcast once and
    every batch matmuls against it — correct at any recall, bounded by
    the matrix fitting worker memory (the documented envelope).  The
    beyond-memory path is ``embedding_near_dups_lsh``."""
    import pyarrow.parquet as pq

    from ..stages.neardup import embedding_near_dup_pairs
    from ..stages.similarity import _ids_np, _stack

    # driver read is the documented matrix-fits-memory envelope — prune
    # it to the two columns the broadcast needs
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dup_pairs(
        ds,
        _ids_np(t["vec_id"]),
        _stack(t["embedding"]),
        threshold=threshold,
    )


def semantic_dedup_embeddings(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """SemDeDup-style cluster-then-prune semantic dedup over the
    embeddings table (stages/semdedup.py) — SQL-checked against the flat
    single-process recompute (every step is batch-invariant)."""
    from ..stages.semdedup import semantic_dedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # the operator returns the labeled Dataset (N-sized output stays
    # distributed); the driver-side collect+sort lives only here, in the
    # query wrapper, for the oracle comparison
    out = semantic_dedup(ds, threshold=threshold).to_pandas()
    return out.sort_values("vec_id", ignore_index=True)


def embedding_near_dups_lsh(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """SRP-LSH-bucketed embedding near-dup pairs — the 100 TB path: no
    driver matrix, no full broadcast; candidates from bucketed signature
    self-merge, verification by exact cosine on bucket-joined vectors.
    SQL-checked: the signatures are deterministic, so a single-process
    flat recompute pins the exact output set
    (pipelines/rowsonly_oracles.py); recall vs the exact mode is also
    asserted by a pytest check at threshold 0.95."""
    from ..stages.neardup import embedding_near_dup_pairs_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # adaptive params (stages/similarity.srp_lsh_params): the moderate
    # 0.4 regime resolves to short signatures × many tables (k=4, T≈31,
    # recall ≥ 0.995 at the threshold), the near-dup 0.95 regime to
    # long signatures × moderate tables — one dial, no hand-tuning.
    # verify="bucket": at the 0.4 threshold the 0.995-recall parameter
    # point makes ~86% of ALL pairs candidates — the dense regime where
    # in-bucket exact cosine beats the candidate-pair shuffle + joins
    # (see stages/neardup.embedding_near_dup_pairs_lsh verify doc).
    return embedding_near_dup_pairs_lsh(
        ds, threshold=threshold, n_planes=None, n_tables=None, verify="bucket"
    )


# ---------------------------------------------------------------------------
# Multimodal page operations (SQL-checked via per-page / digest /
# feature oracles; only the raw binary-column outputs stay rows-only)
# ---------------------------------------------------------------------------


def _extracted_pages(sf_dir: str) -> rd.Dataset:
    """Flagship extraction output, run ONCE per (sf_dir, expand, corpus
    version, engine version) and cached as parquet (state/dscache.py
    atomic-rename protocol) — the multimodal queries each read the
    cache instead of re-running the whole extraction."""
    from ..state.dscache import cache_tag, cached_parquet
    from .extract_pipeline import flagship

    path = cached_parquet(
        cache_tag(sf_dir, "extracted_pages", "x2"),
        lambda: flagship(sf_dir, expand=2, summary_only=False),
    )
    return rd.read_parquet(path)


def pages_title_index(sf_dir: str) -> rd.Dataset:
    """Per-url page-metadata index over the extraction output — the
    WAT-record analog of a Common-Crawl pipeline: url → extracted
    ``<title>`` (+ its length and the sniffed content type) for every
    successfully extracted page with a non-empty title.  The title is
    chosen by the multipart gather logic (kernel/extract.py: first
    non-empty part title wins), which the distributed run must reproduce
    per url against the single-process twin.

    Ray shape: one column-pruned read of the cached extraction parquet +
    a streaming vectorized filter/projection — no shuffle, no
    materialization."""

    def proj(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["status"], "completed"), pc.not_equal(t["title"], "")
        )
        t = t.filter(mask)
        return pa.table(
            {
                "url": t["url"],
                "title": t["title"],
                "title_chars": pc.cast(pc.utf8_length(t["title"]), pa.int64()),
                "content_type": t["content_type"],
            }
        )

    return (
        _extracted_pages(sf_dir)
        .select_columns(["url", "title", "status", "content_type"])
        .map_batches(proj, batch_format="pyarrow")
    )


def pages_page_meta(sf_dir: str) -> rd.Dataset:
    """Explode page rasters and parse true geometry/DPI from the PNG bytes."""
    from ..stages.multimodal import explode_pages, page_meta

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(page_meta, batch_format="pyarrow", batch_size=32)
    )


def pages_resized_thumbs(sf_dir: str) -> rd.Dataset:
    """Decode → 480x270 block-mean resize → re-encode (actor pool)."""
    from ..stages.multimodal import PngResizer, explode_pages, page_meta

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 480, "target_h": 270},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(page_meta, batch_format="pyarrow", batch_size=32)
    )


def pages_image_features(sf_dir: str) -> rd.Dataset:
    """General image decode → grayscale feature extraction over the
    extracted page rasters (REAL pure-Python decode, kernel/image.py;
    the model-input feature stage of a multimodal pipeline).  Actor
    pool, small batches (pages are heavy binaries).  Rows-only."""
    from ..stages.multimodal import GeneralImageDecoder, explode_pages

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            GeneralImageDecoder,
            batch_format="pyarrow",
            batch_size=32,
            concurrency=(1, 4),
        )
    )


def pages_phash_near_dups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Image-level near-duplicate detection over the extracted page
    rasters: per-page 64-bit block-mean perceptual hash
    (stages/multimodal.phash64_gray, actor-pool decode) → the generic
    16-bit block-probing hamming pair machinery
    (stages/neardup.hamming_near_dup_pairs).  Re-rendered/duplicate
    pages from url variants land at hamming 0; near-identical layouts
    within the verify radius.  SQL-checked against the single-process
    brute-force recompute (pipelines/rowsonly_oracles.py) — decode and
    hash are deterministic, and block probing is EXACT for
    max_hamming ≤ 3 (pigeonhole over 4 disjoint 16-bit blocks).

    Scale note: perceptual-hash blocks are biased (background-dominated
    images agree on whole blocks), so at web scale pass
    ``max_block_group`` to cap a runaway (block, key) group; left off
    here to keep recall exact vs the brute-force oracle."""
    from ..stages.multimodal import PagePHasher, explode_pages
    from ..stages.neardup import hamming_near_dup_pairs

    sigs = (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PagePHasher,
            batch_format="pyarrow",
            batch_size=32,
            concurrency=(1, 4),
        )
    )
    return hamming_near_dup_pairs(
        sigs,
        max_hamming=max_hamming,
        id_col="page_id",
        sig_col="phash",
        id_type=pa.string(),
    )


def pages_jpeg_roundtrip(sf_dir: str, quality: int = 85) -> rd.Dataset:
    """Lossy-format ingestion stage: 480×270 thumbs → baseline JPEG
    encode → decode → per-page fidelity row (compressed size, md5 of the
    decoded raster, mean abs error).  The codec is the engine's own
    pure-numpy baseline JPEG (kernel/jpeg.py — closes the r3
    entropy-coded-decode gap); fully deterministic, so the entry is
    SQL-checked against the flat single-process recompute
    (pipelines/rowsonly_oracles.write_jpeg_roundtrip_oracle)."""
    from ..stages.multimodal import JpegRoundtrip, PngResizer, explode_pages

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 480, "target_h": 270},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(
            JpegRoundtrip,
            fn_constructor_kwargs={"quality": quality},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
    )


def pages_jpeg_progressive_roundtrip(sf_dir: str, quality: int = 85) -> rd.Dataset:
    """PROGRESSIVE (SOF2) variant of ``pages_jpeg_roundtrip``: thumbs →
    progressive encode (spectral selection + successive approximation,
    kernel/jpeg.py r5) → decode → fidelity row.  Real crawl image
    payloads are heavily progressive, so this pins the decode path a
    web-scale ingest actually exercises; ``dec_md5``/``mae`` equal the
    baseline entry's by the codec's roundtrip contract while
    ``jpeg_bytes`` measures the progressive stream.  SQL-checked against
    the flat single-process recompute
    (pipelines/rowsonly_oracles.write_jpeg_roundtrip_oracle,
    progressive=True)."""
    from ..stages.multimodal import JpegRoundtrip, PngResizer, explode_pages

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 480, "target_h": 270},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(
            JpegRoundtrip,
            fn_constructor_kwargs={"quality": quality, "progressive": True},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
    )


def pages_webp_roundtrip(sf_dir: str) -> rd.Dataset:
    """Lossless-web-format ingestion stage: 480×270 thumbs → WebP
    lossless (VP8L) encode → decode → per-page attestation row
    (compressed size, md5 of the decoded raster — bit-equal to the
    source by VP8L's lossless contract — and a per-row ``lossless_ok``
    flag).  The codec is the engine's own pure-Python VP8L
    (kernel/webp.py — closes the r4 WebP gap; conformance-validated in
    both directions against libwebp in tests/test_webp.py); fully
    deterministic, so the entry is SQL-checked against the flat
    single-process recompute
    (pipelines/rowsonly_oracles.write_webp_roundtrip_oracle)."""
    from ..stages.multimodal import PngResizer, WebpRoundtrip, explode_pages

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 480, "target_h": 270},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(
            WebpRoundtrip,
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
    )


def pages_vp8_roundtrip(sf_dir: str) -> rd.Dataset:
    """Lossy-web-format ingestion stage: 96×54 thumbs → lossy WebP
    (VP8 keyframe) encode → decode → per-page attestation row
    (compressed size, md5 of the decoded luma, MAE vs source).  The
    codec is the engine's own pure-Python VP8 (kernel/vp8.py — decoder
    conformance-pinned bit-exactly against libwebp across 164 encoder
    configurations; the minimal encoder's streams decode identically
    under libwebp and this decoder, tests/test_vp8.py).  Encoder and
    decoder are fully deterministic, so the entry is SQL-checked
    against the flat single-process recompute
    (pipelines/rowsonly_oracles.write_vp8_roundtrip_oracle) even though
    the codec is lossy.  Thumbs are 96×54 (not the 480×270 the
    lossless stages use): the per-subblock pure-Python encode is
    ~40 ms/page at that size and linear in pixels — the documented
    cost envelope of running a real entropy codec with no native
    imaging library."""
    from ..stages.multimodal import PngResizer, Vp8Roundtrip, explode_pages

    return (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 96, "target_h": 54},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(
            Vp8Roundtrip,
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, 8),
        )
    )


def pages_phash_dedup_groups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Image-level duplicate GROUPS: the pHash near-dup pair graph
    collapsed to connected components by the same iterated min-label
    propagation text dedup uses (stages/neardup.min_label_components) —
    the keep-one-per-group step of perceptual-hash image dedup.
    SQL-checked: the oracle parquet is a DRIVER union-find over the
    brute-force pair oracle — the opposite architecture must yield
    identical components.

    Output: one row per page that belongs to a duplicate-image group,
    ``(page_id, group_id)`` with group_id = lexicographic min page_id of
    the component."""
    from ..stages.neardup import min_label_components

    pairs = pages_phash_near_dups(sf_dir, max_hamming=max_hamming)
    if pairs.empty:
        return pd.DataFrame({"page_id": [], "group_id": []})
    labels = min_label_components(rd.from_pandas(pairs[["id_a", "id_b"]]))
    out = labels.to_pandas().rename(columns={"id": "page_id", "label": "group_id"})
    return out.sort_values("page_id", ignore_index=True)[["page_id", "group_id"]]


def pages_image_features_summary(sf_dir: str) -> rd.Dataset:
    """SQL-checked projection of ``pages_image_features``: every scalar
    feature column plus an md5 over the repr of the rounded feature
    vector — compared against the single-process decode of the same
    rasters (pipelines/summary.write_oracle_summary)."""
    from ..stages.multimodal import image_feature_summary

    return pages_image_features(sf_dir).map_batches(
        image_feature_summary, batch_format="pyarrow"
    )


def pages_frame_sample(sf_dir: str, stride: int = 2) -> rd.Dataset:
    """Frame-sampling: every Nth page per document; summary counts."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.multimodal import sample_pages

    sampled = sample_pages(_extracted_pages(sf_dir), stride=stride)

    def summarize(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["pages"])
        return pa.Table.from_pydict(
            {
                "url": batch["url"],
                "n_pages": batch["n_pages"],
                "n_pages_sampled": pc.cast(pc.fill_null(n, 0), pa.int32()),
            }
        )

    return sampled.map_batches(summarize, batch_format="pyarrow")


def normalized_text_fps(sf_dir: str) -> rd.Dataset:
    """Normalize (control-strip → whitespace-collapse → trim → lower)
    and fingerprint every document — the cleaning pass of a training
    pipeline, SQL-checked via md5 of the normalized text."""
    from ..stages.text_stats import normalize_text_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        normalize_text_batch, batch_format="pandas"
    ).select_columns(["doc_id", "norm_fp"])


# ---------------------------------------------------------------------------
# Cross-document context packing (bin packing into training sequences)
# ---------------------------------------------------------------------------

PACK_CAPACITY = 256  # tokens per packed training sequence
PACK_SHARDS = 32  # deterministic doc-hash shards; packing is per-shard


def pack_documents_greedy(sf_dir: str) -> pd.DataFrame:
    """Cross-DOCUMENT context packing: assign whole documents to fixed-
    capacity training sequences ("bins"), the step that turns a cleaned
    corpus into dense fixed-length training examples
    (``token_chunks`` splits WITHIN a doc; this packs ACROSS docs).

    Deterministic scale shape:

    - docs shard by ``siphash(doc_id) % PACK_SHARDS`` — the partitioning
      knob: at 100 TB pick shards ∝ corpus size so one shard fits one
      worker; packing parallelism = shard count, and sequences never
      cross shards (resumable per shard);
    - per-batch partials carry only (doc_id, shard, n_tokens) — text
      never shuffles;
    - per shard, docs pack in ascending doc_id order, first-fit-greedy:
      a doc that would overflow the open bin closes it; an oversized
      doc (> capacity) gets its own bin.  The per-shard greedy is
      inherently sequential (as in any packing implementation) but runs
      over int arrays only.

    Output: (doc_id, shard, bin_id, n_tokens) with bin_id dense per
    shard.  Batch-invariant (shard + order are pure functions of
    doc_id) → SQL-checked against a single-process recompute parquet
    (pipelines/rowsonly_oracles.py); a pytest asserts the packing
    invariants (no bin over capacity unless single-doc; consecutive
    fill).
    """
    import numpy as np
    import pyarrow as pa

    from ..stages.text_stats import token_count_batch

    def partial(df: pd.DataFrame) -> pa.Table:
        df = token_count_batch(df)
        shard = (pd.util.hash_array(df["doc_id"].to_numpy()) % PACK_SHARDS).astype(
            "int64"
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "n_tokens": pa.array(df["n_tokens"], pa.int64()),
            }
        )

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        n = g["n_tokens"].to_numpy()
        bins = np.zeros(len(g), dtype=np.int64)
        bin_id, fill = 0, 0
        for i, t in enumerate(n):
            if fill > 0 and fill + t > PACK_CAPACITY:
                bin_id += 1
                fill = 0
            bins[i] = bin_id
            fill += int(t)
        return g.assign(bin_id=bins)[["doc_id", "shard", "bin_id", "n_tokens"]]

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", ignore_index=True)


def minhash_dedup_keep_best(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Fuzzy-dedup retention policy: within every MinHash near-dup
    group, KEEP the member with the longest text (tie → lexicographic
    min url) and drop the rest — the representative-selection step that
    follows near-dup grouping in a real cleaning pipeline (keep-best
    rather than keep-first).

    Scale shape: group labels come from the distributed min-label
    components (``minhash_dedup_groups``); text lengths attach via one
    streaming pass over the corpus restricted to grouped ids (the
    broadcast candidate-set semi-join — group membership is
    output-sized); the per-group argmax runs in GROUP-HASH BUCKETS
    (B vectorized pandas groups, never one Ray group per group_id —
    the standing rule).

    Output: (url, group_id, text_len, keep), one row per grouped doc.
    SQL-checked: DuckDB re-derives keep from the groups oracle parquet
    joined with the lengths oracle parquet via a window argmax.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ..stages.neardup import _CAND_ID_CACHE, _typed_table, stable_bucket_ids

    groups = minhash_dedup_groups(sf_dir, threshold=threshold)
    if groups.empty:
        return pd.DataFrame({"url": [], "group_id": [], "text_len": [], "keep": []})
    member_ids = set(groups["url"])
    ids_ref = ray.put(member_ids)

    def lengths(batch: pa.Table) -> pa.Table:
        vs = _CAND_ID_CACHE.get(ids_ref.hex())
        if vs is None:
            _CAND_ID_CACHE.clear()
            vs = pa.array(list(ray.get(ids_ref)))
            _CAND_ID_CACHE[ids_ref.hex()] = vs
        mask = pc.is_in(batch["url"], value_set=vs)
        kept = batch.filter(pc.fill_null(mask, False))
        return pa.Table.from_pydict(
            {
                "url": kept["url"],
                "text_len": pc.cast(
                    pc.utf8_length(pc.fill_null(kept["text"], "")), pa.int64()
                ),
            }
        )

    lens = (
        _unique_pages(sf_dir)
        .map_batches(lengths, batch_format="pyarrow")
        .to_pandas()
    )
    merged = groups.merge(lens, on="url", how="left")
    merged["text_len"] = merged["text_len"].fillna(0).astype("int64")
    mds = rd.from_pandas(merged)

    def add_group_bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["group_id"], 16)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    types = {
        "url": pa.string(),
        "group_id": pa.string(),
        "text_len": pa.int64(),
        "keep": pa.bool_(),
    }

    def argmax_bucket(g: pd.DataFrame) -> pa.Table:
        # winner per group: longest text, tie → min url (stable sort)
        g = g.sort_values(["group_id", "text_len", "url"], ascending=[True, False, True])
        winner = g.groupby("group_id", sort=False)["url"].transform("first")
        out = g.assign(keep=(g["url"] == winner))[
            ["url", "group_id", "text_len", "keep"]
        ]
        return _typed_table(out, types)

    out = (
        mds.map_batches(add_group_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(argmax_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("url", ignore_index=True)


def doc_length_percentiles(sf_dir: str) -> rd.Dataset:
    """EXACT global percent-rank of every document's token count —
    without a global sort or an N-sized rank map.

    The trick: token counts have BOUNDED cardinality (distinct lengths
    ≪ N), so the exact value→count histogram fits the driver at any
    corpus size.  Pass 1 streams per-batch partial histograms (≤
    distinct-lengths rows each) and merges them; the cumulative
    "#docs strictly below each length" map broadcasts via ``ray.put``;
    pass 2 assigns ``pct_rank = below / (N-1)`` per row with one
    vectorized lookup — the exact SQL ``PERCENT_RANK() OVER (ORDER BY
    n_tokens)`` semantics (ties share a rank) with zero shuffles.

    The approximate counterpart for UNBOUNDED value domains is the
    sketch-CDF ``order_value_percentile_ranks`` (stages/sketch.py);
    this is the exact path you should prefer whenever the value domain
    is small (lengths, scores, small ints)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from ..pipelines.relational import _cached_broadcast
    from ..stages.text_stats import token_count_batch

    def hist_partial(df: pd.DataFrame) -> pa.Table:
        c = token_count_batch(df)["n_tokens"].value_counts()
        return pa.Table.from_pydict(
            {
                "n_tokens": pa.array(c.index.to_numpy(np.int64), pa.int64()),
                "n": pa.array(c.to_numpy(np.int64), pa.int64()),
            }
        )

    hist = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(hist_partial, batch_format="pandas")
        .to_pandas()
        .groupby("n_tokens", as_index=False)["n"]
        .sum()
        .sort_values("n_tokens", ignore_index=True)
    )
    total = int(hist["n"].sum())
    below = np.zeros(len(hist), dtype=np.int64)
    np.cumsum(hist["n"].to_numpy()[:-1], out=below[1:])
    ref = ray.put((hist["n_tokens"].to_numpy(), below, total))

    def assign(df: pd.DataFrame) -> pa.Table:
        values, cum_below, n = _cached_broadcast(ref)
        t = token_count_batch(df)["n_tokens"].to_numpy(np.int64)
        idx = np.searchsorted(values, t)
        denom = n - 1 if n > 1 else 1
        pct = np.round(cum_below[idx] / denom, 6)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "n_tokens": pa.array(t, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(assign, batch_format="pandas")


_CONFUSION_SCHEMA = pa.schema(
    [("lang", pa.string()), ("lang_pred", pa.string()), ("n_docs", pa.int64())]
)


def lang_confusion_matrix(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Language-metadata QA: confusion matrix of the corpus's DECLARED
    ``lang`` column against the stopword-overlap language classifier —
    the standard check that upstream metadata can be trusted before
    using it for filtering or mixing (off-diagonal mass = mislabeled or
    unidentifiable documents).

    One streaming pass: the LangId actor stage appends ``lang_pred``
    next to the declared ``lang`` (both columns ride the same batch, no
    join), per-batch integer partials reduce to the tiny
    |langs|×|langs| key space before the one bucketed fold.

    SQL-checked: the oracle reuses the langid marker-set argmax SQL
    (same marker tables, __ray_entry__._langid_sql) joined against the
    documents view — REAL relational recompute, opposite architecture.
    """
    from ..stages.dedup import stable_bucket_ids
    from ..stages.text_stats import LangId

    ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        out = (
            df.assign(n_docs=1)
            .groupby(["lang", "lang_pred"], as_index=False, sort=False)["n_docs"]
            .sum()
        )
        pt = pa.Table.from_pandas(
            out, schema=_CONFUSION_SCHEMA, preserve_index=False
        )
        b = (
            stable_bucket_ids(pt["lang"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _CONFUSION_SCHEMA.empty_table()
        out = g.groupby(["lang", "lang_pred"], as_index=False, sort=False)[
            "n_docs"
        ].sum()
        return pa.Table.from_pandas(
            out, schema=_CONFUSION_SCHEMA, preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )


_GROUP_HIST_SCHEMA = pa.schema(
    [("group_size", pa.int64()), ("n_groups", pa.int64())]
)


def dedup_group_size_histogram(sf_dir: str, threshold: float = 0.8, num_buckets: int = 16) -> rd.Dataset:
    """Dedup REPORTING: histogram of near-dup cluster sizes (how many
    groups of 2, of 3, …) over the MinHash component labels — the
    one-line answer to "how much of this corpus is duplication, and in
    what shape" that every dedup run publishes next to its output.

    Composition: the distributed component labeling (iterated min-label
    over the verified pair graph) feeds a group_id-bucketed size fold,
    then a size-keyed fold builds the (bounded) histogram.  Labels stay
    a Dataset end-to-end.

    SQL-checked: DuckDB re-derives sizes from the union-find groups
    oracle parquet with two GROUP BYs — REAL declarative aggregation
    over an opposite-architecture labeling."""
    from ..stages.dedup import stable_bucket_ids
    from ..stages.neardup import min_label_components

    pairs = minhash_near_dups(sf_dir, threshold=threshold)
    if pairs.empty:
        return rd.from_arrow(_GROUP_HIST_SCHEMA.empty_table())
    labels = min_label_components(rd.from_pandas(pairs[["id_a", "id_b"]]))

    _SIZE_SCHEMA = pa.schema([("group_id", pa.string()), ("sz", pa.int64())])

    def size_partial(df: pd.DataFrame) -> pa.Table:
        out = (
            df.assign(sz=1)
            .groupby("label", as_index=False, sort=False)["sz"]
            .sum()
            .rename(columns={"label": "group_id"})
        )
        pt = pa.Table.from_pandas(out, schema=_SIZE_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(pt["group_id"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def size_fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _SIZE_SCHEMA.empty_table()
        out = g.groupby("group_id", as_index=False, sort=False)["sz"].sum()
        return pa.Table.from_pandas(out, schema=_SIZE_SCHEMA, preserve_index=False)

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"group_size": t["sz"].to_numpy(zero_copy_only=False)})
        out = (
            df.assign(n_groups=1)
            .groupby("group_size", as_index=False, sort=False)["n_groups"]
            .sum()
        )
        pt = pa.Table.from_pandas(
            out, schema=_GROUP_HIST_SCHEMA, preserve_index=False
        )
        b = (
            stable_bucket_ids(pt["group_size"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__hb", pa.array(b, pa.int32()))

    def hist_fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _GROUP_HIST_SCHEMA.empty_table()
        out = g.groupby("group_size", as_index=False, sort=False)["n_groups"].sum()
        return pa.Table.from_pandas(
            out, schema=_GROUP_HIST_SCHEMA, preserve_index=False
        )

    return (
        labels.map_batches(size_partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(size_fold, batch_format="pandas")
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(hist_fold, batch_format="pandas")
    )


def compression_ratio_scores(sf_dir: str) -> rd.Dataset:
    """Per-document zlib compressibility (bytes, compressed bytes,
    ratio) — the repetitiveness/noise quality heuristic; pure streaming
    map, no shuffle.  SQL-checked against a flat single-process
    recompute parquet (rowsonly_oracles.write_compression_ratio_oracle;
    DuckDB has no zlib)."""
    from ..stages.text_stats import compression_ratio_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        compression_ratio_batch, batch_format="pandas"
    )


_EMB_CONTAM_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("bench_id", pa.int64()), ("cos", pa.float64())]
)


def embedding_benchmark_contamination(
    sf_dir: str, threshold: float = 0.4
) -> rd.Dataset:
    """Embedding-level benchmark decontamination: every (corpus doc,
    benchmark doc) pair with cosine ≥ threshold — the semantic sibling
    of the n-gram contamination ops (catches paraphrased eval leakage
    that exact shingles miss).  Benchmark side = ``vec_id %
    BENCHMARK_MOD == 0`` (the corpus-wide eval-set stand-in,
    pipelines/corpus_stats.py); corpus side is everything else.

    Ray shape: the benchmark matrix is SMALL BY DEFINITION (an eval
    set), so it is read pruned on the driver, normalized, broadcast via
    ``ray.put`` once, and every batch does one matmul — no shuffle at
    all; pairs above threshold are the only rows that leave a batch.
    Same float conventions as embedding_near_dups (float32 matmul, cos
    rounded to 3 in the output); SQL-checked against a flat recompute
    parquet (rowsonly_oracles.write_embedding_contamination_oracle)."""
    import pyarrow.parquet as pq

    import ray as _ray

    from ..stages.similarity import _ids_np, _stack
    from .corpus_stats import BENCHMARK_MOD
    from .relational import _cached_broadcast

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = _ids_np(t["vec_id"]).astype(np.int64)
    bench_mask = ids % BENCHMARK_MOD == 0
    bench_ids = ids[bench_mask]
    bmat = _stack(t["embedding"].combine_chunks().filter(pa.array(bench_mask)))
    norms = np.linalg.norm(bmat, axis=1)
    norms[norms == 0] = 1.0
    bmat = bmat / norms[:, None]
    bref = _ray.put((bench_ids, bmat))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def score(batch: pa.Table) -> pa.Table:
        b_ids, b = _cached_broadcast(bref)
        vids = _ids_np(batch["vec_id"]).astype(np.int64)
        keep = vids % BENCHMARK_MOD != 0
        if not keep.any():
            return _EMB_CONTAM_SCHEMA.empty_table()
        rows = _stack(batch["embedding"].combine_chunks().filter(pa.array(keep)))
        vids = vids[keep]
        rn = np.linalg.norm(rows, axis=1)
        rn[rn == 0] = 1.0
        cos = (rows / rn[:, None]) @ b.T
        r, c = np.nonzero(cos >= threshold)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vids[r], pa.int64()),
                "bench_id": pa.array(b_ids[c], pa.int64()),
                "cos": pa.array(
                    np.round(cos[r, c].astype(np.float64), 3), pa.float64()
                ),
            }
        ).cast(_EMB_CONTAM_SCHEMA)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Source-mixture epoch plan (data-constrained scaling)
# ---------------------------------------------------------------------------

# Fixed-point denominator for epoch factors (2^20) and the repeat cap —
# data-constrained scaling (Muennighoff et al. 2023) finds repeated data
# retains most of its value up to ~4 epochs.  Shared with the oracle.
MIX_EPOCH_FP = 1 << 20
MIX_MAX_EPOCHS = 4


def source_mixture_plan(sf_dir: str) -> pd.DataFrame:
    """Epoch plan for an equal-share source mixture: given per-source
    token masses, how many (fractional) epochs of each source a training
    run should take so every source contributes ~the corpus-total/S
    token share, with repeats capped at ``MIX_MAX_EPOCHS`` — the
    repeat-factor computation behind every data-mixing config.  All
    arithmetic is exact int64 fixed point (epochs in 2^-20ths), so the
    oracle compare is bit-exact.  Envelope: share × 2^20 must fit int64
    → safe below ~2^43 planned tokens per source; a larger run scales
    the fixed point down.

    Scale shape: ONE streaming pass folds (source, n_docs, n_tokens)
    partials per batch (vectorized token counts, tiny key set — sources
    number in the dozens); the driver does the closed-form plan over S
    rows.  Nothing shuffles, the text never leaves the batch."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("").str.strip()
        ntok = np.where(s == "", 0, s.str.split().str.len().fillna(0)).astype(
            np.int64
        )
        g = (
            pd.DataFrame({"source": df["source"], "n_tokens": ntok})
            .groupby("source", as_index=False, sort=False)
            .agg(n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        )
        return g.astype({"n_docs": "int64", "n_tokens": "int64"})

    parts = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # ≤ S rows per batch
    )
    agg = (
        parts.groupby("source", as_index=False, sort=False)
        .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        .astype({"n_docs": "int64", "n_tokens": "int64"})
    )
    total = int(agg["n_tokens"].sum())
    share = total // len(agg) if len(agg) else 0
    cap = MIX_MAX_EPOCHS * MIX_EPOCH_FP
    epochs = []
    planned = []
    for t in agg["n_tokens"].to_numpy(np.int64):
        e = 0 if t == 0 else min((share * MIX_EPOCH_FP) // int(t), cap)
        epochs.append(e)
        planned.append((int(t) * e) // MIX_EPOCH_FP)
    agg["epochs_fp"] = pd.Series(epochs, dtype="int64")
    agg["planned_tokens"] = pd.Series(planned, dtype="int64")
    return agg.sort_values("source", ignore_index=True)
