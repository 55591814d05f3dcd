"""Text-analysis stages for a training-data pipeline: token counting,
quality scoring, fingerprinting, language-ID.

All stages are ``map_batches`` transforms. Regex state is compiled once
per actor (callable classes), mirroring the reference's config-time regex
compile (/root/reference/src/config.py:45-52); the per-batch bodies are
vectorized (pandas .str / numpy), never per-row Python where avoidable.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^.!?,;:]")


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """n_tokens = number of whitespace-separated words (0 for blank)."""
    s = df[text_col].fillna("").str.strip()
    n = s.str.split(_WS).str.len().astype("int64")
    n = n.where(s != "", 0)
    return df.assign(n_tokens=n)


# BPE-ish pre-tokenizer: letter runs, digit runs, punct runs, each with
# optional leading space (GPT-2-style shape, ASCII-only so Python re and
# DuckDB RE2 agree exactly).
_BPE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+")
BPE_PATTERN_SQL = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def bpe_token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Token count under the BPE-ish pre-tokenizer regex."""
    n = df[text_col].fillna("").str.findall(_BPE).str.len().astype("int64")
    return df.assign(n_bpe_tokens=n)


def quality_score_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Cheap quality signals: length, punctuation ratio, mean word length.

    The punctuation class and the arithmetic match the oracle SQL exactly
    (round-to-4 on ratios) so results hash-compare.
    """
    s = df[text_col].fillna("")
    length = s.str.len().astype("int64")
    # _PUNCT strips every NON-punct char, so what remains is the punct count.
    n_punct = s.str.replace(_PUNCT, "", regex=True).str.len()
    ratio = (n_punct / length.replace(0, np.nan)).fillna(0.0).round(4)
    return df.assign(text_len=length, n_punct=n_punct.astype("int64"), punct_ratio=ratio)


# English stopword list for the stopword-ratio quality signal; shared
# verbatim with the SQL oracle (__ray_entry__ builds the IN-list from it).
STOPWORDS = (
    "the and of to in is you that it he was for on are as with his they at be "
    "this have from or one had by word but not what all were we when your can"
).split()
_STOP_SET = frozenset(STOPWORDS)


def stopword_stats_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword count/ratio over whitespace tokens (lowercased).

    Token semantics match the SQL oracle exactly: split trimmed
    lowercased text on ``\\s+``; blank docs have 0 tokens.  The explode
    + isin body is vectorized pandas — no per-row Python.
    """
    s = df[text_col].fillna("").str.strip().str.lower()
    toks = s.str.split(_WS)
    n_tokens = toks.str.len().astype("int64").where(s != "", 0)
    exploded = toks.explode()
    hits = exploded.isin(_STOP_SET).groupby(level=0).sum().astype("int64")
    n_stop = hits.reindex(df.index, fill_value=0).where(s != "", 0).astype("int64")
    # UNROUNDED ratio: both engines divide the same two int64s, so the
    # IEEE doubles are bit-identical; any rounding would reintroduce
    # half-even (numpy) vs half-away (DuckDB) mismatches.
    ratio = (n_stop / n_tokens.replace(0, np.nan)).fillna(0.0)
    return df.assign(n_tokens=n_tokens, n_stop=n_stop, stop_ratio=ratio)


def md5_fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Content fingerprint (md5 hex) — SQL-checkable against DuckDB md5()."""
    fp = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in df[text_col]]
    return df.assign(fp=fp)


# Gopher-style composite quality rules (Rae et al. 2021, public): the
# word-level subset that is exactly SQL-expressible.  Shared with the
# DuckDB oracle (__ray_entry__ builds its CASE expression from these —
# one source of truth, no drift).
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_CHARS = 3.0
GOPHER_MAX_MEAN_CHARS = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_stats_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-document Gopher quality signals + the composite keep flag.

    Same tokenization contract as :func:`stopword_stats_batch` (trimmed
    lowercased ``\\s+`` split, blank docs have 0 tokens).  The two
    ratios are UNROUNDED int64/int64 divisions, so the threshold
    comparisons in ``keep`` are bit-identical to the SQL oracle's.
    All vectorized: one explode feeds token lengths, alpha membership
    and stopword membership.
    """
    s = df[text_col].fillna("").str.strip().str.lower()
    toks = s.str.split(_WS)
    n_tokens = toks.str.len().astype("int64").where(s != "", 0)
    exploded = toks.explode()
    sum_chars = (
        exploded.str.len().groupby(level=0).sum().reindex(df.index, fill_value=0)
    )
    sum_chars = sum_chars.where(s != "", 0).astype("int64")
    n_alpha = (
        exploded.str.contains("[a-z]", regex=True, na=False)
        .groupby(level=0)
        .sum()
        .reindex(df.index, fill_value=0)
        .where(s != "", 0)
        .astype("int64")
    )
    n_stop = (
        exploded.isin(_STOP_SET)
        .groupby(level=0)
        .sum()
        .reindex(df.index, fill_value=0)
        .where(s != "", 0)
        .astype("int64")
    )
    nt = n_tokens.to_numpy(np.int64)
    safe = np.where(nt > 0, nt, 1).astype(np.float64)
    mean_chars = np.where(nt > 0, sum_chars.to_numpy(np.int64) / safe, 0.0)
    alpha_frac = np.where(nt > 0, n_alpha.to_numpy(np.int64) / safe, 0.0)
    keep = (
        (nt >= GOPHER_MIN_TOKENS)
        & (nt <= GOPHER_MAX_TOKENS)
        & (mean_chars >= GOPHER_MIN_MEAN_CHARS)
        & (mean_chars <= GOPHER_MAX_MEAN_CHARS)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (n_stop.to_numpy(np.int64) >= GOPHER_MIN_STOPWORDS)
    ).astype(np.int64)
    return df.assign(
        n_tokens=n_tokens,
        mean_token_chars=mean_chars,
        alpha_frac=alpha_frac,
        n_stop=n_stop,
        keep=keep,
    )


class RollingFingerprint:
    """64-bit polynomial rolling-hash document fingerprint (non-SQL).

    A Rabin-Karp style fingerprint over the token stream: stable under
    partitioning, cheap to compute, usable as a shard-friendly dedup key.

    Fully vectorized (round-3 fix of the per-token Python blake2b loop):
    one ``pd.util.hash_array`` over the batch's concatenated token stream,
    then the polynomial fold ``Σ h_i · BASE^(n-1-i) mod 2^64`` as wrapping
    uint64 numpy ops — power table indexed per token, segment sums via
    ``np.add.reduceat``.  The uint64 wrap IS the modulus, so the result is
    identical to the sequential Horner fold over the same hashes.
    """

    BASE = np.uint64(1_000_003)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tok_lists = [(t or "").split() for t in texts]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        n_docs = len(tok_lists)
        fps = np.zeros(n_docs, dtype=np.uint64)
        total = int(counts.sum())
        if total:
            all_toks = np.empty(total, dtype=object)
            pos = 0
            for toks in tok_lists:
                all_toks[pos : pos + len(toks)] = toks
                pos += len(toks)
            hashes = pd.util.hash_array(all_toks)  # uint64 siphash per token
            # BASE^k mod 2^64 for k in [0, max_len): cumprod wraps by design
            max_len = int(counts.max())
            pows = np.ones(max_len, dtype=np.uint64)
            if max_len > 1:
                np.cumprod(np.full(max_len - 1, self.BASE, dtype=np.uint64), out=pows[1:])
            offsets = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            # exponent of token j (global) in its doc: (doc_end - 1) - j
            ends = np.repeat(offsets + counts, counts)
            exps = ends - 1 - np.arange(total, dtype=np.int64)
            terms = hashes * pows[exps]
            nonempty = counts > 0
            fps[nonempty] = np.add.reduceat(terms, offsets[nonempty])
        out = [f"{v:016x}" for v in fps.tolist()]
        return batch.append_column("rolling_fp", pa.array(out, pa.string()))


# ---------------------------------------------------------------------------
# Language identification (n-gram heuristic)
# ---------------------------------------------------------------------------

# Tiny per-language marker sets (stopword heuristic): public knowledge.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are as with".split()),
    "de": frozenset("der die das und ist ich nicht sie mit ein auf für von zu den".split()),
    "fr": frozenset("le la les et de des un une est que pour dans qui pas sur".split()),
    "es": frozenset("el la los las y de que en un una es por con para del no".split()),
    "nl": frozenset("de het een en van ik je niet dat die is op te zijn met".split()),
    "it": frozenset("il la le e di che un una è per in non con sono del si".split()),
}


class LangId:
    """Stopword-overlap language classifier (actor-pool stage).

    Marker tables are built once per actor in ``__init__`` — the
    "stateful setup once per worker" pattern.  Deterministic tie-break:
    highest score wins, then lexicographic language code.
    """

    def __init__(self) -> None:
        self.markers = _LANG_MARKERS

    def classify(self, text: str) -> str:
        toks = set((text or "").lower().split())
        best_lang, best = "und", 0
        for lang in sorted(self.markers):
            score = len(toks & self.markers[lang])
            if score > best:
                best_lang, best = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def langid_dataset(ds: rd.Dataset, concurrency: int | tuple[int, int] = (1, 4)) -> rd.Dataset:
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=concurrency)


_CTRL = re.compile(r"[\x00-\x1f\x7f]")
# explicit ASCII whitespace class (NOT \s): Python's \s and RE2's \s
# disagree on \x0b, and the oracle must collapse the identical set
_WS_COLLAPSE = re.compile(r"[ \t\n\r\f\v]+")
WS_COLLAPSE_SQL = "[ \\t\\n\\r\\f\\v]+"


def normalize_text_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Training-data text cleaning: collapse every whitespace run to one
    space FIRST (so 'foo\\nbar' → 'foo bar', not 'foobar'), then strip
    the remaining (non-whitespace) control chars, trim, lowercase.
    Emits the md5 of the normalized text (``norm_fp``) so the op is
    SQL-checkable without shipping normalized bodies around: the
    fingerprint IS the dedup key a cleaning pipeline would use
    downstream.

    Op order (ws-collapse → control-strip → trim → lower) is part of the
    contract — the DuckDB oracle applies the identical chain with the
    same explicit ASCII whitespace class.
    """
    s = (
        df[text_col]
        .fillna("")
        .str.replace(_WS_COLLAPSE, " ", regex=True)
        .str.replace(_CTRL, "", regex=True)
        .str.strip()
        .str.lower()
    )
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in s]
    return df.assign(norm_fp=fp)


def compression_ratio_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """zlib-compressibility quality signal (the CCNet/RefinedWeb-family
    heuristic: highly compressible text is repetitive boilerplate, and
    barely-compressible text is noise/binary junk).  Per document:
    UTF-8 byte count, zlib level-6 compressed size, and their float
    ratio.  zlib output for a fixed level is deterministic for a given
    input (same library everywhere in this fleet), so the operator is
    exactly reproducible; the oracle is a flat recompute (DuckDB cannot
    zlib).  Per-row compress loop is the accepted kernel cost class
    (same as the md5 fingerprint loops)."""
    import zlib

    n_bytes = np.zeros(len(df), dtype=np.int64)
    n_comp = np.zeros(len(df), dtype=np.int64)
    for i, text in enumerate(df[text_col].fillna("")):
        raw = text.encode("utf-8")
        n_bytes[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, 6))
    ratio = np.where(n_bytes > 0, n_comp / np.maximum(n_bytes, 1), 1.0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "n_bytes": n_bytes,
            "n_compressed": n_comp,
            "compression_ratio": np.round(ratio, 6),
        }
    )
