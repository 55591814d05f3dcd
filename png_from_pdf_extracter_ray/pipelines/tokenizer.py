"""BPE tokenizer-merge training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL) — the classic
train-a-tokenizer-from-the-corpus step of an LLM data pipeline.

Shape: BPE training never needs the corpus itself, only the WORD
FREQUENCY table — so the distributed part is exactly the vocabulary
aggregation we already have (per-batch partial counts → hash-bucket
groupby → per-bucket top-V prune; pipelines/corpus_stats.py), capped to
the top ``BPE_VOCAB_CAP`` words under the deterministic
(count desc, word asc) total order.  The merge loop itself runs on the
driver over that BOUNDED table (the standard fastBPE/HF architecture:
corpus-sized work is one aggregation pass, the quadratic-ish merge loop
touches only the vocabulary).

Determinism: word totals are exact integer sums; the top-V boundary and
every merge choice use explicit total orders (count desc, pair
lexicographic asc), so the distributed path and the flat oracle agree
exactly.  No end-of-word marker is appended (documented simplification;
the merge semantics are otherwise the reference algorithm).

No reference analog — our addition per the training-data-pipeline brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# module-level, NOT inside worker-executed callables (a function-local
# relative import runs a real import on foreign-cwd workers and fails)
from .corpus_stats import _WS

BPE_VOCAB_CAP = 1024
BPE_N_MERGES = 64
BPE_MIN_PAIR_FREQ = 2


def word_freq_flat(df: pd.DataFrame, cap: int = BPE_VOCAB_CAP) -> pd.DataFrame:
    """Single-process word-frequency table — same tokenization partials
    (corpus_stats._token_partials) as the distributed path, one
    implementation of the cap order on both sides."""
    from .corpus_stats import _token_partials

    parts = _token_partials(df, distinct_per_doc=False)
    totals = parts.groupby("token", as_index=False, sort=False)["n"].sum()
    return (
        totals.sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
        .head(cap)
    )


def word_freq_distributed(ds: rd.Dataset, cap: int = BPE_VOCAB_CAP) -> pd.DataFrame:
    """Distributed word-frequency table capped to the top ``cap`` words
    (count desc, word asc).  Per-bucket prune: a word's total lives in
    exactly one bucket, so the global top-cap is a subset of the
    per-bucket top-caps."""
    from .corpus_stats import _bucketed_token_sum

    totals = _bucketed_token_sum(ds, distinct_per_doc=False)

    def prune(t: pa.Table) -> pa.Table:
        return t.sort_by([("n", "descending"), ("token", "ascending")]).slice(0, cap)

    return (
        totals.map_batches(prune, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
        .head(cap)
    )


def bpe_merges_from_wordfreq(
    words: list[str],
    freqs: list[int],
    n_merges: int = BPE_N_MERGES,
    min_pair_freq: int = BPE_MIN_PAIR_FREQ,
) -> pd.DataFrame:
    """Driver-side merge loop over the bounded word-frequency table.

    Each iteration counts adjacent symbol pairs weighted by word
    frequency, merges the most frequent pair (ties → lexicographically
    smallest), and records (rank, left, right, freq).  Stops early when
    the best pair drops below ``min_pair_freq``."""
    seqs: list[list[str]] = [list(w) for w in words]
    f = [int(x) for x in freqs]
    rows: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, wf in zip(seqs, f):
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wf
        if not counts:
            break
        (left, right), best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_freq:
            break
        rows.append((rank, left, right, best))
        merged = left + right
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
    # column names avoid SQL keywords (left/right/rank) so the oracle
    # SELECT needs no quoting
    return pd.DataFrame(
        {
            "merge_rank": pd.Series([r[0] for r in rows], dtype="int64"),
            "left_sym": pd.Series([r[1] for r in rows], dtype=object),
            "right_sym": pd.Series([r[2] for r in rows], dtype=object),
            "freq": pd.Series([r[3] for r in rows], dtype="int64"),
        }
    )


def bpe_train(sf_dir: str) -> pd.DataFrame:
    """Distributed word count → driver merge loop (module docstring)."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    wf = word_freq_distributed(ds)
    return bpe_merges_from_wordfreq(wf["token"].tolist(), wf["n"].tolist())


def bpe_train_flat(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process twin for the oracle."""
    wf = word_freq_flat(df)
    return bpe_merges_from_wordfreq(wf["token"].tolist(), wf["n"].tolist())


# ---------------------------------------------------------------------------
# BPE apply (encode) — the trained tokenizer driving the corpus
# ---------------------------------------------------------------------------


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE encode: repeatedly merge the adjacent pair with the
    LOWEST merge rank until none applies (the GPT-2 bpe loop).  Shared
    by the actor stage and the flat oracle — one implementation."""
    seq = list(word)
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class BpeEncoder:
    """Actor-pool encode stage: the merge-rank table is actor state
    (built once per worker in ``__init__`` — the tokenizer-load slot),
    and a per-actor word→length memo makes repeated words O(1) (Zipf:
    almost every token repeats).  Output per doc: word and BPE-token
    counts + the compression ratio."""

    def __init__(
        self,
        merges: list[tuple[str, str]] | None = None,
        merges_json: str | None = None,
        id_col: str = "doc_id",
    ) -> None:
        # actor ctor args ship inline when they are small plain scalars —
        # a JSON string avoids the object-store ctor-arg restart warning
        # (ray#53727) that a list-of-tuples arg triggers
        if merges is None:
            import json

            merges = [tuple(p) for p in json.loads(merges_json or "[]")]
        self.ranks = {tuple(pair): i for i, pair in enumerate(merges)}
        self.id_col = id_col
        self.memo: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self.memo.get(w)
        if n is None:
            n = len(bpe_encode_word(w, self.ranks))
            self.memo[w] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        n_words = np.zeros(len(df), dtype=np.int64)
        n_bpe = np.zeros(len(df), dtype=np.int64)
        for i, text in enumerate(s):
            if not text:
                continue
            toks = _WS.split(text)
            n_words[i] = len(toks)
            n_bpe[i] = sum(self._word_len(w) for w in toks)
        ratio = np.where(n_words > 0, n_bpe / np.maximum(n_words, 1), 0.0)
        return pa.Table.from_pydict(
            {
                self.id_col: pa.array(df[self.id_col].to_numpy("int64")),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_bpe),
                "bpe_ratio": pa.array(np.round(ratio, 6)),
            }
        )


def bpe_encode_docs(sf_dir: str) -> rd.Dataset:
    """Train merges (distributed word count → driver loop), then encode
    every document with a BpeEncoder actor pool."""
    import os

    import json

    merges_df = bpe_train(sf_dir)
    merges = list(zip(merges_df["left_sym"], merges_df["right_sym"]))
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges_json": json.dumps(merges)},
        batch_format="pandas",
        concurrency=(1, 8),
    )


def bpe_encode_flat(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process twin of ``bpe_encode_docs`` for the oracle (same
    trained merges, same encode loop)."""
    merges_df = bpe_train_flat(df)
    enc = BpeEncoder(list(zip(merges_df["left_sym"], merges_df["right_sym"])))
    out = enc(df).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018, SentencePiece) — train + encode
# ---------------------------------------------------------------------------
#
# Same architecture as BPE above: the corpus-sized work is ONE
# distributed word-frequency aggregation (bounded table, deterministic
# cap order); training — seed-substring counting, Viterbi hard-EM
# re-estimation, vocabulary pruning — runs on the driver over that
# bounded table, so its floats are single-process and deterministic.
# Simplifications vs the paper (documented, shared by the flat oracle):
# hard-EM (Viterbi counts, not forward-backward expectations) and a
# (count desc, piece asc) prune order instead of likelihood-loss
# ranking.

UNI_SEED_MAX_LEN = 6
UNI_SEED_CAP = 2048
UNI_TARGET_VOCAB = 256
UNI_EM_ITERS = 4
UNI_PRUNE_KEEP_FRAC = 0.75
UNI_UNK_LOGPROB = -20.0


def _viterbi_segment(
    word: str, lp: dict[str, float], max_len: int = UNI_SEED_MAX_LEN
) -> tuple[list[str], float]:
    """Best segmentation of ``word`` under piece log-probs ``lp``.
    Out-of-vocab single chars fall back to UNI_UNK_LOGPROB.  Ties break
    deterministically: strict improvement only, candidates scanned with
    ascending split position — the longest piece wins an exact tie."""
    n = len(word)
    neg_inf = float("-inf")
    dp = [neg_inf] * (n + 1)
    dp[0] = 0.0
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            w = lp.get(piece)
            if w is None:
                if j - i > 1:
                    continue
                w = UNI_UNK_LOGPROB
            if dp[i] == neg_inf:
                continue
            cand = dp[i] + w
            if cand > dp[j]:
                dp[j] = cand
                back[j] = i
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, dp[n]


def unigram_vocab_from_wordfreq(
    words: list[str],
    freqs: list[int],
    target_vocab: int = UNI_TARGET_VOCAB,
    em_iters: int = UNI_EM_ITERS,
) -> pd.DataFrame:
    """Driver-side unigram training over the bounded word-frequency
    table: substring seed vocabulary → Viterbi hard-EM iterations with
    (count desc, piece asc) pruning toward ``target_vocab``.  Single
    chars are never pruned (coverage guarantee)."""
    import math

    # 1. seed: every substring up to UNI_SEED_MAX_LEN, weighted by freq
    seed: dict[str, int] = {}
    for w, f in zip(words, freqs):
        f = int(f)
        for i in range(len(w)):
            for j in range(i + 1, min(i + UNI_SEED_MAX_LEN, len(w)) + 1):
                p = w[i:j]
                seed[p] = seed.get(p, 0) + f
    singles = sorted({p for p in seed if len(p) == 1})
    multis = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(UNI_SEED_CAP - len(singles), 0)]
    counts: dict[str, int] = {p: seed[p] for p in singles}
    counts.update(dict(multis))

    def _probs(c: dict[str, int]) -> dict[str, float]:
        total = float(sum(c.values()))
        return {p: math.log(n / total) for p, n in c.items() if n > 0}

    lp = _probs(counts)
    for it in range(em_iters):
        # E-step (hard): count piece uses along each word's best path
        used: dict[str, int] = {}
        for w, f in zip(words, freqs):
            pieces, _ = _viterbi_segment(w, lp)
            for p in pieces:
                used[p] = used.get(p, 0) + int(f)
        # M-step + prune: keep every single char (even unused, count 0),
        # shrink multi-char pieces toward the target under the
        # deterministic (count desc, piece asc) order
        n_multi_keep = max(target_vocab - len(singles), 0)
        if it < em_iters - 1:
            cur = sum(1 for p in used if len(p) > 1)
            n_multi_keep = max(n_multi_keep, int(cur * UNI_PRUNE_KEEP_FRAC))
        kept_multi = sorted(
            ((p, c) for p, c in used.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:n_multi_keep]
        counts = {p: used.get(p, 0) for p in singles}
        counts.update(dict(kept_multi))
        lp = _probs(counts)

    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "piece_rank": pd.Series(range(len(rows)), dtype="int64"),
            "piece": pd.Series([p for p, _ in rows], dtype=object),
            "n_uses": pd.Series([c for _, c in rows], dtype="int64"),
            "logprob": pd.Series(
                [round(lp.get(p, UNI_UNK_LOGPROB), 6) for p, _ in rows],
                dtype="float64",
            ),
        }
    )


def unigram_train(sf_dir: str) -> pd.DataFrame:
    """Distributed word count → driver EM loop (module section above)."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    wf = word_freq_distributed(ds)
    return unigram_vocab_from_wordfreq(wf["token"].tolist(), wf["n"].tolist())


def unigram_train_flat(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process twin for the oracle."""
    wf = word_freq_flat(df)
    return unigram_vocab_from_wordfreq(wf["token"].tolist(), wf["n"].tolist())


class UnigramEncoder:
    """Actor-pool encode stage: the piece log-prob table is actor state
    (loaded once per worker), with a per-actor word→(n_pieces, logprob)
    memo (Zipf).  Output per doc: word/piece counts, compression ratio,
    and the summed best-path log-likelihood (a tokenizer-level quality
    score)."""

    def __init__(self, vocab_json: str | None = None, id_col: str = "doc_id") -> None:
        import json

        self.lp: dict[str, float] = dict(json.loads(vocab_json or "{}"))
        self.id_col = id_col
        self.memo: dict[str, tuple[int, float]] = {}

    def _word(self, w: str) -> tuple[int, float]:
        v = self.memo.get(w)
        if v is None:
            pieces, score = _viterbi_segment(w, self.lp)
            v = (len(pieces), score)
            self.memo[w] = v
        return v

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        s = df["text"].fillna("").str.strip().str.lower()
        n_words = np.zeros(len(df), dtype=np.int64)
        n_pieces = np.zeros(len(df), dtype=np.int64)
        logprob = np.zeros(len(df), dtype=np.float64)
        for i, text in enumerate(s):
            if not text:
                continue
            toks = _WS.split(text)
            n_words[i] = len(toks)
            np_i = 0
            lp_i = 0.0
            for w in toks:
                k, sc = self._word(w)
                np_i += k
                lp_i += sc
            n_pieces[i] = np_i
            logprob[i] = lp_i
        ratio = np.where(n_words > 0, n_pieces / np.maximum(n_words, 1), 0.0)
        return pa.Table.from_pydict(
            {
                self.id_col: pa.array(df[self.id_col].to_numpy("int64")),
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
                "uni_ratio": pa.array(np.round(ratio, 6)),
                "uni_logprob": pa.array(np.round(logprob, 6)),
            }
        )


def unigram_encode_docs(sf_dir: str) -> rd.Dataset:
    """Train the unigram vocab (distributed word count → driver EM),
    then Viterbi-encode every document with a UnigramEncoder actor
    pool."""
    import json
    import os

    vocab = unigram_train(sf_dir)
    lp = dict(zip(vocab["piece"], (float(x) for x in vocab["logprob"])))
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        UnigramEncoder,
        fn_constructor_kwargs={"vocab_json": json.dumps(lp)},
        batch_format="pandas",
        concurrency=(1, 8),
    )


def unigram_encode_flat(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process twin of ``unigram_encode_docs`` for the oracle."""
    import json

    vocab = unigram_train_flat(df)
    lp = dict(zip(vocab["piece"], (float(x) for x in vocab["logprob"])))
    enc = UnigramEncoder(vocab_json=json.dumps(lp))
    out = enc(df).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


# ---------------------------------------------------------------------------
# Tokenizer fertility evaluation (pieces per word, by language)
# ---------------------------------------------------------------------------

_FERTILITY_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("n_docs", pa.int64()),
        ("n_words", pa.int64()),
        ("n_pieces", pa.int64()),
        ("fertility", pa.float64()),
    ]
)


def tokenizer_fertility_by_lang(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Tokenizer-quality evaluation: per language, corpus totals of
    words and unigram-LM pieces plus the fertility ratio (pieces per
    word) — the standard check that a trained tokenizer serves every
    language fairly before committing a vocab to a training run
    (high-fertility languages burn context length).

    Composition: the unigram Viterti-encode actor stage supplies per-doc
    ``(n_words, n_pieces)``; a bucketed hash join attaches the
    documents' ``lang``; per-batch integer partials fold per language
    (bounded cardinality).  Fertility is ONE float division of two exact
    int64 sums — bit-stable across partitionings (the integer-reduction
    rule, stages/ml.py).

    SQL-checked: DuckDB joins the flat single-process encode parquet
    against the ``documents`` view and re-derives the same sums.
    """
    import os

    from ..stages.dedup import stable_bucket_ids
    from ..stages.joins import bucketed_hash_join

    enc = unigram_encode_docs(sf_dir).select_columns(
        ["doc_id", "n_words", "n_pieces"]
    )
    langs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    joined = bucketed_hash_join(enc, langs, on="doc_id", how="inner")

    _PART_SCHEMA = pa.schema(
        [
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("n_words", pa.int64()),
            ("n_pieces", pa.int64()),
        ]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        out = (
            df.assign(n_docs=1)
            .groupby("lang", as_index=False, sort=False)
            .agg(
                n_docs=("n_docs", "sum"),
                n_words=("n_words", "sum"),
                n_pieces=("n_pieces", "sum"),
            )
        )
        pt = pa.Table.from_pandas(out, schema=_PART_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(pt["lang"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _FERTILITY_SCHEMA.empty_table()
        out = g.groupby("lang", as_index=False, sort=False)[
            ["n_docs", "n_words", "n_pieces"]
        ].sum()
        words = out["n_words"].to_numpy(dtype=np.int64)
        pieces = out["n_pieces"].to_numpy(dtype=np.int64)
        fert = np.where(words > 0, pieces / np.maximum(words, 1), 0.0)
        out["fertility"] = fert
        return pa.Table.from_pandas(
            out, schema=_FERTILITY_SCHEMA, preserve_index=False
        )

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )
