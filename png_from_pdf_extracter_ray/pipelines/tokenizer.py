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

import pandas as pd
import pyarrow as pa

import ray.data as rd

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
