"""Edge cases of the Gopher composite quality kernel
(stages/text_stats.gopher_stats_batch); corpus-level SQL parity lives in
test_queries_vs_duckdb.py."""

from __future__ import annotations

import pandas as pd

from png_from_pdf_extracter_ray.stages.text_stats import (
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_TOKENS,
    STOPWORDS,
    gopher_stats_batch,
)


def _one(text: str) -> pd.Series:
    return gopher_stats_batch(pd.DataFrame({"text": [text]})).iloc[0]


def test_blank_doc_rejected_with_zero_stats() -> None:
    for blank in ["", "   ", None]:
        r = gopher_stats_batch(pd.DataFrame({"text": [blank]})).iloc[0]
        assert (r.n_tokens, r.mean_token_chars, r.alpha_frac, r.n_stop, r.keep) == (
            0,
            0.0,
            0.0,
            0,
            0,
        )


def test_good_doc_kept() -> None:
    words = (STOPWORDS[:3] + ["quick", "brown", "foxes", "jumped"]) * 10
    r = _one(" ".join(words))
    assert r.n_tokens == len(words) >= GOPHER_MIN_TOKENS
    assert r.n_stop >= GOPHER_MIN_STOPWORDS
    assert r.keep == 1


def test_short_doc_rejected() -> None:
    r = _one("the and short doc")
    assert r.n_tokens < GOPHER_MIN_TOKENS and r.keep == 0


def test_non_alpha_doc_rejected() -> None:
    # enough tokens and stopwords, but mostly numeric tokens
    words = STOPWORDS[:2] + ["123"] * 60
    r = _one(" ".join(words))
    assert r.alpha_frac < 0.8 and r.keep == 0


def test_long_words_rejected_by_mean_chars() -> None:
    words = STOPWORDS[:2] + ["x" * 30] * 60
    r = _one(" ".join(words))
    assert r.mean_token_chars > 10.0 and r.keep == 0


def test_stats_are_per_row_vectorized() -> None:
    df = pd.DataFrame({"text": ["a b c", "", "the and of it " * 20]})
    out = gopher_stats_batch(df)
    assert out["n_tokens"].tolist() == [3, 0, 80]
    assert out["n_stop"].tolist() == [0, 0, 80]
