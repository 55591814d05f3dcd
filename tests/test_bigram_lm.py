"""Edge cases of the bigram-LM kernels (pipelines/corpus_stats.py) —
corpus-level SQL parity lives in test_queries_vs_duckdb.py."""

from __future__ import annotations

import pandas as pd

from png_from_pdf_extracter_ray.pipelines.corpus_stats import _bigram_partials


def test_bigram_partials_basic() -> None:
    df = pd.DataFrame({"text": ["a b a b", "b a"]})
    out = _bigram_partials(df).set_index("bigram")["n"].to_dict()
    # doc1: "a b","b a","a b"; doc2: "b a"
    assert out == {"a b": 2, "b a": 2}


def test_bigram_partials_no_cross_document_pairs() -> None:
    # last token of doc1 and first token of doc2 must NOT form a bigram
    df = pd.DataFrame({"text": ["x y", "z w"]})
    out = _bigram_partials(df).set_index("bigram")["n"].to_dict()
    assert out == {"x y": 1, "z w": 1}
    assert "y z" not in out


def test_bigram_partials_short_and_empty_docs() -> None:
    df = pd.DataFrame({"text": ["solo", "", None, "  ", "two words"]})
    out = _bigram_partials(df).set_index("bigram")["n"].to_dict()
    assert out == {"two words": 1}


def test_bigram_partials_normalizes_case_and_whitespace() -> None:
    df = pd.DataFrame({"text": ["  Foo   BAR  "]})
    out = _bigram_partials(df).set_index("bigram")["n"].to_dict()
    assert out == {"foo bar": 1}
