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


def _tmp_docs(tmp_path, texts):  # noqa: ANN001
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_pmi_collocations_hand_computed(ray_session, tmp_path) -> None:  # noqa: ANN001
    import math

    from png_from_pdf_extracter_ray.pipelines.corpus_stats import pmi_collocations

    # tokens: a x3, b x2, c x1 (N_tok=6); bigrams: "a b" x2, "a c" x1 (N_big=3)
    # pmi(a b) = ln(2*36/(3*3*2)) = ln 4; pmi(a c) = ln(1*36/(3*3*1)) = ln 4
    # -> an exact PMI tie, ordered by bigram asc
    sf = _tmp_docs(tmp_path, ["a b", "a b", "a c"])
    out = pmi_collocations(sf, min_count=1, k=10)
    assert out["bigram"].tolist() == ["a b", "a c"]
    assert out["n"].tolist() == [2, 1]
    assert out["pmi"].tolist() == [round(math.log(4.0), 6)] * 2


def test_pmi_collocations_min_count_cut(ray_session, tmp_path) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import pmi_collocations

    sf = _tmp_docs(tmp_path, ["a b", "a b", "a c"])
    out = pmi_collocations(sf, min_count=2, k=10)
    assert out["bigram"].tolist() == ["a b"]


def test_pmi_collocations_empty_corpus(ray_session, tmp_path) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import pmi_collocations

    sf = _tmp_docs(tmp_path, ["", "   ", "solo"])
    out = pmi_collocations(sf, min_count=1, k=10)
    assert len(out) == 0
    assert list(out.columns) == ["bigram", "n", "pmi"]
