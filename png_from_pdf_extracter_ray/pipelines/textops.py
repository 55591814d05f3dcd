"""Text-analysis pipelines over the ``documents`` table (driver testdata).

Thin compositions of the stages in ``stages/text_stats.py`` and
``stages/similarity.py`` — each mirrors an ``oracle_sql()`` entry (or is
explicitly rows-only for non-SQL-expressible ops).
"""

from __future__ import annotations

import os

import pandas as pd

import ray.data as rd

from ..stages.similarity import ann_topk_lsh, cosine_topk, load_query_vector
from ..stages.text_stats import (
    LangId,
    RollingFingerprint,
    md5_fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pandas"
    ).select_columns(["doc_id", "n_tokens"])


def quality_scores(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pandas"
    ).select_columns(["doc_id", "text_len", "n_punct", "punct_ratio"])


def md5_fingerprints(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        md5_fingerprint_batch, batch_format="pandas"
    ).select_columns(["doc_id", "fp"])


def rolling_fingerprints(sf_dir: str) -> rd.Dataset:
    """Rolling-hash fingerprint (non-SQL — rows-only oracle)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        RollingFingerprint, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "rolling_fp"])


def langid_heuristic(sf_dir: str) -> rd.Dataset:
    """N-gram/stopword language ID (non-SQL — rows-only oracle)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


def similarity_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk(ds, load_query_vector(sf_dir, 0), k=k)


def similarity_topk_lsh(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """LSH-bucketed ANN (approximate — rows-only oracle)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ann_topk_lsh(ds, load_query_vector(sf_dir, 0), k=k, n_planes=6)
