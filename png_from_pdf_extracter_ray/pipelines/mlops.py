"""Query wrappers for the ML-operator family (stages/ml.py, stages/pq.py,
pipelines/tokenizer.py) — one callable per __ray_entry__ queries() entry.

Each operator is batch-invariant by construction (integer reductions —
see the stage docstrings), so each is SQL-checked against a flat no-Ray
recompute parquet (pipelines/rowsonly_oracles.py)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

KMEANS_K = 8
KMEANS_ITERS = 4
KMEANS_SAMPLE = 512
PQ_M = 8
PQ_KS = 16
PQ_SAMPLE = 1024


def _embeddings(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def kmeans_doc_clusters(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> rd.Dataset:
    """Distributed spherical k-means over the full embedding table:
    driver init on a bounded deterministic sample, ``iters`` map-reduce
    Lloyd iterations (integer-exact partials), one labeling pass.
    Output: (vec_id, cluster) Dataset, N-sized."""
    from ..stages.ml import kmeans_fit, kmeans_labels

    # materialize once: the sample pass + every Lloyd iteration + the
    # label pass would otherwise each re-read the parquet (iterative
    # consumers are the one case where caching the input blocks pays)
    ds = _embeddings(sf_dir).materialize()
    cent = kmeans_fit(ds, k=k, iters=iters, target_sample=KMEANS_SAMPLE)
    return kmeans_labels(ds, cent)


def embedding_outlier_scores(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS, k_out: int = 50
) -> pd.DataFrame:
    """Bottom-k_out embeddings by best-centroid similarity under the
    SAME k-means fit as :func:`kmeans_doc_clusters` — the "no cluster
    explains this point" curation signal (mislabeled/noise docs).  The
    score is the exact int64 assignment dot product, so distributed ≡
    flat is by construction."""
    from ..stages.ml import kmeans_fit, kmeans_outlier_scores

    ds = _embeddings(sf_dir).materialize()
    cent = kmeans_fit(ds, k=k, iters=iters, target_sample=KMEANS_SAMPLE)
    return kmeans_outlier_scores(ds, cent, k_out=k_out)


def similarity_topk_pq(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """PQ-compressed ANN top-k (stages/pq.py): codebooks trained on the
    deterministic hash-threshold sample, ADC scoring per batch."""
    from ..stages.ml import _unit_rows
    from ..stages.pq import pq_topk, pq_train
    from ..stages.semdedup import deterministic_sample_matrix
    from ..stages.similarity import load_query_vector

    ds = _embeddings(sf_dir)
    sample = deterministic_sample_matrix(ds, "vec_id", "embedding", target=PQ_SAMPLE)
    if sample.size == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    books = pq_train(_unit_rows(sample), m=PQ_M, ks=PQ_KS)
    return pq_topk(ds, load_query_vector(sf_dir, 0), books, k=k)


def ridge_quality_model(sf_dir: str) -> rd.Dataset:
    """One-pass distributed ridge fit (integer normal equations) +
    stateless prediction pass.  Output: (doc_id, n_chars, y_hat, resid)
    per document."""
    from ..stages.ml import ridge_fit, ridge_predict

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )
    beta = ridge_fit(ds)
    return ridge_predict(ds, beta)


def bpe_train_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer-merge training (pipelines/tokenizer.py):
    distributed capped word-frequency table → driver merge loop.
    Output: (rank, left, right, freq) merge table."""
    from .tokenizer import bpe_train

    return bpe_train(sf_dir)


def bpe_encode_docs(sf_dir: str) -> rd.Dataset:
    """Apply the trained BPE merges to every document via the
    BpeEncoder actor pool (pipelines/tokenizer.py).  Output:
    (doc_id, n_words, n_bpe_tokens, bpe_ratio)."""
    from .tokenizer import bpe_encode_docs as _encode

    return _encode(sf_dir)


def pca_doc_projections(sf_dir: str, p: int = 4) -> rd.Dataset:
    """Distributed PCA (stages/ml.py): one integer-moment pass → driver
    eigh → stateless projection.  Output: (vec_id, pc0..pc{p-1})."""
    from ..stages.ml import pca_fit, pca_project

    ds = _embeddings(sf_dir)
    axes = pca_fit(ds, p=p)
    return pca_project(ds, axes)


def similarity_topk_ivfpq(sf_dir: str, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """IVF-PQ ANN (stages/pq.py): coarse cells + residual PQ codes —
    the composed billion-scale index shape."""
    from ..stages.ml import _unit_rows
    from ..stages.pq import ivfpq_topk, ivfpq_train
    from ..stages.semdedup import deterministic_sample_matrix
    from ..stages.similarity import load_query_vector

    ds = _embeddings(sf_dir)
    sample = deterministic_sample_matrix(ds, "vec_id", "embedding", target=PQ_SAMPLE)
    if sample.size == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    cent, books = ivfpq_train(_unit_rows(sample), n_cells=16, m=PQ_M, ks=PQ_KS)
    return ivfpq_topk(ds, load_query_vector(sf_dir, 0), cent, books, k=k, nprobe=nprobe)


def unigram_train_vocab(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training
    (pipelines/tokenizer.py): distributed capped word-frequency table →
    driver substring seeding + Viterbi hard-EM + pruning.  Output:
    (piece_rank, piece, n_uses, logprob)."""
    from .tokenizer import unigram_train

    return unigram_train(sf_dir)


def unigram_encode_docs(sf_dir: str) -> rd.Dataset:
    """Viterbi-encode every document under the trained unigram vocab
    via the UnigramEncoder actor pool (pipelines/tokenizer.py).
    Output: (doc_id, n_words, n_pieces, uni_ratio, uni_logprob)."""
    from .tokenizer import unigram_encode_docs as _encode

    return _encode(sf_dir)


SQ8_SCHEMA = pa.schema([("vec_id", pa.int64()), ("q_md5", pa.string())])


def sq8_quantize(mat: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-dimension scalar quantization to uint8 — elementwise float64
    arithmetic with no accumulation, so any partitioning produces the
    identical bytes (the oracle twin runs this same kernel flat).
    Constant dimensions (hi == lo) quantize to 0."""
    span = (hi - lo).astype(np.float64)
    span[span == 0.0] = 1.0
    q = np.round((mat.astype(np.float64) - lo) / span * 255.0)
    return np.clip(q, 0.0, 255.0).astype(np.uint8)


def embedding_sq8_digest(sf_dir: str) -> pd.DataFrame:
    """SQ8 index-export check: quantize every embedding to per-dimension
    uint8 (the scalar-quantized ANN index format) and emit each vector's
    md5 over the quantized bytes — the digest a serving tier verifies
    after shipping the index.  Two streaming passes:

    1. per-dimension (min, max) bounds — per-batch partial bound rows
       (2 × d floats each) folded on the driver (min/max folds are
       order-independent and exact, so distributed ≡ flat);
    2. a stateless quantize+md5 map with the bounds broadcast via
       ``ray.put``.

    The per-element float arithmetic has no accumulation, so the bytes
    (and digests) are bit-identical between the engine and the flat
    oracle twin regardless of batching."""
    from ..stages.similarity import _stack
    from .relational import _cached_broadcast

    ds = _embeddings(sf_dir).materialize()  # two consumers

    bound_rows = ds.map_batches(
        lambda t: pa.table(
            {
                "lo": [_stack(t["embedding"]).min(axis=0).tolist()],
                "hi": [_stack(t["embedding"]).max(axis=0).tolist()],
            }
        )
        if t.num_rows
        else pa.table({"lo": pa.array([], pa.list_(pa.float64())), "hi": pa.array([], pa.list_(pa.float64()))}),
        batch_format="pyarrow",
    ).to_pandas()
    if bound_rows.empty:
        return SQ8_SCHEMA.empty_table().to_pandas()
    lo = np.minimum.reduce([np.asarray(v, np.float32) for v in bound_rows["lo"]])
    hi = np.maximum.reduce([np.asarray(v, np.float32) for v in bound_rows["hi"]])
    bref = ray.put((lo, hi))

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        blo, bhi = _cached_broadcast(bref)
        mat = _stack(t["embedding"])
        if mat.size == 0:
            return SQ8_SCHEMA.empty_table()
        q = sq8_quantize(mat, blo, bhi)
        md5s = [hashlib.md5(row.tobytes()).hexdigest() for row in q]
        return pa.Table.from_pydict(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "q_md5": pa.array(md5s, pa.string()),
            },
            schema=SQ8_SCHEMA,
        )

    out = ds.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id", ignore_index=True)
