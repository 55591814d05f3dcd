"""Product-quantization ANN (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search", IEEE TPAMI 33(1)) — the embedding-
COMPRESSION scale path of the similarity family.

The vector column is split into ``m`` subspaces; each subspace gets a
``ks``-centroid codebook trained on a bounded deterministic sample
(driver-side Lloyd, same sampling protocol as IVF/SemDeDup).  A row is
then ``m`` uint8 codes (64-float32 vector → 8 bytes: 32× smaller), and
query scoring is an asymmetric-distance (ADC) lookup: one (m, ks) table
of query·centroid inner products, one gather-sum per row — no full
matmul against the corpus.

Scale shape: codebooks broadcast once via ``ray.put``; encode + ADC are
one stateless ``map_batches`` with a per-batch top-k prune sharing the
final sort's total order (the cosine_topk pattern) — no shuffle beyond
the k-row collect.  At 100 TB the codes become the STORED index (8
bytes/row instead of 256) and the raw vectors never leave cold storage
after encoding.

Batch-invariance: encoding argmins run on FIXED-POINT integer distances
(inputs quantized to ``ENC_SCALE``), because a float32 BLAS matmul can
differ in the last bit between batch shapes and a flipped argmin at a
near-tie would change a code visibly.  Integer distances make
engine-vs-flat-oracle equality hold by construction; the float ADC sum
is per-row over a fixed m-term order, so it is batch-shape-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .ml import _quantize, _unit_rows

ENC_SCALE = 1 << 10  # fixed-point scale for integer encode distances


def kmeans_l2(
    x: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic plain-L2 Lloyd (the subspace quantizer — unlike
    stages/similarity.kmeans_centroids it must NOT normalize, a
    subvector's norm carries signal).  Empty clusters keep their
    previous centroid; runs on the driver over a bounded sample."""
    rng = np.random.default_rng(seed)
    x = x.astype(np.float32)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d2 = (
            (x**2).sum(axis=1, keepdims=True)
            - 2.0 * (x @ cent.T)
            + (cent**2).sum(axis=1)
        )
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(
    sample_unit: np.ndarray, m: int = 8, ks: int = 16, seed: int = 42
) -> np.ndarray:
    """(m, ks_eff, d/m) float32 codebooks from a row-normalized sample.
    ``ks_eff = min(ks, n_sample)``: a sample smaller than ks trains a
    smaller (still valid) codebook instead of crashing — engine and
    flat oracle share this function, so both shrink identically."""
    n, d = sample_unit.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ks_eff = min(ks, n)
    dsub = d // m
    books = np.empty((m, ks_eff, dsub), dtype=np.float32)
    for j in range(m):
        books[j] = kmeans_l2(
            sample_unit[:, j * dsub : (j + 1) * dsub], ks_eff, seed=seed + j
        )
    return books


def pq_encode(unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes via exact integer L2 argmin per subspace."""
    m, ks, dsub = books.shape
    codes = np.empty((len(unit), m), dtype=np.uint8)
    for j in range(m):
        sq = _quantize(unit[:, j * dsub : (j + 1) * dsub], ENC_SCALE)
        cq = _quantize(books[j], ENC_SCALE)
        d2 = (
            (sq**2).sum(axis=1, keepdims=True)
            - 2 * (sq @ cq.T)
            + (cq**2).sum(axis=1)
        )  # int64 — exact
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Σ_j lut[j, code_j] per row — float32 gather-sum over a fixed
    m-term order (batch-shape-independent)."""
    m = codes.shape[1]
    return lut[np.arange(m), codes.astype(np.int64)].sum(axis=1)


def pq_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ADC top-k: encode each batch, score via the broadcast LUT, prune
    to k rows per batch on the SAME total order as the final sort and
    the oracle — (rounded score desc, id asc), the cosine_topk rule."""
    from ..pipelines.relational import _cached_broadcast
    from .similarity import _ids_np, _stack

    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    m, ks, dsub = books.shape
    lut = np.einsum(
        "mkd,md->mk", books, qn.reshape(m, dsub), dtype=np.float32
    ).astype(np.float32)
    bref = ray.put(books)
    lref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        b = _cached_broadcast(bref)
        table = _cached_broadcast(lref)
        mat = _stack(batch[vec_col])
        if mat.size == 0:
            return pa.Table.from_pydict(
                {id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        codes = pq_encode(_unit_rows(mat), b)
        s = adc_scores(codes, table)
        r = np.round(s.astype(np.float64), 3)
        ids = _ids_np(batch[id_col])
        order = np.lexsort((ids, -r))[:k]
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "score": pa.array(r[order]),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k).to_pandas()


def pq_topk_flat(
    ids: np.ndarray,
    mat: np.ndarray,
    query: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Single-process twin of ``pq_topk`` (same integer encode, same
    LUT, same total order)."""
    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    m, ks, dsub = books.shape
    lut = np.einsum(
        "mkd,md->mk", books, qn.reshape(m, dsub), dtype=np.float32
    ).astype(np.float32)
    codes = pq_encode(_unit_rows(mat), books)
    r = np.round(adc_scores(codes, lut).astype(np.float64), 3)
    out = (
        pd.DataFrame({id_col: ids, "score": r})
        .sort_values([ "score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + PQ on residuals (the standard composed
# billion-scale index — Jégou et al. 2011 §IV; FAISS IVFPQ shape)
# ---------------------------------------------------------------------------


def ivfpq_train(
    sample_unit: np.ndarray, n_cells: int = 16, m: int = 8, ks: int = 16, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """(coarse centroids, residual codebooks) from a normalized sample.
    The coarse quantizer is the existing spherical k-means; the PQ books
    are trained on the sample's RESIDUALS to its assigned centroids —
    residuals are far smaller than raw vectors, so the same ks covers
    them much more finely (the point of the composition)."""
    from .ml import ASSIGN_SCALE, _quantize, assign_clusters_int
    from .similarity import kmeans_centroids

    cent = kmeans_centroids(sample_unit, n_cells=n_cells)
    cells = assign_clusters_int(sample_unit, _quantize(cent, ASSIGN_SCALE))
    resid = sample_unit - cent[cells]
    return cent, pq_train(resid, m=m, ks=ks, seed=seed)


def ivfpq_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    cent: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ADC search over residual codes in the ``nprobe`` cells nearest
    the query: score ≈ q·c_cell + Σ_j lut[j, code_j].  Per batch: one
    integer cell assignment, residual encode of surviving rows, LUT
    gather — candidate cost drops ~n_cells/nprobe× AND each candidate
    costs m lookups instead of a d-dot."""
    from ..pipelines.relational import _cached_broadcast
    from .ml import ASSIGN_SCALE, _quantize, _unit_rows, assign_clusters_int
    from .similarity import _ids_np, _stack

    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    m, ks, dsub = books.shape
    lut = np.einsum("mkd,md->mk", books, qn.reshape(m, dsub)).astype(np.float32)
    cdot = (cent @ qn).astype(np.float64)  # q·centroid per cell (driver)
    probe = np.sort(np.argsort(-cdot)[:nprobe])
    cent_q = _quantize(cent, ASSIGN_SCALE)
    refs = {
        "cent_q": ray.put(cent_q),
        "books": ray.put(books),
        "lut": ray.put(lut),
        "cdot": ray.put(cdot),
        "probe": ray.put(probe),
    }

    # the worker needs the FLOAT centroids for residuals as well as the
    # quantized ones for assignment — ship both
    cref_f = ray.put(cent.astype(np.float32))

    def score(batch: pa.Table) -> pa.Table:
        cq = _cached_broadcast(refs["cent_q"])
        cf = _cached_broadcast(cref_f)
        b = _cached_broadcast(refs["books"])
        table = _cached_broadcast(refs["lut"])
        cd = _cached_broadcast(refs["cdot"])
        pr = _cached_broadcast(refs["probe"])
        mat = _stack(batch[vec_col])
        empty = pa.Table.from_pydict(
            {id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
        if mat.size == 0:
            return empty
        unit = _unit_rows(mat)
        cells = assign_clusters_int(unit, cq)
        mask = np.isin(cells, pr)
        if not mask.any():
            return empty
        sub = unit[mask]
        sub_cells = cells[mask]
        codes = pq_encode(sub - cf[sub_cells], b)
        s = cd[sub_cells] + adc_scores(codes, table).astype(np.float64)
        r = np.round(s, 3)
        ids = _ids_np(batch[id_col])[mask]
        order = np.lexsort((ids, -r))[:k]
        return pa.Table.from_pydict(
            {id_col: pa.array(ids[order], pa.int64()), "score": pa.array(r[order])}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    out = scored.sort(["score", id_col], descending=[True, False]).limit(k).to_pandas()
    if out.empty and list(out.columns) != [id_col, "score"]:
        out = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                            "score": pd.Series([], dtype="float64")})
    return out


def ivfpq_topk_flat(
    ids: np.ndarray,
    mat: np.ndarray,
    query: np.ndarray,
    cent: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Single-process twin of ``ivfpq_topk``."""
    from .ml import ASSIGN_SCALE, _quantize, _unit_rows, assign_clusters_int

    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    m, ks, dsub = books.shape
    lut = np.einsum("mkd,md->mk", books, qn.reshape(m, dsub)).astype(np.float32)
    cdot = (cent @ qn).astype(np.float64)
    probe = np.sort(np.argsort(-cdot)[:nprobe])
    unit = _unit_rows(mat)
    cells = assign_clusters_int(unit, _quantize(cent, ASSIGN_SCALE))
    mask = np.isin(cells, probe)
    if not mask.any():
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    sub_cells = cells[mask]
    codes = pq_encode(unit[mask] - cent.astype(np.float32)[sub_cells], books)
    s = cdot[sub_cells] + adc_scores(codes, lut).astype(np.float64)
    r = np.round(s, 3)
    return (
        pd.DataFrame({id_col: ids[mask], "score": r})
        .sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
