"""Distributed ML primitives over Arrow batches.

Two operators a training-data pipeline needs beyond dedup/ANN:

- **Distributed spherical k-means** (``kmeans_fit`` / ``kmeans_labels``)
  — the iterative-algorithm class.  Every Lloyd iteration is ONE
  ``map_batches`` pass emitting k mergeable partial rows per batch
  (integer-quantized per-cluster sums + counts); the driver folds a
  k×(d+1)-sized table and re-broadcasts the centroids.  Nothing
  corpus-sized ever reaches the driver and there is no shuffle at all —
  the all-reduce is partial-rows → tiny collect → ``ray.put``, the same
  shape a parameter server would take on a real cluster.

- **One-pass ridge regression** (``ridge_fit`` / ``ridge_predict``) —
  the supervised-model-fit class.  The normal equations' sufficient
  statistics (XᵀX, Xᵀy, n) are integer-exact mergeable partials (the
  features are token/char counts), so the fit is a single streaming
  pass + a 5×5 driver solve; prediction is one more stateless pass.

Batch-invariance (what makes both SQL-checkable against a flat no-Ray
recompute): every floating-point reduction that crosses batch
boundaries is replaced by an INTEGER one.

- k-means assignments use integer dot products — unit rows and
  centroids are quantized to ``ASSIGN_SCALE`` fixed-point before the
  matmul, so argmax ties break identically no matter how rows are
  batched (a float32 BLAS matmul can differ in the last bit between
  batch shapes, and one flipped boundary assignment would cascade
  through every later iteration);
- per-cluster centroid sums quantize each unit row to ``SUM_SCALE``
  fixed-point int64 *per row* and sum integers — associative and
  order-independent, unlike float sums.

Envelope: int64 holds ``SUM_SCALE``-quantized component sums up to
~2^63/2^20 ≈ 8·10^12 rows per cluster and XᵀX count-product sums up to
~10^18 — beyond that, shard the partials by a secondary key and widen
on the driver.  No reference analog (the reference has no ML surface;
our addition per the training-data-pipeline brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

# Fixed-point scales (part of the operator contract — shared by the Ray
# path and the flat oracles; changing either changes results).
ASSIGN_SCALE = 1 << 10  # unit-vector quantization for argmax assignment
SUM_SCALE = 1 << 20  # unit-vector quantization for centroid sums


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    """Row-normalize (zero rows stay zero), float32 — per-row op, so it
    can never depend on batch boundaries."""
    m = mat.astype(np.float32)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _quantize(mat: np.ndarray, scale: int) -> np.ndarray:
    """Per-row fixed-point quantization (float64 rounding, int64 out)."""
    return np.round(mat.astype(np.float64) * scale).astype(np.int64)


def assign_clusters_int(unit: np.ndarray, cent_q: np.ndarray) -> np.ndarray:
    """Exact integer-arithmetic cluster assignment.

    ``cent_q`` is the ASSIGN_SCALE-quantized centroid matrix; each row's
    score vector is an int64 dot product, so the argmax (first-max tie
    break) is bit-identical between any batching and the flat oracle.
    """
    uq = _quantize(unit, ASSIGN_SCALE)
    scores = uq @ cent_q.T  # int64 matmul — exact
    return np.argmax(scores, axis=1).astype(np.int32)


def _fold_partials(
    acc_sum: np.ndarray, acc_n: np.ndarray, clusters: np.ndarray, qsums: np.ndarray, counts: np.ndarray
) -> None:
    # np.add.at, not fancy-index +=: one fold call sees the same cluster
    # from many partial rows, and += silently drops the duplicates
    np.add.at(acc_sum, clusters, qsums)
    np.add.at(acc_n, clusters, counts)


def kmeans_fit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
    target_sample: int = 512,
) -> np.ndarray:
    """Distributed spherical k-means: driver init on a deterministic
    bounded sample, then ``iters`` map-reduce Lloyd iterations over the
    FULL dataset (module docstring).  Returns (k, d) float32 centroids.
    """
    from .semdedup import deterministic_sample_matrix
    from .similarity import _stack, kmeans_centroids

    sample = deterministic_sample_matrix(ds, id_col, vec_col, target=target_sample)
    if sample.size == 0:
        return np.empty((0, 0), dtype=np.float32)
    cent = kmeans_centroids(sample, n_cells=k)
    k_eff, d = cent.shape

    from ..pipelines.relational import _cached_broadcast

    for _ in range(iters):
        cent_q = _quantize(cent, ASSIGN_SCALE)
        cref = ray.put(cent_q)

        def partial(batch: pa.Table) -> pa.Table:
            cq = _cached_broadcast(cref)
            mat = _stack(batch[vec_col])
            if mat.size == 0:
                return pa.Table.from_pydict(
                    {
                        "cluster": pa.array([], pa.int32()),
                        "qsum": pa.array([], pa.list_(pa.int64())),
                        "count": pa.array([], pa.int64()),
                    }
                )
            unit = _unit_rows(mat)
            a = assign_clusters_int(unit, cq)
            q = _quantize(unit, SUM_SCALE)
            sums = np.zeros((len(cq), q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=len(cq)).astype(np.int64)
            present = counts > 0
            idx = np.nonzero(present)[0]
            flat = sums[present].ravel()
            offs = np.arange(len(idx) + 1, dtype=np.int32) * q.shape[1]
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array(idx.astype(np.int32)),
                    "qsum": pa.ListArray.from_arrays(
                        pa.array(offs), pa.array(flat, pa.int64())
                    ),
                    "count": pa.array(counts[present], pa.int64()),
                }
            )

        # driver fold: k×(d+1)-sized integer sums per batch — order-
        # independent, so completion-order block delivery is harmless
        acc = np.zeros((k_eff, d), dtype=np.int64)
        ncl = np.zeros(k_eff, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            cl = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
            qs = np.asarray(b["qsum"].combine_chunks().flatten()).reshape(len(cl), d)
            cn = b["count"].to_numpy(zero_copy_only=False)
            _fold_partials(acc, ncl, cl, qs, cn)
        cent = centroids_from_sums(cent, acc, ncl)
    return cent


def centroids_from_sums(
    prev: np.ndarray, acc: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """New spherical centroids from exact integer sums; empty clusters
    keep their previous centroid (same rule as the driver-side Lloyd in
    stages/similarity.kmeans_centroids)."""
    cent = prev.copy()
    for c in np.nonzero(counts > 0)[0]:
        v = acc[c].astype(np.float64) / (SUM_SCALE * counts[c])
        n = np.linalg.norm(v)
        if n > 0:
            cent[c] = (v / n).astype(np.float32)
    return cent


def kmeans_labels(
    ds: rd.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Final assignment pass: one stateless map, N-sized Dataset out
    (collect only in test/oracle wrappers)."""
    from ..pipelines.relational import _cached_broadcast
    from .similarity import _stack

    cent_q = _quantize(centroids, ASSIGN_SCALE)
    cref = ray.put(cent_q)

    def assign(batch: pa.Table) -> pa.Table:
        cq = _cached_broadcast(cref)
        mat = _stack(batch[vec_col])
        if mat.size == 0:
            return pa.Table.from_pydict(
                {id_col: batch[id_col], "cluster": pa.array([], pa.int64())}
            )
        a = assign_clusters_int(_unit_rows(mat), cq)
        return pa.Table.from_pydict(
            {id_col: batch[id_col], "cluster": pa.array(a.astype(np.int64))}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_flat(
    ids: np.ndarray,
    mat: np.ndarray,
    k: int = 8,
    iters: int = 4,
    target_sample: int = 512,
) -> np.ndarray:
    """Single-process twin of ``kmeans_fit`` — same sample, same integer
    assignment, same integer sums (module docstring: the reductions are
    integer, so flat-vs-distributed equality is by construction)."""
    from .semdedup import flat_hash_sample
    from .similarity import kmeans_centroids

    sample = flat_hash_sample(ids, mat, target_sample)
    if sample.size == 0:
        return np.empty((0, 0), dtype=np.float32)
    cent = kmeans_centroids(sample, n_cells=k)
    unit = _unit_rows(mat)
    q = _quantize(unit, SUM_SCALE)
    for _ in range(iters):
        a = assign_clusters_int(unit, _quantize(cent, ASSIGN_SCALE))
        sums = np.zeros((len(cent), unit.shape[1]), dtype=np.int64)
        np.add.at(sums, a, q)
        counts = np.bincount(a, minlength=len(cent)).astype(np.int64)
        cent = centroids_from_sums(cent, sums, counts)
    return cent


def kmeans_labels_flat(
    ids: np.ndarray, mat: np.ndarray, centroids: np.ndarray, id_col: str = "vec_id"
) -> pd.DataFrame:
    a = assign_clusters_int(_unit_rows(mat), _quantize(centroids, ASSIGN_SCALE))
    return pd.DataFrame({id_col: ids, "cluster": a.astype(np.int64)}).sort_values(
        id_col, ignore_index=True
    )


def _outlier_scores_int(
    unit: np.ndarray, cent_q: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, sim_q) per row — the EXACT int64 best-centroid score
    assignment already maximizes; a LOW max score means the vector is
    far from every centroid (the embedding-space outlier signal)."""
    uq = _quantize(unit, ASSIGN_SCALE)
    scores = uq @ cent_q.T  # int64 matmul — exact
    a = np.argmax(scores, axis=1)
    return a.astype(np.int64), scores[np.arange(len(scores)), a]


def kmeans_outlier_scores(
    ds: rd.Dataset,
    centroids: np.ndarray,
    k_out: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Bottom-``k_out`` embeddings by best-centroid similarity — the
    "prune the points no cluster explains" curation op (the outlier
    mirror of SemDeDup's prune-the-too-similar).  The score is the same
    exact int64 quantized dot product the assignment uses, so the
    result is bit-identical to the flat twin under ANY batching.

    Ray shape: one stateless streaming scan (centroids broadcast via
    ``ray.put``); each batch keeps its LOCAL bottom-k and only k rows
    per batch reach the driver (a vector's score lives in exactly one
    batch, so the global bottom-k is a subset of the batch-local ones).
    """
    from ..pipelines.relational import _cached_broadcast
    from .similarity import _stack

    cent_q = _quantize(centroids, ASSIGN_SCALE)
    cref = ray.put(cent_q)
    schema = pa.schema(
        [(id_col, pa.int64()), ("cluster", pa.int64()), ("sim_q", pa.int64())]
    )

    def scan(batch: pa.Table) -> pa.Table:
        cq = _cached_broadcast(cref)
        mat = _stack(batch[vec_col])
        if mat.size == 0:
            return schema.empty_table()
        a, s = _outlier_scores_int(_unit_rows(mat), cq)
        out = pd.DataFrame(
            {
                id_col: np.asarray(batch[id_col].to_pylist(), dtype=np.int64),
                "cluster": a,
                "sim_q": s,
            }
        ).sort_values(["sim_q", id_col], ignore_index=True).head(k_out)
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty:
        return schema.empty_table().to_pandas()
    return (
        out.sort_values(["sim_q", id_col], ignore_index=True)
        .head(k_out)
        .reset_index(drop=True)
    )


def kmeans_outlier_scores_flat(
    ids: np.ndarray,
    mat: np.ndarray,
    centroids: np.ndarray,
    k_out: int = 50,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Single-process twin of :func:`kmeans_outlier_scores` (same
    quantization, same exact integer scores)."""
    a, s = _outlier_scores_int(_unit_rows(mat), _quantize(centroids, ASSIGN_SCALE))
    return (
        pd.DataFrame({id_col: ids.astype(np.int64), "cluster": a, "sim_q": s})
        .sort_values(["sim_q", id_col], ignore_index=True)
        .head(k_out)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Ridge regression via integer normal equations
# ---------------------------------------------------------------------------

RIDGE_LAMBDA = 1.0
# feature names in X column order (after the intercept)
RIDGE_FEATURES = ("n_tokens", "n_uniq_tokens", "n_punct", "n_digits")
_PUNCT_RE = r"[.,!?;:]"
_DIGIT_RE = r"[0-9]"


def doc_features(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(X, y): X = [1, n_tokens, n_uniq_tokens, n_punct, n_digits] per
    doc (all int64 — what makes the sufficient statistics exact), y =
    n_chars.  Token semantics match the text-stats oracles (trim →
    lower → split on whitespace; blank docs → 0 tokens).  Pure per-row
    pandas ops — batch-invariant, shared verbatim by the flat oracle."""
    s = df["text"].fillna("")
    stripped = s.str.strip().str.lower()
    toks = stripped.where(stripped != "", None).str.split(r"\s+")
    # blank docs come back NaN (not None) from str.split — type-check
    n_tok = toks.map(lambda t: len(t) if isinstance(t, list) else 0).to_numpy(np.int64)
    n_uniq = toks.map(lambda t: len(set(t)) if isinstance(t, list) else 0).to_numpy(np.int64)
    n_punct = s.str.count(_PUNCT_RE).to_numpy(np.int64)
    n_digit = s.str.count(_DIGIT_RE).to_numpy(np.int64)
    ones = np.ones(len(df), dtype=np.int64)
    x = np.column_stack([ones, n_tok, n_uniq, n_punct, n_digit])
    y = df["n_chars"].to_numpy(np.int64)
    return x, y


def ridge_solve(xtx: np.ndarray, xty: np.ndarray, lam: float = RIDGE_LAMBDA) -> np.ndarray:
    """(XᵀX + λI)β = Xᵀy with λ on every non-intercept diagonal — a 5×5
    float64 solve, identical on driver and oracle (same LAPACK)."""
    p = xtx.shape[0]
    reg = np.eye(p) * lam
    reg[0, 0] = 0.0  # don't shrink the intercept
    return np.linalg.solve(xtx.astype(np.float64) + reg, xty.astype(np.float64))


def ridge_fit(ds: rd.Dataset) -> np.ndarray:
    """One streaming pass → exact integer (XᵀX, Xᵀy, n) partials per
    batch (a single 31-int row each) → driver fold + 5×5 solve."""
    p = 1 + len(RIDGE_FEATURES)

    def partial(df: pd.DataFrame) -> pa.Table:
        x, y = doc_features(df)
        xtx = (x.T @ x).ravel()
        xty = x.T @ y
        row = np.concatenate([xtx, xty, [len(df)]])
        offs = pa.array(np.array([0, len(row)], dtype=np.int32))
        return pa.Table.from_pydict(
            {"stats": pa.ListArray.from_arrays(offs, pa.array(row, pa.int64()))}
        )

    acc = np.zeros(p * p + p + 1, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            acc += np.asarray(b["stats"].combine_chunks().flatten()).reshape(
                b.num_rows, len(acc)
            ).sum(axis=0)
    xtx = acc[: p * p].reshape(p, p)
    xty = acc[p * p : p * p + p]
    return ridge_solve(xtx, xty)


def ridge_predict(ds: rd.Dataset, beta: np.ndarray, id_col: str = "doc_id") -> rd.Dataset:
    """Stateless prediction pass → (doc_id, n_chars, y_hat, resid), both
    rounded to 6 decimals.  Per-row float64 dot over 5 terms in fixed
    order — identical under any batching."""
    bref = ray.put(np.asarray(beta, dtype=np.float64))
    from ..pipelines.relational import _cached_broadcast

    def predict(df: pd.DataFrame) -> pa.Table:
        b = _cached_broadcast(bref)
        x, y = doc_features(df)
        yh = x.astype(np.float64) @ b
        return pa.Table.from_pydict(
            {
                id_col: pa.array(df[id_col].to_numpy(np.int64)),
                "n_chars": pa.array(y),
                "y_hat": pa.array(np.round(yh, 6)),
                "resid": pa.array(np.round(y - yh, 6)),
            }
        )

    return ds.map_batches(predict, batch_format="pandas")


def ridge_flat(df: pd.DataFrame, id_col: str = "doc_id") -> tuple[np.ndarray, pd.DataFrame]:
    """Single-process twin of fit+predict (same integer statistics,
    same solve, same rounding)."""
    x, y = doc_features(df)
    beta = ridge_solve(x.T @ x, x.T @ y)
    yh = x.astype(np.float64) @ beta
    out = pd.DataFrame(
        {
            id_col: df[id_col].to_numpy(np.int64),
            "n_chars": y,
            "y_hat": np.round(yh, 6),
            "resid": np.round(y - yh, 6),
        }
    ).sort_values(id_col, ignore_index=True)
    return beta, out


# ---------------------------------------------------------------------------
# Distributed PCA via integer-quantized covariance partials
# ---------------------------------------------------------------------------

PCA_SCALE = 1 << 18  # fixed-point scale for the moment sums
PCA_COMPONENTS = 4


def _pca_partial(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(Σ q qᵀ, Σ q, n) over PCA_SCALE-quantized rows — integer sums,
    so the distributed fold is bit-identical to the flat recompute.
    Envelope: |q|≤PCA_SCALE per unit-vector component, so Σqqᵀ fits
    int64 up to ~2^63/2^36 ≈ 1.3·10^8 rows per fold; beyond that, fold
    hierarchically (the sums are associative) or re-scale."""
    q = _quantize(_unit_rows(mat), PCA_SCALE)
    return q.T @ q, q.sum(axis=0), len(q)


def pca_components_from_moments(
    xtx: np.ndarray, xsum: np.ndarray, n: int, p: int = PCA_COMPONENTS
) -> np.ndarray:
    """Top-p principal axes from exact integer moments: covariance =
    (Σqqᵀ − Σq Σqᵀ/n)/(n·S²), eigh (float64, driver-side, same LAPACK
    everywhere), canonical sign (largest-|component| entry positive) so
    the axes are unique."""
    s2 = float(PCA_SCALE) ** 2
    mean = xsum.astype(np.float64) / n
    cov = (xtx.astype(np.float64) - np.outer(mean, mean) * n) / (n * s2)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:p]
    axes = vecs[:, order].T  # (p, d)
    for i in range(len(axes)):
        j = int(np.argmax(np.abs(axes[i])))
        if axes[i, j] < 0:
            axes[i] = -axes[i]
    return axes


def pca_fit(ds: rd.Dataset, vec_col: str = "embedding", p: int = PCA_COMPONENTS) -> np.ndarray:
    """One streaming pass → (d², d, 1)-sized integer partials per batch
    → driver fold + eigh.  Nothing corpus-sized leaves the workers."""
    from .similarity import _stack

    def partial(batch: pa.Table) -> pa.Table:
        mat = _stack(batch[vec_col])
        if mat.size == 0:
            return pa.Table.from_pydict(
                {"moments": pa.array([], pa.list_(pa.int64()))}
            )
        xtx, xsum, n = _pca_partial(mat)
        row = np.concatenate([xtx.ravel(), xsum, [n]])
        offs = pa.array(np.array([0, row.size], dtype=np.int32))
        return pa.Table.from_pydict(
            {"moments": pa.ListArray.from_arrays(offs, pa.array(row, pa.int64()))}
        )

    acc: np.ndarray | None = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            rows = np.asarray(b["moments"].combine_chunks().flatten()).reshape(
                b.num_rows, -1
            )
            s = rows.sum(axis=0)
            acc = s if acc is None else acc + s
    if acc is None:
        return np.empty((0, 0))
    d = int(round((np.sqrt(4 * acc.size - 3) - 1) / 2))  # size = d² + d + 1
    xtx = acc[: d * d].reshape(d, d)
    return pca_components_from_moments(xtx, acc[d * d : d * d + d], int(acc[-1]), p)


def pca_project(
    ds: rd.Dataset,
    axes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Stateless projection pass → (id, pc0..pc{p-1}) rounded to 6
    decimals (per-row float64 dots in fixed order — batch-invariant)."""
    from ..pipelines.relational import _cached_broadcast
    from .similarity import _ids_np, _stack

    aref = ray.put(axes.astype(np.float64))

    def project(batch: pa.Table) -> pa.Table:
        a = _cached_broadcast(aref)
        mat = _stack(batch[vec_col])
        cols: dict = {id_col: batch[id_col]}
        if mat.size == 0:
            for i in range(len(a)):
                cols[f"pc{i}"] = pa.array([], pa.float64())
            return pa.Table.from_pydict(cols)
        proj = np.round(_unit_rows(mat).astype(np.float64) @ a.T, 6)
        for i in range(len(a)):
            cols[f"pc{i}"] = pa.array(proj[:, i])
        return pa.Table.from_pydict(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def pca_flat(
    ids: np.ndarray, mat: np.ndarray, p: int = PCA_COMPONENTS, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Single-process twin of fit+project (same integer moments, same
    eigh, same canonical sign, same rounding)."""
    xtx, xsum, n = _pca_partial(mat)
    axes = pca_components_from_moments(xtx, xsum, n, p)
    proj = np.round(_unit_rows(mat).astype(np.float64) @ axes.T, 6)
    out = pd.DataFrame({id_col: ids})
    for i in range(p):
        out[f"pc{i}"] = proj[:, i]
    return out.sort_values(id_col, ignore_index=True)
