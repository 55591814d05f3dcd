"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast via
``ray.put`` once and every batch does one numpy matmul against it (no
shuffle, no per-row Python).  Scale path: LSH-bucketed variant using
signed-random-projection signatures, so only same-bucket candidates are
scored (documented partitioning assumption: near neighbors share a
bucket with high probability; recall traded for a ~B× cost cut).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> / fixed_size_list<float> column → (n, d) float32 matrix.

    Vectorized: ``pc.list_flatten`` (offset/slice-aware) hands back one
    flat float buffer that numpy views and reshapes — zero Python objects
    per element.  This is the per-batch hot loop of the whole embedding
    family (ANN, LSH near-dup, semdedup), so it must never round-trip
    through ``to_pylist``.  Assumes fixed-dim, non-null vectors (the
    embeddings/pages schema guarantees both); ragged input fails loudly
    at the reshape."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    flat = np.asarray(pc.list_flatten(col), dtype=np.float32)
    return flat.reshape(n, len(flat) // n)


def _ids_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """id column → numpy without per-row Python objects."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def cosine_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Brute-force cosine top-k of ``query`` against every row.

    Per batch: one matmul + per-batch top-k prune (only k candidate rows
    leave each batch), then a tiny global sort — the partial-top-k
    combiner keeps the shuffle negligible at any scale.
    """
    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(qn)

    class Scorer:
        def __init__(self) -> None:
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _stack(batch[vec_col])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            cos = (mat @ self.q) / norms
            # Batch prune and the final global sort share ONE total
            # order — (rounded cos desc, id asc) — so the local top-k
            # can never disagree with the global ranking at any scale,
            # rounding ties included.  Rounding happens AFTER a float64
            # cast (np.round on float32 keeps the nearest f32,
            # 0.2879999876…, which hash-mismatches the oracle's 0.288);
            # ranking on the ROUNDED value is what makes the order
            # expressible in the DuckDB oracle, whose float64 cosine
            # does not bit-match the engine's float32 one.
            r = np.round(cos.astype(np.float64), 3)
            ids = _ids_np(batch[id_col])
            order = np.lexsort((ids, -r))[:k]  # batch-local prune
            return pa.Table.from_pydict(
                {
                    id_col: pa.array(ids[order].tolist()),
                    "cos": pa.array(r[order]),
                }
            )

    scored = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 4))
    out = scored.sort(["cos", id_col], descending=[True, False]).limit(k).to_pandas()
    return out


def load_query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float32)


# ---------------------------------------------------------------------------
# IVF ANN (coarse k-means quantizer + nprobe cell search)
# ---------------------------------------------------------------------------


def kmeans_centroids(
    sample: np.ndarray, n_cells: int = 16, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd k-means on a (normalized) sample — the coarse
    quantizer.  Runs on the driver over a bounded sample; at 10^12-doc
    scale the sample is a `random_sample` of the dataset, the assignment
    pass stays fully distributed."""
    rng = np.random.default_rng(seed)
    x = sample.astype(np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF search: score only rows assigned to the ``nprobe`` cells
    nearest the query.  Each batch does two matmuls (cell assignment +
    scoring of the surviving rows); candidate cost drops ~n_cells/nprobe×
    versus brute force, recall bounded by quantizer quality."""
    q = np.asarray(query, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe_cells = set(np.argsort(-(centroids @ qn))[:nprobe].tolist())
    cref = ray.put(centroids)
    qref = ray.put(qn)
    pset = ray.put(probe_cells)

    class CellScorer:
        def __init__(self) -> None:
            self.cent = ray.get(cref)
            self.q = ray.get(qref)
            self.probe = ray.get(pset)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _stack(batch[vec_col])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = mat / norms
            cells = np.argmax(unit @ self.cent.T, axis=1)
            mask = np.isin(cells, list(self.probe))
            if not mask.any():
                return pa.Table.from_pydict(
                    {id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
                )
            sub = unit[mask]
            ids = _ids_np(batch[id_col])[mask]
            cos = sub @ self.q
            # one total order for prune and global sort — see cosine_topk
            r = np.round(cos.astype(np.float64), 3)
            order = np.lexsort((ids, -r))[:k]
            return pa.Table.from_pydict(
                {
                    id_col: pa.array(ids[order].tolist(), pa.int64()),
                    "cos": pa.array(r[order]),
                }
            )

    scored = ds.map_batches(CellScorer, batch_format="pyarrow", concurrency=(1, 4))
    out = scored.sort(["cos", id_col], descending=[True, False]).limit(k).to_pandas()
    if out.empty and list(out.columns) != [id_col, "cos"]:
        out = pd.DataFrame({id_col: [], "cos": []})
    return out


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def srp_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def srp_lsh_params(
    threshold: float,
    target_recall: float = 0.995,
    max_tables: int = 32,
    max_planes: int = 16,
) -> tuple[int, int]:
    """Derive ``(n_planes, n_tables)`` from the cosine threshold — the
    recall/cost dial made explicit instead of hand-tuned per regime.

    For a pair at cosine exactly ``threshold`` the per-plane agreement
    probability is ``p1 = 1 - acos(threshold)/π``; a table of k planes
    collides with ``p1^k`` and T tables reach ``1-(1-p1^k)^T``.  Longer
    signatures cut false candidates geometrically (random pairs collide
    at ~0.5^k per table) but demand more tables for the same recall, so
    the chooser picks the LARGEST k whose required
    ``T = ceil(ln(1-target)/ln(1-p1^k))`` fits ``max_tables`` — the
    sharpest filter affordable.  Pairs above the threshold have higher
    p1, so ``target_recall`` is the floor of the whole accepted range.
    """
    p1 = 1.0 - float(np.arccos(np.clip(threshold, -1.0, 1.0))) / np.pi
    best = None
    for k in range(1, max_planes + 1):
        p_table = p1**k
        if p_table >= 1.0:
            best = (k, 1)
            continue
        t = int(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p_table)))
        if t <= max_tables:
            best = (k, max(t, 1))
    if best is None:
        # even 1-plane tables can't reach the target within max_tables —
        # take the best available recall at the cap rather than failing
        best = (1, max_tables)
    return best


def srp_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Signed-random-projection bucket id per row (uint32)."""
    bits = (mat @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.uint64)


def ann_topk_lsh(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: score only rows whose SRP bucket matches the query's.

    With ``n_planes`` hyperplanes the candidate set shrinks ~2^n_planes×;
    recall depends on the angular margin (documented tradeoff).
    """
    q = np.asarray(query, dtype=np.float32)
    dim = q.shape[0]
    planes = srp_planes(dim, n_planes, seed)
    qsig = int(srp_signature(q[None, :], planes)[0])
    pref = ray.put(planes)
    qref = ray.put(q / (np.linalg.norm(q) or 1.0))

    class BucketScorer:
        def __init__(self) -> None:
            self.planes = ray.get(pref)
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _stack(batch[vec_col])
            sig = srp_signature(mat, self.planes)
            mask = sig == qsig
            if not mask.any():
                return pa.Table.from_pydict(
                    {id_col: pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
                )
            sub = mat[mask]
            ids = _ids_np(batch[id_col])[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            cos = (sub @ self.q) / norms
            # one total order for prune and global sort — (rounded cos
            # desc, id asc); see cosine_topk for why the ROUNDED value
            r = np.round(cos.astype(np.float64), 3)
            order = np.lexsort((ids, -r))[:k]
            return pa.Table.from_pydict(
                {
                    id_col: pa.array(ids[order].tolist(), pa.int64()),
                    "cos": pa.array(r[order]),
                }
            )

    scored = ds.map_batches(BucketScorer, batch_format="pyarrow", concurrency=(1, 4))
    return scored.sort(["cos", id_col], descending=[True, False]).limit(k).to_pandas()
