"""Semantic deduplication — cluster-then-prune over an embedding column.

The SemDeDup shape (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
k-means-cluster the embeddings with a coarse quantizer, then inside each
cluster drop every document whose cosine to an already-kept document
meets the threshold — semantic near-dups land in the same cluster, so
the O(N²) pairwise pass shrinks to O(Σ cluster²).

Ray shape:

1. **Sample** — a deterministic hash-threshold filter (rows whose
   ``siphash(id)`` falls below ``target/N`` of the hash space) streams a
   bounded sample to the driver: batch-invariant (no ``take`` from a
   live Dataset), no shuffle, output-sized collect.
2. **Quantizer** — ``similarity.kmeans_centroids`` on the sample
   (driver-side Lloyd over ≤ ``target_sample`` rows, fixed seed).
3. **Assign** — one ``map_batches`` matmul against the broadcast
   centroid matrix (``ray.put`` once, per-worker cache).
4. **Prune** — ``groupby(cluster)`` → per-cluster vectorized greedy:
   sort members by id, keep a row iff no already-kept earlier id has
   cosine ≥ threshold (one gram-matrix row per member, numpy).

Partitioning assumption: a CLUSTER must fit one worker (the groupby
co-locates it) — ``n_clusters`` is the dial; at web scale pick
``n_clusters ≈ N·d·4B / worker_mem`` and pre-split mega-clusters by a
secondary hash if the corpus is pathologically unimodal.  Every step is
batch-invariant, so the whole operator is pinned by a single-process
oracle (pipelines/rowsonly_oracles.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _hash_threshold(n: int, target: int) -> np.uint64:
    """Hash-space cutoff that keeps ~``target`` of ``n`` rows (clamped
    to the uint64 max — ``target >= n`` keeps everything).  Shared by
    the Ray path and the single-process oracle so the sample can never
    drift between them."""
    frac = min(1.0, target / n)
    return np.uint64(min(int(frac * 2.0**64), 2**64 - 1))


def deterministic_sample_matrix(
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    target: int = 2048,
) -> np.ndarray:
    """Bounded deterministic sample of the vector column.

    Keeps rows whose 64-bit id hash is below ``target/N`` of the hash
    space (expected ~``target`` rows regardless of partitioning), then
    collects only those — the collect is sample-sized, never corpus-
    sized.  Unlike ``Dataset.take``, the result does not depend on
    block order: the streaming executor delivers blocks in completion
    order (``preserve_order`` is off), so the driver re-sorts the
    sample by id before handing it to the quantizer — batch-invariant
    AND run-invariant."""
    from .similarity import _ids_np, _stack

    n = ds.count()
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    thresh = _hash_threshold(n, target)

    def keep(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(_ids_np(batch[id_col]))
        return batch.select([id_col, vec_col]).filter(pa.array(h <= thresh))

    ids_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for b in ds.map_batches(keep, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            ids_parts.append(_ids_np(b[id_col]))
            mat_parts.append(_stack(b[vec_col]))
    if not mat_parts:
        return np.empty((0, 0), dtype=np.float32)
    ids = np.concatenate(ids_parts)
    mat = np.vstack(mat_parts)
    return mat[np.argsort(ids, kind="stable")]


def flat_hash_sample(ids: np.ndarray, mat: np.ndarray, target: int) -> np.ndarray:
    """Single-process twin of ``deterministic_sample_matrix`` (same hash
    threshold, same id-sorted order) — the one implementation every flat
    oracle must call so engine and oracle sampling can never drift."""
    if len(ids) == 0:
        return np.empty((0, 0), dtype=np.float32)
    thresh = _hash_threshold(len(ids), target)
    mask = pd.util.hash_array(np.asarray(ids)) <= thresh
    sids, smat = ids[mask], mat[mask].astype(np.float32)
    return smat[np.argsort(sids, kind="stable")]


def _greedy_prune(
    ids: np.ndarray, unit: np.ndarray, threshold: float
) -> tuple[np.ndarray, np.ndarray]:
    """Within-cluster greedy keep/drop in ascending-id order.

    Returns (keep mask, dup_of) where ``dup_of[i]`` is the smallest kept
    id with cosine ≥ threshold (-1 for kept rows).  One gram row per
    member — O(s²) dot products, all numpy."""
    order = np.argsort(ids, kind="stable")
    ids_o, unit_o = ids[order], unit[order]
    s = len(ids_o)
    keep = np.zeros(s, dtype=bool)
    dup_of = np.full(s, -1, dtype=np.int64)
    kept_rows: list[int] = []
    for i in range(s):
        if kept_rows:
            cos = unit_o[kept_rows] @ unit_o[i]
            hits = np.nonzero(cos >= threshold)[0]
            if hits.size:
                dup_of[i] = ids_o[kept_rows[int(hits[0])]]
                continue
        keep[i] = True
        kept_rows.append(i)
    # undo the sort so outputs align with the caller's row order
    inv = np.empty(s, dtype=np.int64)
    inv[order] = np.arange(s)
    return keep[inv], dup_of[inv]


def semantic_dedup(
    ds: rd.Dataset,
    threshold: float = 0.4,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_sample: int = 2048,
) -> rd.Dataset:
    """Cluster-then-prune semantic dedup (module docstring).

    Output: a ``Dataset`` with one row per input,
    ``(id, cluster, keep, dup_of)`` where ``dup_of`` = the kept
    representative responsible for a drop, -1 for kept rows.  The output
    is N-sized (one label row per document), so it stays a Dataset —
    collect/sort only in test or oracle wrappers, never here."""
    from .similarity import _ids_np, _stack, kmeans_centroids

    def _empty_labels() -> pa.Table:
        id_type = pa.int64()
        try:
            sch = ds.schema()
            if sch is not None:
                id_type = sch.base_schema.field(id_col).type
        except Exception:
            pass
        return pa.Table.from_pydict(
            {
                id_col: pa.array([], id_type),
                "cluster": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
                "dup_of": pa.array([], pa.int64()),
            }
        )

    sample = deterministic_sample_matrix(ds, id_col, vec_col, target=target_sample)
    if sample.size == 0:
        return rd.from_arrow(_empty_labels())
    cent = kmeans_centroids(sample, n_cells=n_clusters)
    cref = ray.put(cent)

    from ..pipelines.relational import _cached_broadcast

    def assign(batch: pa.Table) -> pa.Table:
        c = _cached_broadcast(cref)
        mat = _stack(batch[vec_col])
        if mat.size == 0:
            return pa.Table.from_pydict(
                {
                    id_col: batch[id_col],
                    "cluster": pa.array([], pa.int32()),
                    vec_col: batch[vec_col],
                }
            )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        cells = np.argmax(unit @ c.T, axis=1).astype(np.int32)
        return pa.Table.from_pydict(
            {
                id_col: batch[id_col],
                "cluster": pa.array(cells, pa.int32()),
                vec_col: batch[vec_col],
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        # typed output on EVERY path (incl. empty groups) — an untyped
        # empty block downgrades the stream schema (neardup._typed_table
        # lesson, applied here after the r3 RefBundle warnings)
        if g.num_rows == 0:
            return _empty_labels()
        ids = _ids_np(g[id_col])
        mat = _stack(g[vec_col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        keep, dup_of = _greedy_prune(ids, mat / norms, threshold)
        return pa.Table.from_pydict(
            {
                id_col: g[id_col],
                "cluster": g["cluster"].cast(pa.int64()),
                "keep": pa.array(keep),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


def semantic_dedup_singleproc(
    ids: np.ndarray,
    mat: np.ndarray,
    threshold: float = 0.4,
    n_clusters: int = 16,
    target_sample: int = 2048,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Flat no-Ray recompute of ``semantic_dedup`` for the SQL oracle —
    same hash-threshold sample, same quantizer, same greedy rule."""
    from .similarity import kmeans_centroids

    n = len(ids)
    if n == 0:
        return pd.DataFrame({id_col: [], "cluster": [], "keep": [], "dup_of": []})
    sample = flat_hash_sample(ids, mat, target_sample)
    cent = kmeans_centroids(sample, n_cells=n_clusters)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = (mat / norms).astype(np.float32)
    cells = np.argmax(unit @ cent.T, axis=1).astype(np.int32)
    frames = []
    for c in np.unique(cells):
        m = cells == c
        keep, dup_of = _greedy_prune(ids[m], unit[m], threshold)
        frames.append(
            pd.DataFrame(
                {
                    id_col: ids[m],
                    "cluster": np.full(int(m.sum()), c, dtype=np.int64),
                    "keep": keep,
                    "dup_of": dup_of,
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(id_col, ignore_index=True)
