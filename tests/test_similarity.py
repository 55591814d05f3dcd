"""Similarity search: brute-force baseline vs LSH and IVF scale paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from png_from_pdf_extracter_ray.stages.similarity import (
    ann_topk_lsh,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    load_query_vector,
)


def _clustered_ds(n_clusters: int = 4, per: int = 50, dim: int = 16, seed: int = 3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3
    vecs, ids = [], []
    for c in range(n_clusters):
        pts = centers[c] + 0.2 * rng.standard_normal((per, dim)).astype(np.float32)
        vecs.extend(pts.tolist())
        ids.extend(range(c * per, (c + 1) * per))
    ds = rd.from_arrow(pa.Table.from_pydict({"vec_id": ids, "embedding": vecs}))
    return ds, np.asarray(vecs, dtype=np.float32), centers


def test_bruteforce_topk_self_is_first(ray_session, sf_dir) -> None:  # noqa: ANN001
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = load_query_vector(sf_dir, 0)
    out = cosine_topk(ds, q, k=5)
    assert out["vec_id"].iloc[0] == 0
    assert out["cos"].iloc[0] == 1.0
    assert (out["cos"].diff().dropna() <= 1e-9).all()  # descending


def test_ivf_recall_on_clustered_data(ray_session) -> None:  # noqa: ANN001
    ds, vecs, _ = _clustered_ds()
    query = vecs[0]
    exact = set(cosine_topk(ds, query, k=10)["vec_id"])
    cent = kmeans_centroids(vecs, n_cells=4, seed=7)
    approx = set(ivf_topk(ds, query, cent, k=10, nprobe=1)["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.9, recall  # query's own cluster covers the true top-k


def test_ivf_nprobe_all_equals_bruteforce(ray_session) -> None:  # noqa: ANN001
    ds, vecs, _ = _clustered_ds()
    query = vecs[17]
    cent = kmeans_centroids(vecs, n_cells=4, seed=7)
    exact = cosine_topk(ds, query, k=10)
    full = ivf_topk(ds, query, cent, k=10, nprobe=4)  # probe every cell
    assert list(full["vec_id"]) == list(exact["vec_id"])


def test_lsh_returns_subset_of_plausible_neighbors(ray_session) -> None:  # noqa: ANN001
    ds, vecs, _ = _clustered_ds()
    query = vecs[5]
    out = ann_topk_lsh(ds, query, k=10, n_planes=4, seed=11)
    # every returned neighbor really is close (cos computed exactly)
    assert (out["cos"] > 0.8).all()


class TestSrpLshParams:
    def test_reaches_target_recall_at_threshold(self) -> None:
        import numpy as np

        from png_from_pdf_extracter_ray.stages.similarity import srp_lsh_params

        for th in (0.3, 0.4, 0.8, 0.9, 0.95, 0.99):
            k, t = srp_lsh_params(th, target_recall=0.995)
            p1 = 1.0 - np.arccos(th) / np.pi
            recall = 1.0 - (1.0 - p1**k) ** t
            assert recall >= 0.995, (th, k, t, recall)

    def test_respects_caps_and_sharpens_with_threshold(self) -> None:
        from png_from_pdf_extracter_ray.stages.similarity import srp_lsh_params

        ks = []
        for th in (0.2, 0.5, 0.8, 0.95):
            k, t = srp_lsh_params(th, max_tables=32, max_planes=16)
            assert 1 <= k <= 16 and 1 <= t <= 32
            ks.append(k)
        # higher thresholds afford longer (sharper) signatures
        assert ks == sorted(ks)

    def test_moderate_regime_matches_hand_tuned_point(self) -> None:
        from png_from_pdf_extracter_ray.stages.similarity import srp_lsh_params

        k, t = srp_lsh_params(0.4)
        assert k == 4 and 24 <= t <= 32
