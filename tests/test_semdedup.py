"""SemDeDup cluster-then-prune invariants (stages/semdedup.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from png_from_pdf_extracter_ray.stages.semdedup import (
    _greedy_prune,
    semantic_dedup,
    semantic_dedup_singleproc,
)

THRESHOLD = 0.4


def _norm(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


class TestGreedyPrune:
    def test_near_dup_pair_drops_larger_id(self) -> None:
        unit = _norm(
            np.array([[1.0, 0.0], [0.999, 0.04], [0.0, 1.0]], dtype=np.float32)
        )
        ids = np.array([7, 3, 9], dtype=np.int64)
        keep, dup_of = _greedy_prune(ids, unit, 0.95)
        # 3 is the smallest id → kept; 7 is its near-dup → dropped to 3
        got = dict(zip(ids.tolist(), zip(keep.tolist(), dup_of.tolist())))
        assert got[3] == (True, -1)
        assert got[7] == (False, 3)
        assert got[9] == (True, -1)

    def test_row_order_invariance(self) -> None:
        rng = np.random.default_rng(5)
        mat = rng.standard_normal((50, 8)).astype(np.float32)
        ids = np.arange(100, 150, dtype=np.int64)
        unit = _norm(mat)
        k1, d1 = _greedy_prune(ids, unit, 0.3)
        perm = rng.permutation(50)
        k2, d2 = _greedy_prune(ids[perm], unit[perm], 0.3)
        assert np.array_equal(k1[np.argsort(ids)], k2[np.argsort(ids[perm])])
        assert np.array_equal(d1[np.argsort(ids)], d2[np.argsort(ids[perm])])


class TestSemanticDedup:
    @pytest.fixture(scope="class")
    def result(self, ray_session, sf_dir):  # noqa: ANN001
        import os

        import ray.data as rd

        ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        out = (
            semantic_dedup(ds, threshold=THRESHOLD)
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ids = np.asarray(t["vec_id"].to_pylist())
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
        return out, ids, mat

    def test_one_row_per_input(self, result) -> None:  # noqa: ANN001
        out, ids, _ = result
        assert len(out) == len(ids)
        assert set(out["vec_id"]) == set(ids.tolist())

    def test_matches_single_process_oracle(self, result) -> None:  # noqa: ANN001
        out, ids, mat = result
        oracle = semantic_dedup_singleproc(ids, mat, threshold=THRESHOLD)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), oracle, check_dtype=False
        )

    def test_prune_invariants(self, result) -> None:  # noqa: ANN001
        out, ids, mat = result
        unit = _norm(mat)
        pos = {int(v): i for i, v in enumerate(ids)}
        by_cluster = dict(tuple(out.groupby("cluster")))
        for _, g in by_cluster.items():
            kept = g[g["keep"]]
            kid = kept["vec_id"].to_numpy()
            ku = unit[[pos[int(i)] for i in kid]]
            if len(kid) > 1:
                gram = ku @ ku.T
                np.fill_diagonal(gram, 0.0)
                # no two kept members are semantic near-dups
                assert float(gram.max()) < THRESHOLD
            for _, row in g[~g["keep"]].iterrows():
                # every drop points at a kept, smaller-id, same-cluster
                # representative with cosine >= threshold
                rep = int(row["dup_of"])
                assert rep in set(kid.tolist())
                assert rep < int(row["vec_id"])
                cos = float(
                    unit[pos[int(row["vec_id"])]] @ unit[pos[rep]]
                )
                assert cos >= THRESHOLD - 1e-6

    def test_some_dedup_happens(self, result) -> None:  # noqa: ANN001
        out, _, _ = result
        assert (~out["keep"]).sum() > 0
