"""Unit tests for the ML-operator family (stages/ml.py, stages/pq.py,
pipelines/tokenizer.py) — properties beyond the DuckDB-parity layer in
test_queries_vs_duckdb.py (which already pins all four new entries
against their flat oracles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from png_from_pdf_extracter_ray.pipelines.tokenizer import (
    bpe_merges_from_wordfreq,
    word_freq_flat,
)
from png_from_pdf_extracter_ray.stages.ml import (
    ASSIGN_SCALE,
    _quantize,
    _unit_rows,
    assign_clusters_int,
    doc_features,
    kmeans_fit_flat,
    kmeans_labels_flat,
    ridge_flat,
    ridge_solve,
)
from png_from_pdf_extracter_ray.stages.pq import (
    adc_scores,
    pq_encode,
    pq_topk_flat,
    pq_train,
)




def _unit_rows_t(mat):
    from png_from_pdf_extracter_ray.stages.ml import _unit_rows
    return _unit_rows(mat)

def _rand_unit(n: int, d: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _unit_rows(rng.standard_normal((n, d)).astype(np.float32))


class TestKMeans:
    def test_integer_assignment_is_batch_invariant(self) -> None:
        """Assignments computed on row slices must equal the full-matrix
        assignment bit-for-bit — the property the fixed-point encode
        exists to guarantee."""
        unit = _rand_unit(257, 16)
        cent_q = _quantize(_rand_unit(5, 16, seed=9), ASSIGN_SCALE)
        full = assign_clusters_int(unit, cent_q)
        for lo, hi in [(0, 1), (1, 100), (100, 257)]:
            np.testing.assert_array_equal(
                assign_clusters_int(unit[lo:hi], cent_q), full[lo:hi]
            )

    def test_flat_fit_labels_all_rows_within_k(self) -> None:
        rng = np.random.default_rng(3)
        ids = np.arange(300, dtype=np.int64)
        mat = rng.standard_normal((300, 8)).astype(np.float32)
        cent = kmeans_fit_flat(ids, mat, k=4, iters=3, target_sample=64)
        out = kmeans_labels_flat(ids, mat, cent)
        assert len(out) == 300
        assert out["cluster"].between(0, 3).all()

    def test_fit_separates_obvious_clusters(self) -> None:
        """Two well-separated directional blobs must land in different
        clusters."""
        rng = np.random.default_rng(11)
        a = rng.normal([10, 0, 0, 0], 0.1, size=(50, 4))
        b = rng.normal([0, 10, 0, 0], 0.1, size=(50, 4))
        mat = np.vstack([a, b]).astype(np.float32)
        ids = np.arange(100, dtype=np.int64)
        cent = kmeans_fit_flat(ids, mat, k=2, iters=4, target_sample=100)
        out = kmeans_labels_flat(ids, mat, cent)
        la = set(out["cluster"][:50])
        lb = set(out["cluster"][50:])
        assert len(la) == 1 and len(lb) == 1 and la != lb


class TestPQ:
    def test_encode_batch_invariant(self) -> None:
        unit = _rand_unit(123, 16)
        books = pq_train(_rand_unit(400, 16, seed=5), m=4, ks=8)
        full = pq_encode(unit, books)
        for lo, hi in [(0, 1), (1, 60), (60, 123)]:
            np.testing.assert_array_equal(pq_encode(unit[lo:hi], books), full[lo:hi])

    def test_adc_approximates_cosine(self) -> None:
        """ADC score must correlate strongly with the true inner product
        on unit vectors (compression, not garbage)."""
        unit = _rand_unit(500, 32)
        books = pq_train(unit, m=8, ks=16)
        q = _rand_unit(1, 32, seed=77)[0]
        lut = np.einsum("mkd,md->mk", books, q.reshape(8, 4))
        approx = adc_scores(pq_encode(unit, books), lut.astype(np.float32))
        true = unit @ q
        corr = np.corrcoef(approx, true)[0, 1]
        assert corr > 0.8, corr

    def test_topk_flat_recall_vs_exact(self) -> None:
        unit = _rand_unit(400, 16)
        ids = np.arange(400, dtype=np.int64)
        books = pq_train(unit, m=4, ks=16)
        q = _rand_unit(1, 16, seed=31)[0]
        got = set(pq_topk_flat(ids, unit, q, books, k=10)["vec_id"])
        exact = set(np.argsort(-(unit @ q))[:20].tolist())  # top-20 pool
        assert len(got & exact) >= 5  # PQ top-10 overlaps the true top-20

    def test_train_rejects_indivisible_dim(self) -> None:
        with pytest.raises(ValueError):
            pq_train(_rand_unit(10, 10), m=4, ks=4)


class TestRidge:
    def test_solve_recovers_exact_linear_data(self) -> None:
        """With y an exact integer linear function of the features, the
        (lightly regularized) fit must predict it almost perfectly."""
        df = pd.DataFrame(
            {
                "doc_id": np.arange(50, dtype=np.int64),
                "text": [
                    " ".join(f"w{j}" for j in range(i % 7 + 1)) + "." * (i % 3)
                    for i in range(50)
                ],
            }
        )
        df["n_chars"] = 0  # placeholder so doc_features can read y
        x, _ = doc_features(df)
        true_beta = np.array([5.0, 3.0, 2.0, 1.0, 0.0])
        df["n_chars"] = (x @ true_beta).astype(np.int64)
        beta, out = ridge_flat(df)
        assert np.abs(out["resid"]).max() < 1.0

    def test_features_handle_blank_docs(self) -> None:
        df = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["", "a b c 123."], "n_chars": [0, 10]}
        )
        x, y = doc_features(df)
        assert x[0].tolist() == [1, 0, 0, 0, 0]
        assert x[1].tolist() == [1, 4, 4, 1, 3]

    def test_regularization_excludes_intercept(self) -> None:
        xtx = np.eye(3) * 10
        xty = np.array([10.0, 10.0, 10.0])
        beta = ridge_solve(xtx, xty, lam=10.0)
        assert beta[0] == pytest.approx(1.0)
        assert beta[1] == pytest.approx(0.5)


class TestBPE:
    def test_golden_tiny_corpus(self) -> None:
        """Classic BPE example: 'ab' is the most frequent pair."""
        out = bpe_merges_from_wordfreq(
            ["abab", "abc", "bc"], [10, 5, 3], n_merges=3
        )
        assert out.iloc[0][["left_sym", "right_sym"]].tolist() == ["a", "b"]
        assert out.iloc[0]["freq"] == 25  # 2×10 + 1×5
        # second merge: 'ab'+'ab' (10) vs 'ab'+'c' (5) vs 'b'+'c' (3)
        assert out.iloc[1][["left_sym", "right_sym"]].tolist() == ["ab", "ab"]

    def test_tie_breaks_lexicographic(self) -> None:
        out = bpe_merges_from_wordfreq(["xy", "ab"], [4, 4], n_merges=1)
        assert out.iloc[0][["left_sym", "right_sym"]].tolist() == ["a", "b"]

    def test_stops_below_min_freq(self) -> None:
        out = bpe_merges_from_wordfreq(["ab"], [1], n_merges=5)
        assert len(out) == 0

    def test_word_freq_flat_cap_order(self) -> None:
        df = pd.DataFrame({"text": ["b b b", "a a a", "c"]})
        wf = word_freq_flat(df, cap=2)
        assert wf["token"].tolist() == ["a", "b"]  # tie → token asc
        assert wf["n"].tolist() == [3, 3]


class TestCMS:
    def test_never_undercounts_and_merges_exactly(self) -> None:
        from png_from_pdf_extracter_ray.stages.sketch import (
            cms_partial,
            cms_query,
        )

        toks = np.array(["a", "b", "c", "a"], dtype=object)
        w = np.array([10, 5, 3, 7], dtype=np.int64)
        full = cms_partial(toks, w)
        # split into two partials and merge by addition — must be
        # bit-identical (the mergeability contract)
        merged = cms_partial(toks[:2], w[:2]) + cms_partial(toks[2:], w[2:])
        np.testing.assert_array_equal(full, merged)
        est = cms_query(full, np.array(["a", "b", "c"], dtype=object))
        assert (est >= np.array([17, 5, 3])).all()

    def test_exact_on_sparse_vocab(self) -> None:
        """With a handful of tokens in a 4×2048 sketch, collisions are
        absent and estimates are exact."""
        from png_from_pdf_extracter_ray.stages.sketch import (
            cms_partial,
            cms_query,
        )

        toks = np.array([f"t{i}" for i in range(20)], dtype=object)
        w = np.arange(1, 21, dtype=np.int64)
        est = cms_query(cms_partial(toks, w), toks)
        np.testing.assert_array_equal(est, w)


class TestBpeEncode:
    def test_encode_word_applies_lowest_rank_first(self) -> None:
        from png_from_pdf_extracter_ray.pipelines.tokenizer import (
            bpe_encode_word,
        )

        ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
        assert bpe_encode_word("abc", ranks) == ["abc"]
        assert bpe_encode_word("bc", ranks) == ["bc"]
        assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]

    def test_encoder_counts_and_ratio(self) -> None:
        from png_from_pdf_extracter_ray.pipelines.tokenizer import BpeEncoder

        enc = BpeEncoder([("a", "b")])
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab cd", ""]})
        out = enc(df).to_pandas()
        assert out["n_words"].tolist() == [3, 0]
        # "ab"→1 token ×2, "cd"→2 tokens
        assert out["n_bpe_tokens"].tolist() == [4, 0]
        assert out["bpe_ratio"].iloc[0] == pytest.approx(4 / 3, abs=1e-6)


class TestPCA:
    def test_moment_partials_merge_exactly(self) -> None:
        from png_from_pdf_extracter_ray.stages.ml import _pca_partial

        mat = _rand_unit(100, 8, seed=21)
        xtx_a, xs_a, n_a = _pca_partial(mat[:37])
        xtx_b, xs_b, n_b = _pca_partial(mat[37:])
        xtx, xs, n = _pca_partial(mat)
        np.testing.assert_array_equal(xtx_a + xtx_b, xtx)
        np.testing.assert_array_equal(xs_a + xs_b, xs)
        assert n_a + n_b == n

    def test_recovers_dominant_direction(self) -> None:
        from png_from_pdf_extracter_ray.stages.ml import pca_flat

        rng = np.random.default_rng(4)
        base = rng.standard_normal((400, 6)).astype(np.float32) * 0.05
        base[:, 2] += rng.standard_normal(400).astype(np.float32) * 3.0
        ids = np.arange(400, dtype=np.int64)
        out = pca_flat(ids, base, p=2)
        # pc0 must carry far more variance than pc1
        assert out["pc0"].var() > 5 * out["pc1"].var()

    def test_canonical_sign(self) -> None:
        from png_from_pdf_extracter_ray.stages.ml import (
            _pca_partial,
            pca_components_from_moments,
        )

        mat = _rand_unit(200, 5, seed=13)
        xtx, xs, n = _pca_partial(mat)
        axes = pca_components_from_moments(xtx, xs, n, p=3)
        for ax in axes:
            assert ax[int(np.argmax(np.abs(ax)))] > 0


class TestIVFPQ:
    def test_flat_topk_recall(self) -> None:
        from png_from_pdf_extracter_ray.stages.pq import (
            ivfpq_topk_flat,
            ivfpq_train,
        )

        unit = _rand_unit(600, 16, seed=2)
        ids = np.arange(600, dtype=np.int64)
        cent, books = ivfpq_train(unit, n_cells=8, m=4, ks=16)
        q = unit[5]  # a corpus vector: its own cell is certainly probed
        out = ivfpq_topk_flat(ids, unit, q, cent, books, k=10, nprobe=4)
        assert len(out) == 10
        assert 5 in set(out["vec_id"])  # the query vector itself found
        assert out["score"].is_monotonic_decreasing or len(out["score"].unique()) < 10

    def test_residual_books_beat_plain_pq_on_clustered_data(self) -> None:
        """On strongly clustered data, IVF-PQ's residual quantization
        error must be below plain PQ's (the reason the composition
        exists)."""
        from png_from_pdf_extracter_ray.stages.ml import (
            ASSIGN_SCALE,
            _quantize,
            assign_clusters_int,
        )
        from png_from_pdf_extracter_ray.stages.pq import (
            adc_scores,
            ivfpq_train,
            pq_encode,
            pq_train,
        )

        rng = np.random.default_rng(9)
        centers = rng.standard_normal((4, 16)).astype(np.float32) * 3
        pts = np.vstack([c + rng.standard_normal((100, 16)).astype(np.float32) * 0.1 for c in centers])
        unit = _unit_rows_t(pts)
        q = unit[0]
        cent, books_r = ivfpq_train(unit, n_cells=4, m=4, ks=8)
        books_p = pq_train(unit, m=4, ks=8)
        # reconstruct scores both ways for the query against all rows
        lut_r = np.einsum("mkd,md->mk", books_r, q.reshape(4, 4)).astype(np.float32)
        lut_p = np.einsum("mkd,md->mk", books_p, q.reshape(4, 4)).astype(np.float32)
        cells = assign_clusters_int(unit, _quantize(cent, ASSIGN_SCALE))
        s_r = (cent @ q)[cells] + adc_scores(pq_encode(unit - cent[cells], books_r), lut_r)
        s_p = adc_scores(pq_encode(unit, books_p), lut_p)
        true = unit @ q
        assert np.abs(s_r - true).mean() <= np.abs(s_p - true).mean() + 1e-3


class TestDSIR:
    def test_count_partials_merge_exactly(self) -> None:
        from png_from_pdf_extracter_ray.pipelines.dsir import _count_partial

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 97, 194],
                "text": ["alpha beta", "beta gamma", "alpha alpha", "delta"],
            }
        )
        t_a, r_a = _count_partial(df.iloc[:2])
        t_b, r_b = _count_partial(df.iloc[2:])
        t, r = _count_partial(df)
        np.testing.assert_array_equal(t_a + t_b, t)
        np.testing.assert_array_equal(r_a + r_b, r)
        # docs 0, 97, 194 are target (doc_id % 97 == 0): 5 target tokens
        assert t.sum() == 5 and r.sum() == 7

    def test_target_like_docs_score_higher(self) -> None:
        from png_from_pdf_extracter_ray.pipelines.dsir import dsir_flat

        rows = []
        # target slice (doc_id % 97 == 0) speaks "target" vocabulary
        for i in range(5):
            rows.append({"doc_id": i * 97, "text": "quark boson lepton " * 5})
        # raw docs: most speak "web" vocabulary, a few speak target-ese
        for i in range(40):
            rows.append({"doc_id": i * 97 + 1, "text": "click here buy now " * 5})
        for i in range(5):
            rows.append({"doc_id": i * 97 + 2, "text": "quark boson lepton " * 5})
        out = dsir_flat(pd.DataFrame(rows))
        by_id = out.set_index("doc_id")
        target_like = [i * 97 + 2 for i in range(5)]
        web_like = [i * 97 + 1 for i in range(5)]
        assert by_id.loc[target_like, "dsir_logratio"].min() > by_id.loc[web_like, "dsir_logratio"].max()
        assert by_id.loc[target_like, "keep"].all()
        assert not by_id.loc[web_like, "keep"].any()

    def test_blank_docs_score_zero(self) -> None:
        from png_from_pdf_extracter_ray.pipelines.dsir import dsir_flat

        out = dsir_flat(pd.DataFrame({"doc_id": [0, 1], "text": ["", "a b"]}))
        assert out.loc[out["doc_id"] == 0, "dsir_logratio"].iloc[0] == 0.0
        assert out.loc[out["doc_id"] == 0, "n_tokens"].iloc[0] == 0


class TestKMeansOutliers:
    def test_flat_scores_exact_and_sorted(self) -> None:
        import numpy as np

        from png_from_pdf_extracter_ray.stages.ml import (
            ASSIGN_SCALE,
            _quantize,
            _unit_rows,
            kmeans_outlier_scores_flat,
        )

        rng = np.random.default_rng(7)
        mat = rng.normal(size=(40, 8)).astype(np.float32)
        cent = rng.normal(size=(3, 8)).astype(np.float32)
        ids = np.arange(40, dtype=np.int64)
        out = kmeans_outlier_scores_flat(ids, mat, cent, k_out=10)
        assert len(out) == 10
        # ascending sim_q with vec_id tiebreak
        s = out["sim_q"].to_numpy()
        assert (s[:-1] <= s[1:]).all()
        # score equals the exact integer dot product for the first row
        uq = _quantize(_unit_rows(mat), ASSIGN_SCALE)
        cq = _quantize(cent, ASSIGN_SCALE)
        scores = uq @ cq.T
        vid = int(out["vec_id"].iloc[0])
        assert int(out["sim_q"].iloc[0]) == int(scores[vid].max())
        assert int(out["cluster"].iloc[0]) == int(scores[vid].argmax())

    def test_distributed_equals_flat(self, ray_session, sf_dir) -> None:  # noqa: ANN001
        import os

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.mlops import (
            KMEANS_SAMPLE,
            embedding_outlier_scores,
        )
        from png_from_pdf_extracter_ray.stages.ml import (
            kmeans_fit_flat,
            kmeans_outlier_scores_flat,
        )
        from png_from_pdf_extracter_ray.stages.similarity import _stack

        got = embedding_outlier_scores(sf_dir)
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = _stack(t["embedding"])
        cent = kmeans_fit_flat(ids, mat, k=8, iters=4, target_sample=KMEANS_SAMPLE)
        want = kmeans_outlier_scores_flat(ids, mat, cent)
        pd.testing.assert_frame_equal(got, want)


class TestSq8:
    def test_quantize_bounds_and_constant_dim(self) -> None:
        import numpy as np

        from png_from_pdf_extracter_ray.pipelines.mlops import sq8_quantize

        mat = np.array([[0.0, 5.0, 1.0], [1.0, 5.0, 3.0]], dtype=np.float32)
        lo, hi = mat.min(axis=0), mat.max(axis=0)
        q = sq8_quantize(mat, lo, hi)
        assert q.dtype == np.uint8
        assert q[:, 0].tolist() == [0, 255]  # full range maps to [0, 255]
        assert q[:, 1].tolist() == [0, 0]  # constant dim -> 0
        assert q[:, 2].tolist() == [0, 255]

    def test_distributed_equals_flat(self, ray_session, sf_dir) -> None:  # noqa: ANN001
        import hashlib
        import os

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.mlops import (
            embedding_sq8_digest,
            sq8_quantize,
        )
        from png_from_pdf_extracter_ray.stages.similarity import _stack

        got = embedding_sq8_digest(sf_dir)
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = _stack(t["embedding"])
        q = sq8_quantize(mat, mat.min(axis=0), mat.max(axis=0))
        want = pd.DataFrame(
            {"vec_id": ids, "q_md5": [hashlib.md5(r.tobytes()).hexdigest() for r in q]}
        ).sort_values("vec_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, want)
