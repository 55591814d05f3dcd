"""BloomFilter contract tests: no false negatives ever, bounded false
positives, state roundtrip — plus parity of the Bloom-prefiltered
contamination query against the exact broadcast-set path."""

from __future__ import annotations

import numpy as np
import pandas as pd

from png_from_pdf_extracter_ray.stages.bloom import BloomFilter


def _rand_u64(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


class TestBloomFilter:
    def test_no_false_negatives(self) -> None:
        members = _rand_u64(20_000, 1)
        blm = BloomFilter.build(members)
        assert blm.contains(members).all()

    def test_false_positive_rate_bounded(self) -> None:
        members = _rand_u64(20_000, 2)
        others = _rand_u64(20_000, 3)
        others = others[~np.isin(others, members)]
        blm = BloomFilter.build(members)
        fp = blm.contains(others).mean()
        # sized at >=16 bits/element with k=4 -> theoretical ~0.24%
        assert fp < 0.02, fp

    def test_state_roundtrip(self) -> None:
        members = _rand_u64(1_000, 4)
        probe = _rand_u64(5_000, 5)
        blm = BloomFilter.build(members)
        blm2 = BloomFilter.from_state(blm.to_state())
        assert (blm.contains(probe) == blm2.contains(probe)).all()
        assert blm2.n_bits_log2 == blm.n_bits_log2
        assert blm2.n_hashes == blm.n_hashes

    def test_empty_filter_rejects_everything(self) -> None:
        blm = BloomFilter.build(np.zeros(0, dtype=np.uint64))
        assert not blm.contains(_rand_u64(100, 6)).any()
        assert blm.contains(np.zeros(0, dtype=np.uint64)).size == 0

    def test_string_hashes_via_hash_array(self) -> None:
        strs = np.asarray([f"shingle {i} text" for i in range(500)], dtype=object)
        blm = BloomFilter.build(pd.util.hash_array(strs))
        assert blm.contains(pd.util.hash_array(strs)).all()
        other = np.asarray([f"absent {i}" for i in range(500)], dtype=object)
        assert blm.contains(pd.util.hash_array(other)).mean() < 0.05


def test_bloom_contamination_matches_exact(ray_session, sf_dir) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines import corpus_stats

    exact = corpus_stats.benchmark_contamination(sf_dir)
    via_bloom = corpus_stats.benchmark_contamination_bloom(sf_dir)
    pd.testing.assert_frame_equal(exact, via_bloom)
