"""Unit tests for the single-process rows-only-upgrade oracles.

The full engine-vs-oracle comparison for every upgraded entry runs in
test_queries_vs_duckdb.py (the driver-contract emulation); here we pin
the oracle-side primitives themselves.
"""

from __future__ import annotations

import pandas as pd

from png_from_pdf_extracter_ray.pipelines.rowsonly_oracles import (
    _oracle_path,
    _union_find_min_labels,
)


class TestUnionFind:
    def test_chain_and_isolated_pair(self) -> None:
        pairs = pd.DataFrame(
            {"id_a": ["b", "a", "d"], "id_b": ["c", "b", "e"]}
        )
        out = _union_find_min_labels(pairs)
        got = dict(zip(out["url"], out["group_id"]))
        assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}

    def test_merge_of_two_components(self) -> None:
        # two components built separately, then bridged — the root of
        # the merged component must still be the global min
        pairs = pd.DataFrame(
            {"id_a": ["x", "m", "m"], "id_b": ["y", "n", "x"]}
        )
        out = _union_find_min_labels(pairs)
        assert set(out["group_id"]) == {"m"}

    def test_output_sorted_by_url(self) -> None:
        pairs = pd.DataFrame({"id_a": ["z", "a"], "id_b": ["q", "b"]})
        out = _union_find_min_labels(pairs)
        assert list(out["url"]) == sorted(out["url"])


class TestOraclePaths:
    def test_distinct_corpora_get_distinct_paths(self) -> None:
        # abs-path keying: same leaf name, different parents → no shared
        # cache entry (the ADVICE r2 collision class)
        a = _oracle_path("/tmp/a/sf0.01", "minhash_pairs")
        b = _oracle_path("/tmp/b/sf0.01", "minhash_pairs")
        assert a != b

    def test_version_keyed(self) -> None:
        import png_from_pdf_extracter_ray as pkg

        assert pkg.__version__ in _oracle_path("/tmp/a/sf0.01", "x")
