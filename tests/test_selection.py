"""Unit tests for the distributed weighted-threshold cut
(stages/selection.py), the budgeted/balanced selection pipelines, and
the degree-ordered triangle counter (stages/linkgraph.triangle_counts).
The end-to-end DuckDB parity of the three registered queries is covered
by test_queries_vs_duckdb.py; these tests pin the primitives on small
adversarial inputs where the answer is computable by hand / flat numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from png_from_pdf_extracter_ray.stages.selection import key_range, weighted_key_cut


def _flat_cut(keys, weights, target):
    """Reference: sort by key, walk the prefix sum."""
    df = (
        pd.DataFrame({"k": keys, "w": weights})
        .groupby("k", as_index=False)["w"]
        .sum()
        .sort_values("k", ignore_index=True)
    )
    cum = df["w"].cumsum()
    idx = int(np.searchsorted(cum.to_numpy(), target, side="left"))
    below = int(cum.iloc[idx - 1]) if idx > 0 else 0
    return int(df["k"].iloc[idx]), below


@pytest.mark.usefixtures("ray_session")
class TestWeightedKeyCut:
    def _ds(self, keys, weights, blocks=5):
        df = pd.DataFrame(
            {"k": np.asarray(keys, np.int64), "w": np.asarray(weights, np.int64)}
        )
        return rd.from_pandas(df).repartition(blocks)

    def test_matches_flat_reference_random(self):
        rng = np.random.RandomState(7)
        keys = rng.randint(-1000, 1000, size=500).astype(np.int64)
        weights = rng.randint(0, 50, size=500).astype(np.int64)
        total = int(weights.sum())
        ds = self._ds(keys, weights)
        for target in (1, total // 3, total // 2, total):
            assert weighted_key_cut(ds, "k", "w", target) == _flat_cut(
                keys, weights, target
            )

    def test_wide_key_range_many_rounds(self):
        # keys spread over ~2^40 force several histogram rounds
        rng = np.random.RandomState(11)
        keys = rng.randint(0, 2**40, size=200).astype(np.int64)
        weights = np.ones(200, dtype=np.int64)
        ds = self._ds(keys, weights)
        k, below = weighted_key_cut(ds, "k", "w", 100)
        assert k == int(np.sort(keys)[99])
        assert below == int((keys < k).sum())

    def test_negative_keys_and_duplicates(self):
        keys = [-5, -5, -5, 0, 0, 7]
        weights = [2, 3, 1, 4, 1, 10]
        ds = self._ds(keys, weights, blocks=3)
        assert weighted_key_cut(ds, "k", "w", 6) == (-5, 0)
        assert weighted_key_cut(ds, "k", "w", 7) == (0, 6)
        assert weighted_key_cut(ds, "k", "w", 12) == (7, 11)

    def test_batch_invariance(self):
        rng = np.random.RandomState(3)
        keys = rng.randint(0, 10**6, size=300).astype(np.int64)
        weights = rng.randint(1, 9, size=300).astype(np.int64)
        t = int(weights.sum()) // 2
        a = weighted_key_cut(self._ds(keys, weights, blocks=1), "k", "w", t)
        b = weighted_key_cut(self._ds(keys, weights, blocks=13), "k", "w", t)
        assert a == b == _flat_cut(keys, weights, t)

    def test_target_exceeds_total_raises(self):
        ds = self._ds([1, 2], [1, 1])
        with pytest.raises(ValueError):
            weighted_key_cut(ds, "k", "w", 3)

    def test_overflow_regression_wide_span(self):
        # r4 falsifying examples: key span > 2^62 overflowed the old
        # multiply-first bin math ((k-lo)*nb wrapped negative and
        # np.add.at booked the weight into the wrong bin).
        keys = [0, 2305844152884420795, 4611686018427387904]
        weights = [7, 9, 1]
        ds = self._ds(keys, weights, blocks=3)
        assert weighted_key_cut(ds, "k", "w", 8) == (2305844152884420795, 7)
        assert weighted_key_cut(ds, "k", "w", 17) == (4611686018427387904, 16)
        ds2 = self._ds([0, 2**62], [1, 1], blocks=2)
        assert weighted_key_cut(ds2, "k", "w", 1) == (0, 0)
        assert weighted_key_cut(ds2, "k", "w", 2) == (2**62, 1)

    def test_overflow_regression_symmetric_extremes(self):
        # ADVICE repro: {-2^62 (w=5), +2^62 (w=7)} misbinned weight 7
        # into bin 0 under the old math.
        ds = self._ds([-(2**62), 2**62], [5, 7], blocks=2)
        assert weighted_key_cut(ds, "k", "w", 5) == (-(2**62), 0)
        assert weighted_key_cut(ds, "k", "w", 6) == (2**62, 5)
        assert weighted_key_cut(ds, "k", "w", 12) == (2**62, 5)

    def test_overflow_regression_full_int64_span(self):
        # Keys at both int64 extremes: span is 2^64 keys, which does not
        # even fit int64 — the layout must be exact Python-int math.
        imin, imax = -(2**63), 2**63 - 1
        keys = [imin, -1, 0, imax]
        weights = [3, 2, 5, 4]
        ds = self._ds(keys, weights, blocks=2)
        assert weighted_key_cut(ds, "k", "w", 1) == (imin, 0)
        assert weighted_key_cut(ds, "k", "w", 4) == (-1, 3)
        assert weighted_key_cut(ds, "k", "w", 10) == (0, 5)
        assert weighted_key_cut(ds, "k", "w", 14) == (imax, 10)

    def test_key_range(self):
        ds = self._ds([-7, 3, 9999], [1, 1, 1], blocks=2)
        assert key_range(ds, "k") == (-7, 9999)


@pytest.mark.usefixtures("ray_session")
class TestSelectionPipelines:
    def test_token_budget_prefix_property(self, sf_dir):
        """Kept set = exactly the docs whose exclusive prefix sum over
        (zdist, doc_id) order is < budget — recomputed flat."""
        from png_from_pdf_extracter_ray.pipelines.selection import (
            TOKEN_BUDGET_PCT,
            token_budget_select,
            zdist_tokens_batch,
        )

        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        slim = zdist_tokens_batch(docs).sort_values(
            ["zdist", "doc_id"], ignore_index=True
        )
        budget = (int(slim["n_tokens"].sum()) * TOKEN_BUDGET_PCT) // 100
        cum_excl = slim["n_tokens"].cumsum() - slim["n_tokens"]
        expected = set(slim.loc[cum_excl < budget, "doc_id"])

        got = token_budget_select(sf_dir).to_pandas()
        assert set(got["doc_id"]) == expected
        assert 0 < len(got) < len(slim)  # non-degenerate on the corpus

    def test_balanced_sample_group_rates(self, sf_dir):
        """Every group's kept count respects its exact integer
        threshold; the skewed group (en) is actually downsampled."""
        from png_from_pdf_extracter_ray.pipelines.selection import (
            HASH_SPACE,
            balanced_sample,
        )

        import hashlib

        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        n = docs.groupby("lang").size()
        thresh = {g: (HASH_SPACE * int(n.min())) // int(c) for g, c in n.items()}
        expected = {
            int(i)
            for i, g in zip(docs["doc_id"], docs["lang"])
            if int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) < thresh[g]
        }
        got = balanced_sample(sf_dir).to_pandas()
        assert set(got["doc_id"]) == expected
        kept = got.groupby("lang").size()
        assert kept["en"] < n["en"]  # the dominant group was downsampled
        assert n.min() > 0 and len(kept) == len(n)


@pytest.mark.usefixtures("ray_session")
class TestTriangleCounts:
    def _counts(self, pairs):
        from png_from_pdf_extracter_ray.stages.linkgraph import triangle_counts
        from png_from_pdf_extracter_ray.stages.neardup import _to_pandas_safe

        df = pd.DataFrame(pairs, columns=["src_host", "dst_host"])
        out = _to_pandas_safe(
            triangle_counts(rd.from_pandas(df)), ["node", "n_triangles"]
        )
        return dict(zip(out["node"], out["n_triangles"]))

    def test_known_small_graph(self):
        # K4 on {a,b,c,d}: 4 triangles, every node in 3
        nodes = ["a", "b", "c", "d"]
        pairs = [(u, v) for u in nodes for v in nodes if u != v]
        assert self._counts(pairs) == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_triangle_plus_tail(self):
        # triangle a-b-c plus pendant edge c-d: d in no triangle
        pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        assert self._counts(pairs) == {"a": 1, "b": 1, "c": 1}

    def test_direction_and_duplicates_ignored(self):
        pairs = [
            ("a", "b"),
            ("b", "a"),
            ("b", "c"),
            ("c", "a"),
            ("a", "c"),
            ("a", "a"),  # self loop dropped
            ("a", "b"),  # duplicate
        ]
        assert self._counts(pairs) == {"a": 1, "b": 1, "c": 1}

    def test_square_no_triangles(self):
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        assert self._counts(pairs) == {}

    def test_random_graph_vs_flat(self):
        rng = np.random.RandomState(5)
        hosts = [f"h{i}" for i in range(30)]
        pairs = set()
        for _ in range(120):
            u, v = rng.choice(30, 2, replace=False)
            pairs.add((hosts[u], hosts[v]))
        # flat reference: adjacency-set intersection per edge
        und = {frozenset(p) for p in pairs}
        adj: dict[str, set[str]] = {}
        for e in und:
            u, v = sorted(e)
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        flat: dict[str, int] = {}
        tri = 0
        for u, v in (sorted(e) for e in und):
            for w in adj[u] & adj[v]:
                if w > v:  # count each triangle once (u < v < w)
                    tri += 1
                    for x in (u, v, w):
                        flat[x] = flat.get(x, 0) + 1
        got = self._counts(sorted(pairs))
        assert got == flat
        assert sum(got.values()) == 3 * tri

    def test_broadcast_join_parity(self):
        # degrees="join" (bucketed degree joins, no driver node table)
        # must be bit-identical to the broadcast mode — incl. with the
        # degree column carried through (the host_clustering_coeff shape)
        from png_from_pdf_extracter_ray.stages.linkgraph import triangle_counts
        from png_from_pdf_extracter_ray.stages.neardup import _to_pandas_safe

        rng = np.random.RandomState(17)
        hosts = [f"h{i}" for i in range(25)]
        pairs = sorted(
            {
                (hosts[u], hosts[v])
                for u, v in (
                    rng.choice(25, 2, replace=False) for _ in range(150)
                )
            }
        )
        df = pd.DataFrame(pairs, columns=["src_host", "dst_host"])
        for with_degree in (False, True):
            cols = (
                ["node", "n_triangles", "degree"]
                if with_degree
                else ["node", "n_triangles"]
            )
            a = _to_pandas_safe(
                triangle_counts(
                    rd.from_pandas(df), with_degree=with_degree, degrees="broadcast"
                ),
                cols,
            ).sort_values("node", ignore_index=True)
            b = _to_pandas_safe(
                triangle_counts(
                    rd.from_pandas(df), with_degree=with_degree, degrees="join"
                ),
                cols,
            ).sort_values("node", ignore_index=True)
            pd.testing.assert_frame_equal(a[cols], b[cols])


@pytest.mark.usefixtures("ray_session")
class TestFollowOns:
    def test_token_weighted_percentiles_vs_flat(self, sf_dir):
        from png_from_pdf_extracter_ray.pipelines.selection import (
            PCTS,
            token_weighted_length_percentiles,
        )
        from png_from_pdf_extracter_ray.stages.text_stats import token_count_batch

        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        ).to_pandas()
        slim = token_count_batch(docs)[["n_chars", "n_tokens"]]
        by_len = (
            slim.groupby("n_chars", as_index=False)["n_tokens"]
            .sum()
            .sort_values("n_chars", ignore_index=True)
        )
        cum = by_len["n_tokens"].cumsum().to_numpy()
        tot = int(slim["n_tokens"].sum())
        expect = {}
        for p in PCTS:
            target = max(1, (tot * p) // 100)
            expect[p] = int(
                by_len["n_chars"].iloc[int(np.searchsorted(cum, target, "left"))]
            )
        got = token_weighted_length_percentiles(sf_dir).to_pandas()
        assert dict(zip(got["pct"], got["n_chars_le"])) == expect
        # monotone by construction
        assert got["n_chars_le"].is_monotonic_increasing

    def test_clustering_coeff_formula(self):
        """cc on K4 is exactly 1.0 (degree 3, 3 triangles per node)."""
        from png_from_pdf_extracter_ray.stages.linkgraph import triangle_counts

        nodes = ["a", "b", "c", "d"]
        pairs = pd.DataFrame(
            [(u, v) for u in nodes for v in nodes if u != v],
            columns=["src_host", "dst_host"],
        )
        out = triangle_counts(
            rd.from_pandas(pairs), with_degree=True
        ).to_pandas()
        assert set(out["degree"]) == {3}
        cc = (2 * out["n_triangles"] * 1_000_000) // (
            out["degree"] * (out["degree"] - 1)
        )
        assert set(cc) == {1_000_000}

    def test_jsonl_roundtrip_digest_nonzero(self, sf_dir):
        from png_from_pdf_extracter_ray.pipelines.ingest import (
            jsonl_roundtrip_digest,
        )

        t = jsonl_roundtrip_digest(sf_dir).to_pandas()
        assert len(t) == 1
        assert int(t["n_rows"][0]) == 500
        assert int(t["xor_digest"][0]) != 0
        assert int(t["total_chars"][0]) > 0


@pytest.mark.usefixtures("ray_session")
class TestShardsAndSample:
    def test_token_balanced_shards_vs_flat(self, sf_dir):
        """Assignment equals the flat closed form AND the shard token
        masses are balanced (each within one max-doc of total/S)."""
        import hashlib

        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.selection import (
            N_SHARDS,
            token_balanced_shards,
        )
        from png_from_pdf_extracter_ray.stages.text_stats import token_count_batch

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        slim = token_count_batch(docs)[["doc_id", "n_tokens"]].copy()
        slim["hkey"] = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            for i in slim["doc_id"]
        ]
        slim = slim.sort_values(["hkey", "doc_id"], ignore_index=True)
        cum_excl = slim["n_tokens"].cumsum() - slim["n_tokens"]
        tot = int(slim["n_tokens"].sum())
        expect = np.minimum(
            (N_SHARDS * (cum_excl + 1) - 1) // tot, N_SHARDS - 1
        ).to_numpy()

        got = token_balanced_shards(sf_dir).to_pandas()
        m = dict(zip(got["doc_id"], got["shard_id"]))
        assert [m[i] for i in slim["doc_id"]] == list(expect)
        mass = slim.assign(s=expect).groupby("s")["n_tokens"].sum()
        assert len(mass) == N_SHARDS
        assert mass.max() - mass.min() <= tot // N_SHARDS + int(slim["n_tokens"].max())

    def test_exact_count_sample_is_exact_prefix(self, sf_dir):
        import hashlib

        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.selection import (
            SAMPLE_K,
            exact_count_sample,
        )

        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).to_pandas()["doc_id"]
        order = sorted(
            ids,
            key=lambda i: (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16),
                i,
            ),
        )
        got = set(exact_count_sample(sf_dir).to_pandas()["doc_id"])
        assert got == set(order[:SAMPLE_K])
        assert len(got) == SAMPLE_K


@pytest.mark.usefixtures("ray_session")
class TestMultiCut:
    def test_multi_matches_singles(self):
        from png_from_pdf_extracter_ray.stages.selection import (
            weighted_key_cut,
            weighted_multi_cut,
        )

        rng = np.random.RandomState(19)
        keys = rng.randint(0, 2**45, size=400).astype(np.int64)
        weights = rng.randint(1, 20, size=400).astype(np.int64)
        df = pd.DataFrame({"k": keys, "w": weights})
        ds = rd.from_pandas(df).repartition(7)
        tot = int(weights.sum())
        targets = [1, tot // 7, tot // 3, tot // 2, (3 * tot) // 4, tot]
        multi = weighted_multi_cut(ds, "k", "w", targets)
        singles = [weighted_key_cut(ds, "k", "w", t) for t in targets]
        assert multi == singles

    def test_duplicate_and_unsorted_targets(self):
        from png_from_pdf_extracter_ray.stages.selection import weighted_multi_cut

        df = pd.DataFrame({"k": [5, 1, 9, 1], "w": [2, 3, 4, 1]})
        ds = rd.from_pandas(df).repartition(2)
        # order preserved, duplicates independent
        out = weighted_multi_cut(ds, "k", "w", [6, 4, 6, 10])
        assert out == [(5, 4), (1, 0), (5, 4), (9, 6)]


@pytest.mark.usefixtures("ray_session")
class TestCalibratedFilter:
    def test_exact_keep_rate_and_membership(self, sf_dir):
        from png_from_pdf_extracter_ray.pipelines.selection import (
            KEEP_PCT,
            calibrated_quality_filter,
        )
        from png_from_pdf_extracter_ray.stages.ml import ridge_flat

        import pyarrow.parquet as pq

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        ).to_pandas()
        _, flat = ridge_flat(docs)
        flat["amicros"] = (
            np.abs(np.rint(flat["resid"].to_numpy() * 1_000_000)).astype(np.int64)
        )
        flat = flat.sort_values(["amicros", "doc_id"], ignore_index=True)
        n = len(flat)
        k = max(1, (n * KEEP_PCT) // 100)
        expected = set(flat["doc_id"].iloc[:k])

        got = calibrated_quality_filter(sf_dir).to_pandas()
        assert len(got) == k  # EXACT keep count — the calibration claim
        assert set(got["doc_id"]) == expected


@pytest.mark.usefixtures("ray_session")
class TestCutProperties:
    """Hypothesis properties for the cut primitive.  Few examples —
    each drives a real Ray aggregate — but fully adversarial inputs
    (arbitrary int64 keys incl. extremes, zero weights, duplicates)."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.integers(min_value=0, max_value=100),
            ),
            min_size=1,
            max_size=60,
        ),
        st.data(),
    )
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_cut_matches_flat(self, rows, data):
        keys = np.array([k for k, _ in rows], dtype=np.int64)
        weights = np.array([w for _, w in rows], dtype=np.int64)
        total = int(weights.sum())
        if total < 1:
            return
        target = data.draw(self.st.integers(min_value=1, max_value=total))
        ds = rd.from_pandas(pd.DataFrame({"k": keys, "w": weights})).repartition(3)
        got = weighted_key_cut(ds, "k", "w", target)
        assert got == _flat_cut(keys, weights, target)
