"""Link-graph family: kernel contract, partition invariance, oracle parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from png_from_pdf_extracter_ray.corpus.synth import make_payload, page_url
from png_from_pdf_extracter_ray.kernel.links import extract_links, src_doc_of_url
from png_from_pdf_extracter_ray.stages.linkgraph import (
    HITS_SCALE,
    PAGERANK_SCALE,
    hits,
    hits_flat,
    pagerank,
    pagerank_flat,
)


class TestLinkKernel:
    def test_html_page_yields_links(self):
        url = page_url(3, 0)
        payload = make_payload(3, 0, "hello world " * 30, "en")
        links = extract_links(payload, url)
        assert links, "synthetic HTML page must contain anchors"
        # every nav/tag/related href resolves to an absolute same-host url
        assert all(l["href"].startswith("https://") for l in links)
        assert all(l["internal"] for l in links)
        doc_targets = [l["dst_doc"] for l in links if l["dst_doc"] >= 0]
        assert len(doc_targets) == 5  # the related-articles list

    def test_non_html_payloads_yield_nothing(self):
        assert extract_links(b"", "https://x.example/doc/1-0") == []
        assert extract_links(None, "https://x.example/doc/1-0") == []
        assert extract_links(b"%PDF-1.4 garbage", "https://x.example/doc/1-0") == []

    def test_attribute_variants_and_nested_markup(self):
        html = (
            b"<html><body>"
            b"<a class=\"x\" href='/a/1' id=\"y\">one <b>bold</b>\n two</a>"
            b'<A HREF="https://other.example/z">ext</A>'
            b'<a href="mailto:x@y.z">mail</a>'
            b"</body></html>"
        )
        links = extract_links(html, "https://site1.example/doc/7-0")
        assert [l["href"] for l in links] == [
            "https://site1.example/a/1",
            "https://other.example/z",
        ]
        assert links[0]["anchor"] == "one bold two"
        assert links[0]["internal"] and not links[1]["internal"]

    def test_hyphen_and_namespace_prefixed_href_attrs_ignored(self):
        # data-href/ng-href/xlink:href before the real href must not win
        html = (
            b'<html><body>'
            b'<a data-href="/evil" href="/real">a</a>'
            b'<a ng-href="/no" href="/yes">b</a>'
            b'<a xlink:href="/x" href="/y">c</a>'
            b'</body></html>'
        )
        links = extract_links(html, "https://s.example/doc/1-0")
        assert [l["href"] for l in links] == [
            "https://s.example/real",
            "https://s.example/yes",
            "https://s.example/y",
        ]

    def test_multipart_scans_every_html_part(self):
        from png_from_pdf_extracter_ray.kernel.sniff import (
            MULTIPART_BOUNDARY,
            MULTIPART_MAGIC,
        )

        p1 = b'<html><body><a href="/one">1</a></body></html>'
        p2 = b"%PDF-1.4 not html"
        p3 = b'<html><body><a href="/two">2</a></body></html>'
        payload = MULTIPART_MAGIC + MULTIPART_BOUNDARY.join([p1, p2, p3])
        links = extract_links(payload, "https://s.example/doc/2-0")
        assert [l["href"] for l in links] == [
            "https://s.example/one",
            "https://s.example/two",
        ]

    def test_src_doc_of_url(self):
        assert src_doc_of_url("https://site9.example/doc/42-1") == 42
        assert src_doc_of_url("https://site9.example/doc/42") == -1
        assert src_doc_of_url("https://site9.example/other/42-1") == -1


class TestPagerankFlat:
    def test_two_node_cycle_is_symmetric(self):
        edges = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        pr = pagerank_flat(edges, iters=8)
        assert pr["rank_micros"].nunique() == 1  # symmetric graph, equal ranks

    def test_sink_gains_rank(self):
        # star: 1..5 all link to 9 — 9 must outrank the spokes
        edges = pd.DataFrame({"src": [1, 2, 3, 4, 5], "dst": [9] * 5})
        pr = pagerank_flat(edges).set_index("node")["rank_micros"]
        assert pr[9] > pr[1]

    def test_mass_approximately_conserved(self):
        edges = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 1]})
        pr = pagerank_flat(edges, iters=4)
        total = pr["rank_micros"].sum()
        n = pr["node"].nunique()
        # integer floors only ever lose mass, never create it
        assert total <= n * PAGERANK_SCALE
        assert total >= n * PAGERANK_SCALE * 0.99

    def test_self_loops_and_dup_edges_ignored(self):
        base = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        noisy = pd.DataFrame(
            {"src": [1, 2, 1, 1], "dst": [2, 1, 1, 2]}  # + self-loop + dup
        )
        assert pagerank_flat(base).equals(pagerank_flat(noisy))


class TestHitsFlat:
    def test_star_hub_and_authority(self):
        # 1..5 all link to 9: the spokes are pure hubs, 9 the sole authority
        edges = pd.DataFrame({"src": [1, 2, 3, 4, 5], "dst": [9] * 5})
        ht = hits_flat(edges).set_index("node")
        assert ht.loc[9, "auth"] > 0 and ht.loc[9, "hub"] == 0
        assert ht.loc[1, "hub"] > 0 and ht.loc[1, "auth"] == 0
        assert (ht.loc[[1, 2, 3, 4, 5], "hub"].nunique()) == 1

    def test_scores_bounded_by_normalization(self):
        edges = pd.DataFrame(
            {"src": [1, 1, 2, 3, 4, 4, 5], "dst": [2, 3, 3, 1, 1, 5, 2]}
        )
        ht = hits_flat(edges, iters=8)
        assert int(ht["auth"].max()) < 2 * HITS_SCALE
        assert int(ht["hub"].max()) < 2 * HITS_SCALE

    def test_self_loops_and_dup_edges_ignored(self):
        base = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        noisy = pd.DataFrame({"src": [1, 2, 1, 1], "dst": [2, 1, 1, 2]})
        assert hits_flat(base).equals(hits_flat(noisy))


@pytest.mark.usefixtures("ray_session")
class TestEngineVsFlat:
    def test_pagerank_partition_invariant_and_matches_flat(self, sf_dir):
        import ray.data as rd

        from png_from_pdf_extracter_ray.pipelines.linkgraph import (
            _deduped_pages_payloads,
        )
        from png_from_pdf_extracter_ray.stages.linkgraph import doc_edges

        edges_df = (
            doc_edges(_deduped_pages_payloads(sf_dir))
            .to_pandas()[["src", "dst"]]
            .sort_values(["src", "dst"], ignore_index=True)
        )
        flat = pagerank_flat(edges_df).sort_values("node", ignore_index=True)

        for buckets in (4, 17):  # different bucketings must agree bit-for-bit
            eng = (
                pagerank(rd.from_pandas(edges_df.assign(
                    outdeg=edges_df.groupby("src")["dst"].transform("size").astype(np.int64)
                )), num_buckets=buckets)
                .to_pandas()
                .sort_values("node", ignore_index=True)
            )
            pd.testing.assert_frame_equal(eng, flat)

    def test_hits_partition_invariant_and_matches_flat(self, sf_dir):
        import ray.data as rd

        from png_from_pdf_extracter_ray.pipelines.linkgraph import (
            _deduped_pages_payloads,
        )
        from png_from_pdf_extracter_ray.stages.linkgraph import doc_edges

        edges_df = (
            doc_edges(_deduped_pages_payloads(sf_dir))
            .to_pandas()[["src", "dst"]]
            .sort_values(["src", "dst"], ignore_index=True)
        )
        flat = hits_flat(edges_df).sort_values("node", ignore_index=True)

        for buckets in (4, 17):
            eng = (
                hits(rd.from_pandas(edges_df), num_buckets=buckets)
                .to_pandas()
                .sort_values("node", ignore_index=True)
            )
            pd.testing.assert_frame_equal(eng, flat)

    def test_star_components_deep_chain(self, sf_dir):
        # a 300-hop path: min-label propagation would need 300 rounds;
        # large/small-star must converge in O(log) and label all to 0
        import ray.data as rd

        from png_from_pdf_extracter_ray.stages.linkgraph import star_components

        n = 300
        edges = pd.DataFrame(
            {"u": np.arange(n - 1, dtype=np.int64), "v": np.arange(1, n, dtype=np.int64)}
        )
        out = (
            star_components(rd.from_pandas(edges), num_buckets=5)
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        assert len(out) == n
        assert (out["label"] == 0).all()

    def test_star_components_random_noisy_graph_matches_union_find(self, sf_dir):
        import ray.data as rd

        from png_from_pdf_extracter_ray.pipelines.rowsonly_oracles import (
            _union_find_min_labels,
        )
        from png_from_pdf_extracter_ray.stages.linkgraph import star_components

        rng = np.random.RandomState(7)
        # sparse random graph + duplicate edges + self-loops
        u = rng.randint(0, 500, 400)
        v = rng.randint(0, 500, 400)
        edges = pd.DataFrame(
            {
                "u": np.concatenate([u, u[:50], np.arange(20)]).astype(np.int64),
                "v": np.concatenate([v, v[:50], np.arange(20)]).astype(np.int64),
            }
        )
        eng = (
            star_components(rd.from_pandas(edges), num_buckets=7)
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        clean = edges[edges["u"] != edges["v"]]
        uf = _union_find_min_labels(
            clean.rename(columns={"u": "id_a", "v": "id_b"})
        ).rename(columns={"url": "id", "group_id": "label"})
        # the engine's universe additionally contains pure-self-loop nodes
        # (label = self); fold them into the expectation
        uf_map = dict(zip(uf["id"], uf["label"]))
        expect = pd.DataFrame(
            {
                "id": eng["id"],
                "label": [uf_map.get(i, i) for i in eng["id"]],
            }
        ).astype({"id": "int64", "label": "int64"})
        pd.testing.assert_frame_equal(eng, expect)

    def test_hits_normalizes_raw_pair_input(self, sf_dir):
        # duplicates + self-loops in raw input must not double-count mass:
        # the engine normalizes and must equal the flat twin on BOTH forms
        import ray.data as rd

        noisy = pd.DataFrame({"src": [1, 2, 1, 1, 2], "dst": [2, 1, 1, 2, 2]})
        clean = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        eng = (
            hits(rd.from_pandas(noisy), num_buckets=3)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        pd.testing.assert_frame_equal(eng, hits_flat(noisy).sort_values("node", ignore_index=True))
        pd.testing.assert_frame_equal(eng, hits_flat(clean).sort_values("node", ignore_index=True))

    def test_pagerank_scale_guard_raises(self, sf_dir):
        import ray.data as rd

        from png_from_pdf_extracter_ray.stages.linkgraph import pagerank

        edges = pd.DataFrame(
            {"src": [1], "dst": [2], "outdeg": pd.Series([1], dtype="int64")}
        )
        with pytest.raises(ValueError, match="overflow"):
            pagerank(rd.from_pandas(edges), scale=2**62)

    def test_components_query_matches_union_find(self, sf_dir):
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines import rowsonly_oracles as rro
        from png_from_pdf_extracter_ray.pipelines.linkgraph import (
            linkgraph_components,
        )

        paths = rro.write_linkgraph_graph_oracles(sf_dir)
        eng = linkgraph_components(sf_dir)
        ora = pq.read_table(paths["link_components"]).to_pandas()
        pd.testing.assert_frame_equal(eng, ora)
        assert eng["component"].nunique() < len(eng)  # real merging happened

    def test_frontier_query_matches_oracle(self, sf_dir):
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines import rowsonly_oracles as rro
        from png_from_pdf_extracter_ray.pipelines.linkgraph import crawl_frontier_urls

        path = rro.write_crawl_frontier_oracle(sf_dir)
        eng = crawl_frontier_urls(sf_dir)
        ora = pq.read_table(path).to_pandas()
        pd.testing.assert_frame_equal(eng, ora)
        assert len(eng) > 0  # /doc/<n> related links are never crawled urls

    def test_digest_query_matches_oracle(self, sf_dir):
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines import rowsonly_oracles as rro
        from png_from_pdf_extracter_ray.pipelines.linkgraph import page_links_digest

        paths = rro.write_linkgraph_oracles(sf_dir)
        eng = page_links_digest(sf_dir)
        ora = pq.read_table(paths["links_digest"]).to_pandas()
        pd.testing.assert_frame_equal(
            eng.astype("int64").reset_index(drop=True), ora
        )
        assert int(eng["n_links"].iloc[0]) > 0


class TestKhopReach:
    def test_khop_matches_flat_bfs_on_noisy_random_graph(self, ray_session):  # noqa: ANN001
        import ray.data as rd

        from png_from_pdf_extracter_ray.stages.linkgraph import (
            khop_reach,
            khop_reach_flat,
        )

        rng = np.random.RandomState(11)
        u = rng.randint(0, 400, 600)
        v = rng.randint(0, 400, 600)
        edges = pd.DataFrame(
            {
                # duplicates + self-loops exercise normalization
                "src": np.concatenate([u, u[:80], np.arange(15)]).astype(np.int64),
                "dst": np.concatenate([v, v[:80], np.arange(15)]).astype(np.int64),
            }
        )
        eng = (
            khop_reach(rd.from_pandas(edges), k=3, seed_mod=41, num_buckets=7)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        flat = khop_reach_flat(edges, k=3, seed_mod=41)
        pd.testing.assert_frame_equal(eng[["node", "hops"]], flat)

    def test_seeds_have_hop_zero_and_hops_bounded(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.linkgraph import link_khop_reach
        from png_from_pdf_extracter_ray.stages.linkgraph import (
            KHOP_MAX_HOPS,
            KHOP_SEED_MOD,
        )

        out = link_khop_reach(sf_dir)
        assert (out["hops"] >= 0).all() and (out["hops"] <= KHOP_MAX_HOPS).all()
        seeds = out[out["node"] % KHOP_SEED_MOD == 0]
        assert (seeds["hops"] == 0).all()
        assert len(seeds) and len(out) > len(seeds)


def test_search_index_topk_invariants(ray_session, sf_dir) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.linkgraph import search_index_topk

    out = search_index_topk(sf_dir, k=25)
    assert 0 < len(out) <= 25
    assert list(out.columns) == ["url", "title", "rank_micros"]
    r = out["rank_micros"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    # rank ties break by url ascending
    import numpy as np

    ties = np.flatnonzero(r[:-1] == r[1:])
    urls = out["url"].to_numpy(dtype=object)
    assert all(urls[i] < urls[i + 1] for i in ties)
    assert out["url"].is_unique
    assert (out["title"] != "").all()
