"""Round-4 dedup operators: perceptual-hash page near-dups and
cross-document exact-substring removal (invariants beyond the exact
parity check in test_queries_vs_duckdb)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestPagesPhash:
    @pytest.fixture(scope="class")
    def pairs(self, ray_session, sf_dir) -> pd.DataFrame:  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.textops import pages_phash_near_dups

        return pages_phash_near_dups(sf_dir)

    def test_radius_and_ordering(self, pairs) -> None:  # noqa: ANN001
        assert len(pairs) > 0  # url-variant re-renders exist in the corpus
        assert (pairs["hamming"] >= 0).all() and (pairs["hamming"] <= 3).all()
        assert (pairs["id_a"] < pairs["id_b"]).all()
        # page ids are url#page_number
        assert pairs["id_a"].str.contains("#").all()

    def test_globally_distinct(self, pairs) -> None:  # noqa: ANN001
        assert not pairs.duplicated(subset=["id_a", "id_b"]).any()

    def test_capped_mode_is_subset(self, ray_session, sf_dir, pairs) -> None:  # noqa: ANN001
        """max_block_group (the web-scale dial for biased signatures)
        may only LOSE pairs, never invent or duplicate them."""
        from png_from_pdf_extracter_ray.pipelines.textops import _extracted_pages
        from png_from_pdf_extracter_ray.stages.multimodal import (
            PagePHasher,
            explode_pages,
        )
        from png_from_pdf_extracter_ray.stages.neardup import hamming_near_dup_pairs
        import pyarrow as pa

        sigs = (
            _extracted_pages(sf_dir)
            .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
            .map_batches(
                PagePHasher, batch_format="pyarrow", batch_size=32, concurrency=(1, 2)
            )
        )
        capped = hamming_near_dup_pairs(
            sigs,
            id_col="page_id",
            sig_col="phash",
            id_type=pa.string(),
            max_block_group=8,
        )
        assert not capped.duplicated(subset=["id_a", "id_b"]).any()
        full = set(zip(pairs["id_a"], pairs["id_b"]))
        got = set(zip(capped["id_a"], capped["id_b"]))
        assert got <= full


class TestPhashKernel:
    def test_empty_page_hashes_to_zero(self) -> None:
        from png_from_pdf_extracter_ray.stages.multimodal import phash64_ink

        assert phash64_ink(np.full((64, 64), 255, dtype=np.uint8)) == 0

    def test_deterministic_and_discriminative(self) -> None:
        from png_from_pdf_extracter_ray.stages.multimodal import phash64_ink

        rng = np.random.default_rng(7)
        a = np.full((128, 128), 255, dtype=np.uint8)
        a[10:20, 10:120] = 0
        b = a.copy()
        b[60:70, 10:120] = 0  # clearly different ink layout
        ha, hb = phash64_ink(a), phash64_ink(b)
        assert ha == phash64_ink(a.copy())
        assert ha != hb


class TestCrossDocSpans:
    @pytest.fixture(scope="class")
    def result(self, ray_session, sf_dir) -> pd.DataFrame:  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            cross_doc_duplicate_spans,
        )

        return (
            cross_doc_duplicate_spans(sf_dir)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )

    def test_one_row_per_document(self, result, sf_dir) -> None:  # noqa: ANN001
        import pyarrow.parquet as pq

        ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        assert len(result) == ids.num_rows
        assert set(result["doc_id"]) == set(ids["doc_id"].to_pylist())

    def test_removal_happened_and_is_bounded(self, result) -> None:  # noqa: ANN001
        # the synthetic corpus duplicates whole texts across doc_ids, so
        # cross-doc spans MUST be found and removed somewhere
        assert (result["n_removed"] > 0).any()
        assert (result["n_removed"] <= result["n_tokens"]).all()
        # clean text token count == n_tokens - n_removed
        n_clean = result["text_clean"].str.split().map(len)
        n_clean[result["text_clean"] == ""] = 0
        assert (n_clean == result["n_tokens"] - result["n_removed"]).all()

    def test_owner_semantics_on_synthetic_corpus(self, ray_session, tmp_path_factory) -> None:  # noqa: ANN001
        """Hand-built corpus with a known shared paragraph: the smallest
        doc_id keeps it, every other copy loses exactly its tokens, and
        unique text survives everywhere."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            cross_doc_duplicate_spans,
        )

        boiler = "all rights reserved contact us at example dot com today"  # 10 tokens
        docs = pa.Table.from_pydict(
            {
                "doc_id": pa.array([3, 7, 9], pa.int64()),
                "text": pa.array(
                    [
                        f"unique alpha beta gamma delta {boiler}",
                        f"{boiler} other words entirely here that differ fully",
                        "no shared spans in this document at all whatsoever okay",
                    ],
                    pa.string(),
                ),
            }
        )
        d = tmp_path_factory.mktemp("xdoc")
        pq.write_table(docs, str(d / "documents.parquet"))
        out = (
            cross_doc_duplicate_spans(str(d))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
            .set_index("doc_id")
        )
        # doc 3 owns the boilerplate (smallest id containing those spans)
        assert int(out.loc[3, "n_removed"]) == 0
        assert boiler in out.loc[3, "text_clean"]
        # doc 7 loses exactly the 10 boilerplate tokens, keeps its own
        assert int(out.loc[7, "n_removed"]) == 10
        assert boiler not in out.loc[7, "text_clean"]
        assert "other words entirely" in out.loc[7, "text_clean"]
        # doc 9 untouched
        assert int(out.loc[9, "n_removed"]) == 0
