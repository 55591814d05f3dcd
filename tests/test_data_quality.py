"""Unit tests for the data-quality kernels (duplicate spans, repetition
stats, PII scrub) — edge cases the SQL-parity sweep can't isolate:
doc-boundary masking, short-doc policies, within-doc distinctness.
The full engine-vs-DuckDB comparison lives in test_queries_vs_duckdb."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from png_from_pdf_extracter_ray.pipelines.data_quality import (
    PII_EMAIL,
    _augment,
    _batch_span_rows,
    _repetition_batch,
)


def _spans(texts: list[str], k: int = 3) -> dict[int, set[int]]:
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ids, hashes = _batch_span_rows(df, k)
    out: dict[int, set[int]] = {}
    for i, h in zip(ids, hashes):
        out.setdefault(int(i), set()).add(int(h))
    return out


class TestSpanRows:
    def test_short_docs_emit_nothing(self) -> None:
        assert _spans(["a b", "", "   "], k=3) == {}

    def test_exact_window_count(self) -> None:
        # 5 tokens, k=3 → 3 distinct spans
        out = _spans(["a b c d e"], k=3)
        assert len(out[0]) == 3

    def test_within_doc_duplicates_collapse(self) -> None:
        # "a b c a b c a b c": windows repeat — distinct spans only
        out = _spans(["a b c a b c a b c"], k=3)
        # distinct trigrams: (a b c), (b c a), (c a b) = 3
        assert len(out[0]) == 3

    def test_no_cross_doc_phantom_spans(self) -> None:
        # doc0 ends "x y", doc1 starts "z w": the straddling window
        # "x y z" must NOT exist in either doc
        out = _spans(["p q x y", "z w r s"], k=3)
        straddle = _spans(["x y z"], k=3)[0]
        assert not (out[0] & straddle) and not (out[1] & straddle)

    def test_identical_docs_share_hashes(self) -> None:
        out = _spans(["one two three four", "one two three four"], k=3)
        assert out[0] == out[1]


class TestRepetitionBatch:
    def _run(self, texts: list[str]) -> pd.DataFrame:
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        return _repetition_batch(df).to_pandas()

    def test_empty_and_blank_docs_are_zero_rows(self) -> None:
        out = self._run(["", "   "])
        assert (out["n_tokens"] == 0).all()
        assert (out["top_bigram_n"] == 0).all()
        assert (out["n_trigrams"] == 0).all()
        assert (out["sum_token_chars"] == 0).all()

    def test_repeated_token_doc(self) -> None:
        out = self._run(["a a a a"])
        row = out.iloc[0]
        assert row["n_tokens"] == 4
        assert row["top_bigram_n"] == 3  # "a a" occurs 3x
        assert row["n_trigrams"] == 2 and row["n_distinct_trigrams"] == 1
        assert row["sum_token_chars"] == 4

    def test_doc_boundary_bigrams_masked(self) -> None:
        # two docs, each 1 token: no bigram may form across the boundary
        out = self._run(["aa", "bb"])
        assert (out["top_bigram_n"] == 0).all()
        assert out["sum_token_chars"].tolist() == [2, 2]

    def test_case_and_whitespace_normalization(self) -> None:
        a = self._run(["Foo  BAR foo bar"]).iloc[0]
        assert a["n_tokens"] == 4
        # "foo bar" bigram occurs twice after lowering
        assert a["top_bigram_n"] == 2


class TestPII:
    def test_augment_is_deterministic_and_matches_patterns(self) -> None:
        import re

        ids = pd.Series([0, 7, 300], dtype="int64")
        aug = _augment(ids, pd.Series(["x", "y", "z"]))
        for s, i in zip(aug, ids):
            assert f"doc{i}@example.com" in s
            assert f"10.1.{i % 256}.7" in s
            assert re.search(PII_EMAIL, s)

    def test_scrub_counts_hand_built(self, ray_session, tmp_path) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.data_quality import pii_scrub

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["mail me at a.b@c.org or d@e.io", "no pii here"], pa.string()
                ),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["t", "t"], pa.string()),
                "n_chars": pa.array([10, 11], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = pii_scrub(str(tmp_path)).to_pandas().sort_values("doc_id")
        # doc 1: two real emails + one injected; doc 2: injected only
        assert out["n_emails"].tolist() == [3, 1]
        assert out["n_ips"].tolist() == [1, 1]
        assert out["n_phones"].tolist() == [1, 1]
        assert "<EMAIL>" not in out["redacted_fp"].iloc[0]  # fp is a hash


class TestDuplicateSpanStats:
    def test_zero_fill_when_all_docs_short(self, ray_session, tmp_path) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            duplicate_span_stats,
        )

        t = pa.table(
            {
                "doc_id": pa.array([5, 9], pa.int64()),
                "text": pa.array(["a b", "c"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["t", "t"], pa.string()),
                "n_chars": pa.array([3, 1], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = duplicate_span_stats(str(tmp_path), span_k=8)
        assert out["doc_id"].tolist() == [5, 9]
        assert (out["n_spans"] == 0).all() and (out["n_dup_spans"] == 0).all()

    def test_dup_marking_hand_built(self, ray_session, tmp_path) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            duplicate_span_stats,
        )

        shared = "one two three four five six seven eight"
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [shared + " tail-a", shared + " tail-b", "solo " + "w " * 10],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["t"] * 3, pa.string()),
                "n_chars": pa.array([1, 1, 1], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = duplicate_span_stats(str(tmp_path), span_k=8).set_index("doc_id")
        # docs 1/2: 9 tokens → 2 spans each; the 8-token prefix is shared
        assert out.loc[1, "n_spans"] == 2 and out.loc[1, "n_dup_spans"] == 1
        assert out.loc[2, "n_spans"] == 2 and out.loc[2, "n_dup_spans"] == 1
        # doc 3: "solo w w w w w w w w w w" = 11 tokens → 4 spans, but
        # repeated-w windows collapse: spans are distinct-per-doc
        assert out.loc[3, "n_dup_spans"] == 0


class TestRemoveDuplicateSpans:
    def _write(self, tmp_path, texts):  # noqa: ANN001, ANN202
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t_) for t_ in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_shared_span_removed_from_both_docs(self, ray_session, tmp_path) -> None:
        import hashlib

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            remove_duplicate_spans,
        )

        shared = "one two three four five six seven eight"
        texts = [f"aa {shared} bb", f"cc {shared} dd", "solo text here stays intact"]
        out = remove_duplicate_spans(self._write(tmp_path, texts), span_k=8).set_index(
            "doc_id"
        )
        # the shared 8-token span is covered in both docs; only the
        # unshared edges stay.  Doc1 keeps "aa bb"? NO — windows: with
        # 10 tokens there are 3 windows; only the middle window (the
        # shared span) is duplicated, so its 8 tokens go, keeping aa/bb.
        assert out.loc[1, "n_tokens_kept"] == 2
        assert out.loc[1, "kept_fp"] == hashlib.md5(b"aa bb").hexdigest()
        assert out.loc[2, "kept_fp"] == hashlib.md5(b"cc dd").hexdigest()
        # untouched doc keeps everything verbatim (lowered)
        assert out.loc[3, "n_tokens_kept"] == 5
        assert (
            out.loc[3, "kept_fp"]
            == hashlib.md5(b"solo text here stays intact").hexdigest()
        )

    def test_within_doc_repeat_is_not_corpus_duplicate(
        self, ray_session, tmp_path
    ) -> None:
        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            remove_duplicate_spans,
        )

        # one doc repeating its own span — df counts DISTINCT docs, so
        # nothing is removed
        t = "p q r s t u v w " * 2 + "tail"
        out = remove_duplicate_spans(self._write(tmp_path, [t]), span_k=8)
        assert out["n_tokens_kept"].iloc[0] == 17


class TestContextPacking:
    """Cross-document bin packing invariants (textops.pack_documents_greedy)."""

    @pytest.fixture(scope="class")
    def packed(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.textops import (
            PACK_CAPACITY,
            pack_documents_greedy,
        )

        return pack_documents_greedy(sf_dir), PACK_CAPACITY

    def test_every_doc_assigned_once(self, packed, sf_dir) -> None:  # noqa: ANN001
        import pyarrow.parquet as pq

        out, _ = packed
        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        assert len(out) == n_docs
        assert out["doc_id"].is_unique

    def test_bins_respect_capacity(self, packed) -> None:  # noqa: ANN001
        out, cap = packed
        fills = out.groupby(["shard", "bin_id"]).agg(
            total=("n_tokens", "sum"), n=("doc_id", "count")
        )
        # a bin over capacity must be a single oversized document
        over = fills[fills["total"] > cap]
        assert (over["n"] == 1).all()

    def test_greedy_is_first_fit_in_id_order(self, packed) -> None:  # noqa: ANN001
        out, cap = packed
        for _, g in out.groupby("shard"):
            g = g.sort_values("doc_id", ignore_index=True)
            # bin ids are non-decreasing and dense in doc_id order
            d = g["bin_id"].diff().fillna(0)
            assert set(d.unique()) <= {0.0, 1.0}
            # replay the greedy rule and demand identical bin ids
            fill, bin_id, replay = 0, 0, []
            for t in g["n_tokens"]:
                if fill > 0 and fill + t > cap:
                    bin_id += 1
                    fill = 0
                replay.append(bin_id)
                fill += int(t)
            assert replay == g["bin_id"].tolist()


class TestHostTokenConcentration:
    def test_invariants_on_sf(self, ray_session, sf_dir) -> None:  # noqa: ANN001
        import numpy as np

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            host_token_concentration,
        )

        out = host_token_concentration(sf_dir)
        assert len(out) > 0
        # rank is a 1..N permutation in (n_tokens DESC, host ASC) order
        assert out["host_rank"].tolist() == list(range(1, len(out) + 1))
        nt = out["n_tokens"].to_numpy()
        assert (nt[:-1] >= nt[1:]).all()
        ties = nt[:-1] == nt[1:]
        hosts = out["host"].to_numpy(dtype=object)
        assert all(hosts[i] < hosts[i + 1] for i in np.flatnonzero(ties))
        # cumulative share is nondecreasing and ends at 1
        cs = out["cum_share"].to_numpy()
        assert (np.diff(cs) >= -1e-9).all()
        assert abs(cs[-1] - 1.0) < 1e-6
        # page counts are positive and token totals consistent
        assert (out["n_pages"] > 0).all()

    def test_batch_invariance(self, ray_session, sf_dir) -> None:  # noqa: ANN001
        import pandas as pd

        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            host_token_concentration,
        )

        a = host_token_concentration(sf_dir, num_buckets=2)
        b = host_token_concentration(sf_dir, num_buckets=16)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
