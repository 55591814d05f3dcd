"""Kernel-level tests for the round-4-final quality/crawl kernels
(no Ray): zlib compression ratio, host node ids, paragraph split."""

from __future__ import annotations

import numpy as np
import pandas as pd

from png_from_pdf_extracter_ray.pipelines.data_quality import (
    ZRATIO_MAX,
    ZRATIO_MIN,
    _split_paras,
)
from png_from_pdf_extracter_ray.pipelines.linkgraph import host_node_id
from png_from_pdf_extracter_ray.stages.text_stats import compression_ratio_batch


def test_compression_ratio_empty_and_repetitive() -> None:
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["", "ab " * 500, "the quick brown fox jumps over it"],
        }
    )
    out = compression_ratio_batch(df)
    # empty text: 0 bytes, ratio defined as 1.0 (neither keep-window edge)
    assert out.loc[0, "n_bytes"] == 0
    assert out.loc[0, "compression_ratio"] == 1.0
    # highly repetitive text compresses far below the keep window
    assert out.loc[1, "compression_ratio"] < ZRATIO_MIN
    # zlib header overhead can push short unique text above 1.0
    assert out.loc[2, "compression_ratio"] > ZRATIO_MIN
    # determinism
    out2 = compression_ratio_batch(df)
    pd.testing.assert_frame_equal(out, out2)


def test_compression_ratio_none_text() -> None:
    out = compression_ratio_batch(pd.DataFrame({"doc_id": [7], "text": [None]}))
    assert out.loc[0, "n_bytes"] == 0


def test_zratio_window_sane() -> None:
    assert 0.0 < ZRATIO_MIN < ZRATIO_MAX < 1.5


def test_host_node_id_deterministic_and_distinct() -> None:
    hosts = [f"site{i}.example" for i in range(500)] + ["", "a.b", "A.B"]
    ids = [host_node_id(h) for h in hosts]
    assert len(set(ids)) == len(hosts)  # no collisions on a realistic set
    assert host_node_id("x.example") == host_node_id("x.example")
    assert all(isinstance(i, int) and -(2**63) <= i < 2**63 for i in ids)


def test_split_paras_positions_and_empties() -> None:
    # indices refer to the RAW split (stable under later drops), empty
    # pieces are excluded from the paragraph universe
    text = "a\n\n\n\nb\n\nc"  # split: ['a', '', 'b', 'c'] on \n\n
    paras = _split_paras(text)
    assert paras == [(0, "a"), (2, "b"), (3, "c")]
    assert _split_paras("") == []
    assert _split_paras("\n\n") == []


def test_profile_approx_error_bound(ray_session, sf_dir) -> None:  # noqa: ANN001
    # the HLL profile must track the exact profile within the sketch's
    # error envelope (~1.6% stderr; assert a generous 6% on every column)
    from png_from_pdf_extracter_ray.pipelines.profiler import (
        profile_table,
        profile_table_approx,
    )

    exact = (
        profile_table(sf_dir).to_pandas().sort_values("col", ignore_index=True)
    )
    approx = profile_table_approx(sf_dir)
    assert list(exact["col"]) == list(approx["col"])
    assert (exact["n_rows"] == approx["n_rows"]).all()
    assert (exact["n_nulls"] == approx["n_nulls"]).all()
    rel = (
        (approx["n_distinct_est"] - exact["n_distinct"]).abs()
        / exact["n_distinct"].clip(lower=1)
    )
    assert rel.max() < 0.06, rel


class TestSentenceStats:
    def _run(self, ray_session, tmp_path, texts):  # noqa: ANN001
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.textops import sentence_stats

        t = pa.table(
            {
                "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        df = sentence_stats(str(tmp_path)).to_pandas()
        return {r.doc_id: (r.n_sentences, r.mean_sentence_tokens) for r in df.itertuples()}

    def test_hand_computed(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        got = self._run(
            ray_session,
            tmp_path,
            [
                "One two. Three four five! Six?",  # 3 sentences: 2,3,1 tokens
                "no punctuation here",  # 1 sentence, 3 tokens
                "",  # nothing
                "...!?",  # punctuation only -> nothing
                "Ends mid sentence. trailing frag",  # 2 segs: 3,2 tokens
            ],
        )
        assert got == {
            1: (3, 2.0),
            2: (1, 3.0),
            5: (2, 2.5),
        }

    def test_multi_punct_runs_collapse(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        # "!?" and "..." are ONE terminator each, not empty sentences
        got = self._run(ray_session, tmp_path, ["Wait... what?! Really."])
        assert got == {1: (3, 1.0)}


class TestReadabilityScores:
    def test_hand_computed(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.textops import readability_scores

        texts = [
            "the cat sat. the dog ran.",  # 6 words, 2 sentences, vg: e,a,a,e,o,a = 6
            "...",  # 1 word, 0 sentences -> excluded
            "",  # blank -> excluded
        ]
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["t"] * 3, pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        df = readability_scores(str(tmp_path)).to_pandas()
        assert df["doc_id"].tolist() == [1]
        r = df.iloc[0]
        assert (r["n_words"], r["n_sentences"], r["n_vowel_groups"]) == (6, 2, 6)
        want = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
        assert abs(r["flesch"] - want) < 1e-9
