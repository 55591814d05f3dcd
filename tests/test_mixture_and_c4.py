"""Semantic tests for the r5 curation additions: C4 line-level
cleaning, the source-mixture epoch plan, and the CSV interchange
roundtrip.  (Exact value parity vs DuckDB runs in
test_queries_vs_duckdb.py — these check operator-level invariants and
the toy-scale corners the corpus never exercises, e.g. the 4-epoch
cap.)"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from png_from_pdf_extracter_ray.pipelines.data_quality import (
    C4_MIN_KEPT_LINES,
    _c4_page_lines,
    c4_line_filters,
)
from png_from_pdf_extracter_ray.pipelines.ingest import csv_roundtrip_digest
from png_from_pdf_extracter_ray.pipelines.textops import (
    MIX_EPOCH_FP,
    MIX_MAX_EPOCHS,
    source_mixture_plan,
)


def _write_docs(path: str, rows: list[tuple[int, str, str]]) -> str:
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(path, "documents.parquet"))
    return path


class TestC4PageDerivation:
    def test_line_decoration_table(self) -> None:
        # doc_id=1: v = (37 + 11 j) % 10 → j=0:7(bare), j=1:8(javascript),
        # j=2:9(!), j=3:0(.)
        toks = [f"w{i}" for i in range(32)]
        lines = _c4_page_lines(1, toks)
        assert lines[0] == "w0 w1 w2 w3 w4 w5 w6 w7"
        assert lines[1].startswith("javascript ") and lines[1].endswith(".")
        assert lines[2].endswith("!")
        assert lines[3].endswith(".")

    def test_lorem_and_brace_overrides(self) -> None:
        toks = [f"w{i}" for i in range(16)]
        assert _c4_page_lines(13, toks)[0].startswith("lorem ipsum ")
        assert _c4_page_lines(17, toks)[1].endswith(" {")

    def test_empty_doc_has_no_lines(self) -> None:
        assert _c4_page_lines(5, []) == []


class TestC4LineFilters:
    def test_hand_computed_doc(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        # 26 tokens → 4 lines (8+8+8+2); doc_id=2 → v = (74+11j)%10 =
        # 4('.'), 5('.'), 6(':'), 7(bare).  Line 0/1 kept (terminal, 8
        # words); line 2 fails punctuation; line 3 bare AND 2 words.
        toks = " ".join(f"w{i}" for i in range(26))
        sf = _write_docs(str(tmp_path), [(2, toks, "s")])
        out = c4_line_filters(sf).to_pandas()
        row = out.iloc[0]
        assert (row["n_lines"], row["n_kept"]) == (4, 2)
        clean = "\n".join(
            [" ".join(f"w{i}" for i in range(8)) + ".",
             " ".join(f"w{i}" for i in range(8, 16)) + "."]
        )
        assert row["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
        assert row["keep"] == 0  # 2 kept < C4_MIN_KEPT_LINES

    def test_lorem_page_dropped_but_lines_kept(
        self, ray_session, tmp_path
    ) -> None:  # noqa: ANN001
        toks = " ".join(f"w{i}" for i in range(80))  # 10 full lines
        sf = _write_docs(str(tmp_path), [(13, toks, "s")])
        row = c4_line_filters(sf).to_pandas().iloc[0]
        assert row["n_kept"] >= C4_MIN_KEPT_LINES
        assert row["keep"] == 0  # lorem ipsum anywhere kills the page

    def test_corpus_flags_are_consistent(self, ray_session, sf_dir) -> None:  # noqa: ANN001
        out = c4_line_filters(sf_dir).to_pandas()
        assert (out["n_kept"] <= out["n_lines"]).all()
        assert set(out["keep"].unique()) <= {0, 1}
        assert (out.loc[out["keep"] == 1, "n_kept"] >= C4_MIN_KEPT_LINES).all()
        # the dirt injections guarantee both drop reasons occur
        assert (out.loc[out["doc_id"] % 13 == 0, "keep"] == 0).all()
        assert (out.loc[out["doc_id"] % 17 == 0, "keep"] == 0).all()


class TestSourceMixturePlan:
    def test_epoch_cap_binds_on_skew(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        # tiny source (2 tokens) vs huge (200): share=101 → uncapped
        # epochs for the tiny source would be 50.5 → capped at 4.0
        sf = _write_docs(
            str(tmp_path),
            [(0, "a b", "tiny"), (1, " ".join(["t"] * 200), "huge")],
        )
        out = source_mixture_plan(sf).set_index("source")
        assert out.loc["tiny", "epochs_fp"] == MIX_MAX_EPOCHS * MIX_EPOCH_FP
        assert out.loc["tiny", "planned_tokens"] == 2 * MIX_MAX_EPOCHS
        # huge source: epochs = 101*FP//200 → planned = 200*e//FP = 100
        assert out.loc["huge", "epochs_fp"] == (101 * MIX_EPOCH_FP) // 200
        assert out.loc["huge", "planned_tokens"] == 100

    def test_empty_source_plans_zero(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        sf = _write_docs(
            str(tmp_path), [(0, "", "blank"), (1, "a b c d", "full")]
        )
        out = source_mixture_plan(sf).set_index("source")
        assert out.loc["blank", "n_tokens"] == 0
        assert out.loc["blank", "epochs_fp"] == 0
        assert out.loc["blank", "planned_tokens"] == 0

    def test_balanced_corpus_equalizes_planned_tokens(
        self, ray_session, sf_dir
    ) -> None:  # noqa: ANN001
        out = source_mixture_plan(sf_dir)
        # equal-share target: planned tokens within 1 of each other
        # (floor rounding) whenever no source hits the cap
        uncapped = out[out["epochs_fp"] < MIX_MAX_EPOCHS * MIX_EPOCH_FP]
        if len(uncapped) > 1:
            spread = uncapped["planned_tokens"].max() - uncapped[
                "planned_tokens"
            ].min()
            assert spread <= 1


class TestCsvRoundtrip:
    def test_digest_matches_source_parquet(self, ray_session, tmp_path) -> None:  # noqa: ANN001
        rows = [
            (0, 'plain words', "s"),
            (1, 'comma, inside', "s"),
            (2, 'quote " inside', "s"),
            (3, "", "s"),
        ]
        sf = _write_docs(str(tmp_path), rows)
        out = csv_roundtrip_digest(sf).to_pandas().iloc[0]
        x = 0
        chars = 0
        for i, s, _ in rows:
            chars += len(s)
            x ^= int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)
        assert int(out["n_rows"]) == len(rows)
        assert int(out["total_chars"]) == chars
        assert int(out["xor_digest"]) == x
