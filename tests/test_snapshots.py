"""Edge-case semantics of the incremental-crawl snapshot operators
(pipelines/snapshots.py) on crafted tables — the sf-corpus parity runs
live in test_queries_vs_duckdb.py."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from png_from_pdf_extracter_ray.pipelines.snapshots import (
    latest_snapshot,
    slim_pages_batch,
    snapshot_churn,
)


def _slim_ds(rows: list[tuple[str, int, str]], parallelism: int = 3) -> rd.Dataset:
    df = pd.DataFrame(rows, columns=["url", "warc_us", "text_md5"])
    return rd.from_pandas(df, override_num_blocks=min(parallelism, len(df)))


CRAFTED = [
    # url A: 3 snapshots, content A->B->A = 2 changes
    ("a", 100, "mA"),
    ("a", 200, "mB"),
    ("a", 300, "mA"),
    # url B: 2 snapshots, unchanged content = 0 changes
    ("b", 50, "mX"),
    ("b", 90, "mX"),
    # url C: single snapshot
    ("c", 10, "mC"),
    # url D: exact warc_us TIE — order (and lag) falls back to text_md5
    ("d", 500, "m2"),
    ("d", 500, "m1"),
]


def test_snapshot_churn_crafted(ray_session) -> None:  # noqa: ANN001
    out = (
        snapshot_churn(_slim_ds(CRAFTED), num_buckets=4)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    got = {
        r.url: (r.n_snapshots, r.n_changes, r.first_us, r.last_us)
        for r in out.itertuples()
    }
    assert got == {
        "a": (3, 2, 100, 300),
        "b": (2, 0, 50, 90),
        "c": (1, 0, 10, 10),
        "d": (2, 1, 500, 500),  # tie ordered by md5: m1 -> m2 = 1 change
    }


def test_latest_snapshot_crafted(ray_session) -> None:  # noqa: ANN001
    out = (
        latest_snapshot(_slim_ds(CRAFTED), num_buckets=4)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    got = {r.url: (r.warc_us, r.text_md5) for r in out.itertuples()}
    assert got == {
        "a": (300, "mA"),
        "b": (90, "mX"),
        "c": (10, "mC"),
        "d": (500, "m2"),  # ts tie: greatest md5 wins (DESC, matches oracle)
    }


@pytest.mark.parametrize("blocks", [1, 2, 5])
def test_churn_batch_invariant(ray_session, blocks: int) -> None:  # noqa: ANN001
    base = (
        snapshot_churn(_slim_ds(CRAFTED, parallelism=1), num_buckets=2)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    other = (
        snapshot_churn(_slim_ds(CRAFTED, parallelism=blocks), num_buckets=2)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    pd.testing.assert_frame_equal(base, other)


def test_slim_pages_batch_md5() -> None:
    t = pa.Table.from_arrays(
        [
            pa.array(["u"], pa.string()),
            pa.array([123], pa.timestamp("us")),
            pa.array(["hello"], pa.string()),
        ],
        names=["url", "warc_ts", "text"],
    )
    out = slim_pages_batch(t)
    assert out["warc_us"].to_pylist() == [123]
    assert out["text_md5"].to_pylist() == ["5d41402abc4b2a76b9719d911017c592"]


def test_recrawl_intervals_crafted(ray_session) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.snapshots import recrawl_intervals

    out = (
        recrawl_intervals(_slim_ds(CRAFTED), num_buckets=4)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    got = {
        r.url: (r.n_snapshots, r.min_gap_us, r.max_gap_us, r.mean_gap_us)
        for r in out.itertuples()
    }
    # url c (single snapshot) emits nothing; url d's tie gap is 0
    assert got == {
        "a": (3, 100, 100, 100.0),
        "b": (2, 40, 40, 40.0),
        "d": (2, 0, 0, 0.0),
    }


@pytest.mark.parametrize("blocks", [1, 5])
def test_recrawl_intervals_batch_invariant(ray_session, blocks: int) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.snapshots import recrawl_intervals

    a = (
        recrawl_intervals(_slim_ds(CRAFTED, parallelism=blocks), num_buckets=2)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    b = (
        recrawl_intervals(_slim_ds(CRAFTED, parallelism=3), num_buckets=4)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_host_crawl_trend_invariants(ray_session, sf_dir) -> None:  # noqa: ANN001
    """Per-host OLS slope over the sf corpus: only multi-day hosts, a
    finite exact-rational slope, and bucket-count invariance (the
    sufficient statistics are exact integers, so any partitioning must
    reproduce the identical rounded slope)."""
    import numpy as np

    from png_from_pdf_extracter_ray.pipelines.snapshots import host_crawl_trend

    out = host_crawl_trend(sf_dir).to_pandas()
    assert len(out) > 0
    assert (out["n_days"] >= 2).all()
    assert np.isfinite(out["slope"]).all()
    out2 = host_crawl_trend(sf_dir, num_buckets=3).to_pandas()
    a = out.sort_values("host", ignore_index=True)
    b = out2.sort_values("host", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_adaptive_recrawl_schedule_crafted(ray_session) -> None:  # noqa: ANN001
    """The integer revisit policy on the crafted corpus, through the
    SAME kernel the public op ships (schedule_batch over churn output):
    a: 3 snaps / 2 changes -> fast; avg=(300-100)//2=100; due=300+50
    b: 2 snaps / 0 changes -> stable; avg=40; due=90+80
    d: 2 snaps / 1 change (ts tie) -> fast; avg=0; due=500
    c: single snapshot -> emits nothing."""
    import pyarrow as pa

    from png_from_pdf_extracter_ray.pipelines.snapshots import (
        schedule_batch,
        snapshot_churn,
    )

    churn_tbl = pa.Table.from_pandas(
        snapshot_churn(_slim_ds(CRAFTED), num_buckets=4).to_pandas()
    )
    out = schedule_batch(churn_tbl).to_pandas()
    got = {
        r.url: (r.avg_gap_us, r.fast_churn, r.next_due_us)
        for r in out.itertuples()
    }
    assert got == {
        "a": (100, 1, 350),
        "b": (40, 0, 170),
        "d": (0, 1, 500),
    }


def test_content_dedup_winner_map_crafted(ray_session, tmp_path) -> None:  # noqa: ANN001
    """Same text on urls b and a (and on c alone): winner is the min
    url; single-url fingerprints and the winner itself emit nothing."""
    import pyarrow.parquet as pq

    from png_from_pdf_extracter_ray.pipelines.snapshots import (
        content_dedup_winner_map,
    )

    # drive through the public op over a tiny documents table: every
    # synthesized doc's expand=2 variants share text, so each doc
    # contributes exactly one loser (its lexicographically larger url)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["t", "t"], pa.string()),
            "n_chars": pa.array([10, 11], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = content_dedup_winner_map(str(tmp_path)).to_pandas()
    # one loser per doc (the two variants share text; recrawl drift, if
    # injected, differs in content and cannot join another url's fp)
    assert len(out) >= 2
    assert (out["url"] != out["winner_url"]).all()
    assert (out["winner_url"] < out["url"]).all()
