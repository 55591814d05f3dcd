"""Checkpoint/resume: manifest-as-EXPUNGE commit protocol (SURVEY §4.3.5)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.dataset as pads

from png_from_pdf_extracter_ray.pipelines.extract_pipeline import extract_pipeline
from png_from_pdf_extracter_ray.sources.pages_source import synthesize_pages
from png_from_pdf_extracter_ray.state.manifest import is_committed, run_partitioned

SHARDS = [
    {"doc_lo": 0, "doc_hi": 20},
    {"doc_lo": 20, "doc_hi": 40},
    {"doc_lo": 40, "doc_hi": 60},
]


def _pipeline_for(sf_dir: str):  # noqa: ANN202
    def make(shard):  # noqa: ANN001, ANN202
        pages = synthesize_pages(
            sf_dir, expand=2, doc_range=(shard["doc_lo"], shard["doc_hi"])
        )
        return extract_pipeline(
            pages, dedup=False, summary_only=True, concurrency=(1, 2)
        )

    return make


def _read_all(out_dir: str):  # noqa: ANN202
    return (
        pads.dataset(os.path.join(out_dir, "parts"), format="parquet")
        .to_table(columns=["url", "status", "content_hash"])
        .sort_by([("url", "ascending")])
    )


def test_resume_skips_committed_partitions(ray_session, sf_dir, tmp_path) -> None:  # noqa: ANN001
    out_dir = str(tmp_path / "run")
    manifests = run_partitioned(SHARDS, out_dir, _pipeline_for(sf_dir))
    assert len(manifests) == 3
    assert all(is_committed(out_dir, pid) for pid in range(3))
    full = _read_all(out_dir)

    # simulate a crash that lost partition 1's manifest AND output
    shutil.rmtree(os.path.join(out_dir, "parts", "part-00001"))
    os.remove(os.path.join(out_dir, "manifests", "part-00001.json"))

    durations_before = {m.partition_id: m.duration_s for m in manifests}
    manifests2 = run_partitioned(SHARDS, out_dir, _pipeline_for(sf_dir))
    # partitions 0 and 2 were loaded from their committed manifests, not re-run
    assert manifests2[0].duration_s == durations_before[0]
    assert manifests2[2].duration_s == durations_before[2]

    resumed = _read_all(out_dir)
    assert resumed.equals(full), "resumed output must equal uninterrupted output"


def test_resume_after_midwrite_crash_leaves_no_duplicates(ray_session, sf_dir, tmp_path) -> None:  # noqa: ANN001
    """A crash AFTER some parquet files landed but BEFORE the manifest
    commit must not duplicate rows on resume: write_parquet appends
    (unique per-run filenames), so the re-run has to clear the partial
    part dir first."""
    out_dir = str(tmp_path / "run_crash")
    manifests = run_partitioned(SHARDS, out_dir, _pipeline_for(sf_dir))
    full = _read_all(out_dir)

    # simulate a crash mid-write of partition 1: manifest gone, but the
    # output files of the crashed attempt REMAIN in part_dir
    os.remove(os.path.join(out_dir, "manifests", "part-00001.json"))
    part1 = os.path.join(out_dir, "parts", "part-00001")
    assert len(os.listdir(part1)) > 0  # partial files present

    manifests2 = run_partitioned(SHARDS, out_dir, _pipeline_for(sf_dir))
    resumed = _read_all(out_dir)
    assert resumed.num_rows == full.num_rows, "resume duplicated rows"
    assert resumed.equals(full)
    assert manifests2[1].row_count == manifests[1].row_count


def test_manifest_records_lineage_and_metrics(ray_session, sf_dir, tmp_path) -> None:  # noqa: ANN001
    out_dir = str(tmp_path / "run2")
    run_partitioned(SHARDS[:1], out_dir, _pipeline_for(sf_dir))
    with open(os.path.join(out_dir, "manifests", "part-00000.json")) as f:
        m = json.load(f)
    assert m["partition_id"] == 0
    assert m["input_spec"] == SHARDS[0]
    assert m["row_count"] > 0
    assert sum(m["rows_by_status"].values()) == m["row_count"]
    assert len(m["content_digest"]) == 32
    assert m["duration_s"] > 0
