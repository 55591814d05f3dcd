"""Conformance layer: distributed pipeline vs single-process oracle.

The north-rule invariant — byte-identical extracted text per url — is
asserted here by running the full Ray pipeline (synthesis → dedup →
actor-pool extraction) and the pure-Python oracle over the same rows.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from png_from_pdf_extracter_ray.config import ExtractConfig
from png_from_pdf_extracter_ray.pipelines.extract_pipeline import extract_pipeline
from png_from_pdf_extracter_ray.sources.pages_source import synthesize_pages
from png_from_pdf_extracter_ray.stages.dedup import dedup_keep_first
from png_from_pdf_extracter_ray.stages.extract_stage import oracle_extract_table
from png_from_pdf_extracter_ray.stages.filters import filter_lang

N_DOCS = 60
EXPAND = 3


def _collect(ds) -> pa.Table:  # noqa: ANN001
    return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])


def _oracle_dedup(pages: pa.Table) -> pa.Table:
    df = pages.select(["url", "warc_ts"]).to_pandas()
    keep = set(df.sort_values(["url", "warc_ts"]).groupby("url").head(1).index)
    return pages.filter(pa.array([i in keep for i in range(len(df))]))


def test_byte_identity_and_dedup(ray_session, sf_dir) -> None:  # noqa: ANN001
    pages_tab = _collect(synthesize_pages(sf_dir, expand=EXPAND, num_docs=N_DOCS))
    n_unique = len(set(pages_tab["url"].to_pylist()))
    assert pages_tab.num_rows > n_unique, "corpus should contain duplicate urls"

    out = _collect(
        extract_pipeline(
            synthesize_pages(sf_dir, expand=EXPAND, num_docs=N_DOCS),
            dedup=True,
            num_buckets=8,
            batch_size=8,
            concurrency=(1, 2),
        )
    )
    assert out.num_rows == n_unique

    oracle = oracle_extract_table(_oracle_dedup(pages_tab))
    o = {
        u: (t, h, s, e)
        for u, t, h, s, e in zip(
            oracle["url"].to_pylist(),
            oracle["extracted_text"].to_pylist(),
            oracle["content_hash"].to_pylist(),
            oracle["status"].to_pylist(),
            oracle["error_type"].to_pylist(),
        )
    }
    d = {
        u: (t, h, s, e)
        for u, t, h, s, e in zip(
            out["url"].to_pylist(),
            out["extracted_text"].to_pylist(),
            out["content_hash"].to_pylist(),
            out["status"].to_pylist(),
            out["error_type"].to_pylist(),
        )
    }
    assert set(o) == set(d)
    mismatched = [u for u in o if o[u] != d[u]]
    assert not mismatched, mismatched[:5]
    # all three statuses appear in a healthy corpus
    statuses = {v[2] for v in d.values()}
    assert statuses == {"completed", "failed", "skipped"}


def test_dedup_keeps_earliest_warc_ts(ray_session, sf_dir) -> None:  # noqa: ANN001
    pages = synthesize_pages(sf_dir, expand=4, num_docs=40)
    raw = _collect(pages)
    deduped = _collect(
        dedup_keep_first(
            synthesize_pages(sf_dir, expand=4, num_docs=40), num_buckets=4
        )
    )
    df = raw.select(["url", "warc_ts"]).to_pandas()
    expected = df.groupby("url")["warc_ts"].min()
    got = deduped.select(["url", "warc_ts"]).to_pandas().set_index("url")["warc_ts"]
    assert len(got) == len(expected)
    assert (got.sort_index() == expected.sort_index()).all()


def test_broadcast_dedup_equals_shuffle_dedup(ray_session, sf_dir) -> None:  # noqa: ANN001
    def run(mode):  # noqa: ANN001, ANN202
        out = _collect(
            extract_pipeline(
                synthesize_pages(sf_dir, expand=3, num_docs=50),
                dedup=mode,
                num_buckets=8,
                batch_size=8,
                concurrency=(1, 2),
                summary_only=True,
            )
        )
        return {
            u: (h, s)
            for u, h, s in zip(
                out["url"].to_pylist(),
                out["content_hash"].to_pylist(),
                out["status"].to_pylist(),
            )
        }

    shuffle, broadcast = run("shuffle"), run("broadcast")
    assert shuffle == broadcast


def test_lang_whitelist_filter(ray_session, sf_dir) -> None:  # noqa: ANN001
    pages = synthesize_pages(sf_dir, expand=2, num_docs=50)
    raw = _collect(pages)
    langs = set(raw["lang"].to_pylist())
    assert len(langs) > 1, "corpus should be multilingual"
    keep = sorted(langs)[0]
    filtered = _collect(
        filter_lang(synthesize_pages(sf_dir, expand=2, num_docs=50), keep)
    )
    assert set(filtered["lang"].to_pylist()) == {keep}
    expected_n = sum(1 for v in raw["lang"].to_pylist() if v == keep)
    assert filtered.num_rows == expected_n


def test_summary_only_drops_heavy_columns(ray_session, sf_dir) -> None:  # noqa: ANN001
    out = extract_pipeline(
        synthesize_pages(sf_dir, expand=1, num_docs=10),
        dedup=False,
        summary_only=True,
        concurrency=(1, 2),
    )
    names = out.schema().names
    assert "extracted_text" not in names and "pages" not in names
    assert {"url", "status", "content_hash"} <= set(names)


def test_render_pages_off_in_pipeline(ray_session, sf_dir) -> None:  # noqa: ANN001
    cfg = ExtractConfig(render_pages=False)
    out = _collect(
        extract_pipeline(
            synthesize_pages(sf_dir, expand=2, num_docs=30),
            cfg,
            dedup=False,
            concurrency=(1, 2),
        )
    )
    pdf_rows = out.filter(
        pa.compute.equal(out["content_type"], pa.scalar("pdf"))
    )
    assert pdf_rows.num_rows > 0
    assert all(len(p) == 0 for p in pdf_rows["pages"].to_pylist())
    assert any(n > 0 for n in pdf_rows["n_pages"].to_pylist())
