"""Multimodal page operations: explode, meta parse, real resize, sampling."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray

from png_from_pdf_extracter_ray.kernel.png import decode_png_gray, read_png_size
from png_from_pdf_extracter_ray.pipelines.extract_pipeline import flagship
from png_from_pdf_extracter_ray.stages.multimodal import (
    GeneralImageDecoder,
    PngResizer,
    explode_pages,
    page_meta,
    sample_pages,
)


def _collect(ds) -> pa.Table:  # noqa: ANN001
    return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])


@pytest.fixture(scope="module")
def page_rows(ray_session, sf_dir):  # noqa: ANN001
    ds = flagship(sf_dir, expand=2, summary_only=False).map_batches(
        explode_pages, batch_format="pyarrow", batch_size=16
    )
    tab = _collect(ds)
    assert tab.num_rows > 0, "corpus should contain rendered PDF pages"
    return tab


def test_page_meta_matches_binary(page_rows) -> None:  # noqa: ANN001
    meta = page_meta(page_rows)
    assert meta["png_width"].to_pylist() == page_rows["width"].to_pylist()
    assert meta["png_height"].to_pylist() == page_rows["height"].to_pylist()
    assert meta["png_dpi"].to_pylist() == page_rows["dpi"].to_pylist()
    assert all(n > 0 for n in meta["png_bytes"].to_pylist())


def test_resize_real_decode_reencode(page_rows) -> None:  # noqa: ANN001
    rs = PngResizer(target_w=480, target_h=270)
    out = rs(page_rows.slice(0, 4))
    for png in out["png"].to_pylist():
        assert read_png_size(png) == (480, 270)
        arr = decode_png_gray(png)
        assert arr.shape == (270, 480)
    assert out["width"].to_pylist() == [480] * 4


def test_frame_sampling(ray_session, sf_dir) -> None:  # noqa: ANN001
    full = flagship(sf_dir, expand=2, summary_only=False)
    sampled = _collect(sample_pages(full, stride=2))
    for n_pages, plist in zip(sampled["n_pages"].to_pylist(), sampled["pages"].to_pylist()):
        if plist:
            nums = [p["page_number"] for p in plist]
            assert all((n - 1) % 2 == 0 for n in nums)
            assert len(plist) == (n_pages + 1) // 2


def test_general_decoder_real_png_and_dead_letters(page_rows) -> None:  # noqa: ANN001
    """The general decoder REALLY decodes this engine's rasters (and any
    8-bit PNG/PNM/BMP); undecodable bytes dead-letter per row instead of
    raising — errors are data."""
    dec = GeneralImageDecoder(feat_grid=8)
    out = dec(page_rows.slice(0, 3))
    assert out["image_ok"].to_pylist() == [True] * 3
    assert out["img_width"].to_pylist() == page_rows["width"].to_pylist()[:3]
    assert out["img_height"].to_pylist() == page_rows["height"].to_pylist()[:3]
    for f in out["image_feat"].to_pylist():
        assert len(f) == 64
        assert all(0.0 <= x <= 1.0 for x in f)
    # a JPEG magic and garbage both dead-letter, never raise
    bad = pa.Table.from_pydict(
        {"png": [b"\xff\xd8\xff\xe0fakejpeg", b"not an image at all"]}
    )
    out_bad = dec(bad)
    assert out_bad["image_ok"].to_pylist() == [False, False]
    # since round 4 baseline JPEG decodes for real; a fake JPEG header
    # dead-letters as MALFORMED (truncated) rather than unsupported
    assert "JPEG" in out_bad["image_error"][0].as_py()
    assert out_bad["image_feat"].null_count == 2


def test_general_decoder_dead_letters_truncated_png() -> None:
    """A valid-signature but truncated/corrupt PNG must dead-letter per
    row (zlib/struct errors are caught), not kill the batch."""
    from png_from_pdf_extracter_ray.kernel.png import write_png_gray
    import numpy as np

    valid = write_png_gray(np.zeros((4, 4), dtype=np.uint8))
    i = valid.index(b"IDAT")
    corrupted = valid[: i + 8] + b"\xff\xff\xff\xff" + valid[i + 12 :]
    batch = pa.Table.from_pydict({"png": [valid[:20], corrupted, valid]})
    out = GeneralImageDecoder()(batch)
    assert out["image_ok"].to_pylist() == [False, False, True]
    assert all(e for e in out["image_error"].to_pylist()[:2])
