"""WARC-like datasource: framing round-trip + strict error paths
(kernel-level, no Ray — the distributed read is covered by the
warclike_ingest_rows oracle parity)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from png_from_pdf_extracter_ray.sources.warclike_source import (
    MAGIC,
    WarcLikeDatasource,
    write_warclike_shard,
)

ROWS = {
    "url": ["https://a.example/1", "https://b.example/2", "https://c.example/3"],
    "warc_ts": [1_000_000, 2_000_000, 3_000_000],
    "html": [b"<html>x</html>", b"", b"\x00binary\nwith\nnewlines\n\n!"],
    "lang": ["en", "de", ""],
}


def _read_all(path: str) -> pa.Table:
    src = WarcLikeDatasource(path)
    with pa.input_stream(path) as f:
        blocks = list(src._read_stream(f, path))
    return pa.concat_tables(blocks)


def test_roundtrip(tmp_path) -> None:  # noqa: ANN001
    p = str(tmp_path / "s.warcg")
    write_warclike_shard(ROWS, p)
    t = _read_all(p)
    assert t["url"].to_pylist() == ROWS["url"]
    assert t["warc_us"].to_pylist() == ROWS["warc_ts"]
    assert t["lang"].to_pylist() == ROWS["lang"]
    # payloads byte-identical, including empty and newline-bearing ones
    assert t["payload"].to_pylist() == ROWS["html"]


def test_block_rows_bounded(tmp_path) -> None:  # noqa: ANN001
    p = str(tmp_path / "s.warcg")
    write_warclike_shard(ROWS, p)
    src = WarcLikeDatasource(p, block_rows=2)
    with pa.input_stream(p) as f:
        blocks = list(src._read_stream(f, p))
    assert [b.num_rows for b in blocks] == [2, 1]


def test_truncated_payload_raises(tmp_path) -> None:  # noqa: ANN001
    p = str(tmp_path / "s.warcg")
    write_warclike_shard(ROWS, p)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-10])  # chop the tail
    with pytest.raises(ValueError, match="truncated|trailer"):
        _read_all(p)


def test_bad_magic_raises(tmp_path) -> None:  # noqa: ANN001
    p = str(tmp_path / "s.warcg")
    write_warclike_shard(ROWS, p)
    raw = open(p, "rb").read()
    open(p, "wb").write(b"GARBAGE" + raw[7:])
    with pytest.raises(ValueError, match="magic"):
        _read_all(p)


def test_missing_header_raises(tmp_path) -> None:  # noqa: ANN001
    p = str(tmp_path / "s.warcg")
    with open(p, "wb") as f:
        f.write(MAGIC + b"url: x\n\n")  # no content-length
    with pytest.raises(ValueError, match="malformed|unexpected header"):
        _read_all(p)


def test_header_newline_injection_rejected(tmp_path) -> None:  # noqa: ANN001
    # a url containing '\n' would truncate itself and inject a bogus
    # header line — the writer must fail loudly, not corrupt the framing
    p = str(tmp_path / "s.warcg")
    bad = dict(ROWS)
    bad["url"] = ["https://a.example/1", "https://evil/\ncontent-length: 0", "u"]
    with pytest.raises(ValueError, match="line break"):
        write_warclike_shard(bad, p)
    bad2 = dict(ROWS)
    bad2["lang"] = ["en", "de\r", ""]
    with pytest.raises(ValueError, match="line break"):
        write_warclike_shard(bad2, p)


def test_stray_header_rejected_by_reader(tmp_path) -> None:  # noqa: ANN001
    # hand-crafted record with an extra header line: the reader must
    # refuse (exact expected-key-set check), not silently parse it
    p = str(tmp_path / "s.warcg")
    with open(p, "wb") as f:
        f.write(
            MAGIC
            + b"url: x\nwarc-us: 1\nlang: en\nx-extra: boom\ncontent-length: 0\n\n\n\n"
        )
    with pytest.raises(ValueError, match="unexpected header"):
        _read_all(p)


def test_sink_roundtrip_under_ray(ray_session, tmp_path) -> None:  # noqa: ANN001
    import ray.data as rd

    from png_from_pdf_extracter_ray.sources.warclike_source import (
        read_warclike,
        write_warclike,
    )

    t = pa.table(
        {
            "url": ROWS["url"],
            "warc_us": ROWS["warc_ts"],
            "lang": ROWS["lang"],
            "payload": ROWS["html"],
        }
    )
    out = str(tmp_path / "sinkdir")
    write_warclike(rd.from_arrow(t), out)
    back = read_warclike(out).to_pandas().sort_values("url", ignore_index=True)
    assert back["url"].tolist() == ROWS["url"]
    assert back["payload"].tolist() == ROWS["html"]
