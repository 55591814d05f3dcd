"""WARC-like record-framed binary source (custom Ray Datasource).

Real Common-Crawl corpora arrive as WARC files — length-prefixed record
framing, one crawled page per record — not as parquet.  This module
gives the engine that ingest path as a proper
``ray.data.datasource.FileBasedDatasource``: Ray lists the shard files,
schedules one read task per file (the WARC-standard parallelism unit —
records are not intra-file splittable without an index), and each task
streams records into Arrow blocks with bounded memory.

Record framing (a minimal WARC shape; deterministic, self-describing):

    WARC-GRAFT/1.0\\n
    url: <url>\\n
    warc-us: <int µs>\\n
    lang: <lang>\\n
    content-length: <payload bytes>\\n
    \\n
    <payload bytes>\\n\\n

The reader is deliberately strict — a malformed header or a truncated
payload raises with the file path and byte offset (a corrupt crawl
shard must fail loudly, not emit silently-short data).

Reference analog: the IMAP INBOX poll delivering framed RFC-5322
messages (/root/reference/src/services/imap_service.py:136-210) — the
same "container framing → per-document payload" contract, re-expressed
as a distributed file-based source.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Iterator, List, Union

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

if TYPE_CHECKING:
    import pyarrow

MAGIC = b"WARC-GRAFT/1.0\n"

RECORD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_us", pa.int64()),
        ("lang", pa.string()),
        ("payload", pa.binary()),
    ]
)

# Rows per emitted Arrow block: bounds reader memory to ~block_rows ×
# max-payload regardless of shard size (payloads here are ≤ ~100 KB;
# real WARCs cap records at 1 GiB — size this down for such corpora).
DEFAULT_BLOCK_ROWS = 256


def _check_header_value(name: str, value: str) -> str:
    """Reject header values that would corrupt the line framing: a url
    (or lang) containing a newline would silently truncate itself and
    inject a bogus header line — the reader would then emit WRONG rows
    without raising, defeating the strict-reader contract.  Fail loudly
    at write time instead (adversarial crawl urls are real inputs)."""
    if "\n" in value or "\r" in value:
        raise ValueError(
            f"warclike header {name!r} contains a line break: {value!r}"
        )
    return value


_EXPECTED_HEADERS = {"url", "warc-us", "lang", "content-length"}


def write_warclike_shard(rows: dict, path: str) -> str:
    """Write one shard of ``(url, warc_ts, html, lang)`` rows (the
    corpus kernel's column dict) in the record framing above.  Atomic
    via temp + rename, so a re-run never leaves a torn shard.  Header
    values are validated against line-break injection (ADVICE r4)."""
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        for url, ts, payload, lang in zip(
            rows["url"], rows["warc_ts"], rows["html"], rows["lang"]
        ):
            body = payload or b""
            f.write(MAGIC)
            f.write(f"url: {_check_header_value('url', str(url))}\n".encode("utf-8"))
            f.write(f"warc-us: {int(ts)}\n".encode("utf-8"))
            f.write(f"lang: {_check_header_value('lang', str(lang))}\n".encode("utf-8"))
            f.write(f"content-length: {len(body)}\n".encode("utf-8"))
            f.write(b"\n")
            f.write(body)
            f.write(b"\n\n")
    os.replace(tmp, path)
    return path


class WarcLikeDatasource(FileBasedDatasource):
    """Streaming WARC-like reader: one read task per shard file, Arrow
    blocks of ``block_rows`` records each."""

    _FILE_EXTENSIONS = ["warcg"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        block_rows: int = DEFAULT_BLOCK_ROWS,
        **kwargs,
    ) -> None:
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS, **kwargs)
        self._block_rows = block_rows

    def _read_stream(self, f: "pyarrow.NativeFile", path: str) -> Iterator[pa.Table]:
        # NativeFile gives buffered byte reads; records are parsed with
        # a tiny line scanner (header lines are short) + one bulk read
        # per payload — no whole-file buffering.
        urls: list = []
        tss: list = []
        langs: list = []
        payloads: list = []

        def _readline() -> bytes:
            out = bytearray()
            while True:
                ch = f.read(1)
                if not ch:
                    return bytes(out)
                out += ch
                if ch == b"\n":
                    return bytes(out)

        offset = 0
        while True:
            magic = f.read(len(MAGIC))
            if not magic:
                break
            if magic != MAGIC:
                raise ValueError(
                    f"{path}: bad record magic at byte {offset}: {magic[:20]!r}"
                )
            headers: dict = {}
            while True:
                line = _readline()
                if line in (b"\n", b""):
                    break
                k, _, v = line.decode("utf-8").rstrip("\n").partition(": ")
                headers[k] = v
            if set(headers) != _EXPECTED_HEADERS:
                # exactly the expected key set — a stray header line is
                # evidence of value injection or framing corruption
                raise ValueError(
                    f"{path}: unexpected header set at byte {offset}: "
                    f"{sorted(headers)!r} (want {sorted(_EXPECTED_HEADERS)!r})"
                )
            try:
                n = int(headers["content-length"])
                url = headers["url"]
                ts = int(headers["warc-us"])
                lang = headers["lang"]
            except (KeyError, ValueError) as exc:
                raise ValueError(
                    f"{path}: malformed record header at byte {offset}: {headers!r}"
                ) from exc
            body = f.read(n)
            if len(body) != n:
                raise ValueError(
                    f"{path}: truncated payload at byte {offset}: "
                    f"want {n}, got {len(body)}"
                )
            trailer = f.read(2)
            if trailer != b"\n\n":
                raise ValueError(
                    f"{path}: bad record trailer at byte {offset}: {trailer!r}"
                )
            offset += len(MAGIC) + n + 2  # header lines not tracked exactly
            urls.append(url)
            tss.append(ts)
            langs.append(lang)
            payloads.append(body)
            if len(urls) >= self._block_rows:
                yield _table(urls, tss, langs, payloads)
                urls, tss, langs, payloads = [], [], [], []
        if urls:
            yield _table(urls, tss, langs, payloads)


def _table(urls: list, tss: list, langs: list, payloads: list) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.int64()),
            pa.array(langs, pa.string()),
            pa.array(payloads, pa.binary()),
        ],
        schema=RECORD_SCHEMA,
    )


def read_warclike(paths: Union[str, List[str]], **kwargs):
    """WARC-like shards → ``ray.data.Dataset`` with RECORD_SCHEMA."""
    import ray.data as rd

    return rd.read_datasource(WarcLikeDatasource(paths, **kwargs))


class WarcLikeDatasink:
    """Distributed WARC-like writer (``ray.data.Datasink`` duck type):
    each write task serializes its blocks into ONE record-framed shard
    named by task index — deterministic, resumable layout (a re-run
    overwrites byte-identical shards atomically; no partial files
    thanks to temp+rename).  Pass to ``Dataset.write_datasink``.

    Input schema: RECORD_SCHEMA (url, warc_us, lang, payload)."""

    def __init__(self, out_dir: str) -> None:
        self._dir = out_dir

    # -- ray.data.Datasink protocol ------------------------------------
    def get_name(self) -> str:
        return "WarcLike"

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):  # noqa: ANN201
        return None

    def on_write_start(self) -> None:
        os.makedirs(self._dir, exist_ok=True)

    def write(self, blocks, ctx) -> list:  # noqa: ANN001
        import pandas as _pd

        written = []
        for i, block in enumerate(blocks):
            t = (
                pa.Table.from_pandas(block, preserve_index=False)
                if isinstance(block, _pd.DataFrame)
                else block
            )
            if t.num_rows == 0:
                continue
            rows = {
                "url": t["url"].to_pylist(),
                "warc_ts": t["warc_us"].to_pylist(),
                "html": t["payload"].to_pylist(),
                "lang": t["lang"].to_pylist(),
            }
            path = os.path.join(
                self._dir, f"part_{ctx.task_idx:05d}_{i:03d}.warcg"
            )
            write_warclike_shard(rows, path)
            written.append(path)
        return written

    def on_write_complete(self, write_result) -> None:  # noqa: ANN001
        pass

    def on_write_failed(self, error: Exception) -> None:
        pass


def write_warclike(ds, out_dir: str) -> None:  # noqa: ANN001
    """Dataset (RECORD_SCHEMA) → record-framed shard directory."""
    ds.write_datasink(WarcLikeDatasink(out_dir))
