"""WARC-like ingest pipeline: record-framed shards → Dataset rows.

The query under test is the DISTRIBUTED READER
(sources/warclike_source.WarcLikeDatasource): shard files are
materialized once per corpus from the deterministic page kernel (input
generation, shared with the oracle writer by the single-implementation
rule), then read back through Ray's datasource machinery — one read
task per shard, streaming Arrow blocks.  The oracle recomputes the
expected rows FLAT from the same kernel without ever touching the
record framing or the reader, so any framing/parse/split bug in the
datasource diverges.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

import ray.data as rd

from ..sources.warclike_source import read_warclike, write_warclike_shard

WARC_SHARDS = 8
_WARC_ROOT = "/tmp/graft_warclike"

_INGEST_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_us", pa.int64()),
        ("lang", pa.string()),
        ("payload_md5", pa.string()),
        ("payload_bytes", pa.int64()),
    ]
)


def warclike_dir(sf_dir: str, expand: int = 2) -> str:
    """Versioned shard-directory path (same cache protocol as the
    oracle parquets — corpus + engine version keyed)."""
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(
        _WARC_ROOT, f"{h}_x{expand}_v{CORPUS_VERSION}_e{ENGINE_VERSION}"
    )


def ensure_warclike_shards(sf_dir: str, expand: int = 2) -> str:
    """Materialize the record-framed shard files once per corpus:
    ``WARC_SHARDS`` files, doc-id range partitioned (the same shard
    protocol as the manifest/resume machinery).  Deterministic content;
    atomic per-shard writes; skipped when all shards exist."""
    import pyarrow.parquet as pq

    from ..corpus.synth import pages_rows_for_doc

    out_dir = warclike_dir(sf_dir, expand)
    paths = [
        os.path.join(out_dir, f"shard_{i:03d}.warcg") for i in range(WARC_SHARDS)
    ]
    if all(os.path.exists(p) for p in paths):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    n_docs = (max(ids) + 1) if ids else 0
    per = max(1, (n_docs + WARC_SHARDS - 1) // WARC_SHARDS)
    for i, path in enumerate(paths):
        lo, hi = i * per, (i + 1) * per
        rows: dict = {"url": [], "warc_ts": [], "html": [], "lang": []}
        for doc_id, text, lang in zip(ids, texts, langs):
            if lo <= doc_id < hi:
                r = pages_rows_for_doc(doc_id, text or "", lang or "", expand)
                for k in rows:
                    rows[k].extend(r[k])
        write_warclike_shard(rows, path)
    return out_dir


def warclike_ingest_rows(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """Distributed WARC-like ingest: read the record-framed shards via
    the custom Datasource and emit one verification row per record —
    url, crawl micros, lang, payload md5 + byte count.  SQL-checked
    against a flat no-reader recompute
    (rowsonly_oracles.write_warclike_expected_oracle)."""
    out_dir = ensure_warclike_shards(sf_dir, expand)
    ds = read_warclike(out_dir)

    def verify_rows(t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        md5s = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        return pa.Table.from_arrays(
            [
                t["url"].combine_chunks(),
                t["warc_us"].combine_chunks(),
                t["lang"].combine_chunks(),
                pa.array(md5s, pa.string()),
                pa.array(sizes, pa.int64()),
            ],
            schema=_INGEST_SCHEMA,
        )

    return ds.map_batches(verify_rows, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# JSONL sink → source roundtrip (the interchange-format check)
# ---------------------------------------------------------------------------

_JSONL_ROOT = "/tmp/graft_jsonl"

_JSONL_DIGEST_SCHEMA = pa.schema(
    [
        ("n_rows", pa.int64()),
        ("xor_digest", pa.int64()),
        ("total_chars", pa.int64()),
    ]
)


def jsonl_dir(sf_dir: str) -> str:
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(_JSONL_ROOT, f"{h}_v{CORPUS_VERSION}_e{ENGINE_VERSION}")


def _roundtrip_written(sf_dir: str, out_dir: str, write: str) -> str:
    """Materialize documents (doc_id, text) through a distributed sink
    once per corpus — crash-safe commit (ADVICE r4): write into a
    process-unique temp dir and atomically rename it into place.  The
    old _done-marker protocol left stale partial shards behind a crash
    between the write and the marker — Ray writes uniquely-named files,
    so a re-run would read old + new shards and duplicate rows forever.
    A renamed dir either exists complete or not at all."""
    if not os.path.exists(out_dir):
        import shutil

        tmp = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        getattr(ds, write)(tmp)
        try:
            os.rename(tmp, out_dir)
        except OSError as exc:
            import errno

            if exc.errno not in (errno.ENOTEMPTY, errno.EEXIST):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _digest_fold(ds: rd.Dataset) -> pa.Table:
    """One digest row folded from per-batch partials: row count,
    ``bit_xor`` of an md5-derived int64 per (doc_id, text) pair, total
    text chars.  The DuckDB twin computes the identical digest from the
    ORIGINAL parquet view — so a row lost, duplicated, or mutated
    anywhere in an interchange hop flips the result."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        x = 0
        chars = 0
        for i, txt in zip(ids, texts):
            s = txt or ""
            chars += len(s)
            h = hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest()
            x ^= int(h[:15], 16)
        return pa.Table.from_pydict(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "xor_digest": pa.array([x], pa.int64()),
                "total_chars": pa.array([chars], pa.int64()),
            },
            schema=_JSONL_DIGEST_SCHEMA,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        vals = [0, 0, 0]
    else:
        x = 0
        for v in parts["xor_digest"]:
            x ^= int(v)
        vals = [int(parts["n_rows"].sum()), x, int(parts["total_chars"].sum())]
    return pa.Table.from_pydict(
        {
            "n_rows": pa.array([vals[0]], pa.int64()),
            "xor_digest": pa.array([vals[1]], pa.int64()),
            "total_chars": pa.array([vals[2]], pa.int64()),
        },
        schema=_JSONL_DIGEST_SCHEMA,
    )


def jsonl_roundtrip_digest(sf_dir: str) -> pa.Table:
    """Documents → Ray's distributed NDJSON sink (``write_json``, one
    shard per block) → Ray's distributed JSON source (``read_json``,
    one read task per shard) → the fold-to-one-digest-row check
    (``_digest_fold``): any row lost, duplicated, or mutated in the
    JSON encode/decode hop (escaping, unicode, newline handling, shard
    split) diverges from the oracle digest of the ORIGINAL parquet.
    The JSONL interchange hop is how corpora leave/enter this engine
    for tools that don't speak parquet."""
    out_dir = _roundtrip_written(sf_dir, jsonl_dir(sf_dir), "write_json")
    return _digest_fold(rd.read_json(out_dir, file_extensions=["json"]))


_CSV_ROOT = "/tmp/graft_csv"


def csv_dir(sf_dir: str) -> str:
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(_CSV_ROOT, f"{h}_v{CORPUS_VERSION}_e{ENGINE_VERSION}")


def csv_roundtrip_digest(sf_dir: str) -> pa.Table:
    """Documents → Ray's distributed CSV sink (``write_csv``, one shard
    per block) → distributed CSV source (``read_csv``, one read task per
    shard) → the same fold-to-one-digest-row check as the JSONL twin.
    Any row lost/duplicated/mutated in the CSV encode/decode hop —
    delimiter quoting, header handling, type re-inference on the way
    back in — flips the digest vs the oracle's digest of the ORIGINAL
    parquet.  CSV is the lowest-common-denominator interchange hop
    (spreadsheets, legacy ETL); together with the JSONL twin it covers
    both text sidecar formats the engine speaks.  Same crash-safe
    temp-dir + atomic-rename commit."""
    out_dir = _roundtrip_written(sf_dir, csv_dir(sf_dir), "write_csv")
    return _digest_fold(rd.read_csv(out_dir))
