"""SQL-checkable summary of the flagship extraction.

The flagship pipeline itself is non-SQL (the kernel is the computation),
so the driver's DuckDB oracle can't re-derive it from the input tables.
This module closes that gap with a deterministic summary projection —
rows grouped by (status, content_type) with a count and an
ORDER-INSENSITIVE content digest (XOR of per-row
``blake2b(url:content_hash)``, the same digest family the partition
manifests record, state/manifest.py) — computed two independent ways:

- ``flagship_summary``  — the Ray pipeline: flagship extraction →
  per-batch partial (count + XOR) → tiny groupby;
- ``write_oracle_summary`` — a single-process oracle: pages synthesized
  in plain pyarrow, deduped/extracted sequentially via the kernel's
  ``oracle_extract_table`` (no Ray), written to parquet for DuckDB's
  ``read_parquet`` to SELECT.

Any distribution bug (dedup semantics, shuffle corruption, actor state
leakage, lost/duplicated rows) flips the count or the digest.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

ORACLE_SUMMARY_ROOT = "/tmp/graft_flagship_oracle"
SUMMARY_COLS = ["status", "content_type", "n_docs", "xor_digest"]


def _row_digests(urls: list[str], hashes: list[str]) -> np.ndarray:
    """Per-row 64-bit digest of (url, content_hash) — XOR-combinable."""
    out = np.empty(len(urls), dtype=np.uint64)
    for i, (u, h) in enumerate(zip(urls, hashes)):
        d = hashlib.blake2b(f"{u}:{h}".encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def _partial_df(batch: pa.Table) -> pd.DataFrame:
    d = _row_digests(batch["url"].to_pylist(), batch["content_hash"].to_pylist())
    df = pd.DataFrame(
        {
            "status": batch["status"].to_pylist(),
            "content_type": batch["content_type"].to_pylist(),
            "n_docs": 1,
            "xor_digest": d,
        }
    )
    agg = df.groupby(["status", "content_type"], as_index=False, sort=False).agg(
        n_docs=("n_docs", "sum"),
        xor_digest=("xor_digest", lambda s: np.bitwise_xor.reduce(s.to_numpy(dtype=np.uint64))),
    )
    # int64 bit pattern + Arrow out: consistent dtype across blocks and a
    # real schema on empty partials
    agg["xor_digest"] = agg["xor_digest"].astype(np.uint64).astype(np.int64)
    agg["n_docs"] = agg["n_docs"].astype("int64")
    return agg


def _partial(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pandas(_partial_df(batch), preserve_index=False)


def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "status": [g["status"].iloc[0]],
            "content_type": [g["content_type"].iloc[0]],
            "n_docs": [int(g["n_docs"].sum())],
            "xor_digest": [
                int(
                    np.bitwise_xor.reduce(
                        g["xor_digest"].to_numpy(dtype=np.int64).view(np.uint64)
                    ).astype(np.int64)
                )
            ],
        }
    )


def summarize_extracted(ds: rd.Dataset) -> pd.DataFrame:
    """(status, content_type) → n_docs + order-insensitive XOR digest."""
    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["status", "content_type"])
        .map_groups(_merge_group, batch_format="pandas")
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["xor_digest"] = out["xor_digest"].astype("int64")
    return out.sort_values(["status", "content_type"], ignore_index=True)[SUMMARY_COLS]


def flagship_summary(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Ray side: flagship extraction reduced to the summary projection.

    Also (re)writes the single-process oracle parquet for this sf_dir so
    the driver's ``oracle_sql`` entry can read it — the pair IS the
    correctness check for the headline pipeline.
    """
    from .extract_pipeline import flagship

    write_oracle_summary(sf_dir, expand=expand)
    return summarize_extracted(flagship(sf_dir, expand=expand, summary_only=True))


def skew_routed_summary(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Same summary via the SIZE-BUCKETED pipeline (mega-docs routed to a
    batch_size=1 pool slice) — must equal the flagship oracle exactly,
    which driver-checks the skew-routing path end to end."""
    from ..sources.pages_source import synthesize_pages
    from ..stages.dedup import dedup_keep_first
    from .extract_pipeline import extract_pipeline_size_bucketed

    write_oracle_summary(sf_dir, expand=expand)

    def pages_factory() -> rd.Dataset:
        pages = synthesize_pages(sf_dir, expand=expand)
        return dedup_keep_first(pages, key="url", order_col="warc_ts")

    return summarize_extracted(extract_pipeline_size_bucketed(pages_factory))


def oracle_summary_path(sf_dir: str, expand: int = 2) -> str:
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    # keyed by corpus AND engine version — the parquet holds extraction
    # output, which a kernel change alters without a corpus bump
    tag = (
        os.path.basename(sf_dir.rstrip("/"))
        + f"_x{expand}_v{CORPUS_VERSION}_e{ENGINE_VERSION}"
    )
    return os.path.join(ORACLE_SUMMARY_ROOT, f"{tag}.parquet")


PAGES_DIGEST_COLS = ["n_pages", "total_png_bytes", "xor_digest"]


def _page_digest_partial(batch: pa.Table) -> pd.DataFrame:
    """One partial row per batch of EXPLODED page rows: count, byte sum,
    XOR of per-page blake2b(url:page_number:png-bytes) — covers the
    raster BYTES, which the text content_hash does not."""
    urls = batch["url"].to_pylist()
    nums = batch["page_number"].to_pylist()
    pngs = batch["png"].to_pylist()
    acc = np.uint64(0)
    total = 0
    for u, n, p in zip(urls, nums, pngs):
        b = p or b""
        total += len(b)
        d = hashlib.blake2b(f"{u}:{n}:".encode() + b, digest_size=8).digest()
        acc ^= np.uint64(int.from_bytes(d, "big"))
    return pd.DataFrame(
        {
            "n_pages": [len(urls)],
            "total_png_bytes": [total],
            "xor_digest": [int(acc.astype(np.int64))],
        }
    )


def _combine_page_partials(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "n_pages": [int(df["n_pages"].sum())],
            "total_png_bytes": [int(df["total_png_bytes"].sum())],
            "xor_digest": [
                int(
                    np.bitwise_xor.reduce(
                        df["xor_digest"].to_numpy(dtype=np.int64).view(np.uint64)
                    ).astype(np.int64)
                )
            ],
        }
    )


def pages_digest(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Ray side: exploded page rasters reduced to one digest row; the
    single-process oracle writes its own row to parquet for the SQL
    compare.  This is the raster-bytes correctness check — any PNG that
    differs by one byte flips the XOR."""
    from ..stages.multimodal import explode_pages
    from .textops import _extracted_pages

    write_oracle_summary(sf_dir, expand=expand)
    partials = (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(_page_digest_partial, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame({c: [0] for c in PAGES_DIGEST_COLS})
    return _combine_page_partials(partials)[PAGES_DIGEST_COLS]


def pages_digest_oracle_path(sf_dir: str, expand: int = 2) -> str:
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_pages.parquet")


def resized_digest_oracle_path(sf_dir: str, expand: int = 2) -> str:
    """Digest of the 480×270 block-mean-resized rasters — verifies the
    distributed decode→resize→re-encode path byte-for-byte."""
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_resized.parquet")


def embeddings_digest_oracle_path(sf_dir: str, expand: int = 2) -> str:
    """Digest of the hashing-trick text embeddings — verifies the
    distributed embedding stage bit-for-bit (float32 payload bytes)."""
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_emb.parquet")


def per_doc_oracle_path(sf_dir: str, expand: int = 2) -> str:
    """Per-document oracle rows (the flagship's summary columns) — lets
    the driver hash-check the WHOLE per-doc output, not just aggregates."""
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_docs.parquet")


def page_meta_oracle_path(sf_dir: str, expand: int = 2) -> str:
    """Per-page geometry/DPI oracle rows (explode + header parse run
    single-process on the oracle extraction)."""
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_pagemeta.parquet")


def image_features_oracle_path(sf_dir: str, expand: int = 2) -> str:
    """Per-page general-image-decode feature rows (decode + feature
    grid + digest run single-process on the oracle extraction)."""
    return oracle_summary_path(sf_dir, expand).replace(".parquet", "_imgfeat.parquet")


def oracle_unique_pages(sf_dir: str, expand: int = 2) -> pa.Table:
    """Single-process corpus build: synthesized pages exact-deduped to
    one row per url (min ``warc_ts`` wins — the flagship's semantics),
    all in this process with no Ray.  Shared by the flagship oracle and
    the rows-only-upgrade oracles (pipelines/rowsonly_oracles.py) so the
    two families can never drift on corpus construction."""
    import pyarrow.parquet as pq

    from ..corpus.synth import pages_from_documents_batch

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    pages = pages_from_documents_batch(docs, expand=expand)
    df = pages.select(["url", "warc_ts"]).to_pandas()
    keep = df.sort_values(["url", "warc_ts"]).groupby("url", sort=False).head(1).index
    mask = np.zeros(len(df), dtype=bool)
    mask[keep.to_numpy()] = True
    return pages.filter(pa.array(mask))


def write_oracle_summary(sf_dir: str, expand: int = 2) -> str:
    """Single-process oracle: synthesize → dedup → extract → summarize,
    all sequentially in this process (no Ray), committed via atomic
    rename.  Skipped when already present (deterministic content).
    Writes BOTH the status/content-type summary and the page-raster
    digest from one extraction pass."""
    import pyarrow.parquet as pq

    from ..stages.extract_stage import oracle_extract_table
    from ..stages.multimodal import explode_pages

    path = oracle_summary_path(sf_dir, expand)
    pages_path = pages_digest_oracle_path(sf_dir, expand)
    docs_path = per_doc_oracle_path(sf_dir, expand)
    meta_path = page_meta_oracle_path(sf_dir, expand)
    resized_path = resized_digest_oracle_path(sf_dir, expand)
    emb_path = embeddings_digest_oracle_path(sf_dir, expand)
    feat_path = image_features_oracle_path(sf_dir, expand)
    if all(
        os.path.exists(p)
        for p in (
            path,
            pages_path,
            docs_path,
            meta_path,
            resized_path,
            emb_path,
            feat_path,
        )
    ):
        return path
    os.makedirs(ORACLE_SUMMARY_ROOT, exist_ok=True)

    deduped = oracle_unique_pages(sf_dir, expand=expand)
    extracted = oracle_extract_table(deduped)
    summary = summarize_extracted_table(extracted)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(summary, preserve_index=False), tmp)
    os.replace(tmp, path)

    exploded = explode_pages(extracted.select(["url", "pages"]))
    pd_partial = _page_digest_partial(exploded)
    pages_summary = _combine_page_partials(pd_partial)[PAGES_DIGEST_COLS]
    tmp2 = pages_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pages_summary, preserve_index=False), tmp2)
    os.replace(tmp2, pages_path)

    # per-document oracle rows: the flagship's summary columns verbatim
    from .extract_pipeline import SUMMARY_COLUMNS

    tmp3 = docs_path + ".tmp"
    pq.write_table(extracted.select(SUMMARY_COLUMNS), tmp3)
    os.replace(tmp3, docs_path)

    # per-page meta oracle rows: explode + PNG-header parse, the same
    # functions the Ray path runs, executed single-process here
    from ..stages.multimodal import page_meta

    tmp4 = meta_path + ".tmp"
    pq.write_table(page_meta(exploded), tmp4)
    os.replace(tmp4, meta_path)

    # resized-raster digest: the same PngResizer the Ray path runs,
    # single-process — any byte drift in decode/resize/re-encode flips it
    from ..stages.multimodal import PngResizer

    resized = PngResizer(target_w=480, target_h=270)(exploded)
    resized_summary = _combine_page_partials(_page_digest_partial(resized))[
        PAGES_DIGEST_COLS
    ]
    tmp5 = resized_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(resized_summary, preserve_index=False), tmp5)
    os.replace(tmp5, resized_path)

    # embedding digest: the same TextEmbedder the Ray stage runs,
    # single-process over the documents table (float32 payload bytes)
    from ..stages.embed import TextEmbedder

    emb_docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    emb = TextEmbedder()(emb_docs)
    emb_summary = _combine_embedding_partials(_embedding_digest_partial(emb))
    tmp6 = emb_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(emb_summary, preserve_index=False), tmp6)
    os.replace(tmp6, emb_path)

    # image-feature oracle rows: the same GeneralImageDecoder + scalar
    # projection the Ray path runs, single-process over the same rasters
    from ..stages.multimodal import GeneralImageDecoder, image_feature_summary

    tmp7 = feat_path + ".tmp"
    pq.write_table(image_feature_summary(GeneralImageDecoder()(exploded)), tmp7)
    os.replace(tmp7, feat_path)
    return path


EMB_DIGEST_COLS = ["n_docs", "xor_digest"]


def _embedding_digest_partial(batch: pa.Table) -> pd.DataFrame:
    """One partial row per batch of (doc_id, embedding) rows: count + XOR
    of per-doc blake2b(doc_id: float32-vector-bytes)."""
    ids = batch["doc_id"].to_pylist()
    acc = np.uint64(0)
    for i, v in zip(ids, batch["embedding"].to_pylist()):
        b = np.asarray(v, dtype=np.float32).tobytes()
        d = hashlib.blake2b(f"{i}:".encode() + b, digest_size=8).digest()
        acc ^= np.uint64(int.from_bytes(d, "big"))
    return pd.DataFrame(
        {"n_docs": [len(ids)], "xor_digest": [int(acc.astype(np.int64))]}
    )


def _combine_embedding_partials(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "n_docs": [int(df["n_docs"].sum())],
            "xor_digest": [
                int(
                    np.bitwise_xor.reduce(
                        df["xor_digest"].to_numpy(dtype=np.int64).view(np.uint64)
                    ).astype(np.int64)
                )
            ],
        }
    )


def pages_resized_digest(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Ray side: explode → actor-pool decode/resize/re-encode → digest.
    SQL-checked against the single-process resize of the same rasters —
    the distributed transform must reproduce every output byte."""
    from ..stages.multimodal import PngResizer, explode_pages
    from .textops import _extracted_pages

    write_oracle_summary(sf_dir, expand=expand)
    partials = (
        _extracted_pages(sf_dir)
        .map_batches(explode_pages, batch_format="pyarrow", batch_size=16)
        .map_batches(
            PngResizer,
            fn_constructor_kwargs={"target_w": 480, "target_h": 270},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=(1, 4),
        )
        .map_batches(_page_digest_partial, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame({c: [0] for c in PAGES_DIGEST_COLS})
    return _combine_page_partials(partials)[PAGES_DIGEST_COLS]


def text_embeddings_digest(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Ray side: the embedding actor pool reduced to one digest row —
    bit-level check of the distributed model-inference stage."""
    import ray.data as _rd

    from ..stages.embed import embed_texts

    write_oracle_summary(sf_dir, expand=expand)
    docs = _rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    partials = (
        embed_texts(docs)
        .map_batches(_embedding_digest_partial, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame({c: [0] for c in EMB_DIGEST_COLS})
    return _combine_embedding_partials(partials)[EMB_DIGEST_COLS]


FLAGSHIP_ROW_COLS = [
    "url",
    "warc_us",
    "lang",
    "content_type",
    "status",
    "error_type",
    "n_payloads",
    "n_pages",
    "n_spans",
    "text_chars",
    "content_hash",
]


def flagship_rows(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """PER-DOCUMENT flagship output, SQL-checked: every summary column of
    every extracted row is hash-compared against the single-process
    oracle parquet (the aggregate summary/digest entries catch count and
    content drift; this catches row-level drift in ANY column).
    ``warc_ts`` is exposed as epoch microseconds (int64) so both engines
    hash identical integers instead of dialect-dependent timestamps."""
    import pyarrow.compute as _pc

    from .extract_pipeline import flagship

    write_oracle_summary(sf_dir, expand=expand)
    ds = flagship(sf_dir, expand=expand, summary_only=True)

    def fmt(t: pa.Table) -> pa.Table:
        us = _pc.cast(t["warc_ts"], pa.int64())  # timestamp[us] → µs since epoch
        return t.drop_columns(["warc_ts"]).append_column("warc_us", us).select(
            FLAGSHIP_ROW_COLS
        )

    return ds.map_batches(fmt, batch_format="pyarrow")


def summarize_extracted_table(t: pa.Table) -> pd.DataFrame:
    """Single-process equivalent of ``summarize_extracted`` over one table."""
    merged = _partial_df(t)
    out = (
        merged.groupby(["status", "content_type"], as_index=False, sort=False)
        .agg(
            n_docs=("n_docs", "sum"),
            xor_digest=(
                "xor_digest",
                lambda s: np.bitwise_xor.reduce(
                    s.to_numpy(dtype=np.int64).view(np.uint64)
                ),
            ),
        )
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["xor_digest"] = out["xor_digest"].astype(np.uint64).astype(np.int64)
    return out.sort_values(["status", "content_type"], ignore_index=True)[SUMMARY_COLS]

# ---------------------------------------------------------------------------
# Span tag-path statistics (the north-star's span-struct surface, aggregated)
# ---------------------------------------------------------------------------

_SPAN_STATS_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("kind", pa.string()),
        ("n_spans", pa.int64()),
        ("total_chars", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)


def span_tag_path_stats(
    sf_dir: str, expand: int = 2, num_buckets: int = 16
) -> rd.Dataset:
    """Corpus-wide statistics over the extraction's span records — per
    DOM tag-path and span kind: span count, total covered characters,
    and the number of distinct documents containing it.  This is the
    aggregate view of the "span offsets as Arrow struct columns"
    surface: which tag paths carry the corpus's main content, the
    signal used to tune the block-score heuristics.

    Ray shape: the spans column is exploded with zero-copy Arrow kernels
    (``list_flatten`` + ``list_parent_indices`` — no Python row loop),
    reduced within each batch to distinct ``(path, kind, url)`` partial
    rows, then ONE bucketed shuffle by path folds counts and distinct
    doc counts per (path, kind) — tag-path cardinality is tiny next to
    spans, so the shuffle moves partials only.

    SQL-checked: a REAL declarative DuckDB aggregation (GROUP BY +
    COUNT(DISTINCT url) + SUM(end-start)) over a flat span-rows parquet
    from the single-process extraction
    (rowsonly_oracles.write_span_rows_oracle).
    """
    import dataclasses

    import pyarrow.compute as _pc

    from ..config import DEFAULT_CONFIG
    from ..stages.dedup import stable_bucket_ids
    from .extract_pipeline import flagship

    # span stats never touch page rasters — skip the PNG render branch
    # (extracted text/spans are independent of cfg.render_pages)
    cfg = dataclasses.replace(DEFAULT_CONFIG, render_pages=False)
    ds = flagship(sf_dir, cfg, expand=expand, summary_only=False)

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = _pc.list_flatten(spans)
        parents = _pc.list_parent_indices(spans)
        urls = _pc.take(t["url"].combine_chunks(), parents)
        df = pd.DataFrame(
            {
                "path": flat.field("path").to_pandas(),
                "kind": flat.field("kind").to_pandas(),
                "url": urls.to_pandas(),
                "chars": (
                    flat.field("end").to_numpy(zero_copy_only=False)
                    - flat.field("start").to_numpy(zero_copy_only=False)
                ),
            }
        )
        out = (
            df.groupby(["path", "kind", "url"], as_index=False, sort=False)
            .agg(n=("chars", "size"), chars=("chars", "sum"))
        )
        pt = pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("path", pa.string()),
                    ("kind", pa.string()),
                    ("url", pa.string()),
                    ("n", pa.int64()),
                    ("chars", pa.int64()),
                ]
            )
        )
        b = (
            stable_bucket_ids(pt["path"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _SPAN_STATS_SCHEMA.empty_table()
        out = (
            g.groupby(["path", "kind"], as_index=False, sort=False)
            .agg(
                n_spans=("n", "sum"),
                total_chars=("chars", "sum"),
                n_docs=("url", "nunique"),
            )
        )
        return pa.Table.from_pandas(
            out, schema=_SPAN_STATS_SCHEMA, preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )
