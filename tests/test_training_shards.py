"""training_shards_digest: partitioned-write layout + digest invariance
(the SQL row_number parity lives in test_queries_vs_duckdb.py)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from png_from_pdf_extracter_ray.pipelines.textops import (
    SHARD_COUNT,
    training_shards_digest,
)

SF = "/root/testdata/sf0.001"


def test_shard_write_idempotent(ray_session, tmp_path) -> None:  # noqa: ANN001
    out_dir = str(tmp_path / "shards")
    d1 = (
        training_shards_digest(SF, write_dir=out_dir)
        .to_pandas()
        .sort_values("shard_id", ignore_index=True)
    )
    files = sorted(glob.glob(os.path.join(out_dir, "shard=*.parquet")))
    assert len(files) == len(d1) <= SHARD_COUNT
    # every document lands in exactly one shard
    n_docs = pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows
    assert sum(pq.read_metadata(f).num_rows for f in files) == n_docs
    assert int(d1["n_docs"].sum()) == n_docs

    # resume: a second run reuses existing shard files and reports the
    # same digests (deterministic, no RNG)
    mtimes = {f: os.path.getmtime(f) for f in files}
    d2 = (
        training_shards_digest(SF, write_dir=out_dir)
        .to_pandas()
        .sort_values("shard_id", ignore_index=True)
    )
    assert d1.equals(d2)
    assert {f: os.path.getmtime(f) for f in files} == mtimes


def test_shard_files_sorted_by_order_hash(ray_session, tmp_path) -> None:  # noqa: ANN001
    import hashlib

    out_dir = str(tmp_path / "shards")
    training_shards_digest(SF, write_dir=out_dir).materialize()
    f = sorted(glob.glob(os.path.join(out_dir, "shard=*.parquet")))[0]
    ids = pq.read_table(f)["doc_id"].to_pylist()
    keys = [
        (int(hashlib.md5(f"order:{i}".encode()).hexdigest()[:15], 16), i) for i in ids
    ]
    assert keys == sorted(keys)
