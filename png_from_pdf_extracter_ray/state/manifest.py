"""Per-partition lineage manifests + commit-last resume protocol.

The reference's exactly-once-ish story is "delete the email only after
the reply was sent" (/root/reference/src/services/job_processor.py:148-153
— STORE \\Deleted + EXPUNGE as the ack) with duplicate work on crash
explicitly acceptable (NFR-008,
/root/reference/specs/001-pdf-to-png-mailer/spec.md:139).  Here the same
protocol is: a partition's output directory is written first, then its
manifest is committed via atomic rename — the manifest IS the EXPUNGE.
On resume, partitions with a committed manifest are skipped; a partition
that crashed mid-write is re-run from scratch — its output directory is
cleared first, because ``write_parquet`` uses unique per-run filenames
and would otherwise APPEND beside the crashed attempt's partial files,
silently duplicating rows.

Each manifest records lineage + metrics (north rule: "per-partition
lineage manifests … partition id, input file, row range, content hashes
… per-stage metrics"): the shard's input spec, row counts by status, an
order-insensitive content digest (XOR of per-row blake2b(url, hash)),
and wall-clock timing.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass
from typing import Any, Callable

import pyarrow.dataset as pads

import ray.data as rd

from .. import __version__ as ENGINE_VERSION


@dataclass
class PartitionManifest:
    partition_id: int
    input_spec: dict[str, Any]
    row_count: int
    rows_by_status: dict[str, int]
    content_digest: str
    started_at: float
    duration_s: float
    engine_version: str = ENGINE_VERSION
    # per-operator wall/rows from the executed Dataset's stats —
    # the "per-stage metrics" leg of the lineage record (north rule).
    # Default keeps pre-existing manifests loadable on resume.
    stage_metrics: list[dict[str, Any]] | None = None


_STAGE_RE = None


def stage_metrics_from_stats(stats_text: str, max_stages: int = 16) -> list[dict[str, Any]]:
    """Parse Ray's ``Dataset.stats()`` text into per-operator rows.

    The stats format is informational (not a stable API), so this is a
    best-effort extractor: operator name + total wall time per stage.
    Unparseable stats yield an empty list, never an error.
    """
    global _STAGE_RE
    import re

    if _STAGE_RE is None:
        _STAGE_RE = re.compile(
            r"^Operator (\d+) (.+?): (\d+) tasks executed, (\d+) blocks produced in ([\d.]+)s",
            re.M,
        )
    out: list[dict[str, Any]] = []
    try:
        for num, name, tasks, blocks, secs in _STAGE_RE.findall(stats_text or ""):
            out.append(
                {
                    "op": int(num),
                    "name": name,
                    "tasks": int(tasks),
                    "blocks": int(blocks),
                    "wall_s": float(secs),
                }
            )
    except Exception:
        return []
    return out[:max_stages]


def _digest_xor(urls: list[str], hashes: list[str]) -> str:
    acc = 0
    for u, h in zip(urls, hashes):
        d = hashlib.blake2b(f"{u}:{h}".encode(), digest_size=16).digest()
        acc ^= int.from_bytes(d, "big")
    return f"{acc:032x}"


def _part_dirs(out_dir: str, pid: int) -> tuple[str, str]:
    return (
        os.path.join(out_dir, "parts", f"part-{pid:05d}"),
        os.path.join(out_dir, "manifests", f"part-{pid:05d}.json"),
    )


def is_committed(out_dir: str, pid: int) -> bool:
    return os.path.exists(_part_dirs(out_dir, pid)[1])


def summarize_partition(part_dir: str) -> tuple[int, dict[str, int], str]:
    """Read back only (url, status, content_hash) columns to build metrics."""
    dataset = pads.dataset(part_dir, format="parquet")
    t = dataset.to_table(columns=["url", "status", "content_hash"])
    statuses = t["status"].to_pylist()
    counts: dict[str, int] = {}
    for s in statuses:
        counts[s] = counts.get(s, 0) + 1
    digest = _digest_xor(t["url"].to_pylist(), t["content_hash"].to_pylist())
    return t.num_rows, counts, digest


def watch_partitioned(
    list_shards: Callable[[], list[dict[str, Any]]],
    out_dir: str,
    pipeline_for_shard: Callable[[dict[str, Any]], rd.Dataset],
    *,
    poll_interval_s: float = 60.0,
    max_polls: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[PartitionManifest]:
    """Continuous-ingest analog of the reference's poll loop
    (/root/reference/src/services/job_processor.py:223-262: check the
    INBOX every 60 s, process what's new).

    Each poll re-lists the shards (``list_shards`` reads the CURRENT
    input — new data ⇒ new shards appended at the end) and re-runs
    ``run_partitioned`` with resume: committed partitions are skipped by
    their manifest, so only newly arrived shards pay anything.  Shard
    ids must be stable across polls (append-only fixed doc-id ranges —
    the CLI's ``--watch`` only submits FULL ranges so a growing tail
    shard is never committed early).  ``max_polls`` bounds the run (the
    reference loops forever; a bounded loop is the testable analog).
    """
    manifests: list[PartitionManifest] = []
    polls = 0
    while True:
        manifests = run_partitioned(
            list_shards(), out_dir, pipeline_for_shard, resume=True
        )
        polls += 1
        if max_polls is not None and polls >= max_polls:
            return manifests
        sleep(poll_interval_s)


def run_partitioned(
    shards: list[dict[str, Any]],
    out_dir: str,
    pipeline_for_shard: Callable[[dict[str, Any]], rd.Dataset],
    *,
    resume: bool = True,
) -> list[PartitionManifest]:
    """Run ``pipeline_for_shard`` per shard with commit-last manifests.

    Shards run sequentially; each shard's Dataset executes with full
    cluster parallelism under the streaming executor (≈ the reference's
    poll loop processing one batch of pending mail per iteration,
    job_processor.py:223-262 — but each "email" here is a whole
    partition processed in parallel).
    """
    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifests"), exist_ok=True)
    manifests: list[PartitionManifest] = []
    for pid, shard in enumerate(shards):
        part_dir, man_path = _part_dirs(out_dir, pid)
        if resume and os.path.exists(man_path):
            with open(man_path) as f:
                manifests.append(PartitionManifest(**json.load(f)))
            continue
        t0 = time.time()
        # No committed manifest for this partition: any files in part_dir
        # are leftovers from a crashed attempt.  write_parquet names files
        # uniquely per run (append semantics), so clear them or the re-run
        # would double-count every row the crashed attempt got out.
        shutil.rmtree(part_dir, ignore_errors=True)
        ds = pipeline_for_shard(shard)
        ds.write_parquet(part_dir)
        try:
            stages = stage_metrics_from_stats(ds.stats())
        except Exception:
            stages = []
        rows, by_status, digest = summarize_partition(part_dir)
        manifest = PartitionManifest(
            partition_id=pid,
            input_spec=shard,
            row_count=rows,
            rows_by_status=by_status,
            content_digest=digest,
            started_at=t0,
            duration_s=time.time() - t0,
            stage_metrics=stages,
        )
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f, indent=1)
        os.replace(tmp, man_path)  # commit — the EXPUNGE
        manifests.append(manifest)
    return manifests
