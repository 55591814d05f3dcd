"""CLI entry point — the distributed analog of ``python -m src.main``
(/root/reference/src/main.py:17-106).

One invocation = one bounded run over a sharded pages corpus with
per-partition lineage manifests; ``--resume`` re-runs only uncommitted
partitions (the manifest-as-EXPUNGE protocol, state/manifest.py).  The
reference's daemon loop becomes "re-submit with --resume".

Usage:
    python -m png_from_pdf_extracter_ray.main \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/extract_run \\
        --shards 4 --expand 2 [--resume] [--dedup broadcast|shuffle|none]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def resolve_watch_shard_size(
    out_dir: str, n_docs: int, shards: int, shard_size: int | None
) -> int:
    """Pin the watch-mode shard size to the output dir.

    The shard size DEFINES partition ids for the lifetime of ``out_dir``:
    it is persisted on first start and reloaded on restart — deriving it
    from the (growing) input each start would silently re-map committed
    manifests onto different doc ranges, skipping new data and
    mis-attributing old shards.
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "watch_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            size = json.load(f)["shard_size"]
        if shard_size and shard_size != size:
            raise SystemExit(
                f"--shard-size {shard_size} conflicts with the committed "
                f"shard size {size} recorded in {meta_path}"
            )
        return size
    if n_docs == 0 and not shard_size:
        raise SystemExit(
            "--watch on an empty input needs an explicit --shard-size "
            "(deriving it from zero docs would lock in 1-doc shards)"
        )
    size = shard_size or max(1, -(-n_docs // shards))
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"shard_size": size}, f)
    os.replace(tmp, meta_path)
    return size


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="testdata dir holding documents.parquet")
    ap.add_argument("--out", required=True, help="output dir (parts/ + manifests/)")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--expand", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dedup", choices=["broadcast", "shuffle", "none"], default="shuffle")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--watch",
        action="store_true",
        help="continuous-ingest mode: poll the input for new full shards "
        "(reference's 60 s INBOX poll); committed shards are never re-run",
    )
    ap.add_argument("--poll-interval", type=float, default=60.0)
    ap.add_argument("--max-polls", type=int, default=None)
    ap.add_argument(
        "--shard-size",
        type=int,
        default=None,
        help="docs per shard in --watch mode (stable append-only shard ids)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from .config import ExtractConfig
    from .pipelines.extract_pipeline import extract_pipeline
    from .sources.pages_source import synthesize_pages
    from .state.manifest import run_partitioned, watch_partitioned

    cfg = ExtractConfig.from_env()
    dedup: bool | str = False if args.dedup == "none" else args.dedup

    def pipeline_for(shard):  # noqa: ANN001, ANN202
        pages = synthesize_pages(
            args.sf_dir, expand=args.expand, doc_range=(shard["doc_lo"], shard["doc_hi"])
        )
        return extract_pipeline(pages, cfg, dedup=dedup, summary_only=False)

    def _n_docs() -> int:
        return pq.read_metadata(f"{args.sf_dir}/documents.parquet").num_rows

    if args.watch:
        size = resolve_watch_shard_size(
            args.out, _n_docs(), args.shards, args.shard_size
        )

        def list_full_shards() -> list[dict]:
            # only FULL fixed-size ranges: the growing tail shard must
            # not be committed early (its id would be reused once full)
            n = _n_docs()
            return [
                {"doc_lo": i * size, "doc_hi": (i + 1) * size}
                for i in range(n // size)
            ]

        manifests = watch_partitioned(
            list_full_shards,
            args.out,
            pipeline_for,
            poll_interval_s=args.poll_interval,
            max_polls=args.max_polls,
        )
    else:
        n_docs = _n_docs()
        per = max(1, -(-n_docs // args.shards))
        shards = [
            {"doc_lo": i * per, "doc_hi": min((i + 1) * per, n_docs)}
            for i in range(args.shards)
            if i * per < n_docs
        ]
        manifests = run_partitioned(shards, args.out, pipeline_for, resume=args.resume)
    total = sum(m.row_count for m in manifests)
    by_status: dict[str, int] = {}
    for m in manifests:
        for k, v in m.rows_by_status.items():
            by_status[k] = by_status.get(k, 0) + v
    print(
        json.dumps(
            {
                "partitions": len(manifests),
                "rows": total,
                "rows_by_status": by_status,
                "out": args.out,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
