#!/usr/bin/env python
"""Benchmark harness.

Headline: the flagship extraction pipeline (pages parquet → lang filter →
groupby-url dedup → actor-pool extract incl. PNG rasters → parquet sink)
over a deterministic synthetic pages table derived from
``$GRAFT_SF_DIR/documents.parquet`` (default /root/testdata/sf0.1).
Prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline twice in fresh processes at
``num_cpus=8`` and ``num_cpus=32`` on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
nodes, BASELINE.md).

Env: GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_EXPAND (pages per document).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
import __ray_entry__ as _entry  # noqa: E402  (registers pickle-by-value for workers)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_EXPAND", "128"))
PAGES_CACHE = "/tmp/graft_pages"
# Sink on tmpfs when available: the benchmark measures the engine, not
# this sandbox's disk; a multi-node deployment writes to distributed
# storage whose bandwidth scales with the cluster.
OUT_DIR = (
    "/dev/shm/graft_bench_out" if os.path.isdir("/dev/shm") else "/tmp/graft_bench_out"
)


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _pages_path() -> str:
    from png_from_pdf_extracter_ray.corpus.synth import CORPUS_VERSION

    tag = os.path.basename(SF_DIR.rstrip("/")) + f"_x{EXPAND}_v{CORPUS_VERSION}"
    return os.path.join(PAGES_CACHE, tag)


def _ensure_pages() -> tuple[str, int]:
    """Build (once) + warm-read the synthetic pages table. Untimed."""
    from png_from_pdf_extracter_ray.corpus.synth import build_pages_parquet

    path = _pages_path()
    build_pages_parquet(SF_DIR, path, expand=EXPAND)
    # Warm the OS page cache so the timed run measures compute + shuffle.
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    total += len(fh.read())
    import pyarrow.dataset as pads

    n_rows = pads.dataset(path, format="parquet").count_rows()
    return path, n_rows


def bench_extract(dedup_mode: str = "broadcast") -> dict:
    """Time the flagship with either dedup mode.

    ``broadcast`` (winner-map, no payload all-to-all) is the headline;
    ``shuffle`` (hash-bucket payload exchange) is the beyond-memory
    10^12-key path — benched too so the 100 TB route has a measured
    cost, not just a documented one.
    """
    from png_from_pdf_extracter_ray.pipelines.extract_pipeline import extract_pipeline
    from png_from_pdf_extracter_ray.sources.pages_source import read_pages

    pages_path, n_rows = _ensure_pages()
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    in_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(pages_path)
        for f in fs
        if f.endswith(".parquet")
    )

    import ray.data as rd

    t0 = time.perf_counter()
    ds = extract_pipeline(
        read_pages(pages_path),
        dedup=dedup_mode,
        slim_pages=(
            rd.read_parquet(pages_path, columns=["url", "warc_ts"])
            if dedup_mode == "broadcast"
            else None
        ),
        # measured at sf0.1 ×128 (fresh sessions): 32 cpus — 64→32.4 s,
        # 128→30.7 s, 256→38.0 s; 8 cpus warm — 64→105.9 s, 128→104.2 s.
        # 128 halves the dispatch/task count (the 32-cpu pool consumes
        # ~280 batches/s at 64) without lengthening stragglers.
        batch_size=128,
        summary_only=False,
    )
    ds.write_parquet(OUT_DIR)
    dt = time.perf_counter() - t0

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    out_ds = pads.dataset(OUT_DIR, format="parquet")
    n_out = out_ds.count_rows()
    n_pages = pc.sum(out_ds.to_table(columns=["n_pages"])["n_pages"]).as_py() or 0
    return {
        "sec": round(dt, 3),
        "input_rows": n_rows,
        "output_docs": n_out,
        "output_pages": int(n_pages),
        "docs_per_sec": round(n_out / dt, 1),
        "pages_per_sec": round(n_pages / dt, 1),
        "input_mb_per_sec": round(in_bytes / 1e6 / dt, 1),
    }


def bench_extract_skew() -> dict:
    """Time the size-bucketed skew-routed pipeline (small docs in large
    batches, mega-docs at batch_size=1 on a pool slice) over the same
    cached pages table — published alongside the flagship so the skew
    path has a trend line."""
    from png_from_pdf_extracter_ray.pipelines.extract_pipeline import (
        extract_pipeline_size_bucketed,
    )
    from png_from_pdf_extracter_ray.sources.pages_source import read_pages
    from png_from_pdf_extracter_ray.stages.dedup import (
        compute_winners,
        dedup_keep_first_broadcast,
    )
    from png_from_pdf_extracter_ray.stages.filters import filter_lang
    from png_from_pdf_extracter_ray.config import DEFAULT_CONFIG

    pages_path, n_rows = _ensure_pages()
    out_dir = OUT_DIR + "_skew"
    shutil.rmtree(out_dir, ignore_errors=True)

    import ray.data as rd

    t0 = time.perf_counter()
    winners = compute_winners(
        rd.read_parquet(pages_path, columns=["url", "warc_ts"]),
        key="url",
        order_col="warc_ts",
    )

    def factory() -> "rd.Dataset":
        ds = filter_lang(read_pages(pages_path), DEFAULT_CONFIG.lang_allow)
        return dedup_keep_first_broadcast(ds, winners, key="url", order_col="warc_ts")

    ds = extract_pipeline_size_bucketed(factory)
    ds.write_parquet(out_dir)
    dt = time.perf_counter() - t0

    import pyarrow.dataset as pads

    n_out = pads.dataset(out_dir, format="parquet").count_rows()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(dt, 3),
        "output_docs": n_out,
        "docs_per_sec": round(n_out / dt, 1),
    }


def bench_queries() -> dict[str, float]:
    entrymod = _entry

    import ray.data

    timed = [
        "q1_pricing_summary",
        "dedup_exact_text",
        "token_counts",
        "events_hourly",
        "similarity_topk",
        "customers_per_nation",
        "stopword_stats",
        "text_embeddings",
        "minhash_near_dups",
        "ngram_jaccard_near_dups",
        "simhash_near_dups",
        "embedding_near_dups_lsh",
        "q5_local_supplier_volume",
        "q7_volume_shipping",
        "tfidf_top_terms",
        "heavy_hitter_tokens",
        "semantic_dedup",
        "cross_doc_duplicate_spans",
        "kmeans_doc_clusters",
        "similarity_topk_pq",
        "similarity_topk_ivfpq",
        "pca_doc_projections",
        "ridge_quality_model",
        "bpe_train_merges",
        "bpe_encode_docs",
        "dsir_importance_weights",
        "linkgraph_pagerank",
        "linkgraph_components",
        "pages_snapshot_churn",
        "training_shards_digest",
        "bigram_logprob_scores",
        "gopher_quality_filter",
        "domain_link_matrix",
        "ccnet_perplexity_buckets",
        "bm25_topk",
        "contamination_overlap_scores",
        "domain_reputation",
        "source_kl_divergence",
        "phrase_search",
        "blocklist_filter",
        "unigram_train_vocab",
        "unigram_encode_docs",
        "canonical_url_dedup",
        "paragraph_dedup",
        "mirror_host_pairs",
        "pages_snapshot_drift",
        "token_budget_select",
        "host_triangle_counts",
        "curation_funnel",
        "ngram_containment_near_dups",
        "doc_chunks_overlap",
        "host_grouped_split",
        "url_path_templates",
        "pmi_collocations",
        "pages_recrawl_intervals",
        "host_token_concentration",
        "pages_title_index",
        "sentence_stats",
    ]
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in timed:
        # reclaim BETWEEN queries too: r3's customers_per_nation read
        # 12.8 s in sequence vs 3.3 s isolated (×3 reps) — the previous
        # query's still-tearing-down actor pool / unreleased plasma
        # blocks bled into the next timing.  gc + a short settle damps it.
        _reclaim(1.0)
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()  # consume
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def _emit(result: dict) -> None:
    """Print the result as ONE compact JSON line (the driver's
    tail-capture has a byte budget — r4's default-separator line with 49
    query timings was truncated mid-line and recorded ``parsed: null``),
    and mirror the full result to BENCH_LOCAL.json so the numbers
    survive any future truncation regardless."""
    try:
        with open(os.path.join(_REPO, "BENCH_LOCAL.json"), "w") as fh:
            json.dump(result, fh, indent=2)
    except OSError:
        pass
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1900 and isinstance(result.get("queries"), dict):
        # hard guard: never exceed the tail budget — shed the cheapest
        # query timings first (they are preserved in BENCH_LOCAL.json)
        q = dict(
            sorted(result["queries"].items(), key=lambda kv: -kv[1])
        )
        while q and len(json.dumps({**result, "queries": q}, separators=(",", ":"))) > 1900:
            q.popitem()
        result = {**result, "queries": q, "queries_truncated": True}
        line = json.dumps(result, separators=(",", ":"))
    sys.stdout.flush()
    print(line, flush=True)


def _reclaim(settle: float = 2.0) -> None:
    """Drop references and let plasma reclaim between bench phases — a
    prior phase's materialized blocks otherwise push the next phase's
    working set into spill and skew its number."""
    import gc

    gc.collect()
    time.sleep(settle)


def run_once(shuffle_bench: bool = True, flagship_only: bool = False) -> dict:
    _init_ray()
    extract = bench_extract("broadcast")
    if shuffle_bench:
        _reclaim()
        shuffle = bench_extract("shuffle")
        _reclaim()
        skew = bench_extract_skew()
        _reclaim()
    else:
        shuffle = skew = None
    queries = {} if flagship_only else bench_queries()
    result = {
        "metric": "flagship extract wall sec (dedup+render+sink)",
        "value": extract["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "expand": EXPAND,
        **{k: v for k, v in extract.items() if k != "sec"},
    }
    # sub-dicts slimmed on the wire (full copies land in BENCH_LOCAL.json
    # via _emit; the printed line must stay inside the driver's 2000-byte
    # tail budget)
    if shuffle is not None:
        result["shuffle_dedup"] = {
            "sec": shuffle["sec"],
            "docs_per_sec": shuffle["docs_per_sec"],
        }
    if skew is not None:
        result["skew_routed"] = {
            "sec": skew["sec"],
            "docs_per_sec": skew["docs_per_sec"],
        }
    import ray

    ray.shutdown()
    return result


def _probe_work(seed: int) -> float:
    """One probe worker: seeded-deterministic compress loop (module-level
    so Pool.map can pickle it)."""
    import zlib

    rng = __import__("random").Random(seed)
    data = bytes(rng.getrandbits(8) for _ in range(200_000)) * 10
    t0 = time.perf_counter()
    for _ in range(20):
        zlib.compress(data, 6)
    return time.perf_counter() - t0


def _host_ceiling_probe(hi: int = 30) -> dict:
    """Raw-CPU N→4N ceiling of the HOST right now (no Ray): per-core
    zlib throughput at 1-way, 8-way and ``hi``-way load.  ``hi`` is 30,
    not 32, because the 32-cpu flagship leg actually runs a cpus−2
    actor pool (30 concurrent extraction workers) — the probe mirrors
    the real high-parallelism load shape.  On a shared
    sandbox, fully-loaded cores can run 1.4× slower than idle cores —
    a scaling measurement taken in such a window grades the neighbors,
    not the engine (BASELINE.md late-r4 protocol).  The ceiling is
    (8-way per-core time) / (hi-way per-core time): the best efficiency
    ANY 8→32 job could show on this host at this moment."""
    import multiprocessing as mp

    out = {}
    for n in (1, 8, hi):
        with mp.Pool(n) as p:
            out[n] = max(p.map(_probe_work, range(n)))
    return {
        "percore_sec_1": round(out[1], 2),
        "percore_sec_8": round(out[8], 2),
        f"percore_sec_{hi}": round(out[hi], 2),
        "host_raw_ceiling": round(out[8] / out[hi], 3),
    }


def run_scaling() -> dict:
    def sub(ncpu: int, extra: list[str] | None = None) -> dict:
        # scaling reps time the headline (broadcast) flagship only —
        # the query suite is skipped entirely (it is not part of the
        # scaling metric and only adds wall time + plasma noise)
        extra = ["--no-shuffle-bench", "--flagship-only"] + (extra or [])
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *(extra or [])],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    sub(hi, ["--prepare"])  # build the pages cache at full parallelism, untimed
    # 5 reps: this sandbox's run-to-run variance is ±15%, and a 3-rep
    # median landed on both sides of the 0.8 bar in back-to-back runs
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "5"))

    def median_run(ncpu: int) -> dict:
        runs = sorted((sub(ncpu) for _ in range(reps)), key=lambda r: r["value"])
        return runs[len(runs) // 2]

    probe = _host_ceiling_probe()
    r_lo, r_hi = median_run(lo), median_run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": f"scaling efficiency (num_cpus 8 -> 32, same input, median of {reps})",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # raw host ceiling measured immediately before the reps: if this
        # is itself below the bar, the window cannot evidence the
        # criterion no matter what the engine does (BASELINE.md)
        "host_probe": probe,
        "sf": SF_DIR,
        "expand": EXPAND,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _emit(run_scaling())
    elif "--prepare" in sys.argv:
        _init_ray()
        path, n = _ensure_pages()
        import ray

        ray.shutdown()
        print(json.dumps({"prepared": path, "rows": n}))
    else:
        _emit(
            run_once(
                shuffle_bench="--no-shuffle-bench" not in sys.argv,
                flagship_only="--flagship-only" in sys.argv,
            )
        )
