"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library code) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry — column names
match exactly.  Non-relational-but-deterministic entries (extraction,
MinHash/SimHash/SRP-LSH near-dups, rolling fingerprints, HLL, LSH ANN,
image features) are checked against SINGLE-PROCESS no-Ray recompute
parquets (pipelines/summary.py, pipelines/rowsonly_oracles.py).  Only
genuinely batch-variant entries (grid-quantile / percentile-rank
sketches, IVF ANN with its live-Dataset k-means sample, raw list-typed
vector outputs) stay rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The repo is not an installed package: make it importable for THIS process
# (the driver may import this module from any cwd) ...
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# ... and for Ray WORKER processes, which do not share the driver's
# sys.path: register every package module for cloudpickle by-value
# serialization so UDF classes/functions ship their code with the task
# instead of being looked up by module name on the worker.
def _register_pickle_by_value() -> None:
    import importlib
    import pkgutil

    from ray import cloudpickle as _cp

    # Eagerly import EVERY package module (pkgutil walk, not a hand-kept
    # list) so each one exists in sys.modules before registration — a
    # module first imported lazily AFTER this point would ship by
    # reference and fail to import on foreign-cwd workers.
    pkg = importlib.import_module("png_from_pdf_extracter_ray")
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            importlib.import_module(info.name)
        except Exception as exc:  # noqa: BLE001
            # LOUD skip: an unregistered module ships by reference and
            # fails much later on foreign-cwd workers with an unrelated
            # ModuleNotFoundError — surface the real cause here
            print(
                f"[__ray_entry__] WARNING: {info.name} failed to import and "
                f"will not pickle by value: {exc!r}",
                file=sys.stderr,
            )
    for name, mod in list(sys.modules.items()):
        if name.startswith("png_from_pdf_extracter_ray") and mod is not None:
            try:
                _cp.register_pickle_by_value(mod)
            except Exception:
                pass


_register_pickle_by_value()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (summary columns)."""
    from png_from_pdf_extracter_ray.pipelines.extract_pipeline import flagship

    return flagship("/root/testdata/sf0.001", expand=2, summary_only=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from png_from_pdf_extracter_ray.pipelines import corpus_stats
    from png_from_pdf_extracter_ray.pipelines import data_quality as dq
    from png_from_pdf_extracter_ray.pipelines import dsir as dsel
    from png_from_pdf_extracter_ray.pipelines import linkgraph as lg
    from png_from_pdf_extracter_ray.pipelines import ingest as _ingest
    from png_from_pdf_extracter_ray.pipelines import profiler as _prof
    from png_from_pdf_extracter_ray.pipelines import mlops
    from png_from_pdf_extracter_ray.pipelines.tokenizer import (
        tokenizer_fertility_by_lang as _tokenizer_fertility,
    )
    from png_from_pdf_extracter_ray.pipelines import relational as rel
    from png_from_pdf_extracter_ray.pipelines import selection as selp
    from png_from_pdf_extracter_ray.pipelines import snapshots as snaps
    from png_from_pdf_extracter_ray.pipelines import textops
    from png_from_pdf_extracter_ray.pipelines import urlops
    from png_from_pdf_extracter_ray.pipelines.extract_pipeline import flagship

    from png_from_pdf_extracter_ray.pipelines.summary import (
        flagship_summary,
        span_tag_path_stats,
    )
    from png_from_pdf_extracter_ray.pipelines.summary import (
        flagship_rows as _flagship_rows,
    )
    from png_from_pdf_extracter_ray.pipelines.summary import pages_digest as _pages_digest
    from png_from_pdf_extracter_ray.pipelines.summary import (
        pages_resized_digest as _resized_digest,
    )
    from png_from_pdf_extracter_ray.pipelines.summary import (
        skew_routed_summary as _skew_summary,
    )
    from png_from_pdf_extracter_ray.pipelines.summary import (
        text_embeddings_digest as _emb_digest,
    )

    # Ordering contract: the driver attests the FIRST 50 entries in
    # CORRECTNESS_r{N}.json, so the window holds one representative of
    # EVERY operator family (flagship extraction, exact/minhash/simhash/
    # ngram/LSH/semantic/pHash/cross-doc dedup, ANN ×4 incl. PQ, HLL +
    # quantile sketches, distributed k-means, ridge regression, BPE
    # training, multimodal page ops, TPC-H shapes, windows/as-of/pivot/
    # funnel/correlation, tf-idf, bloom, packing, PII); long-tail
    # variants and the remaining relational shapes follow after.
    return {
        # --- flagship extraction family (summary/rows/digests are
        # SQL-checked vs the single-process oracle parquets) ---
        "extract_flagship": lambda sf: flagship(sf, expand=2, summary_only=True),
        "extract_flagship_summary": lambda sf: flagship_summary(sf, expand=2),
        "extract_flagship_rows": lambda sf: _flagship_rows(sf, expand=2),
        "pages_digest": lambda sf: _pages_digest(sf, expand=2),
        "pages_resized_digest": lambda sf: _resized_digest(sf, expand=2),
        "text_embeddings_digest": lambda sf: _emb_digest(sf, expand=2),
        "extract_skew_routed_summary": lambda sf: _skew_summary(sf, expand=2),
        # --- deduplication family (exact → sketch → LSH → semantic →
        # image → cross-doc substring; all SQL-checked) ---
        "dedup_exact_text": rel.dedup_exact_text,
        "semantic_dedup": textops.semantic_dedup_embeddings,
        "minhash_near_dups": textops.minhash_near_dups,
        "simhash_near_dups": textops.simhash_near_dups,
        "embedding_near_dups_lsh": textops.embedding_near_dups_lsh,
        "pages_phash_near_dups": textops.pages_phash_near_dups,
        "cross_doc_duplicate_spans": dq.cross_doc_duplicate_spans,
        "paragraph_dedup": dq.paragraph_dedup_docs,
        # --- crawl-curation family reps (r4-final; SQL-checked) ---
        "mirror_host_pairs": dq.mirror_host_pairs,
        "span_tag_path_stats": span_tag_path_stats,
        "host_pagerank": lg.host_pagerank,
        # --- similarity search (brute-force + IVF reps; the LSH and PQ
        # variants live in the long tail) ---
        "similarity_topk": textops.similarity_topk,
        "similarity_topk_ivf": textops.similarity_topk_ivf,
        # --- budgeted / balanced corpus selection (r4: distributed
        # weighted-threshold cut — histogram refinement, no global
        # sort — vs a DuckDB global window; exact-integer per-source
        # rebalancing vs pure declarative SQL) ---
        "token_budget_select": selp.token_budget_select,
        "lang_balanced_sample": selp.balanced_sample,
        # --- graph analytics (degree-ordered distributed triangle
        # counting over the host quotient graph vs DuckDB's declarative
        # triple self-join; orientation-invariant counts) ---
        "host_triangle_counts": lg.host_triangle_counts,
        # --- distributed ML (iterative k-means, one-pass ridge fit,
        # BPE tokenizer training; all SQL-checked vs flat twins) ---
        "kmeans_doc_clusters": mlops.kmeans_doc_clusters,
        "ridge_quality_model": mlops.ridge_quality_model,
        "bpe_train_merges": mlops.bpe_train_merges,
        "pca_doc_projections": mlops.pca_doc_projections,
        "dsir_importance_weights": dsel.dsir_importance_weights,
        # (bpe_encode_docs and heavy_hitters_cms are family variants —
        # they live in the long tail below)
        # --- sketches (HLL SQL-checked vs flat recompute; the grid
        # sketches are batch-boundary-dependent → rows-only, so they
        # live in the long tail — the driver window only spends slots
        # on SQL-attestable entries; r5 promoted linkgraph_components
        # and token_balanced_shards in their place) ---
        "distinct_users_per_event_type_hll": rel.distinct_users_per_event_type_hll,
        "linkgraph_components": lg.linkgraph_components,
        "token_balanced_shards": selp.token_balanced_shards,
        # --- link-graph family (hyperlink extraction digest + integer
        # PageRank; both SQL-checked vs flat single-process oracles) ---
        "page_links_digest": lg.page_links_digest,
        "linkgraph_pagerank": lg.linkgraph_pagerank,
        "search_index_topk": lg.search_index_topk,
        # --- multimodal page operations ---
        "pages_page_meta": textops.pages_page_meta,
        "pages_jpeg_roundtrip": textops.pages_jpeg_roundtrip,
        # --- end-to-end composition rep (filter chain -> rebalance ->
        # token budget as one funnel; pages_image_features_summary moved
        # to the multimodal long tail — two raster reps stay above) ---
        "curation_funnel": selp.curation_funnel,
        # --- TPC-H query shapes (SQL-checked) ---
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_shipping_priority": rel.q3_shipping_priority,
        # --- LM-score / perplexity-bucketing family rep (r4 closing
        # session; q8 moved to the TPC-H long tail — four TPC-H reps
        # remain in the window) ---
        "ccnet_perplexity_buckets": corpus_stats.ccnet_perplexity_buckets,
        # --- incremental-crawl temporal family rep (bucketed per-url
        # window op, SQL-checked vs real DuckDB lag()/row_number()
        # windows over the flat slim-pages parquet; q7 moved to the
        # TPC-H long tail to keep the window at one rep per family) ---
        "pages_snapshot_churn": snaps.pages_snapshot_churn,
        # --- url-ops family rep (canonicalization + canonical-key
        # dedup; SQL-checked vs an INDEPENDENT DuckDB regexp/string
        # canonicalization over the flat messy-urls parquet;
        # events_type_hour_pivot moved to the long tail — the events
        # family keeps as-of/sessionize/funnel reps in the window) ---
        "canonical_url_dedup": urlops.canonical_url_dedup,
        # --- windows / as-of / pivot / funnel / correlation ---
        "events_asof_last_purchase": rel.events_asof_last_purchase,
        "events_sessionize": rel.events_sessionize,
        "events_funnel_counts": rel.events_funnel_counts,
        "lineitem_correlations": rel.lineitem_correlations,
        # --- corpus statistics / packing / data quality reps ---
        "tfidf_top_terms": corpus_stats.tfidf_top_terms,
        "benchmark_contamination_bloom": corpus_stats.benchmark_contamination_bloom,
        "context_pack_bins": textops.pack_documents_greedy,
        "pii_scrub": dq.pii_scrub,
        # ==================== end of the 50-entry driver window =========
        # --- sketch / multimodal variants displaced by the link-graph reps
        # (the two grid sketches are rows-only by construction — demoted
        # here in r5 so every window slot is driver-attestable) ---
        "quantity_quantiles_sketch": rel.quantity_quantiles_sketch,
        "order_value_percentile_ranks": rel.order_value_percentile_ranks,
        "quantity_quantiles_by_returnflag": rel.quantity_quantiles_by_returnflag,
        "pages_resized_thumbs": textops.pages_resized_thumbs,  # digest-checked
        # --- link-graph long tail ---
        "link_out_degree_hist": lg.link_out_degree_hist,
        "link_in_degree_topk": lg.link_in_degree_topk,
        "anchor_text_top_terms": lg.anchor_text_top_terms,
        "linkgraph_hits": lg.linkgraph_hits,
        "crawl_frontier_urls": lg.crawl_frontier_urls,
        "domain_link_matrix": lg.domain_link_matrix,
        "link_khop_reach": lg.link_khop_reach,
        # --- dedup family long tail ---
        "minhash_dedup_keep_best": textops.minhash_dedup_keep_best,
        "pages_phash_dedup_groups": textops.pages_phash_dedup_groups,
        "pages_frame_sample": textops.pages_frame_sample,
        # --- ANN long tail ---
        "similarity_topk_lsh": textops.similarity_topk_lsh,
        "similarity_topk_pq": mlops.similarity_topk_pq,
        "similarity_topk_ivfpq": mlops.similarity_topk_ivfpq,
        # --- selection long tail (unbounded-key weighted percentiles,
        # the weight-balanced shard planner, and the exact-count sample
        # — all on the same histogram-refinement cut primitive) ---
        "token_weighted_length_percentiles": selp.token_weighted_length_percentiles,
        "exact_count_sample": selp.exact_count_sample,
        "calibrated_quality_filter": selp.calibrated_quality_filter,
        # --- multimodal long tail (features rep demoted for the funnel) ---
        "pages_image_features_summary": textops.pages_image_features_summary,
        # progressive (SOF2) encode→decode roundtrip — the decode path
        # real crawl image payloads exercise (r5; kernel/jpeg.py)
        "pages_jpeg_progressive_roundtrip": textops.pages_jpeg_progressive_roundtrip,
        # WebP lossless (VP8L) encode→decode roundtrip — the web-native
        # lossless format real crawls carry (r5; kernel/webp.py,
        # conformance-pinned against libwebp in tests/test_webp.py)
        "pages_webp_roundtrip": textops.pages_webp_roundtrip,
        "pages_vp8_roundtrip": textops.pages_vp8_roundtrip,
        # --- graph-analytics long tail (triangle machinery + degree) ---
        "host_clustering_coeff": lg.host_clustering_coeff,
        # --- interchange-format long tail (distributed JSONL sink →
        # source hop digest-checked against the original parquet) ---
        "documents_jsonl_roundtrip": _ingest.jsonl_roundtrip_digest,
        "documents_csv_roundtrip": _ingest.csv_roundtrip_digest,
        # --- corpus-diagnostics long tail (Heaps-law growth; the Zipf
        # fit's companion) ---
        "heaps_vocab_curve": corpus_stats.heaps_vocab_curve,
        # --- windows long tail ---
        "events_sliding_window": rel.events_sliding_window,
        "events_retention_cohorts": rel.events_retention_cohorts,
        "events_type_hour_pivot": rel.events_type_hour_pivot,
        # --- incremental-crawl / url-ops long tail ---
        "pages_latest_snapshot": snaps.pages_latest_snapshot,
        "pages_snapshot_drift": snaps.pages_snapshot_drift,
        "pages_recrawl_intervals": snaps.pages_recrawl_intervals,
        "host_crawl_trend": snaps.host_crawl_trend,
        "adaptive_recrawl_schedule": snaps.adaptive_recrawl_schedule,
        "content_dedup_winner_map": snaps.content_dedup_winner_map,
        "crawl_novelty_by_day": snaps.crawl_novelty_by_day,
        "url_canonicalize": urlops.url_canonicalize,
        "crawl_politeness_schedule": urlops.crawl_politeness_schedule,
        "host_grouped_split": urlops.host_grouped_split,
        "url_path_templates": urlops.url_path_templates,
        "embedding_outlier_scores": mlops.embedding_outlier_scores,
        "embedding_sq8_digest": mlops.embedding_sq8_digest,
        "pages_title_index": textops.pages_title_index,
        # --- TPC-H long tail ---
        "q5_local_supplier_volume": rel.q5_local_supplier_volume,
        "q6_forecast_revenue": rel.q6_forecast_revenue,
        "q7_volume_shipping": rel.q7_volume_shipping,
        "q8_market_share": rel.q8_market_share,
        "q13_customer_distribution": rel.q13_customer_distribution,
        "q14_promo_revenue": rel.q14_promo_revenue,
        "q22_sales_opportunity": rel.q22_sales_opportunity,
        "q17_small_quantity_revenue": rel.q17_small_quantity_revenue,
        "q18_large_orders": rel.q18_large_orders,
        "q19_disjunctive_revenue": rel.q19_disjunctive_revenue,
        "q2_min_cost_supplier": rel.q2_min_cost_supplier,
        "q9_product_type_profit": rel.q9_product_type_profit,
        "q11_important_parts": rel.q11_important_parts,
        "q15_top_supplier": rel.q15_top_supplier,
        "q16_supplier_part_counts": rel.q16_supplier_part_counts,
        "q20_part_promotion": rel.q20_part_promotion,
        "q21_waiting_suppliers": rel.q21_waiting_suppliers,
        # --- relational operators (SQL-checked) ---
        "lang_whitelist_filter": rel.lang_whitelist_filter,
        "groupby_lang_counts": rel.groupby_lang_counts,
        "top_longest_docs": rel.top_longest_docs,
        "customers_per_nation": rel.customers_per_nation,
        "orders_priority_rollup": rel.orders_priority_rollup,
        "events_hourly": rel.events_hourly,
        "nations_per_region": rel.nations_per_region,
        "orders_customer_join": rel.orders_customer_join,
        "distinct_mktsegments": rel.distinct_mktsegments,
        "customers_without_orders": rel.customers_without_orders,
        "orders_count_per_customer": rel.orders_count_per_customer,
        "supplier_topk_acctbal": rel.supplier_topk_acctbal,
        "parts_by_brand": rel.parts_by_brand,
        "union_account_holders": rel.union_account_holders,
        "distinct_users_per_event_type": rel.distinct_users_per_event_type,
        "events_lag_deltas": rel.events_lag_deltas,
        "events_window_counts": rel.events_window_counts,
        "cumulative_order_value": rel.cumulative_order_value,
        "orders_rollup": rel.orders_rollup,
        "orders_cube": rel.orders_cube,
        "events_trailing_mean": rel.events_trailing_mean,
        "events_trailing_stats": rel.events_trailing_stats,
        "nation_balance_full_outer": rel.nation_balance_full_outer,
        "top_orders_per_customer": rel.top_orders_per_customer,
        "q4_priority_exists": rel.q4_priority_exists,
        "q12_priority_by_returnflag": rel.q12_priority_by_returnflag,
        "quantity_zscore_by_returnflag": rel.quantity_zscore_by_returnflag,
        "q10_returned_item_revenue": rel.q10_returned_item_revenue,
        "event_type_cooccurrence": rel.event_type_cooccurrence,
        # --- text analysis (SQL-checked) ---
        "token_counts": textops.token_counts,
        "bpe_token_counts": textops.bpe_token_counts,
        "quality_scores": textops.quality_scores,
        "sentence_stats": textops.sentence_stats,
        "readability_scores": textops.readability_scores,
        "stopword_stats": textops.stopword_stats,
        "train_test_split": textops.train_test_split,
        "stratified_sample": textops.stratified_sample,
        "mixed_corpus_sample": textops.mixed_corpus_sample,
        "source_mixture_plan": textops.source_mixture_plan,
        "training_shards_digest": textops.training_shards_digest,
        "md5_fingerprints": textops.md5_fingerprints,
        "normalized_text_fps": textops.normalized_text_fps,
        "rolling_fingerprints": textops.rolling_fingerprints,
        "langid_heuristic": textops.langid_heuristic,
        "lang_confusion_matrix": textops.lang_confusion_matrix,
        "dedup_group_size_histogram": textops.dedup_group_size_histogram,
        "compression_ratio_scores": textops.compression_ratio_scores,
        "embedding_benchmark_contamination": textops.embedding_benchmark_contamination,
        # --- data quality (all SQL-checked) ---
        "duplicate_span_stats": dq.duplicate_span_stats,
        "repetition_stats": dq.repetition_stats,
        "gopher_quality_filter": dq.gopher_quality_filter,
        "events_props_json": dq.events_props_json,
        "count_distinct_texts": dq.count_distinct_texts,
        "clean_corpus_ids": dq.clean_corpus_ids,
        "remove_duplicate_spans": dq.remove_duplicate_spans,
        "pages_domain_counts": dq.pages_domain_counts,
        "host_token_concentration": dq.host_token_concentration,
        "pages_domain_capped": dq.pages_domain_capped,
        "domain_reputation": dq.domain_reputation,
        "blocklist_filter": dq.blocklist_filter,
        "c4_line_filters": dq.c4_line_filters,
        "incremental_new_docs": dq.incremental_new_docs,
        "incremental_new_docs_neardup": dq.incremental_new_docs_neardup,
        "quality_filter_chain": dq.quality_filter_chain,
        "warclike_ingest_rows": _ingest.warclike_ingest_rows,
        "profile_lineitem": _prof.profile_table,
        "profile_lineitem_approx": _prof.profile_table_approx,
        "minhash_dedup_groups": textops.minhash_dedup_groups,
        "ngram_jaccard_near_dups": textops.ngram_jaccard_near_dups,
        "ngram_containment_near_dups": textops.ngram_containment_near_dups,
        "doc_chunks_overlap": textops.doc_chunks_overlap,
        "embedding_near_dups": textops.embedding_near_dups,
        "text_embedding_near_dups": textops.text_embedding_near_dups,
        # --- corpus statistics (all SQL-checked) ---
        "vocab_top_tokens": corpus_stats.vocab_top_tokens,
        "token_doc_frequency": corpus_stats.token_doc_frequency,
        "doc_length_histogram": corpus_stats.doc_length_histogram,
        "benchmark_contamination": corpus_stats.benchmark_contamination,
        "heavy_hitter_tokens": corpus_stats.heavy_hitter_tokens,
        "heavy_hitters_cms": corpus_stats.heavy_hitters_cms,
        "token_postings": corpus_stats.token_postings,
        "unigram_logprob_scores": corpus_stats.unigram_logprob_scores,
        "bigram_logprob_scores": corpus_stats.bigram_logprob_scores,
        "pmi_collocations": corpus_stats.pmi_collocations,
        "bm25_topk": corpus_stats.bm25_topk,
        "contamination_overlap_scores": corpus_stats.contamination_overlap_scores,
        "source_kl_divergence": corpus_stats.source_kl_divergence,
        "vocab_zipf_fit": corpus_stats.vocab_zipf_fit,
        "phrase_search": corpus_stats.phrase_search,
        "token_chunks": textops.token_chunks,
        "doc_length_percentiles": textops.doc_length_percentiles,
        "bpe_encode_docs": mlops.bpe_encode_docs,
        "unigram_train_vocab": mlops.unigram_train_vocab,
        "unigram_encode_docs": mlops.unigram_encode_docs,
        "tokenizer_fertility_by_lang": _tokenizer_fertility,
        # --- raw-output entries (rows-only: list/binary columns) ---
        "text_embeddings": textops.text_embeddings,
        "pages_image_features": textops.pages_image_features,
    }


def _stopword_sql() -> str:
    """Stopword-ratio oracle; the IN-list is built from the SAME Python
    list the engine uses (stages/text_stats.STOPWORDS) — one source of
    truth, no drift."""
    from png_from_pdf_extracter_ray.stages.text_stats import STOPWORDS

    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS BIGINT) AS n_stop,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS DOUBLE)
                         / len(toks) END AS stop_ratio
        FROM t
    """


def _gopher_sql() -> str:
    """Gopher-filter oracle; thresholds and the stopword IN-list come
    from the SAME constants the engine kernel uses
    (stages/text_stats.GOPHER_* / STOPWORDS) — one source of truth.
    The ratio thresholds compare the identical int64/int64 division the
    engine performs, so the keep flag matches bit-for-bit."""
    from png_from_pdf_extracter_ray.stages.text_stats import (
        GOPHER_MAX_MEAN_CHARS,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_CHARS,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        STOPWORDS,
    )

    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                             / len(toks) END AS mean_token_chars,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                                  AS DOUBLE) / len(toks) END AS alpha_frac,
                   CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS BIGINT) AS n_stop
            FROM t
        )
        SELECT doc_id, n_tokens, mean_token_chars, alpha_frac, n_stop,
               CAST(CASE WHEN n_tokens >= {GOPHER_MIN_TOKENS}
                          AND n_tokens <= {GOPHER_MAX_TOKENS}
                          AND mean_token_chars >= {GOPHER_MIN_MEAN_CHARS}
                          AND mean_token_chars <= {GOPHER_MAX_MEAN_CHARS}
                          AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
                          AND n_stop >= {GOPHER_MIN_STOPWORDS}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m
    """


def _langid_sql() -> str:
    """Language-ID oracle: per-language distinct-token ∩ marker-set
    counts, argmax with the engine's tie-break (lexicographically
    smallest language code; all-zero → 'und').  Marker sets come from
    the SAME tables the engine's LangId actor uses."""
    from png_from_pdf_extracter_ray.stages.text_stats import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    counts = ",\n                   ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in sorted(_LANG_MARKERS[lang]))}))) AS {lang}"
        for lang in langs
    )
    m = f"greatest({', '.join(langs)})"
    case = "\n                    ".join(
        f"WHEN {lang} = {m} THEN '{lang}'" for lang in langs
    )
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   {counts}
            FROM t
        )
        SELECT doc_id,
               CASE WHEN {m} = 0 THEN 'und'
                    {case}
                    ELSE 'und' END AS lang_pred
        FROM s
    """


def oracle_sql() -> dict[str, str]:
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        BENCHMARK_MOD as _BENCH_MOD,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        PMI_MIN_COUNT as _PMI_MIN,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        PMI_TOPK as _PMI_TOPK,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        HIST_BIN_CHARS as _HIST_BIN,
    )
    from png_from_pdf_extracter_ray.pipelines.summary import oracle_summary_path
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        DUP_SPAN_K as _DUP_SPAN_K,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        PII_EMAIL as _PII_EMAIL,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        PII_IP as _PII_IP,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        PII_PHONE as _PII_PHONE,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import _augmented_text_sql
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        DOMAIN_CAP as _DOMAIN_CAP,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        DOMAIN_RE as _DOMAIN_RE,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import (
        NGRAM_MAX_DF as _NGRAM_MAX_DF,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import (
        MIX_DEFAULT_WEIGHT as _MIX_DEFAULT,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import (
        MIX_WEIGHTS as _MIX_WEIGHTS,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import mix_threshold_hex as _mt
    from png_from_pdf_extracter_ray.pipelines.selection import (
        HASH_SPACE as _HASH_SPACE,
    )
    from png_from_pdf_extracter_ray.pipelines.selection import (
        TOKEN_BUDGET_PCT as _BUDGET_PCT,
    )
    from png_from_pdf_extracter_ray.pipelines.selection import (
        ZTARGET_MICROS as _ZTARGET,
    )
    from png_from_pdf_extracter_ray.pipelines.selection import (
        N_SHARDS as _N_SHARDS,
    )
    from png_from_pdf_extracter_ray.pipelines.selection import (
        SAMPLE_K as _SAMPLE_K,
    )
    from png_from_pdf_extracter_ray.pipelines.selection import (
        KEEP_PCT as _KEEP_PCT,
    )

    _mix_case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN '{_mt(rate)}'" for lang, rate in _MIX_WEIGHTS.items()
    ) + f" ELSE '{_mt(_MIX_DEFAULT)}' END"

    from png_from_pdf_extracter_ray.pipelines.textops import (
        SHARD_COUNT as _shard_count,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import (
        MIX_EPOCH_FP as _MIX_EPOCH_FP,
    )
    from png_from_pdf_extracter_ray.pipelines.textops import (
        MIX_MAX_EPOCHS as _MIX_MAX_EPOCHS,
    )

    from png_from_pdf_extracter_ray.pipelines.urlops import (
        POLITENESS_DELAY_US as _POLITENESS_US,
    )
    from png_from_pdf_extracter_ray.pipelines.urlops import (
        URL_TEMPLATE_NUM_RE as _URL_TPL_NUM,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        ZRATIO_MAX as _ZR_MAX,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        ZRATIO_MIN as _ZR_MIN,
    )

    from png_from_pdf_extracter_ray.pipelines.profiler import (
        PROFILE_COLUMNS as _PROF_COLS,
    )
    from png_from_pdf_extracter_ray.pipelines.profiler import (
        PROFILE_TABLE as _PROF_TABLE,
    )

    _profile_sql = " UNION ALL ".join(
        f"""SELECT '{c}' AS col, COUNT(*) AS n_rows,
            CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)
                 AS BIGINT) AS n_nulls,
            COUNT(DISTINCT {c}) AS n_distinct
            FROM {_PROF_TABLE}"""
        for c in _PROF_COLS
    )

    _pii_aug_sql = _augmented_text_sql()

    _STOPWORD_SQL = _stopword_sql()
    _GOPHER_SQL = _gopher_sql()

    # The flagship oracle is a parquet written by a SINGLE-PROCESS (no
    # Ray) run of the same deterministic kernel — synthesize → dedup →
    # extract → summarize, see pipelines/summary.py.  The queries()
    # callable (re)writes it; the driver compares at sf0.01 (tests
    # override via GRAFT_ORACLE_SF_DIR to match their sf fixture).
    from png_from_pdf_extracter_ray.pipelines.summary import (
        embeddings_digest_oracle_path,
        page_meta_oracle_path,
        pages_digest_oracle_path,
        per_doc_oracle_path,
        resized_digest_oracle_path,
        write_oracle_summary,
    )

    _oracle_sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    _flagship_oracle = oracle_summary_path(_oracle_sf, expand=2)
    _pages_oracle = pages_digest_oracle_path(_oracle_sf, expand=2)
    _docs_oracle = per_doc_oracle_path(_oracle_sf, expand=2)
    _meta_oracle = page_meta_oracle_path(_oracle_sf, expand=2)
    _resized_oracle = resized_digest_oracle_path(_oracle_sf, expand=2)
    _emb_oracle = embeddings_digest_oracle_path(_oracle_sf, expand=2)
    # Write the single-process oracle parquets NOW (pure Python, no Ray,
    # ~2 s once per sf; cached thereafter) so the SQL below works
    # regardless of whether the driver runs the SQL before or after the
    # corresponding queries() entry.
    try:
        write_oracle_summary(_oracle_sf, expand=2)
    except Exception as exc:  # noqa: BLE001
        # don't fail the whole oracle_sql() dict over one entry's file —
        # but say WHY the flagship SQL is about to 404 on read_parquet
        print(
            f"[__ray_entry__] flagship oracle parquet write failed: {exc!r}; "
            "extract_flagship_summary/pages_digest SQL will not find their files",
            file=sys.stderr,
        )

    # Single-process oracles for the deterministic sketch/LSH family —
    # these queries' outputs are batch-invariant sets, so a flat no-Ray
    # recompute (pipelines/rowsonly_oracles.py) pins them exactly; only
    # the batch-boundary-dependent sketches stay rows-only.
    from png_from_pdf_extracter_ray.pipelines import rowsonly_oracles as _rro
    from png_from_pdf_extracter_ray.pipelines.summary import (
        image_features_oracle_path,
    )

    _mh_pairs_oracle = _rro._oracle_path(_oracle_sf, "minhash_pairs")
    _mh_groups_oracle = _rro._oracle_path(_oracle_sf, "minhash_groups")
    _sh_pairs_oracle = _rro._oracle_path(_oracle_sf, "simhash_pairs")
    _rfp_oracle = _rro._oracle_path(_oracle_sf, "rolling_fp")
    _hll_oracle = _rro._oracle_path(_oracle_sf, "hll_users")
    _emb_lsh_oracle = _rro._oracle_path(_oracle_sf, "embedding_lsh_pairs")
    _txt_lsh_oracle = _rro._oracle_path(_oracle_sf, "text_embedding_lsh_pairs")
    _sim_lsh_oracle = _rro._oracle_path(_oracle_sf, "similarity_lsh_topk")
    _semded_oracle = _rro._oracle_path(_oracle_sf, "semantic_dedup")
    _ivf_oracle = _rro._oracle_path(_oracle_sf, "ivf_topk")
    _pack_oracle = _rro._oracle_path(_oracle_sf, "pack_bins")
    _keepbest_oracle = _rro._oracle_path(_oracle_sf, "minhash_keep_best")
    _phash_oracle = _rro._oracle_path(_oracle_sf, "pages_phash_pairs")
    _xdoc_oracle = _rro._oracle_path(_oracle_sf, "cross_doc_spans")
    _phash_groups_oracle = _rro._oracle_path(_oracle_sf, "pages_phash_groups")
    _jpegrt_oracle = _rro._oracle_path(_oracle_sf, "jpeg_roundtrip")
    _jpegprog_oracle = _rro._oracle_path(_oracle_sf, "jpeg_prog_roundtrip")
    _webprt_oracle = _rro._oracle_path(_oracle_sf, "webp_roundtrip")
    _vp8rt_oracle = _rro._oracle_path(_oracle_sf, "vp8_roundtrip")
    _kmeans_oracle = _rro._oracle_path(_oracle_sf, "kmeans_clusters")
    _kmeans_outlier_oracle = _rro._oracle_path(_oracle_sf, "kmeans_outliers")
    _sq8_oracle = _rro._oracle_path(_oracle_sf, "sq8_digest")
    _pq_oracle = _rro._oracle_path(_oracle_sf, "pq_topk")
    _ridge_oracle = _rro._oracle_path(_oracle_sf, "ridge_model")
    _bpe_oracle = _rro._oracle_path(_oracle_sf, "bpe_merges")
    _bpe_enc_oracle = _rro._oracle_path(_oracle_sf, "bpe_encode")
    _uni_vocab_oracle = _rro._oracle_path(_oracle_sf, "unigram_vocab")
    _uni_enc_oracle = _rro._oracle_path(_oracle_sf, "unigram_encode")
    _cms_oracle = _rro._oracle_path(_oracle_sf, "cms_heavy_hitters")
    _pca_oracle = _rro._oracle_path(_oracle_sf, "pca_projections")
    _ivfpq_oracle = _rro._oracle_path(_oracle_sf, "ivfpq_topk")
    _dsir_oracle = _rro._oracle_path(_oracle_sf, "dsir_weights")
    _lg_digest_oracle = _rro._oracle_path(_oracle_sf, "links_digest")
    _lg_hist_oracle = _rro._oracle_path(_oracle_sf, "link_outdeg_hist")
    _lg_pr_oracle = _rro._oracle_path(_oracle_sf, "link_pagerank")
    _lg_indeg_oracle = _rro._oracle_path(_oracle_sf, "link_indeg_topk")
    _lg_anchor_oracle = _rro._oracle_path(_oracle_sf, "anchor_terms")
    _lg_comp_oracle = _rro._oracle_path(_oracle_sf, "link_components")
    _lg_hits_oracle = _rro._oracle_path(_oracle_sf, "link_hits")
    _lg_frontier_oracle = _rro._oracle_path(_oracle_sf, "crawl_frontier")
    _pages_slim_oracle = _rro._oracle_path(_oracle_sf, "pages_slim")
    _domain_matrix_oracle = _rro._oracle_path(_oracle_sf, "domain_matrix")
    _link_edges_oracle = _rro._oracle_path(_oracle_sf, "link_edges")
    _messy_urls_oracle = _rro._oracle_path(_oracle_sf, "messy_urls")
    _extracted_text_oracle = _rro._oracle_path(_oracle_sf, "extracted_text")
    _title_index_oracle = _rro._oracle_path(_oracle_sf, "title_index")
    _pages_text_oracle = _rro._oracle_path(_oracle_sf, "pages_text")
    _span_rows_oracle = _rro._oracle_path(_oracle_sf, "span_rows")
    _host_pr_oracle = _rro._oracle_path(_oracle_sf, "host_pagerank")
    _host_edges_oracle = _rro._oracle_path(_oracle_sf, "host_edges")
    _zratio_oracle = _rro._oracle_path(_oracle_sf, "compression_ratio")
    _emb_contam_oracle = _rro._oracle_path(_oracle_sf, "embedding_contamination")
    _inc_nd_oracle = _rro._oracle_path(_oracle_sf, "incremental_neardup")
    _warc_oracle = _rro._oracle_path(_oracle_sf, "warclike_expected")
    _imgfeat_oracle = image_features_oracle_path(_oracle_sf, expand=2)
    try:
        _rro.write_minhash_oracles(_oracle_sf)
        _rro.write_simhash_oracle(_oracle_sf)
        _rro.write_rolling_fp_oracle(_oracle_sf)
        _rro.write_hll_oracle(_oracle_sf)
        _rro.write_embedding_lsh_oracle(_oracle_sf)
        _rro.write_text_embedding_lsh_oracle(_oracle_sf)
        _rro.write_similarity_lsh_oracle(_oracle_sf)
        _rro.write_semantic_dedup_oracle(_oracle_sf)
        _rro.write_ivf_topk_oracle(_oracle_sf)
        _rro.write_pack_bins_oracle(_oracle_sf)
        _rro.write_keep_best_oracle(_oracle_sf)
        _rro.write_pages_phash_oracle(_oracle_sf)
        _rro.write_pages_phash_groups_oracle(_oracle_sf)
        _rro.write_jpeg_roundtrip_oracle(_oracle_sf)
        _rro.write_jpeg_roundtrip_oracle(_oracle_sf, progressive=True)
        _rro.write_webp_roundtrip_oracle(_oracle_sf)
        _rro.write_vp8_roundtrip_oracle(_oracle_sf)
        _rro.write_cross_doc_spans_oracle(_oracle_sf)
        _rro.write_kmeans_oracle(_oracle_sf)
        _rro.write_kmeans_outlier_oracle(_oracle_sf)
        _rro.write_sq8_digest_oracle(_oracle_sf)
        _rro.write_pq_topk_oracle(_oracle_sf)
        _rro.write_ridge_oracle(_oracle_sf)
        _rro.write_bpe_oracle(_oracle_sf)
        _rro.write_bpe_encode_oracle(_oracle_sf)
        _rro.write_unigram_vocab_oracle(_oracle_sf)
        _rro.write_unigram_encode_oracle(_oracle_sf)
        _rro.write_cms_oracle(_oracle_sf)
        _rro.write_pca_oracle(_oracle_sf)
        _rro.write_ivfpq_topk_oracle(_oracle_sf)
        _rro.write_dsir_oracle(_oracle_sf)
        _rro.write_linkgraph_oracles(_oracle_sf)
        _rro.write_linkgraph_graph_oracles(_oracle_sf)
        _rro.write_crawl_frontier_oracle(_oracle_sf)
        _rro.write_pages_slim_oracle(_oracle_sf)
        _rro.write_link_edges_oracle(_oracle_sf)
        _rro.write_domain_matrix_oracle(_oracle_sf)
        _rro.write_messy_urls_oracle(_oracle_sf)
        _rro.write_extracted_text_oracle(_oracle_sf)
        _rro.write_title_index_oracle(_oracle_sf)
        _rro.write_pages_text_oracle(_oracle_sf)
        _rro.write_span_rows_oracle(_oracle_sf)
        _rro.write_host_pagerank_oracle(_oracle_sf)
        _rro.write_host_edges_oracle(_oracle_sf)
        _rro.write_compression_ratio_oracle(_oracle_sf)
        _rro.write_embedding_contamination_oracle(_oracle_sf)
        _rro.write_incremental_neardup_oracle(_oracle_sf)
        _rro.write_warclike_expected_oracle(_oracle_sf)
    except Exception as exc:  # noqa: BLE001
        print(
            f"[__ray_entry__] rows-only-upgrade oracle write failed: {exc!r}; "
            "the affected read_parquet oracles will not find their files",
            file=sys.stderr,
        )

    sql = {
        "extract_flagship_summary": f"""
            SELECT status, content_type, n_docs, xor_digest
            FROM read_parquet('{_flagship_oracle}')
        """,
        "pages_digest": f"""
            SELECT n_pages, total_png_bytes, xor_digest
            FROM read_parquet('{_pages_oracle}')
        """,
        "pages_resized_digest": f"""
            SELECT n_pages, total_png_bytes, xor_digest
            FROM read_parquet('{_resized_oracle}')
        """,
        "text_embeddings_digest": f"""
            SELECT n_docs, xor_digest
            FROM read_parquet('{_emb_oracle}')
        """,
        "extract_skew_routed_summary": f"""
            SELECT status, content_type, n_docs, xor_digest
            FROM read_parquet('{_flagship_oracle}')
        """,
        "extract_flagship_rows": f"""
            SELECT url, CAST(epoch_us(warc_ts) AS BIGINT) AS warc_us, lang,
                   content_type, status, error_type, n_payloads, n_pages,
                   n_spans, text_chars, content_hash
            FROM read_parquet('{_docs_oracle}')
        """,
        "pages_page_meta": f"""
            SELECT url, page_number, width, height, dpi, filename,
                   png_width, png_height, png_dpi, png_bytes
            FROM read_parquet('{_meta_oracle}')
        """,
        # per-url title/metadata index (the WAT-record analog): the
        # filter/length projection is declarative; the title itself is
        # the single-process extraction's, which the distributed run
        # must reproduce per url (multipart first-non-empty selection)
        "pages_title_index": f"""
            SELECT url, title, CAST(length(title) AS BIGINT) AS title_chars,
                   content_type
            FROM read_parquet('{_title_index_oracle}')
            WHERE status = 'completed' AND title <> ''
        """,
        "pages_frame_sample": f"""
            SELECT url, n_pages,
                   CAST((n_pages + 1) // 2 AS INTEGER) AS n_pages_sampled
            FROM read_parquet('{_docs_oracle}')
        """,
        # --- single-process oracles for the deterministic sketch/LSH
        # family (pipelines/rowsonly_oracles.py): the distributed
        # composition must reproduce the flat recompute exactly ---
        "minhash_near_dups": f"""
            SELECT id_a, id_b, jaccard FROM read_parquet('{_mh_pairs_oracle}')
        """,
        "minhash_dedup_groups": f"""
            SELECT url, group_id FROM read_parquet('{_mh_groups_oracle}')
        """,
        "dedup_group_size_histogram": f"""
            WITH s AS (
                SELECT group_id, COUNT(*) AS group_size
                FROM read_parquet('{_mh_groups_oracle}')
                GROUP BY group_id
            )
            SELECT group_size, COUNT(*) AS n_groups
            FROM s GROUP BY group_size
        """,
        "minhash_dedup_keep_best": f"""
            SELECT url, group_id, text_len, keep
            FROM read_parquet('{_keepbest_oracle}')
        """,
        "simhash_near_dups": f"""
            SELECT id_a, id_b, hamming FROM read_parquet('{_sh_pairs_oracle}')
        """,
        "pages_phash_near_dups": f"""
            SELECT id_a, id_b, hamming FROM read_parquet('{_phash_oracle}')
        """,
        "cross_doc_duplicate_spans": f"""
            SELECT doc_id, n_tokens, n_removed, text_clean
            FROM read_parquet('{_xdoc_oracle}')
        """,
        # --- C4-style paragraph dedup: the flat extraction parquet is
        # the INPUT (kernel necessarily shared); the split / winner /
        # reassembly logic is a REAL declarative DuckDB implementation
        # (generate_subscripts explode + row_number window) vs the
        # engine's two bucketed shuffles + left join ---
        "paragraph_dedup": f"""
            WITH d AS (
                SELECT url, extracted_text
                FROM read_parquet('{_extracted_text_oracle}')
                WHERE extracted_text <> ''
            ), e AS (
                SELECT url, generate_subscripts(l, 1) - 1 AS idx,
                       unnest(l) AS para
                FROM (SELECT url,
                             string_split(extracted_text,
                                          chr(10) || chr(10)) AS l
                      FROM d)
            ), ne AS (
                SELECT * FROM e WHERE para <> ''
            ), k AS (
                SELECT url, idx, para,
                       row_number() OVER (
                           PARTITION BY md5(para) ORDER BY url, idx
                       ) AS rn
                FROM ne
            )
            SELECT url,
                   COUNT(*) AS n_paras,
                   CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_kept,
                   COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
                                       chr(10) || chr(10) ORDER BY idx),
                            '') AS text_clean
            FROM k GROUP BY url
        """,
        "pages_phash_dedup_groups": f"""
            SELECT page_id, group_id FROM read_parquet('{_phash_groups_oracle}')
        """,
        # --- incremental-crawl snapshot windows: unlike the flat-twin
        # oracles above, the parquet here is the INPUT and the checked
        # logic is real DuckDB window functions vs the engine's bucketed
        # sort + adjacent-compare (pipelines/snapshots.py) ---
        "pages_snapshot_churn": f"""
            WITH s AS (
                SELECT url, warc_us, text_md5,
                       lag(text_md5) OVER (
                           PARTITION BY url ORDER BY warc_us, text_md5
                       ) AS prev
                FROM read_parquet('{_pages_slim_oracle}')
            )
            SELECT url, COUNT(*) AS n_snapshots,
                   CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL
                                          AND prev <> text_md5
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_changes,
                   MIN(warc_us) AS first_us, MAX(warc_us) AS last_us
            FROM s GROUP BY url
        """,
        # re-crawl cadence: REAL lag() window over the same slim parquet,
        # urls with >= 2 snapshots only; same (warc_us, text_md5) total
        # order as churn (pipelines/snapshots.py recrawl_intervals)
        "pages_recrawl_intervals": f"""
            WITH s AS (
                SELECT url, warc_us,
                       lag(warc_us) OVER (
                           PARTITION BY url ORDER BY warc_us, text_md5
                       ) AS prev
                FROM read_parquet('{_pages_slim_oracle}')
            ), g AS (
                SELECT url, warc_us - prev AS gap FROM s WHERE prev IS NOT NULL
            )
            SELECT url, COUNT(*) + 1 AS n_snapshots,
                   MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
                   ROUND(AVG(CAST(gap AS DOUBLE)), 6) AS mean_gap_us
            FROM g GROUP BY url
        """,
        # dedup provenance: loser url -> winning (min) url per shared
        # content fingerprint, urls distinct regardless of snapshot count
        "content_dedup_winner_map": f"""
            WITH d AS (
                SELECT DISTINCT url, text_md5
                FROM read_parquet('{_pages_slim_oracle}')
            ), w AS (
                SELECT text_md5, MIN(url) AS winner FROM d GROUP BY text_md5
            )
            SELECT d.url, w.winner AS winner_url
            FROM d JOIN w USING (text_md5) WHERE d.url <> w.winner
        """,
        # adaptive revisit policy (Cho & Garcia-Molina multiplicative):
        # all-integer arithmetic over the SAME lag window as churn —
        # avg_gap = (last-first)//gaps; fast-churn urls (changed on
        # >= half their re-crawls) get avg_gap//2, stable ones 2*avg_gap
        "adaptive_recrawl_schedule": f"""
            WITH s AS (
                SELECT url, warc_us, text_md5,
                       lag(text_md5) OVER (
                           PARTITION BY url ORDER BY warc_us, text_md5
                       ) AS prev
                FROM read_parquet('{_pages_slim_oracle}')
            ), c AS (
                SELECT url, COUNT(*) AS n_snapshots,
                       CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL
                                              AND prev <> text_md5
                                         THEN 1 ELSE 0 END), 0) AS BIGINT)
                           AS n_changes,
                       MIN(warc_us) AS first_us, MAX(warc_us) AS last_us
                FROM s GROUP BY url
            )
            SELECT url,
                   (last_us - first_us) // (n_snapshots - 1) AS avg_gap_us,
                   CASE WHEN 2 * n_changes >= n_snapshots - 1
                        THEN 1 ELSE 0 END AS fast_churn,
                   CASE WHEN 2 * n_changes >= n_snapshots - 1
                        THEN last_us
                             + ((last_us - first_us) // (n_snapshots - 1)) // 2
                        ELSE last_us
                             + ((last_us - first_us) // (n_snapshots - 1)) * 2
                   END AS next_due_us
            FROM c WHERE n_snapshots >= 2
        """,
        # per-host crawl-volume OLS slope from EXACT integer sufficient
        # statistics — the same closed form, in the same order, as the
        # engine (pipelines/snapshots.py host_crawl_trend): every sum is
        # exact, only the final division is float
        "host_crawl_trend": f"""
            WITH p AS (
                SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
                       warc_us // 86400000000 AS day
                FROM read_parquet('{_pages_slim_oracle}')
            ), d AS (
                SELECT host, day, COUNT(*) AS n FROM p GROUP BY host, day
            ), s AS (
                SELECT host, COUNT(*) AS n_days,
                       SUM(day) AS sx, SUM(n) AS sy,
                       SUM(day * n) AS sxy, SUM(day * day) AS sxx
                FROM d GROUP BY host
            )
            SELECT host, n_days,
                   ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE)
                         / CAST(n_days * sxx - sx * sx AS DOUBLE), 6) AS slope
            FROM s WHERE n_days >= 2
        """,
        # --- url-ops: the messy-urls parquet is the INPUT; the checked
        # logic is an INDEPENDENT DuckDB regexp/string-function
        # implementation of the 6-step canonicalization spec
        # (pipelines/urlops.py module docstring) vs the engine's
        # compiled-regex Python kernel ---
        "url_canonicalize": f"""
            WITH m AS (
                SELECT raw_url, warc_us,
                       regexp_extract(split_part(raw_url, '#', 1), '^[^?]*')
                           AS base,
                       regexp_replace(split_part(raw_url, '#', 1),
                                      '^[^?]*\\??', '') AS qs
                FROM read_parquet('{_messy_urls_oracle}')
            ), p AS (
                SELECT raw_url, warc_us, qs,
                       lower(regexp_extract(base,
                           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*')) AS auth,
                       substr(base, length(regexp_extract(base,
                           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*')) + 1) AS pth
                FROM m
            ), n AS (
                SELECT raw_url, warc_us, qs,
                       CASE WHEN auth LIKE 'https://%' AND auth LIKE '%:443'
                            THEN substr(auth, 1, length(auth) - 4)
                            WHEN auth LIKE 'http://%' AND auth LIKE '%:80'
                            THEN substr(auth, 1, length(auth) - 3)
                            ELSE auth END AS auth,
                       CASE WHEN pth IN ('', '/') THEN ''
                            WHEN pth LIKE '%/' THEN substr(pth, 1, length(pth) - 1)
                            ELSE pth END AS cpth
                FROM p
            ), q AS (
                SELECT raw_url, warc_us, auth, cpth,
                       COALESCE(array_to_string(list_sort(list_filter(
                           string_split(qs, '&'),
                           x -> x <> '' AND NOT regexp_matches(x,
                               '^(utm_[a-z0-9_]*|fbclid|gclid|ref)='))), '&'),
                           '') AS params
                FROM n
            )
            SELECT raw_url, warc_us,
                   auth || cpth ||
                   CASE WHEN params = '' THEN '' ELSE '?' || params END
                       AS canonical_url
            FROM q
        """,
        "canonical_url_dedup": f"""
            WITH m AS (
                SELECT raw_url, warc_us,
                       regexp_extract(split_part(raw_url, '#', 1), '^[^?]*')
                           AS base,
                       regexp_replace(split_part(raw_url, '#', 1),
                                      '^[^?]*\\??', '') AS qs
                FROM read_parquet('{_messy_urls_oracle}')
            ), p AS (
                SELECT raw_url, warc_us, qs,
                       lower(regexp_extract(base,
                           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*')) AS auth,
                       substr(base, length(regexp_extract(base,
                           '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/]*')) + 1) AS pth
                FROM m
            ), n AS (
                SELECT raw_url, warc_us, qs,
                       CASE WHEN auth LIKE 'https://%' AND auth LIKE '%:443'
                            THEN substr(auth, 1, length(auth) - 4)
                            WHEN auth LIKE 'http://%' AND auth LIKE '%:80'
                            THEN substr(auth, 1, length(auth) - 3)
                            ELSE auth END AS auth,
                       CASE WHEN pth IN ('', '/') THEN ''
                            WHEN pth LIKE '%/' THEN substr(pth, 1, length(pth) - 1)
                            ELSE pth END AS cpth
                FROM p
            ), q AS (
                SELECT raw_url, warc_us, auth, cpth,
                       COALESCE(array_to_string(list_sort(list_filter(
                           string_split(qs, '&'),
                           x -> x <> '' AND NOT regexp_matches(x,
                               '^(utm_[a-z0-9_]*|fbclid|gclid|ref)='))), '&'),
                           '') AS params
                FROM n
            ), c AS (
                SELECT raw_url, warc_us,
                       auth || cpth ||
                       CASE WHEN params = '' THEN '' ELSE '?' || params END
                           AS canonical_url
                FROM q
            )
            SELECT canonical_url,
                   COUNT(*) AS n_snapshots,
                   COUNT(DISTINCT raw_url) AS n_raw_forms,
                   MIN(warc_us) AS first_us,
                   MAX(warc_us) AS last_us
            FROM c GROUP BY canonical_url
        """,
        "pages_latest_snapshot": f"""
            SELECT url, warc_us, text_md5 FROM (
                SELECT url, warc_us, text_md5,
                       row_number() OVER (
                           PARTITION BY url
                           ORDER BY warc_us DESC, text_md5 DESC
                       ) AS rn
                FROM read_parquet('{_pages_slim_oracle}')
            ) WHERE rn = 1
        """,
        "profile_lineitem": _profile_sql,
        "warclike_ingest_rows": f"""
            SELECT url, warc_us, lang, payload_md5, payload_bytes
            FROM read_parquet('{_warc_oracle}')
        """,
        "quality_filter_chain": f"""
            WITH g AS ({{_GOPHER_FULL}}),
                 l AS ({{_LANGID_FULL}}),
                 z AS (
                SELECT doc_id, compression_ratio
                FROM read_parquet('{_zratio_oracle}')
            )
            SELECT g.doc_id, g.keep AS gopher_keep, z.compression_ratio,
                   l.lang_pred,
                   CAST(CASE WHEN g.keep = 1
                              AND z.compression_ratio >= {_ZR_MIN}
                              AND z.compression_ratio <= {_ZR_MAX}
                              AND l.lang_pred <> 'und'
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM g
            JOIN l ON g.doc_id = l.doc_id
            JOIN z ON g.doc_id = z.doc_id
        """.replace("{_GOPHER_FULL}", _GOPHER_SQL).replace(
            "{_LANGID_FULL}", _langid_sql()
        ),
        "incremental_new_docs_neardup": f"""
            SELECT url, warc_us FROM read_parquet('{_inc_nd_oracle}')
        """,
        "embedding_benchmark_contamination": f"""
            SELECT vec_id, bench_id, cos
            FROM read_parquet('{_emb_contam_oracle}')
        """,
        "compression_ratio_scores": f"""
            SELECT doc_id, n_bytes, n_compressed, compression_ratio
            FROM read_parquet('{_zratio_oracle}')
        """,
        # Budgeted selection: DuckDB recomputes the kept set with ONE
        # global window prefix-sum over (zdist, doc_id) — the opposite
        # architecture of the engine's histogram-refinement cut
        # (stages/selection.py).  zdist from the flat zlib recompute
        # parquet; the token weight from the declarative tokenizer.
        "token_budget_select": f"""
            WITH z AS (
                SELECT doc_id,
                       ABS(CASE WHEN n_bytes = 0 THEN 1000000
                                ELSE (n_compressed * 1000000) // n_bytes END
                           - {_ZTARGET}) AS zdist
                FROM read_parquet('{_zratio_oracle}')
            ), tok AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), j AS (
                SELECT z.doc_id, z.zdist, tok.n_tokens
                FROM z JOIN tok ON z.doc_id = tok.doc_id
            ), w AS (
                SELECT doc_id, zdist, n_tokens,
                       SUM(n_tokens) OVER (
                           ORDER BY zdist, doc_id ROWS UNBOUNDED PRECEDING
                       ) AS cum,
                       (SELECT (SUM(n_tokens) * {_BUDGET_PCT}) // 100 FROM j)
                           AS budget
                FROM j
            )
            SELECT doc_id, zdist, n_tokens FROM w
            WHERE cum - n_tokens < budget AND budget >= 1
        """,
        # Heaps-law curve: DuckDB recomputes token first-occurrence
        # declaratively (MIN(doc_id) GROUP BY token) and counts per
        # grid point; the engine used bucketed min-folds + searchsorted.
        "heaps_vocab_curve": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                           AS token
                FROM documents WHERE trim(text) <> ''
            ), first AS (
                SELECT token, MIN(doc_id) AS md FROM tok GROUP BY token
            )
            SELECT CAST(k.k AS BIGINT) AS k_docs,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size
            FROM first
            CROSS JOIN (VALUES (50), (100), (200), (500), (1000), (2000),
                               (5000)) AS k(k)
            WHERE first.md < k.k
              AND k.k <= (SELECT COUNT(*) FROM documents)
            GROUP BY k.k
        """,
        # JSONL roundtrip: the digest of what came BACK through the
        # write_json → read_json hop must equal the digest DuckDB
        # computes from the original parquet.
        "documents_jsonl_roundtrip": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(bit_xor(
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                           || ':' || COALESCE(text, '')), 1, 15)) AS BIGINT)
                   ) AS BIGINT) AS xor_digest,
                   CAST(SUM(length(COALESCE(text, ''))) AS BIGINT)
                       AS total_chars
            FROM documents
        """,
        # CSV roundtrip: identical digest contract — what came back
        # through the write_csv → read_csv hop vs the original parquet.
        "documents_csv_roundtrip": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(bit_xor(
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                           || ':' || COALESCE(text, '')), 1, 15)) AS BIGINT)
                   ) AS BIGINT) AS xor_digest,
                   CAST(SUM(length(COALESCE(text, ''))) AS BIGINT)
                       AS total_chars
            FROM documents
        """,
        # The whole curation pipeline as one funnel: filter chain →
        # per-lang rebalance (thresholds over SURVIVOR counts) → token
        # budget — DuckDB chains the gopher/langid CTEs, the flat zlib
        # parquet, the integer thresholds, and one global window.
        "curation_funnel": f"""
            WITH g AS ({{_GOPHER_FULL}}),
                 l AS ({{_LANGID_FULL}}),
                 zz AS (
                SELECT doc_id, compression_ratio, n_bytes, n_compressed
                FROM read_parquet('{_zratio_oracle}')
            ), chain AS (
                SELECT g.doc_id,
                       CAST(CASE WHEN g.keep = 1
                                  AND zz.compression_ratio >= {_ZR_MIN}
                                  AND zz.compression_ratio <= {_ZR_MAX}
                                  AND l.lang_pred <> 'und'
                             THEN 1 ELSE 0 END AS BIGINT) AS keep
                FROM g
                JOIN l ON g.doc_id = l.doc_id
                JOIN zz ON g.doc_id = zz.doc_id
            ), zd AS (
                SELECT doc_id,
                       ABS(CASE WHEN n_bytes = 0 THEN 1000000
                                ELSE (n_compressed * 1000000) // n_bytes END
                           - {_ZTARGET}) AS zdist
                FROM zz
            ), tok AS (
                SELECT doc_id, lang,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), q AS (
                SELECT t.doc_id, t.lang, t.n_tokens, zd.zdist
                FROM tok t
                JOIN chain c ON t.doc_id = c.doc_id
                JOIN zd ON t.doc_id = zd.doc_id
                WHERE c.keep = 1
            ), cnt AS (
                SELECT lang, COUNT(*) AS n FROM q GROUP BY lang
            ), m AS (SELECT MIN(n) AS mn FROM cnt),
            th AS (
                SELECT lang, ({_HASH_SPACE} * mn) // n AS thresh FROM cnt, m
            ), reb AS (
                SELECT q.* FROM q JOIN th ON q.lang = th.lang
                WHERE CAST(('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 6))
                           AS BIGINT) < th.thresh
            ), w AS (
                SELECT doc_id, n_tokens,
                       SUM(n_tokens) OVER (
                           ORDER BY zdist, doc_id ROWS UNBOUNDED PRECEDING
                       ) AS cum,
                       (SELECT (SUM(n_tokens) * {_BUDGET_PCT}) // 100 FROM reb)
                           AS budget
                FROM reb
            ), bud AS (
                SELECT doc_id, n_tokens FROM w
                WHERE cum - n_tokens < budget AND budget >= 1
            )
            SELECT 'all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens
            FROM tok
            UNION ALL
            SELECT 'quality', CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
            FROM q
            UNION ALL
            SELECT 'rebalanced', CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
            FROM reb
            UNION ALL
            SELECT 'budget', CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
            FROM bud
        """.replace("{_GOPHER_FULL}", _GOPHER_SQL).replace(
            "{_LANGID_FULL}", _langid_sql()
        ),
        # Exact-rate threshold calibration: keep the best keep_pct% of
        # docs by |ridge residual| micros; the engine calibrates the
        # threshold with one composite cut, DuckDB ranks the flat ridge
        # oracle with a window.
        "calibrated_quality_filter": f"""
            WITH r AS (
                SELECT doc_id,
                       CAST(abs(round(resid * 1000000, 0)) AS BIGINT) AS amicros
                FROM read_parquet('{_ridge_oracle}')
            ), w AS (
                SELECT doc_id, amicros,
                       ROW_NUMBER() OVER (ORDER BY amicros, doc_id) AS rn,
                       (SELECT COUNT(*) FROM r) AS n
                FROM r
            )
            SELECT doc_id, amicros FROM w
            WHERE rn <= GREATEST((n * {_KEEP_PCT}) // 100, 1)
        """,
        # Weight-balanced shard planner: the engine finds S-1 boundary
        # cuts (histogram refinement) and assigns by boundary
        # comparison; DuckDB evaluates the closed form from ONE global
        # window — any off-by-one in any boundary diverges on some row.
        "token_balanced_shards": f"""
            WITH tok AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) AS hkey,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), w AS (
                SELECT doc_id, n_tokens,
                       SUM(n_tokens) OVER (
                           ORDER BY hkey, doc_id ROWS UNBOUNDED PRECEDING
                       ) - n_tokens AS cum_excl,
                       (SELECT SUM(n_tokens) FROM tok) AS tot
                FROM tok
            )
            SELECT doc_id,
                   CAST(LEAST(({_N_SHARDS} * (cum_excl + 1) - 1) // tot,
                              {_N_SHARDS - 1}) AS BIGINT) AS shard_id
            FROM w
        """,
        # Exact-count deterministic sample: ROW_NUMBER over the
        # (md5, doc_id) order vs the engine's composite cut with
        # weight 1.
        "exact_count_sample": f"""
            WITH o AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (
                           ORDER BY CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                               doc_id
                       ) AS rn
                FROM documents
            )
            SELECT doc_id FROM o WHERE rn <= {_SAMPLE_K}
        """,
        # Unbounded-key token-weighted percentiles: DuckDB recomputes
        # each cut with a global window cumulative sum (the engine used
        # one histogram-refinement cut per percentile, no sort).
        "token_weighted_length_percentiles": """
            WITH tok AS (
                SELECT n_chars,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents
            ), by_len AS (
                SELECT n_chars, SUM(n_tokens) AS w FROM tok GROUP BY n_chars
            ), c AS (
                SELECT n_chars, SUM(w) OVER (ORDER BY n_chars) AS cum,
                       (SELECT SUM(n_tokens) FROM tok) AS tot
                FROM by_len
            )
            SELECT CAST(p.pct AS BIGINT) AS pct,
                   CAST(MIN(c.n_chars) AS BIGINT) AS n_chars_le
            FROM c CROSS JOIN (VALUES (25), (50), (75), (90)) AS p(pct)
            WHERE c.cum >= GREATEST((c.tot * p.pct) // 100, 1)
            GROUP BY p.pct
        """,
        # Per-language rebalancing: exact integer thresholds, the same
        # md5-prefix predicate evaluated declaratively (lang is the
        # corpus's skewed grouping; source is uniform by construction).
        "lang_balanced_sample": f"""
            WITH cnt AS (
                SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
            ), m AS (SELECT MIN(n) AS mn FROM cnt),
            th AS (
                SELECT lang, ({_HASH_SPACE} * mn) // n AS thresh FROM cnt, m
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN th USING (lang)
            WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))
                       AS BIGINT) < th.thresh
        """,
        # Triangle closure is orientation-invariant: DuckDB closes the
        # flat host-edge parquet with a triple self-join under plain
        # lexicographic orientation; the engine's degree-ordered wedge
        # join must produce the identical per-host counts.
        "host_triangle_counts": f"""
            WITH hp AS (
                SELECT DISTINCT least(src_host, dst_host) AS a,
                                greatest(src_host, dst_host) AS b
                FROM read_parquet('{_host_edges_oracle}')
                WHERE src_host <> dst_host
            ), t AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM hp e1
                JOIN hp e2 ON e2.a = e1.b
                JOIN hp e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM (
                SELECT x AS host FROM t
                UNION ALL SELECT y AS host FROM t
                UNION ALL SELECT z AS host FROM t
            )
            GROUP BY host
        """,
        # Local clustering coefficient: triangle closure + degree fold,
        # both declarative over the flat host-edges parquet; exact
        # integer micros on both sides.
        "host_clustering_coeff": f"""
            WITH hp AS (
                SELECT DISTINCT least(src_host, dst_host) AS a,
                                greatest(src_host, dst_host) AS b
                FROM read_parquet('{_host_edges_oracle}')
                WHERE src_host <> dst_host
            ), t AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM hp e1
                JOIN hp e2 ON e2.a = e1.b
                JOIN hp e3 ON e3.a = e1.a AND e3.b = e2.b
            ), tc AS (
                SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM (
                    SELECT x AS host FROM t
                    UNION ALL SELECT y AS host FROM t
                    UNION ALL SELECT z AS host FROM t
                )
                GROUP BY host
            ), deg AS (
                SELECT host, CAST(COUNT(*) AS BIGINT) AS degree
                FROM (
                    SELECT a AS host FROM hp UNION ALL SELECT b AS host FROM hp
                )
                GROUP BY host
            )
            SELECT tc.host, deg.degree, tc.n_triangles,
                   (2 * tc.n_triangles * 1000000)
                       // (deg.degree * (deg.degree - 1)) AS cc_micros
            FROM tc JOIN deg ON tc.host = deg.host
        """,
        "host_pagerank": f"""
            SELECT host, rank_micros FROM read_parquet('{_host_pr_oracle}')
        """,
        "crawl_novelty_by_day": f"""
            WITH snap AS (
                SELECT warc_us // 86400000000 AS day,
                       COUNT(*) AS n_snapshots
                FROM read_parquet('{_pages_slim_oracle}')
                GROUP BY 1
            ), f AS (
                SELECT text_md5, MIN(warc_us) // 86400000000 AS day
                FROM read_parquet('{_pages_slim_oracle}')
                GROUP BY text_md5
            ), new AS (
                SELECT day, COUNT(*) AS n_new FROM f GROUP BY day
            )
            SELECT snap.day, snap.n_snapshots,
                   CAST(COALESCE(new.n_new, 0) AS BIGINT)
                       AS n_new_fingerprints
            FROM snap LEFT JOIN new ON snap.day = new.day
        """,
        # span-struct surface: REAL declarative aggregation over the
        # flat single-process span rows vs the engine's Arrow explode +
        # bucketed partial fold
        "span_tag_path_stats": f"""
            SELECT path, kind,
                   COUNT(*) AS n_spans,
                   CAST(SUM("end" - "start") AS BIGINT) AS total_chars,
                   COUNT(DISTINCT url) AS n_docs
            FROM read_parquet('{_span_rows_oracle}')
            GROUP BY path, kind
        """,
        "crawl_politeness_schedule": f"""
            WITH l AS (
                SELECT url, MAX(warc_us) AS last_us
                FROM read_parquet('{_pages_slim_oracle}')
                GROUP BY url
            ), h AS (
                SELECT url, last_us,
                       regexp_extract(url, '{_DOMAIN_RE}', 1) AS host
                FROM l
            )
            SELECT url, host,
                   CAST(row_number() OVER (
                       PARTITION BY host ORDER BY last_us, url
                   ) - 1 AS BIGINT) AS slot,
                   CAST((row_number() OVER (
                       PARTITION BY host ORDER BY last_us, url
                   ) - 1) * {_POLITENESS_US} AS BIGINT) AS sched_offset_us
            FROM h
        """,
        # host-grouped split: test iff md5(host) first hex char in (0,1)
        # — the unit of assignment is the host, so no host straddles the
        # split (pipelines/urlops.host_grouped_split)
        "host_grouped_split": f"""
            WITH u AS (
                SELECT DISTINCT url FROM read_parquet('{_pages_slim_oracle}')
            ), h AS (
                SELECT url, regexp_extract(url, '{_DOMAIN_RE}', 1) AS host
                FROM u
            )
            SELECT url, host,
                   CASE WHEN substr(md5(host), 1, 1) IN ('0', '1')
                        THEN 'test' ELSE 'train' END AS split
            FROM h
        """,
        # digit runs in the PATH collapse to 'N'; counts over distinct urls
        "url_path_templates": f"""
            WITH u AS (
                SELECT DISTINCT url FROM read_parquet('{_pages_slim_oracle}')
            ), t AS (
                SELECT regexp_replace(
                           regexp_replace(url, '^https?://[^/]*', ''),
                           '{_URL_TPL_NUM}', 'N', 'g') AS template,
                       regexp_extract(url, '{_DOMAIN_RE}', 1) AS host
                FROM u
            )
            SELECT template, COUNT(*) AS n_urls,
                   COUNT(DISTINCT host) AS n_hosts
            FROM t GROUP BY template
        """,
        "pages_snapshot_drift": f"""
            WITH s AS (
                SELECT url, warc_us, text,
                       lag(warc_us) OVER w AS prev_us,
                       lag(text) OVER w AS prev_text
                FROM read_parquet('{_pages_text_oracle}')
                WINDOW w AS (PARTITION BY url ORDER BY warc_us, text)
            ), p AS (
                SELECT url, prev_us, warc_us,
                       CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                            ELSE list_distinct(regexp_split_to_array(
                                trim(lower(text)), '\\s+')) END AS tb,
                       CASE WHEN trim(lower(prev_text)) = '' THEN []::VARCHAR[]
                            ELSE list_distinct(regexp_split_to_array(
                                trim(lower(prev_text)), '\\s+')) END AS ta
                FROM s WHERE prev_us IS NOT NULL
            )
            SELECT url, prev_us, warc_us,
                   CASE WHEN len(list_distinct(list_concat(ta, tb))) = 0
                        THEN 1.0
                        ELSE len(list_intersect(ta, tb))
                             / len(list_distinct(list_concat(ta, tb)))
                        END AS jaccard
            FROM p
        """,
        "pages_jpeg_roundtrip": f"""
            SELECT page_id, jpeg_bytes, dec_md5, mae
            FROM read_parquet('{_jpegrt_oracle}')
        """,
        "pages_jpeg_progressive_roundtrip": f"""
            SELECT page_id, jpeg_bytes, dec_md5, mae
            FROM read_parquet('{_jpegprog_oracle}')
        """,
        "pages_webp_roundtrip": f"""
            SELECT page_id, webp_bytes, dec_md5, lossless_ok
            FROM read_parquet('{_webprt_oracle}')
        """,
        "pages_vp8_roundtrip": f"""
            SELECT page_id, vp8_bytes, dec_md5, mae
            FROM read_parquet('{_vp8rt_oracle}')
        """,
        "rolling_fingerprints": f"""
            SELECT doc_id, rolling_fp FROM read_parquet('{_rfp_oracle}')
        """,
        "distinct_users_per_event_type_hll": f"""
            SELECT event_type, n_distinct_est FROM read_parquet('{_hll_oracle}')
        """,
        "embedding_near_dups_lsh": f"""
            SELECT id_a, id_b, cos FROM read_parquet('{_emb_lsh_oracle}')
        """,
        "text_embedding_near_dups": f"""
            SELECT id_a, id_b, cos FROM read_parquet('{_txt_lsh_oracle}')
        """,
        "similarity_topk_lsh": f"""
            SELECT vec_id, cos FROM read_parquet('{_sim_lsh_oracle}')
        """,
        "semantic_dedup": f"""
            SELECT vec_id, cluster, keep, dup_of
            FROM read_parquet('{_semded_oracle}')
        """,
        "similarity_topk_ivf": f"""
            SELECT vec_id, cos FROM read_parquet('{_ivf_oracle}')
        """,
        "similarity_topk_pq": f"""
            SELECT vec_id, score FROM read_parquet('{_pq_oracle}')
        """,
        "embedding_outlier_scores": f"""
            SELECT vec_id, cluster, sim_q
            FROM read_parquet('{_kmeans_outlier_oracle}')
        """,
        "embedding_sq8_digest": f"""
            SELECT vec_id, q_md5 FROM read_parquet('{_sq8_oracle}')
        """,
        "kmeans_doc_clusters": f"""
            SELECT vec_id, cluster FROM read_parquet('{_kmeans_oracle}')
        """,
        "ridge_quality_model": f"""
            SELECT doc_id, n_chars, y_hat, resid FROM read_parquet('{_ridge_oracle}')
        """,
        "bpe_train_merges": f"""
            SELECT merge_rank, left_sym, right_sym, freq
            FROM read_parquet('{_bpe_oracle}')
        """,
        "bpe_encode_docs": f"""
            SELECT doc_id, n_words, n_bpe_tokens, bpe_ratio
            FROM read_parquet('{_bpe_enc_oracle}')
        """,
        "unigram_train_vocab": f"""
            SELECT piece_rank, piece, n_uses, logprob
            FROM read_parquet('{_uni_vocab_oracle}')
        """,
        "unigram_encode_docs": f"""
            SELECT doc_id, n_words, n_pieces, uni_ratio, uni_logprob
            FROM read_parquet('{_uni_enc_oracle}')
        """,
        "tokenizer_fertility_by_lang": f"""
            SELECT d.lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(e.n_words) AS BIGINT) AS n_words,
                   CAST(SUM(e.n_pieces) AS BIGINT) AS n_pieces,
                   CASE WHEN SUM(e.n_words) > 0
                        THEN CAST(SUM(e.n_pieces) AS DOUBLE)
                             / CAST(SUM(e.n_words) AS DOUBLE)
                        ELSE 0.0 END AS fertility
            FROM read_parquet('{_uni_enc_oracle}') e
            JOIN documents d ON e.doc_id = d.doc_id
            GROUP BY d.lang
        """,
        "heavy_hitters_cms": f"""
            SELECT token, n_true, n_est FROM read_parquet('{_cms_oracle}')
        """,
        "pca_doc_projections": f"""
            SELECT vec_id, pc0, pc1, pc2, pc3 FROM read_parquet('{_pca_oracle}')
        """,
        "similarity_topk_ivfpq": f"""
            SELECT vec_id, score FROM read_parquet('{_ivfpq_oracle}')
        """,
        "dsir_importance_weights": f"""
            SELECT doc_id, n_tokens, dsir_logratio, keep
            FROM read_parquet('{_dsir_oracle}')
        """,
        "page_links_digest": f"""
            SELECT n_links, n_internal, n_doc_links, xor_digest
            FROM read_parquet('{_lg_digest_oracle}')
        """,
        "linkgraph_pagerank": f"""
            SELECT node, rank_micros FROM read_parquet('{_lg_pr_oracle}')
        """,
        # search-index head: REAL declarative join of the two flat
        # oracle parquets — title filter + url→node regex (the kernel's
        # ^/doc/(d+)-(d+)$ contract) + rank join + windowless top-k
        "search_index_topk": f"""
            WITH t AS (
                SELECT url, title,
                       CAST(NULLIF(regexp_extract(url,
                           '^https?://[^/]+/doc/([0-9]+)-[0-9]+$', 1), '')
                           AS BIGINT) AS node
                FROM read_parquet('{_title_index_oracle}')
                WHERE status = 'completed' AND title <> ''
            )
            SELECT t.url, t.title, r.rank_micros
            FROM t JOIN read_parquet('{_lg_pr_oracle}') r ON t.node = r.node
            ORDER BY r.rank_micros DESC, t.url LIMIT 100
        """,
        "link_out_degree_hist": f"""
            SELECT out_degree, n_pages FROM read_parquet('{_lg_hist_oracle}')
        """,
        "link_in_degree_topk": f"""
            SELECT dst_doc, n_inlinks FROM read_parquet('{_lg_indeg_oracle}')
        """,
        "anchor_text_top_terms": f"""
            SELECT term, n FROM read_parquet('{_lg_anchor_oracle}')
        """,
        "linkgraph_components": f"""
            SELECT node, component FROM read_parquet('{_lg_comp_oracle}')
        """,
        "linkgraph_hits": f"""
            SELECT node, hub, auth FROM read_parquet('{_lg_hits_oracle}')
        """,
        "crawl_frontier_urls": f"""
            SELECT href, n_refs FROM read_parquet('{_lg_frontier_oracle}')
        """,
        "domain_link_matrix": f"""
            SELECT src_domain, dst_domain, n_links
            FROM read_parquet('{_domain_matrix_oracle}')
        """,
        "q13_customer_distribution": """
            SELECT c_count, COUNT(*) AS custdist FROM (
                SELECT c_custkey, COUNT(o_custkey) AS c_count
                FROM customer LEFT JOIN (
                    SELECT o_custkey FROM orders
                    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                ) o ON c_custkey = o_custkey
                GROUP BY c_custkey
            ) t
            GROUP BY c_count
        """,
        "q22_sales_opportunity": """
            WITH avg_bal AS (
                SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS q,
                       COUNT(*) AS n
                FROM customer WHERE c_acctbal > 0
            )
            SELECT c_mktsegment,
                   COUNT(*) AS numcust,
                   ROUND(SUM(c_acctbal), 2) AS totacctbal
            FROM customer, avg_bal
            WHERE c_acctbal > (CAST(q AS DOUBLE) / n) / 100.0
              AND c_custkey NOT IN (
                  SELECT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1998-06-01'
              )
            GROUP BY c_mktsegment
        """,
        "context_pack_bins": f"""
            SELECT doc_id, shard, bin_id, n_tokens
            FROM read_parquet('{_pack_oracle}')
        """,
        "pages_image_features_summary": f"""
            SELECT url, page_number, image_ok, image_error, img_width,
                   img_height, img_mean, img_std, feat_md5
            FROM read_parquet('{_imgfeat_oracle}')
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
                   COUNT(*)                                                         AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "lang_whitelist_filter": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE regexp_matches(lang, '^(?:en|de)')
        """,
        "groupby_lang_counts": """
            SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "dedup_exact_text": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "top_longest_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 100
        """,
        "customers_per_nation": """
            SELECT n_name, ROUND(SUM(c_acctbal), 2) AS sum_acctbal, COUNT(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "orders_priority_rollup": """
            SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "events_hourly": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   ROUND(SUM(value), 2) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "nations_per_region": """
            SELECT r_name, COUNT(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        # trailing RANGE-window aggregate (per-user composite-key
        # double-searchsorted + per-user prefix sums in the engine)
        "events_trailing_mean": """
            SELECT event_id,
                   ROUND(AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
                   ), 6) AS trailing_mean
            FROM events
        """,
        # windowed second moment: STDDEV_POP over the identical RANGE
        # frame; the engine computes it from per-user prefix sums of v
        # and v^2 — numerically within round-6 of the oracle's
        # per-partition accumulation
        "events_trailing_stats": """
            SELECT event_id,
                   ROUND(AVG(value) OVER w, 6) AS trailing_mean,
                   ROUND(COALESCE(STDDEV_POP(value) OVER w, 0.0), 6)
                       AS trailing_std
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
            )
        """,
        # exact global window without a global sort (bounded-cardinality
        # histogram + broadcast CDF in the engine)
        "doc_length_percentiles": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
                FROM documents
            )
            SELECT doc_id, n_tokens,
                   ROUND(PERCENT_RANK() OVER (ORDER BY n_tokens), 6) AS pct_rank
            FROM t
        """,
        "bpe_token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                       AS n_bpe_tokens
            FROM documents
        """,
        "quality_scores": """
            SELECT doc_id,
                   length(text) AS text_len,
                   length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE ROUND(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                                   / length(text), 4) END AS punct_ratio
            FROM documents
        """,
        # sentence segmentation: segments of trim(text) split on [.!?]+
        # (RE2∩Python, no lookbehind), post-trim non-empty; blank or
        # punctuation-only docs emit nothing on both sides
        "sentence_stats": """
            WITH segs AS (
                SELECT doc_id,
                       trim(unnest(regexp_split_to_array(
                           trim(text), '[.!?]+'))) AS seg
                FROM documents WHERE trim(text) <> ''
            ), keep AS (
                SELECT doc_id,
                       len(regexp_split_to_array(seg, '\\s+')) AS nt
                FROM segs WHERE seg <> ''
            )
            SELECT doc_id, COUNT(*) AS n_sentences,
                   ROUND(AVG(CAST(nt AS DOUBLE)), 6) AS mean_sentence_tokens
            FROM keep GROUP BY doc_id
        """,
        # Flesch-style readability: same sentence/token conventions as
        # sentence_stats plus the [aeiou]+ vowel-group syllable proxy;
        # identical float composition (divide, then the two multiplies)
        "readability_scores": """
            WITH base AS (
                SELECT doc_id, trim(text) AS tx
                FROM documents WHERE trim(text) <> ''
            ), w AS (
                SELECT doc_id,
                       len(regexp_split_to_array(tx, '\s+')) AS n_words,
                       len(regexp_extract_all(lower(tx), '[aeiou]+'))
                           AS n_vowel_groups
                FROM base
            ), segs AS (
                SELECT doc_id,
                       trim(unnest(regexp_split_to_array(tx, '[.!?]+'))) AS seg
                FROM base
            ), sc AS (
                SELECT doc_id, COUNT(*) AS n_sentences
                FROM segs WHERE seg <> '' GROUP BY doc_id
            )
            SELECT w.doc_id, w.n_words, sc.n_sentences, w.n_vowel_groups,
                   ROUND(206.835
                         - 1.015 * (CAST(w.n_words AS DOUBLE) / sc.n_sentences)
                         - 84.6 * (CAST(w.n_vowel_groups AS DOUBLE) / w.n_words),
                         6) AS flesch
            FROM w JOIN sc USING (doc_id)
            WHERE w.n_words > 0
        """,
        "md5_fingerprints": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        # normalization chain order (ws-collapse → control-strip → trim
        # → lower) and the EXPLICIT whitespace class mirror
        # stages/text_stats.normalize_text_batch exactly (Python \s and
        # RE2 \s disagree on \x0b, so neither side uses \s here)
        "normalized_text_fps": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(
                       regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'),
                       '[\\x00-\\x1f\\x7f]', '', 'g')))) AS norm_fp
            FROM documents
        """,
        "orders_rollup": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority, o_orderstatus
        """,
        "orders_cube": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY CUBE(o_orderpriority, o_orderstatus)
        """,
        "stopword_stats": _STOPWORD_SQL,
        "gopher_quality_filter": _GOPHER_SQL,
        "langid_heuristic": _langid_sql(),
        "lang_confusion_matrix": f"""
            WITH pred AS ({_langid_sql()})
            SELECT d.lang, p.lang_pred, COUNT(*) AS n_docs
            FROM pred p JOIN documents d ON p.doc_id = d.doc_id
            GROUP BY d.lang, p.lang_pred
        """,
        "vocab_top_tokens": """
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
                FROM documents WHERE trim(text) <> ''
            )
            SELECT token, COUNT(*) AS n FROM toks
            GROUP BY token ORDER BY n DESC, token LIMIT 100
        """,
        "token_doc_frequency": """
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
                FROM documents WHERE trim(text) <> ''
            )
            SELECT token, COUNT(*) AS df FROM toks
            GROUP BY token HAVING COUNT(*) >= 20
            ORDER BY df DESC, token
        """,
        "doc_length_histogram": f"""
            SELECT n_chars // {_HIST_BIN} AS bin, COUNT(*) AS n_docs
            FROM documents GROUP BY bin ORDER BY bin
        """,
        # benchmark set = doc_id % MOD == 0 (mirrors corpus_stats.BENCHMARK_MOD);
        # shingle definition identical to the n-gram Jaccard oracle
        "benchmark_contamination": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
                       unnest(range(len(regexp_split_to_array(trim(lower(text)), '\\s+')))) AS pos
                FROM documents WHERE trim(text) <> ''
            ),
            sh AS (
                SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
            ),
            bench AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0
            )
            SELECT s.doc_id, COUNT(*) AS n_contam
            FROM sh s JOIN bench USING (shingle)
            WHERE s.doc_id % {_BENCH_MOD} <> 0
            GROUP BY s.doc_id ORDER BY s.doc_id
        """,
        # Deterministic shard export: the SQL re-derives shard assignment
        # AND within-shard positions declaratively (row_number window) —
        # the engine's hash shuffle + per-shard sort must agree on the
        # position-packed XOR digest (textops.training_shards_digest).
        "training_shards_digest": f"""
            WITH d AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) % {_shard_count} AS shard_id,
                       CAST(('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) AS oh,
                       CAST(('0x' || substr(md5(COALESCE(text, '')), 1, 15))
                            AS BIGINT) % 1099511627776 AS ch
                FROM documents
            ),
            p AS (
                SELECT shard_id, ch,
                       row_number() OVER (
                           PARTITION BY shard_id ORDER BY oh, doc_id
                       ) - 1 AS pos
                FROM d
            )
            SELECT shard_id, COUNT(*) AS n_docs,
                   bit_xor((pos % 1048576) * 1099511627776 + ch) AS order_digest
            FROM p GROUP BY shard_id
        """,
        "train_test_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        """,
        "mixed_corpus_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_mix_case}
        """,
        # equal-share epoch plan: token-count convention shared with
        # token_counts; fixed point (2^20) + 4-epoch cap from the module
        # constants (textops.MIX_EPOCH_FP / MIX_MAX_EPOCHS)
        "source_mixture_plan": f"""
            WITH s AS (
                SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(trim(text),
                                                               '\\s+'))
                                END) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
            ), t AS (
                SELECT CAST(SUM(n_tokens) AS BIGINT) // COUNT(*) AS share
                FROM s
            ), e AS (
                SELECT source, n_docs, n_tokens,
                       CAST(CASE WHEN n_tokens = 0 THEN 0
                            ELSE LEAST((t.share * {_MIX_EPOCH_FP})
                                           // n_tokens,
                                       {_MIX_MAX_EPOCHS} * {_MIX_EPOCH_FP})
                            END AS BIGINT) AS epochs_fp
                FROM s CROSS JOIN t
            )
            SELECT source, n_docs, n_tokens, epochs_fp,
                   CAST((n_tokens * epochs_fp) // {_MIX_EPOCH_FP} AS BIGINT)
                       AS planned_tokens
            FROM e
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 20
        """,
        "orders_customer_join": """
            SELECT c_mktsegment, o_orderstatus,
                   ROUND(SUM(o_totalprice), 2) AS sum_totalprice,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment, o_orderstatus
        """,
        "distinct_mktsegments": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-06-01'
            )
        """,
        "orders_count_per_customer": """
            SELECT c_custkey, CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders
            FROM customer
            LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
            ON c_custkey = o_custkey
        """,
        "supplier_topk_acctbal": """
            SELECT s_suppkey, s_name, s_acctbal FROM supplier
            ORDER BY s_acctbal DESC, s_suppkey LIMIT 50
        """,
        "parts_by_brand": """
            SELECT p_brand, ROUND(SUM(p_retailprice), 2) AS sum_retail,
                   CAST(SUM(p_size) AS BIGINT) AS sum_size, COUNT(*) AS n_parts
            FROM part GROUP BY p_brand
        """,
        "union_account_holders": """
            SELECT c_name AS name, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate  > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "events_asof_last_purchase": """
            SELECT e.event_id,
                   coalesce(strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f'), '') AS prev_purchase
            FROM events e
            ASOF LEFT JOIN (
                SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ) p ON e.user_id = p.user_id AND e.ts > p.ts
        """,
        "events_sliding_window": """
            WITH w AS (
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS window_start
                FROM events
                UNION ALL
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800 AS window_start
                FROM events
            )
            SELECT event_type, window_start,
                   ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n_events
            FROM w GROUP BY event_type, window_start
        """,
        "quantity_quantiles_by_returnflag": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                   ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "distinct_users_per_event_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        # LAG window: seconds since the user's previous event (-1 for
        # the first); microsecond-exact on both sides
        "events_lag_deltas": """
            SELECT event_id,
                   ROUND(COALESCE(
                       date_diff('microsecond',
                                 LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id),
                                 ts) / 1000000.0, -1.0), 6) AS delta_s
            FROM events
            ORDER BY event_id
        """,
        # interval (range) self-join: same-user events in [ts-600s, ts)
        "events_window_counts": """
            SELECT a.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_prior
            FROM events a LEFT JOIN events b
              ON a.user_id = b.user_id
             AND b.ts < a.ts
             AND b.ts >= a.ts - INTERVAL 600 SECOND
            GROUP BY a.event_id
            ORDER BY a.event_id
        """,
        "events_sessionize": """
            WITH d AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT user_id, ts,
                       CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
                FROM d
            )
            SELECT user_id, session_no, COUNT(*) AS n_events,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
            FROM s GROUP BY user_id, session_no
        """,
        "cumulative_order_value": """
            SELECT o_orderkey, o_custkey,
                   ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING), 2) AS cum_totalprice
            FROM orders WHERE o_custkey <= 200
        """,
        # the df cap (shingles in > N docs dropped from the universe —
        # intersections AND sizes) mirrors textops.NGRAM_MAX_DF exactly
        "ngram_jaccard_near_dups": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
                       unnest(range(len(regexp_split_to_array(trim(lower(text)), '\\s+')))) AS pos
                FROM documents WHERE trim(text) <> ''
            ),
            sh0 AS (
                SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
            ),
            keep AS (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING COUNT(*) <= {_NGRAM_MAX_DF}
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
        """,
        # same capped shingle universe as ngram_jaccard_near_dups; only
        # the score differs (i / LEAST(|A|, |B|) — doc-in-doc detector)
        "ngram_containment_near_dups": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
                       unnest(range(len(regexp_split_to_array(trim(lower(text)), '\\s+')))) AS pos
                FROM documents WHERE trim(text) <> ''
            ),
            sh0 AS (
                SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
            ),
            keep AS (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING COUNT(*) <= {_NGRAM_MAX_DF}
            ),
            sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
                FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / LEAST(sa.n, sb.n), 4) AS containment
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.5
        """,
        # boundaries: chunk i covers [i*48, min(i*48+64, n)); i*48 < n
        # ⟺ i < ceil(n/48); md5 over the 1-based inclusive token slice
        "doc_chunks_overlap": """
            WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                FROM documents WHERE trim(text) <> ''
            ),
            base AS (SELECT doc_id, toks, len(toks) AS n FROM t),
            c AS (
                SELECT doc_id, toks, n, CAST(i AS BIGINT) AS chunk_idx,
                       CAST(i AS BIGINT) * 48 AS start_tok,
                       LEAST(CAST(i AS BIGINT) * 48 + 64, n) AS end_tok
                FROM base
                CROSS JOIN unnest(range(CAST(ceil(n / 48.0) AS BIGINT))) AS u(i)
            )
            SELECT doc_id, chunk_idx, start_tok, end_tok,
                   end_tok - start_tok AS n_tokens,
                   md5(array_to_string(
                       toks[CAST(start_tok + 1 AS BIGINT):CAST(end_tok AS BIGINT)],
                       ' ')) AS chunk_md5
            FROM c
        """,
        # span universe, df count, and zero-fill mirror
        # pipelines/data_quality.duplicate_span_stats (K shared via
        # DUP_SPAN_K; the engine compares span hashes, the oracle span
        # text — 64-bit collision odds are negligible at check scale)
        "duplicate_span_stats": f"""
            WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                FROM documents WHERE trim(text) <> ''
            ),
            spans AS (
                SELECT DISTINCT doc_id,
                       array_to_string(toks[CAST(i AS BIGINT)+1:CAST(i AS BIGINT)+{_DUP_SPAN_K}], ' ') AS span
                FROM t CROSS JOIN unnest(range(len(toks) - {_DUP_SPAN_K} + 1)) AS u(i)
                WHERE len(toks) >= {_DUP_SPAN_K}
            ),
            df AS (SELECT span, COUNT(*) AS df FROM spans GROUP BY span),
            per AS (
                SELECT s.doc_id, COUNT(*) AS n_spans,
                       COALESCE(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END), 0) AS n_dup
                FROM spans s JOIN df USING (span) GROUP BY s.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(per.n_dup, 0) AS BIGINT) AS n_dup_spans
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        """,
        "repetition_stats": """
            WITH t AS (
                SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                FROM documents WHERE trim(text) <> ''
            ),
            base AS (SELECT doc_id, toks, len(toks) AS n,
                            length(array_to_string(toks, '')) AS sumlen FROM t),
            big AS (SELECT doc_id, toks[CAST(i AS BIGINT)+1] || ' ' || toks[CAST(i AS BIGINT)+2] AS g
                    FROM base CROSS JOIN unnest(range(n - 1)) AS u(i) WHERE n >= 2),
            bc AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY doc_id, g),
            topb AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY doc_id),
            tri AS (SELECT doc_id, toks[CAST(i AS BIGINT)+1] || ' ' || toks[CAST(i AS BIGINT)+2]
                               || ' ' || toks[CAST(i AS BIGINT)+3] AS g
                    FROM base CROSS JOIN unnest(range(n - 2)) AS u(i) WHERE n >= 3),
            tc AS (SELECT doc_id, COUNT(*) AS ct, COUNT(DISTINCT g) AS cd FROM tri GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(b.n, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(topb.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
                   CAST(COALESCE(tc.ct, 0) AS BIGINT) AS n_trigrams,
                   CAST(COALESCE(tc.cd, 0) AS BIGINT) AS n_distinct_trigrams,
                   CAST(COALESCE(b.sumlen, 0) AS BIGINT) AS sum_token_chars
            FROM documents d
            LEFT JOIN base b USING (doc_id)
            LEFT JOIN topb USING (doc_id)
            LEFT JOIN tc USING (doc_id)
        """,
        # integer-only aggregates → exact compare (no ROUND-half drift)
        "events_props_json": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        # patterns interpolated from the SAME module constants the engine
        # compiles (data_quality.PII_*); injection expression shared via
        # _augmented_text_sql; redaction order email → IP → phone
        "pii_scrub": f"""
            WITH t AS (
                SELECT doc_id, {_pii_aug_sql} AS aug FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(aug, '{_PII_IP}')) AS BIGINT) AS n_ips,
                   CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                            '{_PII_IP}', '<IP>', 'g'),
                            '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
            FROM t
        """,
        "count_distinct_texts": """
            SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct FROM documents
        """,
        # symmetric exact substring dedup (Lee et al. shape): every token
        # position covered by a span occurring in >= 2 docs is removed;
        # span K shared via DUP_SPAN_K, fingerprint = md5 of kept tokens
        "remove_duplicate_spans": f"""
            WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                       FROM documents WHERE trim(text) <> ''),
            w AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                         array_to_string(toks[CAST(i AS BIGINT)+1:CAST(i AS BIGINT)+{_DUP_SPAN_K}], ' ') AS span
                  FROM t CROSS JOIN unnest(range(len(toks) - {_DUP_SPAN_K} + 1)) AS u(i)
                  WHERE len(toks) >= {_DUP_SPAN_K}),
            df AS (SELECT span, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY span),
            dup AS (SELECT w.doc_id, w.i FROM w JOIN df USING (span) WHERE df.df >= 2),
            cover AS (SELECT DISTINCT doc_id, i + CAST(j AS BIGINT) AS pos
                      FROM dup CROSS JOIN unnest(range({_DUP_SPAN_K})) AS v(j)),
            tokpos AS (SELECT doc_id, unnest(toks) AS tok,
                              unnest(range(len(toks))) AS pos FROM t),
            kept AS (SELECT p.doc_id, p.pos, p.tok FROM tokpos p
                     ANTI JOIN cover c ON p.doc_id = c.doc_id AND p.pos = c.pos),
            agg AS (SELECT doc_id, COUNT(*) AS n, string_agg(tok, ' ' ORDER BY pos) AS joined
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens_kept,
                   md5(COALESCE(a.joined, '')) AS kept_fp
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "pages_domain_counts": f"""
            SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain, COUNT(*) AS n_docs
            FROM read_parquet('{_docs_oracle}') GROUP BY domain
        """,
        "pages_domain_capped": f"""
            SELECT domain, url FROM (
                SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain, url,
                       row_number() OVER (
                           PARTITION BY regexp_extract(url, '{_DOMAIN_RE}', 1)
                           ORDER BY md5(url), url) AS rn
                FROM read_parquet('{_docs_oracle}')
            ) WHERE rn <= {_DOMAIN_CAP}
        """,
        # token-volume concentration by host over ALL snapshots: REAL
        # declarative window rank + running share over the flat pages
        # parquet (pipelines/data_quality.py host_token_concentration)
        "host_token_concentration": f"""
            WITH p AS (
                SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS host,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS nt
                FROM read_parquet('{_pages_text_oracle}')
            ), h AS (
                SELECT host, COUNT(*) AS n_pages,
                       CAST(SUM(nt) AS BIGINT) AS n_tokens
                FROM p GROUP BY host
            ), t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM h)
            SELECT host, n_pages, n_tokens,
                   row_number() OVER (ORDER BY n_tokens DESC, host)
                       AS host_rank,
                   ROUND(CAST(SUM(n_tokens) OVER (
                       ORDER BY n_tokens DESC, host
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.tot, 6)
                       AS cum_share
            FROM h CROSS JOIN t
        """,
        "nation_balance_full_outer": """
            WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
                       FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
                 s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                       FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
            SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                   CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
                   CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
            FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        """,
        # the composed cleaning funnel — every predicate mirrors the
        # engine's clean_corpus_ids defaults (lang ^(?:en|de), >=10
        # tokens, top-bigram <= 4, exact-dup winner, benchmark slice
        # doc_id % MOD == 0 excluded, 3-gram contamination excluded)
        "clean_corpus_ids": f"""
            WITH tk AS (
                SELECT doc_id, lang,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS n_tokens
                FROM documents
            ),
            t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                  FROM documents WHERE trim(text) <> ''),
            big AS (SELECT doc_id, toks[CAST(i AS BIGINT)+1] || ' ' || toks[CAST(i AS BIGINT)+2] AS g
                    FROM t CROSS JOIN unnest(range(len(toks) - 1)) AS u(i) WHERE len(toks) >= 2),
            bc AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY doc_id, g),
            topb AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY doc_id),
            win AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
            toks3 AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok,
                       unnest(range(len(regexp_split_to_array(trim(lower(text)), '\\s+')))) AS pos
                FROM documents WHERE trim(text) <> ''
            ),
            sh AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
                   FROM toks3 a
                   JOIN toks3 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   JOIN toks3 c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
            bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
            contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
                       WHERE s.doc_id % {_BENCH_MOD} <> 0)
            SELECT tk.doc_id FROM tk
            JOIN win ON tk.doc_id = win.doc_id
            LEFT JOIN topb ON tk.doc_id = topb.doc_id
            WHERE regexp_matches(tk.lang, '^(?:en|de)')
              AND tk.n_tokens >= 10
              AND COALESCE(topb.top_bigram_n, 0) <= 4
              AND tk.doc_id % {_BENCH_MOD} <> 0
              AND tk.doc_id NOT IN (SELECT doc_id FROM contam)
        """,
        "q17_small_quantity_revenue": """
            SELECT ROUND(COALESCE(SUM(l_extendedprice), 0) / 7.0, 2) AS avg_yearly
            FROM lineitem l JOIN part p ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1' AND p_size <= 15
              AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                                FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """,
        # per-group top-k window (ROW_NUMBER <= k over a high-cardinality
        # partition key — bucketed rank in the engine)
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   CAST(rn AS BIGINT) AS rn
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        # EXISTS semi-join: bucketed how="semi" in the engine
        "q4_priority_exists": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate <  TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        # conditional aggregation over a join (TPC-H Q12 shape)
        "q12_priority_by_returnflag": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q18_large_orders": """
            SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   ROUND(sq, 2) AS sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, SUM(l_quantity) AS sq FROM lineitem
                  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) lq
              ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        # full-scan filter-aggregate (TPC-H Q6 shape) — read-bound
        "q6_forecast_revenue": """
            SELECT ROUND(COALESCE(SUM(l_extendedprice * l_discount), 0), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        # broadcast-join conditional share (TPC-H Q14 shape)
        "q14_promo_revenue": """
            SELECT ROUND(
                100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        """,
        # disjunction of conjunctive predicates (TPC-H Q19 shape)
        "q19_disjunctive_revenue": """
            SELECT ROUND(COALESCE(SUM(l_extendedprice * (1 - l_discount)), 0), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        # TPC-H Q15 shape: correlated MAX against a derived revenue view.
        # Revenue sums integer 0.0001 units on both sides (exact — the
        # ROUND_NOTES integer-reduction rule), so the winner set and the
        # reported double are bit-identical.
        "q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey AS s_suppkey,
                       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                                AS BIGINT)) AS rev_i
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(rev_i AS DOUBLE) / 10000.0 AS total_rev
            FROM supplier s JOIN revenue r USING (s_suppkey)
            WHERE rev_i = (SELECT MAX(rev_i) FROM revenue)
            ORDER BY s.s_suppkey
        """,
        # TPC-H Q9 shape (partsupp-free variant: cost = retailprice·qty);
        # the two money terms round to integer 0.0001 units SEPARATELY on
        # both sides before the subtraction.
        "q9_product_type_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                                 AS BIGINT)
                          - CAST(ROUND(p_retailprice * l_quantity * 10000)
                                 AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_profit
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%widget%'
            GROUP BY n_name, year(o_orderdate)
        """,
        # TPC-H Q11 shape: HAVING against a global scalar over the same
        # join (partsupp-free variant: value = discounted lineitem
        # revenue shipped by one nation's suppliers).
        "q11_important_parts": """
            WITH vals AS (
                SELECT l_partkey AS p_partkey,
                       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                                AS BIGINT)) AS value_i
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_7'
                GROUP BY l_partkey
            )
            SELECT p_partkey, CAST(value_i AS DOUBLE) / 10000.0 AS part_value
            FROM vals
            WHERE value_i > CAST(FLOOR(0.001 * (SELECT SUM(value_i) FROM vals))
                                 AS BIGINT)
        """,
        # TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
        # group (partsupp-free: the relation is distinct lineitem pairs;
        # NOT-IN = negative-balance suppliers).
        "q16_supplier_part_counts": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#3'
              AND p_type NOT LIKE '%STANDARD%'
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
        """,
        # TPC-H Q20 shape: nested-aggregate semi-join chain (availqty-free
        # variant: a supplier qualifies when it shipped more than half of
        # a filtered part's total windowed volume).
        "q20_part_promotion": """
            WITH pq AS (
                SELECT l_partkey, l_suppkey,
                       SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_i
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate <  TIMESTAMP '1998-01-01'
                  AND l_partkey IN
                      (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
                GROUP BY l_partkey, l_suppkey
            ), tot AS (
                SELECT l_partkey, SUM(qty_i) AS tot_i FROM pq GROUP BY l_partkey
            )
            SELECT s_suppkey, s_name
            FROM supplier
            WHERE s_nationkey IN
                  (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
              AND s_suppkey IN (
                  SELECT DISTINCT l_suppkey FROM pq JOIN tot USING (l_partkey)
                  WHERE 2 * qty_i > tot_i)
            ORDER BY s_name
        """,
        # TPC-H Q21 shape: EXISTS + NOT-EXISTS self-correlation on
        # lineitem (return flag stands in for the late-delivery dates the
        # testdata lacks); the sole returner on a multi-supplier 'F'
        # order is recovered as SUM(suppkey·flag) under n_ret = 1.
        "q21_waiting_suppliers": """
            WITH pair AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
                FROM lineitem GROUP BY l_orderkey, l_suppkey
            ), per_order AS (
                SELECT l_orderkey, COUNT(*) AS n_supp, SUM(r) AS n_ret,
                       SUM(l_suppkey * r) AS ret_supp
                FROM pair GROUP BY l_orderkey
            )
            SELECT s_name, COUNT(*) AS numwait
            FROM per_order
            JOIN orders   ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
            JOIN supplier ON s_suppkey = ret_supp
            WHERE n_supp > 1 AND n_ret = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        # TPC-H Q2 shape: correlated MIN over a 5-table join
        # (partsupp-free: cost = min observed extendedprice in cents).
        "q2_min_cost_supplier": """
            WITH rs AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'EUROPE'
            ), pcost AS (
                SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                       MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_i
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 25)
                  AND l_suppkey IN (SELECT s_suppkey FROM rs)
                GROUP BY l_partkey, l_suppkey
            )
            SELECT s_acctbal, s_name, n_name, p_partkey,
                   CAST(cost_i AS DOUBLE) / 100.0 AS min_cost
            FROM pcost JOIN rs USING (s_suppkey)
            WHERE cost_i = (SELECT MIN(cost_i) FROM pcost p2
                            WHERE p2.p_partkey = pcost.p_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        # national market share per year (TPC-H Q8 shape)
        "q8_market_share": """
            WITH base AS (
                SELECT year(o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount) AS revenue,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1998-01-01'
            )
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   ROUND(SUM(CASE WHEN supp_nation = 'NATION_9' THEN revenue
                             ELSE 0 END) / SUM(revenue), 6) AS mkt_share
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        # cross-nation revenue per year (TPC-H Q7 shape)
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_6', 'NATION_9')
              AND n2.n_name IN ('NATION_6', 'NATION_9')
              AND n1.n_name <> n2.n_name
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "embedding_near_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "similarity_topk": """
            SELECT vec_id,
                   ROUND(CAST(list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)
                   ) AS DOUBLE), 3) AS cos
            FROM embeddings
            ORDER BY cos DESC NULLS LAST, vec_id
            LIMIT 10
        """,
    }
    # Bloom-prefiltered contamination is EXACT by contract (prefilter is a
    # superset, survivors are string-confirmed) — same oracle as the exact path.
    sql["benchmark_contamination_bloom"] = sql["benchmark_contamination"]
    # TF-IDF / unigram-LM / chunking share the token_counts tokenizer
    # (trim -> lower -> split \s+; blank docs emit nothing)
    sql["tfidf_top_terms"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, tf.token
                   ) AS rn
            FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, tfidf FROM scored WHERE rn <= 3
        ORDER BY doc_id, tfidf DESC, token
    """
    sql["event_type_cooccurrence"] = """
        WITH dt AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_users
        FROM dt a JOIN dt b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
        GROUP BY type_a, type_b ORDER BY type_a, type_b
    """
    _corr_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    sql["lineitem_correlations"] = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"ROUND(corr({a}, {b}), 6) AS pearson_r FROM lineitem"
        for i, a in enumerate(_corr_cols)
        for b in _corr_cols[i + 1 :]
    )
    sql["events_type_hour_pivot"] = """
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view
        FROM events GROUP BY hour ORDER BY hour
    """
    sql["events_funnel_counts"] = """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_view_click,
               (SELECT COUNT(*) FROM p) AS n_full_funnel
    """
    sql["token_postings"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        dt AS (SELECT DISTINCT doc_id, token FROM toks)
        SELECT token, COUNT(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM dt GROUP BY token
        HAVING COUNT(*) BETWEEN 5 AND 390
        ORDER BY token
    """
    sql["q10_returned_item_revenue"] = """
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, c_custkey
        LIMIT 20
    """
    sql["quantity_zscore_by_returnflag"] = """
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               ROUND((l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag))
                     / STDDEV_POP(l_quantity) OVER (PARTITION BY l_returnflag),
                     6) AS zscore
        FROM lineitem
    """
    sql["heavy_hitter_tokens"] = """
        WITH toks AS (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks)
        SELECT token, COUNT(*) AS n
        FROM toks CROSS JOIN tot
        GROUP BY token, tot.t
        HAVING COUNT(*) >= tot.t / 200
        ORDER BY n DESC, token
    """
    sql["unigram_logprob_scores"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        tot AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
        t AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM tot)
        SELECT toks.doc_id,
               ROUND(AVG(ln(CAST(tot.n AS DOUBLE) / t.t)), 6) AS logprob
        FROM toks JOIN tot USING (token) CROSS JOIN t
        GROUP BY toks.doc_id ORDER BY toks.doc_id
    """
    sql["bigram_logprob_scores"] = """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]
                   )) AS bigram
            FROM toks WHERE len(ts) >= 2
        ),
        tot AS (SELECT bigram, COUNT(*) AS n FROM big GROUP BY bigram),
        t AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM tot)
        SELECT big.doc_id,
               ROUND(AVG(ln(CAST(tot.n AS DOUBLE) / t.t)), 6) AS logprob
        FROM big JOIN tot USING (bigram) CROSS JOIN t
        GROUP BY big.doc_id ORDER BY big.doc_id
    """
    # PMI collocations: pmi = ln(n_xy * N_tok^2 / (N_big * n_x * n_y)),
    # min-count cut + round-to-6 + (pmi DESC, bigram ASC) top-k — the
    # constants and tie order are the operator contract
    # (pipelines/corpus_stats.py PMI_MIN_COUNT / PMI_TOPK).
    sql["pmi_collocations"] = f"""
        WITH toks AS (
            SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ),
        big AS (
            SELECT unnest(list_transform(
                       range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]
                   )) AS bigram
            FROM toks WHERE len(ts) >= 2
        ),
        uni AS (SELECT unnest(ts) AS token FROM toks),
        bt AS (SELECT bigram, COUNT(*) AS n FROM big GROUP BY bigram),
        ut AS (SELECT token, COUNT(*) AS cn FROM uni GROUP BY token),
        nb AS (SELECT CAST(SUM(n) AS DOUBLE) AS nb FROM bt),
        nt AS (SELECT CAST(SUM(cn) AS DOUBLE) AS nt FROM ut)
        SELECT bt.bigram, bt.n,
               ROUND(ln(CAST(bt.n AS DOUBLE) * nt.nt * nt.nt
                        / (nb.nb * u1.cn * u2.cn)), 6) AS pmi
        FROM bt
        JOIN ut u1 ON u1.token = split_part(bt.bigram, ' ', 1)
        JOIN ut u2 ON u2.token = split_part(bt.bigram, ' ', 2)
        CROSS JOIN nb CROSS JOIN nt
        WHERE bt.n >= {_PMI_MIN}
        ORDER BY pmi DESC, bt.bigram LIMIT {_PMI_TOPK}
    """
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        BM25_B as _BM25_B,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        BM25_K1 as _BM25_K1,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        BM25_QUERY_TOKENS as _BM25_Q,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        BM25_TOPK as _BM25_TOPK,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        CCNET_KEY_DECIMALS as _CCNET_DEC,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        CONTAM_FRAC_DEN as _CONTAM_DEN,
    )
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        CONTAM_FRAC_NUM as _CONTAM_NUM,
    )

    # CCNet bucketing: the tercile rank runs over the score rounded to
    # CCNET_KEY_DECIMALS (bounded histogram — same key both engines);
    # membership is the integer comparison below*3 vs n_lang.
    sql["ccnet_perplexity_buckets"] = f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        tot AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
        t AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM tot),
        sc AS (
            SELECT toks.doc_id, toks.lang,
                   ROUND(AVG(ln(CAST(tot.n AS DOUBLE) / t.t)), 6) AS logprob,
                   ROUND(AVG(ln(CAST(tot.n AS DOUBLE) / t.t)), {_CCNET_DEC}) AS score_key
            FROM toks JOIN tot USING (token) CROSS JOIN t
            GROUP BY toks.doc_id, toks.lang
        ),
        hist AS (SELECT lang, score_key, COUNT(*) AS n FROM sc GROUP BY lang, score_key),
        cum AS (
            SELECT lang, score_key,
                   SUM(n) OVER (PARTITION BY lang ORDER BY score_key
                                ROWS UNBOUNDED PRECEDING) - n AS below,
                   SUM(n) OVER (PARTITION BY lang) AS n_lang
            FROM hist
        )
        SELECT sc.doc_id, sc.lang, sc.logprob,
               CASE WHEN cum.below * 3 < cum.n_lang THEN 'tail'
                    WHEN cum.below * 3 < 2 * cum.n_lang THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM sc JOIN cum ON sc.lang = cum.lang AND sc.score_key = cum.score_key
    """
    _bm25_vals = ", ".join(f"('{t}')" for t in _BM25_Q)
    sql["bm25_topk"] = f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS total FROM dl),
        q(token) AS (VALUES {_bm25_vals}),
        dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                FROM toks JOIN q USING (token) GROUP BY token),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM toks JOIN q USING (token) GROUP BY doc_id, token)
        SELECT tf.doc_id,
               ROUND(SUM(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                         * (tf.tf * ({_BM25_K1} + 1.0))
                         / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                            + {_BM25_B} * dl.dl / (st.total / st.n_docs)))), 6) AS score
        FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id) CROSS JOIN st
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id
        LIMIT {_BM25_TOPK}
    """
    sql["contamination_overlap_scores"] = f"""
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ),
        tri AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]
                   ))) AS g
            FROM t WHERE len(ts) >= 3
        ),
        bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % {_BENCH_MOD} = 0)
        SELECT tri.doc_id,
               COUNT(*) AS n_ngrams,
               CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
               CAST(CASE WHEN SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)
                              * {_CONTAM_DEN}
                              >= COUNT(*) * {_CONTAM_NUM}
                         THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        FROM tri LEFT JOIN bench ON tri.g = bench.g
        WHERE tri.doc_id % {_BENCH_MOD} <> 0
        GROUP BY tri.doc_id
    """
    from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
        PHRASE_QUERY as _PHRASE,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        BLOCKLIST_TOKENS as _BLOCKLIST,
    )

    sql["source_kl_divergence"] = """
        WITH toks AS (
            SELECT source,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ),
        st AS (SELECT source, token, COUNT(*) AS n FROM toks GROUP BY source, token),
        s AS (SELECT source, SUM(n) AS ns FROM st GROUP BY source),
        tt AS (SELECT token, SUM(n) AS nt FROM st GROUP BY token),
        t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM st)
        SELECT st.source,
               ROUND(SUM((CAST(st.n AS DOUBLE) / s.ns)
                         * ln((CAST(st.n AS DOUBLE) / s.ns)
                              / (CAST(tt.nt AS DOUBLE) / t.tot))), 6) AS kl
        FROM st JOIN s USING (source) JOIN tt USING (token) CROSS JOIN t
        GROUP BY st.source
    """
    sql["phrase_search"] = f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s, '{_PHRASE}')) AS BIGINT) AS n_matches
        FROM t WHERE s LIKE '%{_PHRASE}%'
    """
    _bl_inlist = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    sql["blocklist_filter"] = f"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ts
            FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(ts, x -> x IN ({_bl_inlist}))) AS BIGINT)
                   AS n_blocked,
               CAST(CASE WHEN len(list_filter(ts, x -> x IN ({_bl_inlist}))) = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM t
    """
    # C4 line-level cleaning: the page derivation (8-token lines,
    # (doc_id*37+j*11)%10 decoration, lorem/brace dirt) is the shared
    # contract — implemented independently here in SQL (explode +
    # list ops) vs the engine's pandas map (data_quality._c4_page_lines);
    # the line/page keep rules are likewise independent implementations.
    sql["c4_line_filters"] = """
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE trim(text) <> ''
        ), ln AS (
            SELECT doc_id, CAST(j AS BIGINT) AS j,
                   array_to_string(
                       toks[CAST(j AS BIGINT) * 8 + 1 : CAST(j AS BIGINT) * 8 + 8],
                       ' ') AS body,
                   (doc_id * 37 + CAST(j AS BIGINT) * 11) % 10 AS v
            FROM t CROSS JOIN unnest(range((len(toks) + 7) // 8)) AS u(j)
        ), dec AS (
            SELECT doc_id, j,
                   CASE WHEN doc_id % 13 = 0 AND j = 0
                        THEN 'lorem ipsum ' ELSE '' END ||
                   CASE WHEN v <= 5 THEN body || '.'
                        WHEN v = 6 THEN body || ':'
                        WHEN v = 7 THEN body
                        WHEN v = 8 THEN 'javascript ' || body || '.'
                        ELSE body || '!' END ||
                   CASE WHEN doc_id % 17 = 0 AND j = 1
                        THEN ' {' ELSE '' END AS line
            FROM ln
        ), fl AS (
            SELECT doc_id, j, line,
                   (right(line, 1) IN ('.', '!', '?', '"')
                    AND len(regexp_split_to_array(line, '\\s+')) >= 5
                    AND NOT contains(line, 'javascript')) AS kept,
                   (contains(line, 'lorem ipsum') OR contains(line, '{'))
                       AS dirt
            FROM dec
        ), agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   md5(COALESCE(string_agg(CASE WHEN kept THEN line END,
                                           chr(10) ORDER BY j), ''))
                       AS clean_md5,
                   MAX(CASE WHEN dirt THEN 1 ELSE 0 END) AS dirty
            FROM fl GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(a.clean_md5, md5('')) AS clean_md5,
               CAST(CASE WHEN COALESCE(a.n_kept, 0) >= 3
                          AND COALESCE(a.dirty, 0) = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    from png_from_pdf_extracter_ray.stages.linkgraph import (
        KHOP_MAX_HOPS as _KHOP_K,
    )
    from png_from_pdf_extracter_ray.stages.linkgraph import (
        KHOP_SEED_MOD as _KHOP_MOD,
    )

    # k-hop reachability: the engine runs a distributed bucketed BFS;
    # the oracle is a fully DECLARATIVE recursive CTE over the flat edge
    # parquet — opposite architectures must agree on every (node, hops).
    sql["link_khop_reach"] = f"""
        WITH RECURSIVE reach(node, hops) AS (
            SELECT node, CAST(0 AS BIGINT) AS hops FROM (
                SELECT src AS node FROM read_parquet('{_link_edges_oracle}')
                UNION
                SELECT dst AS node FROM read_parquet('{_link_edges_oracle}')
            ) WHERE node % {_KHOP_MOD} = 0
            UNION
            SELECT e.dst AS node, r.hops + 1 AS hops
            FROM reach r JOIN read_parquet('{_link_edges_oracle}') e
              ON e.src = r.node
            WHERE r.hops < {_KHOP_K}
        )
        SELECT node, MIN(hops) AS hops FROM reach GROUP BY node
    """
    sql["domain_reputation"] = f"""
        WITH d AS (
            SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain,
                   CASE WHEN status = 'completed' THEN 1 ELSE 0 END AS ok
            FROM read_parquet('{_docs_oracle}')
        ),
        agg AS (SELECT domain, COUNT(*) AS n_docs, SUM(ok) AS n_ok FROM d GROUP BY domain),
        tot AS (SELECT SUM(n_docs) AS tn, SUM(n_ok) AS tk FROM agg)
        SELECT domain, n_docs, CAST(n_ok AS BIGINT) AS n_ok,
               CAST(CASE WHEN n_ok * tot.tn >= tot.tk * n_docs
                         THEN 1 ELSE 0 END AS BIGINT) AS reputable
        FROM agg CROSS JOIN tot
    """
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        INC_DELTA_MOD as _INC_MOD,
    )

    sql["incremental_new_docs"] = f"""
        WITH p AS (
            SELECT url, warc_us, text_md5,
                   CAST(regexp_extract(url, 'https://site([0-9]+)\\.', 1) AS BIGINT)
                       AS site
            FROM read_parquet('{_pages_slim_oracle}')
        )
        SELECT url, warc_us FROM p
        WHERE site % {_INC_MOD} = 0
          AND text_md5 NOT IN (
              SELECT text_md5 FROM p WHERE site % {_INC_MOD} <> 0
          )
    """
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        MIRROR_MAX_HOSTS as _MIRROR_CAP,
    )
    from png_from_pdf_extracter_ray.pipelines.data_quality import (
        MIRROR_MIN_SHARED as _MIRROR_MIN,
    )

    # mirror-host detection: declarative DuckDB self-join over the flat
    # slim-pages parquet vs the engine's one-shuffle tagged-stream fold
    sql["mirror_host_pairs"] = f"""
        WITH hm AS (
            SELECT DISTINCT regexp_extract(url, '{_DOMAIN_RE}', 1) AS host,
                   text_md5 AS md5
            FROM read_parquet('{_pages_slim_oracle}')
        ), capped AS (
            SELECT md5 FROM hm GROUP BY md5
            HAVING COUNT(*) <= {_MIRROR_CAP}
        ), hm2 AS (
            SELECT hm.host, hm.md5 FROM hm JOIN capped USING (md5)
        ), sizes AS (
            SELECT host, COUNT(*) AS n FROM hm2 GROUP BY host
        ), pairs AS (
            SELECT a.host AS host_a, b.host AS host_b,
                   COUNT(*) AS n_shared
            FROM hm2 a JOIN hm2 b ON a.md5 = b.md5 AND a.host < b.host
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_MIRROR_MIN}
        )
        SELECT host_a, host_b, n_shared,
               n_shared / (sa.n + sb.n - n_shared) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.host = pairs.host_a
        JOIN sizes sb ON sb.host = pairs.host_b
    """
    sql["vocab_zipf_fit"] = """
        WITH tot AS (
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
                FROM documents WHERE trim(text) <> ''
            ) GROUP BY token
        ),
        ranked AS (
            SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS lx,
                   ln(CAST(n AS DOUBLE)) AS ly
            FROM tot
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
               ROUND(regr_slope(ly, lx), 6) AS slope,
               ROUND(AVG(ly) - regr_slope(ly, lx) * AVG(lx), 6) AS intercept
        FROM ranked
    """
    sql["events_retention_cohorts"] = """
        WITH a AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
            FROM events
        ),
        f AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
        SELECT f.cohort_day,
               a.day - f.cohort_day AS age_days,
               COUNT(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY f.cohort_day, a.day - f.cohort_day
    """
    sql["token_chunks"] = """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents WHERE trim(text) <> ''
        ),
        ch AS (
            SELECT doc_id, toks,
                   unnest(range(CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_id
            FROM toks
        )
        SELECT doc_id, chunk_id,
               len(list_slice(toks, chunk_id * 64 + 1, chunk_id * 64 + 64)) AS n_tokens,
               md5(array_to_string(
                   list_slice(toks, chunk_id * 64 + 1, chunk_id * 64 + 64), ' '
               )) AS chunk_md5
        FROM ch ORDER BY doc_id, chunk_id
    """
    return sql
