"""Semantic tests for the corpus-cleaning wave: CCNet perplexity
buckets, BM25 retrieval, contamination overlap scores, domain
reputation.  (The exact value parity vs DuckDB runs in
test_queries_vs_duckdb.py — these check operator-level invariants.)"""

from __future__ import annotations

import numpy as np
import pytest

from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
    BENCHMARK_MOD,
    BM25_QUERY_TOKENS,
    BM25_TOPK,
    CONTAM_FRAC_DEN,
    CONTAM_FRAC_NUM,
    bm25_topk,
    ccnet_perplexity_buckets,
    contamination_overlap_scores,
)
from png_from_pdf_extracter_ray.pipelines.data_quality import domain_reputation


@pytest.fixture(scope="module")
def ccnet(ray_session, sf_dir):  # noqa: ANN001
    return ccnet_perplexity_buckets(sf_dir).to_pandas()


class TestCCNetBuckets:
    def test_buckets_partition_each_language_by_score(self, ccnet):  # noqa: ANN001
        assert set(ccnet["bucket"]) == {"head", "middle", "tail"}
        order = {"tail": 0, "middle": 1, "head": 2}
        for _, g in ccnet.groupby("lang"):
            # monotone: every tail score <= every middle score <= head
            for lo, hi in [("tail", "middle"), ("middle", "head")]:
                a, b = g[g.bucket == lo], g[g.bucket == hi]
                if len(a) and len(b):
                    assert a["logprob"].max() <= b["logprob"].min() + 1e-3
            # terciles: each bucket holds roughly a third (rounded-key
            # ties can shift the boundary by one key's worth of docs)
            counts = g["bucket"].map(order).value_counts()
            assert counts.min() >= 1
        assert len(ccnet) == ccnet["doc_id"].nunique()

    def test_every_nonblank_doc_present(self, ccnet, sf_dir):  # noqa: ANN001
        import duckdb

        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE trim(text) <> ''"
        ).fetchone()[0]
        assert len(ccnet) == n


class TestBM25:
    def test_topk_sorted_and_positive(self, ray_session, sf_dir):  # noqa: ANN001
        out = bm25_topk(sf_dir)
        assert len(out) <= BM25_TOPK
        s = out["score"].to_numpy()
        assert (s > 0).all()
        assert (np.diff(s) <= 1e-12).all()  # descending

    def test_top_doc_contains_query_tokens(self, ray_session, sf_dir):  # noqa: ANN001
        import duckdb

        out = bm25_topk(sf_dir)
        top_id = int(out["doc_id"].iloc[0])
        text = duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            f"WHERE doc_id = {top_id}"
        ).fetchone()[0]
        toks = set(text.strip().lower().split())
        assert toks & set(BM25_QUERY_TOKENS)


class TestContaminationOverlap:
    def test_counts_and_flag_consistent(self, ray_session, sf_dir):  # noqa: ANN001
        out = contamination_overlap_scores(sf_dir).to_pandas()
        assert (out["doc_id"] % BENCHMARK_MOD != 0).all()
        assert (out["n_hits"] <= out["n_ngrams"]).all()
        assert (out["n_hits"] >= 0).all()
        expect = (
            out["n_hits"] * CONTAM_FRAC_DEN >= out["n_ngrams"] * CONTAM_FRAC_NUM
        ).astype(np.int64)
        assert (out["contaminated"] == expect).all()


class TestDomainReputation:
    def test_rate_threshold_is_global_rate(self, ray_session, sf_dir):  # noqa: ANN001
        out = domain_reputation(sf_dir)
        assert (out["n_ok"] <= out["n_docs"]).all()
        tn, tk = int(out["n_docs"].sum()), int(out["n_ok"].sum())
        expect = (
            out["n_ok"].to_numpy(np.int64) * tn >= tk * out["n_docs"].to_numpy(np.int64)
        ).astype(np.int64)
        assert (out["reputable"] == expect).all()
        # both classes exist on the synthetic corpus
        assert out["reputable"].nunique() == 2


class TestSourceKL:
    def test_kl_nonnegative_per_source(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
            source_kl_divergence,
        )

        out = source_kl_divergence(sf_dir)
        assert len(out) == 20  # one row per source
        assert (out["kl"].to_numpy() >= 0).all()  # KL(p‖q) ≥ 0 (Gibbs)


class TestPhraseSearch:
    def test_matches_contain_phrase(self, ray_session, sf_dir):  # noqa: ANN001
        import duckdb

        from png_from_pdf_extracter_ray.pipelines.corpus_stats import (
            PHRASE_QUERY,
            phrase_search,
        )

        out = phrase_search(sf_dir).to_pandas()
        assert (out["n_matches"] >= 1).all()
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).df().set_index("doc_id")["text"]
        for did in out["doc_id"].head(5):
            assert PHRASE_QUERY in " ".join(docs.loc[did].strip().lower().split())


class TestBlocklistFilter:
    def test_keep_iff_no_blocked_tokens(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            BLOCKLIST_TOKENS,
            blocklist_filter,
        )

        out = blocklist_filter(sf_dir).to_pandas()
        assert (out["keep"] == (out["n_blocked"] == 0).astype("int64")).all()
        assert out["keep"].nunique() == 2  # both classes on the synthetic corpus
        assert len(BLOCKLIST_TOKENS) >= 2


class TestUnigramTokenizer:
    def test_viterbi_prefers_high_prob_long_pieces(self):
        from png_from_pdf_extracter_ray.pipelines.tokenizer import _viterbi_segment

        lp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -3.0}
        pieces, score = _viterbi_segment("abc", lp)
        assert pieces == ["ab", "c"]
        assert abs(score - (-4.0)) < 1e-12

    def test_unknown_char_falls_back_to_unk(self):
        from png_from_pdf_extracter_ray.pipelines.tokenizer import (
            UNI_UNK_LOGPROB,
            _viterbi_segment,
        )

        pieces, score = _viterbi_segment("xy", {"x": -1.0})
        assert pieces == ["x", "y"]
        assert abs(score - (-1.0 + UNI_UNK_LOGPROB)) < 1e-12

    def test_vocab_covers_all_single_chars(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.mlops import unigram_train_vocab

        v = unigram_train_vocab(sf_dir)
        singles = set(v[v["piece"].str.len() == 1]["piece"])
        multis = v[v["piece"].str.len() > 1]["piece"]
        # every char of every multi-char piece is itself in the vocab
        assert all(ch in singles for p in multis for ch in p)
        assert (v["n_uses"].to_numpy()[:-1] >= v["n_uses"].to_numpy()[1:]).all()

    def test_encode_counts_consistent(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.mlops import unigram_encode_docs

        out = unigram_encode_docs(sf_dir).to_pandas()
        nz = out[out["n_words"] > 0]
        assert (nz["n_pieces"] >= nz["n_words"]).all()  # each word ≥ 1 piece
        assert (nz["uni_logprob"] < 0).all()


class TestRetentionCohorts:
    def test_cohort_triangle_invariants(self, ray_session, sf_dir):  # noqa: ANN001
        import duckdb

        from png_from_pdf_extracter_ray.pipelines.relational import (
            events_retention_cohorts,
        )

        out = events_retention_cohorts(sf_dir)
        assert (out["age_days"] >= 0).all()
        # day-0 row exists for every cohort (a user is active on their
        # own first day by definition)
        zero = out[out["age_days"] == 0]
        assert set(zero["cohort_day"]) == set(out["cohort_day"])
        # total distinct users = sum of day-0 cohort sizes
        n_users = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()[0]
        assert int(zero["n_users"].sum()) == n_users


class TestZipfFit:
    def test_slope_negative_and_rank1_prediction_sane(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.corpus_stats import vocab_zipf_fit

        out = vocab_zipf_fit(sf_dir)
        assert len(out) == 1
        slope = float(out["slope"].iloc[0])
        assert slope < 0  # frequency decreases with rank
        # intercept ≈ ln(count at rank 1): within an order of magnitude
        import duckdb

        top = duckdb.sql(
            f"""SELECT COUNT(*) FROM (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
                FROM read_parquet('{sf_dir}/documents.parquet') WHERE trim(text) <> ''
            ) GROUP BY t ORDER BY 1 DESC LIMIT 1"""
        ).fetchone()[0]
        assert abs(float(out["intercept"].iloc[0]) - np.log(top)) < 2.5


class TestIncrementalNewDocs:
    def test_new_snapshots_are_strict_subset_of_delta(self, ray_session, sf_dir):  # noqa: ANN001
        from png_from_pdf_extracter_ray.pipelines.data_quality import (
            INC_DELTA_MOD,
            INC_SITE_RE,
            incremental_new_docs,
        )

        out = incremental_new_docs(sf_dir)
        site = out["url"].str.extract(INC_SITE_RE, expand=False).astype("int64")
        assert (site % INC_DELTA_MOD == 0).all()  # only delta-site snapshots
        assert 0 < len(out)  # drifted recrawls and delta-only docs exist
        # and some delta snapshots were deduped away (sibling on a base site)
        from png_from_pdf_extracter_ray.pipelines.snapshots import _slim_pages

        slim = _slim_pages(sf_dir).to_pandas()
        ds = slim["url"].str.extract(INC_SITE_RE, expand=False).astype("int64")
        n_delta = int((ds % INC_DELTA_MOD == 0).sum())
        assert len(out) < n_delta


class TestDocChunksOverlap:
    def test_boundaries_and_tail(self, ray_session, tmp_path):  # noqa: ANN001
        """Chunk i covers [i*stride, min(i*stride+window, n)); starts
        exist while i*stride < n; the tail chunk is partial; consecutive
        chunks overlap by window - stride tokens."""
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        from png_from_pdf_extracter_ray.pipelines.textops import doc_chunks_overlap

        toks = [f"w{i}" for i in range(10)]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": [1, 2, 3],
                "text": [" ".join(toks), "one two", "   "],
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")

        out = (
            doc_chunks_overlap(str(tmp_path), window=4, stride=3)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
        )
        # doc 1 (n=10): starts 0,3,6,9 -> ends 4,7,10,10
        d1 = out[out.doc_id == 1]
        assert list(d1.start_tok) == [0, 3, 6, 9]
        assert list(d1.end_tok) == [4, 7, 10, 10]
        assert list(d1.n_tokens) == [4, 4, 4, 1]
        assert (
            d1.iloc[0].chunk_md5
            == hashlib.md5("w0 w1 w2 w3".encode()).hexdigest()
        )
        # doc 2 (n=2 < window): one partial chunk
        d2 = out[out.doc_id == 2]
        assert list(d2.start_tok) == [0] and list(d2.end_tok) == [2]
        # doc 3 (blank): no chunks
        assert (out.doc_id == 3).sum() == 0

    def test_rejects_bad_stride(self, ray_session, tmp_path):  # noqa: ANN001
        import pytest

        from png_from_pdf_extracter_ray.pipelines.textops import doc_chunks_overlap

        with pytest.raises(ValueError, match="stride"):
            doc_chunks_overlap(str(tmp_path), window=4, stride=5)
