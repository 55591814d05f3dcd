"""Near-dup detection: MinHash-LSH, SimHash, embedding-cosine."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from png_from_pdf_extracter_ray.stages.neardup import (
    MinHasher,
    embedding_near_dup_pairs,
    hamming64,
    min_label_components,
    minhash_near_dup_pairs,
    shingle_jaccard,
    simhash64,
    simhash_near_dup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on and "
    "the crowd cheers loudly for the final act of the evening show tonight"
)
NEAR = BASE + " encore"
FAR = "completely different content about databases indexes and query planners everywhere"


def _docs_ds() -> rd.Dataset:
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [BASE, NEAR, FAR, BASE],
    }
    return rd.from_arrow(pa.Table.from_pydict(rows))


def test_shingle_jaccard_bounds() -> None:
    assert shingle_jaccard(BASE, BASE) == 1.0
    assert shingle_jaccard(BASE, FAR) < 0.1
    assert 0.8 < shingle_jaccard(BASE, NEAR) < 1.0
    assert shingle_jaccard("", "") == 1.0
    assert shingle_jaccard(BASE, "") == 0.0


def test_minhash_signature_similarity_tracks_jaccard() -> None:
    mh = MinHasher()
    sa, sb, sf = mh.signature(BASE), mh.signature(NEAR), mh.signature(FAR)
    sim_near = (sa == sb).mean()
    sim_far = (sa == sf).mean()
    assert sim_near > 0.7 > sim_far


def test_minhash_near_dup_pairs(ray_session) -> None:  # noqa: ANN001
    out = minhash_near_dup_pairs(_docs_ds(), threshold=0.8)
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 4) in pairs  # exact dup
    assert (1, 2) in pairs and (2, 4) in pairs  # near dup
    assert not any(3 in p for p in pairs)  # FAR never pairs
    exact = out[(out["id_a"] == 1) & (out["id_b"] == 4)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_minhash_near_dup_pairs_empty(ray_session) -> None:  # noqa: ANN001
    ds = rd.from_arrow(
        pa.Table.from_pydict({"doc_id": [1, 2], "text": [BASE, FAR]})
    )
    out = minhash_near_dup_pairs(ds, threshold=0.8)
    assert list(out.columns) == ["id_a", "id_b", "jaccard"]
    assert len(out) == 0


def test_min_label_components(ray_session) -> None:  # noqa: ANN001
    # two components: {a,b,c,d} (a chain — exercises multi-round
    # propagation) and {x,y}; z is isolated and never appears in pairs.
    pairs = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "id_a": ["a", "b", "c", "x"],
                "id_b": ["b", "c", "d", "y"],
            }
        )
    )
    out = (
        min_label_components(pairs)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    got = dict(zip(out["id"], out["label"]))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_simhash_properties() -> None:
    assert simhash64(BASE) == simhash64(BASE)
    assert hamming64(simhash64(BASE), simhash64(NEAR)) <= 6
    assert hamming64(simhash64(BASE), simhash64(FAR)) > 10
    assert simhash64("") == 0


def test_simhash_near_dup_pairs(ray_session) -> None:  # noqa: ANN001
    out = simhash_near_dup_pairs(_docs_ds(), max_hamming=6)
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 4) in pairs
    assert not any(3 in p for p in pairs)
    exact = out[(out["id_a"] == 1) & (out["id_b"] == 4)]["hamming"].iloc[0]
    assert exact == 0


def test_embedding_near_dup_pairs(ray_session) -> None:  # noqa: ANN001
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16).astype(np.float32)
    vecs = np.stack(
        [
            base,
            base + 0.01 * rng.standard_normal(16).astype(np.float32),  # near-dup of 0
            rng.standard_normal(16).astype(np.float32),  # unrelated
            -base,  # anti-correlated
        ]
    )
    ids = np.array([10, 20, 30, 40])
    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": ids.tolist(), "embedding": [v.tolist() for v in vecs]}
        )
    )
    out = embedding_near_dup_pairs(ds, ids, vecs, threshold=0.95)
    assert list(zip(out["id_a"], out["id_b"])) == [(10, 20)]
    assert out["cos"].iloc[0] > 0.99


def test_minhash_verification_broadcasts_only_candidate_ids(ray_session, monkeypatch) -> None:  # noqa: ANN001
    """VERDICT r1 regression guard: the Jaccard verification must not
    broadcast a whole-corpus text lookup — the only ray.put in the path
    is the (output-sized) candidate ID SET."""
    import ray as ray_mod

    from png_from_pdf_extracter_ray.stages import neardup

    put_objects = []
    orig_put = ray_mod.put

    def spy_put(obj, *a, **kw):  # noqa: ANN001, ANN002, ANN003
        put_objects.append(obj)
        return orig_put(obj, *a, **kw)

    monkeypatch.setattr(neardup.ray, "put", spy_put)
    rows = {
        "doc_id": list(range(8)),
        "text": [BASE, NEAR, FAR, BASE, NEAR + " x", FAR + " y", BASE + " z", NEAR],
    }
    out = minhash_near_dup_pairs(rd.from_arrow(pa.Table.from_pydict(rows)), threshold=0.8)
    assert len(out) > 0
    # ray.put also carries Ray Data internals (pa.Table blocks,
    # MapTransformer closures); the user-level objects this path may
    # broadcast are the candidate id SET — never a dict, and never a
    # container of corpus-sized text payloads (the r1 scale-killer).
    assert any(isinstance(o, (set, frozenset)) for o in put_objects), (
        "expected the candidate id set to be broadcast"
    )
    for obj in put_objects:
        assert not isinstance(obj, dict), "dict broadcast = text-lookup regression"
        if isinstance(obj, (set, frozenset, list, tuple)):
            assert all(
                not (isinstance(x, str) and len(x) > 200) for x in obj
            ), "broadcast container holds corpus-sized strings"


def test_embedding_lsh_recall_matches_exact_high_threshold(ray_session) -> None:  # noqa: ANN001
    """SRP-LSH pair generation must recover every exact pair at a
    near-dup threshold (deterministic seed → stable outcome): a planted
    cluster of near-identical vectors plus noise vectors."""
    from png_from_pdf_extracter_ray.stages.neardup import (
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal(32).astype(np.float32)
    vecs = [base + 0.02 * rng.standard_normal(32).astype(np.float32) for _ in range(6)]
    vecs += [rng.standard_normal(32).astype(np.float32) for _ in range(40)]
    ids = np.arange(len(vecs))
    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": ids.tolist(), "embedding": [v.tolist() for v in vecs]}
        )
    )
    exact = embedding_near_dup_pairs(
        ds, ids, np.stack(vecs), threshold=0.95
    )
    lsh = embedding_near_dup_pairs_lsh(ds, threshold=0.95)
    se = set(zip(exact["id_a"], exact["id_b"]))
    sl = set(zip(lsh["id_a"], lsh["id_b"]))
    assert len(se) == 15  # the planted 6-cluster: C(6,2) pairs
    assert sl == se, f"LSH missed {se - sl} / extra {sl - se}"


def test_embedding_lsh_is_exact_on_sf_embeddings(ray_session, sf_dir) -> None:  # noqa: ANN001
    """Recall check on the driver's embeddings table (threshold 0.4 with
    the wide-table config the queries() entry uses): LSH ⊆ exact always
    (verification is exact cosine) and ⊇ at this corpus/config."""
    from png_from_pdf_extracter_ray.pipelines import textops

    exact = textops.embedding_near_dups(sf_dir, threshold=0.4)
    lsh = textops.embedding_near_dups_lsh(sf_dir, threshold=0.4)
    se = set(zip(exact["id_a"], exact["id_b"]))
    sl = set(zip(lsh["id_a"], lsh["id_b"]))
    assert len(se) > 0
    assert sl == se, f"LSH missed {se - sl} / extra {sl - se}"


def test_embedding_lsh_max_sig_group_caps_dense_buckets(ray_session) -> None:  # noqa: ANN001
    """With a max_sig_group cap of 1 every (table, sig) group is dropped,
    so no pairs can be emitted — the documented web-scale safety valve."""
    from png_from_pdf_extracter_ray.stages.neardup import (
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    vecs = [base + 0.01 * rng.standard_normal(16).astype(np.float32) for _ in range(5)]
    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": list(range(5)), "embedding": [v.tolist() for v in vecs]}
        )
    )
    out = embedding_near_dup_pairs_lsh(ds, threshold=0.9, max_sig_group=1)
    assert len(out) == 0


def test_ngram_jaccard_df_cap_drops_boilerplate(ray_session) -> None:  # noqa: ANN001
    """Shingles above the df cap are dropped from the shingle universe
    (both intersections and sizes) — a boilerplate phrase shared by all
    docs must not pair otherwise-unrelated documents."""
    from png_from_pdf_extracter_ray.stages.neardup import ngram_jaccard_pairs

    boiler = "all rights reserved by the company"
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"alpha beta gamma delta epsilon {boiler}",
            f"zeta eta theta iota kappa {boiler}",
            f"lambda mu nu xi omicron {boiler}",
            f"pi rho sigma tau upsilon {boiler}",
        ],
    }
    ds = rd.from_arrow(pa.Table.from_pydict(rows))
    uncapped = ngram_jaccard_pairs(ds, threshold=0.1)
    assert len(uncapped) == 6  # every pair shares the boilerplate shingles
    capped = ngram_jaccard_pairs(ds, threshold=0.1, max_df=3)
    assert len(capped) == 0  # boilerplate (df=4) dropped; nothing else shared


def test_ngram_containment_detects_doc_in_doc(ray_session) -> None:  # noqa: ANN001
    """A short doc quoted whole inside a long one: containment ≈ 1.0
    while Jaccard (diluted by the long side's union) stays below any
    useful threshold — the metric split the operator exists for."""
    from png_from_pdf_extracter_ray.stages.neardup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"tok{i}" for i in range(60))
    rows = {
        "doc_id": [1, 2, 3],
        "text": [short, f"{filler} {short}", "zeta eta theta iota kappa"],
    }
    ds = rd.from_arrow(pa.Table.from_pydict(rows))

    cont = ngram_jaccard_pairs(ds, threshold=0.9, metric="containment")
    assert list(cont.columns) == ["id_a", "id_b", "containment"]
    assert len(cont) == 1
    assert (cont.iloc[0]["id_a"], cont.iloc[0]["id_b"]) == (1, 2)
    assert cont.iloc[0]["containment"] == 1.0  # every shingle of 1 is in 2

    jac = ngram_jaccard_pairs(ds, threshold=0.2, metric="jaccard")
    assert len(jac) == 0  # Jaccard for (1,2) is 3/63 ≈ 0.05 — invisible

    import pytest

    with pytest.raises(ValueError, match="unknown metric"):
        ngram_jaccard_pairs(ds, metric="dice")


def test_embedding_lsh_bucket_verify_equals_join_verify(ray_session, sf_dir) -> None:  # noqa: ANN001
    """The two verification strategies are pure execution-plan choices —
    identical pair sets and cosines on the same input/params."""
    import os

    import pandas as pd
    import ray.data as rd

    from png_from_pdf_extracter_ray.stages.neardup import embedding_near_dup_pairs_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    kw = dict(threshold=0.4, n_planes=4, n_tables=8)
    join = embedding_near_dup_pairs_lsh(ds, verify="join", **kw)
    bucket = embedding_near_dup_pairs_lsh(ds, verify="bucket", **kw)
    pd.testing.assert_frame_equal(
        join.reset_index(drop=True), bucket.reset_index(drop=True), check_dtype=False
    )
    # and with the dense-group cap active (the capped bucket path takes
    # the verify-then-global-distinct route instead of first-collision)
    join_c = embedding_near_dup_pairs_lsh(ds, verify="join", max_sig_group=64, **kw)
    bucket_c = embedding_near_dup_pairs_lsh(ds, verify="bucket", max_sig_group=64, **kw)
    pd.testing.assert_frame_equal(
        join_c.reset_index(drop=True), bucket_c.reset_index(drop=True), check_dtype=False
    )
