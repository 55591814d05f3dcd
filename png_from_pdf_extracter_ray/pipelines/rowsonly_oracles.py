"""Single-process, no-Ray oracles for the deterministic sketch/LSH
query family — upgrades to SQL-checked what was previously rows-only.

Each writer recomputes a query's full result with plain numpy/pandas in
THIS process, sharing only the per-document kernels (hash families,
signatures, fingerprints) with the distributed path, and commits a
parquet via atomic rename for DuckDB's ``read_parquet``.  Candidate
generation, dedup, components and verification are re-derived here with
flat pandas merges / a driver union-find — deliberately NOT the Ray
composition — so any distribution bug (bucketing, shuffles, joins,
broadcast semi-filters, label propagation, lost or duplicated blocks)
makes the engine output diverge from these parquets.  Same pattern as
the flagship extraction oracle (pipelines/summary.py).

Only BATCH-INVARIANT queries qualify: their output is a deterministic
set regardless of how Ray partitions the input (per-doc signatures +
exact key-equality candidates + per-pair verification).  The
grid-quantile / percentile-rank sketches summarize per BATCH, so their
output depends on block boundaries — those stay rows-only by nature.
(IVF ANN qualified once its quantizer sample moved to the deterministic
hash-threshold sample; top-k entries qualify because batch prune and
global sort share one total order, (rounded cos desc, id asc).)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.similarity import _ids_np, _stack

ORACLE_ROOT = "/tmp/graft_rowsonly_oracles"


def _oracle_path(sf_dir: str, name: str, expand: int = 2) -> str:
    """Versioned, abs-path-keyed cache path (the extraction-cache
    protocol: two corpora sharing a leaf dir name must not share an
    entry, and any engine-behavior change invalidates via __version__)."""
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    tag = f"{h}_x{expand}_v{CORPUS_VERSION}_e{ENGINE_VERSION}"
    return os.path.join(ORACLE_ROOT, f"{name}_{tag}.parquet")


def _commit(table: pa.Table, path: str) -> str:
    """Atomic write: process-unique tmp + one rename (no torn reads for
    a concurrent DuckDB, losing writer's rename just overwrites with
    identical deterministic content)."""
    os.makedirs(ORACLE_ROOT, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def _from_pandas(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


# ---------------------------------------------------------------------------
# MinHash pairs + components (over the unique-pages corpus)
# ---------------------------------------------------------------------------


def _union_find_min_labels(pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components of (id_a, id_b) with label = min member —
    a driver union-find, deliberately unlike the engine's distributed
    min-label propagation (stages/neardup.min_label_components)."""
    parent: dict = {}

    def find(x):  # noqa: ANN001, ANN202
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {x: find(x) for x in parent}
    # find() with union-by-min roots already yields the component min
    out = pd.DataFrame({"url": list(labels), "group_id": list(labels.values())})
    return out.sort_values("url", ignore_index=True)


def write_minhash_oracles(
    sf_dir: str, threshold: float = 0.8, k_shingle: int = 3, expand: int = 2
) -> tuple[str, str]:
    """Pairs + groups oracles for ``minhash_near_dups`` /
    ``minhash_dedup_groups`` (engine path: pipelines/textops.py)."""
    from ..stages.neardup import MinHasher, _jaccard_from_hashes, _token_hashes
    from .summary import oracle_unique_pages

    pairs_path = _oracle_path(sf_dir, "minhash_pairs", expand)
    groups_path = _oracle_path(sf_dir, "minhash_groups", expand)
    if os.path.exists(pairs_path) and os.path.exists(groups_path):
        return pairs_path, groups_path

    pages = oracle_unique_pages(sf_dir, expand=expand)
    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()

    # band rows via the engine's own per-doc signature kernel (shared by
    # necessity: the hash family IS the contract), candidates via one
    # flat self-merge — no bucketing, no shuffle
    bands = (
        MinHasher(id_col="url", text_col="text")(pages.select(["url", "text"]))
        .select(["url", "band_id", "band_hash"])  # drop all_bands: the
        # flat merge needs only the keys, and the 16-int64 arrays would
        # be copied into every candidate row
        .to_pandas()
    )
    m = bands.merge(bands, on=["band_id", "band_hash"])
    m = m[m["url_x"] < m["url_y"]]
    cand = m[["url_x", "url_y"]].drop_duplicates()

    text_of = dict(zip(urls, texts))
    memo: dict = {}

    def hashes(u):  # noqa: ANN001, ANN202
        h = memo.get(u)
        if h is None:
            h = _token_hashes(text_of[u] or "", k_shingle)
            memo[u] = h
        return h

    ia, ib, ja = [], [], []
    for a, b in zip(cand["url_x"], cand["url_y"]):
        j = _jaccard_from_hashes(hashes(a), hashes(b))
        if j >= threshold:
            ia.append(a)
            ib.append(b)
            ja.append(round(j, 4))
    pairs = pd.DataFrame({"id_a": ia, "id_b": ib, "jaccard": ja})
    _commit(
        _from_pandas(
            pairs,
            pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()), ("jaccard", pa.float64())]
            ),
        ),
        pairs_path,
    )
    _commit(
        _from_pandas(
            _union_find_min_labels(pairs),
            pa.schema([("url", pa.string()), ("group_id", pa.string())]),
        ),
        groups_path,
    )
    return pairs_path, groups_path


# ---------------------------------------------------------------------------
# SimHash pairs
# ---------------------------------------------------------------------------


def write_simhash_oracle(
    sf_dir: str, max_hamming: int = 3, expand: int = 2
) -> str:
    """Oracle for ``simhash_near_dups``: 16-bit block probing + exact
    hamming, one flat merge instead of the engine's bucketed shuffle."""
    from ..stages.neardup import _popcount64, _simhash_batch
    from .summary import oracle_unique_pages

    path = _oracle_path(sf_dir, "simhash_pairs", expand)
    if os.path.exists(path):
        return path

    pages = oracle_unique_pages(sf_dir, expand=expand)
    urls = np.asarray(pages["url"].to_pylist(), dtype=object)
    sigs = _simhash_batch(pages["text"].to_pylist())  # uint64, per-doc kernel
    n = len(urls)
    rows = pd.DataFrame(
        {
            "url": np.repeat(urls, 4),
            "block": np.tile(np.arange(4, dtype=np.int32), n),
            "block_key": (
                (sigs[:, None] >> (16 * np.arange(4, dtype=np.uint64))[None, :])
                & np.uint64(0xFFFF)
            )
            .astype(np.int32)
            .ravel(),
            "sig": np.repeat(sigs.view(np.int64), 4),
        }
    )
    m = rows.merge(rows, on=["block", "block_key"])
    m = m[m["url_x"] < m["url_y"]]
    out = pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    if not m.empty:
        d = _popcount64(
            np.bitwise_xor(
                m["sig_x"].to_numpy(dtype=np.int64).view(np.uint64),
                m["sig_y"].to_numpy(dtype=np.int64).view(np.uint64),
            )
        )
        out = pd.DataFrame(
            {"id_a": m["url_x"].to_numpy(), "id_b": m["url_y"].to_numpy(), "hamming": d}
        )
        out = out[out["hamming"] <= max_hamming].drop_duplicates(subset=["id_a", "id_b"])
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()), ("hamming", pa.int32())]
            ),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# Rolling fingerprints (per-doc transform — oracle is the same kernel,
# single-process, which pins the DISTRIBUTED run's row coverage)
# ---------------------------------------------------------------------------


def write_rolling_fp_oracle(sf_dir: str) -> str:
    from ..stages.text_stats import RollingFingerprint

    path = _oracle_path(sf_dir, "rolling_fp")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return _commit(
        RollingFingerprint()(docs).select(["doc_id", "rolling_fp"]), path
    )


# ---------------------------------------------------------------------------
# HyperLogLog count-distinct (register merge is an elementwise max —
# order-independent, so the single-process registers equal any
# partitioning's merged registers exactly)
# ---------------------------------------------------------------------------


def write_hll_oracle(sf_dir: str) -> str:
    from ..stages.sketch import hll_estimate, hll_partial

    path = _oracle_path(sf_dir, "hll_users")
    if os.path.exists(path):
        return path
    ev = (
        pq.read_table(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
        )
        .to_pandas()
    )
    keys, ests = [], []
    for key, vals in ev.groupby("event_type", sort=True)["user_id"]:
        keys.append(key)
        ests.append(hll_estimate(hll_partial(vals.to_numpy())))
    return _commit(
        _from_pandas(
            pd.DataFrame({"event_type": keys, "n_distinct_est": ests}),
            pa.schema([("event_type", pa.string()), ("n_distinct_est", pa.int64())]),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# SRP-LSH embedding near-dup pairs (candidates from deterministic
# hyperplane signatures; exact float32 cosine verify — both recomputed
# flat here)
# ---------------------------------------------------------------------------


def _lsh_pairs_singleproc(
    ids: np.ndarray,
    mat: np.ndarray,
    threshold: float,
    n_planes: int,
    n_tables: int,
    seed: int = 42,
) -> pd.DataFrame:
    """Mirror of stages/neardup.embedding_near_dup_pairs_lsh semantics:
    same planes, same signature packing, same float32 cosine and
    rounding — with flat pandas candidate generation."""
    from ..stages.similarity import srp_planes

    n, dim = mat.shape
    planes = srp_planes(dim, n_tables * n_planes, seed)
    bits = (mat @ planes.T) >= 0
    weights = 1 << np.arange(n_planes, dtype=np.uint64)
    sigs = (
        bits.reshape(n, n_tables, n_planes).astype(np.uint64) @ weights
    ).astype(np.int64)
    rows = pd.DataFrame(
        {
            "id": np.repeat(ids, n_tables),
            "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
            "sig": sigs.ravel(),
        }
    )
    m = rows.merge(rows, on=["table", "sig"])
    m = m[m["id_x"] < m["id_y"]]
    cand = m[["id_x", "id_y"]].drop_duplicates()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
    pos = {int(v): i for i, v in enumerate(ids)}
    va = mat[cand["id_x"].map(pos).to_numpy()]
    vb = mat[cand["id_y"].map(pos).to_numpy()]
    na = np.linalg.norm(va, axis=1)
    nb = np.linalg.norm(vb, axis=1)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
    keep = cos >= threshold
    return pd.DataFrame(
        {
            "id_a": cand["id_x"].to_numpy()[keep],
            "id_b": cand["id_y"].to_numpy()[keep],
            "cos": np.round(cos[keep].astype(np.float64), 3),
        }
    )


_PAIR_SCHEMA_I64 = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos", pa.float64())]
)


def write_embedding_lsh_oracle(sf_dir: str, threshold: float = 0.4) -> str:
    """Oracle for ``embedding_near_dups_lsh`` (adaptive plane/table
    count from the threshold, stages/similarity.srp_lsh_params)."""
    from ..stages.similarity import srp_lsh_params

    path = _oracle_path(sf_dir, "embedding_lsh_pairs")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    k, tables = srp_lsh_params(threshold)
    out = _lsh_pairs_singleproc(ids, mat, threshold, k, tables)
    return _commit(_from_pandas(out, _PAIR_SCHEMA_I64), path)


def write_text_embedding_lsh_oracle(sf_dir: str, threshold: float = 0.9) -> str:
    """Oracle for ``text_embedding_near_dups``: the engine's own
    embedder (single-process — already pinned bit-level by the
    embedding digest oracle) feeding the adaptive-parameter LSH pair
    path (same ``srp_lsh_params`` derivation as the engine)."""
    from ..stages.embed import TextEmbedder
    from ..stages.similarity import srp_lsh_params

    path = _oracle_path(sf_dir, "text_embedding_lsh_pairs")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    emb = TextEmbedder()(docs)
    ids = _ids_np(emb["doc_id"])
    mat = _stack(emb["embedding"])
    k, tables = srp_lsh_params(threshold)
    out = _lsh_pairs_singleproc(ids, mat, threshold, n_planes=k, n_tables=tables)
    return _commit(_from_pandas(out, _PAIR_SCHEMA_I64), path)


def write_ivf_topk_oracle(
    sf_dir: str, k: int = 10, n_cells: int = 16, nprobe: int = 4
) -> str:
    """Oracle for ``similarity_topk_ivf``: same deterministic quantizer
    sample (hash-threshold, id-sorted), same Lloyd k-means, same probe
    and scoring ops, recomputed flat."""
    from ..stages.semdedup import flat_hash_sample
    from ..stages.similarity import kmeans_centroids, load_query_vector

    path = _oracle_path(sf_dir, "ivf_topk")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    sample = flat_hash_sample(ids, mat, 2048)
    cent = kmeans_centroids(sample, n_cells=n_cells)

    q = load_query_vector(sf_dir, 0)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(cent @ qn))[:nprobe].tolist())
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    cells = np.argmax(unit @ cent.T, axis=1)
    m = np.isin(cells, list(probe))
    cos = np.round((unit[m] @ qn).astype(np.float64), 3)
    out = (
        pd.DataFrame({"vec_id": ids[m], "cos": cos})
        .sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
    )
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("cos", pa.float64())])),
        path,
    )


def write_semantic_dedup_oracle(sf_dir: str, threshold: float = 0.4) -> str:
    """Oracle for ``semantic_dedup_embeddings``: the flat recompute in
    stages/semdedup.semantic_dedup_singleproc (same hash-threshold
    sample, quantizer and greedy rule — no Ray)."""
    from ..stages.semdedup import semantic_dedup_singleproc

    path = _oracle_path(sf_dir, "semantic_dedup")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    out = semantic_dedup_singleproc(ids, mat, threshold=threshold)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("cluster", pa.int64()),
                    ("keep", pa.bool_()),
                    ("dup_of", pa.int64()),
                ]
            ),
        ),
        path,
    )


def write_keep_best_oracle(sf_dir: str, threshold: float = 0.8, expand: int = 2) -> str:
    """Oracle for ``minhash_dedup_keep_best``: union-find groups (the
    minhash pairs oracle) + raw text lengths + a flat pandas argmax
    (longest text, tie → min url)."""
    from .summary import oracle_unique_pages

    path = _oracle_path(sf_dir, "minhash_keep_best", expand)
    if os.path.exists(path):
        return path
    pairs_path, groups_path = write_minhash_oracles(
        sf_dir, threshold=threshold, expand=expand
    )
    groups = pq.read_table(groups_path).to_pandas()
    pages = oracle_unique_pages(sf_dir, expand=expand)
    lens = pd.DataFrame(
        {
            "url": pages["url"].to_pylist(),
            "text_len": [len(t or "") for t in pages["text"].to_pylist()],
        }
    )
    merged = groups.merge(lens, on="url", how="left")
    merged["text_len"] = merged["text_len"].fillna(0).astype("int64")
    merged = merged.sort_values(
        ["group_id", "text_len", "url"], ascending=[True, False, True]
    )
    winner = merged.groupby("group_id", sort=False)["url"].transform("first")
    out = merged.assign(keep=(merged["url"] == winner))[
        ["url", "group_id", "text_len", "keep"]
    ].sort_values("url", ignore_index=True)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("url", pa.string()),
                    ("group_id", pa.string()),
                    ("text_len", pa.int64()),
                    ("keep", pa.bool_()),
                ]
            ),
        ),
        path,
    )


def write_pack_bins_oracle(sf_dir: str) -> str:
    """Oracle for ``pack_documents_greedy``: the same shard hash, sort
    order, and first-fit greedy recomputed flat over the whole
    documents table (no Ray)."""
    from ..stages.text_stats import token_count_batch
    from .textops import PACK_CAPACITY, PACK_SHARDS

    path = _oracle_path(sf_dir, "pack_bins")
    if os.path.exists(path):
        return path
    df = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .to_pandas()
    )
    df = token_count_batch(df)
    df["shard"] = (pd.util.hash_array(df["doc_id"].to_numpy()) % PACK_SHARDS).astype(
        "int64"
    )
    frames = []
    for shard, g in df.groupby("shard", sort=True):
        g = g.sort_values("doc_id", ignore_index=True)
        n = g["n_tokens"].to_numpy()
        bins = np.zeros(len(g), dtype=np.int64)
        bin_id, fill = 0, 0
        for i, t in enumerate(n):
            if fill > 0 and fill + t > PACK_CAPACITY:
                bin_id += 1
                fill = 0
            bins[i] = bin_id
            fill += int(t)
        frames.append(g.assign(bin_id=bins)[["doc_id", "shard", "bin_id", "n_tokens"]])
    out = pd.concat(frames, ignore_index=True).sort_values("doc_id", ignore_index=True)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("shard", pa.int64()),
                    ("bin_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                ]
            ),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# SRP-LSH ANN top-k (single bucket probe of a deterministic signature)
# ---------------------------------------------------------------------------


def write_similarity_lsh_oracle(
    sf_dir: str, k: int = 10, n_planes: int = 6, seed: int = 42
) -> str:
    """Oracle for ``similarity_topk_lsh``: candidates = rows whose SRP
    signature equals the query's; ranking by (rounded cos desc, id asc).
    The engine's per-batch prune uses the SAME total order as its final
    global sort and as this flat ranking — (rounded cos desc, id asc),
    stages/similarity.BucketScorer — so all three agree at every scale,
    rounding ties included."""
    from ..stages.similarity import load_query_vector, srp_planes, srp_signature

    path = _oracle_path(sf_dir, "similarity_lsh_topk")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    q = load_query_vector(sf_dir, 0)
    planes = srp_planes(mat.shape[1], n_planes, seed)
    qsig = int(srp_signature(q[None, :], planes)[0])
    qn = q / (np.linalg.norm(q) or 1.0)
    mask = srp_signature(mat, planes) == qsig
    sub, sids = mat[mask], ids[mask]
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    cos = np.round(((sub @ qn) / norms).astype(np.float64), 3)
    out = (
        pd.DataFrame({"vec_id": sids, "cos": cos})
        .sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(k)
    )
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("cos", pa.float64())])),
        path,
    )


# One single-process extraction per (sf_dir, expand) per PROCESS: the
# phash-pairs and jpeg-roundtrip oracles (and anything added later) all
# start from the same deterministic extraction — recomputing it per
# writer tripled the one-time oracle cost when a version bump
# invalidates every parquet at once.
_EXTRACT_MEMO: dict = {}


def _oracle_extracted(sf_dir: str, expand: int = 2) -> dict:
    from ..stages.extract_stage import oracle_extract_table
    from ..stages.multimodal import explode_pages
    from .summary import oracle_unique_pages

    key = (os.path.abspath(sf_dir), expand)
    entry = _EXTRACT_MEMO.get(key)
    if entry is None:
        extracted = oracle_extract_table(oracle_unique_pages(sf_dir, expand=expand))
        entry = {
            "extracted": extracted,
            "exploded": explode_pages(extracted.select(["url", "pages"])),
        }
        _EXTRACT_MEMO.clear()  # bound: one corpus at a time
        _EXTRACT_MEMO[key] = entry
    return entry


def _oracle_exploded_pages(sf_dir: str, expand: int = 2) -> pa.Table:
    return _oracle_extracted(sf_dir, expand)["exploded"]


def write_extracted_text_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat (url, extracted_text) parquet — the INPUT the paragraph-dedup
    oracle SQL runs its independent DuckDB window-function dedup over.
    The extraction kernel is necessarily shared (single-implementation
    rule — the extracted text IS the contract); the paragraph split /
    first-occurrence winner / reassembly logic under test is implemented
    independently on each side."""
    path = _oracle_path(sf_dir, "extracted_text", expand)
    if os.path.exists(path):
        return path
    t = _oracle_extracted(sf_dir, expand)["extracted"].select(
        ["url", "extracted_text"]
    )
    return _commit(t, path)


def write_title_index_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat (url, title, status, content_type) parquet from the
    single-process extraction — the no-Ray twin the title-index entry's
    declarative filter/projection SQL runs over (same protocol as
    write_extracted_text_oracle; the title-selection logic across
    multipart payloads, kernel/extract.py, is what the distributed run
    must reproduce per url)."""
    path = _oracle_path(sf_dir, "title_index", expand)
    if os.path.exists(path):
        return path
    t = _oracle_extracted(sf_dir, expand)["extracted"].select(
        ["url", "title", "status", "content_type"]
    )
    return _commit(t, path)


# ---------------------------------------------------------------------------
# Perceptual-hash page near-dups (brute-force hamming over every pair)
# ---------------------------------------------------------------------------


def write_pages_phash_oracle(sf_dir: str, max_hamming: int = 3, expand: int = 2) -> str:
    """Oracle for ``pages_phash_near_dups``: single-process extraction →
    the engine's own pHash kernel per page (decode + hash shared by
    necessity — the hash IS the contract) → BRUTE-FORCE hamming over
    every page pair, deliberately unlike the engine's block-probing +
    bucketed self-merge.  Block probing is exact for max_hamming ≤ 3
    (pigeonhole over 4 disjoint 16-bit blocks), so the two sets must be
    identical; any bucketing/shuffle/dedup bug diverges."""
    from ..stages.multimodal import PagePHasher

    path = _oracle_path(sf_dir, "pages_phash_pairs", expand)
    if os.path.exists(path):
        return path
    sig_t = PagePHasher()(_oracle_exploded_pages(sf_dir, expand))
    ids = np.asarray(sig_t["page_id"].to_pylist(), dtype=object)
    sh = sig_t["phash"].to_numpy().astype(np.int64).view(np.uint64)
    n = len(sh)
    ia: list = []
    ib: list = []
    hm: list = []
    chunk = 128  # bounds the (chunk × n × 64)-byte unpackbits matrix
    for s in range(0, n, chunk):
        x = sh[s : s + chunk]
        xor = x[:, None] ^ sh[None, :]
        d = (
            np.unpackbits(xor.view(np.uint8).reshape(len(x), n, 8), axis=2)
            .sum(axis=2, dtype=np.int32)
        )
        r, c = np.nonzero(d <= max_hamming)
        a, b = ids[s + r], ids[c]
        m = a < b
        ia.extend(a[m])
        ib.extend(b[m])
        hm.extend(d[r[m], c[m]])
    out = pd.DataFrame(
        {"id_a": ia, "id_b": ib, "hamming": np.asarray(hm, dtype=np.int32)}
    ).sort_values(["id_a", "id_b"], ignore_index=True)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()), ("hamming", pa.int32())]
            ),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# Cross-document exact-substring dedup (flat recompute)
# ---------------------------------------------------------------------------


def write_cross_doc_spans_oracle(sf_dir: str, span_k: int | None = None) -> str:
    """Oracle for ``cross_doc_duplicate_spans``: one flat pass over the
    whole documents table — span hashes via the shared marking-pass
    kernel, df + ownership via plain pandas transforms (no bucketing,
    no shuffle, no join), removal via the shared per-doc scrub kernel.
    Any bug in the engine's bucketed df count, doc re-bucketing,
    list-aggregation, or left join diverges from this parquet."""
    from .data_quality import (
        _WS,
        DUP_SPAN_K,
        _batch_span_rows,
        _scrub_doc_tokens,
    )

    k = DUP_SPAN_K if span_k is None else span_k
    path = _oracle_path(sf_dir, "cross_doc_spans")
    if os.path.exists(path):
        return path
    docs = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    ids, hs = _batch_span_rows(docs, k)
    df = pd.DataFrame({"doc_id": ids, "h": hs})
    grp = df.groupby("h")["doc_id"]
    dfreq = grp.transform("size").to_numpy()
    owner = grp.transform("min").to_numpy()
    drop = df[(dfreq >= 2) & (df["doc_id"].to_numpy() != owner)]
    drop_map = {
        int(d): g["h"].to_numpy(dtype=np.int64) for d, g in drop.groupby("doc_id")
    }
    n_tok = np.zeros(len(docs), dtype=np.int64)
    n_rem = np.zeros(len(docs), dtype=np.int64)
    cleaned: list[str] = []
    for i, (doc_id, text) in enumerate(zip(docs["doc_id"], docs["text"])):
        s = (text or "").strip().lower()
        toks = np.asarray(_WS.split(s) if s else [], dtype=object)
        n_tok[i] = len(toks)
        kept, removed = _scrub_doc_tokens(toks, drop_map.get(int(doc_id)), k)
        n_rem[i] = removed
        cleaned.append(" ".join(kept))
    out = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].to_numpy(dtype=np.int64),
            "n_tokens": n_tok,
            "n_removed": n_rem,
            "text_clean": cleaned,
        }
    )
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("n_removed", pa.int64()),
                    ("text_clean", pa.string()),
                ]
            ),
        ),
        path,
    )


def write_pages_phash_groups_oracle(sf_dir: str, expand: int = 2) -> str:
    """Oracle for ``pages_phash_dedup_groups``: a driver union-find over
    the brute-force pair oracle — deliberately the opposite architecture
    of the engine's distributed min-label propagation."""
    path = _oracle_path(sf_dir, "pages_phash_groups", expand)
    if os.path.exists(path):
        return path
    pairs = pq.read_table(write_pages_phash_oracle(sf_dir, expand=expand)).to_pandas()
    out = _union_find_min_labels(pairs).rename(columns={"url": "page_id"})
    return _commit(
        _from_pandas(
            out, pa.schema([("page_id", pa.string()), ("group_id", pa.string())])
        ),
        path,
    )


def write_jpeg_roundtrip_oracle(
    sf_dir: str, quality: int = 85, expand: int = 2, progressive: bool = False
) -> str:
    """Oracle for ``pages_jpeg_roundtrip`` (and, with
    ``progressive=True``, ``pages_jpeg_progressive_roundtrip``):
    single-process extraction → resize → the SAME JpegRoundtrip kernel
    (the per-page codec IS the contract — kernel/jpeg.py is
    deterministic), no Ray anywhere."""
    from ..stages.multimodal import JpegRoundtrip, PngResizer

    name = "jpeg_prog_roundtrip" if progressive else "jpeg_roundtrip"
    path = _oracle_path(sf_dir, name, expand)
    if os.path.exists(path):
        return path
    resized = PngResizer(target_w=480, target_h=270)(
        _oracle_exploded_pages(sf_dir, expand)
    )
    return _commit(
        JpegRoundtrip(quality=quality, progressive=progressive)(resized), path
    )


def write_webp_roundtrip_oracle(sf_dir: str, expand: int = 2) -> str:
    """Oracle for ``pages_webp_roundtrip``: single-process extraction →
    resize → the SAME WebpRoundtrip kernel (kernel/webp.py is
    deterministic; VP8L is lossless so dec_md5 pins the decoder
    bit-for-bit), no Ray anywhere."""
    from ..stages.multimodal import PngResizer, WebpRoundtrip

    path = _oracle_path(sf_dir, "webp_roundtrip", expand)
    if os.path.exists(path):
        return path
    resized = PngResizer(target_w=480, target_h=270)(
        _oracle_exploded_pages(sf_dir, expand)
    )
    return _commit(WebpRoundtrip()(resized), path)


def write_vp8_roundtrip_oracle(sf_dir: str, expand: int = 2) -> str:
    """Oracle for ``pages_vp8_roundtrip``: single-process extraction →
    96×54 resize → the SAME Vp8Roundtrip kernel (kernel/vp8.py is
    deterministic in both directions, so dec_md5 pins encoder+decoder
    bit-for-bit despite the codec being lossy), no Ray anywhere."""
    from ..stages.multimodal import PngResizer, Vp8Roundtrip

    path = _oracle_path(sf_dir, "vp8_roundtrip", expand)
    if os.path.exists(path):
        return path
    resized = PngResizer(target_w=96, target_h=54)(
        _oracle_exploded_pages(sf_dir, expand)
    )
    return _commit(Vp8Roundtrip()(resized), path)


# ---------------------------------------------------------------------------
# ML-operator family (stages/ml.py, stages/pq.py, pipelines/tokenizer.py)
# ---------------------------------------------------------------------------


def write_kmeans_oracle(sf_dir: str, k: int = 8, iters: int = 4) -> str:
    """Oracle for ``kmeans_doc_clusters``: the flat twin in stages/ml.py
    (same deterministic sample init, same INTEGER assignment and
    centroid sums, so equality is by construction, not luck)."""
    from ..pipelines.mlops import KMEANS_SAMPLE
    from ..stages.ml import kmeans_fit_flat, kmeans_labels_flat

    path = _oracle_path(sf_dir, "kmeans_clusters")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    cent = kmeans_fit_flat(ids, mat, k=k, iters=iters, target_sample=KMEANS_SAMPLE)
    out = kmeans_labels_flat(ids, mat, cent)
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])),
        path,
    )


def write_kmeans_outlier_oracle(sf_dir: str, k: int = 8, iters: int = 4, k_out: int = 50) -> str:
    """Oracle for ``embedding_outlier_scores``: same flat k-means fit as
    the cluster oracle, then the flat exact-int outlier scan."""
    from ..pipelines.mlops import KMEANS_SAMPLE
    from ..stages.ml import kmeans_fit_flat, kmeans_outlier_scores_flat

    path = _oracle_path(sf_dir, "kmeans_outliers")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    cent = kmeans_fit_flat(ids, mat, k=k, iters=iters, target_sample=KMEANS_SAMPLE)
    out = kmeans_outlier_scores_flat(ids, mat, cent, k_out=k_out)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [("vec_id", pa.int64()), ("cluster", pa.int64()), ("sim_q", pa.int64())]
            ),
        ),
        path,
    )


def write_sq8_digest_oracle(sf_dir: str) -> str:
    """Oracle for ``embedding_sq8_digest``: flat per-dimension bounds +
    the same elementwise quantize kernel + per-vector md5 (no
    accumulation anywhere, so equality is by construction)."""
    import hashlib

    from ..pipelines.mlops import sq8_quantize

    path = _oracle_path(sf_dir, "sq8_digest")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    q = sq8_quantize(mat, mat.min(axis=0), mat.max(axis=0))
    md5s = [hashlib.md5(row.tobytes()).hexdigest() for row in q]
    out = pd.DataFrame({"vec_id": ids, "q_md5": md5s}).sort_values(
        "vec_id", ignore_index=True
    )
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("q_md5", pa.string())])),
        path,
    )


def write_pq_topk_oracle(sf_dir: str, k: int = 10) -> str:
    """Oracle for ``similarity_topk_pq``: same sample, same driver-side
    codebooks, flat integer encode + ADC recompute."""
    from ..pipelines.mlops import PQ_KS, PQ_M, PQ_SAMPLE
    from ..stages.ml import _unit_rows
    from ..stages.pq import pq_topk_flat, pq_train
    from ..stages.semdedup import flat_hash_sample
    from ..stages.similarity import load_query_vector

    path = _oracle_path(sf_dir, "pq_topk")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    sample = flat_hash_sample(ids, mat, PQ_SAMPLE)
    books = pq_train(_unit_rows(sample), m=PQ_M, ks=PQ_KS)
    out = pq_topk_flat(ids, mat, load_query_vector(sf_dir, 0), books, k=k)
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("score", pa.float64())])),
        path,
    )


def write_ridge_oracle(sf_dir: str) -> str:
    """Oracle for ``ridge_quality_model``: flat integer normal equations
    + the same 5×5 solve and rounded predictions (stages/ml.ridge_flat)."""
    from ..stages.ml import ridge_flat

    path = _oracle_path(sf_dir, "ridge_model")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    ).to_pandas()
    _, out = ridge_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_chars", pa.int64()),
                    ("y_hat", pa.float64()),
                    ("resid", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_bpe_oracle(sf_dir: str) -> str:
    """Oracle for ``bpe_train_merges``: flat word-frequency table (same
    tokenization partials, same cap order) → the same driver merge loop."""
    from ..pipelines.tokenizer import bpe_train_flat

    path = _oracle_path(sf_dir, "bpe_merges")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).to_pandas()
    out = bpe_train_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("merge_rank", pa.int64()),
                    ("left_sym", pa.string()),
                    ("right_sym", pa.string()),
                    ("freq", pa.int64()),
                ]
            ),
        ),
        path,
    )


def write_cms_oracle(sf_dir: str, k: int = 50) -> str:
    """Oracle for ``heavy_hitters_cms``: flat token totals → one flat
    CMS build (integer adds — identical to the distributed fold by
    construction) → same top-k and point queries."""
    from ..pipelines.corpus_stats import _token_partials
    from ..stages.sketch import cms_partial, cms_query

    path = _oracle_path(sf_dir, "cms_heavy_hitters")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).to_pandas()
    parts = _token_partials(df, distinct_per_doc=False)
    totals = parts.groupby("token", as_index=False, sort=False)["n"].sum()
    sk = cms_partial(
        totals["token"].to_numpy(dtype=object), totals["n"].to_numpy(np.int64)
    )
    top = totals.sort_values(["n", "token"], ascending=[False, True]).head(k)
    est = cms_query(sk, top["token"].to_numpy(dtype=object))
    out = pd.DataFrame(
        {
            "token": top["token"].to_numpy(dtype=object),
            "n_true": top["n"].to_numpy(np.int64),
            "n_est": est,
        }
    )
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [("token", pa.string()), ("n_true", pa.int64()), ("n_est", pa.int64())]
            ),
        ),
        path,
    )


def write_bpe_encode_oracle(sf_dir: str) -> str:
    """Oracle for ``bpe_encode_docs``: flat train + flat encode
    (pipelines/tokenizer.bpe_encode_flat — same merges, same loop)."""
    from ..pipelines.tokenizer import bpe_encode_flat

    path = _oracle_path(sf_dir, "bpe_encode")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    out = bpe_encode_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_bpe_tokens", pa.int64()),
                    ("bpe_ratio", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_pca_oracle(sf_dir: str, p: int = 4) -> str:
    """Oracle for ``pca_doc_projections``: flat integer moments → the
    same eigh + canonical sign + rounded projections (stages/ml.pca_flat)."""
    from ..stages.ml import pca_flat

    path = _oracle_path(sf_dir, "pca_projections")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    out = pca_flat(ids, mat, p=p)
    schema = pa.schema(
        [("vec_id", pa.int64())] + [(f"pc{i}", pa.float64()) for i in range(p)]
    )
    return _commit(_from_pandas(out, schema), path)


def write_ivfpq_topk_oracle(sf_dir: str, k: int = 10, nprobe: int = 4) -> str:
    """Oracle for ``similarity_topk_ivfpq``: same sample → same coarse
    centroids + residual codebooks → flat integer assign/encode + ADC."""
    from ..pipelines.mlops import PQ_KS, PQ_M, PQ_SAMPLE
    from ..stages.ml import _unit_rows
    from ..stages.pq import ivfpq_topk_flat, ivfpq_train
    from ..stages.semdedup import flat_hash_sample
    from ..stages.similarity import load_query_vector

    path = _oracle_path(sf_dir, "ivfpq_topk")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = _ids_np(t["vec_id"])
    mat = _stack(t["embedding"])
    sample = flat_hash_sample(ids, mat, PQ_SAMPLE)
    cent, books = ivfpq_train(_unit_rows(sample), n_cells=16, m=PQ_M, ks=PQ_KS)
    out = ivfpq_topk_flat(
        ids, mat, load_query_vector(sf_dir, 0), cent, books, k=k, nprobe=nprobe
    )
    return _commit(
        _from_pandas(out, pa.schema([("vec_id", pa.int64()), ("score", pa.float64())])),
        path,
    )


def write_dsir_oracle(sf_dir: str) -> str:
    """Oracle for ``dsir_importance_weights``: flat recompute of the
    bucket distributions, log-ratio table and per-doc scores
    (pipelines/dsir.dsir_flat)."""
    from ..pipelines.dsir import dsir_flat

    path = _oracle_path(sf_dir, "dsir_weights")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    out = dsir_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("dsir_logratio", pa.float64()),
                    ("keep", pa.bool_()),
                ]
            ),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# Link-graph family (flat recompute of pipelines/linkgraph.py)
# ---------------------------------------------------------------------------

_LINKGRAPH_ORACLE_NAMES = (
    "links_digest",
    "link_outdeg_hist",
    "link_pagerank",
    "link_indeg_topk",
    "anchor_terms",
)


def _flat_doc_edges(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Flat (src, dst) doc-edge list over the deduped page universe —
    same parse kernel as stages/linkgraph.doc_edges, one in-memory pass."""
    from ..kernel.links import extract_links, src_doc_of_url
    from .summary import oracle_unique_pages

    pages = oracle_unique_pages(sf_dir, expand=expand)
    pair_src: list[int] = []
    pair_dst: list[int] = []
    for url, payload in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        s = src_doc_of_url(url)
        if s < 0:
            continue
        for link in extract_links(payload, url):
            d = link["dst_doc"]
            if d >= 0 and d != s:
                pair_src.append(s)
                pair_dst.append(d)
    return pd.DataFrame(
        {"src": pd.Series(pair_src, dtype="int64"), "dst": pd.Series(pair_dst, dtype="int64")}
    ).drop_duplicates(["src", "dst"], ignore_index=True)


def write_linkgraph_graph_oracles(sf_dir: str, expand: int = 2) -> dict[str, str]:
    """Flat oracles for the graph-algorithm queries: weakly-connected
    components (driver union-find — the engine runs distributed
    large/small-star, stages/linkgraph.star_components) and integer
    HITS (dense numpy twin, stages/linkgraph.hits_flat)."""
    from ..stages.linkgraph import hits_flat

    names = ("link_components", "link_hits")
    paths = {n: _oracle_path(sf_dir, n, expand) for n in names}
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    edges = _flat_doc_edges(sf_dir, expand=expand)

    comp = _union_find_min_labels(
        edges.rename(columns={"src": "id_a", "dst": "id_b"})
    ).rename(columns={"url": "node", "group_id": "component"})
    comp = comp.astype({"node": "int64", "component": "int64"}).sort_values(
        "node", ignore_index=True
    )
    _commit(
        _from_pandas(
            comp, pa.schema([("node", pa.int64()), ("component", pa.int64())])
        ),
        paths["link_components"],
    )

    ht = hits_flat(edges).sort_values("node", ignore_index=True)
    _commit(
        _from_pandas(
            ht,
            pa.schema(
                [("node", pa.int64()), ("hub", pa.int64()), ("auth", pa.int64())]
            ),
        ),
        paths["link_hits"],
    )
    return paths


def write_crawl_frontier_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat frontier oracle: distinct out-link hrefs (with reference
    counts) of the deduped page universe, minus the crawled url set of
    the RAW pages table (both sides recomputed flat, no Ray)."""
    import pyarrow.parquet as pq

    from ..corpus.synth import pages_from_documents_batch
    from ..kernel.links import extract_links
    from .summary import oracle_unique_pages

    path = _oracle_path(sf_dir, "crawl_frontier", expand)
    if os.path.exists(path):
        return path

    pages = oracle_unique_pages(sf_dir, expand=expand)
    counts: dict[str, int] = {}
    for url, payload in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        for link in extract_links(payload, url):
            counts[link["href"]] = counts.get(link["href"], 0) + 1
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    crawled = set(
        pages_from_documents_batch(docs, expand=expand)["url"].to_pylist()
    )
    out = (
        pd.DataFrame(
            {
                "href": [h for h in counts if h not in crawled],
                "n_refs": [n for h, n in counts.items() if h not in crawled],
            }
        )
        .astype({"n_refs": "int64"})
        .sort_values("href", ignore_index=True)
    )
    return _commit(
        _from_pandas(out, pa.schema([("href", pa.string()), ("n_refs", pa.int64())])),
        path,
    )


def write_linkgraph_oracles(sf_dir: str, expand: int = 2) -> dict[str, str]:
    """Flat single-process oracles for the five link-graph queries.

    Same parse kernel (kernel/links.py — the single-implementation
    rule), opposite architecture: one in-memory pass over the deduped
    page universe, dense numpy PageRank (stages/linkgraph.pagerank_flat)
    vs the engine's bucketed join/aggregate iterations.  Any bucketing,
    shuffle, dedup, or integer-arithmetic divergence breaks the match.
    """
    from ..kernel.links import extract_links, src_doc_of_url
    from ..stages.linkgraph import pagerank_flat
    from .linkgraph import (
        LINKS_DIGEST_COLS,
        TOP_ANCHOR_TERMS_K,
        TOP_INDEGREE_K,
        anchor_terms_tokens,
        links_digest_frame,
    )
    from .summary import oracle_unique_pages

    paths = {n: _oracle_path(sf_dir, n, expand) for n in _LINKGRAPH_ORACLE_NAMES}
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    pages = oracle_unique_pages(sf_dir, expand=expand)
    urls = pages["url"].to_pylist()
    payloads = pages["html"].to_pylist()

    link_cols: dict[str, list] = {
        "src_url": [], "href": [], "anchor": [], "is_internal": [], "dst_doc": []
    }
    out_degs: list[int] = []
    pair_src: list[int] = []
    pair_dst: list[int] = []
    for url, payload in zip(urls, payloads):
        links = extract_links(payload, url)
        out_degs.append(len(links))
        s = src_doc_of_url(url)
        for link in links:
            link_cols["src_url"].append(url)
            link_cols["href"].append(link["href"])
            link_cols["anchor"].append(link["anchor"])
            link_cols["is_internal"].append(1 if link["internal"] else 0)
            link_cols["dst_doc"].append(link["dst_doc"])
            d = link["dst_doc"]
            if s >= 0 and d >= 0 and d != s:
                pair_src.append(s)
                pair_dst.append(d)

    links_t = pa.Table.from_pydict(
        {
            "src_url": pa.array(link_cols["src_url"], pa.string()),
            "href": pa.array(link_cols["href"], pa.string()),
            "anchor": pa.array(link_cols["anchor"], pa.string()),
            "is_internal": pa.array(link_cols["is_internal"], pa.int8()),
            "dst_doc": pa.array(link_cols["dst_doc"], pa.int64()),
        }
    )

    digest = links_digest_frame(links_t)[LINKS_DIGEST_COLS]
    _commit(
        _from_pandas(
            digest,
            pa.schema([(c, pa.int64()) for c in LINKS_DIGEST_COLS]),
        ),
        paths["links_digest"],
    )

    hist = (
        pd.Series(out_degs, dtype="int64")
        .value_counts()
        .rename_axis("out_degree")
        .reset_index(name="n_pages")
        .sort_values("out_degree", ignore_index=True)
    )
    _commit(
        _from_pandas(
            hist, pa.schema([("out_degree", pa.int64()), ("n_pages", pa.int64())])
        ),
        paths["link_outdeg_hist"],
    )

    pr = pagerank_flat(
        pd.DataFrame({"src": pd.Series(pair_src, dtype="int64"),
                      "dst": pd.Series(pair_dst, dtype="int64")})
    ).sort_values("node", ignore_index=True)
    _commit(
        _from_pandas(
            pr, pa.schema([("node", pa.int64()), ("rank_micros", pa.int64())])
        ),
        paths["link_pagerank"],
    )

    dd = pd.Series(
        [d for d in link_cols["dst_doc"] if d >= 0], dtype="int64"
    )
    indeg = (
        dd.value_counts()
        .rename_axis("dst_doc")
        .reset_index(name="n_inlinks")
        .sort_values(["n_inlinks", "dst_doc"], ascending=[False, True])
        .head(TOP_INDEGREE_K)
        .reset_index(drop=True)
    )
    _commit(
        _from_pandas(
            indeg, pa.schema([("dst_doc", pa.int64()), ("n_inlinks", pa.int64())])
        ),
        paths["link_indeg_topk"],
    )

    counts: dict[str, int] = {}
    for a in link_cols["anchor"]:
        for tok in anchor_terms_tokens(a):
            counts[tok] = counts.get(tok, 0) + 1
    terms = (
        pd.DataFrame({"term": list(counts.keys()), "n": list(counts.values())})
        .astype({"n": "int64"})
        .sort_values(["n", "term"], ascending=[False, True])
        .head(TOP_ANCHOR_TERMS_K)
        .reset_index(drop=True)
    )
    _commit(
        _from_pandas(terms, pa.schema([("term", pa.string()), ("n", pa.int64())])),
        paths["anchor_terms"],
    )
    return paths


# ---------------------------------------------------------------------------
# Slim pages table (input parquet for the snapshot-window oracle SQL)
# ---------------------------------------------------------------------------


def write_pages_slim_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat single-process slim pages table ``(url, warc_us, text_md5)``.

    Unlike the other writers this parquet is not a query RESULT — it is
    the INPUT the snapshot queries' oracle SQL runs real DuckDB window
    functions over (``row_number()`` / ``lag()`` ``OVER (PARTITION BY
    url ORDER BY ...)``), so the engine's bucketed sort + adjacent-mask
    implementations (pipelines/snapshots.py) are checked against an
    independent declarative evaluation of the same semantics, not
    against a pandas twin.  Row generation reuses the deterministic
    corpus kernel directly (corpus/synth.pages_rows_for_doc, payloads
    skipped) — one flat loop, no Ray.
    """
    from ..corpus.synth import pages_rows_for_doc
    from ..pipelines.snapshots import slim_pages_batch

    path = _oracle_path(sf_dir, "pages_slim", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls: list[str] = []
    tss: list[int] = []
    texts: list[str] = []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand, include_html=False)
        urls.extend(rows["url"])
        tss.extend(rows["warc_ts"])
        texts.extend(rows["text"])
    full = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(texts, pa.string()),
        ],
        names=["url", "warc_ts", "text"],
    )
    return _commit(slim_pages_batch(full), path)


def write_domain_matrix_oracle(sf_dir: str, expand: int = 2) -> str:
    """Oracle for ``domain_link_matrix``: one flat in-memory pass over
    the deduped page universe — same link kernel (kernel/links.py), the
    aggregation re-derived with a single pandas groupby (no partials,
    no buckets, no shuffle)."""
    from ..kernel.links import extract_links
    from .data_quality import DOMAIN_RE
    from .summary import oracle_unique_pages

    path = _oracle_path(sf_dir, "domain_matrix", expand)
    if os.path.exists(path):
        return path
    pages = oracle_unique_pages(sf_dir, expand=expand)
    src_urls: list[str] = []
    hrefs: list[str] = []
    for url, payload in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        for link in extract_links(payload, url):
            src_urls.append(url)
            hrefs.append(link["href"])
    df = pd.DataFrame(
        {
            "src_domain": pd.Series(src_urls, dtype=object)
            .str.extract(DOMAIN_RE, expand=False)
            .fillna(""),
            "dst_domain": pd.Series(hrefs, dtype=object)
            .str.extract(DOMAIN_RE, expand=False)
            .fillna(""),
        }
    )
    out = (
        df.groupby(["src_domain", "dst_domain"], as_index=False, sort=False)
        .size()
        .rename(columns={"size": "n_links"})
        .sort_values(["src_domain", "dst_domain"], ignore_index=True)
    )
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("src_domain", pa.string()),
                    ("dst_domain", pa.string()),
                    ("n_links", pa.int64()),
                ]
            ),
        ),
        path,
    )


def write_unigram_vocab_oracle(sf_dir: str) -> str:
    """Oracle for ``unigram_train_vocab``: flat word-frequency table →
    the same driver Viterbi-EM loop (pipelines/tokenizer.py)."""
    from ..pipelines.tokenizer import unigram_train_flat

    path = _oracle_path(sf_dir, "unigram_vocab")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).to_pandas()
    out = unigram_train_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("piece_rank", pa.int64()),
                    ("piece", pa.string()),
                    ("n_uses", pa.int64()),
                    ("logprob", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_unigram_encode_oracle(sf_dir: str) -> str:
    """Oracle for ``unigram_encode_docs``: flat train + flat Viterbi
    encode (pipelines/tokenizer.unigram_encode_flat)."""
    from ..pipelines.tokenizer import unigram_encode_flat

    path = _oracle_path(sf_dir, "unigram_encode")
    if os.path.exists(path):
        return path
    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    out = unigram_encode_flat(df)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_pieces", pa.int64()),
                    ("uni_ratio", pa.float64()),
                    ("uni_logprob", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_link_edges_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat distinct doc→doc edge table (same parse kernel, dense
    single-process pass) — the declarative-SQL substrate for the
    recursive k-hop reachability oracle."""
    path = _oracle_path(sf_dir, "link_edges", expand)
    if os.path.exists(path):
        return path
    edges = _flat_doc_edges(sf_dir, expand=expand)[["src", "dst"]].astype("int64")
    edges = edges.sort_values(["src", "dst"], ignore_index=True)
    return _commit(
        _from_pandas(edges, pa.schema([("src", pa.int64()), ("dst", pa.int64())])),
        path,
    )


def write_messy_urls_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat (raw_url, warc_us) messy-url parquet — the INPUT the url
    canonicalization oracle SQL runs its independent DuckDB
    regexp/string-function canonicalization over (pipelines/urlops.py
    module docstring spec).  Row generation reuses the deterministic
    corpus + messy-url kernels directly (input generation is not under
    test; the canonicalization is, implemented once per side)."""
    from ..corpus.synth import pages_rows_for_doc
    from ..pipelines.urlops import messy_pages_batch

    path = _oracle_path(sf_dir, "messy_urls", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls: list[str] = []
    tss: list[int] = []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand, include_html=False)
        urls.extend(rows["url"])
        tss.extend(rows["warc_ts"])
    full = pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(tss, pa.timestamp("us"))],
        names=["url", "warc_ts"],
    )
    return _commit(messy_pages_batch(full), path)


def write_pages_text_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat ``(url, warc_us, text)`` pages parquet — the INPUT the
    snapshot-drift oracle SQL runs real DuckDB ``lag()`` +
    ``list_intersect`` window semantics over (same protocol as
    write_pages_slim_oracle, keeping the raw text instead of its md5)."""
    from ..corpus.synth import pages_rows_for_doc

    path = _oracle_path(sf_dir, "pages_text", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls: list[str] = []
    tss: list[int] = []
    texts: list[str] = []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand, include_html=False)
        urls.extend(rows["url"])
        tss.extend(rows["warc_ts"])
        texts.extend(rows["text"])
    full = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.int64()),
            pa.array(texts, pa.string()),
        ],
        names=["url", "warc_us", "text"],
    )
    return _commit(full, path)


def write_span_rows_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat ``(url, start, end, path, kind)`` span rows from the
    single-process extraction — the INPUT the span-stats oracle SQL
    aggregates declaratively (GROUP BY + COUNT(DISTINCT) + SUM), vs the
    engine's Arrow explode + bucketed partial fold."""
    import pyarrow.compute as pc

    path = _oracle_path(sf_dir, "span_rows", expand)
    if os.path.exists(path):
        return path
    extracted = _oracle_extracted(sf_dir, expand)["extracted"]
    spans = extracted["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    urls = pc.take(extracted["url"].combine_chunks(), parents)
    t = pa.Table.from_arrays(
        [
            urls,
            flat.field("start"),
            flat.field("end"),
            flat.field("path"),
            flat.field("kind"),
        ],
        names=["url", "start", "end", "path", "kind"],
    )
    return _commit(t, path)


def _flat_host_pairs(sf_dir: str, expand: int = 2) -> pd.DataFrame:
    """Flat twin of pipelines/linkgraph._host_pairs: link extraction
    over the deduped page universe → distinct directed (src_host,
    dst_host) pairs of the host QUOTIENT graph (same DOMAIN_RE +
    self-loop / non-http drop), all in-process pandas merges."""
    from ..kernel.links import extract_links, src_doc_of_url
    from .data_quality import DOMAIN_RE
    from .summary import oracle_unique_pages

    pages = oracle_unique_pages(sf_dir, expand=expand)
    urls_all = pages["url"].to_pylist()
    src_urls: list[str] = []
    dst_docs: list[int] = []
    for url, payload in zip(urls_all, pages["html"].to_pylist()):
        for link in extract_links(payload, url):
            if link["dst_doc"] >= 0:
                src_urls.append(url)
                dst_docs.append(link["dst_doc"])
    link_df = pd.DataFrame(
        {
            "src_host": pd.Series(src_urls, dtype=object)
            .str.extract(DOMAIN_RE, expand=False)
            .fillna(""),
            "dst_doc": pd.Series(dst_docs, dtype="int64"),
        }
    ).drop_duplicates()
    doc_host = pd.DataFrame(
        {
            "dst_doc": pd.Series([src_doc_of_url(u) for u in urls_all], dtype="int64"),
            "dst_host": pd.Series(urls_all, dtype=object)
            .str.extract(DOMAIN_RE, expand=False)
            .fillna(""),
        }
    )
    doc_host = doc_host[doc_host["dst_doc"] >= 0].drop_duplicates()
    df = link_df.merge(doc_host, on="dst_doc")[["src_host", "dst_host"]]
    return df[df["src_host"] != df["dst_host"]].drop_duplicates()


def write_host_edges_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat distinct host→host edge parquet (``_flat_host_pairs``) —
    the input side of the ``host_triangle_counts`` oracle, whose
    triangle closure DuckDB then performs declaratively (triple
    self-join under lexicographic orientation)."""
    path = _oracle_path(sf_dir, "host_edges", expand)
    if os.path.exists(path):
        return path
    df = _flat_host_pairs(sf_dir, expand).sort_values(
        ["src_host", "dst_host"], ignore_index=True
    )
    return _commit(
        _from_pandas(
            df, pa.schema([("src_host", pa.string()), ("dst_host", pa.string())])
        ),
        path,
    )


def write_host_pagerank_oracle(sf_dir: str, expand: int = 2) -> str:
    """Oracle for ``host_pagerank``: flat host pairs
    (``_flat_host_pairs``) → the same md5 node ids → ``pagerank_flat``
    (dense numpy, deliberately unlike the engine's bucketed join/fold
    loop) — bit-identical fixed-point ranks or the architectures
    diverged."""
    from ..stages.linkgraph import pagerank_flat
    from .linkgraph import host_node_id

    path = _oracle_path(sf_dir, "host_pagerank", expand)
    if os.path.exists(path):
        return path
    df = _flat_host_pairs(sf_dir, expand)
    edges = pd.DataFrame(
        {
            "src": [host_node_id(h) for h in df["src_host"]],
            "dst": [host_node_id(h) for h in df["dst_host"]],
        }
    )
    ranks = pagerank_flat(edges)
    hosts = pd.unique(
        np.concatenate([df["src_host"].to_numpy(), df["dst_host"].to_numpy()])
    )
    idmap = {host_node_id(h): h for h in hosts}
    out = pd.DataFrame(
        {
            "host": ranks["node"].map(idmap),
            "rank_micros": ranks["rank_micros"].astype("int64"),
        }
    ).sort_values("host", ignore_index=True)
    return _commit(
        _from_pandas(
            out, pa.schema([("host", pa.string()), ("rank_micros", pa.int64())])
        ),
        path,
    )


def write_compression_ratio_oracle(sf_dir: str, expand: int = 2) -> str:
    """Flat recompute for ``compression_ratio_scores`` — the same
    per-doc zlib kernel (single-implementation rule: the codec IS the
    contract) over the raw documents table, no Ray."""
    from ..stages.text_stats import compression_ratio_batch

    path = _oracle_path(sf_dir, "compression_ratio", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    out = compression_ratio_batch(docs)
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_bytes", pa.int64()),
                    ("n_compressed", pa.int64()),
                    ("compression_ratio", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_embedding_contamination_oracle(
    sf_dir: str, threshold: float = 0.4, expand: int = 2
) -> str:
    """Flat recompute for ``embedding_benchmark_contamination`` — one
    dense matmul of the whole corpus against the benchmark slice (same
    float32 kernel), no Ray, no broadcast."""
    from .corpus_stats import BENCHMARK_MOD

    path = _oracle_path(sf_dir, "embedding_contamination", expand)
    if os.path.exists(path):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = _ids_np(t["vec_id"]).astype(np.int64)
    mat = _stack(t["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    bench_mask = ids % BENCHMARK_MOD == 0
    cos = mat[~bench_mask] @ mat[bench_mask].T
    r, c = np.nonzero(cos >= threshold)
    out = pd.DataFrame(
        {
            "vec_id": ids[~bench_mask][r],
            "bench_id": ids[bench_mask][c],
            "cos": np.round(cos[r, c].astype(np.float64), 3),
        }
    )
    return _commit(
        _from_pandas(
            out,
            pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("bench_id", pa.int64()),
                    ("cos", pa.float64()),
                ]
            ),
        ),
        path,
    )


def write_incremental_neardup_oracle(
    sf_dir: str, max_hamming: int = 3, expand: int = 2
) -> str:
    """Flat recompute for ``incremental_new_docs_neardup`` — same
    SimHash kernel, dense delta×base XOR/popcount matrix, no probing,
    no Ray."""
    from ..pipelines.data_quality import INC_DELTA_MOD, INC_SITE_RE
    from ..stages.neardup import _popcount64, _simhash_batch
    from ..corpus.synth import pages_rows_for_doc
    import re as _re

    path = _oracle_path(sf_dir, "incremental_neardup", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls: list[str] = []
    tss: list[int] = []
    texts: list[str] = []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand, include_html=False)
        urls.extend(rows["url"])
        tss.extend(rows["warc_ts"])
        texts.extend(rows["text"])
    site_re = _re.compile(INC_SITE_RE)
    sites = np.array([int(site_re.match(u).group(1)) for u in urls], dtype=np.int64)
    delta = sites % INC_DELTA_MOD == 0
    sigs = _simhash_batch(texts)
    d_sigs, b_sigs = sigs[delta], np.unique(sigs[~delta])
    d_urls = np.array(urls, dtype=object)[delta]
    d_us = np.array(tss, dtype=np.int64)[delta]
    if len(b_sigs) == 0:
        new_mask = np.ones(len(d_sigs), dtype=bool)
    else:
        ham = _popcount64(
            np.bitwise_xor(
                np.repeat(d_sigs, len(b_sigs)), np.tile(b_sigs, len(d_sigs))
            )
        ).reshape(len(d_sigs), len(b_sigs))
        new_mask = (ham > max_hamming).all(axis=1)
    out = pd.DataFrame(
        {"url": d_urls[new_mask], "warc_us": d_us[new_mask]}
    ).sort_values(["url", "warc_us"], ignore_index=True)
    return _commit(
        _from_pandas(
            out, pa.schema([("url", pa.string()), ("warc_us", pa.int64())])
        ),
        path,
    )


def write_warclike_expected_oracle(sf_dir: str, expand: int = 2) -> str:
    """Expected rows for ``warclike_ingest_rows`` — recomputed FLAT from
    the corpus kernel, never touching the record framing or the reader:
    any datasource framing/parse bug diverges."""
    from ..corpus.synth import pages_rows_for_doc

    path = _oracle_path(sf_dir, "warclike_expected", expand)
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls: list = []
    tss: list = []
    langs: list = []
    md5s: list = []
    sizes: list = []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rows = pages_rows_for_doc(doc_id, text or "", lang or "", expand)
        for u, ts, payload, lg in zip(
            rows["url"], rows["warc_ts"], rows["html"], rows["lang"]
        ):
            urls.append(u)
            tss.append(int(ts))
            langs.append(lg)
            md5s.append(hashlib.md5(payload or b"").hexdigest())
            sizes.append(len(payload or b""))
    t = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.int64()),
            pa.array(langs, pa.string()),
            pa.array(md5s, pa.string()),
            pa.array(sizes, pa.int64()),
        ],
        names=["url", "warc_us", "lang", "payload_md5", "payload_bytes"],
    )
    return _commit(t, path)
