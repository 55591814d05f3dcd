"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup toolbox of a training-data pipeline.

Scale shapes (per the Ray Data guide's dedup patterns):

- **MinHash+LSH**: per-batch vectorized signatures (numpy outer-hash,
  no per-shingle Python), exploded to ``(band_id, band_hash, id)`` rows,
  one ``groupby(band_id, band_hash)`` shuffle of tiny rows, candidate
  pairs verified by exact shingle-Jaccard.  Verification is fully
  distributed: the corpus is semi-join-filtered against the (broadcast,
  output-sized) candidate id set — a streaming ``map_batches`` filter,
  no shuffle of the corpus — and the surviving ``(id, text)`` rows are
  bucket-joined onto the pair list twice (text_a, text_b).  The
  candidate set, not the corpus, bounds everything past the filter.
  Ids must be UNIQUE (dedup first): a duplicate id would make "the text
  of id X" ambiguous during verification.
- **Connected components** (``min_label_components``): near-dup GROUPS
  from the verified pair list by iterated min-label propagation — per
  round, each vertex takes the min label among itself and its
  neighbors (two bucket-joins + one vectorized bucket groupby per
  round); converges in O(component diameter) rounds with every step a
  Dataset op, no driver-side union-find.
- **SimHash**: 64-bit signatures; candidates = equal 16-bit block
  (standard multi-block probing for hamming ≤ 3), verified by exact
  hamming distance.
- **Embedding near-dup**: the full (small-side) matrix is broadcast
  once via ``ray.put``; each batch does one matmul and emits only pairs
  above the cosine threshold.  At scale the SRP-LSH bucketing in
  stages/similarity.py bounds the candidate quadratic.

All signatures are pure functions of the text + fixed seed —
deterministic across partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .dedup import stable_bucket_ids
from .joins import bucketed_hash_join

# module-level (NOT inside worker-executed callables): a function-local
# relative import would run a REAL import on the worker, which fails
# when the driver runs from a foreign cwd (ROUND_NOTES lesson 4 — the
# package ships to workers by value, not by path)
from .similarity import _ids_np, _stack

# Sentinel signature value for empty documents: the max 32-bit hash output.
_EMPTY_SIG = (1 << 32) - 1

# Per-worker-process cache of the broadcast candidate-id value set
# (keyed by ObjectRef hex — same pattern as dedup._WINNER_CACHE).
_CAND_ID_CACHE: dict = {}


def _to_pandas_safe(ds: "rd.Dataset", columns: list[str]) -> pd.DataFrame:
    """to_pandas that keeps column names when the dataset is empty."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != columns:
        return pd.DataFrame({c: [] for c in columns})
    return df


def _typed_table(out: pd.DataFrame, dtype_src: dict) -> pa.Table:
    """pandas → Arrow with an EXPLICIT schema per column.

    ``dtype_src`` maps each output column to either a pa.DataType or a
    pandas Series to copy the dtype from (usually the group's input
    column).  Without this, an empty DataFrame from a no-pair bucket
    degrades to ``PandasBlockSchema(names=[])`` and the streaming
    executor logs schema-mismatch warnings for every such block (and
    downstream schema unification can degrade dtypes).  Prefer passing
    pa.DataType values captured from the DATASET schema at pipeline
    build time: a Series from an empty group cannot be inferred.
    """
    fields = []
    for c in out.columns:
        src = dtype_src[c]
        if isinstance(src, pa.DataType):
            t = src
        else:
            # infer from ONE value (empty-series inference yields null type)
            t = pa.Array.from_pandas(src.head(1)).type if len(src) else pa.string()
        fields.append((c, t))
    return pa.Table.from_pandas(out, schema=pa.schema(fields), preserve_index=False)


def _schema_type(ds: "rd.Dataset", col: str) -> pa.DataType:
    """Arrow type of ``col`` in a Dataset's schema (pandas-block dtypes
    normalized the same way joins._arrow_type does)."""
    from .joins import _arrow_type

    s = ds.schema()
    return _arrow_type(dict(zip(s.names, s.types))[col])


def attach_pair_values(
    cands: rd.Dataset,
    values: rd.Dataset,
    id_col: str,
    val_col: str,
    id_type: pa.DataType,
    val_type: pa.DataType,
    out_a: str,
    out_b: str,
    num_buckets: int = 16,
    carry: dict[str, pa.DataType] | None = None,
) -> rd.Dataset:
    """(id_a, id_b) pairs + (id, value) rows → (id_a, id_b, out_a, out_b)
    via ONE bucketed join + one pair regroup — replacing the old two
    sequential bucketed joins.  Each pair explodes into its two sides
    (key = that side's id); the single join attaches each side's value;
    the regroup (bucketed by id_a) zips the sides back into one row.
    The heavy value column crosses the wire once per (pair, side) and is
    never re-shuffled through a second join, and ``values`` gains a
    single consumer, so callers no longer need to materialize it.
    ``cands`` must be globally distinct and ``values`` unique per id.
    ``carry`` maps extra per-pair columns of ``cands`` (e.g. a
    pre-aggregated intersection count) to their Arrow types; they ride
    the side-0 row and reappear in the output.
    """
    carry = carry or {}

    def explode(t: pa.Table) -> pa.Table:
        ida, idb = t["id_a"].combine_chunks(), t["id_b"].combine_chunks()
        n = len(ida)
        side = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        cols = {
            "__key": pa.concat_arrays([ida, idb]),
            "id_a": pa.concat_arrays([ida, ida]),
            "id_b": pa.concat_arrays([idb, idb]),
            "__vside": pa.array(side, pa.int8()),
        }
        for c, ct in carry.items():
            arr = t[c].combine_chunks().cast(ct)
            cols[c] = pa.concat_arrays([arr, pa.nulls(n, ct)])
        return pa.Table.from_pydict(cols)

    vals = values.map_batches(
        lambda t: t.select([id_col, val_col]).rename_columns(["__key", "__val"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        cands.map_batches(explode, batch_format="pyarrow"),
        vals,
        on="__key",
        num_buckets=num_buckets,
    )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["id_a"], num_buckets)
        return t.append_column("__pairb", pa.array(b, pa.int32()))

    out_cols = ["id_a", "id_b", *carry, out_a, out_b]
    out_types = {
        "id_a": id_type,
        "id_b": id_type,
        out_a: val_type,
        out_b: val_type,
        **carry,
    }

    def regroup(g: pd.DataFrame) -> pa.Table:
        a = g[g["__vside"] == 0][["id_a", "id_b", *carry, "__val"]].rename(
            columns={"__val": out_a}
        )
        b = g[g["__vside"] == 1][["id_a", "id_b", "__val"]].rename(
            columns={"__val": out_b}
        )
        m = a.merge(b, on=["id_a", "id_b"])
        return _typed_table(m[out_cols], out_types)

    return (
        joined.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__pairb")
        .map_groups(regroup, batch_format="pandas")
    )


_SHINGLE_P = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mix constant


def _token_hashes(text: str, k_shingle: int) -> np.ndarray:
    """Distinct k-shingle hashes of a document (uint64).

    Tokens are hashed ONCE with ``pd.util.hash_array`` (siphash, fixed
    key — process-stable), then each k-window combines its token hashes
    with a wrapping-uint64 polynomial over a sliding-window view — no
    per-shingle Python at all (round 3: the " ".join shingle-string
    construction was the dominant signature cost; shingle identity is
    now hash-based, with 64-bit collision odds irrelevant next to the
    MinHash sketch error, and the exact verify step uses the same
    definition on both sides of a pair).

    Short-doc policy: a doc with < k tokens becomes ONE whole-doc
    shingle (short exact dups still pair) — deliberately different from
    ``_shingle_strings``, whose relational oracle emits no shingles
    below k tokens.
    """
    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = pd.util.hash_array(np.asarray(toks, dtype=object))
    k = min(k_shingle, len(toks))
    # cumprod wraps mod 2^64 by design (array ops wrap silently; scalar
    # numpy ops would raise overflow RuntimeWarnings)
    pows = np.ones(k, dtype=np.uint64)
    if k > 1:
        np.cumprod(np.full(k - 1, _SHINGLE_P, dtype=np.uint64), out=pows[1:])
    windows = np.lib.stride_tricks.sliding_window_view(th, k)
    return np.unique((windows * pows[::-1]).sum(axis=1, dtype=np.uint64))


def _jaccard_from_hashes(ha: np.ndarray, hb: np.ndarray) -> float:
    """Jaccard of two sorted-unique hash arrays (``_token_hashes`` output)."""
    if ha.size == 0 and hb.size == 0:
        return 1.0
    if ha.size == 0 or hb.size == 0:
        return 0.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    return inter / (ha.size + hb.size - inter)


def shingle_jaccard(a: str, b: str, k_shingle: int = 3) -> float:
    return _jaccard_from_hashes(
        _token_hashes(a, k_shingle), _token_hashes(b, k_shingle)
    )


class MinHasher:
    """Actor-pool stage: text → LSH band rows ``(id, band_id, band_hash)``.

    Hash-function params are built once per actor (seeded), the analog of
    the reference's config-time regex compile (config.py:45-52).

    The per-hash family is multiply-add-shift (Dietzfelbinger et al.):
    ``((a*x + b) mod 2^64) >> 32`` with odd ``a`` — 2-universal on the
    high 32 bits, and the mod-2^64 wrap is exactly what numpy uint64
    arithmetic computes, so the whole (n_hashes × n_shingles) grid stays
    one vectorized expression.  (A naive ``(a*x + b) % mersenne61``
    silently wraps mod 2^64 BEFORE the Mersenne modulus in uint64 and
    loses the universality guarantee.)
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_hashes: int = 64,
        n_bands: int = 16,
        k_shingle: int = 3,
        seed: int = 42,
    ) -> None:
        assert n_hashes % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.n_hashes, self.n_bands, self.k = n_hashes, n_bands, k_shingle
        rng = np.random.default_rng(seed)
        self.a = rng.integers(0, 1 << 63, size=n_hashes, dtype=np.uint64) * 2 + 1
        self.b = rng.integers(0, 1 << 63, size=n_hashes, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        h = _token_hashes(text, self.k)
        if h.size == 0:
            return np.full(self.n_hashes, _EMPTY_SIG, dtype=np.uint64)
        # (n_hashes, n_shingles) multiply-add-shift, min per row — all
        # numpy; uint64 products/sums wrap mod 2^64 by design.
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) >> np.uint64(32)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        r = self.n_hashes // self.n_bands
        if n == 0:
            return pa.Table.from_pydict(
                {
                    self.id_col: batch[self.id_col],
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "all_bands": pa.array(
                        [], pa.list_(pa.int64(), self.n_bands)
                    ),
                }
            )
        sigs = np.stack([self.signature(t) for t in texts])  # (n, n_hashes)
        bands = sigs.reshape(n, self.n_bands, r)
        # vectorized band digest: wrapping-uint64 polynomial over the
        # band's r minima, finished with one hash_array avalanche —
        # replaces a Python blake2b call per (doc, band) and shrinks the
        # shuffled key from a 16-char hex string to 8 bytes
        mix = bands[:, :, 0].copy()
        for j in range(1, r):
            mix = mix * _SHINGLE_P + bands[:, :, j]
        digests = pd.util.hash_array(mix.reshape(-1)).view(np.int64)
        rid = pc.take(
            batch[self.id_col].combine_chunks(),
            pa.array(np.repeat(np.arange(n), self.n_bands)),
        )
        # full band vector per row: a bucket can decide locally whether
        # its band is a pair's FIRST collision (global distinct without
        # a second shuffle) — 8·n_bands bytes per row, cheap next to text
        digmat = digests.reshape(n, self.n_bands)
        return pa.Table.from_pydict(
            {
                self.id_col: rid,
                "band_id": pa.array(
                    np.tile(np.arange(self.n_bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(digests, pa.int64()),
                "all_bands": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(digmat, self.n_bands, axis=0).ravel(), pa.int64()),
                    self.n_bands,
                ),
            }
        )


def minhash_candidate_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    **mh_kwargs,
) -> rd.Dataset:
    """text rows → distinct candidate pairs (id_a < id_b) via LSH banding.

    Band rows shuffle into B hash buckets of ``band_hash`` (every row of
    a given (band_id, band_hash) combo lands in the same bucket), and
    each bucket runs a vectorized self-merge — B groups total, NOT one
    Ray group per band bucket: per-key groups over ~n_docs × n_bands
    tiny buckets pay 10-100× in per-group overhead.

    Global distinctness costs NO second shuffle: each row carries its
    full band vector, so a bucket emits a pair only when its band is
    the pair's FIRST matching band (locally decidable) — a pair
    colliding in several bands surfaces exactly once, in the bucket
    that owns the first one.
    """
    id_type = _schema_type(ds, id_col)
    bands = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col, **mh_kwargs},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["band_hash"], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.reset_index(drop=True)
        g["__row"] = np.arange(len(g), dtype=np.int64)
        cols = [id_col, "band_id", "band_hash", "__row"]
        m = g[cols].merge(g[cols], on=["band_id", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if m.empty:
            return _typed_table(
                pd.DataFrame({"id_a": [], "id_b": []}),
                {"id_a": id_type, "id_b": id_type},
            )
        bandmat = np.asarray(list(g["all_bands"]), dtype=np.int64)
        eq = bandmat[m["__row_x"].to_numpy()] == bandmat[m["__row_y"].to_numpy()]
        first = eq.argmax(axis=1)
        m = m[first == m["band_id"].to_numpy()]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].rename(
            columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b"}
        )
        return _typed_table(out, {"id_a": id_type, "id_b": id_type})

    return (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


def minhash_near_dup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_buckets: int = 16,
    **mh_kwargs,
) -> pd.DataFrame:
    """Candidate pairs verified by exact shingle-Jaccard ≥ threshold.

    Fully distributed verification — the corpus is never materialized on
    the driver:

    1. LSH banding → distinct candidate pairs (output-sized; materialized
       once so the pair list is not recomputed per use);
    2. the candidate ID SET (bounded by the pair list, not the corpus) is
       broadcast via ``ray.put`` and used as a streaming semi-join filter
       over ``ds`` — only texts that appear in some candidate pair
       survive, no shuffle;
    3. two bucketed hash joins attach ``text_a``/``text_b`` to each pair;
    4. a stateless ``map_batches`` computes exact shingle-Jaccard and
       keeps pairs ≥ threshold.

    ``ds`` must have UNIQUE ids (exact-dedup first): with duplicate ids
    "the text of id X" is ambiguous and verification would silently pick
    an arbitrary variant.
    """
    cands = minhash_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, k_shingle=k_shingle, **mh_kwargs
    ).materialize()

    # Candidate id set: output-sized (≤ 2 × #pairs), safe to broadcast.
    cand_ids: set = set()
    for b in cands.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cand_ids.update(b["id_a"].to_pylist())
        cand_ids.update(b["id_b"].to_pylist())
    if not cand_ids:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    ids_ref = ray.put(cand_ids)

    def semi_filter(batch: pa.Table) -> pa.Table:
        # deserialize the broadcast set once per worker process, as an
        # Arrow value-set for a vectorized is_in (not a per-batch
        # ray.get + per-element Python membership loop)
        vs = _CAND_ID_CACHE.get(ids_ref.hex())
        if vs is None:
            # single-entry cache: clear before insert so repeated queries
            # in one process don't pin every past candidate set (and its
            # object-store entry via the captured ref) forever
            _CAND_ID_CACHE.clear()
            vs = pa.array(list(ray.get(ids_ref)))
            _CAND_ID_CACHE[ids_ref.hex()] = vs
        mask = pc.is_in(batch[id_col], value_set=vs)
        return batch.select([id_col, text_col]).filter(pc.fill_null(mask, False))

    # single consumer (the one pair join inside attach_pair_values), so
    # the filtered texts stream — no materialize, no second corpus scan
    texts = ds.map_batches(semi_filter, batch_format="pyarrow")
    with_ab = attach_pair_values(
        cands,
        texts,
        id_col=id_col,
        val_col=text_col,
        id_type=_schema_type(ds, id_col),
        val_type=_schema_type(ds, text_col),
        out_a="text_a",
        out_b="text_b",
        num_buckets=num_buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        # Per-batch memo of shingle-hash arrays keyed by doc id: batches
        # arrive bucket-grouped, so a document in P candidate pairs repeats
        # within a batch — without the memo it pays P shingle-hash passes.
        memo: dict = {}

        def hashes(i, t):  # noqa: ANN001, ANN202
            h = memo.get(i)
            if h is None:
                h = _token_hashes(t or "", k_shingle)
                memo[i] = h
            return h

        ia, ib, ja = [], [], []
        for a, b, ta, tb in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            j = _jaccard_from_hashes(hashes(a, ta), hashes(b, tb))
            if j >= threshold:
                ia.append(a)
                ib.append(b)
                ja.append(round(j, 4))
        return pa.Table.from_pydict(
            {
                "id_a": pa.array(ia, batch["id_a"].type),
                "id_b": pa.array(ib, batch["id_b"].type),
                "jaccard": pa.array(ja, pa.float64()),
            }
        )

    out = _to_pandas_safe(
        with_ab.map_batches(verify, batch_format="pyarrow"),
        ["id_a", "id_b", "jaccard"],
    )
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# Connected components: iterated min-label propagation (all Dataset ops)
# ---------------------------------------------------------------------------


def min_label_components(
    pairs: rd.Dataset,
    num_buckets: int = 16,
    max_iters: int = 50,
) -> rd.Dataset:
    """Connected components of the ``(id_a, id_b)`` pair graph.

    Iterated min-label propagation: every vertex starts labeled with its
    own id; each round a vertex takes the min label among itself and its
    neighbors.  Converges in O(component diameter) rounds — near-dup
    clusters are shallow, so a handful of rounds in practice.  Per round:
    two bucketed hash joins push labels across edges both ways, and one
    hash-bucket groupby (B vectorized pandas groups, NOT one group per
    vertex) takes the min + detects convergence.  Labels are vertex-set-
    sized (bounded by the pair list); every step is a Dataset op — no
    driver-side union-find.

    Returns a Dataset ``(id, label)`` with ``label`` = min id of the
    component.
    """
    pairs = pairs.materialize()  # reused 2× per round — never recompute
    id_type = _schema_type(pairs, "id_a")

    def _ids(col: str) -> rd.Dataset:
        return pairs.select_columns([col]).map_batches(
            lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
        )

    def first_per_bucket_key(g: pd.DataFrame) -> pa.Table:
        return _typed_table(g.drop_duplicates(subset=["id"])[["id"]], {"id": id_type})

    def bucketed(ds: rd.Dataset, col: str) -> rd.Dataset:
        def add_bucket(t: pa.Table) -> pa.Table:
            b = stable_bucket_ids(t[col], num_buckets)
            return t.append_column("__bucket", pa.array(b, pa.int32()))

        return ds.map_batches(add_bucket, batch_format="pyarrow")

    vertices = (
        bucketed(_ids("id_a").union(_ids("id_b")), "id")
        .groupby("__bucket")
        .map_groups(first_per_bucket_key, batch_format="pandas")
    )
    labels = vertices.map_batches(
        lambda t: t.append_column("label", t["id"]), batch_format="pyarrow"
    ).materialize()

    for _ in range(max_iters):
        def _lab(col: str) -> rd.Dataset:
            return labels.map_batches(
                lambda t, c=col: t.rename_columns([c, "label"]), batch_format="pyarrow"
            )

        # label of a → message to b, label of b → message to a
        msg_to_b = bucketed_hash_join(pairs, _lab("id_a"), on="id_a", num_buckets=num_buckets).map_batches(
            lambda t: t.select(["id_b", "label"]).rename_columns(["id", "label"]),
            batch_format="pyarrow",
        )
        msg_to_a = bucketed_hash_join(pairs, _lab("id_b"), on="id_b", num_buckets=num_buckets).map_batches(
            lambda t: t.select(["id_a", "label"]).rename_columns(["id", "label"]),
            batch_format="pyarrow",
        )
        # self-message carries the current label in ``old`` for the
        # convergence check; neighbor messages carry old = null.
        self_msg = labels.map_batches(
            lambda t: t.append_column("old", t["label"]), batch_format="pyarrow"
        )
        neigh = msg_to_b.union(msg_to_a).map_batches(
            lambda t: t.append_column("old", pa.nulls(t.num_rows, t["label"].type)),
            batch_format="pyarrow",
        )

        def resolve_bucket(g: pd.DataFrame) -> pa.Table:
            new = g.groupby("id", as_index=False, sort=False)["label"].min()
            # exactly one self-message (old non-null) exists per id
            old = (
                g.dropna(subset=["old"])
                .groupby("id", as_index=False, sort=False)["old"]
                .first()
            )
            agg = new.merge(old, on="id", how="left")
            agg["__changed"] = agg["label"] != agg["old"]
            return _typed_table(
                agg[["id", "label", "__changed"]],
                {"id": id_type, "label": id_type, "__changed": pa.bool_()},
            )

        out = (
            bucketed(self_msg.union(neigh), "id")
            .groupby("__bucket")
            .map_groups(resolve_bucket, batch_format="pandas")
            .materialize()
        )
        n_changed = out.map_batches(
            lambda t: t.filter(t["__changed"]), batch_format="pyarrow"
        ).count()
        labels = out.drop_columns(["__changed"]).materialize()
        if n_changed == 0:
            return labels
    # Loud, not wrong: truncating propagation would silently SPLIT a
    # component whose diameter exceeds the round budget.
    raise RuntimeError(
        f"min_label_components did not converge in {max_iters} rounds "
        f"({n_changed} labels still changing) — a component's diameter "
        "exceeds the budget; raise max_iters"
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted shingle index — SQL-checkable)
# ---------------------------------------------------------------------------


def _shingle_strings(text: str, k_shingle: int) -> set[str]:
    """Distinct k-token shingles; docs with < k tokens have none (the
    same rule the SQL oracle's positional self-join implements).

    DELIBERATELY different short-doc policy from ``_token_hashes`` (the
    MinHash path), which folds a < k-token doc into ONE whole-doc
    shingle so short exact dups still pair: this operator must match
    its relational oracle, which emits no shingles below k tokens."""
    toks = (text or "").lower().split()
    if len(toks) < k_shingle:
        return set()
    return {" ".join(toks[i : i + k_shingle]) for i in range(len(toks) - k_shingle + 1)}


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_buckets: int = 64,
    max_df: int | None = None,
    metric: str = "jaccard",
) -> pd.DataFrame:
    """EXACT all-pairs n-gram Jaccard ≥ threshold via an inverted
    shingle index — no sketching, so the result is SQL-checkable:

    1. one pass emits distinct ``(id, shingle)`` rows (and, separately,
       the per-doc shingle-set sizes);
    2. shingles hash-bucket shuffle; within each bucket a vectorized
       self-merge counts per-pair co-occurrences (each shingle lives in
       exactly one bucket, so bucket counts are partial intersections);
    3. partial counts re-bucket on ``id_a`` (which co-locates every row
       of a pair) and a vectorized pandas groupby-sum per bucket yields
       |A∩B| — B groups, NOT one Ray group per pair: a naive
       ``groupby([id_a, id_b]).aggregate`` over ~10^6 tiny pair groups
       measured 200+ s where the bucketed sum takes ~2 s;
    4. two bucketed joins attach |A|, |B|; J = i / (|A| + |B| - i).

    ``metric`` selects the pair score computed from the same
    (intersection, |A|, |B|) triple: ``"jaccard"`` (default,
    ``i / (|A| + |B| - i)``) or ``"containment"``
    (``i / min(|A|, |B|)`` — the doc-in-doc detector: a short document
    quoted whole inside a long one scores ~1.0 where Jaccard, diluted
    by the long side's union, stays near 0; the standard complement to
    Jaccard in dedup suites, cf. Broder's resemblance/containment
    pair).  The score column is named after the metric so the oracle
    SQL's aliases line up.

    ``max_df`` caps shingle document frequency — the web-scale guard:
    pair generation is quadratic per shingle, so ONE boilerplate shingle
    ("all rights reserved") in 10^6 docs would emit 10^12 partial pairs.
    Shingles with df > max_df are dropped from the shingle UNIVERSE
    (both intersections and sizes — filtered Jaccard over the informative
    shingles), computed exactly per bucket since a shingle lives in
    exactly one bucket.  The DuckDB oracle applies the identical cap, so
    the entry stays SQL-checkable.  Shingles stay raw strings so the
    oracle matches byte-for-byte.
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    id_type = _schema_type(ds, id_col)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for s in _shingle_strings(t, k_shingle):
                ids.append(i)
                shs.append(s)
        t_out = pa.Table.from_pydict(
            {id_col: pa.array(ids, batch[id_col].type), "shingle": pa.array(shs, pa.string())}
        )
        b = stable_bucket_ids(t_out["shingle"], num_buckets) if len(ids) else np.empty(0, np.int32)
        return t_out.append_column("__bucket", pa.array(b, pa.int32()))

    def size_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sizes = [len(_shingle_strings(t, k_shingle)) for t in batch[text_col].to_pylist()]
        return pa.Table.from_pydict(
            {id_col: pa.array(ids, batch[id_col].type), "n_sh": pa.array(sizes, pa.int64())}
        )

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow")

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m.groupby([f"{id_col}_x", f"{id_col}_y"], as_index=False).size()
        return out.rename(
            columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b", "size": "i"}
        )

    if max_df is None:
        sizes = ds.map_batches(size_rows, batch_format="pyarrow")

        def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
            return _typed_table(
                _pair_partials(g), {"id_a": id_type, "id_b": id_type, "i": pa.int64()}
            )

        partial = shingles.groupby("__bucket").map_groups(
            pairs_in_bucket, batch_format="pandas"
        )
    else:
        # ONE pass over the bucketed shingles emits BOTH pair partials
        # (kind=0) and capped per-doc size partials (kind=1) — df is
        # exact per bucket because a shingle lives in exactly one bucket.
        both_types = {
            "id_a": id_type,
            "id_b": id_type,
            "i": pa.int64(),
            "__kind": pa.int8(),
        }

        def bucket_pass(g: pd.DataFrame) -> pa.Table:
            dfreq = g.groupby("shingle", sort=False)[id_col].transform("size")
            g = g[dfreq <= max_df]
            pairs = _pair_partials(g).assign(__kind=np.int8(0))
            sz = g.groupby(id_col, as_index=False).size()
            sz = sz.rename(columns={id_col: "id_a", "size": "i"})
            sz["id_b"] = None  # size rows carry no pair partner (typed null)
            sz["__kind"] = np.int8(1)
            out = pd.concat(
                [pairs, sz[["id_a", "id_b", "i", "__kind"]]], ignore_index=True
            )
            return _typed_table(out[["id_a", "id_b", "i", "__kind"]], both_types)

        both = (
            shingles.groupby("__bucket")
            .map_groups(bucket_pass, batch_format="pandas")
            .materialize()  # consumed twice (pairs + sizes); partials-sized
        )
        if both.count() == 0:
            # every shingle was capped away (or no doc had >= k tokens):
            # downstream datasets would have no schema for the joins
            return pd.DataFrame({"id_a": [], "id_b": [], metric: []})
        partial = both.map_batches(
            lambda t: t.filter(pc.equal(t["__kind"], 0)).select(["id_a", "id_b", "i"]),
            batch_format="pyarrow",
        )

        def _size_bucket(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["__kind"], 1)).select(["id_a", "i"])
            b = stable_bucket_ids(t["id_a"], num_buckets)
            return t.append_column("__bucket", pa.array(b, pa.int32()))

        def _sum_sizes(g: pd.DataFrame) -> pa.Table:
            out = g.groupby("id_a", as_index=False)["i"].sum()
            out = out.rename(columns={"id_a": id_col, "i": "n_sh"})
            return _typed_table(out, {id_col: id_type, "n_sh": pa.int64()})

        sizes = (
            both.map_batches(_size_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_sum_sizes, batch_format="pandas")
        )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([c for c in ("__bucket",) if c in t.column_names])
        b = stable_bucket_ids(t["id_a"], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["id_a", "id_b"], as_index=False)["i"].sum()
        return _typed_table(
            out, {"id_a": id_type, "id_b": id_type, "i": pa.int64()}
        )

    inter = (
        partial.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        # output-sized (one row per co-occurring pair); reused by the two
        # size joins, and the count() guards the no-pairs case — a
        # map_groups over zero rows yields a schema-less dataset that the
        # bucketed joins cannot consume
        .materialize()
    )
    if inter.count() == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], metric: []})

    with_ab = attach_pair_values(
        inter,
        sizes,
        id_col=id_col,
        val_col="n_sh",
        id_type=id_type,
        val_type=pa.int64(),
        out_a="n_a",
        out_b="n_b",
        num_buckets=num_buckets,
        carry={"i": pa.int64()},
    )

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = pc.cast(t["i"], pa.float64())
        na = pc.cast(t["n_a"], pa.float64())
        nb = pc.cast(t["n_b"], pa.float64())
        if metric == "containment":
            denom = pc.min_element_wise(na, nb)
        else:
            denom = pc.subtract(pc.add(na, nb), i)
        val = pc.divide(i, denom)
        t = t.append_column(metric, pc.round(val, 4))
        return t.filter(pc.greater_equal(val, threshold)).select(["id_a", "id_b", metric])

    out = _to_pandas_safe(
        with_ab.map_batches(score, batch_format="pyarrow"), ["id_a", "id_b", metric]
    )
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_chunk(tok_lists: list[list[str]], counts: np.ndarray, out: np.ndarray) -> None:
    """Signatures for one doc-group; writes into ``out`` (len == docs)."""
    total = int(counts.sum())
    if total == 0:
        return
    all_toks = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        all_toks[pos : pos + len(toks)] = toks
        pos += len(toks)
    hashes = pd.util.hash_array(all_toks)  # uint64, process-stable siphash
    # (total, 64) ±1 votes; reduceat sums per doc segment.
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int8)
    votes = (2 * bits - 1).astype(np.int32)
    n_docs = len(tok_lists)
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    nonempty = counts > 0
    # reduceat needs strictly valid offsets; restrict to non-empty docs
    if nonempty.any():
        acc = np.add.reduceat(votes, offsets[nonempty], axis=0)
        bitvals = (acc >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        out[nonempty] = bitvals.sum(axis=1, dtype=np.uint64)


# Peak vote-matrix memory is ~(token_budget × 64 × 5) bytes ≈ 80 MB;
# without the cap a batch of long documents would expand EVERY token of
# the batch into the 64-column vote matrix at once.
_SIMHASH_TOKEN_BUDGET = 1 << 18


def _simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit SimHash per text (uint64 array).

    One ``pd.util.hash_array`` call over the CONCATENATED token stream of
    a doc group (the MinHash r2 fix applied here: a per-token Python
    ``hashlib.blake2b`` loop dominated signature cost), then per-doc bit
    vote via ``np.add.reduceat`` at the doc offsets — no per-token
    Python.  Groups are capped at ``_SIMHASH_TOKEN_BUDGET`` tokens (doc
    granularity) so the transient (tokens × 64) vote matrix is bounded
    regardless of batch size; a single doc larger than the budget is
    processed alone, matching the old per-doc peak.  Empty docs get
    signature 0.
    """
    tok_lists = [(t or "").lower().split() for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    n_docs = len(tok_lists)
    sigs = np.zeros(n_docs, dtype=np.uint64)
    i = 0
    while i < n_docs:
        j, tot = i, 0
        while j < n_docs and (j == i or tot + counts[j] <= _SIMHASH_TOKEN_BUDGET):
            tot += int(counts[j])
            j += 1
        _simhash_chunk(tok_lists[i:j], counts[i:j], sigs[i:j])
        i = j
    return sigs


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic; scalar
    wrapper over the vectorized batch kernel so both paths agree)."""
    if not (text or "").split():
        return 0
    return int(_simhash_batch([text])[0])


class SimHasher:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = _simhash_batch(batch[self.text_col].to_pylist())
        out = batch.select([self.id_col])
        # store as int64 bit pattern (Arrow has no uint64-friendly SQL path)
        return out.append_column("simhash", pa.array(sigs.view(np.int64), pa.int64()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _popcount64(arr: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (no np.bitwise_count in 1.26)."""
    return np.unpackbits(arr.view(np.uint8)).reshape(len(arr), 8 * 8).sum(axis=1)


def hamming_near_dup_pairs(
    sigs: rd.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    num_buckets: int = 64,
    id_type: pa.DataType | None = None,
    max_block_group: int | None = None,
) -> pd.DataFrame:
    """Pairs within ``max_hamming`` of a 64-bit signature column via
    16-bit block probing + exact hamming verify — the generic machinery
    behind SimHash text near-dups AND perceptual-hash image near-dups.

    Block rows shuffle into B hash buckets of ``block_key`` (all rows of
    a (block, block_key) combo co-locate); per bucket a vectorized
    self-merge generates candidates and a numpy XOR+popcount verifies
    hamming — B groups, not one Ray group per 16-bit block value.
    Recall is EXACT for ``max_hamming <= 3``: 4 disjoint 16-bit blocks
    and ≤3 differing bits leave at least one block untouched
    (pigeonhole), so every qualifying pair collides somewhere.

    Global distinctness costs NO second shuffle: every row carries the
    full 64-bit signature, so each bucket recomputes all four block
    keys per candidate pair and emits it only when ITS block is the
    first matching one.

    ``max_block_group`` caps a single (block, block_key) group before
    the self-merge — the scale dial for BIASED signature families
    (perceptual hashes: most images agree on background-dominated
    blocks, so one block value can collect a near-linear fraction of
    the corpus and make the merge quadratic; text SimHash blocks are
    near-uniform and don't need it).  Capped groups rely on the pair's
    OTHER blocks, exactly like minhash/LSH ``max_sig_group``; since a
    capped-out block may be the pair's first-colliding one, first-
    collision dedup is no longer locally decidable and the machinery
    falls back to in-bucket dedup + a global distinct stage.
    """
    if id_type is None:
        id_type = _schema_type(sigs, id_col)

    def explode_blocks(batch: pa.Table) -> pa.Table:
        sh = (
            batch[sig_col].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        n = len(sh)
        rid = pc.take(batch[id_col].combine_chunks(), pa.array(np.repeat(np.arange(n), 4)))
        blocks = np.tile(np.arange(4, dtype=np.int32), n)
        keys = ((sh[:, None] >> (16 * np.arange(4, dtype=np.uint64))[None, :]) & np.uint64(0xFFFF)).astype(np.int32).ravel()
        t = pa.Table.from_pydict(
            {
                id_col: rid,
                "block": pa.array(blocks, pa.int32()),
                "block_key": pa.array(keys, pa.int32()),
                sig_col: pa.array(np.repeat(sh.view(np.int64), 4), pa.int64()),
            }
        )
        b = stable_bucket_ids(t["block_key"], num_buckets)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        cols = [id_col, "block", "block_key", sig_col]
        types = {"id_a": id_type, "id_b": id_type, "hamming": pa.int32()}
        if max_block_group is not None:
            sz = g.groupby(["block", "block_key"], sort=False)[id_col].transform("size")
            g = g[sz <= max_block_group]
        m = g[cols].merge(g[cols], on=["block", "block_key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if m.empty:
            return _typed_table(pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}), types)
        x = m[f"{sig_col}_x"].to_numpy(dtype=np.int64).view(np.uint64)
        y = m[f"{sig_col}_y"].to_numpy(dtype=np.int64).view(np.uint64)
        if max_block_group is None:
            # first-collision dedup: recompute all four block keys from
            # the carried signatures; keep the row iff THIS block is the
            # first agreeing one (pairs matching in several blocks emit
            # once, from the bucket owning the first block)
            shifts = (16 * np.arange(4, dtype=np.uint64))[None, :]
            eq = ((x[:, None] >> shifts) & np.uint64(0xFFFF)) == (
                (y[:, None] >> shifts) & np.uint64(0xFFFF)
            )
            first = eq.argmax(axis=1)
            keep = first == m["block"].to_numpy()
        else:
            # capped: the first-colliding block's group may be capped out
            # in ANOTHER bucket — dedupe here, globally in distinct below
            keep = ~m.duplicated(subset=[f"{id_col}_x", f"{id_col}_y"]).to_numpy()
        m, x, y = m[keep], x[keep], y[keep]
        if m.empty:
            return _typed_table(pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}), types)
        d = _popcount64(np.bitwise_xor(x, y))
        out = pd.DataFrame(
            {
                "id_a": m[f"{id_col}_x"].to_numpy(),
                "id_b": m[f"{id_col}_y"].to_numpy(),
                "hamming": d.astype(np.int32),
            }
        )
        out = out[out["hamming"] <= max_hamming]
        return _typed_table(out, types)

    pairs = (
        sigs.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    if max_block_group is not None:
        # capped mode emits a pair once per surviving colliding block —
        # global distinct via an id_a re-bucket (duplicates carry an
        # identical hamming, so any survivor is deterministic)
        def add_pair_bucket(t: pa.Table) -> pa.Table:
            b = stable_bucket_ids(t["id_a"], num_buckets)
            return t.append_column("__bucket2", pa.array(b, pa.int32()))

        def distinct_bucket(g: pd.DataFrame) -> pa.Table:
            out = g[["id_a", "id_b", "hamming"]].drop_duplicates(
                subset=["id_a", "id_b"]
            )
            return _typed_table(
                out, {"id_a": id_type, "id_b": id_type, "hamming": pa.int32()}
            )

        pairs = (
            pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
            .groupby("__bucket2")
            .map_groups(distinct_bucket, batch_format="pandas")
        )
    out = _to_pandas_safe(pairs, ["id_a", "id_b", "hamming"])
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def simhash_near_dup_pairs(
    ds: rd.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """SimHash near-dups: vectorized 64-bit text SimHash per doc, then
    the generic 16-bit block-probing pair machinery
    (``hamming_near_dup_pairs``)."""
    id_type = _schema_type(ds, id_col)
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return hamming_near_dup_pairs(
        sigs,
        max_hamming=max_hamming,
        id_col=id_col,
        sig_col="simhash",
        num_buckets=num_buckets,
        id_type=id_type,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact, broadcast matrix)
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    ds: rd.Dataset,
    all_ids: np.ndarray,
    all_vecs: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact pairs (id_a < id_b) with cosine ≥ threshold.

    The full normalized matrix is broadcast once; each batch multiplies
    its rows against it (one matmul, no shuffle).  Exact → SQL-checkable.
    At 10^12-doc scale swap the broadcast for SRP-LSH bucketing
    (similarity.ann_topk_lsh's signature machinery).
    """
    vecs = np.asarray(all_vecs, dtype=np.float32)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_ref = ray.put(vecs / norms)
    ids_ref = ray.put(np.asarray(all_ids))

    class PairScorer:
        def __init__(self) -> None:
            self.mat = ray.get(mat_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = _stack(batch[vec_col])
            rnorm = np.linalg.norm(rows, axis=1, keepdims=True)
            rnorm[rnorm == 0] = 1.0
            rows = rows / rnorm
            rids = _ids_np(batch[id_col])
            cos = rows @ self.mat.T  # (batch, all)
            r, c = np.nonzero(cos >= threshold)
            a, b = rids[r], self.ids[c]
            m = a < b
            return pa.Table.from_pydict(
                {
                    "id_a": pa.array(a[m], pa.int64()),
                    "id_b": pa.array(b[m], pa.int64()),
                    "cos": pa.array(
                        np.round(cos[r[m], c[m]].astype(np.float64), 3), pa.float64()
                    ),
                }
            )

    out = _to_pandas_safe(
        ds.map_batches(PairScorer, batch_format="pyarrow", concurrency=(1, 4)),
        ["id_a", "id_b", "cos"],
    )
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup via SRP-LSH bucketing (the 100 TB path)
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs_lsh(
    ds: rd.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int | None = 16,
    n_planes: int | None = 6,
    seed: int = 42,
    num_buckets: int = 64,
    max_sig_group: int | None = None,
    verify: str = "join",
) -> pd.DataFrame:
    """Embedding near-dup pairs WITHOUT a driver-side matrix or a full
    broadcast — the scale path for corpora whose N×d matrix does not fit
    a worker (the exact-mode ``embedding_near_dup_pairs`` broadcast is
    the ≤worker-memory envelope).

    Shape (mirrors the MinHash pipeline, banding swapped for signed
    random projections):

    1. **Signatures**: each batch computes, per table t, an
       ``n_planes``-bit SRP signature (sign pattern of the vector against
       t's hyperplanes).  Planes are derived deterministically from
       ``seed`` in every worker — no broadcast needed.  Rows
       ``(id, table, sig)`` are tiny.
    2. **Candidate pairs**: hash-bucket shuffle on (table, sig) → per
       bucket a vectorized self-merge emits pairs with an equal
       signature in SOME table; global distinct via an id_a re-bucket
       (both steps B groups, never one Ray group per signature).
    3. **Verify**: the candidate-id set (output-sized) is broadcast as a
       semi-join filter over ``ds``; two bucketed hash joins attach the
       actual vectors; exact cosine per batch keeps pairs ≥ threshold.

    Output ⊆ the exact pairs (verification is exact); recall is the LSH
    tradeoff: P[collide in ≥1 table] = 1-(1-(1-θ/π)^n_planes)^n_tables
    (θ = angle at the threshold) — 16 tables × 6 planes gives ~0.9997
    at cos 0.9.  ``max_sig_group`` caps a single (table, sig) group
    (dense near-identical clusters make the self-merge quadratic; capped
    groups rely on the other tables — recommended at web scale, off by
    default so small corpora stay exact-recall).

    ``verify`` picks where the exact cosine runs:

    - ``"join"`` (default): candidate pairs shuffle, vectors attach via
      two bucketed hash joins.  Right when candidates are SPARSE
      (output-sized): the vector column ships once, candidate-set-sized.
    - ``"bucket"``: signature rows CARRY their vector, and the cosine
      runs inside the bucket self-merge — only verified pairs ever
      leave a bucket.  Right for DENSE corpora where LSH barely filters
      (correlated embeddings; candidates ~ O(N²) fractions): measured
      at sf0.1 on the engine's own text embeddings (8.45M candidates
      from 5k docs) this cut the pipeline from ~73 s to the cost of the
      merge itself by deleting the 2×8.45M-row join traffic.  Cost:
      the vector column ships n_tables× through the one signature
      shuffle — prefer "join" when candidates ≪ n_tables × N.
    """
    id_type = _schema_type(ds, id_col)
    from .similarity import srp_lsh_params, srp_planes

    if n_planes is None or n_tables is None:
        # adaptive: derive the recall/cost point from the threshold
        # (srp_lsh_params docstring) instead of hand-tuning per regime
        auto_k, auto_t = srp_lsh_params(threshold)
        n_planes = auto_k if n_planes is None else n_planes
        n_tables = auto_t if n_tables is None else n_tables

    carry_vec = verify == "bucket"
    vec_type = _schema_type(ds, vec_col)

    def signature_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # np.asarray([]) would be 1-D and break the matmul below
            cols = {
                id_col: pa.array([], id_type),
                "table": pa.array([], pa.int32()),
                "sig": pa.array([], pa.int64()),
                "__bucket": pa.array([], pa.int32()),
            }
            if carry_vec:
                cols[vec_col] = pa.array([], vec_type)
                cols["all_sigs"] = pa.array([], pa.list_(pa.int64(), n_tables))
            return pa.Table.from_pydict(cols)
        mat = _stack(batch[vec_col])
        # deterministic from (seed, dim): every batch derives the SAME
        # planes — no broadcast, and no driver-side take(1) dim probe
        # (the dim comes from the batch itself)
        planes = srp_planes(mat.shape[1], n_tables * n_planes, seed)
        bits = (mat @ planes.T) >= 0  # (n, tables*planes)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.uint64)
        sigs = (bits.astype(np.uint64) @ weights).astype(np.int64)  # (n, tables)
        n = len(mat)
        expand_idx = pa.array(np.repeat(np.arange(n), n_tables))
        rid = pc.take(batch[id_col].combine_chunks(), expand_idx)
        tables = np.tile(np.arange(n_tables, dtype=np.int32), n)
        flat_sigs = sigs.ravel()
        # combined (table, sig) key for the bucket hash — one uint64
        combo = (tables.astype(np.uint64) << np.uint64(n_planes)) | flat_sigs.astype(
            np.uint64
        )
        b = (pd.util.hash_array(combo) % num_buckets).astype(np.int32)
        cols = {
            id_col: rid,
            "table": pa.array(tables, pa.int32()),
            "sig": pa.array(flat_sigs, pa.int64()),
            "__bucket": pa.array(b, pa.int32()),
        }
        if carry_vec:
            cols[vec_col] = pc.take(batch[vec_col].combine_chunks(), expand_idx)
            # full T-signature per row: lets a bucket decide LOCALLY
            # whether its table is the pair's FIRST collision — global
            # pair dedup with no second shuffle
            cols["all_sigs"] = pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(sigs, n_tables, axis=0).ravel(), pa.int64()),
                n_tables,
            )
        return pa.Table.from_pydict(cols)

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        types = {"id_a": id_type, "id_b": id_type}
        if max_sig_group is not None:
            sz = g.groupby(["table", "sig"], sort=False)[id_col].transform("size")
            g = g[sz <= max_sig_group]
        cols = [id_col, "table", "sig"]
        m = g[cols].merge(g[cols], on=["table", "sig"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out = out.rename(columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b"})
        return _typed_table(out, types)

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        b = stable_bucket_ids(t["id_a"], num_buckets)
        return t.append_column("__bucket2", pa.array(b, pa.int32()))

    def distinct_bucket(g: pd.DataFrame) -> pa.Table:
        out = g[["id_a", "id_b"]].drop_duplicates()
        return _typed_table(out, {"id_a": id_type, "id_b": id_type})

    if verify == "bucket":
        # exact cosine INSIDE the bucket self-merge: only verified pairs
        # leave a bucket, the giant candidate-pair shuffle and the two
        # vector joins never exist.  A pair colliding in several tables
        # is emitted ONLY from its first-collision table (decided
        # locally from the carried full signature vectors), so the
        # output is globally distinct with no second shuffle and each
        # pair pays exactly one cosine.
        pair_types = {"id_a": id_type, "id_b": id_type, "cos": pa.float64()}

        def pairs_in_bucket_verified(g: pd.DataFrame) -> pa.Table:
            g = g.reset_index(drop=True)
            if max_sig_group is not None:
                sz = g.groupby(["table", "sig"], sort=False)[id_col].transform("size")
                g = g[sz <= max_sig_group].reset_index(drop=True)
            g["__row"] = np.arange(len(g), dtype=np.int64)
            cols = [id_col, "table", "sig", "__row"]
            m = g[cols].merge(g[cols], on=["table", "sig"])
            m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
            if m.empty:
                return _typed_table(
                    pd.DataFrame({"id_a": [], "id_b": [], "cos": []}), pair_types
                )
            if max_sig_group is None:
                sigmat = np.asarray(list(g["all_sigs"]), dtype=np.int64)
                rx = m["__row_x"].to_numpy()
                ry = m["__row_y"].to_numpy()
                # first table where the two signatures agree; keep the
                # merge row iff THIS table is that first collision
                eq = sigmat[rx] == sigmat[ry]
                first = eq.argmax(axis=1)
                m = m[first == m["table"].to_numpy()]
            else:
                # Under a group cap "first collision" is not locally
                # decidable (the first-colliding table's group may be
                # capped out in ANOTHER bucket) — dedupe within the
                # bucket here and globally in the distinct stage below.
                m = m.drop_duplicates(subset=[f"{id_col}_x", f"{id_col}_y"])
            if m.empty:
                return _typed_table(
                    pd.DataFrame({"id_a": [], "id_b": [], "cos": []}), pair_types
                )
            mat = np.asarray(list(g[vec_col]), dtype=np.float32)
            va = mat[m["__row_x"].to_numpy()]
            vb = mat[m["__row_y"].to_numpy()]
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
            keep = cos >= threshold
            out = pd.DataFrame(
                {
                    "id_a": m[f"{id_col}_x"].to_numpy()[keep],
                    "id_b": m[f"{id_col}_y"].to_numpy()[keep],
                    "cos": np.round(cos[keep].astype(np.float64), 3),
                }
            )
            return _typed_table(out, pair_types)

        verified = (
            ds.map_batches(signature_rows, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(pairs_in_bucket_verified, batch_format="pandas")
        )
        if max_sig_group is not None:
            # capped mode emits a pair once per surviving colliding
            # table — global distinct (duplicates carry identical cos)
            def distinct_verified(g: pd.DataFrame) -> pa.Table:
                out = g[["id_a", "id_b", "cos"]].drop_duplicates(
                    subset=["id_a", "id_b"]
                )
                return _typed_table(out, pair_types)

            verified = (
                verified.map_batches(add_pair_bucket, batch_format="pyarrow")
                .groupby("__bucket2")
                .map_groups(distinct_verified, batch_format="pandas")
            )
        out = _to_pandas_safe(verified, ["id_a", "id_b", "cos"])
        return out.sort_values(["id_a", "id_b"], ignore_index=True)

    cands = (
        ds.map_batches(signature_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket2")
        .map_groups(distinct_bucket, batch_format="pandas")
        .materialize()
    )

    # --- verify: semi-join filter + bucketed joins + exact cosine ---
    cand_ids: set = set()
    for b in cands.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cand_ids.update(b["id_a"].to_pylist())
        cand_ids.update(b["id_b"].to_pylist())
    if not cand_ids:
        return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
    ids_ref = ray.put(cand_ids)

    def semi_filter(batch: pa.Table) -> pa.Table:
        vs = _CAND_ID_CACHE.get(ids_ref.hex())
        if vs is None:
            _CAND_ID_CACHE.clear()
            vs = pa.array(list(ray.get(ids_ref)))
            _CAND_ID_CACHE[ids_ref.hex()] = vs
        mask = pc.is_in(batch[id_col], value_set=vs)
        return batch.select([id_col, vec_col]).filter(pc.fill_null(mask, False))

    # single consumer (the one pair join inside attach_pair_values) —
    # the filtered vectors stream, no materialize
    vecs = ds.map_batches(semi_filter, batch_format="pyarrow")
    with_ab = attach_pair_values(
        cands,
        vecs,
        id_col=id_col,
        val_col=vec_col,
        id_type=id_type,
        val_type=vec_type,
        out_a="vec_a",
        out_b="vec_b",
        num_buckets=num_buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "id_a": pa.array([], batch["id_a"].type),
                    "id_b": pa.array([], batch["id_b"].type),
                    "cos": pa.array([], pa.float64()),
                }
            )
        va = _stack(batch["vec_a"])
        vb = _stack(batch["vec_b"])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
        keep = cos >= threshold
        return pa.Table.from_pydict(
            {
                "id_a": batch["id_a"].combine_chunks().filter(pa.array(keep)),
                "id_b": batch["id_b"].combine_chunks().filter(pa.array(keep)),
                "cos": pa.array(
                    np.round(cos[keep].astype(np.float64), 3), pa.float64()
                ),
            }
        )

    out = _to_pandas_safe(
        with_ab.map_batches(verify, batch_format="pyarrow"), ["id_a", "id_b", "cos"]
    )
    return out.sort_values(["id_a", "id_b"], ignore_index=True)
