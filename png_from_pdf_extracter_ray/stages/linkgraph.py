"""Link-graph stages: hyperlink table, doc→doc edges, integer PageRank.

A crawl-scale training-data pipeline treats the link graph as a
first-class product of extraction: the out-link table feeds URL-frontier
dedup, in-degree and PageRank are standard document-quality priors, and
anchor text is a labeled corpus in its own right.  (No reference analog
— the reference extracts PDF attachments from mail; this is one of the
engine's training-data growth operators, like the dedup/ANN families.)

Scale shape:
- link extraction is an embarrassingly parallel ``map_batches`` over the
  deduped pages corpus (the parse kernel is ``kernel/links.py`` — ONE
  implementation shared with the flat oracles);
- edges/nodes/degrees are hash-bucketed: never one Ray group per node
  (ROUND_NOTES lesson 10) — B buckets, vectorized pandas inside;
- PageRank keeps its state (the rank vector) DISTRIBUTED: one bucketed
  hash join (edges ⋈ ranks on src) + one bucketed aggregation per
  iteration, plus two scalar passes (dangling mass, node count).  The
  rank vector is N-sized and lives in the object store, never on the
  driver — at 10^12 nodes the driver could not hold it.

Batch invariance (the round-4 integer-reduction rule, stages/ml.py):
every cross-batch reduction here is an exact int64 sum/max, and the
update formula is pure integer arithmetic —

    contrib(e)   = rank[src(e)] // outdeg[src(e)]
    in_sum[v]    = Σ contrib over in-edges of v          (int64, exact)
    dangling     = Σ rank[v] for v with no out-edges     (int64, exact)
    rank'[v]     = (15·S)//100 + (85·in_sum[v])//100
                   + (85·(dangling//n_nodes))//100

with S = PAGERANK_SCALE micro-units ≙ rank 1.0.  Identical on any
partitioning, and the flat numpy oracle (``pagerank_flat``) must agree
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..kernel.links import extract_links, src_doc_of_url
from .dedup import stable_bucket_ids
from .joins import bucketed_hash_join

PAGERANK_SCALE = 10**9  # integer mass per node ("rank 1.0")
PAGERANK_ITERS = 4
_BUCKET = "__bucket"

LINKS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("href", pa.string()),
        ("anchor", pa.string()),
        ("is_internal", pa.int8()),
        ("dst_doc", pa.int64()),
    ]
)

_EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("outdeg", pa.int64())]
)
_NODE_SCHEMA = pa.schema([("node", pa.int64()), ("has_out", pa.int8())])
_RANK_SCHEMA = pa.schema(
    [("node", pa.int64()), ("has_out", pa.int8()), ("rank_micros", pa.int64())]
)
# rank vector + carried dangling partial (one nonzero row per fold group)
_RANK_DP_SCHEMA = pa.schema(
    [
        ("node", pa.int64()),
        ("has_out", pa.int8()),
        ("rank_micros", pa.int64()),
        ("dangling_part", pa.int64()),
    ]
)


def _links_batch(batch: pa.Table) -> pa.Table:
    """pages batch (url, html) → link rows.  Per-payload parse (the
    kernel is a document parser, like the extract stage — the row loop
    IS the unit of work here, not a columnar op)."""
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    cols: dict[str, list] = {k: [] for k in LINKS_SCHEMA.names}
    for url, payload in zip(urls, payloads):
        for link in extract_links(payload, url):
            cols["src_url"].append(url)
            cols["href"].append(link["href"])
            cols["anchor"].append(link["anchor"])
            cols["is_internal"].append(1 if link["internal"] else 0)
            cols["dst_doc"].append(link["dst_doc"])
    return pa.Table.from_pydict(cols, schema=LINKS_SCHEMA)


def page_links(pages: rd.Dataset) -> rd.Dataset:
    """Deduped pages (url, html) → hyperlink table, streaming."""
    return pages.map_batches(_links_batch, batch_format="pyarrow", batch_size=64)


def _edges_bucket(g: pd.DataFrame) -> pa.Table:
    g = g.drop_duplicates(["src", "dst"])
    out = g.assign(outdeg=g.groupby("src")["dst"].transform("size").astype(np.int64))
    return pa.Table.from_pandas(
        out[["src", "dst", "outdeg"]], schema=_EDGE_SCHEMA, preserve_index=False
    )


def doc_edges(pages: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Distinct doc→doc edges with out-degree attached.

    One bucket shuffle (by src — a pair's bucket is a function of src
    only, so one src's edges always land in one group): each group holds
    ALL edges of its srcs, so global pair dedup and out-degree are
    computed together in one pass."""

    def pairs(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        srcs: list[int] = []
        dsts: list[int] = []
        for url, payload in zip(urls, payloads):
            s = src_doc_of_url(url)
            if s < 0:
                continue
            for link in extract_links(payload, url):
                d = link["dst_doc"]
                if d >= 0 and d != s:  # doc targets only; self-loops dropped
                    srcs.append(s)
                    dsts.append(d)
        t = pa.Table.from_pydict(
            {"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())}
        )
        if t.num_rows:
            t = t.group_by(["src", "dst"]).aggregate([])  # local pre-dedup
        b = stable_bucket_ids(t["src"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    return (
        pages.map_batches(pairs, batch_format="pyarrow", batch_size=64)
        .groupby(_BUCKET)
        .map_groups(_edges_bucket, batch_format="pandas")
    )


def link_nodes(edges: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Node universe of the edge set: (node, has_out) — has_out=0 marks
    dangling nodes (link targets that never link out)."""

    def emit(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        node = np.concatenate([src, dst])
        has_out = np.concatenate(
            [np.ones(len(src), np.int8), np.zeros(len(dst), np.int8)]
        )
        df = (
            pd.DataFrame({"node": node, "has_out": has_out})
            .groupby("node", as_index=False, sort=False)["has_out"]
            .max()
        )
        t = pa.Table.from_pandas(df, schema=_NODE_SCHEMA, preserve_index=False)
        b = stable_bucket_ids(t["node"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    def combine(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("node", as_index=False, sort=False)["has_out"].max()
        return pa.Table.from_pandas(out, schema=_NODE_SCHEMA, preserve_index=False)

    return (
        edges.map_batches(emit, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(combine, batch_format="pandas")
    )


def _teleport_base(dangling: int, n_nodes: int, scale: int = PAGERANK_SCALE) -> int:
    """The per-node constant of one update: teleport + dangling share."""
    return (15 * scale) // 100 + (85 * (dangling // n_nodes)) // 100


def _check_int64_headroom(n_nodes: int, scale: int, factor: int, op: str) -> None:
    """Every cross-batch reduction here is an exact int64 sum; the worst
    case routes the whole corpus mass (n·scale, times a small constant)
    through one node.  numpy/pandas wrap silently on overflow — and the
    flat twin wraps IDENTICALLY, so parity would mask the corruption.
    Refuse instead: at n nodes pick scale ≤ ~9.2e18 / (factor · n)
    (e.g. 10^6 for 10^11 nodes); the fixed-point semantics are
    unchanged, only the resolution moves."""
    if factor * n_nodes * scale >= 2**63:
        raise ValueError(
            f"{op}: n_nodes={n_nodes} at scale={scale} can overflow int64 "
            f"(need {factor}*n*scale < 2^63); lower the scale parameter"
        )


def _bucketed_nodes(nodes: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """Node universe with its hash bucket attached ONCE — the iteration
    loops reuse it instead of re-hashing the same ids every pass."""

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket_ids(batch["node"], num_buckets) if batch.num_rows else np.empty(0, np.int32)
        return batch.append_column(_BUCKET, pa.array(b, pa.int32()))

    return nodes.map_batches(tag, batch_format="pyarrow").materialize()


def pagerank(
    edges: rd.Dataset,
    iters: int = PAGERANK_ITERS,
    num_buckets: int = 32,
    scale: int = PAGERANK_SCALE,
) -> rd.Dataset:
    """Integer PageRank over a distinct-edge dataset (src, dst, outdeg).

    PRECONDITION (the ``doc_edges`` contract): edges are distinct,
    self-loop-free, and ``outdeg`` is the true distinct out-degree of
    ``src``.  Raw pair lists must go through ``doc_edges``-style
    normalization first — duplicates would double-count mass and
    silently diverge from the flat twin, which dedups.

    Per iteration: one bucketed hash join (edges ⋈ ranks on src) to form
    contributions and one bucketed aggregation to fold them into each
    node's new rank.  The fold CARRIES the next iteration's
    dangling-mass partial on its own output (one nonzero
    ``dangling_part`` per fold group), so the dangling scalar costs a
    builtin column sum over the already-materialized rank vector — not
    a separate map pass per iteration (r4 VERDICT item: ~1 barrier per
    iteration off the slowest bench entry).  The rank vector stays a
    Dataset throughout (materialized per iteration — consumed twice:
    once by the scalar sum, once by the join).  ``scale`` is the
    fixed-point resolution dial: int64 headroom requires 85·n·scale <
    2^63 (checked), so at 10^11+ nodes pass a smaller scale."""
    edges = edges.materialize()
    nodes = link_nodes(edges, num_buckets=num_buckets).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(_RANK_SCHEMA.empty_table().drop_columns(["has_out"]))
    _check_int64_headroom(n_nodes, scale, 85, "pagerank")
    nodes_b = _bucketed_nodes(nodes, num_buckets)

    def dst_bucket(batch: pa.Table) -> pa.Table:
        b = stable_bucket_ids(batch["dst"], num_buckets) if batch.num_rows else np.empty(0, np.int32)
        return batch.append_column("__dst_bucket", pa.array(b, pa.int32()))

    edges = edges.map_batches(dst_bucket, batch_format="pyarrow").materialize()

    def init(batch: pa.Table) -> pa.Table:
        # carried dangling partial: this batch's share of the uniform
        # init mass held by out-degree-0 nodes, on the first row
        has_out = batch["has_out"].to_numpy(zero_copy_only=False)
        dp = np.zeros(batch.num_rows, np.int64)
        if batch.num_rows:
            dp[0] = int((has_out == 0).sum()) * scale
        return batch.append_column(
            "rank_micros", pa.array([scale] * batch.num_rows, pa.int64())
        ).append_column("dangling_part", pa.array(dp, pa.int64()))

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # the fold carried per-group partials — one builtin column sum
        # over the materialized vector, no extra map pass
        dangling = int(ranks.sum("dangling_part") or 0)
        base = _teleport_base(dangling, n_nodes, scale)

        src_ranks = ranks.drop_columns(["has_out", "dangling_part"]).rename_columns(
            {"node": "src"}
        )
        joined = bucketed_hash_join(edges, src_ranks, on="src", num_buckets=num_buckets)

        def contrib(batch: pa.Table) -> pa.Table:
            dst = batch["dst"].to_numpy()
            part = batch["rank_micros"].to_numpy() // batch["outdeg"].to_numpy()
            return pa.Table.from_pydict(
                {
                    "node": pa.array(dst, pa.int64()),
                    "has_out": pa.array(np.zeros(len(dst), np.int8), pa.int8()),
                    "part": pa.array(part, pa.int64()),
                    _BUCKET: batch["__dst_bucket"],
                }
            )

        def node_base(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "node": batch["node"],
                    "has_out": batch["has_out"],
                    "part": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
                    _BUCKET: batch[_BUCKET],
                }
            )

        def fold(g: pd.DataFrame, base: int = base) -> pa.Table:
            agg = g.groupby("node", sort=False).agg(
                has_out=("has_out", "max"), in_sum=("part", "sum")
            )
            agg = agg.reset_index()
            rank_new = base + (85 * agg["in_sum"].to_numpy().astype(np.int64)) // 100
            has_out = agg["has_out"].to_numpy().astype(np.int8)
            # carry this group's dangling partial for the NEXT iteration
            dp = np.zeros(len(agg), np.int64)
            if len(agg):
                dp[0] = int(rank_new[has_out == 0].sum())
            out = pd.DataFrame(
                {
                    "node": agg["node"].to_numpy(),
                    "has_out": has_out,
                    "rank_micros": rank_new,
                    "dangling_part": dp,
                }
            )
            return pa.Table.from_pandas(
                out, schema=_RANK_DP_SCHEMA, preserve_index=False
            )

        ranks = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .union(nodes_b.map_batches(node_base, batch_format="pyarrow"))
            .groupby(_BUCKET)
            .map_groups(fold, batch_format="pandas")
            .materialize()
        )

    return ranks.drop_columns(["has_out", "dangling_part"])


_STAR_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_LABEL_SCHEMA = pa.schema([("id", pa.int64()), ("label", pa.int64())])


def _canon_edges(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Canonical (u > v) directed edges, self-loops dropped, bucketed by u."""
    a = batch["u"].to_numpy()
    b = batch["v"].to_numpy()
    keep = a != b
    a, b = a[keep], b[keep]
    u = np.maximum(a, b)
    v = np.minimum(a, b)
    t = pa.Table.from_pydict(
        {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())}
    )
    bk = stable_bucket_ids(t["u"], num_buckets) if t.num_rows else np.empty(0, np.int32)
    return t.append_column(_BUCKET, pa.array(bk, pa.int32()))


def _edge_set_signature(edges: rd.Dataset) -> tuple[int, int]:
    """(count, XOR of per-edge hashes) — a partition-invariant edge-set
    fingerprint for the convergence check (no driver edge collection)."""

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy().astype(np.uint64)
        v = batch["v"].to_numpy().astype(np.uint64)
        # splitmix64-style per-edge mix — any bit flip anywhere flips the XOR
        x = u * np.uint64(0x9E3779B97F4A7C15) ^ (v + np.uint64(0xBF58476D1CE4E5B9))
        x ^= x >> np.uint64(31)
        x *= np.uint64(0x94D049BB133111EB)
        acc = np.bitwise_xor.reduce(x) if len(x) else np.uint64(0)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(x)], pa.int64()),
                "h": pa.array([int(acc.astype(np.int64))], pa.int64()),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return 0, 0
    return int(parts["n"].sum()), int(
        np.bitwise_xor.reduce(parts["h"].to_numpy(np.int64).view(np.uint64)).astype(np.int64)
    )


def star_components(
    edges: rd.Dataset,
    num_buckets: int = 32,
    max_rounds: int = 64,
) -> rd.Dataset:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — O(log² n) rounds, vs O(component diameter) for the
    min-label propagation the shallow near-dup graphs use.  A web link
    graph has chain-like components hundreds of hops deep; propagation
    is the wrong tool there (measured: 44 rounds vs 7 on the sf0.001
    doc graph).

    Each operation is ONE bucket shuffle: edges hash-bucketed by ``u``
    (every node's incident rows land in one group), per-``u`` min via a
    vectorized pandas transform, emit.  The edge list only shrinks, so
    round cost falls as the forest flattens.  Convergence = the
    canonical edge set's (count, XOR-hash) fingerprint is a fixpoint —
    never a driver-side edge collection.

    Input: ``(u, v)`` int64 rows in any orientation (self-loops and
    duplicates tolerated).  Returns ``(id, label)`` over every node of
    the input, ``label`` = min node id of the component — identical
    contract to ``neardup.min_label_components`` / the union-find
    oracle.
    """
    node_universe = link_nodes(
        edges.map_batches(
            lambda t: t.rename_columns(["src", "dst"]), batch_format="pyarrow"
        ),
        num_buckets=num_buckets,
    ).drop_columns(["has_out"]).materialize()
    if node_universe.count() == 0:
        return rd.from_arrow(_LABEL_SCHEMA.empty_table())

    def dedup_bucket(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            g.drop_duplicates(["u", "v"])[["u", "v"]],
            schema=_STAR_SCHEMA,
            preserve_index=False,
        )

    def large_star_bucket(g: pd.DataFrame) -> pa.Table:
        # g holds BOTH directions of every incident edge, bucketed by u
        m = g.groupby("u")["v"].transform("min")
        m = np.minimum(m.to_numpy(), g["u"].to_numpy())
        keep = g["v"].to_numpy() > g["u"].to_numpy()
        out = pd.DataFrame({"u": g["v"].to_numpy()[keep], "v": m[keep]})
        out = out[out["u"] != out["v"]].drop_duplicates()
        return pa.Table.from_pandas(out, schema=_STAR_SCHEMA, preserve_index=False)

    def small_star_bucket(g: pd.DataFrame) -> pa.Table:
        # g holds canonical (u > v) edges, bucketed by u
        m = g.groupby("u")["v"].transform("min").to_numpy()
        emit_u = pd.DataFrame({"u": g["u"].to_numpy(), "v": m}).drop_duplicates()
        emit_v = pd.DataFrame({"u": g["v"].to_numpy(), "v": m})
        out = pd.concat([emit_v, emit_u])
        lo = np.minimum(out["u"].to_numpy(), out["v"].to_numpy())
        hi = np.maximum(out["u"].to_numpy(), out["v"].to_numpy())
        out = pd.DataFrame({"u": hi, "v": lo})
        out = out[out["u"] != out["v"]].drop_duplicates()
        return pa.Table.from_pandas(out, schema=_STAR_SCHEMA, preserve_index=False)

    def symmetrize(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        t = pa.Table.from_pydict(
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )
        b = stable_bucket_ids(t["u"], num_buckets)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    def rebucket(batch: pa.Table) -> pa.Table:
        t = batch.select(["u", "v"])
        b = stable_bucket_ids(t["u"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    cur = (
        edges.map_batches(lambda t: _canon_edges(t, num_buckets), batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    sig = _edge_set_signature(cur)
    for _ in range(max_rounds):
        if sig[0] == 0:
            break  # no edges left: every node is its own (or a star's) center
        after_large = (
            cur.map_batches(symmetrize, batch_format="pyarrow")
            .groupby(_BUCKET)
            .map_groups(large_star_bucket, batch_format="pandas")
        )
        nxt = (
            after_large.map_batches(rebucket, batch_format="pyarrow")
            .groupby(_BUCKET)
            .map_groups(small_star_bucket, batch_format="pandas")
            # cross-bucket duplicates: small-star emits (v, m) rows into
            # v's bucket-of-origin u — dedup once more on the new u
            .map_batches(rebucket, batch_format="pyarrow")
            .groupby(_BUCKET)
            .map_groups(dedup_bucket, batch_format="pandas")
            .materialize()
        )
        nsig = _edge_set_signature(nxt)
        if nsig == sig:
            cur = nxt
            break
        cur, sig = nxt, nsig
    else:
        raise RuntimeError(
            f"star_components did not converge in {max_rounds} rounds — "
            "pathological input; raise max_rounds"
        )

    # Labels: star edge (u, v) ⇒ label[u] = v; centers/isolated ⇒ self.
    def self_base(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({"id": batch["node"], "label": batch["node"]})
        b = stable_bucket_ids(t["id"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    def star_rows(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict({"id": batch["u"], "label": batch["v"]})
        b = stable_bucket_ids(t["id"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    def fold_min(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("id", as_index=False, sort=False)["label"].min()
        return pa.Table.from_pandas(out, schema=_LABEL_SCHEMA, preserve_index=False)

    return (
        node_universe.map_batches(self_base, batch_format="pyarrow")
        .union(cur.map_batches(star_rows, batch_format="pyarrow"))
        .groupby(_BUCKET)
        .map_groups(fold_min, batch_format="pandas")
    )


HITS_SCALE = 10**9  # integer mass ≙ score 1.0 (same fixed-point rule)
HITS_ITERS = 4

_HITS_SCHEMA = pa.schema(
    [("node", pa.int64()), ("hub", pa.int64()), ("auth", pa.int64())]
)


def _hits_norm_denom(raw_max: int, scale: int = HITS_SCALE) -> int:
    """Integer normalization divisor of one HITS half-step: after
    ``v // denom`` the max score lands in ``[S, 2S)`` (identity when the
    max is already below ``S``).  Pure integer — batch-invariant."""
    return max(1, raw_max // scale)


def _distinct_directed_edges(edges: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """Globally distinct (src, dst) rows, self-loops dropped — the
    normalization the integer algorithms' flat twins apply, enforced
    here so raw pair lists can't silently double-count mass."""

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(["src", "dst"]).to_pandas()
        df = df[df["src"] != df["dst"]].drop_duplicates(["src", "dst"])
        t = pa.Table.from_pandas(
            df, schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
            preserve_index=False,
        )
        b = stable_bucket_ids(t["src"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column(_BUCKET, pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            g.drop_duplicates(["src", "dst"])[["src", "dst"]],
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
            preserve_index=False,
        )

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(fold, batch_format="pandas")
    )


def _sum_by_node(
    parts: rd.Dataset, nodes_b: rd.Dataset, out_col: str, num_buckets: int
) -> rd.Dataset:
    """Fold ``(node, part)`` contribution rows into one exact int64 sum
    per node of the universe (zero for nodes with no contributions).
    One bucketed aggregation — B vectorized groups, never one per node.
    ``nodes_b`` carries its bucket column already (computed once)."""
    schema = pa.schema([("node", pa.int64()), (out_col, pa.int64())])

    def zero_base(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": batch["node"],
                "part": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
                _BUCKET: batch[_BUCKET],
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("node", as_index=False, sort=False)["part"].sum()
        out = pd.DataFrame(
            {"node": agg["node"].to_numpy(), out_col: agg["part"].to_numpy().astype(np.int64)}
        )
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return (
        parts.union(nodes_b.map_batches(zero_base, batch_format="pyarrow"))
        .groupby(_BUCKET)
        .map_groups(fold, batch_format="pandas")
    )


def hits(
    edges: rd.Dataset,
    iters: int = HITS_ITERS,
    num_buckets: int = 32,
    scale: int = HITS_SCALE,
) -> rd.Dataset:
    """Integer HITS (hubs & authorities) over an edge dataset.

    Input is normalized first (globally distinct (src, dst), self-loops
    dropped — one bucket shuffle), so raw pair lists are safe: the flat
    twin dedups identically and the two must agree bit-for-bit.

    Per iteration two half-steps, each one bucketed hash join (push the
    score across the edge) + one bucketed aggregation (exact int64 sums)
    + one streaming ``max`` scalar for the integer normalization:

        auth_raw[v] = Σ hub[u]  over in-edges (u,v);  auth = raw // denom
        hub_raw[v]  = Σ auth[w] over out-edges (v,w); hub  = raw // denom

    with ``denom = max(1, raw_max // S)`` — every reduction is an exact
    integer sum/max, so the result is partition-invariant.  Hub and auth
    state stay node-universe-sized Datasets throughout; nothing N-sized
    touches the driver.  ``scale`` is the fixed-point resolution dial:
    int64 headroom requires 2·n·scale < 2^63 (checked)."""
    edges = _distinct_directed_edges(edges, num_buckets).materialize()
    nodes = (
        link_nodes(edges, num_buckets=num_buckets)
        .drop_columns(["has_out"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(_HITS_SCHEMA.empty_table())
    _check_int64_headroom(n_nodes, scale, 2, "hits")
    nodes_b = _bucketed_nodes(nodes, num_buckets)

    def end_buckets(batch: pa.Table) -> pa.Table:
        bs = stable_bucket_ids(batch["src"], num_buckets) if batch.num_rows else np.empty(0, np.int32)
        bd = stable_bucket_ids(batch["dst"], num_buckets) if batch.num_rows else np.empty(0, np.int32)
        return batch.append_column("__src_bucket", pa.array(bs, pa.int32())).append_column(
            "__dst_bucket", pa.array(bd, pa.int32())
        )

    edges = edges.map_batches(end_buckets, batch_format="pyarrow").materialize()

    def init(batch: pa.Table) -> pa.Table:
        const = pa.array([scale] * batch.num_rows, pa.int64())
        return batch.append_column("score", const)

    def push(scores: rd.Dataset, key: str, emit: str) -> rd.Dataset:
        """Join scores onto the ``key`` end of every edge and emit a
        ``(node=<other end>, part=score)`` contribution row, bucketed by
        the emit end's precomputed bucket column."""
        side = scores.rename_columns({"node": key})
        joined = bucketed_hash_join(edges, side, on=key, num_buckets=num_buckets)
        emit_bucket = f"__{emit}_bucket"

        def contrib(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"node": batch[emit], "part": batch["score"], _BUCKET: batch[emit_bucket]}
            )

        return joined.map_batches(contrib, batch_format="pyarrow")

    def normalize(raw: rd.Dataset, col: str) -> rd.Dataset:
        raw = raw.materialize()  # consumed twice: max scalar + divide
        denom = _hits_norm_denom(int(raw.max(col) or 0), scale)

        def div(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy() // denom
            return pa.Table.from_pydict(
                {"node": batch["node"], "score": pa.array(v, pa.int64())}
            )

        return raw.map_batches(div, batch_format="pyarrow")

    hub = nodes.map_batches(init, batch_format="pyarrow").materialize()
    auth = hub
    for _ in range(iters):
        auth = normalize(
            _sum_by_node(push(hub, key="src", emit="dst"), nodes_b, "raw", num_buckets),
            "raw",
        ).materialize()
        hub = normalize(
            _sum_by_node(push(auth, key="dst", emit="src"), nodes_b, "raw", num_buckets),
            "raw",
        ).materialize()

    def tag(col: str):  # noqa: ANN202
        def _t(batch: pa.Table) -> pa.Table:
            zero = pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
            cols = {"node": batch["node"], "hub": zero, "auth": zero}
            cols[col] = batch["score"]
            t = pa.Table.from_pydict(cols)
            b = stable_bucket_ids(t["node"], num_buckets) if t.num_rows else np.empty(0, np.int32)
            return t.append_column(_BUCKET, pa.array(b, pa.int32()))

        return _t

    def merge(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("node", as_index=False, sort=False)[["hub", "auth"]].sum()
        out = pd.DataFrame(
            {
                "node": agg["node"].to_numpy(),
                "hub": agg["hub"].to_numpy().astype(np.int64),
                "auth": agg["auth"].to_numpy().astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, schema=_HITS_SCHEMA, preserve_index=False)

    return (
        hub.map_batches(tag("hub"), batch_format="pyarrow")
        .union(auth.map_batches(tag("auth"), batch_format="pyarrow"))
        .groupby(_BUCKET)
        .map_groups(merge, batch_format="pandas")
    )


def hits_flat(
    edges: pd.DataFrame, iters: int = HITS_ITERS, scale: int = HITS_SCALE
) -> pd.DataFrame:
    """Flat single-process twin of :func:`hits` — dense numpy over
    relabeled ids, opposite architecture, identical integer semantics."""
    if edges.empty:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "hub": pd.Series([], dtype="int64"),
                "auth": pd.Series([], dtype="int64"),
            }
        )
    edges = edges.drop_duplicates(["src", "dst"])
    edges = edges[edges["src"] != edges["dst"]]
    node_ids = np.unique(np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()]))
    idx = {n: i for i, n in enumerate(node_ids)}
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    n = len(node_ids)
    hub = np.full(n, scale, dtype=np.int64)
    auth = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        raw = np.zeros(n, dtype=np.int64)
        np.add.at(raw, dst, hub[src])
        auth = raw // _hits_norm_denom(int(raw.max(initial=0)), scale)
        raw = np.zeros(n, dtype=np.int64)
        np.add.at(raw, src, auth[dst])
        hub = raw // _hits_norm_denom(int(raw.max(initial=0)), scale)
    return pd.DataFrame({"node": node_ids.astype(np.int64), "hub": hub, "auth": auth})


def pagerank_flat(
    edges: pd.DataFrame, iters: int = PAGERANK_ITERS, scale: int = PAGERANK_SCALE
) -> pd.DataFrame:
    """Flat single-process twin of :func:`pagerank` — dense numpy over
    relabeled node ids, deliberately unlike the engine's bucketed
    join/aggregate architecture.  Identical integer semantics, so the
    two must agree bit-for-bit (the twin dedups/drops self-loops, which
    the engine's precondition demands the caller has already done)."""
    if edges.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "rank_micros": pd.Series([], dtype="int64")}
        )
    edges = edges.drop_duplicates(["src", "dst"])
    edges = edges[edges["src"] != edges["dst"]]
    node_ids = np.unique(np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()]))
    idx = {n: i for i, n in enumerate(node_ids)}
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    n = len(node_ids)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    rank = np.full(n, scale, dtype=np.int64)
    dangling_mask = outdeg == 0
    safe_deg = np.where(dangling_mask, 1, outdeg)
    for _ in range(iters):
        dangling = int(rank[dangling_mask].sum())
        contrib = rank[src] // safe_deg[src]
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, dst, contrib)
        rank = _teleport_base(dangling, n, scale) + (85 * in_sum) // 100
    return pd.DataFrame({"node": node_ids.astype(np.int64), "rank_micros": rank})


# ---------------------------------------------------------------------------
# k-hop reachability (BFS with min-hop labels from a seed set)
# ---------------------------------------------------------------------------

KHOP_SEED_MOD = 41
KHOP_MAX_HOPS = 3

_KHOP_SCHEMA = pa.schema(
    [("node", pa.int64()), ("hops", pa.int64()), (_BUCKET, pa.int32())]
)


def khop_reach(
    edges: rd.Dataset,
    k: int = KHOP_MAX_HOPS,
    seed_mod: int = KHOP_SEED_MOD,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Min-hop BFS labels: every node reachable within ``k`` hops of the
    seed set (``node % seed_mod == 0``), with its hop distance — the
    crawl-scheduling / neighborhood-sampling primitive.

    Exactly k rounds of (frontier ⋈ edges bucketed join → candidate
    fold); labels carry their node bucket so the per-round min-fold is a
    B-group ``map_groups``, never one Ray group per node and never a
    global sort.  The frontier at round h is the label rows whose min
    hop is exactly h-1 — re-reached nodes fold to their earlier hop, so
    each node is expanded at most once across rounds (textbook BFS
    work bound, O(edges) total over all rounds)."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    nodes = link_nodes(edges, num_buckets=num_buckets)

    def seed(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(node % seed_mod == 0))
        b = stable_bucket_ids(t["node"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return pa.Table.from_pydict(
            {
                "node": t["node"],
                "hops": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                _BUCKET: pa.array(b, pa.int32()),
            },
            schema=_KHOP_SCHEMA,
        )

    labels = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def min_fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("node", as_index=False, sort=False).agg(
            hops=("hops", "min"), **{_BUCKET: (_BUCKET, "first")}
        )
        return pa.Table.from_pandas(agg, schema=_KHOP_SCHEMA, preserve_index=False)

    for h in range(1, k + 1):

        def frontier_rows(batch: pa.Table, want: int = h - 1) -> pa.Table:
            t = batch.filter(pa.compute.equal(batch["hops"], want))
            return pa.Table.from_pydict({"src": t["node"]})

        frontier = labels.map_batches(frontier_rows, batch_format="pyarrow")
        joined = bucketed_hash_join(
            frontier, edges, on="src", num_buckets=num_buckets
        )

        def cand(batch: pa.Table, hop: int = h) -> pa.Table:
            dst = batch["dst"]
            b = (
                stable_bucket_ids(dst, num_buckets)
                if batch.num_rows
                else np.empty(0, np.int32)
            )
            return pa.Table.from_pydict(
                {
                    "node": dst,
                    "hops": pa.array(
                        np.full(batch.num_rows, hop, np.int64), pa.int64()
                    ),
                    _BUCKET: pa.array(b, pa.int32()),
                },
                schema=_KHOP_SCHEMA,
            )

        cands = joined.map_batches(cand, batch_format="pyarrow")
        labels = (
            labels.union(cands)
            .groupby(_BUCKET)
            .map_groups(min_fold, batch_format="pandas")
            .materialize()
        )

    return labels.drop_columns([_BUCKET])


def khop_reach_flat(
    edges: pd.DataFrame, k: int = KHOP_MAX_HOPS, seed_mod: int = KHOP_SEED_MOD
) -> pd.DataFrame:
    """Dense single-process BFS twin of :func:`khop_reach`."""
    edges = edges.drop_duplicates(["src", "dst"])
    edges = edges[edges["src"] != edges["dst"]]
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    hops = {int(n): 0 for n in nodes if int(n) % seed_mod == 0}
    adj: dict[int, list[int]] = {}
    for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
        adj.setdefault(int(s), []).append(int(d))
    frontier = sorted(hops)
    for h in range(1, k + 1):
        nxt = []
        for s in frontier:
            for d in adj.get(s, ()):
                if d not in hops:
                    hops[d] = h
                    nxt.append(d)
        frontier = sorted(set(nxt))
    out = pd.DataFrame(
        {"node": pd.Series(sorted(hops), dtype="int64")}
    )
    out["hops"] = out["node"].map(hops).astype("int64")
    return out


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered node-iterator)
# ---------------------------------------------------------------------------

_TRI_SEP = "\x1f"  # never appears in a hostname
_UND_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])
_ORIENT_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("deg_b", pa.int64()),
        ("__bucket", pa.int32()),
    ]
)
_DEG_SCHEMA = pa.schema([("node", pa.string()), ("n", pa.int64())])
_DEG_U_SCHEMA = pa.schema([("u", pa.string()), ("deg_u", pa.int64())])
_DEG_V_SCHEMA = pa.schema([("v", pa.string()), ("deg_v", pa.int64())])
_NODE_DEG_SCHEMA = pa.schema([("node", pa.string()), ("degree", pa.int64())])
_WEDGE_SCHEMA = pa.schema(
    [
        ("c", pa.string()),
        ("wv", pa.string()),
        ("ww", pa.string()),
        ("pair_key", pa.string()),
    ]
)
_TRI_COUNT_SCHEMA = pa.schema([("node", pa.string()), ("n_triangles", pa.int64())])
_TRI_DEG_SCHEMA = pa.schema(
    [("node", pa.string()), ("n_triangles", pa.int64()), ("degree", pa.int64())]
)


def triangle_counts(
    pairs: rd.Dataset,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    num_buckets: int = 32,
    with_degree: bool = False,
    degrees: str = "broadcast",
) -> rd.Dataset:
    """Per-node triangle participation counts over an undirected graph
    given as (possibly directed, possibly duplicated) string-node pairs
    — the local-clustering / community-density signal of the host graph.

    Degree-ordered node-iterator (the standard distributed scheme —
    Suri & Vassilvitskii's MR triangle counting): orient every
    undirected edge from its lower-(degree, name) endpoint to the
    higher one, so every out-adjacency list is O(sqrt(m)) regardless of
    hubs; each triangle is then counted EXACTLY once — as a wedge
    (v, w) at its minimum-rank vertex closed by the oriented edge
    v→w.  Ray shape: one bucket shuffle for the global undirected
    dedup, degree attachment (see below), a bucket shuffle of oriented
    edges by source for wedge generation, and one bucketed SEMI join
    (stages/joins.py) of wedges against the oriented edge set on the
    composite (v, w) key.  The count is orientation-invariant, so the
    DuckDB oracle may use plain lexicographic orientation — any
    divergence in dedup, degrees, wedges or the closing join shows up
    as a count mismatch.

    ``degrees`` picks how per-node degrees reach the orientation pass
    (the same broadcast/shuffle pair as stages/dedup.py):

    - ``"broadcast"`` (default): the one-row-per-node degree table is
      collected and shipped once via ``ray.put`` — right whenever the
      node universe fits a worker heap (hosts: ~10^7 is fine).
    - ``"join"``: two bucketed hash joins attach ``deg_u``/``deg_v`` to
      the edge stream and the final degree column arrives by a third —
      no driver-side node table at ANY cardinality; the beyond-memory
      route (doc-level graphs, 10^9+ nodes).

    Both modes orient identically and carry ``deg_b`` (the rank-high
    endpoint's degree) ON the oriented edge, so wedge generation never
    looks a degree up again — outputs are bit-identical (parity pytest).
    """
    if degrees not in ("broadcast", "join"):
        raise ValueError(f"degrees must be 'broadcast' or 'join', got {degrees!r}")

    def canon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t[src_col], t[dst_col]))
        s = t[src_col].combine_chunks()
        d = t[dst_col].combine_chunks()
        swap = pc.greater(s, d)
        lo = pc.if_else(swap, d, s)
        hi = pc.if_else(swap, s, d)
        out = pa.Table.from_arrays([lo, hi], schema=_UND_SCHEMA)
        if not out.num_rows:
            return out.append_column("__bucket", pa.array([], pa.int32()))
        key = pc.binary_join_element_wise(lo, hi, _TRI_SEP)
        b = stable_bucket_ids(key, num_buckets)
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    def dedup_bucket(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _UND_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            g.drop_duplicates(["u", "v"])[["u", "v"]],
            schema=_UND_SCHEMA,
            preserve_index=False,
        )

    und = (
        pairs.map_batches(canon, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()  # consumed three times: degrees, orientation, closing join
    )

    # per-node degree: per-batch partial counts -> tiny groupby
    def deg_partial(t: pa.Table) -> pa.Table:
        vc = (
            pd.concat(
                [t["u"].to_pandas(), t["v"].to_pandas()], ignore_index=True
            )
            .value_counts()
            .rename_axis("node")
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(vc, schema=_DEG_SCHEMA, preserve_index=False)

    deg_agg = und.map_batches(deg_partial, batch_format="pyarrow").groupby(
        "node"
    ).sum("n")

    import ray as _ray

    def _orient_math(u: pa.Array, v: pa.Array, du: np.ndarray, dv: np.ndarray) -> pa.Table:
        """Shared rank-orientation: a = low-(degree, name) endpoint."""
        name_lt = pc.less(v, u).to_numpy(zero_copy_only=False)
        swap = (dv < du) | ((dv == du) & name_lt)
        swap_pa = pa.array(swap)
        a = pc.if_else(swap_pa, v, u)
        b = pc.if_else(swap_pa, u, v)
        deg_b = np.where(swap, du, dv).astype(np.int64)
        out = pa.Table.from_arrays(
            [a, b, pa.array(deg_b, pa.int64())], names=["a", "b", "deg_b"]
        )
        bk = (
            stable_bucket_ids(out["a"], num_buckets)
            if out.num_rows
            else np.empty(0, np.int32)
        )
        return out.append_column("__bucket", pa.array(bk, pa.int32()))

    if degrees == "broadcast":
        deg_df = deg_agg.to_pandas()
        deg_map = dict(zip(deg_df["node"], deg_df["sum(n)"].astype(int)))
        deg_ref = _ray.put(deg_map)

        def orient(t: pa.Table) -> pa.Table:
            deg = _ray.get(deg_ref)
            u = t["u"].combine_chunks()
            v = t["v"].combine_chunks()
            du = u.to_pandas().map(deg).to_numpy(dtype=np.int64)
            dv = v.to_pandas().map(deg).to_numpy(dtype=np.int64)
            return _orient_math(u, v, du, dv)

        oriented = und.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        deg_mat = deg_agg.materialize()  # one row per node; consumed 2-3x

        def _deg_named(schema: pa.Schema) -> rd.Dataset:
            def rename(t: pa.Table) -> pa.Table:
                return pa.Table.from_arrays(
                    [
                        t["node"].combine_chunks(),
                        t["sum(n)"].cast(pa.int64()).combine_chunks(),
                    ],
                    schema=schema,
                )

            return deg_mat.map_batches(rename, batch_format="pyarrow")

        with_du = bucketed_hash_join(
            und,
            _deg_named(_DEG_U_SCHEMA),
            on="u",
            num_buckets=num_buckets,
            how="inner",
            schemas=(_UND_SCHEMA, _DEG_U_SCHEMA),
        )
        _UND_DU = pa.schema(
            [("u", pa.string()), ("v", pa.string()), ("deg_u", pa.int64())]
        )
        with_duv = bucketed_hash_join(
            with_du,
            _deg_named(_DEG_V_SCHEMA),
            on="v",
            num_buckets=num_buckets,
            how="inner",
            schemas=(_UND_DU, _DEG_V_SCHEMA),
        )

        def orient_joined(t: pa.Table) -> pa.Table:
            u = t["u"].combine_chunks()
            v = t["v"].combine_chunks()
            du = t["deg_u"].to_numpy(zero_copy_only=False).astype(np.int64)
            dv = t["deg_v"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _orient_math(u, v, du, dv)

        oriented = with_duv.map_batches(
            orient_joined, batch_format="pyarrow"
        ).materialize()

    def wedges_bucket(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _WEDGE_SCHEMA.empty_table()
        # rank-sort once for the whole bucket: neighbors of each source
        # come out (degree, name)-ordered, so triu pairs are oriented
        g = g.sort_values(["a", "deg_b", "b"], kind="mergesort")
        cs: list[str] = []
        vs: list[str] = []
        ws: list[str] = []
        for c, grp in g.groupby("a", sort=False):
            ns = grp["b"].to_numpy(dtype=object)
            if len(ns) < 2:
                continue
            ii, jj = np.triu_indices(len(ns), k=1)
            cs.extend([c] * len(ii))
            vs.extend(ns[ii])
            ws.extend(ns[jj])
        va = pa.array(vs, pa.string())
        wa = pa.array(ws, pa.string())
        keys = (
            pc.binary_join_element_wise(va, wa, _TRI_SEP)
            if len(vs)
            else pa.array([], pa.string())
        )
        return pa.Table.from_arrays(
            [pa.array(cs, pa.string()), va, wa, keys], schema=_WEDGE_SCHEMA
        )

    wedges = (
        oriented.groupby("__bucket")
        .map_groups(wedges_bucket, batch_format="pandas")
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"pair_key": pa.array([], pa.string())})
        keys = pc.binary_join_element_wise(
            t["a"].combine_chunks(), t["b"].combine_chunks(), _TRI_SEP
        )
        return pa.table({"pair_key": keys})

    closing = oriented.map_batches(edge_keys, batch_format="pyarrow")
    # wedges' lineage crosses two shuffles — hand the join its schemas
    # so it does not execute the wedge pipeline once extra to infer them
    triangles = bucketed_hash_join(
        wedges,
        closing,
        on="pair_key",
        num_buckets=num_buckets,
        how="semi",
        schemas=(_WEDGE_SCHEMA, pa.schema([("pair_key", pa.string())])),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        vc = (
            pd.concat(
                [t["c"].to_pandas(), t["wv"].to_pandas(), t["ww"].to_pandas()],
                ignore_index=True,
            )
            .value_counts()
            .rename_axis("node")
            .reset_index(name="n")
        )
        out = pa.Table.from_pandas(vc, schema=_DEG_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(out["node"], num_buckets)
            if out.num_rows
            else np.empty(0, np.int32)
        )
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    want_deg_inline = with_degree and degrees == "broadcast"
    out_schema = _TRI_DEG_SCHEMA if want_deg_inline else _TRI_COUNT_SCHEMA

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        # typed empty on the all-empty path (the _typed_table rule) so a
        # triangle-free graph still yields the declared schema
        if g.empty:
            return out_schema.empty_table()
        agg = g.groupby("node", as_index=False)["n"].sum()
        agg = agg.rename(columns={"n": "n_triangles"})
        if want_deg_inline:
            deg = _ray.get(deg_ref)
            agg["degree"] = agg["node"].map(deg).astype(np.int64)
        return pa.Table.from_pandas(
            agg, schema=out_schema, preserve_index=False
        )

    counts = (
        triangles.map_batches(count_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
    )
    if not with_degree or degrees == "broadcast":
        return counts
    # join mode + degree: one more bucketed join — no driver node table
    deg_named = deg_mat.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t["node"].combine_chunks(),
                t["sum(n)"].cast(pa.int64()).combine_chunks(),
            ],
            schema=_NODE_DEG_SCHEMA,
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        counts,
        deg_named,
        on="node",
        num_buckets=num_buckets,
        how="inner",
        schemas=(_TRI_COUNT_SCHEMA, _NODE_DEG_SCHEMA),
    )
    return joined.map_batches(
        lambda t: t.select(["node", "n_triangles", "degree"]),
        batch_format="pyarrow",
    )
