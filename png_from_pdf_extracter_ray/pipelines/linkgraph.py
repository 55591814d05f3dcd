"""Link-graph queries over the pages corpus.

Eight query surfaces on top of ``stages/linkgraph.py``:

- ``page_links_digest`` — the raw hyperlink table reduced to one
  XOR-of-blake2b row (the ``pages_digest`` pattern): any link row that
  differs by one byte flips the digest, so the driver hash-checks the
  WHOLE extraction without shipping it;
- ``link_out_degree_hist`` — out-links-per-page histogram (the crawl
  connectivity diagnostic; low-cardinality key, partial counts per
  batch before the groupby);
- ``linkgraph_pagerank`` / ``linkgraph_hits`` — integer PageRank and
  HITS over the doc→doc graph (distributed join/aggregate iterations;
  ``stages/linkgraph.py``);
- ``linkgraph_components`` — weakly-connected components via
  large/small-star (``stages/linkgraph.star_components``);
- ``link_in_degree_topk`` / ``anchor_text_top_terms`` — in-degree and
  anchor-term aggregates (hash-bucketed; never one Ray group per key);
- ``crawl_frontier_urls`` — distinct uncrawled out-link urls (bucketed
  anti-join against the crawled-url column).

All eight are SQL-checked against flat single-process oracle parquets
(pipelines/rowsonly_oracles.py ``write_linkgraph_oracles`` /
``write_linkgraph_graph_oracles`` / ``write_crawl_frontier_oracle``)
built from the SAME link kernel but an opposite (dense, no-Ray)
architecture.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..kernel.links import extract_links
from ..stages.dedup import stable_bucket_ids
from ..stages.linkgraph import (
    HITS_ITERS,
    PAGERANK_ITERS,
    doc_edges,
    hits,
    page_links,
    pagerank,
)

LINKS_DIGEST_COLS = ["n_links", "n_internal", "n_doc_links", "xor_digest"]
TOP_INDEGREE_K = 50
TOP_ANCHOR_TERMS_K = 100
# Explicit whitespace class (never \s in a contract regex — ROUND_NOTES).
_WS_CHARS = " \t\r\n\f\v"


def _deduped_pages_payloads(sf_dir: str) -> rd.Dataset:
    """Deduped pages corpus (url, html) — keep-first-by-warc_ts, the same
    universe as every other page-level oracle."""
    from ..sources.pages_source import synthesize_pages
    from ..stages.dedup import dedup_keep_first

    pages = synthesize_pages(sf_dir, expand=2).select_columns(["url", "warc_ts", "html"])
    return dedup_keep_first(pages, key="url", order_col="warc_ts").drop_columns(
        ["warc_ts"]
    )


def link_row_key(src_url: str, href: str, anchor: str, is_internal: int, dst_doc: int) -> bytes:
    """Canonical serialization of one link row (shared with the oracle)."""
    return f"{src_url}|{href}|{anchor}|{is_internal}|{dst_doc}".encode()


def links_digest_frame(t: pa.Table) -> pd.DataFrame:
    """One digest row for a links table chunk (engine partial = oracle
    whole-table call; XOR is order- and partition-invariant)."""
    acc = np.uint64(0)
    src = t["src_url"].to_pylist()
    href = t["href"].to_pylist()
    anchor = t["anchor"].to_pylist()
    internal = t["is_internal"].to_pylist()
    dst = t["dst_doc"].to_pylist()
    for row in zip(src, href, anchor, internal, dst):
        d = hashlib.blake2b(link_row_key(*row), digest_size=8).digest()
        acc ^= np.uint64(int.from_bytes(d, "big"))
    return pd.DataFrame(
        {
            "n_links": [t.num_rows],
            "n_internal": [int(sum(internal))],
            "n_doc_links": [int(sum(1 for x in dst if x >= 0))],
            "xor_digest": [int(acc.astype(np.int64))],
        }
    )


def _combine_digest_partials(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "n_links": [int(df["n_links"].sum())],
            "n_internal": [int(df["n_internal"].sum())],
            "n_doc_links": [int(df["n_doc_links"].sum())],
            "xor_digest": [
                int(
                    np.bitwise_xor.reduce(
                        df["xor_digest"].to_numpy(dtype=np.int64).view(np.uint64)
                    ).astype(np.int64)
                )
            ],
        }
    )


def page_links_digest(sf_dir: str) -> pd.DataFrame:
    """Hyperlink extraction attested as one digest row."""
    links = page_links(_deduped_pages_payloads(sf_dir))
    partials = links.map_batches(
        lambda t: links_digest_frame(t), batch_format="pyarrow", batch_size=2048
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame({c: [0] for c in LINKS_DIGEST_COLS})
    return _combine_digest_partials(partials)[LINKS_DIGEST_COLS]


def link_out_degree_hist(sf_dir: str) -> pd.DataFrame:
    """Pages per out-degree (every deduped page counts, 0-link pages
    included — PDFs and adversarial payloads land in the 0 bin)."""

    def per_page(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        degs = [len(extract_links(p, u)) for u, p in zip(urls, payloads)]
        out = pd.Series(degs, dtype="int64").value_counts()
        return pa.Table.from_pydict(
            {
                "out_degree": pa.array(out.index.to_numpy(np.int64), pa.int64()),
                "n": pa.array(out.to_numpy(np.int64), pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("out_degree", as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out.rename(columns={"n": "n_pages"}),
            schema=pa.schema([("out_degree", pa.int64()), ("n_pages", pa.int64())]),
            preserve_index=False,
        )

    out = (
        _deduped_pages_payloads(sf_dir)
        .map_batches(per_page, batch_format="pyarrow", batch_size=64)
        .groupby("out_degree")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {"out_degree": pd.Series([], dtype="int64"), "n_pages": pd.Series([], dtype="int64")}
        )
    return out.sort_values("out_degree", ignore_index=True)


def linkgraph_pagerank(sf_dir: str, iters: int = PAGERANK_ITERS) -> pd.DataFrame:
    """Integer PageRank over the doc→doc related-link graph.

    The operator (stages/linkgraph.pagerank) returns the N-sized rank
    Dataset; the driver-side collect+sort lives only here, in the query
    wrapper, for the oracle comparison."""
    edges = doc_edges(_deduped_pages_payloads(sf_dir))
    out = pagerank(edges, iters=iters).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "rank_micros": pd.Series([], dtype="int64")}
        )
    return out.sort_values("node", ignore_index=True)


def linkgraph_components(sf_dir: str) -> pd.DataFrame:
    """Weakly-connected components of the doc→doc link graph — the
    site/cluster structure prior (which documents form one linked
    neighborhood).  Runs distributed large-star/small-star
    (stages/linkgraph.star_components — O(log² n) rounds; the near-dup
    min-label propagation is O(diameter), hopeless on chain-like link
    graphs); SQL-checked against a DRIVER union-find over the flat edge
    list (opposite architecture, identical labels).  The operator
    returns the N-sized label Dataset; collect+sort happens only in
    this wrapper, for the oracle comparison."""
    from ..stages.linkgraph import star_components

    edges = doc_edges(_deduped_pages_payloads(sf_dir)).select_columns(["src", "dst"])
    pairs = edges.map_batches(
        lambda t: t.rename_columns(["u", "v"]), batch_format="pyarrow"
    )
    out = star_components(pairs).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "component": pd.Series([], dtype="int64")}
        )
    out = out.rename(columns={"id": "node", "label": "component"})
    return out.sort_values("node", ignore_index=True)[["node", "component"]]


def linkgraph_hits(sf_dir: str, iters: int = HITS_ITERS) -> pd.DataFrame:
    """Integer HITS hub/authority scores over the doc→doc link graph.
    Operator returns the N-sized Dataset; this wrapper collects+sorts
    only for the oracle comparison."""
    edges = doc_edges(_deduped_pages_payloads(sf_dir))
    out = hits(edges, iters=iters).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "hub": pd.Series([], dtype="int64"),
                "auth": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("node", ignore_index=True)[["node", "hub", "auth"]]


def link_in_degree_topk(sf_dir: str, k: int = TOP_INDEGREE_K, num_buckets: int = 32) -> pd.DataFrame:
    """Top-k document nodes by raw in-link count (every link row counts,
    page multiplicity included).  Partial counts per batch → hash-bucket
    sum → per-bucket top-k prune sharing the final total order
    (n_inlinks desc, dst_doc asc)."""
    links = page_links(_deduped_pages_payloads(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["dst_doc"] >= 0]
        out = df.groupby("dst_doc", as_index=False, sort=False).size()
        out = out.rename(columns={"size": "n"})
        tt = pa.Table.from_pandas(
            out, schema=pa.schema([("dst_doc", pa.int64()), ("n", pa.int64())]),
            preserve_index=False,
        )
        b = stable_bucket_ids(tt["dst_doc"], num_buckets) if tt.num_rows else np.empty(0, np.int32)
        return tt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("dst_doc", as_index=False, sort=False)["n"].sum()
        out = out.sort_values(["n", "dst_doc"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            out.rename(columns={"n": "n_inlinks"}),
            schema=pa.schema([("dst_doc", pa.int64()), ("n_inlinks", pa.int64())]),
            preserve_index=False,
        )

    out = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"dst_doc": pd.Series([], dtype="int64"), "n_inlinks": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["n_inlinks", "dst_doc"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def crawl_frontier_urls(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """Crawl frontier: distinct out-link URLs that are NOT in the crawled
    url set — the next fetch wave of a crawler.  Distinct hrefs via one
    hash-bucket dedup (never a Ray group per url), then a bucketed ANTI
    join against the slim crawled-url column; the href table and the url
    universe both stay distributed.  Returns (href, n_refs) with n_refs =
    number of link rows pointing at the frontier url; the anti-join
    output is a Dataset until this wrapper's collect+sort for the
    oracle comparison."""
    from ..sources.pages_source import synthesize_pages
    from ..stages.joins import bucketed_hash_join

    links = page_links(_deduped_pages_payloads(sf_dir)).select_columns(["href"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("href", as_index=False, sort=False).size()
        tt = pa.Table.from_pandas(
            df.rename(columns={"size": "n"}),
            schema=pa.schema([("href", pa.string()), ("n", pa.int64())]),
            preserve_index=False,
        )
        b = stable_bucket_ids(tt["href"], num_buckets) if tt.num_rows else np.empty(0, np.int32)
        return tt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("href", as_index=False, sort=False)["n"].sum()
        return pa.Table.from_pandas(
            out.rename(columns={"n": "n_refs"}),
            schema=pa.schema([("href", pa.string()), ("n_refs", pa.int64())]),
            preserve_index=False,
        )

    distinct_hrefs = (
        links.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )
    crawled = (
        synthesize_pages(sf_dir, expand=2)
        .select_columns(["url"])
        .map_batches(lambda t: t.rename_columns(["href"]), batch_format="pyarrow")
    )
    frontier = bucketed_hash_join(
        distinct_hrefs, crawled, on="href", num_buckets=num_buckets, how="anti"
    ).to_pandas()
    if frontier.empty:
        return pd.DataFrame(
            {"href": pd.Series([], dtype=object), "n_refs": pd.Series([], dtype="int64")}
        )
    return frontier.sort_values("href", ignore_index=True)[["href", "n_refs"]]


def anchor_terms_tokens(anchor: str) -> list[str]:
    """Anchor tokenization contract (shared with the oracle): lowercase,
    split on the explicit whitespace class."""
    out = []
    for ch in _WS_CHARS:
        anchor = anchor.replace(ch, " ")
    for tok in anchor.lower().split(" "):
        if tok:
            out.append(tok)
    return out


def anchor_text_top_terms(
    sf_dir: str, k: int = TOP_ANCHOR_TERMS_K, num_buckets: int = 32
) -> pd.DataFrame:
    """Top-k anchor-text terms across the whole link table — the
    anchor-text corpus diagnostic.  Order: (n desc, term asc)."""
    links = page_links(_deduped_pages_payloads(sf_dir)).select_columns(["anchor"])

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for a in t["anchor"].to_pylist():
            for tok in anchor_terms_tokens(a):
                counts[tok] = counts.get(tok, 0) + 1
        tt = pa.Table.from_pydict(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )
        b = stable_bucket_ids(tt["term"], num_buckets) if tt.num_rows else np.empty(0, np.int32)
        return tt.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("term", as_index=False, sort=False)["n"].sum()
        out = out.sort_values(["n", "term"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("term", pa.string()), ("n", pa.int64())]),
            preserve_index=False,
        )

    out = (
        links.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["n", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def domain_link_matrix(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """Inter-domain link matrix: link-row counts per
    ``(src_domain, dst_domain)`` — the host-level graph that drives
    domain-reputation priors, spam-farm detection and crawl politeness
    budgets (the page-level graph aggregated to its ~10^7-host quotient,
    which is what actually fits in an analyst's hands at web scale).

    hrefs are already absolute (kernel/links.py resolves against the
    page url), so the destination domain is a regex extract; non-http(s)
    targets (mailto:, fragments) map to the '' domain and are kept — the
    oracle does the same.  Partial counts per batch shrink the shuffle
    to ~|domains|² partials; the pair key hash-buckets into B vectorized
    groups (never one Ray group per domain pair)."""
    from .data_quality import DOMAIN_RE

    links = page_links(_deduped_pages_payloads(sf_dir)).select_columns(
        ["src_url", "href"]
    )
    schema = pa.schema(
        [("src_domain", pa.string()), ("dst_domain", pa.string()), ("n_links", pa.int64())]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return schema.empty_table().append_column(
                "__bucket", pa.array([], pa.int32())
            )
        out = (
            pd.DataFrame(
                {
                    "src_domain": df["src_url"].str.extract(DOMAIN_RE, expand=False).fillna(""),
                    "dst_domain": df["href"].str.extract(DOMAIN_RE, expand=False).fillna(""),
                }
            )
            .groupby(["src_domain", "dst_domain"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n_links"})
        )
        t = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
        key = pa.array(
            (out["src_domain"] + "|" + out["dst_domain"]).to_numpy(dtype=object),
            pa.string(),
        )
        b = stable_bucket_ids(key, num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["src_domain", "dst_domain"], as_index=False, sort=False)[
            "n_links"
        ].sum()
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    out = (
        links.map_batches(partial, batch_format="pandas", batch_size=2048)
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                "src_domain": pd.Series([], dtype=object),
                "dst_domain": pd.Series([], dtype=object),
                "n_links": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values(["src_domain", "dst_domain"], ignore_index=True)


def link_khop_reach(sf_dir: str) -> pd.DataFrame:
    """Nodes reachable within KHOP_MAX_HOPS of the deterministic seed
    set (``node % KHOP_SEED_MOD == 0``) with min-hop distances — the
    crawl-scheduling / neighborhood-sampling query.  Distributed BFS
    (stages/linkgraph.khop_reach: bucketed frontier⋈edges joins +
    B-group min folds); the oracle is a DuckDB RECURSIVE CTE over the
    flat edge parquet — a fully declarative opposite architecture."""
    from ..stages.linkgraph import khop_reach

    edges = doc_edges(_deduped_pages_payloads(sf_dir))
    out = khop_reach(edges).to_pandas()
    return out.sort_values("node", ignore_index=True)[["node", "hops"]]


# ---------------------------------------------------------------------------
# Host-level PageRank (the domain quotient of the page graph)
# ---------------------------------------------------------------------------


def host_node_id(host: str) -> int:
    """Deterministic int64 node id for a host string (the pagerank
    operator's node space is int64).  Shared with the flat oracle by the
    single-implementation rule — the id IS the contract; md5 over ~10^7
    hosts has no realistic collision."""
    d = hashlib.md5(f"host:{host}".encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big", signed=True)


_HP_SCHEMA = pa.schema([("src_host", pa.string()), ("dst_host", pa.string())])


def _host_pairs(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Host quotient edge stream, cached as parquet per (corpus, engine
    version): the three host-graph queries (pagerank / triangles /
    clustering coeff) compose on the same ~12-15 s link-extraction +
    join pipeline — the first call builds and commits the edge parquet
    (state/dscache.py atomic-rename protocol), every later call is a
    two-column pruned read."""
    from ..state.dscache import cache_tag, cached_parquet

    path = cached_parquet(
        cache_tag(sf_dir, "host_pairs", num_buckets),
        lambda: _host_pairs_build(sf_dir, num_buckets),
    )
    return rd.read_parquet(path, columns=["src_host", "dst_host"])


def _host_pairs_build(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Distinct (src_host, dst_host) edges of the HOST QUOTIENT of the
    doc→doc link graph: a link row ``(src_url, dst_doc)`` contributes an
    edge from the source page's host to EVERY host serving the target
    document (the url↔doc map from the deduped page universe) — raw
    href hosts alone would miss mirrored/variant serving.  Self-loops
    dropped, locally pre-deduped; the doc→host attachment is ONE
    bucketed hash join on the int64 doc id."""
    from ..kernel.links import src_doc_of_url
    from ..stages.joins import bucketed_hash_join
    from .data_quality import DOMAIN_RE

    links = page_links(_deduped_pages_payloads(sf_dir)).select_columns(
        ["src_url", "dst_doc"]
    )

    _SRC_SCHEMA = pa.schema([("src_host", pa.string()), ("dst_doc", pa.int64())])

    def src_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "src_host": pd.Series(t["src_url"].to_pylist(), dtype=object)
                .str.extract(DOMAIN_RE, expand=False)
                .fillna(""),
                "dst_doc": t["dst_doc"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df = df[df["dst_doc"] >= 0].drop_duplicates()
        return pa.Table.from_pandas(df, schema=_SRC_SCHEMA, preserve_index=False)

    _DOC_HOST_SCHEMA = pa.schema([("dst_doc", pa.int64()), ("dst_host", pa.string())])

    def doc_hosts(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        df = pd.DataFrame(
            {
                "dst_doc": np.fromiter(
                    (src_doc_of_url(u) for u in urls), dtype=np.int64, count=len(urls)
                ),
                "dst_host": pd.Series(urls, dtype=object)
                .str.extract(DOMAIN_RE, expand=False)
                .fillna(""),
            }
        )
        df = df[df["dst_doc"] >= 0].drop_duplicates()
        return pa.Table.from_pandas(df, schema=_DOC_HOST_SCHEMA, preserve_index=False)

    # url universe only — skip payload synthesis (include_html=False) and
    # dedup on the slim (url, warc_ts) projection
    from ..sources.pages_source import synthesize_pages
    from ..stages.dedup import dedup_keep_first

    slim = synthesize_pages(sf_dir, expand=2, include_html=False).select_columns(
        ["url", "warc_ts"]
    )
    doc_host_ds = (
        dedup_keep_first(slim, key="url", order_col="warc_ts")
        .drop_columns(["warc_ts"])
        .map_batches(doc_hosts, batch_format="pyarrow")
    )
    # both sides are lazy lineages that cross the url-dedup shuffle —
    # pass the statically-known schemas so the join does not execute a
    # full upstream pass per side just to infer them (joins.py note)
    joined = bucketed_hash_join(
        links.map_batches(src_rows, batch_format="pyarrow"),
        doc_host_ds,
        on="dst_doc",
        how="inner",
        schemas=(_SRC_SCHEMA, _DOC_HOST_SCHEMA),
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.select(["src_host", "dst_host"]).to_pandas()
        df = df[df["src_host"] != df["dst_host"]].drop_duplicates()
        return pa.Table.from_pandas(df, schema=_HP_SCHEMA, preserve_index=False)

    return joined.map_batches(finish, batch_format="pyarrow")


def host_pagerank(sf_dir: str, iters: int = PAGERANK_ITERS) -> pd.DataFrame:
    """Integer PageRank over the HOST quotient graph (distinct
    host→host edges from the hyperlink table) — the domain-authority
    prior a crawler uses for scheduling and a curation pipeline uses as
    a quality feature; at web scale the ~10^7-host quotient is what a
    rank computation can afford to iterate on.

    Composition: host pairs from the streaming link kernel → md5 node
    ids (host_node_id, shared with the flat twin) → the standard
    ``doc_edges`` bucket normalization (distinct + out-degree per src
    group) → the integer ``pagerank`` operator (fixed-point, partition-
    invariant).  The id→host map is the small side (one row per host),
    collected and applied in the wrapper — the rank computation itself
    never leaves Datasets.  SQL-checked against ``pagerank_flat`` over
    the same flat host edges (dense numpy, opposite architecture)."""
    from ..stages.dedup import stable_bucket_ids as _sbi
    from ..stages.linkgraph import _edges_bucket

    hp = _host_pairs(sf_dir).materialize()  # consumed twice: edges + id map

    def to_ids(t: pa.Table) -> pa.Table:
        src = [host_node_id(h) for h in t["src_host"].to_pylist()]
        dst = [host_node_id(h) for h in t["dst_host"].to_pylist()]
        out = pa.Table.from_pydict(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
        b = _sbi(out["src"], 32) if out.num_rows else np.empty(0, np.int32)
        return out.append_column("__bucket", pa.array(b, pa.int32()))

    edges = (
        hp.map_batches(to_ids, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_edges_bucket, batch_format="pandas")
    )
    ranks = pagerank(edges, iters=iters).to_pandas()

    # id → host map: one row per distinct host, the documented small side
    hosts_df = hp.to_pandas()
    hosts = pd.unique(
        np.concatenate([hosts_df["src_host"].to_numpy(), hosts_df["dst_host"].to_numpy()])
    )
    idmap = {host_node_id(h): h for h in hosts}
    if ranks.empty:
        return pd.DataFrame(
            {
                "host": pd.Series([], dtype=str),
                "rank_micros": pd.Series([], dtype="int64"),
            }
        )
    out = pd.DataFrame(
        {
            "host": ranks["node"].map(idmap),
            "rank_micros": ranks["rank_micros"].astype("int64"),
        }
    )
    return out.sort_values("host", ignore_index=True)


def host_triangle_counts(sf_dir: str) -> rd.Dataset:
    """Per-host triangle participation over the HOST quotient graph —
    the community-density / mirror-cluster signal of the crawl (mirror
    constellations and navigational cliques show up as dense triangle
    neighborhoods; isolated spam hosts show none).

    Composition: the same ``_host_pairs`` edge stream as
    ``host_pagerank`` → ``stages/linkgraph.triangle_counts``
    (degree-ordered node-iterator: bucketed undirected dedup, broadcast
    degree map, wedge generation per source bucket, one bucketed SEMI
    join closing wedges against the oriented edge set).  SQL-checked
    against a flat host-edges parquet
    (rowsonly_oracles.write_host_edges_oracle) closed declaratively by
    DuckDB's triple self-join under LEXICOGRAPHIC orientation — the
    triangle multiset is orientation-invariant, so the two opposite
    architectures must agree exactly."""
    from ..stages.linkgraph import triangle_counts

    out = triangle_counts(_host_pairs(sf_dir), "src_host", "dst_host")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["host", "n_triangles"])

    return out.map_batches(rename, batch_format="pyarrow")


CC_SCALE = 1_000_000


def host_clustering_coeff(sf_dir: str) -> rd.Dataset:
    """Per-host LOCAL clustering coefficient (micros) over the host
    quotient graph: ``cc = 2·triangles / (degree·(degree−1))`` — how
    clique-like a host's neighborhood is (mirror constellations ≈ 1.0,
    hub-and-spoke link farms ≈ 0).  Exact integer output
    ``(2·tri·10^6) // (d·(d−1))`` so the DuckDB twin (triangle closure
    + degree fold over the flat host-edges parquet) matches bit-for-bit.
    Only hosts participating in ≥1 triangle appear (cc of a
    triangle-free host is 0 by definition and is omitted, matching the
    oracle's inner join).  Same machinery as ``host_triangle_counts``
    with the degree column carried through."""
    from ..stages.linkgraph import triangle_counts

    out = triangle_counts(
        _host_pairs(sf_dir), "src_host", "dst_host", with_degree=True
    )

    _CC_SCHEMA = pa.schema(
        [
            ("host", pa.string()),
            ("degree", pa.int64()),
            ("n_triangles", pa.int64()),
            ("cc_micros", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        node = t["node"].to_pylist()
        tri = t["n_triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = (2 * tri * CC_SCALE) // (deg * (deg - 1))
        return pa.Table.from_arrays(
            [
                pa.array(node, pa.string()),
                pa.array(deg, pa.int64()),
                pa.array(tri, pa.int64()),
                pa.array(cc, pa.int64()),
            ],
            schema=_CC_SCHEMA,
        )

    return out.map_batches(finish, batch_format="pyarrow")


def search_index_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Serve-ready head of a web search index — the composition entry
    for the SEARCH side of the engine (the curation side's analog is
    ``curation_funnel``): every completed titled page joined to its
    document node's integer PageRank, top-k by (rank DESC, url ASC).
    This is the join a crawl-to-index pipeline ships to the serving
    tier: url, display title, static rank.

    Ray shape: the title index is a streaming filter/projection over
    the cached extraction parquet (pages_title_index); the rank vector
    is the N-sized ``pagerank`` Dataset; they meet in ONE bucketed hash
    join keyed by the document node id (parsed from the url by the same
    kernel regex the link extractor uses), with both side schemas
    passed statically (lesson 27 — the rank side's lineage crosses a
    shuffle).  Per-batch local top-k prunes the join output (a url
    appears in exactly one batch), so only k rows per batch reach the
    driver.  Untitled pages (PDFs, dead letters) and nodes outside the
    link graph drop out of the inner join on both sides.
    """
    from ..stages.joins import bucketed_hash_join
    from .textops import pages_title_index

    titled_schema = pa.schema(
        [
            ("url", pa.string()),
            ("title", pa.string()),
            ("title_chars", pa.int64()),
            ("content_type", pa.string()),
            ("node", pa.int64()),
        ]
    )
    ranks_schema = pa.schema([("node", pa.int64()), ("rank_micros", pa.int64())])

    # the full-url anchored form of the kernel's ^/doc/(\d+)-\d+$ path
    # contract (kernel/links.py _SRC_DOC_RE) — vectorized, and spelled
    # identically in the oracle SQL so engine and oracle parse (or
    # reject) the same urls
    _NODE_RE = r"^https?://[^/]+/doc/(\d+)-\d+$"

    def add_node(t: pa.Table) -> pa.Table:
        nodes = (
            pd.Series(t["url"].to_pylist(), dtype=object)
            .str.extract(_NODE_RE, expand=False)
            .fillna(-1)
            .astype("int64")
            .to_numpy()
        )
        return t.append_column("node", pa.array(nodes, pa.int64()))

    titled = pages_title_index(sf_dir).map_batches(add_node, batch_format="pyarrow")
    ranks = pagerank(doc_edges(_deduped_pages_payloads(sf_dir)))
    joined = bucketed_hash_join(
        titled, ranks, on="node", how="inner", schemas=(titled_schema, ranks_schema)
    )

    def prune(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("rank_micros", "descending"), ("url", "ascending")]
        ).slice(0, k)

    out = joined.map_batches(prune, batch_format="pyarrow").to_pandas()
    cols = ["url", "title", "rank_micros"]
    if out.empty:
        return pa.schema(
            [("url", pa.string()), ("title", pa.string()), ("rank_micros", pa.int64())]
        ).empty_table().to_pandas()
    return (
        out.sort_values(["rank_micros", "url"], ascending=[False, True], ignore_index=True)
        .head(k)[cols]
        .reset_index(drop=True)
    )
