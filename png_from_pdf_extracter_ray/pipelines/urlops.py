"""URL canonicalization and canonical-url dedup over the pages table.

Real Common-Crawl url columns are MESSY: the same resource appears under
mixed-case hosts, explicit default ports, trailing slashes, tracking
query parameters (``utm_*`` / ``fbclid`` / ``gclid`` / ``ref``) in
arbitrary order, and fragments.  A crawl pipeline must canonicalize
before any url-keyed dedup or the duplicate groups silently fracture.
The synthetic corpus's urls are clean by construction (corpus/synth.py
``page_url``), so this module first derives a deterministic MESSY form
per page row (:func:`messy_url` — noise is a pure function of
``(url, warc_us)``; "real" query params are a pure function of the url
alone so every snapshot of a url canonicalizes identically), then
provides two operators over it:

- :func:`url_canonicalize` — per-row ``raw_url → canonical_url`` map
  (stateless streaming ``map_batches``; nothing shuffles).
- :func:`canonical_url_dedup` — groupby canonical url: snapshot count,
  distinct raw forms, first/last crawl micros.  The standard B-bucket
  hash shuffle over slim ``(canonical_url, raw_url, warc_us)`` rows
  (stages/dedup.stable_bucket_ids): B vectorized pandas groups, never a
  Ray group per url.

Canonicalization spec (mirrored step-for-step by an INDEPENDENT DuckDB
implementation in ``__ray_entry__.oracle_sql`` — regexp/string-function
SQL over a flat messy-urls parquet, rowsonly_oracles.write_messy_urls_oracle):

1. drop the fragment (everything from the first ``#``);
2. split off the query string at the first ``?``;
3. authority = the ``scheme://host[:port]`` prefix (regex
   ``^[A-Za-z][A-Za-z0-9+.-]*://[^/]*``), lowercased;
4. strip the scheme's default port (``:443`` for https, ``:80`` for
   http);
5. strip ONE trailing slash from the path; a bare ``/`` path collapses
   to the empty path;
6. drop query params named ``utm_*`` / ``fbclid`` / ``gclid`` / ``ref``,
   sort the survivors bytewise, re-join with ``&``.

Scale notes (100 TB): canonicalization is a per-row compiled-regex
string parse inside ``map_batches`` — the same cost class as the
corpus's md5 fingerprint loops (ROUND_NOTES.md: hashlib/str-parse rows
are the accepted exception to the no-Python-rows rule when the kernel
has no Arrow equivalent); it streams with zero cross-row state.  The
dedup shuffle moves only ~100-byte slim rows — payloads never travel.

Reference analog: the groupby-url dedup of SURVEY.md §2 #12
(/root/reference/src/main.py re-polls the same INBOX; here the re-seen
key is additionally obscured by url noise, which canonicalization
removes before the same keep/group semantics apply).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..corpus.synth import _h
from ..sources.pages_source import synthesize_pages
from ..stages.dedup import stable_bucket_ids

_MESSY_SCHEMA = pa.schema([("raw_url", pa.string()), ("warc_us", pa.int64())])

_CANON_SCHEMA = pa.schema(
    [
        ("raw_url", pa.string()),
        ("warc_us", pa.int64()),
        ("canonical_url", pa.string()),
    ]
)

_DEDUP_SCHEMA = pa.schema(
    [
        ("canonical_url", pa.string()),
        ("n_snapshots", pa.int64()),
        ("n_raw_forms", pa.int64()),
        ("first_us", pa.int64()),
        ("last_us", pa.int64()),
    ]
)

# step 3: scheme://authority prefix (authority = everything up to the
# first path slash).  Spelled identically in the oracle SQL.
_AUTH_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*")
# step 6: tracking-param names.  Spelled identically in the oracle SQL.
_TRACK_RE = re.compile(r"^(utm_[a-z0-9_]*|fbclid|gclid|ref)=")

_TRACK_POOL = [
    "utm_source=feed",
    "utm_medium=cpc",
    "utm_campaign=c{h9}",
    "fbclid=F{h1000}",
    "gclid=G{h1000}",
    "ref=social",
]


def messy_url(url: str, warc_us: int) -> str:
    """Deterministic messy variant of a clean corpus url.

    Noise (case, port, slash, tracking params, param order, fragment)
    is a pure function of ``(url, warc_us)``; retained "real" params are
    a pure function of ``url`` alone — so every snapshot of a url maps
    back to ONE canonical form.  Shared with the flat oracle-input
    writer (input generation is not under test; the canonicalization
    is, and THAT is implemented independently on each side).
    """
    h_url = _h(f"urlreal:{url}")
    h_row = _h(f"urlmess:{url}:{warc_us}")
    scheme, rest = url.split("://", 1)
    slash = rest.find("/")
    host, path = (rest, "") if slash < 0 else (rest[:slash], rest[slash:])

    real: list[str] = []
    if h_url % 2 == 0:
        pool = [
            f"page={h_url % 7}",
            f"id={h_url % 100}",
            "sort=asc" if h_url % 3 else "sort=desc",
        ]
        real = [pool[i] for i in range(3) if (h_url >> (8 + i)) & 1][:2]

    if h_row % 3 == 0:
        host = host.upper()
    if h_row % 7 == 0:
        scheme = scheme.upper()
    if h_row % 4 == 0:
        host += ":443"
    if h_row % 5 == 0:
        path += "/"
    track = [
        _TRACK_POOL[i].format(h9=h_row % 9, h1000=h_row % 1000)
        for i in range(len(_TRACK_POOL))
        if (h_row >> (16 + i)) & 1
    ]
    params = real + track
    params.sort(key=lambda p: _h(f"ord:{h_row}:{p}"))
    out = f"{scheme}://{host}{path}"
    if params:
        out += "?" + "&".join(params)
    if h_row % 6 == 0:
        out += f"#sec{h_row % 9}"
    return out


def canonicalize_url(raw: str) -> str:
    """Engine-side canonicalization — mirrors the module-docstring spec
    (and therefore the oracle SQL) step for step."""
    nofrag = raw.split("#", 1)[0]  # 1
    if "?" in nofrag:  # 2
        base, qs = nofrag.split("?", 1)
    else:
        base, qs = nofrag, ""
    m = _AUTH_RE.match(base)  # 3
    auth = m.group(0) if m else ""
    path = base[len(auth) :]
    auth = auth.lower()
    if auth.startswith("https://") and auth.endswith(":443"):  # 4
        auth = auth[:-4]
    elif auth.startswith("http://") and auth.endswith(":80"):
        auth = auth[:-3]
    if path in ("", "/"):  # 5
        path = ""
    elif path.endswith("/"):
        path = path[:-1]
    params = sorted(p for p in qs.split("&") if p and not _TRACK_RE.match(p))  # 6
    out = auth + path
    if params:
        out += "?" + "&".join(params)
    return out


def messy_pages_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts) page rows → (raw_url, warc_us) messy rows.

    Shared with rowsonly_oracles.write_messy_urls_oracle (the oracle's
    INPUT parquet) — single-implementation rule for input generation.
    """
    urls = batch["url"].to_pylist()
    ts = batch["warc_ts"].cast(pa.int64()).to_pylist()
    raws = [messy_url(u, t) for u, t in zip(urls, ts)]
    return pa.Table.from_arrays(
        [pa.array(raws, pa.string()), pa.array(ts, pa.int64())],
        schema=_MESSY_SCHEMA,
    )


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    canon = [canonicalize_url(r) for r in batch["raw_url"].to_pylist()]
    return batch.append_column("canonical_url", pa.array(canon, pa.string()))


def _messy_pages(sf_dir: str, expand: int = 2) -> rd.Dataset:
    return synthesize_pages(sf_dir, expand=expand, include_html=False).map_batches(
        messy_pages_batch, batch_format="pyarrow"
    )


def url_canonicalize(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """Per-row canonical url over the messy pages table."""
    return _messy_pages(sf_dir, expand).map_batches(
        canonicalize_batch, batch_format="pyarrow"
    )


def canonical_url_dedup(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """One row per canonical url: snapshot count, distinct raw forms,
    first/last crawl micros (the canonical-key mirror of
    snapshots.snapshot_churn — same B-bucket shape)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(batch["canonical_url"], num_buckets)
            if batch.num_rows
            else np.empty(0, np.int32)
        )
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _DEDUP_SCHEMA.empty_table()
        out = (
            g.groupby("canonical_url", sort=False)
            .agg(
                n_snapshots=("raw_url", "size"),
                n_raw_forms=("raw_url", "nunique"),
                first_us=("warc_us", "min"),
                last_us=("warc_us", "max"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=_DEDUP_SCHEMA, preserve_index=False)

    return (
        url_canonicalize(sf_dir, expand)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(fold, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Politeness-aware re-crawl scheduling
# ---------------------------------------------------------------------------

# One fetch per host per this interval (the crawler's politeness delay).
# Single-sourced into the oracle SQL.
POLITENESS_DELAY_US = 5_000_000

_SCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("slot", pa.int64()),
        ("sched_offset_us", pa.int64()),
    ]
)


def crawl_politeness_schedule(
    sf_dir: str,
    expand: int = 2,
    num_buckets: int = 32,
    delay_us: int = POLITENESS_DELAY_US,
) -> rd.Dataset:
    """Politeness-aware re-crawl schedule: every known url gets a fetch
    slot such that no host is hit more than once per ``delay_us``,
    stalest pages first — the work queue a production crawler derives
    from its corpus between crawls.

    Semantics (mirrored by the REAL DuckDB ``row_number`` window
    oracle): per url take the LATEST ``warc_us`` over its snapshots;
    per host, order urls by ``(last_us, url)`` (stalest first, url as
    the deterministic tie-break) and assign 0-based ``slot``;
    ``sched_offset_us = slot * delay_us``.

    Ray shape: two slim bucketed shuffles — (url → max warc_us) fold
    with a within-batch max combiner, then a host-bucketed vectorized
    rank (B pandas groups; a host's urls all land in one bucket, so the
    rank is locally decidable; never one Ray group per host).  Payloads
    never travel; rows are ~60 bytes.
    """
    from .data_quality import DOMAIN_RE
    from .snapshots import _slim_pages

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("url", as_index=False, sort=False)["warc_us"].max()
        out["__bucket"] = stable_bucket_ids(
            pa.array(out["url"], pa.string()), num_buckets
        )
        return out

    _LATEST_SCHEMA = pa.schema([("url", pa.string()), ("last_us", pa.int64())])

    def fold_latest(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _LATEST_SCHEMA.empty_table()
        out = g.groupby("url", as_index=False, sort=False)["warc_us"].max()
        out = out.rename(columns={"warc_us": "last_us"})
        return pa.Table.from_pandas(
            out, schema=_LATEST_SCHEMA, preserve_index=False
        )

    def rehost(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("host", pa.array([], pa.string())).append_column(
                "__hb", pa.array([], pa.int32())
            )
        hosts = (
            pd.Series(t["url"].to_pylist())
            .str.extract(DOMAIN_RE, expand=False)
            .fillna("")
        )
        t = t.append_column("host", pa.array(hosts.tolist(), pa.string()))
        b = stable_bucket_ids(t["host"], num_buckets)
        return t.append_column("__hb", pa.array(b, pa.int32()))

    def rank(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _SCHED_SCHEMA.empty_table()
        g = g.sort_values(["host", "last_us", "url"], kind="mergesort")
        h = g["host"].to_numpy()
        starts = np.concatenate([[True], h[1:] != h[:-1]])
        # 0-based rank within host run: index - index-of-run-start
        idx = np.arange(len(g), dtype=np.int64)
        run_start = idx[starts][np.cumsum(starts) - 1]
        slot = idx - run_start
        return pa.Table.from_arrays(
            [
                pa.array(g["url"].tolist(), pa.string()),
                pa.array(h.tolist(), pa.string()),
                pa.array(slot, pa.int64()),
                pa.array(slot * delay_us, pa.int64()),
            ],
            schema=_SCHED_SCHEMA,
        )

    return (
        _slim_pages(sf_dir, expand)
        .map_batches(pre, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(fold_latest, batch_format="pandas")
        .map_batches(rehost, batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(rank, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Host-grouped (leakage-safe) train/test split
# ---------------------------------------------------------------------------


def _distinct_urls_grouped(sf_dir: str, expand: int, num_buckets: int):
    """Slim (url) rows → per-batch unique combiner → B-bucket groupby.
    Shared first stage of the distinct-url operators (host_grouped_split,
    url_path_templates): the shuffle carries per-batch survivors only;
    callers attach their own map_groups fold (which must still
    drop_duplicates within the bucket — batches dedup independently)."""
    from .snapshots import _slim_pages

    def pre(batch: pa.Table) -> pa.Table:
        urls = pc.unique(batch["url"])
        t = pa.Table.from_arrays([urls], names=["url"])
        b = stable_bucket_ids(t["url"], num_buckets) if t.num_rows else np.empty(0, np.int32)
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    return (
        _slim_pages(sf_dir, expand)
        .select_columns(["url"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("__bucket")
    )


_HOST_SPLIT_SCHEMA = pa.schema(
    [("url", pa.string()), ("host", pa.string()), ("split", pa.string())]
)


def host_grouped_split(
    sf_dir: str,
    test_hex_prefixes: tuple = ("0", "1"),
    expand: int = 2,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Group-aware train/test split: the unit of assignment is the HOST,
    not the document — every url of a host lands on the same side, so
    near-duplicate pages of one site (templates, boilerplate, mirrored
    articles) can never straddle the split and leak test content into
    training.  The complement of textops.train_test_split (which splits
    per doc_id and is leakage-prone for web corpora).

    split = 'test' iff the first hex char of md5(host) is in
    ``test_hex_prefixes`` (2/16 = 12.5% of HOSTS by default — the test
    fraction of docs then follows the host-size distribution, which is
    the price of group integrity).  Pure function of the host → stable
    under any partitioning, resumable, SQL-checkable.

    Ray shape: one B-bucket shuffle of slim (url) rows to make urls
    distinct (per-batch drop_duplicates combiner first, so the shuffle
    carries survivors only); host extraction + md5 assignment are then
    row-local.  Payloads never travel; at 100 TB this is a
    bytes-per-url-sized exchange.
    """
    import hashlib

    from .data_quality import DOMAIN_RE

    def assign(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _HOST_SPLIT_SCHEMA.empty_table()
        urls = g["url"].drop_duplicates()
        host = urls.str.extract(DOMAIN_RE, expand=False).fillna("")
        split = [
            "test"
            if hashlib.md5(h.encode()).hexdigest()[0] in test_hex_prefixes
            else "train"
            for h in host
        ]
        return pa.Table.from_arrays(
            [
                pa.array(urls.tolist(), pa.string()),
                pa.array(host.tolist(), pa.string()),
                pa.array(split, pa.string()),
            ],
            schema=_HOST_SPLIT_SCHEMA,
        )

    return _distinct_urls_grouped(sf_dir, expand, num_buckets).map_groups(
        assign, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# URL path-template mining
# ---------------------------------------------------------------------------

# Digit runs collapse to 'N' — /doc/123 and /doc/456 share a template.
# Single-sourced into the oracle SQL (DuckDB regexp_replace ... 'g').
URL_TEMPLATE_NUM_RE = r"[0-9]+"

_TPL_SCHEMA = pa.schema(
    [("template", pa.string()), ("n_urls", pa.int64()), ("n_hosts", pa.int64())]
)


def url_path_templates(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """Mine URL path templates: collapse digit runs in the path to ``N``
    (`/doc/123` → `/doc/N`) and count distinct urls and distinct hosts
    per template — the crawl-cartography op that surfaces site
    structure (article pages vs listing pages vs calendar traps) before
    deciding what to crawl or keep at scale.

    Ray shape: two slim B-bucket shuffles — distinct urls (per-batch
    unique combiner first), then a template-bucketed fold where
    ``n_urls`` is the row count and ``n_hosts`` a vectorized nunique
    (a template lives in exactly one bucket, so both are exact).
    Payloads never travel.
    """
    from .data_quality import DOMAIN_RE

    num_re = re.compile(URL_TEMPLATE_NUM_RE)

    _DIST_SCHEMA = pa.schema(
        [("template", pa.string()), ("host", pa.string()), ("__tb", pa.int32())]
    )

    def to_templates(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _DIST_SCHEMA.empty_table()
        urls = g["url"].drop_duplicates()
        host = urls.str.extract(DOMAIN_RE, expand=False).fillna("")
        # path = url minus scheme+host prefix; digit runs -> N
        path = urls.str.replace(r"^https?://[^/]*", "", regex=True)
        tpl = path.str.replace(num_re, "N", regex=True)
        t = pa.Table.from_arrays(
            [
                pa.array(tpl.tolist(), pa.string()),
                pa.array(host.tolist(), pa.string()),
            ],
            names=["template", "host"],
        )
        tb = stable_bucket_ids(t["template"], num_buckets)
        return t.append_column("__tb", pa.array(tb, pa.int32()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _TPL_SCHEMA.empty_table()
        out = (
            g.groupby("template", sort=False)
            .agg(n_urls=("host", "size"), n_hosts=("host", "nunique"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=_TPL_SCHEMA, preserve_index=False)

    return (
        _distinct_urls_grouped(sf_dir, expand, num_buckets)
        .map_groups(to_templates, batch_format="pandas")
        .groupby("__tb")
        .map_groups(fold, batch_format="pandas")
    )
