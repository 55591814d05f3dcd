"""Incremental-crawl snapshot analysis over the pages table.

Common-Crawl-style corpora carry the SAME url across many crawl
snapshots (the synthetic pages table injects ~5% re-crawled urls with a
later ``warc_ts`` and drifted payload — corpus/synth.py
``pages_rows_for_doc``).  A production crawl pipeline needs the two
temporal primitives this module provides:

- :func:`pages_latest_snapshot` — the "freshest copy wins" dedup (the
  mirror image of the flagship's keep-EARLIEST dedup, stages/dedup.py):
  one row per url, the one with the greatest ``warc_ts``.
- :func:`pages_snapshot_churn` — per-url content-churn statistics
  (snapshot count, number of content CHANGES between consecutive
  snapshots, first/last crawl time) — the re-crawl-scheduling signal.

Scale notes (100 TB): both ops move only the slim
``(url, warc_us, text_md5)`` projection through the one unavoidable
hash shuffle — payload bytes never travel (``synthesize_pages(...,
include_html=False)`` skips generating them; a real pages table would
prune to the three columns at the read).  The shuffle is the standard
B-bucket pattern (``stable_bucket_ids``): B vectorized pandas groups,
never one Ray group per url.  Within-batch pre-aggregation shrinks the
latest-snapshot shuffle before data moves.

Correctness: both queries are SQL-checked against REAL DuckDB window
functions (``row_number() / lag() OVER (PARTITION BY url ORDER BY ...)``)
over a flat single-process slim-pages parquet
(rowsonly_oracles.write_pages_slim_oracle) — the engine's bucketed
sort + adjacent-compare must reproduce the declarative window
semantics exactly, including the (warc_us, text_md5) tie order.

The md5 text fingerprint is hashlib.md5 — the one hash DuckDB shares
byte-for-byte (ROUND_NOTES.md; same convention as textops.train_test_split).
Reference analog: the groupby-url dedup of SURVEY.md §2.4 #12
(/root/reference/src/main.py polls the same INBOX repeatedly; re-seen
messages are the sequential analog of re-crawled urls).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.pages_source import synthesize_pages
from ..stages.dedup import _keep_first_sorted, stable_bucket_ids

_SLIM_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_us", pa.int64()), ("text_md5", pa.string())]
)

_CHURN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_snapshots", pa.int64()),
        ("n_changes", pa.int64()),
        ("first_us", pa.int64()),
        ("last_us", pa.int64()),
    ]
)

# keep-LATEST total order: greatest warc_us wins, text_md5 DESC breaks
# exact-timestamp ties deterministically (shared with the oracle SQL's
# ORDER BY warc_us DESC, text_md5 DESC).
_LATEST_ORDER = [("warc_us", "descending"), ("text_md5", "descending")]


def slim_pages_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, text) page rows → (url, warc_us, text_md5).

    Shared with the flat oracle writer (single-implementation rule for
    oracle-shared kernels, ROUND_NOTES.md): the fingerprint itself is
    not under test — the grouping/window machinery downstream is.
    """
    urls = batch["url"].to_pylist()
    ts = batch["warc_ts"].cast(pa.int64()).to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.int64()),
            pa.array(md5s, pa.string()),
        ],
        schema=_SLIM_SCHEMA,
    )


def _slim_pages(sf_dir: str, expand: int = 2) -> rd.Dataset:
    return synthesize_pages(sf_dir, expand=expand, include_html=False).map_batches(
        slim_pages_batch, batch_format="pyarrow"
    )


def latest_snapshot(slim: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """One row per url: the snapshot with the greatest ``warc_ts``.

    Same two-level shape as stages/dedup.dedup_keep_first, with the sort
    order reversed: within-batch keep-latest combiner → B-bucket hash
    shuffle of the survivors → within-bucket vectorized keep-latest.
    """

    def pre(batch: pa.Table) -> pa.Table:
        batch = _keep_first_sorted(batch, "url", _LATEST_ORDER)
        b = (
            stable_bucket_ids(batch["url"], num_buckets)
            if batch.num_rows
            else np.empty(0, np.int32)
        )
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def bucket(group: pa.Table) -> pa.Table:
        out = _keep_first_sorted(group, "url", _LATEST_ORDER)
        return out.drop_columns(["__bucket"]) if out.num_rows else _SLIM_SCHEMA.empty_table()

    return (
        slim.map_batches(pre, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket, batch_format="pyarrow")
    )


def pages_latest_snapshot(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """Latest-snapshot dedup over the synthetic pages table."""
    return latest_snapshot(_slim_pages(sf_dir, expand))


def snapshot_churn(slim: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Per-url churn stats: snapshot count, content changes between
    consecutive snapshots (ordered by warc_us, text_md5 — the oracle's
    ``lag() OVER`` order), first and last crawl micros.

    No combiner pre-pass: consecutive-change counting needs EVERY
    snapshot of a url in one place, so the slim rows shuffle whole —
    still only ~50 bytes/row.  Each of the B buckets computes all its
    urls' stats in ONE vectorized pandas pass (shift + boolean mask +
    groupby agg), never a Ray group per url.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(batch["url"], num_buckets)
            if batch.num_rows
            else np.empty(0, np.int32)
        )
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def churn(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _CHURN_SCHEMA.empty_table()
        g = g.sort_values(["url", "warc_us", "text_md5"], ignore_index=True)
        same_url = g["url"].to_numpy(dtype=object)[1:] == g["url"].to_numpy(dtype=object)[:-1]
        md5 = g["text_md5"].to_numpy(dtype=object)
        changed = np.zeros(len(g), dtype=np.int64)
        changed[1:] = (same_url & (md5[1:] != md5[:-1])).astype(np.int64)
        out = (
            g.assign(__ch=changed)
            .groupby("url", sort=False)
            .agg(
                n_snapshots=("url", "size"),
                n_changes=("__ch", "sum"),
                first_us=("warc_us", "min"),
                last_us=("warc_us", "max"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(out, schema=_CHURN_SCHEMA, preserve_index=False)

    return (
        slim.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(churn, batch_format="pandas")
    )


def pages_snapshot_churn(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """Churn stats over the synthetic pages table."""
    return snapshot_churn(_slim_pages(sf_dir, expand))


# ---------------------------------------------------------------------------
# Snapshot content drift (token-set Jaccard between consecutive re-crawls)
# ---------------------------------------------------------------------------

_WS = re.compile(r"\s+")

_DRIFT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("prev_us", pa.int64()),
        ("warc_us", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _token_set(text: str) -> set:
    s = (text or "").strip().lower()
    return set(_WS.split(s)) if s else set()


def pages_snapshot_drift(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """Content-drift MAGNITUDE between consecutive snapshots of a url:
    one row per (prev, next) snapshot pair with the token-set Jaccard
    similarity of the two texts — churn (pages_snapshot_churn) says THAT
    a page changed, this says HOW MUCH, the signal that separates
    timestamp-only template churn from real content updates when
    scheduling re-crawls.

    Ray shape: the one unavoidable hash shuffle by url ships
    ``(url, warc_us, text)`` — the text crosses the wire once; pairs are
    formed per bucket by the same vectorized sort + shifted-mask the
    churn op uses, with the per-pair set intersection being the accepted
    per-row kernel cost class (same as the md5 fingerprint loops).  The
    snapshot total order is ``(warc_us, text)`` — spelled identically in
    the oracle's window ``ORDER BY`` (REAL DuckDB lag() + list_intersect
    over a flat (url, warc_us, text) parquet,
    rowsonly_oracles.write_pages_text_oracle).

    Scale note: re-crawled urls are a small corpus fraction (~5% here);
    urls with one snapshot emit nothing and could be pre-filtered by a
    count combiner if re-crawls dominated.
    """

    def slim_text(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                batch["url"],
                batch["warc_ts"].cast(pa.int64()),
                batch["text"],
            ],
            names=["url", "warc_us", "text"],
        )
        b = (
            stable_bucket_ids(t["url"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__bucket", pa.array(b, pa.int32()))

    def drift(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _DRIFT_SCHEMA.empty_table()
        g = g.sort_values(["url", "warc_us", "text"], kind="mergesort")
        urls = g["url"].to_numpy()
        us = g["warc_us"].to_numpy(dtype=np.int64)
        texts = g["text"].to_numpy()
        nxt = np.flatnonzero(urls[1:] == urls[:-1]) + 1  # row i pairs with i-1
        if len(nxt) == 0:
            return _DRIFT_SCHEMA.empty_table()
        jac = np.empty(len(nxt), dtype=np.float64)
        for k, i in enumerate(nxt):
            ta, tb = _token_set(texts[i - 1]), _token_set(texts[i])
            union = len(ta | tb)
            jac[k] = 1.0 if union == 0 else len(ta & tb) / union
        return pa.Table.from_arrays(
            [
                pa.array(urls[nxt].tolist(), pa.string()),
                pa.array(us[nxt - 1], pa.int64()),
                pa.array(us[nxt], pa.int64()),
                pa.array(jac, pa.float64()),
            ],
            schema=_DRIFT_SCHEMA,
        )

    return (
        synthesize_pages(sf_dir, expand=expand, include_html=False)
        .map_batches(slim_text, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(drift, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Crawl novelty rate (new vs re-seen content per crawl day)
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000

_NOVELTY_SCHEMA = pa.schema(
    [
        ("day", pa.int64()),
        ("n_snapshots", pa.int64()),
        ("n_new_fingerprints", pa.int64()),
    ]
)


def crawl_novelty_by_day(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """Crawl-health dashboard row per epoch day: how many snapshots the
    crawl fetched and how many DISTINCT content fingerprints were seen
    for the first time that day — the novelty-rate curve that tells a
    crawl operator when a source is exhausted (re-seen content dominates)
    vs still productive.

    Semantics (mirrored by the declarative DuckDB oracle): ``day =
    warc_us // 86_400_000_000``; a fingerprint is NEW on the day of its
    minimum ``warc_us`` over the whole corpus.

    Ray shape: two independent slim folds — per-day snapshot counts
    (within-batch partials, day cardinality is tiny) and per-fingerprint
    min-warc_us (the standard md5-bucket shuffle) reduced to per-day
    first-seen counts — joined by the bucketed left join.  Nothing but
    ~50-byte rows moves.
    """
    from ..stages.joins import bucketed_hash_join

    slim = _slim_pages(sf_dir, expand).materialize()  # two consumers

    _SNAP_SCHEMA = pa.schema([("day", pa.int64()), ("n_snapshots", pa.int64())])

    def snap_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"day": t["warc_us"].to_numpy(zero_copy_only=False) // _US_PER_DAY}
        )
        out = df.groupby("day", as_index=False, sort=False).size()
        out.columns = ["day", "n_snapshots"]
        pt = pa.Table.from_pandas(out, schema=_SNAP_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(pt["day"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def snap_fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _SNAP_SCHEMA.empty_table()
        out = g.groupby("day", as_index=False, sort=False)["n_snapshots"].sum()
        return pa.Table.from_pandas(out, schema=_SNAP_SCHEMA, preserve_index=False)

    snaps = (
        slim.map_batches(snap_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(snap_fold, batch_format="pandas")
    )

    _FIRST_SCHEMA = pa.schema([("text_md5", pa.string()), ("first_us", pa.int64())])

    def first_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "text_md5": t["text_md5"].to_pandas(),
                "first_us": t["warc_us"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby("text_md5", as_index=False, sort=False)["first_us"].min()
        pt = pa.Table.from_pandas(out, schema=_FIRST_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(pt["text_md5"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    _NEW_SCHEMA = pa.schema([("day", pa.int64()), ("n_new_fingerprints", pa.int64())])

    def first_fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _NEW_SCHEMA.empty_table()
        first = g.groupby("text_md5", sort=False)["first_us"].min()
        days = first.to_numpy(dtype=np.int64) // _US_PER_DAY
        out = (
            pd.DataFrame({"day": days})
            .groupby("day", as_index=False, sort=False)
            .size()
        )
        out.columns = ["day", "n_new_fingerprints"]
        return pa.Table.from_pandas(out, schema=_NEW_SCHEMA, preserve_index=False)

    def new_rebucket(t: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(t["day"], num_buckets)
            if t.num_rows
            else np.empty(0, np.int32)
        )
        return t.append_column("__db", pa.array(b, pa.int32()))

    def new_fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _NEW_SCHEMA.empty_table()
        out = g.groupby("day", as_index=False, sort=False)[
            "n_new_fingerprints"
        ].sum()
        return pa.Table.from_pandas(out, schema=_NEW_SCHEMA, preserve_index=False)

    news = (
        slim.map_batches(first_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(first_fold, batch_format="pandas")
        .map_batches(new_rebucket, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(new_fold, batch_format="pandas")
    )

    joined = bucketed_hash_join(snaps, news, on="day", how="left")

    def finalize(t: pa.Table) -> pa.Table:
        nn = t["n_new_fingerprints"].fill_null(0)
        return pa.Table.from_arrays(
            [t["day"], t["n_snapshots"], nn], schema=_NOVELTY_SCHEMA
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Re-crawl interval statistics (the crawl-scheduler's cadence signal)
# ---------------------------------------------------------------------------

_INTERVAL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_snapshots", pa.int64()),
        ("min_gap_us", pa.int64()),
        ("max_gap_us", pa.int64()),
        ("mean_gap_us", pa.float64()),
    ]
)


def recrawl_intervals(slim: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Per-url re-crawl cadence: min/max/mean micros between consecutive
    snapshots (ordered by ``warc_us, text_md5`` — the same total order
    churn uses), for urls crawled at least twice.  Together with
    :func:`snapshot_churn` (DID the content change) this is the input a
    re-crawl scheduler needs: a url whose content churns faster than its
    crawl cadence is under-crawled, and vice versa.

    Same Ray shape as churn: the slim rows shuffle whole (gap formation
    needs every snapshot of a url co-located), each of the B buckets
    computes all its urls' gaps in ONE vectorized pandas pass (sort +
    shifted diff + groupby agg); single-snapshot urls emit nothing on
    both sides.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            stable_bucket_ids(batch["url"], num_buckets)
            if batch.num_rows
            else np.empty(0, np.int32)
        )
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def intervals(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _INTERVAL_SCHEMA.empty_table()
        g = g.sort_values(["url", "warc_us", "text_md5"], ignore_index=True)
        urls = g["url"].to_numpy(dtype=object)
        us = g["warc_us"].to_numpy(dtype=np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = urls[1:] == urls[:-1]
        gaps = np.zeros(len(g), dtype=np.int64)
        gaps[1:] = us[1:] - us[:-1]
        sub = pd.DataFrame({"url": urls[same], "gap": gaps[same]})
        if sub.empty:
            return _INTERVAL_SCHEMA.empty_table()
        out = (
            sub.groupby("url", sort=False)
            .agg(
                n_gaps=("gap", "size"),
                min_gap_us=("gap", "min"),
                max_gap_us=("gap", "max"),
                mean_gap_us=("gap", "mean"),
            )
            .reset_index()
        )
        out["n_snapshots"] = out.pop("n_gaps").to_numpy(np.int64) + 1
        out["mean_gap_us"] = np.round(out["mean_gap_us"].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(
            out[["url", "n_snapshots", "min_gap_us", "max_gap_us", "mean_gap_us"]],
            schema=_INTERVAL_SCHEMA,
            preserve_index=False,
        )

    return (
        slim.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(intervals, batch_format="pandas")
    )


def pages_recrawl_intervals(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """Re-crawl interval stats over the synthetic pages table."""
    return recrawl_intervals(_slim_pages(sf_dir, expand))


# ---------------------------------------------------------------------------
# Per-host crawl-volume trend (distributed per-group OLS slope)
# ---------------------------------------------------------------------------

_TREND_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("n_days", pa.int64()),
        ("slope", pa.float64()),
    ]
)

_HOST_RE = re.compile(r"^https?://([^/]+)/")


def host_crawl_trend(sf_dir: str, expand: int = 2, num_buckets: int = 16) -> rd.Dataset:
    """Per-host crawl-volume trend: the OLS slope of snapshots-per-day
    over the day index — is a host being crawled more or less over time?
    The distributed per-GROUP regression pattern: every sum the slope
    needs (Σx, Σy, Σxy, Σx², with x = epoch day, y = snapshots that
    day) is an EXACT int64 mergeable partial, so the whole regression
    is one count fold + one vectorized closed form — no float
    accumulation anywhere, which is what lets the DuckDB oracle spell
    the identical integer formula and hash-match (the same
    exact-sufficient-stats trick as stages/ml.py ridge).

    Ray shape: per-batch (host, day, n) partial counts (tiny — hosts ×
    days), one hash-bucket shuffle BY HOST so a host's days co-locate,
    per-bucket vectorized fold + slope.  Hosts seen on < 2 distinct
    days have no slope and emit nothing on both sides.
    """

    _PART_SCHEMA = pa.schema(
        [("host", pa.string()), ("day", pa.int64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = urls.str.extract(_HOST_RE, expand=False).fillna("")
        day = t["warc_us"].to_numpy(zero_copy_only=False) // _US_PER_DAY
        out = (
            pd.DataFrame({"host": host, "day": day})
            .groupby(["host", "day"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        pt = pa.Table.from_pandas(out, schema=_PART_SCHEMA, preserve_index=False)
        b = (
            stable_bucket_ids(pt["host"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def slope(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _TREND_SCHEMA.empty_table()
        d = g.groupby(["host", "day"], as_index=False, sort=False)["n"].sum()
        x = d["day"].to_numpy(np.int64)
        y = d["n"].to_numpy(np.int64)
        s = (
            d.assign(xy=x * y, xx=x * x)
            .groupby("host", sort=False)
            .agg(
                n_days=("day", "size"),
                sx=("day", "sum"),
                sy=("n", "sum"),
                sxy=("xy", "sum"),
                sxx=("xx", "sum"),
            )
            .reset_index()
        )
        s = s[s["n_days"] >= 2]
        if s.empty:
            return _TREND_SCHEMA.empty_table()
        k = s["n_days"].to_numpy(np.int64)
        num = k * s["sxy"].to_numpy(np.int64) - s["sx"].to_numpy(np.int64) * s["sy"].to_numpy(np.int64)
        den = k * s["sxx"].to_numpy(np.int64) - s["sx"].to_numpy(np.int64) ** 2
        out = pd.DataFrame(
            {
                "host": s["host"].to_numpy(dtype=object),
                "n_days": k,
                "slope": np.round(num.astype(np.float64) / den.astype(np.float64), 6),
            }
        )
        return pa.Table.from_pandas(out, schema=_TREND_SCHEMA, preserve_index=False)

    return (
        _slim_pages(sf_dir, expand)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(slope, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Adaptive re-crawl schedule (churn × cadence → next-due time)
# ---------------------------------------------------------------------------

_SCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("avg_gap_us", pa.int64()),
        ("fast_churn", pa.int64()),
        ("next_due_us", pa.int64()),
    ]
)


def adaptive_recrawl_schedule(sf_dir: str, expand: int = 2) -> rd.Dataset:
    """The crawl-scheduler OUTPUT: when to fetch each url next, from
    the two temporal signals this module already computes — cadence
    (how often have we crawled it) and churn (did it change when we
    did).  A url whose content changed on at least half its re-crawls
    (``2·n_changes ≥ n_snapshots−1``) is fast-churning and gets HALF
    its historical average gap; a stable url gets DOUBLE — the classic
    multiplicative adaptive-revisit policy (Cho & Garcia-Molina).

    Every quantity is exact int64 (``avg_gap = (last−first) // gaps``,
    halving/doubling by integer division/multiply), so the schedule is
    reproducible bit-for-bit under any partitioning and the oracle SQL
    spells the identical integer arithmetic over the same lag window.
    Single-snapshot urls have no cadence and emit nothing.

    Ray shape: one extra vectorized map over :func:`snapshot_churn`'s
    B-bucketed fold output — no additional shuffle.
    """
    churn = snapshot_churn(_slim_pages(sf_dir, expand))
    return churn.map_batches(schedule_batch, batch_format="pyarrow")


def schedule_batch(t: pa.Table) -> pa.Table:
    """Churn rows → schedule rows (the integer policy kernel; module
    level so tests drive the exact kernel the op ships)."""
    if t.num_rows == 0:
        return _SCHED_SCHEMA.empty_table()
    n_snap = t["n_snapshots"].to_numpy(zero_copy_only=False)
    keep = n_snap >= 2
    if not keep.any():
        return _SCHED_SCHEMA.empty_table()
    n_snap = n_snap[keep]
    n_chg = t["n_changes"].to_numpy(zero_copy_only=False)[keep]
    first = t["first_us"].to_numpy(zero_copy_only=False)[keep]
    last = t["last_us"].to_numpy(zero_copy_only=False)[keep]
    urls = np.asarray(t["url"].to_pylist(), dtype=object)[keep]
    k = n_snap - 1
    avg_gap = (last - first) // k
    fast = (2 * n_chg >= k).astype(np.int64)
    next_due = np.where(fast == 1, last + avg_gap // 2, last + avg_gap * 2)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(avg_gap, pa.int64()),
            pa.array(fast, pa.int64()),
            pa.array(next_due, pa.int64()),
        ],
        schema=_SCHED_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Content-dedup provenance (loser → winner audit map)
# ---------------------------------------------------------------------------

_WINNER_SCHEMA = pa.schema([("url", pa.string()), ("winner_url", pa.string())])


def content_dedup_winner_map(
    sf_dir: str, expand: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """Dedup PROVENANCE: for every url whose content fingerprint is
    shared with other urls, the url that would win a content-level
    dedup (lexicographically smallest url per fingerprint) — the audit
    map a production dedup stage must emit so "why did my document
    disappear" is answerable (the audit twin of the drop itself;
    mirror_host_pairs aggregates the same signal per host pair, this
    keeps the per-url lineage).  Urls appear once regardless of how
    many snapshots they have; a url equal to its winner emits nothing.

    Ray shape: per-batch DISTINCT (url, text_md5) combiner shrinks the
    slim rows before the one hash-bucket shuffle BY FINGERPRINT; each
    bucket re-distincts (batch-combiner survivors can repeat across
    batches), takes the per-fingerprint min url, and emits losers in
    one vectorized transform-broadcast pass.
    """

    def pre(t: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {"url": t["url"].to_pylist(), "text_md5": t["text_md5"].to_pylist()}
            )
            .drop_duplicates()
        )
        pt = pa.Table.from_pandas(
            df,
            schema=pa.schema([("url", pa.string()), ("text_md5", pa.string())]),
            preserve_index=False,
        )
        b = (
            stable_bucket_ids(pt["text_md5"], num_buckets)
            if pt.num_rows
            else np.empty(0, np.int32)
        )
        return pt.append_column("__bucket", pa.array(b, pa.int32()))

    def losers(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return _WINNER_SCHEMA.empty_table()
        d = g.drop_duplicates(["url", "text_md5"])
        win = d.groupby("text_md5", sort=False)["url"].transform("min")
        out = d[d["url"] != win]
        if out.empty:
            return _WINNER_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame({"url": out["url"], "winner_url": win[out.index]}),
            schema=_WINNER_SCHEMA,
            preserve_index=False,
        )

    return (
        _slim_pages(sf_dir, expand)
        .map_batches(pre, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(losers, batch_format="pandas")
    )
