"""bucketed_hash_join: dtype preservation (the round-2 bug class),
chained joins, empty sides, and the shared-column guard."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from png_from_pdf_extracter_ray.stages.joins import bucketed_hash_join


def _ds(d: dict) -> rd.Dataset:
    return rd.from_arrow(pa.Table.from_pydict(d))


def test_int64_keys_survive_chained_joins(ray_session) -> None:  # noqa: ANN001
    """The regression: pandas NaN-alignment of mismatched union schemas
    coerced int64 keys to float64, which hash into different buckets and
    silently match NOTHING in a second join."""
    pairs = _ds({"id_a": [1, 1, 2], "id_b": [2, 4, 4]})
    ta = _ds({"id_a": [1, 2, 3, 4], "text_a": ["t1", "t2", "t3", "t4"]})
    tb = _ds({"id_b": [1, 2, 3, 4], "text_b": ["u1", "u2", "u3", "u4"]})
    j1 = bucketed_hash_join(pairs, ta, on="id_a")
    j2 = bucketed_hash_join(j1, tb, on="id_b").to_pandas()
    assert len(j2) == 3, "second join lost rows (dtype/bucket mismatch)"
    assert pd.api.types.is_integer_dtype(j2["id_a"])
    assert pd.api.types.is_integer_dtype(j2["id_b"])
    got = j2.sort_values(["id_a", "id_b"], ignore_index=True)
    assert list(got["text_b"]) == ["u2", "u4", "u4"]


def test_inner_join_semantics_match_pandas(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2, 2, 5], "l": ["a", "b", "c", "d"]})
    right = _ds({"k": [2, 2, 5, 7], "r": ["x", "y", "z", "w"]})
    got = (
        bucketed_hash_join(left, right, on="k")
        .to_pandas()
        .sort_values(["k", "l", "r"], ignore_index=True)
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k")
        .sort_values(["k", "l", "r"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_join_with_no_matches_is_empty_with_schema(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2], "l": ["a", "b"]})
    right = _ds({"k": [3, 4], "r": ["x", "y"]})
    joined = bucketed_hash_join(left, right, on="k")
    # empty buckets must emit the TYPED schema (not null-typed columns):
    # downstream ops unify block schemas and a null-typed string column
    # from an empty bucket disagrees with its non-empty neighbors
    schema = joined.schema()
    types = dict(zip(schema.names, schema.types))
    assert types["k"] == pa.int64()
    assert types["l"] == pa.string()
    assert types["r"] == pa.string()
    assert joined.count() == 0


def test_shared_nonkey_columns_rejected(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1], "v": [1]})
    right = _ds({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="share non-key columns"):
        bucketed_hash_join(left, right, on="k")


def test_left_join_keeps_unmatched_rows_typed(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2, 3], "l": ["a", "b", "c"]})
    right = _ds({"k": [2], "r": [10]})
    out = (
        bucketed_hash_join(left, right, on="k", how="left")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert len(out) == 3
    assert pd.api.types.is_integer_dtype(out["k"])
    assert out.loc[out["k"] == 2, "r"].iloc[0] == 10
    assert out.loc[out["k"] == 1, "r"].isna().all()


def test_anti_join_returns_only_unmatched_left(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2, 3, 4], "l": ["a", "b", "c", "d"]})
    right = _ds({"k": [2, 4]})
    out = (
        bucketed_hash_join(left, right, on="k", how="anti")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(out["k"]) == [1, 3]
    assert list(out.columns) == ["k", "l"]


def test_full_outer_join_keeps_both_sides_typed(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2, 5], "l": [10, 20, 50]})
    right = _ds({"k": [2, 7], "r": [200, 700]})
    got = (
        bucketed_hash_join(left, right, on="k", how="outer")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    # every key of either side survives exactly once
    assert got["k"].tolist() == [1, 2, 5, 7]
    assert pd.api.types.is_integer_dtype(got["k"])
    # matched row carries both values; unmatched carry typed nulls
    row2 = got[got["k"] == 2].iloc[0]
    assert row2["l"] == 20 and row2["r"] == 200
    assert got[got["k"] == 7]["l"].isna().all()
    assert got[got["k"] == 1]["r"].isna().all()


def test_semi_join_returns_matched_left_once(ray_session) -> None:  # noqa: ANN001
    left = _ds({"k": [1, 2, 3, 4], "l": ["a", "b", "c", "d"]})
    right = _ds({"k": [2, 2, 2, 4]})  # multiplicity must not duplicate rows
    out = (
        bucketed_hash_join(left, right, on="k", how="semi")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(out["k"]) == [2, 4]
    assert list(out.columns) == ["k", "l"]
    assert pd.api.types.is_integer_dtype(out["k"])


def test_events_trailing_stats_crafted(ray_session, tmp_path) -> None:  # noqa: ANN001
    """Windowed mean+std on a crafted events table: constant window ->
    std exactly 0; two-value window -> population std by hand."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from png_from_pdf_extracter_ray.pipelines.relational import events_trailing_stats

    us = 1_000_000
    rows = [
        # user A: values 10, 10 within one hour -> window of both at e2
        (1, "a", 0, 10.0),
        (2, "a", 60 * us, 10.0),
        # user A: far later (outside window) -> fresh window
        (3, "a", 7200_000_000, 40.0),
        # user B: 1.0 then 3.0 within window -> mean 2.0, std 1.0
        (4, "b", 0, 1.0),
        (5, "b", 60 * us, 3.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    t = pa.table(
        {
            "event_id": pa.array(df.event_id, pa.int64()),
            "user_id": pa.array(df.user_id, pa.string()),
            "ts": pa.array(df.ts, pa.timestamp("us")),
            "value": pa.array(df.value, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = events_trailing_stats(str(tmp_path)).set_index("event_id")
    assert out.loc[2, "trailing_std"] == 0.0  # constant window, no residue
    assert out.loc[3, "trailing_std"] == 0.0  # window reset
    assert abs(out.loc[5, "trailing_mean"] - 2.0) < 1e-9
    assert abs(out.loc[5, "trailing_std"] - 1.0) < 1e-9
    assert np.isfinite(out["trailing_std"]).all()
