"""Mergeable quantile sketch: bounded-state approximate percentiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from png_from_pdf_extracter_ray.stages.sketch import (
    quantile_sketch_by_key,
    weighted_quantile,
)


def test_weighted_quantile_basics() -> None:
    v = np.array([1.0, 2.0, 3.0, 4.0])
    w = np.ones(4)
    assert weighted_quantile(v, w, 0.0) == 1.0
    assert weighted_quantile(v, w, 1.0) == 4.0
    assert weighted_quantile(v, w, 0.5) in (2.0, 3.0)
    # weights matter: heavy weight on 4 pulls the median up
    assert weighted_quantile(v, np.array([1.0, 1.0, 1.0, 10.0]), 0.5) == 4.0


def test_sketch_rank_error_bounded(ray_session) -> None:  # noqa: ANN001
    """Across many small batches, the sketch's p50/p90 must land within
    the documented ~1/grid rank slack of the exact quantiles."""
    rng = np.random.default_rng(17)
    n = 20_000
    keys = rng.choice(["A", "B", "C"], size=n)
    vals = np.where(
        keys == "A", rng.normal(100, 15, n), rng.exponential(40, n)
    ).astype(np.float64)
    df = pd.DataFrame({"k": keys, "v": vals})
    # many blocks -> many independent partial grids to merge
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(37)
    got = quantile_sketch_by_key(ds, "k", "v", qs=(0.5, 0.9), grid=128)
    for _, row in got.iterrows():
        sub = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            # translate value error into RANK error against the exact CDF
            rank = np.searchsorted(sub, row[col]) / len(sub)
            assert abs(rank - q) < 0.02, (row["k"], col, rank, q)


def test_sketch_close_to_exact_on_lineitem(ray_session, sf_dir) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.relational import (
        quantity_quantiles_by_returnflag,
        quantity_quantiles_sketch,
    )

    exact = quantity_quantiles_by_returnflag(sf_dir).sort_values(
        "l_returnflag", ignore_index=True
    )
    approx = quantity_quantiles_sketch(sf_dir).sort_values(
        "l_returnflag", ignore_index=True
    )
    assert list(approx["l_returnflag"]) == list(exact["l_returnflag"])
    # l_quantity spans 1..50; a 1/128 rank slack is ~±1 in value
    for col in ("p50_qty", "p90_qty"):
        assert (approx[col] - exact[col]).abs().max() <= 1.5, (col, approx, exact)
