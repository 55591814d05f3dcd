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


def test_hll_partial_merge_estimate_accuracy() -> None:
    import numpy as np

    from png_from_pdf_extracter_ray.stages.sketch import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    rng = np.random.default_rng(7)
    for true_n in (50, 1_000, 20_000, 300_000):
        vals = rng.choice(true_n * 3, size=true_n, replace=False).astype(np.int64)
        # split into 4 partials and merge — mergeability must not change
        # the estimate vs one-shot
        parts = np.array_split(vals, 4)
        regs = hll_partial(parts[0])
        for p in parts[1:]:
            regs = hll_merge(regs, hll_partial(p))
        est = hll_estimate(regs)
        assert est == hll_estimate(hll_partial(vals))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_duplicates_do_not_inflate() -> None:
    import numpy as np

    from png_from_pdf_extracter_ray.stages.sketch import hll_estimate, hll_partial

    vals = np.repeat(np.arange(500, dtype=np.int64), 100)  # 50k rows, 500 distinct
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 500) / 500 < 0.05, est


def test_hll_query_close_to_exact(ray_session, sf_dir) -> None:  # noqa: ANN001
    from png_from_pdf_extracter_ray.pipelines.relational import (
        distinct_users_per_event_type,
        distinct_users_per_event_type_hll,
    )

    exact = distinct_users_per_event_type(sf_dir).set_index("event_type")["n_users"]
    approx = distinct_users_per_event_type_hll(sf_dir).set_index("event_type")[
        "n_distinct_est"
    ]
    assert set(exact.index) == set(approx.index)
    for k in exact.index:
        assert abs(int(approx[k]) - int(exact[k])) / max(int(exact[k]), 1) < 0.05, (
            k,
            int(exact[k]),
            int(approx[k]),
        )


def test_percentile_rank_error_bounded(ray_session, sf_dir) -> None:  # noqa: ANN001
    import numpy as np
    import pandas as pd

    from png_from_pdf_extracter_ray.pipelines.relational import (
        order_value_percentile_ranks,
    )

    approx = order_value_percentile_ranks(sf_dir).to_pandas()
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    x = orders["o_totalprice"].to_numpy()
    exact = np.searchsorted(np.sort(x), x, side="left") / len(x)
    merged = orders.assign(exact=exact).merge(approx, on="o_orderkey")
    assert len(merged) == len(orders)
    # documented bound: ~1/grid (=1/128) of total weight, plus slack
    err = (merged["pct_rank"] - merged["exact"]).abs().max()
    assert err <= 0.02, err
