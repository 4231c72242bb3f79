"""temporal.interpolate_time_grid — hand-computed interpolation."""

from __future__ import annotations

from datetime import datetime

from delta_lake_platform_spark.operators.temporal import interpolate_time_grid


def _rows(spark, data):
    return spark.createDataFrame(
        [(u, datetime.utcfromtimestamp(t), v) for u, t, v in data],
        "user_id long, ts timestamp, value double",
    )


def test_linear_interior_and_edge_extension(spark):
    h = 3600
    df = _rows(
        spark,
        [
            (1, 0 * h, 10.0),   # observed at hour 0
            (1, 3 * h, 40.0),   # observed at hour 3 -> hours 1,2 interp
            (2, 5 * h, 7.0),    # single observation: 1-cell grid
        ],
    )
    out = {
        (r.user_id, r.grid_ts): (r.value_interp, r.observed)
        for r in interpolate_time_grid(df).collect()
    }
    assert out[(1, 0)] == (10.0, 1)
    assert out[(1, 1 * h)] == (20.0, 0)   # 10 + (40-10) * 1/3
    assert out[(1, 2 * h)] == (30.0, 0)
    assert out[(1, 3 * h)] == (40.0, 1)
    assert out[(2, 5 * h)] == (7.0, 1)
    assert len(out) == 5


def test_multiple_readings_in_cell_average_and_observed_flag(spark):
    h = 3600
    df = _rows(
        spark,
        [(1, 0, 4.0), (1, 600, 8.0), (1, 2 * h, 0.0)],
    )
    out = {
        r.grid_ts: (r.value_interp, r.observed)
        for r in interpolate_time_grid(df).collect()
    }
    assert out[0] == (6.0, 1)          # avg(4, 8)
    assert out[h] == (3.0, 0)          # midpoint of 6 -> 0
    assert out[2 * h] == (0.0, 1)
