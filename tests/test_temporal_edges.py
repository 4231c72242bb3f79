"""As-of join and range join edge semantics on hand-built frames."""

from __future__ import annotations

from datetime import datetime

from delta_lake_platform_spark.operators.temporal import asof_join, range_join_count

T = datetime


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_strict_excludes_same_instant(spark):
    left = _df(
        spark,
        [(1, T(2024, 1, 1, 10, 0))],
        "user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [
            (1, T(2024, 1, 1, 10, 0), 100.0),  # same instant
            (1, T(2024, 1, 1, 9, 0), 50.0),    # strictly earlier
        ],
        "user_id long, ts timestamp, value double",
    )
    strict = asof_join(
        left, right, on=["user_id"], right_cols=["value"], strict=True
    ).collect()
    assert strict[0].value_right == 50.0  # same-instant row ignored
    loose = asof_join(
        left, right, on=["user_id"], right_cols=["value"], strict=False
    ).collect()
    assert loose[0].value_right == 100.0  # same-instant row wins


def test_asof_no_prior_row_gives_null(spark):
    left = _df(spark, [(1, T(2024, 1, 1, 8, 0))], "user_id long, ts timestamp")
    right = _df(
        spark,
        [(1, T(2024, 1, 1, 9, 0), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on=["user_id"], right_cols=["value"]).collect()
    assert out[0].value_right is None


def test_asof_takes_latest_of_many(spark):
    left = _df(spark, [(1, T(2024, 1, 1, 12, 0))], "user_id long, ts timestamp")
    right = _df(
        spark,
        [(1, T(2024, 1, 1, h), float(h)) for h in (9, 10, 11)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on=["user_id"], right_cols=["value"]).collect()
    assert out[0].value_right == 11.0


def test_range_join_boundary_inclusive_exclusive(spark):
    """Window is [left_time - lookback, left_time): the lookback edge is
    included, the left instant itself is not."""
    left = _df(spark, [(1, 100, T(2024, 1, 1, 10, 0))], "user_id long, eid long, ts timestamp")
    right = _df(
        spark,
        [
            (1, T(2024, 1, 1, 9, 50)),   # exactly lookback (600s) before -> in
            (1, T(2024, 1, 1, 10, 0)),   # same instant -> out
            (1, T(2024, 1, 1, 9, 49)),   # before window -> out
            (1, T(2024, 1, 1, 9, 59)),   # inside -> in
        ],
        "user_id long, ts timestamp",
    )
    out = range_join_count(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        lookback_seconds=600,
    ).collect()
    assert out[0].n_in_range == 2


def test_range_join_left_rows_without_matches_kept(spark):
    left = _df(
        spark,
        [(1, 1, T(2024, 1, 1, 10, 0)), (2, 2, T(2024, 1, 1, 11, 0))],
        "user_id long, eid long, ts timestamp",
    )
    right = _df(spark, [(1, T(2024, 1, 1, 9, 59))], "user_id long, ts timestamp")
    out = {r.eid: r.n_in_range for r in range_join_count(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        lookback_seconds=600,
    ).collect()}
    assert out == {1: 1, 2: 0}
