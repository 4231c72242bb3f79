"""curation.k_anonymity — suppress / mask / flag enforcement and the
release profile."""

from __future__ import annotations

import pytest

from delta_lake_platform_spark.operators.curation import (
    k_anonymity,
    k_anonymity_profile,
)

ROWS = [
    # (id, zip, age_band, payload)  — group (z1, a) has 3 rows,
    # (z1, b) has 1, (z2, a) has 2, (NULL, a) has 2
    (1, "z1", "a", "p1"),
    (2, "z1", "a", "p2"),
    (3, "z1", "a", "p3"),
    (4, "z1", "b", "p4"),
    (5, "z2", "a", "p5"),
    (6, "z2", "a", "p6"),
    (7, None, "a", "p7"),
    (8, None, "a", "p8"),
]
QUASI = ["zip", "age_band"]


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        ROWS, "id long, zip string, age_band string, payload string"
    )


def test_suppress_drops_rare_groups(spark, frame):
    out = k_anonymity(frame, QUASI, k=2, mode="suppress")
    assert {r.id for r in out.collect()} == {1, 2, 3, 5, 6, 7, 8}
    assert out.columns == frame.columns  # helper column removed


def test_mask_nulls_quasi_cols_only(spark, frame):
    out = {r.id: r for r in k_anonymity(frame, QUASI, k=2, mode="mask").collect()}
    assert len(out) == 8  # every row survives
    assert out[4].zip is None and out[4].age_band is None
    assert out[4].payload == "p4"  # non-quasi columns untouched
    assert out[1].zip == "z1"  # anonymous rows keep their values


def test_flag_mode_and_null_groups_count_together(spark, frame):
    out = {r.id: r for r in k_anonymity(frame, QUASI, k=2, mode="flag").collect()}
    assert out[4].is_k_anonymous == 0
    # the two NULL-zip rows form ONE group of size 2 -> anonymous at k=2
    assert out[7].is_k_anonymous == 1 and out[8].is_k_anonymous == 1


def test_profile_histogram(spark, frame):
    prof = {
        r.group_size: r
        for r in k_anonymity_profile(frame, QUASI, k=2).collect()
    }
    assert prof[1].n_groups == 1 and prof[1].n_rows == 1
    assert prof[2].n_groups == 2 and prof[2].n_rows == 4
    assert prof[3].n_groups == 1 and prof[3].n_rows == 3
    assert prof[1].is_k_anonymous == 0 and prof[2].is_k_anonymous == 1


def test_bad_args_raise(spark, frame):
    with pytest.raises(ValueError):
        k_anonymity(frame, QUASI, mode="generalize")
    with pytest.raises(ValueError):
        k_anonymity(frame, [], k=2)
