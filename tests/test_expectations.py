"""operators/expectations.py — the DLT expect / expect_or_drop /
expect_or_fail contract."""

from __future__ import annotations

import pytest

from delta_lake_platform_spark.operators.expectations import (
    ExpectationViolation,
    apply_expectations,
    expectation_metrics,
)

RULES = {
    "v_positive": "v > 0",
    "name_present": "name IS NOT NULL",
}


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 5, "a"),
            (2, -1, "b"),   # fails v_positive
            (3, 2, None),   # fails name_present
            (4, None, None),  # fails both (NULL predicate = violation)
        ],
        "id long, v long, name string",
    )


def test_drop_routes_rows_and_names_failed_rules(spark, frame):
    kept, quarantined = apply_expectations(frame, RULES, mode="drop")
    assert {r.id for r in kept.collect()} == {1}
    q = {r.id: sorted(r.failed_rules) for r in quarantined.collect()}
    assert q == {
        2: ["v_positive"],
        3: ["name_present"],
        4: ["name_present", "v_positive"],
    }


def test_allow_keeps_everything(spark, frame):
    kept, quarantined = apply_expectations(frame, RULES, mode="allow")
    assert kept.count() == 4
    assert quarantined.count() == 3


def test_fail_raises_with_per_rule_counts(spark, frame):
    with pytest.raises(ExpectationViolation) as ei:
        apply_expectations(frame, RULES, mode="fail")
    assert ei.value.metrics == {"v_positive": 2, "name_present": 2}


def test_fail_passes_clean_frame(spark, frame):
    clean = frame.filter("id = 1")
    kept, quarantined = apply_expectations(clean, RULES, mode="fail")
    assert kept.count() == 1
    assert quarantined.count() == 0


def test_metrics_one_row_per_rule(spark, frame):
    m = {r.rule: r for r in expectation_metrics(frame, RULES).collect()}
    assert m["v_positive"].n_total == 4
    assert m["v_positive"].n_violations == 2
    assert m["name_present"].pass_fraction == 0.5


def test_bad_mode_and_empty_rules_raise(spark, frame):
    with pytest.raises(ValueError):
        apply_expectations(frame, RULES, mode="quarantine")
    with pytest.raises(ValueError):
        apply_expectations(frame, {}, mode="drop")
