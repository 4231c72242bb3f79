"""Data-quality expectations — the Delta Live Tables contract
(expect / expect_or_drop / expect_or_fail) over any DataFrame.

Reference parity: DLT's ``@dlt.expect*`` decorators attach named SQL
predicates to a dataset and route rows / fail the update / record
metrics. Here the same contract is a plain operator:

- ``apply_expectations(df, rules)`` returns a routing of the frame
  (kept vs quarantined, each a lazy DataFrame — no action is taken)
  plus a metrics builder.
- mode "allow"  — keep every row (metrics only; DLT ``expect``)
- mode "drop"   — quarantine rows failing ANY rule (``expect_or_drop``)
- mode "fail"   — raise ``ExpectationViolation`` with per-rule counts
  if any row fails (``expect_or_fail``)

Scale shape at 100 TB: routing is a single codegen'd filter on the
conjunction (zero shuffles, evaluated inside the scan's
WholeStageCodegen span); metrics are ONE aggregate job summing
boolean casts — one pass over the data for ALL rules, never a job
per rule. NULL predicate results count as violations (a rule that
cannot prove a row clean does not pass it) — same as DLT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationViolation(Exception):
    """Raised in mode='fail' when any rule has violations; carries
    ``.metrics`` = {rule: n_violations}."""

    def __init__(self, metrics: dict[str, int]):
        self.metrics = {k: v for k, v in metrics.items() if v}
        super().__init__(
            "expectations failed: "
            + ", ".join(f"{k}={v}" for k, v in sorted(self.metrics.items()))
        )


def _pass_col(expr: str) -> F.Column:
    # NULL -> violation: coalesce the predicate to false.
    return F.coalesce(F.expr(expr), F.lit(False))


def expectation_metrics(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """One row per rule: (rule, n_total, n_violations, pass_fraction).
    A single aggregate pass regardless of rule count."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum((~_pass_col(expr)).cast("long")).alias(f"__v_{i}")
            for i, expr in enumerate(rules.values())
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_total"),
                F.coalesce(F.col(f"__v_{i}"), F.lit(0)).alias(
                    "n_violations"
                ),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.rule", "r.n_total", "r.n_violations")
        .withColumn(
            "pass_fraction",
            F.round(
                1.0
                - F.col("n_violations")
                / F.nullif(F.col("n_total").cast("double"), F.lit(0.0)),
                6,
            ),
        )
    )


def apply_expectations(
    df: DataFrame,
    rules: dict[str, str],
    mode: str = "drop",
) -> tuple[DataFrame, DataFrame]:
    """Route ``df`` through named SQL expectations.

    Returns ``(kept, quarantined)`` — both lazy. ``quarantined``
    carries a ``failed_rules`` array column naming every rule the row
    violated (the DLT quarantine-table pattern). mode='allow' keeps
    everything (quarantined is the violating subset, for metrics /
    side-tables); mode='drop' keeps only clean rows; mode='fail'
    triggers ONE count job and raises ``ExpectationViolation`` when
    any rule is violated.
    """
    if mode not in ("allow", "drop", "fail"):
        raise ValueError(f"unknown expectations mode: {mode!r}")
    if not rules:
        raise ValueError("expectations require at least one rule")
    all_pass = None
    for expr in rules.values():
        p = _pass_col(expr)
        all_pass = p if all_pass is None else (all_pass & p)
    failed = F.filter(
        F.array(
            *[
                F.when(~_pass_col(expr), F.lit(name))
                for name, expr in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    quarantined = df.filter(~all_pass).withColumn("failed_rules", failed)
    if mode == "fail":
        counts = {
            r["rule"]: r["n_violations"]
            for r in expectation_metrics(df, rules).collect()
        }
        if any(counts.values()):
            raise ExpectationViolation(counts)
        return df, quarantined
    kept = df if mode == "allow" else df.filter(all_pass)
    return kept, quarantined
