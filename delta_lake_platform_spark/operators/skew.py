"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most skew automatically (enabled in
the session factory); these explicit tools cover the cases AQE can't:
a single hot group in an aggregation (AQE cannot split one group) and
broadcast-ineligible joins against a hot key.

Salting is deterministic here (hash of a caller-chosen spread column,
not rand()) so results are reproducible and retries are safe — at
1000-executor scale a nondeterministic salt makes task retries produce
different partitionings mid-stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    spread_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: output alias -> (column, fn) with fn in sum/count/min/max
    (associative, so partial-of-partial is exact). Phase 1 groups by
    (keys + salt) — a hot key spreads over n_salts reducers; phase 2
    combines the n_salts partials per key (tiny).
    """
    salt = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _AGGS[fn](col).alias(f"__p_{alias}")
            for alias, (col, fn) in aggs.items()
        ]
    )
    recombine = {
        "sum": F.sum,
        "count": F.sum,  # counts add up
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*keys).agg(
        *[
            recombine[fn](f"__p_{alias}").alias(alias)
            for alias, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    spread_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` cannot be
    broadcast: big rows get a deterministic salt; small rows are
    replicated across all salts; the join key becomes (on + salt), so a
    hot key's rows land on n_salts reducers instead of one."""
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts))
    )
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return b.join(s, on=[*on, "__salt"], how=how).drop("__salt")
