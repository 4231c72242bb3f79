"""Incrementally-maintained aggregate views over a ManagedTable.

The platform analogue of a materialized view with delta-based refresh
(Databricks/Snowflake MVs, Materialize-style IVM): the view stores
per-group partial aggregates, and ``refresh()`` folds in only the rows
that changed since the last refresh — read from the base table's
change feed — instead of rescanning the base.

Maintainable aggregates are the self-decomposable ones: ``sum`` and
``count`` (and ``avg`` derived as sum/count at read time). They form an
abelian group under row insert/delete, so an update (delete+insert in
the feed) nets out exactly. min/max are deliberately NOT offered: they
are not invertible under deletes without keeping per-group heaps.

Scale: refresh cost is O(|delta|) + a merge against the view state,
which is |groups|-sized — never O(|base|). At 100 TB the change feed
comes from the commit log (Delta CDF files), and the state merge
shuffles only group keys; the base table is untouched. The full-outer
state merge is the same dataflow as the SCD engine's single-commit
apply (scd/engine.py), reused deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .managed_table import ManagedTable


class MaterializedAggView:
    """``group_cols``-keyed sums/counts over a base ManagedTable.

    ``sum_cols``: input columns to maintain sums for (stored as
    ``sum_<col>``); a row count is always maintained as ``n_rows``.
    """

    def __init__(
        self,
        base: ManagedTable,
        path: str,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.base = base
        self.state = ManagedTable(base.spark, path)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)

    # -- aggregation helpers ------------------------------------------------

    def _aggregate(self, df: DataFrame, sign_col: str | None = None) -> DataFrame:
        """Group ``df`` to the view grain. With ``sign_col`` (+1/-1),
        produces signed deltas so deletes subtract."""
        sign = F.col(sign_col) if sign_col else F.lit(1)
        return df.groupBy(*self.group_cols).agg(
            F.sum(sign).cast("long").alias("n_rows"),
            *[
                F.sum(F.col(c) * sign).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )

    def _base_version(self) -> int:
        return self.state.history(1)[0]["operationMetrics"]["baseVersion"]

    # -- lifecycle ----------------------------------------------------------

    def create(self) -> int:
        """Full initial computation at the base's current version."""
        v = self.base.latest_version()
        snap = self._aggregate(self.base.read(v))
        return self.state._commit(snap, "MV_CREATE", {"baseVersion": v})

    def refresh(self) -> int:
        """Fold the base's changes since the last refresh into the
        state. No-op (and no commit) when already current."""
        last, cur = self._base_version(), self.base.latest_version()
        if cur == last:
            return self.state.latest_version()
        feed = self.base.change_feed(last, cur)
        signed = feed.withColumn(
            "__sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        delta = self._aggregate(signed, "__sign")

        old = self.state.read().alias("o")
        d = delta.alias("d")
        merged = (
            old.join(d, on=self.group_cols, how="full_outer")
            .select(
                *self.group_cols,
                (
                    F.coalesce(F.col("o.n_rows"), F.lit(0))
                    + F.coalesce(F.col("d.n_rows"), F.lit(0))
                ).alias("n_rows"),
                *[
                    (
                        F.coalesce(F.col(f"o.sum_{c}"), F.lit(0))
                        + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0))
                    ).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .filter(F.col("n_rows") > 0)  # fully-deleted groups vanish
        )
        return self.state._commit(merged, "MV_REFRESH", {"baseVersion": cur})

    def read(self) -> DataFrame:
        """View contents with derived ``avg_<col>`` columns."""
        df = self.state.read()
        for c in self.sum_cols:
            df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
        return df

    def is_stale(self) -> bool:
        return self.base.latest_version() != self._base_version()
