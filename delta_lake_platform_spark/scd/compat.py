"""``delta.tables.DeltaTable``-compatible facade over ManagedTable.

Reference users drive their SCD flows through the Delta Lake Python API
(scd_handler.py:48-55):

    delta_table = DeltaTable.forName(spark, target_table)
    delta_table.alias("target").merge(df.alias("updates"), cond) \\
        .whenMatchedUpdate(condition=..., set=...) \\
        .whenNotMatchedInsert(values=...) \\
        .execute()
    delta_table.history(1).select("operationMetrics")

delta-spark is not installed here; this module reproduces those exact
call shapes on top of ManagedTable so reference notebook code runs
unmodified after swapping the import. Coverage is the surface the
reference exercises (forName/forPath, alias, fluent merge with
matched-update / matched-delete / not-matched-insert, history, toDF,
update, delete) — not the whole delta-spark API.

Name resolution: ``DeltaTable.forName`` looks up names registered via
``register_table`` first, then falls back to
``<spark.sql.warehouse.dir>/<name with '.' -> '/'>`` — so
``development.gold_dm.client_dim`` maps to a warehouse-relative path
exactly like a catalog-qualified Delta table name.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..sources.managed_table import ManagedTable, MergeClauses

_CATALOG: dict[str, str] = {}


def register_table(name: str, path: str) -> None:
    """Map a catalog-style table name to a ManagedTable path."""
    _CATALOG[name] = path


def _real_delta_table():
    """The real delta-spark DeltaTable class when the library is
    installed, else None. Reference users with actual ``_delta_log``
    tables get the real implementation through this facade — its fluent
    API (alias/merge/whenMatchedUpdate/.../execute, history, toDF) is
    what this module mirrors, so delegation is just returning the real
    object."""
    try:
        from delta.tables import DeltaTable as _Real

        return _Real
    except ImportError:
        return None


def _is_real_delta_path(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_delta_log"))


def _warehouse_path(spark: SparkSession, name: str) -> str:
    root = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if root.startswith("file:"):
        root = root[len("file:"):]
    return os.path.join(root, *name.split("."))


class DeltaMergeBuilder:
    """Fluent merge builder matching delta-spark's call shape."""

    def __init__(self, table: "DeltaTable", source: DataFrame, condition: str):
        self._table = table
        self._source = source
        self._condition = condition
        self._matched_update: dict[str, str] | None = None
        self._matched_condition: str | None = None
        self._matched_delete_condition: str | None = None
        self._not_matched_insert: dict[str, str] | None = None

    def whenMatchedUpdate(
        self, condition: str | None = None, set: dict[str, str] | None = None
    ) -> "DeltaMergeBuilder":
        self._matched_update = dict(set or {})
        self._matched_condition = condition
        return self

    def whenMatchedUpdateAll(
        self, condition: str | None = None
    ) -> "DeltaMergeBuilder":
        return self.whenMatchedUpdate(
            condition=condition,
            set={c: f"updates.{c}" for c in self._source.columns},
        )

    def whenMatchedDelete(self, condition: str | None = None) -> "DeltaMergeBuilder":
        self._matched_delete_condition = condition or "true"
        return self

    def whenNotMatchedInsert(
        self, condition: str | None = None, values: dict[str, str] | None = None
    ) -> "DeltaMergeBuilder":
        self._not_matched_insert = dict(values or {})
        self._not_matched_condition = condition
        return self

    def whenNotMatchedInsertAll(self) -> "DeltaMergeBuilder":
        return self.whenNotMatchedInsert(
            values={c: f"updates.{c}" for c in self._source.columns}
        )

    def whenNotMatchedBySourceUpdate(
        self, condition: str | None = None, set: dict[str, str] | None = None
    ) -> "DeltaMergeBuilder":
        """delta-spark 2.3+ fluent clause: target rows matching no
        source row; expressions may reference target columns only."""
        self._by_source_update = dict(set or {})
        self._by_source_update_condition = condition
        return self

    def whenNotMatchedBySourceDelete(
        self, condition: str | None = None
    ) -> "DeltaMergeBuilder":
        self._by_source_delete_condition = condition or "true"
        return self

    def execute(self) -> None:
        cond = self._table._rewrite_alias(self._condition)
        self._table._last_version = self._table._managed.merge(
            self._source,
            MergeClauses(
                condition=cond,
                matched_update=self._matched_update,
                matched_condition=(
                    self._table._rewrite_alias(self._matched_condition)
                    if self._matched_condition
                    else None
                ),
                matched_delete_condition=(
                    self._table._rewrite_alias(self._matched_delete_condition)
                    if self._matched_delete_condition
                    else None
                ),
                not_matched_insert=self._not_matched_insert,
                not_matched_condition=(
                    self._table._rewrite_alias(self._not_matched_condition)
                    if getattr(self, "_not_matched_condition", None)
                    else None
                ),
                by_source_update=getattr(self, "_by_source_update", None),
                by_source_update_condition=(
                    self._table._rewrite_alias(self._by_source_update_condition)
                    if getattr(self, "_by_source_update_condition", None)
                    else None
                ),
                by_source_delete_condition=(
                    self._table._rewrite_alias(self._by_source_delete_condition)
                    if getattr(self, "_by_source_delete_condition", None)
                    else None
                ),
            ),
        )


class DeltaTable:
    """Handle compatible with ``delta.tables.DeltaTable``."""

    def __init__(self, spark: SparkSession, managed: ManagedTable):
        self._spark = spark
        self._managed = managed
        self._alias: str | None = None
        self._last_version: int | None = None

    # -- constructors --------------------------------------------------------

    @classmethod
    def forPath(cls, spark: SparkSession, path: str):
        real = _real_delta_table()
        if real is not None and _is_real_delta_path(path):
            # An actual Delta table and the actual library: reference
            # users' tables work untranslated.
            return real.forPath(spark, path)
        t = ManagedTable(spark, path)
        if not t.exists():
            raise ValueError(f"no table at path {path!r}")
        return cls(spark, t)

    @classmethod
    def forName(cls, spark: SparkSession, name: str):
        path = _CATALOG.get(name)
        if path is None:
            real = _real_delta_table()
            if real is not None:
                try:
                    return real.forName(spark, name)
                except Exception:  # noqa: BLE001 — not a catalog Delta table
                    pass
            path = _warehouse_path(spark, name)
            if _real_delta_table() is not None and _is_real_delta_path(path):
                return _real_delta_table().forPath(spark, path)
        t = ManagedTable(spark, path)
        if not t.exists():
            raise ValueError(
                f"table {name!r} not found (looked at {path!r}; register "
                "it with delta_lake_platform_spark.scd.compat.register_table)"
            )
        return cls(spark, t)

    # -- surface the reference exercises ------------------------------------

    def alias(self, alias: str) -> "DeltaTable":
        if alias == "updates":
            # MergeClauses reserves "updates." for the source side; a
            # target aliased the same way would make every qualified
            # reference ambiguous after rewriting.
            raise ValueError(
                "target alias 'updates' collides with the reserved source "
                "alias; pick any other alias"
            )
        out = DeltaTable(self._spark, self._managed)
        out._alias = alias
        return out

    def _rewrite_alias(self, condition: str) -> str:
        """MergeClauses speaks ``target.`` / ``updates.``; rewrite a
        custom target alias to ``target.`` (the source side must already
        use ``updates.``, which is what the reference does).

        Word-boundary anchored: a bare ``condition.replace("s.", ...)``
        would also corrupt identifiers that merely *end* in the alias
        (``updates.id`` contains ``s.`` for alias ``s``)."""
        if self._alias and self._alias != "target":
            return re.sub(
                rf"(?<![A-Za-z0-9_]){re.escape(self._alias)}\.",
                "target.",
                condition,
            )
        return condition

    def merge(self, source: DataFrame, condition: str) -> DeltaMergeBuilder:
        return DeltaMergeBuilder(self, source, condition)

    def toDF(self) -> DataFrame:
        return self._managed.read()

    def history(self, limit: int | None = None) -> DataFrame:
        """Commit history as a DataFrame (newest first), operationMetrics
        as map<string,string> like Delta's."""
        entries = self._managed.history(limit)
        rows = [
            (
                int(e["version"]),
                float(e.get("timestamp", 0.0)),
                str(e.get("operation", "")),
                {
                    k: "" if v is None else str(v)
                    for k, v in (e.get("operationMetrics") or {}).items()
                },
            )
            for e in entries
        ]
        return self._spark.createDataFrame(
            rows,
            "version long, timestamp double, operation string, "
            "operationMetrics map<string,string>",
        )

    def update(self, condition: str | None = None, set: dict[str, str] | None = None) -> None:
        self._last_version = self._managed.update(set or {}, condition)

    def delete(self, condition: str | None = None) -> None:
        self._last_version = self._managed.delete(condition or "true")

    def detail(self) -> DataFrame:
        d = self._managed.detail()
        return self._spark.createDataFrame(
            [(str(d.get("location", "")), int(d.get("numFiles", 0)))],
            "location string, numFiles long",
        )
