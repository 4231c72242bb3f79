"""Reference-parity public API.

The reference exposes two functions (scd_handler.py:7, :58):

    delta_merge(df, pk_col, delta_table, is_active_data=False)
    apply_scd(df, scd_key_col, pk_col, target_table, select_col_list,
              effective_from_col, initial_eff_date,)

This module reproduces those signatures (modulo the ambient-Databricks
globals, replaced by explicit SparkSession/ManagedTable handles) on top
of the rebuilt engine, so a user of the reference can port call sites
mechanically. Differences, all deliberate:

- ``delta_merge`` targets a ManagedTable (delta-spark is unavailable
  here); the merge-condition construction is the reference's exactly
  (scd_handler.py:34-36): equi on pk + effective_to IS NULL +
  record_status='A', plus scd_key equality and the upd_key gate in
  active mode.
- ``apply_scd`` does NOT mutate the caller's scd_key_col list (the
  reference extends it in place at scd_handler.py:83).
- the hash fingerprint defaults to the null-safe variant; pass
  ``compat_hash=True`` for reference-identical hashes
  (scd_handler.py:102-103 uses concat_ws('') — collision-prone).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame

from ..sources.managed_table import ManagedTable, MergeClauses
from .engine import ScdConfig, apply_scd as _apply_scd


def delta_merge(
    df: DataFrame,
    pk_col: list[str],
    table: ManagedTable,
    is_active_data: bool = False,
) -> int:
    """Reference scd_handler.py:7-55 re-derived.

    Builds the merge search condition string exactly as the reference
    does (:34), gates matched updates on upd_key inequality in active
    mode (:36), excludes dw_inserted_at/effective_from from updates
    (:38-41), inserts all columns for unmatched rows (:43-46), and
    returns the committed version whose history entry carries the
    operation metrics the reference displays (:54-55).
    """
    pk_eq = " AND ".join(f"target.{c} = updates.{c}" for c in pk_col)
    cond = f"{pk_eq} AND target.effective_to IS NULL AND target.record_status = 'A'"
    if is_active_data:
        cond += " AND target.scd_key = updates.scd_key"
    cols = list(df.columns)
    update_cols = (
        {c: f"updates.{c}" for c in cols if c not in ("dw_inserted_at", "effective_from")}
        if is_active_data
        else {c: f"updates.{c}" for c in cols}
    )
    return table.merge(
        df,
        MergeClauses(
            condition=cond,
            matched_update=update_cols,
            matched_condition=(
                "target.upd_key != updates.upd_key" if is_active_data else None
            ),
            not_matched_insert={c: f"updates.{c}" for c in cols},
        ),
    )


def apply_scd(
    df: DataFrame,
    scd_key_col: list[str],
    pk_col: list[str],
    target_table: ManagedTable,
    select_col_list: list[str] | None = None,
    effective_from_col: str | None = None,
    initial_eff_date: str | None = None,
    clock: Callable[[], datetime] = datetime.now,
    compat_hash: bool = False,
    mode: str = "single_commit",
) -> int:
    """Reference scd_handler.py:58-163 signature adapter onto the
    rebuilt engine (see scd/engine.py for the semantics table)."""
    cfg = ScdConfig(
        pk_cols=list(pk_col),
        scd_cols=list(scd_key_col),  # copy: no caller mutation (ref :83)
        select_cols=list(select_col_list) if select_col_list else None,
        effective_from_col=effective_from_col,
        initial_eff_date_col=initial_eff_date,
        clock=clock,
        compat_hash=compat_hash,
    )
    return _apply_scd(df, target_table, cfg, mode=mode)
