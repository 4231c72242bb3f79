"""Physical-plan introspection: assert that the optimizations we rely
on at scale (predicate pushdown, column pruning, broadcast joins,
partial top-k, whole-stage codegen) actually appear in the plan.

Used by tests/test_plans.py so plan-quality regressions fail CI, not a
100 TB run. The helpers parse ``df.explain("formatted")`` output — the
same artifact a human reads — so assertions match what an operator
would check by hand.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of columns actually read (column pruning check).

    The explain output truncates long struct strings ("...<cut>"), so
    the trailing partial field is dropped — callers should assert with
    ``<=`` (subset) semantics.
    """
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", explain_str(df)):
        fields = [f for f in m.group(1).split(",") if f.strip()]
        names = set()
        for i, f in enumerate(fields):
            if ":" not in f:  # truncated tail without a type — drop
                continue
            names.add(f.split(":")[0].strip())
        cols.append(names)
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in explain_str(df)


def has_whole_stage_codegen(df: DataFrame, execute: bool = True) -> bool:
    """Whether operators run inside WholeStageCodegen spans.

    Under AQE the pre-execution plan is just AdaptiveSparkPlan; codegen
    annotations ("codegen id : N" / starred operators) only appear in
    the final plan, so by default this executes the frame first (cheap
    at test SF)."""
    if execute:
        df.collect()
    return "codegen id" in explain_str(df, mode="formatted")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (each is a full network reshuffle —
    the unit of cost to minimize at 100 TB). BroadcastExchange is
    deliberately excluded — a dim-table ship, not a fact reshuffle.

    Counts the formatted plan's numbered operator entries
    ("(7) Exchange"); Spark's formatted mode stopped inlining the
    partitioning into the node name, so matching "Exchange hash..."
    silently counted zero."""
    return len(
        re.findall(r"^\(\d+\) Exchange\s*$", explain_str(df), flags=re.M)
    )
