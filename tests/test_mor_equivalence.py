"""Property: a sequence of DML ops executed merge-on-read (deletion
vectors + incremental batches) yields exactly the same visible table as
the same sequence executed copy-on-write. The physical layout differs
(manifests, sidecars vs snapshots); the logical table must not."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import (
    ManagedTable,
    MergeClauses,
)

# Each op is (kind, parameter). Parameters index into fixed predicates/
# batches so hypothesis explores orderings, not arbitrary SQL.
_PREDICATES = ["k = 1", "id % 7 = 3", "v > 150", "id < 4"]
_SETS = [{"v": "v + 100"}, {"v": "0 - v"}]

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.sampled_from(range(len(_PREDICATES)))),
        st.tuples(st.just("update"), st.sampled_from(range(len(_SETS)))),
        st.tuples(st.just("append"), st.sampled_from(range(3))),
        st.tuples(st.just("merge"), st.sampled_from(range(2))),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("compact_where"), st.just(0)),
    ),
    min_size=1,
    max_size=4,
)


def _base(spark):
    return spark.range(0, 40).select(
        "id", (F.col("id") % 4).alias("k"), (F.col("id") * 10).alias("v")
    )


def _apply(spark, table: ManagedTable, op: tuple, mor: bool) -> None:
    kind, i = op
    if kind == "delete":
        table.delete(_PREDICATES[i], rewrite=not mor)
    elif kind == "update":
        table.update(_SETS[i], _PREDICATES[(i + 1) % len(_PREDICATES)],
                     rewrite=not mor)
    elif kind == "append":
        lo = 100 + 10 * i
        table.append(
            spark.range(lo, lo + 5).select(
                "id", (F.col("id") % 4).alias("k"), (F.col("id") * 10).alias("v")
            ),
            fast=mor,
        )
    elif kind == "merge":
        src = spark.range(2 * i, 2 * i + 30, 3).select(
            "id", (F.col("id") + 1000).alias("nv")
        )
        table.merge(
            src,
            MergeClauses(
                condition="target.id = updates.id",
                matched_update={"v": "updates.nv"},
                matched_delete_condition="updates.nv % 2 = 1"
                if i == 1
                else None,
                not_matched_insert={
                    "id": "updates.id",
                    "k": "updates.id % 4",
                    "v": "updates.nv",
                },
            ),
            rewrite=not mor,
        )
    elif kind == "compact":
        table.compact(target_partitions=2)
    elif kind == "compact_where":
        table.compact_where("id < 20", target_partitions=1)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_mor_sequence_equals_cow_sequence(spark, ops):
    d = tempfile.mkdtemp(prefix="mor_eq_")
    cow = ManagedTable(spark, f"{d}/cow")
    mor = ManagedTable(spark, f"{d}/mor")
    cow.create(_base(spark))
    mor.create(_base(spark))
    for op in ops:
        _apply(spark, cow, op, mor=False)
        _apply(spark, mor, op, mor=True)
    a = sorted(map(tuple, cow.read().select("id", "k", "v").collect()))
    b = sorted(map(tuple, mor.read().select("id", "k", "v").collect()))
    assert a == b, f"diverged after {ops}"
