"""Property-based SCD invariants (FIXTURES.md §4) under random batch
sequences: whatever the inputs, the table must stay consistent."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_platform_spark.scd import ScdConfig, apply_scd
from delta_lake_platform_spark.scd.engine import create_scd_target
from delta_lake_platform_spark.sources.managed_table import ManagedTable

ROW = st.tuples(
    st.integers(min_value=1, max_value=6),          # pk
    st.integers(min_value=0, max_value=3),          # scd-tracked value
    st.sampled_from(["x", "y", "z"]),               # scd1 value
)
BATCH = st.lists(ROW, min_size=0, max_size=8)


def _cfg(day: int) -> ScdConfig:
    return ScdConfig(
        pk_cols=["id"],
        scd_cols=["v"],
        select_cols=["id", "v", "cat"],
        clock=lambda: datetime(2026, 1, 1) + timedelta(days=day),
    )


def _dedupe(batch):
    seen = {}
    for pk, v, cat in batch:
        seen[pk] = (pk, v, cat)
    return list(seen.values())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(BATCH, min_size=1, max_size=3))
def test_scd_invariants_hold(spark, batches):
    d = tempfile.mkdtemp(prefix="scd_prop_")
    try:
        table = ManagedTable(spark, f"{d}/t")
        proto = spark.createDataFrame(
            [(1, 0, "x")], "id long, v long, cat string"
        )
        create_scd_target(table, proto, _cfg(0))
        seen_pks = set()
        for day, batch in enumerate(batches, start=1):
            batch = _dedupe(batch)
            seen_pks |= {r[0] for r in batch}
            if not batch:
                continue
            df = spark.createDataFrame(batch, "id long, v long, cat string")
            apply_scd(df, table, _cfg(day))
        rows = table.read().collect()

        # Invariant 1: exactly one open active row per seen PK.
        by_pk: dict[int, list] = {}
        for r in rows:
            by_pk.setdefault(r.id, []).append(r)
        assert set(by_pk) == seen_pks
        for pk, vs in by_pk.items():
            actives = [
                r for r in vs if r.record_status == "A" and r.effective_to is None
            ]
            assert len(actives) == 1, (pk, vs)

            # Invariant 2: closed rows partition the timeline.
            chain = sorted(vs, key=lambda r: str(r.effective_from))
            for a, b in zip(chain, chain[1:]):
                assert a.effective_to == b.effective_from, (pk, chain)
            assert chain[-1].effective_to is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=BATCH)
def test_scd_idempotent(spark, batch):
    batch = _dedupe(batch)
    if not batch:
        return
    d = tempfile.mkdtemp(prefix="scd_idem_prop_")
    try:
        table = ManagedTable(spark, f"{d}/t")
        df = spark.createDataFrame(batch, "id long, v long, cat string")
        create_scd_target(table, df, _cfg(0))
        apply_scd(df, table, _cfg(1))
        snap1 = sorted(map(tuple, table.read().collect()))
        apply_scd(df, table, _cfg(2))  # identical content, later clock
        snap2 = sorted(map(tuple, table.read().collect()))
        assert snap1 == snap2
    finally:
        shutil.rmtree(d, ignore_errors=True)
