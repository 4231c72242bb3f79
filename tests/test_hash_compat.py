"""Fingerprint modes: the compat hash must equal the reference's exact
sha2(concat_ws('', cols)) bytes; the default must fix its collisions."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from delta_lake_platform_spark.functions.hashing import row_fingerprint


def test_compat_hash_matches_reference_formula(spark):
    """Reference scd_handler.py:102: sha2(concat_ws('', units, id), 256).
    Reproduce the exact digest for a known row."""
    df = spark.createDataFrame([(100, 1, "Google")], "units long, id long, name string")
    got = df.select(
        row_fingerprint(["units", "id"], compat=True).alias("h")
    ).first()[0]
    expected = hashlib.sha256(b"1001").hexdigest()  # concat_ws('') of 100,1
    assert got == expected


def test_compat_hash_collides_default_does_not(spark):
    """The documented hazard: ("ab","c") vs ("a","bc") and NULL vs ''."""
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc"), (None, "x"), ("", "x")], "a string, b string"
    )
    compat = [r[0] for r in df.select(row_fingerprint(["a", "b"], compat=True)).collect()]
    safe = [r[0] for r in df.select(row_fingerprint(["a", "b"], compat=False)).collect()]
    assert compat[0] == compat[1]      # reference collides
    assert safe[0] != safe[1]          # default does not
    assert compat[2] == compat[3]      # reference: NULL == ''
    assert safe[2] != safe[3]          # default distinguishes


def test_scd_engine_rejects_bad_target(spark):
    import tempfile, shutil
    from delta_lake_platform_spark.scd import ScdConfig, apply_scd
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="badtarget_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        t.create(spark.createDataFrame([(1, "x")], "id long, v string"))
        cfg = ScdConfig(pk_cols=["id"], scd_cols=["v"])
        batch = spark.createDataFrame([(1, "y")], "id long, v string")
        try:
            apply_scd(batch, t, cfg)
            raise AssertionError("expected ValueError for missing system columns")
        except ValueError as e:
            assert "system columns" in str(e)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_empty_batch_is_noop(spark):
    import tempfile, shutil
    from datetime import datetime
    from delta_lake_platform_spark.scd import ScdConfig, apply_scd
    from delta_lake_platform_spark.scd.engine import create_scd_target
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="emptybatch_")
    try:
        t = ManagedTable(spark, f"{d}/t")
        proto = spark.createDataFrame([(1, "x")], "id long, v string")
        cfg = ScdConfig(
            pk_cols=["id"], scd_cols=["v"], clock=lambda: datetime(2026, 1, 1)
        )
        create_scd_target(t, proto, cfg)
        apply_scd(proto, t, cfg)
        before = sorted(map(tuple, t.read().collect()))
        apply_scd(proto.limit(0), t, cfg)
        after = sorted(map(tuple, t.read().collect()))
        assert before == after
    finally:
        shutil.rmtree(d, ignore_errors=True)
