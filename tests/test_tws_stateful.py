"""transformWithStateInPandas tier (streaming/tws.py).

The runtime needs google.protobuf (absent in this container), so the
end-to-end test skips exactly like the delta-spark and Pillow tiers;
the gate behavior itself is always tested.
"""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest

from delta_lake_platform_spark.streaming import tws


def test_gate_raises_clearly_when_runtime_absent(spark):
    events = spark.readStream.schema("user_id long, event_id long").parquet(
        tempfile.mkdtemp()
    )
    if tws.tws_available():
        pytest.skip("protobuf present: gate does not fire here")
    with pytest.raises(NotImplementedError, match="protobuf"):
        tws.streaming_first_seen(events)


def test_first_seen_end_to_end(spark, tmp_path):
    """First occurrence per key survives; replays and later
    occurrences are suppressed across micro-batches."""
    if not tws.tws_available():
        pytest.skip("google.protobuf absent: transformWithState worker "
                    "cannot start in this environment")
    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")
    pd.DataFrame({"user_id": [1, 1, 2], "event_id": [10, 11, 20]}).to_parquet(
        str(src / "a.parquet")
    )
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER
    )
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long"
        ).parquet(str(src))
        res = tws.streaming_first_seen(stream)

        def run(name):
            q = (
                res.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return sorted(
                tuple(r) for r in spark.sql(f"select * from {name}").collect()
            )

        assert run("tws1") == [(1, 10), (2, 20)]
        pd.DataFrame({"user_id": [1, 3], "event_id": [12, 30]}).to_parquet(
            str(src / "b.parquet")
        )
        assert run("tws2") == [(3, 30)]  # key 1 already seen
    finally:
        if old:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
