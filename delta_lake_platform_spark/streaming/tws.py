"""transformWithStateInPandas operators (Spark 4.x stateful API).

The modern successor to applyInPandasWithState: named state variables
(ValueState/ListState/MapState), timers, and per-state TTL — the TTL
is the 100 TB story, because unbounded dedup/session state is what
kills long-running streams, and TTL bounds it declaratively instead
of via hand-rolled timeout bookkeeping.

ENV-GATED TIER: the transformWithState Python worker needs
``google.protobuf`` (state-server wire protocol) and the RocksDB state
store. This container ships neither protobuf nor a way to install it,
so the operator is import-safe but raises a clear error at start when
the runtime dependency is missing; tests skip the same way the
delta-spark and Pillow tiers do.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

try:  # the class only exists on pyspark >= 4
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the transformWithState runtime can actually start:
    pyspark exposes the API and protobuf (the Python state-server wire
    protocol) is importable."""
    if StatefulProcessor is object:
        return False
    try:  # find_spec on a dotted name raises when the PARENT is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class FirstSeenProcessor(StatefulProcessor):
    """Emit only the FIRST row ever seen per key; remember keys in a
    ValueState, optionally TTL-bounded so the seen-set does not grow
    without bound on an infinite stream (the state-size failure mode
    of naive streaming dedup)."""

    OUTPUT = StructType(
        [
            StructField("key", LongType()),
            StructField("first_event_id", LongType()),
        ]
    )

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = StructType([StructField("seen", LongType())])
        if self._ttl_ms is not None:
            from pyspark.sql.streaming import TTLConfig  # pyspark >= 4

            self.seen = handle.getValueState(
                "seen", schema, TTLConfig(self._ttl_ms)
            )
        else:
            self.seen = handle.getValueState("seen", schema)

    def handleInputRows(self, key, rows, timerValues):
        if self.seen.exists():
            return iter([])
        first = None
        for pdf in rows:
            if len(pdf) and first is None:
                first = int(pdf.iloc[0]["event_id"])
        if first is None:
            return iter([])
        self.seen.update((1,))
        return iter(
            [pd.DataFrame({"key": [key[0]], "first_event_id": [first]})]
        )

    def close(self) -> None:
        pass


def streaming_first_seen(
    events: DataFrame,
    key_col: str = "user_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-occurrence filter over a stream via
    ``transformWithStateInPandas``: one output row per key, state
    TTL-bounded when ``ttl_minutes`` is given (re-admits a key after
    the TTL — the standard at-scale trade for bounded state).

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``ROCKSDB_PROVIDER``) and protobuf; raises with the gate message
    when the runtime tier is absent.
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (state "
            "server wire protocol), absent in this environment; see "
            "streaming/tws.py ENV-GATED TIER"
        )
    proc = FirstSeenProcessor(
        ttl_ms=None if ttl_minutes is None else ttl_minutes * 60_000
    )
    return events.groupBy(key_col).transformWithStateInPandas(
        proc,
        outputStructType=FirstSeenProcessor.OUTPUT,
        outputMode="Append",
        timeMode="None" if ttl_minutes is None else "ProcessingTime",
    )
