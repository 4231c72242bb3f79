"""Event-stream analytics exposed to the driver.

These run the streaming logical plans in batch mode (Spark's unified
semantics: same plan, same results on a static frame) so DuckDB can
oracle-check them; tests/test_streaming.py runs the same plans as real
streams with watermarks and asserts stream==batch.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from ..streaming.events import sessionize, windowed_counts
from .registry import register


@contextmanager
def _stateful_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Stateful streaming operators create one state store PER shuffle
    partition PER stateful operator; a stream-stream join keeps four.
    The right count tracks the stateful key cardinality and cluster
    size, not the batch-side default — at this fixture's scale 32
    partitions is 32x state-store open/commit overhead for sub-MB
    state. Scoped to the query: batch queries keep the session default,
    and a 1000-executor deployment would raise it with the cluster."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

HOURLY_ORACLE = """
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("events_hourly_by_type", HOURLY_ORACLE)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windowed_counts(ev, window="1 hour").orderBy("window_start", "event_type")


@register("events_hourly_streamed", HOURLY_ORACLE)
def events_hourly_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME windowed aggregation executed as an ACTUAL Structured
    Streaming job — readStream file source over the events fixture,
    event-time watermark, complete-mode memory sink, availableNow
    trigger — then the sink table is returned for the oracle compare.
    This is the driver-verifiable proof that the streaming plan (not
    just its batch analogue) produces oracle-identical results; the
    analogue above shares the oracle, so any stream/batch divergence
    hash-mismatches one of the two."""
    import uuid

    from pyspark.sql import functions as F

    load_table(spark, sf_dir, "events")  # pins the UTC session timezone
    # File-stream sources need a directory; glob-filter down to the
    # events fixture inside the sf dir.
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sink = f"hourly_streamed_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark):
        q = (
            windowed_counts(stream, window="1 hour")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).orderBy("window_start", "event_type")


SLIDING_ORACLE = """
WITH slid AS (
  SELECT e.*, time_bucket(INTERVAL '30 minutes', e.ts) - (o.k * INTERVAL '30 minutes') AS window_start
  FROM events e
  CROSS JOIN (SELECT UNNEST([0, 1]) AS k) o
)
SELECT window_start,
  window_start + INTERVAL '1 hour' AS window_end,
  event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM slid
WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("events_sliding_by_type", SLIDING_ORACLE)
def events_sliding_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 1-hour window, 30-minute slide — each
    event lands in 2 windows. The oracle derives the same assignment
    relationally (bucket minus k slides)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


SESSION_ORACLE = """
WITH l AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events
),
g AS (
  SELECT *, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS new_session
  FROM l
),
s AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL '30 minutes' AS session_end,
  user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS session_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("events_sessionize", SESSION_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (F.session_window); the oracle derives
    sessions relationally via lag + cumulative-sum — the classic proof
    of session-window semantics."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes").orderBy("user_id", "session_start")


STREAM_STREAM_ORACLE = """
SELECT s.user_id,
       s.ts AS signup_ts,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events s
JOIN events p
  ON s.user_id = p.user_id
 AND s.event_type = 'signup'
 AND p.event_type = 'purchase'
 AND p.ts > s.ts
 AND p.ts <= s.ts + INTERVAL '2 hours'
ORDER BY s.user_id, signup_ts, purchase_ts
"""


@register("events_stream_stream_join", STREAM_STREAM_ORACLE)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL stream-stream interval join (streaming/joins.py): two
    watermarked file-source streams (signups, purchases) joined on
    user + a 2-hour event-time bound, append-mode memory sink,
    availableNow trigger. The fixture arrives as one micro-batch, so
    the watermark drops nothing and the result provably equals the
    batch join the oracle computes — while the executed plan is the
    real state-bounded streaming join, not the batch analogue."""
    import uuid

    from pyspark.sql import functions as F

    from ..streaming.joins import purchases_after_signup

    load_table(spark, sf_dir, "events")  # pins the UTC session timezone

    def stream():
        s = (
            spark.readStream.schema(
                spark.read.parquet(f"{sf_dir}/events.parquet").schema
            )
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = dict(s.dtypes).get("ts")
        if ts_type == "bigint":
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s

    # Stream self-join: both sides filter the SAME source, so the file
    # is scanned once per micro-batch instead of once per side.
    events = stream()
    signups = events.filter(F.col("event_type") == "signup")
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = purchases_after_signup(signups, purchases, within="2 hours")
    sink = f"ss_join_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink).orderBy("user_id", "signup_ts", "purchase_ts")


SCD_STREAM_ORACLE = """
WITH b1 AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
  FROM customer
)
SELECT * FROM (
  -- deleted upstream: the T1 row soft-closed (history retained, 'D')
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal_cents,
         'D' AS record_status,
         TIMESTAMP '2026-01-01 00:00:00' AS effective_from,
         TIMESTAMP '2026-01-02 00:00:00' AS effective_to,
         TIMESTAMP '2026-01-01 00:00:00' AS dw_inserted_at,
         TIMESTAMP '2026-01-02 00:00:00' AS dw_updated_at
  FROM b1 WHERE c_custkey % 13 = 0
  UNION ALL
  -- SCD2 segment change: the superseded version, closed at T2
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal_cents,
         'I', TIMESTAMP '2026-01-01 00:00:00',
         TIMESTAMP '2026-01-02 00:00:00',
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00'
  FROM b1 WHERE c_custkey % 13 <> 0 AND c_custkey % 9 = 0
  UNION ALL
  -- SCD2 segment change: the new active version (carrying any
  -- concurrent non-SCD balance bump)
  SELECT c_custkey, c_name, c_nationkey, 'STREAMED',
         c_acctbal_cents + CASE WHEN c_custkey % 11 = 0 THEN 777 ELSE 0 END,
         'A', TIMESTAMP '2026-01-02 00:00:00', CAST(NULL AS TIMESTAMP),
         TIMESTAMP '2026-01-02 00:00:00', TIMESTAMP '2026-01-02 00:00:00'
  FROM b1 WHERE c_custkey % 13 <> 0 AND c_custkey % 9 = 0
  UNION ALL
  -- non-SCD balance change only: updated in place, version kept
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal_cents + 777,
         'A', TIMESTAMP '2026-01-01 00:00:00', CAST(NULL AS TIMESTAMP),
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00'
  FROM b1 WHERE c_custkey % 13 <> 0 AND c_custkey % 9 <> 0
           AND c_custkey % 11 = 0
  UNION ALL
  -- untouched
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal_cents,
         'A', TIMESTAMP '2026-01-01 00:00:00', CAST(NULL AS TIMESTAMP),
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-01 00:00:00'
  FROM b1 WHERE c_custkey % 13 <> 0 AND c_custkey % 9 <> 0
           AND c_custkey % 11 <> 0
) t
ORDER BY c_custkey, effective_from
"""


@register("scd_stream_maintained_customers", SCD_STREAM_ORACLE)
def scd_stream_maintained_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCD2 dimension maintained by a CHANGE-FEED STREAM (r7,
    streaming/cdf.py::scd_maintain_stream): the upstream table mutates
    across three DML commits — an SCD2 segment rewrite (history
    version), a non-SCD balance bump (in-place update), and a DELETE
    (soft-close, record_status 'D') — and a ChangeFeedStream folds the
    net window through apply_scd / scd_soft_close. The oracle is the
    closed-form final dimension, so a missed close-out, double
    version, or wrong effective window hash-mismatches."""
    import shutil
    import tempfile
    from datetime import datetime

    from pyspark.sql import functions as F

    from ..scd import ScdConfig
    from ..scd.engine import create_scd_target
    from ..sources.managed_table import ManagedTable
    from ..streaming.cdf import scd_maintain_stream

    t1 = datetime(2026, 1, 1, 0, 0, 0)
    t2 = datetime(2026, 1, 2, 0, 0, 0)
    business = [
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        "c_acctbal_cents",
    ]

    def cfg(clock_value):
        return ScdConfig(
            pk_cols=["c_custkey"],
            scd_cols=["c_mktsegment"],
            select_cols=list(business),
            clock=lambda: clock_value,
        )

    d = tempfile.mkdtemp(prefix="dlp_scd_stream_")
    up = ManagedTable(spark, f"{d}/customer_up")
    up.create(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100)
            .cast("long")
            .alias("c_acctbal_cents"),
        )
    )
    dim = ManagedTable(spark, f"{d}/customer_dim")
    create_scd_target(dim, up.read(), cfg(t1))
    ckpt = f"{d}/ckpt"
    scd_maintain_stream(up, dim, cfg(t1), ckpt)   # initial load at T1
    up.update({"c_mktsegment": "'STREAMED'"}, "c_custkey % 9 = 0")
    up.update(
        {"c_acctbal_cents": "c_acctbal_cents + 777"}, "c_custkey % 11 = 0"
    )
    up.delete("c_custkey % 13 = 0")
    scd_maintain_stream(up, dim, cfg(t2), ckpt)   # three-commit window
    out = (
        dim.read()
        .select(
            *business,
            "record_status",
            "effective_from",
            "effective_to",
            "dw_inserted_at",
            "dw_updated_at",
        )
        .orderBy("c_custkey", "effective_from")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


# --- streaming expectations quarantine (r9) -----------------------------------

QUARANTINE_ORACLE = """
WITH f AS (
  SELECT
    (NOT COALESCE(value < 90, FALSE)) AS v_bounded,
    (NOT COALESCE(user_id % 7 <> 3, FALSE)) AS v_user,
    (NOT COALESCE(event_type IN ('click','view','purchase','error','signup'),
                  FALSE)) AS v_type
  FROM events
)
SELECT rule, n_rows FROM (
  SELECT 'value_bounded' AS rule, SUM(v_bounded::INT)::BIGINT AS n_rows FROM f
  UNION ALL
  SELECT 'user_cohort_ok', SUM(v_user::INT)::BIGINT FROM f
  UNION ALL
  SELECT 'type_known', SUM(v_type::INT)::BIGINT FROM f
  UNION ALL
  SELECT '__kept__', SUM((NOT v_bounded AND NOT v_user AND NOT v_type)::INT)::BIGINT FROM f
  UNION ALL
  SELECT '__quarantined__', SUM((v_bounded OR v_user OR v_type)::INT)::BIGINT FROM f
)
ORDER BY rule
"""


@register("events_stream_quarantine", QUARANTINE_ORACLE)
def events_stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations as a REAL Structured Streaming quarantine sink
    (streaming/quarantine.py): readStream over the events fixture,
    foreachBatch routes each micro-batch through the expectations gate
    into kept / quarantine ManagedTables with idempotent-writer
    appends (txnAppId/txnVersion — replayed batches are no-ops), then
    the quarantine table's failed_rules explode into per-rule counts.
    The oracle recomputes every count from the static fixture, so a
    dropped batch, a double-applied batch, or wrong routing
    hash-mismatches."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..sources.managed_table import ManagedTable
    from ..streaming.quarantine import expectations_stream

    rules = {
        "value_bounded": "value < 90",
        "user_cohort_ok": "user_id % 7 <> 3",
        "type_known": (
            "event_type IN ('click','view','purchase','error','signup')"
        ),
    }
    load_table(spark, sf_dir, "events")  # pins the UTC session timezone
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    d = tempfile.mkdtemp(prefix="dlp_quarantine_")
    kept = ManagedTable(spark, f"{d}/kept")
    quarantine = ManagedTable(spark, f"{d}/quarantine")
    with _stateful_shuffle_partitions(spark):
        expectations_stream(
            stream, rules, kept, quarantine, f"{d}/ckpt",
            stream_id="events_quarantine",
        )
    # left-join back to the DECLARED rule list: a rule with zero
    # violations must still report (0), not vanish from the profile
    counted = (
        quarantine.read()
        .select(F.explode("failed_rules").alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    per_rule = (
        spark.createDataFrame([(r,) for r in rules], "rule string")
        .join(counted, "rule", "left")
        .select(
            "rule",
            F.coalesce(F.col("n_rows"), F.lit(0).cast("long")).alias(
                "n_rows"
            ),
        )
    )
    summary = spark.createDataFrame(
        [
            ("__kept__", kept.read().count()),
            ("__quarantined__", quarantine.read().count()),
        ],
        "rule string, n_rows long",
    )
    out = per_rule.unionByName(summary).orderBy("rule").localCheckpoint()
    shutil.rmtree(d, ignore_errors=True)
    return out


# --- streaming decayed-aggregate maintenance (r9) -------------------------------

DECAYED_STREAM_ORACLE = """
WITH a AS (SELECT MAX(ts) AS anchor FROM events),
w AS (
  SELECT user_id, value,
    POWER(2.0, -(FLOOR(epoch(a.anchor)) - FLOOR(epoch(ts))) / 604800.0) AS wt
  FROM events, a
)
SELECT user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(wt * value), 4) AS decayed_sum,
  ROUND(SUM(wt), 4) AS decayed_count,
  ROUND(SUM(wt * value) / SUM(wt), 4) AS decayed_avg
FROM w
GROUP BY user_id
ORDER BY user_id
"""


@register("events_decayed_maintained", DECAYED_STREAM_ORACLE)
def events_decayed_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decayed-engagement state MAINTAINED by a real foreachBatch
    stream (streaming/decayed.py): the fixture is re-laid into 4 files
    streamed one per micro-batch, each folded into a persisted state
    table via decayed_agg_update (O(batch + keys), never a recompute)
    with commit-metadata batch watermarks for exactly-once. The fold
    is associative and commutative, so the final state equals the
    one-pass aggregate — the oracle is the SAME closed form the batch
    query uses; a double-fold, missed batch, or wrong re-anchor
    hash-mismatches."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..sources.managed_table import ManagedTable
    from ..streaming.decayed import decayed_maintain_stream

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    d = tempfile.mkdtemp(prefix="dlp_decayed_stream_")
    src = f"{d}/src"
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state = ManagedTable(spark, f"{d}/state")
    with _stateful_shuffle_partitions(spark):
        decayed_maintain_stream(
            stream, state, f"{d}/ckpt", stream_id="events_decayed",
        )
    out = (
        state.read()
        .select(
            "user_id", "n_events",
            F.round("decayed_sum", 4).alias("decayed_sum"),
            F.round("decayed_count", 4).alias("decayed_count"),
            F.round("decayed_avg", 4).alias("decayed_avg"),
        )
        .orderBy("user_id")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


# --- streaming heavy hitters (Misra-Gries maintenance, r10) -------------------

HH_STREAM_ORACLE = """
WITH c AS (
  SELECT user_id, COUNT(*)::BIGINT AS mg_count FROM events GROUP BY user_id
),
r AS (
  SELECT user_id, mg_count,
    ROW_NUMBER() OVER (ORDER BY mg_count DESC, user_id) AS rank
  FROM c
)
SELECT user_id, mg_count, rank FROM r WHERE rank <= 20 ORDER BY rank
"""


@register("events_stream_heavy_hitters", HH_STREAM_ORACLE)
def events_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters MAINTAINED by a real foreachBatch stream
    (streaming/heavy_hitters.py): the fixture re-laid into 4 files
    streamed one per micro-batch, each batch's key counts folded into
    a persisted Misra-Gries summary (commit-metadata watermarks for
    exactly-once). ``m`` here exceeds the fixture's key cardinality,
    so no fold ever truncates and the maintained counts are provably
    EXACT — the oracle is a plain groupBy count; a dropped batch, a
    double fold, or a wrong merge hash-mismatches. The truncating
    (bounded-state) regime and its N/(m+1) undercount bound are
    pinned by tests/test_heavy_hitters_stream.py."""
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sources.managed_table import ManagedTable
    from ..streaming.heavy_hitters import heavy_hitters_maintain_stream

    ev = load_table(spark, sf_dir, "events").select("user_id")
    d = tempfile.mkdtemp(prefix="dlp_hh_stream_")
    src = f"{d}/src"
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state = ManagedTable(spark, f"{d}/state")
    with _stateful_shuffle_partitions(spark):
        heavy_hitters_maintain_stream(
            stream, state, f"{d}/ckpt", m=1_000_000,
            stream_id="events_hh",
        )
    w = Window.orderBy(F.desc("mg_count"), F.asc("user_id"))
    out = (
        state.read()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
        .localCheckpoint()
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


# --- streaming near-dup ingest gate (r10) -------------------------------------

# Clean originals = docs with NO natural >=0.8 near-dup (brute-force
# pair scan, same shingle/Jaccard definition the batch MinHash oracle
# uses) — every near-dup class in the gate corpus is then a planted
# CLIQUE, making the admitted count provably arrival-order invariant:
# one survivor per class, however the stream batches them.
_GATE_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

GATE_ORACLE = f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, GREATEST(LENGTH({_GATE_NORM}) - 4, 1) + 1),
      i -> ({_GATE_NORM})[i:i+4]
    )) AS shingles
  FROM base
),
nat AS (
  SELECT DISTINCT doc_id FROM (
    SELECT a.doc_id FROM sh a JOIN sh b ON a.doc_id != b.doc_id
    WHERE LEN(list_intersect(a.shingles, b.shingles)) * 1.0 /
      (LEN(a.shingles) + LEN(b.shingles)
       - LEN(list_intersect(a.shingles, b.shingles))) >= 0.8
  )
),
clean AS (
  SELECT doc_id FROM base WHERE doc_id NOT IN (SELECT doc_id FROM nat)
),
c AS (
  SELECT COUNT(*)::BIGINT AS n_clean,
    SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
    SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_mut
  FROM clean
)
SELECT (n_clean + n_exact + n_mut) AS n_arrived,
       n_clean AS n_admitted,
       (n_exact + n_mut) AS n_rejected
FROM c
"""


@register("docs_stream_neardup_gate", GATE_ORACLE)
def docs_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate INGEST GATE as a real foreachBatch stream
    (streaming/dedup_gate.py): clean originals + planted exact and
    mutated copies arrive in 4 micro-batches; each batch's MinHash
    buckets are checked against the admitted corpus (plus verified
    within-batch pairs), and only one member per near-dup class
    survives — whichever batch it arrived in. Each fold is ONE
    txn-idempotent append (docs + bucket index in the same commit),
    so folds are atomic and replays no-op. The oracle derives the
    three counts from the brute-force pair structure; a missed
    rejection, a double admission, or a dropped batch hash-mismatches."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.dedup import ngram_jaccard_pairs
    from ..sources.managed_table import ManagedTable
    from ..streaming.dedup_gate import neardup_gate_stream

    # pin the 100-doc slice once: the pair scan reads it twice (a/b),
    # the clean join and the three corpus branches again — without the
    # checkpoint each consumer re-scans the full documents parquet.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 100).localCheckpoint()
    # the clean-originals set must use the SAME pair definition as the
    # oracle (brute-force exact Jaccard) — an LSH-derived set agrees
    # only when banding misses no natural >=0.8 pair, which is
    # fixture luck, not a guarantee. Exact all-pairs is bounded here
    # (100 docs); the gate under test still runs the real LSH path.
    nat = ngram_jaccard_pairs(docs).filter(F.col("jaccard") >= 0.8)
    paired = nat.select(F.col("id_a").alias("doc_id")).unionByName(
        nat.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    clean = docs.join(paired, "doc_id", "left_anti").localCheckpoint()
    exact = clean.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    mutated = (
        clean.filter(F.col("doc_id") % 2 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" z")))
    )
    corpus = clean.unionByName(exact).unionByName(mutated)

    d = tempfile.mkdtemp(prefix="dlp_gate_")
    src = f"{d}/src"
    corpus.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    admitted = ManagedTable(spark, f"{d}/admitted")
    with _stateful_shuffle_partitions(spark):
        neardup_gate_stream(
            stream, admitted, f"{d}/ckpt",
            stream_id="docs_gate",
        )
    n_arrived = corpus.count()
    n_admitted = admitted.read().count()
    out = spark.createDataFrame(
        [(n_arrived, n_admitted, n_arrived - n_admitted)],
        "n_arrived long, n_admitted long, n_rejected long",
    )
    shutil.rmtree(d, ignore_errors=True)
    return out
