"""Heavy hitters: exact baseline, misra-gries candidates, count-min
width bounds, and the sketch->exact-recount composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.sketches import (
    frequent_items_approx,
    heavy_hitters_exact,
)
from delta_lake_platform_spark.sources.catalog import load_table


def test_heavy_hitters_exact_matches_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        (r.user_id, r.cnt) for r in heavy_hitters_exact(ev, ["user_id"], k=10).collect()
    }
    naive = (
        ev.groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc(), "user_id")
        .limit(10)
        .collect()
    )
    assert got == {(r.user_id, r["count"]) for r in naive}


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    """misra-gries guarantee: every key with share > support IS in the
    candidate list (no false negatives; false positives allowed)."""
    ev = load_table(spark, sf_dir, "events")
    support = 0.02
    candidates = set(frequent_items_approx(ev, "user_id", support=support))
    total = ev.count()
    truly_heavy = {
        r.user_id
        for r in ev.groupBy("user_id").count().collect()
        if r["count"] / total > support
    }
    assert truly_heavy <= candidates, truly_heavy - candidates


def test_sketch_then_exact_recount(spark, sf_dir):
    """The scale composition: cheap one-pass candidates, then an exact
    count restricted to candidates (a broadcastable semi-join)."""
    ev = load_table(spark, sf_dir, "events")
    candidates = frequent_items_approx(ev, "user_id", support=0.01)
    recount = (
        ev.filter(F.col("user_id").isin(candidates))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = {
        r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()
    }
    for r in recount.collect():
        assert r.cnt == exact[r.user_id]


def test_count_min_sketch_overcounts_only(spark, sf_dir):
    """CMS point estimates are >= true counts (one-sided error), and
    within eps*N with the configured confidence."""
    ev = load_table(spark, sf_dir, "events")
    sketch = ev.select(
        F.count_min_sketch(
            F.col("user_id"), F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("cms")
    ).first()["cms"]
    jvm_sketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch)
    )
    total = ev.count()
    true_counts = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    for uid, true in list(true_counts.items())[:20]:
        est = jvm_sketch.estimateCount(uid)
        assert est >= true
        assert est - true <= 0.001 * total * 3  # 3x slack on the eps bound


def test_int8_quantization_roundtrip(spark, sf_dir):
    """Quantized cosine ranks track full-precision ranks: top-1 neighbor
    by int8 dot agrees with fp top-1 for most queries, and dequantized
    values are within scale/254 of the originals elementwise."""
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.functions.vectors import (
        dequantize_int8,
        max_abs,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    qd = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("fp"),
        max_abs("embedding").alias("scale"),
        quantize_int8("embedding").alias("q"),
    ).withColumn("deq", dequantize_int8("q", F.col("scale")))
    rows = qd.select(
        "vec_id",
        "scale",
        F.array_max(
            F.zip_with("fp", "deq", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("max_q"),
    ).collect()
    for r in rows:
        assert r.max_q <= 127
        assert r.max_err <= r.scale / 254 + 1e-12, (r.vec_id, r.max_err, r.scale)


def test_hll_partial_sketches_merge_losslessly(spark, sf_dir):
    """The property that makes HLL the scale path: sketching two halves
    and UNIONING the sketches estimates the same cardinality as
    sketching everything at once — so per-batch sketches stored at
    ingest time answer corpus-wide distinct queries without a rescan."""
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.operators.sketches import (
        distinct_sketch_by_group,
        distinct_union_estimate,
    )
    from delta_lake_platform_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    sk_parts = distinct_sketch_by_group(lo, "event_type", "user_id").unionByName(
        distinct_sketch_by_group(hi, "event_type", "user_id")
    )
    merged_est = distinct_union_estimate(sk_parts).first()["union_estimate"]
    whole_est = distinct_union_estimate(
        distinct_sketch_by_group(ev, "event_type", "user_id")
    ).first()["union_estimate"]
    exact = ev.agg(F.count_distinct("user_id")).first()[0]
    assert abs(merged_est - exact) <= 0.05 * exact
    # merging partials == sketching the whole (same registers)
    assert abs(merged_est - whole_est) <= 1e-9 * max(whole_est, 1)


def test_theta_set_algebra_accuracy(spark, sf_dir):
    """Theta intersection/difference estimates from two group sketches
    track the exact distinct-set algebra."""
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.operators.sketches import set_overlap_theta
    from delta_lake_platform_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    est = set_overlap_theta(ev, "event_type", "user_id", "click", "error").first()
    a = {r.user_id for r in ev.filter("event_type = 'click'").select("user_id").distinct().collect()}
    b = {r.user_id for r in ev.filter("event_type = 'error'").select("user_id").distinct().collect()}
    assert abs(est["est_a"] - len(a)) <= max(0.05 * len(a), 1)
    assert abs(est["est_intersection"] - len(a & b)) <= max(0.05 * len(a & b), 1)
    assert abs(est["est_a_minus_b"] - len(a - b)) <= max(0.05 * len(a - b), 1)


def test_theta_post_dedup_sketch_equals_raw_stream(spark, sf_dir):
    """The fused events_user_overlap_theta query sketches CONDITIONALLY
    over the per-user deduped frame; a Theta sketch depends only on the
    distinct support, so its estimates must equal the raw-stream
    operator's exactly (same hashes retained, not just within
    tolerance)."""
    from pyspark.sql import functions as F

    from delta_lake_platform_spark.operators.sketches import set_overlap_theta
    from delta_lake_platform_spark.queries.analytics_extra import (
        events_user_overlap_theta,
    )
    from delta_lake_platform_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    raw = set_overlap_theta(
        ev, "event_type", "user_id", "click", "purchase"
    ).first()
    per_user = (
        ev.filter(F.col("event_type").isin(["click", "purchase"]))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
    )
    fused = per_user.agg(
        F.theta_sketch_estimate(
            F.theta_intersection(
                F.theta_sketch_agg(F.when(F.col("a") == 1, F.col("user_id"))),
                F.theta_sketch_agg(F.when(F.col("b") == 1, F.col("user_id"))),
            )
        ).alias("inter"),
    ).first()
    assert fused["inter"] == raw["est_intersection"]
    # the registry query itself: one job, exact counts correct
    row = events_user_overlap_theta(spark, sf_dir).first()
    exact = (
        ev.filter("event_type = 'click'").select("user_id").distinct()
        .join(
            ev.filter("event_type = 'purchase'")
            .select("user_id").distinct(),
            "user_id",
        )
        .count()
    )
    assert row["n_overlap_exact"] == exact
    assert row["overlap_within_5pct"] and row["difference_within_5pct"]
