"""delta_lake_platform_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``prateekmshra/delta_lake_platform`` (reference: a hybrid SCD1+SCD2
ingestion engine over Delta Lake — see
/root/reference/delta_hybrid_scd/scd_handler.py), re-expressed
Spark-first on OSS PySpark, plus the relational / dedup / similarity /
text / streaming operator surface a large-scale (100 TB design point)
training-data platform needs.

Layout:
- ``session``    — SparkSession factory tuned for AQE + Arrow.
- ``sources``    — parquet star-schema catalog + a versioned,
                   merge-capable parquet table (Delta-like semantics on
                   plain parquet; delta-spark is not available here).
- ``scd``        — the reference's SCD1+SCD2 hybrid engine, re-derived.
- ``operators``  — relational helpers, dedup family, similarity search,
                   text analysis, multimodal plumbing.
- ``functions``  — column-expression helpers (hashing, vectors, text).
- ``queries``    — named analytic queries over the test star schema.
- ``streaming``  — Structured Streaming surface (windowed aggs,
                   dedup-in-watermark, streaming SCD via foreachBatch).
- ``plans``      — plan introspection / optimization assertions.
"""

__version__ = "0.1.0"
