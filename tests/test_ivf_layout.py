"""IVF at rest: corpus written partitioned by centroid_id means a probe
is partition-pruned I/O — the layout half of the ANN scale path."""

from __future__ import annotations

import re
import shutil
import tempfile

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators.similarity import ivf_assign
from delta_lake_platform_spark.plans.introspect import explain_str
from delta_lake_platform_spark.sources.catalog import load_table


def test_ivf_partitioned_probe_prunes(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ivf_layout_")
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        assigned = ivf_assign(emb)
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{d}/corpus"
        )
        probe = spark.read.parquet(f"{d}/corpus").filter(
            F.col("centroid_id").isin(3, 7)
        )
        plan = explain_str(probe)
        m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
        assert m and "centroid_id" in m.group(1), plan
        # pruned read returns exactly the probed cells' rows
        expected = assigned.filter(F.col("centroid_id").isin(3, 7)).count()
        assert probe.count() == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
