"""Driver-contract invariants that must never silently regress.

The driver verifies exactly the FIRST 50 registered queries, so the
curated order in queries/all.py::PRIORITY is a load-bearing artifact:
every operator family's correctness signal rides on it.
"""

from __future__ import annotations

import delta_lake_platform_spark.queries.all as A
from delta_lake_platform_spark.queries.registry import ORACLE_SQL, QUERIES


def test_priority_is_the_first_50():
    assert len(A.PRIORITY) == 50
    assert list(QUERIES)[:50] == A.PRIORITY


def test_first_50_all_sql_oracled():
    missing = [n for n in list(QUERIES)[:50] if n not in ORACLE_SQL]
    assert not missing, f"first-50 without oracle: {missing}"


def test_family_representation_in_first_50():
    first = set(list(QUERIES)[:50])
    required = {
        "scd": "scd_hybrid_two_batches",
        "identity": "scd_surrogate_keys",
        "sql-dml": "sql_dml_pipeline",
        # r5: MERGE's NOT MATCHED BY SOURCE clause family (Delta 2.3+)
        "merge-by-source": "sql_merge_by_source_sync",
        # r9: the HLL MV row took the plain-sum slot (which it strictly
        # contains); nullkey keeps the min/max + NULL-key coverage.
        "mv": "mv_nullkey_orders_by_priority",
        # r5: the min/max family representative is the NULL-group-key
        # variant (strict superset of mv_minmax_orders_by_status).
        "mv-minmax": "mv_nullkey_orders_by_priority",
        "schema-evolution": "sql_schema_evolution",
        # the hourly-agg computation's driver signal rides on its
        # streamed twin (same oracle) since the r4 rotation
        "streaming-real": "events_hourly_streamed",
        "temporal-asof": "asof_prior_purchase",
        # r5: the DV family representative is the purge roundtrip
        # (strict superset of dv_delete_orders: same scattered MOR
        # delete, plus REORG PURGE clearing the vector).
        "deletion-vectors": "dv_purge_roundtrip",
        "identity-table": "sql_identity_accounts",
        # r5: CONVERT (in-place parquet-dir cataloguing) joins as its
        # own storage family; tf-idf rotated out (text keeps 4 reps).
        "convert": "convert_in_place_orders",
        # r9 late: partition pruning rides ann_ivf_persisted's
        # PartitionFilters gate; the slot went to the MV query rewrite.
        "partitioned": "ann_ivf_persisted",
        "mv-rewrite": "mv_rewrite_orders",
        # r9 late: heavy hitters ceded its row to ANALYZE stats; the
        # sketch family keeps the HLL row below.
        "sketches": "events_distinct_users_hll",
        "analyze-stats": "sql_analyze_stats_orders",
        "dfp-join": "orders_dfp_join",
        "grouped-udf": "events_value_mad_grouped_udf",
        # r9 third wave: C4 cleaning takes the text-analysis slot
        # (line word floors subsume token counting; token stats stay
        # locally swept and inside docs_curation_pipeline).
        "text": "docs_c4_clean",
        "c4-cleaning": "docs_c4_clean",
        # r9 third wave: the semi-structured family rides the Spark 4
        # VARIANT query; exponential time-decay is a new family.
        "semi-structured": "events_variant_profile",
        "decayed-agg": "events_decayed_engagement",
        # r9 fourth wave: privacy regains a driver row (k-anonymity
        # profile; enforcement modes are test-pinned) and the
        # expectations gate rides its streaming-quarantine composition
        # (real foreachBatch stream + idempotent-writer appends).
        "privacy": "customers_k_anonymity",
        "data-quality": "events_stream_quarantine",
        # r5 s11: curation's driver signal rides on train_split +
        # contamination + curation_pipeline (the pipeline CONTAINS
        # sequence packing); docs_pack_sequences rotated out for the
        # size-aware OPTIMIZE family below.
        "curation": "docs_curation_pipeline",
        "optimize-binpack": "optimize_binpack_orders",
        "contamination": "docs_benchmark_contamination",
        # r9: span-level dedup (Lee et al. window form) replaces the
        # exact-dedup row, whose canonicalization machinery runs
        # inside docs_curation_pipeline's driver row.
        "dedup-spans": "docs_span_dedup",
        # r9 late rotation: the fuzzy edit-distance join CONTAINS the
        # MinHash banding + hot-bucket guard as its candidate stage and
        # adds Levenshtein verification — strictly wider driver signal;
        # the Gopher rule-set gate replaces lang-id as a text-analysis
        # driver row (lang-id stays locally swept).
        "dedup-minhash-fuzzy": "docs_fuzzy_edit_neardup",
        "gopher-gate": "docs_gopher_quality",
        "dedup-clusters": "docs_dedup_clusters",
        # r7: the three round-6 headline operators join the driver-50
        # (VERDICT r6 next-round #1) — SemDeDup semantic dedup, RAG
        # chunking, and column DEFAULTs.
        "dedup-semantic": "embeddings_semantic_dedup",
        "rag-chunking": "docs_rag_chunks",
        "column-defaults": "sql_column_defaults",
        # r7 late rotation: this round's own headliners get driver
        # rows immediately rather than waiting a round.
        "mv-streaming": "mv_stream_maintained_orders",
        "mv-approx-distinct": "mv_approx_distinct_orders",
        "metadata-aggregates": "sql_stats_minmax_orders",
        "line-dedup": "docs_line_dedup",
        # r9 rotation: streaming SCD2 maintenance, OHLC bars, and group
        # quantiles join the driver-50 (VERDICT r8 #5). The brute-force
        # ANN row rotated out — its scoring kernel runs inside the IVF/
        # PQ probe phases, which keep driver rows.
        "scd-streaming": "scd_stream_maintained_customers",
        "ohlc": "events_ohlc_hourly",
        "group-quantiles": "events_value_quantiles",
        "ann-ivf": "ann_ivf_persisted",
        "ann-pq": "ann_pq_recall",
        "multimodal": "media_metadata",
    }
    absent = {fam: q for fam, q in required.items() if q not in first}
    assert not absent, f"families missing from the driver's first 50: {absent}"


def test_entry_module_exposes_rotation_window():
    """r10 rotation contract (replaces the pre-rotation first-50 ==
    PRIORITY pin): queries() is a window over the registry that puts
    every never-driver-green query FIRST (in registry order), then the
    stalest-green fill, width max(50, #never-green) — so every registry
    query gets a driver correctness row within two rounds."""
    import json
    import os

    import __spark_entry__ as E
    from delta_lake_platform_spark.queries.registry import QUERIES

    qs = E.queries()
    osql = E.oracle_sql()
    assert set(qs) <= set(QUERIES)
    assert set(osql) <= set(qs)
    # every oracle references a registered query and is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())

    # recompute never-green from the same history the rotation reads
    import glob

    root = os.path.dirname(os.path.abspath(E.__file__))
    green: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if isinstance(row, dict) and row.get("rows_match") and row.get("hash_match"):
                    green.add(name)
    never = [n for n in QUERIES if n not in green]
    assert len(qs) == max(50, len(never))
    # never-green queries lead the window, in registry order
    assert list(qs)[: len(never)] == never
