"""Import every query module so the registry is fully populated, then
fix the registration ORDER.

The driver's correctness gate verifies the first 50 registered queries,
so the first 50 must span every SURVEY §2 family and every LLM-pipeline
operator class — one representative each — rather than whatever import
order produced. Everything stays registered (bench and local oracle
tests run all of them); this only chooses which 50 carry the
driver-visible correctness signal.
"""

from . import tpch  # noqa: F401
from . import tpch_advanced  # noqa: F401
from . import tpch_remaining  # noqa: F401
from . import scd_queries  # noqa: F401
from . import pipeline  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import temporal_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import warehouse_extra  # noqa: F401
from . import analytics_extra  # noqa: F401
from . import window_extra  # noqa: F401
from . import curation_extra  # noqa: F401
from . import mv_queries  # noqa: F401
from . import identity_queries  # noqa: F401
from . import relational_extra  # noqa: F401
from . import sql_dml  # noqa: F401
from . import variant_queries  # noqa: F401
from . import selection_queries  # noqa: F401
from . import classify_queries  # noqa: F401

from .registry import ORACLE_SQL, QUERIES

# One representative per family in the first 50 (all SQL-oracled):
# TPC-H shapes (agg/join/window/anti/exists), events, SCD + identity,
# SQL DML, MV, streaming, temporal/as-of, DV + partitioned warehouse,
# sketches, grouped-UDF, text analysis, curation, dedup (exact/minhash/
# simhash/clusters/embedding-LSH), ANN (brute force + IVF + PQ recall),
# multimodal.
PRIORITY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    # §2.4 A1 count(distinct composite) — q5 rotated out (its multi-way
    # join + agg family stays covered by q3/q9/q21); q5 remains
    # locally oracle-swept like every tail query.
    # r9 fourth wave: distinct_order_status_priority rotated out for
    # customers_k_anonymity — the privacy family (suppress/mask/flag
    # enforcement is test-pinned) regains a driver row after PII
    # redaction left in r9's first wave, and the profile's first
    # aggregate IS a composite-distinct count (groups of
    # (mktsegment, nationkey) -> n_groups), so A1's shape keeps
    # driver signal; the DISTINCT row stays locally oracle-swept.
    "customers_k_anonymity",
    "q9_nation_profit",
    # q18 / q22 rotated out in r4 (their families stay covered: join+
    # group+having by q3/q9, anti-join + scalar agg by q21 and
    # customers_without_big_orders) to give the r3 sketch family
    # driver-visible verification (VERDICT r3 #7); both remain locally
    # oracle-swept like every tail query.
    # q21 rotated out in r9 (third wave) for events_variant_profile:
    # the semi-structured family regained a driver row on the Spark 4
    # open VARIANT type (parse_json / try_variant_get /
    # schema_of_variant) after events_json_props rotated out earlier
    # this round. Multi-way join + anti/exists shapes stay covered by
    # q3 / q9 / customers_without_big_orders; q21 remains locally
    # oracle-swept.
    "events_variant_profile",
    "events_distinct_users_hll",
    # events_user_overlap_theta rotated out in r7 (late) for
    # mv_stream_maintained_orders: the r7 per-commit streaming MV
    # maintenance (ChangeFeedStream per_commit -> refresh_from_changes,
    # exactly-once per commit window). The sketch family stays driver-
    # covered by events_distinct_users_hll / events_heavy_hitter_users;
    # theta remains locally oracle-swept.
    "mv_stream_maintained_orders",
    "topk_orders_per_customer",
    # latest_event_per_user rotated out in r9 (third wave) for
    # events_decayed_engagement (exponential time-decay aggregates —
    # a new family). The window-argmax machinery keeps its driver row
    # via topk_orders_per_customer (identical WindowGroupLimit plan,
    # k=3 vs k=1); latest_event_per_user stays locally oracle-swept.
    "events_decayed_engagement",
    # running_value_per_user rotated out in r4 (window-agg family stays
    # covered by topk_orders_per_customer / latest_event_per_user /
    # events_sessionize) for driver-visible verification of the r4
    # metadata-only schema evolution; still locally oracle-swept.
    "sql_schema_evolution",
    "customers_without_big_orders",
    "rollup_lineitem_status",
    # union_nation_region_names rotated out in r5 for
    # sql_merge_by_source_sync (the new MERGE ... WHEN NOT MATCHED BY
    # SOURCE clause family, Delta 2.3+); DISTINCT stays driver-covered
    # by distinct_order_status_priority and the set-ops family remains
    # locally oracle-swept.
    "sql_merge_by_source_sync",
    # sql_api_orders_by_nation rotated out in r7 for sql_column_defaults
    # (the r6 column-DEFAULT feature: DEFAULT coldefs in CREATE TABLE,
    # default-filled INSERT column lists, ALTER ... SET DEFAULT). The
    # SQL DDL+query family stays driver-covered by sql_schema_evolution
    # / sql_identity_accounts / sql_dml_pipeline; still locally swept.
    "sql_column_defaults",
    "scd_hybrid_two_batches",
    "scd_hybrid_two_batches_merge_mode",
    # scd_change_feed_day2 rotated out in r6 for cdc_per_commit_orders:
    # the round's new per-commit CDC feature (enableChangeDataFeed cdc
    # files on UPDATE/DELETE/MERGE, appends served from add actions,
    # _commit_version/_commit_timestamp metadata — debt item (d)). The
    # NET change-feed family stays covered by the MV refresh paths it
    # feeds and by the local oracle sweep.
    # r9 fourth wave: cdc_per_commit_orders rotated out for
    # events_stream_quarantine (data-quality expectations as a REAL
    # foreachBatch stream with idempotent-writer appends). Per-commit
    # CDC keeps a driver row inside mv_stream_maintained_orders, whose
    # maintenance stream IS a ChangeFeedStream(per_commit=True)
    # consumer; the plain CDC query stays locally oracle-swept.
    "events_stream_quarantine",
    "scd_time_travel_day1",
    "scd_surrogate_keys",
    # customer_dense_ids rotated out in r5 (dense-id assignment stays
    # driver-covered inside scd_surrogate_keys) for
    # sql_identity_accounts: the new GENERATED ALWAYS AS IDENTITY
    # table feature end to end (CREATE TABLE DDL, engine-assigned
    # appends, footer-stats high-water mark). Still locally swept.
    "sql_identity_accounts",
    "sql_dml_pipeline",
    # mv_incremental_orders_by_status rotated out in r9 for
    # mv_approx_distinct_orders (the r9 HLL-sketch MV: stored-sketch
    # APPROX COUNT DISTINCT maintenance, monotone insert folds +
    # dirty-group recompute on deletes/updates, lg_k=20 exact-regime
    # oracle). The plain-sum refresh() machinery it verified runs
    # inside the new row and mv_nullkey_orders_by_priority; still
    # locally oracle-swept.
    "mv_approx_distinct_orders",
    # events_hourly_by_type rotated out in r4 (computation driver-
    # verified through its streamed twin events_hourly_streamed).
    # mv_minmax_orders_by_status rotated out in r5 for its strict
    # superset mv_nullkey_orders_by_priority: the same min/max
    # dirty-group MV churn, but with a NULL-bearing grouping column —
    # driver-visible proof of the r5 null-safe merge fix (VERDICT r4
    # #1). Both rotated-out queries stay locally oracle-swept.
    "mv_nullkey_orders_by_priority",
    "events_hourly_streamed",
    "events_sessionize",
    # embeddings_neardup_lsh rotated out in r9 for
    # scd_stream_maintained_customers: streaming SCD2 maintenance
    # (streaming/cdf.py::scd_maintain_stream + scd_soft_close) was
    # pytest-only until now — the net change-feed window folding
    # version/in-place/soft-close paths through one stream. The
    # embedding-dedup family stays driver-covered by
    # embeddings_semantic_dedup and the bucketed-LSH machinery by
    # docs_minhash_neardup; neardup_lsh remains locally oracle-swept.
    "scd_stream_maintained_customers",
    "asof_prior_purchase",
    # range_clicks_before_error rotated out in r7 (late) for
    # sql_stats_minmax_orders: the r7 metadata-only aggregate path
    # (COUNT/MIN/MAX answered from log stats, in-query raiser proving
    # zero scans). Temporal stays driver-covered by asof_prior_purchase
    # / events_sessionize; the range join remains locally oracle-swept.
    "sql_stats_minmax_orders",
    # events_json_props rotated out in r9 (late) for orders_dfp_join
    # (this round's read-side dynamic file pruning: dim key domain +
    # bloom probes prune fact files before the join). JSON extraction
    # is a plain projection family, locally oracle-swept.
    "orders_dfp_join",
    # dv_delete_orders rotated out in r5 for its strict superset
    # dv_purge_roundtrip: the same scattered MOR delete, followed by
    # REORG TABLE APPLY (PURGE) — driver-visible proof that the purge
    # rewrites only DV-bearing files and clears the pointer without
    # changing content. Still locally oracle-swept.
    "dv_purge_roundtrip",
    # events_partitioned_by_type rotated out in r9 (late) for
    # mv_rewrite_orders (this round's transparent MV query rewrite —
    # scan-poisoned in-query, coarser grain + WHERE on a group col).
    # Hive-partition pruning stays driver-covered by
    # ann_ivf_persisted's PartitionFilters gate; still locally swept.
    "mv_rewrite_orders",
    # events_heavy_hitter_users rotated out in r9 (late) for
    # sql_analyze_stats_orders (ANALYZE TABLE + SHOW STATS, exact-NDV
    # mode fully oracled). The frequency-sketch family keeps
    # events_distinct_users_hll driver-visible; heavy hitters stays
    # locally oracle-swept.
    "sql_analyze_stats_orders",
    "events_value_mad_grouped_udf",
    # convert_in_place_orders rotated in in r5 (the new CONVERT family:
    # in-place parquet-dir cataloguing, then DV delete + append on the
    # converted files). docs_tfidf_keywords rotated out — text analysis
    # keeps four driver representatives (token stats, quality, lang-id,
    # PII) and tf-idf stays locally oracle-swept.
    "convert_in_place_orders",
    # docs_token_stats rotated out in r9 (third wave) for
    # docs_c4_clean (the C4 cleaning pipeline — line-level word
    # floors subsume the token-counting signal, plus the document
    # gates). Text analysis keeps four driver reps (c4, gopher,
    # line-dedup, rag-chunks); token stats stay locally oracle-swept
    # and inside docs_curation_pipeline.
    "docs_c4_clean",
    # docs_pii_redaction rotated out in r9 for events_value_quantiles
    # (exact group quantiles with the percentile_approx sketch as the
    # stated 100 TB path — driver-invisible since r7). Text analysis
    # keeps docs_token_stats / docs_lang_id / docs_rag_chunks; PII
    # stays locally oracle-swept and inside docs_curation_pipeline.
    "events_value_quantiles",
    # docs_quality_score rotated out in r7 for docs_rag_chunks (the r6
    # RAG chunking operator: pure-JVM sequence/explode/substr windowed
    # chunks with overlap). Text analysis keeps three driver reps
    # (token stats, lang-id, PII) and quality scoring stays exercised
    # inside docs_curation_pipeline; still locally swept.
    "docs_rag_chunks",
    # docs_lang_id rotated out in r9 for docs_gopher_quality (this
    # round's Gopher rule-set gate, Rae et al. 2021: per-rule signals
    # + flags + conjunctive keep in one JVM projection). Text analysis
    # keeps docs_token_stats / docs_rag_chunks driver-visible and
    # lang-id stays locally oracle-swept (its marker-scoring machinery
    # is also inside docs_perplexity_buckets' per-language NTILE).
    "docs_gopher_quality",
    # docs_train_split rotated out in r7 (late) for docs_line_dedup:
    # the r7 corpus line-level dedup (CCNet boilerplate removal over
    # 64-bit line hashes). Curation stays driver-covered by
    # docs_benchmark_contamination / docs_curation_pipeline (which
    # contains the split's hash-bucket machinery); train_split remains
    # locally oracle-swept.
    "docs_line_dedup",
    # docs_pack_sequences rotated out in r5 session 11 for
    # optimize_binpack_orders (the new size-aware OPTIMIZE: log-driven
    # small-file candidate selection, file-level bin-pack commit, DV
    # materialization — metrics hard-pinned in-query). Curation keeps
    # three driver representatives (train_split, contamination,
    # curation_pipeline — the last one CONTAINS sequence packing);
    # pack_sequences stays locally oracle-swept and benched.
    "optimize_binpack_orders",
    "docs_benchmark_contamination",
    "docs_curation_pipeline",
    # docs_exact_dedup rotated out in r9 for docs_span_dedup (this
    # round's new operator: fixed-k token-window duplicate-span
    # removal, the Spark-first form of Lee et al. 2022 substring
    # dedup). Exact dedup's fingerprint-canonicalization machinery
    # stays driver-covered inside docs_curation_pipeline; still
    # locally oracle-swept.
    "docs_span_dedup",
    # docs_minhash_neardup rotated out in r9 for docs_fuzzy_edit_neardup
    # (this round's relative-edit-distance similarity join): the fuzzy
    # query CONTAINS the MinHash banding + hot-bucket guard as its
    # candidate stage and adds the Levenshtein verifier on top, so the
    # driver signal strictly widens; minhash_neardup stays locally
    # oracle-swept.
    "docs_fuzzy_edit_neardup",
    # docs_simhash_identical_pairs rotated out in r7 for
    # embeddings_semantic_dedup (the r6 SemDeDup operator: k-means
    # clustering + per-cluster cosine pruning). The bucketed-candidate
    # machinery SimHash rides on stays driver-covered by
    # docs_minhash_neardup / embeddings_neardup_lsh; still locally
    # swept.
    "embeddings_semantic_dedup",
    "docs_dedup_clusters",
    # ann_cosine_topk rotated out in r9 for events_ohlc_hourly (the
    # one-exchange OHLC bars operator, plan-gated in test_plans.py —
    # driver-invisible since r7). ANN stays driver-covered by
    # ann_ivf_recall / ann_pq_recall, whose probe phases contain the
    # brute-force scoring kernel; cosine_topk remains locally swept.
    "events_ohlc_hourly",
    # ann_ivf_recall rotated out in r9 for ann_ivf_persisted (the r9
    # build-once/probe-many IVF index: centroid-partitioned
    # ManagedTable + sidecar centroids, partition-pruned probes). The
    # persisted row exercises the same assignment/probe/scoring
    # machinery with the same provable planted-copy oracle; the
    # recall-vs-brute-force kernel stays driver-covered by
    # ann_pq_recall, and ivf_recall remains locally oracle-swept.
    "ann_ivf_persisted",
    "ann_pq_recall",
    "media_metadata",
]


def _reorder() -> None:
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    no_oracle = [n for n in PRIORITY if n not in ORACLE_SQL]
    if no_oracle:
        raise RuntimeError(f"PRIORITY queries must be SQL-oracled: {no_oracle}")
    ordered = PRIORITY + [n for n in QUERIES if n not in set(PRIORITY)]
    for reg in (QUERIES, ORACLE_SQL):
        tail = {n: reg[n] for n in ordered if n in reg}
        reg.clear()
        reg.update(tail)


_reorder()
