"""Query registry: every operator exposed to the driver contract.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; when
the semantics are ANSI-SQL-expressible an oracle SQL string (DuckDB
dialect-compatible) is registered alongside, and the driver hash-compares
the two at sf0.01. Column names/aliases MUST match between both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Priority order for the driver's 50-query grading window (the driver
# grades the FIRST 50 registered queries). Round-7 composition drains
# the 75-query attestation backlog (round-6 verdict "Next round #1"):
# every round-6 oracle query registered behind slot 50 and has NO
# driver row; 75 > 49 so the drain spans rounds 7 AND 8. This round's
# window: text_fingerprint (sat at slot 51 in round 6, last row r02) +
# the 34-query round-6 main batch (sorted) + the first 15 of the
# 41-query late batch in registration order — 50 exactly, with the two
# ML stats attestations (ml_fit_predict_stats /
# ml_fit_predict_classifier_stats) inside per the verdict. Everything
# already green in r06's window drops to sorted order behind.
# Audit with tools/check_window.py. Only oracle-checked queries belong
# here: a rows-only query can never produce a green row and would
# waste a slot.
# ROUND-8 QUEUE NOTE: the remaining 26 never-graded late-batch queries
# are listed explicitly after the window marker below (slots 51-76) —
# round 8's window = those 26 + the round-7 additions (registered at
# the tail in registration order: udaf_grouped_agg_trimmed_mean,
# scan_python_datasource_stream, sketch_rollup_daily_weekly,
# window_cume_dist_percent_rank, scalar_bitops_contract,
# audit_referential_integrity, embedding_dim_standardize,
# embedding_random_projection, sink_delete_cascade, + later round-7
# registrations) + the stalest
# r02/r03 rows (join_asof_*, window_rolling_median, agg_corr_regression
# were graded r06; the r02-batch scan/join/agg/window/setop/scalar rows
# were all re-attested r06, so the r03 queue — events_stream_stateful_
# user_stats onward — is next-stalest after the never-graded set).
_GRADE_FIRST = [
    # slot 51 of round 6 (last driver row r02 — stalest attested query)
    "text_fingerprint",
    # round-6 main batch (34, never driver-graded), sorted
    "agg_collated_group",
    "agg_entropy_by_source",
    "agg_histogram_fixed_bins",
    "agg_map_group_counts",
    "agg_string_concat_ordered",
    "agg_weighted_percentile",
    "audit_partition_skew",
    "corpus_gini_lengths",
    "corpus_kl_divergence_sources",
    "dedup_incremental_batch",
    "dedup_minhash_b128",
    "dedup_simhash_bands",
    "doc_chunk_sentences",
    "embedding_power_iteration",
    "events_stream_stream_full_outer_join",
    "join_interval_overlap",
    "join_lateral_topk",
    "ml_fit_predict_classifier_stats",
    "ml_fit_predict_stats",
    "sample_neyman_allocation",
    "scalar_calendar_arithmetic",
    "scalar_url_extract",
    "scan_csv_multiline",
    "scan_version_diff_cdf",
    "scan_xml",
    "sink_vacuum_old_versions",
    "sink_zorder_cluster",
    "sort_nulls_ordering",
    "split_time_based",
    "stream_merge_upsert_incremental",
    "temporal_gap_fill_linear",
    "text_html_strip",
    "window_decay_time_weighted",
    "window_ewma",
    # round-6 late batch, first 15 in registration order (never graded)
    "join_bloom_prefilter",
    "agg_bitmap_distinct",
    "join_spatial_grid",
    "dedup_paragraph_exact",
    "dedup_url_canonical",
    "sample_poisson_bootstrap",
    "window_anomaly_mad",
    "scan_dpp_join",
    "scan_binary_files",
    "agg_countmin_heavy_hitters",
    "dedup_lsh_eval_pr",
    "agg_bitmap_set_ops",
    "sample_balanced_downsample",
    "events_markov_transitions",
    "events_rfm_segmentation",
    # --- past slot 50 from here: ROUND-8 QUEUE — the 26 remaining
    # never-driver-graded round-6 queries, registration order ---
    "corpus_span_corruption",
    "sample_negative_pairs",
    "agg_feature_hashing",
    "window_cusum_drift",
    "agg_bitmap_native_distinct",
    "agg_approx_top_k",
    "events_session_dynamic_gap",
    "events_stream_session_dynamic_gap",
    "agg_listagg_native",
    "scalar_try_arithmetic",
    "graph_bfs_hops",
    "corpus_pmi_facets",
    "text_perplexity_kneser_ney",
    "text_langid_confusion",
    "sink_catalog_table",
    "scan_parquet_bloom_lookup",
    "corpus_term_burstiness",
    "events_attribution_linear",
    "events_stream_stateful_cusum",
    "corpus_cooccurrence_ppmi",
    "events_backtest_naive_forecast",
    "scalar_intdiv_contract",
    "audit_benford_first_digit",
    "corpus_zipf_slope",
    "scan_csv_datefmt",
    "pipeline_quality_ensemble",
    # --- then the r03-attested queue (stalest green rows after the
    # never-graded set), oldest-first ---
    "events_stream_stateful_user_stats",
    "events_stream_dedup",
    "events_stream_static_join",
    "vector_unwrap",
    "unpivot_melt",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume_customer",
    "dedup_groups_connected",
    "multimodal_frame_sample",
    "text_repetition_stats",
    "doc_chunk_fixed",
    "contamination_check",
    "doc_pack_greedy",
    "corpus_vocab_topk",
    "embedding_centroids",
    "corpus_quality_filter",
    "outlier_robust_z",
    "corpus_bigram_topk",
    "text_unigram_logprob",
    "embedding_whitening_stats",
    "text_pii_mask",
]

# Rows-only queries (registered without an oracle by design — goldens /
# property tests carry their correctness): they can never produce a
# green driver row, so they always cede their window slots and close
# the registration order.
_CEDE_WINDOW = [
    "text_tokenize_tfidf",
    "dedup_simhash",
    "sim_search_brp_lsh",
    "multimodal_resize",
    "ml_fit_predict_regressor",
    "ml_fit_predict_classifier",
    "approx_distinct",
    "approx_distinct_mergeable",
]


def load_all() -> None:
    """Import every operator module so its @register calls run.

    Registration order feeds the driver's 50-query grading window:
    ``_GRADE_FIRST`` is an explicit priority queue (never-green fixes,
    then new round-5 queries, then oldest-attested greens — see the
    comment above the list); queries not named fall to module-import
    order (the round-4 greens, all freshly attested); ``_CEDE_WINDOW``
    (rows-only, ungradeable by design) closes the order.
    """
    global QUERIES, ORACLES
    import pyspark_xgboost_spark.operators.temporal  # noqa: F401
    import pyspark_xgboost_spark.operators.pipeline  # noqa: F401
    import pyspark_xgboost_spark.operators.sampling  # noqa: F401
    import pyspark_xgboost_spark.operators.python_udfs  # noqa: F401
    import pyspark_xgboost_spark.sources.formats  # noqa: F401
    import pyspark_xgboost_spark.streaming.windows  # noqa: F401
    import pyspark_xgboost_spark.streaming.stream  # noqa: F401
    import pyspark_xgboost_spark.operators.ml_queries  # noqa: F401
    import pyspark_xgboost_spark.operators.tpch  # noqa: F401
    import pyspark_xgboost_spark.operators.tpch_full  # noqa: F401
    import pyspark_xgboost_spark.operators.graph  # noqa: F401
    import pyspark_xgboost_spark.operators.multimodal  # noqa: F401
    import pyspark_xgboost_spark.operators.corpus  # noqa: F401
    import pyspark_xgboost_spark.operators.text  # noqa: F401
    import pyspark_xgboost_spark.operators.dedup  # noqa: F401
    import pyspark_xgboost_spark.operators.similarity  # noqa: F401
    import pyspark_xgboost_spark.operators.relational  # noqa: F401
    import pyspark_xgboost_spark.operators.sketches  # noqa: F401
    import pyspark_xgboost_spark.operators.spatial  # noqa: F401

    first = [n for n in _GRADE_FIRST if n in QUERIES]
    cede = [n for n in _CEDE_WINDOW if n in QUERIES]
    # sorted, NOT dict-insertion order: a test (or any caller) that
    # imports an operator module before the first load_all would
    # otherwise shift these queries' registration order — the grading
    # order must not depend on who imported what first
    rest = sorted(
        n for n in QUERIES if n not in _GRADE_FIRST and n not in _CEDE_WINDOW
    )
    order = first + rest + cede
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
