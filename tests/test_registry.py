"""Registry integrity: every query plans (analysis passes) and every oracle
has a registered query. Full value-level checking against DuckDB runs in
tools/selfcheck.py (and the driver's own gate); here we only verify each
plan analyzes, which catches schema/column regressions in seconds."""

import pytest

from imagingdb_spark import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    assert set(registry.ORACLE) <= set(registry.QUERIES)


def test_expected_coverage():
    # SURVEY.md §2 headline coverage — one name per operator family
    for name in [
        "f_substring", "f_daterange", "f_equality", "f_inlist",
        "f_json_extract", "p_project", "f_not_exists",
        "j_three_way", "j_two_way", "j_self_parent", "j_json_filter",
        "j_outer_count", "j_semi", "j_range",
        "a_count", "a_distinct", "a_count_distinct", "a_group_summary",
        "a_sum_avg", "a_rollup", "a_cube", "a_pivot",
        "w_dense_rank", "w_running", "w_lag_lead", "w_topk_group",
        "o_sort", "o_limit", "o_topk", "o_natural_sort",
        "s_union", "s_except", "s_intersect",
        "f_string_parse", "f_format", "f_dates", "f_sha2", "f_validate_id",
        "st_tumbling", "st_sliding", "st_session",
        "x_dedup_exact", "x_dedup_jaccard", "x_dedup_minhash",
        "x_dedup_simhash", "x_topk_sim", "x_ann_lsh", "x_embed_stats",
        "x_text_stats", "x_token_freq", "x_lang_id", "x_fingerprint",
    ]:
        assert name in registry.QUERIES, f"missing query {name}"


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_plans(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.schema is not None and len(df.columns) > 0


R10_IMPL_CHANGED = [
    # round-10 plan (VERDICT r9 item 6): queries whose implementation
    # changed this round and so need a CURRENT driver record
    "x_snapshot_scan",  # five legs now: DV delete + UPDATE under the oracle
    "x_triangles",      # exact dst-side wedge-volume measurement (ADVICE)
]

# stalest driver records, ascending: the full last-green-r6 block the
# r9 verdict named (25 queries, then at positions 51-75) plus the first
# 23 of the last-green-r7 block
R10_STALE = [
    "a_sum_avg", "f_not_exists", "j_outer_count", "o_topk",
    "w_dense_rank", "w_range_frame", "x_ann_eval", "x_bm25",
    "x_cooccur_pmi", "x_funnel", "x_histogram", "x_interp_linear",
    "x_inverted_index", "x_length_batches", "x_novelty",
    "x_pipeline_audit", "x_quality_norm", "x_retention",
    "x_retrieval_batch", "x_retrieval_metrics", "x_rolling_zscore",
    "x_semdedup_eval", "x_shard_shuffle", "x_tfidf", "x_token_ids",
    "a_approx_sketch", "j_range", "j_semi", "o_natural_sort", "o_sort",
    "s_except", "st_anomaly", "st_distinct_hll", "st_join", "w_lag_lead",
    "x_ann_pq", "x_audio_dedup", "x_dsir_resample", "x_dsir_select",
    "x_embed_pca", "x_embed_quantize", "x_fuzzy_join", "x_gapfill",
    "x_hard_negatives", "x_heavy_hitters", "x_lang_id", "x_length_trim",
    "x_mad_outlier",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50
    registered queries; the round-10 rotation (registry.PRIORITY) must
    keep (a) every impl-changed query inside that window so it gets a
    current CORRECTNESS row and (b) the stalest-record queries.
    Everything displaced to 51+ holds a green driver row on code
    unchanged since it was recorded."""
    window = list(registry.ordered_queries())[:50]
    for name in R10_IMPL_CHANGED + R10_STALE:
        assert name in window, f"{name} fell outside the driver's 50-query window"
    assert len(window) == len(set(window)) == 50


def test_rotation_window_is_exactly_full():
    """All 50 driver slots are spent — an off-by-one in PRIORITY would
    silently drop the last rotated-in query out of the window."""
    ordered = list(registry.ordered_queries())
    assert len(ordered) >= 50
    # no name listed in PRIORITY is missing from the registry (a typo in
    # the rotation would silently shrink the window)
    missing = [n for n in registry.PRIORITY if n not in registry.QUERIES]
    assert missing == [], f"PRIORITY names not registered: {missing}"
