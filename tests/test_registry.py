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


ROTATED_IN_R4 = [
    # waves A+B of the round-4 plan (VERDICT r3 item 1): the 28
    # oracle-exact + 3 rows-only queries that had never received a driver
    # CORRECTNESS row, plus the round-4-new x_dedup_verified
    "x_bm25", "x_mad_outlier", "x_cooccur_pmi", "x_bigram_logprob",
    "x_funnel", "x_retention", "x_histogram", "x_rolling_zscore",
    "x_domain_mix", "x_scd2_history", "x_sessionize", "x_incr_agg",
    "x_stratified", "x_token_budget",
    "x_source_cap", "x_span_dedup", "x_table_diff", "x_exact_quantiles",
    "x_scrub", "st_topk_trend", "j_temporal_lookup", "x_inverted_index",
    "x_cdc_apply", "x_profile_stats", "x_token_ids", "x_quality_norm",
    "a_geomean_udaf", "x_transition_matrix",
    "x_semdedup", "x_pagerank", "x_dedup_eval",
    "x_dedup_verified", "x_sentences",
    "x_retrieval_metrics", "x_corr_matrix", "x_hard_negatives",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50 registered
    queries; the round-4 rotation (registry.PRIORITY) must keep (a) every
    never-driver-checked query inside that window so it finally gets a
    CORRECTNESS row, and (b) at least one in-window category holder for
    every family whose other members rotated out (all of which hold green
    r1-r3 rows)."""
    window = list(registry.ordered_queries())[:50]
    for name in ROTATED_IN_R4:
        assert name in window, f"{name} fell outside the driver's 50-query window"
    for name in [
        # retained category holders (single-green; rotated-out names all
        # hold 2+ green rows or a fresh r3 row)
        "w_running", "w_rownum_page", "st_tumbling", "st_session",
        "f_from_json", "f_json_extract", "j_json_filter", "j_asof",
        "f_array_ops", "a_count_distinct", "a_group_summary",
        "x_dedup_jaccard", "x_dedup_incremental", "x_dedup_cluster",
    ]:
        assert name in window, f"{name} fell outside the driver's 50-query window"


def test_rotation_window_is_exactly_full():
    """All 50 driver slots are spent — an off-by-one in PRIORITY would
    silently drop the last rotated-in query out of the window."""
    ordered = list(registry.ordered_queries())
    assert len(ordered) >= 50
    # no name listed in PRIORITY is missing from the registry (a typo in
    # the rotation would silently shrink the window)
    missing = [n for n in registry.PRIORITY if n not in registry.QUERIES]
    assert missing == [], f"PRIORITY names not registered: {missing}"
