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


R9_IMPL_CHANGED = [
    # round-9 plan (VERDICT r8 item 8): new/changed queries whose last
    # record would otherwise predate current code
    "x_snapshot_scan",      # NEW: snapshot_read under the oracle (task 3)
    "x_perplexity_bucket",  # one-pass ntile3 fold (task 7)
    "st_perplexity",        # materialization cut (task 6)
    "x_triangles",          # sf10 wedge-spill bound (task 5)
    "x_dedup_incremental",  # bench-drift reconciliation (task 4)
    "x_dedup_minhash",      # bench-drift reconciliation (task 4)
]

# stalest driver records, ascending: the r3-era rows (r1/r2-window
# members unchecked by the driver since), the full r5 cohort, and the
# five r6 names the r8 verdict called out
R9_STALE = [
    "a_count", "a_rollup", "f_cast_coerce", "f_null_handling",
    "f_string_parse", "j_three_way", "p_project", "x_dedup_exact",
    "a_count_distinct", "a_geomean_udaf", "a_group_summary",
    "f_array_ops", "f_from_json", "f_json_extract", "j_asof",
    "j_json_filter", "j_temporal_lookup", "st_session", "st_topk_trend",
    "st_tumbling", "w_rownum_page", "w_running", "x_bigram_logprob",
    "x_cdc_apply", "x_corr_matrix", "x_domain_mix", "x_exact_quantiles",
    "x_incr_agg", "x_profile_stats", "x_scd2_history", "x_scrub",
    "x_sentences", "x_sessionize", "x_source_cap", "x_span_dedup",
    "x_stratified", "x_table_diff", "x_token_budget",
    "x_transition_matrix",
    "x_ann_ivf", "x_pack_sequences", "x_semdedup", "x_bpe_train",
    "x_bpe_encode",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50
    registered queries; the round-9 rotation (registry.PRIORITY) must
    keep (a) every new/impl-changed query inside that window so it gets
    a current CORRECTNESS row and (b) the stalest-record queries.
    Everything displaced to 51+ holds a green driver row on code
    unchanged since it was recorded."""
    window = list(registry.ordered_queries())[:50]
    for name in R9_IMPL_CHANGED + R9_STALE:
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
