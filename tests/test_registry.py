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


R12_IMPL_CHANGED = [
    # round-12 plan (VERDICT r11 item 8): queries whose implementation
    # changed in round 12 (this optimization round) or in round 11 AFTER
    # the r11 window was fixed — each needs a CURRENT driver record so
    # that no green row predates the code it vouches for.
    # round-12 changes:
    "x_token_ids", "x_snapshot_scan", "x_catalog_scan", "x_ann_ivfpq",
    "x_perplexity_bucket", "st_perplexity", "x_containment",
    "x_dedup_incremental", "x_dedup_jaccard", "x_incr_agg", "x_cdc_apply",
    # round-11 rewrites without a post-change driver row:
    "x_gapfill", "x_interp_linear", "j_temporal_lookup", "x_retention",
    "x_span_dedup", "x_dedup_minhash", "x_tfidf", "x_bm25",
    "x_dedup_verified",
    # tokenizing queries riding the shared tokens_col rewrite (r11):
    "x_text_stats", "x_token_freq", "x_lang_id", "x_fingerprint",
    "x_token_bpe", "x_repetition", "x_length_trim", "x_quality_norm",
    "x_heavy_hitters", "x_length_batches", "x_token_budget",
    "x_bigram_logprob", "x_inverted_index", "x_dsir_select",
    "x_dsir_resample", "x_bpe_train", "x_bpe_encode", "x_pack_sequences",
]

# stalest driver records, ascending: the last-green-r8 tail + the head
# of the last-green-r9 block
R12_STALE = [
    "x_dedup_weights", "x_embed_stats", "x_split_hash", "x_topk_sim",
    "a_count", "a_rollup", "f_cast_coerce", "f_null_handling",
    "f_string_parse", "j_three_way", "p_project", "x_dedup_exact",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50
    registered queries; the round-12 rotation (registry.PRIORITY) must
    keep (a) every new/impl-changed query inside that window so it gets
    a current CORRECTNESS row and (b) the stalest-record queries.
    Everything displaced to 51+ holds a green driver row on code
    unchanged since it was recorded."""
    window = list(registry.ordered_queries())[:50]
    for name in R12_IMPL_CHANGED + R12_STALE:
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
