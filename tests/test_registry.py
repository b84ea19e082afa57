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


R11_IMPL_CHANGED = [
    # round-11 plan (VERDICT r10 item 5): queries new or whose
    # implementation changed this round and so need a CURRENT record
    "x_catalog_scan",   # new: atomic catalog reads under the oracle
    "x_snapshot_scan",  # six legs now: file-pruned MERGE under the oracle
    # merge-family doubles the verdict named (snapshot_merge's execution
    # strategy changed; these share the merge semantics)
    "x_merge_upsert", "x_scd2_history", "x_cdc_apply",
]

# stalest driver records, ascending: the last-green-r7 tail (10 names)
# plus the first 35 of the last-green-r8 block
R11_STALE = [
    "x_pagerank", "x_phash_dedup", "x_pq_quantize", "x_quality_filter",
    "x_rebalance", "x_sample_weighted", "x_scene_changes",
    "x_split_leakage", "x_substring_dedup", "x_unigram_logprob",
    "a_cube", "a_distinct", "a_pivot", "f_daterange", "f_dates",
    "f_equality", "f_format", "f_inlist", "f_json_multi", "f_path_ops",
    "f_sha2", "f_substring", "f_validate_id", "j_self_parent",
    "j_two_way", "o_limit", "s_intersect", "s_union", "st_heavy_hitters",
    "st_quantiles", "st_sliding", "st_theta_overlap", "w_topk_group",
    "x_ann_ivfpq", "x_ann_lsh", "x_chunk_docs", "x_containment",
    "x_decontaminate", "x_dedup_cluster", "x_dedup_compact",
    "x_dedup_embed", "x_dedup_eval", "x_dedup_jaccard", "x_dedup_retain",
    "x_dedup_simhash",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50
    registered queries; the round-11 rotation (registry.PRIORITY) must
    keep (a) every new/impl-changed query inside that window so it gets
    a current CORRECTNESS row and (b) the stalest-record queries.
    Everything displaced to 51+ holds a green driver row on code
    unchanged since it was recorded."""
    window = list(registry.ordered_queries())[:50]
    for name in R11_IMPL_CHANGED + R11_STALE:
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
