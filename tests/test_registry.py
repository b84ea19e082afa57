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


ROTATED_IN_R8 = [
    # round-8 plan (VERDICT r7 item 2): queries whose implementations
    # changed this round (their last green rows predate current code)
    "x_perplexity_bucket",  # ntile window -> bounded-histogram cutoffs
    "x_containment",      # single-eval verify restructure
    "x_triangles",        # unpersist barrier
    "x_dedup_jaccard",    # shared _jaccard_verified tail
    "x_dedup_incremental",  # verify tail, both match paths
    "x_dedup_verified",   # verify tail
    "x_dedup_minhash",    # verify tail + shingle repartition guard
    "x_dedup_eval",       # consumes minhash + jaccard_ge truth
    "x_dedup_simhash",    # shingle repartition guard
    "x_decontaminate",    # rides verified_pairs
    "x_dedup_cluster",    # consumes jaccard pairs
    "x_dedup_compact",
    "x_dedup_retain",
    "x_dedup_weights",
]

# r7-new single-record queries held in-window for double-verification
HELD_R7_SINGLES = [
    "st_perplexity", "st_heavy_hitters", "st_quantiles",
    "st_theta_overlap", "x_ann_ivfpq",
]

# stalest records: the r1+r2 doubles (one per operator family — the
# family holders) plus r1+r2 / r2+r3-era rows unchecked since round 3
STALE_HOLDERS = [
    "f_dates", "f_format", "j_two_way", "a_distinct", "w_topk_group",
    "st_sliding", "o_limit", "f_equality", "s_union",
    "f_sha2", "f_validate_id", "j_self_parent", "x_ann_lsh",
    "x_token_freq", "x_token_bpe", "x_fingerprint", "s_intersect",
    "f_json_multi", "f_path_ops", "a_cube", "a_pivot", "x_embed_stats",
    "x_text_stats", "x_split_hash", "x_dedup_embed", "x_topk_sim",
    "x_chunk_docs", "x_repetition", "f_substring", "f_daterange",
    "f_inlist",
]


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50 registered
    queries; the round-8 rotation (registry.PRIORITY) must keep (a) every
    impl-changed query inside that window so it gets a current CORRECTNESS
    row, (b) the r7-new single-record queries for double-verification, and
    (c) the stalest-record queries incl. one holder per operator family.
    Everything displaced to 51+ holds a fresh r7 green row on unchanged
    code."""
    window = list(registry.ordered_queries())[:50]
    for name in ROTATED_IN_R8 + HELD_R7_SINGLES + STALE_HOLDERS:
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
