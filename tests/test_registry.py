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


def test_category_coverage_inside_driver_window():
    """The driver's correctness harness checks only the FIRST ~50 registered
    queries; every SURVEY §2 row without an in-window sibling must sit
    inside that window (round-1 lesson: tail-registered queries get no
    correctness row)."""
    window = list(registry.ordered_queries())[:50]
    for name in [
        # one per streaming/window/sort category (round-1's unchecked tail)
        "st_tumbling", "st_sliding", "st_session", "st_anomaly",
        "w_running", "w_rownum_page", "w_topk_group",
        "o_topk", "o_natural_sort",
        # round-2 rows with no sibling coverage
        "x_dedup_incremental", "x_chunk_docs", "x_decontaminate",
        "x_quality_filter", "x_repetition", "x_dedup_cluster",
        "f_from_json", "x_split_hash",
    ]:
        assert name in window, f"{name} fell outside the driver's 50-query window"
