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
