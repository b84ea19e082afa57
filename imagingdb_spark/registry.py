"""Named-query registry.

Every operator from SURVEY.md §2 registers itself here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL twin with IDENTICAL output column names — the driver hashes values after
sorting columns by name, so Spark aliases and SQL ``AS`` names must agree.

Determinism contract for every registered query:
- no LIMIT without a total order (unique tiebreaker column in the ORDER BY),
- float aggregates rounded to 4 decimals on BOTH sides (summation order
  differs between engines),
- integer sums cast to BIGINT in DuckDB (its sum() widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# The driver's correctness harness checks the FIRST ~50 registered queries
# (CORRECTNESS_r01/r02 each recorded exactly 50). Registration therefore
# follows this explicit priority order, not module import order.
#
# Round-3 rotation (VERDICT r2 item 1, applied): the 16 queries that had
# never received a driver CORRECTNESS row (w_dense_rank, w_lag_lead,
# w_range_frame, x_sample_weighted, x_ann_ivf, a_approx_sketch,
# x_pack_sequences, x_dedup_compact, x_shard_shuffle, st_join,
# x_unigram_logprob, x_length_trim, x_gapfill, x_fuzzy_join, x_tfidf,
# x_merge_upsert) rotate INTO the window; 16 rows that are double-verified
# (green driver rows in r1 AND/OR r2, with in-window category siblings)
# rotate to the tail: w_topk_group, st_sliding, st_anomaly, o_natural_sort,
# o_limit, f_equality, f_not_exists, f_dates, f_format, f_sha2,
# f_validate_id, j_two_way, j_self_parent, a_distinct, s_union,
# x_quality_filter. Tail queries keep their implementations + unit tests
# and their recorded green rows from prior rounds; they only lose a FRESH
# driver row this round.
#
# Round-4 rotation (VERDICT r3 item 1, applied): CORRECTNESS_r03 recorded
# green rows for all 16 round-3 rotated-in queries, so waves A+B of the
# round-4 plan rotate in TOGETHER (28 oracle-exact + 3 rows-only clean-run
# slots = the 31 queries that have never held a driver row), plus the new
# x_dedup_verified (round 4, oracle-exact). 18 single-green category
# holders stay in-window; everything with 2+ green rows (or a fresh r3
# row) rotates to the tail. Tail queries keep their implementations, unit
# tests, and recorded green rows — they only lose a FRESH driver row.
#
# Round-5 rotation (VERDICT r4 items 1+2, applied; see git history for the
# full plan): CORRECTNESS_r05 came back 50/50 green (42 oracle-exact, 8
# rows-only clean), so every rotated-in query now holds a current record.
#
# Round-6 rotation (VERDICT r5 items 1/2/5, applied; see git history for
# the full plan): 19 new/changed queries in, the r5/r4/r3/r1 singles held
# for double-verification, x_hard_negatives_ann retired.
#
# Round-7 rotation (VERDICT r6 item 3, applied):
# - IN, no driver record: st_heavy_hitters, st_quantiles (the two new
#   continuous-monitoring twins), x_ann_ivfpq (the IVFxPQ composition).
# - IN, implementation changed this round: x_phash_dedup + x_audio_dedup
#   (groups frame persist -> eager localCheckpoint, ADVICE r6) and
#   x_heavy_hitters (_mg_sketch_partitions now emits counters for the
#   streaming fold).
# - IN for double-verification, the single-green-r6 rows: the 15 queries
#   NEW in round 6 plus x_embed_quantize / x_dedup_verified /
#   x_hard_negatives (whose pre-r6 greens predate their r6 impls).
# - IN, oldest/weakest records: the 19 queries whose ONLY green row is a
#   single r1-r5 run (x_gapfill .. st_anomaly below), x_merge_upsert as
#   the S10 family holder, and 8 r1+r2 doubles not re-checked since
#   round 2 (w_topk_group .. a_distinct). Window arithmetic: 4 new + 3
#   r7-impl-changed + 15 r6 singles + 19 weakest + 1 holder + 8 doubles
#   = 50; s_union was displaced to position 51 by st_theta_overlap
#   (s_except holds the set-ops family in-window).
# - OUT to the tail: everything that got its second+ green row in r6 on
#   unchanged code (the r5/r4/r3 double-verification blocks of the r6
#   window). Tail queries keep implementations, unit tests, and recorded
#   green rows - they only lose a FRESH driver row this round.
# Round-7 SECOND-SESSION amendment: three new queries with no driver
# record (x_perplexity_bucket, x_triangles, x_containment) enter at the
# head of the window; the jaccard_ge sweep (exact integer thresholds
# replacing rounded-value filters — a latent candidate/filter mismatch
# class) changed the implementation AND shared oracle text of the
# jaccard dedup family, so its four oracle-exact members not already
# in-window (x_dedup_jaccard, x_dedup_incremental, x_dedup_cluster,
# x_dedup_compact) also enter. Displaced to 51+: seven r1+r2 doubles
# (f_format, j_two_way, a_distinct, w_topk_group, st_sliding, o_limit,
# f_equality — each holding two green rows on unchanged code). The
# sweep's rows-only members (x_dedup_minhash, x_dedup_eval, x_pagerank)
# stay at 51+: a rows-only driver row is the weakest check, and their
# determinism/parity coverage lives in selfcheck + unit tests.
# Round-8 rotation (VERDICT r7 item 2, applied):
# - IN, implementation changed in round 8: x_perplexity_bucket (ntile
#   window -> bounded-histogram broadcast cutoffs), the 11 queries on the
#   shared single-evaluation verify tail / shingle repartition guard
#   (x_dedup_jaccard/incremental/verified/minhash/eval/simhash,
#   x_decontaminate, x_dedup_cluster/compact/retain/weights), and
#   x_triangles/x_containment (unpersist barrier / restructured filter).
# - IN for double-verification: the r7-new single-record queries
#   (st_perplexity, st_heavy_hitters, st_quantiles, st_theta_overlap,
#   x_ann_ivfpq).
# - IN, stalest records + family holders: the nine r1+r2 doubles
#   displaced in r7 (f_dates .. s_union — each family's oldest member)
#   and 22 further r1+r2 / r2+r3-era rows not re-checked since round 3.
# - OUT to 51+: every r7-window member whose code is unchanged since its
#   fresh r7 green (x_phash_dedup .. x_merge_upsert).
PRIORITY: list[str] = [
    # --- round-8 window (first 50): r8-impl-changed + r7-new
    #     double-verification + the stalest-record family holders ---
    "x_perplexity_bucket",  # D24: r8 REWRITE (bounded-histogram cutoffs, zero windows)
    "x_containment",  # D2i: r8 single-eval verify tail + r7-new double-verify
    "x_triangles",  # D25: r8 unpersist barrier + r7-new double-verify
    "st_perplexity",  # St18: r7-new, single driver record
    "x_dedup_jaccard",  # D2a: r8 _jaccard_verified tail
    "x_dedup_incremental",  # D13: r8 verify tail, both match paths
    "x_dedup_verified",  # D2b+: r8 verify tail
    "x_dedup_minhash",  # D2 rows-only: r8 verify tail + shingle repartition guard
    "x_dedup_eval",  # D2 rows-only: consumes minhash + jaccard_ge truth
    "x_dedup_simhash",  # D2c rows-only: shingle repartition guard
    "x_decontaminate",  # D20: rides verified_pairs (r8 verify tail)
    "x_dedup_cluster",  # D12: consumes jaccard pairs
    "x_dedup_compact",  # D12b: same
    "x_dedup_retain",  # D12d: same
    "x_dedup_weights",  # D12f: same
    "st_heavy_hitters",  # St15: r7-new double-verify
    "st_quantiles",  # St16: r7-new double-verify
    "st_theta_overlap",  # St17: r7-new double-verify
    "x_ann_ivfpq",  # D3k: r7-new double-verify
    "f_dates",  # F3 family holder (r1+r2 - stalest records)
    "f_format",  # F2 (r1+r2)
    "j_two_way",  # J2 family holder (r1+r2)
    "a_distinct",  # A2 family holder (r1+r2)
    "w_topk_group",  # W family holder (r1+r2)
    "st_sliding",  # St2 family holder (r1+r2)
    "o_limit",  # O2 family holder (r1+r2)
    "f_equality",  # P3 family holder (r1+r2)
    "s_union",  # set-ops family holder (r1+r2)
    "f_sha2",  # F4 (r1+r2)
    "f_validate_id",  # F6 (r1+r2)
    "j_self_parent",  # J3 (r1+r2)
    "x_ann_lsh",  # D3 rows-only (stale)
    "x_token_freq",  # D4 (stale)
    "x_token_bpe",  # D4 (stale)
    "x_fingerprint",  # D4 (stale)
    "s_intersect",  # set ops (stale)
    "f_json_multi",  # F5 (stale)
    "f_path_ops",  # F9 (stale)
    "a_cube",  # A+ (stale)
    "a_pivot",  # A+ (stale)
    "x_embed_stats",  # profiling (stale)
    "x_text_stats",  # D4 (r2+r3)
    "x_split_hash",  # D8 (r2+r3)
    "x_dedup_embed",  # D3 (r2+r3)
    "x_topk_sim",  # D3 (r2+r3)
    "x_chunk_docs",  # D9 (r2+r3)
    "x_repetition",  # D4 (r2+r3)
    "f_substring",  # P1 (r1+r2+r3)
    "f_daterange",  # P2 (r1+r2+r3)
    "f_inlist",  # P4 (r1+r2+r3)
    # --- position 51+: displaced r7-window members — each now holds
    #     a FRESH r7 green row on code unchanged since (impl + unit
    #     tests + recorded rows intact; they only skip this round's
    #     driver re-check) ---
    "x_phash_dedup",  # r7 green
    "x_audio_dedup",  # r7 green
    "x_heavy_hitters",  # r7 green
    "x_embed_quantize",  # r7 green
    "x_hard_negatives",  # r7 green
    "x_split_leakage",  # r7 green
    "x_rebalance",  # r7 green
    "x_embed_pca",  # r7 green
    "x_dsir_select",  # r7 green
    "x_pq_quantize",  # r7 green
    "x_substring_dedup",  # r7 green
    "x_ann_pq",  # r7 green
    "x_dsir_resample",  # r7 green
    "x_scene_changes",  # r7 green
    "st_distinct_hll",  # r7 green
    "x_gapfill",  # r7 green
    "o_natural_sort",  # r7 green
    "x_quality_filter",  # r7 green
    "st_join",  # r7 green
    "j_range",  # r7 green
    "a_approx_sketch",  # r7 green
    "s_except",  # r7 green
    "x_lang_id",  # r7 green
    "x_fuzzy_join",  # r7 green
    "x_length_trim",  # r7 green
    "x_sample_weighted",  # r7 green
    "x_unigram_logprob",  # r7 green
    "w_lag_lead",  # r7 green
    "x_mad_outlier",  # r7 green
    "x_pagerank",  # r7 green
    "o_sort",  # r7 green
    "j_semi",  # r7 green
    "st_anomaly",  # r7 green
    "x_merge_upsert",  # r7 green
    # --- remaining tail, prior relative order (record annotations
    #     in git history at the round-7 revision) ---
    "x_inverted_index",
    "x_token_ids",
    "x_novelty",
    "x_length_batches",
    "x_retrieval_batch",
    "x_interp_linear",
    "x_bpe_train",
    "x_bpe_encode",
    "x_ann_eval",
    "x_semdedup_eval",
    "x_pipeline_audit",
    "x_bm25",
    "x_cooccur_pmi",
    "x_funnel",
    "x_retention",
    "x_histogram",
    "x_rolling_zscore",
    "x_quality_norm",
    "x_semdedup",
    "x_retrieval_metrics",
    "o_topk",
    "w_dense_rank",
    "w_range_frame",
    "x_shard_shuffle",
    "x_tfidf",
    "x_ann_ivf",
    "x_pack_sequences",
    "j_outer_count",
    "a_sum_avg",
    "f_not_exists",
    "f_string_parse",
    "x_span_dedup",
    "a_geomean_udaf",
    "w_running",
    "w_rownum_page",
    "st_tumbling",
    "st_session",
    "st_topk_trend",
    "x_sessionize",
    "x_transition_matrix",
    "f_from_json",
    "f_json_extract",
    "f_array_ops",
    "j_json_filter",
    "j_asof",
    "j_temporal_lookup",
    "a_count_distinct",
    "a_group_summary",
    "x_exact_quantiles",
    "x_profile_stats",
    "x_incr_agg",
    "x_corr_matrix",
    "x_scd2_history",
    "x_table_diff",
    "x_cdc_apply",
    "x_domain_mix",
    "x_stratified",
    "x_token_budget",
    "x_source_cap",
    "x_bigram_logprob",
    "x_scrub",
    "x_sentences",
    "x_dedup_exact",
    "f_cast_coerce",
    "a_rollup",
    "p_project",
    "f_null_handling",
    "j_three_way",
    "a_count",
]



def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES re-ordered by PRIORITY (unlisted names keep registration
    order at the end — a safety net for queries added without a PRIORITY
    entry)."""
    out: dict[str, QueryFn] = {}
    for name in PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB ANSI-SQL twin
    (omit for non-SQL-expressible ops → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (registration happens at import)."""
    from imagingdb_spark import operators, pipelines  # noqa: F401
