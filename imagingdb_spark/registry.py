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
# Round-5 rotation (VERDICT r4 items 1+2, applied): CORRECTNESS_r04 was
# green for 45 of the 50 window rows; the 2 red rows (x_inverted_index,
# x_token_ids — the driver's canonicalizer cannot hash ArrayType cells)
# are fixed by serializing the array outputs on both engine sides and
# rotate back IN alongside the 9 round-4 tail additions that never held a
# record (x_novelty, x_length_batches, x_retrieval_batch, x_interp_linear
# oracle-exact; x_bpe_train, x_bpe_encode, x_ann_eval, x_semdedup_eval,
# x_pipeline_audit rows-only). Five queries whose implementations change
# this round stay in-window so their records cover current code
# (x_span_dedup, x_dedup_eval, x_pagerank, a_geomean_udaf,
# x_hard_negatives, plus the new x_hard_negatives_ann); 33 family
# holders fill the remaining window slots, preferring members
# whose only green row is r4 (a second row double-verifies them). The 9
# freshly-green r4 rows that rotate out keep their implementations, unit
# tests, and recorded rows.
PRIORITY: list[str] = [
    # --- rotated IN for round 5 (VERDICT r4 items 1+2): the 11 queries with
    #     no driver record — the two CORRECTNESS_r04 red rows, now fixed by
    #     serializing their array outputs (lm.py), the four r4 late
    #     oracle-exact additions, and the five r4 rows-only additions ---
    "x_inverted_index",   # D18 sibling: fixed — postings now comma-joined
    "x_token_ids",      # D4 sibling: fixed — ids now comma-joined
    "x_novelty",        # D11b: cross-doc n-gram novelty (oracle-exact)
    "x_length_batches", # D15b: length-bucketed batching (oracle-exact)
    "x_retrieval_batch",  # D3f+: probe-SET retrieval metrics (oracle-exact)
    "x_interp_linear",  # T1+: linear interpolation on dense grid (oracle-exact)
    "x_bpe_train",      # D4c: BPE merge-table training (rows-only)
    "x_bpe_encode",     # D4d: BPE apply (rows-only)
    "x_ann_eval",       # D3e: recall@10 of both ANN paths (rows-only)
    "x_semdedup_eval",  # D2e+: learned-blocking recall eval (rows-only)
    "x_pipeline_audit", # PIPE: composed pipeline stage audit (rows-only)
    # --- kept IN: implementation touched in round 5 (VERDICT r4 items
    #     3/5/9), so their last green rows predate the current code ---
    "x_span_dedup",     # D2f: sampling.py persist-lifecycle cleanup
    "x_dedup_eval",     # D2g: rounded-threshold truth-set parity fix
    "x_pagerank",       # D12c: self-loop filter in symmetrization
    "a_geomean_udaf",   # UDAF: monoid (ln→AVG→exp) decomposition default
    "x_hard_negatives", # D3g: ANN-cell mining variant lands this round
    "x_hard_negatives_ann",  # D3g+ NEW r5: cell-cogrouped miner, oracle-exact
    #                     at full probe (certifies the no-collect path)
    # --- retained holders: one per SURVEY §2 family, preferring members
    #     whose only green row is r4 (double-verification) ---
    "w_running",        # W
    "w_rownum_page",    # W + O3 offset slicing
    "st_tumbling",      # St1 (batch twin)
    "st_session",       # St3
    "st_topk_trend",    # St2 sibling (single green row, r4)
    "x_sessionize",     # St3 row-level twin (single green row, r4)
    "x_transition_matrix",  # St sibling (single green row, r4)
    "f_from_json",      # S3/F5
    "f_json_extract",   # P5/P6
    "f_array_ops",      # F8
    "j_json_filter",    # J5
    "j_asof",           # J+
    "j_temporal_lookup",  # J4b (single green row, r4)
    "a_count_distinct", # A3
    "a_group_summary",  # A4/A5
    "x_exact_quantiles",  # A+ (single green row, r4)
    "x_profile_stats",  # A+ (single green row, r4)
    "x_incr_agg",       # A+ (single green row, r4)
    "x_corr_matrix",    # A12 (single green row, r4)
    "x_dedup_jaccard",  # D2 exact PPJoin
    "x_dedup_incremental",  # D13
    "x_dedup_cluster",  # D12
    "x_dedup_verified", # D2b+ (single green row, r4)
    "x_scd2_history",   # S10b (single green row, r4)
    "x_table_diff",     # S10c (single green row, r4)
    "x_cdc_apply",      # S10d (single green row, r4)
    "x_domain_mix",     # D8 (single green row, r4)
    "x_stratified",     # D8 (single green row, r4)
    "x_token_budget",   # D8 (single green row, r4)
    "x_source_cap",     # D8 (single green row, r4)
    "x_bigram_logprob", # D17 (single green row, r4)
    "x_scrub",          # D10 (single green row, r4)
    "x_sentences",      # UDTF (single green row, r4)
    # --- position 51+: green driver rows on record, rotated out per the
    #     round-5 plan; implementations + unit tests intact ---
    "x_embed_quantize",  # NEW r5 late addition (D3h, int8 SQ + error
    #                      audit): oracle-exact by selfcheck at
    #                      sf0.001/0.01/sf1.0; round-6 window candidate
    "x_bm25",           # pass-r4 (yielded its slot to x_hard_negatives_ann;
    #                     D18 still held in-window by x_inverted_index)
    "x_mad_outlier",    # pass-r4
    "x_cooccur_pmi",    # pass-r4
    "x_funnel",         # pass-r4
    "x_retention",      # pass-r4
    "x_histogram",      # pass-r4
    "x_rolling_zscore", # pass-r4
    "x_quality_norm",   # pass-r4
    "x_semdedup",       # clean-run r4 (rows-only by design)
    "x_retrieval_metrics",  # pass-r4
    "x_dedup_exact",    # D1 — pass-r1+r3 (yielded its slot to x_sentences)
    "f_string_parse",   # F1 — pass-r1+r3 (yielded its slot to a new r4 query)
    "f_cast_coerce",    # F7 — pass-r1+r3 (yielded its slot to a new r4 query)
    "a_rollup",         # A+ — pass-r1+r3 (yielded its slot to a new r4 query)
    "o_topk",           # O5 — pass-r3
    "o_sort",           # O1 — pass-r3
    "w_dense_rank",     # W — pass-r3
    "w_lag_lead",       # W — pass-r3
    "w_range_frame",    # W — pass-r3
    "x_sample_weighted",  # D8 — pass-r3
    "x_dedup_compact",  # D12 — pass-r3
    "x_shard_shuffle",  # D16 — pass-r3
    "st_join",          # St6 — pass-r3
    "x_unigram_logprob",  # D17 — pass-r3
    "x_length_trim",    # D10 — pass-r3
    "x_gapfill",        # T1 — pass-r3
    "x_fuzzy_join",     # D2 — pass-r3
    "x_tfidf",          # D18 — pass-r3
    "x_merge_upsert",   # S10 — pass-r3
    "x_ann_ivf",        # D3 — clean-run r3 (rows-only by design)
    "a_approx_sketch",  # sketches — clean-run r3 (rows-only by design)
    "x_pack_sequences", # D15 — clean-run r3 (rows-only by design)
    "f_substring",      # P1 — pass-r1+r2+r3
    "f_daterange",      # P2 — pass-r1+r2+r3
    "f_inlist",         # P4 — pass-r1+r2+r3
    "p_project",        # P7 — pass-r1+r2+r3
    "f_null_handling",  # P9 — pass-r1+r2+r3
    "j_three_way",      # J1 — pass-r1+r2+r3
    "a_count",          # A1 — pass-r1+r2+r3
    "x_text_stats",     # D4 — pass-r2+r3
    "x_split_hash",     # D7 — pass-r2+r3
    "x_dedup_embed",    # D2 — pass-r2+r3
    "x_topk_sim",       # D3 — pass-r2+r3
    "x_chunk_docs",     # D14 — pass-r2+r3
    "x_decontaminate",  # D9 — pass-r2+r3
    "x_repetition",     # D11 — pass-r2+r3
    "w_topk_group",     # W — pass-r1 + pass-r2
    "st_sliding",       # St2 — pass-r1 + pass-r2
    "st_anomaly",       # D6 — clean-run r2 (rows-only by design)
    "o_natural_sort",   # O4 — pass-r2
    "o_limit",          # O2 — pass-r1 + pass-r2
    "f_equality",       # P3 — pass-r1 + pass-r2
    "f_not_exists",     # P8 — pass-r1 + pass-r2
    "f_dates",          # F3 — pass-r1 + pass-r2
    "f_format",         # F2 — pass-r1 + pass-r2
    "f_sha2",           # F4 — pass-r1 + pass-r2
    "f_validate_id",    # F6 — pass-r1 + pass-r2
    "j_two_way",        # J2 — pass-r1 + pass-r2
    "j_self_parent",    # J3 — pass-r1 + pass-r2
    "a_distinct",       # A2 — pass-r1 + pass-r2
    "s_union",          # set ops — pass-r1 + pass-r2
    "x_quality_filter", # D10 — pass-r2
    "j_outer_count",    # J+ — pass-r1
    "j_range",          # J+ — pass-r1
    "j_semi",           # J+ — pass-r1
    "a_sum_avg",        # A+ — pass-r1
    "s_except",         # set ops — pass-r1
    "x_dedup_minhash",  # D2 rows-only (x_dedup_verified now oracle-exact)
    "x_dedup_simhash",  # D2 rows-only
    "x_ann_lsh",        # D3 rows-only (topk_sim covers the row)
    "x_lang_id",        # D4 — pass-r1
    "x_token_freq",     # D4
    "x_token_bpe",      # D4
    "x_fingerprint",    # D4
    "s_intersect",      # set ops
    "f_json_multi",     # F5
    "f_path_ops",       # F9
    "a_cube",           # A+
    "a_pivot",          # A+
    "x_embed_stats",    # bonus profiling query
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
