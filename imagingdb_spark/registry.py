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
# Round-6 rotation (VERDICT r5 items 1/2/5, applied):
# - IN, no driver record: x_embed_quantize (the only such query).
# - IN, implementation changed this round (last green rows predate the
#   code): x_dedup_verified (candidate set now lossless — LSH ∪ PPJoin
#   prefix), x_hard_negatives (headline swapped to the no-collect
#   cell-cogrouped miner; the broadcast variant is demoted to a utility),
#   x_embed_quantize again (mean_abs_err fold order pinned ascending on
#   both engine sides — ADVICE r5 item 1).
# - RETIRED: x_hard_negatives_ann — its plan IS the new x_hard_negatives;
#   a second identical registration would be padding. Its green r5 row
#   certified exactly the plan the headline now runs.
# - IN for double-verification, continuing the single-green-row
#   discipline: the 11 r5 rotated-in queries (only green row is r5), the
#   10 r4 singles, 16 r3 singles, 2 r2 singles, 5 r1 singles, plus
#   f_not_exists (P holder) and f_string_parse (F holder) so every SURVEY
#   §2 family keeps an in-window member.
# - OUT to the tail: everything that got its r5 row on unchanged code and
#   has 2+ green rows (or whose family keeps a fresher holder).
# - NEW this round, in-window (no driver record exists yet):
#   x_split_leakage, x_heavy_hitters, x_rebalance, x_embed_pca. To keep
#   the window at exactly 50, four r1/r3 singles rotate to the tail top
#   (j_range, a_approx_sketch, s_except, x_lang_id) — each family keeps an
#   in-window holder or 2+-green siblings; see the tail comments.
PRIORITY: list[str] = [
    # --- rotated IN for round 6: no record / impl changed this round ---
    "x_embed_quantize",  # D3h: int8 SQ + error audit — only query with no
    #                      driver record; mean fold order pinned this round
    "x_dedup_verified",  # D2b+: candidate set now LOSSLESS (LSH ∪ prefix)
    "x_hard_negatives",  # D3g: headline is now the cell-cogrouped miner
    # --- NEW in round 6 (no driver record yet, hence in-window; they
    #     displace x_lang_id + s_except to 51-52, whose families keep
    #     in-window or double-green coverage — see tail comments) ---
    "x_split_leakage",  # D20: train/eval near-dup leakage audit (oracle)
    "x_heavy_hitters",  # D4e: Misra–Gries sketch + exact recount (oracle)
    "x_rebalance",      # D8e: deterministic class oversampling (oracle)
    "x_embed_pca",      # D3i: distributed-moments PCA (rows-only + numpy
    #                     parity unit test)
    "x_phash_dedup",    # D5c: perceptual-hash image near-dup over synthetic
    #                     PNG frames (rows-only + brute-force parity unit
    #                     test); displaces f_string_parse, whose r1+r3
    #                     double greens already cover the F family
    "x_dsir_select",    # D19: DSIR hashed-n-gram importance selection
    #                     (oracle-exact + Python-twin parity unit test);
    #                     displaces x_fuzzy_join — the rotated-in
    #                     x_dedup_verified holds for the D2 family
    "x_pq_quantize",    # D3h+: product quantization (rows-only + numpy
    #                     parity + planted zero-error corpus); displaces
    #                     x_length_trim — D10 keeps x_quality_norm and
    #                     x_quality_filter in-window
    "x_audio_dedup",    # D5d: audio fingerprint near-dup over synthetic
    #                     WAV clips (rows-only + brute-force parity +
    #                     G.711/gain invariance tests); displaces
    #                     x_sample_weighted — D8 keeps x_rebalance
    "x_substring_dedup",  # D2h: variable-length exact substring dedup
    #                     (oracle-exact gaps-and-islands + planted-run
    #                     tests); displaces x_unigram_logprob — D17 keeps
    #                     x_cooccur_pmi in-window
    "x_ann_pq",         # D3j: PQ/ADC ANN serving path (rows-only +
    #                     recall-vs-exact pinned); displaces w_lag_lead —
    #                     W keeps w_dense_rank, w_range_frame,
    #                     x_rolling_zscore in-window
    "x_dsir_resample",  # D19b: DSIR Gumbel-top-k importance resampling
    #                     (oracle-exact + Python-twin + bias tests);
    #                     displaces x_gapfill — T1 keeps x_interp_linear
    "x_scene_changes",  # D5e: shot-boundary detection over frame series
    #                     (rows-only + exact planted-cut recovery tests);
    #                     displaces x_mad_outlier — A keeps a_sum_avg,
    #                     x_funnel, x_retention, x_histogram in-window
    "x_dedup_retain",   # D12d: quality-aware canonical retention with a
    #                     loser→canonical provenance mapping (oracle-exact
    #                     window twin); displaces o_natural_sort — O keeps
    #                     o_topk in-window
    "x_dedup_weights",  # D12f: soft dedup (1/cluster_size down-weighting,
    #                     oracle-exact); displaces x_quality_filter — D10
    #                     keeps x_quality_norm in-window
    "st_distinct_hll",  # St14/D21: mergeable-HLL continuous distinct
    #                     (rows-only + accuracy/merge-algebra/streaming
    #                     bit-parity tests); displaces st_join — St keeps
    #                     this new member in-window, st_tumbling/
    #                     st_session/st_topk_trend hold double greens
    # --- double-verification: the 11 queries whose only green row is r5 ---
    "x_inverted_index",   # D18 sibling (single green row, r5)
    "x_token_ids",      # D4 sibling (single green row, r5)
    "x_novelty",        # D11b (single green row, r5)
    "x_length_batches", # D15b (single green row, r5)
    "x_retrieval_batch",  # D3f+ (single green row, r5)
    "x_interp_linear",  # T1+ (single green row, r5)
    "x_bpe_train",      # D4c rows-only (single clean run, r5)
    "x_bpe_encode",     # D4d rows-only (single clean run, r5)
    "x_ann_eval",       # D3e rows-only (single clean run, r5)
    "x_semdedup_eval",  # D2e+ rows-only (single clean run, r5)
    "x_pipeline_audit", # PIPE rows-only (single clean run, r5)
    # --- double-verification: the 10 queries whose only green row is r4 ---
    "x_bm25",           # D18 (single green row, r4)
    "x_cooccur_pmi",    # D17 sibling (single green row, r4)
    "x_funnel",         # A6 (single green row, r4)
    "x_retention",      # A7 (single green row, r4)
    "x_histogram",      # A8 (single green row, r4)
    "x_rolling_zscore", # W (single green row, r4)
    "x_quality_norm",   # D10c (single green row, r4)
    "x_semdedup",       # D2e rows-only (single clean run, r4)
    "x_retrieval_metrics",  # D3f (single green row, r4)
    # --- double-verification: 16 queries whose only green row is r3 ---
    "o_topk",           # O5 (single green row, r3)
    "w_dense_rank",     # W (single green row, r3)
    "w_range_frame",    # W (single green row, r3)
    "x_dedup_compact",  # D12 (single green row, r3)
    "x_shard_shuffle",  # D16 (single green row, r3)
    "x_tfidf",          # D18 (single green row, r3)
    "x_merge_upsert",   # S10 (single green row, r3)
    "x_ann_ivf",        # D3 rows-only (single clean run, r3)
    "x_pack_sequences", # D15 rows-only (single clean run, r3)
    # --- double-verification: r2/r1 singles + P/F family holders ---
    "j_outer_count",    # J+ (single green row, r1; J-family holder)
    "a_sum_avg",        # A+ (single green row, r1; A-family holder)
    "f_not_exists",     # P8 — P-family holder (pass-r1 + pass-r2)
    # --- position 51+: green driver rows on record; implementations +
    #     unit tests intact. Ordered roughly by record freshness. ---
    "f_string_parse",   # F1 (pass-r1 + pass-r3) — displaced by the new
    #                     x_phash_dedup; double greens cover the F family
    "o_natural_sort",   # O4 (single green r2) — displaced by the new
    #                     x_dedup_retain; o_topk holds for O
    "x_quality_filter", # D10 (single green r2) — displaced by the new
    #                     x_dedup_weights; x_quality_norm holds for D10
    "st_join",          # St6 (single green r3) — displaced by the new
    #                     st_distinct_hll, which holds for St in-window
    "j_range",          # J+ (single green r1) — displaced by the four new
    #                     round-6 queries; j_outer_count holds for J
    "a_approx_sketch",  # sketches rows-only (clean r3) — displaced;
    #                     a_sum_avg holds for A
    "s_except",         # set ops (single green r1) — displaced by the four
    #                     new round-6 queries; s_union/s_intersect hold
    #                     r1+r2 double greens for the family
    "x_lang_id",        # D4 (single green r1) — displaced; D4 keeps the
    #                     new x_heavy_hitters in-window
    "x_fuzzy_join",     # D2 (single green r3) — displaced by the new
    #                     x_dsir_select; x_dedup_verified holds for D2
    "x_length_trim",    # D10 (single green r3) — displaced by the new
    #                     x_pq_quantize; x_quality_norm + x_quality_filter
    #                     hold for D10
    "x_sample_weighted",  # D8 (single green r3) — displaced by the new
    #                     x_audio_dedup; x_rebalance holds for D8
    "x_unigram_logprob",  # D17 (single green r3) — displaced by the new
    #                     x_substring_dedup; x_cooccur_pmi holds for D17
    "w_lag_lead",       # W (single green r3) — displaced by the new
    #                     x_ann_pq; w_dense_rank/w_range_frame hold for W
    "x_gapfill",        # T1 (single green r3) — displaced by the new
    #                     x_dsir_resample; x_interp_linear holds for T
    "x_mad_outlier",    # A+ (single green r4) — displaced by the new
    #                     x_scene_changes; a_sum_avg/x_funnel/x_retention/
    #                     x_histogram hold for A
    "x_span_dedup",     # pass-r4 + pass-r5
    "x_dedup_eval",     # clean-run r5 (rows-only)
    "x_pagerank",       # clean-run r5 (rows-only)
    "a_geomean_udaf",   # pass-r4 + pass-r5
    "w_running",        # pass-r3 + pass-r5
    "w_rownum_page",    # pass-r4 + pass-r5
    "st_tumbling",      # pass-r1 + pass-r5
    "st_session",       # pass-r2 + pass-r5
    "st_topk_trend",    # pass-r4 + pass-r5
    "x_sessionize",     # pass-r4 + pass-r5
    "x_transition_matrix",  # pass-r4 + pass-r5
    "f_from_json",      # pass-r2 + pass-r5
    "f_json_extract",   # pass-r2 + pass-r5
    "f_array_ops",      # pass-r2 + pass-r5
    "j_json_filter",    # pass-r2 + pass-r5
    "j_asof",           # pass-r1 + pass-r5
    "j_temporal_lookup",  # pass-r4 + pass-r5
    "a_count_distinct", # pass-r2 + pass-r5
    "a_group_summary",  # pass-r2 + pass-r5
    "x_exact_quantiles",  # pass-r4 + pass-r5
    "x_profile_stats",  # pass-r4 + pass-r5
    "x_incr_agg",       # pass-r4 + pass-r5
    "x_corr_matrix",    # pass-r4 + pass-r5
    "x_dedup_jaccard",  # pass-r3 + pass-r5
    "x_dedup_incremental",  # pass-r3 + pass-r5
    "x_dedup_cluster",  # pass-r3 + pass-r5
    "x_scd2_history",   # pass-r4 + pass-r5
    "x_table_diff",     # pass-r4 + pass-r5
    "x_cdc_apply",      # pass-r4 + pass-r5
    "x_domain_mix",     # pass-r4 + pass-r5
    "x_stratified",     # pass-r4 + pass-r5
    "x_token_budget",   # pass-r4 + pass-r5
    "x_source_cap",     # pass-r4 + pass-r5
    "x_bigram_logprob", # pass-r4 + pass-r5
    "x_scrub",          # pass-r4 + pass-r5
    "x_sentences",      # pass-r4 + pass-r5
    "x_dedup_exact",    # pass-r1 + pass-r3
    "f_cast_coerce",    # pass-r1 + pass-r3
    "a_rollup",         # pass-r1 + pass-r3
    "o_sort",           # pass-r3 (O family held in-window by o_topk,
    #                     o_natural_sort)
    "f_substring",      # pass-r1+r2+r3
    "f_daterange",      # pass-r1+r2+r3
    "f_inlist",         # pass-r1+r2+r3
    "p_project",        # pass-r1+r2+r3
    "f_null_handling",  # pass-r1+r2+r3
    "j_three_way",      # pass-r1+r2+r3
    "a_count",          # pass-r1+r2+r3
    "x_text_stats",     # pass-r2+r3
    "x_split_hash",     # pass-r2+r3
    "x_dedup_embed",    # pass-r2+r3
    "x_topk_sim",       # pass-r2+r3
    "x_chunk_docs",     # pass-r2+r3
    "x_decontaminate",  # pass-r2+r3
    "x_repetition",     # pass-r2+r3
    "w_topk_group",     # pass-r1+r2
    "st_sliding",       # pass-r1+r2
    "st_anomaly",       # clean-run r2 (rows-only by design)
    "o_limit",          # pass-r1+r2
    "f_equality",       # pass-r1+r2
    "f_dates",          # pass-r1+r2
    "f_format",         # pass-r1+r2
    "f_sha2",           # pass-r1+r2
    "f_validate_id",    # pass-r1+r2
    "j_two_way",        # pass-r1+r2
    "j_self_parent",    # pass-r1+r2
    "a_distinct",       # pass-r1+r2
    "s_union",          # pass-r1+r2
    "j_semi",           # pass-r1 (J family held in-window by j_outer_count,
    #                     j_range)
    "x_dedup_minhash",  # D2 rows-only (x_dedup_verified is oracle-exact)
    "x_dedup_simhash",  # D2 rows-only
    "x_ann_lsh",        # D3 rows-only (topk_sim covers the row)
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
