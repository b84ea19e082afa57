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
PRIORITY: list[str] = [
    # --- NEW in round-7 second session: no driver record exists yet ---
    "x_perplexity_bucket",  # D24: CCNet per-language perplexity terciles
    "x_triangles",       # D25: degree-ordered basket triangle counting
    "x_containment",     # D2i: asymmetric containment near-dup
    "st_perplexity",     # St18: maintained-LM continuous quality monitor
    # --- jaccard_ge sweep: impl+oracle changed in round-7 2nd session ---
    "x_dedup_jaccard",   # D2a (exact integer threshold)
    "x_dedup_incremental",  # D13 (both match paths)
    "x_dedup_cluster",   # D12 (consumes jaccard; oracle embeds its SQL)
    "x_dedup_compact",   # D12b (same)
    # --- NEW in round 7: no driver record exists yet ---
    "st_heavy_hitters",  # St15: continuous Misra-Gries heavy hitters
    "st_quantiles",      # St16: continuous DDSketch quantiles
    "x_ann_ivfpq",       # D3k: IVF x residual-PQ serving composition
    "st_theta_overlap",  # St17: continuous KMV/theta set-algebra sketches
    # --- r6 singles whose implementation ALSO changed in round 7 ---
    "x_phash_dedup",     # D5c (groups checkpoint swap, ADVICE r6)
    "x_audio_dedup",     # D5d (shares the phash engine)
    "x_heavy_hitters",   # D4e (sketch partials now carry counters)
    # --- double-verification: single-green-r6 rows ---
    "x_embed_quantize",  # D3h (r6 was its first driver row)
    "x_dedup_verified",  # D2b+ (r6 impl: lossless LSH u prefix)
    "x_hard_negatives",  # D3g (r6 impl: cell-cogrouped miner)
    "x_split_leakage",   # D20
    "x_rebalance",       # D8e
    "x_embed_pca",       # D3i rows-only
    "x_dsir_select",     # D19
    "x_pq_quantize",     # D3h+ rows-only
    "x_substring_dedup", # D2h
    "x_ann_pq",          # D3j rows-only
    "x_dsir_resample",   # D19b
    "x_scene_changes",   # D5e rows-only
    "x_dedup_retain",    # D12d
    "x_dedup_weights",   # D12f
    "st_distinct_hll",   # St14/D21 rows-only
    # --- oldest/weakest records: single green row ever ---
    "x_gapfill",         # T1 (single green r3)
    "o_natural_sort",    # O4 (single green r2)
    "x_quality_filter",  # D10 (single green r2)
    "st_join",           # St6 (single green r3)
    "j_range",           # J+ (single green r1)
    "a_approx_sketch",   # sketches rows-only (single clean r3)
    "s_except",          # set ops (single green r1)
    "x_lang_id",         # D4 (single green r1)
    "x_fuzzy_join",      # D2 (single green r3)
    "x_length_trim",     # D10 (single green r3)
    "x_sample_weighted", # D8 (single green r3)
    "x_unigram_logprob", # D17 (single green r3)
    "w_lag_lead",        # W (single green r3)
    "x_mad_outlier",     # A+ (single green r4)
    "x_dedup_eval",      # D2 rows-only (single clean r5)
    "x_pagerank",        # D12c rows-only (single clean r5)
    "o_sort",            # O1 (single green r3)
    "j_semi",            # J+ (single green r1)
    "st_anomaly",        # D6 rows-only (single clean r2)
    # --- family holder (the last r1+r2 double, f_dates, displaced by
    #     st_perplexity — it holds two green rows on unchanged code) ---
    "x_merge_upsert",    # S10 holder (r3+r6)
    # --- position 51+: green driver rows on record; implementations +
    #     unit tests intact. Ordered roughly by record freshness. ---
    "f_dates",           # F3 (r1+r2)
    "f_format",          # F2 (r1+r2) — displaced by the second-session
    "j_two_way",         # J2 (r1+r2)    additions (3 new queries + the
    "a_distinct",        # A2 (r1+r2)    4 jaccard_ge sweep members)
    "w_topk_group",      # W (r1+r2)
    "st_sliding",        # St2 (r1+r2)
    "o_limit",           # O2 (r1+r2)
    "f_equality",        # P3 (r1+r2)
    "s_union",           # set ops (r1+r2) — displaced by the new
    #                      st_theta_overlap; s_except holds in-window
    "x_inverted_index",  # r5+r6
    "x_token_ids",       # r5+r6
    "x_novelty",         # r5+r6
    "x_length_batches",  # r5+r6
    "x_retrieval_batch", # r5+r6
    "x_interp_linear",   # r5+r6
    "x_bpe_train",       # clean r5+r6 (rows-only)
    "x_bpe_encode",      # clean r5+r6 (rows-only)
    "x_ann_eval",        # clean r5+r6 (rows-only)
    "x_semdedup_eval",   # clean r5+r6 (rows-only)
    "x_pipeline_audit",  # clean r5+r6 (rows-only)
    "x_bm25",            # r4+r6
    "x_cooccur_pmi",     # r4+r6
    "x_funnel",          # r4+r6
    "x_retention",       # r4+r6
    "x_histogram",       # r4+r6
    "x_rolling_zscore",  # r4+r6
    "x_quality_norm",    # r4+r6
    "x_semdedup",        # clean r4+r6 (rows-only)
    "x_retrieval_metrics",  # r4+r6
    "o_topk",            # r3+r6
    "w_dense_rank",      # r3+r6
    "w_range_frame",     # r3+r6
    "x_shard_shuffle",   # r3+r6
    "x_tfidf",           # r3+r6
    "x_ann_ivf",         # clean r3+r6 (rows-only)
    "x_pack_sequences",  # clean r3+r6 (rows-only)
    "j_outer_count",     # r1+r6
    "a_sum_avg",         # r1+r6
    "f_not_exists",      # r1+r2+r6
    "f_string_parse",    # r1+r3
    "x_span_dedup",      # r4+r5
    "a_geomean_udaf",    # r4+r5
    "w_running",         # r3+r5
    "w_rownum_page",     # r4+r5
    "st_tumbling",       # r1+r5
    "st_session",        # r2+r5
    "st_topk_trend",     # r4+r5
    "x_sessionize",      # r4+r5
    "x_transition_matrix",  # r4+r5
    "f_from_json",       # r2+r5
    "f_json_extract",    # r2+r5
    "f_array_ops",       # r2+r5
    "j_json_filter",     # r2+r5
    "j_asof",            # r1+r5
    "j_temporal_lookup", # r4+r5
    "a_count_distinct",  # r2+r5
    "a_group_summary",   # r2+r5
    "x_exact_quantiles", # r4+r5
    "x_profile_stats",   # r4+r5
    "x_incr_agg",        # r4+r5
    "x_corr_matrix",     # r4+r5
    "x_scd2_history",    # r4+r5
    "x_table_diff",      # r4+r5
    "x_cdc_apply",       # r4+r5
    "x_domain_mix",      # r4+r5
    "x_stratified",      # r4+r5
    "x_token_budget",    # r4+r5
    "x_source_cap",      # r4+r5
    "x_bigram_logprob",  # r4+r5
    "x_scrub",           # r4+r5
    "x_sentences",       # r4+r5
    "x_dedup_exact",     # r1+r3
    "f_cast_coerce",     # r1+r3
    "a_rollup",          # r1+r3
    "f_substring",       # r1+r2+r3
    "f_daterange",       # r1+r2+r3
    "f_inlist",          # r1+r2+r3
    "p_project",         # r1+r2+r3
    "f_null_handling",   # r1+r2+r3
    "j_three_way",       # r1+r2+r3
    "a_count",           # r1+r2+r3
    "x_text_stats",      # r2+r3
    "x_split_hash",      # r2+r3
    "x_dedup_embed",     # r2+r3
    "x_topk_sim",        # r2+r3
    "x_chunk_docs",      # r2+r3
    "x_decontaminate",   # r2+r3
    "x_repetition",      # r2+r3
    "f_sha2",            # r1+r2
    "f_validate_id",     # r1+r2
    "j_self_parent",     # r1+r2
    "x_dedup_minhash",   # D2 rows-only
    "x_dedup_simhash",   # D2 rows-only
    "x_ann_lsh",         # D3 rows-only
    "x_token_freq",      # D4
    "x_token_bpe",       # D4
    "x_fingerprint",     # D4
    "s_intersect",       # set ops
    "f_json_multi",      # F5
    "f_path_ops",        # F9
    "a_cube",            # A+
    "a_pivot",           # A+
    "x_embed_stats",     # bonus profiling query
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
