"""Driver-verification rotation (VERDICT r01 'Next round' item 1).

The external correctness harness evaluates only the first 50 entries of
``__spark_entry__.queries()`` per round, in registration order. Round 1
therefore left 31 queries (all 13 ``s_*`` streaming, the text family incl.
the flagship ``q_curation_pipeline``, similarity, sourcefmt, and
``q_scalar_funcs``) without a driver CORRECTNESS row even though they are
locally pytest-green.

Fix: order the registry so the queries with the FEWEST driver-green rounds
come first. ``CHECKED_BY_ROUND`` records, per completed round, the set of
query names the driver actually evaluated (the keys of
``CORRECTNESS_r{N}.json``); append a new entry after each round. New or
never-checked queries sort to the front automatically, so every query
accumulates a green row across rounds.
"""

from __future__ import annotations

# Keys of CORRECTNESS_r01.json (the 50 queries the driver checked in
# round 1, 49 hash-green + q_approx_stats rows-only by design).
_ROUND_1 = frozenset(
    {
        "q_asof_join", "q_sessionize", "q_pivot", "q_cube", "q_salted_agg",
        "q_approx_stats", "q_bitmap_distinct", "q_sequence_gaps",
        "q_percentiles", "q_stats_moments", "q_conditional_agg",
        "q_explode_array", "q_range_join", "q_histogram", "q_unpivot",
        "q_grouping_sets", "q_outer_join", "q_scalar_subquery",
        "q_window_ranks", "q_string_funcs", "q_date_funcs",
        "q_nullsafe_join", "q_multiset_ops", "q_time_rollup",
        "q_cdc_envelope_parse", "q_udf_scalar", "q_cdc_apply", "q_scd2",
        "q_stratified_sample", "q_pack_sequences", "q_doc_chunks",
        "q_dedup_exact", "q_minhash_near_dup", "q_dup_clusters",
        "q_simhash", "q_ngram_jaccard", "q_dedup_docs",
        "q_multimodal_schema", "q_filter_predicate", "q_project_rename",
        "q_enrich_join", "q_join_inner_multi", "q_semi_anti_join",
        "q_agg_group", "q_agg_distinct", "q_rollup_cube", "q_window_rank",
        "q_window_analytic", "q_sort_limit_topk", "q_set_ops",
    }
)

CHECKED_BY_ROUND: dict[int, frozenset[str]] = {1: _ROUND_1}


def times_checked(name: str) -> int:
    return sum(1 for checked in CHECKED_BY_ROUND.values() if name in checked)


def rotation_order(names: list[str]) -> list[str]:
    """Stable order: fewest driver-checked rounds first, then original
    registration order."""
    return sorted(names, key=lambda n: (times_checked(n), names.index(n)))
