"""Registry/doc hygiene: the paperwork conventions that drifted at the
round-7 snapshot (VERDICT r7 #3 — OPERATORS.md/README one query behind
the live registry, one query with no planted test) become mechanical
checks so the drift cannot recur."""

from __future__ import annotations

import os
import re

from oracle_parquet_dumper_spark.plans import REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries adjudicated rows-only (no DuckDB oracle): the two engine-
# internal sketch panels, per VERDICT r5-r7.  Any growth here is a
# deliberate decision, recorded by editing this set.
ROWS_ONLY = {"agg_approx", "agg_sketch_panel"}


def test_every_query_has_oracle_or_rows_only_adjudication():
    missing = {n for n, s in REGISTRY.items() if not s.oracle} - ROWS_ONLY
    assert not missing, f"queries without oracle or adjudication: {sorted(missing)}"
    stale = ROWS_ONLY - set(REGISTRY)
    assert not stale, f"adjudicated names no longer registered: {sorted(stale)}"


def test_every_query_is_tagged():
    untagged = [n for n, s in REGISTRY.items() if not s.tags]
    assert not untagged


def test_lsh_band_domain_rule_registry_wide():
    """VERDICT r9 #2: band-key CARDINALITY, not band count, is the LSH
    scale limiter (the sf1 sweep measured mm_phash_neardup at N^2/256
    on 8-bit band keys).  Every lsh/simhash-tagged query must declare
    its band-key domain; fixed domains below 2^20 need an occupancy
    cap, capacity-scaled bands, a demo tag, or a written ruling."""
    from oracle_parquet_dumper_spark.plans.registry import (
        LSH_BAND_DOMAIN_RULINGS,
        lsh_band_domain_violations,
    )

    assert lsh_band_domain_violations() == []
    # rulings must name live queries (no stale adjudications)
    stale = set(LSH_BAND_DOMAIN_RULINGS) - set(REGISTRY)
    assert not stale, f"rulings for unregistered queries: {sorted(stale)}"


def test_lsh_band_domain_rule_fires_on_synthetic_violation():
    """The rule must actually FIRE — same pattern as the forced-
    broadcast boundedness rule (tests/test_plans.py): a synthetic
    8-bit-band query with no cap/ruling is flagged, and an undeclared
    lsh query is flagged."""
    from oracle_parquet_dumper_spark.plans.registry import (
        QuerySpec,
        lsh_band_domain_violations,
    )

    def dummy(spark, sf_dir):  # pragma: no cover - never run
        raise AssertionError

    synth = {
        # the round-9 pHash defect, re-staged: fixed 8-bit band keys
        "bad_8bit": QuerySpec("bad_8bit", dummy, tags=("dedup", "lsh"), band_bits=8),
        # missing declaration entirely
        "bad_undeclared": QuerySpec("bad_undeclared", dummy, tags=("lsh",)),
        # healthy shapes must NOT fire
        "ok_wide": QuerySpec("ok_wide", dummy, tags=("lsh",), band_bits=124),
        "ok_capped": QuerySpec(
            "ok_capped", dummy, tags=("lsh",), band_bits=8, capped_occupancy=True
        ),
        "ok_demo": QuerySpec("ok_demo", dummy, tags=("lsh", "demo"), band_bits=4),
        "ok_untagged": QuerySpec("ok_untagged", dummy, tags=("join",)),
    }
    got = lsh_band_domain_violations(synth)
    flagged = {m.split(":")[0] for m in got}
    assert flagged == {"bad_8bit", "bad_undeclared"}, got


def test_operators_md_matches_live_registry():
    """OPERATORS.md is generated (scripts/gen_operators_md.py); its
    total line and its per-query rows must match len(REGISTRY)."""
    text = open(os.path.join(REPO, "OPERATORS.md")).read()
    m = re.search(r"Total: (\d+) queries, (\d+) oracle-checked, (\d+) rows-only", text)
    assert m, "OPERATORS.md missing the Total line — regenerate it"
    assert int(m.group(1)) == len(REGISTRY), (
        f"OPERATORS.md says {m.group(1)} queries, registry has {len(REGISTRY)} — "
        "re-run scripts/gen_operators_md.py"
    )
    assert int(m.group(2)) == len(REGISTRY) - len(ROWS_ONLY)
    assert int(m.group(3)) == len(ROWS_ONLY)
    # every registered query appears by name
    missing = [n for n in REGISTRY if n not in text]
    assert not missing, f"queries absent from OPERATORS.md: {missing[:5]}"


def test_readme_query_count_matches_registry():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README.md lost its registered-queries line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README.md says {m.group(1)} registered queries, registry has "
        f"{len(REGISTRY)}"
    )


# Queries registered BEFORE this ratchet was added (round 8) that have
# no by-name reference in tests/ or SCALING.md: they are covered by the
# auto-parametrized DuckDB differential, the harness-safety sweep, the
# plan audit, and (for fn_*/window_*/set_*) the property fuzzers — all
# of which enumerate REGISTRY programmatically.  The set is FROZEN:
# names may leave (when they gain a dedicated test — delete them here),
# never join.  A new query must ship with a by-name planted test or a
# SCALING.md decade-ratio entry (the text_tokenizer_fertility lapse,
# VERDICT r7 #3, is what this ratchet prevents).
LEGACY_UNREFERENCED = frozenset(
    """clean_span_freq_dedup clean_length_band dedup_exact_multicol
    dedup_ngram_jaccard dedup_fuzzy_levenshtein dedup_fuzzy_levenshtein_lsh
    sample_weighted_hash sample_stratified_hash sample_reservoir_per_group
    dedup_containment_lsh events_funnel_signup_purchase graph_hierarchy_depth
    layout_hilbert_tiles mm_frame_sample mm_grouped_embed_agg
    text_chunk_sliding pipeline_seq_packing text_contamination_ngram
    pipeline_domain_mixture text_pii_redaction profile_key_skew
    profile_mutual_information profile_entropy profile_gini_concentration
    join_left_outer join_right_outer join_full_outer join_cross
    agg_basic_stats agg_var_stddev agg_having agg_collect_sorted agg_rollup
    agg_cube agg_grouping_sets agg_pivot agg_kmv_intersection
    agg_incremental_merge join_skew_planted_salted subquery_scalar
    subquery_correlated_exists agg_max_min_by agg_bool_bit
    q3_shipping_priority q10_returned_items q7_volume_shipping
    q8_market_share q14_promo_revenue agg_listagg_ordered
    q19_disjunctive_pushdown q16_supplier_cnt q21_waiting_orders
    q22_global_sales_opportunity q4_order_priority q6_forecast_revenue
    q13_customer_distribution q15_top_supplier q17_small_quantity_revenue
    q2_min_cost_supplier q9_product_type_profit q11_important_stock
    q12_priority_by_category q20_excess_stock_suppliers merge_upsert
    scd2_history agg_mode_top1 agg_weighted_avg agg_time_bucket_hourly
    fn_struct_argmax agg_weighted_percentile_exact filter_compound
    filter_like_rlike null_handling fn_string fn_date fn_math
    fn_conditional fn_array fn_explode_tokens fn_json fn_json_struct_agg
    fn_map fn_generator_sequence fn_unpivot fn_histogram_bins
    fn_string_extended agg_count_if_median fn_try_cast fn_bitwise
    fn_interval_arith fn_posexplode_outer fn_array_extended fn_json_tuple
    fn_variant_json fn_url_extract set_union_all set_intersect set_except
    sort_multi_col distinct_rows set_intersect_all set_except_all
    sim_threshold_join sim_threshold_join_lsh stream_sliding_counts
    stream_session_windows stream_dedup_pairs text_stats text_token_count
    text_lang_dist text_langid_heuristic text_quality_score
    text_fingerprint text_tfidf_topterms text_stopword_removal
    text_bigram_topk udf_plain_python udf_map_in_arrow
    udf_scalar_plain_pickle dq_table_checksum dq_benford_leading_digit
    window_rank_dense_ntile window_lag_lead window_running_sum
    window_moving_avg window_first_last join_asof window_range_numeric
    window_event_transitions window_count_distinct_running
    join_asof_nearest window_interval_merge""".split()
)


def test_no_new_unreferenced_queries():
    """Ratchet: every query registered after round 8 must appear by name
    in tests/ or SCALING.md (planted test or decade-ratio entry)."""
    corpus = ""
    tests_dir = os.path.join(REPO, "tests")
    for fn in os.listdir(tests_dir):
        if fn.endswith(".py") and fn != "test_registry_hygiene.py":
            corpus += open(os.path.join(tests_dir, fn)).read()
    # SCALING.md records the decade-ratio sweeps; count it too
    corpus += open(os.path.join(REPO, "SCALING.md")).read()
    unreferenced = {n for n in REGISTRY if n not in corpus}
    new = unreferenced - LEGACY_UNREFERENCED
    assert not new, (
        f"new queries with no by-name test or SCALING.md entry: {sorted(new)}"
    )
    gone = LEGACY_UNREFERENCED - set(REGISTRY)
    assert not gone, f"legacy names no longer registered — prune: {sorted(gone)}"
