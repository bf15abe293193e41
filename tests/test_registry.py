"""Registry freeze + integrity gate for the driver surface.

The external correctness driver enumerates ``__spark_entry__.queries()``
and compares each entry against ``oracle_sql()``. Two failure modes this
pins down locally:

1. Registry drift — a rename/addition silently changes the key set the
   driver sees (round-2 verdict froze the registry; round 10 extended it
   to 93 names: TPC-H q8/q13/q21, layout_zorder_key,
   doc_heavy_hitter_tokens and doc_bpe_train_stats; round 11 to these
   98 — q2/q9/q11/q16/q20 restated without partsupp against lineitem
   as the part<->supplier relation, completing all 22 TPC-H shapes).
2. A query whose PLAN no longer builds (schema error, missing column)
   that would only surface minutes into the full oracle gate.

Building every plan at sf0.001 is near-free (analysis only for most
queries; the few with driver-side probes touch 1k-row tables).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

FROZEN_QUERY_NAMES = sorted(
    """
    agg_approx_distinct agg_approx_percentiles agg_collect_sorted agg_cube
    agg_grouping_sets agg_min_max_by agg_order_stats agg_percentiles agg_rollup
    agg_salted_two_stage agg_variance_manual cleanse_boolean
    cleanse_boolean_string cleanse_future_cap cleanse_numeric_coercion
    cleanse_timestamp_scrub conform_metadata_enrichment conform_rename_project
    distinct_keys doc_array_functions doc_bpe_train_stats doc_dedup_exact
    doc_edit_distance doc_heavy_hitter_tokens
    doc_fingerprint doc_lang_summary doc_language_id doc_minhash_near_dup
    doc_ngram_jaccard doc_quality_scores doc_simhash doc_text_stats
    doc_token_bpe embedding_cosine_near_dup embedding_cosine_near_dup_lsh
    embedding_cosine_topk embedding_cosine_topk_lsh
    embedding_cosine_topk_vectorized embedding_ivf_recall embedding_ivf_topk
    embedding_lsh_recall events_asof_join events_dynamic_session_gap
    events_incremental_filter events_json_advanced events_json_extract
    events_json_roundtrip events_sessionization events_sliding_window
    events_tumbling_window join_anti join_full_outer join_left_outer
    join_null_safe join_range join_salted join_semi layout_zorder_key merge_scd2 merge_upsert
    multimodal_feature_extract multimodal_frame_sample orderby_limit_topk
    pipeline_lead_assignment_end_to_end pipeline_lead_end_to_end
    pipeline_lead_xref_end_to_end pivot_status_by_priority q10_returned_items
    q12_priority_by_linestatus q13_customer_distribution q14_promo_revenue
    q15_top_supplier q17_small_quantity_revenue q18_large_orders
    q19_disjunctive_revenue q1_pricing_summary q20_potential_promotion
    q21_suppliers_kept_waiting
    q22_global_sales_opportunity q2_min_cost_supplier q3_shipping_priority
    q4_order_priority
    q5_nation_revenue q6_forecast_revenue q7_nation_volume q8_market_share
    q9_product_type_profit q11_important_stock
    q16_parts_supplier_relationship
    scalar_functions setops_customers setops_multiset unpivot_order_measures
    window_distribution_ranks window_first_last window_range_frame
    window_running_analytics window_topk_per_group
    """.split()
)

SF_DIR = "/root/testdata/sf0.001"


def test_registry_frozen_at_98_names():
    assert sorted(entry_mod.queries()) == FROZEN_QUERY_NAMES
    assert len(FROZEN_QUERY_NAMES) == 98


def test_every_oracle_key_has_a_query():
    q, o = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert o <= q, o - q
    # rows-only (no-oracle) set is deliberate and small; list it so any
    # accidental oracle drop shows up as a diff here, not driver-side
    assert sorted(q - o) == [
        "agg_approx_distinct",
        "agg_approx_percentiles",
        "doc_bpe_train_stats",
        "doc_minhash_near_dup",
        "doc_simhash",
        "embedding_cosine_near_dup_lsh",
        "embedding_cosine_topk_lsh",
        "embedding_cosine_topk_vectorized",
        "embedding_ivf_recall",
        "embedding_ivf_topk",
        "embedding_lsh_recall",
    ]


@pytest.mark.parametrize("name", FROZEN_QUERY_NAMES)
def test_plan_builds_and_schema_resolves(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0
    assert len(df.columns) == len(set(df.columns)), "duplicate output columns"
