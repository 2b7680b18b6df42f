"""The round driver builds its OWN vanilla SparkSession and calls the
__spark_entry__ contract with it — none of session.py's confs are
pre-applied. ensure_engine_confs (wrapped around every registry entry)
must make that work, including the ns-timestamp parquet reads that
throw without nanosAsLong. Run in a subprocess: the in-process test
session already carries the tuned confs, so it can't exercise this."""

from __future__ import annotations

import subprocess
import sys

_DRIVER_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla-driver")
    .getOrCreate()
)
import __spark_entry__ as e

# vanilla default — the repaired-session regression below depends on it
assert spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"

df = e.entry(spark)
assert df.count() > 0, "entry() empty"

qs = e.queries()
# events carries TIMESTAMP(NANOS) parquet — reads throw on a vanilla
# session unless the registry wrapper applied the legacy conf
n = qs["events_extract_battery"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "events read failed"
n = qs["llm_token_stats"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "llm query failed"
# r9 driver red: a vanilla session defaults to INT96 parquet timestamps,
# which carry NO min/max footer stats — zone maps on o_orderdate vanish
# and the prune assert inside this query fires ("kept 7 of 7"). The
# registry wrapper must force TIMESTAMP_MICROS before any engine write.
n = qs["orders_zonemap_pruned_scan"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "zonemap prune failed on a vanilla session"
# same failure class, other direction: format roundtrips write + read
# timestamps under the driver's session — must survive vanilla defaults
n = qs["orders_orc_roundtrip"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "orc roundtrip failed on a vanilla session"
# the gate-bound STREAMING query: availableNow micro-batches +
# foreachBatch index writes must run under the driver's own session
n = qs["llm_bm25_stream_index"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "streamed-index bm25 failed on a vanilla session"
# r11 first-timers: the one query with zero driver evidence (WAV
# decode over binary rows) and the round's heaviest new twin (writes
# a pinned index layout under the driver's session) — both must
# survive vanilla defaults BEFORE their first real driver row
n = qs["llm_multimodal_audio"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "multimodal audio failed on a vanilla session"
n = qs["llm_ann_kmeans_micro"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "kmeans_micro failed on a vanilla session"
# r15 rotation spot-checks (VERDICT r14 item 3): one query per
# re-entering family — the r09 remainder's fusion/rerank/stats/
# events/orders picks and a r10-cohort twin — prove they still run
# on vanilla defaults BEFORE the driver re-rows them
n = qs["llm_rrf_fusion"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "rrf fusion failed on a vanilla session"
n = qs["llm_mmr_rerank"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "mmr rerank failed on a vanilla session"
n = qs["orders_bloom_point_lookup"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "bloom point lookup failed on a vanilla session"
n = qs["stats_corr_battery"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "corr battery failed on a vanilla session"
n = qs["events_gapfill_interpolate"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "gapfill interpolate failed on a vanilla session"
n = qs["llm_ann_sq8_adc"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "sq8 adc twin failed on a vanilla session"
assert set(e.oracle_sql()).issubset(set(qs))
print("CONTRACT-OK")
"""


def test_driver_window_is_50_unique_queries():
    """The driver gates only the first 50 queries() entries (registration
    order). That window must hold exactly DRIVER_WINDOW: 50 queries.
    Round 15 is steady-state rotation (VERDICT r14 item 1): the
    carriers + the 13-anchor §2 cover, the full 20-query r09 remainder,
    and 13 of the 16-query r10 cohort — raising the evidence base's age
    ceiling from r09 to r10. Every slot is oracled this round: the
    three inherently rows-only veterans rotated out with fresh r14
    rows, and two of their hash-gated twins (llm_ann_sq8_adc,
    llm_bpe_merges_restricted) are themselves in-window."""
    from etl_migrate_api_spark.plans.registry import (
        DRIVER_WINDOW,
        oracle_sql_map,
        query_map,
    )

    names = list(query_map())
    oracles = oracle_sql_map()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert names[:50] == list(DRIVER_WINDOW)
    # the r15 window is fully oracled — a rows-only slot sneaking in
    # (other than a declared twin-gated veteran) fails the suite
    rows_only = {n for n in names[:50] if n not in oracles}
    assert rows_only == set(), f"unexpected rows-only slots: {rows_only}"
    # the rotation cohort and the standing carriers must be in-window
    for q in (
        "llm_rrf_fusion",             # r09 remainder (VERDICT item 1)
        "llm_mmr_rerank",             # r09 remainder
        "llm_rag_context_pack",       # r09 remainder
        "orders_bloom_point_lookup",  # r09 remainder
        "orders_market_basket",       # r09 remainder
        "orders_wap_publish",         # r09 remainder
        "stats_corr_battery",         # r09 remainder
        "events_gapfill_interpolate", # r09 remainder
        "llm_ann_sq8_adc",            # r10 twin (gates llm_ann_sq8_topk)
        "llm_bpe_merges_restricted",  # r10 twin (gates llm_bpe_merges)
        "orders_zonemap_pruned_scan", # r10
        "orders_merge_upsert",   # K2 K3 (saveToPostgres.js:313-409)
        "orders_version_diff",   # K8 X3 (contactpoint.controller.js:181-196)
        "llm_jsonl_roundtrip",   # S1 (fetchContact.js:5-11)
        "orders_incremental_rollup",  # K7 (state write-back carrier)
    ):
        assert q in names[:50], f"{q} fell out of the driver window"
    # rotated-out queries must still be REGISTERED (coverage inventory +
    # rows-only pytest; each keeps its pytest oracle-parity check and a
    # green driver row from an earlier round). Some are back IN the r11
    # window as stale-evidence refreshes — membership anywhere is the
    # contract, the window order test above pins placement.
    for q in (
        "llm_ann_ivf_topk",
        "llm_multimodal_decode",
        "contact_phone_extract",
        "scalar_math_funcs",
        "date_arithmetic_battery",
        "set_ops_battery",
        "array_functions_battery",
        "map_functions_battery",
        "join_semi_exists_battery",
        "window_first_last_per_key",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q_daily_event_funnel",
        "llm_exact_dedup",
        "llm_lang_id",
        "llm_quality_score",
        "filter_sample_battery",
        "join_anti_new_keys",
        "q_top_customers_per_nation",
        "agg_nation_profile",
        "llm_token_stats",
        # rotated out in r8 (green r07 driver rows; multiply §2-covered)
        "llm_curation_pipeline",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "llm_dsir_sample",
        "agg_grouping_sets",
        "contact_merge_fold_stateful",
        "llm_unicode_normalize",
        "llm_span_dedup",
        "llm_minhash_lsh_dedup",
        "llm_minhash_incremental_dedup",
        "llm_simhash_neardup",
        "llm_ngram_jaccard_dedup",
        "llm_neardup_clusters",
        "llm_embedding_neardup",
        "llm_ann_bruteforce_topk",
        "llm_fuzzy_match_levenshtein",
        "llm_selection_pipeline",
        "llm_dataset_card",
        "events_ordered_funnel",
        "llm_contamination_ngrams",
        "llm_quality_repetition",
        "llm_url_canonical_dedup",
        "llm_domain_mix_sample",
        "llm_embedding_quantize",
        "llm_sequence_pack",
        "llm_stratified_sample",
        "events_hopping_window",
        "events_interval_attribution",
        "window_rank_battery",
        "window_range_frame_trailing",
        "subquery_correlated_avg",
        "q13_customer_order_distribution",
        "events_sessionize",
        "events_asof_join",
        "join_null_safe_eq",
        "graph_pagerank_hosts",
        "llm_tfidf_keywords",
        # rotated out in r9 (green r08 driver rows; multiply §2-covered)
        "q4_order_priority",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q10_returned_revenue",
        "q12_priority_shipping",
        "q14_promo_revenue",
        "q18_large_orders",
        "q19_disjunctive_predicates",
        "q21_waiting_suppliers",
        "q22_dormant_customers",
        "agg_quantile_battery",
        "agg_countmin_counts",
        "llm_bm25_search",
        "llm_mixture_epochs",
        "llm_cdc_chunk_dedup",
        "llm_global_shuffle",
        "llm_split_assign",
        "llm_fixed_k_group_sample",
        "llm_chunk_windows",
        "llm_span_dedup_incremental",
        "llm_winnow_fingerprints",
        "llm_unigram_logprob_score",
        "llm_hard_negative_mining",
        "llm_contrastive_triplets",
        "graph_kcore_hosts",
        "graph_triangle_count",
        "events_scd2_history",
        "events_retention_cohorts",
        "events_transition_matrix",
        "events_session_window_builtin",
        "orders_rfm_segmentation",
        "profile_orders_columns",
        "llm_ann_sq8_topk",
        "llm_bpe_merges",
        "llm_image_phash_dedup",
        "diff_orders_snapshots",
    ):
        assert q in names, f"{q} missing from the registry"


def test_no_survey_item_orphaned_by_window_rotation():
    """Every SURVEY §2 item that is covered by ANY registered query must
    keep at least one carrier inside the driver's 50-slot window — the
    r4 rotation may not trade the curation family's driver rows for a §2
    item's only hard-gate check. Items with no registry carrier at all
    (infrastructure verified in pytest: S1, K-sinks, X-txn, …) are out of
    scope here; gen_coverage.py documents their homes."""
    from etl_migrate_api_spark.plans.registry import (
        DRIVER_WINDOW,
        QUERIES,
        _load_all,
    )

    # The r8-era S1/K2/K3/X3 exemption is RETIRED: the r9 window leads
    # with their carriers (llm_jsonl_roundtrip, orders_merge_upsert,
    # orders_wap_publish, orders_version_diff), so every §2 item with a
    # registry carrier now has an in-window one — no exceptions.
    _load_all()
    window = set(DRIVER_WINDOW)
    by_ref: dict[str, set[str]] = {}
    for name, spec in QUERIES.items():
        for ref in spec.survey_refs:
            by_ref.setdefault(ref, set()).add(name)
    orphaned = {
        ref: sorted(carriers)
        for ref, carriers in by_ref.items()
        if not carriers & window
    }
    assert not orphaned, f"§2 items with no in-window carrier: {orphaned}"


def test_vanilla_session_driver_contract():
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT-OK" in out.stdout
