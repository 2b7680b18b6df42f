"""Plan-shape assertions: the physical plans the engine relies on at
scale must not silently regress — pushdown reaching the scan, column
pruning, broadcast join selection, no Python in expression-only paths.
(SURVEY.md §4: these are the Catalyst-provided properties the design
depends on.)"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from etl_migrate_api_spark.plans.registry import QUERIES, _load_all

    _load_all()
    return QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_dir, queries):
    plan = _plan(queries["filter_sample_battery"].fn(spark, sf_dir))
    assert "GreaterThan(o_orderkey,10000)" in plan  # pushed to the scan
    # column pruning: only the 3 referenced columns are read
    assert "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string>" in plan


def test_q1_prunes_columns(spark, sf_dir, queries):
    plan = _plan(queries["q1_pricing_summary"].fn(spark, sf_dir))
    # 7 of 11 lineitem columns read, shipdate filter pushed
    assert "l_comment" not in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]
    assert "LessThanOrEqual(l_shipdate" in plan


def test_dim_joins_are_broadcast(spark, sf_dir, queries):
    for q in ("q3_shipping_priority", "q5_local_supplier_volume", "join_lookup_dim"):
        plan = _plan(queries[q].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_q5_region_filter_pushed_to_scan(spark, sf_dir, queries):
    """The r_name='ASIA' filter must reach the region parquet scan (it
    feeds a broadcast — filtering after broadcast would ship and probe
    the whole dim)."""
    plan = _plan(queries["q5_local_supplier_volume"].fn(spark, sf_dir))
    assert "EqualTo(r_name,ASIA)" in plan


def test_no_python_in_expression_paths(spark, sf_dir, queries):
    for q in (
        "contact_merge_fold",
        "llm_minhash_lsh_dedup",
        "llm_simhash_signatures",
        "llm_ann_bruteforce_topk",
        "llm_quality_score",
    ):
        plan = _plan(queries[q].fn(spark, sf_dir))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, q
        assert "MapInPandas" not in plan, q


def test_neardup_joins_are_prefiltered(spark, sf_dir):
    """The two formerly-quadratic operators must never join on the
    blocking key alone: candidates come from (blk, prefix-gram) /
    (blk, band) equi-joins, so a skewed block can't go O(n²)."""
    from etl_migrate_api_spark.operators.dedup import ngram_jaccard_pairs
    from etl_migrate_api_spark.operators.similarity import embedding_neardup_pairs
    from etl_migrate_api_spark.plans.llm_ops import planted_docs, planted_embeddings

    ng = ngram_jaccard_pairs(
        planted_docs(spark, sf_dir), block_col="source", n=3, threshold=0.3
    )
    plan = _plan(ng)
    assert "gram" in plan  # candidate join carries the prefix-token key
    ng.unpersist()

    emb = embedding_neardup_pairs(planted_embeddings(spark, sf_dir), threshold=0.95)
    plan = _plan(emb)
    assert "band_key" in plan  # candidate join carries the LSH band key
    emb.unpersist()


def test_curation_ops_plan_shapes(spark, sf_dir, queries):
    """The new curation family: no Python in any path; decontamination
    broadcasts the (small) eval side so the corpus never shuffles for
    the join; PII redaction is a pure projection with no exchange at
    all."""
    for q in (
        "llm_pii_redact",
        "llm_contamination_ngrams",
        "llm_quality_repetition",
        "llm_url_canonical_dedup",
        "llm_domain_mix_sample",
        "llm_embedding_quantize",
        "llm_sequence_pack",
    ):
        plan = _plan(queries[q].fn(spark, sf_dir))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, q
    contam = queries["llm_contamination_ngrams"].fn(spark, sf_dir)
    plan = _plan(contam)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the tokenizer must stay a materialized attribute BELOW the gram
    # lambda — inlined it would re-split the doc once per gram (the
    # measured 25x HOF-CSE trap)
    import re

    opt = contam._jdf.queryExecution().optimizedPlan().toString()
    assert not re.search(r"lambdafunction[^\n]*array_remove", opt)
    plan = _plan(queries["llm_pii_redact"].fn(spark, sf_dir))
    assert "Exchange" not in plan  # scan-speed projection


def test_spread_no_shuffle_when_already_parallel(spark):
    """_spread (the dedup family's projection barrier) must not pay a
    corpus-wide round-robin shuffle when the input already arrives in
    >= defaultParallelism splits (any real large scan) — there it plans
    a shuffle-free Repartition that still fences CollapseProject, so
    the materialized token-hash column is not inlined back into the
    64-bit-formula lambdas."""
    from pyspark.sql import functions as F

    from etl_migrate_api_spark.operators.dedup import simhash_df

    par = spark.sparkContext.defaultParallelism

    def docs(n_splits: int):
        return spark.range(0, 1000, 1, n_splits).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("some doc text "), F.col("id")).alias("text"),
        )

    wide = simhash_df(docs(par * 2))
    phys = wide._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in phys, phys[:2000]
    opt = wide._jdf.queryExecution().optimizedPlan().toString()
    # barrier held: md5 tokenization only BELOW the Repartition node,
    # never inlined into the bit-formula project above it
    above_barrier = opt.split("Repartition")[0]
    assert "Repartition" in opt and "md5" not in above_barrier, opt[:2000]

    # under-parallel inputs still get the real repartition (parallelism)
    narrow = simhash_df(docs(1))
    phys2 = narrow._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in phys2, phys2[:2000]


def test_topk_plans_take_ordered(spark, sf_dir, queries):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    plan = _plan(queries["order_limit_battery"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # no global (single-partition) sort anywhere in the battery
    assert "Exchange rangepartitioning" not in plan


def test_first_last_is_aggregate_not_window(spark, sf_dir, queries):
    """First/last-per-key runs as min_by/max_by hash aggregation — no
    per-key sort window in the plan."""
    plan = _plan(queries["window_first_last_per_key"].fn(spark, sf_dir))
    assert "min_by" in plan and "max_by" in plan
    assert "Window" not in plan


def test_merge_fold_single_shuffle(spark, sf_dir, queries):
    """The fold is one hash aggregate: exactly one exchange for the
    stateless variant (plus broadcast for the stateful join)."""
    plan = _plan(queries["contact_merge_fold"].fn(spark, sf_dir))
    n_exchanges = sum(
        "Exchange hashpartitioning" in line for line in plan.splitlines()
    )
    assert n_exchanges == 1, plan[:2000]


def test_interval_join_keeps_equi_key(spark, sf_dir, queries):
    """The interval attribution join must ride the user_id equi-key
    (hash or sort-merge join with the time range as a join filter) —
    never a nested-loop/cartesian, which at 100 TB is the difference
    between one shuffle and an O(n²) stage."""
    plan = _plan(queries["events_interval_attribution"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_hll_sketch_battery_bounds(spark, sf_dir, queries):
    """HLL estimates must sit within the lgK=12 error envelope of the
    exact counts, the merged (union) sketch must agree with the global
    exact, and a re-run must be bit-identical (sketches are
    deterministic for fixed input + lgK)."""
    fn = queries["agg_hll_sketch_battery"].fn
    rows = fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            3, 0.05 * r["exact_users"]
        )
        assert abs(r["approx_all"] - r["exact_all"]) <= max(3, 0.05 * r["exact_all"])
    again = fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_countmin_estimates_exact_here(spark, sf_dir, queries):
    """With width 2719 x depth 5 and a handful of keys, count-min point
    estimates must equal exact counts (the oracle's premise)."""
    from etl_migrate_api_spark.catalog import load

    got = {
        r["event_type"]: r["cm_count"]
        for r in queries["agg_countmin_counts"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, "events", sf_dir).groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == exact


def test_countmin_readout_bounded(spark):
    """Pointed at a 100k-distinct column, the read-out must ship only
    max_keys rows to the driver — and they must be the true heaviest
    keys (the cardinality guard from the r6 verdict)."""
    from pyspark.sql import functions as F

    from etl_migrate_api_spark.plans.etl_ops import countmin_counts

    n_hot, hot_reps = 20, 50
    df = spark.range(100_000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    hot = spark.range(n_hot * hot_reps).select(
        F.concat(F.lit("hot"), (F.col("id") % n_hot).cast("string")).alias("k")
    )
    out = countmin_counts(df.unionAll(hot), "k", max_keys=64).collect()
    assert len(out) == 64
    got_keys = {r["k"] for r in out}
    # every hot key (51 occurrences each) must beat the 100k singletons
    assert {f"hot{i}" for i in range(n_hot)} <= got_keys
    n_total = 100_000 + n_hot * hot_reps
    for r in out:
        if r["k"].startswith("hot"):
            # CM only over-counts, and at 100k keys collisions are the
            # norm — the guarantee is overcount <= eps * N (eps=0.001)
            assert hot_reps <= r["cm_count"] <= hot_reps + 0.001 * n_total


def test_span_dedup_c4_semantics(spark, sf_dir, queries):
    """Span dedup must actually drop repeated spans: fewer docs out than
    in (fully-boilerplate docs vanish), kept <= total per doc, and every
    surviving doc keeps at least one span."""
    from etl_migrate_api_spark.catalog import load

    out = queries["llm_span_dedup"].fn(spark, sf_dir).collect()
    n_docs = load(spark, "documents", sf_dir).count()
    assert 0 < len(out) < n_docs  # at least one all-duplicate doc vanished
    assert all(1 <= r["n_spans_kept"] <= r["n_spans_total"] for r in out)
    dropped = sum(r["n_spans_total"] - r["n_spans_kept"] for r in out)
    assert dropped > 0


def test_q6_all_predicates_pushed(spark, sf_dir, queries):
    """Q6 is the pushdown benchmark: every predicate must reach the
    lineitem parquet scan, and only the 4 referenced columns are read."""
    plan = _plan(queries["q6_forecast_revenue"].fn(spark, sf_dir))
    # the FileScan display truncates PushedFilters, so assert on the
    # scan-adjacent Filter node (same predicates, DataFilters mirrors it)
    for frag in (
        ">= 0.05)",
        "<= 0.07)",
        "< 24.0)",
        ">= 1997-01-01 00:00:00)",
        "< 1998-01-01 00:00:00)",
    ):
        assert frag in plan, frag
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: 4 of 11 lineitem columns read
    assert "l_orderkey" not in plan
    assert "l_returnflag" not in plan


def test_q19_disjunction_factored_to_scans(spark, sf_dir, queries):
    """Catalyst must factor the single-side implications of the
    OR-of-ANDs down to both scans: a brand IN-set on part and a
    quantity Or-filter on lineitem — the join must not see unfiltered
    inputs."""
    plan = _plan(queries["q19_disjunctive_predicates"].fn(spark, sf_dir))
    # lineitem side: the quantity disjunction is factored out and pushed
    # (appears in the scan-adjacent Filter and the PushedFilters Or-tree)
    assert "Or(Or(And" in plan
    q_filter = [ln for ln in plan.splitlines()
                if "Filter" in ln and "l_quantity" in ln]
    assert q_filter and "p_brand" not in q_filter[0]  # single-side only
    # part side: brand equalities and the size bound reach the part scan
    p_filter = [ln for ln in plan.splitlines()
                if "Filter" in ln and "p_brand" in ln]
    assert p_filter and "= Brand#1)" in p_filter[0]
    assert "(p_size" in p_filter[0]


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir, queries):
    plan = _plan(queries["q22_dormant_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    # the global-average scalar rides a broadcast, never a sort-merge
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q13_left_join_keeps_zero_bucket(spark, sf_dir, queries):
    """The priority predicate must stay INSIDE the left join (post-join
    filtering would delete the zero-order customers the histogram's
    zero bucket counts)."""
    plan = _plan(queries["q13_customer_order_distribution"].fn(spark, sf_dir))
    assert "LeftOuter" in plan
    df = queries["q13_customer_order_distribution"].fn(spark, sf_dir)
    assert df.where("c_count = 0").count() > 0


def test_q18_having_reduces_before_join(spark, sf_dir, queries):
    """The sum(qty) > 150 filter must apply to the aggregate BEFORE the
    orders join (the whole point of the shape: the reduced side drives
    the probe)."""
    lines = _plan(queries["q18_large_orders"].fn(spark, sf_dir)).splitlines()
    i_filter = next(
        i for i, ln in enumerate(lines) if "Filter" in ln and "total_qty" in ln
    )
    # tree prints parents above children: the total_qty filter must sit
    # BELOW the first join (inside its build subtree, i.e. pre-join)...
    i_join = next(i for i, ln in enumerate(lines) if "Join" in ln)
    assert i_filter > i_join, "\n".join(lines[:12])
    # ...and apply DIRECTLY to the aggregate's output, not to join output
    assert "HashAggregate" in lines[i_filter + 1], lines[i_filter : i_filter + 2]


def test_window_queries_single_exchange(spark, sf_dir, queries):
    """events_scd2_history chains three same-spec windows — the plan
    must contain exactly ONE user_id exchange (Spark reuses the
    partitioning), and the native session_window plan likewise shuffles
    user_id once."""
    plan = _plan(queries["events_scd2_history"].fn(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") <= 1
    plan2 = _plan(queries["events_session_window_builtin"].fn(spark, sf_dir))
    assert "SessionWindow" in plan2 or "session_window" in plan2
    assert plan2.count("hashpartitioning(user_id") <= 1


def test_hopping_window_no_self_join(spark, sf_dir, queries):
    """The 2-windows-per-event expansion must be a narrow projection
    (explode of the window array), never a join."""
    plan = _plan(queries["events_hopping_window"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert "Expand" in plan or "Generate" in plan or "explode" in plan


def test_dataset_card_single_scan_one_expand(spark, sf_dir, queries):
    """All per-source stats (two count-distincts included) in ONE scan
    and ONE Expand — not a scan per statistic."""
    plan = _plan(queries["llm_dataset_card"].fn(spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert plan.count("Expand") == 1


def test_grouping_sets_one_expand_one_exchange(spark, sf_dir, queries):
    """Three aggregation granularities: one scan, one Expand, one
    shuffle — never three separate aggregate jobs."""
    plan = _plan(queries["agg_grouping_sets"].fn(spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1


def test_ordered_funnel_single_user_day_exchange(spark, sf_dir, queries):
    """The three stage-dependent windows CANNOT merge into one node
    (each reads the previous one's output) but must all ride ONE
    (user_id, day) exchange — the chained-same-spec-window guarantee
    the docstring claims."""
    plan = _plan(queries["events_ordered_funnel"].fn(spark, sf_dir))
    assert plan.count("Window [") == 3
    assert plan.count("hashpartitioning(user_id") == 1


def test_dsir_bucket_join_broadcast_and_pruned(spark, sf_dir, queries):
    """DSIR's 4096-row bucket-weight table must broadcast onto the gram
    stream (never shuffle the corpus side), the documents scan must
    read only the 3 referenced columns, and the final top-k must be
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    plan = _plan(queries["llm_dsir_sample"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    read = plan.split("ReadSchema")[-1]
    assert "text" in read and "n_chars" not in read and "source" not in read


def test_pagerank_iterations_stay_broadcast(spark, sf_dir, queries):
    """Every power-iteration join of the 50-row rank table onto edges
    must be broadcast — a SortMergeJoin here would re-shuffle the edge
    table once per iteration. Pure column arithmetic: no Python."""
    plan = _plan(queries["graph_pagerank_hosts"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_global_shuffle_has_no_global_sort(spark, sf_dir, queries):
    """The whole point: 16 independent per-shard sorts (hash exchange +
    within-partition sort), never a rangepartitioning global sort."""
    plan = _plan(queries["llm_global_shuffle"].fn(spark, sf_dir))
    assert "rangepartitioning" not in plan
    assert "hashpartitioning" in plan


def test_quantile_battery_single_exchange(spark, sf_dir, queries):
    """Window and aggregate share the 'source' key: one shuffle total
    (the groupBy reuses the window's partitioning)."""
    plan = _plan(queries["agg_quantile_battery"].fn(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan


def test_sq8_scoring_is_arrow_batched(spark, sf_dir, queries):
    """SQ8 encode + score are vectorized pandas UDFs (ArrowEvalPython),
    never row-at-a-time BatchEvalPython."""
    plan = _plan(queries["llm_ann_sq8_topk"].fn(spark, sf_dir))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_bm25_broadcasts_and_takes_ordered(spark, sf_dir, queries):
    """BM25's idf/stats sides broadcast (3 and 1 rows), the top-k is
    TakeOrderedAndProject, and nothing falls back to a sort-merge join
    or Python."""
    plan = _plan(queries["llm_bm25_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_selection_pipeline_gate_pushed_to_scan(spark, sf_dir, queries):
    """The capstone's length gate must reach the parquet scan — the
    'cheapest filter first' claim of its docstring."""
    plan = _plan(queries["llm_selection_pipeline"].fn(spark, sf_dir))
    assert "GreaterThanOrEqual(n_chars,100)" in plan
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan


def test_triangle_count_joins_stay_broadcast_no_python(spark, sf_dir, queries):
    """The 50-host edge table broadcasts through all three self-joins;
    pure integer expressions, no Python anywhere."""
    plan = _plan(queries["graph_triangle_count"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_transition_matrix_single_user_window_exchange(spark, sf_dir, queries):
    """One per-user window shuffle + the small pair aggregate — never a
    global sort."""
    plan = _plan(queries["events_transition_matrix"].fn(spark, sf_dir))
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(user_id" in plan
    assert "EvalPython" not in plan


def test_representative_queries_no_cartesian_and_bounded_output(
    spark, sf_dir, queries
):
    """The representative-assignment queries are the near-dup family's
    scale-safe output: their final corpus-key join must be a hash/
    broadcast equi-join (never a nested-loop/cartesian — the whole
    point is escaping O(cluster²)), and the output is structurally one
    row per doc (left join on unique component labels)."""
    from etl_migrate_api_spark.plans.llm_ops import planted_docs

    n_docs = planted_docs(spark, sf_dir).count()
    for q in ("llm_simhash_representatives", "llm_minhash_representatives"):
        df = queries[q].fn(spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert df.count() == n_docs, q


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_dir):
    """Scale posture: when a selective dim filter feeds a NON-broadcast
    join (the 100 TB fact-fact case — SMJ forced here by disabling
    broadcast), Spark's runtime bloom filter must be injected on the
    fact side so the shuffle carries only possibly-matching rows. The
    size thresholds are scaled down to the test data (at real scale the
    defaults — 10 MB creation side, 10 GB application side — trigger on
    their own); the assertion is that the plumbing is ON and the
    predicate lands next to the fact scan."""
    import pyspark.sql.functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "0"
    )
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and it still computes the right thing
        rows = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        assert set(rows) == {"1-URGENT"} and rows["1-URGENT"] > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"
        )
