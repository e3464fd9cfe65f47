"""Physical-plan audits: the 100 TB hygiene checks.

Asserts what .explain must show for the headline queries: predicate
pushdown into the Parquet scan, column-pruned read schemas, broadcast
joins for small dimensions, no cartesian products on the hot paths,
and whole-stage codegen coverage.
"""

import pytest

from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
    relational as R,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(R.s1_scan_filter_project(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    # only the 3 projected columns reach the scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_of(R.q1_pricing_summary(spark, sf_dir))
    # partial (map-side) + final hash aggregation pair
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q5_broadcasts_small_dims(spark, sf_dir):
    plan = plan_of(R.q5_region_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(R.o1_topk_latest(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # not a global Sort


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = plan_of(R.join_semi_big_spenders(spark, sf_dir))
    anti = plan_of(R.join_anti_never_ordered(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti
    assert "CartesianProduct" not in semi + anti


def test_broadcast_hint_respected(spark, sf_dir):
    plan = plan_of(R.join_broadcast_brand_stats(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    df = R.q1_pricing_summary(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans in plan text
    assert "*(1)" in plan and "*(2)" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must be window-based: exactly one Exchange for
    the union (plus AQE reads), and no join operator at all."""
    plan = plan_of(R.asof_click_purchase(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_merge_prunes_partitions(spark, tmp_path):
    """MERGE rewrite reads only touched files (file-scoped COW)."""
    from pyspark.sql import types as T

    from medallion_architecture_using_apache_iceberg_table_buckets_spark.lakehouse import (
        Catalog,
        merge_into,
    )

    schema = T.StructType.fromDDL("id long, v string, part string")
    cat = Catalog(tmp_path / "wh")
    t = cat.create_table("d", "t", schema, partition_by=["part"])
    t.append(
        spark.createDataFrame(
            [(i, "x", f"p{i % 4}") for i in range(100)], schema
        )
    )
    before = t.current_snapshot().files
    # touch only part p0
    merge_into(
        spark,
        t,
        spark.createDataFrame([(0, "updated", "p0")], schema),
        on="id",
    )
    snap = t.current_snapshot()
    untouched = [f for f in before if "part=p0" not in f]
    assert set(untouched) <= set(snap.files)
    assert all("part=p0" in f for f in snap.removed_files)


def test_edit_distance_pairs_never_joins_all_pairs(spark, sf_dir):
    """The candidate join must be an equi-join on (gram, occ); the
    only nested-loop join allowed is the closed both-short fallback
    (its inputs are filtered to len < 8)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    plan = plan_of(L.string_distance_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # exactly one BNLJ: the short-string fallback
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_embedding_lsh_pairs_is_bucket_equi_join(spark, sf_dir):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    plan = plan_of(L.dedup_embedding_lsh_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan  # candidate join keyed on the LSH bucket


def test_ann_lsh_and_ivf_no_cartesian_on_corpus(spark, sf_dir):
    """The corpus side must join candidates on a key (bucket /
    centroid), never nested-loop against the whole query set. (The
    query-side crossJoin with broadcast centroids is fine: it is
    |queries| x n_centroids, both tiny.)"""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    lsh = plan_of(L.ann_lsh_topk(spark, sf_dir))
    assert "CartesianProduct" not in lsh
    assert "bucket" in lsh


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-bucketed + sorted layout must plan a SortMergeJoin with
    neither Exchange nor Sort on either side (the one-time layout
    cost replacing the per-query fact-fact shuffle)."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        bucketed as B,
        relational as R,
    )

    orders = R.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = R.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    B.write_bucketed(
        orders, "b_orders", "o_orderkey", n_buckets=8,
        path=tmp_path / "b_orders",
    )
    B.write_bucketed(
        li, "b_lineitem", "o_orderkey", n_buckets=8,
        path=tmp_path / "b_lineitem",
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        B.assert_no_exchange(joined)
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # (the per-bucket Sort remains: propagating sorted-bucket
        # order is legacy-gated in Spark 3+ —
        # spark.sql.legacy.bucketedTableScan.outputOrdering; the
        # shuffle elimination is the property that matters at scale)
        # and the result is right
        assert joined.count() == R.load(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_range_join_is_equi_join(spark, sf_dir):
    """The bin-bucketed interval join must plan as an EQUI-join on
    (event_type, _bkt) — not the BroadcastNestedLoopJoin Spark plans
    for a raw inequality join."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    plan = plan_of(L.range_join_incidents(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_curation_ops_plan_shapes(spark, sf_dir):
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    # quality filter: map-only — no Exchange anywhere in the plan
    plan = plan_of(L.text_quality_filter(spark, sf_dir))
    assert "Exchange" not in plan
    # chunking: explode is the only expansion; still no shuffle
    plan = plan_of(L.text_chunk_windows(spark, sf_dir))
    assert "Exchange" not in plan and "Generate" in plan
    # hash sampling: pure filter pushed onto the scan stage, no shuffle
    plan = plan_of(L.sample_hash_events(spark, sf_dir))
    assert "Exchange" not in plan
    # z-order key: projection only, inside whole-stage codegen
    # ('*(n)' prefixes mark codegen spans in plan text)
    plan = plan_of(L.zorder_cluster_events(spark, sf_dir))
    assert "Exchange" not in plan and "*(1)" in plan
    # tf-idf: the df and N sides must broadcast (never shuffle the
    # term table against the corpus-sized tf table)
    plan = plan_of(L.text_tfidf_topk(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N scalar
    assert "CartesianProduct" not in plan
    # packing: exactly one shuffle — the shard-key window
    plan = plan_of(L.pack_training_sequences(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_sweep_plan_shapes(spark, sf_dir):
    """Round-3 TPC-H sweep: the shapes that would melt at 100 TB if
    Catalyst fell back to a nested loop or a full sort."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    # q19: OR-of-ANDs must stay an equi hash join on partkey with the
    # disjunction as a residual — never a cartesian/nested loop
    q19 = plan_of(R.q19_disjunctive_predicates(spark, sf_dir))
    assert "CartesianProduct" not in q19
    assert "BroadcastNestedLoopJoin" not in q19

    # q4: EXISTS compiles to a left-semi join (no distinct/aggregate
    # dedup of the probe side)
    q4 = plan_of(R.q4_priority_late_exists(spark, sf_dir))
    assert "LeftSemi" in q4

    # q21: EXISTS + NOT EXISTS = semi + anti on the same driving rows
    q21 = plan_of(R.q21_waiting_supplier(spark, sf_dir))
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    assert "CartesianProduct" not in q21

    # q22: the 1-row threshold aggregate joins in as a broadcast, and
    # the dormancy date filter pushes into the orders scan
    q22 = plan_of(R.q22_dormant_customers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in q22 or "BroadcastHashJoin" in q22
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in q22

    # q17: both the part filter and the per-part stats ride broadcast
    # joins; one wide exchange total (the per-part aggregation)
    q17 = plan_of(R.q17_small_quantity_revenue(spark, sf_dir))
    assert q17.count("BroadcastHashJoin") >= 2

    # decontamination: the benchmark shingle set is broadcast — the
    # training side is never shuffled by shingle for the probe
    dec = plan_of(L.text_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in dec
    assert "CartesianProduct" not in dec


def test_brute_baselines_are_the_only_all_pairs_plans(spark, sf_dir):
    """Registry-wide fence: the two labeled correctness baselines
    (dedup_embedding_pairs_brute, ann_bruteforce_topk) are the ONLY
    queries allowed an all-pairs join (CartesianProduct, or a
    BroadcastNestedLoopJoin whose broadcast side is data-sized). A
    1-row-scalar BNLJ (count/threshold/percentile broadcast) is fine
    at any scale and stays allowed; everything else must candidate-
    generate through an equi-join. Guards against a future edit
    silently reintroducing an O(n^2) plan under a scale-safe name.

    Sweeps every side-effect-free registry query (lakehouse/streaming
    queries execute writes at DataFrame-construction time and carry
    their own plan tests above).
    """
    import __spark_entry__ as entrymod

    CARTESIAN_OK = {"dedup_embedding_pairs_brute", "ann_bruteforce_topk"}
    # BNLJ with a deliberately tiny broadcast side:
    #  - the two _brute baselines (whole-corpus broadcast BY DESIGN)
    #  - string_distance_pairs: closed both-short fallback (len < 8)
    #  - text_tfidf_topk / q22 / q15 / q17 / subquery_max_order /
    #    text_quality_percentile_cut: 1-row scalar aggregate joins
    BNLJ_OK = CARTESIAN_OK | {
        "string_distance_pairs",
        "text_tfidf_topk",
        "q22_dormant_customers",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "subquery_max_order",
        "text_quality_percentile_cut",
        "sketch_quantiles",
        # q11: 1-row national-total aggregate broadcast back as the
        # HAVING threshold (q15 pattern)
        "q11_important_part_value",
        # RFM: the 1-row corpus-max-date aggregate broadcast onto the
        # user frame for recency derivation (q15/subquery_max_order
        # pattern — scalar-sized by construction); the quintile cuts
        # themselves are fence-checked partitioned windows
        # (test_rfm_ntile_windows_are_partitioned)
        "events_rfm_segments",
        # data card: 1-row corpus-total broadcast for the shares
        "corpus_data_card",
        # theta set ops: 1-row sketch-estimate row broadcast onto the
        # 1-row exact aggregate — scalar-sized by construction
        "sketch_theta_set_ops",
        # mixture weights: 1-row corpus-total broadcast for the
        # shares (corpus_data_card pattern)
        "corpus_mixture_weights",
        # PQ: the 1-row seeding-step scalar broadcast (the IVF
        # pattern); every data-sized join is a keyed equi-join on
        # (subspace, code) / vec_id
        "ann_pq_topk",
        # IVF-PQ: the same 1-row seeding-step scalar plus the
        # n_centroids-row probe broadcast (the ann_ivf/ann_pq
        # patterns composed); ADC scoring and rerank are keyed
        # equi-joins on (query_id, subspace, code) / vec_id
        "ann_ivfpq_topk",
        # bigram LM: the 1-row vocabulary-size scalar broadcast onto
        # the scored bigram stream; gram-count joins are keyed
        # equi-joins on (w1, w2) / w1
        "text_ngram_lm_score",
        # BM25: the 1-row (N, sum_dl) corpus-stats scalar broadcast;
        # tf/idf joins are keyed equi-joins on term / doc_id
        "text_bm25_topk",
        # hybrid fusion: inherits BM25's 1-row stats broadcast and
        # IVF-PQ's seeding scalar; the fusion itself is a keyed
        # full-outer join of two k-sized lists
        "hybrid_bm25_ann_topk",
        # hard-negative mining: the same two branches as hybrid
        # fusion (BM25 stats scalar + IVF-PQ seeding scalar); the
        # mining is a left-anti join of two k-sized lists
        "retrieval_hard_negatives",
        # residual IVF-PQ: same 1-row seeding-step scalar +
        # centroid-count broadcasts as ann_ivfpq_topk; the residual
        # qc/cross tables are nprobe- and codebook-sized broadcasts
        "ann_ivfpq_residual_topk",
        # IVF-SQ8: the same IVF seeding scalar + centroid broadcasts;
        # scoring is a keyed centroid_id equi-join of codes to the
        # broadcast probe set
        "ann_ivfsq_topk",
        # CCNet buckets: inherits ngram-LM's 1-row vocabulary scalar;
        # tercile bounds join is a keyed broadcast on predicted_lang
        "curation_ccnet_buckets",
        # unigram-LM tokenizer: the 1-row probability-mass total
        # broadcast (_logp_micro); the Viterbi E-step is a map-only
        # broadcast-model pandas_udf stage (no DP joins since the
        # r7 rewrite)
        "tokenizer_unigram_vocab",
        # DoReMi reweighting: 1-row corpus-totals and 1-row
        # weight-sum normalizer broadcasts onto the source-count
        # frame; the only data-sized joins are the LM stream's
        # keyed gram equi-joins
        "sample_doremi_mixture",
        # Naive Bayes: the |classes|-row class frame (priors +
        # token totals) and 1-row vocabulary scalar broadcast onto
        # the occurrence stream; the count join is a keyed
        # (word, class) equi-join
        "curation_nb_classifier",
        # sparse retrieval: the 1-row corpus-count scalar broadcast
        # (the tfidf pattern); posting joins are keyed on term /
        # doc_id against the persisted index
        "text_sparse_retrieval_topk",
        # DSIR: the 1-row target/raw-totals scalar broadcast onto the
        # 1024-row model table; doc scoring is a keyed bucket
        # equi-join
        "sample_dsir_selection",
        # Kneser-Ney: the 1-row bigram-type-total scalar broadcast;
        # all count joins are keyed gram equi-joins (the
        # text_ngram_lm_score pattern)
        "text_kn_lm_score",
        # NDV sketch: the 1-row register-union estimate broadcast
        # onto the 1-row exact aggregate — scalar-sized by
        # construction (the sketch_theta_set_ops pattern)
        "metadata_ndv_sketch",
        # temperature mixture: 1-row corpus-total and 1-row
        # normalizer broadcasts onto the per-source count frame
        # (the corpus_mixture_weights pattern)
        "sample_temperature_mixture",
        # index health: the 1-row (total, buckets-used) scalar
        # broadcast onto the <=256-row occupancy frame
        "ann_index_health",
        # range search: the 10-row probe set broadcast over ONE
        # corpus scan (the cosine_topk probe pattern with the
        # threshold as the selection — not all-pairs: the broadcast
        # side is the fixed probe list)
        "ann_range_search",
        # Heaps curve: the 10-row cutoff list (from the 1-row
        # max-id scalar) broadcast onto the word/doc frames via
        # inequality — fan-out <= 10 per row by construction
        "corpus_heaps_law",
        # LSH recall audit: the crossJoin of TWO 1-row count
        # aggregates (n_exact x n_lsh) — scalar-sized by
        # construction (the sketch_theta_set_ops pattern); both
        # pair generators underneath are the fenced banded/blocked
        # equi-joins
        "dedup_lsh_recall",
        # TV drift: the 1-row grand-total broadcast onto the
        # per-source frame (the corpus_data_card pattern); the
        # term join is a keyed equi-join on tok
        "text_source_divergence",
        # token budget: the 1-row budget scalar broadcast onto the
        # ranked cumsum frame (the q15/q11 threshold pattern)
        "corpus_token_budget",
        # margin mining: the 10-row probe shard broadcast over ONE
        # b-side scan (the ann_range_search probe pattern — the
        # broadcast side is the bounded probe list, never the
        # corpus); neighborhood sums and the final ranking are
        # keyed windows / equi-joins on query_id / match_id
        "mine_bitext_margin",
        # incremental BM25: text_bm25_topk's 1-row stats scalar,
        # twice (stored history stats x batch stats, merged by a
        # 1-row x 1-row cross join); index joins stay keyed
        "retrieval_incremental_bm25",
    }
    # Queries whose construction performs writes/iterative jobs; their
    # plan hygiene is asserted by dedicated tests.
    SIDE_EFFECTING_PREFIXES = (
        "medallion_", "sql_", "incremental_", "mor_", "schema_",
        "maintenance_", "streaming_", "catalog_", "zorder_",
        # round-5 lakehouse surface queries build temp tables / run
        # driver-side iterations; their plan hygiene has dedicated
        # tests (test_position_deletes, test_bloom_index,
        # test_partition_evolution, test_sort_order_metadata, bpe)
        "position_", "bloom_", "write_ordered_", "partition_", "bpe_",
    )
    # ann_recall_at_k embeds BOTH the fenced brute ground truth (an
    # intentional all-pairs baseline) and the IVF iterative seeding —
    # its job is to measure the approximate variants against them
    SKIP = {
        "dedup_components",
        # same iterative min-label closure as dedup_components, fed by
        # the winnowing pair graph instead of MinHash
        "dedup_winnowing_components",
        # closes the history graph once, then the contracted batch
        # graph — two iterative closures (dedup_components class)
        "dedup_incremental_components",
        # same composition, delta output mode: the history relabel is
        # an inner join against the broadcast changed-labels remap
        "dedup_incremental_delta",
        "ann_ivf_topk",
        "curation_end_to_end",
        "ann_recall_at_k",
        # incremental IVF maintenance: the same ivf_centroids seeding
        # scalar + n_centroids-row codebook broadcasts as ann_ivf_topk
        # (twice — stale and fresh); the only data-sized joins are the
        # vec_id equi-joins merging the two assignments
        "ann_incremental_ivf_append",
        # same plan family, refresh retrained on the 1-in-4 history
        # sample plus the batch
        "ann_incremental_ivf_sampled",
        # embeds the ivf_centroids seeding (scalar/centroid-count
        # broadcast crossJoins) like ann_ivf_topk; its candidate
        # generation is the centroid_id equi-join, asserted by
        # test_semantic_dedup_plan_is_cluster_scoped
        "dedup_semantic",
        # embeds the fenced brute scorer once per truncation dim BY
        # DESIGN (recall evaluation, like ann_recall_at_k)
        "ann_matryoshka_recall",
    }

    offenders = {}
    for name, fn in entrymod.queries().items():
        if name in SKIP or name.startswith(SIDE_EFFECTING_PREFIXES):
            continue
        plan = plan_of(fn(spark, sf_dir))
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, f"all-pairs plan outside the fence: {offenders}"

    # and the baselines themselves still ARE all-pairs (label honesty)
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    brute_dedup = plan_of(L.dedup_embedding_pairs_brute(spark, sf_dir))
    brute_ann = plan_of(L.ann_bruteforce_topk(spark, sf_dir))
    assert ("CartesianProduct" in brute_dedup
            or "BroadcastNestedLoopJoin" in brute_dedup)
    assert ("CartesianProduct" in brute_ann
            or "BroadcastNestedLoopJoin" in brute_ann)


def test_semantic_dedup_plan_is_cluster_scoped(spark, sf_dir):
    """SemDeDup's candidate generation must be the centroid_id
    equi-join: the only BNLJ/cross shapes allowed are the tiny
    centroid/scalar broadcasts the IVF quantizer uses (bounded by
    n_centroids=16 rows), never a corpus-sized side."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    plan = plan_of(L.dedup_semantic(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the intra-cluster pair join shows up as a real equi-join
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_keyless_range_join_is_equi_join(spark, sf_dir):
    """Bucket expansion with NO equi keys (the bucket column is the
    entire join key) must still plan as a hash/sort-merge join — the
    raw keyless inequality join would be a pure cross product."""
    plan = plan_of(R.range_join_event_windows(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_ltv_deciles_window_is_partitioned(spark, sf_dir):
    """The r9-verdict scale fix: the user-cardinality decile cut must
    NOT run an unpartitioned ntile/row_number window (single-partition
    exchange over one-row-per-user). The distributed-rank rewrite
    keeps the user-frame window partitioned by pid; the only
    unpartitioned window allowed is the per-shuffle-partition counts
    frame (<= spark.sql.shuffle.partitions rows)."""
    plan = plan_of(R.events_user_ltv_deciles(spark, sf_dir))
    assert "ntile" not in plan
    # the user-frame rank window is partitioned by the range pid
    rn_lines = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert rn_lines, "expected a row_number window in the plan"
    for ln in rn_lines:
        assert "], [pid#" in ln, f"unpartitioned rank window: {ln}"
    # the global sort is a distributed range partitioning, not a
    # single-partition funnel of the user frame
    assert "rangepartitioning(rev" in plan


def test_token_budget_windows_are_partitioned(spark, sf_dir):
    """The token-budget selection's document-cardinality cumsum runs
    inside a pid-PARTITIONED window (the LTV distributed-rank
    machinery applied to a cumulative measure); the only
    unpartitioned window allowed is the <= #shuffle-partitions
    offsets frame, and the global order arrives via a distributed
    range partitioning, never a single-partition funnel."""
    from medallion_architecture_using_apache_iceberg_table_buckets_spark.operators import (
        llm_queries as L,
    )

    plan = plan_of(L.corpus_token_budget(spark, sf_dir))
    sum_lines = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln.lower() and "n_tokens" in ln
    ]
    assert sum_lines, "expected the cumulative token window in the plan"
    for ln in sum_lines:
        assert "pid#" in ln, f"unpartitioned doc-cardinality window: {ln}"
    assert "rangepartitioning(q" in plan or "rangepartitioning(n_distinct" in plan


def test_rfm_ntile_windows_are_partitioned(spark, sf_dir):
    """The RFM scorecard runs THREE user-cardinality quintile cuts —
    each must go through the distributed-rank machinery (pid-
    partitioned row_number over a range exchange), never an
    unpartitioned ntile/window funnel of the user frame."""
    plan = plan_of(R.events_rfm_segments(spark, sf_dir))
    assert "ntile" not in plan
    rn_lines = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert rn_lines, "expected row_number windows in the plan"
    for ln in rn_lines:
        assert "], [_pid#" in ln, f"unpartitioned rank window: {ln}"
    assert "rangepartitioning" in plan
