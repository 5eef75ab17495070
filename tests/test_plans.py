"""Physical-plan tests: the plans we'd want at 100 TB, pinned at test SF.

SURVEY.md §4: predicate pushdown, column pruning, broadcast semi-join
for the red-link removal, TakeOrderedAndProject for top-k — all the
things the reference hand-codes (or gets wrong, like its single-reducer
job) must come out of Catalyst in the shapes that scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark import queries as Q
from pagerank_hadoop_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema_only,
    assert_take_ordered,
    assert_whole_stage_codegen,
    count_exchanges,
    formatted_plan,
)


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    df = Q.queries()["pricing_summary"](spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")
    assert_read_schema_only(
        df,
        {
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        },
    )
    assert_whole_stage_codegen(df)


def test_topk_orders_uses_heap_not_global_sort(spark, sf_dir):
    df = Q.queries()["topk_orders"](spark, sf_dir)
    assert_take_ordered(df)


def test_semi_join_broadcasts_small_side(spark, sf_dir):
    df = Q.queries()["semi_join_parts"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert_broadcast_join(df)


def test_region_revenue_broadcasts_dims_no_cartesian(spark, sf_dir):
    df = Q.queries()["region_revenue"](spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_column_pruning_on_projection(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select("l_orderkey")
    assert_read_schema_only(df, {"l_orderkey"})


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # groupBy must plan partial (map-side) + final hash aggregate —
    # the free replacement for the reference's combiner HashSet
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c"))
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    df = Q.queries()["cosine_topk"](spark, sf_dir)
    assert_broadcast_join(df)


def test_pagerank_iteration_reuses_adjacency_exchange(spark):
    # the static adjacency must not be recomputed or re-shuffled every
    # iteration: each iteration's join reads a materialized partitioned
    # adjacency — the id-partitioned cache (InMemoryTableScan) for big
    # graphs, or the right-sized localCheckpoint (Scan ExistingRDD)
    # that replaces it for graphs far smaller than the session's
    # shuffle partitioning
    from pagerank_hadoop_spark.operators import pagerank

    edges = spark.createDataFrame(
        [(str(i), str((i * 7 + 1) % 50)) for i in range(200)],
        "src string, dst string",
    )
    ranks = pagerank(edges, n_iter=2)
    plan = formatted_plan(ranks)
    materialized = (
        "InMemoryTableScan" in plan
        or "TableCacheQueryStage" in plan
        or "Scan ExistingRDD" in plan
    )
    assert materialized, plan
    # and the raw edge scan must not appear once per iteration
    assert plan.count("LocalTableScan") <= 2, plan


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    from pagerank_hadoop_spark.sources.sinks import write_partitioned

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # pruning is observable: only the matching directory is scanned
    assert back.count() == ev.where(F.col("event_type") == "click").count()


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    from pagerank_hadoop_spark.sources.sinks import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed_table(orders, "t_orders_b", ["o_custkey"], 8)
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "t_cust_b", ["o_custkey"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(spark.table("t_cust_b"), "o_custkey")
        assert count_exchanges(j) == 0, formatted_plan(j)
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_salted_join_matches_plain_join(spark, sf_dir):
    from pagerank_hadoop_spark.operators.joins import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    salted = salted_join(orders, cust, "o_custkey", n_salts=4)
    plain = orders.join(cust, "o_custkey")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    with pytest.raises(ValueError):
        salted_join(orders, cust, "o_custkey", how="full")


def test_contamination_broadcasts_benchmark_keys(spark, sf_dir):
    """The 100 TB corpus side must never shuffle its grams: the
    benchmark key set is broadcast into a map-side semi-join."""
    from pagerank_hadoop_spark.operators.curation import contaminated_ids
    from pagerank_hadoop_spark.plans.checks import formatted_plan
    from pagerank_hadoop_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    plan = formatted_plan(contaminated_ids(corpus, bench))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_asof_join_single_key_shuffle(spark):
    """The merge-shape as-of join shuffles each side once on the key
    (one exchange per input + the window's) — and never plans a
    nested-loop or cartesian join."""
    from pagerank_hadoop_spark.operators.joins import asof_join
    from pagerank_hadoop_spark.plans.checks import count_exchanges, formatted_plan

    left = spark.createDataFrame([(1, 10, "p")], ["uid", "ts", "pid"])
    right = spark.createDataFrame([(1, 5, "c")], ["uid", "ts", "cid"])
    out = asof_join(left, right, "uid", "ts")
    plan = formatted_plan(out)
    assert "Join" not in plan  # pure union + window: no join operator at all
    assert count_exchanges(out) <= 2  # union inputs coalesce into the window shuffle


def test_range_join_is_equi_join(spark):
    """The bucketized band join must plan a hash/merge equi-join, not
    BroadcastNestedLoopJoin (Spark's plan for pure range predicates)."""
    from pagerank_hadoop_spark.operators.joins import range_join
    from pagerank_hadoop_spark.plans.checks import formatted_plan

    left = spark.createDataFrame([(1, 1000, "a")], ["uid", "lt", "lid"])
    right = spark.createDataFrame([(1, 1050, "x")], ["uid", "rt", "rid"])
    plan = formatted_plan(range_join(left, right, ["uid"], "lt", "rt", 0, 100))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_unpivot_plans_expand_single_scan(spark, sf_dir):
    """DataFrame.unpivot is one scan + Expand — not a UNION of scans."""
    from pagerank_hadoop_spark.plans.checks import formatted_plan
    from pagerank_hadoop_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount"], "measure", "val"
    )
    import re

    plan = formatted_plan(melted)
    assert "Expand" in plan
    # one scan node (each appears once in the tree and once in details)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_ship_priority_pushdown_broadcast_topk(spark, sf_dir):
    df = Q.queries()["ship_priority"](spark, sf_dir)
    # all three predicates reach the parquet scans; the segment-
    # filtered customer side broadcasts; top-10 is a heap, not a sort
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "c_mktsegment")
    assert_broadcast_join(df)
    assert_take_ordered(df)


def test_tfidf_broadcasts_vocabulary(spark, sf_dir):
    df = Q.queries()["tfidf_top_terms"](spark, sf_dir)
    # the vocabulary-sized document-frequency table must broadcast so
    # the corpus-sized term-count side never reshuffles for the join
    assert_broadcast_join(df)
    # only the two needed document columns are scanned
    assert_read_schema_only(df, {"doc_id", "text"})


def test_triangle_count_no_cartesian_single_agg(spark, sf_dir):
    df = Q.queries()["triangle_count"](spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    # the count must partial-aggregate before the final single-row agg,
    # never collect the wedge fan-out anywhere central
    assert "partial_count" in plan or "partial" in plan.lower()


def test_pq_scan_broadcasts_query_luts(spark, sf_dir):
    from pagerank_hadoop_spark.operators.similarity import pq_topk
    from pagerank_hadoop_spark.queries import _ann_inputs

    emb, _ = _ann_inputs(spark, sf_dir)
    df = pq_topk(emb, emb.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    ), k=3)
    # the ADC scan streams the encoded corpus against broadcast
    # per-query lookup tables — the corpus side must never shuffle
    # into the scan join
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_repetition_stats_projection_only(spark, sf_dir):
    df = Q.queries()["repetition_stats"](spark, sf_dir)
    # a pure per-row projection: zero exchanges end to end
    assert count_exchanges(df) == 0
    assert_read_schema_only(df, {"doc_id", "text"})


def test_stream_static_join_oracle_shape_broadcasts_dim(spark, sf_dir):
    # the batch twin of the stream-static join must broadcast the
    # customer dim; the streaming micro-batch plans the same way
    ev = Q._events(spark, sf_dir).where(F.col("event_type") == "purchase")
    cust = Q._t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    df = ev.join(cust, "user_id").groupBy("c_mktsegment").count()
    assert_broadcast_join(df)


def test_disjunctive_parts_pushes_common_conjuncts(spark, sf_dir):
    # TPC-H Q19 shape: Catalyst must extract per-side filters from the
    # OR-of-ANDs and push them into both parquet scans
    df = Q.queries()["disjunctive_parts_revenue"](spark, sf_dir)
    assert_pushed_filter(df, "p_brand")
    assert_pushed_filter(df, "l_quantity")
    assert_broadcast_join(df)


def test_volume_shipping_broadcasts_all_dims(spark, sf_dir):
    # Q7 shape: both nation roles + customer + supplier broadcast;
    # only the lineitem⋈orders fact join may shuffle
    df = Q.queries()["volume_shipping"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert_no_cartesian(df)


def test_small_qty_revenue_single_fact_shuffle_key(spark, sf_dir):
    # Q17 decorrelation: aggregate + self-join both key on l_partkey;
    # no cartesian, and the plan stays in codegen
    df = Q.queries()["small_qty_revenue"](spark, sf_dir)
    assert_no_cartesian(df)
    assert_whole_stage_codegen(df)


def test_idle_rich_scalar_stats_broadcast(spark, sf_dir):
    # Q22 shape: the one-row stats aggregate must broadcast (nested
    # loop on a single row, not a shuffled cartesian), and the
    # no-big-order test must plan as a broadcast anti join
    df = Q.queries()["idle_rich_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_big_orders_filters_before_customer_join(spark, sf_dir):
    # Q18 shape: the HAVING filter must run on the aggregate subtree
    # (a Filter on total_qty below the joins), so the broadcast join
    # sees only surviving rows; and the whole plan stays join-local
    df = Q.queries()["big_orders"](spark, sf_dir)
    plan = formatted_plan(df)
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    assert "total_qty" in plan and "Filter" in plan, plan


def test_bucketed_join_has_no_join_side_exchange(spark, sf_dir):
    # co-bucketed fact join: SortMergeJoin straight over the bucketed
    # scans; the ONLY exchange in the plan is the final tiny group-by
    # on o_orderstatus — the join itself never shuffles
    df = Q.queries()["bucketed_colocated_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    # tree section only (details repeat each node once more): exactly
    # one Exchange, and it sits above the join (aggregate side)
    tree = plan.split("\n\n", 1)[0]
    exchange_lines = [l for l in tree.splitlines() if "Exchange" in l]
    assert len(exchange_lines) == 1, plan
    join_subtree = tree.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_subtree, plan


def test_sql_surface_matches_dataframe_plan(spark, sf_dir):
    df = Q.queries()["sql_surface_revenue"](spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_upsert_full_outer_merge_join(spark, sf_dir):
    # MERGE shape: a FullOuter join keyed on custkey; both sides
    # shuffle once on the same key, and the two update branches read
    # only the columns they touch (pruned scans)
    df = Q.queries()["upsert_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "FullOuter" in plan, plan
    assert_no_cartesian(df)


def test_cust_order_distribution_partial_aggs(spark, sf_dir):
    # Q13 shape: both aggregation levels must plan partial+final
    # hash aggregates (map-side combine before each exchange)
    df = Q.queries()["cust_order_distribution"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 4, plan


def test_order_priority_semi_join_with_residual(spark, sf_dir):
    # Q4 shape: EXISTS plans as a LeftSemi hash join on the orderkey
    # with the date inequality as a residual — never a nested loop;
    # the one-year window is pushed into the orders scan
    df = Q.queries()["order_priority_check"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert "NestedLoop" not in plan, plan
    assert_pushed_filter(df, "o_orderdate")


def test_national_market_share_broadcasts_snowflake(spark, sf_dir):
    # Q8 shape: all six dimension joins broadcast (nation twice);
    # region/part filters reach their scans before the broadcast
    df = Q.queries()["national_market_share"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert_pushed_filter(df, "r_name")
    assert_pushed_filter(df, "p_type")


def test_returned_items_topk_heap_and_pushdown(spark, sf_dir):
    # Q10 shape: returnflag + date window pushed to the scans; the
    # final top-20 is TakeOrderedAndProject, not a global sort
    df = Q.queries()["returned_items"](spark, sf_dir)
    assert_pushed_filter(df, "l_returnflag")
    assert_pushed_filter(df, "o_orderdate")
    assert_take_ordered(df)
    assert_broadcast_join(df)


def test_important_parts_single_fact_aggregate(spark, sf_dir):
    # Q11 shape: the per-part aggregate materializes once (checkpoint)
    # and the global total broadcasts back onto it — exactly one
    # lineitem scan in the whole plan
    df = Q.queries()["important_parts"](spark, sf_dir)
    plan = formatted_plan(df)
    import re

    assert len(re.findall(r"Scan parquet", plan.split("\n\n", 1)[0])) == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_top_supplier_exact_decimal_max_equality(spark, sf_dir):
    # Q15 shape: the revenue view materializes once; the scalar MAX
    # broadcasts; the winner set is nonempty and exact-decimal unique
    df = Q.queries()["top_supplier"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_rev"] for r in rows}) == 1


def test_waiting_suppliers_no_triple_scan(spark, sf_dir):
    # Q21 shape: the EXISTS/NOT-EXISTS double self-join collapses to
    # per-order facts + one re-join — lineitem is scanned at most
    # twice (facts + late lines), never three times as the literal
    # SQL would
    df = Q.queries()["waiting_suppliers"](spark, sf_dir)
    plan = formatted_plan(df)
    # scan nodes list their Location once each in the details section
    assert plan.count("lineitem.parquet") <= 2, plan
    assert_no_cartesian(df)


def test_recursive_cte_bounded_and_aggregated(spark, sf_dir):
    # the recursive walk must terminate (node halves each step) and
    # feed a normal aggregate; depth is bounded by log2(max custkey)
    import math

    df = Q.queries()["recursive_cte_hierarchy"](spark, sf_dir)
    rows = {r["depth"]: r["n_nodes"] for r in df.collect()}
    max_key = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .agg(F.max("c_custkey"))
        .first()[0]
    )
    assert max(rows) <= math.floor(math.log2(max(max_key, 1))) + 1
    # depth 0 row count == customer count (every walk starts at its key)
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert rows[0] == n_cust


def test_forecast_revenue_all_predicates_pushed(spark, sf_dir):
    # Q6 shape: scan-only plan — every predicate lands in the parquet
    # scan, no exchange beyond the single-row final aggregate
    df = Q.queries()["forecast_revenue"](spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "l_discount")
    assert_pushed_filter(df, "l_quantity")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan


def test_local_supplier_volume_nation_residual(spark, sf_dir):
    # Q5 shape: the s_nationkey = c_nationkey cross-dimension equality
    # rides the supplier hash join (no post-join filter explosion, no
    # cartesian); all dims broadcast
    df = Q.queries()["local_supplier_volume"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert_no_cartesian(df)


def test_compaction_reduces_file_count_losslessly(spark, sf_dir, tmp_path):
    from pagerank_hadoop_spark.sources.sinks import compact_parquet

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    ev.repartition(32).write.parquet(small)
    import os

    n_small = sum(1 for f in os.listdir(small) if f.endswith(".parquet"))
    assert n_small == 32
    out = compact_parquet(spark, small, big, target_file_bytes=1 << 30)
    n_big = sum(1 for f in os.listdir(big) if f.endswith(".parquet"))
    assert n_big == 1  # whole table under one target-size file
    assert out.count() == ev.count()

    # scheme-qualified URI: sizing goes through the Hadoop FileSystem
    # API (object-store contract), not os.scandir
    big2 = str(tmp_path / "big2")
    out2 = compact_parquet(
        spark, f"file://{small}", f"file://{big2}", target_file_bytes=1 << 30
    )
    assert out2.count() == ev.count()
    assert sum(1 for f in os.listdir(big2) if f.endswith(".parquet")) == 1


def test_bm25_single_token_explode(spark, sf_dir):
    # one Generate (explode) feeds lengths, tfs, and corpus stats —
    # the stats side re-aggregates per_doc, never re-scans tokens
    df = Q.queries()["bm25_search"](spark, sf_dir)
    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("Generate") <= 1, plan
    assert_take_ordered(df)


def test_hybrid_rrf_no_cartesian_blowup(spark, sf_dir):
    # the query vector broadcasts onto the embedding scan; the fusion
    # join is a keyed full-outer, never a cartesian over both lists
    df = Q.queries()["hybrid_rrf_search"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan


def test_bitmap_distinct_avoids_expand_and_raw_key_shuffle(spark, sf_dir):
    """COUNT(DISTINCT) plans an Expand + a shuffle of raw keys; the
    bitmap plan must be two plain hash aggregations (bucket bitmaps,
    then bitmap_count rollup) with no Expand node anywhere."""
    df = Q.queries()["bitmap_distinct_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" not in plan
    # map-side combine: per-bucket bitmaps are built BEFORE the shuffle
    assert "partial_bitmap_construct_agg" in plan
    assert count_exchanges(df) <= 4  # 2 physical (tree+detail lines)


def test_jl_projection_is_map_only_jvm_side(spark, sf_dir):
    """The JL transform itself must add no shuffle beyond the final
    presentation orderBy and must stay out of Python (pure Column
    arithmetic, codegen-eligible)."""
    df = Q.queries()["jl_projection_vectors"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert count_exchanges(df) <= 2  # 1 physical: the orderBy range exchange


def test_runtime_bloom_filter_injected_for_shuffle_join(spark, sf_dir):
    """The session enables runtime bloom-filter injection: when a
    selective small side meets a big side in a SHUFFLE join (the
    100 TB fact-join shape — locally most small sides broadcast
    instead, which needs no bloom), the big side's scan gets a
    might_contain pre-filter built from the small side. Pinned by
    dropping the thresholds that hide it at test scale."""
    import re

    from pyspark.sql import functions as F

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_th = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        big = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        small = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .where(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        j = big.join(small, big.l_orderkey == small.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert re.search(r"(?i)bloomfilter|might_contain", plan), plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_th,
        )


def test_dpp_query_injects_dynamic_pruning_filter(spark):
    """dpp_year_revenue's fact scan must carry a dynamicpruning
    subquery in its PartitionFilters — runtime pruning from the
    broadcast dim side, not a full scan of every year partition."""
    import re

    from pagerank_hadoop_spark import queries as Q

    df = Q._QUERIES["dpp_year_revenue"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"(?i)dynamicpruning", plan), plan[:3000]


def test_ivf_pq_index_partition_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index (cell-partitioned parquet) must serve
    probes via PARTITION PRUNING: a cell-filtered read scans only the
    probed partitions (PartitionFilters in the scan), and serving from
    the index returns exactly what the in-memory pipeline returns."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_query,
        ivf_pq_read_index,
        ivf_pq_train,
        ivf_pq_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where("vec_id % 200 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    model = ivf_pq_train(emb)
    encoded = ivf_pq_encode(emb, model).localCheckpoint(eager=True)
    path = str(tmp_path / "ivfpq_index")
    ivf_pq_write_index(encoded, path)
    index = ivf_pq_read_index(spark, path)

    # partition pruning visible in the physical scan
    pruned = index.where(F.col("cell").isin([0, 3, 7]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    served = {
        (r.q_id, r.vec_id, r.sim)
        for r in ivf_pq_query(index, emb, q, model, k=5).collect()
    }
    direct = {
        (r.q_id, r.vec_id, r.sim)
        for r in ivf_pq_query(encoded, emb, q, model, k=5).collect()
    }
    assert served == direct and len(served) > 0


def test_ivf_pq_incremental_encode_law(spark, sf_dir):
    """Under a FROZEN model, encode(A ∪ B) ≡ encode(A) ∪ encode(B) —
    the incremental-ingest law: yesterday's index rows never need
    re-encoding when a new batch arrives, and querying the unioned
    index equals querying a from-scratch encode of the union."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_query,
        ivf_pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    model = ivf_pq_train(emb)
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    unioned = ivf_pq_encode(old, model).unionByName(
        ivf_pq_encode(new, model)
    )
    full = ivf_pq_encode(emb, model)
    a = {(r.vec_id, r.cell, tuple(r.codes)) for r in unioned.collect()}
    b = {(r.vec_id, r.cell, tuple(r.codes)) for r in full.collect()}
    assert a == b

    q = emb.where("vec_id % 200 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    ra = {
        (r.q_id, r.vec_id)
        for r in ivf_pq_query(
            unioned.localCheckpoint(eager=True), emb, q, model, k=5
        ).collect()
    }
    rb = {
        (r.q_id, r.vec_id)
        for r in ivf_pq_query(
            full.localCheckpoint(eager=True), emb, q, model, k=5
        ).collect()
    }
    assert ra == rb


def test_audio_containment_broadcasts_clip_fingerprints(spark, sf_dir):
    """r13: the audio containment screen's asymmetry in the PLAN —
    the phase-swept CLIP side (small) is broadcast; the corpus side
    joins map-side and never shuffles its fingerprints. No
    cartesian."""
    df = Q.queries()["audio_containment_screen"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(df)


def test_cross_modal_screen_broadcasts_still_index(spark, sf_dir):
    """r13: the cross-modal perceptual join broadcasts the still
    (image) hash index; video-frame hashes join map-side — planes
    never reach an exchange (the shuffle carries hash strings)."""
    df = Q.queries()["media_cross_modal_ahash"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(df)


def test_video_containment_broadcasts_clip_shingles(spark, sf_dir):
    """r14: the video containment screen's asymmetry in the PLAN —
    the shingled CLIP side (small) is broadcast; corpus frame-hash
    shingles join map-side and decoded planes never reach an
    exchange (the join carries 64-char hash strings + md5 keys). No
    cartesian."""
    df = Q.queries()["video_containment_screen"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(df)


def test_mp4_pcm_audio_join_broadcasts_mp4_fingerprints(spark, sf_dir):
    """r14: the PCM-in-MP4 cross-container join broadcasts the small
    MP4 side; FLAC corpus fingerprints join map-side — samples never
    reach an exchange. No cartesian."""
    df = Q.queries()["media_mp4_pcm_audio"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(df)
