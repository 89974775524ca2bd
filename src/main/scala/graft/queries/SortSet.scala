package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / distinct / set-operation surface (daisy:
  * `QueryPlan/PartialSortingStep.cpp` + `MergeSortingStep.cpp` external
  * sort, `LimitStep.cpp` incl. WITH TIES, `DistinctStep.cpp`,
  * `UnionStep.cpp`; SAMPLE clause
  * `MergeTreeDataSelectExecutor.cpp:93`). Spark: `orderBy` is an external
  * sort with spill; LIMIT over sort becomes TakeOrderedAndProject (partial
  * top-k per partition, merge on driver) — the same partial-top-k pushdown
  * the reference does in `executePreLimit`.
  */
object SortSet extends QueryModule {

  def queries: Map[String, Q] = Map(
    // global ORDER BY + LIMIT with full tie-break → TakeOrderedAndProject.
    "q_orderby_limit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
        .limit(10)
    }),

    // LIMIT WITH TIES (daisy LimitStep.cpp `with_ties`): rank() <= n is
    // equivalent to key >= the n-th largest key, so compute that threshold
    // with TakeOrdered (partial top-k per partition, no global shuffle)
    // and broadcast it back as a 1-row filter. The previous global
    // no-partition window pulled the whole table into one task — a
    // single-executor sort at 100×.
    "q_limit_with_ties" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val kth = li.select(col("l_quantity").as("thr"))
        .orderBy(col("thr").desc).limit(3)
        .agg(min(col("thr")).as("thr"))
      li.join(broadcast(kth), col("l_quantity") >= col("thr"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // Wide top-k (every lineitem column) with a filter — the
    // lazy-materialization shape: plans/LazyTopK bounds the wide scan by
    // a narrow sort-key pre-pass; the full tie-broken ORDER BY + LIMIT
    // stays in place so results are EXACTLY the naive plan's (this row
    // hash-checks that claim against DuckDB).
    "q_topk_wide" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") =!= "R")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(20)
    }),

    // DISTINCT on a projection.
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct()
    }),

    // UNION ALL of two filtered branches (daisy union_default_mode=ALL).
    "q_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("high").as("bucket"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("bucket"))
      hi.union(urgent).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    }),

    // UNION DISTINCT.
    "q_union_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      a.union(b).distinct().agg(count(lit(1)).as("n_distinct_keys"))
    }),

    // Deterministic SAMPLE on a sampling key (daisy samples on
    // intHash32(key) ranges; the portable deterministic analogue is a
    // modulus predicate on the key — prunes identically in both engines).
    "q_sample_key" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .agg(count(lit(1)).as("n_sampled"),
             round(sum(col("l_extendedprice")), 2).as("sum_price"),
             round(avg(col("l_quantity")), 4).as("avg_qty"))
    }),

    // IN-subquery membership (daisy materializes a Set —
    // src/Interpreters/Set.h; Spark plans left-semi).
    "q_in_subquery" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"))
      t(s, dir, "lineitem")
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
    }))

  def oracles: Map[String, String] = Map(
    "q_topk_wide" ->
      """SELECT * FROM lineitem WHERE l_returnflag != 'R'
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q_orderby_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "q_limit_with_ties" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  rank() OVER (ORDER BY l_quantity DESC) AS rnk FROM lineitem)
        |WHERE rnk <= 3""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_union_all" ->
      """SELECT bucket, count(*) AS n FROM (
        | SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
        | UNION ALL
        | SELECT o_orderkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority='1-URGENT'
        |) GROUP BY bucket""".stripMargin,

    "q_union_distinct" ->
      """SELECT count(*) AS n_distinct_keys FROM (
        | SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        | UNION
        | SELECT o_orderkey FROM orders WHERE o_orderpriority='1-URGENT')""".stripMargin,

    "q_sample_key" ->
      """SELECT count(*) AS n_sampled, round(sum(l_extendedprice),2) AS sum_price,
        | round(avg(l_quantity),4) AS avg_qty
        |FROM lineitem WHERE l_orderkey % 7 = 0""".stripMargin,

    "q_in_subquery" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY l_returnflag""".stripMargin)
}
