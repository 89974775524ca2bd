package graft.queries

import org.apache.spark.sql.functions._

/** Aggregation surface — mirrors the reference's `Aggregator` engine and
  * registered aggregate families (daisy:
  * `src/AggregateFunctions/registerAggregateFunctions.cpp:11-65`,
  * `src/Interpreters/Aggregator.cpp`). On Spark all of this is declarative
  * `groupBy().agg()`: partial (map-side) aggregation, two-level parallel
  * hash maps, spill-to-disk and the distributed partial→final merge are
  * what Spark's HashAggregateExec + shuffle already do — nothing custom
  * needed. Floating aggregates are rounded so DuckDB-oracle hash compare
  * is stable across summation orders.
  *
  * Scale note: every query here aggregates with map-side combine; the
  * shuffle carries only (group key, partial state) pairs, so a 100 TB
  * lineitem with low-cardinality keys shuffles kilobytes per partition.
  */
object Agg extends QueryModule {

  def queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: full-scan filtered agg with 8 aggregates in one pass
    // (reference: pricing-summary class; exercises partial agg + spill path).
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // varPop/varSamp/stddev*/covar*/corr (reference:
    // src/AggregateFunctions/AggregateFunctionStatisticsSimple.cpp).
    "q_agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        round(var_pop(col("l_quantity")), 4).as("var_pop_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_samp_qty"),
        round(stddev_pop(col("l_extendedprice")), 4).as("stddev_pop_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("stddev_samp_price"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_pop_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_samp_qp"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(sum(col("l_quantity") * col("l_discount")) / sum(col("l_discount")), 4).as("avg_weighted_qty"))
    }),

    // skewPop/kurtPop (reference: AggregateFunctionStatisticsSimple.cpp).
    // Oracle recomputes from raw moments since DuckDB's skewness/kurtosis
    // are sample-corrected while Spark's are population forms.
    "q_agg_moments" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        round(skewness(col("l_quantity")), 6).as("skew_qty"),
        round(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
    }),

    // ROLLUP (reference: src/Processors/QueryPlan/RollupStep.cpp).
    "q_agg_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
    }),

    // CUBE (reference: src/Processors/QueryPlan/CubeStep.cpp).
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // WITH TOTALS (reference: TotalsHavingStep.cpp) = rollup on one key:
    // per-group rows plus the grand-total row with a NULL key.
    "q_with_totals" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    // GROUPING SETS (reference: src/Interpreters/InterpreterSelectQuery
    // grouping-sets planning; superset of ROLLUP/CUBE): caller-chosen
    // grouping combinations in one pass.
    "q_agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // -If combinator family: countIf/sumIf/avgIf (reference:
    // src/AggregateFunctions/Combinators -If; Spark idiom = agg over
    // `when(cond, x)` which codegens to a conditional accumulate).
    "q_agg_if" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        count(when(col("o_orderstatus") === "F", 1)).as("count_if_f"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))), 2).as("sum_if_urgent"),
        round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4).as("avg_if_open"),
        count(lit(1)).as("n_total"))
    }),

    // GROUP BY + ORDER BY count DESC + LIMIT (top-k groups, the reference
    // benchmark's bread-and-butter query shape, e.g. BASELINE Q9/Q13).
    "q_topk_groups" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("cnt").desc, col("l_partkey"))
        .limit(10)
    }),

    // uniqExact single + multi column (reference: AggregateFunctionUniq.cpp
    // uniqExact) — Spark count(DISTINCT ...) expands to a two-phase
    // distinct-then-count, shuffle-safe at scale.
    "q_uniq_exact" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("uniq_part"),
        countDistinct(col("l_suppkey")).as("uniq_supp"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("uniq_flag_status"))
    }),

    // quantile/quantileExact family (reference:
    // AggregateFunctionQuantile.cpp:124-165): exact interpolated
    // percentiles; Spark `percentile` == DuckDB `quantile_cont`.
    "q_quantiles" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p75"),
          round(element_at(col("ps"), 4), 4).as("p99"))
    }),

    // groupArray/arraySort (reference: AggregateFunctionGroupArray.cpp) —
    // collect_list is order-nondeterministic under parallelism, so the
    // deterministic public form is sort_array(collect_list(...)).
    "q_group_array" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 1000 === 0)
        .groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_list(col("l_quantity").cast("int"))), ",").as("quantities"),
             array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"))
    }),

    // argMax/argMin (reference: AggregateFunctionMinMaxAny.cpp argMax) —
    // max_by/min_by; `any` made deterministic as min (documented).
    "q_arg_minmax" -> ((s, dir) => {
      t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_max_price"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        min(col("o_custkey")).as("any_cust"))
    }))

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_stats" ->
      """SELECT round(var_pop(l_quantity),4) AS var_pop_qty,
        | round(var_samp(l_quantity),4) AS var_samp_qty,
        | round(stddev_pop(l_extendedprice),4) AS stddev_pop_price,
        | round(stddev_samp(l_extendedprice),4) AS stddev_samp_price,
        | round(covar_pop(l_quantity,l_extendedprice),4) AS covar_pop_qp,
        | round(covar_samp(l_quantity,l_extendedprice),4) AS covar_samp_qp,
        | round(corr(l_quantity,l_extendedprice),6) AS corr_qp,
        | round(sum(l_quantity*l_discount)/sum(l_discount),4) AS avg_weighted_qty
        |FROM lineitem""".stripMargin,

    "q_agg_moments" ->
      """WITH m AS (SELECT avg(l_quantity) AS mu, stddev_pop(l_quantity) AS sd,
        |                  count(*) AS n FROM lineitem)
        |SELECT
        | round(sum(pow(l_quantity-mu,3))/n/pow(sd,3),6) AS skew_qty,
        | round(sum(pow(l_quantity-mu,4))/n/pow(sd,4)-3,6) AS kurt_qty
        |FROM lineitem, m GROUP BY mu, sd, n""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_with_totals" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice),2) AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        | (o_orderstatus), ())""".stripMargin,

    "q_agg_if" ->
      """SELECT count(CASE WHEN o_orderstatus='F' THEN 1 END) AS count_if_f,
        | round(sum(CASE WHEN o_orderpriority='1-URGENT' THEN o_totalprice END),2) AS sum_if_urgent,
        | round(avg(CASE WHEN o_orderstatus='O' THEN o_totalprice END),4) AS avg_if_open,
        | count(*) AS n_total
        |FROM orders""".stripMargin,

    "q_topk_groups" ->
      """SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin,

    "q_uniq_exact" ->
      """SELECT count(DISTINCT l_partkey) AS uniq_part,
        | count(DISTINCT l_suppkey) AS uniq_supp,
        | count(DISTINCT (l_returnflag, l_linestatus)) AS uniq_flag_status
        |FROM lineitem""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
        | round(quantile_cont(l_extendedprice, 0.99),4) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_group_array" ->
      """SELECT l_orderkey,
        | array_to_string(list_sort(list(l_quantity::INT)), ',') AS quantities,
        | array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        |FROM lineitem WHERE l_orderkey % 1000 = 0 GROUP BY l_orderkey""".stripMargin,

    "q_arg_minmax" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice, o_custkey,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
        | FROM orders)
        |SELECT o_orderstatus,
        | max(CASE WHEN rd=1 THEN o_orderkey END) AS key_of_max_price,
        | max(CASE WHEN ra=1 THEN o_orderkey END) AS key_of_min_price,
        | round(max(o_totalprice),2) AS max_price,
        | min(o_custkey) AS any_cust
        |FROM r GROUP BY o_orderstatus""".stripMargin)
}
