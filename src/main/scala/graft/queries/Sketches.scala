package graft.queries

import org.apache.spark.sql.functions._

/** Sketch / approximate-aggregation surface (daisy: uniq, uniqHLL12,
  * uniqCombined — `src/AggregateFunctions/AggregateFunctionUniq.cpp`;
  * the -State/-Merge combinators that expose mergeable binary sketch
  * columns — `registerAggregateFunctions.cpp:122-131`).
  *
  * Spark-native mapping: Apache DataSketches HLL via hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate — a stable binary representation
  * that merges across jobs, which IS the -State/-Merge contract. Results
  * are approximate, so these get rows-only driver checks; exactness
  * bounds are asserted in AggregatorSpec.
  */
object Sketches extends QueryModule {

  def queries: Map[String, Q] = Map(
    // uniq / uniqHLL12 analogue: approximate distinct per group. Same
    // trick as q_uniq_theta: both sketch paths (HLL++ sparse mode and
    // DataSketches HLL coupon mode) are deterministically exact while
    // the per-group NDV (≤7 line numbers, ≤50 quantities) is far below
    // sketch capacity, so the oracle is a plain exact COUNT(DISTINCT) —
    // while the same query stays a bounded-state sketch at 100 TB.
    "q_uniq_approx" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_linenumber")).as("uniq_linenumbers"),
             hll_sketch_estimate(hll_sketch_agg(col("l_quantity").cast("long")))
               .cast("long").as("uniq_quantities"),
             count(lit(1)).as("n"))
    }),

    // uniqState → uniqMerge: per-segment HLL sketch states merged to a
    // global estimate (mergeable across jobs/batches — the streaming
    // partial-agg pattern at 100 TB: sketches shuffle, raw keys don't).
    // Keyed on nationkey (25 distinct) so every sketch AND the union stay
    // in DataSketches' coupon-exact range — the merge path is then
    // oracle-checked against exact COUNT(DISTINCT) with zero tolerance,
    // same trick as q_uniq_theta/q_uniq_approx.
    "q_uniq_state_merge" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val perSeg = c.groupBy(col("c_mktsegment"))
        .agg(hll_sketch_agg(col("c_nationkey").cast("long")).as("state"))
      perSeg.agg(
        hll_sketch_estimate(hll_union_agg(col("state")))
          .cast("long").as("n_nations"),
        count(lit(1)).as("n_states"))
    }),

    // quantileTDigest analogue: approx_percentile (Greenwald–Khanna
    // summary; mergeable partial states internally). The GK rank-error
    // bound is n_group/accuracy, so the sketch answer IS the exact order
    // statistic — matching DuckDB's quantile_disc oracle, both sides
    // taking the ceil(p·n)-rank element — whenever accuracy > n_group.
    // Rather than a hard-coded constant whose exactness silently depends
    // on the gate SF, probe the largest group and derive
    //   accuracy = clamp(4 * maxGroup, 10^4, 10^5):
    //  * theory says accuracy > n_group suffices (rank error < 1), but
    //    Spark's merged-then-compressed partial summaries lose headroom:
    //    measured at the sf0.01 gate (~30k rows/group), accuracy =
    //    n_group + 1 is one rank off while ~3.3x n_group is exact — so
    //    the derivation carries a 4x margin;
    //  * the 10^5 ceiling is the bounded-state contract — the same cap
    //    as the reference's TDigest (AggregateFunctionQuantile.cpp:
    //    124-165); past ~2.5·10^4 rows/group (gate SF >= ~0.01 here the
    //    clamp is already at the ceiling) exactness margin shrinks, and
    //    a gate run at sf >= ~0.1 would need a rank-tolerant oracle
    //    instead — that SF dependence is the price of bounded state.
    // The probe is one map-side-combined count on a 3-value key — noise
    // next to the quantile job itself.
    "q_quantile_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val maxGroup = li.groupBy(col("l_linestatus")).count()
        .agg(max(col("count"))).head().getLong(0)
      val accuracy = math.max(10000L, math.min(4 * maxGroup, 100000L)).toInt
      li.groupBy(col("l_linestatus"))
        .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("median_approx"),
             approx_percentile(col("l_extendedprice"), lit(0.95), lit(accuracy)).as("p95_approx"))
    }),

    // uniqTheta (daisy AggregateFunctionUniq.cpp:137, DataSketches theta):
    // Spark 4's native theta_sketch_agg. A theta sketch is EXACT below its
    // nominal capacity (default 2^12 = 4096 retained keys); distinct
    // user_id per event_type is far below that at test SFs, so this query
    // is oracle-checked against exact COUNT(DISTINCT) — while remaining a
    // true bounded-state sketch at 100 TB.
    "q_uniq_theta" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(theta_sketch_estimate(theta_sketch_agg(col("user_id")))
          .cast("long").as("n_users"))
    }))

  def oracles: Map[String, String] = Map(
    "q_quantile_approx" ->
      """SELECT l_linestatus,
        |  quantile_disc(l_extendedprice, 0.5) AS median_approx,
        |  quantile_disc(l_extendedprice, 0.95) AS p95_approx
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q_uniq_state_merge" ->
      """SELECT count(DISTINCT c_nationkey)::BIGINT AS n_nations,
        |  count(DISTINCT c_mktsegment) AS n_states
        |FROM customer""".stripMargin,

    "q_uniq_approx" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_linenumber)::BIGINT AS uniq_linenumbers,
        |  count(DISTINCT l_quantity::BIGINT)::BIGINT AS uniq_quantities,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_uniq_theta" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY event_type""".stripMargin)
}
