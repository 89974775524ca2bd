package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (daisy:
  * `src/Processors/Transforms/WindowTransform.cpp:1573-1601` registers
  * rank/dense_rank/row_number/lagInFrame/leadInFrame; any aggregate is
  * usable over a window; frames ROWS + RANGE). Spark's `Window` spec is a
  * 1:1 match. The adjacent-row scalar functions the reference exposes
  * outside WINDOW syntax (neighbor, runningDifference, runningAccumulate —
  * `src/Functions/neighbor.cpp`, `runningDifference.h`) are lag/lead and
  * running sums here.
  *
  * Scale note: window partitions shuffle by partition key — partitionBy
  * keys here (custkey/user_id) are high-cardinality so no executor holds
  * more than one key's rows at a time; no unbounded state.
  */
object Windows extends QueryModule {

  def queries: Map[String, Q] = Map(
    // rank / dense_rank / row_number over per-customer order history.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"),
                col("rnk").cast("long").as("rnk"), col("drnk").cast("long").as("drnk"))
    }),

    // runningConcurrency (reference src/Functions/runningConcurrency.cpp):
    // per interval, how many intervals are open at its begin — the
    // sweep-line form: +1 at begin, -1 at end, ends sort before begins
    // at the same instant ([b,e) semantics), running sum, keep the +1
    // rows. One union + one window shuffle on the group key.
    "q_running_concurrency" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .filter(col("o_orderdate").between("1995-01-01", "1995-01-31"))
        .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
          col("o_orderdate").as("b"),
          date_add(col("o_orderdate"), (col("o_orderkey") % 30 + 1).cast("int")).as("e"))
      val ev = iv.select(col("grp"), col("o_orderkey"), col("b").as("t"), lit(1).as("d"))
        .unionAll(iv.select(col("grp"), col("o_orderkey"), col("e").as("t"), lit(-1).as("d")))
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("t"), col("d"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("conc", sum(col("d")).over(w))
        .filter(col("d") === 1)
        .select(col("grp"), col("o_orderkey"), col("conc").cast("long").as("conc"))
    }),

    // running aggregate + lag/lead (runningAccumulate / neighbor).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("running_spend",
          round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_price", round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2))
        .withColumn("next_key", coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"),
                col("prev_price"), col("next_key"))
    }),

    // RANGE frame over a numeric ORDER BY (daisy WindowTransform.cpp:182 —
    // RANGE OFFSET for numeric/date): count of orders within 1000.0 price
    // below the current one, per status.
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice")).rangeBetween(-1000L, 0L)
      t(s, dir, "orders")
        .withColumn("n_close_below", count(lit(1)).over(w))
        .select(col("o_orderkey"), col("o_orderstatus"), col("n_close_below"))
    }),

    // distribution functions: ntile / percent_rank / cume_dist.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cdist", round(cume_dist().over(w), 6))
        .select(col("c_custkey"), col("c_mktsegment"), col("quartile"),
                col("pct_rank"), col("cdist"))
    }),

    // runningDifference analogue on the events stream: per-user deltas of
    // value and inter-event gap in seconds.
    "q_running_difference" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("value_delta",
          round(col("value") - coalesce(lag(col("value"), 1).over(w), col("value")), 4))
        .withColumn("gap_sec",
          (unix_micros(col("ts")) - coalesce(unix_micros(lag(col("ts"), 1).over(w)),
            unix_micros(col("ts")))) / lit(1000000L))
        .select(col("event_id"), col("user_id"), col("value_delta"),
                floor(col("gap_sec")).as("gap_sec_floor"))
    }),

    // LIMIT n BY cols (daisy QueryPlan/LimitByStep.cpp): top-2 most recent
    // events per (user, event_type) — row_number pattern.
    "q_limit_by" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("user_id"), col("event_type"), col("event_id"),
                col("rn").cast("long").as("rn"))
    }))

  def oracles: Map[String, String] = Map(
    "q_running_concurrency" ->
      """WITH iv AS (SELECT o_orderkey, o_orderpriority AS grp,
        |    o_orderdate AS b,
        |    o_orderdate + (o_orderkey % 30 + 1) * INTERVAL 1 DAY AS e
        |  FROM orders
        |  WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-01-31'),
        |ev AS (SELECT grp, o_orderkey, b AS t, 1 AS d FROM iv
        |  UNION ALL SELECT grp, o_orderkey, e AS t, -1 AS d FROM iv),
        |sw AS (SELECT grp, o_orderkey, d, sum(d) OVER (
        |    PARTITION BY grp ORDER BY t, d, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM ev)
        |SELECT grp, o_orderkey, conc::BIGINT AS conc FROM sw WHERE d = 1""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn::BIGINT AS rn, rnk::BIGINT AS rnk,
        | drnk::BIGINT AS drnk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
        | round(coalesce(lag(o_totalprice,1) OVER w, 0),2) AS prev_price,
        | coalesce(lead(o_orderkey,1) OVER w, -1) AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_window_range" ->
      """SELECT o_orderkey, o_orderstatus,
        | count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_close_below
        |FROM orders""".stripMargin,

    "q_window_dist" ->
      """SELECT c_custkey, c_mktsegment,
        | (ntile(4) OVER w)::BIGINT AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,

    "q_running_difference" ->
      """SELECT event_id, user_id,
        | round(value - coalesce(lag(value,1) OVER w, value), 4) AS value_delta,
        | floor((epoch_us(ts::TIMESTAMP) - coalesce(epoch_us((lag(ts,1) OVER w)::TIMESTAMP),
        |   epoch_us(ts::TIMESTAMP))) / 1000000)::BIGINT AS gap_sec_floor
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_limit_by" ->
      """SELECT user_id, event_type, event_id, rn::BIGINT AS rn FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id) AS rn
        | FROM events) WHERE rn <= 2""".stripMargin)
}
