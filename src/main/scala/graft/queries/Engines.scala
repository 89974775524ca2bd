package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.MergeEngines
import graft.operators.MergeEngines.{GraphitePattern, GraphiteRetention}

/** FINAL reads over the reference's specialized MergeTree engine family
  * (daisy `src/Processors/Merges/Algorithms/{Collapsing,VersionedCollapsing,
  * Summing,GraphiteRollup}SortedAlgorithm.cpp`), driven
  * from the events table with deterministic derived sign/version columns
  * so the DuckDB oracle can reproduce the collapse arithmetic exactly.
  *
  * sign = -1 on every third event_id (a "cancel" row), +1 otherwise;
  * version = event_id % 4; the ingestion sequence is event_id itself
  * (unique per row). The oracles mirror the emit rules with
  * arg_max/arg_min + FILTER (Collapsing) and window functions
  * (VersionedCollapsing) — same shapes the operators aggregate with.
  */
object Engines extends QueryModule {

  private val signSql = "CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END"

  def queries: Map[String, Q] = Map(

    // CollapsingMergeTree FINAL: 0-2 survivors per key from the
    // count/last-sign emit rules.
    "q_engine_collapsing" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        when(col("event_id") % 3 === 0, -1).otherwise(1).as("sign"))
      MergeEngines.collapseFinal(e, Seq("user_id"), "sign", "event_id")
    }),

    // VersionedCollapsingMergeTree FINAL: pair cancellation per
    // (user_id, version); |Σsign| newest majority-sign rows survive.
    "q_engine_vercollapse" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"), (col("event_id") % 4).as("version"),
        col("event_id"), col("event_type"),
        when(col("event_id") % 3 === 0, -1).otherwise(1).as("sign"))
      MergeEngines.versionedCollapseFinal(
        e, Seq("user_id"), "version", "sign", "event_id")
    }),

    // SummingMergeTree FINAL: value summed per (user_id, event_type),
    // first-row payload carried, all-zero keys dropped.
    "q_engine_summing" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"), col("event_type"), col("value"),
        col("event_id").as("seq"), col("event_id").as("first_event_id"))
      MergeEngines.summingFinal(e, Seq("user_id", "event_type"),
          Seq("value"), "seq")
        .withColumn("value", round(col("value"), 2))
    }),

    // GraphiteRollupMergeTree FINAL: event_type as the metric path,
    // 1h buckets for the newest week, 1d buckets beyond; view/click sum,
    // everything else averages. "now" = the table's max timestamp, so the
    // rollup is deterministic. Values are quantized to integer cents
    // before the rollup (and the avg floored) so both engines aggregate
    // exact integers — double summation order can never flip a rounding
    // boundary between Spark and the oracle.
    "q_engine_graphite" -> ((s, dir) => {
      val raw = t(s, dir, "events")
      val nowF = raw.agg(max(expr("unix_micros(ts) div 1000000")).as("_now"))
      val e = raw.select(
          col("event_type"), expr("unix_micros(ts) div 1000000").as("t"),
          round(col("value") * 100, 0).cast("long").as("value"),
          col("event_id"))
        .crossJoin(broadcast(nowF))
      val patterns = Seq(
        GraphitePattern("^(view|click)$", "sum",
          Seq(GraphiteRetention(0L, 3600L), GraphiteRetention(604800L, 86400L))),
        GraphitePattern("^.*$", "avg",
          Seq(GraphiteRetention(0L, 3600L), GraphiteRetention(1209600L, 86400L))))
      MergeEngines.graphiteRollup(e, "event_type", "t", "value", "event_id",
          patterns, col("_now"))
        .drop("_now")
        .withColumn("value_cents", floor(col("value")).cast("long"))
        .drop("value")
    }))

  def oracles: Map[String, String] = Map(

    "q_engine_collapsing" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, round(value, 2) AS value,
         |         $signSql AS sign
         |  FROM events),
         |a AS (
         |  SELECT user_id,
         |    count(*) FILTER (WHERE sign = 1)  AS cp,
         |    count(*) FILTER (WHERE sign = -1) AS cn,
         |    arg_max(sign, event_id) AS last_sign,
         |    arg_max(event_id, event_id)   FILTER (WHERE sign = 1)  AS p_id,
         |    arg_max(event_type, event_id) FILTER (WHERE sign = 1)  AS p_type,
         |    arg_max(value, event_id)      FILTER (WHERE sign = 1)  AS p_value,
         |    arg_min(event_id, event_id)   FILTER (WHERE sign = -1) AS n_id,
         |    arg_min(event_type, event_id) FILTER (WHERE sign = -1) AS n_type,
         |    arg_min(value, event_id)      FILTER (WHERE sign = -1) AS n_value
         |  FROM e GROUP BY user_id)
         |SELECT user_id, n_id AS event_id, n_type AS event_type,
         |       n_value AS value, -1 AS sign
         |FROM a
         |WHERE (last_sign = 1 OR cp <> cn) AND cp <= cn AND n_id IS NOT NULL
         |UNION ALL
         |SELECT user_id, p_id, p_type, p_value, 1
         |FROM a
         |WHERE (last_sign = 1 OR cp <> cn) AND cp >= cn AND p_id IS NOT NULL
         |""".stripMargin,

    "q_engine_vercollapse" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id % 4 AS version, event_id, event_type,
         |         $signSql AS sign
         |  FROM events),
         |w AS (
         |  SELECT *,
         |    sum(sign) OVER (PARTITION BY user_id, version) AS net,
         |    row_number() OVER (PARTITION BY user_id, version, sign
         |                       ORDER BY event_id DESC) AS rn
         |  FROM e)
         |SELECT user_id, version, event_id, event_type, sign
         |FROM w
         |WHERE sign = CASE WHEN net > 0 THEN 1 WHEN net < 0 THEN -1 ELSE 0 END
         |  AND rn <= abs(net)
         |""".stripMargin,

    "q_engine_summing" ->
      """SELECT user_id, event_type, round(sum(value), 2) AS value,
        |       arg_min(event_id, event_id) AS first_event_id
        |FROM events GROUP BY user_id, event_type
        |HAVING NOT (coalesce(sum(value), 0) = 0)
        |""".stripMargin,

    "q_engine_graphite" ->
      """WITH n AS (SELECT max(epoch_us(ts::TIMESTAMP) // 1000000) AS now
        |           FROM events),
        |e AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) // 1000000 AS t,
        |         CAST(round(value * 100, 0) AS BIGINT) AS value,
        |         event_id, n.now AS now
        |  FROM events, n),
        |m AS (
        |  SELECT *,
        |    CASE WHEN regexp_matches(event_type, '^(view|click)$')
        |         THEN 'sum' ELSE 'avg' END AS fn,
        |    CASE WHEN regexp_matches(event_type, '^(view|click)$')
        |         THEN (CASE WHEN now - t >= 604800 THEN 86400 ELSE 3600 END)
        |         ELSE (CASE WHEN now - t >= 1209600 THEN 86400 ELSE 3600 END)
        |    END AS prec
        |  FROM e),
        |g AS (
        |  SELECT event_type, t - (t % prec) AS t2, any_value(fn) AS fn,
        |         avg(value) AS a, sum(value) AS s,
        |         arg_max(event_id, event_id) AS event_id
        |  FROM m GROUP BY event_type, t - (t % prec))
        |SELECT event_type, t2 AS t, event_id,
        |       CAST(floor(CASE WHEN fn = 'sum' THEN s ELSE a END) AS BIGINT)
        |         AS value_cents
        |FROM g
        |""".stripMargin)
}
