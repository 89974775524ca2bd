package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Rawstore
import graft.sql.Search

/** Daisy data-model surface: time-bounded search entry, pipe syntax,
  * rawstore schema-on-read (SURVEY §1, §3.1). */
object CoreModel extends QueryModule {

  private def eventsView(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    t(s, dir, "events").withColumnRenamed("ts", "_time")
      .createOrReplaceTempView("events_t")

  def queries: Map[String, Q] = Map(
    // /dae/v1/search semantics: wrap SQL + inject _time bounds.
    "q_search_time_bounded" -> ((s, dir) => {
      eventsView(s, dir)
      Search.timeBounded(s,
        "SELECT event_id, user_id, event_type, round(value, 2) AS value, _time FROM events_t WHERE value > 50",
        "2024-01-05 00:00:00", "2024-01-12 00:00:00", limit = 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
                unix_micros(col("_time")).as("t_us"))
    }),

    // pipe-syntax query (daisy parseQueryPipe): stage-wise rewrite.
    "q_pipe_syntax" -> ((s, dir) => {
      eventsView(s, dir)
      Search.pipe(s,
        "events_t | where value > 90 " +
          "| group by event_type agg count(1) as n, round(sum(value),2) as s " +
          "| order by n desc, event_type | limit 3")
    }),

    // rawstore: fixed schema + query-time JSON extraction from _raw.
    "q_rawstore_extract" -> ((s, dir) => {
      eventsView(s, dir)
      val raw = Rawstore.ingest(
        t(s, dir, "events").withColumnRenamed("ts", "_time"),
        rawCol = "props", timeCol = "_time", sourcetype = "events_json")
      raw.filter(col("sourcetype") === "events_json")
        .select(Rawstore.jsonField("k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"))
    }))

  def oracles: Map[String, String] = Map(
    "q_search_time_bounded" ->
      """SELECT event_id, user_id, event_type, round(value, 2) AS value,
        | epoch_us(ts::TIMESTAMP) AS t_us
        |FROM events
        |WHERE value > 50
        |  AND ts::TIMESTAMP >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts::TIMESTAMP < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin,

    "q_pipe_syntax" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS s
        |FROM events WHERE value > 90
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3""".stripMargin,

    "q_rawstore_extract" ->
      """SELECT json_extract_string(props, '$.k')::BIGINT % 10 AS k_bucket,
        | count(*) AS n
        |FROM events GROUP BY 1""".stripMargin)
}
