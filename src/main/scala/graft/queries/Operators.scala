package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, WithFill}

/** Composed-operator surface: ASOF JOIN, WITH FILL, ARRAY JOIN, FINAL
  * (merge-on-read dedup) — the reference operators Spark lacks as
  * built-ins, each implemented as a reusable composition in
  * graft.operators (SURVEY §2.3/§2.6).
  */
object Operators extends QueryModule {

  def queries: Map[String, Q] = Map(
    // ASOF JOIN (non-strict <=): each purchase matched to the user's
    // latest view at-or-before it.
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t_us"),
                round(col("value"), 2).as("purchase_value"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("t_us"), col("event_id").as("view_event_id"),
                round(col("value"), 2).as("view_value"))
      AsofJoin.leftAsofBackward(purchases, views,
          on = Seq("user_id"), leftTime = "t_us", rightTime = "t_us")
        .select(col("event_id"), col("user_id"), col("purchase_value"),
                col("asof_view_event_id").as("view_event_id"),
                col("asof_view_value").as("view_value"))
    }),

    // ASOF JOIN strict (<): latest view strictly before the purchase.
    "q_asof_strict" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t_us"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("t_us"), col("event_id").as("view_event_id"))
      AsofJoin.leftAsofBackward(purchases, views,
          on = Seq("user_id"), leftTime = "t_us", rightTime = "t_us",
          strict = true)
        .select(col("event_id"), col("user_id"),
                col("asof_view_event_id").as("view_event_id"))
    }),

    // WITH FILL: hourly error counts with empty buckets filled with 0.
    "q_with_fill" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .filter(col("event_type") === "error")
        .withColumn("bucket_s", (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long"))
        .groupBy(col("bucket_s"))
        .agg(count(lit(1)).as("n"))
      WithFill.fillGaps(hourly, "bucket_s", 3600L, fillZero = Seq("n"))
    }),

    // WITH FILL … INTERPOLATE (daisy FillingTransform interpolation):
    // hourly avg value, gaps linearly interpolated between observed
    // neighbors, edges clamped.
    "q_with_fill_interp" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .filter(col("event_type") === "error")
        .withColumn("bucket_s", (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long"))
        .groupBy(col("bucket_s"))
        .agg(round(avg(col("value")), 4).as("avg_v"))
      WithFill.fillInterpolate(hourly, "bucket_s", 3600L, interpolate = Seq("avg_v"))
    }),

    // ARRAY JOIN (daisy arrayJoin / ASTTablesInSelectQuery ARRAY JOIN →
    // explode): token frequencies over documents.
    "q_array_join" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // arrayEnumerate / posexplode — LEFT ARRAY JOIN keeps position.
    "q_array_enumerate" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), (col("pos") + 1).cast("long").as("pos"),
                col("col").as("token"))
    }),

    // FINAL (ReplacingMergeTree merge-on-read dedup — daisy
    // QueryPlan/MergingFinal.cpp): latest state per key via one-shot
    // max_by(struct) — a single partial-aggregable pass, no window needed.
    "q_final_dedup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("event_id"), col("event_type"), round(col("value"), 2).as("value")),
                    struct(unix_micros(col("ts")), col("event_id"))).as("last"))
        .select(col("user_id"), col("last.event_id").as("last_event_id"),
                col("last.event_type").as("last_type"),
                col("last.value").as("last_value"))
    }))

  def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS t_us,
        |             round(value,2) AS purchase_value
        |           FROM events WHERE event_type='purchase'),
        | v AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t_us,
        |         event_id AS view_event_id, round(value,2) AS view_value
        |       FROM events WHERE event_type='view')
        |SELECT p.event_id, p.user_id, p.purchase_value,
        |       v.view_event_id, v.view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.t_us <= p.t_us""".stripMargin,

    "q_asof_strict" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS t_us
        |           FROM events WHERE event_type='purchase'),
        | v AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t_us,
        |         event_id AS view_event_id
        |       FROM events WHERE event_type='view')
        |SELECT p.event_id, p.user_id, v.view_event_id
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.t_us < p.t_us""".stripMargin,

    "q_with_fill" ->
      """WITH b AS (
        | SELECT ((epoch_us(ts::TIMESTAMP) // 1000000) // 3600) * 3600 AS bucket_s,
        |        count(*) AS n
        | FROM events WHERE event_type='error' GROUP BY 1),
        |bounds AS (SELECT min(bucket_s) AS mn, max(bucket_s) AS mx FROM b),
        |series AS (SELECT unnest(generate_series(mn, mx, 3600)) AS bucket_s FROM bounds)
        |SELECT series.bucket_s, coalesce(b.n, 0) AS n
        |FROM series LEFT JOIN b ON series.bucket_s = b.bucket_s""".stripMargin,

    "q_with_fill_interp" ->
      """WITH b AS (
        | SELECT ((epoch_us(ts::TIMESTAMP) // 1000000) // 3600) * 3600 AS bucket_s,
        |        round(avg(value), 4) AS avg_v
        | FROM events WHERE event_type='error' GROUP BY 1),
        |bounds AS (SELECT min(bucket_s) AS mn, max(bucket_s) AS mx FROM b),
        |series AS (SELECT unnest(generate_series(mn, mx, 3600)) AS bucket_s FROM bounds),
        |j AS (SELECT series.bucket_s, b.avg_v,
        |        (b.avg_v IS NOT NULL) AS obs
        |      FROM series LEFT JOIN b ON series.bucket_s = b.bucket_s),
        |w AS (SELECT bucket_s, avg_v, obs,
        |  last_value(CASE WHEN obs THEN bucket_s END IGNORE NULLS) OVER
        |    (ORDER BY bucket_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pa,
        |  last_value(avg_v IGNORE NULLS) OVER
        |    (ORDER BY bucket_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  first_value(CASE WHEN obs THEN bucket_s END IGNORE NULLS) OVER
        |    (ORDER BY bucket_s ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS na,
        |  first_value(avg_v IGNORE NULLS) OVER
        |    (ORDER BY bucket_s ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        | FROM j)
        |SELECT bucket_s,
        | CASE WHEN obs THEN avg_v
        |      WHEN pa IS NULL THEN nv
        |      WHEN na IS NULL THEN pv
        |      ELSE pv + (nv - pv) * ((bucket_s - pa) / (na - pa))
        | END AS avg_v
        |FROM w""".stripMargin,

    "q_array_join" ->
      """SELECT token, count(*) AS n FROM (
        | SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q_array_enumerate" ->
      """SELECT p_partkey, (u.pos)::BIGINT AS pos, u.token AS token FROM (
        | SELECT p_partkey,
        |  unnest(list_transform(string_split(p_name, ' '),
        |         (x, i) -> struct_pack(pos := i, token := x))) AS u
        | FROM part)""".stripMargin,

    "q_final_dedup" ->
      """WITH r AS (SELECT user_id, event_id, event_type, round(value,2) AS value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       value AS last_value
        |FROM r WHERE rn = 1""".stripMargin)
}
