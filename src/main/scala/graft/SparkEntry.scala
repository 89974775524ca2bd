package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each QueryModule contributes named queries (Spark-side) and, where
  * DuckDB can express the same semantics, an oracle SQL string keyed by
  * the same name. Column aliases match exactly on both sides — the
  * driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** All implemented operator families. Order irrelevant (names unique). */
  val modules: Seq[QueryModule] = Seq(Agg, Joins, Windows, SortSet,
    EventAnalytics, Sketches, Operators, Scalars, DataOps, CoreModel,
    MoreFunctions, Extras, Coverage, MoreAggregates, Formats, Engines, Corpus,
    StreamingGate, Training)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join + aggregate + top-k: scan, broadcast join, partial agg,
    * ordered limit in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.tune(spark)
    Joins.queries("q_join_inner")(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
