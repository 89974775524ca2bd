package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** A family of named queries with (optional) DuckDB oracle SQL.
  *
  * Contract (driver): every entry in `queries` is run at sf0.01 and its
  * parquet output is hash-compared against running the `oracles` SQL in
  * DuckDB over the same tables. Column names are sorted before hashing, so
  * Spark-side aliases MUST equal oracle-side aliases. Queries whose
  * semantics DuckDB can't express (sketches, LSH) omit the oracle and get
  * a rows-only check plus a ScalaTest spec.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
  protected def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)
}
