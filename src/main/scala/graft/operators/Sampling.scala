package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the per-source / per-language
  * mixture-weighting step of large training-corpus builds, generalizing
  * the reference's SAMPLE clause (hash-range row selection,
  * daisy `src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp`
  * sampling key) to one rate per stratum value.
  *
  * Selection is a pure multiplicative-hash predicate on the id column —
  * whole-stage-codegen arithmetic, no shuffle, independent of row order
  * and partitioning, and reproducible across engines (the oracle mirrors
  * the exact same integer expression). At 100 TB this is a scan-filter
  * that composes with pushdown: each executor keeps its share of every
  * stratum without any coordination, unlike `sampleBy`'s RNG which is
  * seed-and-partitioning dependent.
  */
object Sampling {

  /** Uniform 0-99 bucket from an integer id: Knuth multiplicative hash,
    * pre-reduced so the product stays far from Long overflow (DuckDB
    * BIGINT errors on overflow rather than wrapping, so the oracle needs
    * the same bounded arithmetic). */
  def bucket100(id: Column): Column =
    pmod((id % 100000007L) * 2654435761L, lit(100L))

  /** Keep ratesPct(stratum) percent of each stratum's rows (unlisted
    * strata keep `defaultPct`), selected deterministically by
    * [[bucket100]] of `idCol`. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 ratesPct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: ratesPct.values.toSeq).forall(r => r >= 0 && r <= 100),
      "stratified: rates are percentages in [0, 100]")
    val rate = ratesPct.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct): Column) { case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(v)).otherwise(acc)
      }
    df.filter(bucket100(col(idCol)) < rate)
  }
}
