package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF JOIN — equi keys + "latest right row at or before the left row's
  * time" (reference: daisy `src/Interpreters/HashJoin.cpp:186,213-226`,
  * inequality enum `src/Interpreters/asof.h:9-42`, sorted per-key lookup
  * `src/Interpreters/RowRefs.h`; SQL tests
  * `tests/queries/0_stateless/00927_asof_join*.sql`).
  *
  * Spark has no built-in ASOF. This implementation uses the union+window
  * composition (SURVEY §2.3 option (a)):
  *
  *   1. tag left / right rows and union them on (keys, time),
  *   2. one window sort per (keys) ordered by (time, tag) computes
  *      `last(right_payload, ignoreNulls=true)` — the as-of match,
  *   3. keep the left rows and unpack the matched payload.
  *
  * Scale behavior: exactly ONE shuffle (hash by keys) + per-partition
  * sort — the same cost as a sort-merge join, no per-key iteration and no
  * range explosion. Skewed keys behave like any window function (AQE
  * handles the shuffle; a single pathological key is bounded by its own
  * row count, matching the reference's per-key sorted-array lookup).
  * Works unchanged on a 1000-executor cluster: the window is
  * partitionBy(keys), never a global sort.
  */
object AsofJoin {

  /** Left as-of backward join.
    *
    * @param left      probe side (each row kept exactly once)
    * @param right     build side (provides the as-of payload)
    * @param on        equi-join key column names (present in both)
    * @param leftTime  left event-time column name (orderable type)
    * @param rightTime right event-time column name (same type)
    * @param strict    false → match rightTime <= leftTime (ASOF >=);
    *                  true  → match rightTime <  leftTime (ASOF >)
    * @return left rows + right payload columns (null when no match);
    *         right payload columns are right's non-key columns renamed
    *         with the given prefix.
    */
  def leftAsofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_",
      strict: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    val rightPayloadCols = right.columns.toSeq.filterNot(c => on.contains(c))

    // tag ordering at equal time: non-strict → right (0) sorts before
    // left (1) so `last` sees it; strict → left (0) before right (1).
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)

    val lTagged = left.select(
      on.map(col) ++
        Seq(col(leftTime).as("_asof_t"), lit(leftTag).as("_asof_tag"),
            struct(leftCols.map(col): _*).as("_asof_l"),
            lit(null).cast(structType(right, rightPayloadCols)).as("_asof_r")): _*)

    val rTagged = right.select(
      on.map(col) ++
        Seq(col(rightTime).as("_asof_t"), lit(rightTag).as("_asof_tag"),
            lit(null).cast(structType(left, leftCols)).as("_asof_l"),
            struct(rightPayloadCols.map(col): _*).as("_asof_r")): _*)

    val unioned = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = unioned
      .withColumn("_asof_match", last(col("_asof_r"), ignoreNulls = true).over(w))
      .filter(col("_asof_l").isNotNull)

    val outLeft = leftCols.map(c => col(s"_asof_l.$c").as(c))
    val outRight = rightPayloadCols.map(c => col(s"_asof_match.$c").as(s"$rightPrefix$c"))
    matched.select(outLeft ++ outRight: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
