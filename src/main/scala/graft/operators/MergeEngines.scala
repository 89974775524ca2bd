package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read semantics of the reference's specialized MergeTree engine
  * family (reference: daisy `src/Processors/Merges/Algorithms/
  * {Collapsing,VersionedCollapsing,Summing,GraphiteRollup}SortedAlgorithm.cpp`).
  *
  * The reference applies these row-collapse rules incrementally during
  * background part merges over sort-ordered streams; a FINAL read sees the
  * fully-collapsed state. Spark-first, the fully-collapsed state is a
  * declarative aggregate over the key — one hash-aggregate pass with
  * partial (map-side) combine, a single shuffle on the collapse key, no
  * sorted-merge machinery. That is the plan that survives 100 TB: every
  * engine below is a groupBy/window over its key columns, so AQE sizes the
  * exchange and skewed keys split, whereas a literal k-way sorted merge
  * would serialize on a global sort.
  */
object MergeEngines {

  /** CollapsingMergeTree FINAL (CollapsingSortedAlgorithm.cpp:69-106).
    *
    * Per key, with rows ordered by `seqCol` (the ingestion sequence) and a
    * `signCol` of +1 ("state") / -1 ("cancel"):
    *   - emit the FIRST negative row  when cntPos <= cntNeg (suppressed by
    *     `onlyPositiveSign` — the engine's `only_positive_sign` setting);
    *   - emit the LAST positive row   when cntPos >= cntNeg;
    *   - emit nothing when the key is balanced and ends on a cancel
    *     (`last_is_positive || count_positive != count_negative` gate).
    * A balanced key ending on a state row therefore emits BOTH rows, as the
    * reference does.
    *
    * One aggregate pass: counts + max_by/min_by row structs, then the emit
    * rules expand 0-2 survivor rows per key.
    */
  def collapseFinal(df: DataFrame, keys: Seq[String], signCol: String,
                    seqCol: String, onlyPositiveSign: Boolean = false): DataFrame = {
    val sign = col(signCol)
    val seq = col(seqCol)
    val payload = df.columns.filterNot(keys.contains).toSeq
    val rowStruct = struct(payload.map(col): _*)

    val agged = df.groupBy(keys.map(col): _*).agg(
      count(when(sign === 1, 1)).as("_cnt_pos"),
      count(when(sign === -1, 1)).as("_cnt_neg"),
      max_by(sign, seq).as("_last_sign"),
      max_by(when(sign === 1, rowStruct), when(sign === 1, seq)).as("_last_pos"),
      min_by(when(sign === -1, rowStruct), when(sign === -1, seq)).as("_first_neg"))

    val emitAny = col("_last_sign") === 1 || col("_cnt_pos") =!= col("_cnt_neg")
    val emitNeg = emitAny && lit(!onlyPositiveSign) &&
      col("_cnt_pos") <= col("_cnt_neg") && col("_first_neg").isNotNull
    val emitPos = emitAny &&
      col("_cnt_pos") >= col("_cnt_neg") && col("_last_pos").isNotNull

    val survivors = array(when(emitNeg, col("_first_neg")),
                          when(emitPos, col("_last_pos")))
    agged
      .select(keys.map(col) :+
        explode(filter(survivors, _.isNotNull)).as("_row"): _*)
      .select(keys.map(col) ++ payload.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** VersionedCollapsingMergeTree FINAL (VersionedCollapsingAlgorithm
    * .cpp:61-155). The engine cancels +1/-1 pairs that share the full sort
    * key INCLUDING the version column (LIFO queue per key). Collapsed
    * state per (key, version): the net sign n = Σsign decides the
    * survivors — the |n| newest rows of the majority sign; a balanced
    * group vanishes. Matches the queue semantics whenever cancels arrive
    * against existing state rows (the engine's documented usage).
    *
    * Single shuffle: both the net sum and the per-sign running count are
    * windows over the same (key, version) partitioning, so Catalyst plans
    * one exchange and two Window nodes over the same sort.
    */
  def versionedCollapseFinal(df: DataFrame, keys: Seq[String], versionCol: String,
                             signCol: String, seqCol: String): DataFrame = {
    val part = (keys :+ versionCol).map(col)
    val p = Window.partitionBy(part: _*)
    // ROWS frame, not the default RANGE: duplicate seq values must count
    // one at a time (RANGE would include all peers of the current seq,
    // inflating the running count and dropping rows that should survive).
    val ord = p.orderBy(col(seqCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sign = col(signCol)
    val net = sum(sign).over(p)
    val runPos = sum(when(sign === 1, 1L).otherwise(0L)).over(ord)
    val runNeg = sum(when(sign === -1, 1L).otherwise(0L)).over(ord)
    val rnSameSign = when(sign === 1, runPos).otherwise(runNeg)
    df.withColumn("_net", net)
      .withColumn("_rn", rnSameSign)
      .where(signum(col("_net")).cast("int") === sign && col("_rn") <= abs(col("_net")))
      .drop("_net", "_rn")
  }

  /** SummingMergeTree FINAL (SummingSortedAlgorithm.cpp:445-560): one row
    * per key; the configured numeric columns are summed, every other
    * payload column keeps the value of the first row encountered, and a
    * key whose summed columns all collapse to zero is dropped entirely
    * (`current_row_is_zero`).
    */
  def summingFinal(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                   seqCol: String): DataFrame = {
    val others = df.columns.filterNot(c =>
      keys.contains(c) || sumCols.contains(c) || c == seqCol).toSeq
    val aggs =
      sumCols.map(c => sum(col(c)).as(c)) ++
      others.map(c => min_by(col(c), col(seqCol)).as(c))
    val allZero = sumCols
      .map(c => coalesce(col(c), lit(0)) === 0)
      .reduce(_ && _)
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .where(!allZero)
  }

  /** One retention band: rows older than `ageSec` (relative to the merge
    * time) round their timestamp down to `precisionSec` buckets. */
  final case class GraphiteRetention(ageSec: Long, precisionSec: Long)

  /** One rollup rule: paths matching `regex` aggregate their value with
    * `fn` ("avg" | "sum" | "min" | "max") under the retention schedule.
    * First matching pattern wins, and the LAST pattern doubles as the
    * fallback for paths matching no regex — the reference's mandatory
    * `<default>` section (Graphite.h:55-95), which callers express here
    * as a final catch-all pattern. */
  final case class GraphitePattern(regex: String, fn: String,
                                   retentions: Seq[GraphiteRetention])

  /** GraphiteRollupMergeTree FINAL (GraphiteRollupSortedAlgorithm.cpp +
    * Graphite.h). Each row carries (path, timeSec, value, version). The
    * first pattern whose regex matches the path selects the aggregate
    * function and the retention schedule; the row's age (nowSec - time)
    * selects the coarsest retention band whose ageSec has been reached;
    * the timestamp rounds down to that band's precision. Rows sharing
    * (path, rounded time) collapse to one: value aggregated by the
    * pattern's function, remaining columns from the max-version row.
    *
    * The per-row pattern/precision resolution is a pure `when` chain
    * (whole-stage codegen); the collapse is one hash aggregate on
    * (path, bucket).
    */
  def graphiteRollup(df: DataFrame, pathCol: String, timeCol: String,
                     valueCol: String, versionCol: String,
                     patterns: Seq[GraphitePattern], nowSec: Column): DataFrame = {
    require(patterns.nonEmpty, "graphiteRollup: at least one pattern")
    val path = col(pathCol)
    val age = nowSec - col(timeCol)

    def precisionFor(p: GraphitePattern): Column = {
      // Coarsest band whose age threshold is reached; a row younger than
      // every band keeps its exact timestamp (precision 1 — the
      // reference's selectPrecision returns 1 when no retention matches,
      // GraphiteRollupSortedAlgorithm.cpp:107-119).
      val sorted = p.retentions.sortBy(_.ageSec)
      val reached = if (sorted.head.ageSec <= 0) sorted.tail else sorted
      val init: Column =
        if (sorted.head.ageSec <= 0) lit(sorted.head.precisionSec) else lit(1L)
      reached.foldLeft(init) { (acc, r) =>
        when(age >= r.ageSec, lit(r.precisionSec)).otherwise(acc)
      }
    }
    // First-match-wins chains, built from the right.
    val fnCol = patterns.reverse.foldLeft(lit(patterns.last.fn)) { (acc, p) =>
      when(path.rlike(p.regex), lit(p.fn)).otherwise(acc)
    }
    val precCol = patterns.reverse.foldLeft(precisionFor(patterns.last)) { (acc, p) =>
      when(path.rlike(p.regex), precisionFor(p)).otherwise(acc)
    }

    val bucket = (col(timeCol) - pmod(col(timeCol), precCol)).as("_bucket")
    val others = df.columns.filterNot(c =>
      c == pathCol || c == timeCol || c == valueCol).toSeq

    val withMeta = df
      .withColumn("_fn", fnCol)
      .withColumn("_bucket", bucket)
    val v = col(valueCol)
    withMeta.groupBy(path, col("_bucket"))
      .agg(
        first(col("_fn")).as("_fn"),
        avg(v).as("_avg"), sum(v).as("_sum"), min(v).as("_min"), max(v).as("_max"),
        max_by(struct(others.map(col): _*), col(versionCol)).as("_latest"))
      .select(
        Seq(path, col("_bucket").as(timeCol),
          when(col("_fn") === "avg", col("_avg"))
            .when(col("_fn") === "sum", col("_sum"))
            .when(col("_fn") === "min", col("_min"))
            .otherwise(col("_max")).as(valueCol)) ++
        others.map(c => col(s"_latest.$c").as(c)): _*)
  }
}
