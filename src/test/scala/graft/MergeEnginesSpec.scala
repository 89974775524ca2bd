package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeEngines
import graft.operators.MergeEngines.{GraphitePattern, GraphiteRetention}

/** Pins the collapse semantics of the specialized engine family to the
  * reference's merge algorithms (daisy
  * `src/Processors/Merges/Algorithms/CollapsingSortedAlgorithm.cpp:69-106`,
  * `VersionedCollapsingAlgorithm.cpp:61-155`,
  * `SummingSortedAlgorithm.cpp:445-560`, `Graphite.h:25-57`) with
  * hand-built inputs whose expected outputs are derivable on paper. */
class MergeEnginesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (key, seq, sign, payload)
  private def collapse(rows: Seq[(Int, Long, Int, String)],
                       onlyPositive: Boolean = false) =
    MergeEngines.collapseFinal(
        rows.toDF("k", "seq", "sign", "p"), Seq("k"), "sign", "seq",
        onlyPositive)
      .select("k", "seq", "sign", "p")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet

  test("collapsing: state row then cancel annihilates; trailing state survives") {
    val out = collapse(Seq(
      (1, 1L, 1, "a"), (1, 2L, -1, "a"),             // balanced, ends on cancel
      (2, 1L, 1, "b"), (2, 2L, -1, "b"), (2, 3L, 1, "c"))) // net +1
    assert(out == Set((2, 3L, 1, "c")))
  }

  test("collapsing: balanced key ending on a state row emits BOTH rows") {
    // count_positive == count_negative && last_is_positive → first negative
    // AND last positive, as insertRows() does.
    val out = collapse(Seq((1, 1L, -1, "n"), (1, 2L, 1, "p")))
    assert(out == Set((1, 1L, -1, "n"), (1, 2L, 1, "p")))
  }

  test("collapsing: more cancels than states emits the first negative") {
    val out = collapse(Seq((1, 1L, -1, "n1"), (1, 2L, -1, "n2"), (1, 3L, 1, "p")))
    assert(out == Set((1, 1L, -1, "n1")))
  }

  test("collapsing: only_positive_sign suppresses the negative emit") {
    val out = collapse(Seq((1, 1L, -1, "n1"), (1, 2L, -1, "n2"), (1, 3L, 1, "p")),
      onlyPositive = true)
    assert(out == Set.empty[(Int, Long, Int, String)])
    val out2 = collapse(Seq((1, 1L, -1, "n"), (1, 2L, 1, "p")), onlyPositive = true)
    assert(out2 == Set((1, 2L, 1, "p")))
  }

  test("versioned collapsing: pairs cancel per (key, version); survivors are newest majority rows") {
    val df = Seq(
      // key 1 version 10: +,- → vanish
      (1, 10L, 1L, 1), (1, 10L, 2L, -1),
      // key 1 version 20: +,+,- → one survivor, the newest positive
      (1, 20L, 3L, 1), (1, 20L, 4L, 1), (1, 20L, 5L, -1),
      // key 2 version 10: lone cancel survives (net -1)
      (2, 10L, 6L, -1)
    ).toDF("k", "v", "seq", "sign")
    val out = MergeEngines.versionedCollapseFinal(df, Seq("k"), "v", "sign", "seq")
      .select("k", "v", "seq", "sign")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(out == Set((1, 20L, 4L, 1), (2, 10L, 6L, -1)))
  }

  test("summing: sums configured columns, keeps first payload, drops all-zero keys") {
    val df = Seq(
      (1, 10.0, 1L, "first"), (1, 5.0, 2L, "second"),
      (2, 3.0, 3L, "x"), (2, -3.0, 4L, "y")  // sums to zero → dropped
    ).toDF("k", "m", "seq", "p")
    val out = MergeEngines.summingFinal(df, Seq("k"), Seq("m"), "seq")
      .select("k", "m", "p")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
    assert(out == Set((1, 15.0, "first")))
  }

  test("graphite rollup: pattern selects fn, age selects precision, max-version payload wins") {
    val now = 1000000L
    val df = Seq(
      // path "m.sum": young rows, 10s buckets → two rows in one bucket sum
      ("m.sum", now - 5L, 1.0, 1L), ("m.sum", now - 8L, 2.0, 2L),
      // path "m.sum": old row (age >= 100), 100s bucket
      ("m.sum", now - 150L, 5.0, 3L),
      // path "other": avg fn, young band
      ("other", now - 5L, 4.0, 4L), ("other", now - 9L, 6.0, 5L)
    ).toDF("path", "t", "value", "ver")
    val patterns = Seq(
      GraphitePattern("^m\\.sum$", "sum",
        Seq(GraphiteRetention(0L, 10L), GraphiteRetention(100L, 100L))),
      GraphitePattern("^.*$", "avg", Seq(GraphiteRetention(0L, 10L))))
    val out = MergeEngines.graphiteRollup(df, "path", "t", "value", "ver",
        patterns, lit(now))
      .select("path", "t", "value", "ver")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val youngBucket = (now - 8L) - ((now - 8L) % 10L)
    val oldBucket = (now - 150L) - ((now - 150L) % 100L)
    assert(out == Set(
      ("m.sum", youngBucket, 3.0, 2L),   // 1.0 + 2.0, max-version payload
      ("m.sum", oldBucket, 5.0, 3L),
      ("other", youngBucket, 5.0, 5L)))  // avg(4, 6)
  }

  test("versioned collapsing counts duplicate seq values one at a time (ROWS frame)") {
    // (+, seq=5), (+, seq=5), (-, seq=9): net = +1 → exactly one survivor.
    // A RANGE frame would count both seq=5 peers at once and emit none.
    val df = Seq((1, 10L, 5L, 1), (1, 10L, 5L, 1), (1, 10L, 9L, -1))
      .toDF("k", "v", "seq", "sign")
    val out = MergeEngines.versionedCollapseFinal(df, Seq("k"), "v", "sign", "seq")
    assert(out.count() == 1 && out.head.getInt(3) == 1)
  }

  test("graphite rollup keeps exact timestamps for rows younger than the first retention band") {
    val now = 1000L
    val df = Seq(("m", now - 5L, 1.0, 1L), ("m", now - 6L, 2.0, 2L),
                 ("m", now - 200L, 4.0, 3L))
      .toDF("path", "t", "value", "ver")
    // first band only starts at age 100 → the two young rows stay raw
    val patterns = Seq(MergeEngines.GraphitePattern("^.*$", "sum",
      Seq(MergeEngines.GraphiteRetention(100L, 100L))))
    val out = MergeEngines.graphiteRollup(df, "path", "t", "value", "ver",
        patterns, lit(now))
      .select("t", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((now - 5L, 1.0), (now - 6L, 2.0), (800L, 4.0)), out)
  }

  test("engine queries match hand-rolled equivalents on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    val collapsed = SparkEntry.queries("q_engine_collapsing")(spark, dir)
    // Survivor count bounded by 2 per user and at least one user survives.
    val users = Tables.load(spark, dir, "events")
      .select(countDistinct($"user_id")).as[Long].head()
    val perUser = collapsed.groupBy("user_id").count()
      .agg(max("count")).as[Long].head()
    assert(collapsed.count() > 0 && perUser <= 2)
    assert(collapsed.select(countDistinct($"user_id")).as[Long].head() <= users)

    // VersionedCollapsing: survivors per (user, version) = |Σ sign|.
    val e = Tables.load(spark, dir, "events").select(
      $"user_id", (col("event_id") % 4).as("version"),
      when(col("event_id") % 3 === 0, -1).otherwise(1).as("sign"))
    val expected = e.groupBy("user_id", "version")
      .agg(abs(sum($"sign")).as("n")).agg(sum($"n")).as[Long].head()
    val got = SparkEntry.queries("q_engine_vercollapse")(spark, dir).count()
    assert(got == expected)

    // Summing preserves the total value (nothing sums to exactly zero here).
    val total = Tables.load(spark, dir, "events")
      .agg(round(sum($"value"), 0)).as[Double].head()
    val summed = SparkEntry.queries("q_engine_summing")(spark, dir)
      .agg(round(sum($"value"), 0)).as[Double].head()
    assert(math.abs(total - summed) <= 1.0)

    // Graphite rollup buckets are coarser than the raw rows.
    val rolled = SparkEntry.queries("q_engine_graphite")(spark, dir)
    assert(rolled.count() > 0 &&
      rolled.count() < Tables.load(spark, dir, "events").count())
  }
}
