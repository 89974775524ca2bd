package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, WithFill}

class OperatorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("asof backward non-strict picks row at-or-before, strict picks strictly-before") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 7L, "r7"))
      .toDF("k", "t", "rv")

    val nonStrict = AsofJoin.leftAsofBackward(left, right, Seq("k"), "t", "t")
      .select($"lv", $"asof_rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nonStrict == Map("p1" -> "r10", "p2" -> "r15", "p3" -> null))

    val strict = AsofJoin.leftAsofBackward(left, right, Seq("k"), "t", "t", strict = true)
      .select($"lv", $"asof_rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strict == Map("p1" -> null, "p2" -> "r15", "p3" -> null))
  }

  test("asof carries all right payload columns and preserves left row count") {
    val e = Tables.load(spark, sf, "events").withColumn("t_us", unix_micros($"ts"))
    val p = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"t_us")
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"t_us", $"event_id".as("vid"), $"value".as("vval"))
    val joined = AsofJoin.leftAsofBackward(p, v, Seq("user_id"), "t_us", "t_us")
    assert(joined.count() == p.count())
    assert(joined.columns.toSet ==
      Set("event_id", "user_id", "t_us", "asof_t_us", "asof_vid", "asof_vval"))
  }

  test("withFill densifies gaps with zeros") {
    val df = Seq((0L, 5L), (30L, 2L)).toDF("axis", "n")
    val filled = WithFill.fillGaps(df, "axis", 10L, Seq("n"))
      .orderBy($"axis").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(filled.toSeq == Seq((0L, 5L), (10L, 0L), (20L, 0L), (30L, 2L)))
  }

  test("per-key fillInterpolate fills each series independently with a " +
    "keyed (not single-partition) window") {
    val df = Seq(("a", 0L, 0.0), ("a", 30L, 3.0), ("b", 10L, 10.0), ("b", 40L, 40.0))
      .toDF("k", "axis", "v")
    val filled = WithFill.fillInterpolate(df, "axis", 10L, Seq("v"),
      seriesKeys = Seq("k"))
    val rows = filled.orderBy($"k", $"axis").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("a", 0L, 0.0), ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("b", 10L, 10.0), ("b", 20L, 20.0), ("b", 30L, 30.0), ("b", 40L, 40.0)))
    // each key's series spans only its own bounds, and the window sorts
    // per key: no single-partition exchange may appear in the plan
    val plan = filled.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition stage:\n$plan")
  }
}
