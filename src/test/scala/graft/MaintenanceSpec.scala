package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Maintenance
import graft.sql.Search

class MaintenanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("TTL expiry removes only rows older than the cutoff") {
    val dir = "/root/repo/target/ttl_test"
    Tables.load(spark, sf, "events").withColumnRenamed("ts", "_time")
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val expectKept = spark.read.parquet(dir)
      .filter($"_time" >= "2024-01-15 00:00:00").count()
    val (kept, dropped) = Maintenance.expireOlderThan(
      spark, dir, "_time", "2024-01-15 00:00:00")
    assert(kept == expectKept && kept + dropped == before)
    assert(spark.read.parquet(dir).count() == kept)
    assert(spark.read.parquet(dir)
      .filter($"_time" < "2024-01-15 00:00:00").count() == 0)
  }

  test("OPTIMIZE compacts many small files into the target count, preserving rows") {
    val dir = "/root/repo/target/compact_test"
    Tables.load(spark, sf, "lineitem")
      .repartition(24).write.mode("overwrite").parquet(dir)
    assert(Maintenance.fileCount(spark, dir) >= 20)
    val before = spark.read.parquet(dir).count()
    val n = Maintenance.compact(spark, dir, targetFiles = 2,
      sortBy = Seq("l_orderkey"))
    assert(n == before)
    assert(Maintenance.fileCount(spark, dir) <= 2)
    assert(spark.read.parquet(dir).count() == before)
  }

  test("ALTER DELETE drops matching rows; NULL predicate rows are kept") {
    val dir = "/root/repo/target/mutdel_test"
    Seq((1, Some(5)), (2, Some(20)), (3, None: Option[Int]))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    val (kept, deleted) = Maintenance.mutateDelete(spark, dir, "v > 10")
    assert(kept == 2 && deleted == 1)
    assert(spark.read.parquet(dir).select($"id").as[Int].collect().sorted
      .sameElements(Array(1, 3)))
  }

  test("ALTER UPDATE evaluates assignments on the pre-mutation row and casts to the column type") {
    val dir = "/root/repo/target/mutupd_test"
    Seq((1, 10L, 100L), (2, 20L, 200L)).toDF("id", "a", "b")
      .write.mode("overwrite").parquet(dir)
    // simultaneous swap + a double-typed expression cast back to LONG:
    // both read the ORIGINAL a/b (MutationsInterpreter semantics)
    val matched = Maintenance.mutateUpdate(spark, dir,
      Seq("a" -> "b", "b" -> "a + 0.9"), "id = 1")
    assert(matched == 1)
    val out = spark.read.parquet(dir).orderBy($"id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(Array((1, 100L, 10L), (2, 20L, 200L))))
  }

  test("ALTER UPDATE rejects duplicate assignments to one column") {
    val dir = "/root/repo/target/mutupd_dup_test"
    Seq((1, 10L)).toDF("id", "a").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Maintenance.mutateUpdate(spark, dir, Seq("a" -> "1", "a" -> "2"), "true")
    }
    assert(e.getMessage.contains("duplicate assignment"))
  }

  test("analyzer endpoint returns plans without executing") {
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders_an")
    val out = Search.analyze(spark,
      "SELECT o_orderstatus, count(*) FROM orders_an GROUP BY 1")
    assert(out.contains("== Optimized ==") && out.contains("== Physical =="))
    assert(out.contains("HashAggregate") || out.contains("Aggregate"))
  }

  test("HLL sketch states survive parquet round-trip and merge in a fresh read") {
    val dir = "/root/repo/target/sketch_test"
    val li = Tables.load(spark, sf, "lineitem")
    li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_partkey").as("state"))
      .write.mode("overwrite").parquet(dir)
    // new read (fresh plan — simulates a later job consuming the states)
    val est = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg($"state")).as("e"))
      .head.getLong(0)
    val exact = li.select(countDistinct($"l_partkey")).head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }
}
