package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Projections
import graft.rest.{Catalog, ColumnDef, TableDef}
import graft.streaming.WalCommitter

/** Projection freshness + registration-race contract.
  *
  * The reference refreshes materialized views FROM the insert path
  * (`src/Storages/StorageMaterializedView.cpp` — every inserted block is
  * pushed through the dependent views); graft's equivalent is
  * [[Projections.invalidatePath]], fired by Catalog.ingest/ingestRaw and
  * WalCommitter.commitBatch. These specs assert the full contract:
  * register → append → the ROUTED query (same base lineage, still
  * shuffle-free) sees the appended rows and matches the un-routed path.
  */
class ProjectionFreshnessSpec extends AnyFunSuite {
  import TestSpark._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def aboveCache(plan: String): Seq[String] =
    plan.linesIterator.takeWhile(l => !l.contains("InMemoryRelation")).toSeq

  test("catalog ingest refreshes registered projections: routed sees new rows") {
    val root = java.nio.file.Files.createTempDirectory("proj_fresh").toString
    val catalog = new Catalog(spark, root)
    catalog.create(TableDef("pf_t",
      Seq(ColumnDef("k", "BIGINT"), ColumnDef("v", "BIGINT")),
      orderBy = Seq("k"), granularity = "D"))
    catalog.ingest("pf_t", Seq("k", "v"),
      (0 until 200).map(i => Seq((i % 10).toString, i.toString)))

    // ONE shared base lineage — projections route by attribute identity,
    // exactly how Tables-style shared DataFrames are used in production
    val base = catalog.table("pf_t")
    // carry _time too: the catalog read projects (k, v, _time), and
    // routing requires every referenced base column to be carried
    Projections.register(spark, base, Seq("k"), Seq("k", "v", "_time"))
    try {
      def routedAgg: DataFrame =
        base.groupBy(col("k")).agg(sum(col("v")).as("s"))
      def resultOf(df: DataFrame): Map[Long, Long] =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val p0 = physical(routedAgg)
      assert(!aboveCache(p0).exists(_.contains("Exchange")),
        s"agg did not route to the projection:\n$p0")
      val before = resultOf(routedAgg)

      // append THROUGH the ingest path — this must fire the refresh hook
      catalog.ingest("pf_t", Seq("k", "v"),
        (0 until 50).map(i => Seq((i % 10).toString, (1000 + i).toString)))

      val p1 = physical(routedAgg)
      assert(!aboveCache(p1).exists(_.contains("Exchange")),
        s"rebuilt projection no longer routes:\n$p1")
      val after = resultOf(routedAgg)
      assert(after != before, "routed query still serves the stale snapshot")

      // the un-routed truth: a FRESH read of the table (different
      // exprIds, so the projection never serves it — asserted below)
      val fresh = catalog.table("pf_t")
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
      assert(physical(fresh).contains("Exchange"),
        "fresh-lineage control query unexpectedly routed")
      assert(after == resultOf(fresh),
        "routed result diverges from the un-routed path after ingest")
    } finally Projections.clear()
  }

  test("WAL commit refreshes registered projections over the table path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("proj_wal").toString
    val table = s"$dir/t"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(table)

    val base = spark.read.parquet(table)
    Projections.register(spark, base, Seq("k"), Seq("k", "v"))
    try {
      def routed: Map[Long, Long] =
        base.groupBy(col("k")).agg(sum(col("v")).as("s"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(routed == Map(1L -> 10L, 2L -> 20L))

      val committer = new WalCommitter(table)
      committer.commitBatch(
        Seq((0, 0L, "a", 3L, 30L), (0, 1L, "b", 3L, 12L))
          .toDF("_wal_partition", "_wal_sn", "_idem", "k", "v"))

      assert(routed == Map(1L -> 10L, 2L -> 20L, 3L -> 42L),
        "WAL-committed rows not visible through the projection")
    } finally Projections.clear()
  }

  test("concurrent registration of the same triple builds exactly one projection") {
    import spark.implicits._
    val base = spark.range(10000)
      .select((col("id") % 100).as("k"), col("id").as("v")).persist()
    base.count()
    val n0 = Projections.registeredCount
    try {
      val pool = Executors.newFixedThreadPool(8)
      val start = new CountDownLatch(1)
      val results = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[DataFrame] {
          override def call(): DataFrame = {
            start.await()
            Projections.register(spark, base, Seq("k"), Seq("k", "v"))
          }
        })
      }
      start.countDown()
      val dfs = results.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(Projections.registeredCount == n0 + 1,
        "racing registrations created duplicate projections")
      // every caller got the one registered projection
      assert(dfs.forall(_.count() == 10000))
    } finally {
      Projections.clear()
      base.unpersist(false)
    }
  }
}
