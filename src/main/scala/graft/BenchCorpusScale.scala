package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup}
import graft.functions.GraftScalar

/** Corpus-tier scale probe (VERDICT r7 #8): drives MinHash LSH and the
  * composed corpus pipeline over a synthetic corpus 3-4 orders larger
  * than sf0.1's 5 k documents, and MEASURES the quantities the
  * operators' 100 TB scaladocs argue about — Σ C(bucket,2) candidate
  * volume and the max bucket — instead of trusting the argument.
  *
  * The corpus is deterministic (xxhash64-derived word salad, 2000-word
  * vocab, 60 words/doc) with planted near-dups: ids with id%40 ∈
  * {38,39} re-derive their words from the block base id and append one
  * unique word, so ~5 % of docs are true near-dups with known
  * structure — LSH must find ≈ 3 pairs per 40-id block (base↔dup1,
  * base↔dup2, dup1↔dup2).
  *
  * Usage: tools/run_corpus_scale.sh [rows] (default 2 M docs ≈ 0.7 GB
  * of text — 400× the sf0.1 corpus).
  */
object BenchCorpusScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong)
      .orElse(sys.env.get("SPARK_GRAFT_CORPUS_ROWS").map(_.toLong))
      .getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-process: see BenchHits100 — a sibling bench JVM exiting can
      // delete a shared local root it created, killing this run's shuffle
      .config("spark.local.dir",
        s"/dev/shm/spark-graft-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    val langs = array(Seq("en", "de", "fr", "es", "zh").map(lit): _*)
    def w(seed: Int, k: org.apache.spark.sql.Column) =
      concat(lit("w"), pmod(xxhash64(lit(seed), col("docKey"), k), lit(2000)))
    val docs = spark.range(rows)
      .withColumn("docKey",
        when(col("id") % 40 >= 38, col("id") - col("id") % 40)
          .otherwise(col("id")))
      .withColumn("text",
        concat(
          array_join(transform(sequence(lit(0), lit(59)), k => w(11, k)), " "),
          when(col("id") % 40 >= 38, concat(lit(" uniq"), col("id")))
            .otherwise(lit(""))))
      .withColumn("lang", element_at(langs, (col("id") % 5 + 1).cast("int")))
      .select(col("id").as("doc_id"), col("text"), col("lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count() // materialize outside timings

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // --- MinHash LSH near-dup mining (the Σ bucket² operator) ---
    val (nPairs, lshSec) = timed {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5).count()
    }
    Tables.releaseScratch()

    // --- bucket-volume measurement (same public banding functions) ---
    val bands = 16; val rowsPerBand = 4
    val banded = docs
      .select(col("doc_id"),
        GraftScalar.shingleHashes(Dedup.tokenize(col("text")), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("hs"), 64))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => GraftScalar.fnv1a64(concat(b.cast("string"), lit("|"), array_join(
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              h => h.cast("string")), ","))))))
    val stats = banded.groupBy(col("pos"), col("col"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand_pairs"),
        count(lit(1)).as("n_buckets"))
      .head()
    val maxBucket = stats.getLong(0)
    val candPairs = stats.getLong(1)
    val nBuckets = stats.getLong(2)

    // --- composed corpus pipeline (q_corpus_pipeline shape) ---
    val (pipeRows, pipeSec) = timed {
      val win = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
      docs
        .withColumn("norm", Dedup.normalized(col("text")))
        .withColumn("toks", split(col("norm"), " "))
        .withColumn("g2", CorpusOps.ngrams(col("toks"), 2))
        .withColumn("digest", md5(col("norm").cast("binary")))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1 &&
          size(col("toks")).between(5, 100000) &&
          (size(col("g2")) - size(array_distinct(col("g2")))).cast("long") * 1000 <=
            lit(600L) * (size(col("toks")) - 1) &&
          ((col("doc_id") % 100000007L) * 2654435761L % 100) <
            when(col("lang") === "en", 50).otherwise(20))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).cast("long").as("total_toks"))
        .collect().map(_.getLong(1)).sum
    }

    val expectPairs = 3L * (rows / 40) // 3 pairs per planted block
    val line =
      s"""{"metric":"corpus_scale","rows":$nDocs,"lsh_sec":$lshSec,"lsh_pairs":$nPairs,"lsh_pairs_expected":$expectPairs,"cand_pairs":$candPairs,"max_bucket":$maxBucket,"n_buckets":$nBuckets,"all_pairs_would_be":${nDocs * (nDocs - 1) / 2},"pipeline_sec":$pipeSec,"pipeline_rows":$pipeRows,"heap":"${Runtime.getRuntime.maxMemory() / (1L << 30)}g"}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_corpus_scale.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
