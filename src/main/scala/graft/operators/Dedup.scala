package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftScalar

/** Deduplication operators for training-data pipelines. All four tiers
  * are shuffle-bounded and scale-safe:
  *
  *  - exact:      hash-groupBy on a normalized digest — one shuffle.
  *  - MinHash+LSH: shingle → per-band signature → bucket self-join.
  *    Candidate generation touches only same-bucket docs, never the full
  *    O(n²) cross product; the band self-join is an equi-join Catalyst
  *    shuffles on bucket key (AQE handles hot buckets).
  *  - SimHash:    64-bit fingerprint (custom Catalyst expression) +
  *    banded Hamming blocking.
  *  - n-gram Jaccard: exact verification on candidate pairs only.
  *
  * Public algorithms: Broder, "On the resemblance and containment of
  * documents" (1997) for MinHash; Charikar (STOC 2002) for SimHash.
  */
object Dedup {

  /** Lowercased, whitespace-collapsed text for stable digests. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact dedup: keep the smallest id per normalized-text digest.
    * Returns (kept id, digest, group size). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalized(col(textCol)).cast("binary")).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of `text` (distinct, sorted for determinism). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(normalized(text), " ")
    array_distinct(filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          array_join(slice(toks, i + 1, lit(n)), " "))),
      x => x.isNotNull))
  }

  /** MinHash signature: for seed s in 0..numHashes-1, the min over
    * shingles of xxhash64(seed, shingle). Pure Column expressions — stays
    * in codegen, no UDF. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleCol, s => xxhash64(seed, s))))

  /** LSH candidate pairs from banded minhash signatures, verified with
    * exact Jaccard over the shingle sets. Output: (id_a, id_b, jaccard)
    * for pairs whose estimated similarity cleared at least one band and
    * whose exact Jaccard >= threshold.
    *
    * bands * rowsPerBand must == numHashes.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleSize: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val sigs = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // (band_id, band_hash, id, shingles): one row per band per doc.
    val banded = sigs.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, array_join(
          transform(slice(col("sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand)),
            h => h.cast("string")), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // same-bucket candidates (id_a < id_b), deduped across bands.
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash fingerprints + banded Hamming near-dup pairs: fingerprints
    * within `maxHamming` bits, blocked on 4×16-bit chunks (a pair within
    * Hamming distance 3 must agree on at least one chunk). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      GraftScalar.simhash64(split(normalized(col(textCol)), " ")).as("fp"))
    // 4 chunks of 16 bits each as blocking keys
    val chunked = fp.select(col("id"), col("fp"),
      posexplode(array((0 to 3).map(i =>
        shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk")
    val a = chunked.select(col("chunk_id"), col("chunk"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk_id"), col("chunk"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", GraftScalar.hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity on blocked candidate pairs (blocking:
    * same `blockCol` value and |n_chars| within `lenTol`). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, lenCol: String,
                        lenTol: Int, n: Int, threshold: Double): DataFrame = {
    val withSh = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(lenCol).as("len"), shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col("blk"), col("id").as("id_a"),
      col("len").as("len_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("blk"), col("id").as("id_b"),
      col("len").as("len_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lenTol)
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
