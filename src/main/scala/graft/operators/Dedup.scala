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

  /** Word n-gram shingles from a PRE-MATERIALIZED token array column.
    *
    * The token column must be a bound attribute (use
    * `.withColumn("toks", split(normalized(text), " "))` first), NOT the
    * split expression inline: interpreted eval has no common-subexpression
    * elimination, so an inline `split(regexp_replace(...))` referenced
    * inside the transform lambda re-tokenizes the whole document once PER
    * ELEMENT — O(len²) regex work per row (observed 100× slowdowns). */
  def shinglesFromToks(toks: Column, n: Int): Column =
    array_distinct(filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          array_join(slice(toks, i + 1, lit(n)), " "))),
      x => x.isNotNull))

  /** Convenience: tokens column for shinglesFromToks. */
  def tokenize(text: Column): Column = split(normalized(text), " ")

  /** MinHash signature family: each shingle is string-hashed ONCE, then
    * the i-th hash function re-hashes the resulting LONG with seed i —
    * fixed-width integer hashing instead of the naive 64× string hashing
    * that dominated the benchmark. Computed by the native one-pass
    * MinHashSignature expression (bit-identical to the HOF composition
    * `transform(sequence(...), i => array_min(transform(hs, h =>
    * xxhash64(i, h))))`, which swept the shingle array once per seed
    * through interpreted lambdas and was the remaining LSH bottleneck). */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftScalar.minhashSig(shingleHashes, numHashes)

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

    // hash each shingle ONCE via the fused native shingle_hashes pass;
    // signatures and verification both work on the long hashes (collision
    // probability ~ |shingles|²/2^64 ≈ 0).
    // repartition by id: corpus files are few/large, and shingling is the
    // CPU-heavy step — spread it across all cores before computing.
    // persisted: (a) reused three times (signatures + both verify joins);
    // (b) the cache is a hard optimizer barrier — without it
    // CollapseProject can inline the `hs` expression into downstream
    // projections and re-shingle per reference. Same requirement as Spark
    // MLlib's MinHashLSH (cache your input).
    val hashed = graft.Tables.registerScratch(
      df.select(col(idCol).as("id"), col(textCol).as("_text"))
        .repartition(col("id"))
        .select(col("id"),
          GraftScalar.shingleHashes(tokenize(col("_text")), shingleSize).as("hs"))
        .filter(size(col("hs")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sigs = hashed.withColumn("sig", minhashSignature(col("hs"), numHashes))

    // (band, bucket, id) ONLY — shingle payloads are NOT carried through
    // the band join (carrying them multiplied shuffle volume 16× and
    // dominated runtime).
    // bucket = fnv1a64("<band>|<sig slice joined>") — FNV-1a (not
    // xxhash64) so the DuckDB oracle can recompute the exact buckets
    val banded = sigs.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => GraftScalar.fnv1a64(concat(b.cast("string"), lit("|"), array_join(
          transform(slice(col("sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand)),
            h => h.cast("string")), ","))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val candidates = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact-Jaccard verification only on the (few) candidates: re-join the
    // hashed shingle sets by id.
    candidates
      .join(hashed.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash fingerprints + banded Hamming near-dup pairs: fingerprints
    * within `maxHamming` bits, blocked on 4×16-bit chunks (a pair within
    * Hamming distance 3 must agree on at least one chunk). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), col(textCol).as("_text"))
      .repartition(col("id"))
      .select(col("id"),
        GraftScalar.simhash64(split(normalized(col("_text")), " ")).as("fp"))
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
    * same `blockCol` value and |len| within `lenTol`).
    *
    * Candidates come ONLY from the inverted index (shingle-level
    * self-join + count): a pair with zero shared shingles can never clear
    * a positive threshold, so enumerating the all-blocked-pairs frame —
    * O(n²) per block, the round-2 scale-killer — is never needed.
    * `threshold` must therefore be > 0. Cost is Σ per-shingle freq²,
    * near-linear for natural corpora; both joins are plain equi-joins
    * Catalyst shuffles by key. This is the formulation that survives
    * 100×.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, lenCol: String,
                        lenTol: Int, n: Int, threshold: Double): DataFrame = {
    require(threshold > 0,
      "threshold must be > 0: candidates derive from the inverted index " +
        "(zero-overlap pairs are by construction not near-duplicates)")
    // persisted: reused by both the inverted index and the size frame
    // (and acts as the optimizer barrier — see minhashLshPairs). Shingles
    // are kept as their 64-bit hashes (fused native pass): set sizes and
    // intersection counts are identical to the string-shingle forms.
    val withSh = graft.Tables.registerScratch(
      df.select(col(idCol).as("id"), col(blockCol).as("blk"),
        col(lenCol).as("len"), col(textCol).as("_text"))
        .repartition(col("id"))
        .select(col("id"), col("blk"), col("len"),
          GraftScalar.shingleHashes(tokenize(col("_text")), n).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = withSh.select(col("id"), size(col("sh")).as("sz"))

    // inverted index: (blk, shingle-hash, id, len); shingles are distinct
    // per doc so counts are set intersections.
    val toks = withSh.select(col("blk"), col("id"), col("len"),
      explode(col("sh")).as("h"))
    val inter = toks.select(col("blk"), col("h"), col("id").as("id_a"), col("len").as("len_a"))
      .join(toks.select(col("blk"), col("h"), col("id").as("id_b"), col("len").as("len_b")),
        Seq("blk", "h"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lenTol)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"))

    // candidates = overlapping pairs only; attach set sizes by id.
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        col("i").cast("double") /
          (col("sz_a") + col("sz_b") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Connected components over a near-dup pair graph by iterative
    * min-label propagation: every node starts as its own component and
    * repeatedly adopts the minimum label among itself and its
    * neighbors, until a fixpoint (converges in graph-diameter rounds —
    * near-dup components are shallow clusters, so a handful). This is
    * the canonical-document backbone of a dedup pipeline: after
    * componentizing the MinHash/SimHash pair output, keep min(doc_id)
    * per component and drop the rest.
    *
    * Each round is two shuffles (join on node id + groupBy on neighbor)
    * over the label frame — at 100 TB the label frame is one long per
    * document, orders smaller than the corpus, and the same shape
    * GraphFrames' large-star/small-star CC uses. No driver-side data;
    * the convergence check is a count.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val sym0 = pairs.toDF("a", "b")
    val edges0 = sym0.select(col("a").as("src"), col("b").as("dst"))
      .union(sym0.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size the loop's shuffles to the graph, not the session default: the
    // iteration re-shuffles the label frame many times, and a small pair
    // graph on 32-way partitions pays ~10x the wall clock in pure task
    // scheduling. ~100k edges per partition keeps partitions meaningful
    // at any scale (a 10^11-edge graph still gets the full session width).
    val nEdges = edges0.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nEdges / 100000L).toInt + 1))
    val edges = edges0.repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count(): Unit
    edges0.unpersist(false)
    // The loop's own shuffles (two joins + one group-by per round, times
    // O(log diameter) rounds) must track the SAME graph-derived width:
    // they planned at the session default (cores), so a 1.5 k-edge graph
    // paid 3×32-task exchanges per round of pure scheduling — the
    // dominant cost of the whole operator at small scale, and at cluster
    // scale the session default is equally wrong in the other direction.
    // Scoped to the loop and restored after (guide §2.2: size partitions
    // to the data).
    // NOTE (advisor r16): these conf flips are session-global for the
    // duration of the loop — a CONCURRENT query on the same SparkSession
    // would plan under the temporary width/AQE settings. The engine's
    // query harness (Bench/Verify/gates) runs queries sequentially per
    // session, which is the assumption here; a multi-tenant caller
    // should wrap this operator in spark.newSession().
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE materializes every exchange as its own stage-job: with the
    // loop's shuffles already sized to the graph there is nothing left
    // for it to re-optimize, and each round was paying 3-4 extra driver
    // round-trips (stage submit + re-plan) of pure latency. Scoped to
    // the loop, restored with the width below.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // Every round's frame is eagerly localCheckpoint'ed: the self-join
    // makes each round's LOGICAL PLAN reference the previous round's
    // several times, so without lineage truncation the plan grows ~4x
    // per round — exponential analysis/planning cost and an eventual
    // driver OOM (persist caches data but keeps lineage). Checkpointing
    // is the standard contract for iterative Spark algorithms.
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .groupBy(col("dst").as("nid")).agg(min(col("comp")).as("nbr_comp"))
      val hop = labels
        .join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("ncomp"),
          coalesce(col("nbr_comp") < col("comp"), lit(false)).as("chg1"))
      // pointer jumping: adopt the label OF the label, collapsing chains
      // exponentially — a diameter-D path converges in O(log D) rounds
      // instead of D (a 1M-doc chain would never finish one hop at a
      // time within any fixed round budget). Convergence is detected by
      // a per-row changed flag carried through the round — works for any
      // orderable id type (strings included) and for empty inputs, with
      // no extra shuffle (the count runs on the checkpointed frame).
      val jumped = hop
        .join(hop.select(col("id").as("jid"), col("ncomp").as("jcomp")),
          hop("ncomp") === col("jid"), "left")
        .select(hop("id"),
          least(hop("ncomp"), coalesce(col("jcomp"), hop("ncomp"))).as("comp"),
          (hop("chg1") ||
            coalesce(col("jcomp") < hop("ncomp"), lit(false))).as("chg"))
        .localCheckpoint(true)
      val changed = jumped.filter(col("chg")).count()
      labels = jumped.select(col("id"), col("comp"))
      done = changed == 0
      iter += 1
    }
    edges.unpersist(false)
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (rounds needed grow with log(component diameter))")
    labels.select(col("id"), col("comp"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Keep one canonical document per near-dup component: docs not in
    * any pair pass through, paired docs survive only as min(id) of
    * their component. */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")
  }
}
