package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two tiers:
  *
  *  - brute-force cosine top-k: exact baseline. The query vector is a
  *    literal broadcast into the plan, similarity is a pure-Column
  *    zip_with/aggregate dot product (codegen), top-k is
  *    TakeOrderedAndProject — a full scan but NO shuffle of the corpus
  *    and no driver collect. At 100 TB: scan-bound, embarrassingly
  *    parallel.
  *  - random-hyperplane LSH (Charikar, STOC 2002): `nPlanes` signed
  *    projections pack into a bit signature; candidates share a
  *    signature bucket, then exact cosine re-ranks within buckets. The
  *    scale path: bucket join instead of full scan.
  */
object Ann {

  /** Cosine similarity between an embedding column and a literal query
    * vector, as a pure Column expression. */
  def cosineToQuery(emb: Column, query: Seq[Float]): Column = {
    // double accumulation via the native dot_arr expression (float inputs
    // are widened per element — matches the DuckDB oracle's double math).
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val dot = graft.functions.GraftScalar.dotArr(emb, q)
    val ne = sqrt(graft.functions.GraftScalar.dotArr(emb, emb))
    val nq = math.sqrt(query.map(v => v.toDouble * v).sum)
    dot / (ne * lit(nq))
  }

  /** Exact top-k by cosine against a literal query vector.
    * Output: (id, cosine) ordered desc with id tiebreak. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Seq[Float], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        round(cosineToQuery(col(embCol), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** Random-hyperplane signature: bit i = sign of dot(emb, plane_i).
    * Planes are pseudo-random but deterministic: plane_i[d] derives from
    * a hash of (seed, i, d) mapped to ±1 — reproducible across jobs
    * without shipping plane matrices. */
  def rhpSignature(emb: Column, nPlanes: Int, dim: Int, seed: Int = 42): Column = {
    val planeBits = (0 until nPlanes).map { p =>
      // ±1 plane components via xxhash64 parity — deterministic, cheap.
      val dot = aggregate(
        zip_with(emb,
          transform(sequence(lit(0), lit(dim - 1)),
            d => when(pmod(xxhash64(lit(seed), lit(p), d), lit(2)) === 0, 1.0d).otherwise(-1.0d)),
          (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planeBits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine, but only within same-signature
    * buckets. Returns (id, cosine) top-k for the query among candidates
    * sharing the query's bucket; recall depends on nPlanes (tested in
    * AnnSpec against brute force). */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Float], k: Int, nPlanes: Int = 8): DataFrame = {
    val dim = query.length
    val sigs = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      rhpSignature(col(embCol), nPlanes, dim).as("sig"))
    val qLit = array(query.map(lit): _*)
    val qSigRow = df.sparkSession.range(1)
      .select(rhpSignature(qLit, nPlanes, dim).as("sig"))
    sigs.join(broadcast(qSigRow), Seq("sig"))
      .select(col("id"), round(cosineToQuery(col("emb"), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All-pairs top-N most similar (small corpora / within-bucket rerank).
    * O(n²) — intended for candidate sets, not the full corpus. */
  def topSimilarPairs(df: DataFrame, idCol: String, embCol: String,
                      topN: Int): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    // norms computed ONCE per vector, not once per pair; repartition the
    // probe side so the pair loop parallelizes even from one input file.
    val withNorm = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(dotArr(col(embCol), col(embCol))).as("nrm"))
      .repartition(col("id"))
    val a = withNorm.select(col("id").as("id_a"), col("emb").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b = withNorm.select(col("id").as("id_b"), col("emb").as("emb_b"),
      col("nrm").as("nrm_b"))
    // broadcast the build side explicitly: leaves the probe side's 32-way
    // partitioning intact (BroadcastNestedLoopJoin) instead of letting the
    // planner pick a cartesian shuffle.
    a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotArr(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }
}
