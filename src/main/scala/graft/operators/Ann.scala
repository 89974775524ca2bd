package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor search and embedding near-dup over an
  * embedding column (array<float>). Three tiers:
  *
  *  - brute-force cosine top-k: exact baseline. The query vector is a
  *    literal broadcast into the plan, similarity is the native dot_arr
  *    expression, top-k is TakeOrderedAndProject — a full scan but NO
  *    shuffle of the corpus and no driver collect. At 100 TB: scan-bound,
  *    embarrassingly parallel.
  *  - sign-band LSH (random-hyperplane family, Charikar STOC 2002, with
  *    axis-aligned planes): each band of `rowsPerBand` dimensions packs
  *    its sign bits into a small signature; vectors agreeing on ANY
  *    band's signature are candidates (banding = built-in multi-probe:
  *    OR over bands, the same amplification MinHash-LSH uses). Pure
  *    bit-arithmetic Columns — stays inside WholeStageCodegen, no
  *    interpreted lambdas (the round-2 rhpSignature weakness), and is
  *    exactly mirrorable in the DuckDB oracle, so the banded candidate
  *    semantics are hash-checked end to end.
  *  - exact rerank: candidates re-scored with exact cosine; only
  *    equi-joins shuffle, never a cross product.
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

  /** Signature of band `band`: the sign bits of dimensions
    * [band*rowsPerBand, (band+1)*rowsPerBand) packed little-endian.
    * Codegen-able bit arithmetic — no HOFs, no custom expression. */
  def signBandSignature(emb: Column, band: Int, rowsPerBand: Int): Column =
    (0 until rowsPerBand).map { i =>
      when(element_at(emb, band * rowsPerBand + i + 1) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Same signature computed driver-side for a literal query vector. */
  def signBandSignatureLocal(query: Seq[Float], band: Int, rowsPerBand: Int): Int =
    (0 until rowsPerBand).map { i =>
      if (query(band * rowsPerBand + i) >= 0) 1 << i else 0
    }.sum

  /** LSH near-dup pairs: top-N most-similar pairs among banded-signature
    * candidates. Replaces the O(n²) crossJoin of rounds 1-2: candidate
    * generation is a (band, sig) self-equi-join — Catalyst shuffles on
    * the bucket key, AQE splits hot buckets — then exact cosine reranks
    * only the candidates. With `bands` bands of `rowsPerBand` sign bits,
    * a random pair collides with probability ~bands/2^rowsPerBand while
    * a true near-dup (cosine → 1) agrees on every band, so recall → 1
    * exactly where near-dup semantics need it. At 10⁸ docs this is the
    * standard banded-LSH cost: Σ bucket², not n². */
  def lshNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                      topN: Int, bands: Int = 4,
                      rowsPerBand: Int = 8): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    val banded = df.select(col(idCol).as("id"),
      posexplode(array((0 until bands).map(b =>
        signBandSignature(col(embCol), b, rowsPerBand)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "sig")
    val candidates = banded.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("sig"), col("id").as("id_b")),
        Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact rerank: re-join embeddings by id (norm computed once per
    // vector, not per pair; ids-only candidates keep the band-join thin).
    val withNorm = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(dotArr(col(embCol), col(embCol))).as("nrm"))
    candidates
      .join(withNorm.select(col("id").as("id_a"), col("emb").as("emb_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(withNorm.select(col("id").as("id_b"), col("emb").as("emb_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotArr(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** LSH-bucketed ANN for one query vector: scan-filter to vectors that
    * agree with the query on at least one band signature (the OR of band
    * equalities is a plain codegen predicate — no join, no shuffle),
    * then exact cosine top-k over the candidates. Recall grows with
    * `bands` (multi-probe amplification) and is asserted against brute
    * force in DataOpsSpec. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Float], k: Int, bands: Int = 2,
              rowsPerBand: Int = 4): DataFrame = {
    val pred = (0 until bands).map { b =>
      signBandSignature(col(embCol), b, rowsPerBand) ===
        lit(signBandSignatureLocal(query, b, rowsPerBand))
    }.reduce(_ || _)
    df.filter(pred)
      .select(col(idCol).as("id"),
        round(cosineToQuery(col(embCol), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path
    * (Sivic & Zisserman "Video Google" 2003; the structure behind FAISS
    * IVF-Flat). Build: k-means over the corpus (Spark ML's distributed
    * Lloyd's), every vector assigned to its nearest centroid — at scale
    * the assignment is the partition/bucket key, so one cell = one
    * co-located file set. Search: score the query against the tiny
    * centroid table (driver-side, nlist entries), take the `nprobe`
    * nearest cells, scan ONLY those cells (partition-prunable filter),
    * exact-rerank with the codegen'd dot product.
    *
    * Returns (index, centers): the index DataFrame (id, cell, emb) and
    * the centroid table. The index MUST be materialized (persist + count,
    * or written bucketed-by-cell) before searching — an unpersisted index
    * is a lazy plan, so Catalyst collapses the cell column back into the
    * scan and re-runs the quantizer model on every row of every query
    * (PlanSpec asserts the materialized shape). */
  def ivfIndex(df: DataFrame, idCol: String, embCol: String,
               nlist: Int, seed: Long = 7L): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      array_to_vector(col(embCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(feats)
    val indexed = model.transform(feats)
      .select(col("id"), col("prediction").as("cell"), col("emb"))
    (indexed, model.clusterCenters.map(_.toArray))
  }

  /** Deterministic IVF build: fixed seeding (the `nlist` lowest-id
    * vectors are the initial centroids) plus `iters` Lloyd steps — the
    * same coarse-quantizer/inverted-cell structure as [[ivfIndex]], but
    * with a fully specified, engine-independent construction so the
    * probe + rerank path is value-reproducible and therefore
    * ORACLE-ABLE: the DuckDB gate recomputes the identical seeding,
    * assignment (euclidean distance, cell-index tie-break), element-wise
    * centroid means, and probing. [[ivfIndex]] (Spark ML k-means||)
    * remains the production builder — its random-init quality is better,
    * but its output depends on the ML library's internals, which no
    * external oracle can replay.
    *
    * Each Lloyd step is two narrow passes over the corpus (assign:
    * codegen'd distance columns + one struct-min; update: posexplode +
    * per-(cell,dim) avg) — no crossJoin, no driver-side data beyond the
    * nlist×dim centroid table, exactly like [[ivfTopK]]'s probe. */
  def ivfIndexDeterministic(df: DataFrame, idCol: String, embCol: String,
                            nlist: Int, iters: Int = 1): (DataFrame, Array[Array[Double]]) = {
    val e = df.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("emb"))
    var centers: Array[Array[Double]] = e.orderBy(col("id")).limit(nlist)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
    require(centers.length >= nlist,
      s"ivfIndexDeterministic: corpus has ${centers.length} rows < nlist=$nlist")
    val dim = centers.head.length

    def assigned: DataFrame =
      e.withColumn("cell", nearestCell(col("emb"), centers))

    for (_ <- 0 until iters) {
      val means = cellMeans(assigned, "emb")
      centers = Array.tabulate(centers.length)(i => means.getOrElse(i, centers(i)))
      assert(means.forall(_._2.length == dim))
    }
    (assigned.select(col("id"), col("cell"), col("emb")), centers)
  }

  /** Element-wise mean per cell (the Lloyd update) of `vecCol`, as one
    * narrow aggregate — shared by the IVF and PQ deterministic builds
    * (cells absent from the result keep their previous centroid at the
    * caller). */
  private def cellMeans(assigned: DataFrame,
                        vecCol: String): Map[Int, Array[Double]] =
    assigned.select(col("cell"), posexplode(col(vecCol)))
      .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("mv"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("ms"))
      .select(col("cell"), transform(col("ms"), s => s.getField("mv")).as("cent"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

  /** Search an [[ivfIndex]]: probe the `nprobe` cells whose centroids are
    * closest to the query (computed on the driver over nlist values),
    * exact cosine top-k inside those cells only. */
  def ivfTopK(index: DataFrame, centers: Array[Array[Double]],
              query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val q = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    val probed = centers.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(_._2)
    index.filter(col("cell").isin(probed.toIndexedSeq: _*))
      .select(col("id"),
        round(cosineToQuery(col("emb"), query), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** SQ8 scalar-quantized ANN (the FAISS ScalarQuantizer/QT_8bit pattern;
    * Jégou et al., "Product quantization for nearest neighbor search",
    * TPAMI 2011 §III introduces the uniform-quantizer baseline). Train:
    * per-dimension [min, max] over the corpus — a single narrow
    * posexplode + groupBy(pos) aggregate, reduced to a dim-sized table
    * (driver-held like the IVF centroid table). Encode: each element
    * maps to an 8-bit level floor((x-min)/scale + 0.5), scale =
    * (max-min)/255 — 4× smaller than float32 storage, the actual point
    * of SQ at 100 TB: the scan reads codes, not floats. Search: distances
    * are computed on the RECONSTRUCTED values min + code*scale, so the
    * whole chain (train, encode, reconstruct, score) is deterministic
    * double arithmetic that a DuckDB oracle replays bit-for-bit.
    *
    * The quantize→reconstruct pipeline is three zip_with maps over
    * literal min/scale arrays plus the codegen'd dot product — no UDF,
    * no shuffle; top-k is TakeOrderedAndProject, same as brute force. */
  def sq8Stats(df: DataFrame, embCol: String): (Array[Double], Array[Double]) = {
    val stats = df.select(posexplode(col(embCol).cast("array<double>")))
      .groupBy(col("pos")).agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      .orderBy(col("pos")).collect()
    val mins = stats.map(_.getDouble(1))
    val scales = stats.map(r => {
      val (mn, mx) = (r.getDouble(1), r.getDouble(2))
      if (mx > mn) (mx - mn) / 255.0 else 1.0
    })
    (mins, scales)
  }

  /** Reconstructed (de-quantized) embedding column under SQ8 codes. */
  def sq8Reconstruct(emb: Column, mins: Array[Double],
                     scales: Array[Double]): Column = {
    val minArr = array(mins.map(lit).toIndexedSeq: _*)
    val scaleArr = array(scales.map(lit).toIndexedSeq: _*)
    val diffs = zip_with(emb.cast("array<double>"), minArr, (x, mn) => x - mn)
    val codes = zip_with(diffs, scaleArr, (d, s) =>
      greatest(lit(0.0), least(lit(255.0), floor(d / s + lit(0.5)))))
    zip_with(zip_with(codes, scaleArr, (c, s) => c * s), minArr, (v, mn) => v + mn)
  }

  /** SQ8 top-k for one query vector: cosine over reconstructed corpus
    * vectors against the identically-quantized query. */
  def sq8TopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Float], k: Int): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    val (mins, scales) = sq8Stats(df, embCol)
    def quant(x: Double, d: Int): Double =
      math.max(0.0, math.min(255.0, math.floor((x - mins(d)) / scales(d) + 0.5)))
    val qRec = query.map(_.toDouble).zipWithIndex
      .map { case (x, d) => mins(d) + quant(x, d) * scales(d) }
    val qArr = array(qRec.map(lit): _*)
    val qNorm = math.sqrt(qRec.map(v => v * v).sum)
    val rec = sq8Reconstruct(col(embCol), mins, scales)
    df.select(col(idCol).as("id"),
        round(dotArr(rec, qArr) / (sqrt(dotArr(rec, rec)) * lit(qNorm)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Product quantization (Jégou et al., TPAMI 2011): the embedding is
    * split into `m` subvectors of `dsub` dims; each subspace gets its own
    * `ksub`-centroid codebook, and a vector's code is its nearest
    * centroid per subspace — m bytes instead of 4·dim, the memory-bound
    * regime where PQ beats SQ8's 1 byte/dim. Search scores against the
    * RECONSTRUCTION (concatenated code centroids), which equals the
    * classic ADC table-lookup sum but keeps one arithmetic shape both
    * engines can replay.
    *
    * Training is the same deterministic fixed-seed Lloyd construction as
    * [[ivfIndexDeterministic]] run per subspace (seed = the ksub
    * lowest-id subvectors, `iters` assign/mean steps, empty cells keep
    * their previous centroid), so the full train→encode→score chain is
    * ORACLE-ABLE. At 100 TB the train pass runs on a sample and the
    * codebooks are a [m][ksub][dsub] literal broadcast into the encode
    * scan — no shuffle anywhere in encode or search. */
  def pqTrainDeterministic(df: DataFrame, idCol: String, embCol: String,
                           m: Int, dsub: Int, ksub: Int, iters: Int = 1,
                           trainCap: Long = 500L): Array[Array[Array[Double]]] = {
    // Codebooks train on a bounded deterministic sample (the `trainCap`
    // lowest ids) — the standard PQ practice at scale: Lloyd quality
    // saturates long before the corpus size, and an unbounded train pass
    // would re-scan 100 TB per subspace. Encoding/search always cover
    // the FULL corpus. The cap is a no-op at the sf0.01 oracle gate
    // (500 rows), so the oracle mirrors it trivially.
    val e = df.select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .filter(col("id") < trainCap)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = e.orderBy(col("id")).limit(ksub)
        .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
      require(seeds.length >= ksub,
        s"pqTrainDeterministic: train sample has ${seeds.length} rows < ksub=$ksub")
      var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        seeds.map(v => v.slice(s * dsub, s * dsub + dsub))
      }
      // One Lloyd step for ALL m subspaces per pass (r16): the per-subspace
      // loop ran m independent assign+mean jobs over the same capped sample
      // — m× the job-scheduling and exchange cost for zero extra
      // information. Each row explodes into its m (subspace, cell,
      // subvector) assignments and one grouped aggregate keyed on
      // (subspace, cell, pos) computes every codebook's means at once.
      // Per-(cell,pos) partial sums see the same values in the same
      // within-partition row order as the per-subspace jobs did, so the
      // means — and every downstream code — are identical up to the
      // reduce-side merge order of double partial sums (advisor r16:
      // that order depends on shuffle fetch arrival, true of the old
      // per-subspace jobs too; the oracle gate compares the query's
      // integer/rounded outputs, not raw codebook doubles).
      for (_ <- 0 until iters) {
        val perSub = (0 until m).map { s =>
          val se = slice(col("emb"), s * dsub + 1, dsub)
          struct(lit(s).as("sub"), nearestCell(se, books(s)).as("cell"),
            se.as("se"))
        }
        val means = e.select(explode(array(perSub: _*)).as("x"))
          .select(col("x.sub").as("sub"), col("x.cell").as("cell"),
            posexplode(col("x.se")))
          .groupBy(col("sub"), col("cell"), col("pos"))
          .agg(avg(col("col")).as("mv"))
          .groupBy(col("sub"), col("cell"))
          .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("ms"))
          .select(col("sub"), col("cell"),
            transform(col("ms"), s => s.getField("mv")).as("cent"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
          .toMap
        books = Array.tabulate(m)(s =>
          Array.tabulate(ksub)(i => means.getOrElse((s, i), books(s)(i))))
      }
      books
    } finally { e.unpersist(false): Unit }
  }

  /** Nearest-centroid cell by (euclidean distance, cell index) — the
    * shared assignment expression of the IVF and PQ deterministic
    * builds. */
  private def nearestCell(v: Column, cents: Array[Array[Double]]): Column = {
    val cands = cents.zipWithIndex.map { case (c, i) =>
      val cl = array(c.map(lit).toIndexedSeq: _*)
      struct(
        sqrt(aggregate(zip_with(v, cl, (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _)).as("d"),
        lit(i).as("c"))
    }
    array_min(array(cands.toIndexedSeq: _*)).getField("c")
  }

  /** PQ reconstruction: per subspace, pick the nearest codebook centroid
    * of the subvector and concatenate — the decoded form of the m-byte
    * code. */
  def pqReconstruct(emb: Column,
                    codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks(0)(0).length
    val parts = codebooks.zipWithIndex.map { case (book, s) =>
      val sub = slice(emb.cast("array<double>"), s * dsub + 1, dsub)
      val bookLit = array(book.map(c =>
        array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
      element_at(bookLit, nearestCell(sub, book) + 1)
    }
    concat(parts.toIndexedSeq: _*)
  }

  /** PQ top-k for one query vector: cosine between the raw query and
    * each corpus vector's PQ reconstruction (ADC — the query side stays
    * unquantized). */
  def pqTopK(df: DataFrame, idCol: String, embCol: String,
             query: Seq[Float], k: Int, m: Int = 8, ksub: Int = 16,
             iters: Int = 1): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    val dim = query.length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val books = pqTrainDeterministic(df, idCol, embCol, m, dim / m, ksub, iters)
    val q = query.map(_.toDouble)
    val qArr = array(q.map(lit): _*)
    val qNorm = math.sqrt(q.map(v => v * v).sum)
    val rec = pqReconstruct(col(embCol), books)
    df.select(col(idCol).as("id"),
        round(dotArr(rec, qArr) / (sqrt(dotArr(rec, rec)) * lit(qNorm)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVFPQ (Jégou et al., TPAMI 2011 §V; the FAISS IVFPQ structure and
    * the standard memory-bound billion-scale tier): coarse IVF cells
    * bound WHICH vectors are scanned (`nprobe` of `nlist` cells),
    * product-quantized codes bound WHAT is read per vector (m bytes).
    * This composition keeps both deterministic builds —
    * [[ivfIndexDeterministic]] for the cells, [[pqTrainDeterministic]]
    * for the codebooks — so the complete train→assign→probe→ADC chain
    * stays oracle-able. Codes here quantize the raw vector (not the
    * cell residual — the residual refinement is a production accuracy
    * option the oracle story doesn't need). At 100 TB: cell = partition
    * key, so a probe reads nprobe/nlist of the files; the ADC scan reads
    * m-byte codes, not floats; no shuffle anywhere. */
  def ivfPqTopK(df: DataFrame, idCol: String, embCol: String,
                query: Seq[Float], k: Int, nlist: Int, nprobe: Int,
                m: Int, ksub: Int, iters: Int = 1): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    val dim = query.length
    require(dim % m == 0, s"ivfPqTopK: dim $dim not divisible by m=$m")
    val (assigned, centers) = ivfIndexDeterministic(df, idCol, embCol, nlist, iters)
    val books = pqTrainDeterministic(df, idCol, embCol, m, dim / m, ksub, iters)
    val q = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    val probed = centers.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(_._2)
    val qArr = array(q.map(lit).toIndexedSeq: _*)
    val qNorm = math.sqrt(q.map(v => v * v).sum)
    val rec = pqReconstruct(col("emb"), books)
    assigned.filter(col("cell").isin(probed.toIndexedSeq: _*))
      .select(col("id"),
        round(dotArr(rec, qArr) / (sqrt(dotArr(rec, rec)) * lit(qNorm)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All-pairs top-N most similar — O(n²) by construction; retained ONLY
    * as the spec cross-check for lshNearDupPairs and for small candidate
    * sets. Not registered as a query. */
  def topSimilarPairs(df: DataFrame, idCol: String, embCol: String,
                      topN: Int): DataFrame = {
    import graft.functions.GraftScalar.dotArr
    val withNorm = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(dotArr(col(embCol), col(embCol))).as("nrm"))
      .repartition(col("id"))
    val a = withNorm.select(col("id").as("id_a"), col("emb").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b = withNorm.select(col("id").as("id_b"), col("emb").as("emb_b"),
      col("nrm").as("nrm_b"))
    a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotArr(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }
}
