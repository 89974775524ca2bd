package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Ann, Dedup, Multimodal, TextAnalysis}

/** Training-data pipeline surface: deduplication tiers, embedding
  * similarity search, text analysis, multimodal columns — the large-scale
  * corpus operations layered on the documents/embeddings tables.
  */
object DataOps extends QueryModule {

  /** Driver-side lookup of one query vector (a query PARAMETER, like a
    * literal in SQL — not a data-path collect). */
  private def queryVector(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  def queries: Map[String, Q] = Map(
    // ---- dedup ----
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Connected components over a pair graph (the canonical-document
    // step after near-dup pair mining) by distributed min-label
    // propagation — oracled against a DuckDB recursive CTE on the SAME
    // deterministic edge set, so the fixpoint itself is hash-checked.
    "q_dedup_components" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") % 300).as("a"),
          (lit(300) + col("o_custkey") % 300).as("b"))
        .distinct()
      Dedup.connectedComponents(edges)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
    }),

    // The production near-dedup path end to end: simhash-mined pairs →
    // distributed connected components → per-cluster survivor (min id).
    // Both stages are individually oracled (q_dedup_simhash,
    // q_dedup_components); this row hash-checks their COMPOSITION over
    // real mined pairs, the step a pipeline actually ships.
    "q_dedup_e2e" -> ((s, dir) => {
      val pairs = Dedup.simhashPairs(t(s, dir, "documents"),
          "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), min(col("id")).as("keep_id"),
          (count(lit(1)) - lit(1)).cast("long").as("n_removed"))
    }),

    // MinHash+LSH near-dup pairs (oracled: the FNV-1a shingle/band
    // arithmetic is mirrored in the DuckDB oracle, so bucketing is
    // hash-checked end to end).
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
    }),

    // SimHash fingerprint near-dup pairs (oracled: the 64-bit
    // fingerprint + 16-bit blocking is mirrored in the DuckDB oracle).
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
    }),

    // exact n-gram Jaccard near-dups per language block (oracled).
    // threshold 0.1: candidates come from the inverted index only —
    // languages with no qualifying pair produce no row (near-dup
    // semantics, not all-pairs statistics).
    "q_ngram_jaccard_stats" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          blockCol = "lang", lenCol = "n_chars", lenTol = 50, n = 3, threshold = 0.1)
        .join(t(s, dir, "documents").select(col("doc_id").as("id_a"), col("lang")), Seq("id_a"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"), round(max(col("jaccard")), 4).as("max_jac"))
    }),

    // embedding-cosine near-dup: top-15 most-similar pairs among banded
    // sign-LSH candidates (oracled — the oracle computes the identical
    // banded candidate set, so the LSH semantics are hash-checked, not
    // just the rerank). Replaces the r1/r2 O(n²) crossJoin.
    "q_near_dup_embedding" -> ((s, dir) => {
      Ann.lshNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        topN = 15, bands = 4, rowsPerBand = 8)
    }),

    // ---- similarity search ----
    "q_ann_cosine_topk" -> ((s, dir) => {
      Ann.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryVector(s, dir), k = 10)
    }),

    // LSH-bucketed ANN (oracled: sign-bit banding mirrored in DuckDB;
    // recall additionally asserted in DataOpsSpec).
    "q_ann_lsh_topk" -> ((s, dir) => {
      Ann.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryVector(s, dir), k = 10, bands = 2, rowsPerBand = 4)
    }),

    // IVF coarse-quantizer ANN: deterministic fixed-seed Lloyd build so
    // the oracle can replay cell assignment + probing + rerank exactly
    // (the ML k-means|| builder stays the production path; recall and
    // plan shape are asserted on it in DataOpsSpec/PlanSpec).
    "q_ann_ivf_topk" -> ((s, dir) => {
      val (index, centers) = Ann.ivfIndexDeterministic(
        t(s, dir, "embeddings"), "vec_id", "embedding", nlist = 8, iters = 1)
      Ann.ivfTopK(Tables.registerScratch(index.persist()), centers,
        queryVector(s, dir), k = 10, nprobe = 3)
    }),

    // SQ8 scalar-quantized ANN: per-dimension 8-bit codes, cosine over
    // reconstructed values — the train/encode/reconstruct arithmetic is
    // deterministic, so the oracle replays it exactly.
    "q_ann_sq8_topk" -> ((s, dir) => {
      Ann.sq8TopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryVector(s, dir), k = 10)
    }),

    // PQ (product-quantization) ANN: per-subspace codebooks trained with
    // the same deterministic fixed-seed Lloyd construction as the IVF
    // build, cosine between the raw query and each vector's
    // reconstruction — train/encode/score all replayed by the oracle.
    "q_ann_pq_topk" -> ((s, dir) => {
      Ann.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryVector(s, dir), k = 10, m = 8, ksub = 16, iters = 1)
    }),

    // IVFPQ: coarse cells bound which vectors are scanned, PQ codes
    // bound what is read per vector — the standard billion-scale tier;
    // probe + ADC chain fully replayed by the oracle.
    "q_ann_ivfpq_topk" -> ((s, dir) => {
      Ann.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryVector(s, dir), k = 10, nlist = 8, nprobe = 3, m = 8,
        ksub = 16, iters = 1)
    }),

    "q_embedding_centroids" -> ((s, dir) => {
      t(s, dir, "embeddings").groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("c1"),
        round(avg(element_at(col("embedding"), 2).cast("double")), 6).as("c2"))
    }),

    // Deterministic stratified sampling (training-corpus mixture
    // weighting): per-language keep rates selected by a hash predicate
    // on doc_id — the oracle replays the identical integer arithmetic.
    "q_sample_stratified" -> ((s, dir) => {
      graft.operators.Sampling.stratified(t(s, dir, "documents"),
          "doc_id", "lang",
          Map("en" -> 30, "de" -> 10, "fr" -> 50), defaultPct = 5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
    }),

    // ---- text analysis ----
    "q_lang_id" -> ((s, dir) => {
      // tokens materialized ONCE as a bound attribute, then each language's
      // marker count computed ONCE, and the argmax derived from the count
      // COLUMNS — 4 interpreted filter sweeps per row total (the r2 plan
      // ran the tokenization 6x and r3's first cut swept the filters 12x
      // through the inlined greatest()).
      val toks = col("toks")
      val withHits = t(s, dir, "documents")
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .select(
          col("doc_id"),
          TextAnalysis.markerHits(toks, TextAnalysis.langMarkers("en")).cast("long").as("hits_en"),
          TextAnalysis.markerHits(toks, TextAnalysis.langMarkers("es")).cast("long").as("hits_es"),
          TextAnalysis.markerHits(toks, TextAnalysis.langMarkers("de")).cast("long").as("hits_de"),
          TextAnalysis.markerHits(toks, TextAnalysis.langMarkers("fr")).cast("long").as("hits_fr"))
      val scored = Seq("de", "en", "es", "fr").map(l =>
        struct(col(s"hits_$l").as("hits"), lit(l).as("lang")))
      val best = greatest(scored: _*)
      withHits.select(
        col("doc_id"),
        when(best.getField("hits") > 0, best.getField("lang"))
          .otherwise(lit("und")).as("detected_lang"),
        col("hits_en"), col("hits_es"), col("hits_de"), col("hits_fr"))
    }),

    "q_text_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }),

    "q_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.bpeEstimate(col("text")).as("bpe_estimate"))
    }),

    "q_doc_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp_md5"),
        substring(TextAnalysis.fingerprint(col("text")), 1, 8).as("fp_short"))
    }),

    // ---- multimodal (stubbed codec; real batch plumbing) ----
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("id"), col("kind"), col("n_bytes"),
                col("n_frames").cast("long").as("n_frames"))
    }),

    // ENTROPY-CODED decode, oracled end to end (was the declared stub
    // through round 10): payloads are baseline grayscale JPEGs whose
    // quantized coefficients come from a closed-form formula under a
    // uniform quant table of 8, so the decoded pixel is exactly
    // dc + s(y)·ac + 128 (JpegCodec scaladoc). The gate runs the REAL
    // decoder — marker walk, canonical Huffman build, DC prediction,
    // AC run-length, byte unstuffing, dequant + IDCT — and the oracle
    // replays the formula, hash-checking the decode arithmetic.
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.mediaWithJpeg(s, t(s, dir, "documents"))
      Multimodal.decodeUnits(media).toDF()
        .select(col("id"), col("kind"), col("n_units"), col("unit_sum"),
          col("unit_min"), col("unit_max"), col("checksum"))
    }),

    // REAL pixel/PCM decoding, oracled end to end: payloads are
    // spec-correct grayscale-8 PNGs (zlib-deflated, every scanline
    // filter type exercised) and PCM16 WAVs synthesized from
    // closed-form formulas over the id; the gate decodes them back
    // through MediaDecode (inflate + 5-filter reconstruction / LE
    // sample walk) and reduces each item to count/sum/min/max plus a
    // position-weighted checksum, while the oracle replays the formulas
    // directly — so the decode arithmetic itself is hash-checked, and a
    // right-multiset-wrong-order decode still fails. An undecodable
    // payload drops its row (count mismatch), never fabricates one.
    "q_media_decode" -> ((s, dir) => {
      val media = Multimodal.mediaWithCodecs(s, t(s, dir, "documents"))
      Multimodal.decodeUnits(media).toDF()
        .select(col("id"), col("kind"), col("n_units"), col("unit_sum"),
          col("unit_min"), col("unit_max"), col("checksum"))
    }),

    // REAL header-level metadata extraction: payloads carry spec-correct
    // PNG IHDR / PCM WAV headers built from id-derived parameters, so
    // the oracle replays the builder arithmetic and the byte-walk
    // parsers are verified as its inverse; headerless video rows must
    // come back all-NULL.
    "q_multimodal_headers" -> ((s, dir) => {
      val media = Multimodal.mediaWithHeaders(s, t(s, dir, "documents"))
      Multimodal.extractHeaderMeta(media).toDF()
        .select(col("id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("duration_ms").as("duration_ms"))
    }))

  // ---- DuckDB mirrors of the hash/banding arithmetic ----
  // The dedup/ANN oracles recompute the EXACT pipeline — FNV-1a shingle
  // and bucket hashes, XXH64.hashLong signature hashing, sign-band and
  // Lloyd quantizer assignment — so a drift in any banding constant or
  // hash step fails the gate (rows-only checks could not see that).

  private[queries] val M64 = "18446744073709551616" // 2^64

  /** Deterministic-IVF CTEs (expects `e`, `q` in scope; mirrors
    * Ann.ivfIndexDeterministic(nlist=8, iters=1) + the 3-cell probe):
    * fixed seeding by the 8 lowest vec_ids, one Lloyd step (assign by
    * (euclidean, cell), element-wise mean), yielding `a1(vec_id, emb,
    * cell)` and `probe(cell)` — shared by the IVF and IVFPQ oracles. */
  private val ivfCtes: String =
    """c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cent
      |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
      |a0 AS (SELECT vec_id, emb, cell FROM (
      |  SELECT e.vec_id, e.emb, c0.cell, row_number() OVER (
      |      PARTITION BY e.vec_id ORDER BY sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |        list_transform(range(1, len(e.emb)+1),
      |          di -> (e.emb[di]-c0.cent[di])*(e.emb[di]-c0.cent[di]))),
      |        (ax, ay) -> ax + ay)), c0.cell) AS rn
      |  FROM e, c0) WHERE rn = 1),
      |mv AS (SELECT cell, pos, avg(val) AS m FROM (
      |  SELECT cell, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val FROM a0)
      |  GROUP BY cell, pos),
      |c1 AS (SELECT cell, list(m ORDER BY pos) AS cent FROM mv GROUP BY cell),
      |a1 AS (SELECT vec_id, emb, cell FROM (
      |  SELECT e.vec_id, e.emb, c1.cell, row_number() OVER (
      |      PARTITION BY e.vec_id ORDER BY sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |        list_transform(range(1, len(e.emb)+1),
      |          di -> (e.emb[di]-c1.cent[di])*(e.emb[di]-c1.cent[di]))),
      |        (ax, ay) -> ax + ay)), c1.cell) AS rn
      |  FROM e, c1) WHERE rn = 1),
      |probe AS (SELECT c1.cell FROM c1, q
      |  ORDER BY sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(range(1, len(q.qe)+1),
      |        di -> (q.qe[di]-c1.cent[di])*(q.qe[di]-c1.cent[di]))),
      |      (ax, ay) -> ax + ay)), c1.cell LIMIT 3)""".stripMargin

  /** Oracle for q_ann_pq_topk — replays Ann.pqTrainDeterministic /
    * pqReconstruct per subspace: training reads the capped sample
    * (vec_id < 500, the operator's trainCap — a no-op at the sf0.01
    * gate), seed codebook = the ksub lowest-id subvectors, one Lloyd
    * step (assign by (euclidean, cell), per-cell element-wise mean,
    * empty cells keep their seed), final assignment over the FULL
    * corpus, reconstruction = concatenated chosen centroids, cosine vs
    * the raw query. Generated per subspace so m/dsub/ksub stay in one
    * place. */
  /** The per-subspace PQ train/encode CTEs (expects `e`, `et`, `q` CTEs
    * in scope); yields `rec(vec_id, rec)` — shared by the PQ and IVFPQ
    * oracles. */
  private def pqCtes(m: Int, dsub: Int, ksub: Int): String = {
    def dist(se: String, cent: String) =
      s"""sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(range(1, $dsub + 1),
         |        di -> ($se[di]-$cent[di])*($se[di]-$cent[di]))),
         |      (ax, ay) -> ax + ay))""".stripMargin
    val subs = (0 until m).map { s =>
      val lo = s * dsub + 1; val hi = (s + 1) * dsub
      val se = s"e.emb[$lo:$hi]"
      s"""c0_$s AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    emb[$lo:$hi] AS cent
         |  FROM (SELECT * FROM et ORDER BY vec_id LIMIT $ksub)),
         |a0_$s AS (SELECT vec_id, se, cell FROM (
         |  SELECT e.vec_id, $se AS se, c.cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${dist(se, "c.cent")}, c.cell) AS rn
         |  FROM et e, c0_$s c) WHERE rn = 1),
         |m_$s AS (SELECT cell, list(mval ORDER BY pos) AS cent FROM (
         |  SELECT cell, pos, avg(val) AS mval FROM (
         |    SELECT cell, generate_subscripts(se, 1) AS pos, unnest(se) AS val
         |    FROM a0_$s)
         |  GROUP BY cell, pos) GROUP BY cell),
         |c1_$s AS (SELECT c0.cell, COALESCE(m.cent, c0.cent) AS cent
         |  FROM c0_$s c0 LEFT JOIN m_$s m USING (cell)),
         |a1_$s AS (SELECT vec_id, cell FROM (
         |  SELECT e.vec_id, c.cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${dist(se, "c.cent")}, c.cell) AS rn
         |  FROM e, c1_$s c) WHERE rn = 1),
         |r_$s AS (SELECT a.vec_id, c.cent FROM a1_$s a JOIN c1_$s c USING (cell))"""
        .stripMargin
    }
    val joins = (1 until m).map(s => s"JOIN r_$s USING (vec_id)").mkString(" ")
    val cat = (0 until m).map(s => s"r_$s.cent").mkString(" || ")
    s"""${subs.mkString(",\n")},
       |rec AS (SELECT r_0.vec_id, $cat AS rec FROM r_0 $joins)""".stripMargin
  }

  private def pqOracle(m: Int, dsub: Int, ksub: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |et AS (SELECT * FROM e WHERE vec_id < 500),
       |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
       |${pqCtes(m, dsub, ksub)}
       |SELECT rec.vec_id AS id,
       | round(list_cosine_similarity(rec.rec, q.qe), 6) AS cosine
       |FROM rec, q
       |ORDER BY cosine DESC, id LIMIT 10""".stripMargin

  /** FNV-1a 64 over the UTF-8 bytes of `s` (mirrors [[graft.functions.SimHash64.fnv1a64]];
    * the test corpus is ASCII so ord() == byte). */
  private[queries] def fnvSql(s: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |    list_transform(range(1, strlen($s)+1), fi -> ord(substr($s, fi, 1))::HUGEINT)),
       |   (fh, fb) -> (xor(fh::UBIGINT, fb::UBIGINT)::HUGEINT * 1099511628211) % $M64)""".stripMargin

  /** (a * p) mod 2^64 without HUGEINT overflow (a < 2^64). */
  private def mulmodSql(a: String, p: java.math.BigInteger): String = {
    val lo = s"((($a % 4294967296) * $p) % $M64)"
    val hi = s"(((($a >> 32) * $p) % 4294967296) * 4294967296)"
    s"($lo + $hi) % $M64"
  }
  private def big(l: Long): java.math.BigInteger =
    new java.math.BigInteger(java.lang.Long.toUnsignedString(l))

  /** Sign-band signature of `emb` (DOUBLE[]) for band `b`, rowsPerBand
    * bits — mirrors [[graft.operators.Ann.signBandSignature]]. */
  private def signBandSql(emb: String, b: Int, rowsPerBand: Int): String =
    (0 until rowsPerBand).map { i =>
      s"(CASE WHEN $emb[${b * rowsPerBand + i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** The q_dedup_minhash oracle: FNV-1a shingle hashes → 64 XXH64.hashLong
    * signature mins (unrolled into DISTINCT-fenced projection stages —
    * every step is bijective in the shingle hash, so DISTINCT is a
    * semantic no-op that stops DuckDB's projection fusion from
    * re-expanding the shared subterms ~2000x) → FNV-1a band buckets →
    * same-bucket pairs → exact-Jaccard verification. */
  private def minhashOracle: String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val P1 = big(-7046029288634856825L) // 0x9E3779B185EBCA87
    val P2 = big(-4417276706812531889L) // 0xC2B2AE3D27D4EB4F
    val P3 = big(1609587929392839161L)
    val P4 = big(-8796714831421723037L) // 0x85EBCA77C2B2AE63
    val P5 = big(2870177450012600261L)
    val initAdd = P5.add(java.math.BigInteger.valueOf(8)) // seed + P5 + 8
    val seeds = (0 until 64).map(i =>
      java.lang.Long.toUnsignedString(XXH64.hashInt(i, 42L)))
    s"""WITH d AS (SELECT doc_id AS id,
       |    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |shs AS (SELECT id, list_distinct(list_filter(
       |    list_transform(toks, (x, i) -> CASE WHEN i <= len(toks) - 2
       |      THEN toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] END),
       |    s -> s IS NOT NULL)) AS sh FROM d),
       |hashed AS (SELECT id, list_transform(sh, sg -> ${fnvSql("sg")}) AS hs
       |  FROM shs WHERE len(sh) > 0),
       |expl AS (SELECT id, unnest(hs) AS hv FROM hashed),
       |seedt AS (SELECT sdi.si AS si,
       |    ([${seeds.map(_ + "::HUGEINT").mkString(",")}])[sdi.si+1] AS sd
       |  FROM (SELECT unnest(range(64)) AS si) sdi),
       |x0 AS (SELECT DISTINCT id, si, hv AS l, (sd + $initAdd) % $M64 AS h FROM expl, seedt),
       |x1 AS (SELECT DISTINCT id, si, h, ${mulmodSql("l", P2)} AS t FROM x0),
       |x2 AS (SELECT DISTINCT id, si, h, ((t * ${1L << 31}) % $M64 + (t >> 33)) AS t FROM x1),
       |x3 AS (SELECT DISTINCT id, si, xor(h::UBIGINT, (${mulmodSql("t", P1)})::UBIGINT)::HUGEINT AS h FROM x2),
       |x4 AS (SELECT DISTINCT id, si, ((h * ${1L << 27}) % $M64 + (h >> 37)) AS t FROM x3),
       |x5 AS (SELECT DISTINCT id, si, (${mulmodSql("t", P1)} + $P4) % $M64 AS h FROM x4),
       |x6 AS (SELECT DISTINCT id, si, ${mulmodSql("xor(h::UBIGINT, (h >> 33)::UBIGINT)::HUGEINT", P2)} AS h FROM x5),
       |x7 AS (SELECT DISTINCT id, si, ${mulmodSql("xor(h::UBIGINT, (h >> 29)::UBIGINT)::HUGEINT", P3)} AS h FROM x6),
       |x8 AS (SELECT id, si, xor(h::UBIGINT, (h >> 32)::UBIGINT)::HUGEINT AS h FROM x7),
       |sigv AS (SELECT id, si, min(CASE WHEN h >= 9223372036854775808
       |    THEN (h - $M64)::BIGINT ELSE h::BIGINT END) AS sv
       |  FROM x8 GROUP BY id, si),
       |sigs AS (SELECT id, list(sv ORDER BY si) AS sig FROM sigv GROUP BY id),
       |bands AS (SELECT id, bd.b AS band,
       |    ${fnvSql("(bd.b::VARCHAR || '|' || array_to_string(sig[bd.b*4+1 : bd.b*4+4], ','))")} AS bucket
       |  FROM sigs, (SELECT unnest(range(16)) AS b) bd),
       |grp AS (SELECT band, bucket, list(id ORDER BY id) AS ids
       |  FROM bands GROUP BY band, bucket HAVING count(*) > 1),
       |cand AS (SELECT DISTINCT t1.ia AS id_a, t2.ib AS id_b
       |  FROM grp, unnest(grp.ids) t1(ia), unnest(grp.ids) t2(ib) WHERE t1.ia < t2.ib)
       |SELECT c.id_a, c.id_b,
       |  round(len(list_intersect(ha.hs, hb.hs))::DOUBLE /
       |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
       |FROM cand c JOIN hashed ha ON ha.id = c.id_a JOIN hashed hb ON hb.id = c.id_b
       |WHERE round(len(list_intersect(ha.hs, hb.hs))::DOUBLE /
       |    (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))), 4) >= 0.5""".stripMargin
  }

  /** The q_dedup_simhash oracle: FNV-1a token hashes → per-bit +1/-1
    * votes → 64-bit fingerprint → 4x16-bit chunk blocking → Hamming
    * filter. Mirrors [[graft.operators.Dedup.simhashPairs]]. */
  /** The simhash CTE chain (through `cand`), shared by the pair oracle
    * and the end-to-end cluster oracle. */
  private def simhashCtes: String =
    s"""d AS (SELECT doc_id AS id,
       |    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t FROM documents),
       |tok AS (SELECT id, unnest(string_split(t, ' ')) AS tk FROM d),
       |th AS (SELECT id, ${fnvSql("tk")} AS h FROM tok),
       |votes AS (SELECT id, bits.b AS b,
       |    sum(CASE WHEN ((h >> bits.b) % 2) = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th, (SELECT unnest(range(64)) AS b) bits GROUP BY id, bits.b),
       |fpt AS (SELECT id, sum(CASE WHEN v > 0 THEN ((1::UBIGINT << b))::HUGEINT
       |    ELSE 0::HUGEINT END) AS fp
       |  FROM votes GROUP BY id),
       |ch AS (SELECT id, fp, ci.i AS chunk_id, (fp >> (ci.i*16)) % 65536 AS chunk
       |  FROM fpt, (SELECT unnest(range(4)) AS i) ci),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
       |  FROM ch a JOIN ch b ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk AND a.id < b.id)""".stripMargin

  private def simhashOracle: String =
    s"""WITH $simhashCtes
       |SELECT id_a, id_b, bit_count(xor(fp_a::UBIGINT, fp_b::UBIGINT))::INT AS hamming
       |FROM cand WHERE bit_count(xor(fp_a::UBIGINT, fp_b::UBIGINT)) <= 3""".stripMargin

  /** The q_dedup_e2e oracle: the SAME mined simhash pair set fed through
    * a recursive-CTE connected-components fixpoint — the full production
    * near-dedup path (mine pairs → cluster → keep min id) hash-checked
    * end to end. */
  private def dedupE2eOracle: String =
    s"""WITH RECURSIVE $simhashCtes,
       |p AS (SELECT id_a, id_b FROM cand
       |  WHERE bit_count(xor(fp_a::UBIGINT, fp_b::UBIGINT)) <= 3),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM p
       |  UNION SELECT id_b, id_a FROM p),
       |reach(id, comp) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id),
       |c AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
       |SELECT comp::BIGINT AS comp, count(*)::BIGINT AS n_members,
       |  min(id)::BIGINT AS keep_id, (count(*) - 1)::BIGINT AS n_removed
       |FROM c GROUP BY comp""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_dedup_minhash" -> minhashOracle,

    "q_dedup_simhash" -> simhashOracle,

    "q_dedup_e2e" -> dedupE2eOracle,

    // mirrors Ann.lshTopK(bands=2, rowsPerBand=4): candidates agree with
    // the query on at least one band's sign signature, exact cosine rerank
    "q_ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
         |s AS (SELECT vec_id, emb, ${signBandSql("emb", 0, 4)} AS s0,
         |    ${signBandSql("emb", 1, 4)} AS s1 FROM e),
         |qs AS (SELECT ${signBandSql("qe", 0, 4)} AS s0,
         |    ${signBandSql("qe", 1, 4)} AS s1 FROM q)
         |SELECT s.vec_id AS id, round(list_cosine_similarity(s.emb, q.qe), 6) AS cosine
         |FROM s, qs, q WHERE s.s0 = qs.s0 OR s.s1 = qs.s1
         |ORDER BY cosine DESC, id LIMIT 10""".stripMargin,

    // mirrors Ann.ivfIndexDeterministic(nlist=8, iters=1) + ivfTopK(
    // nprobe=3, k=10): fixed seeding by the 8 lowest vec_ids, one Lloyd
    // step (assign by (euclidean, cell), element-wise mean), probe the 3
    // nearest cells, exact cosine top-10. The distance is the same
    // left-fold sum of squared diffs as the Spark side's aggregate().
    "q_ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
         |$ivfCtes
         |SELECT a1.vec_id AS id, round(list_cosine_similarity(a1.emb, q.qe), 6) AS cosine
         |FROM a1, q WHERE a1.cell IN (SELECT cell FROM probe)
         |ORDER BY cosine DESC, id LIMIT 10""".stripMargin,

    // IVFPQ: the coarse-cell probe of q_ann_ivf_topk restricting the
    // PQ-reconstruction scoring of q_ann_pq_topk (Ann.ivfPqTopK:
    // nlist=8/nprobe=3 cells, m=8/ksub=16 codes).
    "q_ann_ivfpq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |et AS (SELECT * FROM e WHERE vec_id < 500),
         |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
         |$ivfCtes,
         |${pqCtes(m = 8, dsub = 8, ksub = 16)}
         |SELECT rec.vec_id AS id,
         | round(list_cosine_similarity(rec.rec, q.qe), 6) AS cosine
         |FROM rec JOIN a1 ON rec.vec_id = a1.vec_id CROSS JOIN q
         |WHERE a1.cell IN (SELECT cell FROM probe)
         |ORDER BY cosine DESC, id LIMIT 10""".stripMargin,

    "q_dedup_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_orderkey % 300 AS a, 300 + (o_custkey % 300) AS b
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), sym AS (
        |  SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e
        |), reach(id, comp) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.id
        |), c AS (
        |  SELECT id, min(comp) AS comp FROM reach GROUP BY id
        |)
        |SELECT comp, count(*) AS n_members, max(id) AS max_id
        |FROM c GROUP BY comp""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS digest,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q_ngram_jaccard_stats" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |   string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        | FROM documents),
        |sh AS (SELECT doc_id, lang, n_chars,
        |   list_distinct(list_filter(
        |     list_transform(toks, (x, i) -> CASE WHEN i <= len(toks) - 2
        |       THEN toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] END),
        |     s -> s IS NOT NULL)) AS sh
        | FROM d),
        |pairs AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
        |   round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        | FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        | WHERE abs(a.n_chars - b.n_chars) <= 50)
        |SELECT lang, count(*) AS n_pairs, round(max(jaccard), 4) AS max_jac
        |FROM pairs WHERE jaccard >= 0.1 GROUP BY lang""".stripMargin,

    // mirrors Ann.lshNearDupPairs(bands=4, rowsPerBand=8) exactly: per-band
    // sign-bit signatures over dims 1..32, candidates = any-band agreement.
    "q_near_dup_embedding" -> {
      val r = 8
      val sigExpr = (0 until r).map(i =>
        s"(CASE WHEN emb[band*$r+${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |s AS (SELECT vec_id, band, $sigExpr AS sig
         |  FROM e, (SELECT unnest(range(4)) AS band)),
         |c AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM s a JOIN s b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id)
         |SELECT c.id_a, c.id_b,
         | round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cosine
         |FROM c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
         |ORDER BY cosine DESC, id_a, id_b LIMIT 15""".stripMargin
    },

    "q_ann_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id AS id,
        | round(list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]), 6) AS cosine
        |FROM embeddings, q
        |ORDER BY cosine DESC, id LIMIT 10""".stripMargin,

    "q_ann_pq_topk" -> pqOracle(m = 8, dsub = 8, ksub = 16),

    // mirrors Sampling.stratified: bucket = ((doc_id % 100000007) *
    // 2654435761) % 100, per-lang rate chain, default 5 %.
    "q_sample_stratified" ->
      """WITH d AS (
        |  SELECT *, ((doc_id % 100000007) * 2654435761) % 100 AS bucket,
        |    CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 10 WHEN 'fr' THEN 50
        |         ELSE 5 END AS rate
        |  FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_kept,
        |       sum(n_chars)::BIGINT AS chars_kept
        |FROM d WHERE bucket < rate GROUP BY lang""".stripMargin,

    // mirrors Ann.sq8TopK: per-dim [min,max] train, 8-bit encode
    // floor((x-min)/scale + 0.5) clamped to [0,255], reconstruct
    // min + code*scale, cosine on reconstructed values.
    "q_ann_sq8_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM (
        |  SELECT generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
        |  FROM e) GROUP BY pos),
        |sc AS (SELECT list(mn ORDER BY pos) AS mns,
        |  list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END
        |       ORDER BY pos) AS scs FROM st),
        |r AS (SELECT vec_id, list_transform(range(1, len(emb) + 1),
        |    di -> sc.mns[di] + greatest(0.0, least(255.0,
        |            floor((emb[di] - sc.mns[di]) / sc.scs[di] + 0.5)))
        |          * sc.scs[di]) AS rec
        |  FROM e, sc),
        |qr AS (SELECT rec AS qrec FROM r WHERE vec_id = 0)
        |SELECT r.vec_id AS id,
        | round(list_cosine_similarity(r.rec, qr.qrec), 6) AS cosine
        |FROM r, qr
        |ORDER BY cosine DESC, id LIMIT 10""".stripMargin,

    // mirrors Multimodal.mediaWithCodecs + MediaDecode: even ids are
    // w×h = (8+id%9)×(8+id%7) gray-8 PNGs with pixel(x,y) =
    // (7x+13y+31·id) mod 256; odd ids are 200+(id%50)·2 PCM16 samples
    // s(i) = ((31·id+17i) mod 65536) − 32768. The decode gate must
    // reproduce these exactly — the oracle IS the synthesis formula.
    "q_media_decode" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
        |img AS (SELECT id, 'image' AS kind,
        |    (8 + id % 9)::BIGINT AS w, (8 + id % 7)::BIGINT AS h
        |  FROM d WHERE id % 2 = 0),
        |imgu AS (SELECT id, kind, w * h AS n_units,
        |    list_transform(range(w * h),
        |      k -> ((k % w) * 7 + (k // w) * 13 + id * 31) % 256) AS u
        |  FROM img),
        |aud AS (SELECT id, 'audio' AS kind,
        |    (200 + (id % 50) * 2)::BIGINT AS n_units
        |  FROM d WHERE id % 2 = 1),
        |audu AS (SELECT id, kind, n_units,
        |    list_transform(range(n_units),
        |      i -> ((id * 31 + i * 17) % 65536) - 32768) AS u
        |  FROM aud),
        |allu AS (SELECT * FROM imgu UNION ALL SELECT * FROM audu)
        |SELECT id, kind, n_units,
        |  list_sum(u)::BIGINT AS unit_sum,
        |  list_min(u)::BIGINT AS unit_min,
        |  list_max(u)::BIGINT AS unit_max,
        |  list_sum(list_transform(range(len(u)),
        |    k -> (k + 1) * u[k + 1]))::BIGINT AS checksum
        |FROM allu""".stripMargin,

    // mirrors Multimodal.mediaWithJpeg + JpegCodec.decodeGray: every doc
    // is a (8+id%9)×(8+id%7) baseline grayscale JPEG; per 8×8 block
    // (bx, by) the decoded pixel is dc + s(y%8)·ac + 128 with
    // dc = ((id%97)·7 + bx·31 + by·53) % 201 − 100,
    // ac = ((id%89)·5 + bx·17 + by·29) % 41 − 20, and s = +1 for
    // y%8 ∈ {0,3,4,7} else −1. The oracle IS the synthesis formula —
    // the Huffman/IDCT pipeline must reproduce it exactly.
    "q_multimodal_decode" ->
      """WITH d AS (SELECT doc_id AS id, (8 + doc_id % 9)::BIGINT AS w,
        |    (8 + doc_id % 7)::BIGINT AS h FROM documents),
        |u AS (SELECT id, 'image' AS kind, w * h AS n_units,
        |  list_transform(range(w * h), k ->
        |    ((id % 97) * 7 + ((k % w) // 8) * 31 + ((k // w) // 8) * 53) % 201 - 100
        |    + (CASE WHEN ((k // w) % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
        |      * (((id % 89) * 5 + ((k % w) // 8) * 17 + ((k // w) // 8) * 29) % 41 - 20)
        |    + 128) AS u
        |  FROM d)
        |SELECT id, kind, n_units,
        |  list_sum(u)::BIGINT AS unit_sum,
        |  list_min(u)::BIGINT AS unit_min,
        |  list_max(u)::BIGINT AS unit_max,
        |  list_sum(list_transform(range(len(u)),
        |    k -> (k + 1) * u[k + 1]))::BIGINT AS checksum
        |FROM u""".stripMargin,

    // mirrors Multimodal.mediaWithHeaders: PNG dims 100+id%64 × 50+id%32
    // for id%3=0, WAV rate 8000+(id%8)*1000 (mono, 16-bit → byteRate =
    // 2*rate) wrapping the n_chars text bytes for id%3=1, raw bytes (all
    // NULL metadata) for id%3=2.
    "q_multimodal_headers" ->
      """SELECT doc_id AS id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   ELSE 'video' END AS kind,
        | CASE WHEN doc_id % 3 = 0 THEN 100 + doc_id % 64 END AS width,
        | CASE WHEN doc_id % 3 = 0 THEN 50 + doc_id % 32 END AS height,
        | CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS sample_rate,
        | CASE WHEN doc_id % 3 = 1
        |   THEN (n_chars * 1000) // ((8000 + (doc_id % 8) * 1000) * 2)
        | END AS duration_ms
        |FROM documents""".stripMargin,

    "q_embedding_centroids" ->
      """SELECT label, count(*) AS n,
        | round(avg(embedding[1]::DOUBLE), 6) AS c1,
        | round(avg(embedding[2]::DOUBLE), 6) AS c2
        |FROM embeddings GROUP BY label""".stripMargin,

    "q_lang_id" ->
      """WITH d AS (SELECT doc_id,
        |  string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        | FROM documents),
        |h AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','is')))::BIGINT AS hits_en,
        |  len(list_filter(toks, x -> x IN ('el','la','de','y','es')))::BIGINT AS hits_es,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist')))::BIGINT AS hits_de,
        |  len(list_filter(toks, x -> x IN ('le','la','de','et','est')))::BIGINT AS hits_fr
        | FROM d)
        |SELECT doc_id,
        | CASE WHEN hits_fr > 0 AND hits_fr >= hits_es AND hits_fr >= hits_en AND hits_fr >= hits_de THEN 'fr'
        |      WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_de THEN 'es'
        |      WHEN hits_en > 0 AND hits_en >= hits_de THEN 'en'
        |      WHEN hits_de > 0 THEN 'de'
        |      ELSE 'und' END AS detected_lang,
        | hits_en, hits_es, hits_de, hits_fr
        |FROM h""".stripMargin,

    "q_text_quality" ->
      """WITH d AS (SELECT doc_id, text,
        |  string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        | FROM documents),
        |m AS (SELECT doc_id,
        |  len(toks)::BIGINT AS n_tokens,
        |  round(len(list_filter(toks, x -> x IN ('the','a','of','and','is')))::DOUBLE /
        |    greatest(len(toks), 1), 4) AS stop_ratio,
        |  length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE /
        |    greatest(len(toks), 1)::DOUBLE AS mean_len,
        |  least(len(toks) / 50.0, 1.0) AS length_score
        | FROM d)
        |SELECT doc_id, n_tokens, stop_ratio,
        | round((length_score +
        |        (CASE WHEN mean_len BETWEEN 3 AND 8 THEN 1.0 ELSE 0.5 END) +
        |        least(stop_ratio * 5, 1.0)) / 3, 4) AS quality
        |FROM m""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        | len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))::BIGINT AS ws_tokens,
        | greatest(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')),
        |          ceil(length(text) / 4.0))::BIGINT AS bpe_estimate
        |FROM documents""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5,
        | substring(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 8) AS fp_short
        |FROM documents""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | octet_length(text::BLOB)::BIGINT AS n_bytes,
        | ceil(octet_length(text::BLOB) / 256.0)::BIGINT AS n_frames
        |FROM documents""".stripMargin)
}
