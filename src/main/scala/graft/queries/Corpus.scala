package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup, TextAnalysis}

/** Corpus-preparation tier: semantic dedup, Gopher/C4 quality filters,
  * PII redaction, sequence packing, TF-IDF keywords. Every query is
  * DuckDB-oracled — the oracles replay the clustering / integer /
  * regex arithmetic exactly (same discipline as the ANN/dedup mirrors in
  * [[DataOps]]).
  */
object Corpus extends QueryModule {

  def queries: Map[String, Q] = Map(
    // SemDeDup: deterministic IVF cells (nlist=8, 1 Lloyd step — the
    // identical build q_ann_ivf_topk oracles), intra-cell cosine >= 0.3
    // to a lower id => removed. Output: per-cell doc/removal counts.
    "q_semdedup" -> ((s, dir) => {
      CorpusOps.semDedupStats(t(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 8, iters = 1, threshold = 0.3)
    }),

    // Gopher-style repetition/quality gate, aggregated per language with
    // integer-only per-doc metrics (counts and permille compares) so the
    // pass decision is bit-stable.
    "q_quality_gopher" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("norm", Dedup.normalized(col("text")))
        .withColumn("toks", split(col("norm"), " "))
        .withColumn("g2", CorpusOps.ngrams(col("toks"), 2))
      d.select(col("lang"),
          size(col("toks")).cast("long").as("n_tok"),
          (length(col("norm")) - (size(col("toks")) - 1)).cast("long").as("n_chars_ns"),
          size(col("g2")).cast("long").as("n_2g"),
          (size(col("g2")) - size(array_distinct(col("g2")))).cast("long").as("n_dup2"),
          CorpusOps.gopherPass(col("toks")).cast("long").as("pass"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pass")).as("n_pass"),
          sum(col("n_2g")).as("total_2grams"),
          sum(col("n_dup2")).as("dup_2grams"),
          round(sum(col("n_dup2")).cast("double") / sum(col("n_2g")), 4)
            .as("dup_frac"),
          round(sum(col("n_chars_ns")).cast("double") / sum(col("n_tok")), 4)
            .as("mean_word_len"))
    }),

    // PII redaction over deterministically-augmented text (the synthetic
    // corpus has no PII, so the query plants one email/IP/account per doc
    // with the same expression the oracle uses — the regex chain and the
    // redaction-length accounting are what is under test).
    "q_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com via 10."),
        (col("doc_id") % 200).cast("string"), lit(".0.7 ref 987654321"))
      val (ne, ni, nn) = CorpusOps.piiCounts(col("aug"))
      t(s, dir, "documents")
        .withColumn("aug", aug)
        .select(col("lang"), ne.as("n_email"), ni.as("n_ip"), nn.as("n_num"),
          (length(col("aug")) - length(CorpusOps.redactPii(col("aug"))))
            .cast("long").as("chars_removed"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_email")).as("emails"),
          sum(col("n_ip")).as("ips"), sum(col("n_num")).as("nums"),
          sum(col("chars_removed")).as("chars_removed"))
    }),

    // Concat-and-chunk packing per language stream, budget 128 tokens
    // (a power of two so the chunk-index division is exact): chunk
    // count, docs straddling a boundary, total tokens.
    "q_pack_chunks" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", TextAnalysis.tokens(col("text")))
      CorpusOps.packChunks(docs, "doc_id", size(col("toks")), "lang", 128)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("cum")).as("total_toks"),
          (floor((max(col("cum")) - 1) / 128) + 1).as("n_chunks"),
          sum(when(col("first_chunk") =!= col("last_chunk"), 1L)
            .otherwise(0L)).as("n_split"))
    }),

    // The composed pipeline — quality gate → exact-dup removal →
    // stratified mixture sampling → per-lang stats — as ONE declarative
    // plan (each stage is a codegen filter/window over the same scan;
    // Catalyst fuses them, which is the point of expressing corpus prep
    // relationally). Oracle replays every stage's integer arithmetic.
    "q_corpus_pipeline" -> ((s, dir) => {
      val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
      // Stage order: dedup FIRST (cheap digest), then quality + mixture
      // sampling on the survivors. The Window is also the plan's
      // materialization barrier: its child projection computes norm/
      // toks/g2 ONCE per row, and the quality predicate above reads the
      // bound attributes — without the barrier, projection collapse
      // inlines the tokenizer into every predicate reference (~6
      // re-tokenizations/row, measured 6.8s → 1.3s at sf0.1).
      t(s, dir, "documents")
        .withColumn("norm", Dedup.normalized(col("text")))
        .withColumn("toks", split(col("norm"), " "))
        .withColumn("g2", CorpusOps.ngrams(col("toks"), 2))
        .withColumn("digest", md5(col("norm").cast("binary")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 &&
          size(col("toks")).between(5, 100000) &&
          TextAnalysis.markerHits(col("toks"),
            TextAnalysis.langMarkers("en")) >= 2 &&
          (size(col("g2")) - size(array_distinct(col("g2")))).cast("long") * 1000 <=
            lit(600L) * (size(col("toks")) - 1) &&
          ((col("doc_id") % 100000007L) * 2654435761L % 100) <
            when(col("lang") === "en", 50).otherwise(20))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).cast("long").as("total_toks"))
    }),

    // Winnowing fingerprints (k=3-word grams, window w=4): per-doc
    // fingerprint count + a mod-prime checksum over the selected hashes
    // — the oracle replays FNV-1a, the signed-min window walk and the
    // checksum, so the whole selection arithmetic is hash-checked.
    "q_fingerprint_winnow" -> ((s, dir) => {
      val fps = col("fps")
      t(s, dir, "documents")
        .withColumn("toks", split(Dedup.normalized(col("text")), " "))
        // hashes bound ONCE; inlining them into the window transform
        // re-hashes every gram per window (no CSE in interpreted HOFs)
        .withColumn("hs", CorpusOps.gramHashes(col("toks"), k = 3))
        .withColumn("fps", CorpusOps.winnowFromHashes(col("hs"), w = 4))
        .select(col("doc_id"),
          size(fps).cast("long").as("n_fp"),
          aggregate(fps, lit(0L), (acc, x) => acc + (x % 1000000007L))
            .as("fp_csum"))
    }),

    // RAG-style chunking: 100-char windows, 20-char overlap; per-chunk
    // md5 makes the gate content-exact, not just count-exact.
    "q_doc_chunks" -> ((s, dir) => {
      CorpusOps.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
          size = 100, overlap = 20)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          length(col("chunk")).cast("long").as("chunk_chars"),
          md5(col("chunk").cast("binary")).as("chunk_md5"))
    }),

    // Test-set decontamination: every 50th doc is the "benchmark"; a
    // corpus doc is contaminated if it shares any 4-gram with it (4
    // chosen so the synthetic vocab yields a partial hit set — real
    // corpora use 8-13).
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 50 === 0)
      val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      // bloom-prefiltered variant: byte-identical to contaminatedIds
      // (the exact semi-join removes bloom false positives) but the
      // corpus gram stream is cut inside the scan — the 100 TB plan
      val flagged = CorpusOps.contaminatedIdsBloom(corpus, evalSet, "doc_id", "text", 4)
        .withColumnRenamed("id", "doc_id").withColumn("hit", lit(1L))
      corpus.join(flagged, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_corpus"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
    }),

    // TF-IDF top-3 terms per language (scores rounded to 4 before the
    // rank cut so the top-k boundary is engine-stable).
    "q_tfidf_top" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", TextAnalysis.tokens(col("text")))
      val scored = CorpusOps.tfidfTerms(docs, "doc_id", col("toks"), "lang")
      val w = Window.partitionBy(col("stream"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("stream").as("lang"), col("term"), col("rk"),
          col("cnt"), col("dfreq"), col("tfidf"))
    }))

  def oracles: Map[String, String] = Map(
    // Replays Ann.ivfIndexDeterministic(nlist=8, iters=1) exactly as the
    // q_ann_ivf_topk oracle does (seed = 8 lowest vec_ids, one Lloyd
    // step, (euclidean, cell) tie-break), then the intra-cell pair rule.
    "q_semdedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cent
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
        |rem AS (SELECT DISTINCT b.vec_id AS id
        |  FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3)
        |SELECT a1.cell, count(*) AS n_docs,
        |  sum(CASE WHEN rem.id IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_removed
        |FROM a1 LEFT JOIN rem ON a1.vec_id = rem.id
        |GROUP BY a1.cell""".stripMargin,

    "q_quality_gopher" ->
      """WITH d AS (SELECT lang,
        |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |tk AS (SELECT lang, norm, string_split(norm, ' ') AS toks FROM d),
        |g AS (SELECT lang, len(toks) AS n_tok,
        |    len(norm) - (len(toks) - 1) AS n_chars_ns,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS hits,
        |    list_filter(list_transform(toks, (x, i) ->
        |      CASE WHEN i <= len(toks) - 1 THEN toks[i] || ' ' || toks[i+1] END),
        |      s -> s IS NOT NULL) AS g2
        |  FROM tk),
        |m AS (SELECT lang, n_tok, n_chars_ns, len(g2) AS n_2g,
        |    len(g2) - len(list_distinct(g2)) AS n_dup2,
        |    CASE WHEN n_tok BETWEEN 5 AND 100000 AND hits >= 2
        |      AND (len(g2) - len(list_distinct(g2))) * 1000 <= 600 * (len(g2))
        |      THEN 1 ELSE 0 END AS pass
        |  FROM g)
        |SELECT lang, count(*) AS n_docs, sum(pass)::BIGINT AS n_pass,
        |  sum(n_2g)::BIGINT AS total_2grams, sum(n_dup2)::BIGINT AS dup_2grams,
        |  round(sum(n_dup2)::DOUBLE / sum(n_2g), 4) AS dup_frac,
        |  round(sum(n_chars_ns)::DOUBLE / sum(n_tok), 4) AS mean_word_len
        |FROM m GROUP BY lang""".stripMargin,

    "q_pii_scrub" ->
      """WITH a AS (SELECT lang,
        |    text || ' contact user' || doc_id::VARCHAR || '@mail.example.com via 10.'
        |      || (doc_id % 200)::VARCHAR || '.0.7 ref 987654321' AS aug
        |  FROM documents),
        |r AS (SELECT lang, aug,
        |    regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                   '<EMAIL>', 'g') AS s1
        |  FROM a),
        |r2 AS (SELECT lang, aug, s1,
        |    regexp_replace(s1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
        |                   '<IP>', 'g') AS s2
        |  FROM r),
        |m AS (SELECT lang, aug,
        |    len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(s1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ip,
        |    len(regexp_extract_all(s2, '[0-9]{9,}')) AS n_num,
        |    len(aug) - len(regexp_replace(s2, '[0-9]{9,}', '<NUM>', 'g')) AS chars_removed
        |  FROM r2)
        |SELECT lang, count(*) AS n_docs, sum(n_email)::BIGINT AS emails,
        |  sum(n_ip)::BIGINT AS ips, sum(n_num)::BIGINT AS nums,
        |  sum(chars_removed)::BIGINT AS chars_removed
        |FROM m GROUP BY lang""".stripMargin,

    "q_pack_chunks" ->
      """WITH d AS (SELECT doc_id, lang,
        |    len(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
        |      AS n_tok
        |  FROM documents),
        |c AS (SELECT lang, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |f AS (SELECT lang, cum,
        |    floor((cum - n_tok) / 128.0)::BIGINT AS first_chunk,
        |    floor((cum - 1) / 128.0)::BIGINT AS last_chunk
        |  FROM c)
        |SELECT lang, count(*) AS n_docs, max(cum)::BIGINT AS total_toks,
        |  (floor((max(cum) - 1) / 128.0) + 1)::BIGINT AS n_chunks,
        |  sum(CASE WHEN first_chunk <> last_chunk THEN 1 ELSE 0 END)::BIGINT AS n_split
        |FROM f GROUP BY lang""".stripMargin,

    "q_corpus_pipeline" ->
      """WITH d AS (SELECT doc_id, lang,
        |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |tk AS (SELECT doc_id, lang, norm, string_split(norm, ' ') AS toks FROM d),
        |g AS (SELECT doc_id, lang, norm, toks,
        |    list_filter(list_transform(toks, (x, i) ->
        |      CASE WHEN i <= len(toks) - 1 THEN toks[i] || ' ' || toks[i+1] END),
        |      s2 -> s2 IS NOT NULL) AS g2
        |  FROM tk),
        |dd AS (SELECT *, row_number() OVER (PARTITION BY md5(norm)
        |    ORDER BY doc_id) AS rn FROM g),
        |kept AS (SELECT * FROM dd WHERE rn = 1
        |  AND len(toks) BETWEEN 5 AND 100000
        |  AND len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) >= 2
        |  AND (len(g2) - len(list_distinct(g2))) * 1000 <= 600 * (len(toks) - 1)
        |  AND ((doc_id % 100000007) * 2654435761) % 100 <
        |      CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
        |SELECT lang, count(*) AS n_docs, sum(len(toks))::BIGINT AS total_toks
        |FROM kept GROUP BY lang""".stripMargin,

    "q_fingerprint_winnow" -> {
      // mirrors CorpusOps.winnowFingerprints(k=3, w=4): FNV-1a per gram
      // reduced to SIGNED 64-bit (Spark longs compare signed, so the
      // window minimum must too), windows of 4, distinct mins, checksum
      // = sum of (v % 1000000007) with dividend-sign % on both engines.
      val fnv = DataOps.fnvSql("g2")
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
         |  FROM documents),
         |g AS (SELECT doc_id, list_filter(list_transform(toks, (x, i) ->
         |    CASE WHEN i <= len(toks) - 2
         |      THEN toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] END),
         |    s -> s IS NOT NULL) AS grams
         |  FROM tk),
         |h AS (SELECT doc_id, list_transform(grams, g2 ->
         |    CASE WHEN ($fnv) >= 9223372036854775808
         |      THEN (($fnv) - ${DataOps.M64})::BIGINT
         |      ELSE ($fnv)::BIGINT END) AS hs
         |  FROM g),
         |win AS (SELECT doc_id, list_filter(list_distinct(
         |    list_transform(range(1, greatest(len(hs) - 4 + 1, 1) + 1),
         |      i -> list_min(hs[i:i+3]))), v -> v IS NOT NULL) AS fps
         |  FROM h)
         |SELECT doc_id, len(fps)::BIGINT AS n_fp,
         |  COALESCE(list_reduce(list_prepend(0::BIGINT,
         |    list_transform(fps, v -> v % 1000000007)), (a, b) -> a + b), 0)::BIGINT
         |    AS fp_csum
         |FROM win""".stripMargin
    },

    "q_doc_chunks" ->
      """SELECT doc_id, i AS chunk_idx,
        | length(substr(text, (i * 80 + 1)::INT, 100)) AS chunk_chars,
        | md5(substr(text, (i * 80 + 1)::INT, 100)) AS chunk_md5
        |FROM (SELECT doc_id, text,
        |   unnest(range((length(text) + 79) // 80)) AS i
        | FROM documents)""".stripMargin,

    "q_decontaminate" ->
      """WITH tk AS (SELECT doc_id, lang,
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id, lang, unnest(list_distinct(list_filter(
        |    list_transform(toks, (x, i) -> CASE WHEN i <= len(toks) - 3
        |      THEN toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] END),
        |    s -> s IS NOT NULL))) AS g
        |  FROM tk),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (g)
        |  WHERE doc_id % 50 <> 0)
        |SELECT d.lang, count(*) AS n_corpus,
        |  sum(CASE WHEN hit.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT
        |    AS n_contaminated
        |FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        |WHERE d.doc_id % 50 <> 0
        |GROUP BY d.lang""".stripMargin,

    "q_tfidf_top" ->
      """WITH tk AS (SELECT doc_id, lang,
        |    string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents),
        |x AS (SELECT doc_id, lang, unnest(toks) AS term FROM tk),
        |pt AS (SELECT lang, term, count(*) AS cnt,
        |    count(DISTINCT doc_id) AS dfreq FROM x GROUP BY lang, term),
        |ps AS (SELECT lang, count(DISTINCT doc_id) AS n_docs FROM x GROUP BY lang),
        |sc AS (SELECT pt.lang, term, cnt, dfreq,
        |    round(cnt * ln(ps.n_docs::DOUBLE / dfreq), 4) AS tfidf
        |  FROM pt JOIN ps ON pt.lang = ps.lang),
        |rk AS (SELECT lang, term, cnt, dfreq, tfidf, row_number() OVER (
        |    PARTITION BY lang ORDER BY tfidf DESC, term) AS rk FROM sc)
        |SELECT lang, term, rk, cnt, dfreq, tfidf FROM rk WHERE rk <= 3""".stripMargin)
}
