package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, TextAnalysis}

/** Pins the corpus-preparation semantics on hand-built inputs: SemDeDup's
  * lowest-id-survives rule, the Gopher gate's accept/reject boundaries,
  * PII redaction order, concat-and-chunk packing arithmetic, TF-IDF
  * ranking. (The sf0.01 gate hash-checks the same operators against
  * DuckDB; these cases document WHY each answer is what it is.)
  */
class CorpusSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("semDedup removes the higher id of a near-duplicate pair only") {
    // two near-identical vectors + one orthogonal, single cell
    val d = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val stats = CorpusOps.semDedupStats(d, "vec_id", "embedding",
      nlist = 1, iters = 1, threshold = 0.9).collect()
    assert(stats.length == 1)
    assert(stats.head.getAs[Long]("n_docs") == 3)
    assert(stats.head.getAs[Long]("n_removed") == 1) // only id 2
    val pairs = CorpusOps.semDedupPairs(d, "vec_id", "embedding",
      nlist = 1, iters = 1, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("gopherPass boundaries: length, stopwords, repetition") {
    val d = Seq(
      (1L, "the cat sat of the mat and slept"),        // passes
      (2L, "the of"),                                  // too short (<5 tokens)
      (3L, "lorem ipsum dolor sit amet consectetur"),  // no stopword hits
      (4L, "the a " + Seq.fill(40)("spam spam").mkString(" ")) // dup 2-grams
    ).toDF("doc_id", "text")
    val out = d
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), CorpusOps.gopherPass(col("toks")).as("pass"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && !out(3L) && !out(4L))
  }

  test("duplicate n-gram count is occurrences beyond first") {
    val d = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    // 2-grams: [a b, b a, a b, b a] -> 4 total, 2 distinct -> 2 dup
    val n = d.withColumn("toks", split(col("text"), " "))
      .select(CorpusOps.dupNgramCount(col("toks"), 2)).as[Long].head()
    assert(n == 2L)
  }

  test("PII redaction replaces email, IPv4 and long digit runs in order") {
    val d = Seq((1L,
      "write bob.smith+x@corp.example.co from 192.168.1.200 acct 4111111111111111 ok"))
      .toDF("doc_id", "text")
    val red = d.select(CorpusOps.redactPii(col("text"))).as[String].head()
    assert(red == "write <EMAIL> from <IP> acct <NUM> ok")
    val (ne, ni, nn) = CorpusOps.piiCounts(col("text"))
    val counts = d.select(ne, ni, nn).as[(Long, Long, Long)].head()
    assert(counts == ((1L, 1L, 1L)))
  }

  test("packChunks computes chunk spans from the per-stream running sum") {
    // three 100-token docs, budget 128: doc 2 and 3 straddle boundaries
    val text100 = Seq.fill(100)("w").mkString(" ")
    val d = Seq((1L, "s", text100), (2L, "s", text100), (3L, "s", text100))
      .toDF("doc_id", "stream", "text")
    val out = CorpusOps.packChunks(d, "doc_id",
        TextAnalysis.tokenCount(col("text")), "stream", 128)
      .select("doc_id", "first_chunk", "last_chunk")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 2L)))
  }

  test("chunkDocs covers the text with overlapping windows, tail included") {
    val d = Seq((1L, "a" * 250), (2L, "b" * 80), (3L, "c" * 10))
      .toDF("doc_id", "text")
    val out = CorpusOps.chunkDocs(d, "doc_id", "text", size = 100, overlap = 20)
      .select($"doc_id", $"chunk_idx", length($"chunk").as("len"))
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    // 250 chars, stride 80: starts 0/80/160/240 -> lengths 100/100/90/10
    assert(out(1L).sortBy(_._2).map(_._3).toSeq == Seq(100, 100, 90, 10))
    assert(out(2L).map(_._3).toSeq == Seq(80)) // exactly one stride: 1 chunk
    assert(out(3L).map(_._3).toSeq == Seq(10)) // shorter than one window
  }

  test("contaminatedIds flags only corpus docs sharing an n-gram with eval") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y alpha beta gamma delta z"), // shares the 4-gram
      (2L, "alpha beta gamma zeta eta"),    // longest shared run is 3
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val ids = CorpusOps.contaminatedIds(corpus, eval, "doc_id", "text", 4)
      .as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("winnowing: docs sharing a long-enough run share a fingerprint") {
    // k=3, w=4: any shared run of >= w+k-1 = 6 words guarantees a shared
    // window minimum (the winnowing paper's correctness property)
    val shared = "one two three four five six"
    val d = Seq(
      (1L, s"aa bb $shared cc dd"),
      (2L, s"xx yy zz $shared qq"),
      (3L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"),
        CorpusOps.winnowFingerprints(col("toks"), 3, 4).as("fps"))
    val fps = d.as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
    // density: ~2/(w+1) of grams survive; never more than the gram count
    assert(fps(1L).nonEmpty && fps(1L).size <= 8)
  }

  test("bloom-prefiltered decontamination matches the exact operator") {
    val docs = Tables.load(spark, sf, "documents")
    val eval = docs.filter($"doc_id" % 50 === 0)
    val corpus = docs.filter($"doc_id" % 50 =!= 0)
    val exact = CorpusOps.contaminatedIds(corpus, eval, "doc_id", "text", 4)
      .as[Long].collect().toSet
    val bloom = CorpusOps.contaminatedIdsBloom(corpus, eval, "doc_id", "text", 4)
      .as[Long].collect().toSet
    assert(bloom == exact, s"bloom=${bloom.size} exact=${exact.size}")
    assert(exact.nonEmpty) // non-degenerate on the spec corpus
  }

  test("tfidf ranks stream-specific terms above ubiquitous ones") {
    val d = Seq(
      (1L, "s", "common rare common"),
      (2L, "s", "common other"),
      (3L, "s", "common third")
    ).toDF("doc_id", "stream", "text")
    val scores = CorpusOps.tfidfTerms(d, "doc_id",
        split(col("text"), " "), "stream")
      .select("term", "tfidf").as[(String, Double)].collect().toMap
    assert(scores("common") == 0.0) // in every doc: ln(3/3) = 0
    assert(scores("rare") > 0.0 && scores("rare") == scores("other"))
  }
}
