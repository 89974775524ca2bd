package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusOps

/** Pins the sub-document corpus operators on hand-built inputs:
  * paragraph dedup's first-occurrence rule and doc reconstruction,
  * duplicate-substring span merging, classifier state arithmetic. (The
  * sf0.01 gate hash-checks the same operators against DuckDB; these
  * cases document WHY each answer is what it is.)
  */
class TrainingOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("paragraphDedup keeps the globally first occurrence and rebuilds docs") {
    // "b" appears in doc 1 (idx 1) and doc 2 (idx 0): doc 1 wins.
    // "a" appears twice inside doc 1: only the first survives.
    val d = Seq(
      (1L, Seq("a", "b", "a")),
      (2L, Seq("b", "c"))
    ).toDF("doc_id", "paras")
    val out = CorpusOps.paragraphDedup(d, "doc_id", col("paras"))
      .orderBy("doc_id")
      .select("doc_id", "n_paras", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, "a b"), (2L, 2L, 1L, "c")))
  }

  test("paragraphDedup: a doc made entirely of dups keeps empty text") {
    val d = Seq((1L, Seq("x")), (2L, Seq("x"))).toDF("doc_id", "paras")
    val out = CorpusOps.paragraphDedup(d, "doc_id", col("paras"))
      .orderBy("doc_id").select("n_kept", "kept_text")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x"), (0L, "")))
  }

  test("repetitionSignals: top-n-gram char coverage is count times gram chars") {
    // "a b a b a": 2-grams {a b, b a, a b, b a} → best cover 2·len("a b")=6;
    // 3-grams {a b a ×2, b a b} → 2·5=10; 4-grams all unique → 1·7=7;
    // no repeated 5-gram → dup5 coverage 0.
    val d = Seq((1L, Seq("a", "b", "a", "b", "a"))).toDF("doc_id", "toks")
    val out = CorpusOps.repetitionSignals(d, "doc_id", col("toks"))
      .select("n_toks", "top2_chars", "top3_chars", "top4_chars", "dup5_toks")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((5L, 6L, 10L, 7L, 0L)))
  }

  test("repetitionSignals: duplicate-5-gram coverage merges overlapping spans") {
    // period-5 repeat "c d e f g"×3: every 5-gram start is duplicated,
    // union covers all 15 positions. Second doc repeats only its first
    // 5-gram at position 6: [0,5) ∪ [6,11) = 10 covered, not 11.
    val d = Seq(
      (1L, Seq("c", "d", "e", "f", "g", "c", "d", "e", "f", "g", "c", "d", "e", "f", "g")),
      (2L, Seq("u", "v", "w", "x", "y", "z", "u", "v", "w", "x", "y"))
    ).toDF("doc_id", "toks")
    val out = CorpusOps.repetitionSignals(d, "doc_id", col("toks"))
      .orderBy("id").select("n_toks", "dup5_toks", "dup10_toks")
      .as[(Long, Long, Long)].collect().toSeq
    // 10-grams of the period-5 doc still repeat (starts 0 and 5 overlap
    // to cover all 15); the second doc has no repeated 10-gram.
    assert(out == Seq((15L, 15L, 15L), (11L, 10L, 0L)))
  }

  test("repetitionSignals: short docs yield zero coverage, not nulls") {
    val d = Seq((7L, Seq("only"))).toDF("doc_id", "toks")
    val out = CorpusOps.repetitionSignals(d, "doc_id", col("toks"))
      .select("n_toks", "top2_chars", "top3_chars", "top4_chars", "dup5_toks")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("dupSpans merges overlapping and adjacent duplicate k-gram ranges") {
    // k=2 over: doc1 = p q r s t, doc2 = p q r x s t
    // duplicate 2-grams: "p q" (d1@0, d2@0), "q r" (d1@1, d2@1),
    // "s t" (d1@3, d2@4).
    // doc1: positions 0,1 merge to [0,3); position 3 gives [3,5) —
    // adjacent to [0,3) (3 > 3 is false) so ONE span [0,5).
    // doc2: [0,3) and [4,6) stay separate (4 > 3).
    val d = Seq(
      (1L, Seq("p", "q", "r", "s", "t")),
      (2L, Seq("p", "q", "r", "x", "s", "t"))
    ).toDF("doc_id", "toks")
    val out = CorpusOps.dupSpans(d, "doc_id", col("toks"), k = 2)
      .orderBy("doc_id", "span_start")
      .select("doc_id", "span_start", "span_end", "span_toks")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 5L, 5L), (2L, 0L, 3L, 3L), (2L, 4L, 6L, 2L)))
  }

  test("dupSpans: a corpus with no repeated k-grams yields no spans") {
    val d = Seq((1L, Seq("a", "b", "c")), (2L, Seq("d", "e", "f")))
      .toDF("doc_id", "toks")
    assert(CorpusOps.dupSpans(d, "doc_id", col("toks"), k = 2).count() == 0)
  }

  test("lmScore: add-one bigram NLL replays by hand") {
    // corpus: d1 = a b a b, d2 = a b c
    // bigram counts: "a b"->3, "b a"->1, "b c"->1
    // left-context totals: c1(a)=3, c1(b)=2; right-vocab V = {b,a,c} = 3
    val d = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b", "c"))
    ).toDF("doc_id", "toks")
    val out = CorpusOps.lmScore(d, "doc_id", col("toks"))
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "nll_sum", "vocab")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._4)) == Seq((1L, 3L, 3L), (2L, 2L, 3L)))
    // d1: -2 ln P(b|a) - ln P(a|b), P(b|a)=(3+1)/(3+3), P(a|b)=(1+1)/(2+3)
    val d1 = 2 * math.log(6.0 / 4) + math.log(5.0 / 2)
    // d2: -ln P(b|a) - ln P(c|b), P(c|b)=(1+1)/(2+3)
    val d2 = math.log(6.0 / 4) + math.log(5.0 / 2)
    assert(math.abs(out(0)._3 - d1) < 1e-9 && math.abs(out(1)._3 - d2) < 1e-9)
  }

  test("lmScore: docs without a bigram produce no row") {
    val d = Seq((1L, Seq("solo")), (2L, Seq("a", "b"))).toDF("doc_id", "toks")
    val out = CorpusOps.lmScore(d, "doc_id", col("toks"))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("mixTemperature: integer ppm derivation and deterministic coin") {
    // X: 4 docs -> w=floor(1000*2)=2000; Y: 1 doc -> w=1000; S=3000
    // budget 3: ppm_X = floor(1e6*3*2000 / (3000*4)) = 500000
    //           ppm_Y = floor(1e6*3*1000 / (3000*1)) = 1e6 (capped)
    val d = Seq(("x1", "X"), ("x2", "X"), ("x3", "X"), ("x4", "X"),
      ("y1", "Y")).toDF("doc_id", "lang")
    val out = CorpusOps.mixTemperature(d, "doc_id", "lang", budget = 3L)
    val ppm = out.select("lang", "ppm").distinct().as[(String, Long)]
      .collect().toMap
    assert(ppm == Map("X" -> 500000L, "Y" -> 1000000L))
    // every Y doc survives the capped rate; X decisions replay the coin
    val kept = out.filter(col("keep")).select("doc_id").as[String]
      .collect().toSet
    assert(kept.contains("y1"))
    val expectX = Seq("x1", "x2", "x3", "x4").filter { id =>
      val h = graft.functions.SimHash64.fnv1a64(id)
      ((h % 1000000) + 1000000) % 1000000 < 500000
    }.toSet
    assert(kept - "y1" == expectX)
  }

  test("mixTemperature: corpus side joins the rate table by broadcast") {
    val d = Seq(("a", "X"), ("b", "Y")).toDF("doc_id", "lang")
    val plan = CorpusOps.mixTemperature(d, "doc_id", "lang", budget = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("classifierState: gram count and deterministic milli-weight sum") {
    val d = Seq(("u v w")).toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .select(CorpusOps.classifierState(col("toks")).as("st"))
      .select("st.n_grams", "st.milli_sum").as[(Long, Long)].head()
    // grams = 3 unigrams + 2 bigrams
    assert(d._1 == 5L)
    // each weight is in [-1000, 1000] by construction
    assert(math.abs(d._2) <= 5000L)
    // replay the documented arithmetic for one gram
    val h = graft.functions.SimHash64.fnv1a64("u")
    val b = ((h % 1024) + 1024) % 1024
    val w = (b * 2654435761L) % 2001L - 1000L
    assert(w >= -1000L && w <= 1000L)
  }
}
