package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TokenMatcher, VolnitskySearcher}

/** countSubstrings + hasToken (reference CountSubstringsImpl.h /
  * HasTokenImpl.h): non-overlapping greedy counts and token-boundary
  * matches must be identical to straightforward reference
  * implementations on every input, across the Volnitsky engine AND the
  * short-needle fallbacks; the SQL functions must keep the reference's
  * documented edge semantics. */
class CountTokenSpec extends AnyFunSuite {
  import TestSpark._

  /** Straightforward greedy non-overlap count (the semantics of the
    * reference's constantConstantScalar: find, skip needle length). */
  private def refCount(hay: String, needle: String): Long = {
    if (needle.isEmpty) return 0L
    var cnt = 0L
    var from = 0
    var p = hay.indexOf(needle, from)
    while (p >= 0) {
      cnt += 1
      from = p + needle.length
      p = hay.indexOf(needle, from)
    }
    cnt
  }

  private def volCount(hay: String, needle: String): Long =
    new VolnitskySearcher(UTF8String.fromString(needle).getBytes)
      .countOccurrences(UTF8String.fromString(hay))

  private def refToken(hay: String, needle: String, ci: Boolean): Boolean = {
    val h = if (ci) hay.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c) else hay
    val n = if (ci) needle.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c) else needle
    val hb = h.getBytes("UTF-8")
    val nb = n.getBytes("UTF-8")
    def sep(b: Byte) = b >= 0 && !b.toChar.isLetterOrDigit
    (0 to hb.length - nb.length).exists { p =>
      (0 until nb.length).forall(i => hb(p + i) == nb(i)) &&
        (p == 0 || sep(hb(p - 1))) &&
        (p + nb.length == hb.length || sep(hb(p + nb.length)))
    }
  }

  test("countOccurrences: greedy non-overlap identity on edge shapes") {
    // the reference's documented case, at engine length
    assert(volCount("aaaaaaaaaa", "aaaa") == 2) // greedy 0, 4; tail of 2 left
    assert(volCount("aaaa", "aaaa") == 1)
    assert(volCount("", "abcd") == 0)
    val cases = Seq(
      ("abcdabcdabcd", "abcd", 3L), ("xabcdxabcdx", "abcd", 2L),
      ("ababababab", "abab", 2L), ("abcd", "abcde", 0L),
      ("metrika metrika metrikametrika", "metrika", 4L))
    for ((h, n, want) <- cases) {
      assert(volCount(h, n) == want, s"hay=$h needle=$n")
      assert(refCount(h, n) == want, s"reference impl drifted: $h/$n")
    }
  }

  test("countOccurrences: randomized identity vs greedy reference") {
    val rnd = new scala.util.Random(1916)
    for (alpha <- Seq("ab", "abc", "ab x"); _ <- 0 until 4000) {
      val needle = (0 until (4 + rnd.nextInt(5)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val hay = (0 until rnd.nextInt(80))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(volCount(hay, needle) == refCount(hay, needle),
        s"needle=$needle hay=$hay")
    }
  }

  test("count_substrings SQL: engine path, short-needle replace path, " +
      "overlap-once semantics, empty needle, null text") {
    val rows = spark.sql(
      """SELECT count_substrings('aaaa', 'aa') AS a,
        |  count_substrings('abcdabcd', 'abcd') AS b,
        |  count_substrings('xyz', '') AS c,
        |  count_substrings(CAST(NULL AS STRING), 'abcd') AS d,
        |  count_substrings('no-match-here', 'abcd') AS e""".stripMargin)
      .collect().head
    assert(rows.getLong(0) == 2L) // intersecting counted once
    assert(rows.getLong(1) == 2L)
    assert(rows.getLong(2) == 0L) // reference: empty needle -> 0
    assert(rows.isNullAt(3))
    assert(rows.getLong(4) == 0L)
  }

  test("count_substrings_ci SQL: raw-column CI engine on ASCII, " +
      "Unicode-lower fallback on non-ASCII haystacks") {
    val rows = spark.sql(
      """SELECT count_substrings_ci('TaBle table TABLE', 'tAbLe') AS a,
        |  count_substrings_ci('blinK Kelvin', 'k') AS b,
        |  count_substrings_ci('Kelvin sign', 'kelvin') AS c""".stripMargin)
      .collect().head
    assert(rows.getLong(0) == 3L)
    // short CI needle -> replace path over lower(); U+212A lowers to 'k'
    assert(rows.getLong(1) == 2L)
    // engine needle but non-ASCII haystack -> toLowerCase fallback row
    assert(rows.getLong(2) == 1L)
  }

  test("TokenMatcher: boundaries, separators, fallback tiers") {
    def tok(h: String, n: String, ci: Boolean = false): Boolean =
      new TokenMatcher(UTF8String.fromString(n).getBytes, ci)
        .matches(UTF8String.fromString(h))
    assert(tok("a table here", "table"))
    assert(tok("table", "table")) // both edges are string edges
    assert(tok("x.table,y", "table")) // punctuation separators
    assert(tok("x_table_y", "table")) // '_' is non-alnum -> separator
    assert(!tok("xtable y", "table")) // alnum neighbor
    assert(!tok("a tables", "table"))
    assert(!tok("a tabl e", "table"))
    assert(!tok("étable", "table")) // non-ASCII byte is NOT a separator
    assert(tok("é table", "table")) // the space is
    assert(tok("ab cd", "ab")) // short needle -> naive tier
    assert(!tok("abc d", "ab"))
    assert(tok("x TABLE y", "table", ci = true))
    assert(!tok("x TABLEs y", "table", ci = true))
    val long = "q" * 300 // past MaxNeedle -> naive tier
    assert(tok(s"x $long y", long))
    assert(!tok(s"x${long}y", long))
  }

  test("hasToken: randomized identity vs boundary-scan reference") {
    val rnd = new scala.util.Random(7216)
    for (alpha <- Seq("ab .", "abc_ ", "aB x."); _ <- 0 until 3000) {
      val needle = (0 until (4 + rnd.nextInt(4)))
        .map(_ => "abAB"(rnd.nextInt(4))).mkString
      val hay = (0 until rnd.nextInt(60))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      for (ci <- Seq(false, true)) {
        val got = new TokenMatcher(UTF8String.fromString(needle).getBytes, ci)
          .matches(UTF8String.fromString(hay))
        assert(got == refToken(hay, needle, ci),
          s"needle=$needle hay=$hay ci=$ci")
      }
    }
  }

  test("has_token SQL: engine routed, CI folds, separator needle throws") {
    val rows = spark.sql(
      """SELECT has_token('a table b', 'table') AS a,
        |  has_token('a xtable b', 'table') AS b,
        |  has_token_ci('a TABLE b', 'table') AS c,
        |  has_token(CAST(NULL AS STRING), 'table') AS d""".stripMargin)
      .collect().head
    assert(rows.getBoolean(0) && !rows.getBoolean(1) && rows.getBoolean(2))
    assert(rows.isNullAt(3))
    // a needle containing a separator can never be a token: reference
    // throws BAD_ARGUMENTS, the registration must throw too
    val e = intercept[Exception] {
      spark.sql("SELECT has_token('a b', 'a b')").collect()
    }
    assert(e.getMessage.contains("separator"))
  }
}
