package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, Coalesce, Contains, CreateArray, EqualTo, Expression, If, IsNull, Least, Literal, Lower, Or, StringLocate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002 — the standard
  * near-duplicate fingerprint; reference has no direct equivalent, this is
  * part of the training-data dedup surface).
  *
  * Per token: a stable 64-bit FNV-1a hash votes +1/-1 on each bit; the
  * fingerprint sets bits with positive vote sums. Documents differing in a
  * few tokens land within small Hamming distance.
  *
  * Implemented as a Catalyst `Expression` (preference (b) in SURVEY §2.9:
  * native expression over UDF): no SerDe per row beyond the array read,
  * null-safe, usable in any Column position. Codegen emits a static call
  * to [[SimHash64.compute]] so fingerprinting stays inside
  * WholeStageCodegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Static kernel shared by eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
  /** Stable public 64-bit FNV-1a over UTF-8 bytes. */
  def fnv1a64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(UTF8String.fromString(s))
}

/** fnv1a64(string) — the stable public FNV-1a 64-bit hash over UTF-8
  * bytes, as a Column-usable expression. Used where a hash value must be
  * reproducible OUTSIDE the JVM (LSH band buckets, shingle hashes): the
  * byte-at-a-time xor/multiply loop is trivially re-expressible in any
  * SQL engine, which is what lets the DuckDB oracles verify banding
  * arithmetic bit-for-bit. */
case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires string, got ${child.dataType}")
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.fnv1a64(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash64.fnv1a64($s);")
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Expr =
    copy(child = newChild)
}

/** Column-level entry points for custom scalar expressions.
  *
  * Custom expressions are registered into the session FunctionRegistry
  * (the Spark-native extension point — same registry the built-ins live
  * in) and invoked via call_function, so they compose with any Column and
  * appear in SQL too.
  */
object GraftScalar {

  /** Extract a foldable integer argument at registration time with a
    * real error message (arity, foldability, numeric width) instead of
    * an IndexOutOfBounds/ClassCast from a blind eval. */
  private def litInt(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                     i: Int, what: String): Int = {
    require(exprs.length > i, s"$what: argument ${i + 1} missing")
    val e = exprs(i)
    require(e.foldable, s"$what must be a literal, got: ${e.sql}")
    e.eval() match {
      case v: java.lang.Integer => v.intValue()
      case v: java.lang.Long => v.intValue()
      case v: java.lang.Short => v.intValue()
      case v: java.lang.Byte => v.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got: $other")
    }
  }
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  @volatile private var registered = false

  /** Idempotently register graft custom expressions with the session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a64", exprs => Fnv1a64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_arr", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "siphash64", exprs => SipHash64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cityhash64", exprs => CityHash64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "halfmd5", exprs => HalfMD5Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "murmurhash2_64", exprs => MurmurHash2x64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "murmurhash2_32", exprs => MurmurHash2x32Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash_encode", exprs => GeohashEncodeExpr(exprs(0), exprs(1),
        litInt(exprs, 2, "geohash_encode precision")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash_decode", exprs => GeohashDecodeExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "domain", exprs => DomainExpr(exprs.head, withoutWWW = false), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "domain_without_www", exprs => DomainExpr(exprs.head, withoutWWW = true), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "first_significant_subdomain",
      exprs => FirstSignificantSubdomainExpr(exprs.head, cut = false), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cut_to_first_significant_subdomain",
      exprs => FirstSignificantSubdomainExpr(exprs.head, cut = true), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_protocol", exprs => UrlPartExpr(exprs.head, "protocol"), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "netloc", exprs => UrlPartExpr(exprs.head, "netloc"), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_level_domain", exprs => UrlPartExpr(exprs.head, "topLevelDomain"), "built-in")
    // multiSearchAny / multiSearchFirstIndex / multiSearchAny-CI over
    // constant needles — one-pass MultiVolnitsky (reference
    // src/Functions/multiSearchAny.cpp, multiSearchFirstIndex.cpp,
    // multiSearchAnyCaseInsensitive.cpp over src/Common/Volnitsky.h).
    // Out-of-range needle sets — lengths outside [4,255], or total
    // bigram entries past the reference's small_limit budget
    // (Volnitsky.h:466; an unbounded insert into the fixed 64 K table
    // would hang, judge r14) — fall back to the equivalent OR/CASE of
    // builtin Contains. Needles are passed as raw UTF8String bytes,
    // never through java.lang.String (an invalid-UTF-8 needle keeps its
    // byte-subsequence semantics, advisor r14); .clone() detaches them
    // from the literal array's buffer.
    def constNeedles(exprs: Seq[Expression], what: String): Seq[UTF8String] = {
      require(exprs.length == 2, s"$what(text, array(needles...)): wrong arity")
      val arr = exprs(1)
      require(arr.foldable,
        s"$what: needles must be a literal array, got ${arr.sql}")
      arr.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          (0 until a.numElements()).map { i =>
            require(!a.isNullAt(i), s"$what: null needle")
            a.getUTF8String(i).clone()
          }
        case other => throw new IllegalArgumentException(
          s"$what: needles must be an array of strings, got $other")
      }
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_any", exprs => {
        val data = constNeedles(exprs, "multi_search_any")
        if (data.isEmpty)
          // exists over nothing = false; null text stays null
          If(IsNull(exprs.head),
            Literal.create(null, org.apache.spark.sql.types.BooleanType),
            Literal(false))
        else {
          val distinct = data.distinct
          if (MultiVolnitskySearcher.fitsBatched(distinct))
            MultiSearchAny(exprs.head, distinct)
          else
            data.map(s => Contains(exprs.head,
              Literal(s, org.apache.spark.sql.types.StringType)): Expression)
              .reduce(Or)
        }
      }, "built-in")
    // 1-based index of the first matching needle in ARRAY ORDER (0 when
    // none, NULL text stays NULL) — duplicates keep their positions, so
    // the needle list is NOT dedup'd here.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_first_index", exprs => {
        val data = constNeedles(exprs, "multi_search_first_index")
        val longType = org.apache.spark.sql.types.LongType
        if (data.isEmpty)
          If(IsNull(exprs.head), Literal.create(null, longType), Literal(0L))
        else if (MultiVolnitskySearcher.fitsBatched(data))
          MultiSearchFirstIndex(exprs.head, data)
        else
          If(IsNull(exprs.head), Literal.create(null, longType),
            CaseWhen(data.zipWithIndex.map { case (s, i) =>
              (Contains(exprs.head,
                Literal(s, org.apache.spark.sql.types.StringType)): Expression,
                Literal((i + 1).toLong): Expression)
            }, Some(Literal(0L))))
      }, "built-in")
    // multiSearchFirstPosition / multiSearchAllPositions (reference
    // src/Functions/multiSearchFirstPosition.cpp,
    // multiSearchAllPositions.cpp over PositionImpl.h): 1-based
    // CHARACTER positions — the reference reports bytes; characters keep
    // the functions consistent with Spark's locate/instr and DuckDB's
    // strpos on the same data. 0 = not found, NULL text stays NULL.
    // Out-of-budget needle sets fall back to the equivalent
    // least-of-locate / array-of-locate plans.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_first_position", exprs => {
        val data = constNeedles(exprs, "multi_search_first_position")
        val longType = org.apache.spark.sql.types.LongType
        val intType = org.apache.spark.sql.types.IntegerType
        if (data.isEmpty)
          If(IsNull(exprs.head), Literal.create(null, longType), Literal(0L))
        else {
          val distinct = data.distinct
          if (MultiVolnitskySearcher.fitsBatched(distinct))
            MultiSearchFirstPosition(exprs.head, distinct)
          else {
            // min nonzero locate over the needles; 0 when none matches
            def loc(n: UTF8String): Expression = StringLocate(
              Literal(n, org.apache.spark.sql.types.StringType),
              exprs.head, Literal(1))
            val nonzero = distinct.map(n =>
              If(EqualTo(loc(n), Literal(0)),
                Literal.create(null, intType), loc(n)): Expression)
            val least =
              if (nonzero.length == 1) nonzero.head else Least(nonzero)
            If(IsNull(exprs.head), Literal.create(null, longType),
              Cast(Coalesce(Seq(least, Literal(0))), longType))
          }
        }
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_all_positions", exprs => {
        val data = constNeedles(exprs, "multi_search_all_positions")
        val longType = org.apache.spark.sql.types.LongType
        // output array is ALIGNED to the needle list — no dedup
        if (data.isEmpty)
          Literal.create(Array.empty[Long],
            org.apache.spark.sql.types.ArrayType(longType, false))
        else if (MultiVolnitskySearcher.fitsBatched(data))
          MultiSearchAllPositions(exprs.head, data)
        else
          If(IsNull(exprs.head),
            Literal.create(null,
              org.apache.spark.sql.types.ArrayType(longType, false)),
            CreateArray(data.map(n => Cast(StringLocate(
              Literal(n, org.apache.spark.sql.types.StringType),
              exprs.head, Literal(1)), longType): Expression)))
      }, "built-in")
    // case-insensitive multiSearchAny: needles.exists(lower(text)
    // contains lower(needle)). ASCII needle sets scan the raw column via
    // the case-variant table; anything else takes the lower()+contains
    // fallback with identical semantics.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_any_ci", exprs => {
        val data = constNeedles(exprs, "multi_search_any_ci")
        if (data.isEmpty)
          If(IsNull(exprs.head),
            Literal.create(null, org.apache.spark.sql.types.BooleanType),
            Literal(false))
        else {
          val lowered = data.map(_.toLowerCase).distinct
          if (MultiVolnitskySearcher.fitsBatched(lowered, ci = true))
            MultiSearchAnyCI(exprs.head, lowered)
          else
            lowered.map(s => Contains(Lower(exprs.head),
              Literal(s, org.apache.spark.sql.types.StringType)): Expression)
              .reduce(Or)
        }
      }, "built-in")
    // CI variants of the position multis (reference
    // multiSearchFirstIndexCaseInsensitive.cpp,
    // multiSearchFirstPositionCaseInsensitive.cpp,
    // multiSearchAllPositionsCaseInsensitive.cpp — same engines over the
    // case-variant table, Volnitsky.h:63): ASCII lowered needle sets
    // scan the raw column (non-ASCII rows take the exact lowered-copy
    // fallback inside the engine); non-ASCII needles or over-cap sets
    // fall back to the identical composition over Lower(text). Index /
    // all-positions results align to the needle LIST — no dedup.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_first_index_ci", exprs => {
        val data = constNeedles(exprs, "multi_search_first_index_ci")
          .map(_.toLowerCase)
        val longType = org.apache.spark.sql.types.LongType
        if (data.isEmpty)
          If(IsNull(exprs.head), Literal.create(null, longType), Literal(0L))
        else if (MultiVolnitskySearcher.fitsBatched(data, ci = true))
          MultiSearchFirstIndex(exprs.head, data, ci = true)
        else
          If(IsNull(exprs.head), Literal.create(null, longType),
            CaseWhen(data.zipWithIndex.map { case (s, i) =>
              (Contains(Lower(exprs.head),
                Literal(s, org.apache.spark.sql.types.StringType)): Expression,
                Literal((i + 1).toLong): Expression)
            }, Some(Literal(0L))))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_first_position_ci", exprs => {
        val data = constNeedles(exprs, "multi_search_first_position_ci")
          .map(_.toLowerCase)
        val longType = org.apache.spark.sql.types.LongType
        val intType = org.apache.spark.sql.types.IntegerType
        if (data.isEmpty)
          If(IsNull(exprs.head), Literal.create(null, longType), Literal(0L))
        else {
          val distinct = data.distinct
          if (MultiVolnitskySearcher.fitsBatched(distinct, ci = true))
            MultiSearchFirstPosition(exprs.head, distinct, ci = true)
          else {
            def loc(n: UTF8String): Expression = StringLocate(
              Literal(n, org.apache.spark.sql.types.StringType),
              Lower(exprs.head), Literal(1))
            val nonzero = distinct.map(n =>
              If(EqualTo(loc(n), Literal(0)),
                Literal.create(null, intType), loc(n)): Expression)
            val least =
              if (nonzero.length == 1) nonzero.head else Least(nonzero)
            If(IsNull(exprs.head), Literal.create(null, longType),
              Cast(Coalesce(Seq(least, Literal(0))), longType))
          }
        }
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_search_all_positions_ci", exprs => {
        val data = constNeedles(exprs, "multi_search_all_positions_ci")
          .map(_.toLowerCase)
        val longType = org.apache.spark.sql.types.LongType
        if (data.isEmpty)
          Literal.create(Array.empty[Long],
            org.apache.spark.sql.types.ArrayType(longType, false))
        else if (MultiVolnitskySearcher.fitsBatched(data, ci = true))
          MultiSearchAllPositions(exprs.head, data, ci = true)
        else
          If(IsNull(exprs.head),
            Literal.create(null,
              org.apache.spark.sql.types.ArrayType(longType, false)),
            CreateArray(data.map(n => Cast(StringLocate(
              Literal(n, org.apache.spark.sql.types.StringType),
              Lower(exprs.head), Literal(1)), longType): Expression)))
      }, "built-in")
    // countSubstrings / countSubstringsCaseInsensitive (reference
    // src/Functions/countSubstrings.cpp, countSubstringsCaseInsensitive
    // .cpp over CountSubstringsImpl.h): NON-overlapping occurrence
    // count of a constant needle, left to right. Needles in the
    // Volnitsky range run the engine; shorter/longer ones take the
    // replace-arithmetic plan ((len(t) - len(replace(t,n,''))) /
    // len(n) — replace removes exactly the non-overlapping matches, so
    // the count is identical); empty needle → 0 (the reference's
    // explicit case). CI lowers the needle (Unicode), scans the raw
    // column when the lowered needle is ASCII, else counts in lower(t).
    def constNeedle(exprs: Seq[Expression], what: String): UTF8String = {
      require(exprs.length == 2, s"$what(text, needle): wrong arity")
      require(exprs(1).foldable && exprs(1).dataType == StringType,
        s"$what: needle must be a string literal, got ${exprs(1).sql}")
      val v = exprs(1).eval()
      require(v != null, s"$what: null needle")
      v.asInstanceOf[UTF8String].clone()
    }
    def countByReplace(t: Expression, n: UTF8String): Expression = {
      val lit = Literal(n, StringType)
      val longType = LongType
      val removed = org.apache.spark.sql.catalyst.expressions
        .StringReplace(t, lit, Literal(UTF8String.EMPTY_UTF8, StringType))
      val diff = org.apache.spark.sql.catalyst.expressions.Subtract(
        Cast(org.apache.spark.sql.catalyst.expressions.Length(t), longType),
        Cast(org.apache.spark.sql.catalyst.expressions.Length(removed),
          longType))
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        diff, Literal(n.numChars.toLong))
    }
    def volnitskyRange(n: UTF8String): Boolean =
      n.numBytes >= VolnitskySearcher.MinNeedle &&
        n.numBytes <= VolnitskySearcher.MaxNeedle
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_substrings", exprs => {
        val n = constNeedle(exprs, "count_substrings")
        if (n.numBytes == 0)
          If(IsNull(exprs.head), Literal.create(null, LongType), Literal(0L))
        else if (volnitskyRange(n)) CountSubstrings(exprs.head,
          Literal(n, StringType))
        else countByReplace(exprs.head, n)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_substrings_ci", exprs => {
        val n = constNeedle(exprs, "count_substrings_ci").toLowerCase
        if (n.numBytes == 0)
          If(IsNull(exprs.head), Literal.create(null, LongType), Literal(0L))
        else if (volnitskyRange(n) && n.isFullAscii)
          CountSubstringsCI(exprs.head, Literal(n, StringType))
        else countByReplace(Lower(exprs.head), n)
      }, "built-in")
    // hasToken / hasTokenCaseInsensitive (reference
    // src/Functions/hasToken.cpp over HasTokenImpl.h): needle delimited
    // by ASCII non-alphanumeric bytes or string edges. A needle that
    // itself contains a separator can never be a token — the reference
    // throws BAD_ARGUMENTS, so does the registration.
    def tokenNeedle(exprs: Seq[Expression], what: String): UTF8String = {
      val n = constNeedle(exprs, what)
      require(n.numBytes > 0, s"$what: empty needle")
      require(!n.getBytes.exists(VolnitskySearcher.isTokenSep),
        s"$what: needle must not contain whitespace or separator chars")
      n
    }
    // positionCaseInsensitive (reference positionCaseInsensitive.cpp):
    // raw-column case-variant Volnitsky scan when the lowered needle is
    // ASCII and in engine range, else the locate-on-lowered composition
    // it is result-identical to.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "position_ci", exprs => {
        val n = constNeedle(exprs, "position_ci").toLowerCase
        if (volnitskyRange(n) && n.isFullAscii)
          VolnitskyPositionCI(exprs.head, Literal(n, StringType))
        else StringLocate(Literal(n, StringType), Lower(exprs.head),
          Literal(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "has_token", exprs => HasToken(exprs.head,
        Literal(tokenNeedle(exprs, "has_token"), StringType), ci = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "has_token_ci", exprs => HasToken(exprs.head,
        Literal(tokenNeedle(exprs, "has_token_ci"), StringType), ci = true),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohashes_in_box", exprs => GeohashesInBoxExpr(exprs.take(4),
        litInt(exprs, 4, "geohashes_in_box precision")), "built-in")
    // Spark ships BloomFilterMightContain for its own runtime join
    // filters but does not SQL-register it; exposed here so bloom-built
    // membership prefilters (decontamination) are plain function calls.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSignature(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngram_hashes", exprs => NgramHashes(exprs(0), exprs(1)), "built-in")
    registered = true
  }

  def siphash64(s0: Column): Column = call_function("siphash64", s0)

  def cityhash64(s0: Column): Column = call_function("cityhash64", s0)

  def halfmd5(s0: Column): Column = call_function("halfmd5", s0)

  def murmurhash2_64(s0: Column): Column = call_function("murmurhash2_64", s0)

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  def fnv1a64(s: Column): Column = call_function("fnv1a64", s)

  def dotArr(a: Column, b: Column): Column = call_function("dot_arr", a, b)

  /** One-pass MinHash signature over pre-hashed shingles. */
  def minhashSig(shingleHashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("minhash_sig", shingleHashes, lit(numHashes))
  }

  /** Distinct xxhash64 values of word n-grams, one native pass. */
  def shingleHashes(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("shingle_hashes", tokens, lit(n))
  }

  /** Distinct xxhash64 values of character n-grams, one native pass. */
  def charNgramHashes(s: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("char_ngram_hashes", s, lit(n))
  }

  /** Hamming distance between two long fingerprints. */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    bit_count(a.bitwiseXOR(b)).cast("int")
  }
}
