package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** shingle_hashes(tokens, n) — distinct 64-bit FNV-1a hashes of the word
  * n-grams of a token array, in first-occurrence order, as one native
  * pass.
  *
  * Fuses what was a four-layer interpreted HOF chain
  * (indexed transform → slice → array_join, then filter, array_distinct,
  * and a second transform for the hash) — per-element interpreted lambda
  * evaluation there cost ~1.4 ms per 50-token document and dominated the
  * dedup benchmarks. Hash values are bit-identical to
  * `fnv1a64(array_join(slice(toks, i+1, n), " "))`
  * ([[SimHash64.fnv1a64]] over UTF-8 bytes — FNV-1a rather than
  * xxhash64 so the exact per-shingle hash is reproducible byte-for-byte
  * in external engines and the DuckDB correctness oracle can mirror the
  * whole MinHash/LSH pipeline, not just its row counts). The distinct
  * hash set equals the distinct shingle-string set (64-bit collisions ~
  * |shingles|²/2^64), so MinHash signatures, LSH buckets, and Jaccard
  * counts are hash-choice-independent.
  *
  * Codegen emits a static call to [[ShingleHashes.compute]] so the
  * shingling projection stays inside WholeStageCodegen.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (array<string>, foldable int), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ShingleHashes.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** char_ngram_hashes(s, n) — distinct xxhash64 (seed 42, Spark's
  * `xxhash64`) values of every n-CHARACTER substring of `s`, in
  * first-occurrence order, as one native pass over the string's bytes.
  *
  * Replaces the four-layer chain the n-gram bloom sidecar build ran per
  * value — `transform(sequence(...), i => substr(i+1, n))` (one
  * UTF8String copy per gram), `array_distinct` over those strings,
  * `explode`, then `xxhash64` — with a zero-copy sliding byte window:
  * character starts are found once (UTF-8 first-byte widths), each
  * window [start(i), start(i+n)) is hashed IN PLACE with the same XXH64
  * kernel `xxhash64(substring)` uses, so every emitted hash is
  * bit-identical to the old pipeline's and the sidecar's membership
  * probes (`TokenBloomIndex.gramHash`) keep matching. Strings shorter
  * than n chars yield an empty array (the old `when(length(c) >= n, …)`
  * guard); nulls stay null. NOTE: the replaced ngrams() pipeline
  * returned an EMPTY ARRAY for a null string — equivalent under explode
  * (the only caller: both produce zero rows) but divergent for any
  * future direct use of the registered char_ngram_hashes function
  * (advisor r16).
  */
case class NgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes requires (string, foldable int), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    NgramHashes.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.NgramHashes.compute($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHashes =
    copy(left = newLeft, right = newRight)
}

object NgramHashes {
  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val totalBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // character start offsets (byte positions); starts(numChars) = end
    val starts = new Array[Int](totalBytes + 1)
    var numChars = 0
    var b = 0
    while (b < totalBytes) {
      starts(numChars) = b
      b += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      numChars += 1
    }
    starts(numChars) = totalBytes
    val count = numChars - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new JHashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var outLen = 0
    var i = 0
    while (i < count) {
      val b0 = starts(i)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + b0, starts(i + n) - b0, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(
      if (outLen == count) out else java.util.Arrays.copyOf(out, outLen))
  }
}

object ShingleHashes {
  private val sep = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val count = m - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new JHashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var outLen = 0
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      // array_join semantics: null tokens are skipped within the join
      var k = 0
      var p = 0
      while (k < n) {
        if (!toks.isNullAt(i + k)) { parts(p) = toks.getUTF8String(i + k); p += 1 }
        k += 1
      }
      val joined =
        if (p == n) UTF8String.concatWs(sep, parts: _*)
        else UTF8String.concatWs(sep, java.util.Arrays.copyOf(parts, p): _*)
      val h = SimHash64.fnv1a64(joined)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(
      if (outLen == count) out else java.util.Arrays.copyOf(out, outLen))
  }
}
