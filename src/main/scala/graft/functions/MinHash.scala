package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** minhash_sig(shingleHashes, numHashes) — MinHash signature over a
  * pre-hashed shingle set (Broder 1997), as a native Catalyst expression.
  *
  * sig[i] = min over h in shingleHashes of xxhash64(i, h), bit-identical
  * to the composable form
  * `transform(sequence(0, n-1), i => array_min(transform(hs, h =>
  * xxhash64(i, h))))` (Spark folds xxhash64(i, h) as
  * XXH64.hashLong(h, XXH64.hashInt(i, 42))) — but computed in ONE pass
  * over the shingle array with n running minimums instead of n interpreted
  * lambda sweeps, each of which allocated an intermediate array.
  *
  * Codegen emits a static call to [[MinHashSignature.compute]] so the
  * signature projection stays inside WholeStageCodegen.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Returns null for an empty input array even when the child is
  // non-nullable — without this override Catalyst would derive
  // nullable=false from the children and skip the null check (advisor r2).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<bigint>, foldable int), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashSignature.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, n) =>
      s"""${ev.value} = graft.functions.MinHashSignature.compute($hs, $n);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {

  /** Per-numHashes seed states XXH64(i, 42), cached across rows. */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, m => Array.tabulate(m)(i => XXH64.hashInt(i, 42L)))

  /** Static kernel shared by eval and generated code.
    *
    * An empty shingle set has no meaningful signature: returns null
    * (intentional divergence from the HOF composition, which yields an
    * array of null elements — callers must pre-filter size(hs) > 0,
    * which both Dedup call sites do). */
  def compute(hs: ArrayData, numHashes: Int): ArrayData = {
    if (hs.numElements() == 0) return null
    val n = numHashes
    val sd = seeds(n)
    val out = Array.fill(n)(Long.MaxValue)
    val m = hs.numElements()
    var j = 0
    while (j < m) {
      // a null element hashes to the seed state alone, matching
      // xxhash64(i, null)'s skip-null fold; callers never produce nulls.
      val isNull = hs.isNullAt(j)
      val h = if (isNull) 0L else hs.getLong(j)
      var i = 0
      while (i < n) {
        val v = if (isNull) sd(i) else XXH64.hashLong(h, sd(i))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
