package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** sipHash64(string) — SipHash-2-4 with a zero key, matching the
  * reference's default hash for sharding keys and sampling
  * (daisy `src/Functions/FunctionsHashing.h` sipHash64; public algorithm:
  * Aumasson & Bernstein, "SipHash: a fast short-input PRF", 2012).
  *
  * Needed for placement compatibility: data sharded by sipHash64(key) in
  * the reference lands in the same shard when re-sharded here. A native
  * Catalyst expression (not a UDF) so it's usable in repartition
  * expressions and stays cheap in the scan projection.
  */
case class SipHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"siphash64 requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SipHash.hash24(0L, 0L, input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SipHash.hash24(0L, 0L, $s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
}

/** Reference SipHash-2-4 implementation (64-bit output). */
object SipHash {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  def hash24(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def sipround(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m
      sipround(); sipround()
      v0 ^= m
      i += 8
    }
    // tail block: remaining bytes little-endian + length in the top byte
    var b: Long = n.toLong << 56
    var j = n - 1
    while (j >= end) { b |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= b
    sipround(); sipround()
    v0 ^= b
    v2 ^= 0xff
    sipround(); sipround(); sipround(); sipround()
    v0 ^ v1 ^ v2 ^ v3
  }
}
