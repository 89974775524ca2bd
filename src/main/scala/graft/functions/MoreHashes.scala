package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remaining bit-compatible hash family members (daisy
  * `src/Functions/FunctionsHashing.h`): halfMD5 and murmurHash2_64.
  * Like [[SipHash64Expr]]/[[CityHash64Expr]] these hash the value's
  * memory bytes — UTF-8 for strings, little-endian fixed width for
  * integers (both functions have `use_int_hash_for_pods = false`, so
  * unlike cityHash64 the integer path is the plain byte hash).
  * Verified against the reference's published vectors
  * (tests/queries/0_stateless/00751_hashing_ints.reference).
  */
abstract class BytesHashExpr extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName: unsupported $t")
  }

  protected def hash(bytes: Array[Byte]): Long

  private def toBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String => s.getBytes
    case i: java.lang.Integer =>
      val b = new Array[Byte](4)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(i.intValue()); b
    case l: java.lang.Long =>
      val b = new Array[Byte](8)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(l.longValue()); b
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(hash(toBytes(input)))

  /** Static method on [[MoreHashes]] the generated code calls. */
  protected def hashMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = child.dataType match {
      case StringType  => (s: String) => s"$s.getBytes()"
      case IntegerType => (s: String) => s"graft.functions.MoreHashes.leBytes4($s)"
      case LongType    => (s: String) => s"graft.functions.MoreHashes.leBytes8($s)"
    }
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MoreHashes.$hashMethod(${bytes(s)});")
  }
}

case class HalfMD5Expr(child: Expression) extends BytesHashExpr {
  protected def hash(bytes: Array[Byte]): Long = MoreHashes.halfMD5(bytes)
  protected def hashMethod: String = "halfMD5"
  override protected def withNewChildInternal(newChild: Expression): HalfMD5Expr =
    copy(child = newChild)
}

case class MurmurHash2x64Expr(child: Expression) extends BytesHashExpr {
  protected def hash(bytes: Array[Byte]): Long = MoreHashes.murmurHash2x64(bytes)
  protected def hashMethod: String = "murmurHash2x64"
  override protected def withNewChildInternal(newChild: Expression): MurmurHash2x64Expr =
    copy(child = newChild)
}

/** murmurHash2_32 (reference `MurmurHash2Impl32`, NGINX split-clients
  * compatible). UInt32 result carried as a non-negative long. */
case class MurmurHash2x32Expr(child: Expression) extends BytesHashExpr {
  protected def hash(bytes: Array[Byte]): Long = MoreHashes.murmurHash2x32(bytes)
  protected def hashMethod: String = "murmurHash2x32"
  override protected def withNewChildInternal(newChild: Expression): MurmurHash2x32Expr =
    copy(child = newChild)
}

object MoreHashes {

  def leBytes4(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v)
    b
  }

  def leBytes8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v)
    b
  }

  /** First 8 bytes of the MD5 digest, big-endian (the reference's
    * HalfMD5Impl byte-flip of the little-endian load). */
  def halfMD5(data: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(data)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** MurmurHash2 32-bit, seed 0 (Appleby's public MurmurHash2) —
    * returned zero-extended to long (the reference's UInt32). */
  def murmurHash2x32(data: Array[Byte]): Long = {
    val m = 0x5bd1e995
    val r = 24
    val n = data.length
    var h = 0 ^ n
    val blocks = n >>> 2
    var i = 0
    while (i < blocks) {
      val o = i << 2
      var k = (data(o) & 0xff) | (data(o + 1) & 0xff) << 8 |
        (data(o + 2) & 0xff) << 16 | (data(o + 3) & 0xff) << 24
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tailStart = blocks << 2
    (n & 3) match {
      case 3 =>
        h ^= (data(tailStart + 2) & 0xff) << 16
        h ^= (data(tailStart + 1) & 0xff) << 8
        h ^= data(tailStart) & 0xff
        h *= m
      case 2 =>
        h ^= (data(tailStart + 1) & 0xff) << 8
        h ^= data(tailStart) & 0xff
        h *= m
      case 1 =>
        h ^= data(tailStart) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h & 0xFFFFFFFFL
  }

  /** MurmurHash64A, seed 0 (Appleby's public MurmurHash2, 64-bit). */
  def murmurHash2x64(data: Array[Byte]): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    val n = data.length
    var h = 0L ^ (n * m)
    val blocks = n >>> 3
    var i = 0
    while (i < blocks) {
      val o = i << 3
      var k = (data(o) & 0xffL) | (data(o + 1) & 0xffL) << 8 |
        (data(o + 2) & 0xffL) << 16 | (data(o + 3) & 0xffL) << 24 |
        (data(o + 4) & 0xffL) << 32 | (data(o + 5) & 0xffL) << 40 |
        (data(o + 6) & 0xffL) << 48 | (data(o + 7) & 0xffL) << 56
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 1
    }
    val tailStart = blocks << 3
    val tailLen = n & 7
    if (tailLen > 0) {
      var t = 0L
      var j = tailLen - 1
      while (j >= 0) { t = (t << 8) | (data(tailStart + j) & 0xffL); j -= 1 }
      h ^= t; h *= m
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }
}
