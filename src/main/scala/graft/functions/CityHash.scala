package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType, ByteType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** cityHash64 — bit-compatible with the reference's default sharding /
  * table-placement hash (daisy `src/Functions/FunctionsHashing.h`
  * ImplCityHash64). Two public algorithms:
  *
  *  - strings hash their bytes with CityHash64 v1.0.2 (Pike & Alakuijala,
  *    Google, 2011, MIT) — the FROZEN 1.0.2 revision: later CityHash
  *    releases changed the output, so matching the reference requires
  *    this exact version (`FunctionsHashing.h:438` pins
  *    `CityHash_v1_0_2::CityHash64`);
  *  - integers take the engine's POD fast path (`use_int_hash_for_pods`,
  *    `FunctionsHashing.h:750-764`): `intHash64(x ^ 0x4CF2D2BAAE6DA887)`
  *    where intHash64 is the 64-bit murmur-style finalizer
  *    (`src/Common/HashTable/Hash.h`).
  *
  * Data sharded by cityHash64(key) in the reference lands on the same
  * shard when re-sharded here. Codegen'd via a static call — no boxing in
  * the scan projection, usable inside repartition expressions.
  * Verified against vectors produced by the pristine public library
  * (CityHashSpec).
  */
case class CityHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cityhash64 requires string or integral, got $t")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      java.lang.Long.valueOf(
        CityHash102.cityHash64(input.asInstanceOf[UTF8String].getBytes))
    case _ =>
      // The reference zero-extends narrow ints (`ext::bit_cast<UInt64>`
      // memcpys the source bytes into a zero-initialized UInt64 —
      // `base/ext/bit_cast.h`), so mask by source width instead of
      // sign-extending: Int32 -1 must hash as 0xFFFFFFFF, not -1L.
      val x = input match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue() & 0xFFFFFFFFL
        case s: java.lang.Short   => s.longValue() & 0xFFFFL
        case b: java.lang.Byte    => b.longValue() & 0xFFL
      }
      java.lang.Long.valueOf(CityHash102.intHash64(x))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.CityHash102.cityHash64($s.getBytes());")
      case _ =>
        // Zero-extend like the reference's bit_cast (see nullSafeEval).
        val mask = child.dataType match {
          case IntegerType => " & 0xFFFFFFFFL"
          case ShortType   => " & 0xFFFFL"
          case ByteType    => " & 0xFFL"
          case _           => ""
        }
        nullSafeCodeGen(ctx, ev, s =>
          s"${ev.value} = graft.functions.CityHash102.intHash64(((long) $s)$mask);")
    }

  override protected def withNewChildInternal(newChild: Expression): CityHash64Expr =
    copy(child = newChild)
}

/** CityHash64 v1.0.2 (little-endian) + the engine's integer fast hash. */
object CityHash102 {

  private final val KMul = 0x9ddfea08eb382d69L
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL
  private final val K3 = 0xc949d7c7509e6557L

  /** The reference's `IntHash64Impl::apply` (64-bit finalizer over a
    * fixed salt) — the integer fast path of its cityHash64. */
  def intHash64(v: Long): Long = {
    var x = v ^ 0x4CF2D2BAAE6DA887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  @inline private def fetch64(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) | (s(i + 1) & 0xffL) << 8 | (s(i + 2) & 0xffL) << 16 |
      (s(i + 3) & 0xffL) << 24 | (s(i + 4) & 0xffL) << 32 |
      (s(i + 5) & 0xffL) << 40 | (s(i + 6) & 0xffL) << 48 |
      (s(i + 7) & 0xffL) << 56

  @inline private def fetch32(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) | (s(i + 1) & 0xffL) << 8 | (s(i + 2) & 0xffL) << 16 |
      (s(i + 3) & 0xffL) << 24

  @inline private def rot(x: Long, n: Int): Long =
    if (n == 0) x else java.lang.Long.rotateRight(x, n)

  @inline private def shiftMix(x: Long): Long = x ^ (x >>> 47)

  @inline private def hash128to64(u: Long, v: Long): Long = {
    var a = (u ^ v) * KMul
    a ^= a >>> 47
    var b = (v ^ a) * KMul
    b ^= b >>> 47
    b * KMul
  }

  private def hashLen0to16(s: Array[Byte]): Long = {
    val len = s.length
    if (len > 8) {
      val a = fetch64(s, 0)
      val b = fetch64(s, len - 8)
      // RotateByAtLeast1: len in 9..16 so the shift is never 0
      hash128to64(a, java.lang.Long.rotateRight(b + len, len & 63)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, 0)
      hash128to64(len + (a << 3), fetch32(s, len - 4))
    } else if (len > 0) {
      val a = s(0) & 0xff
      val b = s(len >> 1) & 0xff
      val c = s(len - 1) & 0xff
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte]): Long = {
    val len = s.length
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * K2
    val d = fetch64(s, len - 16) * K0
    hash128to64(rot(a - b, 43) + rot(c, 30) + d,
      a + rot(b ^ K3, 20) - c + len)
  }

  // Returns the 16-byte weak hash as two longs packed into an array slot
  // via out params emulated with a tuple-free encoding: (first, second).
  @inline private def weakFirst(w: Long, x: Long, y: Long, z: Long,
                                a0: Long, b0: Long): Long = {
    val a1 = a0 + w
    a1 + x + y + z
  }

  @inline private def weakSecond(w: Long, x: Long, y: Long, z: Long,
                                 a0: Long, b0: Long): Long = {
    val a1 = a0 + w
    val b1 = rot(b0 + a1 + z, 21)
    val c = a1
    val a2 = a1 + x + y
    b1 + rot(a2, 44) + c
  }

  private def hashLen33to64(s: Array[Byte]): Long = {
    val len = s.length
    var z = fetch64(s, 24)
    var a = fetch64(s, 0) + (len + fetch64(s, len - 16)) * K0
    var b = rot(a + z, 52)
    var c = rot(a, 37)
    a += fetch64(s, 8)
    c += rot(a, 7)
    a += fetch64(s, 16)
    val vf = a + z
    val vs = b + rot(a, 31) + c
    a = fetch64(s, 16) + fetch64(s, len - 32)
    z = fetch64(s, len - 8)
    b = rot(a + z, 52)
    c = rot(a, 37)
    a += fetch64(s, len - 24)
    c += rot(a, 7)
    a += fetch64(s, len - 16)
    val wf = a + z
    val ws = b + rot(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  def cityHash64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 32) {
      if (len <= 16) hashLen0to16(s) else hashLen17to32(s)
    } else if (len <= 64) {
      hashLen33to64(s)
    } else {
      var x = fetch64(s, 0)
      var y = fetch64(s, len - 16) ^ K1
      var z = fetch64(s, len - 56) ^ K0
      var vFirst = weakFirst(fetch64(s, len - 64), fetch64(s, len - 56),
        fetch64(s, len - 48), fetch64(s, len - 40), len.toLong, y)
      var vSecond = weakSecond(fetch64(s, len - 64), fetch64(s, len - 56),
        fetch64(s, len - 48), fetch64(s, len - 40), len.toLong, y)
      var wFirst = weakFirst(fetch64(s, len - 32), fetch64(s, len - 24),
        fetch64(s, len - 16), fetch64(s, len - 8), len * K1, K0)
      var wSecond = weakSecond(fetch64(s, len - 32), fetch64(s, len - 24),
        fetch64(s, len - 16), fetch64(s, len - 8), len * K1, K0)
      z += shiftMix(vSecond) * K1
      x = rot(z + x, 39) * K1
      y = rot(y, 33) * K1
      var remaining = (len - 1) & ~63
      var i = 0
      while (remaining != 0) {
        x = rot(x + y + vFirst + fetch64(s, i + 16), 37) * K1
        y = rot(y + vSecond + fetch64(s, i + 48), 42) * K1
        x ^= wSecond
        y ^= vFirst
        z = rot(z ^ wFirst, 33)
        val nvF = weakFirst(fetch64(s, i), fetch64(s, i + 8),
          fetch64(s, i + 16), fetch64(s, i + 24), vSecond * K1, x + wFirst)
        val nvS = weakSecond(fetch64(s, i), fetch64(s, i + 8),
          fetch64(s, i + 16), fetch64(s, i + 24), vSecond * K1, x + wFirst)
        val nwF = weakFirst(fetch64(s, i + 32), fetch64(s, i + 40),
          fetch64(s, i + 48), fetch64(s, i + 56), z + wSecond, y)
        val nwS = weakSecond(fetch64(s, i + 32), fetch64(s, i + 40),
          fetch64(s, i + 48), fetch64(s, i + 56), z + wSecond, y)
        vFirst = nvF; vSecond = nvS; wFirst = nwF; wSecond = nwS
        val t = z; z = x; x = t
        i += 64
        remaining -= 64
      }
      hash128to64(hash128to64(vFirst, wFirst) + shiftMix(y) * K1 + z,
        hash128to64(vSecond, wSecond) + x)
    }
  }

  def cityHash64(s: String): Long =
    cityHash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
