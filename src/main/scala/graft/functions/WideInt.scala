package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Wide-integer semantics shims (reference: `src/Core/Types.h:31-38` —
  * UInt64, Int128/Int256, Decimal256). Spark's widest exact integer is
  * the signed 64-bit LONG and its widest exact numeric DECIMAL(38,0)
  * (~1e38, just short of Int128's ±1.7e38), so the reference's modular
  * unsigned arithmetic is re-expressed as explicit mod-2^64 decimal
  * arithmetic rather than a native type. Parity contract, verified by
  * the q_type_wide_* oracles and documented in SURVEY §1.2:
  *
  *  - UInt64 columns map to DECIMAL(20,0) in [0, 2^64); wraparound sums
  *    and products are exact as long as the un-wrapped intermediate
  *    fits DECIMAL(38,0) (true for any sum of < ~5e18 64-bit terms and
  *    any single product of a 64-bit by a 63-bit value; larger chains
  *    must interleave `uint64Wrap` to stay bounded, which preserves the
  *    mod-2^64 result exactly).
  *  - The reference's overflow-truncating CAST (UInt64→Int32 takes the
  *    low 32 bits) diverges from Spark/ANSI CAST (throws) — callers who
  *    want reference semantics use `int32Wrap`/`int64Reinterpret`
  *    explicitly.
  *  - Int256/Decimal256 (>38 digits) have NO exact Spark mapping; out
  *    of scope, documented divergence.
  */
object WideInt {

  private val Dec38 = DecimalType(38, 0)
  private val TWO64 = lit(new java.math.BigDecimal("18446744073709551616")).cast(Dec38)
  private val TWO63 = lit(new java.math.BigDecimal("9223372036854775808")).cast(Dec38)
  private val TWO32 = lit(new java.math.BigDecimal("4294967296")).cast(Dec38)
  private val TWO31 = lit(new java.math.BigDecimal("2147483648")).cast(Dec38)

  /** Reduce an exact decimal value into UInt64 range [0, 2^64). */
  def uint64Wrap(c: Column): Column =
    pmod(c.cast(Dec38), TWO64).cast(DecimalType(20, 0))

  /** Reinterpret a [0, 2^64) unsigned value as the signed Int64 with the
    * same bit pattern (what the reference shows when you CAST(u AS Int64)). */
  def int64Reinterpret(c: Column): Column = {
    val u = c.cast(Dec38)
    when(u >= TWO63, u - TWO64).otherwise(u).cast("long")
  }

  /** The reference's truncating CAST(x AS Int32): keep the low 32 bits,
    * signed. Spark's own CAST under ANSI throws instead — this shim IS
    * the documented divergence, made explicit at the call site. */
  def int32Wrap(c: Column): Column = {
    val w = pmod(c.cast(Dec38), TWO32)
    when(w >= TWO31, w - TWO32).otherwise(w).cast("int")
  }
}
