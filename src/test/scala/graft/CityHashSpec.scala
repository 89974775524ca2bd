package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CityHash102

/** Bit-compatibility vectors for CityHash64 v1.0.2 (the frozen revision
  * the reference pins for sharding keys — later CityHash releases changed
  * the output). Expected values were produced by compiling the pristine
  * public Google CityHash 1.0.2 library and hashing each input; the
  * integer vector is the reference's own published test output
  * (tests/queries/0_stateless/00751_hashing_ints.reference:
  * cityHash64(123456) = 13379111408315310133, via the engine's
  * use_int_hash_for_pods fast path).
  */
class CityHashSpec extends AnyFunSuite {

  private def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)

  private val vectors: Seq[(String, Long)] = Seq(
    "" -> u("11160318154034397263"),
    "a" -> u("2603192927274642682"),
    "ab" -> u("1725057946192985918"),
    "abc" -> u("4220206313085259313"),
    "abcd" -> u("17823623939509273229"),
    "abcdefgh" -> u("4864636163090995991"),
    "abcdefghi" -> u("7406163328168016081"),
    "0123456789abcdef" -> u("692747204941329175"),
    "0123456789abcdefg" -> u("792568009951096890"),
    "0123456789abcdef0123456789abcdef" -> u("1759797222395115254"),
    "0123456789abcdef0123456789abcdef0" -> u("12304091363112574903"),
    "The quick brown fox jumps over the lazy dog" ->
      u("16697807905646383735"),
    ("0123456789abcdef" * 4) -> u("2761429772394894929"),
    ("0123456789abcdef" * 4 + "X") -> u("10458986674962276263"),
    ("0123456789abcdef" * 8 + "YZ") -> u("6788065509315309437"))

  test("cityHash64 string vectors (every length class: empty, <4, 4-8, " +
    "9-16, 17-32, 33-64, 65+, multi-block)") {
    for ((in, expected) <- vectors)
      assert(CityHash102.cityHash64(in) == expected,
        s"cityHash64(${in.take(20)}... len=${in.length})")
  }

  test("cityHash64 integer fast path matches the reference's published " +
    "vector for cityHash64(123456)") {
    assert(CityHash102.intHash64(123456L) == u("13379111408315310133"))
  }

  test("cityHash64 integer fast path ZERO-extends narrow ints like the " +
    "reference's ext::bit_cast<UInt64> (memcpy into a zeroed UInt64)") {
    val s = TestSpark.spark
    graft.functions.GraftScalar.register(s)
    def hashOf(sqlExpr: String): Long =
      s.sql(s"SELECT cityhash64($sqlExpr)").head().getLong(0)
    // Int32 -1 hashes as 0x00000000FFFFFFFF, NOT as sign-extended -1L
    val int32neg = hashOf("cast(-1 as int)")
    assert(int32neg == hashOf("cast(4294967295 as bigint)"))
    assert(int32neg != hashOf("cast(-1 as bigint)"))
    assert(hashOf("cast(-2 as smallint)") == hashOf("cast(65534 as bigint)"))
    assert(hashOf("cast(-3 as tinyint)") == hashOf("cast(253 as bigint)"))
    // and the interpreted path agrees with what codegen produced
    assert(int32neg == CityHash102.intHash64(0xFFFFFFFFL))
  }

  test("halfMD5 / murmurHash2_64 match the reference's published integer " +
    "vectors (memory-byte hashes of the 4-byte value)") {
    import graft.functions.MoreHashes
    val le4 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(123456).array()
    assert(MoreHashes.halfMD5(le4) == u("1452224150530656417"))
    assert(MoreHashes.murmurHash2x64(le4) == u("9052087431341907723"))
    assert(MoreHashes.murmurHash2x32(le4) == 623211862L)
  }
}
