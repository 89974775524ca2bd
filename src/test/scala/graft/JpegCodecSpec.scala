package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegCodec

/** Baseline grayscale JPEG: the decode must invert the fixture encoder
  * exactly for the closed-form coefficient family (DC + zigzag-10 AC
  * under a uniform quant table of 8 → pixel = dc + s(y)·ac + 128), and
  * it must exercise the REAL coding paths: DC differential prediction
  * across blocks, AC run-length with ZRL, byte unstuffing, and the
  * marker walk. Anything outside the baseline envelope classifies as
  * None — corrupt corpus bytes must never throw mid-scan. */
class JpegCodecSpec extends AnyFunSuite {

  private def s(y: Int): Int = if (Set(0, 3, 4, 7)(y % 8)) 1 else -1

  private def fixtureBlocks(id: Long, bw: Int, bh: Int): Array[Array[Int]] =
    Array.tabulate(bw * bh) { bi =>
      val bx = bi % bw; val by = bi / bw
      val zz = new Array[Int](64)
      zz(0) = (((id % 97) * 7 + bx * 31 + by * 53) % 201 - 100).toInt
      zz(10) = (((id % 89) * 5 + bx * 17 + by * 29) % 41 - 20).toInt
      zz
    }

  test("closed-form fixture decodes exactly across ids (crop + multi-block)") {
    for (id <- 0L until 40L) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val bytes = JpegCodec.encodeGrayFromCoeffs(w, h, JpegCodec.QUniform8,
        fixtureBlocks(id, bw, bh))
      val pix = JpegCodec.decodeGray(bytes)
        .getOrElse(fail(s"id=$id did not decode"))
      assert(pix.length == w * h)
      for (k <- pix.indices) {
        val x = k % w; val y = k / w
        val bx = x / 8; val by = y / 8
        val dc = ((id % 97) * 7 + bx * 31 + by * 53) % 201 - 100
        val ac = ((id % 89) * 5 + bx * 17 + by * 29) % 41 - 20
        val expect = dc + s(y) * ac + 128
        assert(pix(k) == expect,
          s"id=$id ($x,$y): got ${pix(k)}, want $expect")
      }
    }
  }

  test("general coefficients roundtrip bit-exactly (ZRL, long runs, clamp)") {
    // every value here is a multiple the uniform-8 table divides out of
    // the IDCT exactly ONLY for the closed-form positions, so use a
    // quant table of 16 on position 0 alone: DC-only blocks decode to
    // the flat value 2*dc + 128 (16/8 = 2), clamped
    val q = Array.fill(64)(1); q(0) = 16
    val blocks = Array(
      { val z = new Array[Int](64); z(0) = 30; z },      // flat 188
      { val z = new Array[Int](64); z(0) = -80; z },     // clamps to 0
      { val z = new Array[Int](64); z(0) = 0; z(63) = 5; z }) // ZRL x3 path
    val bytes = JpegCodec.encodeGrayFromCoeffs(24, 8, q, blocks)
    val pix = JpegCodec.decodeGray(bytes).getOrElse(fail("no decode"))
    assert(pix.length == 24 * 8)
    // block 0 flat: 30*16/8 + 128 = 188
    assert(pix(0) == 188 && pix(7) == 188 && pix(7 * 24 + 7) == 188)
    // block 1: -80*16/8 + 128 = -32 -> clamps to 0
    assert(pix(8) == 0 && pix(7 * 24 + 15) == 0)
    // block 2 decodes (exact values come from the real IDCT; just
    // assert the DC-relative mean: coefficient 63 integrates to ~0)
    val b2 = for (y <- 0 until 8; x <- 16 until 24) yield pix(y * 24 + x)
    assert(math.abs(b2.sum / 64.0 - 128.0) < 1.0)
  }

  test("byte stuffing survives: a block pattern forcing 0xFF data bytes") {
    // high DC diffs produce long 1-runs in the entropy stream; a
    // leading block with varying DC shifts the bit phase so some
    // encodings land an all-ones byte -> stuffed 0xFF
    var sawStuffed = false
    for (e <- 0 to 15; d <- 96 to 160) {
      val z0 = new Array[Int](64); z0(0) = e
      val z1 = new Array[Int](64); z1(0) = d
      val z2 = new Array[Int](64); z2(0) = -d
      val bytes = JpegCodec.encodeGrayFromCoeffs(24, 8, JpegCodec.QUniform8,
        Array(z0, z1, z2))
      // scan for FF 00 after SOS (entropy data only)
      var sos = 2
      while (!((bytes(sos) & 0xff) == 0xff && (bytes(sos + 1) & 0xff) == 0xda))
        sos += 1
      var i = sos
      while (i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
          sawStuffed = true
        i += 1
      }
      val pix = JpegCodec.decodeGray(bytes).getOrElse(fail(s"e=$e d=$d no decode"))
      assert(pix(0) == math.min(255, e + 128), s"e=$e")
      assert(pix(8) == math.min(255, d + 128), s"d=$d")
      assert(pix(16) == math.max(0, -d + 128), s"d=-$d")
    }
    assert(sawStuffed, "sweep never produced a stuffed 0xFF byte")
  }

  test("outside-envelope and corrupt inputs classify as None, never throw") {
    val id = 7L
    val good = JpegCodec.encodeGrayFromCoeffs(10, 9, JpegCodec.QUniform8,
      fixtureBlocks(id, 2, 2))
    assert(JpegCodec.decodeGray(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decodeGray(Array[Byte](0x42, 0x4d, 0, 0)).isEmpty)
    // progressive marker (SOF2 instead of SOF0)
    val prog = good.clone()
    val sofAt = { var i = 2; while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1; i }
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decodeGray(prog).isEmpty, "SOF2 must be rejected")
    // truncations at every prefix must classify, not throw
    for (n <- 0 until good.length)
      JpegCodec.decodeGray(java.util.Arrays.copyOf(good, n))
    // random byte flips must never throw (decode may still succeed)
    for (seed <- 0 until 200) {
      val bad = good.clone()
      val pos = (seed * 131) % bad.length
      bad(pos) = (bad(pos) ^ (1 << (seed % 8))).toByte
      JpegCodec.decodeGray(bad)
    }
    // absurd declared dims must classify (size cap), not allocate
    val big = good.clone()
    big(sofAt + 5) = 0xff.toByte; big(sofAt + 6) = 0xff.toByte // h = 65535
    big(sofAt + 7) = 0xff.toByte; big(sofAt + 8) = 0xff.toByte // w = 65535
    assert(JpegCodec.decodeGray(big).isEmpty)
    // component quant-table selector Tq != 0: only table 0 is parsed, so
    // selecting table 1 must classify as None (decoding with table 0
    // would be silently wrong pixels). SOF0 body: marker(2)+len(2), then
    // prec, h16, w16, ncomp, compId, HV, Tq -> Tq at body offset 8.
    val tq1 = good.clone()
    assert((tq1(sofAt + 12) & 0xff) == 0, "fixture component Tq should be 0")
    tq1(sofAt + 12) = 1
    assert(JpegCodec.decodeGray(tq1).isEmpty, "Tq=1 frame must be rejected")
  }

  test("decoder accepts APPn/COM segments in the walk (real-file shape)") {
    val id = 3L
    val core = JpegCodec.encodeGrayFromCoeffs(9, 8, JpegCodec.QUniform8,
      fixtureBlocks(id, 2, 1))
    // splice an APP0 JFIF-ish segment right after SOI
    val app = Array[Int](0xff, 0xe0, 0x00, 0x07, 0x4a, 0x46, 0x49, 0x46, 0x00)
      .map(_.toByte)
    val spliced = core.take(2) ++ app ++ core.drop(2)
    val pix = JpegCodec.decodeGray(spliced).getOrElse(fail("APP0 broke walk"))
    assert(pix.length == 9 * 8)
  }
}
