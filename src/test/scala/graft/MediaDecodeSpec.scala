package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaDecode, MediaHeaders}

/** Real-codec contract: PNG gray-8 and WAV PCM16 decode must be exact
  * inverses of the fixture encoders (which exercise every PNG scanline
  * filter), and corrupt/foreign bytes must classify as None, never
  * throw. */
class MediaDecodeSpec extends AnyFunSuite {

  test("PNG gray-8 roundtrip is exact across all five scanline filters") {
    // height 10 → filter sequence 0,1,2,3,4,0,1,2,3,4
    val w = 13; val h = 10
    val pix = Array.tabulate(w * h)(k => (k * 37 + 11) % 256)
    val bytes = MediaDecode.pngGray8(w, h, pix)
    assert(MediaHeaders.parsePng(bytes).exists(m =>
      m.width == w && m.height == h && m.bitDepth == 8 && m.colorType == 0))
    assert(MediaDecode.decodePngGray8(bytes).exists(_.sameElements(pix)))
  }

  test("PNG decode handles extreme pixel values and 1-pixel edges") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (2, 5))) {
      val pix = Array.tabulate(w * h)(k => if (k % 2 == 0) 0 else 255)
      assert(MediaDecode.decodePngGray8(MediaDecode.pngGray8(w, h, pix))
        .exists(_.sameElements(pix)), s"roundtrip failed at ${w}x$h")
    }
  }

  test("PNG decode rejects non-gray8, truncated, and corrupt streams") {
    val good = MediaDecode.pngGray8(5, 5, Array.fill(25)(100))
    // RGB color type (mediaWithHeaders' header-only fixture)
    assert(MediaDecode.decodePngGray8(
      MediaHeaders.pngBytes(5, 5, Array.emptyByteArray)).isEmpty)
    // truncated IDAT
    assert(MediaDecode.decodePngGray8(good.dropRight(20)).isEmpty)
    // flipped byte inside the deflate stream: inflate error or wrong
    // length, either way None (CRC of IDAT is not what guards here)
    val corrupt = good.clone(); corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    assert(MediaDecode.decodePngGray8(corrupt).isEmpty ||
      !MediaDecode.decodePngGray8(corrupt).exists(_.sameElements(Array.fill(25)(100))))
    // not a PNG at all
    assert(MediaDecode.decodePngGray8("not a png".getBytes).isEmpty)
  }

  test("WAV PCM16 roundtrip preserves signed samples exactly") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256)
    val bytes = MediaDecode.wavPcm16(8000, samples)
    assert(MediaDecode.decodeWavPcm16(bytes).exists(_.sameElements(samples)))
    assert(MediaHeaders.parseWav(bytes).exists(m =>
      m.sampleRate == 8000 && m.bitsPerSample == 16 &&
        m.dataBytes == samples.length * 2L))
  }

  test("WAV decode rejects non-16-bit, short-data, and foreign streams") {
    // 8-bit container: bitsPerSample gate
    assert(MediaDecode.decodeWavPcm16(
      MediaHeaders.wavBytes(8000, 1, 8, Array[Byte](1, 2, 3, 4))).isEmpty)
    // data chunk declares more bytes than present
    val short = MediaDecode.wavPcm16(8000, Array(1, 2, 3)).dropRight(2)
    assert(MediaDecode.decodeWavPcm16(short).isEmpty)
    assert(MediaDecode.decodeWavPcm16("RIFFxxxx".getBytes).isEmpty)
  }
}
