package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaHeaders
import graft.operators.MediaHeaders.{AudioMeta, ImageMeta}

/** Byte-level contracts of the header codecs: build→parse round trips,
  * corrupt-input rejection (None, never a throw), and the JPEG marker
  * walk across interleaved segments. */
class MediaHeadersSpec extends AnyFunSuite {

  test("PNG round trip and CRC rejection") {
    val body = Array.tabulate(100)(_.toByte)
    val png = MediaHeaders.pngBytes(640, 480, body, bitDepth = 8, colorType = 6)
    assert(MediaHeaders.parsePng(png).contains(ImageMeta(640, 480, 8, 6)))
    // flip one IHDR byte: the CRC check must reject, not mis-parse
    val corrupt = png.clone(); corrupt(17) = (corrupt(17) ^ 1).toByte
    assert(MediaHeaders.parsePng(corrupt).isEmpty)
    assert(MediaHeaders.parsePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaHeaders.parsePng(body).isEmpty)
  }

  test("JPEG dims parse through preceding segments") {
    val bare = MediaHeaders.jpegBytes(1920, 1080)
    assert(MediaHeaders.parseJpegDims(bare).contains((1920, 1080)))
    // splice an APP0 segment between SOI and SOF0 — the walk must skip it
    val app0 = Array(0xff, 0xe0, 0x00, 0x06, 'J', 'F', 'I', 'F').map(_.toByte)
    val withApp0 = bare.take(2) ++ app0 ++ bare.drop(2)
    assert(MediaHeaders.parseJpegDims(withApp0).contains((1920, 1080)))
    assert(MediaHeaders.parseJpegDims(Array[Byte](0x12, 0x34)).isEmpty)
    // truncated segment length past the end must reject
    val truncated = withApp0.take(6)
    assert(MediaHeaders.parseJpegDims(truncated).isEmpty)
  }

  test("WAV round trip: rate, channels, bits, duration") {
    val data = new Array[Byte](32000) // 1s of 16kHz mono 16-bit
    val wav = MediaHeaders.wavBytes(16000, 1, 16, data)
    val meta = MediaHeaders.parseWav(wav)
    assert(meta.contains(AudioMeta(16000, 1, 16, 32000L, 1000L)))
    // stereo halves the duration for the same byte count
    val stereo = MediaHeaders.parseWav(MediaHeaders.wavBytes(16000, 2, 16, data))
    assert(stereo.exists(_.durationMs == 500L))
    assert(MediaHeaders.parseWav(data).isEmpty)
    assert(MediaHeaders.parseWav("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("WAV chunk walk rejects huge unsigned chunk lengths without hanging") {
    // a chunk length of 0xFFFFFFF8 would make the Int-truncated step 0
    // (infinite loop) and other large values would step backwards — the
    // Long-arithmetic walk must classify these as unparseable
    def chunk(tag: String, lenLE: Long): Array[Byte] =
      tag.getBytes("US-ASCII") ++ Array.tabulate(4)(i => ((lenLE >> (8 * i)) & 0xff).toByte)
    val header = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes
    for (bad <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x80000000L, 0x7FFFFFF0L)) {
      val b = header ++ chunk("LIST", bad) ++ new Array[Byte](64)
      assert(MediaHeaders.parseWav(b).isEmpty, f"len=0x$bad%x must reject")
    }
    // a truncated final chunk (declared length past the end) still rejects
    val trunc = header ++ chunk("fmt ", 16) ++ new Array[Byte](16) ++ chunk("data", 1 << 20)
    assert(MediaHeaders.parseWav(trunc).isEmpty)
  }

  test("media table: header extraction recovers builder parameters per kind") {
    import TestSpark._
    import graft.operators.Multimodal
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val media = Multimodal.mediaWithHeaders(spark, docs)
    val metas = Multimodal.extractHeaderMeta(media).collect()
    assert(metas.length == 30)
    metas.foreach { m =>
      m.kind match {
        case "image" =>
          assert(m.width.contains((100 + m.id % 64).toInt) &&
            m.height.contains((50 + m.id % 32).toInt) && m.sample_rate.isEmpty)
        case "audio" =>
          assert(m.sample_rate.contains(8000 + (m.id % 8).toInt * 1000) &&
            m.channels.contains(1) && m.width.isEmpty)
        case _ =>
          assert(m.width.isEmpty && m.sample_rate.isEmpty && m.duration_ms.isEmpty)
      }
    }
  }
}
