package graft.operators

/** Header-level media codecs: REAL byte-format parsing (and building,
  * for tests/fixtures) of the three container headers every multimodal
  * pipeline meets first — PNG IHDR, JPEG SOFn, WAV/RIFF fmt+data. The
  * most common multimodal metadata operations (image dimensions, audio
  * sample rate / duration) need only these headers, no codec library:
  * pure byte arithmetic from the public format specs (PNG: RFC 2083 §4;
  * JPEG: ITU-T T.81 §B.2.2; WAV: RIFF/WAVE PCM layout). Pixel/PCM
  * DECODING stays out of scope ([[Multimodal.FakeCodec]] remains the
  * declared stub for that).
  *
  * Parsers return None on malformed input — corrupt corpus bytes must
  * classify as unparseable, never throw mid-scan.
  */
object MediaHeaders {

  final case class ImageMeta(width: Int, height: Int, bitDepth: Int,
                             colorType: Int)
  final case class AudioMeta(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, dataBytes: Long,
                             durationMs: Long)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  // ------------------------------------------------------------------ PNG

  /** PNG with a spec-correct signature + IHDR (length, type, fields,
    * CRC32 over type+data); `body` is appended raw (the pipelines under
    * test read headers, not pixel chunks). */
  def pngBytes(width: Int, height: Int, body: Array[Byte],
               bitDepth: Int = 8, colorType: Int = 2): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], o: Int, v: Long): Unit = {
      a(o) = (v >>> 24).toByte; a(o + 1) = (v >>> 16).toByte
      a(o + 2) = (v >>> 8).toByte; a(o + 3) = v.toByte
    }
    putBe32(ihdr, 0, width.toLong); putBe32(ihdr, 4, height.toLong)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    // compression/filter/interlace = 0
    val typ = "IHDR".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(typ); crc.update(ihdr)
    val out = new java.io.ByteArrayOutputStream
    out.write(PngSig)
    val len = new Array[Byte](4); putBe32(len, 0, 13); out.write(len)
    out.write(typ); out.write(ihdr)
    val crcB = new Array[Byte](4); putBe32(crcB, 0, crc.getValue); out.write(crcB)
    out.write(body)
    out.toByteArray
  }

  /** IHDR fields of a PNG byte stream (signature + first-chunk-is-IHDR
    * per spec; CRC verified — a corrupt header must not parse). */
  def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 33) return None
    if (!PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    if (be32(b, 8) != 13L) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    if ((crc.getValue & 0xffffffffL) != be32(b, 29)) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    Some(ImageMeta(w.toInt, h.toInt, b(24) & 0xff, b(25) & 0xff))
  }

  // ----------------------------------------------------------------- JPEG

  /** Minimal well-formed JPEG skeleton: SOI, SOF0 (1 component), EOI;
    * enough for any dimensions parser, not a decodable image. */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(0x00); out.write(11)   // segment length: 8 + 3*1
    out.write(8)                     // precision
    out.write((height >> 8) & 0xff); out.write(height & 0xff)
    out.write((width >> 8) & 0xff); out.write(width & 0xff)
    out.write(1)                     // 1 component
    out.write(1); out.write(0x11); out.write(0) // comp id, sampling, qtable
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** (width, height) from a JPEG stream: the standard marker walk to the
    * first SOFn frame header (T.81 B.2.2 — height at +3, width at +5
    * inside the segment). Skips every other segment by its length. */
  def parseJpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
      val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      val segLen = be16(b, i + 2)
      if (segLen < 2 || i + 2 + segLen > b.length) return None
      if (isSof) {
        if (segLen < 7) return None
        val h = be16(b, i + 5); val w = be16(b, i + 7)
        return if (w > 0 && h > 0) Some((w, h)) else None
      }
      i += 2 + segLen
    }
    None
  }

  // ------------------------------------------------------------------ WAV

  /** Fully valid PCM WAV: RIFF/WAVE + fmt (PCM) + data chunk around the
    * given sample bytes. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               data: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    val out = new java.io.ByteArrayOutputStream
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); w32(36L + data.length); ascii("WAVE")
    ascii("fmt "); w32(16L); w16(1); w16(channels); w32(sampleRate.toLong)
    w32(byteRate.toLong); w16(blockAlign); w16(bitsPerSample)
    ascii("data"); w32(data.length.toLong)
    out.write(data)
    out.toByteArray
  }

  /** fmt+data metadata of a RIFF/WAVE stream (PCM or not — the fields
    * are format-independent); duration from dataBytes/byteRate. Walks
    * chunks, so extra chunks (LIST, fact) before data are fine. */
  def parseWav(b: Array[Byte]): Option[AudioMeta] = {
    def tag(o: Int, s: String): Boolean =
      o + 4 <= b.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var rate = -1; var ch = -1; var bits = -1; var byteRate = -1L
    var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val len = le32(b, i + 4)
      if (tag(i, "fmt ") && len >= 16 && i + 8 + 16 <= b.length) {
        ch = le16(b, i + 10); rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16); bits = le16(b, i + 22)
      } else if (tag(i, "data")) {
        dataLen = len
      }
      // Advance in Long: le32 yields an unsigned 0..2^32-1 value, and a
      // crafted length near 2^32 truncated to Int would stall (next == i)
      // or step backwards — corrupt bytes must classify, never wedge.
      val next = i.toLong + 8L + len + (len & 1L) // chunks are word-aligned
      if (next <= i || len > b.length) return None
      if (next > b.length) i = b.length else i = next.toInt
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || byteRate <= 0 || dataLen < 0)
      return None
    Some(AudioMeta(rate, ch, bits, dataLen, dataLen * 1000L / byteRate))
  }
}
