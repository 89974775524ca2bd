package graft.operators

/** REAL pixel/PCM decoding for the two container formats whose entire
  * codec path is public byte arithmetic plus zlib — which the JVM ships
  * (`java.util.zip.Inflater`/`Deflater`), so no external codec library
  * is involved:
  *
  *   - PNG grayscale-8 (RFC 2083): signature/IHDR walk, IDAT
  *     concatenation, zlib inflate, and the full five-filter scanline
  *     reconstruction (None/Sub/Up/Average/Paeth — §6.3-6.6).
  *   - WAV PCM16 (RIFF/WAVE): chunk walk to `data`, signed 16-bit
  *     little-endian samples.
  *
  * The matching ENCODERS exist for fixtures: a gate synthesizes
  * spec-correct containers from a closed-form pixel/sample formula,
  * decodes them back through this module, and the DuckDB oracle replays
  * the formula directly — so the decode arithmetic itself is
  * hash-checked end to end, not just spec-asserted. The entropy-coded
  * family (baseline JPEG) lives in [[JpegCodec]], built the same way;
  * formats needing a licensed codec (MP3, H.264) stay out of scope in
  * this container and slot into the same per-partition batch path
  * ([[Multimodal.extractFeatures]]' mapPartitions shape) when a codec
  * is on the executor classpath.
  *
  * Reference behavior mirrored: the reference treats media payloads as
  * opaque String/FixedString columns and leaves decoding to UDF-side
  * consumers (`/root/reference/src/DataTypes/DataTypeString.cpp`); this
  * module is the Spark-side realization of that consumer for the two
  * library-free formats.
  */
object MediaDecode {

  // ------------------------------------------------------------- PNG write

  private def crcChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    out.write(be32(data.length.toLong)); out.write(t); out.write(data)
    out.write(be32(crc.getValue))
  }

  /** Spec-correct grayscale-8 PNG of `pix` (row-major, length w*h,
    * values 0..255). Scanline y is filtered with type y % 5, so a
    * decode of this fixture exercises every reconstruction filter. */
  def pngGray8(width: Int, height: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == width * height, "pix must be w*h")
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (1 + width)) = f.toByte
      var x = 0
      while (x < width) {
        val cur = pix(y * width + x)
        val left = if (x > 0) pix(y * width + x - 1) else 0
        val up = if (y > 0) pix((y - 1) * width + x) else 0
        val ul = if (x > 0 && y > 0) pix((y - 1) * width + x - 1) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + width) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val chunks = new java.io.ByteArrayOutputStream
    crcChunk(chunks, "IDAT", zout.toByteArray)
    crcChunk(chunks, "IEND", Array.emptyByteArray)
    // signature + IHDR come from the header builder; IDAT+IEND follow
    MediaHeaders.pngBytes(width, height, chunks.toByteArray,
      bitDepth = 8, colorType = 0)
  }

  // -------------------------------------------------------------- PNG read

  /** Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Row-major pixels (0..255) of a grayscale-8 PNG. None when the
    * stream is not a decodable gray-8 PNG (wrong color type, corrupt
    * chunk walk, short inflate) — corrupt corpus bytes must classify,
    * never throw mid-scan. */
  def decodePngGray8(b: Array[Byte]): Option[Array[Int]] = {
    val meta = MediaHeaders.parsePng(b).getOrElse(return None)
    if (meta.bitDepth != 8 || meta.colorType != 0) return None
    val w = meta.width; val h = meta.height
    // a CRC-valid header can still declare absurd dims: cap the decoded
    // size (64 M px) and keep the size arithmetic in Long — a crafted
    // 65535×65535 must classify as None, not wrap Int and throw (or
    // force a multi-GB allocation that kills the executor)
    if (w.toLong * h > (1L << 26) || (1L + w) * h.toLong > Int.MaxValue)
      return None
    // walk chunks after IHDR (sig 8 + IHDR chunk 25), concatenating IDAT
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val idat = new java.io.ByteArrayOutputStream
    var i = 33
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(i)
      if (len > b.length || i + 8 + len + 4 > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, i + 8, len.toInt)
      if (typ == "IEND") sawEnd = true
      i += 8 + len.toInt + 4
    }
    if (idat.size() == 0) return None
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    val expect = h * (1 + w)
    val raw = new Array[Byte](expect)
    val got = try {
      var off = 0
      while (off < expect && !inflater.finished()) {
        val n = inflater.inflate(raw, off, expect - off)
        // n == 0 means no progress: truncated stream (needsInput) OR a
        // zlib FDICT preset-dictionary header (needsDictionary) — both
        // classify as undecodable; looping on either would spin forever
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None
        off += n
      }
      off
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got != expect) return None
    // reconstruct scanlines (RFC 2083 §6.3: Recon(x) = Filt(x) + pred)
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + w)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < w) {
        val filt = raw(y * (1 + w) + 1 + x) & 0xff
        val left = if (x > 0) pix(y * w + x - 1) else 0
        val up = if (y > 0) pix((y - 1) * w + x) else 0
        val ul = if (x > 0 && y > 0) pix((y - 1) * w + x - 1) else 0
        val recon = f match {
          case 0 => filt
          case 1 => filt + left
          case 2 => filt + up
          case 3 => filt + (left + up) / 2
          case 4 => filt + paeth(left, up, ul)
        }
        pix(y * w + x) = recon & 0xff
        x += 1
      }
      y += 1
    }
    Some(pix)
  }

  // ------------------------------------------------------------------- WAV

  /** PCM16 WAV around the given samples (signed, little-endian). */
  def wavPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    MediaHeaders.wavBytes(sampleRate, 1, 16, data)
  }

  /** Signed 16-bit LE samples of a PCM16 WAV's data chunk. None when
    * the stream is not RIFF/WAVE PCM16 (or the data chunk is missing /
    * shorter than its declared length). */
  def decodeWavPcm16(b: Array[Byte]): Option[Array[Int]] = {
    val meta = MediaHeaders.parseWav(b).getOrElse(return None)
    if (meta.bitsPerSample != 16) return None
    // second walk to the data chunk's OFFSET (parseWav only keeps its
    // length); same word-aligned advance, same overflow guards
    def tag(o: Int, s: String): Boolean =
      o + 4 <= b.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var i = 12
    while (i + 8 <= b.length) {
      val len = le32(i + 4)
      if (tag(i, "data")) {
        if (i + 8 + len > b.length) return None
        val n = (len / 2).toInt
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          val lo = b(i + 8 + 2 * k) & 0xff
          val hi = b(i + 8 + 2 * k + 1)
          out(k) = (hi << 8) | lo // hi is sign-extended: signed int16
          k += 1
        }
        return Some(out)
      }
      val next = i.toLong + 8L + len + (len & 1L)
      if (next <= i || len > b.length) return None
      if (next > b.length) return None else i = next.toInt
    }
    None
  }
}
