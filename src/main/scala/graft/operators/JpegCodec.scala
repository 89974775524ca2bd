package graft.operators

/** Baseline-sequential JPEG (ITU-T T.81), grayscale: the entropy-coded
  * decode path that round 10 declared out of scope, implemented
  * library-free — canonical Huffman table build (Annex C), the F.2
  * entropy decoder (DC prediction + AC run/size with EOB/ZRL, byte
  * unstuffing), dequantization, inverse zigzag, and a double-precision
  * separable IDCT (A.3.3) with level shift and MCU-edge cropping.
  *
  * The matching ENCODER exists for fixtures (same Huffman build, F.1
  * bit/byte stuffing): it takes QUANTIZED coefficient blocks directly,
  * so a fixture can pick coefficients whose IDCT is closed-form exact —
  * DC plus the (v=4,u=0) coefficient under a uniform quant table of 8
  * decodes to `dc + s(y)*ac + 128` with s(y) = ±1 (cosine values are
  * exactly ±1/√2, so the /8 cancels the quant step with no rounding).
  * The DuckDB oracle replays that formula; the Huffman/DC-pred/run-
  * length/IDCT arithmetic is therefore hash-checked end to end, like
  * round 10's PNG path. Progressive (SOF2), arithmetic coding, restart
  * markers and multi-component scans classify as undecodable (None) —
  * never throw mid-scan on corrupt corpus bytes.
  *
  * Reference behavior mirrored: the reference stores media payloads as
  * opaque String columns and leaves decoding to consumers
  * (`/root/reference/src/DataTypes/DataTypeString.cpp`); this is the
  * Spark-side consumer for the third (entropy-coded) format family.
  */
object JpegCodec {

  /** Zigzag index -> natural (row*8+col) position (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table (lengths histogram + symbols). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  /** Annex K.3.2 luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Uniform quant table of 8 (zigzag order) — the fixture's exactness
    * hinge: dequant multiplies by 8, the IDCT's DC/(0,4) basis divides
    * by 8, so chosen coefficients survive decode bit-exactly. */
  val QUniform8: Array[Int] = Array.fill(64)(8)

  // ------------------------------------------------- canonical code build

  /** Annex C: (code, length) per symbol from the BITS/HUFFVAL lists. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(k) -> (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** F.2.2.3 decode tables: mincode/maxcode/valptr per code length. */
  private final class DecTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  // --------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing (F.1.2.3)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def magnitude(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  /** Baseline grayscale JPEG from QUANTIZED zigzag coefficient blocks
    * (MCU row-major, ceil(h/8)*ceil(w/8) blocks of 64). DC values are
    * differentially coded here, exactly as a pixel encoder would after
    * its forward DCT — the fixture merely chooses the coefficients. */
  def encodeGrayFromCoeffs(width: Int, height: Int, qZigzag: Array[Int],
                           blocks: Array[Array[Int]]): Array[Byte] = {
    require(qZigzag.length == 64, "quant table must have 64 entries")
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    require(blocks.length == bw * bh, s"need ${bw * bh} blocks")
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, 0x00 +: qZigzag) // DQT, Pq=0/Tq=0
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component, no subsampling
    seg(0xc4, 0x00 +: (DcBits ++ DcVals)) // DHT DC class 0, id 0
    seg(0xc4, 0x10 +: (AcBits ++ AcVals)) // DHT AC class 1, id 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bw2 = new BitWriter(out)
    var pred = 0
    blocks.foreach { zz =>
      require(zz.length == 64, "each block must have 64 coefficients")
      // DC: size category + magnitude bits (negative = v-1 low bits)
      val diff = zz(0) - pred
      pred = zz(0)
      val s = magnitude(diff)
      val (c, l) = dcCodes(s)
      bw2.put(c, l)
      if (s > 0) bw2.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      // AC: run/size with ZRL and EOB
      var k = 1
      var run = 0
      while (k < 64) {
        val v = zz(k)
        if (v == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acCodes(0xf0); bw2.put(zc, zl); run -= 16 }
          val sz = magnitude(v)
          val (ac, al) = acCodes((run << 4) | sz)
          bw2.put(ac, al)
          bw2.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acCodes(0x00); bw2.put(ec, el) } // EOB
    }
    bw2.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // --------------------------------------------------------------- decoder

  /** IDCT basis: ct(x)(u) = C(u) * cos((2x+1) u pi / 16). */
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    /** Next bit, or -1 at end of entropy data (marker/EOF). */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { hitMarker = true; return -1 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val n = b(pos) & 0xff
          if (n == 0x00) pos += 1 // stuffed 0xff data byte
          else { hitMarker = true; return -1 } // a real marker ends the scan
          v = 0xff
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return -1
        v = (v << 1) | x; i += 1
      }
      v
    }
  }

  private def decodeSym(br: BitReader, t: DecTable): Int = {
    var code = br.bit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
      val x = br.bit(); if (x < 0) return -1
      code = (code << 1) | x
      l += 1
    }
    if (l > 16) return -1
    t.huffVal(t.valPtr(l) + code - t.minCode(l))
  }

  /** EXTEND (F.2.2.1): low-`s`-bit value -> signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Row-major pixels (0..255) of a baseline grayscale JPEG; None for
    * anything outside that envelope (progressive, multi-component,
    * restart-interval scans, corrupt tables/bitstream, absurd dims). */
  def decodeGray(b: Array[Byte]): Option[Array[Int]] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    var quant: Array[Int] = null            // zigzag order, table id 0
    var dcTab: DecTable = null
    var acTab: DecTable = null
    var w = 0; var h = 0
    var sosAt = -1
    var dcSel = 0; var acSel = 0
    var restart = 0
    // marker walk to SOS
    while (sosAt < 0) {
      if (pos + 4 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val m = b(pos + 1) & 0xff
      if (m == 0xd9) return None // EOI before any scan
      val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > b.length) return None
      val body = pos + 4
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT: one or more tables
          var o = body
          while (o < body + bodyLen) {
            val pq = (b(o) & 0xf0) >> 4; val tq = b(o) & 0x0f
            if (pq != 0) return None // 16-bit tables: not baseline-8
            if (o + 1 + 64 > body + bodyLen) return None
            val t = Array.tabulate(64)(i => b(o + 1 + i) & 0xff)
            if (tq == 0) quant = t
            o += 65
          }
        case 0xc4 => // DHT: one or more tables
          var o = body
          while (o < body + bodyLen) {
            if (o + 17 > body + bodyLen) return None
            val tc = (b(o) & 0xf0) >> 4; val th = b(o) & 0x0f
            val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
            val n = bits.sum
            if (n == 0 || n > 256 || o + 17 + n > body + bodyLen) return None
            val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
            val t = new DecTable(bits, vals)
            if (th == 0) { if (tc == 0) dcTab = t else acTab = t }
            o += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (bodyLen < 9) return None // 6 frame bytes + 3 per component
          if ((b(body) & 0xff) != 8) return None
          h = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
          w = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
          val ncomp = b(body + 5) & 0xff
          if (ncomp != 1) return None // grayscale only
          if ((b(body + 7) & 0xff) != 0x11) return None // no subsampling
          // component quant-table selector: only table 0 is parsed, so a
          // frame selecting table 1 must classify as None, not silently
          // dequantize with table 0 (same rule as the DC/AC selectors)
          if ((b(body + 8) & 0xff) != 0) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/progressive/lossless/arithmetic
        case 0xdd => // DRI
          if (bodyLen < 2) return None
          restart = ((b(body) & 0xff) << 8) | (b(body + 1) & 0xff)
        case 0xda => // SOS
          if (bodyLen < 4) return None
          if ((b(body) & 0xff) != 1) return None
          dcSel = (b(body + 2) & 0xf0) >> 4
          acSel = b(body + 2) & 0x0f
          sosAt = pos + 2 + len
        case _ => () // APPn / COM / others: skip
      }
      pos += 2 + len
    }
    if (quant == null || dcTab == null || acTab == null) return None
    if (dcSel != 0 || acSel != 0) return None // only table id 0 parsed
    if (restart != 0) return None // restart-marker scans: out of envelope
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val pix = new Array[Int](w * h)
    val br = new BitReader(b, sosAt)
    val coef = new Array[Int](64) // natural order, dequantized
    val tmp = new Array[Double](64)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        // DC
        val s = decodeSym(br, dcTab)
        if (s < 0 || s > 11) return None
        val dv = if (s == 0) 0 else {
          val raw = br.bits(s); if (raw < 0) return None
          extend(raw, s)
        }
        pred += dv
        coef(0) = pred * quant(0)
        // AC
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = decodeSym(br, acTab)
          if (rs < 0) return None
          val r = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += r
            if (k > 63) return None
            val raw = br.bits(sz); if (raw < 0) return None
            coef(Zigzag(k)) = extend(raw, sz) * quant(k)
            k += 1
          }
        }
        // separable IDCT: tmp(v,x) = sum_u F(v,u) ct(x,u)
        var v = 0
        while (v < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var u = 0
            while (u < 8) { acc += coef(v * 8 + u) * Ct(x)(u); u += 1 }
            tmp(v * 8 + x) = acc
            x += 1
          }
          v += 1
        }
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var vv = 0
            while (vv < 8) { acc += tmp(vv * 8 + x) * Ct(y)(vv); vv += 1 }
            val p = math.rint(acc / 4.0).toInt + 128
            val py = by * 8 + y; val px = bx * 8 + x
            if (py < h && px < w) // crop MCU padding
              pix(py * w + px) = math.max(0, math.min(255, p))
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    Some(pix)
  } catch {
    case ie: InterruptedException => throw ie
    case scala.util.control.NonFatal(_) => None
  }
}
