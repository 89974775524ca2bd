package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions (Scala Dataset equivalent of the mapInPandas batch-UDF
  * pattern: one iterator of rows per partition, decode amortized across
  * the batch).
  *
  * Decode is REAL for three format families: grayscale-8 PNG (zlib +
  * all five scanline filters) and PCM16 WAV via [[MediaDecode]], and
  * baseline-sequential grayscale JPEG — the entropy-coded path:
  * canonical Huffman build, DC prediction, AC run-length, IDCT — via
  * [[JpegCodec]]; see [[decodeUnits]], oracled end to end by
  * q_media_decode and q_multimodal_decode. Formats whose codecs are
  * not reimplementable library-free here (MP3, H.264) remain stubbed:
  * `FakeCodec.decode` derives deterministic pseudo-features from the
  * bytes, and everything around it — schema, partitioning, batch
  * iteration, feature/frames output shape — is the same path the real
  * decoders run, so swapping a codec in is a one-function change.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the fixed multimodal
    * schema (media kind, nominal dims). */
  case class MediaRow(id: Long, kind: String, width: Int, height: Int,
                      payload: Array[Byte])

  /** Extracted per-item features. */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                           mean_byte: Double, byte_entropy: Double,
                           n_frames: Int)

  /** One sampled "frame" (stub: fixed-size byte slices stand in for
    * decoded frames). */
  case class Frame(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  val FrameSize = 256

  /** STUB decode — deterministic pseudo-decoder standing in for a real
    * entropy-coded image/audio codec (the declared library-free stand-in
    * boundary). Byte histogram statistics play the role of decoded
    * features. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Double, Double) = {
      if (payload.isEmpty) return (0.0, 0.0)
      val hist = new Array[Long](256)
      var sum = 0L
      payload.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
      val n = payload.length.toDouble
      var entropy = 0.0
      hist.foreach { c =>
        if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2) }
      }
      (sum / n, entropy)
    }
  }

  /** Batch feature extraction over partitions — the mapInPandas-shaped
    * hot path: per-partition iterator, codec state could be reused across
    * the whole batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real pipeline: initialize the codec ONCE per partition here)
      rows.map { r =>
        val (mean, entropy) = FakeCodec.decode(r.payload)
        MediaFeatures(r.id, r.kind, r.payload.length.toLong,
          math.rint(mean * 10000) / 10000,
          math.rint(entropy * 10000) / 10000,
          nFrames(r.payload.length))
      }
    }
  }

  def nFrames(payloadLen: Int): Int = (payloadLen + FrameSize - 1) / FrameSize

  /** Frame sampling stub: every `stride`-th fixed-size slice. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val total = nFrames(r.payload.length)
      (0 until total by stride).map { i =>
        val from = i * FrameSize
        val until = math.min(from + FrameSize, r.payload.length)
        Frame(r.id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Parsed header metadata (None = the payload carries no parseable
    * container header of that family). */
  case class MediaHeaderMeta(id: Long, kind: String,
                             width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int], channels: Option[Int],
                             duration_ms: Option[Long])

  /** Media table whose payloads carry REAL container headers
    * ([[MediaHeaders]]): images get a spec-correct PNG signature+IHDR
    * (dims derived from the id), audio a fully valid PCM WAV wrapping
    * the text bytes, video stays headerless raw bytes (must classify as
    * unparseable). This is the fixture for header-level metadata
    * extraction — the step that IS real; pixel/PCM decode remains the
    * declared stub. */
  def mediaWithHeaders(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val body = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 =>
            val w = (100 + id % 64).toInt; val h = (50 + id % 32).toInt
            MediaRow(id, "image", w, h, MediaHeaders.pngBytes(w, h, body))
          case 1 =>
            val rate = 8000 + (id % 8).toInt * 1000
            MediaRow(id, "audio", 0, 0, MediaHeaders.wavBytes(rate, 1, 16, body))
          case _ =>
            MediaRow(id, "video", 0, 0, body)
        }
    }
  }

  /** Header-level metadata extraction over partition batches — the same
    * mapInPandas-shaped hot path as [[extractFeatures]], but the parsing
    * is [[MediaHeaders]]' real byte-format walk, not a stub. */
  def extractHeaderMeta(media: Dataset[MediaRow]): Dataset[MediaHeaderMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val png = MediaHeaders.parsePng(r.payload)
        val jpg = if (png.isEmpty) MediaHeaders.parseJpegDims(r.payload) else None
        val wav = MediaHeaders.parseWav(r.payload)
        MediaHeaderMeta(r.id, r.kind,
          png.map(_.width).orElse(jpg.map(_._1)),
          png.map(_.height).orElse(jpg.map(_._2)),
          wav.map(_.sampleRate), wav.map(_.channels), wav.map(_.durationMs))
      }
    }
  }

  /** Per-item decoded-unit statistics: the aggregate of a REAL decode
    * (pixels for images, PCM samples for audio). `checksum` is the
    * position-weighted sum Σ (k+1)·unit(k), so a decode that produced
    * the right multiset in the wrong order still fails the gate. */
  case class MediaUnits(id: Long, kind: String, n_units: Long,
                        unit_sum: Long, unit_min: Long, unit_max: Long,
                        checksum: Long)

  /** Media table with fully DECODABLE payloads, synthesized from
    * closed-form formulas over the doc id (see [[MediaDecode]]): even
    * ids get a spec-correct grayscale-8 PNG (zlib-deflated, scanline
    * filter y % 5 — all five filters exercised), odd ids a PCM16 WAV.
    * The same formulas replay directly in the oracle SQL, closing the
    * synthesize→decode→aggregate loop. */
  def mediaWithCodecs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) {
        val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
        val pix = Array.tabulate(w * h) { k =>
          val x = k % w; val y = k / w
          ((x * 7 + y * 13 + id * 31) % 256).toInt
        }
        MediaRow(id, "image", w, h, MediaDecode.pngGray8(w, h, pix))
      } else {
        val n = (200 + (id % 50) * 2).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i * 17) % 65536) - 32768).toInt)
        MediaRow(id, "audio", 0, 0, MediaDecode.wavPcm16(8000, samples))
      }
    }
  }

  /** Media table of baseline grayscale JPEGs — the ENTROPY-CODED format
    * family ([[JpegCodec]]). Each doc id gets a (8+id%9)×(8+id%7) image
    * whose quantized coefficients come from a closed-form formula: per
    * 8×8 block (bx, by), DC = ((id%97)·7 + bx·31 + by·53) % 201 − 100
    * and the (v=4,u=0) AC (zigzag 10) = ((id%89)·5 + bx·17 + by·29) %
    * 41 − 20, under a uniform quant table of 8 — so the decoded pixel
    * is exactly DC + s(y%8)·AC + 128 with s = +1 for y%8 ∈ {0,3,4,7}
    * (the IDCT's two active basis functions are exactly ±1/8 there).
    * The oracle replays that formula; Huffman/DC-prediction/run-length/
    * IDCT arithmetic is hash-checked end to end. */
  def mediaWithJpeg(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val blocks = Array.tabulate(bw * bh) { bi =>
        val bx = bi % bw; val by = bi / bw
        val zz = new Array[Int](64)
        zz(0) = (((id % 97) * 7 + bx * 31 + by * 53) % 201 - 100).toInt
        zz(10) = (((id % 89) * 5 + bx * 17 + by * 29) % 41 - 20).toInt
        zz
      }
      MediaRow(id, "image", w, h,
        JpegCodec.encodeGrayFromCoeffs(w, h, JpegCodec.QUniform8, blocks))
    }
  }

  /** REAL decode over partition batches — the same mapInPandas-shaped
    * hot path as [[extractFeatures]], but running the actual codecs:
    * PNG gray-8 / baseline JPEG for images (dispatched by container
    * signature, as a real pipeline must), PCM16 WAV for audio.
    * Undecodable payloads drop out (flatMap), so a silent decode
    * failure surfaces as a row-count mismatch at the gate rather than a
    * fabricated row. */
  def decodeUnits(media: Dataset[MediaRow]): Dataset[MediaUnits] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val units: Option[Array[Int]] = r.kind match {
          case "image" =>
            val p = r.payload
            if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
              JpegCodec.decodeGray(p)
            else MediaDecode.decodePngGray8(p)
          case "audio" => MediaDecode.decodeWavPcm16(r.payload)
          case _ => None
        }
        units.map { u =>
          var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue
          var checksum = 0L
          var k = 0
          while (k < u.length) {
            val v = u(k).toLong
            sum += v; if (v < min) min = v; if (v > max) max = v
            checksum += (k + 1) * v
            k += 1
          }
          MediaUnits(r.id, r.kind, u.length.toLong, sum, min, max, checksum)
        }
      }
    }
  }

  /** Build a media table from the documents corpus (text bytes stand in
    * for payloads; kind round-robins over modalities). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      lit(64).as("width"), lit(64).as("height"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
