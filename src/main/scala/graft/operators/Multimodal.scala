package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions (Scala Dataset equivalent of the mapInPandas batch-UDF
  * pattern: one iterator of rows per partition, decode amortized across
  * the batch).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `FakeCodec.decode` derives deterministic pseudo-features
  * from the bytes. Everything around it — schema, partitioning, batch
  * iteration, feature/frames output shape — is real and tested, so
  * swapping in a real decoder is a one-function change.
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
    * image/audio codec (??? boundary). Byte histogram statistics play the
    * role of decoded features. */
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
