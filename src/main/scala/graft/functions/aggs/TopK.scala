package graft.functions.aggs

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** topK(k, capacity)(x) — approximate heavy hitters via the SpaceSaving
  * algorithm (reference:
  * /root/reference/src/AggregateFunctions/AggregateFunctionTopK.cpp, which
  * uses SpaceSaving with a reserved capacity; public algorithm: Metwally,
  * Agrawal, El Abbadi, "Efficient Computation of Frequent and Top-k
  * Elements in Data Streams", ICDT 2005).
  *
  * State is bounded at `capacity` counters regardless of input size —
  * the whole point at 100 TB: per-partition partial maps of `capacity`
  * entries merge associatively (count-wise union + prune), so the shuffle
  * carries O(capacity) per group. When `capacity` >= true distinct count
  * the result is exact; results are returned count-desc, value-asc for
  * determinism.
  */
class TopKAgg(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]]
    with Serializable {

  require(capacity >= k, "capacity must be >= k")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], x: String): Map[String, Long] = {
    if (x == null) buf
    else buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None =>
        if (buf.size < capacity) buf.updated(x, 1L)
        else {
          // SpaceSaving eviction: replace the minimum counter, inheriting
          // its count as the error bound.
          val (minV, minC) = buf.minBy { case (v, c) => (c, v) }
          (buf - minV).updated(x, minC + 1)
        }
    }
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val u = (a.keySet ++ b.keySet).iterator
      .map(v => v -> (a.getOrElse(v, 0L) + b.getOrElse(v, 0L))).toMap
    if (u.size <= capacity) u
    else u.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity).toMap
  }

  def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** groupBitmap(x) — distinct-count via Roaring bitmaps over integer keys
  * (reference: src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp,
  * backed by RoaringBitmap just like this one; RoaringBitmap ships with
  * Spark). Buffer is the serialized bitmap: compressed, associatively
  * OR-mergeable — the -State/-Merge pattern with a portable binary form.
  */
class GroupBitmapAgg
    extends Aggregator[Int, Array[Byte], Long] with Serializable {
  import org.roaringbitmap.RoaringBitmap
  import java.io.{ByteArrayOutputStream, DataOutputStream}
  import java.nio.ByteBuffer

  private def ser(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  private def deser(b: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    if (b.nonEmpty) bm.deserialize(ByteBuffer.wrap(b))
    bm
  }

  def zero: Array[Byte] = Array.empty
  def reduce(buf: Array[Byte], x: Int): Array[Byte] = {
    val bm = deser(buf); bm.add(x); ser(bm)
  }
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bm = deser(a); bm.or(deser(b)); ser(bm)
  }
  def finish(buf: Array[Byte]): Long = deser(buf).getLongCardinality
  def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  def outputEncoder: Encoder[Long] = ExpressionEncoder()
}
