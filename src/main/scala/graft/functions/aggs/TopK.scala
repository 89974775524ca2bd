package graft.functions.aggs

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
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
  *
  * The buffer is a LIVE mutable.HashMap (kryo-encoded): Spark keeps
  * TypedImperativeAggregate buffers as JVM objects between rows and
  * serializes only at shuffle boundaries, so reduce() is one hash update
  * in place — an immutable-Map version paid a persistent-map rebuild per
  * row (profiled at 140 s of the sf0.1 bench).
  */
class TopKAgg(k: Int, capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]]
    with Serializable {

  require(capacity >= k, "capacity must be >= k")

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(buf: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    if (x == null) return buf
    buf.get(x) match {
      case Some(c) => buf.update(x, c + 1)
      case None =>
        if (buf.size < capacity) buf.update(x, 1L)
        else {
          // SpaceSaving eviction: replace the minimum counter, inheriting
          // its count as the error bound.
          val (minV, minC) = buf.minBy { case (v, c) => (c, v) }
          buf.remove(minV)
          buf.update(x, minC + 1)
        }
    }
    buf
  }

  def merge(a: mutable.HashMap[String, Long],
            b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    if (a.size <= capacity) a
    else mutable.HashMap.from(
      a.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity))
  }

  def finish(buf: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** topKWeighted(k, capacity)(x, w) — SpaceSaving with per-row weights
  * (reference: AggregateFunctionTopK.cpp Weighted variant): identical
  * state machine to [[TopKAgg]], each occurrence contributing `w`
  * instead of 1. Same bounded-capacity merge semantics. */
class TopKWeightedAgg(k: Int, capacity: Int)
    extends Aggregator[(String, Long), mutable.HashMap[String, Long], Seq[(String, Long)]]
    with Serializable {

  require(capacity >= k, "capacity must be >= k")

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(buf: mutable.HashMap[String, Long],
             row: (String, Long)): mutable.HashMap[String, Long] = {
    val (x, w) = row
    if (x == null) return buf
    buf.get(x) match {
      case Some(c) => buf.update(x, c + w)
      case None =>
        if (buf.size < capacity) buf.update(x, w)
        else {
          val (minV, minC) = buf.minBy { case (v, c) => (c, v) }
          buf.remove(minV)
          buf.update(x, minC + w)
        }
    }
    buf
  }

  def merge(a: mutable.HashMap[String, Long],
            b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    if (a.size <= capacity) a
    else mutable.HashMap.from(
      a.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity))
  }

  def finish(buf: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** groupBitmap(x) — distinct-count via Roaring bitmaps over integer keys
  * (reference: src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp,
  * backed by RoaringBitmap just like this one; RoaringBitmap ships with
  * Spark).
  *
  * The buffer is the LIVE RoaringBitmap object (kryo-encoded): Spark's
  * TypedImperativeAggregate keeps buffers as JVM objects between rows and
  * serializes only at shuffle boundaries, so reduce() is a single
  * bitmap.add — a previous Array[Byte]-buffered version ser/deserialized
  * the bitmap on EVERY row and was ~1000× slower at sf0.1.
  */
class GroupBitmapAgg
    extends Aggregator[Int, org.roaringbitmap.RoaringBitmap, Long]
    with Serializable {
  import org.roaringbitmap.RoaringBitmap

  def zero: RoaringBitmap = new RoaringBitmap()
  def reduce(buf: RoaringBitmap, x: Int): RoaringBitmap = { buf.add(x); buf }
  def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = { a.or(b); a }
  def finish(buf: RoaringBitmap): Long = buf.getLongCardinality
  def bufferEncoder: Encoder[RoaringBitmap] =
    org.apache.spark.sql.Encoders.kryo[RoaringBitmap]
  def outputEncoder: Encoder[Long] = ExpressionEncoder()
}
