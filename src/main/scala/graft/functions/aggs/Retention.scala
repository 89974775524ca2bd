package graft.functions.aggs

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** retention(cond1, …, condN) (reference:
  * /root/reference/src/AggregateFunctions/AggregateFunctionRetention.cpp):
  * per group, flag(i) = whether cond_i held on ANY row; result r(1)=flag(1),
  * r(i)=flag(1) AND flag(i) for i>1 — i.e. cohort retention relative to the
  * first condition. Constant-size state (one flag per condition) mutated in
  * place, so it distributes trivially.
  */
class RetentionAgg(nConds: Int)
    extends Aggregator[Seq[Boolean], Array[Boolean], Seq[Int]] with Serializable {

  def zero: Array[Boolean] = new Array[Boolean](nConds)

  def reduce(buf: Array[Boolean], conds: Seq[Boolean]): Array[Boolean] = {
    val m = math.min(nConds, conds.length)
    var i = 0
    while (i < m) { if (conds(i)) buf(i) = true; i += 1 }
    buf
  }

  def merge(a: Array[Boolean], b: Array[Boolean]): Array[Boolean] = {
    var i = 0
    while (i < nConds) { if (b(i)) a(i) = true; i += 1 }
    a
  }

  def finish(buf: Array[Boolean]): Seq[Int] =
    Vector.tabulate(nConds) { i =>
      if (i == 0) { if (buf(0)) 1 else 0 }
      else if (buf(0) && buf(i)) 1 else 0
    }

  def bufferEncoder: Encoder[Array[Boolean]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

/** uniqUpTo(N)(x) (reference: AggregateFunctionUniqUpTo.cpp): exact
  * distinct count while <= N, else N+1. State is bounded at N+1 elements —
  * the cheap "are there more than N distinct" primitive. Live HashSet
  * buffer; kryo-encoded at shuffle boundaries only. */
class UniqUpToAgg(n: Int)
    extends Aggregator[String, mutable.HashSet[String], Long] with Serializable {

  def zero: mutable.HashSet[String] = mutable.HashSet.empty

  def reduce(buf: mutable.HashSet[String], x: String): mutable.HashSet[String] = {
    if (buf.size <= n && x != null) buf.add(x)
    buf
  }

  def merge(a: mutable.HashSet[String], b: mutable.HashSet[String]): mutable.HashSet[String] = {
    val it = b.iterator
    while (a.size <= n + 1 && it.hasNext) a.add(it.next())
    a
  }

  def finish(buf: mutable.HashSet[String]): Long = math.min(buf.size, n + 1).toLong

  def bufferEncoder: Encoder[mutable.HashSet[String]] =
    Encoders.kryo[mutable.HashSet[String]]
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** deltaSumTimestamp(ts, key, value) (reference:
  * AggregateFunctionDeltaSum.cpp / …DeltaSumTimestamp.cpp): sum of
  * positive differences between consecutive values when rows are ordered
  * by (ts, key). The reference relies on parts being time-ordered and
  * keeps O(1) state; under Spark's unordered shuffle we keep the
  * (ts, key, value) triples and sort on finish — exact for any input
  * order, O(rows-per-group) state (document: for huge groups prefer the
  * window-function form, which sorts distributively). `key` is a
  * deterministic tie-break (e.g. event_id) so duplicate timestamps keep
  * the same order run-to-run and match the oracle's ORDER BY ts, key.
  * ArrayBuffer appends in place; kryo-encoded at shuffle only. */
class DeltaSumTimestampAgg
    extends Aggregator[(Long, Long, Double), mutable.ArrayBuffer[(Long, Long, Double)], Double]
    with Serializable {

  def zero: mutable.ArrayBuffer[(Long, Long, Double)] = mutable.ArrayBuffer.empty

  def reduce(buf: mutable.ArrayBuffer[(Long, Long, Double)],
             x: (Long, Long, Double)): mutable.ArrayBuffer[(Long, Long, Double)] = { buf += x; buf }

  def merge(a: mutable.ArrayBuffer[(Long, Long, Double)],
            b: mutable.ArrayBuffer[(Long, Long, Double)]): mutable.ArrayBuffer[(Long, Long, Double)] = {
    a ++= b; a
  }

  def finish(buf: mutable.ArrayBuffer[(Long, Long, Double)]): Double = {
    val sorted = buf.sortBy(x => (x._1, x._2))
    var sum = 0.0
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i)._3 - sorted(i - 1)._3
      if (d > 0) sum += d
      i += 1
    }
    sum
  }

  def bufferEncoder: Encoder[mutable.ArrayBuffer[(Long, Long, Double)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Long, Long, Double)]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
