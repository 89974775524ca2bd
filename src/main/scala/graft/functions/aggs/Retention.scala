package graft.functions.aggs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** retention(cond1, …, condN) (reference:
  * /root/reference/src/AggregateFunctions/AggregateFunctionRetention.cpp):
  * per group, flag(i) = whether cond_i held on ANY row; result r(1)=flag(1),
  * r(i)=flag(1) AND flag(i) for i>1 — i.e. cohort retention relative to the
  * first condition. Constant-size state (one bit per condition), so it
  * distributes trivially.
  */
class RetentionAgg(nConds: Int)
    extends Aggregator[Seq[Boolean], Seq[Boolean], Seq[Int]] with Serializable {

  def zero: Seq[Boolean] = Vector.fill(nConds)(false)

  def reduce(buf: Seq[Boolean], conds: Seq[Boolean]): Seq[Boolean] = {
    val c = conds.padTo(nConds, false)
    Vector.tabulate(nConds)(i => buf(i) || c(i))
  }

  def merge(a: Seq[Boolean], b: Seq[Boolean]): Seq[Boolean] =
    Vector.tabulate(nConds)(i => a(i) || b(i))

  def finish(buf: Seq[Boolean]): Seq[Int] =
    Vector.tabulate(nConds) { i =>
      if (i == 0) { if (buf(0)) 1 else 0 }
      else if (buf(0) && buf(i)) 1 else 0
    }

  def bufferEncoder: Encoder[Seq[Boolean]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

/** uniqUpTo(N)(x) (reference: AggregateFunctionUniqUpTo.cpp): exact
  * distinct count while <= N, else N+1. State is bounded at N+1 elements —
  * the cheap "are there more than N distinct" primitive. */
class UniqUpToAgg(n: Int)
    extends Aggregator[String, Set[String], Long] with Serializable {

  def zero: Set[String] = Set.empty
  def reduce(buf: Set[String], x: String): Set[String] =
    if (buf.size > n || x == null) buf else buf + x
  def merge(a: Set[String], b: Set[String]): Set[String] = {
    val u = a ++ b
    if (u.size > n + 1) u.take(n + 1) else u
  }
  def finish(buf: Set[String]): Long = math.min(buf.size, n + 1).toLong
  def bufferEncoder: Encoder[Set[String]] = ExpressionEncoder()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** deltaSumTimestamp(ts, value) (reference: AggregateFunctionDeltaSum.cpp /
  * …DeltaSumTimestamp.cpp): sum of positive differences between
  * consecutive values when rows are ordered by ts. The reference relies on
  * parts being time-ordered and keeps O(1) state; under Spark's unordered
  * shuffle we keep the (ts, value) pairs and sort on finish — exact for
  * any input order, O(rows-per-group) state (document: for huge groups
  * prefer the window-function form, which sorts distributively). */
class DeltaSumTimestampAgg
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Double] with Serializable {

  def zero: Seq[(Long, Double)] = Vector.empty
  def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = buf :+ x
  def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] = a ++ b

  def finish(buf: Seq[(Long, Double)]): Double = {
    val sorted = buf.sortBy(_._1)
    var sum = 0.0
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i)._2 - sorted(i - 1)._2
      if (d > 0) sum += d
      i += 1
    }
    sum
  }

  def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
