package graft.functions.aggs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** anyHeavy(x) — heavy-hitter selection via the Boyer–Moore majority
  * vote (reference:
  * /root/reference/src/AggregateFunctions/AggregateFunctionMinMaxAny.h:636
  * AggregateFunctionAnyHeavyData; public algorithm: Boyer & Moore,
  * "MJRTY — A Fast Majority Vote Algorithm", 1981).
  *
  * State is ONE (candidate, counter) pair regardless of input size.
  * Per-row update: same value → counter+1; different → counter-1, taking
  * over the slot when it hits 0. Distributed merge mirrors the
  * reference's changeIfBetter(Self): equal candidates sum counters,
  * different ones subtract, larger counter keeps the slot. If some value
  * holds a true majority (> half the rows) it is returned regardless of
  * row or partition order — that's the algorithm's guarantee and what
  * makes the result oracle-able; with no majority the answer is a
  * heuristic frequent value, same as the reference.
  */
class AnyHeavyAgg
    extends Aggregator[String, (String, Long), String]
    with Serializable {

  def zero: (String, Long) = (null, 0L)

  def reduce(buf: (String, Long), x: String): (String, Long) = {
    if (x == null) buf
    else if (buf._2 == 0L) (x, 1L)
    else if (buf._1 == x) (buf._1, buf._2 + 1)
    else (buf._1, buf._2 - 1)
  }

  def merge(a: (String, Long), b: (String, Long)): (String, Long) = {
    if (a._1 == null) b
    else if (b._1 == null) a
    else if (a._1 == b._1) (a._1, a._2 + b._2)
    else if (a._2 >= b._2) (a._1, a._2 - b._2)
    else (b._1, b._2 - a._2)
  }

  def finish(buf: (String, Long)): String = buf._1

  def bufferEncoder: Encoder[(String, Long)] = ExpressionEncoder()
  def outputEncoder: Encoder[String] = Encoders.STRING
}
