package graft.functions.aggs

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for funnel-family aggregators: event time in epoch micros and
  * the 1-based funnel step this event matches (0 = matches none). */
case class StepEvent(tsUs: Long, step: Int)

/** Shared shape for the funnel family: collect matching (ts, step) pairs
  * into a live ArrayBuffer (in-place append per row; kryo SerDe only at
  * shuffle boundaries — an immutable-Seq version paid per-row copies),
  * then run an O(n log n) scan in finish(). */
abstract class EventCollectAgg[OUT](nSteps: Int)
    extends Aggregator[StepEvent, mutable.ArrayBuffer[(Long, Int)], OUT]
    with Serializable {

  def zero: mutable.ArrayBuffer[(Long, Int)] = mutable.ArrayBuffer.empty

  def reduce(buf: mutable.ArrayBuffer[(Long, Int)],
             e: StepEvent): mutable.ArrayBuffer[(Long, Int)] = {
    if (e.step >= 1 && e.step <= nSteps) buf += ((e.tsUs, e.step))
    buf
  }

  def merge(a: mutable.ArrayBuffer[(Long, Int)],
            b: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    a ++= b; a
  }

  def bufferEncoder: Encoder[mutable.ArrayBuffer[(Long, Int)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Long, Int)]]
}

/** windowFunnel(window)(ts, step) — max funnel depth reached within a time
  * window (reference semantics:
  * /root/reference/src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp —
  * collects (timestamp, event-bitmask) pairs per group, sorts on finalize,
  * and searches for the deepest chain whose events are ordered and fall
  * within `window` of the chain's first event).
  *
  * Semantics here (documented, DuckDB-oracle-checkable): level L is
  * reached iff there exist events e1…eL with step(e_i)=i, non-decreasing
  * timestamps (ties broken by step order), and ts(eL) - ts(e1) <= window.
  *
  * finish() runs a single left-to-right DP over the time-sorted events:
  * best(k) = the LATEST possible chain-start timestamp among all chains
  * reaching level k. Keeping the latest start dominates every other chain
  * for future extension (maximal remaining window slack), so the DP is
  * exact in O(n log n + n·steps).
  *
  * State is O(events-per-group) like the reference's implementation; the
  * aggregation itself distributes (partial buffers merge associatively),
  * so at 100 TB the only requirement is that a single group's matching
  * events fit in executor memory — same contract as the reference.
  */
class WindowFunnelAgg(windowUs: Long, nSteps: Int) extends EventCollectAgg[Int](nSteps) {

  def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Int = {
    val sorted = buf.sortBy(identity)
    val best = Array.fill(nSteps + 1)(Long.MinValue)
    sorted.foreach { case (t, k) =>
      if (k == 1) { if (t > best(1)) best(1) = t }
      else if (best(k - 1) != Long.MinValue && t - best(k - 1) <= windowUs) {
        if (best(k - 1) > best(k)) best(k) = best(k - 1)
      }
    }
    var level = nSteps
    while (level > 0 && best(level) == Long.MinValue) level -= 1
    level
  }

  def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

/** sequenceMatch('(?1).*(?2)…') — true iff the steps occur as a
  * subsequence in strictly increasing time order (reference:
  * src/AggregateFunctions/AggregateFunctionSequenceMatch.cpp; we support
  * the `.*`-separated pattern family, which is the windowFunnel DP with an
  * unbounded window and strict ordering). */
class SequenceMatchAgg(nSteps: Int) extends EventCollectAgg[Boolean](nSteps) {

  def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Boolean = {
    // earliest time each level can be completed, requiring strict increase
    val sorted = buf.sortBy(identity)
    val done = Array.fill(nSteps + 1)(Long.MaxValue)
    done(0) = Long.MinValue
    sorted.foreach { case (t, k) =>
      if (done(k - 1) != Long.MaxValue && t > done(k - 1) && t < done(k))
        done(k) = t
    }
    done(nSteps) != Long.MaxValue
  }

  def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
}

/** sequenceCount('(?1).*(?2)…') — number of non-overlapping matches,
  * scanning in time order and greedily restarting after each complete
  * match (reference: AggregateFunctionSequenceMatch.cpp sequenceCount). */
class SequenceCountAgg(nSteps: Int) extends EventCollectAgg[Long](nSteps) {

  def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Long = {
    val sorted = buf.sortBy(identity)
    var count = 0L
    var next = 1 // next step we need
    sorted.foreach { case (_, k) =>
      if (k == next) {
        if (next == nSteps) { count += 1; next = 1 } else next += 1
      }
    }
    count
  }

  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
