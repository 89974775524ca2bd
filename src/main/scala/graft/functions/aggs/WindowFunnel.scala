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

/** windowFunnel strict modes (reference:
  * AggregateFunctionWindowFunnel.cpp `strict_order` / `strict_increase`):
  *
  *  - strictIncrease: chain timestamps must STRICTLY increase (the base
  *    DP allows ties).
  *  - strictOrder: no other funnel event may interleave between chain
  *    steps — scanning in time order, an event whose step is neither the
  *    chain's next step nor a fresh step-1 breaks the current chain.
  *
  * With strictOrder a broken chain can never be extended, so a greedy
  * left-to-right scan (restart at the next step-1) is exact. */
class WindowFunnelStrictAgg(windowUs: Long, nSteps: Int,
                            strictOrder: Boolean = false,
                            strictIncrease: Boolean = false)
    extends EventCollectAgg[Int](nSteps) {

  def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Int = {
    val sorted = buf.sortBy(identity)
    if (strictOrder) {
      var maxLevel = 0
      var cur = 0          // current chain depth
      var start = 0L       // chain start ts
      var prev = Long.MinValue
      sorted.foreach { case (t, k) =>
        val extendOk = k == cur + 1 &&
          (if (strictIncrease) t > prev else t >= prev) &&
          (cur == 0 || t - start <= windowUs)
        if (extendOk) {
          if (cur == 0) start = t
          cur += 1; prev = t
          if (cur > maxLevel) maxLevel = cur
        } else if (k == 1) { cur = 1; start = t; prev = t
          if (cur > maxLevel) maxLevel = cur
        } else { cur = 0 }
      }
      maxLevel
    } else {
      // latest-start DP as in WindowFunnelAgg, with optional strict
      // timestamp increase
      val best = Array.fill(nSteps + 1)(Long.MinValue)
      val lastAt = Array.fill(nSteps + 1)(Long.MinValue) // ts reaching level k
      sorted.foreach { case (t, k) =>
        if (k == 1) { if (t > best(1)) { best(1) = t; lastAt(1) = t } }
        else if (best(k - 1) != Long.MinValue && t - best(k - 1) <= windowUs &&
          (!strictIncrease || t > lastAt(k - 1))) {
          if (best(k - 1) > best(k)) { best(k) = best(k - 1); lastAt(k) = t }
        }
      }
      var level = nSteps
      while (level > 0 && best(level) == Long.MinValue) level -= 1
      level
    }
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

/** sequenceMatch with time conditions — the `(?t<=n)` / `(?t>=n)`
  * pattern operators (reference AggregateFunctionSequenceMatch.cpp
  * `TimeLessOrEqual`/`TimeGreaterOrEqual` pattern actions):
  * `gaps(i)` = (minUs, maxUs) bounds on the time between step i+1 and
  * step i+2 (use (0, Long.MaxValue) for an unconditioned `.*` gap).
  *
  * Exact DP: per level, the sorted list of feasible completion times;
  * an event at step k extends level k-1 iff some completion time c
  * satisfies c < t && minGap <= t - c <= maxGap (binary search). With
  * mixed min/max gap constraints no single representative completion
  * time is dominant, so the full list is required for exactness —
  * O(n·log n) per group, state bounded by events-per-group. */
class SequenceMatchTimeAgg(nSteps: Int, gaps: Seq[(Long, Long)])
    extends EventCollectAgg[Boolean](nSteps) {
  require(gaps.length == nSteps - 1, "need one (min,max) gap per transition")

  def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Boolean = {
    val sorted = buf.sortBy(identity)
    val levels = Array.fill(nSteps + 1)(mutable.ArrayBuffer.empty[Long])
    var done = false
    sorted.foreach { case (t, k) =>
      if (!done) {
        val ok =
          if (k == 1) true
          else {
            val (minG, maxG) = gaps(k - 2)
            // need completion c of level k-1 with c < t, minG <= t-c <= maxG
            // ⇒ c in [t - maxG, min(t - minG, t - 1)]
            val lo = if (maxG == Long.MaxValue) Long.MinValue else t - maxG
            val hi = math.min(if (minG <= 0) t - 1 else t - minG, t - 1)
            val cs = levels(k - 1)
            cs.nonEmpty && {
              // cs is sorted (events processed in time order)
              val i = cs.search(lo)(Ordering.Long) match {
                case scala.collection.Searching.Found(idx) => idx
                case scala.collection.Searching.InsertionPoint(idx) => idx
              }
              i < cs.length && cs(i) <= hi
            }
          }
        if (ok) {
          if (k == nSteps) done = true
          else if (levels(k).isEmpty || levels(k).last != t) levels(k) += t
        }
      }
    }
    done
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
