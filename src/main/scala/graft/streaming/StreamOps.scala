package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface — the reference's ingest/live-view machinery mapped
  * to Structured Streaming (SURVEY §2.10):
  *
  *  - WAL tail → table commit ⇒ readStream + checkpointed writeStream
  *    (offsets ARE the commit sequence numbers:
  *    daisy `StorageDistributedMergeTree.cpp:906-1020` commitSN*).
  *  - `_time` auto-column ⇒ withTimeDefaulting
  *    (daisy `AddTimeParamVisitor.cpp`, `_time DateTime64(3)`).
  *  - idempotent-key dedup ⇒ watermark + dropDuplicates
  *    (daisy `Record.h:19,39-41` `_idem` keys; the watermark bounds state,
  *    which the reference never needed because merges absorb late rows —
  *    our explicit improvement).
  *  - toStartOfInterval GROUP BY ⇒ window()/session_window (real
  *    event-time windows with late-data handling the reference lacks).
  *  - ReplacingMergeTree latest-row ⇒ flatMapGroupsWithState.
  *  - LiveView periodic refresh / materialized views ⇒
  *    Trigger.ProcessingTime + foreachBatch.
  *
  * All operators here keep bounded state: windows + watermark evict,
  * dedup state expires past the watermark, per-key state is O(1). That is
  * the 100 TB/day contract — no unbounded driver or executor growth.
  */
object StreamOps {

  /** Fixed ingest schema, mirroring the rawstore/tabular ingest columns
    * (daisy RawstoreTableRestRouterHandler.cpp:84-95 fixed schema). */
  case class IngestRow(_idem: String, _time: java.sql.Timestamp,
                       user_id: Long, event_type: String, value: Double)

  /** Latest-row state per key (ReplacingMergeTree semantics). */
  case class LatestRow(user_id: Long, ts_us: Long, event_type: String, value: Double)

  /** `_time` defaulting: rows arriving without an event time get the
    * processing time (daisy: `_time` DEFAULT now64(3)). */
  def withTimeDefaulting(df: DataFrame, timeCol: String = "_time"): DataFrame =
    df.withColumn(timeCol, coalesce(col(timeCol), current_timestamp()))

  /** Idempotent-key dedup with bounded state: duplicates within the
    * watermark horizon are dropped exactly like the reference's
    * buildIdempotentKeysIndex, but state is evicted past the watermark. */
  def dedupByIdem(df: DataFrame, idemCol: String = "_idem",
                  timeCol: String = "_time",
                  watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicates(idemCol, timeCol)

  /** Stream-side dimension enrichment — the reference's materialized
    * views may SELECT the consumed stream JOINed against a dictionary/
    * dimension table (`StorageKafka.streamToViews` pushes each consumed
    * block through the MV's full SELECT). Structured Streaming's
    * stream-static join is the native analogue: the static side is
    * broadcast when small — no stream-side shuffle, identical to the
    * reference's in-RAM dictionary lookup. The static side is a
    * POINT-IN-TIME snapshot (its file listing binds at stream start);
    * for the reference's periodic dictionary-reload behavior, join
    * inside a foreachBatch MV where each batch re-reads the dimension —
    * the spec demonstrates both. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
             dimKey: String, joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), joinType)

  /** Tumbling event-time aggregation — the streaming
    * `toStartOfInterval(_time, k) GROUP BY` (daisy materialized-view
    * pattern), with a real watermark. */
  def tumblingAgg(df: DataFrame, timeCol: String, width: String,
                  watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding window variant. */
  def slidingAgg(df: DataFrame, timeCol: String, width: String,
                 slide: String, watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n"))

  /** Gap-based session windows (the streaming form of q_sessionize). */
  def sessionAgg(df: DataFrame, timeCol: String, gap: String,
                 watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("user_id"), col("n_events"))

  /** [[sessionAgg]] with the window bounds exposed (reporting/gate
    * variant): session_end = last event + gap, per session_window
    * semantics. */
  def sessionAggFull(df: DataFrame, timeCol: String, gap: String,
                     watermark: String): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** A signed ingest row for the streaming collapsing engine. */
  case class SignedRow(user_id: Long, seq: Long, sign: Int, value: Double)

  /** Incrementally-collapsed per-key state (CollapsingMergeTree over a
    * stream): the same quantities CollapsingSortedAlgorithm tracks per
    * key — sign counts, last sign, last positive row, first negative
    * row — plus the survivor count the FINAL emit rules produce. */
  case class CollapseState(user_id: Long, cnt_pos: Long, cnt_neg: Long,
                           last_sign: Int, last_seq: Long,
                           last_pos_seq: Option[Long],
                           last_pos_value: Option[Double],
                           first_neg_seq: Option[Long],
                           first_neg_value: Option[Double],
                           survivors: Int)

  /** CollapsingMergeTree maintained continuously (the reference collapses
    * incrementally during background merges —
    * `CollapsingSortedAlgorithm.cpp:69-106`; on a stream the same
    * quantities fold associatively per key, so state is O(1) per key and
    * each batch emits the key's new collapsed state only when it
    * changed). `survivors` follows the FINAL emit rules: 2 when the key
    * is balanced and ends on a state row, 0 when balanced ending on a
    * cancel, else 1. */
  def collapsingState(ds: Dataset[SignedRow]): Dataset[CollapseState] = {
    import ds.sparkSession.implicits._
    def fold(key: Long, rows: Iterator[SignedRow],
             prev: Option[CollapseState]): CollapseState = {
      var cp = prev.map(_.cnt_pos).getOrElse(0L)
      var cn = prev.map(_.cnt_neg).getOrElse(0L)
      var lastSign = prev.map(_.last_sign).getOrElse(0)
      var lastSeq = prev.map(_.last_seq).getOrElse(Long.MinValue)
      var lpSeq = prev.flatMap(_.last_pos_seq)
      var lpVal = prev.flatMap(_.last_pos_value)
      var fnSeq = prev.flatMap(_.first_neg_seq)
      var fnVal = prev.flatMap(_.first_neg_value)
      rows.foreach { r =>
        if (r.sign == 1) {
          cp += 1
          if (lpSeq.forall(_ < r.seq)) { lpSeq = Some(r.seq); lpVal = Some(r.value) }
        } else if (r.sign == -1) {
          cn += 1
          if (fnSeq.forall(_ > r.seq)) { fnSeq = Some(r.seq); fnVal = Some(r.value) }
        }
        if (r.seq > lastSeq) { lastSeq = r.seq; lastSign = r.sign }
      }
      val emitAny = lastSign == 1 || cp != cn
      val survivors =
        (if (emitAny && cp <= cn && fnSeq.isDefined) 1 else 0) +
        (if (emitAny && cp >= cn && lpSeq.isDefined) 1 else 0)
      CollapseState(key, cp, cn, lastSign, lastSeq,
        lpSeq, lpVal, fnSeq, fnVal, survivors)
    }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[CollapseState, CollapseState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[SignedRow], state: GroupState[CollapseState]) =>
          val next = fold(key, rows, state.getOption)
          if (state.getOption.contains(next)) Iterator.empty
          else { state.update(next); Iterator.single(next) }
      }
  }

  /** One content row on the ingest stream (digest precomputed by the
    * caller — [[graft.operators.Dedup.normalized]]+md5, so batch and
    * stream dedup share one digest definition). */
  case class ContentRow(doc_id: Long, digest: String)

  /** Streaming dedup decision: canonical = the FIRST doc_id ever seen
    * with this digest (across all batches, not a watermark horizon). */
  case class DedupDecision(doc_id: Long, digest: String, canonical_id: Long,
                           is_duplicate: Boolean)

  /** Streaming exact dedup with canonicalization — the continuous form
    * of [[graft.operators.Dedup.exact]]: state per digest is ONE long
    * (the first doc_id), every arriving row is emitted with its
    * canonical id and duplicate flag. Unlike
    * `dropDuplicates(digest)` this keeps duplicates flowing (tagged), so
    * downstream can count/route them, and the state contract is explicit:
    * one entry per distinct digest forever, like the reference's
    * engine-level dedup — cardinality-bounded only, so the RocksDB state
    * store applies at corpus scale (see [[latestPerKey]]'s provider
    * flip, which this shares via the same session conf). */
  def streamingExactDedup(ds: Dataset[ContentRow]): Dataset[DedupDecision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.digest)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digest: String, rows: Iterator[ContentRow], state: GroupState[Long]) =>
          // batch-internal order: lowest doc_id wins, matching the
          // batch operator's min(doc_id) canonical choice
          val sorted = rows.toSeq.sortBy(_.doc_id)
          val canonical = state.getOption.getOrElse {
            val c = sorted.head.doc_id; state.update(c); c
          }
          sorted.iterator.map(r =>
            DedupDecision(r.doc_id, digest, canonical, r.doc_id != canonical))
      }
  }

  /** ReplacingMergeTree latest-row: stateful per-key newest version
    * (daisy MergeTreeData.h:104-105 Replacing mode). State per key is one
    * row; flatMapGroupsWithState emits the new latest on every update.
    *
    * Scale contract: like ReplacingMergeTree itself, state is one row
    * PER DISTINCT KEY with no timeout — key cardinality bounds the state,
    * nothing else does. At 100 TB/day of user_ids that exceeds executor
    * heap under the default in-memory state store, so this path flips the
    * session to the RocksDB state store provider (spilling, incremental
    * checkpoints) unless the caller already pinned a provider choice. */
  def latestPerKey(ds: Dataset[IngestRow]): Dataset[LatestRow] = {
    val session = ds.sparkSession
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    // Flip to RocksDB only when the caller has NOT explicitly chosen a
    // provider: SQLConf.settings distinguishes an explicit set (even to
    // the default HDFS-backed provider — e.g. to resume a checkpoint
    // written by it) from the untouched default, which conf.getOption
    // cannot.
    if (!session.sessionState.conf.contains(providerKey))
      session.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestRow, LatestRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[IngestRow], state: GroupState[LatestRow]) =>
          val incoming = rows.map(r =>
            LatestRow(key, r._time.getTime * 1000, r.event_type, r.value))
          val cur = state.getOption
          val newest = (incoming ++ cur.iterator)
            .maxByOption(r => (r.ts_us, r.event_type))
          newest match {
            // emit only on a real change: a batch of strictly-older rows
            // resolves newest to the stored state itself — re-emitting it
            // would be a duplicate unchanged update.
            case Some(n) if !cur.contains(n) =>
              state.update(n); Iterator.single(n)
            case _ => Iterator.empty
          }
      }
  }
}
