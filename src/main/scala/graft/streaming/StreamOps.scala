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
