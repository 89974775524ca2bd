package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Query result cache with insert-driven invalidation — the reference's
  * query cache (`/root/reference/src/Interpreters/Cache/QueryCache.cpp`:
  * results keyed by the query AST, entries expire after a TTL, and
  * passive invalidation keeps stale results from being served).
  *
  * graft keys entries by the CANONICALIZED OPTIMIZED logical plan, which
  * is strictly stronger than the reference's AST key: two textually
  * different queries that optimize to the same plan share one entry, and
  * alias/case differences never cause spurious misses. The cached value
  * is the result persisted as a Spark cached DataFrame (MEMORY_AND_DISK)
  * — at cluster scale the result blocks live on the executors, not the
  * driver, so a cached 100 GB aggregate is as legal as a cached 5-row
  * one.
  *
  * Freshness follows the projection registry's model rather than the
  * reference's purely TTL-based expiry: every ingest path that appends
  * files under a table root calls [[invalidatePath]], which drops every
  * entry whose plan scanned that root. The TTL remains as a backstop for
  * sources graft does not write (external files mutated out-of-band).
  *
  * Entries evict LRU beyond `maxEntries`. Lookup is O(entries) on the
  * canonical plan — the registry is bounded and small by construction.
  */
object QueryCache {

  private final case class Entry(
      key: LogicalPlan,                   // canonicalized optimized plan
      result: DataFrame,                  // persisted
      createdMs: Long,
      paths: Set[String])                 // scanned file roots

  private val entries =
    new java.util.LinkedHashMap[LogicalPlan, Entry](16, 0.75f, true)
  private val lock = new Object

  @volatile private var hitCount = 0L
  @volatile private var missCount = 0L
  @volatile var ttlMs: Long = 60000L
  @volatile var maxEntries: Int = 64

  def hits: Long = hitCount
  def misses: Long = missCount
  def size: Int = lock.synchronized(entries.size)

  private def rootPathsOf(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten.toSet

  /** Serve `df`'s result from the cache, computing and persisting it on
    * miss. The returned DataFrame reads the persisted result — identical
    * rows, no recomputation. Non-deterministic plans (rand(), current
    * timestamp) are never cached, matching the reference's refusal. */
  def cached(df: DataFrame): DataFrame = {
    val key = df.queryExecution.optimizedPlan.canonicalized
    val deterministic =
      key.collect { case n => n }.forall(_.expressions.forall(_.deterministic))
    if (!deterministic) return df
    val now = System.currentTimeMillis()
    lock.synchronized {
      val hit = entries.get(key)
      if (hit != null && now - hit.createdMs <= ttlMs) {
        hitCount += 1
        return hit.result
      }
      if (hit != null) dropEntry(hit)
    }
    // compute OUTSIDE the lock: a slow query must not serialize the cache
    val result = df.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    val entry = Entry(key, result, now, rootPathsOf(df))
    lock.synchronized {
      missCount += 1
      val race = entries.get(key)
      if (race != null && now - race.createdMs <= ttlMs) {
        result.unpersist(false)
        return race.result
      }
      entries.put(key, entry)
      while (entries.size > maxEntries) {
        val eldest = entries.entrySet().iterator().next()
        dropEntry(eldest.getValue)
      }
    }
    result
  }

  private def dropEntry(e: Entry): Unit = {
    e.result.unpersist(false)
    entries.remove(e.key)
  }

  /** Insert-triggered invalidation: drop every entry whose plan scanned
    * `path` (called by the same ingest hooks that refresh projections). */
  def invalidatePath(path: String): Unit = lock.synchronized {
    if (entries.isEmpty) return
    val target = new org.apache.hadoop.fs.Path(path).toUri.getPath
    entries.values().asScala.filter(_.paths.contains(target)).toSeq
      .foreach(dropEntry)
  }

  def clear(): Unit = lock.synchronized {
    entries.values().asScala.toSeq.foreach(_.result.unpersist(false))
    entries.clear()
    hitCount = 0L
    missCount = 0L
  }
}
