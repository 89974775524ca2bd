package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical dictionary functions — daisy `dictGetHierarchy` /
  * `dictIsIn` (`src/Functions/FunctionsExternalDictionaries.h:907,967`):
  * given a dictionary with a parent attribute, return the ancestor chain
  * of an id (the id itself first, root last), and test ancestry.
  *
  * Spark-first shape: the dictionary is a small dimension (the reference
  * holds it in memory on every node — the broadcast-join analogue), so
  * each hierarchy level is ONE broadcast hash join of the working set
  * against the dictionary; `maxDepth` iterations total, no shuffle of the
  * fact side. State per row is the chain array (depth-bounded), so the
  * operator distributes over any fact-table cardinality — only the
  * dictionary itself must fit in a broadcast, exactly like the
  * reference's in-RAM dictionary requirement. A depth cap instead of a
  * driver-side convergence loop keeps the plan static and cycle-safe
  * (the reference likewise aborts deep/cyclic walks).
  */
object DictHierarchy {

  /** Ancestor chains for every dictionary id.
    *
    * The walk happens ON THE DRIVER over the collected (id, parent)
    * pairs: the reference's hierarchical dictionaries are replicated
    * in RAM on every node by contract (flat/hashed layouts,
    * `src/Dictionaries/HashedDictionary.h`), so the dictionary is
    * driver-held here for the same reason the IVF centroid table is —
    * it is a query PARAMETER, not the data path. Earlier rounds walked
    * one broadcast join per level instead; that plan re-evaluated the
    * dictionary union at every level and stacked 7 broadcast exchanges,
    * ~2-4 s per query in the micro bench for a table that fits in a
    * HashMap. Fact-side application stays distributed: join the returned
    * (small) chain table with `broadcast(...)`.
    *
    * @param dict dictionary as (id: long, parent: long); parent == 0
    *             marks a root, matching the reference's null_value=0
    *             convention for hierarchical flat/hashed dictionaries.
    * @param maxDepth maximum chain length (hierarchies are shallow; the
    *                 cap also terminates accidental cycles).
    * @return (id: long, chain: array<long>) — id first, root last.
    */
  def chains(dict: DataFrame, maxDepth: Int = 8): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val pairs = dict.select(col("id").cast("long"), col("parent").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val parentOf = pairs.toMap
    val rows = pairs.map { case (id, _) =>
      val chain = scala.collection.mutable.ArrayBuffer(id)
      var next = parentOf(id)
      while (chain.length < maxDepth && parentOf.contains(next)) {
        chain += next
        next = parentOf(next)
      }
      (id, chain.toSeq)
    }
    spark.sparkContext.parallelize(rows.toIndexedSeq, 1).toDF("id", "chain")
  }

  /** dictIsIn: is `ancestor` in `child`'s ancestor chain? Apply over the
    * output of [[chains]]. */
  def isIn(chain: Column, ancestor: Column): Column =
    array_contains(chain, ancestor)
}
