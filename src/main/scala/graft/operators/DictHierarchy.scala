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
    * @param dict dictionary as (id: long, parent: long); parent == 0
    *             marks a root, matching the reference's null_value=0
    *             convention for hierarchical flat/hashed dictionaries.
    * @param maxDepth maximum chain length (hierarchies are shallow; the
    *                 cap also terminates accidental cycles).
    * @return (id: long, chain: array<long>) — id first, root last.
    */
  def chains(dict: DataFrame, maxDepth: Int = 8): DataFrame = {
    val d = dict.select(col("id").cast("long").as("id"),
      col("parent").cast("long").as("parent"))
    var cur = d.select(col("id"), array(col("id")).as("chain"),
      col("parent").as("next"))
    var level = 1
    while (level < maxDepth) {
      val parents = d.select(col("id").as("p_id"), col("parent").as("p_parent"))
      cur = cur.join(broadcast(parents),
          cur("next") === parents("p_id"), "left")
        .select(col("id"),
          when(col("p_id").isNotNull,
            concat(col("chain"), array(col("p_id"))))
            .otherwise(col("chain")).as("chain"),
          coalesce(col("p_parent"), lit(0L)).as("next"))
      level += 1
    }
    cur.select(col("id"), col("chain"))
  }

  /** dictIsIn: is `ancestor` in `child`'s ancestor chain? Apply over the
    * output of [[chains]]. */
  def isIn(chain: Column, ancestor: Column): Column =
    array_contains(chain, ancestor)
}
