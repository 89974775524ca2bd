package graft.queries

import org.apache.spark.sql.functions._

/** Join surface — reference kinds/strictness: Inner/Left/Right/Full/Cross ×
  * All/Any/Semi/Anti (daisy: `src/Parsers/ASTTablesInSelectQuery.h:75-95`,
  * hash impl `src/Interpreters/HashJoin.cpp`, sort-merge
  * `src/Interpreters/MergeJoin.cpp`). Spark covers every kind natively and
  * picks broadcast-hash vs shuffled sort-merge itself (AQE = the
  * reference's JoinSwitcher). We add explicit `broadcast()` hints on
  * dimension tables — at 100 TB the fact side never shuffles for those.
  * ASOF strictness lives in graft.operators.AsofJoin.
  */
object Joins extends QueryModule {

  def queries: Map[String, Q] = Map(
    // Bucketed co-located fact-fact join (daisy co-partitioned shards:
    // both tables sharded on the same key join locally —
    // `StorageDistributedMergeTree.cpp` buildShardingKeyExpression).
    // Spark analogue: both sides bucketed+sorted on the join key, so the
    // SortMergeJoin needs NO exchange and NO sort — the scan IS the join
    // layout. PlanSpec asserts the shuffle-free plan; at 100 TB this is
    // the difference between joining in place and moving both tables.
    "q_join_bucketed" -> ((s, dir) => {
      val db = "bkt_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      // build the bucketed layout once per session+dir (re-runs measure
      // the JOIN, not the one-time layout write — same as any bucketed
      // warehouse table)
      if (!s.catalog.tableExists(s"$db.l_bkt")) {
        // clear stale locations: a fresh session's in-memory catalog
        // doesn't know tables a previous JVM left in the warehouse dir
        Seq("l_bkt", "o_bkt").foreach { tn =>
          val wh = s.conf.get("spark.sql.warehouse.dir")
          val p = new org.apache.hadoop.fs.Path(s"$wh/$db.db/$tn")
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
          .write.mode("overwrite").bucketBy(8, "l_orderkey")
          .sortBy("l_orderkey").saveAsTable(s"$db.l_bkt")
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").bucketBy(8, "o_orderkey")
          .sortBy("o_orderkey").saveAsTable(s"$db.o_bkt")
      }
      // MERGE hint: at toy scale the small side would auto-broadcast and
      // hide the co-located plan this operator exists to produce
      s.table(s"$db.l_bkt").hint("merge")
        .join(s.table(s"$db.o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // inner equi-join fact×dim, broadcast hint (GLOBAL JOIN analogue).
    "q_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // 5-way star join (TPC-H Q5 shape): lineitem⋈supplier⋈nation⋈region +
    // orders date filter. Dims broadcast; only lineitem⋈orders shuffles,
    // co-partitioned on orderkey.
    "q_join_multi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // LEFT join preserving unmatched customers (NULL-extension semantics).
    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
    }),

    // FULL OUTER join of two aggregates on nationkey.
    "q_join_full" -> ((s, dir) => {
      val cn = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
                coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // SEMI strictness (IN / EXISTS): customers having an urgent order.
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // ANTI strictness (NOT EXISTS): customers with no orders at all.
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // CROSS join (small×small only — reference rewrites cross→inner when
    // possible; Catalyst does the same).
    "q_join_cross" -> ((s, dir) => {
      val r1 = t(s, dir, "region").select(col("r_name").as("r1"))
      val r2 = t(s, dir, "region").select(col("r_name").as("r2"))
      r1.crossJoin(r2).filter(col("r1") < col("r2"))
    }),

    // ANY strictness (first match, no row multiplication — daisy
    // `ASTTablesInSelectQuery.h:78`): deterministic first = min linenumber
    // row per orderkey, deduped BEFORE the join so the probe side never
    // multiplies (at scale: dedup is a partial-agg, cheaper than join-then-dedup).
    "q_join_any" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val firstLine = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
          .as("fl"))
        .select(col("l_orderkey"), col("fl.l_linenumber").as("first_linenumber"),
                round(col("fl.l_extendedprice"), 2).as("first_price"))
      o.join(firstLine, o("o_orderkey") === firstLine("l_orderkey"))
        .select(col("o_orderkey"), col("first_linenumber"), col("first_price"))
    }),

    // Dictionary join (dictGet — daisy src/Functions/FunctionsExternalDictionaries.h):
    // dimension lookup as broadcast join; the idiomatic Spark replacement
    // for an in-memory key→value dictionary.
    "q_dict_get" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"), "left")
        .select(col("s_suppkey"), col("s_name"),
                coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"))
    }),

    // dictGetHierarchy (daisy FunctionsExternalDictionaries.h:907):
    // ancestor chain per id over a parent-keyed dictionary — walked as
    // one broadcast join per level. 3-level synthetic hierarchy
    // customer(+1000) → nation(+101) → region(+1); chains posexploded
    // to scalar rows (driver compare can't hash arrays).
    "q_dict_hierarchy" -> ((s, dir) => {
      val chains = graft.operators.DictHierarchy.chains(hierDict(s, dir))
      chains.filter(col("id") > lit(1000L) && col("id") <= lit(1020L))
        .select(col("id"), posexplode(col("chain")))
        .select(col("id"), (col("pos") + 1).cast("long").as("level"),
          col("col").as("ancestor"))
    }),

    // dictIsIn (daisy FunctionsExternalDictionaries.h:967): ancestry
    // test over the same chains — customers counted under each region
    // ancestor node.
    "q_dict_isin" -> ((s, dir) => {
      val chains = graft.operators.DictHierarchy.chains(hierDict(s, dir))
      val regionNodes = (1L to 5L).map(lit(_))
      chains.filter(col("id") > lit(1000L))
        .select(col("id"), explode(
          filter(array(regionNodes: _*),
            a => graft.operators.DictHierarchy.isIn(col("chain"), a)))
          .as("region_node"))
        .groupBy(col("region_node"))
        .agg(count(lit(1)).as("n_customers"))
    }))

  /** Parent-keyed dictionary: region roots (parent 0), nations under
    * regions, customers under nations — disjoint id ranges. */
  private def hierDict(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val r = t(s, dir, "region")
      .select((col("r_regionkey") + 1).cast("long").as("id"),
        lit(0L).as("parent"))
    val n = t(s, dir, "nation")
      .select((col("n_nationkey") + 101).cast("long").as("id"),
        (col("n_regionkey") + 1).cast("long").as("parent"))
    val c = t(s, dir, "customer")
      .select((col("c_custkey") + 1001).cast("long").as("id"),
        (col("c_nationkey") + 101).cast("long").as("parent"))
    r.union(n).union(c)
  }

  def oracles: Map[String, String] = Map(
    "q_dict_hierarchy" ->
      """WITH RECURSIVE dict AS (
        |  SELECT (r_regionkey + 1)::BIGINT AS id, 0::BIGINT AS parent FROM region
        |  UNION ALL
        |  SELECT (n_nationkey + 101)::BIGINT, (n_regionkey + 1)::BIGINT FROM nation
        |  UNION ALL
        |  SELECT (c_custkey + 1001)::BIGINT, (c_nationkey + 101)::BIGINT FROM customer
        |),
        |walk AS (
        |  SELECT id AS id, id AS ancestor, parent AS next, 1 AS level
        |  FROM dict WHERE id > 1000 AND id <= 1020
        |  UNION ALL
        |  SELECT w.id, d.id, d.parent, w.level + 1
        |  FROM walk w JOIN dict d ON w.next = d.id
        |)
        |SELECT id, level::BIGINT AS level, ancestor FROM walk""".stripMargin,

    "q_dict_isin" ->
      """SELECT (n_regionkey + 1)::BIGINT AS region_node, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q_join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_multi" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey=o_orderkey
        | JOIN supplier ON l_suppkey=s_suppkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice),0),2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey=o_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q_join_full" ->
      """WITH cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
        | sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM cn FULL JOIN sn ON c_nationkey=s_nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |              AND o_orderpriority='1-URGENT')""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,

    "q_join_cross" ->
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b WHERE a.r_name < b.r_name""".stripMargin,

    "q_join_any" ->
      """WITH r AS (
        | SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        | FROM lineitem)
        |SELECT o_orderkey, l_linenumber AS first_linenumber,
        | round(l_extendedprice,2) AS first_price
        |FROM orders JOIN r ON o_orderkey=l_orderkey WHERE rn=1""".stripMargin,

    "q_dict_get" ->
      """SELECT s_suppkey, s_name, coalesce(n_name,'UNKNOWN') AS nation_name
        |FROM supplier LEFT JOIN nation ON s_nationkey=n_nationkey""".stripMargin)
}
