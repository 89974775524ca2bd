package graft.queries

import org.apache.spark.sql.functions._

/** Second tier of the scalar/aggregate surface: numeric array transforms
  * (arrayDifference/arrayCumSum — daisy src/Functions/array/),
  * reference-specific rounding (roundToExp2/roundDuration/roundAge —
  * src/Functions/registerFunctionsRound), IP codecs
  * (IPv4NumToString/StringToNum — src/Functions/FunctionsCoding),
  * readable formatting (formatReadableSize, bar —
  * src/Functions/FunctionsMiscellaneous), LIKE-scan shapes (BASELINE
  * Q13-class), and the -Array/-ForEach/-Resample combinators
  * (registerAggregateFunctions.cpp:122-131).
  */
object MoreFunctions extends QueryModule {

  /** Shared dictionary for q_multi_search_batched — defined ONCE so the
    * Spark query and the DuckDB oracle use identical needles. The
    * per-needle entry count is minLen-1 (only offsets 0..minLen-2 are
    * indexed), so ALL needles are 96 bytes: 89 × 95 = 8455 entries >
    * the 8192 budget → 2 greedy groups (86 + 3). The last needle is a
    * marker the query appends to every 7th document, so the match path
    * runs through the SECOND group while the other 88 junk needles
    * exercise the miss path on every row. */
  private val batchedMarker: String = "customer" * 12
  private val batchedDict: Seq[String] =
    (0 until 88).map(i => (f"zqxjv$i%03dkwpbd" * 8).take(96)) :+ batchedMarker

  def queries: Map[String, Q] = Map(
    // arrayDifference / arrayCumSum / arrayReduce over per-order arrays.
    "q_func_array_numeric" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("arr"))
      base.select(
        col("l_orderkey"),
        array_join(transform(col("arr"), (x, i) =>
          when(i === 0, x).otherwise(x - element_at(col("arr"), i))), ",").as("diffs"),
        array_join(transform(col("arr"), (_, i) =>
          aggregate(slice(col("arr"), lit(1), i + 1), lit(0), (a, b) => a + b)), ",").as("cumsum"),
        aggregate(col("arr"), lit(0L), (a, b) => a + b).as("arr_sum"),
        array_max(col("arr")).cast("long").as("arr_max"),
        size(array_distinct(col("arr"))).cast("long").as("arr_ndistinct"))
    }),

    // arrayAUC (src/Functions/array/arrayAUC.cpp): classifier AUC from a
    // scores array and a 0/1 labels array — the pair-counting
    // formulation (P[score_pos > score_neg] + ½·P[equal]), which is
    // exactly the trapezoidal ROC area the reference computes. Arrays
    // built per user from events; pure HOF arithmetic, order-independent,
    // so collect_list needs no sort.
    "q_func_array_auc" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("user_id") % 5 === 0)
        .groupBy(col("user_id"))
        .agg(
          collect_list(when(col("event_type") === "purchase",
            round(col("value"), 2))).as("pos"),
          collect_list(when(col("event_type") =!= "purchase",
            round(col("value"), 2))).as("neg"))
        .filter(size(col("pos")) > 0 && size(col("neg")) > 0)
      e.select(
        col("user_id"),
        round(
          aggregate(col("pos"), lit(0.0), (acc, p) =>
            acc + size(filter(col("neg"), n => n < p)) +
              lit(0.5) * size(filter(col("neg"), n => n === p))) /
            (size(col("pos")) * size(col("neg"))), 6).as("auc"))
    }),

    // roundToExp2 / roundDuration / roundAge (daisy when-chain semantics).
    "q_func_rounding" -> ((s, dir) => {
      val q = col("l_quantity")
      val sec = col("l_orderkey") % 40000
      t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        when(q >= 1, pow(lit(2.0), floor(log(2.0, q)))).otherwise(0.0)
          .cast("long").as("to_exp2"),
        when(sec < 1, 0L).when(sec < 10, 1L).when(sec < 30, 10L)
          .when(sec < 60, 30L).when(sec < 120, 60L).when(sec < 180, 120L)
          .when(sec < 240, 180L).when(sec < 300, 240L).when(sec < 600, 300L)
          .when(sec < 1200, 600L).when(sec < 1800, 1200L).when(sec < 3600, 1800L)
          .when(sec < 7200, 3600L).when(sec < 18000, 7200L)
          .when(sec < 36000, 18000L).otherwise(36000L).as("round_duration"),
        when(q < 1, 0L).when(q < 18, 17L).when(q < 25, 18L).when(q < 35, 25L)
          .when(q < 45, 35L).when(q < 55, 45L).otherwise(55L).as("round_age"))
    }),

    // IPv4NumToString / IPv4StringToNum roundtrip via bit arithmetic.
    "q_func_ip" -> ((s, dir) => {
      val ipnum = (col("c_custkey") * 2654435761L) % 4294967296L
      val ipstr = concat_ws(".",
        shiftright(ipnum, 24).bitwiseAND(lit(255L)),
        shiftright(ipnum, 16).bitwiseAND(lit(255L)),
        shiftright(ipnum, 8).bitwiseAND(lit(255L)),
        ipnum.bitwiseAND(lit(255L)))
      val parts = split(ipstr, "\\.")
      t(s, dir, "customer").select(
        col("c_custkey"),
        ipnum.as("ip_num"),
        ipstr.as("ip_str"),
        (element_at(parts, 1).cast("long") * 16777216L +
         element_at(parts, 2).cast("long") * 65536L +
         element_at(parts, 3).cast("long") * 256L +
         element_at(parts, 4).cast("long")).as("ip_roundtrip"))
    }),

    // formatReadableSize + bar.
    "q_func_readable" -> ((s, dir) => {
      val x = col("o_totalprice")
      t(s, dir, "orders").filter(col("o_orderkey") % 50 === 0).select(
        col("o_orderkey"),
        when(x >= 1048576, format_string("%.2f MiB", x / 1048576))
          .when(x >= 1024, format_string("%.2f KiB", x / 1024))
          .otherwise(format_string("%.2f B", x)).as("readable"),
        repeat(lit("#"), floor(x / 600000 * 10).cast("int")).as("bar"))
    }),

    // LIKE-scan shapes (BASELINE Q13 class: phrase scans over strings).
    "q_like_scan" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").agg(
        count(when(txt.like("%spark%"), 1)).as("n_spark"),
        count(when(txt.like("%vector%"), 1)).as("n_vector"),
        count(when(txt.like("the %"), 1)).as("n_the_prefix"),
        count(when(!txt.like("%join%"), 1)).as("n_no_join"),
        count(when(txt.rlike("hash (join|scan)"), 1)).as("n_hash_pair"))
    }),

    // multiSearchAny / multiSearchFirstIndex / multiMatchAny (daisy
    // src/Functions/multiSearchAny.cpp, multiSearchFirstIndex.cpp,
    // MultiMatchAnyImpl.h — hyperscan there; here both legs run the
    // one-pass MultiVolnitsky engine: the OR chain folds to
    // MultiSearchAny via the plan rewrite, the first-index leg is the
    // registered multi_search_first_index function, and the fold + the
    // one-pass node are REQUIREd in the optimized plan so the fast path
    // is driver-gated, not just spec-asserted).
    "q_multi_search" -> ((s, dir) => {
      val txt = col("text")
      val needles = Seq("spark", "hash", "vector")
      val any = needles.map(w => txt.contains(w)).reduce(_ || _)
      val q = t(s, dir, "documents").select(
        col("doc_id"),
        any.cast("long").as("ms_any"),
        // coalesce keeps the when-chain's null-text-to-0 collapse (the
        // oracle CASE's ELSE 0); the engine itself is NULL-in-NULL-out
        coalesce(expr(
          "multi_search_first_index(text, array('spark','hash','vector'))"),
          lit(0L)).as("ms_first_index"),
        txt.rlike("spark|hash|vector").cast("long").as("mm_any"))
      val exprsOf = q.queryExecution.optimizedPlan.collect {
        case n => n.expressions.flatMap(_.collect {
          case m: graft.functions.MultiSearchAny => m
          case f: graft.functions.MultiSearchFirstIndex => f
        })
      }.flatten
      require(exprsOf.exists(_.isInstanceOf[graft.functions.MultiSearchAny]),
        "q_multi_search: OR chain did not fold to one-pass MultiSearchAny")
      require(exprsOf.exists(
        _.isInstanceOf[graft.functions.MultiSearchFirstIndex]),
        "q_multi_search: first-index leg is not the one-pass engine")
      q
    }),

    // scalar position fast path (daisy `position`,
    // src/Functions/FunctionsStringSearch.h over PositionImpl.h —
    // Volnitsky when the needle is constant): Spark's instr/locate swap
    // to VolnitskyPosition post-optimizer, REQUIREd in the plan.
    "q_position_scan" -> ((s, dir) => {
      val q = t(s, dir, "documents").select(
        col("doc_id"),
        expr("instr(text, 'spark')").cast("long").as("pos_spark"),
        expr("locate('vector', text)").cast("long").as("pos_vector"))
      val poss = q.queryExecution.optimizedPlan.collect {
        case n => n.expressions.flatMap(_.collect {
          case v: graft.functions.VolnitskyPosition => v
        })
      }.flatten
      require(poss.length >= 2,
        s"q_position_scan: instr/locate did not swap to Volnitsky: $poss")
      q
    }),

    // positionCaseInsensitive (daisy positionCaseInsensitive.cpp over
    // the same PositionImpl/Volnitsky engine): both spellings — the SQL
    // shape locate(c, lower(text)) / instr(lower(text), c) swapped
    // post-optimizer to a raw-column case-variant scan, and the
    // registered position_ci function — REQUIREd in-plan.
    "q_position_ci" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("pci_docs")
      val q = s.sql(
        """SELECT doc_id,
          | CAST(locate('spark', lower(text)) AS BIGINT) AS pos_spark_ci,
          | CAST(instr(lower(text), 'vector') AS BIGINT) AS pos_vector_ci,
          | CAST(position_ci(text, 'HASH') AS BIGINT) AS pos_hash_ci
          |FROM pci_docs""".stripMargin)
      val cis = q.queryExecution.optimizedPlan.collect {
        case n => n.expressions.flatMap(_.collect {
          case v: graft.functions.VolnitskyPositionCI => v
        })
      }.flatten
      require(cis.length >= 3,
        s"q_position_ci: CI position did not swap: $cis")
      q
    }),

    // multiSearchFirstPosition / multiSearchAllPositions (daisy
    // src/Functions/multiSearchFirstPosition.cpp,
    // multiSearchAllPositions.cpp — one MultiVolnitsky pass for k
    // needles instead of k scans), REQUIREd in the plan. The all-
    // positions array is projected to one BIGINT column per needle:
    // the gate's comparator canonicalizes rows by sorting and cannot
    // hash array cells (r16 verdict Wrong #1); the engine expression —
    // ONE MultiSearchAllPositions pass — is unchanged underneath
    // (CollapseProject keeps the single evaluation: a non-cheap alias
    // referenced three times is not inlined).
    "q_multi_search_positions" -> ((s, dir) => {
      val q = t(s, dir, "documents").select(
        col("doc_id"),
        expr("multi_search_first_position(text, " +
          "array('spark','hash','vector'))").as("ms_first_pos"),
        expr("multi_search_all_positions(text, " +
          "array('spark','hash','vector'))").as("ms_all_pos"))
        .select(col("doc_id"), col("ms_first_pos"),
          element_at(col("ms_all_pos"), 1).as("ms_pos_spark"),
          element_at(col("ms_all_pos"), 2).as("ms_pos_hash"),
          element_at(col("ms_all_pos"), 3).as("ms_pos_vector"))
      val ops = q.queryExecution.optimizedPlan.collect {
        case n => n.expressions.flatMap(_.collect {
          case e: graft.functions.MultiSearchFirstPosition => e: Any
          case e: graft.functions.MultiSearchAllPositions => e: Any
        })
      }.flatten
      require(ops.exists(_.isInstanceOf[graft.functions.MultiSearchFirstPosition]),
        "q_multi_search_positions: first-position leg is not one-pass")
      require(ops.exists(_.isInstanceOf[graft.functions.MultiSearchAllPositions]),
        "q_multi_search_positions: all-positions leg is not one-pass")
      q
    }),

    // CI variants of the position multis (daisy
    // multiSearchFirstIndex/FirstPosition/AllPositionsCaseInsensitive
    // .cpp — the case-variant bigram table over the same engines):
    // mixed-case needles fold to the raw-column CI scan, REQUIREd
    // in-plan with ci = true on all three.
    "q_multi_search_ci" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("msci_docs")
      // per-needle scalar projection of the all-positions array: same
      // one-pass engine expression, gate-comparable output (r16 verdict
      // Wrong #1 — array cells crash the driver's row canonicalizer)
      val q = s.sql(
        """SELECT doc_id, ms_fi_ci, ms_fp_ci,
          | element_at(ms_ap_ci, 1) AS ms_ap_spark_ci,
          | element_at(ms_ap_ci, 2) AS ms_ap_hash_ci
          |FROM (SELECT doc_id,
          | CAST(multi_search_first_index_ci(text,
          |   array('SPARK','Hash')) AS BIGINT) AS ms_fi_ci,
          | CAST(multi_search_first_position_ci(text,
          |   array('SPARK','Hash')) AS BIGINT) AS ms_fp_ci,
          | multi_search_all_positions_ci(text,
          |   array('SPARK','Hash')) AS ms_ap_ci
          |FROM msci_docs)""".stripMargin)
      val ops = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case e: graft.functions.MultiSearchFirstIndex if e.ci => e: Any
          case e: graft.functions.MultiSearchFirstPosition if e.ci => e: Any
          case e: graft.functions.MultiSearchAllPositions if e.ci => e: Any
        })
      }.flatten
      require(ops.size == 3,
        s"q_multi_search_ci: CI engines not routed: $ops")
      q
    }),

    // BATCHED multiSearchAny (daisy hasMoreToSearch, Volnitsky.h:
    // MultiVolnitskyBase packs needle sets past one table's bigram
    // budget into sequential within-budget searchers): an 89-needle
    // dictionary of 96-byte terms inserts 89x95 = 8455 > 8192 entries,
    // forcing 2 greedy groups. The last needle (group 2) is a marker
    // appended to every 7th document, so both the match path (through
    // the second searcher) and the miss path execute on real rows.
    // Oracle = the OR/CASE of contains over the same haystack.
    "q_multi_search_batched" -> ((s, dir) => {
      val dict = batchedDict
      val arr = dict.map(n => s"'$n'").mkString(",")
      t(s, dir, "documents").createOrReplaceTempView("msb_docs")
      val q = s.sql(
        s"""SELECT doc_id,
           | CAST(multi_search_any(h, array($arr)) AS BIGINT) AS ms_any,
           | coalesce(multi_search_first_index(h, array($arr)), 0)
           |   AS ms_first_index
           |FROM (SELECT doc_id,
           |  CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '$batchedMarker'
           |       ELSE text END AS h FROM msb_docs)""".stripMargin)
      val engines = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case m: graft.functions.MultiSearchAny => m: Any
          case f: graft.functions.MultiSearchFirstIndex => f: Any
        })
      }.flatten
      require(engines.size == 2,
        s"q_multi_search_batched: engines not routed: $engines")
      // the dictionary must genuinely exceed ONE table's budget
      require(!graft.functions.MultiVolnitskySearcher.fits(
        dict.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        "q_multi_search_batched: dictionary fits one table — not batched")
      q
    }),

    // countSubstrings family (daisy countSubstrings.cpp /
    // countSubstringsCaseInsensitive.cpp over CountSubstringsImpl.h):
    // NON-overlapping counts — engine path ('table', 5 bytes), short-
    // needle replace-arithmetic path ('a', 'aa' — also pins the
    // intersecting-substrings-counted-once semantics), and the CI
    // engine on the raw column ('TABle' lowered). Engines REQUIREd.
    "q_count_substrings" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("cs_docs")
      val q = s.sql(
        """SELECT doc_id,
          | count_substrings(text, 'table') AS n_table,
          | count_substrings(text, 'a') AS n_a_short,
          | count_substrings(text, 'aa') AS n_aa,
          | count_substrings_ci(text, 'TABle') AS n_table_ci
          |FROM cs_docs""".stripMargin)
      val engines = q.queryExecution.analyzed.expressions.flatMap(_.collect {
        case e: graft.functions.CountSubstrings => e: Any
        case e: graft.functions.CountSubstringsCI => e: Any
      })
      require(engines.size == 2,
        s"q_count_substrings: engine not routed: $engines")
      q
    }),

    // countMatches (daisy src/Functions/countMatches.cpp over
    // countMatches.h — number of non-overlapping regex matches): maps
    // 1:1 onto Spark's codegen'd built-in regexp_count; both engines
    // count leftmost non-overlapping matches, so no custom expression
    // is warranted (SURVEY §2.9 preference (a): compose existing ops).
    "q_count_matches" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("cm_docs")
      s.sql(
        """SELECT doc_id,
          | CAST(regexp_count(text, 'ta[bg]le') AS BIGINT) AS n_table_re,
          | CAST(regexp_count(text, '(?:scan|merge)') AS BIGINT)
          |   AS n_scanmerge,
          | CAST(regexp_count(text, 'a+') AS BIGINT) AS n_aruns
          |FROM cm_docs""".stripMargin)
    }),

    // hasToken family (daisy hasToken.cpp over HasTokenImpl.h +
    // StringSearcher.h TokenSearcher): needle delimited by ASCII
    // non-alnum bytes or edges. 'table' occurs as a token; 'tabl' only
    // as a substring prefix (tests the boundary reject); 'ab' takes the
    // short-needle naive path; CI folds ASCII case. Engines REQUIREd.
    "q_has_token" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("ht_docs")
      val q = s.sql(
        """SELECT doc_id,
          | CAST(has_token(text, 'table') AS BIGINT) AS t_table,
          | CAST(has_token(text, 'tabl') AS BIGINT) AS t_tabl,
          | CAST(has_token(text, 'ab') AS BIGINT) AS t_ab,
          | CAST(has_token_ci(text, 'TABLE') AS BIGINT) AS t_table_ci
          |FROM ht_docs""".stripMargin)
      val engines = q.queryExecution.analyzed.expressions.flatMap(_.collect {
        case e: graft.functions.HasToken => e
      })
      require(engines.size == 4,
        s"q_has_token: engine not routed: $engines")
      q
    }),

    // ILIKE scan shapes (daisy positionCaseInsensitive /
    // multiSearchAnyCaseInsensitive, src/Common/Volnitsky.h:63 — the
    // ASCII case-variant bigram tier): Spark simplifies ILIKE '%x%' to
    // Contains(Lower(col), x); the rewrite swaps that to a raw-column
    // case-insensitive Volnitsky scan, REQUIREd in the plan.
    "q_ilike_scan" -> ((s, dir) => {
      val q = t(s, dir, "documents").agg(
        count(when(expr("text ILIKE '%SPark%'"), 1)).as("n_spark_ci"),
        count(when(expr("text ILIKE '%VECTOR%'"), 1)).as("n_vector_ci"),
        count(when(expr("multi_search_any_ci(text, array('HASH', 'Join'))"), 1))
          .as("n_multi_ci"),
        count(when(!expr("text ILIKE '%JOIN%'"), 1)).as("n_no_join_ci"))
      val cis = q.queryExecution.optimizedPlan.collect {
        case n => n.expressions.flatMap(_.collect {
          case v: graft.functions.VolnitskyContainsCI => v
          case m: graft.functions.MultiSearchAnyCI => m
        })
      }.flatten
      require(cis.count(_.isInstanceOf[graft.functions.VolnitskyContainsCI]) >= 3,
        s"q_ilike_scan: ILIKE legs did not swap to the CI scan: $cis")
      require(cis.exists(_.isInstanceOf[graft.functions.MultiSearchAnyCI]),
        "q_ilike_scan: multi_search_any_ci is not the one-pass CI engine")
      q
    }),

    // Multi-fragment LIKE / literal-regex prefilter (daisy extracts
    // required_substring from every LIKE/match pattern and
    // Volnitsky-scans it before the automaton,
    // src/Functions/MatchImpl.h:101-146): each conjunct gets a
    // prepended VolnitskyContains of its longest required fragment
    // ('hash' for '%hash%join%', 'hash ' for the regex, CI 'hash' for
    // the ILIKE), REQUIREd in the Filter, result hash vs DuckDB.
    "q_like_multifragment" -> ((s, dir) => {
      val txt = col("text")
      val q = t(s, dir, "documents")
        .filter(txt.like("%hash%join%") && txt.rlike("hash (join|scan)") &&
          expr("text ILIKE '%Hash%SCan%'"))
        .select(col("doc_id"))
      val conds = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
      val pres = conds.flatMap(_.collect {
        case v: graft.functions.VolnitskyContains => v
        case c: graft.functions.VolnitskyContainsCI => c
      })
      require(pres.count(_.isInstanceOf[graft.functions.VolnitskyContains]) >= 2,
        s"q_like_multifragment: LIKE/regex fragment prefilters missing: $conds")
      require(pres.exists(_.isInstanceOf[graft.functions.VolnitskyContainsCI]),
        s"q_like_multifragment: ILIKE fragment prefilter missing: $conds")
      q
    }),

    // ngramDistance (daisy src/Functions/FunctionsStringSimilarity.cpp) —
    // distinct-char-3-gram Jaccard distance, pure Column expressions.
    "q_ngram_dist" -> ((s, dir) => {
      def grams(c: org.apache.spark.sql.Column) =
        when(length(c) >= 3,
          array_distinct(transform(sequence(lit(1), length(c) - 2),
            i => c.substr(i, lit(3)))))
          .otherwise(array())
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), lower(col("n_name")).as("a"), col("n_regionkey"))
      val r = t(s, dir, "region")
        .select(col("r_regionkey"), lower(col("r_name")).as("b"))
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          round(lit(1.0) -
            size(array_intersect(grams(col("a")), grams(col("b")))).cast("double") /
            greatest(size(array_union(grams(col("a")), grams(col("b")))), lit(1)), 4)
            .as("ngram_dist"))
    }),

    // -Array combinator: aggregate over flattened array column.
    "q_agg_sum_array" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), explode(col("embedding")).as("v"))
        .groupBy(col("label"))
        .agg(round(sum(col("v")), 4).as("sum_all_dims"),
             count(lit(1)).as("n_values"))
    }),

    // boundingRatio (reference AggregateFunctionBoundingRatio.h: slope
    // between the leftmost and rightmost (x, y) points) — pure
    // min_by/max_by composition, no custom state.
    "q_agg_bounding_ratio" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(
          (max_by(col("o_totalprice"), col("o_orderkey")) -
            min_by(col("o_totalprice"), col("o_orderkey"))) /
            (max(col("o_orderkey")) - min(col("o_orderkey"))), 6)
          .as("bounding_ratio"),
          count(lit(1)).as("n"))
    }),

    // groupArrayInsertAt (reference AggregateFunctionGroupArrayInsertAt
    // .h: build an array with each value placed at its position,
    // default-filled gaps): per-position aggregation → map → dense
    // array assembly with transform(sequence), posexploded for the gate.
    "q_agg_insert_at" -> ((s, dir) => {
      val perPos = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(round(sum(col("l_quantity")), 2).as("v"))
      perPos.groupBy(col("l_returnflag"))
        .agg(map_from_entries(collect_list(
          struct(col("l_linenumber"), col("v")))).as("m"))
        .select(col("l_returnflag"),
          transform(sequence(lit(0), lit(7)),
            p => coalesce(element_at(col("m"), p), lit(0.0))).as("arr"))
        .select(col("l_returnflag"), posexplode(col("arr")))
        .select(col("l_returnflag"), col("pos").cast("long").as("pos"),
          col("col").as("v"))
    }),

    // sumMap/minMap/maxMap (reference AggregateFunctionSumMap.h — merge
    // maps per group, summing/min-ing/max-ing values per key, keys
    // sorted): explode → re-aggregate per (group, key) → sorted map
    // re-assembly with array_sort(collect_list(struct)), posexploded to
    // scalar rows for the gate (the assembly itself runs in the plan).
    "q_agg_summap" -> ((s, dir) => {
      val perKey = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(round(sum(col("l_quantity")), 2).as("vsum"),
          min(col("l_quantity")).as("vmin"),
          max(col("l_quantity")).as("vmax"))
      perKey.groupBy(col("l_returnflag"))
        .agg(array_sort(collect_list(struct(
          col("l_linenumber").as("k"), col("vsum"),
          col("vmin"), col("vmax")))).as("entries"))
        .select(col("l_returnflag"), posexplode(col("entries")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("pos"),
          col("col.k").as("k"), col("col.vsum").as("vsum"),
          col("col.vmin").as("vmin"), col("col.vmax").as("vmax"))
    }),

    // -ForEach combinator: element-wise aggregation across array columns.
    "q_agg_foreach" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(slice(col("embedding"), 1, 4)))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
        .agg(round(sum(col("col")), 4).as("s"))
    }),

    // -Resample combinator: bucketed aggregation over a key range.
    "q_agg_resample" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(floor(col("c_custkey") / 500).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
             round(avg(col("c_acctbal")), 4).as("avg_bal"))
    }))

  def oracles: Map[String, String] = Map(
    "q_func_array_auc" ->
      """WITH e AS (
        |  SELECT user_id,
        |    list(round(value, 2)) FILTER (WHERE event_type = 'purchase') AS pos,
        |    list(round(value, 2)) FILTER (WHERE event_type <> 'purchase') AS neg
        |  FROM events WHERE user_id % 5 = 0 GROUP BY user_id)
        |SELECT user_id,
        |  round(list_sum(list_transform(pos, p ->
        |      len(list_filter(neg, n -> n < p))
        |      + 0.5 * len(list_filter(neg, n -> n = p))))
        |    / (len(pos) * len(neg)), 6) AS auc
        |FROM e WHERE len(pos) > 0 AND len(neg) > 0""".stripMargin,

    "q_func_array_numeric" ->
      """WITH base AS (
        | SELECT l_orderkey, list_sort(list(l_quantity::INT)) AS arr
        | FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        | array_to_string(list_transform(arr, (x, i) ->
        |   CASE WHEN i = 1 THEN x ELSE x - arr[i-1] END), ',') AS diffs,
        | array_to_string(list_transform(arr, (x, i) ->
        |   list_sum(arr[1:i])::INT), ',') AS cumsum,
        | list_sum(arr)::BIGINT AS arr_sum,
        | list_max(arr)::BIGINT AS arr_max,
        | len(list_distinct(arr))::BIGINT AS arr_ndistinct
        |FROM base""".stripMargin,

    "q_func_rounding" ->
      """SELECT l_orderkey, l_linenumber,
        | (CASE WHEN l_quantity >= 1 THEN pow(2, floor(log2(l_quantity))) ELSE 0 END)::BIGINT AS to_exp2,
        | (CASE WHEN l_orderkey % 40000 < 1 THEN 0 WHEN l_orderkey % 40000 < 10 THEN 1
        |   WHEN l_orderkey % 40000 < 30 THEN 10 WHEN l_orderkey % 40000 < 60 THEN 30
        |   WHEN l_orderkey % 40000 < 120 THEN 60 WHEN l_orderkey % 40000 < 180 THEN 120
        |   WHEN l_orderkey % 40000 < 240 THEN 180 WHEN l_orderkey % 40000 < 300 THEN 240
        |   WHEN l_orderkey % 40000 < 600 THEN 300 WHEN l_orderkey % 40000 < 1200 THEN 600
        |   WHEN l_orderkey % 40000 < 1800 THEN 1200 WHEN l_orderkey % 40000 < 3600 THEN 1800
        |   WHEN l_orderkey % 40000 < 7200 THEN 3600 WHEN l_orderkey % 40000 < 18000 THEN 7200
        |   WHEN l_orderkey % 40000 < 36000 THEN 18000 ELSE 36000 END)::BIGINT AS round_duration,
        | (CASE WHEN l_quantity < 1 THEN 0 WHEN l_quantity < 18 THEN 17
        |   WHEN l_quantity < 25 THEN 18 WHEN l_quantity < 35 THEN 25
        |   WHEN l_quantity < 45 THEN 35 WHEN l_quantity < 55 THEN 45
        |   ELSE 55 END)::BIGINT AS round_age
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "q_func_ip" ->
      """WITH c AS (SELECT c_custkey,
        |  (c_custkey * 2654435761) % 4294967296 AS ip_num FROM customer),
        |s AS (SELECT c_custkey, ip_num,
        |  ((ip_num >> 24) & 255) || '.' || ((ip_num >> 16) & 255) || '.' ||
        |  ((ip_num >> 8) & 255) || '.' || (ip_num & 255) AS ip_str FROM c)
        |SELECT c_custkey, ip_num, ip_str,
        | string_split(ip_str, '.')[1]::BIGINT * 16777216 +
        | string_split(ip_str, '.')[2]::BIGINT * 65536 +
        | string_split(ip_str, '.')[3]::BIGINT * 256 +
        | string_split(ip_str, '.')[4]::BIGINT AS ip_roundtrip
        |FROM s""".stripMargin,

    "q_func_readable" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice >= 1048576 THEN printf('%.2f MiB', o_totalprice / 1048576)
        |      WHEN o_totalprice >= 1024 THEN printf('%.2f KiB', o_totalprice / 1024)
        |      ELSE printf('%.2f B', o_totalprice) END AS readable,
        | repeat('#', floor(o_totalprice / 600000 * 10)::INT) AS bar
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin,

    "q_like_scan" ->
      """SELECT
        | count(CASE WHEN text LIKE '%spark%' THEN 1 END) AS n_spark,
        | count(CASE WHEN text LIKE '%vector%' THEN 1 END) AS n_vector,
        | count(CASE WHEN text LIKE 'the %' THEN 1 END) AS n_the_prefix,
        | count(CASE WHEN text NOT LIKE '%join%' THEN 1 END) AS n_no_join,
        | count(CASE WHEN regexp_matches(text, 'hash (join|scan)') THEN 1 END) AS n_hash_pair
        |FROM documents""".stripMargin,

    "q_multi_search" ->
      """SELECT doc_id,
        | (contains(text,'spark') OR contains(text,'hash') OR contains(text,'vector'))::BIGINT AS ms_any,
        | (CASE WHEN contains(text,'spark') THEN 1
        |       WHEN contains(text,'hash') THEN 2
        |       WHEN contains(text,'vector') THEN 3 ELSE 0 END)::BIGINT AS ms_first_index,
        | regexp_matches(text, 'spark|hash|vector')::BIGINT AS mm_any
        |FROM documents""".stripMargin,

    "q_position_scan" ->
      """SELECT doc_id,
        | strpos(text, 'spark')::BIGINT AS pos_spark,
        | strpos(text, 'vector')::BIGINT AS pos_vector
        |FROM documents""".stripMargin,

    "q_position_ci" ->
      """SELECT doc_id,
        | strpos(lower(text), 'spark')::BIGINT AS pos_spark_ci,
        | strpos(lower(text), 'vector')::BIGINT AS pos_vector_ci,
        | strpos(lower(text), 'hash')::BIGINT AS pos_hash_ci
        |FROM documents""".stripMargin,

    "q_multi_search_positions" ->
      """SELECT doc_id,
        | coalesce(least(nullif(strpos(text,'spark'),0),
        |   nullif(strpos(text,'hash'),0),
        |   nullif(strpos(text,'vector'),0)), 0)::BIGINT AS ms_first_pos,
        | strpos(text,'spark')::BIGINT AS ms_pos_spark,
        | strpos(text,'hash')::BIGINT AS ms_pos_hash,
        | strpos(text,'vector')::BIGINT AS ms_pos_vector
        |FROM documents""".stripMargin,

    "q_multi_search_ci" ->
      """SELECT doc_id,
        | (CASE WHEN contains(lower(text),'spark') THEN 1
        |       WHEN contains(lower(text),'hash') THEN 2
        |       ELSE 0 END)::BIGINT AS ms_fi_ci,
        | coalesce(least(nullif(strpos(lower(text),'spark'),0),
        |   nullif(strpos(lower(text),'hash'),0)), 0)::BIGINT AS ms_fp_ci,
        | strpos(lower(text),'spark')::BIGINT AS ms_ap_spark_ci,
        | strpos(lower(text),'hash')::BIGINT AS ms_ap_hash_ci
        |FROM documents""".stripMargin,

    "q_multi_search_batched" -> {
      val anyOr = batchedDict
        .map(n => s"contains(h,'$n')").mkString(" OR ")
      val firstIdx = batchedDict.zipWithIndex
        .map { case (n, i) => s"WHEN contains(h,'$n') THEN ${i + 1}" }
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""SELECT doc_id, ($anyOr)::BIGINT AS ms_any,
         | ($firstIdx)::BIGINT AS ms_first_index
         |FROM (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '$batchedMarker'
         |       ELSE text END AS h FROM documents)""".stripMargin
    },

    "q_count_substrings" ->
      """SELECT doc_id,
        | CAST((length(text) - length(replace(text,'table','')))//5 AS BIGINT)
        |   AS n_table,
        | CAST((length(text) - length(replace(text,'a','')))//1 AS BIGINT)
        |   AS n_a_short,
        | CAST((length(text) - length(replace(text,'aa','')))//2 AS BIGINT)
        |   AS n_aa,
        | CAST((length(lower(text)) -
        |       length(replace(lower(text),'table','')))//5 AS BIGINT)
        |   AS n_table_ci
        |FROM documents""".stripMargin,

    "q_count_matches" ->
      """SELECT doc_id,
        | CAST(length(regexp_extract_all(text, 'ta[bg]le')) AS BIGINT)
        |   AS n_table_re,
        | CAST(length(regexp_extract_all(text, '(?:scan|merge)')) AS BIGINT)
        |   AS n_scanmerge,
        | CAST(length(regexp_extract_all(text, 'a+')) AS BIGINT) AS n_aruns
        |FROM documents""".stripMargin,

    "q_has_token" ->
      """SELECT doc_id,
        | regexp_matches(text,
        |   '(^|[^a-zA-Z0-9])table([^a-zA-Z0-9]|$)')::BIGINT AS t_table,
        | regexp_matches(text,
        |   '(^|[^a-zA-Z0-9])tabl([^a-zA-Z0-9]|$)')::BIGINT AS t_tabl,
        | regexp_matches(text,
        |   '(^|[^a-zA-Z0-9])ab([^a-zA-Z0-9]|$)')::BIGINT AS t_ab,
        | regexp_matches(lower(text),
        |   '(^|[^a-zA-Z0-9])table([^a-zA-Z0-9]|$)')::BIGINT AS t_table_ci
        |FROM documents""".stripMargin,

    "q_ilike_scan" ->
      """SELECT
        | count(CASE WHEN text ILIKE '%SPark%' THEN 1 END) AS n_spark_ci,
        | count(CASE WHEN text ILIKE '%VECTOR%' THEN 1 END) AS n_vector_ci,
        | count(CASE WHEN contains(lower(text),'hash') OR contains(lower(text),'join') THEN 1 END) AS n_multi_ci,
        | count(CASE WHEN text NOT ILIKE '%JOIN%' THEN 1 END) AS n_no_join_ci
        |FROM documents""".stripMargin,

    "q_like_multifragment" ->
      """SELECT doc_id FROM documents
        |WHERE text LIKE '%hash%join%'
        |  AND regexp_matches(text, 'hash (join|scan)')
        |  AND text ILIKE '%Hash%SCan%'""".stripMargin,

    "q_ngram_dist" ->
      """WITH g AS (SELECT n_nationkey, n_regionkey,
        |  list_distinct(list_transform(range(1, greatest(length(n_name)-2,0)+1),
        |    i -> lower(n_name)[i:i+2])) AS ga
        | FROM nation),
        |gr AS (SELECT r_regionkey,
        |  list_distinct(list_transform(range(1, greatest(length(r_name)-2,0)+1),
        |    i -> lower(r_name)[i:i+2])) AS gb
        | FROM region)
        |SELECT n_nationkey,
        | round(1.0 - len(list_intersect(ga, gb))::DOUBLE /
        |   greatest(len(list_distinct(list_concat(ga, gb))), 1), 4) AS ngram_dist
        |FROM g JOIN gr ON n_regionkey = r_regionkey""".stripMargin,

    "q_agg_sum_array" ->
      """SELECT label, round(sum(v), 4) AS sum_all_dims, count(*) AS n_values
        |FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
        |GROUP BY label""".stripMargin,

    "q_agg_bounding_ratio" ->
      """SELECT o_orderpriority,
        | round((arg_max(o_totalprice, o_orderkey) - arg_min(o_totalprice, o_orderkey))
        |   / (max(o_orderkey) - min(o_orderkey)), 6) AS bounding_ratio,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_agg_insert_at" ->
      """WITH perkey AS (
        |  SELECT l_returnflag, l_linenumber AS pos, round(sum(l_quantity), 2) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT l_returnflag, gs.pos
        |  FROM lineitem, generate_series(0, 7) AS gs(pos))
        |SELECT g.l_returnflag, g.pos, coalesce(p.v, 0) AS v
        |FROM grid g LEFT JOIN perkey p
        |  ON g.l_returnflag = p.l_returnflag AND g.pos = p.pos""".stripMargin,

    "q_agg_summap" ->
      """SELECT l_returnflag,
        | row_number() OVER (PARTITION BY l_returnflag ORDER BY l_linenumber) AS pos,
        | l_linenumber AS k, vsum, vmin, vmax
        |FROM (SELECT l_returnflag, l_linenumber,
        |   round(sum(l_quantity), 2) AS vsum,
        |   min(l_quantity) AS vmin, max(l_quantity) AS vmax
        | FROM lineitem GROUP BY 1, 2)""".stripMargin,

    "q_agg_foreach" ->
      """SELECT label, (u.pos)::BIGINT AS pos, round(sum(u.v), 4) AS s
        |FROM (SELECT label,
        |   unnest(list_transform(embedding[1:4], (x, i) ->
        |     struct_pack(pos := i, v := x))) AS u
        | FROM embeddings)
        |GROUP BY label, u.pos""".stripMargin,

    "q_agg_resample" ->
      """SELECT floor(c_custkey / 500)::BIGINT AS bucket, count(*) AS n,
        | round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer GROUP BY 1""".stripMargin)
}
