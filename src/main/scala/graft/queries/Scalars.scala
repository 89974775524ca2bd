package graft.queries

import org.apache.spark.sql.functions._

/** Scalar-function surface (daisy: `src/Functions/registerFunctions.cpp`,
  * 411 function files — SURVEY §2.8). Spark's `functions._` covers nearly
  * all of it 1:1; each query here exercises one family end-to-end against
  * the DuckDB oracle. All functions codegen (no UDFs) — every expression
  * stays inside WholeStageCodegen at any scale.
  *
  * Type alignment notes (hard-won, keep in sync with oracles):
  *  - Spark date-part functions return int32, DuckDB's return BIGINT →
  *    cast Spark side to long.
  *  - DuckDB `::BIGINT` on double ROUNDS; Spark cast truncates → always
  *    floor()/round() explicitly before integer casts.
  *  - Spark `datediff(end, start)`; DuckDB `date_diff('day', start, end)`.
  *  - Spark dayofweek: 1=Sunday; DuckDB: 0=Sunday.
  */
object Scalars extends QueryModule {

  def queries: Map[String, Q] = Map(
    // date/time family (toYear/toStartOf*/addDays/dateDiff/formatDateTime).
    "q_func_datetime" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
    }),

    // string family (length/case/trim/pad/position/regexp/split).
    "q_func_string" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        length(col("c_name")).cast("long").as("name_len"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        regexp_replace(col("c_name"), "0+", "#").as("squeezed"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("id_str"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        col("c_name").startsWith("Customer").cast("boolean").as("is_cust"),
        col("c_mktsegment").endsWith("ING").cast("boolean").as("ends_ing"),
        repeat(lit("ab"), 3).as("repeated"))
    }),

    // arithmetic / rounding / math family.
    "q_func_math" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        round(col("l_extendedprice") / 7, 3).as("div_round"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
        round(cbrt(col("l_extendedprice")), 6).as("cbrt_p"),
        round(exp(col("l_discount")), 6).as("exp_d"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(log10(col("l_extendedprice")), 6).as("log10_p"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        (col("l_partkey") % 97).as("mod97"),
        signum(col("l_quantity") - 25).cast("long").as("sgn"),
        round(sin(col("l_quantity")), 6).as("sin_q"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_tax"), col("l_discount")).as("ls"))
    }),

    // conditional family (if/multiIf/nullIf/ifNull/coalesce).
    "q_func_conditional" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big").otherwise("small").as("size_class"),
        when(col("o_orderstatus") === "F", "done")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("partial").as("status_name"),
        nullif(col("o_orderstatus"), lit("P")).as("status_nullable"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("?")).as("status_filled"),
        col("o_orderstatus").isNull.cast("boolean").as("is_null_status"),
        (col("o_totalprice") > 200000 && col("o_orderpriority") === "1-URGENT")
          .cast("boolean").as("hot"))
    }),

    // JSON family over events.props (JSONExtract*): one from_json parse
    // per row materialized as a bound struct column, then plain field
    // reads — the r2 plan re-ran get_json_object (a full parse) 4x/row.
    "q_func_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k STRING, missing STRING")))
        .select(
          col("event_id"),
          col("j.k").as("k_str"),
          col("j.k").cast("long").as("k_int"),
          col("j.missing").as("missing"),
          (col("j.k").cast("long") % 10).as("k_mod"))
    }),

    // hashing / encoding family (md5/sha2/base64/hex).
    "q_func_hash" -> ((s, dir) => {
      t(s, dir, "region").select(
        col("r_regionkey"),
        md5(col("r_name").cast("binary")).as("name_md5"),
        sha2(col("r_name").cast("binary"), 256).as("name_sha256"),
        base64(col("r_name").cast("binary")).as("name_b64"),
        unbase64(base64(col("r_name").cast("binary"))).cast("string").as("b64_roundtrip"),
        lower(hex(col("r_name").cast("binary"))).as("name_hex"))
    }),

    // URL family (protocol/domain/path/queryString/extractURLParameter) —
    // URLs synthesized from columns, parsed with Spark's parse_url.
    "q_func_url" -> ((s, dir) => {
      val url = concat(lit("https://"), lower(col("c_mktsegment")), lit(".example.com/u/"),
        col("c_custkey"), lit("?seg="), col("c_mktsegment"), lit("&id="), col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("PROTOCOL")).as("protocol"),
        parse_url(url, lit("QUERY"), lit("id")).as("id_param"))
    }),

    // array family with higher-order lambdas (arrayMap/Filter/Sum/zip).
    "q_func_array_lambda" -> ((s, dir) => {
      val toks = split(col("p_name"), " ")
      t(s, dir, "part").select(
        col("p_partkey"),
        size(toks).cast("long").as("n_toks"),
        array_join(transform(toks, x => upper(x)), ",").as("upper_toks"),
        size(filter(toks, x => length(x) > 4)).cast("long").as("n_long_toks"),
        exists(toks, x => x === "widget").cast("boolean").as("has_widget"),
        forall(toks, x => length(x) > 1).cast("boolean").as("all_long"),
        aggregate(transform(toks, x => length(x)), lit(0),
          (acc, x) => acc + x).cast("long").as("sum_tok_lens"),
        array_join(sort_array(toks), "|").as("sorted_toks"),
        element_at(toks, 1).as("first_tok"),
        array_join(slice(toks, 1, 1), "").as("sliced"),
        aggregate(zip_with(sequence(lit(1), lit(4)), sequence(lit(2), lit(5)),
          (a, b) => a * b), lit(0L), (acc, x) => acc + x).as("dot_1to4"))
    }),

    // map / tuple family (map/mapKeys/element_at; tuple = struct).
    "q_func_map" -> ((s, dir) => {
      val kv = concat(lit("brand:"), col("p_brand"), lit(",type:"), col("p_type"))
      val m = expr("str_to_map(concat('brand:', p_brand, ',type:', p_type), ',', ':')")
      t(s, dir, "part").select(
        col("p_partkey"),
        element_at(m, "brand").as("brand_val"),
        element_at(m, "type").as("type_val"),
        size(m).cast("long").as("map_size"),
        array_join(map_keys(m), ",").as("keys_joined"),
        struct(col("p_brand").as("b"), col("p_size").as("s")).getField("b").as("tuple_elem"),
        kv.as("raw_kv"))
    }),

    // conversion family (CAST / toDate / parseDateTimeBestEffort-style
    // multi-format parsing via coalesce of try-parses).
    "q_func_convert" -> ((s, dir) => {
      val dateStr = when(col("o_orderkey") % 2 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy"))
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_totalprice").cast("string").as("price_str"),
        col("o_orderkey").cast("double").as("key_dbl"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        col("o_orderkey").cast("string").cast("long").as("roundtrip_key"),
        dateStr.as("date_str"),
        coalesce(
          expr("try_to_date(CASE WHEN o_orderkey % 2 = 0 THEN date_format(o_orderdate, 'yyyy-MM-dd') ELSE date_format(o_orderdate, 'dd/MM/yyyy') END, 'yyyy-MM-dd')"),
          expr("try_to_date(CASE WHEN o_orderkey % 2 = 0 THEN date_format(o_orderdate, 'yyyy-MM-dd') ELSE date_format(o_orderdate, 'dd/MM/yyyy') END, 'dd/MM/yyyy')"))
          .as("best_effort_date"))
    }))

  def oracles: Map[String, String] = Map(
    "q_func_datetime" ->
      """SELECT o_orderkey,
        | year(o_orderdate)::BIGINT AS y,
        | quarter(o_orderdate)::BIGINT AS q,
        | month(o_orderdate)::BIGINT AS m,
        | day(o_orderdate)::BIGINT AS dom,
        | (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | (o_orderdate::DATE + 30)::DATE AS plus30,
        | date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | (epoch_us(o_orderdate) // 1000000) AS epoch_s
        |FROM orders""".stripMargin,

    "q_func_string" ->
      """SELECT c_custkey,
        | length(c_name)::BIGINT AS name_len,
        | upper(c_mktsegment) AS seg_upper,
        | lower(c_name) AS name_lower,
        | substring(c_name, 1, 8) AS name_prefix,
        | concat_ws('|', c_mktsegment, c_name) AS joined,
        | lpad(c_custkey::VARCHAR, 10, '0') AS padded,
        | reverse(c_mktsegment) AS seg_rev,
        | regexp_replace(c_name, '0+', '#', 'g') AS squeezed,
        | regexp_extract(c_name, '([0-9]+)$', 1) AS id_str,
        | strpos(c_name, '#')::BIGINT AS hash_pos,
        | starts_with(c_name, 'Customer') AS is_cust,
        | ends_with(c_mktsegment, 'ING') AS ends_ing,
        | repeat('ab', 3) AS repeated
        |FROM customer""".stripMargin,

    "q_func_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_quantity - 25) AS abs_dev,
        | round(l_extendedprice / 7, 3) AS div_round,
        | floor(l_extendedprice / 1000)::BIGINT AS price_k_floor,
        | ceil(l_extendedprice / 1000)::BIGINT AS price_k_ceil,
        | round(sqrt(l_extendedprice), 6) AS sqrt_p,
        | round(cbrt(l_extendedprice), 6) AS cbrt_p,
        | round(exp(l_discount), 6) AS exp_d,
        | round(ln(l_extendedprice), 6) AS ln_p,
        | round(log10(l_extendedprice), 6) AS log10_p,
        | round(pow(l_quantity, 2), 2) AS qty_sq,
        | l_partkey % 97 AS mod97,
        | sign(l_quantity - 25)::BIGINT AS sgn,
        | round(sin(l_quantity), 6) AS sin_q,
        | greatest(l_quantity, l_discount * 100) AS gr,
        | least(l_tax, l_discount) AS ls
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "q_func_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_class,
        | CASE WHEN o_orderstatus='F' THEN 'done'
        |      WHEN o_orderstatus='O' THEN 'open'
        |      ELSE 'partial' END AS status_name,
        | nullif(o_orderstatus, 'P') AS status_nullable,
        | coalesce(nullif(o_orderstatus, 'P'), '?') AS status_filled,
        | (o_orderstatus IS NULL) AS is_null_status,
        | (o_totalprice > 200000 AND o_orderpriority='1-URGENT') AS hot
        |FROM orders""".stripMargin,

    "q_func_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | json_extract_string(props, '$.k')::BIGINT AS k_int,
        | json_extract_string(props, '$.missing') AS missing,
        | json_extract_string(props, '$.k')::BIGINT % 10 AS k_mod
        |FROM events""".stripMargin,

    "q_func_hash" ->
      """SELECT r_regionkey,
        | md5(r_name) AS name_md5,
        | sha256(r_name) AS name_sha256,
        | to_base64(r_name::BLOB) AS name_b64,
        | from_base64(to_base64(r_name::BLOB))::VARCHAR AS b64_roundtrip,
        | lower(hex(r_name::BLOB)) AS name_hex
        |FROM region""".stripMargin,

    "q_func_url" ->
      """WITH u AS (SELECT c_custkey,
        |  'https://' || lower(c_mktsegment) || '.example.com/u/' || c_custkey ||
        |  '?seg=' || c_mktsegment || '&id=' || c_custkey AS url
        | FROM customer)
        |SELECT c_custkey,
        | regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        | regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        | regexp_extract(url, '\?(.*)$', 1) AS query,
        | regexp_extract(url, '^([a-z]+):', 1) AS protocol,
        | regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
        |FROM u""".stripMargin,

    "q_func_array_lambda" ->
      """WITH p AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
        |SELECT p_partkey,
        | len(toks)::BIGINT AS n_toks,
        | array_to_string(list_transform(toks, x -> upper(x)), ',') AS upper_toks,
        | len(list_filter(toks, x -> length(x) > 4))::BIGINT AS n_long_toks,
        | list_contains(toks, 'widget') AS has_widget,
        | (len(list_filter(toks, x -> length(x) <= 1)) = 0) AS all_long,
        | list_sum(list_transform(toks, x -> length(x)))::BIGINT AS sum_tok_lens,
        | array_to_string(list_sort(toks), '|') AS sorted_toks,
        | toks[1] AS first_tok,
        | array_to_string(toks[1:1], '') AS sliced,
        | (1*2 + 2*3 + 3*4 + 4*5)::BIGINT AS dot_1to4
        |FROM p""".stripMargin,

    "q_func_map" ->
      """SELECT p_partkey,
        | p_brand AS brand_val,
        | p_type AS type_val,
        | 2::BIGINT AS map_size,
        | 'brand,type' AS keys_joined,
        | p_brand AS tuple_elem,
        | concat('brand:', p_brand, ',type:', p_type) AS raw_kv
        |FROM part""".stripMargin,

    "q_func_convert" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |       ELSE strftime(o_orderdate, '%d/%m/%Y') END AS date_str
        | FROM orders)
        |SELECT o_orderkey,
        | o_totalprice::VARCHAR AS price_str,
        | o_orderkey::DOUBLE AS key_dbl,
        | floor(o_totalprice)::BIGINT AS price_floor,
        | (o_orderkey::VARCHAR)::BIGINT AS roundtrip_key,
        | date_str,
        | coalesce(try_strptime(date_str, '%Y-%m-%d'),
        |          try_strptime(date_str, '%d/%m/%Y'))::DATE AS best_effort_date
        |FROM o""".stripMargin)
}
