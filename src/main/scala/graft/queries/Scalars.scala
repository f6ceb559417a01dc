package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Projection / filter / scalar-expression operators (SURVEY §2B B8–B17).
  *
  * These are the 1→1 "bolt" transforms of the reference's dataflow model,
  * expressed declaratively so Catalyst pushes filters and prunes columns
  * into the parquet scan (verified by plan-shape specs). All per-row
  * arithmetic is deterministic across engines; only libm-backed functions
  * (exp/ln/log10) are rounded to 6 dp on both sides.
  */
object Scalars extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B1+B8 scan, projection, rename, computed columns.
    "q_scan_project" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          col("p_retailprice"),
          round(col("p_retailprice") * 0.9, 4).as("discounted"))
        .orderBy("p_partkey")
    }),

    // B9 filter: comparison, boolean ops, IN, BETWEEN, NOT.
    "q_filter_predicates" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(5, 45)
          && col("l_returnflag").isin("A", "N")
          && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && !(col("l_discount") < 0.02))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // B10 conditionals: CASE/WHEN, coalesce, nullif, null-safe equality.
    "q_conditional" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("bucket",
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small"))
        .withColumn("status_np", expr("coalesce(nullif(o_orderstatus, 'P'), '(pending)')"))
        .groupBy("bucket", "status_np")
        .agg(count(lit(1)).as("n"),
          sum(when(expr("nullif(o_orderstatus, 'P') <=> NULL"), 1).otherwise(0)).as("n_nullsafe"))
        .orderBy("bucket", "status_np")
    }),

    // B11 string functions (+ LIKE filter).
    "q_string_funcs" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_name").like("%1%"))
        .select(col("c_custkey"),
          substring(col("c_name"), 1, 10).as("name10"),
          lower(col("c_name")).as("name_lower"),
          length(col("c_name")).as("name_len"),
          concat_ws("-", col("c_mktsegment"), trim(col("c_name"))).as("seg_name"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
          regexp_extract(col("c_name"), "(\\d+)", 1).as("digits"),
          instr(col("c_name"), "8").as("pos8"),
          regexp_replace(col("c_name"), "[aeiou]", "").as("novowels"),
          split(col("c_name"), "#").getItem(0).as("first_part"))
        .orderBy("c_custkey")
    }),

    // B12 math functions (libm-backed ones rounded 6dp both engines).
    "q_math_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price2"),
          abs(col("l_discount") - 0.05).as("disc_abs"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(exp(col("l_discount")), 6).as("disc_exp"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          round(log10(col("l_extendedprice")), 6).as("price_log10"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"),
          signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // B13 date/time functions.
    "q_datetime_funcs" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          to_date(col("o_orderdate")).as("odate"))
        .orderBy("o_orderkey")
    }),

    // B14 casts across the fixture type inventory.
    "q_casts" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_orderkey").cast("double").as("key_dbl"),
          floor(col("l_quantity")).as("qty_int"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_shipdate").cast("date").cast("string").as("ship_date_str"),
          lit("3.14").cast("double").as("pi"),
          col("l_linenumber").cast("long").as("ln_long"))
        .orderBy("l_orderkey", "key_str", "ln_long")
    }),

    // B15 array functions over tokenized documents (scalar projections so
    // the parquet/duckdb compare never hashes raw list cells).
    "q_array_funcs" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          array_contains(toks, "spark").cast("int").as("has_spark"),
          concat_ws(",", slice(sort_array(array_distinct(toks)), 1, 3)).as("first3"),
          toks.getItem(0).as("first_token"))
        .orderBy("doc_id")
    }),

    // B15 higher-order functions: transform / filter / aggregate.
    "q_higher_order" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          aggregate(transform(toks, x => length(x).cast("long")), lit(0L), (acc, x) => acc + x).as("total_chars"),
          size(filter(toks, x => length(x) > 5)).as("n_long"),
          aggregate(toks, lit(0L), (acc, x) => acc + when(x === "spark", 1L).otherwise(0L)).as("n_spark"))
        .orderBy("doc_id")
    }),

    // B11 second string batch: split_part, repeat, reverse, translate,
    // ascii, left/right, locate.
    "q_string_funcs2" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          expr("split_part(p_type, ' ', 1)").as("type_head"),
          repeat(col("p_brand"), 2).as("brand_twice"),
          reverse(col("p_name")).as("name_rev"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_caps_vowels"),
          ascii(col("p_brand")).as("brand_ascii"),
          expr("left(p_name, 5)").as("name_left"),
          expr("right(p_name, 3)").as("name_right"),
          locate("a", col("p_name")).as("first_a"))
        .orderBy("p_partkey")
    }),

    // B12 second math batch: trig on small exact args, greatest/least,
    // cbrt, bit ops.
    "q_math_funcs2" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          round(sin(col("o_orderkey") % 7), 6).as("sin_k"),
          round(cos(col("o_orderkey") % 7), 6).as("cos_k"),
          round(atan2(col("o_orderkey") % 7, lit(2.0)), 6).as("atan2_k"),
          round(degrees(col("o_orderkey") % 7), 6).as("deg_k"),
          round(radians(col("o_orderkey") % 7), 6).as("rad_k"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_100k"),
          least(col("o_totalprice"), lit(100000.0)).as("cap_100k"),
          round(cbrt(col("o_totalprice")), 6).as("price_cbrt"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("k_and"),
          (col("o_orderkey").bitwiseOR(lit(8L))).as("k_or"),
          (col("o_orderkey").bitwiseXOR(lit(129L))).as("k_xor"))
        .orderBy("o_orderkey")
    }),

    // B13 second date batch: quarter, day-of-week (Spark Sunday=1 mapped
    // to DuckDB isodow), ISO week, last_day, add_months, date_format,
    // make_date.
    "q_datetime_funcs2" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow_sun1"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(col("o_orderdate"), 1).as("next_month"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("month_first"))
        .orderBy("o_orderkey")
    }),

    // B10/B14 error-safe ops: try_divide / try_cast (nulls, not failures
    // — DuckDB's plain division and try_cast share the NULL semantics).
    "q_try_ops" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, 0)").as("div_zero"),
          // no rounding: IEEE division of identical operands is already
          // bit-identical across engines, while round() at a half-ulp
          // boundary is not (measured)
          expr("try_divide(l_extendedprice, l_quantity)").as("unit_price"),
          expr("try_cast(l_returnflag AS INT)").as("flag_int"),
          expr("try_cast(cast(l_linenumber AS STRING) AS INT)").as("ln_roundtrip"))
        .orderBy("l_orderkey", "l_linenumber", "unit_price")
    }),

    // B17 JSON extraction from events.props.
    "q_json_events" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg(col("k_val")), 4).as("avg_k"),
          min(col("k_val")).as("min_k"),
          max(col("k_val")).as("max_k"))
        .orderBy("event_type")
    }),

    // B16 map functions: props parsed to a MapType, enriched with
    // map_concat, then exploded to (key, value) rows and aggregated.
    "q_map_funcs" -> ((s, dir) => {
      val pm = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      val full = map_concat(pm, map(
        lit("et"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      Tables.events(s, dir)
        .select(col("event_type"), explode(full))
        .select(col("event_type"), col("key"), col("value").as("val"))
        .groupBy("event_type", "key")
        .agg(count(lit(1)).as("n"),
          min(col("val")).as("min_val"),
          max(col("val")).as("max_val"))
        .orderBy("event_type", "key")
    }),

    // B16 map element access: element_at / map_keys / map_filter.
    "q_map_element" -> ((s, dir) => {
      val pm = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      val full = map_concat(pm, map(
        lit("et"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      Tables.events(s, dir)
        .select(col("event_type"),
          element_at(pm, "k").cast("int").as("kv"),
          size(map_keys(pm)).as("nk"),
          size(map_filter(full, (k, _) => k === lit("uid"))).as("n_uid"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("kv")).as("k_min"),
          max(col("kv")).as("k_max"),
          sum(col("nk")).as("total_keys"),
          sum(col("n_uid")).as("total_uid"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_map_funcs" ->
      """WITH m AS (
        |  SELECT event_type,
        |    unnest(['k','et','uid']) AS key,
        |    unnest([json_extract_string(props,'$.k'), event_type,
        |            CAST(user_id AS VARCHAR)]) AS val
        |  FROM events)
        |SELECT event_type, key, count(*) AS n,
        | min(val) AS min_val, max(val) AS max_val
        |FROM m GROUP BY event_type, key
        |ORDER BY event_type, key""".stripMargin,

    "q_map_element" ->
      """SELECT event_type, count(*) AS n,
        | min(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS k_min,
        | max(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS k_max,
        | CAST(count(*) AS BIGINT) AS total_keys,
        | CAST(count(*) AS BIGINT) AS total_uid
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_scan_project" ->
      """SELECT p_partkey, upper(p_name) AS name_upper, p_retailprice,
        | round(p_retailprice*0.9,4) AS discounted
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_filter_predicates" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),4) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45
        |  AND l_returnflag IN ('A','N')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND NOT (l_discount < 0.02)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_conditional" ->
      """SELECT
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus,'P'), '(pending)') AS status_np,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN nullif(o_orderstatus,'P') IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe
        |FROM orders GROUP BY bucket, status_np ORDER BY bucket, status_np""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        | substring(c_name,1,10) AS name10,
        | lower(c_name) AS name_lower,
        | CAST(length(c_name) AS INTEGER) AS name_len,
        | concat_ws('-', c_mktsegment, trim(c_name)) AS seg_name,
        | lpad(CAST(c_custkey AS VARCHAR),10,'0') AS key_pad,
        | regexp_extract(c_name,'(\d+)',1) AS digits,
        | CAST(instr(c_name,'8') AS INTEGER) AS pos8,
        | regexp_replace(c_name,'[aeiou]','','g') AS novowels,
        | string_split(c_name,'#')[1] AS first_part
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice,2) AS price2,
        | abs(l_discount-0.05) AS disc_abs,
        | l_quantity*l_quantity AS qty_sq,
        | round(sqrt(l_extendedprice),6) AS price_sqrt,
        | round(exp(l_discount),6) AS disc_exp,
        | round(ln(l_extendedprice),6) AS price_ln,
        | round(log10(l_extendedprice),6) AS price_log10,
        | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        | CAST(mod(l_orderkey,7) AS BIGINT) AS key_mod,
        | CAST(sign(l_discount-0.05) AS INTEGER) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | o_orderdate + INTERVAL '30 days' AS plus30,
        | CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | CAST(o_orderdate AS DATE) AS odate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_casts" ->
      """SELECT l_orderkey,
        | CAST(l_orderkey AS VARCHAR) AS key_str,
        | CAST(l_orderkey AS DOUBLE) AS key_dbl,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_int,
        | CAST(l_shipdate AS DATE) AS ship_date,
        | CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str,
        | CAST('3.14' AS DOUBLE) AS pi,
        | CAST(l_linenumber AS BIGINT) AS ln_long
        |FROM lineitem ORDER BY l_orderkey, key_str, ln_long""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_distinct,
        | CAST(list_contains(string_split(text,' '),'spark') AS INTEGER) AS has_spark,
        | array_to_string(list_sort(list_distinct(string_split(text,' ')))[1:3],',') AS first3,
        | string_split(text,' ')[1] AS first_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_higher_order" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(string_split(text,' '), x -> length(x))) AS BIGINT) AS total_chars,
        | CAST(len(list_filter(string_split(text,' '), x -> length(x) > 5)) AS INTEGER) AS n_long,
        | CAST(len(list_filter(string_split(text,' '), x -> x = 'spark')) AS BIGINT) AS n_spark
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_string_funcs2" ->
      """SELECT p_partkey,
        | split_part(p_type,' ',1) AS type_head,
        | repeat(p_brand,2) AS brand_twice,
        | reverse(p_name) AS name_rev,
        | translate(p_name,'aeiou','AEIOU') AS name_caps_vowels,
        | CAST(ascii(p_brand) AS INTEGER) AS brand_ascii,
        | left(p_name,5) AS name_left,
        | right(p_name,3) AS name_right,
        | CAST(position('a' IN p_name) AS INTEGER) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_math_funcs2" ->
      """SELECT o_orderkey,
        | round(sin(o_orderkey % 7),6) AS sin_k,
        | round(cos(o_orderkey % 7),6) AS cos_k,
        | round(atan2(CAST(o_orderkey % 7 AS DOUBLE), 2.0),6) AS atan2_k,
        | round(degrees(o_orderkey % 7),6) AS deg_k,
        | round(radians(o_orderkey % 7),6) AS rad_k,
        | greatest(o_totalprice, 100000.0) AS floor_100k,
        | least(o_totalprice, 100000.0) AS cap_100k,
        | round(cbrt(o_totalprice),6) AS price_cbrt,
        | CAST(o_orderkey & 255 AS BIGINT) AS k_and,
        | CAST(o_orderkey | 8 AS BIGINT) AS k_or,
        | CAST(xor(o_orderkey, 129) AS BIGINT) AS k_xor
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_datetime_funcs2" ->
      """SELECT o_orderkey,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | CAST(isodow(o_orderdate) % 7 + 1 AS INTEGER) AS dow_sun1,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        | last_day(o_orderdate) AS month_end,
        | CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS month_first
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_try_ops" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice / 0 AS div_zero,
        | l_extendedprice / l_quantity AS unit_price,
        | try_cast(l_returnflag AS INTEGER) AS flag_int,
        | try_cast(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, unit_price""".stripMargin,

    "q_json_events" ->
      """SELECT event_type, count(*) AS n,
        | round(avg(CAST(json_extract_string(props,'$.k') AS BIGINT)),4) AS avg_k,
        | min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
