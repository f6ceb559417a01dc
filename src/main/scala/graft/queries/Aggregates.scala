package graft.queries

import graft.Q
import graft.io.Tables
import graft.functions.WeightedMean
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY §2B B27–B36).
  *
  * The keyed hash aggregate is the Spark analog of the reference's
  * FieldsGrouping + counting-bolt pattern (Storm model: tuples hash-routed
  * by key to a stateful bolt instance). Spark plans these as partial
  * (map-side) + final HashAggregate around a single key shuffle — the
  * scalable form of the same computation.
  *
  * Oracle-parity rules applied throughout (SURVEY §3.3):
  *  - every DOUBLE aggregate is `round(_, 4)` on BOTH engines (partial-agg
  *    ordering makes low bits nondeterministic);
  *  - BIGINT sums are cast explicitly in the DuckDB SQL (DuckDB widens
  *    integer SUM to HUGEINT, Spark to LONG);
  *  - deterministic total ORDER BY with unique-key tie-breaks.
  */
object Aggregates extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B27 keyed hash agg — TPC-H Q1 shape (also the BENCH headline q_pricing_summary).
    "q_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          // Price-magnitude sums rounded to 2dp: cross-engine partial-sum
          // ordering drifts ~1e-4 absolute at 1e10 magnitudes, which 4dp
          // rounding would expose (SURVEY §3.3 float rule).
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // B28 global agg (GlobalGrouping analog) — no key, single partial→final pass.
    "q_global_agg" -> ((s, dir) => {
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(min(col("o_totalprice")), 4).as("min_price"),
        round(max(col("o_totalprice")), 4).as("max_price"))
    }),

    // B29 distinct agg — BENCH headline q_distinct_users.
    "q_distinct_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // B31 rollup + grouping_id.
    "q_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // B31 cube.
    "q_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // B32 collect_set, order-pinned via sort_array, projected to a string.
    "q_collect_set" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // B32 collect_list pinned to an explicit sequence order (sort structs,
    // then project the field) — the deterministic form of list aggregation.
    "q_collect_ordered" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("o_orderkey"), col("o_orderstatus")))),
            x => x.getField("o_orderstatus"))).as("status_seq"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    }),

    // B32 listagg (Spark 4 WITHIN GROUP syntax) — ordered string aggregation.
    "q_listagg" -> ((s, dir) => {
      graft.io.Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderpriority,
              | listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
              | count(*) AS n
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // B33 statistical aggregates (magnitudes kept small for fp parity;
    // skewness/kurtosis differ in sample-vs-population convention across
    // engines, covered in ScalaTest instead).
    "q_stats_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
        .orderBy("l_returnflag")
    }),

    // B34 min_by / max_by (arg-min/max). The fixture's `value` is
    // 2-decimal and ties heavily at sf0.1, so the comparison key embeds
    // event_id as a tie-break: round(value*100)*1e7 + event_id is exact
    // in double (< 2^53) and strictly monotonic in (value, event_id).
    "q_minmax_by" -> ((s, dir) => {
      val tieKey = round(col("value") * 100) * 10000000L + col("event_id")
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), tieKey).as("top_event"),
          min_by(col("event_id"), tieKey).as("bottom_event"),
          round(max(col("value")), 4).as("max_value"),
          round(min(col("value")), 4).as("min_value"))
        .orderBy("event_type")
    }),

    // B35 custom typed UDAF with algebraic oracle expansion.
    "q_weighted_avg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(WeightedMean(col("l_extendedprice"), col("l_quantity")), 2).as("w_avg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // B30 approx distinct (HLL) — no exact oracle by design; the driver
    // records rows-only and AggregatesSpec bounds it against the exact count.
    "q_approx_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Mergeable HLL sketches — the sketch lifecycle that matters at
    // 100 TB: build a sketch per source partition (here: per `source`),
    // then MERGE the fixed-size sketches instead of re-scanning the
    // data (hll_union_agg). Rows-only (approx by nature); StatSpec
    // bounds the union estimate against the exact distinct count.
    "q_hll_union" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(hll_sketch_agg(col("doc_id")).as("sk"),
          countDistinct(col("doc_id")).as("exact"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"),
          sum(col("exact")).as("exact_total"),
          count(lit(1)).as("n_sources"))
    }),

    // Mergeable quantile sketch (deterministic KLL-style compactor
    // stack, functions/QuantileSketch.scala) — the third mergeable
    // sketch family after HLL (distincts) and approx_top_k (heavy
    // hitters): per-group sketches accumulate map-side and MERGE at the
    // exchange, so the shuffle carries O(k log n) state, never values.
    // Harness shape: exact percentiles as scalar columns (oracled
    // against DuckDB quantile_cont) and the sketch answers verified
    // in-query against a ±5%-rank exact band (the sketch's pinned
    // bound is ≤1.5%, QuantileSpec) so the booleans oracle as TRUE —
    // the whole row hashes, no array columns for the comparator.
    "q_quantile_sketch" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          graft.functions.QuantileAgg(
            col("l_extendedprice"), Seq(0.5, 0.95)).as("aq"),
          expr("percentile(l_extendedprice, array(0.45, 0.5, 0.55, 0.90, 0.95, 1.0))").as("ex"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          round(element_at(col("ex"), 2), 4).as("q50_exact"),
          round(element_at(col("ex"), 5), 4).as("q95_exact"),
          (element_at(col("aq"), 1) >= element_at(col("ex"), 1) &&
            element_at(col("aq"), 1) <= element_at(col("ex"), 3)).as("q50_in_bounds"),
          (element_at(col("aq"), 2) >= element_at(col("ex"), 4) &&
            element_at(col("aq"), 2) <= element_at(col("ex"), 6)).as("q95_in_bounds"),
          col("n"))
        .orderBy("l_returnflag")
    }),

    // Incremental view maintenance: yesterday's stored PARTIAL
    // aggregates merge with today's delta instead of re-scanning
    // history — the pattern that turns an O(history) daily job into
    // O(delta). Algebraic aggregates (count/sum) merge exactly, so the
    // oracle is the full recompute.
    "q_incremental_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cutoff = "2024-01-15"
      // "stored" partials over history; in production these are read
      // back from the previous run's sink, not recomputed
      val base = ev.filter(col("ts") < cutoff).groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      val delta = ev.filter(col("ts") >= cutoff).groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      base.unionByName(delta).groupBy("event_type")
        .agg(sum(col("n")).as("n"), round(sum(col("s")), 4).as("sum_value"))
        .orderBy("event_type")
    }),

    // Frequent-items sketch (approx_top_k): heavy-hitter detection in
    // one pass, mergeable like the HLL above. With 5 distinct types the
    // sketch tracks every item exactly, so — unusually for a sketch —
    // the oracle is the exact top-3; StatSpec covers the
    // accumulate/combine merge path where approximation would appear.
    "q_freq_types" -> ((s, dir) => {
      Tables.events(s, dir)
        .agg(expr("approx_top_k(event_type, 3)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n"))
        .orderBy("event_type")
    }),

    // B33 correlation/covariance (the feature-relationship profile):
    // Pearson corr + sample covariance + slope of the implied regression
    // per return flag — one partial-aggregating pass, matching DuckDB's
    // definitions exactly (round 6 absorbs accumulation order).
    "q_corr" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")) /
            var_samp(col("l_quantity")), 6).as("slope"))
        .orderBy("l_returnflag")
    }),

    // Fixed-width value histogram (the feature-distribution profile a
    // data-quality dashboard draws): bucket = floor(price / 25k), one
    // keyed agg. Fixed bounds, so no global-extent pre-pass — the shape
    // that streams and incrementally merges at 100 TB.
    "q_histogram" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bucket")
    }),

    // B56 scalar UDF (1→1 bolt escape hatch), algebraically expandable.
    "q_scalar_udf" -> ((s, dir) => {
      val netPrice = udf((p: Double, d: Double) => p * (1.0 - d))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(netPrice(col("l_extendedprice"), col("l_discount")), 4).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
  )

  val oracles: Map[String, String] = Map(
    // Exact columns are exactly oracle-able (Spark `percentile` ≡ DuckDB
    // `quantile_cont`); the sketch's approx answers are folded into
    // in-bounds booleans whose oracle is literal TRUE — a violated
    // rank-error bound shows up as a hash mismatch, not a silent skip.
    "q_quantile_sketch" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS q50_exact,
        | round(quantile_cont(l_extendedprice, 0.95),4) AS q95_exact,
        | TRUE AS q50_in_bounds,
        | TRUE AS q95_in_bounds,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Partial-merge must equal full recompute.
    "q_incremental_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_corr" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice) / var_samp(l_quantity), 6) AS slope
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        | count(*) AS n,
        | round(min(o_totalprice), 2) AS lo,
        | round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Exact because 5 distinct values < the sketch's tracking capacity.
    "q_freq_types" ->
      """SELECT event_type, n FROM (
        |  SELECT event_type, count(*) AS n FROM events
        |  GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3)
        |ORDER BY event_type""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_global_agg" ->
      """SELECT count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price,
        | round(avg(o_totalprice),4) AS avg_price,
        | round(min(o_totalprice),4) AS min_price,
        | round(max(o_totalprice),4) AS max_price
        |FROM orders""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice),2) AS sum_price,
        | CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity),4) AS sum_qty,
        | CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_collect_set" ->
      """SELECT o_orderpriority,
        | array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_collect_ordered" ->
      """SELECT o_custkey,
        | array_to_string(list(o_orderstatus ORDER BY o_orderkey), ',') AS status_seq,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_listagg" ->
      """SELECT o_orderpriority,
        | string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity),4) AS sd_qty,
        | round(var_samp(l_quantity),4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice),4) AS corr_qp,
        | round(covar_samp(l_quantity, l_discount),6) AS cov_qd,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_minmax_by" ->
      """SELECT event_type,
        | arg_max(event_id, round(value*100)*10000000 + event_id) AS top_event,
        | arg_min(event_id, round(value*100)*10000000 + event_id) AS bottom_event,
        | round(max(value),4) AS max_value,
        | round(min(value),4) AS min_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_weighted_avg" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice*l_quantity)/sum(l_quantity),2) AS w_avg_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_scalar_udf" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*(1-l_discount),4) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
