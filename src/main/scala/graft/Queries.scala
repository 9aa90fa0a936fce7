package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** One registered query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle computing the same result.
  *
  * Oracle-exactness conventions (the driver hash-compares values):
  *  - all money/quantity arithmetic is done in DECIMAL (exact and
  *    identical across engines), cast to DOUBLE only in the final
  *    projection (exact decimal -> nearest double is deterministic IEEE);
  *  - ratios are a single double division of exactly-derived operands;
  *  - timestamps are output as epoch-microsecond BIGINT
  *    (`unix_micros` / `epoch_us`) — no tz/precision ambiguity;
  *  - every query has a deterministic row SET (unique tiebreakers on any
  *    top-k) and an explicit ORDER BY in both engines.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  /** Exact 2-decimal cast for the synthetic money/qty doubles. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")
  /** Small-value 2-decimal cast (discount/tax/value, < 10^8). */
  def dec2s(c: Column): Column = c.cast("decimal(10,2)")
  val one2: Column = lit(1).cast("decimal(10,2)")

  /** Epoch microseconds of a timestamp column. The star-schema timestamps
    * read as TIMESTAMP_NTZ; under the UTC session the NTZ->LTZ cast is the
    * identity and matches DuckDB's epoch_us on the same naive value.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Timestamp literal typed NTZ so predicates stay cast-free on the
    * column side and push down into the parquet scan.
    */
  def tsLit(v: String): Column = lit(v).cast("timestamp_ntz")
}

/** Reference-parity queries (SURVEY.md §2) phrased over the harness's
  * TPC-H-ish tables. Each `queries()` name maps 1:1 to a §2 capability,
  * cited in the doc string.
  */
object ParityQueries {
  import Q._

  private def T = Tables

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- A1
    Q("q01_pricing_summary",
      (s, d) => {
        val li = T.lineitem(s, d)
          .where(col("l_shipdate") <= tsLit("1998-09-02"))
        val discPrice = dec2(col("l_extendedprice")) * (one2 - dec2s(col("l_discount")))
        val charge = discPrice * (one2 + dec2s(col("l_tax")))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
            (sum(dec2s(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) * (CAST(1 AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
          CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
          CAST(sum(CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS avg_disc,
          count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      "A1 generalized: grouped aggregation (TPC-H Q1 shape)"),

    // ------------------------------------------------------------ W1/W2
    Q("q02_dedup_latest",
      (s, d) => {
        Dedup.keepLatest(T.events(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            epochUs(col("ts")).as("last_ts_us"), col("value").as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               epoch_us(ts) AS last_ts_us, value AS last_value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1 ORDER BY user_id"""),
      "W1+W2: ROW_NUMBER keep-latest dedup (WithDeduplicateJoinJob.java:89-97)"),

    // -------------------------------------------------------- J-D/J3 flagship
    Q("q03_dedup_join",
      (s, d) => {
        EnrichJoin.enrichLatest(
            T.customer(s, d), T.events(s, d).select("user_id", "ts", "event_id", "event_type", "value"),
            "c_custkey", "user_id", Seq(col("ts"), col("event_id")))
          .select(col("c_custkey"), col("c_name"),
            col("event_type").as("last_event_type"), col("value").as("last_value"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        WITH latest AS (
          SELECT user_id, event_type, value
          FROM (SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events)
          WHERE rn = 1)
        SELECT c_custkey, c_name, event_type AS last_event_type, value AS last_value
        FROM customer LEFT JOIN latest ON c_custkey = user_id ORDER BY c_custkey"""),
      "Flagship dedup-then-left-outer-join (WithDeduplicateJoinJob.java:88-104)"),

    // ------------------------------------------------------------ W3/A1
    Q("q04_window_agg",
      (s, d) => {
        WindowAgg.tumble(T.events(s, d), "ts", "1 hour", Seq("event_type"),
            Seq(count(lit(1)).as("n"), sum(dec2s(col("value"))).cast("double").as("sum_value")))
          .select(col("event_type"),
            epochUs(col("window_start")).as("window_start_us"),
            epochUs(col("window_end")).as("window_end_us"),
            epochUs(col("window_time")).as("window_time_us"),
            col("n"), col("sum_value"))
          .orderBy(col("event_type"), col("window_start_us"))
      },
      Some("""
        SELECT event_type, window_start_us,
               window_start_us + 3600000000 AS window_end_us,
               window_start_us + 3600000000 - 1000 AS window_time_us,
               n, sum_value
        FROM (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS window_start_us,
                     count(*) AS n,
                     CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2)
        ORDER BY event_type, window_start_us"""),
      "W3+A1: tumbling window TVF count/sum (WindowsProctimeAggJob.java:65-81)"),

    // ---------------------------------------------------------------- J6
    Q("q05_unnest_outer",
      (s, d) => {
        val big = T.orders(s, d).where(col("o_totalprice") > 300000)
          .select(col("o_custkey"), col("o_orderkey"))
        val arrs = T.customer(s, d)
          .join(big, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(sort_array(collect_list(col("o_orderkey"))).as("okeys"))
        Unnest.outer(arrs, col("okeys"), "o_orderkey")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(col("c_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT c_custkey, o_orderkey
        FROM customer LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 300000) o
          ON c_custkey = o_custkey
        ORDER BY c_custkey, o_orderkey"""),
      "J6: outer UNNEST keeps empty-array parents (CrossJoinJob.java:66-71). " +
        "Scale note: the per-key array is bounded by the selective o_totalprice filter " +
        "(array-building without such a bound is a memory amplification hazard — the " +
        "production shape for unbounded sets is the plain outer join the oracle uses)"),

    // ------------------------------------------------------------ J3/J4
    Q("q06_join_agg_left",
      (s, d) => {
        val agg = T.events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(dec2s(col("value"))).cast("double").as("total_value"))
        T.customer(s, d).join(agg, col("c_custkey") === col("user_id"), "left_outer")
          .select(col("c_custkey"), col("c_name"), col("n_events"), col("total_value"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, n_events, total_value
        FROM customer LEFT JOIN (
          SELECT user_id, count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
          FROM events GROUP BY user_id) e ON c_custkey = user_id
        ORDER BY c_custkey"""),
      "J3/J4: left outer join, null-preserving (TableAPIJob.java:85-88)"),

    // ------------------------------------------------------- §2.7 top-k
    Q("q07_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        val top = T.customer(s, d).withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        top.join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("rk"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("n_name"), col("rk"))
      },
      Some("""
        SELECT n_name, rk, c_custkey, c_acctbal
        FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
              FROM customer) c
        JOIN nation ON c_nationkey = n_nationkey
        WHERE rk <= 3 ORDER BY n_name, rk"""),
      "top-k per group via ranking window (SURVEY §2.7) + broadcast dim join"),

    // ---------------------------------------------------------- J1 as-of
    Q("q08_asof_enrich",
      (s, d) => {
        val ev = T.events(s, d)
        val probe = ev.where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errs = Dedup.keepLatest(
            ev.where(col("event_type") === "error"), Seq("user_id", "ts"), Seq(col("event_id")))
          .select(col("user_id"), col("ts"),
            epochUs(col("ts")).as("error_ts_us"), col("value").as("error_value"))
        EnrichJoin.asOfJoin(probe, errs, "user_id", "ts", "ts",
            Seq("error_ts_us", "error_value"))
          .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("click_ts_us"),
            col("error_ts_us"), col("error_value"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH err AS (
          SELECT user_id, ts, value
          FROM (SELECT user_id, ts, value, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'error')
          WHERE rn = 1),
        u AS (
          SELECT user_id, ts, 1 AS side, event_id, CAST(NULL AS BIGINT) AS e_ts, CAST(NULL AS DOUBLE) AS e_val
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, ts, 0 AS side, NULL AS event_id, epoch_us(ts) AS e_ts, value AS e_val FROM err),
        c AS (
          SELECT user_id, ts, side, event_id,
                 last_value(e_ts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS error_ts_us,
                 last_value(e_val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS error_value
          FROM u)
        SELECT event_id, user_id, epoch_us(ts) AS click_ts_us, error_ts_us, error_value
        FROM c WHERE side = 1 ORDER BY event_id"""),
      "J1: temporal/as-of enrich — latest error at-or-before each click (DataStreamJob.java:88-104)"),

    // ------------------------------------------------------------ P5/P6
    // DECIMAL end-to-end: the CTE's cust_rev stays DECIMAL and is cast to
    // DOUBLE only in the final projection, so both engines compute the
    // identical exact value before the one deterministic double conversion.
    // (A mid-query DOUBLE round-trip diverges by one ulp on boundary values
    // — Spark's double->decimal cast goes through the shortest decimal
    // string; DuckDB rounds the true binary value.)
    Q("q09_cte_revenue",
      (s, d) => {
        T.registerAll(s, d)
        s.sql("""
          WITH rev AS (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS cust_rev,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey)
          SELECT n_name,
                 CAST(SUM(cust_rev) AS DOUBLE) AS nation_rev,
                 SUM(n_orders) AS n_orders, COUNT(*) AS n_cust
          FROM rev JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""")
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS cust_rev,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey)
        SELECT n_name,
               CAST(SUM(cust_rev) AS DOUBLE) AS nation_rev,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders, COUNT(*) AS n_cust
        FROM rev JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      "P5/P6: CTE + inline view + multi-join (WithDeduplicateJoinJob.java:89-97)"),

    // ------------------------------------------------------- semi / anti
    Q("q10_semi_join",
      (s, d) => {
        val big = T.orders(s, d).where(col("o_totalprice") > 300000)
        T.customer(s, d).join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey"""),
      "left semi join (EXISTS) — widening beyond reference joins"),

    Q("q11_anti_join",
      (s, d) => {
        val big = T.orders(s, d).where(col("o_totalprice") > 300000)
        T.customer(s, d).join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey"""),
      "left anti join (NOT EXISTS) — widening beyond reference joins"),

    // ----------------------------------------------------------- set ops
    Q("q12_union",
      (s, d) => {
        val a = T.customer(s, d).where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = T.orders(s, d).where(col("o_totalprice") > 400000).select(col("o_custkey").as("k"))
        a.union(b).distinct().orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        ORDER BY k"""),
      "UNION (distinct) — widening (SURVEY §2.8)"),

    Q("q13_intersect",
      (s, d) => {
        val a = T.customer(s, d).where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = T.orders(s, d).where(col("o_totalprice") > 400000).select(col("o_custkey").as("k"))
        a.intersect(b).orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        ORDER BY k"""),
      "INTERSECT — widening (SURVEY §2.8)"),

    Q("q14_except",
      (s, d) => {
        val a = T.customer(s, d).where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = T.orders(s, d).where(col("o_totalprice") > 400000).select(col("o_custkey").as("k"))
        a.except(b).orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        ORDER BY k"""),
      "EXCEPT — widening (SURVEY §2.8)"),

    // ------------------------------------------------------------ rollup
    Q("q15_rollup",
      (s, d) => {
        T.customer(s, d).join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"), sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"))
          .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
      },
      Some("""
        SELECT n_name, c_mktsegment, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
        ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""),
      "ROLLUP grouping sets — widening (SURVEY §2.5)"),

    // -------------------------------------------------------------- cube
    Q("q38_cube",
      (s, d) => {
        T.orders(s, d)
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
          .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
      },
      Some("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""),
      "CUBE grouping sets — widening (SURVEY §2.5), complements q15's ROLLUP"),

    // ------------------------------------------------- window frames etc
    Q("q16_window_frames",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        T.orders(s, d).select(
            col("o_custkey"), col("o_orderkey"),
            epochUs(col("o_orderdate")).as("order_date_us"),
            row_number().over(w).as("seq"),
            rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)).as("date_rank"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            sum(dec2(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"))
          .orderBy(col("o_custkey"), col("seq"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS order_date_us,
               row_number() OVER w AS seq,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC) AS date_rank,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ORDER BY o_custkey, seq"""),
      "analytic window functions + frames — widening (SURVEY §2.6)"),

    // ------------------------------------------------------ distinct agg
    Q("q17_distinct_agg",
      (s, d) => {
        T.orders(s, d).groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders,
               min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "DISTINCT aggregation + min/max — widening (SURVEY §2.5)"),

    // ------------------------------------------------- global sort/limit
    Q("q18_top10_orders",
      (s, d) => {
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
      "global ORDER BY + LIMIT (TakeOrderedAndProject) — widening (SURVEY §2.7)"),

    // --------------------------------------------------------- TPC-H Q3
    Q("q19_shipping_priority",
      (s, d) => {
        val cut = tsLit("1998-01-01")
        val c = T.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        val o = T.orders(s, d).where(col("o_orderdate") < cut)
        val l = T.lineitem(s, d).where(col("l_shipdate") > cut)
        val rev = dec2(col("l_extendedprice")) * (one2 - dec2s(col("l_discount")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(rev).cast("double").as("revenue"))
          .select(col("l_orderkey"), col("revenue"), epochUs(col("o_orderdate")).as("order_date_us"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
               epoch_us(o_orderdate) AS order_date_us
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""),
      "TPC-H Q3 shape: selective multi-join + agg + top-k (bench headline)"),

    // ----------------------------------------------------- TPC-H Q5-ish
    Q("q20_local_supplier_volume",
      (s, d) => {
        val rev = dec2(col("l_extendedprice")) * (one2 - dec2s(col("l_discount")))
        val l = T.lineitem(s, d)
        val o = T.orders(s, d)
          .where(col("o_orderdate") >= tsLit("1996-01-01") &&
            col("o_orderdate") < tsLit("1998-01-01"))
        val c = T.customer(s, d)
        val sup = T.supplier(s, d)
        val n = T.nation(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .where(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY n_name"""),
      "TPC-H Q5 shape: star join with same-nation predicate (bench headline)"),

    // ------------------------------------------------ §2.6 hop window
    Q("q36_hop_window",
      (s, d) => {
        T.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec2s(col("value"))).cast("double").as("sum_value"))
          .select(col("event_type"), epochUs(col("window.start")).as("window_start_us"),
            col("n"), col("sum_value"))
          .orderBy(col("event_type"), col("window_start_us"))
      },
      Some("""
        WITH h AS (SELECT event_type,
                          unnest([time_bucket(INTERVAL '30 minutes', ts),
                                  time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
                          value
                   FROM events)
        SELECT event_type, epoch_us(ws) AS window_start_us, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
        FROM h GROUP BY event_type, ws ORDER BY event_type, window_start_us"""),
      "sliding/hopping window agg (size 1h, slide 30m) — widening beyond the " +
        "reference's tumble-only TVFs (SURVEY §2.6); each event lands in exactly 2 windows"),

    // -------------------------------------------- §2.6 session window
    Q("q37_session_window",
      (s, d) => {
        T.events(s, d)
          .groupBy(session_window(col("ts"), "1 day"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(dec2s(col("value"))).cast("double").as("sum_value"))
          .select(col("user_id"),
            epochUs(col("session_window.start")).as("session_start_us"),
            epochUs(col("session_window.end")).as("session_end_us"),
            col("n"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""
        WITH x AS (SELECT user_id, ts, value, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL '1 day'
                          THEN 1 ELSE 0 END AS new_sess
                   FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
              FROM x)
        SELECT user_id, epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts)) + 86400000000 AS session_end_us,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
        FROM y GROUP BY user_id, sess_id ORDER BY user_id, session_start_us"""),
      "session window agg (1-day gap) per user — widening (SURVEY §2.6); session end = " +
        "last event + gap, new session starts at diff >= gap (matches Spark's strict bound)"),

    // ------------------------------------------------- JSON extraction
    Q("q40_json_props",
      (s, d) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        T.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(k).as("sum_k"),
            count(when(k > 50, 1)).as("n_high"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(count(*) FILTER (CAST(json_extract(props, '$.k') AS BIGINT) > 50) AS BIGINT) AS n_high
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "JSON property extraction + conditional agg over the events.props column — " +
        "widening (scalar-function surface, SURVEY §2.8); extraction is scan-side, codegen'd"),

    // ----------------------------------------------------------- lateral
    Q("q21_lateral_join",
      (s, d) => {
        T.registerAll(s, d)
        s.sql("""
          SELECT n_name, t.n_cust, t.total_bal
          FROM nation LEFT JOIN LATERAL (
            SELECT COUNT(*) AS n_cust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
            FROM customer WHERE c_nationkey = n_nationkey) t
          ORDER BY n_name""")
      },
      Some("""
        SELECT n_name, t.n_cust, t.total_bal
        FROM nation LEFT JOIN LATERAL (
          SELECT COUNT(*) AS n_cust,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
          FROM customer WHERE c_nationkey = n_nationkey) t ON TRUE
        ORDER BY n_name"""),
      "J2: LEFT JOIN LATERAL correlated subquery (DataStreamJob.java:116-120)"),

    // ------------------------------------------------- salted skew join
    Q("q43_salted_join",
      (s, d) => {
        // saltOn = the columns the query reads anyway: deterministic salt
        // without pulling untouched lineitem columns through the scan
        SkewJoin.salted(T.lineitem(s, d), T.supplier(s, d), "l_suppkey", "s_suppkey",
            salt = 8, saltOn = Seq("l_orderkey", "l_linenumber", "l_quantity"))
          .groupBy(col("s_nationkey"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey"""),
      "salted skew join: big side salted deterministically into 8 sub-keys, small side " +
        "replicated 8x — one hot key spreads over 8 reducers; result provably identical to " +
        "the plain equi-join (the oracle IS the plain join)")
  )
}
