package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational query pack — the SQL surface SURVEY §2.3 says the engine's
  * internals rely on (aggregation, 2–4-way joins, windows, DISTINCT-ON
  * emulation, semi/anti joins, JSON extraction, ordering).
  *
  * Numeric hygiene for oracle parity: every SUM over doubles goes through
  * an exact DECIMAL(18,4) accumulation (order-independent, bit-identical
  * between Spark and DuckDB) and is cast back to DOUBLE at the end.
  * Ratios are computed in double arithmetic FROM those exact sums with
  * the identical formula on both sides. Every query ends in a total
  * deterministic ORDER BY.
  *
  * Scale notes (100 TB): filters/projections sit directly on the parquet
  * scan (pushdown); dimension tables (region/nation/customer at TPC-H
  * ratios) are broadcast so fact-side joins are shuffle-free; aggregations
  * are partial (map-side combine) by construction via groupBy.agg.
  */
object Relational {
  private val dec = DecimalType(18, 4)
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast("double")
  // For expressions whose TRUE decimal expansion has >4 digits (e.g. a
  // product of three 2-decimal factors = 6 digits) a scale-4 cast lands on
  // exact .5 boundaries where Spark (BigDecimal.HALF_UP over the exact
  // binary value) and DuckDB (double*10^s + rint) can disagree; scale 6
  // keeps every cast away from a rounding boundary → bit-identical sums.
  private val dec6 = DecimalType(22, 6)
  private def dsum6(c: org.apache.spark.sql.Column) = sum(c.cast(dec6)).cast("double")

  def q1_pricing_summary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style constrained-scan revenue: everything pushes into the scan. */
  def q6_forecast_revenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount" >= 0.03 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24.0)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

  /** 3-way join: revenue per market segment (customer broadcast). */
  def q3_segment_revenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(s, dir)
      .select($"l_orderkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(dsum($"rev").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"c_mktsegment")
  }

  val q3Sql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** 4-way dimension chain region→nation→customer→orders (all dims broadcast). */
  def q5_region_orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_orders"),
           dsum($"o_totalprice").as("total_price"))
      .orderBy($"r_name")
  }

  val q5Sql: String =
    """SELECT r_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Latest order per customer — DISTINCT ON emulation via row_number window
    * (SURVEY §2.3: deployments-view pattern `schema.sql:182-186`). */
  def q_latest_order_per_customer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .orderBy($"o_custkey")
  }

  val qLatestSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Semi join: customers that have at least one priority-URGENT order. */
  def q_semi_urgent_customers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val qSemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Anti join: customers with no orders at all. */
  def q_anti_no_orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Top-N with deterministic tie-break. */
  def q_top_orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  val qTopSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** Distinct-count + multi-distinct aggregation. */
  def q_distinct_counts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"),
           countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"))
      .orderBy($"l_returnflag")
  }

  val qDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** JSON extraction + ordering — the catalog `metrics->>'<m>'` pattern
    * (SURVEY §2.3, `src/orm/task.rs:116-127` in the reference). */
  def q_json_events(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"k").as("sum_k"),
           max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val qJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hourly tumbling-window aggregation over the event stream (batch view
    * of the Structured Streaming query in graft.streaming). */
  def q_events_hourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("hour", date_trunc("hour", $"ts"))
      .groupBy($"hour", $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  val qHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sessionization: 30-minute-gap sessions per user via lag + running sum
    * (the classic shuffle-once pattern: one window partition per user). */
  /** Weekly cohort retention — the classic product-analytics matrix:
    * each user's cohort is the Monday-truncated week of their FIRST
    * event (a window min over the one user_id shuffle), every event
    * lands in a (cohort_week, week_index) bucket, and the cell value
    * is distinct active users. Week arithmetic stays integral (both
    * engines truncate weeks to Monday, so the day diff is an exact
    * multiple of 7). */
  def q_cohort_retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id")
    Tables.events(s, dir)
      .withColumn("cohort_week", date_trunc("week", min($"ts").over(byUser)))
      .withColumn("week", date_trunc("week", $"ts"))
      .withColumn("week_index",
        (datediff($"week", $"cohort_week") / 7).cast("long"))
      .groupBy($"cohort_week", $"week_index")
      .agg(countDistinct($"user_id").as("n_active_users"))
      .orderBy($"cohort_week", $"week_index")
  }

  val qCohortSql: String =
    """WITH c AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT e.user_id, c.cohort_week, date_trunc('week', e.ts) AS week
      |  FROM events e JOIN c ON e.user_id = c.user_id)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_index,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
      |FROM a GROUP BY cohort_week, week_index
      |ORDER BY cohort_week, week_index""".stripMargin

  def q_sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
             unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"event_id").as("first_event"),
           max($"event_id").as("last_event"))
      .orderBy($"user_id", $"session_id")
  }

  val qSessionSql: String =
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM (
      |  SELECT user_id, event_id,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events) a) b
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Ordered funnel over the event stream: users who performed
    * view → click → purchase IN ORDER (each stage strictly after the
    * one before). The classic product-analytics sequence query.
    *
    * Scale shape: ONE hash shuffle on user_id serves everything — the
    * three stage timestamps are unbounded-frame window minima over the
    * same partition spec (Catalyst stacks the Window operators on a
    * single Exchange), the per-user collapse reuses that partitioning,
    * and the final funnel counts are a single map-combinable global
    * aggregate. No self-join, no per-stage pass over the events. */
  /** Per-user funnel stage times — the shared kernel of the batch gate
    * and the streaming twin's parity spec. One row per user:
    * (t_view, t_click, t_purchase), each null if the stage was never
    * reached in order. */
  def funnelStages(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(byUser))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
           max(col("t_purchase")).as("t_purchase"))
  }

  def q_events_funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    funnelStages(Tables.events(s, dir))
      .agg(count($"t_view").as("users_view"),
           count($"t_click").as("users_click"),
           count($"t_purchase").as("users_purchase"),
           count(when(unix_micros($"t_purchase") - unix_micros($"t_view") <=
             86400000000L, 1)).as("users_converted_1d"),
           sum(unix_micros($"t_purchase") - unix_micros($"t_view"))
             .as("sum_convert_us"))
  }

  val qFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, event_type, ts,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_view
      |  FROM events),
      |s2 AS (
      |  SELECT user_id, event_type, ts, t_view,
      |    min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_click
      |  FROM s1),
      |s3 AS (
      |  SELECT user_id, t_view, t_click,
      |    min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_purchase
      |  FROM s2),
      |u AS (
      |  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
      |    max(t_purchase) AS t_purchase
      |  FROM s3 GROUP BY user_id)
      |SELECT count(t_view) AS users_view, count(t_click) AS users_click,
      |  count(t_purchase) AS users_purchase,
      |  count(CASE WHEN epoch_us(t_purchase) - epoch_us(t_view) <= 86400000000
      |        THEN 1 END) AS users_converted_1d,
      |  CAST(sum(epoch_us(t_purchase) - epoch_us(t_view)) AS BIGINT)
      |    AS sum_convert_us
      |FROM u""".stripMargin

  /** Per-user 1-hour rolling features over the event stream — a RANGE
    * frame on event time (the one window-frame kind the rest of the
    * pack doesn't exercise), the classic time-series feature-engineering
    * shape for ML pipelines. One shuffle on user_id; the frame bound is
    * micros arithmetic so both engines see the identical peer set, and
    * the rolling sum accumulates in DECIMAL for order-independent
    * cross-engine equality. */
  def q_events_rolling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, dir)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum($"value".cast(dec)).over(w).cast("double"))
      .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
      .orderBy($"event_id")
  }

  val qRollingSql: String =
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Rollup-style two-level aggregate via union (grouping sets shape). */
  def q_priority_by_status(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val qPrioritySql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ROLLUP over (status, priority) — grouping-sets surface. NULL group
    * keys sort first in both engines via explicit NULLS FIRST. */
  def q_rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Correlated scalar subquery: per-customer order count + max price. */
  def q_correlated_subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders_v WHERE o_custkey = c_custkey) AS max_price
        |FROM customer_v ORDER BY c_custkey""".stripMargin)
  }

  val qCorrelatedSql: String =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** CTE + UNION ALL: high/low-value order segments. */
  def q_cte_union(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """WITH hi AS (SELECT 'high' AS bucket, o_orderkey, o_totalprice
        |            FROM orders_v WHERE o_totalprice >= 300000),
        |     lo AS (SELECT 'low' AS bucket, o_orderkey, o_totalprice
        |            FROM orders_v WHERE o_totalprice < 10000)
        |SELECT bucket, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo) u
        |GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  val qCteSql: String =
    """WITH hi AS (SELECT 'high' AS bucket, o_orderkey, o_totalprice
      |            FROM orders WHERE o_totalprice >= 300000),
      |     lo AS (SELECT 'low' AS bucket, o_orderkey, o_totalprice
      |            FROM orders WHERE o_totalprice < 10000)
      |SELECT bucket, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo) u
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Pivot-style conditional aggregation: status × priority counts. */
  def q_pivot_status(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(
        count(when($"o_orderpriority" === "1-URGENT", 1)).as("urgent"),
        count(when($"o_orderpriority" === "2-HIGH", 1)).as("high"),
        count(when($"o_orderpriority".isin("1-URGENT", "2-HIGH") === false, 1)).as("other"))
      .orderBy($"o_orderstatus")
  }

  val qPivotSql: String =
    """SELECT o_orderstatus,
      |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
      |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
      |  count(CASE WHEN NOT o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS other
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> q1_pricing_summary _,
    "q3_segment_revenue"    -> q3_segment_revenue _,
    "q5_region_orders"      -> q5_region_orders _,
    "q6_forecast_revenue"   -> q6_forecast_revenue _,
    "q_latest_order_per_customer" -> q_latest_order_per_customer _,
    "q_semi_urgent_customers" -> q_semi_urgent_customers _,
    "q_anti_no_orders"      -> q_anti_no_orders _,
    "q_top_orders"          -> q_top_orders _,
    "q_distinct_counts"     -> q_distinct_counts _,
    "q_json_events"         -> q_json_events _,
    "q_events_hourly"       -> q_events_hourly _,
    "q_sessionize"          -> q_sessionize _,
    "q_cohort_retention"    -> q_cohort_retention _,
    "q_events_funnel"       -> q_events_funnel _,
    "q_events_rolling"      -> q_events_rolling _,
    "q_priority_by_status"  -> q_priority_by_status _,
    "q_rollup"              -> q_rollup _,
    "q_correlated_subquery" -> q_correlated_subquery _,
    "q_cte_union"           -> q_cte_union _,
    "q_pivot_status"        -> q_pivot_status _
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary"    -> q1Sql,
    "q3_segment_revenue"    -> q3Sql,
    "q5_region_orders"      -> q5Sql,
    "q6_forecast_revenue"   -> q6Sql,
    "q_latest_order_per_customer" -> qLatestSql,
    "q_semi_urgent_customers" -> qSemiSql,
    "q_anti_no_orders"      -> qAntiSql,
    "q_top_orders"          -> qTopSql,
    "q_distinct_counts"     -> qDistinctSql,
    "q_json_events"         -> qJsonSql,
    "q_events_hourly"       -> qHourlySql,
    "q_sessionize"          -> qSessionSql,
    "q_cohort_retention"    -> qCohortSql,
    "q_events_funnel"       -> qFunnelSql,
    "q_events_rolling"      -> qRollingSql,
    "q_priority_by_status"  -> qPrioritySql,
    "q_rollup"              -> qRollupSql,
    "q_correlated_subquery" -> qCorrelatedSql,
    "q_cte_union"           -> qCteSql,
    "q_pivot_status"        -> qPivotSql
  )
}
