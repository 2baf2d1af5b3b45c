package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY steers custom
  * operators to "compose existing ops if semantics allow", which they
  * do here): for each left row, attach the single right row with the
  * greatest right-time ≤ left-time within the same key.
  *
  * Implementation: tag both sides, union, ONE window over (key) ordered
  * by (time, side) carrying a running `last(right-payload, ignoreNulls)`.
  * Right rows sort before left rows at equal times, so ties are
  * inclusive (≥ semantics, matching DuckDB's ASOF JOIN). Exactly one
  * shuffle on the key — no inequality join is ever materialized, unlike
  * a naive range join whose candidate space is O(|L|·|R|) per key. This
  * is the shape that survives 100 TB: it inherits the key partitioning
  * and streams each partition once.
  */
object AsOfJoin {
  /** Left rows keep all their columns; matched right columns arrive as a
    * nullable struct column `asofCol` (null = no right row at or before). */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, asofCol: String = "asof"): DataFrame = {
    val rightPayload = right.columns.filterNot(keyCols.contains).toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rightPayload.map(col): _*))
      .select((keyCols.map(col) :+ col("__t") :+ col("__side") :+ col("__r")): _*)
    // align schemas: right rows carry null for the left-only columns
    val leftOnly = left.columns.filterNot(keyCols.contains).toSeq
    val rAligned = leftOnly.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__r")
  }

  /** Attribution query: each purchase event joined as-of to the same
    * user's most recent click at or before it. */
  def q_asof_attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    asof(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .select($"user_id", $"event_id",
        $"asof.click_id".as("click_id"),
        when($"asof".isNotNull,
          unix_micros($"ts") - unix_micros($"asof.click_ts")).as("gap_us"))
      .orderBy($"event_id")
  }

  val qAsofSql: String =
    """SELECT p.user_id, p.event_id, c.click_id,
      |  CASE WHEN c.click_id IS NOT NULL
      |       THEN epoch_us(p.ts) - epoch_us(c.click_ts) END AS gap_us
      |FROM (SELECT user_id, event_id, ts, value FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, event_id AS click_id, ts AS click_ts
      |                FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_attribution" -> q_asof_attribution _)

  val oracles: Map[String, String] = Map(
    "q_asof_attribution" -> qAsofSql)
}
