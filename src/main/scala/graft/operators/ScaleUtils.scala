package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew/bucketing utilities — the shuffle-shaping tools SCALE.md refers
  * to for the 100 TB deployment.
  */
object ScaleUtils {
  /** Salted join for skewed keys: the big side gets a pseudo-random salt
    * in [0, numSalts), the small side is replicated numSalts×, and the
    * join key becomes (key, salt) — a single hot key now spreads over
    * numSalts reducers. Result is identical to the plain join (salting
    * only changes the partitioning). AQE's skew-join handles moderate
    * skew automatically; this is for the pathological keys AQE can't
    * split (e.g. one key = 30% of the table). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(numSalts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Gate query: the salted join must produce EXACTLY the plain join —
    * the oracle is the unsalted SQL join, so a pass proves salting is
    * purely a partitioning change. */
  def q_salted_join(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val li = graft.Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val supp = graft.Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
      .withColumnRenamed("s_suppkey", "l_suppkey")
    saltedJoin(li, supp, Seq("l_suppkey"), numSalts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("total"))
      .orderBy(col("s_name"))
  }

  val qSaltedSql: String =
    """SELECT s_name, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map("q_salted_join" -> q_salted_join _)
  val oracles: Map[String, String] = Map("q_salted_join" -> qSaltedSql)

  /** Write a table bucketed by join key: two tables bucketed the same
    * way join with NO exchange on either side (verified by the plan test
    * in ScaleUtilsSpec) — the pre-shuffled layout big fact-fact joins
    * need at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)
}
