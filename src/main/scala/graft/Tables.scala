package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table access for the driver-generated testdata.
  *
  * Every operator reads through here so the parquet scan options stay in
  * one place. Reads are plain `spark.read.parquet` — Catalyst handles
  * column pruning + filter pushdown into the scan, which is the property
  * that matters at 100 TB (only touched columns/row-groups are read).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two encodings of `ts` across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
    * accepts via `nanosAsLong`, surfacing an int64) and plain
    * timestamp[us]. Branch on the actual read schema so both resolve to
    * micros-precision timestamps — truncating ns→µs matches how DuckDB
    * coerces, so oracle comparisons line up either way. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: truncate to micros.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        // normalize NTZ to the session-TZ timestamp type the downstream
        // window/sessionize/as-of operators (and the DuckDB oracle) expect.
        df.withColumn("ts", df("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
