package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: run named gates in isolation and print row count, wall
  * time, and (when a `f1` / `r1_f` quality column exists) its mean —
  * the fast inner loop for iterating on one gate without a full
  * Verify/Bench pass. Usage:
  *   sbt "runMain graft.tools.GateCheck /root/testdata/sf0.01 gate1 gate2"
  */
object GateCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateCheck <sfDir> <gate>...")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "ERROR"))
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val quality = Seq("f1", "r1_f", "recall").find(df.columns.contains)
          .map(c => f" mean($c)=${df.agg(avg(col(c))).head().getDouble(0)}%.4f")
          .getOrElse("")
        println(f"[gatecheck] $name rows=$rows%d t=$sec%.2fs$quality")
      } catch {
        case e: Throwable =>
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[gatecheck] $name FAILED after $sec%.2fs: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
