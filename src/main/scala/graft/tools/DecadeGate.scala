package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic decade-gate runner: times one `SparkEntry.queries` gate at
  * an arbitrary sf dir (GenScale decade corpora included — unlike
  * graft.Bench, no lineitem warmup, so documents/embeddings-only dirs
  * work). Prints one JSON line; min of `iters` full runs.
  *
  * Usage: runMain graft.tools.DecadeGate <gate> <sfDir> [iters]
  */
object DecadeGate {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(gate)
    val times = (1 to iters).map { _ =>
      // pay shared memoized work once per pass, the Bench discipline
      graft.operators.Components.invalidateSharedLabels(spark)
      graft.operators.Curation.invalidateStageCache(spark)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(s"""{"gate":"$gate","sf":"$sfDir","rows":${times.head._2},""" +
      s""""seconds":${times.map(_._1).min},"iters":$iters}""")
    spark.stop()
  }
}
