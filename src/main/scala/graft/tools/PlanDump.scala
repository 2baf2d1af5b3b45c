package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named gates to files — the
  * before/after plan evidence for optimization rounds
  * (plans/rN/<gate>_before.txt / _after.txt).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <gate1,gate2,...|all>
  * Writes <outDir>/<gate>_<suffix>.txt per gate.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: PlanDump <sfDir> <outDir> <suffix> <gate1,gate2,...|all>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, gateCsv) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val wanted: Set[String] =
      if (gateCsv == "all") graft.SparkEntry.queries.keySet
      else gateCsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
