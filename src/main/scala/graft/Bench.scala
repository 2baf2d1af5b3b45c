package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Reproducibility: a global warmup touches the fact table, then every
  * query runs SPARK_GRAFT_BENCH_ITERS times (default 3) and reports its
  * per-query MEDIAN — one cold run (first-compile, cold page cache) no
  * longer swings a round-over-round comparison by multiples, which it
  * measurably did between identical binaries. `value` is the sum of the
  * medians. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch the big fact table + exercise codegen once
    Tables.lineitem(spark, sfDir).limit(1000).count()

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // iterate WHOLE passes (not per-query repeats) so iteration i+1 of a
    // query never rides the page cache its own iteration i just filled
    // more than any other query's does
    val passes: Seq[Seq[(String, Double)]] = (1 to iters).map { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> timeOnce(fn)
      }
    }
    val results = passes.head.map(_._1).map { name =>
      name -> median(passes.map(_.find(_._1 == name).get._2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters}"""
    println(line)
    // the driver captures stdout with a bounded tail — the r6 capture
    // lost the trailing dd_* timings — so the full vector also lands as
    // a file artifact every run, keeping rounds comparable query by query
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_results.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
