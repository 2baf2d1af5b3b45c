package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A throwing query must yield a VISIBLE failed row, never a silently
    // missing key (round 10 shipped a 5-gate breakage as "79 entries, no
    // errors" because the catch below wrote nothing): on exception we
    // (a) leave a marker dir with error.txt where the parquet would be,
    // so any reader of the dump sees a non-parquet failure artifact, and
    // (b) collect every failure into errors.json for the driver/judge.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_VERIFY_ONLY=a,b,c restricts the dump for local
    // iteration (same contract as Bench's BENCH_ONLY); the driver's full
    // runs leave it unset, so the gate surface is never silently narrowed
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] FAILED $name: $msg")
        failures(name) = msg
        val marker = new java.io.File(s"$outDir/$name")
        marker.mkdirs()
        // clear any partial parquet output so the marker is unambiguous
        Option(marker.listFiles()).foreach(_.foreach { f =>
          if (!f.isDirectory) { f.delete(); () }
        })
        Files.writeString(Paths.get(s"$outDir/$name/error.txt"), msg + "\n")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size}/${SparkEntry.queries.size} queries FAILED: " +
          failures.keys.mkString(", "))
    spark.stop()
    // rc stays 0: the driver's compare must still run over the successful
    // queries — the failure surface is errors.json + the marker dirs, not
    // an aborted dump.
  }
}
