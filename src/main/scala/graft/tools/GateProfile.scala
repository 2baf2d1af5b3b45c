package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB wall-time breakdown of a gate — the guide §7.1 empirical
  * loop without the UI (disabled in this sandbox): a SparkListener
  * records every job's duration and callsite, the gate runs once
  * end-to-end (count action, the bench's action), and the jobs print
  * sorted by cost. A lifecycle gate that spends its seconds in 40
  * scheduler-bound mini-jobs needs a different fix (fewer actions)
  * than one with a single fat shuffle stage.
  *
  * Usage: GateProfile <sfDir> <gate1,gate2,...>
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: GateProfile <sfDir> <gate1,gate2,...>")
      sys.exit(2)
    }
    val Array(sfDir, gateCsv) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, callsite: String, desc: String,
        start: Long, var end: Long = -1L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the result stage's name is the action callsite
        // ("count at Foo.scala:42"); it identifies the job far better
        // than properties, which local mode leaves unset
        val cs = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name).getOrElse("?")
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized { jobs(js.jobId) = JobRec(js.jobId, cs, d, js.time) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }
    spark.sparkContext.addSparkListener(listener)

    // one warmup of the fact table, as the bench does
    graft.Tables.lineitem(spark, sfDir).limit(1000).count()

    val gates = gateCsv.split(",").map(_.trim).filter(_.nonEmpty)
    gates.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // run 1 = cold (JIT, codegen); run 2 is what the bench median sees
      (1 to 2).foreach { pass =>
        // the bench invalidates shared memos each pass; mirror it
        graft.operators.Components.invalidateSharedLabels(spark)
        graft.operators.Curation.invalidateStageCache(spark)
        jobs.synchronized { jobs.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let the listener bus drain
        val recs = jobs.synchronized { jobs.values.toSeq }
        val done = recs.filter(_.end > 0)
        val totalJob = done.map(r => r.end - r.start).sum / 1e3
        println(f"== $name pass $pass: wall $wall%.2f s, ${recs.size} jobs, " +
          f"sum(job wall) $totalJob%.2f s ==")
        if (pass == 2) done.sortBy(r => -(r.end - r.start)).take(25).foreach { r =>
          println(f"  ${(r.end - r.start) / 1e3}%7.3f s  job ${r.id}%4d  " +
            s"${r.callsite}  ${r.desc.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
