package graft.ml

/** Overlap INDEPENDENT estimator fits (guide §2.6; Spark ML's own
  * CrossValidator-parallelism pattern): each fit's tiny stages are
  * submitted from a pool thread so the next fit's tasks back-fill
  * executors idled by the current fit's stragglers. Results return
  * ORDERED BY INDEX; every body must be self-contained (own seed, own
  * estimator instance), so the output is identical at any parallelism.
  * Bounded in-flight count — 2–4 is enough to fill the tail (§2.6) —
  * and conf-overridable per call site (1 = sequential). */
private[ml] object FitPool {
  def indexed[A](spark: org.apache.spark.sql.SparkSession, n: Int,
      confKey: String, defaultPar: Int = 4)(body: Int => A): Seq[A] = {
    val par = math.max(1, math.min(
      spark.conf.getOption(confKey).map(_.toInt).getOrElse(defaultPar), n))
    if (par <= 1) (0 until n).map(body)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence((0 until n).map(m => Future(body(m)))),
        Duration.Inf)
      finally pool.shutdown()
    }
  }
}
