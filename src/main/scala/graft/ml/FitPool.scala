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
    val confPar = spark.conf.getOption(confKey).map { v =>
      try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$confKey must be an integer, got '$v'")
      }
    }
    val par = math.max(1, math.min(confPar.getOrElse(defaultPar), n))
    if (par <= 1) (0 until n).map(body)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // a failed fit must not leave the OTHER in-flight bodies submitting
      // Spark jobs after the caller has thrown (ADVICE r20): bodies check
      // the abort flag before starting, and the failure path shutdownNow()s
      // the pool (queued tasks dropped; running fits finish their current
      // Spark action and exit at the next flag check)
      val aborted = new java.util.concurrent.atomic.AtomicBoolean(false)
      try Await.result(
        Future.sequence((0 until n).map(m => Future {
          if (aborted.get()) throw new InterruptedException(
            s"fit $m skipped: an earlier fit failed")
          try body(m) catch {
            case e: Throwable => aborted.set(true); throw e
          }
        })),
        Duration.Inf)
      catch { case e: Throwable => aborted.set(true); pool.shutdownNow(); throw e }
      finally pool.shutdown()
    }
  }
}
