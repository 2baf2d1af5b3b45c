package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-path slope harness (VERDICT r12 item 3): hold the QUERY BATCH
  * fixed and 10× the CANDIDATE POOL, so the measured ratio isolates the
  * per-serve cost of [[graft.llm.Finetune.respondTextAnn]] — the gate
  * (`ft_conversation_ann`) scales its train/embed/metric stages with the
  * corpus and therefore measures the lifecycle, not the serve.
  *
  * Protocol: train ONE head on the small corpus (the head is
  * pool-independent — it only reweights the query); for each pool dir,
  * serve the same fixed batch `iters+1` times and report the median of
  * the LAST `iters` passes (pass 0 pays the one-time index build, which
  * amortizes across every later batch — the train-once-serve-many
  * contract the persistent store exists for). Expected: per-query work
  * is the probed cells' population ≈ nprobe·targetCellRows rows —
  * CONSTANT in pool size — so the exponent should sit near 0 with only
  * the O(numCells) probe ranking and scan-planning overhead growing.
  *
  * Usage: runMain graft.tools.ServeSlope <headDir> <poolDir> [iters]
  * Prints one JSON line {"pool":"…","serve_median_sec":…}.
  */
object ServeSlope {
  def main(args: Array[String]): Unit = {
    val headDir = args(0)
    val poolDir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_serveslope").toString)
    def triples(dir: String) = {
      val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
      graft.Tables.documents(spark, dir).select($"doc_id",
        concat_ws(" ", slice(t, 1, 3)).as("system"),
        concat_ws(" ", slice(t, 4, 5)).as("user"),
        concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    }
    // head trained on the SMALL corpus in both runs — pool-independent
    graft.llm.Finetune.finetune(spark, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "SlopeConv", task = "conversation",
      data = Some(triples(headDir)), textCol = "system", text2Col = "user",
      labelCol = "assistant", dim = 64, hyperparams = Map("max_iter" -> "5")))
    // fixed 50-query batch from the small corpus, stable across pools
    val batch = triples(headDir).orderBy($"doc_id").limit(50)
      .select($"system", $"user").cache()
    batch.count()
    val pool = triples(poolDir).select($"assistant".as("response"))

    // fingerprinting path: every call re-verifies the pool (O(pool) agg)
    val times = (0 to iters).map { _ =>
      val t0 = System.nanoTime()
      graft.llm.Finetune.respondTextAnn(spark, cat, "SlopeConv", batch,
        "system", "user", candidates = pool, nprobe = 2).count()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = times.drop(1).sorted
    val med = warm(warm.size / 2)
    // handle path: fingerprint + build paid ONCE in prepare; the serve
    // is the pure probed-cell read — the number that must stay flat
    val handle = graft.llm.Finetune.prepareConvIndex(
      spark, cat, "SlopeConv", pool)
    val hTimes = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      graft.llm.Finetune.respondTextAnnIndexed(spark, cat, "SlopeConv",
        batch, "system", "user", handle, nprobe = 2).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val hMed = hTimes(hTimes.size / 2)
    println(s"""{"pool":"$poolDir","build_pass_sec":${times.head},"serve_median_sec":$med,"handle_serve_median_sec":$hMed,"iters":$iters}""")
    spark.stop()
  }
}
