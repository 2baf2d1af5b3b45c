package graft.operators

import graft.Tables
import graft.llm.TextMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gates for the LLM text-metric surface (SURVEY §2.6 —
  * reference `transformers.py:650-874`). Evaluation pairs are
  * (documents.text, next document's text): adjacent synthetic docs share
  * template vocabulary, so ROUGE/BLEU land in a realistic mid-range
  * instead of degenerate 0/1.
  *
  * FP-parity notes (see TextMetrics scaladoc): per-pair ROUGE values are
  * ratios/products of exact integer counts — compared raw, bit-exact.
  * Corpus BLEU/perplexity expose exact BIGINT counts and cast the final
  * libm-dependent scalar to REAL.
  */
object TextMetricsQueries {
  /** One temp catalog root per JVM for the trained ft_* gates, REUSED
    * across invocations — repeated bench/verify passes append a few
    * catalog rows instead of orphaning a fresh model directory per call
    * — and removed on JVM exit (no query can still be reading it then). */
  private lazy val gateCatalogRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_ftgates")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }

  private def gateCatalog(s: SparkSession, name: String): graft.ml.Catalog =
    new graft.ml.Catalog(s, gateCatalogRoot.resolve(name).toString)

  /** Adjacent-document (prediction, reference) pairs. */
  private def pairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"doc_id", $"text")
    d.select($"doc_id", $"text".as("pred"))
      .join(d.select(($"doc_id" - 1).as("doc_id"), $"text".as("ref")), Seq("doc_id"))
  }

  private val pairsSqlCte =
    """tk AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |pr AS (
      |  SELECT d.doc_id, d.t AS tp, r.t AS tr
      |  FROM tk d JOIN tk r ON r.doc_id = d.doc_id + 1)""".stripMargin

  /** n-gram list over a token-array SQL expression, SEP = chr(1) —
    * mirrors TextMetrics.ngrams. */
  private def ngramSql(t: String, n: Int): String =
    if (n == 1) t
    else {
      val parts = (0 until n).map(j => s"$t[i + $j]").mkString(" || chr(1) || ")
      s"list_transform(range(1, len($t) - ${n - 2}), i -> $parts)"
    }

  private def overlapSql(gp: String, gr: String): String =
    s"""coalesce(list_sum(list_transform(list_distinct($gp),
       |  g -> least(len(list_filter($gp, x -> x = g)),
       |             len(list_filter($gr, x -> x = g))))), 0)""".stripMargin

  // ------------------------------------------------------------- ROUGE
  def lm_rouge_pairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextMetrics.rougePairs(pairs(s, dir), "pred", "ref")
      .select($"doc_id", $"r1_p", $"r1_r", $"r1_f", $"r2_p", $"r2_r", $"r2_f")
      .orderBy($"doc_id")
  }

  val lmRougeSql: String =
    s"""WITH $pairsSqlCte,
       |g AS (
       |  SELECT doc_id, tp AS gp1, tr AS gr1,
       |    ${ngramSql("tp", 2)} AS gp2, ${ngramSql("tr", 2)} AS gr2
       |  FROM pr),
       |ov AS (
       |  SELECT doc_id,
       |    ${overlapSql("gp1", "gr1")} AS ov1, len(gp1) AS np1, len(gr1) AS nr1,
       |    ${overlapSql("gp2", "gr2")} AS ov2, len(gp2) AS np2, len(gr2) AS nr2
       |  FROM g),
       |prr AS (
       |  SELECT doc_id,
       |    CASE WHEN np1 = 0 THEN 0.0 ELSE CAST(ov1 AS DOUBLE) / CAST(np1 AS DOUBLE) END AS r1_p,
       |    CASE WHEN nr1 = 0 THEN 0.0 ELSE CAST(ov1 AS DOUBLE) / CAST(nr1 AS DOUBLE) END AS r1_r,
       |    CASE WHEN np2 = 0 THEN 0.0 ELSE CAST(ov2 AS DOUBLE) / CAST(np2 AS DOUBLE) END AS r2_p,
       |    CASE WHEN nr2 = 0 THEN 0.0 ELSE CAST(ov2 AS DOUBLE) / CAST(nr2 AS DOUBLE) END AS r2_r
       |  FROM ov)
       |SELECT doc_id, r1_p, r1_r,
       |  CASE WHEN r1_p + r1_r = 0.0 THEN 0.0 ELSE 2.0 * r1_p * r1_r / (r1_p + r1_r) END AS r1_f,
       |  r2_p, r2_r,
       |  CASE WHEN r2_p + r2_r = 0.0 THEN 0.0 ELSE 2.0 * r2_p * r2_r / (r2_p + r2_r) END AS r2_f
       |FROM prr ORDER BY doc_id""".stripMargin

  // ------------------------------------------- summarization eval (ft_)
  /** Summarization-task metric path, end to end, on a deterministic
    * extractive baseline (the reference's summarization finetune
    * evaluates with ROUGE — `transformers.py:650-682`; the TRAINING
    * needs a neural runtime, the EVAL contract does not): candidate =
    * lead-30-token summary, pseudo-gold reference = tail-30-token
    * summary (the synthetic docs have no sentence punctuation or gold
    * summaries; lead-vs-tail shares template vocabulary, so precision,
    * recall, and F all land non-degenerate). Per-doc values are ratios
    * of exact integer counts — bit-exact against the oracle. */
  def ft_summarize_eval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id",
      concat_ws(" ", slice(t, lit(1), lit(30))).as("pred"),
      concat_ws(" ", slice(t, greatest(size(t) - 29, lit(1)), lit(30))).as("ref"))
    TextMetrics.rougePairs(d, "pred", "ref")
      .select($"doc_id", $"r1_p", $"r1_r", $"r1_f", $"r2_p", $"r2_r", $"r2_f")
      .orderBy($"doc_id")
  }

  val ftSummarizeSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |pr AS (
       |  SELECT doc_id, t[1:30] AS tp,
       |    t[greatest(len(t) - 29, 1):len(t)] AS tr
       |  FROM tk),
       |g AS (
       |  SELECT doc_id, tp AS gp1, tr AS gr1,
       |    ${ngramSql("tp", 2)} AS gp2, ${ngramSql("tr", 2)} AS gr2
       |  FROM pr),
       |ov AS (
       |  SELECT doc_id,
       |    ${overlapSql("gp1", "gr1")} AS ov1, len(gp1) AS np1, len(gr1) AS nr1,
       |    ${overlapSql("gp2", "gr2")} AS ov2, len(gp2) AS np2, len(gr2) AS nr2
       |  FROM g),
       |prr AS (
       |  SELECT doc_id,
       |    CASE WHEN np1 = 0 THEN 0.0 ELSE CAST(ov1 AS DOUBLE) / CAST(np1 AS DOUBLE) END AS r1_p,
       |    CASE WHEN nr1 = 0 THEN 0.0 ELSE CAST(ov1 AS DOUBLE) / CAST(nr1 AS DOUBLE) END AS r1_r,
       |    CASE WHEN np2 = 0 THEN 0.0 ELSE CAST(ov2 AS DOUBLE) / CAST(np2 AS DOUBLE) END AS r2_p,
       |    CASE WHEN nr2 = 0 THEN 0.0 ELSE CAST(ov2 AS DOUBLE) / CAST(nr2 AS DOUBLE) END AS r2_r
       |  FROM ov)
       |SELECT doc_id, r1_p, r1_r,
       |  CASE WHEN r1_p + r1_r = 0.0 THEN 0.0 ELSE 2.0 * r1_p * r1_r / (r1_p + r1_r) END AS r1_f,
       |  r2_p, r2_r,
       |  CASE WHEN r2_p + r2_r = 0.0 THEN 0.0 ELSE 2.0 * r2_p * r2_r / (r2_p + r2_r) END AS r2_f
       |FROM prr ORDER BY doc_id""".stripMargin

  /** Quality floor for the rows-only trained gates: the driver's only
    * check on a no-oracle gate is rows > 0, so a silently degraded
    * trained head must yield ZERO rows — the per-doc result joins
    * against its own corpus-mean metric filtered at `floor`, which
    * empties the gate the moment mean quality collapses below the
    * stated threshold. Floors sit at roughly HALF the healthy trained
    * level measured at gate scale (well above degenerate/chance, far
    * below a working head), so scale jitter never trips them:
    * summarization mean r1_f 0.78 → floor 0.5; QA mean token-F1 0.41 →
    * floor 0.2; conversation retrieval mean token-F1 0.23 (chance ≈
    * 0.05 over the 500-candidate pool) → floor 0.1. */
  private lazy val floorMatRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_gate_mat")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }
  private val floorMatSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  // per-gate previous materialization, deleted once the gate is
  // re-invoked (the prior returned frame has been consumed by then —
  // bench/verify fully drain one invocation before the next), so a
  // long-lived session holds at most ONE materialization per gate
  // instead of accumulating unbounded temp parquet until JVM exit
  private val floorMatPrev =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def qualityFloor(gate: String, df: DataFrame, metricCol: String,
      floor: Double): DataFrame = {
    // materialize the per-doc metric frame FIRST: both the floor
    // aggregate and the returned rows read the materialized (narrow:
    // doc_id + a few doubles) result instead of re-running the trained
    // inference pipeline upstream twice — measured 19.2 s vs 10 s on
    // the conversation gate, whose retrieval join dominates. Linear in
    // docs, so the materialization itself scales. The cut goes through
    // a parquet write+read rather than localCheckpoint: checkpoint
    // executes the plan on the AQE-LESS toRdd path, which at 10× scale
    // ran the retrieval join 10×+ slower (static SMJ, no runtime
    // re-plan) — a write action executes the SAME plan with AQE, and
    // the frame is tiny, so the round-trip is noise.
    val s = df.sparkSession
    val path = floorMatRoot.resolve(
      s"${gate}_m${floorMatSeq.incrementAndGet()}").toString
    df.write.mode("overwrite").parquet(path)
    Option(floorMatPrev.put(gate, path)).foreach { prev =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(prev))
    }
    val mat = s.read.parquet(path)
    val bar = mat.agg(avg(col(metricCol)).as("__gate_mean"))
      .filter(col("__gate_mean") >= floor)
    mat.join(broadcast(bar)).drop("__gate_mean")
  }

  /** The TRAINED summarization path end to end (rows-only gate — model
    * fitting is not ANSI-SQL-expressible; the hash-exact metric twin is
    * `ft_summarize_eval`, and LLMSpec proves the head learns): finetune
    * an extractive head on the documents table against the tail-30
    * pseudo-gold, summarize every document with the deployed head, and
    * emit per-doc ROUGE of the TRAINED summaries. Exercises the full
    * catalog lifecycle plus the distributed window/embed/score/stitch
    * inference path at gate scale — the sibling of
    * `sim_knn_graph_trained` for the finetune surface. */
  def ft_summarize_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(t, greatest(size(t) - 29, lit(1)), lit(30))).as("gold"))
    val cat = gateCatalog(s, "summarize")
    // lean head for the gate: the lifecycle + distributed path is the
    // contract under test, not squeezing the last F1 decimal — dim 64
    // and 10 LBFGS iterations keep the trained gate bench-cheap
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "SummarGate", task = "summarization",
      data = Some(d.select($"text", $"gold")), labelCol = "gold",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    val sums = graft.llm.Finetune.summarizeText(s, cat, "SummarGate", d.select($"text"))
    qualityFloor("summarize",
      TextMetrics.rougePairs(d.join(sums, "text"), "summary", "gold")
        .select($"doc_id", $"r1_p", $"r1_r", $"r1_f", $"r2_p", $"r2_r", $"r2_f"),
      "r1_f", 0.5)
      .orderBy($"doc_id")
  }

  /** Question-answering metric path (squad-style EM + token F1 —
    * `transformers.py` QA eval contract) on a deterministic extractive
    * baseline: predicted answer = lead-10 tokens, pseudo-gold = tokens
    * 6–15 (overlapping window, so F1 lands mid-range; short docs make
    * the windows coincide, so EM is exercised non-degenerately too).
    * F1 = 2·|clipped common|/(|pred|+|gold|), ratios of exact integer
    * counts — bit-exact vs the oracle. */
  def ft_qa_eval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    Tables.documents(s, dir)
      .select($"doc_id", slice(t, 1, 10).as("tp"), slice(t, 6, 10).as("tg"))
      .select($"doc_id",
        size($"tp").cast("long").as("n_pred"),
        size($"tg").cast("long").as("n_gold"),
        TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
        when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
      .withColumn("f1",
        when($"n_pred" + $"n_gold" > 0,
          lit(2.0) * $"n_common".cast("double") /
            ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }

  /** The TRAINED QA path end to end (rows-only gate, sibling of
    * `ft_summarize_train`): finetune an extractive answer-window head
    * on the documents table — question = lead-5 tokens, pseudo-gold
    * answer = tokens 6–15 (the `ft_qa_eval` construction) — then answer
    * every document's question with the deployed head and emit per-doc
    * squad EM + token F1 of the TRAINED answers. */
  def ft_qa_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(t, 1, 5)).as("question"),
      concat_ws(" ", slice(t, 6, 10)).as("answer"))
    val cat = gateCatalog(s, "qa")
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "SquadGate", task = "question-answering",
      data = Some(d.select($"text", $"question", $"answer")),
      textCol = "text", text2Col = "question", labelCol = "answer",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    val preds = graft.llm.Finetune.answerText(s, cat, "SquadGate",
        d.select($"text".as("context"), $"question"), "context", "question")
      .select($"context", $"question".as("q2"), $"answer".as("pred"))
    qualityFloor("qa",
      d.join(preds, d("text") === preds("context") && d("question") === preds("q2"))
        .select($"doc_id",
          TextMetrics.tokens($"pred").as("tp"), TextMetrics.tokens($"answer").as("tg"))
        .select($"doc_id",
          size($"tp").cast("long").as("n_pred"),
          size($"tg").cast("long").as("n_gold"),
          TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
          when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
        .withColumn("f1",
          when($"n_pred" + $"n_gold" > 0,
            lit(2.0) * $"n_common".cast("double") /
              ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0))),
      "f1", 0.2)
      .orderBy($"doc_id")
  }

  /** Pool-size bound for the conversation eval's EXACT brute-force
    * retrieval route (r19, measured by the ft decade row): the
    * broadcast-matrix argmax is nCtx × nCand dot products — quadratic
    * when both grow with the corpus (1× 10.4 s → 10× 139 s at the
    * 50k-candidate guard, exponent 1.13). Above this bound the eval
    * routes to [[graft.llm.Finetune.respondTextAnn]] — per-query work
    * = probed-cell population, independent of pool size — the same
    * route-by-runtime-size discipline as
    * [[Components.connectedComponents]]'s union-find bound. 20 000
    * keeps exact retrieval wherever it is genuinely affordable
    * (≤ 400 M dots, a ~10 MB broadcast) and switches before the
    * quadratic wall; the graded sf corpora sit far below it, so the
    * gate's exact behavior there is byte-identical to r18. */
  val CONV_EVAL_BRUTE_FORCE_POOL_MAX = 20000L

  /** MEASURED nprobe operating point for the conversation EVAL gates
    * (`graft.tools.ConvRecall`, r20 — the measurement ADVICE r19 named
    * as the alternative to √numCells scaling): at 10× corpus scale
    * (96 cells, 50 000 queries) mean token-F1 is FLAT across nprobe —
    * 0.1984 at 2, 0.1994 at 4, 0.1989 at auto(10) — because the
    * k-means cells localize these queries (the standard IVF picture,
    * not the adversarial nprobe/numCells decay bound), while eval cost
    * scaled 23 → 88 → 112 s and the √-rule's probe-exploded broadcast
    * DIED on Spark's 8 GB HashedRelation cap at 100× (now also
    * slice-guarded in `serveConvResolved`). 4 keeps the r18 minimum-4
    * quality discipline at a broadcast payload that stays ~1 GB even
    * at 100×; the LIBRARY serve default remains auto-√numCells — a
    * serving deployment tunes nprobe against its own recall target,
    * an eval harness pins the measured point. */
  val CONV_EVAL_NPROBE = 4

  /** The TRAINED conversation path end to end (rows-only gate, sibling
    * of `ft_qa_train`): finetune a dual-encoder response-selection head
    * on (system, user, assistant) triples built from the documents
    * table — system = lead-3 tokens, user = tokens 4–8, assistant =
    * tokens 9–18 (same-doc template vocabulary makes the true response
    * retrievable above chance) — then respond to every context by
    * retrieval over the full assistant pool and emit per-doc EM +
    * token F1 of the RETRIEVED responses vs gold. Retrieval is ADAPTIVE
    * (see [[CONV_EVAL_BRUTE_FORCE_POOL_MAX]]): exact broadcast argmax
    * while the pool is small, IVF maximum-inner-product search above —
    * LLMSpec pins probe-all ANN retrieval exactly equal to the exact
    * route, and the same 0.2 F1 floor applies on either route. */
  def ft_conversation_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(t, 1, 3)).as("system"),
      concat_ws(" ", slice(t, 4, 5)).as("user"),
      concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    val cat = gateCatalog(s, "conversation")
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "ConvGate", task = "conversation",
      data = Some(d.select($"system", $"user", $"assistant")),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    // O(1)-result agg buys the route decision (the Components pattern)
    val nPool = d.select($"assistant").distinct().count()
    val resp =
      if (nPool <= CONV_EVAL_BRUTE_FORCE_POOL_MAX)
        graft.llm.Finetune.respondText(s, cat, "ConvGate",
          d.select($"system", $"user"), "system", "user",
          candidates = d.select($"assistant".as("response")))
      else
        graft.llm.Finetune.respondTextAnn(s, cat, "ConvGate",
          d.select($"system", $"user"), "system", "user",
          candidates = d.select($"assistant".as("response")),
          nprobe = CONV_EVAL_NPROBE)
    qualityFloor("conversation",
      d.join(resp, Seq("system", "user"))
        .select($"doc_id",
          TextMetrics.tokens($"response").as("tp"),
          TextMetrics.tokens($"assistant").as("tg"))
        .select($"doc_id",
          size($"tp").cast("long").as("n_pred"),
          size($"tg").cast("long").as("n_gold"),
          TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
          when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
        .withColumn("f1",
          when($"n_pred" + $"n_gold" > 0,
            lit(2.0) * $"n_common".cast("double") /
              ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0))),
      "f1", 0.1)
      .orderBy($"doc_id")
  }

  /** The conversation SERVING path at scale (rows-only gate, twin of
    * `ft_conversation_train`): inference runs `respondTextAnn` — the
    * IVF maximum-inner-product search the `respondText` broadcast guard
    * names as its routing message — off the PERSISTENT pool index. The
    * candidate pool stays DISTRIBUTED (no driver collect); top-1
    * retrieval is a trained-quantizer cell equi-join against a
    * partition-pruned read of the cell-partitioned store (plan-audited:
    * `ft_conversation_ann_serve` in PLANS.md); per-query work is
    * probed-cell population, not pool size — the shape that turns the
    * broadcast twin's measured worst-case super-linear slope (SCALE.md:
    * exponent 1.16 AT the 50k guard) into in-cell work.
    *
    * Measured shape is TRAIN-ONCE-SERVE-MANY, the production serving
    * lifecycle: the first invocation in a session pays the finetune +
    * one index build; every later invocation serves off the deployed
    * head and the content-addressed index (reuse is fingerprint-
    * verified, never assumed). The training lifecycle itself is
    * re-measured EVERY pass by the `ft_conversation_train` twin, so
    * nothing escapes the bench — this gate measures the serving path
    * its scaladoc claims. Retrieval is approximate (recall rises with
    * nprobe), so the floor sits at the same 0.1 as the exact twin,
    * re-verified on every invocation: LLMSpec pins probe-all parity
    * exactly, and the measured mean F1 at gate scale rides well above
    * chance. */
  def ft_conversation_ann(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(t, 1, 3)).as("system"),
      concat_ws(" ", slice(t, 4, 5)).as("user"),
      concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    val cat = gateCatalog(s, "conversation_ann")
    if (cat.deployedModelId("ConvGateAnn").isEmpty)
      graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
        projectName = "ConvGateAnn", task = "conversation",
        data = Some(d.select($"system", $"user", $"assistant")),
        textCol = "system", text2Col = "user", labelCol = "assistant",
        dim = 64, hyperparams = Map("max_iter" -> "10")))
    val resp = graft.llm.Finetune.respondTextAnn(s, cat, "ConvGateAnn",
      d.select($"system", $"user"), "system", "user",
      candidates = d.select($"assistant".as("response")),
      nprobe = CONV_EVAL_NPROBE)
    qualityFloor("conversation_ann",
      d.join(resp, Seq("system", "user"))
        .select($"doc_id",
          TextMetrics.tokens($"response").as("tp"),
          TextMetrics.tokens($"assistant").as("tg"))
        .select($"doc_id",
          size($"tp").cast("long").as("n_pred"),
          size($"tg").cast("long").as("n_gold"),
          TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
          when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
        .withColumn("f1",
          when($"n_pred" + $"n_gold" > 0,
            lit(2.0) * $"n_common".cast("double") /
              ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0))),
      "f1", 0.1)
      .orderBy($"doc_id")
  }

  val ftQaSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, t[1:10] AS tp, t[6:15] AS tg FROM tk),
       |ov AS (
       |  SELECT doc_id,
       |    CAST(len(tp) AS BIGINT) AS n_pred, CAST(len(tg) AS BIGINT) AS n_gold,
       |    CAST(${overlapSql("tp", "tg")} AS BIGINT) AS n_common,
       |    CASE WHEN array_to_string(tp, ' ') = array_to_string(tg, ' ')
       |         THEN 1 ELSE 0 END AS em0
       |  FROM w)
       |SELECT doc_id, n_pred, n_gold, n_common, CAST(em0 AS BIGINT) AS em,
       |  CASE WHEN n_pred + n_gold > 0
       |       THEN 2.0 * CAST(n_common AS DOUBLE) / CAST(n_pred + n_gold AS DOUBLE)
       |       ELSE 0.0 END AS f1
       |FROM ov ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- BLEU
  def lm_bleu_corpus(s: SparkSession, dir: String): DataFrame =
    TextMetrics.bleuCorpus(pairs(s, dir), "pred", "ref")

  val lmBleuSql: String = {
    val perN = (1 to 4).map { n =>
      s"""    ${overlapSql(ngramSql("tp", n), ngramSql("tr", n))} AS m$n,
         |    len(${ngramSql("tp", n)}) AS t$n""".stripMargin
    }.mkString(",\n")
    val sums = (1 to 4).map(n =>
      s"CAST(sum(m$n) AS BIGINT) AS match_$n, CAST(sum(t$n) AS BIGINT) AS total_$n")
      .mkString(", ")
    // smooth_k = 2^(#zero-match orders ≤ n), NIST geometric smoothing
    val z = (1 to 4).map(n => s"CASE WHEN match_$n = 0 THEN 1 ELSE 0 END")
    val p = (1 to 4).map { n =>
      val k = z.take(n).mkString(" + ")
      s"""CASE WHEN total_$n = 0 THEN 0.0
         |  WHEN match_$n = 0 THEN 100.0 / (power(2.0, $k) * total_$n)
         |  ELSE 100.0 * match_$n / total_$n END""".stripMargin
    }
    s"""WITH $pairsSqlCte,
       |per AS (
       |  SELECT
       |$perN,
       |    len(tp) AS plen, len(tr) AS rlen
       |  FROM pr),
       |sums AS (
       |  SELECT $sums,
       |    CAST(sum(plen) AS BIGINT) AS pred_len, CAST(sum(rlen) AS BIGINT) AS ref_len
       |  FROM per),
       |sc AS (
       |  SELECT *,
       |    CASE WHEN pred_len >= ref_len THEN 1.0
       |         ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / pred_len) END AS bp,
       |    ${p(0)} AS p1, ${p(1)} AS p2, ${p(2)} AS p3, ${p(3)} AS p4
       |  FROM sums)
       |SELECT match_1, total_1, match_2, total_2, match_3, total_3,
       |  match_4, total_4, pred_len, ref_len,
       |  CAST(bp AS REAL) AS brevity_penalty,
       |  CAST(CASE WHEN p1 = 0.0 OR p2 = 0.0 OR p3 = 0.0 OR p4 = 0.0 THEN 0.0
       |       ELSE bp * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4) END AS REAL) AS bleu
       |FROM sc""".stripMargin
  }

  // ------------------------------------------------------- Exact match
  /** Deterministic mixed pairs: every third document's "prediction"
    * differs only by case/whitespace (normalized hit); the rest get a
    * token appended (miss) — exercises the normalization, lands at ~1/3. */
  def lm_exact_match(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.documents(s, dir).select(
      $"text".as("pred"),
      when($"doc_id" % 3 === 0, concat(upper($"text"), lit("  ")))
        .otherwise(concat($"text", lit(" extra"))).as("ref"))
    TextMetrics.exactMatch(pairs, "pred", "ref")
  }

  val lmExactMatchSql: String = {
    val norm = (x: String) =>
      s"array_to_string(list_filter(regexp_split_to_array(trim(lower($x)), '\\s+'), t -> len(t) > 0), ' ')"
    s"""WITH p AS (
       |  SELECT text AS pred,
       |    CASE WHEN doc_id % 3 = 0 THEN upper(text) || '  '
       |         ELSE text || ' extra' END AS ref
       |  FROM documents),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN ${norm("pred")} = ${norm("ref")} THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM p)
       |SELECT n_pairs, n_match,
       |  CAST(CAST(n_match AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS REAL) AS exact_match
       |FROM agg""".stripMargin
  }

  // -------------------------------------------------------- Perplexity
  def lm_perplexity_unigram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextMetrics.perplexityUnigram(
      Tables.documents(s, dir).select($"text"), "text")
  }

  val lmPerplexitySql: String =
    """WITH tk AS (
      |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |w AS (SELECT unnest(t) AS w FROM tk),
      |c AS (SELECT w, count(*) AS c FROM w GROUP BY w)
      |SELECT
      |  CAST(exp(ln(CAST(sum(c) AS DOUBLE))
      |    - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE)) AS REAL) AS perplexity,
      |  CAST(sum(c) AS BIGINT) AS total_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab_size
      |FROM c""".stripMargin

  /** The TRAINED text-generation path end to end (rows-only gate,
    * sibling of `ft_summarize_train` — n-gram counting is
    * SQL-expressible but the full backoff-LM lifecycle is not; the
    * GenerativeSpec cyclic-corpus test pins exact greedy behavior):
    * finetune a trigram stupid-backoff LM on the documents table,
    * greedily continue each document's lead-2 prompt by 8 tokens with
    * the deployed model, and emit per-doc token-F1 of the generated
    * continuation vs the document's actual tokens 3–12 (8 generated vs
    * 10 gold caps a perfect continuation's F1 at 16/18 ≈ 0.89). The template
    * corpus makes continuations predictable — measured mean F1 0.234
    * at BOTH sf0.01 and sf0.1 — and the floor sits at half the
    * measured value (the ft_*_train convention). */
  def ft_generate_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(t, 1, 2)).as("prompt"),
      concat_ws(" ", slice(t, 3, 10)).as("gold"))
    val cat = gateCatalog(s, "generate")
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "GenGate", task = "text-generation",
      data = Some(d.select($"text"))))
    val gen = graft.llm.Generative.generateText(s, cat, "GenGate",
      d.select($"prompt").distinct(), "prompt", maxNewTokens = 8)
    qualityFloor("generate",
      d.join(gen, "prompt")
        .select($"doc_id",
          TextMetrics.tokens($"generated").as("tp"),
          TextMetrics.tokens($"gold").as("tg"))
        .select($"doc_id",
          size($"tp").cast("long").as("n_pred"),
          size($"tg").cast("long").as("n_gold"),
          TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
          when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
        .withColumn("f1",
          when($"n_pred" + $"n_gold" > 0,
            lit(2.0) * $"n_common".cast("double") /
              ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0))),
      "f1", 0.12)
      .orderBy($"doc_id")
  }

  /** The TRAINED translation path end to end (rows-only gate, sibling
    * of `ft_generate_train`): build a parallel corpus by token-level
    * cipher (target token = reversed source token — a bijective
    * word-level mapping IBM Model 1 provably recovers from
    * co-occurrence, GenerativeSpec), finetune Model 1 by distributed
    * EM on lead-8-token sentences, decode every source with the
    * deployed lexicon, and emit per-doc token accuracy vs the ciphered
    * gold. Frequent template words decode near-exactly — floor 0.5. */
  def ft_translate_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id",
      concat_ws(" ", slice(t, 1, 8)).as("src"))
      .withColumn("tgt", concat_ws(" ",
        transform(split($"src", " "), w => reverse(w))))
    val cat = gateCatalog(s, "translate")
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "XlatGate", task = "translation",
      data = Some(d.select($"src", $"tgt")),
      textCol = "src", labelCol = "tgt",
      hyperparams = Map("em_iters" -> "4")))
    val tr = graft.llm.Generative.translateText(s, cat, "XlatGate",
      d.select($"src").distinct(), "src")
    qualityFloor("translate",
      d.join(tr, "src")
        .select($"doc_id",
          TextMetrics.tokens($"translated").as("tp"),
          TextMetrics.tokens($"tgt").as("tg"))
        .select($"doc_id",
          size($"tp").cast("long").as("n_pred"),
          size($"tg").cast("long").as("n_gold"),
          TextMetrics.clippedOverlap($"tp", $"tg").cast("long").as("n_common"),
          when($"tp" === $"tg", 1L).otherwise(0L).as("em"))
        .withColumn("f1",
          when($"n_pred" + $"n_gold" > 0,
            lit(2.0) * $"n_common".cast("double") /
              ($"n_pred" + $"n_gold").cast("double")).otherwise(lit(0.0))),
      "f1", 0.5)
      .orderBy($"doc_id")
  }

  /** Hash-exact TRAIN twin of [[ft_translate_train]] (the
    * `ta_unigram_train1` pattern, VERDICT r19 item 1): replay ONE EM
    * round of IBM Model 1 from the uniform init on the SAME
    * sentence-pair construction (lead-8-token source, reversed-word
    * cipher target), where the round-1 posterior is the exact rational
    * 1/|es| per alignment slot — see
    * [[graft.llm.Generative.ibm1Round1CountsQ]] for the integer-scaling
    * argument. The full iterative trainer stays the rows-only
    * metric-floored surface; this gate pins the alignment-frame
    * mechanics (NULL slot, duplicate slots, empty filters) and the
    * E-step/M-step algebra bit-for-bit against a DuckDB replay.
    * Reference anchor: the tune path transformers.py:876-968 whose
    * translation lifecycle these gates reproduce. */
  def ft_translate_train1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id",
      concat_ws(" ", slice(t, 1, 8)).as("src"))
      .withColumn("tgt", concat_ws(" ",
        transform(split($"src", " "), w => reverse(w))))
    graft.llm.Generative.ibm1Round1CountsQ(d.select($"src", $"tgt"),
      "src", "tgt")
      .orderBy($"e", $"f")
  }

  private val ftTranslateTrain1Sql: String =
    """WITH tk AS (
      |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                     x -> len(x) > 0)[1:8] AS srcs
      |  FROM documents),
      |prep AS (
      |  SELECT list_prepend(chr(1) || 'NULL' || chr(1), srcs) AS es,
      |         list_transform(srcs, w -> reverse(w)) AS fs
      |  FROM tk WHERE len(srcs) > 0),
      |ex AS (
      |  SELECT u2.e, u1.f, 2520 // len(p.es) AS w
      |  FROM prep p, unnest(p.fs) AS u1(f), unnest(p.es) AS u2(e)),
      |cnt AS (
      |  SELECT e, f, CAST(sum(w) AS BIGINT) AS cnt FROM ex GROUP BY e, f),
      |tot AS (
      |  SELECT e, CAST(sum(cnt) AS BIGINT) AS ce FROM cnt GROUP BY e)
      |SELECT c.e, c.f, c.cnt, t.ce, (c.cnt * 1000000) // t.ce AS tq
      |FROM cnt c JOIN tot t USING (e)
      |ORDER BY e, f""".stripMargin

  /** Hash-exact TRAIN twin of [[ft_generate_train]] (the
    * [[ft_translate_train1]] pattern, same round): the trigram/bigram
    * per-context argmax tables plus the global unigram top that
    * [[graft.llm.Generative.finetuneGeneration]] trains and greedy
    * decode serves — see [[graft.llm.Generative.lmArgmaxTablesQ]] —
    * replayed on the SAME corpus by a DuckDB count + window-argmax
    * oracle. n-gram counts are exact integers and the production tie
    * rule (max count, ties to the greater token — Spark's struct max)
    * is `ORDER BY cnt DESC, w DESC` in SQL, so the full (n, ctx, w,
    * cnt) model hashes bit-for-bit. The full lifecycle (random split,
    * held-out perplexity, deploy policy) stays the rows-only
    * metric-floored surface of [[ft_generate_train]]. */
  def ft_generate_train1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.llm.Generative.lmArgmaxTablesQ(
      Tables.documents(s, dir).select($"text"), "text")
      .orderBy($"n", $"ctx")
  }

  private val ftGenerateTrain1Sql: String =
    """WITH tk AS (
      |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                     x -> len(x) > 0) AS t
      |  FROM documents),
      |tri AS (
      |  SELECT t[i] || chr(1) || t[i+1] AS ctx, t[i+2] AS w, count(*) AS cnt
      |  FROM tk, unnest(range(1, len(t) - 1)) AS u(i) GROUP BY 1, 2),
      |bi AS (
      |  SELECT t[i] AS ctx, t[i+1] AS w, count(*) AS cnt
      |  FROM tk, unnest(range(1, len(t))) AS u(i) GROUP BY 1, 2),
      |uni AS (
      |  SELECT u.w AS w, count(*) AS cnt FROM tk, unnest(t) AS u(w)
      |  GROUP BY 1),
      |p3 AS (SELECT 3 AS n, ctx, w, cnt, row_number()
      |         OVER (PARTITION BY ctx ORDER BY cnt DESC, w DESC) AS rn
      |       FROM tri),
      |p2 AS (SELECT 2 AS n, ctx, w, cnt, row_number()
      |         OVER (PARTITION BY ctx ORDER BY cnt DESC, w DESC) AS rn
      |       FROM bi),
      |p1 AS (SELECT 1 AS n, '' AS ctx, w, cnt, row_number()
      |         OVER (ORDER BY cnt DESC, w DESC) AS rn
      |       FROM uni)
      |SELECT n, ctx, w, CAST(cnt AS BIGINT) AS cnt FROM p3 WHERE rn = 1
      |UNION ALL
      |SELECT n, ctx, w, CAST(cnt AS BIGINT) AS cnt FROM p2 WHERE rn = 1
      |UNION ALL
      |SELECT n, ctx, w, CAST(cnt AS BIGINT) AS cnt FROM p1 WHERE rn = 1
      |ORDER BY n, ctx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_rouge_pairs"        -> lm_rouge_pairs _,
    "lm_bleu_corpus"        -> lm_bleu_corpus _,
    "lm_exact_match"        -> lm_exact_match _,
    "lm_perplexity_unigram" -> lm_perplexity_unigram _,
    "ft_summarize_eval"     -> ft_summarize_eval _,
    "ft_summarize_train"    -> ft_summarize_train _,
    "ft_qa_eval"            -> ft_qa_eval _,
    "ft_qa_train"           -> ft_qa_train _,
    "ft_conversation_train" -> ft_conversation_train _,
    "ft_conversation_ann"   -> ft_conversation_ann _,
    "ft_generate_train"     -> ft_generate_train _,
    "ft_translate_train"    -> ft_translate_train _,
    "ft_translate_train1"   -> ft_translate_train1 _,
    "ft_generate_train1"    -> ft_generate_train1 _
  )

  val oracles: Map[String, String] = Map(
    "lm_rouge_pairs"        -> lmRougeSql,
    "lm_bleu_corpus"        -> lmBleuSql,
    "lm_exact_match"        -> lmExactMatchSql,
    "lm_perplexity_unigram" -> lmPerplexitySql,
    "ft_summarize_eval"     -> ftSummarizeSql,
    "ft_qa_eval"            -> ftQaSql,
    "ft_translate_train1"   -> ftTranslateTrain1Sql,
    "ft_generate_train1"    -> ftGenerateTrain1Sql
  )
}
