package graft.llm

import graft.ml.{Catalog, Metrics, Sampling}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `finetune` — RUNNABLE text-classification paths on the bare JVM.
  *
  * The reference's finetune (`src/api.rs:2133-2216`,
  * `transformers.py:876-1111`) runs an HF Trainer over a pretrained
  * transformer; that requires a neural runtime this container does not
  * ship. The surface is closed honestly instead of erroring: the text
  * column embeds through the named ModelRuntime (distributed
  * mapPartitions, any registered runtime — `hashing_tf` by default,
  * an ONNX encoder when mounted) and a logistic head fits on the
  * embeddings — exactly the "frozen encoder + trained classification
  * head" shape, with the same project/snapshot/model/deploy catalog
  * lifecycle as `train()`.
  *
  * `text-pair-classification` (NLI/paraphrase shape,
  * `transformers.py:1401-1453`) rides the same path: the reference
  * feeds the (text1, text2) pair to a pair-aware tokenizer; here the
  * pair is joined with a separator token before the frozen encoder —
  * the sequence-pair packing a pair tokenizer performs, made explicit.
  *
  * `summarization` (`transformers.py:1598-1735`) TRAINS as an
  * extractive head: documents split into fixed token windows
  * ("sentences" — the synthetic corpora carry no punctuation), each
  * window embeds through the frozen encoder, and a logistic head
  * learns to score windows for inclusion against the standard
  * extractive oracle labels (the top-k windows by clipped token
  * overlap with the gold summary — BertSum's greedy oracle,
  * simplified to one pass). Inference stitches the k highest-scoring
  * windows back in document order; evaluation is the same ROUGE
  * machinery as the `ft_summarize_eval` gate.
  *
  * `question-answering` (`transformers.py` QA finetune; squad shape)
  * trains the same way at WINDOW granularity: context splits into
  * token windows, each (question ⊕ [SEP] ⊕ window) pair embeds through
  * the frozen encoder, and the head learns to score windows for
  * answer-bearing-ness (oracle label: the window with maximal clipped
  * token overlap with the gold answer). Inference returns the best
  * window as the extracted answer — window-granular, not
  * character-span-granular (documented deviation: span extraction
  * inside a window needs token-level logits, i.e. a neural trainer);
  * evaluation is squad EM + token F1 over the predicted windows.
  * `conversation` (`transformers.py:1823-1861` — (system, user,
  * assistant) triples into a causal-LM trainer) TRAINS as a
  * DUAL-ENCODER response-selection head — the standard retrieval
  * chatbot baseline: context (system ⊕ [SEP] ⊕ user) and response
  * embed separately through the frozen encoder, and a logistic head
  * learns on the ELEMENT-WISE PRODUCT of the two vectors against
  * true-pair positives and deterministic in-bucket shifted negatives.
  * Because the learned score is w·(c⊙r) + b = (w⊙c)·r + b, candidate
  * response embeddings precompute once and inference is a top-1
  * dot-product retrieval with a reweighted query — the same shape as
  * the ANN operators, so the candidate pool can route through IVF/LSH
  * past the broadcast guard. Generating novel text (abstractive
  * response synthesis) still needs a neural trainer — the
  * translation/text-generation tasks route to the
  * classical-statistical [[Generative]] trainers (trigram backoff LM,
  * IBM Model 1), compat-flagged in the model ledger.
  */
object Finetune {
  /** Separator between the members of a text pair — the JVM analog of
    * the tokenizer's `[SEP]` in `tokenizer(text1, text2)`. */
  val PAIR_SEP = " [SEP] "

  final case class FinetuneConfig(
      projectName: String,
      task: String = "text-classification",
      relationName: String = "",
      data: Option[DataFrame] = None,
      textCol: String = "text",
      text2Col: String = "text2",
      labelCol: String = "label",
      runtime: String = "hashing_tf",
      dim: Int = 256,
      testSize: Double = 0.25,
      hyperparams: Map[String, String] = Map.empty,
      automaticDeploy: Boolean = true,
      seed: Long = 42L)

  private val RUNNABLE_TASKS =
    Set("text-classification", "text-pair-classification", "summarization",
      "question-answering", "conversation", "text-generation", "translation")

  def finetune(spark: SparkSession, catalog: Catalog, cfg: FinetuneConfig): DataFrame = {
    require(RUNNABLE_TASKS.contains(cfg.task),
      s"finetune task '${cfg.task}' is not a supported finetune task; " +
        "runnable: text-classification, text-pair-classification, the " +
        "extractive summarization / question-answering / conversation heads, " +
        "and the classical-statistical text-generation (trigram LM) / " +
        "translation (IBM Model 1) trainers — see Generative scaladoc")
    if (cfg.task == "text-generation")
      return Generative.finetuneGeneration(spark, catalog, Generative.GenConfig(
        projectName = cfg.projectName, relationName = cfg.relationName,
        data = cfg.data, textCol = cfg.textCol, testSize = cfg.testSize,
        hyperparams = cfg.hyperparams, automaticDeploy = cfg.automaticDeploy,
        seed = cfg.seed))
    if (cfg.task == "translation")
      return Generative.finetuneTranslation(spark, catalog, Generative.XlatConfig(
        projectName = cfg.projectName, relationName = cfg.relationName,
        data = cfg.data, srcCol = cfg.textCol, tgtCol = cfg.labelCol,
        testSize = cfg.testSize, hyperparams = cfg.hyperparams,
        automaticDeploy = cfg.automaticDeploy, seed = cfg.seed))
    if (cfg.task == "summarization")
      return finetuneSummarization(spark, catalog, cfg)
    if (cfg.task == "question-answering")
      return finetuneQa(spark, catalog, cfg)
    if (cfg.task == "conversation")
      return finetuneConversation(spark, catalog, cfg)
    val isPair = cfg.task == "text-pair-classification"
    val t0 = System.nanoTime()
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == cfg.task,
          s"Project ${cfg.projectName} already exists with a different task: ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, cfg.task)
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName, Seq(cfg.labelCol),
      cfg.testSize, "random", df0.schema.json)

    // text-pair: pack the pair into one sequence before the frozen
    // encoder (map-stage concat — the pair tokenizer's job, explicit)
    val df =
      if (isPair)
        df0.select(concat(col(cfg.textCol), lit(PAIR_SEP), col(cfg.text2Col))
          .as(cfg.textCol), col(cfg.labelCol))
      else df0

    // frozen encoder: cached so ONE embed pass serves the emptiness
    // probes, every LBFGS iteration, and the eval transform (uncached,
    // the frozen-encoder map would re-run up to 4x per finetune)
    val embedded = Ops.embedColumn(df.select(col(cfg.textCol), col(cfg.labelCol)),
        cfg.runtime, cfg.textCol, "emb", dim = cfg.dim)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
      .withColumn("y", col(cfg.labelCol).cast("double"))
      .cache()
    val (trainDF0, testDF0) = Sampling.splitByFraction(
      embedded, Seq(cfg.textCol), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (embedded, embedded) else (trainDF0, testDF0)
    val lr = new LogisticRegression()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(cfg.hyperparams.get("max_iter").map(_.toInt).getOrElse(100))
      .setRegParam(cfg.hyperparams.get("alpha").map(_.toDouble).getOrElse(0.0))
    val head = graft.ml.LocalLogistic.fitHeadPipeline(lr, trainDF) // driver route (r21)
    val fitTime = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val rep = Metrics.classification(head.transform(testDF), "y", "prediction")
    embedded.unpersist()
    // weighted averages, matching the reference's text-classification
    // eval (sklearn average="weighted", transformers.py:719-721)
    // "f1" is ALWAYS the weighted value from here on (deploy compares
    // like with like); the macro value rides along under its own key
    val metrics = Map(
      "f1" -> rep.f1Weighted, "f1_macro" -> rep.f1Macro,
      "accuracy" -> rep.accuracy,
      "precision" -> rep.precisionWeighted, "recall" -> rep.recallWeighted,
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id,
      s"finetune:${cfg.runtime}",
      cfg.hyperparams ++ Map("runtime" -> cfg.runtime, "dim" -> cfg.dim.toString,
        "task" -> cfg.task, "text2_col" -> (if (isPair) cfg.text2Col else "")),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    graft.ml.PipelineIO.save(head, path) // driver-side, zero jobs (r21)
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      s"finetuned ${cfg.runtime} head for ${cfg.task}: " +
        metrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "f1")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy &&
      deployed.forall(old => rep.f1Weighted > old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(cfg.projectName, cfg.task, s"finetune:${cfg.runtime}", shouldDeploy)),
      schema)
  }

  /** Fixed token windows of a token array: window i = tokens
    * [i·n+1, i·n+n]. The "sentence" unit of the extractive path —
    * punctuation-free corpora get uniform windows, punctuated text can
    * pre-split upstream and pass windows of 1 sentence. */
  private def tokenWindows(toks: Column, n: Int): Column =
    transform(sequence(lit(0), floor((size(toks) - 1) / n).cast("int")),
      i => concat_ws(" ", slice(toks, i * n + lit(1), lit(n))))

  /** Trained head → per-doc summary: the topK windows by P(include),
    * ties to the earlier window, stitched back in DOCUMENT order. */
  private def stitchSummaries(scored: DataFrame, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_uid")).orderBy(col("p1").desc, col("sent_idx"))
    scored
      .withColumn("p1",
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .groupBy(col("doc_uid"))
      .agg(first(col("doc_text")).as("doc_text"),
        first(col("gold")).as("gold"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sent_idx"), col("sent")))),
          x => x.getField("sent"))).as("summary"))
  }

  /** Extractive summarization finetune — see the object doc. Gold
    * summaries arrive in `cfg.labelCol`; `sentence_tokens` (default 20)
    * and `top_k` (default 3) ride in `cfg.hyperparams`. */
  private def finetuneSummarization(spark: SparkSession, catalog: Catalog,
      cfg: FinetuneConfig): DataFrame = {
    val t0 = System.nanoTime()
    val sentTok = cfg.hyperparams.get("sentence_tokens").map(_.toInt).getOrElse(20)
    val topK = cfg.hyperparams.get("top_k").map(_.toInt).getOrElse(3)
    require(sentTok > 0 && topK > 0, "sentence_tokens and top_k must be positive")
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == cfg.task,
          s"Project ${cfg.projectName} already exists with a different task: ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, cfg.task)
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName, Seq(cfg.labelCol),
      cfg.testSize, "random", df0.schema.json)

    val docs = df0
      .select(xxhash64(col(cfg.textCol)).as("doc_uid"),
        col(cfg.textCol).as("doc_text"), col(cfg.labelCol).as("gold"))
      .filter(size(TextMetrics.tokens(col("doc_text"))) > 0)
    val wins = docs.select(col("doc_uid"), col("doc_text"), col("gold"),
      posexplode(tokenWindows(TextMetrics.tokens(col("doc_text")), sentTok))
        .as(Seq("sent_idx", "sent")))
    // extractive oracle labels: topK windows by clipped token overlap
    // with the gold summary (ties → earlier window) — the one-pass form
    // of BertSum's greedy oracle
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_uid")).orderBy(col("ov").desc, col("sent_idx"))
    val labeled = wins
      .withColumn("ov", TextMetrics.clippedOverlap(
        TextMetrics.tokens(col("sent")), TextMetrics.tokens(col("gold"))))
      // ov > 0 guard mirrors finetuneQa: a window with ZERO gold overlap
      // is never a positive example, even when the doc has fewer than
      // topK overlapping windows (short docs, disjoint golds)
      .withColumn("y",
        (row_number().over(ow) <= topK && col("ov") > 0).cast("double"))
      .drop("ov")
    // frozen encoder over the windows, scoring head on the vectors
    val embedded = Ops.embedColumn(labeled, cfg.runtime, "sent", "emb", dim = cfg.dim)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
      .cache() // one embed pass for probes + LBFGS + eval
    // split BY DOCUMENT — window rows of one doc never straddle the split
    val (trainDF0, testDF0) = Sampling.splitByFraction(
      embedded, Seq("doc_uid"), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (embedded, embedded)
      else (trainDF0, testDF0)
    val lr = new LogisticRegression()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(cfg.hyperparams.get("max_iter").map(_.toInt).getOrElse(100))
      .setRegParam(cfg.hyperparams.get("alpha").map(_.toDouble).getOrElse(0.0))
    val head = graft.ml.LocalLogistic.fitHeadPipeline(lr, trainDF) // driver route (r21)
    val fitTime = (System.nanoTime() - t0) / 1e9

    // eval on held-out docs with the task's OWN metric: ROUGE of the
    // stitched top-k summaries vs gold (transformers.py:650-682 shape)
    val t1 = System.nanoTime()
    val rouge = TextMetrics.rougeAvg(
      stitchSummaries(head.transform(testDF), topK), "summary", "gold").head()
    embedded.unpersist()
    val metrics = Map(
      "rouge_ngram_f1" -> rouge.getDouble(0),
      "rouge_ngram_precision" -> rouge.getDouble(1),
      "rouge_ngram_recall" -> rouge.getDouble(2),
      "rouge_bigram_f1" -> rouge.getDouble(3),
      "rouge_bigram_precision" -> rouge.getDouble(4),
      "rouge_bigram_recall" -> rouge.getDouble(5),
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id,
      s"finetune:${cfg.runtime}",
      cfg.hyperparams ++ Map("runtime" -> cfg.runtime, "dim" -> cfg.dim.toString,
        "task" -> cfg.task, "sentence_tokens" -> sentTok.toString,
        "top_k" -> topK.toString, "text2_col" -> ""),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    graft.ml.PipelineIO.save(head, path) // driver-side, zero jobs (r21)
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      s"finetuned ${cfg.runtime} extractive summarization head: " +
        metrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "rouge_ngram_f1")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy &&
      deployed.forall(old => metrics("rouge_ngram_f1") > old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(cfg.projectName, cfg.task, s"finetune:${cfg.runtime}", shouldDeploy)),
      schema)
  }

  /** Summarize raw text with a finetuned summarization project: window
    * with the recorded `sentence_tokens`, embed with the recorded
    * runtime/dim, score with the trained head, stitch the recorded
    * `top_k` windows in document order. Returns one row per distinct
    * input text: (textCol, summary). */
  def summarizeText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, textCol: String = "text"): DataFrame = {
    val modelId = catalog.deployedModelId(project).getOrElse(
      throw new IllegalStateException(s"Project '$project' has no deployed model"))
    val hp = catalog.models.filter(col("id") === modelId).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"Model $modelId missing from catalog")).hyperparams
    require(hp.get("task").contains("summarization"),
      s"Project '$project' is not a summarization project")
    val head = graft.ml.Predict.findCached(catalog, modelId)
    val wins = df
      .select(xxhash64(col(textCol)).as("doc_uid"), col(textCol).as("doc_text"),
        lit("").as("gold"))
      .filter(size(TextMetrics.tokens(col("doc_text"))) > 0)
      .select(col("doc_uid"), col("doc_text"), col("gold"),
        posexplode(tokenWindows(TextMetrics.tokens(col("doc_text")),
          hp("sentence_tokens").toInt)).as(Seq("sent_idx", "sent")))
    val embedded = Ops.embedColumn(wins, hp("runtime"), "sent", "emb",
        dim = hp("dim").toInt)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
    stitchSummaries(head.transform(embedded), hp("top_k").toInt)
      .select(col("doc_text").as(textCol), col("summary"))
  }

  /** Best-scoring window per doc from a trained QA head. */
  private def pickAnswers(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_uid")).orderBy(col("p1").desc, col("sent_idx"))
    scored
      .withColumn("p1",
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  /** Extractive QA finetune — see the object doc. Context arrives in
    * `cfg.textCol`, the question in `cfg.text2Col`, the gold answer in
    * `cfg.labelCol`; `sentence_tokens` (default 10 — answers are short)
    * rides in hyperparams. */
  private def finetuneQa(spark: SparkSession, catalog: Catalog,
      cfg: FinetuneConfig): DataFrame = {
    val t0 = System.nanoTime()
    val sentTok = cfg.hyperparams.get("sentence_tokens").map(_.toInt).getOrElse(10)
    require(sentTok > 0, "sentence_tokens must be positive")
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == cfg.task,
          s"Project ${cfg.projectName} already exists with a different task: ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, cfg.task)
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName, Seq(cfg.labelCol),
      cfg.testSize, "random", df0.schema.json)

    val rows = df0
      .select(xxhash64(col(cfg.textCol), col(cfg.text2Col)).as("doc_uid"),
        col(cfg.textCol).as("ctx"), col(cfg.text2Col).as("question"),
        col(cfg.labelCol).as("answer"))
      .filter(size(TextMetrics.tokens(col("ctx"))) > 0)
    val wins = rows.select(col("doc_uid"), col("question"), col("answer"),
      posexplode(tokenWindows(TextMetrics.tokens(col("ctx")), sentTok))
        .as(Seq("sent_idx", "sent")))
    // oracle label: THE answer-bearing window — max clipped overlap with
    // the gold answer, ties → earlier; docs whose answer overlaps no
    // window at all contribute only negatives
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_uid")).orderBy(col("ov").desc, col("sent_idx"))
    val labeled = wins
      .withColumn("ov", TextMetrics.clippedOverlap(
        TextMetrics.tokens(col("sent")), TextMetrics.tokens(col("answer"))))
      .withColumn("y",
        (row_number().over(ow) === 1 && col("ov") > 0).cast("double"))
      .drop("ov")
    // (question ⊕ [SEP] ⊕ window) through the frozen encoder — the QA
    // tokenizer's sequence-pair packing, explicit
    val packed = labeled.withColumn("pair",
      concat(col("question"), lit(PAIR_SEP), col("sent")))
    val embedded = Ops.embedColumn(packed, cfg.runtime, "pair", "emb", dim = cfg.dim)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
      .cache() // one embed pass for probes + LBFGS + eval
    val (trainDF0, testDF0) = Sampling.splitByFraction(
      embedded, Seq("doc_uid"), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (embedded, embedded)
      else (trainDF0, testDF0)
    val lr = new LogisticRegression()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(cfg.hyperparams.get("max_iter").map(_.toInt).getOrElse(100))
      .setRegParam(cfg.hyperparams.get("alpha").map(_.toDouble).getOrElse(0.0))
    val head = graft.ml.LocalLogistic.fitHeadPipeline(lr, trainDF) // driver route (r21)
    val fitTime = (System.nanoTime() - t0) / 1e9

    // eval: squad EM + token F1 of the predicted window vs the gold
    // answer on held-out docs (EM is window-granular by construction)
    val t1 = System.nanoTime()
    val picked = pickAnswers(head.transform(testDF))
      .withColumn("tp", TextMetrics.tokens(col("sent")))
      .withColumn("tg", TextMetrics.tokens(col("answer")))
      .withColumn("ncommon", TextMetrics.clippedOverlap(col("tp"), col("tg")))
      .select(
        (col("tp") === col("tg")).cast("double").as("em"),
        when(size(col("tp")) + size(col("tg")) > 0,
          lit(2.0) * col("ncommon") / (size(col("tp")) + size(col("tg"))))
          .otherwise(lit(0.0)).as("f1"))
    val ag = picked.agg(avg(col("em")).as("em"), avg(col("f1")).as("f1")).head()
    embedded.unpersist()
    val metrics = Map(
      "exact_match" -> ag.getDouble(0), "f1" -> ag.getDouble(1),
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id,
      s"finetune:${cfg.runtime}",
      cfg.hyperparams ++ Map("runtime" -> cfg.runtime, "dim" -> cfg.dim.toString,
        "task" -> cfg.task, "sentence_tokens" -> sentTok.toString,
        "text2_col" -> cfg.text2Col),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    graft.ml.PipelineIO.save(head, path) // driver-side, zero jobs (r21)
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      s"finetuned ${cfg.runtime} extractive QA head: " +
        metrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "f1")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy &&
      deployed.forall(old => metrics("f1") > old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(cfg.projectName, cfg.task, s"finetune:${cfg.runtime}", shouldDeploy)),
      schema)
  }

  /** Answer questions with a finetuned QA project: window the context
    * with the recorded `sentence_tokens`, pair-pack with the question,
    * embed with the recorded runtime/dim, return the best window per
    * (context, question) as `answer`. */
  def answerText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, contextCol: String = "context",
      questionCol: String = "question"): DataFrame = {
    val modelId = catalog.deployedModelId(project).getOrElse(
      throw new IllegalStateException(s"Project '$project' has no deployed model"))
    val hp = catalog.models.filter(col("id") === modelId).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"Model $modelId missing from catalog")).hyperparams
    require(hp.get("task").contains("question-answering"),
      s"Project '$project' is not a question-answering project")
    val head = graft.ml.Predict.findCached(catalog, modelId)
    val wins = df
      .select(xxhash64(col(contextCol), col(questionCol)).as("doc_uid"),
        col(contextCol).as("ctx"), col(questionCol).as("question"))
      .filter(size(TextMetrics.tokens(col("ctx"))) > 0)
      .select(col("doc_uid"), col("ctx"), col("question"),
        posexplode(tokenWindows(TextMetrics.tokens(col("ctx")),
          hp("sentence_tokens").toInt)).as(Seq("sent_idx", "sent")))
      .withColumn("pair", concat(col("question"), lit(PAIR_SEP), col("sent")))
    val embedded = Ops.embedColumn(wins, hp("runtime"), "pair", "emb",
        dim = hp("dim").toInt)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
    pickAnswers(head.transform(embedded))
      .select(col("ctx").as(contextCol), col("question").as(questionCol),
        col("sent").as("answer"))
  }

  /** Conversation finetune — see the object doc. The (system, user,
    * assistant) columns arrive as (cfg.textCol, cfg.text2Col,
    * cfg.labelCol), mirroring the reference's triple
    * (`transformers.py:1823-1861`). Positives are the true
    * (context, response) pairs; negatives pair each context with the
    * NEXT response inside its hash bucket (cyclic) — deterministic,
    * shuffle-local (the window is keyed by bucket, never a global
    * sort), and vocabulary-matched the way in-batch negatives are. */
  private def finetuneConversation(spark: SparkSession, catalog: Catalog,
      cfg: FinetuneConfig): DataFrame = {
    val t0 = System.nanoTime()
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == cfg.task,
          s"Project ${cfg.projectName} already exists with a different task: ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, cfg.task)
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName, Seq(cfg.labelCol),
      cfg.testSize, "random", df0.schema.json)

    val rows = df0
      .select(
        xxhash64(col(cfg.textCol), col(cfg.text2Col), col(cfg.labelCol)).as("uid"),
        concat(col(cfg.textCol), lit(PAIR_SEP), col(cfg.text2Col)).as("ctx"),
        col(cfg.labelCol).as("resp"))
      .filter(size(TextMetrics.tokens(col("ctx"))) > 0 &&
        size(TextMetrics.tokens(col("resp"))) > 0)
      // duplicate triples share one uid, and the pairs⋈ctxEmb uid join
      // below would multiply them QUADRATICALLY (k copies → k² training
      // rows) — chat logs repeat exchanges all the time, so dedup here
      .distinct()
    val buckets = 32
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("uid"))
    val withNeg = rows.withColumn("bucket", pmod(col("uid"), lit(buckets)))
      .withColumn("neg_resp",
        coalesce(lead(col("resp"), 1).over(bw), first(col("resp")).over(bw)))
    val pairs = withNeg
      .select(col("uid"), col("resp"), lit(1.0).as("y"))
      .union(withNeg.filter(col("neg_resp") =!= col("resp"))
        .select(col("uid"), col("neg_resp").as("resp"), lit(0.0).as("y")))

    // dual encoder: context and response embed SEPARATELY — and each
    // text exactly ONCE (n contexts + ≤n distinct responses), not once
    // per pos/neg pair row; the pair table joins the vectors back by
    // key. The head trains on the element-wise product, so the learned
    // score is the bilinear (w⊙c)·r — precomputable candidate side at
    // inference
    val ctxEmb = Ops.embedColumn(rows.select(col("uid"), col("ctx")),
      cfg.runtime, "ctx", "cemb", dim = cfg.dim)
    val respEmb = Ops.embedColumn(rows.select(col("resp")).distinct(),
      cfg.runtime, "resp", "remb", dim = cfg.dim)
    val embedded = pairs
      .join(ctxEmb, Seq("uid")).join(respEmb, Seq("resp"))
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(
        zip_with(col("cemb"), col("remb"), (a, b) => a * b)))
      .cache() // one embed pass for probes + LBFGS + eval
    // split by TRIPLE uid — a pair and its negative never straddle
    val (trainDF0, testDF0) = Sampling.splitByFraction(
      embedded, Seq("uid"), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (embedded, embedded)
      else (trainDF0, testDF0)
    val lr = new LogisticRegression()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(cfg.hyperparams.get("max_iter").map(_.toInt).getOrElse(100))
      .setRegParam(cfg.hyperparams.get("alpha").map(_.toDouble).getOrElse(0.0))
    val head = graft.ml.LocalLogistic.fitHeadPipeline(lr, trainDF) // driver route (r21)
    val fitTime = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val rep = Metrics.classification(head.transform(testDF), "y", "prediction")
    embedded.unpersist()
    val metrics = Map(
      "f1" -> rep.f1Weighted, "f1_macro" -> rep.f1Macro,
      "accuracy" -> rep.accuracy,
      "precision" -> rep.precisionWeighted, "recall" -> rep.recallWeighted,
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id,
      s"finetune:${cfg.runtime}",
      cfg.hyperparams ++ Map("runtime" -> cfg.runtime, "dim" -> cfg.dim.toString,
        "task" -> cfg.task, "text2_col" -> cfg.text2Col),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    graft.ml.PipelineIO.save(head, path) // driver-side, zero jobs (r21)
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      s"finetuned ${cfg.runtime} dual-encoder conversation head: " +
        metrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "f1")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy &&
      deployed.forall(old => rep.f1Weighted > old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(cfg.projectName, cfg.task, s"finetune:${cfg.runtime}", shouldDeploy)),
      schema)
  }

  /** Respond to (system, user) contexts with a finetuned conversation
    * project by retrieval: embed the distinct candidate responses ONCE,
    * reweight each context embedding by the head's coefficients
    * (score = w·(c⊙r) + b = (w⊙c)·r + b), and return the top-scoring
    * candidate per distinct context (ties → the greater response
    * string — deterministic). The candidate side is broadcast under a
    * guard; a pool past the guard should route through the ANN
    * operators with the reweighted query, which this scoring shape
    * makes possible by construction. */
  /** Resolve a deployed conversation project to its scoring head:
    * (coefficients, intercept, dim, runtime). Shared by the broadcast
    * and ANN retrieval paths. */
  private def conversationHead(spark: SparkSession, catalog: Catalog,
      project: String): (Array[Double], Double, Int, String) = {
    val modelId = catalog.deployedModelId(project).getOrElse(
      throw new IllegalStateException(s"Project '$project' has no deployed model"))
    val hp = catalog.models.filter(col("id") === modelId).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"Model $modelId missing from catalog")).hyperparams
    require(hp.get("task").contains("conversation"),
      s"Project '$project' is not a conversation project")
    val head = graft.ml.Predict.findCached(catalog, modelId)
    val lrm = head.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    graft.functions.GraftFunctions.register(spark)
    (lrm.coefficients.toArray, lrm.intercept, hp("dim").toInt, hp("runtime"))
  }

  def respondText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, systemCol: String = "system", userCol: String = "user",
      candidates: DataFrame, candidateCol: String = "response",
      maxCandidates: Long = 50000L): DataFrame = {
    val (w, b, dim, runtime) = conversationHead(spark, catalog, project)

    // localCheckpoint materializes the distinct ONCE for both the count
    // guard and the broadcast embed (a cache() could never be unpersisted
    // from a lazily-returned frame; checkpoint blocks free via the
    // ContextCleaner when the result goes out of scope)
    val pool = candidates.select(col(candidateCol).as("resp")).distinct()
      .localCheckpoint()
    val nCand = pool.count()
    require(nCand > 0, "respondText needs a non-empty candidate pool")
    require(nCand <= maxCandidates,
      s"candidate pool has $nCand rows > $maxCandidates broadcast guard; " +
        "route the pool through the ANN operators (the score is a dot " +
        "product of the reweighted context against response embeddings)")
    // Broadcast the candidate side as a flat primitive matrix and argmax
    // in one map stage. The former shape — crossJoin(broadcast(cands)) +
    // per-pair graft_dot + max(struct) — materialized n_ctx × n_cand
    // ROWS through the aggregator: 25M pairs = 43 s warm at sf0.1. The
    // same 25M dot products as a tight loop over the matrix run in
    // under a second, and nothing n² ever becomes a row. Scores are
    // bit-identical (same per-element double product, same
    // left-to-right accumulation as zip_with + graft_dot, intercept
    // added last) and ties keep the max(struct) rule: greater response
    // string (unsigned UTF-8 byte order) wins.
    val candRows = Ops.embedColumn(pool, runtime, "resp", "remb", dim = dim)
      .select(col("resp"), col("remb")).collect()
    val nc = candRows.length
    val resps = new Array[String](nc)
    val mat = new Array[Double](nc * dim)
    candRows.zipWithIndex.foreach { case (r, j) =>
      resps(j) = r.getString(0)
      val e = r.getSeq[Float](1)
      require(e.length == dim, s"candidate embedding dim ${e.length} != $dim")
      var d = 0
      while (d < dim) { mat(j * dim + d) = e(d).toDouble; d += 1 }
    }
    val bcM = spark.sparkContext.broadcast((resps, mat))

    val ctx = df.select(col(systemCol), col(userCol)).distinct()
      .withColumn("ctx", concat(col(systemCol), lit(PAIR_SEP), col(userCol)))
    val ce = Ops.embedColumn(ctx, runtime, "ctx", "cemb", dim = dim)
      .select(col(systemCol), col(userCol), col("cemb"))
    val outSchema = StructType(Seq(
      StructField(systemCol, StringType), StructField(userCol, StringType),
      StructField("response", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    ce.mapPartitions { it =>
      val (rs, m) = bcM.value
      it.map { row =>
        val c = row.getSeq[Float](2)
        val wq = new Array[Double](dim)
        var d = 0
        while (d < dim) { wq(d) = c(d).toDouble * w(d); d += 1 }
        var best = Double.NegativeInfinity
        var bestR: String = null
        var j = 0
        while (j < rs.length) {
          var s = 0.0
          var dd = 0
          val off = j * dim
          while (dd < dim) { s += wq(dd) * m(off + dd); dd += 1 }
          s += b
          if (s > best || (bestR == null) ||
              (s == best && org.apache.spark.unsafe.types.UTF8String
                .fromString(rs(j)).compareTo(
                  org.apache.spark.unsafe.types.UTF8String.fromString(bestR)) > 0)) {
            best = s; bestR = rs(j)
          }
          j += 1
        }
        Row(row.getString(0), row.getString(1), bestR)
      }
    }(enc)
  }

  /** The SCALE path through conversation retrieval — the route the
    * `respondText` broadcast guard names, made a real code path: the
    * candidate pool stays DISTRIBUTED and the top-1 search runs as an
    * IVF cell join instead of an all-pairs scan.
    *
    * The learned score w·(c⊙r) + b = (w⊙c)·r + b is a MAXIMUM INNER
    * PRODUCT search, which an L2/cosine quantizer cannot bucket
    * directly (inner product is not a metric). Standard published
    * reduction (Bachrach et al., RecSys'14; the asymmetric-LSH
    * transform): augment every candidate to r' = [r, √(M² − |r|²)]
    * with M = max‖r‖ over the pool — all r' then share norm M — and
    * the query to q' = [w⊙c, 0]. Since q'·r' = (w⊙c)·r with all
    * candidate norms equal, argmax inner product = nearest r' by
    * cosine, so the trained k-means IVF machinery applies unchanged.
    *
    * 100 TB shape: the candidate pool becomes a PERSISTENT IVF index —
    * the same cell-partitioned parquet layout as
    * [[graft.operators.Similarity.writeIvfIndex]] — built in one pass
    * (pool embeds distributed, the norm cap is one tiny agg, k-means
    * fits on a bounded sample of the augmented vectors, the trained
    * `graft_cell` assignment is the map `partitionBy` splits into cell
    * directories). The index is CONTENT-ADDRESSED by (runtime, dim,
    * targetCellRows, pool fingerprint), and crucially it does NOT
    * depend on the head's coefficients — `w` only reweights the QUERY
    * (q' = [w⊙c, 0]) — so retraining or redeploying the project never
    * invalidates it; any deployed head serves off the same store. Every
    * retrieval after the build is a partition-pruned read of the probed
    * cells' directories (the `sim_ann_ivf_indexed` dynamicpruning plan
    * shape, audited in PLANS.md): per-query work is the probed cells'
    * population, not the pool, and the scan reads nprobe/numCells of
    * the index. Approximate like every IVF probe (recall rises with
    * nprobe); the parity spec pins top-1 agreement vs the exact
    * broadcast path. Tie rule matches `respondText`: equal scores
    * resolve to the greater response string via the max(struct) order.
    * Build-vs-read follows the repo's single-writer discipline. */
  def respondTextAnn(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, systemCol: String = "system", userCol: String = "user",
      candidates: DataFrame, candidateCol: String = "response",
      targetCellRows: Long = 500L, nprobe: Int = 0): DataFrame = {
    // resolve the head ONCE for prepare + serve: each resolution is two
    // small catalog collects, measurable when the gate serves per-pass
    val head = conversationHead(spark, catalog, project)
    serveConvResolved(spark, head, df, systemCol, userCol,
      prepareConvResolved(spark, head, candidates, candidateCol,
        targetCellRows), nprobe)
  }

  /** Prepared, reusable conversation-retrieval index: the resolved
    * store path plus the coarse quantizer + non-empty cell list read
    * from its sidecar. Obtain via [[prepareConvIndex]]; serve any
    * number of batches through [[respondTextAnnIndexed]] with ZERO
    * pool-side work per batch. */
  final case class ConvIndexHandle private[llm] (
      idxDir: String,
      quant: graft.operators.KMeansQuantizer,
      nonEmpty: Seq[Int])

  /** Fingerprint the pool, build the content-addressed IVF store if it
    * does not exist yet, and return a serve handle.
    *
    * SCALE SEAM: the reuse-verification fingerprint is one aggregate
    * over the DISTINCT pool — O(pool) — and the convenience
    * [[respondTextAnn]] pays it on EVERY call, which the serve-slope
    * harness measures as the only pool-proportional term left in the
    * serve (exponent 0.27 at 10×; tools/ServeSlope). A serving job at
    * real scale calls THIS once and then serves handle-first, making
    * per-batch work independent of pool size. */
  def prepareConvIndex(spark: SparkSession, catalog: Catalog, project: String,
      candidates: DataFrame, candidateCol: String = "response",
      targetCellRows: Long = 500L): ConvIndexHandle =
    prepareConvResolved(spark, conversationHead(spark, catalog, project),
      candidates, candidateCol, targetCellRows)

  private def prepareConvResolved(spark: SparkSession,
      head: (Array[Double], Double, Int, String), candidates: DataFrame,
      candidateCol: String, targetCellRows: Long): ConvIndexHandle = {
    val (_, _, dim, runtime) = head
    val pool = candidates.select(col(candidateCol).as("resp")).distinct()
    // order-independent content fingerprint in ONE cheap agg (no embed,
    // no checkpoint): count + TWO per-row hash XORs over independently
    // salted hash families + total byte length. A single XOR cancels
    // structured differences more easily than two unrelated hash
    // families do (a change must cancel in BOTH simultaneously to
    // collide, ~2^-128); XOR, unlike a sum of full-range hash longs,
    // also cannot overflow under spark.sql.ansi.enabled.
    // This is what lets reuse be VERIFIED rather than assumed — a pool
    // that changed in any row lands in a different index directory.
    val fp = pool.agg(
      count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(resp))").as("x"),
      expr("bit_xor(xxhash64(concat(resp, 'g2')))").as("x2"),
      coalesce(sum(length(col("resp"))), lit(0L)).as("len")).head()
    val nCand = fp.getLong(0)
    require(nCand > 0, "respondTextAnn needs a non-empty candidate pool")
    val xorHash = if (fp.isNullAt(1)) 0L else fp.getLong(1)
    val idxDir = graft.operators.Similarity.indexPath(spark,
      "conv_ivf", runtime, dim.toString, targetCellRows.toString,
      nCand.toString, xorHash.toString, fp.getLong(2).toString,
      fp.getLong(3).toString)
    // all index metadata I/O goes through the path's Hadoop FileSystem —
    // the root may be local in tests and DFS (s3/hdfs) on a cluster
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val (quant, nonEmpty) =
      if (fs.exists(new org.apache.hadoop.fs.Path(idxDir, CONV_INDEX_DONE)))
        readConvIndexMeta(fs, idxDir)
      else buildConvIndex(spark, fs, pool, runtime, dim, targetCellRows, nCand, idxDir)
    ConvIndexHandle(idxDir, quant, nonEmpty)
  }

  /** Serve a query batch off a prepared index — the per-batch cost is
    * the batch embed + the probed cells' population; NOTHING here
    * scales with the pool. Same arithmetic, plan shape (static
    * partition-pruned scan + broadcast-query hash join), and tie rule
    * as the fingerprinting convenience entry, which delegates here. */
  def respondTextAnnIndexed(spark: SparkSession, catalog: Catalog,
      project: String, df: DataFrame, systemCol: String = "system",
      userCol: String = "user", handle: ConvIndexHandle,
      nprobe: Int = 0): DataFrame =
    serveConvResolved(spark, conversationHead(spark, catalog, project),
      df, systemCol, userCol, handle, nprobe)

  /** The recall-stability probe rule shared with `annIvfPqServe`
    * (ADVICE r19): as numCells grows with the pool (k = pool /
    * targetCellRows), a FIXED nprobe lets recall decay toward
    * nprobe/numCells — √numCells probes hold recall while per-query
    * work stays O(√n · cellRows), strongly sublinear; the minimum 4 is
    * the r18 discipline (below it, one boundary query can sit on the
    * quality floor). `nprobe <= 0` in the serve entries means "this". */
  def autoNprobe(numCells: Int): Int =
    math.max(4, math.ceil(math.sqrt(numCells.toDouble)).toInt)

  private def serveConvResolved(spark: SparkSession,
      head: (Array[Double], Double, Int, String), df: DataFrame,
      systemCol: String, userCol: String, handle: ConvIndexHandle,
      nprobe0: Int): DataFrame = {
    val (w, b, dim, runtime) = head
    val wLit = typedlit(w.toSeq)
    val quant = handle.quant
    val nprobe = if (nprobe0 > 0) nprobe0 else autoNprobe(quant.numCells)
    val nonEmpty = handle.nonEmpty
    val idxDir = handle.idxDir

    // Probe ranking is the quantizer's L2-to-centroid order (measured
    // against pure inner-product centroid ranking on this corpus: L2
    // recalls strictly better — the |centroid|² term favors TIGHT
    // cells, exactly the ones where a high dot is achievable, while a
    // raw q·c order chases long centroids of diffuse cells).
    // Probe only cells that OWN candidates (k-means can leave empty
    // centroids; an all-empty top-nprobe would silently answer nothing
    // while the broadcast twin answers every query) — the non-empty set
    // comes from the index metadata, recorded at build time.
    val ctx = df.select(col(systemCol), col(userCol)).distinct()
      .withColumn("ctxt", concat(col(systemCol), lit(PAIR_SEP), col(userCol)))
    val q = Ops.embedColumn(ctx, runtime, "ctxt", "cemb", dim = dim)
      .withColumn("wq",
        concat(zip_with(col("cemb").cast("array<double>"), wLit, (a, c) => a * c),
          array(lit(0.0))))
      .withColumn("cell", explode(quant.probeAmongCol(col("wq"), nprobe, nonEmpty)))
      .select(col(systemCol), col(userCol), col("wq"), col("cell"))
      // materialize the (narrow) embedded batch ONCE: it feeds both the
      // probed-cell union below and the retrieval join
      .localCheckpoint()

    // STATIC partition pruning, stronger than relying on Catalyst's DPP
    // heuristic (which wants a selective filter on the probe side): the
    // union of probed cells is O(numCells) — collect it and push an IN
    // filter onto the index scan's partition column, so the scan reads
    // ONLY the probed cells' directories. A small serve batch touches
    // few cells and reads a sliver of the index; a batch that probes
    // everything degrades gracefully to the full (still one-pass) read.
    // ONE aggregate job returns both the probed-cell set and the batch
    // size the slice guard needs below — the guard's separate q.count()
    // was one extra scheduled job per serve call (VERDICT r20 item 8)
    val aggRow = q.agg(collect_set(col("cell")).as("cells"),
      count(lit(1)).as("n")).head()
    val probed = aggRow.getSeq[Long](0)
    val nQueries = aggRow.getLong(1)
    // The explicit schema pins `cell` to BIGINT so both the IN filter
    // and the equi-join hit the partition column without a cast (a cast
    // there defeats pruning) — same discipline as Similarity.annIvfIndexed.
    val idx = spark.read.schema("resp STRING, v ARRAY<DOUBLE>, cell BIGINT")
      .parquet(s"$idxDir/cells")
      .where(col("cell").isin(probed: _*))

    // broadcast the QUERY side (the serving batch — bounded by the
    // caller, vs the unbounded pool): the probe becomes a broadcast
    // hash join streamed over the pruned index scan, in whole-stage
    // codegen, with NO shuffle/sort of the index — and the plan stays
    // this shape even where AQE is unavailable (measured: the same
    // join as a static sort-merge was 10× slower through the
    // checkpoint/toRdd path at 10× scale, SMJ buffering every per-cell
    // match group).
    //
    // SLICE GUARD (r20, measured): the broadcast payload is
    // nQueries × nprobe rows each carrying a (dim+1)-double probe
    // vector — a corpus-wide eval batch at 100× with √numCells probes
    // measured ~8 GB and DIED on Spark's 8 GB HashedRelation cap
    // (r19's fixed nprobe=2 sat at ~0.5 GB, which is why it never
    // tripped). Rather than refuse, serve oversized batches in hash
    // slices of the QUERY KEYS through the SAME broadcast plan: each
    // slice's payload fits, slices partition queries exactly (xxhash64
    // on the key pair), and the per-slice groupBy stays correct
    // because a query's probe rows never straddle slices. The pruned
    // index scan is re-read once per slice — the route-by-runtime-size
    // trade (the adaptive-CC discipline): linear re-reads beat an 8 GB
    // driver broadcast failure. Slice budget is configurable
    // (spark.graft.convServeSliceBytes); a handle-first serving job
    // with caller-bounded batches never slices.
    val sliceBytes = spark.conf.getOption("spark.graft.convServeSliceBytes")
      .map(_.toLong).getOrElse(1500L << 20)
    val bytesPerRow = (dim + 2) * 8L + 96L // wq + keys + row overhead
    val slices = math.min(64L,
      (nQueries * bytesPerRow + sliceBytes - 1) / sliceBytes).toInt
    def serveSlice(qs: DataFrame): DataFrame =
      broadcast(qs).join(idx, Seq("cell"))
        .withColumn("score",
          call_function("graft_dot", col("wq"), col("v")) + lit(b))
        .groupBy(col(systemCol), col(userCol))
        .agg(max(struct(col("score"), col("resp"))).as("m"))
        .select(col(systemCol), col(userCol), col("m.resp").as("response"))
    if (slices <= 1) serveSlice(q)
    else (0 until slices).map { i =>
      serveSlice(q.where(pmod(xxhash64(col(systemCol), col(userCol)),
        lit(slices.toLong)) === i))
    }.reduce(_.unionByName(_))
  }

  private val CONV_INDEX_DONE = "_GRAFT_INDEX_DONE"

  /** Build counter, exposed for the reuse spec: serving the same pool
    * twice — or after a retrain/redeploy — must NOT rebuild the index. */
  private[graft] val convIndexBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One-pass build of the conversation retrieval index: embed the pool
    * distributed, apply the MIPS augmentation r' = [r, √(M²−|r|²)]
    * (all r' share norm M, so argmax inner product = nearest by L2),
    * fit the coarse quantizer on a bounded sample, and write the
    * cell-partitioned store via [[graft.operators.Similarity.writeIvfIndex]].
    * Centroids + the non-empty cell list land in a small binary sidecar
    * (exact double round-trip); the done-marker is written LAST so a
    * crashed build is rebuilt, never served. */
  private def buildConvIndex(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, pool: DataFrame,
      runtime: String, dim: Int, targetCellRows: Long, nCand: Long,
      finalDir: String): (graft.operators.KMeansQuantizer, Seq[Int]) = {
    convIndexBuilds.incrementAndGet()
    // BUILD-THEN-PUBLISH: the root is shared across sessions now, so two
    // jobs can race to build the same content hash. Everything (cells,
    // sidecar, done-marker) lands in a private staging dir; a single
    // rename publishes it. Atomic on HDFS-like stores (directory move);
    // on S3 rename is copy-based, so prefer an HDFS-consistent root or
    // an external build lock there. The loser of the race deletes its
    // staging dir and serves the winner’s published index — identical
    // content by construction (same pool fingerprint).
    val idxDir =
      s"$finalDir.build-${java.lang.Long.toHexString(System.nanoTime())}"
    val emb = Ops.embedColumn(pool, runtime, "resp", "remb", dim = dim)
      .select(col("resp"), col("remb").cast("array<double>").as("r"))
      .withColumn("n2", call_function("graft_dot", col("r"), col("r")))
      .localCheckpoint() // embed once: serves the norm cap + assignment
    val m2 = emb.agg(max(col("n2"))).head().getDouble(0)
    val aug = emb.select(col("resp"),
      concat(col("r"),
        array(sqrt(greatest(lit(m2) - col("n2"), lit(0.0))))).as("v"))
    val k = graft.operators.KMeansQuantizer.chooseK(nCand, targetCellRows)
    // coarse cells only route the probe — recall is the nprobe knob,
    // not centroid polish — so the fit is sample-bounded and stops
    // early, same discipline as the DBSCAN gate's quantizer
    val quant = graft.operators.KMeansQuantizer.fitSampled(
      aug.select(col("v")), k, nCand, maxIter = 8)
    graft.operators.Similarity.writeIvfIndex(aug, quant, s"$idxDir/cells")
    // non-empty cells = the partition directories that exist: O(numCells)
    // filesystem metadata off the store itself, no extra Spark job —
    // via the index's own FileSystem, so the same code walks s3/hdfs
    val nonEmpty = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idxDir/cells"))
      .toSeq.map(_.getPath.getName)
      .filter(_.startsWith("cell=")).map(_.stripPrefix("cell=").toInt).sorted
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(s"$idxDir/meta.bin"), true))
    try {
      out.writeInt(quant.centroids.length)
      out.writeInt(quant.centroids.headOption.map(_.length).getOrElse(0))
      quant.centroids.foreach(_.foreach(out.writeDouble))
      out.writeInt(nonEmpty.size)
      nonEmpty.foreach(out.writeInt)
    } finally out.close()
    // done-marker LAST: a crashed build leaves no marker and is rebuilt
    fs.create(new org.apache.hadoop.fs.Path(idxDir, CONV_INDEX_DONE), true).close()
    // Publish. Hadoop's legacy FileSystem.rename does NOT uniformly
    // refuse an existing destination: on HDFS (and RawLocalFileSystem's
    // FileUtil.copy fallback) it moves the staging dir INTO the existing
    // destination directory and returns true (ADVICE r13) — so (a) an
    // exists() check guards the common race, and (b) the exists→rename
    // window is closed after the fact: any staging dir nested inside the
    // published index is debris to delete, and the top-level done-marker
    // is verified regardless of which writer won. Either way the served
    // content is identical by construction (same pool fingerprint).
    val finalPath = new org.apache.hadoop.fs.Path(finalDir)
    val staging = new org.apache.hadoop.fs.Path(idxDir)
    val renamed = !fs.exists(finalPath) && fs.rename(staging, finalPath)
    // In the exists→rename window an HDFS-style rename can "succeed" by
    // NESTING the staging dir inside a concurrently-published
    // destination (ADVICE r14): nesting detected means the rename did
    // NOT publish — the directory serves the concurrent winner's index,
    // so the publish is LOST regardless of rename's return value and
    // the served metadata must be read back from the store rather than
    // assumed equal to the local build (same-pool determinism is the
    // expectation, not a checked invariant).
    val nestedDebris = new org.apache.hadoop.fs.Path(finalPath, staging.getName)
    val nested = fs.exists(nestedDebris)
    if (nested) fs.delete(nestedDebris, true)
    val won = renamed && !nested
    if (!won && fs.exists(staging)) fs.delete(staging, true)
    require(fs.exists(new org.apache.hadoop.fs.Path(finalPath, CONV_INDEX_DONE)),
      s"conversation index publish race lost to an UNFINISHED build at " +
        s"$finalDir — remove the debris and retry")
    if (won) (quant, nonEmpty) else readConvIndexMeta(fs, finalDir)
  }

  private def readConvIndexMeta(fs: org.apache.hadoop.fs.FileSystem,
      idxDir: String): (graft.operators.KMeansQuantizer, Seq[Int]) = {
    val in = new java.io.DataInputStream(
      fs.open(new org.apache.hadoop.fs.Path(s"$idxDir/meta.bin")))
    try {
      val k = in.readInt(); val d = in.readInt()
      val cents = Array.fill(k)(Array.fill(d)(in.readDouble()))
      val nonEmpty = Seq.fill(in.readInt())(in.readInt())
      (new graft.operators.KMeansQuantizer(cents), nonEmpty)
    } finally in.close()
  }

  /** Score raw text with a finetuned project: embed with the SAME
    * runtime/dim recorded at finetune time, then the logistic head.
    * Text-pair projects re-pack (textCol, text2_col) with the recorded
    * separator before embedding, mirroring the training-time packing. */
  def classifyText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, textCol: String = "text"): DataFrame = {
    val modelId = catalog.deployedModelId(project).getOrElse(
      throw new IllegalStateException(s"Project '$project' has no deployed model"))
    val hp = catalog.models.filter(col("id") === modelId).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"Model $modelId missing from catalog")).hyperparams
    // conversation stores text2_col too, but its head scores c⊙r product
    // features — packing would silently produce garbage, so guard
    require(hp.get("task").exists(t =>
      t == "text-classification" || t == "text-pair-classification"),
      s"Project '$project' is a ${hp.getOrElse("task", "?")} project; use " +
        "summarizeText / answerText / respondText for its task")
    val head = graft.ml.Predict.findCached(catalog, modelId)
    val input = hp.get("text2_col").filter(_.nonEmpty) match {
      case Some(t2) =>
        df.withColumn(textCol, concat(col(textCol), lit(PAIR_SEP), col(t2)))
      case None => df
    }
    val embedded = Ops.embedColumn(input, hp("runtime"), textCol, "emb",
        dim = hp("dim").toInt)
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector(col("emb")))
    head.transform(embedded)
  }
}
