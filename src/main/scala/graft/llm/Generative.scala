package graft.llm

import graft.ml.{Catalog, Sampling}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GENERATIVE finetune tasks on the bare JVM — the two tasks earlier
  * rounds closed with an unsupported-runtime error (`Ops.finetune`):
  *
  * `text-generation` (`transformers.py:639-644,911-917` — causal-LM
  * Trainer over the y column; eval = perplexity over the concatenated
  * test split, `:831-872`) TRAINS as a trigram language model with
  * stupid backoff (Brants et al. 2007, "Large Language Models in
  * Machine Translation" — the scheme DESIGNED for distributed
  * MapReduce-style estimation, which is exactly what a groupBy count
  * is). Training is three map-side-combinable n-gram counts; eval is
  * the same held-out perplexity contract as the reference
  * (`{"perplexity"}`, lower deploys); generation is deterministic
  * greedy continuation (argmax next-token, ties to the greater word —
  * the repo-wide max(struct) convention). Abstractive neural synthesis
  * still needs a weights-capable runtime; this is the strongest model
  * family the JVM can TRAIN from scratch, and it is stated as such in
  * the model ledger (`compat=ngram_lm`).
  *
  * `translation` (`transformers.py:629-631,735-768` — seq2seq Trainer;
  * eval = sacrebleu corpus BLEU + ROUGE-1/2) TRAINS IBM Model 1
  * (Brown et al. 1993, "The Mathematics of Statistical Machine
  * Translation") by distributed EM: the E-step normalizes per target
  * position with a window sum and aggregates expected alignment counts
  * (one shuffle of the pair frame per iteration, not two), the M-step
  * is a ratio — no driver-side state beyond the loop counter. Decoding is
  * the Model-1 word-by-word argmax (no reordering model — stated,
  * `compat=ibm_model1`); eval reports the reference's exact metric
  * keys (bleu plus the rouge_ngram_ and rouge_bigram_ sextet) via
  * [[TextMetrics.bleuCorpus]]/[[TextMetrics.rougeAvg]].
  *
  * Scale notes: every training step is an equi-join or a
  * map-combinable aggregation on (word, context) keys — no pair space
  * beyond Model 1's |f|·|e| per sentence, no collect in training. The
  * EM t-table is localCheckpoint-ed per iteration (the Components
  * label-propagation discipline) so iteration N never replays 0..N−1.
  * Greedy generation broadcasts only the per-context ARGMAX table
  * (≤ one row per distinct bigram context, guarded); translation
  * decode is purely join-based — no broadcast, no cap.
  */
object Generative {
  /** Same byte as TextMetrics' n-gram joiner: U+0001 never appears in
    * whitespace-split tokens. */
  private val SEP = "\u0001"
  /** IBM Model 1's empty cept — whitespace-split tokens can never
    * contain U+0001, so this token never collides with a real word. */
  private val NULL_TOKEN = "\u0001NULL\u0001"
  /** Stupid-backoff discount (Brants et al. 2007 §3). */
  private val BACKOFF = 0.4

  // ------------------------------------------------------------------
  // text-generation: trigram stupid-backoff LM
  // ------------------------------------------------------------------

  final case class GenConfig(
      projectName: String,
      relationName: String = "",
      data: Option[DataFrame] = None,
      textCol: String = "text",
      testSize: Double = 0.25,
      hyperparams: Map[String, String] = Map.empty,
      automaticDeploy: Boolean = true,
      seed: Long = 42L)

  /** n-gram count frames for one corpus: (ctx, w, cnt) for n=2,3 and
    * (w, cnt) for n=1. ctx is SEP-joined. */
  private def countNgrams(docs: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = TextMetrics.tokens(col(textCol))
    val base = docs.select(toks.as("t"))
    val uni = base.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    def grams(n: Int) = base
      .select(explode(TextMetrics.ngrams(col("t"), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val bi = grams(2).select(
      substring_index(col("g"), SEP, 1).as("ctx"),
      substring_index(col("g"), SEP, -1).as("w"), col("cnt"))
    val tri = grams(3).select(
      // context = first two words, predicted word = last
      substring_index(col("g"), SEP, 2).as("ctx"),
      substring_index(col("g"), SEP, -1).as("w"), col("cnt"))
    (uni, bi, tri)
  }

  /** Per-context argmax tables of the trigram stupid-backoff LM that
    * [[finetuneGeneration]] trains, as one queryable frame — the
    * hash-exact train-twin seam for the generation lifecycle (the
    * [[ibm1Round1CountsQ]] pattern). Runs the PRODUCTION [[countNgrams]]
    * on the given corpus (the lifecycle's random train split stays on
    * the rows-only gate) and the PRODUCTION decode tie rule —
    * `max(struct(cnt, w))`: highest count, ties to the
    * lexicographically greatest continuation — that [[loadLm]]
    * broadcasts for greedy decode. n-gram counting and the argmax are
    * exact integer arithmetic a SQL oracle replays bit-for-bit, so
    * hashing (n, ctx, w, cnt) for every trigram and bigram context plus
    * the global unigram top (n=1, ctx = "") pins the tokenizer, the
    * SEP framing, and the entire greedy decode policy in one pass.
    * Scale: one row per DISTINCT context — shuffles on ctx with
    * map-side partial aggregation; the corpus itself never shuffles.
    * Reference anchor: the causal-LM tune path
    * `transformers.py:639-644,911-917` whose train step these counts
    * realize. */
  def lmArgmaxTablesQ(docs: DataFrame, textCol: String): DataFrame = {
    val (uni, bi, tri) = countNgrams(docs, textCol)
    def pick(counts: DataFrame, n: Int): DataFrame = counts
      .groupBy("ctx").agg(max(struct(col("cnt"), col("w"))).as("m"))
      .select(lit(n).as("n"), col("ctx"), col("m.w").as("w"),
        col("m.cnt").as("cnt"))
    val top = uni.agg(max(struct(col("cnt"), col("w"))).as("m"))
      .select(lit(1).as("n"), lit("").as("ctx"), col("m.w").as("w"),
        col("m.cnt").as("cnt"))
    pick(tri, 3).unionByName(pick(bi, 2)).unionByName(top)
  }

  /** Held-out stupid-backoff perplexity: exp(−avg ln S) over every
    * position with a full trigram context. S is the Brants score —
    * trigram MLE, else 0.4·bigram MLE, else 0.4²·unigram MLE, else
    * 0.4²/(T+V). Five left equi-joins + one aggregate. */
  private def backoffPerplexity(test: DataFrame, textCol: String,
      uni: DataFrame, bi: DataFrame, tri: DataFrame,
      totalTokens: Long, vocab: Long): Double = {
    val toks = TextMetrics.tokens(col(textCol))
    val pos = test.select(toks.as("t"))
      .select(explode(when(size(col("t")) >= 3, sequence(lit(3), size(col("t"))))
        .otherwise(array().cast("array<int>"))).as("p"), col("t"))
      .select(
        element_at(col("t"), col("p") - 2).as("w1"),
        element_at(col("t"), col("p") - 1).as("w2"),
        element_at(col("t"), col("p")).as("w"))
    val joined = pos
      .join(tri.select(col("ctx"), col("w"), col("cnt").as("c3")),
        concat(pos("w1"), lit(SEP), pos("w2")) === tri("ctx") && pos("w") === tri("w"),
        "left")
      .drop(tri("ctx")).drop(tri("w"))
      .join(bi.select(col("ctx").as("b1ctx"), col("w").as("b1w"), col("cnt").as("c12")),
        col("w1") === col("b1ctx") && col("w2") === col("b1w"), "left")
      .join(bi.select(col("ctx").as("b2ctx"), col("w").as("b2w"), col("cnt").as("c2")),
        col("w2") === col("b2ctx") && col("w") === col("b2w"), "left")
      .join(uni.select(col("w").as("u1w"), col("cnt").as("cw2")),
        col("w2") === col("u1w"), "left")
      .join(uni.select(col("w").as("u2w"), col("cnt").as("c1")),
        col("w") === col("u2w"), "left")
    val t = lit(totalTokens.toDouble)
    val score =
      when(col("c3").isNotNull && col("c12").isNotNull,
        col("c3").cast("double") / col("c12").cast("double"))
      .when(col("c2").isNotNull && col("cw2").isNotNull,
        lit(BACKOFF) * col("c2").cast("double") / col("cw2").cast("double"))
      .when(col("c1").isNotNull,
        lit(BACKOFF * BACKOFF) * col("c1").cast("double") / t)
      .otherwise(lit(BACKOFF * BACKOFF) / (t + lit(vocab.toDouble)))
    val r = joined.agg(avg(log(score)).as("nll"), count(lit(1)).as("n")).head()
    if (r.isNullAt(0)) Double.NaN else math.exp(-r.getDouble(0))
  }

  def finetuneGeneration(spark: SparkSession, catalog: Catalog,
      cfg: GenConfig): DataFrame = {
    val t0 = System.nanoTime()
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == "text-generation",
          s"Project ${cfg.projectName} already exists with task ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, "text-generation")
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName, Seq(cfg.textCol),
      cfg.testSize, "random", df0.schema.json)
    val docs = df0.select(col(cfg.textCol)).na.drop()
    val (trainDF0, testDF0) =
      Sampling.splitByFraction(docs, Seq(cfg.textCol), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (docs, docs) else (trainDF0, testDF0)

    val (uni, bi, tri) = countNgrams(trainDF, cfg.textCol)
    val stats = uni.agg(sum("cnt").as("t"), count(lit(1)).as("v")).head()
    val totalTokens = stats.getLong(0)
    val vocab = stats.getLong(1)
    require(totalTokens > 0, "text-generation finetune needs a non-empty corpus")
    val fitTime = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val ppl = backoffPerplexity(testDF, cfg.textCol, uni, bi, tri, totalTokens, vocab)
    val metrics = Map("perplexity" -> ppl,
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id, "finetune:ngram_lm",
      cfg.hyperparams ++ Map("task" -> "text-generation", "compat" -> "ngram_lm",
        "order" -> "3", "total_tokens" -> totalTokens.toString,
        "vocab" -> vocab.toString),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    uni.write.mode("overwrite").parquet(s"$path/uni")
    bi.write.mode("overwrite").parquet(s"$path/bi")
    tri.write.mode("overwrite").parquet(s"$path/tri")
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      f"finetuned trigram stupid-backoff LM: perplexity=$ppl%.4f " +
        s"tokens=$totalTokens vocab=$vocab")

    // perplexity deploys LOWER (the reference's text_generation metric
    // direction — `task.rs:97-106`)
    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "perplexity")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // a NaN perplexity (no held-out doc reached the trigram order) must
    // neither deploy as a "score" nor — once stored — permanently block
    // every later real model behind `ppl < NaN` (always false)
    val shouldDeploy = cfg.automaticDeploy && !ppl.isNaN &&
      deployed.forall(old => old.isNaN || ppl < old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    contractRow(spark, cfg.projectName, "text-generation", "finetune:ngram_lm",
      shouldDeploy)
  }

  /** Deterministic greedy continuation: per prompt, `maxNewTokens`
    * argmax steps over the deployed LM's per-context argmax tables
    * (trigram context first, bigram fallback, global-top fallback).
    * Only the argmax tables broadcast — one row per distinct context,
    * `maxContexts`-guarded; a corpus past the guard should prune
    * contexts by count upstream (the standard LM pruning) before
    * decode. Returns the input columns + `generated` (the continuation
    * only, space-joined). */
  /** Deployed-LM argmax tables, loaded once per (catalog, project) and
    * cached — the same namespaced-cache discipline as
    * [[graft.ml.Predict]]'s model cache. */
  // entries carry the DEPLOYED MODEL PATH they were built from; the
  // load paths re-resolve the deployment each call (a row-cache-cheap
  // catalog lookup) and rebuild on mismatch, so a redeploy in the same
  // JVM serves the NEW model instead of a stale memo — the same
  // freshness translateText gets by resolving deployedPath per call
  private val lmCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Map[String, String], Map[String, String], String))]()
  private val lexCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, String])]()
  def clearCaches(): Unit = { lmCache.clear(); lexCache.clear(); lmDistCache.clear() }

  private def deployedPath(catalog: Catalog, project: String): String = {
    val modelId = catalog.deployedModelId(project).getOrElse(
      throw new IllegalStateException(s"Project '$project' has no deployed model"))
    catalog.modelPath(modelId).getOrElse(
      throw new IllegalStateException(s"Model $modelId has no persisted file"))
  }

  /** Path-validated memo shared by the LM and lexicon caches: a hit is
    * only served while the deployment still points at the path it was
    * built from. */
  private def cachedByPath[V](cache: java.util.concurrent.ConcurrentHashMap[
      String, (String, V)], key: String, path: String)(build: => V): V = {
    val hit = cache.get(key)
    if (hit != null && hit._1 == path) hit._2
    else { val v = build; cache.put(key, (path, v)); v }
  }

  private def loadLm(spark: SparkSession, catalog: Catalog, project: String,
      maxContexts: Long): (Map[String, String], Map[String, String], String) = {
    val path = deployedPath(catalog, project)
    cachedByPath(lmCache, s"${catalog.baseDir}#$project", path) {
      val uni = spark.read.parquet(s"$path/uni")
      val bi = spark.read.parquet(s"$path/bi")
      val tri = spark.read.parquet(s"$path/tri")
      def argmax(counts: DataFrame): DataFrame = counts
        .groupBy("ctx").agg(max(struct(col("cnt"), col("w"))).as("m"))
        .select(col("ctx"), col("m.w").as("w"))
      val nCtx = tri.select("ctx").distinct().count() +
        bi.select("ctx").distinct().count()
      require(nCtx <= maxContexts,
        s"LM has $nCtx distinct contexts > $maxContexts broadcast guard; " +
          "prune low-count contexts before decode (standard LM pruning)")
      val triMap = argmax(tri).collect().map(r => (r.getString(0), r.getString(1))).toMap
      val biMap = argmax(bi).collect().map(r => (r.getString(0), r.getString(1))).toMap
      val uniTop = uni.agg(max(struct(col("cnt"), col("w")))).head()
        .getStruct(0).getString(1)
      (triMap, biMap, uniTop)
    }
  }

  /** One greedy continuation (pure kernel shared by the DataFrame path
    * and the scalar SQL function). */
  private[llm] def greedy(tm: Map[String, String], bm: Map[String, String],
      top: String, prompt: String, maxNewTokens: Int): String = {
    val toks = scala.collection.mutable.ArrayBuffer.from(
      Option(prompt).getOrElse("").trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val out = new scala.collection.mutable.ArrayBuffer[String](maxNewTokens)
    var i = 0
    while (i < maxNewTokens) {
      val next =
        (if (toks.length >= 2)
          tm.get(toks(toks.length - 2) + SEP + toks(toks.length - 1))
        else None)
          .orElse(if (toks.nonEmpty) bm.get(toks.last) else None)
          .getOrElse(top)
      toks += next
      out += next
      i += 1
    }
    out.mkString(" ")
  }

  def generateText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, promptCol: String = "prompt", maxNewTokens: Int = 10,
      maxContexts: Long = 2000000L): DataFrame = {
    val (triMap, biMap, uniTop) = loadLm(spark, catalog, project, maxContexts)
    val bc = spark.sparkContext.broadcast((triMap, biMap, uniTop))
    val outSchema = StructType(df.schema.fields :+ StructField("generated", StringType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val promptIdx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { it =>
      val (tm, bm, top) = bc.value
      it.map { row =>
        Row.fromSeq(row.toSeq :+
          greedy(tm, bm, top, row.getString(promptIdx), maxNewTokens))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // generation knobs: beam search + seeded sampling over the trained LM
  // ------------------------------------------------------------------

  /** Per-level conditional DISTRIBUTIONS of the deployed LM (the greedy
    * path only needs argmax): `tri` maps a 2-token context to its top
    * continuations with trigram MLE c(uvw)/c(uv), `bi` a 1-token
    * context with bigram MLE c(vw)/c(v), `uniTop` the top unigrams with
    * c(w)/N — the exact per-level scores the Brants stupid-backoff
    * perplexity uses, so decode and eval agree on the model. Candidate
    * lists are capped at [[TOP_CAND]] per context (beam/nucleus decode
    * only ever needs the head of the distribution; the cap bounds the
    * broadcast at TOP_CAND·nCtx rows under the dedicated — and
    * deliberately LOWER — [[DefaultMaxDistContexts]] guard, not the
    * argmax tables' 2M guard, because every admitted context costs
    * TOP_CAND× the argmax footprint here). */
  private[llm] final case class LmDist(
      tri: Map[String, IndexedSeq[(String, Double)]],
      bi: Map[String, IndexedSeq[(String, Double)]],
      uniTop: IndexedSeq[(String, Double)])

  /** Candidates kept per context level — the distribution head decode
    * branches over. Published beam implementations expand at most
    * O(beam width) per step; 16 leaves headroom above the reference's
    * documented num_beams=5 golden test. */
  private val TOP_CAND = 16

  /** Separate, LOWER guard for the DISTRIBUTION tables: each context
    * carries up to [[TOP_CAND]](16) candidate rows where the argmax
    * tables carry one, so inheriting the 2M argmax guard would admit a
    * ~32M-entry driver map (multi-GB) the moment a corpus sits at the
    * ceiling. 500k caps the dist head at 8M small tuples while leaving
    * every realistic decode corpus loadable; past it, count-prune
    * low-frequency contexts at train time (standard LM entropy/count
    * pruning — Brants et al. 2007 §4) or raise the knob explicitly. */
  private[llm] val DefaultMaxDistContexts = 500000L

  private val lmDistCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, LmDist)]()

  private[llm] def loadLmDist(spark: SparkSession, catalog: Catalog,
      project: String, maxDistContexts: Long): LmDist = {
    val path = deployedPath(catalog, project)
    cachedByPath(lmDistCache, s"${catalog.baseDir}#$project", path) {
      val uni = spark.read.parquet(s"$path/uni")
      val bi = spark.read.parquet(s"$path/bi")
      val tri = spark.read.parquet(s"$path/tri")
      val nCtx = tri.select("ctx").distinct().count() +
        bi.select("ctx").distinct().count()
      require(nCtx <= maxDistContexts,
        s"LM has $nCtx distinct contexts > $maxDistContexts " +
          s"distribution-table guard (each context broadcasts up to " +
          s"$TOP_CAND candidates — ${TOP_CAND}× the argmax tables' " +
          "per-context footprint, so this guard is deliberately lower " +
          "than the argmax maxContexts); prune low-count contexts before " +
          "decode (standard LM pruning, Brants et al. 2007 §4) or raise " +
          "maxDistContexts")
      // top-K rows per ctx by (cnt desc, w desc — the repo-wide
      // max(struct) tie rule), probabilities against the LOWER-order
      // count denominator (Brants scores, same as backoffPerplexity)
      def topK(counts: DataFrame, den: DataFrame): Map[String, IndexedSeq[(String, Double)]] = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ctx")).orderBy(col("cnt").desc, col("w").desc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TOP_CAND)
          .join(den, Seq("ctx"))
          .select(col("ctx"), col("w"), (col("cnt") / col("den")).as("p"), col("rn"))
          .collect()
          .groupBy(_.getString(0))
          .map { case (c, rows) =>
            c -> rows.sortBy(_.getInt(3))
              .map(r => (r.getString(1), r.getDouble(2))).toIndexedSeq
          }
      }
      // denominator for tri rows is the BIGRAM count of the context
      // (ctx = "u⊕v" matches bi's concat(ctx, SEP, w)); for bi rows the
      // unigram count of the context word
      val biAsCtx = bi.select(concat(col("ctx"), lit(SEP), col("w")).as("ctx"),
        col("cnt").cast("double").as("den"))
      val uniAsCtx = uni.select(col("w").as("ctx"), col("cnt").cast("double").as("den"))
      val n = uni.agg(sum("cnt")).head().getLong(0).toDouble
      val uniTop = uni
        .orderBy(col("cnt").desc, col("w").desc).limit(TOP_CAND)
        .collect().map(r => (r.getString(0), r.getLong(1) / n)).toIndexedSeq
      LmDist(topK(tri, biAsCtx), topK(bi, uniAsCtx), uniTop)
    }
  }

  private def tokenize(s: String): Vector[String] =
    Option(s).getOrElse("").trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toVector

  /** Backoff-union candidate set for the context ending in (…, u, v):
    * trigram continuations at their MLE, then UNSEEN-at-tri bigram
    * continuations at 0.4·MLE, then unseen-at-both unigrams at
    * 0.4²·MLE — each word scored at the HIGHEST level that knows it
    * (Brants et al. 2007 §3). Never empty: `uniTop` always has rows on
    * a trained model. */
  private[llm] def candScores(d: LmDist, ctx: Vector[String]): IndexedSeq[(String, Double)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (ctx.length >= 2)
      d.tri.getOrElse(ctx(ctx.length - 2) + SEP + ctx.last, Vector.empty)
        .foreach { case (w, p) => if (!out.contains(w)) out.update(w, p) }
    if (ctx.nonEmpty)
      d.bi.getOrElse(ctx.last, Vector.empty)
        .foreach { case (w, p) => if (!out.contains(w)) out.update(w, BACKOFF * p) }
    d.uniTop.foreach { case (w, p) =>
      if (!out.contains(w)) out.update(w, BACKOFF * BACKOFF * p)
    }
    out.toIndexedSeq
  }

  /** Deterministic length-normalized beam search (width = `numBeams`,
    * score = Σ ln S / length — HF's length_penalty=1.0 formula; with no
    * EOS token every live beam shares a length, so normalization is
    * shown for parity, not ranking). Ties resolve to the
    * lexicographically GREATER continuation — the same direction as
    * greedy's max(struct(cnt, w)) rule. Returns the top `numReturn`
    * beams, best first. */
  private[llm] def beamSearch(d: LmDist, prompt: String, maxNew: Int,
      numBeams: Int, numReturn: Int): Seq[String] = {
    require(numBeams >= 1, s"num_beams must be >= 1, got $numBeams")
    require(numReturn >= 1 && numReturn <= numBeams,
      s"num_return_sequences ($numReturn) must be in [1, num_beams=$numBeams]")
    val ptoks = tokenize(prompt)
    if (maxNew <= 0) return Seq.fill(numReturn)("")
    final case class Beam(toks: Vector[String], logSum: Double)
    val ord: Ordering[Beam] = Ordering.by((b: Beam) =>
      (b.logSum / b.toks.length, b.toks.mkString(" ")))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.String.reverse))
    var beams = Vector(Beam(Vector.empty, 0.0))
    var step = 0
    while (step < maxNew) {
      beams = beams.flatMap { b =>
        candScores(d, ptoks ++ b.toks).map { case (w, p) =>
          Beam(b.toks :+ w, b.logSum + math.log(p))
        }
      }.sorted(ord).take(numBeams)
      step += 1
    }
    beams.take(numReturn).map(_.toks.mkString(" "))
  }

  /** One seeded ancestral sample: per step, temperature-shape the
    * backoff candidate scores (p^(1/T)), truncate to the nucleus — the
    * smallest prefix of the (prob desc, word asc) order whose
    * cumulative mass reaches `topP` (Holtzman et al. 2020) — then draw
    * from the renormalized head with the caller's RNG. Deterministic
    * under a fixed seed regardless of partitioning (the caller seeds
    * per (prompt, sequence index)). */
  private[llm] def sampleSeq(d: LmDist, prompt: String, maxNew: Int,
      temperature: Double, topP: Double, rng: java.util.Random): String = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    require(topP > 0.0 && topP <= 1.0, s"top_p must be in (0, 1], got $topP")
    var ctx = tokenize(prompt)
    val out = new scala.collection.mutable.ArrayBuffer[String](math.max(maxNew, 0))
    var step = 0
    while (step < maxNew) {
      val shaped = candScores(d, ctx)
        .map { case (w, p) => (w, math.pow(p, 1.0 / temperature)) }
        .sortBy { case (w, q) => (-q, w) }
      val total = shaped.iterator.map(_._2).sum
      val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var cum = 0.0
      var i = 0
      while (i < shaped.length && (kept.isEmpty || cum < topP * total)) {
        kept += shaped(i); cum += shaped(i)._2; i += 1
      }
      val draw = rng.nextDouble() * cum
      var acc = 0.0
      var pick = kept.head._1
      var j = 0
      var found = false
      while (j < kept.length && !found) {
        acc += kept(j)._2
        if (draw < acc) { pick = kept(j)._1; found = true }
        j += 1
      }
      if (!found) pick = kept.last._1 // draw == cum exactly (fp edge)
      ctx = ctx :+ pick
      out += pick
      step += 1
    }
    out.mkString(" ")
  }

  /** Resolve the new-token budget for one prompt from the config map:
    * `max_new_tokens` wins; `max_length` is the reference's TOTAL
    * length cap (prompt + continuation, HF semantics); default 10 (the
    * greedy path's default). */
  private def newTokenBudget(config: Map[String, String], promptLen: Int): Int =
    config.get("max_new_tokens").map(_.toInt)
      .orElse(config.get("max_length").map(ml => math.max(0, ml.toInt - promptLen)))
      .getOrElse(10)

  /** Generation with the reference's knob surface (`api.rs` golden
    * tests: num_beams, num_return_sequences, do_sample, temperature,
    * top_p, max_length) over the DEPLOYED trigram LM. Dispatch follows
    * HF: `do_sample=true` → seeded nucleus sampling (`seed` knob,
    * default 42 — the sandbox has no nondeterminism budget, so sampling
    * is reproducible BY DESIGN and stated); `num_beams>1` →
    * deterministic length-normalized beam search; else greedy (which
    * requires num_return_sequences=1, as HF does). Adds `generated`
    * ARRAY<STRING> (always num_return_sequences entries, best first).
    * Only the capped distribution tables broadcast; decode stays a map
    * stage — same 100 TB shape as [[generateText]]. */
  def generateTextCfg(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, promptCol: String = "prompt",
      config: Map[String, String] = Map.empty,
      maxDistContexts: Long = DefaultMaxDistContexts): DataFrame = {
    val dist = loadLmDist(spark, catalog, project,
      config.get("max_dist_contexts").map(_.toLong).getOrElse(maxDistContexts))
    val numBeams = config.get("num_beams").map(_.toInt).getOrElse(1)
    val numReturn = config.get("num_return_sequences").map(_.toInt).getOrElse(1)
    val doSample = config.get("do_sample").exists(_.toBoolean)
    val temperature = config.get("temperature").map(_.toDouble).getOrElse(1.0)
    val topP = config.get("top_p").map(_.toDouble).getOrElse(1.0)
    val seed = config.get("seed").map(_.toLong).getOrElse(42L)
    if (!doSample && numBeams == 1) require(numReturn == 1,
      "num_return_sequences > 1 needs do_sample=true or num_beams > 1 " +
        "(greedy search returns a single sequence — HF contract)")
    val bc = spark.sparkContext.broadcast(dist)
    val outSchema = StructType(df.schema.fields :+
      StructField("generated", ArrayType(StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val promptIdx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { it =>
      val d = bc.value
      it.map { row =>
        val prompt = row.getString(promptIdx)
        val budget = newTokenBudget(config, tokenize(prompt).length)
        val gen: Seq[String] =
          if (doSample) (0 until numReturn).map { i =>
            // partition-independent seed: stable per (prompt, index)
            val rng = new java.util.Random(
              seed * 1000003L + i * 7919L + Option(prompt).getOrElse("").hashCode)
            sampleSeq(d, prompt, budget, temperature, topP, rng)
          }
          else if (numBeams > 1) beamSearch(d, prompt, budget, numBeams, numReturn)
          else Seq(greedyFromDist(d, prompt, budget))
        Row.fromSeq(row.toSeq :+ gen)
      }
    }(enc)
  }

  /** Greedy over the distribution tables (beam width 1 of the SAME
    * score surface): used by the cfg path so all three strategies rank
    * candidates identically. The argmax-table `greedy` twin picks the
    * trigram argmax whenever the context is known; this one picks the
    * backoff-score argmax — identical whenever the trigram level is
    * decisive (GenerativeSpec pins the memorized-cycle equality). */
  private[llm] def greedyFromDist(d: LmDist, prompt: String, maxNew: Int): String =
    beamSearch(d, prompt, maxNew, 1, 1).head

  // ------------------------------------------------------------------
  // translation: IBM Model 1 via distributed EM
  // ------------------------------------------------------------------

  final case class XlatConfig(
      projectName: String,
      relationName: String = "",
      data: Option[DataFrame] = None,
      srcCol: String = "text1",
      tgtCol: String = "text2",
      testSize: Double = 0.25,
      emIters: Int = 5,
      hyperparams: Map[String, String] = Map.empty,
      automaticDeploy: Boolean = true,
      seed: Long = 42L)

  /** EM over sentence pairs. Returns the converged t(f|e) table
    * (e, f, t). The exploded (sid, j, e, f) frame — Model 1's
    * |f|·(|e|+1) pair space per sentence — is built ONCE and persisted;
    * each iteration is: join t → per-(sid, j) WINDOW normalizer →
    * expected-count aggregate → per-e ratio. The (sid,j) window sum
    * replaces an aggregate + join-back, so the BIG frame shuffles once
    * per iteration instead of twice (measured: −5..9% on the sf0.1
    * gate) and its groups are sentence-length-bounded (skew-safe); the
    * per-e totals stay a join (see inline note on skew). The t-table
    * localCheckpoints per iteration. */
  /** The (sid, j, ne, f, e) Model-1 alignment frame shared by
    * [[ibm1Em]] and the round-1 exact twin [[ibm1Round1CountsQ]]:
    * es = NULL ++ source tokens (duplicates KEPT — a source word
    * appearing twice gets twice the alignment mass, Brown 1993 §4),
    * one row per (target position j, source slot). `ne` = |es| rides
    * along so the twin can form the round-1 posterior 1/ne without
    * re-deriving sentence lengths. */
  private def ibm1Exploded(pairs: DataFrame, srcCol: String,
      tgtCol: String): DataFrame = {
    val src = TextMetrics.tokens(col(srcCol))
    val tgt = TextMetrics.tokens(col(tgtCol))
    pairs
      .select(monotonically_increasing_id().as("sid"),
        concat(array(lit(NULL_TOKEN)), src).as("es"), tgt.as("fs"))
      .filter(size(col("fs")) > 0 && size(col("es")) > 1)
      .select(col("sid"), col("es"), size(col("es")).as("ne"),
        posexplode(col("fs")).as(Seq("j", "f")))
      .select(col("sid"), col("j"), col("ne"), col("f"),
        explode(col("es")).as("e"))
  }

  private def ibm1Em(pairs: DataFrame, srcCol: String, tgtCol: String,
      iters: Int): DataFrame = {
    val exploded = ibm1Exploded(pairs, srcCol, tgtCol).localCheckpoint()
    val vf = exploded.select("f").distinct().count()
    require(vf > 0, "translation finetune needs non-empty sentence pairs")
    val init = 1.0 / vf

    var t: DataFrame = null // null = first iteration, all-uniform t
    var it = 0
    while (it < iters) {
      val scored =
        (if (t == null) exploded.withColumn("tv", lit(init))
         else exploded.join(t, Seq("e", "f"), "left")
           .withColumn("tv", coalesce(col("t"), lit(init))).drop("t"))
      // per-(sid,j) normalizer as a WINDOW sum: one shuffle of the
      // exploded frame instead of two (aggregate + join-back would
      // re-shuffle the big frame onto (sid,j) a second time). SKEW-SAFE
      // because a (sid,j) group is one target position's |e|+1 rows —
      // sentence-length-bounded, never corpus-bounded.
      val wz = org.apache.spark.sql.expressions.Window.partitionBy("sid", "j")
      val counts = scored.withColumn("z", sum(col("tv")).over(wz))
        .withColumn("d", col("tv") / col("z"))
        .groupBy("e", "f").agg(sum("d").as("cef"))
      // per-e totals DELIBERATELY stay aggregate + join-back: an `e`
      // group is df-like (a stopword e aligns with much of the target
      // vocab), and WindowExec cannot skew-split where AQE's skew-join
      // can — same trade as ds_tfidf_keywords' df join
      val totals = counts.groupBy("e").agg(sum("cef").as("ce"))
      val tNew = counts.join(totals, "e")
        .select(col("e"), col("f"), (col("cef") / col("ce")).as("t"))
        .localCheckpoint()
      t = tNew
      it += 1
    }
    t
  }

  /** ONE exact EM round of [[ibm1Em]] from the uniform init, on
    * scaled-integer arithmetic — the hash-exact train twin
    * (`ta_unigram_train1` pattern). At round 1 every t(f|e) is the
    * same constant, so the per-row posterior d = tv / Σ_es tv = 1/ne
    * EXACTLY — the 1/|V_f| init cancels and never touches the result.
    * Scaling by 2520 = lcm(1..10) makes every per-row weight an exact
    * BIGINT (the sentence builder must cap source length at 9 tokens;
    * a longer sentence raises an error rather than silently rounding),
    * so the expected counts cnt(e,f) = Σ 2520/ne, their per-e totals,
    * and the quantized lexicon score tq = ⌊cnt·10⁶/ce⌋ (identical to
    * the production round-1 t(f|e) up to the common 2520 factor, which
    * cancels in the ratio) are all order-independent integer sums and
    * divisions a SQL oracle replays bit-for-bit. Hashing the FULL
    * (e, f, cnt, ce, tq) table pins the frame construction (NULL slot,
    * duplicate source slots, empty-pair filters) and the E/M algebra —
    * strictly stronger than pinning the per-e argmax alone. */
  def ibm1Round1CountsQ(pairs: DataFrame, srcCol: String,
      tgtCol: String): DataFrame = {
    val ex = ibm1Exploded(pairs, srcCol, tgtCol)
      .withColumn("w",
        when(col("ne") > 10, raise_error(lit(
          "ibm1Round1CountsQ: >9 source tokens breaks lcm-2520 exactness")))
          .otherwise(lit(2520.0) / col("ne")).cast("long"))
    val cnt = ex.groupBy("e", "f").agg(sum("w").as("cnt"))
    val ce = cnt.groupBy("e").agg(sum("cnt").as("ce"))
    cnt.join(ce, "e")
      .select(col("e"), col("f"), col("cnt"), col("ce"),
        expr("(cnt * 1000000L) div ce").as("tq"))
  }

  /** Word-by-word argmax decode of `textCol` through a lexical table
    * (e, f, t): OOV source words copy through (stated Model 1
    * behavior — no reordering, no fertility). Join-based — no
    * broadcast, no cap; re-assembly is a per-row sort of collected
    * (pos, word) structs. */
  private def decodeWith(lex: DataFrame, df: DataFrame, textCol: String,
      outCol: String): DataFrame = {
    val best = lex.filter(col("e") =!= NULL_TOKEN)
      .groupBy("e").agg(max(struct(col("t"), col("f"))).as("m"))
      .select(col("e"), col("m.f").as("fbest"))
    // freeze the nondeterministic id: withId feeds BOTH the explode
    // branch and the reassembly join — an uncheckpointed recompute
    // could re-number rows differently between the two
    val withId = df.withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val toks = withId
      .select(col("__rid"), posexplode_outer(TextMetrics.tokens(col(textCol)))
        .as(Seq("pos", "e")))
      .join(best, Seq("e"), "left")
      .withColumn("out", coalesce(col("fbest"), col("e")))
    val assembled = toks.groupBy("__rid")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("out")))),
          s => s.getField("out"))).as(outCol))
    withId.join(assembled, Seq("__rid")).drop("__rid")
  }

  def finetuneTranslation(spark: SparkSession, catalog: Catalog,
      cfg: XlatConfig): DataFrame = {
    val t0 = System.nanoTime()
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == "translation",
          s"Project ${cfg.projectName} already exists with task ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, "translation")
    }
    val df0 = cfg.data.getOrElse(spark.table(cfg.relationName))
    val snapshot = catalog.createSnapshot(cfg.relationName,
      Seq(cfg.srcCol, cfg.tgtCol), cfg.testSize, "random", df0.schema.json)
    val pairs = df0.select(col(cfg.srcCol), col(cfg.tgtCol)).na.drop()
    val (trainDF0, testDF0) = Sampling.splitByFraction(
      pairs, Seq(cfg.srcCol, cfg.tgtCol), cfg.testSize, cfg.seed)
    val (trainDF, testDF) =
      if (trainDF0.isEmpty || testDF0.isEmpty) (pairs, pairs) else (trainDF0, testDF0)

    val iters = cfg.hyperparams.get("em_iters").map(_.toInt).getOrElse(cfg.emIters)
    val lex = ibm1Em(trainDF, cfg.srcCol, cfg.tgtCol, iters)
    val fitTime = (System.nanoTime() - t0) / 1e9

    // eval: decode the held-out sources, report the reference's exact
    // translation metric keys (transformers.py:757-768)
    val t1 = System.nanoTime()
    val decoded = decodeWith(lex, testDF, cfg.srcCol, "__pred")
    val bleu = TextMetrics.bleuCorpus(decoded, "__pred", cfg.tgtCol)
      .select(col("bleu").cast("double")).head().getDouble(0)
    val rouge = TextMetrics.rougeAvg(decoded, "__pred", cfg.tgtCol).head()
    val metrics = Map(
      "bleu" -> bleu,
      "rouge_ngram_f1" -> rouge.getDouble(0),
      "rouge_ngram_precision" -> rouge.getDouble(1),
      "rouge_ngram_recall" -> rouge.getDouble(2),
      "rouge_bigram_f1" -> rouge.getDouble(3),
      "rouge_bigram_precision" -> rouge.getDouble(4),
      "rouge_bigram_recall" -> rouge.getDouble(5),
      "fit_time" -> fitTime, "score_time" -> (System.nanoTime() - t1) / 1e9)

    val modelRow = catalog.createModel(project.id, snapshot.id, "finetune:ibm_model1",
      cfg.hyperparams ++ Map("task" -> "translation", "compat" -> "ibm_model1",
        "em_iters" -> iters.toString),
      metrics, "none")
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    lex.write.mode("overwrite").parquet(s"$path/lex")
    catalog.addFile(modelRow.id, path)
    catalog.addLog(modelRow.id,
      f"finetuned IBM Model 1 ($iters EM iters): bleu=$bleu%.4f " +
        f"rouge1_f=${rouge.getDouble(0)}%.4f")

    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), "bleu")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy && deployed.forall(old => bleu > old)
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    contractRow(spark, cfg.projectName, "translation", "finetune:ibm_model1",
      shouldDeploy)
  }

  /** Translate `textCol` through the deployed Model-1 lexicon
    * (join-based decode — the no-cap scale path). Appends `translated`. */
  def translateText(spark: SparkSession, catalog: Catalog, project: String,
      df: DataFrame, textCol: String = "text"): DataFrame = {
    val lex = spark.read.parquet(s"${deployedPath(catalog, project)}/lex")
    decodeWith(lex, df, textCol, "translated")
  }

  /** Deployed-lexicon best-translation map (source word → argmax target
    * word) for the scalar SQL path; size is the SOURCE VOCABULARY (not
    * the t-table), guarded like the LM contexts. */
  private def loadLexicon(spark: SparkSession, catalog: Catalog,
      project: String, maxWords: Long): Map[String, String] = {
    val path = deployedPath(catalog, project)
    cachedByPath(lexCache, s"${catalog.baseDir}#$project", path) {
      val lex = spark.read.parquet(s"$path/lex")
        .filter(col("e") =!= NULL_TOKEN)
      val n = lex.select("e").distinct().count()
      require(n <= maxWords,
        s"lexicon has $n source words > $maxWords broadcast guard; " +
          "use translateText (join-based decode, no cap) instead")
      lex.groupBy("e").agg(max(struct(col("t"), col("f"))).as("m"))
        .select(col("e"), col("m.f")).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
    }
  }

  /** Catalog bound for the scalar SQL surface — the
    * [[graft.ml.Predict]] singleton discipline: the UDF lambdas must
    * capture NOTHING non-serializable (Catalog holds a live session),
    * so they resolve the catalog and session through this JVM-static
    * indirection; in local mode executors share the JVM, and the bulk
    * [[generateText]]/[[translateText]] paths are the cluster-safe
    * route. */
  @volatile private var bound: Catalog = _
  private def boundCatalog: Catalog = {
    val c = bound
    require(c != null, "Generative.registerFunctions has not been called")
    c
  }

  /** Pre-load every deployed text-generation / translation project's
    * argmax tables (the [[graft.ml.Predict.warm]] discipline: the UDF
    * body must run NO Spark jobs — a nested action inside a task is
    * illegal — so all loads happen here, driver-side). */
  def warm(spark: SparkSession, catalog: Catalog,
      maxContexts: Long = 2000000L): Unit =
    catalog.deployedModels.select(col("name"), col("task"))
      .collect().foreach { r =>
        r.getString(1) match {
          case "text-generation" =>
            loadLm(spark, catalog, r.getString(0), maxContexts)
            loadLmDist(spark, catalog, r.getString(0),
              math.min(maxContexts, DefaultMaxDistContexts)); ()
          case "translation" =>
            loadLexicon(spark, catalog, r.getString(0), maxContexts); ()
          case _ => ()
        }
      }

  private def cachedLm(project: String)
      : (Map[String, String], Map[String, String], String) = {
    val v = lmCache.get(s"${boundCatalog.baseDir}#$project")
    require(v != null,
      s"text-generation project '$project' is not warmed — deploy happened " +
        "after registerFunctions, or the project does not exist; call " +
        "Generative.warm")
    v._2
  }

  private def cachedLmDist(project: String): LmDist = {
    val v = lmDistCache.get(s"${boundCatalog.baseDir}#$project")
    require(v != null,
      s"text-generation project '$project' is not warmed — deploy happened " +
        "after registerFunctions, or the project does not exist; call " +
        "Generative.warm")
    v._2
  }

  /** Parse a generate-args JSON object (the reference's `args =>
    * '{"num_beams": 5, ...}'` shape) into the flat string map the
    * decode knobs read. Numbers, booleans, and strings all render via
    * their JSON literal; nested values are rejected. */
  private[llm] def parseGenArgs(json: String): Map[String, String] = {
    val trimmed = Option(json).getOrElse("").trim
    if (trimmed.isEmpty) return Map.empty
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(trimmed) match {
      case JObject(fields) => fields.map {
        case (k, JString(s)) => k -> s
        case (k, JInt(i)) => k -> i.toString
        case (k, JLong(i)) => k -> i.toString
        case (k, JDouble(x)) => k -> x.toString
        case (k, JDecimal(x)) => k -> x.toString
        case (k, JBool(b)) => k -> b.toString
        case (k, v) => throw new IllegalArgumentException(
          s"generate args key '$k' has unsupported JSON value: $v")
      }.toMap
      case other => throw new IllegalArgumentException(
        s"generate args must be a JSON object, got: $other")
    }
  }

  private def cachedLexicon(project: String): Map[String, String] = {
    val v = lexCache.get(s"${boundCatalog.baseDir}#$project")
    require(v != null,
      s"translation project '$project' is not warmed — deploy happened " +
        "after registerFunctions, or the project does not exist; call " +
        "Generative.warm")
    v._2
  }

  /** Scalar SQL surface over the TRAINED generative projects — the
    * project-scoped twins of the runtime-backed `quackml_generate`:
    *
    *   quackml_generate_lm(project, prompt, n) — greedy n-token
    *     continuation from the deployed trigram LM;
    *   quackml_translate(project, text)       — word-by-word Model 1
    *     decode through the deployed lexicon (OOV copies through).
    *
    * Registration WARMS every deployed generative project into the
    * process-wide cache (UDF bodies run no jobs); call [[clearCaches]]
    * + re-register after redeploying. */
  def registerFunctions(spark: SparkSession, catalog: Catalog,
      maxContexts: Long = 2000000L): Unit = {
    bound = catalog
    warm(spark, catalog, maxContexts)
    spark.udf.register("quackml_generate_lm",
      (project: String, prompt: String, n: Int) => {
        val (tm, bm, top) = cachedLm(project)
        greedy(tm, bm, top, prompt, n)
      })
    // knob-bearing twin: quackml_generate_lm_cfg(project, prompt, args)
    // with the reference's args-JSON shape ({"num_beams":5,
    // "num_return_sequences":3, "do_sample":true, "temperature":0.9,
    // "top_p":0.8, "max_length"/"max_new_tokens", "seed"}); returns
    // ARRAY<STRING>, best sequence first
    spark.udf.register("quackml_generate_lm_cfg",
      (project: String, prompt: String, argsJson: String) => {
        val d = cachedLmDist(project)
        val cfg = parseGenArgs(argsJson)
        val numBeams = cfg.get("num_beams").map(_.toInt).getOrElse(1)
        val numReturn = cfg.get("num_return_sequences").map(_.toInt).getOrElse(1)
        val doSample = cfg.get("do_sample").exists(_.toBoolean)
        val temperature = cfg.get("temperature").map(_.toDouble).getOrElse(1.0)
        val topP = cfg.get("top_p").map(_.toDouble).getOrElse(1.0)
        val seed = cfg.get("seed").map(_.toLong).getOrElse(42L)
        val budget = {
          val pl = Option(prompt).getOrElse("").trim.toLowerCase
            .split("\\s+").count(_.nonEmpty)
          cfg.get("max_new_tokens").map(_.toInt)
            .orElse(cfg.get("max_length").map(ml => math.max(0, ml.toInt - pl)))
            .getOrElse(10)
        }
        if (!doSample && numBeams == 1) require(numReturn == 1,
          "num_return_sequences > 1 needs do_sample=true or num_beams > 1")
        if (doSample) (0 until numReturn).map { i =>
          val rng = new java.util.Random(
            seed * 1000003L + i * 7919L + Option(prompt).getOrElse("").hashCode)
          sampleSeq(d, prompt, budget, temperature, topP, rng)
        }
        else if (numBeams > 1) beamSearch(d, prompt, budget, numBeams, numReturn)
        else Seq(greedyFromDist(d, prompt, budget))
      })
    spark.udf.register("quackml_translate",
      (project: String, text: String) => {
        val m = cachedLexicon(project)
        Option(text).getOrElse("").trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).map(w => m.getOrElse(w, w)).mkString(" ")
      })
  }

  private def contractRow(spark: SparkSession, project: String, task: String,
      algorithm: String, deployed: Boolean): DataFrame = {
    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(project, task, algorithm, deployed)), schema)
  }
}
