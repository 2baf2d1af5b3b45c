package graft.llm

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ChunkSpec extends AnyFunSuite {
  test("recursive splitter respects chunk_size and keeps content") {
    val text = ("para one word soup here. " * 10 + "\n\n") * 5
    val chunks = Chunk.recursiveSplit(text, chunkSize = 100, overlap = 20)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 100), chunks.map(_.length).mkString(","))
    // every non-separator word survives somewhere
    assert(chunks.mkString(" ").contains("para one word soup"))
  }

  test("character splitter merges pieces up to size with overlap") {
    val text = (1 to 20).map(i => s"piece$i").mkString("\n\n")
    val chunks = Chunk.characterSplit(text, "\n\n", chunkSize = 30, overlap = 10)
    assert(chunks.forall(_.length <= 30))
    assert(chunks.head.startsWith("piece1"))
  }

  test("chunk() returns 1-based indices and rejects unknown splitters") {
    val out = Chunk.chunk("recursive_character", "a b c d e f g h",
      Map("chunk_size" -> "5", "chunk_overlap" -> "0"))
    assert(out.head._1 == 1)
    assert(out.map(_._1) == (1 to out.size))
    intercept[IllegalArgumentException](Chunk.chunk("nope", "text"))
  }

  test("markdown splitter breaks at headings before anything else") {
    val text = "intro line\n## Section One\nbody one body one\n## Section Two\nbody two"
    val chunks = Chunk.chunk("markdown", text,
      Map("chunk_size" -> "40", "chunk_overlap" -> "0")).map(_._2)
    assert(chunks.size >= 2)
    assert(chunks.exists(_.contains("Section One")))
    assert(chunks.exists(_.contains("Section Two")))
    // heading boundaries respected: no chunk contains both sections
    assert(!chunks.exists(c => c.contains("Section One") && c.contains("Section Two")))
  }

  test("latex splitter breaks at sectioning commands") {
    val text = "\\documentclass{article}\n\\section{A}\naaa aaa aaa\n\\section{B}\nbbb bbb"
    val chunks = Chunk.chunk("latex", text,
      Map("chunk_size" -> "40", "chunk_overlap" -> "0")).map(_._2)
    assert(chunks.size >= 2)
    assert(!chunks.exists(c => c.contains("{A}") && c.contains("{B}")))
  }

  test("python splitter keeps def boundaries") {
    val text = "import os\n\ndef first():\n    return 1\n\ndef second():\n    return 2\n"
    val chunks = Chunk.chunk("python", text,
      Map("chunk_size" -> "40", "chunk_overlap" -> "0")).map(_._2)
    assert(!chunks.exists(c => c.contains("first") && c.contains("second")))
  }

  test("nltk/spacy sentence splitters merge whole sentences") {
    val text = "One sentence here. Another one follows! A third asks? Fourth ends."
    val chunks = Chunk.chunk("nltk", text,
      Map("chunk_size" -> "45", "chunk_overlap" -> "0")).map(_._2)
    assert(chunks.forall(_.length <= 45))
    // sentences never split mid-way: each chunk is whole sentences
    assert(chunks.forall(c => c.split("\n\n").forall(s => "[.!?]$".r.findFirstIn(s.trim).isDefined)))
    assert(Chunk.chunk("spacy", text, Map("chunk_size" -> "45", "chunk_overlap" -> "0"))
      == Chunk.chunk("nltk", text, Map("chunk_size" -> "45", "chunk_overlap" -> "0")))
  }

  test("long unbroken text falls through to character-level splitting") {
    val text = "x" * 250
    val chunks = Chunk.recursiveSplit(text, chunkSize = 100, overlap = 0)
    assert(chunks.forall(_.length <= 100))
    assert(chunks.map(_.length).sum == 250)
  }
}

class LLMOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stub embeddings are deterministic and L2-normalized") {
    val rt = ModelRuntimes.get("stub")
    val Seq(a, b) = rt.embed(Seq("hello world", "hello world"), 16)
    assert(a.toSeq == b.toSeq)
    val nrm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(nrm - 1.0) < 1e-5)
  }

  test("embedColumn preserves row alignment under partitioned batching") {
    val df = (1 to 500).map(i => (i.toLong, s"text number $i")).toDF("id", "text")
      .repartition(7)
    val out = Ops.embedColumn(df, "stub", "text", "emb", dim = 8, batchSize = 32)
    val collected = out.select("id", "emb").collect()
    assert(collected.length == 500)
    val rt = ModelRuntimes.get("stub")
    val spot = collected.find(_.getLong(0) == 123L).get
    assert(spot.getSeq[Float](1) == rt.embed(Seq("text number 123"), 8).head.toSeq)
  }

  test("rank orders by score with deterministic output") {
    val docs = Seq((1L, "spark filter join"), (2L, "completely unrelated words"),
      (3L, "spark filter join query")).toDF("doc_id", "text")
    val ranked = Ops.rank(spark, "stub", "spark filter join", docs, "doc_id", "text")
      .collect()
    assert(ranked.length == 3)
    val scores = ranked.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("transformColumn + SQL functions (chunk/embed/transform/generate)") {
    val df = Seq((1L, "this is good. second sentence.")).toDF("id", "text")
    val out = Ops.transformColumn(df, "stub", "summarization", "text")
    assert(out.select("output").head().getString(0) == "this is good")

    Ops.registerFunctions(spark)
    val sent = spark.sql("SELECT quackml_transform('sentiment-analysis', 'a good day')")
      .head().getString(0)
    assert(sent == "POSITIVE")
    val chunks = spark.sql("SELECT quackml_chunk('recursive_character', 'a b c')")
      .head().getSeq[String](0)
    assert(chunks.nonEmpty && chunks.head.startsWith("1:"))
    val emb = spark.sql("SELECT quackml_embed('hello')").head().getSeq[Float](0)
    assert(emb.length == 16)
    val gen = spark.sql("SELECT quackml_generate('prompt')").head().getSeq[String](0)
    assert(gen.head.startsWith("prompt"))

    // embed_batch: one vector per input, identical to per-text embed
    val batch = spark.sql(
      "SELECT quackml_embed_batch(array('hello', 'world'))")
      .head().getSeq[scala.collection.Seq[Float]](0)
    assert(batch.length == 2 && batch.head.length == 16)
    assert(batch.head.toSeq == spark.sql("SELECT quackml_embed('hello')")
      .head().getSeq[Float](0).toSeq)

    // rank: RankResult rows best-first, corpus_id = input index
    val rr = spark.sql(
      "SELECT quackml_rank('q', array('doc a', 'doc b', 'doc c'))")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(rr.length == 3)
    val scores2 = rr.map(_.getAs[Double]("score"))
    assert(scores2 == scores2.sorted.reverse)
    assert(rr.map(_.getAs[Int]("corpus_id")).sorted == Seq(0, 1, 2))
    assert(rr.forall(r => Seq("doc a", "doc b", "doc c")
      .contains(r.getAs[String]("text"))))
  }

  test("finetune reports the unsupported-runtime policy error") {
    val e = intercept[UnsupportedOperationException](Ops.finetune("P", "translation"))
    assert(e.getMessage.contains("model runtime"))
  }

  test("hashing_tf runtime: cosine reflects lexical similarity") {
    val rt = ModelRuntimes.get("hashing_tf")
    val Seq(a, b, c) = rt.embed(Seq(
      "spark query engine with filters and joins",
      "query engine for spark joins and filters",
      "bananas are yellow fruit entirely unrelated"), 256).map(_.map(_.toDouble))
    def cos(x: Seq[Double], y: Seq[Double]) = x.zip(y).map(t => t._1 * t._2).sum
    assert(cos(a.toSeq, b.toSeq) > cos(a.toSeq, c.toSeq) + 0.2,
      s"similar docs must score higher: ${cos(a.toSeq, b.toSeq)} vs ${cos(a.toSeq, c.toSeq)}")
    // rank surfaces the lexically closest document first
    val ranked = Ops.rank(spark, "hashing_tf", "spark filter join",
      Seq((1L, "spark filter join query"), (2L, "completely different words"))
        .toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(ranked.minBy(_.getAs[Long]("rank")).getAs[Long]("corpus_id") == 1L)
  }

  test("finetune text-classification: frozen encoder + logistic head lifecycle") {
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ft").toString)
    val pos = Seq("great product works well", "good quality really great",
      "excellent good value works", "great good excellent service")
    val neg = Seq("terrible broke bad quality", "awful bad waste of money",
      "bad terrible does not work", "awful broken bad service")
    val df = (0 until 40).map { i =>
      val p = i % 2 == 0
      val base = if (p) pos(i % 4) else neg(i % 4)
      (s"$base item$i", if (p) 1 else 0)
    }.toDF("text", "label")
    val out = Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "Sentiment", data = Some(df)))
    val row = out.head()
    assert(row.getString(1) == "text-classification" && row.getBoolean(3))
    val m = cat.models.collect().head
    assert(m.algorithm == "finetune:hashing_tf")
    assert(m.metrics("f1") > 0.7, s"separable vocab should classify: ${m.metrics}")
    // raw-text scoring path reloads the head and re-embeds with the
    // recorded runtime/dim
    graft.ml.Predict.clearCaches()
    val scored = Finetune.classifyText(spark, cat, "Sentiment",
      Seq("really great good product", "awful terrible bad").toDF("text"))
      .select("prediction").collect().map(_.getDouble(0))
    assert(scored(0) == 1.0 && scored(1) == 0.0, scored.mkString(","))
    // a genuinely unknown task keeps the policy error (translation and
    // text-generation now train via the Generative classical paths)
    intercept[IllegalArgumentException](Finetune.finetune(spark, cat,
      Finetune.FinetuneConfig(projectName = "Tr", task = "structured-prediction",
        data = Some(df))))
  }

  test("finetune summarization: extractive head trains, deploys, summarizes") {
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_fts").toString)
    // docs where the MIDDLE window carries the gold summary's vocabulary
    // — lead/tail heuristics fail, so a better-than-chance ROUGE means
    // the head actually LEARNED to score windows
    val fillers = Seq("alpha beta gamma delta", "epsilon zeta eta theta",
      "iota kappa lambda mu", "nu xi omicron pi")
    val facts = Seq("spark joins shuffle on keys", "filters push into the scan",
      "broadcast the small dimension", "salting spreads skewed keys")
    val df = (0 until 40).map { i =>
      val fill = fillers(i % 4); val fact = facts(i % 4)
      val doc = (Seq.fill(5)(fill).mkString(" ") + " " + fact + " " +
        Seq.fill(5)(fillers((i + 1) % 4)).mkString(" "))
      (doc + s" tag$i", fact)
    }.toDF("text", "summary")
    val out = Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "Summar", task = "summarization", data = Some(df),
      labelCol = "summary",
      hyperparams = Map("sentence_tokens" -> "5", "top_k" -> "1")))
    val row = out.head()
    assert(row.getString(1) == "summarization" && row.getBoolean(3))
    val m = cat.models.collect().head
    assert(m.algorithm == "finetune:hashing_tf")
    assert(m.hyperparams("task") == "summarization")
    assert(m.metrics("rouge_ngram_f1") > 0.5,
      s"the fact window is learnable: ${m.metrics}")
    assert(cat.deployedModelId("Summar").contains(m.id))
    // raw-text scoring: the deployed head summarizes unseen docs of the
    // same construction and finds the fact window, not lead/tail
    graft.ml.Predict.clearCaches()
    // 10 filler tokens put the fact at a window boundary (windows of 5)
    val scored = Finetune.summarizeText(spark, cat, "Summar",
      Seq("alpha beta gamma delta alpha beta gamma delta alpha beta " +
        "broadcast the small dimension " +
        "nu xi omicron pi nu xi omicron pi").toDF("text"))
      .select("summary").head().getString(0)
    assert(scored.contains("broadcast"), s"picked window: '$scored'")
  }

  test("finetune question-answering: extractive window head lifecycle") {
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ftq").toString)
    // answers are Spark-vocabulary facts embedded mid-context between
    // Greek-letter fillers, window-aligned (5-token windows)
    val facts = Seq("spark joins shuffle on keys", "filters push into the scan",
      "broadcast the small dimension fast", "salting spreads skewed join keys")
    val fillers = Seq("alpha beta gamma delta epsilon", "zeta eta theta iota kappa",
      "lambda mu nu xi omicron", "pi rho sigma tau upsilon")
    val df = (0 until 40).map { i =>
      val fact = facts(i % 4)
      val ctx = fillers(i % 4) + " " + fillers((i + 1) % 4) + " " + fact +
        " " + fillers((i + 2) % 4)
      (ctx + s" tag$i", "what does " + fact.split(" ").head + " do", fact)
    }.toDF("context", "question", "answer")
    val out = Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "Squad", task = "question-answering", data = Some(df),
      textCol = "context", text2Col = "question", labelCol = "answer",
      hyperparams = Map("sentence_tokens" -> "5")))
    val row = out.head()
    assert(row.getString(1) == "question-answering" && row.getBoolean(3))
    val m = cat.models.collect().head
    assert(m.hyperparams("task") == "question-answering")
    assert(m.metrics("f1") > 0.7, s"aligned fact windows are learnable: ${m.metrics}")
    assert(m.metrics.contains("exact_match"))
    assert(cat.deployedModelId("Squad").contains(m.id))
    // raw QA scoring on an unseen (context, question)
    graft.ml.Predict.clearCaches()
    val ans = Finetune.answerText(spark, cat, "Squad",
      Seq(("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "broadcast the small dimension fast lambda mu nu xi omicron",
        "what does broadcast do")).toDF("context", "question"))
      .select("answer").head().getString(0)
    assert(ans.contains("broadcast"), s"picked window: '$ans'")
  }

  test("finetune conversation: dual-encoder retrieval head lifecycle") {
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ftc").toString)
    // each context shares its topic word with its TRUE response only —
    // a learnable product-feature signal; shifted negatives are mostly
    // cross-topic, so better-than-chance accuracy + correct retrieval
    // mean the head learned the pairing, not a lexical prior
    val topics = Seq(
      ("spark joins", "joins shuffle rows on their keys"),
      ("scan filters", "filters push down into the scan"),
      ("broadcast dims", "broadcast the small dimension table"),
      ("skewed keys", "salting spreads skewed keys evenly"))
    val df = (0 until 40).map { i =>
      val (topic, resp) = topics(i % 4)
      (s"assistant for $topic", s"explain $topic please tag$i", resp)
    }.toDF("system", "user", "assistant")
    val out = Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "Conv", task = "conversation", data = Some(df),
      textCol = "system", text2Col = "user", labelCol = "assistant"))
    val row = out.head()
    assert(row.getString(1) == "conversation" && row.getBoolean(3))
    val m = cat.models.collect().head
    assert(m.algorithm == "finetune:hashing_tf")
    assert(m.hyperparams("task") == "conversation")
    assert(m.metrics("accuracy") > 0.7,
      s"pos/neg product features are separable: ${m.metrics}")
    assert(cat.deployedModelId("Conv").contains(m.id))
    // retrieval on an unseen context of the same construction: the
    // topic-matched response must win over the other three candidates
    graft.ml.Predict.clearCaches()
    val resp = Finetune.respondText(spark, cat, "Conv",
      Seq(("assistant for spark joins", "explain spark joins please tagX"))
        .toDF("system", "user"),
      "system", "user",
      candidates = df.select(df("assistant").as("response")))
    val got = resp.select("response").head().getString(0)
    assert(got.contains("shuffle"), s"retrieved: '$got'")
    // cross-task scoring is guarded: the conversation head scores c⊙r
    // product features, so classifyText must refuse it, not pack-and-run
    val e = intercept[IllegalArgumentException] {
      Finetune.classifyText(spark, cat, "Conv",
        Seq(("a", "b")).toDF("text", "user"))
    }
    assert(e.getMessage.contains("respondText"), e.getMessage)
  }

  test("respondTextAnn: IVF-routed retrieval vs the broadcast path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // isolated index root: the default root is DURABLE across sessions
    // (that's its contract, pinned by the cross-session test below), so
    // this test's exact build-count assertions need a root no previous
    // run has written to
    spark.conf.set("graft.index.root",
      java.nio.file.Files.createTempDirectory("graft_ftann_idx").toString)
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ftann").toString)
    // the ft_conversation_train construction on the sf0.001 corpus:
    // same-doc template vocabulary makes the true response retrievable
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", concat_ws(" ", slice(t, 1, 3)).as("system"),
        concat_ws(" ", slice(t, 4, 5)).as("user"),
        concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "ConvAnn", task = "conversation", data = Some(d),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    graft.ml.Predict.clearCaches()
    val ctx = d.select($"system", $"user")
    val pool = d.select($"assistant".as("response"))
    val exact = Finetune.respondText(spark, cat, "ConvAnn", ctx,
      "system", "user", candidates = pool)
      .withColumnRenamed("response", "exact_response").cache()
    val total = exact.count()
    assert(total > 0)
    // probing EVERY cell must reproduce the broadcast path exactly:
    // identical dot-product arithmetic (the augmented dim contributes
    // q'[d]=0), identical max(struct) tie rule — the quantizer only
    // prunes, and with nprobe = numCells nothing is pruned
    val k = graft.operators.KMeansQuantizer
      .chooseK(pool.distinct().count(), targetCellRows = 16L)
    val builds0 = Finetune.convIndexBuilds.get()
    val annAll = Finetune.respondTextAnn(spark, cat, "ConvAnn", ctx,
      "system", "user", candidates = pool,
      targetCellRows = 16L, nprobe = k)
    val disagreeAll = exact.join(annAll, Seq("system", "user"))
      .filter($"response" =!= $"exact_response").count()
    assert(disagreeAll == 0,
      s"probe-all ANN must equal the broadcast path; $disagreeAll/$total differ")
    // a real probe is approximate, and THIS corpus is the adversarial
    // case for any IVF: random word-soup hashing embeddings are
    // near-orthogonal, so cluster structure is weak and recall ≈ a
    // modest lift over the scanned fraction (measured: ~74% agreement
    // probing 8 of ~30 cells = 27% of the pool, a ~2.8× lift; real
    // response pools with topical structure localize far better). Pin
    // the measured floor with margin for k-means partitioning variance.
    val ann8 = Finetune.respondTextAnn(spark, cat, "ConvAnn", ctx,
      "system", "user", candidates = pool,
      targetCellRows = 16L, nprobe = 8)
    val agree8 = exact.join(ann8, Seq("system", "user"))
      .filter($"response" === $"exact_response").count()
    assert(agree8 >= (total * 0.6).toLong, s"nprobe=8 agreement $agree8/$total")
    // the persistent index is content-addressed by the POOL (not the
    // head): the second serve above must have reused the first build,
    // and a retrain + redeploy must not invalidate it either — w only
    // reweights the query side
    val buildsAfterTwoServes = Finetune.convIndexBuilds.get()
    assert(buildsAfterTwoServes == builds0 + 1,
      "two serves over the same pool must share ONE index build")
    Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "ConvAnn", task = "conversation", data = Some(d),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "5")))
    graft.ml.Predict.clearCaches()
    val annAfterRetrain = Finetune.respondTextAnn(spark, cat, "ConvAnn", ctx,
      "system", "user", candidates = pool, targetCellRows = 16L, nprobe = 8)
    assert(annAfterRetrain.count() == total)
    assert(Finetune.convIndexBuilds.get() == buildsAfterTwoServes,
      "retrain/redeploy must not rebuild the content-addressed pool index")
    // handle-first serving (the pool-independent per-batch path): same
    // index, same probe, byte-identical responses to the fingerprinting
    // convenience entry — and no new build
    val handle = Finetune.prepareConvIndex(spark, cat, "ConvAnn", pool,
      targetCellRows = 16L)
    val viaHandle = Finetune.respondTextAnnIndexed(spark, cat, "ConvAnn",
      ctx, "system", "user", handle, nprobe = 8)
    assert(annAfterRetrain.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      .sameElements(viaHandle.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted),
      "handle-based serve must equal the fingerprinting path under the same head")
    assert(Finetune.convIndexBuilds.get() == buildsAfterTwoServes,
      "prepareConvIndex over the same pool must reuse, not rebuild")
    exact.unpersist()
    spark.conf.unset("graft.index.root")
    ()
  }

  test("respondTextAnn slice guard: sliced serve is byte-identical to the one-broadcast serve") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the 8 GB HashedRelation wall (r20, measured at 100×): a
    // corpus-wide eval batch with √numCells probes exceeds Spark's
    // broadcast cap, so serveConvResolved hash-slices oversized query
    // batches through the SAME broadcast plan. Slicing must be pure
    // mechanics: every query answered once, responses byte-identical.
    spark.conf.set("graft.index.root",
      java.nio.file.Files.createTempDirectory("graft_slice_idx").toString)
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_slice").toString)
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", concat_ws(" ", slice(t, 1, 3)).as("system"),
        concat_ws(" ", slice(t, 4, 5)).as("user"),
        concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "ConvSlice", task = "conversation", data = Some(d),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    graft.ml.Predict.clearCaches()
    val ctx = d.select($"system", $"user")
    val pool = d.select($"assistant".as("response"))
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    val one = shape(Finetune.respondTextAnn(spark, cat, "ConvSlice", ctx,
      "system", "user", candidates = pool, targetCellRows = 16L, nprobe = 4))
    // 2 KB budget forces the 64-slice cap on any real batch
    spark.conf.set("spark.graft.convServeSliceBytes", "2048")
    try {
      val sliced = shape(Finetune.respondTextAnn(spark, cat, "ConvSlice",
        ctx, "system", "user", candidates = pool, targetCellRows = 16L,
        nprobe = 4))
      assert(sliced.length == one.length,
        s"sliced serve answered ${sliced.length} of ${one.length} queries")
      assert(sliced.sameElements(one),
        "sliced serve must be byte-identical to the one-broadcast serve")
    } finally {
      spark.conf.unset("spark.graft.convServeSliceBytes")
      spark.conf.unset("graft.index.root")
    }
    ()
  }

  test("persistent index root: a SECOND SparkSession reuses the first session's build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // explicit root through the `graft.index.root` conf seam — on a
    // real cluster this is a DFS path; the default (under the shared
    // warehouse dir) resolves identically across sessions, this just
    // keeps the test's store isolated from other suites
    val root = java.nio.file.Files.createTempDirectory("graft_xsession_idx").toString
    spark.conf.set("graft.index.root", root)
    val catDir = java.nio.file.Files.createTempDirectory("graft_xsession_cat").toString
    val cat = new graft.ml.Catalog(spark, catDir)
    val t = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", concat_ws(" ", slice(t, 1, 3)).as("system"),
        concat_ws(" ", slice(t, 4, 5)).as("user"),
        concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "ConvX", task = "conversation", data = Some(d),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "5")))
    graft.ml.Predict.clearCaches()
    val ctx = d.select($"system", $"user").limit(20)
    val pool = d.select($"assistant".as("response"))
    val first = Finetune.respondTextAnn(spark, cat, "ConvX", ctx,
      "system", "user", candidates = pool, targetCellRows = 16L, nprobe = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(first.nonEmpty)
    val buildsAfterFirst = Finetune.convIndexBuilds.get()
    // a brand-new session: isolated SQL conf/function registry, same
    // JVM — the index must be FOUND on disk, not in any session state
    val spark2 = spark.newSession()
    graft.functions.GraftFunctions.register(spark2)
    spark2.conf.set("graft.index.root", root)
    val cat2 = new graft.ml.Catalog(spark2, catDir)
    val d2 = graft.Tables.documents(spark2, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        concat_ws(" ", slice(t, 1, 3)).as("system"),
        concat_ws(" ", slice(t, 4, 5)).as("user"),
        concat_ws(" ", slice(t, 9, 10)).as("assistant"))
    val second = Finetune.respondTextAnn(spark2, cat2, "ConvX",
      d2.select(col("system"), col("user")).limit(20), "system", "user",
      candidates = d2.select(col("assistant").as("response")),
      targetCellRows = 16L, nprobe = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(Finetune.convIndexBuilds.get() == buildsAfterFirst,
      "the second session must serve off the first session's index — zero new builds")
    // same pool, same head, same probe → same responses
    assert(second == first, "cross-session serve must return identical responses")
    spark.conf.unset("graft.index.root") // don't leak the root to other suites
  }

  test("unknown runtime names a clear registration error") {
    val e = intercept[IllegalArgumentException](ModelRuntimes.get("onnx-prod"))
    assert(e.getMessage.contains("No model runtime"))
  }

  test("finetune text-pair-classification: pair packing + head lifecycle") {
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ftp").toString)
    // paraphrase-style pairs: label 1 = shared vocabulary, 0 = disjoint
    val para = Seq(
      ("the spark engine joins tables", "spark engine joining the tables"),
      ("filters push to the scan", "the scan receives pushed filters"),
      ("broadcast the small side", "small side gets broadcast"),
      ("shuffle on the group key", "group key drives the shuffle"))
    val non = Seq(
      ("the spark engine joins tables", "bananas are yellow fruit"),
      ("filters push to the scan", "the weather is rainy today"),
      ("broadcast the small side", "music theory is fascinating"),
      ("shuffle on the group key", "cooking pasta takes minutes"))
    val df = (0 until 40).map { i =>
      val p = i % 2 == 0
      val (a, b) = if (p) para(i % 4) else non(i % 4)
      (s"$a t$i", s"$b t$i", if (p) 1 else 0)
    }.toDF("text1", "text2", "label")
    val out = Finetune.finetune(spark, cat, Finetune.FinetuneConfig(
      projectName = "Paraphrase", task = "text-pair-classification",
      data = Some(df), textCol = "text1", text2Col = "text2"))
    val row = out.head()
    assert(row.getString(1) == "text-pair-classification" && row.getBoolean(3))
    val m = cat.models.collect().head
    assert(m.algorithm == "finetune:hashing_tf")
    assert(m.hyperparams("text2_col") == "text2")
    assert(m.metrics("f1") > 0.7, s"separable pairs should classify: ${m.metrics}")
    // deployment decision recorded like any train()
    assert(cat.deployedModelId("Paraphrase").contains(m.id))
    // raw-pair scoring re-packs (text1, text2) with the recorded separator
    graft.ml.Predict.clearCaches()
    val scored = Finetune.classifyText(spark, cat, "Paraphrase",
      Seq(("joins tables in the spark engine", "the spark engine joins tables"),
        ("filters push to the scan", "bananas are yellow fruit"))
        .toDF("text1", "text2"), textCol = "text1")
      .select("prediction").collect().map(_.getDouble(0))
    assert(scored(0) == 1.0 && scored(1) == 0.0, scored.mkString(","))
  }
}
