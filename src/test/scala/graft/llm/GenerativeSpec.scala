package graft.llm

import graft.ml.{Catalog, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Generative finetune tasks (Generative scaladoc): trigram-LM
  * text-generation and IBM Model 1 translation — exact behavior on
  * corpora where the optimum is known in closed form. */
class GenerativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cat(tag: String) = new Catalog(spark,
    java.nio.file.Files.createTempDirectory(s"graft_gen_$tag").toString)

  test("text-generation: cyclic corpus is memorized, greedy continuation exact") {
    // "a b c d" cycled: every trigram context has ONE continuation, so
    // greedy decoding must reproduce the cycle exactly
    val doc = Seq.fill(30)("a b c d").mkString(" ")
    val docs = (1 to 40).map(_ => doc).toDF("text")
    val c = cat("cycle")
    val out = Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "GenCycle", task = "text-generation",
      data = Some(docs), textCol = "text"))
    assert(out.head().getBoolean(3), "first model must deploy")
    val m = c.models.collect().head
    assert(m.hyperparams("compat") == "ngram_lm")
    // memorized corpus: held-out perplexity is 1 (every trigram is
    // deterministic within the cycle)
    assert(m.metrics("perplexity") < 1.01,
      s"cyclic corpus perplexity = ${m.metrics("perplexity")}")
    val gen = Generative.generateText(spark, c, "GenCycle",
      Seq(("a b"), ("c d")).toDF("prompt"), maxNewTokens = 6)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gen("a b") == "c d a b c d")
    assert(gen("c d") == "a b c d a b")
    // scalar SQL twin serves the same deployed model
    Generative.clearCaches()
    Generative.registerFunctions(spark, c)
    assert(spark.sql("SELECT quackml_generate_lm('GenCycle', 'a b', 4)")
      .head().getString(0) == "c d a b")
  }

  test("text-generation: bigram/unigram backoff on unseen contexts") {
    val docs = (1 to 20).map(_ => "x y z x y z x y z").toDF("text")
    val c = cat("backoff")
    Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "GenBack", task = "text-generation",
      data = Some(docs), textCol = "text"))
    val gen = Generative.generateText(spark, c, "GenBack",
      Seq(("q q"), ("z")).toDF("prompt"), maxNewTokens = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // unseen context "q q": unigram fallback (top word = x/y/z by count
    // then order; counts tie at 60/60/60 → greater word "z" wins), then
    // the trigram machine takes over from the generated tail
    assert(gen("q q").split(" ").length == 3)
    // prompt "z": bigram z→x, then trigram (z x)→y
    assert(gen("z") == "x y z")
  }

  test("generation knobs: beam search finds the garden-path continuation greedy misses") {
    // classic garden path: after "s s", "a" is the likelier FIRST step
    // (6 vs 4) but every "a" future is diffuse (6 continuations at 1/6
    // each) while "b" commits to "z" with probability 1. Greedy takes
    // a (then the w-tie resolves to the greater word); beam width 2
    // must back out and return "b z" (avg log-prob ln(.4)/2 = -0.46
    // beats (ln .6 + ln 1/6)/2 = -1.15).
    val docs = ((1 to 6).map(i => s"s s a w$i") ++
      (1 to 4).map(_ => "s s b z")).toDF("text")
    val c = cat("garden")
    Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "GenBeam", task = "text-generation",
      data = Some(docs), textCol = "text", testSize = 0.0))
    val greedy = Generative.generateText(spark, c, "GenBeam",
      Seq("s s").toDF("prompt"), maxNewTokens = 2)
      .head().getString(1)
    assert(greedy == "a w6", s"greedy: '$greedy'")
    val beams = Generative.generateTextCfg(spark, c, "GenBeam",
      Seq("s s").toDF("prompt"),
      config = Map("num_beams" -> "2", "num_return_sequences" -> "2",
        "max_new_tokens" -> "2"))
      .head().getSeq[String](1)
    assert(beams == Seq("b z", "a w6"),
      s"beam-2 must rank the committed path first: $beams")
    // greedy via the cfg path = beam width 1 over the same score surface
    val cfgGreedy = Generative.generateTextCfg(spark, c, "GenBeam",
      Seq("s s").toDF("prompt"), config = Map("max_new_tokens" -> "2"))
      .head().getSeq[String](1)
    assert(cfgGreedy == Seq("a w6"))
    // HF contract: greedy with num_return_sequences > 1 is an error
    intercept[IllegalArgumentException] {
      Generative.generateTextCfg(spark, c, "GenBeam",
        Seq("s s").toDF("prompt"),
        config = Map("num_return_sequences" -> "3")).collect()
    }
  }

  test("generation knobs: seeded sampling is reproducible; nucleus truncation pins the head") {
    val doc = Seq.fill(30)("a b c d").mkString(" ")
    val docs = (1 to 40).map(_ => doc).toDF("text")
    val c = cat("sample")
    Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "GenSamp", task = "text-generation",
      data = Some(docs), textCol = "text"))
    def sample(cfg: Map[String, String]): Seq[String] =
      Generative.generateTextCfg(spark, c, "GenSamp",
        Seq("a b").toDF("prompt"), config = cfg).head().getSeq[String](1)
    // same seed → bit-identical output, independent of partitioning
    val s1 = sample(Map("do_sample" -> "true", "temperature" -> "0.9",
      "num_return_sequences" -> "3", "seed" -> "7", "max_new_tokens" -> "4"))
    val s2 = sample(Map("do_sample" -> "true", "temperature" -> "0.9",
      "num_return_sequences" -> "3", "seed" -> "7", "max_new_tokens" -> "4"))
    assert(s1 == s2, s"seeded sampling must reproduce: $s1 vs $s2")
    assert(s1.length == 3)
    // a tight nucleus keeps only the dominant continuation at every
    // step of the memorized cycle → sampling degenerates to the greedy
    // cycle, for ANY seed
    val tight = sample(Map("do_sample" -> "true", "top_p" -> "0.1",
      "seed" -> "999", "max_new_tokens" -> "6"))
    assert(tight == Seq("c d a b c d"), s"tight nucleus: $tight")
    // max_length is the reference's TOTAL cap: prompt (2) + 4 new
    val ml = Generative.generateTextCfg(spark, c, "GenSamp",
      Seq("a b").toDF("prompt"),
      config = Map("num_beams" -> "2", "max_length" -> "6"))
      .head().getSeq[String](1)
    assert(ml == Seq("c d a b"), s"max_length budget: $ml")
    // scalar SQL twin with the reference's args-JSON shape
    Generative.clearCaches()
    Generative.registerFunctions(spark, c)
    val viaSql = spark.sql(
      """SELECT quackml_generate_lm_cfg('GenSamp', 'a b',
        |  '{"num_beams": 2, "num_return_sequences": 2, "max_new_tokens": 4}')
        |""".stripMargin).head().getSeq[String](0)
    assert(viaSql.head == "c d a b", s"sql twin: $viaSql")
    assert(viaSql.length == 2)
  }

  test("finetune rejects a genuinely unknown task") {
    val c = cat("bad")
    intercept[IllegalArgumentException] {
      Finetune.finetune(spark, c, Finetune.FinetuneConfig(
        projectName = "Nope", task = "time-travel",
        data = Some(Seq("x").toDF("text"))))
    }
  }

  test("translation: IBM Model 1 learns a bijective word cipher") {
    // target = per-word cipher of source; Model 1's EM must converge to
    // the cipher dictionary from co-occurrence alone (Brown et al. 1993)
    val cipher = Map("the" -> "le", "cat" -> "chat", "dog" -> "chien",
      "eats" -> "mange", "fish" -> "poisson", "red" -> "rouge")
    val sents = Seq(
      "the cat eats fish", "the dog eats fish", "the red cat",
      "the red dog", "cat eats the fish", "the dog", "red fish",
      "the cat", "dog eats fish", "the red fish")
    val pairs = (1 to 8).flatMap(_ => sents)
      .map(s => (s, s.split(" ").map(cipher).mkString(" ")))
      .toDF("text1", "text2")
    val c = cat("cipher")
    val out = Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "Xlat", task = "translation",
      data = Some(pairs), textCol = "text1", labelCol = "text2",
      hyperparams = Map("em_iters" -> "6")))
    assert(out.head().getBoolean(3))
    val m = c.models.collect().head
    assert(m.hyperparams("compat") == "ibm_model1")
    // a learned bijective cipher decodes held-out text exactly → BLEU 100
    assert(m.metrics("bleu") > 95.0, s"bleu = ${m.metrics("bleu")}")
    assert(m.metrics("rouge_ngram_f1") > 0.95)
    val tr = Generative.translateText(spark, c, "Xlat",
      Seq(("the red dog eats fish"), ("unknownword cat")).toDF("text"), "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tr("the red dog eats fish") == "le rouge chien mange poisson")
    // OOV copies through, known words translate
    assert(tr("unknownword cat") == "unknownword chat")
    // scalar SQL twin serves the same deployed lexicon
    Generative.clearCaches()
    Generative.registerFunctions(spark, c)
    assert(spark.sql("SELECT quackml_translate('Xlat', 'the red cat')")
      .head().getString(0) == "le rouge chat")
  }

  test("translation: deploy tracks the better BLEU") {
    val pairs = (1 to 30).map(i => (s"w$i a b", s"v$i p q")).toDF("text1", "text2")
    val c = cat("redeploy")
    val first = Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "X2", task = "translation",
      data = Some(pairs), textCol = "text1", labelCol = "text2",
      hyperparams = Map("em_iters" -> "1")))
    assert(first.head().getBoolean(3))
    val second = Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "X2", task = "translation",
      data = Some(pairs), textCol = "text1", labelCol = "text2",
      hyperparams = Map("em_iters" -> "6")))
    val ms = c.models.collect().sortBy(_.id)
    // more EM iterations can only help on this separable corpus; the
    // second model deploys iff it strictly improved BLEU
    val deployedId = c.deployedModelId("X2").get
    if (second.head().getBoolean(3)) assert(deployedId == ms.last.id)
    else assert(deployedId == ms.head.id)
  }

  test("dist-table guard is independent of (and lower than) the argmax guard") {
    // the distribution tables broadcast up to TOP_CAND(16) candidates
    // per context where the argmax tables broadcast one, so they carry
    // their OWN ceiling: at a context count the greedy path still
    // loads, the knob-decode path must refuse with the pruning message
    val doc = Seq.fill(30)("a b c d").mkString(" ")
    val docs = (1 to 40).map(_ => doc).toDF("text")
    val c = cat("distguard")
    Finetune.finetune(spark, c, Finetune.FinetuneConfig(
      projectName = "GenGuard", task = "text-generation",
      data = Some(docs), textCol = "text"))
    // the cyclic corpus has 8 distinct tri+bi contexts: a ceiling of 4
    // sits between "argmax loads" and "dist refuses"
    val prompts = Seq("a b").toDF("prompt")
    assert(Generative.generateText(spark, c, "GenGuard", prompts,
      maxNewTokens = 2, maxContexts = 4000000L).count() == 1L)
    val ex = intercept[IllegalArgumentException] {
      Generative.generateTextCfg(spark, c, "GenGuard", prompts,
        config = Map("num_beams" -> "2"), maxDistContexts = 4L).count()
    }
    assert(ex.getMessage.contains("distribution-table guard"), ex.getMessage)
    assert(ex.getMessage.contains("prune low-count contexts"), ex.getMessage)
    // default ceilings encode the same relationship: dist < argmax
    assert(Generative.DefaultMaxDistContexts < 2000000L)
    // the same project decodes fine once the dist guard admits it —
    // and a FAILED load must not have poisoned the cache
    assert(Generative.generateTextCfg(spark, c, "GenGuard", prompts,
      config = Map("num_beams" -> "2")).count() == 1L)
  }

  test("ibm1Round1CountsQ: exact hand-computed round-1 table") {
    // s1: es=[NULL,a,b] ne=3 w=840, fs=[x,y]; s2: es=[NULL,a] ne=2
    // w=1260, fs=[z] — every cnt/ce/tq below is hand arithmetic
    val pairs = Seq(("a b", "x y"), ("a", "z")).toDF("src", "tgt")
    val rows = Generative.ibm1Round1CountsQ(pairs, "src", "tgt")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val N = "\u0001NULL\u0001"
    assert(rows((N, "x")) == ((840L, 2940L, 285714L)))
    assert(rows(("a", "x")) == ((840L, 2940L, 285714L)))
    assert(rows(("b", "x")) == ((840L, 1680L, 500000L)))
    assert(rows(("a", "z")) == ((1260L, 2940L, 428571L)))
    assert(rows((N, "z")) == ((1260L, 2940L, 428571L)))
    assert(rows.size == 8)
  }

  test("ibm1Round1CountsQ: duplicate source slots keep double mass") {
    // "a a" → es=[NULL,a,a]: the duplicate slot is NOT deduped (Brown
    // 1993 §4 — alignment mass is per SLOT), so cnt(a,x)=2·840
    val pairs = Seq(("a a", "x")).toDF("src", "tgt")
    val rows = Generative.ibm1Round1CountsQ(pairs, "src", "tgt")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    assert(rows(("a", "x")) == ((1680L, 1000000L)))
    assert(rows(("\u0001NULL\u0001", "x")) == ((840L, 1000000L)))
  }

  test("ibm1Round1CountsQ: >9 source tokens raises (lcm-2520 guard)") {
    val long = (1 to 10).map(i => s"w$i").mkString(" ")
    val pairs = Seq((long, "x")).toDF("src", "tgt")
    val ex = intercept[Exception] {
      Generative.ibm1Round1CountsQ(pairs, "src", "tgt").collect()
    }
    assert(ex.getMessage != null)
  }

  test("lmArgmaxTablesQ: hand-computed argmax tables + production tie rule") {
    // corpus: "a b c", "a b d", "a b d" — tri ctx a␁b: c×1 vs d×2 → d;
    // bi ctx a: b×3; bi ctx b: c×1 vs d×2 → d; uni top: a/b ×3 tie →
    // max(struct(cnt, w)) takes the GREATER word, b (the rule greedy
    // decode broadcasts — a min-word tie-break here would mean the twin
    // no longer pins the production policy)
    val docs = Seq("a b c", "a b d", "a b d").toDF("text")
    val rows = Generative.lmArgmaxTablesQ(docs, "text")
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(rows((3, "ab")) == (("d", 2L)))
    assert(rows((2, "a")) == (("b", 3L)))
    assert(rows((2, "b")) == (("d", 2L)))
    assert(rows((1, "")) == (("b", 3L)))
    // exactly one row per distinct context; "c"/"d" end their docs so
    // neither ever starts a bigram
    assert(rows.keySet.filter(_._1 == 3) == Set((3, "ab")))
    assert(rows.keySet.filter(_._1 == 2) == Set((2, "a"), (2, "b")))
  }

  test("lmArgmaxTablesQ: short and empty docs contribute only what exists") {
    // "a" has no bigram/trigram; "" has nothing; "x y" has one bigram
    val docs = Seq("a", "", "x y").toDF("text")
    val rows = Generative.lmArgmaxTablesQ(docs, "text")
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(rows.keySet.filter(_._1 == 3).isEmpty)
    assert(rows.keySet.filter(_._1 == 2) == Set((2, "x")))
    assert(rows((2, "x")) == (("y", 1L)))
    // uni tie a/x/y ×1 → greatest word y
    assert(rows((1, "")) == (("y", 1L)))
  }
}
