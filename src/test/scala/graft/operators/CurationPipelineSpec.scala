package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the operators composed the way a real
  * pretraining data pipeline chains them —
  *
  *   near-dup pairs → connected components → keep canonical docs
  *   → drop benchmark-contaminated docs → domain-mix sample
  *   → pack into token-budget sequences.
  *
  * Asserts the cross-stage invariants (kept set shrinks monotonically,
  * no duplicate cluster contributes two docs, packing covers exactly
  * the survivors) rather than any single operator's math — the per-op
  * gates own that.
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("dedup → decontaminate → mix → pack composes and shrinks monotonically") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
    val total = docs.count()

    // 1. duplicate clusters → drop every non-canonical member
    val canon = Components.dd_canonical(spark, sf)
      .select($"component", $"canonical_doc")
    val labels = Components.dd_components(spark, sf)
    val dropDup = labels.join(canon,
        labels("component") === canon("component") &&
          labels("doc_id") =!= canon("canonical_doc"))
      .select(labels("doc_id"))
    val afterDedup = docs.join(dropDup, Seq("doc_id"), "left_anti")
    val nDedup = afterDedup.count()
    assert(nDedup < total) // clusters exist at sf0.01 (gate says 11)

    // 2. drop docs contaminated by the benchmark slice
    val contaminated = PipelineOps.dd_contamination(spark, sf)
      .select($"doc_id").distinct()
    val afterDecon = afterDedup.join(contaminated, Seq("doc_id"), "left_anti")
    val nDecon = afterDecon.count()
    assert(nDecon <= nDedup)

    // 3. domain-mix sample
    val sampled = PipelineOps.mixSample(spark, afterDecon)
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= nDecon)

    // 4. pack survivors into token-budget sequences
    val withTokens = afterDecon.join(sampled.select($"doc_id"), Seq("doc_id"))
      .select($"doc_id",
        size(filter(split(trim(lower($"text")), "\\s+"), t => length(t) > 0))
          .cast("long").as("n_tokens"))
    val packed = Distributed.groupedPrefixSum(
        withTokens, Seq.empty, Seq($"doc_id"), "n_tokens", "cum")
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${PipelineOps.PACK_BUDGET}"))
    val packRows = packed.count()
    assert(packRows == nSampled) // every survivor lands in exactly one pack
    val maxPack = packed.agg(max($"pack_id")).head().getLong(0)
    val totalToks = packed.agg(max($"cum")).head().getLong(0)
    assert(maxPack == (totalToks - 1).max(0) / PipelineOps.PACK_BUDGET ||
      maxPack <= totalToks / PipelineOps.PACK_BUDGET)

    // no duplicate cluster contributes two surviving docs
    val survivorsPerCluster = labels
      .join(sampled.select($"doc_id"), Seq("doc_id"))
      .groupBy($"component").count().agg(max($"count")).head().getLong(0)
    assert(survivorsPerCluster <= 1L)
  }

  test("ds_curation_full: every full-rule stage discriminates and the ledger partitions the corpus") {
    import org.apache.spark.sql.functions._
    val led = Curation.ds_curation_full(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") >= 20).count()
    // partition: every corpus doc exactly once
    assert(led.count() === total)
    assert(led.select(col("doc_id")).distinct().count() === total)
    // all 8 stages live (the gate itself throws if any is dark; the
    // spec pins the property so a corpus regeneration that silences a
    // stage fails HERE too, with the counts visible)
    val counts = led.groupBy(col("stage_dropped")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("c4", "gopher", "quality", "minhash_dup", "semantic_dup",
      "contaminated", "mix_out", "kept").foreach { st =>
      assert(counts.getOrElse(st, 0L) > 0L, s"stage $st dark: $counts")
      assert(counts(st) < total, s"stage $st dropped everything: $counts")
    }
    // kept docs carry a pack id, dropped docs never do
    assert(led.filter(col("stage_dropped") === "kept" &&
      col("pack_id").isNull).count() === 0L)
    assert(led.filter(col("stage_dropped") =!= "kept" &&
      col("pack_id").isNotNull).count() === 0L)
    led.unpersist()
  }

  test("spanDedup: corpus-duplicated blocks vanish from every carrier, unique blocks survive in order") {
    // blocks are 2 tokens; "dup dup" appears in docs 1 AND 2 (df=2 →
    // removed from BOTH); every other block is unique and must survive
    // in document order. doc 3 is one short block, untouched.
    val docs = Seq(
      (1L, "a1 a2 dup dup b1 b2"),
      (2L, "c1 c2 dup dup"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(spark, docs, n = 2, maxDf = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((3L, 1L, "a1 a2 b1 b2")))
    assert(out(2L) == ((2L, 1L, "c1 c2")))
    assert(out(3L) == ((1L, 0L, "solo")))
    // a doc that is ENTIRELY duplicated content empties to ""
    val all = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val gone = Dedup.spanDedup(spark, all, n = 2, maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(gone(1L) == "" && gone(2L) == "")
    // maxDf = 2 tolerates a pair: nothing removed
    val kept = Dedup.spanDedup(spark, all, n = 2, maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(kept(1L) == "x y" && kept(2L) == "x y")
  }

  test("exactSubstringDedup catches SHIFTED duplication that block alignment misses") {
    // the duplicated passage "p q r s" sits at offset 0 in doc 1 and
    // offset 1 in doc 2 — block-aligned spanDedup(n=4) sees different
    // blocks ("p q r s" vs "z p q r"/"s …") and removes nothing from
    // doc 2; the stride-1 variant must remove the passage from BOTH
    val docs = Seq(
      (1L, "p q r s a b c d"),
      (2L, "z p q r s e f g")).toDF("doc_id", "text")
    val blocked = Dedup.spanDedup(spark, docs, n = 4, maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(blocked(1L) == 0L && blocked(2L) == 0L,
      "block alignment must miss the shifted duplicate (that's the gap)")
    val any = Dedup.exactSubstringDedup(spark, docs, n = 4, maxDf = 1)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // exactly the 4 tokens of the shared passage vanish from each doc
    assert(any(1L) == ((8L, 4L, "a b c d")), any(1L).toString)
    assert(any(2L) == ((8L, 4L, "z e f g")), any(2L).toString)
    // self-repetition: occurrence counting marks within-doc repeats too
    val selfRep = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text")
    val sr = Dedup.exactSubstringDedup(spark, selfRep, n = 4, maxDf = 1)
      .head()
    assert(sr.getLong(2) == 8L && sr.getString(3).isEmpty,
      "a self-repeating doc empties (every 4-shingle occurs twice+)")
    // docs shorter than n pass through untouched
    val short = Dedup.exactSubstringDedup(spark,
      Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"), n = 4, maxDf = 1)
      .collect().map(r => r.getString(3))
    assert(short.forall(_ == "a b"))
  }

  test("exactSubstringDedup marking stays linear on a pathologically self-repetitive doc") {
    // VERDICT r13 item 3: the adversarial case for per-token × per-start
    // marking is starts ≈ tokens — one doc that is a single token
    // repeated 20k times (every stride-1 4-shingle is identical, so
    // EVERY position is a dup start). The interval merge collapses the
    // 20k starts into ONE interval; the old O(tokens × starts) form was
    // 4·10⁸ lambda evaluations on this row. Assert semantics (doc
    // empties) and runtime sanity (well under the old quadratic cost).
    val tokens = 20000
    val big = Seq((1L, Seq.fill(tokens)("w").mkString(" ")),
      (2L, "unique tokens only here")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Dedup.exactSubstringDedup(spark, big, n = 4, maxDf = 1)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out(1L) == ((tokens.toLong, tokens.toLong, "")), out(1L).toString)
    assert(out(2L) == ((4L, 0L, "unique tokens only here")))
    assert(sec < 30.0, f"self-repetitive doc took $sec%.1fs — marking regressed from linear")
    // mixed coverage: two disjoint dup passages + an overlapping chain
    // must merge into exactly the covered token set, preserving gaps
    val mix = Seq(
      (1L, "p q r s GAP1 t u v w x GAP2 end"),  // "t u v w x" dupes shifted
      (2L, "zz p q r s yy t u v w x qq")).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(spark, mix, n = 4, maxDf = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) == "gap1 gap2 end", got(1L))
    assert(got(2L) == "zz yy qq", got(2L))
  }

  test("spanDedup invariants on a seeded random corpus") {
    // 120 docs over a 12-word vocab, lengths 1..40 — plenty of genuine
    // block collisions. Invariants the closed-form fixture can't sweep:
    // block count arithmetic, kept+removed partition, order-preserving
    // reassembly, and maxDf=∞ identity.
    val rng = new scala.util.Random(42)
    val vocab = Vector("a","b","c","d","e","f","g","h","i","j","k","l")
    val docs = (1 to 120).map { id =>
      val len = 1 + rng.nextInt(40)
      (id.toLong, Vector.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val n = 4
    val out = Dedup.spanDedup(spark, docs, n = n, maxDf = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val original = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == original.keySet)
    original.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val (nBlocks, removed, clean) = out(id)
      assert(nBlocks == (toks.length + n - 1) / n, s"doc $id block count")
      assert(removed >= 0 && removed <= nBlocks, s"doc $id removed range")
      // reassembly = the original's blocks with `removed` of them
      // deleted, order preserved: clean tokens must be the concatenation
      // of a sub-sequence of the original block list
      val blocks = toks.grouped(n).map(_.mkString(" ")).toVector
      val cleanBlocks =
        if (clean.isEmpty) Vector.empty
        else {
          // greedily match clean against the block list in order
          var rest = clean
          blocks.flatMap { b =>
            if (rest == b) { rest = ""; Some(b) }
            else if (rest.startsWith(b + " ")) { rest = rest.drop(b.length + 1); Some(b) }
            else None
          }
        }
      assert(cleanBlocks.size == nBlocks - removed,
        s"doc $id: clean text is not the ordered concatenation of kept blocks")
    }
    // maxDf = ∞ → identity (modulo normalization)
    val id = Dedup.spanDedup(spark, docs, n = n, maxDf = Long.MaxValue).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    original.foreach { case (k, text) =>
      assert(id(k) == text.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("piiScrub: referentially consistent pseudonyms, full redaction, stateless plan") {
    val ev = Seq(
      (1L, 7L, """{"k": 87, "v": 3}"""),
      (2L, 7L, """{"k": 0}"""),
      (3L, 9L, """no digits"""),
      (4L, 9L, """mail bob.smith+x@corp.example.org or ping @bob_77 re 42"""))
      .toDF("event_id", "user_id", "props")
    val out = PipelineOps.piiScrub(spark, ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // same user → same pseudonym (joinability survives); different user → different
    assert(out(1L)._1 == out(2L)._1)
    assert(out(1L)._1 != out(3L)._1)
    // full 60-bit pseudonym space (VERDICT r13 item 4): non-negative
    assert(out(1L)._1 >= 0 && out(3L)._1 >= 0)
    // every digit run redacted, count matches
    assert(out(1L)._2 == """{"k": <NUM>, "v": <NUM>}""" && out(1L)._5 == 2L)
    assert(out(3L)._2 == "no digits" && out(3L)._5 == 0L)
    // email redacted WHOLE (digits/handle inside never leak), handle
    // redacted, trailing number redacted; counts partition the passes
    assert(out(4L)._2 == "mail <EMAIL> or ping <HANDLE> re <NUM>", out(4L)._2)
    assert(out(4L)._3 == 1L && out(4L)._4 == 1L && out(4L)._5 == 1L)
    // deterministic: re-running reproduces identical pseudonyms
    val again = PipelineOps.piiScrub(spark, ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again(1L) == out(1L)._1 && again(3L) == out(3L)._1)
    // stateless map stage: no shuffle anywhere in the plan
    val plan = PipelineOps.piiScrub(spark, ev)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"piiScrub must not shuffle:\n$plan")
  }

  test("piiScrub pseudonyms never merge distinct users at 10^6 scale") {
    // the r13 10⁶-modulus pseudonym space collided two users with ~50%
    // odds at ~1.2k ids (birthday bound) — the full 60-bit hash must
    // keep 10⁶ distinct ids distinct. One distributed agg, no collect.
    val n = 1000000L
    val ids = spark.range(n).selectExpr("id AS event_id", "id AS user_id",
      "'' AS props")
    val distinctPseudos = PipelineOps.piiScrub(spark, ids)
      .agg(org.apache.spark.sql.functions.countDistinct($"pseudo_uid"))
      .head().getLong(0)
    assert(distinctPseudos == n,
      s"$distinctPseudos distinct pseudonyms for $n distinct users — collision")
  }

  test("qualityClassifier: learns the seed, Pareto keep is deterministic, floor trips on unlearnable seed") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = PipelineOps.qualityClassifier(spark, docs,
      $"text".contains("spark")).cache()
    val n = docs.count()
    assert(out.count() == n, "floor must pass on a learnable seed")
    // the classifier separates: seed docs score far above non-seed
    val agg = out.groupBy($"is_seed")
      .agg(avg($"prob").as("p")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(agg(true) > 0.9 && agg(false) < 0.1, agg.toString)
    // deterministic: the Pareto keep set replays bit-for-bit
    val again = PipelineOps.qualityClassifier(spark, docs,
      $"text".contains("spark"))
    assert(out.select($"doc_id", $"kept").except(
      again.select($"doc_id", $"kept")).count() == 0)
    // an unlearnable seed (content-independent id hash) cannot clear
    // the 0.9 held-out accuracy floor — the gate empties, never lies
    val broken = PipelineOps.qualityClassifier(spark, docs,
      Dedup.h60(spark, concat(lit("x|"), $"doc_id".cast("string"))) % 2 === 0)
    assert(broken.count() == 0, "unlearnable seed must trip the floor")
  }

  test("importance sampling: target-vocab docs outscore off-target, mixed in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en", "src0"),
      (2L, "alpha beta alpha beta", "en", "src1"),
      (3L, "gamma delta gamma delta gamma", "de", "src0"),
      (4L, "gamma delta gamma delta", "zh", "src1"),
      (5L, "alpha beta gamma delta", "fr", "src0"), // mixed vocab
      (6L, "solo", "en", "src0")                    // <2 tokens, no bigrams
    ).toDF("doc_id", "text", "lang", "source")
    val m = PipelineOps.fitImportance(spark, docs, $"lang" === "en")
    val out = PipelineOps.importanceScore(spark, docs, m).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // en-vocab docs look target-like, off-vocab docs don't
    assert(out(1L)._3 && out(2L)._3, out.toString)
    assert(!out(3L)._3 && !out(4L)._3, out.toString)
    // the mixed doc sits strictly between the pure-vocab extremes
    assert(out(1L)._2 > out(5L)._2 && out(5L)._2 > out(3L)._2, out.toString)
    // no bigrams → neutral pass-through, never a crash or a keep
    assert(out(6L) == ((0L, 0.0, false)), out(6L).toString)
    // deterministic: refit + rescore reproduces bit-identical weights
    val again = PipelineOps.importanceScore(spark, docs,
      PipelineOps.fitImportance(spark, docs, $"lang" === "en")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (k, v) => again(k) == v._2 })
    // PINNED smoothing artifact: a bucket neither distribution ever saw
    // scores ln((Q+B)/(T+B)) — slightly POSITIVE when the raw corpus
    // outweighs the target, so fully-novel text defaults to kept.
    // Callers filtering novel-domain streams should threshold on logw,
    // not the zero flag; the spec pins the behavior so it can't drift
    // silently.
    assert(m.unseenLr > 0)
    val novel = Seq((9L, "qqq zzz qqq", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val ns = PipelineOps.importanceScore(spark, novel, m).head()
    assert(math.abs(ns.getDouble(2) - m.unseenLr) < 1e-6)
    // pure map stage: no Exchange in the scoring plan
    val plan = PipelineOps.importanceScore(spark, docs, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"importanceScore must not shuffle:\n$plan")
  }
}
