package graft.operators

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade scale measurement for the composed curation pipeline
  * (VERDICT r17 item 5): the curation family is the most expensive
  * gate family and the only major one without a 10×/100× measurement —
  * composed-stage interactions (checkpoint width, pool shrinkage per
  * stage, the two CC fixpoints) are where a super-linear surprise
  * would hide even when every stage is individually linear.
  *
  * Measures the TRAINED-quantizer ledger route (the declared scale
  * path): the hash-exact twin's LCG semantic stage is a fixed 4-cell
  * grid whose within-cell pair space grows quadratically — its fan-out
  * guard REFUSES past ~10k vectors by design (measured at the 10×
  * corpus, `Similarity.withinCellPairs` guard), so the LCG route is
  * the oracle surface, not the scale surface. Stage sequence and
  * parameters are exactly [[Curation.ds_curation_e2e_trained]]'s:
  * weakened C4/Gopher rule maps → quality percentile prune →
  * MinHash-LSH CC → trained semantic CC (chooseK cells, boundary-band
  * probe, tau 0.45) → decontamination → mix → pack; per-stage
  * wall-clock vectors name where time goes per decade, including
  * which connected-components route ran (driver union-find ≤ 500k
  * edges / distributed fixpoint above — Components.SMALL_GRAPH_EDGES).
  *
  * Usage: runMain graft.operators.CurationScale <sfDir> [iters]
  * Prints one JSON line with per-stage seconds (best of iters) +
  * structure counts.
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 1
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    import s.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val runs = (1 to iters).map { _ =>
      val all = Tables.documents(s, sfDir)
      // stages 1+2: weakened rule maps (ds_curation_e2e's stage14 form)
      val c4 = TextAnalysis.c4Rules(all).select($"doc_id",
        (!$"has_lorem" && !$"has_brace" && !$"has_blockword").as("c4_keep"))
      val go = TextAnalysis.gopherRules(all).select($"doc_id",
        ($"r_word_count" && $"r_mean_word_len" && $"r_symbol_ratio" &&
          $"r_bullet_lines" && $"r_ellipsis_lines" && $"r_alpha_words")
          .as("go_keep"))
      val (base, tRules) = timed(
        all.filter($"doc_id" >= 20)
          .select($"doc_id", $"source", $"text")
          .join(c4, "doc_id").join(go, "doc_id")
          .localCheckpoint())
      val nDocs = base.count()
      val pool2 = base.filter($"c4_keep" && $"go_keep")
      // stage 3: quality percentile over survivors
      val (pool3, tQuality) = timed {
        val scored = pool2.select($"doc_id", $"source", $"text",
          TextAnalysis.qualityScore($"text").as("q"))
        val p25 = graft.ml.Stats.exactPercentiles(scored, "q", Seq(0.25)).head
        scored.filter($"q" >= p25).localCheckpoint()
      }
      // stage 4: MinHash-LSH dedup among the pool
      val ((mhDrop, mhPairCount), tMinhash) = timed {
        val ids3 = pool3.select($"doc_id")
        val mhPairs = Dedup.dd_minhash_lsh(s, sfDir).select($"da", $"db")
          .join(ids3.select($"doc_id".as("da")), "da")
          .join(ids3.select($"doc_id".as("db")), "db")
          .localCheckpoint()
        val cnt = mhPairs.count()
        val drop = Components.connectedComponents(mhPairs, "da", "db")
          .filter($"id" =!= $"comp").select($"id".as("doc_id"))
          .localCheckpoint()
        (drop, cnt)
      }
      val pool4 = pool3.join(mhDrop, Seq("doc_id"), "left_anti")
      // stage 5: trained semantic dedup (the scale route)
      val ((semDrop, semPairCount), tSemantic) = timed {
        val ids4 = pool4.select($"doc_id")
        val semPairs = Similarity.semanticPairsTrained(s, sfDir, 0.45)
          .join(ids4.select($"doc_id".as("da")), "da")
          .join(ids4.select($"doc_id".as("db")), "db")
          .localCheckpoint()
        val cnt = semPairs.count()
        val drop = Components.connectedComponents(semPairs, "da", "db")
          .filter($"id" =!= $"comp").select($"id".as("doc_id"))
          .localCheckpoint()
        (drop, cnt)
      }
      val pool5 = pool4.join(semDrop, Seq("doc_id"), "left_anti")
      // stage 6: decontamination
      val (contamDrop, tContam) = timed {
        val contam = PipelineOps.dd_contamination(s, sfDir)
          .select($"doc_id").distinct()
        pool5.join(contam, "doc_id").select($"doc_id").localCheckpoint()
      }
      val pool6 = pool5.join(contamDrop, Seq("doc_id"), "left_anti")
      // stages 7+8: mix + pack + the final ledger materialization
      val (ledgerRows, tMixPack) = timed {
        val mixKept = PipelineOps.mixSample(s, pool6).select($"doc_id")
        val pool7 = pool6.join(mixKept, "doc_id")
        val withTokens = pool7.select($"doc_id",
          size(filter(split(trim(lower($"text")), "\\s+"), t => length(t) > 0))
            .cast("long").as("n_tokens"))
        val packed = Distributed.groupedPrefixSum(withTokens, Seq.empty,
            Seq($"doc_id"), "n_tokens", "cum_tokens")
          .withColumn("pack_id",
            expr(s"(cum_tokens - n_tokens) div ${PipelineOps.PACK_BUDGET}"))
        packed.count()
      }
      val total = tRules + tQuality + tMinhash + tSemantic + tContam + tMixPack
      (nDocs, mhPairCount, semPairCount, ledgerRows,
        tRules, tQuality, tMinhash, tSemantic, tContam, tMixPack, total)
    }
    val best = runs.minBy(_._11)
    val ccRoute = (edges: Long) =>
      if (edges <= Components.SMALL_GRAPH_EDGES) "driver_union_find"
      else "distributed_fixpoint"
    println(s"""{"metric":"curation_trained_decade","sf":"$sfDir",""" +
      s""""n_docs":${best._1},"mh_pairs":${best._2},""" +
      s""""mh_cc_route":"${ccRoute(best._2)}",""" +
      s""""sem_pairs":${best._3},"sem_cc_route":"${ccRoute(best._3)}",""" +
      s""""packed_rows":${best._4},""" +
      s""""t_rules":${best._5},"t_quality":${best._6},""" +
      s""""t_minhash_cc":${best._7},"t_semantic_cc":${best._8},""" +
      s""""t_decontam":${best._9},"t_mix_pack":${best._10},""" +
      s""""seconds":${best._11}}""")
    s.stop()
  }
}
