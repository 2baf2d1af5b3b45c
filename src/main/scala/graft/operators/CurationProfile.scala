package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock breakdown of [[Curation.ds_curation_full]]
  * — a diagnostic main for the per-gate budget work (VERDICT r17 item
  * 1), NOT a gate. Replays the gate's exact stage sequence with a timer
  * around each materialization so the 12 s budget conversation can name
  * the stage that costs, instead of guessing at the composition. */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("curation-profile").getOrCreate()
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    try {
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        val t = System.nanoTime()
        println(f"STAGE $name%-18s ${(t - t0) / 1e9}%.3f s")
        t0 = t
      }
      val enr = Curation.enriched(s, dir).localCheckpoint()
      lap("enrich")
      val c4 = TextAnalysis.c4Rules(enr)
        .select($"doc_id", $"kept_text", $"keep".as("c4_keep"))
      val base = enr.select($"doc_id", $"source").join(c4, "doc_id")
        .localCheckpoint()
      lap("c4")
      val pool1 = base.filter($"c4_keep")
        .select($"doc_id", $"source", $"kept_text")
      val go = TextAnalysis.gopherRules(
          pool1.select($"doc_id", $"kept_text".as("text")))
        .select($"doc_id", $"keep".as("go_keep"))
      val pool1g = pool1.join(go, "doc_id").localCheckpoint()
      lap("gopher")
      val pool2 = pool1g.filter($"go_keep")
      val scored = pool2.select($"doc_id", $"source", $"kept_text",
        TextAnalysis.qualityScore($"kept_text").as("q"))
      val p25 = graft.ml.Stats.exactPercentiles(scored, "q", Seq(0.25)).head
      val pool3 = scored.filter($"q" >= p25).localCheckpoint()
      lap("quality")
      val mhPairs = Dedup.minhashPairs(s,
        pool3.select($"doc_id", $"kept_text".as("text"))).select($"da", $"db")
      val mhDrop = Components.connectedComponents(mhPairs, "da", "db")
        .filter($"id" =!= $"comp").select($"id".as("doc_id")).localCheckpoint()
      lap("minhash+cc")
      val pool4 = pool3.join(mhDrop, Seq("doc_id"), "left_anti")
      val ids4 = pool4.select($"doc_id")
      val semPairs = Similarity.semanticPairsLcg(s, dir, 0.30)
        .join(ids4.select($"doc_id".as("da")), "da")
        .join(ids4.select($"doc_id".as("db")), "db")
      val semDrop = Components.connectedComponents(semPairs, "da", "db")
        .filter($"id" =!= $"comp").select($"id".as("doc_id")).localCheckpoint()
      lap("semantic+cc")
      val pool5 = pool4.join(semDrop, Seq("doc_id"), "left_anti")
      val ksh = Dedup.shinglesOf(s,
        pool5.select($"doc_id", $"kept_text".as("text")))
      val bsh = Dedup.shinglesOf(s,
          Tables.documents(s, dir).filter($"doc_id" < 20))
        .select($"doc_id".as("bench_id"), $"hs")
      val contamDrop = ksh.join(broadcast(bsh), "hs")
        .groupBy($"doc_id", $"bench_id").agg(count(lit(1)).as("n_common"))
        .filter($"n_common" >= PipelineOps.CONTAM_MIN_SHINGLES)
        .select($"doc_id").distinct().localCheckpoint()
      lap("decontam")
      val pool6 = pool5.join(contamDrop, Seq("doc_id"), "left_anti")
      val mixKept = PipelineOps.mixSample(s, pool6).select($"doc_id")
      val mixDrop = pool6.join(mixKept, Seq("doc_id"), "left_anti")
        .select($"doc_id")
      val pool7 = pool6.join(mixKept, "doc_id")
      val withTokens = pool7.select($"doc_id",
        size(filter(split(trim(lower($"kept_text")), "\\s+"),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      val packed = Distributed.groupedPrefixSum(withTokens, Seq.empty,
          Seq($"doc_id"), "n_tokens", "cum_tokens")
        .withColumn("pack_id", expr("(cum_tokens - n_tokens) div " +
          PipelineOps.PACK_BUDGET))
        .select($"doc_id", $"pack_id")
      val nullPack = lit(null).cast("long").as("pack_id")
      val led = base.filter(!$"c4_keep")
        .select($"doc_id", lit("c4").as("stage_dropped"), nullPack)
        .unionByName(pool1g.filter(!$"go_keep")
          .select($"doc_id", lit("gopher").as("stage_dropped"), nullPack))
        .unionByName(scored.filter($"q" < p25)
          .select($"doc_id", lit("quality").as("stage_dropped"), nullPack))
        .unionByName(mhDrop
          .select($"doc_id", lit("minhash_dup").as("stage_dropped"), nullPack))
        .unionByName(semDrop
          .select($"doc_id", lit("semantic_dup").as("stage_dropped"), nullPack))
        .unionByName(contamDrop
          .select($"doc_id", lit("contaminated").as("stage_dropped"), nullPack))
        .unionByName(mixDrop
          .select($"doc_id", lit("mix_out").as("stage_dropped"), nullPack))
        .unionByName(packed
          .select($"doc_id", lit("kept").as("stage_dropped"), $"pack_id"))
        .localCheckpoint()
      lap("mix+pack+ledger")
      val counts = led.groupBy($"stage_dropped").count().collect()
      lap("counts")
      val n = led.count()
      lap("final-count")
      println(s"ROWS $n COUNTS ${counts.mkString(",")}")
    } finally s.stop()
  }
}
