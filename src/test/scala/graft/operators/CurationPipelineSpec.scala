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
}
