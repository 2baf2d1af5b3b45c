package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("mix sample keeps roughly permille/1000 of each source and is deterministic") {
    val a = PipelineOps.ds_mix_sample(spark, sf).collect()
    val b = PipelineOps.ds_mix_sample(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    // every kept row satisfies the integer keep rule's rate bounds
    assert(a.forall { r =>
      val p = r.getLong(2); p >= 100 && p <= 1000 && p % 100 == 0
    })
    // a 1000-permille source keeps everything it has
    val total = graft.Tables.documents(spark, sf)
      .filter(substring($"source", 4, 10).cast("long") % 10 === 9).count()
    val kept = a.count(_.getLong(2) == 1000L)
    assert(kept == total)
  }

  test("pack ids are non-decreasing and change only at budget boundaries") {
    val rows = PipelineOps.ds_pack_sequences(spark, sf)
      .orderBy($"doc_id").collect()
    assert(rows.nonEmpty)
    var prevCum = 0L
    var prevPack = 0L
    rows.foreach { r =>
      val (n, cum, pack) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cum == prevCum + n)          // prefix sum is exact
      assert(pack == prevCum / PipelineOps.PACK_BUDGET) // exclusive-cum rule
      assert(pack >= prevPack)
      prevCum = cum; prevPack = pack
    }
  }

  test("token budget: inclusive per-source cums within budget, maximal, deterministic") {
    val out = PipelineOps.ds_token_budget(spark, sf).collect()
    assert(out.nonEmpty)
    // every kept doc's inclusive cum respects the budget
    assert(out.forall(_.getLong(3) <= PipelineOps.TOKEN_BUDGET))
    // independent reimplementation: driver-side walk of the seeded
    // shuffle order must reproduce the selection EXACTLY — the kept set
    // is the maximal prefix (in (shuf, doc_id) order, per source) whose
    // inclusive cum stays within budget; a later small doc that would
    // still "fit" knapsack-wise is correctly excluded (cum is monotone)
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(filter(split(trim(lower($"text")), "\\s+"), t => length(t) > 0))
          .cast("long").as("n"),
        Dedup.h60(spark, concat(lit("tb1:"), $"doc_id".cast("string"))).as("shuf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = docs.groupBy(_._2).values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).toSeq.flatMap { r =>
        cum += r._3
        if (cum <= PipelineOps.TOKEN_BUDGET) Some(r._1) else None
      }
    }.toSet
    assert(out.map(_.getLong(1)).toSet == expected)
    // reproducible shuffle: same selection on a second run
    val again = PipelineOps.ds_token_budget(spark, sf).collect()
    assert(again.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq)
  }

  test("contamination only reports corpus-vs-benchmark pairs above the floor") {
    val rows = PipelineOps.dd_contamination(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 20 && r.getLong(1) < 20)
      assert(r.getLong(2) >= PipelineOps.CONTAM_MIN_SHINGLES)
    }
  }
}
