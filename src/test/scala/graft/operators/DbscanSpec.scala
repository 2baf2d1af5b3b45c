package graft.operators

import graft.functions.GraftFunctions
import graft.ml.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(pts: Seq[(Long, Seq[Double])]): DataFrame = {
    GraftFunctions.register(spark)
    pts.toDF("vec_id", "v").withColumn("v", $"v".cast("array<double>"))
  }

  test("dbscan: core / border / noise semantics on a hand-built line") {
    // ids 0..4 chained at distance 1 (eps=1.5, minPts=3):
    //  - 1,2,3 have 2 neighbors each +self = core
    //  - 0,4 have 1 neighbor (a core) = border
    //  - 99 is far away = noise
    val pts = (0L to 4L).map(i => (i, Seq(i.toDouble, 0.0))) :+
      (99L, Seq(50.0, 50.0))
    val out = Dbscan.dbscan(frame(pts), eps = 1.5, minPts = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, true) && out(3L) == (1L, true))
    assert(out(0L) == (1L, false) && out(4L) == (1L, false)) // border joins cluster 1
    assert(out(99L) == (-1L, false)) // noise
  }

  test("dbscan: isolated core keeps its own id; two separate clusters") {
    // tight triangle at origin (all core), tight triangle at (100,100)
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.0)), (2L, Seq(0.0, 0.1)),
      (10L, Seq(100.0, 100.0)), (11L, Seq(100.1, 100.0)), (12L, Seq(100.0, 100.1)))
    val out = Dbscan.dbscan(frame(pts), eps = 0.5, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).map(out) == Seq(0L, 0L, 0L))
    assert(Seq(10L, 11L, 12L).map(out) == Seq(10L, 10L, 10L))
  }

  test("dbscan guard refuses past maxRows with routing") {
    val pts = (0L until 20L).map(i => (i, Seq(i.toDouble)))
    val e = intercept[IllegalArgumentException] {
      Dbscan.dbscan(frame(pts), eps = 1.0, minPts = 2, maxRows = 10)
    }
    assert(e.getMessage.contains("dbscanBucketed"))
  }

  test("bucketed dbscan equals exact on sf0.01 with a trained quantizer") {
    // the scale path's correctness contract: eps-halo replication
    // (graft_halo_cells) guarantees every eps-pair meets in >= 1 cell,
    // so the bucketed labeling must EQUAL the exact one — full labels,
    // core flags included — at the sim_dbscan gate parameters with a
    // corpus-sized trained quantizer. (The naive disjoint-cell variant
    // measured 0.146 co-membership recall here: one giant eps-connected
    // cluster chopped into k pieces. That plan is gone.)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", $"embedding".cast("array<double>").as("v")).cache()
    val exact = Dbscan.dbscan(emb, eps = 1.2, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val k = KMeansQuantizer.chooseK(emb.count(), targetCellRows = 100L)
    val q = KMeansQuantizer.fit(emb, k)
    // maxAvgHalo relaxed: the equality contract is STRONGEST with many
    // cells, and on this geometry that means full replication — the
    // cost guard is under test separately, exactness is under test here
    val bucketed = Dbscan.dbscanBucketed(emb, q, eps = 1.2, minPts = 4,
        maxAvgHalo = k.toDouble)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    emb.unpersist()
    assert(exact.values.exists(_._1 >= 0), "gate parameters produced no clusters — equality is vacuous")
    val diff = exact.keySet.filter(id => exact(id) != bucketed.get(id).orNull)
    assert(bucketed.keySet == exact.keySet && diff.isEmpty,
      s"bucketed labels diverge from exact at k=$k for ids ${diff.toSeq.sorted.take(10)}")
  }

  test("bucketed dbscan guards on a degenerate replication factor") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = KMeansQuantizer.fit(emb, k = 8)
    val e = intercept[IllegalArgumentException] {
      Dbscan.dbscanBucketed(emb, q, eps = 1.2, minPts = 4, maxAvgHalo = 1.5)
    }
    assert(e.getMessage.contains("replication"))
  }

  test("bucketed dbscan matches exact when clusters fit inside cells") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = Dbscan.dbscan(emb, eps = 1.15, minPts = 3)
    // k=1: a single cell — bucketed must equal exact by construction
    val q = new KMeansQuantizer(Array(Array.fill(64)(0.0)))
    val bucketed = Dbscan.dbscanBucketed(emb, q, eps = 1.15, minPts = 3)
    assert(exact.except(bucketed).count() == 0 &&
      bucketed.except(exact).count() == 0)
  }
}
