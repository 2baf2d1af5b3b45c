package graft.operators

import graft.functions.GraftFunctions
import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The coarse-quantizer seam of the similarity family: trained k-means
  * centroids bound cell population (the scale lever for IVF / kNN-graph),
  * the native `graft_cell` assignment matches a composable argmin, and
  * the kNN-graph guard refuses fat cells. */
class QuantizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
      .cache()
  }

  test("graft_cell equals the composable sqdist argmin on trained centroids") {
    val q = KMeansQuantizer.fit(emb, k = 8)
    // composable reference: array_min over (distance, id) structs — ties
    // break to the lower id via the struct's lexicographic order, the
    // same rule graft_cell implements natively
    val structs = (0 until q.numCells).map { k =>
      struct(call_function("graft_sqdist", $"v", typedlit(q.centroid(k))).as("d"),
        lit(k.toLong).as("k"))
    }
    val mismatches = emb
      .withColumn("native", q.cellCol($"v"))
      .withColumn("composed", array_min(array(structs: _*)).getField("k"))
      .filter($"native" =!= $"composed").count()
    assert(mismatches == 0)
  }

  test("graft_cell stays inside whole-stage codegen and is null-safe") {
    GraftFunctions.register(spark)
    val plan = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_cell(CAST(embedding AS ARRAY<DOUBLE>), array(array(0.0d), array(1.0d))) AS c")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(spark.sql(
      "SELECT graft_cell(CAST(NULL AS ARRAY<DOUBLE>), array(array(0.0d)))")
      .head().isNullAt(0))
    // length-mismatched centroid → null, not a wrong cell
    assert(spark.sql(
      "SELECT graft_cell(array(1.0d, 2.0d), array(array(0.0d)))")
      .head().isNullAt(0))
  }

  test("max cell population shrinks as k grows") {
    def maxCell(k: Int): Long = {
      val q = KMeansQuantizer.fit(emb, k)
      emb.withColumn("cell", q.cellCol($"v"))
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
    }
    val m4 = maxCell(4)
    val m16 = maxCell(16)
    val m64 = maxCell(64)
    assert(m16 < m4, s"k=16 max cell $m16 should shrink below k=4's $m4")
    assert(m64 < m16, s"k=64 max cell $m64 should shrink below k=16's $m16")
  }

  test("chooseK sizes the quantizer from corpus rows / target cell rows") {
    assert(KMeansQuantizer.chooseK(100L, 1000L) == 2) // clamped low
    assert(KMeansQuantizer.chooseK(1000000L, 10000L) == 100)
    assert(KMeansQuantizer.chooseK(Long.MaxValue, 1L) == 65536) // clamped high
  }

  test("knnGraph with a trained quantizer yields topK edges per node") {
    val q = KMeansQuantizer.fit(emb, k = 16)
    val g = Similarity.knnGraph(emb, q, topK = 3).cache()
    // every node with >= 3 in-cell neighbors has exactly 3 edges, ranked 1..3
    val perNode = g.groupBy("src").agg(count("*").as("deg"), max("rank").as("mr"))
    assert(perNode.filter($"deg" > 3).count() == 0)
    assert(g.filter($"rank" < 1 || $"rank" > 3).count() == 0)
    assert(g.count() > 0)
    // edges never cross cells: src and dst always share the assigned cell
    val cells = emb.withColumn("cell", q.cellCol($"v")).select($"vec_id", $"cell")
    val crossCell = g
      .join(cells.withColumnRenamed("vec_id", "src").withColumnRenamed("cell", "cs"), "src")
      .join(cells.withColumnRenamed("vec_id", "dst").withColumnRenamed("cell", "cd"), "dst")
      .filter($"cs" =!= $"cd").count()
    assert(crossCell == 0)
  }

  test("knnGraph guard refuses a fat cell and routes to a larger k") {
    val err = intercept[IllegalArgumentException] {
      Similarity.knnGraph(emb, LcgQuantizer, maxCellRows = 10L)
    }
    assert(err.getMessage.contains("larger k"))
  }

  test("LCG quantizer probe list: nprobe=1 head equals the assigned cell") {
    val bad = emb
      .withColumn("cell", LcgQuantizer.cellCol($"v"))
      .withColumn("probe", LcgQuantizer.probeCol($"v", 1).getItem(0))
      .filter($"cell" =!= $"probe").count()
    assert(bad == 0)
  }
}
