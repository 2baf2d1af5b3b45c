package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three well-separated 2-D Gaussian blobs, deterministic. */
  private def blobs(n: Int = 300): DataFrame = {
    val rnd = new scala.util.Random(43)
    val cs = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    new VectorAssembler().setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform((0 until n).map { i =>
        val (cx, cy) = cs(i % 3)
        (cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5, i % 3)
      }.toDF("x1", "x2", "truth"))
  }

  /** Majority-label purity of predicted clusters vs ground truth. */
  private def purity(scored: DataFrame): Double = {
    val agg = scored.groupBy("prediction", "truth").count().collect()
    val byCluster = agg.groupBy(_.getInt(0))
    val correct = byCluster.values.map(_.map(_.getLong(2)).max).sum
    correct.toDouble / agg.map(_.getLong(2)).sum
  }

  test("mean_shift finds the three blobs with pure assignment") {
    val df = blobs()
    val m = new MeanShift().setBandwidth(2.0).fit(df)
    assert(m.numClusters == 3, s"centers: ${m.centers.map(_.toSeq).toSeq}")
    assert(purity(m.transform(df)) > 0.99)
    // each center lands on a blob mean
    val want = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    m.centers.foreach { c =>
      assert(want.exists { case (x, y) =>
        math.abs(c(0) - x) < 0.5 && math.abs(c(1) - y) < 0.5
      }, s"stray center ${c.toSeq}")
    }
  }

  test("mean_shift derived bandwidth also separates the blobs") {
    val df = blobs()
    val m = new MeanShift().fit(df) // bandwidth = sqrt(sum var)/2
    assert(m.numClusters >= 3 && m.numClusters <= 6,
      s"${m.numClusters} clusters")
    assert(purity(m.transform(df)) > 0.95)
  }

  test("mean_shift refuses a seed explosion from a too-small bandwidth") {
    val e = intercept[IllegalArgumentException] {
      new MeanShift().setBandwidth(1e-4).setMaxSeeds(50).fit(blobs())
    }
    assert(e.getMessage.contains("bandwidth"))
  }

  test("affinity_propagation clusters the blobs and caps at maxRows") {
    val df = blobs(120)
    val m = new AffinityPropagation().fit(df)
    assert(m.numClusters >= 3 && m.numClusters <= 10,
      s"${m.numClusters} clusters")
    assert(purity(m.transform(df)) > 0.95)
    val e = intercept[IllegalArgumentException] {
      new AffinityPropagation().setMaxRows(50).fit(blobs(60))
    }
    assert(e.getMessage.contains("O(n²)"))
  }

  test("mean_shift runs the full train lifecycle with silhouette metrics") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ms").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "Shift", task = "clustering", relationName = "blobs",
      data = Some(blobs().select("x1", "x2")), yColumn = Seq.empty,
      algorithm = "mean_shift", hyperparams = Map("bandwidth" -> "2.0")))
    val m = cat.models.collect().head
    assert(m.algorithm == "mean_shift")
    assert(m.metrics("silhouette") > 0.8, m.metrics)
  }

  test("GraftClusterModel persists inside a PipelineModel") {
    val df = blobs()
    val model = new org.apache.spark.ml.Pipeline()
      .setStages(Array(new MeanShift().setBandwidth(2.0))).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_msp").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(df).select("prediction").collect().map(_.getInt(0))
    val b = loaded.transform(df).select("prediction").collect().map(_.getInt(0))
    assert(a.sameElements(b))
  }
}
