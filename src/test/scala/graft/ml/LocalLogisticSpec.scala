package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-route LBFGS parity (r21): LocalLogistic.fitBounded solves the
  * SAME optimization problem as Spark's LogisticRegression.train for
  * the supported configuration, so its coefficients must match the
  * distributed fit to float-association jitter and its predictions must
  * be identical — the HistGBSpec bar. Also pins the fallback triggers
  * (cap, multinomial labels, unsupported params). */
class LocalLogisticSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def relErr(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) / (1.0 + math.max(math.abs(x), math.abs(y))) }.max

  private def comparePair(lr: LogisticRegression,
      df: org.apache.spark.sql.DataFrame, tol: Double): Unit = {
    val local = LocalLogistic.fitBounded(lr, df)
      .getOrElse(fail("expected the driver route to fire"))
    val dist = lr.fit(df)
    assert(relErr(local.coefficients.toArray, dist.coefficients.toArray) < tol,
      s"coef relErr ${relErr(local.coefficients.toArray, dist.coefficients.toArray)}")
    assert(math.abs(local.intercept - dist.intercept) /
      (1.0 + math.abs(dist.intercept)) < tol)
    val pl = local.transform(df).select("prediction").collect().map(_.getDouble(0))
    val pd = dist.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(pl.sameElements(pd), "predictions must be identical")
    // the model must carry the estimator's params like copyValues would
    assert(local.getMaxIter == lr.getMaxIter)
    assert(local.getRegParam == lr.getRegParam)
    assert(local.getFeaturesCol == lr.getFeaturesCol)
    assert(local.numClasses == 2)
  }

  private def denseFixture = (1 to 400).map { i =>
    val y = if ((i * 7) % 10 < 4) 1.0 else 0.0
    // separable-ish signal + noise dims + one CONSTANT column (std 0)
    (Vectors.dense(y * 1.5 + (i % 13) * 0.11, (i % 7).toDouble,
      math.sin(i.toDouble), 3.0), y)
  }.toDF("features", "y")

  private def sparseFixture = (1 to 300).map { i =>
    val y = if (i % 3 == 0) 1.0 else 0.0
    val idx = Array(i % 50, 50 + (i % 17), 67 + (i % 5)).distinct.sorted
    val v = idx.map(j => 1.0 + (j % 3) + y * (if (j < 50) 0.8 else 0.0))
    (Vectors.sparse(80, idx, v): Vector, y)
  }.toDF("features", "y")

  test("dense 10-iter unregularized fit (the finetune-head config) matches Spark") {
    comparePair(new LogisticRegression().setMaxIter(10).setRegParam(0.0)
      .setLabelCol("y"), denseFixture, 1e-6)
  }

  test("sparse 30-iter L2 fit (the quality-classifier config) matches Spark") {
    comparePair(new LogisticRegression().setMaxIter(30).setRegParam(1e-4)
      .setLabelCol("y"), sparseFixture, 1e-6)
  }

  test("fallback: row cap, multinomial labels, unsupported params") {
    val lr = new LogisticRegression().setMaxIter(5).setLabelCol("y")
    spark.conf.set("spark.graft.lrLocalFitRows", "10")
    try assert(LocalLogistic.fitBounded(lr, denseFixture).isEmpty, "cap")
    finally spark.conf.unset("spark.graft.lrLocalFitRows")
    val multi = (1 to 60).map(i =>
      (Vectors.dense(i.toDouble % 5, i.toDouble % 3), (i % 3).toDouble))
      .toDF("features", "y")
    assert(LocalLogistic.fitBounded(lr, multi).isEmpty, "multinomial")
    assert(LocalLogistic.fitBounded(
      new LogisticRegression().setMaxIter(5).setLabelCol("y")
        .setElasticNetParam(0.5).setRegParam(0.1), denseFixture).isEmpty,
      "elastic net")
    assert(LocalLogistic.fitBounded(
      new LogisticRegression().setMaxIter(5).setLabelCol("y")
        .setStandardization(false), denseFixture).isEmpty, "standardization off")
    val oneClass = (1 to 40).map(i =>
      (Vectors.dense(i.toDouble), 1.0)).toDF("features", "y")
    assert(LocalLogistic.fitBounded(lr, oneClass).isEmpty, "constant label")
  }

  test("fitHeadPipeline: driver route yields a transformable single-stage PipelineModel") {
    val lr = new LogisticRegression().setMaxIter(10).setRegParam(0.0)
      .setLabelCol("y").setFeaturesCol("features")
    val head = LocalLogistic.fitHeadPipeline(lr, denseFixture)
    assert(head.stages.length == 1)
    assert(head.stages.head.isInstanceOf[LogisticRegressionModel])
    val out = head.transform(denseFixture)
    assert(out.columns.contains("prediction") && out.columns.contains("probability"))
    // and it persists + reloads through PipelineIO like a fit() product
    val p = java.nio.file.Files.createTempDirectory("llr").toString + "/m"
    PipelineIO.save(head, p)
    val back = PipelineIO.load(spark, p)
    assert(back.stages.head.asInstanceOf[LogisticRegressionModel]
      .coefficients.toArray.sameElements(
        head.stages.head.asInstanceOf[LogisticRegressionModel].coefficients.toArray))
  }
}
