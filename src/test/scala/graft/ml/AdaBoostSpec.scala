package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** Exact AdaBoost (AdaBoost scaladoc): SAMME stage weights on a
  * hand-checkable case, multiclass votes, R2 weighted-median
  * regression, and the Train dispatch with a clean ledger. */
class AdaBoostSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SAMME: one stump on separable data is perfect and stops early") {
    val df = (1 to 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (Vectors.dense(y * 10 + (i % 3)), y)
    }.toDF("features", "label")
    val m = new AdaBoostClassifier().setNumRounds(10).fit(df)
    // a single stump separates x<5 — training stops at the perfect stage
    assert(m.getOrDefault(m.alphas).length == 1)
    assert(m.transform(df).filter($"prediction" =!= $"label").count() == 0)
  }

  test("SAMME: a chance-level first stage raises, matching sklearn") {
    // depth-1 stumps score exactly eps = 0.5 on balanced XOR — at or
    // past the 1 − 1/K bound the FIRST stage must refuse loudly
    val rows = Seq(
      (Vectors.dense(0.0, 0.0), 0.0), (Vectors.dense(1.0, 1.0), 0.0),
      (Vectors.dense(0.0, 1.0), 1.0), (Vectors.dense(1.0, 0.0), 1.0))
    val df = (1 to 10).flatMap(_ => rows).toDF("features", "label")
    val e = intercept[IllegalArgumentException] {
      new AdaBoostClassifier().setNumRounds(5).fit(df)
    }
    assert(e.getMessage.contains("no better than chance"))
  }

  test("SAMME multiclass: 3 classes, boosted stumps fit, probs are vote shares") {
    val df = (1 to 150).map { i =>
      val c = i % 3
      (Vectors.dense(c * 5.0 + (i % 25) * 0.1), c.toDouble)
    }.toDF("features", "label")
    val m = new AdaBoostClassifier().setNumRounds(20).fit(df)
    assert(m.numClasses == 3)
    assert(m.transform(df).filter($"prediction" =!= $"label").count() == 0)
    val pr = m.predictProbability(Vectors.dense(5.2)).toArray
    assert(math.abs(pr.sum - 1.0) < 1e-9)
    assert(pr(1) == pr.max)
  }

  test("R2 regression: weighted median fits a step function") {
    val df = (1 to 100).map { i =>
      val x = i / 10.0
      (Vectors.dense(x), if (x <= 5) 2.0 else 8.0)
    }.toDF("features", "label")
    val m = new AdaBoostRegressor().setNumRounds(10).setMaxDepth(2).fit(df)
    assert(math.abs(m.predict(Vectors.dense(2.0)) - 2.0) < 1e-9)
    assert(math.abs(m.predict(Vectors.dense(9.0)) - 8.0) < 1e-9)
  }

  test("Train dispatch: ada_boost has a CLEAN ledger (no compat flag) both tasks") {
    val reg = (1 to 120).map(i => (i * 0.1, (i % 7) * 1.0, math.sin(i * 0.1) * 5 + i * 0.05))
      .toDF("a", "b", "target")
    val cat1 = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ada_r").toString)
    Train.train(spark, cat1, Train.TrainConfig(
      projectName = "AdaR", task = "regression", relationName = "t",
      data = Some(reg), yColumn = Seq("target"), algorithm = "ada_boost",
      hyperparams = Map("n_estimators" -> "10"),
      testSampling = "random", orderCols = Seq("a")))
    val mr = cat1.models.collect().head
    assert(!mr.hyperparams.contains("compat"))
    assert(mr.metrics("r2") > 0.5, s"ada r2 = ${mr.metrics("r2")}")

    val cls = (1 to 120).map { i =>
      val c = i % 2
      (c * 6.0 + (i % 27) * 0.05, i * 0.01, c.toDouble)
    }.toDF("a", "b", "target")
    val cat2 = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ada_c").toString)
    Train.train(spark, cat2, Train.TrainConfig(
      projectName = "AdaC", task = "classification", relationName = "t",
      data = Some(cls), yColumn = Seq("target"), algorithm = "ada_boost",
      hyperparams = Map("n_estimators" -> "8"),
      testSampling = "stratified", orderCols = Seq("a")))
    val mc = cat2.models.collect().head
    assert(!mc.hyperparams.contains("compat"))
    assert(mc.metrics("f1") > 0.9, s"ada f1 = ${mc.metrics("f1")}")
  }

  test("model save/load round-trips") {
    val df = (1 to 60).map { i =>
      (Vectors.dense((i % 2) * 4.0 + (i % 5) * 0.1), (i % 2).toDouble)
    }.toDF("features", "label")
    val m = new AdaBoostClassifier().setNumRounds(5).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_ada_io").toString + "/m"
    m.save(dir)
    val back = AdaBoostClassificationModel.load(dir)
    val v = Vectors.dense(4.1)
    assert(back.predictRaw(v) == m.predictRaw(v))
  }
}
