package graft.ml

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** sklearn-scheme bagging (Bagging scaladoc): per-estimator bootstrap +
  * feature subsets, soft-vote classification, mean-vote regression,
  * persistence round-trip, and the Train dispatch knobs. */
class BaggingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clsFixture = (1 to 200).map { i =>
    val y = if (i % 2 == 0) 1.0 else 0.0
    // signal in feature 0, noise in 1..3
    (Vectors.dense(y * 4 + (i % 5) * 0.2, (i % 7).toDouble,
      (i % 11).toDouble, (i % 3).toDouble), y)
  }.toDF("features", "label")

  test("classification: bagged trees separate, probabilities sum to 1") {
    val m = new BaggingClassifier().setNumEstimators(5).setSeed(7).fit(clsFixture)
    val out = m.transform(clsFixture).select("prediction", "label", "probability")
    assert(out.filter($"prediction" =!= $"label").count() == 0)
    val p = out.head().getAs[Vector]("probability")
    assert(math.abs(p.toArray.sum - 1.0) < 1e-9)
  }

  test("soft voting: raw scores are summed per-tree leaf distributions") {
    val m = new BaggingClassifier().setNumEstimators(3).setSeed(1).fit(clsFixture)
    val flat = m.getOrDefault(m.treesFlat)
    val off = m.getOrDefault(m.treeOffsets)
    val dist = m.getOrDefault(m.leafDist)
    val v = Vectors.dense(4.4, 1.0, 2.0, 1.0)
    val manual = new Array[Double](2)
    (0 until off.length - 1).foreach { t =>
      val leaf = BaggingCore.leafIndex(flat, off(t), v)
      val pos = flat(off(t) + leaf * 5 + 4).toInt
      (0 until 2).foreach(c => manual(c) += dist(pos + c))
    }
    assert(m.predictRaw(v).toArray.zip(manual).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("max_features draws a per-estimator subset; trees stay in the original space") {
    // d = 4, max_features = 0.5 → each tree trains on 2 features; after
    // the remap every split id must still address the 4-dim vector
    val m = new BaggingClassifier().setNumEstimators(6).setMaxFeatures(0.5)
      .setSeed(3).fit(clsFixture)
    val flat = m.getOrDefault(m.treesFlat)
    val off = m.getOrDefault(m.treeOffsets)
    val perTreeFeats = (0 until off.length - 1).map { t =>
      (off(t) until off(t + 1) by 5).collect {
        case p if flat(p) >= 0 => flat(p).toInt
      }.toSet
    }
    assert(perTreeFeats.forall(s => s.subsetOf(Set(0, 1, 2, 3))))
    // a 2-feature subset can never split on 3+ distinct features
    assert(perTreeFeats.forall(_.size <= 2))
    // seeded draws differ across estimators (not all trees saw feature 0)
    assert(perTreeFeats.exists(!_.contains(0)))
    // drawFeatures itself: floor(0.5·4)=2, sorted, within range, no dups
    val idx = BaggingCore.drawFeatures(4, 0.5, withReplacement = false,
      new scala.util.Random(9))
    assert(idx.length == 2 && idx.distinct.length == 2 && idx.forall(i => i >= 0 && i < 4))
  }

  test("bootstrap=false, max_samples=1.0: every tree sees the full frame → identical trees") {
    val m = new BaggingClassifier().setNumEstimators(3).setBootstrap(false)
      .setSeed(5).fit(clsFixture)
    val flat = m.getOrDefault(m.treesFlat)
    val off = m.getOrDefault(m.treeOffsets)
    val dist = m.getOrDefault(m.leafDist)
    // canonical form: leaf slot-4 is a POINTER into the shared dist
    // buffer (differs per tree even for identical trees) — substitute
    // the pointed-to distribution before comparing
    def canon(t: Int): Seq[Any] =
      (off(t) until off(t + 1) by 5).flatMap { p =>
        if (flat(p) < 0) Seq("leaf", dist.slice(flat(p + 4).toInt,
          flat(p + 4).toInt + 2).toSeq)
        else flat.slice(p, p + 5).toSeq
      }
    val t0 = canon(0)
    (1 until off.length - 1).foreach(t => assert(canon(t) == t0))
  }

  test("rare highest class: estimators that miss it still produce k-length distributions") {
    // class 2 has two rows; at max_samples=0.3 most Poisson bootstraps
    // drop it entirely, so those trees train on 2 classes and their
    // leaf distributions must pad to k=3 (deterministic under the seed)
    val df = ((1 to 60).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (Vectors.dense(y * 4 + (i % 5) * 0.2, (i % 7).toDouble), y)
    } ++ Seq((Vectors.dense(20.0, 1.0), 2.0), (Vectors.dense(20.2, 2.0), 2.0)))
      .toDF("features", "label")
    val m = new BaggingClassifier().setNumEstimators(8).setMaxSamples(0.3)
      .setSeed(17).fit(df)
    assert(m.numClasses == 3)
    val probs = m.transform(df).select("probability").collect()
      .map(_.getAs[Vector](0))
    assert(probs.forall(p => p.size == 3 && math.abs(p.toArray.sum - 1.0) < 1e-9))
  }

  test("regression: mean vote fits a step function; persistence round-trips") {
    val df = (1 to 200).map { i =>
      val x = (i % 20).toDouble
      (Vectors.dense(x, (i % 3).toDouble), if (x < 10) 1.0 else 5.0)
    }.toDF("features", "label")
    val m = new BaggingRegressor().setNumEstimators(5).setSeed(11).fit(df)
    val mse = m.transform(df)
      .select(avg(($"prediction" - $"label") * ($"prediction" - $"label")))
      .head().getDouble(0)
    assert(mse < 0.1, s"bagged regression mse $mse")
    val dir = java.nio.file.Files.createTempDirectory("bagspec").toString + "/m"
    m.write.overwrite().save(dir)
    val loaded = BaggingRegressionModel.load(dir)
    val v = Vectors.dense(3.0, 1.0)
    assert(loaded.predict(v) == m.predict(v))
  }

  test("Train dispatch: bagging honors the sklearn knobs with a clean scheme ledger") {
    val est = Train.estimatorFor("classification", "bagging",
      Map("n_estimators" -> "4", "max_features" -> "0.5", "max_samples" -> "0.8"),
      seed = 42L)
    val bc = est.asInstanceOf[BaggingClassifier]
    assert(bc.getOrDefault(bc.numEstimators) == 4)
    assert(bc.getOrDefault(bc.maxFeatures) == 0.5)
    assert(bc.getOrDefault(bc.maxSamples) == 0.8)
  }

  test("bootstrap_mode=exact: exactly-n resample, deterministic, capped, flag-free ledger") {
    val df = clsFixture.localCheckpoint()
    // exactly k rows drawn, every time
    val s1 = BaggingCore.sampleRowsExact(df, 150L, seed = 7)
    assert(s1.count() == 150L)
    // deterministic: the same seed replays the identical multiset
    val key = org.apache.spark.sql.functions.expr(
      "concat(cast(features as string), ':', cast(label as string))")
    val m1 = s1.select(key.as("k")).groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m2 = BaggingCore.sampleRowsExact(df, 150L, seed = 7)
      .select(key.as("k")).groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
    // a different seed draws a different multiset
    val m3 = BaggingCore.sampleRowsExact(df, 150L, seed = 8)
      .select(key.as("k")).groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 != m3)
    // end to end: the exact mode trains and separates like the default
    val m = new BaggingClassifier().setNumEstimators(3)
      .setBootstrapMode("exact").setSeed(5).fit(df)
    assert(m.transform(df).filter($"prediction" =!= $"label").count() == 0)
    // the ledger: exact mode substitutes NOTHING — no compat flag;
    // the poisson default keeps its stated substitution
    assert(Train.compatNote("bagging",
      Map("bootstrap_mode" -> "exact")).isEmpty)
    assert(Train.compatNote("bagging", Map.empty)
      .get("compat").contains("poisson_bootstrap"))
    // past the cap the exact route refuses, naming the poisson default
    val e = intercept[IllegalArgumentException] {
      BaggingCore.sampleRowsExact(
        spark.range(BaggingCore.EXACT_BOOTSTRAP_CAP + 1)
          .toDF("x"), 10L, seed = 1)
    }
    assert(e.getMessage.contains("Poisson default"), e.getMessage)
  }

  test("integer knob form: max_samples above 1 is an absolute count, like sklearn") {
    // 100 of 200 rows per estimator ≙ fraction 0.5; non-integer > 1 refuses
    assert(BaggingCore.resolveFraction(100.0, 200L) == 0.5)
    assert(BaggingCore.resolveCount(3.0, 4) == 3)
    assert(BaggingCore.resolveCount(99.0, 4) == 4) // capped at d
    intercept[IllegalArgumentException] {
      BaggingCore.validate(2, 1.5, 1.0)
    }
    val m = new BaggingClassifier().setNumEstimators(3).setMaxSamples(100.0)
      .setSeed(5).fit(clsFixture)
    assert(m.transform(clsFixture).filter($"prediction" =!= $"label").count() == 0)
  }

  test("full lifecycle: train(bagging) → deploy → quackml_predict serves the model") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_bag_cat").toString)
    val df = (1 to 200).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (y * 4 + (i % 5) * 0.2, (i % 7).toDouble, (i % 11).toDouble,
        (i % 3).toDouble, y)
    }.toDF("x0", "x1", "x2", "x3", "target")
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "BagLife", task = "classification",
      relationName = "quackml_baglife", data = Some(df),
      yColumn = Seq("target"), algorithm = "bagging",
      hyperparams = Map("n_estimators" -> "5"),
      testSampling = "random"))
    assert(out.head().getBoolean(3))
    Predict.clearCaches()
    Predict.registerFunctions(spark, cat)
    // the regression this pins: rowPredictor must dispatch the Bagging
    // models, or this UDF call throws "no row predictor"
    val pred = spark.sql(
      "SELECT quackml_predict('BagLife', array(cast(4.4 as float), " +
        "cast(1.0 as float), cast(2.0 as float), cast(1.0 as float)))")
      .head().getFloat(0)
    assert(pred == 1.0f, s"separable class-1 point scored $pred")
  }

  test("overlapped estimator fits are bit-identical to the sequential loop " +
      "(r20 guide-§2.6 optimization)") {
    import spark.implicits._
    val df = (1 to 120).map { i =>
      (org.apache.spark.ml.linalg.Vectors.dense(i / 10.0, (i % 7).toDouble),
        (i % 3).toDouble)
    }.toDF("features", "label")
    def fitBoth() = {
      val c = new BaggingClassifier().setNumEstimators(5).setMaxDepth(4)
        .setSeed(7L).fit(df)
      val r = new BaggingRegressor().setNumEstimators(5).setMaxDepth(4)
        .setSeed(7L).fit(df.withColumn("label", $"label" * 1.5))
      (c.getOrDefault(c.treesFlat).toSeq, c.getOrDefault(c.leafDist).toSeq,
        r.getOrDefault(r.treesFlat).toSeq)
    }
    val par = fitBoth() // default parallelism 4
    spark.conf.set("spark.graft.baggingFitParallelism", "1")
    try {
      val seq = fitBoth()
      assert(par == seq, "parallel vs sequential bagging fits diverged")
    } finally spark.conf.unset("spark.graft.baggingFitParallelism")
  }

  private def avg(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.avg(c)
}
