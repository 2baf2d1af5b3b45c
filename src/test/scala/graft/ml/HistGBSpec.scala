package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** Native second-order histogram boosting (HistGB scaladoc): the
  * hand-computed Newton case, separable binary + multiclass fits, and
  * the Train dispatch/ledger integration. */
class HistGBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one round, depth 1, lambda 0: exact Newton leaf weights") {
    // x = 1..4, y = [1,1,3,3]; init = mean = 2; g = pred−y = [1,1,−1,−1],
    // h = 1. Best split v<=2: gain = ½(GL²/HL + GR²/HR − 0) = 2;
    // leaves −GL/HL = −1 and +1 → exact predictions 1 and 3.
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 3.0), (4.0, 3.0))
      .map { case (x, y) => (Vectors.dense(x), y) }.toDF("features", "label")
    val m = new HistGBRegressor().setNumRounds(1).setMaxDepth(1)
      .setStepSize(1.0).setRegLambda(0.0).fit(df)
    assert(math.abs(m.predict(Vectors.dense(1.0)) - 1.0) < 1e-9)
    assert(math.abs(m.predict(Vectors.dense(2.0)) - 1.0) < 1e-9)
    assert(math.abs(m.predict(Vectors.dense(3.0)) - 3.0) < 1e-9)
    assert(math.abs(m.predict(Vectors.dense(4.0)) - 3.0) < 1e-9)
  }

  test("regression: boosting reduces train MSE monotonically-ish") {
    val data = (1 to 200).map { i =>
      val x = i / 20.0
      (Vectors.dense(x, (i % 7).toDouble), math.sin(x) * 3 + (i % 7))
    }.toDF("features", "label")
    def mse(rounds: Int): Double = {
      val m = new HistGBRegressor().setNumRounds(rounds).setMaxDepth(4)
        .setStepSize(0.3).fit(data)
      data.collect().map { r =>
        val d = m.predict(r.getAs[org.apache.spark.ml.linalg.Vector](0)) - r.getDouble(1)
        d * d
      }.sum / 200
    }
    val m1 = mse(2); val m2 = mse(10); val m3 = mse(40)
    assert(m2 < m1, s"10 rounds ($m2) should beat 2 ($m1)")
    assert(m3 < m2, s"40 rounds ($m3) should beat 10 ($m2)")
    assert(m3 < 0.05, s"40 rounds should nearly interpolate, got $m3")
  }

  test("ordered boosting beats plain on the small-n noisy fixture (prediction shift)") {
    // weak signal + strong noise at small n is exactly where the
    // prediction shift ordered boosting corrects shows up
    // (Prokhorenkova et al. 2018 §4): plain boosting's gradients are
    // computed on the rows that trained the model, so each tree fits a
    // biased residual; ordered gradients come from prefix models that
    // never saw the row. Deterministic LCG fixture; same knobs, same
    // seed, oblivious policy both sides — the ONLY difference is the
    // boosting scheme. Measured: plain test-MSE 0.9649, ordered 0.9049
    // (every cell of the n×rounds×depth grid agreed; this pins one).
    def noise(i: Long): Double = {
      var h = i * 0x9E3779B97F4A7C15L + 11L
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    def mkRow(i: Long): (org.apache.spark.ml.linalg.Vector, Double) = {
      val xs = Array.tabulate(4)(f => noise(i * 7 + f + 1) * 4)
      (Vectors.dense(xs), 0.5 * xs(0) + 3.0 * noise(i * 7 + 5))
    }
    val train = (0L until 100L).map(mkRow).toDF("features", "label")
    val test = (100000L until 102000L).map(mkRow).collect { case (v, y) => (v, y) }
    def testMse(ordered: Boolean): Double = {
      val m = new HistGBRegressor().setNumRounds(30).setMaxDepth(3)
        .setStepSize(0.3).setGrowthPolicy("oblivious")
        .setOrderedBoosting(ordered).setSeed(42L).fit(train)
      test.map { case (v, y) => val d = m.predict(v) - y; d * d }.sum / test.length
    }
    val plain = testMse(false)
    val ord = testMse(true)
    assert(ord < plain,
      s"ordered ($ord) must beat plain ($plain) on the overfit fixture")
  }

  test("multiclass ordered boosting beats plain on the small-n noisy fixture (r14 item 6)") {
    // the same prediction-shift regime, three classes: weak linear
    // class scores + strong label noise at n=100 — plain softmax
    // gradients come from a model that saw the row, ordered from
    // fold-prefix models that never did. Same knobs, same seed, same
    // oblivious growth; the ONLY difference is the boosting scheme.
    def noise(i: Long): Double = {
      var h = i * 0x9E3779B97F4A7C15L + 13L
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    def mkRow(i: Long): (org.apache.spark.ml.linalg.Vector, Double) = {
      val xs = Array.tabulate(4)(f => noise(i * 9 + f + 1) * 4)
      val scores = Array.tabulate(3)(c => 0.5 * xs(c) + 3.0 * noise(i * 9 + 5 + c))
      (Vectors.dense(xs), scores.indexOf(scores.max).toDouble)
    }
    val train = (0L until 100L).map(mkRow).toDF("features", "label")
    val test = (100000L until 102000L).map(mkRow)
    // measured over the n×rounds×depth grid: the shift shows at long
    // rounds + shallow trees (60×depth-2: plain 1.3270, ordered 1.2925);
    // deep trees at small n memorize under BOTH schemes and the gap
    // closes — this pins the cell where the paper's effect is visible
    def testLogLoss(ordered: Boolean): Double = {
      val m = new HistGBClassifier().setNumRounds(60).setMaxDepth(2)
        .setStepSize(0.3).setGrowthPolicy("oblivious")
        .setOrderedBoosting(ordered).setSeed(42L).fit(train)
      -test.map { case (v, y) =>
        math.log(math.max(m.predictProbability(v)(y.toInt), 1e-15))
      }.sum / test.length
    }
    val plainLl = testLogLoss(false)
    val ordLl = testLogLoss(true)
    assert(ordLl < plainLl,
      s"multiclass ordered ($ordLl) must beat plain ($plainLl)")
    // and the trained ensemble is a real 3-class model: probabilities
    // normalize and the compat flag is GONE for ordered multiclass
    assert(Train.compatNote("catboost",
      Map("boosting_type" -> "Ordered"), task = "classification",
      numClasses = 3) == Map.empty)
  }

  test("Train dispatch: boosting_type=Ordered drops the plain_boosting flag") {
    val h = Map("boosting_type" -> "Ordered", "n_estimators" -> "3",
      "depth" -> "3")
    assert(Train.compatNote("catboost", h) == Map.empty)
    assert(Train.compatNote("catboost", Map.empty[String, String]) ==
      Map("compat" -> "plain_boosting"))
  }

  test("binary logistic: separable data fits, probabilities ordered") {
    val df = (1 to 100).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (Vectors.dense(y * 4 + (i % 5) * 0.1, (i % 3).toDouble), y)
    }.toDF("features", "label")
    val m = new HistGBClassifier().setNumRounds(20).setMaxDepth(3)
      .setStepSize(0.3).fit(df)
    assert(m.numClasses == 2)
    val out = m.transform(df)
    assert(out.filter($"prediction" =!= $"label").count() == 0)
    val p1 = m.predictProbability(Vectors.dense(4.2, 1.0))(1)
    val p0 = m.predictProbability(Vectors.dense(0.2, 1.0))(1)
    assert(p1 > 0.9 && p0 < 0.1, s"probabilities not separated: $p1 / $p0")
  }

  test("multiclass softmax: 3-class separable, probs sum to 1") {
    val df = (1 to 150).map { i =>
      val c = i % 3
      (Vectors.dense(c * 5.0 + (i % 4) * 0.2, (i % 2).toDouble), c.toDouble)
    }.toDF("features", "label")
    val m = new HistGBClassifier().setNumRounds(15).setMaxDepth(3)
      .setStepSize(0.3).fit(df)
    assert(m.numClasses == 3)
    val out = m.transform(df)
    assert(out.filter($"prediction" =!= $"label").count() == 0)
    val pr = m.predictProbability(Vectors.dense(5.1, 0.0)).toArray
    assert(math.abs(pr.sum - 1.0) < 1e-9)
    assert(pr(1) == pr.max)
  }

  test("Train dispatch: xgboost regression has NO compat flag; lightgbm/catboost flagged") {
    val df = (1 to 120).map(i => (i.toDouble, (i % 5).toDouble, 2.0 * i + (i % 5)))
      .toDF("a", "b", "target")
    def ledger(alg: String): Map[String, String] = {
      val cat = new Catalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft_hgb_$alg").toString)
      Train.train(spark, cat, Train.TrainConfig(
        projectName = s"HGB_$alg", task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("target"), algorithm = alg,
        hyperparams = Map("n_estimators" -> "10", "max_depth" -> "4"),
        testSampling = "random", orderCols = Seq("a")))
      val m = cat.models.collect().head
      assert(m.metrics("r2") > 0.9, s"$alg r2 = ${m.metrics("r2")}")
      m.hyperparams
    }
    assert(!ledger("xgboost").contains("compat"))
    // lightgbm now trains its native leaf-wise scheme — clean ledger;
    // catboost trains symmetric trees under PLAIN boosting, flagged for
    // the ordered-boosting variant only
    assert(!ledger("lightgbm").contains("compat"))
    assert(ledger("catboost").get("compat").contains("plain_boosting"))
  }

  // ---- flat-tree decoding helpers (model form, stride 5)
  private def modelTrees(m: HistGBModelParams): Seq[Array[Double]] = {
    val flat = m.getOrDefault(m.treesFlat)
    val off = m.getOrDefault(m.treeOffsets)
    (0 until off.length - 1).map(t => flat.slice(off(t), off(t + 1)))
  }
  private def leafCount(tree: Array[Double]): Int =
    (0 until tree.length / 5).count(i => tree(i * 5) < 0)

  test("leafwise growth respects the num_leaves budget exactly") {
    // stairstep target: every additional leaf buys gain, so best-first
    // growth spends the entire budget; unlimited depth cap
    val df = (1 to 128).map(i => (Vectors.dense(i.toDouble), (i / 16).toDouble))
      .toDF("features", "label")
    val m = new HistGBRegressor().setNumRounds(1).setMaxDepth(30)
      .setGrowthPolicy("leafwise").setNumLeaves(5).setStepSize(1.0).fit(df)
    val t = modelTrees(m)
    assert(t.length == 1 && leafCount(t.head) == 5,
      s"expected exactly 5 leaves, got ${leafCount(t.head)}")
    // best-first order: the budgeted tree recovers the 5 coarsest steps
    // better than a depth-2 (4-leaf) depthwise tree can
    val mse = (mm: HistGBRegressionModel) => df.collect().map { r =>
      val d = mm.predict(r.getAs[org.apache.spark.ml.linalg.Vector](0)) - r.getDouble(1)
      d * d
    }.sum / 128
    val depthwise = new HistGBRegressor().setNumRounds(1).setMaxDepth(2)
      .setStepSize(1.0).fit(df)
    assert(mse(m) < mse(depthwise),
      s"5-leaf best-first (${mse(m)}) should beat 4-leaf depthwise (${mse(depthwise)})")
  }

  test("oblivious growth: every level shares one (feature, threshold)") {
    // 2-feature interaction data where depthwise would pick different
    // level-2 splits per node; oblivious must not
    val df = (1 to 200).map { i =>
      val a = (i % 10).toDouble; val b = (i / 10 % 10).toDouble
      (Vectors.dense(a, b), a * 3 + b * b + (if (a > 4 && b < 5) 7.0 else 0.0))
    }.toDF("features", "label")
    val m = new HistGBRegressor().setNumRounds(8).setMaxDepth(3)
      .setGrowthPolicy("oblivious").setStepSize(0.5).fit(df)
    modelTrees(m).foreach { t =>
      // BFS levels from the root; internal nodes per level must agree
      var level = Seq(0)
      while (level.nonEmpty) {
        val internal = level.filter(i => t(i * 5) >= 0)
        val pairs = internal.map(i => (t(i * 5), t(i * 5 + 1))).distinct
        assert(pairs.size <= 1,
          s"oblivious level carries ${pairs.size} distinct splits: $pairs")
        level = internal.flatMap(i => Seq(t(i * 5 + 2).toInt, t(i * 5 + 3).toInt))
      }
    }
    // and it still learns the surface
    val mse = df.collect().map { r =>
      val d = m.predict(r.getAs[org.apache.spark.ml.linalg.Vector](0)) - r.getDouble(1)
      d * d
    }.sum / 200
    assert(mse < 20.0, s"oblivious fit too weak: mse $mse")
  }

  test("leafwise with an unbinding budget equals depthwise prediction-for-prediction") {
    // a node's best split depends only on its own rows, so growth ORDER
    // cannot change the final tree once the leaf budget stops binding:
    // numLeaves = 2^maxDepth admits every positive-gain split depthwise
    // would make. Node ids differ (level-order vs split-order), so the
    // invariant is checked on predictions, which is what matters.
    val df = (1 to 300).map { i =>
      val a = (i % 17).toDouble; val b = (i % 23).toDouble
      (Vectors.dense(a, b), math.sin(a) * 5 + b * 0.7 + (i % 3))
    }.toDF("features", "label")
    val lw = new HistGBRegressor().setNumRounds(4).setMaxDepth(4)
      .setGrowthPolicy("leafwise").setNumLeaves(16).setStepSize(0.3).fit(df)
    val dw = new HistGBRegressor().setNumRounds(4).setMaxDepth(4)
      .setStepSize(0.3).fit(df)
    df.collect().foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector](0)
      assert(math.abs(lw.predict(v) - dw.predict(v)) < 1e-9,
        s"policies diverge at $v: ${lw.predict(v)} vs ${dw.predict(v)}")
    }
  }

  test("catboost/lightgbm knob spellings reach the estimator") {
    val df = (1 to 120).map(i => (i.toDouble, (i % 5).toDouble, 2.0 * i + (i % 5)))
      .toDF("a", "b", "target")
    def fitR2(alg: String, hp: Map[String, String]): Double = {
      val cat = new Catalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft_hgbk_$alg").toString)
      Train.train(spark, cat, Train.TrainConfig(
        projectName = s"HGBK_$alg", task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("target"), algorithm = alg,
        hyperparams = hp, testSampling = "random", orderCols = Seq("a")))
      cat.models.collect().head.metrics("r2")
    }
    // catboost spellings: iterations / depth / l2_leaf_reg
    assert(fitR2("catboost", Map("iterations" -> "10", "depth" -> "4",
      "l2_leaf_reg" -> "1.0")) > 0.9)
    // lightgbm spellings: num_leaves, unbounded max_depth default
    assert(fitR2("lightgbm", Map("n_estimators" -> "10",
      "num_leaves" -> "15")) > 0.9)
  }

  test("Train dispatch: multiclass xgboost classification (GBT could not)") {
    // per-row distinct features: the train/test hash split operates on
    // whole rows, so duplicate-row data would hold out entire points
    val df = (1 to 150).map { i =>
      val c = i % 3
      (c * 5.0 + (i % 31) * 0.02, i * 0.01, c.toDouble)
    }.toDF("a", "b", "target")
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_hgb_mc").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "HGB_mc", task = "classification", relationName = "t",
      data = Some(df), yColumn = Seq("target"), algorithm = "xgboost",
      hyperparams = Map("n_estimators" -> "12", "max_depth" -> "3"),
      testSampling = "stratified", orderCols = Seq("a")))
    val m = cat.models.collect().head
    assert(m.metrics("f1") > 0.9, s"multiclass f1 = ${m.metrics("f1")}")
  }

  test("model save/load round-trips through pipeline persistence") {
    val df = (1 to 80).map(i => (Vectors.dense(i.toDouble), i * 2.0))
      .toDF("features", "label")
    val m = new HistGBRegressor().setNumRounds(5).setMaxDepth(3).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_hgb_io").toString + "/m"
    m.save(dir)
    val back = HistGBRegressionModel.load(dir)
    val v = Vectors.dense(37.0)
    assert(math.abs(back.predict(v) - m.predict(v)) < 1e-12)
  }

  test("bounded-size driver route equals the distributed route " +
      "prediction-for-prediction (r20 route-by-size optimization)") {
    // non-trivial shape: two features, noisy-ish target, multiple
    // rounds/depths so histogram totals and split ties are exercised
    val data = (1 to 300).map { i =>
      val x = i / 25.0
      (Vectors.dense(x, (i % 5).toDouble), math.cos(x) * 2 + (i % 5) * 0.5)
    }.toDF("features", "label")
    val local = new HistGBRegressor().setNumRounds(12).setMaxDepth(4)
      .setStepSize(0.3).fit(data) // n=300 <= default 65536 cap → driver route
    spark.conf.set("spark.graft.hgbLocalFitRows", "0") // force distributed
    try {
      val dist = new HistGBRegressor().setNumRounds(12).setMaxDepth(4)
        .setStepSize(0.3).fit(data)
      val probe = Seq(0.4, 3.7, 7.2, 11.9).map(x => Vectors.dense(x, (x * 3 % 5).floor))
      probe.foreach { v =>
        assert(math.abs(local.predict(v) - dist.predict(v)) < 1e-6,
          s"route divergence at $v: ${local.predict(v)} vs ${dist.predict(v)}")
      }
      // identical tree STRUCTURE, not just close predictions: the two
      // routes accumulate the same (g,h) values (order aside), so every
      // split decision should agree on this well-separated fixture
      assert(local.getOrDefault(local.treeOffsets).toSeq ==
        dist.getOrDefault(dist.treeOffsets).toSeq)
    } finally spark.conf.unset("spark.graft.hgbLocalFitRows")
  }
}
