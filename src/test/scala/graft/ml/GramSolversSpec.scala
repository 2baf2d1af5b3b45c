package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Functional recovery tests for the Gram-solver family — each solver
  * must recover a known generating model from synthetic data, which is
  * the behavioral contract (the reference's sklearn bindings are not
  * available to diff against in this container). */
class GramSolversSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assemble(df: DataFrame, cols: Seq[String]): DataFrame =
    new VectorAssembler().setInputCols(cols.toArray).setOutputCol("features")
      .transform(df)

  /** y = 3x + 7 with deterministic small noise. */
  private lazy val line: DataFrame = {
    val rnd = new scala.util.Random(7)
    assemble((1 to 200).map { i =>
      val x = i / 20.0
      (x, 3.0 * x + 7.0 + rnd.nextGaussian() * 0.05)
    }.toDF("x", "y"), Seq("x"))
  }

  private def fit(solver: String, df: DataFrame,
      tune: GramRegression => GramRegression = identity): GraftLinearModel =
    tune(new GramRegression().setSolver(solver))
      .setLabelCol("y").setFeaturesCol("features").fit(df)

  test("bayesian_ridge recovers the generating line") {
    val m = fit("bayesian_ridge", line)
    assert(math.abs(m.coeffs(0) - 3.0) < 0.02, m.coeffs)
    assert(math.abs(m.intercept - 7.0) < 0.1, m.intercept)
  }

  test("ard shrinks irrelevant features and keeps the true one") {
    val rnd = new scala.util.Random(11)
    val df = assemble((1 to 300).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val x3 = rnd.nextGaussian(); val x4 = rnd.nextGaussian()
      (x1, x2, x3, x4, 5.0 * x1 + 1.0 + rnd.nextGaussian() * 0.05)
    }.toDF("x1", "x2", "x3", "x4", "y"), Seq("x1", "x2", "x3", "x4"))
    val m = fit("ard", df)
    assert(math.abs(m.coeffs(0) - 5.0) < 0.05, m.coeffs)
    (1 to 3).foreach(i => assert(math.abs(m.coeffs(i)) < 0.05,
      s"irrelevant feature $i not shrunk: ${m.coeffs}"))
  }

  test("omp selects the true sparse support") {
    val rnd = new scala.util.Random(13)
    val df = assemble((1 to 300).map { _ =>
      val xs = Array.fill(6)(rnd.nextGaussian())
      (xs(0), xs(1), xs(2), xs(3), xs(4), xs(5),
        4.0 * xs(1) - 2.0 * xs(4) + rnd.nextGaussian() * 0.05)
    }.toDF("a", "b", "c", "d", "e", "f", "y"), Seq("a", "b", "c", "d", "e", "f"))
    val m = fit("omp", df, _.setNNonzero(2))
    val nz = m.coeffs.toArray.zipWithIndex.filter(x => math.abs(x._1) > 1e-6).map(_._2)
    assert(nz.toSet == Set(1, 4), s"support ${nz.toSeq}, coeffs ${m.coeffs}")
    assert(math.abs(m.coeffs(1) - 4.0) < 0.05 && math.abs(m.coeffs(4) + 2.0) < 0.05)
  }

  test("lars at full saturation equals OLS; lasso_lars at high alpha is null") {
    val rnd = new scala.util.Random(17)
    val df = assemble((1 to 300).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (x1, x2, 2.0 * x1 - 3.0 * x2 + 0.5 + rnd.nextGaussian() * 0.05)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
    val m = fit("lars", df, _.setNNonzero(2))
    assert(math.abs(m.coeffs(0) - 2.0) < 0.05 && math.abs(m.coeffs(1) + 3.0) < 0.05,
      m.coeffs)
    val sparse = fit("lasso_lars", df, _.setAlpha(1e6))
    assert(sparse.coeffs.toArray.forall(c => math.abs(c) < 1e-9), sparse.coeffs)
    // small alpha ≈ OLS
    val dense = fit("lasso_lars", df, _.setAlpha(1e-4))
    assert(math.abs(dense.coeffs(0) - 2.0) < 0.1 && math.abs(dense.coeffs(1) + 3.0) < 0.1,
      dense.coeffs)
  }

  test("ransac recovers the line under 30% gross outliers where OLS breaks") {
    val rnd = new scala.util.Random(19)
    val df = assemble((1 to 300).map { i =>
      val x = i / 30.0
      val y = if (i % 10 < 3) 200.0 + rnd.nextGaussian() // gross outliers
              else 3.0 * x + 7.0 + rnd.nextGaussian() * 0.05
      (x, y)
    }.toDF("x", "y"), Seq("x"))
    val m = fit("ransac", df)
    assert(math.abs(m.coeffs(0) - 3.0) < 0.1, m.coeffs)
    assert(math.abs(m.intercept - 7.0) < 0.5, m.intercept)
  }

  test("ransac fits a constant-label dataset (MAD = 0) like sklearn") {
    // MAD of a constant y is 0; the threshold floor must still admit
    // the (ridge-jittered) exact minimal fits as inliers
    val df = assemble((1 to 60).map(i => (i / 6.0, 5.0)).toDF("x", "y"), Seq("x"))
    val m = fit("ransac", df)
    assert(math.abs(m.intercept - 5.0) < 1e-3, m.intercept)
    assert(math.abs(m.coeffs(0)) < 1e-3, m.coeffs)
  }

  test("omp default nNonzero tolerates a leading null-features row") {
    import spark.implicits._
    val good = (1 to 50).map(i =>
      (org.apache.spark.ml.linalg.Vectors.dense(i / 5.0, (i % 7).toDouble),
        3.0 * (i / 5.0) + 7.0))
    val df = ((null.asInstanceOf[org.apache.spark.ml.linalg.Vector], 0.0) +: good)
      .toDF("features", "y")
    val m = new GramRegression().setSolver("omp")
      .setLabelCol("y").setFeaturesCol("features").fit(df)
    assert(math.abs(m.coeffs(0) - 3.0) < 0.1, m.coeffs)
  }

  test("theil_sen is robust to the same outliers") {
    val rnd = new scala.util.Random(23)
    val df = assemble((1 to 300).map { i =>
      val x = i / 30.0
      val y = if (i % 10 < 3) 200.0 + rnd.nextGaussian()
              else 3.0 * x + 7.0 + rnd.nextGaussian() * 0.05
      (x, y)
    }.toDF("x", "y"), Seq("x"))
    val m = fit("theil_sen", df)
    assert(math.abs(m.coeffs(0) - 3.0) < 0.4, m.coeffs)
    assert(math.abs(m.intercept - 7.0) < 1.5, m.intercept)
  }

  test("quantile regression: residual mass below the fit tracks tau") {
    val rnd = new scala.util.Random(29)
    val df = assemble((1 to 500).map { i =>
      val x = i / 50.0
      (x, 2.0 * x + 1.0 + math.abs(rnd.nextGaussian()) * 2.0) // one-sided noise
    }.toDF("x", "y"), Seq("x"))
    val m = fit("quantile", df, _.setQuantileTau(0.9).setAlpha(1e-4))
    val below = df.collect().count { r =>
      r.getDouble(1) <= m.coeffs(0) * r.getDouble(0) + m.intercept
    }.toDouble / 500.0
    assert(math.abs(below - 0.9) < 0.08, s"P(y <= fit) = $below, want ~0.9")
  }

  test("quantile_exact: LP optimum beats IRLS on the pinball objective and is a vertex") {
    val rnd = new scala.util.Random(43)
    val df = assemble((1 to 300).map { i =>
      val x = i / 30.0
      (x, 2.0 * x + 1.0 + math.abs(rnd.nextGaussian()) * 2.0) // one-sided noise
    }.toDF("x", "y"), Seq("x"))
    val tau = 0.9
    def pinball(co: Double, ic: Double): Double = df.collect().map { r =>
      val u = r.getDouble(1) - (co * r.getDouble(0) + ic)
      if (u >= 0) tau * u else (tau - 1.0) * u
    }.sum
    val exact = fit("quantile_exact", df, _.setQuantileTau(tau).setAlpha(1e-9))
    val irls = fit("quantile", df, _.setQuantileTau(tau).setAlpha(1e-9))
    val exObj = pinball(exact.coeffs(0), exact.intercept)
    val irObj = pinball(irls.coeffs(0), irls.intercept)
    // the LP optimum is THE minimizer — never worse than the IRLS fixpoint
    assert(exObj <= irObj + 1e-8, s"LP $exObj vs IRLS $irObj")
    // vertex property: the optimal plane interpolates >= p+1 = 2 points
    val onPlane = df.collect().count { r =>
      math.abs(r.getDouble(1) - (exact.coeffs(0) * r.getDouble(0) + exact.intercept)) < 1e-8
    }
    assert(onPlane >= 2, s"basic solution must interpolate p+1 points, got $onPlane")
    // subgradient count condition: P(y < fit) <= tau <= P(y <= fit)
    val below = df.collect().count { r =>
      r.getDouble(1) < exact.coeffs(0) * r.getDouble(0) + exact.intercept - 1e-8
    } / 300.0
    val belowEq = df.collect().count { r =>
      r.getDouble(1) <= exact.coeffs(0) * r.getDouble(0) + exact.intercept + 1e-8
    } / 300.0
    assert(below <= tau + 1e-9 && tau <= belowEq + 1e-9,
      s"subgradient violated: P(y<fit)=$below tau=$tau P(y<=fit)=$belowEq")
  }

  test("quantile_exact: median regression shrugs off a gross outlier; cap routes") {
    // y = 2x except one wild point — the tau=0.5 LP pins the clean line
    val df = assemble(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
      (5.0, 100.0)).toDF("x", "y"), Seq("x"))
    val m = fit("quantile_exact", df, _.setQuantileTau(0.5).setAlpha(1e-9))
    assert(math.abs(m.coeffs(0) - 2.0) < 1e-6 && math.abs(m.intercept) < 1e-6,
      s"${m.coeffs} + ${m.intercept}")
    val e = intercept[IllegalArgumentException] {
      fit("quantile_exact", df, _.setMaxRows(3))
    }
    assert(e.getMessage.contains("IRLS"), e.getMessage)
    // dispatch: exact=true picks the LP, records no compat flag
    val est = Train.estimatorFor("regression", "quantile",
      Map("exact" -> "true", "quantile" -> "0.7"), seed = 1L)
    assert(est.asInstanceOf[GramRegression].getOrDefault(
      est.asInstanceOf[GramRegression].solver) == "quantile_exact")
  }

  test("passive_aggressive: regression tracks the line, classification separates") {
    val m = fit("passive_aggressive", line)
    assert(math.abs(m.coeffs(0) - 3.0) < 0.5, m.coeffs)
    val rnd = new scala.util.Random(31)
    val cls = assemble((1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (x1, x2, if (x1 + x2 > 0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
    val mc = fit("passive_aggressive_binary", cls)
    val acc = mc.transform(cls).filter($"prediction" === $"y").count() / 400.0
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("pa_sequential: true online PA beats the partition average, is deterministic, caps") {
    // sequential updates see every row with the CURRENT weights — on a
    // clean line the online fit converges tighter than the averaged one
    val m = fit("pa_sequential", line, _.setMaxIter(1000).setTol(1e-4))
    assert(math.abs(m.coeffs(0) - 3.0) < 0.1, m.coeffs)
    assert(math.abs(m.intercept - 7.0) < 0.6, m.intercept)
    // deterministic: same seed → bit-identical coefficients
    val m2 = fit("pa_sequential", line, _.setMaxIter(1000).setTol(1e-4))
    assert(m.coeffs.toArray.sameElements(m2.coeffs.toArray) &&
      m.intercept == m2.intercept)
    // classification twin separates
    val rnd = new scala.util.Random(37)
    val cls = assemble((1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (x1, x2, if (x1 - x2 > 0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
    val mc = fit("pa_sequential_binary", cls)
    val acc = mc.transform(cls).filter($"prediction" === $"y").count() / 400.0
    assert(acc > 0.95, s"sequential accuracy $acc")
    // guard-and-route: past the cap the error names the distributed path
    val e = intercept[IllegalArgumentException] {
      fit("pa_sequential", line, _.setMaxRows(10))
    }
    assert(e.getMessage.contains("partition-averaged"), e.getMessage)
  }

  test("perceptron_sequential: classic mistake-driven updates separate, cap routes") {
    val rnd = new scala.util.Random(41)
    val cls = assemble((1 to 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (x1, x2, if (2 * x1 + x2 > 0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
    val m = fit("perceptron_sequential", cls)
    val acc = m.transform(cls).filter($"prediction" === $"y").count() / 400.0
    assert(acc > 0.95, s"perceptron accuracy $acc")
    val e = intercept[IllegalArgumentException] {
      fit("perceptron_sequential", cls, _.setMaxRows(10))
    }
    assert(e.getMessage.contains("logistic"), e.getMessage)
  }

  test("Train dispatch: passive_aggressive exact=true is sequential and flag-free") {
    val est = Train.estimatorFor("regression", "passive_aggressive",
      Map("exact" -> "true"), seed = 1L)
    assert(est.asInstanceOf[GramRegression].getOrDefault(
      est.asInstanceOf[GramRegression].solver) == "pa_sequential")
    val cls = Train.estimatorFor("classification", "passive_aggressive",
      Map("exact" -> "true"), seed = 1L)
    assert(cls.asInstanceOf[GramRegression].getOrDefault(
      cls.asInstanceOf[GramRegression].solver) == "pa_sequential_binary")
  }

  test("GraftLinearModel round-trips through Pipeline persistence") {
    val pipe = new Pipeline().setStages(Array(
      new GramRegression().setSolver("bayesian_ridge")
        .setLabelCol("y").setFeaturesCol("features")))
    val model = pipe.fit(line)
    val dir = java.nio.file.Files.createTempDirectory("graft_gram").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(line).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(line).select("prediction").collect().map(_.getDouble(0))
    assert(a.sameElements(b))
  }

  test("gaussian_process (RFF + bayesian ridge) fits a nonlinearity plain linear cannot") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_gp").toString)
    val df = (0 until 400).map { i =>
      val x = i / 400.0 * 3.0
      (x, math.sin(2.0 * x))
    }.toDF("x", "y")
    def r2Of(alg: String, proj: String): Double = {
      Train.train(spark, cat, Train.TrainConfig(
        projectName = proj, task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("y"), algorithm = alg,
        testSampling = "random", orderCols = Seq("x")))
      cat.models.collect().filter(_.algorithm == alg).map(_.metrics("r2")).max
    }
    val gp = r2Of("gaussian_process", "GP")
    val lin = r2Of("linear", "Lin")
    assert(gp > 0.95, s"GP r2=$gp")
    assert(gp > lin + 0.2, s"GP r2=$gp should beat linear r2=$lin on sin(2x)")
  }

  test("Train.train lifecycle runs the gram algorithms end to end") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_gramtrain").toString)
    val df = (1 to 200).map(i => (i / 20.0, 3.0 * (i / 20.0) + 7.0)).toDF("x", "y")
    Seq("bayesian_ridge", "orthogonal_matching_pursuit", "theil_sen").foreach { alg =>
      val out = Train.train(spark, cat, Train.TrainConfig(
        projectName = s"Gram_$alg", task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("y"), algorithm = alg,
        testSampling = "random", orderCols = Seq("x")))
      val r2 = cat.models.collect()
        .filter(m => m.algorithm == alg).map(_.metrics("r2")).max
      assert(r2 > 0.99, s"$alg r2=$r2")
    }
  }
}
