package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functional contracts for the exact SMO kernel machines: the solver
  * must reach the dual optimum (KKT checks), the SVC must separate
  * what its kernel can separate, and the SVR must honor the ε-tube
  * semantics (inside-tube points carry zero dual weight) — the
  * behavioral fingerprints of the exact losses, checkable without
  * sklearn in the container. */
class SvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assemble(df: DataFrame, cols: Seq[String]): DataFrame =
    new VectorAssembler().setInputCols(cols.toArray).setOutputCol("features")
      .transform(df)

  test("SmoSolver solves a hand-checkable 2-point SVC exactly") {
    // two points x=0 (y=-1), x=1 (y=+1), linear kernel. Dual:
    // max α₁+α₂ − ½(α₂)²·1 with α₁=α₂ (equality), so f(α)=2α−½α²,
    // optimum α=2 if C allows; with C=1 the box binds at α=1.
    val k = Array(Array(0.0, 0.0), Array(0.0, 1.0))
    val y = Array(-1.0, 1.0)
    def qRow(i: Int) = Array.tabulate(2)(j => y(i) * y(j) * k(i)(j))
    val unb = SmoSolver.solve(2, qRow, Array(-1.0, -1.0), y, 10.0, 1e-6)
    assert(math.abs(unb.alpha(0) - 2.0) < 1e-3 &&
      math.abs(unb.alpha(1) - 2.0) < 1e-3, unb.alpha.toSeq)
    val boxed = SmoSolver.solve(2, qRow, Array(-1.0, -1.0), y, 1.0, 1e-6)
    assert(math.abs(boxed.alpha(0) - 1.0) < 1e-9 &&
      math.abs(boxed.alpha(1) - 1.0) < 1e-9, boxed.alpha.toSeq)
  }

  /** Ring vs core — rbf-separable, linearly inseparable. */
  private lazy val circles: DataFrame = {
    val rows = (0 until 200).map { i =>
      val th = i * 2 * math.Pi / 200
      val r = if (i % 2 == 0) 1.0 else 3.0
      (r * math.cos(th), r * math.sin(th), if (i % 2 == 0) 0.0 else 1.0)
    }
    assemble(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"))
  }

  test("exact rbf SVC separates circles and satisfies the dual KKT") {
    val m = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setLabelCol("y").setFeaturesCol("features").fit(circles)
    val acc = m.transform(circles)
      .filter(col("prediction") === col("y")).count() / 200.0
    assert(acc >= 0.99, s"rbf SVC accuracy $acc")
    // dual feasibility: Σ coef = Σ yᵢαᵢ = 0 (equality constraint) and
    // every |coef| ≤ C (box)
    val coefs = m.machines.head.dual
    assert(math.abs(coefs.sum) < 1e-6, s"sum ${coefs.sum}")
    assert(coefs.forall(c => math.abs(c) <= 1.0 + 1e-9))
  }

  test("exact SVC maps predictions back to the original class labels") {
    val df = assemble(Seq(
      (-2.0, 3.0), (-1.5, 3.0), (-1.8, 3.0),
      (2.0, 7.0), (1.5, 7.0), (1.8, 7.0)).toDF("x", "y"), Seq("x"))
    val m = new GraftSvm().setSvmTask("svc").setKernel("linear")
      .setLabelCol("y").setFeaturesCol("features").fit(df)
    val preds = m.transform(df).select("prediction")
      .collect().map(_.getDouble(0)).toSet
    assert(preds == Set(3.0, 7.0), preds)
  }

  test("exact linear SVR honors the eps-tube: near-exact fit, sparse duals") {
    // exact line, generous tube: the optimum fits inside the tube and
    // strictly-inside points must carry ZERO dual weight — the defining
    // fingerprint of the ε-insensitive loss (squared loss would weight
    // every point)
    val df = assemble((1 to 60).map { i =>
      val x = i / 10.0; (x, 2.0 * x + 1.0)
    }.toDF("x", "y"), Seq("x"))
    val m = new GraftSvm().setSvmTask("svr").setKernel("linear")
      .setRegC(100.0).setEpsilon(0.5).setTol(1e-6)
      .setLabelCol("y").setFeaturesCol("features").fit(df)
    val errs = m.transform(df)
      .select(abs(col("prediction") - col("y")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(errs <= 0.5 + 1e-3, s"max |residual| $errs exceeds the tube")
    // support sparsity: with the line representable inside the tube,
    // only a handful of boundary points stay active
    val nsv = m.machines.head.dual.length
    assert(nsv <= 10, s"$nsv support vectors for an in-tube line")
  }

  test("rbf SVR fits a sine the linear kernel cannot") {
    val df = assemble((0 until 120).map { i =>
      val x = i / 20.0; (x, math.sin(x))
    }.toDF("x", "y"), Seq("x"))
    def mse(kernel: String): Double = {
      val m = new GraftSvm().setSvmTask("svr").setKernel(kernel)
        .setRegC(10.0).setEpsilon(0.05)
        .setLabelCol("y").setFeaturesCol("features").fit(df)
      m.transform(df).select(pow(col("prediction") - col("y"), 2).as("e"))
        .agg(avg(col("e"))).head().getDouble(0)
    }
    assert(mse("rbf") < 0.01, s"rbf mse ${mse("rbf")}")
    assert(mse("rbf") < mse("linear") / 10)
  }

  test("nu-SVC: the nu-property bounds SV and margin-error fractions") {
    // overlapping Gaussians so margin errors genuinely exist — the
    // nu-property (Schölkopf): #margin-errors ≤ ν·l ≤ #SVs at optimum
    val rnd = new scala.util.Random(11)
    val n = 200
    val df = assemble((0 until n).map { i =>
      val cls = i % 2
      (rnd.nextGaussian() + (if (cls == 0) -1.5 else 1.5),
        rnd.nextGaussian(), cls.toDouble)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
    val nuV = 0.3
    val m = new GraftSvm().setSvmTask("nusvc").setNu(nuV).setKernel("rbf")
      .setTol(1e-4).setLabelCol("y").setFeaturesCol("features").fit(df)
    val nsv = m.machines.head.dual.length
    assert(nsv + 1 >= nuV * n, s"SV count $nsv below the nu lower bound")
    // margin errors: after the 1/ρ rescale the margin is 1, so an error
    // is y_signed·f(x) < 1 − slack-tolerance
    val rows = df.select("features", "y").collect()
    val merr = rows.count { r =>
      val f = m.decision(r.getAs[org.apache.spark.ml.linalg.Vector](0))
      val ys = if (r.getDouble(1) == 1.0) 1.0 else -1.0
      ys * f < 1.0 - 1e-6
    }
    assert(merr <= nuV * n + 1, s"margin errors $merr exceed the nu upper bound")
    // and it still classifies well
    val acc = m.transform(df).filter(col("prediction") === col("y")).count() / n.toDouble
    assert(acc > 0.9, s"nu-SVC accuracy $acc")
  }

  test("nu-SVC: infeasible nu names the class-count bound") {
    // 10% positive class: nu = 0.5 needs nu*l/2 = 25 per class > 10
    val df = assemble((0 until 100).map(i =>
      (i.toDouble, if (i < 10) 1.0 else 0.0)).toDF("x", "y"), Seq("x"))
    val e = intercept[IllegalArgumentException] {
      new GraftSvm().setSvmTask("nusvc").setNu(0.5)
        .setLabelCol("y").setFeaturesCol("features").fit(df)
    }
    assert(e.getMessage.contains("infeasible"), e.getMessage)
  }

  test("nu-SVR: fits a sine with at least nu*l support vectors") {
    val n = 120
    val df = assemble((0 until n).map { i =>
      val x = i / 20.0; (x, math.sin(x))
    }.toDF("x", "y"), Seq("x"))
    val nuV = 0.4
    val m = new GraftSvm().setSvmTask("nusvr").setNu(nuV).setRegC(10.0)
      .setKernel("rbf").setTol(1e-4)
      .setLabelCol("y").setFeaturesCol("features").fit(df)
    val nsv = m.machines.head.dual.length
    assert(nsv + 1 >= nuV * n, s"SV count $nsv below the nu lower bound")
    val mse = m.transform(df).select(pow(col("prediction") - col("y"), 2).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    assert(mse < 0.01, s"nu-SVR mse $mse")
  }

  test("guards: row cap routes to RFF") {
    val big = assemble((1 to 30).map(i => (i.toDouble, i % 2 * 1.0))
      .toDF("x", "y"), Seq("x"))
    val e1 = intercept[IllegalArgumentException] {
      new GraftSvm().setMaxRows(10).setLabelCol("y")
        .setFeaturesCol("features").fit(big)
    }
    assert(e1.getMessage.contains("RFF"))
  }

  /** Three well-separated Gaussian blobs (3-class one-vs-one exercise). */
  private lazy val blobs: DataFrame = {
    val rnd = new scala.util.Random(7)
    val centers = Seq((0.0, 0.0), (6.0, 0.0), (3.0, 6.0))
    assemble((0 until 240).map { i =>
      val c = i % 3
      (centers(c)._1 + rnd.nextGaussian() * 0.6,
        centers(c)._2 + rnd.nextGaussian() * 0.6, c.toDouble)
    }.toDF("x1", "x2", "y"), Seq("x1", "x2"))
  }

  test("one-vs-one multiclass SVC: 3 machines, votes recover 3 blobs") {
    val m = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setLabelCol("y").setFeaturesCol("features").fit(blobs)
    assert(m.machines.length == 3, s"${m.machines.length} machines for 3 classes")
    // each machine separates a distinct sorted class pair
    val pairs = m.machines.map(mm => (mm.classNeg, mm.classPos)).toSet
    assert(pairs == Set((0.0, 1.0), (0.0, 2.0), (1.0, 2.0)), pairs)
    val acc = m.transform(blobs)
      .filter(col("prediction") === col("y")).count() / 240.0
    assert(acc >= 0.99, s"OvO accuracy $acc")
  }

  test("one-vs-one machines are bit-identical at any fit parallelism (r21 FitPool)") {
    def fit() = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setProbability(true).setLabelCol("y").setFeaturesCol("features").fit(blobs)
    spark.conf.set("spark.graft.svmFitParallelism", "1")
    val seq = try fit() finally spark.conf.unset("spark.graft.svmFitParallelism")
    spark.conf.set("spark.graft.svmFitParallelism", "4")
    val par = try fit() finally spark.conf.unset("spark.graft.svmFitParallelism")
    assert(seq.machines.length == par.machines.length)
    seq.machines.zip(par.machines).foreach { case (a, b) =>
      assert(a.classNeg == b.classNeg && a.classPos == b.classPos)
      assert(a.supportFlat.sameElements(b.supportFlat))
      assert(a.dual.sameElements(b.dual))
      assert(a.intercept == b.intercept)
      assert(a.plattA == b.plattA && a.plattB == b.plattB)
    }
  }

  test("one-vs-one multiclass nu-SVC votes recover 3 blobs") {
    val m = new GraftSvm().setSvmTask("nusvc").setNu(0.2).setKernel("rbf")
      .setLabelCol("y").setFeaturesCol("features").fit(blobs)
    assert(m.machines.length == 3)
    val acc = m.transform(blobs)
      .filter(col("prediction") === col("y")).count() / 240.0
    assert(acc >= 0.99, s"OvO nu-SVC accuracy $acc")
  }

  test("probability=true: Platt sigmoid is calibrated-monotone in the decision") {
    val m = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setProbability(true)
      .setLabelCol("y").setFeaturesCol("features").fit(circles)
    val rows = circles.select("features", "y").collect()
    val scored = rows.map { r =>
      val f = r.getAs[org.apache.spark.ml.linalg.Vector](0)
      (m.decision(f), m.probability(f), r.getDouble(1))
    }
    // probabilities are valid and sum to 1
    scored.foreach { case (_, p, _) =>
      assert(p.length == 2 && p.forall(v => v >= 0 && v <= 1))
      assert(math.abs(p.sum - 1.0) < 1e-12)
    }
    // P(class1) is monotone in the decision value (sigmoid property)
    val byDec = scored.sortBy(_._1).map(_._2(1))
    assert(byDec.zip(byDec.tail).forall { case (a, b) => b >= a - 1e-12 },
      "P(class1) must be nondecreasing in the decision value")
    // and it separates: mean P(class1) over true class-1 rows far above
    // the mean over class-0 rows
    val p1 = scored.filter(_._3 == 1.0).map(_._2(1))
    val p0 = scored.filter(_._3 == 0.0).map(_._2(1))
    assert(p1.sum / p1.length > 0.8 && p0.sum / p0.length < 0.2,
      s"calibration: mean P1 ${p1.sum / p1.length}, mean P0 ${p0.sum / p0.length}")
  }

  test("probability without the flag is refused") {
    val m = new GraftSvm().setSvmTask("svc")
      .setLabelCol("y").setFeaturesCol("features").fit(circles)
    val e = intercept[IllegalArgumentException] {
      m.probability(org.apache.spark.ml.linalg.Vectors.dense(1.0, 1.0))
    }
    assert(e.getMessage.contains("probability=true"), e.getMessage)
  }

  test("multiclass predict_proba couples pairwise Platt sigmoids (Wu-Lin-Weng)") {
    val m = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setProbability(true)
      .setLabelCol("y").setFeaturesCol("features").fit(blobs)
    val rows = blobs.select("features", "y").collect()
    var agree = 0
    rows.foreach { r =>
      val f = r.getAs[org.apache.spark.ml.linalg.Vector](0)
      val p = m.probability(f)
      // a valid 3-class distribution
      assert(p.length == 3 && p.forall(v => v >= 0 && v <= 1), p.toSeq)
      assert(math.abs(p.sum - 1.0) < 1e-6, s"sum ${p.sum}")
      // coupled argmax recovers the true blob (labels are 0,1,2 = index)
      if (p.indexOf(p.max).toDouble == r.getDouble(1)) agree += 1
    }
    assert(agree >= (rows.length * 0.97).toInt,
      s"proba argmax accuracy ${agree.toDouble / rows.length}")
  }

  test("model persists machines as a Parquet data file and round-trips") {
    val m = new GraftSvm().setSvmTask("svc").setKernel("rbf").setRegC(1.0)
      .setProbability(true)
      .setLabelCol("y").setFeaturesCol("features").fit(circles)
    val dir = java.nio.file.Files.createTempDirectory("graft_svm_rt").toString
    val path = s"$dir/svm_model"
    m.write.overwrite().save(path)
    // the data file is Parquet (the MLWritable data/ convention), not a
    // JSON param blob — ADVICE r8: a 2000×p SV matrix in one JSON line
    assert(new java.io.File(s"$path/data").exists(), "data/ dir missing")
    assert(new java.io.File(s"$path/metadata").exists(), "metadata/ missing")
    val loaded = GraftSvmModel.load(path)
    assert(loaded.machines.length == m.machines.length)
    assert(loaded.machines.head.hasPlatt)
    val probe = circles.select("features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    probe.take(50).foreach { v =>
      assert(math.abs(loaded.decision(v) - m.decision(v)) < 1e-12)
      assert(math.abs(loaded.probability(v)(1) - m.probability(v)(1)) < 1e-12)
      assert(loaded.predict(v) == m.predict(v))
    }
  }

  test("train() dispatch: nu_svm exact precedes the RFF fallback case") {
    // regression nu_svm shares a match case with kernel_ridge for the
    // RFF route — the exact=true case must fire FIRST or the opt-in
    // silently trains the approximation with a compat flag
    val est = Train.estimatorFor("regression", "nu_svm",
      Map("exact" -> "true", "nu" -> "0.4"), seed = 1L)
    assert(est.isInstanceOf[GraftSvm], est.getClass.getName)
    assert(est.asInstanceOf[GraftSvm].getOrDefault(
      est.asInstanceOf[GraftSvm].svmTask) == "nusvr")
    val cls = Train.estimatorFor("classification", "nu_svm",
      Map("exact" -> "true"), seed = 1L)
    assert(cls.isInstanceOf[GraftSvm])
  }

  test("train() dispatch: GP classification refuses exact=true by policy") {
    // the exactness ledger must never show a flag-free model that
    // actually ran an approximation: GP classification has no exact
    // posterior (Laplace is itself approximate), so exact=true errors
    val e = intercept[IllegalArgumentException] {
      Train.estimatorFor("classification", "gaussian_process",
        Map("exact" -> "true"), seed = 1L)
    }
    assert(e.getMessage.contains("Laplace"), e.getMessage)
    // the flagged RFF route stays available without the flag
    assert(Train.estimatorFor("classification", "gaussian_process",
      Map.empty, seed = 1L).isInstanceOf[org.apache.spark.ml.Pipeline])
  }

  test("train() dispatch: regression linear_svm = LinearSVR semantics") {
    // exact=true → linear-kernel ε-SVR through the capped SMO
    val exact = Train.estimatorFor("regression", "linear_svm",
      Map("exact" -> "true"), seed = 1L)
    assert(exact.isInstanceOf[GraftSvm])
    val g = exact.asInstanceOf[GraftSvm]
    assert(g.getOrDefault(g.svmTask) == "svr" && g.getOrDefault(g.kernel) == "linear")
    // default → squared-loss substitute (compat-flagged in train())
    assert(Train.estimatorFor("regression", "linear_svm", Map.empty, seed = 1L)
      .isInstanceOf[org.apache.spark.ml.regression.LinearRegression])
    // lifecycle: the flag lands in hyperparams
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_lsvr").toString)
    import spark.implicits._
    val df = (1 to 80).map(i => (i.toDouble, 3.0 * i + 2.0)).toDF("x", "y")
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "Lsvr", task = "regression", relationName = "t",
      data = Some(df), yColumn = Seq("y"), algorithm = "linear_svm"))
    assert(cat.models.collect().head.hyperparams.get("compat")
      .contains("squared_loss_svr"))
  }

  test("train() dispatch: classification linear_svm refuses exact=true by policy") {
    // sklearn LinearSVC is squared-hinge liblinear; neither MLlib's
    // hinge LinearSVC nor the softmax substitute is scheme-exact, so
    // exact=true must refuse rather than let an approximation reach
    // the ledger flag-free (same policy as GP classification)
    val e = intercept[IllegalArgumentException] {
      Train.estimatorFor("classification", "linear_svm",
        Map("exact" -> "true"), seed = 1L)
    }
    assert(e.getMessage.contains("squared-hinge"), e.getMessage)
    // the non-exact routes stay available
    assert(Train.estimatorFor("classification", "linear_svm",
      Map.empty, seed = 1L, numClasses = 2)
      .isInstanceOf[org.apache.spark.ml.classification.LinearSVC])
  }

  test("SVM model rejects wrong-width feature vectors with the UDF-path message") {
    import spark.implicits._
    val df = (1 to 40).map(i =>
      (org.apache.spark.ml.linalg.Vectors.dense(i.toDouble, (i % 3).toDouble),
        if (i % 2 == 0) 1.0 else 0.0)).toDF("features", "label")
    val m = new GraftSvm().setSvmTask("svc").setKernel("linear").fit(df)
    // too long: must raise, not silently score a prefix
    val eLong = intercept[IllegalArgumentException](
      m.predict(org.apache.spark.ml.linalg.Vectors.dense(1.0, 2.0, 3.0)))
    assert(eLong.getMessage.contains("model expects 2"), eLong.getMessage)
    // too short: same message, not an ArrayIndexOutOfBoundsException
    val eShort = intercept[IllegalArgumentException](
      m.predict(org.apache.spark.ml.linalg.Vectors.dense(1.0)))
    assert(eShort.getMessage.contains("model expects 2"), eShort.getMessage)
  }

  test("C <= 0 refuses loudly instead of training an infinite intercept") {
    import spark.implicits._
    val df = (1 to 20).map(i =>
      (org.apache.spark.ml.linalg.Vectors.dense(i.toDouble),
        if (i > 10) 1.0 else 0.0)).toDF("features", "label")
    val e = intercept[IllegalArgumentException](
      new GraftSvm().setSvmTask("svc").setRegC(0.0).fit(df))
    assert(e.getMessage.contains("C must be > 0"), e.getMessage)
  }

  test("train() dispatch: exact=true fits SMO and records no compat flag") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_svmx").toString)
    val df = circles.select(col("x1"), col("x2"), col("y").as("target"))
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "SvmExact", task = "classification",
      relationName = "svm_exact_rel", data = Some(df),
      yColumn = Seq("target"), algorithm = "svm",
      hyperparams = Map("exact" -> "true", "C" -> "1.0")))
    val m = cat.models.collect().head
    assert(!m.hyperparams.contains("compat"), m.hyperparams)
    assert(m.metrics("f1") > 0.95, m.metrics)
  }
}
