package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The exact (capped, opt-in) kernel-ridge path — sklearn
  * `KernelRidge` semantics: dual solve, no intercept, kernel "linear"
  * by default, "rbf" by hyperparam. */
class KernelRidgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sinData(n: Int = 200): DataFrame = {
    val rnd = new scala.util.Random(7)
    new VectorAssembler().setInputCols(Array("x")).setOutputCol("features")
      .transform((0 until n).map { _ =>
        val x = rnd.nextDouble() * 6 - 3
        (x, math.sin(x) + rnd.nextGaussian() * 0.05)
      }.toDF("x", "label"))
  }

  test("linear kernel equals the primal no-intercept ridge (push-through identity)") {
    val rnd = new scala.util.Random(11)
    val xs = (0 until 60).map(_ => (rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble()))
    val ys = xs.map { case (a, b, c) => 2 * a - b + 0.5 * c + rnd.nextGaussian() * 0.01 }
    val df = new VectorAssembler().setInputCols(Array("a", "b", "c")).setOutputCol("features")
      .transform(xs.zip(ys).map { case ((a, b, c), y) => (a, b, c, y) }
        .toDF("a", "b", "c", "label"))
    val m = new KernelRidge().setAlpha(0.1).fit(df)
    // primal: w = (XᵀX + αI)⁻¹ Xᵀ y, no intercept — identical predictions
    val x = BDM(xs.map(t => Array(t._1, t._2, t._3)): _*)
    val w = breeze.linalg.inv(x.t * x + BDM.eye[Double](3) * 0.1) * (x.t * BDV(ys: _*))
    val probe = org.apache.spark.ml.linalg.Vectors.dense(0.3, 0.7, 0.2)
    val primal = w dot BDV(0.3, 0.7, 0.2)
    assert(math.abs(m.predict(probe) - primal) < 1e-8,
      s"dual ${m.predict(probe)} vs primal $primal")
  }

  test("rbf kernel fits sin(x) where the linear kernel cannot") {
    val df = sinData()
    val rbf = new KernelRidge().setKernel("rbf").setAlpha(0.1).setGamma(1.0).fit(df)
    val lin = new KernelRidge().setKernel("linear").setAlpha(0.1).fit(df)
    def mse(m: GraftKernelModel): Double =
      (-30 to 30).map { i =>
        val x = i / 10.0
        val d = m.predict(org.apache.spark.ml.linalg.Vectors.dense(x)) - math.sin(x)
        d * d
      }.sum / 61
    assert(mse(rbf) < 0.01, s"rbf mse ${mse(rbf)}")
    assert(mse(rbf) < mse(lin) / 10, s"rbf ${mse(rbf)} vs linear ${mse(lin)}")
  }

  test("guard refuses past maxRows with routing to the RFF path") {
    val e = intercept[IllegalArgumentException] {
      new KernelRidge().setMaxRows(50).fit(sinData(100))
    }
    assert(e.getMessage.contains("RFF"))
  }

  test("gaussian_process exact=true is the capped posterior mean; default records the RFF flag") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_gp").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "GPexact", task = "regression", relationName = "sin",
      data = Some(sinData().select($"x", $"label")), yColumn = Seq("label"),
      algorithm = "gaussian_process",
      hyperparams = Map("exact" -> "true", "alpha" -> "0.01"),
      testSampling = "random", orderCols = Seq("x")))
    val exact = cat.models.collect().head
    assert(!exact.hyperparams.contains("compat"), exact.hyperparams)
    assert(exact.metrics("r2") > 0.95, s"exact GP posterior fits sin: ${exact.metrics}")
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "GPrff", task = "regression", relationName = "sin",
      data = Some(sinData().select($"x", $"label")), yColumn = Seq("label"),
      algorithm = "gaussian_process",
      testSampling = "random", orderCols = Seq("x")))
    val rff = cat.models.collect().maxBy(_.id)
    assert(rff.hyperparams.get("compat").contains("rff_gp_approx"), rff.hyperparams)
  }

  test("train lifecycle: exact=true dispatches, records NO compat flag, serves predict") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_kr").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "KR", task = "regression", relationName = "sin",
      data = Some(sinData().select($"x", $"label")), yColumn = Seq("label"),
      algorithm = "kernel_ridge",
      hyperparams = Map("exact" -> "true", "kernel" -> "rbf", "gamma" -> "1.0",
        "alpha" -> "0.1"),
      testSampling = "random", orderCols = Seq("x")))
    val m = cat.models.collect().head
    assert(!m.hyperparams.contains("compat"), m.hyperparams)
    assert(m.metrics("r2") > 0.9, s"rbf should fit sin: ${m.metrics}")
    // persisted model reloads and serves rows (rowPredictor path)
    Predict.clearCaches()
    val pred = Predict.predictBatch(cat, "KR", Seq(Array(1.5f))).head
    assert(math.abs(pred - math.sin(1.5)) < 0.2, s"$pred vs ${math.sin(1.5)}")
  }
}
