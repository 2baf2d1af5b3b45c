package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip parity for the driver-side pipeline persistence (r21):
  * PipelineIO.save must load back (via PipelineIO.load) to the SAME
  * model the classic Spark-job writer round-trips to — stage classes,
  * uids, params, coefficients bit-equal, transform output identical —
  * for each stage family the lifecycle gates actually persist. */
class PipelineIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/m"

  private def fixture = (1 to 120).map { i =>
    val y = if (i % 3 == 0) 1.0 else 0.0
    (Vectors.dense(y * 2 + (i % 5) * 0.1, (i % 7).toDouble), y,
      (i % 7).toDouble, (i % 5).toDouble)
  }.toDF("features", "label", "a", "b")

  /** Save with both writers, load both back, compare them to each other
    * and return the pair for stage-specific assertions. */
  private def roundTrip(m: PipelineModel): (PipelineModel, PipelineModel) = {
    val pClassic = tmp("pio_classic")
    val pLocal = tmp("pio_local")
    m.write.overwrite().save(pClassic)
    PipelineIO.save(m, pLocal)
    assert(new java.io.File(pLocal, PipelineIO.LocalFormatMarker).exists(),
      "local save must drop the format marker")
    val a = PipelineModel.load(pClassic)
    val b = PipelineIO.load(spark, pLocal)
    assert(a.stages.length == b.stages.length)
    a.stages.zip(b.stages).foreach { case (sa, sb) =>
      assert(sa.getClass == sb.getClass)
      assert(sa.uid == sb.uid)
    }
    (a, b)
  }

  test("logistic-regression head (the finetune pipelines): bit-equal coefficients") {
    val lr = new LogisticRegression().setMaxIter(10).setRegParam(0.0)
    val m = new Pipeline().setStages(Array(lr)).fit(fixture)
    val (a, b) = roundTrip(m)
    val (la, lb) = (a.stages.head.asInstanceOf[LogisticRegressionModel],
      b.stages.head.asInstanceOf[LogisticRegressionModel])
    assert(la.coefficients.toArray.sameElements(lb.coefficients.toArray))
    assert(la.intercept == lb.intercept)
    assert(la.numClasses == lb.numClasses)
    assert(la.getMaxIter == lb.getMaxIter && la.getRegParam == lb.getRegParam)
    val fa = a.transform(fixture).select("prediction").collect().map(_.getDouble(0))
    val fb = b.transform(fixture).select("prediction").collect().map(_.getDouble(0))
    assert(fa.sameElements(fb))
  }

  test("assembler + custom DefaultParamsWritable stage (HistGB)") {
    val df = fixture.select($"a", $"b", $"label")
    val asm = new VectorAssembler().setInputCols(Array("a", "b"))
      .setOutputCol("features")
    val hgb = new HistGBRegressor().setNumRounds(3).setLabelCol("label")
    val m = new Pipeline().setStages(Array(asm, hgb)).fit(df)
    val (a, b) = roundTrip(m)
    val (ha, hb) = (a.stages(1).asInstanceOf[HistGBRegressionModel],
      b.stages(1).asInstanceOf[HistGBRegressionModel])
    assert(ha.extractParamMap().toSeq.map(_.param.name).sorted ==
      hb.extractParamMap().toSeq.map(_.param.name).sorted)
    val fa = a.transform(df).select("prediction").collect().map(_.getDouble(0))
    val fb = b.transform(df).select("prediction").collect().map(_.getDouble(0))
    assert(fa.sameElements(fb))
  }

  test("custom-writer stage (GraftSvm): driver-side writer keeps the spark-readable format") {
    val svm = new GraftSvm().setSvmTask("svc").setKernel("rbf")
      .setProbability(true).setLabelCol("label")
    val m = new Pipeline().setStages(Array(svm)).fit(fixture)
    val (a, b) = roundTrip(m)
    val (sa, sb) = (a.stages.head.asInstanceOf[GraftSvmModel],
      b.stages.head.asInstanceOf[GraftSvmModel])
    assert(sa.machines.length == sb.machines.length)
    sa.machines.zip(sb.machines).foreach { case (x, y) =>
      assert(x.supportFlat.sameElements(y.supportFlat))
      assert(x.dual.sameElements(y.dual))
      assert(x.intercept == y.intercept && x.plattA == y.plattA &&
        x.plattB == y.plattB && x.hasPlatt == y.hasPlatt)
    }
    val fa = a.transform(fixture).select("prediction").collect().map(_.getDouble(0))
    val fb = b.transform(fixture).select("prediction").collect().map(_.getDouble(0))
    assert(fa.sameElements(fb))
  }

  test("unmarked dirs load through the classic path (pre-r21 compatibility)") {
    val lr = new LogisticRegression().setMaxIter(5)
    val m = new Pipeline().setStages(Array(lr)).fit(fixture)
    val p = tmp("pio_compat")
    m.write.overwrite().save(p)
    val loaded = PipelineIO.load(spark, p)
    assert(loaded.stages.head.asInstanceOf[LogisticRegressionModel]
      .coefficients.toArray.sameElements(
        m.stages.head.asInstanceOf[LogisticRegressionModel].coefficients.toArray))
  }
}
