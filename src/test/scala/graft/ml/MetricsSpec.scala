package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("confusion matrix: reference multiclass test vector (metrics.rs:255-278)") {
    val df = Seq((1, 1), (2, 2), (3, 3), (4, 4), (4, 4)).toDF("label", "pred")
    val rep = Metrics.classification(df, "label", "pred")
    assert(rep.matrix((4, 4)) == 2L)
    assert(rep.f1Macro == 1.0)
    assert(rep.f1Micro == 1.0)
    assert(rep.accuracy == 1.0)
  }

  test("binary confusion uses the flipped sklearn layout") {
    // labels:  1 1 1 0 0 0 ; preds: 1 1 0 1 0 0 → tp=2 fp=1 fn=1 tn=2
    val df = Seq((1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0)).toDF("label", "pred")
    val rep = Metrics.classification(df, "label", "pred")
    assert(rep.accuracy == 4.0 / 6.0)
    assert(rep.precision == 2.0 / 3.0) // tp/(tp+fp)
    assert(rep.recall == 2.0 / 3.0)    // tp/(tp+fn)
    val f1 = 2.0 * ((2.0 / 3.0) * (2.0 / 3.0)) / (2.0 / 3.0 + 2.0 / 3.0)
    assert(math.abs(rep.f1Macro - f1) < 1e-12)
    assert(math.abs(rep.f1Micro - f1) < 1e-12)
  }

  test("macro-F1 NaN-recall quirk: class absent from ground truth counts as recall 1.0") {
    // class 2 never appears in labels but is predicted once
    val df = Seq((0, 0), (0, 0), (1, 1), (1, 2), (2, 2)).toDF("label", "pred")
    val rep = Metrics.classification(df, "label", "pred")
    assert(!rep.f1Macro.isNaN) // quirk keeps it finite here
  }

  test("regression metrics: perfect prediction → r2=1, mae=mse=0") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("y", "p")
    val r = Metrics.regression(df, "y", "p")
    assert(r.r2 == 1.0 && r.mae == 0.0 && r.mse == 0.0)
  }

  test("regression metrics: hand-computed") {
    // y = 1,2,3 ; p = 2,2,2 → rss=2, tss=2, r2=0, mae=2/3, mse=2/3
    val df = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 2.0)).toDF("y", "p")
    val r = Metrics.regression(df, "y", "p")
    assert(math.abs(r.r2) < 1e-9)
    assert(math.abs(r.mae - 2.0 / 3.0) < 1e-9)
    assert(math.abs(r.mse - 2.0 / 3.0) < 1e-9)
  }

  test("roc_auc: perfect ranking → 1.0; reversed → 0.0; ties → 0.5") {
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1)).toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(perfect, "y", "s") - 1.0) < 1e-12)
    val reversed = Seq((false, 0.9), (false, 0.8), (true, 0.2), (true, 0.1)).toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(reversed, "y", "s")) < 1e-12)
    val ties = Seq((true, 0.5), (false, 0.5), (true, 0.5), (false, 0.5)).toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(ties, "y", "s") - 0.5) < 1e-12)
  }

  test("roc_auc equals the reference sweep on a mixed case") {
    // hand-run of metrics.rs:221-253 sweep:
    // sorted desc (T,.9)(F,.8)(T,.7)(T,.6)(F,.5): auc = 1/6 + 1/2 = 2/3,
    // equal to Mann-Whitney U=4 over n⁺·n⁻=6.
    val df = Seq((true, 0.9), (false, 0.8), (true, 0.7), (true, 0.6), (false, 0.5))
      .toDF("y", "s")
    assert(math.abs(Metrics.rocAuc(df, "y", "s") - 2.0 / 3.0) < 1e-12)
  }

  test("log_loss: clamped, matches closed form") {
    val df = Seq((1.0, 0.9), (0.0, 0.1)).toDF("y", "p")
    val expected = -(math.log(0.9) + math.log(0.9)) / 2.0
    assert(math.abs(Metrics.logLoss(df, "y", "p") - expected) < 1e-12)
    // p=0 clamps to eps instead of -inf
    val clamped = Seq((1.0, 0.0)).toDF("y", "p")
    assert(!Metrics.logLoss(clamped, "y", "p").isInfinite)
  }

  test("weighted f1/precision/recall match a hand-run sklearn example") {
    // labels: 0,0,0,1,1,2 ; preds: 0,0,1,1,1,0  (support 3/2/1)
    // class 0: p=2/3 r=2/3 f=2/3 ; class 1: p=2/3 r=1 f=4/5 ; class 2: p=0 r=0 f=0
    // weighted: p = (3·2/3 + 2·2/3 + 0)/6, r = (3·2/3 + 2·1)/6, f = (3·2/3 + 2·4/5)/6
    val df = Seq((0, 0), (0, 0), (0, 1), (1, 1), (1, 1), (2, 0)).toDF("label", "pred")
    val rep = Metrics.classification(df, "label", "pred")
    assert(math.abs(rep.precisionWeighted - (3 * 2.0 / 3 + 2 * 2.0 / 3) / 6) < 1e-12)
    assert(math.abs(rep.recallWeighted - (3 * 2.0 / 3 + 2 * 1.0) / 6) < 1e-12)
    assert(math.abs(rep.f1Weighted - (3 * 2.0 / 3 + 2 * 0.8) / 6) < 1e-12)
  }

  test("weighted metrics use both classes in the binary case") {
    // labels: 1,1,1,0,0,0 ; preds: 1,1,0,1,0,0
    // class1: p=2/3 r=2/3 f=2/3 ; class0: p=2/3 r=2/3 f=2/3 → weighted = 2/3
    val df = Seq((1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0)).toDF("label", "pred")
    val rep = Metrics.classification(df, "label", "pred")
    assert(math.abs(rep.f1Weighted - 2.0 / 3) < 1e-12)
    assert(math.abs(rep.precisionWeighted - 2.0 / 3) < 1e-12)
    assert(math.abs(rep.recallWeighted - 2.0 / 3) < 1e-12)
  }
}
