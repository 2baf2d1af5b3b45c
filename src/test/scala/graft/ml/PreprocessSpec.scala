package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import Preprocess._

class PreprocessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def apply(train: DataFrame, test: DataFrame, cols: Seq[String],
      label: Option[String], cfg: Map[String, Preprocessor]): (DataFrame, Seq[String]) = {
    val fitted = Preprocess.fit(train, cols, label, cfg)
    val model = new Pipeline().setStages(fitted.stages.toArray).fit(train)
    (model.transform(test), fitted.outputCols)
  }

  private def vec(df: DataFrame): Seq[Vector] =
    df.select("features").collect().map(_.getAs[Vector](0)).toSeq

  test("impute mean/median/zero on numeric nulls") {
    val train = Seq(Some(1.0), Some(2.0), Some(6.0), None).toDF("x")
    val (outMean, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(impute = ImputeMean)))
    assert(vec(outMean).map(_(0)) == Seq(1.0, 2.0, 6.0, 3.0))
    val (outMed, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(impute = ImputeMedian)))
    assert(vec(outMed).map(_(0)) == Seq(1.0, 2.0, 6.0, 2.0))
    val (outZero, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(impute = ImputeZero)))
    assert(vec(outZero).map(_(0)) == Seq(1.0, 2.0, 6.0, 0.0))
  }

  test("default impute errors at fit when train has missing values") {
    val train = Seq(Some(1.0), None).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Preprocess.fit(train, Seq("x"), None, Map.empty)
    }
    assert(e.getMessage.contains("missing values"))
  }

  test("scale standard / min_max / max_abs / robust") {
    val train = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val (std, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(scale = Standard)))
    // μ=3, σ_pop=sqrt(2) → values (x−3)/√2
    val got = vec(std).map(_(0))
    val sd = math.sqrt(2.0)
    Seq(1, 2, 3, 4, 5).map(_.toDouble).zip(got).foreach { case (x, g) =>
      assert(math.abs(g - (x - 3.0) / sd) < 1e-12)
    }
    val (mm, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(scale = MinMax)))
    assert(vec(mm).map(_(0)) == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    val (ma, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(scale = MaxAbs)))
    assert(vec(ma).map(_(0)) == Seq(0.2, 0.4, 0.6, 0.8, 1.0))
    val (rb, _) = apply(train, train, Seq("x"), None,
      Map("x" -> Preprocessor(scale = Robust)))
    // median=3, p80−p30: ventiles over 1..5
    assert(vec(rb).map(_(0)).apply(2) == 0.0) // median maps to 0
  }

  test("native categorical: NULL is category 0, canonical order, unseen → NaN") {
    val train = Seq(Some("b"), Some("a"), None, Some("b")).toDF("c")
    val test = Seq(Some("a"), Some("b"), None, Some("zz")).toDF("c")
    val (out, _) = apply(train, test, Seq("c"), None, Map.empty)
    val got = vec(out).map(_(0))
    // __NULL__→0, a→1, b→2 (null first, then lexicographic)
    assert(got(0) == 1.0 && got(1) == 2.0 && got(2) == 0.0 && got(3).isNaN)
  }

  test("one_hot: k−1 columns, last dropped") {
    val train = Seq("a", "b", "c").toDF("c")
    val (out, names) = apply(train, train, Seq("c"), None,
      Map("c" -> Preprocessor(encode = OneHotEncode)))
    assert(names == Seq("c__oh0", "c__oh1"))
    val got = vec(out)
    assert(got(0).toArray.toSeq == Seq(1.0, 0.0)) // a = code 0
    assert(got(1).toArray.toSeq == Seq(0.0, 1.0)) // b = code 1
    assert(got(2).toArray.toSeq == Seq(0.0, 0.0)) // c = dropped last
  }

  test("target encoding: category → train mean of label; unseen imputable") {
    val train = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0)).toDF("c", "y")
    val test = Seq(("a", 0.0), ("b", 0.0), ("zz", 0.0)).toDF("c", "y")
    val (out, _) = apply(train, test, Seq("c"), Some("y"),
      Map("c" -> Preprocessor(encode = TargetEncode, impute = ImputeMean)))
    val got = vec(out).map(_(0))
    assert(got(0) == 15.0 && got(1) == 40.0)
    assert(!got(2).isNaN) // unseen → NaN → mean-imputed
  }

  test("ordinal: explicit 1-based order; unknown value raises") {
    val train = Seq("low", "mid", "high").toDF("c")
    val (out, _) = apply(train, train, Seq("c"), None,
      Map("c" -> Preprocessor(encode = OrdinalEncode(Seq("low", "mid", "high")))))
    assert(vec(out).map(_(0)) == Seq(1.0, 2.0, 3.0))
    // unknown value in TRAIN raises at fit
    val bad = Seq("low", "nope").toDF("c")
    val e = intercept[IllegalArgumentException] {
      Preprocess.fit(bad, Seq("c"), None,
        Map("c" -> Preprocessor(encode = OrdinalEncode(Seq("low", "mid")))))
    }
    assert(e.getMessage.contains("not present in ordinal"))
  }

  test("validation: mean-impute on categorical without target encode rejected") {
    val train = Seq("a", "b").toDF("c")
    val e = intercept[IllegalArgumentException] {
      Preprocess.fit(train, Seq("c"), None,
        Map("c" -> Preprocessor(impute = ImputeMean)))
    }
    assert(e.getMessage.contains("categorical"))
    val train2 = Seq(1.0, 2.0).toDF("x")
    val e2 = intercept[IllegalArgumentException] {
      Preprocess.fit(train2, Seq("x"), None,
        Map("x" -> Preprocessor(encode = OneHotEncode)))
    }
    assert(e2.getMessage.contains("continuous"))
  }

  test("high-cardinality native dictionary goes through a StringIndexerModel stage") {
    // 10k categories: the CASE-WHEN form would exceed Janino's method
    // limit and drop the projection out of codegen; the indexer path
    // must (a) be chosen, (b) keep the canonical code order, (c) map
    // unseen to NaN, and (d) survive pipeline persistence
    val cats = (0 until 10000).map(i => f"cat_$i%05d")
    val train = cats.map(c => (c, 1.0)).toDF("c", "y")
    val fitted = Preprocess.fit(train, Seq("c"), None, Map.empty)
    assert(fitted.stages.exists(_.isInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]),
      s"expected an indexer stage, got ${fitted.stages.map(_.getClass.getSimpleName)}")
    // the SQL stage must stay small — no compiled-in dictionary
    val sqlLen = fitted.stages.collect {
      case s: org.apache.spark.ml.feature.SQLTransformer => s.getStatement.length
    }.max
    assert(sqlLen < 20000, s"SQL statement still carries the dictionary: $sqlLen chars")
    val model = new Pipeline().setStages(fitted.stages.toArray).fit(train)
    val test = Seq("cat_00000", "cat_09999", "cat_00042", "never_seen").toDF("c")
    val scored = model.transform(test)
    // indexer helper columns must not leak into the scored output
    assert(!scored.columns.exists(n => n.endsWith("__catkey") || n.endsWith("__idx")),
      scored.columns.toSeq.toString)
    val out = scored.select("features").collect()
      .map(_.getAs[Vector](0)(0))
    assert(out(0) == 0.0 && out(1) == 9999.0 && out(2) == 42.0)
    assert(out(3).isNaN, s"unseen category must be NaN, got ${out(3)}")
    // round-trips through ML persistence like the SQL-only path
    val dir = java.nio.file.Files.createTempDirectory("graft_hc").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    assert(loaded.transform(test).select("features").collect()
      .map(_.getAs[Vector](0)(0)).take(3).sameElements(Array(0.0, 9999.0, 42.0)))
  }

  test("high-cardinality target encoding uses the foldable code→mean array") {
    val n = Preprocess.HighCardinality + 50
    val cats = (0 until n).map(i => f"c$i%05d")
    // label = i mod 7 so per-category means are distinct and exact
    val train = cats.zipWithIndex.map { case (c, i) => (c, (i % 7).toDouble) }
      .toDF("c", "y")
    val (out, _) = apply(train, train.limit(5), Seq("c"), Some("y"),
      Map("c" -> Preprocessor(encode = TargetEncode)))
    val got = vec(out).map(_(0))
    assert(got == Seq(0.0, 1.0, 2.0, 3.0, 4.0), got)
  }

  test("one_hot past the high-cardinality cap is rejected with routing") {
    val cats = (0 to Preprocess.HighCardinality).map(i => f"c$i%05d")
    val train = cats.map(c => (c, 1.0)).toDF("c", "y")
    val e = intercept[IllegalArgumentException] {
      Preprocess.fit(train, Seq("c"), None,
        Map("c" -> Preprocessor(encode = OneHotEncode)))
    }
    assert(e.getMessage.contains("one_hot is capped"))
  }

  test("preprocessing persists inside the saved PipelineModel") {
    val train = Seq((Some("a"), Some(1.0), 10.0), (Some("b"), Some(2.0), 20.0),
      (None, None, 30.0)).toDF("c", "x", "y")
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_pp").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "PP", task = "regression", relationName = "t",
      data = Some(train), yColumn = Seq("y"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("y"), testSize = 0.34,
      preprocess = Map(
        "c" -> Preprocessor(impute = ImputeMode),
        "x" -> Preprocessor(impute = ImputeMean, scale = Standard))))
    Predict.clearCaches()
    val loaded = Predict.deployedModel(cat, "PP")
    // the loaded pipeline must carry the SQLTransformer: transform raw rows
    val scored = loaded.transform(Seq((Some("a"), Some(1.5), 0.0)).toDF("c", "x", "y"))
    assert(scored.columns.contains("prediction") && scored.count() == 1)
  }

  test("analyzeNumeric degrades on empty and all-null relations (ADVICE r16)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", DoubleType, nullable = true)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val se = Stats.analyzeNumeric(empty, Seq("x")).head
    assert(se.missing == 0L && se.distinct == 0L && se.mean.isNaN)
    val allNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(null), org.apache.spark.sql.Row(null))), schema)
    val sn = Stats.analyzeNumeric(allNull, Seq("x")).head
    assert(sn.missing == 2L && sn.distinct == 0L && sn.mean.isNaN)
  }
}
