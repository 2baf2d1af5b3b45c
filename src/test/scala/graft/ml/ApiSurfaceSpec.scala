package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The dormant-but-intended API surface (SURVEY §2.1 second table):
  * dump_all/load_all, predict_batch/joint/row, decompose, SQL metric
  * functions. */
class ApiSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trained(): Catalog = {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_api").toString)
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "Api", task = "regression", relationName = "t",
      data = Some(df), yColumn = Seq("y"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("x")))
    cat
  }

  test("dump_all / load_all round-trips the catalog") {
    val cat = trained()
    val dump = java.nio.file.Files.createTempDirectory("graft_dump").toString
    cat.dumpAll(dump)
    val cat2 = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_api2").toString)
    cat2.loadAll(dump)
    assert(cat2.projects.count() == cat.projects.count())
    assert(cat2.models.collect().head.metrics.keySet ==
      cat.models.collect().head.metrics.keySet)
    assert(cat2.deployedModelId("Api") == cat.deployedModelId("Api"))
  }

  test("predict_batch / predict_joint / predict_row") {
    val cat = trained()
    Predict.clearCaches()
    val preds = Predict.predictBatch(cat, "Api",
      Seq(Array(10f), Array(20f)))
    assert(math.abs(preds(0) - 37.0) < 1e-4 && math.abs(preds(1) - 67.0) < 1e-4)
    val joint = Predict.predictJoint(cat, "Api", Array(10f))
    assert(joint.length == 1 && math.abs(joint.head - 37.0) < 1e-4)
    // predict_row: raw row through the persisted preprocessing pipeline
    val scored = Predict.predictRow(cat, "Api", Seq((5.0, 0.0)).toDF("x", "y"))
    assert(math.abs(scored.select("prediction").head().getDouble(0) - 22.0) < 1e-4)
  }

  test("multi-output regression on linnerud: 3 targets, predict_joint length 3") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_joint").toString)
    val df = Datasets.linnerud(spark)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "Joint", task = "regression", relationName = "quackml_linnerud",
      data = Some(df), yColumn = Seq("weight", "waist", "pulse"),
      algorithm = "linear", testSampling = "random", orderCols = Seq("chins")))
    val m = cat.models.collect().head
    assert(m.metrics.contains("r2") && m.metrics.contains("r2_2"))
    Predict.clearCaches()
    val joint = Predict.predictJoint(cat, "Joint", Array(5f, 100f, 60f))
    assert(joint.length == 3 && joint.forall(v => !v.isNaN))
    // the bulk transform carries one prediction column per target
    val scored = Predict.transform(cat, "Joint", df)
    assert(scored.columns.contains("prediction") &&
      scored.columns.contains("prediction_1") && scored.columns.contains("prediction_2"))
    // search is single-target only
    intercept[IllegalArgumentException] {
      Train.train(spark, cat, Train.TrainConfig(
        projectName = "Joint2", task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("weight", "waist"), algorithm = "ridge",
        search = Some("grid"), searchParams = Map("alpha" -> Seq("0.1", "1.0"))))
    }
  }

  test("predict_proba serves probabilities for RF and GBT classifiers") {
    // separable binary data so class probabilities are meaningful
    val df = (1 to 200).map { i =>
      val y = if (i % 2 == 0) 1 else 0
      (i.toDouble % 7, y * 10.0 + (i % 3), y)
    }.toDF("f1", "f2", "label")
    for (alg <- Seq("random_forest", "xgboost")) {
      val cat = new Catalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft_proba_$alg").toString)
      Train.train(spark, cat, Train.TrainConfig(
        projectName = s"P_$alg", task = "classification", relationName = "t",
        data = Some(df), yColumn = Seq("label"), algorithm = alg,
        hyperparams = Map("n_estimators" -> "10"),
        testSampling = "stratified", orderCols = Seq("f1")))
      Predict.clearCaches()
      Predict.registerFunctions(spark, cat)
      val proba = spark.sql(
        s"SELECT quackml_predict_proba('P_$alg', array(cast(1.0 as float), cast(0.0 as float)))")
        .head().getFloat(0)
      assert(proba >= 0.0f && proba <= 1.0f, s"$alg proba out of range: $proba")
    }
  }

  test("predict_proba_all serves the full distribution with transform parity") {
    // 3-class data so the multiclass (WLW-coupled) vector is exercised,
    // not just a binary complement pair
    val df = (1 to 150).map { i =>
      val y = i % 3
      (y * 5.0 + (i % 4) * 0.5, (2 - y) * 3.0 + (i % 5) * 0.3, y)
    }.toDF("f1", "f2", "label")
    def dist(project: String): Seq[Float] = spark.sql(
      s"SELECT quackml_predict_proba_all('$project', " +
        "array(cast(5.0 as float), cast(3.0 as float)))")
      .head().getSeq[Float](0)
    // logistic (classification "linear") and RF: parity with the
    // pipeline transform's probability column on the same features
    for (alg <- Seq("linear", "random_forest")) {
      val cat = new Catalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft_pall_$alg").toString)
      Train.train(spark, cat, Train.TrainConfig(
        projectName = s"PAll_$alg", task = "classification", relationName = "t",
        data = Some(df), yColumn = Seq("label"), algorithm = alg,
        hyperparams = if (alg == "random_forest") Map("n_estimators" -> "10")
          else Map.empty,
        testSampling = "stratified", orderCols = Seq("f1")))
      Predict.clearCaches()
      Predict.registerFunctions(spark, cat)
      val got = dist(s"PAll_$alg")
      val expected = Predict.transform(cat, s"PAll_$alg",
          Seq((5.0, 3.0, 0)).toDF("f1", "f2", "label"))
        .select("probability").head()
        .getAs[org.apache.spark.ml.linalg.Vector](0).toArray
      assert(got.size == 3, s"$alg distribution size ${got.size}")
      assert(math.abs(got.map(_.toDouble).sum - 1.0) < 1e-5)
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e.toFloat) < 1e-6f, s"$alg: $got vs ${expected.toSeq}")
      }
      // the scalar quirk form is exactly element 0 of the full vector
      val scalar = spark.sql(
        s"SELECT quackml_predict_proba('PAll_$alg', " +
          "array(cast(5.0 as float), cast(3.0 as float)))").head().getFloat(0)
      assert(scalar == got.head)
    }
    // exact multiclass SVC with probability=true: the WLW-coupled vector
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_pall_svc").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "PAllSvc", task = "classification", relationName = "t",
      data = Some(df), yColumn = Seq("label"), algorithm = "svm",
      hyperparams = Map("exact" -> "true", "probability" -> "true", "C" -> "1.0"),
      testSampling = "stratified", orderCols = Seq("f1")))
    Predict.clearCaches()
    Predict.registerFunctions(spark, cat)
    val got = dist("PAllSvc")
    val m = Predict.deployedModel(cat, "PAllSvc")
    val expected = m.stages.last.asInstanceOf[GraftSvmModel]
      .probability(org.apache.spark.ml.linalg.Vectors.dense(5.0, 3.0))
    assert(got.size == 3 && math.abs(got.map(_.toDouble).sum - 1.0) < 1e-5)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e.toFloat) < 1e-6f, s"svc: $got vs ${expected.toSeq}")
    }
  }

  test("predict_proba on the exact kernel SVC serves the Platt sigmoid") {
    // sklearn probability=True on the exact SMO path: the stored Platt
    // sigmoid maps decision values to calibrated first-class probability
    val df = (1 to 200).map { i =>
      val y = if (i % 2 == 0) 1 else 0
      (i.toDouble % 7, y * 10.0 + (i % 3), y)
    }.toDF("f1", "f2", "label")
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_proba_exact").toString)
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "PExact", task = "classification", relationName = "t",
      data = Some(df), yColumn = Seq("label"), algorithm = "svm",
      hyperparams = Map("exact" -> "true", "probability" -> "true", "C" -> "1.0"),
      testSampling = "stratified", orderCols = Seq("f1")))
    Predict.clearCaches()
    Predict.registerFunctions(spark, cat)
    def proba(f2: Double): Float = spark.sql(
      s"SELECT quackml_predict_proba('PExact', array(cast(1.0 as float), cast($f2 as float)))")
      .head().getFloat(0)
    // f2 ≈ 10 ⇒ label 1 ⇒ FIRST-class (label 0) probability is low;
    // f2 ≈ 1 ⇒ label 0 ⇒ high — the reference's scalar-output quirk
    val p1 = proba(10.0); val p0 = proba(1.0)
    assert(p1 >= 0f && p1 <= 1f && p0 >= 0f && p0 <= 1f, s"$p0 / $p1")
    assert(p0 > 0.5f && p1 < 0.5f,
      s"Platt proba should separate the classes: P0(class0)=$p0 P1(class0)=$p1")
  }

  test("decompose applies a deployed PCA projection and rejects non-PCA") {
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_pca").toString)
    val iris = Datasets.iris(spark).drop("target")
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "Dec", task = "decomposition", relationName = "iris",
      data = Some(iris), yColumn = Seq.empty, algorithm = "pca",
      hyperparams = Map("n_components" -> "2")))
    Predict.clearCaches()
    val out = Predict.decompose(cat, "Dec", iris)
    assert(out.columns.contains("pca_features"))
    assert(out.select("pca_features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size == 2)

    val reg = trained()
    intercept[IllegalArgumentException](Predict.decompose(reg, "Api", iris))
  }

  test("SQL metric functions match the native implementations") {
    Predict.registerMetricFunctions(spark)
    val r2 = spark.sql(
      "SELECT quackml_r2(array(1.0d, 2.0d, 3.0d), array(2.0d, 2.0d, 2.0d))")
      .head().getDouble(0)
    assert(math.abs(r2) < 1e-12) // hand value from MetricsSpec
    val f1 = spark.sql(
      "SELECT quackml_f1(array(1, 1, 1, 0, 0, 0), array(1, 1, 0, 1, 0, 0))")
      .head().getDouble(0)
    val expect = 2.0 * ((2.0 / 3.0) * (2.0 / 3.0)) / (4.0 / 3.0)
    assert(math.abs(f1 - expect) < 1e-12)
    val ll = spark.sql(
      "SELECT quackml_log_loss(array(1.0d, 0.0d), array(0.9d, 0.1d))")
      .head().getDouble(0)
    assert(math.abs(ll - (-(math.log(0.9) + math.log(0.9)) / 2.0)) < 1e-12)
  }

  test("sklearn_regression_metrics / sklearn_classification_metrics maps") {
    Predict.registerMetricFunctions(spark)
    val rm = spark.sql(
      "SELECT quackml_regression_metrics(array(1.0d, 2.0d, 3.0d), array(2.0d, 2.0d, 2.0d))")
      .head().getMap[String, Double](0)
    assert(math.abs(rm("r2")) < 1e-12)
    assert(math.abs(rm("mse") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(rm("mae") - 2.0 / 3.0) < 1e-12)

    // binary: y=[1,1,1,0,0,0], p=[1,1,0,1,0,0] → tp=2 fp=1 fn=1
    val bm = spark.sql(
      "SELECT quackml_classification_metrics(array(1, 1, 1, 0, 0, 0), array(1, 1, 0, 1, 0, 0))")
      .head().getMap[String, Double](0)
    assert(math.abs(bm("precision") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(bm("recall") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(bm("f1") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(bm("accuracy") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(bm("f1_micro") - 4.0 / 6.0) < 1e-12)
    // binary mcc by the direct formula: (tp*tn - fp*fn)/sqrt(...)
    val mccExpect = (2.0 * 2.0 - 1.0 * 1.0) /
      math.sqrt((2.0 + 1.0) * (2.0 + 1.0) * (2.0 + 1.0) * (2.0 + 1.0))
    assert(math.abs(bm("mcc") - mccExpect) < 1e-12)

    // multiclass goes macro; a perfect prediction scores 1.0 across
    // the board including the Gorodkin mcc
    val mm = spark.sql(
      "SELECT quackml_classification_metrics(array(0, 1, 2, 2), array(0, 1, 2, 2))")
      .head().getMap[String, Double](0)
    assert(Seq("f1", "precision", "recall", "accuracy", "mcc")
      .forall(kk => math.abs(mm(kk) - 1.0) < 1e-12))
  }

  test("metric edge cases follow sklearn: constant y, absent pos_label") {
    Predict.registerMetricFunctions(spark)
    // constant y: r2 = 1.0 on the perfect fit, 0.0 otherwise — never ±Inf
    val perfect = spark.sql(
      "SELECT quackml_r2(array(2.0d, 2.0d, 2.0d), array(2.0d, 2.0d, 2.0d))")
      .head().getDouble(0)
    assert(perfect == 1.0)
    val miss = spark.sql(
      "SELECT quackml_regression_metrics(array(2.0d, 2.0d, 2.0d), array(1.0d, 2.0d, 3.0d))")
      .head().getMap[String, Double](0)
    assert(miss("r2") == 0.0 && java.lang.Double.isFinite(miss("r2")))
    // all-negative binary fold: pos_label=1 absent → f1 0.0, accuracy real
    val zeros = spark.sql(
      "SELECT quackml_classification_metrics(array(0, 0, 0), array(0, 0, 0))")
      .head().getMap[String, Double](0)
    assert(zeros("f1") == 0.0 && zeros("precision") == 0.0 &&
      zeros("accuracy") == 1.0)
    // labels outside {0,1} with k<=2: sklearn raises, so do we
    val e = intercept[Exception] {
      spark.sql(
        "SELECT quackml_classification_metrics(array(2, 3), array(2, 3))")
        .head()
    }
    assert(e.getMessage.contains("pos_label"))
  }

  test("concurrent catalog creates allocate distinct monotonic ids") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_conc").toString)
    val ids = Await.result(
      Future.sequence((1 to 8).map(i =>
        Future(cat.createProject(s"Conc$i", "regression").id))),
      2.minutes)
    assert(ids.toSet.size == 8, s"duplicate ids allocated: $ids")
    assert(cat.projects.count() == 8)
    // a sibling handle on the SAME catalog shares the allocator
    val cat2 = new Catalog(spark, cat.baseDir)
    assert(cat2.createProject("Conc9", "regression").id == ids.max + 1)
  }
}
