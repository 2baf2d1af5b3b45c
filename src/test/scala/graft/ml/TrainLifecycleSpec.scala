package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end lifecycle specs mirroring the reference's commented train
  * tests (`/root/reference/src/api.rs:2939-3057`): train on builtin
  * datasets, assert the contract row, metrics sanity, deployment
  * decisions, and the predict surface. */
class TrainLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshCatalog() = new Catalog(spark,
    java.nio.file.Files.createTempDirectory("graft_cat").toString)

  test("regression lifecycle on diabetes: train → metrics → deploy → predict") {
    val cat = freshCatalog()
    val df = Datasets.diabetes(spark)
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Diabetes", task = "regression", relationName = "quackml_diabetes",
      data = Some(df), yColumn = Seq("target"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("age")))
    val row = out.head()
    assert(row.getString(0) == "Diabetes" && row.getString(1) == "regression" &&
      row.getString(2) == "linear" && row.getBoolean(3))

    val m = cat.models.collect().head
    assert(m.metrics("r2") > 0.9, s"synthetic linear data should fit well: ${m.metrics}")
    assert(m.metrics.contains("mean_absolute_error") && m.metrics.contains("mean_squared_error"))
    assert(cat.deployedModelId("Diabetes").contains(m.id))

    // predict surface: UDF + bulk transform
    Predict.clearCaches()
    Predict.registerFunctions(spark, cat)
    val predSql =
      "SELECT quackml_predict('Diabetes', array(cast(0.1 as float), cast(-0.2 as float)," +
        " cast(0.3 as float), cast(0.0 as float), cast(0.1 as float), cast(0.1 as float)," +
        " cast(-0.1 as float), cast(0.2 as float), cast(0.0 as float), cast(0.05 as float)))"
    val pred = spark.sql(predSql).head().getFloat(0)
    assert(!pred.isNaN)
    // literal project + linear model → the optimizer inlines the scoring
    // as codegen'd dot+intercept: no ScalaUDF in the executed plan, and
    // the value agrees with the row-predictor path
    // the inlined expression prints as graft_dot(...) + intercept; a
    // surviving UDF would print as quackml_predict(...) with no dot
    val plan = spark.sql(predSql).queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan)
    val viaBatch = Predict.predictBatch(cat, "Diabetes",
      Seq(Array(0.1f, -0.2f, 0.3f, 0.0f, 0.1f, 0.1f, -0.1f, 0.2f, 0.0f, 0.05f))).head
    assert(math.abs(pred - viaBatch) < 1e-5, s"$pred vs $viaBatch")
    val bulk = Predict.transform(cat, "Diabetes", df)
    assert(bulk.columns.contains("prediction") && bulk.count() == 442)

    // dimension mismatch raises IDENTICALLY on both plan shapes: the
    // inlined codegen path (literal project) and the ScalaUDF path
    // (non-literal project defeats the rule) — an 11-element array on a
    // 10-feature model must never silently score the first 10
    val longArr = "array(" + (1 to 11).map(_ => "cast(0.1 as float)").mkString(",") + ")"
    val inlined = spark.sql(s"SELECT quackml_predict('Diabetes', $longArr)")
    assert(inlined.queryExecution.executedPlan.toString.contains("graft_dot"))
    val eInline = intercept[Exception] { inlined.head() }
    // CASE over a column is not foldable, so constant folding cannot
    // hand the rule a literal project name
    val udfPath = spark.range(1).selectExpr(
      s"quackml_predict(CASE WHEN id < 1 THEN 'Diabetes' ELSE 'x' END, $longArr)")
    assert(!udfPath.queryExecution.executedPlan.toString.contains("graft_dot"))
    val eUdf = intercept[Exception] { udfPath.head() }
    for (e <- Seq(eInline, eUdf)) {
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("feature vector") || msg.contains("non-matching sizes"),
        s"${e.getClass}: ${e.getMessage}")
    }

    // the Gram-trained model carries the same contract directly (it has
    // no BLAS.dot to raise for it — GramSolvers adds the require)
    val gm = new GraftLinearModel().setCoefficients(Array(1.0, 2.0)).setIntercept(0.5)
    val eg = intercept[IllegalArgumentException] {
      gm.predict(org.apache.spark.ml.linalg.Vectors.dense(1.0, 2.0, 3.0))
    }
    assert(eg.getMessage.contains("feature vector"), eg.getMessage)
    assert(gm.predict(org.apache.spark.ml.linalg.Vectors.dense(1.0, 2.0)) == 5.5)
  }

  test("worse second model is not auto-deployed; rollback/most_recent strategies work") {
    val cat = freshCatalog()
    val df = Datasets.diabetes(spark)
    def cfg(alg: String, hp: Map[String, String] = Map.empty) = Train.TrainConfig(
      projectName = "DeployDemo", task = "regression", relationName = "quackml_diabetes",
      data = Some(df), yColumn = Seq("target"), algorithm = alg, hyperparams = hp,
      testSampling = "random", orderCols = Seq("age"))
    assert(Train.train(spark, cat, cfg("linear")).head().getBoolean(3))
    // heavily-regularized ridge fits worse → no deploy
    val second = Train.train(spark, cat, cfg("ridge", Map("alpha" -> "10000.0")))
    assert(!second.head().getBoolean(3))
    val firstId = cat.models.collect().map(_.id).min
    assert(cat.deployedModelId("DeployDemo").contains(firstId))

    // most_recent promotes the worse one, rollback goes back
    val secondId = Predict.deployStrategy(cat, "DeployDemo", "most_recent")
    assert(secondId == cat.models.collect().map(_.id).max)
    assert(cat.deployedModelId("DeployDemo").contains(secondId))
    val back = Predict.deployStrategy(cat, "DeployDemo", "rollback")
    assert(back == firstId)
    // best_score picks the higher-r2 model
    assert(Predict.deployStrategy(cat, "DeployDemo", "best_score") == firstId)
  }

  test("multiclass classification on iris") {
    val cat = freshCatalog()
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Iris", task = "classification", relationName = "quackml_iris",
      data = Some(Datasets.iris(spark)), yColumn = Seq("target"), algorithm = "linear",
      testSampling = "stratified", orderCols = Seq("sepal_length")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.metrics("f1") > 0.85, s"separable classes should score high: ${m.metrics}")
    assert(m.metrics.contains("accuracy") && m.metrics.contains("precision"))
  }

  test("binary classification on breast_cancer (boolean label) records roc_auc") {
    val cat = freshCatalog()
    val df = Datasets.breastCancer(spark)
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "BC", task = "classification", relationName = "quackml_breast_cancer",
      data = Some(df), yColumn = Seq("malignant"), algorithm = "linear",
      testSampling = "stratified", orderCols = Seq("mean radius")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.metrics.contains("roc_auc") && m.metrics("roc_auc") > 0.5)
  }

  test("random_forest classification + gbt-compat algorithms dispatch") {
    val cat = freshCatalog()
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "IrisRF", task = "classification", relationName = "quackml_iris",
      data = Some(Datasets.iris(spark)), yColumn = Seq("target"),
      algorithm = "random_forest", hyperparams = Map("n_estimators" -> "20"),
      testSampling = "stratified", orderCols = Seq("sepal_length")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.metrics("f1") > 0.8)
  }

  test("clustering (kmeans) and decomposition (pca) lifecycles") {
    val cat = freshCatalog()
    val iris = Datasets.iris(spark).drop("target")
    val km = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Clusters", task = "clustering", relationName = "quackml_iris",
      data = Some(iris), yColumn = Seq.empty, algorithm = "kmeans",
      hyperparams = Map("n_clusters" -> "3")))
    assert(km.head().getBoolean(3))
    assert(cat.models.collect().head.metrics("silhouette") > 0.3)

    val pca = Train.train(spark, cat, Train.TrainConfig(
      projectName = "PCA", task = "decomposition", relationName = "quackml_iris",
      data = Some(iris), yColumn = Seq.empty, algorithm = "pca",
      hyperparams = Map("n_components" -> "2")))
    assert(pca.head().getBoolean(3))
    val cev = cat.models.collect().find(_.algorithm == "pca").get
      .metrics("cumulative_explained_variance")
    assert(cev > 0.0 && cev <= 1.0 + 1e-9)
  }

  test("rbf svm (RFF kernel approximation) separates circular classes a linear model cannot") {
    import spark.implicits._
    // label = inside/outside a circle: zero linear signal
    val df = (0 until 400).map { i =>
      val a = 2.0 * math.Pi * (i % 100) / 100.0
      val r = if (i % 2 == 0) 0.5 else 2.0
      (r * math.cos(a) + 0.01 * (i % 7), r * math.sin(a) + 0.01 * (i % 5), i % 2)
    }.toDF("x1", "x2", "label")
    val cat = freshCatalog()
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Rbf", task = "classification", relationName = "t",
      data = Some(df), yColumn = Seq("label"), algorithm = "svm",
      hyperparams = Map("n_components" -> "200", "gamma" -> "1.0"),
      testSampling = "stratified", orderCols = Seq("x1")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.metrics("f1") > 0.9, s"rbf should separate circles: ${m.metrics}")
    assert(m.hyperparams("compat") == "rff_kernel_approx")

    // the persisted pipeline (custom RFF stage) reloads and serves rows
    Predict.clearCaches()
    Predict.registerFunctions(spark, cat)
    // kernel (RFF) pipelines must KEEP the UDF — the inline rule is for
    // purely linear scoring only
    assert(!spark.sql(
      "SELECT quackml_predict('Rbf', array(cast(0.4 as float), cast(0.1 as float)))")
      .queryExecution.executedPlan.toString.contains("graft_dot"))
    val inside = spark.sql(
      "SELECT quackml_predict('Rbf', array(cast(0.4 as float), cast(0.1 as float)))")
      .head().getFloat(0)
    val outside = spark.sql(
      "SELECT quackml_predict('Rbf', array(cast(2.0 as float), cast(0.1 as float)))")
      .head().getFloat(0)
    assert(inside != outside, "inner and outer points must classify differently")

    // svm regression (RFF + least squares) round-trips too
    val reg = (0 until 200).map { i =>
      val x = i / 20.0 - 5.0
      (x, math.sin(x))
    }.toDF("x", "y")
    val out2 = Train.train(spark, cat, Train.TrainConfig(
      projectName = "RbfReg", task = "regression", relationName = "t",
      data = Some(reg), yColumn = Seq("y"), algorithm = "svm",
      hyperparams = Map("n_components" -> "200", "gamma" -> "1.0", "alpha" -> "0.001"),
      testSampling = "random", orderCols = Seq("x")))
    assert(out2.head().getBoolean(3))
    val regModels = cat.models.collect().filter(_.metrics.contains("r2"))
    assert(regModels.exists(_.metrics("r2") > 0.8),
      s"rff regression should fit sin(x): ${regModels.map(_.metrics).mkString(";")}")
  }

  test("huber / kernel_ridge / bayesian_ridge / bagging dispatch and fit") {
    import spark.implicits._
    val df = (1 to 120).map(i => (i.toDouble, 2.0 * i + 5.0 + (i % 7) * 0.1)).toDF("x", "y")
    for (alg <- Seq("huber", "kernel_ridge", "bayesian_ridge", "bagging")) {
      val cat = freshCatalog()
      val out = Train.train(spark, cat, Train.TrainConfig(
        projectName = s"A_$alg", task = "regression", relationName = "t",
        data = Some(df), yColumn = Seq("y"), algorithm = alg,
        hyperparams = if (alg == "kernel_ridge") Map("alpha" -> "0.001") else Map.empty,
        testSampling = "random", orderCols = Seq("x")))
      assert(out.head().getBoolean(3), alg)
      val m = cat.models.collect().head
      assert(m.metrics("r2") > 0.5, s"$alg on near-linear data: ${m.metrics}")
      if (alg == "huber") assert(!m.hyperparams.contains("compat"))
      if (alg == "bayesian_ridge") assert(m.hyperparams("compat") == "ridge_point_estimate")
    }
  }

  test("unmapped algorithm raises the documented gap error") {
    val cat = freshCatalog()
    val e = intercept[IllegalArgumentException] {
      Train.train(spark, cat, Train.TrainConfig(
        projectName = "Gap", task = "regression", relationName = "quackml_diabetes",
        data = Some(Datasets.diabetes(spark)), yColumn = Seq("target"),
        algorithm = "dbscan")) // in the reference enum, unmapped both sides
    }
    assert(e.getMessage.contains("no Spark MLlib equivalent"))
  }

  test("task mismatch on existing project errors like the reference") {
    val cat = freshCatalog()
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "P1", task = "regression", relationName = "quackml_diabetes",
      data = Some(Datasets.diabetes(spark)), yColumn = Seq("target"),
      testSampling = "random", orderCols = Seq("age")))
    val e = intercept[IllegalArgumentException] {
      Train.train(spark, cat, Train.TrainConfig(
        projectName = "P1", task = "classification", relationName = "quackml_iris",
        data = Some(Datasets.iris(spark)), yColumn = Seq("target")))
    }
    assert(e.getMessage.contains("different task"))
  }

  test("digits: nested INTEGER[][] image flattens to 64 features and trains") {
    val cat = freshCatalog()
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Digits", task = "classification", relationName = "quackml_digits",
      data = Some(Datasets.digits(spark)), yColumn = Seq("target"),
      algorithm = "random_forest", hyperparams = Map("n_estimators" -> "20"),
      testSampling = "stratified", orderCols = Seq("target")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.metrics("f1") > 0.5, s"digit pixels are label-biased: ${m.metrics}")
    // the persisted pipeline scores raw nested-array rows
    Predict.clearCaches()
    val scored = Predict.transform(cat, "Digits", Datasets.digits(spark))
    assert(scored.columns.contains("prediction") && scored.count() == 1797)
  }

  test("10-class exact SVC: one-vs-one SMO fits digits, no compat flag, beats RFF") {
    val cat = freshCatalog()
    val digits = Datasets.digits(spark)
    def fitF1(name: String, hp: Map[String, String]): Double = {
      val out = Train.train(spark, cat, Train.TrainConfig(
        projectName = name, task = "classification",
        relationName = "quackml_digits", data = Some(digits),
        yColumn = Seq("target"), algorithm = "svm", hyperparams = hp,
        testSampling = "stratified", orderCols = Seq("target")))
      assert(out.head().getBoolean(3))
      val pid = cat.projects.collect().find(_.name == name).get.id
      cat.models.collect().find(_.project_id == pid).get.metrics("f1")
    }
    // 1797 rows ≤ the 2000 cap: the exact one-vs-one stack (45 binary
    // SMO machines over one shared Gram) is a legal opt-in
    val exactF1 = fitF1("DigitsExact",
      Map("exact" -> "true", "C" -> "10.0", "gamma" -> "0.02"))
    val rffF1 = fitF1("DigitsRff",
      Map("n_components" -> "100", "gamma" -> "0.02"))
    val exactPid = cat.projects.collect().find(_.name == "DigitsExact").get.id
    val exactModel = cat.models.collect().find(_.project_id == exactPid).get
    assert(!exactModel.hyperparams.contains("compat"),
      s"exact path must not carry a compat flag: ${exactModel.hyperparams}")
    assert(exactF1 > 0.9, s"exact OvO f1 $exactF1")
    assert(exactF1 >= rffF1,
      s"exact OvO ($exactF1) should not lose to its own approximation ($rffF1)")
  }

  test("grid search with k-fold CV picks the better alpha and records results") {
    val cat = freshCatalog()
    val df = Datasets.diabetes(spark)
    val out = Train.train(spark, cat, Train.TrainConfig(
      projectName = "Search", task = "regression", relationName = "quackml_diabetes",
      data = Some(df), yColumn = Seq("target"), algorithm = "ridge",
      search = Some("grid"),
      searchParams = Map("alpha" -> Seq("0.001", "10000.0")),
      searchArgs = Map("cv" -> "3"),
      testSampling = "random", orderCols = Seq("age")))
    assert(out.head().getBoolean(3))
    val m = cat.models.collect().head
    assert(m.hyperparams("alpha") == "0.001", s"should pick the low alpha: ${m.hyperparams}")
    val sr = m.hyperparams("search_results")
    assert(sr.contains("\"n_splits\":3") && sr.contains("\"best_index\":0"))
    // full reference search_results shape
    assert(sr.contains("\"mean_fit_time\":") && sr.contains("\"std_score_time\":"))
    assert(sr.contains("\"split0_test_score\":") && sr.contains("\"split2_test_score\":"))
    assert(sr.contains("\"param_alpha\":[\"0.001\",\"10000.0\"]"))
    assert(m.search == "grid")
    assert(m.metrics("r2") > 0.9)
  }

  test("search rejects a key present in both hyperparams and search_params") {
    val cat = freshCatalog()
    val e = intercept[IllegalArgumentException] {
      Train.train(spark, cat, Train.TrainConfig(
        projectName = "SearchBad", task = "regression", relationName = "quackml_diabetes",
        data = Some(Datasets.diabetes(spark)), yColumn = Seq("target"),
        algorithm = "ridge", hyperparams = Map("alpha" -> "1.0"),
        search = Some("grid"), searchParams = Map("alpha" -> Seq("0.1")),
        testSampling = "random", orderCols = Seq("age")))
    }
    assert(e.getMessage.contains("cannot be present in both"))
  }

  test("finetune tasks have metric defaults and directions (best_score deploys)") {
    assert(Train.defaultTargetMetric("text-generation") == "perplexity")
    assert(!Train.metricPositive("text-generation")) // lower perplexity deploys
    assert(Train.defaultTargetMetric("summarization") == "rouge_ngram_f1")
    assert(Train.defaultTargetMetric("translation") == "bleu")
    assert(Train.metricPositive("translation"))
    assert(Train.defaultTargetMetric("conversation") == "f1")
  }

  test("splitByFraction resolves an absolute test count (test_size > 1)") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i, s"row$i")).toDF("id", "t")
    val (tr, te) = Sampling.splitByFraction(df, Seq("id"), 20.0)
    val nTe = te.count(); val nTr = tr.count()
    // hash split is approximate (±binomial): the old bug made EVERY row
    // a test row, so the load-bearing assert is a real two-way split
    assert(nTr + nTe == 200 && nTe > 0 && nTe < 60,
      s"expected ~20 test rows, got $nTe test / $nTr train")
  }

  test("random search draws n_iter combos without materializing the grid") {
    val grid = (1 to 6).map(i => s"k$i" -> (1 to 10).map(_.toString)).toMap
    val combos = Train.allHyperparams(Map.empty, grid, Some("random"), 10, 42L)
    assert(combos.size == 10 && combos.distinct.size == 10)
    assert(combos.forall(_.keySet == grid.keySet))
  }

  test("catalog row cache: write-through, cross-instance, and flush coherence") {
    val cat = freshCatalog()
    val p = cat.createProject("CacheProj", "regression")
    // a SECOND instance on the same baseDir sees the row through the
    // process-wide cache
    val cat2 = new Catalog(spark, cat.baseDir)
    assert(cat2.findProject("CacheProj").map(_.id).contains(p.id))
    // append through instance 2, read through instance 1
    val p2 = cat2.createProject("CacheProj2", "regression")
    assert(cat.findProject("CacheProj2").map(_.id).contains(p2.id))
    // a cache flush must be invisible: the reload reads the same rows
    // back from parquet (write-through kept disk authoritative)
    Catalog.rowCache.clear()
    assert(cat.projects.collect().map(_.name).toSet ==
      Set("CacheProj", "CacheProj2"))
    // id allocation stays monotonic across the flush
    val p3 = cat.createProject("CacheProj3", "regression")
    assert(p3.id > p2.id && p2.id > p.id)
  }

  test("catalog compacts small append files past the part threshold") {
    val cat = freshCatalog()
    val n = Catalog.COMPACT_PARTS + 10
    (1 to n).foreach(i => cat.addLog(modelId = 1L, s"log line $i"))
    val dir = new java.io.File(s"${cat.baseDir}/logs")
    val parts = dir.listFiles().count(_.getName.startsWith("part-"))
    // one compaction fired somewhere past the threshold, so the live
    // directory holds far fewer parts than appends — and nothing leaked
    assert(parts <= Catalog.COMPACT_PARTS,
      s"$n one-row appends left $parts part files (no compaction?)")
    assert(!dir.getParentFile.listFiles().exists(
      f => f.getName.contains("__compact") || f.getName.contains("__retired")))
    // every row survived with its id intact
    val ids = cat.logs.collect().map(_.id).sorted
    assert(ids.length == n && ids.head == 1L && ids.last == n.toLong)
  }

  test("MLlib linear regression agrees with closed-form OLS") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // single feature: y = 3x + 7 exactly
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val cat = freshCatalog()
    Train.train(spark, cat, Train.TrainConfig(
      projectName = "OLS", task = "regression", relationName = "t",
      data = Some(df), yColumn = Seq("y"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("x")))
    val model = Predict.deployedModel(cat, "OLS")
    val lr = model.stages.last.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    assert(math.abs(lr.coefficients(0) - 3.0) < 1e-6)
    assert(math.abs(lr.intercept - 7.0) < 1e-6)
  }
}
