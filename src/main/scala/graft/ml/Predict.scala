package graft.ml

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The predict surface — reference `predict`/`predict_proba`/
  * `predict_text` scalar functions (`/root/reference/src/api.rs:801-970`)
  * and the model cache (`src/orm/model.rs:275-368`,
  * `src/orm/project.rs:44-83`).
  *
  * Two paths, mirroring SURVEY §3.2's recommendation:
  *  - `transform(df, project)` — the bulk path: resolve the deployed
  *    PipelineModel once, `model.transform` (native vectorized MLlib
  *    scoring, fuses into whole-stage codegen). This is the 100 TB path.
  *  - `quackml_predict(features)` UDFs — row-shaped parity surface for
  *    SQL (`SELECT quackml_predict(array(...))`): the final estimator's
  *    `predict(Vector)` under a per-JVM cache. In local mode the cache is
  *    process-wide exactly like the reference's; on a cluster the model
  *    id → path map is tiny and each executor lazily loads once.
  */
object Predict {
  // Keys are namespaced by catalog baseDir: two catalogs both have a
  // "model 1", and a process can serve several catalogs (tests do).
  private val modelCache = new ConcurrentHashMap[String, PipelineModel]()
  private val projectCache = new ConcurrentHashMap[String, java.lang.Long]()
  private val CacheBound = 1024 // reference flushes at 1024 (`project.rs:70-74`)

  // The catalog bound for the SQL-function surface. Held in this JVM
  // singleton so UDF closures capture NOTHING (a Scala object reference is
  // static — serialization-safe); in local mode executors share the JVM.
  // On a multi-node cluster the SQL functions would resolve through a
  // broadcast id→path map instead — the bulk `transform` path is already
  // cluster-safe.
  @volatile private var bound: Catalog = _
  private def boundCatalog: Catalog = {
    val c = bound
    require(c != null, "Predict.registerFunctions has not been called")
    c
  }

  def clearCaches(): Unit = { modelCache.clear(); projectCache.clear() }

  /** Resolve + cache the deployed model id for a project. */
  def deployedModelId(catalog: Catalog, project: String): Long = {
    if (projectCache.size() > CacheBound) projectCache.clear()
    projectCache.computeIfAbsent(s"${catalog.baseDir}#$project", _ =>
      catalog.deployedModelId(project).getOrElse(
        throw new IllegalStateException(s"Project '$project' has no deployed model"))
    ).longValue()
  }

  /** Load + cache a PipelineModel by id. */
  def findCached(catalog: Catalog, modelId: Long): PipelineModel = {
    if (modelCache.size() > CacheBound) modelCache.clear()
    modelCache.computeIfAbsent(s"${catalog.baseDir}#$modelId", _ =>
      PipelineIO.load(catalog.spark, catalog.modelPath(modelId).getOrElse(
        throw new IllegalStateException(s"Model $modelId has no persisted file"))))
  }

  def deployedModel(catalog: Catalog, project: String): PipelineModel =
    findCached(catalog, deployedModelId(catalog, project))

  /** Bulk scoring: run the deployed pipeline over a DataFrame. */
  def transform(catalog: Catalog, project: String, df: DataFrame): DataFrame =
    deployedModel(catalog, project).transform(df)

  /** Pipeline stages usable as row-predictors (multi-target pipelines
    * carry one per target, after the preprocessing stage). */
  private val rowPredictor: PartialFunction[org.apache.spark.ml.Transformer,
      org.apache.spark.ml.linalg.Vector => Double] = {
    case p: org.apache.spark.ml.regression.LinearRegressionModel => p.predict
    case p: org.apache.spark.ml.classification.LogisticRegressionModel => p.predict
    case p: org.apache.spark.ml.classification.LinearSVCModel => p.predict
    case p: org.apache.spark.ml.regression.RandomForestRegressionModel => p.predict
    case p: org.apache.spark.ml.classification.RandomForestClassificationModel => p.predict
    case p: org.apache.spark.ml.regression.GBTRegressionModel => p.predict
    case p: org.apache.spark.ml.classification.GBTClassificationModel => p.predict
    case p: HistGBRegressionModel => p.predict
    case p: HistGBClassificationModel => p.predict
    case p: AdaBoostRegressionModel => p.predict
    case p: AdaBoostClassificationModel => p.predict
    case p: BaggingRegressionModel => p.predict
    case p: BaggingClassificationModel => p.predict
    case p: org.apache.spark.ml.clustering.KMeansModel => v => p.predict(v).toDouble
    case p: GraftLinearModel => p.predict
    case p: GraftKernelModel => p.predict
    case p: GraftSvmModel => p.predict
  }

  private def flatStages(m: PipelineModel): Seq[org.apache.spark.ml.Transformer] =
    m.stages.toSeq.flatMap {
      case pm: PipelineModel => flatStages(pm)
      case t => Seq(t)
    }

  private def predictors(m: PipelineModel): Seq[org.apache.spark.ml.linalg.Vector => Double] = {
    val fs = flatStages(m)
    val base = fs.collect(rowPredictor)
    // an RFF stage sits between the assembled features and the linear
    // model (kernel-approx svm) — compose it into the row path
    fs.collectFirst { case r: RFFTransformer => r } match {
      case Some(r) => base.map(f => (v: org.apache.spark.ml.linalg.Vector) => f(r.expand(v)))
      case None => base
    }
  }

  /** The FIRST fitted model as a row-predictor: on multi-target
    * pipelines scalar predict serves target 0, matching transform()'s
    * 'prediction' column and the reference's scalar-output quirk
    * (`src/api.rs:893-898`); predictJoint returns the full vector. */
  private def predictor(m: PipelineModel): org.apache.spark.ml.linalg.Vector => Double =
    predictors(m).headOption.getOrElse(throw new IllegalArgumentException(
      s"no row predictor for ${m.stages.last.getClass.getSimpleName}"))

  /** Register the SQL functions on a session, bound to a catalog:
    * quackml_predict(project, array<float>) → float
    * quackml_predict_proba(project, array<float>) → float  (first-class
    *   probability only — reproducing the reference's scalar-output quirk,
    *   `src/api.rs:893-898`)
    * quackml_predict_text(project, varchar) → float (byte-per-feature
    *   hack reproduced from `src/api.rs:936-940`)
    */
  /** Eagerly resolve + load the deployed model for every project (tiny
    * catalog scan, driver-side). Required because the UDFs execute inside
    * tasks, where launching nested Spark jobs (catalog reads /
    * PipelineModel.load) is illegal — the UDF path must be pure cache
    * hits. Mirrors the reference's process-wide warm caches. */
  def warm(catalog: Catalog): Unit =
    catalog.deployedModels.select(col("name"), col("model_id"))
      .collect().foreach { r =>
        projectCache.put(s"${catalog.baseDir}#${r.getString(0)}", r.getLong(1))
        findCached(catalog, r.getLong(1))
      }

  /** (coefficients, intercept) of the deployed model when the scalar
    * predict path is PURELY linear — no RFF expansion stage, first
    * predictor a linear regression (MLlib or Gram-trained in regression
    * mode). The [[graft.plans.InlineLinearPredict]] optimizer rule uses
    * this to replace the quackml_predict ScalaUDF with a codegen'd
    * dot + intercept for literal project names. Cache-only (no jobs):
    * safe to call during optimization. */
  private[graft] def linearInline(project: String): Option[(Array[Double], Double)] = {
    val cat = bound
    if (cat == null) return None
    val id = projectCache.get(s"${cat.baseDir}#$project")
    if (id == null) return None
    val m = modelCache.get(s"${cat.baseDir}#${id.longValue()}")
    if (m == null) return None
    val fs = flatStages(m)
    if (fs.exists(_.isInstanceOf[RFFTransformer])) return None
    fs.find(rowPredictor.isDefinedAt).flatMap {
      case p: org.apache.spark.ml.regression.LinearRegressionModel =>
        Some((p.coefficients.toArray, p.intercept))
      case p: GraftLinearModel if p.getOrDefault(p.mode) == "regression" =>
        Some((p.coeffs.toArray, p.intercept))
      case _ => None
    }
  }

  private def cachedOnly(project: String): PipelineModel = {
    val cat = boundCatalog
    val id = projectCache.get(s"${cat.baseDir}#$project")
    require(id != null,
      s"Project '$project' is not warmed — deploy happened after " +
        "registerFunctions, or the project does not exist; call Predict.warm")
    modelCache.get(s"${cat.baseDir}#${id.longValue()}")
  }

  def registerFunctions(spark: SparkSession, catalog: Catalog): Unit = {
    bound = catalog
    warm(catalog)
    // literal-project linear scoring drops the ScalaUDF for a codegen'd
    // dot + intercept (see graft.plans.InlineLinearPredict)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.InlineLinearPredict))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.InlineLinearPredict
    spark.udf.register("quackml_predict", (project: String, features: Seq[Float]) => {
      require(features != null && features.nonEmpty, "Empty feature vector")
      val m = cachedOnly(project)
      predictor(m)(Vectors.dense(features.map(_.toDouble).toArray)).toFloat
    })

    spark.udf.register("quackml_predict_proba", (project: String, features: Seq[Float]) => {
      val m = cachedOnly(project)
      m.stages.last match {
        // any probabilistic classifier (logistic, RF, GBT, ...) serves
        // probabilities, matching the reference (`src/orm/model.rs:955-965`);
        // the scalar output is the FIRST class probability — the
        // reference's scalar-output quirk (`src/api.rs:893-898`)
        case p: org.apache.spark.ml.classification.ProbabilisticClassificationModel[
            org.apache.spark.ml.linalg.Vector @unchecked, _] =>
          p.predictProbability(Vectors.dense(features.map(_.toDouble).toArray))(0).toFloat
        // exact kernel SVC trained with probability=true: Platt sigmoid
        // over the decision value (sklearn probability=True); same
        // first-class-probability scalar quirk
        case g: GraftSvmModel =>
          g.probability(Vectors.dense(features.map(_.toDouble).toArray))(0).toFloat
        case other => throw new IllegalArgumentException(
          s"predict_proba unsupported for ${other.getClass.getSimpleName}")
      }
    })

    // the array-returning companion (SURVEY §2.1 #4): the scalar form
    // above keeps the reference's first-class-probability quirk; this
    // one serves the FULL distribution (class order = the model's
    // sorted label order), so a multiclass user can read every class
    // probability through SQL — incl. the exact-SVC Wu–Lin–Weng
    // coupled vector — instead of dropping to Scala transform()
    spark.udf.register("quackml_predict_proba_all",
      (project: String, features: Seq[Float]) => {
        val m = cachedOnly(project)
        m.stages.last match {
          case p: org.apache.spark.ml.classification.ProbabilisticClassificationModel[
              org.apache.spark.ml.linalg.Vector @unchecked, _] =>
            p.predictProbability(Vectors.dense(features.map(_.toDouble).toArray))
              .toArray.map(_.toFloat).toSeq
          case g: GraftSvmModel =>
            g.probability(Vectors.dense(features.map(_.toDouble).toArray))
              .map(_.toFloat).toSeq
          case other => throw new IllegalArgumentException(
            s"predict_proba_all unsupported for ${other.getClass.getSimpleName}")
        }
      })

    spark.udf.register("quackml_predict_text", (project: String, text: String) => {
      val feats = text.getBytes("UTF-8").map(b => (b & 0xff).toFloat)
      val m = cachedOnly(project)
      predictor(m)(Vectors.dense(feats.map(_.toDouble))).toFloat
    })
  }

  /** `predict_batch` (`src/api.rs:1003-1028`): score a flat batch of
    * feature vectors against the deployed model, driver-side. */
  def predictBatch(catalog: Catalog, project: String,
      features: Seq[Array[Float]]): Seq[Double] = {
    val p = predictor(deployedModel(catalog, project))
    features.map(f => p(Vectors.dense(f.map(_.toDouble))))
  }

  /** `predict_joint` (`src/api.rs:1030-1039`): multi-target output, one
    * value per target column. Multi-target pipelines (trained with
    * several y_columns, the reference's sklearn MultiOutputRegressor
    * shape at `sklearn.py:119-134`) carry one fitted regressor per
    * target; each scores the same feature vector. */
  def predictJoint(catalog: Catalog, project: String,
      features: Array[Float]): Seq[Double] = {
    val v = Vectors.dense(features.map(_.toDouble))
    predictors(deployedModel(catalog, project)).map(_(v))
  }

  /** `predict_row` (`src/api.rs:1041-1058`): score a RAW row — snapshot
    * preprocessing applies because the persisted pipeline carries the
    * fitted SQLTransformer stages. */
  def predictRow(catalog: Catalog, project: String, row: DataFrame): DataFrame =
    deployedModel(catalog, project).transform(row)

  /** `decompose` (`src/api.rs:1060-1080`): PCA-transform features with a
    * deployed decomposition project. */
  def decompose(catalog: Catalog, project: String, df: DataFrame): DataFrame = {
    val m = deployedModel(catalog, project)
    require(m.stages.last.isInstanceOf[org.apache.spark.ml.feature.PCAModel],
      s"Project '$project' is not a decomposition project")
    m.transform(df)
  }

  /** r2 with sklearn's zero-variance rule: a constant y scores 1.0 on
    * a perfect fit and 0.0 otherwise (never ±Inf/NaN) — shared by
    * quackml_r2 and the regression-metrics map so the two surfaces
    * cannot drift. */
  private def r2Of(y: Seq[Double], p: Seq[Double]): Double = {
    val n = y.length
    val mean = y.sum / n
    val tss = y.map(v => (v - mean) * (v - mean)).sum
    val rss = y.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum
    if (tss == 0.0) { if (rss == 0.0) 1.0 else 0.0 }
    else 1.0 - rss / tss
  }

  /** SQL metric functions — the commented sklearn_* surface
    * (`src/api.rs:2281-2317`) as array-input UDFs over the native
    * metric implementations. */
  def registerMetricFunctions(spark: SparkSession): Unit = {
    spark.udf.register("quackml_r2",
      (y: Seq[Double], p: Seq[Double]) => r2Of(y, p))
    spark.udf.register("quackml_f1", (y: Seq[Int], p: Seq[Int]) => {
      // pure-Scala confusion matrix (no Spark jobs inside a UDF) with the
      // same binary-flip + NaN-recall semantics as Metrics.classification
      val classes = (y ++ p).distinct.sorted
      val idx = classes.zipWithIndex.toMap
      val k = classes.size
      val m = Array.ofDim[Long](k, k)
      y.zip(p).foreach { case (t, h) => m(idx(t))(idx(h)) += 1 }
      val per =
        if (k == 2) Seq((m(1)(1), m(0)(1), m(1)(0)))
        else (0 until k).map(c => (m(c)(c), m(c).sum - m(c)(c),
          (0 until k).map(r => m(r)(c)).sum - m(c)(c)))
      val f1s = per.map { case (tp, fp, fnn) =>
        val r0 = tp.toDouble / (tp + fnn)
        val r = if (r0.isNaN) 1.0 else r0
        val pr = tp.toDouble / (tp + fp)
        2.0 * ((pr * r) / (pr + r))
      }
      f1s.sum / f1s.size
    })
    spark.udf.register("quackml_log_loss", (y: Seq[Double], p: Seq[Double]) => {
      val eps = 1e-15
      -y.zip(p).map { case (yi, pi0) =>
        val pi = math.min(math.max(pi0, eps), 1.0 - eps)
        yi * math.log(pi) + (1.0 - yi) * math.log(1.0 - pi)
      }.sum / y.length
    })
    // sklearn_regression_metrics (`src/api.rs:2294-2301`;
    // `sklearn.py:262-274`): the full metric map in one call
    spark.udf.register("quackml_regression_metrics",
      (y: Seq[Double], p: Seq[Double]) => {
        val n = y.length
        val rss = y.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum
        Map(
          "r2" -> r2Of(y, p),
          "mse" -> rss / n,
          "mae" -> y.zip(p).map { case (a, b) => math.abs(a - b) }.sum / n)
      })
    // sklearn_classification_metrics (`src/api.rs:2304-2317`;
    // `sklearn.py:277-306`): binary average below 3 classes with
    // positive class 1, macro otherwise; mcc is the multiclass
    // Gorodkin form sklearn computes; zero-division cells score 0.0
    spark.udf.register("quackml_classification_metrics",
      (y: Seq[Int], p: Seq[Int]) => {
        val classes = (y ++ p).distinct.sorted
        val idx = classes.zipWithIndex.toMap
        val k = classes.size
        val m = Array.ofDim[Long](k, k)
        y.zip(p).foreach { case (t, h) => m(idx(t))(idx(h)) += 1 }
        val n = y.length.toLong
        def cell(tp: Long, fp: Long, fn: Long): (Double, Double, Double) = {
          val pr = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
          val rc = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
          val f1 = if (pr + rc == 0) 0.0 else 2 * pr * rc / (pr + rc)
          (pr, rc, f1)
        }
        val (precision, recall, f1) =
          if (k <= 2) {
            // binary = sklearn average="binary" with pos_label=1: label
            // 1 scores when present; all-label-0 input scores 0.0
            // (pos_label absent → zero-division → 0); any other label
            // pair raises, exactly as sklearn does
            require(classes.forall(c => c == 0 || c == 1),
              s"pos_label=1 is not a valid label for classes " +
                s"${classes.mkString("[", ", ", "]")}; binary metrics " +
                "need {0, 1} labels (sklearn average=\"binary\")")
            idx.get(1) match {
              case Some(c) =>
                cell(m(c)(c), (0 until k).map(r => m(r)(c)).sum - m(c)(c),
                  m(c).sum - m(c)(c))
              case None => (0.0, 0.0, 0.0)
            }
          } else {
            val per = (0 until k).map(c => cell(m(c)(c),
              (0 until k).map(r => m(r)(c)).sum - m(c)(c),
              m(c).sum - m(c)(c)))
            (per.map(_._1).sum / k, per.map(_._2).sum / k, per.map(_._3).sum / k)
          }
        val correct = (0 until k).map(c => m(c)(c)).sum
        val predK = (0 until k).map(c => (0 until k).map(r => m(r)(c)).sum)
        val trueK = (0 until k).map(c => m(c).sum)
        val cov = correct.toDouble * n -
          predK.zip(trueK).map { case (a, b) => a.toDouble * b }.sum
        val dp = n.toDouble * n - predK.map(a => a.toDouble * a).sum
        val dt = n.toDouble * n - trueK.map(a => a.toDouble * a).sum
        val mcc = if (dp == 0 || dt == 0) 0.0 else cov / math.sqrt(dp * dt)
        Map(
          "f1" -> f1, "f1_micro" -> correct.toDouble / n,
          "precision" -> precision, "recall" -> recall,
          "accuracy" -> correct.toDouble / n, "mcc" -> mcc)
      })
  }

  /** Deployment strategies (`src/api.rs:695-799`): best_score,
    * most_recent, rollback, specific. Returns the deployed model id. */
  def deployStrategy(catalog: Catalog, project: String, strategy: String,
      modelId: Option[Long] = None): Long = {
    val p = catalog.findProject(project).getOrElse(
      throw new IllegalArgumentException(s"Project '$project' does not exist"))
    val chosen: Long = strategy match {
      case "best_score" => catalog.bestModelId(project).get
      case "most_recent" =>
        catalog.models.filter(col("project_id") === p.id)
          .orderBy(col("id").desc).select(col("id")).head().getLong(0)
      case "rollback" =>
        val deps = catalog.deployments.filter(col("project_id") === p.id)
          .orderBy(col("id").desc).select(col("model_id")).collect().map(_.getLong(0))
        deps.distinct.drop(1).headOption.getOrElse(
          throw new IllegalStateException("No previous deployment to roll back to"))
      case "specific" => modelId.getOrElse(
        throw new IllegalArgumentException("specific strategy requires a model id"))
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }
    catalog.deploy(p.id, chosen, strategy)
    projectCache.remove(s"${catalog.baseDir}#$project")
    chosen
  }
}
