package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.clustering.{BisectingKMeans, KMeans}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.{PCA, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `train()` surface — reference lifecycle at
  * `/root/reference/src/api.rs:444-693`: find/create project → snapshot →
  * split → preprocess → fit → metrics → persist → auto-deploy.
  *
  * Architecture: the reference row-loops a cursor into a dense f32 matrix
  * and hands it to linfa/xgboost under a GIL; here the snapshot IS a
  * DataFrame, preprocessing is column expressions + ML stages inside a
  * `Pipeline`, and the fit is MLlib's distributed estimator. No ingest
  * loop exists at all — the estimator consumes the partitioned scan.
  *
  * Algorithm policy (SURVEY §2.4): exact MLlib equivalent where one
  * exists; the second-order boosting family (xgboost/lightgbm/catboost/
  * hist_gradient_boosting) trains the native [[HistGBRegressor]]/
  * [[HistGBClassifier]] Newton-on-histograms estimator (scheme-faithful,
  * with each algorithm's native growth policy — depth-wise, leaf-wise,
  * oblivious; only catboost's ordered-boosting variant stays flagged);
  * first-order gradient_boosting_trees stays on MLlib GBT (same
  * scheme); hard error naming the gap otherwise — mirroring the
  * reference's own `todo!()` holes
  * (`src/orm/model.rs:408,433,441,445,447`).
  */
object Train {

  final case class TrainConfig(
      projectName: String,
      task: String, // regression | classification | clustering | decomposition
      relationName: String = "",
      data: Option[DataFrame] = None,
      yColumn: Seq[String] = Seq("target"),
      algorithm: String = "linear",
      hyperparams: Map[String, String] = Map.empty,
      testSize: Double = 0.25,
      testSampling: String = "stratified",
      orderCols: Seq[String] = Seq.empty,
      preprocess: Map[String, Preprocess.Preprocessor] = Map.empty,
      materializeSnapshot: Boolean = false,
      search: Option[String] = None, // "grid" | "random"
      searchParams: Map[String, Seq[String]] = Map.empty,
      searchArgs: Map[String, String] = Map.empty, // n_iter, cv
      automaticDeploy: Boolean = true,
      // true = reference-parity ordered split + contiguous CV folds
      // (exact counts, needs a global ordering pass); false (default) =
      // shuffle-free hash split + hash-mod folds — the cluster-scale path
      orderedSplit: Boolean = false,
      seed: Long = 42L)

  /** Per-task default metric (`task.rs:71-88` — incl. the finetune
    * tasks, whose hyphenated names are what [[graft.llm.Finetune]]
    * writes as project tasks; without them `best_score` deploys on
    * finetune projects crash here). The reference spells translation's
    * metric "blue" (sic, `task.rs:79`); this catalog records the key
    * as "bleu", so the lookup uses the corrected spelling. */
  def defaultTargetMetric(task0: String): String = {
    // the reference's Task::from_str accepts underscore spellings too
    // (text_generation, text_classification) — normalize before the
    // match so an underscore-spelled project task deploys instead of
    // throwing on best_score (metricPositive already aliases both)
    val task = task0.replace('_', '-')
    task match {
    case "regression" => "r2"
    case "classification" => "f1"
    case "clustering" => "silhouette"
    case "decomposition" => "cumulative_explained_variance"
    case "text-classification" | "text-pair-classification" |
         "question-answering" => "f1"
    case "summarization" => "rouge_ngram_f1"
    case "translation" => "bleu"
    case "text-generation" => "perplexity"
    case "conversation" => "f1" // dual-encoder head's recorded metric
    case t => throw new IllegalArgumentException(s"No default target metric for task: $t")
    }
  }

  /** Higher-is-better direction (`task.rs:90-106`): only the
    * perplexity-scored generation tasks invert. */
  def metricPositive(task: String): Boolean = task match {
    case "text-generation" | "text_generation" | "text2text" => false
    case _ => true
  }

  def valueIsBetter(task: String, value: Double, other: Double): Boolean =
    if (metricPositive(task)) value > other else value < other

  private def hp(h: Map[String, String], k: String, default: Double): Double =
    h.get(k).map(_.toDouble).getOrElse(default)
  private def hpi(h: Map[String, String], k: String, default: Int): Int =
    h.get(k).map(_.toInt).getOrElse(default)
  private def hpb(h: Map[String, String], k: String, default: Boolean): Boolean =
    h.get(k).map(_.toBoolean).getOrElse(default)

  /** (task, algorithm) → estimator. Hyperparameter names accept the
    * reference's sklearn-style spellings (`max_iter`, `alpha`,
    * `l1_ratio`, `n_estimators`, `max_depth`, `learning_rate`,
    * `fit_intercept`, `n_clusters`, `n_components`). */
  /** `numClasses` drives the classification SVM family only: MLlib's
    * LinearSVC is binary-only, so k > 2 swaps it for multinomial
    * logistic (softmax) over the same features — sklearn's SVC/NuSVC/
    * LinearSVC accept any k, so the scale path must too. Binary keeps
    * the hinge loss. */
  def estimatorFor(task: String, algorithm: String, h: Map[String, String],
      seed: Long, numClasses: => Int = 2): PipelineStage = {
    // binary → hinge LinearSVC; k>2 → softmax (the loss substitution is
    // covered by the family's compat flag)
    def linearClassifier(featCol: String): PipelineStage with org.apache.spark.ml.param.shared.HasFeaturesCol =
      if (numClasses > 2)
        new LogisticRegression().setMaxIter(hpi(h, "max_iter", 100))
          .setRegParam(hp(h, "alpha", 0.0)).setFeaturesCol(featCol)
      else
        new LinearSVC().setMaxIter(hpi(h, "max_iter", 100))
          .setRegParam(hp(h, "alpha", 0.0)).setFeaturesCol(featCol)
    (task, algorithm) match {
    // ---------------- regression
    case ("regression", "linear") =>
      new LinearRegression().setSolver("normal").setRegParam(0.0)
        .setFitIntercept(hpb(h, "fit_intercept", true))
    case ("regression", "ridge") =>
      new LinearRegression().setSolver("normal")
        .setRegParam(hp(h, "alpha", 1.0)).setElasticNetParam(0.0)
        .setStandardization(false)
    case ("regression", "lasso") =>
      // standardization(false) like the ridge case: sklearn penalizes
      // RAW coefficients; MLlib's default standardizes first, which
      // changes the sparsity pattern for the same alpha
      new LinearRegression().setRegParam(hp(h, "alpha", 1.0)).setElasticNetParam(1.0)
        .setMaxIter(hpi(h, "max_iter", 100)).setStandardization(false)
    case ("regression", "elastic_net") =>
      new LinearRegression().setRegParam(hp(h, "alpha", 1.0))
        .setElasticNetParam(hp(h, "l1_ratio", 0.5)).setMaxIter(hpi(h, "max_iter", 100))
        .setStandardization(false)
    case ("regression", "random_forest") =>
      new RandomForestRegressor().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
    case ("regression", "extra_trees") =>
      new RandomForestRegressor().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
        .setSubsamplingRate(1.0).setFeatureSubsetStrategy("sqrt")
    case ("regression", "gradient_boosting_trees") =>
      // sklearn GradientBoosting is FIRST-order gradient boosting with
      // exact splits — MLlib GBT is the same scheme, so it stays the
      // dispatch here; the second-order family below gets the native
      // histogram estimator
      new GBTRegressor().setMaxIter(hpi(h, "n_estimators", 10))
        .setMaxDepth(hpi(h, "max_depth", 5))
        .setStepSize(hp(h, "learning_rate", 0.1)).setSeed(seed)
    case ("regression", "ada_boost") =>
      // exact AdaBoost.R2 (AdaBoost scaladoc) with sklearn's defaults
      new AdaBoostRegressor()
        .setNumRounds(hpi(h, "n_estimators", 50))
        .setMaxDepth(hpi(h, "max_depth", 3))
        .setStepSize(hp(h, "learning_rate", 1.0)).setSeed(seed)
    case ("regression", a @ ("hist_gradient_boosting" | "xgboost" | "lightgbm" |
                        "catboost")) =>
      // native second-order histogram boosting (HistGB scaladoc) with
      // the reference's exact knob spellings + xgboost's defaults
      // (`src/bindings/xgboost.rs:40-120`: eta 0.3, depth 6, lambda 1);
      // each algorithm gets its NATIVE growth policy — lightgbm
      // leaf-wise under num_leaves, catboost oblivious/symmetric
      val est = new HistGBRegressor()
        .setNumRounds(hpi(h, "n_estimators",
          hpi(h, "boost_rounds", hpi(h, "iterations", 10))))
        .setStepSize(hp(h, "eta", hp(h, "learning_rate", 0.3)))
        .setRegLambda(hp(h, "lambda", hp(h, "reg_lambda", hp(h, "l2_leaf_reg", 1.0))))
        .setMinSplitLoss(hp(h, "gamma", hp(h, "min_split_loss", 0.0)))
        .setMinChildWeight(hp(h, "min_child_weight", 1.0))
        .setMaxBins(math.min(256, hpi(h, "max_bin", 256))).setSeed(seed) // byte-binned cap
      a match {
        case "lightgbm" =>
          // LightGBM: leaf budget governs; max_depth ≤ 0 = unbounded
          val md = hpi(h, "max_depth", -1)
          est.setGrowthPolicy("leafwise")
            .setNumLeaves(hpi(h, "num_leaves", 31))
            .setMaxDepth(if (md <= 0) 30 else md)
        case "catboost" =>
          est.setGrowthPolicy("oblivious")
            .setMaxDepth(hpi(h, "depth", hpi(h, "max_depth", 6)))
            .setOrderedBoosting(
              h.get("boosting_type").exists(_.equalsIgnoreCase("ordered")))
            .setFoldCount(hpi(h, "fold_count", 8))
        case _ => est.setMaxDepth(hpi(h, "max_depth", 6))
      }
    case ("regression", "stochastic_gradient_descent") =>
      new LinearRegression().setSolver("l-bfgs")
        .setMaxIter(hpi(h, "max_iter", 100)).setRegParam(hp(h, "alpha", 0.0001))
    case ("regression", "huber") =>
      // exact loss family: MLlib huber == sklearn HuberRegressor
      // (epsilon default 1.35 matches; L2 regularization only)
      new LinearRegression().setLoss("huber")
        .setEpsilon(hp(h, "epsilon", 1.35))
        .setRegParam(hp(h, "alpha", 0.0001)).setMaxIter(hpi(h, "max_iter", 100))
    case ("regression", "kernel_ridge") if h.get("exact").contains("true") =>
      // sklearn-EXACT dual solve under a hard row cap (KernelRidge
      // scaladoc) — opt-in; the RFF approximation below stays the
      // default because the exact Gram has no scale path
      new KernelRidge().setAlpha(hp(h, "alpha", 1.0))
        .setGamma(hp(h, "gamma", -1.0))
        .setKernel(h.getOrElse("kernel", "linear"))
        .setMaxRows(hpi(h, "max_rows", 2000))
    case ("regression", "nu_svm") if h.get("exact").contains("true") =>
      // sklearn-EXACT ν-SVR: the tube width is the ν-traded variable
      // (must precede the general kernel_ridge|nu_svm RFF case below)
      new GraftSvm().setSvmTask("nusvr")
        .setNu(hp(h, "nu", 0.5)).setRegC(hp(h, "C", 1.0))
        .setGamma(hp(h, "gamma", -1.0))
        .setKernel(h.getOrElse("kernel", "rbf"))
        .setTol(hp(h, "tol", 1e-3)).setMaxRows(hpi(h, "max_rows", 2000))
    case ("regression", "kernel_ridge" | "nu_svm") =>
      // kernel machines scale via the RFF feature map + ridge (see svm);
      // nu_svm's nu-parameterization defaults to the flagged RFF route
      // (exact ν-SMO is the capped opt-in above)
      new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 100))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        new LinearRegression().setSolver("normal")
          .setRegParam(hp(h, "alpha", 1.0)).setElasticNetParam(0.0)
          .setStandardization(false).setFeaturesCol("rff_features")))
    // ------- Gram-solver family (one distributed sufficient-stats pass
    // + O(p³) driver math — see GramSolvers scaladoc for the exactness
    // ledger; these were the reference's sklearn-only remainder)
    case ("regression", "bayesian_ridge") =>
      new GramRegression().setSolver("bayesian_ridge")
        .setMaxIter(hpi(h, "n_iter", 300)).setTol(hp(h, "tol", 1e-3))
    case ("regression", "automatic_relevance_determination") =>
      new GramRegression().setSolver("ard")
        .setMaxIter(hpi(h, "n_iter", 300)).setTol(hp(h, "tol", 1e-3))
    case ("regression", "orthogonal_matching_pursuit") =>
      new GramRegression().setSolver("omp")
        .setNNonzero(hpi(h, "n_nonzero_coefs", 0))
    case ("regression", "least_angle") =>
      new GramRegression().setSolver("lars")
        .setNNonzero(hpi(h, "n_nonzero_coefs", 0))
    case ("regression", "lasso_least_angle") =>
      new GramRegression().setSolver("lasso_lars").setAlpha(hp(h, "alpha", 1.0))
    case ("regression", "ransac") =>
      new GramRegression().setSolver("ransac")
        .setMaxTrials(hpi(h, "max_trials", 100)).setSeed(seed)
    case ("regression", "theil_sen") =>
      new GramRegression().setSolver("theil_sen")
        .setMaxSubpopulation(hpi(h, "max_subpopulation", 1000)).setSeed(seed)
    case ("regression", "quantile") if h.get("exact").contains("true") =>
      // sklearn-EXACT pinball LP via the capped dense simplex
      // (GramSolvers.quantileExactLp) — opt-in; IRLS stays the default
      new GramRegression().setSolver("quantile_exact")
        .setQuantileTau(hp(h, "quantile", 0.5)).setAlpha(hp(h, "alpha", 1.0))
        .setMaxRows(hpi(h, "max_rows", 1000))
    case ("regression", "quantile") =>
      new GramRegression().setSolver("quantile")
        .setQuantileTau(hp(h, "quantile", 0.5)).setAlpha(hp(h, "alpha", 1.0))
        .setMaxIter(hpi(h, "max_iter", 50))
    case ("regression", "passive_aggressive") if h.get("exact").contains("true") =>
      // TRUE sequential PA-II under the row cap (GramSolvers ledger) —
      // opt-in; the partition-averaged analogue stays the default
      new GramRegression().setSolver("pa_sequential")
        .setRegC(hp(h, "C", 1.0)).setEpsilon(hp(h, "epsilon", 0.1))
        .setMaxIter(hpi(h, "max_iter", 1000)).setTol(hp(h, "tol", 1e-3))
        .setSeed(seed).setMaxRows(hpi(h, "max_rows", 100000))
    case ("classification", "passive_aggressive") if h.get("exact").contains("true") =>
      new GramRegression().setSolver("pa_sequential_binary")
        .setRegC(hp(h, "C", 1.0))
        .setMaxIter(hpi(h, "max_iter", 1000)).setTol(hp(h, "tol", 1e-3))
        .setSeed(seed).setMaxRows(hpi(h, "max_rows", 100000))
    case ("regression", "passive_aggressive") =>
      new GramRegression().setSolver("passive_aggressive")
        .setRegC(hp(h, "C", 1.0)).setEpsilon(hp(h, "epsilon", 0.1))
    case ("classification", "passive_aggressive") =>
      new GramRegression().setSolver("passive_aggressive_binary")
        .setRegC(hp(h, "C", 1.0))
    case ("regression", "gaussian_process") if h.get("exact").contains("true") =>
      // exact GP posterior MEAN under the cap — the identical dual
      // machinery to kernel ridge: k(x)ᵀ(K + σ²I)⁻¹y with sklearn's
      // default RBF(length_scale=1) → gamma = 1/(2·1²) = 0.5 and alpha
      // = the observation-noise jitter (GaussianProcessRegressor alpha)
      new KernelRidge().setKernel("rbf")
        .setGamma(hp(h, "gamma", 0.5))
        .setAlpha(hp(h, "alpha", 1e-10))
        .setMaxRows(hpi(h, "max_rows", 2000))
    case ("regression", "gaussian_process") =>
      // GP with an RBF kernel ≡ Bayesian linear regression over the RFF
      // feature map (Rahimi & Recht) — the posterior mean converges to
      // the exact GP mean as n_components grows; the exact O(n³) solve
      // has no scale path, so this is the principled approximation,
      // flagged compat=rff_gp_approx
      new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 200))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        new GramRegression().setSolver("bayesian_ridge")
          .setFeaturesCol("rff_features")))
    case ("classification", "gaussian_process") if h.get("exact").contains("true") =>
      // POLICY (deliberate asymmetry with regression): no exact opt-in
      // for GP CLASSIFICATION. The regression twin is a linear solve —
      // the posterior mean IS kernel ridge — but the classification
      // posterior is non-Gaussian; sklearn's GaussianProcessClassifier
      // runs a Laplace approximation (inner Newton loop, one-vs-rest
      // per class) that is itself approximate, so a capped port could
      // never be sklearn-"exact" the way the other exact=true paths
      // are. Refuse loudly rather than hand back an approximation
      // under an exactness flag the ledger would then be lying about.
      throw new IllegalArgumentException(
        "gaussian_process classification has no exact=true path: the GP " +
          "classification posterior requires a Laplace approximation " +
          "(itself inexact — there is nothing exact to promise); drop " +
          "exact=true to use the RFF+logistic route (compat=rff_gp_approx)")
    case ("classification", "gaussian_process") =>
      // GP classifier analog: RFF map + logistic head (the parametric
      // stand-in for the Laplace-approximated GP posterior), flagged
      new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 200))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        new LogisticRegression().setMaxIter(hpi(h, "max_iter", 100))
          .setFeaturesCol("rff_features")))
    case ("classification", "stochastic_gradient_descent") =>
      // sklearn SGDClassifier's default loss is hinge → linear SVM
      new LinearSVC().setMaxIter(hpi(h, "max_iter", 100))
        .setRegParam(hp(h, "alpha", 0.0001))
    case ("regression", "xgboost_random_forest") =>
      // XGBoost's random-forest mode (bagged trees, no boosting)
      new RandomForestRegressor().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
    case ("classification", "xgboost_random_forest") =>
      new RandomForestClassifier().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
    case ("regression", "bagging") =>
      // sklearn BaggingRegressor scheme (per-estimator bootstrap +
      // per-estimator feature subsets + mean vote) — see Bagging.scala
      new BaggingRegressor().setNumEstimators(hpi(h, "n_estimators", 10))
        .setMaxSamples(hp(h, "max_samples", 1.0))
        .setMaxFeatures(hp(h, "max_features", 1.0))
        .setBootstrap(hpb(h, "bootstrap", true))
        .setBootstrapFeatures(hpb(h, "bootstrap_features", false))
        .setBootstrapMode(h.getOrElse("bootstrap_mode", "poisson"))
        // 30 = Spark's depth ceiling ≈ sklearn's unpruned default tree
        .setMaxDepth(hpi(h, "max_depth", 30)).setSeed(seed)
    // ---------------- classification
    case ("classification", "linear") =>
      new LogisticRegression().setMaxIter(hpi(h, "max_iterations", hpi(h, "max_iter", 100)))
        .setRegParam(hp(h, "alpha", 0.0)).setFitIntercept(hpb(h, "fit_intercept", true))
        .setTol(hp(h, "gradient_tolerance", 1e-6))
    case ("classification", "ridge") =>
      new LogisticRegression().setRegParam(hp(h, "alpha", 1.0)).setElasticNetParam(0.0)
        .setMaxIter(hpi(h, "max_iter", 100)).setStandardization(false)
    case ("classification", "random_forest") =>
      new RandomForestClassifier().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
    case ("classification", "extra_trees") =>
      new RandomForestClassifier().setNumTrees(hpi(h, "n_estimators", 100))
        .setMaxDepth(hpi(h, "max_depth", 5)).setSeed(seed)
        .setFeatureSubsetStrategy("sqrt")
    case ("classification", "gradient_boosting_trees") =>
      new GBTClassifier().setMaxIter(hpi(h, "n_estimators", 10))
        .setMaxDepth(hpi(h, "max_depth", 5))
        .setStepSize(hp(h, "learning_rate", 0.1)).setSeed(seed)
    case ("classification", "ada_boost") =>
      // exact SAMME (AdaBoost scaladoc): weighted stumps by default,
      // any K — GBTClassifier (the old substitute) was binary-only
      new AdaBoostClassifier()
        .setNumRounds(hpi(h, "n_estimators", 50))
        .setMaxDepth(hpi(h, "max_depth", 1))
        .setStepSize(hp(h, "learning_rate", 1.0)).setSeed(seed)
    case ("classification", a @ ("hist_gradient_boosting" | "xgboost" | "lightgbm" |
                            "catboost")) =>
      // binary → logistic Newton boosting; k>2 → per-class softmax
      // trees (multi:softprob) — MLlib's GBTClassifier is binary-only,
      // so this also widens the boosting surface to multiclass; growth
      // policy dispatches per algorithm as in the regression arm
      val est = new HistGBClassifier()
        .setNumRounds(hpi(h, "n_estimators",
          hpi(h, "boost_rounds", hpi(h, "iterations", 10))))
        .setStepSize(hp(h, "eta", hp(h, "learning_rate", 0.3)))
        .setRegLambda(hp(h, "lambda", hp(h, "reg_lambda", hp(h, "l2_leaf_reg", 1.0))))
        .setMinSplitLoss(hp(h, "gamma", hp(h, "min_split_loss", 0.0)))
        .setMinChildWeight(hp(h, "min_child_weight", 1.0))
        .setMaxBins(math.min(256, hpi(h, "max_bin", 256))).setSeed(seed) // byte-binned cap
      a match {
        case "lightgbm" =>
          val md = hpi(h, "max_depth", -1)
          est.setGrowthPolicy("leafwise")
            .setNumLeaves(hpi(h, "num_leaves", 31))
            .setMaxDepth(if (md <= 0) 30 else md)
        case "catboost" =>
          // boosting_type=Ordered runs the real ordered scheme for
          // every objective — multiclass softmax included since r15
          // (fitOrdered trains k prefix-model ensembles)
          est.setGrowthPolicy("oblivious")
            .setMaxDepth(hpi(h, "depth", hpi(h, "max_depth", 6)))
            .setOrderedBoosting(
              h.get("boosting_type").exists(_.equalsIgnoreCase("ordered")))
            .setFoldCount(hpi(h, "fold_count", 8))
        case _ => est.setMaxDepth(hpi(h, "max_depth", 6))
      }
    case ("classification", "linear_svm") if h.get("exact").contains("true") =>
      // sklearn LinearSVC is squared-hinge liblinear (OvR for k > 2);
      // neither MLlib's hinge LinearSVC nor the softmax substitute is
      // scheme-exact, and the SMO opt-in only covers the ε-SVR dual —
      // refuse rather than record an approximation under a clean ledger
      // entry (same policy as gaussian_process classification)
      throw new IllegalArgumentException(
        "classification linear_svm has no exact=true path: sklearn's " +
          "LinearSVC is squared-hinge liblinear, which has no capped " +
          "twin here; drop exact=true to use hinge LinearSVC (binary) " +
          "or softmax (compat=softmax_multiclass, k > 2)")
    case ("classification", "linear_svm") =>
      // sklearn's LinearSVC is one-vs-rest multiclass; MLlib's is
      // binary-only, so k > 2 substitutes softmax (compat-flagged)
      linearClassifier("features")
    case ("regression", "linear_svm") if h.get("exact").contains("true") =>
      // sklearn-EXACT LinearSVR semantics: linear-kernel ε-SVR through
      // the same capped SMO dual (the linear kernel makes the Gram
      // rank-p, but the dual solve is identical) — opt-in
      new GraftSvm().setSvmTask("svr").setKernel("linear")
        .setRegC(hp(h, "C", 1.0)).setEpsilon(hp(h, "epsilon", 0.0))
        .setTol(hp(h, "tol", 1e-3)).setMaxRows(hpi(h, "max_rows", 2000))
    case ("regression", "linear_svm") =>
      // sklearn LinearSVR is linear ε-insensitive regression; MLlib has
      // no ε-insensitive loss, so the scale path substitutes squared
      // loss (same policy as the RFF svm regressor), compat-flagged —
      // the exact=true SMO opt-in above keeps the true loss under a cap
      new LinearRegression().setSolver("normal")
        .setRegParam(hp(h, "alpha", 0.0001))
        .setMaxIter(hpi(h, "max_iter", 100))
    case ("classification", "nu_svm") if h.get("exact").contains("true") =>
      // sklearn-EXACT ν-SVC via the within-class SMO (Svm scaladoc);
      // multiclass runs the one-vs-one stack under the same cap
      new GraftSvm().setSvmTask("nusvc")
        .setNu(hp(h, "nu", 0.5)).setGamma(hp(h, "gamma", -1.0))
        .setKernel(h.getOrElse("kernel", "rbf"))
        .setProbability(h.get("probability").contains("true"))
        .setTol(hp(h, "tol", 1e-3)).setMaxRows(hpi(h, "max_rows", 2000))
    case ("classification", "svm") if h.get("exact").contains("true") =>
      // sklearn-EXACT C-SVC via the capped SMO dual (Svm scaladoc:
      // one-vs-one multiclass, gamma default 1/p; probability=true adds
      // the Platt sigmoid) — opt-in; RFF stays the default
      new GraftSvm().setSvmTask("svc")
        .setRegC(hp(h, "C", 1.0)).setGamma(hp(h, "gamma", -1.0))
        .setKernel(h.getOrElse("kernel", "rbf"))
        .setProbability(h.get("probability").contains("true"))
        .setTol(hp(h, "tol", 1e-3)).setMaxRows(hpi(h, "max_rows", 2000))
    case ("regression", "svm") if h.get("exact").contains("true") =>
      // sklearn-EXACT ε-SVR via the same SMO solver (2n-variable form)
      new GraftSvm().setSvmTask("svr")
        .setRegC(hp(h, "C", 1.0)).setEpsilon(hp(h, "epsilon", 0.1))
        .setGamma(hp(h, "gamma", -1.0))
        .setKernel(h.getOrElse("kernel", "rbf"))
        .setTol(hp(h, "tol", 1e-3)).setMaxRows(hpi(h, "max_rows", 2000))
    case ("classification", "svm") =>
      // reference `svm` defaults to the rbf (gaussian) kernel
      // (`linfa.rs:241-328`); kernel machines don't scale past a
      // single-node Gram matrix, so the Spark-first equivalent is the
      // RFF feature map + a linear SVM (see RFFTransformer). kernel =
      // 'linear' opts into the plain LinearSVC.
      if (h.getOrElse("kernel", "rbf") == "linear")
        linearClassifier("features")
      else new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 100))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        linearClassifier("rff_features")))
    case ("regression", "svm") =>
      // SVR approximation: RFF map + linear least squares (epsilon-
      // insensitive loss is not in MLlib; squared loss documented)
      new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 100))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        new LinearRegression().setRegParam(hp(h, "alpha", 1.0))
          .setMaxIter(hpi(h, "max_iter", 100)).setFeaturesCol("rff_features")))
    case ("classification", "perceptron") if h.get("exact").contains("true") =>
      // TRUE sequential perceptron (SGD perceptron loss, eta0=1) under
      // the row cap — opt-in; the logistic stand-in stays the default
      new GramRegression().setSolver("perceptron_sequential")
        .setMaxIter(hpi(h, "max_iter", 1000)).setTol(hp(h, "tol", 1e-3))
        .setSeed(seed).setMaxRows(hpi(h, "max_rows", 100000))
    case ("classification", "perceptron") =>
      new LogisticRegression().setMaxIter(hpi(h, "max_iter", 100)).setRegParam(0.0)
    case ("classification", "nu_svm") =>
      new Pipeline().setStages(Array(
        new RFFTransformer().setInputCol("features").setOutputCol("rff_features")
          .setNumComponents(hpi(h, "n_components", 100))
          .setGamma(hp(h, "gamma", -1.0)).setSeed(seed),
        linearClassifier("rff_features")))
    case ("classification", "bagging") =>
      // sklearn BaggingClassifier scheme (per-estimator bootstrap +
      // per-estimator feature subsets + soft voting) — see Bagging.scala
      new BaggingClassifier().setNumEstimators(hpi(h, "n_estimators", 10))
        .setMaxSamples(hp(h, "max_samples", 1.0))
        .setMaxFeatures(hp(h, "max_features", 1.0))
        .setBootstrap(hpb(h, "bootstrap", true))
        .setBootstrapFeatures(hpb(h, "bootstrap_features", false))
        .setBootstrapMode(h.getOrElse("bootstrap_mode", "poisson"))
        // 30 = Spark's depth ceiling ≈ sklearn's unpruned default tree
        .setMaxDepth(hpi(h, "max_depth", 30)).setSeed(seed)
    // ---------------- clustering
    case ("clustering", "kmeans" | "mini_batch_kmeans") =>
      new KMeans().setK(hpi(h, "n_clusters", 8)).setSeed(seed)
        .setMaxIter(hpi(h, "max_iter", 300))
    case ("clustering", "birch") =>
      new BisectingKMeans().setK(hpi(h, "n_clusters", 8)).setSeed(seed)
    case ("clustering", "mean_shift") =>
      new MeanShift().setBandwidth(hp(h, "bandwidth", -1.0))
        .setMaxIter(hpi(h, "max_iter", 30))
    case ("clustering", "affinity_propagation") =>
      new AffinityPropagation().setDamping(hp(h, "damping", 0.5))
        .setMaxIter(hpi(h, "max_iter", 200))
    // ---------------- decomposition
    case ("decomposition", "pca") =>
      new PCA().setK(hpi(h, "n_components", 2))
    case (t, a) =>
      throw new IllegalArgumentException(
        s"algorithm '$a' for task '$t' has no Spark MLlib equivalent " +
          s"(reference dispatches it to sklearn; see SURVEY §2.4 gap policy)")
  } }

  /** Cartesian product of fixed hyperparams × search_params, reference
    * semantics (`src/orm/model.rs:451-506`): a key in both maps is an
    * error; random search draws n_iter combos (seeded, deterministic). */
  def allHyperparams(fixed: Map[String, String], searchParams: Map[String, Seq[String]],
      search: Option[String], nIter: Int, seed: Long): Seq[Map[String, String]] = {
    searchParams.keys.find(fixed.contains).foreach { k =>
      throw new IllegalArgumentException(
        s"`$k` cannot be present in both hyperparams and search_params. Please choose one or the other.")
    }
    val names = fixed.keys.toSeq ++ searchParams.keys.toSeq
    val values: Seq[Seq[String]] =
      fixed.values.map(Seq(_)).toSeq ++ searchParams.values.toSeq
    val gridSize = values.foldLeft(1L)((a, vs) => a * math.max(vs.size, 1))
    val chosen = search match {
      case Some("random") =>
        // draw n_iter DISTINCT index tuples directly — materializing the
        // full cartesian product just to shuffle-take n_iter of it is
        // O(grid) driver memory for a method whose whole point is NOT
        // visiting the grid (6 keys × 10 values = 1M combos for 10 draws)
        val rnd = new scala.util.Random(seed)
        val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Int]]
        val want = math.min(nIter.toLong, gridSize).toInt
        while (seen.size < want)
          seen += values.map(vs => rnd.nextInt(math.max(vs.size, 1)))
        seen.toSeq.map(idx => values.zip(idx).map { case (vs, i) => vs(i) })
      case _ =>
        values.foldLeft(Seq(Seq.empty[String])) { (acc, vs) =>
          acc.flatMap(combo => vs.map(combo :+ _))
        }
    }
    val combos = if (chosen.isEmpty) Seq(Seq.empty[String]) else chosen
    combos.map(vals => names.zip(vals).toMap)
  }

  /** Contiguous k-fold over the ordered train rows — the reference's
    * `Dataset::fold` (`src/orm/dataset.rs:38-74`): fold k's validation
    * slice is rows [k·(n/folds), (k+1)·(n/folds)). */
  private def foldSlices(n: Long, folds: Int): Seq[(Long, Long)] = {
    val size = n / folds
    (0 until folds).map(k => (k * size + 1, (k + 1) * size)) // 1-based inclusive
  }

  /** Whether the nearest-equivalent substitution was applied. */
  private[ml] def compatNote(algorithm: String, h: Map[String, String],
      numClasses: => Int = 2, task: String = ""): Map[String, String] =
    algorithm match {
    case "linear_svm" if task == "regression" && h.get("exact").contains("true") =>
      Map.empty // capped SMO linear ε-SVR — nothing substituted
      // (classification exact=true never reaches here — estimatorFor
      // refuses it, so no flag-free approximation can enter the ledger)
    case "linear_svm" if task == "regression" =>
      // sklearn LinearSVR's ε-insensitive loss has no MLlib twin — the
      // scale path trains squared loss, flagged
      Map("compat" -> "squared_loss_svr")
    case "linear_svm" if numClasses > 2 =>
      // sklearn LinearSVC is OvR squared-hinge; MLlib's is binary-only,
      // so multiclass substitutes multinomial logistic — flagged
      Map("compat" -> "softmax_multiclass")
    case "xgboost" | "hist_gradient_boosting" =>
      // native second-order histogram boosting IS the xgboost scheme
      // (HistGB scaladoc) — nothing substituted
      Map.empty
    case "lightgbm" =>
      // native leaf-wise (best-first) growth under num_leaves — the
      // LightGBM scheme; GOSS/EFB samplings are off in LightGBM's
      // default gbdt mode, so nothing is substituted
      Map.empty
    case "catboost" =>
      // native oblivious/symmetric trees; boosting_type=Ordered runs
      // the real ordered scheme (HistGBCore.fitOrdered) for EVERY
      // objective — multiclass softmax included since r15 — and needs
      // no flag. The default is plain (CatBoost's boosting_type=Plain,
      // its large-dataset default), flagged so the ledger states it.
      if (h.get("boosting_type").exists(_.equalsIgnoreCase("ordered")))
        Map.empty
      else Map("compat" -> "plain_boosting")
    // ada_boost: SAMME / AdaBoost.R2 are sklearn's own algorithms —
    // nothing substituted, no flag
    case "kernel_ridge" | "gaussian_process" | "svm" | "nu_svm" |
         "passive_aggressive" | "perceptron" | "quantile"
        if h.get("exact").contains("true") =>
      Map.empty // sklearn-exact capped solve — nothing substituted
    case "quantile" => Map("compat" -> "pinball_irls_approx")
    case "passive_aggressive" =>
      // the distributed default is partition-averaged PA, not the
      // sequential online scheme — surface the flag in hyperparams,
      // not just the GramSolvers ledger scaladoc
      Map("compat" -> "pa_partition_averaged")
    case "svm" | "kernel_ridge" | "nu_svm" => Map("compat" -> "rff_kernel_approx")
    case "gaussian_process" => Map("compat" -> "rff_gp_approx")
    case "bayesian_ridge" => Map("compat" -> "ridge_point_estimate")
    // bagging is now the sklearn scheme itself (Bagging.scala); the
    // one stated substitution is the Poisson bootstrap in place of an
    // exact-n resample (Chamandy et al. 2012 — the data-parallel form).
    // bootstrap_mode=exact (capped opt-in) removes even that: every
    // estimator then trains on exactly max_samples rows, flag-free
    case "bagging" if h.get("bootstrap_mode").contains("exact") => Map.empty
    case "bagging" => Map("compat" -> "poisson_bootstrap")
    case "perceptron" => Map("compat" -> "logistic")
    case "mini_batch_kmeans" => Map("compat" -> "kmeans")
    case "birch" => Map("compat" -> "bisecting_kmeans")
    case _ => Map.empty
  }

  private def resolveRelation(spark: SparkSession, cfg: TrainConfig): DataFrame =
    cfg.data.getOrElse {
      if (spark.catalog.tableExists(cfg.relationName)) spark.table(cfg.relationName)
      else spark.read.parquet(cfg.relationName)
    }

  /** End-to-end train. Returns the reference's one-row contract
    * (project, task, algorithm, deploy) — `src/api.rs:190-193`. */
  def train(spark: SparkSession, catalog: Catalog, cfg: TrainConfig): DataFrame = {
    val t0 = System.nanoTime()
    val project = catalog.findProject(cfg.projectName) match {
      case Some(p) =>
        require(p.task == cfg.task,
          s"Project ${cfg.projectName} already exists with a different task: ${p.task}")
        p
      case None => catalog.createProject(cfg.projectName, cfg.task)
    }

    val df = resolveRelation(spark, cfg)
    val supervised = cfg.task == "regression" || cfg.task == "classification"
    // multi-output regression (reference: sklearn MultiOutputRegressor,
    // `sklearn.py:119-134`): one fitted regressor per target column
    val multiTarget = cfg.task == "regression" && cfg.yColumn.size > 1
    // multi-target is a regression feature (train_joint, api.rs:494-693);
    // silently training on yColumn.head while the snapshot records every
    // target as modeled would be a lying catalog row
    require(cfg.task == "regression" || cfg.yColumn.size <= 1,
      s"multi-target (${cfg.yColumn.size} y columns) is regression-only; " +
        s"task '${cfg.task}' trains a single label")
    if (multiTarget) require(cfg.search.isEmpty && cfg.searchParams.isEmpty,
      "hyperparameter search is single-target only")
    val labelCol = cfg.yColumn.headOption.getOrElse("__no_label")
    val featureCols = df.columns.filterNot(cfg.yColumn.contains).toSeq
    val orderCols = if (cfg.orderCols.nonEmpty) cfg.orderCols else Seq(df.columns.head)

    val snapshot = catalog.createSnapshot(cfg.relationName, cfg.yColumn, cfg.testSize,
      cfg.testSampling, df.schema.json)

    // split (stratified only makes sense for classification labels).
    // Default path: seeded hash split — per-row membership test, zero
    // shuffles, no count job; a uniform hash is stratified in
    // expectation per class. `last` sampling and absolute test counts
    // need the ordered head/tail cut; orderedSplit=true opts into it for
    // exact reference-parity sizes.
    val strategy =
      if (!supervised) Sampling.RandomSampling
      else if (cfg.task == "regression" && cfg.testSampling == "stratified") Sampling.RandomSampling
      else Sampling.parse(cfg.testSampling)
    val (trainDF, testDF) =
      if (!supervised) (df, df)
      else if (!cfg.orderedSplit && strategy != Sampling.LastSampling && cfg.testSize <= 1.0) {
        // hash the WHOLE row, not a subset: hashing a low-cardinality
        // key (e.g. the label used as order key) correlates membership
        // with that key and can put entire classes on one side
        val (tr, te) = Sampling.splitByFraction(df, df.columns.toSeq, cfg.testSize, cfg.seed)
        // tiny-relation fallback: binomial noise can empty a side on
        // small inputs — take the exact ordered cut instead (isEmpty
        // reads at most one partition, negligible at scale)
        if (tr.isEmpty || te.isEmpty)
          Sampling.split(df, strategy, cfg.yColumn, orderCols, cfg.testSize, cfg.seed)
        else (tr, te)
      } else Sampling.split(df, strategy, cfg.yColumn, orderCols, cfg.testSize, cfg.seed)

    // snapshot materialization (`snapshot.rs:641-649`): the reference
    // CTAS's the SAMPLED query, so freeze the post-split frames — not
    // the raw input — as tables under the catalog
    if (cfg.materializeSnapshot) {
      trainDF.write.mode("overwrite")
        .parquet(s"${catalog.baseDir}/snapshot_${snapshot.id}/train")
      testDF.write.mode("overwrite")
        .parquet(s"${catalog.baseDir}/snapshot_${snapshot.id}/test")
    }

    // preprocess (impute/scale/encode per config) — fitted on TRAIN only,
    // compiled into persistable pipeline stages (SQLTransformer+assembler)
    def castTargets(d: DataFrame): DataFrame =
      if (supervised) cfg.yColumn.foldLeft(d)((acc, t) => acc.withColumn(t, col(t).cast("double")))
      else d
    val trainForFit = castTargets(trainDF)
    val fitted = Preprocess.fit(trainForFit, featureCols,
      if (supervised) Some(labelCol) else None, cfg.preprocess)

    // fit preprocessing ONCE on train; folds/combos refit only the
    // estimator over the cached processed frame (reference shape:
    // tabular_dataset materializes once, folds slice it).
    val preModel = new Pipeline().setStages(fitted.stages.toArray).fit(trainForFit)
    val procTrain = preModel.transform(trainForFit).cache()
    val testForFit = castTargets(testDF)
    val procTest = preModel.transform(testForFit)

    /** Output column for target index i ("prediction" for the first —
      * the single-target contract is unchanged). */
    def predColFor(i: Int) = if (i == 0) "prediction" else s"prediction_$i"

    // distinct label count drives the SVM-family dispatch (binary hinge
    // vs multiclass softmax/one-vs-one). LAZY + passed by name: only the
    // dispatch cases that consult it (svm/nu_svm/linear_svm
    // classification) ever pay the distinct-count job — a random-forest
    // fit must not run an extra pass over the training data for a value
    // its estimator never reads. Cached after first force, so a search
    // grid prices it once.
    lazy val numClasses: Int =
      if (cfg.task == "classification" && supervised)
        procTrain.select(col(labelCol)).na.drop().distinct().count().toInt
      else 2

    def fitOne(h: Map[String, String], data: org.apache.spark.sql.DataFrame,
        labelC: String = labelCol, predC: String = "prediction") = {
      val e = estimatorFor(cfg.task, cfg.algorithm, h, cfg.seed, numClasses)
      e match {
        case p: org.apache.spark.ml.Predictor[_, _, _] =>
          p.setLabelCol(labelC).setFeaturesCol("features").setPredictionCol(predC); ()
        case pl: Pipeline => // RFF + linear stage: featuresCol pre-wired
          pl.getStages.foreach {
            case p: org.apache.spark.ml.Predictor[_, _, _] =>
              p.setLabelCol(labelC).setPredictionCol(predC); ()
            case _ => ()
          }
        case k: KMeans => k.setFeaturesCol("features"); ()
        case b: BisectingKMeans => b.setFeaturesCol("features"); ()
        case p: PCA => p.setInputCol("features").setOutputCol("pca_features"); ()
        case _ => ()
      }
      e.asInstanceOf[org.apache.spark.ml.Estimator[_]].fit(data)
        .asInstanceOf[org.apache.spark.ml.Transformer]
    }
    def quickScore(pred: org.apache.spark.sql.DataFrame): Double = cfg.task match {
      case "regression" => Metrics.regression(pred, labelCol, "prediction").r2
      case "classification" => Metrics.classification(pred, labelCol, "prediction").f1Macro
      case t => throw new IllegalArgumentException(s"search unsupported for task: $t")
    }
    /** One (fit, score) cell of the search matrix → (score, fit_time,
      * score_time) — the timings feed search_results parity. */
    def scoredFit(h: Map[String, String], tr: org.apache.spark.sql.DataFrame,
        va: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      // an empty fold (training set smaller than cv, or a degenerate
      // hash/slice) would NPE regression scoring or feed NaN into the
      // maxBy selection (NaN wins under TotalOrdering) — name the fix
      require(!va.isEmpty && !tr.isEmpty,
        s"empty CV fold — training rows < cv folds? reduce cv (searchArgs)")
      val t0 = System.nanoTime()
      val m = fitOne(h, tr)
      val t1 = System.nanoTime()
      val sc = quickScore(m.transform(va))
      (sc, (t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
    }

    // hyperparameter search (grid | random × k-fold CV), reference
    // defaults: n_iter=10, cv=5 when searching else 1 (`model.rs:732-740`)
    val nIter = cfg.searchArgs.get("n_iter").map(_.toInt).getOrElse(10)
    val combos = allHyperparams(cfg.hyperparams, cfg.searchParams, cfg.search, nIter, cfg.seed)
    // cv keys on whether a SEARCH is actually running (combos > 1 — a
    // bare searchParams grid without `search` still searches), not on
    // the search flag alone: a cv<2 search would select the best combo
    // on procTest, the same held-out slice the final metrics report —
    // test-set leakage into model selection. Reference default is cv=5
    // when searching (`model.rs:732-740`).
    val cv = cfg.searchArgs.get("cv").map(_.toInt)
      .getOrElse(if (cfg.search.isDefined || combos.size > 1) 5 else 1)
    require(combos.size <= 1 || cv >= 2,
      s"hyperparameter search with cv=$cv would select on the held-out " +
        "test set (leakage); use cv >= 2")
    val (bestHyper, searchResults) =
      if (combos.size <= 1 && cfg.search.isEmpty) (cfg.hyperparams, "")
      else {
        val scores: Seq[Seq[(Double, Double, Double)]] = // combos × folds
          if (cv >= 2) {
            // fold membership predicates: hash-mod fold ids by default
            // (one map-stage column, no global ordering); contiguous
            // reference-parity slices under orderedSplit (distributed
            // two-phase row numbering, never a single-partition window)
            val (cvd, folds): (DataFrame, Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)]) =
              if (cfg.orderedSplit) {
                val d = graft.operators.Distributed
                  .withRowNumber(procTrain, "__cv", orderCols.map(col)).cache()
                val slices = foldSlices(d.count(), cv)
                (d, slices.map { case (lo, hi) =>
                  (col("__cv") < lo || col("__cv") > hi,
                    col("__cv") >= lo && col("__cv") <= hi)
                })
              } else {
                // hash the WHOLE row (every non-vector column), not just
                // orderCols: a low-cardinality order key (or one that
                // correlates with the label) would make folds degenerate
                // or empty — the same rule the split path applies above
                val hashCols = procTrain.schema.fields
                  .filter(_.dataType != org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
                  .map(f => col(f.name)).toSeq
                val d = procTrain.withColumn("__cv",
                  pmod(xxhash64((lit(cfg.seed + 7) +: hashCols): _*),
                    lit(cv.toLong))).cache()
                (d, (0 until cv).map(k =>
                  (col("__cv") =!= k, col("__cv") === k)))
              }
            val out = combos.map { h =>
              folds.map { case (trP, vaP) =>
                scoredFit(h, cvd.filter(trP), cvd.filter(vaP))
              }
            }
            cvd.unpersist(); out
          } else combos.map(h => Seq(scoredFit(h, procTrain, procTest)))
        val means = scores.map(s => s.map(_._1).sum / s.size)
        val bestIdx = means.zipWithIndex.maxBy { case (m, i) => (m, -i) }._2
        def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
        def mean(xs: Seq[Double]) = xs.sum / xs.size
        def std(xs: Seq[Double]) = {
          val m = mean(xs)
          math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.size)
        }
        // full reference search_results shape (`src/orm/model.rs:716-895`):
        // per-combo fit/score-time mean+std, per-FOLD split{k}_test_score
        // vectors across combos, and one param_<name> vector per swept key
        val paramsJson = combos.map(h =>
          h.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}"))
          .mkString("[", ",", "]")
        val testScores = scores.map(_.map(_._1))
        val fitTimes = scores.map(_.map(_._2))
        val scoreTimes = scores.map(_.map(_._3))
        val nFolds = scores.head.size
        val splitKeys = (0 until nFolds).map { k =>
          s""""split${k}_test_score":${arr(testScores.map(_(k)))}"""
        }.mkString(",")
        val paramKeys = combos(bestIdx).keys.toSeq.sorted.map { p =>
          s""""param_$p":${combos.map(h => "\"" + h.getOrElse(p, "") + "\"")
            .mkString("[", ",", "]")}"""
        }.mkString(",")
        val json = s"""{"params":$paramsJson,"n_splits":$cv,"best_index":$bestIdx,""" +
          s""""mean_fit_time":${arr(fitTimes.map(mean))},"std_fit_time":${arr(fitTimes.map(std))},""" +
          s""""mean_score_time":${arr(scoreTimes.map(mean))},"std_score_time":${arr(scoreTimes.map(std))},""" +
          s""""mean_test_score":${arr(means)},"std_test_score":${arr(testScores.map(std))},""" +
          splitKeys + (if (paramKeys.nonEmpty) "," + paramKeys else "") + "}"
        (combos(bestIdx), json)
      }

    // one estimator per target (single-target = one stage, unchanged).
    // Targets are INDEPENDENT regressors over the same cached frame, so
    // their fits overlap (guide §2.6, FitPool) — stage order stays the
    // target order, and each fit is self-contained, so the pipeline is
    // identical at any parallelism (TrainLifecycleSpec's linnerud gate).
    val estStages =
      if (multiTarget) FitPool.indexed(spark, cfg.yColumn.size,
        "spark.graft.mlFitParallelism") { i =>
        fitOne(bestHyper, procTrain, cfg.yColumn(i), predColFor(i))
      } else Seq(fitOne(bestHyper, procTrain))
    // all-transformer pipeline: fit() on an empty slice is a no-op that
    // packages (preprocessing, estimator models) into one persistable unit
    val model = new Pipeline().setStages((preModel +: estStages).toArray)
      .fit(trainForFit.limit(0))
    procTrain.unpersist()
    val fitTime = (System.nanoTime() - t0) / 1e9

    // metrics on the test split
    val t1 = System.nanoTime()
    val metrics: Map[String, Double] = cfg.task match {
      case "regression" =>
        val pred = model.transform(castTargets(testDF))
        if (multiTarget) {
          // uniform average across targets — sklearn
          // MultiOutputRegressor.score semantics — plus per-target r2
          val per = cfg.yColumn.zipWithIndex.map { case (t, i) =>
            Metrics.regression(pred, t, predColFor(i))
          }
          def avg(f: Metrics.RegressionReport => Double) = per.map(f).sum / per.size
          Map("r2" -> avg(_.r2), "mean_absolute_error" -> avg(_.mae),
            "mean_squared_error" -> avg(_.mse)) ++
            per.zipWithIndex.map { case (r, i) => s"r2_$i" -> r.r2 }
        } else {
          val r = Metrics.regression(pred, labelCol, "prediction")
          Map("r2" -> r.r2, "mean_absolute_error" -> r.mae, "mean_squared_error" -> r.mse)
        }
      case "classification" =>
        val pred = model.transform(testDF.withColumn(labelCol, col(labelCol).cast("double")))
        val rep = Metrics.classification(pred, labelCol, "prediction")
        val base = Map("f1" -> rep.f1Macro, "f1_micro" -> rep.f1Micro,
          "precision" -> rep.precision, "recall" -> rep.recall, "accuracy" -> rep.accuracy)
        // the binary-extras gate keys on the MODEL's class count, not
        // the test slice's: a 3-class model whose small test split
        // happens to carry 2 label values would otherwise record a
        // bogus roc_auc/log_loss from one entry of a k-class softmax
        val classes = model.stages.collectFirst {
          case c: org.apache.spark.ml.classification.ClassificationModel[_, _] =>
            c.numClasses.toLong
        }.getOrElse(pred.select(col(labelCol).cast("int")).distinct().count())
        if (classes == 2 && pred.columns.contains("probability")) {
          val p1 = element_at(
            org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
          val auc = Metrics.rocAuc(
            pred.withColumn("p1", p1.cast("double"))
              .withColumn("y", col(labelCol).cast("double") === 1.0), "y", "p1")
          val ll = Metrics.logLoss(
            pred.withColumn("p1", p1.cast("double")), labelCol, "p1")
          base + ("roc_auc" -> auc, "log_loss" -> ll)
        } else base
      case "clustering" =>
        val pred = model.transform(testDF)
        Map("silhouette" -> new ClusteringEvaluator().setFeaturesCol("features").evaluate(pred))
      case "decomposition" =>
        val pcaModel = model.stages.last.asInstanceOf[org.apache.spark.ml.feature.PCAModel]
        Map("cumulative_explained_variance" -> pcaModel.explainedVariance.toArray.sum)
      case t => throw new IllegalArgumentException(s"unsupported task: $t")
    }
    val scoreTime = (System.nanoTime() - t1) / 1e9
    val allMetrics = metrics + ("fit_time" -> fitTime, "score_time" -> scoreTime)

    // persist model + catalog rows
    val modelRow = catalog.createModel(project.id, snapshot.id, cfg.algorithm,
      bestHyper ++ compatNote(cfg.algorithm, cfg.hyperparams, numClasses, cfg.task) ++
        (if (searchResults.nonEmpty) Map("search_results" -> searchResults) else Map.empty),
      allMetrics, cfg.search.getOrElse("none"))
    val path = s"${catalog.baseDir}/model_files/${modelRow.id}"
    PipelineIO.save(model, path) // driver-side, zero jobs (r21)
    catalog.addFile(modelRow.id, path)
    // training log (`quackml.logs` — reference `src/bindings/mod.rs:15-40`)
    catalog.addLog(modelRow.id,
      s"trained ${cfg.algorithm} for ${cfg.task}: " +
        allMetrics.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

    // deployment decision (`src/api.rs:600-685`)
    val targetMetric = defaultTargetMetric(cfg.task)
    val deployed = catalog.deployedModels
      .filter(col("name") === cfg.projectName)
      .select(element_at(col("metrics"), targetMetric)).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val shouldDeploy = cfg.automaticDeploy && (deployed match {
      case None => true
      case Some(old) => valueIsBetter(cfg.task, metrics.getOrElse(targetMetric, Double.NaN), old)
    })
    if (shouldDeploy) catalog.deploy(project.id, modelRow.id, "new_score")

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("task", StringType),
      StructField("algorithm", StringType), StructField("deploy", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(cfg.projectName, cfg.task, cfg.algorithm, shouldDeploy)),
      schema)
  }
}
