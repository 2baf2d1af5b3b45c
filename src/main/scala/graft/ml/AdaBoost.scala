package graft.ml

import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayParam, DoubleParam, IntArrayParam, IntParam, LongParam, ParamMap}
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import scala.collection.mutable.ArrayBuffer

/** EXACT AdaBoost — the reference's `ada_boost` dispatch
  * (`/root/reference/src/bindings/sklearn.rs` routes it to sklearn's
  * AdaBoostClassifier/AdaBoostRegressor). Earlier rounds substituted
  * MLlib GBT (`compat=gbt`); these estimators train the published
  * algorithms scheme-exactly:
  *
  * - classification: SAMME (Hastie, Rosset, Zhu & Zou 2009 — sklearn's
  *   current algorithm; the deprecated SAMME.R variant is gone from
  *   sklearn ≥ 1.6): per round, a weight-fitted depth-1 tree (sklearn's
  *   default stump), weighted error ε, stage weight
  *   α = η·(ln((1−ε)/ε) + ln(K−1)), multiplicative weight update on
  *   misclassified rows, renormalize. Predict = argmax of α-weighted
  *   votes.
  * - regression: AdaBoost.R2 (Drucker 1997): linear loss normalized by
  *   the round's max error, average loss L̄, β = L̄/(1−L̄),
  *   α = η·ln(1/β), weight update β^(η·(1−l_i)), prediction = the
  *   α-WEIGHTED MEDIAN over stages (sklearn's `_get_median_predict`).
  *
  * Spark shape: each round fits MLlib's distributed
  * DecisionTree(Classifier|Regressor) with a `weightCol` — the weight
  * vector IS a column, updated by one map and renormalized by one
  * aggregate per round, localCheckpoint-ed so round N never replays
  * 0..N−1. The fitted trees are flattened into the same stride-5
  * node encoding as [[HistGBCore]] (real thresholds, `v <= thr` goes
  * left — MLlib's own ContinuousSplit predicate), so the persisted
  * model is plain param arrays (DefaultParamsWritable) and row-predict
  * walks the flat arrays with [[HistGBCore.leafByValues]].
  */
private[ml] object AdaBoostCore {
  /** Flatten a fitted MLlib tree to the HistGBCore stride-5 encoding.
    * Only continuous splits can occur here — the train() surface feeds
    * assembled numeric features with no categorical metadata. */
  def flatten(root: Node): Array[Double] = {
    val nodes = ArrayBuffer.empty[Array[Double]]
    def rec(n: Node): Int = {
      val idx = nodes.length
      nodes += null
      n match {
        case l: LeafNode =>
          nodes(idx) = Array(-1.0, 0.0, -1.0, -1.0, l.prediction)
        case in: InternalNode =>
          val sp = in.split match {
            case c: ContinuousSplit => c
            case other => throw new IllegalStateException(
              s"unexpected categorical split on the continuous-feature path: $other")
          }
          val li = rec(in.leftChild)
          val ri = rec(in.rightChild)
          nodes(idx) = Array(sp.featureIndex.toDouble, sp.threshold,
            li.toDouble, ri.toDouble, 0.0)
      }
      idx
    }
    rec(root)
    nodes.flatten.toArray
  }
}

private[ml] trait AdaBoostParams extends org.apache.spark.ml.param.Params {
  final val numRounds = new IntParam(this, "numRounds", "boosting rounds (n_estimators)")
  final val maxDepth = new IntParam(this, "maxDepth", "base-tree depth")
  final val stepSize = new DoubleParam(this, "stepSize", "learning rate")
  final val seed = new LongParam(this, "seed", "base-tree seed")
  setDefault(numRounds -> 50, stepSize -> 1.0, seed -> 42L)
}

/** Flat forest + per-stage weights (model side). */
private[ml] trait AdaBoostModelParams extends org.apache.spark.ml.param.Params {
  final val treesFlat = new DoubleArrayParam(this, "treesFlat",
    "flat node arrays, HistGBCore stride-5 encoding")
  final val treeOffsets = new IntArrayParam(this, "treeOffsets",
    "per-tree start offsets (+ terminal end)")
  final val alphas = new DoubleArrayParam(this, "alphas", "stage weights")
}

class AdaBoostClassificationModel(override val uid: String)
    extends ProbabilisticClassificationModel[Vector, AdaBoostClassificationModel]
    with AdaBoostModelParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("adabcm"))
  final val nClasses = new IntParam(this, "nClasses", "number of classes")
  override def numClasses: Int = $(nClasses)

  /** α-weighted vote tally per class. */
  override def predictRaw(features: Vector): Vector = {
    val flat = $(treesFlat); val off = $(treeOffsets); val a = $(alphas)
    val votes = new Array[Double]($(nClasses))
    var t = 0
    while (t < off.length - 1) {
      val c = HistGBCore.leafByValues(flat, off(t), off(t + 1), features).toInt
      votes(c) += a(t)
      t += 1
    }
    Vectors.dense(votes)
  }

  /** Vote shares (Σ=1) — the tally normalized, stated as such (the
    * deprecated SAMME.R logit transform is not reproduced). */
  override protected def raw2probabilityInPlace(raw: Vector): Vector = {
    val v = raw.asInstanceOf[DenseVector].values
    var z = 0.0; var i = 0
    while (i < v.length) { z += v(i); i += 1 }
    if (z > 0) { i = 0; while (i < v.length) { v(i) /= z; i += 1 } }
    raw
  }
  override def copy(extra: ParamMap): AdaBoostClassificationModel = defaultCopy(extra)
}
object AdaBoostClassificationModel
  extends DefaultParamsReadable[AdaBoostClassificationModel]

class AdaBoostClassifier(override val uid: String)
    extends ProbabilisticClassifier[Vector, AdaBoostClassifier, AdaBoostClassificationModel]
    with AdaBoostParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("adabc"))
  setDefault(maxDepth -> 1) // sklearn's default base estimator: a stump
  def setNumRounds(v: Int): this.type = set(numRounds, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setStepSize(v: Double): this.type = set(stepSize, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override protected def train(ds: Dataset[_]): AdaBoostClassificationModel = {
    val k = getNumClasses(ds)
    val n = ds.count().toDouble
    require(n > 0, "ada_boost needs at least one training row")
    var df: DataFrame = ds.select(col($(featuresCol)).as("f"),
        col($(labelCol)).cast(DoubleType).as("y"))
      .na.drop().withColumn("w", lit(1.0 / n)).localCheckpoint()
    val trees = ArrayBuffer.empty[Array[Double]]
    val stageAlpha = ArrayBuffer.empty[Double]
    var m = 0
    var stop = false
    while (m < $(numRounds) && !stop) {
      val tree = new DecisionTreeClassifier()
        .setFeaturesCol("f").setLabelCol("y").setWeightCol("w")
        .setMaxDepth($(maxDepth)).setSeed($(seed) + m)
        .fit(df)
      val pred = tree.transform(df).select(col("f"), col("y"), col("w"),
        col("prediction").as("p"))
      val r = pred.agg(
        sum(when(col("y") =!= col("p"), col("w")).otherwise(lit(0.0))).as("e"),
        sum(col("w")).as("z")).head()
      val eps = r.getDouble(0) / r.getDouble(1)
      if (eps <= 0.0) {
        // perfect stage: sklearn records it with weight 1 and stops
        trees += AdaBoostCore.flatten(tree.rootNode)
        stageAlpha += 1.0
        stop = true
      } else if (eps >= 1.0 - 1.0 / k) {
        // worse than random for K classes: discard and stop (sklearn
        // raises only when the FIRST stage is this bad)
        require(trees.nonEmpty,
          s"ada_boost base stump is no better than chance (weighted error $eps >= " +
            s"${1.0 - 1.0 / k}); a deeper base tree (max_depth) may help")
        stop = true
      } else {
        val alpha = $(stepSize) * (math.log((1.0 - eps) / eps) + math.log(k - 1.0))
        trees += AdaBoostCore.flatten(tree.rootNode)
        stageAlpha += alpha
        val updated = pred.withColumn("w",
            when(col("y") =!= col("p"), col("w") * lit(math.exp(alpha)))
              .otherwise(col("w")))
        val z = updated.agg(sum("w")).head().getDouble(0)
        val next = updated.withColumn("w", col("w") / lit(z))
          .select("f", "y", "w").localCheckpoint()
        df = next
      }
      m += 1
    }
    val offsets = ArrayBuffer(0)
    trees.foreach(t => offsets += offsets.last + t.length)
    val flat = trees.toArray.flatten
    val model = new AdaBoostClassificationModel(uid + "_m")
    model.set(model.treesFlat, flat)
      .set(model.treeOffsets, offsets.toArray)
      .set(model.alphas, stageAlpha.toArray)
      .set(model.nClasses, k)
    model.set(model.featuresCol, $(featuresCol))
      .set(model.predictionCol, $(predictionCol))
      .set(model.rawPredictionCol, $(rawPredictionCol))
      .set(model.probabilityCol, $(probabilityCol))
    model.setParent(this)
    model
  }
  override def copy(extra: ParamMap): AdaBoostClassifier = defaultCopy(extra)
}
object AdaBoostClassifier extends DefaultParamsReadable[AdaBoostClassifier]

class AdaBoostRegressionModel(override val uid: String)
    extends PredictionModel[Vector, AdaBoostRegressionModel]
    with AdaBoostModelParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("adabrm"))

  /** α-weighted median over stage predictions (AdaBoost.R2 / sklearn
    * `_get_median_predict`): sort stage predictions, take the first
    * whose cumulative α reaches half the total. */
  override def predict(features: Vector): Double = {
    val flat = $(treesFlat); val off = $(treeOffsets); val a = $(alphas)
    val t = off.length - 1
    val preds = new Array[(Double, Double)](t)
    var i = 0
    var total = 0.0
    while (i < t) {
      preds(i) = (HistGBCore.leafByValues(flat, off(i), off(i + 1), features), a(i))
      total += a(i)
      i += 1
    }
    java.util.Arrays.sort(preds, Ordering.by((p: (Double, Double)) => p._1))
    var cum = 0.0
    i = 0
    while (i < t) {
      cum += preds(i)._2
      if (cum >= 0.5 * total) return preds(i)._1
      i += 1
    }
    preds(t - 1)._1
  }
  override def copy(extra: ParamMap): AdaBoostRegressionModel = defaultCopy(extra)
}
object AdaBoostRegressionModel extends DefaultParamsReadable[AdaBoostRegressionModel]

class AdaBoostRegressor(override val uid: String)
    extends Predictor[Vector, AdaBoostRegressor, AdaBoostRegressionModel]
    with AdaBoostParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("adabr"))
  setDefault(maxDepth -> 3) // sklearn's default base DecisionTreeRegressor
  def setNumRounds(v: Int): this.type = set(numRounds, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setStepSize(v: Double): this.type = set(stepSize, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override protected def train(ds: Dataset[_]): AdaBoostRegressionModel = {
    val n = ds.count().toDouble
    require(n > 0, "ada_boost needs at least one training row")
    var df: DataFrame = ds.select(col($(featuresCol)).as("f"),
        col($(labelCol)).cast(DoubleType).as("y"))
      .na.drop().withColumn("w", lit(1.0 / n)).localCheckpoint()
    val trees = ArrayBuffer.empty[Array[Double]]
    val stageAlpha = ArrayBuffer.empty[Double]
    var m = 0
    var stop = false
    while (m < $(numRounds) && !stop) {
      val tree = new DecisionTreeRegressor()
        .setFeaturesCol("f").setLabelCol("y").setWeightCol("w")
        .setMaxDepth($(maxDepth)).setSeed($(seed) + m)
        .fit(df)
      val pred = tree.transform(df).select(col("f"), col("y"), col("w"),
        abs(col("prediction") - col("y")).as("err"))
      val emax = pred.agg(max("err")).head().getDouble(0)
      if (emax <= 0.0) {
        trees += AdaBoostCore.flatten(tree.rootNode)
        stageAlpha += 1.0
        stop = true
      } else {
        val withLoss = pred.withColumn("l", col("err") / lit(emax))
        val r = withLoss.agg(sum(col("w") * col("l")).as("lb"),
          sum(col("w")).as("z")).head()
        val lbar = r.getDouble(0) / r.getDouble(1)
        if (lbar >= 0.5) {
          require(trees.nonEmpty,
            s"ada_boost base tree average loss $lbar >= 0.5 on the first stage")
          stop = true
        } else {
          val beta = lbar / (1.0 - lbar)
          trees += AdaBoostCore.flatten(tree.rootNode)
          stageAlpha += $(stepSize) * math.log(1.0 / beta)
          val updated = withLoss.withColumn("w",
            col("w") * pow(lit(beta), (lit(1.0) - col("l")) * lit($(stepSize))))
          val z = updated.agg(sum("w")).head().getDouble(0)
          df = updated.withColumn("w", col("w") / lit(z))
            .select("f", "y", "w").localCheckpoint()
        }
      }
      m += 1
    }
    val offsets = ArrayBuffer(0)
    trees.foreach(t => offsets += offsets.last + t.length)
    val model = new AdaBoostRegressionModel(uid + "_m")
    model.set(model.treesFlat, trees.toArray.flatten)
      .set(model.treeOffsets, offsets.toArray)
      .set(model.alphas, stageAlpha.toArray)
    model.set(model.featuresCol, $(featuresCol))
      .set(model.predictionCol, $(predictionCol))
    model.setParent(this)
    model
  }
  override def copy(extra: ParamMap): AdaBoostRegressor = defaultCopy(extra)
}
object AdaBoostRegressor extends DefaultParamsReadable[AdaBoostRegressor]
