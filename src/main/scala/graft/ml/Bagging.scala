package graft.ml

import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.{BooleanParam, DoubleArrayParam, DoubleParam, IntArrayParam, IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.regression.DecisionTreeRegressor
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import scala.collection.mutable.ArrayBuffer

/** sklearn-scheme bagging — the reference's `bagging` dispatch
  * (`/root/reference/src/orm/model.rs:400,425` routes it to sklearn's
  * BaggingRegressor/BaggingClassifier over default DecisionTree base
  * estimators). Earlier rounds substituted MLlib RandomForest with
  * `featureSubsetStrategy("all")` — right for the DEFAULT knobs, but it
  * ignored `max_samples`, `max_features`, `bootstrap`,
  * `bootstrap_features`, and sklearn's Bagging subsets features PER
  * ESTIMATOR, not per split, which no RandomForest strategy expresses.
  * These estimators train the published scheme (Breiman 1996):
  *
  *  - per estimator i: a row sample (bootstrap → with replacement at
  *    rate `max_samples`; else without), a feature subset of
  *    ⌊max_features·d⌋ indices (without replacement unless
  *    `bootstrap_features`), and one DecisionTree fit on the sliced
  *    vectors.
  *  - classification predict: sklearn soft voting — the MEAN of the
  *    per-tree class distributions (each tree's leaf stores its
  *    training-class distribution, i.e. the tree's own predict_proba),
  *    argmax for the label.
  *  - regression predict: the mean of the per-tree predictions.
  *
  * Spark shape: each base tree is MLlib's distributed DecisionTree on a
  * seeded `df.sample` — the distributed substitute for an exact-n
  * bootstrap is the POISSON bootstrap (each row drawn Poisson(rate)
  * times; Chamandy et al. 2012, "Estimating uncertainty for massive
  * data streams" — the standard resample at data-parallel scale, where
  * exact-n draws would need a global index). Feature slicing happens
  * only at TRAIN time: after fitting, split feature ids are remapped
  * back to the original vector space, so the persisted model walks
  * unsliced rows and serving pays zero slicing cost. The fitted trees
  * flatten to the same stride-5 encoding as [[HistGBCore]]; for
  * classification each leaf's value slot points into a side array
  * holding that leaf's class distribution (the tree's impurity stats,
  * recovered from the tree's own `probability` output — one extra
  * O(rows) map + O(leaves) distinct per estimator). The estimators are
  * embarrassingly parallel — on a shared cluster the loop could submit
  * fits on FAIR scheduler pools; kept sequential here because the base
  * fits already use every core.
  */
private[ml] trait BaggingParams extends org.apache.spark.ml.param.Params {
  final val numEstimators = new IntParam(this, "numEstimators", "n_estimators")
  final val maxSamples = new DoubleParam(this, "maxSamples",
    "rows per estimator: fraction in (0,1] or absolute count above 1 (sklearn max_samples)")
  final val maxFeatures = new DoubleParam(this, "maxFeatures",
    "features per estimator: fraction in (0,1] or absolute count above 1 (sklearn max_features)")
  final val bootstrap = new BooleanParam(this, "bootstrap",
    "rows drawn with replacement (Poisson bootstrap)")
  final val bootstrapFeatures = new BooleanParam(this, "bootstrapFeatures",
    "features drawn with replacement")
  final val maxDepth = new IntParam(this, "maxDepth", "base-tree depth")
  final val seed = new LongParam(this, "seed", "sampling + base-tree seed")
  final val bootstrapMode = new Param[String](this, "bootstrapMode",
    "poisson (distributed default) | exact (sklearn exact-n resample, capped)",
    (v: String) => v == "poisson" || v == "exact")
  // maxDepth defaults to Spark's tree-depth ceiling (30): sklearn's
  // Bagging* base estimator is an UNPRUNED full-depth DecisionTree, and
  // a depth-5 default would quietly underfit relative to the reference
  // (ADVICE r13); max_depth stays an explicit knob for bounded trees
  setDefault(numEstimators -> 10, maxSamples -> 1.0, maxFeatures -> 1.0,
    bootstrap -> true, bootstrapFeatures -> false, maxDepth -> 30, seed -> 42L,
    bootstrapMode -> "poisson")
}

private[ml] object BaggingCore {
  /** Knob sanity up front — a zero-estimator fit would otherwise
    * surface later as a NaN mean vote. Values in (0, 1] are fractions;
    * values above 1 follow sklearn's INT form of the same knobs
    * (absolute counts) and must be whole numbers. */
  def validate(nEst: Int, maxSamples: Double, maxFeatures: Double): Unit = {
    require(nEst >= 1, s"bagging needs n_estimators >= 1, got $nEst")
    def knob(name: String, v: Double): Unit = {
      require(v > 0.0, s"bagging $name must be positive, got $v")
      require(v <= 1.0 || v == math.floor(v),
        s"bagging $name above 1 is an absolute count and must be whole, got $v")
    }
    knob("max_samples", maxSamples)
    knob("max_features", maxFeatures)
  }

  /** sklearn's dual-typed knob: a fraction in (0, 1] of `total`, or an
    * absolute count above 1 (capped at `total`); at least 1. */
  def resolveCount(v: Double, total: Int): Int =
    if (v <= 1.0) math.max(1, (v * total).toInt)
    else math.min(total, v.toInt)

  /** The row-sample fraction Spark's `sample` needs for the knob. */
  def resolveFraction(v: Double, total: Long): Double =
    if (v <= 1.0) v else math.min(1.0, v / total)

  /** Draw the per-estimator feature subset (sorted; may repeat when
    * withReplacement). Fraction knobs floor like sklearn, at least 1. */
  def drawFeatures(d: Int, maxFeatures: Double, withReplacement: Boolean,
      rng: scala.util.Random): Array[Int] = {
    val k = resolveCount(maxFeatures, d)
    if (!withReplacement && k >= d) Array.range(0, d)
    else if (withReplacement) Array.fill(k)(rng.nextInt(d)).sorted
    else rng.shuffle(List.range(0, d)).take(k).sorted.toArray
  }

  /** True when the subset is the identity — the default
    * max_features=1.0 path, where slicing would be a pure per-row copy
    * (and would densify sparse vectors) for nothing. */
  def isIdentity(idx: Array[Int], d: Int): Boolean =
    idx.length == d && {
      var i = 0
      while (i < d && idx(i) == i) i += 1
      i == d
    }

  /** Remap split feature ids from the sliced space back to the
    * original vector space, in place. Leaves have slot0 = -1. */
  def remapFeatures(flat: Array[Double], idx: Array[Int]): Unit = {
    var p = 0
    while (p < flat.length) {
      if (flat(p) >= 0) flat(p) = idx(flat(p).toInt).toDouble
      p += 5
    }
  }

  /** Walk to the leaf and return its NODE INDEX (not its value). */
  def leafIndex(tree: Array[Double], off: Int, v: Vector): Int = {
    var i = 0
    while (tree(off + i * 5) >= 0) {
      val f = tree(off + i * 5).toInt
      i = if (v(f) <= tree(off + i * 5 + 1)) tree(off + i * 5 + 2).toInt
          else tree(off + i * 5 + 3).toInt
    }
    i
  }

  /** Poisson-bootstrap (or plain) row sample; deterministic on a
    * checkpointed parent. A Poisson draw can come up empty on tiny
    * frames — fall back to the full frame (sklearn always trains on
    * exactly n rows, so empty is a small-data artifact, not a scheme
    * choice). */
  def sampleRows(df: DataFrame, withReplacement: Boolean, frac: Double,
      seed: Long): DataFrame = {
    val s = df.sample(withReplacement, frac, seed)
    if (s.head(1).isEmpty) df else s
  }

  /** Row cap for the EXACT bootstrap opt-in: the multiplicity vector is
    * n ints of driver/broadcast state (4 MB at the cap) — metadata
    * scale, the same capped-exact discipline as the kernel opt-ins. */
  val EXACT_BOOTSTRAP_CAP = 1000000L

  /** Fit `n` independent estimators with their tiny Spark stages
    * OVERLAPPED (guide §2.6; the CrossValidator-parallelism pattern):
    * each estimator's jobs are submitted from a pool thread so the
    * next fit's tasks back-fill executors idled by the current fit's
    * stragglers — on local[32] a 442-row tree fit leaves ~30 cores
    * idle per stage otherwise. Results return ORDERED BY INDEX and
    * each body is self-contained under its own seed, so the output is
    * identical at any parallelism. Parallelism is bounded (2–4 in
    * flight is enough to fill the tail — §2.6) and conf-overridable
    * via spark.graft.baggingFitParallelism (1 = sequential). */
  def fitIndexed[A](spark: org.apache.spark.sql.SparkSession, n: Int)(
      body: Int => A): Seq[A] =
    FitPool.indexed(spark, n, "spark.graft.baggingFitParallelism")(body)

  /** sklearn's exact resample (`bootstrap_mode=exact` opt-in): draw
    * EXACTLY k indices with replacement from a seeded generator, then
    * realize the sample distributed as per-row multiplicities joined on
    * the stable row order of the checkpointed parent — every estimator
    * trains on exactly k rows, closing the Poisson-vs-exact-n fidelity
    * flag where the cap allows. The default stays the Poisson bootstrap
    * ("law of large numbers for resampled data streams"): at corpus
    * scale a dense per-index count vector is the wrong shape, and
    * Poisson is the published data-parallel equivalent. */
  def sampleRowsExact(df: DataFrame, k: Long, seed: Long): DataFrame = {
    val n = df.count()
    require(n > 0, "bagging needs at least one training row")
    require(n <= EXACT_BOOTSTRAP_CAP,
      s"bootstrap_mode=exact draws a per-index multiplicity vector over $n " +
        s"rows (> $EXACT_BOOTSTRAP_CAP); the Poisson default is the " +
        "distributed route at this scale")
    val counts = new Array[Int](n.toInt)
    val rng = new scala.util.Random(seed)
    var i = 0L
    while (i < k) { counts(rng.nextInt(n.toInt)) += 1; i += 1 }
    val bc = df.sparkSession.sparkContext.broadcast(counts)
    // zipWithIndex is narrow and stable on the checkpointed parent; the
    // flatMap replays identically on every action (no seeded-sample
    // re-draw between the fit and the leaf-distribution pass)
    val rdd = df.rdd.zipWithIndex.flatMap { case (row, idx) =>
      Iterator.fill(bc.value(idx.toInt))(row)
    }
    df.sparkSession.createDataFrame(rdd, df.schema)
  }
}

/** Flat forest + per-leaf distributions (model side). */
private[ml] trait BaggingModelParams extends org.apache.spark.ml.param.Params {
  final val treesFlat = new DoubleArrayParam(this, "treesFlat",
    "flat node arrays, HistGBCore stride-5 encoding, original-space feature ids")
  final val treeOffsets = new IntArrayParam(this, "treeOffsets",
    "per-tree start offsets (+ terminal end)")
}

class BaggingClassificationModel(override val uid: String)
    extends ProbabilisticClassificationModel[Vector, BaggingClassificationModel]
    with BaggingModelParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("bagcm"))
  final val nClasses = new IntParam(this, "nClasses", "number of classes")
  /** Concatenated per-leaf class distributions; a classification leaf's
    * slot-4 value is its start index here. */
  final val leafDist = new DoubleArrayParam(this, "leafDist",
    "per-leaf class distributions, nClasses doubles each")
  override def numClasses: Int = $(nClasses)

  /** Sum of per-tree leaf distributions (sklearn soft voting up to the
    * 1/n_estimators factor, which argmax and normalization absorb). */
  override def predictRaw(features: Vector): Vector = {
    val flat = $(treesFlat); val off = $(treeOffsets); val dist = $(leafDist)
    val k = $(nClasses)
    val acc = new Array[Double](k)
    var t = 0
    while (t < off.length - 1) {
      val leaf = BaggingCore.leafIndex(flat, off(t), features)
      val pos = flat(off(t) + leaf * 5 + 4).toInt
      var c = 0
      while (c < k) { acc(c) += dist(pos + c); c += 1 }
      t += 1
    }
    Vectors.dense(acc)
  }

  override protected def raw2probabilityInPlace(raw: Vector): Vector = {
    val v = raw.asInstanceOf[DenseVector].values
    var z = 0.0; var i = 0
    while (i < v.length) { z += v(i); i += 1 }
    if (z > 0) { i = 0; while (i < v.length) { v(i) /= z; i += 1 } }
    raw
  }
  override def copy(extra: ParamMap): BaggingClassificationModel = defaultCopy(extra)
}
object BaggingClassificationModel
  extends DefaultParamsReadable[BaggingClassificationModel]

class BaggingClassifier(override val uid: String)
    extends ProbabilisticClassifier[Vector, BaggingClassifier, BaggingClassificationModel]
    with BaggingParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("bagc"))
  def setNumEstimators(v: Int): this.type = set(numEstimators, v)
  def setMaxSamples(v: Double): this.type = set(maxSamples, v)
  def setMaxFeatures(v: Double): this.type = set(maxFeatures, v)
  def setBootstrap(v: Boolean): this.type = set(bootstrap, v)
  def setBootstrapFeatures(v: Boolean): this.type = set(bootstrapFeatures, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setBootstrapMode(v: String): this.type = set(bootstrapMode, v)

  override protected def train(ds: Dataset[_]): BaggingClassificationModel = {
    BaggingCore.validate($(numEstimators), $(maxSamples), $(maxFeatures))
    val k = getNumClasses(ds)
    val df: DataFrame = ds.select(col($(featuresCol)).as("f"),
        col($(labelCol)).cast(DoubleType).as("y"))
      .na.drop().localCheckpoint() // freeze: seeded sample() must see stable partitions
    val nRows = df.count()
    require(nRows > 0, "bagging needs at least one training row")
    val d = df.head().getAs[Vector]("f").size
    // Estimators are INDEPENDENT (each draws its own seeded sample and
    // fits its own tree), so their tiny fit stages overlap (guide §2.6:
    // submit independent jobs from a thread pool so the next fit's
    // tasks back-fill the tail of the current one — Spark ML's own
    // CrossValidator parallelism pattern). Results are assembled BY
    // INDEX, and each tree's arithmetic is self-contained under its own
    // seed, so the ensemble is bit-identical to the sequential loop at
    // ANY parallelism (BaggingSpec determinism test pins this).
    val fitted: Seq[(Array[Double], Map[Int, Vector])] =
      BaggingCore.fitIndexed(df.sparkSession, $(numEstimators)) { m =>
        val rng = new scala.util.Random($(seed) + m)
        val featIdx = BaggingCore.drawFeatures(d, $(maxFeatures),
          $(bootstrapFeatures), rng)
        val sampled =
          if ($(bootstrap) && $(bootstrapMode) == "exact")
            BaggingCore.sampleRowsExact(df,
              BaggingCore.resolveCount($(maxSamples), nRows.toInt).toLong,
              $(seed) + m)
          else BaggingCore.sampleRows(df, $(bootstrap),
            BaggingCore.resolveFraction($(maxSamples), nRows), $(seed) + m)
        val identity = BaggingCore.isIdentity(featIdx, d)
        // identity subsets (the default max_features=1.0) train on the
        // raw column — no per-row copy, sparse vectors stay sparse
        val (trainFrame, featCol) =
          if (identity) (sampled, "f")
          else {
            val idx = featIdx // stable closure capture
            val sliceU = udf((v: Vector) => Vectors.dense(idx.map(v.apply)))
            (sampled.withColumn("fs", sliceU(col("f"))), "fs")
          }
        val tree = new DecisionTreeClassifier()
          .setFeaturesCol(featCol).setLabelCol("y")
          .setMaxDepth($(maxDepth)).setSeed($(seed) + m)
          .fit(trainFrame)
        val flat = AdaBoostCore.flatten(tree.rootNode)
        if (!identity) BaggingCore.remapFeatures(flat, featIdx)
        // recover each leaf's class distribution from the tree's own
        // probability output: every row in a leaf carries the same
        // vector, so distinct((leafIndex, probability)) is one row per
        // populated leaf — O(rows) map + O(leaves · k) collect
        val flatLoc = flat
        val leafU = udf((v: Vector) => BaggingCore.leafIndex(flatLoc, 0, v))
        val leafRows = tree.transform(trainFrame)
          .select(leafU(col("f")).as("leaf"), col("probability"))
          .distinct().collect()
        (flat, leafRows.map(r => r.getInt(0) -> r.getAs[Vector](1)).toMap)
      }
    // sequential assembly: leaf-distribution offsets depend on the
    // global dists position, so this stays ordered by estimator index
    val trees = ArrayBuffer.empty[Array[Double]]
    val dists = ArrayBuffer.empty[Double]
    fitted.foreach { case (flat, byLeaf) =>
      var p = 0
      while (p < flat.length) {
        if (flat(p) < 0) { // leaf: point slot 4 at its distribution
          val node = p / 5
          val dv = byLeaf.getOrElse(node, throw new IllegalStateException(
            s"bagging: leaf $node got no rows in the distribution pass — " +
              "the seeded sample replayed differently between fit and stats"))
          flat(p + 4) = dists.length.toDouble
          // a bootstrap sample can miss the HIGHEST class entirely, in
          // which case this tree's probability vectors are shorter than
          // k — the absent classes get probability 0, like sklearn's
          // per-estimator class_ mapping padded to the ensemble's
          var c = 0
          while (c < k) { dists += (if (c < dv.size) dv(c) else 0.0); c += 1 }
        }
        p += 5
      }
      trees += flat
    }
    val offsets = ArrayBuffer(0)
    trees.foreach(t => offsets += offsets.last + t.length)
    val model = new BaggingClassificationModel(uid + "_m")
    model.set(model.treesFlat, trees.toArray.flatten)
      .set(model.treeOffsets, offsets.toArray)
      .set(model.leafDist, dists.toArray)
      .set(model.nClasses, k)
    model.set(model.featuresCol, $(featuresCol))
      .set(model.predictionCol, $(predictionCol))
      .set(model.rawPredictionCol, $(rawPredictionCol))
      .set(model.probabilityCol, $(probabilityCol))
    model.setParent(this)
    model
  }
  override def copy(extra: ParamMap): BaggingClassifier = defaultCopy(extra)
}
object BaggingClassifier extends DefaultParamsReadable[BaggingClassifier]

class BaggingRegressionModel(override val uid: String)
    extends PredictionModel[Vector, BaggingRegressionModel]
    with BaggingModelParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("bagrm"))

  /** Mean over the per-tree predictions (sklearn BaggingRegressor). */
  override def predict(features: Vector): Double = {
    val flat = $(treesFlat); val off = $(treeOffsets)
    val t = off.length - 1
    var s = 0.0
    var i = 0
    while (i < t) {
      s += HistGBCore.leafByValues(flat, off(i), off(i + 1), features)
      i += 1
    }
    s / t
  }
  override def copy(extra: ParamMap): BaggingRegressionModel = defaultCopy(extra)
}
object BaggingRegressionModel extends DefaultParamsReadable[BaggingRegressionModel]

class BaggingRegressor(override val uid: String)
    extends Predictor[Vector, BaggingRegressor, BaggingRegressionModel]
    with BaggingParams with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("bagr"))
  def setNumEstimators(v: Int): this.type = set(numEstimators, v)
  def setMaxSamples(v: Double): this.type = set(maxSamples, v)
  def setMaxFeatures(v: Double): this.type = set(maxFeatures, v)
  def setBootstrap(v: Boolean): this.type = set(bootstrap, v)
  def setBootstrapFeatures(v: Boolean): this.type = set(bootstrapFeatures, v)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setBootstrapMode(v: String): this.type = set(bootstrapMode, v)

  override protected def train(ds: Dataset[_]): BaggingRegressionModel = {
    BaggingCore.validate($(numEstimators), $(maxSamples), $(maxFeatures))
    val df: DataFrame = ds.select(col($(featuresCol)).as("f"),
        col($(labelCol)).cast(DoubleType).as("y"))
      .na.drop().localCheckpoint()
    val nRows = df.count()
    require(nRows > 0, "bagging needs at least one training row")
    val d = df.head().getAs[Vector]("f").size
    // independent estimators overlap (guide §2.6) — see the classifier
    // twin for the determinism argument; assembly is by index
    val trees = ArrayBuffer.empty[Array[Double]]
    trees ++= BaggingCore.fitIndexed(df.sparkSession, $(numEstimators)) { m =>
      val rng = new scala.util.Random($(seed) + m)
      val featIdx = BaggingCore.drawFeatures(d, $(maxFeatures),
        $(bootstrapFeatures), rng)
      val sampled =
        if ($(bootstrap) && $(bootstrapMode) == "exact")
          BaggingCore.sampleRowsExact(df,
            BaggingCore.resolveCount($(maxSamples), nRows.toInt).toLong,
            $(seed) + m)
        else BaggingCore.sampleRows(df, $(bootstrap),
          BaggingCore.resolveFraction($(maxSamples), nRows), $(seed) + m)
      val identity = BaggingCore.isIdentity(featIdx, d)
      val (trainFrame, featCol) =
        if (identity) (sampled, "f")
        else {
          val idx = featIdx
          val sliceU = udf((v: Vector) => Vectors.dense(idx.map(v.apply)))
          (sampled.withColumn("fs", sliceU(col("f"))), "fs")
        }
      val tree = new DecisionTreeRegressor()
        .setFeaturesCol(featCol).setLabelCol("y")
        .setMaxDepth($(maxDepth)).setSeed($(seed) + m)
        .fit(trainFrame)
      val flat = AdaBoostCore.flatten(tree.rootNode)
      if (!identity) BaggingCore.remapFeatures(flat, featIdx)
      flat
    }
    val offsets = ArrayBuffer(0)
    trees.foreach(t => offsets += offsets.last + t.length)
    val model = new BaggingRegressionModel(uid + "_m")
    model.set(model.treesFlat, trees.toArray.flatten)
      .set(model.treeOffsets, offsets.toArray)
    model.set(model.featuresCol, $(featuresCol))
      .set(model.predictionCol, $(predictionCol))
    model.setParent(this)
    model
  }
  override def copy(extra: ParamMap): BaggingRegressor = defaultCopy(extra)
}
object BaggingRegressor extends DefaultParamsReadable[BaggingRegressor]
