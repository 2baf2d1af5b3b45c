package org.apache.spark.ml

import org.apache.spark.ml.util.{MLReader, MLWriter}
import org.apache.spark.sql.SparkSession

/** Bridge to Spark 4's local-mode ML persistence, which is
  * `private[spark]` (it ships for Spark Connect's local model paths):
  * `MLWriter.saveToLocal` / `MLReader.loadFromLocal` perform the exact
  * `save`/`load` logic with every `ReadWriteUtils` write/read routed
  * through plain driver-side filesystem streams instead of Spark jobs.
  * Same access-bridge pattern as [[org.apache.spark.sql.GraftColumnBridge]].
  * Only [[graft.ml.PipelineIO]] calls this.
  */
object GraftMLLocalIO {
  def saveToLocal(writer: MLWriter, path: String): Unit =
    writer.saveToLocal(path)

  def loadFromLocal[T](reader: MLReader[T], spark: SparkSession,
      path: String): T =
    reader.session(spark).loadFromLocal(path)

  /** A binomial LogisticRegressionModel from driver-computed
    * coefficients — the `private[spark]` convenience constructor the
    * distributed `train` uses, with the SAME-uid + `copy(extractParamMap)`
    * pattern `copyValues` relies on: the bare model shares the
    * estimator's uid, so copying the estimator's param map onto it sets
    * every matching param exactly as `copyValues(model)` inside `fit`
    * would. Used by graft.ml.LocalLogistic (bounded driver-side fits). */
  def makeBinomialLRModel(
      lr: classification.LogisticRegression,
      coefficients: linalg.Vector,
      intercept: Double): classification.LogisticRegressionModel = {
    val bare = new classification.LogisticRegressionModel(
      lr.uid, coefficients, intercept)
    bare.copy(lr.extractParamMap()).setParent(lr)
  }

  /** PipelineModel over already-fitted transformers — the
    * `private[ml]` constructor `Pipeline.fit` ends in. */
  def makePipelineModel(uid: String,
      stages: Array[Transformer]): PipelineModel =
    new PipelineModel(uid, stages)
}
