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
}
