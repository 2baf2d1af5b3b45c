package graft.ml

import org.apache.spark.ml.PipelineModel

/** Pipeline persistence without Spark jobs (guide §1.2-1: remove
  * passes; §5: the driver does metadata work).
  *
  * `PipelineModel.write.save` costs ~4 Spark jobs per lifecycle save
  * (pipeline metadata text, per-stage metadata text, model data
  * parquet — each a scheduled job of 0.08–0.25 s on local[32] whose
  * cost is scheduling, not data), and every train/finetune lifecycle
  * gate pays one save. Spark 4's own MLWriter exposes the fix:
  * `saveToLocal` routes every `ReadWriteUtils` write (metadata text,
  * model data) through plain local-filesystem streams on the driver —
  * zero jobs — and `MLReader.loadFromLocal` reads that format back.
  * The LOCAL format differs from the distributed one (binary data
  * files instead of parquet), so saved dirs carry a marker file and
  * [[load]] dispatches on it; dirs without the marker (any pre-existing
  * or fallback-written dir) load through the classic path unchanged.
  *
  * Model files are O(model) metadata — coefficients, trees, machines —
  * never data-sized, so a driver write is the right shape at any
  * corpus size (the LocalParquet/catalog argument). Stages whose
  * writers don't route through ReadWriteUtils (e.g. custom writers)
  * keep their own format inside the same directory tree in BOTH modes,
  * so mixed pipelines stay readable: each stage's reader mirrors its
  * writer. A writer that cannot save locally (unexpected stage) falls
  * back to the classic distributed save, without the marker.
  *
  * PipelineIOSpec pins round-trip parity: both formats load back to
  * stage-identical pipelines with bit-equal coefficients and identical
  * transform output.
  */
private[graft] object PipelineIO {
  /** Marker file naming the format of a saved model dir. */
  private[graft] val LocalFormatMarker = "_GRAFT_LOCAL_FORMAT"

  def save(model: PipelineModel, path: String): Unit = {
    try {
      org.apache.spark.ml.GraftMLLocalIO.saveToLocal(
        model.write.overwrite(), path)
      val m = new java.io.File(path, LocalFormatMarker)
      java.nio.file.Files.write(m.toPath, Array.emptyByteArray)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"PipelineIO: local save failed (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}); falling back to the distributed writer")
        // a half-written local dir must not shadow the fallback
        deleteRecursively(new java.io.File(path))
        model.write.overwrite().save(path)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PipelineModel =
    if (new java.io.File(path, LocalFormatMarker).exists())
      org.apache.spark.ml.GraftMLLocalIO.loadFromLocal(
        PipelineModel.read, spark, path)
    else
      PipelineModel.load(path)
}
