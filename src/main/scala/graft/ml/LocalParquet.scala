package graft.ml

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf

/** Driver-side parquet writer for CATALOG-SCALE relations (a handful of
  * metadata rows). `Dataset.write.parquet` schedules a full Spark job —
  * task scheduling, committer staging, `_temporary` rename — for a
  * one-row append; measured 100–250 ms per call on local[32], and every
  * train/finetune lifecycle makes 5–6 of them (guide §1.2: fix the
  * number of passes before per-task work — here the pass count is the
  * whole cost, there is no data). This writes the same parquet bytes
  * through Spark's own `ParquetWriteSupport` (identical schema mapping:
  * typed maps/arrays/timestamps) directly on the driver, no job at all.
  *
  * Scale rationale: the catalog is O(metadata) BY CONSTRUCTION (Catalog
  * scaladoc) — rows are never data-sized, so a driver write is the
  * right shape at any corpus size; at 100 TB it also stops metadata
  * appends from occupying cluster scheduler slots mid-lifecycle.
  * The DATA path never goes through this writer.
  */
private[graft] object LocalParquet {
  private final class RowWriterBuilder(path: HPath)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Write `ds` (whose plan MUST be a LocalRelation — `createDataset` /
    * `toDS` of an in-memory Seq) as ONE new part file under `dir`.
    * Returns the written file path. No Spark job runs. */
  def appendLocalRelation(ds: Dataset[_], dir: String): String = {
    val spark = ds.sparkSession
    val rows: Seq[InternalRow] = ds.queryExecution.analyzed match {
      case lr: LocalRelation => lr.data
      case other => throw new IllegalArgumentException(
        s"LocalParquet needs a LocalRelation plan, got ${other.nodeName}")
    }
    val schema = ds.schema
    val hconf = new Configuration(spark.sessionState.newHadoopConf())
    ParquetWriteSupport.setSchema(schema, hconf)
    // ParquetWriteSupport.init asserts these are present; mirror the
    // session's effective values the way ParquetFileFormat.prepareWrite
    // does, so the bytes match what a Spark write job would produce
    val sqlc = spark.sessionState.conf
    hconf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlc.writeLegacyParquetFormat.toString)
    hconf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlc.parquetOutputTimestampType.toString)
    hconf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    hconf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlc.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    hconf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlc.parquetFieldIdWriteEnabled.toString)
    // Spark 4.1's SparkToParquetSchemaConverter reads this with a bare
    // `.toBoolean` (no default) — unset it throws "For input string: null"
    hconf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    new java.io.File(dir).mkdirs()
    // honor the session codec the way ParquetFileFormat.prepareWrite
    // does (ADVICE r20): files from this path must not silently differ
    // in codec from ones a Spark write job would produce
    val codec = sqlc.parquetCompressionCodec.toLowerCase(java.util.Locale.ROOT) match {
      case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
      case c => CompressionCodecName.valueOf(c.toUpperCase(java.util.Locale.ROOT))
    }
    val ext = codec match {
      case CompressionCodecName.UNCOMPRESSED => ""
      case c => "." + c.name.toLowerCase(java.util.Locale.ROOT)
    }
    val stem = s"part-00000-${java.util.UUID.randomUUID()}-c000$ext.parquet"
    // stage under a dot-prefixed name (hidden from Spark readers and
    // from partCount's part- filter) and rename after close — a
    // crash/kill mid-write must never leave a truncated footer-less
    // parquet visible to readers (ADVICE r20; the replaced Spark
    // committer staged under _temporary for the same reason)
    val tmp = new java.io.File(dir, s".$stem.inprogress")
    val writer = new RowWriterBuilder(new HPath(tmp.getPath))
      .withConf(hconf)
      .withCompressionCodec(codec)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try {
      rows.foreach(writer.write)
      writer.close()
    } catch {
      case e: Throwable =>
        try writer.close() catch { case _: Throwable => () }
        tmp.delete()
        throw e
    }
    val dst = new java.io.File(dir, stem)
    if (!tmp.renameTo(dst)) {
      tmp.delete()
      throw new java.io.IOException(
        s"LocalParquet: rename ${tmp.getPath} -> ${dst.getPath} failed")
    }
    dst.getPath
  }
}
