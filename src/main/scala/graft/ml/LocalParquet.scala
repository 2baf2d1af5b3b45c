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
    val file = new HPath(dir,
      s"part-00000-${java.util.UUID.randomUUID()}-c000.snappy.parquet")
    val writer = new RowWriterBuilder(file)
      .withConf(hconf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.CREATE)
      .build()
    try rows.foreach(writer.write)
    finally writer.close()
    file.toString
  }
}
