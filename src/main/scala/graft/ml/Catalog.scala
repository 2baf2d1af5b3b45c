package graft.ml

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The `quackml` metadata catalog — projects, snapshots, models,
  * deployments, logs, files (+ the three views), mirroring
  * `/root/reference/src/sql/schema.sql:47-209` as parquet-backed tables
  * under a base directory.
  *
  * Design notes vs the reference:
  *  - JSONB columns (hyperparams, metrics) become native typed
  *    `map<string,string>` / `map<string,double>` parquet columns — the
  *    `metrics->>'f1'` ordering pattern becomes a plain map lookup.
  *  - sequences become max(id)+1 driver-side allocation; catalog writes
  *    are tiny single-writer driver appends (the reference is likewise a
  *    single in-process writer). The data path never contends with this.
  *  - UPDATEs (model status/metrics) become read-modify-overwrite of the
  *    small table — O(catalog), never O(data).
  */
final case class ProjectRow(id: Long, name: String, task: String, created_at: Timestamp)
final case class SnapshotRow(id: Long, relation_name: String, y_column_name: Seq[String],
    test_size: Double, test_sampling: String, status: String, columns_json: String,
    created_at: Timestamp)
final case class ModelRow(id: Long, project_id: Long, snapshot_id: Long, algorithm: String,
    hyperparams: Map[String, String], status: String, metrics: Map[String, Double],
    search: String, created_at: Timestamp)
final case class DeploymentRow(id: Long, project_id: Long, model_id: Long, strategy: String,
    created_at: Timestamp)
final case class FileRow(id: Long, model_id: Long, path: String)
final case class LogRow(id: Long, model_id: Long, message: String, created_at: Timestamp)

class Catalog(val spark: SparkSession, val baseDir: String) {
  import spark.implicits._

  private def dir(t: String) = s"$baseDir/$t"
  private def exists(t: String) = new java.io.File(dir(t)).exists()

  /** Catalog reads go through a process-wide ROW cache keyed by
    * (baseDir, table): the first read collects the parquet table
    * driver-side (O(metadata) by construction — scaladoc top) and every
    * later read rebuilds a LocalRelation from the cached rows, so the
    * many small lookups inside a train/finetune lifecycle
    * (findProject, deployedModelId, nextId seeding, …) cost no file
    * listing, no footer parse, and no scan job. Appends write through
    * the cache under the same per-table lock the writer holds, and the
    * load path takes that lock too, so a read racing an append can
    * never publish a pre-append snapshot over the appended one.
    * Cross-PROCESS writers remain out of scope (single-writer
    * discipline, same as the reference's in-process catalog). */
  private def read[T: org.apache.spark.sql.Encoder](t: String): org.apache.spark.sql.Dataset[T] = {
    // the logs table is append-heavy (every train/finetune writes one)
    // and rarely read (dump_all, specs): caching it would re-materialize
    // an ever-growing Seq on each write-through in a long-lived session,
    // so it reads straight from parquet instead
    if (t == "logs") Catalog.writeLock(baseDir, t).synchronized {
      return spark.createDataset(
        if (exists(t)) spark.read.parquet(dir(t)).as[T].collect().toSeq
        else Seq.empty[T])
    }
    val key = (baseDir, t)
    var rows = Catalog.rowCache.get(key)
    if (rows == null) Catalog.writeLock(baseDir, t).synchronized {
      rows = Catalog.rowCache.get(key)
      if (rows == null) {
        val loaded: Seq[T] =
          if (exists(t)) spark.read.parquet(dir(t)).as[T].collect().toSeq
          else Seq.empty[T]
        Catalog.cacheRows(key, loaded)
        rows = loaded
      }
    }
    spark.createDataset(rows.asInstanceOf[Seq[T]])
  }

  def projects = read[ProjectRow]("projects")
  def snapshots = read[SnapshotRow]("snapshots")
  def models = read[ModelRow]("models")
  def deployments = read[DeploymentRow]("deployments")
  def files = read[FileRow]("files")
  def logs = read[LogRow]("logs")

  /** Catalog appends serialize per (catalog, table): concurrent jobs
    * appending to one directory share the committer's `_temporary/0`
    * staging path, and either job's commit-cleanup deletes the other's
    * in-flight files. The write is O(metadata) — a handful of rows — so
    * a lock costs nothing and the DATA path never takes it.
    *
    * Write amplification: every append is a one-row part file, so a
    * long-lived deployment accumulates thousands of tiny files per
    * table and every catalog READ pays a file-listing + footer per
    * part. Compaction rewrites the table to one part whenever the part
    * count crosses [[Catalog.COMPACT_PARTS]] — inside the same lock, so
    * appends never interleave with the rewrite; rows round-trip through
    * the driver (the catalog is O(metadata) by construction) and land
    * in a fresh directory swapped in by rename, because Spark cannot
    * overwrite a directory it is reading. Readers in OTHER processes
    * racing the swap inherit the single-writer discipline the reference
    * assumes (scaladoc top); an object store without atomic rename
    * (S3) is the documented swap point for a Delta/transactional
    * catalog (SCALE.md). */
  private def append[T: org.apache.spark.sql.Encoder](t: String, rows: Seq[T]): Unit =
    Catalog.writeLock(baseDir, t).synchronized {
      // r20 optimization: the old `rows.toDS().coalesce(1).write` paid a
      // full Spark job (scheduler + committer staging) for a ONE-ROW
      // metadata append — 100–250 ms × 5–6 appends per train/finetune
      // lifecycle on local[32]. The driver-side writer produces the
      // same parquet bytes through Spark's own ParquetWriteSupport with
      // zero jobs; the catalog is O(metadata) by construction, so a
      // driver write is the correct shape at any scale.
      LocalParquet.appendLocalRelation(rows.toDS(), dir(t))
      // write-through: extend the cached rows if the table is cached;
      // if absent, the next read loads parquet (which has the rows)
      Catalog.rowCache.computeIfPresent((baseDir, t), (_, old) => old ++ rows)
      maybeCompact[T](t)
    }

  private def partCount(t: String): Int =
    Option(new java.io.File(dir(t)).listFiles())
      .map(_.count(f => f.getName.startsWith("part-"))).getOrElse(0)

  private def maybeCompact[T: org.apache.spark.sql.Encoder](t: String): Unit =
    if (partCount(t) > Catalog.COMPACT_PARTS) {
      val rows = read[T](t).collect().toSeq
      val fresh = new java.io.File(s"${dir(t)}__compact${System.nanoTime()}")
      // rows are already driver-resident (the catalog is O(metadata));
      // the rewrite goes through the same job-free driver writer
      LocalParquet.appendLocalRelation(spark.createDataset(rows), fresh.toString)
      val live = new java.io.File(dir(t))
      val retired = new java.io.File(s"${dir(t)}__retired${System.nanoTime()}")
      if (live.renameTo(retired) && fresh.renameTo(live)) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(retired)
      }
    }

  private def tableDf(t: String): DataFrame = t match {
    case "projects" => projects.toDF()
    case "snapshots" => snapshots.toDF()
    case "models" => models.toDF()
    case "deployments" => deployments.toDF()
    case "files" => files.toDF()
    case "logs" => logs.toDF()
  }

  /** Ids come from a process-wide monotonic counter per (catalog, table),
    * seeded from max(id) on first use — parquet has no sequences, and a
    * bare max(id)+1 read races under concurrent trainers sharing the
    * driver (both read the same max before either appends). The counter
    * makes in-process allocation safe; writers in DIFFERENT processes
    * still need the single-writer discipline the reference assumes. */
  def nextId(t: String): Long =
    Catalog.counters.computeIfAbsent((baseDir, t), _ => {
      val ds = tableDf(t)
      new java.util.concurrent.atomic.AtomicLong(
        if (ds.isEmpty) 0L else ds.agg(max("id")).head().getLong(0))
    }).incrementAndGet()

  private def now() = new Timestamp(System.currentTimeMillis())

  def findProject(name: String): Option[ProjectRow] =
    projects.filter($"name" === name).collect().headOption

  def createProject(name: String, task: String): ProjectRow = {
    val row = ProjectRow(nextId("projects"), name, task, now())
    append("projects", Seq(row)); row
  }

  def createSnapshot(relation: String, yCols: Seq[String], testSize: Double,
      sampling: String, columnsJson: String): SnapshotRow = {
    val row = SnapshotRow(nextId("snapshots"), relation, yCols, testSize, sampling,
      "created", columnsJson, now())
    append("snapshots", Seq(row)); row
  }

  def createModel(projectId: Long, snapshotId: Long, algorithm: String,
      hyperparams: Map[String, String], metrics: Map[String, Double],
      search: String): ModelRow = {
    val row = ModelRow(nextId("models"), projectId, snapshotId, algorithm, hyperparams,
      "successful", metrics, search, now())
    append("models", Seq(row)); row
  }

  def addFile(modelId: Long, path: String): FileRow = {
    val row = FileRow(nextId("files"), modelId, path)
    append("files", Seq(row)); row
  }

  def addLog(modelId: Long, message: String): Unit =
    append("logs", Seq(LogRow(nextId("logs"), modelId, message, now())))

  def deploy(projectId: Long, modelId: Long, strategy: String): DeploymentRow = {
    val row = DeploymentRow(nextId("deployments"), projectId, modelId, strategy, now())
    append("deployments", Seq(row)); row
  }

  /** Latest deployment per project — the reference's DISTINCT-ON view
    * (`schema.sql:182-186`), via a row_number window. */
  def deployedModels: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"project_id").orderBy($"id".desc)
    deployments.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      .join(projects.toDF().select($"id".as("project_id"), $"name", $"task"), "project_id")
      .join(models.toDF().select($"id".as("model_id"), $"algorithm", $"metrics"), "model_id")
  }

  def deployedModelId(projectName: String): Option[Long] =
    deployedModels.filter($"name" === projectName)
      .select($"model_id").collect().headOption.map(_.getLong(0))

  /** `quackml.trained_models` view (`schema.sql:145-180`). */
  def trainedModels: DataFrame =
    models.toDF().select($"id".as("model_id"), $"project_id", $"algorithm",
        $"status", $"metrics", $"created_at")
      .join(projects.toDF().select($"id".as("project_id"), $"name", $"task"), "project_id")

  /** Model file path for a model id. */
  def modelPath(modelId: Long): Option[String] =
    files.filter($"model_id" === modelId).collect().headOption.map(_.path)

  private val tableNames =
    Seq("projects", "snapshots", "models", "deployments", "files", "logs")

  /** `dump_all(path)` — export every catalog table (reference
    * `src/api.rs:2319-2355`, COPY TO csv per table; we use parquet to
    * keep the typed map/array columns lossless). */
  def dumpAll(path: String): Unit = tableNames.foreach { t =>
    val df: DataFrame = t match {
      case "projects" => projects.toDF()
      case "snapshots" => snapshots.toDF()
      case "models" => models.toDF()
      case "deployments" => deployments.toDF()
      case "files" => files.toDF()
      case "logs" => logs.toDF()
    }
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/$t")
  }

  /** `load_all(path)` — restore catalog tables from a dump
    * (reference `src/api.rs:2357-2392`). */
  def loadAll(path: String): Unit = tableNames.foreach { t =>
    val src = s"$path/$t"
    if (new java.io.File(src).exists())
      // under the same per-table lock the read/append paths take — a
      // concurrent cache-miss read racing an unlocked restore could
      // collect the PRE-restore parquet and publish it after the
      // eviction below, pinning stale rows in the cache forever
      Catalog.writeLock(baseDir, t).synchronized {
        spark.read.parquet(src).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(dir(t))
        // restored ids supersede whatever this process allocated — drop
        // the counter so the next nextId re-seeds from the loaded table,
        // and the row cache so the next read sees the restored rows
        Catalog.counters.remove((baseDir, t))
        Catalog.rowCache.remove((baseDir, t))
      }
  }

  /** Best-scoring model for a project by the task's default metric —
    * the reference's `ORDER BY metrics->>'<m>' DESC NULLS LAST`
    * (`task.rs:116-127`) as a map lookup + orderBy. */
  def bestModelId(projectName: String): Option[Long] = {
    findProject(projectName).flatMap { p =>
      val metric = Train.defaultTargetMetric(p.task)
      val positive = Train.metricPositive(p.task)
      val m = models.filter($"project_id" === p.id)
        .withColumn("score", element_at($"metrics", metric))
      val ordered =
        if (positive) m.orderBy($"score".desc_nulls_last, $"id".desc)
        else m.orderBy($"score".asc_nulls_last, $"id".desc)
      ordered.select($"id").collect().headOption.map(_.getLong(0))
    }
  }
}

object Catalog {
  /** Part-file threshold that triggers a compacting rewrite on append —
    * high enough that a single train lifecycle (a handful of appends
    * per table) never compacts, low enough that a read never lists
    * more than ~100 footers. */
  private[ml] val COMPACT_PARTS = 64

  /** Process-wide id allocators keyed by (catalog baseDir, table). */
  private val counters = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]()

  /** Process-wide collected-row cache keyed by (catalog baseDir,
    * table) — see `Catalog.read`. Each entry is O(catalog), but
    * throwaway temp catalogs (one per gate invocation) accumulate
    * keys, so the map flushes wholesale past a key bound — the same
    * full-flush-on-overflow discipline as the reference's deployed-
    * model cache (`src/orm/project.rs:93-99`). */
  private val ROW_CACHE_MAX_KEYS = 1024
  private[ml] val rowCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[_]]()
  private[ml] def cacheRows(key: (String, String), rows: Seq[_]): Unit = {
    if (rowCache.size >= ROW_CACHE_MAX_KEYS) rowCache.clear()
    rowCache.put(key, rows); ()
  }

  /** Per-(catalog, table) append locks — see `Catalog.append`. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Object]()
  private[ml] def writeLock(baseDir: String, t: String): Object =
    locks.computeIfAbsent((baseDir, t), _ => new Object)
}
