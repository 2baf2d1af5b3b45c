package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-level LLM operators — the Spark mapping of the reference's
  * vectorized scalar functions (SURVEY §2.1 #6-8, §3.3): `embed`,
  * `rank`, `transform`, `generate`.
  *
  * Shape: `mapPartitions` with a per-executor cached runtime
  * (ModelRuntimes registry) and REAL batching — the whole partition
  * iterator is fed to the runtime in batches of `batchSize`, mirroring
  * how an ONNX/DJL encoder wants its input, instead of the reference's
  * row-at-a-time calls under the GIL. At 100 TB this is one map stage:
  * no shuffle, model weights loaded once per executor, batch size
  * bounds peak memory.
  */

/** The reference's `RankResult` row shape
  * (`src/bindings/transformers/mod.rs:124-133`). */
final case class RankResult(corpus_id: Int, score: Double, text: String)

object Ops {
  /** Append an embedding column (`quackml_embed` batch form). Fixes the
    * reference's column-wiring bug (`src/api.rs:1210,1218` reads the
    * kwargs column for the text). */
  def embedColumn(df: DataFrame, runtime: String, textCol: String,
      outCol: String = "embedding", dim: Int = 16,
      batchSize: Int = 256): DataFrame =
    embedColumnWith(df, textCol, outCol, dim, batchSize)(
      () => ModelRuntimes.get(runtime)) // executor-singleton, loaded once

  /** Instance form: BROADCASTS the runtime's state (e.g. a fitted
    * [[Word2VecRuntime]] vocabulary) so executors fetch it once each,
    * instead of every task binary carrying the full state; works across
    * JVMs without name-based registry setup on executors. */
  def embedColumn(df: DataFrame, runtime: ModelRuntime, textCol: String,
      outCol: String, dim: Int): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(runtime)
    embedColumnWith(df, textCol, outCol, dim, 256)(() => bc.value)
  }

  private def embedColumnWith(df: DataFrame, textCol: String, outCol: String,
      dim: Int, batchSize: Int)(rtf: () => ModelRuntime): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val rt = rtf()
      it.grouped(batchSize).flatMap { batch =>
        val vecs = rt.embed(batch.map(r => Option(r.getString(idx)).getOrElse("")), dim)
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(enc)
  }

  /** Cross-encoder re-rank: score every (query × document) and return
    * (corpus_id, score, text) per rank — reference RankResult shape
    * (`src/bindings/transformers/mod.rs:124-164`). */
  def rank(spark: SparkSession, runtime: String, query: String,
      documents: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = documents.schema.add(StructField("score", DoubleType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = documents.schema.fieldIndex(textCol)
    val scored = documents.mapPartitions { it =>
      val rt = ModelRuntimes.get(runtime)
      it.grouped(256).flatMap { batch =>
        val scores = rt.rank(query, batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(scores).map { case (r, s) => Row.fromSeq(r.toSeq :+ s) }
      }
    }(enc)
    // global rank via the range-partitioned two-phase numbering, not an
    // unpartitioned window — the whole corpus never hits a single task
    graft.operators.Distributed.withRowNumber(
      scored.select(col(idCol).as("corpus_id"), col("score"), col(textCol).as("text")),
      "rank", Seq(col("score").desc, col("corpus_id")))
  }

  /** Task-pipeline transform over a string column. */
  def transformColumn(df: DataFrame, runtime: String, task: String,
      textCol: String, outCol: String = "output", batchSize: Int = 256): DataFrame = {
    val schema = df.schema.add(StructField(outCol, StringType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val rt = ModelRuntimes.get(runtime)
      it.grouped(batchSize).flatMap { batch =>
        val outs = rt.transform(task, batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(outs).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(enc)
  }

  /** Register the scalar SQL surface: quackml_chunk / quackml_embed /
    * quackml_embed_batch / quackml_rank / quackml_transform /
    * quackml_generate (stub-backed by default). */
  def registerFunctions(spark: SparkSession, runtime: String = "stub"): Unit = {
    spark.udf.register("quackml_chunk", (splitter: String, text: String) =>
      Chunk.chunk(splitter, text).map { case (i, c) => s"$i:$c" })
    spark.udf.register("quackml_embed", (text: String) =>
      ModelRuntimes.get(runtime).embed(Seq(text), 16).head.toSeq)
    // embed_batch (`src/api.rs:1264-1273`): one call, one vector per text
    spark.udf.register("quackml_embed_batch", (texts: Seq[String]) =>
      ModelRuntimes.get(runtime).embed(texts, 16).map(_.toSeq))
    // rank (`src/api.rs:1276-1286`): the scalar cross-encoder form —
    // RankResult list ordered best-first, corpus_id = input index
    // (`src/bindings/transformers/mod.rs:124-164`). The DataFrame form
    // (Ops.rank) is the distributed surface; this one serves SQL.
    spark.udf.register("quackml_rank", (query: String, documents: Seq[String]) => {
      val scores = ModelRuntimes.get(runtime).rank(query, documents)
      scores.zipWithIndex
        .sortBy { case (s, i) => (-s, i) }
        .map { case (s, i) => RankResult(i, s, documents(i)) }
    })
    spark.udf.register("quackml_transform", (task: String, text: String) =>
      ModelRuntimes.get(runtime).transform(task, Seq(text)).head)
    spark.udf.register("quackml_generate", (prompt: String) =>
      ModelRuntimes.get(runtime).generate(prompt, Map.empty))
  }

  /** `transform_stream` (`src/api.rs:1510-1587`, commented in the
    * reference): token-streaming generation as an iterator — the
    * driver-side streaming surface (Structured Streaming scoring covers
    * the distributed case). */
  def transformStream(runtime: String, task: String, input: String): Iterator[String] = {
    val out = ModelRuntimes.get(runtime).transform(task, Seq(input)).head
    out.split(" ").iterator.map(_ + " ") // token stream
  }

  /** `clear_gpu_cache` (`src/api.rs:1288-1307`): executor-resource reset.
    * No GPU runtime is mounted on the JVM path — clears the runtime
    * instance cache so the next call re-initializes, and reports it. */
  def clearGpuCache(): Boolean = false // nothing to free on the JVM path

  /** `finetune` API shape for tasks with NO runnable trainer on this
    * JVM (`transformers.py:876-1111`): explicit unsupported error
    * unless a capable runtime is mounted (SURVEY §7 policy). Every
    * task in the reference's finetune matrix now HAS a runnable path
    * through [[Finetune.finetune]]: the frozen-encoder + trained-head
    * lifecycles (text-classification, text-pair-classification,
    * extractive summarization/QA, retrieval conversation) and the
    * classical-statistical generative trainers ([[Generative]]:
    * trigram-LM text-generation, IBM Model 1 translation — both
    * compat-flagged in the ledger since they are not neural seq2seq). */
  def finetune(projectName: String, task: String, runtime: String = "stub"): Nothing =
    throw new UnsupportedOperationException(
      s"finetune('$projectName', task => '$task') requires a training-capable " +
        s"model runtime; '$runtime' supports inference surfaces only. " +
        "All reference finetune tasks run via graft.llm.Finetune " +
        "(text-classification, text-pair-classification, summarization, " +
        "question-answering, conversation, text-generation, translation); " +
        "for neural-runtime parity register one via ModelRuntimes.register and retry.")
}
