package graft.operators

import graft.Tables
import graft.llm.{Chunk, Ops}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-surface queries. llm_embed_stub runs the REAL distributed embed
  * operator (mapPartitions + executor-cached runtime) and is verified by
  * a DuckDB oracle that replays the stub's closed-form projection math —
  * proving the partitioned batching plumbing preserves row/vector
  * alignment exactly. Chunking and ranking are deterministic but not
  * SQL-expressible → rows-only coverage.
  */
object LLMQueries {
  private val P = 2147483647L

  def llm_embed_stub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    Ops.embedColumn(docs, "stub", "text", "emb", dim = 16)
      .select($"doc_id", posexplode($"emb"))
      .select($"doc_id", $"pos".cast("long").as("dim"), $"col".as("value"))
      .orderBy($"doc_id", $"dim")
  }

  val llmEmbedSql: String = {
    val h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT"
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |vecs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, 17), i ->
       |      list_sum(list_transform(toks, tok ->
       |        CAST(((i * 2654435761 % ${P}) * ($h % ${P}) + (i * 40503 + 17) % ${P}) % ${P} AS DOUBLE)
       |          / ${P} - 0.5))) AS v
       |  FROM tok),
       |normed AS (
       |  SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM vecs)
       |SELECT doc_id, CAST(i - 1 AS BIGINT) AS dim,
       |  CAST(CASE WHEN nrm = 0 THEN 0.0 ELSE v[i] / nrm END AS REAL) AS value
       |FROM normed, (SELECT unnest(range(1, 17)) AS i) dims
       |ORDER BY doc_id, dim""".stripMargin
  }

  /** Recursive-character chunking of every document (chunk_size 80,
    * overlap 20) — deterministic; rows-only check. */
  def llm_chunk_recursive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        Chunk.chunk("recursive_character", text,
          Map("chunk_size" -> "80", "chunk_overlap" -> "20"))
          .map { case (i, c) => (id, i, c) }
      }
      .toDF("doc_id", "chunk_idx", "chunk")
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Cross-encoder re-rank of the corpus against a fixed query via the
    * stub runtime — deterministic; rows-only check. */
  def llm_rank_stub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).filter($"doc_id" < 100)
      .select($"doc_id", $"text")
    Ops.rank(s, "stub", "spark query filter join", docs, "doc_id", "text")
      .filter($"rank" <= 10)
      .select($"rank".cast("long").as("rank"), $"corpus_id", $"score")
      .orderBy($"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_embed_stub"      -> llm_embed_stub _,
    "llm_chunk_recursive" -> llm_chunk_recursive _,
    "llm_rank_stub"       -> llm_rank_stub _
  )

  val oracles: Map[String, String] = Map(
    "llm_embed_stub" -> llmEmbedSql
    // chunk/rank: deterministic but not SQL-expressible → rows-only
  )
}
