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

  /** hashing_tf embeddings (signed feature hashing, 64 buckets) through
    * the SAME distributed embed operator — the real lexical runtime,
    * hash-checked end to end. */
  def llm_embed_hashing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).filter($"doc_id" < 200)
      .select($"doc_id", $"text")
    Ops.embedColumn(docs, "hashing_tf", "text", "emb", dim = 64)
      .select($"doc_id", posexplode($"emb"))
      .select($"doc_id", $"pos".cast("long").as("dim"), $"col".as("value"))
      .orderBy($"doc_id", $"dim")
  }

  /** Closed-form replay of HashingTfRuntime.embed: md5-derived bucket +
    * sign bit, sublinear tf, sorted-term accumulation (both engines sum
    * buckets in term order → bit-identical doubles), L2 normalize. */
  val llmEmbedHashingSql: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
      |tk AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\W+'), x -> len(x) > 0) AS t
      |  FROM docs),
      |terms AS (
      |  SELECT doc_id, unnest(t || list_transform(range(1, len(t)), i -> t[i] || '_' || t[i+1])) AS term
      |  FROM tk),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
      |wts AS (
      |  SELECT doc_id, term, CAST((h // 2) % 64 AS BIGINT) AS bucket,
      |    (CASE WHEN h % 2 = 1 THEN 1.0 ELSE -1.0 END) * (1.0 + ln(tf)) AS w
      |  FROM (SELECT doc_id, term, CAST(('0x' || substr(md5(term), 1, 16)) AS UBIGINT) AS h, tf FROM tf)),
      |vb AS (
      |  SELECT doc_id, bucket, list_sum(list(w ORDER BY term)) AS v
      |  FROM wts GROUP BY doc_id, bucket),
      |grid AS (
      |  SELECT d.doc_id, dims.dim
      |  FROM (SELECT DISTINCT doc_id FROM docs) d
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) dims),
      |full_v AS (
      |  SELECT g.doc_id, g.dim, coalesce(vb.v, 0.0) AS v
      |  FROM grid g LEFT JOIN vb ON vb.doc_id = g.doc_id AND vb.bucket = g.dim),
      |nrm AS (
      |  SELECT doc_id, sqrt(list_sum(list(v * v ORDER BY dim))) AS n
      |  FROM full_v GROUP BY doc_id)
      |SELECT f.doc_id, f.dim, CAST(CASE WHEN n.n = 0 THEN 0.0 ELSE f.v / n.n END AS REAL) AS value
      |FROM full_v f JOIN nrm n ON f.doc_id = n.doc_id
      |ORDER BY f.doc_id, f.dim""".stripMargin

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

  /** Closed-form replay of the stub cross-encoder: rank scores are dots
    * of 32-dim stub embeddings (same md5→LCG projection the embed
    * oracle replays), so the whole rank pipeline — mapPartitions
    * scoring + distributed row numbering — is hash-checkable. The dot
    * folds left-to-right over REAL-cast values on both engines. */
  val llmRankSql: String = {
    val h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT"
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 100
       |  UNION ALL SELECT -1, 'spark query filter join'),
       |tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM corpus),
       |vecs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, 33), i ->
       |      list_sum(list_transform(toks, tok ->
       |        CAST(((i * 2654435761 % ${P}) * ($h % ${P}) + (i * 40503 + 17) % ${P}) % ${P} AS DOUBLE)
       |          / ${P} - 0.5))) AS v
       |  FROM tok),
       |normed AS (
       |  SELECT doc_id,
       |    list_transform(v, x -> CAST(CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END AS REAL)) AS nv
       |  FROM (SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM vecs)),
       |scored AS (
       |  SELECT d.doc_id AS corpus_id,
       |    list_sum(list_transform(range(1, 33),
       |      i -> CAST(d.nv[i] AS DOUBLE) * CAST(q.nv[i] AS DOUBLE))) AS score
       |  FROM normed d, normed q WHERE d.doc_id >= 0 AND q.doc_id = -1)
       |SELECT CAST(rnk AS BIGINT) AS rank, corpus_id, score FROM (
       |  SELECT *, row_number() OVER (ORDER BY score DESC, corpus_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= 10 ORDER BY rank""".stripMargin
  }

  /** DuckDB oracle for the recursive chunker — the LangChain merge loop
    * re-expressed as a recursive CTE over word windows. Valid because on
    * this corpus (single-line, single-spaced; generator-guaranteed) the
    * splitter cascade reduces to merge(words, " ", 80, 20), whose state
    * is just the window [i, j]: window length comes from prefix sums
    * (wl(i,j) = P[j+1]-P[i]+(j-i)), the overflow test and the
    * overlap-tail eviction (a monotone predicate over k, so its first
    * false index IS the post-eviction start) are pure arithmetic on
    * them, and each recursion step advances one word carrying the
    * emitted chunk (if any) on the state row. Chunk text is the word
    * slice re-joined; emission order (emit_j, then tail at j=n) is the
    * sequential emit order. */
  val llmChunkRecursiveSql: String =
    """WITH RECURSIVE
      |w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words,
      |         list_transform(string_split(text, ' '), x -> length(x)) AS lens
      |  FROM documents),
      |pre AS (
      |  SELECT doc_id, words, lens, len(words) AS n,
      |    list_transform(generate_series(0, len(words)),
      |                   k -> CAST(coalesce(list_sum(lens[1:k]), 0) AS BIGINT)) AS P
      |  FROM w),
      |step AS (
      |  SELECT doc_id, 1 AS j, 1 AS i, NULL::INT AS emit_i, NULL::INT AS emit_j FROM pre
      |  UNION ALL
      |  SELECT s.doc_id, s.j + 1 AS j,
      |    CASE WHEN (s.i <= s.j AND (p.P[s.j+1] - p.P[s.i] + (s.j - s.i)) + p.lens[s.j+1] + 1 > 80)
      |         THEN list_filter(generate_series(s.i, s.j + 1),
      |                k -> NOT ( (p.P[s.j+1] - p.P[k] + (s.j - k)) > 20
      |                        OR ((p.P[s.j+1] - p.P[k] + (s.j - k)) + p.lens[s.j+1]
      |                            + (CASE WHEN k <= s.j THEN 1 ELSE 0 END) > 80
      |                            AND (p.P[s.j+1] - p.P[k] + (s.j - k)) > 0) ))[1]
      |         ELSE s.i END AS i,
      |    CASE WHEN (s.i <= s.j AND (p.P[s.j+1] - p.P[s.i] + (s.j - s.i)) + p.lens[s.j+1] + 1 > 80)
      |         THEN s.i END AS emit_i,
      |    CASE WHEN (s.i <= s.j AND (p.P[s.j+1] - p.P[s.i] + (s.j - s.i)) + p.lens[s.j+1] + 1 > 80)
      |         THEN s.j END AS emit_j
      |  FROM step s JOIN pre p USING (doc_id)
      |  WHERE s.j < p.n),
      |emissions AS (
      |  SELECT doc_id, emit_i AS ci, emit_j AS cj FROM step WHERE emit_i IS NOT NULL
      |  UNION ALL
      |  SELECT s.doc_id, s.i AS ci, s.j AS cj
      |  FROM step s JOIN pre p USING (doc_id)
      |  WHERE s.j = p.n)
      |SELECT e.doc_id,
      |  CAST(row_number() OVER (PARTITION BY e.doc_id ORDER BY e.cj, e.ci) AS INT) AS chunk_idx,
      |  array_to_string(p.words[e.ci:e.cj], ' ') AS chunk
      |FROM emissions e JOIN pre p USING (doc_id)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_embed_stub"      -> llm_embed_stub _,
    "llm_embed_hashing"   -> llm_embed_hashing _,
    "llm_chunk_recursive" -> llm_chunk_recursive _,
    "llm_rank_stub"       -> llm_rank_stub _
  )

  val oracles: Map[String, String] = Map(
    "llm_embed_stub"      -> llmEmbedSql,
    "llm_embed_hashing"   -> llmEmbedHashingSql,
    "llm_chunk_recursive" -> llmChunkRecursiveSql,
    "llm_rank_stub"       -> llmRankSql
  )
}
