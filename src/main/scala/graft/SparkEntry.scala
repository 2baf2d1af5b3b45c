package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-package operator maps. Every key present in
  * `queries` with a matching key in `oracleSql` is hash-checked against
  * DuckDB at sf0.01 by the driver; keys without an oracle get a weaker
  * rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TextAnalysis.queries ++
      operators.CorpusQuality.queries ++
      operators.Dedup.queries ++
      operators.Components.queries ++
      operators.PipelineOps.queries ++
      operators.Similarity.queries ++
      operators.Dbscan.queries ++
      operators.MLQueries.queries ++
      operators.Multimodal.queries ++
      operators.LLMQueries.queries ++
      operators.TextMetricsQueries.queries ++
      operators.AsOfJoin.queries ++
      operators.Bpe.queries ++
      operators.Unigram.queries ++
      operators.WordPiece.queries ++
      operators.Curation.queries ++
      operators.ScaleUtils.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TextAnalysis.oracles ++
      operators.CorpusQuality.oracles ++
      operators.Dedup.oracles ++
      operators.Components.oracles ++
      operators.PipelineOps.oracles ++
      operators.Similarity.oracles ++
      operators.Dbscan.oracles ++
      operators.MLQueries.oracles ++
      operators.Multimodal.oracles ++
      operators.LLMQueries.oracles ++
      operators.TextMetricsQueries.oracles ++
      operators.AsOfJoin.oracles ++
      operators.Bpe.oracles ++
      operators.Unigram.oracles ++
      operators.WordPiece.oracles ++
      operators.Curation.oracles ++
      operators.ScaleUtils.oracles
}
