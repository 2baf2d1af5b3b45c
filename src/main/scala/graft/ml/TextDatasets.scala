package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Text dataset extraction — the reference's typed text splits
  * (`/root/reference/src/orm/dataset.rs:77-186`, extraction loops at
  * `snapshot.rs:821-1148`): parallel train/test string columns with
  * configurable column names and the standard defaults
  * (text/class, text1/text2/class, text/summary, system/user/assistant).
  *
  * The reference materializes Vec<String> quadruples; here each split is
  * a typed `Dataset[T]` over the same `Sampling` machinery — nothing is
  * collected, the fine-tune runtime consumes partitioned data.
  */
object TextDatasets {
  final case class TextClassification(text: String, label: String)
  final case class TextPairClassification(text1: String, text2: String, label: String)
  final case class TextSummarization(text: String, summary: String)
  final case class Conversation(system: String, user: String, assistant: String)

  final case class TextSplit[T](train: Dataset[T], test: Dataset[T])

  private def split(df: DataFrame, testSize: Double, orderCols: Seq[String],
      sampling: String, seed: Long): (DataFrame, DataFrame) =
    Sampling.split(df, Sampling.parse(sampling), Seq.empty, orderCols, testSize, seed)

  /** text_classification: defaults text/class (`snapshot.rs:839-849`). */
  def textClassification(spark: SparkSession, df: DataFrame,
      textCol: String = "text", classCol: String = "class",
      testSize: Double = 0.25, sampling: String = "last",
      seed: Long = 42L): TextSplit[TextClassification] = {
    import spark.implicits._
    val base = df.select(col(textCol).cast("string").as("text"),
      col(classCol).cast("string").as("label"))
    val (tr, te) = split(base, testSize, Seq("text", "label"), sampling, seed)
    TextSplit(tr.as[TextClassification], te.as[TextClassification])
  }

  /** text_pair_classification: defaults text1/text2/class
    * (`snapshot.rs:918-934`). */
  def textPairClassification(spark: SparkSession, df: DataFrame,
      text1Col: String = "text1", text2Col: String = "text2",
      classCol: String = "class", testSize: Double = 0.25,
      sampling: String = "last", seed: Long = 42L): TextSplit[TextPairClassification] = {
    import spark.implicits._
    val base = df.select(col(text1Col).cast("string").as("text1"),
      col(text2Col).cast("string").as("text2"),
      col(classCol).cast("string").as("label"))
    val (tr, te) = split(base, testSize, Seq("text1", "text2"), sampling, seed)
    TextSplit(tr.as[TextPairClassification], te.as[TextPairClassification])
  }

  /** summarization: defaults text/summary (`snapshot.rs:1008-1024`). */
  def summarization(spark: SparkSession, df: DataFrame,
      textCol: String = "text", summaryCol: String = "summary",
      testSize: Double = 0.25, sampling: String = "last",
      seed: Long = 42L): TextSplit[TextSummarization] = {
    import spark.implicits._
    val base = df.select(col(textCol).cast("string").as("text"),
      col(summaryCol).cast("string").as("summary"))
    val (tr, te) = split(base, testSize, Seq("text"), sampling, seed)
    TextSplit(tr.as[TextSummarization], te.as[TextSummarization])
  }

  /** conversation: defaults system/user/assistant (`snapshot.rs:1092-1102`). */
  def conversation(spark: SparkSession, df: DataFrame,
      systemCol: String = "system", userCol: String = "user",
      assistantCol: String = "assistant", testSize: Double = 0.25,
      sampling: String = "last", seed: Long = 42L): TextSplit[Conversation] = {
    import spark.implicits._
    val base = df.select(col(systemCol).cast("string").as("system"),
      col(userCol).cast("string").as("user"),
      col(assistantCol).cast("string").as("assistant"))
    val (tr, te) = split(base, testSize, Seq("user"), sampling, seed)
    TextSplit(tr.as[Conversation], te.as[Conversation])
  }
}
