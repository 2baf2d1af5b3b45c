package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the CHECKED-IN ONNX encoder artifact
  * (VERDICT r13 item 8): a real .onnx file (ir 8 / opset 13, the same
  * graph shape optimum-style sentence-encoder exports use for their
  * core) whose WordPiece vocab is derived from the sf0.001 documents
  * corpus, so the live embed→ANN→retrieval golden
  * (OnnxRuntimeSpec) exercises the full serving chain in CI on a real
  * model FILE — parse, tokenize, Gather/MatMul/Add/Tanh execution,
  * pooling — instead of self-canceling when no external weights are
  * mounted. Weights are the deterministic LCG scheme of
  * [[graft.llm.OnnxMini.export]]: a fixed random projection is a
  * legitimate random-feature encoder (mean-pooled token features), and
  * determinism is what lets the golden assert a recall bar stably.
  *
  * Usage: runMain graft.tools.GenOnnxFixture <sfDir> <outDir>
  * Writes <outDir>/model.onnx + <outDir>/vocab.txt; committed under
  * src/test/resources/onnx_mini/.
  */
object GenOnnxFixture {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // vocab = the corpus's top tokens by document frequency — what a
    // tokenizer trained on this corpus would keep in its head
    val top = graft.Tables.documents(spark, sfDir)
      .select(explode(array_distinct(filter(
        split(trim(lower(col("text"))), "\\s+"), t => length(t) > 0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w"))
      .limit(1500)
      .collect().map(_.getString(0))
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ top
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/vocab.txt"),
      vocab.mkString("\n").concat("\n").getBytes("UTF-8"))
    graft.llm.OnnxMini.export(s"$outDir/model.onnx",
      vocabSize = vocab.size, h = 64)
    println(s"[gen-onnx-fixture] wrote ${vocab.size}-token vocab + model.onnx to $outDir")
    spark.stop()
  }
}
