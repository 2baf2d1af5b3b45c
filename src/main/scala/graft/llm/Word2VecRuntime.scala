package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A REAL trained embedding runtime: MLlib `Word2Vec` (distributed
  * skip-gram, Mikolov et al. 2013) fitted on a corpus DataFrame, with
  * sentence embeddings as the L2-normalized mean of word vectors — the
  * standard bag-of-vectors sentence encoder, and exactly what the
  * reference's SentenceTransformers path degrades to without a neural
  * pooler (`/root/reference/src/bindings/transformers/transformers.py:536-579`).
  *
  * This closes the "every LLM answer is synthetic" gap as far as a bare
  * JVM allows: unlike [[StubRuntime]] (arbitrary hash projection) and
  * [[HashingTfRuntime]] (lexical-overlap similarity), these vectors are
  * LEARNED from corpus co-occurrence, so cosine captures distributional
  * similarity between texts that share no tokens. Neural runtimes
  * (ONNX/DJL) still register through the same seam when mounted.
  *
  * Cluster shape: the fit is MLlib's distributed Word2Vec (one shuffle
  * to build the vocab, then partition-parallel SGD); the fitted state is
  * a vocab→vector map (|V|·dim floats, a few MB for a 100k vocab) that
  * ships to executors inside the task closure like any broadcastable
  * model — embedding remains a pure map stage.
  */
class Word2VecRuntime(
    val vectors: Map[String, Array[Float]],
    val dim: Int) extends ModelRuntime {
  val name = "word2vec"

  private def toks(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Mean of in-vocabulary word vectors, L2-normalized; all-OOV or empty
    * text → zero vector. The `dim` argument is ignored: like any real
    * encoder, the model's output width is fixed at training time. */
  def embed(texts: Seq[String], requestedDim: Int): Seq[Array[Float]] =
    texts.map { t =>
      val vs = toks(t).flatMap(vectors.get)
      val acc = new Array[Double](dim)
      vs.foreach { v =>
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
      }
      if (vs.nonEmpty) { var i = 0; while (i < dim) { acc(i) /= vs.size; i += 1 } }
      val nrm = math.sqrt(acc.map(x => x * x).sum)
      acc.map(x => if (nrm == 0) 0f else (x / nrm).toFloat)
    }

  def rank(query: String, documents: Seq[String]): Seq[Double] = {
    val q = embed(Seq(query), dim).head
    embed(documents, dim).map { d =>
      var s = 0.0
      var i = 0
      while (i < dim) { s += d(i).toDouble * q(i).toDouble; i += 1 }
      s
    }
  }

  // task pipelines stay deterministic text functions — word vectors
  // carry no generative decoder; same surface as the stub
  private val textOps = new StubRuntime
  def transform(task: String, inputs: Seq[String]): Seq[String] =
    textOps.transform(task, inputs)
  def generate(prompt: String, config: Map[String, String]): Seq[String] =
    textOps.generate(prompt, config)
}

object Word2VecRuntime {
  /** Fit a Word2Vec model on `corpus(textCol)` and wrap it as a runtime.
    * `numPartitions = 1` + fixed seed makes the fit deterministic (MLlib
    * trains Hogwild-style across partitions otherwise); raise it at real
    * scale where exact reproducibility yields to throughput. */
  def fit(corpus: DataFrame, textCol: String, dim: Int = 32,
      minCount: Int = 2, maxIter: Int = 1, seed: Long = 42L,
      numPartitions: Int = 1): Word2VecRuntime = {
    val tokens = corpus
      .select(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0).as("__toks"))
      .filter(size(col("__toks")) > 0) // whitespace-only docs → [] → dropped
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("__toks").setOutputCol("__vec")
      .setVectorSize(dim).setMinCount(minCount)
      .setMaxIter(maxIter).setSeed(seed)
      .setNumPartitions(numPartitions)
      .fit(tokens)
    val vecs = model.getVectors.collect().map { r =>
      r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)
        .toArray.map(_.toFloat)
    }.toMap
    new Word2VecRuntime(vecs, dim)
  }

  /** Fit and install into the [[ModelRuntimes]] registry under
    * `word2vec:<name>` so the SQL surface (`quackml_embed` etc.) can
    * reach it by name. Name-based resolution is process-local: on a
    * multi-JVM cluster pass the returned runtime INSTANCE to the
    * `Ops.embedColumn(df, rt, ...)` overload, which ships the state in
    * the task closure. */
  def fitAndRegister(name: String, corpus: DataFrame, textCol: String,
      dim: Int = 32, minCount: Int = 2, maxIter: Int = 1,
      seed: Long = 42L): Word2VecRuntime = {
    val rt = fit(corpus, textCol, dim, minCount, maxIter, seed)
    ModelRuntimes.register(s"word2vec:$name", () => rt)
    rt
  }
}
