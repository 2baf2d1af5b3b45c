package graft.llm

import java.util.concurrent.ConcurrentHashMap

/** Pluggable model runtime — the seam that replaces the reference's
  * PyO3→Python bridge (`/root/reference/src/bindings/transformers/mod.rs`).
  * The engine (snapshotting, caching, batching, catalog bookkeeping)
  * is runtime-agnostic; heavy model execution plugs in here (an
  * ONNX/DJL-backed runtime on a real deployment). The deterministic
  * StubRuntime keeps everything testable with zero native deps
  * (SURVEY §7 "hard parts" #5).
  */
trait ModelRuntime extends Serializable {
  def name: String
  /** Batch sentence embedding (reference `transformers.py:536-579`). */
  def embed(texts: Seq[String], dim: Int): Seq[Array[Float]]
  /** Cross-encoder relevance scores query×documents
    * (reference `transformers.py:509-533`). */
  def rank(query: String, documents: Seq[String]): Seq[Double]
  /** Task pipeline (reference `transformers.py:488-506`): task is the
    * task string or task-JSON; returns one output per input. */
  def transform(task: String, inputs: Seq[String]): Seq[String]
  /** Text generation (reference `transformers.py:1085-1111`). */
  def generate(prompt: String, config: Map[String, String]): Seq[String]
}

/** Deterministic, dependency-free runtime: embeddings are closed-form
  * LCG projections of token hashes (L2-normalized), rank is cosine over
  * those embeddings, transform/generate are deterministic text
  * functions. Useful for tests AND as the oracle-checkable twin of the
  * executor-side plumbing. */
class StubRuntime extends ModelRuntime {
  val name = "stub"
  private val P = 2147483647L

  private def h60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = upper 60 bits of the first 8 digest bytes
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // drop the low nibble (16th hex char)
  }

  def embed(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    texts.map { t =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val hms = toks.map(tok => h60(md, tok) % P) // hash each token ONCE
      val raw = (0 until dim).map { i =>
        val a = ((i + 1) * 2654435761L) % P
        val b = ((i + 1) * 40503L + 17L) % P
        hms.map(hm => (((a * hm + b) % P).toDouble / P - 0.5)).sum
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => if (nrm == 0) 0f else (x / nrm).toFloat).toArray
    }
  }

  def rank(query: String, documents: Seq[String]): Seq[Double] = {
    val q = embed(Seq(query), 32).head
    embed(documents, 32).map { d =>
      d.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
    }
  }

  def transform(task: String, inputs: Seq[String]): Seq[String] = {
    val t = if (task.trim.startsWith("{")) {
      // minimal task-JSON handling: {"task": "...", ...}
      "\"task\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(task)
        .map(_.group(1)).getOrElse(task)
    } else task
    t match {
      case "summarization" => inputs.map(s => s.split("\\.").headOption.getOrElse(s).trim)
      case "translation" | "translation_en_to_fr" => inputs.map(s => s"[fr] $s")
      case "text-classification" | "sentiment-analysis" =>
        inputs.map(s => if (s.toLowerCase.contains("good") || s.toLowerCase.contains("great")) "POSITIVE" else "NEGATIVE")
      case _ => inputs.map(s => s"[$t] $s")
    }
  }

  def generate(prompt: String, config: Map[String, String]): Seq[String] = {
    val n = config.get("num_return_sequences").map(_.toInt).getOrElse(1)
    val maxLen = config.get("max_length").map(_.toInt).getOrElse(64)
    (0 until n).map(i => s"$prompt …[generated#$i]".take(maxLen))
  }
}

/** Signed feature-hashing text encoder — a REAL sparse-projection
  * representation (hashing trick: Weinberger et al., "Feature Hashing
  * for Large Scale Multitask Learning", ICML 2009; sklearn's
  * HashingVectorizer is the canonical implementation): unigrams +
  * bigrams hash into `dim` buckets with a sign bit, counts are
  * sublinear-tf weighted (1 + ln tf) and L2-normalized. Unlike the
  * StubRuntime's arbitrary projection, cosine over these vectors is a
  * meaningful lexical similarity — good enough to drive rank(),
  * near-dup detection, and the finetune classification head on a bare
  * JVM. A neural runtime (ONNX/DJL) registers through the same seam
  * when its jars are present. */
class HashingTfRuntime extends ModelRuntime {
  val name = "hashing_tf"

  private def terms(t: String): Seq[String] = {
    val toks = t.trim.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString("_")).toSeq
  }

  def embed(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    texts.map { t =>
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      terms(t).foreach(w => counts.update(w, counts.getOrElse(w, 0) + 1))
      val v = new Array[Double](dim)
      // sorted term order → bucket sums accumulate in a defined order,
      // so the vector is bit-reproducible (and DuckDB-replayable)
      counts.toSeq.sortBy(_._1).foreach { case (w, tf) =>
        md.reset()
        val d = md.digest(w.getBytes("UTF-8"))
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        val bucket = ((h >>> 1) % dim).toInt
        val sign = if ((h & 1L) == 1L) 1.0 else -1.0
        v(bucket) += sign * (1.0 + math.log(tf))
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => if (nrm == 0) 0f else (x / nrm).toFloat)
    }
  }

  def rank(query: String, documents: Seq[String]): Seq[Double] = {
    val q = embed(Seq(query), 512).head
    embed(documents, 512).map(d =>
      d.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum)
  }

  // task pipelines stay deterministic text functions (no generative
  // model on a bare JVM) — same surface as the stub
  private val textOps = new StubRuntime
  def transform(task: String, inputs: Seq[String]): Seq[String] =
    textOps.transform(task, inputs)
  def generate(prompt: String, config: Map[String, String]): Seq[String] =
    textOps.generate(prompt, config)
}

/** Executor-singleton runtime cache, mirroring the reference's
  * process-wide pipeline/encoder caches (`transformers.py:66-68`). */
object ModelRuntimes {
  private val factories = new ConcurrentHashMap[String, () => ModelRuntime]()
  private val instances = new ConcurrentHashMap[String, ModelRuntime]()
  register("stub", () => new StubRuntime)
  register("hashing_tf", () => new HashingTfRuntime)
  // the neural path self-activates when its jars + env contract are
  // present (see OnnxRuntime scaladoc) — mounting is the ONLY step
  if (OnnxRuntime.available) register("onnx", () => OnnxRuntime.fromEnv())
  // jar-free ONNX execution for the restricted encoder op set: the env
  // contract alone activates it (OnnxMini scaladoc has the scope)
  if (sys.env.contains("GRAFT_ONNX_MODEL") && sys.env.contains("GRAFT_ONNX_VOCAB"))
    register("onnx_mini", () => OnnxMiniRuntime.fromEnv())

  def register(name: String, factory: () => ModelRuntime): Unit =
    factories.put(name, factory)

  def get(name: String): ModelRuntime = {
    val f = factories.get(name)
    require(f != null,
      s"No model runtime '$name' registered — available: ${factories.keySet()}. " +
        "Heavy runtimes register at executor startup; for 'onnx' mount the " +
        "onnxruntime jar and set GRAFT_ONNX_MODEL/GRAFT_ONNX_VOCAB " +
        "(graft.llm.OnnxRuntime scaladoc has the full contract).")
    instances.computeIfAbsent(name, _ => f())
  }
}
