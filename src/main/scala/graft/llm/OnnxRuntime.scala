package graft.llm

/** ONNX-backed sentence encoder behind the [[ModelRuntimes]] seam —
  * checked in so that MOUNTING the jars is the ONLY step between this
  * build and real neural embeddings (reference surface:
  * `src/bindings/transformers/mod.rs:96-122`, `transformers.py:536-579`).
  *
  * The build environment ships no ONNX jars and the sbt classpath is
  * closed, so every `ai.onnxruntime.*` touch goes through reflection;
  * nothing here needs the classes at compile time. Activation contract:
  *
  *  1. put `onnxruntime-<ver>.jar` (Microsoft's maven artifact
  *     `com.microsoft.onnxruntime:onnxruntime`) on the driver AND
  *     executor classpath (`--jars` / `spark.executor.extraClassPath`);
  *  2. export a sentence encoder to ONNX with inputs
  *     `input_ids : int64[batch, seq]` (+ optional
  *     `attention_mask : int64[batch, seq]`) and first output
  *     `last_hidden_state : float[batch, seq, hidden]` — the standard
  *     `optimum`/`transformers.onnx` export shape;
  *  3. set `GRAFT_ONNX_MODEL=/path/model.onnx` and
  *     `GRAFT_ONNX_VOCAB=/path/vocab.txt` (one token per line, BERT
  *     WordPiece layout) in the executor environment.
  *
  * When all three hold, [[OnnxRuntime.available]] flips true and
  * [[ModelRuntimes]] registers the runtime as `"onnx"` at first use —
  * `embed('onnx', …)`, finetune heads, rank, and the ANN family then
  * run on real embeddings with no code change. Embeddings are
  * mask-weighted mean-pooled hidden states, L2-normalized, sliced or
  * zero-padded to the requested `dim` (the pure pooling/shaping math is
  * [[OnnxRuntime.pool]], spec-covered in-sandbox). The model-file
  * contract itself is exercised LIVE even without the jar: [[OnnxMini]]
  * exports a valid encoder `.onnx` and executes it on the bare JVM
  * through the same tokenizer/pooling surface, and OnnxRuntimeSpec
  * cross-checks this reflective runtime against it when the jar is
  * mounted.
  */
object OnnxTokenizer {
  final case class Vocab(ids: Map[String, Int], unk: Int, cls: Int, sep: Int, pad: Int)

  /** BERT vocab layout: one token per line, id = 0-based line number.
    * [UNK]/[CLS]/[SEP]/[PAD] fall back to 0 when absent (GPT-style
    * vocabularies without control tokens still encode). */
  def load(lines: Iterator[String]): Vocab = {
    val ids = lines.zipWithIndex.map { case (t, i) => (t.trim, i) }
      .filter(_._1.nonEmpty).toMap
    Vocab(ids,
      unk = ids.getOrElse("[UNK]", 0), cls = ids.getOrElse("[CLS]", -1),
      sep = ids.getOrElse("[SEP]", -1), pad = ids.getOrElse("[PAD]", 0))
  }

  def loadFile(path: String): Vocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try load(src.getLines()) finally src.close()
  }

  /** Greedy longest-match WordPiece: whitespace+punctuation pre-split,
    * then longest vocab prefix with `##` continuation pieces — the BERT
    * tokenizer's deterministic core (no normalizer beyond lower-case). */
  def wordPiece(vocab: Vocab, word: String): Seq[Int] = {
    if (word.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var id = -1
      while (end > start && id < 0) {
        val piece = (if (start > 0) "##" else "") + word.substring(start, end)
        id = vocab.ids.getOrElse(piece, -1)
        if (id < 0) end -= 1
      }
      if (id < 0) { out.clear(); out += vocab.unk; return out.toSeq }
      out += id
      start = end
    }
    out.toSeq
  }

  /** Text → fixed-length id row (+ how many positions are real tokens).
    * [CLS] … [SEP] wrapping when the vocab carries them; truncation to
    * maxLen; [PAD] to the right. */
  def encode(vocab: Vocab, text: String, maxLen: Int): (Array[Long], Int) = {
    val words = text.trim.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val pieces = words.flatMap(wordPiece(vocab, _))
    // BERT convention: truncate the PIECES to leave room for the special
    // tokens, then wrap — so an overflowing text still ends in [SEP]
    // exactly as the encoder saw during training (truncating after
    // wrapping would drop the trailing [SEP])
    val specials = (if (vocab.cls >= 0) 1 else 0) + (if (vocab.sep >= 0) 1 else 0)
    val kept =
      ((if (vocab.cls >= 0) Seq(vocab.cls) else Seq.empty) ++
        pieces.take(math.max(0, maxLen - specials)) ++
        (if (vocab.sep >= 0) Seq(vocab.sep) else Seq.empty)).take(maxLen)
    val row = Array.fill(maxLen)(vocab.pad.toLong)
    kept.zipWithIndex.foreach { case (id, i) => row(i) = id.toLong }
    (row, kept.length)
  }
}

class OnnxRuntime(modelPath: String, vocabPath: String, maxLen: Int = 128)
    extends ModelRuntime {
  val name = "onnx"

  @transient private lazy val vocab = OnnxTokenizer.loadFile(vocabPath)

  // ---- reflective ONNX session (executor-singleton via ModelRuntimes)
  @transient private lazy val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
  @transient private lazy val env = envCls.getMethod("getEnvironment").invoke(null)
  @transient private lazy val session = {
    val m = envCls.getMethods.find(m =>
      m.getName == "createSession" && m.getParameterCount == 1 &&
        m.getParameterTypes.head == classOf[String]).getOrElse(
      throw new IllegalStateException("onnxruntime jar present but createSession(String) missing"))
    m.invoke(env, modelPath)
  }
  @transient private lazy val inputNames: Set[String] = {
    val names = session.getClass.getMethod("getInputNames").invoke(session)
    import scala.jdk.CollectionConverters._
    names.asInstanceOf[java.util.Set[String]].asScala.toSet
  }

  private def tensor(data: Array[Array[Long]]): AnyRef = {
    val tCls = Class.forName("ai.onnxruntime.OnnxTensor")
    tCls.getMethod("createTensor", envCls, classOf[Object])
      .invoke(null, env, data).asInstanceOf[AnyRef]
  }

  def embed(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val encoded = texts.map(t => OnnxTokenizer.encode(vocab, t, maxLen))
    val ids = encoded.map(_._1).toArray
    val mask = encoded.map { case (_, n) =>
      Array.tabulate(maxLen)(i => if (i < n) 1L else 0L)
    }.toArray
    // Input tensors wrap NATIVE buffers — they are not GC-managed, so
    // every tensor created for the feed must be close()d after run() or
    // each batch leaks batch×maxLen longs of native memory per input.
    val feed = new java.util.HashMap[String, AnyRef]()
    val inputs = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    try {
      def put(name: String, data: Array[Array[Long]]): Unit = {
        val t = tensor(data); inputs += t; feed.put(name, t)
      }
      put(inputNames.find(_.contains("input_ids")).getOrElse(inputNames.head), ids)
      inputNames.find(_.contains("attention_mask")).foreach(put(_, mask))
      val result = session.getClass.getMethod("run", classOf[java.util.Map[_, _]])
        .invoke(session, feed)
      try {
        val first = result.getClass.getMethod("get", classOf[Int]).invoke(result, Integer.valueOf(0))
        val hidden = first.getClass.getMethod("getValue").invoke(first)
          .asInstanceOf[Array[Array[Array[Float]]]]
        OnnxRuntime.pool(hidden, mask, dim)
      } finally result.getClass.getMethod("close").invoke(result)
    } finally inputs.foreach(t => t.getClass.getMethod("close").invoke(t))
  }

  def rank(query: String, documents: Seq[String]): Seq[Double] = {
    val dim = 512
    val q = embed(Seq(query), dim).head
    embed(documents, dim).map(d =>
      d.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum)
  }

  def transform(task: String, inputs: Seq[String]): Seq[String] =
    throw new UnsupportedOperationException(
      "the mounted ONNX runtime is an ENCODER (embed/rank); task " +
        "pipelines need a seq2seq export — register a dedicated runtime for it")

  def generate(prompt: String, config: Map[String, String]): Seq[String] =
    throw new UnsupportedOperationException(
      "the mounted ONNX runtime is an ENCODER (embed/rank); generation " +
        "needs a decoder export — register a dedicated runtime for it")
}

object OnnxRuntime {
  /** True iff the onnxruntime classes are loadable AND the model/vocab
    * environment contract is set — the activation switch for the
    * `"onnx"` registry entry. */
  def available: Boolean =
    sys.env.contains("GRAFT_ONNX_MODEL") && sys.env.contains("GRAFT_ONNX_VOCAB") && {
      try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
      catch { case _: Throwable => false }
    }

  def fromEnv(): OnnxRuntime =
    new OnnxRuntime(sys.env("GRAFT_ONNX_MODEL"), sys.env("GRAFT_ONNX_VOCAB"),
      sys.env.get("GRAFT_ONNX_MAX_LEN").map(_.toInt).getOrElse(128))

  /** Pure pooling/shaping math, spec-covered without any ONNX dep:
    * mask-weighted mean over the sequence axis, L2-normalized, sliced
    * (dim < hidden) or zero-padded (dim > hidden) to `dim`. An all-zero
    * mask row (empty text) yields the zero vector, not NaN. */
  def pool(hidden: Array[Array[Array[Float]]], mask: Array[Array[Long]],
      dim: Int): Seq[Array[Float]] =
    hidden.toSeq.zip(mask.toSeq).map { case (seqHid, m) =>
      val h = if (seqHid.isEmpty) 0 else seqHid.head.length
      val acc = new Array[Double](h)
      var n = 0L
      seqHid.zip(m).foreach { case (tok, keep) =>
        if (keep != 0L) {
          n += 1
          var i = 0
          while (i < h) { acc(i) += tok(i); i += 1 }
        }
      }
      val mean = if (n == 0) acc else acc.map(_ / n)
      val nrm = math.sqrt(mean.map(x => x * x).sum)
      val unit = if (nrm == 0) mean else mean.map(_ / nrm)
      Array.tabulate(dim)(i => if (i < h) unit(i).toFloat else 0f)
    }
}
