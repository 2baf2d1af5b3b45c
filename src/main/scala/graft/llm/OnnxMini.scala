package graft.llm

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Self-contained ONNX encoder path — a protobuf WRITER that exports a
  * small deterministic 2-layer encoder as a spec-valid `.onnx` file,
  * and a restricted-op-set INTERPRETER that loads and runs such a file
  * on the bare JVM.
  *
  * Purpose (VERDICT r9 item 5): the reflective [[OnnxRuntime]] needs
  * Microsoft's onnxruntime jar, which this build environment cannot
  * mount, so its live spec could only self-cancel. This module closes
  * the gap from the other side: the model FILE format is public
  * (onnx/onnx.proto — protobuf wire format, plain varint/length-
  * delimited encoding), so the repo can (a) synthesize a genuinely
  * valid model any real onnxruntime would also load, and (b) execute
  * it end to end — file bytes → parse → Gather/MatMul/Add/Tanh →
  * last_hidden_state — through the SAME tokenizer, pooling, and
  * [[ModelRuntime]] surface as the reflective runtime. Where the real
  * jar IS present, OnnxRuntimeSpec cross-checks both engines on the
  * same file; here, the mini path keeps the whole contract live
  * instead of canceled.
  *
  * Scope: exactly the ops the exporter emits — Gather (axis 0, 2-D
  * indices), MatMul (3-D × 2-D), Add (last-axis broadcast), Tanh —
  * with float32 initializers in raw_data (little-endian, the onnx
  * default layout). Anything else fails loudly; this is a contract
  * fixture, not a general inference engine.
  */
object OnnxMini {
  // ---------------------------------------------------------------- proto
  /** Minimal protobuf writer: varints, tags, length-delimited chunks. */
  final class Pb {
    private val out = new ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v: Long): Pb = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    private def tag(field: Int, wire: Int): Pb = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Pb = { tag(field, 0); varint(v) }
    def chunk(field: Int, b: Array[Byte]): Pb = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def str(field: Int, s: String): Pb = chunk(field, s.getBytes("UTF-8"))
    def msg(field: Int)(f: Pb => Unit): Pb = {
      val inner = new Pb; f(inner); chunk(field, inner.bytes)
    }
  }

  private def floatsLE(fs: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(fs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat); bb.array()
  }

  /** TensorProto: dims=1, data_type=2 (1=float), name=8, raw_data=9. */
  private def tensor(p: Pb, field: Int, name: String, dims: Seq[Long],
      data: Array[Float]): Unit =
    p.msg(field) { t =>
      dims.foreach(t.int(1, _))
      t.int(2, 1).str(8, name).chunk(9, floatsLE(data)); ()
    }

  /** ValueInfoProto with an int64/float tensor type and symbolic dims. */
  private def valueInfo(p: Pb, field: Int, name: String, elemType: Int,
      dims: Seq[String]): Unit =
    p.msg(field) { vi =>
      vi.str(1, name)
      vi.msg(2) { tp =>
        tp.msg(1) { tt =>
          tt.int(1, elemType)
          tt.msg(2) { sh =>
            dims.foreach(d => sh.msg(1)(_.str(3, d)))
          }; ()
        }; ()
      }; ()
    }

  private def node(p: Pb, op: String, ins: Seq[String], outs: Seq[String]): Unit =
    p.msg(1) { n =>
      ins.foreach(n.str(1, _)); outs.foreach(n.str(2, _)); n.str(4, op); ()
    }

  /** Deterministic weights: the LCG-in-[-0.5,0.5) scheme the synthetic
    * quantizer gates already replay (seeded per tensor). */
  private def lcg(seed: Long, n: Int): Array[Float] =
    Array.tabulate(n) { i =>
      (((1103515245L * (seed + i) + 12345L) % 2147483648L).toDouble /
        2147483648.0 - 0.5).toFloat
    }

  /** Export a 2-layer encoder `Gather(E) → MatMul(W1)+b1 → Tanh →
    * MatMul(W2)+b2 → last_hidden_state` as valid ONNX (ir 8, opset 13).
    * vocabSize rows in the embedding table; hidden dims `h`. */
  def export(path: String, vocabSize: Int, h: Int): Unit = {
    val model = new Pb
    model.int(1, 8) // ir_version
    model.str(2, "graft-onnx-mini")
    model.msg(8) { op => op.str(1, "").int(2, 13); () } // opset_import
    model.msg(7) { g =>
      g.str(2, "graft_mini_encoder")
      node(g, "Gather", Seq("emb_table", "input_ids"), Seq("emb"))
      node(g, "MatMul", Seq("emb", "w1"), Seq("h1"))
      node(g, "Add", Seq("h1", "b1"), Seq("h2"))
      node(g, "Tanh", Seq("h2"), Seq("h3"))
      node(g, "MatMul", Seq("h3", "w2"), Seq("h4"))
      node(g, "Add", Seq("h4", "b2"), Seq("last_hidden_state"))
      tensor(g, 5, "emb_table", Seq(vocabSize, h), lcg(1, vocabSize * h))
      tensor(g, 5, "w1", Seq(h, h), lcg(7919, h * h))
      tensor(g, 5, "b1", Seq(h), lcg(104729, h))
      tensor(g, 5, "w2", Seq(h, h), lcg(1299709, h * h))
      tensor(g, 5, "b2", Seq(h), lcg(15485863, h))
      valueInfo(g, 11, "input_ids", 7, Seq("batch", "seq")) // 7 = int64
      valueInfo(g, 12, "last_hidden_state", 1, Seq("batch", "seq", "hidden"))
      ()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), model.bytes)
    ()
  }

  // --------------------------------------------------------------- parser
  final case class Reader(b: Array[Byte], var pos: Int, end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var x = 0L; var s = 0
      while ({ val c = b(pos) & 0xff; pos += 1; x |= (c & 0x7fL) << s
               s += 7; (c & 0x80) != 0 }) ()
      x
    }
    def chunk(): Reader = {
      val len = varint().toInt; val r = Reader(b, pos, pos + len)
      pos += len; r
    }
    def chunkBytes(): Array[Byte] = {
      val len = varint().toInt
      val a = java.util.Arrays.copyOfRange(b, pos, pos + len); pos += len; a
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 =>
        // evaluate the length BEFORE touching pos: `pos += varint()`
        // reads the old pos first, silently dropping the bytes the
        // length varint itself consumed
        val len = varint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w unsupported")
    }
  }

  final case class Init(dims: Seq[Int], data: Array[Float])
  final case class Node(op: String, ins: Seq[String], outs: Seq[String])
  final case class Graph(nodes: Seq[Node], inits: Map[String, Init],
      inputNames: Seq[String], outputName: String)

  private def parseTensor(r: Reader): (String, Init) = {
    var name = ""; val dims = Seq.newBuilder[Int]
    var dtype = 1; var raw = Array.empty[Byte]; val fd = Seq.newBuilder[Float]
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => dims += r.varint().toInt
        case 2 => dtype = r.varint().toInt
        case 4 if wire == 5 => // unpacked float_data
          fd += java.lang.Float.intBitsToFloat(
            ByteBuffer.wrap(r.b, r.pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
          r.pos += 4
        case 4 if wire == 2 => // packed float_data
          val c = r.chunk()
          while (c.hasNext) {
            fd += java.lang.Float.intBitsToFloat(ByteBuffer.wrap(c.b, c.pos, 4)
              .order(ByteOrder.LITTLE_ENDIAN).getInt)
            c.pos += 4
          }
        case 8 => name = new String(r.chunkBytes(), "UTF-8")
        case 9 => raw = r.chunkBytes()
        case _ => r.skip(wire)
      }
    }
    require(dtype == 1, s"initializer $name: only float32 supported, got $dtype")
    val data =
      if (raw.nonEmpty) {
        val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        Array.fill(raw.length / 4)(bb.getFloat)
      } else fd.result().toArray
    (name, Init(dims.result(), data))
  }

  private def parseNode(r: Reader): Node = {
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => ins += new String(r.chunkBytes(), "UTF-8")
        case 2 => outs += new String(r.chunkBytes(), "UTF-8")
        case 4 => op = new String(r.chunkBytes(), "UTF-8")
        case _ => r.skip(wire)
      }
    }
    Node(op, ins.result(), outs.result())
  }

  private def parseValueInfoName(r: Reader): String = {
    var name = ""
    while (r.hasNext) {
      val key = r.varint(); val field = (key >> 3).toInt; val wire = (key & 7).toInt
      if (field == 1) name = new String(r.chunkBytes(), "UTF-8") else r.skip(wire)
    }
    name
  }

  def parse(path: String): Graph = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val root = Reader(bytes, 0, bytes.length)
    var graph: Option[Reader] = None
    while (root.hasNext) {
      val key = root.varint(); val field = (key >> 3).toInt; val wire = (key & 7).toInt
      if (field == 7) graph = Some(root.chunk()) else root.skip(wire)
    }
    val g = graph.getOrElse(throw new IllegalArgumentException(s"$path: no graph"))
    val nodes = Seq.newBuilder[Node]; val inits = Map.newBuilder[String, Init]
    val inNames = Seq.newBuilder[String]; var outName = ""
    while (g.hasNext) {
      val key = g.varint(); val field = (key >> 3).toInt; val wire = (key & 7).toInt
      field match {
        case 1 => nodes += parseNode(g.chunk())
        case 5 => inits += parseTensor(g.chunk())
        case 11 => inNames += parseValueInfoName(g.chunk())
        case 12 => outName = parseValueInfoName(g.chunk())
        case _ => g.skip(wire)
      }
    }
    Graph(nodes.result(), inits.result(), inNames.result(), outName)
  }

  // ---------------------------------------------------------- interpreter
  /** Run the graph on a batch of id rows → [batch][seq][hidden]. Values
    * flow as (dims, flat float array); only the op set the exporter
    * emits is implemented, and each op checks its shapes. */
  def run(g: Graph, inputIds: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    val batch = inputIds.length
    val seq = if (batch == 0) 0 else inputIds.head.length
    val vals = scala.collection.mutable.HashMap.empty[String, (Seq[Int], Array[Float])]
    g.inits.foreach { case (n, i) => vals(n) = (i.dims, i.data) }

    g.nodes.foreach { n =>
      n.op match {
        case "Gather" =>
          val (td, t) = vals(n.ins.head)
          require(td.length == 2, s"Gather table must be 2-D, got $td")
          val h = td(1)
          val out = new Array[Float](batch * seq * h)
          var b = 0
          while (b < batch) {
            var s = 0
            while (s < seq) {
              val id = inputIds(b)(s).toInt
              require(id >= 0 && id < td.head, s"Gather index $id out of [0,${td.head})")
              System.arraycopy(t, id * h, out, (b * seq + s) * h, h)
              s += 1
            }
            b += 1
          }
          vals(n.outs.head) = (Seq(batch, seq, h), out)
        case "MatMul" =>
          val (ad, a) = vals(n.ins.head); val (wd, w) = vals(n.ins(1))
          require(ad.length == 3 && wd.length == 2 && ad(2) == wd.head,
            s"MatMul shapes $ad × $wd unsupported")
          val (rows, k, m) = (ad.head * ad(1), ad(2), wd(1))
          val out = new Array[Float](rows * m)
          var r = 0
          while (r < rows) {
            var j = 0
            while (j < m) {
              var acc = 0.0f; var i = 0
              while (i < k) { acc += a(r * k + i) * w(i * m + j); i += 1 }
              out(r * m + j) = acc; j += 1
            }
            r += 1
          }
          vals(n.outs.head) = (Seq(ad.head, ad(1), m), out)
        case "Add" =>
          val (ad, a) = vals(n.ins.head); val (bd, bv) = vals(n.ins(1))
          require(bd.length == 1 && ad.last == bd.head,
            s"Add broadcast $ad + $bd unsupported")
          val h = bd.head
          val out = new Array[Float](a.length)
          var i = 0
          while (i < a.length) { out(i) = a(i) + bv(i % h); i += 1 }
          vals(n.outs.head) = (ad, out)
        case "Tanh" =>
          val (ad, a) = vals(n.ins.head)
          vals(n.outs.head) = (ad, a.map(x => math.tanh(x.toDouble).toFloat))
        case op => throw new UnsupportedOperationException(
          s"OnnxMini op '$op' not in the restricted set (Gather/MatMul/Add/Tanh)")
      }
    }
    val (od, o) = vals.getOrElse(g.outputName,
      throw new IllegalStateException(s"graph output ${g.outputName} never produced"))
    require(od.length == 3, s"output must be [batch,seq,hidden], got $od")
    val h = od(2)
    Array.tabulate(od.head, od(1))((b, s) =>
      java.util.Arrays.copyOfRange(o, (b * od(1) + s) * h, (b * od(1) + s + 1) * h))
  }
}

/** [[ModelRuntime]] over the [[OnnxMini]] interpreter: same tokenizer,
  * same mask-weighted mean pooling, same env contract as the reflective
  * [[OnnxRuntime]] — so a model file exercises the IDENTICAL embed
  * surface whether or not Microsoft's jar is mounted. Registered as
  * `"onnx_mini"`. */
class OnnxMiniRuntime(modelPath: String, vocabPath: String, maxLen: Int = 128)
    extends ModelRuntime {
  val name = "onnx_mini"

  @transient private lazy val vocab = OnnxTokenizer.loadFile(vocabPath)
  @transient private lazy val graph = OnnxMini.parse(modelPath)

  def embed(texts: Seq[String], dim: Int): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val encoded = texts.map(t => OnnxTokenizer.encode(vocab, t, maxLen))
    // trim the batch to the longest real row — the interpreter has no
    // attention input, so padding positions are masked in pooling only
    val width = math.max(1, encoded.map(_._2).max)
    val ids = encoded.map(_._1.take(width)).toArray
    val mask = encoded.map { case (_, n) =>
      Array.tabulate(width)(i => if (i < n) 1L else 0L)
    }.toArray
    val hidden = OnnxMini.run(graph, ids)
    OnnxRuntime.pool(hidden, mask, dim)
  }

  def rank(query: String, documents: Seq[String]): Seq[Double] = {
    val dim = 512
    val q = embed(Seq(query), dim).head
    embed(documents, dim).map(d =>
      d.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum)
  }

  def transform(task: String, inputs: Seq[String]): Seq[String] =
    throw new UnsupportedOperationException(
      "onnx_mini is an ENCODER (embed/rank); task pipelines need a " +
        "seq2seq runtime")

  def generate(prompt: String, config: Map[String, String]): Seq[String] =
    throw new UnsupportedOperationException(
      "onnx_mini is an ENCODER (embed/rank); generation needs a decoder " +
        "runtime")
}

object OnnxMiniRuntime {
  def fromEnv(): OnnxMiniRuntime =
    new OnnxMiniRuntime(sys.env("GRAFT_ONNX_MODEL"), sys.env("GRAFT_ONNX_VOCAB"),
      sys.env.get("GRAFT_ONNX_MAX_LEN").map(_.toInt).getOrElse(128))
}
