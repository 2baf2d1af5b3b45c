package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The checked-in neural seam: everything pure-JVM (WordPiece
  * tokenization, mask pooling, shaping, the activation switch) is
  * asserted here; the reflective ONNX session itself only runs where
  * the jars are mounted — that test self-cancels in this sandbox and
  * says so. */
class OnnxRuntimeSpec extends AnyFunSuite {
  private val vocab = OnnxTokenizer.load(Iterator(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "spark", "join", "##s", "broad", "##cast"))

  test("vocab layout: ids are line numbers, control tokens resolved") {
    assert(vocab.pad == 0 && vocab.unk == 1 && vocab.cls == 2 && vocab.sep == 3)
    assert(vocab.ids("spark") == 4)
  }

  test("wordPiece: greedy longest match with ## continuations; OOV → [UNK]") {
    assert(OnnxTokenizer.wordPiece(vocab, "spark") == Seq(4))
    assert(OnnxTokenizer.wordPiece(vocab, "joins") == Seq(5, 6))
    assert(OnnxTokenizer.wordPiece(vocab, "broadcast") == Seq(7, 8))
    assert(OnnxTokenizer.wordPiece(vocab, "zzz") == Seq(vocab.unk))
  }

  test("encode: CLS/SEP wrapping, right padding, truncation") {
    val (row, n) = OnnxTokenizer.encode(vocab, "Spark joins", maxLen = 8)
    assert(row.toSeq == Seq(2L, 4L, 5L, 6L, 3L, 0L, 0L, 0L) && n == 5)
    val (tr, tn) = OnnxTokenizer.encode(vocab, "spark join spark join spark", maxLen = 4)
    assert(tn == 4 && tr.length == 4 && tr.head == 2L)
    // no control tokens in the vocab → bare pieces
    val bare = OnnxTokenizer.load(Iterator("spark", "join"))
    val (b, bn) = OnnxTokenizer.encode(bare, "spark join", maxLen = 4)
    assert(b.toSeq == Seq(0L, 1L, 0L, 0L) && bn == 2)
  }

  test("pool: masked mean, L2 norm, slice/pad to dim, zero-mask safe") {
    val hidden = Array(Array(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(9f, 9f, 9f))) // 3rd is padding
    val mask = Array(Array(1L, 1L, 0L))
    val out = OnnxRuntime.pool(hidden, mask, dim = 3).head
    // mean of the two real tokens = (0.5, 0.5, 0) → unit = (√.5, √.5, 0)
    assert(math.abs(out(0) - math.sqrt(0.5)) < 1e-6 && math.abs(out(2)) < 1e-9)
    // slice and zero-pad
    assert(OnnxRuntime.pool(hidden, mask, dim = 2).head.length == 2)
    val padded = OnnxRuntime.pool(hidden, mask, dim = 5).head
    assert(padded.length == 5 && padded(3) == 0f && padded(4) == 0f)
    // all-padding row (empty text): zero vector, not NaN
    val z = OnnxRuntime.pool(hidden, Array(Array(0L, 0L, 0L)), dim = 3).head
    assert(z.forall(v => v == 0f && !v.isNaN))
  }

  test("activation switch: off in this sandbox, registry names the contract") {
    assert(!OnnxRuntime.available,
      "no onnx jars are mounted here — if this fires, the sandbox changed")
    val e = intercept[IllegalArgumentException](ModelRuntimes.get("onnx"))
    assert(e.getMessage.contains("GRAFT_ONNX_MODEL"))
  }

  test("live ONNX session (runs only where jars are mounted)") {
    assume(OnnxRuntime.available,
      "onnxruntime jar + GRAFT_ONNX_MODEL/VOCAB not present — skipping the live path")
    val rt = OnnxRuntime.fromEnv()
    val out = rt.embed(Seq("spark joins shuffle", "completely different"), 64)
    assert(out.size == 2 && out.head.length == 64)
    val n = math.sqrt(out.head.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-3)
  }
}
