package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** r21 driver-route parity: tokenizer training must produce the
  * IDENTICAL merge sequence through the bounded local loop and the
  * distributed loop — exact equality including the WordPiece score's
  * raw double bits (the case class == compares them), since the gates
  * are hash-exact against the DuckDB oracle. */
class TokenizerLocalTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // repeated words, shared prefixes/suffixes, a tie-heavy tail, and a
  // supplementary (non-BMP) code point to exercise the UTF8 tie-break
  private def corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the the the quick quick lazy lazy lazy dogs",
    "low lower lowest low low slow slowly",
    "hug hugs hugging pug pugs bug bugs",
    "ab ab ab ba ba aa bb ab",
    "x😀y x😀y z￦z z￦z",
    "").toDF("text")

  private def withCap[A](cap: String)(body: => A): A = {
    spark.conf.set("spark.graft.tokenizerLocalTrainWords", cap)
    try body finally spark.conf.unset("spark.graft.tokenizerLocalTrainWords")
  }

  test("BPE: local merges == distributed merges, exactly") {
    val local = withCap("262144")(Bpe.train(spark, corpus, 25))
    val dist = withCap("0")(Bpe.train(spark, corpus, 25))
    assert(local == dist,
      s"first divergence: ${local.zip(dist).find { case (a, b) => a != b }}")
    assert(local.nonEmpty)
  }

  test("WordPiece: local merges == distributed merges, exactly (score bits included)") {
    val local = withCap("262144")(WordPiece.train(spark, corpus, 25))
    val dist = withCap("0")(WordPiece.train(spark, corpus, 25))
    assert(local.size == dist.size)
    local.zip(dist).foreach { case (a, b) =>
      assert(a.rank == b.rank && a.left == b.left && a.right == b.right &&
        a.merged == b.merged && a.freq == b.freq &&
        a.cl == b.cl && a.cr == b.cr, s"$a != $b")
      assert(java.lang.Double.doubleToRawLongBits(a.score) ==
        java.lang.Double.doubleToRawLongBits(b.score), s"score bits: $a vs $b")
    }
    assert(local.nonEmpty)
  }

  test("Unigram: local EM == distributed EM, exactly (logp bits included)") {
    val local = withCap("262144")(Unigram.train(spark, corpus, 40, emIters = 2))
    val dist = withCap("0")(Unigram.train(spark, corpus, 40, emIters = 2))
    assert(local.size == dist.size,
      s"sizes ${local.size} vs ${dist.size}")
    local.zip(dist).foreach { case (a, b) =>
      assert(a.token == b.token, s"$a != $b")
      assert(java.lang.Double.doubleToRawLongBits(a.logp) ==
        java.lang.Double.doubleToRawLongBits(b.logp), s"logp bits: $a vs $b")
    }
    assert(local.nonEmpty)
  }

  test("early exhaustion (single-symbol words) matches") {
    val tiny = Seq("a a a b").toDF("text")
    // 'a' and 'b' + EOW: BPE exhausts after merging each word fully
    val local = withCap("262144")(Bpe.train(spark, tiny, 50))
    val dist = withCap("0")(Bpe.train(spark, tiny, 50))
    assert(local == dist)
  }

  test("over-cap word tables fall back to the distributed loop") {
    val res = withCap("2")(Bpe.train(spark, corpus, 3))
    val dist = withCap("0")(Bpe.train(spark, corpus, 3))
    assert(res == dist) // same output, distributed route
  }

  test("utf8Order matches Spark's binary string order on surrogates") {
    // U+1F600 (4-byte UTF-8, surrogate pair in UTF-16) vs U+FFE6
    // (3-byte UTF-8): UTF-8 binary order puts U+FFE6 first; Java's
    // UTF-16 compareTo puts the surrogate first. Pin the Spark order.
    val hi = new String(Character.toChars(0x1F600))
    val lo = "￦"
    assert(TokenizerLocalTrain.utf8Order.compare(lo, hi) < 0)
    assert(lo.compareTo(hi) > 0) // the Java order is the OTHER way
    val sparkOrder = Seq(hi, lo).toDF("s").orderBy("s")
      .collect().map(_.getString(0))
    assert(sparkOrder.head == lo)
  }
}
