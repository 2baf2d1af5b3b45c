package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece trainer + encoder goldens, hand-computed.
  *
  * Fixture corpus: word frequencies aab×4, ab×2, b×3.
  *  round 1: syms a:6 ##a:4 ##b:6 b:3; pairs (a,##a):4 s=4/24,
  *           (##a,##b):4 s=4/24, (a,##b):2 s=2/36 — tie broken
  *           lexicographically → (##a,##b) ("##a" < "a") → ##ab
  *  round 2: a:6 ##ab:4 ##b:2 b:3; (a,##ab):4 s=4/24 ties
  *           (a,##b):2 s=2/12 — equal 1/6! → r tie-break:
  *           "##ab" < "##b" → (a,##ab) → aab
  *  round 3: (a,##b):2 s=2/(2·2)=0.5 → ab; then no pairs remain.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    "aab aab ab b",
    "aab aab ab b b"
  ).toDF("text")

  test("likelihood-gain merges match the hand computation") {
    val m = WordPiece.train(spark, fixture, numMerges = 10)
    assert(m.map(x => (x.left, x.right, x.merged, x.freq)) === Seq(
      ("##a", "##b", "##ab", 4L),
      ("a", "##ab", "aab", 4L),
      ("a", "##b", "ab", 2L)))
    assert(math.abs(m(0).score - 4.0 / 24.0) < 1e-12)
    assert(math.abs(m(2).score - 0.5) < 1e-12)
  }

  test("training is deterministic across re-runs") {
    val a = WordPiece.train(spark, fixture, numMerges = 10)
    val b = WordPiece.train(spark, fixture, numMerges = 10)
    assert(a === b)
  }

  test("longest-match encoder round-trips the trained vocabulary") {
    val m = WordPiece.train(spark, fixture, numMerges = 10)
    val vocab = WordPiece.vocabulary(spark, fixture, m)
    assert(vocab.contains("aab") && vocab.contains("##ab"))
    val enc = WordPiece.encodeCol(vocab)
    val out = Seq("aab", "ab", "abb", "ba", "z")
      .toDF("w").select(enc(org.apache.spark.sql.functions.col("w")).as("e"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) === List("aab"))
    assert(out(1) === List("ab"))
    assert(out(2) === List("ab", "##b"))
    assert(out(3) === List("b", "##a"))
    assert(out(4) === List("[UNK]"))
  }

  test("encode gate: longest-match under the one-shot vocab round-trips every word") {
    val df = WordPiece.ta_wordpiece_encode(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pieces = r.getString(2).split(" ").toSeq
      assert(pieces.length.toLong == r.getLong(1))
      // stripping continuation prefixes restores the word
      assert(pieces.map(_.stripPrefix("##")).mkString == r.getString(0))
      // no [UNK]: every character symbol is in the vocabulary
      assert(!pieces.contains("[UNK]"))
    }
  }

  test("encoder segments by code point: non-BMP chars survive longest-match") {
    // "𝕒" (U+1D552, surrogate pair) as a vocab char: a UTF-16-unit
    // encoder splits the pair, misses every candidate, and collapses
    // the word to [UNK] (ADVICE r16)
    val vocab = Seq("𝕒", "##b", "𝕒b", "##𝕒")
    val enc = WordPiece.encodeCol(vocab)
    val out = Seq("𝕒b", "𝕒bb", "𝕒𝕒b")
      .toDF("w").select(enc(org.apache.spark.sql.functions.col("w")).as("e"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) === List("𝕒b"))          // longest match spans the pair
    assert(out(1) === List("𝕒b", "##b"))
    assert(out(2) === List("𝕒", "##𝕒", "##b"))
  }

  test("train3 gate: first 3 production merges with exact-integer evidence") {
    val df = WordPiece.ta_wordpiece_train3(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    // the bounded gate is a strict prefix of the full trainer
    val full = WordPiece.train(spark,
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), numMerges = 3)
    assert(rows.map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq ===
      full.map(m => (m.left, m.right, m.freq)))
    // cl/cr are the score's exact denominator: score == freq/(cl*cr)
    rows.zip(full).foreach { case (r, m) =>
      assert(math.abs(m.score -
        r.getLong(4).toDouble / (r.getLong(5).toDouble * r.getLong(6).toDouble)) < 1e-15)
    }
  }

  test("gate returns a ranked merge table on the corpus") {
    val df = WordPiece.ta_wordpiece_train(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq === rows.indices.map(_.toLong))
    // every merged token is left + right without the continuation prefix
    rows.foreach { r =>
      val (l, rr, m) = (r.getString(1), r.getString(2), r.getString(3))
      assert(m === l + rr.stripPrefix("##"))
    }
  }
}
