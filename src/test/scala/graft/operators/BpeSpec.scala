package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE training + encoding (Bpe scaladoc): the Sennrich et al. 2016
  * fixture goldens, merge determinism, early exhaustion, and the
  * train→encode round trip. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the paper's running example: low ×5, lower ×2, newest ×6, widest ×3
  private def fixture = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("Sennrich fixture: the first merges are the published ones") {
    val m = Bpe.train(spark, fixture, numMerges = 5)
    assert(m.length == 5)
    // es (newest 6 + widest 3 = 9) → est (9) → est</w> (9); then the
    // freq-7 pairs (lo from low+lower, ...) tie-broken lexicographically
    assert((m(0).left, m(0).right, m(0).freq) == (("e", "s", 9L)), m(0).toString)
    assert((m(1).left, m(1).right, m(1).freq) == (("es", "t", 9L)), m(1).toString)
    assert((m(2).left, m(2).right, m(2).freq) == (("est", Bpe.EOW, 9L)), m(2).toString)
    assert(m(3).freq == 7L && m(4).freq == 7L, m.mkString(","))
    // deterministic: retraining replays the identical merge list
    assert(Bpe.train(spark, fixture, numMerges = 5) == m)
  }

  test("encode applies merges in rank order; round-trips the trained corpus") {
    val m = Bpe.train(spark, fixture, numMerges = 10)
    val enc = Bpe.encodeCol(m)
    val toks = Seq("newest", "lowest", "xyz").toDF("w")
      .select(enc($"w").as("t")).collect().map(_.getSeq[String](0))
    // a fully-trained word compresses to few symbols and ends at </w>
    assert(toks(0).last.endsWith(Bpe.EOW), toks(0).mkString("|"))
    assert(toks(0).length < "newest".length + 1)
    // 'lowest' was never seen whole, but shares learned subwords
    assert(toks(1).exists(t => t == "est" + Bpe.EOW || t == "est"),
      toks(1).mkString("|"))
    // fully-novel characters stay as character symbols — never dropped
    assert(toks(2).mkString == "xyz" + Bpe.EOW, toks(2).mkString("|"))
  }

  test("exhaustion: a tiny corpus stops early instead of looping") {
    val m = Bpe.train(spark, Seq("ab ab").toDF("text"), numMerges = 50)
    // "ab</w>": pairs (a,b) then (ab,</w>) — two merges exhaust it
    assert(m.length == 2, m.mkString(","))
    assert((m(0).left, m(0).right) == (("a", "b")))
    assert((m(1).left, m(1).right) == (("ab", Bpe.EOW)))
  }

  test("gate shape: 20 ranked merges over the documents corpus") {
    val out = Bpe.ta_bpe_train(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 20L), "ranks 0..19")
    assert(rows.forall(_.getLong(4) >= 1L), "every merge has support")
    assert(rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }
  test("encoder splits by code points: non-BMP chars are whole symbols") {
    import spark.implicits._
    val enc = Bpe.encodeCol(Seq.empty)
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16; a
    // UTF-16-unit split (the ADVICE r14 bug) would emit two lone
    // surrogates here instead of one symbol
    val syms = Seq("a\ud834\udd1eb").toDF("w")
      .select(enc($"w").as("t")).head().getSeq[String](0)
    assert(syms == Seq("a", "\ud834\udd1e", "b", Bpe.EOW), syms.mkString("|"))
    // and a trained merge ON a non-BMP symbol matches at encode time:
    // merge 1 = (x, </w>) (tie at freq 2, "x" < U+1D11E lexicographic),
    // merge 2 then pairs the clef with the merged suffix
    val m = Bpe.train(spark, Seq("\ud834\udd1ex \ud834\udd1ex").toDF("text"), numMerges = 2)
    assert(m(1).left == "\ud834\udd1e" && m(1).right == "x" + Bpe.EOW, m.mkString(","))
    val enc2 = Bpe.encodeCol(m)
    val syms2 = Seq("\ud834\udd1ex").toDF("w")
      .select(enc2($"w").as("t")).head().getSeq[String](0)
    assert(syms2 == Seq("\ud834\udd1ex" + Bpe.EOW), syms2.mkString("|"))
  }

  test("train3 gate: strict prefix of the production trainer, self-pairs legal") {
    val df = Bpe.ta_bpe_train3(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    val full = Bpe.train(spark,
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), numMerges = 3)
    assert(rows.map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq ===
      full.map(m => (m.left, m.right, m.freq)))
    rows.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
    // the production fold handles a self-pair argmax (the case the
    // encode oracle's zip trick excludes): greedy parity on runs
    val selfCorpus = Seq("aaa aaa aaa aaa").toDF("text")
    val sm = Bpe.train(spark, selfCorpus, numMerges = 1)
    assert((sm.head.left, sm.head.right) === (("a", "a")))
  }

  test("initialPairMerges: count-desc rank, lexicographic ties, self-pairs excluded") {
    import spark.implicits._
    // "aab aab ccd": pairs a-a x2 (self, excluded), a-b x2, b-</w> x2,
    // c-c x1 (self, excluded), c-d x1, d-</w> x1
    val m = Bpe.initialPairMerges(Seq("aab aab ccd").toDF("text"), 10)
    assert(m.forall(x => x.left != x.right), m.mkString(","))
    assert(m.map(x => (x.left, x.right)) ==
      Seq(("a", "b"), ("b", Bpe.EOW), ("c", "d"), ("d", Bpe.EOW)))
    assert(m.map(_.freq) == Seq(2L, 2L, 1L, 1L))
    assert(m.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("ta_bpe_encode gate: vocabulary-sized, deterministic, round-trips chars") {
    val out = Bpe.ta_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // every encoded string reassembles to word + EOW when merges concat
    out.foreach { r =>
      val word = r.getString(0)
      val enc = r.getString(2).split(" ").mkString
      assert(enc == word + Bpe.EOW, s"$word -> $enc")
    }
  }
}
