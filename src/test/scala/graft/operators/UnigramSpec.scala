package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (Kudo 2018): hand-computed forward–backward
  * E-step goldens, Viterbi encoder semantics, end-to-end training on a
  * compressible fixture, and the gate's quality floor. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E-step golden: expected counts over the 'ab' lattice by hand") {
    // vocab {a, b, ab} at uniform p = 1/3 each. Segmentations of "ab":
    // [ab] mass 1/3; [a][b] mass 1/9. Z = 4/9.
    // E[ab] = (1/3)/(4/9) = 0.75; E[a] = E[b] = (1/9)/(4/9) = 0.25.
    val lp = math.log(1.0 / 3.0)
    val vocab = Map("a" -> lp, "b" -> lp, "ab" -> lp)
    val got = Unigram.expectedCounts("ab", vocab, 6).toMap
    assert(math.abs(got("ab") - 0.75) < 1e-12, got.toString)
    assert(math.abs(got("a") - 0.25) < 1e-12, got.toString)
    assert(math.abs(got("b") - 0.25) < 1e-12, got.toString)
    // the expected counts of a word always sum to (expected #pieces):
    // here 0.75·1 + 0.25·2 = 1.25
    assert(math.abs(got.values.sum - 1.25) < 1e-12)
  }

  test("E-step golden: three-way lattice 'abc'") {
    // vocab {a,b,c,ab,bc} uniform 1/5. Segmentations of "abc":
    // [ab][c] 1/25, [a][bc] 1/25, [a][b][c] 1/125. Z = 11/125.
    // E[ab] = 5/11, E[bc] = 5/11, E[a] = (5+1)/11, E[c] = 6/11, E[b] = 1/11.
    val lp = math.log(1.0 / 5.0)
    val vocab = Seq("a", "b", "c", "ab", "bc").map(_ -> lp).toMap
    val got = Unigram.expectedCounts("abc", vocab, 6).toMap
    assert(math.abs(got("ab") - 5.0 / 11) < 1e-12, got.toString)
    assert(math.abs(got("bc") - 5.0 / 11) < 1e-12, got.toString)
    assert(math.abs(got("a") - 6.0 / 11) < 1e-12, got.toString)
    assert(math.abs(got("c") - 6.0 / 11) < 1e-12, got.toString)
    assert(math.abs(got("b") - 1.0 / 11) < 1e-12, got.toString)
  }

  test("Viterbi encoder: max-likelihood segmentation, deterministic ties") {
    val v1 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5)
    assert(Unigram.viterbi("ab", v1, 6) == Seq("ab"))
    // exact tie ([a][b] = -2 = [ab]): shortest-first strict-improvement
    // keeps the char path — pinned so retrains can't flap
    val v2 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(Unigram.viterbi("ab", v2, 6) == Seq("a", "b"))
    // unknown characters fall back to the whole word, never crash
    assert(Unigram.viterbi("xq", Map("a" -> -1.0), 6) == Seq("xq"))
  }

  test("train on a compressible fixture: learns the repeated piece, deterministic") {
    val docs = Seq("abab abab ab cd").toDF("text")
    val p1 = Unigram.train(spark, docs, vocabSize = 8)
    val p2 = Unigram.train(spark, docs, vocabSize = 8)
    assert(p1 == p2, "retrain must be bit-identical")
    val tokens = p1.map(_.token).toSet
    assert(Seq("a", "b", "c", "d").forall(tokens), s"chars kept: $tokens")
    assert(tokens.contains("ab") || tokens.contains("abab"),
      s"the repeated subword must survive pruning: $tokens")
    assert(p1.forall(_.logp < 0.0))
    // probabilities normalize
    assert(math.abs(p1.map(p => math.exp(p.logp)).sum - 1.0) < 1e-9)
    // the encoder compresses the trained corpus word
    val enc = Unigram.encodeCol(p1)
    val syms = Seq("abab").toDF("w").select(enc($"w")).head().getSeq[String](0)
    assert(syms.length < 4, syms.mkString("|"))
    assert(syms.mkString == "abab")
  }

  test("gate: ranked pieces, floor satisfied on real testdata, replay-stable") {
    val out = Unigram.ta_unigram_train(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "quality floor emptied the gate on real data")
    assert(out.map(_.getLong(0)).toSeq == (0L until out.length.toLong),
      "ranks 0..n-1 in order")
    // logp descending by rank construction
    val lps = out.map(_.getDouble(2)).toSeq
    assert(lps == lps.sorted.reverse)
    val again = Unigram.ta_unigram_train(spark, "/root/testdata/sf0.001").collect()
    assert(again.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("quantized Viterbi: exact-integer DP picks the max-prob path, shortest-last tie-break") {
    // vocab (micro-nats): ab=-100, a=-300, b=-300, c=-500, abc absent
    val v = Map("ab" -> -100L, "a" -> -300L, "b" -> -300L, "c" -> -500L)
    // "ab": piece path -100 beats a+b -600
    assert(UnigramTestAccess.viterbiQ("ab", v, 6) == Seq("ab"))
    // "abc": ab+c = -600 beats a+b+c = -1100
    assert(UnigramTestAccess.viterbiQ("abc", v, 6) == Seq("ab", "c"))
    // exact tie: x with two equal-score splits — shortest LAST piece wins
    val tie = Map("aa" -> -200L, "a" -> -100L)
    // "aaa": a+aa = -300, aa+a = -300, a+a+a = -300 — strict-improvement
    // with len ascending keeps the smallest last piece at each j
    assert(UnigramTestAccess.viterbiQ("aaa", tie, 6) == Seq("a", "a", "a"))
    // unknown character falls back to the whole word
    assert(UnigramTestAccess.viterbiQ("zq", Map("a" -> -1L), 6) == Seq("zq"))
  }

  test("train1 gate: one hard-EM round — counts, M-step floor, prune losses") {
    val out = Unigram.ta_unigram_train1(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val toks = out.map(_.getString(0)).toSeq
    assert(toks == toks.sorted && toks.distinct.size == toks.size)
    val byTok = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // every single character of the corpus alphabet survives the round
    // (the floorChars invariant): chars present, lossq NULL for chars,
    // and a zero-count char carries the -30e6 alphabet floor
    byTok.foreach { case (t, (cnt, logq1, loss)) =>
      if (t.codePointCount(0, t.length) == 1) {
        assert(loss.isEmpty, s"char $t must have no prune loss")
        if (cnt == 0L) assert(logq1 == -30000000L, s"char $t floor")
        else assert(logq1 < 0L)
      } else {
        assert(cnt > 0L, s"dead multi-char piece $t must be dropped")
        assert(loss.nonEmpty, s"multi $t needs a prune loss")
        // loss = cnt * (logq1 - altq) with altq <= logq1 by optimality
        // of the piece's own single arc in its own lattice... altq can
        // exceed logq1 only if segmenting t WITHOUT t beats t's own
        // score — then loss is negative and t is the first to prune.
        // Either way the magnitude is bounded by cnt * |score range|.
        assert(math.abs(loss.get) <= cnt * 200000000L)
      }
    }
    // counts conserve corpus mass: sum over pieces of cnt equals the
    // total piece occurrences of the corpus segmentation (>= total
    // word occurrences, <= chars-per-word bound)
    val totalCnt = byTok.values.map(_._1).sum
    assert(totalCnt > 0L)
    // deterministic retrain
    val again = Unigram.ta_unigram_train1(spark, "/root/testdata/sf0.001").collect()
    assert(again.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("encode gate: distinct corpus words, deterministic, vocabulary round-trip") {
    val out = Unigram.ta_unigram_encode(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // one row per distinct word, word-sorted
    val words = out.map(_.getString(0)).toSeq
    assert(words == words.sorted && words.distinct.size == words.size)
    // n_sym matches the piece count and concatenation restores the word
    out.foreach { r =>
      val pieces = r.getString(2).split(" ").toSeq
      assert(pieces.length.toLong == r.getLong(1))
      assert(pieces.mkString == r.getString(0))
    }
    val again = Unigram.ta_unigram_encode(spark, "/root/testdata/sf0.001").collect()
    assert(again.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }
}

/** Package-private bridge: viterbiQ is private[operators]. */
private[operators] object UnigramTestAccess {
  def viterbiQ(w: String, v: Map[String, Long], m: Int): Seq[String] =
    Unigram.viterbiQ(w, v, m)
}
