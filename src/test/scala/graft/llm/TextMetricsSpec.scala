package graft.llm

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rouge-1/2 on a hand-computed pair") {
    // pred: "the cat sat on the mat" (6 toks), ref: "the cat lay on the rug"
    // unigram multisets: pred{the:2,cat,sat,on,mat} ref{the:2,cat,lay,on,rug}
    // overlap = min(2,2)+1+0+1+0 = 4 → p = r = 4/6, f = 2/3
    // bigrams pred: [the cat, cat sat, sat on, on the, the mat]
    // bigrams ref:  [the cat, cat lay, lay on, on the, the rug]
    // overlap = 2 → p = r = 2/5, f = 2/5
    val df = Seq(("the cat sat on the mat", "the cat lay on the rug")).toDF("p", "r")
    val row = TextMetrics.rougePairs(df, "p", "r").head()
    assert(math.abs(row.getAs[Double]("r1_p") - 4.0 / 6) < 1e-15)
    assert(math.abs(row.getAs[Double]("r1_r") - 4.0 / 6) < 1e-15)
    assert(math.abs(row.getAs[Double]("r1_f") - 2.0 / 3) < 1e-15)
    assert(math.abs(row.getAs[Double]("r2_p") - 0.4) < 1e-15)
    assert(math.abs(row.getAs[Double]("r2_f") - 0.4) < 1e-15)
  }

  test("rouge handles empty and single-token texts") {
    val df = Seq(("", "some ref text"), ("one", "one")).toDF("p", "r")
    val rows = TextMetrics.rougePairs(df, "p", "r").collect()
    assert(rows(0).getAs[Double]("r1_p") == 0.0)
    assert(rows(0).getAs[Double]("r1_f") == 0.0)
    assert(rows(1).getAs[Double]("r1_f") == 1.0)
    assert(rows(1).getAs[Double]("r2_f") == 0.0) // no bigrams → defined 0
  }

  test("identical corpus scores BLEU 100 with BP 1") {
    val df = Seq(
      ("spark shuffles partition data across executors nightly", null),
      ("catalyst optimizes logical plans before physical planning", null))
      .map { case (a, _) => (a, a) }.toDF("p", "r")
    val row = TextMetrics.bleuCorpus(df, "p", "r").head()
    assert(row.getAs[Long]("match_1") == row.getAs[Long]("total_1"))
    assert(row.getAs[Float]("brevity_penalty") == 1f)
    assert(math.abs(row.getAs[Float]("bleu") - 100f) < 1e-4f)
  }

  test("bleu: hand-computed corpus with brevity penalty and smoothing") {
    // single pair — pred "a b c" vs ref "a b c d"
    // n=1: m=3 t=3; n=2: m=2 t=2; n=3: m=1 t=1; n=4: m=0 t=0 → p4 = 0 → bleu 0? No:
    // total_4 = 0 (pred shorter than 4) → p4 = 0 → score defined 0.
    val df0 = Seq(("a b c", "a b c d")).toDF("p", "r")
    assert(TextMetrics.bleuCorpus(df0, "p", "r").head().getAs[Float]("bleu") == 0f)

    // pred "a b c d e" vs ref "a b c d f": m4 = 1 of t4 = 2, m1 = 4/5...
    // p1 = 80, p2 = 75, p3 = 2/3·100, p4 = 50; pred_len = ref_len → BP = 1
    val df = Seq(("a b c d e", "a b c d f")).toDF("p", "r")
    val row = TextMetrics.bleuCorpus(df, "p", "r").head()
    val expect = math.exp((math.log(80.0) + math.log(75.0) +
      math.log(200.0 / 3) + math.log(50.0)) / 4)
    assert(math.abs(row.getAs[Float]("bleu") - expect.toFloat) < 1e-4f)

    // brevity penalty: pred 2 toks vs ref 4 → BP = exp(1 - 4/2) = e^-1
    val short = Seq(("a b", "a b c d")).toDF("p", "r")
    val bp = TextMetrics.bleuCorpus(short, "p", "r").head().getAs[Float]("brevity_penalty")
    assert(math.abs(bp - math.exp(-1).toFloat) < 1e-6f)
  }

  test("unigram perplexity matches the closed form") {
    // corpus "a a b" → c(a)=2, c(b)=1, N=3
    // PPL = exp(ln 3 − (2·ln2 + 0)/3)
    val df = Seq("a a", "b").toDF("t")
    val row = TextMetrics.perplexityUnigram(df, "t").head()
    assert(row.getAs[Long]("total_tokens") == 3L)
    assert(row.getAs[Long]("vocab_size") == 2L)
    val expect = math.exp(math.log(3.0) - 2 * math.log(2.0) / 3)
    assert(math.abs(row.getAs[Float]("perplexity") - expect.toFloat) < 1e-6f)
  }

  test("exact match normalizes case and whitespace but not content") {
    val df = Seq(
      ("The  Cat ", "the cat"),     // hit: case + spacing normalized
      ("a b c", "a b d"),           // miss: content differs
      ("", "   ")).toDF("p", "r")   // hit: both normalize to empty
    val row = TextMetrics.exactMatch(df, "p", "r").head()
    assert(row.getAs[Long]("n_pairs") == 3L)
    assert(row.getAs[Long]("n_match") == 2L)
    assert(math.abs(row.getAs[Float]("exact_match") - 2f / 3) < 1e-6f)
  }

  test("uniform corpus perplexity equals vocabulary size") {
    val df = Seq("w1 w2 w3 w4").toDF("t")
    val row = TextMetrics.perplexityUnigram(df, "t").head()
    assert(math.abs(row.getAs[Float]("perplexity") - 4f) < 1e-5f)
  }
}
