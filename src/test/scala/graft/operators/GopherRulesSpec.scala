package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Boundary fixtures per Gopher rule (Rae et al. 2021 App. A1.1) —
  * each rule is pinned exactly AT its published threshold (inclusive
  * pass) and one step past it (fail). */
class GopherRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] =
    TextAnalysis.gopherRules(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // 50 words, two stop words, 4-char filler: passes every rule
  private val goodText = "the of " + Seq.fill(48)("word").mkString(" ")

  test("word count: 50 passes (inclusive), 49 fails") {
    val out = run(Seq(1L -> goodText,
      2L -> ("the of " + Seq.fill(47)("word").mkString(" "))))
    assert(out(1L).getAs[Boolean]("r_word_count"))
    assert(out(1L).getAs[Long]("n_words") == 50L)
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_word_count"))
    assert(!out(2L).getAs[Boolean]("keep"))
  }

  test("mean word length: exactly 3.0 passes, 2.02 and 10.66 fail") {
    // "the of" (5 chars) + 47×3 + 1×4 = 150 chars over 50 words = 3.0
    val exact3 = "the of " + (Seq.fill(47)("abc") :+ "abcd").mkString(" ")
    val short2 = "the of " + Seq.fill(48)("ab").mkString(" ")
    val long11 = "the of " + Seq.fill(48)("abcdefghijk").mkString(" ")
    val out = run(Seq(1L -> exact3, 2L -> short2, 3L -> long11))
    assert(out(1L).getAs[Double]("mean_word_len") == 3.0)
    assert(out(1L).getAs[Boolean]("r_mean_word_len"))
    assert(!out(2L).getAs[Boolean]("r_mean_word_len"))
    assert(!out(3L).getAs[Boolean]("r_mean_word_len"))
  }

  test("symbol-to-word ratio: 5 hashes in 50 words = 0.1 passes, 6 fails") {
    val at = goodText + "#####"    // appended to the last word
    val over = goodText + "######"
    val ell = "the of " + Seq.fill(42)("word").mkString(" ") +
      " " + Seq.fill(6)("wait...").mkString(" ") // 6 "..." in 50 words = 0.12
    val out = run(Seq(1L -> at, 2L -> over, 3L -> ell))
    assert(out(1L).getAs[Double]("symbol_word_ratio") == 0.1)
    assert(out(1L).getAs[Boolean]("r_symbol_ratio"))
    assert(!out(2L).getAs[Boolean]("r_symbol_ratio"))
    assert(!out(3L).getAs[Boolean]("r_symbol_ratio"))
  }

  test("bullet lines: 9 of 10 = 0.9 passes, 10 of 10 fails; indent and *• count") {
    val nine = (Seq.fill(9)("- item") :+ "plain line").mkString("\n")
    val ten = (Seq.fill(8)("- item") ++ Seq("  * indented", "• dot")).mkString("\n")
    val out = run(Seq(1L -> nine, 2L -> ten))
    assert(out(1L).getAs[Double]("bullet_line_frac") == 0.9)
    assert(out(1L).getAs[Boolean]("r_bullet_lines"))
    assert(out(2L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!out(2L).getAs[Boolean]("r_bullet_lines"))
  }

  test("ellipsis line ends: 3 of 10 = 0.3 passes, 4 of 10 fails; trailing ws + … count") {
    val three = (Seq.fill(3)("to be continued...") ++ Seq.fill(7)("done")).mkString("\n")
    val four = (Seq("a...", "b... ", "c…", "d...") ++ Seq.fill(6)("done")).mkString("\n")
    val out = run(Seq(1L -> three, 2L -> four))
    assert(out(1L).getAs[Double]("ellipsis_line_frac") == 0.3)
    assert(out(1L).getAs[Boolean]("r_ellipsis_lines"))
    assert(out(2L).getAs[Double]("ellipsis_line_frac") == 0.4)
    assert(!out(2L).getAs[Boolean]("r_ellipsis_lines"))
  }

  test("alphabetic words: 40 of 50 = 0.8 passes, 39 fails") {
    val at = "the of " + (Seq.fill(38)("word") ++ Seq.fill(10)("123")).mkString(" ")
    val under = "the of " + (Seq.fill(37)("word") ++ Seq.fill(11)("123")).mkString(" ")
    val out = run(Seq(1L -> at, 2L -> under))
    assert(out(1L).getAs[Double]("alpha_word_frac") == 0.8)
    assert(out(1L).getAs[Boolean]("r_alpha_words"))
    assert(!out(2L).getAs[Boolean]("r_alpha_words"))
  }

  test("stop words: 2 distinct hits pass, 1 repeated hit fails") {
    val two = "the be " + Seq.fill(48)("word").mkString(" ")
    val one = "the the " + Seq.fill(48)("word").mkString(" ")
    val out = run(Seq(1L -> two, 2L -> one))
    assert(out(1L).getAs[Long]("n_stop_hits") == 2L)
    assert(out(1L).getAs[Boolean]("r_stop_words"))
    assert(out(2L).getAs[Long]("n_stop_hits") == 1L)
    assert(!out(2L).getAs[Boolean]("r_stop_words"))
  }

  test("empty doc: zero words, all ratios 0.0 (no NaN), keep = false") {
    val r = run(Seq(1L -> ""))(1L)
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r.getAs[Double]("alpha_word_frac") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("gate: matches the DuckDB-shaped oracle columns on real testdata") {
    val out = TextAnalysis.ta_gopher_rules(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq == Seq("doc_id", "n_words", "mean_word_len",
      "symbol_word_ratio", "bullet_line_frac", "ellipsis_line_frac",
      "alpha_word_frac", "n_stop_hits", "r_word_count", "r_mean_word_len",
      "r_symbol_ratio", "r_bullet_lines", "r_ellipsis_lines",
      "r_alpha_words", "r_stop_words", "keep"))
    assert(out.count() > 0)
  }
}
