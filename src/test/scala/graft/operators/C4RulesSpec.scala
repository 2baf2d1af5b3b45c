package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Boundary fixtures per C4 rule (Raffel et al. 2020 §2.2) — line
  * retention, sentence-count page floor, and the three page-kill
  * predicates, each pinned at its threshold. */
class C4RulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] =
    TextAnalysis.c4Rules(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("line retention: terminal punctuation, 5-word floor, javascript kill") {
    val text = Seq(
      "this line has five words.",     // kept: '.', 5 words
      "this line has five words!",     // kept: '!'
      "does it have five words?",      // kept: '?'
      "he said it has \"five words\"", // kept: '"' after rtrim
      "only four words here.",         // dropped: 4 words
      "no terminal punctuation here at all", // dropped: no end mark
      "this Javascript line has six words.", // dropped: javascript
      "trailing spaces still count ok.   "   // kept: rtrim before end mark
    ).mkString("\n")
    val r = run(Seq(1L -> text))(1L)
    assert(r.getAs[Long]("n_lines") == 8L)
    assert(r.getAs[Long]("n_lines_kept") == 5L, r.getAs[String]("kept_text"))
    val kept = r.getAs[String]("kept_text").split("\n")
    assert(!kept.exists(_.toLowerCase.contains("javascript")))
    assert(kept.contains("he said it has \"five words\""))
  }

  test("page floor: 3 sentences in RETAINED text pass, 2 fail") {
    val three = "one sentence right here now. two sentences right here now. three sentences right here now."
    val two = "one sentence right here now. two sentences right here now."
    val out = run(Seq(1L -> three, 2L -> two))
    assert(out(1L).getAs[Long]("n_sentences") == 3L)
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Long]("n_sentences") == 2L)
    assert(!out(2L).getAs[Boolean]("keep"))
  }

  test("sentence count runs on RETAINED text only: dropped lines contribute nothing") {
    // the short line carries two end marks but is dropped (< 5 words),
    // so the page has only 2 retained sentences and fails the floor
    val text = "ha. ha.\n" +
      "one sentence right here now. two sentences right here now."
    val r = run(Seq(1L -> text))(1L)
    assert(r.getAs[Long]("n_lines_kept") == 1L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("page kills: lorem ipsum (case-folded), curly brackets, blocklist token") {
    val base = "one sentence right here now. two sentences right here now. three sentences right here now."
    val out = run(Seq(
      1L -> (base + "\nAs Lorem Ipsum says six words."),
      2L -> (base + "\nsome code with brace { six words."),
      3L -> (base + "\nvisit the casino for winnings today."),
      4L -> (base + "\ncasinos are not an exact token."))) // prefix must not match
    assert(out(1L).getAs[Boolean]("has_lorem") && !out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("has_brace") && !out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("has_blockword") && !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("has_blockword") && out(4L).getAs[Boolean]("keep"))
  }

  test("empty doc: zero kept lines, empty kept_text (not null), keep = false") {
    val r = run(Seq(1L -> ""))(1L)
    assert(r.getAs[Long]("n_lines_kept") == 0L)
    assert(r.getAs[String]("kept_text") == "")
    assert(!r.getAs[Boolean]("keep"))
  }

  test("gate shape on real testdata") {
    val out = TextAnalysis.ta_c4_rules(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq == Seq("doc_id", "n_lines", "n_lines_kept",
      "kept_text", "n_sentences", "has_lorem", "has_brace",
      "has_blockword", "keep"))
    assert(out.count() > 0)
  }
}
