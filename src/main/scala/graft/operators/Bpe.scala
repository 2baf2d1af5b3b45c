package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016, Algorithm 1): iteratively merge the corpus's most
  * frequent adjacent symbol pair.
  *
  * 100 TB shape — the textbook formulation IS the scale story: BPE
  * statistics depend only on the (word, frequency) table, so the
  * corpus is scanned ONCE (a map-side-combinable groupBy(word) whose
  * output is vocabulary-sized — heavy-tailed word laws keep it orders
  * of magnitude below the corpus), and every merge round runs on that
  * table alone: one pair-count aggregate (rows ≤ distinct adjacent
  * pairs), ONE argmax row collected, one stateless map applying the
  * merge, `localCheckpoint` truncating the round's lineage. Nothing
  * after the first pass touches corpus-sized data. Ties at the argmax
  * break lexicographically (deterministic re-runs).
  *
  * Pair extraction explodes through `explode_outer` + an attribute
  * null-filter — a plain explode would let InferFiltersFromGenerate
  * inline the pair-building expression into a pushed filter
  * (re-evaluated per element; the measured 10× trap in SCALE.md).
  */
object Bpe {
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The paper's word-final marker: lets merges learn suffixes without
    * crossing word boundaries. */
  val EOW = "</w>"

  /** One corpus pass → (sym: array<string>, freq) — each distinct
    * word as its character symbols + the end-of-word marker. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode_outer(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))),
        array(lit(EOW))).as("sym"), col("freq"))

  /** Train `numMerges` merges; stops early when no adjacent pair is
    * left (every word fully merged). */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        .select(col("freq"), explode_outer(when(size(col("sym")) >= 2,
          transform(sequence(lit(1), size(col("sym")) - 1),
            i => struct(element_at(col("sym"), i).as("l"),
              element_at(col("sym"), i + 1).as("r"))))).as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        // apply the merge: one left-to-right fold per word — the
        // paper's non-overlapping replacement (a fresh merge result
        // never re-pairs with the element it just consumed)
        val lc = lit(l); val rc = lit(r); val joined = lit(l + r)
        words = words.withColumn("sym",
            aggregate(col("sym"), array().cast("array<string>"), (acc, x) =>
              when(size(acc) > 0 && element_at(acc, -1) === lc && x === rc,
                concat(slice(acc, lit(1), size(acc) - 1), array(joined)))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize with a trained merge list: per word, apply every merge
    * in rank order (the standard greedy BPE encoder). A pure
    * per-partition map over the broadcast merge list — encode never
    * shuffles; the merge loop is driver-closure Scala because 10³
    * chained HOF folds would not codegen, and the per-word loop is
    * the published encoder shape anyway. */
  def encodeCol(merges: Seq[Merge]): Column => Column = {
    val pairs = merges.map(m => (m.left, m.right)).toArray
    val enc = udf { (w: String) =>
      var sym = (w.map(_.toString) :+ EOW).toArray
      pairs.foreach { case (l, r) =>
        if (sym.length >= 2) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += sym(i); i += 1 }
          }
          sym = out.toArray
        }
      }
      sym
    }
    (c: Column) => enc(lower(c))
  }

  /** Gate: 20 merges trained on the documents corpus. Rows-only (an
    * iterative global argmax has no ANSI-SQL twin); deterministic by
    * construction (lexicographic tie-break), with BpeSpec pinning the
    * paper's fixture goldens and the wordTable/encode round-trip. */
  def ta_bpe_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, Tables.documents(s, dir), numMerges = 20)
      .toDF().select($"rank".cast("long").as("rank"), $"left", $"right",
        concat($"left", $"right").as("merged"), $"freq")
      .orderBy($"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_train" -> ta_bpe_train _
  )

  val oracles: Map[String, String] = Map.empty
}
