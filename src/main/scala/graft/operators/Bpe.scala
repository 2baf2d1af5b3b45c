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

  /** Adjacent-pair frequency table of a (sym, freq) word frame — the
    * shared statistic under every merge-round argmax and the one-shot
    * initial ranking. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode_outer(when(size(col("sym")) >= 2,
        transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + 1).as("r"))))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `numMerges` merges; stops early when no adjacent pair is
    * left (every word fully merged). */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    var words = wordTable(docs, textCol).localCheckpoint()
    // bounded driver route (r21): the rounds are vocabulary-sized work —
    // bit-identical integer/argmax arithmetic, see TokenizerLocalTrain
    TokenizerLocalTrain.collectBounded(words) match {
      case Some(local) =>
        val res = TokenizerLocalTrain.bpeMerges(local, numMerges)
        words.unpersist()
        return res
      case None => ()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(words)
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
        // unpersist the PREVIOUS round's checkpoint once the new one is
        // materialized (ADVICE r14): without it O(numMerges) copies of
        // the vocabulary table pin executor storage — harmless at the
        // gate's 20 merges, a leak at production vocab sizes
        val next = words.withColumn("sym",
            aggregate(col("sym"), array().cast("array<string>"), (acc, x) =>
              when(size(acc) > 0 && element_at(acc, -1) === lc && x === rc,
                concat(slice(acc, lit(1), size(acc) - 1), array(joined)))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
        words.unpersist()
        words = next
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
  /** A word's symbol array: one CODE POINT per symbol + the EOW marker.
    * Training-side segmentation (`wordTable`'s substr) is code-point
    * based, so the encoder must split the same way — a UTF-16 unit
    * split (ADVICE r14) produced lone-surrogate symbols on non-BMP
    * text (emoji, supplementary CJK) that could never match a trained
    * merge. */
  private def codePointSyms(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf += EOW
    buf.toArray
  }

  def encodeCol(merges: Seq[Merge]): Column => Column = {
    val pairs = merges.map(m => (m.left, m.right)).toArray
    val enc = udf { (w: String) =>
      var sym = codePointSyms(w)
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

  /** One-shot merge list for the hash-exact ENCODE gate: the top-`n`
    * adjacent pairs of the INITIAL character table (rank = count desc,
    * then (l, r) lexicographic), EXCLUDING self-pairs l == r. The
    * exclusion is what buys the gate a SQL twin: greedy left-to-right
    * matches of a pair can only overlap when l == r (a match at i−1
    * forces sym(i) = r, a match at i forces sym(i) = l), so with
    * self-pairs out every match is positionally independent and
    * DuckDB can replay one merge round as a pure per-position list
    * transform — no lookaround regex (RE2 has none), no per-symbol
    * recursion. True ITERATIVE training (recount between merges)
    * stays ta_bpe_train's surface; this list exercises [[encodeCol]] —
    * the production encoder — under a hash-exact oracle. */
  def initialPairMerges(docs: DataFrame, n: Int,
      textCol: String = "text"): Seq[Merge] =
    pairCounts(wordTable(docs, textCol))
      .filter(col("l") =!= col("r"))
      .orderBy(col("cnt").desc, col("l"), col("r"))
      .head(n)
      .zipWithIndex.map { case (row, i) =>
        Merge(i, row.getString(0), row.getString(1), row.getLong(2))
      }.toSeq

  /** Hash-exact encode gate (VERDICT r14 item 4): encode every distinct
    * corpus word with [[encodeCol]] under the 20-merge
    * [[initialPairMerges]] list; the DuckDB twin derives the identical
    * merge table in SQL and replays greedy application as a recursive
    * CTE over merge ranks (one list transform per rank). Output is
    * vocabulary-sized. */
  def ta_bpe_encode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val enc = encodeCol(initialPairMerges(docs, 20))
    docs
      .select(explode_outer(filter(split(trim(lower($"text")), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter($"w".isNotNull).distinct()
      .withColumn("sym", enc($"w"))
      .select($"w".as("word"), size($"sym").cast("long").as("n_sym"),
        array_join($"sym", " ").as("encoded"))
      .orderBy($"word")
  }

  /** CTE chain (tk … enc, wenc) — wenc = every distinct corpus word
    * with its fully-merged symbol array; ONE SQL definition shared by
    * [[taBpeEncodeSql]] and the tokenizer-aware packing oracle
    * ([[PipelineOps.dsPackBpeTokensSql]]). */
  val bpeEncodeSqlCte: String =
    """tk AS (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY w),
      |chars AS (
      |  SELECT w, freq,
      |    list_concat(
      |      list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)),
      |      ['</w>']) AS sym
      |  FROM tk),
      |pc AS (
      |  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq,
      |          unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS p
      |        FROM chars WHERE len(sym) >= 2)
      |  GROUP BY 1, 2),
      |merges AS (
      |  SELECT l, r, CAST(row_number() OVER (ORDER BY cnt DESC, l, r) AS INTEGER) - 1 AS rank
      |  FROM pc WHERE l <> r ORDER BY cnt DESC, l, r LIMIT 20),
      |nm AS (SELECT count(*) AS n FROM merges),
      |enc AS (
      |  SELECT w, sym, 0 AS r FROM chars
      |  UNION ALL
      |  SELECT e.w,
      |    list_filter(list_transform(
      |      list_zip(e.sym,
      |        list_concat(e.sym[2:len(e.sym)], [NULL]),
      |        list_concat([NULL], e.sym[1:len(e.sym)-1])),
      |      s -> CASE WHEN s[1] = m.l AND s[2] = m.r THEN m.l || m.r
      |                WHEN s[3] = m.l AND s[1] = m.r THEN NULL
      |                ELSE s[1] END),
      |      x -> x IS NOT NULL) AS sym,
      |    e.r + 1 AS r
      |  FROM enc e JOIN merges m ON m.rank = e.r),
      |wenc AS (SELECT w, sym FROM enc WHERE r = (SELECT n FROM nm))""".stripMargin

  val taBpeEncodeSql: String =
    s"""WITH RECURSIVE $bpeEncodeSqlCte
       |SELECT w AS word, CAST(len(sym) AS BIGINT) AS n_sym,
       |  array_to_string(sym, ' ') AS encoded
       |FROM wenc ORDER BY word""".stripMargin

  /** Bounded-round hash-exact TRAIN gate (VERDICT r16 item 2): the
    * first 3 merges of the PRODUCTION trainer ([[train]] itself — a
    * wrong-but-deterministic trainer can no longer pass on determinism
    * alone), hash-exact against a DuckDB twin that replays each round
    * as one pair-count aggregate + the (cnt desc, l, r) argmax + a
    * sequential left-to-right merge fold. The fold is a per-word
    * recursive CTE over symbol positions — the positionally-independent
    * zip trick of [[bpeEncodeSqlCte]] is exact only for l ≠ r, while
    * the production argmax may pick a self-pair, so the twin replays
    * [[train]]'s non-overlapping `aggregate` fold literally (rows ≈
    * vocabulary × word length per round — vocabulary-bounded, never
    * corpus-bounded). The full 20-merge gate stays ta_bpe_train. */
  def ta_bpe_train3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, Tables.documents(s, dir), numMerges = 3)
      .toDF().select($"rank".cast("long").as("rank"), $"left", $"right",
        concat($"left", $"right").as("merged"), $"freq")
      .orderBy($"rank")
  }

  /** One merge round of the DuckDB TRAIN twin over words table w{i}. */
  private def bpeRoundCte(i: Int): String =
    s"""pc$i AS (
       |  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS p
       |        FROM w$i WHERE len(sym) >= 2)
       |  GROUP BY 1, 2),
       |m$i AS (SELECT l, r, cnt FROM pc$i ORDER BY cnt DESC, l, r LIMIT 1),
       |f$i AS (
       |  SELECT w, freq, sym, CAST([] AS VARCHAR[]) AS acc, 1 AS i FROM w$i
       |  UNION ALL
       |  SELECT f.w, f.freq, f.sym,
       |    CASE WHEN len(f.acc) > 0 AND f.acc[len(f.acc)] = m.l AND f.sym[f.i] = m.r
       |         THEN list_concat(f.acc[1:len(f.acc)-1], [m.l || m.r])
       |         ELSE list_append(f.acc, f.sym[f.i]) END,
       |    f.i + 1
       |  FROM f$i f, m$i m WHERE f.i <= len(f.sym)),
       |w${i + 1} AS (SELECT w, freq, acc AS sym FROM f$i WHERE i = len(sym) + 1)""".stripMargin

  val taBpeTrain3Sql: String =
    s"""WITH RECURSIVE
       |tk AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> len(x) > 0)) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS (
       |  SELECT w, freq,
       |    list_concat(
       |      list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)),
       |      ['</w>']) AS sym
       |  FROM tk),
       |${(0 until 3).map(bpeRoundCte).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS rank, l AS "left", r AS "right", l || r AS merged, cnt AS freq FROM m0
       |  UNION ALL SELECT 1, l, r, l || r, cnt FROM m1
       |  UNION ALL SELECT 2, l, r, l || r, cnt FROM m2)
       |ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_train"   -> ta_bpe_train _,
    "ta_bpe_train3"  -> ta_bpe_train3 _,
    "ta_bpe_encode"  -> ta_bpe_encode _
  )

  val oracles: Map[String, String] = Map(
    "ta_bpe_train3" -> taBpeTrain3Sql,
    "ta_bpe_encode" -> taBpeEncodeSql
  )
}
