package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training (Schuster & Nakajima,
  * "Japanese and Korean Voice Search", ICASSP 2012; the BERT tokenizer
  * — Devlin et al. 2019 §A.2): iteratively merge the adjacent symbol
  * pair with the highest LIKELIHOOD GAIN under a unigram LM,
  *
  *   score(l, r) = freq(l·r) / (freq(l) · freq(r))
  *
  * — BPE's argmax with the pair count divided by its parts' counts, so
  * a merge is chosen for how much it improves corpus likelihood, not
  * raw frequency. Non-initial symbols carry the `##` continuation
  * prefix (WordPiece's word-boundary convention, vs BPE's `</w>`
  * suffix marker).
  *
  * 100 TB shape — identical to [[Bpe]] and [[Unigram]], the third
  * consumer of the proven (word, freq) formulation: the corpus is
  * scanned ONCE into the map-combinable, vocabulary-sized word table;
  * each merge round runs two vocabulary-sized aggregates (adjacent-pair
  * counts + symbol unigram counts, joined broadcast), collects ONE
  * argmax row, and applies the merge as a stateless map. Nothing after
  * the first pass touches corpus-sized data; rounds cost vocabulary.
  *
  * Determinism: ties at the argmax break (score desc, l, r)
  * lexicographically; score is one IEEE division of exact integer
  * counts — bit-stable across re-runs.
  */
object WordPiece {
  /** `cl`/`cr` are the score's denominator unigram counts — kept as
    * exact integers so the bounded-round TRAIN oracle can hash the
    * full selection evidence without a double column. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, freq: Long, score: Double, cl: Long, cr: Long)

  /** Continuation prefix: a symbol that does not start its word. */
  val CONT = "##"

  private def strip(t: String): String =
    if (t.startsWith(CONT)) t.substring(CONT.length) else t

  /** One corpus pass → (sym: array<string>, freq): each distinct word
    * as its character symbols, continuation-prefixed past position 1.
    * `explode_outer` + attribute null-filter (the measured
    * InferFiltersFromGenerate trap — see [[Bpe]]'s scaladoc). */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode_outer(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(transform(sequence(lit(1), length(col("w"))), i =>
        when(i === 1, col("w").substr(i, lit(1)))
          .otherwise(concat(lit(CONT), col("w").substr(i, lit(1)))))
        .as("sym"), col("freq"))

  /** Adjacent-pair frequencies of the (sym, freq) frame — the same
    * vocabulary-sized aggregate shape as the BPE round statistic. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode_outer(when(size(col("sym")) >= 2,
        transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + 1).as("r"))))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Symbol unigram frequencies — the score's denominator terms. */
  private def symCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode_outer(col("sym")).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("t")).agg(sum(col("freq")).as("c"))

  /** Train `numMerges` likelihood-gain merges; stops early when no
    * adjacent pair remains. */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    var words = wordTable(docs, textCol).localCheckpoint()
    // bounded driver route (r21): the rounds are vocabulary-sized work —
    // bit-identical integer/argmax arithmetic (the score is the same
    // IEEE division of the same exact counts), see TokenizerLocalTrain
    TokenizerLocalTrain.collectBounded(words) match {
      case Some(local) =>
        val res = TokenizerLocalTrain.wordPieceMerges(local, numMerges)
        words.unpersist()
        return res
      case None => ()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val sc = symCounts(words)
      val top = pairCounts(words)
        .join(broadcast(sc.select(col("t").as("l"), col("c").as("cl"))), Seq("l"))
        .join(broadcast(sc.select(col("t").as("r"), col("c").as("cr"))), Seq("r"))
        .select(col("l"), col("r"), col("cnt"),
          (col("cnt").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double"))).as("score"),
          col("cl"), col("cr"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        val (cnt, score) = (top(0).getLong(2), top(0).getDouble(3))
        val m = l + strip(r)
        merges += Merge(rank, l, r, m, cnt, score,
          top(0).getLong(4), top(0).getLong(5))
        val lc = lit(l); val rc = lit(r); val joined = lit(m)
        // left-to-right non-overlapping replacement, previous round's
        // checkpoint unpersisted once the new one is live (the Bpe
        // round discipline)
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
    words.unpersist()
    merges.toSeq
  }

  /** A word as one string per CODE POINT — the encoder must segment
    * the way training's `substr` and the DuckDB twin's `substring`
    * do (code points), not by UTF-16 unit (ADVICE r16: a UTF-16
    * substring splits surrogate pairs on non-BMP text, every
    * candidate misses the vocabulary, and the whole word collapses
    * to [UNK]); the [[Bpe.encodeCol]] precedent. */
  private def codePoints(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf.toArray
  }

  /** The production WordPiece ENCODER (BERT's): greedy longest-prefix
    * match against the trained vocabulary, continuation pieces tried
    * with the `##` prefix, whole word → `[UNK]` when any position has
    * no match. A broadcast-closure pure map — encode never shuffles.
    * Candidate lengths are measured in code points, matching the
    * code-point-based trainer and oracle. */
  def encodeCol(vocab: Seq[String], unk: String = "[UNK]"): Column => Column = {
    val vset = vocab.toSet
    val maxLen = if (vocab.isEmpty) 1
      else vocab.map { v =>
        val s = strip(v); s.codePointCount(0, s.length)
      }.max
    val enc = udf { (w: String) =>
      val cs = codePoints(w)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      var dead = false
      while (i < cs.length && !dead) {
        var len = math.min(maxLen, cs.length - i)
        var hit: String = null
        var hitLen = 0
        while (len >= 1 && hit == null) {
          val cand = (if (i == 0) "" else CONT) +
            cs.slice(i, i + len).mkString
          if (vset.contains(cand)) { hit = cand; hitLen = len }
          len -= 1
        }
        if (hit == null) dead = true
        else { out += hit; i += hitLen }
      }
      if (dead) Seq(unk) else out.toSeq
    }
    (c: Column) => enc(lower(c))
  }

  /** Vocabulary induced by a merge list over a corpus: every character
    * symbol of the word table plus each merge's product — what
    * [[encodeCol]] matches against. */
  def vocabulary(s: SparkSession, docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): Seq[String] = {
    val chars = symCounts(wordTable(docs, textCol))
      .select(col("t")).collect().map(_.getString(0))
    (chars ++ merges.map(_.merged)).distinct.sorted
  }

  /** Closed-form ONE-SHOT vocabulary for the hash-exact ENCODE gate
    * (the WordPiece analogue of [[Bpe.initialPairMerges]]): every
    * position symbol of the initial character table (plain word-start
    * chars + ##-prefixed continuation chars) plus the top-`n` adjacent
    * pairs by likelihood score on that INITIAL table, merged. Unlike
    * BPE's greedy replay, the WordPiece ENCODER consumes only the
    * vocabulary SET (longest-prefix match), so the one-shot list needs
    * no overlap caveats at all; scores are one IEEE division of exact
    * integer counts — bit-identical ordering in DuckDB — with ties →
    * (l, r) lexicographic. True ITERATIVE training stays
    * ta_wordpiece_train's surface. */
  def initialVocab(s: SparkSession, docs: DataFrame, n: Int,
      textCol: String = "text"): Seq[String] = {
    val words = wordTable(docs, textCol)
    val sc = symCounts(words)
    val chars = sc.select(col("t")).collect().map(_.getString(0))
    val merges = pairCounts(words)
      .join(broadcast(sc.select(col("t").as("l"), col("c").as("cl"))), Seq("l"))
      .join(broadcast(sc.select(col("t").as("r"), col("c").as("cr"))), Seq("r"))
      .select(col("l"), col("r"),
        (col("cnt").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double"))).as("score"))
      .orderBy(col("score").desc, col("l"), col("r"))
      .head(n)
      .map(row => row.getString(0) + strip(row.getString(1)))
    (chars ++ merges).distinct.sorted
  }

  /** Hash-exact ENCODE gate: longest-prefix-match encode of every
    * distinct corpus word under the one-shot [[initialVocab]]; the
    * DuckDB twin derives the identical vocabulary in SQL and replays
    * longest-match as a recursive CTE over word positions (candidates
    * tried longest-first against the vocabulary list). Completes the
    * encoder trio under oracles (ta_bpe_encode greedy-merge replay,
    * ta_unigram_encode quantized Viterbi, this longest-match). */
  def ta_wordpiece_encode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val enc = encodeCol(initialVocab(s, docs, 20))
    docs
      .select(explode_outer(filter(split(trim(lower($"text")), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter($"w".isNotNull).distinct()
      .withColumn("sym", enc($"w"))
      .select($"w".as("word"), size($"sym").cast("long").as("n_sym"),
        array_join($"sym", " ").as("encoded"))
      .orderBy($"word")
  }

  val taWordPieceEncodeSql: String =
    """WITH RECURSIVE
      |tk AS (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY w),
      |syms AS (
      |  SELECT w, freq,
      |    list_transform(range(1, length(w) + 1),
      |      i -> CASE WHEN i = 1 THEN substring(w, i, 1)
      |                ELSE '##' || substring(w, i, 1) END) AS sym
      |  FROM tk),
      |symcnt AS (
      |  SELECT t, CAST(sum(freq) AS BIGINT) AS c
      |  FROM (SELECT freq, unnest(sym) AS t FROM syms)
      |  GROUP BY t),
      |paircnt AS (
      |  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq,
      |          unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS p
      |        FROM syms WHERE len(sym) >= 2)
      |  GROUP BY 1, 2),
      |merges AS (
      |  SELECT pc.l || replace(pc.r, '##', '') AS t
      |  FROM paircnt pc
      |  JOIN symcnt a ON a.t = pc.l JOIN symcnt b ON b.t = pc.r
      |  ORDER BY CAST(pc.cnt AS DOUBLE) / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) DESC,
      |    pc.l, pc.r
      |  LIMIT 20),
      |vocab AS (SELECT DISTINCT t FROM (
      |  SELECT t FROM symcnt UNION ALL SELECT t FROM merges)),
      |vl AS (SELECT list(t) AS vs FROM vocab),
      |wd AS (SELECT DISTINCT w FROM tk),
      |enc AS (
      |  SELECT w, 1 AS i, CAST('' AS VARCHAR) AS path FROM wd
      |  UNION ALL
      |  SELECT w, i + CASE WHEN length(hit) >= 1 THEN length(hit)
      |                     - CASE WHEN i = 1 THEN 0 ELSE 2 END END AS i,
      |    CASE WHEN path = '' THEN hit ELSE path || ' ' || hit END AS path
      |  FROM (
      |    SELECT w, i, path,
      |      (list_filter(list_transform([2, 1],
      |        L -> CASE WHEN i + L - 1 <= length(w)
      |             THEN (CASE WHEN i = 1 THEN '' ELSE '##' END)
      |               || substring(w, i, L) END),
      |        x -> x IS NOT NULL AND list_contains(vl.vs, x)))[1] AS hit
      |    FROM enc, vl WHERE i <= length(w)) t
      |  WHERE hit IS NOT NULL),
      |res AS (SELECT w, path AS encoded FROM enc WHERE i = length(w) + 1)
      |SELECT w AS word,
      |  CAST(len(string_split(encoded, ' ')) AS BIGINT) AS n_sym,
      |  encoded
      |FROM res ORDER BY word""".stripMargin

  /** Gate: 20 likelihood-gain merges on the documents corpus.
    * Rows-only (the iterative global argmax has no ANSI-SQL twin, the
    * ta_bpe_train precedent); deterministic by construction —
    * lexicographic tie-break, exact-integer score inputs — with
    * WordPieceSpec pinning hand-computed fixture goldens and the
    * longest-match encoder round-trip. */
  def ta_wordpiece_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, Tables.documents(s, dir), numMerges = 20)
      .toDF().select($"rank".cast("long").as("rank"), $"left", $"right",
        $"merged", $"freq", $"score")
      .orderBy($"rank")
  }

  /** Bounded-round hash-exact TRAIN gate (VERDICT r16 item 2): the
    * first 3 merges of the PRODUCTION trainer ([[train]] itself, not a
    * one-shot surrogate), hash-exact against a DuckDB twin that
    * replays each round as one symbol-count aggregate + one pair-count
    * aggregate + the (score desc, l, r) argmax — the score the same
    * single IEEE division of exact integer counts proven bit-identical
    * by ta_wordpiece_encode — + a sequential left-to-right merge fold
    * (a per-word recursive CTE replicating [[train]]'s non-overlapping
    * `aggregate` fold). Output carries the selection evidence as exact
    * integers (freq, cl, cr) — no double column to hash. The full
    * 20-merge iterative gate stays ta_wordpiece_train. */
  def ta_wordpiece_train3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, Tables.documents(s, dir), numMerges = 3)
      .toDF().select($"rank".cast("long").as("rank"), $"left", $"right",
        $"merged", $"freq", $"cl", $"cr")
      .orderBy($"rank")
  }

  /** One merge round of the DuckDB TRAIN twin over words table w{i}:
    * unigram counts, pair counts, the score argmax (prefix-correct
    * `##` strip — `replace` would also eat an INTERIOR `##` in words
    * containing literal `#` characters), and the sequential fold. */
  private def wpRoundCte(i: Int): String =
    s"""sc$i AS (
       |  SELECT t, CAST(sum(freq) AS BIGINT) AS c
       |  FROM (SELECT freq, unnest(sym) AS t FROM w$i) GROUP BY t),
       |pc$i AS (
       |  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS p
       |        FROM w$i WHERE len(sym) >= 2)
       |  GROUP BY 1, 2),
       |m$i AS (
       |  SELECT pc.l, pc.r,
       |    pc.l || (CASE WHEN pc.r LIKE '##%' THEN substring(pc.r, 3) ELSE pc.r END) AS merged,
       |    pc.cnt, a.c AS cl, b.c AS cr
       |  FROM pc$i pc JOIN sc$i a ON a.t = pc.l JOIN sc$i b ON b.t = pc.r
       |  ORDER BY CAST(pc.cnt AS DOUBLE) / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) DESC,
       |    pc.l, pc.r
       |  LIMIT 1),
       |f$i AS (
       |  SELECT w, freq, sym, CAST([] AS VARCHAR[]) AS acc, 1 AS i FROM w$i
       |  UNION ALL
       |  SELECT f.w, f.freq, f.sym,
       |    CASE WHEN len(f.acc) > 0 AND f.acc[len(f.acc)] = m.l AND f.sym[f.i] = m.r
       |         THEN list_concat(f.acc[1:len(f.acc)-1], [m.merged])
       |         ELSE list_append(f.acc, f.sym[f.i]) END,
       |    f.i + 1
       |  FROM f$i f, m$i m WHERE f.i <= len(f.sym)),
       |w${i + 1} AS (SELECT w, freq, acc AS sym FROM f$i WHERE i = len(sym) + 1)""".stripMargin

  val taWordPieceTrain3Sql: String =
    s"""WITH RECURSIVE
       |tk AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> len(x) > 0)) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS (
       |  SELECT w, freq,
       |    list_transform(range(1, length(w) + 1),
       |      i -> CASE WHEN i = 1 THEN substring(w, i, 1)
       |                ELSE '##' || substring(w, i, 1) END) AS sym
       |  FROM tk),
       |${(0 until 3).map(wpRoundCte).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS rank, l AS "left", r AS "right", merged, cnt AS freq, cl, cr FROM m0
       |  UNION ALL SELECT 1, l, r, merged, cnt, cl, cr FROM m1
       |  UNION ALL SELECT 2, l, r, merged, cnt, cl, cr FROM m2)
       |ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_wordpiece_train"   -> ta_wordpiece_train _,
    "ta_wordpiece_train3"  -> ta_wordpiece_train3 _,
    "ta_wordpiece_encode"  -> ta_wordpiece_encode _
  )

  val oracles: Map[String, String] = Map(
    "ta_wordpiece_train3" -> taWordPieceTrain3Sql,
    "ta_wordpiece_encode" -> taWordPieceEncodeSql
  )
}
