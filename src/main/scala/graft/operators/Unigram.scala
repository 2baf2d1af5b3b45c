package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed unigram-LM tokenizer training (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — the SentencePiece default,
  * the other tokenizer real pipelines train alongside BPE):
  *
  *   1. seed a large candidate vocabulary (all ≤ `maxPieceLen`
  *      substrings of corpus words, top `seedSize` by occurrence mass,
  *      plus every single character unconditionally);
  *   2. EM: the E-step computes each piece's EXPECTED count over all
  *      segmentations of every word (forward–backward over the word's
  *      segmentation lattice, log-space); the M-step renormalizes
  *      p(piece) = E[count] / Σ E[count];
  *   3. prune: drop the multi-char pieces whose removal costs the
  *      likelihood least (SentencePiece's approximation — a piece's
  *      loss is its expected count times the gap between its own
  *      log-prob and the best segmentation of the piece by the REST
  *      of the vocabulary), shrinking by `shrink` per round until
  *      `vocabSize` remains; single characters are never pruned
  *      (every word must stay segmentable);
  *   4. final EM pass renormalizes the surviving vocabulary.
  *
  * 100 TB shape — identical to [[Bpe]]'s: every statistic lives on the
  * (word, freq) table, so the corpus is scanned ONCE (map-combinable
  * groupBy(word), vocabulary-sized output); each E-step is one
  * distributed flatMap of that table against the BROADCAST current
  * vocabulary followed by a map-combinable sum to ≤|vocab| rows
  * collected at the driver; the M-step and pruning are O(|vocab|)
  * driver arithmetic (pruning's per-piece Viterbi runs on the piece
  * STRINGS, not the corpus). Rounds cost vocabulary, never corpus.
  *
  * Determinism (bit-exact retrains, the ta_bpe_train discipline): the
  * per-word E-step is fixed-order double arithmetic, and its corpus
  * aggregation goes through DECIMAL(28,12) so partition merge order
  * cannot wiggle the last ulp; pruning sorts by (loss desc, piece) —
  * lexicographic tie-break.
  */
object Unigram {
  final case class Piece(token: String, logp: Double)

  private val dec12 = DecimalType(28, 12)

  /** Code points of a word (the shared segmentation unit — same as the
    * BPE side's substr/codePointSyms convention). */
  private def cps(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf.toArray
  }

  /** One corpus pass → (w, freq): the distinct-word table every later
    * round runs on. */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode_outer(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Forward–backward expected piece counts for ONE word under the
    * current vocabulary (log-space, log-sum-exp): the textbook E-step.
    * Returns (piece, expectedCount) for each lattice arc with mass. */
  private[operators] def expectedCounts(word: String,
      vocab: Map[String, Double], maxPieceLen: Int): Seq[(String, Double)] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
    // arcs(i) = (j, piece, logp) for pieces spanning [i, j)
    val arcs = Array.tabulate(n) { i =>
      (1 to math.min(maxPieceLen, n - i)).flatMap { len =>
        val piece = c.slice(i, i + len).mkString
        vocab.get(piece).map(lp => (i + len, piece, lp))
      }
    }
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    for (i <- 0 until n; (j, _, lp) <- arcs(i) if alpha(i) != NEG)
      alpha(j) = lse(alpha(j), alpha(i) + lp)
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    for (i <- (n - 1) to 0 by -1; (j, _, lp) <- arcs(i) if beta(j) != NEG)
      beta(i) = lse(beta(i), lp + beta(j))
    val z = alpha(n)
    if (z == NEG) return Seq.empty // unsegmentable (never: chars are kept)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (i <- 0 until n; (j, piece, lp) <- arcs(i)
         if alpha(i) != NEG && beta(j) != NEG) {
      val m = math.exp(alpha(i) + lp + beta(j) - z)
      acc.update(piece, acc.getOrElse(piece, 0.0) + m)
    }
    acc.toSeq
  }

  /** Viterbi segmentation under a trained vocabulary — the unigram
    * ENCODER (deterministic: strict-improvement updates with pieces
    * tried shortest-first make the result unique). */
  private[operators] def viterbi(word: String, vocab: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val NEG = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NEG); best(0) = 0.0
    val back = Array.fill(n + 1)(-1) // start index of the winning piece
    for (j <- 1 to n; len <- 1 to math.min(maxPieceLen, j)) {
      val i = j - len
      if (best(i) != NEG) {
        vocab.get(c.slice(i, j).mkString).foreach { lp =>
          if (best(i) + lp > best(j)) { best(j) = best(i) + lp; back(j) = i }
        }
      }
    }
    if (best(n) == NEG) return Seq(word) // unsegmentable fallback
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { val i = back(j); out += c.slice(i, j).mkString; j = i }
    out.reverse.toSeq
  }

  /** Substring occurrence mass: (piece, Σ substring-count × word-freq)
    * for every ≤ `maxPieceLen` substring of corpus words — one HOF
    * expansion on the word table, map-combinable sum, vocabulary-sized
    * output. Shared by [[train]]'s seed and the hash-exact ENCODE
    * gate's closed-form vocabulary. */
  private def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val subUdf = udf { (w: String, freq: Long) =>
      val c = cps(w)
      (for (i <- c.indices; len <- 1 to math.min(maxPieceLen, c.length - i))
        yield (c.slice(i, i + len).mkString, freq)).toSeq
    }
    words.select(explode(subUdf(col("w"), col("freq"))).as("p"))
      .groupBy(col("p._1").as("t")).agg(sum(col("p._2")).as("c"))
  }

  /** Closed-form SEED vocabulary quantized to micro-nats — the
    * hash-exact ENCODE gate's vocabulary (the unigram analogue of
    * [[Bpe.initialPairMerges]]): every single character plus the top
    * (seedSize − |chars|) multi-char substrings by occurrence mass
    * (ties → lexicographic), logp = ln(mass / seedMass) quantized by
    * FLOOR to integer micro-nats. The quantization is what buys the
    * gate a DuckDB twin: Viterbi comparisons run on exact BIGINT
    * arithmetic in both engines, so a segmentation tie is an EXACT tie
    * broken by one shared rule — while raw double log-probs differ by
    * a libm ulp between engines and can flip the argmax on
    * mathematically-tied paths (mass products equal ⇒ log sums tie).
    * Training proper ([[train]]) stays the rows-only surface; this
    * list exercises the Viterbi ENCODER — the production-hot path —
    * under a hash-exact oracle. */
  def seedPiecesQ(docs: DataFrame, seedSize: Int,
      maxPieceLen: Int = 6, textCol: String = "text"): Map[String, Long] = {
    val sub = seedCounts(wordFreqs(docs, textCol), maxPieceLen)
    val chars = sub.filter(length(col("t")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = sub.filter(length(col("t")) > 1)
      .orderBy(col("c").desc, col("t"))
      .head(math.max(0, seedSize - chars.length))
      .map(r => (r.getString(0), r.getLong(1)))
    val seedMass = (chars ++ multis).map(_._2).sum.toDouble
    // Residual cross-engine risk (ADVICE r16): the floor quantization
    // removes libm sensitivity only AWAY from integer boundaries — a
    // 1-ulp ln() difference between the JVM and DuckDB flips the floor
    // exactly when log(c/mass)·1e6 lands on an integer, giving an
    // off-by-one micro-nat vocab score and a spurious hash mismatch.
    // The window is ~1 ulp wide per piece (≈10⁻¹⁰ relative), has never
    // reproduced across either engine pair here, and a deterministic
    // integer-only log would cost a rational-arithmetic ladder per
    // piece; if a mismatch ever reproduces, derive logq by comparing
    // c·2^k against mass thresholds in exact BigInt instead.
    (chars ++ multis).map { case (t, c) =>
      t -> math.floor(math.log(c.toDouble / seedMass) * 1e6).toLong
    }.toMap
  }

  /** Viterbi on integer micro-nat scores — bit-identical across engines
    * (exact BIGINT sums; ties broken shortest-last-piece-first via
    * strict-improvement updates with len ascending, the rule the DuckDB
    * twin replays as ORDER BY score DESC, len ASC). */
  private[operators] def viterbiQ(word: String, vocab: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val NEG = Long.MinValue
    val best = Array.fill(n + 1)(NEG); best(0) = 0L
    val back = Array.fill(n + 1)(-1)
    for (j <- 1 to n; len <- 1 to math.min(maxPieceLen, j)) {
      val i = j - len
      if (best(i) != NEG) {
        vocab.get(c.slice(i, j).mkString).foreach { lq =>
          if (best(i) + lq > best(j)) { best(j) = best(i) + lq; back(j) = i }
        }
      }
    }
    if (best(n) == NEG) return Seq(word) // unreachable: chars always seeded
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { val i = back(j); out += c.slice(i, j).mkString; j = i }
    out.reverse.toSeq
  }

  /** One distributed E-step + driver M-step: expected counts of every
    * vocabulary piece over the word table, renormalized to log-probs. */
  private def emStep(words: DataFrame, vocab: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val s = words.sparkSession
    val vb = s.sparkContext.broadcast(vocab)
    val eUdf = udf { (w: String, freq: Long) =>
      expectedCounts(w, vb.value, maxPieceLen)
        .map { case (t, c) => (t, c * freq) }
    }
    val counts = words
      .select(explode(eUdf(col("w"), col("freq"))).as("tc"))
      .groupBy(col("tc._1").as("t"))
      .agg(sum(col("tc._2").cast(dec12)).as("c"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    vb.destroy()
    normalizeCounts(counts)
  }

  private def normalizeCounts(counts: Map[String, Double]): Map[String, Double] = {
    val total = counts.values.sum
    val logTotal = math.log(total)
    // pieces with zero expected mass this round keep a floor so a later
    // round can still recruit them? No — SentencePiece drops them; we
    // keep only observed pieces (chars always re-observed via their own
    // arcs, since every lattice contains the char-only path).
    counts.map { case (t, c) => t -> (math.log(c) - logTotal) }
  }

  /** [[emStep]] on the collected word table — BIT-IDENTICAL arithmetic
    * (r21 driver route): the same per-word expectedCounts, the same
    * `c * freq` double product, the same DECIMAL(·,12) quantization the
    * distributed cast applies (`BigDecimal.valueOf` = the scala
    * `BigDecimal(double)` path, HALF_UP to scale 12), exact decimal
    * accumulation (order-free like the distributed decimal sum), and
    * the same normalization over an identical immutable Map. */
  private def emStepLocal(words: Array[(String, Long)],
      vocab: Map[String, Double], maxPieceLen: Int): Map[String, Double] = {
    val acc = scala.collection.mutable.HashMap.empty[String, java.math.BigDecimal]
    words.foreach { case (w, freq) =>
      expectedCounts(w, vocab, maxPieceLen).foreach { case (t, c) =>
        val d = java.math.BigDecimal.valueOf(c * freq)
          .setScale(12, java.math.RoundingMode.HALF_UP)
        acc.updateWith(t) { case Some(s) => Some(s.add(d)); case None => Some(d) }
      }
    }
    normalizeCounts(acc.iterator.map { case (t, d) => t -> d.doubleValue() }.toMap)
  }

  /** Alphabet floor + dead-piece cleanup after an EM step. EM on a
    * corpus fully explained by multi-char pieces drives single-char
    * expected counts to (decimal-quantized) ZERO; a char at logp −∞
    * then contributes only −∞ lattice arcs, the forward–backward guard
    * drops it from the next round's counts, and it silently leaves the
    * vocabulary — breaking the "every word stays segmentable"
    * invariant (SentencePiece pins required chars the same way). The
    * floor (e⁻³⁰ ≈ 1e−13 of unigram mass) is too small to perturb
    * segmentations but keeps the alphabet's arcs finite. Multi-char
    * pieces whose mass died are legitimately dead — pruned here so −∞
    * rows never reach the trained piece list. */
  private def floorChars(v: Map[String, Double],
      charSet: Set[String]): Map[String, Double] = {
    val floor = -30.0
    val alive = v.filter { case (t, lp) =>
      charSet.contains(t) || lp > Double.NegativeInfinity }
    charSet.foldLeft(alive) { (m, c) =>
      if (m.get(c).exists(_ > Double.NegativeInfinity)) m
      else m.updated(c, floor)
    }
  }

  /** Train a `vocabSize`-piece unigram LM on the corpus. */
  def train(s: SparkSession, docs: DataFrame, vocabSize: Int,
      textCol: String = "text", maxPieceLen: Int = 6, seedSize: Int = 400,
      emIters: Int = 2, shrink: Double = 0.75): Seq[Piece] = {
    val words = wordFreqs(docs, textCol).localCheckpoint()

    // bounded driver route (r21, the TokenizerLocalTrain discipline):
    // everything after the corpus pass is vocabulary-sized — when the
    // checkpointed word table fits the cap, the seed aggregation and
    // every EM round run driver-side with BIT-IDENTICAL arithmetic
    // (integer seed mass, the emStep decimal quantization, utf8-binary
    // tie-breaks); above the cap nothing changes.
    val localWords: Option[Array[(String, Long)]] = {
      val cap = s.conf.getOption("spark.graft.tokenizerLocalTrainWords")
        .map(_.toInt).getOrElse(262144)
      if (cap <= 0) None
      else {
        val rows = words.limit(cap + 1).collect()
        if (rows.length > cap) None
        else Some(rows.map(r => (r.getString(0), r.getLong(1))))
      }
    }

    // ---- seed: all ≤ maxPieceLen substrings, weighted by occurrence
    // mass (substring count × word freq) — one HOF expansion on the
    // word table, map-combinable sum, vocabulary-sized collect
    val (chars, multis) = localWords match {
      case Some(lw) =>
        val sub = scala.collection.mutable.HashMap.empty[String, Long]
        lw.foreach { case (w, freq) =>
          val c = cps(w)
          for (i <- c.indices; len <- 1 to math.min(maxPieceLen, c.length - i)) {
            val t = c.slice(i, i + len).mkString
            sub.update(t, sub.getOrElse(t, 0L) + freq)
          }
        }
        // `length(col("t")) === 1` counts code points, as cps segments
        val ch = sub.iterator.filter { case (t, _) => cps(t).length == 1 }
          .toArray.sortBy(_._1)(TokenizerLocalTrain.utf8Order)
        val mu = sub.iterator.filter { case (t, _) => cps(t).length > 1 }
          .toArray
          .sorted(Ordering.fromLessThan[(String, Long)] { (a, b) =>
            if (a._2 != b._2) a._2 > b._2
            else TokenizerLocalTrain.utf8Order.compare(a._1, b._1) < 0
          })
          .take(math.max(0, seedSize - ch.length))
        (ch, mu)
      case None =>
        val subCounts = seedCounts(words, maxPieceLen)
        val ch = subCounts.filter(length(col("t")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val mu = subCounts.filter(length(col("t")) > 1)
          .orderBy(col("c").desc, col("t"))
          .head(math.max(0, seedSize - ch.length))
          .map(r => (r.getString(0), r.getLong(1)))
        (ch, mu)
    }
    val seedMass = (chars ++ multis).map(_._2).sum.toDouble
    var vocab: Map[String, Double] = (chars ++ multis)
      .map { case (t, cmass) => t -> math.log(cmass / seedMass) }.toMap
    val charSet = chars.map(_._1).toSet
    def emStepFn(v: Map[String, Double]): Map[String, Double] =
      localWords match {
        case Some(lw) => emStepLocal(lw, v, maxPieceLen)
        case None => emStep(words, v, maxPieceLen)
      }

    // ---- EM + prune rounds until the target size
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) {
        vocab = floorChars(emStepFn(vocab), charSet)
        it += 1
      }
      val multiCount = vocab.keys.count(!charSet.contains(_))
      // second clause: a character alphabet already past vocabSize has
      // nothing left to prune — terminate instead of re-running EM forever
      if (multiCount + charSet.size <= vocabSize || multiCount == 0) done = true
      else {
        // prune: loss(t) = E[count_t] × (logp_t − bestAlt_t), where
        // bestAlt segments t's own string with the rest of the vocab —
        // O(|vocab|) driver work on piece strings
        val keepMulti = math.max(vocabSize - charSet.size,
          math.ceil(multiCount * shrink).toInt.min(multiCount - 1))
        val losses = vocab.toSeq.collect {
          case (t, lp) if !charSet.contains(t) =>
            val rest = vocab - t
            val alt = viterbi(t, rest, maxPieceLen)
              .map(p => rest.getOrElse(p, Double.NegativeInfinity)).sum
            // expected count is recoverable from lp (same normalizer for
            // every piece this round), so lp − alt ordering × exp(lp)
            // ranks identically to count × (lp − alt)
            (t, math.exp(lp) * (lp - alt))
        }
        val keep = losses.sortBy { case (t, loss) => (-loss, t) }
          .take(keepMulti).map(_._1).toSet
        vocab = vocab.filter { case (t, _) => charSet.contains(t) || keep(t) }
      }
    }
    vocab = floorChars(emStepFn(vocab), charSet) // final renormalize
    words.unpersist()
    vocab.toSeq.sortBy { case (t, lp) => (-lp, t) }
      .map { case (t, lp) => Piece(t, lp) }
  }

  /** Viterbi encoder column over a trained piece list (broadcast
    * closure, stateless map — never shuffles; the unigram twin of
    * [[Bpe.encodeCol]]). */
  def encodeCol(pieces: Seq[Piece], maxPieceLen: Int = 6): Column => Column = {
    val vocab = pieces.map(p => p.token -> p.logp).toMap
    val enc = udf { (w: String) => viterbi(w, vocab, maxPieceLen) }
    (c: Column) => enc(lower(c))
  }

  /** Gate: 80-piece unigram vocabulary on the documents corpus.
    * Rows-only (iterative EM has no SQL twin; bit-identical retrains by
    * the decimal-accumulated E-step + lexicographic prune ties).
    * Inline quality floor: the trained vocabulary must COMPRESS — mean
    * Viterbi pieces per corpus word ≤ 0.9 × mean characters per word
    * (a broken E-step or prune that collapses to char-only tokenization
    * empties the gate instead of shipping a unigram LM that tokenizes
    * like a character model). */
  def ta_unigram_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val pieces = train(s, docs, vocabSize = 80)
    val vb = s.sparkContext.broadcast(pieces.map(p => p.token -> p.logp).toMap)
    val nPieces = udf { (w: String) => viterbi(w, vb.value, 6).length }
    val nChars = udf { (w: String) => cps(w).length }
    val words = wordFreqs(docs, "text")
    val ratioRow = words.agg(
      (sum(nPieces(col("w")) * col("freq")).cast("double") /
        sum(nChars(col("w")) * col("freq")).cast("double")).as("r")).head()
    val ratio = ratioRow.getDouble(0)
    val out = pieces.zipWithIndex
      .map { case (p, i) => (i.toLong, p.token, p.logp, p.token.length.toLong) }
      .toDF("rank", "token", "logp", "token_len")
    if (ratio <= 0.9) out.orderBy($"rank") else out.limit(0)
  }

  /** Hash-exact ENCODE gate (VERDICT r15 item 3, the unigram twin of
    * ta_bpe_encode): Viterbi-encode every distinct corpus word under
    * the 120-piece closed-form [[seedPiecesQ]] vocabulary on integer
    * micro-nat scores; the DuckDB twin derives the identical vocabulary
    * in SQL and replays Viterbi as a recursive CTE over word positions
    * (best(j) over the ≤6 arcs ending at j, sorted (score desc, len
    * asc) — the exact strict-improvement rule of [[viterbiQ]]). The
    * encoder is a broadcast-closure pure map — the corpus never
    * shuffles; output is vocabulary-of-words-sized. */
  def ta_unigram_encode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val vocabQ = seedPiecesQ(docs, seedSize = 120)
    val vb = s.sparkContext.broadcast(vocabQ)
    val enc = udf { (w: String) => viterbiQ(w, vb.value, 6) }
    docs
      .select(explode_outer(filter(split(trim(lower($"text")), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter($"w".isNotNull).distinct()
      .withColumn("sym", enc($"w"))
      .select($"w".as("word"), size($"sym").cast("long").as("n_sym"),
        array_join($"sym", " ").as("encoded"))
      .orderBy($"word")
  }

  /** Shared CTE prefix of BOTH unigram oracles: word table → quantized
    * 120-piece seed vocabulary → per-word Viterbi paths (`res`). One
    * lattice-DP definition, two consumers ([[taUnigramEncodeSql]] and
    * [[taUnigramTrain1Sql]]). */
  private val latticeCtePrefix: String =
    """tk AS (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0)) AS w
      |    FROM documents) GROUP BY w),
      |sub AS (
      |  SELECT substring(w, i, l) AS t, CAST(sum(freq) AS BIGINT) AS c
      |  FROM tk,
      |    unnest(range(1, length(w) + 1)) AS u1(i),
      |    unnest(range(1, 7)) AS u2(l)
      |  WHERE i + l - 1 <= length(w)
      |  GROUP BY 1),
      |ch AS (SELECT t, c FROM sub WHERE length(t) = 1),
      |mu AS (
      |  SELECT t, c FROM sub WHERE length(t) > 1
      |  ORDER BY c DESC, t
      |  LIMIT greatest(0, 120 - (SELECT count(*) FROM ch))),
      |seed AS (SELECT t, c FROM ch UNION ALL SELECT t, c FROM mu),
      |vocab AS (
      |  SELECT t,
      |    CAST(floor(ln(CAST(c AS DOUBLE) /
      |      (SELECT CAST(sum(c) AS DOUBLE) FROM seed)) * 1000000) AS BIGINT)
      |      AS logq
      |  FROM seed),
      |wd AS (SELECT DISTINCT w FROM tk),
      |arcs AS (
      |  SELECT wd.w, u1.i + u2.l - 1 AS j, u2.l AS len, v.logq, v.t AS piece
      |  FROM wd,
      |    unnest(range(1, length(wd.w) + 1)) AS u1(i),
      |    unnest(range(1, 7)) AS u2(l)
      |  JOIN vocab v ON v.t = substring(wd.w, u1.i, u2.l)
      |  WHERE u1.i + u2.l - 1 <= length(wd.w)),
      |arcl AS (
      |  SELECT w, list(struct_pack(j := j, len := len, logq := logq,
      |    piece := piece)) AS al
      |  FROM arcs GROUP BY w),
      |vit AS (
      |  SELECT w, 0 AS j, [CAST(0 AS BIGINT)] AS bests,
      |    [CAST('' AS VARCHAR)] AS paths, al
      |  FROM arcl
      |  UNION ALL
      |  SELECT w, j + 1,
      |    list_append(bests, cand[1].score),
      |    list_append(paths, cand[1].path), al
      |  FROM (
      |    SELECT w, j, bests, paths, al,
      |      list_sort(list_transform(
      |        list_filter(al, a -> a.j = j + 1),
      |        a -> struct_pack(
      |          negscore := -(bests[j + 2 - a.len] + a.logq),
      |          len := a.len,
      |          score := bests[j + 2 - a.len] + a.logq,
      |          path := CASE WHEN a.len = j + 1 THEN a.piece
      |                       ELSE paths[j + 2 - a.len] || ' ' || a.piece
      |                  END))) AS cand
      |    FROM vit WHERE j < length(w))),
      |res AS (SELECT w, paths[length(w) + 1] AS encoded
      |        FROM vit WHERE j = length(w))""".stripMargin

  val taUnigramEncodeSql: String =
    s"""WITH RECURSIVE
       |$latticeCtePrefix
       |SELECT w AS word,
       |  CAST(len(string_split(encoded, ' ')) AS BIGINT) AS n_sym,
       |  encoded
       |FROM res ORDER BY word""".stripMargin

  /** Hash-exact TRAIN gate (VERDICT r17 item 4, the unigram member of
    * the train3 family): replay ONE hard-EM round of the trainer —
    * E-step, M-step, and the prune loss ranking — on integer micro-nat
    * arithmetic, so a wrong-but-deterministic EM/prune can no longer
    * pass on determinism alone. The full iterative
    * [[ta_unigram_train]] (true forward–backward EM) stays the
    * rows-only surface; this gate pins the round MECHANICS the trainer
    * shares across modes:
    *
    *   - E-step: hard expected counts — each distinct corpus word
    *     contributes its [[viterbiQ]] segmentation (the DP
    *     [[ta_unigram_encode]] already proves hash-exact at this exact
    *     vocabulary) times its frequency; counts are exact BIGINTs.
    *     (Viterbi/hard EM is the classic degenerate-posterior EM
    *     variant; the full trainer's soft E-step replaces the argmax
    *     path with the lattice posterior — transcendental, hence
    *     rows-only.)
    *   - M-step: logq₁(t) = ⌊ln(cnt/total)·1e6⌋ — ONE libm call on an
    *     exact integer ratio per piece, the [[seedPiecesQ]]
    *     quantization with the same documented 1-ulp boundary window.
    *     Characters that lost all mass keep the −30 e6 alphabet floor
    *     ([[floorChars]]'s invariant: every word stays segmentable);
    *     multi-char pieces with zero mass are dead and dropped, as in
    *     [[emStep]].
    *   - Prune loss: loss(t) = cnt(t) × (logq₁(t) − altq(t)) for every
    *     multi-char piece, where altq = the best segmentation score of
    *     t's OWN string under (vocab − t) with post-EM scores — the
    *     production prune formula (count × (lp − alt)) in exact
    *     integers; hashing EVERY piece's loss is strictly stronger
    *     than pinning the argmax alone, ties included.
    *
    * The DuckDB twin replays all three phases as recursive CTEs over
    * the same (word, freq) table — the encode gate's lattice DP for
    * the E-step, and a second per-piece DP (arcs exclude the piece
    * itself) for the loss. */
  def ta_unigram_train1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val vocabQ = seedPiecesQ(docs, seedSize = 120)
    val charSet = vocabQ.keySet.filter(t => cps(t).length == 1)
    val vb = s.sparkContext.broadcast(vocabQ)
    val segUdf = udf { (w: String) => viterbiQ(w, vb.value, 6) }
    // E-step: one distributed pass over the word table; the explode
    // keeps per-occurrence rows, so sum(freq) = Σ freq × multiplicity
    val cnts = wordFreqs(docs, "text")
      .select(explode(segUdf(col("w"))).as("t"), col("freq"))
      .groupBy(col("t")).agg(sum(col("freq")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // M-step + loss: O(|vocab|) driver arithmetic, the trainer's own
    // discipline (rounds cost vocabulary, never corpus)
    val total = cnts.values.sum.toDouble
    val alive = vocabQ.keys.filter(t => charSet(t) || cnts.contains(t)).toSeq
    val logq1: Map[String, Long] = alive.map { t =>
      val c = cnts.getOrElse(t, 0L)
      t -> (if (c == 0L) -30000000L
            else math.floor(math.log(c.toDouble / total) * 1e6).toLong)
    }.toMap
    val rows = alive.sorted.map { t =>
      val c = cnts.getOrElse(t, 0L)
      val loss: Option[Long] = if (charSet(t)) None else {
        val rest = logq1 - t
        val altq = viterbiQ(t, rest, 6).map(rest(_)).sum
        Some(c * (logq1(t) - altq))
      }
      (t, c, logq1(t), loss)
    }
    rows.toDF("token", "cnt", "logq1", "lossq").orderBy($"token")
  }

  val taUnigramTrain1Sql: String =
    s"""WITH RECURSIVE
       |$latticeCtePrefix,
       |occ AS (
       |  SELECT unnest(string_split(r.encoded, ' ')) AS t, r.w
       |  FROM res r),
       |ecnt AS (
       |  SELECT o.t, CAST(sum(tk.freq) AS BIGINT) AS cnt
       |  FROM occ o JOIN tk ON tk.w = o.w GROUP BY o.t),
       |vocab1 AS (
       |  SELECT v.t, CAST(coalesce(e.cnt, 0) AS BIGINT) AS cnt,
       |    CASE WHEN e.cnt IS NULL THEN CAST(-30000000 AS BIGINT)
       |         ELSE CAST(floor(ln(CAST(e.cnt AS DOUBLE) /
       |           (SELECT CAST(sum(cnt) AS DOUBLE) FROM ecnt)) * 1000000)
       |           AS BIGINT)
       |    END AS logq1
       |  FROM vocab v LEFT JOIN ecnt e ON e.t = v.t
       |  WHERE length(v.t) = 1 OR e.cnt IS NOT NULL),
       |mp AS (SELECT t AS p FROM vocab1 WHERE length(t) > 1),
       |larcs AS (
       |  SELECT m.p, u1.i + u2.l - 1 AS j, u2.l AS len, v.logq1 AS lq
       |  FROM mp m,
       |    unnest(range(1, length(m.p) + 1)) AS u1(i),
       |    unnest(range(1, 7)) AS u2(l)
       |  JOIN vocab1 v ON v.t = substring(m.p, u1.i, u2.l) AND v.t <> m.p
       |  WHERE u1.i + u2.l - 1 <= length(m.p)),
       |larcl AS (
       |  SELECT p, list(struct_pack(j := j, len := len, lq := lq)) AS al
       |  FROM larcs GROUP BY p),
       |lvit AS (
       |  SELECT p, 0 AS j, [CAST(0 AS BIGINT)] AS bests, al FROM larcl
       |  UNION ALL
       |  SELECT p, j + 1,
       |    list_append(bests, -(list_sort(list_transform(
       |      list_filter(al, a -> a.j = j + 1),
       |      a -> -(bests[j + 2 - a.len] + a.lq)))[1])), al
       |  FROM lvit WHERE j < length(p)),
       |alt AS (SELECT p, bests[length(p) + 1] AS altq
       |        FROM lvit WHERE j = length(p))
       |SELECT v.t AS token, v.cnt AS cnt, v.logq1 AS logq1,
       |  CASE WHEN length(v.t) > 1
       |       THEN v.cnt * (v.logq1 - a.altq) END AS lossq
       |FROM vocab1 v LEFT JOIN alt a ON a.p = v.t
       |ORDER BY token""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_unigram_train"  -> ta_unigram_train _,
    "ta_unigram_train1" -> ta_unigram_train1 _,
    "ta_unigram_encode" -> ta_unigram_encode _
  )

  val oracles: Map[String, String] = Map(
    "ta_unigram_encode" -> taUnigramEncodeSql,
    "ta_unigram_train1" -> taUnigramTrain1Sql
  )
}
