package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language-ID, quality scoring, token
  * counting, fingerprinting, chunking, per-doc corpus-LM perplexity).
  * All pure `functions._` column expressions (whole-stage codegen, no
  * UDFs). The per-doc ops are embarrassingly parallel — no shuffle
  * except the final ORDER BY for oracle determinism, a single map
  * stage over the scan at 100 TB. The one exception is
  * [[ta_doc_perplexity]], which by nature aggregates corpus-global
  * token counts first (explode+groupBy, then an equi-join) — its own
  * scaladoc carries the scale story.
  *
  * Reference surface: `chunk()` (SURVEY §2.1 #chunk,
  * `/root/reference/src/api.rs:1309-1322`) re-expressed as a
  * fixed-window splitter; the rest are the BASELINE.json north-star
  * text ops.
  *
  * Oracle-parity rule: every derived number is computed with the same
  * IEEE-double expression tree DuckDB evaluates, from exact integer
  * counts — so raw doubles compare bit-identically (no rounding needed).
  */
object TextAnalysis {
  /** Normalized whitespace tokens, shared by all ops. */
  private[operators] def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  private val enStops = Seq("the", "a", "of", "is", "and", "to", "in", "it")

  /** The heuristic quality score in [0,1] as a reusable column expression
    * over a raw text column — shared by ta_quality and the
    * percentile-threshold pruning operator (CorpusQuality), so both
    * gates score with the one expression tree. */
  private[operators] def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, c => c.isInCollection(enStops))).cast("double")
    val nPunct = length(regexp_replace(text, "[^.!?,;:]", "")).cast("double")
    val nChar = length(text).cast("double")
    // nChar = 0 (empty doc) would make the punct term 0/0 = NaN, and the
    // engines disagree on NaN ordering in downstream percentiles — treat
    // an empty doc as punct-free instead (same CASE in the SQL twins)
    lit(0.4) * least(lit(1.0), nTok / lit(60.0)) +
      lit(0.3) * least(lit(1.0), (nStop / nTok) * lit(5.0)) +
      lit(0.3) * (lit(1.0) - least(lit(1.0),
        when(nChar > 0, (nPunct / nChar) * lit(10.0)).otherwise(lit(0.0))))
  }

  /** The same score as DuckDB SQL over a `text` column (oracle twin).
    * The `(textCol)` form scores the full-rule curation oracle's
    * C4-cleaned `kept_text`. */
  private[operators] val qualityScoreSql: String = qualityScoreSqlOn("text")

  private[operators] def qualityScoreSqlOn(textCol: String): String = {
    val t = s"regexp_split_to_array(trim(lower($textCol)), '\\s+')"
    val stops = enStops.map(w => s"'$w'").mkString(", ")
    s"""0.4 * least(1.0, CAST(len($t) AS DOUBLE) / 60.0)
       |  + 0.3 * least(1.0, (CAST(len(list_filter($t, x -> x IN ($stops))) AS DOUBLE) / len($t)) * 5.0)
       |  + 0.3 * (1.0 - least(1.0, CASE WHEN length($textCol) > 0
       |      THEN (CAST(length(regexp_replace($textCol, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length($textCol)) * 10.0
       |      ELSE 0.0 END))""".stripMargin
  }

  def ta_token_stats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        size(toks($"text")).cast("long").as("n_tokens"),
        length(trim($"text")).cast("long").as("n_chars_trim"),
        size(array_distinct(toks($"text"))).cast("long").as("n_distinct_tokens"))
      .orderBy($"doc_id")
  }

  val taTokenSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(length(trim(text)) AS BIGINT) AS n_chars_trim,
      |  CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT) AS n_distinct_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Heuristic quality score in [0,1]: length, punctuation density,
    * stopword density, type-token ratio — the standard pre-training
    * quality-filter signals. */
  def ta_quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val nStop = size(filter(t, c => c.isInCollection(enStops))).cast("double")
    val nPunct = length(regexp_replace($"text", "[^.!?,;:]", "")).cast("double")
    val nChar = length($"text").cast("double")
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val score = qualityScore($"text")
    Tables.documents(s, dir)
      .select($"doc_id",
        nTok.cast("long").as("n_tokens"),
        (nStop / nTok).as("stopword_ratio"),
        (nPunct / nChar).as("punct_ratio"),
        ttr.as("type_token_ratio"),
        score.as("quality_score"))
      .orderBy($"doc_id")
  }

  val taQualitySql: String = {
    val t = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    val stops = enStops.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len($t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter($t, x -> x IN ($stops))) AS DOUBLE) / len($t) AS stopword_ratio,
       |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(len(list_distinct($t)) AS DOUBLE) / len($t) AS type_token_ratio,
       |  0.4 * least(1.0, CAST(len($t) AS DOUBLE) / 60.0)
       |  + 0.3 * least(1.0, (CAST(len(list_filter($t, x -> x IN ($stops))) AS DOUBLE) / len($t)) * 5.0)
       |  + 0.3 * (1.0 - least(1.0, CASE WHEN length(text) > 0
       |      THEN (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text)) * 10.0
       |      ELSE 0.0 END)) AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** N-gram-marker language ID: count per-language stopword hits, argmax
    * with fixed tie-break. Returns doc-level prediction plus the labeled
    * `lang` column so accuracy is inspectable downstream. */
  def ta_lang_id(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    def hits(ws: Seq[String]) = size(filter(t, c => c.isInCollection(ws)))
    val en = hits(Seq("the", "a", "of", "is", "and"))
    val es = hits(Seq("el", "la", "de", "que", "los"))
    val de = hits(Seq("der", "die", "und", "ist", "das"))
    val fr = hits(Seq("le", "les", "et", "une", "est"))
    val pred =
      when(en >= es && en >= de && en >= fr && en > 0, "en")
        .when(es >= de && es >= fr && es > 0, "es")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang".as("lang_label"), pred.as("lang_pred"),
        en.cast("long").as("c_en"), es.cast("long").as("c_es"),
        de.cast("long").as("c_de"), fr.cast("long").as("c_fr"))
      .orderBy($"doc_id")
  }

  val taLangSql: String = {
    val t = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    def h(ws: Seq[String]) =
      s"len(list_filter($t, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    val en = h(Seq("the", "a", "of", "is", "and"))
    val es = h(Seq("el", "la", "de", "que", "los"))
    val de = h(Seq("der", "die", "und", "ist", "das"))
    val fr = h(Seq("le", "les", "et", "une", "est"))
    s"""SELECT doc_id, lang AS lang_label,
       |  CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr AND $en > 0 THEN 'en'
       |       WHEN $es >= $de AND $es >= $fr AND $es > 0 THEN 'es'
       |       WHEN $de >= $fr AND $de > 0 THEN 'de'
       |       WHEN $fr > 0 THEN 'fr'
       |       ELSE 'unknown' END AS lang_pred,
       |  CAST($en AS BIGINT) AS c_en, CAST($es AS BIGINT) AS c_es,
       |  CAST($de AS BIGINT) AS c_de, CAST($fr AS BIGINT) AS c_fr
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprint of the normalized text (exact-dedup key). */
  def ta_fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", md5(trim(lower($"text"))).as("fingerprint"))
      .orderBy($"doc_id")
  }

  val taFingerprintSql: String =
    """SELECT doc_id, md5(trim(lower(text))) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Fixed-window character chunking (the `chunk()` surface): windows of
    * 120 chars, stride 90 (30-char overlap), 1-indexed like the
    * reference (`src/api.rs:1316` returns 1-based chunk indices). */
  def ta_chunk_fixed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nChunks = floor((length($"text") - 1) / 90).cast("int")
    Tables.documents(s, dir)
      .select($"doc_id", $"text", posexplode(sequence(lit(0), nChunks)))
      .select($"doc_id", (col("pos") + 1).cast("long").as("chunk_idx"),
        expr("substring(text, pos * 90 + 1, 120)").as("chunk"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val taChunkSql: String =
    """SELECT doc_id, CAST(i + 1 AS BIGINT) AS chunk_idx,
      |  substr(text, CAST(i * 90 + 1 AS INTEGER), 120) AS chunk
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, ((length(text) - 1) // 90) + 1)) AS i
      |      FROM documents) t
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Per-document unigram perplexity against the CORPUS language model —
    * the CCNet-style quality-filter signal (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * LREC 2020 — there a KenLM; here the corpus's own unigram LM, which
    * keeps the gate self-contained and DuckDB-replayable): documents
    * whose tokens are globally rare score HIGH perplexity (noise,
    * boilerplate, wrong-language) and get pruned by thresholding.
    *
    *   perp(d) = exp( ln N − (1/n_d)·Σ_{w∈d} ln c(w) )
    *
    * with c = corpus token counts, N = Σc. 100 TB shape: one
    * explode+groupBy builds the count table (the heavy-hitters shape,
    * map-combinable), one equi-join on the token hands each occurrence
    * its count (vocab table broadcastable for natural-language vocab
    * sizes; falls back to a shuffle join past the threshold), one
    * per-doc agg. FP parity: per-doc value is exp/ln over exact integer
    * counts, cast to REAL like the corpus-level perplexity gate — the
    * 4-byte round absorbs libm ulp differences. */
  def ta_doc_perplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NON-EMPTY tokens (the corpus-level perplexity gate's convention):
    // an empty/whitespace doc must contribute NO pseudo-token to the LM
    // and receive NO perplexity row, not a finite score from ''
    val words = Tables.documents(s, dir)
      .select($"doc_id",
        explode(filter(toks($"text"), x => length(x) > 0)).as("w"))
    val counts = words.groupBy($"w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum($"c").cast("double").as("n"))
    words.join(counts, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(log($"c".cast("double"))).as("sl"))
      .join(broadcast(total))
      .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"),
        exp(log($"n") - $"sl" / $"n_tokens").cast("float").as("perplexity"))
      .orderBy($"doc_id")
  }

  val taDocPerplexitySql: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |w AS (SELECT doc_id, unnest(t) AS w FROM tk),
      |c AS (SELECT w, count(*) AS c FROM w GROUP BY w),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
      |d AS (
      |  SELECT w.doc_id, count(*) AS n_tokens,
      |    sum(ln(CAST(c.c AS DOUBLE))) AS sl
      |  FROM w JOIN c ON w.w = c.w GROUP BY w.doc_id)
      |SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(exp(ln(tot.n) - d.sl / d.n_tokens) AS REAL) AS perplexity
      |FROM d, tot ORDER BY doc_id""".stripMargin

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", App. A1.1 —
    * the MassiveText quality filter, the rule set real curation
    * pipelines apply FIRST, before any learned classifier):
    *
    *   1. 50 ≤ word count ≤ 100 000
    *   2. 3 ≤ mean word length ≤ 10
    *   3. symbol-to-word ratio ('#' chars + non-overlapping "..."
    *      occurrences, over words) ≤ 0.1
    *   4. ≤ 90% of lines start with a bullet ('-', '*', '•' after
    *      optional indent)
    *   5. ≤ 30% of lines end with an ellipsis ("..." or '…')
    *   6. ≥ 80% of words contain at least one alphabetic character
    *   7. at least 2 of the 8 Gopher stop words {the, be, to, of,
    *      and, that, have, with} appear (token-exact on the repo's
    *      shared whitespace tokenization)
    *
    * Emits the measured stats, one verdict column per rule, and the
    * conjunction as `keep` — per-doc map-stage column expressions
    * (HOFs over the token/line arrays, no UDF, no shuffle except the
    * oracle ORDER BY), so the filter costs one scan at any corpus
    * size. Empty docs guard every ratio's 0/0 with an explicit 0.0
    * (they fail rule 1 regardless). Takes the documents frame as a
    * parameter so the boundary-fixture spec feeds it directly. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val t = filter(toks(col("text")), x => length(x) > lit(0))
    val nW = size(t).cast("long")
    val nWd = nW.cast("double")
    val sumLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val meanLen = when(nW > 0, sumLen.cast("double") / nWd).otherwise(lit(0.0))
    val nHash = (length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))).cast("long")
    val nEllipsis = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
    val symRatio = when(nW > 0, (nHash + nEllipsis).cast("double") / nWd)
      .otherwise(lit(0.0))
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("double") // ≥ 1 by split semantics
    val nBullet = size(filter(lines, l => l.rlike("^[ \\t]*[-*•]"))).cast("double")
    val nEllLine = size(filter(lines,
      l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double")
    val nAlpha = size(filter(t, x => x.rlike("[a-z]"))).cast("double")
    val alphaFrac = when(nW > 0, nAlpha / nWd).otherwise(lit(0.0))
    val stopHits = size(array_intersect(array_distinct(t),
      array(gopherStops.map(lit): _*))).cast("long")
    val r1 = nW >= 50L && nW <= 100000L
    val r2 = meanLen >= 3.0 && meanLen <= 10.0
    val r3 = symRatio <= 0.1
    val r4 = (nBullet / nLines) <= 0.9
    val r5 = (nEllLine / nLines) <= 0.3
    val r6 = alphaFrac >= 0.8
    val r7 = stopHits >= 2L
    docs.select(col("doc_id"),
      nW.as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"),
      (nBullet / nLines).as("bullet_line_frac"),
      (nEllLine / nLines).as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("n_stop_hits"),
      r1.as("r_word_count"), r2.as("r_mean_word_len"),
      r3.as("r_symbol_ratio"), r4.as("r_bullet_lines"),
      r5.as("r_ellipsis_lines"), r6.as("r_alpha_words"),
      r7.as("r_stop_words"),
      (r1 && r2 && r3 && r4 && r5 && r6 && r7).as("keep"))
  }

  private[operators] val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
    * the published heuristics that built C4, applied before Gopher-era
    * filters in real pipelines):
    *
    *   line level — retain a line only if it (a) ends in a terminal
    *   punctuation mark ('.', '!', '?', '"' after right-trim — the C4
    *   reference implementation's end-mark set), (b) has ≥ 5 words,
    *   and (c) does not contain the word "javascript" (case-folded);
    *
    *   page level — discard the page when the RETAINED text has fewer
    *   than 3 sentences (terminal-mark count as the deterministic
    *   sentence proxy), or the original page contains "lorem ipsum"
    *   (case-folded), a curly bracket, or any blocklist token
    *   (token-exact on the shared whitespace tokenization; the
    *   published filter uses the "Dirty/Naughty" list — the list is a
    *   parameter, the gate pins a small spam-marker default).
    *
    * (C4's remaining rule — three-sentence span dedup — is the
    * separate [[Dedup.dd_span_dedup]] operator.) Pure per-doc HOF
    * column expressions: one map stage over the scan at any corpus
    * size, no shuffle beyond the oracle ORDER BY. Emits the retained
    * text + per-rule verdict columns + the keep conjunction;
    * hash-exact vs the DuckDB twin. */
  def c4Rules(docs: DataFrame,
      blocklist: Seq[String] = Seq("viagra", "casino", "xxx")): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l => {
      val r = rtrim(l)
      (r.endsWith(".") || r.endsWith("!") || r.endsWith("?") ||
        r.endsWith("\"")) &&
        size(filter(split(l, "\\s+"), t => length(t) > 0)) >= 5 &&
        !lower(l).contains("javascript")
    })
    val keptText = array_join(kept, "\n")
    val nSent = (length(keptText) -
      length(regexp_replace(keptText, "[.!?]", ""))).cast("long")
    val toks = filter(split(trim(lower(col("text"))), "\\s+"),
      t => length(t) > 0)
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val hasBrace = col("text").contains("{") || col("text").contains("}")
    val hasBlock = size(array_intersect(array_distinct(toks),
      array(blocklist.map(lit): _*))) > 0
    val keep = nSent >= 3L && !hasLorem && !hasBrace && !hasBlock
    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      keptText.as("kept_text"),
      nSent.as("n_sentences"),
      hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
      hasBlock.as("has_blockword"),
      keep.as("keep"))
  }

  def ta_c4_rules(s: SparkSession, dir: String): DataFrame =
    c4Rules(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** The C4 line-retention lambda (DuckDB) — ONE definition shared by
    * [[c4SqlCte]] and the full-rule curation oracle
    * ([[Curation.dsCurationFullSql]]). */
  private[operators] val c4KeepLineSql: String =
    """l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
      OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
      AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> len(x) > 0)) >= 5
      AND NOT contains(lower(l), 'javascript')""".replaceAll("\n\\s*", " ")

  private[operators] val c4BlocklistSql: String =
    Seq("viagra", "casino", "xxx").map(w => s"'$w'").mkString(", ")

  /** Compact C4 chain over relation `rel` (which must carry doc_id,
    * source, text): `${p}c4r` = (doc_id, source, kept_text, keep) with
    * the FULL page conjunction — the full-rule curation oracle's stage
    * 1, kept_text feeding every later stage. */
  private[operators] def c4FullCteOn(rel: String, p: String): String =
    s"""${p}c4m AS (
       |  SELECT doc_id, source, text,
       |    list_filter(regexp_split_to_array(text, '\\n'), $c4KeepLineSql) AS kept
       |  FROM $rel),
       |${p}c4r AS (
       |  SELECT doc_id, source, kept_text,
       |    (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
       |      AND NOT has_blockword) AS keep
       |  FROM (
       |  SELECT doc_id, source,
       |    coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
       |    CAST(length(coalesce(array_to_string(kept, chr(10)), ''))
       |      - length(regexp_replace(coalesce(array_to_string(kept, chr(10)), ''), '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
       |    contains(lower(text), 'lorem ipsum') AS has_lorem,
       |    (contains(text, '{') OR contains(text, '}')) AS has_brace,
       |    len(list_intersect(list_distinct(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)),
       |      [$c4BlocklistSql])) > 0 AS has_blockword
       |  FROM ${p}c4m) t)""".stripMargin

  /** CTE chain (c4m, c4r) — c4r carries every C4 stat plus the `keep`
    * verdict; ONE SQL definition shared by [[taC4Sql]] and the
    * curation-pipeline oracle ([[Curation.dsCurationSql]]). */
  val c4SqlCte: String = {
    val block = c4BlocklistSql
    val keepLine = c4KeepLineSql
    s"""c4m AS (
       |  SELECT doc_id, text,
       |    regexp_split_to_array(text, '\\n') AS ls,
       |    list_filter(regexp_split_to_array(text, '\\n'), $keepLine) AS kept
       |  FROM documents),
       |c4r AS (
       |  SELECT doc_id, n_lines, n_lines_kept, kept_text, n_sentences,
       |    has_lorem, has_brace, has_blockword,
       |    (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
       |      AND NOT has_blockword) AS keep
       |  FROM (
       |  SELECT doc_id,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(kept) AS BIGINT) AS n_lines_kept,
       |    coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
       |    CAST(length(coalesce(array_to_string(kept, chr(10)), ''))
       |      - length(regexp_replace(coalesce(array_to_string(kept, chr(10)), ''), '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
       |    contains(lower(text), 'lorem ipsum') AS has_lorem,
       |    (contains(text, '{') OR contains(text, '}')) AS has_brace,
       |    len(list_intersect(list_distinct(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)),
       |      [$block])) > 0 AS has_blockword
       |  FROM c4m) t)""".stripMargin
  }

  val taC4Sql: String =
    s"""WITH $c4SqlCte
       |SELECT doc_id, n_lines, n_lines_kept, kept_text, n_sentences,
       |  has_lorem, has_brace, has_blockword, keep
       |FROM c4r ORDER BY doc_id""".stripMargin

  def ta_gopher_rules(s: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** CTE chain (gm, gr) — gr carries every Gopher stat, the per-rule
    * verdicts, and the `keep` conjunction; ONE SQL definition shared by
    * [[taGopherSql]] and the curation-pipeline oracle. The `(rel,
    * textCol, p)` form lets the full-rule curation oracle score the
    * C4-cleaned `kept_text` of its pool relation under prefixed names. */
  val gopherSqlCte: String = gopherCteOn("documents", "text", "")

  private[operators] def gopherCteOn(rel: String, textCol: String,
      p: String): String = {
    val text = textCol
    val t = s"list_filter(regexp_split_to_array(trim(lower($text)), '\\s+'), x -> len(x) > 0)"
    val stops = gopherStops.map(w => s"'$w'").mkString(", ")
    s"""${p}gm AS (
       |  SELECT doc_id,
       |    CAST(len($t) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform($t, x -> length(x))), 0) AS BIGINT) AS sum_len,
       |    CAST(length($text) - length(regexp_replace($text, '#', '', 'g')) AS BIGINT) AS n_hash,
       |    CAST((length($text) - length(regexp_replace($text, '\\.\\.\\.', '', 'g'))) // 3 AS BIGINT) AS n_ell,
       |    CAST(len(regexp_split_to_array($text, '\\n')) AS DOUBLE) AS n_lines,
       |    CAST(len(list_filter(regexp_split_to_array($text, '\\n'),
       |      l -> regexp_matches(l, '^[ \\t]*[-*•]'))) AS DOUBLE) AS n_bullet,
       |    CAST(len(list_filter(regexp_split_to_array($text, '\\n'),
       |      l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS DOUBLE) AS n_ell_line,
       |    CAST(len(list_filter($t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS n_alpha,
       |    CAST(len(list_intersect(list_distinct($t), [$stops])) AS BIGINT) AS n_stop_hits
       |  FROM $rel),
       |${p}gr0 AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN CAST(n_hash + n_ell AS DOUBLE) / n_words ELSE 0.0 END AS symbol_word_ratio,
       |    n_bullet / n_lines AS bullet_line_frac,
       |    n_ell_line / n_lines AS ellipsis_line_frac,
       |    CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END AS alpha_word_frac,
       |    n_stop_hits
       |  FROM ${p}gm),
       |${p}gr AS (
       |  SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       |    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
       |    (n_words >= 50 AND n_words <= 100000) AS r_word_count,
       |    (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_mean_word_len,
       |    (symbol_word_ratio <= 0.1) AS r_symbol_ratio,
       |    (bullet_line_frac <= 0.9) AS r_bullet_lines,
       |    (ellipsis_line_frac <= 0.3) AS r_ellipsis_lines,
       |    (alpha_word_frac >= 0.8) AS r_alpha_words,
       |    (n_stop_hits >= 2) AS r_stop_words,
       |    ((n_words >= 50 AND n_words <= 100000)
       |      AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       |      AND (symbol_word_ratio <= 0.1)
       |      AND (bullet_line_frac <= 0.9)
       |      AND (ellipsis_line_frac <= 0.3)
       |      AND (alpha_word_frac >= 0.8)
       |      AND (n_stop_hits >= 2)) AS keep
       |  FROM ${p}gr0)""".stripMargin
  }

  val taGopherSql: String = {
    val t = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)"
    val stops = gopherStops.map(w => s"'$w'").mkString(", ")
    s"""WITH $gopherSqlCte
       |SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
       |  r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet_lines,
       |  r_ellipsis_lines, r_alpha_words, r_stop_words, keep
       |FROM gr ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_gopher_rules"    -> ta_gopher_rules _,
    "ta_c4_rules"        -> ta_c4_rules _,
    "ta_token_stats"     -> ta_token_stats _,
    "ta_quality"         -> ta_quality _,
    "ta_lang_id"         -> ta_lang_id _,
    "ta_fingerprint"     -> ta_fingerprint _,
    "ta_chunk_fixed"     -> ta_chunk_fixed _,
    "ta_doc_perplexity"  -> ta_doc_perplexity _
  )

  val oracles: Map[String, String] = Map(
    "ta_gopher_rules"    -> taGopherSql,
    "ta_c4_rules"        -> taC4Sql,
    "ta_token_stats"     -> taTokenSql,
    "ta_quality"         -> taQualitySql,
    "ta_lang_id"         -> taLangSql,
    "ta_fingerprint"     -> taFingerprintSql,
    "ta_chunk_fixed"     -> taChunkSql,
    "ta_doc_perplexity"  -> taDocPerplexitySql
  )
}
