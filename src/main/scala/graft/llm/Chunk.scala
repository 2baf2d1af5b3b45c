package graft.llm

import scala.collection.mutable.ArrayBuffer

/** Text chunking — the reference's `chunk(splitter, text, kwargs)`
  * surface (`/root/reference/src/api.rs:1309-1322`, LangChain splitters
  * at `src/bindings/langchain/langchain.py:12-29`). Pure Scala, no
  * Python. All seven reference splitters dispatch: `character` (fixed
  * separator), `recursive_character` (hierarchical separators with
  * merge-to-size), `markdown`/`latex`/`python` (the same recursive
  * engine with LangChain's published separator hierarchies), and
  * `nltk`/`spacy` (sentence-boundary splitters — here a punctuation
  * regex stands in for the tokenizer models, which don't ship on a bare
  * JVM; chunk merge semantics are LangChain's). 1-based output indices
  * like the reference.
  */
object Chunk {
  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  /** LangChain MarkdownTextSplitter separators: headings first, then
    * horizontal rules, then the character defaults. */
  val MarkdownSeparators: Seq[String] = Seq(
    "\n## ", "\n### ", "\n#### ", "\n##### ", "\n###### ",
    "\n\n***\n\n", "\n\n---\n\n", "\n\n___\n\n",
    "\n\n", "\n", " ", "")

  /** LangChain LatexTextSplitter separators: sectioning commands, then
    * environments, then math delimiters. */
  val LatexSeparators: Seq[String] = Seq(
    "\n\\chapter{", "\n\\section{", "\n\\subsection{", "\n\\subsubsection{",
    "\n\\begin{enumerate}", "\n\\begin{itemize}", "\n\\begin{description}",
    "\n\\begin{list}", "\n\\begin{quote}", "\n\\begin{quotation}",
    "\n\\begin{verse}", "\n\\begin{verbatim}", "\n\\begin{align}",
    "$$", "$", " ", "")

  /** LangChain PythonCodeTextSplitter separators: class/def boundaries
    * first. */
  val PythonSeparators: Seq[String] = Seq(
    "\nclass ", "\ndef ", "\n\tdef ", "\n\n", "\n", " ", "")

  /** LangChain-style character splitter: split on one separator, then
    * greedily merge adjacent pieces up to chunkSize with overlap. */
  def characterSplit(text: String, separator: String = "\n\n",
      chunkSize: Int = 4000, overlap: Int = 200): Seq[String] = {
    val pieces =
      if (separator.isEmpty) text.map(_.toString)
      else text.split(java.util.regex.Pattern.quote(separator), -1).toSeq
    merge(pieces, separator, chunkSize, overlap)
  }

  /** Recursive character splitter: try separators in order; any piece
    * still longer than chunkSize recurses with the next separator. */
  def recursiveSplit(text: String, chunkSize: Int = 4000, overlap: Int = 200,
      separators: Seq[String] = DefaultSeparators): Seq[String] = {
    val sep = separators.find(s => s.isEmpty || text.contains(s))
      .getOrElse(separators.last)
    val rest = separators.drop(separators.indexOf(sep) + 1)
    val splits =
      if (sep.isEmpty) text.grouped(chunkSize).toSeq
      else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq

    val goodPieces = ArrayBuffer.empty[String]
    val out = ArrayBuffer.empty[String]
    def flush(): Unit = if (goodPieces.nonEmpty) {
      out ++= merge(goodPieces.toSeq, sep, chunkSize, overlap)
      goodPieces.clear()
    }
    splits.foreach { piece =>
      if (piece.length < chunkSize) goodPieces += piece
      else {
        flush()
        if (rest.isEmpty) out += piece
        else out ++= recursiveSplit(piece, chunkSize, overlap, rest)
      }
    }
    flush()
    out.filter(_.nonEmpty).toSeq
  }

  /** Greedy merge of split pieces into ≤chunkSize chunks with a sliding
    * overlap tail (LangChain `_merge_splits` behavior). */
  private def merge(pieces: Seq[String], separator: String, chunkSize: Int,
      overlap: Int): Seq[String] = {
    val sepLen = separator.length
    val out = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[String]
    var curLen = 0
    pieces.foreach { p =>
      val extra = if (cur.isEmpty) 0 else sepLen
      if (curLen + p.length + extra > chunkSize && cur.nonEmpty) {
        out += cur.mkString(separator)
        // keep the overlap tail
        while (curLen > overlap ||
            (curLen + p.length + (if (cur.isEmpty) 0 else sepLen) > chunkSize && curLen > 0)) {
          curLen -= cur.head.length + (if (cur.size > 1) sepLen else 0)
          cur.remove(0)
        }
      }
      cur += p
      curLen += p.length + (if (cur.size > 1) sepLen else 0)
    }
    if (cur.nonEmpty) out += cur.mkString(separator)
    out.filter(_.trim.nonEmpty).toSeq
  }

  /** Sentence-boundary split (the nltk/spacy splitter shape): sentences
    * end at ./!/? followed by whitespace; merged like LangChain's
    * NLTKTextSplitter (separator "\n\n"). */
  def sentenceSplit(text: String, chunkSize: Int = 4000,
      overlap: Int = 200): Seq[String] = {
    val sentences = text.split("(?<=[.!?])\\s+").toSeq
    merge(sentences, "\n\n", chunkSize, overlap)
  }

  /** Dispatch like the reference's splitter argument; returns 1-based
    * (index, chunk) pairs (`src/api.rs:1316`). */
  def chunk(splitter: String, text: String,
      kwargs: Map[String, String] = Map.empty): Seq[(Int, String)] = {
    val size = kwargs.get("chunk_size").map(_.toInt).getOrElse(4000)
    val overlap = kwargs.get("chunk_overlap").map(_.toInt).getOrElse(200)
    val chunks = splitter match {
      case "character" =>
        characterSplit(text, kwargs.getOrElse("separator", "\n\n"), size, overlap)
      case "recursive_character" => recursiveSplit(text, size, overlap)
      case "markdown" => recursiveSplit(text, size, overlap, MarkdownSeparators)
      case "latex" => recursiveSplit(text, size, overlap, LatexSeparators)
      case "python" => recursiveSplit(text, size, overlap, PythonSeparators)
      case "nltk" | "spacy" => sentenceSplit(text, size, overlap)
      case other => throw new IllegalArgumentException(
        s"unknown splitter: $other (supported: character, recursive_character, " +
          "markdown, latex, python, nltk, spacy)")
    }
    chunks.zipWithIndex.map { case (c, i) => (i + 1, c) }
  }
}
