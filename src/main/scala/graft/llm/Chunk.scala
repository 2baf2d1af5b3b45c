package graft.llm

import scala.collection.mutable.ArrayBuffer

/** Text chunking — the reference's `chunk(splitter, text, kwargs)`
  * surface (`/root/reference/src/api.rs:1309-1322`, LangChain splitters
  * at `src/bindings/langchain/langchain.py:12-29`). Pure Scala, no
  * Python: the two splitters that cover the reference's practical use
  * are `character` (fixed separator) and `recursive_character`
  * (hierarchical separators with merge-to-size), with 1-based output
  * indices like the reference.
  */
object Chunk {
  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

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
      case other => throw new IllegalArgumentException(
        s"unknown splitter: $other (supported: character, recursive_character)")
    }
    chunks.zipWithIndex.map { case (c, i) => (i + 1, c) }
  }
}
