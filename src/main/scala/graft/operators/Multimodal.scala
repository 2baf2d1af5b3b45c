package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * `mapPartitions` (the JVM analogue of `mapInPandas`).
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `StubDecoder.decode` derives deterministic metadata + a fixed-shape
  * feature vector from the bytes. Everything around it — the binary
  * column, schema contract, partition batching, per-executor decoder
  * instance, fixed-length feature output — is the real plumbing a codec
  * drops into (swap `StubDecoder` for one wrapping javax.imageio/ffmpeg).
  *
  * Scale: decode is a pure map stage over the binary scan; parquet
  * stores the blobs row-grouped so `spark.sql.files.maxPartitionBytes`
  * bounds per-task memory; features go to a fixed-width array column
  * that downstream ANN/dedup operators consume directly.
  */
object Multimodal {
  final case class MediaMeta(nBytes: Long, format: String, checksum: Long)

  /** Deterministic stand-in for a codec: metadata + 8 pooled "features"
    * from byte windows. A real decoder replaces ONLY this object. */
  object StubDecoder extends Serializable {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"

    def decode(bytes: Array[Byte]): (MediaMeta, Array[Float]) = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) & 0xFFFFFFFFL; i += 1 }
      val meta = MediaMeta(bytes.length.toLong, sniffFormat(bytes), sum)
      val feats = new Array[Float](8)
      if (bytes.nonEmpty) {
        val window = math.max(bytes.length / 8, 1)
        var k = 0
        while (k < 8) {
          var acc = 0.0; var n = 0
          var j = k * window
          while (j < math.min((k + 1) * window, bytes.length)) {
            acc += (bytes(j) & 0xff); n += 1; j += 1
          }
          feats(k) = if (n == 0) 0f else (acc / n / 255.0).toFloat
          k += 1
        }
      }
      (meta, feats)
    }
  }

  /** documents.text reinterpreted as an opaque media blob — the testdata
    * has no real binary column, so the bytes ARE the payload. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("media_id"), $"text".cast("binary").as("payload"),
        $"source", $"lang")
  }

  /** Batched decode: one decoder per executor, fixed output schema
    * (media_id, n_bytes, format, checksum, features[8]). */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 128): DataFrame = {
    val base = df.schema
    val schema = StructType(base.fields ++ Seq(
      StructField("n_bytes", LongType), StructField("format", StringType),
      StructField("checksum", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = base.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // batch shape mirrors mapInPandas
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          val (meta, feats) = StubDecoder.decode(if (bytes == null) Array.empty else bytes)
          Row.fromSeq(r.toSeq ++ Seq(meta.nBytes, meta.format, meta.checksum, feats.toSeq))
        }
      }
    }(enc)
  }

  /** Stub "resize": sample `size` bytes at evenly-spaced positions
    * pos(j) = floor(j·len/size) — the byte-level analogue of
    * nearest-neighbor image downsampling. A real codec swaps the
    * sampler for pixel-space interpolation; the batched per-executor
    * plumbing (binary in, fixed-width binary out) is identical. */
  def resize(df: DataFrame, size: Int = 16, payloadCol: String = "payload",
      batchSize: Int = 128): DataFrame = {
    val base = df.schema
    val schema = StructType(base.fields :+ StructField("thumb", BinaryType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = base.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
          val thumb =
            if (bytes.isEmpty) Array.empty[Byte]
            else Array.tabulate(size)(j => bytes((j.toLong * bytes.length / size).toInt))
          Row.fromSeq(r.toSeq :+ thumb)
        }
      }
    }(enc)
  }

  /** Stub "frame sampling": treat the payload as `nFrames` fixed-width
    * frames (video analogue), keep every `stride`-th frame, emit one
    * row per kept frame with the frame's rolling checksum. Real
    * decoders replace the fixed-width splitter with container parsing;
    * the explode-shaped output (media_id, frame_idx, ...) and batched
    * execution carry over. */
  def frameSample(df: DataFrame, nFrames: Int = 8, stride: Int = 2,
      payloadCol: String = "payload", idCol: String = "media_id",
      batchSize: Int = 128): DataFrame = {
    val base = df.schema
    val schema = StructType(Seq(
      StructField("media_id", base(base.fieldIndex(idCol)).dataType),
      StructField("frame_idx", LongType),
      StructField("frame_bytes", LongType),
      StructField("frame_checksum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val pIdx = base.fieldIndex(payloadCol)
    val iIdx = base.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](pIdx)).getOrElse(Array.empty[Byte])
          val id = r.get(iIdx)
          val w = math.max(bytes.length / nFrames, 1)
          (0 until nFrames by stride).flatMap { f =>
            val lo = f * w
            val hi = math.min((f + 1) * w, bytes.length)
            if (lo >= bytes.length) None
            else {
              var sum = 0L
              var i = lo
              while (i < hi) { sum = (sum * 31 + (bytes(i) & 0xff)) & 0xFFFFFFFFL; i += 1 }
              Some(Row(id, f.toLong, (hi - lo).toLong, sum))
            }
          }
        }
      }
    }(enc)
  }

  /** Gate: evenly-sampled 16-byte thumbnail, checked by byte length +
    * md5 digest. The oracle rebuilds the thumbnail from the sampled
    * characters (ASCII corpus: chars == bytes) and hashes it — proving
    * the sampling arithmetic and the binary-out plumbing. */
  def mm_resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    resize(mediaTable(s, dir))
      .select($"media_id", length($"thumb").cast("long").as("thumb_len"),
        md5($"thumb").as("thumb_digest"))
      .orderBy($"media_id")
  }

  val mmResizeSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS len
      |  FROM documents)
      |SELECT media_id,
      |  CASE WHEN len = 0 THEN CAST(0 AS BIGINT) ELSE CAST(16 AS BIGINT) END AS thumb_len,
      |  md5(list_aggregate(
      |    list_transform(range(0, 16), j -> text[CAST(j * len // 16 AS BIGINT) + 1]),
      |    'string_agg', '')) AS thumb_digest
      |FROM b ORDER BY media_id""".stripMargin

  /** Gate: every-2nd-of-8 frame checksums. Oracle replays the frame
    * window arithmetic and the rolling checksum via list_reduce. */
  def mm_frame_sample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    frameSample(mediaTable(s, dir))
      .orderBy($"media_id", $"frame_idx")
  }

  val mmFrameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |    list_transform(range(1, length(text)+1),
      |      j -> CAST(ord(text[j]) AS BIGINT)) AS bytes,
      |    CAST(length(text) AS BIGINT) AS len,
      |    greatest(length(text) // 8, 1) AS w
      |  FROM documents),
      |frames AS (
      |  SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
      |    least((f+1)*w, len) - f*w AS n,
      |    bytes[f*w+1 : least((f+1)*w, len)] AS fb
      |  FROM b, (SELECT unnest([0, 2, 4, 6]) AS f) fs
      |  WHERE f*w < len)
      |SELECT media_id, frame_idx, CAST(n AS BIGINT) AS frame_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), fb),
      |    (a, x) -> (a*31 + x) % 4294967296) AS frame_checksum
      |FROM frames ORDER BY media_id, frame_idx""".stripMargin

  /** Oracle-checkable query: binary metadata via the decode path. The
    * checksum/features are stub-specific (rows-only check would apply),
    * so the oracle covers the engine-independent parts: byte length and
    * md5 of the payload, proving the binary column plumbing end-to-end. */
  def mm_binary_meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(mediaTable(s, dir))
      .select($"media_id", $"n_bytes", md5($"payload").as("digest"), $"format")
      .orderBy($"media_id")
  }

  val mmBinaryMetaSql: String =
    """SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest, 'raw' AS format
      |FROM documents ORDER BY media_id""".stripMargin

  /** Full stub-decode output, exploded to scalar rows so the gate can
    * hash it: (media_id, checksum, dim, value). The DuckDB oracle
    * replays the stub math closed-form (documents.text is pure ASCII at
    * every SF, so `ord` == byte value), proving the mapPartitions decode
    * plumbing preserves row/vector alignment — same pattern as
    * llm_embed_stub. */
  def mm_decode_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(mediaTable(s, dir))
      .select($"media_id", $"checksum", posexplode($"features"))
      .select($"media_id", $"checksum", $"pos".cast("long").as("dim"),
        $"col".as("value"))
      .orderBy($"media_id", $"dim")
  }

  /** Closed-form replay of StubDecoder.decode: rolling 32-bit polynomial
    * checksum via list_reduce; 8 windowed byte averages with the same
    * window arithmetic (floor(len/8) min 1, tail bytes beyond 8*w
    * dropped) and the same double-division order `sum / n / 255.0`
    * before the REAL cast, so values compare bit-identical. */
  val mmDecodeFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |    list_transform(range(1, length(text)+1),
      |      j -> CAST(ord(text[j]) AS BIGINT)) AS bytes,
      |    CAST(length(text) AS BIGINT) AS len
      |  FROM documents),
      |ck AS (
      |  SELECT media_id, bytes, len,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
      |      (a, x) -> (a*31 + x) % 4294967296) AS checksum,
      |    greatest(len // 8, 1) AS w
      |  FROM b)
      |SELECT media_id, checksum, CAST(k AS BIGINT) AS dim,
      |  CASE WHEN least((k+1)*w, len) - k*w <= 0 THEN CAST(0.0 AS REAL)
      |       ELSE CAST(list_sum(bytes[k*w+1 : least((k+1)*w, len)])::DOUBLE
      |            / (least((k+1)*w, len) - k*w) / 255.0 AS REAL) END AS value
      |FROM ck, (SELECT unnest(range(0, 8)) AS k) ks
      |ORDER BY media_id, dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"     -> mm_binary_meta _,
    "mm_decode_features" -> mm_decode_features _,
    "mm_resize"          -> mm_resize _,
    "mm_frame_sample"    -> mm_frame_sample _
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta"     -> mmBinaryMetaSql,
    "mm_decode_features" -> mmDecodeFeaturesSql,
    "mm_resize"          -> mmResizeSql,
    "mm_frame_sample"    -> mmFrameSampleSql
  )
}
