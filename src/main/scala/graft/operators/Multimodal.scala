package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media features — the output schema of the decode stage.
  * At production scale the decoder fills real width/height/duration from
  * the codec; here the values are a deterministic fake (see
  * [[Multimodal.decodeStub]]). */
final case class MediaFeatures(
    doc_id: Long, byte_len: Int, head_hex: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and a partition-batched decode/feature-extract
  * stage.
  *
  * The Spark-side plumbing is real — schema, partitioning, iterator
  * batch shape, Encoder-typed output — but the actual codec work is a
  * STUB (this container ships no image/audio libraries): `decodeStub`
  * derives deterministic fake features from the bytes. Swapping in a
  * real decoder changes ONE function, nothing about the plan.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no JVM-object
  * blowup); decode runs via `mapPartitions` so a real implementation can
  * amortize codec init per partition (the moral equivalent of
  * `mapInPandas` batch processing); feature output is a narrow typed
  * Dataset that downstream joins/aggregations consume without touching
  * the bytes again.
  */
object Multimodal {

  /** documents.text bytes play the media payload role. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("lang"), col("source"), col("n_chars"),
        lit("text/plain").as("mime")).as("meta"))

  /** THE decode stub — replace with a real codec call in production.
    * Deterministic fake features derived from payload bytes only. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val head = payload.take(16)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(head).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = docId,
      byte_len = payload.length,
      head_hex = hex,
      width = 64 + (payload.length % 640),
      height = 64 + ((payload.length * 7) % 480),
      n_frames = 1 + (payload.length % 16))
  }

  /** Partition-batched decode: one iterator pass per partition (codec
    * init would live at the top of the lambda, amortized per batch). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (real impl: open codec context here)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
  }

  /** Resize stage STUB: a real implementation decodes + rescales pixel
    * data; the fake derives target-bounded dimensions and a truncated
    * payload, keeping the batch shape (mapPartitions, binary in/out). */
  def resizeStub(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val w = 64 + (bytes.length % 640)
          val h = 64 + ((bytes.length * 7) % 480)
          val scale = math.min(1.0,
            math.min(maxW.toDouble / w, maxH.toDouble / h))
          val outW = math.max(1, (w * scale).toInt)
          val outH = math.max(1, (h * scale).toInt)
          (id, outW, outH, bytes.take(math.min(bytes.length, outW * outH / 64)))
        }
      }
      .toDF("doc_id", "width", "height", "payload")
  }

  /** Frame-sampling stage STUB: a real implementation pulls every Nth
    * video frame; the fake emits one row per sampled byte-offset window
    * with a deterministic frame hash — the explode-shaped output a
    * frame-level pipeline consumes. */
  def frameSampleStub(media: DataFrame, everyN: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        bytes.grouped(32).zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case (chunk, i) =>
            (id, i, md.digest(chunk).take(4).map("%02x".format(_)).mkString)
          }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }

  val queries: Seq[Q] = Seq(

    // Typed metadata + payload byte accounting — pure column ops on the
    // binary payload, fully oracle-checkable.
    Q("mm_meta",
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |       ascii(substr(text, 1, 1)) AS first_code,
        |       lang, source, 'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        ascii(substring(col("text"), 1, 1)).as("first_code"),
        col("lang"), col("source"), lit("text/plain").as("mime"))
        .orderBy("doc_id")
    },

    // The decode pipeline end-to-end: binary payload → mapPartitions
    // stub decode → typed features. Fully oracle-checked: the stub's
    // fake features are pure arithmetic on the byte length, and head_hex
    // is md5 over the first 16 bytes — document text is ASCII, so
    // DuckDB's md5 over the 16-char substring hashes the same bytes.
    Q("mm_decode_stub",
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |       md5(substr(text, 1, 16)) AS head_hex,
        |       CAST(64 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST(64 + (octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |       CAST(1 + octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      decodeFeatures(mediaTable(s, d)).orderBy("doc_id")
    }
  )
}
