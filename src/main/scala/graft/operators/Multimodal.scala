package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads are opaque `BinaryType` columns with a typed metadata
  * struct; decode / feature-extract runs as a batched partition-local
  * transform.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly marked deterministic STUB — the Spark-side plumbing
  * (schema, batch shape, partition-local execution, feature schema) is
  * real and tested, and swapping the stub for a JNI/codec call changes
  * nothing structural.
  *
  * Scale notes: decode is `mapPartitions` with an internal batch size —
  * one task decodes its partition's blobs in fixed-size batches (the
  * Scala analogue of `mapInPandas` batches), no shuffle, no
  * driver-side collection; feature extraction output is columnar and
  * prunable.
  */
object Multimodal {

  /** Feature row produced by the (stub) decoder. */
  case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Build a media table from the documents corpus: the text payload
    * stands in for an opaque media blob (UTF-8 bytes), with typed
    * metadata. */
  def asMedia(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast("binary").as("content"),
        struct(
          // deterministic fake mime from doc_id — STUB for real sniffing
          concat(lit("image/fake"), (col("doc_id") % 3).cast("string")).as("mime"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          col("source").as("source")).as("meta"))

  /** Batched partition-local decode → features.
    *
    * STUB decode kernel: features are a deterministic function of the
    * payload bytes (so tests are exact). A real deployment replaces
    * `decodeOne` with an actual codec; the partition/batch plumbing is
    * unchanged.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "content", "meta.mime", "meta.n_bytes")
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "decoder call" per batch — the batch boundary is where
          // a real kernel would amortize codec/model setup
          batch.iterator.map { case (id, bytes, mime, n) => decodeOne(id, bytes, mime, n) }
        }
      }
      .toDF()
  }

  /** STUB: deterministic fake decode of one payload. ??? in spirit —
    * replace with a real codec; signature and output schema are the
    * contract. */
  private def decodeOne(id: Long, bytes: Array[Byte], mime: String, n: Long): MediaFeatures = {
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(
      doc_id = id,
      mime = mime,
      n_bytes = n,
      width = (sum % 640).toInt + 1,
      height = (sum % 480).toInt + 1,
      n_frames = (n % 30).toInt + 1,
      brightness = (sum % 256) / 255.0)
  }

  /** Oracle-checkable slice of the multimodal surface: byte length +
    * content digest of the binary payload (md5 is identical across
    * engines), grouped per fake-mime bucket. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> { (s, d) =>
      asMedia(s, d)
        .select(
          col("doc_id"),
          col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          md5(col("content")).as("digest"))
        .orderBy("doc_id")
    },
    "m2_media_stats" -> { (s, d) =>
      asMedia(s, d)
        .groupBy(col("meta.mime").as("mime"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("meta.n_bytes")).as("total_bytes"),
          max(col("meta.n_bytes")).as("max_bytes"))
        .orderBy("mime")
    }
  )

  def oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
           'image/fake' || CAST(doc_id % 3 AS VARCHAR) AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
         FROM documents ORDER BY doc_id""",
    "m2_media_stats" ->
      """SELECT 'image/fake' || CAST(doc_id % 3 AS VARCHAR) AS mime,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
         FROM documents GROUP BY 1 ORDER BY mime"""
  )
}
