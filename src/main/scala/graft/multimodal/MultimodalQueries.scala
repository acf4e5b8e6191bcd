package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column operators (SURVEY.md §2.4): media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (byte-level math standing in for
  * pixel math) — but the Spark-side plumbing is real and is the part
  * that matters at 100 TB: binary columns travel through parquet scans
  * untouched by codegen projections, metadata lives in a sibling
  * struct so pruning can drop the payload when only metadata is read,
  * and per-row decoding runs inside `mapPartitions` (one iterator per
  * task — the same batch shape a JNI/FFI decoder or Arrow-batched UDF
  * needs, amortizing codec init per partition, never per row).
  */
object MultimodalQueries {

  /** A media row: payload + typed metadata (what a real pipeline
    * carries for images: format, dims; binary stays opaque).
    */
  case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String,
                      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           mean_byte: Double, histogram: Array[Long])

  case class FrameSample(doc_id: Long, n_frames: Int, frame_checksum: Long)

  /** Derive a binary "media" table from documents: payload =
    * UTF-8 bytes of text (the fixture's stand-in for an image blob),
    * metadata = fake dims where width=16, height=ceil(len/16).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake/raw").as("fmt"),
        lit(16).as("width"),
        ceil(col("n_chars") / 16.0).cast(IntegerType).as("height"))

  /** STUBBED DECODE: a real build links an image codec here (JNI or
    * Arrow UDF); the fake computes a 16-bin byte histogram + mean —
    * deterministic, so the plumbing is testable. Runs per PARTITION:
    * codec init (`new Array` here, a decoder context in real life)
    * happens once per task, rows stream through.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xFF
          hist(b / 16) += 1
          sum += b
          i += 1
        }
        val mean = if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length
        MediaFeatures(r.doc_id, r.width, r.height, mean, hist)
      }
    }.toDF()
  }

  /** STUBBED FRAME SAMPLING: every k-th byte plays the role of every
    * k-th video frame; checksum makes the result assertable.
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        var i = 0; var n = 0; var checksum = 0L
        while (i < r.payload.length) {
          n += 1
          checksum = checksum * 31 + (r.payload(i) & 0xFF)
          i += k
        }
        FrameSample(r.doc_id, n, checksum)
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary-column stats per source — metadata-only read path; the
    // whole query is SQL-expressible so DuckDB checks the binary
    // handling (encode + octet_length semantics) exactly.
    "mm_binary_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          encode(col("text"), "UTF-8").as("payload"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_blobs"),
          sum(length(col("payload"))).as("total_bytes"),
          min(length(col("payload"))).as("min_bytes"),
          max(length(col("payload"))).as("max_bytes"))
        .orderBy(col("source"))
    }),

    // Decode + feature-extract through mapPartitions (stub decoder).
    // Not SQL-expressible (imperative decode) -> rows-only + spec.
    "mm_decode_features" -> ((s, dir) =>
      decodeFeatures(mediaTable(s, dir))
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"), col("histogram"))
        .orderBy(col("doc_id"))),

    // Frame sampling (every 8th byte) -> rows-only + spec.
    "mm_frame_sample" -> ((s, dir) =>
      sampleFrames(mediaTable(s, dir), 8)
        .orderBy(col("doc_id")))
  )

  val oracleSql: Map[String, String] = Map(
    "mm_binary_stats" ->
      """SELECT source, count(*) AS n_blobs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(min(octet_length(encode(text))) AS INT) AS min_bytes,
        |  CAST(max(octet_length(encode(text))) AS INT) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
