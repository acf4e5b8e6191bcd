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
    * k-th video frame; checksum makes the result assertable. The rolling
    * hash runs mod 1e9+7 (not raw Long wraparound) so the exact same
    * fold is expressible in an oracle engine whose BIGINT errors on
    * overflow instead of wrapping.
    */
  val ChecksumMod = 1000000007L

  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        var i = 0; var n = 0; var checksum = 0L
        while (i < r.payload.length) {
          n += 1
          checksum = (checksum * 31 + (r.payload(i) & 0xFF)) % ChecksumMod
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
    // The stub's byte math IS SQL-expressible (the fixture payload is
    // ASCII text, so bytes == code points), so the whole mapPartitions
    // path gets a hard DuckDB check. Histogram serialized (array_join)
    // at the output boundary so the harness can sort/hash rows.
    "mm_decode_features" -> ((s, dir) =>
      decodeFeatures(mediaTable(s, dir))
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          array_join(transform(col("histogram"), _.cast(StringType)), ",")
            .as("histogram"))
        .orderBy(col("doc_id"))),

    // Frame sampling (every 8th byte); rolling mod-hash checksum gets a
    // hard DuckDB check via list_reduce over the same sampled bytes.
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
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // The fixture payload is UTF-8 of ASCII text (verified: octet_length
    // == length for every doc), so byte values == unicode code points —
    // DuckDB reproduces the byte histogram/mean/rolling hash exactly.
    "mm_decode_features" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    list_transform(generate_series(1, length(text)), i -> unicode(text[i])) AS bytes
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(16 AS INT) AS width,
        |  CAST(ceil(n_chars / 16.0) AS INT) AS height,
        |  CASE WHEN len(bytes) = 0 THEN 0.0
        |       ELSE round(CAST(list_sum(bytes) AS DOUBLE) / len(bytes), 6)
        |  END AS mean_byte,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    bin -> len(list_filter(bytes, v -> v // 16 = bin))), ',') AS histogram
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(text), 8),
        |                   i -> CAST(unicode(text[i]) AS BIGINT)) AS sampled
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(sampled) AS INT) AS n_frames,
        |  CAST(CASE WHEN len(sampled) = 0 THEN 0
        |            ELSE list_reduce(sampled, (x, y) -> (x * 31 + y) % 1000000007)
        |       END AS BIGINT) AS frame_checksum
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
