package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats (SURVEY.md §1.3 mapping: the reference's
  * MySQL-source/ES-sink pair generalizes to Spark's pluggable
  * DataSource V2 surface).
  *
  * Supported here: parquet (columnar, the 100 TB default), orc
  * (columnar alternative), csv + json + xml (text interchange; xml is
  * Spark 4's built-in spark-xml successor). CSV/JSON/XML reads take an
  * explicit schema — schema inference is a full extra pass over 100 TB
  * and non-deterministic under dirty data, so the engine treats it as
  * a dev-only convenience.
  */
object FormatIO {

  val formats: Seq[String] = Seq("parquet", "orc", "csv", "json", "xml")

  def write(df: DataFrame, format: String, path: String,
            partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    val w = out.write.mode(SaveMode.Overwrite).format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rootTag", "rows").option("rowTag", "row")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case "xml" => r.option("rowTag", "row")
      case _ => r
    }).load(path)
  }

  /** Media-file ingestion — the entry point of the multimodal pipeline
    * (graft.multimodal operates on binary columns this source
    * produces): each file becomes one row (path, modificationTime,
    * length, content: binary). `pathGlobFilter` prunes by extension at
    * LISTING time; `maxBytesPerTrigger`-style batching is the
    * streaming twin. At 100 TB of media the number that matters is
    * files-per-task: Spark packs small files into tasks by
    * `maxPartitionBytes`, so millions of small images parallelize
    * without a manual manifest.
    */
  def readBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Raw-text corpus ingestion: one row per line (or whole file with
    * `wholetext`) — the on-ramp for document pipelines before any
    * schema exists.
    */
  def readTextLines(spark: SparkSession, dir: String,
                    wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(dir)

  /** The reference's real source: a partitioned-range JDBC scan —
    * `BulkProcessImpl.java:96-100` streams one cursor; Spark instead
    * splits `[lowerBound, upperBound]` on `partitionColumn` into
    * `numPartitions` parallel range queries (no cursor bottleneck, no
    * driver materialization). Exercised LIVE in SourcesSpec against
    * embedded Derby (on the Spark classpath): range partitioning,
    * predicate pushdown into the remote query, and dialect round-trip
    * — MySQL/Postgres swap in by URL in a connected deployment.
    */
  def jdbcReader(spark: SparkSession, url: String, table: String,
                 partitionColumn: String, lowerBound: Long, upperBound: Long,
                 numPartitions: Int): org.apache.spark.sql.DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 10000)
}
