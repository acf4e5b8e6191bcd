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

  /** Keyed idempotent JDBC SINK — the write half of the reference's
    * bulk-store contract (`BulkProcessImpl.java:124`: every document
    * lands under its `_id`, re-imports overwrite): per input
    * partition, ONE transaction of batched DELETE-by-key followed by
    * batched INSERT. Delete-then-insert is the vendor-NEUTRAL upsert —
    * MERGE/ON CONFLICT/ON DUPLICATE KEY syntax differs per engine and
    * Derby (the live spec target) has none — and is exactly
    * last-write-wins under re-import. Connections open on the
    * EXECUTORS (`foreachPartition`), statements batch `batchSize`
    * rows, commit is per-partition — a failed partition rolls back
    * whole, and Spark's task retry re-runs it idempotently (the same
    * keys delete-then-insert again). The input must be key-unique:
    * route it through [[graft.etl.IndexStore.dedupByKey]]'s
    * last-write-wins survivor first (as bulkImport does) — two rows
    * with one key in one batch would both survive the insert. At
    * cluster scale this is numPartitions concurrent bulk writers,
    * the reference's "10 concurrent bulks" knob as task parallelism.
    */
  /** SQL identifiers are interpolated into the DELETE/INSERT text, so
    * they are VALIDATED against the unquoted-identifier grammar first
    * (plain word, optionally schema-qualified for the table) — an
    * identifier needing quoting (spaces, reserved words, case-folding
    * tricks) fails fast here instead of producing a broken or
    * injectable statement on the executors.
    */
  private val SqlWord = "[A-Za-z_][A-Za-z0-9_]*".r
  private def requireIdent(s: String, what: String, qualified: Boolean): Unit = {
    val parts = if (qualified) s.split('.').toSeq else Seq(s)
    require(parts.nonEmpty && parts.forall(p => SqlWord.pattern.matcher(p).matches()),
      s"jdbcUpsert: $what '$s' is not a plain SQL identifier" +
        (if (qualified) " (optionally schema-qualified)" else "") +
        " — quoted/special identifiers are not supported")
  }

  def jdbcUpsert(df: DataFrame, url: String, table: String, idCol: String,
                 batchSize: Int = 1000, driverClass: Option[String] = None): Unit = {
    val cols = df.columns.toSeq
    require(cols.contains(idCol), s"id column '$idCol' not in ${cols.mkString(",")}")
    requireIdent(table, "table", qualified = true)
    cols.foreach(requireIdent(_, "column", qualified = false))
    val deleteSql = s"DELETE FROM $table WHERE $idCol = ?"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val idIdx = cols.indexOf(idCol)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        // Drivers that don't self-register via the ServiceLoader
        // manifest (older/shaded jars) load explicitly on the EXECUTOR
        // before getConnection — otherwise they fail only at task
        // runtime with a bare "No suitable driver".
        driverClass.foreach(Class.forName)
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(deleteSql)
          val ins = conn.prepareStatement(insertSql)
          var pending = 0
          def flush(): Unit = if (pending > 0) {
            del.executeBatch() // deletes first: insert of an existing key
            ins.executeBatch() // would violate the PK before its delete ran
            pending = 0
          }
          rows.foreach { r =>
            del.setObject(1, r.get(idIdx))
            del.addBatch()
            var i = 0
            while (i < cols.length) { ins.setObject(i + 1, r.get(i)); i += 1 }
            ins.addBatch()
            pending += 1
            if (pending >= batchSize) flush()
          }
          flush()
          conn.commit()
        } catch {
          case t: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw t
        } finally conn.close()
      }
    }
  }
}
