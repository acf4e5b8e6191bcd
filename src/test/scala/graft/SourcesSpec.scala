package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trips every supported format through write→read and asserts
  * value equality against the source table (timestamp/double/string
  * columns all exercised via `orders`).
  */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val orders = Tables(spark, sf, "orders")

  sources.FormatIO.formats.foreach { fmt =>
    test(s"$fmt round-trip preserves all rows and values") {
      val dir = java.nio.file.Files.createTempDirectory(s"fmt_$fmt").toString
      sources.FormatIO.write(orders, fmt, s"$dir/orders", partitions = 4)
      val back = sources.FormatIO.read(spark, fmt, s"$dir/orders", orders.schema)
      assert(back.count() == orders.count())
      assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty,
        s"$fmt round-trip changed values")
    }
  }

  test("binaryFile source: one row per media file, glob-pruned listing") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    val payloads = Map("a.img" -> "fake-image-bytes-a",
      "b.img" -> "fake-image-bytes-bb", "skip.txt" -> "not-media")
    payloads.foreach { case (name, content) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        content.getBytes("UTF-8"))
    }
    val media = sources.FormatIO.readBinaryFiles(spark, dir, "*.img")
    assert(media.count() == 2, "glob must prune non-media at listing time")
    assert(media.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    // Content arrives intact as a binary column — the mediaTable /
    // decodeFeatures input shape.
    val rows = media.select(col("path"), col("content")).collect()
      .map(r => (r.getString(0).split('/').last,
        new String(r.getAs[Array[Byte]]("content"), "UTF-8"))).toMap
    assert(rows == payloads.view.filterKeys(_.endsWith(".img")).toMap)
    // Length column matches the payload (metadata-only predicates can
    // skip decode entirely).
    assert(media.filter(col("length") =!= length(col("content"))).isEmpty)
  }

  test("text source: line-per-row and whole-file corpus ingestion") {
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d1.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d2.txt"),
      "single doc\n".getBytes("UTF-8"))
    val lines = sources.FormatIO.readTextLines(spark, dir)
    assert(lines.count() == 3)
    val whole = sources.FormatIO.readTextLines(spark, dir, wholeFile = true)
    assert(whole.count() == 2, "wholetext: one row per document")
    assert(whole.filter(col("value").contains("line one\nline two")).count() == 1)
  }

  test("jdbc reader carries partitioned-range scan options") {
    // Structural check against the reference's MySQL URL shape; the
    // live round-trip below uses embedded Derby.
    val r = sources.FormatIO.jdbcReader(spark, "jdbc:mysql://example/db",
      "lineitem", "l_orderkey", 0L, 1000000L, 32)
    assert(r != null) // construction itself validates option plumbing
  }

  test("jdbc round-trip (embedded Derby): range partitioning + predicate pushdown") {
    // The reference's real source is a JDBC table scan
    // (BulkProcessImpl.java:96-100, one streaming cursor); Spark's
    // partitioned-range read replaces it with numPartitions parallel
    // range queries. Derby ships on the Spark classpath, so the full
    // read path — dialect, range WHERE clauses, filter pushdown — is
    // exercised live.
    val home = java.nio.file.Files.createTempDirectory("graft_derby")
    System.setProperty("derby.system.home", home.toString)
    val url = s"jdbc:derby:$home/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE orders_src (o_key INT NOT NULL, o_val VARCHAR(16))")
      val ins = conn.prepareStatement("INSERT INTO orders_src VALUES (?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"v$i"); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val df = sources.FormatIO.jdbcReader(spark, url, "orders_src",
      "o_key", 1L, 100L, 4).load()
    // Range partitioning: numPartitions parallel range queries, every
    // row exactly once (the boundaries neither drop nor duplicate).
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    import org.apache.spark.sql.functions.col
    val filtered = df.filter(col("o_key") > 90)
    assert(filtered.count() == 10)
    // Predicate pushdown: the filter must reach the JDBC scan as a
    // PushedFilters entry, not run Spark-side over a full table pull.
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters:") && physical.contains("GreaterThan(O_KEY,90)"),
      s"filter not pushed to JDBC source:\n$physical")
    // Values survive the dialect round-trip.
    assert(df.filter(col("o_key") === 7).select("o_val").head.getString(0) == "v7")
  }

  test("jdbc keyed-upsert sink (embedded Derby): last-write-wins re-import, count parity") {
    // The WRITE half of the reference's bulk-store contract
    // (BulkProcessImpl.java:124 — keyed _id upsert, re-import
    // overwrites), live against Derby: import, re-import with changed
    // values, count parity + new values win; partitioned input proves
    // executor-side parallel writers.
    val home = java.nio.file.Files.createTempDirectory("graft_derby_sink")
    System.setProperty("derby.system.home", home.toString)
    val url = s"jdbc:derby:$home/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE docs_sink (doc_key INT NOT NULL PRIMARY KEY, doc_val VARCHAR(24))")
    finally conn.close()

    import org.apache.spark.sql.functions._
    def corpus(tag: String) = spark.range(1, 101)
      .select(col("id").cast("int").as("doc_key"),
        concat(lit(tag), col("id")).as("doc_val"))
      .repartition(4)

    sources.FormatIO.jdbcUpsert(corpus("v1_"), url, "docs_sink", "doc_key",
      batchSize = 16)
    val read1 = sources.FormatIO.jdbcReader(spark, url, "docs_sink",
      "doc_key", 1L, 100L, 4).load()
    assert(read1.count() == 100)
    assert(read1.filter(col("doc_key") === 7).head.getString(1) == "v1_7")

    // Re-import the SAME keys with new values + 20 genuinely new keys:
    // overwrite, never duplicate (the ES _id semantics).
    val v2 = spark.range(1, 121)
      .select(col("id").cast("int").as("doc_key"),
        concat(lit("v2_"), col("id")).as("doc_val"))
      .repartition(4)
    sources.FormatIO.jdbcUpsert(v2, url, "docs_sink", "doc_key", batchSize = 16)
    val read2 = sources.FormatIO.jdbcReader(spark, url, "docs_sink",
      "doc_key", 1L, 120L, 4).load().cache()
    assert(read2.count() == 120, "re-import must overwrite, not duplicate")
    assert(read2.groupBy(col("doc_key")).count()
      .filter(col("count") > 1).count() == 0, "duplicate keys after upsert")
    assert(read2.filter(col("doc_key") === 7).head.getString(1) == "v2_7",
      "last write must win")
    assert(read2.filter(col("doc_key") === 110).head.getString(1) == "v2_110")
    read2.unpersist()

    // Identifiers are interpolated into statement text — anything
    // outside the unquoted-identifier grammar must fail FAST on the
    // driver, never reach the executors as a broken/injectable
    // statement. Schema-qualified table names stay legal.
    val bad = intercept[IllegalArgumentException] {
      sources.FormatIO.jdbcUpsert(corpus("x_"), url,
        "docs_sink; DROP TABLE docs_sink", "doc_key")
    }
    assert(bad.getMessage.contains("identifier"), bad.getMessage)
    intercept[IllegalArgumentException] {
      sources.FormatIO.jdbcUpsert(
        corpus("x_").withColumnRenamed("doc_val", "doc val"),
        url, "docs_sink", "doc_key")
    }
  }

  test("malformed JSON: PERMISSIVE captures, FAILFAST refuses") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("json_dirty")
    java.nio.file.Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{"id": 3, "v": BROKEN
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    assert(permissive.count() == 3)
    assert(permissive.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter("id IS NOT NULL").count() == 2)
    permissive.unpersist()

    val failfast = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "FAILFAST").json(dir.toString)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("csv without explicit schema would lose types (why schema is required)") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv_noschema").toString
    sources.FormatIO.write(orders, "csv", s"$dir/orders")
    val inferred = spark.read.option("header", "true").csv(s"$dir/orders")
    assert(inferred.schema.fields.forall(_.dataType.typeName == "string"))
  }
}
