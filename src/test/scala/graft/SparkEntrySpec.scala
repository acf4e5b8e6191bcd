package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // Broadcast discipline (scale safety): static auto-broadcast OFF —
      // Catalyst's static size estimates for aggregate/cache-derived
      // frames read tiny and would broadcast corpus-scale build sides
      // (measured driver OOM at the 30x ScaleBench corpus); AQE promotes
      // joins to broadcast only from ACTUAL runtime sizes. Explicit
      // broadcast() on bounded frames is unaffected.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      // Partition discovery of cell-partitioned artifacts (up to 1024
      // geo/IVF cell dirs) runs DRIVER-SIDE below this threshold: a
      // 1024-task listing JOB costs ~1.7 s of pure task overhead per
      // query CONSTRUCTION (measured, geo probe r8) vs ~50 ms of
      // driver listStatus calls. Above ~8k dirs the distributed
      // listing wins again - exactly Spark's intended use of the knob.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
      // Shuffle-partition scaling: sizing for the FIXTURE (32) starves
      // a 100x corpus - each of 32 partitions then carries 100x the
      // rows and the sort/shuffle spills (measured: the substring
      // finder's real 1.2 slope at 30->100x collapses to ~linear at
      // 512 initial partitions, 154 -> 107 s at 100x). The
      // scale-correct discipline is a HIGH initial count with AQE
      // coalescing down to the data: small queries still run ~32
      // effective partitions, big shuffles get the fan-out they need.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Local small-SF stand-in for cluster file parallelism: the
      // fixture files are a few MB, far below the 128m default, so
      // every scan would be ONE partition and per-row compute would
      // single-thread. At real scale (multi-GB files) the default is
      // correct and this override is harmless.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** Events fixture staged for streaming file sources: the
    * Tables-normalized frame re-written as ONE standard parquet file,
    * so `readStream.schema(stagedEventsSchema)` sees a plain TIMESTAMP
    * column regardless of the fixture's on-disk encoding — the driver
    * has shipped `events.ts` both as TIMESTAMP(NANOS) (read as long +
    * truncated) and as micros across rounds, and a spec that hardcodes
    * one encoding silently corrupts every event time under the other.
    */
  lazy val stagedEventsFile: java.nio.file.Path = {
    val df = Tables(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("events_staged")
    dir.toFile.deleteOnExit()
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val it = java.nio.file.Files.list(dir)
    try it.filter(p => p.toString.endsWith(".parquet")).findFirst.get
    finally it.close()
  }
  lazy val stagedEventsSchema: org.apache.spark.sql.types.StructType =
    Tables(spark, sf, "events").schema
}

class SparkEntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("forCompute fans out small scans, never reshuffles already-parallel ones") {
    import org.apache.spark.sql.functions._
    // Fixture-scale documents arrive as ONE split — must fan out.
    assert(Tables.forCompute(spark, sf, "documents").rdd.getNumPartitions
      == spark.sparkContext.defaultParallelism)
    // A table whose scan already splits >= parallelism must pass
    // through untouched (at 100 TB the repartition would shuffle the
    // corpus to rebalance what file-splitting already balanced).
    val dir = java.nio.file.Files.createTempDirectory("graft_fc").toString
    spark.range(0, 40000).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map(i =>
          md5(concat(col("id").cast("string"), lit(i)))): _*).as("text"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val wide = Tables.forCompute(spark, dir, "documents")
    assert(wide.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
      s"test fixture too small: ${wide.rdd.getNumPartitions} splits")
    assert(!wide.queryExecution.executedPlan.toString.contains("Exchange"),
      "already-parallel scan must not be reshuffled")
  }

  test("every query runs at sf0.001 and is non-empty") {
    // rel_join_anti may legitimately be empty if every customer ordered;
    // everything else must produce rows.
    val mayBeEmpty = Set("rel_join_anti")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n == 0 && !mayBeEmpty(name)) Some(s"$name: empty") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
