package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (driver contract).
  *
  * Timing discipline: each query materializes fully through the noop
  * sink (count() would let Catalyst prune whole subtrees, e.g. a
  * projected column never computed); a warm-up query first so JVM/
  * codegen startup isn't billed to the first victim; queries run in
  * sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Local small-SF stand-in for cluster file parallelism: the
      // fixture files are a few MB, far below the 128m default, so
      // every scan would be ONE partition and per-row compute would
      // single-thread. At real scale (multi-GB files) the default is
      // correct and this override is harmless.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Shuffle-volume accounting: bytes written to shuffle per query is
    // the scale-limiting quantity (network at 1000 executors) — worth
    // reporting next to seconds.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    val shuffleByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    var lastShuffleSnap = 0L

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries persist intermediates (inverted indexes, signatures);
      // drop them so timings are independent and later queries don't
      // run under another query's memory pressure.
      spark.catalog.clearCache()
      Thread.sleep(150) // let async listener events drain
      val snap = shuffleBytes.get()
      shuffleByQuery(name) = snap - lastShuffleSnap
      lastShuffleSnap = snap
      dt
    }

    // Warm-up: JVM + codegen + parquet footer caches.
    runOnce("rel_filter_project")

    // The reference's headline metric is bulk-import WRITE throughput
    // (BASELINE.md: 33.6k docs/s at 171M rows) — measure the full
    // scan -> stringify -> keyed-dedup -> partitioned-write pipeline.
    val writeSecs = {
      val out = java.nio.file.Files.createTempDirectory("bench_import").toString
      val store = new etl.IndexStore(spark, out)
      val li = Tables(spark, sfDir, "lineitem")
      val t0 = System.nanoTime()
      val n = store.bulkImport(li, "lineitem", "l_orderkey", numShards = cpus.toInt)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] bulk_import: $n rows in $dt%.2fs (${n / dt}%.0f rows/s)")
      spark.catalog.clearCache()
      dt
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> runOnce(n)) :+
      ("_write_bulk_import" -> writeSecs)
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val sh = shuffleByQuery
      .map { case (k, v) => s""""$k":${"%.3f".formatLocal(java.util.Locale.US, v / 1e6)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$sh,"sf":"$sfDir"}""")
    spark.stop()
  }
}
