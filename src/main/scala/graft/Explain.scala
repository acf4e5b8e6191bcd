package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one registered query.
  * Usage: tools/run.sh graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
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
      // Cached-plan builds go through AQE too (r14): the library's
      // pinned frames (posting lists, candidate grams, LM type tables)
      // are AGGREGATE outputs persisted for multiple consumers; with
      // this off (the upstream default, kept for partitioning-stability
      // conservatism) the cache materializes at the raw
      // initialPartitionNum=512 and every consumer scan pays 512 tasks
      // regardless of data size — measured 7x on the PMI unigram table
      // at sf0.1. With it on, AQE coalesces the cache build exactly
      // like any other shuffle, at every scale.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Local small-SF stand-in for cluster file parallelism: the
      // fixture files are a few MB, far below the 128m default, so
      // every scan would be ONE partition and per-row compute would
      // single-thread. At real scale (multi-GB files) the default is
      // correct and this override is harmless.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // Materialize so AQE final plan is visible too.
    df.write.format("noop").mode("overwrite").save()
    println("=== after AQE ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
