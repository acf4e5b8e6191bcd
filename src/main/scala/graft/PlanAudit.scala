package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: scan every registered query's physical plan for
  * scale-hostile shapes. Prints one line per query:
  *   name | CARTESIAN? | BNLJ? | #exchanges | flags
  * Usage: tools/run.sh graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val cartesian = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        val exchanges = "Exchange".r.findAllIn(p).size
        val flags = Seq(
          if (cartesian) Some("CARTESIAN!") else None,
          if (bnlj) Some("bnlj") else None).flatten.mkString(",")
        println(f"$name%-32s exchanges=$exchanges%-3d $flags")
      } catch {
        case e: Throwable => println(f"$name%-32s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
