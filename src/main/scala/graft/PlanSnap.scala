package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: batch-dump `explain("formatted")` for a list of registered
  * queries into per-query files — the before/after plan evidence an
  * optimization round commits under plans/rNN/.
  *
  * Usage: tools/run.sh graft.PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]
  * writes <outDir>/<query>_<suffix>.txt per query. The session mirrors
  * Bench's config (same AQE/broadcast/discipline) so the planned shape
  * matches what the bench actually runs; the dump is the INITIAL plan
  * (explain formatted) plus the post-AQE executed plan after a noop run,
  * because AQE join promotions are the thing several optimizations here
  * change.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
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
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val post = df.queryExecution.executedPlan.toString
      val txt = s"== $name ($suffix, $sfDir, noop ${f"$secs%.2f"} s) ==\n\n" +
        formatted + "\n\n== post-AQE executed plan ==\n\n" + post
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      Pins.release(spark)
      println(f"[plansnap] $name%-40s ${secs}%6.2f s -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
