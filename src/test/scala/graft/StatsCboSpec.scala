package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistics / cost-based-optimization surface: ANALYZE TABLE
  * populates catalog stats, and those stats drive planning (broadcast
  * selection below the threshold) — the knob a 100 TB deployment
  * relies on so the optimizer knows a "dimension" from a "fact"
  * without hints.
  */
class StatsCboSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ANALYZE TABLE populates row-count and size stats") {
    Tables(spark, sf, "nation").write.mode("overwrite").saveAsTable("t_nation")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      // rowCount propagates into plan stats only under CBO.
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("ANALYZE TABLE t_nation COMPUTE STATISTICS FOR ALL COLUMNS")
      val stats = spark.table("t_nation").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"rowCount=${stats.rowCount}")
      assert(stats.sizeInBytes > 0)
      // Column-level stats present (distinct counts for the join key).
      val cols = spark.sql("DESCRIBE EXTENDED t_nation n_nationkey").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(cols.get("distinct_count").exists(_.toLong == 25L), cols.toString)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS t_nation")
    }
  }

  test("size stats drive broadcast selection") {
    Tables(spark, sf, "customer").write.mode("overwrite").saveAsTable("t_cust")
    Tables(spark, sf, "orders").write.mode("overwrite").saveAsTable("t_ord")
    // The engine default disables STATIC auto-broadcast (estimates
    // for derived frames mislead; AQE promotes from runtime sizes) —
    // re-enable it here because this test is specifically about the
    // ANALYZE-stats-driven static mechanism working when a deployment
    // opts in for well-analyzed catalog tables.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.sql("ANALYZE TABLE t_cust COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE t_ord COMPUTE STATISTICS")
      val joined = spark.table("t_ord").join(spark.table("t_cust"),
        col("o_custkey") === col("c_custkey"))
      // customer (150 rows) is far below the 10MB threshold: the
      // optimizer must pick a broadcast join on stats alone.
      assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_cust")
      spark.sql("DROP TABLE IF EXISTS t_ord")
    }
  }

  test("runtime bloom filter semi-join-reduces a shuffle join's fact side") {
    // When the dim side can't broadcast (here: forced), Spark can still
    // build a bloom filter over the dim's join keys and apply it to the
    // fact SCAN — at 100 TB this semi-join reduction is what keeps a
    // selective dim join from shuffling the whole fact table. Verify
    // the optimizer injects it (might_contain over a bloom_filter_agg
    // subquery) and that results are unchanged.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevApp = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Fixture scans are far below the 10GB default application-side
      // threshold; at real scale the default gates injection correctly.
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables(spark, sf, "lineitem")
      val dim = Tables(spark, sf, "part").filter(col("p_size") === 1)
      val joined = li.join(dim, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"), col("p_size"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${opt.take(2000)}")
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      try assert(n == joined.count(), "bloom filter changed the result")
      finally spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prevApp)
    }
  }
}
