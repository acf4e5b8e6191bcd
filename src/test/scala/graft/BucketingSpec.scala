package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketed-join contract at the plan level: two tables
  * bucketed by the join key with equal bucket counts join with NO
  * Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("same-bucketed fact join is exchange-free") {
    etl.Bucketing.writeBucketed(
      Tables(spark, sf, "lineitem"), "b_lineitem", "l_orderkey", 8)
    etl.Bucketing.writeBucketed(
      Tables(spark, sf, "orders"), "b_orders", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = etl.Bucketing.colocatedJoin(
        spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // And it computes the right thing.
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
