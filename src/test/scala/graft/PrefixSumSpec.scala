package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import relational.PrefixSum

/** The distributed two-pass prefix sum must equal the single-partition
  * global-window cumsum exactly, while never funneling the data
  * through one window group.
  */
class PrefixSumSpec extends AnyFunSuite {
  import SparkTestSession._

  private def corpus = spark.range(0, 50000).select(
    col("id"),
    // Deterministic pseudo-random order key (total order via id).
    md5(col("id").cast("string")).as("h"),
    (col("id") % 97 + 1).as("v"))

  test("matches the global-window exclusive cumsum exactly") {
    val expected = corpus
      .withColumn("pfx",
        sum(col("v")).over(Window.orderBy(col("h"), col("id"))) - col("v"))
      .select(col("id"), col("pfx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = PrefixSum.exclusivePrefixSum(
        corpus, Seq(col("h"), col("id")), col("v"), "pfx", numPartitions = 7)
      .select(col("id"), col("pfx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("window groups are partition-sized, not global") {
    val df = PrefixSum.exclusivePrefixSum(
      corpus, Seq(col("h"), col("id")), col("v"), "pfx", numPartitions = 7)
    val plan = df.queryExecution.executedPlan.toString
    // The window partitions on the stamped id — a global (unpartitioned)
    // window would print an empty partition spec and warn.
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    spark.catalog.clearCache()
  }

  test("skewed-language rebase == per-lang window cumsum (pack_sequences path)") {
    // 95% of the corpus is one language — the case the two-pass form
    // exists for (a per-lang window would funnel it through one task).
    // The global prefix over (lang, h, id) rebased by each language's
    // first global prefix must equal the per-lang cumsum exactly.
    val docs = spark.range(0, 20000).select(
      col("id"),
      when(col("id") % 20 === 0, "fr").otherwise("en").as("lang"),
      md5(col("id").cast("string")).as("h"),
      (col("id") % 53 + 1).as("v"))
    val expected = docs
      .withColumn("pfx", sum(col("v")).over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("id"))) - col("v"))
      .select(col("id"), col("pfx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val glob = PrefixSum.exclusivePrefixSum(
      docs, Seq(col("lang"), col("h"), col("id")), col("v"), "g",
      numPartitions = 11)
    val offsets = glob.groupBy(col("lang")).agg(min(col("g")).as("off"))
    val got = glob.join(broadcast(offsets), "lang")
      .select(col("id"), (col("g") - col("off")).as("pfx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("empty partitions and skewed values keep offsets correct") {
    // More partitions than distinct order-key values forces empty
    // ranges; the offset chain must skip them without drift.
    val tiny = spark.range(0, 5).select(col("id"), lit(10L).as("v"))
    val got = PrefixSum.exclusivePrefixSum(
        tiny, Seq(col("id")), col("v"), "pfx", numPartitions = 16)
      .orderBy(col("id")).select(col("pfx"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 10L, 20L, 30L, 40L))
    spark.catalog.clearCache()
  }
}
