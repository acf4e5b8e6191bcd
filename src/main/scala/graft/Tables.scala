package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loader (see /root/repo/TESTDATA.md, FIXTURES.md).
  *
  * Stands in for the reference's JDBC full-table scan
  * (`BulkProcessImpl.java:96` — `"SELECT * from " + tableName` over a
  * streaming cursor). On a real cluster this would be
  * `spark.read.format("jdbc").option("partitionColumn", ...)` for parallel
  * range scans; here the driver-generated parquet is the source of record.
  * Parquet scans are chunked by `spark.sql.files.maxPartitionBytes`, so a
  * 100 TB table splits into parallel tasks with column pruning + predicate
  * pushdown for free.
  */
object Tables {
  /** TPC-H-ish star schema (FIXTURES.md). */
  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** All fixture tables, including the stream + LLM-pipeline extensions. */
  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")

  /** Like [[apply]], but fanned out to full parallelism — for
    * compute-bound operators over byte-small inputs. Parquet splitting
    * is governed by `maxPartitionBytes`, so a few-MB documents file
    * arrives as ONE partition; shingling/hashing it would then run on
    * one core. One tiny shuffle up front buys full-cluster (here:
    * 32-thread) parallelism for the expensive narrow stages.
    *
    * GATED on the scan's actual split count: a table that already
    * splits into >= cluster parallelism needs no help, and blindly
    * repartitioning a 100 TB corpus would shuffle the whole corpus
    * just to rebalance what file-splitting already balanced. The
    * check reads the planned partition count (plan-time metadata from
    * the file index — no job runs).
    */
  def forCompute(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val parallelism = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= parallelism) df
    else df.repartition(parallelism)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet's ts encoding varies by driver round: some rounds
    // ship TIMESTAMP(NANOS) — which Spark's vectorized reader rejects,
    // so it is read as long (nanosAsLong) and truncated to micros here
    // — and some ship micros TIMESTAMP_NTZ, which is cast to TIMESTAMP
    // (identical values: every session here pins UTC) because
    // Structured Streaming refuses watermarks on NTZ event time.
    // Either way callers see one canonical TIMESTAMP column; DuckDB
    // oracles see the same micros via epoch math.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}
