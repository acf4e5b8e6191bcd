package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) tables — the write-time answer to the
  * biggest 100 TB cost in this workload: the fact⋈fact shuffle.
  *
  * Writing `lineitem` and `orders` bucketed by their join key with the
  * same bucket count hash-places matching keys in matching files, so
  * every subsequent join on that key is exchange-free on BOTH sides
  * (the sort-merge join reads buckets pairwise). One write-time
  * shuffle amortized over every downstream join — at a 1000-executor
  * scale this converts the nightly fact join from a full network
  * shuffle of the big tables into a local merge.
  *
  * (Spark bucketing ≈ the reference's fixed ES shard count of 5,
  * `BulkProcessImpl.java:66` — placement decided at write time.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Co-located join of two same-bucketed tables: no Exchange on
    * either side (asserted in BucketingSpec).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
