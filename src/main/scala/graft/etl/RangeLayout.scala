package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Range-partitioned, sorted data layout — the write-time move that
  * makes 100 TB scans cheap: `repartitionByRange(col)` gives each
  * output file a disjoint key range, `sortWithinPartitions` orders
  * rows inside, so parquet min/max footer stats let any range
  * predicate skip whole files (partition-level zone maps), and
  * downstream range queries read O(selectivity) bytes instead of
  * O(table).
  */
object RangeLayout {

  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       keys: Column*): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Rows the parquet scan actually surfaced for a predicate —
    * row-group min/max skipping makes this ≪ table size on a
    * range-sorted layout and ≈ table size on an unsorted one
    * (observable proof the layout pays; asserted in RangeLayoutSpec).
    */
  def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum
  }
}
