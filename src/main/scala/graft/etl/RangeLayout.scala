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

  /** Hive-style directory partitioning — the COARSE layout lever that
    * complements row-group skipping: a low-cardinality key (ingest
    * date, event type, language) becomes a directory level, so a
    * literal predicate on it prunes whole partitions at PLANNING time
    * (no file listing, no footer reads), and a join against a filtered
    * dimension prunes them at RUNTIME via dynamic partition pruning.
    * At 100 TB this is the difference between listing a day and
    * listing a decade. Keep cardinality low: one dir per value — a
    * high-cardinality key here melts the file system instead.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode(SaveMode.Overwrite).parquet(path)

  /** Morton (Z-order) value: bit-interleave of two non-negative
    * integer keys (a's bit i lands at 2i+1, b's at 2i). Statically
    * unrolled bitwise expression — whole-stage-codegen'd, no UDF.
    * Callers with unbounded or skewed domains should rank-normalize
    * first (ntile into 2^bits buckets); the layout only needs relative
    * order, not the raw values.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-ordered layout over TWO keys — the multi-dimensional version of
    * [[writeRangeSorted]]: range-partitioning on the Morton value
    * gives each file an (approximately square) region of the key
    * plane, so parquet min/max footer stats prune files for
    * predicates on EITHER key — a single-key sort prunes only its
    * own key and reads the full table for the other. This is the
    * write-time answer to "we filter this table by two different
    * columns" at 100 TB; beyond two keys the same interleave
    * generalizes (or a Hilbert curve for better locality).
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    a: Column, b: Column, bits: Int = 16): Unit = {
    // Out-of-domain keys would ALIAS in the interleave (key 5 and
    // key 2^bits+5 get the same z-value), silently degrading pruning
    // to full scans with no wrong results to notice — fail fast
    // instead. The input is pinned in the cache first so the guard
    // and the write see THE SAME data (a non-deterministic upstream
    // could otherwise pass validation and then write different keys)
    // and the lineage executes once, not twice.
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Integral keys only: cast("long") inside zValue TRUNCATES
      // doubles, so 5.7 and 5.2 would silently interleave identically
      // — callers must rank-normalize to integers first.
      Seq(a, b).foreach { c =>
        val dt = pinned.select(c).schema.head.dataType
        require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
          s"z-order keys must be integral, got ${dt.typeName} — " +
            "rank-normalize (e.g. ntile) before writeZOrdered")
      }
      val stats = pinned
        .select(least(min(a), min(b)).cast("long"), greatest(max(a), max(b)).cast("long"))
        .head
      // min/max of an EMPTY input are NULL; the unguarded unbox would
      // read them as 0 and "pass" the range check vacuously.
      require(!stats.isNullAt(0) && !stats.isNullAt(1),
        "writeZOrdered on empty input (min/max undefined) — nothing to lay out")
      val (lo, hi) = (stats.getLong(0), stats.getLong(1))
      require(lo >= 0L && hi < (1L << bits),
        s"z-order keys must lie in [0, 2^$bits): observed [$lo, $hi] — " +
          "rank-normalize (e.g. ntile) before writeZOrdered")
      pinned.withColumn("__z", zValue(a, b, bits))
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.mode(SaveMode.Overwrite).parquet(path)
    } finally pinned.unpersist()
  }

  /** Rows the parquet scan actually surfaced for a predicate —
    * row-group min/max skipping makes this ≪ table size on a
    * range-sorted layout and ≈ table size on an unsorted one
    * (observable proof the layout pays; asserted in RangeLayoutSpec).
    */
  def scanOutputRows(df: DataFrame): Long = scanMetric(df, "numOutputRows")

  /** Sum of a leaf-scan metric (e.g. "numFiles", "numOutputRows")
    * after executing `df` — the observable evidence that a layout
    * actually pruned.
    */
  def scanMetric(df: DataFrame, metric: String): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get(metric).map(_.value))
      .sum
  }
}
