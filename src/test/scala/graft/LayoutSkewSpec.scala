package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout and skew-handling utilities: observable effects, not
  * just result equality.
  */
class LayoutSkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("range-sorted layout skips row groups an unsorted layout reads") {
    val li = Tables(spark, sf, "lineitem")
    val sorted = java.nio.file.Files.createTempDirectory("layout_sorted").toString
    val unsorted = java.nio.file.Files.createTempDirectory("layout_rand").toString
    etl.RangeLayout.writeRangeSorted(li, sorted, 8, col("l_orderkey"))
    li.repartition(8).write.mode("overwrite").parquet(unsorted)

    val pred = col("l_orderkey") < 100
    val sortedRows = etl.RangeLayout.scanOutputRows(
      spark.read.parquet(sorted).filter(pred))
    val unsortedRows = etl.RangeLayout.scanOutputRows(
      spark.read.parquet(unsorted).filter(pred))
    val total = li.count()
    assert(sortedRows < total / 4,
      s"range layout should skip most row groups: scanned $sortedRows of $total")
    assert(sortedRows <= unsortedRows)
    // Same answer either way.
    assert(spark.read.parquet(sorted).filter(pred).count() ==
      spark.read.parquet(unsorted).filter(pred).count())
  }

  test("z-order layout prunes on BOTH keys; single-key sort on one") {
    import spark.implicits._
    // Full 256×256 grid — every (x, y) cell exactly once, so pruning
    // ratios are exact geometry, not data luck.
    val grid = spark.range(65536L)
      .select((col("id") / 256).cast("int").as("x"),
        pmod(col("id"), lit(256)).cast("int").as("y"))
    val zPath = java.nio.file.Files.createTempDirectory("layout_z").toString
    val xPath = java.nio.file.Files.createTempDirectory("layout_x").toString
    etl.RangeLayout.writeZOrdered(grid, zPath, 16, col("x"), col("y"), bits = 8)
    etl.RangeLayout.writeRangeSorted(grid, xPath, 16, col("x"))

    val total = 65536L
    def scanned(path: String, pred: org.apache.spark.sql.Column): Long =
      etl.RangeLayout.scanOutputRows(spark.read.parquet(path).filter(pred))

    // 16 z-range files over the grid = 4×4 aligned blocks: a predicate
    // selecting a quarter of either axis intersects only one row/column
    // of blocks — both axes prune to ~1/4 of the table.
    val zx = scanned(zPath, $"x" < 64)
    val zy = scanned(zPath, $"y" < 64)
    // Bound is half-the-table PLUS one row group of slack (~1k rows):
    // parquet row-group boundaries depend on writer batch memory, so a
    // group can straddle a block edge and drag a few hundred extra rows
    // into the scan — observed 32821/65536 on a loaded host, which is
    // pruning working (the x-sorted layout reads ~100%) with boundary
    // noise, not a layout regression.
    val slack = 1100L
    assert(zx <= total / 2 + slack, s"z-layout x-predicate scanned $zx of $total")
    assert(zy <= total / 2 + slack, s"z-layout y-predicate scanned $zy of $total")
    // The single-key sort prunes its own key…
    val xx = scanned(xPath, $"x" < 64)
    assert(xx <= total / 2, s"x-layout x-predicate scanned $xx of $total")
    // …but reads essentially everything for the other key.
    val xy = scanned(xPath, $"y" < 64)
    assert(xy >= (total * 3) / 4, s"x-layout y-predicate scanned only $xy")
    assert(zy < xy / 2, s"z-order should beat single-key on y: $zy vs $xy")
    // Layout never changes answers.
    assert(spark.read.parquet(zPath).filter($"y" < 64).count() ==
      grid.filter($"y" < 64).count())
  }

  test("z-order rejects empty input and non-integral keys loudly") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("layout_zguard").toString
    // Empty input: min/max are NULL — must fail, not unbox to 0 and
    // "pass" vacuously.
    val empty = spark.range(0).select(col("id").cast("int").as("x"),
      col("id").cast("int").as("y"))
    val e1 = intercept[IllegalArgumentException](
      etl.RangeLayout.writeZOrdered(empty, out, 4, col("x"), col("y"), bits = 8))
    assert(e1.getMessage.contains("empty input"))
    // Double keys: zValue's cast("long") would silently truncate —
    // must be rejected, not aliased.
    val doubles = Seq((1.5, 2.0), (1.2, 3.0)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException](
      etl.RangeLayout.writeZOrdered(doubles, out, 4, col("x"), col("y"), bits = 8))
    assert(e2.getMessage.contains("integral"))
  }

  test("hive-partitioned layout prunes whole directories at plan time") {
    val events = Tables(spark, sf, "events")
    val path = java.nio.file.Files.createTempDirectory("layout_part").toString
    etl.RangeLayout.writePartitioned(events, path, "event_type")
    val part = spark.read.parquet(path)

    val pruned = part.filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected a partition filter on event_type:\n$plan")
    // The observable effect: the pruned scan opens strictly fewer files
    // than the full scan — whole directories never get listed.
    val allFiles = etl.RangeLayout.scanMetric(part, "numFiles")
    val prunedFiles = etl.RangeLayout.scanMetric(pruned, "numFiles")
    assert(prunedFiles < allFiles,
      s"pruning read $prunedFiles of $allFiles files")
    // Same answer as the unpartitioned table.
    assert(pruned.count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("dynamic partition pruning fires on a filtered-dim join") {
    import spark.implicits._
    val events = Tables(spark, sf, "events")
    val path = java.nio.file.Files.createTempDirectory("layout_dpp").toString
    etl.RangeLayout.writePartitioned(events, path, "event_type")
    val part = spark.read.parquet(path)
    // Tiny parquet-backed dimension with a SELECTIVE predicate choosing
    // one event_type — the partition key is only known at RUNTIME via
    // the join, not as a literal predicate on the fact. (Parquet-backed
    // because DPP's planner rule needs a Filter node on the build side;
    // over a local Seq the optimizer constant-folds the filter away.)
    val dimPath = java.nio.file.Files.createTempDirectory("layout_dim").toString
    Seq(("click", "important"), ("view", "noise"))
      .toDF("t", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("label") === "important")
    val joined = part.join(dim, part("event_type") === dim("t"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n${plan.take(3000)}")
    assert(joined.count() ==
      events.filter(col("event_type") === "click").count())
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The AQE-native alternative to manual salting (SkewJoin): one hot
    // key dominating a sort-merge join partition gets split into
    // parallel sub-partitions at RUNTIME, no query rewrite. Thresholds
    // are lowered to fixture scale — at real scale the defaults
    // (256MB partitions) gate the same mechanism.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // Also pin the ADAPTIVE threshold off: the engine session keeps
      // it at 10MB (runtime promotion), which would promote this tiny
      // dim join to broadcast before the skew split could trigger.
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 50k rows on ONE key vs a uniform dim — the pathological shape.
      val hot = spark.range(50000L).select(lit(1L).as("k"), col("id").as("payload"))
        .union(spark.range(1000L).select((col("id") % 50 + 2).as("k"), col("id")))
      val dim = spark.range(60L).select(col("id").as("k2"), (col("id") * 10).as("v"))
      val joined = hot.join(dim, col("k") === col("k2"))
      // collect() drives THIS Dataset's QueryExecution (count() would
      // plan separately and leave `joined`'s adaptive plan unexecuted,
      // so the skew markers would never appear on it).
      assert(joined.collect().length == 51000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a runtime skew-split join in:\n${plan.take(2500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join result == plain join result") {
    val li = Tables(spark, sf, "lineitem")
    val orders = Tables(spark, sf, "orders")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    val salted = relational.SkewJoin.salted(li, orders, "l_orderkey", "o_orderkey", 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key across partitions") {
    import spark.implicits._
    // One key, 10k rows — the pathological hot key.
    val hot = Seq.fill(10000)(1L).toDF("k")
    val dim = Seq((1L, "v")).toDF("k2", "v")
    val joined = relational.SkewJoin.salted(hot, dim, "k", "k2", 8)
    assert(joined.count() == 10000)
    // Distinct salt values used (recompute the salt the same way).
    val salts = hot.select(
      pmod(xxhash64(col("k")), lit(8)).cast("int").as("s"))
      .distinct().count()
    // Single-column hot rows are identical => one salt; the utility
    // salts on ALL columns, so realistic rows (below) spread.
    val realistic = Tables(spark, sf, "lineitem").filter(col("l_orderkey") === 1)
    val spread = realistic.select(
      pmod(xxhash64(realistic.columns.map(col): _*), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(spread >= 1 && salts == 1)
  }
}
