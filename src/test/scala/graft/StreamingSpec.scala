package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Runs the streaming transforms through the REAL Structured Streaming
  * engine (file source → stateful ops → memory sink, one
  * Trigger.AvailableNow pass) and checks they agree with the batch
  * path that the DuckDB oracle validates.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The streaming file source wants a directory; stage the normalized
    * fixture file into one (testdata itself is read-only, and its ts
    * encoding varies by driver round — see SparkTestSession.stagedEventsFile).
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(stagedEventsFile, dir.resolve("part-0.parquet"))
    dir.toFile.deleteOnExit()
    dir.toString
  }

  /** Streaming events DF — already Tables-normalized at staging. */
  private def eventsStream: DataFrame =
    spark.readStream.schema(stagedEventsSchema).parquet(eventsDir)

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("tumbling window agg: streaming == batch") {
    val streamed = runToMemory(
      streaming.StreamQueries.tumblingCounts(eventsStream.withWatermark("ts", "1 hour")),
      "t_tumbling", "complete")
    val batch = streaming.StreamQueries.tumblingCounts(Tables(spark, sf, "events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows: streaming == batch") {
    val streamed = runToMemory(
      streaming.StreamQueries.sessionize(eventsStream.withWatermark("ts", "1 hour")),
      "t_sessions", "complete")
    val batch = streaming.StreamQueries.sessionize(Tables(spark, sf, "events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-static join enriches events against a dimension") {
    import spark.implicits._
    // Static dim: user bucket -> tier label (broadcastable at scale).
    val dim = (0L until 8L).map(b => (b, if (b < 4) "basic" else "pro"))
      .toDF("bucket", "tier")
    val enriched = eventsStream
      .withColumn("bucket", expr("user_id % 8"))
      .join(dim, "bucket")
      .groupBy(col("tier")).count()
    val streamed = runToMemory(enriched, "t_static_join", "complete")
    val batch = Tables(spark, sf, "events")
      .withColumn("bucket", expr("user_id % 8"))
      .join(dim, "bucket")
      .groupBy(col("tier")).count()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-static enrichment (shared transform): streaming == batch") {
    // The registered stream_enrich_static transform through the real
    // engine, with the REAL customer dim as the static side.
    val dim = Tables(spark, sf, "customer")
    val streamed = runToMemory(
      streaming.StreamQueries.enrichSegments(
        eventsStream.withWatermark("ts", "1 hour"), dim),
      "t_enrich", "complete")
    val batch = streaming.StreamQueries.enrichSegments(
      Tables(spark, sf, "events"), dim)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join == batch interval join") {
    // True stream-stream join through the real engine: clicks joined
    // with purchases of the same user within 30 min, both sides
    // watermarked (required for state cleanup in stream-stream joins).
    val clicks = eventsStream.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = eventsStream.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    val streamed = runToMemory(
      joined.select("user_id", "click_id", "purchase_id"),
      "t_ss_join", "append")
    val batch = SparkEntry.queries("rel_interval_join_bucketed")(spark, sf)
      .select("user_id", "click_id", "purchase_id")
    assert(streamed.count() == batch.count(),
      s"stream=${streamed.count()} batch=${batch.count()}")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER interval join emits watermark-expired null rows") {
    // The hard half of stream-stream joins: an unmatched left row may
    // only emit its null-padded result once the global watermark
    // (min of both sides' watermarks) passes its join-window deadline
    // — before that the engine must hold it in state because a match
    // could still arrive. AvailableNow's trailing no-data micro-batch
    // advances the watermark to (max seen − delay) and flushes the
    // expired state, so the expectation is exactly: every inner pair,
    // plus a null row for each unmatched click whose deadline
    // (click_ts + 30 min) the final watermark passed. Clicks younger
    // than that stay in state at termination and emit nothing.
    val joinCond = (c: DataFrame, p: DataFrame) => c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val clicks = eventsStream.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = eventsStream.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val streamed = runToMemory(
      joinCond(clicks, purchases).select("click_id", "purchase_id"),
      "t_ss_left", "append")

    val ev = Tables(spark, sf, "events")
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val maxC = bc.agg(max(col("click_ts"))).head.getTimestamp(0).getTime
    val maxP = bp.agg(max(col("purchase_ts"))).head.getTimestamp(0).getTime
    val finalWm = new java.sql.Timestamp(math.min(maxC, maxP) - 3600L * 1000)
    val batchOuter = joinCond(bc, bp)
    val expected = batchOuter
      .filter(col("purchase_id").isNotNull ||
        col("click_ts") + expr("INTERVAL 30 MINUTES") < lit(finalWm))
      .select("click_id", "purchase_id")
    assert(streamed.count() == expected.count(),
      s"stream=${streamed.count()} expected=${expected.count()}")
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup within watermark keeps one row per event_id") {
    val deduped = runToMemory(
      eventsStream.withWatermark("ts", "1 hour").dropDuplicates("event_id"),
      "t_dedup", "append")
    val batchIds = Tables(spark, sf, "events").select("event_id").distinct().count()
    assert(deduped.select("event_id").distinct().count() == batchIds)
    assert(deduped.count() == batchIds)
  }

  test("dropDuplicatesWithinWatermark: state-bounded dedup collapses in-delay duplicates") {
    // dropDuplicates keeps every seen key in state FOREVER — at
    // 100 TB/day of events that state never stops growing. The
    // within-watermark variant evicts a key once the watermark passes
    // its ts + delay, bounding state to one delay-window of keys —
    // the only shape that survives an unbounded stream. Semantics
    // guarantee: duplicates arriving within the delay collapse. The
    // fixture has no duplicate event_ids, so the duplicate stream is
    // synthesized: every event replayed 10 minutes later (inside the
    // 1-hour delay) must vanish.
    val s = eventsStream.select(col("event_id"), col("ts"))
    val doubled = s.union(
      s.withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES")))
    val deduped = runToMemory(
      doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id"),
      "t_dedup_wwm", "append")
    val batchIds = Tables(spark, sf, "events").select("event_id").distinct().count()
    assert(deduped.count() == batchIds,
      s"expected $batchIds unique events, got ${deduped.count()} — " +
        "in-delay replays must collapse")
  }
}
