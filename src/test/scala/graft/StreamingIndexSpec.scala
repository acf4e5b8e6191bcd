package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone: the reference's bulk-import pipeline run CONTINUOUSLY —
  * a stream of incoming rows bulk-upserted into an IndexStore index
  * via foreachBatch, each micro-batch an idempotent keyed merge. This
  * is the Structured-Streaming form of `BulkProcessImpl.writeMysqlDataToES`
  * (SURVEY.md §3.1): micro-batches instead of 200k-row buffers,
  * checkpoint instead of cursor position, `_id` upsert via
  * last-write-wins merge.
  */
class StreamingIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming ingest with content-fingerprint dedup screening") {
    // The LLM-corpus form of continuous ingest: each micro-batch is
    // (1) deduped within itself on a content fingerprint, then
    // (2) screened against the ACCUMULATED index with a left-anti join
    // on the fingerprint, so only never-seen content is admitted —
    // id-renumbered replays of old content must NOT grow the corpus.
    val docs = Tables(spark, sf, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("stream_docs_src")
    val store = new etl.IndexStore(spark,
      java.nio.file.Files.createTempDirectory("stream_docs_wh").toString)

    def stageDf(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage_tmp")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, srcDir.resolve(name))
    }

    def runPass(): Unit = {
      val q = spark.readStream.schema(docs.schema).parquet(srcDir.toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val withFp = batch
            .withColumn("content_fp", md5(lower(trim(col("text")))))
            .dropDuplicates("content_fp")
          val admitted =
            if (store.listIndexes().contains("docs"))
              withFp.join(store.read("docs").select("content_fp"),
                Seq("content_fp"), "left_anti")
            else withFp
          if (!admitted.isEmpty) {
            if (store.listIndexes().contains("docs"))
              store.upsert(admitted, "docs", "content_fp")
            else store.bulkImport(admitted, "docs", "content_fp")
          }
          ()
        }
        .option("checkpointLocation", srcDir.resolve(".ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }

    val corpusFps = docs
      .select(md5(lower(trim(col("text")))).as("fp")).distinct().count()

    stageDf(docs, "b1.parquet")
    runPass()
    assert(store.count("docs") == corpusFps)

    // Replay with renumbered ids: same CONTENT, different keys — the
    // fingerprint screen must reject every row.
    stageDf(docs.withColumn("doc_id", col("doc_id") + 10000), "b2.parquet")
    runPass()
    assert(store.count("docs") == corpusFps,
      "re-keyed replay of known content must not grow the index")

    // Genuinely new content is admitted. Expected growth is computed
    // from the suffixed texts' own fingerprints (not assumed == the
    // original count): suffixing raw text can merge or split
    // whitespace-variant fingerprints.
    val suffixed = docs.withColumn("doc_id", col("doc_id") + 20000)
      .withColumn("text", concat(col("text"), lit(" fresh suffix")))
    val newFps = suffixed
      .select(md5(lower(trim(col("text")))).as("fp")).distinct()
      .join(docs.select(md5(lower(trim(col("text")))).as("fp")).distinct(),
        Seq("fp"), "left_anti").count()
    assert(newFps > 0, "fixture must yield novel fingerprints")
    stageDf(suffixed, "b3.parquet")
    runPass()
    assert(store.count("docs") == corpusFps + newFps,
      "novel content must be admitted")
  }

  test("streaming foreachBatch bulk-upsert into IndexStore") {
    val srcDir = java.nio.file.Files.createTempDirectory("stream_idx_src")
    val store = new etl.IndexStore(spark,
      java.nio.file.Files.createTempDirectory("stream_idx_wh").toString)

    // Tables-normalized staging copy (fixture ts encoding varies by
    // driver round — SparkTestSession.stagedEventsFile).
    def stage(name: String): Unit =
      java.nio.file.Files.copy(stagedEventsFile, srcDir.resolve(name))

    def runPass(): Unit = {
      val ckpt = srcDir.resolve(".ckpt").toString
      val q = spark.readStream.schema(stagedEventsSchema).parquet(srcDir.toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (store.listIndexes().contains("events"))
            store.upsert(batch, "events", "event_id")
          else store.bulkImport(batch, "events", "event_id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }

    val distinctIds = Tables(spark, sf, "events")
      .select("event_id").distinct().count()

    stage("b1.parquet")
    runPass()
    assert(store.count("events") == distinctIds)

    // Second file = full duplicate of the stream (late replay):
    // upsert semantics must keep the count stable.
    stage("b2.parquet")
    runPass()
    assert(store.count("events") == distinctIds,
      "replayed duplicates must upsert, not append")
    assert(store.read("events").select("event_id").distinct().count() == distinctIds)
  }

  test("partitioned streaming ingest: checkpoint-loss replay is idempotent") {
    // The Bench `_stream_latency` pipeline as a correctness spec: a
    // date-partitioned index fed by foreachBatch upsertPartitioned
    // through the REAL streaming runtime. Then the recovery story: the
    // checkpoint is DELETED and the whole stream re-fires — every
    // micro-batch replays against an index that already contains it,
    // and the partition-granular keyed merge must land byte-identical
    // content (the at-least-once sink contract a crashed checkpoint
    // forces).
    val srcDir = java.nio.file.Files.createTempDirectory("stream_part_src")
    val store = new etl.IndexStore(spark,
      java.nio.file.Files.createTempDirectory("stream_part_wh").toString)
    val ev = Tables(spark, sf, "events")
      .withColumn("event_date", to_date(col("ts")).cast("string"))
    ev.repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(srcDir.resolve("in").toString)
    val schema = spark.read.parquet(srcDir.resolve("in").toString).schema

    def runPass(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.resolve("in").toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (store.listIndexes().contains("events_part"))
            store.upsertPartitioned(batch, "events_part", "event_id", "event_date")
          else store.bulkImportPartitioned(batch, "events_part", "event_id", "event_date")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }

    runPass(srcDir.resolve(".ckpt1").toString)
    val distinctIds = ev.select("event_id").distinct().count()
    assert(store.count("events_part") == distinctIds)
    val snapshot = store.read("events_part")
      .orderBy(col("event_id")).collect().map(_.toString).toSeq

    // Checkpoint lost -> full replay from offset zero.
    runPass(srcDir.resolve(".ckpt2").toString)
    assert(store.count("events_part") == distinctIds,
      "checkpoint-loss replay must not grow the index")
    val replayed = store.read("events_part")
      .orderBy(col("event_id")).collect().map(_.toString).toSeq
    assert(replayed == snapshot,
      "replayed content diverged from the first pass")
  }
}
