package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's index-lifecycle surface (SURVEY.md §2.1 #6–#12),
  * re-expressed as a parquet-backed warehouse:
  *
  *  - create/delete/list indexes (`ElasticServiceImpl.java:35-114`):
  *    one directory per index under `root`, names lowercased
  *    (`BulkProcessImpl.java:64`), system names (leading '.')
  *    filtered from listings (`ElasticServiceImpl.java:97-101`).
  *  - bulk import (`BulkProcessImpl.java:82-157`): scan → stringify →
  *    keyed last-write-wins upsert on the id column (the ES `_id`
  *    overwrite, `:124`) → partitioned parquet write. The reference's
  *    200k-row batches / 10 concurrent bulks / 300 MB flushes
  *    (`:186-190`) map to task parallelism over `numShards` write
  *    partitions — no hand-rolled batching.
  *  - count (`ElasticService.java:14`, unimplemented there): owned
  *    natively as a metadata-only parquet count.
  *
  * Scale notes: the upsert shuffles once on the id (hash partition →
  * in-partition window); the write fans out over `numShards`
  * (reference default 5 shards, `BulkProcessImpl.java:66`). Re-import
  * is idempotent: same ids in → same surviving docs out.
  */
class IndexStore(spark: SparkSession, root: String) {

  private def fs = org.apache.hadoop.fs.FileSystem
    .get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def dir(index: String) = new Path(root, index.toLowerCase)

  /** Create an empty index (directory). Lowercases the name like the
    * reference; no-op if present (ES create-on-existing just errors —
    * idempotent create is the saner contract and what `df.write` needs).
    */
  def createIndex(name: String): Unit = fs.mkdirs(dir(name))

  /** Crash-safe copy-on-write swap: `write` materializes the new index
    * contents into a unique dot-prefixed tmp dir; the live dir is then
    * renamed aside to a unique backup, the tmp renamed in, and the
    * backup dropped. Every intermediate state keeps the data under
    * SOME name (tmp / backup / live) — a crash loses at most the
    * in-flight rewrite, never the index (a delete-then-rename swap has
    * a window where the only copy is gone, which is unrecoverable data
    * loss under a streaming checkpoint that already marked the batch
    * committed). Unique suffixes also keep concurrent operations on
    * one index from colliding on a shared tmp path.
    */
  private def swapIn(indexName: String)(write: Path => Unit): Unit = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val live = dir(indexName)
    val tmp = new Path(root, s".tmp_${indexName.toLowerCase}_$id")
    val bak = new Path(root, s".old_${indexName.toLowerCase}_$id")
    write(tmp)
    if (fs.exists(live)) fs.rename(live, bak)
    fs.rename(tmp, live)
    fs.delete(bak, true)
  }

  def deleteIndex(name: String): Unit = fs.delete(dir(name), true)

  /** All index names, system (dot-prefixed) entries filtered. */
  def listIndexes(): Seq[String] =
    if (!fs.exists(new Path(root))) Seq.empty
    else fs.listStatus(new Path(root))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .toSeq.sorted

  /** Bulk import: stringify all columns, last-write-wins on `idCol`
    * ordered by `orderCols` descending-last semantics, write
    * `numShards` parquet parts. Overwrite = the reference's re-import
    * behavior (same `_id` space).
    */
  def bulkImport(df: DataFrame, indexName: String, idCol: String,
                 numShards: Int = 5): Long = {
    val stringified = Stringify.all(df)
    val dataCols = stringified.columns.filterNot(_ == idCol)
    // Last-write-wins as a HASH AGGREGATE, not a window: the survivor
    // is the row with the max (c1,…,cn) tuple, and struct comparison
    // is field-order lexicographic — identical to the window form
    // ORDER BY c1 DESC,…,cn DESC ROW_NUMBER()=1 (ties are bit-identical
    // rows). The aggregate gets map-side partial combine, so each input
    // partition shuffles AT MOST one candidate per key — the window
    // form shuffles and sorts every duplicate. At a 100 TB re-import
    // (high dup ratio) that is the difference between shuffling the
    // delta and shuffling the corpus.
    val doc = struct(dataCols.map(col): _*)
    val deduped = stringified
      .groupBy(col(idCol))
      .agg(max_by(doc, doc).as("__doc"))
      .select(stringified.columns.map(c =>
        if (c == idCol) col(idCol) else col("__doc").getField(c).as(c)): _*)
    deduped.repartition(numShards)
      .write.mode(SaveMode.Overwrite).parquet(dir(indexName).toString)
    count(indexName)
  }

  /** Incremental upsert: merge a batch of new/updated docs into an
    * existing index — the ES continuous-indexing mode (each bulk
    * request upserts by `_id`). Implementation: union existing +
    * incoming (incoming tagged newer), re-run last-write-wins keyed
    * on `idCol` with the recency tag leading the order, rewrite.
    * This is a copy-on-write merge (read + shuffle + write of one
    * index); at 100 TB per-index you'd shard the rewrite by key range
    * so only touched ranges rewrite — the per-range logic is
    * identical to this.
    */
  def upsert(incoming: DataFrame, indexName: String, idCol: String,
             numShards: Int = 5): Long = {
    val existing = read(indexName).withColumn("__gen", lit(0))
    val next = Stringify.all(incoming).withColumn("__gen", lit(1))
    val unioned = existing.unionByName(next)
    val dataCols = existing.columns.filterNot(c => c == idCol || c == "__gen")
    // Same hash-agg last-write-wins as bulkImport, with the recency tag
    // leading the comparison tuple (incoming generation always beats
    // existing; ties within a generation break on the data columns).
    val doc = struct(dataCols.map(col): _*)
    val ord = struct(col("__gen") +: dataCols.map(col): _*)
    val outCols = existing.columns.filterNot(_ == "__gen")
    val merged = unioned
      .groupBy(col(idCol))
      .agg(max_by(doc, ord).as("__doc"))
      .select(outCols.map(c =>
        if (c == idCol) col(idCol) else col("__doc").getField(c).as(c)): _*)
    // Write via temp dir then swap: the source of the merge is the
    // index itself, so a direct overwrite would truncate its input.
    swapIn(indexName) { tmp =>
      merged.repartition(numShards).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    count(indexName)
  }

  /** Delete-by-query (ES `_delete_by_query`): rewrite the index
    * without matching docs. Copy-on-write like [[upsert]]; returns
    * docs deleted.
    */
  def deleteWhere(indexName: String, predicate: org.apache.spark.sql.Column): Long = {
    val before = count(indexName)
    // ES _delete_by_query deletes only docs that MATCH the query: rows
    // where the predicate is NULL (unknown) are KEPT, so the keep-filter
    // is "not definitely matching", not "definitely not matching".
    val kept = read(indexName).filter(!coalesce(predicate, lit(false)))
    swapIn(indexName) { tmp =>
      kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    before - count(indexName)
  }

  /** Compaction (ES force-merge): rewrite the index into `numShards`
    * files. Small-file accumulation is THE silent killer of 100 TB
    * scan throughput (per-file open cost + tiny row groups defeat
    * min/max skipping); periodic compaction restores it.
    */
  def compact(indexName: String, numShards: Int): Long = {
    swapIn(indexName) { tmp =>
      read(indexName).repartition(numShards)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    fs.listStatus(dir(indexName)).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** The UI's "all index" search option (reference
    * `indexView.html:15-17`): one keyword fanned out across every
    * index, hits tagged with their index name. Schemas differ per
    * index, so each hit is emitted as its JSON document (the ES
    * `_source` shape). Plan-level union of independent pruned scans —
    * no shuffle; cost = sum of the per-index scans, like ES's
    * multi-index URI search.
    */
  def searchAll(keyword: String): DataFrame = {
    import spark.implicits._
    listIndexes().map { idx =>
      val df = read(idx)
      df.filter(graft.search.SearchQueries.anyFieldContains(df, keyword))
        .select(lit(idx).as("index_name"),
          to_json(struct(df.columns.map(col): _*)).as("doc"))
    }.reduceOption(_.unionByName(_))
      .getOrElse(Seq.empty[(String, String)].toDF("index_name", "doc"))
  }

  /** Doc count — parquet footer metadata only, no data scan. */
  def count(indexName: String): Long =
    spark.read.parquet(dir(indexName).toString).count()

  def read(indexName: String): DataFrame =
    spark.read.parquet(dir(indexName).toString)
}
