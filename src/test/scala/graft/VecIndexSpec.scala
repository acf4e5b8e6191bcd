package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import llm.SimilarityQueries

/** The materialized IVFADC vector index (llm_ann_indexed_topk): the
  * write-time-encode architecture the inline ANN queries argue for.
  * Contract under test: (1) probing the index gives the SAME answer as
  * the inline IVFADC query (identical deterministic model + probe), (2)
  * the probe is physical partition pruning, (3) the index is built once
  * and reused until the corpus changes, (4) the model sidecar
  * round-trips exactly.
  */
class VecIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  test("indexed ANN answers identically to the inline IVFADC query") {
    val inline = SparkEntry.queries("llm_ann_ivfpq_topk")(spark, sf).collect()
    val indexed = SparkEntry.queries("llm_ann_indexed_topk")(spark, sf).collect()
    assert(inline.map(_.toString).toSeq == indexed.map(_.toString).toSeq,
      s"inline=${inline.mkString("; ")}\nindexed=${indexed.mkString("; ")}")
  }

  test("probe filter reaches the scan as PartitionFilters (physical pruning)") {
    val df = SparkEntry.queries("llm_ann_indexed_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters: ["))
      .find(_.contains("cell"))
    assert(pf.isDefined, s"no PartitionFilters on cell in:\n$plan")
    assert(pf.get.contains(" IN ") || pf.get.contains("cell#"),
      s"cell probe not in PartitionFilters: ${pf.get}")
  }

  test("index is hive-partitioned by cell with the model sidecar, and reused") {
    // First access (possibly) builds; second must NOT rewrite — parquet
    // part files carry unique names, so any rewrite changes the listing.
    SimilarityQueries.materializedVecIndex(spark, sf)
    val root = new java.io.File(
      graft.etl.IndexStore.artifactRoot(sf), SimilarityQueries.VecIndexName)
    def listing = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath)
      walk(root).sorted
    }
    val before = listing
    assert(before.exists(_.contains("cell=")), s"not hive-partitioned: $before")
    assert(before.exists(_.endsWith(SimilarityQueries.ModelSidecar)),
      "model sidecar missing")
    SimilarityQueries.materializedVecIndex(spark, sf)
    assert(listing == before, "unchanged corpus must not trigger a rebuild")
    // The sidecar is invisible to the parquet scan (no phantom rows/cols).
    val (idx, _) = SimilarityQueries.materializedVecIndex(spark, sf)
    assert(idx.columns.toSet == Set("vec_id", "label", "codes", "cell"))
  }

  test("corpus change invalidates the fingerprint and rebuilds") {
    // A synthetic corpus dir we own end-to-end (the fixture dir is
    // read-only): build, overwrite the corpus, assert rebuild.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx").toString
    def writeCorpus(n: Long): Unit =
      spark.range(0, n)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => ((col("id") + d) % 17).cast("float")).as("embedding"),
          (col("id") % 3).cast("string").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    writeCorpus(300)
    val (idx1, _) = SimilarityQueries.materializedVecIndex(spark, dir)
    assert(idx1.count() == 300)
    writeCorpus(400)
    val (idx2, _) = SimilarityQueries.materializedVecIndex(spark, dir)
    assert(idx2.count() == 400, "stale index served after corpus changed")
  }

  test("model sidecar serialization round-trips bit-exactly") {
    val e = SimilarityQueries.embDouble(Tables(spark, sf, "embeddings"))
    val m = SimilarityQueries.IvfPqModel.train(e, nList = 4, m = 8, subDim = 8, nCent = 16)
    val back = SimilarityQueries.IvfPqModel.parse(m.serialize)
    assert(back.nList == m.nList && back.m == m.m &&
      back.subDim == m.subDim && back.nCent == m.nCent)
    assert(back.coarse.flatten.toSeq == m.coarse.flatten.toSeq)
    assert(back.codebooks.flatten.flatten.toSeq == m.codebooks.flatten.flatten.toSeq)
  }
}
