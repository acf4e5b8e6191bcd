package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump formatted physical plans of the headline queries to
  * one markdown file (committed as PLANS.md) — the plan-shape record
  * backing COVERAGE.md's scale claims.
  * Usage: tools/run.sh graft.PlanDump [outFile] [sfDir]
  */
object PlanDump {
  val headline: Seq[String] = Seq(
    "rel_q1_pricing_summary", "rel_join_star_revenue", "rel_asof_join",
    "rel_interval_join_bucketed", "rel_sort_limit_topk",
    "search_topk_relevance", "search_page_after", "search_topk_tfidf",
    "search_topk_bm25", "search_topk_bm25_indexed", "search_phrase_indexed",
    "llm_ann_pq_topk", "llm_ann_indexed_topk",
    "search_more_like_this", "llm_pack_sequences", "llm_curate_pipeline",
    "search_all_indexes", "llm_cosine_topk", "llm_cosine_topk_batch",
    "llm_dedup_ngram_jaccard", "llm_dedup_simhash",
    "llm_dedup_minhash_banded", "llm_dedup_incremental",
    "llm_decontaminate", "llm_stratified_sample",
    "llm_vocab_topk", "llm_length_trim", "llm_chunk_docs",
    "stream_session_windows", "stream_funnel", "stream_gap_fill",
    "etl_upsert_last_write_wins",
    "rel_agg_pushdown", "sql_recursive_cte", "search_rescore",
    "search_facets_top_hits", "llm_bpe_pair_counts",
    "llm_ngram_lm_quality", "llm_curriculum_shards",
    "llm_dedup_winnow", "llm_ann_sq8_topk", "llm_keyword_extract",
    "llm_dedup_survivors", "search_min_should_match",
    "sql_q19_disjunctive", "sql_q21_waiting_supplier",
    "llm_dedup_substring", "llm_dedup_cdc", "llm_dedup_segments",
    "llm_quality_classifier", "search_collapse_field",
    "search_boosting", "search_matrix_stats", "llm_dsir_weights",
    "llm_gopher_rules", "stream_enrich_static",
    "llm_ngram_novelty", "etl_quality_rules",
    "llm_temperature_mixture", "mm_audio_energy",
    "search_msearch", "search_facets_percentiles",
    "llm_ann_binary_topk", "llm_mmr_rerank", "llm_wordpiece_train",
    "llm_graph_triangles", "rel_join_fuzzy_names", "rel_join_fuzzy_jw",
    "stream_event_pattern", "search_decay_scoring", "llm_hash_embed",
    "llm_cooccurrence", "llm_rouge_pairs", "llm_blocklist_filter",
    "search_phrase_prefix",
    "llm_hll_distinct", "llm_kmv_overlap", "rel_hdr_quantiles",
    "llm_vocab_growth", "search_bucket_pipeline", "search_has_child",
    "search_termvectors", "etl_snapshot_read",
    "llm_hll_native", "search_rank_eval", "search_holt_forecast",
    "search_synonyms", "llm_substring_census", "mm_audio_fingerprint",
    "stream_distinct_users_hll", "etl_snapshot_diff",
    "search_facets_extended_stats",
    "llm_knn_graph", "llm_label_propagation", "llm_triplet_mining",
    "llm_perplexity_buckets", "llm_k_anonymity",
    "search_facets_boxplot", "search_facets_t_test",
    "search_facets_top_metrics", "search_facets_rate",
    "search_pipeline_stats_bucket",
    "search_suggest_term", "search_suggest_phrase", "search_nested_query",
    "search_facets_nested_agg", "search_geo_distance", "search_geohash_grid",
    "search_geo_polygon", "search_runtime_field",
    "search_regexp", "search_span_containing", "search_span_within",
    "search_geo_shape", "search_scripted_metric", "search_common_terms",
    "llm_unigram_train",
    "search_match_bool_prefix", "search_combined_fields",
    "search_geotile_grid", "search_geo_distance_indexed",
    "sql_q2_min_cost_supplier", "sql_q20_excess_stock",
    "search_holt_winters",
    "search_mget", "search_moving_fn_scripted",
    "search_facets_cardinality", "rel_approx_agg")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "PLANS.md"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // Broadcast discipline (scale safety): static auto-broadcast OFF —
      // Catalyst's static size estimates for aggregate/cache-derived
      // frames read tiny and would broadcast corpus-scale build sides
      // (measured driver OOM at the 30x ScaleBench corpus); AQE promotes
      // joins to broadcast only from ACTUAL runtime sizes. Explicit
      // broadcast() on bounded frames is unaffected.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      // Partition discovery of cell-partitioned artifacts (up to 1024
      // geo/IVF cell dirs) runs DRIVER-SIDE below this threshold: a
      // 1024-task listing JOB costs ~1.7 s of pure task overhead per
      // query CONSTRUCTION (measured, geo probe r8) vs ~50 ms of
      // driver listStatus calls. Above ~8k dirs the distributed
      // listing wins again - exactly Spark's intended use of the knob.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
      // Shuffle-partition scaling: sizing for the FIXTURE (32) starves
      // a 100x corpus - each of 32 partitions then carries 100x the
      // rows and the sort/shuffle spills (measured: the substring
      // finder's real 1.2 slope at 30->100x collapses to ~linear at
      // 512 initial partitions, 154 -> 107 s at 100x). The
      // scale-correct discipline is a HIGH initial count with AQE
      // coalescing down to the data: small queries still run ~32
      // effective partitions, big shuffles get the fan-out they need.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // Cached-plan builds go through AQE too (r14): the library's
      // pinned frames (posting lists, candidate grams, LM type tables)
      // are AGGREGATE outputs persisted for multiple consumers; with
      // this off (the upstream default, kept for partitioning-stability
      // conservatism) the cache materializes at the raw
      // initialPartitionNum=512 and every consumer scan pays 512 tasks
      // regardless of data size — measured 7x on the PMI unigram table
      // at sf0.1. With it on, AQE coalesces the cache build exactly
      // like any other shuffle, at every scale.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` at sf0.001 (plan shapes are\n")
    sb.append("scale-invariant; AQE may further split/coalesce at runtime).\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      val plan = df.queryExecution.executedPlan.toString
      sb.append(plan.take(8000))
      if (plan.length > 8000) {
        // Keep the scan evidence (PushedFilters / PartitionFilters /
        // ReadSchema) visible even when the middle is truncated.
        sb.append("\n... (truncated; every scan in the plan follows)\n")
        plan.linesIterator.filter(_.contains("FileScan"))
          .foreach(l => sb.append(l.trim.take(700)).append('\n'))
      }
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
