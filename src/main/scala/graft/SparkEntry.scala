package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's operator registry. Each key is one operator
  * from the SURVEY.md §2 inventory; each has a DuckDB-runnable ANSI-SQL
  * twin in [[oracleSql]] unless the operator is not SQL-expressible
  * (LSH, catalog ops, stubs) — those get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 5-way star join + exact aggregation — exercises scan, broadcast join,
    * shuffle join, partial+final agg, sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("rel_join_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etl.EtlQueries.queries ++
      relational.RelationalQueries.queries ++
      relational.SqlQueries.queries ++
      relational.AdvancedQueries.queries ++
      relational.FunctionSweeps.queries ++
      relational.TypedQueries.queries ++
      relational.IntervalJoin.queries ++
      relational.ComplexTypeQueries.queries ++
      search.SearchQueries.queries ++
      search.SuggestQueries.queries ++
      search.GeoQueries.queries ++
      search.EsTailQueries.queries ++
      search.SpanRegexQueries.queries ++
      search.RelevanceTailQueries.queries ++
      llm.TextQueries.queries ++
      llm.DedupQueries.queries ++
      llm.CorpusQueries.queries ++
      llm.SimilarityQueries.queries ++
      llm.CorpusStatsQueries.queries ++
      llm.PipelineQueries.queries ++
      llm.BpeQueries.queries ++
      llm.WordPieceQueries.queries ++
      llm.UnigramQueries.queries ++
      streaming.StreamQueries.queries ++
      multimodal.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    etl.EtlQueries.oracleSql ++
      relational.RelationalQueries.oracleSql ++
      relational.SqlQueries.oracleSql ++
      relational.AdvancedQueries.oracleSql ++
      relational.FunctionSweeps.oracleSql ++
      relational.TypedQueries.oracleSql ++
      relational.IntervalJoin.oracleSql ++
      relational.ComplexTypeQueries.oracleSql ++
      search.SearchQueries.oracleSql ++
      search.SuggestQueries.oracleSql ++
      search.GeoQueries.oracleSql ++
      search.EsTailQueries.oracleSql ++
      search.SpanRegexQueries.oracleSql ++
      search.RelevanceTailQueries.oracleSql ++
      llm.TextQueries.oracleSql ++
      llm.DedupQueries.oracleSql ++
      llm.CorpusQueries.oracleSql ++
      llm.SimilarityQueries.oracleSql ++
      llm.CorpusStatsQueries.oracleSql ++
      llm.PipelineQueries.oracleSql ++
      llm.BpeQueries.oracleSql ++
      llm.WordPieceQueries.oracleSql ++
      llm.UnigramQueries.oracleSql ++
      streaming.StreamQueries.oracleSql ++
      multimodal.MultimodalQueries.oracleSql
}
