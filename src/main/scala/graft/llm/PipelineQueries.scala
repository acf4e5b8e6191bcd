package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Remaining training-data-pipeline stages (SURVEY.md §2.4 family):
  * PII scrubbing, deterministic corpus splitting, hash-bucket
  * sampling. All per-row regex/hash work — shuffle-free scan-speed
  * stages, the shape that matters when the corpus is 100 TB.
  */
object PipelineQueries {

  /** Email/URL/phone redaction — the standard pre-training scrub.
    * Simple char-class regexes chosen to behave identically in
    * java.util.regex and RE2 (DuckDB).
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^ ]+"
  private val phoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** Deterministic split: bucket = first hex digit of md5(normalized
    * text) — content-stable (same doc lands in the same split on any
    * engine, any partitioning, any run), which is what makes
    * train/eval splits reproducible across a 100 TB reshuffle.
    * 'train' = digits 0..c (13/16), 'eval' = d..f (3/16).
    */
  def splitBucket(c: Column): Column =
    when(substring(md5(lower(trim(c))), 1, 1).isin("d", "e", "f"), lit("eval"))
      .otherwise(lit("train"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PII scrub audit: redact, count redactions per doc (via length
    // deltas of each pass), emit scrubbed text hash for stability.
    "llm_pii_scrub" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(scrub(col("text"))).as("scrubbed_md5"),
          (length(col("text")) - length(regexp_replace(col("text"), emailRe, "")))
            .as("email_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), urlRe, "")))
            .as("url_chars"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic train/eval split with per-split stats.
    "llm_train_eval_split" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("split", splitBucket(col("text")))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))
    }),

    // Hash-bucket sampling: content-hash mod-16 bucket 0 => a
    // deterministic ~1/16 sample, reproducible on any engine (vs
    // rand()-based sampling, which never hash-compares).
    "llm_hash_sample" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .filter(substring(md5(lower(trim(col("text")))), 1, 1) === "0")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "llm_pii_scrub" ->
      s"""SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |      'https?://[^ ]+', '<URL>', 'g'),
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5,
         |  CAST(length(text) - length(regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '', 'g')) AS INT) AS email_chars,
         |  CAST(length(text) - length(regexp_replace(text,
         |      'https?://[^ ]+', '', 'g')) AS INT) AS url_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_train_eval_split" ->
      """SELECT CASE WHEN substr(md5(lower(trim(text))), 1, 1) IN ('d','e','f')
        |            THEN 'eval' ELSE 'train' END AS split,
        |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "llm_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(lower(trim(text))), 1, 1) = '0'
        |ORDER BY doc_id""".stripMargin
  )
}
