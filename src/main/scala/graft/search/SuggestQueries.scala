package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Elasticsearch term + phrase suggesters ("did you mean") — the
  * spell-correction path every search box in the reference's UI hits on
  * misspelled input (the reference delegates the whole `_search` surface
  * to ES 6.6.2; `R/src/main/resources/templates/indexView.html:13-20` is
  * the query box these serve).
  *
  * ES's term suggester generates correction candidates from the INDEX
  * VOCABULARY within edit distance <= 2, pruned by `prefix_length` (the
  * first character must match — typos rarely hit the first letter) and a
  * max length difference equal to the edit budget, then ranks candidates
  * by (distance asc, document frequency desc). The phrase suggester
  * composes per-term candidates into whole corrected phrases and
  * re-scores the phrase.
  *
  * Spark-first shape: the vocabulary is the postings index grouped by
  * term — VOCABULARY-shaped, not corpus-shaped — and candidate
  * generation is a broadcast hash join of the tiny probe set against the
  * vocabulary ON THE EQUI-KEY first character (the prefix_length prune
  * becomes the join key, so a 100M-term vocabulary at 100 TB is hashed
  * once and probed per first-letter bucket, never nested-looped), with
  * the length band and the bounded edit distance as residual filters.
  * The edit-distance kernel is Spark's threshold form
  * `levenshtein(a, b, 2)` — O(min(len)·2) banded DP with early exit, not
  * the full O(len²) matrix (`plans/LevenshteinThresholdRule` guards the
  * comparison form elsewhere). Ranking is (distance, df desc, term) —
  * fully deterministic, so both suggesters hash-match a DuckDB twin.
  */
object SuggestQueries {

  /** Misspelled probe terms — each is edit distance 1–2 from a fixture
    * vocabulary term with the first character intact.
    */
  private val TermProbes = Seq("sparc", "jion", "windoww", "streem")

  /** The misspelled phrase for the phrase suggester. */
  private val PhraseWords = Seq("sparc", "jion")

  /** (term, df) vocabulary view of the materialized postings index. */
  private def vocabOf(s: SparkSession, dir: String): DataFrame = {
    val (postings, _, _) = SearchQueries.materializedPostings(s, dir)
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
  }

  /** Per-word candidate set: edit <= 2, first char pinned, length band,
    * top `k` by (distance, df desc, term). The window is global over ONE
    * first-letter band of the VOCABULARY (bounded by type count, not
    * corpus size — the same cost class as the BPE argmax), and the
    * 0-distance row is kept so the phrase form can keep a correctly
    * spelled word.
    */
  private def candidates(vocab: DataFrame, word: String, k: Int): DataFrame =
    vocab
      .filter(substring(col("term"), 1, 1) === word.substring(0, 1) &&
        abs(length(col("term")) - lit(word.length)) <= 2)
      .withColumn("dist", levenshtein(lit(word), col("term"), 2))
      .filter(col("dist") >= 0) // threshold form returns -1 past the budget
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("dist"), col("df").desc, col("term"))))
      .filter(col("rnk") <= k)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ES `term` suggester, suggest_mode=missing flavor: only CORRECTIONS
    // rank (dist >= 1; a 0-distance hit means the word is spelled fine
    // and ES returns no suggestion). Top 3 per input term.
    "search_suggest_term" -> ((s, dir) => {
      import s.implicits._
      val vocab = vocabOf(s, dir)
      val probes = broadcast(TermProbes.toDF("input"))
      vocab
        .join(probes,
          substring(col("term"), 1, 1) === substring(col("input"), 1, 1) &&
            abs(length(col("term")) - length(col("input"))) <= 2)
        .withColumn("dist", levenshtein(col("input"), col("term"), 2))
        .filter(col("dist") >= 1)
        .withColumn("rnk", row_number().over(Window.partitionBy(col("input"))
          .orderBy(col("dist"), col("df").desc, col("term"))))
        .filter(col("rnk") <= 3)
        .select(col("input"), col("term").as("suggestion"), col("dist"),
          col("df"), col("rnk"))
        .orderBy(col("input"), col("rnk"))
    }),

    // ES `phrase` suggester: per-word candidate sets (<= 3 each,
    // 0-distance kept so an already-correct word survives) compose into
    // whole corrected phrases, re-scored by (total edit distance asc,
    // summed candidate df desc) — the deterministic stand-in for ES's
    // bigram-LM rescore. The compose step is a broadcast of one <= 3-row
    // candidate frame against the other (bounded by the suggester's own
    // size knob, never by the corpus), so the "cartesian" is 9 rows by
    // construction.
    "search_suggest_phrase" -> ((s, dir) => {
      val vocab = vocabOf(s, dir)
      val c0 = candidates(vocab, PhraseWords(0), 3)
        .select(col("term").as("w0"), col("dist").as("d0"), col("df").as("df0"))
      val c1 = candidates(vocab, PhraseWords(1), 3)
        .select(col("term").as("w1"), col("dist").as("d1"), col("df").as("df1"))
      c0.crossJoin(broadcast(c1))
        .select(concat_ws(" ", col("w0"), col("w1")).as("phrase"),
          (col("d0") + col("d1")).as("total_dist"),
          (col("df0") + col("df1")).as("score_df"))
        .orderBy(col("total_dist"), col("score_df").desc, col("phrase"))
        .limit(5)
    })
  )

  /** DuckDB twins — vocabulary re-derived inline from `documents` (the
    * postings artifact is engine-internal), candidate logic mirrored
    * term for term. DuckDB's `levenshtein` is the same unit-cost DP.
    */
  val oracleSql: Map[String, String] = {
    val vocabCte =
      """t AS (SELECT DISTINCT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents),
        |v AS (SELECT term, count(*) AS df FROM t GROUP BY 1)""".stripMargin
    def candCte(name: String, word: String, keepZero: Boolean) =
      s"""$name AS (
         |  SELECT term, df, levenshtein('$word', term) AS dist,
         |    row_number() OVER (ORDER BY levenshtein('$word', term),
         |                       df DESC, term) AS rnk
         |  FROM v
         |  WHERE substr(term, 1, 1) = '${word.charAt(0)}'
         |    AND abs(len(term) - ${word.length}) <= 2
         |    AND levenshtein('$word', term) BETWEEN ${if (keepZero) 0 else 1} AND 2)""".stripMargin
    Map(
      "search_suggest_term" ->
        s"""WITH $vocabCte,
           |probes(input) AS (VALUES ${TermProbes.map(p => s"('$p')").mkString(", ")}),
           |c AS (
           |  SELECT input, term AS suggestion, levenshtein(input, term) AS dist, df
           |  FROM v, probes
           |  WHERE substr(term, 1, 1) = substr(input, 1, 1)
           |    AND abs(len(term) - len(input)) <= 2
           |    AND levenshtein(input, term) BETWEEN 1 AND 2),
           |r AS (SELECT *, row_number() OVER (PARTITION BY input
           |        ORDER BY dist, df DESC, suggestion) AS rnk FROM c)
           |SELECT input, suggestion, CAST(dist AS INT) AS dist, df,
           |  CAST(rnk AS INT) AS rnk
           |FROM r WHERE rnk <= 3 ORDER BY input, rnk""".stripMargin,
      "search_suggest_phrase" ->
        s"""WITH $vocabCte,
           |${candCte("c0", PhraseWords(0), keepZero = true)},
           |${candCte("c1", PhraseWords(1), keepZero = true)}
           |SELECT c0.term || ' ' || c1.term AS phrase,
           |  CAST(c0.dist + c1.dist AS INT) AS total_dist,
           |  c0.df + c1.df AS score_df
           |FROM c0, c1 WHERE c0.rnk <= 3 AND c1.rnk <= 3
           |ORDER BY total_dist, score_df DESC, phrase LIMIT 5""".stripMargin)
  }
}
