package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 close-out of the ES 6.6 `_search` query-type tail
  * (reference `indexView.html:13-20`): the `regexp` term query and the
  * two remaining span combinators `span_containing` / `span_within`
  * (`span_near`/`not`/`or`/`first` shipped earlier — this completes
  * the span family).
  *
  * All three are served from the positional postings artifact
  * ([[SearchQueries.materializedPostings]]), so query cost is the
  * probed posting lists, never the corpus:
  *  - `regexp` runs its automaton over the TERM DICTIONARY the way
  *    Lucene does — here the regexp's literal prefix ('s') is pushed
  *    as a StringStartsWith scan filter into the range-sorted postings
  *    parquet (row-group min/max skip), and the full regexp refines
  *    the surviving dictionary rows; per-doc work is then a bounded
  *    posting-list aggregate;
  *  - the span combinators intersect per-doc position lists (tf-sized
  *    HOFs — O(tf_a·tf_b) per doc, never tokens²), the identical
  *    contract as search_span_near.
  */
object SpanRegexQueries {

  /** The demo regexp — Lucene syntax `s(can|ort|low|tream)` — with its
    * literal anchor prefix. Alternation over four dictionary terms
    * exercises the automaton-over-dictionary model (a pattern with no
    * literal prefix is the same scale trap here as in ES: nothing
    * prunes the dictionary scan).
    */
  private val RegexPrefix = "s"
  private val Regex = "^s(can|ort|low|tream)$"
  private val RegexDuck = "^s(can|ort|low|tream)$"

  /** The outer ("big") span for the combinators: 'group' then 'order'
    * with at most [[BigGap]] intervening positions, in order — and the
    * inner ("little") span is the single term 'join'.
    */
  private val BigGap = 5

  /** span_multi proximity window: any 's*' term, then 'order' within
    * this many positions. The prefix expands to six dictionary terms
    * (scan/slow/sort/spark/stream/small) — a real multi-term union.
    */
  private val MultiGap = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ES `regexp` term query: match any dictionary term accepted by
    // the pattern's automaton, rank docs by total matched-term
    // occurrences (deterministic: n_matches desc, doc_id). The
    // startsWith companion predicate is the pushable rendering of the
    // pattern's literal prefix — PushedFilters shows
    // StringStartsWith(term, 's') against the range-sorted artifact,
    // then the codegen'd RLIKE refines. first_term reports the
    // alphabetically first matched dictionary term per doc (the ES
    // terms-match metadata role).
    "search_regexp" -> ((s, dir) => {
      val (postings, _, _) = SearchQueries.materializedPostings(s, dir)
      postings
        .filter(col("term").startsWith(RegexPrefix) && col("term").rlike(Regex))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_matches"),
          count(lit(1)).as("n_terms"),
          min(col("term")).as("first_term"))
        .orderBy(col("n_matches").desc, col("doc_id"))
        .limit(15)
    }),

    // ES `span_containing` — big spans that CONTAIN at least one
    // little span: ('group' .. 'order', gap <= 5, in order) spans
    // enclosing a 'join' position. Three pruned posting probes (pushed
    // In on the dictionary), then per-doc HOF chains: enumerate big
    // spans (the span_near kernel), keep those with an enclosed
    // little position. Reports the qualifying span count, the first
    // qualifying start, and the tightest qualifying width.
    "search_span_containing" -> ((s, dir) => {
      val (postings, _, _) = SearchQueries.materializedPostings(s, dir)
      def posOf(t: String, out: String) =
        postings.filter(col("term") === t)
          .select(col("doc_id").as(s"d_$out"), col("positions").as(out))
      posOf("group", "pa")
        .join(posOf("order", "pb"), col("d_pa") === col("d_pb"))
        .join(posOf("join", "pc"), col("d_pa") === col("d_pc"))
        .withColumn("spans", flatten(transform(col("pa"), p1 =>
          transform(
            filter(col("pb"), p2 => p2 > p1 && p2 - p1 <= lit(BigGap)),
            p2 => struct(p1.as("p1"), p2.as("p2"))))))
        .withColumn("containing", filter(col("spans"), sp =>
          exists(col("pc"), q =>
            q >= sp.getField("p1") && q <= sp.getField("p2"))))
        .filter(size(col("containing")) > 0)
        .select(col("d_pa").as("doc_id"),
          size(col("containing")).cast(LongType).as("n_spans"),
          array_min(transform(col("containing"), sp => sp.getField("p1")))
            .cast(LongType).as("first_start"),
          array_min(transform(col("containing"),
            sp => sp.getField("p2") - sp.getField("p1")))
            .cast(LongType).as("min_width"))
        .orderBy(col("doc_id"))
    }),

    // ES `span_multi` — a span wrapping a MULTI-TERM query (here
    // prefix 's*') in proximity with a literal term: any position of
    // any dictionary term starting with 's', followed by 'order'
    // within [[MultiGap]] positions. The dictionary probe is ONE
    // pushed StringStartsWith over the range-sorted postings (exactly
    // Lucene's SpanMultiTermQueryWrapper rewrite: the multi-term
    // expands against the term dictionary, never the corpus); the
    // matched terms' position lists union per doc (flatten+sort —
    // positions are distinct across terms, so the union is
    // deterministic under any partitioning), then the span_near
    // pair kernel runs per doc (O(tf_multi·tf_b), never tokens²).
    "search_span_multi" -> ((s, dir) => {
      val (postings, _, _) = SearchQueries.materializedPostings(s, dir)
      val multi = postings.filter(col("term").startsWith("s"))
        .groupBy(col("doc_id"))
        .agg(array_sort(flatten(collect_list(col("positions")))).as("pm"),
          countDistinct(col("term")).as("n_multi_terms"))
      val other = postings.filter(col("term") === "order")
        .select(col("doc_id").as("d_o"), col("positions").as("po"))
      multi.join(other, col("doc_id") === col("d_o"))
        .withColumn("pairs", flatten(transform(col("pm"), p1 =>
          transform(
            filter(col("po"), p2 => p2 > p1 && p2 - p1 <= lit(MultiGap)),
            p2 => struct(p1.as("p1"), p2.as("p2"))))))
        .filter(size(col("pairs")) > 0)
        .select(col("doc_id"),
          size(col("pairs")).cast(LongType).as("n_pairs"),
          array_min(transform(col("pairs"), p => p.getField("p1")))
            .cast(LongType).as("first_start"),
          col("n_multi_terms"))
        .orderBy(col("doc_id"))
    }),

    // ES `span_within` — the dual: little spans ('join' positions)
    // that lie WITHIN some big span. Same three probes; the HOF keeps
    // each little position enclosed by any big span. Reports how many
    // and the first such position per doc.
    "search_span_within" -> ((s, dir) => {
      val (postings, _, _) = SearchQueries.materializedPostings(s, dir)
      def posOf(t: String, out: String) =
        postings.filter(col("term") === t)
          .select(col("doc_id").as(s"d_$out"), col("positions").as(out))
      posOf("group", "pa")
        .join(posOf("order", "pb"), col("d_pa") === col("d_pb"))
        .join(posOf("join", "pc"), col("d_pa") === col("d_pc"))
        .withColumn("within", filter(col("pc"), q =>
          exists(col("pa"), p1 =>
            q >= p1 && exists(
              filter(col("pb"), p2 => p2 > p1 && p2 - p1 <= lit(BigGap)),
              p2 => q <= p2))))
        .filter(size(col("within")) > 0)
        .select(col("d_pa").as("doc_id"),
          size(col("within")).cast(LongType).as("n_within"),
          array_min(col("within")).cast(LongType).as("first_pos"))
        .orderBy(col("doc_id"))
    })
  )

  /** Shared scan-computed position table for the span twins (the
    * search_span_or contract: the driver's gate proves index-served ==
    * scan-computed). Positions 0-based (i-1).
    */
  private val PosCte =
    """t AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, i - 1 AS p, w[i] AS tok
      |  FROM t, unnest(generate_series(1, len(w))) AS u(i))""".stripMargin

  private val BigLittleCte =
    s"""big AS (
       |  SELECT a.doc_id, a.p AS p1, b.p AS p2
       |  FROM p a JOIN p b ON a.doc_id = b.doc_id
       |  WHERE a.tok = 'group' AND b.tok = 'order'
       |    AND b.p > a.p AND b.p - a.p <= $BigGap),
       |little AS (SELECT doc_id, p AS q FROM p WHERE tok = 'join')""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "search_regexp" ->
      s"""WITH $PosCte
         |SELECT doc_id, count(*) AS n_matches,
         |  CAST(count(DISTINCT tok) AS BIGINT) AS n_terms,
         |  min(tok) AS first_term
         |FROM p WHERE regexp_matches(tok, '$RegexDuck')
         |GROUP BY 1 ORDER BY n_matches DESC, doc_id LIMIT 15""".stripMargin,
    "search_span_containing" ->
      s"""WITH $PosCte,
         |$BigLittleCte,
         |cont AS (
         |  SELECT DISTINCT big.doc_id, p1, p2
         |  FROM big JOIN little ON big.doc_id = little.doc_id
         |  WHERE q BETWEEN p1 AND p2)
         |SELECT doc_id, count(*) AS n_spans,
         |  CAST(min(p1) AS BIGINT) AS first_start,
         |  CAST(min(p2 - p1) AS BIGINT) AS min_width
         |FROM cont GROUP BY 1 ORDER BY 1""".stripMargin,
    "search_span_multi" ->
      s"""WITH $PosCte,
         |a AS (SELECT doc_id, p AS p1 FROM p WHERE tok LIKE 's%'),
         |b AS (SELECT doc_id, p AS p2 FROM p WHERE tok = 'order'),
         |m AS (
         |  SELECT doc_id, count(DISTINCT tok) AS n_multi_terms
         |  FROM p WHERE tok LIKE 's%' GROUP BY 1),
         |pr AS (
         |  SELECT a.doc_id, p1, p2
         |  FROM a JOIN b ON a.doc_id = b.doc_id
         |  WHERE p2 > p1 AND p2 - p1 <= $MultiGap),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_pairs, CAST(min(p1) AS BIGINT) AS first_start
         |  FROM pr GROUP BY 1)
         |SELECT agg.doc_id, n_pairs, first_start, n_multi_terms
         |FROM agg JOIN m ON agg.doc_id = m.doc_id
         |ORDER BY agg.doc_id""".stripMargin,
    "search_span_within" ->
      s"""WITH $PosCte,
         |$BigLittleCte,
         |w AS (
         |  SELECT DISTINCT little.doc_id, q
         |  FROM little JOIN big ON big.doc_id = little.doc_id
         |  WHERE q BETWEEN p1 AND p2)
         |SELECT doc_id, count(*) AS n_within,
         |  CAST(min(q) AS BIGINT) AS first_pos
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)
}
