package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Distributed BPE tokenizer training (Sennrich et al. 2016, ACL —
  * arXiv:1508.07909): the merge-learning loop a pre-training pipeline
  * runs before anything else touches tokens.
  *
  * The scale design is the classic one: train on the WORD-TYPE table
  * (distinct word, occurrence count), never the token stream — at
  * 100 TB the corpus has trillions of tokens but a bounded distinct-
  * word vocabulary (~10⁷), so every BPE iteration is one narrow map +
  * one pair-count aggregation over that small table. Per iteration the
  * driver sees exactly ONE row (the argmax pair — same bounded-collect
  * discipline as the ANN query vector); the merge application is
  * [[mergePair]], a codegen'd greedy left-to-right fold over the
  * symbol array (" l o w " → " lo w ") with exact BPE merge-step
  * semantics including back-to-back pair occurrences.
  *
  * Determinism: counts are exact integers; argmax ties break
  * lexicographically on the pair — the learned merge table is
  * identical under any partitioning (LlmSpec proves the distributed
  * trainer equals a sequential reference implementation).
  */
object BpeQueries {

  /** Word-type table of the documents corpus: one row per distinct
    * word with its corpus frequency, the word pre-segmented to
    * space-delimited characters with sentinel spaces (" l o w ").
    */
  private[graft] def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("seg",
        concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" ")))

  /** Adjacent-symbol pairs of a seg column, space-joined ("l o"). */
  private[graft] def adjacentPairs(seg: Column): Column = {
    val syms = split(trim(seg), " ")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Adjacent-symbol pairs as (l, r) structs — the trainer's form.
    * The argmax tie-break must order on the TUPLE, not the
    * space-joined string: symbols may contain characters below
    * 0x20 that sort before the delimiter space, so ("a", x) vs
    * ("a", y) order differently under the two schemes.
    */
  private[graft] def adjacentPairsLR(seg: Column): Column = {
    val syms = split(trim(seg), " ")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast(ArrayType(StructType(Seq(
        StructField("l", StringType), StructField("r", StringType))))))
  }

  /** One learned merge: rank, the two symbols, the merged symbol, and
    * the weighted pair count that won the argmax.
    */
  private[graft] case class Merge(merge_rank: Int, left: String,
                                  right: String, merged: String,
                                  pair_count: Long)

  /** Greedy left-to-right application of ONE merge (a,b)→ab to a
    * symbol array — the exact semantics of BPE's merge step
    * (Sennrich's reference walks the list and restarts AFTER each
    * merged token). A string `replace` of " a b "→" ab " is NOT
    * equivalent: back-to-back occurrences share their delimiter
    * space, so non-overlapping replace misses every second one
    * ("a b a b" → "ab a b", where greedy BPE gives "ab ab").
    * Implemented as a codegen'd fold: accumulator = (emitted symbols,
    * one pending symbol); a pending `a` followed by `b` emits the
    * merged token and clears the pending slot, so the merged token
    * can never left-participate in another merge of the same pass.
    */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    mergePairInto(syms, a, b, a + b)

  /** [[mergePair]] with an explicit merged-token spelling — WordPiece
    * merges (l, ##r) into l+r (the continuation marker splices out),
    * so the emitted token is a parameter rather than always a+b. The
    * fold semantics (greedy, restart-after-merge) are identical.
    */
  private[graft] def mergePairInto(syms: Column, a: String, b: String,
                                   merged: String): Column = {
    val emptyArr = array().cast(ArrayType(StringType))
    aggregate(
      syms,
      struct(emptyArr.as("out"), lit("").as("pend")),
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend === lit(a) && s === lit(b),
          struct(concat(out, array(lit(merged))).as("out"), lit("").as("pend")))
          .when(pend === lit(""),
            struct(out.as("out"), s.as("pend")))
          .otherwise(
            struct(concat(out, array(pend)).as("out"), s.as("pend")))
      },
      acc => when(acc.getField("pend") === lit(""), acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** The BPE training loop: k iterations of distributed pair-count →
    * 1-row argmax collect → distributed merge application. Returns the
    * learned merge table and the final word table (for segmentation
    * stats). The word table is localCheckpointed every few iterations
    * so lineage stays shallow across the loop.
    */
  private[graft] def trainMerges(words0: DataFrame, k: Int,
                                 entryCheckpoint: Boolean = true): (Seq[Merge], DataFrame) = {
    // Checkpoint at ENTRY too (r14): words0 is the corpus-scale
    // word-type AGGREGATION, and without truncating its lineage here
    // iterations 1..3 each re-run the whole corpus explode+agg under
    // their pair-count job (the every-4 checkpoint only helps from
    // rank 4 on) — 4 corpus passes where one suffices. The word-type
    // table is vocab-bounded, the class the checkpoint policy allows.
    // GATED on corpus size (r15, r14 VERDICT #5): at tiny inputs the
    // eager materialization costs more wall than the saved recompute
    // (llm_bpe_train 0.21 → 0.48 s at sf0.1); below the caller's
    // threshold the lineage re-runs are the cheaper side of the trade.
    var words = if (entryCheckpoint) words0.localCheckpoint() else words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (rank <- 1 to k) {
      val top = words
        .select(col("freq"), explode(adjacentPairsLR(col("seg"))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, a, b, a + b, top(0).getLong(2))
        words = words.withColumn("seg",
          concat(lit(" "),
            array_join(mergePair(split(trim(col("seg")), " "), a, b), " "),
            lit(" ")))
        if (rank % 4 == 0) words = words.localCheckpoint()
      }
    }
    (merges.toSeq, words)
  }

  /** Shared gate for the three trainers' loop-entry checkpoints (r15):
    * checkpoint only when the corpus is big enough that re-running the
    * word-type aggregation 3–6× (what the entry checkpoint saves)
    * outweighs the checkpoint's eager-materialization floor.
    * Scale-adaptive, not a local[32] tune: the threshold is a corpus
    * ROW count read from parquet footers (cheap, memoized), env-
    * overridable, defaulting far above every fixture (5 000 docs at
    * sf0.1) and far below any production corpus — at 100 TB the gate
    * is always open and the r14 multi-pass saving stands.
    */
  private[graft] def trainerEntryCheckpoint(s: SparkSession, dir: String): Boolean =
    Tables.rowCount(s, dir, "documents") >=
      sys.env.getOrElse("SPARK_GRAFT_TRAINER_CKPT_MIN_DOCS", "100000").toLong

  private val NMerges = 12

  /** The trained tokenizer as warehouse ARTIFACTS (same contract as
    * the near-dup pair graph / postings / vector index): the merge
    * table and the merged word-type table are built once per ingest —
    * fingerprint = trainer version + k + input-file metadata — and
    * every consumer (the merge-table query, segmentation stats, and
    * at scale the tokenize pass itself) reads the artifact instead of
    * re-training. A tokenizer that retrained per query would also be
    * WRONG at scale, not just slow: token ids must be stable across
    * the whole corpus ingest.
    */
  private[graft] val MergesName = "bpe_merges"
  private[graft] val WordsName = "bpe_words"

  private[graft] def materializedBpe(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val store = new graft.etl.IndexStore(s, graft.etl.IndexStore.artifactRoot(dir))
    // v3: argmax tie-break moved from the space-joined pair string to
    // the (left, right) tuple (symbols may contain chars < 0x20 that
    // sort below the delimiter) — the artifact must rebuild even on an
    // unchanged corpus.
    val fp = s"bpe_v3:k=$NMerges:" +
      graft.etl.IndexStore.pathFingerprint(s, s"$dir/documents.parquet")
    if (!store.artifactFingerprint(MergesName).contains(fp) ||
        !store.artifactFingerprint(WordsName).contains(fp)) {
      val (merges, words) = trainMerges(
        wordTable(Tables.forCompute(s, dir, "documents")), NMerges,
        entryCheckpoint = trainerEntryCheckpoint(s, dir))
      store.writeArtifact(s.createDataFrame(merges), MergesName, fp, numShards = 1)
      store.writeArtifact(words, WordsName, fp)
    }
    (store.read(MergesName), store.read(WordsName))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The inner loop of BPE training, oracle-checked: weighted
    // adjacent-character pair counts over the word-type table (what
    // iteration 1 of the trainer aggregates), top 20. One explode +
    // one partial+final agg + top-k — the per-iteration cost shape.
    "llm_bpe_pair_counts" -> ((s, dir) => {
      wordTable(Tables.forCompute(s, dir, "documents"))
        .select(col("freq"), explode(adjacentPairs(col("seg"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    }),

    // The full trainer: the first 12 learned merges with their
    // winning counts, served from the per-ingest artifact. The loop
    // is not SINGLE-statement-SQL-expressible (each iteration's
    // argmax feeds the next iteration's segmentation), but the
    // trainer is deterministic exact-integer arithmetic with a lex
    // tuple tie-break — so the 12 iterations unroll into 12 CTE
    // levels ([[bpeChainSql]]) and the whole chain hash-checks
    // against DuckDB. LlmSpec additionally proves the trainer equals
    // a sequential reference BPE bit-for-bit on a known corpus.
    "llm_bpe_train" -> ((s, dir) => {
      materializedBpe(s, dir)._1.orderBy(col("merge_rank"))
    }),

    // Encoding to token ids — the final step of the tokenizer story:
    // assign each vocabulary symbol (post-merge, so base characters
    // plus the k learned merges) a dense deterministic id (lex order —
    // stable across partitioning and engines), then produce the
    // corpus token histogram. The histogram comes straight off the
    // word-TYPE table weighted by frequency — the corpus text is
    // never re-scanned; at 100 TB the actual "encode the corpus"
    // pass is the same equi-join of corpus words against this
    // (word → ids) dictionary. The id-assignment window is a single
    // partition over V rows, which is correct: V is bounded by
    // |alphabet| + k, not the corpus.
    "llm_bpe_encode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = materializedBpe(s, dir)._2
        .select(col("freq"), split(trim(col("seg")), " ").as("syms"))
      val sym = words.select(explode(col("syms")).as("symbol"), col("freq"))
      val vocab = sym.select(col("symbol")).distinct()
        .withColumn("token_id",
          (row_number().over(Window.orderBy(col("symbol"))) - 1).cast(LongType))
      sym.groupBy(col("symbol")).agg(sum(col("freq")).as("n_occurrences"))
        .join(vocab, "symbol")
        .select(col("token_id"), col("symbol"), col("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("token_id"))
        .limit(20)
    }),

    // Segmentation with the learned vocabulary — the apply side of
    // the trainer, as corpus statistics: token counts per word type
    // before (chars) and after the 12 merges, frequency-weighted.
    // At scale this is the scan-speed tokenize pass every training
    // run does; here it reports the compression the merges bought.
    "llm_bpe_segment" -> ((s, dir) => {
      materializedBpe(s, dir)._2
        .withColumn("toks_after", size(split(trim(col("seg")), " ")).cast(LongType))
        .withColumn("chars", length(col("word")).cast(LongType))
        .agg(
          sum(col("freq")).as("total_words"),
          sum(col("chars") * col("freq")).as("total_symbols_before"),
          sum(col("toks_after") * col("freq")).as("total_tokens_after"),
          round(sum(col("chars") * col("freq")).cast(DoubleType) /
            sum(col("toks_after") * col("freq")).cast(DoubleType), 6)
            .as("compression"))
    }),

    // Tokenizer FERTILITY by language — tokens-per-word and
    // chars-per-token per lang, the standard cross-lingual tokenizer
    // evaluation (a vocabulary trained on one language mix inflates
    // token counts — and training cost — for the others; fertility is
    // the number a data-mixture owner reads before fixing the mix).
    // Shape: corpus words equi-join the (word → segmentation)
    // dictionary — the dictionary is vocabulary-TYPE-shaped, so this
    // is the same bounded join as the encode pass, never corpus²;
    // per-lang sums are exact integers, two final divisions. Rides
    // the same unrolled-CTE oracle as the rest of the BPE chain.
    "llm_bpe_fertility" -> ((s, dir) => {
      val dict = materializedBpe(s, dir)._2
        .select(col("word"),
          size(split(trim(col("seg")), " ")).cast(LongType).as("toks"))
      Tables.forCompute(s, dir, "documents")
        .select(col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .join(dict, "word")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("toks")).cast(LongType).as("n_tokens"),
          sum(length(col("word"))).cast(LongType).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"), col("n_chars"),
          round(col("n_tokens").cast(DoubleType) /
            col("n_words").cast(DoubleType), 6).as("fertility"),
          round(col("n_chars").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 6).as("chars_per_token"))
        .orderBy(col("lang"))
    })
  )

  /** The trainer's k iterations unrolled as DuckDB CTE levels: per
    * level, a 1-row argmax CTE (cnt DESC, l, r — the tuple tie-break)
    * and the greedy merge application as a `list_reduce` fold. The
    * fold carries the space-joined merged-so-far string; "pending
    * symbol == l" is exactly "acc ends with ' '||l (or is l)" since
    * symbols never contain spaces, and a freshly merged token l||r can
    * never satisfy it (r is non-empty), which reproduces mergePair's
    * restart-after-merge greedy semantics. `AS MATERIALIZED` is
    * load-bearing: DuckDB 1.0 inlines single-referenced CTEs, and the
    * chain references each level twice — inlined, the plan is 2^k
    * scans.
    */
  private def bpeChainSql(k: Int): String = {
    val base =
      """WITH w0 AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE len(word) > 0 GROUP BY 1),
        |s0 AS MATERIALIZED (
        |  SELECT word, freq, regexp_split_to_array(word, '') AS syms FROM w0)""".stripMargin
    val iters = (1 to k).map { n =>
      s"""m$n AS MATERIALIZED (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT syms[i] AS l, syms[i+1] AS r, freq
         |    FROM s${n - 1}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
         |s$n AS MATERIALIZED (
         |  SELECT word, freq,
         |    str_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN x = mr AND (acc = ml OR ends_with(acc, ' ' || ml))
         |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS syms
         |  FROM s${n - 1}, (SELECT l AS ml, r AS mr FROM m$n) m)""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }

  val oracleSql: Map[String, String] = Map(
    "llm_bpe_pair_counts" ->
      """WITH w AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE len(word) > 0 GROUP BY 1),
        |c AS (SELECT regexp_split_to_array(word, '') AS ch, freq FROM w),
        |p AS (
        |  SELECT ch[i] || ' ' || ch[i+1] AS pair, freq
        |  FROM c, unnest(generate_series(1, len(ch) - 1)) AS u(i)
        |  WHERE len(ch) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "llm_bpe_train" ->
      (bpeChainSql(NMerges) + "\n" +
        (1 to NMerges).map { n =>
          s"""SELECT $n AS merge_rank, l AS "left", r AS "right", l || r AS merged, cnt AS pair_count FROM m$n"""
        }.mkString("\nUNION ALL ") +
        "\nORDER BY merge_rank"),

    "llm_bpe_encode" ->
      (bpeChainSql(NMerges) +
        s""",
           |sym AS (SELECT unnest(syms) AS symbol, freq FROM s$NMerges),
           |vocab AS (
           |  SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) - 1 AS BIGINT) AS token_id
           |  FROM (SELECT DISTINCT symbol FROM sym))
           |SELECT v.token_id, s.symbol, CAST(sum(s.freq) AS BIGINT) AS n_occurrences
           |FROM sym s JOIN vocab v USING (symbol)
           |GROUP BY 1, 2 ORDER BY n_occurrences DESC, token_id LIMIT 20""".stripMargin),

    "llm_bpe_segment" ->
      (bpeChainSql(NMerges) +
        s"""
           |SELECT CAST(sum(freq) AS BIGINT) AS total_words,
           |       CAST(sum(len(word) * freq) AS BIGINT) AS total_symbols_before,
           |       CAST(sum(len(syms) * freq) AS BIGINT) AS total_tokens_after,
           |       round(CAST(sum(len(word) * freq) AS DOUBLE) /
           |             CAST(sum(len(syms) * freq) AS DOUBLE), 6) AS compression
           |FROM s$NMerges""".stripMargin),
    "llm_bpe_fertility" ->
      (bpeChainSql(NMerges) +
        s""",
           |occ AS (
           |  SELECT lang, word FROM (
           |    SELECT lang,
           |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
           |    FROM documents)
           |  WHERE len(word) > 0),
           |dict AS (
           |  SELECT word, CAST(len(syms) AS BIGINT) AS toks FROM s$NMerges)
           |SELECT lang, count(*) AS n_words,
           |  CAST(sum(toks) AS BIGINT) AS n_tokens,
           |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
           |  round(CAST(sum(toks) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           |    AS fertility,
           |  round(CAST(sum(len(word)) AS DOUBLE) /
           |        CAST(sum(toks) AS DOUBLE), 6) AS chars_per_token
           |FROM occ JOIN dict USING (word)
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
