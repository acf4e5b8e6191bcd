package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed unigram-LM tokenizer training (Kudo, "Subword
  * Regularization", ACL'18 — the SentencePiece `--model_type=unigram`
  * trainer), the second tokenizer-training family next to BPE:
  * where BPE GROWS a vocabulary by merging, unigram SELECTS one by
  * fitting piece probabilities with EM over all segmentations.
  *
  * This is the hard-EM (Viterbi) variant with a fixed vocabulary and
  * deterministic tie-breaks, so the whole training run is reproducible
  * bit-for-bit — LlmSpec proves the distributed trainer equals an
  * independently-written sequential reference piece-for-piece, and
  * since round 7 the run is also HASH-ORACLED against a fully
  * unrolled DuckDB twin. Cross-engine float contract, per piece of
  * the DP:
  *  - the only libm call is ln(c/total); Java `Math.log` and DuckDB
  *    `ln` are bit-identical on this input class (validated over 6310
  *    count ratios at build time — the same empirical contract the
  *    BM25 idf queries have shipped on since round 2);
  *  - everything else is IEEE adds/divides applied to identical
  *    operands in identical order (the DP accumulates prefix scores
  *    left-to-right; the twin's enumeration accumulates the same way),
  *    so equal inputs give bitwise-equal scores;
  *  - tie-breaks form a TOTAL order both sides implement: score desc,
  *    then piece count asc, then REVERSE-sequence lexicographic
  *    (the DP's "smaller final piece, recursing into the predecessor
  *    state" rule IS elementwise lex on the reversed piece list, which
  *    equals string comparison of the space-joined reversed sequence —
  *    two segmentations of one word differ first at a separator-vs-
  *    letter position, and ' ' < every letter).
  * The twin replaces the per-word DP with exhaustive segmentation
  * enumeration (a recursive CTE): valid because the DP's order is
  * prefix-decomposable — extending two prefix states by the same
  * suffix preserves their relative order in all three components — so
  * the DP optimum IS the enumeration optimum. Enumeration is
  * oracle-side only (compositions of short words; the engine keeps
  * the linear DP).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - everything trains on the word-TYPE table (bounded by vocabulary,
  *    not corpus rows) — identical boundary to the BPE trainer;
  *  - the E-step is one `mapPartitions` sweep over word types with the
  *    piece table broadcast (|alphabet| + [[MultiVocab]] entries — the
  *    same bounded-driver-collect budget as the ANN codebooks), plus
  *    one piece-keyed partial+final agg: two narrow stages per
  *    iteration, no corpus rescan;
  *  - the M-step is a driver fold over ≤ |vocab| rows.
  */
object UnigramQueries {

  /** Candidate pieces are all substrings up to this length. */
  val SeedMaxLen = 4

  /** Multi-character vocabulary slots (single chars are always kept —
    * they are the segmentation fallback that makes every word
    * representable).
    */
  val MultiVocab = 64

  val EmIters = 3

  /** Viterbi segmentation of one word under log piece probabilities.
    * Deterministic tie-break at equal score: fewer pieces, then the
    * lexicographically smaller final piece — total and engine-
    * independent, so the distributed and sequential runs agree
    * exactly. Every char is in the vocabulary (seeded from the same
    * corpus), so the DP always completes.
    */
  private[graft] def viterbi(word: String,
                             logp: scala.collection.Map[String, Double]): List[String] = {
    val n = word.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val npc = Array.fill(n + 1)(Int.MaxValue)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    npc(0) = 0
    var i = 1
    while (i <= n) {
      val maxL = math.min(SeedMaxLen, i)
      var l = 1
      while (l <= maxL) {
        val piece = word.substring(i - l, i)
        val lp = logp.getOrElse(piece, Double.NaN)
        if (!lp.isNaN && score(i - l) != Double.NegativeInfinity) {
          val cs = score(i - l) + lp
          val cn = npc(i - l) + 1
          val better = cs > score(i) ||
            (cs == score(i) &&
              (cn < npc(i) ||
                (cn == npc(i) && piece < word.substring(i - back(i), i))))
          if (better) { score(i) = cs; npc(i) = cn; back(i) = l }
        }
        l += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      out = word.substring(p - l, p) :: out
      p -= l
    }
    out
  }

  /** Frequency-weighted occurrence counts of every candidate substring
    * (length 1..[[SeedMaxLen]]) across the word-type table — the seed
    * statistic the initial piece distribution comes from. Explode +
    * piece-keyed agg: map-side partial aggregation collapses each
    * partition's candidates before the (vocabulary-shaped) shuffle.
    */
  private[graft] def seedCounts(words: DataFrame): DataFrame =
    words
      .select(explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(SeedMaxLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"),
        col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** The full training run: seed → [[EmIters]] × (E-step Viterbi sweep
    * + M-step re-estimate). Returns (final piece counts, their total).
    * Counts of pieces the Viterbi never chose floor at 1 in the
    * probability estimate (Laplace floor — keeps them reachable, the
    * same role as SentencePiece's min piece probability) but report
    * as their true 0 in the output.
    */
  private[graft] def trainUnigram(s: SparkSession, dir: String): (Map[String, Long], Long) = {
    import s.implicits._
    // Checkpoint at entry (r14, same as the BPE/WordPiece trainers):
    // the word-TYPE table is a corpus-scale aggregation consumed by
    // the seed collects (×2) and EVERY EM iteration's E-step — without
    // lineage truncation each of those re-runs the corpus explode+agg.
    // Vocab-bounded, the class the checkpoint policy allows. Gated on
    // corpus size (r15) — see [[BpeQueries.trainerEntryCheckpoint]].
    val words0 = BpeQueries.wordTable(Tables.forCompute(s, dir, "documents"))
      .select(col("word"), col("freq"))
    val words =
      if (BpeQueries.trainerEntryCheckpoint(s, dir)) words0.localCheckpoint()
      else words0
    val seeds = seedCounts(words)
    // Bounded driver collects: all single chars (|alphabet|) + the
    // top MultiVocab multi-char candidates under (cnt desc, piece).
    val chars = seeds.filter(length(col("piece")) === 1).collect()
    val multi = seeds.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(MultiVocab).collect()
    var counts: Map[String, Long] =
      (chars ++ multi).map(r => r.getString(0) -> r.getLong(1)).toMap
    val wds = words.as[(String, Long)]
    for (_ <- 1 to EmIters) {
      val floored = counts.map { case (p, c) => p -> math.max(c, 1L) }
      val total = floored.values.sum
      val lp: Map[String, Double] =
        floored.map { case (p, c) => p -> math.log(c.toDouble / total) }
      val bc = s.sparkContext.broadcast(lp)
      val newCounts = wds
        .flatMap { case (w, f) => viterbi(w, bc.value).map(p => (p, f)) }
        .toDF("piece", "f")
        .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts = counts.map { case (p, _) => p -> newCounts.getOrElse(p, 0L) }
    }
    (counts, counts.values.sum)
  }

  /** SentencePiece's vocabulary-SHRINK step: score every multi-char
    * piece by the likelihood loss its removal would cost —
    * cnt(p) · (log P(p) − score of p's best segmentation WITHOUT p) —
    * and keep the top half (chars are never pruned; they are the
    * representability floor). The whole computation is driver
    * arithmetic over the bounded vocabulary: one Viterbi per piece
    * over the piece's OWN string, nothing corpus-sized. Deterministic:
    * loss ties break on the piece string.
    */
  private[graft] def pruneVocab(counts: Map[String, Long]): Map[String, Long] = {
    val floored = counts.map { case (p, c) => p -> math.max(c, 1L) }
    val total = floored.values.sum
    val lp: Map[String, Double] =
      floored.map { case (p, c) => p -> math.log(c.toDouble / total) }
    val multi = counts.keys.filter(_.length > 1).toSeq
    val keep = multi.size / 2
    val losses = multi.map { p =>
      val alt = {
        val without = lp - p
        val seg = viterbi(p, without)
        seg.map(without).sum
      }
      (p, counts(p).toDouble * (lp(p) - alt))
    }
    val kept = losses.sortBy { case (p, loss) => (-loss, p) }
      .take(keep).map(_._1).toSet
    counts.filter { case (p, _) => p.length == 1 || kept(p) }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The trained unigram tokenizer: top-20 pieces by final EM count,
    // with the exact-integer probability (parts per billion of the
    // final count mass). Hash-oracled against the unrolled DuckDB twin
    // (see the module contract above); LlmSpec additionally pins the
    // whole chain against a sequential reference.
    "llm_unigram_train" -> ((s, dir) => {
      val (counts, total) = trainUnigram(s, dir)
      import s.implicits._
      counts.toSeq.toDF("piece", "cnt")
        .select(col("piece"),
          length(col("piece")).as("piece_len"),
          col("cnt"),
          expr(s"(cnt * 1000000000) DIV $total").as("prob_ppb"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(20)
    }),

    // Train → SHRINK → re-segment: the full SentencePiece cycle. The
    // pruned vocabulary (half the multi-char slots, chosen by
    // likelihood loss) re-segments the corpus in one more distributed
    // E-step; the output compares corpus token mass before and after
    // the shrink — the number that says what the dropped pieces were
    // actually worth. Hash-oracled like the trainer (the loss ranking
    // compares identical doubles: cnt·(lp − altScore) where altScore
    // is a max over identical enumerated sums); LlmSpec pins prune +
    // re-segment against the sequential reference.
    "llm_unigram_prune" -> ((s, dir) => {
      import s.implicits._
      val (counts, _) = trainUnigram(s, dir)
      val pruned = pruneVocab(counts)
      val floored = pruned.map { case (p, c) => p -> math.max(c, 1L) }
      val total = floored.values.sum
      val lp: Map[String, Double] =
        floored.map { case (p, c) => p -> math.log(c.toDouble / total) }
      val bc = s.sparkContext.broadcast(lp)
      val words = BpeQueries.wordTable(Tables.forCompute(s, dir, "documents"))
        .select(col("word"), col("freq")).as[(String, Long)]
      val reSeg = words
        .flatMap { case (w, f) => viterbi(w, bc.value).map(p => (p, f)) }
        .toDF("piece", "f")
        .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      reSeg
        .select(col("piece"), length(col("piece")).as("piece_len"),
          col("cnt"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(20)
    })
  )

  // ---------------------------------------------------------------
  // Unrolled DuckDB twins. Shared generator text, parameterized on the
  // training constants so a knob change cannot desynchronize the twin.
  // ---------------------------------------------------------------

  /** Word-type table + seed counts + initial vocabulary (chars ∪ top
    * [[MultiVocab]] multi-char candidates by (cnt desc, piece)).
    */
  private def seedSql: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |    FROM documents)
       |  WHERE len(word) > 0 GROUP BY 1),
       |seeds AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT substr(word, i, l) AS piece, freq
       |    FROM w0,
       |      unnest(generate_series(1, len(word))) AS u(i),
       |      unnest(generate_series(1, least($SeedMaxLen, len(word) - i + 1))) AS v(l))
       |  GROUP BY 1),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM seeds WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM seeds WHERE len(piece) > 1) WHERE rn <= $MultiVocab)""".stripMargin

  /** One E+M step: log-probs from the floored previous counts, the
    * per-word best segmentation by (score desc, npc asc, reversed-
    * sequence lex asc) over an exhaustive recursive-CTE enumeration,
    * then the piece recount over the fixed vocab0 key set.
    */
  private def emIterSql(n: Int): String = {
    val p = n - 1
    s"""lp$n AS MATERIALIZED (
       |  SELECT piece, ln(CAST(greatest(cnt, 1) AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lp
       |  FROM vocab$p, (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total FROM vocab$p) t),
       |seg$n AS (
       |  SELECT word, freq, 0 AS pos, CAST(0 AS DOUBLE) AS score, 0 AS npc, '' AS rseq FROM w0
       |  UNION ALL
       |  SELECT s.word, s.freq, s.pos + len(v.piece), s.score + v.lp, s.npc + 1,
       |         CASE WHEN s.rseq = '' THEN v.piece ELSE v.piece || ' ' || s.rseq END
       |  FROM seg$n s JOIN lp$n v
       |    ON v.piece = substr(s.word, s.pos + 1, len(v.piece))
       |  WHERE s.pos < len(s.word)),
       |best$n AS MATERIALIZED (
       |  SELECT word, freq, rseq FROM (
       |    SELECT word, freq, rseq,
       |      row_number() OVER (PARTITION BY word ORDER BY score DESC, npc, rseq) AS rn
       |    FROM seg$n WHERE pos = len(word)) WHERE rn = 1),
       |cnt$n AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT b.freq, t.piece
       |    FROM best$n b, unnest(str_split(b.rseq, ' ')) AS t(piece))
       |  GROUP BY 1),
       |vocab$n AS MATERIALIZED (
       |  SELECT v.piece, coalesce(c.cnt, 0) AS cnt
       |  FROM vocab0 v LEFT JOIN cnt$n c USING (piece))""".stripMargin
  }

  private def trainChainSql: String =
    (seedSql +: (1 to EmIters).map(emIterSql)).mkString(",\n")

  /** The prune twin's tail: likelihood-loss ranking (each multi piece
    * vs the best segmentation of its own string WITHOUT itself), keep
    * the top half, one more E-step with the pruned vocabulary.
    */
  private def pruneTailSql: String = {
    val k = EmIters
    s"""flp AS MATERIALIZED (SELECT piece, greatest(cnt, 1) AS fc FROM vocab$k),
       |plp AS MATERIALIZED (
       |  SELECT piece, ln(CAST(fc AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lp
       |  FROM flp, (SELECT CAST(sum(fc) AS BIGINT) AS total FROM flp) t),
       |multi AS MATERIALIZED (SELECT piece FROM vocab$k WHERE len(piece) > 1),
       |altseg AS (
       |  SELECT piece AS target, 0 AS pos, CAST(0 AS DOUBLE) AS score FROM multi
       |  UNION ALL
       |  SELECT s.target, s.pos + len(v.piece), s.score + v.lp
       |  FROM altseg s JOIN plp v
       |    ON v.piece = substr(s.target, s.pos + 1, len(v.piece)) AND v.piece <> s.target
       |  WHERE s.pos < len(s.target)),
       |alt AS MATERIALIZED (
       |  SELECT target, max(score) AS alt FROM altseg WHERE pos = len(target) GROUP BY 1),
       |loss AS MATERIALIZED (
       |  SELECT m.piece, CAST(v.cnt AS DOUBLE) * (l.lp - a.alt) AS loss
       |  FROM multi m JOIN vocab$k v USING (piece) JOIN plp l USING (piece)
       |  JOIN alt a ON a.target = m.piece),
       |kept AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (ORDER BY loss DESC, piece) AS rn FROM loss)
       |  WHERE rn <= (SELECT count(*) // 2 FROM multi)),
       |pvocab AS MATERIALIZED (
       |  SELECT piece, cnt FROM vocab$k WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT v.piece, v.cnt FROM vocab$k v JOIN kept USING (piece)),
       |lpf AS MATERIALIZED (
       |  SELECT piece, ln(CAST(greatest(cnt, 1) AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lp
       |  FROM pvocab, (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total FROM pvocab) t),
       |segf AS (
       |  SELECT word, freq, 0 AS pos, CAST(0 AS DOUBLE) AS score, 0 AS npc, '' AS rseq FROM w0
       |  UNION ALL
       |  SELECT s.word, s.freq, s.pos + len(v.piece), s.score + v.lp, s.npc + 1,
       |         CASE WHEN s.rseq = '' THEN v.piece ELSE v.piece || ' ' || s.rseq END
       |  FROM segf s JOIN lpf v
       |    ON v.piece = substr(s.word, s.pos + 1, len(v.piece))
       |  WHERE s.pos < len(s.word)),
       |bestf AS MATERIALIZED (
       |  SELECT word, freq, rseq FROM (
       |    SELECT word, freq, rseq,
       |      row_number() OVER (PARTITION BY word ORDER BY score DESC, npc, rseq) AS rn
       |    FROM segf WHERE pos = len(word)) WHERE rn = 1)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "llm_unigram_train" ->
      s"""WITH RECURSIVE
         |$trainChainSql
         |SELECT piece, CAST(len(piece) AS INT) AS piece_len, cnt,
         |  CAST((cnt * 1000000000)
         |    // CAST((SELECT sum(cnt) FROM vocab$EmIters) AS BIGINT) AS BIGINT) AS prob_ppb
         |FROM vocab$EmIters
         |ORDER BY cnt DESC, piece LIMIT 20""".stripMargin,
    "llm_unigram_prune" ->
      s"""WITH RECURSIVE
         |$trainChainSql,
         |$pruneTailSql
         |SELECT piece, CAST(len(piece) AS INT) AS piece_len,
         |  CAST(sum(freq) AS BIGINT) AS cnt
         |FROM (SELECT b.freq, t.piece
         |      FROM bestf b, unnest(str_split(b.rseq, ' ')) AS t(piece))
         |GROUP BY 1 ORDER BY cnt DESC, piece LIMIT 20""".stripMargin)
}
