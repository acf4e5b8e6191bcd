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
  * independently-written sequential reference piece-for-piece. It is
  * NOT oracle-checkable: Viterbi compares sums of log-probabilities
  * (doubles), and the float DP has no exact-integer form (unlike BPE's
  * pure counts) — the registered row is rows-only by documented
  * design, with the spec as the hard check.
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
    val words = BpeQueries.wordTable(Tables.forCompute(s, dir, "documents"))
      .select(col("word"), col("freq"))
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
    // final count mass). rows-only by design (float Viterbi inside);
    // LlmSpec pins the whole chain against a sequential reference.
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
    // actually worth. rows-only like the trainer (same float Viterbi);
    // LlmSpec pins prune + re-segment against the sequential
    // reference.
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

  /** Float Viterbi ⇒ no SQL twin; the driver records rows-only. */
  val oracleSql: Map[String, String] = Map.empty
}
