package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword vocabulary TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * learning half of the subword story ([[graft.functions.SubwordCounts]]
  * applies a vocabulary; this learns one from the corpus).
  *
  * Scale shape — the standard two-phase split every production BPE
  * trainer uses (corpus-sized work distributed, merge learning on the
  * compact weighted vocabulary):
  *
  *   1. ONE distributed pass: `explode(tokens) -> groupBy(word).count()`
  *      — the only corpus-sized stage, a plain partial-aggregated
  *      shuffle. The distinct-word frame is then capped at `maxVocab`
  *      rows (count DESC, word ASC — deterministic) and collected:
  *      even a 100 TB corpus has a bounded distinct-word vocabulary,
  *      and the cap bounds the driver memory contract explicitly.
  *   2. Driver-side weighted merge learning over that vocabulary:
  *      `nMerges` rounds of count-adjacent-pairs -> pick max -> merge.
  *      Each round touches only the (word, count) table — independent
  *      of corpus size. Ties break (count DESC, left ASC, right ASC),
  *      so the learned merge list is a pure function of the corpus.
  *
  * Merge application (here, in [[graft.functions.BpeCounts]], and in
  * the SQL oracle) is the standard single left-to-right non-overlapping
  * pass per rule, in rank order. One pass per rule is a fixpoint: a
  * completed pass cannot create a new (x, y) adjacency for the same
  * rule, because the merged symbol `xy` differs from both x and y.
  */
object Bpe {

  /** Learn `nMerges` merge rules from the corpus' token stream. */
  def train(
      docs: DataFrame,
      text: Column,
      nMerges: Int,
      maxVocab: Int = 100000
  ): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val vocab: Seq[(String, Long)] = docs
      // the SHARED tokenizer: trainer and apply kernel must see the same
      // token stream or the vocab silently skews from what gets applied
      .select(explode(graft.functions.TextFunctions.tokens(text)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq
    trainFromVocab(vocab, nMerges)
  }

  /** Weighted BPE over an in-memory (word, count) vocabulary. */
  private[graft] def trainFromVocab(
      vocab: Seq[(String, Long)],
      nMerges: Int
  ): Seq[(String, String)] = {
    // each word as its current symbol sequence, weighted by frequency
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic argmax: count DESC, then pair lexicographic
        val (pair, _) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        merges += pair
        words = words.map { case (syms, n) => (applyMerge(syms, pair), n) }
        round += 1
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping pass of a single merge rule. */
  private[graft] def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Apply a full ordered merge list to one word (reference
    * implementation — the [[graft.functions.BpeCounts]] kernel and the
    * SQL oracle must both agree with this).
    */
  private[graft] def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach(m => syms = applyMerge(syms, m))
    syms.toSeq
  }
}
