package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The COMPOSED training-data preparation pipeline — the LLM-data twin
  * of [[graft.jobs.PipelineE2e]]: every stage exists as an oracle-checked
  * operator, and this chains them the way a real corpus build runs them:
  *
  *   1. quality + language gate (Gopher/C4-style floor:
  *      [[TextFunctions.qualityScore]] >= minQuality, langId != "und");
  *   2. exact dedup — keep the lowest id per whitespace-normalized
  *      content fingerprint (deterministic survivor election);
  *   3. decontamination — drop documents overlapping the held-out
  *      reference set ([[Contamination.decontaminate]]);
  *   4. train-split gate — salted-md5 bucket under `trainPermille`;
  *   5. reproducible shuffle — ([[Curation.shuffleAssign]]) shard +
  *      position for randomized training order without an RNG;
  *   6. training-cost metering + packing — subword counts
  *      ([[graft.functions.SubwordCounts]]) feed concat-then-chunk
  *      sequence assignment ([[Packing.packSequences]]) per language
  *      stream.
  *
  * Output: one manifest row per surviving document —
  * (id, lang, quality, n_subtok, shard, pos_in_shard, start_tok,
  * seq_no) — exactly what a downstream loader needs to materialize
  * training batches.
  *
  * Scale: the chain inherits each stage's audited shape — narrow map
  * stages for scoring/fingerprinting/metering, one window for the
  * exact-dedup survivor election, the broadcast anti-join for
  * decontamination, and per-shard / per-stream windows for shuffle and
  * packing. No stage collects, self-joins, or needs a global order.
  */
object CorpusPrep {
  def prepare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      refDocs: DataFrame,
      refTextCol: String,
      minQuality: Int,
      contamN: Int,
      contamThreshMil: Int,
      splitSalt: String,
      trainPermille: Int,
      nShards: Int,
      shuffleSalt: String,
      startVocab: Seq[String],
      contVocab: Seq[String],
      packBudget: Int
  ): DataFrame = {
    val text = col(textCol)

    // 1. quality + language gate
    val gated = docs
      .select(col(idCol), col(langCol), text)
      .withColumn("quality", TextFunctions.qualityScore(text))
      .withColumn("__lid", TextFunctions.langId(text))
      .where(col("quality") >= minQuality && col("__lid") =!= "und")
      .drop("__lid")

    // 2. exact dedup: lowest id per normalized content fingerprint
    val fw = Window
      .partitionBy(col("__fp"))
      .orderBy(col(idCol).asc)
    val exact = gated
      .withColumn("__fp", TextFunctions.docFingerprint(text))
      .withColumn("__rn", row_number().over(fw))
      .where(col("__rn") === 1)
      .drop("__rn", "__fp")

    // 3. decontamination against the held-out reference set
    val clean = Contamination.decontaminate(
      exact, idCol, text, refDocs, col(refTextCol), contamN, contamThreshMil)

    // 4. train-split gate
    val train = clean.where(
      TextFunctions.splitBucket(col(idCol), 1000, splitSalt) < trainPermille)

    // 5. reproducible shuffle
    val shuffled = Curation.shuffleAssign(train, idCol, nShards, shuffleSalt)

    // 6. subword metering + per-language-stream packing
    val metered = shuffled.withColumn(
      "n_subtok",
      element_at(
        call_function(
          "graft_subword_counts",
          TextFunctions.tokens(text),
          lit(startVocab.mkString(" ")),
          lit(contVocab.mkString(" "))
        ),
        1
      )
    )
    Packing
      .packSequences(metered, idCol, langCol, "n_subtok", packBudget)
      .select(
        col(idCol),
        col(langCol),
        col("quality"),
        col("n_subtok"),
        col("shard"),
        col("pos_in_shard"),
        col("start_tok").cast("long").as("start_tok"),
        col("seq_no")
      )
  }
}
