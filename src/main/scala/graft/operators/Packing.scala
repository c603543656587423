package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign every document a position in the
  * concat-then-chunk layout (all documents of a stream concatenated in
  * a canonical order, then cut into fixed `budget`-token sequences —
  * the standard pretraining batch construction). The assignment is
  * PURE METADATA: (start_tok, seq_no) per document, computed with one
  * running-sum window — the actual token concatenation happens at
  * data-loading time from these offsets.
  *
  * Scale shape: packing is computed PER STREAM (the `streamCol`
  * partition — language, domain, shard): each stream is one window
  * partition, so the cluster packs all streams in parallel and no
  * global total order exists to funnel through a single task. A
  * whole-corpus pack would be a single-partition window — the caller
  * who wants one global stream should pre-shard ids into synthetic
  * streams instead (deterministic round-robin on id), not ask for a
  * global sort.
  *
  * Determinism: the canonical order inside a stream is the id — stable
  * under repartitioning and re-runs, so sequence assignments never move
  * when the corpus is reprocessed.
  */
object Packing {

  /** Adds (n_tokens kept as given, start_tok, seq_no) per document.
    * `seq_no` = start_tok / budget (floor): the sequence whose chunk
    * holds the document's FIRST token; documents crossing a boundary
    * continue into the next sequence, as concat-then-chunk implies.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      streamCol: String,
      nTokensCol: String,
      budget: Int
  ): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window
      .partitionBy(col(streamCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("start_tok", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("seq_no", (col("start_tok") / budget).cast("long"))
  }
}
