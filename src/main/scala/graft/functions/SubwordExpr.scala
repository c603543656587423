package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native greedy longest-match WORDPIECE counting kernel:
  * `array<string>` of words -> `array<int>` of
  * `[n_pieces, n_unk_chars, max_pieces_per_word]`.
  *
  * Tokenization contract (the WordPiece inference rule, Devlin et al.
  * 2019 §4.1 / Song et al. 2021 "Fast WordPiece Tokenization"):
  * scanning a word left to right, at each position take the LONGEST
  * vocabulary piece that matches — word-START pieces at offset 0,
  * CONTINUATION pieces (the `##`-prefixed forms) beyond it. Where no
  * piece matches, this kernel emits one UNK piece for the single
  * character and advances 1 (char-level UNK: deterministic, total, and
  * expressible in the SQL oracle — unlike whole-word UNK, it still
  * meters the rest of the word).
  *
  * Matching is per-word linear-ish: pieces are grouped by start/cont
  * and scanned longest-first (vocabularies are broadcast-scale — tens
  * to tens of thousands of entries; the scan per position is bounded by
  * the piece count, and `maxPieceLen` bounds the substring compare).
  * CodegenFallback like the other variable-length text kernels
  * ([[HammingPairs]] et al.) — the cost is string matching itself, not
  * expression dispatch, and the stage stays a narrow map.
  *
  * Null array -> null; null/empty words contribute 0 pieces.
  */
case class SubwordCounts(
    child: Expression,
    startVocab: Seq[String],
    contVocab: Seq[String]
) extends UnaryExpression
    with CodegenFallback {

  require(startVocab.nonEmpty, "startVocab must not be empty")
  require(
    (startVocab ++ contVocab).forall(p => p.nonEmpty && !p.contains(" ")),
    "vocab pieces must be non-empty and space-free"
  )

  // longest-first so the first match IS the greedy longest match
  @transient private lazy val startSorted: Array[String] =
    startVocab.distinct.sortBy(p => (-p.length, p)).toArray
  @transient private lazy val contSorted: Array[String] =
    contVocab.distinct.sortBy(p => (-p.length, p)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_subword_counts expects array<string>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_subword_counts"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nWords = arr.numElements()
    var pieces = 0
    var unk = 0
    var maxPerWord = 0
    var wi = 0
    while (wi < nWords) {
      if (!arr.isNullAt(wi)) {
        val w = arr.getUTF8String(wi).toString
        var pos = 0
        var wordPieces = 0
        while (pos < w.length) {
          val table = if (pos == 0) startSorted else contSorted
          var matched = -1
          var ti = 0
          while (matched < 0 && ti < table.length) {
            val p = table(ti)
            if (p.length <= w.length - pos && w.startsWith(p, pos)) matched = ti
            ti += 1
          }
          if (matched >= 0) {
            pos += table(matched).length
          } else {
            unk += 1
            pos += 1
          }
          pieces += 1
          wordPieces += 1
        }
        if (wordPieces > maxPerWord) maxPerWord = wordPieces
      }
      wi += 1
    }
    new GenericArrayData(Array(pieces, unk, maxPerWord))
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCounts =
    copy(child = newChild)
}
