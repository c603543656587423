package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native BPE tokenization-counting kernel: `array<string>` of words ->
  * `array<int>` of `[n_pieces, n_multi_char_pieces, max_piece_len]`
  * under an ordered merge list ([[graft.operators.Bpe]]-trained).
  *
  * Application contract (identical in the driver reference
  * implementation `Bpe.tokenize` and the SQL oracle's per-rank
  * `replace()` chain): each rule runs ONE left-to-right
  * non-overlapping pass over the symbol sequence, rules in rank order.
  * One pass per rule is a fixpoint — a completed pass cannot create a
  * new (x, y) adjacency for that rule, since the merged symbol differs
  * from both sides.
  *
  * Merge symbols must not contain tab/newline (the literal encoding's
  * separators) — guaranteed for any corpus tokenized on whitespace.
  * Null array -> null; null/empty words contribute nothing.
  */
case class BpeCounts(
    child: Expression,
    merges: Seq[(String, String)]
) extends UnaryExpression
    with CodegenFallback {

  require(
    merges.forall { case (x, y) =>
      x.nonEmpty && y.nonEmpty && !(x + y).exists(c => c == '\t' || c == '\n')
    },
    "merge symbols must be non-empty and tab/newline-free"
  )

  @transient private lazy val rules: Array[(String, String)] = merges.toArray

  // per-distinct-word memo: corpora are Zipf-distributed, so the same few
  // thousand words repeat millions of times per partition — cache the
  // 24-pass merge result per word (the same distinct-word trick the
  // oracle's dw CTE and the trainer's weighted vocab use). Capped so a
  // pathological all-unique corpus cannot grow the map unboundedly.
  // Expressions deserialize per task, so the map is single-threaded.
  private val CacheCap = 1 << 16
  @transient private lazy val memo = new java.util.HashMap[String, Array[Int]]()

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_counts expects array<string>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_bpe_counts"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var pieces = 0
    var multi = 0
    var maxLen = 0
    var wi = 0
    while (wi < arr.numElements()) {
      if (!arr.isNullAt(wi)) {
        val w = arr.getUTF8String(wi).toString
        if (w.nonEmpty) {
          var counts = memo.get(w)
          if (counts == null) {
            var syms: Array[String] = w.map(_.toString).toArray
            var r = 0
            while (r < rules.length) {
              syms = graft.operators.Bpe.applyMerge(syms, rules(r))
              r += 1
            }
            var m = 0
            var ml = 0
            var i = 0
            while (i < syms.length) {
              val len = syms(i).length
              if (len > 1) m += 1
              if (len > ml) ml = len
              i += 1
            }
            counts = Array(syms.length, m, ml)
            if (memo.size < CacheCap) memo.put(w, counts)
          }
          pieces += counts(0)
          multi += counts(1)
          if (counts(2) > maxLen) maxLen = counts(2)
        }
      }
      wi += 1
    }
    new GenericArrayData(Array(pieces, multi, maxLen))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCounts =
    copy(child = newChild)
}
