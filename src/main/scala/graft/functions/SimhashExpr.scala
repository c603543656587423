package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native single-pass SimHash kernel.
  *
  * Computes the `nBits`-bit SimHash of one `array<long>` of per-token
  * hashes in ONE traversal: bit b of the result is set iff
  * `sum over tokens of (+1 if hash bit b set else -1) > 0`.
  *
  * The Column-level form ([[graft.operators.ApproxDedup.simhash]]) runs
  * one `aggregate` higher-order function PER BIT — `nBits` interpreted
  * walks of the token-hash array, each element evaluating a
  * when/shiftright/bitwiseAND subtree through lambda variables, and every
  * HOF is CodegenFallback so the whole projection drops out of
  * whole-stage codegen. This expression keeps one `long[nBits]` counter
  * array and reads each element once (`doGenCode` emits the tight Java
  * two-level loop), then assembles the signature from the counter signs.
  *
  * Values are BIT-IDENTICAL to the HOF form on non-null arrays
  * (SimhashExprSpec pins this): the counter sum is order-independent, and
  * the per-bit test `((h >> b) & 1) == 1` is the same arithmetic
  * shiftright the Column form uses. A NULL ELEMENT contributes -1 to
  * every bit (in the HOF the null-valued condition falls through to
  * `.otherwise(-1L)`); an empty array -> all counters 0 -> signature 0.
  * ONE deliberate divergence: a null INPUT ARRAY yields null here, where
  * the HOF form's `.otherwise(0)` silently collapses it to signature 0 —
  * a missing document has no signature. Corpus text is non-null so query
  * outputs are unaffected, and the DuckDB oracle (which drops null-text
  * docs at unnest) is unchanged.
  */
case class SimhashBits(child: Expression, nBits: Int) extends UnaryExpression {

  require(nBits > 0 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_simhash expects array<bigint>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Long](nBits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < nBits) { counters(b) -= 1L; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < nBits) {
          counters(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (counters(b) > 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val counters = ctx.freshName("counters")
        val sig = ctx.freshName("sig")
        s"""
           |final int $n = $arr.numElements();
           |final long[] $counters = new long[$nBits];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($arr.isNullAt($i)) {
           |    for (int $b = 0; $b < $nBits; $b++) { $counters[$b] -= 1L; }
           |  } else {
           |    final long $h = $arr.getLong($i);
           |    for (int $b = 0; $b < $nBits; $b++) {
           |      $counters[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
           |    }
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < $nBits; $b++) {
           |  if ($counters[$b] > 0L) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
           |""".stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}
