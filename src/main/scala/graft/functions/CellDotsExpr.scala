package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native IVF coarse-quantizer kernel: ALL C centroid dot products of
  * one vector in a single compiled double loop.
  *
  *   out[c] = dot(v, cents[c])   (left-to-right, accumulate in double)
  *
  * Why native: the Column form (`array(planeDot(v, c0), ..., planeDot(v,
  * c{C-1}))`) builds C separate graft_dot calls each carrying a dim-wide
  * array literal. At the correctness gate's C=16 that compiles; at the
  * deployment-rule C ~ sqrt(N) it does not — the round-10 sqrt-C
  * artifact measured the C=80 assignment stage at ~15 s PER PASS over a
  * 20k-row corpus (ann_knn_ivf_sqrtc end-to-end 59.7 s vs ivfpq's 9.9 s
  * on the same corpus), the signature of the generated projection
  * blowing Janino's 64 KB method limit and dropping to interpreted
  * evaluation — the same failure mode the LshBuckets kernel fixed for
  * nTables x nPlanes plane dots. One kernel call keeps the stage method
  * small at ANY C, so cell assignment stays inside WholeStageCodegen as
  * the cell count scales with the corpus.
  *
  * Semantics are BIT-IDENTICAL to the Column form (NativeVectorSpec
  * pins it) on non-null input: same multiply order (v[i] * cent[i]),
  * same accumulation order. For v shorter/longer than dim or holding a
  * null element the kernel returns an array of C nulls, matching the
  * Column form (every graft_dot shared v, so each per-centroid dot was
  * null). The ONE divergence is a NULL v itself: the kernel is a
  * null-intolerant UnaryExpression and returns NULL, where the Column
  * form (an array() of C graft_dot calls) returns an array of C nulls —
  * equivalent after the downstream argmax->cell step (both yield a null
  * cell), but not the same shape; NativeVectorSpec pins the kernel's
  * NULL-in/NULL-out directly.
  */
case class CellDots(
    child: Expression,  // v: array<double>
    cents: Seq[Double], // C x dim, row-major per cell
    c: Int,
    dim: Int
) extends UnaryExpression {

  require(c >= 1 && dim >= 1, s"bad cell geometry c=$c dim=$dim")
  require(cents.length == c * dim, s"cents must be c*dim doubles, got ${cents.length}")

  @transient private lazy val centArr: Array[Double] = cents.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_cell_dots expects array<double>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def prettyName: String = "graft_cell_dots"

  override def nullSafeEval(vAny: Any): Any = {
    val arr = vAny.asInstanceOf[ArrayData]
    var bad = arr.numElements() != dim
    if (!bad) {
      var i = 0
      while (!bad && i < dim) { if (arr.isNullAt(i)) bad = true; i += 1 }
    }
    if (bad) return new GenericArrayData(Array.fill[Any](c)(null))
    val out = new Array[Double](c)
    var cc = 0
    while (cc < c) {
      var acc = 0.0
      val off = cc * dim
      var i = 0
      while (i < dim) { acc += arr.getDouble(i) * centArr(off + i); i += 1 }
      out(cc) = acc
      cc += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("ivfCents", centArr, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val bad = ctx.freshName("bad")
        val i   = ctx.freshName("i")
        val cc  = ctx.freshName("cc")
        val j   = ctx.freshName("j")
        val acc = ctx.freshName("acc")
        val out = ctx.freshName("out")
        val off = ctx.freshName("off")
        s"""
           |boolean $bad = $arr.numElements() != $dim;
           |if (!$bad) {
           |  for (int $i = 0; !$bad && $i < $dim; $i++) {
           |    if ($arr.isNullAt($i)) $bad = true;
           |  }
           |}
           |if ($bad) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$c]);
           |} else {
           |  final double[] $out = new double[$c];
           |  for (int $cc = 0; $cc < $c; $cc++) {
           |    double $acc = 0.0;
           |    final int $off = $cc * $dim;
           |    for (int $j = 0; $j < $dim; $j++) {
           |      $acc += $arr.getDouble($j) * $centRef[$off + $j];
           |    }
           |    $out[$cc] = $acc;
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): CellDots =
    copy(child = newChild)
}
