package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native unit-normalization kernel: v / sqrt(dot(v, v)) in one pass.
  *
  * Replaces the Column-level staging in `Pq.withNormalized`
  * (withColumn __vd -> __nrm -> transform lambda): Catalyst's projection
  * collapse re-inlined that lambda into EVERY consumer — the IVF cell
  * assignment references the normalized vector once per centroid, so the
  * plan carried 16 copies of a
  * `transform(..., CASE WHEN SQRT(graft_dot(transform(...))) ...)` tree
  * and the generated sort-stage method blew past Janino's 64 KB bytecode
  * limit (4x "Failed to compile" fallbacks per full Verify run, whole
  * stages silently interpreted). As a single compact call the
  * per-centroid duplicates are each one function invocation; codegen
  * stays under the limit and the stage JITs.
  *
  * Arithmetic is BIT-IDENTICAL to the staged form and the DuckDB oracle
  * twin (`list_transform(v, x -> x / sqrt(list_dot_product(v, v)))`):
  * accumulate dot left-to-right in double, one IEEE sqrt, one IEEE
  * divide per element. Degenerate inputs mirror the old Column
  * semantics exactly (pinned in NativeVectorSpec): all-zero vector ->
  * all-zero output (0/0 would be NaN and NaN ordering is
  * engine-dependent); a null element makes the norm NULL, so EVERY
  * output element is null (x / NULL); null input array -> null.
  */
case class UnitNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_unit expects array<double>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def prettyName: String = "graft_unit"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    var acc = 0.0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true else { val x = arr.getDouble(i); acc += x * x }
      i += 1
    }
    if (hasNull) return new GenericArrayData(Array.fill[Any](n)(null))
    val nrm = math.sqrt(acc)
    val out = new Array[Double](n)
    if (nrm != 0.0) {
      var j = 0
      while (j < n) { out(j) = arr.getDouble(j) / nrm; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val n       = ctx.freshName("n")
        val i       = ctx.freshName("i")
        val j       = ctx.freshName("j")
        val acc     = ctx.freshName("acc")
        val nrm     = ctx.freshName("nrm")
        val out     = ctx.freshName("out")
        val hasNull = ctx.freshName("hasNull")
        s"""
           |final int $n = $arr.numElements();
           |boolean $hasNull = false;
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($arr.isNullAt($i)) { $hasNull = true; }
           |  else { final double __x = $arr.getDouble($i); $acc += __x * __x; }
           |}
           |if ($hasNull) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$n]);
           |} else {
           |  final double $nrm = java.lang.Math.sqrt($acc);
           |  final double[] $out = new double[$n];
           |  if ($nrm != 0.0) {
           |    for (int $j = 0; $j < $n; $j++) { $out[$j] = $arr.getDouble($j) / $nrm; }
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
           |""".stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): UnitNormalize =
    copy(child = newChild)
}
