package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native multi-table random-hyperplane LSH bucket kernel.
  *
  * Computes ALL `nTables` bucket ids of a vector in one pass: bucket t
  * packs the sign bits of the projections onto that table's `nPlanes`
  * seeded hyperplanes (plane p of table t = `randomPlanes(nPlanes, dim,
  * seed + t)(p)` — byte-identical to [[VectorFunctions.randomPlanes]],
  * which the DuckDB oracle twin also regenerates).
  *
  * The Column-level formulation (`Similarity.lshTopK` pre-r7) built
  * nTables x nPlanes SEPARATE [[DotProduct]] expressions, each carrying
  * its own dim-element literal array. Per-row work was fine, but the
  * PLAN was the cost: Catalyst optimizes and Janino compiles a tree of
  * L*P dot-product loops (64 at the production 8x8 config, 176 at
  * 16x11), and the generated method grows past JIT limits — measured
  * wall time scaled with the EXPRESSION count, not the data
  * (LshTuneMain: 5.9 s at 8 tables, 37.6 s at 16, same 500-row corpus).
  * This kernel is ONE expression with one referenced `double[]` of
  * planes and a three-level tight loop — planning cost is flat in
  * (tables, planes) and the loop JITs.
  *
  * Null semantics (pinned by NativeVectorSpec): a vector of the wrong
  * length or with null elements matches the old Column form — every
  * plane-dot is NULL, whose `>= 0` sign bit is 0 under
  * `when(...).otherwise(0)`, so every table buckets to 0. A NULL input
  * array yields NULL (the old form bucketed null vectors to 0
  * everywhere); in lshTopK a null-vector row therefore DROPS from the
  * candidate generation instead of polluting bucket 0 — the behavior an
  * ANN index wants, and a no-op on real embedding corpora (non-null).
  */
case class LshBuckets(
    child: Expression,
    nTables: Int,
    nPlanes: Int,
    dim: Int,
    seed: Long
) extends UnaryExpression {

  require(nTables >= 1 && nPlanes >= 1 && nPlanes <= 30 && dim >= 1, "bad LSH geometry")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_buckets expects array<double>, got ${other.simpleString(10)}"
        )
    }

  // Derived, not stored: the scalar fields keep case-class equality /
  // canonicalization trivial; the planes are a pure function of them.
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      val planes = VectorFunctions.randomPlanes(nPlanes, dim, seed + t)
      var p = 0
      while (p < nPlanes) {
        System.arraycopy(planes(p), 0, out, (t * nPlanes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Int](nTables)
    if (arr.numElements() == dim) {
      var clean = true
      var i = 0
      while (clean && i < dim) { if (arr.isNullAt(i)) clean = false; i += 1 }
      if (clean) {
        var t = 0
        while (t < nTables) {
          var bits = 0
          var p = 0
          while (p < nPlanes) {
            val off = (t * nPlanes + p) * dim
            var acc = 0.0
            var j = 0
            while (j < dim) { acc += arr.getDouble(j) * flat(off + j); j += 1 }
            if (acc >= 0) bits |= (1 << p)
            p += 1
          }
          out(t) = bits
          t += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val out   = ctx.freshName("out")
        val clean = ctx.freshName("clean")
        val i     = ctx.freshName("i")
        val t     = ctx.freshName("t")
        val p     = ctx.freshName("p")
        val j     = ctx.freshName("j")
        val off   = ctx.freshName("off")
        val acc   = ctx.freshName("acc")
        val bits  = ctx.freshName("bits")
        s"""
           |final int[] $out = new int[$nTables];
           |if ($arr.numElements() == $dim) {
           |  boolean $clean = true;
           |  for (int $i = 0; $clean && $i < $dim; $i++) {
           |    if ($arr.isNullAt($i)) $clean = false;
           |  }
           |  if ($clean) {
           |    for (int $t = 0; $t < $nTables; $t++) {
           |      int $bits = 0;
           |      for (int $p = 0; $p < $nPlanes; $p++) {
           |        final int $off = ($t * $nPlanes + $p) * $dim;
           |        double $acc = 0.0;
           |        for (int $j = 0; $j < $dim; $j++) {
           |          $acc += $arr.getDouble($j) * $planesRef[$off + $j];
           |        }
           |        if ($acc >= 0) $bits |= (1 << $p);
           |      }
           |      $out[$t] = $bits;
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
