package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native per-subspace PQ score-table kernel.
  *
  * For one subspace (subvector `vn[offset .. offset+sub)`), computes the
  * `ksub`-wide score array
  *
  *   score[c] = dot(vn_sub, book[c])  [- ccd[c][cell]]  [- half[c]]
  *
  * in EXACTLY that left-to-right IEEE order — the same values as the
  * Column formulation it replaces (`planeDot(slice(vn,...), cv) -
  * element_at(ccdLit, cell+1) - lit(halfNorm)`) and as the DuckDB
  * oracle, so codes and ADC scores stay bit-identical.
  *
  * Why native: the Column form built m x ksub separate
  * slice+graft_dot+element_at expressions (256 at the production
  * 16x16 config), and the generated stage method blew Janino's 64 KB
  * bytecode limit — Spark logged "Failed to compile the generated Java
  * code" and silently ran the PQ encode/ADC stages INTERPRETED. As m
  * compact kernel calls per row the method stays small and JITs.
  *
  * The optional terms cover all three call sites:
  *   - raw PQ codes:      ccd empty, half = per-code ||cv||^2/2
  *   - residual codes:    ccd = per-(code, cell) centroid-dot table
  *                        (subtracted FIRST, matching the original
  *                        order dot - ccd - half), half as above
  *   - query ADC LUTs:    ccd and half both empty (plain dots)
  *
  * Degenerate inputs mirror the Column form: vn or cell NULL -> null;
  * a null element in the used subrange, a too-short vn (the slice/dot
  * length mismatch), or an out-of-range cell (element_at past the ccd
  * literal) each made that score NULL -> here every affected score is
  * null.
  */
case class PqScores(
    left: Expression,  // vn: array<double>
    right: Expression, // cell: int (ignored when ccd is empty)
    book: Seq[Double], // ksub x sub, row-major per code
    ccd: Seq[Double],  // ksub x nCells (empty = no term)
    half: Seq[Double], // ksub (empty = no term)
    offset: Int,       // subspace start within vn
    sub: Int,
    ksub: Int
) extends BinaryExpression {

  require(sub >= 1 && ksub >= 1 && offset >= 0, "bad PQ geometry")
  require(book.length == ksub * sub, s"book must be ksub*sub doubles, got ${book.length}")
  require(ccd.isEmpty || ccd.length % ksub == 0, "ccd must be ksub*nCells doubles")
  require(half.isEmpty || half.length == ksub, "half must be ksub doubles")

  @transient private lazy val bookArr: Array[Double] = book.toArray
  @transient private lazy val ccdArr: Array[Double]  = ccd.toArray
  @transient private lazy val halfArr: Array[Double] = half.toArray

  private def nCells: Int = if (ccd.isEmpty) 0 else ccd.length / ksub

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_scores expects (array<double>, int), got (${l.simpleString(10)}, ${r.simpleString(10)})"
        )
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def prettyName: String = "graft_pq_scores"

  override def nullSafeEval(vnAny: Any, cellAny: Any): Any = {
    val arr  = vnAny.asInstanceOf[ArrayData]
    val cell = cellAny.asInstanceOf[Int]
    val n    = arr.numElements()
    // whole subrange unusable -> all scores null (dot over a short or
    // null-holding slice was null in the Column form)
    var bad = n < offset + sub
    if (!bad) {
      var i = 0
      while (!bad && i < sub) { if (arr.isNullAt(offset + i)) bad = true; i += 1 }
    }
    if (!bad && ccdArr.length > 0 && (cell < 0 || cell >= nCells)) bad = true
    if (bad) return new GenericArrayData(Array.fill[Any](ksub)(null))
    val out = new Array[Double](ksub)
    var c = 0
    while (c < ksub) {
      var acc = 0.0
      val boff = c * sub
      var i = 0
      while (i < sub) { acc += arr.getDouble(offset + i) * bookArr(boff + i); i += 1 }
      if (ccdArr.length > 0) acc -= ccdArr(c * nCells + cell)
      if (halfArr.length > 0) acc -= halfArr(c)
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", bookArr, "double[]")
    val ccdRef  = if (ccd.nonEmpty) ctx.addReferenceObj("pqCcd", ccdArr, "double[]") else "null"
    val halfRef = if (half.nonEmpty) ctx.addReferenceObj("pqHalf", halfArr, "double[]") else "null"
    nullSafeCodeGen(
      ctx,
      ev,
      (arr, cell) => {
        val n    = ctx.freshName("n")
        val bad  = ctx.freshName("bad")
        val i    = ctx.freshName("i")
        val c    = ctx.freshName("c")
        val j    = ctx.freshName("j")
        val acc  = ctx.freshName("acc")
        val out  = ctx.freshName("out")
        val boff = ctx.freshName("boff")
        val ccdTerm  = if (ccd.nonEmpty) s"$acc -= $ccdRef[$c * $nCells + $cell];" else ""
        val halfTerm = if (half.nonEmpty) s"$acc -= $halfRef[$c];" else ""
        val cellCheck =
          if (ccd.nonEmpty) s"if (!$bad && ($cell < 0 || $cell >= $nCells)) $bad = true;" else ""
        s"""
           |final int $n = $arr.numElements();
           |boolean $bad = $n < ${offset + sub};
           |if (!$bad) {
           |  for (int $i = 0; !$bad && $i < $sub; $i++) {
           |    if ($arr.isNullAt($offset + $i)) $bad = true;
           |  }
           |}
           |$cellCheck
           |if ($bad) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$ksub]);
           |} else {
           |  final double[] $out = new double[$ksub];
           |  for (int $c = 0; $c < $ksub; $c++) {
           |    double $acc = 0.0;
           |    final int $boff = $c * $sub;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      $acc += $arr.getDouble($offset + $j) * $bookRef[$boff + $j];
           |    }
           |    $ccdTerm
           |    $halfTerm
           |    $out[$c] = $acc;
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): PqScores = copy(left = newLeft, right = newRight)
}
