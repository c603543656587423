package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native single-pass MinHash signature kernel.
  *
  * Computes, from one `array<long>` of per-shingle base hashes, the full
  * `nHashes`-wide signature `mh_j = min_h (h * A_j + B_j) mod P` in ONE
  * traversal of the array: the Column-level form
  * (`array_min(transform(baseHashes, h -> (h*A_j+B_j) % P))`, once per j
  * in [[graft.operators.ApproxDedup.withMinhashSignature]]) walks the
  * array `nHashes` times through interpreted higher-order expressions —
  * allocating an intermediate re-hash array per seed — while this
  * expression runs a tight two-level loop (elements outer, seeds inner,
  * running mins in a local `long[]`), allocation-free per seed, as
  * generated Java (`doGenCode`) when its input is a materialized column
  * or compiled-Scala `eval` when it collapses into the interpreted
  * base-hash projection.
  *
  * Arithmetic is EXACT long math `(h * a + b) % p` — identical values to
  * the HOF form and to the DuckDB oracle's BIGINT mirror, in any
  * iteration order (min is order-independent), so signatures are
  * bit-identical (MinhashExprSpec pins this).
  *
  * Null semantics match the HOF form on engine data: null input array ->
  * null; null elements are skipped (like `array_min` ignoring nulls); an
  * EMPTY input (or all-null elements) -> null signature array (the HOF
  * form yields per-seed null mins; callers filter empty docs upstream —
  * documented contract, asserted in the spec).
  */
case class MinhashSignature(
    child: Expression,
    aCoef: Seq[Long],
    bCoef: Seq[Long],
    mod: Long
) extends UnaryExpression {

  require(aCoef.length == bCoef.length && aCoef.nonEmpty, "aCoef/bCoef must be same non-zero length")

  // AbstractDataType is private[sql] in Spark 4, so input typing is a
  // manual check; the GraftExtensions builder casts the child to
  // array<bigint> (no-op for long inputs).
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_sig expects array<bigint>, got ${other.simpleString(10)}"
        )
    }

  // Seq fields keep case-class structural equality (Catalyst expression
  // canonicalization); hot loops read the primitive arrays below.
  @transient private lazy val aArr: Array[Long] = aCoef.toArray
  @transient private lazy val bArr: Array[Long] = bCoef.toArray

  private def nHashes: Int = aCoef.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < nHashes) {
          val v = (h * aArr(j) + bArr(j)) % mod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoef", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bCoef", bArr, "long[]")
    nullSafeCodeGen(
      ctx,
      ev,
      arr => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        val mins = ctx.freshName("mins")
        val seen = ctx.freshName("seen")
        s"""
           |final int $n = $arr.numElements();
           |final long[] $mins = new long[$nHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |boolean $seen = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$arr.isNullAt($i)) {
           |    $seen = true;
           |    final long $h = $arr.getLong($i);
           |    for (int $j = 0; $j < $nHashes; $j++) {
           |      final long $v = ($h * $aRef[$j] + $bRef[$j]) % ${mod}L;
           |      if ($v < $mins[$j]) $mins[$j] = $v;
           |    }
           |  }
           |}
           |if (!$seen) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
           |}
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** The engine's shared MinHash affine family: `mh_i(h) = (h*A_i + B_i)
  * mod P`, `P = 2^31 - 1` (Mersenne prime), `h` a 60-bit md5-derived base
  * hash reduced mod P. Products stay < 2^62 — overflow-free in Spark
  * Longs AND ANSI BIGINT, so DuckDB oracles mirror the arithmetic
  * verbatim from these same constants (inlined at SQL-generation time).
  */
object MinhashFamily {
  val Mod = 2147483647L
  def a(i: Int): Long = 2L * i + 3L
  def b(i: Int): Long = 7919L * i + 1L

  /** Column form of the single-pass signature kernel: `array<long>` of
    * `nHashes` mins. Resolves through the session registry
    * ([[GraftExtensions]] must be enabled).
    */
  def signature(baseHashes: org.apache.spark.sql.Column, nHashes: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function(
      "graft_minhash_sig",
      baseHashes,
      org.apache.spark.sql.functions.lit(nHashes)
    )
}
