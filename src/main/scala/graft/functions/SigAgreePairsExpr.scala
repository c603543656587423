package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused in-bucket pair expansion + MinHash signature agreement count
  * for the Jaccard-estimation operator.
  *
  * Input: one LSH band bucket as a SORTED array of
  * (id: long, sg: array<long>) structs — each doc's full MinHash
  * signature. Output: every pair (i < j, capped at the first
  * `maxBucket` elements) with the count of agreeing signature
  * positions, as (id_a, id_b, n_match) structs.
  *
  * Unlike [[HammingPairs]]/[[CosinePairs]] there is no filter here —
  * every candidate is output with its estimate — so the win is purely
  * removing the interpreted expansion (slice copy per outer element,
  * lambda dispatch per pair, nHashes element_at pairs per score); the
  * kernel reads each signature once into a local table and scores with
  * a compiled loop. CodegenFallback: eval() runs once per bucket row.
  *
  * n_match values are identical to the compositional per-position
  * `when(element_at = element_at, 1)` sum (ApproxDedupSpec + the
  * unchanged DuckDB oracle pin this). Signatures of unequal length
  * count agreements over the shorter prefix (unreachable on engine
  * data — signatures are fixed-width by construction).
  */
case class SigAgreePairs(child: Expression, maxBucket: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(
    maxBucket > 1 && maxBucket <= IdPairs.MaxBucketLimit,
    s"maxBucket must be in (1, ${IdPairs.MaxBucketLimit}], got $maxBucket"
  )

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 &&
            fields(0).dataType == LongType &&
            fields(1).dataType.isInstanceOf[ArrayType] &&
            fields(1).dataType.asInstanceOf[ArrayType].elementType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sig_agree_pairs expects array<struct<bigint, array<bigint>>>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false),
        StructField("n_match", IntegerType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = true

  override def prettyName: String = "graft_sig_agree_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxBucket)
    val ids = new Array[Long](n)
    val sigs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getArray(1).toLongArray()
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val si = sigs(i)
      var j = i + 1
      while (j < n) {
        val sj = sigs(j)
        val len = math.min(si.length, sj.length)
        var m = 0
        var p = 0
        while (p < len) {
          if (si(p) == sj(p)) m += 1
          p += 1
        }
        out(k) = new GenericInternalRow(Array[Any](ids(i), ids(j), m))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SigAgreePairs =
    copy(child = newChild)
}
