package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-bucket id pair expansion: a sorted, duplicate-free
  * `array<long>` of ids -> all unordered (id_a, id_b) pairs with
  * id_a < id_b, truncated to the first `maxBucket` ids — the candidate
  * generator of the LSH-band and prefix-filtered Jaccard operators.
  *
  * Replaces the Column-level `pairsWithin` (nested
  * transform/slice/flatten): interpreted HOFs allocate a slice copy per
  * outer element and dispatch per pair, which dominates wide buckets the
  * same way the pre-[[HammingPairs]] simhash expansion did. This loop is
  * compiled JVM code; CodegenFallback is fine because eval() runs once
  * per bucket row.
  *
  * Output order (i-major over the sorted input) and the sorted-prefix
  * cap are identical to `pairsWithin`, so query results and oracles are
  * unchanged (ApproxDedupSpec pins the cap and ordering).
  */
object IdPairs {
  /** Upper bound on maxBucket: the n*(n-1)/2 output preallocation is an
    * Int, and 65536 ids already mean a 2^31-ish pair array — far past
    * any sane bucket cap. Bounding here turns a would-be
    * NegativeArraySizeException into a clear construction-time error.
    */
  val MaxBucketLimit = 65536
}

case class IdPairs(child: Expression, maxBucket: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(
    maxBucket > 1 && maxBucket <= IdPairs.MaxBucketLimit,
    s"maxBucket must be in (1, ${IdPairs.MaxBucketLimit}], got $maxBucket"
  )

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_id_pairs expects array<bigint>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = true

  override def prettyName: String = "graft_id_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxBucket)
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](ids(i), ids(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): IdPairs =
    copy(child = newChild)
}
