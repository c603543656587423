package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused in-bucket pair expansion + cosine verification for the
  * hyperplane-LSH embedding near-dup operator.
  *
  * Input: one LSH bucket as a SORTED array of
  * (id: long, vn: (v: array<double>, n: double)) structs — each row's
  * pre-cast vector and precomputed norm. Output: only the pairs
  * (i < j, capped at the first `maxBucket` elements) whose cosine
  * similarity is >= `threshold`, as (id_a, id_b, cos) structs.
  *
  * WHY fused (same argument as [[HammingPairs]]): the compositional
  * `explode(pairsOfStructs(xs)) -> cos filter` materializes every
  * candidate pair as an interpreted struct CARRYING BOTH FULL VECTORS
  * before the filter runs — quadratic in bucket width in both
  * allocations and copied payload, while survivors are sparse. This
  * kernel reads each vector once into a local table and runs the
  * B^2/2 dot products as compiled JVM code, allocating only for
  * survivors. CodegenFallback: eval() runs once per bucket row.
  *
  * Arithmetic is BIT-IDENTICAL to the compositional form:
  * dot accumulates left-to-right in double (same order as
  * [[DotProduct]]), cos = dot / (n_a * n_b), and the `>= threshold`
  * compare is the same IEEE compare — so query results and the DuckDB
  * oracle are unchanged (ApproxDedupSpec + the oracle pin this).
  * Pairs with mismatched vector lengths are skipped (the HOF form's
  * null cos fails the threshold filter the same way).
  */
case class CosinePairs(child: Expression, threshold: Double, maxBucket: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 &&
            fields(0).dataType == LongType &&
            (fields(1).dataType match {
              case StructType(inner) =>
                // containsNull of the vector array is schema-dependent
                // (parquet lists default to nullable elements); engine
                // vectors never carry null elements — documented contract
                inner.length == 2 &&
                inner(0).dataType.isInstanceOf[ArrayType] &&
                inner(0).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
                inner(1).dataType == DoubleType
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cosine_pairs expects array<struct<bigint, struct<array<double>, double>>>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false),
        StructField("cos", DoubleType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxBucket)
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val vn = row.getStruct(1, 2)
      vecs(i) = vn.getArray(0).toDoubleArray()
      norms(i) = vn.getDouble(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
    while (i < n) {
      val vi = vecs(i)
      var j = i + 1
      while (j < n) {
        val vj = vecs(j)
        if (vi.length == vj.length) {
          var acc = 0.0
          var k = 0
          while (k < vi.length) { acc += vi(k) * vj(k); k += 1 }
          val cos = acc / (norms(i) * norms(j))
          if (cos >= threshold) {
            out += new GenericInternalRow(Array[Any](ids(i), ids(j), cos))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CosinePairs =
    copy(child = newChild)
}
