package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused in-bucket pair expansion + Hamming verification for the banded
  * SimHash near-dup operator.
  *
  * Input: one LSH band bucket as a SORTED array of (id: long, sh: long)
  * structs. Output: only the pairs (i < j, capped at the first
  * `maxBucket` elements) whose Hamming distance over the low `nBits`
  * signature bits is <= `maxHamming`, as (id_a, id_b, hamming) structs.
  *
  * WHY fused: the compositional form —
  * `explode(pairsOfStructs(xs)) -> bitSum filter` — materializes every
  * candidate pair as an interpreted struct allocation before the filter
  * sees it. Candidate volume is quadratic in bucket width while
  * survivors are sparse (sf0.1: ~1M candidates -> 3.3k pairs), so the
  * expansion dominated the whole query (~57 of 60 s measured). This
  * kernel runs the B^2/2 loop as compiled JVM code with ONE
  * `Long.bitCount` per candidate and allocates only for survivors.
  *
  * CodegenFallback is deliberate: eval() is called once per BUCKET (few
  * rows), and the loop inside is already tight compiled code — losing
  * whole-stage codegen on the surrounding (tiny) projection is noise
  * next to removing ~1M interpreted allocations per bucket batch.
  *
  * Values are identical to the compositional form (ApproxDedupSpec +
  * the unchanged DuckDB oracle pin this): same sorted-prefix cap, same
  * i<j orientation over the id-sorted array, and
  * `Long.bitCount(xor & mask)` equals the bitSum popcount over the low
  * nBits.
  */
case class HammingPairs(child: Expression, nBits: Int, maxHamming: Int, maxBucket: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(nBits > 0 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
  require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
  require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")

  private val mask: Long = if (nBits == 63) -1L >>> 1 else (1L << nBits) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_hamming_pairs expects array<struct<bigint,bigint>>, got ${other.simpleString(10)}"
        )
    }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false),
        StructField("hamming", IntegerType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def nullable: Boolean = true

  override def prettyName: String = "graft_hamming_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), maxBucket)
    val ids = new Array[Long](n)
    val shs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      shs(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount((shs(i) ^ shs(j)) & mask)
        if (h <= maxHamming) {
          out += new GenericInternalRow(
            Array[Any](ids(i), ids(j), h)
          )
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): HammingPairs =
    copy(child = newChild)
}
