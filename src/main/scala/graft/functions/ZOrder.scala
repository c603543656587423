package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve clustering — the write-time data-layout tool
  * for multi-dimensional scan pruning at 100 TB. Sorting files by the
  * interleaved-bit curve keeps BOTH dimensions' min/max ranges tight
  * per file, so a predicate on either dimension prunes file-level
  * statistics (parquet row-group / file skipping), where a plain sort
  * only prunes its leading column.
  *
  * `zValue` is a pure codegen'd column expression (shifts, masks,
  * adds — no UDF): bit i of x lands at curve bit 2i, bit i of y at
  * 2i+1. The exact tiling property — `z div 4^k` enumerates aligned
  * 2^k × 2^k squares — is what the spec and the oracle assert, not a
  * statistical locality claim.
  */
object ZOrder {
  /** Interleave the low `bits` bits of two non-negative columns.
    * Values must fit in `bits` bits (mask/mod them first) — higher bits
    * would alias onto the same curve positions.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits)
      .map { i =>
        shiftright(x, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)) +
          shiftright(y, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))
      }
      .reduce(_ + _)
  }

  /** The matching DuckDB/ANSI SQL expression, generated from the same
    * loop so the two sides cannot drift.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits)
      .map { i =>
        s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
      }
      .mkString(" + ")

  /** Write-time clustering: range-partition by the curve value and sort
    * within partitions, so downstream `.write` produces files whose
    * per-file min/max stats are tight in both dimensions. The curve
    * column is kept (callers drop it after write if unwanted).
    */
  def clusterByZ(
      df: DataFrame,
      x: Column,
      y: Column,
      bits: Int,
      numPartitions: Int
  ): DataFrame =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
}
