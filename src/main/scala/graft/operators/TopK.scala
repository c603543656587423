package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Algebraic top-k per group — the scale-path alternative to the
  * window-function idiom (`row_number() OVER (PARTITION BY g ORDER BY
  * v) <= k`, used by o2/curation_topk). The window pays a full shuffle
  * of EVERY row into a per-group sort; this typed
  * [[org.apache.spark.sql.expressions.Aggregator]] is algebraic
  * (associative + commutative merge of bounded buffers), so Spark runs
  * it as a partial aggregation: each map task reduces its rows to at
  * most k per group locally, and only those k-row buffers cross the
  * wire. At 100 TB with small k the shuffle shrinks by orders of
  * magnitude — same trick as partial MAX, generalized to "the k best".
  *
  * Ordering is total — (value DESC, id ASC) — so results are
  * deterministic and engine-portable regardless of partitioning or
  * merge order. Buffers stay sorted arrays (insertion into <= k
  * elements beats a heap at the k this is for).
  */
object TopK {
  /** (value, id) pairs; keeps the k largest by (value DESC, id ASC). */
  private final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")

    // better(a, b): a strictly precedes b in the (value DESC, id ASC) order
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(Long, Long)] = Seq.empty

    override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] = {
      if (buf.size == k && !better(in, buf.last)) buf
      else {
        val (pre, post) = buf.span(better(_, in))
        (pre :+ in) ++ post.take(k - pre.size - 1)
      }
    }

    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b.foldLeft(a)(reduce)

    override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Top-k rows per group: one partial-aggregating shuffle on the group
    * keys, then an explode back to scalar rows (group cols, rank
    * 1-based, value, id).
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      idCol: Column,
      k: Int
  ): DataFrame = {
    val topk = udaf(
      new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    )
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(valueCol, idCol).as("__top"))
      .select(
        groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*
      )
      .select(
        groupCols.map(col) ++ Seq(
          (col("__pos") + 1).cast("int").as("rnk"),
          col("__e._1").as("value"),
          col("__e._2").as("id")
        ): _*
      )
  }
}
