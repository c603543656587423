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

  /** [[TopKAggregator]] generalized to a total order with two ASC tie
    * keys between the value and the id: (value DESC, t1 ASC, t2 ASC,
    * id ASC). The overlap join's pair budget needs exactly this shape —
    * overlap duration desc, then rStart/rEnd asc, then the right id.
    */
  private final class TopKTiesAggregator(k: Int)
      extends Aggregator[
        (Long, Long, Long, Long),
        Seq[(Long, Long, Long, Long)],
        Seq[(Long, Long, Long, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    private def better(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Boolean =
      a._1 > b._1 ||
        (a._1 == b._1 && (a._2 < b._2 ||
          (a._2 == b._2 && (a._3 < b._3 ||
            (a._3 == b._3 && a._4 < b._4)))))
    override def zero: Seq[(Long, Long, Long, Long)] = Seq.empty
    override def reduce(
        buf: Seq[(Long, Long, Long, Long)],
        in: (Long, Long, Long, Long)): Seq[(Long, Long, Long, Long)] =
      if (buf.size == k && !better(in, buf.last)) buf
      else {
        val (pre, post) = buf.span(better(_, in))
        (pre :+ in) ++ post.take(k - pre.size - 1)
      }
    override def merge(
        a: Seq[(Long, Long, Long, Long)],
        b: Seq[(Long, Long, Long, Long)]): Seq[(Long, Long, Long, Long)] =
      b.foldLeft(a)(reduce)
    override def finish(buf: Seq[(Long, Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Long, Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long, Long)]]()
  }

  /** Top-k per group under the 4-key total order (value DESC, t1 ASC,
    * t2 ASC, id ASC) — the bounded-state alternative to `row_number()
    * OVER (...) <= k` for pair-space inputs. The window idiom SORTS
    * every input row inside each partition before its partial group
    * limit can prune (WindowGroupLimit helps the exchange, not the
    * sort); this aggregator streams rows through a hash aggregate with
    * a <= k-element buffer per group, so cost is one hash probe + a
    * bounded insertion per row — measured 230 s -> 41 s on the sf1
    * capped-overlap pair space (PLANS.md round-9 section).
    *
    * OPERATIONAL CONTRACT: typed Aggregators run on ObjectHashAggregate,
    * whose hash map falls back to SORT-BASED aggregation after
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * DISTINCT GROUPS per partition (default 128 — sized for
    * memory-unbounded buffers like collect_list). This buffer is
    * bounded (k tuples of 4 longs), so the safe threshold is
    * groups-per-partition, not 128; callers on group-rich inputs must
    * raise the conf or the fallback re-introduces the very sort this
    * operator exists to avoid. Scope the raise to the query with
    * `spark.newSession()` (isolated SQLConf, shared context) rather
    * than mutating the live session — see t_interval_overlap_capped.
    *
    * Output: groupCols + rnk (1-based) + value + t1 + t2 + id.
    */
  def perGroupTies(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      tie1: Column,
      tie2: Column,
      idCol: Column,
      k: Int
  ): DataFrame = {
    val topk = udaf(
      new TopKTiesAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    )
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(valueCol, tie1, tie2, idCol).as("__top"))
      .select(
        groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*
      )
      .select(
        groupCols.map(col) ++ Seq(
          (col("__pos") + 1).cast("int").as("rnk"),
          col("__e._1").as("value"),
          col("__e._2").as("t1"),
          col("__e._3").as("t2"),
          col("__e._4").as("id")
        ): _*
      )
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
