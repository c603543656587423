package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join without a cross product.
  *
  * Spark has no native range-join operator: `a JOIN b ON b.ts BETWEEN
  * a.lo AND a.hi` plans as BroadcastNestedLoopJoin (quadratic) the
  * moment the equi-key is missing. The scalable shape is the classic
  * time-bucket decomposition: explode every interval into the
  * fixed-width buckets it covers, map every probe to its single bucket,
  * equi-join on the bucket id (a plain shuffled hash join), then apply
  * the exact containment predicate. Because a probe lands in EXACTLY
  * one bucket, a (interval, probe) pair can meet in at most one bucket
  * — the output needs no distinct pass.
  *
  * Cost model: interval side inflates by `ceil(span / bucket)` rows, so
  * pick `bucketSeconds` near the typical interval span — wide enough
  * that intervals explode into a handful of buckets, narrow enough that
  * one bucket's probe population stays a fraction of the corpus. At
  * 100 TB both sides remain hash-partitioned on the bucket id; a hot
  * bucket (burst hour) is an AQE-skew-split candidate, same remedy as
  * any hot join key.
  *
  * Reference behavior generalized: the reference's historic-snapshot
  * probe is a point-in-time containment test per record
  * (`ETL/DB_Lookup.py:24-54`, validity window `CSD_START_DATE ..
  * CSD_END_DATE`); this operator is that containment join expressed at
  * event-log scale.
  */
object RangeJoin {
  /** Containment COUNT via sweep/prefix-sum — the scale-safe plan for
    * count-shaped consumers of an interval-containment join.
    *
    * [[bucketedContainJoin]] materializes every (interval, probe) pair
    * before aggregating; when the consumer only wants per-interval
    * COUNTS, that pair space (which grows ~100x at 10x event density)
    * is pure waste. The sweep formulation never builds it:
    *
    *   count(ts in [a, b]) = cum(b, inclusive) - cum(a, exclusive)
    *
    * where `cum` is the running count of probes in timestamp order.
    * Each interval emits two boundary markers (sign -1 at `a`, +1 at
    * `b`); markers and probes are unioned into one stream, a single
    * window computes the running probe count, and each interval's
    * count is the signed sum of its two markers' cumulative values —
    * one union, ONE window pass, one final agg. No join operator
    * anywhere in the plan (TemporalOpsSpec pins this), no pair space,
    * O(n log n) in probes + intervals.
    *
    * Boundary semantics (closed interval): the window orders by
    * `(ts, rank)` with start markers at rank 0, probes at rank 1, end
    * markers at rank 2, and Spark's default RANGE frame gives every
    * peer group the same cumulative value — so a start marker at `a`
    * sees strictly-before-`a` probes and an end marker at `b` includes
    * the probes AT `b`. Ties are therefore deterministic by
    * construction, not by arbitrary row order.
    *
    * Distribution contract: the window partitions by `epoch(ts)`, a
    * caller-supplied coarse time bucket, and BOTH of an interval's
    * boundaries must land in the same epoch (daily activity spans with
    * day epochs, hourly sessions with hour epochs, …). Within one
    * epoch the prior-epoch probe count is a constant that CANCELS in
    * `cum(b) - cum(a)`, which is what makes the per-epoch window exact
    * without any cross-epoch carry. Epoch width tunes parallelism the
    * same way bucketSeconds does for the joins: one epoch's traffic
    * must fit a partition's sort. Intervals that genuinely span epochs
    * need the cross-epoch carry (a prefix sum over the tiny per-epoch
    * histogram broadcast back) or [[bucketedContainJoin]] — this
    * operator `require`s the contract instead of silently miscounting
    * (checked lazily inside the plan, failing the query not the
    * driver).
    *
    * Exclusion predicates (e.g. "events of OTHER users") don't fit a
    * sweep directly; decompose as total-in-span minus own-in-span —
    * the caller usually has own-counts for free from the span
    * aggregation itself (see t_interval_count_sweep).
    *
    * @param intervals one row per interval; `keyCols` must identify it
    * @param probes    rows whose `tsCol` is counted
    * @param keyCols   interval identity columns, carried to the output
    * @param epoch     maps a timestamp column to its epoch id; must
    *                  agree between an interval's two boundaries
    * @return intervals' keyCols + `n_in_span` (count of probes with
    *         startCol <= ts <= endCol)
    */
  def sweepContainCount(
      intervals: DataFrame,
      probes: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      keyCols: Seq[String],
      epoch: Column => Column
  ): DataFrame = {
    // fail loudly (executor-side, data-dependent) if an interval
    // crosses epochs — the per-epoch window would silently undercount.
    // The guard rides the marker's SIGN, which the final aggregate
    // always evaluates, so it cannot be optimized away.
    def guardedSign(sign: Long) = when(
      epoch(col(startCol)) =!= epoch(col(endCol)),
      raise_error(concat(
        lit("sweepContainCount: interval crosses epochs: "),
        col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string")))
        .cast("long")
    ).otherwise(lit(sign))
    def marker(boundary: String, rank: Int, sign: Long) = intervals
      .select(
        (keyCols.map(col) :+
          col(boundary).as("__ts") :+
          lit(rank).as("__rk") :+
          lit(0L).as("__c") :+
          guardedSign(sign).as("__sign")): _*)
    val probeRows = probes.select(
      (keyCols.map(k => lit(null).cast(intervals.schema(k).dataType).as(k)) :+
        col(tsCol).as("__ts") :+
        lit(1).as("__rk") :+
        lit(1L).as("__c") :+
        lit(0L).as("__sign")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(epoch(col("__ts")))
      .orderBy(col("__ts").asc, col("__rk").asc)
    probeRows
      .unionByName(marker(startCol, 0, -1L))
      .unionByName(marker(endCol, 2, 1L))
      .withColumn("__cum", sum(col("__c")).over(w))
      .where(col("__sign") =!= 0L)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign") * col("__cum")).as("n_in_span"))
  }

  /** [[sweepContainCount]] without the same-epoch restriction: intervals
    * may span any number of epochs.
    *
    * The per-epoch window still computes LOCAL running counts; a
    * per-epoch prefix-offset table (one row per epoch: probes in all
    * EARLIER epochs) globalizes each boundary marker's cumulative value
    * as `global = offset(epoch) + local`, and the signed difference of
    * two global cums is exact regardless of which epochs the two
    * boundaries fall in. The offset table is |epochs| rows — it gets a
    * single-partition window (bounded data, same pattern as
    * perplexityBuckets' histogram) and BROADCAST-joins onto the marker
    * rows only, so the count path gains one tiny broadcast join and
    * nothing corpus-sized ever joins or sorts globally. Requires
    * `epoch` to be MONOTONE in the timestamp (any truncation is).
    *
    * Use [[sweepContainCount]] when intervals provably fit one epoch —
    * it stays entirely join-free; this variant is the general form.
    */
  def sweepContainCountGlobal(
      intervals: DataFrame,
      probes: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      keyCols: Seq[String],
      epoch: Column => Column
  ): DataFrame = {
    def marker(boundary: String, rank: Int, sign: Long) = intervals
      .select(
        (keyCols.map(col) :+
          col(boundary).as("__ts") :+
          lit(rank).as("__rk") :+
          lit(0L).as("__c") :+
          lit(sign).as("__sign")): _*)
    val probeRows = probes.select(
      (keyCols.map(k => lit(null).cast(intervals.schema(k).dataType).as(k)) :+
        col(tsCol).as("__ts") :+
        lit(1).as("__rk") :+
        lit(1L).as("__c") :+
        lit(0L).as("__sign")): _*)
    val u = probeRows
      .unionByName(marker(startCol, 0, -1L))
      .unionByName(marker(endCol, 2, 1L))
    // per-epoch probe totals -> exclusive prefix offsets, enumerated
    // over the UNION's epochs (markers contribute __c = 0), so a marker
    // in a probe-free epoch still finds its prefix row. |epochs| rows:
    // the unpartitioned prefix window runs over bounded data by
    // construction (one row per epoch, never per record). Its WindowExec
    // no-partition warning is structural: Spark 4's
    // EliminateWindowPartitions folds any constant partition key away
    // (round-15 audit), so the warning cannot be silenced without a
    // real key — and none exists for a global prefix sum.
    val offsets = u
      .groupBy(epoch(col("__ts")).as("__ep"))
      .agg(sum(col("__c")).as("__n"))
      .withColumn(
        "__pfx",
        coalesce(
          sum(col("__n")).over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("__ep").asc)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__ep"), col("__pfx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(epoch(col("__ts")))
      .orderBy(col("__ts").asc, col("__rk").asc)
    u
      .withColumn("__cum", sum(col("__c")).over(w))
      .where(col("__sign") =!= 0L)
      .withColumn("__ep", epoch(col("__ts")))
      .join(broadcast(offsets), Seq("__ep"))
      .withColumn("__global", col("__pfx") + col("__cum"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign") * col("__global")).as("n_in_span"))
  }

  /** Containment join: rows of `intervals` paired with rows of
    * `probes` whose `tsCol` lies in `[startCol, endCol]` (closed) and
    * that satisfy `extraPred`. Column names must be disjoint across the
    * two inputs (the join emits both sides).
    *
    * `joinType = "left"` keeps zero-match intervals: the exploded
    * interval side is left-joined, so an interval surfaces once per
    * covered bucket with NULL probe columns — aggregate with
    * `count(<probe col>)` (null-skipping) to get per-interval match
    * counts without a second evaluation of the interval pipeline.
    */
  def bucketedContainJoin(
      intervals: DataFrame,
      probes: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketSeconds: Long,
      extraPred: Column = lit(true),
      joinType: String = "inner",
      shufflePartitions: Int = 0
  ): DataFrame = {
    val b = bucketSeconds * 1000000L // bucket width in microseconds
    // Shuffle width: like [[bucketedOverlapJoin]], the bucket-id
    // exchange carries the EXPLODED interval side (input × ceil(span/
    // bucket)) and the join output is pair-bound — both steeper than
    // linear in input bytes, so `shufflePartitions = 0` (default) sizes
    // the exchange from both inputs' leaf stats at 128 KiB granularity
    // instead of the session default.
    val width =
      if (shufflePartitions > 0) shufflePartitions
      else
        math.max(
          graft.plans.InputSizing.widthFor(intervals, bytesPerPartition = 128L << 10),
          graft.plans.InputSizing.widthFor(probes, bytesPerPartition = 128L << 10)
        )
    // `div` keeps the arithmetic in exact 64-bit integers (a double
    // round-trip would be exact below 2^53 but div is exact always).
    val iv = intervals
      .withColumn("__bk", explode(sequence(
        expr(s"unix_micros($startCol) div ${b}L"),
        expr(s"unix_micros($endCol) div ${b}L")
      )))
      .repartition(width, col("__bk"))
    val pr = probes
      .withColumn("__bk", expr(s"unix_micros($tsCol) div ${b}L"))
      .repartition(width, col("__bk"))
    iv.join(
        pr,
        iv("__bk") === pr("__bk") &&
          col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol) &&
          extraPred,
        joinType
      )
      .drop("__bk")
  }

  /** Interval-OVERLAP join — the general (interval x interval) case of
    * [[bucketedContainJoin]]: pairs of rows whose closed intervals
    * `[lStart, lEnd]` and `[rStart, rEnd]` intersect
    * (`max(starts) <= min(ends)`), without a cross product.
    *
    * Both sides explode onto fixed-width buckets and equi-join on the
    * bucket id. Unlike the containment case, a pair can now meet in
    * MANY buckets (every bucket both intervals cover) — the classic
    * fix-up is a distinct pass over the output, which re-shuffles every
    * result row. This instead assigns each pair to ONE canonical
    * bucket: the bucket of `max(starts)`, the later interval's start.
    * When the intervals overlap, `max(starts) <= min(ends)`, so that
    * bucket lies in BOTH intervals' bucket ranges — the pair meets
    * there exactly once, and the predicate
    * `bucket == floor(max(starts) / width)` keeps it nowhere else. No
    * distinct, no second shuffle.
    *
    * Cost model: each side inflates by `ceil(span / bucket)`; candidate
    * pairs per bucket are |left-in-bucket| x |right-in-bucket|, so pick
    * `bucketSeconds` near the typical span, and a burst bucket is an
    * AQE-skew-split candidate. Column names must be disjoint across the
    * two inputs (the join emits both sides).
    *
    * PAIR-BUDGET CONTRACT: the raw output is worst-case quadratic in
    * the per-bucket populations — at 100 TB a consumer never wants the
    * unbounded pair list. Downstream must either AGGREGATE the pairs
    * (the shipped t_interval_overlap_join query reduces straight to
    * per-user totals) or CAP them via `maxPairsPerLeft`: keep only the
    * top-N right matches per left interval, ranked by overlap duration
    * descending (ties broken by `rStart` asc then `rEnd` asc — pass
    * more specific right-side keys through `extraPred` filtering if
    * the tie set can exceed it). The cap runs as ONE window over the
    * join output hash-partitioned by the left interval's identity
    * `(lStart, lEnd, pairBudgetKeys…)` — bounded per-group state, no
    * global sort.
    *
    * Shuffle width: the bucket-id exchange carries the exploded,
    * pre-pair intermediate; `shufflePartitions = 0` (default) sizes it
    * from both inputs' leaf stats ([[graft.plans.InputSizing]] — the
    * triangle-wedge mechanism) instead of the session default, which
    * under-partitions exactly when the pair space blows up.
    */
  def bucketedOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketSeconds: Long,
      extraPred: Column = lit(true),
      shufflePartitions: Int = 0,
      maxPairsPerLeft: Int = 0,
      pairBudgetKeys: Seq[String] = Nil,
      pairBudgetTieKeys: Seq[String] = Nil
  ): DataFrame = {
    val b = bucketSeconds * 1000000L
    // 128 KiB granularity: the exploded bucket rows multiply the input
    // by ceil(span/bucket) and the join's per-bucket pair space is a
    // product — steeper-than-linear in input bytes, so the width must
    // outgrow the session default well before the wedge join's 1 MiB
    // heuristic would
    val width =
      if (shufflePartitions > 0) shufflePartitions
      else
        math.max(
          graft.plans.InputSizing.widthFor(left, bytesPerPartition = 128L << 10),
          graft.plans.InputSizing.widthFor(right, bytesPerPartition = 128L << 10)
        )
    val l = left
      .withColumn(
        "__bka",
        explode(sequence(
          expr(s"unix_micros($lStart) div ${b}L"),
          expr(s"unix_micros($lEnd) div ${b}L")
        ))
      )
      .repartition(width, col("__bka"))
    val r = right
      .withColumn(
        "__bkb",
        explode(sequence(
          expr(s"unix_micros($rStart) div ${b}L"),
          expr(s"unix_micros($rEnd) div ${b}L")
        ))
      )
      .repartition(width, col("__bkb"))
    val joined = l
      .join(
        r,
        col("__bka") === col("__bkb") &&
          // canonical-bucket filter: count the pair only where the
          // later-starting interval begins (in-bucket, non-equi — the
          // planner keeps __bka = __bkb as the shuffle key)
          col("__bka") === greatest(
            expr(s"unix_micros($lStart) div ${b}L"),
            expr(s"unix_micros($rStart) div ${b}L")
          ) &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          extraPred,
        "inner"
      )
      .drop("__bka", "__bkb")
    if (maxPairsPerLeft <= 0) joined
    else {
      // `pairBudgetTieKeys` (right-side id columns, ASC) extend the order
      // to a TOTAL one: without them, right rows tying on all of
      // (overlap, rStart, rEnd) are kept nondeterministically, and this
      // path can diverge from bucketedOverlapTopK/TopK.perGroupTies'
      // 4-key order on exact ties
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((Seq(lStart, lEnd) ++ pairBudgetKeys).map(col): _*)
        .orderBy(
          Seq(
            (expr(s"unix_micros(least($lEnd, $rEnd))") -
              expr(s"unix_micros(greatest($lStart, $rStart))")).desc,
            col(rStart).asc,
            col(rEnd).asc
          ) ++ pairBudgetTieKeys.map(col(_).asc): _*
        )
      joined
        .withColumn("__pr", row_number().over(w))
        .where(col("__pr") <= maxPairsPerLeft)
        .drop("__pr")
    }
  }

  /** Pair-budgeted overlap TOP-K as a bounded-state AGGREGATION — the
    * scale path for `maxPairsPerLeft` consumers that don't need the
    * full joined row back.
    *
    * The window form above must SORT the whole materialized pair space
    * inside each partition before Spark's WindowGroupLimit can prune
    * (the partial group-limit bounds what crosses the exchange, not the
    * local sort) — measured 230 s at sf1 vs 13.5 s for the plain
    * aggregated overlap join, and wider exchanges don't help (170 s at
    * 64x width: the sort volume IS the cost). This variant never sorts:
    * pairs stream out of the bucket join straight into a hash aggregate
    * whose per-group state is a <= k-element buffer
    * ([[TopK.perGroupTies]], order (overlap DESC, rStart ASC, rEnd ASC,
    * rId ASC) — a total order, so the kept set is deterministic).
    * Measured 41 s on the same sf1 workload (PLANS.md round 9).
    *
    * See [[TopK.perGroupTies]] for the ObjectHashAggregate fallback
    * contract (raise `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` via an isolated `newSession` on group-rich
    * inputs — this buffer is bounded, the 128 default is sized for
    * unbounded collect buffers).
    *
    * @param leftKeys columns identifying the left interval (carried to
    *                 the output; must functionally determine
    *                 `(lStart, lEnd)`)
    * @param rIdCol   LONG column identifying the right interval
    * @return leftKeys + rnk (1-based) + ov_us + r_start_us + r_end_us
    *         + rIdCol
    */
  def bucketedOverlapTopK(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketSeconds: Long,
      k: Int,
      leftKeys: Seq[String],
      rIdCol: String,
      extraPred: Column = lit(true),
      shufflePartitions: Int = 0
  ): DataFrame = {
    val joined = bucketedOverlapJoin(
      left, right, lStart, lEnd, rStart, rEnd, bucketSeconds, extraPred, shufflePartitions)
    val pairs = joined.select(
      (leftKeys.map(col) :+
        (expr(s"unix_micros(least($lEnd, $rEnd))") -
          expr(s"unix_micros(greatest($lStart, $rStart))")).as("__ov") :+
        expr(s"unix_micros($rStart)").as("__rs") :+
        expr(s"unix_micros($rEnd)").as("__re") :+
        col(rIdCol)): _*)
    TopK
      .perGroupTies(pairs, leftKeys, col("__ov"), col("__rs"), col("__re"), col(rIdCol), k)
      .withColumnRenamed("value", "ov_us")
      .withColumnRenamed("t1", "r_start_us")
      .withColumnRenamed("t2", "r_end_us")
      .withColumnRenamed("id", rIdCol)
  }

  /** [[bucketedOverlapTopK]] for the SELF-join case (`left` and `right`
    * are the same relation under renaming), enumerating each unordered
    * pair ONCE. **Measured SLOWER than the asymmetric form at scale —
    * prefer [[bucketedOverlapTopK]] with an `=!=` predicate** (details
    * below); this stays available because the canonical-pair shape is
    * occasionally what a consumer wants semantically, and
    * TemporalOpsSpec/TopKSpec pin its result equality with the
    * asymmetric path.
    *
    * The `a.id =!= b.id` formulation pays the post-filter pair stream
    * TWICE — every unordered overlap {A, B} materializes as both
    * (A, B) and (B, A), each with its own overlap/endpoint arithmetic.
    * Here the join predicate is canonical (`lId < rId`, exactly one row
    * per unordered pair — ids differ by the predicate itself), and each
    * surviving pair fans into BOTH directed group-updates through a
    * generate: (A's keys, B as neighbor) and (B's keys, A as
    * neighbor), sharing the one computed overlap. The top-k hash
    * aggregate ([[TopK.perGroupTies]]) sees the same update multiset as
    * the `=!=` form — identical results. The plan stays
    * aggregation-only (bucket equi-join -> generate -> hash agg; no
    * window, no sort).
    *
    * WHY IT LOSES ANYWAY (round-11 adjudication of the round-10
    * halving claim, tools/bench_overlap_ab_r11.json): the bucket
    * equi-join probes the SAME pre-filter candidate volume under
    * either predicate — `lId < rId` halves only what survives the
    * filter — and the per-pair generate (two 7-field structs exploded)
    * rebuilds the directed stream the `=!=` join would have emitted as
    * plain projected columns. Measured solo at sf1 (interleaved reps,
    * local[32]): this form 112 s, a cheaper boolean-explode fan-out
    * variant ~92 s, the asymmetric form 59 s. The halving thesis
    * ignored that the dominant cost is join probing + filter
    * evaluation, which is identical in both forms; what remains is
    * fan-out overhead minus halved arithmetic, a net loss.
    *
    * `lKeys`/`rKeys` are the two renamings of the SAME key columns
    * (positionally matched, types equal); output names them `outKeys`.
    * `lIdCol`/`rIdCol` must be the two renamings of one orderable id
    * column that is distinct across the relation's rows OR carried in
    * the keys — pairs with equal ids are dropped as self-pairs.
    *
    * @return outKeys + rnk (1-based) + ov_us + r_start_us + r_end_us
    *         + outIdCol (the neighbor's id)
    */
  def bucketedOverlapTopKSym(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketSeconds: Long,
      k: Int,
      lKeys: Seq[String],
      rKeys: Seq[String],
      lIdCol: String,
      rIdCol: String,
      outKeys: Seq[String],
      outIdCol: String,
      shufflePartitions: Int = 0
  ): DataFrame = {
    require(lKeys.size == rKeys.size && lKeys.size == outKeys.size,
      s"key lists must align: ${lKeys.size}/${rKeys.size}/${outKeys.size}")
    val joined = bucketedOverlapJoin(
      left, right, lStart, lEnd, rStart, rEnd, bucketSeconds,
      extraPred = col(lIdCol) < col(rIdCol), shufflePartitions = shufflePartitions)
    val ov = expr(s"unix_micros(least($lEnd, $rEnd))") -
      expr(s"unix_micros(greatest($lStart, $rStart))")
    // one struct per direction, identical field names/types, exploded —
    // a narrow generate on the HALVED pair stream, never a second join
    def directed(ks: Seq[String], ns: String, ne: String, nid: String) =
      struct(
        (ks.zip(outKeys).map { case (c, o) => col(c).as(o) } :+
          ov.as("__ov") :+
          expr(s"unix_micros($ns)").as("__rs") :+
          expr(s"unix_micros($ne)").as("__re") :+
          col(nid).as("__id")): _*
      )
    val updates = joined
      .select(explode(array(
        directed(lKeys, rStart, rEnd, rIdCol),
        directed(rKeys, lStart, lEnd, lIdCol)
      )).as("__d"))
      .select(col("__d.*"))
    TopK
      .perGroupTies(updates, outKeys, col("__ov"), col("__rs"), col("__re"), col("__id"), k)
      .withColumnRenamed("value", "ov_us")
      .withColumnRenamed("t1", "r_start_us")
      .withColumnRenamed("t2", "r_end_us")
      .withColumnRenamed("id", outIdCol)
  }
}
