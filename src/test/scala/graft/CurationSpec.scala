package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("id", "lang")

  test("stratified sample: per-stratum rates hold, unknown strata use the default") {
    val kept = Curation
      .stratifiedSample(docs, "id", "lang", Map("en" -> 500, "de" -> 100), 900, "t-v1")
      .groupBy("lang")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    // ~334 docs per stratum; salted md5 buckets approximate the rate
    assert(kept("en") > 120 && kept("en") < 220, s"en kept ${kept("en")} of ~334 at 50%")
    assert(kept("de") > 10 && kept("de") < 60, s"de kept ${kept("de")} of ~333 at 10%")
    assert(kept("xx") > 260, s"xx (default 90%) kept ${kept("xx")} of ~333")
  }

  test("sample is deterministic and stable under repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation
        .stratifiedSample(df, "id", "lang", Map("en" -> 500), 300, "t-v1")
        .select("id").as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    assert(a == b)
    assert(a.nonEmpty)
    // re-running with the same salt keeps the SAME survivors (incremental
    // pipelines depend on this); a different salt draws a different set
    val c = ids(docs)
    assert(c == a)
    val other = Curation
      .stratifiedSample(docs, "id", "lang", Map("en" -> 500), 300, "t-v2")
      .select("id").as[Long].collect().toSet
    assert(other != a)
  }

  test("shuffleAssign: total reproducible order, uniform shards, salt = new epoch") {
    val n = 200L
    val docs2 = spark.range(n).toDF("id")
    val a = Curation.shuffleAssign(docs2, "id", nShards = 4, salt = "ep-1")
      .select("id", "shard", "pos_in_shard")
      .as[(Long, Int, Long)].collect()
    // every row placed exactly once; positions within a shard are 1..k
    assert(a.length == n)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // shards are roughly uniform (md5 on 200 ids: no shard empty or >2x mean)
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    assert(sizes.values.forall(s => s > 20 && s < 100), s"skewed shards: $sizes")
    // deterministic: identical rerun; different salt reorders
    val b = Curation.shuffleAssign(docs2, "id", 4, "ep-1")
      .select("id", "shard", "pos_in_shard").as[(Long, Int, Long)].collect()
    assert(b.sortBy(_._1).toSeq == a.sortBy(_._1).toSeq)
    val c = Curation.shuffleAssign(docs2, "id", 4, "ep-2")
      .select("id", "shard", "pos_in_shard").as[(Long, Int, Long)].collect()
    assert(c.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
  }

  test("weightedSample: deterministic, monotone in the weight, boundary weights exact") {
    val n = 2000
    val base = spark.range(n).select($"id")
    def kept(wMicro: org.apache.spark.sql.Column): Set[Long] =
      Curation.weightedSample(base, "id", wMicro, "ws-1").as[Long].collect().toSet

    // boundary weights: 0 keeps nothing, the full denominator keeps all
    assert(kept(lit(0L)).isEmpty)
    assert(kept(lit(Curation.WeightDenominator.toLong)).size == n)
    // empirical rate tracks a constant weight (md5 uniformity, wide tolerance)
    val quarter = kept(lit(250000L)).size
    assert(quarter > n / 4 - n / 10 && quarter < n / 4 + n / 10, s"rate off: $quarter/$n")
    // per-row monotone: raising every weight only ADDS rows
    assert(kept(lit(250000L)).subsetOf(kept(lit(500000L))))
    // deterministic rerun; a new salt is an independent redraw
    assert(kept(lit(250000L)) == kept(lit(250000L)))
    val other = Curation.weightedSample(base, "id", lit(250000L), "ws-2").as[Long].collect().toSet
    assert(other != kept(lit(250000L)))
  }

  test("tokenBudgetMix: undersubscribed keeps all, kept token mass tracks allocation") {
    // en: 600 docs x 10 tok = 6000; de: 300 x 10 = 3000; xx: 100 x 10 = 1000
    val d = (0L until 1000L)
      .map(i => (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "xx", 10L))
      .toDF("id", "lang", "n_tok")
    def mix(budget: Long) =
      Curation.tokenBudgetMix(
        d, "id", "lang", col("n_tok"),
        sharesPermille = Map("en" -> 500, "de" -> 300), defaultPermille = 200,
        budgetTokens = budget, salt = "tb-1")
    val kept = mix(4000L) // alloc: en 2000/6000, de 1200/3000, xx 800/1000
    val byLang = kept.groupBy("lang").agg(sum("n_tok").as("t")).as[(String, Long)].collect().toMap
    // sampling noise tolerance: +-40% of the allocation
    assert(byLang("en") > 1200 && byLang("en") < 2800, s"en mass ${byLang("en")} vs alloc 2000")
    assert(byLang("de") > 700 && byLang("de") < 1700, s"de mass ${byLang("de")} vs alloc 1200")
    // xx allocation 800 of 1000 available -> heavy partial
    assert(byLang("xx") > 500 && byLang("xx") <= 1000, s"xx mass ${byLang("xx")} vs alloc 800")
    // undersubscribed: a budget bigger than the corpus keeps EVERYTHING
    assert(mix(100000L).count() == 1000L)
    // deterministic and monotone in the budget
    def ids(b: Long) = mix(b).select("id").as[Long].collect().toSet
    assert(ids(4000L) == ids(4000L))
    assert(ids(2000L).subsetOf(ids(4000L)))
    // budget 0 keeps nothing
    assert(mix(0L).count() == 0L)
  }

  test("temperatureMixture: alpha=1/2 flattens skew — head shrinks, tail boosts, quotas sum <= budget") {
    // 90/9/1 percent domain skew
    val d = (0L until 1000L)
      .map(i => (i, if (i < 900) "web" else if (i < 990) "code" else "books"))
      .toDF("id", "dom")
    val m = Curation
      .temperatureMixture(d, "dom", budgetDocs = 10000L)
      .as[(String, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    // hand-derived: w = floor(sqrt(n * 1e6)) -> web 30000, code 9486, books 3162
    assert(m("web")._2 == 900L && m("code")._2 == 90L && m("books")._2 == 10L)
    val sw = 30000L + 9486L + 3162L
    assert(m("web")._4 == 1000000L * 30000L / sw)   // q_ppm exact
    assert(m("books")._4 == 1000000L * 3162L / sw)
    // direction: head dampened below its natural share, tail boosted above
    assert(m("web")._4 < m("web")._3, "head domain must shrink vs p_ppm")
    assert(m("books")._4 > m("books")._3, "tail domain must boost vs p_ppm")
    assert(m("books")._5 > 10000L && m("web")._5 < 10000L, "boost_bp crosses 1.0 the right way")
    // quotas: floor division can only under-fill, never exceed the budget
    val quotas = m.values.map(_._6).sum
    assert(quotas <= 10000L && quotas >= 9990L)
  }

  test("rate 0 drops a stratum entirely; rate 1000 keeps it entirely") {
    val kept = Curation
      .stratifiedSample(docs, "id", "lang", Map("en" -> 0, "de" -> 1000), 0, "t-v1")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("en") && !kept.contains("xx"))
    assert(kept("de") == docs.where(col("lang") === "de").count())
  }

  test("robustOutlierPrune: median/MAD gate on a hand-computed fixture") {
    import graft.operators.Curation
    // lang a: values 10,12,14,16,1000 -> median 14, deviations
    // 4,2,0,2,986 -> MAD 2; k=3 keeps |x-14| <= 6 -> drops 1000 only.
    // lang b: all equal -> MAD 0, keeps exactly the equal values.
    // lang c: even count 1,3,5,1001 -> median 4, devs 3,1,1,997 ->
    // MAD = (1+3)/2 = 2 -> keep |x-4| <= 6 -> 1,3,5 survive.
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 14L), ("a", 4L, 16L), ("a", 5L, 1000L),
      ("b", 6L, 7L), ("b", 7L, 7L), ("b", 8L, 7L),
      ("c", 9L, 1L), ("c", 10L, 3L), ("c", 11L, 5L), ("c", 12L, 1001L)
    ).toDF("lang", "id", "len")
    val kept = Curation
      .robustOutlierPrune(df, Seq("lang"), "len", kNum = 3, kDen = 1)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L, 11L))
  }

  test("robustOutlierPrune: mean/stddev would move with the outlier, MAD does not") {
    import graft.operators.Curation
    // one extreme value inflates stddev enough that a 3-sigma gate KEEPS
    // it; the MAD gate still rejects it — the breakdown-point property
    // that motivates the operator.
    // with ONE extreme point among n the outlier's z-score is bounded by
    // (n-1)/sqrt(n); n = 10 keeps that bound (2.85) under 3 sigma for
    // ANY outlier magnitude, so the 3-sigma gate provably keeps it
    val vals = Seq.tabulate(9)(i => ("x", i.toLong, 100L + i)) :+ (("x", 99L, 100000L))
    val df = vals.toDF("g", "id", "v")
    val stats = df.agg(avg("v"), stddev_pop("v")).head()
    val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
    assert(math.abs(100000L - mu) <= 3 * sd, "fixture: 3-sigma keeps the outlier")
    val kept = Curation
      .robustOutlierPrune(df, Seq("g"), "v", 3, 1)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(99L) && kept.size == 9)
  }

  test("leakageSafeSplit: clusters never span splits; doc-level split would leak") {
    import graft.operators.Curation
    import graft.functions.TextFunctions
    // 50 clusters x 4 members: cluster id = min member id (the
    // ClusterDedup convention); doc ids interleave across clusters
    val rows = (0L until 200L).map(d => (d, (d % 50) * 1000))
    val df = rows.toDF("doc_id", "cluster_id")
    val out = Curation.leakageSafeSplit(df, "cluster_id", 100, 80, 90, "corpus-split-v1")
    // every cluster lands in exactly one split
    val spansPerCluster = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .select("ns").as[Long].collect()
    assert(spansPerCluster.forall(_ == 1L))
    // the doc-hash split WOULD tear at least one of these clusters apart
    val docLevel = df
      .withColumn("bucket", TextFunctions.splitBucket(col("doc_id"), 100, "corpus-split-v1"))
      .withColumn("split", when(col("bucket") < 80, "train").otherwise("heldout"))
    val torn = docLevel.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1).count()
    assert(torn > 0, "fixture should demonstrate the leakage the operator prevents")
    // deterministic: identical assignment on recompute
    val again = Curation.leakageSafeSplit(df, "cluster_id", 100, 80, 90, "corpus-split-v1")
    assert(out.collect().toSeq.sortBy(_.getLong(0)) === again.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("robustOutlierPrune: corpus never shuffles — percentile aggs broadcast back") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("lang"), col("n_chars"))
    val plan = Curation
      .robustOutlierPrune(docs, Seq("lang"), "n_chars", 3, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"group stats must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side re-shuffled:\n$plan")
  }

  test("epochUpsample: copy counts bracket the epoch factor, fractional part samples") {
    val out = Curation
      .epochUpsample(docs, "id", col("lang"),
        Map("en" -> 2500, "de" -> 1000, "xx" -> 400), "ep-v1", nShards = 8)
    val perDoc = out
      .groupBy("id", "lang")
      .agg(countDistinct(col("copy_idx")).as("n"), max(col("n_copies")).as("nc"))
      .as[(Long, String, Long, Int)]
      .collect()
    // copy_idx is dense 0..n_copies-1 for every emitted doc
    perDoc.foreach { case (id, _, n, nc) => assert(n == nc, s"doc $id copies $n != $nc") }
    val byLang = perDoc.groupBy(_._2)
    // en (2.5 epochs): every doc has 2 or 3 copies, mean ~2.5 over ~334 docs
    val en = byLang("en").map(_._4)
    assert(en.forall(c => c == 2 || c == 3))
    val enMean = en.map(_.toDouble).sum / en.length
    assert(enMean > 2.35 && enMean < 2.65, s"en mean copies $enMean for 2.5 epochs")
    // de (exactly 1 epoch): always exactly 1 copy, no doc dropped
    assert(byLang("de").map(_._4).forall(_ == 1))
    assert(byLang("de").length == docs.where(col("lang") === "de").count())
    // xx (0.4 epochs): survivors have exactly 1 copy, ~40% survive
    val xx = byLang.getOrElse("xx", Array.empty)
    assert(xx.map(_._4).forall(_ == 1))
    val xxTotal = docs.where(col("lang") === "xx").count().toDouble
    assert(xx.length / xxTotal > 0.28 && xx.length / xxTotal < 0.52,
      s"xx kept ${xx.length} of $xxTotal at 0.4 epochs")
    // shards land in [0, 8)
    assert(out.agg(min("shard"), max("shard")).as[(Long, Long)].head() match {
      case (lo, hi) => lo >= 0L && hi < 8L
    })
  }

  test("epochUpsample: deterministic under repartitioning; more epochs never lose copies") {
    def run(df: org.apache.spark.sql.DataFrame, eMilli: Int) = Curation
      .epochUpsample(df, "id", col("lang"), Map("en" -> eMilli, "de" -> eMilli, "xx" -> eMilli),
        "ep-v1", nShards = 8)
      .select("id", "copy_idx", "shard")
      .as[(Long, Int, Long)]
      .collect()
      .toSet
    val a = run(docs, 1300)
    assert(a == run(docs.repartition(13), 1300))
    // raising the epoch factor only ADDS (id, copy_idx) pairs
    val b = run(docs, 1900)
    assert(a.map(t => (t._1, t._2)).subsetOf(b.map(t => (t._1, t._2))))
  }

  test("curriculumPhases: balanced phases, difficulty-monotone, deterministic") {
    val d = (0L until 1000L).map(i => (i, i % 500)).toDF("id", "diff")
    val out = Curation
      .curriculumPhases(d, "id", "diff", nPhases = 5, salt = "c-v1")
      .select("id", "diff", "phase", "ord_hash")
      .as[(Long, Long, Int, Long)]
      .collect()
    // phases cover 1..5 and are roughly balanced on a uniform difficulty
    val sizes = out.groupBy(_._3).map { case (p, xs) => p -> xs.length }
    assert(sizes.keySet == Set(1, 2, 3, 4, 5), s"phases: $sizes")
    assert(sizes.values.forall(n => n > 120 && n < 280), s"unbalanced: $sizes")
    // monotone: a strictly harder row never lands in an earlier phase
    val byDiff = out.sortBy(_._2).map(_._3)
    assert(byDiff.zip(byDiff.tail).forall { case (a, b) => a <= b })
    // same salt = bit-identical rerun; new salt = same phases, new order
    val again = Curation
      .curriculumPhases(d.repartition(11), "id", "diff", 5, "c-v1")
      .select("id", "diff", "phase", "ord_hash")
      .as[(Long, Long, Int, Long)]
      .collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val redraw = Curation
      .curriculumPhases(d, "id", "diff", 5, "c-v2")
      .select("id", "phase", "ord_hash")
      .as[(Long, Int, Long)]
      .collect()
      .sortBy(_._1)
    assert(redraw.map(x => (x._1, x._2)).toSeq == out.sortBy(_._1).map(x => (x._1, x._3)).toSeq)
    assert(redraw.map(_._3).toSeq != out.sortBy(_._1).map(_._4).toSeq)
  }

  test("curriculumPhases: corpus never shuffles — boundary agg broadcasts back") {
    val d = (0L until 100L).map(i => (i, i)).toDF("id", "diff")
    val plan = Curation
      .curriculumPhases(d, "id", "diff", 4, "c-v1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not hash-shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"boundaries must broadcast:\n$plan")
  }

  test("epochUpsample is a narrow map stage: no shuffle exchange in the plan") {
    val plan = Curation
      .epochUpsample(docs, "id", col("lang"), Map("en" -> 2500), "ep-v1", nShards = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epoch upsampling must not shuffle:\n$plan")
  }

  test("importanceContrast: target-like docs outscore the rest; scoring stage is join-free") {
    // two disjoint vocabularies: the 'en' target speaks ping-pong, the
    // rest speaks bla-blub — every en bigram bucket has tc ~ r (contrast
    // ~1e6), every other bucket tc = 0 (contrast ~1e6/(r+1))
    val corpus = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "en", "ping pong ping pong ping pong")
      else (i.toLong, "xx", "bla blub bla blub bla blub")
    }.toDF("doc_id", "lang", "text")
    val scored = Curation
      .importanceContrast(corpus, "text", col("lang") === "en")
      .select(col("lang"), col("score_micro"))
      .as[(String, Long)].collect()
    val en = scored.filter(_._1 == "en").map(_._2)
    val xx = scored.filter(_._1 == "xx").map(_._2)
    assert(en.min > xx.max,
      s"every target doc must outscore every non-target doc: en.min=${en.min} xx.max=${xx.max}")
    // docs with < 2 tokens score 0 (no features)
    val empty = Curation
      .importanceContrast(Seq((1L, "en", "solo")).toDF("doc_id", "lang", "text"),
        "text", col("lang") === "en")
      .select(col("score_micro")).as[Long].head()
    assert(empty == 0L)
    // the SCORING plan (post-training) is a pure map stage over the scan
    val plan = Curation
      .importanceContrast(corpus, "text", col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scoring must not join (literal contrast table):\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
