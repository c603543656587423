package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

/** Optimizer rule: rewrite pure range-containment joins into the
  * time-bucket equi-join shape of [[graft.operators.RangeJoin]] —
  * automatically.
  *
  * A join whose only cross-side predicates are `ts >= lo AND ts <= hi`
  * has no equi-key, so Spark plans BroadcastNestedLoopJoin: O(|A|·|B|)
  * comparisons and a broadcast of one ENTIRE side — the first thing
  * that dies at scale. This rule detects that shape (inner join, both
  * bounds timestamps, no existing equi-conjunct), explodes the
  * interval side into the fixed-width buckets it covers, tags the
  * probe side with its single bucket, and re-joins on bucket equality
  * with the ORIGINAL predicates kept verbatim. A probe row lives in
  * exactly one bucket, so a qualifying pair meets exactly once — the
  * rewrite is result-identical with no dedup pass, and the planner now
  * sees an equi-join it can shuffle-hash/sort-merge.
  *
  * Bucket width comes from `spark.graft.rangejoin.bucketSeconds`
  * (default 3600); pick it near the typical interval span (see the
  * RangeJoin scaladoc cost model). The rewrite is a Catalyst
  * `Rule[LogicalPlan]` injected through `GraftExtensions` — the
  * "whole-operator semantics" extension tier: user code (or plain
  * `spark.sql`) keeps writing the natural BETWEEN join and still gets
  * the scalable plan.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val BucketSecondsKey = "spark.graft.rangejoin.bucketSeconds"
  val EnabledKey       = "spark.graft.rangejoin.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val bucketSeconds = conf.getConfString(BucketSecondsKey, "3600").toLong
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, bucketSeconds).getOrElse(j)
    }
  }

  /** `e` is a timestamp bound usable for bucketing: refs entirely on
    * one side and timestamp-typed.
    */
  private def sideOf(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  private def rewrite(j: Join, cond: Expression, bucketSeconds: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // an existing cross-side equality means the planner already has an
    // equi-join — nothing to fix (also stops re-matching our own output)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, j); sb <- sideOf(b, j)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // normalize every comparison into (probe ts, bound, isLower): the
    // ORIGINAL conjunct is kept verbatim later, so >=/>/<=/<' bucket
    // bounds may be conservative (a bucket too many is harmless)
    def asLower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(ts, lo) => Some((ts, lo))
      case GreaterThan(ts, lo)        => Some((ts, lo))
      case LessThanOrEqual(lo, ts)    => Some((ts, lo))
      case LessThan(lo, ts)           => Some((ts, lo))
      case _                          => None
    }
    def asUpper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(ts, hi)    => Some((ts, hi))
      case LessThan(ts, hi)           => Some((ts, hi))
      case GreaterThanOrEqual(hi, ts) => Some((ts, hi))
      case GreaterThan(hi, ts)        => Some((ts, hi))
      case _                          => None
    }
    // DATE bounds ride too (cast to timestamp for bucketing; the
    // original DATE comparison still decides the match)
    def tsTyped(e: Expression) =
      e.dataType == TimestampType || e.dataType == DateType

    val candidates = for {
      cLo       <- conjuncts
      cHi       <- conjuncts
      if cLo ne cHi
      (tsL, lo) <- asLower(cLo).toSeq
      (tsH, hi) <- asUpper(cHi).toSeq
      if tsL.semanticEquals(tsH)
      if tsTyped(tsL) && tsTyped(lo) && tsTyped(hi)
      probeSide    <- sideOf(tsL, j).toSeq
      intervalSide <- sideOf(lo, j).toSeq
      hiSide       <- sideOf(hi, j).toSeq
      if intervalSide == hiSide && intervalSide != probeSide
    } yield (tsL, lo, hi, probeSide)

    candidates.headOption.map { case (ts, lo, hi, probeOnLeft) =>
      val b = Literal(bucketSeconds * 1000000L, LongType)
      def bucket(e: Expression): Expression = {
        val asTs =
          if (e.dataType == DateType)
            Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
          else e
        IntegralDivide(UnixMicros(asTs), b)
      }

      val (probe, interval) = if (probeOnLeft) (j.left, j.right) else (j.right, j.left)

      // interval side: explode the covered bucket range
      val bkI = AttributeReference("__graft_bk_i", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved post-analysis and fails plan validation.
      // Inverted intervals (lo > hi) make Sequence throw at runtime,
      // where the nested loop it replaces would return no rows — guard
      // them into an empty bucket list (Explode outer=false then drops
      // the row, matching inner-join semantics exactly).
      val loBk = bucket(lo)
      val hiBk = bucket(hi)
      val buckets = If(
        LessThanOrEqual(loBk, hiBk),
        new Sequence(loBk, hiBk, Literal(1L, LongType))
          .withTimeZone(conf.sessionLocalTimeZone),
        Literal.create(Array.empty[Long], org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
      )
      val gen = Generate(
        Explode(buckets),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(bkI),
        child = interval
      )
      // probe side: its single bucket
      val bkPAlias = Alias(bucket(ts), "__graft_bk_p")()
      val proj     = Project(probe.output :+ bkPAlias, probe)

      val newCond = And(EqualTo(bkI, bkPAlias.toAttribute), cond)
      val (newLeft, newRight) = if (probeOnLeft) (proj, gen) else (gen, proj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
