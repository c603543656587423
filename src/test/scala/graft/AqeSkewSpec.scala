package graft

import org.apache.spark.sql.functions._

/** Pins Spark's RUNTIME skew handling — the built-in complement to the
  * manual salting operators (Skew.saltedAgg, CdcRouter.routeSalted).
  * The salted paths exist because AQE cannot split every shape (it only
  * rewrites shuffle joins whose stats it sees at runtime); this spec
  * proves the shape it DOES cover: a skewed sort-merge join partition is
  * split into parallel sub-partitions (`skew=true` in the final adaptive
  * plan) with results identical to the unsplit join.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true), same results") {
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // thresholds scaled down so test-sized bytes register as "skewed";
      // the detection logic (factor x median AND above floor) is the same
      // one production sizes hit at real thresholds
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one mass-default key (0) holding 95% of rows, like a real feed
      def left = spark.range(40000)
        .select(when($"id" % 20 === 0, $"id" % 97).otherwise(0L).as("k"),
                concat(lit("payload-"), $"id").as("payload"))
      def right = spark.range(200).select(($"id" % 100).as("k"), $"id".as("dim"))

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val joined = left.join(right, "k")
      // execute THIS queryExecution so its adaptive plan finalizes (a
      // .count() would re-plan in a separate query execution)
      val got = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in adaptive plan:\n$plan")

      // differential: the split join must agree exactly with the same
      // join executed without skew handling
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(got.toLong == left.join(right, "k").count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
