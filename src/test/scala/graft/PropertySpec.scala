package graft

import graft.conform.Durations
import graft.functions.{Fingerprint, ZOrder}
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over the pure column kernels. ScalaCheck
  * generators (FIXED seed — deterministic across runs) build one batch
  * of cases per property and a single Spark pass evaluates all of them:
  * per-case Spark jobs would make classic forAll uneconomical, but the
  * invariant coverage is the same.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator
      .iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
        val r = g.doPureApply(Gen.Parameters.default, s)
        (r.seed.next, Some(r.retrieve.get))
      }
      .drop(1)
      .take(n)
      .flatMap(_._2)
      .toSeq

  test("Durations: secondsToHms round-trips through hmsToSeconds for arbitrary spans") {
    val secs = sample(Gen.chooseNum(0, 359999), 500, seed = 42L).distinct
    val df = secs.toDF("s")
      .withColumn("hms", Durations.secondsToHms(col("s")))
      .withColumn("back", Durations.hmsToSeconds(col("hms")))
    val bad = df.where(col("back") =!= col("s")).count()
    assert(bad == 0, s"$bad spans failed the round trip")
    // null preserved in BOTH directions
    val nulls = Seq(Option.empty[Int]).toDF("s")
      .select(Durations.secondsToHms(col("s")).as("hms"))
      .select(col("hms"), Durations.hmsToSeconds(col("hms")).as("back"))
      .collect()
    assert(nulls.head.isNullAt(0) && nulls.head.isNullAt(1))
  }

  test("ZOrder: dominance in both dimensions implies z-value order (monotonicity)") {
    val bits = 16
    val pts = sample(
      for {
        ax <- Gen.chooseNum(0, (1 << bits) - 1)
        ay <- Gen.chooseNum(0, (1 << bits) - 1)
        dx <- Gen.chooseNum(0, 255)
        dy <- Gen.chooseNum(0, 255)
      } yield (ax, ay, math.min(ax + dx, (1 << bits) - 1), math.min(ay + dy, (1 << bits) - 1)),
      400,
      seed = 7L
    )
    val df = pts.toDF("ax", "ay", "bx", "by")
      .withColumn("za", ZOrder.zValue(col("ax"), col("ay"), bits))
      .withColumn("zb", ZOrder.zValue(col("bx"), col("by"), bits))
    // a dominates b in both dims => morton(a) <= morton(b)
    val violations = df.where(col("za") > col("zb")).count()
    assert(violations == 0, s"$violations dominance pairs violated z-order monotonicity")
  }

  test("Fingerprint: seededLongHash is deterministic, seed-sensitive, and in [0, 2^60)") {
    val strs = sample(Gen.alphaNumStr.suchThat(_.nonEmpty), 300, seed = 11L).distinct
    val df = strs.toDF("s").select(
      col("s"),
      Fingerprint.seededLongHash(col("s"), 1).as("h1"),
      Fingerprint.seededLongHash(col("s"), 1).as("h1b"),
      Fingerprint.seededLongHash(col("s"), 2).as("h2")
    )
    assert(df.where(col("h1") =!= col("h1b")).count() == 0, "same seed must be deterministic")
    assert(df.where(col("h1") < 0 || col("h1") >= (1L << 60)).count() == 0, "range [0, 2^60)")
    // different seeds decorrelate: collisions across the whole sample are
    // overwhelmingly unlikely at 60 bits — any means the seed is ignored
    assert(df.where(col("h1") === col("h2")).count() == 0, "seed must change the hash")
  }

  test("HeavyHitters: exact equals plain groupBy-count on random multisets and thresholds") {
    val gen = for {
      nItems <- Gen.chooseNum(3, 30)
      rows   <- Gen.listOfN(400, Gen.chooseNum(0, nItems - 1))
    } yield rows.map(i => s"item_$i")
    for ((rows, i) <- sample(gen, 3, seed = 99L).zipWithIndex) {
      val df = rows.toDF("item").repartition(4)
      val t = Seq(1L, 5L, 40L)(i)
      val got = HeavyHitters.exact(df, col("item"), t, width = 32, depth = 2)
        .as[(String, Long)].collect().toMap
      val want = df.groupBy("item").agg(count(lit(1)).as("n"))
        .where(col("n") >= t).as[(String, Long)].collect().toMap
      assert(got == want, s"dataset $i threshold $t: ${got.size} vs ${want.size}")
    }
  }

  test("sweepContainCountGlobal equals the naive containment join on random intervals") {
    import graft.operators.RangeJoin
    // random micro-timestamps over ~5 days so intervals cross epochs,
    // share boundaries with probes, and leave some epochs probe-free
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val day  = 86400000000L
    val gen = for {
      nIv <- Gen.chooseNum(5, 40)
      ivs <- Gen.listOfN(nIv, for {
        lo  <- Gen.chooseNum(0L, 5 * day)
        len <- Gen.chooseNum(0L, 2 * day)
      } yield (lo, lo + len))
      nP <- Gen.chooseNum(0, 300)
      ps <- Gen.listOfN(nP, Gen.chooseNum(0L, 7 * day))
    } yield (ivs, ps)
    for (((ivs, ps), i) <- sample(gen, 4, seed = 1234L).zipWithIndex) {
      val iv = ivs.zipWithIndex
        .map { case ((lo, hi), id) => (id.toLong, base + lo, base + hi) }
        .toDF("id", "lo_us", "hi_us")
        .select(col("id"),
          expr("timestamp_micros(lo_us)").as("lo"), expr("timestamp_micros(hi_us)").as("hi"))
      val probes = ps.map(base + _).toDF("p_us")
        .select(expr("timestamp_micros(p_us)").as("p_ts"))
      val got = RangeJoin
        .sweepContainCountGlobal(iv, probes, "lo", "hi", "p_ts",
          keyCols = Seq("id"), epoch = to_date(_))
        .as[(Long, Long)].collect().toMap
      val want = iv
        .join(probes, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"), "left")
        .groupBy(col("id")).agg(count(col("p_ts")).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"dataset $i: sweep disagrees with the naive join")
    }
  }

  test("TopK.perGroupTies equals a sorted-take reference on random groups with heavy ties") {
    import graft.operators.TopK
    val gen = for {
      n    <- Gen.chooseNum(50, 400)
      rows <- Gen.listOfN(n, for {
        g  <- Gen.chooseNum(0, 8)
        v  <- Gen.chooseNum(0L, 5L) // tiny domain -> dense value ties
        t1 <- Gen.chooseNum(0L, 3L)
        t2 <- Gen.chooseNum(0L, 3L)
        id <- Gen.chooseNum(0L, 1000L)
      } yield (g.toLong, v, t1, t2, id))
    } yield rows.distinct // distinct rows so the total order is strict
    for ((rows, i) <- sample(gen, 3, seed = 321L).zipWithIndex) {
      val k = Seq(1, 3, 7)(i)
      val got = TopK
        .perGroupTies(rows.toDF("g", "v", "t1", "t2", "i").repartition(5),
          Seq("g"), col("v"), col("t1"), col("t2"), col("i"), k)
        .select("g", "rnk", "value", "t1", "t2", "id")
        .as[(Long, Int, Long, Long, Long, Long)].collect().toSet
      val want = rows
        .groupBy(_._1)
        .flatMap { case (g, xs) =>
          xs.map(r => (r._2, r._3, r._4, r._5))
            .sortBy { case (v, t1, t2, id) => (-v, t1, t2, id) }
            .take(k)
            .zipWithIndex
            .map { case ((v, t1, t2, id), pos) => (g, pos + 1, v, t1, t2, id) }
        }
        .toSet
      assert(got == want, s"dataset $i k=$k")
    }
  }
}
