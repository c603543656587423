package graft

import graft.jobs.BatchPipeline
import graft.operators.CdcRouter
import graft.sinks.SnapshotSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins the O(delta) contract of the bucketed SCD2 snapshot layout: an
  * increment rewrites ONLY the partitions whose key bucket it touches —
  * every other partition's files stay byte-identical on disk — while the
  * merged mart content stays exactly equal to the whole-rewrite path's.
  * On a 100 TB mart with a daily delta this is the difference between
  * O(|mart|) and O(|delta|) I/O per load.
  */
class BucketedSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val NB        = 32
  private val LoadTs1   = "2024-01-01 00:00:00"
  private val LoadTs2   = "2024-02-01 00:00:00"
  private val EndOfTime = "2099-12-31 00:00:00"

  /** Routed frame: (bk, payload, ROUTER_GROUP). */
  private def routedOf(rows: Seq[(String, String, String)]): DataFrame =
    rows.toDF("bk", "payload", CdcRouter.RouterCol)

  private def seed: DataFrame =
    routedOf((1 to 100).map(k => (s"K-$k", s"v1-$k", CdcRouter.Insert)))

  /** partition dir name -> (file name -> md5 of bytes) */
  private def fileState(path: String): Map[String, Map[String, String]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("KEY_BUCKET=")).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }.toMap
  }

  private def martRows(path: String): Set[(String, String, Int, String, String)] =
    spark.read.parquet(path)
      .select($"bk", $"payload", col("ACTIVE_FLAG"), col("START_DATE"), col("END_DATE"))
      .as[(String, String, Int, String, String)]
      .collect()
      .toSet

  test("increment rewrites only touched buckets; untouched partition files are byte-identical") {
    val path = tempDir("bsnap") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    val before = fileState(path)
    assert(before.nonEmpty)

    // increment: 2 updates + 1 insert -> at most 3 touched buckets
    val inc = routedOf(Seq(
      ("K-7", "v2-7", CdcRouter.Update),
      ("K-14", "v2-14", CdcRouter.Update),
      ("K-999", "v1-999", CdcRouter.Insert)
    ))
    SnapshotSink.upsertBucketed(
      spark, path, inc, "bk", lit(LoadTs2), lit(EndOfTime), numBuckets = NB)
    val after = fileState(path)

    val touched = Seq("K-7", "K-14", "K-999")
      .toDF("bk")
      .select(SnapshotSink.bucketOf($"bk", NB))
      .as[Int].collect().toSet.map((b: Int) => s"KEY_BUCKET=$b")
    assert(touched.size <= 3)
    // every untouched partition: same file names, same bytes
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "fixture must leave some buckets untouched")
    untouched.foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    // every touched partition changed (close-out / new version landed)
    touched.filter(before.contains).foreach { p =>
      assert(after(p) != before(p), s"touched partition $p was not rewritten")
    }

    // content: exactly the SCD2 result — K-7/K-14 closed + v2 active, K-999 new
    val rows = martRows(path)
    assert(rows.contains(("K-7", "v1-7", 0, LoadTs1, LoadTs2)))
    assert(rows.contains(("K-7", "v2-7", 1, LoadTs2, EndOfTime)))
    assert(rows.contains(("K-14", "v1-14", 0, LoadTs1, LoadTs2)))
    assert(rows.contains(("K-14", "v2-14", 1, LoadTs2, EndOfTime)))
    assert(rows.contains(("K-999", "v1-999", 1, LoadTs2, EndOfTime)))
    assert(rows.size == 103)
  }

  test("bucketed merge result equals the whole-rewrite upsert's, duplicates included") {
    val dir      = tempDir("bsnap-eq")
    val bucketed = s"$dir/bucketed"
    val full     = s"$dir/full"
    val inc = routedOf(
      (1 to 40).map(k => (s"K-$k", s"v2-$k", CdcRouter.Update)) ++
        Seq(("K-500", "v1-500", CdcRouter.Insert), ("K-2", "v1-2", CdcRouter.Duplicate)))

    SnapshotSink.upsertBucketed(
      spark, bucketed, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    SnapshotSink.upsertBucketed(
      spark, bucketed, inc, "bk", lit(LoadTs2), lit(EndOfTime), numBuckets = NB)
    SnapshotSink.upsert(spark, full, seed, "bk", lit(LoadTs1), lit(EndOfTime))
    SnapshotSink.upsert(spark, full, inc, "bk", lit(LoadTs2), lit(EndOfTime))

    assert(martRows(bucketed) == martRows(full))
  }

  test("probe read prunes to the touched buckets at planning time") {
    val path = tempDir("bsnap-prune") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    val schema = spark.read.parquet(path).drop(SnapshotSink.BucketCol).schema
    val someBuckets = Seq("K-7").toDF("bk")
      .select(SnapshotSink.bucketOf($"bk", NB)).as[Int].collect().toSeq
    val pruned = SnapshotSink.readSnapshotBucketed(spark, path, schema, Some(someBuckets))
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.exists(_.toString.contains(SnapshotSink.BucketCol)))
    val listed = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    val want = someBuckets.map(b => s"KEY_BUCKET=$b/")
    assert(listed.nonEmpty && listed.forall(f => want.exists(f.contains)), listed.mkString("\n"))
    assert(pruned.where($"bk" === "K-7").count() == 1)
  }

  test("crash mid-swap: dangling .bak partition is restored before the next read") {
    val path = tempDir("bsnap-crash") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    val before = martRows(path)

    // simulate the crash window: one partition renamed aside, new one never landed
    val root = new java.io.File(path)
    val victim = root.listFiles().filter(_.getName.startsWith("KEY_BUCKET=")).head
    val aside = new java.io.File(root, s".bak_${victim.getName}")
    assert(victim.renameTo(aside))

    val schema = spark.read.parquet(path).drop(SnapshotSink.BucketCol).schema
    val restored = SnapshotSink.readSnapshotBucketed(spark, path, schema)
    assert(restored.count() == 100)
    assert(martRows(path) == before)

    // and a completed-swap leftover (bak next to a live partition) is dropped
    val victim2 = root.listFiles().filter(_.getName.startsWith("KEY_BUCKET=")).head
    val aside2 = new java.io.File(root, s".bak_${victim2.getName}")
    java.nio.file.Files.createDirectory(aside2.toPath)
    SnapshotSink.recoverBucketSwaps(spark, path)
    assert(!aside2.exists())
  }

  test("re-running an increment against a half-applied mart converges (idempotent re-load)") {
    // the crash model between partition swaps: some buckets new, some old.
    // A re-run routes already-applied rows as DUPLICATE (hash equal) and
    // re-applies the rest — the final mart equals the never-crashed run.
    val dir   = tempDir("bsnap-rerun")
    val mart  = s"$dir/mart"
    val mart2 = s"$dir/mart2"
    def feed(v: Int) =
      (1 to 60).map(k => (s"K-$k", if (k % 3 == 0) s"v$v-$k" else s"v1-$k")).toDF("bk", "payload")
    val spec = graft.jobs.FeedSpec("bk", "S - ", Seq(col("payload")), Seq("payload"))

    // never-crashed reference run: seed + one increment
    BatchPipeline.runIncrementBucketed(spark, mart2, feed(1), spec, LoadTs1, numBuckets = NB)
    BatchPipeline.runIncrementBucketed(spark, mart2, feed(2), spec, LoadTs2, numBuckets = NB)

    // crashed run: seed, increment, then the SAME increment replayed
    BatchPipeline.runIncrementBucketed(spark, mart, feed(1), spec, LoadTs1, numBuckets = NB)
    BatchPipeline.runIncrementBucketed(spark, mart, feed(2), spec, LoadTs2, numBuckets = NB)
    val replay = BatchPipeline.runIncrementBucketed(
      spark, mart, feed(2), spec, LoadTs2, numBuckets = NB)
    assert(replay.total == 0, "replay of an applied increment must route all-DUPLICATE")

    def snap(p: String) = spark.read.parquet(p)
      .select(col(BatchPipeline.SsiCol), $"payload", col("ACTIVE_FLAG"),
        col("START_DATE"), col("END_DATE"))
      .as[(String, String, Int, String, String)].collect().toSet
    assert(snap(mart) == snap(mart2))
  }

  test("repeated loads keep per-bucket file count bounded (copy-on-write rewrite)") {
    val path = tempDir("bsnap-files") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    // six further loads all hammering the same two hot keys — the shape
    // that would leave ~N files/bucket if the merge appended per load
    for (i <- 2 to 7) {
      val inc = routedOf(Seq(
        ("K-7", s"v$i-7", CdcRouter.Update),
        ("K-14", s"v$i-14", CdcRouter.Update)))
      SnapshotSink.upsertBucketed(
        spark, path, inc, "bk", lit(f"2024-$i%02d-01 00:00:00"), lit(EndOfTime),
        numBuckets = NB)
    }
    val counts = fileState(path).map { case (d, files) => d -> files.size }
    assert(counts.nonEmpty && counts.values.forall(_ == 1),
      s"per-bucket file count grew: $counts")
    // the history accumulated in CONTENT (7 versions of K-7), not files
    assert(spark.read.parquet(path).where($"bk" === "K-7").count() == 7)
  }

  test("persisted bucket count outranks a changed numBuckets parameter") {
    val dir  = tempDir("bsnap-marker")
    val mart = s"$dir/mart"
    def feed(v: Int) = (1 to 30).map(k => (s"K-$k", s"v$v-$k")).toDF("bk", "payload")
    val spec = graft.jobs.FeedSpec("bk", "S - ", Seq(col("payload")), Seq("payload"))

    BatchPipeline.runIncrementBucketed(spark, mart, feed(1), spec, LoadTs1, numBuckets = 8)
    assert(SnapshotSink.bucketCountOf(spark, mart).contains(8))

    // a later load MIS-configured with 32 buckets must still probe and
    // merge with the persisted 8 — otherwise every key re-buckets, the
    // pruned probe misses its active row, and updates become duplicates
    BatchPipeline.runIncrementBucketed(spark, mart, feed(2), spec, LoadTs2, numBuckets = 32)
    val dirs = new java.io.File(mart).listFiles()
      .filter(_.getName.startsWith("KEY_BUCKET="))
      .map(_.getName.stripPrefix("KEY_BUCKET=").toInt).toSet
    assert(dirs.nonEmpty && dirs.forall(_ < 8), s"mis-bucketed dirs appeared: $dirs")
    // every key changed payload v1->v2: one close-out + one new version each
    val m = spark.read.parquet(mart)
    assert(m.where(col("ACTIVE_FLAG") === 1).count() == 30)
    assert(m.count() == 60, "every key must have closed v1 + active v2")
    // and an exact replay still routes all-DUPLICATE despite the bad param
    val replay = BatchPipeline.runIncrementBucketed(
      spark, mart, feed(2), spec, LoadTs2, numBuckets = 32)
    assert(replay.total == 0)
  }

  test("marker-absent bucketed mart: numBuckets validated against on-disk bucket dirs") {
    val path = tempDir("bsnap_nomarker") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    // simulate a mart created before the marker existed
    val marker = new java.io.File(path, SnapshotSink.BucketCountMarker)
    assert(marker.delete())

    // 100 keys over 32 buckets: some bucket id >= 8 certainly exists, so
    // a too-small count must REFUSE instead of mis-routing every key
    val inc = routedOf(Seq(("K-7", "v2-7", CdcRouter.Update)))
    val ex = intercept[IllegalStateException] {
      SnapshotSink.upsertBucketed(
        spark, path, inc, "bk", lit(LoadTs2), lit(EndOfTime), numBuckets = 8)
    }
    assert(ex.getMessage.contains("cannot address"))
    assert(!new java.io.File(path, SnapshotSink.BucketCountMarker).exists(),
      "a refused load must not pin any count")

    // the correct count passes validation, merges, and re-pins the marker
    SnapshotSink.upsertBucketed(
      spark, path, inc, "bk", lit(LoadTs2), lit(EndOfTime), numBuckets = NB)
    assert(SnapshotSink.bucketCountOf(spark, path).contains(NB))
    assert(martRows(path).contains(("K-7", "v2-7", 1, LoadTs2, EndOfTime)))
  }

  test("corrupt bucket-count marker fails with a message naming the marker") {
    val path = tempDir("bsnap_badmarker") + "/mart"
    SnapshotSink.upsertBucketed(
      spark, path, seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    // a crash mid-write used to be able to truncate the marker; the
    // write is atomic now, but a corrupt file must still fail CLEARLY
    java.nio.file.Files.writeString(
      new java.io.File(path, SnapshotSink.BucketCountMarker).toPath, "")
    val ex = intercept[IllegalStateException] {
      SnapshotSink.bucketCountOf(spark, path)
    }
    assert(ex.getMessage.contains(SnapshotSink.BucketCountMarker))
    assert(ex.getMessage.contains("delete the marker"))
  }

  test("schema evolution: a column added to the feed mid-life widens the mart, old versions read null") {
    // a 100 TB mart outlives its feed schema: loads after the feed adds
    // a column must keep history readable (old files lack the column ->
    // null) and carry the new column forward — without rewriting
    // untouched buckets
    val dir  = tempDir("bsnap-evolve")
    val mart = s"$dir/mart"
    val spec1 = graft.jobs.FeedSpec("bk", "S - ", Seq(col("payload")), Seq("payload"))
    BatchPipeline.runIncrementBucketed(
      spark, mart, (1 to 20).map(k => (s"K-$k", s"v1-$k")).toDF("bk", "payload"),
      spec1, LoadTs1, numBuckets = NB)

    // load 2: feed gained a `region` column; only K-1 changes payload
    val feed2 = (1 to 20)
      .map(k => (s"K-$k", if (k == 1) "v2-1" else s"v1-$k", s"r${k % 3}"))
      .toDF("bk", "payload", "region")
    val spec2 = graft.jobs.FeedSpec("bk", "S - ", Seq(col("payload")), Seq("payload", "region"))
    BatchPipeline.runIncrementBucketed(spark, mart, feed2, spec2, LoadTs2, numBuckets = NB)

    val m = spark.read.option("mergeSchema", "true").parquet(mart)
    assert(m.columns.contains("region"), "mart schema must widen with the feed")
    // K-1: closed v1 (region null — written before the column existed),
    // active v2 carries its region
    val k1 = m.where(col(BatchPipeline.SsiCol) === "S - K-1")
      .select($"payload", col("ACTIVE_FLAG"), $"region")
      .as[(String, Int, Option[String])].collect().sortBy(_._2)
    assert(k1.length == 2)
    assert(k1(0) == (("v1-1", 0, None)), s"closed pre-evolution version must read null region: ${k1(0)}")
    assert(k1(1) == (("v2-1", 1, Some("r1"))))
    // the row fingerprint hashes ALL feed columns, so the added column
    // changes every key's hash -> every key routes UPDATE and
    // re-versions under the new schema (the honest semantics: the feed
    // now asserts a region for every record). One active row per key:
    val act = m.where(col("ACTIVE_FLAG") === 1).groupBy(col(BatchPipeline.SsiCol)).count()
      .as[(String, Long)].collect()
    assert(act.length == 20 && act.forall(_._2 == 1L))
    assert(m.count() == 40, "20 closed pre-evolution versions + 20 active post-evolution")
  }

  test("detectLayout: bucketed vs flat vs absent, with crash recovery on both") {
    val dir = tempDir("bsnap-layout")
    assert(SnapshotSink.detectLayout(spark, s"$dir/none").isEmpty)

    SnapshotSink.upsertBucketed(
      spark, s"$dir/b", seed, "bk", lit(LoadTs1), lit(EndOfTime), numBuckets = NB)
    assert(SnapshotSink.detectLayout(spark, s"$dir/b").contains(true))

    SnapshotSink.upsert(spark, s"$dir/f", seed, "bk", lit(LoadTs1), lit(EndOfTime))
    assert(SnapshotSink.detectLayout(spark, s"$dir/f").contains(false))

    // flat mid-swap crash window: only the whole-mart .bak exists —
    // detection restores it and still answers "flat"
    val f = new java.io.File(s"$dir/f")
    assert(f.renameTo(new java.io.File(s"$dir/f.bak")))
    assert(SnapshotSink.detectLayout(spark, s"$dir/f").contains(false))
    assert(f.exists(), "the .bak mart must be restored, not just classified")

    // bucketed mid-swap crash window: one partition aside — restored too
    val b = new java.io.File(s"$dir/b")
    val victim = b.listFiles().filter(_.getName.startsWith("KEY_BUCKET=")).head
    assert(victim.renameTo(new java.io.File(b, s".bak_${victim.getName}")))
    assert(SnapshotSink.detectLayout(spark, s"$dir/b").contains(true))
    assert(victim.exists(), "the aside bucket must be restored by detection")
  }
}
