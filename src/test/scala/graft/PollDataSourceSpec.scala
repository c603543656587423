package graft

import graft.streaming.{ArchiveStream, PollBuffers}

import java.net.InetSocketAddress

/** The custom DataSource V2 micro-batch source: incremental offsets,
  * multi-batch consumption, and composition with the archive sink.
  */
class PollDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def readPoll(buffer: String) =
    spark.readStream
      .format("graft.streaming.PollDataSource")
      .option("buffer", buffer)
      .load()

  test("readStream over the poll source consumes each record exactly once") {
    PollBuffers.clear("t1")
    PollBuffers.append("t1", Seq(1L -> "a", 2L -> "b"))
    val q = readPoll("t1").writeStream
      .format("memory")
      .queryName("poll_rows")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    PollBuffers.append("t1", Seq(3L -> "c"))
    q.processAllAvailable()
    // no new data: extra trigger must add nothing
    q.processAllAvailable()
    q.stop()
    val got = spark.table("poll_rows").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("http poll: fetches from a live endpoint, filters by increment_id cursor") {
    // local stub of the reference's /get endpoint
    // (Setup/Streaming_API_Setup.py): a JSON array of
    // {id, data, increment_id} records, mutated between triggers
    @volatile var records = Seq((101L, "<v>a</v>", 1L), (102L, "<v>b</v>", 2L))
    def toJson(rs: Seq[(Long, String, Long)]): String =
      rs.map { case (id, data, inc) =>
        s"""{"id": $id, "data": "$data", "increment_id": $inc}"""
      }.mkString("[", ",", "]")
    val server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext(
      "/get",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = toJson(records).getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    )
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/get"
      PollBuffers.clear("http:" + url)
      val q = spark.readStream
        .format("graft.streaming.PollDataSource")
        .option("url", url)
        .load()
        .writeStream
        .format("memory")
        .queryName("http_poll_rows")
        .outputMode("append")
        .start()
      q.processAllAvailable()
      // endpoint re-serves old records plus one new one: only
      // increment_id > cursor may land
      records = records :+ ((103L, "<v>c</v>", 3L))
      q.processAllAvailable()
      q.processAllAvailable() // no new data: must add nothing
      q.stop()
      val got = spark.table("http_poll_rows").as[(Long, String)].collect().sorted
      assert(got.toSeq == Seq((101L, "<v>a</v>"), (102L, "<v>b</v>"), (103L, "<v>c</v>")))
    } finally server.stop(0)
  }

  test("poll source composes with the archive sink end to end") {
    PollBuffers.clear("t2")
    val archiveDir = tempDir("graft_v2_archive")
    val ckpt       = tempDir("graft_v2_ckpt")
    PollBuffers.append("t2", Seq(10L -> "<v>x</v>", 11L -> "<v>y</v>", 10L -> "<v>x2</v>"))
    val q = ArchiveStream.start(readPoll("t2"), archiveDir, ckpt, watermark = -1L, intervalSeconds = 1)
    q.processAllAvailable()
    q.stop()
    val latest = ArchiveStream
      .latestPerStreamRecord(spark.read.parquet(archiveDir))
      .select($"stream_record_id", $"payload")
      .as[(Long, String)]
      .collect()
      .toMap
    assert(latest == Map(10L -> "<v>x2</v>", 11L -> "<v>y</v>"))
  }
}
