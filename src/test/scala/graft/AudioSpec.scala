package graft

import graft.multimodal.{Audio, Multimodal}
import org.apache.spark.sql.functions._

/** The REAL-codec contract of the audio path: RIFF/WAVE encode/parse
  * round-trips exact samples, the parser is a genuine chunk walker (not
  * fixed-offset slicing), malformed payloads are dropped, and the
  * decimating resampler preserves duration.
  */
class AudioSpec extends SparkSpec {

  private def wavOf(samples: Array[Short], rate: Int = 8000): Array[Byte] =
    Audio.encodePcm16Wav(samples, rate)

  test("encode/decode round-trips exact PCM16 samples incl. extremes") {
    val s = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345, -12345)
    val Some((rate, out)) = Audio.decodePcm16(wavOf(s, 44100))
    assert(rate === 44100)
    assert(out.toSeq === s.toSeq)
  }

  test("parser walks chunks: LIST metadata between fmt and data is skipped") {
    // encodePcm16Wav deliberately emits a LIST(INFO) chunk before data —
    // a fixed-offset "parser" slicing at byte 44 would read the LIST
    // header as samples. Verify data follows the LIST chunk in the bytes
    // AND decode still returns the true samples.
    val s   = Array[Short](7, -7, 7)
    val wav = wavOf(s)
    val ascii = new String(wav.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(ascii.indexOf("LIST") > 0 && ascii.indexOf("LIST") < ascii.indexOf("data"))
    assert(Audio.decodePcm16(wav).get._2.toSeq === s.toSeq)
  }

  test("malformed payloads are dropped: truncated, non-RIFF, stereo, data-before-fmt") {
    val s   = Array[Short](1, 2, 3, 4)
    val wav = wavOf(s)
    assert(Audio.decodePcm16(java.util.Arrays.copyOf(wav, wav.length - 3)).isEmpty)
    assert(Audio.decodePcm16("not audio at all".getBytes).isEmpty)
    assert(Audio.decodePcm16(Array.emptyByteArray).isEmpty)
    // flip the channel count to 2 in the fmt chunk (offset 12+8+2)
    val stereo = wav.clone(); stereo(22) = 2; assert(Audio.decodePcm16(stereo).isEmpty)
    // a WAV whose data chunk precedes fmt violates the spec -> None
    val noFmt = wav.clone()
    // overwrite "fmt " fourcc so the walker never sees a format chunk
    noFmt(12) = 'j'.toByte
    assert(Audio.decodePcm16(noFmt).isEmpty)
  }

  test("odd-length unknown chunks honor RIFF padding") {
    // hand-build RIFF with an odd-length junk chunk before fmt/data
    val inner = wavOf(Array[Short](5, -5))
    // splice: RIFF hdr + JUNK(3 bytes + pad) + (fmt..data from inner)
    val tail    = java.util.Arrays.copyOfRange(inner, 12, inner.length)
    val junkLen = 3
    val bb = java.nio.ByteBuffer
      .allocate(12 + 8 + junkLen + 1 + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + 8 + junkLen + 1 + tail.length); bb.put("WAVE".getBytes)
    bb.put("JUNK".getBytes); bb.putInt(junkLen); bb.put(Array[Byte](9, 9, 9)); bb.put(0.toByte)
    bb.put(tail)
    val Some((_, out)) = Audio.decodePcm16(bb.array())
    assert(out.toSeq === Seq[Short](5, -5))
  }

  test("toWavPayload samples are the md5 bytes as LE int16 pairs, cycled") {
    import spark.implicits._
    val df = Seq((1L, "hello audio")).toDF("media_id", "text")
    val packed = Multimodal.pack(df, "media_id", "text", "text", "text/plain")
    val wav = Audio.toWavPayload(packed, sampleRate = 8000, nSamples = 20)
    val payload = wav.select("payload").as[Array[Byte]].head()
    val Some((rate, s)) = Audio.decodePcm16(payload)
    assert(rate === 8000 && s.length === 20)
    val d = java.security.MessageDigest
      .getInstance("MD5").digest("hello audio".getBytes("UTF-8"))
    (0 until 20).foreach { i =>
      val lo = d((2 * i) % 16) & 0xff
      val hi = d((2 * i + 1) % 16) & 0xff
      assert(s(i) === ((hi << 8) | lo).toShort, s"sample $i")
    }
  }

  test("audioStats integer contract on a hand-computed fixture") {
    import spark.implicits._
    val samples = Array[Short](100, -200, 0, -1, 32767, -32768)
    val df = Seq((9L, wavOf(samples, 6000))).toDF("media_id", "payload")
    val row = Audio.audioStats(df).head()
    assert(row.getAs[Int]("sample_rate") === 6000)
    assert(row.getAs[Int]("n_samples") === 6)
    assert(row.getAs[Long]("duration_ms") === 1L) // 6*1000/6000
    assert(row.getAs[Int]("peak_abs") === 32768)  // |Short.MinValue| exact
    val expSumSq = samples.map(v => v.toLong * v).sum
    assert(row.getAs[Long]("sum_sq") === expSumSq)
    // signs: + - 0(+) -  +  -  => crossings at 1,2?,3,4,5: (100,-200)=1,
    // (-200,0): -,+ =1, (0,-1): +,- =1, (-1,32767)=1, (32767,-32768)=1
    assert(row.getAs[Int]("zero_crossings") === 5)
  }

  test("resample decimates, preserves duration, and re-encodes a parseable WAV") {
    import spark.implicits._
    val samples = Array.tabulate(40)(i => (i * 100 - 2000).toShort)
    val df = Seq((3L, wavOf(samples, 8000))).toDF("media_id", "payload")
    val res = Audio.resample(df, factor = 4)
    val payload = res.select("payload").as[Array[Byte]].head()
    val Some((rate, out)) = Audio.decodePcm16(payload)
    assert(rate === 2000)
    assert(out.toSeq === (0 until 10).map(j => samples(4 * j)).toSeq)
    // duration: 40/8000 = 10/2000 = 5 ms on both sides
    val st  = Audio.audioStats(df).head()
    val st2 = Audio.audioStats(res).head()
    assert(st.getAs[Long]("duration_ms") === st2.getAs[Long]("duration_ms"))
    // non-divisible factor drops the row rather than shifting duration
    assert(Audio.resample(df, factor = 3).count() === 0)
  }

  test("stats drop undecodable payloads and keep the typed metadata shape") {
    import spark.implicits._
    val good = wavOf(Array[Short](1, 2))
    val df = Seq(
      (1L, good),
      (2L, "garbage".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val ids = Audio.audioStats(df).select("media_id").as[Long].collect().toSet
    assert(ids === Set(1L))
    val meta = Audio
      .toWavPayload(df.where(col("media_id") === 1), 8000, 4)
      .select(col("meta.mime"), col("meta.n_bytes")).head()
    assert(meta.getString(0) === "audio/wav")
    assert(meta.getInt(1) > 44)
  }
}
