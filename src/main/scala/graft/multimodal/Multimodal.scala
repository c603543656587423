package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus batched decode / feature-extraction plumbing.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, null handling. The actual media decode is STUBBED (the
  * container has no image/audio codecs): `decodeStub` derives a
  * deterministic fake feature vector from the payload bytes. Swapping in
  * a real decoder changes ONE function; the distributed plumbing
  * (mapPartitions over batches, like mapInPandas/mapInArrow batch
  * semantics) stays identical.
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

  /** ??? in spirit — deterministic fake "decode" of a payload into a
    * `dim`-float feature vector, derived from the md5 of the bytes.
    * STUB: replace with a real codec (e.g. JNI image decode) in
    * production; everything around it is the real contract.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(dim) { i =>
      val b = digest(i % digest.length)
      // double math then one float rounding — bit-reproducible in ANSI
      // SQL as CAST(b/255.0 - 0.5 AS FLOAT) (float-native division would
      // double-round differently in rare cases)
      ((b.toInt & 0xff) / 255.0 - 0.5).toFloat
    }
  }

  val FeatureSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("feat_dim", IntegerType)
    )
  )

  /** Batched feature extraction: partitions stream through the decoder in
    * `batchSize` groups (the mapInPandas/mapInArrow batch shape — a real
    * decoder would amortize model/codec init per batch, not per row).
    * Rows with NULL payloads are dropped, as a decoder would skip them.
    */
  def extractFeatures(
      packed: DataFrame,
      dim: Int = 16,
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
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init would go here (codec/model handle)
          batch.iterator.collect {
            case (id, payload) if payload != null =>
              (id, decodeStub(payload, dim), dim)
          }
        }
      }
      .toDF("media_id", "features", "feat_dim")
  }

  /** STUB image resize: real implementation decodes, scales to w×h, and
    * re-encodes; the stub derives a deterministic wid×hei-byte payload
    * from the source bytes so the distributed contract (binary->binary,
    * same partitioning, metadata refresh) is real and testable.
    */
  private[multimodal] def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(w * h)(i => (digest(i % digest.length) ^ (i & 0x7f)).toByte)
  }

  /** Resize every payload to `w`×`h` (stubbed decode, see resizeStub) and
    * refresh the typed metadata — a pure map stage over the packed frame.
    */
  def resize(packed: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("modality"), col("payload"), col("meta.mime"))
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.collect {
            case (id, modality, payload, mime) if payload != null =>
              (id, modality, resizeStub(payload, w, h), mime)
          }
        }
      }
      .toDF("media_id", "modality", "payload", "mime")
      .select(
        col("media_id"),
        col("modality"),
        col("payload"),
        struct(
          octet_length(col("payload")).as("n_bytes"),
          col("mime"),
          md5(col("payload")).as("checksum")
        ).as("meta")
      )
  }

  /** STUB video frame sampling: real implementation demuxes and decodes
    * every `stride`-th frame; the stub cuts the payload into fixed-size
    * chunks and keeps every `stride`-th one. Emits one row per sampled
    * frame — the fan-out shape (explode semantics, frame_no ordering,
    * per-frame payloads) is the real contract.
    */
  def sampleFrames(packed: DataFrame, stride: Int, frameBytes: Int = 32): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap {
          case (id, payload) if payload != null =>
            payload
              .grouped(frameBytes)
              .zipWithIndex
              .filter(_._2 % stride == 0)
              .map { case (chunk, i) => (id, i, chunk) }
          case _ => Iterator.empty
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }
}
