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
    val rdd = packed
      .select(col("media_id"), col("payload"))
      .rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init would go here (codec/model handle)
          batch.iterator.collect {
            case r: Row if !r.isNullAt(1) =>
              val feats = decodeStub(r.getAs[Array[Byte]](1), dim)
              Row(r.getLong(0), feats.toSeq, dim)
          }
        }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }
}
