package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video payloads ride through the
 * engine as opaque `binary` columns plus a typed metadata struct. The
 * Spark-side plumbing — schema, batch shape, partition-wise decode —
 * is real; the codec itself is STUBBED with a deterministic fake
 * (this container has no image/audio libraries), clearly marked below.
 *
 * The batch shape mirrors a Pandas-UDF / mapInPandas pipeline: decode
 * runs per partition over an iterator (amortizing per-batch model
 * setup), never per row, and emits fixed-width feature vectors.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("codec", StringType))))))

  /**
   * Synthesize deterministic media payloads for `media_ref`s (the
   * sandbox has no real blobs): payload bytes are a seeded xorshift
   * stream of the ref hash — stable across runs and shuffles.
   */
  def synthesizeMedia(refs: DataFrame, refCol: String = "media_ref"): DataFrame = {
    val spark = refs.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    refs.select(col(refCol).cast("string")).na.drop().distinct()
      .map { r =>
        val ref = r.getString(0)
        var h = ref.hashCode.toLong | 1L
        val kind = (math.abs(h) % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val n = 256 + (math.abs(h) % 768).toInt
        val payload = new Array[Byte](n)
        var i = 0
        while (i < n) { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; payload(i) = h.toByte; i += 1 }
        Row(ref, kind,
          payload, Row(64 + (math.abs(h) % 512).toInt, 64 + (math.abs(h) % 256).toInt,
            (math.abs(h) % 60000).toInt, kind + "/fake"))
      }(enc)
  }

  val FeatureDim = 16

  /**
   * Partition-wise decode + feature extraction (the mapInPandas
   * analog). Batch setup happens once per partition; rows stream
   * through. Output: (media_ref, kind, feature: array<float>).
   *
   * ==== STUB ==== The real implementation would decode the payload
   * (JPEG/PNG/opus/...) and run a feature extractor; this container
   * has no codec libraries, so features are a deterministic fold of
   * the payload bytes into FeatureDim buckets — the plumbing
   * (schema, batching, partitioning) is exactly what a real decoder
   * would use.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType),
      StructField("kind", StringType),
      StructField("feature", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val refIdx = media.schema.fieldIndex("media_ref")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      // per-partition "model" setup would go here (once, not per row)
      it.map { r =>
        // payload is nullable in mediaSchema (a ref whose blob fetch
        // failed); a null decodes to the zero/empty feature instead of
        // killing the stage with an NPE
        val payload0 = r.getAs[Array[Byte]](payloadIdx)
        val payload = if (payload0 == null) Array.emptyByteArray else payload0
        val f = new Array[Float](FeatureDim)
        var i = 0
        while (i < payload.length) {
          f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
        val norm = math.sqrt(f.map(x => x * x).sum).toFloat max 1e-9f
        Row(r.getString(refIdx), r.getString(kindIdx), f.map(_ / norm).toSeq)
      }
    }(enc)
  }

  /** Resize stub: metadata-only transform (a real impl re-encodes the
    * payload; the schema contract is identical). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.duration_ms").as("duration_ms"), col("meta.codec").as("codec")))

  /** Frame-sample stub for video: one synthetic frame row per N ms. */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("frame_idx",
        // integer division: `/` yields DoubleType and sequence()
        // rejects double bounds (DATATYPE_MISMATCH on Spark 4)
        explode(sequence(lit(0L),
          greatest(floor(col("meta.duration_ms") / everyMs).cast("long") - 1, lit(0L)))))
      .select(col("media_ref"), col("frame_idx"),
        xxhash64(col("media_ref"), col("frame_idx")).as("frame_sig"))
}
