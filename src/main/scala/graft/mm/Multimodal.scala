package graft.mm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video payloads ride through the
 * engine as opaque `binary` columns plus a typed metadata struct.
 *
 * As of round 5 the codecs are REAL — [[Codecs]] wraps the JDK's own
 * image (PNG/JPEG/GIF/BMP via `javax.imageio`) and RIFF/WAVE audio
 * (`javax.sound.sampled`) support, so decode / feature-extract /
 * resize / frame-sample all operate on actual encoded media bytes.
 * (Rounds 3–4 recorded "no media libs in the sandbox" and stubbed the
 * codec; that constraint was wrong — the JDK's `java.desktop` module
 * carries these codecs on every stock JDK 17.)
 *
 * The batch shape mirrors a Pandas-UDF / mapInPandas pipeline: decode
 * runs per partition over an iterator (amortizing per-batch setup),
 * never per driver row, and emits fixed-width feature vectors.
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

  /** Audio synthesis/decode sample rate (8 kHz mono PCM16). */
  val SampleRate = 8000

  /**
   * Synthesize real, decodable media payloads for `media_ref`s (the
   * sandbox has no external blob store): kind and size parameters
   * derive from the ref hash — stable across runs and shuffles — and
   * the payload is genuinely encoded PNG / WAV / animated GIF whose
   * metadata struct carries the TRUE dimensions and duration.
   */
  def synthesizeMedia(refs: DataFrame, refCol: String = "media_ref"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    refs.select(col(refCol).cast("string")).na.drop().distinct()
      .map { r =>
        val ref = r.getString(0)
        val h = ref.hashCode.toLong | 1L
        val s = math.abs(h)
        (s % 3) match {
          case 0 => // image: PNG with a seeded channel pattern
            val w = 16 + (s % 33).toInt; val ht = 16 + (s % 17).toInt
            val png = Codecs.encodePng(w, ht, (x, y) =>
              (((x * 7 + y * 11 + s) % 256).toInt << 16) |
                (((x * 3 + y * 5 + s) % 256).toInt << 8) |
                ((x * 13 + y * 3 + s) % 256).toInt)
            Row(ref, "image", png, Row(w, ht, 0, "image/png"))
          case 1 => // audio: 16-bit mono PCM WAV, seeded samples
            val n = 800 + (s % 800).toInt
            val samples = Array.tabulate(n)(i =>
              (((i.toLong * i % 7919) + i * 31 + s) % 65536 - 32768).toShort)
            val wav = Codecs.encodeWavPcm16(samples, SampleRate)
            Row(ref, "audio", wav, Row(0, 0, n * 1000 / SampleRate, "audio/wav"))
          case _ => // video: animated GIF, gray frames (exact palette)
            val f = 2 + (s % 4).toInt; val w = 24; val ht = 16
            val frames = (0 until f).map { fi =>
              (Array.tabulate(w * ht) { i =>
                val v = ((i % w) * 7 + (i / w) * 11 + fi * 37 + s % 97).toInt % 256
                0xff000000 | (v << 16) | (v << 8) | v
              }, 8)
            }
            val gif = Codecs.encodeGifAnim(w, ht, frames)
            Row(ref, "video", gif, Row(w, ht, f * 80, "video/gif"))
        }
      }(enc)
  }

  val FeatureDim = 16

  /**
   * Partition-wise decode + feature extraction (the mapInPandas
   * analog). Batch setup happens once per partition; rows stream
   * through. Output: (media_ref, kind, feature: array<float>).
   *
   * Features (all from REAL decoded media, L2-normalized):
   *  - image: 4x4 area-average gray grid (16 dims)
   *  - audio: RMS energy over 16 equal sample windows
   *  - video: per-frame 4x4 gray grids averaged across frames
   * A payload that fails to decode yields a NULL feature (a corrupt
   * blob in a 100 TB corpus must not kill the stage; callers filter).
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType),
      StructField("kind", StringType),
      StructField("feature", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val refIdx = media.schema.fieldIndex("media_ref")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      // per-partition setup (once, not per row): the codec init —
      // ImageIO plugin scan + cache toggle — happens on first use here
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val kind = r.getString(kindIdx)
        val f: Array[Float] =
          if (payload == null) null
          else try {
            kind match {
              case "image" => gridFeature(Codecs.decodeImage(payload))
              case "audio" =>
                val (samples, _) = Codecs.decodeWav(payload)
                val out = new Array[Float](FeatureDim)
                if (samples.nonEmpty) {
                  var w = 0
                  while (w < FeatureDim) {
                    val lo = w * samples.length / FeatureDim
                    val hi = math.max(lo + 1, (w + 1) * samples.length / FeatureDim)
                    var acc = 0.0; var i = lo
                    while (i < hi) { val v = samples(i) / 32768.0; acc += v * v; i += 1 }
                    out(w) = math.sqrt(acc / (hi - lo)).toFloat
                    w += 1
                  }
                }
                out
              case "video" =>
                val frames = Codecs.decodeGifFrames(payload)
                val out = new Array[Float](FeatureDim)
                for ((img, _) <- frames) {
                  val g = gridFeature(img)
                  var i = 0
                  while (i < FeatureDim) { out(i) += g(i) / frames.size; i += 1 }
                }
                out
              case _ => null
            }
          } catch { case _: Exception => null }
        val feat =
          if (f == null) null
          else {
            val norm = math.sqrt(f.map(x => x.toDouble * x).sum).max(1e-9)
            f.map(x => (x / norm).toFloat).toSeq
          }
        Row(r.getString(refIdx), kind, feat)
      }
    }(enc)
  }

  /** 4x4 area-average gray grid of a decoded image, each cell the
    * mean (r+g+b)/3 scaled to [0,1]. */
  private def gridFeature(img: Codecs.Image): Array[Float] = {
    val small = Codecs.resample(img, 4, 4)
    small.argb.map { p =>
      (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / (3f * 255f)
    }
  }

  /** Real image resize: decode → exact area-average resample →
    * re-encode as PNG, metadata updated to the new true dimensions.
    * Non-image rows pass through untouched. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(media.schema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (r.getString(kindIdx) != "image" || payload == null) r
        else try {
          val src = Codecs.decodeImage(payload)
          // already at target size: keep the original bytes (no lossy
          // surprise for JPEG inputs, no wasted re-encode)
          if (src.width == w && src.height == h) r
          else {
            val img = Codecs.resample(src, w, h)
            val png = Codecs.encodePngPixels(w, h, img.argb)
            val meta = r.getStruct(metaIdx)
            val vals = r.toSeq.toArray
            vals(payloadIdx) = png
            vals(metaIdx) = Row(w, h, if (meta != null) meta.getInt(2) else 0, "image/png")
            Row(vals: _*)
          }
        } catch {
          // same corrupt-blob contract as extractFeatures: one bad
          // payload in a 100 TB corpus must not kill the stage — the
          // row passes through unresized for downstream auditing
          case _: Exception => r
        }
      }
    }(enc)
  }

  /**
   * Real video frame sampling: decode the animated GIF, accumulate
   * per-frame delays (centiseconds → ms), and emit the frame SHOWN at
   * each `everyMs` tick across the true duration — (media_ref,
   * frame_idx = tick number, shown_frame = decoded frame index,
   * frame_lum = exact luminance sum of that frame's pixels).
   */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType),
      StructField("frame_idx", LongType),
      StructField("shown_frame", IntegerType),
      StructField("frame_lum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val refIdx = media.schema.fieldIndex("media_ref")
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.filter(r => r.getString(kindIdx) == "video" && r.getAs[Array[Byte]](payloadIdx) != null)
      .mapPartitions { it =>
        it.flatMap { r =>
          val ref = r.getString(refIdx)
          // corrupt-blob contract (same as extractFeatures): an
          // undecodable "video" payload contributes no frames instead
          // of failing the stage
          val frames =
            try Codecs.decodeGifFrames(r.getAs[Array[Byte]](payloadIdx))
            catch { case _: Exception => Seq.empty }
          if (frames.isEmpty) Iterator.empty else {
          val startsMs = frames.scanLeft(0L) { case (t, (_, d)) => t + d * 10L }
          val durationMs = startsMs.last
          val lums = frames.map(_._1.lumSum)
          val ticks = math.max(1L, durationMs / everyMs)
          (0L until ticks).iterator.map { t =>
            val at = t * everyMs
            // frame shown at `at`: last frame whose start <= at
            var f = frames.size - 1
            while (f > 0 && startsMs(f) > at) f -= 1
            Row(ref, t, f, lums(f))
          }
          }
        }
      }(enc)
  }
}
