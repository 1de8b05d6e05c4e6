package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) is carried as opaque `BINARY` payloads with
  * typed metadata; decode/feature-extraction runs batch-at-a-time inside
  * `mapPartitions` (the Scala analog of mapInPandas), so a real codec can
  * be slotted in per-executor without changing the plan shape. The actual
  * byte→pixels/samples decode is STUBBED (no media libraries in this
  * environment): [[StubCodec]] derives deterministic pseudo-features from
  * the bytes, and is the single seam to replace with a real decoder.
  *
  * Scale design: payload rows are repartitioned before featurize so decode
  * cost spreads evenly even when the upstream layout is skewed (a few
  * giant files); features detach from payloads immediately so downstream
  * plans never reshuffle the heavy binary column.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, bytes: Array[Byte])
  case class MediaFeatures(id: Long, modality: String, n_bytes: Long,
                           head_byte: Int, frame_count: Long, checksum: Long)

  /** STUB: stands in for the per-batch media decoder. Deterministic on the
    * payload bytes; replace with a real codec (image resize, audio
    * resample, video frame-sample) keeping this exact signature. */
  object StubCodec {
    def features(r: MediaRow): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < r.bytes.length) { sum += (r.bytes(i) & 0xff); i += 1 }
      MediaFeatures(
        id = r.id,
        modality = r.modality,
        n_bytes = r.bytes.length.toLong,
        head_byte = if (r.bytes.nonEmpty) r.bytes(0) & 0xff else -1,
        // must agree with sampleFrames' ceil-division frame count
        frame_count = (r.bytes.length.toLong + 255) / 256,
        checksum = sum)
    }
  }

  /** Featurize media payloads batch-at-a-time. `parallelism` controls the
    * pre-decode repartition (0 = keep upstream partitioning). */
  def featurize(media: DataFrame, parallelism: Int = 0): DataFrame = {
    implicit val rowEnc = Encoders.product[MediaRow]
    implicit val featEnc = Encoders.product[MediaFeatures]
    val ds: Dataset[MediaRow] = {
      val base = media.select(col("id"), col("modality"), col("bytes")).as[MediaRow]
      if (parallelism > 0) base.repartition(parallelism) else base
    }
    ds.mapPartitions { it => it.map(StubCodec.features) }.toDF()
  }

  /** Deterministic "resize": nearest-neighbor down-sample of the payload
    * byte stream to `target` bytes (out(i) = bytes(⌊i·n/target⌋)) — the
    * plumbing shape of an image resize with the pixel codec stubbed to
    * byte picking; payloads shorter than `target` pass through unchanged.
    * Replace the inner loop with a real resampler at the StubCodec seam. */
  def resize(media: DataFrame, target: Int): DataFrame = {
    // driver-side validation: a bad target otherwise surfaces as one
    // confusing NegativeArraySizeException per task at runtime
    require(target > 0, s"resize target must be positive, got $target")
    implicit val rowEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
      Encoders.BINARY)
    media.select(col("id"), col("modality"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val n = r.bytes.length
          val out =
            if (n <= target) r.bytes
            else {
              val o = new Array[Byte](target)
              var i = 0
              while (i < target) {
                o(i) = r.bytes((i.toLong * n / target).toInt); i += 1
              }
              o
            }
          (r.id, r.modality, out)
        }
      }
      .toDF("id", "modality", "resized")
  }

  /** Deterministic frame sampling: every `stride`-th 256-byte block of the
    * payload becomes a "frame" row (id, frame_no, frame BINARY) — the
    * shape of video-frame extraction with the codec stubbed to slicing. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    // driver-side validation: stride 0 throws "step cannot be 0" once
    // per task, and a negative stride silently yields ZERO frames —
    // both look like data problems instead of the call-site bug they are
    require(stride > 0, s"frame stride must be positive, got $stride")
    implicit val rowEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.BINARY)
    media.select(col("id"), col("modality"), col("bytes")).as[MediaRow]
      .flatMap { r =>
        val n = r.bytes.length / 256 + (if (r.bytes.length % 256 > 0) 1 else 0)
        (0 until n by stride).map { f =>
          val from = f * 256
          val until = math.min(from + 256, r.bytes.length)
          (r.id, f.toLong, java.util.Arrays.copyOfRange(r.bytes, from, until))
        }
      }
      .toDF("id", "frame_no", "frame")
  }
}
