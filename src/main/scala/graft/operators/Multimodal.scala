package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.plans.SketchExpressions

/** Multimodal column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in executor-side BATCHES — the Scala
  * analogue of `mapInPandas` (an iterator of fixed-size batches per
  * partition, amortizing per-batch setup exactly like an Arrow batch).
  *
  * DECODE IS STUBBED: this container ships no image/audio codecs, so the
  * byte-level decoders below are deterministic fakes computed from the
  * payload (clearly marked). Everything AROUND the stub — schemas, batch
  * iteration shape, explode semantics, feature-vector plumbing into the ANN
  * operators, fan-out partitioning — is real and tested. Swapping the stub
  * body for javax.imageio / ffmpeg bindings changes no signatures.
  *
  * Scale notes: media payloads dominate row size, so (1) operators never
  * carry the raw bytes past the stage that needs them (select away), and
  * (2) decode-class work (ms per row) is exactly the case where an explicit
  * `repartition` fan-out before the narrow stage pays — unlike cheap text
  * metrics (see SparkEntry note), decode hours dwarf exchange seconds.
  */
object Multimodal {

  /** mapInPandas-equivalent batch size (rows per in-memory batch). */
  val batchSize = 64

  case class DecodedMeta(media_id: Long, width: Int, height: Int, format: String)
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])
  case class Feature(media_id: Long, feature: Array[Float])

  // ---------------------------------------------------------------- stubs
  // STUB: deterministic fake "decode" from payload length/bytes. Replace
  // with a real codec; the (width, height, format) contract stays.
  private[operators] def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val len = bytes.length
    ((len % 512) + 16, ((len / 512) % 512) + 16, if (len % 2 == 0) "png" else "jpeg")
  }

  // STUB: fake duration — 2 ms per payload byte.
  private[operators] def probeDurationMsStub(bytes: Array[Byte]): Long = bytes.length * 2L

  // STUB: fake frame extraction — frame bytes are a deterministic 16-byte
  // tag; a real impl returns the decoded frame image.
  private[operators] def extractFrameStub(bytes: Array[Byte], tsMs: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(16).putLong(bytes.length.toLong).putLong(tsMs).array()

  /** Decode image metadata per media row. Batched mapPartitions: the
    * `grouped(batchSize)` shape is where a real impl would hand one batch to
    * a native decoder (exactly the Arrow-batch contract of mapInPandas). */
  def decodeImages(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, fmt) = decodeImageStub(bytes)
            DecodedMeta(id, w, h, fmt)
          }
        }
      }
  }

  /** Frame sampling: one output row per `everyMs` of (stub-probed) duration.
    * Real contract: video bytes in, (media_id, frame_idx, ts_ms, frame) out;
    * the explode happens executor-side, so a 2-hour video never concentrates
    * on the driver. */
  def sampleFrames(media: DataFrame, everyMs: Long, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val duration = probeDurationMsStub(bytes)
          (0L to duration / everyMs).iterator.zipWithIndex.map { case (k, idx) =>
            val ts = k * everyMs
            Frame(id, idx, ts, extractFrameStub(bytes, ts))
          }
        }
      }
  }

  /** Feature extraction: media bytes → `array<float>` embedding column,
    * directly consumable by [[Similarity]] operators. STUB features are
    * xxhash-derived unit-ish vectors; real impl = model inference per batch.
    * Includes the fan-out that decode-class work justifies (see scaladoc). */
  def extractFeatures(media: DataFrame, dim: Int = 64, idCol: String = "media_id",
      bytesCol: String = "content", fanOut: Boolean = true): Dataset[Feature] = {
    import media.sparkSession.implicits._
    val spread =
      if (fanOut) media.repartition(media.sparkSession.sparkContext.defaultParallelism)
      else media
    spread.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            // STUB: deterministic pseudo-embedding from payload hash
            val h0 = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                bytes.length, 42L)
            val v = new Array[Float](dim)
            var i = 0
            while (i < dim) {
              val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h0, i)
              v(i) = (h.toDouble / Long.MaxValue).toFloat
              i += 1
            }
            Feature(id, v)
          }
        }
      }
  }

  /** Resize: metadata-level resample (stub keeps a deterministic checksum of
    * what a real resampler would emit). Contract: (id, w, h, resized bytes). */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      idCol: String = "media_id", bytesCol: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            // STUB: resized payload = 4-byte-per-pixel deterministic fill tag
            val tag = java.nio.ByteBuffer.allocate(20)
              .putLong(id).putInt(width).putInt(height).putInt(bytes.length).array()
            (id, width, height, tag)
          }
        }
      }.toDF(idCol, "width", "height", "resized")
  }
}
