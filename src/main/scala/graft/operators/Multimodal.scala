package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in executor-side BATCHES — the Scala
  * analogue of `mapInPandas` (an iterator of fixed-size batches per
  * partition, amortizing per-batch setup exactly like an Arrow batch).
  *
  * IMAGE DECODE IS REAL: PNG/JPEG payloads are decoded with the JDK's
  * `javax.imageio` (ships in the JRE, no external codecs needed) — metadata,
  * pixel statistics, resize, and feature extraction all operate on actual
  * decoded rasters. Only VIDEO frame probing remains a clearly-marked stub
  * (the JDK ships no video codec); its batch/explode plumbing is real.
  *
  * Scale notes: media payloads dominate row size, so (1) operators never
  * carry the raw bytes past the stage that needs them (select away), and
  * (2) decode-class work (ms per row) is exactly the case where an explicit
  * `repartition` fan-out before the narrow stage pays — unlike cheap text
  * metrics (see SparkEntry note), decode hours dwarf exchange seconds.
  */
object Multimodal {

  // Avoid ImageIO's default tmp-file disk cache: per-image tmp writes on an
  // executor hot path would turn a CPU decode into an IO bind.
  ImageIO.setUseCache(false)

  /** mapInPandas-equivalent batch size (rows per in-memory batch). */
  val batchSize = 64

  case class DecodedMeta(media_id: Long, width: Int, height: Int, format: String)
  case class PixelStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])
  case class Feature(media_id: Long, feature: Array[Float])

  // ----------------------------------------------------- synthetic corpus
  /** Deterministic synthetic image for id: dimensions and every RGB pixel
    * are closed-form functions of (id, x, y), so an independent oracle
    * (DuckDB arithmetic over generate_series) can predict the decoded
    * raster without ever touching ImageIO. Even ids encode lossless PNG;
    * odd ids encode JPEG (lossy — dims/format still exact, pixels not). */
  def syntheticImage(id: Long): Array[Byte] = {
    val w = 16 + (id % 48).toInt
    val h = 16 + ((id / 7) % 40).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + y * 13 + id * 31) % 256).toInt
        val g = ((x * 3 + y * 5 + id * 17) % 256).toInt
        val b = ((x * 11 + y * 2 + id * 7) % 256).toInt
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    encodeImage(img, if (id % 2 == 0) "png" else "jpg")
  }

  // ------------------------------------------------------------ real codec
  /** Decode bytes via ImageIO: (raster, lowercase format name). Throws on
    * payloads no installed reader claims — callers that must tolerate
    * corrupt media should pre-filter with [[isDecodable]]. */
  private[operators] def decodeImage(bytes: Array[Byte]): (BufferedImage, String) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for payload of ${bytes.length} bytes")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.read(0), reader.getFormatName.toLowerCase)
      } finally reader.dispose()
    } finally iis.close()
  }

  private[operators] def encodeImage(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** True iff some installed ImageIO reader claims the payload. */
  def isDecodable(bytes: Array[Byte]): Boolean = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try ImageIO.getImageReaders(iis).hasNext finally iis.close()
  }

  // STUB (video only): the JDK ships no video codec, so duration probing is
  // a deterministic fake — 2 ms per payload byte. The explode/batch plumbing
  // around it is real; swapping in an ffmpeg binding changes no signatures.
  private[operators] def probeDurationMsStub(bytes: Array[Byte]): Long = bytes.length * 2L

  // STUB (video only): fake frame extraction — frame bytes are a
  // deterministic 16-byte tag; a real impl returns the decoded frame image.
  private[operators] def extractFrameStub(bytes: Array[Byte], tsMs: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(16).putLong(bytes.length.toLong).putLong(tsMs).array()

  // -------------------------------------------------------------- operators
  /** Decode image metadata per media row (REAL ImageIO decode). Batched
    * mapPartitions: `grouped(batchSize)` is where per-batch decoder setup is
    * amortized (the Arrow-batch contract of mapInPandas). */
  def decodeImages(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (img, fmt) = decodeImage(bytes)
            DecodedMeta(id, img.getWidth, img.getHeight, fmt)
          }
        }
      }
  }

  /** Per-image channel sums over the REAL decoded raster. Exact for
    * lossless formats (PNG); JPEG rasters are decoder-defined. */
  def imagePixelStats(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (img, _) = decodeImage(bytes)
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            PixelStats(id, w, h, sr, sg, sb)
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

  /** Feature extraction from REAL decoded pixels: a normalized luminance
    * histogram (`dim` bins over [0,256)) — deterministic, scale-independent,
    * and directly consumable by [[Similarity]] operators. A model-inference
    * impl would replace only the per-image body; the fan-out stays (decode
    * hours dwarf exchange seconds, see scaladoc). */
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
            val (img, _) = decodeImage(bytes)
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val v = new Array[Float](dim)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              v(lum * dim / 256) += 1f
              i += 1
            }
            val n = px.length.toFloat
            var j = 0
            while (j < dim) { v(j) /= n; j += 1 }
            Feature(id, v)
          }
        }
      }
  }

  /** Resize via REAL raster resample (Graphics2D bilinear), re-encoded PNG.
    * Contract: (id, w, h, resized bytes) — the output is itself decodable. */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      idCol: String = "media_id", bytesCol: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (img, _) = decodeImage(bytes)
            val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
            } finally g.dispose()
            (id, width, height, encodeImage(out, "png"))
          }
        }
      }.toDF(idCol, "width", "height", "resized")
  }
}
