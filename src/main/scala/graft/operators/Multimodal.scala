package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

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
  * decoded rasters. VIDEO is real for MJPEG-in-AVI ([[MjpegAvi]]: pure-JVM
  * RIFF demux; every frame chunk is a JPEG blob ImageIO decodes) —
  * [[probeVideos]]/[[sampleVideoFrames]] parse actual containers and decode
  * actual frames. Non-MJPEG codecs (H.264 …) still need an external
  * decoder; [[sampleFrames]] keeps the codec-agnostic stub plumbing for
  * that case, clearly marked.
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
  case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, peak: Long, sum_abs: Long)
  case class AudioWindow(media_id: Long, win_idx: Int, n_samples: Long, sum_sq: Long)
  case class AudioFp(media_id: Long, n_windows: Int, fp: Long)
  case class PixelStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])
  case class Feature(media_id: Long, feature: Array[Float])
  case class DHash(media_id: Long, dhash_hi: Long, dhash_lo: Long)
  case class PHash(media_id: Long, phash: Long, n_bits: Long)

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

  /** Deterministic synthetic PCM16 mono WAV for id: sample rate, length and
    * every 16-bit sample are closed-form integer functions of (id, i), so an
    * independent oracle (DuckDB arithmetic over ranges) predicts the decoded
    * stream without touching an audio codec — the audio twin of
    * [[syntheticImage]]. PCM is lossless: decode returns the exact ints. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = Array(8000, 11025, 16000, 22050)((id % 4).toInt)
    val n = 256 + (id % 512).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2)      // block align
      .putShort(16)     // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 17) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decode a WAV payload with the JDK's `javax.sound.sampled` (REAL codec,
    * ships in the JRE): returns (sampleRate, channels, interleaved PCM16
    * samples). Throws on payloads the sound stack cannot parse or on
    * non-16-bit encodings — tolerate-and-skip callers pre-filter. */
  private[operators] def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected PCM16, got $fmt")
      val raw = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(); i += 1 }
      (fmt.getSampleRate.toInt, fmt.getChannels, out)
    } finally ais.close()
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

  // STUB (non-MJPEG video only — MJPEG/AVI is REAL via MjpegAvi): no JVM
  // decoder exists for H.264-class codecs, so duration probing here is a
  // deterministic fake — 2 ms per payload byte. The explode/batch plumbing
  // around it is real; swapping in an ffmpeg binding changes no signatures.
  private[operators] def probeDurationMsStub(bytes: Array[Byte]): Long = bytes.length * 2L

  // STUB (non-MJPEG video only): fake frame extraction — frame bytes are a
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

  /** Decode audio metadata + exact integer sample statistics per media row
    * (REAL `javax.sound` decode — PCM is lossless, so stats are exact and
    * engine-independent). peak = max |sample| as a long (|Short.MinValue|
    * overflows Short); sum_abs is the exact L1 mass. Batched like
    * [[decodeImages]]. */
  def decodeAudio(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (rate, ch, samples) = decodeWav(bytes)
            var peak = 0L; var sumAbs = 0L
            var i = 0
            while (i < samples.length) {
              val a = math.abs(samples(i).toLong)
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            AudioMeta(id, rate, ch, samples.length.toLong / ch, peak, sumAbs)
          }
        }
      }
  }

  /** Windowed audio energy: chunk the REAL decoded sample stream into
    * `windowSamples`-sample windows and emit exact per-window sum of squares
    * — the framing step under any spectral/VAD feature extractor. The
    * explode happens executor-side ([[sampleFrames]] contract): a long
    * recording fans out to rows without driver involvement. Mono input. */
  def audioWindowEnergy(media: DataFrame, windowSamples: Int,
      idCol: String = "media_id", bytesCol: String = "content"): Dataset[AudioWindow] = {
    require(windowSamples > 0, "windowSamples must be positive")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (_, _, samples) = decodeWav(bytes)
          samples.grouped(windowSamples).zipWithIndex.map { case (win, w) =>
            var sq = 0L
            var i = 0
            while (i < win.length) { val v = win(i).toLong; sq += v * v; i += 1 }
            AudioWindow(id, w, win.length.toLong, sq)
          }
        }
      }
  }

  /** Image near-duplicate pairs: [[imageDHash]] banded into 4 × 16-bit
    * buckets (the SimHash machinery on the 64 gradient bits), candidates
    * verified by total Hamming distance ≤ `maxHamming` — the end-to-end
    * "find duplicate images" operator (a re-encoded/brightness-shifted
    * copy keeps its gradient signs, so it lands in the same buckets at
    * Hamming 0). One narrow decode pass; the self-join carries
    * (id, two i32 halves) only — 16 bytes/image, hot buckets bounded by
    * the skew guard. */
  def imageDupPairs(media: DataFrame, maxHamming: Int = 10,
      maxBucket: Int = 4096, idCol: String = "media_id",
      bytesCol: String = "content"): DataFrame = {
    val h = imageDHash(media, idCol, bytesCol).toDF()
      .select(col("media_id").as("id"), col("dhash_hi"), col("dhash_lo"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = h.select(col("id"),
        struct(col("dhash_hi"), col("dhash_lo")).as("sig"),
        explode(transform(sequence(lit(0), lit(3)), b => struct(
          b.cast("int").as("band"),
          when(b < 2,
            call_function("shiftright", col("dhash_lo"), (b * 16).cast("int"))
              .bitwiseAND(0xFFFFL))
            .otherwise(
              call_function("shiftright", col("dhash_hi"), ((b - 2) * 16).cast("int"))
                .bitwiseAND(0xFFFFL)).as("key")))).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    graft.operators.SkewGuard.guardedSelfJoinPairs(banded, Seq("band", "key"),
        idCol = "id", payloadCol = "sig", maxBucket = maxBucket, label = "image_dup")
      .join(h.select(col("id").as("id_a"),
        col("dhash_hi").as("ha"), col("dhash_lo").as("la")), "id_a")
      .join(h.select(col("id").as("id_b"),
        col("dhash_hi").as("hb"), col("dhash_lo").as("lb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (graft.functions.HashFunctions.hamming64(col("ha"), col("hb")) +
          graft.functions.HashFunctions.hamming64(col("la"), col("lb")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Perceptual audio fingerprint — the audio twin of [[imageDHash]]:
    * sign-of-delta over consecutive window energies (bit k = 1 iff
    * energy(k+1) > energy(k)), the energy-envelope shape a re-encoded or
    * gain-shifted copy of the same recording preserves better than raw
    * samples. Exact integer arithmetic end-to-end (window energies are
    * integer sums of squares), so equal PCM fingerprints equal across
    * machines and an arithmetic oracle reproduces the bits. Bits beyond 64
    * energy deltas are truncated (`n_windows` reports the full count) —
    * at real recording lengths callers pick `windowSamples` so the
    * envelope fits, exactly like dHash's fixed 9×8 grid. One narrow
    * decode pass, 12 bytes/recording to any downstream band-join. */
  def audioFingerprint(media: DataFrame, windowSamples: Int,
      idCol: String = "media_id", bytesCol: String = "content"): Dataset[AudioFp] = {
    require(windowSamples > 0, "windowSamples must be positive")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (_, _, samples) = decodeWav(bytes)
          val energies = samples.grouped(windowSamples).map { win =>
            var sq = 0L
            var i = 0
            while (i < win.length) { val v = win(i).toLong; sq += v * v; i += 1 }
            sq
          }.toArray
          var fp = 0L
          var k = 0
          while (k < energies.length - 1 && k < 64) {
            if (energies(k + 1) > energies(k)) fp |= 1L << k
            k += 1
          }
          AudioFp(id, energies.length, fp)
        }
      }
  }

  /** Deterministic synthetic MJPEG/AVI video for id — the video twin of
    * [[syntheticImage]]: frame count, fps, dimensions, and every frame's
    * raster are closed-form in (id, frame, x, y), so container metadata is
    * oracle-predictable by pure arithmetic while the payload is a REAL AVI
    * that [[MjpegAvi.demux]] (or any MJPEG player) parses. fps values all
    * divide 1e6 exactly, keeping µs-per-frame and duration integer-exact. */
  def syntheticVideo(id: Long): Array[Byte] = {
    val n = 4 + (id % 5).toInt
    val fps = Array(5, 10, 25)((id % 3).toInt)
    val w = 32 + (id % 16).toInt
    val h = 24 + (id % 12).toInt
    val frames = (0 until n).map { k =>
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 7 + y * 13 + id * 31 + k * 41) % 256).toInt
          val g = ((x * 3 + y * 5 + id * 17 + k * 29) % 256).toInt
          val b = ((x * 11 + y * 2 + id * 7 + k * 23) % 256).toInt
          px(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      encodeImage(img, "jpg")
    }
    MjpegAvi.mux(frames, w, h, fps)
  }

  case class VideoProbe(media_id: Long, n_frames: Int, width: Int, height: Int,
      us_per_frame: Long, duration_ms: Long)
  case class VideoFrame(media_id: Long, sample_idx: Int, ts_ms: Long,
      frame_idx: Int, frame_w: Int, frame_h: Int)

  /** REAL video metadata per media row: parse the AVI container headers
    * (no frame bytes touched — probing a 2-hour video costs a header walk). */
  def probeVideos(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[VideoProbe] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val m = MjpegAvi.probe(bytes)
            VideoProbe(id, m.nFrames, m.width, m.height, m.usPerFrame, m.durationMs)
          }
        }
      }
  }

  /** REAL frame sampling over MJPEG/AVI payloads: demux the container, pick
    * the frame covering each `everyMs` grid point (`ts·1000 / µsPerFrame`,
    * clamped to the last frame), and DECODE it with ImageIO — the output
    * carries the decoded dimensions as proof the frame bytes are a real
    * image, not a tag. Executor-side explode: a long video becomes many
    * rows on its executor, never on the driver. */
  def sampleVideoFrames(media: DataFrame, everyMs: Long, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (meta, frames) = MjpegAvi.demux(bytes)
          Iterator.from(0).map(_.toLong * everyMs)
            .takeWhile(_ < meta.durationMs).zipWithIndex
            .map { case (ts, sampleIdx) =>
              val fi = math.min(meta.nFrames - 1L, ts * 1000L / meta.usPerFrame).toInt
              val (img, _) = decodeImage(frames(fi))
              VideoFrame(id, sampleIdx, ts, fi, img.getWidth, img.getHeight)
            }
        }
      }
  }

  /** Frame sampling: one output row per `everyMs` of (stub-probed) duration.
    * Codec-agnostic STUB plumbing for formats the JVM cannot decode
    * (H.264 …): video bytes in, (media_id, frame_idx, ts_ms, frame) out;
    * the explode happens executor-side, so a 2-hour video never concentrates
    * on the driver. For MJPEG/AVI use the REAL [[sampleVideoFrames]]. */
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

  /** Per-frame content hashes of REAL MJPEG/AVI videos: demux each
    * container executor-side and hash every frame's encoded bytes
    * (xxhash64) — 8 bytes per frame to any downstream join, the raw
    * payload never leaves its scan stage. Exact frame-level identity:
    * equal frame bytes ⟺ equal hash (mod the 2⁻⁶⁴ collision caveat). */
  def videoFrameHashes(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (_, frames) = MjpegAvi.demux(bytes)
          frames.iterator.zipWithIndex.map { case (fb, i) => (id, i, fb) }
        }
      }
      .toDF("media_id", "frame_idx", "frame")
      .select(col("media_id"), col("frame_idx"), xxhash64(col("frame")).as("fh"))
  }

  /** Video near-duplicate pairs by shared-frame counting — the video twin
    * of [[imageDupPairs]]: two videos are near-dups when they share at
    * least `minShared` distinct frames (full re-uploads share all frames,
    * trims/edits share most). Candidates come from an inverted index on
    * the frame hash, so the join shuffles 8-byte keys, never frames; a
    * frame shared by more than `maxDf` videos (intro cards, black frames)
    * is dropped from candidate generation with the count observable in the
    * plan metrics — the d35 hot-shingle stance, bounding pair generation
    * at Σdf² instead of quadratic blowup.
    *
    * Returns (id_a, id_b, n_shared, n_frames_a, n_frames_b) with
    * id_a < id_b; frame counts are DISTINCT-frame counts, the denominator
    * for any downstream containment/Jaccard score. */
  def videoDupPairs(media: DataFrame, minShared: Int = 3, maxDf: Int = 64,
      idCol: String = "media_id", bytesCol: String = "content"): DataFrame =
    videoDupPairsWithRelease(media, minShared, maxDf, idCol, bytesCol)._1

  /** [[videoDupPairs]] plus a release hook for the persisted frame-hash
    * relation (the packEpoch convention): long-lived sessions call the
    * hook after materializing the result so repeated invocations don't
    * accumulate cache entries until a clearCache. The no-hook overload
    * keeps the one-shot/gate ergonomics. */
  def videoDupPairsWithRelease(media: DataFrame, minShared: Int = 3, maxDf: Int = 64,
      idCol: String = "media_id", bytesCol: String = "content"): (DataFrame, () => Unit) = {
    // persisted for the three consumers below (frame counts, df cap,
    // candidate join)
    val fhs = videoFrameHashes(media, idCol, bytesCol)
      .select(col("media_id"), col("fh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFrames = fhs.groupBy("media_id").agg(count(lit(1)).as("nf"))
    val kept = fhs.join(
      fhs.groupBy("fh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("fh"), "fh")
    val a = kept.select(col("fh"), col("media_id").as("id_a"))
    val b = kept.select(col("fh"), col("media_id").as("id_b"))
    val pairs = a.join(b, Seq("fh")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(nFrames.select(col("media_id").as("id_a"), col("nf").as("n_frames_a")), "id_a")
      .join(nFrames.select(col("media_id").as("id_b"), col("nf").as("n_frames_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("n_frames_a"), col("n_frames_b"))
    (pairs, () => { fhs.unpersist(); () })
  }

  /** Perceptual difference-hash (dHash) over the REAL decoded raster — the
    * standard near-duplicate signature for images (a resized/re-encoded/
    * slightly-edited copy keeps the same gradient signs): integer-luma
    * grayscale, block-mean downsample to a 9×8 grid, one bit per adjacent
    * horizontal cell pair (right > left). 64 bits, emitted as two 32-bit
    * halves (hi = bits 32–63) so no engine has to build a value with bit
    * 63 set. Every step is EXACT integer arithmetic — luma
    * (299r+587g+114b)/1000 and floor block means — so on lossless inputs
    * an arithmetic oracle reproduces the hash bit-for-bit, and equal
    * rasters hash equal across machines (no float resize in the loop).
    * Near-dup pairs then come from banding the i64 exactly like
    * [[Dedup.simHashPairs]] — one narrow decode pass, 16 bytes/image to
    * any downstream join.
    *
    * Images smaller than the 9×8 grid (tracking pixels, spacers — common
    * in real web corpora) would leave grid cells empty under block-mean
    * (`cx = x*9/w` skips cells when w<9), so empty cells borrow the
    * nearest filled cell in their row band (same source rows — a flat
    * column stays flat), and fully-empty row bands copy the nearest
    * filled band. Still exact integer arithmetic, and a no-op whenever
    * every cell has ≥1 pixel (w≥9 and h≥8). */
  def imageDHash(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[DHash] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (img, _) = decodeImage(bytes)
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val sums = new Array[Long](8 * 9)
            val cnts = new Array[Long](8 * 9)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val cx = x * 9 / w
                val p = px(y * w + x)
                val gray = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
                  (p & 0xff) * 114) / 1000
                sums(cy * 9 + cx) += gray
                cnts(cy * 9 + cx) += 1
                x += 1
              }
              y += 1
            }
            // backfill cells left empty by a sub-grid raster (w<9 or h<8):
            // within a partially-filled band borrow the nearest filled cell
            // of the SAME band (it averages the same source rows, so a flat
            // column stays flat); fully-empty bands then copy the nearest
            // filled band. Nearest prefers the lower index — deterministic.
            if (w < 9 || h < 8) {
              var bcy = 0
              while (bcy < 8) {
                // y=0 maps to band 0, so band 0 is always filled; a band is
                // either fully empty or has its columns at x*9/w filled
                var has = false
                var bcx = 0
                while (bcx < 9) { if (cnts(bcy * 9 + bcx) > 0) has = true; bcx += 1 }
                if (has) {
                  bcx = 0
                  while (bcx < 9) {
                    if (cnts(bcy * 9 + bcx) == 0) {
                      var d = 1; var src = -1
                      while (src < 0) {
                        if (bcx - d >= 0 && cnts(bcy * 9 + bcx - d) > 0) src = bcx - d
                        else if (bcx + d < 9 && cnts(bcy * 9 + bcx + d) > 0) src = bcx + d
                        else d += 1
                      }
                      sums(bcy * 9 + bcx) = sums(bcy * 9 + src)
                      cnts(bcy * 9 + bcx) = cnts(bcy * 9 + src)
                    }
                    bcx += 1
                  }
                }
                bcy += 1
              }
              bcy = 0
              while (bcy < 8) {
                if (cnts(bcy * 9) == 0) { // post-fill, empty band ⇔ cell 0 empty
                  var d = 1; var src = -1
                  while (src < 0) {
                    if (bcy - d >= 0 && cnts((bcy - d) * 9) > 0) src = bcy - d
                    else if (bcy + d < 8 && cnts((bcy + d) * 9) > 0) src = bcy + d
                    else d += 1
                  }
                  var bcx = 0
                  while (bcx < 9) {
                    sums(bcy * 9 + bcx) = sums(src * 9 + bcx)
                    cnts(bcy * 9 + bcx) = cnts(src * 9 + bcx)
                    bcx += 1
                  }
                }
                bcy += 1
              }
            }
            var hi = 0L; var lo = 0L
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                val left = sums(cy * 9 + cx) / cnts(cy * 9 + cx)
                val right = sums(cy * 9 + cx + 1) / cnts(cy * 9 + cx + 1)
                if (right > left) {
                  val k = cy * 8 + cx
                  if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
                }
                cx += 1
              }
              cy += 1
            }
            DHash(id, hi, lo)
          }
        }
      }
  }

  /** DCT perceptual hash (pHash) over the REAL decoded raster — the
    * frequency-domain near-duplicate signature: where dHash signs local
    * gradients, pHash signs the image's low-frequency STRUCTURE, so it
    * survives blur/noise/re-encode edits that flip individual gradient
    * bits. Pipeline: integer luma, nearest-neighbor floor-sample to a
    * 32×32 grid (exact integers — no float resize, no empty-cell handling
    * at any input size), unscaled 2-D DCT-II cosine sums over the grid,
    * top-left 8×8 coefficient block minus DC = 63 AC coefficients, one bit
    * each for coefficient > median (the 32nd order statistic of the 63).
    *
    * Determinism contract: the grid is exact integer arithmetic; the DCT
    * accumulates `g * C(u,x) * C(v,y)` left-to-right with y outer / x
    * inner, so an independent replay using the same order agrees to float
    * noise, and the fixture generator asserts every coefficient clears the
    * median by a margin — a bit that could flip under last-ulp cosine
    * drift fails at generation time. The median element itself compares
    * `> median` false in any implementation (it IS the median), so its bit
    * is stably 0. Orthonormal DCT scaling is deliberately omitted: bits
    * only compare coefficients to their median, and the unscaled sums keep
    * the replay contract free of per-coefficient factors.
    *
    * Scale shape: one decode pass, 8 bytes/image downstream — banding +
    * verify reuse [[Dedup.simHashPairs]] machinery exactly like dHash. */
  def imagePHash(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "content"): Dataset[PHash] = {
    import media.sparkSession.implicits._
    // cosine tables are per-JVM constants (pi*(2x+1)*u/64 over exact ints)
    val cosT = Array.tabulate(8, 32) { (u, x) =>
      math.cos(math.Pi * (2 * x + 1) * u / 64.0)
    }
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (img, _) = decodeImage(bytes)
            val w = img.getWidth; val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val g = Array.ofDim[Long](32, 32)
            var cy = 0
            while (cy < 32) {
              val y = cy * h / 32
              var cx = 0
              while (cx < 32) {
                val x = cx * w / 32
                val p = px(y * w + x)
                g(cy)(cx) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
                  (p & 0xff) * 114) / 1000
                cx += 1
              }
              cy += 1
            }
            val coefs = new Array[Double](64)
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                var s = 0.0
                var y = 0
                while (y < 32) {
                  var x = 0
                  while (x < 32) {
                    s += g(y)(x) * cosT(u)(x) * cosT(v)(y)
                    x += 1
                  }
                  y += 1
                }
                coefs(v * 8 + u) = s
                u += 1
              }
              v += 1
            }
            val ac = coefs.drop(1) // 63 AC coefficients, (v*8+u) order
            val median = ac.sorted.apply(31)
            var bits = 0L
            var nBits = 0L
            var k = 0
            while (k < 63) {
              if (ac(k) > median) { bits |= 1L << k; nBits += 1 }
              k += 1
            }
            PHash(id, bits, nBits)
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
