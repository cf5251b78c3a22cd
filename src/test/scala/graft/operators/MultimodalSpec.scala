package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // real PNG (even id) / JPEG (odd id) payloads from the deterministic generator
  private def media = Seq(2L, 3L, 140L, 341L)
    .map(id => (id, Multimodal.syntheticImage(id)))
    .toDF("media_id", "content")

  private def expectedDims(id: Long): (Int, Int) =
    (16 + (id % 48).toInt, 16 + ((id / 7) % 40).toInt)

  test("decodeImages: REAL ImageIO decode recovers generated dims and format") {
    val out = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toList == List(2L, 3L, 140L, 341L))
    out.foreach { m =>
      val (w, h) = expectedDims(m.media_id)
      assert(m.width == w && m.height == h, s"dims for ${m.media_id}")
      assert(m.format == (if (m.media_id % 2 == 0) "png" else "jpeg"))
    }
    val schema = Multimodal.decodeImages(media).toDF().schema
    assert(schema.fieldNames.toList == List("media_id", "width", "height", "format"))
  }

  test("imagePixelStats: PNG channel sums equal the closed-form generator") {
    val out = Multimodal.imagePixelStats(media.filter(col("media_id") % 2 === 0))
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toList == List(2L, 140L))
    out.foreach { st =>
      val id = st.media_id
      val (w, h) = expectedDims(id)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        er += (x * 7 + y * 13 + id * 31) % 256
        eg += (x * 3 + y * 5 + id * 17) % 256
        eb += (x * 11 + y * 2 + id * 7) % 256
      }
      assert((st.width, st.height) == (w, h))
      assert((st.sum_r, st.sum_g, st.sum_b) == ((er, eg, eb)), s"sums for $id")
    }
  }

  test("decodeImages rejects non-image payloads; isDecodable pre-filters") {
    val junk = Seq((1L, Array.fill[Byte](100)('x'))).toDF("media_id", "content")
    assertThrows[org.apache.spark.SparkException] {
      Multimodal.decodeImages(junk).collect()
    }
    assert(!Multimodal.isDecodable(Array.fill[Byte](100)('x')))
    assert(Multimodal.isDecodable(Multimodal.syntheticImage(7L)))
  }

  test("sampleFrames: one frame per interval of stub duration, executor-side explode") {
    val video = Seq(
      (1L, Array.fill[Byte](1000)('a')),
      (3L, Array.fill[Byte](20000)('c'))
    ).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(video, everyMs = 1000L).collect()
    // duration = 2*len; n frames = duration/1000 + 1
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(byId(1L) == 2 * 1000 / 1000 + 1)
    assert(byId(3L) == 2 * 20000 / 1000 + 1)
    val f = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(f.map(_.ts_ms).toList == List(0L, 1000L, 2000L))
    assert(f.head.frame_bytes.length == 16)
  }

  test("extractFeatures: normalized luminance histogram from real pixels, ANN-consumable") {
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
      .withColumnRenamed("feature", "embedding").withColumnRenamed("media_id", "vec_id")
    val rows = feats.collect()
    assert(rows.length == 4)
    val v = rows.head.getSeq[Float](rows.head.fieldIndex("embedding"))
    assert(v.length == 16)
    assert(math.abs(v.sum - 1.0f) < 1e-4, "histogram normalizes to 1")
    // determinism across evaluations
    val again = Multimodal.extractFeatures(media, dim = 16).toDF().collect()
    assert(again.map(r => r.getSeq[Float](r.fieldIndex("feature")).toList).toSet ==
      rows.map(r => r.getSeq[Float](r.fieldIndex("embedding")).toList).toSet)
    // plumbing into the similarity operator
    val knn = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") === 2L), k = 2)
    assert(knn.count() == 2)
  }

  test("resizeImages: real resample — output decodes to the requested dims") {
    val out = Multimodal.resizeImages(media, 224, 112).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 112))
    out.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("resized")
      val (img, fmt) = Multimodal.decodeImage(bytes)
      assert(fmt == "png" && img.getWidth == 224 && img.getHeight == 112)
    }
  }

  // deterministic PCM16 WAV payloads (ids chosen to hit all four sample rates)
  private def audio = Seq(0L, 1L, 2L, 511L)
    .map(id => (id, Multimodal.syntheticWav(id)))
    .toDF("media_id", "content")

  private def expectedSamples(id: Long): IndexedSeq[Long] =
    (0 until (256 + (id % 512)).toInt).map(i => ((id * 31 + i * 17) % 65536) - 32768)

  test("decodeAudio: REAL javax.sound decode recovers exact generated PCM stats") {
    val out = Multimodal.decodeAudio(audio).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toList == List(0L, 1L, 2L, 511L))
    out.foreach { a =>
      val id = a.media_id
      val smp = expectedSamples(id)
      assert(a.sample_rate == Array(8000, 11025, 16000, 22050)((id % 4).toInt))
      assert(a.channels == 1)
      assert(a.n_samples == smp.length.toLong, s"n for $id")
      assert(a.peak == smp.map(math.abs).max, s"peak for $id")
      assert(a.sum_abs == smp.map(math.abs).sum, s"sum_abs for $id")
    }
  }

  test("audioWindowEnergy: per-window sum of squares matches the generator") {
    val out = Multimodal.audioWindowEnergy(audio, windowSamples = 100)
      .collect().groupBy(_.media_id)
    Seq(0L, 1L, 2L, 511L).foreach { id =>
      val smp = expectedSamples(id)
      val expect = smp.grouped(100).zipWithIndex
        .map { case (w, i) => (i, w.length.toLong, w.map(v => v * v).sum) }.toList
      val got = out(id).sortBy(_.win_idx)
        .map(w => (w.win_idx, w.n_samples, w.sum_sq)).toList
      assert(got == expect, s"windows for $id")
    }
    // last window is the ragged remainder, not padded
    assert(out(1L).map(_.n_samples).sum == 257L)
  }

  test("imageDHash: brightness-shifted copy hashes identical, inverted gradient flips bits") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int, w: Int = 32, h: Int = 24): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      Multimodal.encodeImage(img, "png")
    }
    val d = Seq(
      (1L, png((x, _) => x * 6)),        // left-to-right ramp
      (2L, png((x, _) => x * 6 + 10)),   // same ramp, brighter — same gradient SIGNS
      (3L, png((x, _) => 255 - x * 6))   // inverted ramp — opposite signs
    ).toDF("media_id", "content")
    val out = Multimodal.imageDHash(d).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).dhash_hi == out(2L).dhash_hi && out(1L).dhash_lo == out(2L).dhash_lo)
    val hamming = java.lang.Long.bitCount(out(1L).dhash_hi ^ out(3L).dhash_hi) +
      java.lang.Long.bitCount(out(1L).dhash_lo ^ out(3L).dhash_lo)
    assert(hamming >= 48, s"inverted gradient should flip most bits, hamming=$hamming")
    // the ramp rises monotonically: every adjacent-cell bit is set (8 rows ×
    // 8 comparisons, all right > left) — pins the exact bit layout
    assert(out(1L).dhash_hi == 0xFFFFFFFFL && out(1L).dhash_lo == 0xFFFFFFFFL)
  }

  test("imagePHash: mild noise keeps the low-freq signature, a different " +
      "image is far, and 63 AC bits split near-evenly around the median") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int, w: Int = 48, h: Int = 40): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      Multimodal.encodeImage(img, "png")
    }
    val base = (x: Int, y: Int) => (x * 4 + y * 3) % 251
    val noisy = (x: Int, y: Int) => base(x, y) + ((x * 13 + y * 7) % 5) - 2
    val other = (x: Int, y: Int) => ((x / 8 + y / 8) % 2) * 255 // checkerboard
    val d = Seq((1L, png(base)), (2L, png(noisy)), (3L, png(other)))
      .toDF("media_id", "content")
    val out = Multimodal.imagePHash(d).collect().map(r => r.media_id -> r).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(1L).phash, out(2L).phash) <= 8,
      s"noise moved the pHash ${ham(out(1L).phash, out(2L).phash)} bits")
    assert(ham(out(1L).phash, out(3L).phash) >= 16,
      s"different structure too close: ${ham(out(1L).phash, out(3L).phash)}")
    // median split: of 63 AC coefficients, at most 31 are strictly above
    // their median, and not degenerate-few
    out.values.foreach { p =>
      assert(p.n_bits <= 31 && p.n_bits >= 10, s"odd bit balance: ${p.n_bits}")
    }
  }

  test("imageDHash: images smaller than the 9x8 grid hash without error") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      Multimodal.encodeImage(img, "png")
    }
    val d = Seq(
      (1L, png(1, 1, (_, _) => 128)),       // tracking pixel
      (2L, png(2, 3, (x, y) => x * 90 + y)),
      (3L, png(20, 4, (x, _) => x * 12)),   // wide but shorter than 8
      (4L, png(5, 40, (_, y) => y * 6))     // narrower than 9
    ).toDF("media_id", "content")
    val out = Multimodal.imageDHash(d).collect().map(r => r.media_id -> r).toMap
    assert(out.size == 4)
    // a flat 1x1 image has zero gradient everywhere: no bit set
    assert(out(1L).dhash_hi == 0L && out(1L).dhash_lo == 0L)
    // the wide ramp still rises left-to-right: every adjacent-cell bit set
    assert(out(3L).dhash_hi == 0xFFFFFFFFL && out(3L).dhash_lo == 0xFFFFFFFFL)
    // the vertical ramp is flat within each row: no horizontal gradient
    assert(out(4L).dhash_hi == 0L && out(4L).dhash_lo == 0L)
  }

  test("audioFingerprint: gain-shifted copy keeps the envelope bits, reversed flips them") {
    def wav(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s0 => bb.putShort(s0))
      bb.array()
    }
    // rising energy envelope: window w has amplitude ~(w+1)*100
    val rising = Array.tabulate(8 * 64)(i => ((i / 64 + 1) * 100).toShort)
    val d = Seq(
      (1L, wav(rising)),
      (2L, wav(rising.map(s0 => (s0 * 2).toShort))), // 2x gain: e scales 4x, signs keep
      (3L, wav(rising.reverse))                      // falling envelope: all signs flip
    ).toDF("media_id", "content")
    val out = Multimodal.audioFingerprint(d, windowSamples = 64)
      .collect().map(r => r.media_id -> r).toMap
    assert(out.values.forall(_.n_windows == 8))
    assert(out(1L).fp == 0x7FL)            // 7 rising deltas, bits 0-6 set
    assert(out(2L).fp == out(1L).fp)       // gain-invariant
    assert(out(3L).fp == 0L)               // monotone falling: no bit set
  }

  test("decodeWav rejects junk; WAV payloads survive an opaque-binary round trip") {
    assertThrows[Exception] {
      Multimodal.decodeWav(Array.fill[Byte](64)('x'))
    }
    // through a DataFrame binary column (the storage contract for media)
    val back = audio.select(col("media_id"), col("content")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    back.foreach { case (id, bytes) =>
      val (rate, ch, smp) = Multimodal.decodeWav(bytes)
      assert(ch == 1 && rate == Array(8000, 11025, 16000, 22050)((id % 4).toInt))
      assert(smp.map(_.toLong).toIndexedSeq == expectedSamples(id))
    }
  }

  test("MjpegAvi: mux/demux round-trips every frame byte-identically") {
    val frames = (0 until 5).map { k =>
      val img = new java.awt.image.BufferedImage(20, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 12).foreach(y => (0 until 20).foreach(x =>
        img.setRGB(x, y, (x * 17 + y * 31 + k * 7) % 0xFFFFFF)))
      Multimodal.encodeImage(img, "jpg")
    }
    val avi = MjpegAvi.mux(frames, 20, 12, fps = 25)
    val meta = MjpegAvi.probe(avi)
    assert(meta.nFrames == 5 && meta.width == 20 && meta.height == 12)
    assert(meta.usPerFrame == 40000L && meta.durationMs == 200L)
    val (_, back) = MjpegAvi.demux(avi)
    assert(back.size == 5)
    back.zip(frames).foreach { case (b, f) =>
      assert(java.util.Arrays.equals(b, f), "frame bytes must survive the container untouched")
    }
    // every demuxed frame is a real decodable JPEG
    back.foreach(f => assert(Multimodal.isDecodable(f)))
  }

  test("MjpegAvi: foreign chunks (JUNK, idx1, odd-length padding) are skipped") {
    val frame = Multimodal.syntheticImage(1) // JPEG (odd id)
    val avi = MjpegAvi.mux(Seq(frame, frame), 17, 17, fps = 10)
    // splice a JUNK chunk (odd body length → padded) and an idx1 chunk
    // between hdrl and movi the way other muxers emit them
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val sz = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(body.length).array()
      cc.getBytes("US-ASCII") ++ sz ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    val moviAt = {
      // find the movi LIST start (search for "LIST....movi")
      val pat = "movi".getBytes("US-ASCII")
      (0 until avi.length - 4).find(i => avi.slice(i, i + 4).sameElements(pat)).get - 8
    }
    val junk = chunk("JUNK", Array.fill[Byte](33)(0x55)) ++ chunk("idx1", Array.fill[Byte](16)(1))
    val spliced = avi.take(moviAt) ++ junk ++ avi.drop(moviAt)
    // fix the RIFF size field (bytes 4..8)
    val fixed = spliced.clone()
    val newSize = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(spliced.length - 8).array()
    System.arraycopy(newSize, 0, fixed, 4, 4)
    val (meta, frames) = MjpegAvi.demux(fixed)
    assert(meta.nFrames == 2 && frames.size == 2)
    assert(java.util.Arrays.equals(frames(0), frame))
  }

  test("sampleVideoFrames picks the covering frame per grid point and decodes it") {
    import spark.implicits._
    // id 6: n = 4+6%5 = 5 frames, fps = 6%3=0 -> 5 fps -> 200000 us/frame,
    // duration 1000 ms; every 300 ms -> samples at 0,300,600,900 ->
    // frame idx 0,1,3,4
    val media = Seq((6L, Multimodal.syntheticVideo(6L))).toDF("media_id", "content")
    val out = Multimodal.sampleVideoFrames(media, everyMs = 300L)
      .collect().sortBy(_.sample_idx)
    assert(out.map(f => (f.ts_ms, f.frame_idx)).toSeq ==
      Seq((0L, 0), (300L, 1), (600L, 3), (900L, 4)))
    assert(out.forall(f => f.frame_w == 32 + 6 % 16 && f.frame_h == 24 + 6 % 12))
  }

  test("videoDupPairs: copy shares all frames, trim all but one, hot frames capped") {
    import spark.implicits._
    val v6 = Multimodal.syntheticVideo(6L) // 5 frames
    val (meta, frames) = MjpegAvi.demux(v6)
    val fps = (1000000L / meta.usPerFrame).toInt
    val media = Seq(
      (6L, v6),
      (100L, v6), // exact copy
      (101L, MjpegAvi.mux(frames.init, meta.width, meta.height, fps)), // trimmed
      (7L, Multimodal.syntheticVideo(7L)) // unrelated
    ).toDF("media_id", "content")
    val pairs = Multimodal.videoDupPairs(media, minShared = 3)
      .select("id_a", "id_b", "n_shared", "n_frames_a", "n_frames_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(pairs == Set(
      (6L, 100L, 5L, 5L, 5L),
      (6L, 101L, 4L, 5L, 4L),
      (100L, 101L, 4L, 5L, 4L)))
    // df cap: with maxDf=2 every frame of the copy-triple is over-shared
    // (df=3 for the first 4 frames) and drops from candidate generation —
    // only the df-2 last frame survives, below minShared
    val capped = Multimodal.videoDupPairs(media, minShared = 1, maxDf = 2)
      .select("id_a", "id_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((6L, 100L, 1L)))

    // long-lived sessions: the WithRelease overload frees the persisted
    // frame-hash relation instead of leaking one cache entry per call
    // a distinct input plan: the CacheManager dedupes identical plans, so
    // reusing `media` would piggyback on the cache the calls above left
    val media2 = media.filter($"media_id" =!= 7L)
    val before = spark.sparkContext.getPersistentRDDs.size
    val (rel, release) = Multimodal.videoDupPairsWithRelease(media2, minShared = 3)
    assert(rel.count() == 3)
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release hook must unpersist the frame-hash cache")
  }
}
