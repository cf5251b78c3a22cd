package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM MJPEG-in-AVI container codec — makes VIDEO decode real with no
  * native dependency: AVI is a RIFF chunk tree (public Microsoft spec;
  * little-endian u32 sizes, chunks padded to even lengths) and each MJPEG
  * frame chunk is a standalone JPEG blob the JDK's ImageIO already
  * decodes. Demuxing is therefore container parsing, which this does
  * completely; other codecs (H.264 etc.) still need an external decoder —
  * the honest boundary, stated where it holds rather than stubbing all of
  * video.
  *
  * Layout written (and the subset read):
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl'
  *     'avih' (usPerFrame, ..., totalFrames, ..., width, height, ...)
  *     LIST('strl' 'strh'("vids","MJPG", scale, rate, length)
  *                 'strf'(BITMAPINFOHEADER w,h,'MJPG')))
  *   LIST('movi' ('00dc' <jpeg bytes>)*))
  * }}}
  * The reader walks the chunk tree generically, takes stream metadata from
  * `avih`, and collects every `00dc`/`00db` frame chunk in file order, so
  * files from other MJPEG muxers (with `idx1` indexes, extra LISTs,
  * `JUNK` padding) parse too — unknown chunks are skipped by size.
  */
object MjpegAvi {

  final case class VideoMeta(usPerFrame: Long, nFrames: Int, width: Int, height: Int) {
    def durationMs: Long = usPerFrame * nFrames / 1000L
    def fps: Double = 1e6 / usPerFrame
  }

  // ------------------------------------------------------------------ mux

  /** Assemble an MJPEG AVI from per-frame JPEG payloads. */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(fps > 0, "fps must be positive")
    val usPerFrame = 1000000 / fps

    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(body.length + 10)
      out.write(fourcc.getBytes("US-ASCII"))
      out.write(le32(body.length))
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF chunks are even-padded
      out.toByteArray
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ children)

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame)              // dwMicroSecPerFrame
      b.putInt(0).putInt(0)             // maxBytesPerSec, padding
      b.putInt(0x10)                    // flags: AVIF_HASINDEX off, INTERLEAVED off, 0x10 = WASCAPTUREFILE (benign)
      b.putInt(frames.length)           // dwTotalFrames
      b.putInt(0)                       // initial frames
      b.putInt(1)                       // streams
      b.putInt(frames.map(_.length).max) // suggested buffer
      b.putInt(width).putInt(height)
      b.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0)   // flags, prio+lang, initial frames
      b.putInt(1).putInt(fps)           // scale, rate → rate/scale = fps
      b.putInt(0)                       // start
      b.putInt(frames.length)           // length (in frames)
      b.putInt(frames.map(_.length).max)
      b.putInt(-1)                      // quality
      b.putInt(0)                       // sample size (0 = varies)
      b.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
      b.putShort(1).putShort(24)        // planes, bit count
      b.put("MJPG".getBytes("US-ASCII"))
      b.putInt(width * height * 3)      // image size (nominal)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  // ---------------------------------------------------------------- demux

  /** Parse container metadata without touching frame bytes. */
  def probe(bytes: Array[Byte]): VideoMeta = parse(bytes, wantFrames = false)._1

  /** Metadata + every frame's JPEG payload, file order. */
  def demux(bytes: Array[Byte]): (VideoMeta, Seq[Array[Byte]]) =
    parse(bytes, wantFrames = true)

  private def parse(bytes: Array[Byte], wantFrames: Boolean): (VideoMeta, Seq[Array[Byte]]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && fourcc(b) == "RIFF", "not a RIFF file")
    b.getInt() // riff size
    require(fourcc(b) == "AVI ", "not an AVI RIFF")
    var meta: VideoMeta = null
    val frames = Seq.newBuilder[Array[Byte]]

    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = fourcc(b)
        val size = b.getInt()
        val body = b.position()
        id match {
          case "LIST" =>
            fourcc(b) // list kind — children parsed generically
            walk(body + size)
          case "avih" =>
            val usPerFrame = b.getInt().toLong & 0xFFFFFFFFL
            b.position(body + 16)
            val total = b.getInt()
            b.position(body + 32)
            val w = b.getInt(); val h = b.getInt()
            meta = VideoMeta(usPerFrame, total, w, h)
          case cc if cc.length == 4 && (cc.endsWith("dc") || cc.endsWith("db")) =>
            if (wantFrames) {
              val f = new Array[Byte](size)
              b.get(f)
              frames += f
            }
          case _ => () // idx1, JUNK, strh/strf, vendor chunks — skip by size
        }
        b.position(body + size + (size & 1)) // even padding
      }
    }
    walk(bytes.length)
    require(meta != null, "no avih header found")
    (meta, frames.result())
  }

  private def fourcc(b: ByteBuffer): String = {
    val a = new Array[Byte](4)
    b.get(a)
    new String(a, "US-ASCII")
  }
}
