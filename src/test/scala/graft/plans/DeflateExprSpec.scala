package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DeflateExprSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def lens(texts: String*): Map[String, Long] =
    texts.toDF("text")
      .select(col("text"), DeflateLenExpr.deflateLen(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches a reference java.util.zip run and is deterministic") {
    val texts = Seq("hello hello hello world", "a", "",
      "the quick brown fox jumps over the lazy dog")
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val got = lens(texts: _*)
    texts.foreach(t => assert(got(t) === ref(t), s"text '$t'"))
    assert(lens(texts: _*) === got) // thread-local reset: stable on re-run
  }

  test("long-range repetition compresses far below random-ish text") {
    val repeated = ("a paragraph pasted many times over. " * 40).trim
    val varied = (1 to 40).map(i => s"unique sentence number $i with salt ${i * 37 % 101}")
      .mkString(" ")
    val got = lens(repeated, varied)
    val rr = got(repeated).toDouble / repeated.getBytes("UTF-8").length
    val rv = got(varied).toDouble / varied.getBytes("UTF-8").length
    assert(rr < 0.1, s"repeated ratio $rr")
    assert(rv > 2 * rr, s"varied $rv vs repeated $rr")
  }

  test("outputs larger than the 8k buffer chunk correctly") {
    // incompressible-ish: hash-chained hex, deflate output > one 8192 buffer
    val big = (1 to 4000).map(i =>
      java.lang.Long.toHexString(i * 2654435761L ^ (i << 17))).mkString(" ")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(big.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 20)
    var ref = 0L
    while (!d.finished()) ref += d.deflate(buf)
    d.end()
    assert(ref > 8192, "test premise: output must exceed one buffer")
    assert(lens(big)(big) === ref)
  }
}
