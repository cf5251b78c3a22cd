package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Decontaminate

class StreamingSpanDecontamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def words(n: Int, p: String) = (0 until n).map(i => s"$p$i")

  private val probe = Seq((100L, (words(2, "q") ++ words(15, "p")).mkString(" ")))
    .toDF("doc_id", "text")
  private val corpus = Seq(
    (1L, (words(3, "a") ++ words(15, "p")).mkString(" ")), // contaminated
    (2L, words(14, "b").mkString(" ")),                    // clean
    (3L, (words(15, "p") ++ words(1, "c")).mkString(" ")), // contaminated
    (4L, words(12, "d").mkString(" "))
  ).toDF("doc_id", "text")

  test("fold over the at-rest index equals the one-shot operator") {
    val dir = Files.createTempDirectory("graft-spandc").resolve("idx").toString
    StreamingSpanDecontam.init(probe, dir, anchor = 4)
    val fold = StreamingSpanDecontam.judgeFold(corpus, dir, nBatches = 3,
      minSpan = 10, anchor = 4)
    val oneShot = Decontaminate.spanOverlap(corpus, probe,
      minSpan = 10, anchor = 4)
    assert(fold.except(oneShot).count() == 0 && oneShot.except(fold).count() == 0)
    assert(fold.filter($"contaminated").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 3L))
  }

  test("standing run() writes per-epoch verdicts equal to the one-shot relation") {
    val base = Files.createTempDirectory("graft-spandc-run")
    val idx = base.resolve("idx").toString
    StreamingSpanDecontam.init(probe, idx, anchor = 4)
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingSpanDecontam.run(
      input.toDF().toDF("doc_id", "text"), idx,
      base.resolve("out").toString, base.resolve("cp").toString,
      minSpan = 10, anchor = 4)
    try {
      val rows = corpus.as[(Long, String)].collect()
      input.addData(rows.take(2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows.drop(2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamingSpanDecontam.verdicts(spark, base.resolve("out").toString)
    val oneShot = Decontaminate.spanOverlap(corpus, probe, minSpan = 10, anchor = 4)
    assert(got.except(oneShot).count() == 0 && oneShot.except(got).count() == 0)
  }
}
