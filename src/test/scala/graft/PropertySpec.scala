package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins
import graft.sources.ThriftLogCodec

/** Property-based invariants (SURVEY §5: an upgrade the reference's test
  * strategy lacks). Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest bridge artifact is not on the offline classpath). */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], trials: Int = 30)(f: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  test("thrift codec roundtrips arbitrary payloads and preserves order") {
    forAll(Gen.listOfN(5, Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)))) {
      payloads =>
        val frames = payloads.map(p => ThriftLogCodec.encodeFrame(null, p.toArray))
        val concat = frames.foldLeft(Array.empty[Byte])(_ ++ _)
        val decoded = ThriftLogCodec.decodeFrames(concat).toList
        assert(decoded.map(_.message.toList) == payloads)
    }
  }

  test("thrift codec never throws on arbitrary garbage bytes") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { garbage =>
      // must terminate without exception; may decode zero or more frames
      ThriftLogCodec.decodeFrames(garbage.toArray, maxMessageBytes = 1 << 16).size
      ()
    }
  }

  test("partitioners always land in [0, n) for arbitrary keys") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Partitioners
    forAll(Gen.zip(Gen.chooseNum(1, 64), Gen.listOfN(20, Gen.alphaNumStr))) {
      case (n: Int, keys: List[String]) =>
        val df = keys.map(_.getBytes("UTF-8")).toDF("key")
        val parts = df.select(
          Partitioners.crc32Partition(col("key"), n).as("a"),
          Partitioners.murmurPartition(col("key"), n).as("b"),
          Partitioners.md5StringKeyPartition(col("key"), n).as("c")).collect()
        assert(parts.forall { r =>
          (0 until 3).forall { i => val p = r.getInt(i); p >= 0 && p < n }
        })
    }
  }

  test("KeyTemplate rendering is deterministic given fixed inputs") {
    forAll(Gen.zip(Gen.alphaNumStr, Gen.chooseNum(0L, 4102444800000L))) { case (log, now) =>
      val t = graft.streaming.KeyTemplate("{{LOGNAME}}/{{TIMESTAMP}}/{{UUID}}", log)
      assert(t.render(nowMs = now, uuid = "u") == t.render(nowMs = now, uuid = "u"))
    }
  }

  test("asofBackward matches a brute-force per-row reference on random data") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))))
    forAll(gen, trials = 5) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "lk", "lt")
      val right = rightRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = Joins.asofBackward(left, right,
        leftKey = col("lk"), rightKey = col("rk"),
        leftTime = col("lt"), rightTime = col("rt"),
        rightId = col("rid"), rightCols = Seq("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
        val best = if (candidates.isEmpty) -1L
        else candidates.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong
        i.toLong -> best
      }.toMap
      assert(got == expected)
    }
  }

  test("multiline splitter: concatenation of records covers all start-anchored content") {
    val startLine = Gen.chooseNum(0, 99999).map(n => f"I$n%05d payload")
    val contLine = Gen.alphaNumStr.map("  " + _)
    forAll(Gen.listOfN(8, Gen.oneOf(startLine, contLine))) { lines =>
      val content = lines.mkString("", "\n", "\n")
      val recs = graft.sources.LogSources.splitMultiline(content, "^I[0-9]{5}", 1 << 20).toList
      // record count equals start-line count; no content loss after first start
      assert(recs.size == lines.count(_.matches("I[0-9]{5} payload")))
      assert(recs.forall(_.startsWith("I")))
    }
  }
}
