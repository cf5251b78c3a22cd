package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.Partitioners
import graft.model.PartitionerSpec

class TransformsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("filterRegex drops non-matching rows") {
    val df = Seq("INFO ok", "DEBUG noise", "INFO fine").toDF("value")
    val out = Transforms.filterRegex(df, "value", "^INFO").as[String].collect()
    assert(out.toList == List("INFO ok", "INFO fine"))
  }

  test("regexModify rewrites matches and passes through non-matches") {
    val df = Seq("user=alice action=login", "malformed line").toDF("value")
    val out = df.select(
      Transforms.regexModify($"value", "user=(\\w+) action=(\\w+)", "$2 by $1").as("v"))
      .as[String].collect()
    assert(out.toList == List("login by alice", "malformed line"))
  }

  test("prepend builds delimited prefix") {
    val df = Seq("payload").toDF("value")
    val out = df.select(
      Transforms.prepend($"value", " ", lit(123L), lit("host-x")).as("v"))
      .as[String].collect()
    assert(out.head == "123 host-x payload")
  }

  test("packMessages groups n consecutive lines; a filtered member skips the group") {
    // reference: reader/TextLogFileReader.java:161-189 — the whole packed
    // message is dropped if ANY member fails the filter
    val lines = Seq(
      ("f1", 0L, "INFO a"), ("f1", 1L, "INFO b"),   // pack 0: kept
      ("f1", 2L, "DEBUG c"), ("f1", 3L, "INFO d"),  // pack 1: dropped (DEBUG)
      ("f1", 4L, "INFO e"),                         // pack 2: partial tail, kept
      ("f2", 0L, "INFO x"), ("f2", 1L, "INFO y")    // other file
    ).toDF("path", "pos", "value")
    val out = Transforms.packMessages(lines, 2, filterRegex = Some("INFO.*"))
      .orderBy("path", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toList == List(
      ("f1", 0L, "INFO a\nINFO b"),
      ("f1", 2L, "INFO e"),
      ("f2", 0L, "INFO x\nINFO y")))
  }

  test("packMessages (DataFrame) and packLines (iterator) agree") {
    val raw = (0 until 47).map(i => if (i % 11 == 0) s"SKIP $i" else s"OK $i")
    for (n <- Seq(1, 3, 5)) {
      val itr = Transforms.packLines(raw.iterator, n, Some("OK.*")).toList
      val df = raw.zipWithIndex.map { case (v, i) => ("f", i.toLong, v) }
        .toDF("path", "pos", "value")
      val dfr = Transforms.packMessages(df, n, filterRegex = Some("OK.*"))
        .orderBy("bucket").as[(String, Long, String)].collect().map(_._3).toList
      assert(dfr == itr, s"n=$n")
    }
  }

  test("withChecksum computes crc32 and validates") {
    val df = Seq(("a", "hello".getBytes)).toDF("id", "value")
    val row = Transforms.withChecksum(df).select("checksum", "checksumValid").collect().head
    val crc = new java.util.zip.CRC32()
    crc.update("hello".getBytes)
    assert(row.getLong(0) == crc.getValue)
    assert(row.getBoolean(1))
  }

  test("withChecksum flags mismatched existing checksum") {
    val df = Seq(("a", "hello".getBytes, 999L)).toDF("id", "value", "checksum")
    val row = Transforms.withChecksum(df).select("checksum", "checksumValid").collect().head
    assert(row.getLong(0) == 999L) // preserved
    assert(!row.getBoolean(1))     // flagged invalid (reference: KafkaWriter.java:438-458)
  }

  test("deterministic decider sampling passes exactly keys mod 100 < pct") {
    val df = (0L until 1000L).toDF("k")
    val out = Transforms.sampleDecider(df, 37, Some($"k")).count()
    assert(out == 370)
  }

  test("withHeaders merges into existing map") {
    val df = Seq("x").toDF("value")
    val once = Transforms.withHeaders(df, Map("a" -> "1"))
    val twice = Transforms.withHeaders(once, Map("b" -> "2"))
    val m = twice.select("headers").as[Map[String, Array[Byte]]].collect().head
    assert(m.keySet == Set("a", "b"))
    assert(new String(m("b")) == "2")
  }

  test("murmur partitioner is bit-exact against Guava murmur3_32 seed 0 (reference parity)") {
    // reference: MurmurByteArrayPartitioner.java:44 —
    // Math.abs(Math.abs(Hashing.murmur3_32().hashBytes(key).asInt()) % n)
    val rnd = new scala.util.Random(42)
    val keys = (0 until 200).map { i =>
      val len = i % 13 // cover every tail-length residue incl. empty
      val b = new Array[Byte](len); rnd.nextBytes(b); b
    }
    val guava = com.google.common.hash.Hashing.murmur3_32()
    keys.foreach { k =>
      val expectHash = guava.hashBytes(k).asInt()
      assert(graft.plans.Murmur3PartitionExpr.murmur3x86_32(k, 0) == expectHash)
    }
    val n = 7
    val df = keys.zipWithIndex.map { case (k, i) => (i, k) }.toDF("i", "key")
    val got = df.select($"i", Partitioners.murmurPartition($"key", n).as("p"))
      .orderBy("i").collect().map(_.getInt(1))
    val expect = keys.map(k => math.abs(math.abs(guava.hashBytes(k).asInt()) % n))
    assert(got.toSeq == expect)
  }

  test("withPartition crc32 matches reference abs(crc32(key) % n)") {
    val keys = Seq("k1", "k2", "some-longer-key", "")
    val df = keys.map(_.getBytes).toDF("key")
    val got = Transforms.withPartition(df, PartitionerSpec.Crc32Key(16))
      .select("partition").as[Int].collect().toList
    val expected = keys.map { k =>
      val crc = new java.util.zip.CRC32(); crc.update(k.getBytes)
      math.abs(math.abs(crc.getValue) % 16).toInt
    }
    assert(got == expected)
  }

  test("partitioners stay within [0, n)") {
    val df = (0L until 500L).map(i => s"key$i".getBytes).toDF("key")
    for (spec <- Seq[PartitionerSpec](
        PartitionerSpec.Crc32Key(8), PartitionerSpec.MurmurKey(8),
        PartitionerSpec.Md5StringKey(8), PartitionerSpec.RoundRobin(8),
        PartitionerSpec.SinglePartition(8, seed = 1L),
        PartitionerSpec.FixedPartitions(Seq(2, 5)))) {
      val parts = Transforms.withPartition(df, spec).select("partition").as[Int].collect()
      assert(parts.forall(p => p >= 0 && p < 8), s"$spec out of range")
    }
  }

  test("withAuditHeaders attaches per-message audit identity") {
    val df = Seq("a", "b").map(_.getBytes).toDF("value")
    val rows = Transforms.withAuditHeaders(df, "mylog", "h1", sessionId = 42L)
      .select("auditHeaders.*").collect()
    assert(rows.forall(_.getAs[String]("logName") == "mylog"))
    assert(rows.forall(_.getAs[Long]("session") == 42L))
    assert(rows.map(_.getAs[Long]("logSeqNum")).distinct.length == 2)
  }

  test("auditEvents emits one event per tracked message with validity") {
    val df = (0L until 200L).map(i => (i, s"payload-$i".getBytes)).toDF("id", "value")
    val tracked = Transforms.withTracked(df, samplingPct = 50)
    val hdrs = Transforms.withAuditHeaders(tracked, "lg", "h1", sessionId = 7L,
      seqCol = Some(col("id")))
    // corrupt id%3==0 AFTER checksumming → those events must be invalid
    val corrupted = hdrs
      .withColumn("checksum", crc32(col("value")))
      .withColumn("value", when(pmod(col("id"), lit(3)) === 0,
        concat(col("value"), lit("X").cast("binary"))).otherwise(col("value")))
    val events = Transforms.auditEvents(Transforms.withChecksum(corrupted),
      stage = "SINGER", kafkaCluster = "c1", topic = "t1").collect()

    val trackedIds = tracked.filter(col("tracked")).select("id").as[Long].collect().toSet
    // one event per tracked message, none for untracked
    assert(events.map(_.getAs[Long]("log_seq_num")).toSet == trackedIds)
    assert(events.length == trackedIds.size)
    // tracked decider is deterministic: re-evaluation picks the same set
    val again = Transforms.withTracked(df, samplingPct = 50)
      .filter(col("tracked")).select("id").as[Long].collect().toSet
    assert(again == trackedIds)
    // validity discriminates exactly the corrupted payloads
    events.foreach { e =>
      val expected = if (e.getAs[Long]("log_seq_num") % 3 == 0) 0L else 1L
      assert(e.getAs[Long]("message_valid") == expected)
      assert(e.getAs[String]("stage") == "SINGER")
      assert(e.getAs[Long]("session") == 7L)
    }
  }

  test("SparkEntry.entry flagship pipeline returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("fixedPartitions round-robins within the chosen subset") {
    val df = (0L until 100L).toDF("k")
    val parts = df.withColumn("partition", Partitioners.fixedPartitions(Seq(3, 7)))
      .select("partition").as[Int].collect().toSet
    assert(parts == Set(3, 7))
  }
}
