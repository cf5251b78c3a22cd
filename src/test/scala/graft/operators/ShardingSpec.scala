package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ShardingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val ids = (0L until 500L).toVector
  private def docs = ids.toDF("doc_id")

  // independent JVM-side expectation: order by (md5(id), id)
  private val expectedOrder = ids.sortBy(id => (md5hex(id.toString), id))

  test("shuffleShard: pos is the (md5, id) permutation, shards are arithmetic") {
    val out = Sharding.shuffleShard(docs, shardSize = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 500)
    val byId = out.map(t => t._1 -> t).toMap
    expectedOrder.zipWithIndex.foreach { case (id, pos) =>
      val (_, p, shard, pis) = byId(id)
      assert(p == pos.toLong, s"pos for $id")
      assert(shard == pos / 64 && pis == pos % 64, s"shard math for $id")
    }
  }

  test("shuffleShard: identical result for any partition count") {
    val a = Sharding.shuffleShard(docs, shardSize = 10L, numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Sharding.shuffleShard(docs.repartition(11), shardSize = 10L, numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("orderShard: curriculum key orders positions ascending with id tiebreak") {
    import org.apache.spark.sql.functions._
    val scored = ids.map(id => (id, (id * 37) % 11)).toDF("doc_id", "difficulty")
    val out = Sharding.orderShard(scored,
        format_string("%03d", col("difficulty").cast("int")), shardSize = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = ids.sortBy(id => ((id * 37) % 11, id)).zipWithIndex
    expect.foreach { case (id, pos) =>
      assert(out(id) == pos.toLong, s"pos for $id")
    }
  }

  test("shuffleShard: all shards but the last are exactly shardSize") {
    val sizes = Sharding.shuffleShard(docs, shardSize = 64L)
      .groupBy("shard").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val last = sizes.map(_._1).max
    sizes.foreach { case (shard, n) =>
      if (shard < last) assert(n == 64L, s"shard $shard") else assert(n == 500L % 64L)
    }
  }
}
