package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HybridSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("jaccardTopK matches hand-computed set overlap, ranks by (score, id)") {
    val docs = Seq(
      (1L, "a b"),         // J(q={a,b}) = 2/2 = 1.0
      (2L, "a b c d"),     // 2/4 = 0.5
      (3L, "a x y z"),     // 1/5 = 0.2
      (4L, "zzz")          // 0 -> absent
    ).toDF("doc_id", "text")
    val queries = Seq((7L, "a b"), (8L, "none here")).toDF("query_id", "text")
    val got = Hybrid.jaccardTopK(docs, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val q7 = got.filter(_._1 == 7L).sortBy(_._2).toSeq
    assert(q7 == Seq((7L, 1L, 1L, 1.0), (7L, 2L, 2L, 0.5), (7L, 3L, 3L, 0.2)))
    // query 8 shares no term with any doc — wait: "here" vs docs? none.
    assert(!got.exists(_._1 == 8L))
  }

  test("jaccardTopK: duplicate tokens collapse (distinct-set semantics)") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val q = Seq((1L, "a b b")).toDF("query_id", "text")
    val got = Hybrid.jaccardTopK(docs, q, k = 1).collect()
    assert(got.head.getDouble(3) == 1.0) // {a,b} vs {a,b}
  }

  test("rrfFuse sums 1/(60+rank) across lists and ranks the fusion") {
    val l1 = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 20L, 1L), (1L, 40L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq(l1, l2), topK = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    def rr(r: Long) = 1.0 / (60.0 + r)
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 20: in both lists (ranks 2 and 1) — fused best
    assert(got(0) == ((1L, 20L, rd(rr(2) + rr(1)))))
    assert(got(1) == ((2L, 10L, rd(rr(1)))))
    // docs 30 (rank 3, list 1) vs 40 (rank 2, list 2): 40 scores higher
    assert(got(2) == ((3L, 40L, rd(rr(2)))))
    assert(got(3) == ((4L, 30L, rd(rr(3)))))
  }

  test("rrfFuse: equal scores break ties by ascending id") {
    val l1 = Seq((1L, 50L, 1L), (1L, 40L, 2L)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 40L, 1L), (1L, 50L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq(l1, l2), topK = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 40L), (2L, 50L)))
  }
}
