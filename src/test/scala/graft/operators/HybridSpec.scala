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

  test("weightedFuse min-max normalizes per (query, list), missing docs contribute 0") {
    import org.apache.spark.sql.functions.col
    // list A: scores 10 (doc 1), 5 (doc 2), 0 (doc 3) -> norm 1.0, 0.5, 0.0
    val a = Seq((7L, 1L, 10.0), (7L, 2L, 5.0), (7L, 3L, 0.0))
      .toDF("query_id", "doc_id", "score")
    // list B: doc 2 = 4 (norm 1.0), doc 4 = 2 (norm 0.0); docs 1/3 missing
    val b = Seq((7L, 2L, 4.0), (7L, 4L, 2.0))
      .toDF("query_id", "doc_id", "score")
    val out = Hybrid.weightedFuse(Seq(a -> 0.7, b -> 0.3), topK = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // doc 1: 0.7*1.0 = 0.7; doc 2: 0.7*0.5 + 0.3*1.0 = 0.65;
    // doc 3: 0.0; doc 4: 0.3*0.0 = 0.0
    assert(out == Map(1L -> 0.7, 2L -> 0.65, 3L -> 0.0, 4L -> 0.0))
    val ranks = Hybrid.weightedFuse(Seq(a -> 0.7, b -> 0.3), topK = 10)
      .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq
    assert(ranks == Seq(1L, 2L, 3L, 4L),
      "rank by fused score desc, ties (3 vs 4 at 0.0) by ascending id")
  }

  test("weightedFuse: a constant list normalizes to 0 (no spurious signal)") {
    val a = Seq((1L, 1L, 3.0), (1L, 2L, 3.0)).toDF("query_id", "doc_id", "score")
    val b = Seq((1L, 1L, 9.0), (1L, 2L, 1.0)).toDF("query_id", "doc_id", "score")
    val out = Hybrid.weightedFuse(Seq(a -> 0.5, b -> 0.5), topK = 2)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // list a is constant -> contributes 0 everywhere; only b ranks
    assert(out == Map(1L -> 0.5, 2L -> 0.0))
    intercept[IllegalArgumentException] {
      Hybrid.weightedFuse(Seq(a -> -0.1), topK = 2)
    }
  }

  test("rrfFuse: equal scores break ties by ascending id") {
    val l1 = Seq((1L, 50L, 1L), (1L, 40L, 2L)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 40L, 1L), (1L, 50L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq(l1, l2), topK = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 40L), (2L, 50L)))
  }
}
