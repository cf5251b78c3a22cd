package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class Bm25Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("scores match the closed-form formula on a hand-checked corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "d")).toDF("doc_id", "text")
    val out = Bm25.score(docs, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // N=3, avgdl=2; df(a)=1, df(b)=2
    val idfA = math.log(1.0 + (3 - 1 + 0.5) / 1.5)
    val idfB = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    def tfF(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + (0.75 * dl) / 2.0))
    val exp1 = idfA * tfF(2, 3) + idfB * tfF(1, 3)
    val exp2 = idfB * tfF(1, 2)
    assert(out.keySet == Set(1L, 2L)) // doc 3 matches no term
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - exp1) < 1e-12)
    assert(out(2L)._1 == 1 && math.abs(out(2L)._2 - exp2) < 1e-12)
    // the a-heavy doc outranks the single-hit doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("rare terms outweigh common ones at equal tf") {
    // 'rare' appears in 1 of 10 docs, 'common' in 9 of 10
    val docs = ((1L to 9L).map(i => (i, "common filler words here")) :+
      (10L, "rare common filler words")).toDF("doc_id", "text")
    val s = Bm25.score(docs, Seq("rare", "common")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) > 2 * s(1L))
  }

  test("topK agrees with per-query score() ranking and caps at k") {
    val docs = Seq(
      (1L, "a a b"), (2L, "b c"), (3L, "d"), (4L, "a b c d"),
      (5L, "c c c"), (6L, "a"), (7L, "b b a")).toDF("doc_id", "text")
    val queries = Seq((100L, "a b"), (200L, "c"), (300L, "zzz"))
      .toDF("query_id", "text")
    val got = Bm25.topK(docs, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    // per query: same top-3 as the single-query operator ranked by
    // (rounded score desc, id asc)
    for ((qid, terms) <- Seq(100L -> Seq("a", "b"), 200L -> Seq("c"))) {
      val single = Bm25.score(docs, terms).collect()
        .map(r => (r.getLong(0), math.rint(r.getDouble(2) * 1e4) / 1e4))
        .sortBy { case (id, s) => (-s, id) }.take(3)
      val batch = got(qid).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(batch == single.toSeq, s"query $qid")
      assert(got(qid).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    }
    // a query with no matching terms returns no rows
    assert(!got.contains(300L))
  }

  test("topK: duplicated query terms do not double-count (distinct-set contract)") {
    val docs = Seq((1L, "a b"), (2L, "a a")).toDF("doc_id", "text")
    val once = Bm25.topK(docs, Seq((1L, "a")).toDF("query_id", "text"), k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    val twice = Bm25.topK(docs, Seq((1L, "a a")).toDF("query_id", "text"), k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(once == twice)
  }
}
