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
}
