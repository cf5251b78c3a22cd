package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PcaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("jacobiEigen reconstructs A = V diag(l) Vt with orthonormal V") {
    // fixed symmetric matrix, distinct spectrum
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, -0.5),
      Array(0.5, 0.25, 2.0, 0.1),
      Array(0.0, -0.5, 0.1, 1.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    val d = a.length
    // orthonormal columns
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10, s"VtV($i,$j)=$dot")
    }
    // reconstruction
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(k => vecs(i)(k) * vals(k) * vecs(j)(k)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-10, s"recon($i,$j)")
    }
    // trace preserved
    assert(math.abs(vals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-10)
  }

  test("diagonal matrix: eigenvalues are the diagonal, sorted desc in the model") {
    val vecs = Seq.tabulate(40) { i =>
      // variance 9 on dim0, 1 on dim1, ~0 on dim2
      (i.toLong, Seq(3.0 * (i % 2 * 2 - 1) * (1 + i / 20.0), (i % 4 - 1.5) / 1.5, 0.01 * (i % 3)))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, r = 3, vecCol = "embedding")
    assert(m.eigenvalues.length == 3)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)), "descending spectrum")
    // top component aligns with dim0 (the dominant-variance axis)
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0)) - 1.0) < 0.05, c0.mkString(","))
    // sign convention: the largest-|x| entry is positive
    m.components.foreach { c =>
      val best = c.indices.maxBy(i => math.abs(c(i)))
      assert(c(best) > 0)
    }
  }

  test("projection matches driver-side arithmetic and preserves pairwise distances at r = d") {
    val data = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(-1.0, 0.5, 2.0)),
      (3L, Seq(0.0, -2.0, 1.0)),
      (4L, Seq(2.0, 1.0, -1.0)),
      (5L, Seq(-2.0, 0.0, 0.0)))
    val df = data.toDF("vec_id", "embedding")
    val m = Pca.fit(df, r = 3)
    val proj = Pca.project(df, m).as[(Long, Seq[Double])].collect().toMap
    // driver-side recompute
    data.foreach { case (id, v) =>
      val centered = v.toArray.zip(m.mean).map { case (x, mu) => x - mu }
      m.components.zipWithIndex.foreach { case (c, j) =>
        val want = centered.zip(c).map { case (a, b) => a * b }.sum
        assert(math.abs(proj(id)(j) - want) < 1e-9, s"id=$id comp=$j")
      }
    }
    // full-rank projection is an isometry (orthonormal basis change)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (Seq((ia, va), (ib, vb)) <- data.combinations(2)) {
      assert(math.abs(d2(va, vb) - d2(proj(ia), proj(ib))) < 1e-9)
    }
  }

  test("standardize: per-dim sample mean 0 / std 1; constant dims map to 0, not NaN") {
    val df = Seq(
      (1L, Seq(1.0, 10.0, 5.0)),
      (2L, Seq(2.0, 20.0, 5.0)),
      (3L, Seq(3.0, 30.0, 5.0)),
      (4L, Seq(4.0, 40.0, 5.0))).toDF("vec_id", "embedding")
    val z = Pca.standardize(df).as[(Long, Seq[Double])].collect().sortBy(_._1)
    val zs = z.map(_._2)
    for (j <- 0 until 3) {
      val colV = zs.map(_(j))
      assert(math.abs(colV.sum / 4) < 1e-12, s"mean dim $j")
      if (j < 2) {
        val sd = math.sqrt(colV.map(x => x * x).sum / 3) // mean is 0
        assert(math.abs(sd - 1.0) < 1e-12, s"std dim $j")
      } else assert(colV.forall(_ == 0.0), "constant dim → 0")
    }
    // z-scores of dims 0 and 1 are identical (both are linear ramps)
    zs.foreach(v => assert(math.abs(v(0) - v(1)) < 1e-12))
  }

  test("explained variance ratios sum to <= 1 and match eigenvalue shares") {
    val vecs = Seq.tabulate(30)(i =>
      (i.toLong, Seq(i.toDouble, (i % 5).toDouble, ((i * 7) % 11).toDouble / 11.0)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, r = 2)
    val evr = m.explainedVariance(2)
    assert(evr.length == 2 && evr.forall(x => x >= 0 && x <= 1))
    assert(math.abs(evr(0) - m.eigenvalues(0) / m.eigenvalues.sum) < 1e-12)
    assert(evr.sum <= 1.0 + 1e-12)
  }
}
