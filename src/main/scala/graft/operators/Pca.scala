package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MomentsAggregator

/** Principal-component analysis over an embedding column — the standard
  * pre-quantization/whitening step in embedding pipelines (and the "O" in
  * OPQ): project d-dim vectors onto the top-r eigenvectors of the sample
  * covariance before indexing, deduplicating, or visualizing.
  *
  * Scale shape: ONE narrow corpus pass accumulates O(d²) moment partials
  * ([[graft.functions.MomentsAggregator]] — only d(d+1)/2+d+1 doubles per
  * partition cross the exchange, never rows); the d×d eigensolve is driver
  * arithmetic (d=64 ⇒ a 4 096-double matrix, metadata scale, same stance
  * as the k-means centroid and PQ codebook tables); projection is a second
  * narrow pass with the r×d component matrix riding the expression tree —
  * no join, no shuffle, codegen'd HOF arithmetic.
  *
  * Determinism contract (what lets an independent eigensolver oracle the
  * result): eigenpairs are ordered by (eigenvalue desc, then first index of
  * the largest-|x| component), and each eigenvector is sign-normalized so
  * its largest-|x| component (first such index on exact ties) is positive.
  * Eigenvectors of a symmetric matrix with distinct eigenvalues are unique
  * up to sign, so any correct eigensolver reproduces the projection to
  * float precision; degenerate (repeated-eigenvalue) spectra have genuine
  * rotational freedom and are NOT reproducible across solvers — callers
  * gate on spectra with separated top-r eigenvalues (real embedding
  * covariance spectra are comfortably distinct).
  */
object Pca {

  /** mean: d; components: r rows × d (orthonormal, sign-fixed);
    * eigenvalues: the FULL descending d-spectrum (so
    * explained-variance ratios need no second pass — trace = Σλ). */
  final case class PcaModel(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    def explainedVariance(r: Int): Array[Double] = {
      val trace = eigenvalues.sum
      eigenvalues.take(r).map(_ / trace)
    }
  }

  /** Fit on the vector column: one moments pass + a driver Jacobi
    * eigensolve of the d×d SAMPLE covariance (n−1 denominator — the
    * `np.cov` default the fixture oracle uses). */
  def fit(vectors: DataFrame, r: Int, vecCol: String = "embedding"): PcaModel = {
    val dim = vectors.select(size(col(vecCol))).head.getInt(0)
    val agg = udaf(new MomentsAggregator(dim))
    val flat = vectors
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .agg(agg(col("v")).as("m"))
      .head.getSeq[Double](0)
    val m = MomentsAggregator.decode(dim, flat)
    require(m.n > 1, s"PCA needs n > 1 vectors, got ${m.n}")
    val n = m.n.toDouble
    // sample covariance: (raw - n·mean·meanᵀ) / (n-1)
    val mean = m.sums.map(_ / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (m.raw(i)(j) - n * mean(i) * mean(j)) / (n - 1.0)
    }
    val (values, vectorsAll) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i))
    val sorted = order.map(values).toArray
    val comps = order.map(i => signFix(vectorsAll.map(row => row(i)))).toArray
    PcaModel(m.n, mean, sorted, comps.take(r))
  }

  /** Largest-|x| component (first index on exact ties) made positive. */
  private def signFix(v: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < v.length) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0) v.map(x => -x) else v
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns (eigenvalues,
    * eigenvector COLUMNS). Textbook rotation sweeps (Golub & Van Loan §8.5)
    * until the off-diagonal Frobenius mass is < 1e-14 of the total —
    * ~7 sweeps for d=64, driver-side microseconds. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14 * math.sqrt(a0.map(_.map(x => x * x).sum).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (off > eps && sweep < 64) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      off = math.sqrt(off)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Parametric OPQ dimension allocation (Ge et al. CVPR '14, "Optimized
    * Product Quantization", the OPQ-P variant): permute principal
    * dimensions so each of the `m` PQ subspaces receives a balanced
    * eigenvalue PRODUCT — plain PCA rotation concentrates variance in the
    * first subspaces and starves the rest, which wastes their code budget;
    * balancing the log-eigenvalue sums equalizes per-subspace quantization
    * difficulty. Greedy: dims in eigenvalue-desc order, each assigned to
    * the unfilled bucket with the smallest running log-product (ties →
    * lowest bucket) — the paper's heuristic, driver-side arithmetic over d
    * scalars.
    *
    * Returns the permuted dimension order: positions [j·d/m, (j+1)·d/m)
    * hold bucket j's principal-dimension indices in assignment order. Use
    * it to reorder a [[PcaModel]]'s components before [[project]], then
    * PQ-encode the projections ([[Similarity.pqCodebooks]] slices
    * consecutively, so slice j IS bucket j). */
  def opqAllocation(eigenvalues: Array[Double], m: Int): Array[Int] = {
    val d = eigenvalues.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val cap = d / m
    val order = eigenvalues.indices.sortBy(i => (-eigenvalues(i), i))
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(Vector.newBuilder[Int])
    val sizes = new Array[Int](m)
    order.foreach { dim =>
      var best = -1
      var j = 0
      while (j < m) {
        if (sizes(j) < cap && (best < 0 || logSum(j) < logSum(best))) best = j
        j += 1
      }
      buckets(best) += dim
      sizes(best) += 1
      logSum(best) += math.log(math.max(eigenvalues(dim), 1e-30))
    }
    buckets.flatMap(_.result())
  }

  /** Per-dimension z-score standardization — the feature-scaling step in
    * front of k-means / quantization / cosine pipelines whose dimensions
    * have incommensurate scales. Same cost shape as [[fit]]: ONE O(d²)-state
    * moments pass yields mean and SAMPLE std (n−1, `stddev_samp` parity)
    * per dimension, then a narrow codegen'd pass emits
    * z = (x − mean) / max(sd, 1e-30) (the floor keeps constant dimensions
    * at z = 0 instead of NaN). Returns (idCol, z array<double>). */
  def standardize(vectors: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val dim = vectors.select(size(col(vecCol))).head.getInt(0)
    val agg = udaf(new MomentsAggregator(dim))
    val flat = vectors
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .agg(agg(col("v")).as("m"))
      .head.getSeq[Double](0)
    val m = MomentsAggregator.decode(dim, flat)
    require(m.n > 1, s"standardize needs n > 1 vectors, got ${m.n}")
    val n = m.n.toDouble
    val mean = m.sums.map(_ / n)
    val sd = Array.tabulate(dim) { j =>
      math.max(math.sqrt(math.max(m.raw(j)(j) - n * mean(j) * mean(j), 0.0) / (n - 1.0)), 1e-30)
    }
    // native center-scale loop (graft.plans.CenterScaleExpr) — the nested
    // zip_with HOF form was interpreted per element; same element order and
    // casts, bit-identical output (round-16 optimization, guide §4)
    vectors.select(col(idCol),
      graft.plans.VectorExpressions.centerScale(col(vecCol), mean, sd).as("z"))
  }

  /** Project onto the model's components: (idCol, proj array<double>[r]).
    * Narrow pass — mean and components ride the expression tree as plain
    * model arrays inside ONE native expression
    * ([[graft.plans.CenteredProjectExpr]]). The previous HOF form
    * (`array(aggregate(zip_with(centered, comp_r, a*b), …) per component)`)
    * was r×d interpreted element-ops per row AND a 4 096-literal tree
    * Catalyst re-analyzed per query — measured 1.14 s per sf0.1 corpus
    * pass vs ~0.04 s native, same arithmetic order, bit-identical
    * (round-16 optimization, guide §4). */
  def project(vectors: DataFrame, model: PcaModel,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    vectors.select(col(idCol),
      graft.plans.VectorExpressions.centeredProject(col(vecCol), model.mean,
        model.components).as("proj"))
}
