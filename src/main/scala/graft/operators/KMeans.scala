package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Distributed Lloyd's k-means over an `array<float|double>` embedding
  * column — the index-construction half of the IVF similarity path
  * ([[Similarity.ivfTopK]]).
  *
  * Centroids live on the DRIVER (k rows, small by IVF design) and ride into
  * each pass inside a native argmin expression
  * ([[graft.plans.NearestCellsExpr]]) — the same topology as Spark MLlib's
  * KMeans. Each iteration is:
  *   1. one NARROW pass assigning every row to its nearest centroid
  *      (zero shuffle, k×dim flops per row);
  *   2. one partial-aggregated mean: posexplode to (cell, pos, x), map-side
  *      combine, shuffle carries O(k × dim × partitions) partials — never
  *      the corpus;
  *   3. a k×dim collect back to the driver.
  * Initialization is a deterministic hash-ordered sample (per-partition
  * top-k + driver merge, no global sort); empty cells keep their previous
  * centroid. SSE is tracked per iteration — Lloyd's guarantees it is
  * non-increasing, which the e4 oracle asserts.
  */
object KMeans {

  /** Fitted model: centroids plus the per-iteration sum of squared
    * distances (SSE) AFTER each assignment pass. */
  case class Model(centroids: Seq[(Int, Array[Double])], sseHistory: Seq[Double])

  /** Returns centroids as (centroid_id int, centroid_vec array<double>). */
  def fit(vectors: DataFrame, k: Int, iterations: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    fitModel(vectors, k, iterations, vecCol, idCol)
      .centroids.map { case (id, v) => (id, v.toSeq) }
      .toDF("centroid_id", "centroid_vec")
  }

  /** Full fit with SSE history (for convergence invariants). */
  def fitModel(vectors: DataFrame, k: Int, iterations: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): Model = {
    val vecs = vectors.select(col(idCol).as("id"),
      transform(col(vecCol), v => v.cast("double")).as("vec"))

    // Init: deterministic farthest-point (k-means++-style) on a hash-ordered
    // sample. The sample is one TakeOrderedAndProject pass (per-partition
    // top-s + driver merge, size independent of corpus scale); the greedy
    // seeding then runs driver-side on s×dim doubles. Unlike a plain random
    // sample this cannot put all k seeds in one cluster.
    val sampleN = math.max(k * 20, 256)
    val sample: Array[Array[Double]] = vecs
      .orderBy(xxhash64(col("id")), col("id")).limit(sampleN)
      .collect()
      .map(r => r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
    var cents: Seq[(Int, Array[Double])] = farthestPointSeeds(sample, k)
      .zipWithIndex.map { case (v, i) => (i, v) }

    val sse = Seq.newBuilder[Double]
    for (_ <- 1 to iterations) {
      val assigned = vecs.withColumn("best",
          element_at(VectorExpressions.nearestCells(col("vec"), cents, 1), 1))
        .select(col("vec"), col("best.cell").as("cell"), col("best.dist").as("dist"))
      // ONE pass: per-(cell, dim) means + per-cell SSE, map-side combined.
      // dist is replicated dim times by posexplode, so it is summed at
      // pos 0 only; the whole iteration is a single job over the corpus.
      val rows = assigned
        .select(col("cell"), col("dist"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg("x").as("m"),
          sum(when(col("pos") === 0, col("dist")).otherwise(lit(0.0))).as("d0"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("new_vec"),
          sum("d0").as("cell_sse"))
        .collect()
      sse += rows.map(_.getDouble(2)).sum
      val newVecs = rows.map(r =>
        r.getInt(0) -> r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray).toMap
      cents = cents.map { case (cid, old) => (cid, newVecs.getOrElse(cid, old)) }
    }
    Model(cents, sse.result())
  }

  /** Greedy farthest-point seeding over a driver-side sample: seed 0 is the
    * first sample row (lowest hash), each next seed maximizes its minimum
    * distance to the chosen set. Deterministic (ties → lowest index). */
  private[graft] def farthestPointSeeds(sample: Array[Array[Double]], k: Int):
      Seq[Array[Double]] = {
    require(sample.nonEmpty, "empty sample for k-means init")
    val chosen = Seq.newBuilder[Array[Double]]
    val minDist = Array.fill(sample.length)(Double.MaxValue)
    var current = sample(0)
    chosen += current
    var c = 1
    while (c < k && c < sample.length) {
      var bestIdx = -1
      var bestDist = -1.0
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        var acc = 0.0
        var j = 0
        val m = math.min(v.length, current.length)
        while (j < m) { val d = v(j) - current(j); acc += d * d; j += 1 }
        if (acc < minDist(i)) minDist(i) = acc
        if (minDist(i) > bestDist) { bestDist = minDist(i); bestIdx = i }
        i += 1
      }
      current = sample(bestIdx)
      chosen += current
      c += 1
    }
    chosen.result()
  }

  /** Nearest-centroid assignment: input columns + `cell`, one narrow pass. */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    val cents = Similarity.collectCentroids(centroids)
    vectors.select(col(idCol), col(vecCol))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col(vecCol), cents, 1), 1).getField("cell"))
  }

  /** Like [[assignCells]] but also exposes the squared L2 distance to the
    * assigned centroid (`dist_sq`) — the input to centroid-distance outlier
    * pruning. Same single narrow pass, centroids in the expression tree. */
  def assignDistances(vectors: DataFrame, centroids: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    val cents = Similarity.collectCentroids(centroids)
    vectors.select(col(idCol), col(vecCol))
      .withColumn("nc",
        element_at(VectorExpressions.nearestCells(col(vecCol), cents, 1), 1))
      .select(col(idCol), col(vecCol), col("nc").getField("cell").as("cell"),
        col("nc").getField("dist").as("dist_sq"))
  }
}
