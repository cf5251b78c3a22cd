package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline (broadcast the
  * query set — never the corpus — so the corpus streams through one narrow
  * pass). The scale paths avoid the all-pairs product: IVF partitions the
  * corpus by nearest centroid and probes only `nProbe` cells; random
  * hyperplane LSH buckets unit vectors so the self-join shuffles on a small
  * integer key.
  */
object Similarity {

  /** Brute-force cosine top-k: for every query vector, the k most similar
    * corpus vectors (excluding itself). The query side is broadcast — the
    * 100 TB corpus is read once, no shuffle of the corpus, and the per-row
    * work is a codegen'd dot product. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF (inverted-file) top-k: corpus is pre-assigned to its nearest of
    * `centroids`; each query probes only the `nProbe` nearest cells. At scale
    * the corpus can be written partitioned by `cell` so a probe is a
    * partition-pruned scan of nProbe/nCells of the data. Centroids are a
    * small DataFrame (id, vec) — broadcast everywhere. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int,
      nProbe: Int = 2, vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = centroids.select(col("centroid_id"), col("centroid_vec"))
    def nearestCells(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val scored = df.join(broadcast(cents))
        .select(col(id), col(vec),
          col("centroid_id").as("cell"),
          l2Sq(col(vec), col("centroid_vec")).as("dist"))
      val w = Window.partitionBy(id).orderBy(col("dist"), col("cell"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= n)
        .select(col(id), col(vec), col("cell"))
    }
    val corpusCells = nearestCells(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_vec")),
      "corpus_id", "corpus_vec", 1)
    val queryCells = nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")),
      "query_id", "query_vec", nProbe)
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Deterministic centroid pick: every `stride`-th vector by id order —
    * a cheap stand-in for k-means seeding that keeps tests reproducible. */
  def strideCentroids(corpus: DataFrame, nCentroids: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val w = Window.orderBy(col(idCol))
    corpus.withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") < nCentroids)
      .select(col("rn").cast("int").as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  /** Random-hyperplane LSH self-join: vectors sharing a `nBits`-bit sign
    * sketch land in one bucket; pairs within a bucket are verified by exact
    * cosine ≥ threshold. Hyperplanes are derived deterministically from
    * xxhash64 of (dim, bit) so executors agree without broadcasting
    * randomness. */
  def cosineSelfJoinLsh(vectors: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", threshold: Double = 0.9, nBits: Int = 12): DataFrame = {
    // sign sketch: bit b = sign(sum_d vec[d] * h(d,b)), h in {-1,+1}
    val vec = col("vec")
    val sketch = aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, b) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (v, d) => v.cast("double") *
              when(pmod(xxhash64(d, b), lit(2L)) === 0L, 1.0).otherwise(-1.0)),
          lit(0.0), (s, x) => s + x)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), b.cast("int")))
          .otherwise(lit(0L)))
      })
    val sk = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", sketch)
    val a = sk.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = sk.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
