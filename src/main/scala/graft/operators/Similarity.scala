package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{ScoredTopKAggregator, VectorFunctions}
import graft.plans.VectorExpressions

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline (broadcast the
  * query set — never the corpus — so the corpus streams through one narrow
  * pass). The scale paths avoid the all-pairs product: IVF partitions the
  * corpus by nearest centroid and probes only `nProbe` cells; random
  * hyperplane LSH buckets unit vectors so the self-join shuffles on a small
  * integer key.
  *
  * Top-k is computed by a bounded partial aggregation
  * ([[graft.functions.ScoredTopKAggregator]]), NOT a
  * `Window.partitionBy(query)` — the window form shuffles every scored row
  * and serializes each query into one task, which is exactly the plan that
  * dies when the corpus is 100 TB and there are 5 queries. Centroid argmins
  * ride a native expression ([[graft.plans.NearestCellsExpr]]) so cell
  * assignment is a zero-shuffle narrow pass.
  */
object Similarity {

  /** Driver-side centroid collection: IVF centroid tables are k rows by
    * design (k ≪ corpus), so they travel inside expressions, not joins. */
  def collectCentroids(centroids: DataFrame,
      idCol: String = "centroid_id", vecCol: String = "centroid_vec"): Seq[(Int, Array[Double])] =
    centroids.select(col(idCol).cast("int"), col(vecCol)).collect().toSeq
      .map { r =>
        (r.getInt(0), r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)
      }

  /** (query_id, top array) → exploded (query_id, corpus_id, cosine, rank). */
  private def explodeRanked(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("corpus_id"), col("s.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Brute-force cosine top-k: for every query vector, the k most similar
    * corpus vectors (excluding itself). The query side is broadcast — the
    * 100 TB corpus is read once, no shuffle of the corpus; per-row scoring is
    * a native tight-loop cosine, and the only exchange carries ≤ k rows per
    * (query, partition). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val topk = udaf(new ScoredTopKAggregator(k))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    explodeRanked(scored.groupBy("query_id").agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** IVF (inverted-file) top-k: corpus rows are assigned to their nearest
    * centroid cell in one narrow pass; each query probes only its `nProbe`
    * nearest cells. At scale the corpus can be written partitioned by `cell`
    * so a probe is a partition-pruned scan of nProbe/nCells of the data.
    * Centroids are k rows — they ride inside the assignment expression. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int,
      nProbe: Int = 2, vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = collectCentroids(centroids)
    val topk = udaf(new ScoredTopKAggregator(k))
    val corpusCells = corpus
      .select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("corpus_vec"))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col("corpus_vec"), cents, 1), 1)
          .getField("cell"))
    val queryCells = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("cell",
        explode(transform(VectorExpressions.nearestCells(col("query_vec"), cents, nProbe),
          s => s.getField("cell"))))
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    explodeRanked(scored.groupBy("query_id").agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** Deterministic sampled centroid seed: the k lowest rows by
    * (xxhash64(id), id). Runs as TakeOrderedAndProject — per-partition
    * top-k then a k-way driver merge — NOT a global window sort. */
  def sampledCentroids(corpus: DataFrame, nCentroids: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val picked: Seq[(Int, Seq[Double])] = corpus
      .select(col(idCol).as("id"), transform(col(vecCol), v => v.cast("double")).as("vec"))
      .orderBy(xxhash64(col("id")), col("id")).limit(nCentroids)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toSeq) }
    picked.toDF("centroid_id", "centroid_vec")
  }

  /** Random-hyperplane LSH self-join: vectors sharing a `nBits`-bit sign
    * sketch land in one bucket; pairs within a bucket are verified by exact
    * cosine ≥ threshold. Hyperplanes are derived deterministically from
    * xxhash64 of (dim, bit) so executors agree without broadcasting
    * randomness. */
  def cosineSelfJoinLsh(vectors: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", threshold: Double = 0.9, nBits: Int = 12,
      maxBucket: Int = 4096): DataFrame = {
    // sign sketch: bit b = sign(sum_d vec[d] * h(d,b)), h in {-1,+1} — one
    // narrow native pass (the HOF form it replaces is parity-pinned in
    // VectorExpressionsSpec). Persisted: the guard's size pass and both
    // re-attach joins reuse (id, vec, bucket) instead of re-sketching.
    val sk = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", VectorExpressions.hyperplaneSketch(col("vec"), nBits))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // guarded distinct candidate pairs (equal-vector collapse bounds hot
    // sign-buckets), then exact-cosine verify on re-attached vectors
    SkewGuard.guardedSelfJoinPairs(sk, Seq("bucket"),
        idCol = "id", payloadCol = "vec", maxBucket = maxBucket, label = "cosine_lsh")
      .join(sk.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(sk.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
