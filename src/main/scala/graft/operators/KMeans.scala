package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means over an `array<float|double>` embedding
  * column — the index-construction half of the IVF similarity path
  * ([[Similarity.ivfTopK]]).
  *
  * Pure DataFrame formulation: each iteration is (1) one narrow pass
  * assigning rows to their nearest broadcast centroid, (2) one shuffle
  * computing per-(cell, dim) means via posexplode — shuffle rows are
  * (cell:int, pos:int, partial sums), so at 100 TB the shuffle is
  * O(k × dim × partitions), never the corpus. Initialization is the
  * deterministic stride pick, so runs are reproducible; empty cells keep
  * their previous centroid.
  */
object KMeans {

  /** Returns centroids as (centroid_id int, centroid_vec array<double>). */
  def fit(vectors: DataFrame, k: Int, iterations: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = vectors.sparkSession
    val vecs = vectors.select(col(idCol).as("id"),
      transform(col(vecCol), v => v.cast("double")).as("vec"))
    var centroids = Similarity.strideCentroids(vecs, k, "vec", "id")
      .select(col("centroid_id"),
        transform(col("centroid_vec"), v => v.cast("double")).as("centroid_vec"))

    for (_ <- 1 to iterations) {
      val assigned = assignCells(vecs, centroids, "vec", "id")
      val means = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("new_vec"))
      centroids = centroids.join(means, centroids("centroid_id") === means("cell"), "left")
        .select(col("centroid_id"),
          coalesce(col("new_vec"), col("centroid_vec")).as("centroid_vec"))
      // materialize per iteration: flat lineage, k rows only
      centroids = centroids.localCheckpoint()
    }
    centroids
  }

  /** Nearest-centroid assignment: returns input columns + `cell`. */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    val scored = vectors.join(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("centroid_id").as("cell"),
        VectorFunctions.l2Sq(col(vecCol), col("centroid_vec")).as("dist"))
    val w = Window.partitionBy(idCol).orderBy(col("dist"), col("cell"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .drop("r", "dist")
  }
}
