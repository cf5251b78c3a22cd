package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hybrid retrieval: a second lexical ranking signal (token-set Jaccard)
  * and reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009 — the
  * standard way RAG stacks combine BM25 with a second ranker without
  * score calibration: only RANKS cross the fusion boundary, so the
  * fused lists need no comparable score scales).
  */
object Hybrid {

  /** Token-set Jaccard top-`k` per query — the set-overlap complement to
    * [[Bm25.topK]] (tf/idf-free: a short doc equal to the query set
    * outranks a long doc that merely contains it). Jaccard =
    * |Q∩D| / (|Q|+|D|−|Q∩D|) over DISTINCT lowercase tokens, rounded to
    * `roundDigits` before ranking (the cross-engine tie contract), ids
    * ascending on ties.
    *
    * Scale shape — no arrays ever shuffle: per-side distinct (id, term)
    * relations and (id, set-size) relations; candidates and intersection
    * sizes come from ONE equi-join on term filtered to the BROADCAST
    * query vocabulary (candidate pairs share ≥ 1 term — recall is exact
    * for Jaccard > 0); top-k per query through the bounded
    * [[graft.functions.ScoredTopKAggregator]]. */
  def jaccardTopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "text",
      roundDigits: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(
          TextFunctions.tokens(lower(col(queryTextCol))))).as("term"))
      .persist(MEMORY_AND_DISK)
    val qSize = qTerms.groupBy("query_id")
      .agg(count(lit(1)).cast("double").as("qsize"))
    val dTerms = docs.select(col(idCol),
      explode(array_distinct(
        TextFunctions.tokens(lower(col(textCol))))).as("term"))
    val dSize = dTerms.groupBy(idCol)
      .agg(count(lit(1)).cast("double").as("dsize"))
      .persist(MEMORY_AND_DISK)
    val inter = dTerms
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).cast("double").as("i"))
    val scored = inter
      .join(broadcast(qSize), "query_id")
      .join(dSize, idCol)
      .select(col("query_id"), col(idCol),
        round(col("i") / (col("qsize") + col("dsize") - col("i")),
          roundDigits).as("score"))
    val out = graft.functions.ScoredTopK
      .rankTopK(scored, Seq("query_id"), col(idCol), col("score"), k, idCol)
      .localCheckpoint(true) // ≤ |queries| x k rows
    Seq(qTerms, dSize).foreach(_.unpersist(false))
    out
  }

  /** Reciprocal-rank fusion of N ranked lists, each
    * (queryCol, idCol, rankCol) with rank 1 = best: fused score =
    * Σ_lists 1/(rrfK + rank), missing-from-a-list contributes nothing.
    * Returns (queryCol, rank, idCol, score) with the fused top-`topK`
    * per query; score rounded to `roundDigits` before ranking (tie
    * contract), ids ascending on ties.
    *
    * Scale shape: one union of the (already small — |queries| x k) rank
    * lists, one (query, id)-keyed aggregation, and the bounded top-k
    * aggregator. Nothing here touches the corpus: fusion is
    * rank-list-sized at any corpus scale. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int = 10, rrfK: Int = 60,
      queryCol: String = "query_id", idCol: String = "doc_id",
      rankCol: String = "rank", roundDigits: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "need >= 1 ranking")
    require(topK >= 1 && rrfK >= 0, s"bad topK=$topK rrfK=$rrfK")
    val slim = rankings.map(_.select(col(queryCol), col(idCol),
      col(rankCol).cast("double").as("r")))
    val unioned = slim.reduce(_ unionByName _)
    val fused = unioned
      .groupBy(col(queryCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("r"))),
        roundDigits).as("score"))
    graft.functions.ScoredTopK
      .rankTopK(fused, Seq(queryCol), col(idCol), col("score"), topK, idCol)
  }

  /** Weighted-sum (convex-combination) fusion with per-(query, list)
    * MIN-MAX normalization — the score-calibrating alternative to
    * [[rrfFuse]]: each list's scores normalize to [0, 1] WITHIN the
    * query's retrieved list ((s − min)/(max − min); a constant list
    * normalizes to 0), a doc missing from a list contributes 0 (the
    * normalized minimum), fused = Σᵢ wᵢ·normᵢ. Scores round to
    * `roundDigits` before ranking (the cross-engine tie contract), ids
    * ascending on ties.
    *
    * Scale shape: rank-list-sized like [[rrfFuse]] — the per-(query,
    * list) min/max relations are tiny aggregations over ≤ |queries| × k
    * rows and broadcast back; fusion never touches the corpus. */
  def weightedFuse(rankings: Seq[(DataFrame, Double)], topK: Int = 10,
      queryCol: String = "query_id", idCol: String = "doc_id",
      scoreCol: String = "score", roundDigits: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "need >= 1 (ranking, weight)")
    require(topK >= 1, s"bad topK=$topK")
    require(rankings.forall(_._2 >= 0.0), "weights must be >= 0")
    val normed = rankings.map { case (df, w) =>
      val s = df.select(col(queryCol), col(idCol),
        col(scoreCol).cast("double").as("s"))
      val mm = s.groupBy(queryCol)
        .agg(min("s").as("lo"), max("s").as("hi"))
      s.join(broadcast(mm), Seq(queryCol))
        .select(col(queryCol), col(idCol),
          (lit(w) * when(col("hi") > col("lo"),
            (col("s") - col("lo")) / (col("hi") - col("lo")))
            .otherwise(lit(0.0))).as("contrib"))
    }
    val fused = normed.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(idCol))
      .agg(round(sum("contrib"), roundDigits).as("score"))
    graft.functions.ScoredTopK
      .rankTopK(fused, Seq(queryCol), col(idCol), col("score"), topK, idCol)
  }
}
