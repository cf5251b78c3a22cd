package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009) — the classic
  * lexical scorer behind corpus search and RAG candidate generation, and
  * the standard hybrid partner to the [[Similarity]] ANN family.
  *
  * Scale shape: TWO corpus scans and nothing more — one scalar aggregate
  * for (N, avgdl), one tokens-explode filtered to the broadcast term set
  * producing the per-(doc, term) tf relation, which is PERSISTED (it is
  * matched-docs × terms — query-result-sized, not corpus-sized) and
  * reused for the driver-collected document frequencies and the scoring
  * sum. The result is eagerly checkpointed so the tf cache can be
  * released before returning; only (id, term, tf, dl) rows ever shuffle,
  * text never does.
  */
object Bm25 {

  /** Per-doc BM25 score for the fixed `terms` set: returns
    * (idCol, n_hit_terms, score) for every doc matching ≥ 1 term.
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative variant);
    * per-term tf factor = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). */
  def score(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks")).cast("double")).as("avgdl")).head()
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)

    val hits = toks
      .select(col(idCol), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // document frequencies: terms-cardinality, driver-collected
    val dfMap = hits.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val idfCol = dfMap.foldLeft(when(lit(false), 0.0)) { case (acc, (t, df)) =>
      acc.when(col("term") === t, math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
    }.otherwise(0.0)
    val out = hits
      .select(col(idCol),
        (idfCol * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / avgdl)))
          .as("contrib"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit_terms"), sum("contrib").as("score"))
      .localCheckpoint(true) // result is ≤ matched-docs rows — eager + small
    hits.unpersist(false)
    out
  }
}
