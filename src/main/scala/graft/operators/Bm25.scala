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
    // empty corpus: avg() is null and getDouble would NPE — nothing
    // matches, return the empty shape
    if (stats.isNullAt(1))
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0L).as("n_hit_terms"),
          lit(0.0).as("score"))
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

  /** Multi-query batch retrieval — the RAG candidate-generation shape:
    * top-`k` documents per query for a whole QUERY TABLE at once, one
    * shared inverted pass over the corpus instead of one [[score]] call
    * per query. The query table is a PROBE BATCH, rank-list-sized by
    * contract: its (query, term) relation is collected to the driver and
    * re-entered as a local relation (job-free broadcast builds); the
    * collect is bounded by `spark.graft.probe.maxLocalRows` and fails
    * loudly past it — this is NOT the path for corpus-×-corpus scoring. Query term sets are DISTINCT per query (standard bag-of-
    * words BM25 treats repeated query terms as weight; the distinct-set
    * form is the common retrieval convention and is the documented
    * contract here). Returns (queryIdCol, rank, idCol, score), rank 1 =
    * best, score rounded to `roundDigits` BEFORE ranking — the rounded
    * value is the tie contract (a raw double BM25 sum is summation-order
    * dependent below ~1e-12; rounding makes cross-engine/cross-run ranks
    * reproducible, ids break remaining ties ascending).
    *
    * Scale shape: one scalar corpus aggregate (N, avgdl); one corpus
    * tokens-explode semi-joined to the BROADCAST distinct query-term set
    * before the (doc, term) tf aggregation (query vocabulary is small by
    * construction — the corpus never shuffles unfiltered tokens); df as a
    * term-keyed relation joined back broadcast (terms-cardinality — no
    * driver-side map, unlike single-query [[score]]); per-(query, doc)
    * scoring via one equi-join on term; and top-k per query through
    * [[graft.functions.ScoredTopKAggregator]] — partial aggregation
    * bounds every partition's contribution to k rows per query BEFORE
    * the exchange, no per-query window funnel. */
  def topK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id", queryIdCol: String = "query_id",
      queryTextCol: String = "text", roundDigits: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // fanIfNarrow: the corpus tokenizes twice below (stats pass + tf pass)
    // — parallelize both when the scan planned narrow (no-op at scale)
    val fanned = Parallelize.fanIfNarrow(docs)
    val toks = fanned.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val stats = toks.agg(count(lit(1)).as("n"),
      avg(size(col("toks")).cast("double")).as("avgdl")).head()
    val n = stats.getLong(0).toDouble
    // empty corpus: avg() is null and getDouble would NPE (review
    // finding) — there is nothing to retrieve, return the empty shape
    if (stats.isNullAt(1))
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("rank"),
          lit(0L).as(idCol), lit(0.0).as("score"))
    val avgdl = stats.getDouble(1)

    // query relation is rank-list-sized by contract: collect once, re-enter
    // as a LOCAL relation — job-free broadcast builds, no persist (the
    // StreamingBm25.searchLazy stance, round 16). The collect is BOUNDED
    // (spark.graft.probe.maxLocalRows): a corpus-sized queries frame fails
    // loudly instead of becoming a driver-memory incident (round 17).
    val qTermsPlan = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(
        TextFunctions.tokens(lower(col(queryTextCol))))).as("term"))
    val qTermRows = graft.functions.ProbeCollect.collectBounded(
      qTermsPlan, "Bm25.topK")
    val qTerms = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(qTermRows: _*), qTermsPlan.schema)
    val termSet = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(qTermRows.map(_.getString(1)).distinct
        .map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val tf = toks
      .select(col(idCol), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(MEMORY_AND_DISK)
    val dfRel = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = qTerms
      .join(tf.join(broadcast(dfRel), "term"), "term")
      .select(col("query_id"), col(idCol),
        (log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .as("contrib"))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum("contrib"), roundDigits).as("score"))
    val out = graft.functions.ScoredTopK
      .rankTopK(scored, Seq("query_id"), col(idCol), col("score"), k, idCol)
      .localCheckpoint(true) // ≤ |queries| x k rows — eager + small
    tf.unpersist(false)
    out
  }
}
