package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Hard-negative mining — the contrastive/embedding-training data-prep
    * step (triplet/InfoNCE batches): for every anchor, the `k` most
    * SIMILAR corpus vectors carrying a DIFFERENT label — the negatives
    * that actually move the loss, vs uniformly-sampled easy ones. Same
    * scale shape as [[bruteForceTopK]]: the corpus is read once with the
    * anchors broadcast, the label disequality rides the broadcast-join
    * predicate (pruned BEFORE scoring), and the only exchange carries
    * ≤ k (id, score) pairs per (anchor, partition). At rest the IVF form
    * applies: probe the anchor's cells over the cell-partitioned corpus
    * and post-filter the label with an over-fetch — [[ivfTopK]] over a
    * pre-filtered corpus (the e29 stance) covers the constant-predicate
    * case; the per-anchor disequality needs the post-filter because the
    * excluded label differs per anchor. Ties break toward the lower
    * corpus id (the ScoredTopKAggregator contract every e-gate pins). */
  def hardNegativeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val topk = udaf(new ScoredTopKAggregator(k))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(labelCol).as("corpus_label"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(labelCol).as("query_label"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q),
        col("corpus_id") =!= col("query_id") &&
          col("corpus_label") =!= col("query_label"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    explodeRanked(scored.groupBy("query_id")
      .agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** SEMI-hard negative mining (Schroff et al. 2015, FaceNet §3.2): per
    * anchor, the `k` most similar different-label vectors that are still
    * LESS similar than the anchor's hardest positive (its most similar
    * same-label vector) — negatives inside the positive margin destabilize
    * training, easy ones teach nothing; semi-hard is the standard batch
    * miner. Anchors with no same-label partner have no margin and emit no
    * rows. Two corpus scans (the positive-threshold aggregate cannot fuse
    * with the negative scan), each with the anchor side broadcast; the
    * per-anchor threshold relation is |anchors|-rows and broadcasts back.
    * Exchange stays ≤ k rows per (anchor, partition). */
  def semiHardNegativeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val topk = udaf(new ScoredTopKAggregator(k))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(labelCol).as("corpus_label"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(labelCol).as("query_label"), col(vecCol).as("query_vec"))
    val posThr = c.join(broadcast(q),
        col("corpus_id") =!= col("query_id") &&
          col("corpus_label") === col("query_label"))
      .groupBy("query_id")
      .agg(max(VectorFunctions.cosine(col("query_vec"), col("corpus_vec")))
        .as("pos_cos"))
    val scored = c.join(
        broadcast(q.join(posThr, "query_id")),
        col("corpus_id") =!= col("query_id") &&
          col("corpus_label") =!= col("query_label"))
      .select(col("query_id"), col("corpus_id"), col("pos_cos"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
      .filter(col("cosine") < col("pos_cos"))
    explodeRanked(scored.groupBy("query_id")
      .agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** Triplet assembly — the training-ROW form of the miners above
    * (FaceNet-style `(anchor, positive, negative)` rows a contrastive
    * trainer consumes directly): each anchor pairs its HARDEST POSITIVE
    * (most similar same-label vector; ties toward the lower id, the
    * aggregator contract) with its `k` hard negatives from
    * [[hardNegativeTopK]]. Anchors with no same-label partner emit no
    * rows (no positive ⇒ no triplet — the FaceNet batch rule). Two
    * broadcast-anchor corpus scans (positive top-1, negative top-k) and
    * one |anchors|-row join; nothing corpus-sized ever shuffles. */
  def tripletMine(corpus: DataFrame, queries: DataFrame, k: Int,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val top1 = udaf(new ScoredTopKAggregator(1))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(labelCol).as("corpus_label"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(labelCol).as("query_label"), col(vecCol).as("query_vec"))
    val pos = c.join(broadcast(q),
        col("corpus_id") =!= col("query_id") &&
          col("corpus_label") === col("query_label"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
      .groupBy("query_id").agg(top1(col("corpus_id"), col("cosine")).as("top"))
      .select(col("query_id"),
        element_at(col("top"), 1).getField("id").as("pos_id"),
        element_at(col("top"), 1).getField("score").as("pos_cos"))
    hardNegativeTopK(corpus, queries, k, labelCol, vecCol, idCol)
      .join(pos, "query_id")
      .select(col("query_id").as("anchor_id"), col("pos_id"), col("pos_cos"),
        col("corpus_id").as("neg_id"), col("cosine").as("neg_cos"), col("rank"))
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

  /** Scale rule for the IVF cell count: grow cells with the corpus so the
    * EXPECTED CELL SIZE stays bounded (~256 vectors), per published IVF
    * practice (FAISS guidelines, SemDeDup §3). A FIXED cell count makes
    * within-cell pair work quadratic in the corpus — measured 23-26× time
    * at 10× data with 8 pinned cells vs 2.8-4.4× under this rule
    * (BENCH_sf1.json). Callers that pass explicit centroids own this
    * choice; the no-centroids overloads below apply the rule so the
    * DEFAULT shape is never the quadratic one. */
  def defaultCellCount(nVectors: Long): Int = math.max(8, (nVectors / 256).toInt)

  /** Centroid relation under the scale rule — one count + one sampled seed
    * pass. Shared by the no-centroids overloads. */
  def defaultCentroids(corpus: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    sampledCentroids(corpus, defaultCellCount(corpus.count()), vecCol, idCol)

  /** [[semanticDedup]] with centroids derived under the scale rule. */
  def semanticDedup(vectors: DataFrame, threshold: Double): DataFrame =
    semanticDedup(vectors, defaultCentroids(vectors), threshold)

  /** [[knnGraph]] with centroids derived under the scale rule. */
  def knnGraph(vectors: DataFrame, k: Int): DataFrame =
    knnGraph(vectors, defaultCentroids(vectors), k)

  /** [[ivfTopK]] with centroids derived under the scale rule and a
    * proportional probe budget (~1/16 of cells, ≥1). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cents = defaultCentroids(corpus)
    val nCells = cents.count().toInt
    ivfTopK(corpus, queries, cents, k, nProbe = math.max(1, nCells / 16))
  }

  /** Product-quantization codebooks from a centroid relation: the `dim`-d
    * vectors are cut into `m` equal subspaces; codebook `j` holds every
    * centroid's j-th slice. Centroid tables are k rows by design, so the
    * codebooks are driver-side values that ride inside expressions (same
    * stance as [[collectCentroids]]). Sub-codebook training quality is the
    * k-means operator's concern ([[KMeans.fitModel]] per slice); fixed
    * codebooks keep encode/search exactly reproducible. */
  def pqCodebooks(centroids: DataFrame, m: Int,
      idCol: String = "centroid_id", vecCol: String = "centroid_vec"): Seq[Seq[(Int, Array[Double])]] = {
    val full = collectCentroids(centroids, idCol, vecCol)
    require(full.nonEmpty, "empty centroid relation")
    val dim = full.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    (0 until m).map(j => full.map { case (id, v) => (id, v.slice(j * sub, (j + 1) * sub)) })
  }

  /** PQ encode: each vector becomes `m` small codes — the nearest
    * sub-centroid per subspace. This is the at-rest scale path for a 100 TB
    * embedding store: m bytes replace dim×4 (64-d float → 8 codes = 32×
    * smaller), and ADC search never touches the original vectors. One
    * narrow pass; every argmin is a native expression over a vector slice
    * (codebooks ride the expression tree — no join, no shuffle). */
  def pqEncode(corpus: DataFrame, codebooks: Seq[Seq[(Int, Array[Double])]],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val sub = codebooks.head.head._2.length
    val codes = array(codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(VectorExpressions.nearestCells(
        slice(col(vecCol), j * sub + 1, sub), cb, 1), 1).getField("cell")
    }: _*)
    corpus.select(col(idCol).cast("long").as("corpus_id"), codes.as("codes"))
  }

  /** PQ/ADC top-k (asymmetric distance computation): per query a lookup
    * table of squared L2 distances query-slice→sub-centroid is computed
    * driver-side (m×k doubles — queries are a handful by ANN contract) and
    * broadcast; each corpus row's approximate distance is m table lookups
    * summed. The 100 TB shape: the scan reads CODES only (m small ints per
    * vector), scoring is m lookups/row with zero shuffle, and top-k is the
    * bounded partial aggregation — identical plan shape to [[bruteForceTopK]]
    * but over 32× less data. Returns (query_id, corpus_id, adc_dist, rank),
    * rank by (adc_dist asc, corpus_id asc). */
  def pqTopK(codes: DataFrame, queries: DataFrame, codebooks: Seq[Seq[(Int, Array[Double])]],
      k: Int, vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val qids = queries.select(col(idCol).cast("long").as("query_id"))
      .as[Long].collect().toSeq.toDF("query_id")
    val candidates = codes.crossJoin(broadcast(qids))
      .select("query_id", "corpus_id", "codes")
    pqTopKScored(candidates, queries, codebooks, k, vecCol, idCol)
  }

  /** ADC scoring + bounded top-k over a candidate relation
    * (query_id, corpus_id, codes) — the shared tail of [[pqTopK]] (all
    * corpus rows are candidates) and [[ivfPqTopK]] (only probed cells). */
  private def pqTopKScored(candidates: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[(Int, Array[Double])]], k: Int,
      vecCol: String, idCol: String): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // LUT rows: per query, luts[j][c] = ||q_j - codebook_j[c]||², summed
    // left-to-right per slice (parity with NearestCellsExpr accumulation)
    val luts: Seq[(Long, Seq[Seq[Double]])] = queries
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .collect().toSeq.map { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Double](1).toArray
        val sub = codebooks.head.head._2.length
        val lut = codebooks.zipWithIndex.map { case (cb, j) =>
          cb.map { case (_, cv) =>
            var acc = 0.0
            var i = 0
            while (i < sub) { val d = qv(j * sub + i) - cv(i); acc += d * d; i += 1 }
            acc
          }
        }
        (qid, lut)
      }
    val topk = udaf(new ScoredTopKAggregator(k))
    val q = broadcast(luts.toDF("query_id", "lut"))
    // codebook ids are positions 0..k-1 in LUT order (pqCodebooks preserves
    // centroid order), so code c indexes slot c+1
    // adc_sum: one tight JVM loop per candidate row — replaces the
    // interpreted aggregate(zip_with(codes, lut, element_at)) HOF, the
    // exact pattern CenteredProjectExpr killed one hop upstream (round
    // 16); left-to-right accumulation, bit-identical (round 17)
    val scored = candidates.filter(col("corpus_id") =!= col("query_id"))
      .join(q, "query_id")
      .select(col("query_id"), col("corpus_id"),
        VectorExpressions.adcSum(col("codes"), col("lut")).as("adc"))
    scored.groupBy("query_id")
      .agg(topk(col("corpus_id"), -col("adc")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("corpus_id"), (-col("s.score")).as("adc_dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF-PQ top-k: the two scale paths composed — corpus rows carry a
    * coarse cell (IVF partition pruning at rest) AND m sub-codes (32×
    * smaller scan payload); a query probes its `nProbe` nearest cells and
    * ADC-scores only those rows from codes alone. This is the standard
    * billion-vector layout (FAISS IVFPQ): at 100 TB the probe reads
    * nProbe/nCells of the data and only code columns, so the scan cost is
    * (nProbe/nCells) × (m bytes / dim×4 bytes) of the brute-force scan.
    * Exactness: with `nProbe` = all cells the result equals [[pqTopK]]
    * (spec-pinned). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[(Int, Array[Double])]], k: Int, nProbe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = collectCentroids(centroids)
    val coded = pqEncode(corpus, codebooks, vecCol, idCol)
      .join(corpus.select(col(idCol).cast("long").as("corpus_id"),
        element_at(VectorExpressions.nearestCells(col(vecCol), cents, 1), 1)
          .getField("cell").as("cell")), "corpus_id")
    val probed = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("cell",
        explode(transform(VectorExpressions.nearestCells(col("query_vec"), cents, nProbe),
          s => s.getField("cell"))))
      .select("query_id", "cell")
    // restrict codes to probed cells (broadcast semi side), then ADC-score
    val candidates = coded.join(broadcast(probed), Seq("cell"))
      .select("query_id", "corpus_id", "codes")
    pqTopKScored(candidates, queries, codebooks, k, vecCol, idCol)
  }

  /** Scalar-quantized (SQ8) brute-force top-k — the FAISS SQ8 stance: each
    * corpus vector is stored as dim int8 codes + ONE scale (4× smaller scan
    * payload than f32; 16× smaller than f64), search is ASYMMETRIC — the
    * query stays exact, corpus vectors are dequantized code*scale on the
    * fly. Per-vector symmetric scale max|x|/127 with the same
    * floor(x/scale + 0.5) rounding rule the quantization diagnostic (e7)
    * pins across engines. Same scale shape as [[bruteForceTopK]]: broadcast
    * queries, one narrow corpus pass, bounded top-k partials — the scan
    * just reads a quarter of the bytes at rest. Returns
    * (query_id, corpus_id, cosine, rank) over the dequantized corpus. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val topk = udaf(new ScoredTopKAggregator(k))
    // at rest this is (corpus_id, codes int8[], scale); recomputed inline
    // here, dequantized per row in the scoring pass
    val enc = corpus
      .select(col(idCol).cast("long").as("corpus_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("scale",
        greatest(array_max(transform(col("v"), x => abs(x))) / 127.0, lit(1e-30)))
      .withColumn("codes", transform(col("v"), x => floor(x / col("scale") + 0.5)))
      .select(col("corpus_id"), col("scale"),
        transform(col("codes"), c => c * col("scale")).as("dq"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val scored = enc.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("dq")).as("cosine"))
    explodeRanked(scored.groupBy("query_id").agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** One packed sign-bit word array per vector: bit `i mod 64` of word
    * `i div 64` is set iff `v[i] > 0` — the at-rest layout is `dim/64`
    * longs, a 32× reduction over float32. Pure `functions._` composition
    * (transform/aggregate/shiftleft), stays inside codegen. */
  private def packSignBits(v: Column): Column =
    transform(sequence(lit(0), floor((size(v) - 1) / 64).cast("int")), w =>
      aggregate(
        sequence(w * 64, least(w * 64 + 63, size(v) - 1)),
        lit(0L),
        (acc, i) => acc.bitwiseOR(
          when(element_at(v, (i + 1).cast("int")) > 0,
            call_function("shiftleft", lit(1L), (i - w * 64).cast("int")))
            .otherwise(0L))))

  /** Binary (sign-bit) quantization ANN: Hamming distance over packed
    * sign bits as the cheap candidate stage, exact cosine re-rank of the
    * `rerank` Hamming-best as the answer — the "binary embeddings" recipe
    * (LSH sign sketches; Charikar '02 random-hyperplane simhash with the
    * identity basis). At rest the corpus is `dim/64` longs per row (32×
    * smaller than f32), and the candidate scan is xor+popcount per word —
    * memory-bandwidth-bound, no floats touched until re-rank fetches the
    * `queries × rerank` survivor vectors.
    *
    * Candidate stage ties (equal Hamming) break by smallest corpus id on
    * both engines, so the re-rank cutoff is engine-stable; final ranking is
    * cosine desc, id asc ([[bruteForceTopK]]'s rule). */
  def binarySignTopK(corpus: DataFrame, queries: DataFrame, k: Int, rerank: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(rerank >= k, s"rerank budget $rerank must cover k=$k")
    val topCand = udaf(new ScoredTopKAggregator(rerank))
    val topk = udaf(new ScoredTopKAggregator(k))
    val codes = corpus.select(col(idCol).cast("long").as("corpus_id"),
      packSignBits(col(vecCol)).as("corpus_bits"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      packSignBits(col(vecCol)).as("query_bits"))
    val hamming = aggregate(
      zip_with(col("corpus_bits"), col("query_bits"),
        (a, b) => call_function("bit_count", a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    // score = -hamming: the aggregator keeps largest-score (⇒ smallest
    // distance), ties smallest id — the cross-engine cutoff rule
    val cand = codes.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), (-hamming).cast("double").as("nh"))
      .groupBy("query_id").agg(topCand(col("corpus_id"), col("nh")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("corpus_id"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val rescored = corpus
      .select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("corpus_vec"))
      .join(broadcast(cand), "corpus_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    explodeRanked(rescored.groupBy("query_id").agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** Residual IVF-PQ top-k — the production FAISS IVFPQ layout: PQ codes
    * quantize each vector's RESIDUAL v − c(cell(v)) instead of v itself.
    * Residuals concentrate near the origin once the coarse quantizer has
    * soaked up the between-cell variance, so the same m×k code budget spends
    * its resolution on within-cell detail — materially better ADC fidelity
    * than [[ivfPqTopK]] at identical storage.
    *
    * Layout/cost shape is ivfPqTopK's exactly: at rest each row carries
    * (cell, m codes); a query probes nProbe cells and ADC-scores candidate
    * rows from codes alone. The one residual-specific twist: the query's
    * lookup table depends on the PROBED CELL (qres = q − c(cell) differs per
    * cell), so the broadcast LUT relation is keyed (query, cell) — nProbe
    * tables per query instead of one, still driver-metadata-sized
    * (queries × nProbe × m × k doubles).
    *
    * `codebooks` must be trained on residuals (same shape as
    * [[pqCodebooks]] output); `centroids` ids must be contiguous 0..n-1 so
    * cells index the broadcast centroid array positionally. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[(Int, Array[Double])]], k: Int, nProbe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = collectCentroids(centroids).sortBy(_._1)
    require(cents.map(_._1) == cents.indices.map(identity),
      s"residual IVF-PQ needs contiguous centroid ids 0..${cents.length - 1}")
    val centArr = array(cents.map { case (_, v) => array(v.map(lit): _*) }: _*)
    val sub = codebooks.head.head._2.length

    // corpus: cell assignment (native argmin), residual, per-slice codes —
    // one narrow zero-shuffle pass; at rest this writes (corpus_id, cell,
    // codes) partitioned by cell
    val res = zip_with(
      transform(col("v"), x => x.cast("double")),
      element_at(centArr, col("cell") + 1),
      (a, b) => a - b)
    val codes = array(codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(VectorExpressions.nearestCells(
        slice(col("res"), j * sub + 1, sub), cb, 1), 1).getField("cell")
    }: _*)
    val coded = corpus
      .select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("v"))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col("v"), cents, 1), 1).getField("cell"))
      .withColumn("res", res)
      .select(col("corpus_id"), col("cell"), codes.as("codes"))

    // queries: probe cells via the SAME native argmin (bit-identical cell
    // choice), then a per-(query, probed cell) LUT of squared L2 distances
    // residual-slice → codeword, built driver-side
    val qrows = queries
      .select(col(idCol).cast("long").as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("qv"),
        transform(VectorExpressions.nearestCells(col(vecCol), cents, nProbe),
          s => s.getField("cell")).as("cells"))
      .collect().toSeq
    val luts: Seq[(Long, Int, Seq[Seq[Double]])] = qrows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      r.getSeq[Int](2).map { cell =>
        val cv = cents(cell)._2
        val lut = codebooks.zipWithIndex.map { case (cb, j) =>
          cb.map { case (_, cw) =>
            var acc = 0.0
            var i = 0
            while (i < sub) {
              val d = (qv(j * sub + i) - cv(j * sub + i)) - cw(i)
              acc += d * d
              i += 1
            }
            acc
          }
        }
        (qid, cell, lut)
      }
    }
    val topk = udaf(new ScoredTopKAggregator(k))
    val q = broadcast(luts.toDF("query_id", "cell", "lut"))
    // adc_sum: native tight loop, bit-identical to the HOF form (round 17)
    val scored = coded.join(q, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorExpressions.adcSum(col("codes"), col("lut")).as("adc"))
    scored.groupBy("query_id")
      .agg(topk(col("corpus_id"), -col("adc")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("corpus_id"),
        (-col("s.score")).as("adc_dist"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Two-stage retrieval (the production FAISS refine step,
    * IndexRefineFlat over IVFPQ): ADC top-`kCoarse` candidates from
    * [[ivfPqResidualTopK]], re-ranked by EXACT squared L2 on re-attached
    * full-precision vectors, emitting top `kFinal` — recovers most of the
    * recall the code quantization loses for one extra id-keyed lookup.
    *
    * Scale shape: stage 1 is the bounded IVF-PQ probe (codes only, never
    * full vectors); the refine join touches queries × kCoarse rows — full
    * vectors are fetched for CANDIDATES only, by id against the at-rest
    * corpus, so the accuracy/IO trade is explicit (Jégou et al. '11 §IV-D).
    * Top-k is the bounded [[ScoredTopKAggregator]] partial, rank by
    * (distance asc, id asc). */
  def ivfPqRefineTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: Seq[Seq[(Int, Array[Double])]], kFinal: Int, kCoarse: Int,
      nProbe: Int = 2, vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cand = ivfPqResidualTopK(corpus, queries, centroids, codebooks,
        kCoarse, nProbe, vecCol, idCol)
      .select(col("query_id"), col("corpus_id"))
    val cvec = corpus.select(col(idCol).cast("long").as("corpus_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val qvec = broadcast(queries.select(col(idCol).cast("long").as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv")))
    // native l2_sq over the candidate rows — same left-to-right
    // accumulation as the HOF form, bit-identical (round 17)
    val exact = cand.join(cvec, "corpus_id").join(qvec, "query_id")
      .select(col("query_id"), col("corpus_id"),
        VectorExpressions.l2Sq(col("qv"), col("cv")).as("dist"))
    val topk = udaf(new ScoredTopKAggregator(kFinal))
    exact.groupBy("query_id").agg(topk(col("corpus_id"), -col("dist")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("corpus_id"),
        (-col("s.score")).as("l2sq"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Residual-PQ codebooks from a sample relation: each sample vector's
    * residual against its nearest centroid, sliced into m subspaces — the
    * fixed-sample training stance of [[pqCodebooks]] (codebook quality is a
    * training concern; FIXED codebooks keep encode/search reproducible).
    * Returns codebooks shaped exactly like [[pqCodebooks]]'s. */
  def residualCodebooks(sample: DataFrame, centroids: DataFrame, m: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): Seq[Seq[(Int, Array[Double])]] = {
    val cents = collectCentroids(centroids).sortBy(_._1)
    val centArr = array(cents.map { case (_, v) => array(v.map(lit): _*) }: _*)
    val residuals = sample
      .select(col(idCol).cast("int").as("id"), col(vecCol).as("v"))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col("v"), cents, 1), 1).getField("cell"))
      .select(col("id"), zip_with(
        transform(col("v"), x => x.cast("double")),
        element_at(centArr, col("cell") + 1),
        (a, b) => a - b).as("res"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    require(residuals.nonEmpty, "empty codebook sample")
    val dim = residuals.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    (0 until m).map(j => residuals.map { case (id, v) => (id, v.slice(j * sub, (j + 1) * sub)) })
  }

  /** ANN index-quality diagnostic: recall@k of the IVF probe against the
    * exact brute-force cosine top-k, per query — the standard metric for
    * tuning nProbe/nCells before committing a 100 TB index layout. Returns
    * (query_id, n_exact, n_found, recall).
    *
    * Cost shape: two corpus passes (one per arm — both already scale-safe:
    * broadcast queries, bounded top-k partials); the metric join itself
    * touches only queries×k rows, metadata scale. Set-membership recall, so
    * rank tie-breaks between the engines cannot move it. */
  def ivfRecallAtK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k, vecCol, idCol)
      .select(col("query_id"), col("corpus_id"))
    val approx = ivfTopK(corpus, queries, centroids, k, nProbe, vecCol, idCol)
      .select(col("query_id"), col("corpus_id"))
    val found = exact.join(approx, Seq("query_id", "corpus_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_found"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(found, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        round(coalesce(col("n_found"), lit(0L)).cast("double") / col("n_exact"), 4)
          .as("recall"))
  }

  /** Recall-vs-nProbe tuning curve: [[ivfRecallAtK]] swept over probe
    * budgets — the table a user reads to pick the smallest nProbe meeting
    * their recall target before freezing index parameters. An audit-time
    * operator (run on a query sample, not per-request): each budget
    * re-probes because the dominant cost — candidate scoring — differs per
    * budget anyway; sharing the one cell-rank pass would save only
    * metadata-scale work. Returns (n_probe, query_id, n_exact, n_found,
    * recall), one row per budget per query. */
  def ivfRecallSweep(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, probes: Seq[Int], vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(probes.nonEmpty, "probes must not be empty")
    probes.map { p =>
      ivfRecallAtK(corpus, queries, centroids, k, p, vecCol, idCol)
        .withColumn("n_probe", lit(p).cast("long"))
    }.reduce(_.unionByName(_))
      .select(col("n_probe"), col("query_id"), col("n_exact"),
        col("n_found"), col("recall"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus by nearest
    * centroid (one zero-shuffle native argmin pass), then drop any vector
    * that has a same-cell neighbor with cosine ≥ `threshold` and a smaller
    * id (deterministic "keep first" — the published heuristic keeps a
    * random member per dup set). Candidate pairs only form WITHIN a cell,
    * so the self-join shuffles on the small cell key and never goes
    * quadratic in the corpus; hot cells are bounded by the same skew guard
    * as the LSH dedups. Returns one row per vector:
    * (id, cell, dup_of nullable, kept). */
  def semanticDedup(vectors: DataFrame, centroids: DataFrame, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxBucket: Int = 4096): DataFrame = {
    val cents = collectCentroids(centroids)
    val cells = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col("vec"), cents, 1), 1)
          .getField("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = SkewGuard.guardedSelfJoinPairs(cells, Seq("cell"),
        idCol = "id", payloadCol = "vec", maxBucket = maxBucket, label = "semantic_dedup")
      .join(cells.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(cells.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .filter(VectorFunctions.cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select("id_a", "id_b")
    val dupOf = pairs.groupBy("id_b").agg(min("id_a").as("dup_of"))
      .withColumnRenamed("id_b", "id")
    cells.join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
  }

  /** Corpus k-NN graph: for EVERY vector, its k most-cosine-similar
    * neighbors within its IVF cell — the input structure for graph
    * clustering, SemDeDup-style pruning, label propagation, and
    * UMAP/diffusion embeddings. The all-pairs kNN graph is quadratic; the
    * cell-restricted graph is the standard scale construction (recall
    * bounded by cell balance — more centroids ⇒ finer cells; the e12
    * recall metric applies).
    *
    * Scale shape: one zero-shuffle argmin pass assigns cells; candidate
    * pairs form only WITHIN a cell via the same skew-guarded self-join as
    * [[semanticDedup]] (hot cells collapse/cap with observed metrics, never
    * silently); per-id top-k is the bounded [[ScoredTopKAggregator]]
    * partial — ≤ k rows per (id, partition) cross the exchange, no window.
    * Returns (id, nbr_id, cosine, rank), rank by (cosine desc, nbr asc). */
  def knnGraph(vectors: DataFrame, centroids: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxBucket: Int = 4096): DataFrame = {
    val cents = collectCentroids(centroids)
    val cells = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell",
        element_at(VectorExpressions.nearestCells(col("vec"), cents, 1), 1)
          .getField("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // undirected guarded pairs → symmetrize (each endpoint ranks the other)
    val und = SkewGuard.guardedSelfJoinPairs(cells, Seq("cell"),
      idCol = "id", payloadCol = "vec", maxBucket = maxBucket, label = "knn_graph")
    val directed = und.unionByName(
      und.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val topk = udaf(new ScoredTopKAggregator(k))
    val scored = directed
      .join(cells.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(cells.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
    scored.groupBy("id_a").agg(topk(col("id_b"), col("cosine")).as("top"))
      .select(col("id_a").as("id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("id"), col("s.id").as("nbr_id"), col("s.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
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

  /** Matryoshka (MRL) truncated-dimension retrieval: candidate generation
    * scores only the first `truncDims` components of each vector (MRL-trained
    * embeddings front-load information, so a prefix is a usable coarse
    * representation — Kusupati et al. 2022), then the `candidates` survivors
    * are re-ranked by full-dimension exact cosine.
    *
    * Scale shape is [[binarySignTopK]]'s: the coarse pass reads the corpus
    * once and the only exchange carries ≤ `candidates` rows per (query,
    * partition); the re-rank joins the tiny candidate relation (broadcast)
    * back against the corpus scan, never materializing full vectors for
    * non-candidates. At rest the truncated prefix can be stored as its own
    * column (truncDims/dim of the vector bytes) so the coarse scan reads a
    * fraction of the data — the same storage trick as [[pqTopK]] codes. */
  def truncatedRerankTopK(corpus: DataFrame, queries: DataFrame, truncDims: Int,
      candidates: Int, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(candidates >= k, s"candidate budget $candidates must cover k=$k")
    val topCand = udaf(new ScoredTopKAggregator(candidates))
    val topk = udaf(new ScoredTopKAggregator(k))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val cand = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(slice(col("corpus_vec"), 1, truncDims),
          slice(col("query_vec"), 1, truncDims)).as("tcos"))
      .groupBy("query_id").agg(topCand(col("corpus_id"), col("tcos")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("corpus_id"))
    val rescored = c
      .join(broadcast(cand), "corpus_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("cosine"))
    explodeRanked(rescored.groupBy("query_id")
      .agg(topk(col("corpus_id"), col("cosine")).as("top")))
  }

  /** Maximal Marginal Relevance (MMR) diversified top-k (Carbonell &
    * Goldstein 1998): greedily select `k` of the `candidates` most relevant
    * corpus vectors, each pick maximizing
    * `lambda·rel(q,c) − (1−lambda)·max_{s∈selected} cos(c,s)` — relevance
    * traded against redundancy with what is already selected, the standard
    * de-duplicating re-rank for retrieval-augmented pipelines.
    *
    * The candidate stage is [[bruteForceTopK]]'s distributed scan (swap in
    * any of the index-backed top-k's at scale); the greedy selection is
    * inherently sequential in the picks and quadratic in `candidates`, so it
    * runs on the driver over the CONTRACT-BOUNDED candidate set
    * (`candidates × |queries|` rows — e23's top-100-collect stance). All
    * ties resolve to the lowest corpus id, so selection is deterministic
    * and cross-engine reproducible.
    *
    * Returns (query_id, corpus_id, mmr_score, rank) with rank = pick order. */
  def mmrDiversifyTopK(corpus: DataFrame, queries: DataFrame, candidates: Int,
      k: Int, lambda: Double = 0.7,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(candidates >= k, s"candidate budget $candidates must cover k=$k")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0,1]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val topC = udaf(new ScoredTopKAggregator(candidates))
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("corpus_vec"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val cand = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        VectorFunctions.cosine(col("query_vec"), col("corpus_vec")).as("rel"))
      .groupBy("query_id").agg(topC(col("corpus_id"), col("rel")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("corpus_id"), col("s.score").as("rel"))
    // re-attach candidate vectors: the tiny candidate relation broadcasts
    // against one more corpus scan, then ≤ candidates×|queries| rows collect
    val rows = c.join(broadcast(cand), "corpus_id")
      .select(col("query_id"), col("corpus_id"), col("rel"), col("corpus_vec"))
      .collect()
    mmrSelect(rows, k, lambda).toDF("query_id", "corpus_id", "mmr_score", "rank")
  }

  /** The driver-side greedy MMR selection over a CONTRACT-BOUNDED
    * candidate set — shared by [[mmrDiversifyTopK]] (brute-force
    * candidates) and [[graft.streaming.StreamingIvf.mmrSearch]]
    * (at-rest partition-pruned candidates). `rows` =
    * (query_id, corpus_id, rel, corpus_vec); returns one pick tuple per
    * (query, rank). Ties resolve to the lowest corpus id. */
  private[graft] def mmrSelect(rows: Array[org.apache.spark.sql.Row], k: Int,
      lambda: Double): Seq[(Long, Long, Double, Int)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.groupBy(_.getLong(0)).toSeq.flatMap { case (qid, rs) =>
      // (id, rel, vec) sorted (rel desc, id asc) — the candidate order
      val cands = rs.map { r =>
        (r.getLong(1), r.getDouble(2),
          r.getSeq[Any](3).map(_.asInstanceOf[Number].doubleValue()).toArray)
      }.sortBy(t => (-t._2, t._1))
      val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
      while (selected.size < k && remaining.nonEmpty) {
        var bestIdx = -1
        var bestScore = Double.NegativeInfinity
        var bestId = Long.MaxValue
        var i = 0
        while (i < remaining.size) {
          val (id, rel, vec) = remaining(i)
          // redundancy term: true max over selected (can be negative);
          // 0 only for the first pick (empty selected set)
          var maxSim = if (selected.isEmpty) 0.0 else Double.NegativeInfinity
          selected.foreach { case (_, _, sv) => val s = cos(vec, sv); if (s > maxSim) maxSim = s }
          val score = lambda * rel - (1 - lambda) * maxSim
          if (score > bestScore || (score == bestScore && id < bestId)) {
            bestIdx = i; bestScore = score; bestId = id
          }
          i += 1
        }
        val pick = remaining.remove(bestIdx)
        selected += pick
        picks += ((qid, pick._1, bestScore, selected.size))
      }
      picks.toSeq
    }
  }

  /** Semantic decontamination: score every corpus vector against a benchmark
    * embedding set and report its closest-benchmark cosine — the
    * embedding-space complement of shingle decontamination
    * ([[Decontaminate]]), catching paraphrased benchmark leakage that exact
    * n-gram overlap misses (Yang et al. 2023, "rephrased samples").
    *
    * The benchmark side is broadcast — eval suites are thousands of rows
    * while the corpus is the 100 TB side, so the corpus streams through one
    * narrow scoring pass and the only exchange carries the per-partition
    * partial max/count per corpus id. For benchmark sets too large to
    * broadcast, bucket both sides with [[cosineSelfJoinLsh]]'s hyperplane
    * sketch and score within buckets (same recall caveats).
    *
    * Returns (id, max_benchmark_cos, n_hits, contaminated): the max cosine
    * over the benchmark, how many benchmark rows clear `threshold`, and the
    * flag itself. */
  def semanticDecontaminate(corpus: DataFrame, benchmark: DataFrame, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id",
      benchIdCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("corpus_vec"))
    val b = benchmark.select(col(benchIdCol).cast("long").as("bench_id"),
      col(vecCol).as("bench_vec"))
    // SAFETY GATE: an empty benchmark would make the crossJoin drop every
    // corpus row, and "no output" reads as "nothing contaminated" — an
    // accidentally-empty eval set must fail LOUDLY, not pass silently.
    // The one-row existence probe is negligible next to the scoring pass.
    require(!b.isEmpty,
      "semanticDecontaminate: benchmark relation is EMPTY — refusing to " +
        "certify a corpus clean against no benchmark (check the benchmark " +
        "load/filter)")
    // every corpus row scores against EVERY benchmark row — corpus and
    // benchmark are independent datasets, so a shared numeric id is a
    // coincidence, never a self-match to exclude (an id-inequality join
    // here would silently skip real comparisons when both sides number
    // from 0). Broadcast nested-loop by construction; the benchmark side
    // is the small one.
    c.crossJoin(broadcast(b))
      .select(col("id"),
        VectorFunctions.cosine(col("corpus_vec"), col("bench_vec")).as("cos"))
      .groupBy("id")
      .agg(max(col("cos")).as("max_benchmark_cos"),
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("contaminated", col("max_benchmark_cos") >= threshold)
  }
}
