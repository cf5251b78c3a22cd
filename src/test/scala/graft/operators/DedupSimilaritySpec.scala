package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

class DedupSimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (4L, "completely different content about spark distributed query engines and shuffles"),
    (5L, "another unrelated document describing minhash signatures and lsh banding methods")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per content hash") {
    val groups = Dedup.exactDuplicateGroups(docs).collect()
    assert(groups.length == 4) // 1&2 merge
    val dupGroup = groups.find(_.getAs[Long]("group_size") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
    val survivors = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minHashLshPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // identical ⇒ jaccard_est 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val dedup = Dedup.minHashDedup(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(dedup.contains(1L) && !dedup.contains(2L))
    assert(dedup.contains(4L) && dedup.contains(5L))
  }

  test("dedupAgainstIndex flags new docs against the at-rest index, nulls when clean") {
    val index = Dedup.signatureIndex(docs.filter($"doc_id".isin(1L, 3L, 4L)))
    val probe = docs.filter($"doc_id".isin(2L, 5L))
    val got = Dedup.dedupAgainstIndex(probe, index, threshold = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((2L, Some(1L)), (5L, None))) // 2 ≡ 1 exactly; 5 clean
    // hot-key cap: maxBucket=1 with a flooded index bucket drops the key —
    // the documented exact-dedup-first contract, never a quadratic join
    val flooded = Dedup.signatureIndex(
      (1L to 20L).map(i => (i + 100L, docs.filter($"doc_id" === 1L)
        .select("text").as[String].head())).toDF("doc_id", "text"))
    val capped = Dedup.dedupAgainstIndex(probe, flooded, threshold = 0.5, maxBucket = 1)
      .filter($"dup_of".isNotNull).count()
    assert(capped == 0)
  }

  test("simhash: identical docs at hamming 0, near dups close, unrelated far") {
    val sigs = docs.select($"doc_id",
      HashFunctions.simHash64($"text").as("sim")).as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    val pairs = Dedup.simHashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard verification on candidates") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.98f, 0.2f)),  // close to 2
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("brute force top-k ranks by cosine") {
    val res = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 2)
      .orderBy("rank").select("corpus_id").as[Long].collect()
    assert(res.head == 1L) // nearest neighbor of 0 is 1
  }

  test("hardNegativeTopK excludes the anchor's label and ranks the rest by cosine") {
    // anchor 0's true nearest neighbor (1) shares its label — a plain
    // top-k would return it; the hard-negative miner must skip to the
    // nearest DIFFERENT-label vectors
    val labeled = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.99f, 0.1f, 0.0f)),   // nearest, same label → excluded
      (2L, 1, Array(0.9f, 0.4f, 0.0f)),    // nearest different-label
      (3L, 1, Array(0.0f, 1.0f, 0.0f)),
      (4L, 2, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegativeTopK(
        labeled, labeled.filter($"vec_id" === 0L), k = 2)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 4L),
      s"must skip the same-label nearest neighbor: $got")
    // k beyond the different-label population returns exactly that population
    val all = Similarity.hardNegativeTopK(
        labeled, labeled.filter($"vec_id" === 0L), k = 10)
      .select("corpus_id").as[Long].collect().toSet
    assert(all == Set(2L, 3L, 4L))
  }

  test("semiHardNegativeTopK keeps only negatives outside the hardest-positive margin") {
    val labeled = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),    // anchor
      (1L, 0, Array(0.99f, 0.1f, 0.0f)),   // hardest positive (cos ≈ .995)
      (5L, 1, Array(0.999f, 0.01f, 0.0f)), // negative INSIDE the margin → excluded
      (2L, 1, Array(0.9f, 0.4f, 0.0f)),    // semi-hard
      (4L, 2, Array(0.6f, 0.8f, 0.0f)),    // semi-hard, farther
      (9L, 7, Array(0.0f, 0.0f, 1.0f))     // unique label: anchor 9 has no margin
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.semiHardNegativeTopK(
        labeled, labeled.filter($"vec_id" === 0L), k = 5)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 4L, 9L),
      s"inside-margin negative 5 must be excluded, rest ranked by cosine: $got")
    // an anchor with no same-label partner has no margin and emits nothing
    assert(Similarity.semiHardNegativeTopK(
      labeled, labeled.filter($"vec_id" === 9L), k = 5).count() == 0)
  }

  test("cosine function matches manual computation") {
    val c = vecs.filter($"vec_id" === 0L).select(
      VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect().head
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("ivf with stride centroids assigns every vector to one cell") {
    val cents = Similarity.sampledCentroids(vecs, 2)
    assert(cents.count() == 2)
    val res = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 4L), cents, k = 1, nProbe = 2)
    assert(res.count() <= 1)
  }

  test("lsh self-join finds the close pairs") {
    val pairs = Similarity.cosineSelfJoinLsh(vecs, threshold = 0.9, nBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("PQ: encode picks nearest sub-centroid per slice; ADC is exact on codebook vectors") {
    // 4-d vectors, m=2 subspaces of 2 dims; codebook = 3 centroids whose
    // slices tile a small grid, so some corpus vectors are exactly
    // representable (their ADC distance must equal the true squared L2)
    val cents = Seq(
      (0, Array(0f, 0f, 0f, 0f)),
      (1, Array(1f, 0f, 1f, 0f)),
      (2, Array(0f, 1f, 0f, 1f))
    ).toDF("centroid_id", "centroid_vec")
    val cbs = Similarity.pqCodebooks(cents, m = 2)
    assert(cbs.length == 2 && cbs.head.length == 3)
    assert(cbs(1)(2)._2.toSeq == Seq(0.0, 1.0))

    val corpus = Seq(
      (10L, Array(0f, 0f, 1f, 0f)),   // slices = (cb0 of c0, cb1 of c1) → codes [0,1]
      (11L, Array(1f, 0f, 0f, 1f)),   // codes [1,2]
      (12L, Array(0.9f, 0.1f, 0.1f, 0.9f)) // nearest: [1,2]
    ).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(corpus, cbs)
      .orderBy("corpus_id").as[(Long, Seq[Int])].collect()
    assert(codes(0)._2 == Seq(0, 1))
    assert(codes(1)._2 == Seq(1, 2))
    assert(codes(2)._2 == Seq(1, 2))

    val query = Seq((99L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(Similarity.pqEncode(corpus, cbs), query, cbs, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // vec 10 is exactly representable: ADC = true ||q - v||² = 1.0
    assert(top.map(_._2).toSeq == Seq(10L, 11L, 12L))
    assert(math.abs(top(0)._3 - 1.0) < 1e-12)
    // 11 and 12 share codes [1,2] ⇒ identical ADC (2.0), tie broken by id
    assert(math.abs(top(1)._3 - 2.0) < 1e-12 && math.abs(top(2)._3 - 2.0) < 1e-12)
  }

  test("ivfPqTopK equals pqTopK when every cell is probed; probes restrict candidates") {
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 0f else 4f // two well-separated clusters
      (i, Array.fill(4)(base + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val coarse = Seq((0, Array(0.5f, 0.5f, 0.5f, 0.5f)), (1, Array(4.5f, 4.5f, 4.5f, 4.5f)))
      .toDF("centroid_id", "centroid_vec")
    val cbCents = corpus.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val cbs = Similarity.pqCodebooks(cbCents, m = 2)
    val queries = corpus.filter($"vec_id" < 2)

    val flat = Similarity.pqTopK(Similarity.pqEncode(corpus, cbs), queries, cbs, k = 5)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val probedAll = Similarity.ivfPqTopK(corpus, queries, coarse, cbs, k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(flat == probedAll) // nProbe = all cells ⇒ identical result

    // nProbe=1: query 0 (cluster A) only sees cluster-A (even-id) candidates
    val one = Similarity.ivfPqTopK(corpus, queries.filter($"vec_id" === 0L),
        coarse, cbs, k = 50, nProbe = 1)
      .select("corpus_id").as[Long].collect()
    assert(one.nonEmpty && one.forall(_ % 2 == 0))
  }

  test("semanticDedup drops the same-cell near-duplicate, keeps originals") {
    val data = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.99f, 0.14f, 0f)), // cluster A, cos≈0.99
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0.97f, 0.24f)), // cluster B, cos≈0.97
      (4L, Array(1f, 0f, 0f))                                 // exact dup of 0
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1f, 0f, 0f)), (1, Array(0f, 1f, 0f)))
      .toDF("centroid_id", "centroid_vec")
    val out = Similarity.semanticDedup(data, cents, threshold = 0.95)
      .orderBy("vec_id")
      .select("vec_id", "cell", "dup_of", "kept")
      .as[(Long, Int, Option[Long], Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out(0)._4 && out(2)._4)                  // first of each cluster kept
    assert(!out(1)._4 && out(1)._3.contains(0L))    // 1 ~ 0 at cos 0.99
    assert(!out(3)._4 && out(3)._3.contains(2L))
    assert(!out(4)._4 && out(4)._3.contains(0L))    // exact dup dropped
    assert(out(0)._2 == 0 && out(2)._2 == 1)        // cells follow the clusters
  }

  test("defaultCellCount follows the bounded-cell-size scale rule") {
    // a FIXED cell count goes quadratic at scale; the default must grow
    // with the corpus (expected cell size ~256) and never drop below 8
    assert(Similarity.defaultCellCount(0L) == 8)
    assert(Similarity.defaultCellCount(2048L) == 8)
    assert(Similarity.defaultCellCount(256L * 64) == 64)
    assert(Similarity.defaultCellCount(20000L) == 78)   // sf1 embeddings
    assert(Similarity.defaultCellCount(100000000L) == 390625)
  }

  test("no-centroids overloads equal explicit calls under the scale rule") {
    val data = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.99f, 0.14f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0.97f, 0.24f)),
      (4L, Array(1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.defaultCentroids(data)
    assert(cents.count() == 5) // min(n, max(8, n/256)) seeds available
    val explicit = Similarity.semanticDedup(data, cents, threshold = 0.95)
      .orderBy("vec_id").collect().toSeq
    val defaulted = Similarity.semanticDedup(data, threshold = 0.95)
      .orderBy("vec_id").collect().toSeq
    assert(defaulted == explicit)
    val g1 = Similarity.knnGraph(data, cents, k = 2).orderBy("id", "rank").collect().toSeq
    val g2 = Similarity.knnGraph(data, k = 2).orderBy("id", "rank").collect().toSeq
    assert(g2 == g1)
  }

  test("text functions: tokens, quality, lang id") {
    val df = Seq(
      "The cat sat on the mat and it was a good day for everyone involved.",
      "der hund und die katze sind nicht mit dem auto gefahren",
      "").toDF("text")
    val rows = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.qualityScore($"text").as("q"),
      TextFunctions.langId($"text").as("lang")).collect()
    assert(rows(0).getAs[Long]("n") == 15L)
    assert(rows(0).getAs[Double]("q") >= 0.75)
    assert(rows(0).getAs[String]("lang") == "en")
    assert(rows(1).getAs[String]("lang") == "de")
    assert(rows(2).getAs[Long]("n") == 0L)
    assert(rows(2).getAs[String]("lang") == "und")
  }

  test("charEntropy: uniform, skewed, empty, and non-ASCII inputs") {
    val rows = Seq("abca", "", "aaaa", "abcdefgh", "aβaβ")
      .toDF("text")
      .select(graft.functions.TextFunctions.charEntropy($"text").as("ce"))
      .select($"ce.entropy", $"ce.n_distinct").as[(Double, Int)].collect()
    assert(math.abs(rows(0)._1 - 1.5) < 1e-12 && rows(0)._2 == 3)
    assert(rows(1) == ((0.0, 0)))
    assert(math.abs(rows(2)._1 - 0.0) < 1e-12 && rows(2)._2 == 1)
    assert(math.abs(rows(3)._1 - 3.0) < 1e-12 && rows(3)._2 == 8) // uniform: log2(8)
    assert(math.abs(rows(4)._1 - 1.0) < 1e-12 && rows(4)._2 == 2) // TreeMap spill path
  }

  test("IVF at-rest layout: cell-partitioned corpus prunes probe scans") {
    val pts = (0L until 120L).map(i => (i, Array((i % 4).toFloat, (i % 4) * 2f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.sampledCentroids(pts, 4)
    val assigned = KMeans.assignCells(
      pts.select($"vec_id".as("id"), $"embedding".as("vec")), cents, "vec", "id")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val probe = spark.read.parquet(dir).filter($"cell".isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"))
    assert(probe.count() == assigned.filter($"cell".isin(0, 1)).count())
  }

  test("IvfIndex: build/load/search round-trip with partition-pruned probes") {
    val rnd = new scala.util.Random(11)
    def blob(cx: Float, cy: Float, base: Long) =
      (0 until 40).map(i => (base + i,
        Array(cx + rnd.nextFloat() * 0.1f, cy + rnd.nextFloat() * 0.1f)))
    val pts = (blob(0f, 0f, 0L) ++ blob(10f, 0f, 100L) ++ blob(0f, 10f, 200L))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx-").toString
    val sse = IvfIndex.build(pts, dir, k = 3, iterations = 4)
    assert(sse.size == 4 && sse.sliding(2).forall(w => w(1) <= w(0) + 1e-9))

    val idx = IvfIndex.load(spark, dir)
    assert(idx.centroids.size == 3)
    val q = pts.filter($"vec_id" === 100L)
    val res = idx.search(q, k = 5, nProbe = 1).orderBy("rank")
    // all neighbors of a blob-100 point come from blob 100 at nProbe=1
    val ids = res.collect().map(_.getLong(1))
    assert(ids.length == 5 && ids.forall(id => id >= 100L && id < 140L), ids.toSeq.toString)

    // the probe scan is partition-pruned to the probed cell(s) — formatted
    // explain includes scan details AQE stage toString elides
    val probedPlan = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(probedPlan.linesIterator.exists(l =>
      l.contains("PartitionFilters:") && l.contains("cell#")), probedPlan.take(800))
  }

  test("KMeans converges on separated blobs; centroids power IVF search") {
    val rnd = new scala.util.Random(7)
    def blob(cx: Float, cy: Float, base: Long) =
      (0 until 30).map(i => (base + i,
        Array(cx + rnd.nextFloat() * 0.1f, cy + rnd.nextFloat() * 0.1f)))
    val pts = (blob(0f, 0f, 0L) ++ blob(10f, 0f, 100L) ++ blob(0f, 10f, 200L))
      .toDF("vec_id", "embedding")
    val cents = KMeans.fit(pts, k = 3, iterations = 5)
    assert(cents.count() == 3)
    // each blob maps to exactly one distinct cell
    val assigned = KMeans.assignCells(
      pts.select($"vec_id".as("id"), $"embedding".as("vec")), cents, "vec", "id")
      .select($"id", $"cell").as[(Long, Int)].collect()
    val cellsPerBlob = assigned.groupBy(_._1 / 100).view.mapValues(_.map(_._2).toSet).toMap
    assert(cellsPerBlob.values.forall(_.size == 1))
    assert(cellsPerBlob.values.flatten.toSet.size == 3)
    // centroids land near blob centers
    val cvecs = cents.select("centroid_vec").collect()
      .map(r => r.getSeq[Double](0).toList)
    assert(cvecs.exists(v => math.abs(v.head - 10.0) < 0.2 && math.abs(v(1)) < 0.2))
  }

  test("TopKAggregator: exact within capacity, heavy hitters survive beyond it") {
    import org.apache.spark.sql.functions.udaf
    val topk = udaf(new graft.functions.TopKAggregator(k = 2, capacity = 3))
    // 'a' x5, 'b' x3, then 6 distinct singletons forcing evictions
    val data = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d", "e", "f", "g", "h"))
      .toDF("token")
    val top = data.agg(topk($"token").as("t")).select(explode($"t").as("tc"))
      .select("tc.item", "tc.cnt").as[(String, Long)].collect()
    assert(top.map(_._1).take(2).toSet == Set("a", "b")) // heavy hitters found
    assert(top.find(_._1 == "a").get._2 >= 5) // counts may over-estimate, never under
  }

  test("doc fingerprint is order-sensitive") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma").toDF("text")
    val fps = df.select(HashFunctions.docFingerprint($"text")).as[Long].collect()
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
  }

  test("IvfIndex.append routes into frozen cells; search equals a union build") {
    val rnd = new scala.util.Random(13)
    def blob(cx: Float, cy: Float, base: Long, n: Int = 40) =
      (0 until n).map(i => (base + i,
        Array(cx + rnd.nextFloat() * 0.1f, cy + rnd.nextFloat() * 0.1f)))
    val first = blob(0f, 0f, 0L) ++ blob(10f, 0f, 100L) ++ blob(0f, 10f, 200L)
    val extra = blob(0f, 0f, 300L, 10) ++ blob(10f, 0f, 400L, 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-").toString
    IvfIndex.build(first.toDF("vec_id", "embedding"), dir, k = 3, iterations = 4)
    IvfIndex.append(extra.toDF("vec_id", "embedding"), dir)
    val idx = IvfIndex.load(spark, dir)
    val q = first.toDF("vec_id", "embedding").filter($"vec_id" === 100L)
    val got = idx.search(q, k = 8, nProbe = 1).orderBy("rank")
      .select("corpus_id").as[Long].collect().toSeq
    // appended blob-400 points live in blob-100's cell and are searchable
    assert(got.exists(id => id >= 400L && id < 410L))
    // equivalence: same centroids + union corpus ⇒ identical results
    val unionDf = (first ++ extra).toDF("vec_id", "embedding")
    val centsDf = idx.centroids.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "centroid_vec")
    val full = Similarity.ivfTopK(unionDf, q, centsDf, k = 8, nProbe = 1)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == full)
  }

  test("assignDistances flags a planted far vector past a fixed radius") {
    val base = (0L until 20L).map { i =>
      (i, Array.fill(4)(if (i % 2 == 0) 0.1f else 0.9f))
    }
    val planted = Seq((99L, Array(10f, 10f, 10f, 10f))) // far from both centroids
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val cents = Seq((0, Array(0.1, 0.1, 0.1, 0.1)), (1, Array(0.9, 0.9, 0.9, 0.9)))
      .toDF("centroid_id", "centroid_vec")
    val out = KMeans.assignDistances(df, cents, "embedding", "vec_id")
      .select($"vec_id", $"cell", $"dist_sq")
      .as[(Long, Int, Double)].collect()
    assert(out.filter(_._1 != 99L).forall(_._3 < 1e-10)) // exact centroid hits
    val far = out.find(_._1 == 99L).get
    assert(far._3 > 100.0) // squared L2 to nearest centroid
    assert(out.count(r => r._3 > 2.0) == 1) // only the planted vector flags
  }

  test("duplicateClusters merges a deep chain within the iteration budget") {
    // a 100-hop path graph: plain min-propagation needs 100 rounds; the
    // pointer-jumping variant must converge inside maxIters = 25
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(chain)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 101)
    assert(out.forall { case (_, c, n) => c == 0L && n == 101L })
  }

  test("duplicateClusters matches union-find on a multi-component graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),          // component {1,2,3} via chain
      (10L, 11L), (11L, 10L),      // duplicate + reversed edges
      (20L, 21L), (22L, 21L),      // min id arrives through a higher id
      (30L, 31L), (32L, 33L), (31L, 32L) // two merged sub-chains
    ).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L),
      (30L, 30L, 4L), (31L, 30L, 4L), (32L, 30L, 4L), (33L, 30L, 4L))
    assert(got == expected)
  }

  test("clusterDedup keeps representatives and singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val survivors = Dedup.clusterDedup(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 5L)) // 2,3 fold into 1; 4,5 untouched
  }

  test("clusterDedupBy keeps the best-scoring member, min id on ties") {
    // chain 1-2-3 is one cluster; 4,5 are unpaired singletons
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val scored = Seq((1L, 10), (2L, 40), (3L, 20), (4L, 0), (5L, 0))
      .toDF("doc_id", "score")
    val survivors = Dedup.clusterDedupBy(scored, pairs, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L, 4L, 5L)) // 2 beats 1 and 3 on score
    // all-tied scores degrade to the min-id representative
    val tied = Seq((1L, 7), (2L, 7), (3L, 7), (4L, 0), (5L, 0))
      .toDF("doc_id", "score")
    val tiedSurvivors = Dedup.clusterDedupBy(tied, pairs, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(tiedSurvivors == Set(1L, 4L, 5L))
  }

  test("containmentPairs finds short-in-long subset duplication Jaccard misses") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val chunk = (10 to 18).map(i => s"w$i").mkString(" ") // verbatim slice of doc 1
    val d = Seq((1L, long), (2L, chunk), (3L, "x y z q r s t u v"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, threshold = 0.9).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getAs[Double]("cont_b_in_a") == 1.0) // every shingle of 2 is in 1
    assert(r.getAs[Double]("cont_a_in_b") < 0.2)  // 1 is barely inside 2
    // the same pair's symmetric Jaccard is far below any dedup threshold
    val sh = d.select($"doc_id", HashFunctions.wordShingles($"text", 3).as("sh"))
    val jac = sh.as("a").join(sh.as("b"),
        $"a.doc_id" === 1L && $"b.doc_id" === 2L)
      .select(HashFunctions.jaccard($"a.sh", $"b.sh")).as[Double].head()
    assert(jac < 0.15, s"jaccard was $jac")
  }

  test("containmentPairs: hot boilerplate shingles do not generate candidates") {
    // 30 docs share only a boilerplate prefix; unique tails otherwise
    val boiler = (0L until 30L)
      .map(i => (100L + i, s"common header line plus unique$i tail$i bits$i"))
      .toDF("doc_id", "text")
    // boilerplate shingles have df=30: with the cap above that, pairs form
    val open = Dedup.containmentPairs(boiler, threshold = 0.3, maxDf = 1000)
    assert(open.count() > 0)
    // with the cap below, the only shared shingles are excluded from pair
    // generation — no candidates, no quadratic blowup
    val capped = Dedup.containmentPairs(boiler, threshold = 0.3, maxDf = 10)
    assert(capped.count() == 0)
  }

  test("dupSpanStats counts cross-doc duplicated n-gram spans") {
    val d = Seq(
      (1L, "a b c d e f g h"),      // shares the 5-gram window b..f with 2
      (2L, "z b c d e f y x"),
      (3L, "p q r s t u v w")       // disjoint
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(d, n = 5, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect().toSeq
    // docs 1 and 2 share exactly one 5-gram: "b c d e f"
    assert(got == Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 0L)))
    // whole-doc fallback for docs shorter than n: identical short docs dup
    val short = Seq((1L, "one two"), (2L, "one two"), (3L, "three"))
      .toDF("doc_id", "text")
    val s = Dedup.dupSpanStats(short, n = 5, minDocs = 2)
      .orderBy("doc_id").select("n_spans", "n_dup_spans")
      .as[(Long, Long)].collect().toSeq
    assert(s == Seq((1L, 1L), (1L, 1L), (1L, 0L)))
  }

  test("editDistancePairs verifies LSH candidates by character-level similarity") {
    // docs 1/2 identical (sim 1.0), 3 one word off (high sim), 4/5 unrelated
    val out = Dedup.editDistancePairs(docs, threshold = 0.8)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "edit_dist", "edit_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)).contains((1L, 2L)))
    val exact = out.find(p => (p._1, p._2) == ((1L, 2L))).get
    assert(exact._3 == 0L && exact._4 == 1.0)
    // 1 vs 3: "today" -> "yesterday" = insert 4 chars + substitutions
    val near = out.find(p => (p._1, p._2) == ((1L, 3L))).get
    assert(near._3 > 0L && near._4 >= 0.8)
    assert(out.forall { case (a, b, _, _) => Set(a, b).subsetOf(Set(1L, 2L, 3L)) })
  }

  test("removeDupSpans cuts cross-doc duplicated spans, merges overlaps, spares clean docs") {
    // docs 1 and 2 share the 7-token span "alpha beta gamma delta epsilon
    // zeta eta" (three overlapping 5-gram windows → one merged cut); their
    // remaining tokens are unique. doc 3 is clean; doc 4 repeats a 5-gram
    // WITHIN itself only (must not cut: df counts distinct docs).
    val span = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, s"one two $span three four"),
      (2L, s"five six $span seven eight"),
      (3L, "totally clean document with nothing repeated anywhere at all"),
      (4L, "x1 x2 x3 x4 x5 filler x1 x2 x3 x4 x5")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(d, n = 5, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, "one two three four", 11L, 7L)))
    assert(out(1) == ((2L, "five six seven eight", 11L, 7L)))
    assert(out(2)._4 == 0L)
    assert(out(2)._2 == "totally clean document with nothing repeated anywhere at all")
    assert(out(3)._4 == 0L) // within-doc repeat alone never marks a span
  }

  test("removeDupSpans: short docs pass through; full-dup docs empty out") {
    val d = Seq(
      (1L, "tiny doc"),           // < 5 tokens: no windows, untouched
      (2L, "a b c d e f"),        // exact dup of 3 → every window dup → all cut
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(d, n = 5, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, "tiny doc", 2L, 0L)))
    assert(out(1) == ((2L, "", 6L, 6L)))
    assert(out(2) == ((3L, "", 6L, 6L)))
  }

  test("positionalShingleHashes aligns with shingleHashes and drops the short-doc fallback") {
    val d = Seq((1L, "a b c d e f g"), (2L, "a b")).toDF("doc_id", "text")
    val both = d.select($"doc_id",
        graft.plans.SketchExpressions.positionalShingleHashes(
          TextFunctions.tokens(lower($"text")), 5).as("p"),
        HashFunctions.shingleHashes($"text", 5).as("s"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    // 7 tokens → 3 positional windows; distinct set equals shingleHashes'
    assert(both(0)._2.length == 3)
    assert(both(0)._2.toSet == both(0)._3.toSet)
    // 2 tokens: positional is EMPTY (no ≥5-token span possible) while
    // shingleHashes keeps its whole-doc fallback hash
    assert(both(1)._2.isEmpty && both(1)._3.length == 1)
  }

  test("sq8TopK: quantized search preserves exact top-k order on separated vectors") {
    val dim = 8
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
    val sq = Similarity.sq8TopK(vecs, q, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val exact = Similarity.bruteForceTopK(vecs, q, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // int8 error ~1/254 per element: same ids in the same order, and every
    // quantized cosine within 2% of the exact one
    assert(sq.map(r => (r._1, r._2, r._4)).toSet == exact.map(r => (r._1, r._2, r._4)).toSet)
    val exactByPair = exact.map(r => (r._1, r._2) -> r._3).toMap
    sq.foreach { case (qid, cid, cos, _) =>
      assert(math.abs(cos - exactByPair((qid, cid))) < 0.02)
    }
  }

  test("binarySignTopK: full rerank budget reproduces brute-force exactly; packed bits match signs") {
    val dim = 67 // deliberately non-multiple of 64: exercises the partial last word
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
    // rerank >= corpus ⇒ the Hamming stage prunes nothing and the exact
    // re-rank IS brute force — ids, ranks, and cosines must all agree
    val bin = Similarity.binarySignTopK(vecs, q, k = 5, rerank = 40)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val exact = Similarity.bruteForceTopK(vecs, q, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(bin == exact)
    // with a tight budget the candidate stage actually gates: results are
    // a subset of the Hamming-closest, still k rows per query, rank 1 keeps
    // the best surviving cosine
    val tight = Similarity.binarySignTopK(vecs, q, k = 3, rerank = 5)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(tight == Map(0L -> 3L, 1L -> 3L))
  }

  test("truncatedRerankTopK: full candidate budget reproduces brute-force; tight budget gates") {
    val dim = 24
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
    // candidates >= corpus ⇒ the truncated stage prunes nothing and the
    // full-dim re-rank IS brute force — ids, ranks, cosines all agree
    val mrl = Similarity.truncatedRerankTopK(vecs, q, truncDims = 6, candidates = 40, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val exact = Similarity.bruteForceTopK(vecs, q, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(mrl == exact)
    // tight budget: the coarse stage actually gates — k rows per query,
    // each surviving cosine equal to the exact cosine for that pair
    val tight = Similarity.truncatedRerankTopK(vecs, q, truncDims = 6, candidates = 8, k = 3)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    assert(tight.groupBy(_._1).forall(_._2.size == 3))
    val exactAll = Similarity.bruteForceTopK(vecs, q, k = 40)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    tight.foreach { case (qid, cid, cos) =>
      assert(math.abs(cos - exactAll((qid, cid))) < 1e-12)
    }
  }

  test("semanticDecontaminate: planted scaled copy flags, unrelated corpus stays clean") {
    val dim = 12
    val bench = (0L until 5L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    // corpus: one x2-scaled copy of bench 3 (cosine exactly 1 up to fp),
    // two orthogonal-ish unrelated vectors, AND a scaled copy of bench 2
    // that REUSES id 2 — corpus and benchmark are independent datasets, so
    // a shared numeric id must still be compared (the id-exclusion
    // regression: a corpus doc whose closest benchmark neighbor shares its
    // id would silently pass clean)
    val corpus = (bench.filter($"vec_id" === 3L)
      .select(lit(100L).as("vec_id"),
        transform($"embedding", x => (x * lit(2.0f)).cast("float")).as("embedding")))
      .unionByName(bench.filter($"vec_id" === 2L)
        .select(lit(2L).as("vec_id"),
          transform($"embedding", x => (x * lit(2.0f)).cast("float")).as("embedding")))
      .unionByName((10L until 12L).map { i =>
        (i, Array.tabulate(dim)(j => math.cos(i * 97 + j * 13).toFloat).toSeq)
      }.toDF("vec_id", "embedding"))
    val out = Similarity.semanticDecontaminate(corpus, bench, threshold = 0.95)
      .orderBy("id")
      .select("id", "max_benchmark_cos", "n_hits", "contaminated")
      .as[(Long, Double, Long, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(100L)._2 > 0.999999 && byId(100L)._3 == 1L && byId(100L)._4)
    assert(byId(2L)._2 > 0.999999 && byId(2L)._4) // same-id comparison NOT skipped
    assert(!byId(10L)._4 && !byId(11L)._4)
    assert(byId(10L)._3 == 0L && byId(11L)._3 == 0L)

    // SAFETY: an accidentally-empty benchmark must refuse loudly, never
    // return an empty frame that reads as "nothing contaminated"
    val err = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, bench.limit(0), threshold = 0.95)
    }
    assert(err.getMessage.contains("EMPTY"))
  }

  test("filtered ANN: pre-filter IVF at full probe equals brute force over the filtered corpus") {
    val dim = 12
    val vecs = (0L until 50L).map { i =>
      (i, i % 3, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val q = vecs.filter($"vec_id" < 2).select($"vec_id", $"embedding")
    val filtered = vecs.filter($"label" === 1).select($"vec_id", $"embedding")
    val ivf = Similarity.ivfTopK(filtered, q, cents, k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val exact = Similarity.bruteForceTopK(filtered, q, k = 5)
      .select("query_id", "corpus_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(ivf == exact)
    // every returned id satisfies the predicate (labels are id % 3)
    assert(ivf.forall(_._2 % 3 == 1))
  }

  test("ivfRecallSweep: recall non-decreasing in probe budget, 1.0 at full probing") {
    val dim = 12
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val q = vecs.filter($"vec_id" < 3)
    val sweep = Similarity.ivfRecallSweep(vecs, q, cents, k = 5, probes = Seq(1, 2, 4))
      .select("n_probe", "query_id", "recall")
      .as[(Long, Long, Double)].collect().toSeq
    assert(sweep.size == 9) // 3 budgets x 3 queries
    // per query, recall is non-decreasing in the budget
    sweep.groupBy(_._2).foreach { case (_, rows) =>
      val byProbe = rows.sortBy(_._1).map(_._3)
      assert(byProbe == byProbe.sorted)
    }
    // probing every cell IS brute force: recall exactly 1.0
    assert(sweep.filter(_._1 == 4L).forall(_._3 == 1.0))
  }

  test("mmrDiversifyTopK: lambda=1 is pure relevance; lower lambda skips a planted near-duplicate") {
    val dim = 16
    val base = (0L until 30L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat).toSeq)
    }
    // vector 1 := query 0 lightly perturbed (cos ≈ 0.999 ≫ any sin-noise
    // pair), and 100 := exact copy of 1 — so relevance ranks {1, 100} as
    // the top-2 for query 0 deterministically
    val near = base(0)._2.zipWithIndex.map { case (x, j) =>
      (x + (if (j == 0) 0.01f else 0.0f)) }
    val vecs = (base.updated(1, (1L, near)) :+ ((100L, near)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    // lambda=1: MMR degenerates to relevance order == brute-force top-k
    val pure = Similarity.mmrDiversifyTopK(vecs, q, candidates = 31, k = 5, lambda = 1.0)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    val exact = Similarity.bruteForceTopK(vecs, q, k = 5)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(pure == exact)
    // diversity: 1 and 100 are identical, so whichever is picked first, the
    // other must NOT be picked second (redundancy term 1.0 kills it) —
    // while pure relevance would rank them adjacently
    assert(exact.map(_._1).take(2).toSet == Set(1L, 100L))
    val div = Similarity.mmrDiversifyTopK(vecs, q, candidates = 31, k = 5, lambda = 0.5)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
      .map(_._1)
    assert(Set(1L, 100L).contains(div.head))
    assert(!Set(1L, 100L).contains(div(1)))
    // ranks are the pick order 1..k
    assert(pure.map(_._2) == (1 to 5))
  }

  test("ivfPqResidualTopK: an exact copy ranks first; residual ADC beats plain PQ fidelity") {
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    // query 100 = exact copy of corpus vector 10: identical residual ⇒
    // identical codes ⇒ its ADC distance to 10 is the global minimum
    val q = vecs.filter($"vec_id" === 10L)
      .select(lit(100L).as("vec_id"), $"embedding")
    val cbs = Similarity.residualCodebooks(vecs.filter($"vec_id" < 16), cents, m = 4)
    val out = Similarity.ivfPqResidualTopK(vecs, q, cents, cbs, k = 5, nProbe = 1)
      .orderBy("rank")
      .select("corpus_id", "adc_dist", "rank")
      .as[(Long, Double, Int)].collect().toSeq
    assert(out.size == 5)
    assert(out.head._1 == 10L && out.head._3 == 1)
    // residual fidelity: the copy's ADC self-distance under residual
    // codebooks is tighter than plain-PQ's on the same budget (residuals
    // concentrate near the origin once the coarse quantizer absorbs
    // between-cell variance)
    val plainCbs = Similarity.pqCodebooks(
      vecs.filter($"vec_id" < 16)
        .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec")), m = 4)
    val plain = Similarity.pqTopK(Similarity.pqEncode(vecs, plainCbs), q, plainCbs, k = 5)
      .filter($"corpus_id" === 10L).select("adc_dist").as[Double].head()
    assert(out.head._2 <= plain)
  }

  test("ivfPqRefineTopK: with all cells probed and kCoarse = corpus, refine equals brute-force L2") {
    val dim = 8
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val cbs = Similarity.residualCodebooks(vecs.filter($"vec_id" < 16), cents, m = 4)
    val q = vecs.filter($"vec_id" < 2)
    // probe every cell and keep every ADC candidate: the refine stage then
    // sees the full corpus, so exact re-ranking must equal brute-force L2
    val refined = Similarity.ivfPqRefineTopK(vecs, q, cents, cbs,
        kFinal = 5, kCoarse = 40, nProbe = 4)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val brute = {
      val all = vecs.as[(Long, Seq[Float])].collect()
      val qs = all.filter(_._1 < 2)
      qs.flatMap { case (qid, qv) =>
        all.filter(_._1 != qid)
          .map { case (cid, cv) =>
            val d = qv.zip(cv).map { case (a, b) =>
              (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
            (cid, d)
          }
          .sortBy { case (cid, d) => (d, cid) }.take(5).zipWithIndex
          .map { case ((cid, _), r) => (qid, cid, r + 1) }
      }.toSet
    }
    assert(refined == brute)
    // and refine is a strict improvement path: the ADC-only ranking at the
    // same budget differs from exact somewhere on this corpus (otherwise
    // the refine stage would be vacuous here)
    val adcOnly = Similarity.ivfPqResidualTopK(vecs, q, cents, cbs, k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(adcOnly != refined)
  }

  test("ivfRecallAtK: probing every cell recovers the exact top-k") {
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val queries = vecs.filter($"vec_id" < 3)
    val full = Similarity.ivfRecallAtK(vecs, queries, cents, k = 5, nProbe = 4)
      .select("query_id", "n_exact", "n_found", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(full.length == 3)
    assert(full.forall { case (_, ne, nf, r) => ne == 5L && nf == 5L && r == 1.0 })
    // nProbe=1 can only lose candidates, never invent them
    val partial = Similarity.ivfRecallAtK(vecs, queries, cents, k = 5, nProbe = 1)
      .select("n_found").as[Long].collect()
    assert(partial.forall(_ <= 5L))
  }

  test("knnGraph: every vector ranks its cellmates by cosine; edges stay within cells") {
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid_vec"))
    val graph = Similarity.knnGraph(vecs, cents, k = 3)
      .select("id", "nbr_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // driver reference: cells via assignCells, per-cell all-pairs cosine
    val cells = KMeans.assignCells(vecs, cents.select($"centroid_id", $"centroid_vec"),
        "embedding", "vec_id")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val raw = vecs.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = raw.keys.toSeq.flatMap { id =>
      val mates = raw.keys.toSeq.filter(o => o != id && cells(o) == cells(id))
      mates.map(o => (id, o, cos(raw(id), raw(o))))
        .sortBy { case (_, o, c) => (-c, o) }.take(3).zipWithIndex
        .map { case ((i, o, _), r) => (i, o, r + 1) }
    }.toSet
    assert(graph.map(g => (g._1, g._2, g._4)).toSet == expected)
    // every edge stays within a cell
    graph.foreach { case (a, b, _, _) => assert(cells(a) == cells(b)) }
    // ranks are 1..k' contiguous per id, cosine non-increasing
    graph.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(_._4)
      assert(sorted.map(_._4) == (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
    }
  }

  test("ngramNovelty: verbatim copies score 0, fresh docs 1, order matters") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),     // all grams first seen here
      (2L, "alpha beta gamma delta"),     // exact copy of 1 → novelty 0
      (3L, "zeta eta theta iota kappa"),  // disjoint → novelty 1
      (4L, "alpha beta gamma NEW"),       // shares "alpha beta gamma" with 1
      (5L, "xy"))                         // < n tokens → no row
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.ngramNovelty(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 2L, 2L, 1.0)))   // 2 grams, both novel
    assert(byId(2L)._4 == 0.0)                // copy: nothing novel
    assert(byId(3L)._4 == 1.0)                // disjoint: fully novel
    // doc 4: grams {alpha beta gamma, beta gamma new} — first owned by doc 1
    assert(byId(4L) == ((4L, 2L, 1L, 0.5)))
    // case-insensitivity: "NEW" lowercased, so a later "new" is not novel
  }

  private def w(n: Int, prefix: String = "w"): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("sharedSpans finds a maximal verbatim run with both start offsets") {
    // doc 1: 5 unique + 12 shared + 3 unique; doc 2: 2 unique + same 12 + 4 unique
    val shared = w(12, "s")
    val d = Seq(
      (1L, (w(5, "a") ++ shared ++ w(3, "b")).mkString(" ")),
      (2L, (w(2, "c") ++ shared ++ w(4, "d")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(d, minSpan = 10, anchor = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 5L, 2L, 12L))) // maximal, not per-anchor
  }

  test("sharedSpans drops runs below minSpan and splits on a mismatch") {
    val s1 = w(11, "x"); val s2 = w(11, "y")
    // doc 2 carries s1, ONE divergent token, then s2 — two separate spans
    // on the same diagonal; a 6-token overlap elsewhere stays below minSpan
    val d = Seq(
      (1L, (s1 ++ Seq("only1") ++ s2).mkString(" ")),
      (2L, (s1 ++ Seq("only2") ++ s2).mkString(" ")),
      (3L, (w(6, "x") ++ w(10, "z")).mkString(" ")) // 6 shared with doc 1 < 10
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(d, minSpan = 10, anchor = 4)
      .orderBy("doc_a", "doc_b", "start_a")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L, 0L, 11L), (1L, 2L, 12L, 12L, 11L)))
  }

  test("spanOverlap: per-corpus-doc verdict with longest probe passage") {
    val passage = w(15, "p")
    val corpus = Seq(
      (1L, (w(3, "a") ++ passage ++ w(2, "b")).mkString(" ")), // contains it
      (2L, (w(3, "a") ++ passage.take(8) ++ w(9, "c")).mkString(" ")), // 8 < 10
      (3L, w(12, "z").mkString(" "))                            // clean
    ).toDF("doc_id", "text")
    val probe = Seq((100L, (w(2, "q") ++ passage).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Decontaminate.spanOverlap(corpus, probe, minSpan = 10, anchor = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 15L, true),
      (2L, 0L, 0L, false), // 8-token overlap is sub-threshold
      (3L, 0L, 0L, false)))
  }

  test("removeSharedSpans deletes merged overlapping spans from the later doc only") {
    val run = w(14, "r")
    val d = Seq(
      (1L, (run.take(12) ++ w(4, "a")).mkString(" ")),      // earlier: keeps all
      (2L, (w(2, "q") ++ run ++ w(3, "z")).mkString(" ")),  // overlapping spans vs 1 & 3
      (3L, (run.drop(2) ++ w(5, "y")).mkString(" "))        // earlier than... no: id 3 later than 1
    ).toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(d, minSpan = 10, anchor = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 (earliest) untouched: md5 of its rejoined tokens
    val doc1 = (run.take(12) ++ w(4, "a")).mkString(" ")
    assert(out.head == ((1L, 16L, 16L,
      java.security.MessageDigest.getInstance("MD5").digest(doc1.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    // doc 2 shares r0..r11 with doc 1 and r2..r13 with... doc 3 is LATER
    // (3 > 2), so doc 2 only loses its span vs doc 1: tokens q0 q1 [r0..r11
    // cut] r12 r13 z0 z1 z2 remain
    val (id2, before2, after2, _) = out(1)
    assert((id2, before2, after2) == ((2L, 19L, 7L)))
    // doc 3 loses r2..r13 (12 tokens vs doc 2's copy at matching offsets
    // and r2..r11 vs doc 1) — merged: all 12 run-tokens go
    val (id3, before3, after3, _) = out(2)
    assert((id3, before3, after3) == ((3L, 17L, 5L)))
  }

  test("sharedSpans df cap excludes corpus-wide boilerplate grams") {
    val boiler = w(12, "b")
    val d = (1L to 6L).map(i => (i, (Seq(s"u$i") ++ boiler).mkString(" ")))
      .toDF("doc_id", "text")
    // df of every boilerplate anchor = 6 > maxDf=4: no pairs at all
    assert(Dedup.sharedSpans(d, minSpan = 10, anchor = 4, maxDf = 4).count() == 0)
    // with the cap open, all 15 pairs report the 12-token span
    assert(Dedup.sharedSpans(d, minSpan = 10, anchor = 4, maxDf = 64).count() == 15)
  }
}
