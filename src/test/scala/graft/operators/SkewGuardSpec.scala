package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Adversarial skew tests: a hot LSH bucket (thousands of identical
  * documents/vectors — normal in web crawls) must NOT go quadratic. The
  * guard collapses equal payloads in oversized buckets to star pairs
  * (linear, same connected components) and keeps small-bucket results
  * byte-identical to the unguarded join. */
class SkewGuardSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val nDup = 10000

  test("minhash: 10k identical docs yield linear star pairs, dedup keeps one") {
    val dups = spark.range(nDup)
      .select(col("id").as("doc_id"),
        lit("the same exact crawled document body repeated verbatim many times").as("text"))
    val distinctDoc = Seq((nDup.toLong, "a completely different unrelated document about engines"))
      .toDF("doc_id", "text")
    val docs = dups.unionByName(distinctDoc)
    val pairs = Dedup.minHashLshPairs(docs, threshold = 0.5, maxBucket = 100)
    // clique would be ~5*10^7 pairs; star is nDup-1, all anchored at rep 0
    val rows = pairs.collect()
    assert(rows.length == nDup - 1)
    assert(rows.forall(_.getAs[Long]("id_a") == 0L))
    assert(rows.forall(_.getAs[Double]("jaccard_est") == 1.0))
    val kept = Dedup.minHashDedup(docs, threshold = 0.5, maxBucket = 100)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(0L, nDup.toLong))
  }

  test("simhash: hot 16-bit band bucket collapses, verify still exact") {
    val dups = spark.range(nDup)
      .select(col("id").as("doc_id"), lit("identical simhash content block").as("text"))
    val pairs = Dedup.simHashPairs(dups, maxHamming = 3, maxBucket = 50).collect()
    assert(pairs.length == nDup - 1)
    assert(pairs.forall(_.getAs[Int]("hamming") == 0))
  }

  test("cosine LSH: identical embeddings collapse; a distinct near pair survives") {
    val base = Array(0.6f, 0.8f, 0.0f)
    val near = Array(0.6f, 0.79f, 0.02f)
    val far = Array(0.0f, 0.1f, -0.99f)
    val vecs = spark.range(nDup).select(col("id").as("vec_id"), lit(base).as("embedding"))
      .unionByName(Seq((nDup.toLong, near), (nDup + 1L, far)).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineSelfJoinLsh(vecs, threshold = 0.9, maxBucket = 64)
    val got = pairs.collect()
    // stars for the nDup identical vectors + (rep, near) if they share a bucket
    assert(got.length >= nDup - 1 && got.length <= nDup + 1)
    val starCount = got.count(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") < nDup)
    assert(starCount == nDup - 1)
    assert(!got.exists(r => r.getAs[Long]("id_b") == nDup + 1L)) // far vector never pairs
  }

  test("guard is a no-op below the cap: pairs match the unguarded clique") {
    val docs = (0L until 20L).map(i => (i, s"shared prefix words here plus unique token u$i"))
      .toDF("doc_id", "text")
    val guarded = Dedup.minHashLshPairs(docs, threshold = 0.1, maxBucket = 4096)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val tight = Dedup.minHashLshPairs(docs, threshold = 0.1, maxBucket = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // with maxBucket high nothing collapses; both runs verify the same sigs,
    // and every tight-cap pair must be a subset-or-equal star/clique of the wide run
    assert(tight.subsetOf(guarded) || tight == guarded)
    assert(guarded.nonEmpty)
  }

  test("oversized bucket of DISTINCT payloads is dropped from the pair join, auditable") {
    // 300 distinct payloads forced into ONE bucket key
    val rows = spark.range(300)
      .select(lit(1).as("bucket"), col("id"), col("id").as("payload"))
      .toDF("bucket", "id", "payload")
    val pairs = SkewGuard.guardedSelfJoinPairs(rows,
      Seq("bucket"), "id", "payload", maxBucket = 100, label = "spec_drop")
    assert(pairs.collect().isEmpty) // all payloads distinct -> no stars, bucket dropped
    // the all-dropped plan collapses to EmptyRelation under AQE (observe()
    // node pruned with it) — bucketStats is the explicit audit path
    val stats = SkewGuard.bucketStats(rows, Seq("bucket"), "payload", maxBucket = 100).collect()
    assert(stats.length == 1)
    assert(stats.head.getAs[String]("disposition") == "dropped")
    assert(stats.head.getAs[Long]("bucket_rows") == 300L)
  }

  test("observe metrics flow on a plan with surviving pairs (collapse + rep join)") {
    // one bucket: 200 copies of payload A + 150 of payload B (cap 100) ->
    // two reps pair up, stars flow, and the CollectMetrics node survives
    val rows = spark.range(350)
      .select(lit(1).as("bucket"), col("id"),
        when(col("id") < 200, lit(7L)).otherwise(lit(9L)).as("payload"))
      .toDF("bucket", "id", "payload")
    val pairs = SkewGuard.guardedSelfJoinPairs(rows,
      Seq("bucket"), "id", "payload", maxBucket = 100, label = "spec_flow")
    val got = pairs.collect()
    // stars: 199 (rep 0) + 149 (rep 200); rep pair: (0, 200)
    assert(got.length == 199 + 149 + 1)
    val m = SkewGuard.observedMetrics(pairs.queryExecution).get("skew_guard_spec_flow")
    assert(m.isDefined, "observed metrics present")
    assert(m.get.getAs[Long]("collapsed_members") == 348L)
    assert(m.get.getAs[Double]("dropped_buckets") == 0.0)
  }

  test("keySkewReport: planted hot key shows up in exact basis points") {
    // 1000 rows on key 0, 100 keys with 10 rows each → 2000 rows total
    val rows = ((0 until 1000).map(_ => 0L) ++
      (1 to 100).flatMap(k => Seq.fill(10)(k.toLong)))
      .toDF("k")
    val r = SkewGuard.keySkewReport(rows, "k").collect()(0)
    assert(r.getAs[Long]("n_rows") == 2000L)
    assert(r.getAs[Long]("n_keys") == 101L)
    assert(r.getAs[Long]("max_freq") == 1000L)
    assert(r.getAs[Long]("top1_bp") == 5000L)      // hot key holds half the rows
    // top-10 = hot key + 9 ten-row keys = 1090 rows → 5450 bp
    assert(r.getAs[Long]("top10_bp") == 5450L)
    assert(r.getAs[Long]("max_vs_mean") == 50L)    // 1000 / (2000/101) = 50.5 → 50
  }
}
