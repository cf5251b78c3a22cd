package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // two "domains" with disjoint-ish vocabularies: target docs talk about
  // fish, raw pile mixes fish-talk and rock-talk
  private val docs = Seq(
    (1L, true, "salmon trout herring salmon river trout"),
    (2L, true, "trout salmon stream herring herring"),
    (3L, false, "salmon trout river herring stream"), // target-like
    (4L, false, "granite basalt quartz slate granite"), // off-domain
    (5L, false, "granite salmon quartz trout slate")    // mixed
  ).toDF("doc_id", "tgt", "text")

  test("target-like documents score above off-domain ones; mixed lands between") {
    val w = Dsir.importanceWeights(docs, isTarget = col("tgt"), buckets = 256)
      .as[(Long, Double)].collect().toMap
    assert(w.size == 5)
    assert(w(3L) > w(5L) && w(5L) > w(4L))
    // absolute sign is not meaningful on a tiny corpus (raw ⊇ target, so
    // smoothing biases every term down uniformly) — the SEPARATION is the
    // signal: on-domain clears off-domain by a wide margin
    assert(w(3L) - w(4L) > 1.0)
  }

  test("weights are a pure function of counts: partitioning and row order don't matter") {
    val base = Dsir.importanceWeights(docs, col("tgt"), buckets = 64)
      .as[(Long, Double)].collect().toMap
    val shuffled = Dsir.importanceWeights(
      docs.repartition(7).orderBy(col("doc_id").desc), col("tgt"), buckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(base.keySet == shuffled.keySet)
    base.foreach { case (id, v) => assert(math.abs(v - shuffled(id)) < 1e-9) }
  }

  test("both entry points ride ONE estimator core: forms agree when features coincide") {
    // single-token docs admit no bigrams, so the d96 extractor
    // (unigram+bigram) degenerates to the d66 extractor (unigram) — with
    // target ⊆ docs the two public forms must then compute the SAME
    // weights, pinning that they share weightFromCounts rather than
    // duplicating the add-one lr math
    val single = Seq(
      (1L, true, "salmon"), (2L, true, "trout"), (3L, false, "salmon"),
      (4L, false, "granite"), (5L, false, "quartz"), (6L, false, "trout"))
      .toDF("doc_id", "tgt", "text")
    val viaFlag = Dsir.importanceWeights(single, col("tgt"), buckets = 64)
      .select(col("doc_id"), round(col("weight"), 6).as("w"))
      .as[(Long, Double)].collect().toMap
    val viaCorpus = Dsir.dsirWeights(single, single.filter(col("tgt")),
        nBuckets = 64, roundDigits = 6)
      .as[(Long, Double)].collect().toMap
    assert(viaFlag == viaCorpus,
      s"shared-core forms diverged: $viaFlag vs $viaCorpus")
  }

  test("hand-computed Laplace log-ratio on a one-token corpus") {
    val tiny = Seq((1L, true, "a"), (2L, false, "a")).toDF("doc_id", "tgt", "text")
    val b = 16
    val w = Dsir.importanceWeights(tiny, col("tgt"), buckets = b)
      .as[(Long, Double)].collect().toMap
    // one bucket holds 'a': target count 1 of total 1, raw count 2 of 2
    val expected = math.log(2.0 / (1 + b)) - math.log(3.0 / (2 + b))
    assert(math.abs(w(1L) - expected) < 1e-12)
    assert(math.abs(w(2L) - expected) < 1e-12)
  }
}
