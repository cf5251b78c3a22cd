package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exact-budget temperature mixing (d95's pieces): Hamilton
  * largest-remainder apportionment in pure long arithmetic, exact integer
  * sqrt, and the deterministic md5-ranked per-group take. */
class BudgetMixSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("largestRemainder hits the budget exactly, extras to largest remainders") {
    // weights 5/3/2 over budget 7: exact shares 3.5/2.1/1.4 → floors
    // 3/2/1 (sum 6), one extra → largest remainder is a's .5
    assert(Sampling.largestRemainder(Seq("a" -> 5L, "b" -> 3L, "c" -> 2L), 7L)
      == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // remainder tie (.5 vs .5 at weights 1/1, budget 3): smaller key wins
    assert(Sampling.largestRemainder(Seq("y" -> 1L, "x" -> 1L), 3L)
      == Map("x" -> 2L, "y" -> 1L))
    // allocation is input-order-invariant
    assert(Sampling.largestRemainder(Seq("c" -> 2L, "a" -> 5L, "b" -> 3L), 7L)
      == Sampling.largestRemainder(Seq("a" -> 5L, "b" -> 3L, "c" -> 2L), 7L))
    // degenerate cases
    assert(Sampling.largestRemainder(Seq("a" -> 0L, "b" -> 0L), 5L)
      == Map("a" -> 0L, "b" -> 0L))
    assert(Sampling.largestRemainder(Nil, 5L) == Map.empty)
    // budget always exhausted when any weight is positive
    (1L to 23L).foreach { b =>
      val alloc = Sampling.largestRemainder(
        Seq("a" -> 7L, "b" -> 1L, "c" -> 3L, "d" -> 11L), b)
      assert(alloc.values.sum == b, s"budget $b: $alloc")
    }
    // pathological budget*weight overflow fails loudly, never wraps
    val e = intercept[IllegalArgumentException] {
      Sampling.largestRemainder(Seq("a" -> Long.MaxValue / 2), 3L)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("isqrt is the exact floor for boundary values") {
    assert(Sampling.isqrt(0) == 0 && Sampling.isqrt(1) == 1)
    // k^2 and k^2 - 1 around values where float sqrt could round up
    Seq(3L, 10L, 1000L, 94906265L).foreach { k =>
      assert(Sampling.isqrt(k * k) == k)
      assert(Sampling.isqrt(k * k - 1) == k - 1)
      assert(Sampling.isqrt(k * k + 1) == k)
    }
  }

  test("takePerGroup takes the quota by md5 order, capped at group size") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c")).toDF("doc_id", "source")
    val got = Sampling.takePerGroup(df, "source",
        Map("a" -> 2L, "b" -> 5L, "c" -> 0L))
      .as[(Long, String, Long)].collect().toSeq.sortBy(r => (r._2, r._3))
    // quota > size keeps the whole group; quota 0 keeps none
    assert(got.count(_._2 == "a") == 2)
    assert(got.count(_._2 == "b") == 2)
    assert(got.count(_._2 == "c") == 0)
    // the selected "a" ids are exactly the two with the smallest md5
    val byMd5 = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString))
    assert(got.filter(_._2 == "a").map(_._1).toSet == byMd5.take(2).toSet)
    // picks are 1-based contiguous ranks
    assert(got.filter(_._2 == "b").map(_._3).sorted == Seq(1L, 2L))
  }

  test("takePerGroupSkewSafe equals the window form on every group shape, incl. forced top-up") {
    // shapes: a dominant group (the skew case the operator exists for),
    // a mid group with quota > size, a singleton, rows with no quota,
    // a quota for an absent group
    val rows = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 430L).map(i => (i, "mid")) ++
      Seq((430L, "one")) ++
      (431L until 440L).map(i => (i, "noquota"))).toDF("doc_id", "source")
    val quotas = Map("big" -> 25L, "mid" -> 40L, "one" -> 1L, "ghost" -> 5L)
    val want = Sampling.takePerGroup(rows, "source", quotas)
      .as[(Long, String, Long)].collect().toSet
    assert(want.count(_._2 == "big") == 25 && want.count(_._2 == "mid") == 30)
    // (4.0, 64): the expected path — no shortfall, prefilter only.
    // (0.0, 0): thresholds 0 — EVERY group shorts, the top-up must redo
    // the full window form. (0.05, 1): thresholds a few rows wide — mixed
    // shortfall, exercising the partial union path.
    for ((f, sl) <- Seq((4.0, 64L), (1.0, 8L), (0.0, 0L), (0.05, 1L))) {
      val got = Sampling.takePerGroupSkewSafe(rows, "source", quotas,
          safetyFactor = f, slack = sl)
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"safetyFactor=$f slack=$sl must equal window form")
    }
    // degenerate: no quotas / no rows
    assert(Sampling.takePerGroupSkewSafe(rows, "source", Map.empty).count() == 0)
    assert(Sampling.takePerGroupSkewSafe(rows.limit(0), "source", quotas)
      .count() == 0)
  }

  test("property: skew-safe take equals window take on random group shapes") {
    val rng = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val rows = (0 until 5).flatMap { g =>
        val n = 1 + rng.nextInt(80)
        (0 until n).map(_ => (rng.nextInt(100000).toLong, s"g$g"))
      }.distinct.toDF("doc_id", "source")
      val quotas = (0 until 5).map(g => s"g$g" -> rng.nextInt(21).toLong).toMap
      val want = Sampling.takePerGroup(rows, "source", quotas)
        .as[(Long, String, Long)].collect().toSet
      val got = Sampling.takePerGroupSkewSafe(rows, "source", quotas,
          safetyFactor = 1.0 + trial, slack = trial.toLong)
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("dsirWeights ranks target-domain-like docs above off-domain docs") {
    // target domain speaks "alpha beta gamma"; off-domain speaks
    // "omega psi chi" — a doc's weight must order by how target-like it is
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),     // pure target-like
      (2L, "alpha beta omega psi"),            // mixed
      (3L, "omega psi chi omega psi chi"),     // pure off-domain
      (4L, "alpha gamma beta gamma"),          // pure target-like
      (5L, "chi psi omega")).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta gamma beta alpha gamma"))
      .toDF("doc_id", "text")
    val w = Dsir.dsirWeights(docs, target, nBuckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w.size == 5)
    assert(w(1L) > w(2L) && w(2L) > w(3L),
      s"weights must order pure > mixed > off-domain: $w")
    assert(w(4L) > w(2L), s"second pure target-like doc must beat mixed: $w")
    // absolute sign is NOT asserted: with add-one smoothing over a small
    // target corpus every bucket's target probability is smoothing-
    // dominated, so only the RELATIVE order is the contract (DSIR selects
    // by rank, not by a zero threshold)
    assert(w(5L) < w(4L), s"pure off-domain must rank below target-like: $w")
    // determinism: recomputing yields identical rounded weights
    val w2 = Dsir.dsirWeights(docs, target, nBuckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w2 == w)
  }

  test("dsirWeights bigram features are position-adjacent (not all pairs)") {
    // docs share the same unigram BAG; only bigram order separates them —
    // target order "fast join" must outrank the reversed "join fast"
    val docs = Seq(
      (1L, "fast join fast join"),
      (2L, "join fast join fast")).toDF("doc_id", "text")
    val target = Seq((100L, "fast join")).toDF("doc_id", "text")
    val w = Dsir.dsirWeights(docs, target, nBuckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w(1L) > w(2L),
      s"adjacent-bigram features must separate word order: $w")
  }

  test("quotas from isqrt weights reproduce the d95 contract end to end") {
    // 3 sources sized 100/25/4 → weights 10/5/2, budget 10 → exact
    // shares 5.88/2.94/1.18 → floors 5/2/1 (sum 8), extras to .94 and
    // .88 → 6/3/1
    val docs = (0L until 129L).map { i =>
      val src = if (i < 100) "big" else if (i < 125) "mid" else "tiny"
      (i, src)
    }.toDF("doc_id", "source")
    val counts = docs.groupBy("source").count()
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val quotas = Sampling.largestRemainder(
      counts.map { case (g, n) => g -> Sampling.isqrt(n) }, 10L)
    assert(quotas == Map("big" -> 6L, "mid" -> 3L, "tiny" -> 1L))
    val sel = Sampling.takePerGroup(docs, "source", quotas)
    assert(sel.count() == 10)
  }
}
