package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // every stage represented: 1 low-quality, 2=3 exact dups, 4~5~6 a
  // near-dup chain (pairwise ≥ 0.5 Jaccard on 3-gram shingles), 7
  // contaminated by the probe, 8 clean
  private val base = "the quick brown fox jumps over the lazy dog near the river bank"
  private val corpus = Seq(
    (1L, "!!!! ???? ;;;; ::::"), // punctuation-heavy → quality 0
    (2L, "an entirely separate report about storage engines and their compaction layers"),
    (3L, "an entirely separate report about storage engines and their compaction layers"), // exact dup of 2
    (4L, s"$base in summer one"),
    (5L, s"$base in summer two"), // near dup of 4
    (6L, s"$base in summer six"), // near dup of 4 and 5 → same cluster, rep 4
    (7L, "the held out benchmark question appears verbatim in this document body"),
    (8L, "a completely clean and unique document that survives the whole pipeline intact")
  ).toDF("doc_id", "text")
  private val probes = Seq(
    (100L, "the held out benchmark question appears verbatim somewhere")
  ).toDF("doc_id", "text")

  test("every stage drops its doc; survivors get deterministic shards") {
    val out = CurationPipeline.curate(corpus, probes, minQuality = 0.9,
        jaccardThreshold = 0.5, probeNgram = 4, nShards = 16)
      .orderBy("doc_id")
      .select("doc_id", "stage", "shard")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(out.map(_._1) == (1L to 8L)) // one row per input doc
    val stages = out.map(r => r._1 -> r._2).toMap
    assert(stages(1L) == "quality")
    assert(stages(2L) == "kept")     // min id of the exact-dup group survives
    assert(stages(3L) == "exact_dup")
    assert(stages(4L) == "kept")     // cluster representative (min id)
    assert(stages(5L) == "near_dup")
    assert(stages(6L) == "near_dup") // transitively merged via 4~5, 4~6
    assert(stages(7L) == "contaminated")
    assert(stages(8L) == "kept")
    // shards: null exactly on drops, stable md5 bucket in range on keeps
    out.foreach { case (_, stage, shard) =>
      if (stage == "kept") assert(shard.exists(s => s >= 0 && s < 16))
      else assert(shard.isEmpty)
    }
    // determinism: same input → same shard assignment
    val again = CurationPipeline.curate(corpus, probes, minQuality = 0.9,
        jaccardThreshold = 0.5, probeNgram = 4, nShards = 16)
      .orderBy("doc_id").select("doc_id", "stage", "shard")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(again == out)
  }

  test("stage order is part of the contract: dedup precedes decontamination") {
    // a doc that is BOTH a near-dup (of a smaller id) and contaminated must
    // be labeled near_dup — its cluster died before the probe join ran
    val d = Seq(
      (1L, "the held out benchmark question appears verbatim in this document body"),
      (2L, "the held out benchmark question appears verbatim in this document body also")
    ).toDF("doc_id", "text")
    val out = CurationPipeline.curate(d, probes, minQuality = 0.0,
        jaccardThreshold = 0.5, probeNgram = 4, nShards = 16)
      .orderBy("doc_id").select("doc_id", "stage")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "contaminated"), (2L, "near_dup")))
  }

  test("no near-dup pairs: the clustering stage is a no-op, not a failure") {
    val d = Seq(
      (1L, "first unique document with entirely distinct words in it"),
      (2L, "second unrelated text sharing no trigram content whatsoever here")
    ).toDF("doc_id", "text")
    val out = CurationPipeline.curate(d, probes, minQuality = 0.0,
        jaccardThreshold = 0.5, probeNgram = 4, nShards = 4)
      .select("stage").as[String].collect().toSeq
    assert(out == Seq("kept", "kept"))
  }
}
