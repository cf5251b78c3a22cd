package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** The composed end-to-end training-data curation pipeline — the flagship
  * "switch your corpus job to this library" operator: quality filter →
  * exact dedup → near-dup cluster dedup → benchmark decontamination →
  * shard assignment, each stage operating on the previous stage's
  * survivors (stage order changes results and is part of the contract —
  * dedup before decontamination means a contaminated doc's near-dups die
  * as near-dups, not as contamination).
  *
  * Returns ONE row per input doc: (idCol, stage, shard) where `stage` is
  * the drop reason ('quality' | 'exact_dup' | 'near_dup' | 'contaminated')
  * or 'kept', and `shard` is the reproducible md5 output shard for kept
  * docs (null otherwise) — the audit-friendly shape: corpus accounting is
  * one groupBy(stage), and the kept set joins back to text by id.
  *
  * Scale shape — the composition inherits each stage's 100 TB design:
  * quality is a narrow scan-speed projection ([[TextFunctions]] native
  * profile), exact dedup shuffles (md5, id) digests, near-dup pairs come
  * from MinHash-LSH band equi-joins ([[Dedup.ngramJaccardPairs]]) with
  * clusters via (id,label)-only connected components
  * ([[Dedup.duplicateClusters]]), decontamination broadcasts the distinct
  * probe-shingle hashes ([[Dedup]]'s d14 stance), and sharding is a pure
  * md5 projection ([[Sampling.hashSplit]]'s engine-portable bucket). Doc
  * TEXT is read in the stage passes and never shuffled; every exchanged
  * relation carries ids, digests, or band keys.
  */
object CurationPipeline {

  def curate(docs: DataFrame, probes: DataFrame, minQuality: Double = 0.9,
      jaccardThreshold: Double = 0.5, probeNgram: Int = 4, nShards: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nullShard = lit(null).cast("long").as("shard")

    // stage 1: quality floor (narrow, codegen'd, scan speed)
    val scored = docs
      .select(col(idCol), col(textCol),
        TextFunctions.qualityScoreOfProfile(TextFunctions.textProfile(col(textCol))).as("q"))
      .persist(MEMORY_AND_DISK)
    val qualityDrop = scored.filter(col("q") < minQuality)
      .select(col(idCol), lit("quality").as("stage"), nullShard)
    val s1 = scored.filter(col("q") >= minQuality).select(col(idCol), col(textCol))
      .persist(MEMORY_AND_DISK)

    // stage 2: exact dedup — keep the min id per content digest
    val keep = Dedup.exactDuplicateGroups(s1, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val exactDrop = s1.join(keep, Seq(idCol), "left_anti")
      .select(col(idCol), lit("exact_dup").as("stage"), nullShard)
    val s2 = s1.join(keep, Seq(idCol), "left_semi")
      .persist(MEMORY_AND_DISK)

    // stage 3: near-dup cluster dedup — LSH-pruned exact-Jaccard pairs,
    // connected components, keep each cluster's min id. Pairs are persisted
    // FIRST: the empty-check and the clustering's bidirectional edge union
    // otherwise re-run the whole LSH + verify plan per consumer.
    val pairs = Dedup.ngramJaccardPairs(s2, textCol, idCol,
      shingleN = 3, threshold = jaccardThreshold)
      .persist(MEMORY_AND_DISK)
    val nearDropIds =
      if (pairs.isEmpty) pairs.select(col("id_a").as(idCol)) // CC needs ≥1 edge
      else Dedup.duplicateClusters(pairs)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as(idCol))
    val nearDrop = nearDropIds.select(col(idCol), lit("near_dup").as("stage"), nullShard)
    val s3 = s2.join(nearDropIds, Seq(idCol), "left_anti")

    // stage 4: benchmark decontamination — any shared probe n-gram kills
    val probeH = probes
      .select(explode(HashFunctions.shingleHashes(col(textCol), probeNgram)).as("h"))
      .distinct()
    val contamIds = s3
      .select(col(idCol), explode(HashFunctions.shingleHashes(col(textCol), probeNgram)).as("h"))
      .join(broadcast(probeH), "h")
      .select(col(idCol)).distinct()
    val contamDrop = contamIds.select(col(idCol), lit("contaminated").as("stage"), nullShard)

    // stage 5: reproducible output shards for the kept set (pure md5
    // projection — engine-portable, partitioning-independent)
    val kept = s3.join(contamIds, Seq(idCol), "left_anti")
      .select(col(idCol), lit("kept").as("stage"),
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(nShards)).as("shard"))

    val out = qualityDrop.unionByName(exactDrop).unionByName(nearDrop)
      .unionByName(contamDrop).unionByName(kept)
    // Materialize the verdict eagerly (it is (id, stage, shard)-only —
    // tiny next to the text-bearing s1/s2), then release every stage
    // intermediate: a long-lived session invoking curate repeatedly would
    // otherwise accumulate MEMORY_AND_DISK blocks until eviction pressure.
    // The eager localCheckpoint cuts the lineage first, so the unpersists
    // cannot trigger recomputation. Operator-internal persists (inside
    // ngramJaccardPairs etc.) become unreferenced here and are reclaimed
    // by Spark's ContextCleaner on GC.
    val result = out.localCheckpoint(true)
    Seq(scored, s1, s2, pairs).foreach(_.unpersist(false))
    result
  }
}
