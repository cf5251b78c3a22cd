package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Benchmark decontamination at scale: flag corpus documents sharing any
  * word n-gram with a probe (benchmark) set.
  *
  * The exact plan (see SparkEntry d14) explodes both sides to
  * (shingle-hash, id) and equi-joins — right up to the point where the
  * probe's distinct shingle set no longer fits a broadcast hash relation.
  * This variant inserts a BLOOM PRE-FILTER: a bloom filter over the probe
  * hashes (~10 bits/item at 1% fpp — ~32× smaller than the hash relation)
  * is built with `stat.bloomFilter` (distributed treeAggregate) and
  * broadcast; the corpus side drops non-colliding shingles BEFORE the join
  * shuffle. Bloom filters have no false negatives, and the exact join
  * afterwards removes the false positives — so the output is bit-identical
  * to the exact plan while the shuffle carries only the (tiny) surviving
  * fraction.
  *
  * The membership probe is a scala UDF (no public `might_contain` in the
  * DataFrame API): a deliberate trade — a few xxhash probes per row against
  * shuffle volume proportional to the whole corpus. It sits behind the
  * codegen'd shingle explode and ahead of the shuffle, where it pays for
  * itself; everything else stays expression-based.
  */
object Decontaminate {

  /** (doc_id, n_shared) for corpus docs sharing ≥1 n-gram with the probe
    * docs. Same result as the exact explode-join; bloom-pruned shuffle. */
  def bloomPruned(corpus: DataFrame, probe: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val probeHashes = probe
      .select(explode(HashFunctions.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbe = probeHashes.count() // scalar; also materializes the persist
    val bloom = probeHashes.stat.bloomFilter("h", math.max(nProbe, 1L), fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    corpus
      .select(col(idCol), explode(HashFunctions.shingleHashes(col(textCol), n)).as("h"))
      .filter(mightContain(col("h")))
      .join(probeHashes, "h") // exact verify: false positives die here
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }
}
