package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing for pretraining pipelines: concatenate documents in id
  * order and chunk the token stream into fixed-size blocks, assigning each
  * document its global token offset and the block span it lands in.
  *
  * The core primitive is a DISTRIBUTED PREFIX SUM. A naive
  * `sum(n) over (order by id)` is a single-partition window — the whole
  * corpus funnels through one task, the classic scale-killer. Instead:
  *
  *  1. range-partition by id and sort within partitions (one shuffle, the
  *     only one in the operator);
  *  2. pass 1: per-partition token totals — `numPartitions` longs to the
  *     driver, metadata-sized at any corpus scale;
  *  3. pass 2: broadcast the exclusive partition offsets and run a
  *     single-pass running sum per partition (`mapPartitions` — genuinely
  *     imperative per-partition logic; each row's offset depends on every
  *     earlier row, which no Catalyst expression expresses without the
  *     global window).
  *
  * Both passes scan the same persisted (id, count) projection — two narrow
  * columns, never the text — so partition indices are stable between them.
  */
object Packing {

  /** Pack documents into `blockSize`-token blocks in ascending `idCol`
    * order. `countCol` is the per-document token count expression. Returns
    * (idCol, n_tokens, start_offset, block_first, block_last); a document
    * spans `block_first .. block_last` inclusive, an empty document sits at
    * the block its offset points into.
    */
  def packSequences(docs: DataFrame, countCol: Column, idCol: String = "doc_id",
      blockSize: Long = 2048L, numPartitions: Int = 0): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val counted = docs
      .select(col(idCol).cast("long"), countCol.cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals (driver sees numPartitions longs)
    val totals = counted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
    val bases = new Array[Long](totals.length)
    var acc = 0L
    totals.foreach { case (pid, s) => bases(pid) = acc; acc += s }
    val basesB = spark.sparkContext.broadcast(bases)
    // pass 2: within-partition running sum seeded from the broadcast base
    val offsets = counted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var off = basesB.value(pid)
      it.map { case (id, n) =>
        val start = off
        off += n
        (id, n, start)
      }
    }.toDF(idCol, "n_tokens", "start_offset")
    offsets.select(
      col(idCol), col("n_tokens"), col("start_offset"),
      floor(col("start_offset") / lit(blockSize)).as("block_first"),
      floor(greatest(col("start_offset") + col("n_tokens") - 1,
        col("start_offset")) / lit(blockSize)).as("block_last"))
  }

  /** Whole-document first-fit-decreasing packing: assign each document to a
    * `budget`-token bin WITHOUT splitting any document — the packing used
    * when training sequences must not cross document boundaries (SFT /
    * cross-doc-attention-free pretraining), complementing [[packSequences]]'
    * concat-and-chunk stream.
    *
    * Exact global FFD is inherently sequential (every placement depends on
    * all earlier bins), so the scalable contract is SHARDED FFD: documents
    * hash by id into `shards` independent folds (one shuffle), each fold
    * processing its documents longest-first with a bounded open-bin buffer:
    *
    *  - first-fit scans open bins in creation order, placing the doc in the
    *    first with `budget - fill >= n`;
    *  - no fit ⇒ open a new bin; if that exceeds `maxOpenBins`, the open bin
    *    with the LEAST remaining capacity closes (it is the least likely to
    *    fit any future doc; ties close the oldest) — per-fold state is
    *    O(maxOpenBins) regardless of corpus size;
    *  - docs longer than `budget` emit as singleton oversize bins.
    *
    * Every step is deterministic in (count desc, id asc) order, so the
    * assignment is reproducible across partitionings and engines — the
    * Python mirror in tools/gen_fixtures.py replays it exactly. Packing
    * quality vs unbounded global FFD is the standard sharding trade: waste
    * is bounded per fold, and folds see id-hashed (i.e. representative)
    * length distributions.
    *
    * Returns (idCol, n_tokens, shard, bin_id, bin_pos, oversize) where
    * `bin_id = shard << 40 | fold-local sequence` and `bin_pos` is the
    * document's 0-based placement position within its bin. */
  def packDocsFirstFit(docs: DataFrame, countCol: Column, idCol: String = "doc_id",
      budget: Long = 2048L, shards: Int = 64, maxOpenBins: Int = 8): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0 && shards <= (1 << 20), "shards must be in 1..2^20")
    require(maxOpenBins > 0, "maxOpenBins must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val packed = docs
      .select(col(idCol).cast("long").as("id"), countCol.cast("long").as("n"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n").desc, col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // a partition holds whole shards (hash-partitioned on shard); the
        // fold resets at each shard boundary of the (shard, n desc, id) sort
        var curShard = -1
        var nextSeq = 0L
        // open bins in creation order: (seq, fill, count)
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        it.map { case (id, n, sh) =>
          if (sh != curShard) { curShard = sh; nextSeq = 0L; bins.clear() }
          val binId = (sh.toLong << 40)
          if (n > budget) {
            val seq = nextSeq; nextSeq += 1
            (id, n, sh, binId | seq, 0, true)
          } else {
            val i = bins.indexWhere { case (_, fill, _) => fill + n <= budget }
            if (i >= 0) {
              val (seq, fill, cnt) = bins(i)
              bins(i) = (seq, fill + n, cnt + 1)
              (id, n, sh, binId | seq, cnt, false)
            } else {
              val seq = nextSeq; nextSeq += 1
              bins += ((seq, n, 1))
              if (bins.size > maxOpenBins) {
                var j = 0
                var k = 1
                while (k < bins.size) {
                  // least remaining capacity closes; ties close lowest seq
                  if (bins(k)._2 > bins(j)._2 ||
                      (bins(k)._2 == bins(j)._2 && bins(k)._1 < bins(j)._1)) j = k
                  k += 1
                }
                bins.remove(j)
              }
              (id, n, sh, binId | seq, 0, false)
            }
          }
        }
      }
      .toDF(idCol, "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
    packed
  }
}
