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
}
