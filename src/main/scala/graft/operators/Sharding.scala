package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic corpus shuffle + fixed-size sharding — the last step of a
  * training-data pipeline: training wants documents in a reproducible
  * pseudo-random order, cut into equal shards for data-parallel loaders.
  *
  * The shuffle key is `md5(id)` — a pure function of the id, so the order is
  * identical across re-runs, partitionings, and engines (no RNG, no seed
  * plumbing), uniformly "random" in the only sense training needs
  * (decorrelated from ingest order), and verifiable by any engine with md5.
  *
  * Global positions come from the same DISTRIBUTED PREFIX SUM as
  * [[Packing.packSequences]] (see its scaladoc for the two-pass shape): a
  * naive `row_number() over (order by key)` is a single-partition window —
  * the whole corpus through one task. Here: range-partition by key (the one
  * shuffle), count per partition (driver sees numPartitions longs), then a
  * running index per partition seeded from broadcast exclusive offsets.
  * Shard assignment is then arithmetic on the position — no further data
  * movement; writers downstream can `partitionBy("shard")`.
  */
object Sharding {

  /** Assign each row a shuffled global position and fixed-size shard:
    * (idCol, pos, shard, pos_in_shard), where `pos` orders by
    * (md5(id), id) and `shard = pos / shardSize`. */
  def shuffleShard(df: DataFrame, idCol: String = "doc_id",
      shardSize: Long = 64L, numPartitions: Int = 0): DataFrame =
    shardByKey(df, md5(col(idCol).cast("string")), idCol, shardSize, numPartitions)

  /** Curriculum ordering: shard by an explicit ORDER (e.g. a difficulty or
    * quality score, easy→hard), not a pseudo-random one — same machinery,
    * the key is just meaningful. Ties break on id so the order is total
    * and reproducible. */
  def orderShard(df: DataFrame, key: Column, idCol: String = "doc_id",
      shardSize: Long = 64L, numPartitions: Int = 0): DataFrame =
    shardByKey(df, key.cast("string"), idCol, shardSize, numPartitions)

  /** Shared core: global positions in (key, id) order via the two-pass
    * prefix sum. The key is compared AS A STRING (md5 hex is naturally
    * string-ordered; numeric curriculum keys must be encoded
    * order-preservingly by the caller — e.g. zero-padded via format_string —
    * exactly the contract an engine-independent oracle needs too). */
  private def shardByKey(df: DataFrame, key: Column, idCol: String,
      shardSize: Long, numPartitions: Int): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .select(col(idCol).cast("long"), key.cast("string").as("k"))
      .as[(Long, String)]
      .repartitionByRange(parts, col("k"), col(idCol))
      .sortWithinPartitions(col("k"), col(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = keyed.rdd
      .mapPartitionsWithIndex { case (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
    val bases = new Array[Long](counts.length)
    var acc = 0L
    counts.foreach { case (pid, n) => bases(pid) = acc; acc += n }
    val basesB = spark.sparkContext.broadcast(bases)
    keyed.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var pos = basesB.value(pid)
      it.map { case (id, _) =>
        val p = pos
        pos += 1
        (id, p)
      }
    }.toDF(idCol, "pos")
      .select(col(idCol), col("pos"),
        (col("pos") / lit(shardSize)).cast("long").as("shard"),
        pmod(col("pos"), lit(shardSize)).as("pos_in_shard"))
  }
}
