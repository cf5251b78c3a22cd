package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Standing whole-document packing: the streaming twin of
  * [[graft.operators.Packing.packDocsFirstFit]] — documents arrive in
  * epochs and first-fit into per-shard OPEN BINS carried as at-rest state,
  * so a bin partially filled in epoch N keeps filling in epoch N+1 instead
  * of shipping half-empty (the continuous-ingest packing a training-data
  * pipeline actually runs; one-shot FFD would re-pack the world per day).
  *
  * Semantics: within each arrival epoch, each shard processes its docs
  * longest-first ((count desc, id asc) — the batch operator's order applied
  * per epoch, since future arrivals are unknowable) with the SAME fold
  * rules: first-fit in bin-creation order, over-cap closes the fullest
  * (ties oldest), oversize docs emit as singleton bins. Bin sequences
  * continue across epochs per shard, so `bin_id = shard << 40 | seq` never
  * collides between epochs.
  *
  * Scale shape: the doc flow is the batch operator's exactly (one shuffle
  * per epoch, per-shard sequential folds); the carried state is
  * `O(shards × maxOpenBins)` rows — metadata-scale at any corpus size — so
  * it broadcasts into the fold and the driver collects only the post-epoch
  * snapshot. State at rest is a per-epoch SNAPSHOT (`bins/batch=<epoch>`),
  * not an append-only log: a replayed epoch must seed from the snapshot of
  * the LATEST EARLIER epoch (`batch < current`), which is exactly what
  * [[run]] reads — per-epoch overwrite plus the strictly-earlier read makes
  * replay idempotent (the [[StreamingCuration]] stance adapted to mutable
  * state).
  */
object StreamingPacking {

  /** Per-shard carry-over: next bin sequence + open bins in creation order
    * (seq, fill, count). */
  case class ShardBins(nextSeq: Long, bins: Vector[(Long, Long, Int)])

  type PackState = Map[Int, ShardBins]

  val emptyState: PackState = Map.empty

  /** One fold row — either a document assignment (`is_state = false`:
    * doc_id/n_tokens/shard/seq/pos/oversize meaningful) or a post-epoch
    * open-bin state row (`is_state = true`: shard/seq/fill/count/next_seq;
    * a shard with no open bins emits one row with seq = -1 carrying
    * next_seq). Public: Janino codegen needs visible accessors. */
  case class PackRow(is_state: Boolean, doc_id: Long, n_tokens: Long,
      shard: Int, seq: Long, pos: Int, oversize: Boolean,
      fill: Long, count: Int, next_seq: Long)

  /** Pack one arrival epoch against the carried open-bin state. Returns the
    * assignment rows (materialized — the state must be final before the
    * next epoch), the new state, and a release handle freeing the epoch's
    * cached fold (call once the assignments are at rest; SQL cache entries
    * are not GC-reclaimed). Shards untouched this epoch keep their previous
    * state. */
  def packEpoch(batch: DataFrame, countCol: Column, state: PackState,
      budget: Long, shards: Int, maxOpenBins: Int,
      idCol: String = "doc_id"): (DataFrame, PackState, () => Unit) = {
    require(budget > 0 && shards > 0 && maxOpenBins > 0,
      "budget, shards, maxOpenBins must be positive")
    val spark = batch.sparkSession
    import spark.implicits._
    val stateB = spark.sparkContext.broadcast(state)
    val folded = batch
      .select(col(idCol).cast("long").as("id"), countCol.cast("long").as("n"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n").desc, col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PackRow]
        var curShard = -1
        var nextSeq = 0L
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        def emitState(): Unit = if (curShard >= 0) {
          if (bins.isEmpty)
            out += PackRow(is_state = true, 0L, 0L, curShard, -1L, 0,
              oversize = false, 0L, 0, nextSeq)
          else bins.foreach { case (seq, fill, cnt) =>
            out += PackRow(is_state = true, 0L, 0L, curShard, seq, 0,
              oversize = false, fill, cnt, nextSeq)
          }
        }
        def openShard(sh: Int): Unit = {
          emitState()
          curShard = sh
          bins.clear()
          val st = stateB.value.getOrElse(sh, ShardBins(0L, Vector.empty))
          nextSeq = st.nextSeq
          st.bins.foreach(bins += _)
        }
        it.foreach { case (id, n, sh) =>
          if (sh != curShard) openShard(sh)
          if (n > budget) {
            val seq = nextSeq; nextSeq += 1
            out += PackRow(is_state = false, id, n, sh, seq, 0,
              oversize = true, 0L, 0, 0L)
          } else {
            val i = bins.indexWhere { case (_, fill, _) => fill + n <= budget }
            if (i >= 0) {
              val (seq, fill, cnt) = bins(i)
              bins(i) = (seq, fill + n, cnt + 1)
              out += PackRow(is_state = false, id, n, sh, seq, cnt,
                oversize = false, 0L, 0, 0L)
            } else {
              val seq = nextSeq; nextSeq += 1
              bins += ((seq, n, 1))
              out += PackRow(is_state = false, id, n, sh, seq, 0,
                oversize = false, 0L, 0, 0L)
              if (bins.size > maxOpenBins) {
                var j = 0; var k = 1
                while (k < bins.size) {
                  if (bins(k)._2 > bins(j)._2 ||
                      (bins(k)._2 == bins(j)._2 && bins(k)._1 < bins(j)._1)) j = k
                  k += 1
                }
                bins.remove(j)
              }
            }
          }
        }
        emitState()
        out.iterator
      }
      .toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assignments = folded.filter(!col("is_state"))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        (col("shard").cast("long") * lit(1L << 40) + col("seq")).as("bin_id"),
        col("pos").as("bin_pos"), col("oversize"))
    assignments.count() // materialize before the state collect frees input
    val touched = folded.filter(col("is_state"))
      .select("shard", "seq", "fill", "count", "next_seq")
      .as[(Int, Long, Long, Int, Long)].collect()
      .groupBy(_._1)
      .map { case (sh, rows) =>
        val bins = rows.filter(_._2 >= 0).sortBy(_._2)
          .map(r => (r._2, r._3, r._4)).toVector
        // creation order within the fold is ascending seq EXCEPT that
        // first-fit scans survivors in fold order; after a close the order
        // is still by seq because closes only remove — re-sorting by seq is
        // exactly the surviving creation order
        sh -> ShardBins(rows.head._5, bins)
      }
    (assignments, state ++ touched, () => { folded.unpersist(); () })
  }

  /** Batch twin for the correctness gate: fold `docs` through `nBatches`
    * sequential arrival epochs (`pmod(id, nBatches) = epoch`), carrying the
    * open-bin state — the exact semantics [[run]] executes per trigger.
    * Returns assignments with their epoch. */
  def packFold(docs: DataFrame, countCol: Column, budget: Long, shards: Int,
      maxOpenBins: Int, nBatches: Int, idCol: String = "doc_id"): DataFrame = {
    require(nBatches > 0, "nBatches must be positive")
    var state = emptyState
    (0 until nBatches).map { epoch =>
      val batch = docs.filter(pmod(col(idCol), lit(nBatches)) === epoch)
      val (assignments, next, release) =
        packEpoch(batch, countCol, state, budget, shards, maxOpenBins, idCol)
      state = next
      // eagerly materialize this epoch's assignments (lineage truncated),
      // then release the epoch's fold cache immediately: at most ONE
      // epoch's fold is live at any time, instead of nBatches leaked
      // corpus-scale cache entries accumulating until a clearCache. The
      // checkpointed epoch slices sum to one corpus across all epochs.
      val materialized =
        assignments.withColumn("epoch", lit(epoch.toLong)).localCheckpoint(true)
      release()
      materialized
    }.reduce(_.unionByName(_))
  }

  /** The standing pipeline: a streaming `docs` source packed per trigger
    * against the at-rest open-bin snapshot. Assignments land idempotently
    * under `stateDir/assignments/batch=<epoch>`; the post-epoch state
    * snapshot under `stateDir/bins/batch=<epoch>`. Replay safety: the seed
    * state is read from the latest `batch < epoch` snapshot, so re-running
    * an epoch reads the same seed it saw the first time. */
  def run(docs: DataFrame, countCol: Column, stateDir: String,
      checkpointDir: String, budget: Long, shards: Int, maxOpenBins: Int,
      idCol: String = "doc_id"): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val seed = readStateBefore(spark, s"$stateDir/bins", epoch)
        val (assignments, next, release) =
          packEpoch(batch, countCol, seed, budget, shards, maxOpenBins, idCol)
        assignments.write.mode("overwrite")
          .parquet(s"$stateDir/assignments/batch=$epoch")
        writeState(spark, next, s"$stateDir/bins/batch=$epoch")
        // snapshot retention: only the latest strictly-earlier snapshot is
        // ever read (epoch e replays read e-1), so everything below e-1 is
        // dead weight — without pruning, a genuinely standing query's
        // readStateBefore listing grows linearly in epoch count
        pruneStateBefore(spark, s"$stateDir/bins", epoch - 1)
        release()
      }
      .start()
  }

  /** Delete `batch=<i>` snapshot dirs with i < `keepFrom`. Replay safety:
    * a checkpointed foreachBatch only ever re-runs the latest uncommitted
    * epoch, and epoch e's seed is the latest snapshot < e — so when epoch
    * e completes, e-1 must survive (e may still replay) and anything
    * earlier is unreachable. Assignments are DATA, not state, and are
    * never pruned. */
  private[streaming] def pruneStateBefore(spark: SparkSession, dir: String,
      keepFrom: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    listBatchDirs(spark, dir)
      .filter(_._1 < keepFrom)
      .foreach { case (_, p) =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
      }
  }

  /** All assignments written by [[run]] so far. */
  def assignments(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = listBatchDirs(spark, s"$stateDir/assignments").map(_._2)
    require(dirs.nonEmpty, s"no assignments under $stateDir")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** `batch=N` subdirectories under `dir` via the Hadoop FS layer (the
    * SAME layer the writes go through — a local `java.io.File` listing
    * would silently see nothing for hdfs://, s3a://, or a transient mount
    * error, exactly the failure that must be loud here). A missing parent
    * directory is a normal empty state; any other listing failure
    * propagates. */
  private def listBatchDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName.stripPrefix("batch=").toLongOption
          .map(_ -> st.getPath.toString)
      }
  }

  private def writeState(spark: SparkSession, state: PackState, dir: String): Unit = {
    import spark.implicits._
    val rows = state.toSeq.flatMap { case (sh, ShardBins(next, bins)) =>
      if (bins.isEmpty) Seq((sh, -1L, 0L, 0, next))
      else bins.map { case (seq, fill, cnt) => (sh, seq, fill, cnt, next) }
    }
    rows.toDF("shard", "seq", "fill", "count", "next_seq")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Latest snapshot with batch index strictly below `epoch` (replay reads
    * the same seed it saw originally); empty state before the first.
    * Checkpointed foreachBatch epochs are sequential from 0, so an
    * `epoch > 0` with NO earlier snapshot means the state directory was
    * lost or detached — failing loudly here is what keeps the
    * bin-sequences-never-collide contract from silently breaking (a fresh
    * `nextSeq = 0` would reuse every earlier epoch's bin ids). */
  private[streaming] def readStateBefore(spark: SparkSession, dir: String,
      epoch: Long): PackState = {
    import spark.implicits._
    val candidates = listBatchDirs(spark, dir).filter(_._1 < epoch)
    require(epoch == 0 || candidates.nonEmpty,
      s"epoch $epoch has no earlier open-bin snapshot under $dir — state " +
        "directory lost/detached? Seeding empty would reuse earlier bin ids")
    if (candidates.isEmpty) emptyState
    else {
      val latest = candidates.maxBy(_._1)._2
      spark.read.parquet(latest)
        .select("shard", "seq", "fill", "count", "next_seq")
        .as[(Int, Long, Long, Int, Long)].collect()
        .groupBy(_._1)
        .map { case (sh, rows) =>
          sh -> ShardBins(rows.head._5,
            rows.filter(_._2 >= 0).sortBy(_._2).map(r => (r._2, r._3, r._4)).toVector)
        }
    }
  }
}
