package graft.streaming

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.ScdMerge

/** Standing SCD type-2 dimension maintenance over an at-rest parquet
  * snapshot — the dimension twin of [[StreamingCuration]]'s fact-side
  * state: each arriving update feed (a micro-batch in `foreachBatch`, or a
  * batch replay epoch) merges into the CURRENT snapshot via
  * [[ScdMerge.merge]] and the new full history swaps in atomically.
  *
  * Swap protocol (same single-maintenance-writer stance as
  * [[StateCompaction]]): the merged history is staged into
  * `<dir>.merging`, then `<dir>` is deleted and the staging directory
  * renamed over it. A crash between delete and rename leaves `<dir>`
  * missing with a COMPLETE staging sibling; [[recover]] (run on every
  * entry) finishes the rename — no committed epoch is ever lost, and a
  * re-applied feed is a no-op by [[ScdMerge]]'s idempotence (spec-pinned).
  *
  * Scale shape: one snapshot read + one key shuffle per epoch
  * ([[ScdMerge]]'s full-outer), one staged write. The snapshot holds full
  * history; compact old closed rows out with a partition predicate on
  * `valid_to` if history growth ever dominates the merge read.
  */
object StreamingDimension {

  /** Seed the snapshot directory with the initial history. */
  def init(current: DataFrame, dir: String): Unit = {
    recover(dir)
    current.write.mode("overwrite").parquet(dir)
  }

  /** Current history (after finishing any interrupted swap). */
  def snapshot(spark: SparkSession, dir: String): DataFrame = {
    recover(dir)
    spark.read.parquet(dir)
  }

  /** Merge one update feed into the at-rest snapshot and swap. */
  def applyEpoch(feed: DataFrame, dir: String, key: String,
      changeCols: Seq[String], batchTs: Column): Unit =
    applyWith(feed, dir)(cur =>
      ScdMerge.merge(cur, feed, key, changeCols, batchTs))

  /** [[applyEpoch]] tolerating SCHEMA DRIFT between the at-rest snapshot
    * and the feed ([[ScdMerge.mergeEvolved]]): a producer upgrade that
    * adds or drops feed columns flows through the standing fold without
    * an operator change — the at-rest snapshot widens in place on the
    * next swap, history rows carry NULL for post-evolution columns, and
    * dropped columns follow the carry-forward policy. */
  def applyEpochEvolved(feed: DataFrame, dir: String, key: String,
      changeCols: Seq[String], batchTs: Column,
      carryForwardDropped: Boolean = true): Unit =
    applyWith(feed, dir)(cur =>
      ScdMerge.mergeEvolved(cur, feed, key, changeCols, batchTs,
        carryForwardDropped))

  private def applyWith(feed: DataFrame, dir: String)
      (merge: DataFrame => DataFrame): Unit = {
    recover(dir)
    val spark = feed.sparkSession
    val cur = {
      val s = spark.read.parquet(dir)
      if (s.columns.contains("change_status")) s.drop("change_status") else s
    }
    val merged = merge(cur)
    // the merge READS dir, so the new history must land elsewhere first:
    // stage, then delete + atomic rename (recover() completes a crashed swap)
    val staging = new File(dir + ".merging")
    if (staging.exists()) rmrf(staging.toPath)
    merged.write.mode("overwrite").parquet(staging.getAbsolutePath)
    rmrf(new File(dir).toPath)
    Files.move(staging.toPath, new File(dir).toPath, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Finish an interrupted swap: `<dir>` missing + complete staging sibling. */
  def recover(dir: String): Unit = {
    val src = new File(dir)
    val staging = new File(dir + ".merging")
    if (!src.exists() && staging.exists())
      Files.move(staging.toPath, src.toPath, StandardCopyOption.ATOMIC_MOVE)
  }

  private def rmrf(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
}
