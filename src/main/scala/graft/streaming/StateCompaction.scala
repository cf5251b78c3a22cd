package graft.streaming

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Compaction for per-epoch at-rest state directories
  * ([[StreamingCuration]]'s `digests/batch=<n>`, [[StreamingIvf]]'s
  * `corpus/epoch=<n>/cell=<m>`): a standing pipeline accumulates one
  * subdirectory per micro-batch forever — thousands of tiny files whose
  * LISTING eventually costs more than the data. Compaction folds them into
  * ONE `<key>=-1` subdirectory; real epochs are ≥ 0, so the compacted
  * directory can never collide with a future epoch's idempotent overwrite.
  *
  * Swap protocol (single-maintenance-writer, the RolledObjectSink recovery
  * stance): write the union into `<dir>.compacting/<key>=-1`, then delete
  * `<dir>` and rename the staging directory over it. A crash between the
  * delete and the rename leaves `<dir>` missing with a COMPLETE staging
  * sibling — [[recover]] (called on every compact entry) finishes the
  * rename, so no state is ever lost. Run compaction only while the
  * pipeline is stopped (it rewrites the directory the next epoch appends
  * into).
  */
object StateCompaction {

  /** Fold every `<key>=<n>` subdirectory of `dir` into `<key>=-1`.
    * `partitionCols` are re-applied to the compacted write (e.g. `cell`
    * for the IVF corpus) so downstream partition pruning is preserved.
    * No-op when `dir` does not exist or holds no subdirectories. */
  def compact(spark: SparkSession, dir: String, key: String,
      partitionCols: Seq[String] = Nil): Unit =
    compactWith(dir) { staging =>
      // partition discovery surfaces <key> (and any nested partition
      // cols); drop the epoch key, keep the data partition cols for the
      // rewrite. CONSOLIDATE while rewriting: without the repartition,
      // every (write task × partition value) pair emits its own file, so
      // compaction would replace many-epochs-of-small-files with
      // one-epoch-of-the-same-small-files — hash-clustering on the
      // partition cols lands each partition value in exactly one task
      // (one file per at-rest partition dir), which is the listing-cost
      // reduction compaction exists for. The shuffle is the deliberate
      // price of a maintenance op (run offline, pipeline stopped); at
      // volumes where one partition outgrows a healthy file, salt the
      // clustering key by ceil(partitionBytes / targetFileSize) to write
      // N right-sized files per dir instead of one
      val df = spark.read.parquet(dir).drop(key)
      val writer =
        (if (partitionCols.nonEmpty)
           df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
         else df)
          .write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(s"${staging.getAbsolutePath}/$key=-1")
    }

  /** The swap protocol with the compacted WRITE as a hook — for at-rest
    * state that is not parquet (e.g. [[graft.sources.PackedCorpus]]'s
    * `.bin`/`.idx` part pairs). `writeStaged` must write the full
    * compacted form UNDER the passed staging directory (reading from the
    * still-intact `dir`); this then deletes `dir` and renames the staging
    * directory over it, with [[recover]]'s crash contract. No-op when
    * `dir` has no subdirectories. */
  def compactWith(dir: String)(writeStaged: File => Unit): Unit = {
    recover(dir)
    val src = new File(dir)
    val subdirs = Option(src.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
    if (subdirs.isEmpty) return
    val staging = new File(dir + ".compacting")
    if (staging.exists()) rmrf(staging.toPath)
    writeStaged(staging)
    // an all-empty compaction may write zero files — the swap still needs
    // the staging directory to exist for the rename
    Files.createDirectories(staging.toPath)
    rmrf(src.toPath)
    Files.move(staging.toPath, src.toPath, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Finish an interrupted swap: `<dir>` missing + `<dir>.compacting`
    * present means the staging write completed and only the rename
    * remains. */
  def recover(dir: String): Unit = {
    val src = new File(dir)
    val staging = new File(dir + ".compacting")
    if (!src.exists() && staging.exists())
      Files.move(staging.toPath, src.toPath, StandardCopyOption.ATOMIC_MOVE)
  }

  private def rmrf(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
}
