package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 verdict #1: the forget ledger is an append-only log OUTSIDE
  * the swapped store root whose replay yields the effective RTBF set a
  * restore must re-apply. Unit contract: ordering (later entries
  * dominate), resurrect-by-id vs resurrect-all, multi-kind isolation,
  * and the re-apply write shape per store kind. */
class ForgetLedgerSpec extends AnyFunSuite with SparkTestBase {

  test("effective replays the log in order: forgets add, resurrects cancel, later forgets re-add") {
    val root = Files.createTempDirectory("graft-fl").toString + "/store"
    assert(!ForgetLedger.exists(spark, root))
    assert(ForgetLedger.effective(spark, root).isEmpty)
    ForgetLedger.append(spark, root, "bm25", Seq(3L, 5L))
    ForgetLedger.append(spark, root, "bm25", Seq(7L))
    assert(ForgetLedger.effective(spark, root) == Map("bm25" -> Seq(3L, 5L, 7L)))
    ForgetLedger.appendResurrect(spark, root, "bm25", Some(Seq(5L)))
    assert(ForgetLedger.effective(spark, root) == Map("bm25" -> Seq(3L, 7L)))
    // a LATER forget of a resurrected id re-masks it
    ForgetLedger.append(spark, root, "bm25", Seq(5L))
    assert(ForgetLedger.effective(spark, root) == Map("bm25" -> Seq(3L, 5L, 7L)))
    // resurrect-all drains the kind; other kinds are untouched
    ForgetLedger.append(spark, root, "ivf", Seq(9L))
    ForgetLedger.appendResurrect(spark, root, "bm25", None)
    assert(ForgetLedger.effective(spark, root) == Map("ivf" -> Seq(9L)))
    assert(ForgetLedger.exists(spark, root))
    // the ledger lives OUTSIDE the swapped root (sibling dir)
    assert(ForgetLedger.ledgerDir(root) == root + ".forget_ledger")
    assert(!ForgetLedger.ledgerDir(root).startsWith(root + "/"))
  }

  test("reapplyInto writes each kind's tombstone epoch with its OWN id column and epoch key, continuing past captured epochs") {
    import spark.implicits._
    val staged = Files.createTempDirectory("graft-fl-st").toString + "/root"
    // the staged snapshot already captured one tombstone epoch
    Seq(1L).toDF("doc_id").coalesce(1)
      .write.parquet(s"$staged/tombstones/epoch=4")
    ForgetLedger.reapplyInto(spark, staged, Map("bm25" -> Seq(8L, 9L)))
    val re = spark.read.parquet(s"$staged/tombstones/epoch=5")
    assert(re.columns.toSeq == Seq("doc_id"))
    assert(re.as[Long].collect().sorted.toSeq == Seq(8L, 9L))
    // curation writes under batch= with its exported `id` column
    val cur = Files.createTempDirectory("graft-fl-cur").toString + "/state"
    ForgetLedger.reapplyInto(spark, cur, Map("curation" -> Seq(2L)))
    val cre = spark.read.parquet(s"$cur/tombstones/batch=0")
    assert(cre.columns.toSeq == Seq("id"))
    assert(cre.as[Long].collect().toSeq == Seq(2L))
  }
}
