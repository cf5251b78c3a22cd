package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Bm25

/** Standing lexical-retrieval index (the BM25 twin of StreamingIvfSpec):
  * per-epoch at-rest postings/stats maintenance with replay-idempotent
  * restarts, search-over-index ≡ Bm25.topK recomputed over the same
  * corpus, bucket partition pruning at probe time, and compaction with
  * crash recovery. */
class StreamingBm25Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // small vocabulary so terms repeat across docs AND epochs: df/N/avgdl
  // only match the batch recompute if the fold truly spans epochs
  private def text(i: Long): String = {
    val words = Seq("spark", "hash", "window", "join", "scan", "sort",
      "shuffle", "probe")
    (0 until (3 + (i % 4)).toInt)
      .map(j => words(((i * 7 + j * 5) % words.size).toInt)).mkString(" ")
  }
  private val all = (0L until 40L).map(i => (i, text(i)))

  test("tombstones mask probes immediately; compact drops rows, debits stats, clears the store") {
    val path = Files.createTempDirectory("graft-sbm25-tomb").toString + "/idx"
    val corpus = all.toDF("doc_id", "text")
    StreamingBm25.appendEpoch(corpus.filter(col("doc_id") < 20), path, 0, nBuckets = 8)
    StreamingBm25.appendEpoch(corpus.filter(col("doc_id") >= 20), path, 1, nBuckets = 8)
    val queries = Seq((100L, "spark hash"), (101L, "probe sort shuffle"))
      .toDF("query_id", "text")
    def hits() = StreamingBm25.search(spark, path, queries, k = 5, nBuckets = 8,
        queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val before = hits()
    // delete three docs that are ranked today, so masking is observable
    val dead = before.map(_._3).toSeq.distinct.sorted.take(3)
    StreamingBm25.deleteEpoch(dead.toDF("doc_id"), path, 0)
    val masked = hits()
    assert(dead.forall(d => !masked.exists(_._3 == d)),
      "tombstoned docs must vanish from probes before any compaction")
    // pre-compact: RESULT SET is live-only (scores may carry a stale N —
    // the documented LSM trade), so compare ids/ranks, not scores
    StreamingBm25.compact(spark, path, idCol = "doc_id")
    assert(!new java.io.File(s"$path/tombstones").exists())
    assert(spark.read.parquet(s"$path/postings")
      .filter(col("doc_id").isin(dead: _*)).count() == 0,
      "compaction must drop tombstoned rows from the at-rest bytes")
    // post-compact: stats are debited, so search equals the batch
    // recompute over the LIVE corpus exactly — scores included
    val live = corpus.filter(!col("doc_id").isin(dead: _*))
    val expected = Bm25.topK(live, queries, k = 5, queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(hits() == expected,
      "post-compact index must equal Bm25.topK over the live corpus")
    val st = spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs"), sum("sum_dl")).head()
    assert(st.getLong(0) == all.size - dead.size,
      "compaction must debit n_docs by the victims")
    // crash shape: a tombstone for an already-gone doc reapplies harmlessly
    StreamingBm25.deleteEpoch(Seq(dead.head).toDF("doc_id"), path, 5)
    StreamingBm25.compact(spark, path, idCol = "doc_id")
    assert(hits() == expected)
  }

  test("rebucket re-routes the postings under a new count; results and masks survive") {
    val path = Files.createTempDirectory("graft-sbm25-rebkt").toString
    val docs = all.toDF("doc_id", "text")
    StreamingBm25.appendEpoch(docs.filter(col("doc_id") < 20), path, 0L,
      nBuckets = 8)
    StreamingBm25.appendEpoch(docs.filter(col("doc_id") >= 20), path, 1L,
      nBuckets = 8)
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    val before = StreamingBm25.search(spark, path, qs, k = 5, nBuckets = 8)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    // pending tombstone: must keep masking THROUGH the re-route
    StreamingBm25.deleteEpoch(Seq(5L).toDF("doc_id"), path, 0L)
    StreamingBm25.rebucket(spark, path, nBuckets = 4)
    val f = new java.io.File(path, "postings")
    assert(f.listFiles().filter(_.isDirectory).map(_.getName).toSet ==
      Set("epoch=-1"), "rebucket must leave only the re-routed epoch")
    val bucketDirs = new java.io.File(f, "epoch=-1").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(bucketDirs.nonEmpty &&
      bucketDirs.forall(_.stripPrefix("bucket=").toLong < 4),
      s"every bucket must sit under the new count: ${bucketDirs.toSeq}")
    // bucket count is a layout knob: results at the new count equal the
    // pre-rebucket results minus the tombstoned doc
    val after = StreamingBm25.search(spark, path, qs, k = 5, nBuckets = 4)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(!after.exists(_._2 == 5L),
      "the pending tombstone must keep masking after the re-route")
    assert(before.map(_._1) == after.map(_._1),
      "every query still answers after the re-route")
    // compact at the new layout still purges and clears; post-compact
    // (stats debited) the re-routed index must equal the batch recompute
    // over the corpus minus the deleted doc — the strong law
    StreamingBm25.compact(spark, path)
    assert(!new java.io.File(path, "tombstones").exists())
    val postCompact = StreamingBm25.search(spark, path, qs, k = 5, nBuckets = 4)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val expect = Bm25.topK(docs.filter(col("doc_id") =!= 5L), qs, k = 5)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(postCompact == expect,
      "post-compact, the re-routed index answers like the batch recompute")
  }

  private def copyDir(src: String, dst: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(src),
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(dst), false, true, fs.getConf)
    ()
  }

  /** Round-13 verdict #1: the tombstone compact is ONE commit — the
    * masked postings and the debited stats stage under one swapped root,
    * so no crash shape can purge the postings while losing the stats
    * debit (the old two-swap window silently un-debited N/avgdl forever).
    * Each shape below is constructed around the commit marker and
    * finished via a re-entry path; the oracle is the w34 STRONG law —
    * search ≡ batch recompute minus the deleted docs, scores EXACT
    * (length-normalized scores only match if N/avgdl are right). */
  test("single-commit compact: every crash shape debits the stats exactly once") {
    val root = Files.createTempDirectory("graft-sbm25-crash").toString
    val path = s"$root/idx"
    val docs = all.toDF("doc_id", "text")
    def build(): Unit = {
      StreamingBm25.appendEpoch(docs.filter(col("doc_id") < 20), path, 0, nBuckets = 8)
      StreamingBm25.appendEpoch(docs.filter(col("doc_id") >= 20), path, 1, nBuckets = 8)
      StreamingBm25.deleteEpoch(Seq(2L, 7L, 33L).toDF("doc_id"), path, 0)
    }
    val qs = Seq((100L, "spark hash"), (101L, "probe sort shuffle"))
      .toDF("query_id", "text")
    val live = docs.filter(!col("doc_id").isin(2L, 7L, 33L))
    val expected = Bm25.topK(live, qs, k = 5, queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    def hits() = StreamingBm25.search(spark, path, qs, k = 5,
        queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    def statsRow() = spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs"), sum("sum_dl")).head()

    // ---- shape A: crash BEFORE the commit marker (partial staging is
    // garbage) — the re-run replays the whole compact from intact state
    build()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sessionState.newHadoopConf())
    val junk = fs.create(
      new org.apache.hadoop.fs.Path(s"$path.compacting/postings/epoch=-1/junk"), true)
    junk.write("garbage".getBytes); junk.close()
    StreamingBm25.compact(spark, path)
    assert(hits() == expected, "shape A: strong law after re-run")
    assert(statsRow().getLong(0) == all.size - 3, "shape A: debited once")

    // ---- shape B: crash AFTER the commit marker, BEFORE the promote —
    // the OLD design's lost-debit window. Construct it from real
    // artifacts: snapshot the pre-compact store, run a real compact to
    // obtain the staged (debited) form, then restore live + staging +
    // marker and re-enter.
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    build()
    copyDir(path, s"$root/pre") // live store incl. tombstones
    StreamingBm25.compact(spark, path)
    copyDir(path, s"$root/staged") // the debited compacted form
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    copyDir(s"$root/pre", path) // crash state: live is PRE-compact
    copyDir(s"$root/staged", s"$path.compacting")
    fs.create(new org.apache.hadoop.fs.Path(s"$path.compacting.COMMITTED"), true)
      .close()
    // re-entry path 1: the next compact's recover() finishes the promote
    // FIRST (debited staging becomes live, tombstones retired with the
    // swap), then re-compacts the already-clean store — debit stays once
    StreamingBm25.compact(spark, path)
    assert(hits() == expected, "shape B: strong law after recover + re-run")
    assert(statsRow().getLong(0) == all.size - 3,
      "shape B: the debit must be applied EXACTLY once (the old two-swap " +
        "window lost it: rc=0 recomputed from already-purged postings)")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")),
      "the swap retires the tombstone store with the same commit")

    // ---- shape B via the EPOCH-WRITER re-entry: appendEpoch's guard
    // finishes the torn swap before appending, so the new epoch can never
    // land in a directory the deferred promote would replace
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    copyDir(s"$root/pre", path)
    copyDir(s"$root/staged", s"$path.compacting")
    fs.create(new org.apache.hadoop.fs.Path(s"$path.compacting.COMMITTED"), true)
      .close()
    val extra = Seq((50L, "spark probe window")).toDF("doc_id", "text")
    StreamingBm25.appendEpoch(extra, path, 2, nBuckets = 8)
    val expected2 = Bm25.topK(live.unionByName(extra), qs, k = 5,
        queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(hits() == expected2,
      "append-after-torn-swap: recover first, then the epoch lands on the " +
        "compacted state — debited once, nothing lost")
  }

  test("bucket count is persisted in the store: appends validate it, probes resolve it") {
    val path = Files.createTempDirectory("graft-sbm25-meta").toString + "/idx"
    val docs = all.toDF("doc_id", "text")
    StreamingBm25.appendEpoch(docs.filter(col("doc_id") < 20), path, 0, nBuckets = 8)
    assert(StreamingBm25.storedNBuckets(spark, path).contains(8))
    // a mismatched later append would split terms across bucket layouts —
    // loud error, not silent corruption
    val e = intercept[IllegalArgumentException] {
      StreamingBm25.appendEpoch(docs.filter(col("doc_id") >= 20), path, 1,
        nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets=8"), e.getMessage)
    StreamingBm25.appendEpoch(docs.filter(col("doc_id") >= 20), path, 1,
      nBuckets = 8)
    val qs = Seq((100L, "spark hash"), (101L, "probe sort shuffle"))
      .toDF("query_id", "text")
    def hitsWith(n: Int) = StreamingBm25.search(spark, path, qs, k = 5,
        nBuckets = n, queryIdCol = "query_id")
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val right = hitsWith(8)
    assert(hitsWith(64) == right,
      "a caller passing a WRONG count still probes correctly: the stored " +
        "count is authoritative")
    // rebucket swaps count + layout in ONE commit; a caller still holding
    // the OLD count resolves the new one from the store
    StreamingBm25.rebucket(spark, path, nBuckets = 4)
    assert(StreamingBm25.storedNBuckets(spark, path).contains(4))
    assert(hitsWith(8) == right, "stale-count probe after rebucket is exact")
    // ... and appends now validate against the NEW count
    intercept[IllegalArgumentException] {
      StreamingBm25.appendEpoch(docs.limit(1), path, 2, nBuckets = 8)
    }
  }

  test("ingest resumes after restart; at-rest search equals batch Bm25.topK") {
    val inDir = Files.createTempDirectory("graft-sbm25-in")
    val path = Files.createTempDirectory("graft-sbm25-idx").toString
    val cpDir = Files.createTempDirectory("graft-sbm25-cp").toString

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      Files.writeString(inDir.resolve(name),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .json(inDir.toString)

    writeBatch("b1.json", all.slice(0, 15))
    val q1 = StreamingBm25.run(stream, path, cpDir, nBuckets = 8)
    q1.processAllAvailable()
    q1.stop()

    writeBatch("b2.json", all.slice(15, 28))
    writeBatch("b3.json", all.slice(28, 40))
    val q2 = StreamingBm25.run(stream, path, cpDir, nBuckets = 8)
    q2.processAllAvailable()
    q2.stop()

    val corpus = all.toDF("doc_id", "text")
    val queries = Seq((100L, "spark hash"), (101L, "probe sort shuffle"))
      .toDF("query_id", "text")
    def atRest = StreamingBm25.search(spark, path, queries, k = 5, nBuckets = 8,
      queryIdCol = "query_id")
    val got = atRest.select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Bm25.topK(corpus, queries, k = 5)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want, "at-rest search must equal the batch recompute")

    // no loss, no dupes across the restart (epoch overwrite is idempotent):
    // every doc's dl appears exactly once per distinct term it contains
    val postings = spark.read.option("basePath", s"$path/postings")
      .parquet(s"$path/postings")
    assert(postings.select("doc_id").distinct().count() == 40)
    assert(postings.groupBy("doc_id", "term").count()
      .filter(col("count") > 1).count() == 0, "replay duplicated postings")
    // stats partials fold to the true corpus size
    val st = spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs"), sum("sum_dl")).head()
    assert(st.getLong(0) == 40)
    assert(st.getDouble(1) == all.map(_._2.split(" ").length.toDouble).sum)

    // the probe scan is partition-pruned on bucket under the epoch dirs
    // (searchLazy: the raw plan before the eager result checkpoint)
    def probePlan: String = {
      val (df, release) = StreamingBm25.searchLazy(spark, path, queries,
        k = 5, nBuckets = 8)
      val plan = df.queryExecution.executedPlan.toString
      release()
      plan
    }
    val plan = probePlan
    assert(plan.contains("PartitionFilters:") && plan.contains("bucket#"),
      plan.take(800))

    // ---- compaction: epochs fold into epoch=-1; search, counts and
    // pruning unchanged
    StreamingBm25.compact(spark, path)
    val postingsDir = new java.io.File(s"$path/postings")
    assert(postingsDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
      == Set("epoch=-1"))
    assert(atRest.select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet == want)
    val planC = probePlan
    assert(planC.contains("PartitionFilters:") && planC.contains("bucket#"))

    // ---- crash-recovery: corpus dir missing + complete .compacting
    // sibling — the next compact() finishes the swap, losing nothing
    val staging = new java.io.File(s"$path/postings.compacting")
    java.nio.file.Files.move(postingsDir.toPath, staging.toPath)
    StreamingBm25.compact(spark, path)
    assert(atRest.select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet == want)
  }

  test("cross-epoch carry is load-bearing: per-epoch-only scoring would differ") {
    // score the FIRST epoch's slice alone vs the full corpus: the same
    // (query, doc) pair ranks with different df/N/avgdl, so equality of
    // the standing search with the full-corpus batch (above) proves the
    // fold spans epochs rather than passing vacuously
    val corpus = all.toDF("doc_id", "text")
    val slice = all.slice(0, 15).toDF("doc_id", "text")
    val queries = Seq((100L, "spark hash")).toDF("query_id", "text")
    val full = Bm25.topK(corpus, queries, k = 5)
      .filter(col("doc_id") < 15) // compare on docs both forms can rank
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val perEpoch = Bm25.topK(slice, queries, k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val common = full.keySet intersect perEpoch.keySet
    assert(common.nonEmpty)
    assert(common.exists(id => full(id) != perEpoch(id)),
      "slice-local scores must differ from corpus-wide scores")
  }

  test("property: at-rest search equals batch topK for random corpora/splits") {
    // raw ScalaCheck with fixed seeds (the scalatest bridge is not on the
    // offline classpath) — random corpus, random epoch count, random
    // bucket count: the at-rest fold must equal the batch recompute
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("spark", "hash", "join", "scan", "sort", "probe")
    val docGen = for {
      n <- Gen.choose(1, 6)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val caseGen = for {
      nDocs <- Gen.choose(5, 25)
      texts <- Gen.listOfN(nDocs, docGen)
      epochs <- Gen.choose(1, 4)
      buckets <- Gen.oneOf(1, 4, 16)
      qText <- docGen
    } yield (texts, epochs, buckets, qText)
    (0 until 6).foreach { i =>
      caseGen(Gen.Parameters.default, Seed(7L + i)).foreach {
        case (texts, epochs, buckets, qText) =>
          val path = Files.createTempDirectory(s"sbm25-prop$i").toString
          val docs = texts.zipWithIndex
            .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
          val span = texts.size / epochs + 1
          (0 until epochs).foreach { e =>
            StreamingBm25.appendEpoch(
              docs.filter(col("doc_id") >= e.toLong * span &&
                col("doc_id") < (e + 1).toLong * span),
              path, e.toLong, nBuckets = buckets)
          }
          val queries = Seq((0L, qText)).toDF("query_id", "text")
          val got = StreamingBm25.search(spark, path, queries, k = 5,
              nBuckets = buckets)
            .select("query_id", "rank", "doc_id", "score")
            .as[(Long, Long, Long, Double)].collect().toSet
          val want = Bm25.topK(docs, queries, k = 5)
            .select("query_id", "rank", "doc_id", "score")
            .as[(Long, Long, Long, Double)].collect().toSet
          assert(got == want,
            s"case $i: epochs=$epochs buckets=$buckets q='$qText'")
      }
    }
  }

  test("empty index and empty queries return the empty shape") {
    val path = Files.createTempDirectory("graft-sbm25-empty").toString
    StreamingBm25.appendEpoch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), path, 0L, nBuckets = 4)
    val queries = Seq((1L, "spark")).toDF("query_id", "text")
    assert(StreamingBm25.search(spark, path, queries, k = 3, nBuckets = 4)
      .count() == 0)
    // docs present, no queries
    StreamingBm25.appendEpoch(all.take(5).toDF("doc_id", "text"), path, 1L,
      nBuckets = 4)
    assert(StreamingBm25.search(spark, path,
      Seq.empty[(Long, String)].toDF("query_id", "text"), k = 3,
      nBuckets = 4).count() == 0)
  }

  test("searching a NEVER-WRITTEN index path returns the empty shape, not PATH_NOT_FOUND") {
    // run() started but no epoch committed yet: no stats/ directory exists
    val path = Files.createTempDirectory("graft-sbm25-never").toString + "/idx"
    val queries = Seq((1L, "spark")).toDF("query_id", "text")
    assert(StreamingBm25.search(spark, path, queries, k = 3, nBuckets = 4)
      .count() == 0)
  }

  test("driver-side term bucket matches the SQL xxhash64 form for every probe vocabulary") {
    // the probe derives its pruned-bucket set driver-side (termBucketJvm);
    // the at-rest layout routes through the Column form — one divergent
    // hash would silently skip a live bucket, so pin exact parity across
    // token shapes (ascii, unicode, empty-ish, long) and bucket counts
    val terms = Seq("spark", "hash", "window", "Ünïcode", "日本語",
      "a", "zz9", "the-quick-brown-fox-jumped-over", "0", "én")
    for (nb <- Seq(1, 4, 64, 1024)) {
      val sql = terms.toDF("term")
        .select(col("term"), pmod(xxhash64(col("term")), lit(nb.toLong)).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.foreach { t =>
        assert(StreamingBm25.termBucketJvm(t, nb) == sql(t),
          s"bucket mismatch for '$t' at nBuckets=$nb")
      }
    }
  }
}
