package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Similarity

class StreamingIvfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def vec(i: Long): Seq[Float] =
    Array.tabulate(8)(j => (math.sin(i * 31 + j * 7) + 2.0).toFloat).toSeq

  private val all = (0L until 30L).map(i => (i, vec(i)))

  test("at-rest hard-negative probe at full probe equals the brute-force miner") {
    val path = Files.createTempDirectory("graft-sivf-neg").toString
    val labeled = all.map { case (i, v) => (i, (i % 3).toInt, v) }
      .toDF("vec_id", "label", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    // two epochs, label payload stored next to each vector
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") < 15), path, 0L,
      payloadCols = Seq("label"))
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") >= 15), path, 1L,
      payloadCols = Seq("label"))
    val anchors = labeled.filter(col("vec_id") < 3)
    // full probe (nProbe = all 4 cells): candidates = the whole corpus,
    // so the at-rest miner must equal the brute-force one exactly
    val atRest = StreamingIvf.hardNegativeSearch(spark, path, anchors,
        k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.hardNegativeTopK(labeled, anchors, k = 5)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(atRest == brute)
    // every returned negative really differs in label from its anchor
    val anchorLabel = (0L until 3L).map(i => i -> (i % 3).toInt).toMap
    val labels = labeled.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    StreamingIvf.hardNegativeSearch(spark, path, anchors, k = 5, nProbe = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .foreach { case (q, c) =>
        assert(labels(c) != anchorLabel(q), s"anchor $q got same-label $c")
      }
  }

  test("at-rest tripletSearch at full probe equals the brute-force tripletMine") {
    val path = Files.createTempDirectory("graft-sivf-trip").toString
    val labeled = all.map { case (i, v) => (i, (i % 3).toInt, v) }
      .toDF("vec_id", "label", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") < 15), path, 0L,
      payloadCols = Seq("label"))
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") >= 15), path, 1L,
      payloadCols = Seq("label"))
    val anchors = labeled.filter(col("vec_id") < 3)
    val atRest = StreamingIvf.tripletSearch(spark, path, anchors,
        k = 4, nProbe = 4)
      .select("anchor_id", "pos_id", "neg_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val brute = Similarity.tripletMine(labeled, anchors, k = 4)
      .select("anchor_id", "pos_id", "neg_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(atRest == brute,
      "full-probe at-rest triplets must equal the in-memory miner")
    // the positive really shares the anchor's label; negatives never do
    val labels = labeled.select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    atRest.foreach { case (a, p, n, _) =>
      assert(labels(p) == labels(a), s"anchor $a got cross-label positive $p")
      assert(labels(n) != labels(a), s"anchor $a got same-label negative $n")
    }
    // an anchor whose probed cells hold NO same-label partner emits
    // no triplets: a one-of-a-kind label on the anchor only
    val lone = labeled.unionByName(
      Seq((99L, 7, vec(99L))).toDF("vec_id", "label", "embedding"))
    val path2 = Files.createTempDirectory("graft-sivf-trip2").toString
    StreamingIvf.init(cents, path2)
    StreamingIvf.appendEpoch(lone, path2, 0L, payloadCols = Seq("label"))
    val got = StreamingIvf.tripletSearch(spark, path2,
        lone.filter(col("vec_id") === 99L), k = 3, nProbe = 4)
    assert(got.count() == 0, "no same-label partner => no triplets")
  }

  test("at-rest semi-hard mining at full probe equals the brute-force miner") {
    val path = Files.createTempDirectory("graft-sivf-semih").toString
    val labeled = all.map { case (i, v) => (i, (i % 3).toInt, v) }
      .toDF("vec_id", "label", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") < 15), path, 0L,
      payloadCols = Seq("label"))
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") >= 15), path, 1L,
      payloadCols = Seq("label"))
    val anchors = labeled.filter(col("vec_id") < 3)
    val atRest = StreamingIvf.semiHardNegativeSearch(spark, path, anchors,
        k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.semiHardNegativeTopK(labeled, anchors, k = 5)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(atRest == brute,
      "full-probe at-rest semi-hard mining must equal the brute-force miner")
    // every negative sits STRICTLY under its anchor's hardest positive
    val pc = StreamingIvf.filteredSearch(spark, path, anchors, k = 1,
        nProbe = 4, queryPayloadCols = Seq("label"),
        corpusPayloadCols = Seq("label"),
        predicate = Some(col("corpus_label") === col("query_label")))
      .select("query_id", "cosine").as[(Long, Double)].collect().toMap
    StreamingIvf.semiHardNegativeSearch(spark, path, anchors, k = 5,
        nProbe = 4)
      .select("query_id", "cosine").as[(Long, Double)].collect()
      .foreach { case (q, c) =>
        assert(c < pc(q), s"anchor $q negative at $c >= positive ${pc(q)}")
      }
  }

  test("refit installs a new quantizer atomically, folds tombstones, keeps payloads") {
    val path = Files.createTempDirectory("graft-sivf-refit").toString
    val labeled = all.map { case (i, v) => (i, (i % 3).toInt, v) }
      .toDF("vec_id", "label", "embedding")
    def cents(n: Int) = all.take(n).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents(4), path)
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") < 15), path, 0L,
      payloadCols = Seq("label"))
    StreamingIvf.appendEpoch(labeled.filter(col("vec_id") >= 15), path, 1L,
      payloadCols = Seq("label"))
    StreamingIvf.deleteEpoch(Seq(7L, 21L).toDF("vec_id"), path, 0L)
    StreamingIvf.refit(spark, path, cents(6))
    val f = new java.io.File(path)
    assert(new java.io.File(f, "corpus").listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("epoch=-1"),
      "refit must leave only the re-routed epoch")
    assert(spark.read.parquet(s"$path/centroids").count() == 6,
      "refit must install the new quantizer")
    assert(!new java.io.File(f, "tombstones").exists(),
      "the swap must retire the folded tombstone store")
    val rerouted = spark.read.option("basePath", s"$path/corpus")
      .parquet(s"$path/corpus")
    assert(rerouted.filter(col("vec_id").isin(7L, 21L)).count() == 0,
      "tombstoned rows must not survive the re-route")
    assert(rerouted.columns.contains("label"),
      "payload columns ride through the refit")
    // post-refit search == the in-memory probe under the NEW centroids,
    // over the corpus minus the deletions
    val atRest = StreamingIvf.search(spark, path,
        labeled.filter(col("vec_id") < 3), k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val expect = Similarity.ivfTopK(
        labeled.filter(!col("vec_id").isin(7L, 21L)),
        labeled.filter(col("vec_id") < 3), cents(6), k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(atRest == expect)
    // the standing pipeline keeps appending on top of the refit state
    StreamingIvf.appendEpoch(
      Seq((99L, 1, vec(99L))).toDF("vec_id", "label", "embedding"),
      path, 2L, payloadCols = Seq("label"))
    assert(spark.read.parquet(s"$path/corpus")
      .filter(col("vec_id") === 99L).count() == 1)
  }

  test("at-rest mmrSearch at full probe equals the brute-force MMR re-rank") {
    val path = Files.createTempDirectory("graft-sivf-mmr").toString
    val emb = all.toDF("vec_id", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(emb.filter(col("vec_id") < 15), path, 0L)
    StreamingIvf.appendEpoch(emb.filter(col("vec_id") >= 15), path, 1L)
    val queries = emb.filter(col("vec_id") < 3)
    val atRest = StreamingIvf.mmrSearch(spark, path, queries,
        candidates = 10, k = 5, lambda = 0.7, nProbe = 4)
      .select("query_id", "corpus_id", "mmr_score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.mmrDiversifyTopK(emb, queries,
        candidates = 10, k = 5, lambda = 0.7)
      .select("query_id", "corpus_id", "mmr_score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(atRest == brute,
      "full-probe at-rest MMR must equal the brute-force re-rank exactly")
    // diversified picks per query: k rows, ranks 1..k, no duplicate ids
    atRest.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.size == 5 && rows.map(_._4) == (1 to 5).toSet,
        s"query $q must get exactly k ranked picks")
      assert(rows.map(_._2).size == 5, s"query $q repeated a pick")
    }
    // the driver-collect contract is ENFORCED, not just documented
    // (round-13 verdict #4 + advisory): input validation mirrors the
    // brute-force twin, and an over-cap query frame fails loudly before
    // anything is collected
    intercept[IllegalArgumentException] {
      StreamingIvf.mmrSearch(spark, path, queries, candidates = 3, k = 5)
    }
    intercept[IllegalArgumentException] {
      StreamingIvf.mmrSearch(spark, path, queries, candidates = 10, k = 5,
        lambda = 1.3)
    }
    intercept[IllegalArgumentException] {
      StreamingIvf.mmrSearch(spark, path, queries, candidates = 10, k = 5,
        maxQueries = 2) // |queries| = 3
    }
  }

  test("a null-embedding query row is dropped, not an NPE (explode-parity)") {
    val path = Files.createTempDirectory("graft-sivf-null").toString
    val corpus = all.toDF("vec_id", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(corpus, path, 0L)
    // a join-derived anchor frame can carry null vectors (w41's caller
    // shape); the pre-round-16 explode-based probe silently dropped such
    // rows — the collected probe must match that, not throw
    val queries = (Seq((100L, null: Seq[Float])) ++
        all.take(2).map { case (i, v) => (i, v) })
      .toDF("vec_id", "embedding")
    val got = StreamingIvf.search(spark, path, queries, k = 3, nProbe = 4)
      .select("query_id").distinct()
      .as[Long].collect().toSet
    assert(got == Set(0L, 1L), "null-embedding anchors emit nothing")
  }

  test("an over-cap probe batch fails filteredSearch loudly") {
    val key = graft.functions.ProbeCollect.MaxRowsKey
    val path = Files.createTempDirectory("graft-sivf-cap").toString
    val corpus = all.toDF("vec_id", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(corpus, path, 0L)
    spark.conf.set(key, "3")
    try {
      val e = intercept[IllegalArgumentException] {
        StreamingIvf.search(spark, path, corpus.filter(col("vec_id") < 10),
          k = 3, nProbe = 2)
      }
      assert(e.getMessage.contains(key))
    } finally spark.conf.unset(key)
  }

  test("filteredSearch applies an arbitrary payload predicate at the probe scan") {
    val path = Files.createTempDirectory("graft-sivf-flt").toString
    val tagged = all.map { case (i, v) => (i, (i % 5).toInt, v) }
      .toDF("vec_id", "quality", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(tagged, path, 0L, payloadCols = Seq("quality"))
    val queries = tagged.filter(col("vec_id") < 3)
    // full probe + corpus-side quality floor ≡ brute-force over the
    // pre-filtered corpus (the predicate is a pure candidate filter)
    val filtered = StreamingIvf.filteredSearch(spark, path, queries,
        k = 5, nProbe = 4, corpusPayloadCols = Seq("quality"),
        predicate = Some(col("corpus_quality") >= 3))
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(
        tagged.filter(col("quality") >= 3).select("vec_id", "embedding"),
        queries.select("vec_id", "embedding"), k = 5)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(filtered == brute)
    // and every survivor really clears the floor
    val q = tagged.select("vec_id", "quality").as[(Long, Int)].collect().toMap
    filtered.foreach { case (_, c, _) => assert(q(c) >= 3, s"corpus $c under floor") }
  }

  test("tombstones mask probes immediately; compact applies and clears them") {
    val path = Files.createTempDirectory("graft-sivf-tomb").toString + "/idx"
    val vecs = all.toDF("vec_id", "embedding")
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)
    StreamingIvf.appendEpoch(vecs.filter(col("vec_id") < 15), path, 0L)
    StreamingIvf.appendEpoch(vecs.filter(col("vec_id") >= 15), path, 1L)
    val queries = all.take(3).toDF("vec_id", "embedding")
    def hits() = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val before = hits()
    // delete three ids that ARE ranked today, so masking is observable
    val dead = before.map(_._2).toSeq.distinct.sorted.take(3)
    StreamingIvf.deleteEpoch(dead.toDF("vec_id"), path, 0L)
    // masked at the probe scan BEFORE any compaction
    val masked = hits()
    assert(dead.forall(d => !masked.exists(_._2 == d)))
    // equal to a from-scratch index over the live vectors
    val liveOnly = Similarity.ivfTopK(
        vecs.filter(!col("vec_id").isin(dead: _*)), queries, cents,
        k = 5, nProbe = 4)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(masked == liveOnly)
    // compact: bytes dropped, store cleared, answers unchanged
    StreamingIvf.compact(spark, path)
    assert(hits() == masked, "pre-compact and post-compact probes must agree")
    assert(!new java.io.File(s"$path/tombstones").exists(),
      "compaction must clear the applied tombstone store")
    assert(spark.read.parquet(s"$path/corpus")
      .filter(col("vec_id").isin(dead: _*)).count() == 0,
      "compaction must drop tombstoned rows from the at-rest bytes")
    // crash shape: tombstones surviving the corpus swap reapply harmlessly
    StreamingIvf.deleteEpoch(Seq(dead.head).toDF("vec_id"), path, 1L) // already gone
    StreamingIvf.compact(spark, path)
    assert(hits() == masked)
    // a post-compact re-append RESURRECTS the id (tombstone was cleared);
    // it was a ranked hit before the delete, so it must rank again
    StreamingIvf.appendEpoch(vecs.filter(col("vec_id") === dead.head), path, 7L)
    assert(hits().exists(_._2 == dead.head))
  }

  test("standing index ingest resumes after restart; at-rest search equals in-memory probe") {
    val inDir = Files.createTempDirectory("graft-sivf-in")
    val path = Files.createTempDirectory("graft-sivf-idx").toString
    val cpDir = Files.createTempDirectory("graft-sivf-cp").toString
    val cents = all.take(4).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    StreamingIvf.init(cents, path)

    def writeBatch(name: String, rows: Seq[(Long, Seq[Float])]): Unit =
      Files.writeString(inDir.resolve(name),
        rows.map { case (i, v) =>
          s"""{"vec_id":$i,"embedding":[${v.mkString(",")}]}"""
        }.mkString("", "\n", "\n"))
    def stream = spark.readStream
      .schema("vec_id long, embedding array<float>")
      .option("maxFilesPerTrigger", 1)
      .json(inDir.toString)

    writeBatch("b1.json", all.slice(0, 10))
    val q1 = StreamingIvf.run(stream, path, cpDir)
    q1.processAllAvailable()
    q1.stop()

    writeBatch("b2.json", all.slice(10, 20))
    writeBatch("b3.json", all.slice(20, 30))
    val q2 = StreamingIvf.run(stream, path, cpDir)
    q2.processAllAvailable()
    q2.stop()

    val queries = all.take(3).toDF("vec_id", "embedding")
    val atRest = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val inMem = Similarity.ivfTopK(all.toDF("vec_id", "embedding"), queries,
        cents, k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(atRest == inMem)
    // no loss, no dupes across the restart (epoch overwrite is idempotent)
    assert(spark.read.option("basePath", s"$path/corpus").parquet(s"$path/corpus")
      .select("vec_id").distinct().count() == 30)
    assert(spark.read.option("basePath", s"$path/corpus").parquet(s"$path/corpus")
      .count() == 30)
    // the probe scan is partition-pruned on cell under the epoch dirs
    val plan = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell#"),
      plan.take(800))

    // ---- compaction: fold the three epoch dirs into epoch=-1; search,
    // row counts and partition pruning are unchanged
    StreamingIvf.compact(spark, path)
    val corpusDir = new java.io.File(s"$path/corpus")
    assert(corpusDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
      == Set("epoch=-1"))
    val compacted = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(compacted == inMem)
    val planC = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(planC.contains("PartitionFilters:") && planC.contains("cell#"))

    // ---- crash-recovery: simulate a crash between delete and rename
    // (corpus missing, complete .compacting sibling present) — the next
    // compact() entry finishes the swap, losing nothing
    val staging = new java.io.File(s"$path/corpus.compacting")
    java.nio.file.Files.move(corpusDir.toPath, staging.toPath)
    assert(!corpusDir.exists() && staging.exists())
    StreamingIvf.compact(spark, path)
    val recovered = StreamingIvf.search(spark, path, queries, k = 5, nProbe = 2)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(recovered == inMem)
  }
}
