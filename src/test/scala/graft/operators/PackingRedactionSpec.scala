package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PackingRedactionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("packSequences matches a sequential prefix sum across partitions") {
    // irregular counts incl. zeros; force several range partitions so the
    // broadcast-offset seam between partitions is actually exercised
    val counts = Seq(3L, 0L, 7L, 12L, 1L, 0L, 25L, 4L, 9L, 2L, 30L, 5L)
    val docs = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, ("tok " * n.toInt).trim) }
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs,
        graft.functions.TextFunctions.tokenCount(col("text")),
        blockSize = 10L, numPartitions = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "block_first", "block_last")
      .as[(Long, Long, Long, Long, Long)].collect()
    var off = 0L
    counts.zipWithIndex.foreach { case (n, i) =>
      val (id, nt, so, bf, bl) = out(i)
      assert(id == i.toLong && nt == n && so == off)
      assert(bf == off / 10)
      assert(bl == math.max(off + n - 1, off) / 10)
      off += n
    }
  }

  test("packDocsFirstFit: budget respected, oversize singletons, deterministic across partitionings") {
    // counts spanning under/over budget; ids chosen so multiple shards fill
    val docs = (0L until 60L).map(i => (i, (i * 13 % 37 + 3))).toDF("doc_id", "n")
    val out = Packing.packDocsFirstFit(docs, col("n"), budget = 30L,
        shards = 3, maxOpenBins = 2)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out.size == 60)
    // every doc flagged oversize iff it exceeds the budget
    out.foreach { case (_, n, _, _, _, ov) => assert(ov == (n > 30L)) }
    // bin fills: <= budget unless the bin is an oversize singleton
    out.groupBy(_._4).foreach { case (_, members) =>
      val fill = members.map(_._2).sum
      if (!members.exists(_._6)) assert(fill <= 30L)
      else assert(members.size == 1) // oversize bins hold exactly one doc
    }
    // bin_pos is a contiguous 0-based sequence within each bin
    out.groupBy(_._4).foreach { case (_, members) =>
      assert(members.map(_._5).sorted == members.indices.toList)
    }
    // bin_id encodes the shard
    out.foreach { case (_, _, sh, bin, _, _) => assert((bin >> 40) == sh.toLong) }
    // determinism: a differently-partitioned input produces the same packing
    val out2 = Packing.packDocsFirstFit(docs.repartition(7), col("n"), budget = 30L,
        shards = 3, maxOpenBins = 2)
      .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
      .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out == out2)
  }

  test("packDocsFirstFit: open-bin cap closes the fullest bin, first-fit scans creation order") {
    // single shard so the fold order is exactly (n desc, id asc):
    // 20, 18, 15 -> three bins; cap 2 closes the fullest (20) when the
    // third opens; the next doc of 10 then first-fits into the 18-bin
    // (12 left) rather than the closed 20-bin (10 left would have fit!)
    val docs = Seq((0L, 20L), (1L, 18L), (2L, 15L), (3L, 10L))
      .toDF("doc_id", "n")
    val out = Packing.packDocsFirstFit(docs, col("n"), budget = 30L,
        shards = 1, maxOpenBins = 2)
      .select("doc_id", "bin_id", "bin_pos")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    val binOf = out.map(r => r._1 -> r._2).toMap
    assert(binOf(0L) != binOf(1L) && binOf(1L) != binOf(2L))
    assert(binOf(3L) == binOf(1L)) // fullest (bin of doc 0) was closed
    assert(out.find(_._1 == 3L).get._3 == 1) // second doc in that bin
  }

  test("blocklistAudit counts total and distinct blocklisted tokens") {
    val docs = Seq(
      (1L, "Bad bad word here"),
      (2L, "clean text only"),
      (3L, "word BAD word")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        graft.functions.TextFunctions.blocklistAudit(
          graft.functions.TextFunctions.tokens(lower(col("text"))),
          Seq("bad", "word")).as("a"))
      .select(col("doc_id"), col("a.n_blocked"), col("a.n_blocked_terms"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 3L, 2L), (2L, 0L, 0L), (3L, 3L, 2L)))
  }

  test("packSequences block spans tile the token stream exactly") {
    val docs = (0L until 200L).map(i => (i, i % 17 + 1)).toDF("doc_id", "n")
    val out = Packing.packSequences(docs, col("n"), blockSize = 64L)
      .orderBy("doc_id")
      .select("start_offset", "n_tokens")
      .as[(Long, Long)].collect()
    // contiguous: every doc starts where the previous ended
    out.sliding(2).foreach {
      case Array((s0, n0), (s1, _)) => assert(s1 == s0 + n0)
      case _ =>
    }
    assert(out.head._1 == 0L)
  }

  test("chunkTokens windows overlap correctly and cover every token") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")), // 30 toks: chunks at 0,12,24
      (2L, "a b c"),                                  // shorter than one window
      (3L, "")                                        // empty: no chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, chunkSize = 16, overlap = 4)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 16L), (1L, 12L, 16L), (2L, 24L, 6L)))
    assert(d1(1)._5.startsWith("t13 ") && d1(1)._5.endsWith(" t28"))
    // consecutive chunks share exactly `overlap` tokens
    assert(d1(0)._5.split(" ").takeRight(4).toSeq == d1(1)._5.split(" ").take(4).toSeq)
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._4, c._5)).toSeq ==
      Seq((0L, 3L, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("vocab build ranks by frequency then token; encode preserves positions and flags unknowns") {
    val docs = Seq(
      (1L, "b a a c b a"),   // a:3 b:2 c:1
      (2L, "a b zz c")       // zz falls outside vocab size 3
    ).toDF("doc_id", "text")
    val vocab = Vocab.build(docs, size = 3).orderBy("vid")
      .as[(String, Long, Long)].collect()
    assert(vocab.map(v => (v._1, v._2)).toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
    assert(vocab.map(_._3).toSeq == Seq(4L, 3L, 2L))
    val enc = Vocab.encode(docs, Vocab.build(docs, size = 3))
      .orderBy("doc_id")
      .select("doc_id", "token_ids", "n_unk").collect()
    assert(enc(0).getSeq[Long](1) == Seq(1L, 0L, 0L, 2L, 1L, 0L))
    assert(enc(0).getLong(2) == 0L)
    assert(enc(1).getSeq[Long](1) == Seq(0L, 1L, -1L, 2L))
    assert(enc(1).getLong(2) == 1L)
  }

  test("groupSample takes the k hash-smallest ids per group, whole small groups") {
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b")) ++
      Seq((1000L, "c"), (1001L, "c")) // group smaller than k
    val df = rows.toDF("doc_id", "lang")
    val got = Sampling.groupSample(df, Seq("lang"), k = 10)
      .orderBy("lang", "doc_id")
      .as[(String, Long)].collect()
    // reference: sort each group by (xxhash64(id), id), take 10
    val hashed = df.select($"lang", $"doc_id", xxhash64($"doc_id").as("h"))
      .as[(String, Long, Long)].collect()
    val expected = hashed.groupBy(_._1).toSeq.flatMap { case (g, xs) =>
      xs.sortBy(x => (x._3, x._2)).take(10).map(x => (g, x._2))
    }.sorted
    assert(got.toSeq == expected)
    assert(got.count(_._1 == "a") == 10 && got.count(_._1 == "c") == 2)
  }

  test("weightedSample: A-ES keys match driver arithmetic; selection is deterministic") {
    val df = (1L to 100L).map(i => (i, i)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, $"doc_id", $"w", k = 10)
      .select("doc_id", "wkey").as[(Long, Double)].collect().sortBy(_._1)
    // driver reference: same md5-derived uniform, -ln(u)/w, bottom-10
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(s"$id:wrs".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      -math.log(u) / w
    }
    val expected = (1L to 100L).map(i => (i, key(i, i.toDouble)))
      .sortBy { case (id, k0) => (k0, id) }.take(10).sortBy(_._1)
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
    // deterministic under reordering
    val again = Sampling.weightedSample(df.orderBy(rand(7)), $"doc_id", $"w", k = 10)
      .select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == got.map(_._1).toSeq)
  }

  test("weightedSample favors heavy weights (inclusion ~ weight) and salts decorrelate") {
    // two strata: ids 1-500 weight 1, ids 501-1000 weight 100 — the heavy
    // half must dominate a k=100 sample overwhelmingly
    val df = (1L to 1000L).map(i => (i, if (i <= 500) 1L else 100L)).toDF("doc_id", "w")
    val sel = Sampling.weightedSample(df, $"doc_id", $"w", k = 100)
      .select("doc_id").as[Long].collect()
    val heavy = sel.count(_ > 500)
    assert(heavy > 90, s"heavy-weight rows selected: $heavy/100")
    // a different salt reshuffles the light-weight stragglers
    val other = Sampling.weightedSample(df, $"doc_id", $"w", k = 100, salt = "other")
      .select("doc_id").as[Long].collect()
    assert(other.toSet != sel.toSet)
  }

  test("hashSplit: total deterministic partition with md5-mod buckets") {
    val df = (0L until 500L).toDF("doc_id")
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val got = Sampling.hashSplit(df, $"doc_id", splits)
      .select("doc_id", "bucket", "split").as[(Long, Long, String)].collect()
    assert(got.length == 500)
    // reference: java MD5 of the decimal string, first 8 hex digits mod 100
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, bucket, split) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expB = java.lang.Long.parseLong(hex, 16) % 100
      assert(bucket == expB, s"id=$id")
      val expS = if (expB < 80) "train" else if (expB < 90) "val" else "test"
      assert(split == expS, s"id=$id bucket=$bucket")
    }
    // roughly proportional (md5 is uniform; 500 ids ⇒ loose bounds)
    val bySplit = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit("train") > 350 && bySplit("val") > 20 && bySplit("test") > 20)
    // re-running yields the identical assignment (pure function of id)
    val again = Sampling.hashSplit(df.orderBy(rand(7)), $"doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.forall { case (id, _, s) => again(id) == s })
  }

  test("mixtureSample: per-group integer keep-rates, deterministic, bounded") {
    val df = (0L until 600L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 10000, "src1" -> 5000, "src2" -> 0)
    val got = Sampling.mixtureSample(df, $"doc_id", "source", rates, defaultBp = 1000)
      .select("doc_id", "source", "bucket", "rate_bp")
      .as[(Long, String, Long, Long)].collect()
    // rate 10000 keeps everything, 0 keeps nothing, every kept row obeys the gate
    assert(got.count(_._2 == "src0") == 200)
    assert(!got.exists(_._2 == "src2"))
    assert(got.forall { case (_, _, b, r) => b < r })
    val src1 = got.count(_._2 == "src1")
    assert(src1 > 60 && src1 < 140, s"src1=$src1") // ~50% of 200, md5-uniform
    // pure function of id: identical membership after reshuffle
    val again = Sampling.mixtureSample(df.orderBy(rand(3)), $"doc_id", "source",
      rates, defaultBp = 1000).select("doc_id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
    // unmapped group falls to defaultBp
    val other = Seq((1L, "srcX"), (2L, "srcX")).toDF("doc_id", "source")
    assert(Sampling.mixtureSample(other, $"doc_id", "source", rates, defaultBp = 10000)
      .count() == 2)
  }

  test("mixtureSample kept set is decorrelated from hashSplit buckets (salted digest)") {
    // rate 37 bp (not a multiple of 100): with an UNSALTED digest every kept
    // row would satisfy digest%10000 < 37 ⇒ digest%100 < 37 ⇒ all 'train'
    // under 80/10/10 — the salt breaks the correlation
    val df = (0L until 20000L).map(i => (i, "s")).toDF("doc_id", "source")
    val kept = Sampling.mixtureSample(df, $"doc_id", "source", Map("s" -> 37))
      .select("doc_id")
    val bySplit = Sampling.hashSplit(kept, $"doc_id",
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.size > 1, s"kept rows all in one split: $bySplit")
  }

  test("temperatureRates: T=1 natural, T>1 downsamples the head, feeds mixtureSample") {
    val counts = Map("big" -> 1000000L, "mid" -> 10000L, "small" -> 100L)
    // T=1: natural distribution — keep everything
    assert(Sampling.temperatureRates(counts, 1.0).values.toSet == Set(10000))
    // T>1: smallest source keeps all; rates decrease with count
    val t2 = Sampling.temperatureRates(counts, 2.0)
    assert(t2("small") == 10000)
    assert(t2("small") > t2("mid") && t2("mid") > t2("big"))
    // expected kept mass ∝ count^(1/T): kept_i = count_i * rate_i/1e4
    val kept = counts.map { case (k, c) => k -> c * t2(k) / 10000.0 }
    val ratio = kept("big") / kept("small")
    val want = math.pow(counts("big").toDouble / counts("small"), 0.5)
    assert(math.abs(ratio / want - 1.0) < 0.02, s"got $ratio want $want")
    // plugs into mixtureSample as-is
    val df = (0L until 300L).map(i => (i, if (i < 200) "big" else "small"))
      .toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(Map("big" -> 200L, "small" -> 100L), 4.0)
    val out = Sampling.mixtureSample(df, $"doc_id", "source", rates)
    assert(out.filter($"source" === "small").count() == 100) // upweighted side intact
    assert(out.filter($"source" === "big").count() < 200)    // head downsampled
  }

  test("bloom-pruned decontamination equals the exact explode-join") {
    import graft.functions.HashFunctions
    val mk = (i: Long, s: String) => (i, s)
    val corpus = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),   // shares 4-grams with probe 1
      mk(2L, "one two three four five six seven eight nine"),    // shares with probe 2
      mk(3L, "totally disjoint text with unique words only here"),
      mk(4L, "alpha beta gamma delta something else entirely now")// shares 1 shingle with probe 1
    ).toDF("doc_id", "text")
    val probe = Seq(
      mk(100L, "alpha beta gamma delta epsilon zeta"),
      mk(200L, "zero one two three four five six")
    ).toDF("doc_id", "text")
    val got = Decontaminate.bloomPruned(corpus, probe)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // exact reference: explode-join without the bloom stage
    val probeH = probe.select(explode(HashFunctions.shingleHashes(col("text"), 4)).as("h")).distinct()
    val exact = corpus
      .select(col("doc_id"), explode(HashFunctions.shingleHashes(col("text"), 4)).as("h"))
      .join(probeH, "h").groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == exact)
    assert(got.map(_._1).contains(1L) && got.map(_._1).contains(4L))
    assert(!got.map(_._1).contains(3L))
  }

  test("redact replaces and counts each PII type") {
    val df = Seq(
      (1L, "mail a.b-c_9@foo-bar.org then 10.0.255.3 then 555-123-4567 end"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.co plus 1.2.3.4 and 9.9.9.9")
    ).toDF("doc_id", "text")
    val out = Redaction.redact(df).orderBy("doc_id")
      .select("text", "n_emails", "n_ips", "n_phones")
      .as[(String, Long, Long, Long)].collect()
    assert(out(0)._1 == "mail <EMAIL> then <IP> then <PHONE> end")
    assert((out(0)._2, out(0)._3, out(0)._4) == ((1L, 1L, 1L)))
    assert(out(1)._1 == "no pii here at all")
    assert((out(1)._2, out(1)._3, out(1)._4) == ((0L, 0L, 0L)))
    assert(out(2)._1 == "two mails <EMAIL> and <EMAIL> plus <IP> and <IP>")
    assert((out(2)._2, out(2)._3, out(2)._4) == ((2L, 2L, 0L)))
  }

  test("redact counts staged input — PII swallowed by an earlier stage is not double-counted") {
    // the phone-shaped local part and the IP-shaped domain both disappear
    // into the email match; later stages must see the placeholder, not the raw
    val df = Seq((1L, "ping 555-123-4567@10.2.3.4.com ok")).toDF("doc_id", "text")
    val out = Redaction.redact(df)
      .select("text", "n_emails", "n_ips", "n_phones")
      .as[(String, Long, Long, Long)].head()
    assert(out._1 == "ping <EMAIL> ok")
    assert((out._2, out._3, out._4) == ((1L, 0L, 0L)))
  }
}
