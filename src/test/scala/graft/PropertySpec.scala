package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins
import graft.sources.ThriftLogCodec

/** Property-based invariants (SURVEY §5: an upgrade the reference's test
  * strategy lacks). Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest bridge artifact is not on the offline classpath). */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], trials: Int = 30)(f: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  test("thrift codec roundtrips arbitrary payloads and preserves order") {
    forAll(Gen.listOfN(5, Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)))) {
      payloads =>
        val frames = payloads.map(p => ThriftLogCodec.encodeFrame(null, p.toArray))
        val concat = frames.foldLeft(Array.empty[Byte])(_ ++ _)
        val decoded = ThriftLogCodec.decodeFrames(concat).toList
        assert(decoded.map(_.message.toList) == payloads)
    }
  }

  test("thrift codec never throws on arbitrary garbage bytes") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { garbage =>
      // must terminate without exception; may decode zero or more frames
      ThriftLogCodec.decodeFrames(garbage.toArray, maxMessageBytes = 1 << 16).size
      ()
    }
  }

  test("partitioners always land in [0, n) for arbitrary keys") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Partitioners
    forAll(Gen.zip(Gen.chooseNum(1, 64), Gen.listOfN(20, Gen.alphaNumStr))) {
      case (n: Int, keys: List[String]) =>
        val df = keys.map(_.getBytes("UTF-8")).toDF("key")
        val parts = df.select(
          Partitioners.crc32Partition(col("key"), n).as("a"),
          Partitioners.murmurPartition(col("key"), n).as("b"),
          Partitioners.md5StringKeyPartition(col("key"), n).as("c")).collect()
        assert(parts.forall { r =>
          (0 until 3).forall { i => val p = r.getInt(i); p >= 0 && p < n }
        })
    }
  }

  test("KeyTemplate rendering is deterministic given fixed inputs") {
    forAll(Gen.zip(Gen.alphaNumStr, Gen.chooseNum(0L, 4102444800000L))) { case (log, now) =>
      val t = graft.streaming.KeyTemplate("{{LOGNAME}}/{{TIMESTAMP}}/{{UUID}}", log)
      assert(t.render(nowMs = now, uuid = "u") == t.render(nowMs = now, uuid = "u"))
    }
  }

  test("asofBackward matches a brute-force per-row reference on random data") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))))
    forAll(gen, trials = 5) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "lk", "lt")
      val right = rightRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = Joins.asofBackward(left, right,
        leftKey = col("lk"), rightKey = col("rk"),
        leftTime = col("lt"), rightTime = col("rt"),
        rightId = col("rid"), rightCols = Seq("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
        val best = if (candidates.isEmpty) -1L
        else candidates.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong
        i.toLong -> best
      }.toMap
      assert(got == expected)
    }
  }

  test("asofForward matches a brute-force per-row reference on random data") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))))
    forAll(gen, trials = 5) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "lk", "lt")
      val right = rightRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = Joins.asofForward(left, right,
        leftKey = col("lk"), rightKey = col("rk"),
        leftTime = col("lt"), rightTime = col("rt"),
        rightId = col("rid"), rightCols = Seq("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt >= t }
        val best = if (candidates.isEmpty) -1L
        else candidates.minBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong
        i.toLong -> best
      }.toMap
      assert(got == expected)
    }
  }

  test("asofNearest matches a brute-force per-row reference (ties resolve backward)") {
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 100L))))
    forAll(gen, trials = 5) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "lk", "lt")
      val right = rightRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = Joins.asofNearest(left, right,
        leftKey = col("lk"), rightKey = col("rk"),
        leftTime = col("lt"), rightTime = col("rt"),
        rightId = col("rid"), rightCols = Seq("rid"))
        .select("lid", "rid", "asof_dir").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) -1L else r.getLong(1)),
            if (r.isNullAt(2)) "none" else r.getString(2))).toMap
      val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val back = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
          .sortBy { case ((_, rt), ri) => (-rt, -ri.toLong) }.headOption
        val fwd = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt >= t }
          .sortBy { case ((_, rt), ri) => (rt, ri.toLong) }.headOption
        val pick = (back, fwd) match {
          case (None, None) => (-1L, "none")
          case (Some(b), None) => (b._2.toLong, "backward")
          case (None, Some(f)) => (f._2.toLong, "forward")
          case (Some(b), Some(f)) =>
            // forward wins ONLY on strictly smaller distance
            if (f._1._2 - t < t - b._1._2) (f._2.toLong, "forward")
            else (b._2.toLong, "backward")
        }
        i.toLong -> pick
      }.toMap
      assert(got == expected)
    }
  }

  test("packSequences: arbitrary counts and partitioning match the sequential fold") {
    import org.apache.spark.sql.functions.col
    forAll(Gen.zip(Gen.chooseNum(1, 6),
      Gen.listOfN(40, Gen.chooseNum(0, 50))), trials = 10) {
      case (parts: Int, counts: List[Int]) =>
        val docs = counts.zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }
          .toDF("doc_id", "n")
        val got = graft.operators.Packing
          .packSequences(docs, col("n"), blockSize = 17L, numPartitions = parts)
          .orderBy("doc_id")
          .select("n_tokens", "start_offset", "block_first", "block_last")
          .as[(Long, Long, Long, Long)].collect()
        var off = 0L
        counts.zipWithIndex.foreach { case (n, i) =>
          val (nt, so, bf, bl) = got(i)
          assert(nt == n.toLong && so == off)
          assert(bf == off / 17 && bl == math.max(off + n - 1, off) / 17)
          off += n
        }
    }
  }

  test("packDocsFirstFit: invariants hold and a sequential replay agrees on random inputs") {
    import org.apache.spark.sql.functions.col
    forAll(Gen.zip(Gen.chooseNum(1, 5),
      Gen.listOfN(30, Gen.chooseNum(0, 40))), trials = 8) {
      case (parts: Int, counts: List[Int]) =>
        val budget = 25L
        val docs = counts.zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }
          .toDF("doc_id", "n").repartition(parts)
        val got = graft.operators.Packing
          .packDocsFirstFit(docs, col("n"), budget = budget, shards = 3, maxOpenBins = 2)
          .select("doc_id", "n_tokens", "shard", "bin_id", "bin_pos", "oversize")
          .as[(Long, Long, Int, Long, Int, Boolean)].collect().toSeq
        // every doc emitted exactly once
        assert(got.map(_._1).sorted == counts.indices.map(_.toLong))
        // budget respected except oversize singletons; oversize flag exact
        got.groupBy(_._4).foreach { case (_, ms) =>
          if (ms.exists(_._6)) assert(ms.size == 1 && ms.head._2 > budget)
          else assert(ms.map(_._2).sum <= budget)
        }
        // sequential replay of the documented fold agrees bin-for-bin
        val byShard = got.groupBy(_._3)
        byShard.foreach { case (sh, ms) =>
          val ordered = ms.sortBy(m => (-m._2, m._1)) // (n desc, id asc)
          var nextSeq = 0L
          val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          ordered.foreach { case (_, n, _, binId, pos, ov) =>
            if (n > budget) {
              assert(ov && binId == (sh.toLong << 40 | nextSeq) && pos == 0)
              nextSeq += 1
            } else {
              val i = bins.indexWhere { case (_, fill, _) => fill + n <= budget }
              if (i >= 0) {
                val (seq, fill, cnt) = bins(i)
                assert(binId == (sh.toLong << 40 | seq) && pos == cnt)
                bins(i) = (seq, fill + n, cnt + 1)
              } else {
                assert(binId == (sh.toLong << 40 | nextSeq) && pos == 0)
                bins += ((nextSeq, n, 1)); nextSeq += 1
                if (bins.size > 2) {
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
        }
    }
  }

  test("chunkTokens: chunks tile the token stream with exact overlap") {
    forAll(Gen.zip(Gen.chooseNum(0, 60), Gen.chooseNum(2, 12)), trials = 15) {
      case (nToks: Int, chunkSize: Int) =>
        val overlap = chunkSize / 3
        val step = chunkSize - overlap
        val text = (0 until nToks).map(i => s"w$i").mkString(" ")
        val df = Seq((1L, text)).toDF("doc_id", "text")
        val chunks = graft.operators.Chunking
          .chunkTokens(df, chunkSize = chunkSize, overlap = overlap)
          .orderBy("chunk_id")
          .select("chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
          .as[(Long, Long, Long, String)].collect()
        if (nToks == 0) assert(chunks.isEmpty)
        else {
          // starts advance by step; sizes fill to chunkSize except the tail;
          // concatenating de-overlapped chunks reproduces the token stream
          chunks.zipWithIndex.foreach { case ((cid, cs, n, _), i) =>
            assert(cid == i.toLong && cs == i.toLong * step)
            assert(n == math.min(chunkSize.toLong, nToks - cs))
          }
          val rebuilt = chunks.zipWithIndex.flatMap { case ((_, _, _, t), i) =>
            val toks = t.split(" ").toSeq
            if (i == 0) toks else toks.drop(overlap)
          }
          assert(rebuilt.toSeq == (0 until nToks).map(i => s"w$i"))
        }
    }
  }

  test("redact is idempotent on arbitrary text") {
    import org.apache.spark.sql.functions.col
    val piiGen = Gen.oneOf("x@y.io", "1.2.3.4", "555-123-4567", "plain", "a.b", "@", "127.0.0.1:80")
    forAll(Gen.listOfN(8, piiGen), trials = 15) { words =>
      val text = words.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val once = graft.operators.Redaction.redact(df).select("text").as[String].head()
      val twice = graft.operators.Redaction
        .redact(Seq((1L, once)).toDF("doc_id", "text"))
        .select("text").as[String].head()
      assert(twice == once)
    }
  }

  test("wordpiece: pieces concatenate back to the word, and every multi-char piece is in vocab") {
    import graft.operators.Wordpiece
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val vocabGen = Gen.listOf(
      Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)))
      .map(ps => Wordpiece.Vocab(ps.toSet))
    forAll(Gen.zip(Gen.listOfN(10, wordGen), vocabGen), trials = 20) { case (words, vocab) =>
      words.foreach { w =>
        val pieces = Wordpiece.encodeWord(w, vocab)
        assert(pieces.mkString == w, s"round-trip failed for '$w'")
        // single codepoints are the implicit fallback; anything longer must
        // be a real vocab piece
        assert(pieces.filter(_.length >= 2).forall(vocab.pieces.contains))
      }
    }
  }

  test("wordpiece: greedy longest-match dominance — no longer vocab prefix exists at any cut") {
    import graft.operators.Wordpiece
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b')).map(_.mkString)
    val vocabGen = Gen.listOf(
      Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
      .map(ps => Wordpiece.Vocab(ps.toSet))
    forAll(Gen.zip(Gen.listOfN(8, wordGen), vocabGen), trials = 20) { case (words, vocab) =>
      words.foreach { w =>
        val pieces = Wordpiece.encodeWord(w, vocab)
        var i = 0
        pieces.foreach { p =>
          // at offset i the emitted piece must be the LONGEST vocab match
          val longer = ((p.length + 1) to math.min(vocab.maxLen, w.length - i))
            .map(len => w.substring(i, i + len))
          assert(!longer.exists(vocab.pieces.contains),
            s"'$p' at $i in '$w' is not the longest match")
          i += p.length
        }
      }
    }
  }

  test("unigram LM perplexity is invariant to doc order and partitioning") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Lm
    val docGen = Gen.listOfN(12,
      Gen.nonEmptyListOf(Gen.oneOf("the", "cat", "sat", "mat", "dog", "xylo", "q"))
        .map(_.mkString(" ")))
    forAll(docGen, trials = 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def score(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Double)] = {
        val m = Lm.unigramLm(df, vocabSize = 4)
        Lm.perplexity(df, m).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            math.rint(r.getDouble(3) * 1e9) / 1e9))).toMap
      }
      val base = score(docs.toDF("doc_id", "text"))
      val shuffled = score(docs.reverse.toDF("doc_id", "text").repartition(7, col("doc_id")))
      assert(shuffled == base)
    }
  }

  test("multiline splitter: concatenation of records covers all start-anchored content") {
    val startLine = Gen.chooseNum(0, 99999).map(n => f"I$n%05d payload")
    val contLine = Gen.alphaNumStr.map("  " + _)
    forAll(Gen.listOfN(8, Gen.oneOf(startLine, contLine))) { lines =>
      val content = lines.mkString("", "\n", "\n")
      val recs = graft.sources.LogSources.splitMultiline(content, "^I[0-9]{5}", 1 << 20).toList
      // record count equals start-line count; no content loss after first start
      assert(recs.size == lines.count(_.matches("I[0-9]{5} payload")))
      assert(recs.forall(_.startsWith("I")))
    }
  }

  test("asofBackward/Forward match the brute-force definition on random data") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Joins
    // dense key/time collisions: keys 0..2, times 0..9 — plenty of ties,
    // missing partners, and equal-time rows to stress the tie rules
    val rowGen = Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 9L))
    val caseGen = Gen.zip(Gen.listOfN(12, rowGen), Gen.listOfN(10, rowGen))
    forAll(caseGen, trials = 15) { case (leftRows, rightRowsRaw) =>
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
      val rightRows = rightRowsRaw.zipWithIndex
        .map { case ((k, t), i) => (1000L + i, k, t, s"p$i") }
      val right = rightRows.toDF("rid", "rk", "rt", "payload")

      val back = Joins.asofBackward(left, right, col("k"), col("rk"),
          col("t"), col("rt"), col("rid"), Seq("payload"))
        .select("lid", "payload").as[(Long, Option[String])].collect().toMap
      val fwd = Joins.asofForward(left, right, col("k"), col("rk"),
          col("t"), col("rt"), col("rid"), Seq("payload"))
        .select("lid", "payload").as[(Long, Option[String])].collect().toMap

      leftRows.zipWithIndex.foreach { case ((k, t), i) =>
        val expBack = rightRows.filter(r => r._2 == k && r._3 <= t)
          .sortBy(r => (r._3, r._1)).lastOption.map(_._4)
        val expFwd = rightRows.filter(r => r._2 == k && r._3 >= t)
          .sortBy(r => (r._3, r._1)).headOption.map(_._4)
        assert(back(i.toLong) == expBack, s"backward lid=$i k=$k t=$t")
        assert(fwd(i.toLong) == expFwd, s"forward lid=$i k=$k t=$t")
      }
    }
  }

  test("sharedSpans reports exactly the maximal verbatim runs (brute-force cross-check)") {
    // random small-vocab corpora produce plenty of accidental overlap;
    // every reported span must be a true verbatim match AND maximal, and
    // no maximal run >= minSpan may be missed (uncapped df so the
    // reference computation is exact)
    val anchor = 3; val minSpan = 4
    val docGen = Gen.listOfN(4,
      Gen.listOfN(18, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    forAll(docGen, trials = 12) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .sharedSpans(docs, minSpan = minSpan, anchor = anchor, maxDf = 1000)
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      // brute-force reference: all maximal shared runs >= minSpan
      val toks = texts.map(_.split(" ").toVector)
      val expect = Set.newBuilder[(Long, Long, Long, Long, Long)]
      for (a <- toks.indices; b <- toks.indices if a < b) {
        val (ta, tb) = (toks(a), toks(b))
        for (sa <- ta.indices; sb <- tb.indices) {
          val isStart = sa == 0 || sb == 0 || ta(sa - 1) != tb(sb - 1)
          if (isStart && ta(sa) == tb(sb)) {
            var len = 0
            while (sa + len < ta.length && sb + len < tb.length &&
              ta(sa + len) == tb(sb + len)) len += 1
            if (len >= minSpan)
              expect += ((a.toLong, b.toLong, sa.toLong, sb.toLong, len.toLong))
          }
        }
      }
      assert(got == expect.result(),
        s"spans mismatch for corpus ${texts.mkString(" | ")}")
    }
  }

  test("removeSharedSpans never deletes from the earliest doc and counts add up") {
    val docGen = Gen.listOfN(3,
      Gen.listOfN(14, Gen.oneOf("x", "y", "z")).map(_.mkString(" ")))
    forAll(docGen, trials = 12) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup
        .removeSharedSpans(docs, minSpan = 4, anchor = 3, maxDf = 1000)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      // doc 0 has no earlier partner: untouched
      assert(out.head._2 == out.head._3)
      // counts: 0 <= after <= before, and md5 of full rejoin when untouched
      out.foreach { case (id, before, after, h) =>
        assert(after >= 0 && after <= before)
        if (after == before) {
          val full = texts(id.toInt).split(" ").mkString(" ")
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString
          assert(h == md)
        }
      }
    }
  }

  test("lineDedup keep-first matches a brute-force reference on random corpora") {
    // small line alphabet forces heavy cross-doc collisions
    val docGen = Gen.listOfN(4, Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString("\n"))))
    forAll(docGen, trials = 12) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.LineDedup
        .dedupLines(rows.toDF("doc_id", "text"))
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // brute force: first (id, pos) copy of each line survives
      val all = rows.flatMap { case (id, t) =>
        t.split("\n", -1).zipWithIndex.map { case (l, p) => (id, p, l) } }
      val owners = all.groupBy(_._3).values.map(_.minBy(r => (r._1, r._2)))
        .map(r => (r._1, r._2)).toSet
      rows.foreach { case (id, t) =>
        val ls = t.split("\n", -1).zipWithIndex
        val kept = ls.filter { case (_, p) => owners((id, p)) }.map(_._1)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString("\n").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got(id) == ((ls.length.toLong, kept.length.toLong, md)),
          s"doc $id of corpus ${texts.mkString(" | ")}")
      }
    }
  }

  test("selectUnderTokenBudget: prefix semantics hold for arbitrary budgets") {
    val gen = Gen.zip(
      Gen.listOfN(8, Gen.zip(Gen.chooseNum(1L, 50L), Gen.chooseNum(1, 10))),
      Gen.chooseNum(0L, 300L))
    forAll(gen, trials = 12) { case (rows, budget) =>
      val df = rows.zipWithIndex
        .map { case ((n, q), i) => (i.toLong, n, q.toDouble) }
        .toDF("doc_id", "n", "q")
      val got = graft.operators.Sampling
        .selectUnderTokenBudget(df, budget,
          org.apache.spark.sql.functions.col("q"),
          org.apache.spark.sql.functions.col("n"))
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      var cum = 0L
      rows.zipWithIndex.sortBy { case ((_, q), i) => (-q, i) }.foreach {
        case ((n, _), i) =>
          assert(got(i.toLong) == ((n, cum, cum + n <= budget)),
            s"doc $i budget $budget")
          cum += n
      }
    }
  }
}
