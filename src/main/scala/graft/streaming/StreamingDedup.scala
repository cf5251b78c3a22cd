package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One banded row of the streaming near-dup pipeline. Public for Janino. */
case class BandedSig(band: Int, key: Long, doc_id: Long, sig: Seq[Long])

/** Per-bucket state: (id, sig) of earlier docs, ascending id. */
case class BucketEntries(ids: Seq[Long], sigs: Seq[Seq[Long]])

/** A flagged near-duplicate: `doc_id` collided with earlier `dup_of`. */
case class DupFlag(doc_id: Long, dup_of: Long)

/** Streaming MinHash-LSH near-duplicate detection: as documents arrive, each
  * is flagged if any LSH band bucket already holds an earlier (lower-id) doc
  * whose signature similarity clears the threshold — the continuous-ingest
  * form of [[graft.operators.Dedup.minHashLshPairs]].
  *
  * Mechanics: docs fan out to their band keys (same fused shingle+signature
  * native expression as batch), `flatMapGroupsWithState` keyed by
  * (band, key) keeps the bucket's earlier (id, sig) entries and emits a
  * [[DupFlag]] per (bucket, doc) against the minimum qualifying earlier id.
  * A doc colliding in several buckets emits several flags — reduce with
  * `groupBy(doc_id).agg(min(dup_of))` downstream (kept OUT of this operator:
  * a second stateful aggregation behind flatMapGroupsWithState needs
  * update/complete semantics; batch or foreachBatch callers just reduce).
  *
  * Equivalence (spec-pinned): the reduced flags equal the batch reduction
  * `minHashLshPairs → groupBy(id_b).agg(min(id_a))` whenever `maxBucket`
  * doesn't bind, independent of batch boundaries — within-batch arrivals
  * are processed in id order, so late-vs-same-batch makes no difference.
  *
  * Scale: state per bucket is (id, sig) pairs capped at `maxBucket`
  * (the streaming mirror of the batch skew guard — a bucket beyond the cap
  * is a flood of one content, and every doc past the cap still flags
  * against the earliest entries; state stops growing). Shuffles carry
  * band keys + signatures, never text. The PER-TRIGGER input of one bucket
  * is bounded too: rows are replayed in id order from a buffer capped at
  * `sortCap` — a one-key flood inside a single trigger does NOT sit in one
  * task's memory. Past the cap the buffer is flushed (sorted, processed)
  * and the remaining rows are processed in arrival order against the
  * already-built entries; they still flag against the earliest entries, but
  * in-batch id-order minimality among post-cap rows degrades — counted in
  * the `graft.streaming_dedup.overflow_rows` accumulator and logged, never
  * silent (same contract as [[graft.operators.SkewGuard]]).
  */
// Serializable: the per-bucket fold closure calls `foldBucket`, capturing
// this (stateless) module in the flatMapGroupsWithState task closure.
object StreamingDedup extends Serializable {

  /** Banded signatures for `docs` (doc_id, text) — shared by the streaming
    * and batch paths so both hash identically. */
  def bandedSigs(docs: DataFrame, shingleN: Int = 3, k: Int = 64,
      bands: Int = 16): Dataset[BandedSig] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        graft.plans.SketchExpressions.minHashShingleSignature(col("toks"), shingleN, k).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(graft.functions.HashFunctions.lshBandKeys(col("sig"), bands, k / bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("sig"))
      .as[BandedSig]
  }

  /** Per-bucket dup flags over a (possibly streaming) banded dataset.
    * Reduce with `groupBy(doc_id).agg(min(dup_of))`.
    *
    * `sortCap` bounds the per-trigger id-order replay buffer of ONE bucket
    * (exactness holds whenever a bucket receives ≤ `sortCap` rows in a
    * trigger; beyond it flags are still emitted, but see the overflow note
    * in the object scaladoc). */
  def nearDupFlags(banded: Dataset[BandedSig], threshold: Double = 0.3,
      maxBucket: Int = 256, sortCap: Int = 8192): Dataset[DupFlag] = {
    import banded.sparkSession.implicits._
    val overflowRows =
      banded.sparkSession.sparkContext.longAccumulator("graft.streaming_dedup.overflow_rows")

    def fold(bucket: (Int, Long), rows: Iterator[BandedSig],
        state: GroupState[BucketEntries]): Iterator[DupFlag] = {
      val prior = state.getOption.getOrElse(BucketEntries(Nil, Nil))
      val (next, flags, over) = foldBucket(prior, rows, threshold, maxBucket, sortCap)
      if (over > 0) {
        overflowRows.add(over)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"streaming_dedup bucket (band=${bucket._1}, key=${bucket._2}): " +
            s"$over rows past sortCap=$sortCap in one trigger were processed " +
            "in arrival order (flags still emitted; in-batch minimality degrades)")
      }
      state.update(next)
      flags.iterator
    }

    banded
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  private[graft] def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / n
  }

  /** One bucket's trigger fold, pure and iterator-bounded: returns the new
    * state, emitted flags, and the count of rows past `sortCap` (processed
    * in arrival order instead of id order). Peak residency is
    * min(input, sortCap) buffered rows + maxBucket state entries. */
  private[graft] def foldBucket(prior: BucketEntries, rows: Iterator[BandedSig],
      threshold: Double, maxBucket: Int, sortCap: Int)
      : (BucketEntries, Seq[DupFlag], Long) = {
    val out = Seq.newBuilder[DupFlag]
    // entries stay ascending by id via sorted insert (robust to a late
    // trigger carrying smaller ids than an earlier one), so the match
    // scan stops at the first id ≥ doc (min qualifying id = first match)
    // and membership is a binary search, not a linear scan.
    val ids = scala.collection.mutable.ArrayBuffer.from(prior.ids)
    val sigs = scala.collection.mutable.ArrayBuffer.from(prior.sigs)

    def process(r: BandedSig): Unit = {
      var best = -1L
      var i = 0
      while (best < 0 && i < ids.length && ids(i) < r.doc_id) {
        if (estJaccard(sigs(i), r.sig) >= threshold) best = ids(i)
        i += 1
      }
      if (best >= 0) out += DupFlag(r.doc_id, best)
      if (ids.length < maxBucket) {
        // binary search for the insertion point; skip exact duplicates
        var lo = 0
        var hi = ids.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ids(mid) < r.doc_id) lo = mid + 1 else hi = mid
        }
        if (lo >= ids.length || ids(lo) != r.doc_id) {
          ids.insert(lo, r.doc_id)
          sigs.insert(lo, r.sig)
        }
      }
    }

    // Bounded id-order replay: buffer up to sortCap rows, then sort and
    // process; rows past the cap process in arrival order (observed).
    val buf = new scala.collection.mutable.ArrayBuffer[BandedSig]
    var flushed = false
    var over = 0L
    for (r <- rows) {
      if (!flushed && buf.length < sortCap) buf += r
      else {
        if (!flushed) {
          buf.sortInPlaceBy(_.doc_id).foreach(process)
          buf.clear()
          flushed = true
        }
        over += 1
        process(r)
      }
    }
    if (!flushed) buf.sortInPlaceBy(_.doc_id).foreach(process)
    (BucketEntries(ids.toSeq, sigs.toSeq), out.result(), over)
  }
}
