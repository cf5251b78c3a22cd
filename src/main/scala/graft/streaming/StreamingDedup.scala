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
  * band keys + signatures, never text.
  */
object StreamingDedup {

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
    * Reduce with `groupBy(doc_id).agg(min(dup_of))`. */
  def nearDupFlags(banded: Dataset[BandedSig], threshold: Double = 0.3,
      maxBucket: Int = 256): Dataset[DupFlag] = {
    import banded.sparkSession.implicits._

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
      var m = 0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / n
    }

    def fold(bucket: (Int, Long), rows: Iterator[BandedSig],
        state: GroupState[BucketEntries]): Iterator[DupFlag] = {
      val out = Seq.newBuilder[DupFlag]
      var entries = state.getOption.getOrElse(BucketEntries(Nil, Nil))
      // id order inside the batch ⇒ batch boundaries can't change results
      for (r <- rows.toSeq.sortBy(_.doc_id)) {
        var best = -1L
        var i = 0
        while (i < entries.ids.length && best < 0) { // entries ascend by id
          if (entries.ids(i) < r.doc_id &&
            estJaccard(entries.sigs(i), r.sig) >= threshold) best = entries.ids(i)
          i += 1
        }
        if (best >= 0) out += DupFlag(r.doc_id, best)
        if (entries.ids.length < maxBucket && !entries.ids.contains(r.doc_id))
          entries = BucketEntries(entries.ids :+ r.doc_id, entries.sigs :+ r.sig)
      }
      state.update(entries)
      out.result().iterator
    }

    banded
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
