package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One buffered/arriving row of the streaming as-of join — a left probe
  * (`is_left`, `v` unused) or a right quote (`id`/`v` = payload). Times are
  * epoch millis. Public: Janino codegen needs visible accessors. */
case class AsofRow(key: Long, is_left: Boolean, t: Long, id: Long, v: Double)

/** Buffered per-key state: pending lefts + candidate rights. */
case class AsofBuf(rows: Seq[AsofRow])

/** A finalized as-of match (right side null ⇒ no right row at-or-before). */
case class AsofMatch(left_id: Long, key: Long, ltime: Long,
    right_id: Option[Long], rtime: Option[Long], rval: Option[Double])

/** Stream-STREAM backward as-of join: every left row matches the right row
  * with the largest `(rtime, rid) <= (ltime, ·)` on the same key — the
  * continuous form of [[graft.operators.Joins.asofBackward]] ("enrich each
  * event with the latest quote/dimension snapshot at or before it") when
  * BOTH sides arrive incrementally.
  *
  * Mechanics: both inputs are tagged into one [[AsofRow]] stream,
  * `flatMapGroupsWithState` keyed by the join key buffers arrivals and
  * finalizes a left row exactly when the event-time watermark passes its
  * timestamp — at that point every right row at-or-before it has either
  * arrived or is late by the watermark contract, so the match is stable
  * (emit-once append semantics; no retractions needed). An event-time
  * timeout wakes keys whose pending lefts age past the watermark without
  * new arrivals.
  *
  * State is bounded by the out-of-order horizon, not the stream length:
  * pending lefts sit only until the watermark passes them, and of the
  * rights at-or-before the watermark only the LATEST survives — any older
  * right is dominated for every future left (future lefts have
  * `ltime >= watermark`), and rights beyond the watermark are capped by the
  * delay window. Per-key state is O(rows inside the watermark lag).
  *
  * Equivalence (spec-pinned and gate-checked via [[asofFold]]): when
  * arrivals respect the watermark (nothing late), the emitted matches equal
  * the batch `asofBackward` exactly, independent of how rows split into
  * triggers — including the tie rule (equal `rtime` ⇒ largest `rid` wins).
  * Late rights are dropped by the watermark filter upstream in a real
  * stream; [[foldKey]] never sees them.
  */
object StreamingAsof extends Serializable {

  /** Fold one key's buffered+arriving rows against the watermark: emit a
    * match for every left with `ltime <= wm` (rights complete by the
    * watermark contract), keep lefts beyond the watermark, and keep rights
    * beyond the watermark plus the single dominating right at-or-before it.
    * Pure — shared verbatim by the streaming operator and the batch epoch
    * fold, so the two cannot drift. */
  def foldKey(rows: Seq[AsofRow], wm: Long): (Seq[AsofMatch], Seq[AsofRow]) = {
    val (lefts, rights) = rows.partition(_.is_left)
    // (rtime, rid) ascending — the last qualifying element is the winner
    val rs = rights.sortBy(r => (r.t, r.id)).toIndexedSeq
    val (due, pendingLefts) = lefts.partition(_.t <= wm)
    val matches = due.sortBy(l => (l.t, l.id)).map { l =>
      // binary search: last right with rtime <= ltime (ties: largest rid)
      var lo = 0; var hi = rs.length - 1; var best = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (rs(mid).t <= l.t) { best = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (best < 0) AsofMatch(l.id, l.key, l.t, None, None, None)
      else {
        val r = rs(best)
        AsofMatch(l.id, l.key, l.t, Some(r.id), Some(r.t), Some(r.v))
      }
    }
    val (futureRights, passedRights) = rs.partition(_.t > wm)
    // among rights at-or-before the watermark only the latest can still win
    val keepPassed = if (passedRights.isEmpty) Nil else Seq(passedRights.last)
    (matches, pendingLefts ++ futureRights ++ keepPassed)
  }

  /** The streaming operator. `tagged` must carry the [[AsofRow]] columns
    * PLUS a TIMESTAMP column derived from `t` with an event-time watermark
    * already applied (`withColumn("ts", timestamp_millis($"t"))
    * .withWatermark("ts", delay)`) — the caller owns the delay choice, and
    * the watermarked column must stay in the plan for the event-time
    * timeout to resolve (projecting it away detaches the watermark).
    * Append-mode output. */
  def asofStream(tagged: DataFrame): Dataset[AsofMatch] = {
    import tagged.sparkSession.implicits._
    tagged.as[AsofRow].groupByKey(_.key)
      .flatMapGroupsWithState[AsofBuf, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[AsofBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val buffered = state.getOption.map(_.rows).getOrElse(Nil)
          val (out, keep) = foldKey(buffered ++ it.toSeq, wm)
          if (keep.isEmpty) state.remove()
          else {
            state.update(AsofBuf(keep))
            // wake when the watermark reaches the oldest pending left
            val pendingL = keep.filter(_.is_left)
            if (pendingL.nonEmpty)
              state.setTimeoutTimestamp(math.max(pendingL.map(_.t).min, wm + 1))
          }
          out.iterator
      }
  }

  /** Batch epoch-fold replay of the streaming semantics: rows arrive in
    * `_epoch`-column order, after epoch `e` the watermark advances to
    * `wmForEpoch(e)`, and a final `Long.MaxValue` flush drains pending
    * state — exactly the per-trigger fold of [[asofStream]], so when the
    * epoch slicing respects the watermark the result equals batch
    * `asofBackward` (the a5 gate pins this against the a1 oracle SQL).
    *
    * Distributed shape: each epoch is one key shuffle of
    * (state ∪ arrivals) into `flatMapGroups` running [[foldKey]]; state
    * rides as [[AsofRow]]s (same relation shape as arrivals), eagerly
    * `localCheckpoint`ed per epoch so plans stay flat and codegen-cached
    * across epochs (the w7 lesson). */
  def asofFold(taggedWithEpoch: DataFrame, nEpochs: Int,
      wmForEpoch: Int => Long): Dataset[AsofMatch] = {
    val spark = taggedWithEpoch.sparkSession
    import spark.implicits._
    val withEpoch = taggedWithEpoch
    var state = spark.emptyDataset[AsofRow]
    var out = spark.emptyDataset[AsofMatch]
    val wms = (0 until nEpochs).map(wmForEpoch) :+ Long.MaxValue
    for (e <- 0 to nEpochs) {
      val arrivals =
        if (e < nEpochs)
          withEpoch.filter(col("_epoch") === e).drop("_epoch").as[AsofRow]
        else spark.emptyDataset[AsofRow]
      val wm = wms(e)
      val folded = state.union(arrivals)
        .groupByKey(_.key)
        .flatMapGroups { (_, it) =>
          val (matches, keep) = foldKey(it.toSeq, wm)
          matches.map(m => (false, m, AsofRow(0L, false, 0L, 0L, 0.0))).iterator ++
            keep.map(k => (true, AsofMatch(0L, 0L, 0L, None, None, None), k))
        }
        .localCheckpoint(true)
      out = out.union(folded.filter(!_._1).map(_._2))
      state = folded.filter(_._1).map(_._3)
    }
    out
  }
}
