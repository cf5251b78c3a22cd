package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving observation: `group` scopes the sketch (one independent
  * sketch per group), `item` is the counted key. Public for Janino. */
case class HHRow(group: String, item: Long, weight: Long)

/** One sketch entry at rest: count is an OVERestimate by at most `err`. */
case class HHEntry(item: Long, count: Long, err: Long)

/** Per-group sketch state. */
case class HHSketch(entries: Seq[HHEntry])

/** Streaming heavy hitters via the Space-Saving sketch (Metwally et al.
  * 2005, public algorithm): per group, track at most `capacity` items; a
  * new item beyond capacity evicts the current minimum and inherits its
  * count as error bound — the classic bounded-state answer to "top
  * contributors per key, forever" where an exact groupBy would hold one
  * counter per distinct item.
  *
  * Guarantees (spec-pinned): counts never UNDERestimate
  * (`count - err <= true <= count`), any item whose true count exceeds the
  * minimum sketch count is present, and with `capacity >= distinct items`
  * the sketch IS the exact counts — which is how the gate checks it
  * against a plain SQL GROUP BY while the eviction path is pinned by spec.
  *
  * Determinism: arrivals fold in the caller-provided order (the epoch fold
  * sorts by item id within a batch; a real stream inherits trigger order);
  * eviction breaks count ties toward the LARGEST item id, so replay is
  * exact.
  *
  * Scale shape: state is O(groups × capacity) — metadata-sized by
  * contract; arrivals shuffle once on the group key. The per-trigger
  * pre-aggregation (groupBy group+item inside the batch) keeps the fold
  * input bounded by distinct-items-per-trigger, not row count.
  */
object StreamingHeavyHitters extends Serializable {

  /** Fold one group's arrivals (item, weight) into the sketch. Pure —
    * shared by the streaming operator and the batch epoch fold.
    *
    * Eviction is O(log n) amortized via a LAZY-DELETION priority queue
    * (a linear min-scan per evicting arrival made the fold O(n·capacity)
    * exactly in the regime the sketch exists for — distinct items ≫
    * capacity; measured 53× at 10× data on the w23 gate, round 14). The
    * queue holds every (count, item) version ever written; a popped
    * version is live iff it still matches the map, so the dequeued live
    * minimum is EXACTLY the old `minBy((count, -item))` victim — same
    * evictions, same tie-break (largest item id), same output order
    * (the LinkedHashMap is untouched as the order-carrying structure). */
  def foldGroup(entries: Seq[HHEntry], arrivals: Seq[(Long, Long)],
      capacity: Int): Seq[HHEntry] = {
    require(capacity > 0, "capacity must be positive")
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    // dequeue priority: smallest count first, ties toward the LARGEST id
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by { case (c, i) => (-c, i) })
    def write(item: Long, count: Long, err: Long): Unit = {
      m(item) = (count, err)
      pq.enqueue((count, item))
    }
    entries.foreach(e => write(e.item, e.count, e.err))
    arrivals.foreach { case (item, w) =>
      m.get(item) match {
        case Some((c, e)) => write(item, c + w, e)
        case None if m.size < capacity => write(item, w, 0L)
        case None =>
          // pop stale versions until the live minimum surfaces
          var evicted = false
          while (!evicted) {
            val (c, i) = pq.dequeue()
            if (m.get(i).exists(_._1 == c)) {
              m.remove(i)
              write(item, c + w, c)
              evicted = true
            }
          }
      }
    }
    m.map { case (i, (c, e)) => HHEntry(i, c, e) }.toSeq
  }

  /** The streaming operator: one Space-Saving sketch per `group`, emitted
    * as a full per-group snapshot each trigger (Update mode semantics —
    * downstream keeps the latest snapshot per group). `tagged` must carry
    * the [[HHRow]] columns; arrivals within a trigger fold in (item)
    * order so replay is deterministic. */
  def sketchStream(tagged: Dataset[HHRow], capacity: Int): Dataset[(String, HHEntry)] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.group)
      .flatMapGroupsWithState[HHSketch, (String, HHEntry)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group, it, state: GroupState[HHSketch]) =>
          val arrivals = it.toSeq.groupBy(_.item).view
            .mapValues(_.map(_.weight).sum).toSeq.sortBy(_._1)
          val prior = state.getOption.map(_.entries).getOrElse(Nil)
          val next = foldGroup(prior, arrivals, capacity)
          state.update(HHSketch(next))
          next.map(group -> _).iterator
      }
  }

  /** Batch epoch-fold replay: rows arrive in `_epoch` order; within each
    * epoch a group's arrivals pre-aggregate and fold in item order —
    * exactly the per-trigger semantics of [[sketchStream]]. Returns the
    * final sketch relation (group, item, count, err). */
  def sketchFold(taggedWithEpoch: DataFrame, capacity: Int,
      nEpochs: Int): DataFrame = {
    val spark = taggedWithEpoch.sparkSession
    import spark.implicits._
    var state = spark.emptyDataset[(String, HHEntry)]
    for (e <- 0 until nEpochs) {
      val arrivals = taggedWithEpoch.filter(col("_epoch") === e)
        .groupBy("group", "item").agg(sum("weight").as("weight"))
        .as[(String, Long, Long)]
      val prior = state
      state = prior.map(s => (s._1, s._2.item, s._2.count, s._2.err, true))
        .union(arrivals.map(a => (a._1, a._2, a._3, 0L, false)))
        .groupByKey(_._1)
        .flatMapGroups { (group, it) =>
          val rows = it.toSeq
          val prior = rows.filter(_._5)
            .map(r => HHEntry(r._2, r._3, r._4))
          // prior entry order is part of sketch state: re-sort by (count
          // desc, item) for a canonical fold base
          val canon = prior.sortBy(p => (-p.count, p.item))
          val arr = rows.filterNot(_._5).map(r => (r._2, r._3)).sortBy(_._1)
          foldGroup(canon, arr, capacity).map(group -> _).iterator
        }
        .localCheckpoint(true)
    }
    state.map(s => (s._1, s._2.item, s._2.count, s._2.err))
      .toDF("group", "item", "count", "err")
  }
}
