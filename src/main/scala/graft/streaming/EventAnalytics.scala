package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the engine's event streams — the
  * additive analytics surface on top of reference parity (SURVEY.md §2.6:
  * the reference has no event-time processing; these are the operators a
  * training-data/metrics pipeline adds).
  *
  * All operators work on any DataFrame with an event-time `ts` column —
  * batch or streaming — so each has an oracle-checkable batch twin.
  *
  * Scale: state size is the design constraint. Watermarks bound every
  * stateful operator (windows/dedup state evicted at watermark; sessions
  * time out at watermark + gap), so state is O(active keys), not O(history).
  */
object EventAnalytics {

  /** Tumbling-window counts/sums with watermark-bounded state. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window rate (events/min over the last `windowDur`, emitted per
    * `slideDur`). */
  def slidingRate(events: DataFrame, windowDur: String = "10 minutes",
      slideDur: String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur).as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"), col("n"))

  /** Stream-stream interval join: right rows matched to left rows with the
    * same key where `rightTs ∈ [leftTs, leftTs + maxDelay]` — e.g. "the
    * purchases within 30 minutes after each click". In streaming mode this
    * is Spark's watermarked stream-stream inner join: the time-bound
    * condition lets the engine evict left state past
    * `watermark + maxDelay` and right state past `watermark`, so state is
    * bounded by the delay window, not the stream. In batch mode the same
    * plan runs over static frames (the w4 batch twin) — there the binned
    * form ([[graft.operators.Joins.rangeJoin]]) is the scale path; here the
    * key equality already hash-partitions the join. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "ts",
      maxDelay: String = "30 minutes", watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark) else left)
      .alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark) else right)
      .alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL '$maxDelay'"),
      joinType)
  }

  /** Attribution join: every left row (click) paired with the right rows
    * (purchases) that follow it within `maxDelay` — LEFT OUTER, so
    * unconverted clicks survive with a NULL right side. In streaming mode
    * this is Spark's watermarked outer stream-stream join: matched pairs
    * emit eagerly, while the null row for an unmatched click emits only
    * once the watermark proves no purchase can still arrive (left state
    * held to watermark + maxDelay — bounded by the delay window, not the
    * stream). Batch mode runs the identical plan over static frames (the
    * w15 twin picks the FIRST purchase per click on top of this).
    *
    * Column collision note: both sides keep their own `key`/ts under the
    * `l`/`r` aliases; callers select with qualified names. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "ts",
      maxDelay: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    intervalJoin(clicks, purchases, key, leftTs, rightTs, maxDelay, watermark,
      joinType = "left_outer")

  /** Stream-static enrichment: events joined to a slowly-changing dimension
    * table, then windowed per enriched attribute — "hourly revenue by
    * customer segment". The dimension side is BROADCAST (stream-static
    * joins re-read the static side per micro-batch; broadcasting keeps the
    * stream side shuffle-free so the only exchange is the windowed agg's),
    * and at 100 TB/day of events the dimension is still customer-sized —
    * the broadcast is the right plan at every scale. Works identically in
    * batch mode (the w6 oracle twin). */
  def enrichedWindowedRevenue(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String, attr: String,
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val e = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    e.join(broadcast(dim.select(col(dimKey).as(eventKey), col(attr))), eventKey)
      .groupBy(window(col("ts"), windowDur).as("win"), col(attr))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("win.start").as("window_start"), col(attr), col("n"),
        col("total_value"))
  }

  /** Streaming exact dedup: first occurrence per key set wins; duplicate
    * arrivals inside the watermark horizon are dropped, state evicted past
    * it. Batch mode falls back to plain dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)
  case class SessionBuf(startMs: Long, endMs: Long, n: Long, sumValue: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives for `gapMs` (event time). Emits closed
    * sessions in Append mode; open sessions are held as per-user state and
    * closed by event-time timeout at watermark + gap. */
  def sessionize(events: Dataset[Ev], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._

    def fold(userId: Long, evs: Iterator[Ev],
        state: GroupState[SessionBuf]): Iterator[UserSession] = {
      val closed = Seq.newBuilder[UserSession]
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          closed += UserSession(userId, new java.sql.Timestamp(s.startMs),
            new java.sql.Timestamp(s.endMs), s.n, math.round(s.sumValue * 100) / 100.0)
        }
        state.remove()
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption.orNull
        for (e <- sorted) {
          val t = e.ts.getTime
          if (cur == null) cur = SessionBuf(t, t, 1, e.value)
          else if (t - cur.endMs <= gapMs)
            cur = SessionBuf(cur.startMs, math.max(cur.endMs, t), cur.n + 1, cur.sumValue + e.value)
          else {
            closed += UserSession(userId, new java.sql.Timestamp(cur.startMs),
              new java.sql.Timestamp(cur.endMs), cur.n, math.round(cur.sumValue * 100) / 100.0)
            cur = SessionBuf(t, t, 1, e.value)
          }
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.endMs + gapMs)
        }
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Streaming funnel state: current stage index (0-based into `steps`),
    * the step-0 anchor, and the last advanced step's event time. PUBLIC:
    * Janino codegen cannot access private case-class accessors. */
  case class FunnelProgress(stage: Int, t0Ms: Long, lastMs: Long)

  /** One user's funnel outcome: emitted on completion of the last step, or
    * at event-time timeout when the conversion window expires un-completed
    * (so abandonment is observable, not silent). */
  case class FunnelOutcome(user_id: Long, stage_reached: Int,
      t0: java.sql.Timestamp, t_last: java.sql.Timestamp, completed: Boolean)

  /** Streaming twin of [[funnel]]: per-user ordered-step state machine via
    * `flatMapGroupsWithState`, one O(1) record of state per in-flight user
    * (stage + two timestamps — never the event history). Events are applied
    * in event-time order within each micro-batch; a completed funnel emits
    * immediately and resets (the user can convert again), an expired one
    * emits `completed = false` at watermark past t0 + window.
    *
    * Equivalence to the batch chained-min semantics holds for event-time-
    * ordered arrival (spec-pinned); an out-of-order event delivered in a
    * LATER micro-batch that would have advanced a stage earlier is not
    * retro-applied — the monotone-state trade every O(1)-state streaming
    * funnel makes (the alternative, buffering the full per-user window,
    * is O(history) state). */
  def funnelStream(events: Dataset[Ev], steps: Seq[String], windowMs: Long,
      watermark: String = "10 minutes"): Dataset[FunnelOutcome] = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    import events.sparkSession.implicits._

    def fold(userId: Long, evs: Iterator[Ev],
        state: GroupState[FunnelProgress]): Iterator[FunnelOutcome] = {
      val out = Seq.newBuilder[FunnelOutcome]
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          out += FunnelOutcome(userId, s.stage,
            new java.sql.Timestamp(s.t0Ms), new java.sql.Timestamp(s.lastMs),
            completed = false)
        }
        state.remove()
      } else {
        var s = state.getOption.orNull
        for (e <- evs.toSeq.sortBy(_.ts.getTime)) {
          val t = e.ts.getTime
          if (s == null) {
            if (e.event_type == steps.head) s = FunnelProgress(0, t, t)
          } else if (s.stage < steps.size - 1 &&
              e.event_type == steps(s.stage + 1) &&
              t > s.lastMs && t <= s.t0Ms + windowMs) {
            s = FunnelProgress(s.stage + 1, s.t0Ms, t)
            if (s.stage == steps.size - 1) {
              out += FunnelOutcome(userId, s.stage,
                new java.sql.Timestamp(s.t0Ms), new java.sql.Timestamp(t),
                completed = true)
              s = null // reset: the next step-0 event starts a fresh funnel
            }
          }
        }
        if (s != null) {
          state.update(s)
          // timeout must sit at/after the current watermark or Spark rejects
          // it; an already-expired window times out on the next trigger
          state.setTimeoutTimestamp(
            math.max(s.t0Ms + windowMs, state.getCurrentWatermarkMs() + 1))
        } else state.remove()
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Batch twin of [[sessionize]] — identical gap semantics via window
    * functions, used as the oracle for the stateful path. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val tsMs = unix_millis(col("ts"))
    val newSession = when(
      tsMs - lag(tsMs, 1).over(byUser) > gapMs || lag(tsMs, 1).over(byUser).isNull, 1
    ).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .drop("session_id")
  }

  /** Ordered funnel: per-user earliest completion of each step in sequence,
    * where step i must happen strictly after step i-1 and the whole funnel
    * within `windowDays` of the step-0 event. Returns one row per stage:
    * (stage_idx, stage, users reaching it).
    *
    * Shape chosen for scale: one chained min-aggregation per step — each is
    * a map-side-combinable min over events pre-filtered to ONE event type
    * (filter pushed to the scan), joined on user_id. A power user with 10^8
    * events costs nothing special: no per-user collect_list materializes
    * their history, the min combines partially in every task. steps.length
    * shuffles of |users| rows each, vs. the sort-within-user alternative's
    * full-history shuffle. */
  def funnel(events: DataFrame, steps: Seq[String], windowDays: Int = 7): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stage 0 anchors the conversion window
    val s0 = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t0"))
    val perStage = steps.indices.drop(1).scanLeft(s0) { (prev, i) =>
      val prevTs = if (i == 1) "t0" else s"t${i - 1}"
      events.filter(col("event_type") === steps(i))
        .select(col("user_id"), col("ts").as("cand"))
        .join(prev, "user_id")
        .filter(col("cand") > col(prevTs) &&
          col("cand") <= col("t0") + expr(s"INTERVAL $windowDays DAYS"))
        .groupBy((col("user_id") +: (0 until i).map(j => col(s"t$j"))): _*)
        .agg(min("cand").as(s"t$i"))
    }
    perStage.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i).as("stage_idx"), lit(steps(i)).as("stage"), col("users"))
    }.reduce(_.unionAll(_))
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * requested day offset, how many are active again exactly that many days
    * later. Two combinable aggregations (per-user first day; distinct
    * (user, day)) and one user-keyed join — no window functions, no
    * full-history state, safe at any user skew. */
  def retentionCohorts(events: DataFrame, offsets: Seq[Int]): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activeDays = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    firstDay.join(activeDays, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset").isin(offsets.map(Int.box): _*))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("retained"))
  }

  /** Most frequent length-`n` per-user event-type sequences ("paths"),
    * top `k` by count (ties broken by path text for determinism). One
    * window shuffle on user_id (ts, event_id ordering makes equal
    * timestamps deterministic), then a combinable count and a
    * TakeOrderedAndProject top-k — no global sort materializes. */
  def topEventPaths(events: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = col("event_type") +:
      (1 until n).map(i => lead(col("event_type"), i).over(w))
    val withPath = events
      .withColumn("path", concat_ws(">", steps: _*))
      // lead() past the user's last event is null; concat_ws drops nulls, so
      // an incomplete tail path has fewer separators — filter by arity
      .filter(size(split(col("path"), ">")) === n)
    withPath.groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path")).limit(k)
  }

  /** Per-key time-grid resample with forward fill ("gap fill"): one row per
    * (`user_id`, hour) over each user's active span, carrying the last
    * observed `value` forward across hours with no events — the standard
    * regularization step before any fixed-step time-series model or
    * rate-of-change metric.
    *
    * Shape: (1) one hash aggregation buckets observations to the grain and
    * picks the in-bucket survivor deterministically (`max_by` on
    * (ts, event_id) — last write wins, id-tie-broken); (2) a second
    * aggregation derives each user's [first, last] bucket span — |users|
    * rows; (3) the dense grid is GENERATED per user via
    * `sequence`+`explode`, never materialized on the driver, and
    * equi-joins the observations on (user, bucket); (4) forward fill is
    * `last(ignoreNulls)` over a user-partitioned window — Spark sorts
    * within each user's partition only, so the fill parallelizes across
    * users and no global sort exists. Grid size is bounded by
    * span/grain per user; the first bucket of every span is observed by
    * construction, so `value_filled` is never null.
    *
    * 100 TB note: the only all-rows shuffle is the bucket aggregation,
    * which combines map-side to one partial per (user, bucket). The window
    * operates on the already-reduced grid (users × span-hours), not on raw
    * events. */
  def gapFill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id")))
        .as("obs_value"))
    val spans = events.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
        .as("bucket"))
    val w = Window.partitionBy("user_id").orderBy("bucket")
    grid.join(bucketed, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value_filled"),
        col("obs_value").isNotNull.as("is_observed"))
  }
}
