package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-sequence funnel — the live twin of
  * `graft.ops.Analytics.funnelUsers` (reference analogue: the capture
  * loop's per-session progress accounting, `scenario.py:238-274`, done
  * per-user and in order).
  *
  * State per user is exactly k longs — one running stage-completion
  * time per configured stage (product funnels run 3 to 8 stages; the
  * machine takes any k ≥ 2) — updated by replaying each micro-batch's
  * events in event-time order, identical to the batch window's chained
  * running minimums, so a funnel over 10⁹ users runs at constant memory
  * per key and the nightly batch recompute agrees row-for-row. Stage
  * times only ever DECREASE (running minimums), so emitting on change
  * in Update mode is monotone-safe for downstream consumers.
  *
  * Ordering contract: within a micro-batch events sort by (ts_us,
  * event_id); ACROSS batches arrival order must respect event-time order
  * per user (true for per-key ordered sources; otherwise a late view
  * cannot retroactively admit an earlier-timestamped click — recover
  * those with the batch recompute, which is order-free).
  */
object Funnel {

  case class FEvent(user_id: Long, event_id: Long, event_type: String, ts_us: Long)
  /** [[FEvent]] plus its event-time column for the watermark. */
  case class FEventTs(user_id: Long, event_id: Long, event_type: String,
                      ts_us: Long, ts: java.sql.Timestamp)
  /** `s(i)` = running completion time of stage i+1, Long.MaxValue =
    * stage not reached; `lastUs` = the user's newest event time, the
    * anchor the idle-expiry timer re-arms from.
    */
  case class FState(s: Seq[Long], lastUs: Long = 0L)
  /** Per-stage completion times, None = not reached; `us(i)` is stage
    * i+1 (the batch funnel's `u{i+1}` column as one array).
    */
  case class FOut(user_id: Long, us: Seq[Option[Long]])

  private def opt(v: Long): Option[Long] = if (v == Long.MaxValue) None else Some(v)

  /** Fold one user's micro-batch through the stage machine. Emits the
    * user's updated stage times when (and only when) the batch advanced
    * the funnel. On idle timeout the user's state is dropped: the key
    * population of an unbounded stream grows without bound, so a user
    * that has gone quiet for `idleTimeoutMs` leaves the store — their
    * last emitted row already carries their funnel position, and a
    * late return is recovered by the order-free batch recompute.
    */
  def updateKey(userId: Long, events: Iterator[FEventTs],
                state: GroupState[FState], stages: Seq[String],
                idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Iterator[FOut] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val k = stages.size
    val init = state.getOption.getOrElse(FState(Seq.fill(k)(Long.MaxValue)))
    // a checkpoint carrying a DIFFERENT stage count must fail loudly,
    // not index out of bounds or silently misalign stages
    require(init.s.size == k,
      s"funnel restarted with $k stages over state built for ${init.s.size} — " +
        "recompute from batch instead of reusing the checkpoint")
    val s = init.s.toArray
    var lastUs = init.lastUs
    val stageOf = stages.zipWithIndex.toMap
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      lastUs = math.max(lastUs, e.ts_us)
      stageOf.get(e.event_type).foreach { i =>
        if (i == 0) s(0) = math.min(s(0), e.ts_us)
        else if (e.ts_us > s(i - 1)) s(i) = math.min(s(i), e.ts_us)
      }
    }
    // idle expiry anchors on the user's newest EVENT time and fires when
    // the watermark passes it (never on wall-clock — no empty-batch
    // polling, deterministic replays); the timer must land strictly
    // beyond the current watermark or the state store rejects it
    def arm(): Unit = state.setTimeoutTimestamp(
      math.max(lastUs / 1000L + idleTimeoutMs, state.getCurrentWatermarkMs + 1))
    if (s.toSeq == init.s) {
      // keep the reaper's anchor current even on a no-progress batch
      if (state.exists) {
        if (lastUs != init.lastUs) state.update(init.copy(lastUs = lastUs))
        arm()
      }
      Iterator.empty
    } else {
      state.update(FState(s.toSeq, lastUs))
      arm()
      Iterator.single(FOut(userId, s.map(opt).toSeq))
    }
  }

  /** Conversion-window state: `l(j)` = LATEST stage-(j+1) conversion so
    * far (the re-arming anchor, Long.MinValue = none), `u(j)` = FIRST
    * conversion time (Long.MaxValue = none) — 2k longs per user.
    */
  case class WState(l: Seq[Long], u: Seq[Long], lastUs: Long = 0L)

  /** Streaming twin of `Analytics.funnelUsersWindowed` (§2b 28ac''): a
    * stage-j event converts iff the LATEST stage-(j−1) conversion so far
    * is strictly earlier and at most `windowUs` before it, and the
    * anchor RE-ARMS on every later previous-stage conversion — exactly
    * the batch chained-running-max rule, folded per arrival. Emits the
    * user's first-conversion times on progress (they only decrease —
    * Update-monotone like [[updateKey]]); same ordering contract and
    * idle reaper. After an in-order replay the final emission per user
    * equals the batch operator row-for-row (spec-asserted).
    */
  def updateKeyWindowed(userId: Long, events: Iterator[FEventTs],
                        state: GroupState[WState], stages: Seq[String],
                        windowUs: Long,
                        idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Iterator[FOut] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val k = stages.size
    val init = state.getOption.getOrElse(
      WState(Seq.fill(k)(Long.MinValue), Seq.fill(k)(Long.MaxValue)))
    require(init.l.size == k && init.u.size == k,
      s"windowed funnel restarted with $k stages over state built for ${init.l.size} — " +
        "recompute from batch instead of reusing the checkpoint")
    val l = init.l.toArray
    val u = init.u.toArray
    var lastUs = init.lastUs
    val stageOf = stages.zipWithIndex.toMap
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      lastUs = math.max(lastUs, e.ts_us)
      stageOf.get(e.event_type).foreach { i =>
        if (i == 0) {
          l(0) = math.max(l(0), e.ts_us)
          u(0) = math.min(u(0), e.ts_us)
        } else if (l(i - 1) != Long.MinValue && e.ts_us > l(i - 1) &&
                   e.ts_us - l(i - 1) <= windowUs) {
          l(i) = math.max(l(i), e.ts_us)
          u(i) = math.min(u(i), e.ts_us)
        }
      }
    }
    def arm(): Unit = state.setTimeoutTimestamp(
      math.max(lastUs / 1000L + idleTimeoutMs, state.getCurrentWatermarkMs + 1))
    if (u.toSeq == init.u) {
      // anchors may have re-armed without a new conversion — persist them
      // (they gate FUTURE stages) but emit nothing
      if (state.exists || l.toSeq != init.l) {
        state.update(WState(l.toSeq, u.toSeq, lastUs))
        arm()
      }
      Iterator.empty
    } else {
      state.update(WState(l.toSeq, u.toSeq, lastUs))
      arm()
      Iterator.single(FOut(userId, u.map(opt).toSeq))
    }
  }

  /** Wire the conversion-window machine over a (possibly streaming)
    * event set — [[stages]]'s windowed sibling.
    */
  def stagesWindowed(events: Dataset[FEvent], windowUs: Long,
                     stageNames: Seq[String] = Seq("view", "click", "purchase"),
                     idleTimeoutMs: Long = 30L * 24 * 3600 * 1000,
                     lateness: String = "1 hour")
                    (implicit spark: SparkSession): Dataset[FOut] = {
    require(stageNames.size >= 2, "a funnel needs at least two stages")
    require(stageNames.distinct == stageNames, "funnel stages must be distinct")
    require(windowUs > 0)
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    events.withColumn("ts", expr("timestamp_micros(ts_us)"))
      .as[FEventTs]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[FEventTs], st: GroupState[WState]) =>
          updateKeyWindowed(k, it, st, stageNames, windowUs, idleTimeoutMs))
  }

  /** Wire the stage machine over a (possibly streaming) event set; the
    * watermark rides the event time (`lateness` of allowed disorder
    * across batches) and drives the idle-expiry timers.
    */
  def stages(events: Dataset[FEvent],
             stageNames: Seq[String] = Seq("view", "click", "purchase"),
             idleTimeoutMs: Long = 30L * 24 * 3600 * 1000,
             lateness: String = "1 hour")
            (implicit spark: SparkSession): Dataset[FOut] = {
    require(stageNames.size >= 2, "a funnel needs at least two stages")
    require(stageNames.distinct == stageNames, "funnel stages must be distinct")
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    events.withColumn("ts", expr("timestamp_micros(ts_us)"))
      .as[FEventTs]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[FEventTs], st: GroupState[FState]) =>
          updateKey(k, it, st, stageNames, idleTimeoutMs))
  }
}
