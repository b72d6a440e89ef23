package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multi-touch attribution — the live twin of
  * `graft.ops.Analytics.attributionPairs` (reference analogue: deciding,
  * at capture time, which upstream topic activity "caused" each saved
  * document instead of re-joining the whole log nightly).
  *
  * State per user is the touch buffer inside the lookback window —
  * bounded by touch-rate × `windowUs` regardless of history length
  * (every arrival evicts touches too old to credit ANY future
  * conversion), which is the same bound the batch join's per-conversion
  * fan-in has. Each conversion's credited pairs are emitted exactly once,
  * at the conversion (they can never be revised: later events can't
  * change a past conversion's in-window touch set under the ordering
  * contract), so Update-mode consumers see append-only rows.
  *
  * Ordering contract (the funnel machine's): within a micro-batch events
  * sort by (ts_us, event_id); ACROSS batches arrival order must respect
  * event-time order per user. A late touch cannot retroactively credit
  * an earlier-emitted conversion — recover those with the order-free
  * batch recompute.
  */
object Attribution {

  case class AEvent(user_id: Long, event_id: Long, event_type: String, ts_us: Long)
  /** [[AEvent]] plus its event-time column for the watermark. */
  case class AEventTs(user_id: Long, event_id: Long, event_type: String,
                      ts_us: Long, ts: java.sql.Timestamp)
  case class Touch(channel: String, touch_id: Long, touch_ts: Long)
  /** `touches` is ts-ascending (events fold in order); `lastUs` anchors
    * the idle-expiry timer.
    */
  case class AState(touches: Seq[Touch], lastUs: Long = 0L)
  /** One credited (conversion, touch) pair — the batch operator's join
    * row, with the same linear-decay weight `w = windowUs − Δt + 1`.
    */
  case class Credit(user_id: Long, conv_id: Long, conv_ts: Long,
                    channel: String, touch_id: Long, touch_ts: Long, w: Long)

  /** Fold one user's micro-batch through the touch buffer. Touch events
    * append; a conversion emits one [[Credit]] per buffered touch
    * strictly before it and within the window. Every arrival first
    * drops touches older than `windowUs` before the CURRENT event time
    * — they cannot credit any future conversion (future conversions are
    * no earlier than the current event under the ordering contract) —
    * so the buffer never outgrows the window. On idle timeout the key
    * leaves the store; a returning user's first window is recovered by
    * the batch recompute (documented divergence, same as the funnel).
    */
  def updateKey(userId: Long, events: Iterator[AEventTs],
                state: GroupState[AState], windowUs: Long,
                touchTypes: Set[String], convType: String,
                idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Iterator[Credit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val init = state.getOption.getOrElse(AState(Seq.empty))
    var buf = init.touches.toVector
    var lastUs = init.lastUs
    val out = Vector.newBuilder[Credit]
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      lastUs = math.max(lastUs, e.ts_us)
      buf = buf.dropWhile(t => e.ts_us - t.touch_ts > windowUs)
      if (touchTypes(e.event_type)) {
        buf :+= Touch(e.event_type, e.event_id, e.ts_us)
      } else if (e.event_type == convType) {
        buf.foreach { t =>
          if (t.touch_ts < e.ts_us)
            out += Credit(userId, e.event_id, e.ts_us, t.channel, t.touch_id,
              t.touch_ts, windowUs - (e.ts_us - t.touch_ts) + 1L)
        }
      }
    }
    val credits = out.result()
    if (state.exists || buf.nonEmpty) {
      state.update(AState(buf, lastUs))
      // event-time idle reaper (the funnel's round-8 pattern): anchor at
      // the newest event, land strictly beyond the current watermark
      state.setTimeoutTimestamp(
        math.max(lastUs / 1000L + idleTimeoutMs, state.getCurrentWatermarkMs + 1))
    }
    credits.iterator
  }

  case class JEvent(user_id: Long, event_id: Long, event_type: String,
                    value: Double, ts_us: Long)
  /** [[JEvent]] plus its event-time column for the watermark. */
  case class JEventTs(user_id: Long, event_id: Long, event_type: String,
                      value: Double, ts_us: Long, ts: java.sql.Timestamp)
  /** One journey-transition partial count — additive, so per-batch
    * partials merge to the exact batch matrix. */
  case class Trans(src: String, dst: String, n: Long)
  /** `touches` = the in-window buffer (converting journeys);
    * `prev`/`acc` = the incremental NON-converter journey (prev channel
    * + accumulated transition counts — bounded by (C+1)², never by
    * history length); `converted` permanently retires the non-converter
    * half (a user with any qualifying conversion has no NULLS journey).
    */
  case class JState(touches: Seq[Touch], prev: String, acc: Seq[Trans],
                    converted: Boolean, lastUs: Long)

  private def bump(acc: Seq[Trans], src: String, dst: String): Seq[Trans] = {
    val i = acc.indexWhere(t => t.src == src && t.dst == dst)
    if (i < 0) acc :+ Trans(src, dst, 1L)
    else acc.updated(i, acc(i).copy(n = acc(i).n + 1L))
  }

  /** Fold one user's micro-batch through the journey machine — the live
    * twin of `Analytics.markovTransitions`. A qualifying conversion
    * (type + value ≥ `convValue`) with a non-empty in-window buffer
    * emits its journey's transition counts exactly once, at the
    * conversion (START → touches in time order → CONV — the batch
    * definition verbatim). Touch arrivals additionally advance the
    * incremental non-converter journey, which is emitted ONLY on idle
    * timeout and only if no conversion ever happened (the batch
    * "touches but never converts" absorber, with idleness standing in
    * for the corpus frontier — the funnel's documented divergence: a
    * reaped key that returns restarts, recover with the batch
    * recompute). Same ordering contract as [[updateKey]].
    */
  def journeyKey(userId: Long, events: Iterator[JEventTs],
                 state: GroupState[JState], windowUs: Long,
                 touchTypes: Set[String], convType: String,
                 convValue: Double,
                 idleTimeoutMs: Long = 30L * 24 * 3600 * 1000): Iterator[Trans] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      return (if (!st.converted && st.prev.nonEmpty)
        bump(st.acc, st.prev, "NULLS").iterator else Iterator.empty)
    }
    val init = state.getOption.getOrElse(
      JState(Seq.empty, "", Seq.empty, converted = false, 0L))
    var buf = init.touches.toVector
    var prev = init.prev
    var acc = init.acc
    var converted = init.converted
    var lastUs = init.lastUs
    val out = Vector.newBuilder[Trans]
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      lastUs = math.max(lastUs, e.ts_us)
      buf = buf.dropWhile(t => e.ts_us - t.touch_ts > windowUs)
      if (touchTypes(e.event_type)) {
        buf :+= Touch(e.event_type, e.event_id, e.ts_us)
        if (!converted) {
          acc = bump(acc, if (prev.isEmpty) "START" else prev, e.event_type)
          prev = e.event_type
        }
      } else if (e.event_type == convType && e.value >= convValue) {
        val js = buf.filter(_.touch_ts < e.ts_us).map(_.channel)
        if (js.nonEmpty)
          ("START" +: js :+ "CONV").sliding(2).foreach {
            case Seq(a, b) => out += Trans(a, b, 1L)
            case _ =>
          }
        converted = true
        acc = Seq.empty; prev = ""
      }
    }
    if (state.exists || buf.nonEmpty || (!converted && prev.nonEmpty) || converted) {
      state.update(JState(buf, prev, acc, converted, lastUs))
      state.setTimeoutTimestamp(
        math.max(lastUs / 1000L + idleTimeoutMs, state.getCurrentWatermarkMs + 1))
    }
    // collapse within the call: additive partials, smaller Update output
    out.result().groupBy(t => (t.src, t.dst)).iterator
      .map { case ((s, d), ts) => Trans(s, d, ts.map(_.n).sum) }
  }

  /** Wire the journey machine over a (possibly streaming) event set —
    * Update-mode additive (src, dst, n) partials whose running sum is
    * the exact batch `markovTransitions` matrix (non-converters
    * surfacing at idle; see [[journeyKey]]). */
  def transitionsStream(events: Dataset[JEvent],
                        windowUs: Long = 7L * 24 * 3600 * 1000000L,
                        touchTypes: Seq[String] = Seq("click", "signup", "view"),
                        convType: String = "purchase",
                        convValue: Double = 150.0,
                        idleTimeoutMs: Long = 30L * 24 * 3600 * 1000,
                        lateness: String = "1 hour")
                       (implicit spark: SparkSession): Dataset[Trans] = {
    require(windowUs > 0)
    require(touchTypes.nonEmpty && !touchTypes.contains(convType))
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val touchSet = touchTypes.toSet
    events.withColumn("ts", expr("timestamp_micros(ts_us)"))
      .as[JEventTs]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[JEventTs], st: GroupState[JState]) =>
          journeyKey(k, it, st, windowUs, touchSet, convType, convValue,
            idleTimeoutMs))
  }

  /** Wire the machine over a (possibly streaming) event set. */
  def pairsStream(events: Dataset[AEvent],
                  windowUs: Long = 7L * 24 * 3600 * 1000000L,
                  touchTypes: Seq[String] = Seq("click", "signup", "view"),
                  convType: String = "purchase",
                  idleTimeoutMs: Long = 30L * 24 * 3600 * 1000,
                  lateness: String = "1 hour")
                 (implicit spark: SparkSession): Dataset[Credit] = {
    require(windowUs > 0)
    require(touchTypes.nonEmpty && !touchTypes.contains(convType))
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val touchSet = touchTypes.toSet
    events.withColumn("ts", expr("timestamp_micros(ts_us)"))
      .as[AEventTs]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[AEventTs], st: GroupState[AState]) =>
          updateKey(k, it, st, windowUs, touchSet, convType, idleTimeoutMs))
  }
}
