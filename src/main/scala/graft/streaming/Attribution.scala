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
