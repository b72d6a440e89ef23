package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-sequence funnel — the live twin of
  * `graft.ops.Analytics.funnelUsers` (reference analogue: the capture
  * loop's per-session progress accounting, `scenario.py:238-274`, done
  * per-user and in order).
  *
  * State per user is exactly three longs (the running stage-completion
  * times), updated by replaying each micro-batch's events in event-time
  * order — identical to the batch window's chained running minimums, so
  * a funnel over 10⁹ users runs at constant memory per key and the
  * nightly batch recompute agrees row-for-row. Stage times only ever
  * DECREASE (running minimums), so emitting on change in Update mode is
  * monotone-safe for downstream consumers.
  *
  * Ordering contract: within a micro-batch events sort by (ts_us,
  * event_id); ACROSS batches arrival order must respect event-time order
  * per user (true for per-key ordered sources; otherwise a late view
  * cannot retroactively admit an earlier-timestamped click — recover
  * those with the batch recompute, which is order-free).
  */
object Funnel {

  case class FEvent(user_id: Long, event_id: Long, event_type: String, ts_us: Long)
  /** Long.MaxValue = stage not reached. */
  case class FState(s1: Long, s2: Long, s3: Long)
  case class FOut(user_id: Long, u1: Option[Long], u2: Option[Long], u3: Option[Long])

  private def opt(v: Long): Option[Long] = if (v == Long.MaxValue) None else Some(v)

  /** Fold one user's micro-batch through the stage machine. Emits the
    * user's updated stage times when (and only when) the batch advanced
    * the funnel.
    */
  def updateKey(userId: Long, events: Iterator[FEvent],
                state: GroupState[FState], stages: Seq[String]): Iterator[FOut] = {
    val init = state.getOption.getOrElse(FState(Long.MaxValue, Long.MaxValue, Long.MaxValue))
    var (s1, s2, s3) = (init.s1, init.s2, init.s3)
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (e.event_type == stages(0)) s1 = math.min(s1, e.ts_us)
      else if (e.event_type == stages(1) && e.ts_us > s1) s2 = math.min(s2, e.ts_us)
      else if (e.event_type == stages(2) && e.ts_us > s2) s3 = math.min(s3, e.ts_us)
    }
    if (s1 == init.s1 && s2 == init.s2 && s3 == init.s3) Iterator.empty
    else {
      state.update(FState(s1, s2, s3))
      Iterator.single(FOut(userId, opt(s1), opt(s2), opt(s3)))
    }
  }

  /** Wire the stage machine over a (possibly streaming) event set. */
  def stages(events: Dataset[FEvent],
             stageNames: Seq[String] = Seq("view", "click", "purchase"))
            (implicit spark: SparkSession): Dataset[FOut] = {
    require(stageNames.size == 3, "funnel is specialized to 3 stages")
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[FEvent], st: GroupState[FState]) =>
          updateKey(k, it, st, stageNames))
  }
}
