package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Multi-topic snapshot composition — the streaming twin of the
  * reference's `SubscriberTree` (reference src/topic_store/store.py:47-84 +
  * scenario.py:30-137): N live topics are observed continuously, each
  * keeping only its LATEST message, and every capture tick emits ONE
  * nested document holding that latest message per topic (topics that have
  * not spoken yet are absent — `AutoLogger.data = None`).
  *
  * Spark-first shape: tag each topic stream with its name, `unionByName`
  * them into one (session, topic, ts, payload) stream, then fold per
  * capture session with `flatMapGroupsWithState` — the state is the
  * subscriber tree itself (latest message per topic, O(topics) per
  * session), and tick boundaries are derived from EVENT time, so a
  * replayed stream composes the identical snapshots (the reference's
  * wall-clock timer can't). Snapshots for every elapsed tick are emitted
  * when the first message past the boundary arrives, exactly like the
  * timer firing with unchanged state between sparse messages.
  *
  * At 100 TB: state is keyed by capture session (one robot/run each — the
  * reference's `_session_id`, data.py:19), so a fleet of sessions spreads
  * across executors; per-key state never exceeds the topic count.
  */
object SubscriberTree {

  case class TopicMsg(session: String, topic: String, ts_sec: Long, payload: String)
  case class TreeState(lastTick: Long, latest: Map[String, (Long, String)])
  case class Snapshot(session: String, tick_sec: Long,
                      tree: Map[String, String], msg_ts: Map[String, Long])

  /** Fold one session's new messages into its tree state, emitting one
    * snapshot per elapsed tick boundary. Messages are applied in ts order;
    * a message only replaces a topic's entry when it is not older (late
    * in-batch data can't regress the tree).
    */
  private[streaming] def updateKey(session: String, msgs: Iterator[TopicMsg],
                                   state: GroupState[TreeState], tickSec: Long): Iterator[Snapshot] = {
    var st = state.getOption.getOrElse(TreeState(Long.MinValue, Map.empty))
    val out = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
    def snapshotAt(tick: Long): Snapshot =
      Snapshot(session, tick * tickSec,
        st.latest.map { case (t, (_, p)) => t -> p },
        st.latest.map { case (t, (ts, _)) => t -> ts })
    msgs.toSeq.sortBy(m => (m.ts_sec, m.topic)).foreach { m =>
      val tick = Math.floorDiv(m.ts_sec, tickSec)
      if (st.lastTick == Long.MinValue) {
        // first message of the session opens its first tick — nothing to
        // snapshot yet (the reference's timer starts with the scenario)
        st = st.copy(lastTick = tick)
      } else if (tick > st.lastTick) {
        // the message crossed >=1 boundaries: fire the "timer" for each,
        // with the tree as it stood — identical snapshots across a gap,
        // exactly the reference's periodic capture of a quiet tree
        (st.lastTick until tick).foreach(t => out += snapshotAt(t + 1))
        st = st.copy(lastTick = tick)
      }
      val keep = st.latest.get(m.topic).forall(_._1 <= m.ts_sec)
      if (keep) st = st.copy(latest = st.latest + (m.topic -> (m.ts_sec, m.payload)))
    }
    state.update(st)
    out.iterator
  }

  /** Compose named topic streams into one snapshot-per-tick stream.
    * Each input only needs (`session`, `ts_sec`, `payload`) columns; the
    * map key becomes the topic name in the emitted tree.
    */
  def compose(topics: Map[String, DataFrame], tickSec: Long)
             (implicit spark: SparkSession): Dataset[Snapshot] = {
    import spark.implicits._
    require(topics.nonEmpty, "at least one topic stream")
    val tagged = topics.map { case (name, df) =>
      df.select(col("session").cast("string").as("session"), lit(name).as("topic"),
        col("ts_sec").cast("long").as("ts_sec"), col("payload").cast("string").as("payload"))
    }.reduce(_ unionByName _)
    tagged.as[TopicMsg]
      .groupByKey(_.session)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[TopicMsg], st: GroupState[TreeState]) =>
          updateKey(k, it, st, tickSec))
  }
}
