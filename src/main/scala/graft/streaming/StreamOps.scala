package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators in
  * [[graft.ops.EventOps]]: watermarked tumbling-window aggregation and
  * stateful gap sessionization.
  *
  * These take any streaming DataFrame with (ts TIMESTAMP, user_id LONG,
  * event_type STRING, value DOUBLE) — `spark.readStream` sources in
  * production, MemoryStream in tests. State lives in the streaming state
  * store (per-key, partitioned by the grouping key), so the operators scale
  * horizontally exactly like their batch twins; watermarks bound state
  * retention and admit bounded lateness.
  */
object StreamOps {

  /** Event-time tumbling-window counts/sums per event type, with a
    * watermark bounding late data and state size. */
  def windowedAgg(events: DataFrame, watermarkDelay: String,
                  windowDuration: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("total"))

  /** Streaming exact dedup: drop repeats of `keyCols` arriving within the
    * watermark horizon (state is bounded by the watermark — the streaming
    * twin of [[graft.ops.DedupOps.exactDedupBy]]). */
  def dedupStream(events: DataFrame, watermarkDelay: String,
                  keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One event in, session updates out. */
  final case class SessionUpdate(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long,
                                 closed: Boolean)

  /** Per-user session accumulator held in the state store. (Public:
    * encoder codegen resolves accessors reflectively and chokes on
    * object-nested private case classes.) */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Stateful gap sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives within `gapSeconds` of the last one
    * (event-time timeout — fires when the watermark passes last+gap).
    * Emits a closed-session record on timeout; in-progress sessions stay
    * in the state store. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long,
                       watermarkDelay: String): Dataset[SessionUpdate] = {
    implicit val updEnc = Encoders.product[SessionUpdate]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val rowEnc = Encoders.product[(Long, Timestamp)]
    implicit val keyEnc = Encoders.scalaLong

    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]

    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (user: Long, rows: Iterator[(Long, Timestamp)],
       state: GroupState[SessionState]) =>
        val gapMs = gapSeconds * 1000L
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(SessionUpdate(user, new Timestamp(s.start),
            new Timestamp(s.last), s.n, closed = true))
        } else {
          val sorted = rows.map(_._2.getTime).toSeq.sorted
          var out = List.empty[SessionUpdate]
          var cur = state.getOption
          sorted.foreach { t =>
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case Some(s) => // gap exceeded within the batch: close + restart
                out ::= SessionUpdate(user, new Timestamp(s.start),
                  new Timestamp(s.last), s.n, closed = true)
                cur = Some(SessionState(t, t, 1))
              case None => cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last + gapMs)
          }
          out.reverseIterator
        }
    }
  }
}
