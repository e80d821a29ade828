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

  /** Per-user session accumulator held in the state store; times are
    * MICROSECONDS since epoch — the batch twin ([[graft.ops.EventOps]])
    * compares gaps in µs, and the events fixture carries sub-millisecond
    * timestamps, so ms-precision state would disagree with it on
    * near-boundary gaps. (Public: encoder codegen resolves accessors
    * reflectively and chokes on object-nested private case classes.) */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)

  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Stateful gap sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives within `gapSeconds` of the last one
    * (event-time timeout — fires when the watermark passes last+gap).
    * Emits a closed-session record on timeout; in-progress sessions stay
    * in the state store. Gap arithmetic is µs-precision, matching
    * [[graft.ops.EventOps.sessionize]] exactly (asserted row-for-row on the
    * events fixture in StreamingSpec). */
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
        val gapUs = gapSeconds * 1000000L
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(SessionUpdate(user, fromMicros(s.startUs),
            fromMicros(s.lastUs), s.n, closed = true))
        } else {
          val sorted = rows.map(r => toMicros(r._2)).toSeq.sorted
          var out = List.empty[SessionUpdate]
          var cur = state.getOption
          sorted.foreach { t =>
            cur match {
              // within gap of the session INTERVAL (either side): merge,
              // extending start downward for out-of-order events older than
              // the stored start.
              case Some(s) if t >= s.startUs - gapUs && t <= s.lastUs + gapUs =>
                cur = Some(SessionState(math.min(s.startUs, t),
                  math.max(s.lastUs, t), s.n + 1))
              case Some(s) if t > s.lastUs + gapUs =>
                // gap exceeded within the batch: close + restart
                out ::= SessionUpdate(user, fromMicros(s.startUs),
                  fromMicros(s.lastUs), s.n, closed = true)
                cur = Some(SessionState(t, t, 1))
              case Some(s) => // late event > gap BEFORE the session: it can
                // never grow (this batch is sorted ascending; future batches
                // are bounded below by the watermark) — emit it closed.
                out ::= SessionUpdate(user, fromMicros(t), fromMicros(t),
                  1, closed = true)
              case None => cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // flatMapGroupsWithState does not drop late rows, so a late
            // event with last + gap at/below the current watermark would
            // make setTimeoutTimestamp throw (must be > watermark) and kill
            // the query — clamp to watermark + 1 ms (fires on the next
            // advance, which is right: the gap horizon has already passed).
            state.setTimeoutTimestamp(
              math.max(s.lastUs / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1))
          }
          out.reverseIterator
        }
    }
  }
}
