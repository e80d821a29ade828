package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over a timestamped event table: tumbling-window
  * aggregation and gap-based sessionization — the batch twins of the
  * Structured Streaming versions in [[graft.streaming]].
  *
  * Scale shape: everything partitions by the entity key (user) or the
  * window bucket; one shuffle per op, sequential in-partition scans, no
  * driver state. Gap comparison is in microseconds (unix_micros) — casting
  * timestamps to long truncates to seconds and disagrees with µs-precision
  * engines on exact-boundary gaps.
  */
object EventOps {

  /** Assign gap-based session ids per key: a new session starts when the
    * gap from the previous event exceeds `gapSeconds`. Adds `session_id`
    * (1-based, per key, ordered by time then tiebreak). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull, 1)
      .when(unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session summary: one row per (key, session): event count, start, end. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Tumbling-window aggregation: epoch-aligned buckets of `duration`. */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
               groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration) +: groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ws", col("window.start"))
      .drop("window")
}
