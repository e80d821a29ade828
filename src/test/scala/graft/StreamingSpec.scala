package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** MemoryStream-driven specs for the streaming twins of the event ops. */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tableChangeFeed: a consumer starting AFTER a vacuum seeds from " +
      "the oldest kept version as a full snapshot (no v-1 manifest)") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_feedvac").toString
    val tbl = s"$root/tbl"
    val base = spark.range(0, 16)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 4)
    VersionedTable.commitUpsert(spark, tbl,
      Seq((1L, "v2-1")).toDF("id", "s"), "id")
    VersionedTable.commitUpsert(spark, tbl,
      Seq((2L, "v3-2"), (99L, "v3-99")).toDF("id", "s"), "id")
    // retire v1: the feed's first delivered version (2) now has NO
    // predecessor manifest — it must emit as a full snapshot
    VersionedTable.vacuum(spark, tbl, keepLast = 2)
    var state: org.apache.spark.sql.DataFrame = null
    val q = StreamOps.tableChangeFeed(spark, tbl) { (_, changed, rows) =>
      state = (if (state == null) rows
               else state.filter(!VersionedTable.bucketOf("id", 4)
                   .isin(changed.toSeq: _*))
                 .unionByName(rows))
        .localCheckpoint(true)
      ()
    }
    try q.processAllAvailable() finally q.stop()
    val got = state.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = VersionedTable.readVersion(spark, tbl, 3).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want,
      s"late-joining reconstruction diverged from time travel: $got")
    assert(got.contains(1L -> "v2-1") && got.contains(99L -> "v3-99"))
  }

  test("file-source stream ingests newly landed parquet incrementally") {
    // The production ingestion path: a landing directory of parquet files,
    // discovered incrementally by the file stream source — same transform
    // (windowedAgg) as the MemoryStream specs, so the op is source-agnostic.
    val src = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    def land(rows: (Timestamp, String, Double)*): Unit =
      rows.toDF("ts", "event_type", "value").coalesce(1)
        .write.mode("append").parquet(src)
    land((ts(5), "click", 1.0), (ts(15), "click", 2.0))
    val stream = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(src)
    val agg = StreamOps.windowedAgg(stream, "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def counts() = spark.sql(
        "SELECT event_type, n, total FROM file_win ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(counts() == Seq(("click", 2L, 3.0)))
      land((ts(25), "buy", 10.0)) // a new file lands mid-stream
      q.processAllAvailable()
      assert(counts() == Seq(("buy", 1L, 10.0), ("click", 2L, 3.0)))
    } finally q.stop()
  }

  test("checkpointed dedup stream survives a stop/restart: state restores, " +
    "duplicates from before the restart stay dropped") {
    // The operational contract a 100 TB/day ingestion depends on: kill the
    // query, restart from the SAME checkpoint, and the dedup state store
    // resumes — a key seen before the restart must still be a duplicate
    // after it. Without state restore the post-restart replay would
    // re-admit it (exactly the double-ingestion bug checkpoints exist to
    // prevent).
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_ckpt_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def land(rows: (Timestamp, Long)*): Unit =
      rows.toDF("ts", "event_id").coalesce(1)
        .write.mode("append").parquet(src)
    def start() = StreamOps.dedupStream(
        spark.readStream.schema("ts timestamp, event_id bigint").parquet(src),
        "1 hour", Seq("event_id"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    land((ts(5), 1L), (ts(6), 2L))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart with a duplicate of a PRE-restart key + one fresh key
    land((ts(7), 1L), (ts(8), 3L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(sink).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"state did not restore: $ids")
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val joined = StreamOps.intervalJoinStream(
      clicks.toDF.toDF("ts", "user_id"), buys.toDF.toDF("ts", "user_id"),
      "user_id", "10 minutes", "15 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L), (ts(30), 1L))
      buys.addData((ts(10), 1L), (ts(20), 2L), (ts(40), 1L), (ts(10), 3L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT l_user_id, l_ts, r_ts FROM ss_join ORDER BY l_user_id, l_ts")
        .collect().map(r => (r.getLong(0),
          r.getTimestamp(1).getTime / 60000 % 60,
          r.getTimestamp(2).getTime / 60000 % 60)).toSeq
      // u1@:00 pairs buy@:10 (Δ10 ≤ 15) but not @:40; u1@:30 pairs @:40;
      // u2@:00 pairs nothing (Δ20 > 15); u3 has no click side
      assert(rows == Seq((1L, 0L, 10L), (1L, 30L, 40L)))
    } finally q.stop()
  }

  test("asofStream joins out-of-order probes to the latest earlier reference") {
    implicit val sqlCtx = spark.sqlContext
    // side 0 = reference, side 1 = probe; delivered OUT of event-time
    // order across two batches — the state buffer must reorder before
    // finalizing.
    val in = MemoryStream[(Long, Long, Timestamp, Double, Int)]
    val out = StreamOps.asofStream(
      in.toDF.toDF("user_id", "event_id", "ts", "value", "side"), "1 hour")
    val q = out.writeStream.format("memory").queryName("asof_s")
      .outputMode("append").start()
    try {
      in.addData((1L, 102L, ts(15), 0.0, 1), (1L, 11L, ts(0), 1.0, 0))
      q.processAllAvailable()
      in.addData((1L, 101L, ts(5), 0.0, 1), (1L, 12L, ts(10), 2.0, 0))
      q.processAllAvailable()
      in.addData((-1L, -9L, Timestamp.valueOf("2030-01-01 00:00:00"),
        0.0, 0)) // advance the watermark past everything
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, matched FROM asof_s WHERE user_id >= 0 " +
        "ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // probe@:05 sees ref@:00 (1.0); probe@:15 sees ref@:10 (2.0) even
      // though the probe ARRIVED before that reference
      assert(rows == Seq((101L, 1.0), (102L, 2.0)))
    } finally q.stop()
  }

  test("cdcCommitIngest: adversarial order folds correctly, and a " +
      "REPLAYED epoch commits nothing twice (exactly-once via tags)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_commit").toString
    val tbl = s"$root/tbl"
    VersionedTable.commitCreate(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
      tbl, "id", buckets = 2)
    def run(batches: Seq[Seq[(Long, String, String, Long)]]): Unit = {
      val in = MemoryStream[(Long, String, String, Long)]
      val (q, _) = StreamOps.cdcCommitIngest(
        in.toDF.toDF("id", "s", "op", "seq"), tbl, "id", "seq", "op")
      try batches.foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
    }
    // seq-3 first, then seq-1 (late, lower) — the late row must lose
    run(Seq(
      Seq((1L, "a-v3", "U", 3L), (2L, "x", "D", 3L)), // epoch 0
      Seq((1L, "a-v1", "U", 1L), (9L, "new", "U", 1L)))) // epoch 1
    assert(VersionedTable.currentVersion(spark, tbl) == 3)
    def readCur = VersionedTable
      .readVersion(spark, tbl, VersionedTable.currentVersion(spark, tbl))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val afterRun = readCur
    assert(afterRun == Seq((1L, "a-v3"), (3L, "c"), (9L, "new")),
      s"late lower-seq must lose, tombstone must delete: $afterRun")
    // REPLAY: a restarted query re-delivers epoch 0's data as its own
    // epoch 0 (foreachBatch's failure contract) — the tag lookup must
    // SKIP the commit: version count and content unchanged
    run(Seq(Seq((1L, "a-v3", "U", 3L), (2L, "x", "D", 3L))))
    assert(VersionedTable.currentVersion(spark, tbl) == 3,
      "replayed epoch must not commit a new version")
    assert(readCur == afterRun)
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("watermarked tumbling window aggregates by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF.toDF("ts", "event_type", "value")
      .withColumn("user_id", lit(1L))
    val agg = StreamOps.windowedAgg(events, "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(15), "click", 2.0),
        (ts(25), "buy", 10.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, n, total FROM win_agg ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("buy", 1L, 10.0), ("click", 2L, 3.0)))
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions after the gap (event-time timeout)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF.toDF("ts", "user_id")
      .withColumn("event_type", lit("e")).withColumn("value", lit(0.0))
    val sess = StreamOps.sessionizeStream(events, gapSeconds = 600,
      watermarkDelay = "0 seconds")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then silence.
      input.addData((ts(0), 1L), (ts(5), 1L))
      q.processAllAvailable()
      // advance the watermark far past the gap so the session times out.
      input.addData((ts(59), 2L))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT user_id, n_events, closed FROM sessions WHERE user_id = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(closed.toSeq == Seq((1L, 2L, true)))
    } finally q.stop()
  }

  test("streaming dedup drops repeats within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF.toDF("ts", "user_id", "event_type")
    val deduped = StreamOps.dedupStream(events, "10 minutes",
      Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"),
        (ts(2), 2L, "click"), (ts(3), 1L, "buy"))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedup_out").head().getLong(0)
      assert(n == 3) // the duplicate (1, click) at ts(1) dropped
    } finally q.stop()
  }

  test("late events within the gap of each other merge into one session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF.toDF("ts", "user_id")
      .withColumn("event_type", lit("e")).withColumn("value", lit(0.0))
    // 2h delay: the out-of-order events below stay ABOVE the watermark —
    // rows below it are dropped by the stateful operator before reaching
    // the merge logic, so this is exactly the admitted-lateness window.
    val sess = StreamOps.sessionizeStream(events, gapSeconds = 600,
      watermarkDelay = "2 hours")
    val q = sess.writeStream.format("memory").queryName("late_merge")
      .outputMode("append").start()
    try {
      input.addData((ts(50), 1L)) // establish a session
      q.processAllAvailable()
      // two admitted-late events, > gap before the stored session but
      // within the gap of each other — batch sessionize merges them into
      // ONE session, and so must the stream (not two singletons)
      input.addData((ts(0), 1L), (ts(5), 1L))
      q.processAllAvailable()
      // advance the watermark past every gap horizon to flush
      input.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 2L))
      q.processAllAvailable()
      val late = spark.sql(
        """SELECT session_start, session_end, n_events FROM late_merge
           WHERE closed AND user_id = 1 ORDER BY session_start""").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      assert(late.toSeq == Seq((ts(0), ts(5), 2L), (ts(50), ts(50), 1L)))
    } finally q.stop()
  }

  // ---- batch/stream equivalence on the REAL events fixture (sf0.001) ----
  //
  // The driver's e01/e02 gates verify the batch ops against DuckDB; these
  // two tests close the loop by replaying the same fixture through
  // MemoryStream and asserting the streaming twins return row-identical
  // answers — not just matching shapes.

  private val fixtureDir = "/root/testdata/sf0.001"
  private def haveFixture = new java.io.File(s"$fixtureDir/events.parquet").exists

  test("streaming windowedAgg == batch e01 tumbling agg on the events fixture") {
    assume(haveFixture)
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, fixtureDir)
      .select("ts", "event_type", "value")
    val rows = ev.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.windowedAgg(
      input.toDF.toDF("ts", "event_type", "value"), "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("fixture_agg")
      .outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // round(2dp) on both sides: streaming and batch sum doubles in
      // different orders (same tolerance the DuckDB oracle compare uses).
      val streamed = spark.sql(
        "SELECT ws, event_type, n, round(total, 2) FROM fixture_agg")
        .collect().map(_.toSeq).toSet
      val batch = graft.ops.EventOps.tumbling(ev, "ts", "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total")))
        .select("ws", "event_type", "n", "total").collect().map(_.toSeq).toSet
      assert(streamed.size == batch.size)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming sessionizer == batch e02 sessions on the events fixture") {
    assume(haveFixture)
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, fixtureDir)
    val rows = ev.select("ts", "user_id").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq

    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF.toDF("ts", "user_id")
      .withColumn("event_type", lit("e")).withColumn("value", lit(0.0))
    val sess = StreamOps.sessionizeStream(events, gapSeconds = 1800L,
      watermarkDelay = "0 seconds")
    val q = sess.writeStream.format("memory").queryName("fixture_sessions")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // two sentinel advances on a user id absent from the fixture: the
      // first moves the watermark past every fixture session's gap horizon,
      // the second triggers the event-time timeouts that flush them closed.
      input.addData((Timestamp.valueOf("2024-06-01 00:00:00"), -1L))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-12-01 00:00:00"), -1L))
      q.processAllAvailable()

      val streamed = spark.sql(
        """SELECT user_id, session_start, session_end, n_events
           FROM fixture_sessions WHERE closed AND user_id >= 0""")
        .collect().map(_.toSeq).toSet
      // batch twin — exactly the e02 query's operator (gap 1800s, µs math)
      val batch = graft.ops.EventOps
        .sessions(ev, "user_id", "ts", "event_id", 1800L)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      assert(streamed.size == batch.size)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming hopping agg == batch hopping on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((ts(7), "click", 1.0), (ts(22), "click", 2.0),
      (ts(40), "buy", 5.0))
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowedAgg(
        in.toDF.toDF("ts", "event_type", "value"),
        "0 seconds", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("hop_s")
      .outputMode("complete").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.sql(
        "SELECT ws, event_type, n, total FROM hop_s ORDER BY ws, event_type")
        .collect().map(_.toSeq).toSeq
      val batch = graft.ops.EventOps.hopping(
          rows.toDF("ts", "event_type", "value"), "ts", "30 minutes",
          "10 minutes", Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))
        .select("ws", "event_type", "n", "total")
        .orderBy("ws", "event_type").collect().map(_.toSeq).toSeq
      // 3 events x 3 windows each, the two clicks sharing one window -> 8
      assert(stream == batch && stream.size == 8)
    } finally q.stop()
  }

  test("batch and streaming tumbling aggs agree on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((ts(5), "a", 1.0), (ts(15), "a", 2.0), (ts(45), "b", 3.0))
    // streaming
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.windowedAgg(
      input.toDF.toDF("ts", "event_type", "value"), "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("par_agg")
      .outputMode("complete").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT ws, event_type, n FROM par_agg")
        .collect().map(_.toSeq).toSet
      // batch twin
      val batch = graft.ops.EventOps.tumbling(
          data.toDF("ts", "event_type", "value"), "ts", "30 minutes",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))
        .select("ws", "event_type", "n").collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim without state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.enrichStream(input.toDF.toDF("event_id", "user_id"),
        dim, "user_id", "k")
      .writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    try {
      input.addData((10L, 1L), (11L, 2L), (12L, 3L)) // 3 has no dim row
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, user_id, tier FROM ss_enrich ORDER BY event_id")
        .collect().map(_.toSeq.toSeq).toSeq
      assert(rows == Seq(Seq(10L, 1L, "gold"), Seq(11L, 2L, "silver")))
    } finally q.stop()
  }

  test("scd2Stream: out-of-order multi-batch arrival closes the same " +
    "runs as the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 in EVENT time: a@0, a@5, b@10, b@15, a@20 — runs a|b|a.
    // Arrival is shuffled ACROSS batches: the late a@5 and b@10 arrive
    // after a@20, inside the 2h admitted-lateness window.
    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val q = StreamOps.scd2Stream(
      input.toDF().toDF("user_id", "event_id", "ts", "event_type"),
      "2 hours")
      .writeStream.format("memory").queryName("scd2_ooo")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, ts(0), "a"), (1L, 4L, ts(15), "b"))
      q.processAllAvailable()
      input.addData((1L, 5L, ts(20), "a"), (1L, 3L, ts(10), "b"))
      q.processAllAvailable()
      input.addData((1L, 2L, ts(5), "a"))
      q.processAllAvailable()
      // flush: advance the watermark far past every buffered event
      input.addData((2L, 9L, Timestamp.valueOf("2024-01-02 10:00:00"), "x"))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT version, attr, valid_from, valid_to FROM scd2_ooo
           WHERE user_id = 1 ORDER BY version""").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2),
          r.getTimestamp(3)))
      // closed runs only: a [0,10), b [10,20); the trailing a run stays
      // open in state (append mode cannot emit it)
      assert(rows.toSeq == Seq(
        (1, "a", ts(0), ts(10)),
        (2, "b", ts(10), ts(20))))
    } finally q.stop()
  }

  test("funnelStream: out-of-order arrival, pre-view clicks, and " +
    "equal-timestamp stage ties all match batch funnel semantics") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 EVENT time: click@0 (before any view — must NOT count),
    // view@5, purchase@8 (before click — must NOT count), click@10,
    // purchase@15 → t = (5, 10, 15). Arrival shuffled across batches.
    // user 2: view+click at the IDENTICAL ts(3) then purchase@7 —
    // the ts >= t_prev tie completes both stages at once.
    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val q = StreamOps.funnelStream(
      input.toDF().toDF("user_id", "event_id", "ts", "event_type"),
      Seq("view", "click", "purchase"), "2 hours")
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append").start()
    try {
      input.addData((1L, 4L, ts(10), "click"), (1L, 5L, ts(15), "purchase"))
      q.processAllAvailable()
      input.addData((1L, 2L, ts(5), "view"), (1L, 3L, ts(8), "purchase"),
        (1L, 1L, ts(0), "click"))
      q.processAllAvailable()
      input.addData((2L, 7L, ts(3), "click"), (2L, 6L, ts(3), "view"),
        (2L, 8L, ts(7), "purchase"))
      q.processAllAvailable()
      // flush far past the lateness window so state times out and emits
      input.addData((9L, 99L, Timestamp.valueOf("2024-01-03 10:00:00"), "x"))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, stage, t FROM funnel_ooo
           WHERE user_id IN (1, 2) ORDER BY user_id, stage""").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      assert(rows.toSeq == Seq(
        (1L, "click", ts(10)), (1L, "purchase", ts(15)),
        (1L, "view", ts(5)),
        (2L, "click", ts(3)), (2L, "purchase", ts(7)),
        (2L, "view", ts(3))))
    } finally q.stop()
  }

  test("funnelStream: a beyond-watermark late event is DROPPED, never " +
    "folded behind already-finalized stages") {
    implicit val sqlCtx = spark.sqlContext
    // view@5 and click@10 finalize into `times` once the watermark
    // passes them (the x@50 sentinel stays pending so the journey can't
    // emit yet); a purchase@7 then arrives LATE — folding it would
    // record the purchase stage at ts 7, EARLIER than its click
    // predecessor at 10. Spark aggregation semantics: beyond-watermark
    // rows are dropped.
    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val q = StreamOps.funnelStream(
      input.toDF().toDF("user_id", "event_id", "ts", "event_type"),
      Seq("view", "click", "purchase"), "10 minutes")
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, ts(5), "view"), (1L, 2L, ts(10), "click"),
        (1L, 3L, ts(50), "x"))
      q.processAllAvailable() // watermark → ts(40): 5/10 final, 50 pending
      input.addData((1L, 4L, ts(7), "purchase")) // late: 7 < watermark 40
      q.processAllAvailable()
      input.addData((9L, 99L, Timestamp.valueOf("2024-01-03 10:00:00"), "x"))
      q.processAllAvailable() // timeout flush
      val rows = spark.sql(
        """SELECT stage, t FROM funnel_late
           WHERE user_id = 1 ORDER BY stage""").collect()
        .map(r => (r.getString(0), Option(r.getTimestamp(1))))
      assert(rows.toSeq == Seq(
        ("click", Some(ts(10))), ("purchase", None), ("view", Some(ts(5)))))
    } finally q.stop()
  }

  test("exactSubstrIngest: durable corpus — a NEW wrapper instance over " +
      "the existing artifact dir ingests the next wave correctly") {
    import graft.ops.DedupOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_substr_restart").toString
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one unique body $shared tail one"),
      (2L, s"two other text $shared tail two"),
      (3L, "three completely distinct words only"),
      (4L, s"four fresh arrival $shared tail four"),
      (5L, "five nothing shared here at all"))
    def ingest(waves: Seq[Seq[(Long, String)]],
               acc0: Option[org.apache.spark.sql.DataFrame])
        : org.apache.spark.sql.DataFrame = {
      val input = MemoryStream[(Long, String)]
      var acc = acc0.orNull
      val q = StreamOps.exactSubstrIngest(
        input.toDF().toDF("doc_id", "text"), s"$root/idx",
        "doc_id", "text", 4) { out =>
        acc = (if (acc == null) out
               else acc.join(out, Seq("doc_id"), "left_anti")
                 .unionByName(out)).localCheckpoint(true)
      }
      try {
        waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
      } finally q.stop()
      acc
    }
    // instance 1: waves 1+2, then DIES (only the on-disk artifact +
    // corpus survive — no session state carries over)
    val acc12 = ingest(Seq(docs.take(2), docs.slice(2, 4)), None)
    // instance 2: a fresh wrapper over the same dir ingests wave 3
    val acc3 = ingest(Seq(docs.drop(4)), Some(acc12))
    val got = acc3.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    val want = DedupOps.exactSubstrDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    graft.Caches.clear()
    assert(got == want, s"restart accumulation diverged:\n$got\n$want")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
