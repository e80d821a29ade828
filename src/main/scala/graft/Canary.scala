package graft

/** Cold-JVM bench CANARY — the falsifiability protocol for
  * round-over-round suite drift: BENCH_r12/r13 both read 10-20% slower
  * than the previous round with the worst "regressions" landing on
  * gates no commit touched, and the defense was ad-hoc same-session
  * re-measurement. This pins it: a FIXED set of 15 queries spanning
  * tiers, each run ONCE in a fresh JVM (after one fixed warm-up query
  * that absorbs first-query JVM/codegen startup), timings printed as
  * one JSON line. `tools/canary.sh` launches 3 cold JVMs and appends
  * the per-query MEDIAN to the cumulative CANARY.json.
  *
  * Reading it: if the 424-gate suite number creeps while the cold-JVM
  * canary stays flat, the creep is suite/JVM pressure (one JVM running
  * 424 gates × 4 passes — code-cache, GC, block-manager residency),
  * not plan regressions; if the canary creeps too, a real regression
  * exists and the moved query names it.
  *
  * The pinned set must NOT change across rounds — comparability is the
  * point. It spans: TPC-H joins/aggs (f16, f17), shingle dedup (d03,
  * d04), graph (d20, d46 — the priciest iterative gates), ANN build +
  * probe (v03, v13), streaming replays (e11, e27), global windows
  * (s50, s105), text (t04, t17), corpus packing (p06). */
object Canary {
  val pinned: Seq[String] = Seq(
    "f16_q3_shipping", "f17_q18_smj", "d03_jaccard_pairs",
    "d04_minhash_lsh", "d20_pagerank", "d46_louvain", "v03_ann_ivf",
    "v13_ivf_pq", "e11_stream_join", "e27_funnel", "s50_ewm",
    "s105_expanding_qtile_approx", "t04_tfidf", "t17_bm25",
    "p06_corpus_build")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "graft-canary")
    // ONE fixed warm-up query absorbs the bulk of JVM/codegen startup so
    // the 15 measurements are comparable across rounds (the startup cost
    // itself is NOT the signal — plan regressions are)
    try SparkEntry.queries("f03_q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    finally Caches.clear()
    // A failed query must NOT be logged as a (fast) timing — that would
    // silently corrupt exactly the round-over-round drift signal the
    // canary exists to pin. Record failures explicitly; canary.sh greps
    // for "failed" and refuses to append a median built on one.
    var failed = List.empty[String]
    val times = pinned.map { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => failed ::= n }
      finally Caches.clear()
      n -> (System.nanoTime() - t0) / 1e9
    }.filterNot { case (n, _) => failed.contains(n) }
    // silence async printers before the parse line (the Bench lesson)
    try {
      spark.streams.active.foreach(q => try q.stop() catch {
        case _: Throwable => () })
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    } catch { case _: Throwable => () }
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println("{\"canary\":" + times.map { case (k, v) =>
      "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}") +
      ",\"total\":" + r3(times.map(_._2).sum) +
      ",\"failed\":[" + failed.reverse.map("\"" + _ + "\"").mkString(",") +
      "],\"sf\":\"" + sfDir + "\"}")
    spark.stop()
  }
}
