package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over the ENTIRE gated query suite: builds every
  * `SparkEntry.queries` plan against the sf0.001 fixtures and rejects the
  * two operators that never survive 100 TB — `CartesianProduct` and
  * `BroadcastNestedLoopJoin`. Any new query that accidentally compiles to
  * an all-pairs plan (a non-equi join condition is the usual cause) fails
  * here, not in production. Global single-partition exchanges are NOT
  * linted: the pandas-parity global window ops carry them by documented
  * design, with keyed/distributed variants alongside.
  */
class PlanLintSpec extends AnyFunSuite with SparkFixture {

  /** v01 is exact brute-force kNN BY DESIGN: every probe scores every
    * corpus vector, shaped as a bounded broadcast (the probe set) against
    * one streamed corpus scan — the correct exhaustive baseline, with
    * v02/v03 (LSH/IVF bucketed equi-joins) as the scale paths. It is the
    * only query allowed an all-pairs operator. */
  private val exempt = Set("v01_knn_bruteforce",
    "v36_hard_negatives", // v01's sanctioned brute-force scan with the
    // label inequality in the join — anchors stay a bounded broadcast
    // side; the scale path swaps in ivfProbeFiltered candidates
    "v06_knn_sql", // v01's SQL-surface twin: same sanctioned brute force
    "v16_recall_eval", // scores IVF recall AGAINST v01's exact answer —
                       // the ground-truth side is the sanctioned brute force
    "v17_ndcg_eval", // NDCG against the same sanctioned exact ground truth
    "v18_mmr_rerank", // candidate generation IS the sanctioned brute force
    "v09_sq_knn", // quantized brute force — same sanctioned baseline shape
    "v21_sq_recall", // scores v09's quantized brute force against v01's
                     // exact answer — BOTH sides are the sanctioned shape
    "v23_binary_hamming", // binary-flat IS brute force by contract: the
                          // 16-byte xor+popcount scan is the cheap
                          // exhaustive baseline (FAISS BinaryFlat)
    "v24_binary_recall", // scores v23's sanctioned scan against v01's
    "v28_filtered_recall", // scores the filtered IVF probe against the
                           // FILTERED brute force — the ground-truth side
                           // is the sanctioned exhaustive shape
    "v30_mrr", // first-true-hit rank against v01's exact ground truth
    "v26_range_search", // threshold range search — the sanctioned
                        // brute-force shape with a filter close
    "v32_ivf_repair", // recall before/after scored against v01's
                      // sanctioned exact ground truth; the recall
                      // columns broadcast back on a constant key —
                      // 1-ROW build sides by construction (the d45
                      // in-plan normalization shape)
    // welch pairs: the inequality join runs AFTER the partial+final
    // aggregate collapsed the data to |groups| rows — the nested-loop is
    // over a bounded broadcast (|groups|² pairs), never data-sized
    "f48_welch_ttest")

  test("no gated query plan contains a cartesian or nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => exempt(q._1)).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")
              || plan.contains("BroadcastNestedLoopJoin")) Some(name)
          else None
        } catch {
          case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage})")
        } finally Caches.clear()
    }
    assert(bad.isEmpty, s"all-pairs plans or failures: ${bad.mkString(", ")}")
  }

  /** Every global-order window routes through the range-bucket two-pass
    * machinery (GlobalWindows) or a real key: a `windowspecdefinition`
    * whose FIRST argument is an ordering expression (` ASC`/` DESC` before
    * any comma) is a single-task global window — the scale-killer this
    * lint rejects across the WHOLE gated suite, not just the Series
    * window family. Streaming replay gates are skipped (building their
    * plan executes the replay; their ops are keyed by construction). */
  test("no gated query plan contains a single-task global-order window") {
    val dir = "/root/testdata/sf0.001"
    val globalOrder = """windowspecdefinition\([^,()]*( ASC| DESC)""".r
    val skip = Set("e09_stream_sessions", "e10_stream_dedup",
      "e11_stream_join", "e12_session_window", "e13_stream_static",
      "e16_stream_file_sink")
    val bad = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip).flatMap { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        if (globalOrder.findFirstIn(plan).isDefined) Some(name) else None
      } catch {
        case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage})")
      } finally Caches.clear()
    }
    assert(bad.isEmpty,
      s"single-task global windows remain: ${bad.mkString(", ")}")
  }

  /** f27 is the co-location flagship: both sides are written bucketed on
    * the join key, so the SortMergeJoin AND the per-key aggregate must
    * consume the on-disk clustering — no hash exchange anywhere in the
    * plan. The only allowed Exchange is the final presentation sort's
    * range partitioning. */
  test("f27 bucketed join plan contains no hash shuffle") {
    val dir = "/root/testdata/sf0.001"
    try {
      val plan = SparkEntry.queries("f27_bucketed_join")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
    } finally Caches.clear()
  }
}
