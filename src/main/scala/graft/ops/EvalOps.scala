package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-quality / distribution-drift evaluation operators — the loop a
  * training-data pipeline runs around its quality scorers: is the score
  * discriminative (ROC-AUC), is it calibrated (reliability bins), and has
  * the corpus drifted since the reference snapshot (PSI)?
  *
  * Shared determinism discipline (the e37/f55 pattern): every statistic
  * reduces to ORDER-FREE exact integer sums (counts, micro-unit floors of
  * per-row doubles) closed by one fixed-association double expression on
  * a 6dp floor grid — bit-portable across engines, so even these
  * "analytics" ops carry full DuckDB oracles.
  *
  * Scale shape: each operator is one partial+final aggregation keyed by
  * (group, distinct score) or (bin) — the shuffle carries one row per
  * distinct key, never per input row; no global windows, no driver state
  * beyond what the caller materializes.
  */
object EvalOps {

  /** Per-group ROC-AUC of a score against a boolean label via the
    * rank-sum identity (AUC = U/(n₁·n₀), ties counted half) — computed
    * WITHOUT any row-level ranking: ONE partial+final count aggregation
    * collapses the data to (group, distinct score) rows, a group-KEYED
    * cumulative window orders the score axis, and the closing per-group
    * aggregate sums the exact pair counts.
    *
    * Determinism: `num2 = Σ posᵢ·(2·negBelowᵢ + negᵢ)` is an order-free
    * BIGINT sum of exact integers (2·AUC's numerator — the ½-tie weight
    * stays integral); AUC is ONE double division rounded to the 6dp
    * floor grid. Degenerate groups (single-class) get null AUC, never
    * 0/0. Assumes n₁·n₀ < 2⁶² per group (~2·10⁹ rows of each class —
    * route through DECIMAL beyond). */
  def aucBy(df: DataFrame, groupCol: String, labelCol: Column,
            scoreCol: Column): DataFrame = {
    val st = df.groupBy(col(groupCol).as("g"), scoreCol.as("score"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("pos"),
        sum(when(labelCol, 0L).otherwise(1L)).as("neg"))
    val w = Window.partitionBy("g").orderBy(col("score").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = st.withColumn("cumneg", sum(col("neg")).over(w))
    c.groupBy("g").agg(
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * (col("cumneg") - col("neg"))
          + col("neg"))).as("num2"))
      .select(col("g"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          TextOps.round6(col("num2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg")))).as("auc6"))
  }

  /** Population Stability Index between a reference snapshot and a
    * current one over a shared bin expression — the standard corpus /
    * feature drift monitor (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25
    * major shift). `psi = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` over bins.
    *
    * Plan shape: one bounded count aggregate per side, a full outer join
    * on the |bins|-sized frames, totals as two 1-row probes. The f55
    * (WoE) determinism discipline: the ln() argument is one ratio of
    * exact integer products `(cExpᵢ·nAct)/(cActᵢ·nExp)` in a fixed
    * association; per-bin terms floor to exact 1e-6-unit longs and the
    * total is their order-free BIGINT sum. Bins empty on either side get
    * a null term and contribute nothing (re-bin upstream — the standard
    * library behavior, same as WoE). */
  def psi(expected: DataFrame, actual: DataFrame,
          binCol: Column): DataFrame = {
    def binned(d: DataFrame, n: String) =
      d.groupBy(binCol.as("bin")).agg(count(lit(1)).as(n))
    psiFromCounts(binned(expected, "n_expected"),
      binned(actual, "n_actual"))
  }

  /** [[psi]] from PRE-AGGREGATED bin counts — the entry a streaming
    * monitor uses: per-epoch histograms are additive, so accumulated
    * micro-batch counts drop straight in and the result equals the
    * batch PSI over everything ingested (e48 proves it). `expected`
    * needs (bin, n_expected); `actual` (bin, n_actual). */
  def psiFromCounts(expected: DataFrame, actual: DataFrame): DataFrame = {
    val joined = graft.Caches.track(
      expected
        .join(actual, Seq("bin"), "full_outer")
        .na.fill(0L, Seq("n_expected", "n_actual"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val t = joined.agg(sum(col("n_expected")), sum(col("n_actual")))
      .head() // 1-row totals probe over the bounded bin frame
    val nExp = t.getLong(0)
    val nAct = t.getLong(1)
    require(nExp > 0 && nAct > 0, "psi needs rows on both sides")
    val lnr = log((col("n_expected").cast("double") * lit(nAct.toDouble))
      / (col("n_actual").cast("double") * lit(nExp.toDouble)))
    val scored = joined
      .withColumn("psi6", when(
        col("n_expected") > 0L && col("n_actual") > 0L,
        TextOps.round6(
          (col("n_expected").cast("double") / lit(nExp.toDouble)
            - col("n_actual").cast("double") / lit(nAct.toDouble)) * lnr)))
      .withColumn("__pu", when(col("psi6").isNotNull,
        floor(col("psi6") * 1e6 + 0.5).cast("long")).otherwise(0L))
    val total = scored.agg(sum(col("__pu"))).head().getLong(0) // 1-row
    scored.select(col("bin"), col("n_expected"), col("n_actual"),
      col("psi6"), lit(total.toDouble / 1e6).as("psi_total"))
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the acceptance metric every ANN index deploy is judged by. Both
    * inputs are (qid, nid) frames; per query, the fraction of exact
    * neighbors the approximate index found. One keyed semi-join + two
    * bounded aggregates; queries the approximate side missed entirely
    * score 0, never drop. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    // the exact side feeds TWO consumers (hit semi-join + k counts) and
    // is typically the expensive brute-force ground truth — persist so
    // it computes once (Catalyst trees are trees, not DAGs)
    val ex = graft.Caches.track(exact
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hits = ex.join(approx, Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    ex.groupBy("qid").agg(count(lit(1)).as("k"))
      .join(hits, Seq("qid"), "left").na.fill(0L, Seq("hits"))
      .select(col("qid"), col("hits"), col("k"),
        TextOps.round6(col("hits").cast("double") / col("k").cast("double"))
          .as("recall6"))
  }

  /** Reliability / calibration bins for a score in [0, 1] against a
    * boolean label: `bins` equal-width buckets (score = 1 folds into the
    * last), each with its count, positive rate, and mean score — the
    * reliability-diagram table a quality-scorer audit plots. ONE
    * partial+final aggregation keyed by bin.
    *
    * Determinism: rate6 is a ratio of exact integers; mean score sums
    * per-row 1e-6-unit floors (order-free BIGINT) and divides by the
    * count in a fixed association — both land on the 6dp floor grid
    * bit-identically in any engine. */
  def calibration(df: DataFrame, labelCol: Column, scoreCol: Column,
                  bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val b = least(floor(scoreCol * bins), lit(bins - 1)).cast("int")
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(labelCol, 1L).otherwise(0L)).as("pos"),
        sum(floor(scoreCol * 1e6 + 0.5).cast("long")).as("__su"))
      .select(col("bin"), col("n"), col("pos"),
        TextOps.round6(col("pos").cast("double") / col("n").cast("double"))
          .as("rate6"),
        TextOps.round6((col("__su").cast("double") / 1e6)
          / col("n").cast("double")).as("mean_score6"))
  }
}
