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

  /** Matthews correlation coefficient of a binary prediction against a
    * binary label — the single confusion-matrix summary that stays
    * honest under class imbalance (accuracy and F1 both don't):
    * `MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN))`.
    * One row: (tp, tn, fp, fn, mcc6).
    *
    * ONE partial+final aggregation collapses the data to four exact
    * BIGINT counts; MCC closes as one fixed-association double
    * expression (left-assoc product chain, same spelling in any
    * oracle). Null when any marginal is zero (degenerate design — a
    * constant label or prediction has no defined correlation). */
  def mcc(df: DataFrame, labelCol: Column, predCol: Column): DataFrame = {
    val agg = df.agg(
      sum(when(labelCol && predCol, 1L).otherwise(0L)).as("tp"),
      sum(when(!labelCol && !predCol, 1L).otherwise(0L)).as("tn"),
      sum(when(!labelCol && predCol, 1L).otherwise(0L)).as("fp"),
      sum(when(labelCol && !predCol, 1L).otherwise(0L)).as("fn"))
    val tp = col("tp").cast("double"); val tn = col("tn").cast("double")
    val fp = col("fp").cast("double"); val fn = col("fn").cast("double")
    val denom2 = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    agg.select(col("tp"), col("tn"), col("fp"), col("fn"),
      when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0
          && col("tn") + col("fp") > 0 && col("tn") + col("fn") > 0,
        floor((tp * tn - fp * fn) / sqrt(denom2) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("mcc6"))
  }

  /** Cramér's V — the [0,1]-normalized effect size of the [[
    * graft.ops.EventOps.chiSquare]] independence test
    * (`V = √(χ²/(N·(min(r,c)−1)))`), so contingency strength compares
    * across tables of different shape. One row:
    * (n, ka, kb, chi2_6, v6).
    *
    * Same cell discipline as e37: per-cell contributions snap to exact
    * micro-unit BIGINTs (order-free sum), the closing V is one
    * fixed-association expression over that exact total. Scale shape:
    * one data-sized count aggregation; everything after runs on the
    * bounded ka×kb cell frame. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = graft.Caches.track(
      df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
        .agg(count(lit(1)).as("obs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rowTot = obs.groupBy("a").agg(sum(col("obs")).as("ra"))
    val colTot = obs.groupBy("b").agg(sum(col("obs")).as("rb"))
    val totRow = obs.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("ka"),
      countDistinct(col("b")).as("kb")).head() // 1-row probe, bounded
    val n = totRow.getLong(0)
    val ka = totRow.getLong(1); val kb = totRow.getLong(2)
    val cells = obs.join(rowTot, "a").join(colTot, "b")
      .withColumn("exp",
        (col("ra") * col("rb")).cast("double") / lit(n.toDouble))
      .withColumn("__cu", floor(
        (col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp")
          * 1e6 + 0.5).cast("long"))
    val chiTotal = cells.agg(sum(col("__cu"))).head().getLong(0) // 1-row
    val minDim = math.min(ka, kb) - 1
    val v6 =
      if (minDim < 1 || n == 0) None
      else Some(math.floor(math.sqrt(chiTotal.toDouble / 1e6
        / (n.toDouble * minDim.toDouble)) * 1e6 + 0.5) / 1e6)
    cells.agg(count(lit(1))).select(
      lit(n).as("n"), lit(ka).as("ka"), lit(kb).as("kb"),
      lit(chiTotal.toDouble / 1e6).as("chi2_6"),
      v6.fold(lit(null).cast("double"))(lit(_)).as("v6"))
  }

  /** Pairwise Jensen–Shannon divergence between groups' token
    * distributions — the bounded symmetric corpus-drift measure
    * (0 = identical mix, ln2 = disjoint vocabularies) a multi-source
    * pipeline reports per source pair. One row per unordered pair:
    * (g1, g2, n_common, jsd6).
    *
    * The exclusive-token mass never joins: a token present only in g1
    * contributes `½·p·ln2`, so those terms COLLAPSE to
    * `½·ln2·(2 − Pc₁ − Pc₂)` where Pcᵢ = the exact-integer common-token
    * probability mass (Σ common counts / total). Only COMMON tokens
    * need the equi-join on token (sort-merge, never all-pairs); the
    * pair predicate g1 < g2 rides that join as a residual filter.
    *
    * Determinism: p, q, m are fixed-association ratios of exact
    * BIGINTs; each common-token term `p·ln(p/m) + q·ln(q/m)` snaps to
    * exact 1e-9-unit longs (order-free sum); ln2 is a pinned double
    * literal; the close is one fixed-association expression on the 6dp
    * grid. The usual zipf-class ln() ulp exposure applies (documented
    * at TextOps.zipfFit). */
  def jsdPairs(df: DataFrame, groupCol: String,
               tokCol: Column): DataFrame = {
    val cnt = graft.Caches.track(df
      .select(col(groupCol).as("g"), tokCol.as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = cnt.groupBy("g").agg(sum(col("c")).as("t"))
    val a = cnt.join(tot, Seq("g"))
      .select(col("g"), col("tok"), col("c"), col("t"))
    val both = a.as("x").join(a.as("y"),
      col("x.tok") === col("y.tok") && col("x.g") < col("y.g"))
    val p = col("x.c").cast("double") / col("x.t").cast("double")
    val q = col("y.c").cast("double") / col("y.t").cast("double")
    val m = (p + q) / lit(2)
    val u = floor((p * log(p / m) + q * log(q / m)) * lit(1e9) + lit(0.5))
      .cast("long")
    val ln2 = 0.693147180559945
    val byPair = both
      .select(col("x.g").as("g1"), col("y.g").as("g2"),
        col("x.c").as("c1"), col("x.t").as("t1"),
        col("y.c").as("c2"), col("y.t").as("t2"), u.as("u"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n_common"), sum(col("u")).as("su"),
        sum(col("c1")).as("sc1"), max(col("t1")).as("t1"),
        sum(col("c2")).as("sc2"), max(col("t2")).as("t2"))
    byPair.select(col("g1"), col("g2"), col("n_common"),
      (floor((lit(0.5) * (col("su").cast("double") / lit(1e9))
        + lit(0.5) * lit(ln2)
          * (lit(2) - col("sc1").cast("double") / col("t1").cast("double")
            - col("sc2").cast("double") / col("t2").cast("double")))
        * lit(1e6) + lit(0.5)) / lit(1e6)).as("jsd6"))
  }

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

  /** Per-group AVERAGE PRECISION (step-interpolated PR-AUC — the
    * acceptance metric for quality classifiers on IMBALANCED corpora,
    * where ROC-AUC stays optimistically high at a 1% positive rate) of
    * a score against a boolean label, via the identity
    * `AP = (1/P) · Σᵢ posᵢ · cpᵢ / ctᵢ` over DISTINCT scores descending
    * (posᵢ = positives at score sᵢ; cpᵢ / ctᵢ = cumulative positives /
    * rows at threshold ≥ sᵢ) — ties collapse into one threshold, the
    * standard step rule. Same plan shape as [[aucBy]]: ONE partial+final
    * aggregation to (group, distinct score) rows, one group-KEYED
    * cumulative window over the score axis, one closing aggregate — no
    * row-level ranking, shuffle carries one row per distinct key.
    *
    * Determinism (the e41/JSD discipline): each term's numerator
    * posᵢ·cpᵢ is an exact integer (≤ P², exact in a double up to
    * P < 9·10⁷ positives per group); the per-threshold ratio is ONE
    * double division spelled identically in the oracle, floored to
    * exact 1e-9-unit longs whose sum is order-free; AP closes as two
    * divisions in fixed association on the 6dp floor grid. Groups with
    * no positives get null AP. Assumes Σᵢ posᵢ·cpᵢ/ctᵢ · 1e9 < 2⁶³
    * per group (~9·10⁹ — route through DECIMAL beyond). */
  def averagePrecisionBy(df: DataFrame, groupCol: String, labelCol: Column,
                         scoreCol: Column): DataFrame = {
    val st = df.groupBy(col(groupCol).as("g"), scoreCol.as("score"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("tot"))
    val w = Window.partitionBy("g").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = st.withColumn("cp", sum(col("pos")).over(w))
      .withColumn("ct", sum(col("tot")).over(w))
    c.groupBy("g").agg(
        sum(col("pos")).as("n_pos"),
        sum(col("tot") - col("pos")).as("n_neg"),
        sum(floor((col("pos") * col("cp")).cast("double")
          / col("ct").cast("double") * lit(1e9) + lit(0.5))
          .cast("long")).as("su"))
      .select(col("g"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L,
          TextOps.round6(col("su").cast("double") / lit(1e9)
            / col("n_pos").cast("double"))).as("ap6"))
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

  /** Multi-class classification report: per-class confusion counts +
    * precision/recall/F1, with global accuracy and Cohen's kappa as
    * constant columns — the label-quality audit a weak-supervision /
    * distillation pipeline runs on its auto-labeler.
    *
    * Determinism is TOTAL here — every statistic is ONE division of
    * exact BIGINTs on the 6dp floor grid: `f1 = 2·tp/(2·tp+fp+fn)`
    * (never the p·r composition, which would stack three float ops) and
    * `kappa = (n·Σtp − Σrᵢcᵢ)/(n² − Σrᵢcᵢ)` (the po/pe form cleared of
    * its denominators). Classes that are never predicted (or never
    * occur) still get a row via the full-outer actual×predicted margin
    * join; their undefined ratios are null, never 0/0.
    *
    * Scale shape: ONE partial+final count keyed by (actual, predicted) —
    * the shuffle carries one row per confusion CELL (k², not n); margins
    * and totals are k-bounded reductions of that frame. Assumes
    * n² < 2⁶³ (n < 3·10⁹ labeled rows — route kappa through DECIMAL
    * beyond). */
  def classificationReport(df: DataFrame, actualCol: Column,
                           predCol: Column): DataFrame = {
    val cells = graft.Caches.track(
      df.groupBy(actualCol.as("label"), predCol.as("pred"))
        .agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rows = cells.groupBy(col("label")).agg(sum("cnt").as("n_actual"))
    val cols = cells.groupBy(col("pred").as("label"))
      .agg(sum("cnt").as("n_pred"))
    val diag = cells.filter(col("label") === col("pred"))
      .select(col("label"), col("cnt").as("tp"))
    val margins = graft.Caches.track(
      rows.join(cols, Seq("label"), "full_outer")
        .na.fill(0L, Seq("n_actual", "n_pred"))
        .join(diag, Seq("label"), "left").na.fill(0L, Seq("tp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // 1-row totals probe over the k-bounded margin frame (psi pattern)
    val t = margins.agg(sum(col("n_actual")), sum(col("tp")),
      sum(col("n_actual") * col("n_pred"))).head()
    val n = t.getLong(0)
    val sumTp = t.getLong(1)
    val sumRC = t.getLong(2)
    require(n > 0, "classificationReport needs rows")
    val acc6 = math.floor(sumTp.toDouble / n.toDouble * 1e6 + 0.5) / 1e6
    val kapDen = n * n - sumRC
    val kappa6: Any =
      if (kapDen > 0L)
        math.floor((n * sumTp - sumRC).toDouble / kapDen.toDouble * 1e6
          + 0.5) / 1e6
      else null
    margins.select(col("label"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_actual") - col("tp")).as("fn"),
        when(col("n_pred") > 0L, TextOps.round6(
          col("tp").cast("double") / col("n_pred").cast("double")))
          .as("prec6"),
        when(col("n_actual") > 0L, TextOps.round6(
          col("tp").cast("double") / col("n_actual").cast("double")))
          .as("rec6"),
        when(col("n_pred") + col("n_actual") > 0L, TextOps.round6(
          lit(2.0) * col("tp").cast("double")
            / (lit(2L) * col("tp") + (col("n_pred") - col("tp"))
              + (col("n_actual") - col("tp"))).cast("double")))
          .as("f16"),
        lit(acc6).as("accuracy6"),
        lit(kappa6).cast("double").as("kappa6"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT and fully
    * distributed: `D = max_x |F₁(x) − F₂(x)|`, computed as the max over
    * distinct values of the INTEGER `|c₁(x)·n₂ − c₂(x)·n₁|` (cleared of
    * both denominators), divided once at the end — no float ECDFs, so
    * the statistic is bit-identical in any engine. Also reports the
    * smallest value attaining the max (the crossing location a drift
    * triage starts from).
    *
    * Scale shape: ONE partial+final count keyed by distinct value (the
    * shuffle carries one row per distinct value), then the distributed
    * range-bucket cumsum ([[graft.core.GlobalWindows]] — never a
    * single-task global window) and a 2-row-probe closing aggregate.
    * Assumes n₁·n₂ < 2⁶² (~2·10⁹ rows per side — DECIMAL beyond). */
  def ksTest(sample1: DataFrame, sample2: DataFrame,
             valueCol: String): DataFrame = {
    val c1 = sample1.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c1"))
    val c2 = sample2.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c2"))
    val byV = c1.join(c2, Seq("v"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
    val byVp = graft.Caches.track(byV
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ser = graft.core.Series.fromExpr(byVp, col("c1"), "c1",
      col("v"), "v")
    val gw = ser.globalWindows(extra = Seq("c2" -> col("c2")))
    val cum2 = gw.cumsumExtra("c2")
    val cum = gw.result("cum1" -> gw.cumsum(), "cum2" -> cum2)
    // 1-row totals probe (distinct-value frame is grouped already)
    val t = byVp.agg(sum(col("c1")), sum(col("c2"))).head()
    val n1 = t.getLong(0)
    val n2 = t.getLong(1)
    require(n1 > 0 && n2 > 0, "ksTest needs rows on both sides")
    val gap = abs(col("cum1") * lit(n2) - col("cum2") * lit(n1))
    val gaps = graft.Caches.track(cum.select(col("v"), gap.as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val gmax = gaps.agg(max(col("g"))).head().getLong(0) // 1-row probe
    // ties at the max gap break to the SMALLEST value — deterministic
    // (min_by's tie pick is engine-arbitrary, so never use it here)
    gaps.filter(col("g") === gmax).agg(min(col("v")).as("at_value"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"),
        TextOps.round6(lit(gmax.toDouble)
          / (lit(n1.toDouble) * lit(n2.toDouble))).as("ks6"),
        col("at_value"))
  }

  /** NDCG position discounts 1/log₂(i+1) for positions 1..10, PINNED as
    * exact micro-unit integers floor(1e6/log₂(i+1)+0.5) — DCG becomes a
    * pure integer dot product, zero engine-log exposure. */
  private val NdcgU: Seq[Long] = Seq(1000000L, 630930L, 500000L, 430677L,
    386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** NDCG@k of an approximate RANKED retrieval against the exact one —
    * the order-sensitive sibling of [[recallAtK]] (recall can't see that
    * the index returned the right neighbors in the wrong order). Both
    * inputs are (qid, rk, nid) frames, rk = 1-based rank. Positions
    * beyond the pinned table (rk > 10) carry an explicit 0 discount
    * (truncated-DCG semantics) rather than a silent null.
    * Relevance is graded by the exact ranking: the exact j-th neighbor
    * carries rel = k−j+1.
    *
    * Determinism is TOTAL: position discounts are the pinned
    * [[NdcgU]] micro-unit integers, so DCG and ideal-DCG are exact
    * BIGINT dot products and ndcg6 is their single division on the 6dp
    * floor grid. Queries the approximate side missed entirely score 0,
    * never drop. Keyed joins + bounded per-query aggregates only. */
  def ndcgAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    // ranks beyond the pinned discount table contribute an EXPLICIT 0
    // (when-guarded, so element_at never sees an out-of-range index —
    // no silent non-ANSI null, no ANSI-mode throw); position > |table|
    // carrying zero discount is the standard truncated-DCG semantics
    def discount(rk: Column): Column =
      when(rk.between(1, NdcgU.length),
        element_at(array(NdcgU.map(lit): _*), rk.cast("int")))
        .otherwise(lit(0L))
    val kf = exact.groupBy("qid").agg(count(lit(1)).as("k"))
    // exact-with-k feeds BOTH the ideal-DCG and the relevance lookup
    val exk = graft.Caches.track(exact.join(kf, "qid")
      .select(col("qid"), col("nid"), col("rk"),
        (col("k") - col("rk") + lit(1L)).as("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val idcg = exk
      .select(col("qid"),
        (col("rel") * discount(col("rk"))).as("c"))
      .groupBy("qid").agg(sum(col("c")).as("idcg_u"))
    val dcg = approx
      .join(exk.select(col("qid"), col("nid"), col("rel")),
        Seq("qid", "nid"), "left")
      .na.fill(0L, Seq("rel"))
      .select(col("qid"),
        (col("rel") * discount(col("rk"))).as("c"))
      .groupBy("qid").agg(sum(col("c")).as("dcg_u"))
    idcg.join(dcg, Seq("qid"), "left").na.fill(0L, Seq("dcg_u"))
      .select(col("qid"), col("dcg_u"), col("idcg_u"),
        TextOps.round6(col("dcg_u").cast("double")
          / col("idcg_u").cast("double")).as("ndcg6"))
  }

  /** Benford expected first-digit proportions log₁₀(1+1/d), PINNED as
    * their 6dp floors — literals on both engine sides, so no log() is
    * ever computed at query time. */
  private val BenfordExp6: Seq[Double] = Seq(0.301030, 0.176091, 0.124939,
    0.096910, 0.079181, 0.066947, 0.057992, 0.051153, 0.045757)

  /** Benford's-law conformity screen over a POSITIVE integer column
    * (money in cents, counts — pass micro-units, the leading significant
    * digit is scale-invariant): per-digit observed vs expected
    * proportions plus the closing MAD statistic (Nigrini's conformity
    * measure; < 0.006 close, 0.006–0.012 acceptable, > 0.015 suspect) —
    * the fabricated-data / corrupted-feed tripwire a financial-grade
    * ingest runs.
    *
    * Scale shape: ONE partial+final count keyed by the 9 digits (the
    * digit extraction rides the scan); everything downstream is 9-row
    * arithmetic. Digits that never occur still report (n=0) via the
    * right-join against the 1..9 frame.
    *
    * Determinism: expected props are pinned literals ([[BenfordExp6]]);
    * obs6 is one exact-integer division on the 6dp floor grid; per-digit
    * |obs−exp| deviations re-snap to exact micro-unit longs and MAD is
    * their order-free sum divided once by 9. */
  def benford(df: DataFrame, intCol: Column): DataFrame = {
    val expArr = array(BenfordExp6.map(lit): _*)
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val counts = graft.Caches.track(digits.join(
        df.filter(intCol > 0L)
          .groupBy(substring(intCol.cast("string"), 1, 1).cast("int")
            .as("digit"))
          .agg(count(lit(1)).as("n")),
        Seq("digit"), "left").na.fill(0L, Seq("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = counts.agg(sum(col("n"))).head().getLong(0) // 1-row, 9 bins
    require(total > 0, "benford needs positive values")
    val scored = graft.Caches.track(counts.select(col("digit"), col("n"),
        TextOps.round6(col("n").cast("double") / lit(total.toDouble))
          .as("obs6"),
        element_at(expArr, col("digit")).as("exp6"))
      .withColumn("__du",
        floor(abs(col("obs6") - col("exp6")) * 1e6 + 0.5).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sumu = scored.agg(sum(col("__du"))).head().getLong(0) // 1-row, 9 bins
    scored.select(col("digit"), col("n"), col("obs6"), col("exp6"),
      lit(math.floor(sumu.toDouble / 9.0 + 0.5) / 1e6).as("mad6"))
  }
}
