package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Series

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry exercises the graft library (Series / GFrame / ops.*) and has
  * a DuckDB-equivalent oracle in [[oracleSql]] unless marked rows-only.
  *
  * Determinism discipline (both sides):
  *  - per-row arithmetic is exact IEEE → no rounding;
  *  - floating aggregates are rounded (sum→2dp on money, 6dp on ratios) so
  *    accumulation-order ulp noise can't flip the hash;
  *  - every result is ORDER BY'd on a unique key;
  *  - bigint sums in DuckDB are CAST(… AS BIGINT) (DuckDB widens to HUGEINT).
  */
object SparkEntry {

  /** Unique lineitem row key: l_orderkey*10 + l_linenumber (linenumber ≤ 7). */
  private def liIdx = col("l_orderkey") * 10 + col("l_linenumber")
  private val liIdxSql = "l_orderkey*10 + l_linenumber"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue = Series(l_extendedprice) * (1 - Series(l_discount)), summed —
    * the README flagship expression shape (ref: README.md:8-19) on real data. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val price = Series.fromExpr(li, col("l_extendedprice"), "px", liIdx)
    val disc = Series.fromExpr(li, col("l_discount"), "disc", liIdx)
    val revenue = price * ((disc * -1.0) + 1.0) // px * (1 - disc), Series ops
    revenue.df.agg(round(sum(revenue.df(revenue.name)), 2).as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    seriesQueries ++ frameQueries ++ dedupQueries ++ simQueries ++
      textQueries ++ eventQueries ++ multimodalQueries ++ pipelineQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    seriesOracles ++ frameOracles ++ dedupOracles ++ simOracles ++
      textOracles ++ eventOracles ++ multimodalOracles ++ pipelineOracles

  // ===================================================== Series parity (§2.1)

  private def quantity(s: SparkSession, dir: String): Series =
    Series.fromExpr(Tables.lineitem(s, dir), col("l_quantity"), "qty", liIdx, "idx")
  private def price(s: SparkSession, dir: String): Series =
    Series.fromExpr(Tables.lineitem(s, dir), col("l_extendedprice"), "px", liIdx, "idx")

  private def ordered(ser: Series): DataFrame = ser.df.orderBy(ser.index.asc)

  val seriesQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 #1-3: construction from a keyed column (scale path).
    "s01_construct" -> ((s, d) => ordered(quantity(s, d))),
    // §2.1 #9: sum() — native HashAggregate.
    "s02_sum_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val px = Series.fromExpr(li, col("l_extendedprice"), "px", liIdx, "idx")
      val disc = Series.fromExpr(li, col("l_discount"), "d", liIdx, "idx")
      val rev = px * ((disc * -1.0) + 1.0)
      // decimal accumulation: parallel double sums carry ~1e-5 order noise
      // at 1e9 magnitude, enough to flip a 2dp rounding boundary vs the
      // oracle's sequential sum; decimal is exact and order-free.
      rev.df.agg(round(sum(rev.df(rev.name).cast("decimal(30,8)")), 2)
        .cast("double").as("revenue"))
    }),
    // §2.1 #10-14: mean/std/min/max + count in one pass (describe-equivalent).
    "s03_describe" -> ((s, d) => {
      val q = quantity(s, d)
      val v = col("qty")
      q.df.agg(
        count(v).as("cnt"),
        round(avg(v), 6).as("mean"),
        round(stddev_samp(v), 6).as("std"),
        min(v).as("min"),
        max(v).as("max"))
    }),
    // §2.1 #16: astype over the full lattice (int shown; reference had int only).
    "s04_astype" -> ((s, d) => ordered(quantity(s, d).astype("int").rename("qty_int"))),
    // §2.1 #18: Series ⊕ scalar — native Column expr, no UDF, type-preserving.
    "s05_add_scalar" -> ((s, d) => ordered((quantity(s, d) + 2L).rename("qty2"))),
    "s06_div_scalar" -> ((s, d) => ordered((price(s, d) / 7.0).rename("px7"))),
    // §2.1 #19: floorDiv with floor (not trunc) semantics.
    "s07_floordiv" -> ((s, d) => ordered(quantity(s, d).floorDiv(3.0).rename("q3"))),
    // §2.1 #17 (same-base fast path): Series ⊕ Series over one frame composes
    // expressions — one scan, zero joins.
    "s08_mul_series" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val px = Series.fromExpr(li, col("l_extendedprice"), "v", liIdx, "idx")
      val tax = Series.fromExpr(li, col("l_tax"), "v", liIdx, "idx")
      ordered((px * tax).rename("pxtax"))
    }),
    // §2.1 #17 (cross-frame): true pandas index alignment — full-outer join
    // on the index, nulls where labels don't align (the reference instead
    // mixes columns positionally, ref: series.py:206-214).
    "s08b_align_series" -> ((s, d) => {
      val cbal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
        .rename("bal").renameIndex("idx")
      val sbal = Series.fromColumn(Tables.supplier(s, d), "s_acctbal", "s_suppkey")
        .rename("bal").renameIndex("idx")
      ordered(cbal + sbal)
    }),
    // §2.1 #23: label-range slice (the reference's NotImplementedError hole).
    "s09_slice" -> ((s, d) => ordered(quantity(s, d).slice(100L, 500L))),
    // boolean mask s[s > 40].
    "s10_mask" -> ((s, d) => {
      val q = quantity(s, d)
      ordered(q.mask(q > 40.0))
    }),
    // §2.1 #5: dict-map via broadcast lookup join (reference raised
    // NotImplementedError for dict correspondence, ref: series.py:125-130).
    "s11_map_dict" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val nationName = Series
        .fromExpr(cust, col("c_nationkey"), "nation", col("c_custkey"), "idx")
        .mapJoin(Tables.nation(s, d), "n_nationkey", "n_name")
      ordered(nationName)
    }),
    // §2.1 #6-7: rename series + index, visible in physical schema.
    "s12_rename" -> ((s, d) =>
      ordered(quantity(s, d).rename("quantity").renameIndex("rowkey"))),
    // §2.1 #15: head(n) — deterministic: ordered by index.
    "s13_head" -> ((s, d) => ordered(quantity(s, d).head(10))),
    // §2.1 #4: apply — arbitrary Scala closure via typed Dataset.map.
    // Function chosen to be SQL-expressible so the oracle can verify the path.
    "s14_apply" -> ((s, d) => {
      import s.implicits._
      val s2 = quantity(s, d).applyF[Double, Double](v => v * 2.0 + 1.0)
      ordered(s2.rename("q21"))
    }),
    // §2.1 #8/22: shape/len — count as a 1-row frame.
    "s15_len" -> ((s, d) => {
      val q = quantity(s, d)
      q.df.agg(count(lit(1)).as("n"))
    }),
    // pandas-surface extras (beyond the reference, toward full parity
    // with what a pandas user expects of a Series).
    "s16_value_counts" -> ((s, d) => quantity(s, d).valueCounts()),
    "s17_fillna_clip" -> ((s, d) => {
      val cbal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
        .rename("bal").renameIndex("idx")
      val sbal = Series.fromColumn(Tables.supplier(s, d), "s_acctbal", "s_suppkey")
        .rename("bal").renameIndex("idx")
      ordered((cbal + sbal).fillna(0.0).clip(0.0, 5000.0))
    }),
    "s18_cumsum" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
        .rename("bal").renameIndex("idx")
      ordered(bal.cumsum().transform(round(_, 2)))
    }),
    "s19_nlargest" -> ((s, d) => ordered(price(s, d).nlargest(10))),
    "s20_between_mask" -> ((s, d) => {
      val q = quantity(s, d)
      ordered(q.mask(q.between(10.0, 20.0)))
    }),
    "s21_nunique" -> ((s, d) => {
      val q = quantity(s, d)
      // count_distinct skips nulls — same semantics as Series.nunique and
      // the oracle's count(DISTINCT ...).
      q.df.agg(count_distinct(col("qty")).as("n_distinct"))
    }),
    // shift/diff/pct_change over the customer balance series — all three
    // window expressions on ONE bucketed builder: one scan, one shuffle on
    // __bkt, no global-order window (carry=1 replays each bucket's global
    // predecessor row; see GlobalWindows).
    "s22_shift_diff" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      val gw = bal.globalWindows(carry = 1)
      gw.result(
        "prev" -> gw.shift(1),
        "delta" -> round(gw.diff(1), 2),
        "pct" -> round(gw.pctChange(), 6))
        .withColumnRenamed("c_custkey", "idx")
        .orderBy("idx")
    }),
    // average-method rank (pandas rank()) over supplier balances.
    "s23_rank" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.supplier(s, d), "s_acctbal", "s_suppkey")
        .rename("bal").renameIndex("idx")
      ordered(bal.rank().rename("rk"))
    }),
    // trailing-5 rolling mean, null until the window fills.
    "s24_rolling_mean" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
        .rename("bal").renameIndex("idx")
      ordered(bal.rollingMean(5).transform(round(_, 6), "roll5"))
    }),
    // exact interpolated quartiles (percentile, not the approx sketch —
    // sketches aren't cross-engine comparable).
    "s25_quantiles" -> ((s, d) => {
      val q = quantity(s, d)
      q.df.agg(
        round(percentile(col("qty"), lit(0.25)), 6).as("q25"),
        round(percentile(col("qty"), lit(0.5)), 6).as("median"),
        round(percentile(col("qty"), lit(0.75)), 6).as("q75"))
    }),
    // SQL NTILE(7) distributed: value-bucketed rank_first + a pure tile
    // expression over two driver scalars — no global-order window; the
    // oracle is DuckDB's native ntile (remainder-first semantics match).
    // pandas Series.mode() as a frame: ALL maximal-count values
    // ascending — the 1-row max equi-joins back (broadcast), never a
    // nested loop (the scalar mode() gate surfaces only the first).
    "s108_mode" -> ((s, d) => quantity(s, d).modes()),
    "s107_ntile" -> ((s, d) => {
      val bal = Series.fromExpr(Tables.customer(s, d), col("c_acctbal"),
        "tile", col("c_custkey"), "idx")
      ordered(bal.ntile(7))
    }),
    // pandas count/mean/std/sem/skew/kurt + mad: the fused higher-moment
    // surface — ONE aggregate pass (plus mad's 1-row mean probe). Input
    // shifted off the 2dp halfway grid (s58 lesson); sample G1/G2
    // conversions close from the same row, matching DuckDB's natively
    // bias-corrected skewness/kurtosis.
    "s106_moments" -> ((s, d) => {
      val bal = Series.fromExpr(Tables.customer(s, d),
        col("c_acctbal") + lit(0.123456789), "bal", col("c_custkey"), "idx")
      val r6 = graft.ops.TextOps.round6 _
      bal.momentStats().select(col("n"),
        r6(col("mean")).as("mean"), r6(col("std")).as("std"),
        r6(col("sem")).as("sem"), r6(col("skew")).as("skew"),
        r6(col("kurt")).as("kurt"),
        r6(lit(bal.mad().asInstanceOf[Double])).as("mad"))
    }),
    // PARTITIONED window ops — the 100 TB-safe siblings of s18/s22/s23/s24:
    // per-nation cumulative/lagged/rolling/ranked customer balances, all
    // windows partitionBy(c_nationkey) → ONE shuffle on the key, per-group
    // sort, no single-task global window. All four expressions share the
    // base frame, so they compose into a single Window stage over one scan.
    "s26_keyed_windows" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bal = Series.fromColumn(cust, "c_acctbal", "c_custkey")
      val nat = col("c_nationkey")
      cust.select(
        col("c_custkey").as("idx"),
        nat.as("nat"),
        round(bal.cumsumBy(nat).values, 2).as("cum"),
        bal.shiftBy(nat).values.as("prev"),
        round(bal.rollingMeanBy(nat, 3).values, 6).as("roll3"),
        bal.rankBy(nat).values.as("rk"))
        .orderBy("idx")
    }),
    // Series-vs-Series comparison mask (pandas s1[s1 > s2]): same-base
    // comparison composes into one scanned predicate — no join, pushed to
    // the parquet scan.
    "s27_cmp_mask" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val px = Series.fromExpr(li, col("l_extendedprice"), "px", liIdx, "idx")
      val qty = Series.fromExpr(li, col("l_quantity"), "q", liIdx, "idx")
      ordered(px.mask(px > (qty * 1000.0)))
    }),
    // Dict-map with na_action (pandas map(dict, na_action='ignore')) via a
    // literal broadcast map; missing keys → null (flag 'R' is unmapped).
    "s28_map_na" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val flag = Series.fromExpr(li, col("l_returnflag"), "fl", liIdx, "idx")
      ordered(flag.mapValues(Map("A" -> "accepted", "N" -> "none"),
        naAction = Some("ignore")))
    }),
    // cummax/cummin family: global (bucketed two-pass — within-bucket
    // prefix max + exclusive bucket-max offsets) + keyed (scale) variants
    // over one builder frame; the keyed windows ride the nation key.
    "s32_cummax" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bal = Series.fromColumn(cust, "c_acctbal", "c_custkey")
      val gw = bal.globalWindows(extra = Seq("nat" -> col("c_nationkey")))
      val kw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("nat")).orderBy(col("c_custkey"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      gw.result(
        "cmax" -> gw.cummax(),
        "cmax_nat" -> max(gw.value).over(kw),
        "cmin_nat" -> min(gw.value).over(kw))
        .withColumnRenamed("c_custkey", "idx")
        .orderBy("idx")
    }),
    // pandas pd.concat(axis=0): stack two Series; plain union, no shuffle.
    "s31_concat" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val lo = Series.fromColumn(cust.filter(col("c_nationkey") < 5),
        "c_acctbal", "c_custkey").rename("bal").renameIndex("idx")
      val hi = Series.fromColumn(cust.filter(col("c_nationkey") >= 20),
        "c_acctbal", "c_custkey").rename("bal").renameIndex("idx")
      ordered(lo.concat(hi))
    }),
    // idxmax/idxmin (pandas arg-extrema; ties -> smallest label): two
    // TakeOrderedAndProject jobs, per-partition heaps, driver gets one
    // label each.
    "s30_idx_extrema" -> ((s, d) => {
      import s.implicits._
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
      Seq((bal.idxmax().asInstanceOf[Long], bal.idxmin().asInstanceOf[Long]))
        .toDF("idx_max", "idx_min")
    }),
    // pandas cut/qcut binning: fixed-width + quantile buckets, boundaries
    // as bounded driver state, assignment a pure per-row expression.
    "s35_binning" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bal = Series.fromColumn(cust, "c_acctbal", "c_custkey")
      cust.select(
        col("c_custkey").as("idx"),
        bal.cut(8).values.as("bin8"),
        bal.qcut(4).values.as("q4"))
        .orderBy("idx")
    }),
    // pandas iloc positional slice: ordinal row_number window (global —
    // positional semantics are a total order by nature; the documented
    // distributed paths are label slice/head).
    "s40_iloc" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      bal.iloc(100, 110).df.orderBy("c_custkey")
    }),
    // pandas value_counts(normalize=True): per-value share; denominator is
    // a window total over the aggregated (tiny) frame, not a second scan.
    "s41_value_share" -> ((s, d) => {
      val seg = Series.fromColumn(Tables.customer(s, d), "c_mktsegment",
        "c_custkey")
      val vc = seg.valueCounts(normalize = true)
      vc.select(col("c_mktsegment"),
          graft.ops.TextOps.round6(col("share")).as("share"))
        .orderBy(col("share").desc, col("c_mktsegment"))
    }),
    // pandas rolling(n) family beyond mean: keyed trailing frames with
    // min_periods = n null semantics — one shuffle on the key.
    "s39_rolling" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromColumn(ev, "value", "event_id")
      val u = col("user_id")
      ev.select(col("event_id").as("idx"), col("user_id"),
          round(v.rollingSumBy(u, 5).values, 2).as("rs"),
          v.rollingMinBy(u, 5).values.as("rmin"),
          v.rollingMaxBy(u, 5).values.as("rmax"))
        .orderBy("idx")
    }),
    // pandas groupby-ffill/bfill: last/first-ignore-nulls over keyed
    // ordered frames — one shuffle on the key, no single-task window.
    // "view" events carry the observation; other rows fill from it.
    "s38_ffill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev,
        when(col("event_type") === "view", col("value")), "v",
        col("event_id"), "idx")
      ev.select(col("event_id").as("idx"), col("user_id"),
          v.ffillBy(col("user_id")).values.as("ff"),
          v.bfillBy(col("user_id")).values.as("bf"))
        .orderBy("idx")
    }),
    // pandas corr/cov/mode: same-base pairs aggregate on one scan (no
    // join); mode is a partial+final value count + ordered take. The three
    // results are bounded driver scalars re-emitted as a 1-row frame.
    "s37_corr_mode" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val q = Series.fromColumn(li, "l_quantity", "l_orderkey")
      val p = Series.fromColumn(li, "l_extendedprice", "l_orderkey")
      Seq((q.corr(p), q.cov(p), q.mode().asInstanceOf[Double]))
        .toDF("corr_qp", "cov_qp", "mode_q")
        .select(round(col("corr_qp"), 6).as("corr_qp"),
          round(col("cov_qp"), 2).as("cov_qp"), col("mode_q"))
    }),
    // pandas Series.explode: array values fan out one row per element,
    // repeating the index label; explode_outer keeps pandas' NaN row for
    // empty/null arrays. Per-partition Generate — no shuffle.
    "s36_explode" -> ((s, d) => {
      val dd = Tables.documents(s, d)
      val toks = Series.fromExpr(dd, graft.ops.TextOps.tokens(col("text")),
        "tok", col("doc_id"), "idx")
      toks.explode().df.orderBy("idx", "tok")
    }),
    // pandas .str accessor surface: vectorized string methods, all pure
    // Column expressions composing against one shared base scan.
    "s33_str_ops" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val nm = Series.fromColumn(cust, "c_name", "c_custkey")
      cust.select(
        col("c_custkey").as("idx"),
        nm.str.upper.values.as("up"),
        nm.str.len.values.as("n"),
        nm.str.contains("11").values.as("has11"),
        nm.str.replace("Customer#", "C").values.as("cname"),
        nm.str.slice(0, 8).values.as("head8"),
        nm.str.startswith("Customer").values.as("isc"))
        .orderBy("idx")
    }),
    // pandas .dt accessor surface: calendar parts (dayofweek in the pandas
    // Monday=0 convention) over the events timestamps.
    "s34_dt_parts" -> ((s, d) => {
      val e = Tables.events(s, d)
      val ts = Series.fromColumn(e, "ts", "event_id")
      e.select(
        col("event_id").as("idx"),
        ts.dt.year.values.as("y"),
        ts.dt.month.values.as("mo"),
        ts.dt.day.values.as("dd"),
        ts.dt.hour.values.as("hh"),
        ts.dt.dayofweek.values.as("dow"),
        ts.dt.date.values.as("dte"))
        .orderBy("idx")
    }),
    // Distributed two-pass prefix-sum cumsum: SAME oracle as s18's global
    // window, but the plan buckets by index range and runs per-bucket
    // windows — no single-task global sort (the scale path for the global
    // ordered-window family).
    "s29_cumsum_dist" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal", "c_custkey")
        .rename("bal").renameIndex("idx")
      ordered(bal.cumsumDistributed(buckets = 32).transform(round(_, 2)))
    }),
    // pandas s[s2.isin(...)]: membership mask from a sibling Series on the
    // SAME base frame — composes into one scanned IN predicate (pushed to
    // the parquet scan), no join.
    "s42_isin_mask" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val q = Series.fromExpr(li, col("l_quantity"), "qty", liIdx, "idx")
      val flag = Series.fromExpr(li, col("l_returnflag"), "fl", liIdx, "idx")
      ordered(q.mask(flag.isin("A", "R")))
    }),
    // pandas Series.unique(): distinct values — partial+final hash
    // aggregate, output bounded by the value domain.
    "s43_unique" -> ((s, d) =>
      quantity(s, d).unique().orderBy("qty")),
    // pandas Series.dropna(): null labels drop in place — a scanned
    // IS NOT NULL filter, no shuffle (nulls injected via the same
    // event_type conditional as s38's ffill fixture).
    "s44_dropna" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev,
        when(col("event_type") === "view", col("value")), "v",
        col("event_id"), "idx")
      ordered(v.dropna())
    }),
    // pandas s.abs().nsmallest(n): elementwise abs composes with the
    // ordered take — TakeOrderedAndProject per-partition heaps, ties
    // broken by index label (pandas keep='first' determinism).
    "s45_abs_nsmallest" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey").rename("bal").renameIndex("idx")
      ordered(bal.abs().nsmallest(15))
    }),
    // pandas sample(frac, random_state): salted md5-prefix Bernoulli draw
    // on the label — per-row predicate pushed to the scan, no shuffle, no
    // sampling pass, byte-reproducible in DuckDB.
    "s46_sample" -> ((s, d) =>
      ordered(quantity(s, d).sample(0.25, "s46"))),
    // pandas duplicated(keep='first'): the flag = one UNORDERED keyed
    // window (min label per value partition), single shuffle on the
    // value, no sort. (dropDuplicates shares the plan — SeriesSpec
    // covers it on unique labels; this fixture's lineitem key has
    // duplicate labels, where tied minima are each "first".)
    "s47_duplicated" -> ((s, d) =>
      ordered(quantity(s, d).duplicated().rename("dup"))),
    // pandas Series.autocorr(lag): corr of the series with its bucketed
    // distributed shift — lag pairs align via GlobalWindows carry rows,
    // corr drops the unmatched head exactly like pandas.
    "s49_autocorr" -> ((s, d) => {
      import s.implicits._
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      Seq(bal.autocorr(1)).toDF("ac1")
        .select(graft.ops.TextOps.round6(col("ac1")).as("ac1"))
    }),
    // pandas groupby().interpolate(method='index'): per-user interpolation
    // of the view-only observations over the event stream, weighting gaps
    // by index-label distance (event_id is the time-like coordinate here) —
    // interior gaps take the index-weighted line between neighbors, leading
    // gaps stay null, trailing gaps carry forward. One shuffle on the key.
    "s48_interpolate" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev,
        when(col("event_type") === "view", col("value")), "v",
        col("event_id"), "idx")
      ev.select(col("event_id").as("idx"), col("user_id"),
          graft.ops.TextOps.round6(
            v.interpolateBy(col("user_id"), "index").values).as("vi"))
        .orderBy("idx")
    }),
    // pandas groupby().interpolate() DEFAULT (method='linear'): rows are
    // equally spaced — gap fractions are POSITIONAL (per-group row number),
    // ignoring the index labels; differs from s48 exactly where other
    // users' event_ids interleave. The position is staged in a projection
    // (a window can't nest in a window), then the same four-window body.
    "s54_interpolate_linear" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev,
        when(col("event_type") === "view", col("value")), "v",
        col("event_id"), "idx")
      v.interpolateBy(col("user_id"), "linear").df
        .select(col("idx"), graft.ops.TextOps.round6(col("v")).as("vl"))
        .orderBy("idx")
    }),
    // pandas groupby().interpolate(limit=2, limit_direction='both'):
    // interior gaps interpolate only within 2 rows of either anchor;
    // leading gaps BACK-fill (direction='both') within 2 rows of the next
    // observation; trailing gaps carry within 2 rows of the last. The
    // limit distances count in staged row positions — same four-window
    // body as s54 plus the two anchor-position windows.
    "s67_interpolate_limit" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev,
        when(col("event_type") === "view", col("value")), "v",
        col("event_id"), "idx")
      v.interpolateBy(col("user_id"), "linear", limit = Some(2),
          limitDirection = "both").df
        .select(col("idx"), graft.ops.TextOps.round6(col("v")).as("vb"))
        .orderBy("idx")
    }),
    // pandas groupby().expanding().median()/.quantile(.25): exact
    // percentile over the cumulative per-group frame (no incremental form
    // exists for an exact order statistic — the percentile re-evaluates
    // per row). Unrounded: both engines interpolate the same two doubles
    // identically (the s57 precedent).
    "s68_expanding_quantile" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = Series.fromExpr(e, col("value"), "v", col("event_id"), "idx")
      e.select(col("event_id").as("idx"), col("user_id"),
          v.expandingMedianBy(col("user_id")).values.as("emed"),
          v.expandingQuantileBy(col("user_id"), 0.25).values.as("eq25"))
        .orderBy("idx")
    }),
    // pandas cumprod, distributed in the log domain: exp(Σ log|x|) with
    // sign-parity and zero prefix counts riding the SAME bucketed scan as
    // cumsum (three cumsumExtra offsets, one stats job). The factor keeps
    // |x| within 1±1e-5 of 1 and flips sign every 7th key so both the
    // magnitude fold and the parity offset are exercised without the
    // product leaving round6 range.
    "s51_cumprod" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val x = Series.fromExpr(cust,
        (lit(1.0) + col("c_acctbal") / lit(1e9))
          * when(col("c_custkey") % 7 === 0, lit(-1.0)).otherwise(lit(1.0)),
        "cp", col("c_custkey"), "idx")
      x.cumprod().df
        .select(col("idx"), graft.ops.TextOps.round6(col("cp")).as("cp"))
        .orderBy("idx")
    }),
    // STRING-indexed global windows: the index coordinate is the first 8
    // bytes after the corpus common prefix ("Customer#"), so cumsum /
    // position / cummax all run the distributed bucket plan — no
    // single-task window (PlanLintSpec asserts this for every gate).
    "s52_string_index" -> ((s, d) => {
      val bal = Series.fromExpr(Tables.customer(s, d), col("c_acctbal"),
        "bal", col("c_name"), "idx")
      val g = bal.globalWindows()
      g.result("bal" -> round(g.cumsum(), 2), "pos" -> g.position(),
          "cmax" -> g.cummax())
        .orderBy("idx")
    }),
    // pandas ewm(alpha=0.1, adjust=True).mean()/.var(): the recurrence is
    // distributed as per-bucket decayed partials + a driver-folded carry
    // (every factor <= 1 — stable at any depth). Centering/scaling acctbal
    // keeps the mean^2 cancellation in the var formula far inside round6
    // tolerance; the oracle replays the exact sequential recurrence as a
    // DuckDB recursive CTE.
    "s50_ewm" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val x = Series.fromExpr(sup,
        (col("s_acctbal") - lit(4500.0)) / lit(1000.0), "x",
        col("s_suppkey"), "idx")
      x.ewm(0.1).stats
        .select(col("idx"),
          graft.ops.TextOps.round6(col("ewm_mean")).as("em"),
          graft.ops.TextOps.round6(col("ewm_var")).as("ev"))
        .orderBy("idx")
    }),
    // pandas ewm(span=9, adjust=False): the recurrence EMA spelling —
    // span=9 → α=0.2 exactly, adjust=False reweights only the FIRST
    // observation (numF = α·num + (1−α)·first), so the gate exercises the
    // first-observation carry fold on the same bucketed plan as s50. The
    // oracle is the direct pandas recurrence y=(1−α)y+αx as a recursive
    // CTE (supplier has no null balances, so Σw≡1 and var=(s2−m²)/(1−q)).
    "s66_ewm_adjust" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val x = Series.fromExpr(sup,
        (col("s_acctbal") - lit(4500.0)) / lit(1000.0), "x",
        col("s_suppkey"), "idx")
      x.ewmSpan(9.0, adjust = false).stats
        .select(col("idx"),
          graft.ops.TextOps.round6(col("ewm_mean")).as("em"),
          graft.ops.TextOps.round6(col("ewm_var")).as("ev"))
        .orderBy("idx")
    }),
    // pandas expanding().mean()/.std(): three prefix sums (n, Σx, Σx²)
    // on one bucketed scan close the formulas per row; identical
    // sum-of-squares spelling in the oracle. The 9dp shift keeps means
    // of 2dp money values off the rounding halfway grid (see s59).
    "s58_expanding" -> ((s, d) => {
      val bal = Series.fromExpr(Tables.customer(s, d),
        col("c_acctbal") + lit(0.123456789), "bal", col("c_custkey"), "idx")
      bal.expandingStats()
        .select(col("idx"),
          graft.ops.TextOps.round2(col("emean")).as("emean"),
          graft.ops.TextOps.round2(col("estd")).as("estd"))
        .orderBy("idx")
    }),
    // pandas rolling(n).median()/.quantile(q): the sort-based exact
    // percentile evaluated over the same carry-complete trailing frame
    // as the other rolling aggregates (n−1 carry rows per bucket
    // boundary) — still no single-task window. DuckDB's quantile_cont
    // uses the same linear interpolation.
    "s57_rolling_quantile" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey").rename("bal").renameIndex("idx")
      val g = bal.globalWindows(carry = 6)
      g.result("rmed" -> g.rollingMedian(7), "rq25" -> g.rollingQuantile(7, 0.25))
        .orderBy("idx")
    }),
    // pandas groupby().nlargest(k): per-user top-3 event values — the
    // rank predicate sits on the staged row_number so WindowGroupLimit
    // heaps per partition BEFORE the shuffle (plan-audited).
    "s64_topk_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = Series.fromExpr(e, col("value"), "v", col("event_id"), "idx")
      val top = v.nlargestBy(col("user_id"), 3)
      top.df.orderBy("idx")
    }),
    // negative shift (lead) distributed: next / next-next value and the
    // backward difference, all three on ONE bucketed builder — forward
    // carry rows (global first-2 of each following bucket) replayed
    // backward, no single-task global window (see GlobalWindows fcarry).
    "s65_shift_lead" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      val gw = bal.globalWindows(fcarry = 2)
      gw.result(
        "nxt" -> gw.lead(1),
        "nxt2" -> gw.lead(2),
        "bdelta" -> round(gw.diffLead(1), 2))
        .withColumnRenamed("c_custkey", "idx")
        .orderBy("idx")
    }),
    // pandas groupby().rank(method=): all five keyed tie methods — one
    // shuffle on user_id, per-group sorts; 'first' tie-breaks on the
    // unique event_id so both engines agree.
    "s62_rank_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = Series.fromExpr(e, col("value"), "v", col("event_id"), "idx")
      val u = col("user_id")
      e.select(col("event_id").as("idx"), col("user_id"),
          v.rankBy(u).values.as("r_avg"),
          v.rankBy(u, "min").values.as("r_min"),
          v.rankBy(u, "max").values.as("r_max"),
          v.rankBy(u, "first").values.as("r_first"),
          v.rankBy(u, "dense").values.as("r_dense"))
        .orderBy("idx")
    }),
    // pandas resample('1h').sum(): time-bucket downsampling — one
    // partial+final aggregation keyed by the hour bucket.
    "s63_resample" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      v.resample("HOUR", org.apache.spark.sql.functions.sum(_)).df
        .select(col("idx"), graft.ops.TextOps.round2(col("v")).as("total"))
        .orderBy("idx")
    }),
    // cumsum over a POWER-LAW index (idx = 1e9/(c_custkey+1): most rows
    // land in the lowest few % of the range) with quantile-BALANCED
    // buckets — equal-width bucketing would collapse ~all rows into one
    // straggler task; the approx-quantile boundaries spread them evenly.
    // Bucketing is semantics-invariant, so the oracle is the plain
    // window cumsum. (+1: the fixture's custkey starts at 0, and ANSI
    // division by zero aborts even for doubles.)
    "s70_balanced_cumsum" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bal = Series.fromExpr(cust, col("c_acctbal"), "bal",
        floor(lit(1000000000.0) / (col("c_custkey") + 1)), "idx")
      val g = bal.globalWindows(balanced = true)
      g.result("cum" -> round(g.cumsum(), 2)).orderBy("idx")
    }),
    // pandas between_time('09:00', '17:00'): time-of-day selection over
    // the timestamp index — a pure per-row µs-of-day predicate
    // (session-tz independent, sub-second exact), pushdown-friendly.
    "s75_between_time" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      v.betweenTime("09:00", "17:00").df
        .select(col("idx"), round(col("v"), 2).as("v"))
        .orderBy("idx")
    }),
    // pandas rolling('1h').mean()/count() on the timestamp index — the
    // trailing window is a TIME SPAN, not a row count, so the bucketed
    // plan's carries are generated BY EXPRESSION (each row explodes into
    // the following buckets its hour can reach) instead of a driver
    // collect: a range frame's reach is data-dependent and no bounded row
    // carry serves it (RangeWindows). min_periods=1, closed='right'.
    "s76_rolling_time" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      val r = v.rangeWindows(span = 3600L * 1000000L)
      r.result(
          "mean_1h" -> graft.ops.TextOps.round6(r.mean()),
          "n_1h" -> r.count())
        .orderBy("idx")
    }),
    // pandas rolling(20).corr(other)/.cov(other): pairwise trailing
    // window stats over two columns of one scan — the other Series rides
    // the bucketed plan as a passthrough extra; null until 20 complete
    // pairs. corr is a ratio (round6); cov of price×epoch-day magnitude
    // (~5e7) carries ~1e-6 of cross-engine association drift, so it
    // snaps to the nearest 100 — a grid ~1e8× the drift.
    "s77_rolling_corr" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val price = Series.fromExpr(ord, col("o_totalprice"), "price",
        col("o_orderkey"), "idx")
      val day = Series.fromExpr(ord, unix_date(col("o_orderdate")
        .cast("date")).cast("double"), "day", col("o_orderkey"), "idx")
      price.rollingPairStats(day, 20)
        .select(col("idx"), graft.ops.TextOps.round6(col("corr")).as("c"),
          (floor(col("cov") / 100 + 0.5) * 100).cast("double").as("cv"))
        .orderBy("idx")
    }),
    // pandas expanding().corr(other)/.cov(other): cumulative pairwise
    // stats from SIX prefix sums (n, Σx, Σy, Σxy, Σx², Σy²) sharing one
    // bucketed scan and one stats job — no single-task window. corr is a
    // ratio (round6); the expanding cov of price×epoch-day magnitude
    // snaps to the nearest 100 (association drift ~1e-4 absolute at this
    // magnitude — a grid ~1e6× the drift).
    "s78_expanding_corr" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val price = Series.fromExpr(ord, col("o_totalprice"), "price",
        col("o_orderkey"), "idx")
      val day = Series.fromExpr(ord, unix_date(col("o_orderdate")
        .cast("date")).cast("double"), "day", col("o_orderkey"), "idx")
      price.expandingPairStats(day)
        .select(col("idx"), graft.ops.TextOps.round6(col("corr")).as("c"),
          (floor(col("cov") / 100 + 0.5) * 100).cast("double").as("cv"))
        .orderBy("idx")
    }),
    // pandas groupby(user).rolling('1h').mean() — the keyed sibling of
    // s76: a plain keyed RANGE window on the µs coordinate, one shuffle
    // on the key, no bucket machinery. Output keyed by ts (duplicates
    // across users fine — the compare sorts whole rows).
    "s79_rolling_time_by" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      v.rollingRangeMeanBy(col("user_id"), 3600L * 1000000L).rename("m")
        .df.select(col("idx"), graft.ops.TextOps.round6(col("m")).as("m"))
        .orderBy("idx")
    }),
    // pandas rolling(30).skew()/.kurt(): SAMPLE (bias-corrected) G1/G2 —
    // the pandas and DuckDB convention — converted from Spark's
    // population windowed moments by the frame count; scale-free ratios
    // (round6) over the bucketed carry plan.
    "s80_rolling_skew" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val price = Series.fromExpr(ord, col("o_totalprice"), "price",
        col("o_orderkey"), "idx")
      price.rollingMomentStats(30)
        .select(col("idx"), graft.ops.TextOps.round6(col("skew")).as("sk"),
          graft.ops.TextOps.round6(col("kurt")).as("kt"))
        .orderBy("idx")
    }),
    // pandas ewm(alpha=0.1).cov(other, bias=False)/.corr(other): the s50
    // decayed-partial bucket plan extended to SEVEN pairwise co-moments
    // (Σw, Σw², Σwx, Σwy, Σwxy, Σwx², Σwy²) — one pass, driver-folded
    // carries. Centering/scaling both inputs keeps the co-moment
    // cancellation inside round6; the oracle replays the sequential
    // recurrence as a DuckDB recursive CTE with the identical closing
    // algebra.
    "s81_ewm_cov" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val x = Series.fromExpr(sup,
        (col("s_acctbal") - lit(4500.0)) / lit(1000.0), "x",
        col("s_suppkey"), "idx")
      val y = Series.fromExpr(sup,
        (col("s_nationkey") - lit(12.0)) / lit(10.0), "y",
        col("s_suppkey"), "idx")
      x.ewmPairStats(y, 0.1)
        .select(col("idx"),
          graft.ops.TextOps.round6(col("ewm_cov")).as("ec"),
          graft.ops.TextOps.round6(col("ewm_corr")).as("er"))
        .orderBy("idx")
    }),
    // pandas reindex(new_labels, method='ffill'): conform the customer
    // balance series to a label set that mostly MISSES exact labels
    // (10·custkey+3), so every output exercises the as-of carry path.
    // Labels stay distributed end-to-end (never collected); values are
    // exact copies — no rounding needed.
    "s83_reindex" -> ((s, d) => {
      val labels = Tables.orders(s, d)
        .select((col("o_custkey") * 10 + 3).as("lbl")).distinct()
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      val r = bal.reindex(labels, Some("ffill"))
      r.df.select(col(r.indexName).as("idx"), col("c_acctbal").as("bal"))
        .orderBy("idx")
    }),
    // pandas groupby(user).ewm(alpha=0.2).cov(other)/.corr(other): the
    // keyed sibling — independent per-key recurrences, one shuffle, a
    // streaming per-partition scan with the seven pairwise partials. Both
    // engines run the IDENTICAL sequential per-key recurrence, so round6
    // is belt-and-braces only. y = time-of-day, scaled.
    "s82_ewm_cov_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val x = Series.fromExpr(e, col("value"), "x", col("event_id"), "idx")
      val y = Series.fromExpr(e,
        (unix_micros(col("ts")) % lit(86400000000L)).cast("double")
          / lit(1e10), "y", col("event_id"), "idx")
      x.ewmPairStatsBy(col("user_id"), y, 0.2)
        .select(col("idx"), col("key").as("user_id"),
          graft.ops.TextOps.round6(col("ewm_cov")).as("ec"),
          graft.ops.TextOps.round6(col("ewm_corr")).as("er"))
        .orderBy("idx")
    }),
    // pandas rank(pct=True): the distributed value-bucketed rank scaled
    // by one bounded non-null-count scalar — identical doubles in both
    // engines (rank halves / integer count), so no rounding needed.
    "s74_rank_pct" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.supplier(s, d), "s_acctbal",
        "s_suppkey").rename("bal").renameIndex("idx")
      ordered(bal.rankPct().rename("rk"))
    }),
    // pandas rolling(5, center=True).mean(): the label mid-window — the
    // frame reaches 2 rows BACK and 2 rows FORWARD, so the bucketed plan
    // needs both carry directions (lag carries + the new lead carries).
    // The 9dp shift keeps means of 2dp money off the rounding halfway
    // grid (s58 lesson).
    "s71_rolling_center" -> ((s, d) => {
      val bal = Series.fromExpr(Tables.customer(s, d),
        col("c_acctbal") + lit(0.123456789), "bal", col("c_custkey"), "idx")
      ordered(bal.rollingMeanCentered(5)
        .transform(graft.ops.TextOps.round6(_), "c5"))
    }),
    // pandas combine_first: base values patched from a second Series where
    // null or absent — full-outer index alignment + coalesce, one keyed
    // join. Negative balances are nulled on the left so both patch paths
    // (null-fill and absent-label union) are exercised.
    "s72_combine_first" -> ((s, d) => {
      val left = Series.fromExpr(Tables.customer(s, d),
        when(col("c_acctbal") >= 0, col("c_acctbal")), "bal",
        col("c_custkey"), "idx")
      val right = Series.fromColumn(Tables.supplier(s, d), "s_acctbal",
        "s_suppkey").rename("bal").renameIndex("idx")
      ordered(left.combineFirst(right))
    }),
    // pandas groupby().resample('1h').sum(): per-type hourly downsampling —
    // ONE partial+final aggregation keyed by (type, hour bucket).
    "s73_resample_by" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      v.resampleBy(col("event_type"), "HOUR",
          org.apache.spark.sql.functions.sum(_))
        .select(col("idx"), col("key"),
          graft.ops.TextOps.round2(col("v")).as("total"))
        .orderBy("idx", "key")
    }),
    // pandas resample('h').ffill() — UPSAMPLING: hourly grid over the
    // sparse purchase stream; every grid point takes the last purchase
    // value at-or-before it (reindex-ffill). Grid rows generate
    // distributed (spark.range over the bounded hour count) and the fill
    // rides the un-keyed as-of machinery — bucketed by time, one carry
    // row per bucket, no single-task window.
    "s69_resample_ffill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev.filter(col("event_type") === "purchase"),
        col("value"), "v", col("ts"), "idx")
      v.resampleFfill("HOUR", 3600L).df
        .select(col("idx"), graft.ops.TextOps.round2(col("v")).as("v"))
        .orderBy("idx")
    }),
    // pandas groupby(k).cumcount() + groupby(k).ngroup(): arrival ordinal
    // within each group (one keyed window) and the group's ordinal among
    // all groups sorted by key (dense rank of the KEY through the
    // value-bucketed distributed rank machinery — no global-order window,
    // no driver group list).
    "s84_cumcount_ngroup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("event_id"), "idx")
      val key = col("user_id") % 100
      val cc = v.cumcountBy(key)
      val ng = v.ngroupBy(key)
      cc.df.select(col("idx"), col(cc.name).as("cc"))
        .join(ng.df.select(col("idx"), col(ng.name).as("ng")), Seq("idx"))
        .orderBy("idx")
    }),
    // pandas value_counts(bins=10): fixed-width histogram with zero-filled
    // empty bins (min/max are two bounded driver scalars; the counts
    // frame is bins-bounded and broadcast into the zero-fill join).
    "s85_value_counts_bins" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      bal.valueCountsBins(10).orderBy("bin")
    }),
    // pandas duplicated(keep='first'/'last'/False): all three flags from
    // ONE unordered value-partition Window node (single shuffle). Key =
    // o_custkey (repeat buyers), index = o_orderkey.
    "s86_duplicated_keep" -> ((s, d) => {
      val ck = Series.fromColumn(Tables.orders(s, d), "o_custkey",
        "o_orderkey")
      ck.duplicatedFlags()
        .select(col(ck.indexName).as("idx"), col("dup_first"),
          col("dup_last"), col("dup_all"))
        .orderBy("idx")
    }),
    // pandas Series.searchsorted(probes, side): insertion positions of a
    // DISTRIBUTED probe set among the sorted lineitem prices — distinct-
    // value counts → bucketed distributed cumsum → a strict ('left') /
    // inclusive ('right') global as-of lookup; probes never collect.
    "s94_searchsorted" -> ((s, d) => {
      val px = price(s, d)
      val probes = Tables.orders(s, d).select(col("o_totalprice")).distinct()
      px.searchsorted(probes, "left").withColumnRenamed("pos", "pos_l")
        .join(px.searchsorted(probes, "right")
          .withColumnRenamed("pos", "pos_r"), Seq("o_totalprice"))
        .orderBy("o_totalprice")
    }),
    // pandas Series.is_monotonic_increasing/_decreasing + any()/all():
    // driver-facing scalar probes, FUSED — each series answers its whole
    // probe bundle (both monotonic directions + any/all) from ONE bucketed
    // diff pass closed by ONE 1-row aggregate (Series.monotonicStats; the
    // five separate probes used to cost ≈ 8 serial jobs). The gate
    // re-lifts the five scalars into a 1-row frame.
    "s97_monotonic_any" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // value and index both o_orderkey: alias the value side so the
      // two-column frame doesn't carry duplicate attribute names
      val key = Series.fromExpr(o, col("o_orderkey"), "v",
        col("o_orderkey"), "idx")
      val tp = Series.fromExpr(o, col("o_totalprice"), "v",
        col("o_orderkey"), "idx")
      val ks = key.monotonicStats()
      val ts = tp.monotonicStats(anyPred = _ > 400000.0,
        allPred = _ > 0.0)
      s.range(1).select(
        lit(ks.increasing).as("mi_key"),
        lit(ks.decreasing).as("md_key"),
        lit(ts.increasing).as("mi_tp"),
        lit(ts.anyTrue).as("any_big"),
        lit(ts.allTrue).as("all_pos"))
    }),
    // 100 TB global expanding().quantile(): mergeable Greenwald–Khanna
    // sketches — one ordered pass per range bucket, `buckets` compressed
    // sketches of driver state, exclusive prefix-merges broadcast back
    // (Series.expandingQuantileApprox). The exact variant is deliberately
    // single-task (unbounded prefix multiset — no bounded carry exists);
    // this is its documented scale path.
    // pandas DEFAULT s.interpolate() — global, un-keyed, method='linear':
    // interior nulls take the positional line between non-null neighbors,
    // leading gaps stay null, trailing gaps carry the last observation.
    // Two bucketed passes (stage global position, then interpolate over
    // it), cross-bucket context = four bounded offsets; no single-task
    // window. Per-row IEEE arithmetic on exact inputs with the identical
    // oracle spelling → bit-deterministic, no rounding needed.
    "s109_interpolate" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val v = Series.fromExpr(o,
        when(pmod(col("o_orderkey"), lit(7)).isin(2, 3),
          lit(null).cast("double")).otherwise(col("o_totalprice")),
        "px", col("o_orderkey"), "idx")
      ordered(v.interpolate())
    }),
    // s.interpolate(method='index', limit=2, limit_direction='both'):
    // fraction weights by index-LABEL distance (orderkeys are sparse, so
    // this differs from s106's positional line), the limit counts rows
    // from each run's anchors, and 'both' back-fills leading edges too.
    "s110_interp_index_limit" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val v = Series.fromExpr(o,
        when(pmod(col("o_orderkey"), lit(7)).isin(2, 3),
          lit(null).cast("double")).otherwise(col("o_totalprice")),
        "px", col("o_orderkey"), "idx")
      ordered(v.interpolate("index", Some(2), "both"))
    }),
    // s.interpolate(method='nearest'): interior nulls snap to the
    // CLOSER anchor by index distance (ties -> previous) — the
    // categorical/step-data fill where a fractional line is wrong.
    "s111_interp_nearest" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val v = Series.fromExpr(o,
        when(pmod(col("o_orderkey"), lit(7)).isin(2, 3),
          lit(null).cast("double")).otherwise(col("o_totalprice")),
        "px", col("o_orderkey"), "idx")
      ordered(v.interpolate("nearest"))
    }),
    // The approx values are sketch elements (engine-specific), so the
    // gate certifies them: 16 idx-threshold checkpoints, each carrying
    // the EXACT prefix count + anchor row (hash-gated) and an in-band
    // indicator — the sketch median at the checkpoint's last row must
    // sit inside the exact 0.5∓0.03 prefix-percentile band (the GK
    // eps=0.01 rank guarantee + interpolation slack; oracle pins TRUE).
    // Membership explodes each row to its ≥-thresholds (sequence — an
    // equi-joinable column, no range join); checkpoint width is one
    // driver scalar. Per-row output stays SeriesSpec-bounded.
    "s105_expanding_qtile_approx" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val approx = Series.fromExpr(o, col("o_totalprice"), "v",
        col("o_orderkey"), "idx").expandingQuantileApprox(0.5).df
      val maxI = o.agg(max(col("o_orderkey"))).head().getLong(0) // 1-row probe
      val k = math.ceil(maxI / 16.0).toLong
      val bands = o
        .select(col("o_orderkey").as("idx"),
          col("o_totalprice").as("px"))
        .withColumn("ckpt", explode(sequence(
          (ceil(col("idx").cast("double") / lit(k.toDouble)) * lit(k))
            .cast("long"),
          lit(16L * k), lit(k))))
        .groupBy("ckpt")
        .agg(max(col("idx")).as("idx"),
          count(lit(1)).as("n_prefix"),
          expr("percentile(px, 0.47)").as("__lo"),
          expr("percentile(px, 0.53)").as("__hi"))
      bands.join(approx, "idx")
        .select(col("ckpt"), col("idx"), col("n_prefix"),
          (col("v") >= col("__lo") && col("v") <= col("__hi"))
            .as("med_in_band"))
        .orderBy("ckpt")
    }),
    // Feature scaling: z-score + min-max from one bounded stats row each,
    // then pure projections (the normalize-before-training step).
    "s104_scale" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val q = Series.fromExpr(li, col("l_quantity"), "v",
        col("l_orderkey") * 10 + col("l_linenumber"), "idx")
      li.select((col("l_orderkey") * 10 + col("l_linenumber")).as("idx"),
          graft.ops.TextOps.round6(q.zscore().values).as("z"),
          graft.ops.TextOps.round6(q.minmaxScale().values).as("mm"))
        .orderBy("idx")
    }),
    // pandas str.get_dummies(sep=' ') over declared categories — pure
    // indicator projection, no discovery job, no shuffle.
    "s102_str_dummies" -> ((s, d) => {
      val part = Tables.part(s, d)
      Series.fromColumn(part, "p_type", "p_partkey")
        .str.getDummies(" ", Seq("STANDARD", "ECONOMY", "ANODIZED",
          "BRUSHED", "TIN"), prefix = "is_")
        .withColumnRenamed("p_partkey", "idx")
        .orderBy("idx")
    }),
    // pandas factorize(): first-appearance codes — keyed min aggregate +
    // distributed dense rank + a value-keyed join back; nulls code -1.
    "s103_factorize" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val seg = Series.fromColumn(cust, "c_mktsegment", "c_custkey")
        .rename("code").renameIndex("idx")
      ordered(seg.factorize())
    }),
    // Winsorization: clip at the exact [p05, p95] percentile bounds (one
    // 1-row percentile aggregate, grid-snapped so both engines clip
    // against the identical double), then a pure projection.
    "s101_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val px = Series.fromExpr(li, col("l_extendedprice"), "w",
        col("l_orderkey") * 10 + col("l_linenumber"), "idx")
      ordered(px.winsorize(0.05, 0.95))
    }),
    // pandas rank(na_option='top'/'bottom'): the null block ranks before/
    // after every real value — distributed rankAll + one bounded count
    // row; negative balances play the nulls.
    "s100_rank_naopt" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val v = Series.fromExpr(cust,
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")),
        "v", col("c_custkey"), "idx")
      v.rankNa("top").df.select(col("idx"), col("v").as("rank_top"))
        .join(v.rankNa("bottom").df
          .select(col("idx"), col("v").as("rank_bottom")), Seq("idx"))
        .orderBy("idx")
    }),
    // pandas rolling(4, win_type='triang').mean() — weighted trailing
    // window as a lag chain (GlobalWindows bucketed plan, lag carries);
    // min_periods = n via null propagation through the chain.
    "s98_rolling_wintype" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey").rename("bal").renameIndex("idx")
      ordered(bal.rollingWeightedMean(Series.triangWeights(4))
        .transform(graft.ops.TextOps.round6, "wroll4"))
    }),
    // pandas asfreq('10min') over a per-minute resample: value AT each
    // grid point (exact equi-join) or null — no filling; composition of
    // one keyed aggregation + the generated grid left-join.
    "s99_asfreq" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      ordered(v.resample("minute", org.apache.spark.sql.functions.sum(_))
        .asfreq("hour", 600L)
        .transform(graft.ops.TextOps.round6, "v"))
    }),
    // pandas .str extras (split/get/count/pad/repeat): pure Column
    // expressions composing on one scan — get() is try_element_at so an
    // out-of-range index nulls instead of raising under ANSI.
    "s95_str_extras" -> ((s, d) => {
      val part = Tables.part(s, d)
      val nm = Series.fromColumn(part, "p_name", "p_partkey")
      val toks = nm.str.split(" ")
      part.select(
        col("p_partkey").as("idx"),
        toks.str.get(0).values.as("first_tok"),
        toks.str.get(-1).values.as("last_tok"),
        nm.str.count("[aeiou]").values.as("vowels"),
        nm.str.pad(30, "right", ".").values.as("pad30"),
        nm.str.repeat(2).values.as("rep2"))
        .orderBy("idx")
    }),
    // pandas .dt extras (quarter/dayofyear/weekofyear/days_in_month/
    // is_month_start/is_month_end): calendar projections on one scan.
    "s96_dt_extras" -> ((s, d) => {
      val e = Tables.events(s, d)
      val ts = Series.fromColumn(e, "ts", "event_id")
      e.select(
        col("event_id").as("idx"),
        ts.dt.quarter.values.as("q"),
        ts.dt.dayofyear.values.as("doy"),
        ts.dt.weekofyear.values.as("wk"),
        ts.dt.daysinmonth.values.as("dim"),
        ts.dt.isMonthStart.values.as("ms"),
        ts.dt.isMonthEnd.values.as("me"))
        .orderBy("idx")
    }),
    // pandas pct_change(-2): fractional change vs the value two positions
    // AHEAD — rides the forward-carry (lead) bucket plan, no single-task
    // window; per-row division is exact IEEE so no rounding is needed.
    "s93_pct_change_neg" -> ((s, d) => {
      val v = Series.fromExpr(Tables.events(s, d), col("value"), "v",
        col("event_id"), "idx")
      val p = v.pctChange(-2)
      p.df.select(col("idx"), col(p.name).as("pc")).orderBy("idx")
    }),
    // pandas resample('h').ohlc(): the candlestick query — open/high/
    // low/close per hour from ONE partial+final aggregation (min_by/
    // max_by are mergeable, so the map side carries 4 scalars per hour).
    "s92_ohlc" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      v.ohlcBy(date_trunc("HOUR", col("ts")), "hr").orderBy("hr")
    }),
    // pandas groupby(k).idxmax()/.idxmin(): per-group label of the
    // extremum, first-occurrence ties — the rank predicate rides
    // WindowGroupLimit per-partition top-1 heaps before the shuffle.
    "s87_group_idxmax" -> ((s, d) => {
      val v = Series.fromExpr(Tables.events(s, d), col("value"), "v",
        col("event_id"), "idx")
      val key = col("user_id") % 100
      v.idxmaxBy(key, "key").withColumnRenamed("idx", "idx_max")
        .join(v.idxminBy(key, "key").withColumnRenamed("idx", "idx_min"),
          Seq("key"))
        .orderBy("key")
    }),
    // pandas Series.update(other) + where(cond, other)/mask(cond, other):
    // update is a left index-align join (labels preserved, other's
    // non-null values win); where/mask are pure projections.
    "s88_update_where" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val bal = Series.fromColumn(cust, "c_acctbal", "c_custkey")
      val patch = Series.fromExpr(
        cust.filter(col("c_mktsegment") === "BUILDING"),
        col("c_acctbal") * 2, "p", col("c_custkey"), "c_custkey")
      val upd = bal.update(patch)
      val wv = bal.whereValue(_ > 0)
      val mv = bal.maskValue(_ < 0, 0.0)
      upd.df.select(col("c_custkey").as("idx"), col(upd.name).as("upd"))
        .join(cust.select(col("c_custkey").as("idx"),
          wv.values.as("wv"), mv.values.as("mv")), Seq("idx"))
        .orderBy("idx")
    }),
    // pandas cut(bins=[edges], labels=): explicit right-closed intervals,
    // out-of-range → null; a pure per-row when-chain, no driver scan.
    "s89_cut_labels" -> ((s, d) => {
      val bal = Series.fromColumn(Tables.customer(s, d), "c_acctbal",
        "c_custkey")
      val b = bal.cut(Seq(-1000.0, 0.0, 2500.0, 5000.0, 10000.0),
        Seq("debt", "low", "mid", "high"))
      b.df.select(col("c_custkey").as("idx"), col(b.name).as("bin"))
        .orderBy("idx")
    }),
    // pandas dt.floor/ceil/round('h'): exact epoch-µs integer arithmetic
    // (round = ties-to-even like pandas) — three projections on one scan.
    "s91_dt_round" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val t = Series.fromExpr(ev, col("ts"), "t", col("event_id"), "idx")
      val fl = t.dt.floor(3600L)
      val ce = t.dt.ceil(3600L)
      val rd = t.dt.round(3600L)
      ev.select(col("event_id").as("idx"),
          fl.values.as("fl"), ce.values.as("ce"), rd.values.as("rd"))
        .orderBy("idx")
    }),
    // TIMESTAMP-indexed global windows: the bucket coordinate is the
    // epoch-seconds cast, so cumsum + carry shift distribute exactly like
    // the numeric path (ts is unique in the fixture — a prefix sum over
    // duplicate index labels would be order-ambiguous in ANY engine).
    "s60_ts_index" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = Series.fromExpr(ev, col("value"), "v", col("ts"), "idx")
      val g = v.globalWindows(carry = 1)
      g.result("cs" -> graft.ops.TextOps.round6(g.cumsum()),
          "prev" -> g.shift(1))
        .orderBy("idx")
    }),
    // DATE-indexed global windows (epoch-days coordinate): daily order
    // totals first (unique date index), then the distributed cumsum.
    "s61_date_index" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice")).as("total"))
      val v = Series.fromColumn(daily, "total", "d")
      v.cumsum().df
        .select(col("d").as("idx"),
          graft.ops.TextOps.round2(col("total")).as("cum"))
        .orderBy("idx")
    }),
    // pandas groupby().expanding().mean()/.std(): per-user cumulative
    // n/Σx/Σx² as plain keyed-window sums — one shuffle on user_id.
    // The 9dp additive constant moves every mean OFF the decimal halfway
    // grid: means of 2dp money values land EXACTLY on x.xx5 (e.g.
    // (37.71+37.72)/2), where the 1-ulp association drift between
    // Spark's linear and DuckDB's segment-tree window sums flips any
    // fixed-grid rounding; the shift makes boundary hits measure-zero.
    "s59_expanding_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = Series.fromExpr(e, col("value") + lit(0.123456789), "v",
        col("event_id"), "idx")
      v.expandingStatsBy(col("user_id"))
        .select(col("idx"), col("key").as("user_id"),
          graft.ops.TextOps.round2(col("emean")).as("emean"),
          graft.ops.TextOps.round2(col("estd")).as("estd"))
        .orderBy("idx")
    }),
    // pandas groupby().ewm(alpha=0.2): per-user recurrences are
    // independent, so the keyed form needs no carry fold at all — one
    // hash exchange on user_id + a streaming per-group scan. Oracle =
    // per-group recursive CTE (max group depth 86 at sf0.01).
    "s55_ewm_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = Series.fromExpr(e, col("value"), "v", col("event_id"), "idx")
      v.ewmStatsBy(col("user_id"), 0.2)
        .select(col("idx"), col("key").as("user_id"),
          graft.ops.TextOps.round6(col("ewm_mean")).as("em"),
          graft.ops.TextOps.round6(col("ewm_var")).as("ev"))
        .orderBy("idx")
    }),
    // pandas groupby().cumprod(): keyed log-domain product — three plain
    // keyed-window prefix sums (log|x|, sign parity, zeros), one shuffle.
    // The ±(1 + value/1e6) factor keeps magnitudes in round6 range while
    // exercising the parity path every 5th event.
    "s56_cumprod_by" -> ((s, d) => {
      val e = Tables.events(s, d)
      val x = Series.fromExpr(e,
        (lit(1.0) + col("value") / lit(1e6))
          * when(col("event_id") % 5 === 0, lit(-1.0)).otherwise(lit(1.0)),
        "cp", col("event_id"), "idx")
      e.select(col("event_id").as("idx"), col("user_id"),
          graft.ops.TextOps.round6(x.cumprodBy(col("user_id")).values)
            .as("cp"))
        .orderBy("idx")
    }),
    // pandas rank(method=): all five tie methods over ONE bucketed scan —
    // floor(acctbal/100) manufactures dense ties so average/min/max/dense
    // genuinely differ; c_custkey is unique so 'first' is deterministic.
    "s53_rank_methods" -> ((s, d) => {
      val v = Series.fromExpr(Tables.customer(s, d),
        floor(col("c_acctbal") / 100), "v", col("c_custkey"), "idx")
      v.rankAll(Seq("average", "min", "max", "first", "dense"))
        .orderBy("idx")
    })
  )

  val seriesOracles: Map[String, String] = Map(
    "s01_construct" ->
      s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem ORDER BY idx",
    "s02_sum_revenue" ->
      ("SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue FROM lineitem"),
    "s03_describe" ->
      ("SELECT count(l_quantity) AS cnt, round(avg(l_quantity), 6) AS mean, " +
        "round(stddev_samp(l_quantity), 6) AS std, min(l_quantity) AS min, " +
        "max(l_quantity) AS max FROM lineitem"),
    "s04_astype" ->
      s"SELECT $liIdxSql AS idx, CAST(l_quantity AS INTEGER) AS qty_int FROM lineitem ORDER BY idx",
    "s05_add_scalar" ->
      s"SELECT $liIdxSql AS idx, l_quantity + 2 AS qty2 FROM lineitem ORDER BY idx",
    "s06_div_scalar" ->
      s"SELECT $liIdxSql AS idx, l_extendedprice / 7.0 AS px7 FROM lineitem ORDER BY idx",
    // CAST to BIGINT: DuckDB floor() returns DOUBLE, Spark floor() returns
    // BIGINT — without the cast the driver's dtype-strict hash compare fails.
    "s07_floordiv" ->
      s"SELECT $liIdxSql AS idx, CAST(floor(l_quantity / 3.0) AS BIGINT) AS q3 FROM lineitem ORDER BY idx",
    "s08_mul_series" ->
      s"SELECT $liIdxSql AS idx, l_extendedprice * l_tax AS pxtax FROM lineitem ORDER BY idx",
    "s08b_align_series" ->
      ("SELECT coalesce(c_custkey, s_suppkey) AS idx, c_acctbal + s_acctbal AS bal " +
        "FROM customer FULL JOIN supplier ON c_custkey = s_suppkey ORDER BY idx"),
    "s09_slice" ->
      (s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem " +
        s"WHERE $liIdxSql BETWEEN 100 AND 500 ORDER BY idx"),
    "s10_mask" ->
      s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem WHERE l_quantity > 40 ORDER BY idx",
    "s11_map_dict" ->
      ("SELECT c_custkey AS idx, n_name AS nation FROM customer " +
        "LEFT JOIN nation ON c_nationkey = n_nationkey ORDER BY idx"),
    "s12_rename" ->
      s"SELECT $liIdxSql AS rowkey, l_quantity AS quantity FROM lineitem ORDER BY rowkey",
    "s13_head" ->
      s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem ORDER BY idx LIMIT 10",
    "s14_apply" ->
      s"SELECT $liIdxSql AS idx, l_quantity * 2.0 + 1.0 AS q21 FROM lineitem ORDER BY idx",
    "s15_len" ->
      "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    "s16_value_counts" ->
      "SELECT l_quantity AS qty, count(*) AS count FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1",
    "s17_fillna_clip" ->
      ("SELECT coalesce(c_custkey, s_suppkey) AS idx, " +
        "least(greatest(coalesce(c_acctbal + s_acctbal, 0), 0), 5000) AS bal " +
        "FROM customer FULL JOIN supplier ON c_custkey = s_suppkey ORDER BY idx"),
    "s18_cumsum" ->
      ("SELECT c_custkey AS idx, round(sum(c_acctbal) OVER (ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS bal " +
        "FROM customer ORDER BY idx"),
    "s19_nlargest" ->
      (s"SELECT $liIdxSql AS idx, l_extendedprice AS px FROM lineitem " +
        "ORDER BY px DESC, idx LIMIT 10"),
    "s20_between_mask" ->
      (s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem " +
        "WHERE l_quantity BETWEEN 10 AND 20 ORDER BY idx"),
    "s21_nunique" ->
      "SELECT CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct FROM lineitem",
    "s22_shift_diff" ->
      ("SELECT c_custkey AS idx, lag(c_acctbal) OVER (ORDER BY c_custkey) AS prev, " +
        "round(c_acctbal - lag(c_acctbal) OVER (ORDER BY c_custkey), 2) AS delta, " +
        // nullif mirrors try_divide (DuckDB double/0 -> inf, not null)
        "round((c_acctbal - lag(c_acctbal) OVER (ORDER BY c_custkey)) " +
        "/ nullif(lag(c_acctbal) OVER (ORDER BY c_custkey), 0), 6) AS pct " +
        "FROM customer ORDER BY idx"),
    "s23_rank" ->
      ("SELECT s_suppkey AS idx, " +
        "CAST(rank() OVER (ORDER BY s_acctbal) AS DOUBLE) + " +
        "(count(*) OVER (PARTITION BY s_acctbal) - 1) / 2.0 AS rk " +
        "FROM supplier ORDER BY idx"),
    "s24_rolling_mean" ->
      ("SELECT c_custkey AS idx, round(CASE WHEN count(c_acctbal) OVER w = 5 " +
        "THEN avg(c_acctbal) OVER w END, 6) AS roll5 FROM customer " +
        "WINDOW w AS (ORDER BY c_custkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) " +
        "ORDER BY idx"),
    "s108_mode" ->
      """WITH c AS (SELECT l_quantity AS qty, count(*) AS c
           FROM lineitem GROUP BY 1),
         m AS (SELECT max(c) AS c FROM c)
         SELECT qty FROM c JOIN m USING (c) ORDER BY qty""",
    "s107_ntile" ->
      """SELECT c_custkey AS idx,
           CAST(ntile(7) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER)
             AS tile
         FROM customer ORDER BY idx""",
    "s106_moments" ->
      """WITH v AS (SELECT c_acctbal + 0.123456789 AS x FROM customer),
         m AS (SELECT count(x) AS n, avg(x) AS mean,
             stddev_samp(x) AS std, skewness(x) AS skew,
             kurtosis(x) AS kurt FROM v)
         SELECT CAST(n AS BIGINT) AS n,
           floor(mean * 1e6 + 0.5) / 1e6 AS mean,
           floor(std * 1e6 + 0.5) / 1e6 AS std,
           floor(std / sqrt(n) * 1e6 + 0.5) / 1e6 AS sem,
           floor(skew * 1e6 + 0.5) / 1e6 AS skew,
           floor(kurt * 1e6 + 0.5) / 1e6 AS kurt,
           floor((SELECT avg(abs(x - (SELECT mean FROM m))) FROM v)
             * 1e6 + 0.5) / 1e6 AS mad
         FROM m""",
    "s25_quantiles" ->
      ("SELECT round(quantile_cont(l_quantity, 0.25), 6) AS q25, " +
        "round(quantile_cont(l_quantity, 0.5), 6) AS median, " +
        "round(quantile_cont(l_quantity, 0.75), 6) AS q75 FROM lineitem"),
    "s26_keyed_windows" ->
      ("SELECT c_custkey AS idx, c_nationkey AS nat, " +
        "round(sum(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum, " +
        "lag(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS prev, " +
        "round(CASE WHEN count(c_acctbal) OVER w3 = 3 THEN avg(c_acctbal) OVER w3 END, 6) AS roll3, " +
        "CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) AS DOUBLE) + " +
        "(count(*) OVER (PARTITION BY c_nationkey, c_acctbal) - 1) / 2.0 AS rk " +
        "FROM customer " +
        "WINDOW w3 AS (PARTITION BY c_nationkey ORDER BY c_custkey " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) ORDER BY idx"),
    "s27_cmp_mask" ->
      (s"SELECT $liIdxSql AS idx, l_extendedprice AS px FROM lineitem " +
        "WHERE l_extendedprice > l_quantity * 1000.0 ORDER BY idx"),
    "s28_map_na" ->
      (s"SELECT $liIdxSql AS idx, CASE l_returnflag WHEN 'A' THEN 'accepted' " +
        "WHEN 'N' THEN 'none' END AS fl FROM lineitem ORDER BY idx"),
    "s29_cumsum_dist" ->
      ("SELECT c_custkey AS idx, round(sum(c_acctbal) OVER (ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS bal " +
        "FROM customer ORDER BY idx"),
    "s30_idx_extrema" ->
      ("SELECT min(CASE WHEN c_acctbal = (SELECT max(c_acctbal) FROM customer) " +
        "THEN c_custkey END) AS idx_max, " +
        "min(CASE WHEN c_acctbal = (SELECT min(c_acctbal) FROM customer) " +
        "THEN c_custkey END) AS idx_min FROM customer"),
    "s31_concat" ->
      ("SELECT c_custkey AS idx, c_acctbal AS bal FROM customer " +
        "WHERE c_nationkey < 5 " +
        "UNION ALL SELECT c_custkey, c_acctbal FROM customer " +
        "WHERE c_nationkey >= 20 ORDER BY idx"),
    "s35_binning" ->
      ("WITH b AS (SELECT CAST(min(c_acctbal) AS DOUBLE) AS lo, " +
        "CAST(max(c_acctbal) AS DOUBLE) AS hi FROM customer), " +
        "qs AS (SELECT quantile_cont(c_acctbal, [0.25, 0.5, 0.75]) AS cs " +
        "FROM customer) " +
        "SELECT c_custkey AS idx, " +
        "CAST(least(floor((c_acctbal - lo) / ((hi - lo) / 8)), 7) AS INTEGER) AS bin8, " +
        "CAST((CASE WHEN c_acctbal > cs[1] THEN 1 ELSE 0 END) + " +
        "(CASE WHEN c_acctbal > cs[2] THEN 1 ELSE 0 END) + " +
        "(CASE WHEN c_acctbal > cs[3] THEN 1 ELSE 0 END) AS INTEGER) AS q4 " +
        "FROM customer, b, qs ORDER BY idx"),
    "s40_iloc" ->
      ("SELECT c_custkey, c_acctbal FROM (" +
        "SELECT c_custkey, c_acctbal, " +
        "row_number() OVER (ORDER BY c_custkey) - 1 AS pos FROM customer) " +
        "WHERE pos >= 100 AND pos < 110 ORDER BY c_custkey"),
    "s41_value_share" ->
      ("SELECT c_mktsegment, " +
        "floor(count(*) * 1.0 / (SELECT count(*) FROM customer) " +
        "* 1e6 + 0.5) / 1e6 " +
        "AS share FROM customer GROUP BY 1 ORDER BY share DESC, 1"),
    "s39_rolling" ->
      ("WITH r AS (SELECT event_id AS idx, user_id, value, " +
        "count(value) OVER w AS c, sum(value) OVER w AS sv, " +
        "min(value) OVER w AS mn, max(value) OVER w AS mx " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) " +
        "SELECT idx, user_id, " +
        "CASE WHEN c = 5 THEN round(sv, 2) END AS rs, " +
        "CASE WHEN c = 5 THEN mn END AS rmin, " +
        "CASE WHEN c = 5 THEN mx END AS rmax " +
        "FROM r ORDER BY idx"),
    "s38_ffill" ->
      ("SELECT event_id AS idx, user_id, " +
        "last_value(CASE WHEN event_type = 'view' THEN value END " +
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff, " +
        "first_value(CASE WHEN event_type = 'view' THEN value END " +
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bf " +
        "FROM events ORDER BY idx"),
    "s37_corr_mode" ->
      ("SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp, " +
        "(SELECT l_quantity FROM lineitem WHERE l_quantity IS NOT NULL " +
        "GROUP BY 1 ORDER BY count(*) DESC, l_quantity ASC LIMIT 1) " +
        "AS mode_q FROM lineitem"),
    "s36_explode" ->
      ("SELECT t.doc_id AS idx, u.tok FROM " +
        "(SELECT doc_id, list_filter(string_split(lower(text), ' '), " +
        "x -> x <> '') AS ts FROM documents) t " +
        "LEFT JOIN LATERAL (SELECT unnest(t.ts) AS tok) u ON true " +
        "ORDER BY idx, tok"),
    "s33_str_ops" ->
      ("SELECT c_custkey AS idx, upper(c_name) AS up, " +
        "CAST(length(c_name) AS INTEGER) AS n, " +
        "contains(c_name, '11') AS has11, " +
        "replace(c_name, 'Customer#', 'C') AS cname, " +
        "substr(c_name, 1, 8) AS head8, " +
        "starts_with(c_name, 'Customer') AS isc " +
        "FROM customer ORDER BY idx"),
    // dayofweek: DuckDB Sunday=0 → pandas Monday=0 via (d+6)%7; the Spark
    // side maps its Sunday=1 via (d+5)%7 — both land on the pandas
    // convention.
    "s34_dt_parts" ->
      ("SELECT event_id AS idx, CAST(year(ts) AS INTEGER) AS y, " +
        "CAST(month(ts) AS INTEGER) AS mo, CAST(day(ts) AS INTEGER) AS dd, " +
        "CAST(hour(ts) AS INTEGER) AS hh, " +
        "CAST((dayofweek(ts) + 6) % 7 AS INTEGER) AS dow, " +
        "CAST(ts AS DATE) AS dte FROM events ORDER BY idx"),
    "s42_isin_mask" ->
      (s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem " +
        "WHERE l_returnflag IN ('A', 'R') ORDER BY idx"),
    "s43_unique" ->
      "SELECT DISTINCT l_quantity AS qty FROM lineitem ORDER BY qty",
    "s44_dropna" ->
      ("SELECT event_id AS idx, value AS v FROM events " +
        "WHERE event_type = 'view' ORDER BY idx"),
    "s45_abs_nsmallest" ->
      ("SELECT idx, bal FROM (SELECT c_custkey AS idx, abs(c_acctbal) AS bal " +
        "FROM customer ORDER BY bal, idx LIMIT 15) ORDER BY idx"),
    "s46_sample" ->
      (s"SELECT $liIdxSql AS idx, l_quantity AS qty FROM lineitem " +
        s"WHERE substr(md5('s46' || CAST($liIdxSql AS VARCHAR)), 1, 4) " +
        "< '4000' ORDER BY idx"),
    "s47_duplicated" ->
      (s"SELECT idx, dup FROM (SELECT $liIdxSql AS idx, " +
        s"$liIdxSql > min($liIdxSql) OVER (PARTITION BY l_quantity) AS dup " +
        "FROM lineitem) ORDER BY idx"),
    "s49_autocorr" ->
      ("""SELECT floor(corr(bal, prev) * 1e6 + 0.5) / 1e6 AS ac1 FROM (
           SELECT c_acctbal AS bal,
             lag(c_acctbal) OVER (ORDER BY c_custkey) AS prev
           FROM customer)"""),
    "s48_interpolate" ->
      ("""WITH e AS (
           SELECT event_id AS idx, user_id,
             CASE WHEN event_type = 'view' THEN value END AS v
           FROM events),
         w AS (
           SELECT idx, user_id, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wb AS pi,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wf AS ni
           FROM e
           WINDOW wb AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT idx, user_id,
           floor((CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN NULL
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (idx - pi) * 1.0 / (ni - pi) END)
             * 1e6 + 0.5) / 1e6 AS vi
         FROM w ORDER BY idx"""),
    "s54_interpolate_linear" ->
      ("""WITH e AS (
           SELECT event_id AS idx, user_id,
             CASE WHEN event_type = 'view' THEN value END AS v
           FROM events),
         p AS (
           SELECT idx, user_id, v,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY idx)
               AS DOUBLE) AS pos
           FROM e),
         w AS (
           SELECT idx, v, pos,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wb AS pc,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wf AS nc
           FROM p
           WINDOW wb AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT idx,
           floor((CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN NULL
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (pos - pc) / (nc - pc) END)
             * 1e6 + 0.5) / 1e6 AS vl
         FROM w ORDER BY idx"""),
    // s67 = s54's windows + the limit gate: coalesce(d<=2, FALSE) mirrors
    // Spark's null-comparison-is-no-fill semantics on edge runs
    "s67_interpolate_limit" ->
      ("""WITH e AS (
           SELECT event_id AS idx, user_id,
             CASE WHEN event_type = 'view' THEN value END AS v
           FROM events),
         p AS (
           SELECT idx, user_id, v,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY idx)
               AS DOUBLE) AS pos
           FROM e),
         w AS (
           SELECT idx, v, pos,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wb AS pc,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wf AS nc
           FROM p
           WINDOW wb AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY user_id ORDER BY idx
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT idx,
           floor((CASE WHEN v IS NOT NULL THEN v
             WHEN NOT (coalesce(pos - pc <= 2, FALSE)
                    OR coalesce(nc - pos <= 2, FALSE)) THEN NULL
             WHEN pv IS NULL AND nv IS NULL THEN NULL
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (pos - pc) / (nc - pc) END)
             * 1e6 + 0.5) / 1e6 AS vb
         FROM w ORDER BY idx"""),
    "s68_expanding_quantile" ->
      ("""SELECT event_id AS idx, user_id,
           quantile_cont(value, 0.5) OVER w AS emed,
           quantile_cont(value, 0.25) OVER w AS eq25
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s51_cumprod" ->
      ("""WITH v AS (
           SELECT c_custkey AS idx,
             (1.0 + c_acctbal / 1e9)
               * (CASE WHEN c_custkey % 7 = 0 THEN -1.0 ELSE 1.0 END) AS x
           FROM customer)
         SELECT idx,
           floor(((CASE WHEN sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) OVER w
                     % 2 = 1 THEN -1.0 ELSE 1.0 END)
             * exp(sum(ln(abs(x))) OVER w)) * 1e6 + 0.5) / 1e6 AS cp
         FROM v
         WINDOW w AS (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s52_string_index" ->
      ("""SELECT c_name AS idx,
           round(sum(c_acctbal) OVER w, 2) AS bal,
           CAST(row_number() OVER (ORDER BY c_name) AS BIGINT) AS pos,
           max(c_acctbal) OVER w AS cmax
         FROM customer
         WINDOW w AS (ORDER BY c_name
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s64_topk_by" ->
      ("""SELECT idx, v FROM (
           SELECT event_id AS idx, value AS v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS rn
           FROM events)
         WHERE rn <= 3 ORDER BY idx"""),
    "s65_shift_lead" ->
      ("SELECT c_custkey AS idx, " +
        "lead(c_acctbal) OVER (ORDER BY c_custkey) AS nxt, " +
        "lead(c_acctbal, 2) OVER (ORDER BY c_custkey) AS nxt2, " +
        "round(c_acctbal - lead(c_acctbal) OVER (ORDER BY c_custkey), 2) " +
        "AS bdelta FROM customer ORDER BY idx"),
    "s62_rank_by" ->
      ("""SELECT event_id AS idx, user_id,
           CAST(rank() OVER o AS DOUBLE)
             + (count(*) OVER t - 1) / 2.0 AS r_avg,
           CAST(rank() OVER o AS DOUBLE) AS r_min,
           CAST(rank() OVER o + count(*) OVER t - 1 AS DOUBLE) AS r_max,
           CAST(row_number() OVER (PARTITION BY user_id
             ORDER BY value, event_id) AS DOUBLE) AS r_first,
           CAST(dense_rank() OVER o AS DOUBLE) AS r_dense
         FROM events
         WINDOW o AS (PARTITION BY user_id ORDER BY value),
           t AS (PARTITION BY user_id, value)
         ORDER BY idx"""),
    "s63_resample" ->
      ("""SELECT date_trunc('hour', ts) AS idx,
           floor(sum(value) * 1e2 + 0.5) / 1e2 AS total
         FROM events GROUP BY 1 ORDER BY idx"""),
    "s70_balanced_cumsum" ->
      ("""SELECT CAST(floor(1e9 / (c_custkey + 1)) AS BIGINT) AS idx,
           round(sum(c_acctbal) OVER (ORDER BY floor(1e9 / (c_custkey + 1))
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum
         FROM customer ORDER BY idx"""),
    "s75_between_time" ->
      ("""SELECT ts AS idx, round(value, 2) AS v FROM events
         WHERE epoch_us(ts) % 86400000000
           BETWEEN 32400000000 AND 61200000000
         ORDER BY idx"""),
    "s76_rolling_time" ->
      ("""SELECT ts AS idx,
           floor(avg(value) OVER w * 1e6 + 0.5) / 1e6 AS mean_1h,
           count(value) OVER w AS n_1h
         FROM events
         WINDOW w AS (ORDER BY epoch_us(ts)
           RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s77_rolling_corr" ->
      ("""WITH b AS (SELECT o_orderkey AS idx, o_totalprice AS x,
             CAST(datediff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
           FROM orders)
         SELECT idx,
           CASE WHEN count(*) OVER w = 20
             THEN floor(corr(x, y) OVER w * 1e6 + 0.5) / 1e6 END AS c,
           CASE WHEN count(*) OVER w = 20
             THEN floor(covar_samp(x, y) OVER w / 100 + 0.5) * 100 END AS cv
         FROM b
         WINDOW w AS (ORDER BY idx ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s78_expanding_corr" ->
      ("""WITH b AS (SELECT o_orderkey AS idx, o_totalprice AS x,
             CAST(datediff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
           FROM orders)
         SELECT idx,
           CASE WHEN count(*) OVER w >= 2
             THEN floor(corr(x, y) OVER w * 1e6 + 0.5) / 1e6 END AS c,
           CASE WHEN count(*) OVER w >= 2
             THEN floor(covar_samp(x, y) OVER w / 100 + 0.5) * 100 END AS cv
         FROM b
         WINDOW w AS (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s79_rolling_time_by" ->
      ("""SELECT ts AS idx,
           floor(avg(value) OVER w * 1e6 + 0.5) / 1e6 AS m
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s80_rolling_skew" ->
      ("""SELECT o_orderkey AS idx,
           CASE WHEN count(*) OVER w = 30
             THEN floor(skewness(o_totalprice) OVER w * 1e6 + 0.5) / 1e6
             END AS sk,
           CASE WHEN count(*) OVER w = 30
             THEN floor(kurtosis(o_totalprice) OVER w * 1e6 + 0.5) / 1e6
             END AS kt
         FROM orders
         WINDOW w AS (ORDER BY o_orderkey
           ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s81_ewm_cov" ->
      ("""WITH RECURSIVE s AS (
           SELECT s_suppkey AS idx,
             (s_acctbal - 4500.0) / 1000.0 AS x,
             (s_nationkey - 12.0) / 10.0 AS y,
             row_number() OVER (ORDER BY s_suppkey) AS rn
           FROM supplier),
         r AS (
           SELECT idx, rn, x, y,
             CAST(1.0 AS DOUBLE) AS sw, CAST(1.0 AS DOUBLE) AS sw2,
             x AS sx, y AS sy, x * y AS sxy, x * x AS sx2, y * y AS sy2
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.idx, s.rn, s.x, s.y,
             1.0 + 0.9 * r.sw, 1.0 + 0.81 * r.sw2,
             s.x + 0.9 * r.sx, s.y + 0.9 * r.sy,
             s.x * s.y + 0.9 * r.sxy,
             s.x * s.x + 0.9 * r.sx2, s.y * s.y + 0.9 * r.sy2
           FROM r JOIN s ON s.rn = r.rn + 1)
         SELECT idx,
           CASE WHEN sw * sw - sw2 > 0 THEN
             floor((sxy * sw - sx * sy) / (sw * sw - sw2) * 1e6 + 0.5)
               / 1e6 END AS ec,
           CASE WHEN sw * sw - sw2 > 0 THEN
             floor((sxy * sw - sx * sy) / sqrt((sx2 * sw - sx * sx)
               * (sy2 * sw - sy * sy)) * 1e6 + 0.5) / 1e6 END AS er
         FROM r ORDER BY idx"""),
    "s83_reindex" ->
      ("""WITH l AS (SELECT DISTINCT o_custkey * 10 + 3 AS idx
             FROM orders),
           c AS (SELECT c_custkey AS k, c_acctbal AS v FROM customer)
         SELECT l.idx,
           (SELECT v FROM c WHERE c.k <= l.idx
            ORDER BY c.k DESC LIMIT 1) AS bal
         FROM l ORDER BY idx"""),
    "s82_ewm_cov_by" ->
      ("""WITH RECURSIVE s AS (
           SELECT event_id AS idx, user_id, CAST(value AS DOUBLE) AS x,
             (epoch_us(ts) % 86400000000) / 1e10 AS y,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
           FROM events),
         r AS (
           SELECT idx, user_id, rn, x, y,
             CAST(1.0 AS DOUBLE) AS sw, CAST(1.0 AS DOUBLE) AS sw2,
             x AS sx, y AS sy, x * y AS sxy, x * x AS sx2, y * y AS sy2
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.idx, s.user_id, s.rn, s.x, s.y,
             1.0 + 0.8 * r.sw, 1.0 + 0.64 * r.sw2,
             s.x + 0.8 * r.sx, s.y + 0.8 * r.sy,
             s.x * s.y + 0.8 * r.sxy,
             s.x * s.x + 0.8 * r.sx2, s.y * s.y + 0.8 * r.sy2
           FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
         SELECT idx, user_id,
           CASE WHEN sw * sw - sw2 > 0 THEN
             floor((sxy * sw - sx * sy) / (sw * sw - sw2) * 1e6 + 0.5)
               / 1e6 END AS ec,
           CASE WHEN sw * sw - sw2 > 0
               AND (sx2 * sw - sx * sx) * (sy2 * sw - sy * sy) > 0 THEN
             floor((sxy * sw - sx * sy) / sqrt((sx2 * sw - sx * sx)
               * (sy2 * sw - sy * sy)) * 1e6 + 0.5) / 1e6 END AS er
         FROM r ORDER BY idx"""),
    "s74_rank_pct" ->
      ("""SELECT s_suppkey AS idx,
           (CAST(rank() OVER (ORDER BY s_acctbal) AS DOUBLE) +
            (count(*) OVER (PARTITION BY s_acctbal) - 1) / 2.0)
           / count(s_acctbal) OVER () AS rk
         FROM supplier ORDER BY idx"""),
    "s71_rolling_center" ->
      ("""SELECT c_custkey AS idx,
           floor((CASE WHEN count(b) OVER w = 5 THEN avg(b) OVER w END)
             * 1e6 + 0.5) / 1e6 AS c5
         FROM (SELECT c_custkey, c_acctbal + 0.123456789 AS b
               FROM customer)
         WINDOW w AS (ORDER BY c_custkey
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
         ORDER BY idx"""),
    "s72_combine_first" ->
      ("""SELECT idx,
           COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END,
             s_acctbal) AS bal
         FROM (SELECT c_custkey AS idx, c_acctbal FROM customer) c
         FULL JOIN (SELECT s_suppkey AS idx, s_acctbal FROM supplier) s
           USING (idx)
         ORDER BY idx"""),
    "s73_resample_by" ->
      ("""SELECT date_trunc('hour', ts) AS idx, event_type AS key,
           floor(sum(value) * 1e2 + 0.5) / 1e2 AS total
         FROM events GROUP BY 1, 2 ORDER BY idx, key"""),
    // s69: hourly generate_series + per-grid-point latest purchase at or
    // before it; ties at equal ts resolve to the max value (the engine's
    // deterministic (ts, value) pick)
    "s69_resample_ffill" ->
      ("""WITH p AS (
           SELECT ts, value FROM events WHERE event_type = 'purchase'),
         b AS (SELECT date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
               FROM p),
         g AS (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR))
                 AS idx FROM b),
         f AS (
           SELECT g.idx,
             (SELECT p.value FROM p WHERE p.ts <= g.idx
              ORDER BY p.ts DESC, p.value DESC LIMIT 1) AS v
           FROM g)
         SELECT idx, floor(v * 1e2 + 0.5) / 1e2 AS v
         FROM f ORDER BY idx"""),
    // s106: the same four last/first-ignore-nulls anchors + positional
    // line, spelled identically → bit-deterministic, no rounding.
    "s109_interpolate" ->
      ("""WITH t AS (SELECT o_orderkey AS idx,
             CASE WHEN o_orderkey % 7 IN (2, 3) THEN NULL
               ELSE o_totalprice END AS v
           FROM orders),
         p AS (SELECT idx, v,
             CAST(row_number() OVER (ORDER BY idx) AS DOUBLE) AS pos
           FROM t),
         w AS (SELECT idx, v, pos,
             last_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             first_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
           FROM p)
         SELECT idx, CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN NULL WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (pos - pc) / (nc - pc) END AS px
         FROM w ORDER BY idx"""),
    // s111: same anchor frame, interior snaps to the closer anchor by
    // index distance (<= keeps ties on the previous side).
    "s111_interp_nearest" ->
      ("""WITH t AS (SELECT o_orderkey AS idx,
             CASE WHEN o_orderkey % 7 IN (2, 3) THEN NULL
               ELSE o_totalprice END AS v
           FROM orders),
         w AS (SELECT idx, v, CAST(idx AS DOUBLE) AS cx,
             last_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE)
                 END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcx,
             first_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE)
                 END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ncx
           FROM t)
         SELECT idx, CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN NULL WHEN nv IS NULL THEN pv
             WHEN cx - pcx <= ncx - cx THEN pv ELSE nv END AS px
         FROM w ORDER BY idx"""),
    // s107: label-distance line + row-counted limit from both anchors;
    // a NULL limit predicate (edge run missing an anchor) acts as false
    // on both engines.
    "s110_interp_index_limit" ->
      ("""WITH t AS (SELECT o_orderkey AS idx,
             CASE WHEN o_orderkey % 7 IN (2, 3) THEN NULL
               ELSE o_totalprice END AS v
           FROM orders),
         p AS (SELECT idx, v,
             CAST(row_number() OVER (ORDER BY idx) AS DOUBLE) AS pos
           FROM t),
         w AS (SELECT idx, v, pos, CAST(idx AS DOUBLE) AS cx,
             last_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE)
                 END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pcx,
             last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ppos,
             first_value(v IGNORE NULLS) OVER (ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE)
                 END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ncx,
             first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
               OVER (ORDER BY idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS npos
           FROM p)
         SELECT idx, CASE WHEN v IS NOT NULL THEN v
             WHEN NOT (pos - ppos <= 2 OR npos - pos <= 2) THEN NULL
             WHEN (pos - ppos <= 2 OR npos - pos <= 2) IS NULL THEN NULL
             WHEN pv IS NULL AND nv IS NULL THEN NULL
             WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (cx - pcx) / (ncx - pcx) END AS px
         FROM w ORDER BY idx"""),
    // s105: the checkpoint certification — exact prefix counts/anchors
    // verbatim, the sketch-median indicator pinned TRUE (an
    // out-of-band sketch value hash-mismatches). Membership via the
    // same >=-threshold generate_series the Spark sequence spells.
    "s105_expanding_qtile_approx" ->
      ("""WITH mi AS (SELECT max(o_orderkey) AS m FROM orders),
         kk AS (SELECT CAST(ceil(CAST(m AS DOUBLE) / 16.0) AS BIGINT)
             AS k FROM mi),
         member AS (
           SELECT o.o_orderkey AS idx, o.o_totalprice AS px, c.ckpt
           FROM orders o, kk,
             LATERAL (SELECT unnest(generate_series(
               CAST(ceil(CAST(o.o_orderkey AS DOUBLE)
                 / CAST(kk.k AS DOUBLE)) AS BIGINT) * kk.k,
               16 * kk.k, kk.k)) AS ckpt) c)
         SELECT ckpt, max(idx) AS idx, count(*) AS n_prefix,
           TRUE AS med_in_band
         FROM member GROUP BY ckpt ORDER BY ckpt"""),
    "s104_scale" ->
      ("""WITH st AS (SELECT avg(l_quantity) AS mu,
             stddev_samp(l_quantity) AS sd,
             CAST(min(l_quantity) AS DOUBLE) AS lo,
             CAST(max(l_quantity) AS DOUBLE) AS hi
           FROM lineitem)
         SELECT l_orderkey * 10 + l_linenumber AS idx,
           floor(((l_quantity - mu) / sd) * 1e6 + 0.5) / 1e6 AS z,
           floor(((l_quantity - lo) / (hi - lo)) * 1e6 + 0.5) / 1e6 AS mm
         FROM lineitem, st ORDER BY idx"""),
    "s102_str_dummies" ->
      ("""SELECT p_partkey AS idx,
           CASE WHEN list_contains(string_split(p_type, ' '), 'STANDARD')
             THEN 1 ELSE 0 END AS is_STANDARD,
           CASE WHEN list_contains(string_split(p_type, ' '), 'ECONOMY')
             THEN 1 ELSE 0 END AS is_ECONOMY,
           CASE WHEN list_contains(string_split(p_type, ' '), 'ANODIZED')
             THEN 1 ELSE 0 END AS is_ANODIZED,
           CASE WHEN list_contains(string_split(p_type, ' '), 'BRUSHED')
             THEN 1 ELSE 0 END AS is_BRUSHED,
           CASE WHEN list_contains(string_split(p_type, ' '), 'TIN')
             THEN 1 ELSE 0 END AS is_TIN
         FROM part ORDER BY idx"""),
    "s103_factorize" ->
      ("""WITH f AS (SELECT c_mktsegment AS v, min(c_custkey) AS fi
           FROM customer GROUP BY 1),
         c AS (SELECT v,
             CAST(dense_rank() OVER (ORDER BY fi) - 1 AS INTEGER) AS code
           FROM f)
         SELECT cu.c_custkey AS idx, c.code AS code
         FROM customer cu JOIN c ON cu.c_mktsegment = c.v
         ORDER BY idx"""),
    "s101_winsorize" ->
      ("""WITH b AS (SELECT
             floor(quantile_cont(l_extendedprice, 0.05) * 1e6 + 0.5) / 1e6
               AS lo,
             floor(quantile_cont(l_extendedprice, 0.95) * 1e6 + 0.5) / 1e6
               AS hi
           FROM lineitem)
         SELECT l_orderkey * 10 + l_linenumber AS idx,
           least(greatest(l_extendedprice, b.lo), b.hi) AS w
         FROM lineitem, b ORDER BY idx"""),
    "s100_rank_naopt" ->
      ("""WITH s AS (SELECT c_custkey AS idx,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS v
           FROM customer),
         c AS (SELECT count(*) - count(v) AS k, count(v) AS m FROM s),
         r AS (SELECT idx, v,
             CASE WHEN v IS NULL THEN NULL
               ELSE rank() OVER (ORDER BY v)
                 + (count(*) OVER (PARTITION BY v) - 1) / 2.0 END AS rk
           FROM s)
         SELECT idx,
           CASE WHEN v IS NULL THEN (c.k + 1) / 2.0 ELSE rk + c.k END
             AS rank_top,
           CASE WHEN v IS NULL THEN c.m + (c.k + 1) / 2.0 ELSE rk END
             AS rank_bottom
         FROM r, c ORDER BY idx"""),
    // weighted rolling: both sides spell the SAME left-to-right lag chain
    // with exact dyadic weights (triang(4) = .25/.75/.75/.25, Σ = 2) —
    // per-row arithmetic, one association order, no parallel reduction.
    "s98_rolling_wintype" ->
      ("""SELECT c_custkey AS idx,
           floor(((lag(c_acctbal, 3) OVER w * 0.25
             + lag(c_acctbal, 2) OVER w * 0.75
             + lag(c_acctbal, 1) OVER w * 0.75
             + c_acctbal * 0.25) / CAST(2.0 AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS wroll4
         FROM customer WINDOW w AS (ORDER BY c_custkey) ORDER BY idx"""),
    "s99_asfreq" ->
      ("""WITH m AS (SELECT date_trunc('minute', ts) AS mt, sum(value) AS v
               FROM events GROUP BY 1),
         b AS (SELECT date_trunc('hour', min(mt)) AS lo, max(mt) AS hi
               FROM m),
         g AS (SELECT unnest(generate_series(b.lo, b.hi,
                 INTERVAL 10 MINUTE)) AS idx FROM b)
         SELECT g.idx AS idx, floor(m.v * 1e6 + 0.5) / 1e6 AS v
         FROM g LEFT JOIN m ON m.mt = g.idx ORDER BY idx"""),
    "s97_monotonic_any" ->
      ("""WITH d AS (SELECT o_totalprice AS v,
             o_totalprice - lag(o_totalprice) OVER w AS dv,
             o_orderkey - lag(o_orderkey) OVER w AS dk
           FROM orders WINDOW w AS (ORDER BY o_orderkey))
         SELECT bool_and(dk IS NULL OR dk >= 0) AS mi_key,
           bool_and(dk IS NULL OR dk <= 0) AS md_key,
           bool_and(dv IS NULL OR dv >= 0) AS mi_tp,
           bool_or(v > 400000) AS any_big,
           bool_and(v > 0) AS all_pos
         FROM d"""),
    "s95_str_extras" ->
      ("""SELECT p_partkey AS idx,
           list_extract(string_split_regex(p_name, ' '), 1) AS first_tok,
           list_extract(string_split_regex(p_name, ' '), -1) AS last_tok,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER)
             AS vowels,
           rpad(p_name, 30, '.') AS pad30,
           repeat(p_name, 2) AS rep2
         FROM part ORDER BY idx"""),
    "s96_dt_extras" ->
      ("""SELECT event_id AS idx,
           CAST(quarter(ts) AS INTEGER) AS q,
           CAST(dayofyear(ts) AS INTEGER) AS doy,
           CAST(weekofyear(ts) AS INTEGER) AS wk,
           CAST(day(last_day(ts)) AS INTEGER) AS dim,
           day(ts) = 1 AS ms,
           CAST(ts AS DATE) = last_day(ts) AS me
         FROM events ORDER BY idx"""),
    "s94_searchsorted" ->
      ("""WITH d AS (SELECT l_extendedprice AS v, 1 AS w FROM lineitem),
         p AS (SELECT DISTINCT o_totalprice AS v FROM orders),
         u AS (SELECT v, w FROM d UNION ALL SELECT v, 0 AS w FROM p),
         s AS (SELECT v, w,
             sum(w) OVER (ORDER BY v, w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
             sum(w) OVER (ORDER BY v, w DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
           FROM u)
         SELECT v AS o_totalprice, CAST(cl AS BIGINT) AS pos_l,
           CAST(cr AS BIGINT) AS pos_r
         FROM s WHERE w = 0 ORDER BY o_totalprice"""),
    "s93_pct_change_neg" ->
      ("""SELECT event_id AS idx,
           (value - lead(value, 2) OVER win)
             / nullif(lead(value, 2) OVER win, 0) AS pc
         FROM events WINDOW win AS (ORDER BY event_id)
         ORDER BY idx"""),
    "s92_ohlc" ->
      ("""SELECT date_trunc('hour', ts) AS hr,
           arg_min(value, ts) AS "open", max(value) AS high,
           min(value) AS low, arg_max(value, ts) AS "close"
         FROM events GROUP BY 1 ORDER BY hr"""),
    "s87_group_idxmax" ->
      ("""WITH r AS (
           SELECT user_id % 100 AS key, event_id,
             row_number() OVER (PARTITION BY user_id % 100
               ORDER BY value DESC, event_id) AS rmax,
             row_number() OVER (PARTITION BY user_id % 100
               ORDER BY value ASC, event_id) AS rmin
           FROM events WHERE value IS NOT NULL)
         SELECT key,
           CAST(max(CASE WHEN rmax = 1 THEN event_id END) AS BIGINT)
             AS idx_max,
           CAST(max(CASE WHEN rmin = 1 THEN event_id END) AS BIGINT)
             AS idx_min
         FROM r GROUP BY key ORDER BY key"""),
    "s88_update_where" ->
      ("""SELECT c_custkey AS idx,
           CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * 2
                ELSE c_acctbal END AS upd,
           CASE WHEN c_acctbal > 0 THEN c_acctbal END AS wv,
           CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS mv
         FROM customer ORDER BY idx"""),
    "s89_cut_labels" ->
      ("""SELECT c_custkey AS idx,
           CASE WHEN c_acctbal > -1000 AND c_acctbal <= 0 THEN 'debt'
                WHEN c_acctbal > 0 AND c_acctbal <= 2500 THEN 'low'
                WHEN c_acctbal > 2500 AND c_acctbal <= 5000 THEN 'mid'
                WHEN c_acctbal > 5000 AND c_acctbal <= 10000 THEN 'high'
           END AS bin
         FROM customer ORDER BY idx"""),
    "s91_dt_round" ->
      ("""WITH x AS (SELECT event_id, epoch_us(ts) AS us FROM events),
         y AS (SELECT event_id, us, us - us % 3600000000 AS f,
                 us % 3600000000 AS r FROM x)
         SELECT event_id AS idx,
           make_timestamp(f) AS fl,
           make_timestamp(f + CASE WHEN r > 0 THEN 3600000000
             ELSE 0 END) AS ce,
           make_timestamp(CASE WHEN r > 1800000000
               OR (r = 1800000000 AND (f // 3600000000) % 2 = 1)
             THEN f + 3600000000 ELSE f END) AS rd
         FROM y ORDER BY idx"""),
    "s84_cumcount_ngroup" ->
      ("""SELECT event_id AS idx,
           CAST(row_number() OVER (PARTITION BY user_id % 100
             ORDER BY event_id) - 1 AS BIGINT) AS cc,
           CAST(dense_rank() OVER (ORDER BY user_id % 100) - 1
             AS BIGINT) AS ng
         FROM events ORDER BY idx"""),
    "s85_value_counts_bins" ->
      ("""WITH b AS (SELECT CAST(min(c_acctbal) AS DOUBLE) AS lo,
                 CAST(max(c_acctbal) AS DOUBLE) AS hi FROM customer),
         x AS (SELECT CAST(least(floor((c_acctbal - b.lo)
                 / ((b.hi - b.lo) / 10)), 9) AS INTEGER) AS bin
               FROM customer, b WHERE c_acctbal IS NOT NULL),
         c AS (SELECT bin, count(*) AS cnt FROM x GROUP BY 1)
         SELECT CAST(g.i AS INTEGER) AS bin,
           CAST(coalesce(c.cnt, 0) AS BIGINT) AS "count"
         FROM range(0, 10) g(i) LEFT JOIN c ON c.bin = g.i
         ORDER BY bin"""),
    "s86_duplicated_keep" ->
      ("""SELECT o_orderkey AS idx,
           o_orderkey > min(o_orderkey) OVER w AS dup_first,
           o_orderkey < max(o_orderkey) OVER w AS dup_last,
           count(*) OVER w > 1 AS dup_all
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey)
         ORDER BY idx"""),
    "s60_ts_index" ->
      ("""SELECT ts AS idx,
           floor(sum(value) OVER w * 1e6 + 0.5) / 1e6 AS cs,
           lag(value) OVER (ORDER BY ts) AS prev
         FROM events
         WINDOW w AS (ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s61_date_index" ->
      ("""WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS idx,
             sum(o_totalprice) AS total
           FROM orders GROUP BY 1)
         SELECT idx,
           floor(sum(total) OVER (ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1e2 + 0.5) / 1e2 AS cum
         FROM daily ORDER BY idx"""),
    "s59_expanding_by" ->
      ("""WITH e AS (
           SELECT event_id AS idx, user_id,
             value + 0.123456789 AS x
           FROM events)
         SELECT idx, user_id,
           floor((sum(x) OVER w / count(x) OVER w) * 1e2 + 0.5)
             / 1e2 AS emean,
           CASE WHEN count(x) OVER w >= 2 THEN
             floor(sqrt(greatest(
               (sum(x * x) OVER w
                 - (sum(x) OVER w) * (sum(x) OVER w) / count(x) OVER w)
               / (count(x) OVER w - 1), 0)) * 1e2 + 0.5) / 1e2
           END AS estd
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s58_expanding" ->
      ("""WITH c AS (
           SELECT c_custkey AS idx, c_acctbal + 0.123456789 AS x
           FROM customer)
         SELECT idx,
           floor((sum(x) OVER w / count(x) OVER w) * 1e2 + 0.5) / 1e2
             AS emean,
           CASE WHEN count(x) OVER w >= 2 THEN
             floor(sqrt(greatest(
               (sum(x * x) OVER w
                 - (sum(x) OVER w) * (sum(x) OVER w) / count(x) OVER w)
               / (count(x) OVER w - 1), 0)) * 1e2 + 0.5) / 1e2
           END AS estd
         FROM c
         WINDOW w AS (ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s57_rolling_quantile" ->
      ("""SELECT c_custkey AS idx,
           CASE WHEN count(c_acctbal) OVER w = 7
             THEN quantile_cont(c_acctbal, 0.5) OVER w END AS rmed,
           CASE WHEN count(c_acctbal) OVER w = 7
             THEN quantile_cont(c_acctbal, 0.25) OVER w END AS rq25
         FROM customer
         WINDOW w AS (ORDER BY c_custkey
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s55_ewm_by" ->
      ("""WITH RECURSIVE s AS (
           SELECT event_id AS idx, user_id, CAST(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
           FROM events),
         r AS (
           SELECT idx, user_id, rn, x,
             x AS num, CAST(1.0 AS DOUBLE) AS den,
             x * x AS num2, CAST(1.0 AS DOUBLE) AS den2
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.idx, s.user_id, s.rn, s.x,
             s.x + 0.8 * r.num,
             1.0 + 0.8 * r.den,
             s.x * s.x + 0.8 * r.num2,
             1.0 + 0.64 * r.den2
           FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
         SELECT idx, user_id,
           floor((num / den) * 1e6 + 0.5) / 1e6 AS em,
           CASE WHEN rn > 1 THEN
             floor(((num2 / den - (num / den) * (num / den))
               * den * den / (den * den - den2)) * 1e6 + 0.5) / 1e6
           END AS ev
         FROM r ORDER BY idx"""),
    "s56_cumprod_by" ->
      ("""WITH x AS (
           SELECT event_id AS idx, user_id,
             (1.0 + value / 1e6)
               * (CASE WHEN event_id % 5 = 0 THEN -1.0 ELSE 1.0 END) AS v
           FROM events)
         SELECT idx, user_id,
           floor(((CASE WHEN sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) OVER w
                     % 2 = 1 THEN -1.0 ELSE 1.0 END)
             * exp(sum(ln(abs(v))) OVER w)) * 1e6 + 0.5) / 1e6 AS cp
         FROM x
         WINDOW w AS (PARTITION BY user_id ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY idx"""),
    "s50_ewm" ->
      ("""WITH RECURSIVE s AS (
           SELECT s_suppkey AS idx, (s_acctbal - 4500.0) / 1000.0 AS x,
             row_number() OVER (ORDER BY s_suppkey) AS rn
           FROM supplier),
         r AS (
           SELECT idx, rn, x,
             -- CAST the seeds: a DECIMAL(2,1) literal would pin the whole
             -- recursion to one decimal digit of scale
             x AS num, CAST(1.0 AS DOUBLE) AS den,
             x * x AS num2, CAST(1.0 AS DOUBLE) AS den2
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.idx, s.rn, s.x,
             s.x + 0.9 * r.num,
             1.0 + 0.9 * r.den,
             s.x * s.x + 0.9 * r.num2,
             1.0 + 0.81 * r.den2
           FROM r JOIN s ON s.rn = r.rn + 1)
         SELECT idx,
           floor((num / den) * 1e6 + 0.5) / 1e6 AS em,
           CASE WHEN rn > 1 THEN
             floor(((num2 / den - (num / den) * (num / den))
               * den * den / (den * den - den2)) * 1e6 + 0.5) / 1e6
           END AS ev
         FROM r ORDER BY idx"""),
    "s66_ewm_adjust" ->
      ("""WITH RECURSIVE s AS (
           SELECT s_suppkey AS idx, (s_acctbal - 4500.0) / 1000.0 AS x,
             row_number() OVER (ORDER BY s_suppkey) AS rn
           FROM supplier),
         r AS (
           -- adjust=False, no nulls: Σw ≡ 1, so m/s2/q are the direct
           -- recurrences; spell α² and (1−α)² as products so both engines
           -- compute the identical doubles (0.04 literal ≠ 0.2*0.2)
           SELECT idx, rn, x,
             x AS m, x * x AS s2, CAST(1.0 AS DOUBLE) AS q
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.idx, s.rn, s.x,
             0.8 * r.m + 0.2 * s.x,
             0.8 * r.s2 + 0.2 * s.x * s.x,
             (0.8 * 0.8) * r.q + (0.2 * 0.2)
           FROM r JOIN s ON s.rn = r.rn + 1)
         SELECT idx,
           floor(m * 1e6 + 0.5) / 1e6 AS em,
           CASE WHEN rn > 1 THEN
             floor(((s2 - m * m) / (1 - q)) * 1e6 + 0.5) / 1e6
           END AS ev
         FROM r ORDER BY idx"""),
    "s53_rank_methods" ->
      ("""WITH v AS (
           SELECT c_custkey AS idx, floor(c_acctbal / 100) AS v
           FROM customer)
         SELECT idx,
           CAST(rank() OVER o AS DOUBLE)
             + (count(*) OVER t - 1) / 2.0 AS rank_average,
           CAST(rank() OVER o AS DOUBLE) AS rank_min,
           CAST(rank() OVER o + count(*) OVER t - 1 AS DOUBLE) AS rank_max,
           CAST(row_number() OVER (ORDER BY v, idx) AS DOUBLE) AS rank_first,
           CAST(dense_rank() OVER o AS DOUBLE) AS rank_dense
         FROM v
         WINDOW o AS (ORDER BY v), t AS (PARTITION BY v)
         ORDER BY idx"""),
    "s32_cummax" ->
      ("SELECT c_custkey AS idx, " +
        "max(c_acctbal) OVER (ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmax, " +
        "max(c_acctbal) OVER w AS cmax_nat, " +
        "min(c_acctbal) OVER w AS cmin_nat " +
        "FROM customer " +
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY idx")
  )

  // ============================================ placeholders (filled by round)
  def frameQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.FrameQueries.queries
  def frameOracles: Map[String, String] = graft.queries.FrameQueries.oracles
  def dedupQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.DedupQueries.queries
  def dedupOracles: Map[String, String] = graft.queries.DedupQueries.oracles
  def simQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.SimilarityQueries.queries
  def simOracles: Map[String, String] = graft.queries.SimilarityQueries.oracles
  def textQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TextQueries.queries
  def textOracles: Map[String, String] = graft.queries.TextQueries.oracles
  def eventQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.EventQueries.queries
  def eventOracles: Map[String, String] = graft.queries.EventQueries.oracles
  def multimodalQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.MultimodalQueries.queries
  def multimodalOracles: Map[String, String] =
    graft.queries.MultimodalQueries.oracles
  def pipelineQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.PipelineQueries.queries
  def pipelineOracles: Map[String, String] =
    graft.queries.PipelineQueries.oracles
}
