package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the guardrail pass a pipeline
  * runs before promoting a batch (the Great-Expectations/dbt-test shape,
  * spelled Spark-first). Three rule kinds:
  *
  *  - row rules: a named violation predicate per rule, ALL evaluated in
  *    ONE fused scan (one partial+final aggregate, however many rules);
  *  - uniqueness rules: `total − distinct` over the key columns;
  *  - referential rules: orphan count via a left-anti equi-join against
  *    the DISTINCT parent keys.
  *
  * Each rule closes to a single bounded driver scalar (1-row aggregates —
  * the rfm/chi2 probe discipline), and the report itself is a local
  * |rules|-row frame: nothing here ever materializes data on the driver.
  * Null semantics: a violation predicate must evaluate TRUE to count (a
  * null predicate result does not violate — spell `.isNull` explicitly
  * when nulls should); uniqueness counts null keys like any other value
  * is NOT guaranteed (countDistinct skips all-null tuples — declare keys
  * non-null first with a row rule).
  */
object ValidateOps {

  /** One report row per rule: (rule, violations, total, pass), ordered
    * by rule name. `total` is the row count of the frame the rule ran
    * against (the child frame for referential rules). */
  def report(df: DataFrame,
             rowRules: Seq[(String, Column)],
             uniqueRules: Seq[(String, Seq[String])] = Nil,
             fkRules: Seq[(String, DataFrame, String, DataFrame, String)] =
               Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty || fkRules.nonEmpty,
      "at least one rule")
    val spark = df.sparkSession
    val buf = scala.collection.mutable.Buffer.empty[(String, Long, Long)]
    if (rowRules.nonEmpty) buf ++= rowRuleCounts(df, rowRules)
    uniqueRules.foreach { case (n, cols) =>
      val r = df.agg(count(lit(1)),
        countDistinct(col(cols.head), cols.tail.map(col): _*)).head()
      buf += ((n, r.getLong(0) - r.getLong(1), r.getLong(0)))
    }
    fkRules.foreach { case (n, child, childKey, parent, parentKey) =>
      val orphans = child.select(col(childKey).as("__k"))
        .join(parent.select(col(parentKey).as("__k")).distinct(),
          Seq("__k"), "left_anti")
      val bad = orphans.agg(count(lit(1))).head().getLong(0) // 1-row probe
      val total = child.agg(count(lit(1))).head().getLong(0) // 1-row probe
      buf += ((n, bad, total))
    }
    import spark.implicits._
    buf.toSeq.toDF("rule", "violations", "total")
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }

  /** The fused row-rule pass by itself — ALL predicates in ONE
    * partial+final aggregate, (rule, violations, total) per rule; an
    * empty frame counts zero violations (sum of an empty set is null).
    * Shared by [[report]] and the streaming
    * [[graft.streaming.StreamOps.ruleMonitor]] so the null-on-empty
    * semantics live in one place. */
  def rowRuleCounts(df: DataFrame,
                    rules: Seq[(String, Column)]): Seq[(String, Long, Long)] = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.map { case (_, p) =>
      sum(when(p, 1L).otherwise(0L)) } :+ count(lit(1))
    val r = df.agg(aggs.head, aggs.tail: _*).head() // 1 row: rule sums
    val total = r.getLong(rules.size)
    rules.zipWithIndex.map { case ((n, _), i) =>
      (n, if (r.isNullAt(i)) 0L else r.getLong(i), total)
    }
  }

  /** Per-group ROBUST outlier report via median/MAD (the screen that
    * survives the very outliers a mean/stddev z-score is poisoned by):
    * a row is an outlier when |x − median| > k · 1.4826 · MAD (1.4826
    * ≈ the normal-consistency constant; pass `k · 1.4826` pre-multiplied
    * as `kScaled` so both engines compare against one literal product).
    * Returns one row per group: (group, n, med, mad, n_outliers).
    *
    * Scale shape: two keyed exact-percentile aggregates (sort-based
    * within group — groups are the shuffle key either way) + one keyed
    * conditional count; the deviation frame is lazy, nothing collects.
    * Determinism: exact percentiles interpolate identically to DuckDB's
    * quantile_cont (the rolling-median precedent), deviations and the
    * threshold product are per-row IEEE — raw doubles hash-match. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  kScaled: Double): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valCol), lit(0.5)).as("med"))
    val dev = df.select(col(groupCol), col(valCol))
      .join(med, groupCol)
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val st = dev.groupBy(col(groupCol))
      .agg(percentile(col("__dev"), lit(0.5)).as("mad"))
    dev.join(st, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(kScaled) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
