package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per suite (guide: one SparkSession per suite). */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // explode() already skips empty/null arrays; the inferred pre-Generate
      // filter only re-inlines the (heavy) generator expression through the
      // staged projection — ~3 evaluations of every tokenize/shingle tree
      // per row (see PLANS.md, d09 audit).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
