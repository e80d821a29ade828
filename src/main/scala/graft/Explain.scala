package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <sfDir> <query...>` prints each
  * query's formatted physical plan — the per-round loop for checking
  * broadcast vs shuffle joins, PushedFilters/ReadSchema pruning, and
  * WholeStageCodegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
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
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
