package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration subset (comma-separated names); driver runs the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val queries = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter(q => names(q._1)))
    val spark = Sessions.local(cpus, "graft-bench")
    // Warm-up pass: run every query once (JIT compilation, codegen caches,
    // parquet footer reads, shuffle-service spin-up) — without it, per-query
    // numbers move ±3× between rounds purely on map-iteration order
    // (whichever query ran first paid the JVM warm-up).
    queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      finally Caches.clear() // each invocation persists fresh projections
    }
    // Median of 3 timed passes per query: a single sample still eats
    // GC/compaction pauses (the 15 s periodic GC makes a pause landing
    // inside a 1 s query a 5× outlier — two phantom regressions in round 3).
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      finally Caches.clear()
      (System.nanoTime() - t0) / 1e9
    }
    val results = queries.map { case (name, fn) =>
      val samples = Array.fill(3)(timeOnce(fn)).sorted
      name -> samples(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
