package graft

import org.apache.spark.sql.SparkSession

/** The one place session configuration lives (Verify / Bench / Explain and
  * the test fixture all build here). Each setting is something a cluster
  * deployment would keep, with the local-mode twist noted:
  *
  *  - `shuffle.partitions` = core count locally; on a 1000-executor
  *    cluster this is sized so post-shuffle partitions land near
  *    100–200 MB (or left to AQE coalescing, which is ON by default in
  *    Spark 4 and works with every plan this library emits).
  *  - `legacy.parquet.nanosAsLong`: the events fixture carries
  *    TIMESTAMP(NANOS), which Spark reads as long; [[Tables.events]]
  *    rebuilds the µs timestamp.
  *  - `excludedRules = InferFiltersFromGenerate`: the inferred pre-explode
  *    filter re-inlines heavy generator expressions (tokenize/shingle
  *    trees) ~3× per row through the staged projection; explode() already
  *    skips empty/null arrays, so exclusion is semantics-free. Measured:
  *    −33% on d09, −28% on t04 at sf0.1 (see PLANS.md session note).
  *  - `extensions = GraftExtensions`: registers the codegen'd `graft_dot`
  *    and `graft_lsh_buckets` expressions for SQL and DataFrame use.
  *  - UTC session timezone so timestamp math is engine- and
  *    machine-portable (the DuckDB oracle runs in UTC).
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // ContextCleaner frees dropped localCheckpoint/shuffle blocks only
      // after a driver GC notices the RDD is unreachable; the 30min default
      // lets blocks from hundreds of queries pile up in the block manager
      // (measured: d08's iteration checkpoints drifted 5.5s → 13.5s over a
      // long session). 15s keeps a long-lived session's block manager flat.
      .config("spark.cleaner.periodicGC.interval", "15s")
      // bucketed saveAsTable targets (f27) land under /tmp, not the repo
      // cwd; the dir is unique per JVM so concurrent processes (verify +
      // bench both exercising f27) can't drop each other's tables mid-read
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
