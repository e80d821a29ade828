package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{lit, shiftleft, shiftrightunsigned}
import org.apache.spark.sql.types.StructType

/** File sources and sinks (the reference has neither — construction is
  * in-memory only, ref: pontem/series/data_prep.py:50-62, and the only
  * "sink" is show(), ref: series.py:177).
  *
  * Thin, deliberate wrappers over `spark.read` / `df.write`:
  *  - reads take an explicit schema where inference would scan twice
  *    (CSV/JSON inference is a full extra pass at 100 TB);
  *  - writes default to snappy parquet, the only format whose scans give
  *    the engine column pruning + predicate pushdown + footer stats;
  *  - partitioned/bucketed writes lay data out so later reads prune
  *    partitions and later joins co-locate without a shuffle.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema (no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with an explicit schema (no inference pass). */
  def jsonLines(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** PERMISSIVE CSV read with a corrupt-record quarantine column — the
    * 100 TB crawl reality: text dumps are never clean, and N poisoned
    * lines must neither fail the whole scan (FAILFAST) nor vanish
    * silently (DROPMALFORMED). Malformed lines (type-cast failures,
    * token-count mismatches, unterminated quotes) land intact in
    * `corruptCol` with every data field null, so ingest can count,
    * triage, and re-drive them; healthy rows parse normally. The
    * caller's schema must NOT contain `corruptCol` — it is appended
    * here. Spark requires selecting at least one data column alongside
    * the corrupt column (a corrupt-only projection over raw CSV is
    * disallowed); the quarantine split in the f77 gate does. */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType,
                    corruptCol: String = "_corrupt_record",
                    header: Boolean = false,
                    delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add(corruptCol,
        org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** [[csvPermissive]]'s JSON-lines sibling: malformed lines (broken
    * JSON, type mismatches against the schema) quarantine into
    * `corruptCol` instead of failing or dropping. */
  def jsonPermissive(spark: SparkSession, path: String,
                     schema: StructType,
                     corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol,
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** ORC — the other columnar format with pruning + pushdown + stripe
    * stats (for interop with ORC-resident warehouses). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text: one row per line (column `value`) — the ingest shape for
    * unstructured corpora before any parsing. `wholetext = true` reads
    * each FILE as one row instead (document-per-file layouts). */
  def text(spark: SparkSession, path: String,
           wholetext: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholetext.toString).text(path)

  def writeParquet(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Single-string-column text sink (sharded like any Spark write). */
  def writeText(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).text(path)

  /** Hive-style partitioned parquet: later reads on the partition column
    * prune entire directories (PartitionFilters, no file IO at all). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Sort-clustered parquet: range-partition + sort within partitions on
    * `cols`, so every row group carries TIGHT min/max stats on them —
    * the layout that makes parquet data-skipping work at 100 TB (a later
    * range predicate prunes whole row groups whose stats can't match,
    * instead of scanning everything). */
  def writeSorted(df: DataFrame, path: String, cols: Seq[Column],
                  mode: SaveMode = SaveMode.Overwrite,
                  files: Int = 0): Unit = {
    // files > 0 pins the range-exchange width (target-file-size control,
    // the OPTIMIZE-style knob); 0 leaves it to the session default + AQE
    // coalescing, which at toy scale happily merges everything into one
    // file — fine for data, useless for testing locality.
    val ranged =
      if (files > 0) df.repartitionByRange(files, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*).write.mode(mode).parquet(path)
  }

  /** Morton (Z-order) interleave of two non-negative integral columns
    * into ONE clustering coordinate: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Sorting by it keeps rows close in BOTH
    * dimensions, so min/max row-group stats stay tight for range
    * predicates on either column — the multi-column data-skipping layout
    * (Delta/Iceberg OPTIMIZE ZORDER shape) as a pure codegen'd
    * expression. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftrightunsigned(a.cast("long"), i)
        .bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b.cast("long"), i)
        .bitwiseAND(lit(1L)), 2 * i + 1)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** Z-order clustered parquet write: [[writeSorted]] on the interleaved
    * [[zValue]] coordinate (computed inline — never materialized as a
    * column, so the written schema is untouched). */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    mode: SaveMode = SaveMode.Overwrite,
                    files: Int = 0): Unit =
    writeSorted(df, path, Seq(zValue(a, b)), mode, files)

  /** Small-file compaction — the maintenance pass every long-lived
    * 100 TB table needs (streaming sinks and incremental appends leave
    * thousands of KB-scale part files; scans then pay one task + one
    * footer read each). Sizes the target file count from the INPUT
    * LISTING (no data scan: Σ part-file lengths / targetBytes), then
    * one repartition write. Returns the target file count. The rewrite
    * is value-preserving by construction — the f72 gate hash-matches
    * the compacted scan against the original table. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Overwrite while lazily re-reading the same path would destroy the
    // input before the rewrite materializes — refuse up front.
    val outP = new org.apache.hadoop.fs.Path(outDir)
    require(fs.makeQualified(p) != fs.makeQualified(outP),
      s"compact: outDir must differ from inDir ($inDir)")
    // Size from the files the READ itself resolves (Dataset.inputFiles:
    // the scan's resolved file list) — counted bytes == read bytes by
    // construction for every layout the read handles (flat dirs,
    // key=val partitions, _spark_metadata streaming sinks). An
    // independent recursive listing can count nested files the read
    // never visits (silent undercount of the rewrite) or miss
    // metadata-log filtering; deriving both from one resolution step
    // removes that class of drift.
    val in = spark.read.parquet(inDir)
    var totalBytes = 0L
    in.inputFiles.foreach { f =>
      // Path(String) directly: inputFiles strings are Path.toString
      // values, NOT URI-encoded — routing them through java.net.URI
      // would throw on a path containing a space or other URI-special
      // character, which Path's own string parser accepts.
      totalBytes += fs.getFileStatus(
        new org.apache.hadoop.fs.Path(f)).getLen
    }
    val nFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    in.repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }

  def writeCsv(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Bucketed managed table: co-locates join/aggregation keys at write
    * time, so reads joining on the bucket key skip the shuffle entirely.
    * (Requires a metastore table — saveAsTable, not a bare path.) */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    // the stale-location delete below resolves <warehouse>/<table>; a
    // db-qualified name would compute the wrong path
    require(!table.contains("."),
      s"writeBucketed needs an unqualified table name, got '$table'")
    val spark = df.sparkSession
    // A fresh (in-memory) catalog can face a surviving location from a
    // prior session; Overwrite only replaces tables the catalog knows.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
  }
}
