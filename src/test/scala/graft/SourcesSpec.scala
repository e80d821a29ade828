package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Round-trip and layout specs for the file sources/sinks. */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_src").toString

  private lazy val df =
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "g", "v")

  test("parquet round trip preserves schema and data") {
    val p = s"${tmp()}/t.parquet"
    Sources.writeParquet(df, p)
    val back = Sources.parquet(spark, p)
    // parquet reads come back nullable — compare names/types only
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("orc round trip preserves schema and data") {
    val p = s"${tmp()}/t.orc"
    Sources.writeOrc(df, p)
    val back = Sources.orc(spark, p)
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("text round trip: line-per-row, and wholetext file-per-row") {
    val p = s"${tmp()}/t.txt"
    Sources.writeText(Seq("l1", "l2", "l3").toDF("value"), p)
    val lines = Sources.text(spark, p).collect().map(_.getString(0)).toSet
    assert(lines == Set("l1", "l2", "l3"))
    val whole = Sources.text(spark, p, wholetext = true)
      .collect().map(_.getString(0))
    // one row per FILE; every line is inside some file
    assert(whole.flatMap(_.split("\n")).toSet == Set("l1", "l2", "l3"))
  }

  test("csv round trip with explicit schema (no inference pass)") {
    val p = s"${tmp()}/t.csv"
    Sources.writeCsv(df, p)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("v", DoubleType)))
    val back = Sources.csv(spark, p, schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq
      == df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("json-lines round trip with explicit schema") {
    val p = s"${tmp()}/t.json"
    Sources.writeJsonLines(df, p)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("v", DoubleType)))
    val back = Sources.jsonLines(spark, p, schema)
    assert(back.count() == 3)
  }

  test("csvPermissive quarantines malformed lines raw, parses the rest " +
      "(f77 gate)") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/mix.csv"),
      java.util.Arrays.asList(
        "1,a,1.5",
        "oops,b,2.5",          // type failure on the LONG column
        "3,\"a,unterminated",  // quote never closes
        "4,b,4.5"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("v", DoubleType)))
    val back = Sources.csvPermissive(spark, dir, schema).cache()
    val bad = back.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 2, "expected exactly the 2 poisoned lines")
    assert(bad.select("_corrupt_record").collect().map(_.getString(0))
      .toSet == Set("oops,b,2.5", "3,\"a,unterminated"),
      "quarantine must carry the raw line")
    assert(back.filter(col("_corrupt_record").isNull)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    back.unpersist()
  }

  test("jsonPermissive quarantines broken JSON lines (f77 sibling)") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/mix.json"),
      java.util.Arrays.asList(
        """{"id": 1, "g": "a", "v": 1.5}""",
        """{"id": 2, "g": "b", """,     // truncated mid-object
        """not json at all""",
        """{"id": 4, "g": "b", "v": 4.5}"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("v", DoubleType)))
    val back = Sources.jsonPermissive(spark, dir, schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(back.filter(col("_corrupt_record").isNull)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    back.unpersist()
  }

  test("zValue interleaves bits; z-ordered write clusters both dims") {
    // a=3 → result bits 0,2 (=5); b=5 → result bits 1,5 (=34); 5|34=39
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(Sources.zValue(col("a"), col("b"))).head().getLong(0)
    assert(z == 39L)
    // z-order write round-trips content and schema (sort key never lands
    // in the written schema)
    val grid = spark.range(256).select(
      (col("id") / 16).cast("long").as("x"),
      pmod(col("id"), lit(16)).cast("long").as("y"),
      col("id").as("payload"))
    val p = s"${tmp()}/z.parquet"
    Sources.writeZOrdered(grid.repartition(8), p, col("x"), col("y"),
      files = 8)
    val back = spark.read.parquet(p)
    assert(back.columns.toSeq == Seq("x", "y", "payload"))
    assert(back.orderBy("payload").collect().toSeq
      == grid.orderBy("payload").collect().toSeq)
    // locality: within every written file, the x-range × y-range box is a
    // fraction of the 16×16 grid (a linear sort on x would leave y wide
    // open in every file)
    val spans = back.groupBy(input_file_name())
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length > 1)
    assert(spans.forall(r => r.getLong(1) * r.getLong(2) <= 64),
      spans.mkString(","))
  }

  test("compact collapses fragmented part files, preserves every row") {
    val frag = tmp(); val out = tmp()
    val big = spark.range(10000)
      .select(col("id"), concat(lit("row"), col("id")).as("s"))
    big.repartition(32).write.mode("overwrite").parquet(frag)
    def parts(dir: String): Int = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(parts(frag) == 32)
    val n = Sources.compact(spark, frag, out, targetBytes = 64L * 1024 * 1024)
    assert(n == 1, s"32 tiny files should compact to 1, got $n")
    assert(parts(out) == 1)
    // value-preserving: same rows, nothing dropped or duplicated
    val a = spark.read.parquet(out).orderBy("id").collect().map(_.getLong(0))
    assert(a.toSeq == (0L until 10000L))
  }

  test("versioned table: v1 survives the v2 upsert bit-for-bit, only " +
      "touched buckets rewrite, untouched bucket files are SHARED") {
    import graft.sources.VersionedTable
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 64)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    assert(VersionedTable.commitCreate(base, tbl, "id", buckets = 8) == 1)
    // one updated key + one new key — touches at most 2 buckets
    val upd = Seq(7L -> "v2-7", 1000L -> "v2-1000").toDF("id", "s")
    assert(VersionedTable.commitUpsert(spark, tbl, upd, "id") == 2)
    assert(VersionedTable.currentVersion(spark, tbl) == 2)
    // v1 read-back: the original snapshot, untouched by v2
    val v1 = VersionedTable.readVersion(spark, tbl, 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v1.toSeq == (0L until 64L).map(i => (i, s"v1-$i")))
    // v2 read-back: upsert semantics (replace 7, insert 1000)
    val v2 = VersionedTable.readVersion(spark, tbl, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ((0L until 64L).filter(_ != 7L).map(i => (i, s"v1-$i"))
      :+ (7L, "v2-7") :+ (1000L, "v2-1000")).sortBy(_._1)
    assert(v2.toSeq == want)
    // manifests: ≤ 2 buckets moved to c2, the rest still point at c1
    val m1 = VersionedTable.manifest(spark, tbl, 1).toMap
    val m2 = VersionedTable.manifest(spark, tbl, 2).toMap
    val moved = m2.filter { case (b, d) => m1.get(b).exists(_ != d) }
    assert(moved.nonEmpty && moved.size <= 2,
      s"expected 1-2 rewritten buckets, got $moved")
    assert(moved.values.forall(_.startsWith("data/c2/")))
    val shared = m2.filter { case (b, d) => m1.get(b).contains(d) }
    assert(shared.size == m1.size - moved.count { case (b, _) =>
      m1.contains(b) },
      "untouched buckets must re-reference their v1 files")
    assert(shared.values.forall(_.startsWith("data/c1/")))
  }

  test("vacuum reclaims only unreferenced bucket dirs (kept versions " +
      "read back intact); readChanges prunes shared buckets before IO") {
    import graft.sources.VersionedTable
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 64)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 8)
    VersionedTable.commitUpsert(spark,
      tbl, Seq(7L -> "v2-7").toDF("id", "s"), "id")
    VersionedTable.commitUpsert(spark,
      tbl, Seq(9L -> "v3-9", 2000L -> "v3-2000").toDF("id", "s"), "id")
    // incremental read v1→v3 must prune the untouched buckets (≤ 3 of
    // the 8 manifest entries disagree) and report exactly the moves
    val m1 = VersionedTable.manifest(spark, tbl, 1).toMap
    val m3 = VersionedTable.manifest(spark, tbl, 3).toMap
    val disagree = (m1.keySet ++ m3.keySet)
      .count(b => m1.get(b) != m3.get(b))
    assert(disagree <= 3 && disagree < m3.size,
      s"manifest diff should prune shared buckets (disagree=$disagree)")
    val changes = VersionedTable
      .readChanges(spark, tbl, 1, 3, "id", "s")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(changes == Seq((7L, "changed"), (9L, "changed"),
      (2000L, "added")), s"incremental diff wrong: $changes")
    // vacuum keep-2: v1's manifest drops, only truly orphaned dirs go
    val (dropped, deleted) = VersionedTable.vacuum(spark, tbl, keepLast = 2)
    assert(dropped == 1, s"expected to drop v1's manifest, got $dropped")
    // v1's copies of the buckets v2/v3 rewrote are orphans; everything
    // shared forward must survive
    assert(deleted >= 1 && deleted <= 3, s"unexpected deletions: $deleted")
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, tbl, 1)
    }
    val v3 = VersionedTable.readVersion(spark, tbl, 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ((0L until 64L).filter(i => i != 7L && i != 9L)
      .map(i => (i, s"v1-$i"))
      :+ (7L, "v2-7") :+ (9L, "v3-9") :+ (2000L, "v3-2000")).sortBy(_._1)
    assert(v3.toSeq == want, "v3 read after vacuum lost data")
    val v2 = VersionedTable.readVersion(spark, tbl, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v2.length == 64 && v2.contains((7L, "v2-7")),
      "v2 read after vacuum lost data")
  }

  test("schema evolution: pre-evolution versions keep their ORIGINAL " +
      "schema; post-evolution reads surface the new column with nulls") {
    import graft.sources.VersionedTable
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 16)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 4)
    val upd = Seq((3L, "v2-3", 42L)).toDF("id", "s", "extra")
    VersionedTable.commitUpsert(spark, tbl, upd, "id", evolve = true)
    // v1: the evolved column must NOT leak into history
    assert(VersionedTable.readVersion(spark, tbl, 1).columns.toSeq
      == Seq("id", "s"), "schema evolution leaked into v1")
    // v2: evolved column present; only the updated row carries a value
    val v2 = VersionedTable.readVersion(spark, tbl, 2)
    assert(v2.columns.contains("extra"))
    val rows = v2.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == (0L until 16L).map(i =>
      if (i == 3L) (3L, "v2-3", Some(42L))
      else (i, s"v1-$i", None)).sortBy(_._1),
      s"evolved read wrong: $rows")
  }

  test("commitCdc: tombstones delete through a versioned commit, and a " +
      "bucket emptied by deletes DROPS from the manifest (no dangling dir)") {
    import graft.sources.VersionedTable
    import graft.ops.DedupOps
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 32)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 4)
    // find one bucket's full membership via the same portable hash
    val victims = base.select(col("id"),
        pmod(DedupOps.portableHash60(col("id").cast("string")), lit(4L))
          .as("b"))
      .collect().groupBy(_.getLong(1)).head._2.map(_.getLong(0)).toSeq
    // delete the whole victim bucket + amend one survivor (no inserts —
    // an insert could hash INTO the victim bucket and keep it alive)
    val survivor = (0L until 32L).find(!victims.contains(_)).get
    val changes = victims.map(i => (i, "x", "D"))
      .++(Seq((survivor, "v2-amended", "U")))
      .toDF("id", "s", "op")
    VersionedTable.commitCdc(spark, tbl, changes, "id", "op")
    val m2 = VersionedTable.manifest(spark, tbl, 2).toMap
    val vb = spark.range(0, 1).select(
      pmod(DedupOps.portableHash60(lit(victims.head.toString)), lit(4L)))
      .head().getLong(0)
    assert(!m2.contains(vb),
      s"emptied bucket $vb must drop from the manifest, got $m2")
    val v2 = VersionedTable.readVersion(spark, tbl, 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ((0L until 32L).filterNot(victims.contains)
      .filterNot(_ == survivor).map(i => (i, s"v1-$i"))
      :+ (survivor, "v2-amended")).sortBy(_._1)
    assert(v2.toSeq == want, s"CDC commit read-back wrong")
    // v1 untouched by the CDC commit
    assert(VersionedTable.readVersion(spark, tbl, 1).count() == 32)
  }

  test("optimistic concurrency: two writers racing to the same version " +
      "leave exactly ONE committed manifest; the loser fails loudly") {
    import graft.sources.VersionedTable
    import org.apache.hadoop.fs.Path
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 16)
      .select(col("id"), concat(lit("v1-"), col("id")).as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 4)
    val fs = new Path(tbl).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // both writers computed next = 2 from the same currentVersion read;
    // writer A claims v2 first (a carry-forward no-op commit, so the
    // table stays readable for the retry below)
    val m1 = VersionedTable.manifest(spark, tbl, 1).toMap
    VersionedTable.writeManifest(fs, tbl, 2, 4, m1)
    // writer B's claim of the SAME version must fail loudly…
    intercept[IllegalStateException] {
      VersionedTable.writeManifest(fs, tbl, 2, 4,
        Map(0L -> "data/c3/__bucket=0"))
    }
    // …leave writer A's manifest untouched, and clean up its staging file
    assert(VersionedTable.manifest(spark, tbl, 2).toMap == m1)
    assert(!fs.listStatus(new Path(s"$tbl/manifests"))
      .exists(_.getPath.getName.startsWith(".stage_")),
      "loser's staged manifest must be deleted")
    // a REAL second commit retries on top of the new current version (3)
    assert(VersionedTable.currentVersion(spark, tbl) == 2)
    // the optimistic-retry loop: the racing writer's work lands as the
    // NEXT version instead of failing the job
    val v3 = VersionedTable.commitUpsertRetrying(spark, tbl,
      Seq(3L -> "retry-3").toDF("id", "s"), "id")
    assert(v3 == 3)
    assert(VersionedTable.readVersion(spark, tbl, 3)
      .filter(col("id") === 3L).collect().map(_.getString(1)).toSeq
      == Seq("retry-3"))
  }

  test("versionAsOf resolves boundaries: exact instant, between commits, " +
      "after all, and predating the table fails loudly (p38 gate)") {
    import graft.sources.VersionedTable
    import org.apache.hadoop.fs.Path
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 8)
      .select(col("id"), col("id").cast("string").as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 2)
    VersionedTable.commitUpsert(spark, tbl,
      Seq((1L, "v2")).toDF("id", "s"), "id")
    val fs = new Path(tbl).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new Path(s"$tbl/manifests/v1.txt"), 1000L, -1L)
    fs.setTimes(new Path(s"$tbl/manifests/v2.txt"), 2000L, -1L)
    assert(VersionedTable.versionAsOf(spark, tbl, 1000L) == 1) // exact
    assert(VersionedTable.versionAsOf(spark, tbl, 1999L) == 1) // between
    assert(VersionedTable.versionAsOf(spark, tbl, 2000L) == 2)
    assert(VersionedTable.versionAsOf(spark, tbl, Long.MaxValue) == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.versionAsOf(spark, tbl, 999L) // predates the table
    }
  }

  test("atomic claim: 8 threads racing writeManifest for ONE version " +
      "leave exactly one winner (O_EXCL marker, not check-then-act)") {
    import graft.sources.VersionedTable
    import org.apache.hadoop.fs.Path
    val tbl = tmp() + "/tbl"
    val base = spark.range(0, 8)
      .select(col("id"), col("id").cast("string").as("s"))
    VersionedTable.commitCreate(base, tbl, "id", buckets = 2)
    val fs = new Path(tbl).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m1 = VersionedTable.manifest(spark, tbl, 1).toMap
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        try {
          VersionedTable.writeManifest(fs, tbl, 2, 2, m1)
          wins.incrementAndGet(); ()
        } catch { case _: IllegalStateException => () }
      })
    }
    threads.foreach(_.start())
    gate.countDown() // all 8 hit the claim as close to at-once as possible
    threads.foreach(_.join())
    assert(wins.get() == 1, s"expected exactly one winner, got ${wins.get()}")
    assert(VersionedTable.manifest(spark, tbl, 2).toMap == m1)
    assert(!fs.listStatus(new Path(s"$tbl/manifests"))
      .exists(_.getPath.getName.startsWith(".stage_")),
      "every loser's staged manifest must be deleted")
  }

  test("an all-deletes CDC commit empties every bucket: the version is " +
      "valid and reads back EMPTY with the prior schema; tags resolve") {
    import graft.sources.VersionedTable
    val tbl = tmp() + "/tbl"
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    VersionedTable.commitCreate(base, tbl, "id", buckets = 2)
    val wipe = Seq((1L, "x", "D"), (2L, "x", "D"), (3L, "x", "D"))
      .toDF("id", "s", "op")
    VersionedTable.commitCdc(spark, tbl, wipe, "id", "op",
      tag = Some("epoch=7"))
    assert(VersionedTable.manifest(spark, tbl, 2).isEmpty)
    val v2 = VersionedTable.readVersion(spark, tbl, 2)
    assert(v2.columns.toSeq == Seq("id", "s"),
      "empty version must keep the prior schema")
    assert(v2.count() == 0)
    // the tag is discoverable (the streaming sink's exactly-once probe)
    assert(VersionedTable.taggedVersion(spark, tbl, "epoch=7") == Some(2))
    assert(VersionedTable.taggedVersion(spark, tbl, "epoch=9").isEmpty)
    // and the table keeps working: a later insert commit reads back
    VersionedTable.commitCdc(spark, tbl,
      Seq((9L, "z", "U")).toDF("id", "s", "op"), "id", "op")
    val v3 = VersionedTable.readVersion(spark, tbl, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v3 == Seq((9L, "z")))
  }

  test("compactCdc keeps exactly the last-writer row per key; " +
      "applyCdcLog applies it (p26 gate shape)") {
    import graft.ops.PipelineOps
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val log = Seq(
      (1L, "a1", "U", 1L), (1L, "x", "D", 2L), (1L, "a3", "U", 3L),
      (2L, "b1", "U", 1L), (2L, "b1", "D", 2L),
      (9L, "n1", "U", 1L), (9L, "n2", "U", 2L),
      (8L, "zz", "D", 5L))
      .toDF("id", "s", "op", "seq")
    val compacted = PipelineOps.compactCdc(log, Seq("id"), "seq")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(compacted == Seq((1L, "a3", "U"), (2L, "b1", "D"),
      (8L, "zz", "D"), (9L, "n2", "U")))
    val merged = PipelineOps
      .applyCdcLog(base, log, Seq("id"), "op", "seq")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(merged == Seq((1L, "a3"), (3L, "c"), (9L, "n2")))
  }

  test("partitioned write prunes partitions on read") {
    val p = s"${tmp()}/part"
    Sources.writePartitioned(df, p, Seq("g"))
    // directory layout is hive-style
    assert(new java.io.File(p).listFiles().exists(_.getName.startsWith("g=")))
    val pruned = Sources.parquet(spark, p).filter(col("g") === "a")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(g"), plan)
  }

  test("schema evolution: mergeSchema unions batch schemas, old rows null") {
    // the landing-zone reality: a producer adds a column mid-stream; the
    // reader must union the footers and null-fill the old files
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "x")).toDF("id", "a").write.mode("append").parquet(dir)
    Seq((2L, "y", 9.5)).toDF("id", "a", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "id", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old file nulls
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
    // without mergeSchema the footer picked wins — documented seam, both
    // behaviors observable
    assert(spark.read.parquet(dir).columns.length <= 3)
  }

  test("bucketed tables join WITHOUT a shuffle (co-located scan)") {
    // The 100 TB co-location story: both fact tables bucketed on the join
    // key at write time → the join consumes the buckets' hash partitioning
    // directly, so the read-side plan has a SortMergeJoin with ZERO
    // Exchange — the shuffle was paid once at write, not per query.
    import spark.implicits._
    val facts = (1L to 200L).map(i => (i, i * 2.0)).toDF("k", "v")
    val other = (1L to 200L).map(i => (i, s"r$i")).toDF("k", "s")
    Sources.writeBucketed(facts, "graft_bkt_a", "k", 8)
    Sources.writeBucketed(other, "graft_bkt_b", "k", 8)
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
      assert(j.count() == 200)
    } finally {
      saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
