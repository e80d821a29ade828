package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-table commits with TIME-TRAVEL reads — the lakehouse
  * snapshot-isolation primitive (Iceberg/Delta's core idea, pared to
  * its Spark-expressible essence; the reference has no table format at
  * all). [[graft.ops.PipelineOps.snapshotDiff]] tells you what changed,
  * [[graft.ops.PipelineOps.upsert]] computes a merge — but both rewrite
  * in place, so "the table as of version N" is gone the moment N+1
  * lands. Here every commit writes a new MANIFEST pinning the exact
  * data directories that make up that version, and data is immutable
  * once written: an upsert commit rewrites ONLY the key-buckets its
  * update batch touches and re-references every untouched bucket's
  * existing files, so consecutive versions SHARE the unchanged bulk of
  * the table (O(changed buckets) write amplification, O(1) manifest
  * append) and any reader can pin any historical version forever.
  *
  * Layout under `tableDir`:
  * {{{
  *   data/c1/__bucket=0/…      commit 1's files (immutable)
  *   data/c2/__bucket=3/…      commit 2's files (touched buckets only)
  *   manifests/v1.txt          "bucket<TAB>relative-data-dir" lines
  *   manifests/v2.txt
  * }}}
  *
  * Buckets are `pmod(portableHash60(key), buckets)` — deterministic and
  * engine-portable, so update batches route to the same buckets on any
  * engine or re-run. The manifest is |buckets| lines of driver state.
  *
  * Atomicity + OPTIMISTIC CONCURRENCY: a manifest is staged to a temp
  * name, then the version is CLAIMED by atomically creating a
  * `.claim_vN` marker (O_EXCL `createNewFile` on local filesystems,
  * where Hadoop's rename/create(overwrite=false) are check-then-act;
  * `create(p, false)` on HDFS-like stores where it IS atomic) and only
  * the claim winner renames its staged file to `vN.txt` — a true
  * compare-and-swap on every filesystem: the commit only becomes
  * readable when fully written, and a SECOND writer racing to the same
  * version number FAILS LOUDLY instead of silently overwriting.
  * A crashed commit leaves orphan data dirs (garbage to
  * collect) but never a readable-but-wrong version; readers of v≤N are
  * untouched by any in-flight commit. [[vacuum]] must run inside the
  * same single-writer serialization as commits (it skips data dirs
  * newer than the newest manifest, so an in-flight commit's
  * already-written data survives a racing vacuum — but a vacuum racing
  * the manifest claim itself is still the caller's lock to take). */
object VersionedTable {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Deterministic engine-portable key→bucket routing — shared with
    * change-feed consumers, which re-derive a row's bucket to replace
    * changed buckets in their running state. */
  private[graft] def bucketOf(keyCol: String, buckets: Int) =
    pmod(graft.ops.DedupOps.portableHash60(col(keyCol).cast("string")),
      lit(buckets.toLong))

  /** Latest committed version (0 when the table does not exist yet). */
  def currentVersion(spark: SparkSession, tableDir: String): Int = {
    val fs = fsOf(spark, tableDir)
    val mdir = new Path(s"$tableDir/manifests")
    if (!fs.exists(mdir)) 0
    else fs.listStatus(mdir).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  /** Manifest body: header line `buckets<TAB>n`, an optional
    * `tag<TAB>label` line (idempotence marker — see [[taggedVersion]]),
    * then one `bucket<TAB>relative-data-dir` line per non-empty
    * bucket. Returns (buckets, tag, entries). */
  private def readManifestFull(fs: FileSystem, tableDir: String,
      version: Int): (Int, Option[String], Map[Long, String]) = {
    val p = new Path(s"$tableDir/manifests/v$version.txt")
    require(fs.exists(p), s"version $version does not exist under $tableDir")
    val in = fs.open(p)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      out.toString("UTF-8")
    } finally in.close()
    val lines = body.linesIterator.filter(_.nonEmpty).toSeq
    val Array(hk, hv) = lines.head.split('\t')
    require(hk == "buckets", s"malformed manifest header: ${lines.head}")
    val (tagLines, entryLines) = lines.tail.partition(_.startsWith("tag\t"))
    (hv.toInt, tagLines.headOption.map(_.stripPrefix("tag\t")),
      entryLines.map { line =>
        val Array(b, dir) = line.split('\t')
        b.toLong -> dir
      }.toMap)
  }

  private def readManifest(fs: FileSystem, tableDir: String,
                           version: Int): (Int, Map[Long, String]) = {
    val (b, _, m) = readManifestFull(fs, tableDir, version)
    (b, m)
  }

  /** (buckets, entries) of one version's manifest — the commit-log row
    * a change-feed reader diffs against its predecessor. */
  private[graft] def manifestEntries(spark: SparkSession, tableDir: String,
      version: Int): (Int, Map[Long, String]) =
    readManifest(fsOf(spark, tableDir), tableDir, version)

  /** Whether `version`'s manifest still exists (vacuum retires old
    * ones) — the change-feed's missing-predecessor probe. */
  private[graft] def manifestExists(spark: SparkSession, tableDir: String,
      version: Int): Boolean =
    fsOf(spark, tableDir)
      .exists(new Path(s"$tableDir/manifests/v$version.txt"))

  /** Atomically create a zero-byte claim marker; true iff THIS caller
    * created it. On local filesystems Hadoop's create(overwrite=false)
    * and rename are both check-then-act (File.renameTo overwrites on
    * POSIX), so route through `File.createNewFile` — atomic O_EXCL per
    * its contract. On HDFS-like stores create(p, false) is the atomic
    * primitive. LIMITATION: on object stores (S3A-class), create(p,
    * false) is itself check-then-act — the compare-and-swap guarantee
    * degrades there, so concurrent writers on S3-class storage need
    * external single-writer serialization (a coordinator or DynamoDB-
    * style lock), exactly as Delta requires. */
  private def atomicClaim(fs: FileSystem, p: Path): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      try new java.io.File(p.toUri.getPath).createNewFile()
      catch { case _: java.io.IOException => false }
    case _ =>
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Stage the manifest body under a temp name, then CLAIM the version:
    * atomic `.claim_vN` marker creation ([[atomicClaim]] — O_EXCL, not
    * check-then-act) + rename of the fully-written stage to `vN.txt`.
    * The optimistic-concurrency commit —
    * two writers racing to the same version number leave exactly ONE
    * committed manifest; the loser gets an IllegalStateException and
    * its staged file is cleaned up (its orphan data dirs are collectible
    * garbage, never readable). Claim markers are dot-prefixed so
    * streaming readers of the manifests dir never surface them. */
  private[graft] def writeManifest(fs: FileSystem, tableDir: String,
                            version: Int,
                            buckets: Int, entries: Map[Long, String],
                            tag: Option[String] = None): Unit = {
    val p = new Path(s"$tableDir/manifests/v$version.txt")
    val stage = new Path(s"$tableDir/manifests/" +
      s".stage_v${version}_${java.util.UUID.randomUUID()}.txt")
    val body = (Seq(s"buckets\t$buckets") ++ tag.map(t => s"tag\t$t") ++
      entries.toSeq.sortBy(_._1).map { case (b, d) => s"$b\t$d" })
      .mkString("\n")
    val out = fs.create(stage, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // claim AFTER the stage is durable: the winner's rename publishes a
    // complete manifest, never a partially-written one
    val claim = new Path(s"$tableDir/manifests/.claim_v$version")
    val claimed = atomicClaim(fs, claim) && fs.rename(stage, p)
    if (!claimed) {
      fs.delete(stage, false)
      throw new IllegalStateException(s"concurrent writer: version " +
        s"$version already committed under $tableDir — retry on top of " +
        s"the new current version")
    }
  }

  /** Pin the bucketed batch so the touched-bucket collect and the
    * commit's parquet write see IDENTICAL rows — a non-deterministic
    * updates plan (sample/limit/shuffle-nondeterministic source) would
    * otherwise route rows into buckets absent from the collected list,
    * silently losing them from the new version. Bounded: update batches
    * are the small side of a commit by design. */
  private def pinned(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Create the table: every row bucketed by `keyCol`, written once as
    * commit 1, manifest v1 pinning all buckets. Returns 1. */
  def commitCreate(df: DataFrame, tableDir: String, keyCol: String,
                   buckets: Int): Int = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    val fs = fsOf(spark, tableDir)
    require(currentVersion(spark, tableDir) == 0,
      s"table already exists under $tableDir")
    df.withColumn("__bucket", bucketOf(keyCol, buckets))
      .write.mode(SaveMode.ErrorIfExists).partitionBy("__bucket")
      .parquet(s"$tableDir/data/c1")
    // only buckets that actually received rows exist on disk
    val present = writtenBuckets(fs, tableDir, 1)
    writeManifest(fs, tableDir, 1, buckets,
      present.map(b => b -> s"data/c1/__bucket=$b").toMap)
    1
  }

  /** The `__bucket=` partition dirs commit `c` actually produced. */
  private def writtenBuckets(fs: FileSystem, tableDir: String,
                             c: Int): Set[Long] =
    fs.listStatus(new Path(s"$tableDir/data/c$c"))
      .map(_.getPath.getName).filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toLong).toSet

  /** MERGE an update batch as a new commit: rows whose key matches are
    * replaced, new keys insert ([[graft.ops.PipelineOps.upsert]]
    * semantics) — but ONLY the buckets the batch touches are read,
    * merged, and rewritten; every other bucket's files carry over into
    * the new manifest untouched. With `evolve = true` the batch may
    * carry NEW columns (SCHEMA EVOLUTION): merged base rows take null
    * for them, rewritten buckets carry the widened schema, untouched
    * buckets keep the old one — [[readVersion]]'s mergeSchema read
    * reconciles, so pre-evolution versions keep their ORIGINAL schema
    * (the schema itself time-travels) while post-evolution reads
    * surface the new column with nulls on untouched rows. Returns the
    * new version number. */
  def commitUpsert(spark: SparkSession, tableDir: String,
                   updates: DataFrame, keyCol: String,
                   evolve: Boolean = false): Int = {
    val v = currentVersion(spark, tableDir)
    require(v >= 1, s"no table to upsert under $tableDir")
    val fs = fsOf(spark, tableDir)
    val (buckets, man) = readManifest(fs, tableDir, v)
    val upd = pinned(updates.withColumn("__bucket", bucketOf(keyCol, buckets)))
    // bounded driver list: ≤ |buckets| touched bucket ids
    val touched = upd.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    val oldDirs = touched.flatMap(man.get).map(d => s"$tableDir/$d")
    val base =
      if (oldDirs.isEmpty) upd.limit(0)
      else spark.read.parquet(oldDirs.toIndexedSeq: _*)
        .withColumn("__bucket", bucketOf(keyCol, buckets))
    val merged =
      if (evolve) graft.ops.PipelineOps.upsertEvolve(base, upd, Seq(keyCol))
      else graft.ops.PipelineOps.upsert(base, upd, Seq(keyCol))
    val next = v + 1
    merged.write.mode(SaveMode.ErrorIfExists).partitionBy("__bucket")
      .parquet(s"$tableDir/data/c$next")
    // belt-and-braces: the manifest references exactly the dirs the write
    // produced (with the pinned batch, written == touched — an upsert
    // keeps every base and update row, so no touched bucket can empty)
    val written = writtenBuckets(fs, tableDir, next)
    require(written == touched.toSet,
      s"commit $next wrote buckets $written but collected $touched — " +
        "updates plan changed between evaluations")
    val rewritten = written.toSeq
      .map(b => b -> s"data/c$next/__bucket=$b").toMap
    writeManifest(fs, tableDir, next, buckets, man ++ rewritten)
    next
  }

  /** Apply a COMPACTED CDC batch ('U' upsert / 'D' delete tombstone, at
    * most one row per key — run [[graft.ops.PipelineOps.compactCdc]]
    * upstream, or feed from [[graft.streaming.StreamOps.cdcIngest]]'s
    * state) as a new commit — MERGE INTO with time travel: the same
    * touched-buckets-only read/rewrite as [[commitUpsert]], closed by
    * [[graft.ops.PipelineOps.applyCdc]] so tombstoned keys leave the
    * table. A delete-heavy batch can empty a touched bucket entirely:
    * the new manifest simply DROPS that bucket's entry (an absent entry
    * IS the empty bucket — only directories the write actually produced
    * are referenced, so a reader never points at a missing dir).
    * An optional `tag` label is recorded in the manifest — the
    * IDEMPOTENCE marker a streaming sink needs: foreachBatch may replay
    * an epoch after a failure, and [[taggedVersion]] lets the sink skip
    * a batch whose tag already committed (exactly-once CDC ingestion).
    * Returns the new version number. */
  def commitCdc(spark: SparkSession, tableDir: String, changes: DataFrame,
                keyCol: String, opCol: String,
                tag: Option[String] = None): Int = {
    val v = currentVersion(spark, tableDir)
    require(v >= 1, s"no table to apply CDC under $tableDir")
    val fs = fsOf(spark, tableDir)
    val (buckets, man) = readManifest(fs, tableDir, v)
    val chg = pinned(changes.withColumn("__bucket", bucketOf(keyCol, buckets)))
    // bounded driver list: ≤ |buckets| touched bucket ids
    val touched = chg.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted // ≤ |buckets| rows
    val oldDirs = touched.flatMap(man.get).map(d => s"$tableDir/$d")
    val base =
      if (oldDirs.isEmpty) chg.drop(opCol).limit(0)
      else spark.read.parquet(oldDirs.toIndexedSeq: _*)
        .withColumn("__bucket", bucketOf(keyCol, buckets))
    val merged = graft.ops.PipelineOps
      .applyCdc(base, chg, Seq(keyCol), opCol)
    val next = v + 1
    merged.write.mode(SaveMode.ErrorIfExists).partitionBy("__bucket")
      .parquet(s"$tableDir/data/c$next")
    // deletes may have emptied a touched bucket — reference only the
    // bucket dirs the write actually produced
    val written = writtenBuckets(fs, tableDir, next)
    val newEntries = touched.filter(written)
      .map(b => b -> s"data/c$next/__bucket=$b").toMap
    writeManifest(fs, tableDir, next, buckets,
      (man -- touched.filterNot(written)) ++ newEntries, tag)
    next
  }

  /** [[commitUpsert]] with OPTIMISTIC RETRY — the full
    * optimistic-concurrency loop a multi-writer deployment runs: on a
    * lost manifest claim (another writer landed the same version
    * number first), re-read the NEW current version and re-merge on
    * top of it, up to `maxRetries` times. Each attempt re-reads only
    * the touched buckets of the then-current manifest, so a retry
    * costs one more O(touched) merge, never a table rewrite; the
    * loser's orphaned data dir is collectible garbage. Returns the
    * committed version number. */
  def commitUpsertRetrying(spark: SparkSession, tableDir: String,
                           updates: DataFrame, keyCol: String,
                           evolve: Boolean = false,
                           maxRetries: Int = 3): Int = {
    var attempt = 0
    while (true) {
      try return commitUpsert(spark, tableDir, updates, keyCol, evolve)
      catch {
        case e: IllegalStateException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1 // unreachable
  }

  /** The newest version whose manifest carries `tag`, if any — the
    * exactly-once handshake for streaming commits: a foreachBatch sink
    * tags each commit with its epoch id and skips epochs already
    * committed ([[graft.streaming.StreamOps.cdcCommitIngest]] is the
    * loop). Bounded: |versions| manifest header reads, newest first. */
  def taggedVersion(spark: SparkSession, tableDir: String,
                    tag: String): Option[Int] = {
    val fs = fsOf(spark, tableDir)
    val cur = currentVersion(spark, tableDir)
    (cur to 1 by -1).find { v =>
      fs.exists(new Path(s"$tableDir/manifests/v$v.txt")) &&
        readManifestFull(fs, tableDir, v)._2.contains(tag)
    }
  }

  /** TIME TRAVEL: the table exactly as of `version` — reads only that
    * manifest's data directories (partition pruning at the manifest
    * level: a historical read never touches newer commits' files).
    * mergeSchema reconciles buckets written before/after a schema
    * evolution (pre-evolution buckets surface null for added columns);
    * a version whose dirs ALL predate the evolution keeps its original
    * schema — the schema itself time-travels. A version whose manifest
    * is EMPTY (a delete-heavy CDC batch legitimately empties every
    * bucket) reads back as an empty table with the schema of the
    * nearest earlier non-empty version (data dirs are immutable, so
    * the template read is free). */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Int): DataFrame = {
    val fs = fsOf(spark, tableDir)
    val (_, man) = readManifest(fs, tableDir, version)
    if (man.nonEmpty)
      spark.read.option("mergeSchema", "true").parquet(
        man.values.toSeq.sorted.map(d => s"$tableDir/$d"): _*)
    else {
      val tpl = (version - 1 to 1 by -1).iterator
        .filter(v => fs.exists(new Path(s"$tableDir/manifests/v$v.txt")))
        .map(v => readManifest(fs, tableDir, v)._2)
        .collectFirst { case m if m.nonEmpty => m }
      require(tpl.isDefined, s"version $version of $tableDir is empty " +
        "and no prior version carries a schema template")
      // read ALL template dirs with mergeSchema (mirroring the non-empty
      // path): after a schema evolution the template version can mix
      // pre/post-evolution bucket dirs, and one arbitrary Map-ordered dir
      // would surface the pre-evolution schema nondeterministically
      spark.read.option("mergeSchema", "true")
        .parquet(tpl.get.values.toSeq.sorted.map(d => s"$tableDir/$d"): _*)
        .limit(0)
    }
  }

  /** TIMESTAMP AS OF: the newest version committed at or before
    * `tsMillis` — Delta's `TIMESTAMP AS OF` resolved against the
    * manifest files' modification times. Precisely: rename preserves
    * the STAGED file's mtime, so the observed clock is the stage-write
    * instant (written immediately before the claim) — a lower bound on
    * readability, monotone across versions under the single-writer
    * claim serialization, which is all AS OF needs. Compose with
    * [[readVersion]] for the
    * "the table as the 2pm job saw it" read. Bounded: |versions| file
    * stats, no Spark job. Fails loudly when `tsMillis` predates the
    * table (a silent empty read would masquerade as data loss).
    * Caveat shared with Delta: filesystem mtimes are the clock — on
    * object stores with copied histories, pin versions by number. */
  def versionAsOf(spark: SparkSession, tableDir: String,
                  tsMillis: Long): Int = {
    val fs = fsOf(spark, tableDir)
    val cur = currentVersion(spark, tableDir)
    require(cur >= 1, s"no table under $tableDir")
    val vs = (1 to cur).filter { v =>
      val p = new Path(s"$tableDir/manifests/v$v.txt")
      fs.exists(p) && fs.getFileStatus(p).getModificationTime <= tsMillis
    }
    require(vs.nonEmpty,
      s"no version of $tableDir was committed at or before $tsMillis")
    vs.max
  }

  /** The manifest as data: (bucket, data_dir) for `version` — the
    * file-sharing audit surface (two versions sharing a bucket list the
    * same dir). Bounded |buckets| rows. */
  def manifest(spark: SparkSession, tableDir: String,
               version: Int): Seq[(Long, String)] = {
    val fs = fsOf(spark, tableDir)
    readManifest(fs, tableDir, version)._2.toSeq.sortBy(_._1)
  }

  /** VACUUM: retire every version older than the newest `keepLast` —
    * delete their manifests, then every bucket directory NO kept
    * manifest references (a dir shared forward into a kept version
    * survives; only truly orphaned data is reclaimed). The
    * storage-reclamation half of the versioned-table contract: history
    * is free only until you prune it, and pruning must never touch a
    * byte a kept version can still read. Data dirs NEWER than the
    * newest manifest are skipped — an in-flight commit writes data
    * before its manifest, and a racing vacuum must not reap it
    * (manifest-claim races remain the caller's single-writer lock;
    * see the object Scaladoc). Pure driver-side FS walking —
    * |versions| manifest reads + |dirs| lists, no Spark job. Returns
    * (droppedVersions, deletedDirs). */
  def vacuum(spark: SparkSession, tableDir: String,
             keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least one version")
    val fs = fsOf(spark, tableDir)
    val cur = currentVersion(spark, tableDir)
    require(cur >= 1, s"no table under $tableDir")
    val keepFrom = math.max(1, cur - keepLast + 1)
    val referenced = (keepFrom to cur)
      .flatMap(v => readManifest(fs, tableDir, v)._2.values).toSet
    // delete manifests FIRST: a concurrent reader of a dropped version
    // fails fast at the manifest instead of mid-scan on vanishing files
    var dropped = 0
    (1 until keepFrom).foreach { v =>
      val mp = new Path(s"$tableDir/manifests/v$v.txt")
      if (fs.exists(mp)) { fs.delete(mp, false); dropped += 1 }
      // the version's claim marker goes with its manifest (version
      // numbers never reuse — currentVersion keeps growing — so dropping
      // the marker cannot re-open the claim)
      val cp = new Path(s"$tableDir/manifests/.claim_v$v")
      if (fs.exists(cp)) fs.delete(cp, false)
    }
    var deleted = 0
    val dataRoot = new Path(s"$tableDir/data")
    fs.listStatus(dataRoot).foreach { c =>
      val commit = c.getPath.getName
      val cid = commit.stripPrefix("c").toIntOption
      // skip in-flight commits (data written, manifest not yet claimed)
      if (cid.exists(_ <= cur)) {
        fs.listStatus(c.getPath).foreach { b =>
          val name = b.getPath.getName
          if (name.startsWith("__bucket=")
              && !referenced(s"data/$commit/$name")) {
            fs.delete(b.getPath, true); deleted += 1
          }
        }
        // commit dir fully orphaned (only _SUCCESS markers left) → drop it
        if (!fs.listStatus(c.getPath)
            .exists(_.getPath.getName.startsWith("__bucket=")))
          fs.delete(c.getPath, true)
      }
    }
    (dropped, deleted)
  }

  /** INCREMENTAL changes read between two versions — O(changed
    * buckets), not O(table): identical manifest entries mean identical
    * bytes (data dirs are immutable once committed), so every bucket
    * the two versions SHARE is pruned before any IO; only the rewritten
    * buckets' rows load, and
    * [[graft.ops.PipelineOps.snapshotDiff]] closes the per-key statuses
    * with the unchanged rows (same content, rewritten neighbor) dropped.
    * The CDC-read primitive: downstream consumers sync `vFrom → vTo`
    * touching only what moved. */
  def readChanges(spark: SparkSession, tableDir: String,
                  vFrom: Int, vTo: Int, idCol: String,
                  textCol: String): DataFrame = {
    val fs = fsOf(spark, tableDir)
    val (_, mF) = readManifest(fs, tableDir, vFrom)
    val (_, mT) = readManifest(fs, tableDir, vTo)
    val changed = (mF.keySet ++ mT.keySet)
      .filter(b => mF.get(b) != mT.get(b)).toSeq.sorted
    // schema template for the empty sides (any referenced dir works —
    // manifests are non-empty by the commit contract)
    val template = spark.read
      .parquet(s"$tableDir/${(mT ++ mF).values.head}").limit(0)
    def rd(m: Map[Long, String]): DataFrame = {
      val dirs = changed.flatMap(m.get).map(d => s"$tableDir/$d")
      if (dirs.isEmpty) template else spark.read.parquet(dirs: _*)
    }
    graft.ops.PipelineOps.snapshotDiff(rd(mF), rd(mT), idCol, textCol)
      .filter(col("status") =!= "unchanged")
  }
}
